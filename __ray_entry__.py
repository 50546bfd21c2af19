"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in graphrag_rs_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship KG pipeline at smoke scale — sf0.001 documents
  joined with a deterministic synthetic Common-Crawl-style `pages` table
  (BASELINE.json input_hint shape; the sf tables contain no capitalized
  text, so the synthetic pages carry the entity-bearing load).
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  training-data extensions).  KG queries synthesize pages at a size scaled
  from ``sf_dir`` (seed-fixed ⇒ deterministic row counts).
- ``oracle_sql()``: DuckDB equivalents with IDENTICAL column names for
  every SQL-expressible operator.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pyarrow as pa

try:  # engine tuning, not session ownership: see bench.py note
    from ray.data.context import DataContext as _DC
    _DC.get_current().op_resource_reservation_enabled = False
except Exception:  # noqa: BLE001 — ray absent/changed API: keep defaults
    pass

from graphrag_rs_ray.config import KGConfig
from graphrag_rs_ray.pipelines import training_data as td
from graphrag_rs_ray.pipelines.kg import (
    build_kg,
    chunks_to_combined,
    pages_to_chunks,
    triples_dataset,
)


def q_text_clean(sf_dir: str):
    """Whitespace-normalizing text cleaner (``text/mod.rs:327-336``)."""
    import os as _os
    import ray.data as rd

    ds = rd.read_parquet(_os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def clean(batch):
        texts = [" ".join((t or "").split()) for t in batch.column("text").to_pylist()]
        import pyarrow as _pa
        return _pa.table({"doc_id": batch.column("doc_id"),
                          "clean_text": _pa.array(texts, _pa.string())})

    return ds.map_batches(clean, batch_format="pyarrow")
from graphrag_rs_ray.sources.pages import pages_dataset
from graphrag_rs_ray.stages.extract_text import extract_text_stage
from graphrag_rs_ray.stages.kg_extract import entities_only
from graphrag_rs_ray.functions.textstats import STOP_WORDS
from graphrag_rs_ray.stages.hashagg import auto_pool

_SF_PAGES = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 100000}

# --------------------------------------------------- oracle staging -----
# VERDICT r01 task 1: derived-table queries become driver-verifiable by
# staging their PROCEDURAL input rows (mentions, raw triples, concept
# mentions ...) to Parquet inside the query fn; the oracle SQL then runs
# the same derivation over read_parquet(<staged>).  The staged rows feed
# BOTH sides, so the oracle independently checks the derivation logic
# (grouping / joining / merging), which is the SQL-expressible half of
# each pipeline.

_STAGE_ROOT = "/tmp/graft_oracle_stage"


def _stage_path(query: str, sf_dir: str, sub: str = "input") -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_STAGE_ROOT, sf, query, sub)


def _stage(ds, query: str, sf_dir: str, sub: str = "input"):
    """Write a Dataset to the oracle staging dir and read it back, so the
    exact same rows feed the Ray derivation and the DuckDB oracle."""
    import shutil
    import ray.data as rd
    d = _stage_path(query, sf_dir, sub)
    if os.path.exists(d):      # write_parquet APPENDS — never double-stage
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    ds.write_parquet(d)
    return rd.read_parquet(d)


def _staged_sql(query: str, sub: str = "input") -> str:
    # the driver's oracle runs at sf0.01; tests at other sf rewrite the path
    return f"read_parquet('{_STAGE_ROOT}/sf0.01/{query}/{sub}/*.parquet')"


def _n_pages(sf_dir: str) -> int:
    override = os.environ.get("GRAFT_PAGES")
    if override:
        return int(override)
    return _SF_PAGES.get(os.path.basename(os.path.normpath(sf_dir)), 500)


def _pages_from_documents(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "url": pa.array([f"doc://{i}" for i in ids], pa.string()),
            "warc_ts": pa.array([None] * len(ids), pa.timestamp("us")),
            "html": pa.array([None] * len(ids), pa.binary()),
            "text": batch.column("text"),
            "lang": batch.column("lang"),
            "title": pa.array([""] * len(ids), pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")


def entry() -> Any:
    """Flagship: sf0.001 documents + synthetic pages → deduped triples."""
    sf_dir = "/root/testdata/sf0.001"
    pages = _pages_from_documents(sf_dir).union(pages_dataset(200, seed=42))
    return triples_dataset(pages, KGConfig())


# ----------------------------------------------------------- queries() --

def _kg_pages(sf_dir: str):
    return pages_dataset(_n_pages(sf_dir), seed=42)


_KG_DS_CACHE: dict[tuple, Any] = {}


def _kg_ds(sf_dir: str, kind: str):
    """Materialized per-process checkpoints of the DEFAULT-``KGConfig``
    KG derivation that ~20 queries share (pages → chunks → combined →
    triples / entities), built once per process — the same
    shared-input-cache discipline as ``_ROGRAG_CACHE`` /
    ``_TOOL_GRAPH_CACHE``.  At 100 TB the graph is built once and
    persisted (``pipelines/kg.write_graph``); downstream analytics read
    the persisted graph rather than re-deriving it per query, and this
    cache models exactly that.  Query fns with a non-default config
    (fuzzy tier, custom chunking) do NOT use it."""
    key = (sf_dir, kind)
    if key not in _KG_DS_CACHE:
        from graphrag_rs_ray.pipelines.kg import dedup_triples
        from graphrag_rs_ray.stages.canonicalize import (
            entity_bucket_merge, partial_entity_agg)
        from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate
        from graphrag_rs_ray.stages.kg_extract import triples_only
        cfg = KGConfig()
        if kind == "chunks":
            ds = pages_to_chunks(_kg_pages(sf_dir), cfg)
        elif kind == "combined":
            ds = chunks_to_combined(_kg_ds(sf_dir, "chunks"), cfg)
        elif kind == "triples":
            ds = dedup_triples(
                _kg_ds(sf_dir, "combined").map_batches(
                    triples_only, batch_format="pyarrow"), cfg)
        elif kind == "entities":
            e_rows = _kg_ds(sf_dir, "combined").map_batches(
                entities_only, batch_format="pyarrow")
            ds = hash_grouped_aggregate(
                e_rows.map_batches(partial_entity_agg, batch_format="pyarrow",
                                   batch_size=None),
                ["entity_id"], entity_bucket_merge,
                num_buckets=cfg.num_shards * 4)
        else:
            raise KeyError(kind)
        _KG_DS_CACHE[key] = ds.materialize()
    return _KG_DS_CACHE[key]


def _kg_result(sf_dir: str):
    """``build_kg(_kg_pages(sf_dir), KGConfig())`` from the shared
    checkpoints: the default config has no fuzzy tier (links = {}), so
    the result is exactly (entities, triples) over the same materialized
    combined rows (`pipelines/kg.py::build_kg`)."""
    from graphrag_rs_ray.pipelines.kg import KGResult
    return KGResult(entities=_kg_ds(sf_dir, "entities"),
                    triples=_kg_ds(sf_dir, "triples"), links={})


def q_kg_triples(sf_dir: str):
    """Raw extracted triple rows are STAGED, then deduped from the staged
    copy — the dedup aggregation (max conf / context count / min context)
    is oracle-checked; extraction itself is gated by the repo goldens.
    (bench.py times the un-staged ``triples_dataset`` path directly.)"""
    from graphrag_rs_ray.pipelines.kg import dedup_triples
    from graphrag_rs_ray.stages.kg_extract import triples_only
    cfg = KGConfig()
    combined = _kg_ds(sf_dir, "combined")
    t_rows = _stage(combined.map_batches(triples_only, batch_format="pyarrow"),
                    "kg_triples", sf_dir)
    return dedup_triples(t_rows, cfg)


def q_kg_entities(sf_dir: str):
    """Raw entity mention rows staged; canonicalization (two-phase merge:
    per-(id,name) partials → canonical-name vote → totals) oracle-checked."""
    from graphrag_rs_ray.stages.canonicalize import (
        entity_bucket_merge, partial_entity_agg)
    from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate
    cfg = KGConfig()
    combined = _kg_ds(sf_dir, "combined")
    e_rows = _stage(combined.map_batches(entities_only, batch_format="pyarrow"),
                    "kg_entities", sf_dir)
    return hash_grouped_aggregate(
        e_rows.map_batches(partial_entity_agg, batch_format="pyarrow",
                           batch_size=None),
        ["entity_id"], entity_bucket_merge, num_buckets=cfg.num_shards * 4)


def q_kg_entities_fuzzy(sf_dir: str):
    """Fuzzy-tier canonicalization: the exact-tier entity table and the
    computed link set are BOTH staged, so the remap (links.get(id, id)) +
    re-merge (conf max, mention sum, frequency-weighted name vote) is
    oracle-checked; the link computation itself (blocked greedy
    clustering) stays gated by the determinism/similarity unit tests."""
    import ray
    import ray.data as rd
    from graphrag_rs_ray.functions.similarity import LinkingConfig
    from graphrag_rs_ray.pipelines.kg import (
        entities_dataset, partial_entity_agg_from_final)
    from graphrag_rs_ray.stages.canonicalize import entity_bucket_merge
    from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate
    from graphrag_rs_ray.stages.linking import compute_links, make_remap_entities

    cfg = KGConfig(fuzzy_linking=True)
    exact = _stage(entities_dataset(_kg_pages(sf_dir), cfg).materialize(),
                   "kg_entities_fuzzy", sf_dir, "exact_entities")
    links = compute_links(
        exact, LinkingConfig(min_similarity=cfg.min_similarity,
                             use_phonetic=cfg.use_phonetic),
        embedding_threshold=cfg.link_embedding_threshold)
    links_tbl = pa.table({
        "entity_id": pa.array(sorted(links.keys()), pa.string()),
        "canonical_id": pa.array([links[k] for k in sorted(links.keys())],
                                 pa.string())})
    # write directly (a 0-row Dataset would emit no file for the oracle)
    import pyarrow.parquet as _pq
    ldir = _stage_path("kg_entities_fuzzy", sf_dir, "links")
    import shutil as _sh
    if os.path.exists(ldir):
        _sh.rmtree(ldir)
    os.makedirs(ldir)
    _pq.write_table(links_tbl, os.path.join(ldir, "links.parquet"))
    if not links:
        return exact
    links_ref = ray.put(links)
    return hash_grouped_aggregate(
        exact.map_batches(make_remap_entities(links_ref), batch_format="pyarrow")
             .map_batches(partial_entity_agg_from_final, batch_format="pyarrow"),
        ["entity_id"], entity_bucket_merge, num_buckets=cfg.num_shards)


def q_kg_mentions(sf_dir: str):
    """Per-chunk entity mentions from the 4-phase pattern extractor
    (``entity/mod.rs:97-788``).  Chunks are the sanitized staged rows
    (same device as ``kg_chunks``) and DuckDB replays the ENTIRE
    default-path extractor (``_kg_mentions_sql``: greedy person phases
    as recursive CTEs, org/location scans, dedup + mention counts)."""
    cfg = KGConfig()
    chunks = q_kg_chunks(sf_dir)
    staged = _stage(chunks.map_batches(
        lambda t: t.select(["chunk_id", "doc_id", "text"]),
        batch_format="pyarrow"), "kg_mentions", sf_dir)
    combined = chunks_to_combined(staged, cfg)
    return combined.map_batches(entities_only, batch_format="pyarrow")


def q_kg_chunks(sf_dir: str):
    """Hierarchical chunking (``text/chunking.rs:48-152``) of the
    extracted page texts.  The extracted docs are staged ASCII/control-
    sanitized (1:1 char map — offsets preserved) and DuckDB replays the
    WHOLE chunker (``_kg_chunks_sql``: recursive CTE over start
    positions, separator-priority rfinds, quarter gate, word-boundary
    overlap back-off, min-size trim gate).  Memoized per process (six
    downstream queries consume this sanitized chunk stream; content is
    deterministic, so the stage dir is written once)."""
    if (sf_dir, "san_chunks") in _KG_DS_CACHE:
        return _KG_DS_CACHE[(sf_dir, "san_chunks")]
    import re as _re
    from graphrag_rs_ray.stages.chunk import ChunkStage

    docs = _kg_pages(sf_dir).map_batches(extract_text_stage,
                                         batch_format="pyarrow")

    def san_docs(t: pa.Table) -> pa.Table:
        texts = [_re.sub(r"[^\x09-\x0d\x20-\x7e]", "_", x or "")
                 for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string()),
                         "lang": t.column("lang")})

    staged = _stage(docs.map_batches(san_docs, batch_format="pyarrow"),
                    "kg_chunks", sf_dir)
    out = staged.map_batches(ChunkStage(KGConfig()),
                             batch_format="pyarrow").materialize()
    _KG_DS_CACHE[(sf_dir, "san_chunks")] = out
    return out


def q_extract_text(sf_dir: str):
    """HTML→text extraction (tag-strip automaton, ``html.rs:21-36``).
    Pages are staged with html DECODED + control/non-ASCII chars mapped
    1:1 to ``_`` (offsets preserved); DuckDB replays the automaton as
    two regex passes — ``<[^>]*(>|$)`` run removal (the state machine
    consumes from each ``<`` to the next ``>`` or EOF) + stray-``>``
    drop + whitespace trim.  Equivalence vs the Python automaton is
    property-gated in tests."""
    import re as _re

    def stage_pages(t: pa.Table) -> pa.Table:
        def san(x):
            return _re.sub(r"[^\x09-\x0d\x20-\x7e]", "_", x)
        hs = [None if h is None else
              san(h.decode("utf-8", errors="replace")
                  if isinstance(h, (bytes, bytearray)) else h)
              for h in t.column("html").to_pylist()]
        ts = [None if x is None else san(x)
              for x in t.column("text").to_pylist()]
        return pa.table({"url": t.column("url"),
                         "title": t.column("title"),
                         "lang": t.column("lang"),
                         "html_s": pa.array(hs, pa.string()),
                         "text_s": pa.array(ts, pa.string())})

    staged = _stage(_kg_pages(sf_dir).map_batches(
        stage_pages, batch_format="pyarrow"), "kg_extract_text", sf_dir)

    def extract(t: pa.Table) -> pa.Table:
        from graphrag_rs_ray.functions.html import extract_page_text
        out = [extract_page_text(h, x)
               for h, x in zip(t.column("html_s").to_pylist(),
                               t.column("text_s").to_pylist())]
        return pa.table({"doc_id": t.column("url"),
                         "title": t.column("title"),
                         "text": pa.array(out, pa.string()),
                         "lang": t.column("lang")})

    return staged.map_batches(extract, batch_format="pyarrow")


def _join_list_col(col: str):
    """Format a list<string> column as a comma-joined string for the
    driver's value-hash compare (list cells hash engine-dependently)."""
    def fmt(t: pa.Table) -> pa.Table:
        arrays = {c: t.column(c) for c in t.column_names}
        arrays[col] = pa.array(
            [",".join(x) for x in t.column(col).to_pylist()], pa.string())
        return pa.table(arrays)
    return fmt


def q_entity_to_chunks(sf_dir: str):
    from graphrag_rs_ray.pipelines.graph_ops import entity_to_chunks
    mentions = _stage(q_kg_mentions(sf_dir), "entity_to_chunks", sf_dir)
    return entity_to_chunks(mentions).map_batches(
        _join_list_col("chunks"), batch_format="pyarrow")


def q_chunk_to_entities(sf_dir: str):
    from graphrag_rs_ray.pipelines.graph_ops import chunk_to_entities
    mentions = _stage(q_kg_mentions(sf_dir), "chunk_to_entities", sf_dir)
    return chunk_to_entities(mentions).map_batches(
        _join_list_col("entities"), batch_format="pyarrow")


def q_co_occurring_entities(sf_dir: str):
    from graphrag_rs_ray.pipelines.graph_ops import co_occurring_entities
    mentions = _stage(q_kg_mentions(sf_dir), "co_occurring_entities", sf_dir)
    return co_occurring_entities(mentions)


def q_semantic_edges(sf_dir: str):
    """Per-entity top-k cosine edges; the (entity_id, embedding) table is
    staged as list<double> so the threshold/top-k/tie-break derivation is
    oracle-checked (sims rounded to 12 decimals on both sides)."""
    from graphrag_rs_ray.pipelines.graph_ops import semantic_edges
    from graphrag_rs_ray.stages.embed import EmbedStage
    from graphrag_rs_ray.stages.memo import memoized_stage
    fn = memoized_stage(("embed", "name", 64), lambda: EmbedStage("name", 64))
    ents = q_kg_entities(sf_dir).map_batches(fn, batch_format="pyarrow",
                                             batch_size=None)

    def fmt(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({"entity_id": t.column("entity_id"),
                         "embedding": emb.cast(pa.list_(pa.float64()))})

    staged = _stage(ents.map_batches(fmt, batch_format="pyarrow"),
                    "semantic_edges", sf_dir)
    return semantic_edges(staged, similarity_threshold=0.8)


def q_gleaning_triples(sf_dir: str):
    """Gleaning extraction (mock-LLM actor pool with response cache,
    ``entity/gleaning_extractor.rs:112-273``) over a small slice of the
    synthetic pages — exercises the LLM-path plumbing deterministically.

    Oracle: the raw PER-ROUND parse stream (what the LLM returned, before
    any merging) is staged, and DuckDB replays the sequential
    entity-merge fold (round-1 last-wins seed, then replace-iff-strictly-
    longer-description — equivalent to first-candidate-at-max), the
    first-wins relationship dedup on (source, target, relation_type), and
    the name→id endpoint resolution (``entity_id_for`` =
    ``type_<normalize_name>``).  Chunk texts are sanitized first so
    ``normalize_name``'s Unicode ``isalnum`` matches the ASCII regex."""
    import re as _re
    from graphrag_rs_ray.stages.gleaning import GleaningExtractStage
    from graphrag_rs_ray.stages.memo import memoized_stage
    import pyarrow.compute as _pc
    n = max(_n_pages(sf_dir) // 10, 50)
    chunks = pages_to_chunks(pages_dataset(n, seed=42), KGConfig())

    def san(t: pa.Table) -> pa.Table:
        texts = [_re.sub(r"[^\x09-\x0d\x20-\x7e]", "_", x or "")
                 for x in t.column("text").to_pylist()]
        return pa.table({"chunk_id": t.column("chunk_id"),
                         "doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    chunks = chunks.map_batches(san, batch_format="pyarrow")

    def trace_rows(t: pa.Table) -> pa.Table:
        stage = GleaningExtractStage(max_rounds=3)
        cols = {k: [] for k in ("chunk_id", "seq", "round", "kind", "name",
                                "type", "description", "source", "target",
                                "relation_type")}

        def put(cid, seq, rnd, kind, **kw):
            cols["chunk_id"].append(cid)
            cols["seq"].append(seq)
            cols["round"].append(rnd)
            cols["kind"].append(kind)
            for f in ("name", "type", "description", "source", "target",
                      "relation_type"):
                cols[f].append(kw.get(f))

        for cid, text in zip(t.column("chunk_id").to_pylist(),
                             t.column("text").to_pylist()):
            _e, _r, _rounds, trace = stage._glean_chunk(text or "")
            seq = 0
            for rnd, ents, rels in trace:
                for e in ents:
                    put(cid, seq, rnd, "e",
                        name=str(e.get("name", "")),
                        type=str(e.get("type", "UNKNOWN")),
                        description=str(e.get("description", "")))
                    seq += 1
                for r in rels:
                    put(cid, seq, rnd, "t",
                        source=str(r.get("source", "")),
                        target=str(r.get("target", "")),
                        relation_type=str(r.get("relation_type",
                                                "RELATED_TO")))
                    seq += 1
        return pa.table({
            "chunk_id": pa.array(cols["chunk_id"], pa.string()),
            "seq": pa.array(cols["seq"], pa.int64()),
            "round": pa.array(cols["round"], pa.int64()),
            "kind": pa.array(cols["kind"], pa.string()),
            "name": pa.array(cols["name"], pa.string()),
            "type": pa.array(cols["type"], pa.string()),
            "description": pa.array(cols["description"], pa.string()),
            "source": pa.array(cols["source"], pa.string()),
            "target": pa.array(cols["target"], pa.string()),
            "relation_type": pa.array(cols["relation_type"], pa.string())})

    _stage(chunks.map_batches(trace_rows, batch_format="pyarrow"),
           "gleaning_triples", sf_dir)

    fn = memoized_stage("gleaning-3", lambda: GleaningExtractStage(max_rounds=3))
    combined = chunks.map_batches(fn, batch_format="pyarrow", batch_size=None)
    return combined.map_batches(
        lambda t: t.filter(_pc.equal(t.column("kind"), "t"))
                   .select(["chunk_id", "subj", "pred", "obj"]),
        batch_format="pyarrow")


def q_ner_mentions(sf_dir: str):
    """Rule-engine NER (gazetteer/regex/contextual,
    ``nlp/custom_ner.rs``); rules built once per worker process (cheap
    state → stateless tasks, see stages/memo.py).  Chunk texts are
    staged (ASCII-sanitized, same device as ``concept_mentions``) and
    the oracle replays the WHOLE engine in SQL: dictionary occurrences
    via split-cumsum positions, regex matches via the
    parts/matches zip, the contextual word-window rule with its
    first-substring-position quirk, and the greedy
    (start, −conf, emission-order) overlap resolution as a recursive
    CTE."""
    import re as _re
    from graphrag_rs_ray.stages.memo import memoized_stage
    from graphrag_rs_ray.stages.ner import (DEMO_ENTITY_TYPES,
                                            DEMO_RULES, NERStage)

    def ascii_chunks(t: pa.Table) -> pa.Table:
        texts = [_re.sub(r"[^\x00-\x7f]", "_", x or "")
                 for x in t.column("text").to_pylist()]
        return pa.table({"chunk_id": t.column("chunk_id"),
                         "doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    chunks = _stage(q_kg_chunks(sf_dir).map_batches(
        ascii_chunks, batch_format="pyarrow"), "ner_mentions", sf_dir)
    fn = memoized_stage("demo-ner",
                        lambda: NERStage(DEMO_ENTITY_TYPES, DEMO_RULES))
    return chunks.map_batches(fn, batch_format="pyarrow",
                              batch_size=None)


def q_incremental_update(sf_dir: str):
    """Delta ingest: a second page batch merged into an existing graph
    (entity merge strategies + triple union-dedup) — the table-level
    equivalent of ``graph/incremental.rs`` apply_delta.  Both input graphs
    are staged so the merge semantics (conf-argmax name/type, summed
    mentions, distinct-triple count) are oracle-checked."""
    from graphrag_rs_ray.pipelines.graph_ops import MERGE, merge_entity_tables, merge_triple_tables
    n = max(_n_pages(sf_dir) // 2, 50)
    base = build_kg(pages_dataset(n, seed=42), KGConfig())
    delta = build_kg(pages_dataset(n, seed=4242), KGConfig())
    be = _stage(base.entities, "incremental_update", sf_dir, "base_entities")
    de = _stage(delta.entities, "incremental_update", sf_dir, "delta_entities")
    bt = _stage(base.triples, "incremental_update", sf_dir, "base_triples")
    dt = _stage(delta.triples, "incremental_update", sf_dir, "delta_triples")
    entities = merge_entity_tables(be, de, MERGE)
    triples = merge_triple_tables(bt, dt)
    n_t = triples.count()
    import pyarrow as _pa
    return entities.map_batches(
        lambda t: t.append_column("graph_triples", _pa.array([n_t] * t.num_rows, _pa.int64())),
        batch_format="pyarrow")


def q_pagerank(sf_dir: str):
    """Dataset-native PageRank (``pagerank.rs:17-52,184-223`` semantics:
    new = (1-d)/n + Σ d·score/out_deg, no dangling redistribution) over the
    staged triple table, run for a FIXED 8 iterations (tolerance=0) so the
    DuckDB oracle — 8 programmatically generated join+aggregate steps —
    computes the identical recurrence.  Scores rounded to 8 decimals on
    both sides (sum order differs between engines; accumulated FP error
    ≲1e-14 is absorbed by the rounding)."""
    from graphrag_rs_ray.pipelines.graph_ops import pagerank_dataset
    edges = _staged_triples("pagerank", sf_dir).map_batches(
        lambda t: t.select(["subj", "obj"]), batch_format="pyarrow")
    return pagerank_dataset(edges, damping=0.85, max_iter=8, tolerance=0.0,
                            num_buckets=16, round_digits=8)


def q_connected_components(sf_dir: str):
    """Undirected connected components via hash-to-min label propagation
    (component = lexicographically-smallest reachable node,
    ``pipelines/communities.py``); oracle = DuckDB recursive-CTE
    reachability closure + min(label)."""
    from graphrag_rs_ray.pipelines.communities import connected_components
    triples = _staged_triples("connected_components", sf_dir)
    def und(t):
        import pyarrow.compute as pc
        keep = t.filter(pc.invert(pc.equal(t.column("subj"), t.column("obj"))))
        return pa.table({"a": keep.column("subj"), "b": keep.column("obj")})
    return connected_components(
        triples.map_batches(und, batch_format="pyarrow"), num_buckets=16)


def _staged_triples(query: str, sf_dir: str):
    """Stage the deduped (subj, pred, obj) triple table for a graph-op
    query + its oracle."""
    tri = _kg_ds(sf_dir, "triples").map_batches(
        lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow")
    return _stage(tri, query, sf_dir)


def q_k_hop(sf_dir: str):
    """3-hop BFS neighbourhood (both directions, ``traversal.rs:85-151``)
    from the 3 lexicographically-first subjects; oracle = DuckDB recursive
    CTE over the staged triples."""
    from graphrag_rs_ray.pipelines.graph_ops import k_hop
    from graphrag_rs_ray.stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate
    triples = _staged_triples("k_hop", sf_dir)
    seeds_ds = hash_grouped_aggregate(
        triples.map_batches(lambda t: t.select(["subj"]), batch_format="pyarrow"),
        ["subj"], grouped_arrow_agg(["subj"], [("subj", "count")],
                                    rename=["subj", "n"]))
    seeds = [r["subj"] for r in seeds_ds.sort("subj").limit(3).take(3)]
    return k_hop(triples, seeds, k=3, direction="both")


def q_degree_stats(sf_dir: str):
    """Per-node degree + centrality table (``graph/analytics.rs``)."""
    from graphrag_rs_ray.pipelines.graph_ops import degree_stats
    return degree_stats(_staged_triples("degree_stats", sf_dir))


def q_centrality(sf_dir: str):
    """Degree / betweenness / closeness centrality
    (``analytics.rs:182-278``) over the 2-hop subgraph of the 3
    lexicographically-first subjects (all-pairs centrality is quadratic —
    the bounded subgraph is the documented usage pattern at scale).
    Oracle: DuckDB all-pairs hop distances (recursive CTE) + the
    d(s,v)+d(v,t)=d(s,t) decomposition test."""
    from graphrag_rs_ray.pipelines.graph_ops import centrality_scores, k_hop
    from graphrag_rs_ray.stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate
    tri = _kg_ds(sf_dir, "triples").map_batches(
        lambda t: t.select(["subj", "pred", "obj"]),
        batch_format="pyarrow").materialize()
    seeds_ds = hash_grouped_aggregate(
        tri.map_batches(lambda t: t.select(["subj"]), batch_format="pyarrow"),
        ["subj"], grouped_arrow_agg(["subj"], [("subj", "count")],
                                    rename=["subj", "n"]))
    seeds = [r["subj"] for r in seeds_ds.sort("subj").limit(3).take(3)]
    # bounded subgraph: first 120 nodes by (hop, name) — all-pairs
    # centrality AND its O(n³) SQL oracle stay tractable; 120 nodes also
    # bounds the subgraph diameter ≪ the oracle's 12-hop walk cap
    hops = sorted((r["hop"], r["node"])
                  for r in k_hop(tri, seeds, k=2, direction="both")
                  .take_all())[:120]
    import ray
    nref = ray.put(pa.array(sorted(n for _, n in hops), pa.string()))

    def sub(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ns = ray.get(nref)
        keep = pc.and_(pc.is_in(t.column("subj"), value_set=ns),
                       pc.is_in(t.column("obj"), value_set=ns))
        return t.filter(keep)

    staged = _stage(tri.map_batches(sub, batch_format="pyarrow"),
                    "centrality", sf_dir)
    return centrality_scores(staged, num_buckets=16)


def _pair_weight(a_arr: pa.Array, b_arr: pa.Array) -> pa.Array:
    """Deterministic synthetic edge weight in [0.5, 3.0) from the pair's
    blake2b digest (the sf tables carry no numeric edge attribute; the
    staged column feeds BOTH the Ray derivation and the oracle, so only
    determinism matters)."""
    import hashlib
    ws = []
    for a, b in zip(a_arr.to_pylist(), b_arr.to_pylist()):
        h = int.from_bytes(hashlib.blake2b(f"{a}\x1f{b}".encode(),
                                           digest_size=8).digest(), "big")
        ws.append(0.5 + (h % 2000) / 800.0)
    return pa.array(ws, pa.float64())


def _staged_weighted_edges(query: str, sf_dir: str, max_nodes: int):
    """Bounded undirected weighted edge list for the path queries:
    distinct canonical KG pairs (src < dst, self-loops dropped)
    restricted to the first ``max_nodes`` nodes by (hop, name) around the
    lexicographically-first node (same bounding pattern as
    ``q_centrality`` — path enumeration and its oracle are exponential /
    O(n·rounds), the bounded subgraph is the documented usage at scale),
    plus a deterministic weight column, staged for both sides."""
    import ray
    import pyarrow.compute as pc
    from graphrag_rs_ray.pipelines.graph_ops import k_hop
    from graphrag_rs_ray.stages.hashagg import (
        grouped_arrow_agg,
        hash_grouped_aggregate,
    )
    tri = _kg_ds(sf_dir, "triples").map_batches(
        lambda t: t.select(["subj", "pred", "obj"]),
        batch_format="pyarrow").materialize()

    def canon(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.not_equal(t.column("subj"), t.column("obj")))
        return pa.table({
            "subj": pc.min_element_wise(keep.column("subj"), keep.column("obj")),
            "obj": pc.max_element_wise(keep.column("subj"), keep.column("obj"))})

    pairs = hash_grouped_aggregate(
        tri.map_batches(canon, batch_format="pyarrow"), ["subj", "obj"],
        grouped_arrow_agg(["subj", "obj"], [("subj", "count")],
                          rename=["subj", "obj", "n"])).materialize()
    seed = pairs.min("subj")
    hops = sorted((r["hop"], r["node"])
                  for r in k_hop(pairs, [seed], k=2, direction="both")
                  .take_all())[:max_nodes]
    nref = ray.put(pa.array(sorted(n for _, n in hops), pa.string()))

    def fin(t: pa.Table) -> pa.Table:
        ns = ray.get(nref)
        keep = t.filter(pc.and_(pc.is_in(t.column("subj"), value_set=ns),
                                pc.is_in(t.column("obj"), value_set=ns)))
        return pa.table({
            "src": keep.column("subj"), "dst": keep.column("obj"),
            "w": _pair_weight(keep.column("subj"), keep.column("obj"))})

    return _stage(pairs.map_batches(fin, batch_format="pyarrow"),
                  query, sf_dir)


def q_shortest_paths(sf_dir: str):
    """Single-source weighted shortest paths (Dijkstra,
    ``analytics.rs:272-345``) from the lexicographically-first node of a
    bounded weighted subgraph.  dist = exact f64 min path-sum (fl(+) is
    monotone, so Dijkstra, sharded Bellman-Ford and the oracle's unrolled
    relaxation all yield the min over the same left-associated sums —
    bit-equal, no rounding); pred = lexicographically smallest optimal
    predecessor ('' at the source; the reference's reconstructed path
    follows HashSet iteration order and is not reproducible even there).
    Oracle: programmatically generated Bellman-Ford rounds."""
    from graphrag_rs_ray.pipelines.paths import shortest_paths
    edges = _staged_weighted_edges("shortest_paths", sf_dir, max_nodes=56)
    source = edges.min("src")
    return shortest_paths(edges, source)


def q_all_paths(sf_dir: str):
    """All simple paths (≤4 nodes) between the lexicographically first
    and last nodes of a bounded weighted subgraph (DFS,
    ``analytics.rs:347-404``; the end node is terminal).  Oracle: DuckDB
    recursive CTE with the same delimiter-encoded visited check."""
    from graphrag_rs_ray.pipelines.paths import all_paths
    edges = _staged_weighted_edges("all_paths", sf_dir, max_nodes=24)
    start = edges.min("src")
    end = edges.max("dst")
    return all_paths(edges, start, end, max_depth=4)


def _synth_conf(t: pa.Table) -> pa.Table:
    """Deterministic synthetic confidence in [0.05, 0.95) from a triple's
    blake2b digest (the extractor emits a constant 0.8, which would make
    strength gates / weighted PPR no-ops; the column feeds BOTH sides so
    only determinism matters — same device as ``_pair_weight``)."""
    import hashlib
    cs = []
    for s, p, o in zip(t.column("subj").to_pylist(),
                       t.column("pred").to_pylist(),
                       t.column("obj").to_pylist()):
        h = int.from_bytes(hashlib.blake2b(
            f"{s}\x1f{p}\x1f{o}".encode(), digest_size=8).digest(), "big")
        cs.append(0.05 + (h % 900) / 1000.0)
    return pa.table({"subj": t.column("subj"), "pred": t.column("pred"),
                     "obj": t.column("obj"),
                     "conf": pa.array(cs, pa.float64())})


def _staged_conf_triples(query: str, sf_dir: str):
    """Deduped KG triples + ``_synth_conf`` confidences, staged."""
    tri = _kg_ds(sf_dir, "triples")
    return _stage(tri.map_batches(_synth_conf, batch_format="pyarrow"),
                  query, sf_dir)


def _first_subjects(query: str, sf_dir: str, n: int) -> list[str]:
    """The n lexicographically-first distinct subjects of an
    already-staged table — harness-side seed choice (not an operator),
    read straight from the staged Parquet with DuckDB so it costs
    milliseconds instead of a Dataset shuffle, and matches the oracle's
    seed rule by construction."""
    import duckdb
    path = os.path.join(_stage_path(query, sf_dir), "*.parquet")
    rows = duckdb.execute(
        f"SELECT DISTINCT subj FROM read_parquet('{path}') "
        f"ORDER BY subj LIMIT {n}").fetchall()
    return [r[0] for r in rows]


def q_ego_network(sf_dir: str):
    """2-hop ego network around the lexicographically-first subject over
    the confidence-gated graph (``traversal.rs:248-309``): node rows with
    min hop + relationship rows with the reference's duplicate-push
    occurrence counts.  Oracle: recursive-CTE distances + endpoint-
    indicator occurrence sum."""
    from graphrag_rs_ray.pipelines.traversal import ego_network
    tri = _staged_conf_triples("ego_network", sf_dir)
    seed = _first_subjects("ego_network", sf_dir, 1)[0]
    return ego_network(tri, seed, k_hops=2, min_strength=0.5,
                       num_buckets=16)


def q_multi_source_bfs(sf_dir: str):
    """Simultaneous BFS from the 3 lexicographically-first subjects
    (``traversal.rs:322-374``): min hop from any source ≤ 3 plus the
    in_entities flag (nodes popped before the depth gate)."""
    from graphrag_rs_ray.pipelines.traversal import multi_source_bfs
    tri = _staged_conf_triples("multi_source_bfs", sf_dir)
    return multi_source_bfs(tri, _first_subjects("multi_source_bfs", sf_dir, 3),
                            max_depth=3,
                            min_strength=0.5, num_buckets=16)


def q_query_focused_subgraph(sf_dir: str):
    """Query-focused subgraph = union of per-seed ego networks with
    entity / (source, target, type)-key relationship dedup and
    min-over-seeds distances (``traversal.rs:521-566``)."""
    from graphrag_rs_ray.pipelines.traversal import query_focused_subgraph
    tri = _staged_conf_triples("query_focused_subgraph", sf_dir)
    return query_focused_subgraph(
        tri, _first_subjects("query_focused_subgraph", sf_dir, 3),
                                  expansion_hops=2, min_strength=0.5,
                                  num_buckets=16)


def q_triangle_counts(sf_dir: str):
    """Per-node triangles + local clustering coefficient
    (``analytics.rs:452-484``); oracle = DuckDB 3-way self-join over the
    staged triples' canonical undirected edge set."""
    from graphrag_rs_ray.pipelines.graph_ops import triangle_counts
    return triangle_counts(_staged_triples("triangle_counts", sf_dir),
                           num_buckets=16)


def q_graph_statistics(sf_dir: str):
    """One-row GraphStatistics (``incremental.rs:420-436``,
    ``analytics.rs:436-484``): counts, avg/max degree, components,
    density, average clustering coefficient."""
    from graphrag_rs_ray.pipelines.graph_ops import graph_statistics_row
    import ray.data as rd
    return rd.from_arrow(graph_statistics_row(
        _staged_triples("graph_statistics", sf_dir), num_buckets=16))


def q_doc_tree(sf_dir: str):
    """RAPTOR-style per-document summary-tree STRUCTURE
    (``summarization/mod.rs:642-682``): leaf ids, ``level_{L}_{k}`` inner
    nodes, merge_size-5 grouping, parent links, per-node child/leaf
    counts.  The leaf (chunk) ids are staged; DuckDB re-derives the whole
    tree shape arithmetically (levels L=1..9 cover 5^9 chunks per doc —
    far beyond any document).  Summaries are procedural → the companion
    ``doc_tree_summaries`` query carries them (rows-only)."""
    from graphrag_rs_ray.pipelines.doctree import build_document_trees
    # chunk_size 120 → ~10-20 chunks/doc so the trees are genuinely
    # multi-level (default 1000 gives 1 chunk per synthetic page)
    chunks = pages_to_chunks(_kg_pages(sf_dir),
                             KGConfig(chunk_size=120, chunk_overlap=0,
                                      min_chunk_size=20))
    _stage(chunks.map_batches(lambda t: t.select(["chunk_id", "doc_id"]),
                              batch_format="pyarrow"), "doc_tree", sf_dir)
    return build_document_trees(chunks, with_summary=False)


def q_doc_tree_summaries(sf_dir: str):
    """Full document trees incl. extractive summaries
    (``summarization/mod.rs:759-793`` family via ``keywords.summarize``);
    same chunk config as ``doc_tree`` so the trees are multi-level.
    Pages capped at 20k: the op is strictly per-document (zero cross-doc
    shuffle, cost exactly linear in documents), so a bounded slice is the
    honest bench unit — at web scale you run it per partition.

    Oracle: chunk texts are staged ASCII-sanitized (the
    ``ner_mentions`` device) and DuckDB re-derives the tree structure
    arithmetically, re-assembles every node's content as the ordered
    ``\\n\\n``-join of its leaf texts, and replays the ENTIRE extractive
    summarizer (``_summarizer_sql``: scoring + recursive-CTE greedy
    selection)."""
    import re as _re
    from graphrag_rs_ray.pipelines.doctree import build_document_trees
    pages = _kg_pages(sf_dir)
    if _n_pages(sf_dir) > 20_000:
        pages = pages.limit(20_000)
    chunks = pages_to_chunks(pages,
                             KGConfig(chunk_size=120, chunk_overlap=0,
                                      min_chunk_size=20))

    def ascii_chunks(t: pa.Table) -> pa.Table:
        texts = [_re.sub(r"[^\x00-\x7f]", "_", x or "")
                 for x in t.column("text").to_pylist()]
        return pa.table({"chunk_id": t.column("chunk_id"),
                         "doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    staged = _stage(chunks.map_batches(ascii_chunks, batch_format="pyarrow"),
                    "doc_tree_summaries", sf_dir)
    return build_document_trees(staged, with_summary=True)


def q_enriched_chunks(sf_dir: str):
    """Chunk enrichment (``text/chunk_enricher.rs:48-142``) over
    ASCII-sanitized documents.  Procedural inputs staged: the chunk rows,
    per-doc lengths, and the parsed SECTION table (plaintext heading
    detection is sequential, like the chunker); DuckDB re-derives
    chapter/section/subsection via the last-containing-offset rule +
    a recursive parent walk, keywords (empty-DF TF-IDF ⇒ all scores 0 ⇒
    lexicographic top-5 — the documented deviation), the FULL extractive
    summary via ``_summarizer_sql`` (only for chunks > 150 chars, else
    NULL), and position_in_document.  Driver-facing transforms on the
    faithful ENRICHED_SCHEMA: keywords list → CSV string,
    structural_level NULL → -1 (numeric-sentinel rule)."""
    import re as _re
    import ray.data as rd
    from graphrag_rs_ray.stages.enrich import EnrichedChunkStage

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def to_ascii(batch: pa.Table) -> pa.Table:
        ids = [f"doc{i}" for i in batch.column("doc_id").to_pylist()]
        texts = [_re.sub(r"[^\x00-\x7f]", "_", x or "")
                 for x in batch.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "text": pa.array(texts, pa.string())})

    docs = ds.map_batches(to_ascii, batch_format="pyarrow")

    def doclens(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "doc_len": pa.array([max(len(x), 1)
                                 for x in t.column("text").to_pylist()],
                                pa.int64())})

    _stage(docs.map_batches(doclens, batch_format="pyarrow"),
           "enriched_chunks", sf_dir, sub="doclens")

    def section_rows(t: pa.Table) -> pa.Table:
        from graphrag_rs_ray.functions.layout import parse_layout
        cols = {k: [] for k in ("doc_id", "sec_idx", "heading_text",
                                "level", "start_offset", "content_end",
                                "parent")}
        # sentinel row so the staged dir is never empty (synthetic docs
        # may contain zero plaintext headings); '__none__' matches no doc
        cols["doc_id"].append("__none__")
        cols["sec_idx"].append(0)
        cols["heading_text"].append("")
        cols["level"].append(0)
        cols["start_offset"].append(0)
        cols["content_end"].append(0)
        cols["parent"].append(-1)
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            _, sections, _ = parse_layout(text or "", "plaintext")
            for i, s in enumerate(sections):
                cols["doc_id"].append(did)
                cols["sec_idx"].append(i)
                cols["heading_text"].append(s.heading.text)
                cols["level"].append(s.heading.level)
                cols["start_offset"].append(s.heading.start_offset)
                cols["content_end"].append(s.content_end)
                cols["parent"].append(-1 if s.parent_section is None
                                      else s.parent_section)
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "sec_idx": pa.array(cols["sec_idx"], pa.int64()),
            "heading_text": pa.array(cols["heading_text"], pa.string()),
            "level": pa.array(cols["level"], pa.int32()),
            "start_offset": pa.array(cols["start_offset"], pa.int64()),
            "content_end": pa.array(cols["content_end"], pa.int64()),
            "parent": pa.array(cols["parent"], pa.int64())})

    _stage(docs.map_batches(section_rows, batch_format="pyarrow"),
           "enriched_chunks", sf_dir, sub="sections")

    cfg = KGConfig(chunk_size=400, chunk_overlap=50)
    enriched = docs.map_batches(EnrichedChunkStage(cfg),
                                batch_format="pyarrow")
    _stage(enriched.map_batches(
        lambda t: t.select(["chunk_id", "doc_id", "text", "start", "end"]),
        batch_format="pyarrow"), "enriched_chunks", sf_dir)

    def for_driver(t: pa.Table) -> pa.Table:
        kws = [",".join(x) for x in t.column("keywords").to_pylist()]
        lvl = [(-1 if v is None else v)
               for v in t.column("structural_level").to_pylist()]
        t = t.drop_columns(["keywords", "structural_level"])
        return (t.append_column("keywords_csv", pa.array(kws, pa.string()))
                 .append_column("structural_level", pa.array(lvl, pa.int32())))

    return enriched.map_batches(for_driver, batch_format="pyarrow")


def q_semantic_chunks(sf_dir: str):
    """Semantic chunking (``text/semantic_chunking.rs``): percentile-80
    breakpoints over hash-embedding cosine distances.  The SENTENCES and
    per-adjacent-pair DISTANCES are staged (embeddings are procedural);
    DuckDB replays the percentile threshold (sort-index with the
    ``int(n*p/100)`` clamp), the ``d > thr`` breakpoint flags, and the
    segment assembly (cumsum window + ordered string_agg).  At this
    config (min_chunk_size=1, max_chunk_size=0) the merge/split arms are
    provably no-ops, so assembly is exact."""
    from graphrag_rs_ray.functions.semantic_chunking import (
        SemanticChunker, SemanticChunkerConfig, split_sentences)
    from graphrag_rs_ray.pipelines.training_data import _docs

    def sent_diffs(t: pa.Table) -> pa.Table:
        ch = SemanticChunker(SemanticChunkerConfig(
            breakpoint_strategy="percentile", threshold_amount=80.0))
        dids, idxs, sents, diffs = [], [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            ss = split_sentences(text or "")
            if not ss:
                continue
            ds = (ch._distances(ch.embedder.embed_many(ss))
                  if len(ss) > 1 else [])
            for i, s in enumerate(ss):
                dids.append(did)
                idxs.append(i)
                sents.append(s)
                diffs.append(float(ds[i]) if i < len(ds) else None)
        return pa.table({"doc_id": pa.array(dids, pa.int64()),
                         "sent_idx": pa.array(idxs, pa.int64()),
                         "sentence": pa.array(sents, pa.string()),
                         "diff": pa.array(diffs, pa.float64())})

    _stage(_docs(sf_dir).map_batches(sent_diffs, batch_format="pyarrow"),
           "semantic_chunks", sf_dir)
    return td.semantic_chunks(sf_dir)


def q_consistency_report(sf_dir: str):
    """ConsistencyReport (``graph/incremental.rs:439-452,2496-2539``) over
    a deterministically-corrupted copy of the KG: every 5th entity row
    (by name-hash) dropped → broken relationships + orphan candidates;
    every 3rd embedding nulled → missing embeddings.  The corrupted
    entities + triples are staged; DuckDB recomputes all counts."""
    import hashlib
    from graphrag_rs_ray.state.transactions import consistency_report
    res = _kg_result(sf_dir)

    def corrupt(t: pa.Table) -> pa.Table:
        names = t.column("name").to_pylist()
        h = [int(hashlib.md5(n.encode()).hexdigest()[:8], 16) for n in names]
        keep = pa.array([x % 5 != 0 for x in h])
        kept = t.filter(keep)
        kh = [x for x in h if x % 5 != 0]
        emb = [None if x % 3 == 0
               else [float((x >> i) & 1) for i in range(8)] for x in kh]
        return kept.append_column(
            "embedding", pa.array(emb, pa.list_(pa.float64())))

    ents = _stage(res.entities.map_batches(corrupt, batch_format="pyarrow"),
                  "consistency_report", sf_dir)
    tris = _stage(res.triples.map_batches(
        lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"),
        "consistency_report", sf_dir, sub="triples")
    import ray.data as rd
    return rd.from_arrow(consistency_report(ents, tris))


def q_communities(sf_dir: str):
    """Leiden level-0 communities (``graph/leiden.rs`` via the
    per-connected-component distribution in pipelines/communities.py).
    Oracle device: only the genuinely sequential local-move pass is staged
    (node → ``lm`` key); DuckDB re-derives the Leiden refinement split
    (per-``lm`` connected components via recursive-CTE reachability over
    the staged edges, ``leiden.rs:594-668``) and the min-member community
    labeling independently."""
    from graphrag_rs_ray.pipelines.communities import (
        _und_edges,
        detect_communities_from_edges,
    )
    edges = _stage(
        _und_edges(_kg_ds(sf_dir, "triples")).materialize(),
        "communities", sf_dir, sub="edges")
    assign = _stage(
        detect_communities_from_edges(edges, emit_local_move=True),
        "communities", sf_dir, sub="assign")
    return assign.map_batches(lambda t: t.select(["node", "community"]),
                              batch_format="pyarrow")


def q_chunk_embeddings(sf_dir: str):
    from graphrag_rs_ray.stages.embed import EmbedStage
    from graphrag_rs_ray.stages.memo import memoized_stage
    fn = memoized_stage(("embed", "text", 64), lambda: EmbedStage("text", 64))
    return q_kg_chunks(sf_dir).map_batches(fn, batch_format="pyarrow",
                                           batch_size=None).map_batches(
        lambda t: t.select(["chunk_id", "embedding"]), batch_format="pyarrow")


def q_simhash_dup_pairs_manku(sf_dir: str):
    """Manku/Jain/Sarma 2007 permuted-prefix simhash twin.  CROSS-PATH
    oracle: Ray derives candidates via the 20 permuted-prefix tables,
    DuckDB independently via 4×16 pigeonhole banding — both have exact
    recall for Hamming ≤ 3 and the same popcount verify, so agreement
    proves both constructions."""
    sigs = _stage(td.simhash_signatures(sf_dir),
                  "simhash_dup_pairs_manku", sf_dir)
    return td.simhash_dup_pairs_manku(sf_dir, sigs_ds=sigs)


def q_neural_embeddings(sf_dir: str):
    """Neural-provider seam (rows-only: procedural float32 MLP math has
    no SQL twin): fixed-weight 17 MB encoder loaded once per actor,
    batched encode over documents.  Distributed==local equality is
    unit-gated (``tests/test_neural_embed.py``)."""
    import ray.data as rd

    from graphrag_rs_ray.stages.embed import NeuralEmbedStage
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs.map_batches(NeuralEmbedStage, batch_format="pyarrow",
                            batch_size=256, concurrency=2).map_batches(
        lambda t: t.select(["doc_id", "embedding"]),
        batch_format="pyarrow")


def q_multimodal_features(sf_dir: str):
    """Actor-pool fake-codec decode (``DeterministicFakeDecoder``):
    features = BLAKE2b(payload) bytes / 255 as f32, width/height from the
    digest tail.  The DIGESTS are staged (the ``simhash_signatures``
    blake2b-vocab device — SQL can't hash, but every derived number is
    re-computed in DuckDB: the /255 f32 cast and the 16 + d % 240 dims).
    Driver-facing transform: the f32 feature list is exploded to
    (dim, value) rows (list cells hash engine-dependently)."""
    import hashlib
    from graphrag_rs_ray.stages.multimodal import decode_features, media_from_documents

    def digests(t: pa.Table) -> pa.Table:
        ds = [list(hashlib.blake2b(p or b"", digest_size=18).digest())
              for p in t.column("payload").to_pylist()]
        return pa.table({"media_id": t.column("media_id"),
                         "media_type": t.column("media_type"),
                         "n_bytes": pa.array(
                             [len(p or b"") for p in t.column("payload").to_pylist()],
                             pa.int64()),
                         "digest": pa.array(ds, pa.list_(pa.int64()))})

    _stage(media_from_documents(sf_dir).map_batches(
        digests, batch_format="pyarrow"), "multimodal_features", sf_dir)

    feats = decode_features(media_from_documents(sf_dir))

    def explode(t: pa.Table) -> pa.Table:
        ids, types, nb, w, h, dim, val = [], [], [], [], [], [], []
        for i in range(t.num_rows):
            f = t.column("feature")[i].as_py()
            for d, v in enumerate(f):
                ids.append(t.column("media_id")[i].as_py())
                types.append(t.column("media_type")[i].as_py())
                nb.append(t.column("n_bytes")[i].as_py())
                w.append(t.column("width")[i].as_py())
                h.append(t.column("height")[i].as_py())
                dim.append(d)
                val.append(v)
        return pa.table({"media_id": pa.array(ids, pa.string()),
                         "media_type": pa.array(types, pa.string()),
                         "n_bytes": pa.array(nb, pa.int64()),
                         "width": pa.array(w, pa.int32()),
                         "height": pa.array(h, pa.int32()),
                         "dim": pa.array(dim, pa.int64()),
                         "value": pa.array(val, pa.float32())})

    return feats.map_batches(explode, batch_format="pyarrow")


def q_frame_samples(sf_dir: str):
    """Video frame sampling STRUCTURE (media_id, frame_idx, t_offset_s):
    the media rows are staged, and DuckDB re-derives the per-video frame
    explosion arithmetically (duration = n_bytes // 1000 + 1, evenly
    spaced timestamps).  The frame payload bytes stay out of the oracle
    (blake2b fake behind the codec boundary)."""
    from graphrag_rs_ray.stages.multimodal import media_from_documents, sample_frames
    media = _stage(media_from_documents(sf_dir).map_batches(
        lambda t: t.select(["media_id", "media_type", "n_bytes"]),
        batch_format="pyarrow"), "frame_samples", sf_dir)
    full = media_from_documents(sf_dir)
    return sample_frames(full).map_batches(
        lambda t: t.select(["media_id", "frame_idx", "t_offset_s"]),
        batch_format="pyarrow")


def q_concept_mentions(sf_dir: str):
    """Concept extraction per chunk (``lightrag/concept_graph.rs:
    119-264``): capitalized + general noun-phrase regexes, top-20
    freq≥2 keywords (trimmed, non-stopword), validity gates, sorted +
    deduped.  The chunk TEXTS are staged and the oracle replays the
    ENTIRE extraction in SQL (regexp_extract_all matches Python
    finditer on this corpus — verified; keywords re-ranked with the
    same count-desc/word-asc tie-break)."""
    import re as _re
    from graphrag_rs_ray.pipelines.concepts import concept_mention_rows

    def ascii_chunks(t: pa.Table) -> pa.Table:
        # Python/Rust \b is Unicode, RE2's is ASCII — '_' is a word
        # char in BOTH, so mapping non-ASCII to '_' keeps boundary
        # behavior identical across engines (the production pipeline
        # runs on the raw text; this query runs on the staged copy)
        texts = [_re.sub(r"[^\x00-\x7f]", "_", x or "")
                 for x in t.column("text").to_pylist()]
        return pa.table({"chunk_id": t.column("chunk_id"),
                         "text": pa.array(texts, pa.string())})

    chunks = _stage(q_kg_chunks(sf_dir).map_batches(
        ascii_chunks, batch_format="pyarrow"), "concept_mentions",
        sf_dir)
    return concept_mention_rows(chunks)


def q_concept_table(sf_dir: str):
    from graphrag_rs_ray.pipelines.concepts import (
        concept_mention_rows, concept_table_from_mentions)
    mentions = _stage(concept_mention_rows(q_kg_chunks(sf_dir)),
                      "concept_table", sf_dir)
    return concept_table_from_mentions(mentions)


def q_concept_edges(sf_dir: str):
    """Concept co-occurrence edges; the per-chunk concept lists are staged
    as mention rows so the pair/Jaccard derivation is oracle-checked."""
    from graphrag_rs_ray.pipelines.concepts import (
        concept_chunk_lists, concept_edges_from_lists, mentions_from_lists)
    lists = concept_chunk_lists(q_kg_chunks(sf_dir)).materialize()
    _stage(mentions_from_lists(lists), "concept_edges", sf_dir)
    return concept_edges_from_lists(lists)


def q_minhash_lsh_candidates(sf_dir: str):
    """MinHash-LSH candidate pairs; the band rows (doc_id, band,
    band_hash) are staged so the band→candidate derivation (equal-bucket
    self-join + band count) is oracle-checked; the signature/band hashing
    itself stays unit-gated (not SQL-expressible)."""
    bands = _stage(td.minhash_signatures(sf_dir), "minhash_lsh_candidates",
                   sf_dir)
    return td.minhash_lsh_candidates(sf_dir, bands_ds=bands)


def q_lsh_buckets(sf_dir: str):
    """Hyperplane-LSH bucket ids; the plane matrix is staged so DuckDB
    re-derives sign(list_dot_product)→bit-packing from the same planes."""
    import ray.data as rd
    import pyarrow.parquet as _pq
    emb0 = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["embedding"])[:1]
    d = len(emb0.column("embedding")[0])
    planes = td.lsh_planes(d)
    ptbl = pa.table({
        "plane_idx": pa.array(range(len(planes)), pa.int64()),
        "plane": pa.array([p.tolist() for p in planes],
                          pa.list_(pa.float64()))})
    _stage(rd.from_arrow(ptbl), "lsh_buckets", sf_dir)
    return td.lsh_buckets(sf_dir)


def q_ngram_dedup_pairs(sf_dir: str):
    """n-gram Jaccard verify of the LSH candidates; the candidate pairs
    are staged and DuckDB independently re-computes the character-trigram
    Jaccard from the documents table."""
    cand = _stage(td.minhash_lsh_candidates(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"),
        "ngram_dedup_pairs", sf_dir)
    return td.ngram_dedup_pairs(sf_dir, cand_ds=cand)


def q_dedup_clusters(sf_dir: str):
    """Transitive near-dup clustering (pairs → connected components →
    min-member representative).  The candidate pairs are staged; DuckDB
    independently re-computes the trigram-Jaccard verify from
    ``documents``, the recursive reachability closure over the verified
    pairs, the min-member cluster label, sizes and the keep flag."""
    cand = _stage(td.minhash_lsh_candidates(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"),
        "dedup_clusters", sf_dir)
    return td.dedup_clusters(sf_dir, cand_ds=cand)


def q_simhash_dup_pairs(sf_dir: str):
    """SimHash near-dup pairs (4×16-bit pigeonhole bands → exact Hamming
    verify ≤ 3).  The signature rows are staged; DuckDB independently
    re-derives band slicing, the band-equality self-join and the
    ``bit_count(xor(...))`` Hamming verify."""
    sigs = _stage(td.simhash_signatures(sf_dir), "simhash_dup_pairs",
                  sf_dir)
    return td.simhash_dup_pairs(sf_dir, sigs_ds=sigs)


_BPE_CACHE: dict[tuple, tuple] = {}


def _bpe_learned(sf_dir: str, n_merges: int = 20, max_types: int = 300):
    """Driver-side learned merges, cached per process (the three BPE
    queries and bench share one learning pass — at scale the merge table
    is learned once and persisted, like the KG checkpoints)."""
    key = (sf_dir, n_merges, max_types)
    if key not in _BPE_CACHE:
        mdf = td.bpe_merges(sf_dir, n_merges=n_merges, max_types=max_types)
        _BPE_CACHE[key] = (mdf, list(zip(mdf["lhs"], mdf["rhs"])))
    return _BPE_CACHE[key]


def q_bpe_merges(sf_dir: str):
    """Learned BPE merge table (rnk, lhs, rhs).  Oracle: the whole
    Sennrich+ 2016 learning loop as generated SQL (one weighted-argmax +
    window merge pass per rank) straight from ``documents`` — zero
    staging."""
    return _bpe_learned(sf_dir)[0]


def q_bpe_segments(sf_dir: str):
    """Per-distinct-word BPE segmentation under the learned merges."""
    return td.bpe_segments(sf_dir, merges=_bpe_learned(sf_dir)[1])


def q_bpe_token_stats(sf_dir: str):
    """Per-document BPE piece counts (stateless map, per-worker memo)."""
    return td.bpe_token_stats(sf_dir, merges=_bpe_learned(sf_dir)[1])


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas+ 2023): k-means-blocked semantic near-dedup.
    The (vec_id, cluster, csim) ASSIGNMENT is staged (the ``ivf_topk``
    device): the argmax and the keep-ordering csim are float-op-order
    surfaces (numpy normalize-then-matmul vs DuckDB
    list_cosine_similarity — a near-threshold ulp flips verdicts), so
    DuckDB consumes Python's own assignment and independently
    re-derives the within-cluster cosine pair graph, reachability
    closure, min-member group label and the keep-least-central rule."""
    _, _, cent, _ = td.ivf_index(sf_dir, n_queries=1, n_centroids=8,
                                 nprobe=1)
    asg = td.semdedup_assignments(sf_dir, cent).map_batches(
        lambda t: t.select(["vec_id", "cluster", "csim"]),
        batch_format="pyarrow")
    _stage(asg, "semdedup", sf_dir)
    return td.semdedup(sf_dir, cent=cent)


def q_corpus_curation(sf_dir: str):
    """End-to-end webtext curation (language/quality gates → exact dedup
    → MinHash-LSH near-dedup).  Only the MinHash band rows over the
    exact-dedup survivors are staged (the signature hashing is not
    SQL-expressible); DuckDB independently re-derives the annotate +
    filter + exact-dedup stages straight from ``documents``, the
    band→candidate self-join, the char-trigram Jaccard verify and the
    drop-larger-id rule."""
    surv = td.curation_survivors(sf_dir).materialize()
    bands = _stage(td.minhash_signatures(sf_dir, docs_ds=surv.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")),
        "corpus_curation", sf_dir)
    return td.corpus_curation(sf_dir, survivors_ds=surv, bands_ds=bands)


def q_simhash_signatures(sf_dir: str):
    """SimHash signatures; the per-word 64-bit hashes (blake2b — not
    available in SQL) are staged as a vocab table and DuckDB re-derives
    tokenize → per-bit vote → signature packing."""
    _stage(td.simhash_vocab(sf_dir), "simhash_signatures", sf_dir)
    return td.simhash_signatures(sf_dir)


def q_ivf_topk(sf_dir: str):
    """IVF ANN top-k; the inverted-list assignments and per-query probe
    lists are staged, and DuckDB re-derives the exact within-probed-lists
    cosine top-k (the scan+rank half of the operator; centroid training
    stays unit-gated)."""
    import ray.data as rd
    qids, qmat, cent, probe = td.ivf_index(sf_dir)
    _stage(td.ivf_assignments(sf_dir, cent), "ivf_topk", sf_dir)
    prows = pa.table({
        "query_id": pa.array([q for i, q in enumerate(qids)
                              for _ in probe[i]], pa.int64()),
        "cluster": pa.array([int(c) for i in range(len(qids))
                             for c in probe[i]], pa.int64())})
    _stage(rd.from_arrow(prows), "ivf_topk", sf_dir, sub="probe")
    return td.ivf_topk(sf_dir)


def q_hnsw_topk(sf_dir: str):
    """HNSW ANN top-k (per-shard navigable-small-world graphs,
    ``vector/mod.rs:54-178`` surface, Malkov-Yashunin algorithm); the
    per-shard ef_search candidate pools are staged and DuckDB re-derives
    the exact within-candidates cosine top-k — the rerank half of the
    operator; graph navigation recall is gated by ``test_hnsw_recall``."""
    cand = _stage(td.hnsw_shard_candidates(sf_dir), "hnsw_topk", sf_dir)
    return td.hnsw_topk(sf_dir, cand_ds=cand)


def q_hybrid_search(sf_dir: str):
    """RRF fusion of the BM25 + dense rankings; the (ranker, rank,
    doc_id) lists are staged so the fusion arithmetic is oracle-checked."""
    import ray.data as rd
    rankings = _stage(rd.from_arrow(td.hybrid_rankings(sf_dir)),
                      "hybrid_search", sf_dir)
    return td.hybrid_search(sf_dir, rankings=rankings)


def q_community_summaries(sf_dir: str):
    """Per-community summaries (``leiden.rs:139-230``
    ``generate_community_summary``): header + entity count + one line per
    type listing the top-5 members, 500-char truncation.  The community
    ASSIGNMENT is procedural (Leiden local move), so the joined
    (node, community, name, type, mention_count) rows are staged and
    DuckDB re-assembles EVERY summary string (ordered string_agg,
    overflow '' and N more'', truncation)."""
    from graphrag_rs_ray.pipelines.communities import (
        community_summaries_from_joined, detect_communities)
    from graphrag_rs_ray.stages.hashagg import bucketed_join
    res = _kg_result(sf_dir)
    assign = detect_communities(res.triples)
    ents = res.entities.map_batches(
        lambda t: pa.table({"node": t.column("entity_id"),
                            "name": t.column("name"),
                            "type": t.column("type"),
                            "mention_count": t.column("mention_count")}),
        batch_format="pyarrow")
    joined = _stage(bucketed_join(assign, ents, on=["node"]),
                    "community_summaries", sf_dir)
    return community_summaries_from_joined(joined)


def q_rerank_topk(sf_dir: str):
    """Confidence cross-encoder rerank (``reranking/cross_encoder.rs:
    93-196``) of the BM25 top-50: Jaccard-overlap × length-factor
    relevance, sigmoid-normalized, re-ranked top-10.  Fully
    SQL-expressible — the oracle recomputes BM25, the candidate cut AND
    the relevance arithmetic straight from ``documents`` (no staging)."""
    from graphrag_rs_ray.pipelines.retrieval import rerank_candidates
    cand = {r["doc_id"]: r["score"]
            for r in td.bm25_topk(sf_dir, k=50).take_all()}
    import ray.data as rd
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return rerank_candidates(docs, cand, "fast hash join")


def q_hipporag_retrieval(sf_dir: str):
    """HippoRAG PPR retrieval (``retrieval/hipporag_ppr.rs:87-305``) over
    the synthetic KG: facts = deduped triples scored by query-fact
    hash-embedding cosine (top-100); dense passage shortlist = chunk
    embeddings vs the query (top-20); entity reset weights downweighted
    by passage frequency; personalized PageRank (damping 0.5, FIXED 8
    iterations) over the entity+passage graph; passages ranked by PPR.
    The top-k facts, entity-passage pairs, dense scores and the edge
    table are staged — DuckDB re-derives weights → reset distribution →
    the full PPR recurrence → the final ranking."""
    import pyarrow.parquet as _pq
    import ray.data as rd
    from graphrag_rs_ray.pipelines import retrieval as rtr
    from graphrag_rs_ray.pipelines.kg import dedup_triples
    from graphrag_rs_ray.stages.kg_extract import triples_only

    cfg = KGConfig()
    query = "research university professor"
    chunks = _kg_ds(sf_dir, "chunks")
    combined = _kg_ds(sf_dir, "combined")
    mentions = combined.map_batches(entities_only, batch_format="pyarrow")
    triples = _kg_ds(sf_dir, "triples")

    facts_ds = (rtr.fact_scores(triples, query)
                .sort(["score", "subj", "pred", "obj"],
                      descending=[True, False, False, False]).limit(100))
    _stage(facts_ds, "hipporag_retrieval", sf_dir, "facts")
    facts_topk = _pq.read_table(
        _stage_path("hipporag_retrieval", sf_dir, "facts"))

    ep = _stage(rtr.entity_passage_pairs(mentions),
                "hipporag_retrieval", sf_dir, "ep")

    ps_ds = rtr.passage_dense_scores(chunks, query, top_n=20)
    _stage(ps_ds, "hipporag_retrieval", sf_dir, "ps")
    ps_tbl = _pq.read_table(_stage_path("hipporag_retrieval", sf_dir, "ps"))

    tri_edges = triples.map_batches(
        lambda t: pa.table({"src": t.column("subj"), "dst": t.column("obj")}),
        batch_format="pyarrow")
    ep_fwd = ep.map_batches(
        lambda t: pa.table({"src": t.column("entity"),
                            "dst": t.column("passage")}),
        batch_format="pyarrow")
    ep_rev = ep.map_batches(
        lambda t: pa.table({"src": t.column("passage"),
                            "dst": t.column("entity")}),
        batch_format="pyarrow")
    edges = _stage(tri_edges.union(ep_fwd).union(ep_rev),
                   "hipporag_retrieval", sf_dir, "edges")

    return rtr.hipporag_retrieve(facts_topk, ep, ps_tbl, edges,
                                 ppr_iterations=8)


def q_pagerank_retrieval(sf_dir: str):
    """PageRank-based retrieval — the fast-GraphRAG search
    (``retrieval/pagerank_retrieval.rs:134-330``): list-Jaccard vector
    similarity over "name entity_type" + the +0.3 per-mention
    query-in-chunk bonus → normalized reset over a 1/n default →
    personalized PageRank on the weighted entity graph (weight-sum
    out-degrees, uniform dangling redistribution — the reference's
    production parallel path; FIXED 12 iterations, per-iteration
    round-8) → 0.3/0.4 combination, 0.1 threshold → chunk expansion
    with the ``entity_<id>`` fallback quirk → top-25.

    Entities, mention rows, chunk texts and the pre-summed weighted
    edge table are staged; DuckDB replays similarity → reset → the full
    recurrence → combination → expansion."""
    from graphrag_rs_ray.functions.pagerank_retrieval import (
        PageRankRetrievalConfig)
    from graphrag_rs_ray.pipelines.kg import dedup_triples
    from graphrag_rs_ray.pipelines.pagerank_retrieval import (
        search_with_pagerank, weighted_edges)
    from graphrag_rs_ray.stages.canonicalize import (
        entity_bucket_merge, partial_entity_agg)
    from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate
    from graphrag_rs_ray.stages.kg_extract import triples_only

    cfg = KGConfig()
    query = "university of berlin"
    chunks = _kg_ds(sf_dir, "chunks")
    combined = _kg_ds(sf_dir, "combined")
    mentions = combined.map_batches(entities_only, batch_format="pyarrow")

    ents = _kg_ds(sf_dir, "entities")
    ents_st = _stage(ents.map_batches(
        lambda t: t.select(["entity_id", "name", "type"]),
        batch_format="pyarrow"), "pagerank_retrieval", sf_dir, "ents")
    men_st = _stage(mentions.map_batches(
        lambda t: t.select(["entity_id", "chunk_id", "mention_count"]),
        batch_format="pyarrow"), "pagerank_retrieval", sf_dir, "mentions")
    ch_st = _stage(chunks.map_batches(
        lambda t: t.select(["chunk_id", "text"]), batch_format="pyarrow"),
        "pagerank_retrieval", sf_dir, "chunks")

    tri = _kg_ds(sf_dir, "triples")
    edges_st = _stage(
        weighted_edges(tri.map_batches(_synth_conf, batch_format="pyarrow")),
        "pagerank_retrieval", sf_dir, "edges")

    return search_with_pagerank(ents_st, men_st, ch_st, None, query,
                                PageRankRetrievalConfig(),
                                edges_ds=edges_st)


def _planner_specs():
    """Deterministic optimizer workload over the KG's three entity
    types — every ``QueryOp`` variant, both swap directions, the 3-leaf
    greedy multi-way case, and nested compositions
    (``query/optimizer.rs`` test shapes, widened)."""
    p = ("scan", "PERSON")
    o = ("scan", "ORGANIZATION")
    loc = ("scan", "LOCATION")
    return [
        ("q01_scan", p),
        ("q02_filter", ("filter", "name", "alice")),
        ("q03_join_swap", ("join", p, loc, "inner")),
        ("q04_join_noswap", ("join", loc, p, "inner")),
        ("q05_multiway", ("join", ("join", p, o, "inner"), loc, "inner")),
        ("q06_neighbors2", ("neighbors", p, "related_to", 2)),
        ("q07_union", ("union", o, loc)),
        ("q08_limit", ("limit", ("join", p, o, "inner"), 10)),
        ("q09_cross", ("join", o, loc, "cross")),
        ("q10_leftouter", ("join", p, loc, "leftouter")),
        ("q11_nbr_filter", ("neighbors", ("filter", "type", "PERSON"),
                            None, 1)),
        ("q12_union_joins", ("union", ("join", p, loc, "inner"),
                             ("limit", o, 5))),
    ]


def q_hybrid_fusion(sf_dir: str):
    """Hybrid KG retrieval (``retrieval/hybrid.rs``): the entity+chunk
    corpus (namespaced ids, "name type" entity content) scored two ways
    — hash-embedding cosine and BM25 — then ALL FOUR fusion methods
    (RRF / Weighted / CombSUM / MaxScore) over the staged shortlists,
    one ``method`` cohort each.  RRF runs with threshold 0 (the
    reference DEFAULT threshold 0.1 exceeds RRF's maximum possible
    score (0.7+0.3)/61 — zero-result quirk pinned in unit tests); the
    other three keep the 0.1 default."""
    import pyarrow.parquet as _pq
    import ray.data as rd
    from graphrag_rs_ray.functions.hybrid_fusion import (
        FUSION_METHODS, HybridFusionConfig)
    from graphrag_rs_ray.pipelines.hybrid import (
        fuse_tables, keyword_shortlist, kg_corpus, semantic_shortlist)
    from graphrag_rs_ray.stages.canonicalize import (
        entity_bucket_merge, partial_entity_agg)
    from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate

    cfg = KGConfig()
    query = "university professor research"
    chunks = _kg_ds(sf_dir, "chunks")
    ents = _kg_ds(sf_dir, "entities")
    corpus = kg_corpus(ents, chunks).materialize()

    _stage(semantic_shortlist(corpus, query), "hybrid_fusion", sf_dir,
           "sem")
    _stage(keyword_shortlist(corpus, query), "hybrid_fusion", sf_dir, "kw")
    sem_tbl = _pq.read_table(_stage_path("hybrid_fusion", sf_dir, "sem"))
    kw_tbl = _pq.read_table(_stage_path("hybrid_fusion", sf_dir, "kw"))

    cfgs = [HybridFusionConfig(min_score_threshold=0.0)
            if m == "rrf" else HybridFusionConfig()
            for m in FUSION_METHODS]
    return rd.from_arrow(fuse_tables(sem_tbl, kw_tbl, FUSION_METHODS,
                                     cfgs))


_ADAPTIVE_QUERIES = [
    ("q1", "connections between berlin and tokyo"),
    ("q2", "the theory of knowledge and meaning"),
    ("q3", "quarterly revenue growth figures"),
]
_ADAPTIVE_COHORTS = [
    ("q1c08", "q1", 0.8), ("q2c08", "q2", 0.8), ("q3c08", "q3", 0.8),
    ("q1c03", "q1", 0.3),          # below-0.6 → balanced complex weights
]


def q_adaptive_fusion(sf_dir: str):
    """Adaptive strategy selection (``retrieval/adaptive.rs:129-254``
    + the analyzer ``retrieval/mod.rs:600-650``): four distributed
    strategy shortlists per query (hash-cosine vector, entity-match
    graph signal, summary-BM25 hierarchical, text-BM25), fused by the
    weights the analyzer's query type selects — trunc(10·w) truncation,
    ×w weighting, keep-max dedup, score-desc ranking.  Four cohorts:
    three high-confidence query types + one low-confidence cohort
    proving the balanced-weights fallback.  Entities, per-chunk entity
    strings and all four shortlists are staged; the oracle re-derives
    the query type (mutual-substring key-entity rule) and the whole
    fusion from them.  The stateful diversity-aware selection pass is
    unit-gated (``test_adaptive_retrieval``)."""
    import pyarrow.parquet as _pq
    import ray.data as rd
    from graphrag_rs_ray.functions.adaptive_retrieval import AdaptiveConfig
    from graphrag_rs_ray.pipelines.adaptive import (
        adaptive_fuse, analyze_query, graph_strategy_shortlist)
    from graphrag_rs_ray.pipelines.enriched import chunk_entity_names
    from graphrag_rs_ray.pipelines.hybrid import (
        keyword_shortlist_multi, semantic_shortlist_multi)
    from graphrag_rs_ray.stages.canonicalize import (
        entity_bucket_merge, partial_entity_agg)
    from graphrag_rs_ray.stages.enrich import EnrichedChunkStage
    from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate

    cfg = KGConfig()
    pages = _kg_pages(sf_dir)
    chunks = _kg_ds(sf_dir, "chunks")
    combined = _kg_ds(sf_dir, "combined")
    mentions = combined.map_batches(entities_only, batch_format="pyarrow")

    ents = _kg_ds(sf_dir, "entities")
    _stage(ents.map_batches(lambda t: t.select(["name"]),
                            batch_format="pyarrow"),
           "adaptive_fusion", sf_dir, "ents")
    _stage(chunk_entity_names(mentions).materialize(),
           "adaptive_fusion", sf_dir, "chunkents")

    corpus_text = chunks.map_batches(
        lambda t: pa.table({"id": t.column("chunk_id"),
                            "content": t.column("text")}),
        batch_format="pyarrow").materialize()
    summaries = (pages.map_batches(extract_text_stage,
                                   batch_format="pyarrow")
                 .map_batches(EnrichedChunkStage(cfg),
                              batch_format="pyarrow")
                 .map_batches(lambda t: pa.table({
                     "id": t.column("chunk_id"),
                     "content": t.column("summary")}),
                     batch_format="pyarrow")).materialize()

    def tag(ds, qid):
        return ds.map_batches(
            lambda t, _q=qid: t.append_column(
                "query_id", pa.array([_q] * t.num_rows, pa.string())),
            batch_format="pyarrow")

    per_strategy = {"vec": [], "grf": [], "hier": [], "bm": []}
    # round_digits=6: staged score × ≤2-decimal strategy weight stays
    # exactly 8-decimal → round(ws, 8) can never hit a Python/DuckDB
    # midpoint tie (oracle-parity rule).  Batched variants: ONE
    # embedding pass and ONE BM25 df/len/score pass per corpus cover
    # all three queries (12 shortlist jobs → 3 corpus passes).
    qmap = dict(_ADAPTIVE_QUERIES)
    vec_m = semantic_shortlist_multi(corpus_text, qmap, top_n=10)
    bm_m = keyword_shortlist_multi(corpus_text, qmap, top_n=10)
    hier_m = keyword_shortlist_multi(summaries, qmap, top_n=10)
    for qid, qtext in _ADAPTIVE_QUERIES:
        per_strategy["vec"].append(tag(vec_m[qid], qid))
        per_strategy["grf"].append(tag(
            graph_strategy_shortlist(mentions, qtext, top_n=10), qid))
        per_strategy["hier"].append(tag(hier_m[qid], qid))
        per_strategy["bm"].append(tag(bm_m[qid], qid))
    staged = {}
    for key, parts in per_strategy.items():
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        _stage(ds, "adaptive_fusion", sf_dir, key)
        staged[key] = _pq.read_table(
            _stage_path("adaptive_fusion", sf_dir, key))

    names = sorted(r["name"] for r in _pq.read_table(
        _stage_path("adaptive_fusion", sf_dir, "ents")).to_pylist())
    ce_tbl = _pq.read_table(_stage_path("adaptive_fusion", sf_dir,
                                        "chunkents"))
    chunk_ents = dict(zip(ce_tbl.column("chunk_id").to_pylist(),
                          ce_tbl.column("entities").to_pylist()))
    qtexts = dict(_ADAPTIVE_QUERIES)
    acfg = AdaptiveConfig()
    strategy_of = {"vec": "vector", "grf": "graph", "hier": "hierarchical",
                   "bm": "bm25"}
    cols = {k: [] for k in ("cohort", "rank", "id", "score", "entities",
                            "query_type", "confidence", "vw", "gw", "hw",
                            "bw", "total_before_fusion")}
    for cohort, qid, conf in _ADAPTIVE_COHORTS:
        analysis = analyze_query(qtexts[qid], names)
        tables = {}
        for key, tbl in staged.items():
            m = pa.compute.equal(tbl.column("query_id"), qid)
            sub = tbl.filter(m).sort_by("rank")
            tables[strategy_of[key]] = sub
        fused, weights, total = adaptive_fuse(
            tables, chunk_ents, analysis["query_type"], conf, acfg)
        for rank, (cid, score, ent) in enumerate(fused, 1):
            cols["cohort"].append(cohort)
            cols["rank"].append(rank)
            cols["id"].append(cid)
            cols["score"].append(score)
            cols["entities"].append(ent)
            cols["query_type"].append(analysis["query_type"])
            cols["confidence"].append(conf)
            cols["vw"].append(weights.vector_weight)
            cols["gw"].append(weights.graph_weight)
            cols["hw"].append(weights.hierarchical_weight)
            cols["bw"].append(weights.bm25_weight)
            cols["total_before_fusion"].append(total)
    return rd.from_arrow(pa.table({
        "cohort": pa.array(cols["cohort"], pa.string()),
        "rank": pa.array(cols["rank"], pa.int64()),
        "id": pa.array(cols["id"], pa.string()),
        "score": pa.array(cols["score"], pa.float64()),
        "entities": pa.array(cols["entities"], pa.string()),
        "query_type": pa.array(cols["query_type"], pa.string()),
        "confidence": pa.array(cols["confidence"], pa.float64()),
        "vw": pa.array(cols["vw"], pa.float64()),
        "gw": pa.array(cols["gw"], pa.float64()),
        "hw": pa.array(cols["hw"], pa.float64()),
        "bw": pa.array(cols["bw"], pa.float64()),
        "total_before_fusion": pa.array(cols["total_before_fusion"],
                                        pa.int64())}))


def _staged_conf_entities(query: str, sf_dir: str):
    """Canonical entities with a deterministic synthetic confidence
    (blake2b of the entity_id — the extractor's constant 0.8 would make
    confidence tie-breaks and averages degenerate; same device as
    ``_synth_conf``)."""
    import hashlib
    from graphrag_rs_ray.pipelines.kg import entities_dataset

    ents = _kg_ds(sf_dir, "entities")

    def fin(t: pa.Table) -> pa.Table:
        cs = []
        for eid in t.column("entity_id").to_pylist():
            h = int.from_bytes(hashlib.blake2b(
                eid.encode(), digest_size=8).digest(), "big")
            cs.append(0.05 + (h % 900) / 1000.0)
        return pa.table({"entity_id": t.column("entity_id"),
                         "name": t.column("name"),
                         "type": t.column("type"),
                         "conf": pa.array(cs, pa.float64()),
                         "mention_count": t.column("mention_count")})

    return _stage(ents.map_batches(fin, batch_format="pyarrow"),
                  query, sf_dir, "ents")


def q_semantic_merge_pairs(sf_dir: str):
    """Semantic-merge candidate pairs
    (``entity/semantic_merging.rs:57-88,209-236,519-541``): same-type
    entity pairs with name_sim·0.7 + type·0.3 strictly above the 0.7
    threshold (exact/containment/word-Jaccard name similarity) — the
    order-free half of the grouping, computed per-type distributed
    (cross-type pairs cap at 0.7).  The oracle recomputes ALL pairwise
    similarities (both types) from the staged entities."""
    from graphrag_rs_ray.pipelines.semantic_merge import candidate_pairs
    ents = _staged_conf_entities("semantic_merge_pairs", sf_dir)
    return candidate_pairs(ents, threshold=0.7)


def q_semantic_merge_groups(sf_dir: str):
    """Merge decisions + merged entities per greedy similarity group
    (``semantic_merging.rs:133-185,238-273,333-378``): group-mean
    pairwise name similarity, the >0.8 merge gate with reasoning
    strings, longest-name/confidence best-name (LAST-maximal ties),
    combined descriptions, max(avg conf, decision conf).  The greedy
    star-grouping pass is sequential by reference semantics
    (unit-gated); its assignments are STAGED with member order so the
    oracle re-derives every decision column from the raw entity rows."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.semantic_merge import merge_groups_table
    ents = _staged_conf_entities("semantic_merge_groups", sf_dir)
    rows = sorted(ents.take_all(), key=lambda e: e["entity_id"])
    assignments, groups = merge_groups_table(rows, threshold=0.7)
    _stage(rd.from_arrow(assignments), "semantic_merge_groups", sf_dir,
           "groups")
    return rd.from_arrow(groups)


def _staged_doc_entities(query: str, sf_dir: str):
    """Distinct per-document entities (doc_id, local_entity_id, name)
    from the mention rows — the linker's flattened input
    (``entity_linker.rs:121-134``), staged.  Mention rows come from
    the shared per-process KG cache (one extraction pass feeds the
    whole tool/linking slice)."""
    import ray.data as rd
    from graphrag_rs_ray.stages.hashagg import (
        grouped_arrow_agg, hash_grouped_aggregate)
    mentions = rd.from_arrow(_rograg_inputs(sf_dir)["mentions"])
    flat = hash_grouped_aggregate(
        mentions.map_batches(
            lambda t: pa.table({"doc_id": t.column("doc_id"),
                                "local_entity_id": t.column("entity_id"),
                                "name": t.column("name")}),
            batch_format="pyarrow"),
        ["doc_id", "local_entity_id"],
        grouped_arrow_agg(["doc_id", "local_entity_id"],
                          [("name", "min")],
                          rename=["doc_id", "local_entity_id", "name"]))
    return _stage(flat, query, sf_dir, "flat")


def _linked_clusters(query: str, sf_dir: str):
    """Returns ``(cluster_cols, stats)`` from the columnar hybrid-linking
    twin.  The flat table was just staged to local Parquet — read it back
    with pyarrow on the driver (the linker is the reference's sequential
    driver-side pass anyway); the previous ``Dataset.take_all()`` + 1.2M
    per-row dicts cost 8s of an 11s query, and only the (small) singleton
    set that reaches the greedy fuzzy pass actually needs row objects."""
    import ray.data as rd
    from graphrag_rs_ray.functions.entity_linker import (
        hybrid_linking_columnar)
    _staged_doc_entities(query, sf_dir)
    import pyarrow.dataset as pads
    tbl = (pads.dataset(_stage_path(query, sf_dir, "flat")).to_table()
           .sort_by([("doc_id", "ascending"),
                     ("local_entity_id", "ascending")]))
    cluster_cols, asg_cols, stats = hybrid_linking_columnar(
        tbl.column("doc_id"), tbl.column("local_entity_id"),
        tbl.column("name"))
    _stage(rd.from_arrow(pa.table(asg_cols)), query, sf_dir, "asg")
    return cluster_cols, stats


def q_entity_clusters(sf_dir: str):
    """Cross-document entity linking, hybrid strategy
    (``corpus/entity_linker.rs:330-375``): same-name multi-groups →
    exact clusters (conf 1.0, doc_freq = size, alias = name), singleton
    fall-through → greedy 0.85 fuzzy star pass (char-distance /
    byte-maxlen similarity, conf 0.85, doc_freq hardcoded 1).  Exact
    clusters and every cluster column are re-derived by the oracle from
    the staged flat entities; the greedy pass's assignments are staged
    (order-sequential, unit-gated).  Deterministic ids replace the
    reference's uuid4 (documented)."""
    import ray.data as rd
    cc, _ = _linked_clusters("entity_clusters", sf_dir)
    return rd.from_arrow(pa.table({
        "cluster_id": pa.array(cc["cluster_id"], pa.string()),
        "kind": pa.array(cc["kind"], pa.string()),
        "canonical_name": pa.array(cc["canonical_name"], pa.string()),
        "entity_type": pa.array(cc["entity_type"], pa.string()),
        "n_members": pa.array(cc["n_members"], pa.int64()),
        "confidence_score": pa.array(cc["confidence_score"], pa.float64()),
        "document_frequency": pa.array(cc["document_frequency"], pa.int64()),
        "aliases": pa.array(cc["aliases"], pa.string())}))


def q_entity_clusters_grouped(sf_dir: str):
    """Same clusters as ``q_entity_clusters``, via the DISTRIBUTED twin
    (``pipelines/entity_linking.hybrid_linking_grouped``): the exact
    tier runs hash-partitioned by surface form with no driver state —
    the corpus-scale path — and only the singleton fall-through reaches
    the driver's sequential fuzzy pass.  Stages its own flat + asg; the
    oracle re-derives the exact tier from flat independently (same SQL
    as ``entity_clusters``, different staged dir)."""
    from graphrag_rs_ray.pipelines.entity_linking import (
        hybrid_linking_grouped)
    flat = _staged_doc_entities("entity_clusters_grouped", sf_dir)
    clusters_ds, asg_ds, _ = hybrid_linking_grouped(flat)
    _stage(asg_ds, "entity_clusters_grouped", sf_dir, "asg")
    return clusters_ds


def q_entity_linking_stats(sf_dir: str):
    """LinkingStats for the hybrid run (``entity_linker.rs:45-87,
    476-487``): processed / clusters / exact / fuzzy match counts and
    accuracy = linked/processed — all recomputed by the oracle from the
    staged flat + assignment tables."""
    import ray.data as rd
    _, stats = _linked_clusters("entity_linking_stats", sf_dir)
    return rd.from_arrow(pa.table({
        "entities_processed": pa.array([stats["entities_processed"]],
                                       pa.int64()),
        "clusters_created": pa.array([stats["clusters_created"]],
                                     pa.int64()),
        "exact_matches": pa.array([stats["exact_matches"]], pa.int64()),
        "fuzzy_matches": pa.array([stats["fuzzy_matches"]], pa.int64()),
        "semantic_matches": pa.array([stats["semantic_matches"]],
                                     pa.int64()),
        "lmcd_clusters": pa.array([stats["lmcd_clusters"]], pa.int64()),
        "linking_accuracy": pa.array(
            [round(stats["linking_accuracy"], 8)], pa.float64())}))


def _staged_linker_entities(query: str, sf_dir: str, limit: int = 120):
    """Bounded canonical-entity set (top-``limit`` by mention count,
    entity_id tie-break, names ≤ 100 chars — the oracle's recursive
    Jaro bitmask needs < 126 positions) with the synthetic blake2b
    confidence (same device as ``_staged_conf_entities``), staged."""
    import hashlib

    import pyarrow.compute as pc
    from graphrag_rs_ray.pipelines.kg import entities_dataset

    ents = _kg_ds(sf_dir, "entities")

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(pc.utf8_length(t.column("name")), 100))
        cs = []
        for eid in t.column("entity_id").to_pylist():
            h = int.from_bytes(hashlib.blake2b(
                eid.encode(), digest_size=8).digest(), "big")
            cs.append(0.05 + (h % 900) / 1000.0)
        return pa.table({"entity_id": t.column("entity_id"),
                         "name": t.column("name"),
                         "type": t.column("type"),
                         "conf": pa.array(cs, pa.float64()),
                         "mention_count": t.column("mention_count")})

    bounded = (ents.map_batches(fin, batch_format="pyarrow")
               .sort(["mention_count", "entity_id"],
                     descending=[True, False])
               .limit(limit))
    return _stage(bounded, query, sf_dir, "ents")


def q_string_sim_pairs(sf_dir: str):
    """String-similarity linker pair metrics
    (``entity/string_similarity_linker.rs:129-345``): every same-type
    entity pair's capped-Levenshtein / Jaro-Winkler (UNCONDITIONAL
    prefix bonus) / token-Jaccard similarity, the max combination, and
    the ≥ 0.85 link gate.  Exact-after-normalization pairs
    short-circuit to 1.0 (NULL components).  The oracle replays ALL of
    it from the staged bounded entities — including the reference's
    textbook Jaro matcher via a recursive CTE carrying a HUGEINT
    used-position bitmask (DuckDB's builtin jaro uses a different
    matcher + a 0.7 boost threshold; measured mismatches)."""
    from graphrag_rs_ray.pipelines.string_linking import similarity_pairs
    ents = _staged_linker_entities("string_sim_pairs", sf_dir)
    return similarity_pairs(ents)


def q_string_links(sf_dir: str):
    """Greedy string-similarity linking
    (``string_similarity_linker.rs:66-126``): seed-vs-candidate star
    pass over the entity_id-sorted bounded set, clusters > 1 member,
    canonical = max-confidence member with LAST-maximal ties (Rust
    ``max_by``), links = member → canonical.  The greedy pass is
    order-sequential → its assignments are staged; the oracle
    re-derives canonical selection from confidences AND re-verifies
    every member's similarity-to-seed ≥ 0.85 with the full SQL metric
    stack (a failed pair drops the row → hash mismatch)."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.string_linking import links_table
    ents = _staged_linker_entities("string_links", sf_dir)
    rows = sorted(ents.take_all(), key=lambda e: e["entity_id"])
    assignments, links = links_table(rows)
    _stage(rd.from_arrow(assignments), "string_links", sf_dir, "asg")
    return rd.from_arrow(links)


def q_generated_answers(sf_dir: str):
    """Answer generation (``generation/mod.rs:722-1018`` + the MockLLM
    ``:24-410``): per-query context assembly (primary ≥ 0.7 ∧ type ∈
    {chunk,entity} / supporting ≥ 0.3, stable-sorted, max_sources/2
    truncation, top-3 summaries, 0.5/0.3/0.2 weighted confidence),
    mode-dispatched MockLLM answering — extractive sentence scoring
    with the template-suffix-in-question quirk, hybrid <50-char/"No
    relevant" fallback, insufficient-context short-circuit —
    confidence adjustments (×0.7 short, ×0.5 negative, entity-mention
    boost), citation block + quality assessment strings.  Inputs are
    deterministic retrieval shortlists synthesized from `documents`
    and staged; the oracle replays the ENTIRE path in SQL (sentence
    split, per-word scoring, stable ranks, %.1f/%.2f formatting,
    md5 of the formatted citations)."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from graphrag_rs_ray.pipelines.generation import (
        generated_answers, synthesize_generation_inputs)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    order = pa.compute.sort_indices(docs.column("doc_id"))
    docs = docs.take(order)
    queries, results, summaries = synthesize_generation_inputs(
        [str(i) for i in docs.column("doc_id").to_pylist()],
        docs.column("text").to_pylist())
    _stage(rd.from_arrow(queries), "generated_answers", sf_dir, "q")
    r_ds = _stage(rd.from_arrow(results), "generated_answers", sf_dir,
                  "r")
    h_ds = _stage(rd.from_arrow(summaries), "generated_answers", sf_dir,
                  "h")
    return generated_answers(r_ds, h_ds, queries)


def q_lazy_chunks(sf_dir: str):
    """LazyGraphRAG fixed-size overlap chunker
    (``lightrag/lazy_pipeline.rs:236-271``): 512-char windows, 128
    overlap, next start = end − overlap, ``{doc}_{k}`` ids, loop breaks
    when a window reaches the end.  Zero staging — the oracle replays
    the chunk-boundary arithmetic straight off `documents`."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.lazy_pipeline import fixed_chunks
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return fixed_chunks(docs)


def q_lazy_pipeline_stats(sf_dir: str):
    """LazyGraphRAG end-to-end PipelineStatistics
    (``lazy_pipeline.rs:152-234`` + ``bidirectional_index.rs:368-388``):
    document/chunk counts, concept-graph concept + co-occurrence≥2
    relation counts, bidirectional-index entity/chunk/mapping counts
    over NORMALIZED concept ids (lowercase, alnum+underscore filter —
    the reference's space-replace is dead code, pinned) and the two
    average ratios.  Concept-mention rows are staged; the oracle
    re-derives every count (chunk count from the chunker arithmetic,
    relations from the pair self-join, index stats from normalized
    distinct pairs)."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.lazy_pipeline import (
        fixed_chunks, lazy_concept_mentions, pipeline_statistics)
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    mentions = _stage(lazy_concept_mentions(fixed_chunks(docs)),
                      "lazy_pipeline_stats", sf_dir)
    return rd.from_arrow(pipeline_statistics(docs, mentions))


def _agent_queries(sf_dir: str, query: str):
    """Synthesized agent query corpus over the tool graph's entity
    names, staged together with the entity-name table."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.agent import synthesize_agent_queries
    g = _tool_graph(sf_dir)
    names = [e["name"] for e in g["entities"][:8]]
    queries = synthesize_agent_queries(names)
    q_ds = _stage(rd.from_arrow(queries), query, sf_dir)
    _stage(rd.from_arrow(pa.table({
        "name": pa.array([e["name"] for e in g["entities"]],
                         pa.string())})), query, sf_dir, "ents")
    return q_ds, g


def q_agent_plans(sf_dir: str):
    """GraphRAG agent query planning (``function_calling/agent.rs:
    115-298``): substring strategy detection, 1-/2-word window entity
    extraction against the graph (first containing entity in
    sorted-name order — the reference's HashMap iteration pinned,
    documented), first quoted span, sort+dedup; per-strategy
    graph_search/relationship_traverse call plans with the hardcoded
    limits and the capitalized->3-byte adaptive fallback.  One 'plan'
    header row (call_idx −1) plus one row per planned call; the oracle
    replays the whole planner from the staged queries + entity
    names."""
    from graphrag_rs_ray.pipelines.agent import agent_plan_stage
    q_ds, g = _agent_queries(sf_dir, "agent_plans")
    return agent_plan_stage(q_ds, g)


def q_query_analysis(sf_dir: str):
    """QueryAnalyzer flags (``function_calling/tools.rs:241-278``):
    entity/relationship/context focus by substring, requires_search =
    no 'list all'/'show all', relationship > context > low
    complexity."""
    from graphrag_rs_ray.pipelines.agent import query_analysis_stage
    q_ds, _ = _agent_queries(sf_dir, "query_analysis")
    return query_analysis_stage(q_ds)


def q_agent_sessions(sf_dir: str):
    """Full agent loop (``agent.rs:80-113``): plan → FunctionCaller
    tool execution (validation-failure rows kept, ``mod.rs:111-163``)
    → synthesized answer strings (``agent.rs:300-383``).  Procedural
    composition of oracle-checked pieces → rows-only."""
    from graphrag_rs_ray.pipelines.agent import agent_session_stage
    q_ds, g = _agent_queries(sf_dir, "agent_sessions")
    return agent_session_stage(q_ds, g)


def q_rograg_responses(sf_dir: str):
    """ROGRAG response synthesis + template assembly
    (``rograg/streaming.rs:62-1005``): five synthesis strategies
    (sequential / weighted sqrt(Σc²/n) / best-only LAST-max /
    smart-merge logic-preferred in-input-order / hierarchical
    "Additionally:"), intent→template mapping with the
    Causal/Temporal-have-no-templates fallback quirk, placeholder
    generation (first-word entities, 'related' relationship scan,
    skip-1 additional context, conf>0.6 details, threshold
    indicator/conclusion strings, top-3 key points), cleanup
    (collapse whitespace, terminal punctuation), top-3 source
    attribution, 0.7/0.3 final confidence, word-chunk counts.  The
    oracle replays EVERY string from the staged query/result rows
    (intents come from the oracle-checked classifier, staged)."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.streaming import (
        responses_stage, synthesize_streaming_inputs)
    inp = _rograg_inputs(sf_dir)
    docs_texts = [t or "" for t in _doc_texts(sf_dir)]
    queries, results = synthesize_streaming_inputs(
        inp["names"][:8], docs_texts)
    _stage(rd.from_arrow(queries), "rograg_responses", sf_dir, "q")
    r_ds = _stage(rd.from_arrow(results), "rograg_responses", sf_dir,
                  "r")
    return responses_stage(r_ds, queries)


def _doc_texts(sf_dir: str) -> list[str]:
    import pyarrow.parquet as pq
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    order = pa.compute.sort_indices(tbl.column("doc_id"))
    return tbl.take(order).column("text").to_pylist()


_DOC_TREE_QUERY = "report adventure discovery near the river crossing"


def q_doc_tree_search(sf_dir: str):
    """``DocumentTree::query`` across every document's summary tree
    (``summarization/mod.rs:867-930``): +1 per query keyword contained
    in the lowercased summary+keywords text, +2·query-word-overlap
    ratio (duplicates counted), +0.5/(level+1); score > 0.1, per-doc
    top-3 (the reference's tie order is HashMap-nondeterministic →
    (score desc, node_id asc) pinned).  Tree nodes (procedural
    summaries + keywords) and the extracted query keywords are staged;
    the oracle replays the scoring + ranking."""
    import ray.data as rd
    from graphrag_rs_ray.functions.generation import extract_keywords
    from graphrag_rs_ray.pipelines.doctree import (build_document_trees,
                                                   tree_query_stage)
    chunks = pages_to_chunks(_kg_pages(sf_dir),
                             KGConfig(chunk_size=120, chunk_overlap=0,
                                      min_chunk_size=20))
    nodes = build_document_trees(chunks, with_summary=True,
                                 with_keywords=True)
    staged = _stage(nodes.map_batches(
        lambda t: t.select(["doc_id", "node_id", "level", "summary",
                            "keywords_csv"]), batch_format="pyarrow"),
        "doc_tree_search", sf_dir)
    _stage(rd.from_arrow(pa.table({
        "kw": pa.array(extract_keywords(_DOC_TREE_QUERY, 5),
                       pa.string())})), "doc_tree_search", sf_dir, "qk")
    return tree_query_stage(staged, _DOC_TREE_QUERY, max_results=3)


def q_text_statistics(sf_dir: str):
    """Per-document TextStats (``text/analysis.rs:238-280``): word /
    sentence / paragraph / char counts with the min-1 clamps and both
    average ratios — straight off the documents table (zero staging;
    the oracle recomputes everything in SQL)."""
    import ray.data as rd
    from graphrag_rs_ray.functions.text_analysis import calculate_statistics

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("doc_id", "word_count", "sentence_count",
                                "paragraph_count", "char_count",
                                "avg_sentence_length", "avg_word_length")}
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            s = calculate_statistics(text or "")
            cols["doc_id"].append(did)
            for k in list(cols)[1:]:
                cols[k].append(s[k])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "word_count": pa.array(cols["word_count"], pa.int64()),
            "sentence_count": pa.array(cols["sentence_count"], pa.int64()),
            "paragraph_count": pa.array(cols["paragraph_count"],
                                        pa.int64()),
            "char_count": pa.array(cols["char_count"], pa.int64()),
            "avg_sentence_length": pa.array(cols["avg_sentence_length"],
                                            pa.float64()),
            "avg_word_length": pa.array(cols["avg_word_length"],
                                        pa.float64())})

    return ds.map_batches(stats, batch_format="pyarrow")


_SN_ROMANS = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX",
              "X", "XI", "XII"]


def q_section_numbers(sf_dir: str):
    """Section-number extraction (``text/analysis.rs:78-213``):
    deterministic heading lines synthesized from the documents table
    exercise every branch — decimal dotted, chapter/section/part
    keyword forms (number / roman / single letter — including the
    'Part C' alternation quirk that parses C as roman 100), bare roman
    (single letters like "C." too), bare alpha, and no-number lines.
    Lines are staged; the oracle replays regex precedence AND the
    reversed subtractive roman-numeral evaluation in SQL."""
    import ray.data as rd
    from graphrag_rs_ray.functions.text_analysis import (
        extract_section_number)

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        lid, lines = [], []
        for did in t.column("doc_id").to_pylist():
            i = int(did)
            pats = [
                f"{i % 9 + 1}.{i % 4}.{i % 3} Overview of the topic",
                f"Chapter {i % 12 + 1} Introduction",
                f"Section {_SN_ROMANS[i % 12]} Analysis",
                f"{_SN_ROMANS[i % 12]}. Preface",
                f"{chr(65 + i % 26)}. Appendix material",
                f"Part {chr(65 + i % 26)} Extra",
                "No numbering in this line",
                f"{i % 20 + 1}: Data section",
            ]
            lid.append(i)
            lines.append(pats[i % 8])
        return pa.table({"line_id": pa.array(lid, pa.int64()),
                         "line": pa.array(lines, pa.string())})

    staged = _stage(docs.map_batches(gen, batch_format="pyarrow"),
                    "section_numbers", sf_dir, "lines")

    def extract(t: pa.Table) -> pa.Table:
        fmts, raws, comps = [], [], []
        for line in t.column("line").to_pylist():
            sn = extract_section_number(line)
            if sn is None:
                fmts.append("none")
                raws.append("")
                comps.append("")
            else:
                fmts.append(sn["format"])
                raws.append(sn["raw"])
                comps.append(",".join(str(c) for c in sn["components"]))
        return pa.table({"line_id": t.column("line_id"),
                         "line": t.column("line"),
                         "fmt": pa.array(fmts, pa.string()),
                         "raw": pa.array(raws, pa.string()),
                         "components": pa.array(comps, pa.string())})

    return staged.map_batches(extract, batch_format="pyarrow")


_ENRICHED_QUERY = "customer market segment analysis in chapter 2 section 2.1"


def q_enriched_search(sf_dir: str):
    """Enriched metadata-aware retrieval
    (``retrieval/enriched.rs:57-143`` metadata_search): documents get
    deterministic markdown chapter/section headers, the enricher fills
    chapter/section/keywords/summary/position, extraction supplies
    chunk entities, BM25 supplies the base shortlist; the boost stack
    (keyword / structure / summary / completeness) re-scores every
    gated chunk.  Chunk metadata, mention names and base scores are
    staged; the oracle replays gate + boosts + min-1 clamp in SQL."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.enriched import metadata_search
    from graphrag_rs_ray.pipelines.hybrid import keyword_shortlist
    from graphrag_rs_ray.stages.enrich import EnrichedChunkStage

    cfg = KGConfig(chunk_size=400, chunk_overlap=50)
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        return pa.table({
            "doc_id": pa.array([f"doc{i}" for i in ids], pa.string()),
            "text": pa.array(
                [f"# Chapter {i % 4}\n\n## Section {i % 4}.{i % 3}\n\n"
                 f"{x or ''}" for i, x in zip(ids, texts)], pa.string())})

    enriched = docs.map_batches(prep, batch_format="pyarrow").map_batches(
        EnrichedChunkStage(cfg, fmt="markdown"),
        batch_format="pyarrow").materialize()

    # chunk entities via the gazetteer NER engine (the pattern extractor
    # needs capitalized names — the documents table is lowercase prose,
    # so the term gazetteer is the right extractor here)
    from graphrag_rs_ray.stages.memo import memoized_stage
    from graphrag_rs_ray.stages.ner import NERStage
    term_types = [{"name": "TERM", "dictionary": [
        "spark", "hash join", "customer", "vector", "stream", "query"]}]
    term_rules = [{"name": "term_gazetteer", "entity_type": "TERM",
                   "rule_type": "dictionary", "pattern": "",
                   "priority": 5}]
    ner = memoized_stage("enriched-term-ner",
                         lambda: NERStage(term_types, term_rules))
    men_st = _stage(
        enriched.map_batches(ner, batch_format="pyarrow", batch_size=None)
        .map_batches(lambda t: pa.table({"chunk_id": t.column("chunk_id"),
                                         "name": t.column("surface")}),
                     batch_format="pyarrow"),
        "enriched_search", sf_dir, "mentions")

    corpus = enriched.map_batches(
        lambda t: pa.table({"id": t.column("chunk_id"),
                            "content": t.column("text")}),
        batch_format="pyarrow")
    base_st = _stage(
        keyword_shortlist(corpus, _ENRICHED_QUERY, top_n=50).map_batches(
            lambda t: t.select(["id", "score"]), batch_format="pyarrow"),
        "enriched_search", sf_dir, "base")
    base = {r["id"]: r["score"] for r in base_st.take_all()}

    ch_st = _stage(enriched.map_batches(
        lambda t: t.select(["chunk_id", "chapter", "section", "subsection",
                            "keywords", "summary", "structural_level",
                            "position_in_document"]),
        batch_format="pyarrow"), "enriched_search", sf_dir, "chunks")

    return metadata_search(ch_st, men_st, base, _ENRICHED_QUERY)


def q_query_plans(sf_dir: str):
    """Rule-based query optimizer (``query/optimizer.rs``): graph
    statistics aggregated distributed (entity-type / relationship-type
    histograms, staged), then rewrite (smaller-side-first joins) →
    greedy multi-way join ordering → cost/cardinality/selectivity
    estimation over the fixed workload.  The oracle re-derives every
    decision (swap predicates, greedy pair choice) and every cost
    formula from the staged histograms in SQL."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.kg import dedup_triples
    from graphrag_rs_ray.pipelines.planner import (
        entity_type_counts, optimize_workload, rel_type_counts,
        stats_from_counts)
    from graphrag_rs_ray.stages.canonicalize import (
        entity_bucket_merge, partial_entity_agg)
    from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate
    from graphrag_rs_ray.stages.kg_extract import triples_only

    ents = _kg_ds(sf_dir, "entities")
    tri = _kg_ds(sf_dir, "triples")
    et = _stage(entity_type_counts(ents), "query_plans", sf_dir, "etypes")
    rt = _stage(rel_type_counts(tri), "query_plans", sf_dir, "rtypes")
    stats = stats_from_counts(
        [(r["type"], int(r["cnt"])) for r in et.take_all()],
        [(r["pred"], int(r["cnt"])) for r in rt.take_all()])
    return rd.from_arrow(optimize_workload(_planner_specs(), stats))


def q_pipeline_validation(sf_dir: str):
    """Four-phase pipeline validation report
    (``evaluation/pipeline_validation.rs``) over a deterministically
    CORRUPTED copy of the KG artifacts (green-path counts are all zero —
    the corruption exercises every violation counter): every 7th chunk
    dropped (→ invalid mention refs + coverage misses), every 5th entity
    dropped (→ orphan triple endpoints), every 11th surviving entity's
    type blanked.  All five input tables are staged; DuckDB recomputes
    every check/metric row."""
    import hashlib
    import ray.data as rd
    from graphrag_rs_ray.pipelines.kg import dedup_triples
    from graphrag_rs_ray.pipelines.validation import pipeline_validation_report
    from graphrag_rs_ray.stages.canonicalize import (
        entity_bucket_merge, partial_entity_agg)
    from graphrag_rs_ray.stages.enrich import EnrichedChunkStage
    from graphrag_rs_ray.stages.hashagg import hash_grouped_aggregate
    from graphrag_rs_ray.stages.kg_extract import triples_only
    import pyarrow.compute as _pc

    cfg = KGConfig()
    pages = _kg_pages(sf_dir)
    docs = pages.map_batches(extract_text_stage, batch_format="pyarrow")

    docs_staged = _stage(docs.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "doc_chars": _pc.utf8_length(t.column("text")).cast(pa.int64())}),
        batch_format="pyarrow"), "pipeline_validation", sf_dir, "docs")

    # enriched chunks (same chunker+cfg as pages_to_chunks → identical
    # chunk_ids), has_metadata per rs:107-114; every 7th chunk dropped
    def meta_flag(t: pa.Table) -> pa.Table:
        cids = t.column("chunk_id").to_pylist()
        keep = [int(hashlib.md5(c.encode()).hexdigest()[:8], 16) % 7 != 0
                for c in cids]
        has_meta = [ch is not None or len(kw) > 0 or su is not None
                    for ch, kw, su in zip(t.column("chapter").to_pylist(),
                                          t.column("keywords").to_pylist(),
                                          t.column("summary").to_pylist())]
        return pa.table({
            "chunk_id": t.column("chunk_id"),
            "doc_id": t.column("doc_id"),
            "text": t.column("text"),
            "has_metadata": pa.array(has_meta, pa.bool_()),
        }).filter(pa.array(keep))

    chunks_staged = _stage(
        docs.map_batches(EnrichedChunkStage(cfg), batch_format="pyarrow")
            .map_batches(meta_flag, batch_format="pyarrow"),
        "pipeline_validation", sf_dir, "chunks")

    combined = _kg_ds(sf_dir, "combined")
    mentions_staged = _stage(
        combined.map_batches(entities_only, batch_format="pyarrow")
                .map_batches(lambda t: t.select(["chunk_id", "entity_id"]),
                             batch_format="pyarrow"),
        "pipeline_validation", sf_dir, "mentions")

    entities = _kg_ds(sf_dir, "entities")

    def corrupt_entities(t: pa.Table) -> pa.Table:
        names = t.column("name").to_pylist()
        h = [int(hashlib.md5(n.encode()).hexdigest()[:8], 16) for n in names]
        kept = t.filter(pa.array([x % 5 != 0 for x in h]))
        kh = [x for x in h if x % 5 != 0]
        types = [("" if x % 11 == 0 else ty) for x, ty in
                 zip(kh, kept.column("type").to_pylist())]
        return pa.table({
            "name": kept.column("name"),
            "type": pa.array(types, pa.string()),
            "conf": kept.column("conf"),
            "mention_count": kept.column("mention_count")})

    entities_staged = _stage(
        entities.map_batches(corrupt_entities, batch_format="pyarrow"),
        "pipeline_validation", sf_dir, "entities")

    triples_staged = _stage(
        _kg_ds(sf_dir, "triples")
        .map_batches(lambda t: t.select(["subj", "pred", "obj", "conf"]),
                     batch_format="pyarrow"),
        "pipeline_validation", sf_dir, "triples")

    return rd.from_arrow(pipeline_validation_report(
        docs_staged, chunks_staged, mentions_staged, entities_staged,
        triples_staged))


# --------------------------------------------------- ROGRAG query slice --
# Batch query processing (``rograg/`` in the reference) over a
# deterministic query corpus synthesized from the KG's own canonical
# entity names — no external data.  Every stage is rule/regex-based and
# fully deterministic; the oracle SQL is GENERATED from the exact same
# pattern specs the Python kernels use (functions/rograg.py), so parity
# is by construction.

_ROGRAG_CACHE: dict[str, dict] = {}


def _rograg_inputs(sf_dir: str) -> dict:
    """KG-derived inputs for the ROGRAG slice, built once per process:
    canonical entities, deduped triples, and the top entity names that
    seed the synthesized query corpus (mention_count desc, name asc)."""
    if sf_dir not in _ROGRAG_CACHE:
        ents = (_kg_ds(sf_dir, "entities")
                .sort(["mention_count", "name"], descending=[True, False]))
        ents_df = ents.to_pandas()
        chunks = _kg_ds(sf_dir, "chunks")
        combined = _kg_ds(sf_dir, "combined")
        tris_df = _kg_ds(sf_dir, "triples").to_pandas()
        mentions_df = (combined.map_batches(entities_only,
                                            batch_format="pyarrow")
                       .to_pandas())
        chunks_df = chunks.to_pandas()
        _ROGRAG_CACHE[sf_dir] = {
            "names": ents_df["name"].head(24).tolist(),
            "entities": pa.Table.from_pandas(
                ents_df[["entity_id", "name", "type", "conf",
                         "mention_count"]], preserve_index=False),
            "triples": pa.Table.from_pandas(
                tris_df[["subj", "pred", "obj", "conf"]],
                preserve_index=False),
            "mentions": pa.Table.from_pandas(
                mentions_df[["chunk_id", "doc_id", "entity_id", "conf",
                             "name"]],
                preserve_index=False),
            "chunks": pa.Table.from_pandas(
                chunks_df[["chunk_id", "doc_id", "text"]],
                preserve_index=False),
        }
    return _ROGRAG_CACHE[sf_dir]


def _rograg_queries_ds(query_name: str, sf_dir: str):
    import ray.data as rd
    from graphrag_rs_ray.pipelines.queries import synthesize_query_table
    return _stage(rd.from_arrow(
        synthesize_query_table(_rograg_inputs(sf_dir)["names"])),
        query_name, sf_dir)


def q_query_intents(sf_dir: str):
    """Intent classification (``rograg/intent_classifier.rs:450-533``):
    keyword+regex scoring per intent, ambiguity detection (secondary >
    0.8×primary), inappropriate-content refusal, complexity score and
    reformulation suggestions.  Oracle SQL is generated from the same
    INTENT_SPECS table."""
    from graphrag_rs_ray.pipelines.queries import intent_stage
    return _rograg_queries_ds("query_intents", sf_dir).map_batches(
        intent_stage, batch_format="pyarrow")


def q_query_decomposition(sf_dir: str):
    """Hybrid query decomposition (``rograg/decomposer.rs:666-699``):
    case-sensitive semantic patterns first (conf 0.8), else syntactic
    clause split on raw-substring separator boundaries with the
    leading-separator strip fold (conf 0.7), else single query.  The
    oracle re-derives boundary positions with a position×separator
    cross join and replays the 10-step strip fold as chained CTEs."""
    from graphrag_rs_ray.pipelines.queries import decomposition_stage
    return _rograg_queries_ds("query_decomposition", sf_dir).map_batches(
        decomposition_stage, batch_format="pyarrow")


def q_logic_forms(sf_dir: str):
    """Pattern-based logic-form parsing (``rograg/logic_form.rs:
    404-547``): first of six (?i) patterns wins; one row per non-empty
    trimmed argument capture."""
    from graphrag_rs_ray.pipelines.queries import logic_form_stage
    return _rograg_queries_ds("logic_forms", sf_dir).map_batches(
        logic_form_stage, batch_format="pyarrow")


def q_query_validation(sf_dir: str):
    """Query validation (``rograg/validator.rs:295-365``): length
    (empty=Critical, >1000 bytes=Medium), safety regexes (at most one
    issue), no-alphabetic format check; score = 0 if critical else
    1 - min(n×0.1, 0.8)."""
    from graphrag_rs_ray.pipelines.queries import validation_stage
    return _rograg_queries_ds("query_validation", sf_dir).map_batches(
        validation_stage, batch_format="pyarrow")


def q_fuzzy_matches(sf_dir: str):
    """Fuzzy entity matching (``rograg/fuzzy_matcher.rs:308-714``):
    exact (boosted 1.0) / partial (jaccard·0.4 + containment·0.4 +
    levenshtein·0.2 ≥ 0.6, ×0.9) / type-overlap (×0.7) matches plus
    top-5-per-entity graph expansion (conf×0.6 ≥ 0.42) when under
    max_matches, ranked (sim desc, id asc, type asc) top-10 with the
    position×type weighted overall confidence.  Entities + adjacency
    ride the object store once (``ray.put``); queries stream."""
    import pyarrow.parquet as _pq
    import ray.data as rd
    from graphrag_rs_ray.pipelines.queries import fuzzy_match_stage

    inp = _rograg_inputs(sf_dir)
    qds = _rograg_queries_ds("fuzzy_matches", sf_dir)
    _stage(rd.from_arrow(inp["entities"]), "fuzzy_matches", sf_dir,
           "entities")
    _stage(rd.from_arrow(inp["triples"]), "fuzzy_matches", sf_dir, "edges")
    ents_tbl = _pq.read_table(_stage_path("fuzzy_matches", sf_dir, "entities"))
    tris_tbl = _pq.read_table(_stage_path("fuzzy_matches", sf_dir, "edges"))
    return fuzzy_match_stage(qds, ents_tbl, tris_tbl)


def q_query_routing(sf_dir: str):
    """Adaptive complexity routing (``query/adaptive_routing.rs:
    77-287``): ±1-per-contained-keyword score normalized by match
    count, word-count buckets, entity indicators (quote pairs +
    ' and ' + 'between' occurrences), weighted 0.5/0.3/0.2 →
    complexity class → hierarchical level + explanation."""
    from graphrag_rs_ray.pipelines.queries import routing_stage
    return _rograg_queries_ds("query_routing", sf_dir).map_batches(
        routing_stage, batch_format="pyarrow")


def q_query_rewrite(sf_dir: str):
    """Query rewriting (``query/intelligence.rs:92-358``): normalize →
    type detection → template substitution (who is→entity: etc.) →
    synonym expansion (base words unconditional, synonyms global-dedup)
    → stop-word-filtered key terms → specificity×0.6 + relevance×0.4
    confidence (default 0.5 relevance, no feedback state)."""
    from graphrag_rs_ray.pipelines.queries import rewrite_stage
    return _rograg_queries_ds("query_rewrite", sf_dir).map_batches(
        rewrite_stage, batch_format="pyarrow")


def q_dual_keywords(sf_dir: str):
    """Dual-level keyword extraction, no-LLM fallback path
    (``lightrag/keyword_extraction.rs:168-190``): query words > 3 bytes,
    first 10, lowercased, emitted as low-level keywords.  (The LLM path
    — prompt build, JSON extraction, validation — is ported and
    unit-tested in functions/lightrag.py; no real model in sandbox.)"""
    from graphrag_rs_ray.pipelines.lightrag import dual_keywords_stage
    return _rograg_queries_ds("dual_keywords", sf_dir).map_batches(
        dual_keywords_stage, batch_format="pyarrow")


def q_dual_retrieval(sf_dir: str):
    """Dual-level retrieval merge strategies (``lightrag/dual_retrieval
    .rs:197-322``): high-level (topic) and low-level (entity) BM25
    candidate lists merged under interleave / high_first / low_first /
    weighted (0.6/0.4), dedup first-occurrence, top-10.  Both lists are
    staged with their positions; the oracle replays all four merges."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.lightrag import dual_retrieval_table

    def staged_list(query: str, sub: str):
        rows = td.bm25_topk(sf_dir, query=query, k=20).take_all()
        tbl = pa.table({
            "j": pa.array(range(len(rows)), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score": pa.array([r["score"] for r in rows], pa.float64())})
        staged = _stage(rd.from_arrow(tbl), "dual_retrieval", sf_dir, sub)
        rows = sorted(staged.take_all(), key=lambda r: r["j"])
        return [{"id": r["doc_id"], "score": r["score"]} for r in rows]

    high = staged_list("fast hash join", "high")
    low = staged_list("hash join", "low")
    return rd.from_arrow(dual_retrieval_table(high, low, top_k=10))


def q_lazy_search(sf_dir: str):
    """LazyGraphRAG iterative-deepening search
    (``lightrag/iterative_deepening.rs:112-315`` +
    ``query_refinement.rs:104-222``): query → concept extraction →
    refinement over the concept graph (relevance = (ln f + 1) ×
    (1 + 0.5·connections), feedback boosts) → depth-limited chunk
    accumulation with max-chunks / no-more-concepts stops.  Procedural
    iterative kernel → rows-only driver check; gated by unit tests on a
    hand-built graph."""
    from graphrag_rs_ray.pipelines.concepts import (
        concept_edges, concept_mention_rows, concept_table_from_mentions)
    from graphrag_rs_ray.pipelines.lightrag import (
        concept_views_from_tables, lazy_search_stage)

    chunks = _kg_ds(sf_dir, "chunks")
    mentions = concept_mention_rows(chunks).materialize()
    views = concept_views_from_tables(
        pa.Table.from_pandas(
            concept_table_from_mentions(mentions).to_pandas(),
            preserve_index=False),
        pa.Table.from_pandas(concept_edges(chunks).to_pandas(),
                             preserve_index=False),
        pa.Table.from_pandas(mentions.to_pandas(), preserve_index=False))
    return lazy_search_stage(_rograg_queries_ds("lazy_search", sf_dir),
                             views)


_TOOL_GRAPH_CACHE: dict[str, dict] = {}


def _tool_graph(sf_dir: str) -> dict:
    """Driver-side tool-graph dict, built once per process (the
    chunk/mention index build costs ~8 s at sf0.1 — shared across the
    six tool queries + the agent slice)."""
    if sf_dir not in _TOOL_GRAPH_CACHE:
        from graphrag_rs_ray.pipelines.tools import build_tool_graph
        inp = _rograg_inputs(sf_dir)
        _TOOL_GRAPH_CACHE[sf_dir] = build_tool_graph(
            inp["entities"], inp["triples"], inp["mentions"],
            inp["chunks"])
    return _TOOL_GRAPH_CACHE[sf_dir]


def q_tool_graph_search(sf_dir: str):
    """Batch ``graph_search`` tool execution (``function_calling/
    functions.rs:121-241``): exact (1.0) / contains (0.8) / fuzzy (0.6)
    phases with later phases gated on found < limit; deterministic
    (relevance desc, name asc, id asc) ranking."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.tools import (
        graph_search_stage, synthesize_search_calls)
    g = _tool_graph(sf_dir)
    calls = _stage(rd.from_arrow(synthesize_search_calls(g)),
                   "tool_graph_search", sf_dir)
    _stage(rd.from_arrow(_rograg_inputs(sf_dir)["entities"]),
           "tool_graph_search", sf_dir, "entities")
    return graph_search_stage(calls, g)


def q_tool_entity_expand(sf_dir: str):
    """Batch ``entity_expand`` tool (``functions.rs:246-376``): incident
    relationships in the pinned (source, type, target) order, take
    limit, related entity resolved; unknown ids yield error rows."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.tools import (
        entity_expand_stage, synthesize_expand_calls)
    g = _tool_graph(sf_dir)
    calls = _stage(rd.from_arrow(synthesize_expand_calls(g)),
                   "tool_entity_expand", sf_dir)
    _stage(rd.from_arrow(_rograg_inputs(sf_dir)["entities"]),
           "tool_entity_expand", sf_dir, "entities")
    rels = pa.table({
        "source": pa.array([r["source"] for r in g["rels"]], pa.string()),
        "target": pa.array([r["target"] for r in g["rels"]], pa.string()),
        "type": pa.array([r["type"] for r in g["rels"]], pa.string()),
        "conf": pa.array([r["conf"] for r in g["rels"]], pa.float64()),
    })
    _stage(rd.from_arrow(rels), "tool_entity_expand", sf_dir, "rels")
    return entity_expand_stage(calls, g)


def q_tool_entity_context(sf_dir: str):
    """Batch ``get_entity_context`` tool (``functions.rs:600-711``):
    context chunks containing the entity (chunk_id asc, take limit) plus
    the entity's mention rows (offsets not tracked by this engine's
    mention aggregates — chunk_id + confidence, documented)."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.tools import (
        entity_context_stage, synthesize_context_calls)
    g = _tool_graph(sf_dir)
    calls = _stage(rd.from_arrow(synthesize_context_calls(g)),
                   "tool_entity_context", sf_dir)
    _stage(rd.from_arrow(_rograg_inputs(sf_dir)["mentions"]),
           "tool_entity_context", sf_dir, "mentions")
    _stage(rd.from_arrow(_rograg_inputs(sf_dir)["entities"]),
           "tool_entity_context", sf_dir, "entities")
    return entity_context_stage(calls, g)


def q_tool_validation(sf_dir: str):
    """Batch tool-argument validation (each tool's validate_arguments,
    ``functions.rs:222-241,348-376,438-472,693-711``): required/type
    checks, range limits, and the traverse wrong-parameter-name guard,
    over a call table covering every rule."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.tools import (
        synthesize_validation_calls, validation_calls_stage)
    calls = _stage(rd.from_arrow(synthesize_validation_calls()),
                   "tool_validation", sf_dir)
    return validation_calls_stage(calls)


def q_tool_traverse(sf_dir: str):
    """Batch ``relationship_traverse`` tool (``functions.rs:381-560``):
    name-or-id resolution then the reference's stack-based search whose
    global visited set admits at most one non-trivial path (pinned edge
    order; procedural → rows-only driver check, unit-tested)."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.tools import (
        synthesize_traverse_calls, traverse_stage)
    g = _tool_graph(sf_dir)
    calls = _stage(rd.from_arrow(synthesize_traverse_calls(g)),
                   "tool_traverse", sf_dir)
    return traverse_stage(calls, g)


def q_tool_infer(sf_dir: str):
    """Batch ``infer_relationships`` tool (``functions.rs:714-874`` +
    ``inference.rs:83-402``): co-occurrence evidence scoring (base 0.2 +
    proximity + friendship/negative pattern weights ±context bonus,
    family damper), normalized by the target's chunk count, threshold
    0.3, top-10.  Oracle: the pinned-order tool-graph views (entities,
    chunk texts, chunk-membership rows) are staged and DuckDB replays
    the WHOLE tool (``_tool_infer_sql``: 3-phase resolution incl. the
    fuzzy quirks, word-distance proximity, the 44 pattern weights with
    context windows, family damper, normalization + threshold +
    top-10); both sides round(8) the confidence."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.tools import infer_stage
    g = _tool_graph(sf_dir)
    names = [e["name"] for e in g["entities"][:6]] + ["zzz qqq"]
    calls = _stage(rd.from_arrow(pa.table({
        "call_id": pa.array(range(len(names)), pa.int64()),
        "entity_name": pa.array(names, pa.string()),
        "relation_type": pa.array(["FRIEND"] * len(names), pa.string()),
    })), "tool_infer", sf_dir)
    _stage(rd.from_arrow(pa.table({
        "ord": pa.array(range(len(g["entities"])), pa.int64()),
        "entity_id": pa.array([e["entity_id"] for e in g["entities"]],
                              pa.string()),
        "name": pa.array([e["name"] for e in g["entities"]], pa.string()),
    })), "tool_infer", sf_dir, "entities")
    _stage(rd.from_arrow(pa.table({
        "chunk_idx": pa.array(range(len(g["chunks"])), pa.int64()),
        "text": pa.array([c["text"] for c in g["chunks"]], pa.string()),
    })), "tool_infer", sf_dir, "chunks")
    mrows = [(i, e) for i, c in enumerate(g["chunks"])
             for e in c["entity_ids"]]
    _stage(rd.from_arrow(pa.table({
        "chunk_idx": pa.array([r[0] for r in mrows], pa.int64()),
        "entity_id": pa.array([r[1] for r in mrows], pa.string()),
    })), "tool_infer", sf_dir, "members")
    return infer_stage(calls, g)


def _response_log(query_name: str, sf_dir: str):
    import ray.data as rd
    from graphrag_rs_ray.pipelines.queries import (
        synthesize_query_table, synthesize_response_log)
    names = _rograg_inputs(sf_dir)["names"]
    log = synthesize_response_log(synthesize_query_table(names), names)
    return _stage(rd.from_arrow(log), query_name, sf_dir)


def q_response_quality(sf_dir: str):
    """Per-response quality scoring (``rograg/quality_metrics.rs:
    986-1128``): accuracy/completeness/coherence/relevance/source-
    credibility components, weighted overall, retrieval-strategy
    classification and threshold alerts, over a response log derived
    from the engine's own decomposition/logic-form/intent kernels."""
    from graphrag_rs_ray.pipelines.queries import response_quality_stage
    return response_quality_stage(_response_log("response_quality", sf_dir))


def q_quality_report(sf_dir: str):
    """Corpus-level quality report (``quality_metrics.rs:1131-1337``):
    performance statistics (running averages ≡ plain means over the
    history, fallback rate, last-10 throughput), alert counts, and the
    baseline-vs-rograg comparative analysis (aggregated means,
    population std-dev, improvement percentages, the reference's
    heuristic significance test)."""
    import pyarrow.parquet as _pq
    import ray.data as rd
    from graphrag_rs_ray.pipelines.queries import quality_report_table
    _response_log("quality_report", sf_dir)
    log = _pq.read_table(_stage_path("quality_report", sf_dir))
    return rd.from_arrow(quality_report_table(log))


def q_logic_bindings(sf_dir: str):
    """Logic-form EXECUTION against the KG (``logic_form.rs:562-930``):
    parse → Is/Related/Compare bindings (contains-match entities with
    exact/contains/word-Jaccard name-similarity confidence; pinned-order
    direct-relationship lookup with the no-direct 0.3 fallback binding;
    type-comparison binding), answer = first binding, mean confidence,
    entity-id sources."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.queries import (
        build_rograg_graph, logic_bindings_stage)
    inp = _rograg_inputs(sf_dir)
    g = build_rograg_graph(inp["entities"], inp["triples"])
    calls = _rograg_queries_ds("logic_bindings", sf_dir)
    _stage(rd.from_arrow(inp["entities"]), "logic_bindings", sf_dir,
           "entities")
    rels = pa.table({
        "source": pa.array([r["source"] for r in g["rels"]], pa.string()),
        "target": pa.array([r["target"] for r in g["rels"]], pa.string()),
        "type": pa.array([r["type"] for r in g["rels"]], pa.string()),
        "conf": pa.array([r["conf"] for r in g["rels"]], pa.float64()),
    })
    _stage(rd.from_arrow(rels), "logic_bindings", sf_dir, "rels")
    return logic_bindings_stage(calls, g)


def q_rograg_process(sf_dir: str):
    """The full ROGRAG processor pipeline (``processor.rs:353-560``):
    validate → intent gate → hybrid decomposition → per-subquery
    logic-form retrieval with fuzzy fallback, producing the structural
    response row (status, refusal reason, per-strategy counts, answer,
    mean confidence).  The template prose assembly (``streaming.rs``)
    is presentation-layer and summarized by the answer/count columns
    (documented).  Procedural composition → rows-only driver check."""
    from graphrag_rs_ray.pipelines.queries import (
        build_rograg_graph, rograg_process_stage)
    inp = _rograg_inputs(sf_dir)
    g = build_rograg_graph(inp["entities"], inp["triples"])
    return rograg_process_stage(
        _rograg_queries_ds("rograg_process", sf_dir), g)


# ------------------------------------------------------ corpus module --
# document_manager.rs / collection_processor.rs / graph_indexer.rs /
# knowledge_graph.rs — collection metadata, window-based extraction,
# document concepts, and the corpus-level knowledge graph.


def _corpus_pages(sf_dir: str):
    """pages → (doc_id=url, text) rows: the corpus module's document
    collection (the sf documents carry no capitalized text, so the
    synthetic entity-bearing pages are the collection content)."""

    def to_doc(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("url"),
                         "text": t.column("text")})

    return _kg_pages(sf_dir).map_batches(to_doc, batch_format="pyarrow")


def q_doc_collection(sf_dir: str):
    """DocumentMetadata rows (``document_manager.rs:9-47,225-285``) over
    the documents table — synthesized ``corpus/doc_<id>.<ext>`` paths
    (doc_id % 7 extension cycle keeps the mapping SQL-replayable),
    DocumentType, byte sizes, the substring-count language heuristic,
    and first-wins content dedup (the oracle re-derives duplicates from
    raw text equality; the blake2b hash column is dropped — hashing is
    not SQL-expressible and dup_of carries the check)."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.corpus import collection_table
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ct = collection_table(ds)
    return ct.map_batches(lambda t: t.drop_columns(["content_hash"]),
                          batch_format="pyarrow")


def q_corpus_entities(sf_dir: str):
    """Graph-indexer extraction + quality gate
    (``graph_indexer.rs:62-131``, ``collection_processor.rs:215-263``):
    3-word all-capitalized windows (conf 0.6) then single capitalized
    words with byte length > 2 (conf 0.5), pre-dedup scan-order
    ``<doc>_entity_<k>`` ids, first-occurrence name dedup, and the
    type heuristics.  ZERO derivation staging: the oracle replays
    tokenization, windows, ids, dedup and typing in SQL from the staged
    collection text alone."""
    from graphrag_rs_ray.pipelines.corpus import corpus_entities
    docs = _stage(_corpus_pages(sf_dir), "corpus_entities", sf_dir, "docs")
    return corpus_entities(docs)


def _concepts_with_staging(query: str, sf_dir: str):
    from graphrag_rs_ray.pipelines.corpus import corpus_concepts
    docs = _stage(_corpus_pages(sf_dir), query, sf_dir, "docs")
    con = corpus_concepts(docs)
    pos = con.map_batches(
        lambda t: t.select(["doc_id", "pattern_idx", "start", "length"]),
        batch_format="pyarrow")
    _stage(pos, query, sf_dir, "pos")
    return con


def q_corpus_concepts(sf_dir: str):
    """Document concepts (``collection_processor.rs:265-310``): 5 regex
    patterns, sequential per-doc ids in (pattern, match) scan order,
    100-char context from 50 before the match, frequency/confidence
    constants.  Match POSITIONS are staged; the oracle re-derives the
    concept text, context window and ids from the raw collection text."""
    return _concepts_with_staging("corpus_concepts", sf_dir)


def q_corpus_concept_clusters(sf_dir: str):
    """Exact-text concept clustering
    (``collection_processor.rs:313-352``): group by lowercased trimmed
    concept text, members in (doc, pattern, match) scan order,
    ``cluster_<k>`` ids by sorted canonical text (pinned; the reference
    iterates a HashMap), and the faithful hardcoded document_frequency
    / total_mentions / confidence constants."""
    from graphrag_rs_ray.pipelines.corpus import concept_cluster_table
    con = _concepts_with_staging("corpus_concept_clusters", sf_dir)
    return concept_cluster_table(con)


_CORPUS_LINK_CACHE: dict[str, tuple] = {}


def _corpus_linked(query: str, sf_dir: str):
    """Corpus entity extraction → hybrid cross-document linking; stages
    the docs, flat entities AND cluster assignments (with cluster
    order, the reference's clusters-vec order) for the oracle.  The
    extraction + sequential linking pass is computed ONCE per process
    (shared by the six corpus queries); each query stages its own
    copies of the input tables."""
    import ray.data as rd
    from graphrag_rs_ray.functions.entity_linker import link_entities
    from graphrag_rs_ray.pipelines.corpus import corpus_entities

    if sf_dir not in _CORPUS_LINK_CACHE:
        docs_tbl = pa.Table.from_pylist(
            _corpus_pages(sf_dir).take_all(),
            schema=pa.schema([("doc_id", pa.string()),
                              ("text", pa.string())]))
        ents = corpus_entities(rd.from_arrow(docs_tbl))
        flat_rows = ents.map_batches(
            lambda t: pa.table({"doc_id": t.column("doc_id"),
                                "local_entity_id": t.column("entity_id"),
                                "name": t.column("name")}),
            batch_format="pyarrow").take_all()
        flat_tbl = pa.Table.from_pylist(
            flat_rows, schema=pa.schema([
                ("doc_id", pa.string()),
                ("local_entity_id", pa.string()),
                ("name", pa.string())]))
        # linker input order: documents in sorted-id order (pinned; the
        # reference iterates a HashMap), entities in extraction output
        # order within a doc (= name-byte order after the indexer dedup)
        rows = sorted(flat_rows,
                      key=lambda e: (e["doc_id"], e["name"].encode()))
        clusters, stats = link_entities(rows, "hybrid")
        a = {"doc_id": [], "local_entity_id": [], "cluster_id": [],
             "kind": [], "cluster_ord": [], "member_idx": []}
        for ci, c in enumerate(clusters):
            for mi, m in enumerate(c["members"]):
                a["doc_id"].append(m["doc_id"])
                a["local_entity_id"].append(m["local_entity_id"])
                a["cluster_id"].append(c["cluster_id"])
                a["kind"].append(c["kind"])
                a["cluster_ord"].append(ci)
                a["member_idx"].append(mi)
        asg_tbl = pa.table({
            "doc_id": pa.array(a["doc_id"], pa.string()),
            "local_entity_id": pa.array(a["local_entity_id"],
                                        pa.string()),
            "cluster_id": pa.array(a["cluster_id"], pa.string()),
            "kind": pa.array(a["kind"], pa.string()),
            "cluster_ord": pa.array(a["cluster_ord"], pa.int64()),
            "member_idx": pa.array(a["member_idx"], pa.int64())})
        _CORPUS_LINK_CACHE[sf_dir] = (docs_tbl, flat_tbl, asg_tbl,
                                      clusters, stats)

    docs_tbl, flat_tbl, asg_tbl, clusters, stats = \
        _CORPUS_LINK_CACHE[sf_dir]
    _stage(rd.from_arrow(docs_tbl), query, sf_dir, "docs")
    flat = _stage(rd.from_arrow(flat_tbl), query, sf_dir, "flat")
    _stage(rd.from_arrow(asg_tbl), query, sf_dir, "asg")
    return clusters, stats, flat


def q_corpus_kg_entities(sf_dir: str):
    """GlobalEntity rows (``knowledge_graph.rs:148-184,256-290``):
    total mentions, sorted distinct source documents and aliases, and
    the (ln(df)+1)·0.4 + (ln(mentions)+1)·0.3 + spread·0.3 over 3
    importance score.  The oracle re-derives every column — including
    the linker's canonical-name vote, confidence and type heuristics —
    from the staged flat entities + assignments."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.corpus import corpus_kg_tables
    clusters, _, _ = _corpus_linked("corpus_kg_entities", sf_dir)
    ge_tbl, _, _ = corpus_kg_tables(clusters)
    return rd.from_arrow(ge_tbl)


def q_corpus_kg_relations(sf_dir: str):
    """Co-occurrence relations (``knowledge_graph.rs:186-254``): each
    document's cluster-order member multiset → ordered (i<j) pairs
    (2-members-in-one-doc clusters yield faithful self-pairs), conf
    0.7 + 0.1 per repeat capped at 1.0, document frequency, appended
    source documents, and ``rel_<k>`` ids in pinned first-occurrence
    scan order (sorted docs; the reference iterates a HashMap)."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.corpus import corpus_kg_tables
    clusters, _, _ = _corpus_linked("corpus_kg_relations", sf_dir)
    _, rel_tbl, _ = corpus_kg_tables(clusters)
    return rd.from_arrow(rel_tbl)


def q_corpus_stats(sf_dir: str):
    """One-row CorpusStats + QualityMetrics + GraphStats
    (``collection_processor.rs:34-102``, ``knowledge_graph.rs:293-336``)
    incl. the faithful quirks: avg_relations_per_document is 0 (the
    extraction phase tracks none), largest_component_size = node count
    (the reference's simplification), density counts DIRECTED relation
    keys over undirected max edges."""
    import ray.data as rd
    from graphrag_rs_ray.pipelines.corpus import corpus_stats_table
    clusters, _, flat = _corpus_linked("corpus_stats", sf_dir)
    n_docs = _corpus_pages(sf_dir).count()
    return rd.from_arrow(corpus_stats_table(n_docs, flat.count(), clusters))


def q_corpus_search(sf_dir: str):
    """KG text query + top-k (``knowledge_graph.rs:348-370,402-407``):
    case-insensitive substring match over canonical name / aliases,
    importance-descending order (ties pinned id-ascending), top 10.
    Search term 'hampton' hits the hub person."""
    import ray.data as rd
    from graphrag_rs_ray.functions.corpus_index import (
        global_entities_from_clusters, query_entities)
    clusters, _, _ = _corpus_linked("corpus_search", sf_dir)
    ge = global_entities_from_clusters(clusters)
    hits = query_entities(ge, "hampton", limit=10)
    return rd.from_arrow(pa.table({
        "id": pa.array([e["id"] for e in hits], pa.string()),
        "canonical_name": pa.array([e["canonical_name"] for e in hits],
                                   pa.string()),
        "importance_score": pa.array(
            [round(e["importance_score"], 8) for e in hits], pa.float64()),
    }))


def q_corpus_related(sf_dir: str):
    """find_related_entities (``knowledge_graph.rs:416-453``): the
    reference's stack-pop "BFS" over DIRECTED co-occurrence edges with
    a global visited set and a pop-time depth gate — order-dependent
    procedural semantics (unit-gated kernel; rows-only driver check)."""
    import ray.data as rd
    from graphrag_rs_ray.functions.corpus_index import (
        cooccurrence_relations, find_related_entities,
        global_entities_from_clusters, query_entities)
    clusters, _, _ = _corpus_linked("corpus_related", sf_dir)
    rels = cooccurrence_relations(clusters)
    edges = [(r["source_entity_id"], r["target_entity_id"]) for r in rels]
    ge = global_entities_from_clusters(clusters)
    top = query_entities(ge, "", limit=1)  # highest-importance entity
    seed = top[0]["id"] if top else ""
    related = find_related_entities(edges, seed, max_depth=2)
    return rd.from_arrow(pa.table({
        "seed": pa.array([seed] * len(related), pa.string()),
        "entity_id": pa.array(related, pa.string()),
        "discovery_ord": pa.array(range(len(related)), pa.int64())}))


# -------------------------------------------------- document structure --
# text/document_structure.rs — section hierarchy built by the layout
# parsers (sections, stack parenting, depth map, heading paths, stats).


def _structure_docs(sf_dir: str):
    """Deterministic markdown documents synthesized from the documents
    table, exercising every markdown-parser branch: 4-level nesting,
    level pops, a 7-hash invalid line, a bare ``##`` (empty text,
    dropped), a missing-space ``#word`` line, space-indented headings,
    second roots, trailing-heading docs (empty final section) and
    no-structure docs (``doc_id % 11 == 0``)."""
    import ray.data as rd
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for did in t.column("doc_id").to_pylist():
            i = int(did)
            if i % 11 == 0:
                lines = [f"Plain narrative {i}.", "No headings here.",
                         f"Just body text {i % 3}."]
            else:
                lines = [f"# Document {i}", f"Body intro for doc {i}.",
                         f"## Background {i % 5}", "Shared body line.",
                         f"### Detail {i % 3}", f"#### Deep dive {i % 2}"]
                if i % 4 == 0:
                    lines.append("####### seven hashes is not a heading")
                if i % 3 == 0:
                    lines.append("##")
                if i % 5 == 0:
                    lines.append("#missing-space heading")
                if i % 6 == 1:
                    lines.append(f"   ## Indented {i % 3}")
                lines.append(f"## Methods {i % 7}")
                if i % 2 == 0:
                    lines.append(f"# Part Two of {i}")
                if i % 7 != 0:
                    lines.append(f"Closing remark {i}.")
            ids.append(i)
            texts.append("\n".join(lines))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(gen, batch_format="pyarrow")


def _structure_rows(t: pa.Table) -> pa.Table:
    from graphrag_rs_ray.functions.layout import (heading_path,
                                                  parse_layout,
                                                  section_depths)
    c: dict[str, list] = {k: [] for k in (
        "doc_id", "idx", "level", "heading_text", "start_offset",
        "end_offset", "line_number", "content_start", "content_end",
        "parent_idx", "depth", "heading_path", "n_children", "is_root")}
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        _, sections, _ = parse_layout(text, "markdown")
        depths = section_depths(sections)
        for idx, s in enumerate(sections):
            h = s.heading
            c["doc_id"].append(did)
            c["idx"].append(idx)
            c["level"].append(h.level)
            c["heading_text"].append(h.text)
            c["start_offset"].append(h.start_offset)
            c["end_offset"].append(h.end_offset)
            c["line_number"].append(h.line_number)
            c["content_start"].append(s.content_start)
            c["content_end"].append(s.content_end)
            c["parent_idx"].append(s.parent_section)
            c["depth"].append(depths[idx])
            c["heading_path"].append(" > ".join(heading_path(sections, idx)))
            c["n_children"].append(len(s.child_sections))
            c["is_root"].append(s.parent_section is None)
    return pa.table({
        "doc_id": pa.array(c["doc_id"], pa.int64()),
        "idx": pa.array(c["idx"], pa.int64()),
        "level": pa.array(c["level"], pa.int64()),
        "heading_text": pa.array(c["heading_text"], pa.string()),
        "start_offset": pa.array(c["start_offset"], pa.int64()),
        "end_offset": pa.array(c["end_offset"], pa.int64()),
        "line_number": pa.array(c["line_number"], pa.int64()),
        "content_start": pa.array(c["content_start"], pa.int64()),
        "content_end": pa.array(c["content_end"], pa.int64()),
        "parent_idx": pa.array(c["parent_idx"], pa.int64()),
        "depth": pa.array(c["depth"], pa.int64()),
        "heading_path": pa.array(c["heading_path"], pa.string()),
        "n_children": pa.array(c["n_children"], pa.int64()),
        "is_root": pa.array(c["is_root"], pa.bool_())})


def q_doc_structure(sf_dir: str):
    """Section table (``text/document_structure.rs:66-230``): markdown
    headings (``parsers/markdown.rs:84-110``) → sections with content
    ranges (``html.rs:83-97`` shared build), stack parenting
    (``html.rs:100-137``), depth map (``document_structure.rs:120-146``)
    and root→leaf heading paths (``:188-206``).  ZERO derivation
    staging: the oracle re-parses the staged markdown text in SQL and
    rebuilds parents via nearest-smaller-level, depth/path via a
    recursive CTE."""
    docs = _stage(_structure_docs(sf_dir), "doc_structure", sf_dir, "docs")
    return docs.map_batches(_structure_rows, batch_format="pyarrow")


def q_doc_structure_stats(sf_dir: str):
    """Per-document StructureStatistics
    (``document_structure.rs:237-293``): heading/section totals, max
    hierarchy depth, root count and per-level heading counts (pivoted
    to level_1..level_6 columns)."""
    from graphrag_rs_ray.functions.layout import (parse_layout,
                                                  structure_statistics)
    docs = _stage(_structure_docs(sf_dir), "doc_structure_stats", sf_dir,
                  "docs")

    def stats_rows(t: pa.Table) -> pa.Table:
        c: dict[str, list] = {"doc_id": [], "total_headings": [],
                              "total_sections": [], "max_depth": [],
                              "root_sections": [], "has_structure": []}
        for lvl in range(1, 7):
            c[f"level_{lvl}"] = []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            headings, sections, roots = parse_layout(text, "markdown")
            st = structure_statistics(headings, sections, roots)
            c["doc_id"].append(did)
            for k in ("total_headings", "total_sections", "max_depth",
                      "root_sections"):
                c[k].append(st[k])
            for lvl in range(1, 7):
                c[f"level_{lvl}"].append(st[f"level_{lvl}"])
            c["has_structure"].append(bool(headings))
        out = {"doc_id": pa.array(c["doc_id"], pa.int64())}
        for k in ("total_headings", "total_sections", "max_depth",
                  "root_sections"):
            out[k] = pa.array(c[k], pa.int64())
        for lvl in range(1, 7):
            out[f"level_{lvl}"] = pa.array(c[f"level_{lvl}"], pa.int64())
        out["has_structure"] = pa.array(c["has_structure"], pa.bool_())
        return pa.table(out)

    return docs.map_batches(stats_rows, batch_format="pyarrow")


# ------------------------------------------------------ LLM evaluation --
# evaluation/mod.rs — prompt generation over EvaluableQueryResults,
# deterministic fake-LLM scoring, JSON parse, threshold/weakest/report.


def _eval_components(i: int, text: str) -> tuple[dict, str]:
    """Deterministic EvaluableQueryResult synthesized from a document
    row, exercising every formatter branch: empty lists (counts 0 →
    the 'No ... retrieved.' strings), take-10 entity/relationship
    truncation (up to 12/11), take-5 chunk truncation (up to 7) and
    the 200-char chunk preview ellipsis."""
    from graphrag_rs_ray.functions.evaluation import build_result
    strategy = ("semantic", "keyword", "hybrid")[i % 3]
    ents = [{"name": f"Entity {i % 50}_{j}",
             "entity_type": ("person", "organization", "location",
                             "concept")[j % 4],
             "confidence": 0.5 + 0.05 * (j % 10)}
            for j in range(i % 13)]
    rels = [{"source": f"Entity {i % 50}_{j}",
             "target": f"Entity {i % 50}_{j + 1}",
             "relation_type": ("knows", "works_at", "located_in")[j % 3],
             "confidence": 0.6 + 0.05 * (j % 8)}
            for j in range(i % 12)]
    chunks = [text[j * 40:j * 40 + 230] for j in range(i % 8)]
    res = build_result(
        query=f"What is the subject of document {i}?",
        answer=text[:160] if text else "(empty document)",
        entities=ents, relationships=rels, chunks=chunks,
        retrieval_strategy=strategy)
    return res, strategy


def q_llm_evaluation(sf_dir: str):
    """LLM evaluation loop (``evaluation/mod.rs:164-318``): prompt
    assembly (sequential placeholder .replace, top-10/10/5 formatter
    truncations, 200-char chunk previews), a deterministic fake-LLM
    response in the reference's demanded JSON format, strict parse,
    overall/threshold/weakest-dimension and the byte-exact report.
    The oracle re-assembles the prompt from the staged normalized
    tables, re-derives every score from length(prompt) and rebuilds
    prompt AND report md5s — prompt parity is load-bearing for all
    downstream columns.  Per-result map, bounded list sizes: scale-safe."""
    import hashlib

    import ray.data as rd
    from graphrag_rs_ray.functions.evaluation import (
        fake_llm_evaluation_response, generate_prompt, parse_evaluation,
        passes_threshold, report, weakest_dimension)

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def gen_results(t: pa.Table) -> pa.Table:
        c = {k: [] for k in ("doc_id", "query", "answer", "strategy",
                             "n_entities", "n_relationships", "n_chunks")}
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            res, strategy = _eval_components(int(did), text)
            c["doc_id"].append(int(did))
            c["query"].append(res["query"])
            c["answer"].append(res["answer"])
            c["strategy"].append(strategy)
            c["n_entities"].append(res["metadata"]["entities_count"])
            c["n_relationships"].append(
                res["metadata"]["relationships_count"])
            c["n_chunks"].append(res["metadata"]["chunks_count"])
        return pa.table({
            "doc_id": pa.array(c["doc_id"], pa.int64()),
            "query": pa.array(c["query"], pa.string()),
            "answer": pa.array(c["answer"], pa.string()),
            "strategy": pa.array(c["strategy"], pa.string()),
            "n_entities": pa.array(c["n_entities"], pa.int64()),
            "n_relationships": pa.array(c["n_relationships"], pa.int64()),
            "n_chunks": pa.array(c["n_chunks"], pa.int64())})

    def gen_lists(t: pa.Table) -> pa.Table:
        c: dict[str, list] = {k: [] for k in (
            "doc_id", "kind", "ord", "name", "etype", "source", "rtype",
            "target", "conf", "ctext")}
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            res, _ = _eval_components(int(did), text)
            for j, e in enumerate(res["retrieved_entities"]):
                c["doc_id"].append(int(did)); c["kind"].append("ent")
                c["ord"].append(j); c["name"].append(e["name"])
                c["etype"].append(e["entity_type"])
                c["source"].append(None); c["rtype"].append(None)
                c["target"].append(None)
                c["conf"].append(e["confidence"]); c["ctext"].append(None)
            for j, r in enumerate(res["retrieved_relationships"]):
                c["doc_id"].append(int(did)); c["kind"].append("rel")
                c["ord"].append(j); c["name"].append(None)
                c["etype"].append(None); c["source"].append(r["source"])
                c["rtype"].append(r["relation_type"])
                c["target"].append(r["target"])
                c["conf"].append(r["confidence"]); c["ctext"].append(None)
            for j, ch in enumerate(res["context_chunks"]):
                c["doc_id"].append(int(did)); c["kind"].append("chunk")
                c["ord"].append(j); c["name"].append(None)
                c["etype"].append(None); c["source"].append(None)
                c["rtype"].append(None); c["target"].append(None)
                c["conf"].append(None); c["ctext"].append(ch)
        return pa.table({
            "doc_id": pa.array(c["doc_id"], pa.int64()),
            "kind": pa.array(c["kind"], pa.string()),
            "ord": pa.array(c["ord"], pa.int64()),
            "name": pa.array(c["name"], pa.string()),
            "etype": pa.array(c["etype"], pa.string()),
            "source": pa.array(c["source"], pa.string()),
            "rtype": pa.array(c["rtype"], pa.string()),
            "target": pa.array(c["target"], pa.string()),
            "conf": pa.array(c["conf"], pa.float64()),
            "ctext": pa.array(c["ctext"], pa.string())})

    _stage(docs.map_batches(gen_results, batch_format="pyarrow"),
           "llm_evaluation", sf_dir, "results")
    _stage(docs.map_batches(gen_lists, batch_format="pyarrow"),
           "llm_evaluation", sf_dir, "lists")

    def eval_rows(t: pa.Table) -> pa.Table:
        c: dict[str, list] = {k: [] for k in (
            "doc_id", "strategy", "prompt_chars", "prompt_md5",
            "score_relevance", "score_faithfulness", "score_completeness",
            "score_coherence", "score_groundedness", "overall_score",
            "passes_3", "weakest_dimension", "weakest_score", "summary",
            "report_md5")}
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            res, strategy = _eval_components(int(did), text)
            prompt = generate_prompt(res)
            ev = parse_evaluation(
                fake_llm_evaluation_response(prompt, strategy))
            wname, wsc = weakest_dimension(ev)
            c["doc_id"].append(int(did))
            c["strategy"].append(strategy)
            c["prompt_chars"].append(len(prompt))
            c["prompt_md5"].append(
                hashlib.md5(prompt.encode("utf-8")).hexdigest())
            for dim in ("relevance", "faithfulness", "completeness",
                        "coherence", "groundedness"):
                c[f"score_{dim}"].append(ev[dim]["score"])
            c["overall_score"].append(ev["overall_score"])
            c["passes_3"].append(passes_threshold(ev, 3.0))
            c["weakest_dimension"].append(wname)
            c["weakest_score"].append(wsc["score"])
            c["summary"].append(ev["summary"])
            c["report_md5"].append(
                hashlib.md5(report(ev).encode("utf-8")).hexdigest())
        out = {"doc_id": pa.array(c["doc_id"], pa.int64()),
               "strategy": pa.array(c["strategy"], pa.string()),
               "prompt_chars": pa.array(c["prompt_chars"], pa.int64()),
               "prompt_md5": pa.array(c["prompt_md5"], pa.string())}
        for dim in ("relevance", "faithfulness", "completeness",
                    "coherence", "groundedness"):
            out[f"score_{dim}"] = pa.array(c[f"score_{dim}"], pa.int64())
        out["overall_score"] = pa.array(c["overall_score"], pa.float64())
        out["passes_3"] = pa.array(c["passes_3"], pa.bool_())
        out["weakest_dimension"] = pa.array(c["weakest_dimension"],
                                            pa.string())
        out["weakest_score"] = pa.array(c["weakest_score"], pa.int64())
        out["summary"] = pa.array(c["summary"], pa.string())
        out["report_md5"] = pa.array(c["report_md5"], pa.string())
        return pa.table(out)

    return docs.map_batches(eval_rows, batch_format="pyarrow")


# ------------------------------------------------ graph embeddings --
# graph/embeddings.rs — Node2Vec + GraphSAGE over a bounded KG subgraph.


_GE_CFG = dict(dimension=32, walk_length=20, walks_per_node=4,
               context_size=5, epochs=2, seed=17)


def q_node2vec(sf_dir: str):
    """Node2Vec (``graph/embeddings.rs:132-320``): distributed biased
    walks (counter-seeded streams — partition-order-independent) over a
    bounded weighted KG subgraph, sequential simplified skip-gram
    (reference semantics).  Not SQL-expressible (seeded RNG + sequential
    training) — rows-only driver check; local==distributed equality and
    the reference's own test expectations are unit-gated."""
    from graphrag_rs_ray.functions.graph_embeddings import EmbeddingConfig
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        node2vec_embeddings)
    edges = _staged_weighted_edges("node2vec", sf_dir, max_nodes=48)
    out = node2vec_embeddings(edges, EmbeddingConfig(**_GE_CFG))
    return out.map_batches(
        lambda t: t.select(["node", "dim", "l2_norm"]),
        batch_format="pyarrow")


def q_graphsage(sf_dir: str):
    """GraphSAGE (``graph/embeddings.rs:360-509``): per-layer node
    fan-out with broadcast (adjacency, features); mean aggregation,
    seeded sample-without-replacement.  Rows-only (seeded RNG)."""
    from graphrag_rs_ray.functions.graph_embeddings import GraphSAGEConfig
    from graphrag_rs_ray.pipelines.graph_embeddings import (
        graphsage_embeddings)
    edges = _staged_weighted_edges("graphsage", sf_dir, max_nodes=48)
    out = graphsage_embeddings(
        edges, GraphSAGEConfig(dimension=32, num_layers=2,
                               samples_per_layer=[5, 3], seed=17))
    return out.map_batches(
        lambda t: t.select(["node", "dim", "l2_norm"]),
        batch_format="pyarrow")


# ------------------------------------------------ vector store actor --
# vector/voy_store.rs — shared mutable vector index as a Ray actor.


def _loaded_vector_store(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd
    from graphrag_rs_ray.state.vector_store import (
        load_dataset_into_store, vector_store_actor)
    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["embedding"]).column("embedding")
    dim = len(head[0])
    store = vector_store_actor(dim)
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    load_dataset_into_store(store, ds, "vec_id", "embedding")
    return store, path


def q_vector_store_topk(sf_dir: str):
    """Vector-store search (``vector/voy_store.rs:88-204``): stream the
    embeddings table into ONE shared-index actor (batched add RPCs),
    build, then top-10 cosine per query (first 5 vec_ids) — ranks tied
    by vec_id ascending, matching the knn oracle convention.  Backend is
    a real median-split k-d tree (exact branch-and-bound k-NN on unit
    vectors + f64 cosine rerank — state/vector_store.py::KDTree), the
    same index family voy_store.rs wraps; tree == scan gated by
    tests/test_vector_store.py."""
    import ray
    import ray.data as rd
    store, path = _loaded_vector_store(sf_dir)
    ray.get(store.build_index.remote())
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    head = pq.read_table(path, columns=["vec_id", "embedding"])
    order = _pc.sort_indices(head.column("vec_id"))[:5]
    qids = _pc.take(head.column("vec_id"), order).to_pylist()
    qvecs = _pc.take(head.column("embedding"), order).to_pylist()
    rows = {"query_id": [], "vec_id": [], "rank": []}
    for qid, qv in zip(qids, qvecs):
        hits = ray.get(store.search.remote(qv, 50))
        hits.sort(key=lambda h: (-h[1], int(h[0])))
        for r, (vid, _) in enumerate(hits[:10], start=1):
            rows["query_id"].append(int(qid))
            rows["vec_id"].append(int(vid))
            rows["rank"].append(r)
    return rd.from_arrow(pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "vec_id": pa.array(rows["vec_id"], pa.int64()),
        "rank": pa.array(rows["rank"], pa.int64())}))


def q_vector_store_stats(sf_dir: str):
    """VoyStoreStatistics (``voy_store.rs:288-320``) over the loaded
    store: count, dimension, built flag, min/max/avg raw-embedding
    norms (round 8 — pairwise-vs-sequential summation)."""
    import ray
    import ray.data as rd
    store, _ = _loaded_vector_store(sf_dir)
    ray.get(store.build_index.remote())
    st = ray.get(store.statistics.remote())
    return rd.from_arrow(pa.table({
        "vector_count": pa.array([st["vector_count"]], pa.int64()),
        "dimension": pa.array([st["dimension"]], pa.int64()),
        "index_built": pa.array([st["index_built"]], pa.bool_()),
        "min_norm": pa.array([round(st["min_norm"], 8)], pa.float64()),
        "max_norm": pa.array([round(st["max_norm"], 8)], pa.float64()),
        "avg_norm": pa.array([round(st["avg_norm"], 8)], pa.float64())}))


def _import_union(entities_ds, rels_ds):
    """Pad entity/relationship datasets to one shared all-string schema
    (kind 'e'/'r'; '' fills — never NULL, per the oracle-parity rule)."""
    import ray.data as rd

    def pad_e(t: pa.Table) -> pa.Table:
        fill = pa.array([""] * t.num_rows, pa.string())
        return pa.table({"kind": pa.array(["e"] * t.num_rows, pa.string()),
                         "id": t.column("id"), "name": t.column("name"),
                         "entity_type": t.column("entity_type"),
                         "attributes": t.column("attributes"),
                         "source": fill, "target": fill, "relation_type": fill})

    def pad_r(t: pa.Table) -> pa.Table:
        fill = pa.array([""] * t.num_rows, pa.string())
        return pa.table({"kind": pa.array(["r"] * t.num_rows, pa.string()),
                         "id": fill, "name": fill, "entity_type": fill,
                         "attributes": t.column("attributes"),
                         "source": t.column("source"),
                         "target": t.column("target"),
                         "relation_type": t.column("relation_type")})

    return (entities_ds.map_batches(pad_e, batch_format="pyarrow")
            .union(rels_ds.map_batches(pad_r, batch_format="pyarrow")))


def _stage_lines(lines: list[str], query: str, sf_dir: str):
    """Write synthesized import-source lines once as the raw file (the
    importer's input) and once as a `line` Parquet column (the oracle's
    input); returns the raw-file path."""
    import shutil
    import pyarrow.parquet as _pq
    src_dir = _stage_path(query, sf_dir, "src")
    lines_dir = _stage_path(query, sf_dir, "lines")
    for d in (src_dir, lines_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
    raw = os.path.join(src_dir, "input.txt")
    with open(raw, "w") as f:
        f.write("\n".join(lines) + "\n")
    _pq.write_table(pa.table({"line": pa.array(lines, pa.string())}),
                    os.path.join(lines_dir, "part-0.parquet"))
    return raw


def _rdf_ntriples_lines(sf_dir: str) -> list[str]:
    """Deterministic N-Triples corpus derived from `documents` (doc_id,
    lang): even ids get an rdfs:label, ids %3==0 get an rdf:type, every
    doc links to doc[(idx*7+1) % N] and carries a `lang` literal."""
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "lang"])
    ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    order = sorted(range(len(ids)), key=lambda j: ids[j])
    n = len(ids)
    base = "http://ex.org/doc/"
    lines = ["# synthesized N-Triples import corpus"]
    for idx, j in enumerate(order):
        i, lang = ids[j], langs[j]
        s = f"<{base}{i}>"
        if i % 2 == 0:
            lines.append(f'{s} <http://www.w3.org/2000/01/rdf-schema#label> "Doc {i}" .')
        if i % 3 == 0:
            lines.append(f"{s} <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
                         f"<http://ex.org/ns#Document> .")
        tgt = ids[order[(idx * 7 + 1) % n]]
        lines.append(f"{s} <http://ex.org/ns/links> <{base}{tgt}> .")
        lines.append(f'{s} <http://ex.org/ns/lang> "{lang}" .')
    return lines


def q_rdf_import(sf_dir: str):
    """REAL N-Triples import (the reference's importer is a TODO stub,
    ``data_import.rs:533-543``): parse lines → relationships + per-subject
    entity merge (label/type/attribute folds).  Oracle re-parses the SAME
    staged lines with RE2 and re-derives both tables in SQL."""
    from graphrag_rs_ray.sources.rdf_graphml import import_rdf
    raw = _stage_lines(_rdf_ntriples_lines(sf_dir), "rdf_import", sf_dir)
    ents, rels, _errors = import_rdf(raw)
    return _import_union(ents, rels)


def _turtle_lines(sf_dir: str) -> list[str]:
    """Deterministic Turtle-lite corpus — the same shapes as
    ``_rdf_ntriples_lines`` but via @prefix'd names and the `a` keyword,
    so the SQL oracle re-derives the expansion too."""
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "lang"])
    ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    order = sorted(range(len(ids)), key=lambda j: ids[j])
    n = len(ids)
    lines = ["# synthesized Turtle-lite import corpus",
             "@prefix doc: <http://ex.org/doc/> .",
             "@prefix ex: <http://ex.org/ns/> .",
             "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> ."]
    for idx, j in enumerate(order):
        i, lang = ids[j], langs[j]
        if i % 2 == 0:
            lines.append(f'doc:{i} rdfs:label "Doc {i}" .')
        if i % 3 == 0:
            lines.append(f"doc:{i} a ex:Document .")
        tgt = ids[order[(idx * 7 + 1) % n]]
        lines.append(f"doc:{i} ex:links doc:{tgt} .")
        lines.append(f'doc:{i} ex:lang "{lang}" .')
    return lines


def q_turtle_import(sf_dir: str):
    """Turtle-lite import (prefix expansion front end over the N-Triples
    machinery).  The oracle re-derives BOTH halves from the same staged
    raw lines: the prefix/`a` expansion via regexp_replace, then the
    same parse + per-subject merge SQL as `rdf_import`."""
    from graphrag_rs_ray.sources.rdf_graphml import import_turtle
    raw = _stage_lines(_turtle_lines(sf_dir), "turtle_import", sf_dir)
    ents, rels, _errors = import_turtle(raw)
    return _import_union(ents, rels)


def _graphml_lines(sf_dir: str) -> list[str]:
    """Deterministic one-element-per-line GraphML derived from
    `documents`: d0=name (even ids), d1=type (ids %3==0), d2=lang,
    edge d3=type (even ids; others default RELATED_TO)."""
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "lang"])
    ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    order = sorted(range(len(ids)), key=lambda j: ids[j])
    n = len(ids)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
             '<key id="d0" for="node" attr.name="name"/>',
             '<key id="d1" for="node" attr.name="type"/>',
             '<key id="d2" for="node" attr.name="lang"/>',
             '<key id="d3" for="edge" attr.name="type"/>',
             '<graph edgedefault="directed">']
    for idx, j in enumerate(order):
        i, lang = ids[j], langs[j]
        data = []
        if i % 2 == 0:
            data.append(f'<data key="d0">Doc {i}</data>')
        if i % 3 == 0:
            data.append('<data key="d1">Report</data>')
        data.append(f'<data key="d2">{lang}</data>')
        lines.append(f'<node id="n{i}">{"".join(data)}</node>')
        tgt = ids[order[(idx * 7 + 1) % n]]
        edata = '<data key="d3">links_to</data>' if i % 2 == 0 else ""
        lines.append(f'<edge source="n{i}" target="n{tgt}">{edata}</edge>')
    lines += ["</graph>", "</graphml>"]
    return lines


def q_graphml_import(sf_dir: str):
    """REAL GraphML import (the reference's importer is a TODO stub,
    ``data_import.rs:545-556``): ElementTree parse per file → key-mapped
    node/edge attributes.  Oracle re-parses the SAME staged lines with
    RE2 (the generator emits one element per line) and re-derives both
    tables in SQL — two independent parsers over identical raw text."""
    from graphrag_rs_ray.sources.rdf_graphml import import_graphml
    raw = _stage_lines(_graphml_lines(sf_dir), "graphml_import", sf_dir)
    ents, rels, _errors = import_graphml(raw)
    return _import_union(ents, rels)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship KG construction (non-SQL-expressible → rows-only checks)
        "kg_triples": q_kg_triples,
        "kg_entities": q_kg_entities,
        "kg_entities_fuzzy": q_kg_entities_fuzzy,
        "kg_mentions": q_kg_mentions,
        "kg_chunks": q_kg_chunks,
        "kg_extract_text": q_extract_text,
        # training-data ops with DuckDB oracles
        "text_clean": q_text_clean,
        "exact_dedup": td.exact_dedup,
        "doc_fingerprints": td.doc_fingerprints,
        "token_stats": td.token_stats,
        "language_id": td.language_id,
        "quality_scores": td.quality_scores,
        "bm25_df": td.bm25_df,
        "bm25_corpus_stats": td.bm25_corpus_stats,
        "knn_bruteforce": td.knn_bruteforce,
        "cosine_dup_pairs": lambda sf: td.cosine_dup_pairs(sf, threshold=0.35),
        "windowed_event_counts": td.windowed_event_counts,
        "temporal_edges": td.temporal_edges,
        "temporal_snapshot": td.temporal_snapshot,
        "temporal_evolution": td.temporal_evolution,
        "temporal_node_churn": td.temporal_node_churn,
        "temporal_top_growing": td.temporal_top_growing,
        "temporal_centrality": td.temporal_centrality,
        "session_windows": td.session_windows,
        "sliding_window_counts": td.sliding_window_counts,
        "purchases_asof_click": td.purchases_asof_click,
        "shipped_within_window": td.shipped_within_window,
        "customers_with_orders": td.customers_semi_anti,
        "hybrid_search": q_hybrid_search,
        "tfidf_topk": td.tfidf_topk,
        # near-dup family (staged-input oracles: band rows / vocab hashes /
        # candidate pairs / plane matrix; the raw hashing stays unit-gated)
        "minhash_lsh_candidates": q_minhash_lsh_candidates,
        "simhash_signatures": q_simhash_signatures,
        "ngram_dedup_pairs": q_ngram_dedup_pairs,
        "dedup_clusters": q_dedup_clusters,
        "simhash_dup_pairs": q_simhash_dup_pairs,
        "simhash_dup_pairs_manku": q_simhash_dup_pairs_manku,
        # winnowing fingerprints: zero-staging oracle (full SQL re-derive)
        "winnow_fingerprints": td.winnow_fingerprints,
        "winnow_dup_pairs": td.winnow_dup_pairs,
        # CCNet-style bigram-LM quality scoring: zero-staging oracle
        "lm_perplexity": td.lm_perplexity,
        "perplexity_buckets": td.perplexity_buckets,
        # Gopher quality-filter rules: all-integer, zero-staging oracle
        "gopher_quality": td.gopher_quality,
        "gopher_repetition": td.gopher_repetition,
        # eval-set decontamination: broadcast-small-side shingle overlap
        "decontaminate": td.decontaminate,
        # reproducible per-domain token-budget sampling (mixing step)
        "domain_mixture": td.domain_mixture,
        # duplicate-span profiling over shared winnow fingerprints
        "dup_span_profile": td.dup_span_profile,
        # one-row corpus composition report over the Gopher gates
        "curation_report": td.curation_report,
        # duplicate-span removal transform (keep-first-occurrence)
        "remove_dup_spans": td.remove_dup_spans,
        # DSIR importance scoring vs a deterministic target split
        "dsir_scores": td.dsir_scores,
        # GPT-style sequence-packing manifest (distributed prefix scan)
        "sequence_pack": td.sequence_pack,
        # deterministic hash-based train/val/test split
        "corpus_split": td.corpus_split,
        # C4 line-level cleaning (Raffel+ 2020 §2.2)
        "c4_clean": td.c4_clean,
        # PII redaction (typed placeholders, pinned pass order)
        "pii_redact": td.pii_redact,
        # corpus-wide exact line dedup (CCNet/RefinedWeb line correction)
        "line_dedup": td.line_dedup,
        # corpus vocabulary builder (BPE counting pass, global top-k)
        "vocab_topk": td.vocab_topk,
        # BPE subword tokenizer (Sennrich+ 2016): learned merges,
        # per-distinct-word segmentation, per-doc piece counts — the
        # ENTIRE learning loop re-derived in generated SQL, zero staging
        "bpe_merges": q_bpe_merges,
        "bpe_segments": q_bpe_segments,
        "bpe_token_stats": q_bpe_token_stats,
        # SemDeDup (Abbas+ 2023): k-means-blocked embedding near-dedup
        "semdedup": q_semdedup,
        # model-based quality filter (hashing-trick linear scorer;
        # deterministic stand-in weights, zero-staging oracle)
        "quality_classifier": td.quality_classifier,
        # deterministic training-order shuffle + shard manifest
        # (distributed order statistic over md5 hash order)
        "shuffle_shards": td.shuffle_shards,
        # temperature-scaled domain sampling weights (mT5/DoReMi mix)
        "mixture_weights": td.mixture_weights,
        # Common-Crawl link graph: <a href> extraction → edges →
        # host rollup → host PageRank (all oracle-replayed)
        "web_link_graph": q_web_link_graph,
        "domain_link_stats": q_domain_link_stats,
        "host_rank": q_host_rank,
        "anchor_text_index": q_anchor_text_index,
        # jusText-style link-density boilerplate block decisions
        "boilerplate_blocks": q_boilerplate_blocks,
        # neighborhood-overlap link prediction (CN/Jaccard/Adamic-Adar)
        "link_prediction": q_link_prediction,
        # HyperLogLog distinct-token sketch: registers + estimate
        "hll_registers": td.hll_registers,
        "hll_estimate": td.hll_estimate,
        # Count-Min sketch: registers + heavy-hitter point queries
        "cms_registers": td.cms_registers,
        "cms_heavy_hitters": td.cms_heavy_hitters,
        # Bloom filter: set-bit table + membership probes
        "bloom_bits": td.bloom_bits,
        "bloom_membership": td.bloom_membership,
        # unicode NFC audit + exact no-sort word-count quantiles
        "unicode_audit": td.unicode_audit,
        "length_quantiles": td.length_quantiles,
        # cross-snapshot corpus diff (added/removed/changed/same)
        "corpus_diff": td.corpus_diff,
        # reproducible uniform hash-rate subsample
        "corpus_sample": td.corpus_sample,
        # schema-on-read JSON extraction over events.props
        "event_props_stats": td.event_props_stats,
        # ordered funnel analysis (first-touch subsequence depth)
        "event_funnel": td.event_funnel,
        # cohort retention triangle (first-event-day cohorts)
        "event_retention": td.event_retention,
        "corpus_curation": q_corpus_curation,
        "lsh_buckets": q_lsh_buckets,
        # bucketed (LSH-blocked) scale path for embedding near-dup —
        # oracle-exact at these settings (recall ≈ 1 - 1.5e-10)
        "cosine_dup_pairs_bucketed": lambda sf: td.cosine_dup_pairs_bucketed(
            sf, threshold=0.35, band_bits=2, n_bands=48),
        # IVF ANN (approximate vs exact knn by design, recall gated in
        # tests; the within-probed-lists scan+rank is oracle-exact)
        "ivf_topk": q_ivf_topk,
        "hnsw_topk": q_hnsw_topk,
        # LazyGraphRAG concept-graph path + enrichment (rows-only)
        "concept_mentions": q_concept_mentions,
        "concept_table": q_concept_table,
        "concept_edges": q_concept_edges,
        "enriched_chunks": q_enriched_chunks,
        "semantic_chunks": q_semantic_chunks,
        # derived graph tables / similarity edges / multimodal plumbing
        "entity_to_chunks": q_entity_to_chunks,
        "chunk_to_entities": q_chunk_to_entities,
        "co_occurring_entities": q_co_occurring_entities,
        "semantic_edges": q_semantic_edges,
        "multimodal_features": q_multimodal_features,
        "frame_samples": q_frame_samples,
        "pagerank": q_pagerank,
        # graph ops over staged triples (oracle-checked) + communities
        "k_hop": q_k_hop,
        "degree_stats": q_degree_stats,
        "connected_components": q_connected_components,
        "consistency_report": q_consistency_report,
        "doc_tree": q_doc_tree,
        "doc_tree_summaries": q_doc_tree_summaries,
        "doc_tree_search": q_doc_tree_search,
        "triangle_counts": q_triangle_counts,
        "shortest_paths": q_shortest_paths,
        "all_paths": q_all_paths,
        "pagerank_retrieval": q_pagerank_retrieval,
        "query_plans": q_query_plans,
        "hybrid_fusion": q_hybrid_fusion,
        "enriched_search": q_enriched_search,
        "adaptive_fusion": q_adaptive_fusion,
        "semantic_merge_pairs": q_semantic_merge_pairs,
        "semantic_merge_groups": q_semantic_merge_groups,
        "entity_clusters": q_entity_clusters,
        "entity_clusters_grouped": q_entity_clusters_grouped,
        "entity_linking_stats": q_entity_linking_stats,
        # string-similarity linker (entity/string_similarity_linker.rs)
        "string_sim_pairs": q_string_sim_pairs,
        "string_links": q_string_links,
        # answer generation (generation/mod.rs, MockLLM + generator)
        "generated_answers": q_generated_answers,
        # LazyGraphRAG end-to-end pipeline (lightrag/lazy_pipeline.rs)
        "lazy_chunks": q_lazy_chunks,
        "lazy_pipeline_stats": q_lazy_pipeline_stats,
        # function-calling agent layer (agent.rs / tools.rs)
        "agent_plans": q_agent_plans,
        "query_analysis": q_query_analysis,
        "agent_sessions": q_agent_sessions,
        # ROGRAG response synthesis + templates (rograg/streaming.rs)
        "rograg_responses": q_rograg_responses,
        "text_statistics": q_text_statistics,
        "section_numbers": q_section_numbers,
        "ego_network": q_ego_network,
        "multi_source_bfs": q_multi_source_bfs,
        "query_focused_subgraph": q_query_focused_subgraph,
        "graph_statistics": q_graph_statistics,
        "centrality": q_centrality,
        "communities": q_communities,
        "community_summaries": q_community_summaries,
        "chunk_embeddings": q_chunk_embeddings,
        "neural_embeddings": q_neural_embeddings,
        # BM25 scoring + sentence stats (oracle-checked)
        "bm25_scores": td.bm25_scores,
        "bm25_topk": td.bm25_topk,
        "sentence_stats": td.sentence_stats,
        # relational patterns (broadcast join, global top-k) — oracle-checked
        "orders_by_segment": td.orders_by_segment,
        "order_priority_revenue": td.order_priority_revenue,
        "top_parts_by_size": td.top_parts_by_size,
        # incremental delta ingest (rows-only)
        "incremental_update": q_incremental_update,
        # real RDF/GraphML import (TODO stubs in the reference) — oracle
        # re-parses the same staged raw lines in SQL
        "rdf_import": q_rdf_import,
        "turtle_import": q_turtle_import,
        "graphml_import": q_graphml_import,
        # rule-engine NER on actor pool (rows-only)
        "ner_mentions": q_ner_mentions,
        # mock-LLM gleaning path (rows-only)
        "gleaning_triples": q_gleaning_triples,
        # query-side bonus slice: cross-encoder rerank (pure SQL oracle),
        # HippoRAG PPR retrieval (staged weights/edges → replayed
        # recurrence), pipeline validation report (staged tables)
        "rerank_topk": q_rerank_topk,
        "hipporag_retrieval": q_hipporag_retrieval,
        "pipeline_validation": q_pipeline_validation,
        # ROGRAG batch query processing (oracle SQL generated from the
        # same pattern specs as the Python kernels)
        "query_intents": q_query_intents,
        "query_decomposition": q_query_decomposition,
        "logic_forms": q_logic_forms,
        "query_validation": q_query_validation,
        "fuzzy_matches": q_fuzzy_matches,
        "query_routing": q_query_routing,
        "query_rewrite": q_query_rewrite,
        # LightRAG query-side (dual keywords + merges oracle-checked;
        # iterative deepening is procedural → rows-only)
        "dual_keywords": q_dual_keywords,
        "dual_retrieval": q_dual_retrieval,
        "lazy_search": q_lazy_search,
        # batch agent-tool execution (function_calling/ + inference.rs)
        "tool_graph_search": q_tool_graph_search,
        "tool_entity_expand": q_tool_entity_expand,
        "tool_entity_context": q_tool_entity_context,
        "tool_validation": q_tool_validation,
        "tool_traverse": q_tool_traverse,
        "tool_infer": q_tool_infer,
        # ROGRAG quality metrics (per-response scoring + corpus report)
        "response_quality": q_response_quality,
        "quality_report": q_quality_report,
        # logic-form execution (oracle) + the full processor pipeline
        "logic_bindings": q_logic_bindings,
        "rograg_process": q_rograg_process,
        # corpus module (document_manager / collection_processor /
        # graph_indexer / knowledge_graph)
        "doc_collection": q_doc_collection,
        "corpus_entities": q_corpus_entities,
        "corpus_concepts": q_corpus_concepts,
        "corpus_concept_clusters": q_corpus_concept_clusters,
        "corpus_kg_entities": q_corpus_kg_entities,
        "corpus_kg_relations": q_corpus_kg_relations,
        "corpus_stats": q_corpus_stats,
        "corpus_search": q_corpus_search,
        "corpus_related": q_corpus_related,
        # document structure (text/document_structure.rs + layout parsers)
        "doc_structure": q_doc_structure,
        "doc_structure_stats": q_doc_structure_stats,
        # LLM evaluation framework (evaluation/mod.rs)
        "llm_evaluation": q_llm_evaluation,
        # graph embeddings (graph/embeddings.rs; seeded-RNG rows-only)
        "node2vec_embeddings": q_node2vec,
        "graphsage_embeddings": q_graphsage,
        # shared vector-store actor (vector/voy_store.rs)
        "vector_store_topk": q_vector_store_topk,
        "vector_store_stats": q_vector_store_stats,
    }


# -------------------------------------------------------- oracle_sql() --

_STOPLIST_SQL = "(" + ",".join(f"'{w}'" for w in sorted(STOP_WORDS)) + ")"

from graphrag_rs_ray.functions.keywords import TFIDF_STOPWORDS  # noqa: E402

_TFIDF_STOPLIST_SQL = "(" + ",".join(f"'{w}'" for w in sorted(TFIDF_STOPWORDS)) + ")"


_SQL_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"


def _summarizer_sql(keys: list[str], max_len: int) -> str:
    """Generated-SQL replay of ``functions/keywords.summarize``
    (``extractive_summarizer.rs:30-69,108-271``): sentence split on
    ``[.!?]``, content-word frequency, the 5-term weighted score with the
    exact Python f64 op shapes (sequential left-associated adds, same
    divisions), ``(-score, position)`` ranking, and the greedy
    length-budget selection (with its every-iteration 90% early-exit)
    as a recursive CTE carrying ``(cur_len, selected)`` state.

    Expects a CTE ``nodes({keys}, content)`` over ASCII-sanitized text
    (the staging device neutralizes Unicode ``isalnum``/``\\s``
    divergences) and emits a CTE chain ending in
    ``summ({keys}, summary)``.  Returned fragment starts mid-``WITH``
    (caller supplies ``WITH nodes AS (...), {fragment}``)."""
    from graphrag_rs_ray.functions.keywords import TFIDF_STOPWORDS
    K = ", ".join(keys)
    KP = lambda a: ", ".join(f"{a}.{k}" for k in keys)
    JOIN = lambda a, b: " AND ".join(f"{a}.{k} = {b}.{k}" for k in keys)
    stop = "[" + ", ".join(f"'{w}'" for w in sorted(TFIDF_STOPWORDS)) + "]"
    cut = max(max_len - 3, 0)
    stop_len = max_len * 9 // 10
    return f"""
            s0 AS (
              SELECT {K}, list_filter(
                       list_transform(regexp_split_to_array(content, '[.!?]'),
                                      x -> trim(x, {_SQL_WS})),
                       x -> x <> '') AS sents
              FROM nodes),
            smeta AS MATERIALIZED (
              SELECT {K}, sents, len(sents)::BIGINT AS n FROM s0),
            sx AS (
              SELECT {K}, n,
                     unnest(range(0, n)) AS pos,
                     unnest(sents) AS s
              FROM smeta WHERE n >= 2),
            sw AS (
              SELECT {K}, n, pos, s,
                     regexp_split_to_array(s, '\\s+') AS words,
                     list_filter(
                       list_transform(regexp_split_to_array(s, '\\s+'),
                         w -> trim(regexp_replace(lower(w), '[^a-z0-9'']', '', 'g'),
                                   chr(39))),
                       w -> w <> '' AND NOT list_contains({stop}, w)) AS cw
              FROM sx),
            wcount AS (
              SELECT {K}, w, count(*)::BIGINT AS c
              FROM (SELECT {K}, unnest(cw) AS w FROM sw)
              GROUP BY {K}, w),
            freqs AS (
              SELECT {K}, pos, count(*)::BIGINT AS n_sw, sum(c)::BIGINT AS sum_c
              FROM (SELECT {K}, pos, unnest(cw) AS w FROM sw) t
              JOIN wcount USING ({K}, w)
              GROUP BY {K}, pos),
            scored AS (
              SELECT {KP('sw')}, sw.n, sw.pos, sw.s,
                     ((CASE WHEN sw.pos = 0 THEN 2.0
                            WHEN sw.pos = sw.n - 1 THEN 1.5
                            ELSE 1.0 - (sw.pos::DOUBLE / sw.n::DOUBLE) * 0.5
                       END) * 0.3
                      + (CASE WHEN len(sw.words) < 5 THEN 0.3
                              WHEN len(sw.words) > 40 THEN 0.5
                              WHEN len(sw.words) BETWEEN 10 AND 25 THEN 1.0
                              ELSE 0.7 END) * 0.2
                      + CASE WHEN f.n_sw IS NOT NULL
                             THEN least((f.sum_c::DOUBLE / f.n_sw::DOUBLE) / 3.0,
                                        1.0) * 0.3
                             ELSE 0.0 END
                      + least(len(list_filter(sw.words,
                                w -> regexp_matches(w, '^[A-Z]')
                                     AND length(w) > 2
                                     AND NOT list_contains({stop}, lower(w))
                              ))::DOUBLE / len(sw.words)::DOUBLE, 1.0) * 0.1
                      + CASE WHEN len(list_filter(sw.words,
                                       w -> regexp_matches(w, '[0-9]'))) > 0
                             THEN least(len(list_filter(sw.words,
                                          w -> regexp_matches(w, '[0-9]')
                                        ))::DOUBLE * 0.3, 1.0) * 0.1
                             ELSE 0.0 END) AS score
              FROM sw LEFT JOIN freqs f ON {JOIN('sw', 'f')} AND sw.pos = f.pos),
            ranked AS MATERIALIZED (
              SELECT {K}, pos, s, length(s)::BIGINT AS sl,
                     row_number() OVER (PARTITION BY {K}
                                        ORDER BY score DESC, pos ASC)::BIGINT AS rk
              FROM scored),
            rec AS (
              SELECT {K}, 0::BIGINT AS rk, 0::BIGINT AS cur_len,
                     CAST([] AS BIGINT[]) AS sel, FALSE AS stopped
              FROM (SELECT DISTINCT {K} FROM ranked)
              UNION ALL
              SELECT {KP('r')}, k.rk,
                     CASE WHEN r.cur_len + k.sl + 1 <= {max_len}
                          THEN r.cur_len + k.sl + 1 ELSE r.cur_len END,
                     CASE WHEN r.cur_len + k.sl + 1 <= {max_len}
                          THEN list_append(r.sel, k.pos) ELSE r.sel END,
                     (CASE WHEN r.cur_len + k.sl + 1 <= {max_len}
                           THEN r.cur_len + k.sl + 1 ELSE r.cur_len END)
                       >= {stop_len}
              FROM rec r JOIN ranked k
                ON {JOIN('k', 'r')} AND k.rk = r.rk + 1
              WHERE NOT r.stopped),
            fin AS (
              SELECT {K}, max_by(sel, rk) AS sel FROM rec GROUP BY {K}),
            fin2 AS (
              SELECT {KP('f')},
                     CASE WHEN len(f.sel) = 0 THEN [r1.pos] ELSE f.sel END AS sel
              FROM fin f JOIN ranked r1 ON {JOIN('f', 'r1')} AND r1.rk = 1),
            multi AS (
              SELECT {K}, string_agg(s, ' ' ORDER BY pos) AS out
              FROM (SELECT {KP('f')}, unnest(f.sel) AS pos FROM fin2 f) u
              JOIN ranked USING ({K}, pos)
              GROUP BY {K}),
            summ AS (
              SELECT {KP('m')},
                     CASE WHEN m.n = 0 THEN ''
                          WHEN m.n = 1 THEN
                            CASE WHEN length(m.sents[1]) <= {max_len}
                                 THEN m.sents[1]
                                 ELSE rtrim(substr(m.sents[1], 1, {cut}),
                                            {_SQL_WS}) || '...' END
                          ELSE
                            CASE WHEN length(mo.out) > {max_len}
                                 THEN rtrim(substr(mo.out, 1, {cut}),
                                            {_SQL_WS}) || '...'
                                 ELSE mo.out END
                     END AS summary
              FROM smeta m LEFT JOIN multi mo ON {JOIN('m', 'mo')})"""


def _kg_chunks_sql(chunk_size: int = 1000, overlap: int = 100,
                   min_chunk: int = 50) -> str:
    """Generated-SQL replay of the hierarchical chunker
    (``functions/chunking.py`` port of ``text/chunking.rs:48-152``) over
    staged sanitized docs: the while-loop is a recursive CTE over chunk
    START positions; each step re-derives the separator-priority boundary
    (8 reverse-strpos rfinds + the quarter-window gate, falling back to
    the backward word-boundary scan), the overlap back-off with the
    forced-progress guard, and the min-size trim gate.  All offsets are
    codepoints on both sides (DuckDB substr/length are character-based)."""
    s = _staged_sql("kg_chunks")
    seps = ["\n\n", "\n", ". ", "! ", "? ", "; ", ": ", " "]

    def lit(x: str) -> str:
        # SQL literal for a separator (newlines via chr())
        return " || ".join("chr(10)" if c == "\n" else f"'{c}'" for c in x) \
            if "\n" in x else f"'{x}'"

    def wb(p: str, t: str) -> str:
        # _word_boundary_backward(t, p): p minus the trailing
        # non-whitespace run length of t[:p]
        return (f"({p} - length(regexp_extract(substr({t}, 1, {p}),"
                f" '[^ \\t\\n\\x0B\\x0C\\r]*$')))")

    cascade = ", ".join(
        f"""CASE WHEN strpos(rw, {lit(sep[::-1])}) > 0
                 AND s + length(w) - strpos(rw, {lit(sep[::-1])}) + 1 > q
            THEN s + length(w) - strpos(rw, {lit(sep[::-1])}) + 1 END"""
        for sep in seps)

    # shared layering: starts × docs → (e0, w, rw, q) → opt → e
    def layers(extra_where: str) -> str:
        return f"""
          SELECT doc_id, s, text, lang, n, e0, tail,
                 CASE WHEN tail THEN n
                      WHEN opt > s THEN opt ELSE e0 END AS e
          FROM (
            SELECT doc_id, s, text, lang, n, e0, tail,
                   COALESCE({cascade}, {wb('e0', 'text')}) AS opt
            FROM (
              SELECT doc_id, s, text, lang, n, e0, tail, q, w, reverse(w) AS rw
              FROM (
                SELECT st.doc_id, st.s, d.text, d.lang, d.n,
                       least(st.s + {chunk_size}, d.n) AS e0,
                       (st.s + {chunk_size} >= d.n) AS tail,
                       st.s + ((least(st.s + {chunk_size}, d.n) - st.s) // 4) AS q,
                       substr(d.text, st.s + 1,
                              least(st.s + {chunk_size}, d.n) - st.s) AS w
                FROM starts st JOIN docs d USING (doc_id)
                {extra_where}) z1) z2) z3"""

    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    return f"""
            WITH RECURSIVE docs AS MATERIALIZED (
              SELECT doc_id, text, lang, length(text)::BIGINT AS n
              FROM {s}
              WHERE text IS NOT NULL AND text <> ''),
            starts AS (
              SELECT doc_id, 0::BIGINT AS s FROM docs
              UNION ALL
              SELECT doc_id,
                     CASE WHEN {wb('greatest(e - ' + str(overlap) + ', 0)',
                                   'text')} <= s
                          THEN e
                          ELSE {wb('greatest(e - ' + str(overlap) + ', 0)',
                                   'text')} END AS s
              FROM ({layers('WHERE st.s + ' + str(chunk_size) + ' < d.n')}) z4),
            emitted AS (
              SELECT doc_id, s, e, lang,
                     substr(text, s + 1, e - s) AS chunk
              FROM ({layers('')}) z5
              WHERE length(trim(substr(text, s + 1, e - s), {ws}))
                      >= {min_chunk})
            SELECT doc_id || '_' ||
                     (row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1)
                     AS chunk_id,
                   doc_id, chunk AS text, s AS start, e AS "end", lang
            FROM emitted"""


def _tool_infer_sql() -> str:
    """Generated-SQL replay of the batch ``infer_relationships`` tool
    (``inference.rs:83-402`` via ``functions/toolcalls.py``) over the
    staged calls + pinned-order tool-graph views (entities, chunk texts,
    chunk-membership rows):

    - 3-phase name resolution (exact → contains → fuzzy with the
      single-word-early-return / last-word / byte-maxlen-char-distance
      levenshtein quirks), first hit in pinned entity order,
    - proximity = min word-distance between word-CONTAINS-name positions
      (multi-word names therefore rarely hit — the faithful quirk falls
      out naturally: a word never contains a space),
    - the 25 friendship / 19 negative pattern weights with the ±100-char
      first-occurrence context bonus, the family ×0.8 damper, [0,1]
      clamp, chunk-count normalization, threshold 0.3, top-10 by
      (confidence desc, target asc).

    f64 note: Python adds pattern terms in list order; the SQL SUMs are
    unordered — both sides emit round(norm, 8) (the pagerank device), so
    last-bit regrouping differences are absorbed."""
    c = _staged_sql("tool_infer")
    e = _staged_sql("tool_infer", "entities")
    ch = _staged_sql("tool_infer", "chunks")
    m = _staged_sql("tool_infer", "members")
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    from graphrag_rs_ray.functions.toolcalls import (FAMILY_PATTERNS,
                                                     FRIENDSHIP_PATTERNS,
                                                     NEGATIVE_PATTERNS)
    pats = ", ".join(
        [f"({i}, 'f', '{p}', {w!r})"
         for i, (p, w) in enumerate(FRIENDSHIP_PATTERNS)] +
        [f"({i + 100}, 'n', '{p}', {w!r})"
         for i, (p, w) in enumerate(NEGATIVE_PATTERNS)])
    fam = " OR ".join(f"strpos(cl, '{p}') > 0" for p in FAMILY_PATTERNS)
    splitw = ("list_filter(regexp_split_to_array({x}, '\\s+'), "
              "y -> y <> '')")
    fuzzy = f"""(
        CASE WHEN len({splitw.format(x='lower(c.entity_name)')}) = 1
                  AND len({splitw.format(x='lower(e.name)')}) > 0
             THEN starts_with({splitw.format(x='lower(e.name)')}[1],
                              {splitw.format(x='lower(c.entity_name)')}[1])
               OR starts_with({splitw.format(x='lower(c.entity_name)')}[1],
                              {splitw.format(x='lower(e.name)')}[1])
             WHEN len({splitw.format(x='lower(e.name)')}) > 0
                  AND len({splitw.format(x='lower(c.entity_name)')}) > 0
                  AND {splitw.format(x='lower(e.name)')}[
                        len({splitw.format(x='lower(e.name)')})]
                    = {splitw.format(x='lower(c.entity_name)')}[
                        len({splitw.format(x='lower(c.entity_name)')})]
             THEN TRUE
             ELSE levenshtein(lower(e.name), lower(c.entity_name))
                  <= greatest(least(strlen(lower(c.entity_name)),
                                    strlen(lower(e.name))) // 4, 1)
        END)"""
    return f"""
        WITH calls AS (SELECT * FROM {c}),
        ents AS (SELECT * FROM {e}),
        chunksrc AS (SELECT chunk_idx, lower(text) AS cl FROM {ch}),
        mem AS (SELECT * FROM {m}),
        res0 AS (
          SELECT c.call_id, c.entity_name, c.relation_type,
            (SELECT min(ord) FROM ents e
              WHERE trim(lower(e.name), {ws})
                    = trim(lower(c.entity_name), {ws})) AS ex,
            (SELECT min(ord) FROM ents e
              WHERE contains(lower(e.name),
                             trim(lower(c.entity_name), {ws}))
                 OR contains(trim(lower(c.entity_name), {ws}),
                             lower(e.name))) AS co,
            (SELECT min(ord) FROM ents e WHERE {fuzzy}) AS fz
          FROM calls c),
        resolved AS (
          SELECT r.call_id, r.relation_type, e.entity_id AS target_id
          FROM res0 r JOIN ents e ON e.ord = COALESCE(r.ex, r.co, r.fz)),
        tc AS (
          SELECT r.call_id, r.target_id, m2.chunk_idx
          FROM resolved r
          JOIN (SELECT DISTINCT chunk_idx, entity_id FROM mem) m2
            ON m2.entity_id = r.target_id),
        tcn AS (SELECT call_id, count(*)::BIGINT AS n_tc
                FROM tc GROUP BY call_id),
        pairs AS (
          SELECT t.call_id, t.target_id, t.chunk_idx,
                 m.entity_id AS other,
                 row_number() OVER () AS prid
          FROM tc t JOIN mem m ON m.chunk_idx = t.chunk_idx
          WHERE m.entity_id <> t.target_id),
        idn AS (
          SELECT DISTINCT entity_id,
                 CASE WHEN strpos(entity_id, '_') > 0
                      THEN lower(replace(
                             substr(entity_id, strpos(entity_id, '_') + 1),
                             '_', ' '))
                      ELSE lower(entity_id) END AS nm
          FROM (SELECT entity_id FROM mem
                UNION SELECT target_id FROM resolved) u),
        cn AS (
          SELECT DISTINCT m.chunk_idx, i.nm
          FROM mem m JOIN idn i USING (entity_id)),
        wp AS (
          SELECT chunk_idx, unnest(range(0, len(wl))) AS widx,
                 unnest(wl) AS w
          FROM (SELECT chunk_idx,
                       {splitw.format(x='cl')} AS wl
                FROM chunksrc) z),
        np AS MATERIALIZED (
          SELECT c2.chunk_idx, c2.nm, p.widx
          FROM cn c2 JOIN wp p
            ON p.chunk_idx = c2.chunk_idx AND contains(p.w, c2.nm)),
        prox AS (
          SELECT pr.prid, min(abs(a.widx - b.widx)) AS d
          FROM pairs pr
          JOIN idn ia ON ia.entity_id = pr.target_id
          JOIN idn ib ON ib.entity_id = pr.other
          LEFT JOIN np a ON a.chunk_idx = pr.chunk_idx AND a.nm = ia.nm
          LEFT JOIN np b ON b.chunk_idx = pr.chunk_idx AND b.nm = ib.nm
          GROUP BY pr.prid),
        pp AS MATERIALIZED (
          SELECT c2.chunk_idx, p.pid, p.kind, p.weight,
                 substr(c2.cl,
                        greatest(strpos(c2.cl, p.pattern) - 1 - 100, 0) + 1,
                        least(strpos(c2.cl, p.pattern) - 1
                              + length(p.pattern) + 100, length(c2.cl))
                        - greatest(strpos(c2.cl, p.pattern) - 1 - 100, 0))
                   AS ctx
          FROM chunksrc c2
          JOIN (VALUES {pats}) p(pid, kind, pattern, weight)
            ON strpos(c2.cl, p.pattern) > 0),
        near AS MATERIALIZED (
          SELECT pp.chunk_idx, pp.pid, c2.nm
          FROM pp JOIN cn c2 USING (chunk_idx)
          WHERE contains(pp.ctx, c2.nm)),
        famc AS (SELECT chunk_idx FROM chunksrc WHERE {fam}),
        pc AS (
          SELECT pr.prid,
                 SUM(CASE WHEN pp.kind = 'f'
                          THEN pp.weight *
                               (CASE WHEN na.nm IS NOT NULL
                                      AND nb.nm IS NOT NULL
                                     THEN 0.5 ELSE 0.3 END)
                          ELSE pp.weight *
                               (CASE WHEN na.nm IS NOT NULL
                                      AND nb.nm IS NOT NULL
                                     THEN 1.2 ELSE 0.8 END)
                     END) AS psum
          FROM pairs pr
          JOIN pp ON pp.chunk_idx = pr.chunk_idx
          JOIN idn ia ON ia.entity_id = pr.target_id
          JOIN idn ib ON ib.entity_id = pr.other
          LEFT JOIN near na ON na.chunk_idx = pr.chunk_idx
                           AND na.pid = pp.pid AND na.nm = ia.nm
          LEFT JOIN near nb ON nb.chunk_idx = pr.chunk_idx
                           AND nb.pid = pp.pid AND nb.nm = ib.nm
          GROUP BY pr.prid),
        ev AS (
          SELECT pr.call_id, pr.other,
                 least(greatest(
                   CASE WHEN f.chunk_idx IS NOT NULL
                        THEN ((0.2 +
                          CASE WHEN px.d IS NULL THEN 0.0
                               WHEN px.d <= 2 THEN 0.4
                               WHEN px.d <= 5 THEN 0.3
                               WHEN px.d <= 10 THEN 0.2
                               WHEN px.d <= 20 THEN 0.1
                               ELSE 0.05 END)
                          + COALESCE(pc.psum, 0.0)) * 0.8
                        ELSE (0.2 +
                          CASE WHEN px.d IS NULL THEN 0.0
                               WHEN px.d <= 2 THEN 0.4
                               WHEN px.d <= 5 THEN 0.3
                               WHEN px.d <= 10 THEN 0.2
                               WHEN px.d <= 20 THEN 0.1
                               ELSE 0.05 END)
                          + COALESCE(pc.psum, 0.0)
                   END, 0.0), 1.0) AS score
          FROM pairs pr
          LEFT JOIN prox px ON px.prid = pr.prid
          LEFT JOIN pc ON pc.prid = pr.prid
          LEFT JOIN famc f ON f.chunk_idx = pr.chunk_idx),
        agg AS (
          SELECT e2.call_id, e2.other, SUM(e2.score) AS s
          FROM ev e2 GROUP BY e2.call_id, e2.other),
        normed AS (
          SELECT a.call_id, a.other,
                 round(least(a.s / t.n_tc, 1.0), 8) AS confidence,
                 t.n_tc,
                 least(a.s / t.n_tc, 1.0) AS raw_norm
          FROM agg a JOIN tcn t USING (call_id)),
        ranked AS (
          SELECT call_id, other, confidence, n_tc,
                 row_number() OVER (PARTITION BY call_id
                                    ORDER BY confidence DESC, other ASC)
                   AS rank
          FROM normed WHERE raw_norm >= 0.3)
        SELECT r.call_id, r.rank::BIGINT AS rank, r.other AS target,
               en.name AS target_name, r.confidence,
               r.n_tc AS evidence_count, '' AS error
        FROM ranked r JOIN ents en ON en.entity_id = r.other
        WHERE r.rank <= 10
        UNION ALL
        SELECT call_id, -1::BIGINT, '', '', 0.0,
               0::BIGINT, 'Entity ''' || entity_name || ''' not found'
        FROM res0 WHERE COALESCE(ex, co, fz) IS NULL"""


def _kg_mentions_sql() -> str:
    """Generated-SQL replay of the ENTIRE default-path pattern extractor
    (``functions/entities.py`` port of ``entity/mod.rs:97-788``) over
    staged sanitized chunks:

    - word table with clean/cap/likely-person/title/non-person flags,
    - phase 1 known-name gazetteer: left-to-right greedy pair tiling as a
      recursive CTE carrying the consumed flag,
    - phase 2 title-based (2-or-3-word spans): recursive CTE carrying the
      two pending-consumption flags (d0, d1),
    - phase 3 two-word Cap-Cap pairs over the phases-1+2 processed set,
    - phase 4 single-word is conf 0.6 < min_confidence 0.7 at the default
      config — provably filtered, so omitted (documented),
    - organization suffix/prefix scans (first-occurrence, rfind-space
      word start → the bare-suffix-token quirk; prefix-to-dot slice) with
      the confidence formula in exact f64 op shapes,
    - location gazetteer contains-scan (confs computed at generation time
      by the ACTUAL Python ``calculate_confidence`` — parity by
      construction),
    - (name, type) dedup with max-conf merge, mention_count =
      n_emissions × non-overlapping occurrence count
      ((len - len(replace))//len — replace() is the same left-to-right
      scan as ``find_mentions``), and the post-dedup min-confidence gate.
    """
    from graphrag_rs_ray.functions import entities as E
    s = _staged_sql("kg_mentions")
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"

    def inlist(vals) -> str:
        return "(" + ", ".join("'" + v.replace("'", "''") + "'"
                               for v in sorted(vals)) + ")"

    ends = " OR ".join(f"cl LIKE '%{e}'" for e in E.NAME_ENDINGS)
    pres = " OR ".join("cl LIKE '" + p.replace("'", "''") + "%'"
                       for p in E.NAME_PREFIXES)
    likely = f"""(length(clean) >= 2
        AND NOT (length(clean) <= 2 AND cl IN {inlist(E.SHORT_NON_NAMES)})
        AND regexp_matches(clean, '^[A-Z][A-Za-z'']*$')
        AND (length(clean) >= 3 OR {ends} OR {pres}))"""
    kp_vals = ", ".join(
        f"('{n.split()[0].lower()}', '{n.split()[1].lower()}', '{n}')"
        for n in E.KNOWN_PERSON_NAMES)

    # org confidence formula — same sequential f64 op shape as
    # calculate_confidence (base 0.5, +0.3 Inc/Corp/LLC, +0.2
    # University/Institute, +0.1 capitalized, min 1.0)
    org_conf = """least((((0.5
        + CASE WHEN name LIKE '%Inc%' OR name LIKE '%Corp%'
                 OR name LIKE '%LLC%' THEN 0.3 ELSE 0.0 END)
        + CASE WHEN name LIKE '%University%' OR name LIKE '%Institute%'
               THEN 0.2 ELSE 0.0 END)
        + CASE WHEN regexp_matches(name, '^[A-Z]') THEN 0.1 ELSE 0.0 END),
        1.0)"""
    org_likely = "(" + " OR ".join(f"name LIKE '%{ind}%'"
                                   for ind in E.ORG_INDICATORS) + ")"

    # per-suffix first-occurrence scan; start = rfind(' ') + 1
    suf_sql = "\nUNION ALL\n".join(f"""
        SELECT chunk_id, name FROM (
          SELECT chunk_id,
                 trim(substr(text, pos0 - t + 1, t + {len(suf)}), {ws}) AS name
          FROM (
            SELECT chunk_id, text, strpos(text, '{suf}') - 1 AS pos0,
                   length(regexp_extract(
                     substr(text, 1, strpos(text, '{suf}') - 1),
                     '[^ ]*$')) AS t
            FROM CHS WHERE strpos(text, '{suf}') > 0) z1) z2
        WHERE name <> ''""" for suf in E.ORG_SUFFIXES)

    pre_sql = "\nUNION ALL\n".join(f"""
        SELECT chunk_id, name FROM (
          SELECT chunk_id,
                 trim(substr(text, pos0 + 1,
                   CASE WHEN dotrel > 0 THEN pos0 + dotrel - 1
                        ELSE least(length(text), pos0 + 50) END - pos0),
                   {ws}) AS name
          FROM (
            SELECT chunk_id, text, strpos(text, '{pre}') - 1 AS pos0,
                   strpos(substr(text, strpos(text, '{pre}')), '.') AS dotrel
            FROM CHS WHERE strpos(text, '{pre}') > 0) z1) z2
        WHERE name <> '' AND length(name) > {len(pre)}"""
        for pre in E.ORG_PREFIXES)

    loc_sql = "\nUNION ALL\n".join(
        f"""SELECT chunk_id, '{loc}' AS name,
                   {E.calculate_confidence(loc, 'LOCATION')!r} AS conf
            FROM CHS WHERE strpos(text, '{loc}') > 0"""
        for loc in E.KNOWN_LOCATIONS)

    # shared flag joins for the phase-2 / phase-3 step+emission selects
    p2_can = """(NOT (pa.i IS NOT NULL OR r.d0)) AND cw.title
        AND nw.i IS NOT NULL AND NOT (pb.i IS NOT NULL OR r.d1)
        AND COALESCE(nw.cap, FALSE) AND COALESCE(nw.likely, FALSE)"""
    p2_third = """(tw.i IS NOT NULL AND pc2.i IS NULL
        AND COALESCE(tw.cap, FALSE) AND COALESCE(tw.likely, FALSE))"""
    p2_body = f"""
        SELECT r.chunk_id, r.i, r.d0, r.d1,
               ({p2_can}) AND {p2_third} AS tk3,
               ({p2_can}) AND NOT {p2_third} AS tk2,
               nw.clean AS nclean, tw.clean AS tclean
        FROM R2 r
        JOIN CH c ON c.chunk_id = r.chunk_id
        JOIN W cw ON cw.chunk_id = r.chunk_id AND cw.i = r.i
        LEFT JOIN W nw ON nw.chunk_id = r.chunk_id AND nw.i = r.i + 1
        LEFT JOIN W tw ON tw.chunk_id = r.chunk_id AND tw.i = r.i + 2
        LEFT JOIN P1 pa ON pa.chunk_id = r.chunk_id AND pa.i = r.i
        LEFT JOIN P1 pb ON pb.chunk_id = r.chunk_id AND pb.i = r.i + 1
        LEFT JOIN P1 pc2 ON pc2.chunk_id = r.chunk_id AND pc2.i = r.i + 2"""

    p3_cand = """(nw.i IS NOT NULL AND pxa.i IS NULL AND pxb.i IS NULL
        AND cw.cap AND COALESCE(nw.cap, FALSE)
        AND cw.likely AND COALESCE(nw.likely, FALSE)
        AND NOT cw.np AND NOT COALESCE(nw.np, TRUE))"""
    p3_body = f"""
        SELECT r.chunk_id, r.i, r.consumed,
               {p3_cand} AND NOT r.consumed AS tk,
               cw.clean AS aclean, nw.clean AS bclean
        FROM R3 r
        JOIN CH c ON c.chunk_id = r.chunk_id
        JOIN W cw ON cw.chunk_id = r.chunk_id AND cw.i = r.i
        LEFT JOIN W nw ON nw.chunk_id = r.chunk_id AND nw.i = r.i + 1
        LEFT JOIN PX pxa ON pxa.chunk_id = r.chunk_id AND pxa.i = r.i
        LEFT JOIN PX pxb ON pxb.chunk_id = r.chunk_id AND pxb.i = r.i + 1"""

    return f"""
        WITH RECURSIVE CHS AS MATERIALIZED (
          SELECT chunk_id, doc_id, text FROM {s}),
        WL AS (
          SELECT chunk_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS wl
          FROM CHS),
        W AS MATERIALIZED (
          SELECT chunk_id, i, w, clean, lower(clean) AS cl,
                 regexp_matches(w, '^[A-Z]') AS cap,
                 {likely.replace('cl ', 'lower(clean) ')} AS likely,
                 lower(clean) IN {inlist(E.PERSON_TITLES)} AS title,
                 lower(clean) IN {inlist(E.NON_PERSON_WORDS)} AS np
          FROM (
            SELECT chunk_id, i, w,
                   rtrim(regexp_replace(w, '[^A-Za-z'']', '', 'g'),
                         chr(39)) AS clean
            FROM (SELECT chunk_id, unnest(range(0, len(wl))) AS i,
                         unnest(wl) AS w
                  FROM WL WHERE len(wl) > 0) z0) z),
        CH AS MATERIALIZED (
          SELECT chunk_id, len(wl)::BIGINT AS n FROM WL WHERE len(wl) > 0),
        KN AS MATERIALIZED (
          SELECT a.chunk_id, a.i, kp.nm
          FROM W a JOIN W b ON b.chunk_id = a.chunk_id AND b.i = a.i + 1
          JOIN (VALUES {kp_vals}) kp(f, sx, nm)
            ON a.cl = kp.f AND b.cl = kp.sx),
        R1 AS (
          SELECT chunk_id, 0::BIGINT AS i, FALSE AS consumed FROM CH
          UNION ALL
          SELECT r.chunk_id, r.i + 1,
                 (kn.i IS NOT NULL AND NOT r.consumed) AS consumed
          FROM R1 r
          JOIN CH c ON c.chunk_id = r.chunk_id
          LEFT JOIN KN kn ON kn.chunk_id = r.chunk_id AND kn.i = r.i
          WHERE r.i + 1 < c.n),
        T1 AS (
          SELECT r.chunk_id, r.i, kn.nm
          FROM R1 r JOIN KN kn
            ON kn.chunk_id = r.chunk_id AND kn.i = r.i
          WHERE NOT r.consumed),
        P1 AS MATERIALIZED (
          SELECT chunk_id, i FROM T1
          UNION ALL SELECT chunk_id, i + 1 FROM T1),
        R2 AS (
          SELECT chunk_id, 0::BIGINT AS i, FALSE AS d0, FALSE AS d1 FROM CH
          UNION ALL
          SELECT z.chunk_id, z.i + 1, (z.d1 OR z.tk2 OR z.tk3), z.tk3
          FROM ({p2_body}
                WHERE r.i + 1 < c.n) z),
        E2S AS MATERIALIZED (
          SELECT * FROM ({p2_body}) z WHERE z.tk2 OR z.tk3),
        P2 AS MATERIALIZED (
          SELECT chunk_id, i FROM E2S
          UNION ALL SELECT chunk_id, i + 1 FROM E2S
          UNION ALL SELECT chunk_id, i + 2 FROM E2S WHERE tk3),
        PX AS MATERIALIZED (
          SELECT chunk_id, i FROM P1 UNION ALL SELECT chunk_id, i FROM P2),
        R3 AS (
          SELECT chunk_id, 0::BIGINT AS i, FALSE AS consumed FROM CH
          UNION ALL
          SELECT z.chunk_id, z.i + 1, z.tk
          FROM ({p3_body}
                WHERE r.i + 1 < c.n) z),
        E3S AS MATERIALIZED (
          SELECT * FROM ({p3_body}) z WHERE z.tk),
        EM AS (
          SELECT chunk_id, nm AS name, 'PERSON' AS type, {0.95!r} AS conf
          FROM T1
          UNION ALL
          SELECT chunk_id,
                 CASE WHEN tk3 THEN nclean || ' ' || tclean
                      ELSE nclean END AS name,
                 'PERSON', {0.9!r} FROM E2S
          UNION ALL
          SELECT chunk_id, aclean || ' ' || bclean, 'PERSON', {0.8!r}
          FROM E3S
          UNION ALL
          SELECT chunk_id, name, 'ORGANIZATION', {org_conf}
          FROM (SELECT chunk_id, name FROM ({suf_sql}) so
                WHERE {org_likely}
                UNION ALL
                SELECT chunk_id, name FROM ({pre_sql}) po) orgs
          WHERE {org_conf} >= 0.7
          UNION ALL
          SELECT chunk_id, name, 'LOCATION', conf
          FROM ({loc_sql}) locs WHERE conf >= 0.7),
        DD AS (
          SELECT chunk_id, name, type, max(conf) AS conf,
                 count(*)::BIGINT AS n_emit
          FROM EM GROUP BY chunk_id, name, type)
        SELECT d.chunk_id, c.doc_id,
               d.type || '_' ||
                 regexp_replace(lower(d.name), '[^a-z0-9_]', '', 'g')
                 AS entity_id,
               d.name, d.type, d.conf::FLOAT4 AS conf,
               (d.n_emit * ((length(c.text)
                             - length(replace(c.text, d.name, '')))
                            // length(d.name)))::BIGINT AS mention_count
        FROM DD d JOIN CHS c USING (chunk_id)
        WHERE d.conf >= 0.7"""


def _enriched_chunks_sql() -> str:
    """Oracle for ``q_enriched_chunks``: section lookup = the
    last-containing-offset rule (max sec_idx) + recursive parent walk to
    the heading path; keywords = the empty-DF TF-IDF degenerate case
    (all scores 0 → lexicographic top-5); summary = the full
    ``_summarizer_sql`` replay gated at 150 chars; position = start /
    doc_len re-cast to FLOAT4 with the same double-rounding."""
    from graphrag_rs_ray.functions.keywords import TFIDF_STOPWORDS
    stop = "[" + ", ".join(f"'{w}'" for w in sorted(TFIDF_STOPWORDS)) + "]"
    s = _staged_sql("enriched_chunks")
    sec = _staged_sql("enriched_chunks", "sections")
    dl = _staged_sql("enriched_chunks", "doclens")
    return f"""
            WITH RECURSIVE chunks AS MATERIALIZED (
              SELECT chunk_id, doc_id, text, start, "end" FROM {s}),
            secs AS MATERIALIZED (SELECT * FROM {sec}),
            nodes AS MATERIALIZED (
              SELECT chunk_id, text AS content FROM chunks
              WHERE length(text) > 150),
            {_summarizer_sql(['chunk_id'], 150)},
            found AS (
              SELECT c.chunk_id, c.doc_id, max(se.sec_idx) AS sec_idx
              FROM chunks c JOIN secs se
                ON se.doc_id = c.doc_id
               AND se.start_offset <= c.start AND c.start < se.content_end
              GROUP BY c.chunk_id, c.doc_id),
            walk AS (
              SELECT f.chunk_id, f.doc_id, se.parent AS cur,
                     [se.heading_text] AS path
              FROM found f JOIN secs se
                ON se.doc_id = f.doc_id AND se.sec_idx = f.sec_idx
              UNION ALL
              SELECT w.chunk_id, w.doc_id, se.parent,
                     list_append(w.path, se.heading_text)
              FROM walk w JOIN secs se
                ON se.doc_id = w.doc_id AND se.sec_idx = w.cur
              WHERE w.cur >= 0),
            wfin AS (
              SELECT chunk_id, list_reverse(max_by(path, len(path))) AS rpath
              FROM walk GROUP BY chunk_id),
            kw AS (
              SELECT chunk_id,
                     list_sort(list_distinct(list_filter(
                       list_transform(regexp_split_to_array(text, '\\s+'),
                         w -> lower(regexp_replace(w, '[^A-Za-z0-9_-]', '', 'g'))),
                       w -> w <> '' AND length(w) > 2
                            AND NOT list_contains({stop}, w)
                            AND NOT regexp_matches(w, '^[0-9]+$')))) AS kws
              FROM chunks)
            SELECT c.chunk_id, c.doc_id, c.text, c.start, c."end",
                   w.rpath[1] AS chapter,
                   CASE WHEN len(w.rpath) > 1 THEN w.rpath[2] END AS section,
                   CASE WHEN len(w.rpath) > 2 THEN w.rpath[3] END AS subsection,
                   array_to_string(k.kws[1:5], ',') AS keywords_csv,
                   CASE WHEN length(c.text) > 150 THEN s2.summary END AS summary,
                   (c.start::DOUBLE / d.doc_len::DOUBLE)::FLOAT4
                     AS position_in_document,
                   COALESCE(sv.level, -1)::INTEGER AS structural_level
            FROM chunks c
            JOIN kw k USING (chunk_id)
            JOIN {dl} d ON d.doc_id = c.doc_id
            LEFT JOIN found f ON f.chunk_id = c.chunk_id
            LEFT JOIN secs sv ON sv.doc_id = c.doc_id AND sv.sec_idx = f.sec_idx
            LEFT JOIN wfin w ON w.chunk_id = c.chunk_id
            LEFT JOIN summ s2 ON s2.chunk_id = c.chunk_id"""


def _doc_tree_summaries_sql() -> str:
    """Tree STRUCTURE re-derived arithmetically (same device as the
    ``doc_tree`` oracle), node content re-assembled as the ordered
    ``\\n\\n``-join of the node's leaf chunk texts (inner content is the
    flat join by construction — ``pipelines/doctree.py`` joins child
    contents, which flattens), then every node summary replayed via
    ``_summarizer_sql`` (max_summary_length 200)."""
    s = _staged_sql("doc_tree_summaries")
    return f"""
            WITH RECURSIVE leaves AS (
              SELECT doc_id, chunk_id,
                     regexp_extract(chunk_id, '_(\\d+)$', 1)::BIGINT AS pos,
                     text
              FROM {s}),
            docs AS (SELECT doc_id, count(*) AS n FROM leaves GROUP BY doc_id),
            leaf_rows AS (
              SELECT l.doc_id, 'leaf_' || l.chunk_id AS node_id,
                     0::BIGINT AS level,
                     CASE WHEN d.n > 1
                          THEN 'level_1_' || (l.pos // 5)
                          ELSE NULL END AS parent_id,
                     0::BIGINT AS n_children, 1::BIGINT AS n_leaves,
                     l.text AS content
              FROM leaves l JOIN docs d USING (doc_id)),
            lv AS (SELECT unnest(range(1, 10)) AS L),
            ks AS (SELECT unnest(range(0, greatest(
                     (SELECT max(n)::BIGINT FROM docs), 1))) AS k),
            lk AS (
              SELECT d.doc_id, d.n, l.L, k.k,
                     power(5, l.L)::BIGINT AS p,
                     power(5, l.L - 1)::BIGINT AS pp
              FROM docs d CROSS JOIN lv l CROSS JOIN ks k),
            inner_base AS (
              SELECT doc_id, n, L, k, p, pp FROM lk
              WHERE ((n + pp - 1) // pp) > 1
                AND k < ((n + p - 1) // p)),
            inner_rows AS (
              SELECT b.doc_id, 'level_' || b.L || '_' || b.k AS node_id,
                     b.L::BIGINT AS level,
                     CASE WHEN ((b.n + b.p - 1) // b.p) > 1
                          THEN 'level_' || (b.L + 1) || '_' || (b.k // 5)
                          ELSE NULL END AS parent_id,
                     least(5, ((b.n + b.pp - 1) // b.pp) - 5 * b.k)::BIGINT
                       AS n_children,
                     least(b.p, b.n - b.p * b.k)::BIGINT AS n_leaves,
                     string_agg(l.text, chr(10) || chr(10) ORDER BY l.pos)
                       AS content
              FROM inner_base b JOIN leaves l
                ON l.doc_id = b.doc_id
               AND l.pos >= b.p * b.k AND l.pos < b.p * (b.k + 1)
              GROUP BY b.doc_id, b.n, b.L, b.k, b.p, b.pp),
            nodes AS (
              SELECT doc_id, node_id, level, parent_id, n_children,
                     n_leaves, content
              FROM leaf_rows
              UNION ALL
              SELECT * FROM inner_rows),
            {_summarizer_sql(['doc_id', 'node_id'], 200)}
            SELECT n.doc_id, n.node_id, n.level, n.parent_id,
                   n.n_children, n.n_leaves, s2.summary
            FROM nodes n JOIN summ s2 USING (doc_id, node_id)"""


_NT_PARSE_SQL_BODY = """
            res AS (
              SELECT regexp_extract(line, '^<([^>]*)> <([^>]*)> <([^>]*)> \\.$', 1) AS subj,
                     regexp_extract(line, '^<([^>]*)> <([^>]*)> <([^>]*)> \\.$', 2) AS pred,
                     regexp_extract(line, '^<([^>]*)> <([^>]*)> <([^>]*)> \\.$', 3) AS obj
              FROM raw
              WHERE regexp_matches(line, '^<[^>]*> <[^>]*> <[^>]*> \\.$')),
            lit AS (
              SELECT regexp_extract(line, '^<([^>]*)> <([^>]*)> "([^"]*)"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)? \\.$', 1) AS subj,
                     regexp_extract(line, '^<([^>]*)> <([^>]*)> "([^"]*)"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)? \\.$', 2) AS pred,
                     regexp_extract(line, '^<([^>]*)> <([^>]*)> "([^"]*)"(?:\\^\\^<[^>]*>|@[A-Za-z0-9-]+)? \\.$', 3) AS v
              FROM raw
              WHERE regexp_matches(line, '^<[^>]*> <[^>]*> "[^"]*"(\\^\\^<[^>]*>|@[A-Za-z0-9-]+)? \\.$')),
            lits AS (SELECT subj,
                            coalesce(nullif(regexp_extract(pred, '([^/#]+)$', 1), ''), pred) AS k,
                            v
                     FROM lit),
            typ AS (SELECT subj,
                           min(coalesce(nullif(regexp_extract(obj, '([^/#]+)$', 1), ''), obj)) AS t
                    FROM res
                    WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                    GROUP BY subj),
            lab AS (SELECT subj, min(v) AS name FROM lits WHERE k = 'label' GROUP BY subj),
            att AS (SELECT subj, k, min(v) AS v FROM lits WHERE k <> 'label' GROUP BY subj, k),
            attj AS (SELECT subj,
                            '{' || string_agg('"' || k || '": "' || v || '"', ', ' ORDER BY k) || '}' AS attributes
                     FROM att GROUP BY subj),
            subs AS (SELECT DISTINCT subj FROM
                       (SELECT subj FROM res UNION ALL SELECT subj FROM lit)),
            ents AS (
              SELECT 'e' AS kind, s.subj AS id,
                     coalesce(lab.name,
                              coalesce(nullif(regexp_extract(s.subj, '([^/#]+)$', 1), ''), s.subj)) AS name,
                     coalesce(typ.t, 'Entity') AS entity_type,
                     coalesce(attj.attributes, '{}') AS attributes,
                     '' AS source, '' AS target, '' AS relation_type
              FROM subs s
              LEFT JOIN lab USING (subj) LEFT JOIN typ USING (subj)
              LEFT JOIN attj USING (subj)),
            rels AS (
              SELECT 'r' AS kind, '' AS id, '' AS name, '' AS entity_type,
                     '{}' AS attributes, subj AS source, obj AS target,
                     coalesce(nullif(regexp_extract(pred, '([^/#]+)$', 1), ''), pred) AS relation_type
              FROM res
              WHERE pred <> 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')
            SELECT * FROM ents UNION ALL SELECT * FROM rels
        """


def _winnow_cte(k: int = 12, w: int = 5, base: int = 257) -> str:
    """CTE list re-deriving `functions.dedup.Winnower` fingerprints in SQL
    straight from ``documents.text`` (zero staging): ASCII-filter-then-
    lowercase normalize, degree-(k-1) polynomial gram hash in HUGEINT
    folded mod 2^64 then masked to 63 bits (≡ numpy uint64 wraparound +
    mask), rightmost-window-min selection via equality-joined window
    explosion (never a per-doc range join — that is quadratic in grams)."""
    mod64 = 1 << 64
    pows = [pow(base, k - 1 - j, mod64) for j in range(k)]
    terms = " + ".join(
        f"ascii(substr(s, pos + {j + 1}, 1))::HUGEINT * {p}"
        for j, p in enumerate(pows))
    return f"""
        norm AS (SELECT doc_id,
                        lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS s
                 FROM documents),
        wg AS (SELECT doc_id, unnest(range(0, length(s) - {k} + 1)) AS pos, s
               FROM norm WHERE length(s) >= {k}),
        gh AS (SELECT doc_id, pos,
                      (({terms}) % {mod64} % {1 << 63})::BIGINT AS h
               FROM wg),
        wng AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
        wstarts AS (SELECT gh.doc_id, gh.pos AS s
                    FROM gh JOIN wng USING (doc_id)
                    WHERE gh.pos <= greatest(wng.n - {w}, 0)),
        wjh AS (SELECT st.doc_id, st.s, h2.pos, h2.h
                FROM (SELECT doc_id, s, s + unnest(range(0, {w})) AS pos
                      FROM wstarts) st
                JOIN gh h2 USING (doc_id, pos)),
        wmin AS (SELECT doc_id, s, min(h) AS mh FROM wjh GROUP BY doc_id, s),
        wsel AS (SELECT w1.doc_id, max(w2.pos) AS pos, w1.mh AS fp
                 FROM wmin w1 JOIN wjh w2
                   ON w2.doc_id = w1.doc_id AND w2.s = w1.s AND w2.h = w1.mh
                 GROUP BY w1.doc_id, w1.s, w1.mh),
        winnow_fps AS (SELECT DISTINCT doc_id, pos, fp FROM wsel)"""


_LM_PPL_CTE = r"""
    toks0 AS (
      SELECT doc_id, lang, list_filter(list_transform(
               regexp_split_to_array(trim(text), '\s+'),
               x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
               x -> length(x) > 0) AS l
      FROM documents WHERE length(trim(text)) > 0),
    seq AS (
      SELECT doc_id, lang, l, unnest(range(1, len(l) + 1)) AS pos
      FROM toks0 WHERE len(l) > 0),
    bg AS (
      SELECT doc_id, lang,
             CASE WHEN pos = 1 THEN '<s>' ELSE l[pos - 1] END AS prev,
             l[pos] AS cur
      FROM seq),
    big AS (SELECT prev, cur, count(*)::BIGINT AS cb FROM bg GROUP BY prev, cur),
    ctx AS (SELECT prev, sum(cb)::BIGINT AS cctx FROM big GROUP BY prev),
    voc AS (SELECT count(DISTINCT cur)::BIGINT AS v FROM bg),
    lp AS (
      SELECT bg.doc_id, bg.lang,
             floor(ln((big.cb + 1)::DOUBLE / (ctx.cctx + voc.v)) * 1e6)::BIGINT AS lpq
      FROM bg JOIN big USING (prev, cur) JOIN ctx USING (prev) CROSS JOIN voc),
    fin AS (
      SELECT doc_id, lang, count(*)::BIGINT AS n_tokens,
             (-sum(lpq))::BIGINT AS nll_micro,
             ((-sum(lpq)) * 1000 // count(*))::BIGINT AS avg_nll_nano
      FROM lp GROUP BY doc_id, lang)"""


_GOPHER_SQL = r"""
    WITH w AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> length(x) > 0) AS words,
             regexp_split_to_array(text, '\n') AS lines
      FROM documents),
    toks AS (
      SELECT doc_id,
             regexp_replace(lower(unnest(regexp_split_to_array(trim(text), '\s+'))),
                            '[^\p{L}\p{N}]', '', 'g') AS term
      FROM documents WHERE length(trim(text)) > 0),
    stops AS (
      SELECT doc_id, count(DISTINCT term)::BIGINT AS n_stop
      FROM toks
      WHERE term IN ('the','be','to','of','and','that','have','with')
      GROUP BY doc_id),
    base AS (
      SELECT w.doc_id,
             len(words)::BIGINT AS n_words,
             coalesce(list_sum(list_transform(words, x -> length(x))), 0)::BIGINT
               AS total_word_chars,
             len(list_filter(words, x -> regexp_matches(x, '\p{L}')))::BIGINT
               AS n_alpha_words,
             ((length(text) - length(replace(text, '#', ''))) +
              (length(text) - length(replace(text, '...', ''))) // 3)::BIGINT
               AS n_sym,
             len(lines)::BIGINT AS n_lines,
             len(list_filter(lines, x -> regexp_matches(x, '^[-*•]')))::BIGINT
               AS n_bullet_lines,
             len(list_filter(lines, x -> regexp_matches(x, '(\.\.\.|…)$')))::BIGINT
               AS n_ellipsis_lines,
             coalesce(s.n_stop, 0)::BIGINT AS n_stop_distinct
      FROM w LEFT JOIN stops s ON s.doc_id = w.doc_id)
    SELECT doc_id, n_words, total_word_chars, n_alpha_words, n_sym, n_lines,
           n_bullet_lines, n_ellipsis_lines, n_stop_distinct,
           (n_words BETWEEN {min_words} AND {max_words}
            AND 3 * n_words <= total_word_chars
            AND total_word_chars <= 10 * n_words
            AND 10 * n_sym < n_words
            AND 10 * n_bullet_lines < 9 * n_lines
            AND 10 * n_ellipsis_lines < 3 * n_lines
            AND 10 * n_alpha_words >= 8 * n_words
            AND n_stop_distinct >= 2) AS keep
    FROM base"""


def _gopher_repetition_sql() -> str:
    """Generated oracle for ``gopher_repetition``: the 22 integer counters
    re-derived in SQL (dup-beyond-first semantics, non-empty lines/paras,
    gram char length = length(gram) − (n−1) separators = sum of word
    lengths, top-gram tie rule mc·max_len), keep = the cross-multiplied
    Gopher thresholds — generated from the SAME rule table the Python
    kernel evaluates (`textstats._REP_RULES`), parity by construction."""
    from graphrag_rs_ray.functions.textstats import _REP_RULES
    ctes = [r"""docs AS (SELECT doc_id, text FROM documents),
    w AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                                     x -> length(x) > 0) AS l FROM docs)"""]
    for tag, sep in (("l", r"\n"), ("p", r"\n\n")):
        ctes.append(f"""
    {tag}items AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '{sep}'),
                                        x -> x <> '')) AS it
      FROM docs),
    {tag}grp AS (SELECT doc_id, it, count(*) AS c, length(it) AS le
                 FROM {tag}items GROUP BY doc_id, it),
    {tag}stat AS (
      SELECT doc_id, sum(c)::BIGINT AS n_items,
             sum(c * le)::BIGINT AS item_chars,
             sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)::BIGINT AS dup_items,
             sum(CASE WHEN c > 1 THEN (c - 1) * le ELSE 0 END)::BIGINT
               AS dup_item_chars
      FROM {tag}grp GROUP BY doc_id)""")
    for n in range(2, 11):
        if n <= 4:
            final = f"""
    gm{n} AS (SELECT doc_id, max(c) AS mc FROM gc{n} GROUP BY doc_id),
    gs{n} AS (SELECT gc.doc_id, (gm.mc * max(gc.le))::BIGINT AS v
              FROM gc{n} gc JOIN gm{n} gm
                ON gm.doc_id = gc.doc_id AND gc.c = gm.mc
              GROUP BY gc.doc_id, gm.mc)"""
        else:
            final = f"""
    gs{n} AS (SELECT doc_id,
                     sum(CASE WHEN c > 1 THEN (c - 1) * le ELSE 0 END)::BIGINT AS v
              FROM gc{n} GROUP BY doc_id)"""
        ctes.append(f"""
    g{n} AS (
      SELECT doc_id, array_to_string(l[i:i + {n - 1}], ' ') AS gram
      FROM (SELECT doc_id, l, unnest(range(1, len(l) - {n} + 2)) AS i
            FROM w WHERE len(l) >= {n})),
    gc{n} AS (SELECT doc_id, gram, count(*) AS c,
                     (length(gram) - {n - 1})::BIGINT AS le
              FROM g{n} GROUP BY doc_id, gram),{final}""")
    stat_cols = {
        "n_lines": "lstat.n_items", "dup_lines": "lstat.dup_items",
        "line_chars": "lstat.item_chars",
        "dup_line_chars": "lstat.dup_item_chars",
        "n_paras": "pstat.n_items", "dup_paras": "pstat.dup_items",
        "para_chars": "pstat.item_chars",
        "dup_para_chars": "pstat.dup_item_chars",
        "word_chars":
            "(SELECT coalesce(list_sum(list_transform(w.l, x -> length(x))), 0)"
            " FROM w WHERE w.doc_id = docs.doc_id)",
    }
    for n in range(2, 11):
        key = f"top{n}_chars" if n <= 4 else f"dup{n}_chars"
        stat_cols[key] = f"gs{n}.v"
    sels = [f"coalesce({src}, 0)::BIGINT AS {name}"
            for name, src in stat_cols.items()]
    keep = " AND ".join(
        f"({name} * {den} <= {num} * {denom})"
        for name, denom, num, den in _REP_RULES)
    joins = "\n      ".join(
        f"LEFT JOIN {t} ON {t}.doc_id = docs.doc_id"
        for t in ["lstat", "pstat"] + [f"gs{n}" for n in range(2, 11)])
    return (f"WITH {','.join(ctes)},\n"
            f"    base AS (SELECT docs.doc_id, {', '.join(sels)}\n"
            f"      FROM docs\n      {joins})\n"
            f"    SELECT *, ({keep}) AS keep FROM base")


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    d["bpe_merges"] = _bpe_merges_sql()
    d["bpe_segments"] = _bpe_segments_sql()
    d["bpe_token_stats"] = _bpe_token_stats_sql()
    d["quality_classifier"] = _quality_classifier_sql()
    d["shuffle_shards"] = r"""
        WITH r AS (SELECT doc_id, md5('shuf:' || doc_id::VARCHAR) AS h
                   FROM documents),
        p AS (SELECT doc_id,
                     row_number() OVER (ORDER BY h, doc_id) - 1 AS pos,
                     count(*) OVER () AS total
              FROM r)
        SELECT doc_id, pos::BIGINT AS pos,
               ((pos * 16) // total)::BIGINT AS shard,
               (pos - (((pos * 16) // total) * total + 16 - 1) // 16
                )::BIGINT AS shard_pos
        FROM p"""
    d["web_link_graph"] = ("WITH " + _link_edges_sql("web_link_graph")
                           + "\nSELECT * FROM edges")
    d["domain_link_stats"] = ("WITH " + _link_edges_sql("domain_link_stats")
                              + """
        SELECT src_host, dst_host, count(*)::BIGINT AS n_links
        FROM edges GROUP BY src_host, dst_host""")
    d["host_rank"] = _pagerank_sql(n_iter=8, damping=0.85, round_digits=8,
                                   query="host_rank")
    _hll_regs_cte = r"""
        toks0 AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
                   x -> length(x) > 0) AS l
          FROM documents),
        dt AS (SELECT DISTINCT unnest(l) AS token FROM toks0),
        hr AS (SELECT __BUCKET__::BIGINT AS bucket, __V__::BIGINT AS v
               FROM dt),
        rk AS (SELECT bucket,
                      CASE WHEN v = 0 THEN 41
                           ELSE 41 - length(bin(v)) END AS rank
               FROM hr),
        reg AS (SELECT bucket, max(rank)::BIGINT AS reg
                FROM rk GROUP BY bucket)""".replace(
        "__BUCKET__", _hex2int_sql("md5(token)", 3)).replace(
        "__V__", _hex2int_sql("substr(md5(token), 4, 10)", 10))
    d["hll_registers"] = ("WITH " + _hll_regs_cte
                          + "\n        SELECT bucket, reg FROM reg")
    d["hll_estimate"] = ("WITH " + _hll_regs_cte + r""",
        agg AS (SELECT count(*)::BIGINT AS observed,
                       sum((2::BIGINT) ^ (41 - reg))::BIGINT AS s_obs
                FROM reg),
        fin AS (SELECT observed, 4096 - observed AS v_zero,
                       ((4096 - observed) * (2::BIGINT ^ 41)::BIGINT
                        + s_obs) AS s_scaled
                FROM agg),
        est0 AS (SELECT observed, v_zero,
                        0.7213 / (1 + 1.079 / 4096.0) * 4096.0 * 4096.0
                          * (2::BIGINT ^ 41)::DOUBLE
                          / s_scaled::DOUBLE AS raw
                 FROM fin)
        SELECT 4096::BIGINT AS m, observed AS n_buckets_used, v_zero,
               floor((CASE WHEN raw <= 2.5 * 4096.0 AND v_zero > 0
                      THEN 4096.0 * ln(4096.0 / v_zero::DOUBLE)
                      ELSE raw END) * 10000.0)::BIGINT AS est_x10k
        FROM est0""")
    def _cms_cell(i: int) -> str:
        return ("(" + _hex2int_sql(f"md5('{i}:' || token)", 4)
                + ") % 16384")

    _cms_cte = (r"""
        toks0 AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
                   x -> length(x) > 0) AS l
          FROM documents),
        ti AS (SELECT unnest(l) AS token FROM toks0),
        tc AS MATERIALIZED (SELECT token, count(*)::BIGINT AS n
                            FROM ti GROUP BY token),
        cc AS MATERIALIZED (SELECT token, n, __C0__ AS c0, __C1__ AS c1,
                                   __C2__ AS c2, __C3__ AS c3
                            FROM tc),
        reg AS MATERIALIZED (
          SELECT row, cell, sum(n)::BIGINT AS cnt FROM (
            SELECT 0 AS row, c0 AS cell, n FROM cc
            UNION ALL SELECT 1, c1, n FROM cc
            UNION ALL SELECT 2, c2, n FROM cc
            UNION ALL SELECT 3, c3, n FROM cc)
          GROUP BY row, cell)"""
        .replace("__C0__", _cms_cell(0)).replace("__C1__", _cms_cell(1))
        .replace("__C2__", _cms_cell(2)).replace("__C3__", _cms_cell(3)))
    d["cms_registers"] = ("WITH " + _cms_cte
                          + "\n        SELECT row, cell, cnt FROM reg")
    d["cms_heavy_hitters"] = ("WITH " + _cms_cte + """,
        top AS (SELECT token, n, c0, c1, c2, c3 FROM cc
                ORDER BY n DESC, token ASC LIMIT 20),
        est AS (SELECT t.token, t.n AS n_exact,
                       least(r0.cnt, r1.cnt, r2.cnt, r3.cnt) AS est
                FROM top t
                JOIN reg r0 ON r0.row = 0 AND r0.cell = t.c0
                JOIN reg r1 ON r1.row = 1 AND r1.cell = t.c1
                JOIN reg r2 ON r2.row = 2 AND r2.cell = t.c2
                JOIN reg r3 ON r3.row = 3 AND r3.cell = t.c3)
        SELECT token, n_exact, est,
               (est - n_exact)::BIGINT AS overestimate
        FROM est""")
    def _bloom_bit(i: int, var: str = "token") -> str:
        return ("(" + _hex2int_sql(f"md5('{i}:' || {var})", 5)
                + ") % 262144")

    _bloom_cte = (r"""
        toks0 AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
                   x -> length(x) > 0) AS l
          FROM documents),
        dt AS MATERIALIZED (SELECT DISTINCT unnest(l) AS token
                            FROM toks0),
        bits AS MATERIALIZED (SELECT DISTINCT bit FROM ("""
        + "\n            UNION ALL ".join(
            f"SELECT {_bloom_bit(i)} AS bit FROM dt" for i in range(7))
        + "))")
    d["bloom_bits"] = ("WITH " + _bloom_cte
                       + "\n        SELECT bit FROM bits")
    d["bloom_membership"] = ("WITH " + _bloom_cte + """,
        pr AS (SELECT token FROM dt
               WHERE substr(md5(token), 1, 1) = 'a'),
        probes AS MATERIALIZED (
          SELECT token AS probe, true AS in_corpus FROM pr
          UNION ALL
          SELECT '__absent_' || token, false FROM pr),
        pb AS (SELECT probe, in_corpus, unnest(["""
        + ", ".join(_bloom_bit(i, "probe") for i in range(7))
        + """]) AS bit
               FROM probes)
        SELECT pb.probe, pb.in_corpus,
               (count(bits.bit) = 7) AS hit
        FROM pb LEFT JOIN bits ON bits.bit = pb.bit
        GROUP BY pb.probe, pb.in_corpus""")
    d["corpus_sample"] = ("""
        SELECT doc_id, (__H__ < """
        + str(100_000 * (1 << 32) // 1_000_000)
        + """) AS sampled
        FROM documents""").replace(
        "__H__", _hex2int_sql("md5('sample:' || doc_id::VARCHAR)", 8))
    d["event_retention"] = r"""
        WITH ud AS (SELECT DISTINCT user_id,
                           date_trunc('day', ts) AS day
                    FROM events),
        c AS (SELECT user_id, min(day) AS cohort_day FROM ud
              GROUP BY user_id)
        SELECT c.cohort_day,
               date_diff('day', c.cohort_day, ud.day)::BIGINT
                 AS day_offset,
               count(*)::BIGINT AS n_users
        FROM ud JOIN c ON c.user_id = ud.user_id
        GROUP BY c.cohort_day, day_offset"""
    d["event_funnel"] = r"""
        WITH st AS (SELECT event_type,
                           row_number() OVER (ORDER BY event_type) AS i
                    FROM (SELECT DISTINCT event_type FROM events)),
        r AS (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events),
        t1 AS (SELECT user_id, min(rn) AS r1 FROM r
               WHERE event_type = (SELECT event_type FROM st WHERE i = 1)
               GROUP BY user_id),
        t2 AS (SELECT r.user_id, min(r.rn) AS r2
               FROM r JOIN t1 ON t1.user_id = r.user_id
               WHERE r.event_type = (SELECT event_type FROM st WHERE i = 2)
                 AND r.rn > t1.r1
               GROUP BY r.user_id),
        t3 AS (SELECT r.user_id, min(r.rn) AS r3
               FROM r JOIN t2 ON t2.user_id = r.user_id
               WHERE r.event_type = (SELECT event_type FROM st WHERE i = 3)
                 AND r.rn > t2.r2
               GROUP BY r.user_id)
        SELECT u.user_id,
               (CASE WHEN t3.user_id IS NOT NULL THEN 3
                     WHEN t2.user_id IS NOT NULL THEN 2
                     WHEN t1.user_id IS NOT NULL THEN 1
                     ELSE 0 END)::BIGINT AS reached
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN t1 ON t1.user_id = u.user_id
        LEFT JOIN t2 ON t2.user_id = u.user_id
        LEFT JOIN t3 ON t3.user_id = u.user_id"""
    d["event_props_stats"] = r"""
        WITH e AS (SELECT event_type,
                          TRY_CAST(props->>'k' AS BIGINT) AS v
                   FROM events)
        SELECT event_type,
               count(*)::BIGINT AS n_events,
               count(v)::BIGINT AS n_with_key,
               coalesce(sum(v), -1)::BIGINT AS sum_v,
               coalesce(min(v), -1)::BIGINT AS min_v,
               coalesce(max(v), -1)::BIGINT AS max_v,
               count(DISTINCT v)::BIGINT AS n_distinct_v
        FROM e GROUP BY event_type"""
    d["corpus_diff"] = r"""
        WITH cur AS (SELECT doc_id, md5(text) AS fp FROM documents),
        prev AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 5
                      THEN md5(substr(text, 1, length(text) // 2))
                      ELSE md5(text) END AS fp
          FROM documents WHERE doc_id % 11 <> 3
          UNION ALL
          SELECT 1000000000 + doc_id, md5('gone:' || doc_id::VARCHAR)
          FROM documents WHERE doc_id % 17 = 2)
        SELECT coalesce(c.doc_id, p.doc_id)::BIGINT AS doc_id,
               CASE WHEN p.doc_id IS NULL THEN 'added'
                    WHEN c.doc_id IS NULL THEN 'removed'
                    WHEN c.fp = p.fp THEN 'same'
                    ELSE 'changed' END AS status
        FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id"""
    d["unicode_audit"] = r"""
        SELECT doc_id, length(text)::BIGINT AS n_chars,
               length(regexp_replace(text, '[[:ascii:]]', '', 'g')
                 )::BIGINT AS n_nonascii,
               (nfc_normalize(text) <> text) AS nfc_changed,
               length(nfc_normalize(text))::BIGINT AS n_chars_nfc
        FROM documents"""
    d["length_quantiles"] = r"""
        WITH w AS (SELECT len(list_filter(
                     regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0))::BIGINT AS v
                   FROM documents),
        h AS (SELECT v, count(*)::BIGINT AS c FROM w GROUP BY v),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        nn AS (SELECT count(*)::BIGINT AS n FROM w),
        qs AS (SELECT unnest([500, 900, 990, 999]) AS q_mille)
        SELECT q_mille::BIGINT AS q_mille,
               (SELECT min(v) FROM cum
                WHERE cum >= ((SELECT n FROM nn) * q_mille + 999) // 1000
               )::BIGINT AS value
        FROM qs"""
    d["link_prediction"] = r"""
        WITH tri AS (SELECT subj, obj FROM __TRI__),
        e AS (SELECT DISTINCT a, b FROM (
            SELECT subj AS a, obj AS b FROM tri WHERE subj <> obj
            UNION ALL
            SELECT obj AS a, subj AS b FROM tri WHERE subj <> obj)),
        deg AS (SELECT a AS node, count(*)::BIGINT AS deg
                FROM e GROUP BY a),
        ctr AS (SELECT node,
                       floor(1000000 / ln(deg::DOUBLE))::BIGINT AS term
                FROM deg WHERE deg >= 2 AND deg <= 64),
        w AS (SELECT e1.b AS pa, e2.b AS pb, c.term
              FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
              JOIN ctr c ON c.node = e1.a),
        p AS (SELECT pa, pb, count(*)::BIGINT AS cn,
                     sum(term)::BIGINT AS aa_micro
              FROM w GROUP BY pa, pb),
        q AS (SELECT p.pa, p.pb, p.cn, p.aa_micro,
                     da.deg AS deg_a, db.deg AS deg_b
              FROM p JOIN deg da ON da.node = p.pa
                     JOIN deg db ON db.node = p.pb)
        SELECT pa AS node_a, pb AS node_b, cn,
               (cn * 1000000 // (deg_a + deg_b - cn))::BIGINT
                 AS jaccard_micro,
               aa_micro
        FROM q
        WHERE NOT EXISTS (SELECT 1 FROM e
                          WHERE e.a = q.pa AND e.b = q.pb)""".replace(
        "__TRI__", _staged_sql("link_prediction"))
    d["boilerplate_blocks"] = (r"""
        WITH pages AS (SELECT url, html FROM __PAGES__),
        b0 AS (
          SELECT url, 'p' AS tag,
                 unnest(regexp_extract_all(html,
                   '(?is)<p[^>]*>(.*?)</p>', 1)) AS raw
          FROM pages
          UNION ALL
          SELECT url, 'li',
                 unnest(regexp_extract_all(html,
                   '(?is)<li[^>]*>(.*?)</li>', 1))
          FROM pages
          UNION ALL
          SELECT url, 'h',
                 unnest(regexp_extract_all(html,
                   '(?is)<h[1-6][^>]*>(.*?)</h[1-6]>', 1))
          FROM pages),
        c AS (
          SELECT url, tag,
                 trim(regexp_replace(regexp_replace(raw, '<[^>]+>', '',
                   'g'), '\s+', ' ', 'g')) AS block_text,
                 coalesce(list_sum(list_transform(
                   regexp_extract_all(raw, '(?is)<a\s[^>]*>(.*?)</a>', 1),
                   x -> length(trim(regexp_replace(regexp_replace(x,
                          '<[^>]+>', '', 'g'), '\s+', ' ', 'g'))))),
                   0)::BIGINT AS link_chars
          FROM b0)
        SELECT url, tag, block_text,
               length(block_text)::BIGINT AS text_chars, link_chars,
               (length(block_text) > 0
                AND 1000000 * link_chars < 500000 * length(block_text))
                 AS kept
        FROM c""").replace("__PAGES__", _staged_sql("boilerplate_blocks"))
    d["anchor_text_index"] = ("WITH "
                              + _link_edges_sql("anchor_text_index") + """,
        cnt AS (SELECT dst_url, anchor, count(*)::BIGINT AS c
                FROM edges GROUP BY dst_url, anchor),
        top AS (SELECT dst_url, anchor AS top_anchor,
                       row_number() OVER (PARTITION BY dst_url
                         ORDER BY c DESC, anchor ASC) AS rn
                FROM cnt),
        agg AS (SELECT dst_url, count(*)::BIGINT AS n_inlinks,
                       count(DISTINCT anchor)::BIGINT AS n_distinct_anchors
                FROM edges GROUP BY dst_url)
        SELECT agg.dst_url, agg.n_inlinks, agg.n_distinct_anchors,
               top.top_anchor
        FROM agg JOIN top ON top.dst_url = agg.dst_url AND top.rn = 1""")
    d["mixture_weights"] = r"""
        WITH s AS (
          SELECT source, count(*)::BIGINT AS n_docs,
                 sum(len(list_filter(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> length(x) > 0)))::BIGINT AS n_toks
          FROM documents GROUP BY source),
        w AS (SELECT source, n_docs, n_toks,
                     floor(1e6 * pow(n_toks, 0.3))::BIGINT AS wq
              FROM s)
        SELECT source, n_docs, n_toks, wq,
               (wq * 1000000 // (SELECT sum(wq) FROM w))::BIGINT
                 AS share_micro
        FROM w"""
    d["semdedup"] = """
        WITH RECURSIVE asg AS (
          SELECT vec_id, cluster, csim FROM __ASG__),
        emb AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
        ae AS (SELECT a.vec_id, a.cluster, a.csim, e.v
               FROM asg a JOIN emb e USING (vec_id)),
        pr AS (
          SELECT a.vec_id AS src, b.vec_id AS dst
          FROM ae a JOIN ae b
            ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
          WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
        reach AS (
          SELECT vec_id AS v, vec_id AS lbl FROM asg
          UNION
          SELECT p.dst AS v, r.lbl FROM reach r JOIN pr p ON p.src = r.v),
        grp AS (SELECT v AS vec_id, min(lbl)::BIGINT AS grp
                FROM reach GROUP BY v)
        SELECT a.vec_id, a.cluster, g.grp,
               (row_number() OVER (PARTITION BY g.grp
                                   ORDER BY a.csim, a.vec_id) = 1) AS keep
        FROM asg a JOIN grp g USING (vec_id)""".replace(
        "__ASG__", _staged_sql("semdedup"))
    d["gopher_quality"] = (_GOPHER_SQL.replace("{min_words}", "50")
                           .replace("{max_words}", "100000"))
    d["gopher_repetition"] = _gopher_repetition_sql()
    d["curation_report"] = f"""
        WITH gq AS ({d["gopher_quality"]}),
        gr AS ({_gopher_repetition_sql()})
        SELECT count(*)::BIGINT AS n_docs,
               sum(CASE WHEN gq.keep THEN 1 ELSE 0 END)::BIGINT
                 AS n_quality_pass,
               sum(CASE WHEN gr.keep THEN 1 ELSE 0 END)::BIGINT
                 AS n_repetition_pass,
               sum(CASE WHEN gq.keep AND gr.keep THEN 1 ELSE 0 END)::BIGINT
                 AS n_both_pass,
               sum(gq.n_words)::BIGINT AS total_words,
               sum(CASE WHEN gq.keep AND gr.keep THEN gq.n_words
                        ELSE 0 END)::BIGINT AS kept_words
        FROM gq JOIN gr ON gr.doc_id = gq.doc_id"""
    d["domain_mixture"] = r"""
        WITH base AS (
          SELECT doc_id, source, md5(doc_id::VARCHAR) AS h,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> length(x) > 0))::BIGINT AS n_words
          FROM documents),
        w AS (SELECT doc_id, source, n_words,
                     coalesce(sum(n_words) OVER (
                       PARTITION BY source ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS tok_before
              FROM base)
        SELECT doc_id, source, n_words, (tok_before < 800) AS selected
        FROM w"""
    d["decontaminate"] = r"""
        WITH toks0 AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
                   x -> length(x) > 0) AS l
          FROM documents),
        shd AS (
          SELECT DISTINCT doc_id, array_to_string(l[i:i + 7], ' ') AS s
          FROM (SELECT doc_id, l, unnest(range(1, len(l) - 8 + 2)) AS i
                FROM toks0 WHERE len(l) >= 8)),
        ev AS (SELECT DISTINCT s FROM shd WHERE doc_id % 100 = 7),
        ov AS (SELECT shd.doc_id, count(*)::BIGINT AS n_sh,
                      count(ev.s)::BIGINT AS n_ov
               FROM shd LEFT JOIN ev ON ev.s = shd.s
               GROUP BY shd.doc_id)
        SELECT d.doc_id, (d.doc_id % 100 = 7) AS is_eval,
               coalesce(ov.n_sh, 0)::BIGINT AS n_shingles,
               coalesce(ov.n_ov, 0)::BIGINT AS n_overlap,
               (coalesce(ov.n_ov, 0) >= 1) AS contaminated
        FROM documents d LEFT JOIN ov ON ov.doc_id = d.doc_id"""
    d["lm_perplexity"] = ("WITH " + _LM_PPL_CTE + """
        SELECT doc_id, lang, n_tokens, nll_micro, avg_nll_nano,
               round(exp(avg_nll_nano / 1e9), 6) AS ppl
        FROM fin""")
    d["perplexity_buckets"] = ("WITH " + _LM_PPL_CTE + """,
        hist AS (SELECT lang, avg_nll_nano AS v, count(*)::BIGINT AS c
                 FROM fin GROUP BY lang, avg_nll_nano),
        tot AS (SELECT lang, sum(c)::BIGINT AS n FROM hist GROUP BY lang),
        cum AS (SELECT lang, v,
                       sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum
                FROM hist),
        t1 AS (SELECT cum.lang, min(v) AS cut1 FROM cum JOIN tot USING (lang)
               WHERE cum * 3 >= tot.n GROUP BY cum.lang),
        t2 AS (SELECT cum.lang, min(v) AS cut2 FROM cum JOIN tot USING (lang)
               WHERE cum * 3 >= 2 * tot.n GROUP BY cum.lang)
        SELECT f.doc_id, f.lang, f.avg_nll_nano,
               CASE WHEN f.avg_nll_nano <= t1.cut1 THEN 'head'
                    WHEN f.avg_nll_nano <= t2.cut2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM fin f JOIN t1 USING (lang) JOIN t2 USING (lang)""")
    d["winnow_fingerprints"] = ("WITH " + _winnow_cte() +
                                "\nSELECT doc_id, pos, fp FROM winnow_fps")
    d["corpus_split"] = r"""
        WITH s AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 4)) AS INT)
                   ::BIGINT AS slot
          FROM documents)
        SELECT doc_id, source, slot,
               CASE WHEN slot < 655 THEN 'val'
                    WHEN slot < 1310 THEN 'test'
                    ELSE 'train' END AS split
        FROM s"""
    d["c4_clean"] = r"""
        WITH base AS (SELECT doc_id, text,
                             string_split(text, chr(10)) AS l
                      FROM documents),
        lines AS (SELECT doc_id, i,
                         trim(l[i], ' ' || chr(9) || chr(13)) AS ln
                  FROM (SELECT doc_id, l,
                               unnest(range(1, len(l) + 1)) AS i
                        FROM base)),
        lk AS (SELECT doc_id, i, ln,
                      (regexp_matches(ln, '[.!?"]$')
                       AND NOT contains(lower(ln), 'javascript')
                       AND len(list_filter(
                             regexp_split_to_array(ln, '[ \t\r\v\f]+'),
                             x -> length(x) > 0)) >= 5) AS kl
               FROM lines),
        agg AS (SELECT doc_id, count(*)::BIGINT AS n_lines,
                       sum(CASE WHEN kl THEN 1 ELSE 0 END)::BIGINT
                         AS n_kept_lines,
                       coalesce(string_agg(CASE WHEN kl THEN ln END,
                                           chr(10) ORDER BY i), '')
                         AS cleaned
                FROM lk GROUP BY doc_id)
        SELECT b.doc_id, a.n_lines, a.n_kept_lines,
               (contains(b.text, '{') OR contains(b.text, '}')) AS has_brace,
               contains(lower(b.text), 'lorem ipsum') AS has_lorem,
               (NOT (contains(b.text, '{') OR contains(b.text, '}'))
                AND NOT contains(lower(b.text), 'lorem ipsum')
                AND a.n_kept_lines >= 3) AS keep,
               a.cleaned
        FROM base b JOIN agg a ON a.doc_id = b.doc_id"""
    from graphrag_rs_ray.functions.webclean import (PII_EMAIL, PII_IPV4,
                                                    PII_PHONE)
    d["pii_redact"] = f"""
        WITH s1 AS (SELECT doc_id, text,
               (len(regexp_split_to_array(text, '{PII_EMAIL}')) - 1)::BIGINT
                 AS n_email,
               regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
             FROM documents),
        s2 AS (SELECT doc_id, n_email,
               (len(regexp_split_to_array(t1, '{PII_IPV4}')) - 1)::BIGINT
                 AS n_ip,
               regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
             FROM s1),
        s3 AS (SELECT doc_id, n_email, n_ip,
               (len(regexp_split_to_array(t2, '{PII_PHONE}')) - 1)::BIGINT
                 AS n_phone,
               regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS redacted
             FROM s2)
        SELECT doc_id, n_email, n_ip, n_phone, redacted FROM s3"""
    d["line_dedup"] = r"""
        WITH base AS (SELECT doc_id, string_split(text, chr(10)) AS l
                      FROM documents),
        lines AS (SELECT doc_id, i, l[i] AS ln
                  FROM (SELECT doc_id, l,
                               unnest(range(1, len(l) + 1)) AS i
                        FROM base)),
        tag AS (SELECT doc_id, i, ln,
                       (length(trim(ln, ' ' || chr(9) || chr(13))) = 0)
                         AS blank
                FROM lines),
        firsts AS (SELECT ln, min(doc_id * 1048576 + i) AS mpk
                   FROM tag WHERE NOT blank
                   GROUP BY ln HAVING count(*) > 1),
        k AS (SELECT t.doc_id, t.i, t.ln,
                     (t.blank OR f.ln IS NULL
                      OR f.mpk = t.doc_id * 1048576 + t.i) AS keep
              FROM tag t
              LEFT JOIN firsts f ON f.ln = t.ln AND NOT t.blank)
        SELECT doc_id, count(*)::BIGINT AS n_lines,
               sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
               coalesce(string_agg(CASE WHEN keep THEN ln END,
                                   chr(10) ORDER BY i), '') AS cleaned
        FROM k GROUP BY doc_id"""
    d["vocab_topk"] = r"""
        WITH toks0 AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
                   x -> length(x) > 0) AS l
          FROM documents),
        tok AS (SELECT unnest(l) AS token FROM toks0),
        cnt AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token),
        r AS (SELECT token, n,
                     row_number() OVER (ORDER BY n DESC, token)::BIGINT
                       AS rnk
              FROM cnt)
        SELECT token, n, rnk FROM r WHERE rnk <= 1000"""
    d["sequence_pack"] = r"""
        WITH base AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> length(x) > 0))::BIGINT AS n_tokens
          FROM documents),
        w AS (SELECT doc_id, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS cum_before
              FROM base)
        SELECT doc_id, n_tokens, cum_before,
               (cum_before // 2048)::BIGINT AS start_seq,
               (cum_before % 2048)::BIGINT AS start_off,
               (CASE WHEN n_tokens = 0 THEN cum_before // 2048 - 1
                     ELSE (cum_before + n_tokens - 1) // 2048
                END)::BIGINT AS end_seq
        FROM w"""
    d["dsir_scores"] = r"""
        WITH toks0 AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
                   x -> length(x) > 0) AS l
          FROM documents),
        bg AS (
          SELECT doc_id, (doc_id % 50 = 3) AS is_t,
                 l[pos] AS prev, l[pos + 1] AS cur
          FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS pos
                FROM toks0 WHERE len(l) >= 2)),
        fc AS (SELECT prev, cur, count(*)::BIGINT AS c_raw,
                      sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS c_t
               FROM bg GROUP BY prev, cur),
        tots AS (SELECT count(*)::BIGINT AS n_raw,
                        sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS n_t
                 FROM bg),
        voc AS (SELECT count(*)::BIGINT AS v FROM fc),
        lr AS (SELECT bg.doc_id, bg.is_t,
                      (floor(ln((fc.c_t + 1)::DOUBLE / (tots.n_t + voc.v)) * 1e6)
                       - floor(ln((fc.c_raw + 1)::DOUBLE / (tots.n_raw + voc.v)) * 1e6))::BIGINT
                        AS lrq
               FROM bg JOIN fc USING (prev, cur)
               CROSS JOIN tots CROSS JOIN voc),
        agg AS (SELECT doc_id, bool_or(is_t) AS is_target,
                       count(*)::BIGINT AS n_feats,
                       sum(lrq)::BIGINT AS ratio_micro
                FROM lr GROUP BY doc_id),
        fin AS (SELECT doc_id, is_target, n_feats, ratio_micro,
                       (CASE WHEN ratio_micro >= 0
                             THEN (ratio_micro * 1000) // n_feats
                             ELSE -(((-ratio_micro) * 1000 + n_feats - 1)
                                    // n_feats)
                        END)::BIGINT AS avg_ratio_nano
                FROM agg)
        SELECT doc_id, is_target, n_feats, ratio_micro, avg_ratio_nano,
               (avg_ratio_nano > 0) AS selected
        FROM fin"""
    d["remove_dup_spans"] = ("WITH " + _winnow_cte(k=40, w=10) + """,
        fpm AS (SELECT fp, min(doc_id) AS mdoc FROM winnow_fps GROUP BY fp),
        cuts AS (SELECT DISTINCT w.doc_id, w.pos
                 FROM winnow_fps w JOIN fpm USING (fp)
                 WHERE w.doc_id > fpm.mdoc),
        brks AS (SELECT doc_id, pos,
                        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                             OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 40
                             THEN 1 ELSE 0 END AS brk
                 FROM cuts),
        isl AS (SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS iid
                FROM brks),
        spans AS (SELECT doc_id, iid, min(pos) AS ist, max(pos) + 40 AS ien
                  FROM isl GROUP BY doc_id, iid),
        segs AS (SELECT doc_id, ist, ien,
                        coalesce(lag(ien) OVER (PARTITION BY doc_id ORDER BY ist),
                                 0) AS seg0
                 FROM spans),
        spliced AS (SELECT sg.doc_id,
                           string_agg(substr(n.s, (sg.seg0 + 1)::INT,
                                             (sg.ist - sg.seg0)::INT),
                                      '' ORDER BY sg.ist)
                             || substr(n.s, (max(sg.ien) + 1)::INT) AS cleaned,
                           sum(sg.ien - sg.ist)::BIGINT AS removed
                    FROM segs sg JOIN norm n ON n.doc_id = sg.doc_id
                    GROUP BY sg.doc_id, n.s)
        SELECT n.doc_id, length(n.s)::BIGINT AS norm_len,
               coalesce(sp.removed, 0)::BIGINT AS removed_chars,
               coalesce(sp.cleaned, n.s) AS cleaned_norm
        FROM norm n LEFT JOIN spliced sp ON sp.doc_id = n.doc_id""")
    d["dup_span_profile"] = ("WITH " + _winnow_cte(k=40, w=10) + """,
        wdfp AS (SELECT DISTINCT doc_id, fp FROM winnow_fps),
        wshared AS (SELECT fp FROM wdfp GROUP BY fp HAVING count(*) > 1),
        sp AS (SELECT DISTINCT w.doc_id, w.pos
               FROM winnow_fps w JOIN wshared sh ON sh.fp = w.fp),
        brks AS (SELECT doc_id, pos,
                        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                             OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 40
                             THEN 1 ELSE 0 END AS brk
                 FROM sp),
        isl AS (SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS iid
                FROM brks),
        per_isl AS (SELECT doc_id, iid,
                           (max(pos) - min(pos) + 40)::BIGINT AS clen,
                           count(*)::BIGINT AS npos
                    FROM isl GROUP BY doc_id, iid),
        dd AS (SELECT doc_id, sum(clen)::BIGINT AS dup_chars,
                      sum(npos)::BIGINT AS n_dup_positions
               FROM per_isl GROUP BY doc_id)
        SELECT n.doc_id, length(n.s)::BIGINT AS norm_len,
               coalesce(dd.n_dup_positions, 0)::BIGINT AS n_dup_positions,
               coalesce(dd.dup_chars, 0)::BIGINT AS dup_chars,
               (length(n.s) > 0 AND 5 * coalesce(dd.dup_chars, 0) >= length(n.s))
                 AS heavy_dup
        FROM norm n LEFT JOIN dd ON dd.doc_id = n.doc_id""")
    d["winnow_dup_pairs"] = ("WITH " + _winnow_cte() + """,
        wdf AS (SELECT DISTINCT doc_id, fp FROM winnow_fps),
        wcnt AS (SELECT fp FROM wdf
                 GROUP BY fp HAVING count(*) > 1 AND count(*) <= 16),
        wp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM wdf a
               JOIN wcnt c ON a.fp = c.fp
               JOIN wdf b ON b.fp = a.fp AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, count(*)::BIGINT AS n_shared
        FROM wp GROUP BY doc_a, doc_b HAVING count(*) >= 4""")
    d["bm25_topk"] = ("SELECT * FROM (" + d["bm25_scores"] +
                      ") ORDER BY score DESC, doc_id ASC LIMIT 10")
    d["pagerank"] = _pagerank_sql(n_iter=8, damping=0.85, round_digits=8)
    d["doc_tree_summaries"] = _doc_tree_summaries_sql()
    d["enriched_chunks"] = _enriched_chunks_sql()
    d["kg_chunks"] = _kg_chunks_sql()
    d["kg_mentions"] = _kg_mentions_sql()
    d["tool_infer"] = _tool_infer_sql()
    d["shortest_paths"] = _sssp_sql(n_rounds=64)
    d["rerank_topk"] = _rerank_sql(d["bm25_scores"])
    d["hipporag_retrieval"] = _hipporag_sql(n_iter=8, damping=0.5)
    d["pipeline_validation"] = _validation_sql()
    d["query_intents"] = _intents_sql()
    d["query_decomposition"] = _decomposition_sql()
    d["logic_forms"] = _logic_forms_sql()
    d["query_validation"] = _query_validation_sql()
    d["fuzzy_matches"] = _fuzzy_sql()
    d["query_routing"] = _routing_sql()
    d["query_rewrite"] = _rewrite_sql()
    d["dual_keywords"] = _dual_keywords_sql()
    d["dual_retrieval"] = _dual_retrieval_sql()
    d["tool_graph_search"] = _tool_search_sql()
    d["tool_entity_expand"] = _tool_expand_sql()
    d["tool_entity_context"] = _tool_context_sql()
    d["tool_validation"] = _tool_validation_sql()
    d["response_quality"] = _response_quality_sql()
    d["quality_report"] = _quality_report_sql()
    d["logic_bindings"] = _logic_bindings_sql()
    d["pagerank_retrieval"] = _pagerank_retrieval_sql()
    d["query_plans"] = _query_plans_sql()
    d["hybrid_fusion"] = _hybrid_fusion_sql()
    d["enriched_search"] = _enriched_search_sql()
    d["adaptive_fusion"] = _adaptive_fusion_sql()
    d["semantic_merge_pairs"] = _semantic_merge_pairs_sql()
    d["semantic_merge_groups"] = _semantic_merge_groups_sql()
    d["entity_clusters"] = _entity_clusters_sql()
    d["entity_clusters_grouped"] = _entity_clusters_sql(
        "entity_clusters_grouped")
    d["entity_linking_stats"] = _entity_linking_stats_sql()
    d["string_sim_pairs"] = _string_sim_pairs_sql()
    d["string_links"] = _string_links_sql()
    d["generated_answers"] = _generation_sql()
    d["lazy_chunks"] = _lazy_chunks_sql()
    d["lazy_pipeline_stats"] = _lazy_stats_sql()
    d["agent_plans"] = _agent_plans_sql()
    d["query_analysis"] = _query_analysis_sql()
    d["rograg_responses"] = _rograg_responses_sql()
    d["concept_mentions"] = _concept_mentions_sql()
    d["ner_mentions"] = _ner_mentions_sql()
    d["doc_tree_search"] = _doc_tree_search_sql()
    d["text_statistics"] = _text_statistics_sql()
    d["section_numbers"] = _section_numbers_sql()
    d["doc_collection"] = _doc_collection_sql()
    d["corpus_entities"] = _corpus_entities_sql()
    d["corpus_concepts"] = _corpus_concepts_sql()
    d["corpus_concept_clusters"] = _corpus_concept_clusters_sql()
    d["corpus_kg_entities"] = _corpus_kg_entities_sql()
    d["corpus_kg_relations"] = _corpus_kg_relations_sql()
    d["corpus_stats"] = _corpus_stats_sql()
    d["corpus_search"] = _corpus_search_sql()
    d["doc_structure"] = _doc_structure_sql()
    d["doc_structure_stats"] = _doc_structure_stats_sql()
    d["llm_evaluation"] = _llm_evaluation_sql()
    d["vector_store_topk"] = """
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings ORDER BY vec_id LIMIT 5),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                            e.vec_id ASC) AS rank
          FROM q CROSS JOIN embeddings e)
        SELECT query_id, vec_id, rank::BIGINT AS rank
        FROM scored WHERE rank <= 10
    """
    d["vector_store_stats"] = """
        WITH n AS (SELECT sqrt(list_dot_product(
                     embedding::DOUBLE[], embedding::DOUBLE[])) AS nm,
                   len(embedding) AS dim
                   FROM embeddings)
        SELECT count(*)::BIGINT AS vector_count,
               max(dim)::BIGINT AS dimension,
               true AS index_built,
               round(min(nm), 8) AS min_norm,
               round(max(nm), 8) AS max_norm,
               round(avg(nm), 8) AS avg_norm
        FROM n
    """
    d["ego_network"] = _traversal_sql("ego_network", n_seeds=1, k=2,
                                      mode="ego")
    d["multi_source_bfs"] = _traversal_sql("multi_source_bfs", n_seeds=3,
                                           k=3, mode="msbfs")
    d["query_focused_subgraph"] = _traversal_sql("query_focused_subgraph",
                                                 n_seeds=3, k=2, mode="qfs")
    return d


def _rerank_sql(bm25_sql: str, query: str = "fast hash join",
                n_cand: int = 50, top_k: int = 10) -> str:
    """Cross-encoder rerank oracle (``cross_encoder.rs:104-146``): BM25
    top-``n_cand`` (reusing the oracle-exact bm25_scores SQL), then
    case-sensitive whitespace-token Jaccard × 0.7 + min(len/100, 1) × 0.3
    through 1/(1+exp(-5·(raw-0.5))), rounded to 8 on both sides (libm exp
    may differ in the last ulp between engines)."""
    q_toks = sorted(set(query.split()))
    qset = "[" + ",".join(f"'{t}'" for t in q_toks) + "]"
    return f"""
        WITH bm AS ({bm25_sql}),
        cand AS (SELECT doc_id, score FROM bm
                 ORDER BY score DESC, doc_id ASC LIMIT {n_cand}),
        toks AS (
          SELECT c.doc_id, c.score AS original_score,
                 list_filter(regexp_split_to_array(d.text, '\\s+'),
                             x -> x <> '') AS dtoks
          FROM cand c JOIN documents d USING (doc_id)),
        rel AS (
          SELECT doc_id, original_score,
                 CASE WHEN len(dtoks) = 0 THEN 0.0
                      ELSE round(1.0 / (1.0 + exp(-5.0 * (
                        (len(list_intersect({qset}::VARCHAR[],
                                            list_distinct(dtoks)))::DOUBLE
                         / (len({qset}::VARCHAR[]) + len(list_distinct(dtoks))
                            - len(list_intersect({qset}::VARCHAR[],
                                                 list_distinct(dtoks))))) * 0.7
                        + least(len(dtoks)::DOUBLE / 100.0, 1.0) * 0.3
                        - 0.5))), 8) END AS relevance_score
          FROM toks)
        SELECT row_number() OVER (ORDER BY relevance_score DESC, doc_id ASC)
                 AS rank,
               doc_id, relevance_score, original_score,
               round(relevance_score - original_score, 8) AS score_delta
        FROM rel
        ORDER BY relevance_score DESC, doc_id ASC
        LIMIT {top_k}
    """


def _hipporag_sql(n_iter: int, damping: float,
                  passage_node_weight: float = 0.05,
                  top_k_results: int = 10) -> str:
    """HippoRAG oracle (``hipporag_ppr.rs:142-305``): entity weights
    (fact score / passage frequency, averaged per entity, min-max
    normalized), passage weights (dense × {pnw}, min-max normalized),
    combined mass normalized to 1, reset re-normalized over graph nodes
    (mirroring ``pagerank``'s known-mass normalization), then the fixed
    ``n_iter`` personalized-PageRank recurrence replayed as generated
    join+aggregate CTEs, and the dense-shortlist passages ranked by the
    rounded final score."""
    facts = _staged_sql("hipporag_retrieval", "facts")
    ep = _staged_sql("hipporag_retrieval", "ep")
    ps = _staged_sql("hipporag_retrieval", "ps")
    edges = _staged_sql("hipporag_retrieval", "edges")
    parts = [f"""
        WITH e AS MATERIALIZED (SELECT src, dst FROM {edges}),
        ps AS (SELECT passage, score FROM {ps}),
        pcnt AS (SELECT entity, count(*)::DOUBLE AS np FROM {ep}
                 GROUP BY entity),
        fe AS (SELECT fx.entity, fx.score / p.np AS wgt
               FROM (SELECT subj AS entity, score FROM {facts}
                     UNION ALL SELECT obj AS entity, score FROM {facts}) fx
               JOIN pcnt p USING (entity)),
        ew0 AS (SELECT entity, sum(wgt) / count(*) AS w FROM fe
                GROUP BY entity),
        ewmm AS (SELECT min(w) AS lo, max(w) AS hi FROM ew0),
        ew AS (SELECT entity, CASE WHEN abs(hi - lo) > 1e-10
                                   THEN (w - lo) / (hi - lo) ELSE w END AS w
               FROM ew0, ewmm),
        pw0 AS (SELECT passage AS entity, score * {passage_node_weight} AS w
                FROM ps),
        pwmm AS (SELECT min(w) AS lo, max(w) AS hi FROM pw0),
        pw AS (SELECT entity, CASE WHEN abs(hi - lo) > 1e-10
                                   THEN (w - lo) / (hi - lo) ELSE w END AS w
               FROM pw0, pwmm),
        comb0 AS (SELECT entity, sum(w) AS w FROM
                  (SELECT * FROM ew UNION ALL SELECT * FROM pw)
                  GROUP BY entity),
        comb AS (SELECT entity, w / (SELECT sum(w) FROM comb0) AS w
                 FROM comb0),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        known AS (SELECT sum(c.w) AS mass
                  FROM comb c JOIN nodes n ON c.entity = n.node),
        reset AS MATERIALIZED (
            SELECT n.node, coalesce(c.w, 0.0) / (SELECT mass FROM known) AS r
            FROM nodes n LEFT JOIN comb c ON c.entity = n.node),
        deg AS (SELECT src AS node, count(*)::DOUBLE AS out_deg FROM e
                GROUP BY src),
        s0 AS (SELECT node, r AS score FROM reset)"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
        s{i} AS MATERIALIZED (
          SELECT nd.node, (1.0 - {damping}) * nd.r + coalesce(c.csum, 0.0)
                   AS score
          FROM reset nd LEFT JOIN (
            SELECT e.dst AS node,
                   sum(({damping} * s.score) / greatest(d.out_deg, 1.0))
                     AS csum
            FROM e JOIN s{i - 1} s ON e.src = s.node
                   JOIN deg d ON e.src = d.node
            GROUP BY e.dst) c ON nd.node = c.node)""")
    parts.append(f"""
        SELECT row_number() OVER (ORDER BY score DESC, passage_id ASC)
                 AS rank,
               passage_id, score
        FROM (SELECT s.node AS passage_id, round(s.score, 8) AS score
              FROM s{n_iter} s JOIN ps ON s.node = ps.passage)
        ORDER BY score DESC, passage_id ASC
        LIMIT {top_k_results}""")
    return "\n".join(parts)


def _text_statistics_sql() -> str:
    """TextStats oracle (``analysis.rs:238-280``): whitespace words,
    ``.!?`` character sentences (min 1), \\n\\n paragraphs (min 1),
    char counts, single-division ratios (bit-identical shapes)."""
    return """
        SELECT doc_id,
          len(list_filter(string_split_regex(text, '\\s+'),
              w -> w <> ''))::BIGINT AS word_count,
          greatest(length(text) - length(replace(replace(replace(text,
              '.', ''), '!', ''), '?', '')), 1)::BIGINT
            AS sentence_count,
          greatest(len(list_filter(string_split(text, chr(10) || chr(10)),
              p -> trim(p) <> '')), 1)::BIGINT AS paragraph_count,
          length(text)::BIGINT AS char_count,
          len(list_filter(string_split_regex(text, '\\s+'),
              w -> w <> ''))::DOUBLE
            / greatest(length(text) - length(replace(replace(replace(text,
              '.', ''), '!', ''), '?', '')), 1)::DOUBLE
            AS avg_sentence_length,
          CASE WHEN len(list_filter(string_split_regex(text, '\\s+'),
                    w -> w <> '')) > 0
               THEN length(text)::DOUBLE
                    / len(list_filter(string_split_regex(text, '\\s+'),
                          w -> w <> ''))::DOUBLE
               ELSE 0.0 END AS avg_word_length
        FROM documents
    """


def _roman_val_sql(col: str) -> str:
    """Reversed-subtractive roman evaluation (``analysis.rs:188-213``)
    as a forward rule: a char's value is negated when strictly smaller
    than its right neighbour's."""
    def val(pos: str) -> str:
        return (f"(CASE substr({col}, {pos}, 1) "
                f"WHEN 'I' THEN 1 WHEN 'V' THEN 5 WHEN 'X' THEN 10 "
                f"WHEN 'L' THEN 50 WHEN 'C' THEN 100 WHEN 'D' THEN 500 "
                f"WHEN 'M' THEN 1000 ELSE 0 END)")
    return (f"list_sum(list_transform(range(1, length({col}) + 1), "
            f"i -> CASE WHEN {val('i')} < {val('i + 1')} "
            f"THEN -{val('i')} ELSE {val('i')} END))")


def _section_numbers_sql() -> str:
    """Section-number oracle (``analysis.rs:78-213``): the four regex
    branches replayed in precedence order with the roman evaluation in
    SQL; components re-derived from the raw capture."""
    lines = _staged_sql("section_numbers", "lines")
    rv_ch = _roman_val_sql("ch2")
    rv_ro = _roman_val_sql("ro")
    return f"""
        WITH l AS (SELECT line_id, line FROM {lines}),
        cap AS (SELECT line_id, line,
          regexp_extract(line, '^(\\d+(?:\\.\\d+)*)\\s*[.:]?\\s', 1)
            AS dec,
          regexp_extract(line,
            '(?i)^(chapter|section|part|appendix)\\s+(\\d+|[IVXLCDM]+|[A-Z])\\b',
            1) AS ch1,
          regexp_extract(line,
            '(?i)^(chapter|section|part|appendix)\\s+(\\d+|[IVXLCDM]+|[A-Z])\\b',
            2) AS ch2,
          regexp_extract(line, '^([IVXLCDM]+)[.:]?\\s', 1) AS ro,
          regexp_extract(line, '^([A-Z])[.:]?\\s', 1) AS al
          FROM l)
        SELECT line_id, line,
          CASE WHEN dec <> '' THEN 'decimal'
               WHEN ch2 <> '' THEN 'mixed'
               WHEN ro <> '' THEN 'roman'
               WHEN al <> '' THEN 'alphabetic'
               ELSE 'none' END AS fmt,
          CASE WHEN dec <> '' THEN dec
               WHEN ch2 <> '' THEN ch1 || ' ' || ch2
               WHEN ro <> '' THEN ro
               WHEN al <> '' THEN al
               ELSE '' END AS raw,
          CASE WHEN dec <> '' THEN
                 array_to_string(list_transform(string_split(dec, '.'),
                   x -> x::BIGINT::VARCHAR), ',')
               WHEN ch2 <> '' THEN
                 CASE WHEN regexp_matches(ch2, '^\\d+$')
                        THEN ch2::BIGINT::VARCHAR
                      WHEN regexp_matches(ch2, '^[IVXLCDM]+$')
                        THEN ({rv_ch})::VARCHAR
                      ELSE (ascii(ch2) - ascii('A') + 1)::VARCHAR END
               WHEN ro <> '' THEN ({rv_ro})::VARCHAR
               WHEN al <> '' THEN (ascii(al) - ascii('A') + 1)::VARCHAR
               ELSE '' END AS components
        FROM cap
    """


_ETYPE_SQL = """CASE
    WHEN contains(lower({cn}), 'company') OR contains(lower({cn}), 'corp')
         OR contains(lower({cn}), 'inc') THEN 'organization'
    WHEN substr({cn}, 1, 1) = upper(substr({cn}, 1, 1))
         AND substr({cn}, 1, 1) <> lower(substr({cn}, 1, 1))
         AND NOT contains({cn}, ' ') THEN 'person'
    WHEN contains(lower({cn}), 'city') OR contains(lower({cn}), 'country')
         THEN 'location'
    ELSE 'other' END"""


def _entity_clusters_sql(query: str = "entity_clusters") -> str:
    """Hybrid-linking cluster oracle (``entity_linker.rs:330-473``):
    exact clusters derived INDEPENDENTLY from the flat entities
    (same-name groups > 1), fuzzy clusters from the staged assignments
    with canonical name (count → length → name ties), type heuristics,
    and the hardcoded confidence/doc-frequency/alias quirks.  The same
    SQL serves ``entity_clusters_grouped`` (the distributed twin) via
    its own staged dir."""
    flat = _staged_sql(query, "flat")
    asg = _staged_sql(query, "asg")
    et = _ETYPE_SQL.replace("{cn}", "cn")
    return f"""
        WITH flat AS MATERIALIZED (
          SELECT doc_id, local_entity_id, name FROM {flat}),
        asg AS MATERIALIZED (SELECT * FROM {asg}),
        exact AS (
          SELECT 'exact:' || name AS cluster_id, 'exact' AS kind,
                 name AS cn, count(*)::BIGINT AS n_members,
                 1.0 AS confidence_score,
                 count(*)::BIGINT AS document_frequency,
                 name AS aliases
          FROM flat GROUP BY name HAVING count(*) > 1),
        fz AS (SELECT a.cluster_id, f.name FROM asg a
               JOIN flat f USING (doc_id, local_entity_id)
               WHERE a.kind = 'fuzzy'),
        fcnt AS (SELECT cluster_id, name, count(*) AS cnt FROM fz
                 GROUP BY cluster_id, name),
        fcan AS (SELECT cluster_id, name AS cn FROM (
                   SELECT cluster_id, name, row_number() OVER (
                     PARTITION BY cluster_id
                     ORDER BY cnt DESC, length(name) DESC, name DESC)
                       AS rn
                   FROM fcnt) WHERE rn = 1),
        fuzzy AS (
          SELECT z.cluster_id, 'fuzzy' AS kind, c.cn,
                 count(*)::BIGINT AS n_members, 0.85 AS confidence_score,
                 1::BIGINT AS document_frequency, '' AS aliases
          FROM fz z JOIN fcan c USING (cluster_id)
          GROUP BY z.cluster_id, c.cn)
        SELECT cluster_id, kind, cn AS canonical_name,
               {et} AS entity_type, n_members, confidence_score,
               document_frequency, aliases
        FROM (SELECT * FROM exact UNION ALL SELECT * FROM fuzzy)
    """


def _entity_linking_stats_sql() -> str:
    """LinkingStats oracle (``entity_linker.rs:45-87,476-487``)."""
    flat = _staged_sql("entity_linking_stats", "flat")
    asg = _staged_sql("entity_linking_stats", "asg")
    return f"""
        WITH flat AS (SELECT * FROM {flat}),
        asg AS (SELECT * FROM {asg}),
        nproc AS (SELECT count(*)::BIGINT AS n FROM flat),
        ex AS (SELECT count(*)::BIGINT AS nc,
                      coalesce(sum(cnt - 1), 0)::BIGINT AS em
               FROM (SELECT count(*) AS cnt FROM flat GROUP BY name
                     HAVING count(*) > 1)),
        fu AS (SELECT count(*)::BIGINT AS nc,
                      coalesce(sum(cnt - 1), 0)::BIGINT AS fm
               FROM (SELECT count(*) AS cnt FROM asg
                     WHERE kind = 'fuzzy' GROUP BY cluster_id))
        SELECT (SELECT n FROM nproc) AS entities_processed,
               (SELECT nc FROM ex) + (SELECT nc FROM fu)
                 AS clusters_created,
               (SELECT em FROM ex) AS exact_matches,
               (SELECT fm FROM fu) AS fuzzy_matches,
               0::BIGINT AS semantic_matches, 0::BIGINT AS lmcd_clusters,
               round(((SELECT em FROM ex) + (SELECT fm FROM fu))::DOUBLE
                     / (SELECT n FROM nproc)::DOUBLE, 8)
                 AS linking_accuracy
    """


# ------------------------------------ string-similarity linker SQL --

def _string_sim_stack(pairs_body: str, max_edit: int = 2) -> str:
    """CTE chain replaying ``string_similarity_linker.rs`` similarity
    metrics over a caller-provided ``pairs`` relation (ia, ib, na, nb,
    la, lb).  Requires a preceding ``norm`` CTE and WITH RECURSIVE.
    Ends with ``allsim(ia, ib, lev_sim, jw_sim, jaccard_sim, best)``
    (best unrounded; exact-normalized pairs → 1.0 / NULL components).
    The Jaro matcher (``:262-326``) is replayed positionally: the
    recursive CTE walks s1 carrying a HUGEINT used-position bitmask
    over s2 (names must stay < 126 chars — the staging bounds them),
    matched positions + chars as lists for the transposition count."""
    return f"""
pairs AS ({pairs_body}),
nonexact AS (SELECT * FROM pairs WHERE na <> nb),
rec AS (
  SELECT ia, ib, na, nb, la, lb,
         greatest(greatest(la, lb)//2 - 1, 0) AS md,
         0::BIGINT AS i, 0::HUGEINT AS mask,
         []::BIGINT[] AS js, []::VARCHAR[] AS cs
  FROM nonexact
  UNION ALL
  SELECT ia, ib, na, nb, la, lb, md, i+1,
         CASE WHEN j IS NULL THEN mask
              ELSE mask | (1::HUGEINT << ((j-1)::INT)) END,
         CASE WHEN j IS NULL THEN js ELSE list_append(js, j) END,
         CASE WHEN j IS NULL THEN cs
              ELSE list_append(cs, substr(na, (i+1)::INT, 1)) END
  FROM (SELECT *, list_min(list_filter(
          range(greatest(1, i+1-md), least(lb, i+1+md)+1),
          j -> substr(nb, j::INT, 1) = substr(na, (i+1)::INT, 1)
               AND ((mask >> ((j-1)::INT)) & 1::HUGEINT) = 0::HUGEINT))
          AS j
        FROM rec WHERE i < la) s),
jdone AS (SELECT ia, ib, na, nb, la, lb, len(js) AS m, list_sort(js) AS sj,
                 cs
          FROM rec WHERE i = la),
jaro AS (
  SELECT ia, ib,
    CASE WHEN la = 0 AND lb = 0 THEN 1.0
         WHEN la = 0 OR lb = 0 THEN 0.0
         WHEN m = 0 THEN 0.0
         ELSE (m::DOUBLE/la + m::DOUBLE/lb
               + (m::DOUBLE - t/2.0)/m::DOUBLE)/3.0
    END AS jaro
  FROM (SELECT *, len(list_filter(range(1, m+1),
          k -> cs[k::INT] <> substr(nb, sj[k::INT]::INT, 1)))::DOUBLE AS t
        FROM jdone) x),
comp AS (
  SELECT p.*, j.jaro,
    levenshtein(p.na, p.nb) AS lev,
    greatest(strlen(p.na), strlen(p.nb)) AS maxb,
    CASE WHEN least(p.la,p.lb) >= 1
              AND substr(p.na,1,1) = substr(p.nb,1,1) THEN
      CASE WHEN least(p.la,p.lb) >= 2
                AND substr(p.na,2,1) = substr(p.nb,2,1) THEN
        CASE WHEN least(p.la,p.lb) >= 3
                  AND substr(p.na,3,1) = substr(p.nb,3,1) THEN
          CASE WHEN least(p.la,p.lb) >= 4
                    AND substr(p.na,4,1) = substr(p.nb,4,1)
               THEN 4 ELSE 3 END
        ELSE 2 END
      ELSE 1 END
    ELSE 0 END AS prefix,
    CASE WHEN p.na = '' THEN []::VARCHAR[]
         ELSE list_distinct(string_split(p.na, ' ')) END AS tka,
    CASE WHEN p.nb = '' THEN []::VARCHAR[]
         ELSE list_distinct(string_split(p.nb, ' ')) END AS tkb
  FROM nonexact p JOIN jaro j USING (ia, ib)),
scored AS (
  SELECT ia, ib,
    CASE WHEN lev > {max_edit} THEN 0.0 WHEN maxb = 0 THEN 1.0
         ELSE 1.0 - lev::DOUBLE / maxb END AS lev_sim,
    jaro + prefix * 0.1 * (1.0 - jaro) AS jw_sim,
    CASE WHEN len(tka) = 0 AND len(tkb) = 0 THEN 1.0
         WHEN len(list_distinct(list_concat(tka, tkb))) = 0 THEN 0.0
         ELSE len(list_filter(tka, x -> list_contains(tkb, x)))::DOUBLE
              / len(list_distinct(list_concat(tka, tkb))) END
      AS jaccard_sim
  FROM comp),
allsim AS (
  SELECT ia, ib, lev_sim, jw_sim, jaccard_sim,
         greatest(0.0, lev_sim, jw_sim, jaccard_sim) AS best
  FROM scored
  UNION ALL
  SELECT ia, ib, NULL, NULL, NULL, 1.0 FROM pairs WHERE na = nb)"""


_NORM_SQL = (r"array_to_string(regexp_split_to_array(trim(regexp_replace("
             r"lower(name), '[^a-z0-9\s]', '', 'g')), '\s+'), ' ')")


def _string_sim_pairs_sql() -> str:
    ents = _staged_sql("string_sim_pairs", "ents")
    pairs = """
  SELECT a.entity_id ia, b.entity_id ib, a.n na, b.n nb,
         length(a.n) la, length(b.n) lb
  FROM norm a JOIN norm b
    ON a.type = b.type AND a.entity_id < b.entity_id"""
    return f"""
WITH RECURSIVE
ents AS (SELECT entity_id, name, type FROM {ents}),
norm AS (SELECT entity_id, type, {_NORM_SQL} AS n FROM ents),
{_string_sim_stack(pairs)}
SELECT ia AS entity_a, ib AS entity_b,
       coalesce(round(lev_sim, 12), -1.0) AS lev_sim,
       coalesce(round(jw_sim, 12), -1.0) AS jw_sim,
       coalesce(round(jaccard_sim, 12), -1.0) AS jaccard_sim,
       round(best, 12) AS sim,
       (CASE WHEN best >= 0.85 THEN 1 ELSE 0 END)::BIGINT AS linked
FROM allsim
    """


def _string_links_sql() -> str:
    ents = _staged_sql("string_links", "ents")
    asg = _staged_sql("string_links", "asg")
    pairs = """
  SELECT g.cluster_id ia, g.entity_id ib, a.n na, b.n nb,
         length(a.n) la, length(b.n) lb
  FROM asg g JOIN norm a ON a.entity_id = g.cluster_id
             JOIN norm b ON b.entity_id = g.entity_id
  WHERE g.member_idx >= 1"""
    return f"""
WITH RECURSIVE
ents AS (SELECT * FROM {ents}),
asg AS (SELECT * FROM {asg}),
norm AS (SELECT entity_id, type, {_NORM_SQL} AS n FROM ents),
{_string_sim_stack(pairs)},
canon AS (
  SELECT a.cluster_id, a.entity_id AS canonical_id
  FROM asg a JOIN ents e ON e.entity_id = a.entity_id
  QUALIFY row_number() OVER (PARTITION BY a.cluster_id
            ORDER BY e.conf DESC, a.member_idx DESC) = 1),
verified AS (
  SELECT a.cluster_id, a.entity_id FROM asg a WHERE a.member_idx = 0
  UNION ALL
  SELECT s.ia AS cluster_id, s.ib AS entity_id
  FROM allsim s WHERE s.best >= 0.85)
SELECT a.entity_id, c.canonical_id
FROM asg a
JOIN canon c ON a.cluster_id = c.cluster_id
JOIN verified v ON v.cluster_id = a.cluster_id
              AND v.entity_id = a.entity_id
WHERE a.entity_id <> c.canonical_id
ORDER BY a.entity_id
    """


# -------------------------------------------- answer-generation SQL --

_GEN_EXT_SUF = "\n\nRelevant information:"
_GEN_ABS_SUF = ("\n\nBased on the provided context, please answer the "
                "question. If the context doesn't contain enough "
                "information, please say so.")
_GEN_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
_GEN_NAMES = ("['entity','second','third','fourth','fifth','sixth',"
              "'guardian','companion','friend','character']")
_GEN_EVENTS = ("['activity','discovery','location','place','action',"
               "'building','structure','area','water']")
_GEN_LOCS = ("['settlement','waterway','river','cavern','landmass',"
             "'town','building','institution','dwelling']")


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _generation_sql() -> str:
    """Full replay of ``generation/mod.rs`` over the staged
    query/result/summary tables — context assembly, both template
    paths' sentence scoring (suffix-in-question quirk), smart fallback,
    mode dispatch, confidence arithmetic, citation md5."""
    qt = _staged_sql("generated_answers", "q")
    rt = _staged_sql("generated_answers", "r")
    ht = _staged_sql("generated_answers", "h")
    ws = _GEN_WS
    return f"""
WITH
q AS (SELECT * FROM {qt}),
r AS (SELECT * FROM {rt}),
h AS (SELECT * FROM {ht}),
cat AS (
  SELECT query_id, seq, result_id, content, score,
    CASE WHEN score >= 0.7 AND result_type IN ('chunk','entity') THEN 0
         WHEN score >= 0.3 THEN 1 ELSE 2 END AS cat
  FROM r),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id, cat
             ORDER BY score DESC, seq ASC) AS rn
  FROM cat WHERE cat < 2),
kept AS (SELECT * FROM ranked WHERE rn <= 5),
hkept AS (
  SELECT * FROM (
    SELECT query_id, node_id, summary, score,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, seq ASC) AS rn
    FROM h) t WHERE rn <= 3),
avgs AS (
  SELECT q.query_id,
    round(coalesce(p.a, 0.0), 12) AS avg_p,
    round(coalesce(s.a, 0.0), 12) AS avg_s,
    round(coalesce(hh.a, 0.0), 12) AS avg_h
  FROM q
  LEFT JOIN (SELECT query_id, avg(score) AS a FROM kept WHERE cat = 0
             GROUP BY query_id) p USING (query_id)
  LEFT JOIN (SELECT query_id, avg(score) AS a FROM kept WHERE cat = 1
             GROUP BY query_id) s USING (query_id)
  LEFT JOIN (SELECT query_id, avg(score) AS a FROM hkept
             GROUP BY query_id) hh USING (query_id)),
cconf AS (SELECT query_id,
                 least(avg_p*0.5 + avg_s*0.3 + avg_h*0.2, 1.0) AS ctx_conf
          FROM avgs),
parts AS (
  SELECT query_id, cat AS ord1, rn, content AS txt, result_id AS sid,
         score
  FROM kept
  UNION ALL
  SELECT query_id, 2, rn, summary, node_id, score FROM hkept),
comb AS (
  SELECT q.query_id, coalesce(c.combined, '') AS combined
  FROM q LEFT JOIN (
    SELECT query_id,
           string_agg(txt, chr(10)||chr(10) ORDER BY ord1, rn) AS combined
    FROM parts GROUP BY query_id) c USING (query_id)),
ctxt AS (SELECT query_id, trim(combined, {ws}) AS ctx FROM comb),
sents0 AS (
  SELECT query_id, list_filter(list_transform(
    regexp_split_to_array(ctx, '[.!?]'), x -> trim(x, {ws})),
    x -> x <> '') AS sl
  FROM ctxt),
sent AS (
  SELECT query_id, unnest(sl) AS sentence,
         unnest(range(1, len(sl)+1)) AS sidx
  FROM sents0),
paths AS (
  SELECT query_id, 'ext' AS path,
         lower(question || {_sql_lit(_GEN_EXT_SUF)}) AS lq FROM q
  UNION ALL
  SELECT query_id, 'abs', lower(question || {_sql_lit(_GEN_ABS_SUF)})
  FROM q),
qw0 AS (
  SELECT query_id, path,
         list_filter(string_split_regex(lq, '\\s+'),
                     w -> length(w) > 2) AS qws
  FROM paths),
qw AS (SELECT query_id, path, unnest(qws) AS w FROM qw0),
nqw AS (SELECT query_id, path, len(qws) AS nq FROM qw0),
swords AS (SELECT query_id, sidx, lower(sentence) AS sl,
                  list_filter(string_split_regex(lower(sentence), '\\s+'),
                              x -> x <> '') AS sw
           FROM sent),
pts AS (
  SELECT s.query_id, q.path, s.sidx,
    CASE WHEN contains(s.sl, q.w) THEN 2.0
         WHEN length(q.w) > 4 AND len(list_filter(s.sw,
              t -> contains(t, q.w) OR contains(q.w, t))) > 0 THEN 1.0
         ELSE 0.0 END AS p
  FROM swords s JOIN qw q USING (query_id)),
sentsc AS (
  SELECT query_id, path, sidx, sum(p) AS total,
         count(*) FILTER (WHERE p > 0.0) AS matches
  FROM pts GROUP BY query_id, path, sidx),
fsent AS (
  SELECT c.query_id, c.path, c.sidx,
         c.total + (c.matches::DOUBLE / n.nq) * 0.5 AS sc
  FROM sentsc c JOIN nqw n USING (query_id, path)),
rsent AS (
  SELECT f.*, s.sentence,
         row_number() OVER (PARTITION BY f.query_id, f.path
           ORDER BY f.sc DESC, f.sidx ASC) AS srn
  FROM fsent f JOIN sent s USING (query_id, sidx)),
a5 AS (
  SELECT query_id, path, string_agg(
    sentence || ' (relevance: ' || printf('%.1f', sc) || ')',
    chr(10)||chr(10) ORDER BY srn) AS ans
  FROM rsent WHERE srn <= 5 AND sc > 0.5 GROUP BY query_id, path),
a2 AS (
  SELECT query_id, path, string_agg(
    sentence || ' (low confidence: ' || printf('%.1f', sc) || ')',
    chr(10)||chr(10) ORDER BY srn) AS ans
  FROM rsent WHERE srn <= 2 AND sc > 0.0 GROUP BY query_id, path),
eans AS (
  SELECT p.query_id, p.path, p.lq,
         coalesce(a5.ans, a2.ans,
           'No directly relevant information found in the context.')
           AS ans
  FROM paths p LEFT JOIN a5 USING (query_id, path)
               LEFT JOIN a2 USING (query_id, path)),
lists AS (
  SELECT c.query_id,
    array_to_string(list_filter({_GEN_NAMES},
      n -> contains(lower(c.ctx), n)), ', ') AS names,
    array_to_string(list_transform(list_filter({_GEN_EVENTS},
      e -> contains(lower(c.ctx), e)),
      e -> 'events involving ' || e), ', ') AS events,
    array_to_string(list_filter({_GEN_LOCS},
      l -> contains(lower(c.ctx), l)), ', ') AS locs,
    s.sl
  FROM ctxt c JOIN sents0 s USING (query_id)),
summ AS (
  SELECT query_id,
    CASE WHEN len(sl) = 0 THEN ''
         WHEN length(sl[1]) > 150 THEN ''
         WHEN len(sl) < 2 OR length(sl[1]) + length(sl[2]) > 150
           THEN sl[1]
         WHEN len(sl) < 3
              OR (length(sl[1]) + 1 + length(sl[2])) + length(sl[3]) > 150
           THEN sl[1] || ' ' || sl[2]
         ELSE sl[1] || ' ' || sl[2] || ' ' || sl[3] END AS s
  FROM lists),
cresp AS (
  SELECT e.query_id, e.path,
    CASE
      WHEN contains(e.lq, 'who') AND contains(e.lq, 'friend')
           AND l.names <> ''
        THEN 'Based on the context, the main characters mentioned '
             || 'include: ' || l.names || '. These appear to be friends '
             || 'and companions in the story.'
      WHEN contains(e.lq, 'what')
           AND (contains(e.lq, 'adventure') OR contains(e.lq, 'happen'))
           AND l.events <> ''
        THEN 'The context describes several events: ' || l.events
      WHEN contains(e.lq, 'where') AND l.locs <> ''
        THEN 'The story takes place in locations such as: ' || l.locs
      ELSE 'Based on the available context: ' || m.s
    END AS resp
  FROM eans e JOIN lists l USING (query_id) JOIN summ m USING (query_id)),
smart AS (
  SELECT e.query_id, e.path,
    CASE WHEN contains(e.ans, 'No relevant')
              OR contains(e.ans, 'No directly')
         THEN c.resp ELSE e.ans END AS ans
  FROM eans e JOIN cresp c USING (query_id, path)),
trunc0 AS (
  SELECT query_id, path,
    CASE WHEN length(ans) > 500 THEN substr(ans, 1, 497) || '...'
         ELSE ans END AS ans
  FROM smart),
modeans AS (
  SELECT q.query_id, q.mode,
    CASE WHEN cb.combined = '' THEN 'No relevant content found.'
         WHEN q.mode = 'extractive' THEN ext.ans
         WHEN q.mode = 'abstractive' THEN ab.ans
         WHEN length(ext.ans) < 50 OR contains(ext.ans, 'No relevant')
           THEN ab.ans
         ELSE ext.ans END AS answer
  FROM q
  JOIN comb cb USING (query_id)
  JOIN (SELECT query_id, ans FROM trunc0 WHERE path = 'ext') ext
    USING (query_id)
  JOIN (SELECT query_id, ans FROM trunc0 WHERE path = 'abs') ab
    USING (query_id)),
final0 AS (
  SELECT m.query_id,
    CASE WHEN cc.ctx_conf < 0.3
         THEN 'Insufficient information available to answer this '
              || 'question.'
         ELSE m.answer END AS answer,
    cc.ctx_conf
  FROM modeans m JOIN cconf cc USING (query_id)),
ents0 AS (
  SELECT query_id, list_sort(list_distinct(flatten(list(
           list_filter(string_split(entities_csv, ','),
                       x -> x <> ''))))) AS el
  FROM r GROUP BY query_id),
ment AS (
  SELECT f.query_id,
    len(list_filter(e.el, x -> contains(lower(f.answer), lower(x))))
      AS nm
  FROM final0 f JOIN ents0 e USING (query_id)),
c1 AS (SELECT query_id, answer, ctx_conf,
         CASE WHEN length(answer) < 20 THEN ctx_conf * 0.7
              ELSE ctx_conf END AS v
       FROM final0),
c2 AS (SELECT query_id, answer, ctx_conf,
         CASE WHEN contains(answer, 'No relevant')
                   OR contains(answer, 'insufficient')
              THEN v * 0.5 ELSE v END AS v
       FROM c1),
conf AS (
  SELECT c2.query_id, c2.answer, c2.ctx_conf,
    CASE WHEN c2.ctx_conf < 0.3 THEN c2.ctx_conf
         ELSE least(CASE WHEN m.nm > 0
                         THEN c2.v + least(m.nm * 0.1, 0.2)
                         ELSE c2.v END, 1.0) END AS confidence
  FROM c2 JOIN ment m USING (query_id)),
srcs AS (
  SELECT query_id, ord1, rn, sid, score, txt,
    row_number() OVER (PARTITION BY query_id ORDER BY ord1, rn) AS cid
  FROM parts),
cit AS (
  SELECT query_id,
    string_agg(chr(10) || '[' || cid || '] ' ||
      CASE ord1 WHEN 0 THEN 'chunk' WHEN 1 THEN 'supporting_chunk'
           ELSE 'summary' END ||
      ' (confidence: ' || printf('%.2f', score) || ') - ' ||
      CASE WHEN length(txt) <= 100 THEN txt
           ELSE substr(txt, 1, 100) || '...' END,
      '' ORDER BY cid) AS cittxt,
    count(*)::BIGINT AS nsrc
  FROM srcs GROUP BY query_id),
fmt AS (
  SELECT f.query_id,
    f.answer ||
    coalesce(chr(10)||chr(10)||'Sources:' || c.cittxt, '') ||
    CASE WHEN f.confidence > 0.0
         THEN chr(10)||chr(10)||'Overall confidence: '
              || printf('%.2f', f.confidence)
         ELSE '' END AS formatted,
    coalesce(c.nsrc, 0) AS nsrc
  FROM conf f LEFT JOIN cit c USING (query_id))
SELECT cf.query_id, q.mode AS mode_used, cf.answer,
  round(cf.confidence, 12) AS confidence,
  round(cf.ctx_conf, 12) AS context_quality,
  ft.nsrc AS n_sources,
  array_to_string(e.el, ',') AS entities_csv,
  md5(ft.formatted) AS citations_md5,
  'Confidence: ' || CASE WHEN cf.confidence >= 0.8 THEN 'High'
                         WHEN cf.confidence >= 0.5 THEN 'Medium'
                         ELSE 'Low' END ||
  ' | Sources: ' || CASE WHEN ft.nsrc >= 3 THEN 'Well-sourced'
                         WHEN ft.nsrc > 0 THEN 'Moderately sourced'
                         ELSE 'Poorly sourced' END ||
  ' | Context Quality: ' || printf('%.2f', cf.ctx_conf) AS quality
FROM conf cf JOIN q USING (query_id) JOIN fmt ft USING (query_id)
JOIN ents0 e USING (query_id)
    """


# ---------------------------------------- concept extraction SQL --

def _concept_mentions_sql() -> str:
    """Zero-derivation-staging replay of ``extract_concepts``
    (``concept_graph.rs:119-264``) over the staged chunk texts —
    regexes, keyword ranking, validity gates, sort+dedup all in SQL."""
    from graphrag_rs_ray.functions.concepts import CONCEPT_STOPWORDS
    chunks = _staged_sql("concept_mentions")
    stop = "(" + ",".join(f"'{w}'" for w in sorted(CONCEPT_STOPWORDS)) \
        + ")"
    return r"""
WITH t AS MATERIALIZED (SELECT chunk_id, text FROM {chunks}),
cap AS (SELECT chunk_id, unnest(regexp_extract_all(text,
          '\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+\b')) AS p FROM t),
np AS (SELECT chunk_id, unnest(regexp_extract_all(text,
          '\b[A-Z][a-z]+(?:\s+[A-Z]?[a-z]+){1,4}\b')) AS p FROM t),
kw0 AS (SELECT chunk_id,
               regexp_replace(lower(unnest(list_filter(
                 string_split_regex(text, '\s+'), x -> x <> ''))),
                 '^[\W_]+|[\W_]+$', '', 'g') AS w
        FROM t),
kw1 AS (SELECT chunk_id, w, count(*) AS c FROM kw0
        WHERE length(w) >= 3 AND w NOT IN {stop}
        GROUP BY chunk_id, w),
kw2 AS (SELECT chunk_id, w, c, row_number() OVER (
          PARTITION BY chunk_id ORDER BY c DESC, w ASC) AS rk
        FROM kw1),
kw AS (SELECT chunk_id, w AS p FROM kw2 WHERE rk <= 20 AND c >= 2),
allp AS (SELECT chunk_id, p FROM cap
         UNION ALL SELECT chunk_id, p FROM np
         UNION ALL SELECT chunk_id, p FROM kw),
valid AS (
  SELECT DISTINCT chunk_id, p FROM (
    SELECT chunk_id, p,
           list_filter(string_split_regex(p, '\s+'),
                       x -> x <> '') AS ws
    FROM allp) x
  WHERE length(p) >= 3 AND len(ws) <= 5
    AND len(list_filter(ws, w -> lower(w) IN {stop})) <= len(ws) // 2)
SELECT p AS concept, chunk_id FROM valid
    """.replace("{chunks}", chunks).replace("{stop}", stop)


# ----------------------------------------------- doc-tree query SQL --

def _doc_tree_search_sql() -> str:
    nodes = _staged_sql("doc_tree_search")
    qk = _staged_sql("doc_tree_search", "qk")
    qwords = "[" + ",".join(f"'{w}'" for w in
                            _DOC_TREE_QUERY.split()) + "]"
    return f"""
WITH n AS (
  SELECT doc_id, node_id, level,
         lower(summary || ' ' || replace(keywords_csv, ',', ' '))
           AS nt
  FROM {nodes}),
nw AS (SELECT doc_id, node_id,
              list_filter(string_split_regex(nt, '\\s+'),
                          x -> x <> '') AS ws
       FROM n),
scored AS (
  SELECT n.doc_id, n.node_id, n.level,
    (SELECT coalesce(sum(1.0), 0.0) FROM {qk} q
     WHERE contains(n.nt, lower(q.kw)))
    + (len(list_filter({qwords},
           w -> list_contains(nw.ws, lower(w))))::DOUBLE
       / len({qwords})) * 2.0
    + (1.0 / (n.level + 1)) * 0.5 AS score
  FROM n JOIN nw USING (doc_id, node_id)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, node_id ASC) AS rn
  FROM scored WHERE score > 0.1)
SELECT doc_id, node_id, level, round(score, 12) AS score
FROM ranked WHERE rn <= 3
    """


# ----------------------------------------------- NER engine SQL --

def _ner_mentions_sql() -> str:
    """Replay of the demo NER config (``stages/ner.py::DEMO_RULES``)
    over the staged sanitized chunk texts — see ``q_ner_mentions``."""
    from graphrag_rs_ray.stages.ner import DEMO_ENTITY_TYPES
    chunks = _staged_sql("ner_mentions")
    entries = sorted(DEMO_ENTITY_TYPES[0]["dictionary"])
    entries_sql = " UNION ALL ".join(
        f"SELECT '{e}' AS entry, {i} AS eidx"
        for i, e in enumerate(entries))
    return r"""
WITH RECURSIVE
t AS MATERIALIZED (SELECT chunk_id, doc_id, text FROM {chunks}),
entries AS ({entries_sql}),
-- dictionary rule (conf 0.95, rule order 0): non-overlapping
-- occurrences of each entry in lower(text); positions from the
-- split-prefix-sum (next search starts at pos + len(entry))
dparts AS (
  SELECT chunk_id, entry, eidx,
         string_split(lower(text), entry) AS parts
  FROM t CROSS JOIN entries),
dflat AS (SELECT chunk_id, entry, eidx, len(parts) AS np,
                 unnest(parts) AS part,
                 unnest(range(1, len(parts)+1)) AS k
          FROM dparts),
dcum AS (SELECT *, sum(length(part)) OVER (
           PARTITION BY chunk_id, entry ORDER BY k) AS cum
         FROM dflat),
dmatch AS (
  SELECT chunk_id, (cum + (k-1)*length(entry))::BIGINT AS start,
         (cum + k*length(entry))::BIGINT AS fin,
         length(entry)::BIGINT AS mlen,
         'CITY' AS type, 0.95::REAL AS conf,
         'city_gazetteer' AS rule,
         0 AS rord, eidx AS s1, k AS s2
  FROM dcum WHERE k < np),
-- regex rules (conf 0.9): positions from zipping
-- string_split_regex parts with regexp_extract_all matches
rx AS (
  SELECT chunk_id, rname, etype, rord,
         string_split_regex(text, pat) AS parts,
         regexp_extract_all(text, pat) AS ms
  FROM t CROSS JOIN (
    SELECT 'org_suffix' AS rname, 'ORG' AS etype, 1 AS rord,
           '\b[A-Z][A-Za-z]+ (?:Inc|Corp|LLC|Ltd)\b' AS pat
    UNION ALL
    SELECT 'dr_person', 'TITLE_PERSON', 2, '\bDr\. [A-Z][a-z]+\b') r),
rpcum AS (SELECT chunk_id, rname, etype, rord, k,
                 sum(length(part)) OVER (
                   PARTITION BY chunk_id, rname ORDER BY k) AS pcum
          FROM (SELECT chunk_id, rname, etype, rord,
                       unnest(parts) AS part,
                       unnest(range(1, len(parts)+1)) AS k
                FROM rx) x),
rmcum AS (SELECT chunk_id, rname, k, m,
                 coalesce(sum(length(m)) OVER (
                   PARTITION BY chunk_id, rname ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS mprev
          FROM (SELECT chunk_id, rname, unnest(ms) AS m,
                       unnest(range(1, len(ms)+1)) AS k
                FROM rx) x),
rmatch AS (
  SELECT q.chunk_id, (p.pcum + q.mprev)::BIGINT AS start,
         (p.pcum + q.mprev + length(q.m))::BIGINT AS fin,
         length(q.m)::BIGINT AS mlen,
         p.etype AS type, 0.9::REAL AS conf, p.rname AS rule,
         p.rord, 0 AS s1, q.k AS s2
  FROM rmcum q
  JOIN rpcum p ON p.chunk_id = q.chunk_id AND p.rname = q.rname
              AND p.k = q.k),
-- contextual rule (conf 0.85): word-triple window, match = middle
-- word, position = FIRST substring occurrence (reference quirk)
cwords AS (SELECT chunk_id, unnest(ws) AS w,
                  unnest(range(1, len(ws)+1)) AS i
           FROM (SELECT chunk_id,
                        list_filter(string_split_regex(text, '\s+'),
                                    x -> x <> '') AS ws
                 FROM t) x),
cmatch AS (
  SELECT a.chunk_id, (strpos(tt.text, b.w) - 1)::BIGINT AS start,
         (strpos(tt.text, b.w) - 1 + length(b.w))::BIGINT AS fin,
         length(b.w)::BIGINT AS mlen,
         'TITLE_PERSON' AS type, 0.85::REAL AS conf,
         'prof_contextual' AS rule, 3 AS rord, 0 AS s1, a.i AS s2
  FROM cwords a
  JOIN cwords b ON b.chunk_id = a.chunk_id AND b.i = a.i + 1
  JOIN cwords c ON c.chunk_id = a.chunk_id AND c.i = a.i + 2
  JOIN t tt ON tt.chunk_id = a.chunk_id
  WHERE contains(lower(a.w), 'professor')
    AND contains(lower(b.w), 'at')
    AND contains(lower(c.w), 'university')
    AND strpos(tt.text, b.w) > 0),
allm AS (SELECT * FROM dmatch UNION ALL SELECT * FROM rmatch
         UNION ALL SELECT * FROM cmatch),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY chunk_id
             ORDER BY start ASC, conf DESC, rord ASC, s1 ASC, s2 ASC)
             AS rn,
         count(*) OVER (PARTITION BY chunk_id) AS n
  FROM allm),
greedy AS (
  SELECT chunk_id, 0::BIGINT AS rn, 0::BIGINT AS last_end,
         FALSE AS keep, n
  FROM (SELECT DISTINCT chunk_id, n FROM ordered) b
  UNION ALL
  SELECT o.chunk_id, o.rn,
         CASE WHEN o.start >= g.last_end THEN o.fin
              ELSE g.last_end END,
         o.start >= g.last_end, g.n
  FROM greedy g JOIN ordered o
    ON o.chunk_id = g.chunk_id AND o.rn = g.rn + 1
  WHERE g.rn < g.n)
SELECT o.chunk_id, tt.doc_id,
       substr(tt.text, (o.start + 1)::INT, o.mlen::INT) AS surface,
       o.type, o.start, o.fin AS "end", o.conf, o.rule
FROM greedy g
JOIN ordered o USING (chunk_id, rn)
JOIN t tt USING (chunk_id)
WHERE g.keep
    """.replace("{chunks}", chunks).replace("{entries_sql}", entries_sql)


# ----------------------------------------- rograg streaming SQL --

def _rograg_responses_sql() -> str:
    qt = _staged_sql("rograg_responses", "q")
    rt = _staged_sql("rograg_responses", "r")
    return f"""
WITH q AS (SELECT * FROM {qt}),
r AS MATERIALIZED (
  SELECT query_id, seq, content, confidence, result_type,
         string_split(sources_csv, ',') AS srcs
  FROM {rt}),
rs AS (SELECT *,
         row_number() OVER (PARTITION BY query_id
           ORDER BY confidence DESC, seq ASC) AS crk,
         row_number() OVER (PARTITION BY query_id
           ORDER BY confidence DESC, seq DESC) AS crk_last
       FROM r),
seq_syn AS (
  SELECT query_id, string_agg(content, '. ' ORDER BY seq) AS content,
         avg(confidence) AS conf
  FROM r GROUP BY query_id),
w0 AS (SELECT query_id, sum(confidence) AS total,
              sum(confidence*confidence)/count(*) AS wc
       FROM r GROUP BY query_id),
w_top AS (SELECT query_id,
                 string_agg(content, '. ' ORDER BY crk) AS content
          FROM rs WHERE crk <= 3 GROUP BY query_id),
w_syn AS (
  SELECT w0.query_id,
         CASE WHEN w0.total = 0.0 THEN s.content ELSE t.content END
           AS content,
         CASE WHEN w0.total = 0.0 THEN s.conf ELSE sqrt(w0.wc) END
           AS conf
  FROM w0 JOIN seq_syn s USING (query_id)
          JOIN w_top t USING (query_id)),
b_syn AS (SELECT query_id, content, confidence AS conf, srcs
          FROM rs WHERE crk_last = 1),
sm_haslogic AS (
  SELECT query_id,
         (count(*) FILTER (WHERE result_type = 'logic_form') > 0) AS hl
  FROM r GROUP BY query_id),
sm_rows AS (
  SELECT p.*, row_number() OVER (PARTITION BY p.query_id
                                 ORDER BY p.seq) AS rk
  FROM r p JOIN sm_haslogic h USING (query_id)
  WHERE (h.hl AND p.result_type = 'logic_form')
     OR (NOT h.hl AND p.result_type IN ('fuzzy_match', 'fallback'))),
sm_syn AS (
  SELECT c.query_id, c.content, a.conf
  FROM (SELECT query_id, string_agg(content, '. ' ORDER BY rk)
                 AS content
        FROM sm_rows WHERE rk <= 2 GROUP BY query_id) c
  JOIN (SELECT query_id, avg(confidence) AS conf FROM sm_rows
        GROUP BY query_id) a USING (query_id)),
h_supp AS (SELECT query_id,
                  string_agg(content, '; ' ORDER BY crk) AS supp
           FROM rs WHERE crk IN (2, 3) GROUP BY query_id),
h_syn AS (
  SELECT f.query_id,
         CASE WHEN s.supp IS NOT NULL
              THEN f.content || '. ' || 'Additionally: ' || s.supp
              ELSE f.content END AS content,
         f.confidence AS conf
  FROM (SELECT query_id, content, confidence FROM rs WHERE crk = 1) f
  LEFT JOIN h_supp s USING (query_id)),
syn AS (
  SELECT q.query_id,
    CASE q.strategy WHEN 'sequential' THEN s.content
         WHEN 'weighted' THEN w.content WHEN 'best_only' THEN b.content
         WHEN 'smart_merge' THEN m.content ELSE h.content END
      AS content,
    CASE q.strategy WHEN 'sequential' THEN s.conf
         WHEN 'weighted' THEN w.conf WHEN 'best_only' THEN b.conf
         WHEN 'smart_merge' THEN m.conf ELSE h.conf END AS conf
  FROM q JOIN seq_syn s USING (query_id) JOIN w_syn w USING (query_id)
         JOIN b_syn b USING (query_id) JOIN sm_syn m USING (query_id)
         JOIN h_syn h USING (query_id)),
srcflat AS (SELECT query_id, seq, unnest(srcs) AS s,
                   unnest(range(1, len(srcs)+1)) AS k
            FROM r),
srcfirst AS (SELECT query_id, s, min(seq*1000 + k) AS ord
             FROM srcflat GROUP BY query_id, s),
srcall AS (SELECT query_id,
                  string_agg(s, ',' ORDER BY ord) AS sources_csv,
                  list(s ORDER BY ord) AS slist
           FROM srcfirst GROUP BY query_id),
attr AS (
  SELECT q.query_id,
         CASE WHEN q.strategy = 'best_only' THEN b.srcs
              ELSE a.slist END AS alist
  FROM q JOIN srcall a USING (query_id) JOIN b_syn b USING (query_id)),
attstr AS (
  SELECT query_id, string_agg('[' || k || '] ' || s, ', ' ORDER BY k)
           AS att
  FROM (SELECT query_id, unnest(alist) AS s,
               unnest(range(1, len(alist)+1)) AS k
        FROM attr) t
  WHERE k <= 3 GROUP BY query_id),
nsub AS (SELECT query_id, count(*)::BIGINT AS n,
                max(CASE WHEN result_type = 'fallback' THEN 1 ELSE 0
                    END)::BIGINT AS fb
         FROM r GROUP BY query_id),
tt AS (
  SELECT q.query_id,
    CASE lower(q.primary_intent)
      WHEN 'factual' THEN 'factual'
      WHEN 'definitional' THEN 'definitional'
      WHEN 'relational' THEN 'relational'
      WHEN 'comparative' THEN 'comparative'
      WHEN 'summary' THEN 'summary'
      WHEN 'exploratory' THEN 'summary'
      WHEN 'causal' THEN 'causal'
      WHEN 'temporal' THEN 'temporal'
      ELSE CASE WHEN ns.n > 1 THEN 'summary' ELSE 'fallback' END
    END AS ttype
  FROM q JOIN nsub ns USING (query_id)),
eff AS (SELECT query_id, ttype,
               CASE WHEN ttype IN ('causal', 'temporal')
                    THEN 'fallback' ELSE ttype END AS etype
        FROM tt),
fw AS (SELECT query_id, seq,
              list_filter(string_split_regex(content, '\\s+'),
                          x -> x <> '')[1] AS w
       FROM r),
ents AS (
  SELECT q.query_id,
         coalesce(f0.w, 'the subject') AS entity,
         coalesce(f0.w, 'entity') AS entity1,
         coalesce(f1.w, 'entity') AS entity2
  FROM q
  LEFT JOIN (SELECT query_id, w FROM fw WHERE seq = 0) f0
    USING (query_id)
  LEFT JOIN (SELECT query_id, w FROM fw WHERE seq = 1) f1
    USING (query_id)),
relx AS (SELECT query_id, content,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY seq) AS k
         FROM r WHERE contains(content, 'related')
                   OR contains(content, 'relationship')),
rel AS (SELECT q.query_id,
               coalesce(x.content, 'a connection') AS relationship
        FROM q LEFT JOIN (SELECT query_id, content FROM relx
                          WHERE k = 1) x USING (query_id)),
addl AS (SELECT query_id,
                'Additionally, ' ||
                string_agg(content, '. ' ORDER BY seq) AS s
         FROM r WHERE seq > 0 GROUP BY query_id),
det0 AS (SELECT query_id, count(*) AS n,
                string_agg(content, '. ' ORDER BY seq) AS s
         FROM r WHERE confidence > 0.6 GROUP BY query_id),
det AS (SELECT q.query_id,
               CASE WHEN d.n > 1 THEN d.s ELSE '' END AS s
        FROM q LEFT JOIN det0 d USING (query_id)),
kp AS (SELECT query_id, 'Key points: ' ||
              string_agg(rk || '. ' || content, '; ' ORDER BY rk) AS s
       FROM (SELECT query_id, content,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY seq) AS rk
             FROM r) t
       WHERE rk <= 3 GROUP BY query_id),
assembled AS (
  SELECT e.query_id, e.etype, s.conf,
    CASE e.etype
      WHEN 'factual' THEN
        'Based on the available information, ' || s.content || '. ' ||
        CASE WHEN s.conf >= 0.9
             THEN 'I''m very confident in this information.'
             WHEN s.conf >= 0.7
             THEN 'This information appears to be reliable.'
             WHEN s.conf >= 0.5
             THEN 'This information has moderate confidence.'
             ELSE 'Please note that this information has limited '
                  || 'confidence.' END
      WHEN 'definitional' THEN
        en.entity || ' is ' || s.content || '. ' || coalesce(ad.s, '')
      WHEN 'relational' THEN
        en.entity1 || ' and ' || en.entity2 ||
        ' are related through ' || rl.relationship || '. ' || dt.s
      WHEN 'comparative' THEN
        'Comparing ' || en.entity1 || ' and ' || en.entity2 || ': ' ||
        s.content || '. ' ||
        CASE WHEN s.conf > 0.8
             THEN 'This appears to be well-supported by the available '
                  || 'information.'
             WHEN s.conf > 0.6
             THEN 'This conclusion is supported by the available '
                  || 'evidence.'
             ELSE 'This is based on limited information.' END
      WHEN 'summary' THEN
        'Here''s what I found about ' || en.entity || ': ' ||
        s.content || '. ' || coalesce(k.s, '')
      ELSE 'Based on the available information: ' || s.content
    END AS raw
  FROM eff e JOIN syn s USING (query_id) JOIN ents en USING (query_id)
       JOIN rel rl USING (query_id) JOIN det dt USING (query_id)
       LEFT JOIN addl ad USING (query_id)
       LEFT JOIN kp k USING (query_id)),
cleaned AS (
  SELECT query_id, etype, conf,
    trim(regexp_replace(regexp_replace(raw, '\\{{\\w+\\}}', '', 'g'),
                        '\\s+', ' ', 'g')) AS c
  FROM assembled),
ended AS (
  SELECT query_id, etype, conf,
    CASE WHEN c = '' THEN c
         WHEN right(c, 1) IN ('.', '!', '?') THEN c
         ELSE c || '.' END AS c
  FROM cleaned),
final AS (
  SELECT e.query_id, e.etype, e.conf,
         e.c || chr(10) || chr(10) || 'Sources: ' || a.att AS content
  FROM ended e JOIN attstr a USING (query_id))
SELECT q.query_id, q.strategy, t.ttype AS template_type,
       f.etype AS effective_template, f.content,
       round(least(f.conf * 0.7 + q.intent_confidence * 0.3, 1.0), 12)
         AS confidence,
       sa.sources_csv, ns.n AS n_subqueries, ns.fb AS fallback_used,
       ((len(list_filter(string_split_regex(f.content, '\\s+'),
                         x -> x <> '')) + 255) // 256)::BIGINT
         AS n_chunks
FROM q JOIN final f USING (query_id) JOIN tt t USING (query_id)
JOIN srcall sa USING (query_id) JOIN nsub ns USING (query_id)
    """


# ----------------------------------------------- agent-planner SQL --

def _agent_plans_sql() -> str:
    qt = _staged_sql("agent_plans")
    ents = _staged_sql("agent_plans", "ents")
    return f"""
WITH q AS (SELECT query_id, query FROM {qt}),
ents AS (SELECT name FROM {ents}),
words AS (SELECT query_id, query,
                 list_filter(string_split_regex(query, '\\s+'),
                             x -> x <> '') AS ws
          FROM q),
w1 AS (SELECT query_id, unnest(ws) AS win FROM words),
w2 AS (SELECT query_id,
              unnest(list_transform(range(1, len(ws)),
                k -> ws[k::INT] || ' ' || ws[(k+1)::INT])) AS win
       FROM words),
allw AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2),
m AS (
  SELECT w.query_id,
         (SELECT min(e.name) FROM ents e
          WHERE contains(lower(e.name), lower(w.win))) AS ename
  FROM allw w),
quoted AS (
  SELECT query_id,
    CASE WHEN strpos(query, '"') > 0
              AND strpos(substr(query, strpos(query, '"') + 1), '"') > 0
         THEN substr(query, strpos(query, '"') + 1,
                     strpos(substr(query, strpos(query, '"') + 1), '"')
                     - 1)
    END AS qent
  FROM q),
pot AS (
  SELECT query_id, name,
         row_number() OVER (PARTITION BY query_id ORDER BY name) AS rk
  FROM (SELECT DISTINCT query_id, ename AS name FROM m
        WHERE ename IS NOT NULL
        UNION
        SELECT query_id, qent FROM quoted WHERE qent IS NOT NULL)),
np AS (SELECT query_id, count(*)::BIGINT AS n FROM pot
       GROUP BY query_id),
strat AS (
  SELECT q.query_id, coalesce(np.n, 0) AS np,
    CASE WHEN contains(lower(query), 'relationship')
              OR contains(lower(query), 'connect')
              OR contains(lower(query), 'relation')
              OR contains(lower(query), 'between')
           THEN 'relationship_exploration'
         WHEN contains(lower(query), 'context')
              OR contains(lower(query), 'detail')
              OR contains(lower(query), 'about')
              OR contains(lower(query), 'information')
           THEN 'contextual_analysis'
         WHEN coalesce(np.n, 0) > 0 THEN 'entity_search'
         ELSE 'adaptive' END AS strategy
  FROM q LEFT JOIN np USING (query_id)),
kterms AS (
  SELECT query_id, w, row_number() OVER (
           PARTITION BY query_id ORDER BY pos) AS krk
  FROM (SELECT query_id, unnest(ws) AS w,
               unnest(range(1, len(ws)+1)) AS pos
        FROM words) t
  WHERE strlen(w) > 3 AND substr(w, 1, 1) = upper(substr(w, 1, 1))
        AND substr(w, 1, 1) <> lower(substr(w, 1, 1))),
calls AS (
  SELECT p.query_id, (p.rk - 1)::BIGINT AS call_idx,
         'graph_search' AS function, p.name AS entity_name,
         '' AS source_entity, '' AS target_entity,
         CASE s.strategy WHEN 'entity_search' THEN 5 ELSE 3
           END::BIGINT AS arg_limit,
         -1::BIGINT AS max_hops
  FROM pot p JOIN strat s USING (query_id)
  WHERE s.strategy IN ('entity_search', 'relationship_exploration',
                       'contextual_analysis')
  UNION ALL
  SELECT s.query_id, s.np, 'relationship_traverse', '', p1.name,
         p2.name, -1, 3
  FROM strat s
  JOIN pot p1 ON p1.query_id = s.query_id AND p1.rk = 1
  JOIN pot p2 ON p2.query_id = s.query_id AND p2.rk = 2
  WHERE s.strategy = 'relationship_exploration' AND s.np >= 2
  UNION ALL
  SELECT k.query_id, (k.krk - 1)::BIGINT, 'graph_search', k.w, '', '',
         5, -1
  FROM kterms k JOIN strat s USING (query_id)
  WHERE s.strategy = 'adaptive' AND k.krk <= 3),
ngs AS (SELECT query_id, count(*) FILTER (
          WHERE function = 'graph_search')::BIGINT AS n
        FROM calls GROUP BY query_id),
allrows AS (
  SELECT s.query_id, s.strategy, -1::BIGINT AS call_idx,
         'plan' AS function, '' AS entity_name, '' AS source_entity,
         '' AS target_entity, -1::BIGINT AS arg_limit,
         -1::BIGINT AS max_hops
  FROM strat s
  UNION ALL
  SELECT c.query_id, s.strategy, c.call_idx, c.function, c.entity_name,
         c.source_entity, c.target_entity, c.arg_limit, c.max_hops
  FROM calls c JOIN strat s USING (query_id))
SELECT r.query_id, r.strategy, r.call_idx, r.function, r.entity_name,
       r.source_entity, r.target_entity, r.arg_limit, r.max_hops,
       coalesce(g.n, 0) AS n_entities, 0.8 AS confidence
FROM allrows r LEFT JOIN ngs g USING (query_id)
    """


def _query_analysis_sql() -> str:
    qt = _staged_sql("query_analysis")
    return f"""
SELECT query_id,
  (contains(lower(query), 'what is') OR contains(lower(query), 'who is')
   OR contains(lower(query), 'tell me about'))::BIGINT
    AS is_entity_focused,
  (contains(lower(query), 'relationship')
   OR contains(lower(query), 'connect')
   OR contains(lower(query), 'relation')
   OR contains(lower(query), 'between')
   OR contains(lower(query), 'how are')
   OR contains(lower(query), 'associated'))::BIGINT
    AS is_relationship_focused,
  (contains(lower(query), 'context') OR contains(lower(query), 'detail')
   OR contains(lower(query), 'information')
   OR contains(lower(query), 'describe')
   OR contains(lower(query), 'explain'))::BIGINT AS is_context_focused,
  (NOT contains(lower(query), 'list all')
   AND NOT contains(lower(query), 'show all'))::BIGINT
    AS requires_search,
  CASE WHEN contains(lower(query), 'relationship')
            OR contains(lower(query), 'connect')
            OR contains(lower(query), 'relation')
            OR contains(lower(query), 'between')
            OR contains(lower(query), 'how are')
            OR contains(lower(query), 'associated') THEN 'high'
       WHEN contains(lower(query), 'context')
            OR contains(lower(query), 'detail')
            OR contains(lower(query), 'information')
            OR contains(lower(query), 'describe')
            OR contains(lower(query), 'explain') THEN 'medium'
       ELSE 'low' END AS complexity
FROM {qt}
    """


# --------------------------------------------- lazy-pipeline SQL --

_LAZY_CHUNKER_REL = """
  SELECT doc_id::VARCHAR || '_' || k AS chunk_id, doc_id::VARCHAR AS doc_id,
         substr(text, (k*384 + 1)::INT,
                (least(k*384 + 512, L) - k*384)::INT) AS content,
         (k*384)::BIGINT AS start_offset,
         least(k*384 + 512, L)::BIGINT AS end_offset
  FROM (SELECT doc_id, text, L,
               unnest(range(0, (L // 384) + 2)) AS k
        FROM (SELECT doc_id, text, length(text) AS L FROM documents)
        WHERE L > 0)
  WHERE k = 0 OR (k-1)*384 + 512 < L"""


def _lazy_chunks_sql() -> str:
    return f"SELECT * FROM ({_LAZY_CHUNKER_REL})"


def _lazy_stats_sql() -> str:
    m = _staged_sql("lazy_pipeline_stats")
    return f"""
WITH m AS MATERIALIZED (SELECT concept, chunk_id FROM {m}),
norm AS MATERIALIZED (
  SELECT DISTINCT regexp_replace(lower(concept), '[^a-z0-9_]', '', 'g')
           AS nc, chunk_id
  FROM m),
pairs AS (
  SELECT a.concept, b.concept AS cb, count(*) AS cnt
  FROM m a JOIN m b ON a.chunk_id = b.chunk_id AND a.concept < b.concept
  GROUP BY a.concept, b.concept HAVING count(*) >= 2),
s AS (
  SELECT
    (SELECT count(*)::BIGINT FROM documents) AS document_count,
    (SELECT count(*)::BIGINT FROM ({_LAZY_CHUNKER_REL})) AS chunk_count,
    (SELECT count(DISTINCT concept)::BIGINT FROM m) AS concept_count,
    (SELECT count(*)::BIGINT FROM pairs) AS relation_count,
    (SELECT count(DISTINCT nc)::BIGINT FROM norm) AS total_entities,
    (SELECT count(DISTINCT chunk_id)::BIGINT FROM norm)
      AS total_chunks_indexed,
    (SELECT count(*)::BIGINT FROM norm) AS total_mappings)
SELECT document_count, chunk_count, concept_count, relation_count,
       total_entities, total_chunks_indexed, total_mappings,
       CASE WHEN total_entities > 0
            THEN total_mappings::DOUBLE / total_entities::DOUBLE
            ELSE 0.0 END AS avg_chunks_per_entity,
       CASE WHEN total_chunks_indexed > 0
            THEN total_mappings::DOUBLE / total_chunks_indexed::DOUBLE
            ELSE 0.0 END AS avg_entities_per_chunk
FROM s
    """


# ------------------------------------------------ corpus-module SQL --

_GI_TYPE_SQL = """CASE
    WHEN contains(lower({n}), 'person') THEN 'person'
    WHEN contains(lower({n}), 'organization') THEN 'organization'
    WHEN contains(lower({n}), 'location') THEN 'location'
    WHEN contains(lower({n}), 'other') THEN 'other'
    WHEN ends_with(lower({n}), 'company') OR ends_with(lower({n}), 'corp')
         OR ends_with(lower({n}), 'inc') THEN 'organization'
    WHEN contains(lower({n}), 'city') OR contains(lower({n}), 'country')
         OR contains(lower({n}), 'state') THEN 'location'
    WHEN {phase} = 1 AND strlen({n}) < 20 THEN 'person'
    ELSE 'other' END"""


def _doc_collection_sql() -> str:
    """DocumentMetadata oracle (``document_manager.rs:34-47,225-285``):
    extension cycle / type mapping / byte sizes in plain SQL; language =
    the reference's SUBSTRING-occurrence heuristic via replace-length
    counts; duplicates re-derived from raw text equality (first doc_id
    wins) instead of the hash column."""
    hits = " + ".join(
        f"(strlen(text) - strlen(replace(text, '{w}', ''))) // {len(w)}"
        for w in ("the", "and", "or", "but", "in", "on", "at", "to"))
    return f"""
        WITH d AS (
          SELECT doc_id, text,
            CASE doc_id % 7 WHEN 0 THEN 'txt' WHEN 1 THEN 'pdf'
              WHEN 2 THEN 'html' WHEN 3 THEN 'md' WHEN 4 THEN 'json'
              WHEN 5 THEN 'xml' ELSE 'dat' END AS ext,
            len(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS wc,
            ({hits}) AS hits,
            min(doc_id) OVER (PARTITION BY text) AS first_id
          FROM documents)
        SELECT doc_id,
          'doc_' || CAST(doc_id AS VARCHAR) AS title,
          'corpus/doc_' || CAST(doc_id AS VARCHAR) || '.' || ext AS path,
          CASE ext WHEN 'txt' THEN 'text' WHEN 'pdf' THEN 'pdf'
            WHEN 'html' THEN 'html' WHEN 'md' THEN 'markdown'
            WHEN 'json' THEN 'json' WHEN 'xml' THEN 'xml'
            ELSE 'unknown' END AS document_type,
          strlen(text)::BIGINT AS size_bytes,
          CASE WHEN strlen(text) < 10 THEN NULL
               WHEN wc > 0 AND hits::DOUBLE / wc::DOUBLE > 0.05 THEN 'en'
               ELSE 'unknown' END AS language,
          doc_id <> first_id AS is_duplicate,
          CASE WHEN doc_id <> first_id THEN first_id END AS dup_of
        FROM d
    """


def _corpus_entities_sql() -> str:
    """Graph-indexer extraction oracle (``graph_indexer.rs:62-131``):
    whitespace tokenization, 3-word all-capitalized windows then
    len>2 capitalized singles, pre-dedup scan ids (singles offset by
    the window count), first-scan-occurrence dedup, type heuristics
    and the (no-op) quality gate — all re-derived in SQL from the
    staged collection text alone."""
    docs = _staged_sql("corpus_entities", "docs")
    tcase = _GI_TYPE_SQL.replace("{n}", "name").replace("{phase}", "phase")
    return f"""
        WITH docs AS MATERIALIZED (SELECT * FROM {docs}),
        w0 AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS lst
               FROM docs),
        w AS MATERIALIZED (
          SELECT doc_id, unnest(lst) AS word,
                 unnest(range(1, len(lst) + 1)) AS pos
          FROM w0),
        win AS (
          SELECT a.doc_id, a.pos,
                 a.word || ' ' || b.word || ' ' || c.word AS name,
                 0.6 AS confidence, 0 AS phase
          FROM w a
          JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
          WHERE regexp_matches(a.word, '^\\p{{Lu}}')
            AND regexp_matches(b.word, '^\\p{{Lu}}')
            AND regexp_matches(c.word, '^\\p{{Lu}}')),
        sing AS (
          SELECT doc_id, pos, word AS name, 0.5 AS confidence, 1 AS phase
          FROM w
          WHERE strlen(word) > 2 AND regexp_matches(word, '^\\p{{Lu}}')),
        nw AS (SELECT doc_id, count(*) AS n FROM win GROUP BY doc_id),
        u AS (SELECT * FROM win UNION ALL SELECT * FROM sing),
        ids AS (
          SELECT u.doc_id, u.pos, u.name, u.confidence, u.phase,
                 CASE WHEN u.phase = 0 THEN row_number() OVER (
                     PARTITION BY u.doc_id, u.phase ORDER BY u.pos) - 1
                 ELSE coalesce(nw.n, 0) + row_number() OVER (
                     PARTITION BY u.doc_id, u.phase ORDER BY u.pos) - 1
                 END AS k
          FROM u LEFT JOIN nw ON nw.doc_id = u.doc_id),
        ded AS (SELECT * FROM (
            SELECT ids.*, row_number() OVER (
                PARTITION BY doc_id, name ORDER BY phase, pos) AS rn
            FROM ids) WHERE rn = 1)
        SELECT doc_id,
               doc_id || '_entity_' || CAST(k AS VARCHAR) AS entity_id,
               name, {tcase} AS entity_type, confidence
        FROM ded
        WHERE confidence >= 0.3 AND strlen(name) >= 2 AND trim(name) <> ''
    """


def _corpus_concepts_sql(query: str = "corpus_concepts") -> str:
    """Document-concept oracle (``collection_processor.rs:265-310``):
    concept text, context window, ids and constants re-derived from the
    staged match positions + raw collection text."""
    docs = _staged_sql(query, "docs")
    pos = _staged_sql(query, "pos")
    return f"""
        WITH docs AS MATERIALIZED (SELECT * FROM {docs}),
        pos AS (SELECT * FROM {pos}),
        o AS (SELECT doc_id, pattern_idx, "start", "length",
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY pattern_idx, "start") - 1 AS k
              FROM pos)
        SELECT o.doc_id,
               'concept_' || o.doc_id || '_' || CAST(o.k AS VARCHAR)
                 AS concept_id,
               substring(d.text, o."start" + 1, o."length") AS text,
               substring(d.text, greatest(o."start" - 50, 0) + 1, 100)
                 AS context,
               1::BIGINT AS frequency, 0.7 AS confidence,
               o.pattern_idx, o."start", o."length"
        FROM o JOIN docs d USING (doc_id)
    """


def _corpus_concept_clusters_sql() -> str:
    """Concept-cluster oracle (``collection_processor.rs:313-352``):
    canonical = lower(trim(text)), members in (doc, pattern, match)
    scan order, ids by sorted canonical text, hardcoded constants."""
    docs = _staged_sql("corpus_concept_clusters", "docs")
    pos = _staged_sql("corpus_concept_clusters", "pos")
    return f"""
        WITH docs AS MATERIALIZED (SELECT * FROM {docs}),
        pos AS (SELECT * FROM {pos}),
        c AS (SELECT p.doc_id, p.pattern_idx, p."start",
                lower(trim(substring(d.text, p."start" + 1, p."length")))
                  AS canon,
                'concept_' || p.doc_id || '_' || CAST(
                  row_number() OVER (PARTITION BY p.doc_id
                      ORDER BY p.pattern_idx, p."start") - 1 AS VARCHAR)
                  AS concept_id
              FROM pos p JOIN docs d USING (doc_id)),
        g AS (SELECT canon AS canonical_text,
                string_agg(concept_id, ','
                    ORDER BY doc_id, pattern_idx, "start")
                  AS member_concept_ids,
                count(*)::BIGINT AS n_members
              FROM c GROUP BY canon)
        SELECT 'cluster_' || CAST(row_number() OVER (
                 ORDER BY canonical_text) - 1 AS VARCHAR) AS cluster_id,
               canonical_text, member_concept_ids, n_members,
               1::BIGINT AS document_frequency,
               1::BIGINT AS total_mentions, 0.8 AS confidence
        FROM g
    """


def _corpus_cluster_ctes(query: str) -> str:
    """Shared corpus-KG CTEs: staged flat entities + assignments →
    per-cluster attributes (canonical-name vote, confidence, document
    frequency — ``entity_linker.rs`` semantics re-derived, same shapes
    as ``_entity_clusters_sql``)."""
    flat = _staged_sql(query, "flat")
    asg = _staged_sql(query, "asg")
    return f"""
        flat AS MATERIALIZED (SELECT * FROM {flat}),
        asg AS MATERIALIZED (SELECT * FROM {asg}),
        m AS MATERIALIZED (
          SELECT a.doc_id, a.local_entity_id, a.cluster_id, a.kind,
                 a.cluster_ord, a.member_idx, f.name
          FROM asg a JOIN flat f USING (doc_id, local_entity_id)),
        fcnt AS (SELECT cluster_id, name, count(*) AS cnt FROM m
                 WHERE kind = 'fuzzy' GROUP BY cluster_id, name),
        fcan AS (SELECT cluster_id, name AS cn FROM (
            SELECT cluster_id, name, row_number() OVER (
                PARTITION BY cluster_id
                ORDER BY cnt DESC, length(name) DESC, name DESC) AS rn
            FROM fcnt) WHERE rn = 1),
        cl AS (
          SELECT m.cluster_id, m.kind, m.cluster_ord,
                 count(*) AS n_members,
                 CASE WHEN m.kind = 'exact' THEN 1.0 ELSE 0.85 END
                   AS conf,
                 CASE WHEN m.kind = 'exact' THEN count(*) ELSE 1 END
                   AS df,
                 coalesce(max(fc.cn), max(m.name)) AS cn
          FROM m LEFT JOIN fcan fc ON fc.cluster_id = m.cluster_id
          GROUP BY m.cluster_id, m.kind, m.cluster_ord)
    """


_IMP_SQL = ("((ln({df}) + 1.0) * 0.4 + (ln({tm}) + 1.0) * 0.3 "
            "+ {nsd} * 0.3) / 3.0")


def _corpus_kg_entities_sql() -> str:
    """GlobalEntity oracle (``knowledge_graph.rs:148-184,256-290``)."""
    et = _ETYPE_SQL.replace("{cn}", "cl.cn")
    imp = _IMP_SQL.format(df="cl.df", tm="cl.n_members", nsd="d2.nsd")
    return f"""
        WITH {_corpus_cluster_ctes("corpus_kg_entities")},
        d2 AS (SELECT cluster_id,
                 string_agg(DISTINCT doc_id, ',' ORDER BY doc_id) AS sd,
                 count(DISTINCT doc_id) AS nsd
               FROM m GROUP BY cluster_id),
        al AS (SELECT cluster_id,
                 string_agg(DISTINCT name, ',' ORDER BY name) AS a
               FROM m GROUP BY cluster_id)
        SELECT cl.cluster_id AS id, cl.cn AS canonical_name,
               {et} AS entity_type,
               cl.df::BIGINT AS document_frequency,
               cl.n_members::BIGINT AS total_mentions,
               al.a AS aliases, d2.sd AS source_documents,
               d2.nsd::BIGINT AS n_source_docs,
               cl.conf AS confidence_score,
               round({imp}, 8) AS importance_score
        FROM cl
        JOIN d2 ON d2.cluster_id = cl.cluster_id
        JOIN al ON al.cluster_id = cl.cluster_id
    """


def _corpus_rel_ctes(query: str) -> str:
    """Pair CTEs for co-occurrence relations
    (``knowledge_graph.rs:186-254``): per-document member lists in
    cluster order, ordered i<j pairs (self-pairs included), grouped by
    (source, target) with first-occurrence scan position."""
    return f"""
        {_corpus_cluster_ctes(query)},
        mm AS (SELECT doc_id, cluster_id,
                 row_number() OVER (PARTITION BY doc_id
                     ORDER BY cluster_ord, member_idx) AS ord
               FROM asg),
        p AS (SELECT a.doc_id, a.cluster_id AS s, b.cluster_id AS t,
                a.ord AS i, b.ord AS j,
                row_number() OVER (ORDER BY a.doc_id, a.ord, b.ord) AS pp
              FROM mm a
              JOIN mm b ON b.doc_id = a.doc_id AND b.ord > a.ord),
        g AS (SELECT s, t, count(*)::BIGINT AS document_frequency,
                least(0.7 + 0.1 * (count(*) - 1), 1.0) AS conf,
                string_agg(doc_id, ',' ORDER BY doc_id, i, j)
                  AS source_documents,
                min(pp) AS fp
              FROM p GROUP BY s, t)
    """


def _corpus_kg_relations_sql() -> str:
    return f"""
        WITH {_corpus_rel_ctes("corpus_kg_relations")}
        SELECT 'rel_' || CAST(row_number() OVER (ORDER BY fp) - 1
                 AS VARCHAR) AS id,
               s AS source_entity_id, t AS target_entity_id,
               'co_occurs' AS relation_type, round(conf, 8) AS confidence,
               document_frequency, source_documents
        FROM g
    """


def _corpus_stats_sql() -> str:
    """CorpusStats + QualityMetrics + GraphStats oracle
    (``collection_processor.rs:58-102``, ``knowledge_graph.rs:293-336``)
    — every count, ratio and weighted score recomputed from the staged
    docs/flat/assignment tables."""
    docs = _staged_sql("corpus_stats", "docs")
    return f"""
        WITH {_corpus_rel_ctes("corpus_stats")},
        nd AS (SELECT count(*)::BIGINT AS n FROM {docs}),
        ne AS (SELECT count(*)::BIGINT AS n FROM flat),
        gc AS (SELECT count(*)::BIGINT AS n,
                 coalesce(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END), 0)::BIGINT
                   AS xd,
                 avg(conf) AS ec
               FROM cl),
        rl AS (SELECT count(*)::BIGINT AS nr, avg(conf) AS rc FROM g),
        s AS (SELECT
            (SELECT n FROM nd) AS nd, (SELECT n FROM ne) AS ne,
            (SELECT n FROM gc) AS n, (SELECT xd FROM gc) AS xd,
            coalesce((SELECT ec FROM gc), 0.0) AS ec,
            (SELECT nr FROM rl) AS nr,
            coalesce((SELECT rc FROM rl), 0.0) AS rc),
        r AS (SELECT s.*,
                CASE WHEN ne > 0 THEN xd::DOUBLE / ne ELSE 0.0 END
                  AS ratio
              FROM s)
        SELECT nd AS documents_processed,
               ne AS total_entities_extracted,
               n AS unique_entities_after_linking,
               round(ratio, 8) AS cross_document_entity_ratio,
               round(CASE WHEN nd > 0 THEN ne::DOUBLE / nd ELSE 0.0 END, 8)
                 AS avg_entities_per_document,
               0.0 AS avg_relations_per_document,
               round(ec, 8) AS entity_confidence_avg,
               round(rc, 8) AS relation_confidence_avg,
               round(ratio, 8) AS cross_document_consistency,
               round(ec * 0.3 + rc * 0.3 + ratio * 0.4, 8)
                 AS overall_quality_score,
               n AS total_entities, nr AS total_relations,
               xd AS cross_document_entities,
               n - xd AS single_document_entities,
               n AS largest_component_size,
               round(CASE WHEN n > 0 THEN 2.0 * nr / n ELSE 0.0 END, 8)
                 AS avg_entity_connections,
               round(CASE WHEN n > 1 AND (n * (n - 1)) // 2 > 0
                     THEN nr::DOUBLE / ((n * (n - 1)) // 2)
                     ELSE 0.0 END, 8) AS graph_density
        FROM r
    """


def _corpus_search_sql(term: str = "hampton", top_k: int = 10) -> str:
    """KG text-query oracle (``knowledge_graph.rs:348-370,402-407``):
    member-name substring match (aliases = member names, canonical is
    always one of them), importance sort with pinned id tie-break."""
    imp = _IMP_SQL.format(df="cl.df", tm="cl.n_members", nsd="d2.nsd")
    return f"""
        WITH {_corpus_cluster_ctes("corpus_search")},
        d2 AS (SELECT cluster_id, count(DISTINCT doc_id) AS nsd
               FROM m GROUP BY cluster_id),
        hit AS (SELECT cluster_id FROM m GROUP BY cluster_id
                HAVING bool_or(contains(lower(name), '{term}'))),
        imp AS (SELECT cl.cluster_id AS id, cl.cn AS canonical_name,
                  {imp} AS imp
                FROM cl JOIN d2 ON d2.cluster_id = cl.cluster_id)
        SELECT id, canonical_name, round(imp, 8) AS importance_score
        FROM imp JOIN hit ON hit.cluster_id = imp.id
        ORDER BY imp DESC, id ASC LIMIT {top_k}
    """


# ------------------------------------------- document-structure SQL --


def _doc_structure_ctes(query: str) -> str:
    """Shared replay CTEs: staged markdown text → headings (line scan
    with cumulative character offsets), sections (content ranges),
    stack parents (nearest preceding smaller level — equivalent to the
    reference's stack pop), and depth/path via a recursive walk."""
    docs = _staged_sql(query, "docs")
    return f"""
        docs AS MATERIALIZED (SELECT * FROM {docs}),
        l0 AS (SELECT doc_id, string_split(text, chr(10)) AS lst
               FROM docs),
        l AS (SELECT doc_id, unnest(lst) AS line,
                unnest(range(1, len(lst) + 1)) AS pos
              FROM l0),
        lo AS (SELECT doc_id, line, pos, trim(line) AS t,
                 coalesce(sum(length(line) + 1) OVER (
                     PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS off
               FROM l),
        h0 AS (SELECT doc_id, line, pos, t, off,
                 length(t) - length(ltrim(t, '#')) AS lvl
               FROM lo WHERE starts_with(t, '#')),
        h AS (SELECT doc_id, line, pos, off, lvl,
                trim(substring(t, lvl + 1)) AS htext
              FROM h0
              WHERE lvl BETWEEN 1 AND 6
                AND substring(t, lvl + 1, 1) = ' '
                AND trim(substring(t, lvl + 1)) <> ''),
        sec AS MATERIALIZED (
          SELECT h.doc_id,
                 row_number() OVER (PARTITION BY h.doc_id
                                    ORDER BY h.pos) - 1 AS idx,
                 h.lvl AS level, h.htext,
                 h.off AS start_offset,
                 h.off + length(h.line) AS end_offset,
                 h.pos - 1 AS line_number,
                 h.off + length(h.line) AS content_start,
                 coalesce(lead(h.off) OVER (PARTITION BY h.doc_id
                                            ORDER BY h.pos),
                          dl.n) AS content_end
          FROM h JOIN (SELECT doc_id, length(text) AS n FROM docs) dl
                 USING (doc_id)),
        par AS (SELECT i.doc_id, i.idx, max(j.idx) AS parent_idx
                FROM sec i JOIN sec j
                  ON j.doc_id = i.doc_id AND j.idx < i.idx
                 AND j.level < i.level
                GROUP BY i.doc_id, i.idx),
        s2 AS MATERIALIZED (
          SELECT sec.*, par.parent_idx
          FROM sec LEFT JOIN par USING (doc_id, idx)),
        walk AS (
          SELECT doc_id, idx, 0 AS depth, htext AS path
          FROM s2 WHERE parent_idx IS NULL
          UNION ALL
          SELECT s.doc_id, s.idx, w.depth + 1,
                 w.path || ' > ' || s.htext
          FROM s2 s JOIN walk w
            ON w.doc_id = s.doc_id AND w.idx = s.parent_idx)
    """


def _doc_structure_sql() -> str:
    return f"""
        WITH RECURSIVE {_doc_structure_ctes("doc_structure")},
        ch AS (SELECT doc_id, parent_idx AS idx, count(*)::BIGINT AS n
               FROM s2 WHERE parent_idx IS NOT NULL
               GROUP BY doc_id, parent_idx)
        SELECT s2.doc_id, s2.idx::BIGINT AS idx, s2.level::BIGINT AS level,
               s2.htext AS heading_text,
               s2.start_offset::BIGINT AS start_offset,
               s2.end_offset::BIGINT AS end_offset,
               s2.line_number::BIGINT AS line_number,
               s2.content_start::BIGINT AS content_start,
               s2.content_end::BIGINT AS content_end,
               s2.parent_idx::BIGINT AS parent_idx,
               w.depth::BIGINT AS depth, w.path AS heading_path,
               coalesce(ch.n, 0)::BIGINT AS n_children,
               s2.parent_idx IS NULL AS is_root
        FROM s2
        JOIN walk w USING (doc_id, idx)
        LEFT JOIN ch USING (doc_id, idx)
    """


def _doc_structure_stats_sql() -> str:
    lvls = ",\n               ".join(
        f"coalesce(sum(CASE WHEN s2.level = {k} THEN 1 ELSE 0 END), 0)"
        f"::BIGINT AS level_{k}" for k in range(1, 7))
    return f"""
        WITH RECURSIVE {_doc_structure_ctes("doc_structure_stats")},
        sw AS (SELECT s2.doc_id, s2.idx, s2.level, s2.parent_idx, w.depth
               FROM s2 JOIN walk w USING (doc_id, idx))
        SELECT d.doc_id,
               count(s2.idx)::BIGINT AS total_headings,
               count(s2.idx)::BIGINT AS total_sections,
               coalesce(max(s2.depth), 0)::BIGINT AS max_depth,
               coalesce(sum(CASE WHEN s2.idx IS NOT NULL
                            AND s2.parent_idx IS NULL
                            THEN 1 ELSE 0 END), 0)::BIGINT AS root_sections,
               {lvls},
               count(s2.idx) > 0 AS has_structure
        FROM docs d LEFT JOIN sw s2 USING (doc_id)
        GROUP BY d.doc_id
    """


# ------------------------------------------------- LLM-evaluation SQL --


def _llm_evaluation_sql() -> str:
    """Evaluation oracle (``evaluation/mod.rs:164-318``): re-assembles
    the prompt from the staged results + normalized list rows (same
    sequential placeholder replaces, same top-10/10/5 truncations and
    200-char previews), re-derives the deterministic fake-LLM scores
    from length(prompt), and rebuilds the report string — md5s of both
    strings prove byte parity."""
    from graphrag_rs_ray.functions.evaluation import DEFAULT_TEMPLATE
    results = _staged_sql("llm_evaluation", "results")
    lists = _staged_sql("llm_evaluation", "lists")
    # report template with distinct tokens; literal newlines preserved
    rpt = ("## LLM Evaluation Report\n\n"
           "**Overall Score**: {o}/5.0\n\n"
           "### Dimension Scores\n"
           "- Relevance:     {s0}/5 - {r0}\n"
           "- Faithfulness:  {s1}/5 - {r1}\n"
           "- Completeness:  {s2}/5 - {r2}\n"
           "- Coherence:     {s3}/5 - {r3}\n"
           "- Groundedness:  {s4}/5 - {r4}\n\n"
           "### Summary\n{sm}\n\n"
           "### Weakest Dimension\n{wn}: {wr} (score {ws}/5)\n")
    rexpr = "$RPT${r}$RPT$".replace("{r}", rpt)
    for tok, val in (
            ("{o}", "printf('%.2f', overall)"),
            ("{s0}", "s0::VARCHAR"), ("{r0}", "r0"),
            ("{s1}", "s1::VARCHAR"), ("{r1}", "r1"),
            ("{s2}", "s2::VARCHAR"), ("{r2}", "r2"),
            ("{s3}", "s3::VARCHAR"), ("{r3}", "r3"),
            ("{s4}", "s4::VARCHAR"), ("{r4}", "r4"),
            ("{sm}", "summary"), ("{wn}", "wname"), ("{wr}", "wreason"),
            ("{ws}", "wscore::VARCHAR")):
        rexpr = f"replace({rexpr}, '{tok}', {val})"
    pexpr = "$TPL${t}$TPL$".replace("{t}", DEFAULT_TEMPLATE)
    for tok, val in (
            ("{query}", "r.query"), ("{answer}", "r.answer"),
            ("{entities_count}", "r.n_entities::VARCHAR"),
            ("{relationships_count}", "r.n_relationships::VARCHAR"),
            ("{chunks_count}", "r.n_chunks::VARCHAR"),
            ("{entities}", "coalesce(el.s, 'No entities retrieved.')"),
            ("{relationships}",
             "coalesce(rl.s, 'No relationships retrieved.')"),
            ("{chunks}", "coalesce(cl.s, 'No context chunks retrieved.')")):
        pexpr = f"replace({pexpr}, '{tok}', {val})"
    reasons = ",\n            ".join(
        f"'deterministic {dim} assessment (' || s{d}::VARCHAR || '/5)'"
        f" AS r{d}"
        for d, dim in enumerate(("relevance", "faithfulness",
                                 "completeness", "coherence",
                                 "groundedness")))
    return f"""
        WITH res AS MATERIALIZED (SELECT * FROM {results}),
        lst AS MATERIALIZED (SELECT * FROM {lists}),
        el AS (SELECT doc_id, string_agg(
                 '- ' || name || ' (type: ' || etype || ', confidence: '
                 || printf('%.2f', conf) || ')', chr(10) ORDER BY ord) AS s
               FROM lst WHERE kind = 'ent' AND ord < 10 GROUP BY doc_id),
        rl AS (SELECT doc_id, string_agg(
                 '- ' || source || ' --[' || rtype || ']--> ' || target
                 || ' (confidence: ' || printf('%.2f', conf) || ')',
                 chr(10) ORDER BY ord) AS s
               FROM lst WHERE kind = 'rel' AND ord < 10 GROUP BY doc_id),
        cl AS (SELECT doc_id, string_agg(
                 'Chunk ' || (ord + 1)::VARCHAR || ':' || chr(10)
                 || CASE WHEN length(ctext) > 200
                    THEN substring(ctext, 1, 200) || '...' ELSE ctext END
                 || chr(10), chr(10) ORDER BY ord) AS s
               FROM lst WHERE kind = 'chunk' AND ord < 5 GROUP BY doc_id),
        p AS (SELECT r.doc_id, r.strategy, {pexpr} AS prompt
              FROM res r
              LEFT JOIN el ON el.doc_id = r.doc_id
              LEFT JOIN rl ON rl.doc_id = r.doc_id
              LEFT JOIN cl ON cl.doc_id = r.doc_id),
        sc AS (SELECT doc_id, strategy, prompt, length(prompt) AS plen,
                 (1 + ((length(prompt) * 3 + 0) % 5))::BIGINT AS s0,
                 (1 + ((length(prompt) * 4 + 1) % 5))::BIGINT AS s1,
                 (1 + ((length(prompt) * 5 + 4) % 5))::BIGINT AS s2,
                 (1 + ((length(prompt) * 6 + 9) % 5))::BIGINT AS s3,
                 (1 + ((length(prompt) * 7 + 16) % 5))::BIGINT AS s4
               FROM p),
        ag AS (SELECT *,
                 (s0 + s1 + s2 + s3 + s4) / 5.0 AS overall,
                 CASE WHEN s0<=s1 AND s0<=s2 AND s0<=s3 AND s0<=s4
                        THEN 'relevance'
                      WHEN s1<=s2 AND s1<=s3 AND s1<=s4
                        THEN 'faithfulness'
                      WHEN s2<=s3 AND s2<=s4 THEN 'completeness'
                      WHEN s3<=s4 THEN 'coherence'
                      ELSE 'groundedness' END AS wname,
                 least(s0, s1, s2, s3, s4)::BIGINT AS wscore,
                 {reasons},
                 'Automated sandbox evaluation via ' || strategy
                   || ' retrieval.' AS summary
               FROM sc),
        fin AS (SELECT *,
                  CASE wname WHEN 'relevance' THEN r0
                    WHEN 'faithfulness' THEN r1
                    WHEN 'completeness' THEN r2
                    WHEN 'coherence' THEN r3 ELSE r4 END AS wreason
                FROM ag)
        SELECT doc_id, strategy, plen::BIGINT AS prompt_chars,
               md5(prompt) AS prompt_md5,
               s0 AS score_relevance, s1 AS score_faithfulness,
               s2 AS score_completeness, s3 AS score_coherence,
               s4 AS score_groundedness,
               overall AS overall_score, overall >= 3.0 AS passes_3,
               wname AS weakest_dimension, wscore AS weakest_score,
               summary, md5({rexpr}) AS report_md5
        FROM fin
    """


_NS_SQL = """CASE
    WHEN lower(x.name) = lower(y.name) THEN 1.0
    WHEN contains(lower(x.name), lower(y.name))
         OR contains(lower(y.name), lower(x.name)) THEN 0.9
    WHEN len(list_distinct(list_concat(x.ws, y.ws))) = 0 THEN 0.0
    ELSE len(list_intersect(x.ws, y.ws))::DOUBLE
         / len(list_distinct(list_concat(x.ws, y.ws)))::DOUBLE
    END"""

_WS_SQL = ("list_distinct(list_filter(string_split_regex(lower(name), "
           "'\\s+'), w -> w <> ''))")


def _semantic_merge_pairs_sql(threshold: float = 0.7) -> str:
    """Pair-similarity oracle (``semantic_merging.rs:209-236,519-541``):
    exact/containment/word-Jaccard name similarity over ALL entity
    pairs (a < b), + 0.3 type term, strictly-above-threshold filter."""
    ents = _staged_sql("semantic_merge_pairs", "ents")
    return f"""
        WITH e AS MATERIALIZED (
          SELECT entity_id, name, type, {_WS_SQL} AS ws FROM {ents})
        SELECT a, b, round(ns, 8) AS name_sim,
               round(ns * 0.7 + ts * 0.3, 8) AS sim
        FROM (SELECT x.entity_id AS a, y.entity_id AS b,
                     {_NS_SQL} AS ns,
                     CASE WHEN x.type = y.type THEN 1.0 ELSE 0.0 END
                       AS ts
              FROM e x JOIN e y ON x.entity_id < y.entity_id)
        WHERE ns * 0.7 + ts * 0.3 > {threshold}
    """


def _semantic_merge_groups_sql() -> str:
    """Group-decision oracle (``semantic_merging.rs:133-185,238-273,
    333-378``): mean pairwise name similarity per staged group, the
    same-type gate, >0.8 merge decision with printf reasoning,
    last-maximal best name, member-order descriptions, merged
    confidence/mention arithmetic."""
    ents = _staged_sql("semantic_merge_groups", "ents")
    asg = _staged_sql("semantic_merge_groups", "groups")
    return f"""
        WITH e AS (SELECT entity_id, name, type, conf, mention_count,
                          {_WS_SQL} AS ws
                   FROM {ents}),
        m AS MATERIALIZED (
          SELECT a.group_id, a.member_idx, e.* FROM {asg} a
          JOIN e USING (entity_id)),
        pair AS (SELECT x.group_id, {_NS_SQL} AS ns
                 FROM m x JOIN m y ON x.group_id = y.group_id
                       AND x.member_idx < y.member_idx),
        gsim AS (SELECT group_id, sum(ns) / count(*) AS mns FROM pair
                 GROUP BY group_id),
        gt AS (SELECT group_id, count(*)::BIGINT AS n,
                      count(DISTINCT type) = 1 AS same,
                      sum(conf) / count(*) AS avgc,
                      sum(mention_count)::BIGINT AS mm
               FROM m GROUP BY group_id),
        best AS (SELECT group_id, name FROM (
                   SELECT group_id, name, row_number() OVER (
                     PARTITION BY group_id
                     ORDER BY length(name) DESC, conf DESC,
                              member_idx DESC) AS rn FROM m)
                 WHERE rn = 1),
        descr AS (SELECT group_id, string_agg(
                    CASE WHEN mention_count > 0
                         THEN 'Entity ''' || name ||
                              ''' mentioned in context'
                         ELSE 'Entity ''' || name || ''' of type ' ||
                              type END,
                    '; ' ORDER BY member_idx) AS d
                  FROM m GROUP BY group_id)
        SELECT g.group_id, g.n AS n_entities,
               (CASE WHEN g.same AND s.mns > 0.8 THEN 1 ELSE 0
                END)::BIGINT AS should_merge,
               round(CASE WHEN NOT g.same THEN 1.0
                          WHEN s.mns > 0.8 THEN s.mns
                          ELSE 1.0 - s.mns END, 8) AS confidence,
               CASE WHEN NOT g.same THEN 'Different entity types'
                    WHEN s.mns > 0.8 THEN printf(
                      'High name similarity (%.2f) and matching types',
                      s.mns)
                    ELSE printf('Low name similarity (%.2f)', s.mns)
               END AS reasoning,
               CASE WHEN g.same AND s.mns > 0.8 THEN b.name ELSE ''
               END AS merged_name,
               CASE WHEN g.same AND s.mns > 0.8 THEN d.d ELSE ''
               END AS merged_description,
               CASE WHEN g.same AND s.mns > 0.8
                    THEN round(greatest(g.avgc, s.mns), 8) ELSE 0.0
               END AS merged_confidence,
               (CASE WHEN g.same AND s.mns > 0.8 THEN g.mm ELSE 0
                END)::BIGINT AS merged_mentions
        FROM gt g JOIN gsim s USING (group_id)
             JOIN best b USING (group_id) JOIN descr d USING (group_id)
    """


def _adaptive_fusion_sql(rps: int = 10) -> str:
    """Adaptive-fusion oracle (``adaptive.rs:56-254`` +
    ``retrieval/mod.rs:600-650``): the query type re-derived from the
    staged entity names (mutual-substring key-entity rule; the
    abstract/question predicates fold to literals — the word lists are
    query constants), weights CASE-selected per cohort with the
    below-0.6 balanced fallback, then trunc(10·w) truncation, ×w
    weighting, keep-max dedup and score-desc ranking replayed from the
    four staged shortlists."""
    from graphrag_rs_ray.functions.adaptive_retrieval import (
        ABSTRACT_INDICATORS, QUESTION_WORDS)

    ents = _staged_sql("adaptive_fusion", "ents")
    ce = _staged_sql("adaptive_fusion", "chunkents")
    tabs = {k: _staged_sql("adaptive_fusion", k)
            for k in ("vec", "grf", "hier", "bm")}
    wcase = {"vw": ("0.2", "0.2", "0.6", "0.2"),
             "gw": ("0.6", "0.5", "0.1", "0.1"),
             "hw": ("0.1", "0.2", "0.3", "0.1"),
             "bw": ("0.1", "0.1", "0.0", "0.6")}

    parts = [f"""
        WITH ents AS MATERIALIZED (SELECT name FROM {ents}),
        ce AS MATERIALIZED (SELECT chunk_id, entities FROM {ce}),
        vec AS (SELECT * FROM {tabs['vec']}),
        grf AS (SELECT * FROM {tabs['grf']}),
        hier AS (SELECT * FROM {tabs['hier']}),
        bm AS (SELECT * FROM {tabs['bm']})"""]
    for qid, qtext in _ADAPTIVE_QUERIES:
        words = qtext.lower().split()
        wl = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        has_abs = any(w in ABSTRACT_INDICATORS for w in words)
        has_q = any(w in QUESTION_WORDS for w in words)
        fallback = ("'conceptual'" if has_abs
                    else ("'exploratory'" if has_q else "'factual'"))
        parts.append(f""",
        kent_{qid} AS MATERIALIZED (
          SELECT count(*)::BIGINT AS n FROM ents e
          WHERE len(list_filter({wl},
                w -> contains(lower(e.name), w)
                     OR contains(w, lower(e.name)))) > 0),
        qt_{qid} AS MATERIALIZED (SELECT CASE
            WHEN (SELECT n FROM kent_{qid}) > 1 THEN 'relationship'
            WHEN (SELECT n FROM kent_{qid}) = 1 THEN 'entity_focused'
            ELSE {fallback} END AS qt)""")
    outs = []
    for cohort, qid, conf in _ADAPTIVE_COHORTS:
        wexprs = {}
        for wname, (rel, ent, con, fac) in wcase.items():
            wexprs[wname] = (
                f"CASE WHEN {conf} < 0.6 THEN 0.25 ELSE "
                f"CASE (SELECT qt FROM qt_{qid}) "
                f"WHEN 'relationship' THEN {rel} "
                f"WHEN 'entity_focused' THEN {ent} "
                f"WHEN 'conceptual' THEN {con} "
                f"WHEN 'factual' THEN {fac} ELSE 0.25 END END")
        parts.append(f""",
        wts_{cohort} AS MATERIALIZED (
                        SELECT {wexprs['vw']} AS vw,
                                {wexprs['gw']} AS gw,
                                {wexprs['hw']} AS hw,
                                {wexprs['bw']} AS bw),
        sel_{cohort} AS MATERIALIZED (
          SELECT id, score * (SELECT vw FROM wts_{cohort}) AS ws
          FROM vec WHERE query_id = '{qid}'
            AND rank < trunc({rps}.0 * (SELECT vw FROM wts_{cohort}))
          UNION ALL
          SELECT id, score * (SELECT gw FROM wts_{cohort})
          FROM grf WHERE query_id = '{qid}'
            AND rank < trunc({rps}.0 * (SELECT gw FROM wts_{cohort}))
          UNION ALL
          SELECT id, score * (SELECT hw FROM wts_{cohort})
          FROM hier WHERE query_id = '{qid}'
            AND rank < trunc({rps}.0 * (SELECT hw FROM wts_{cohort}))
          UNION ALL
          SELECT id, score * (SELECT bw FROM wts_{cohort})
          FROM bm WHERE query_id = '{qid}'
            AND rank < trunc({rps}.0 * (SELECT bw FROM wts_{cohort}))),
        ded_{cohort} AS (SELECT id, max(ws) AS ws FROM sel_{cohort}
                         GROUP BY id)""")
        outs.append(f"""
        SELECT '{cohort}' AS cohort,
               row_number() OVER (ORDER BY d.ws DESC, d.id) AS rank,
               d.id, round(d.ws, 8) AS score,
               coalesce(c.entities, '') AS entities,
               (SELECT qt FROM qt_{qid}) AS query_type,
               {conf} AS confidence,
               (SELECT vw FROM wts_{cohort}) AS vw,
               (SELECT gw FROM wts_{cohort}) AS gw,
               (SELECT hw FROM wts_{cohort}) AS hw,
               (SELECT bw FROM wts_{cohort}) AS bw,
               (SELECT count(*)::BIGINT FROM sel_{cohort})
                 AS total_before_fusion
        FROM ded_{cohort} d LEFT JOIN ce c ON d.id = c.chunk_id""")
    return "".join(parts) + "\n        UNION ALL\n".join(outs)


def _enriched_search_sql(kw_w: float = 0.3, st_w: float = 0.2,
                         sum_w: float = 0.15, min_m: int = 1) -> str:
    """Enriched-retrieval oracle (``enriched.rs:85-143`` +
    ``core/metadata.rs:166-200``): gate (entities OR keywords), keyword
    / structure / summary / completeness boosts and the min-1 clamp
    replayed from the staged chunk-metadata, mention and base tables;
    query words and structure refs are constant-folded from the fixed
    query (their extraction is unit-gated)."""
    from graphrag_rs_ray.functions.enriched_retrieval import (
        extract_structure_references, query_words)

    ch = _staged_sql("enriched_search", "chunks")
    men = _staged_sql("enriched_search", "mentions")
    base = _staged_sql("enriched_search", "base")
    qw = sorted(query_words(_ENRICHED_QUERY))
    refs = extract_structure_references(_ENRICHED_QUERY.lower())
    qset = "[" + ", ".join(f"'{w}'" for w in qw) + "]"
    maxqw = float(max(len(qw), 1))
    sumthr = max(len(qw) // 2, 1)
    sparts = []
    for ref in refs:
        for field, pts in (("chapter", 0.5), ("section", 0.3),
                           ("subsection", 0.2)):
            sparts.append(f"(CASE WHEN c.{field} IS NOT NULL AND "
                          f"contains(lower(c.{field}), '{ref}') "
                          f"THEN {pts} ELSE 0.0 END)")
    sraw = " + ".join(sparts) if sparts else "0.0"
    return f"""
        WITH ch AS MATERIALIZED (SELECT * FROM {ch}),
        ent AS (SELECT chunk_id,
                       string_agg(DISTINCT name, ',' ORDER BY name)
                         AS entities
                FROM {men} GROUP BY chunk_id),
        b AS (SELECT id AS chunk_id, score FROM {base}),
        scored AS (
          SELECT c.chunk_id, coalesce(b.score, 0.5) AS base_score,
                 coalesce(e.entities, '') AS entities,
                 len(list_filter(c.keywords,
                     k -> list_contains({qset}, lower(k)))) AS kmatch,
                 {sraw} AS sraw,
                 CASE WHEN c.summary IS NOT NULL AND
                      len(list_filter({qset},
                          w -> contains(lower(c.summary), w)))
                        >= {sumthr}
                      THEN 1 ELSE 0 END AS summ,
                 (CASE WHEN c.chapter IS NOT NULL THEN 2.0 ELSE 0.0 END
                  + CASE WHEN c.section IS NOT NULL THEN 1.0
                         ELSE 0.0 END
                  + CASE WHEN c.subsection IS NOT NULL THEN 1.0
                         ELSE 0.0 END
                  + CASE WHEN len(c.keywords) > 0 THEN 1.0 ELSE 0.0 END
                  + CASE WHEN c.summary IS NOT NULL THEN 1.0
                         ELSE 0.0 END
                  + CASE WHEN c.structural_level IS NOT NULL THEN 1.0
                         ELSE 0.0 END
                  + CASE WHEN c.position_in_document IS NOT NULL
                         THEN 1.0 ELSE 0.0 END) / 9.0 AS comp
          FROM ch c LEFT JOIN b USING (chunk_id)
                    LEFT JOIN ent e ON c.chunk_id = e.chunk_id
          WHERE e.entities IS NOT NULL OR len(c.keywords) > 0),
        boosted AS (
          SELECT chunk_id, base_score, entities,
                 (CASE WHEN kmatch >= {min_m}
                       THEN (kmatch::DOUBLE / {maxqw}) * {kw_w}
                       ELSE 0.0 END
                  + CASE WHEN sraw > 0.0 THEN sraw * {st_w}
                         ELSE 0.0 END
                  + CASE WHEN summ = 1 THEN {sum_w} ELSE 0.0 END
                  + CASE WHEN comp > 0.7 THEN 0.05 ELSE 0.0 END)
                   AS boost
          FROM scored)
        SELECT chunk_id, round(least(base_score + boost, 1.0), 8)
                 AS score,
               base_score, round(boost, 8) AS boost, entities
        FROM boosted WHERE boost > 0.05
    """


def _hybrid_fusion_sql(sw: float = 0.7, kw_w: float = 0.3,
                       rrf_k: float = 60.0, thr: float = 0.1,
                       limit: int = 15) -> str:
    """Hybrid-fusion oracle (``hybrid.rs:230-427``): each method
    replayed as a FULL JOIN of the staged shortlists — RRF from the
    staged 0-based ranks, Weighted from per-list MAX normalization,
    CombSUM raw sums, MaxScore with the 0.0-default max quirk;
    threshold on the UNROUNDED combined score (mirroring the kernel),
    round-8 outputs, score-desc/id-asc truncation per method."""
    sem = _staged_sql("hybrid_fusion", "sem")
    kw = _staged_sql("hybrid_fusion", "kw")
    base = f"""
        WITH sem AS MATERIALIZED (SELECT id, score, content, rank
                                  FROM {sem}),
        kw AS MATERIALIZED (SELECT id, score, content, rank FROM {kw}),
        mx AS (SELECT (SELECT max(score) FROM sem) AS ms,
                      (SELECT max(score) FROM kw) AS mk)
    """
    combined = {
        "rrf": (f"coalesce((1.0 / ({rrf_k} + s.rank + 1.0)) * {sw}, 0.0)"
                f" + coalesce((1.0 / ({rrf_k} + k.rank + 1.0)) * {kw_w},"
                f" 0.0)"),
        "weighted": (
            f"coalesce((CASE WHEN (SELECT ms FROM mx) > 0.0 THEN"
            f" s.score / (SELECT ms FROM mx) ELSE 0.0 END) * {sw}, 0.0)"
            f" + coalesce((CASE WHEN (SELECT mk FROM mx) > 0.0 THEN"
            f" k.score / (SELECT mk FROM mx) ELSE 0.0 END) * {kw_w},"
            f" 0.0)"),
        "combsum": "coalesce(s.score, 0.0) + coalesce(k.score, 0.0)",
        "maxscore": ("CASE WHEN s.id IS NULL THEN greatest(0.0, k.score) "
                     "WHEN k.id IS NULL THEN s.score "
                     "ELSE greatest(s.score, k.score) END"),
    }
    blocks = []
    for method, expr in combined.items():
        t = 0.0 if method == "rrf" else thr
        blocks.append(f"""
        (SELECT '{method}' AS method, id, content,
                round(raw, 8) AS score,
                round(semantic_score, 8) AS semantic_score,
                round(keyword_score, 8) AS keyword_score,
                CASE WHEN id LIKE 'entity:%' THEN 'entity'
                     WHEN id LIKE 'chunk:%' THEN 'chunk'
                     ELSE 'hybrid' END AS result_type,
                CASE WHEN id LIKE 'entity:%' THEN content
                     ELSE '' END AS entities,
                id AS source_chunks
         FROM (SELECT coalesce(s.id, k.id) AS id,
                      coalesce(k.content, s.content) AS content,
                      {expr} AS raw,
                      coalesce(s.score, 0.0) AS semantic_score,
                      coalesce(k.score, 0.0) AS keyword_score
               FROM sem s FULL JOIN kw k ON s.id = k.id)
         WHERE raw >= {t}
         ORDER BY round(raw, 8) DESC, id ASC
         LIMIT {limit})""")
    return base + "\n        " + "\n        UNION ALL\n".join(blocks)


def _query_plans_sql() -> str:
    """Query-optimizer oracle (``query/optimizer.rs:100-484``): the two
    staged type histograms → scalar counts → every cost formula
    (trunc = the reference's ``as usize``, integer ×9//10 union
    arithmetic, powi as repeated multiply) and every optimizer decision
    (strict-> swap; greedy strict-< first-found pair choice) re-derived
    as SQL predicates; plan strings are CASE-selected literals."""
    et = _staged_sql("query_plans", "etypes")
    rt = _staged_sql("query_plans", "rtypes")

    lits = {"P": "EntityScan(PERSON)", "O": "EntityScan(ORGANIZATION)",
            "L": "EntityScan(LOCATION)"}
    cards = {"P": "np", "O": "no_", "L": "nl"}

    # ---- q05 branch enumeration (rewrite swaps × greedy pair choice) --
    ci_in = "trunc(sqrt(np*no_))"
    q05 = []          # (predicate, ci, cj, ck, plan_literal)
    for sp1 in (False, True):
        inner = ("O", "P") if sp1 else ("P", "O")
        p1 = "np > no_" if sp1 else "NOT (np > no_)"
        for sp2 in (False, True):
            order = (["L", *inner] if sp2 else [*inner, "L"])
            p2 = f"{ci_in} > nl" if sp2 else f"NOT ({ci_in} > nl)"
            cx, cy, cz = (cards[t] for t in order)
            p01, p02, p12 = f"{cx}*{cy}", f"{cx}*{cz}", f"{cy}*{cz}"
            for choice, cpred in (
                    ((1, 2), f"{p12} < least({p01}, {p02})"),
                    ((0, 2), f"NOT ({p12} < least({p01}, {p02})) "
                             f"AND {p02} < {p01}"),
                    ((0, 1), f"NOT ({p12} < least({p01}, {p02})) "
                             f"AND NOT ({p02} < {p01})")):
                i, j = choice
                k = ({0, 1, 2} - {i, j}).pop()
                plan = (f"Join[Inner]({lits[order[k]]},"
                        f"Join[Inner]({lits[order[i]]},{lits[order[j]]}))")
                q05.append((f"({p1}) AND ({p2}) AND ({cpred})",
                            cards[order[i]], cards[order[j]],
                            cards[order[k]], plan))

    def case(branches, expr_of):
        return ("CASE " + " ".join(
            f"WHEN {pred} THEN {expr_of(b)}" for b in branches
            for pred in [b[0]]) + " END")

    q05_plan = case(q05, lambda b: f"'{b[4]}'")
    q05_ci = case(q05, lambda b: b[1])
    q05_cj = case(q05, lambda b: b[2])
    q05_ck = case(q05, lambda b: b[3])

    jsw = (f"CASE WHEN np > nl THEN "
           f"'Join[Inner]({lits['L']},{lits['P']})' ELSE "
           f"'Join[Inner]({lits['P']},{lits['L']})' END")
    losw = (f"CASE WHEN np > nl THEN "
            f"'Join[LeftOuter]({lits['L']},{lits['P']})' ELSE "
            f"'Join[LeftOuter]({lits['P']},{lits['L']})' END")
    u12 = (f"CASE WHEN np > nl THEN "
           f"'Union(Join[Inner]({lits['L']},{lits['P']}),"
           f"Limit(5)({lits['O']}))' ELSE "
           f"'Union(Join[Inner]({lits['P']},{lits['L']}),"
           f"Limit(5)({lits['O']}))' END")

    return f"""
        WITH et AS (SELECT type, cnt FROM {et}),
        rt AS (SELECT pred, cnt FROM {rt}),
        sc AS (SELECT
          coalesce((SELECT cnt FROM et WHERE type = 'PERSON'), 0)::DOUBLE
            AS np,
          coalesce((SELECT cnt FROM et
                    WHERE type = 'ORGANIZATION'), 0)::DOUBLE AS no_,
          coalesce((SELECT cnt FROM et WHERE type = 'LOCATION'), 0)::DOUBLE
            AS nl,
          (SELECT sum(cnt) FROM et)::DOUBLE AS te,
          (SELECT sum(cnt) FROM rt)::DOUBLE * 2.0
            / (SELECT sum(cnt) FROM et)::DOUBLE AS dg)

        SELECT 'q01_scan' AS query_id, 'EntityScan(PERSON)' AS plan,
               round(np, 8) AS cost, np::BIGINT AS cardinality,
               round(np / te, 8) AS selectivity FROM sc
        UNION ALL
        SELECT 'q02_filter', 'Filter(name=alice)', round(te, 8),
               trunc(te * 0.1)::BIGINT, 0.1 FROM sc
        UNION ALL
        SELECT 'q03_join_swap', {jsw}, round(np + nl + np * nl, 8),
               trunc(sqrt(np * nl))::BIGINT,
               round((np / te) * (nl / te), 8) FROM sc
        UNION ALL
        SELECT 'q04_join_noswap',
               CASE WHEN nl > np THEN
                 'Join[Inner]({lits["P"]},{lits["L"]})' ELSE
                 'Join[Inner]({lits["L"]},{lits["P"]})' END,
               round(nl + np + nl * np, 8), trunc(sqrt(nl * np))::BIGINT,
               round((nl / te) * (np / te), 8) FROM sc
        UNION ALL
        SELECT 'q05_multiway', {q05_plan},
               round(ck + (ci + cj + ci * cj)
                     + ck * trunc(sqrt(ci * cj)), 8),
               trunc(sqrt(ck * trunc(sqrt(ci * cj))))::BIGINT,
               round((ck / te) * ((ci / te) * (cj / te)), 8)
        FROM (SELECT {q05_ci} AS ci, {q05_cj} AS cj, {q05_ck} AS ck,
                     np, no_, nl, te
              FROM sc)
        UNION ALL
        SELECT 'q06_neighbors2',
               'Neighbors(related_to,hops=2)(EntityScan(PERSON))',
               round(np + trunc(least(np * (dg * dg), te)), 8),
               trunc(least(np * (dg * dg), te))::BIGINT,
               round(trunc(least(np * (dg * dg), te)) / te, 8) FROM sc
        UNION ALL
        SELECT 'q07_union', 'Union({lits["O"]},{lits["L"]})',
               round(no_ + nl, 8),
               (no_::BIGINT + nl::BIGINT) * 9 // 10,
               round(least(no_ / te + nl / te, 1.0), 8) FROM sc
        UNION ALL
        SELECT 'q08_limit',
               CASE WHEN np > no_ THEN
                 'Limit(10)(Join[Inner]({lits["O"]},{lits["P"]}))' ELSE
                 'Limit(10)(Join[Inner]({lits["P"]},{lits["O"]}))' END,
               round(np + no_ + np * no_, 8),
               least(10, trunc(sqrt(np * no_))::BIGINT),
               round(least(10.0 / te, 1.0), 8) FROM sc
        UNION ALL
        SELECT 'q09_cross',
               CASE WHEN no_ > nl THEN
                 'Join[Cross]({lits["L"]},{lits["O"]})' ELSE
                 'Join[Cross]({lits["O"]},{lits["L"]})' END,
               round(no_ + nl + no_ * nl, 8),
               no_::BIGINT * nl::BIGINT,
               round((no_ / te) * (nl / te), 8) FROM sc
        UNION ALL
        SELECT 'q10_leftouter', {losw}, round(np + nl + np * nl, 8),
               CASE WHEN np > nl THEN nl::BIGINT ELSE np::BIGINT END,
               round((np / te) * (nl / te), 8) FROM sc
        UNION ALL
        SELECT 'q11_nbr_filter',
               'Neighbors(*,hops=1)(Filter(type=PERSON))',
               round(te + trunc(least(trunc(te * 0.1) * dg, te)), 8),
               trunc(least(trunc(te * 0.1) * dg, te))::BIGINT,
               round(trunc(least(trunc(te * 0.1) * dg, te)) / te, 8)
        FROM sc
        UNION ALL
        SELECT 'q12_union_joins', {u12},
               round((np + nl + np * nl) + no_, 8),
               (trunc(sqrt(np * nl))::BIGINT
                + least(5, no_::BIGINT)) * 9 // 10,
               round(least((np / te) * (nl / te)
                           + least(5.0 / te, 1.0), 1.0), 8) FROM sc
        ORDER BY query_id
    """


def _pagerank_retrieval_sql(query: str = "university of berlin",
                            n_iter: int = 12, d: float = 0.85,
                            vw: float = 0.3, pw: float = 0.4,
                            min_sim: float = 0.1, bonus: float = 0.3,
                            thr: float = 0.1, max_results: int = 25) -> str:
    """PageRank-retrieval oracle (``pagerank_retrieval.rs:134-330`` +
    ``pagerank.rs:248-358,388-407,536-566``): list-Jaccard similarity
    (duplicate-counting intersection over whitespace-split lowercase
    word LISTS), per-mention chunk-contains bonus, reset = normalized
    vector scores over a uniform-1/n default, the weight-sum-normalized
    PPR recurrence with uniform dangling redistribution (round-8 per
    iteration, both sides), 0.3/0.4 combination + 0.1 threshold, chunk
    expansion with the ``entity_<id>`` fallback, top-``max_results``."""
    ents = _staged_sql("pagerank_retrieval", "ents")
    mts = _staged_sql("pagerank_retrieval", "mentions")
    chs = _staged_sql("pagerank_retrieval", "chunks")
    edges = _staged_sql("pagerank_retrieval", "edges")
    qwords = query.lower().split()
    qlist = "[" + ", ".join(f"'{w}'" for w in qwords) + "]"
    ql = float(len(qwords))
    parts = [f"""
        WITH ents AS MATERIALIZED (
          SELECT entity_id, name, type FROM {ents}),
        e AS MATERIALIZED (SELECT src, dst, w FROM {edges}),
        nn AS (SELECT count(*)::DOUBLE AS n FROM ents),
        ew AS (SELECT entity_id,
                 list_filter(string_split_regex(
                     lower(name || ' ' || type), '\\s+'),
                   x -> x <> '') AS ws
               FROM ents),
        jraw AS (SELECT entity_id,
                   len(list_filter({qlist},
                       w -> list_contains(ws, w)))::DOUBLE AS ic,
                   len(ws)::DOUBLE AS el
                 FROM ew),
        jp AS (SELECT entity_id, ic / ({ql} + el - ic) AS sim FROM jraw
               WHERE ic > 0 AND ic / ({ql} + el - ic) > {min_sim}),
        mchunk AS (SELECT chunk_id FROM {chs}
                   WHERE contains(lower(text), '{query.lower()}')),
        bon AS (SELECT m.entity_id,
                       {bonus} * sum(m.mention_count)::DOUBLE AS bv
                FROM {mts} m JOIN mchunk USING (chunk_id)
                GROUP BY m.entity_id),
        vs AS MATERIALIZED (
          SELECT coalesce(j.entity_id, b.entity_id) AS entity_id,
                 round(coalesce(j.sim, 0.0) + coalesce(b.bv, 0.0), 8) AS v
          FROM jp j FULL JOIN bon b ON j.entity_id = b.entity_id),
        tot AS (SELECT sum(v) AS tv FROM vs),
        reset AS MATERIALIZED (
          SELECT en.entity_id AS node,
                 CASE WHEN v.v IS NOT NULL
                      THEN v.v / (SELECT tv FROM tot)
                      ELSE 1.0 / (SELECT n FROM nn) END AS r
          FROM ents en LEFT JOIN vs v ON en.entity_id = v.entity_id),
        deg AS MATERIALIZED (SELECT src, sum(w) AS wsum FROM e
                             GROUP BY src),
        s0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS score
               FROM reset)"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
        g{i} AS (SELECT coalesce(sum(s.score), 0.0) AS gm FROM s{i - 1} s
                 WHERE s.node NOT IN (SELECT src FROM deg)),
        s{i} AS MATERIALIZED (
          SELECT r.node,
                 round((1.0 - {d}) * r.r + coalesce(c.csum, 0.0)
                       + {d} * (SELECT gm FROM g{i})
                         / (SELECT n FROM nn), 8) AS score
          FROM reset r LEFT JOIN (
            SELECT e.dst AS node,
                   sum({d} * s.score * e.w / dg.wsum) AS csum
            FROM e JOIN s{i - 1} s ON e.src = s.node
                   JOIN deg dg ON e.src = dg.src
            GROUP BY e.dst) c ON r.node = c.node)""")
    parts.append(f""",
        comb AS (SELECT s.node AS entity_id,
                        round({vw} * coalesce(v.v, 0.0)
                              + {pw} * s.score, 8) AS score,
                        coalesce(v.v, 0.0) AS vector_score,
                        s.score AS pagerank_score
                 FROM s{n_iter} s LEFT JOIN vs v ON s.node = v.entity_id
                 WHERE round({vw} * coalesce(v.v, 0.0)
                             + {pw} * s.score, 8) >= {thr}),
        dp AS (SELECT DISTINCT m.entity_id, m.chunk_id FROM {mts} m
               JOIN comb c ON m.entity_id = c.entity_id),
        rws AS (SELECT c.entity_id,
                       coalesce(d.chunk_id,
                                'entity_' || c.entity_id) AS chunk_id,
                       c.score, c.vector_score, c.pagerank_score
                FROM comb c LEFT JOIN dp d ON c.entity_id = d.entity_id)
        SELECT row_number() OVER (
                 ORDER BY score DESC, entity_id, chunk_id) AS rank,
               entity_id, chunk_id, score, vector_score, pagerank_score
        FROM rws
        ORDER BY score DESC, entity_id, chunk_id
        LIMIT {max_results}""")
    return "\n".join(parts)


def _validation_sql() -> str:
    """Pipeline-validation oracle (``evaluation/pipeline_validation.rs``):
    every check/metric row recomputed from the five staged tables with
    the reference's thresholds; ratio values round(…, 8) on both sides
    (count arithmetic is exact)."""
    docs = _staged_sql("pipeline_validation", "docs")
    chunks = _staged_sql("pipeline_validation", "chunks")
    mentions = _staged_sql("pipeline_validation", "mentions")
    ents = _staged_sql("pipeline_validation", "entities")
    tris = _staged_sql("pipeline_validation", "triples")
    return f"""
        WITH perdoc AS (
          SELECT d.doc_id, d.doc_chars,
                 coalesce(c.n_chunks, 0) AS n_chunks,
                 coalesce(c.chunk_chars, 0) AS chunk_chars,
                 coalesce(c.n_empty, 0) AS n_empty,
                 coalesce(c.n_meta, 0) AS n_meta
          FROM {docs} d LEFT JOIN (
            SELECT doc_id, count(*) AS n_chunks,
                   sum(length(text)) AS chunk_chars,
                   sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
                     AS n_empty,
                   sum(CASE WHEN has_metadata THEN 1 ELSE 0 END) AS n_meta
            FROM {chunks} GROUP BY doc_id) c USING (doc_id)),
        dagg AS (SELECT
            count(*) AS n_docs,
            sum(CASE WHEN doc_chars = 0 THEN 1 ELSE 0 END) AS n_empty_docs,
            sum(CASE WHEN n_chunks = 0 THEN 1 ELSE 0 END) AS n_docs_wo,
            sum(CASE WHEN n_chunks > 0 AND chunk_chars::DOUBLE
                          / greatest(doc_chars, 1)::DOUBLE < 0.9
                     THEN 1 ELSE 0 END) AS n_below,
            sum(n_empty) AS n_empty_chunks,
            sum(n_meta) AS n_meta_chunks,
            sum(n_chunks) AS n_chunks,
            sum(chunk_chars) AS chunk_chars,
            sum(doc_chars) AS doc_chars
          FROM perdoc),
        eagg AS (SELECT
            count(*) AS n,
            sum(CASE WHEN conf < 0 OR conf > 1 THEN 1 ELSE 0 END) AS bad_conf,
            sum(CASE WHEN type = '' THEN 1 ELSE 0 END) AS no_type,
            sum(CASE WHEN trim(name) = '' THEN 1 ELSE 0 END) AS no_name,
            sum(conf::DOUBLE) AS conf_sum,
            sum(mention_count) AS mention_sum
          FROM {ents}),
        badm AS (SELECT count(*) AS bad
                 FROM {mentions} m
                 LEFT JOIN (SELECT DISTINCT chunk_id FROM {chunks}) c
                   USING (chunk_id)
                 WHERE c.chunk_id IS NULL),
        ragg AS (SELECT
            count(*) AS n,
            sum(CASE WHEN conf < 0 OR conf > 1 THEN 1 ELSE 0 END) AS bad_conf,
            sum(CASE WHEN pred = '' THEN 1 ELSE 0 END) AS no_type,
            sum(conf::DOUBLE) AS conf_sum
          FROM {tris}),
        orph AS (SELECT count(*) AS o FROM {tris} t
                 WHERE NOT EXISTS (SELECT 1 FROM {ents} e
                                   WHERE e.name = t.subj)
                    OR NOT EXISTS (SELECT 1 FROM {ents} e
                                   WHERE e.name = t.obj))
        SELECT 'Document Processing' AS phase, 'check' AS kind,
               'document_not_empty' AS name, n_empty_docs = 0 AS passed,
               n_empty_docs::DOUBLE AS value FROM dagg
        UNION ALL SELECT 'Document Processing', 'check', 'chunks_created',
               n_docs_wo = 0, n_docs_wo::DOUBLE FROM dagg
        UNION ALL SELECT 'Document Processing', 'check', 'content_coverage',
               n_below = 0, n_below::DOUBLE FROM dagg
        UNION ALL SELECT 'Document Processing', 'check', 'no_empty_chunks',
               n_empty_chunks = 0, n_empty_chunks::DOUBLE FROM dagg
        UNION ALL SELECT 'Document Processing', 'check',
               'metadata_enrichment', true,
               CASE WHEN n_chunks > 0
                    THEN round(n_meta_chunks::DOUBLE / n_chunks, 8)
                    ELSE 0.0 END FROM dagg
        UNION ALL SELECT 'Document Processing', 'metric', 'coverage_ratio',
               true, CASE WHEN doc_chars > 0
                          THEN round(chunk_chars::DOUBLE / doc_chars, 8)
                          ELSE 0.0 END FROM dagg
        UNION ALL SELECT 'Document Processing', 'metric', 'chunks_count',
               true, n_chunks::DOUBLE FROM dagg
        UNION ALL SELECT 'Document Processing', 'metric', 'avg_chunk_size',
               true, CASE WHEN n_chunks > 0
                          THEN round(chunk_chars::DOUBLE / n_chunks, 8)
                          ELSE 0.0 END FROM dagg
        UNION ALL SELECT 'Entity Extraction', 'check', 'entities_extracted',
               n > 0, n::DOUBLE FROM eagg
        UNION ALL SELECT 'Entity Extraction', 'check',
               'confidence_scores_valid', bad_conf = 0, bad_conf::DOUBLE
               FROM eagg
        UNION ALL SELECT 'Entity Extraction', 'check',
               'entity_types_populated', no_type = 0, no_type::DOUBLE
               FROM eagg
        UNION ALL SELECT 'Entity Extraction', 'check', 'entity_names_valid',
               no_name = 0, no_name::DOUBLE FROM eagg
        UNION ALL SELECT 'Entity Extraction', 'check',
               'entity_mentions_valid', bad = 0, bad::DOUBLE FROM badm
        UNION ALL SELECT 'Entity Extraction', 'metric', 'entities_count',
               true, n::DOUBLE FROM eagg
        UNION ALL SELECT 'Entity Extraction', 'metric', 'avg_confidence',
               true, round(conf_sum / n, 8) FROM eagg WHERE n > 0
        UNION ALL SELECT 'Entity Extraction', 'metric',
               'avg_mentions_per_entity', true,
               round(mention_sum::DOUBLE / n, 8) FROM eagg WHERE n > 0
        UNION ALL SELECT 'Relationship Extraction', 'check',
               'relationships_extracted', n > 0, n::DOUBLE FROM ragg
               WHERE (SELECT n FROM eagg) > 0
        UNION ALL SELECT 'Relationship Extraction', 'check',
               'relationship_confidence_valid', bad_conf = 0,
               bad_conf::DOUBLE FROM ragg
        UNION ALL SELECT 'Relationship Extraction', 'check',
               'relationship_types_populated', no_type = 0, no_type::DOUBLE
               FROM ragg
        UNION ALL SELECT 'Relationship Extraction', 'check',
               'relationship_entities_exist', o = 0, o::DOUBLE FROM orph
        UNION ALL SELECT 'Relationship Extraction', 'metric',
               'relationships_count', true, n::DOUBLE FROM ragg
        UNION ALL SELECT 'Relationship Extraction', 'metric',
               'relationships_per_entity', true,
               round(n::DOUBLE / (SELECT n FROM eagg), 8) FROM ragg
               WHERE (SELECT n FROM eagg) > 0
        UNION ALL SELECT 'Relationship Extraction', 'metric',
               'avg_relationship_confidence', true, round(conf_sum / n, 8)
               FROM ragg WHERE n > 0
        UNION ALL SELECT 'Graph Construction', 'check', 'graph_not_empty',
               (SELECT n FROM eagg) > 0 OR (SELECT n_docs FROM dagg) > 0,
               ((SELECT n FROM eagg) + (SELECT n_docs FROM dagg))::DOUBLE
        UNION ALL SELECT 'Graph Construction', 'check',
               'entity_chunk_ratio_reasonable',
               (SELECT n FROM eagg)::DOUBLE / (SELECT n_chunks FROM dagg)
                 BETWEEN 0.1 AND 10.0,
               round((SELECT n FROM eagg)::DOUBLE
                     / (SELECT n_chunks FROM dagg), 8)
               WHERE (SELECT n_chunks FROM dagg) > 0
        UNION ALL SELECT 'Graph Construction', 'check', 'graph_connectivity',
               (SELECT n FROM ragg)::DOUBLE / (SELECT n FROM eagg) > 0.1,
               round((SELECT n FROM ragg)::DOUBLE / (SELECT n FROM eagg), 8)
               WHERE (SELECT n FROM eagg) > 1
        UNION ALL SELECT 'Graph Construction', 'metric', 'documents', true,
               (SELECT n_docs FROM dagg)::DOUBLE
        UNION ALL SELECT 'Graph Construction', 'metric', 'chunks', true,
               (SELECT n_chunks FROM dagg)::DOUBLE
        UNION ALL SELECT 'Graph Construction', 'metric', 'entities', true,
               (SELECT n FROM eagg)::DOUBLE
        UNION ALL SELECT 'Graph Construction', 'metric', 'relationships',
               true, (SELECT n FROM ragg)::DOUBLE
        UNION ALL SELECT 'Graph Construction', 'metric',
               'entities_per_chunk', true,
               round((SELECT n FROM eagg)::DOUBLE
                     / (SELECT n_chunks FROM dagg), 8)
               WHERE (SELECT n_chunks FROM dagg) > 0
        UNION ALL SELECT 'Graph Construction', 'metric', 'connectivity',
               true,
               round((SELECT n FROM ragg)::DOUBLE / (SELECT n FROM eagg), 8)
               WHERE (SELECT n FROM eagg) > 1
    """


def _sssp_sql(n_rounds: int) -> str:
    """Single-source Bellman-Ford as programmatically generated SQL: one
    relax-then-min CTE per round, mirroring
    ``paths._shortest_paths_sharded``'s recurrence exactly (same f64 op
    shapes; candidate sums are identical left-associated path sums, so
    the min is bit-equal — no rounding).  ``AS MATERIALIZED`` stops
    DuckDB inlining each round's two references into an exponential
    plan."""
    t = _staged_sql("shortest_paths")
    parts = [
        f"WITH sym AS MATERIALIZED (SELECT src, dst, w FROM {t}",
        f"  UNION ALL SELECT dst, src, w FROM {t}),",
        "s AS (SELECT min(src) AS v FROM sym),",
        "d0 AS (SELECT v AS node, 0.0::DOUBLE AS d FROM s)",
    ]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
        d{i} AS MATERIALIZED (SELECT node, min(d) AS d FROM (
            SELECT node, d FROM d{i - 1}
            UNION ALL
            SELECT e.dst, p.d + e.w FROM d{i - 1} p
            JOIN sym e ON e.src = p.node)
          GROUP BY node)""")
    parts.append(f""",
        pr AS (SELECT e.dst AS node, min(e.src) AS pred
               FROM sym e
               JOIN d{n_rounds} pu ON pu.node = e.src
               JOIN d{n_rounds} pv ON pv.node = e.dst
               WHERE pu.d + e.w = pv.d
               GROUP BY e.dst)
        SELECT dd.node, dd.d AS dist,
               CASE WHEN dd.node = (SELECT v FROM s) THEN ''
                    ELSE pr.pred END AS pred
        FROM d{n_rounds} dd LEFT JOIN pr ON pr.node = dd.node""")
    return "\n".join(parts)


def _pagerank_sql(n_iter: int, damping: float, round_digits: int,
                  query: str = "pagerank") -> str:
    """Fixed-iteration PageRank as programmatically generated SQL: one
    join+aggregate CTE per power iteration, mirroring
    ``graph_ops.pagerank_dataset``'s recurrence exactly (same f64 op
    order per term; summation order differs → both sides round)."""
    e = _staged_sql(query)
    parts = [
        f"WITH e AS (SELECT subj, obj FROM {e}),",
        "deg AS (SELECT subj AS node, count(*)::DOUBLE AS out_deg"
        " FROM e GROUP BY subj),",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT subj AS node FROM e UNION ALL SELECT obj FROM e)),",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),",
        "s0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS score FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(f""",
        s{i} AS (
          SELECT nd.node,
                 (1.0 - {damping}) * (1.0 / (SELECT n FROM nn))
                   + coalesce(c.csum, 0.0) AS score
          FROM nodes nd LEFT JOIN (
            SELECT e.obj AS node,
                   sum(({damping} * s.score) / greatest(d.out_deg, 1.0)) AS csum
            FROM e JOIN s{i - 1} s ON e.subj = s.node
                   JOIN deg d ON e.subj = d.node
            GROUP BY e.obj) c ON nd.node = c.node)""")
    parts.append(
        f"\nSELECT node, round(score, {round_digits}) AS score FROM s{n_iter}")
    return "\n".join(parts)


_BPE_TOK_SQL = r"""
toks0 AS MATERIALIZED (
  SELECT doc_id, list_filter(list_transform(
           regexp_split_to_array(trim(text), '\s+'),
           x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
           x -> length(x) > 0) AS l
  FROM documents),
tok AS (SELECT unnest(l) AS word FROM toks0),
wt AS MATERIALIZED (SELECT word, count(*)::BIGINT AS n
                    FROM tok GROUP BY word),
wf AS (SELECT word, n FROM wt ORDER BY n DESC, word LIMIT __K__),
seg0 AS MATERIALIZED (SELECT word, n,
         list_transform(range(1, length(word)+1), i -> word[i])
           || ['</w>'] AS syms FROM wf)"""


def _bpe_pass_sql(tag: str, src: str, pair: str) -> str:
    """One L2R merge-all window pass (``functions/bpe.merge_pass``):
    match flags → run-parity keep (overlaps only arise when lhs == rhs)
    → splice via the lagged-keep skip.  Complete for a single pair: the
    merged symbol can never start or finish another occurrence."""
    body = r"""
e__T__ AS (SELECT word, n, u.p AS p, syms[u.p] AS sym, syms[u.p+1] AS nxt
         FROM __SRC__, unnest(range(1, len(syms)+1)) AS u(p)),
q__T__ AS (SELECT *, coalesce(sym = (SELECT lhs FROM __M__)
                   AND nxt = (SELECT rhs FROM __M__), false) AS mt
         FROM e__T__),
rr__T__ AS (SELECT *, CASE WHEN mt THEN p - row_number() OVER
            (PARTITION BY word, mt ORDER BY p) END AS rid FROM q__T__),
k__T__ AS (SELECT *, CASE WHEN mt THEN (p - min(p) OVER
            (PARTITION BY word, rid)) % 2 = 0 ELSE false END AS keep
         FROM rr__T__),
g__T__ AS (SELECT *, coalesce(lag(keep) OVER
            (PARTITION BY word ORDER BY p), false) AS pk FROM k__T__),
seg__T__ AS MATERIALIZED (SELECT word, n,
             list(CASE WHEN keep THEN sym || nxt ELSE sym END
                  ORDER BY p) AS syms
           FROM g__T__ WHERE NOT pk GROUP BY word, n)"""
    return (body.replace("__T__", tag).replace("__SRC__", src)
            .replace("__M__", pair).strip())


def _bpe_prefix_sql(n_merges: int, max_types: int, with_apply: bool) -> str:
    """The WHOLE BPE learning loop (Sennrich+ 2016) as generated SQL —
    zero staging: per rank, weighted pair counts over the previous
    segmentation → argmax (count DESC, pair ASC; binary UTF-8 order ==
    code-point order) → one window merge pass.  ``with_apply`` appends
    the apply chain re-tokenizing EVERY distinct corpus word with the
    learned merges in rank order (``functions/bpe.apply_bpe``)."""
    parts = ["WITH " + _BPE_TOK_SQL.replace("__K__", str(max_types)).strip()]
    for r in range(1, n_merges + 1):
        src = "seg" + str(r - 1)
        parts.append((r"""
pc__R__ AS (SELECT syms[u.p] AS lhs, syms[u.p+1] AS rhs,
            sum(n)::BIGINT AS c
          FROM __SRC__, unnest(range(1, len(syms))) AS u(p)
          GROUP BY 1, 2),
m__R__ AS MATERIALIZED (SELECT lhs, rhs FROM pc__R__
          ORDER BY c DESC, lhs, rhs LIMIT 1)"""
                      ).replace("__R__", str(r)).replace("__SRC__", src)
                     .strip())
        parts.append(_bpe_pass_sql(str(r), src, "m" + str(r)))
    if with_apply:
        parts.append(r"""
sega0 AS MATERIALIZED (SELECT word, 0::BIGINT AS n,
         list_transform(range(1, length(word)+1), i -> word[i])
           || ['</w>'] AS syms FROM wt)""".strip())
        for r in range(1, n_merges + 1):
            parts.append(_bpe_pass_sql(
                "a" + str(r), "sega" + str(r - 1), "m" + str(r)))
    return ",\n".join(parts)


def _bpe_merges_sql(n_merges: int = 20, max_types: int = 300) -> str:
    union = "\nUNION ALL\n".join(
        "SELECT {r}::BIGINT AS rnk, lhs, rhs FROM m{r}".replace(
            "{r}", str(r))
        for r in range(1, n_merges + 1))
    return (_bpe_prefix_sql(n_merges, max_types, with_apply=False)
            + "\n" + union)


def _bpe_segments_sql(n_merges: int = 20, max_types: int = 300) -> str:
    return (_bpe_prefix_sql(n_merges, max_types, with_apply=True)
            + "\nSELECT word, array_to_string(syms, ' ') AS pieces,"
            + "\n       len(syms)::BIGINT AS n_pieces FROM sega"
            + str(n_merges))


def _bpe_token_stats_sql(n_merges: int = 20, max_types: int = 300) -> str:
    return (_bpe_prefix_sql(n_merges, max_types, with_apply=True) + r""",
dt AS (SELECT doc_id, unnest(l) AS word FROM toks0),
wcn AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM dt GROUP BY 1, 2),
sp AS (SELECT word, len(syms)::BIGINT AS np FROM sega""" + str(n_merges)
            + r"""),
j AS (SELECT wcn.doc_id, sum(wcn.c) AS nw, sum(wcn.c * sp.np) AS npc
      FROM wcn JOIN sp USING (word) GROUP BY 1)
SELECT d.doc_id, coalesce(j.nw, 0)::BIGINT AS n_words,
       coalesce(j.npc, 0)::BIGINT AS n_pieces
FROM documents d LEFT JOIN j ON j.doc_id = d.doc_id""")


def _html_pages_str(sf_dir: str, query: str, links: int = 3):
    """Linked synthetic pages with html decoded to string (pre-extracted
    pages dropped — links live in markup only), staged for a query + its
    oracle."""
    from graphrag_rs_ray.sources.pages import pages_dataset

    def rows(t: pa.Table) -> pa.Table:
        u2, h2 = [], []
        for u, h in zip(t.column("url").to_pylist(),
                        t.column("html").to_pylist()):
            if h is None:
                continue
            u2.append(u)
            h2.append(h.decode("utf-8", errors="replace"))
        return pa.table({"url": pa.array(u2, pa.string()),
                         "html": pa.array(h2, pa.string())})

    pages = pages_dataset(_n_pages(sf_dir), links=links).map_batches(
        rows, batch_format="pyarrow")
    return _stage(pages, query, sf_dir)


def q_web_link_graph(sf_dir: str):
    """Common-Crawl-style outlink extraction: <a href> anchors of every
    html page → resolved+normalized (src_url, src_host, dst_url,
    dst_host, anchor) edges; kernel semantics (href forms, skip schemes,
    fragment stripping) replayed by the oracle's regex+CASE SQL over the
    staged page table."""
    from graphrag_rs_ray.pipelines.weblinks import link_edges
    return link_edges(_html_pages_str(sf_dir, "web_link_graph"))


def q_domain_link_stats(sf_dir: str):
    """Host-level link-graph rollup: (src_host, dst_host, n_links) via
    one hash-bucketed aggregation over the extracted edges."""
    from graphrag_rs_ray.pipelines.weblinks import domain_edges, link_edges
    return domain_edges(link_edges(
        _html_pages_str(sf_dir, "domain_link_stats")))


def q_anchor_text_index(sf_dir: str):
    """Anchor-text document expansion: per dst_url, in-link count,
    distinct anchors, and the most frequent anchor (ties lexicographic);
    one dst_url-bucketed exchange."""
    from graphrag_rs_ray.pipelines.weblinks import (anchor_text_index,
                                                    link_edges)
    return anchor_text_index(link_edges(
        _html_pages_str(sf_dir, "anchor_text_index")))


def q_link_prediction(sf_dir: str):
    """Common-neighbors / Jaccard / Adamic-Adar link prediction over the
    undirected distinct KG graph (bonus analytics beyond the reference,
    Liben-Nowell & Kleinberg 2003); hub cap 64 bounds the wedge
    emission, AA terms quantized per center so sums are order-free."""
    from graphrag_rs_ray.pipelines.graph_ops import link_prediction
    return link_prediction(_staged_triples("link_prediction", sf_dir),
                           max_center_degree=64)


def q_boilerplate_blocks(sf_dir: str):
    """jusText-style link-density boilerplate decisions: one row per
    <p>/<li>/<h*> block with integer char counts and the keep verdict
    (1e6·link_chars < 5e5·text_chars cross-multiplication)."""
    from graphrag_rs_ray.pipelines.weblinks import boilerplate_blocks
    return boilerplate_blocks(_html_pages_str(sf_dir, "boilerplate_blocks"))


def q_host_rank(sf_dir: str):
    """PageRank over the host graph (distinct host→host edges from the
    domain rollup), fixed 8 iterations so the oracle replays the exact
    recurrence (same machinery as the `pagerank` query)."""
    from graphrag_rs_ray.pipelines.graph_ops import pagerank_dataset
    from graphrag_rs_ray.pipelines.weblinks import domain_edges, link_edges

    de = domain_edges(link_edges(
        _html_pages_str(sf_dir, "host_rank_pages"))).map_batches(
        lambda t: pa.table({"subj": t.column("src_host"),
                            "obj": t.column("dst_host")}),
        batch_format="pyarrow")
    edges = _stage(de, "host_rank", sf_dir)
    return pagerank_dataset(edges, damping=0.85, max_iter=8, tolerance=0.0,
                            num_buckets=16, round_digits=8)


_LINK_EDGE_SQL_BODY = r"""
        pages AS (SELECT url, html FROM __PAGES__),
        m AS (SELECT url,
               regexp_extract_all(html,
                 '(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>', 1)
                 AS hrefs,
               regexp_extract_all(html,
                 '(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>', 2)
                 AS txts
              FROM pages),
        u AS (SELECT url AS src_url, unnest(hrefs) AS href,
                     unnest(txts) AS txt
              FROM m),
        t AS (SELECT src_url, trim(href) AS h, txt FROM u),
        f AS (SELECT src_url, split_part(h, '#', 1) AS hs, txt
              FROM t
              WHERE h <> '' AND NOT (h LIKE '#%')
                AND NOT (lower(h) LIKE 'mailto:%')
                AND NOT (lower(h) LIKE 'javascript:%')
                AND NOT (lower(h) LIKE 'data:%')
                AND NOT (lower(h) LIKE 'tel:%')),
        g AS (SELECT src_url, txt,
                     CASE
                       WHEN lower(hs) LIKE 'http://%'
                         OR lower(hs) LIKE 'https://%' THEN hs
                       WHEN hs LIKE '//%' THEN 'https:' || hs
                       WHEN hs LIKE '/%' THEN
                         regexp_extract(src_url, '^(https?://[^/]+)', 1) || hs
                       WHEN length(regexp_extract(src_url, '^(.*/)', 1))
                              <= 8 THEN
                         -- origin-only base (https://host): Python's
                         -- resolve_href appends origin + '/' + href;
                         -- the greedy ^(.*/) would yield just the scheme
                         rtrim(src_url, '/') || '/' || hs
                       ELSE regexp_extract(src_url, '^(.*/)', 1) || hs
                     END AS dst0
              FROM f WHERE hs <> ''),
        n AS (SELECT src_url, txt,
                     lower(regexp_extract(dst0, '^(https?://[^/]+)', 1))
                       || substr(dst0,
                            length(regexp_extract(dst0,
                                   '^(https?://[^/]+)', 1)) + 1) AS dst_url
              FROM g),
        edges AS (
          SELECT src_url,
                 lower(regexp_extract(src_url, '^https?://([^/:]+)', 1))
                   AS src_host,
                 dst_url,
                 lower(regexp_extract(dst_url, '^https?://([^/:]+)', 1))
                   AS dst_host,
                 trim(regexp_replace(regexp_replace(txt, '<[^>]+>', '', 'g'),
                                     '\s+', ' ', 'g')) AS anchor
          FROM n)"""


def _link_edges_sql(query: str) -> str:
    return _LINK_EDGE_SQL_BODY.replace("__PAGES__", _staged_sql(query))


def _hex2int_sql(expr: str, n_chars: int) -> str:
    """SQL expression: integer value of the first ``n_chars`` hex digits
    of ``expr`` (== Python ``int(expr[:n], 16)``) — strpos-chain, no
    engine-specific hex cast."""
    terms = [
        "(strpos('0123456789abcdef', substr(" + expr + ", "
        + str(i + 1) + ", 1)) - 1) * " + str(16 ** (n_chars - 1 - i))
        for i in range(n_chars)]
    return "(" + " + ".join(terms) + ")"


def _quality_classifier_sql() -> str:
    """The hashing-trick linear scorer re-derived entirely from
    ``documents``: bucket = md5(token)[:4], weight = md5('w'+bucket)[:8]
    % 2001 - 1000 — all integer micro-logits, zero staging."""
    bucket = _hex2int_sql("md5(token)", 4)
    weight = _hex2int_sql("md5('w' || bucket::VARCHAR)", 8)
    return r"""
        WITH toks0 AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> regexp_replace(lower(x), '[^\p{L}\p{N}]', '', 'g')),
                   x -> length(x) > 0) AS l
          FROM documents),
        ti AS (SELECT doc_id, unnest(l) AS token FROM toks0),
        dt AS (SELECT DISTINCT token FROM ti),
        tb AS (SELECT token, __BUCKET__::BIGINT AS bucket FROM dt),
        tw AS (SELECT token, (__WEIGHT__ % 2001 - 1000)::BIGINT AS w
               FROM tb),
        agg AS (SELECT ti.doc_id, count(*)::BIGINT AS n_toks,
                       sum(tw.w)::BIGINT AS logit_sum
                FROM ti JOIN tw USING (token) GROUP BY 1)
        SELECT d.doc_id, coalesce(a.n_toks, 0)::BIGINT AS n_toks,
               coalesce(a.logit_sum, 0)::BIGINT AS logit_sum,
               coalesce(a.logit_sum, 0) > 0 AS keep
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".replace(
        "__BUCKET__", bucket).replace("__WEIGHT__", weight)


def _oracle_sql_base() -> dict[str, str]:
    return {
        "text_clean": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN ''
                        ELSE array_to_string(regexp_split_to_array(trim(text), '\\s+'), ' ')
                   END AS clean_text
            FROM documents
        """,
        "exact_dedup": """
            SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "token_stats": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars
            FROM documents
        """,
        "language_id": """
            SELECT doc_id,
                   CASE WHEN regexp_matches(text, '[ñóéíáú]') THEN 'es'
                        WHEN regexp_matches(text, '[çãõ]') THEN 'pt'
                        WHEN regexp_matches(text, '[àèùò]') THEN 'fr'
                        ELSE 'en' END AS lang_pred
            FROM documents
        """,
        "quality_scores": """
            WITH w AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS words
              FROM documents)
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   len(words)::BIGINT AS n_words,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE length(regexp_replace(text, '[\\p{L}\\p{N}\\p{Z}\\s]', '', 'g')) * 1.0
                             / length(text) END AS punct_ratio,
                   CASE WHEN len(words) = 0 THEN 0.0
                        ELSE len(list_filter(words, x -> lower(x) IN {stop})) * 1.0
                             / len(words) END AS stopword_ratio
            FROM w
        """.replace("{stop}", _STOPLIST_SQL),
        "bm25_df": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_replace(lower(unnest(regexp_split_to_array(trim(text), '\\s+'))),
                                    '[^\\p{L}\\p{N}]', '', 'g') AS term
              FROM documents WHERE length(trim(text)) > 0)
            SELECT term, count(DISTINCT doc_id) AS df
            FROM toks
            WHERE length(term) > 2 AND term NOT IN {stop}
            GROUP BY term
        """.replace("{stop}", _STOPLIST_SQL),
        "bm25_corpus_stats": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_replace(lower(unnest(regexp_split_to_array(trim(text), '\\s+'))),
                                    '[^\\p{L}\\p{N}]', '', 'g') AS term
              FROM documents WHERE length(trim(text)) > 0),
            lens AS (
              SELECT d.doc_id,
                     (SELECT count(*) FROM toks t
                      WHERE t.doc_id = d.doc_id
                        AND length(t.term) > 2 AND t.term NOT IN {stop}) AS doc_len
              FROM documents d)
            SELECT count(*)::BIGINT AS n_docs,
                   sum(doc_len)::BIGINT AS total_tokens,
                   avg(doc_len) AS avg_doc_len
            FROM lens
        """.replace("{stop}", _STOPLIST_SQL),
        "knn_bruteforce": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings ORDER BY vec_id LIMIT 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding) AS score,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                                e.vec_id ASC) AS rank
              FROM q CROSS JOIN embeddings e)
            SELECT query_id, vec_id, rank::BIGINT AS rank
            FROM scored WHERE rank <= 10
        """,
        "cosine_dup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        "cosine_dup_pairs_bucketed": """
            SELECT vec_a, vec_b, sim FROM (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 12) AS sim
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            WHERE sim >= 0.35
        """,
        "orders_by_segment": """
            SELECT c.c_mktsegment AS segment,
                   count(*) AS n_orders,
                   sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "order_priority_revenue": """
            SELECT o.o_orderpriority,
                   count(*) AS n_items,
                   sum(round(l.l_extendedprice * 100)::BIGINT)::BIGINT AS total_cents
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "top_parts_by_size": """
            SELECT p_partkey, p_name, p_size FROM part
            ORDER BY p_size DESC, p_partkey ASC LIMIT 10
        """,
        "sentence_stats": """
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '[.!?]'),
                                   x -> length(trim(x)) > 0))::BIGINT AS n_sentences
            FROM documents
        """,
        "bm25_scores": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_replace(lower(unnest(regexp_split_to_array(trim(text), '\\s+'))),
                                    '[^\\p{L}\\p{N}]', '', 'g') AS term
              FROM documents WHERE length(trim(text)) > 0),
            filt AS (
              SELECT doc_id, term FROM toks
              WHERE length(term) > 2 AND term NOT IN {stop}),
            dl AS (SELECT doc_id, count(*) AS dl FROM filt GROUP BY doc_id),
            stats AS (
              SELECT avg(dl) AS avg_dl FROM (
                SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
                FROM documents d LEFT JOIN dl USING (doc_id))),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM filt
                   WHERE term IN ('fast','hash','join') GROUP BY term),
            tf AS (SELECT doc_id, term, count(*) AS c FROM filt
                   WHERE term IN ('fast','hash','join') GROUP BY doc_id, term),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id,
                     sum((ln(n.n * 1.0 / df.df) + 1.0)
                         * ((tf.c * 1.0 / dl.dl) * 2.2)
                         / ((tf.c * 1.0 / dl.dl)
                            + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avg_dl))) AS s
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
                   CROSS JOIN n CROSS JOIN stats
              GROUP BY tf.doc_id)
            SELECT doc_id, round(s, 6) AS score FROM scored WHERE s > 0
        """.replace("{stop}", _STOPLIST_SQL),
        "tfidf_topk": """
            WITH toks AS (
              SELECT doc_id,
                     lower(regexp_replace(unnest(regexp_split_to_array(trim(text), '\\s+')),
                                          '[^\\p{L}\\p{N}\\-_]', '', 'g')) AS term
              FROM documents WHERE length(trim(text)) > 0),
            filtered AS (
              SELECT doc_id, term FROM toks
              WHERE length(term) > 2 AND term NOT IN {tfstop}
                AND NOT regexp_matches(term, '^[0-9]+$')),
            tf AS (
              SELECT doc_id, term,
                     count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY doc_id) AS tf
              FROM filtered GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM filtered GROUP BY term),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     tf.tf * greatest(ln((SELECT count(*) FROM documents) * 1.0 / df.df), 0) AS score
              FROM tf JOIN df USING (term)),
            ranked AS (
              SELECT doc_id, term,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term ASC) AS rank
              FROM scored)
            SELECT doc_id, rank::BIGINT AS rank, term FROM ranked WHERE rank <= 5
        """.replace("{tfstop}", _TFIDF_STOPLIST_SQL),
        "customers_with_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        """,
        "shipped_within_window": """
            SELECT l.l_returnflag, count(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= o.o_orderdate
              AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
            GROUP BY l.l_returnflag
        """,
        "purchases_asof_click": """
            SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
                   c.ts AS last_click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts > c.ts
        """,
        "sliding_window_counts": """
            WITH exploded AS (
              SELECT event_type,
                     to_timestamp(((epoch_us(ts) // 900000000) - k) * 900)::TIMESTAMP
                       AS window_start
              FROM events, (SELECT unnest([0, 1, 2, 3]) AS k))
            SELECT event_type, window_start, count(*) AS n_events
            FROM exploded GROUP BY event_type, window_start
        """,
        "session_windows": """
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            numbered AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM marked)
            SELECT user_id, session_id::BIGINT AS session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, session_id
        """,
        "temporal_edges": """
            SELECT user_id, event_type,
                   min(ts) AS first_seen, max(ts) AS last_seen,
                   count(*) AS n_events
            FROM events GROUP BY user_id, event_type
        """,
        "temporal_snapshot": """
            WITH te AS (
              SELECT user_id, event_type,
                     min(epoch_us(ts)) AS fs, max(epoch_us(ts)) AS ls
              FROM events GROUP BY user_id, event_type),
            r AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
                  FROM events)
            SELECT user_id, count(*)::BIGINT AS n_active
            FROM te CROSS JOIN r
            WHERE fs <= mid AND ls >= mid
            GROUP BY user_id
        """,
        # temporal analytics (graph/temporal.rs:271-407) — interval edges
        # (user, event_type) over [first_seen, last_seen], namespaced
        # string nodes; all ratios are int/int DOUBLE divisions
        "temporal_evolution": """
            WITH te AS (
              SELECT 'u' || user_id::VARCHAR AS src,
                     'e:' || event_type AS dst,
                     min(epoch_us(ts)) AS fs, max(epoch_us(ts)) AS ls
              FROM events GROUP BY user_id, event_type),
            p AS (SELECT min(fs) AS lo, max(ls) AS hi,
                         greatest(1, (max(ls) - min(fs)) // 8) AS g
                  FROM te),
            w AS (SELECT lo + g * i AS w, g FROM p,
                  generate_series(0, 8192) AS t(i)
                  -- default-granularity only: g=(hi-lo)//8 so
                  -- (hi-lo)//g <= 8 << 8192; a small explicit g
                  -- would need a bound of (hi-lo)//g (ADVICE r04)
                  WHERE lo + g * i <= hi),
            act AS (SELECT w.w, te.src, te.dst FROM te JOIN w
                    ON te.fs <= w.w + w.g AND te.ls >= w.w),
            ec AS (SELECT w, count(*)::BIGINT AS ec FROM act GROUP BY w),
            nc AS (SELECT w, count(DISTINCT node)::BIGINT AS nc FROM (
                     SELECT w, src AS node FROM act
                     UNION ALL SELECT w, dst FROM act) GROUP BY w)
            SELECT w.w AS window_start,
                   coalesce(nc.nc, 0) AS node_count,
                   coalesce(ec.ec, 0) AS edge_count,
                   CASE WHEN coalesce(nc.nc, 0) >= 2
                        THEN coalesce(ec.ec, 0)::DOUBLE /
                             ((nc.nc * (nc.nc - 1)) // 2)
                        ELSE 0.0 END AS density,
                   CASE WHEN coalesce(nc.nc, 0) > 0
                        THEN 2.0 * coalesce(ec.ec, 0) / nc.nc
                        ELSE 0.0 END AS avg_degree
            FROM w LEFT JOIN ec ON w.w = ec.w LEFT JOIN nc ON w.w = nc.w
        """,
        "temporal_node_churn": """
            WITH te AS (
              SELECT 'u' || user_id::VARCHAR AS src,
                     'e:' || event_type AS dst,
                     min(epoch_us(ts)) AS fs, max(epoch_us(ts)) AS ls
              FROM events GROUP BY user_id, event_type),
            r AS (SELECT min(fs) AS lo, max(ls) AS hi FROM te),
            f AS (
              SELECT src AS node,
                     (fs <= lo AND ls >= lo)::BIGINT AS s,
                     (fs <= hi AND ls >= hi)::BIGINT AS e
              FROM te, r WHERE (fs <= lo AND ls >= lo)
                            OR (fs <= hi AND ls >= hi)
              UNION ALL
              SELECT dst,
                     (fs <= lo AND ls >= lo)::BIGINT,
                     (fs <= hi AND ls >= hi)::BIGINT
              FROM te, r WHERE (fs <= lo AND ls >= lo)
                            OR (fs <= hi AND ls >= hi)),
            n AS (SELECT node, max(s) AS s, max(e) AS e FROM f GROUP BY node)
            SELECT node, CASE WHEN s = 1 AND e = 1 THEN 'stable'
                              WHEN e = 1 THEN 'added'
                              ELSE 'removed' END AS status
            FROM n
        """,
        "temporal_top_growing": """
            WITH te AS (
              SELECT 'u' || user_id::VARCHAR AS src,
                     'e:' || event_type AS dst,
                     min(epoch_us(ts)) AS fs, max(epoch_us(ts)) AS ls
              FROM events GROUP BY user_id, event_type),
            p AS (SELECT min(fs) AS lo, max(ls) AS hi,
                         greatest(1, (max(ls) - min(fs)) // 8) AS g
                  FROM te),
            sd AS (SELECT node, count(*)::BIGINT AS deg FROM (
                     SELECT src AS node FROM te, p
                     WHERE fs <= lo + g AND ls >= lo
                     UNION ALL SELECT dst FROM te, p
                     WHERE fs <= lo + g AND ls >= lo) GROUP BY node),
            ed AS (SELECT node, count(*)::BIGINT AS deg FROM (
                     SELECT src AS node FROM te, p
                     WHERE fs <= hi AND ls >= hi - g
                     UNION ALL SELECT dst FROM te, p
                     WHERE fs <= hi AND ls >= hi - g) GROUP BY node)
            SELECT ed.node,
                   CASE WHEN coalesce(sd.deg, 0) > 0
                        THEN (ed.deg - sd.deg)::DOUBLE / sd.deg
                        ELSE ed.deg::DOUBLE END AS growth
            FROM ed LEFT JOIN sd ON ed.node = sd.node
            ORDER BY growth DESC, ed.node LIMIT 10
        """,
        "temporal_centrality": """
            WITH te AS (
              SELECT 'u' || user_id::VARCHAR AS src,
                     'e:' || event_type AS dst,
                     min(epoch_us(ts)) AS fs, max(epoch_us(ts)) AS ls
              FROM events GROUP BY user_id, event_type),
            p AS (SELECT min(fs) AS lo, max(ls) AS hi,
                         greatest(1, (max(ls) - min(fs)) // 8) AS g
                  FROM te),
            w AS (SELECT lo + g * i AS w, g FROM p,
                  generate_series(0, 8192) AS t(i)
                  -- default-granularity only: g=(hi-lo)//8 so
                  -- (hi-lo)//g <= 8 << 8192; a small explicit g
                  -- would need a bound of (hi-lo)//g (ADVICE r04)
                  WHERE lo + g * i <= hi),
            act AS (SELECT w.w, te.src, te.dst FROM te JOIN w
                    ON te.fs <= w.w + w.g AND te.ls >= w.w),
            nodes AS (SELECT w, src AS node FROM act
                      UNION ALL SELECT w, dst FROM act),
            deg AS (SELECT w, node, count(*)::BIGINT AS deg
                    FROM nodes GROUP BY w, node),
            nc AS (SELECT w, count(DISTINCT node)::BIGINT AS nc
                   FROM nodes GROUP BY w)
            SELECT deg.node, deg.w AS window_start,
                   CASE WHEN nc.nc > 1
                        THEN deg.deg::DOUBLE / (nc.nc - 1)
                        ELSE 0.0 END AS centrality
            FROM deg JOIN nc ON deg.w = nc.w
        """,
        "windowed_event_counts": """
            SELECT event_type,
                   to_timestamp((epoch_us(ts) // 3600000000) * 3600)::TIMESTAMP AS window_start,
                   count(*) AS n_events,
                   sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_cents
            FROM events
            GROUP BY event_type, window_start
        """,
        # ---- staged-input oracles (procedural rows staged to Parquet by
        # the query fn; SQL checks the derivation) ------------------------
        "kg_triples": """
            SELECT subj, pred, obj, max(conf) AS conf,
                   count(*)::BIGINT AS n_contexts,
                   min(chunk_id) AS context_sample
            FROM {t} GROUP BY subj, pred, obj
        """.replace("{t}", _staged_sql("kg_triples")),
        "kg_entities": """
            WITH pn AS (
              SELECT entity_id, name, type, max(conf) AS conf,
                     sum(mention_count) AS mc, count(*) AS name_count
              FROM {t} GROUP BY entity_id, name, type),
            canon AS (
              SELECT entity_id, name,
                     row_number() OVER (PARTITION BY entity_id
                       ORDER BY name_count DESC, length(name) DESC, name DESC) AS rn
              FROM pn),
            tot AS (
              SELECT entity_id, min(type) AS type, max(conf) AS conf,
                     sum(mc)::BIGINT AS mention_count
              FROM pn GROUP BY entity_id)
            SELECT t.entity_id, c.name, t.type, t.conf, t.mention_count
            FROM tot t JOIN canon c ON t.entity_id = c.entity_id AND c.rn = 1
        """.replace("{t}", _staged_sql("kg_entities")),
        "entity_to_chunks": """
            SELECT entity_id,
                   array_to_string(list_sort(list(DISTINCT chunk_id)), ',') AS chunks,
                   count(DISTINCT chunk_id)::BIGINT AS n_chunks
            FROM {t} GROUP BY entity_id
        """.replace("{t}", _staged_sql("entity_to_chunks")),
        "chunk_to_entities": """
            SELECT chunk_id,
                   array_to_string(list_sort(list(DISTINCT entity_id)), ',') AS entities,
                   count(DISTINCT entity_id)::BIGINT AS n_entities
            FROM {t} GROUP BY chunk_id
        """.replace("{t}", _staged_sql("chunk_to_entities")),
        "co_occurring_entities": """
            WITH m AS (SELECT DISTINCT chunk_id, entity_id FROM {t})
            SELECT a.entity_id AS entity_a, b.entity_id AS entity_b,
                   count(*)::BIGINT AS shared_chunks
            FROM m a JOIN m b
              ON a.chunk_id = b.chunk_id AND a.entity_id < b.entity_id
            GROUP BY a.entity_id, b.entity_id
            HAVING count(*) >= 2
        """.replace("{t}", _staged_sql("co_occurring_entities")),
        "concept_table": """
            SELECT concept, count(*)::BIGINT AS n_chunks
            FROM {t} GROUP BY concept
        """.replace("{t}", _staged_sql("concept_table")),
        "concept_edges": """
            WITH m AS (SELECT concept, chunk_id FROM {t}),
            cnt AS (SELECT concept, count(*) AS n FROM m GROUP BY concept),
            pairs AS (
              SELECT a.concept AS concept_a, b.concept AS concept_b,
                     count(*) AS cnt
              FROM m a JOIN m b
                ON a.chunk_id = b.chunk_id AND a.concept < b.concept
              GROUP BY a.concept, b.concept
              HAVING count(*) >= 2)
            SELECT p.concept_a, p.concept_b, p.cnt::BIGINT AS count,
                   p.cnt * 1.0 / (ca.n + cb.n - p.cnt) AS confidence
            FROM pairs p
            JOIN cnt ca ON p.concept_a = ca.concept
            JOIN cnt cb ON p.concept_b = cb.concept
        """.replace("{t}", _staged_sql("concept_edges")),
        "incremental_update": """
            WITH u AS (
              SELECT entity_id, name, type, conf, mention_count, 0 AS _side
              FROM {be}
              UNION ALL
              SELECT entity_id, name, type, conf, mention_count, 1 AS _side
              FROM {de}),
            best AS (
              SELECT entity_id, name, type, conf,
                     row_number() OVER (PARTITION BY entity_id
                       ORDER BY conf DESC, _side DESC) AS rn
              FROM u),
            mc AS (SELECT entity_id, sum(mention_count)::BIGINT AS mention_count
                   FROM u GROUP BY entity_id),
            nt AS (SELECT count(*)::BIGINT AS graph_triples FROM (
                     SELECT DISTINCT subj, pred, obj FROM (
                       SELECT subj, pred, obj FROM {bt}
                       UNION ALL SELECT subj, pred, obj FROM {dt})))
            SELECT b.entity_id, b.name, b.type, b.conf,
                   m.mention_count, nt.graph_triples
            FROM best b JOIN mc m USING (entity_id) CROSS JOIN nt
            WHERE b.rn = 1
        """.replace("{be}", _staged_sql("incremental_update", "base_entities"))
           .replace("{de}", _staged_sql("incremental_update", "delta_entities"))
           .replace("{bt}", _staged_sql("incremental_update", "base_triples"))
           .replace("{dt}", _staged_sql("incremental_update", "delta_triples")),
        # RDF N-Triples import: RE2 re-parse of the staged raw lines +
        # SQL re-derivation of the per-subject entity merge
        "rdf_import": ("""
            WITH raw AS (SELECT line FROM {lines}),
        """ + _NT_PARSE_SQL_BODY).replace(
            "{lines}", _staged_sql("rdf_import", "lines")),
        # Turtle-lite import: the oracle ALSO re-derives the prefix
        # expansion (regexp_replace per prefix + the 'a' keyword) before
        # running the same N-Triples parse body
        "turtle_import": ("""
            WITH raw0 AS (SELECT line FROM {lines}),
            raw AS (
              SELECT regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(line,
                         '(^|\\s)doc:([^\\s]+)', '\\1<http://ex.org/doc/\\2>', 'g'),
                         '(^|\\s)ex:([^\\s]+)', '\\1<http://ex.org/ns/\\2>', 'g'),
                         '(^|\\s)rdfs:([^\\s]+)', '\\1<http://www.w3.org/2000/01/rdf-schema#\\2>', 'g'),
                         '(^|\\s)a(\\s)', '\\1<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>\\2', 'g') AS line
              FROM raw0
              WHERE trim(line) <> '' AND line NOT LIKE '@prefix%'
                AND line NOT LIKE '#%'),
        """ + _NT_PARSE_SQL_BODY).replace(
            "{lines}", _staged_sql("turtle_import", "lines")),

        # GraphML import: RE2 line parse (generator emits one element per
        # line) + key-declaration join + SQL attribute folds
        "graphml_import": """
            WITH raw AS (SELECT line FROM {lines}),
            keys AS (
              SELECT regexp_extract(line, '<key id="([^"]*)"', 1) AS kid,
                     regexp_extract(line, 'for="([^"]*)"', 1) AS kfor,
                     regexp_extract(line, 'attr\\.name="([^"]*)"', 1) AS kname
              FROM raw WHERE regexp_matches(line, '<key ')),
            nodes AS (
              SELECT regexp_extract(line, '<node id="([^"]*)"', 1) AS id,
                     regexp_extract_all(line, '<data key="([^"]*)">', 1) AS dk,
                     regexp_extract_all(line, '<data key="[^"]*">([^<]*)</data>', 1) AS dv
              FROM raw WHERE regexp_matches(line, '<node ')),
            ndata AS (SELECT id, unnest(dk) AS kid, unnest(dv) AS v FROM nodes),
            nmap AS (SELECT n.id, k.kname AS k, n.v
                     FROM ndata n JOIN keys k ON k.kid = n.kid AND k.kfor = 'node'),
            nn AS (SELECT id, min(v) AS name FROM nmap WHERE k = 'name' GROUP BY id),
            ntp AS (SELECT id, min(v) AS t FROM nmap WHERE k = 'type' GROUP BY id),
            natt AS (SELECT id, k, min(v) AS v FROM nmap
                     WHERE k NOT IN ('name', 'type') GROUP BY id, k),
            nattj AS (SELECT id,
                             '{' || string_agg('"' || k || '": "' || v || '"', ', ' ORDER BY k) || '}' AS attributes
                      FROM natt GROUP BY id),
            ents AS (
              SELECT 'e' AS kind, nodes.id,
                     coalesce(nn.name, nodes.id) AS name,
                     coalesce(ntp.t, 'Entity') AS entity_type,
                     coalesce(nattj.attributes, '{}') AS attributes,
                     '' AS source, '' AS target, '' AS relation_type
              FROM nodes
              LEFT JOIN nn USING (id) LEFT JOIN ntp USING (id)
              LEFT JOIN nattj USING (id)),
            edges AS (
              SELECT row_number() OVER () AS eid,
                     regexp_extract(line, 'source="([^"]*)"', 1) AS source,
                     regexp_extract(line, 'target="([^"]*)"', 1) AS target,
                     regexp_extract_all(line, '<data key="([^"]*)">', 1) AS dk,
                     regexp_extract_all(line, '<data key="[^"]*">([^<]*)</data>', 1) AS dv
              FROM raw WHERE regexp_matches(line, '<edge ')),
            edata AS (SELECT eid, unnest(dk) AS kid, unnest(dv) AS v FROM edges),
            emap AS (SELECT e.eid, k.kname AS k, e.v
                     FROM edata e JOIN keys k ON k.kid = e.kid AND k.kfor = 'edge'),
            ert AS (SELECT eid, min(v) AS t FROM emap WHERE k = 'type' GROUP BY eid),
            eatt AS (SELECT eid, k, min(v) AS v FROM emap WHERE k <> 'type' GROUP BY eid, k),
            eattj AS (SELECT eid,
                             '{' || string_agg('"' || k || '": "' || v || '"', ', ' ORDER BY k) || '}' AS attributes
                      FROM eatt GROUP BY eid),
            rels AS (
              SELECT 'r' AS kind, '' AS id, '' AS name, '' AS entity_type,
                     coalesce(eattj.attributes, '{}') AS attributes,
                     edges.source, edges.target,
                     coalesce(ert.t, 'RELATED_TO') AS relation_type
              FROM edges
              LEFT JOIN ert USING (eid) LEFT JOIN eattj USING (eid))
            SELECT * FROM ents UNION ALL SELECT * FROM rels
        """.replace("{lines}", _staged_sql("graphml_import", "lines")),
        "kg_entities_fuzzy": """
            WITH e AS (SELECT * FROM {ents}),
            l AS (SELECT * FROM {links}),
            m AS (SELECT coalesce(l.canonical_id, e.entity_id) AS entity_id,
                         e.name, e.type, e.conf, e.mention_count
                  FROM e LEFT JOIN l ON e.entity_id = l.entity_id),
            pn AS (SELECT entity_id, name, type, max(conf) AS conf,
                          sum(mention_count) AS mc
                   FROM m GROUP BY entity_id, name, type),
            canon AS (SELECT entity_id, name,
                             row_number() OVER (PARTITION BY entity_id
                               ORDER BY mc DESC, length(name) DESC, name DESC) AS rn
                      FROM pn),
            typ AS (SELECT entity_id, type,
                           row_number() OVER (PARTITION BY entity_id
                             ORDER BY name ASC, type ASC) AS trn
                    FROM pn),
            tot AS (SELECT entity_id, max(conf) AS conf,
                           sum(mc)::BIGINT AS mention_count
                    FROM pn GROUP BY entity_id)
            SELECT t.entity_id, c.name, ty.type, t.conf, t.mention_count
            FROM tot t
            JOIN canon c ON t.entity_id = c.entity_id AND c.rn = 1
            JOIN typ ty ON t.entity_id = ty.entity_id AND ty.trn = 1
        """.replace("{ents}", _staged_sql("kg_entities_fuzzy", "exact_entities"))
           .replace("{links}", _staged_sql("kg_entities_fuzzy", "links")),
        "minhash_lsh_candidates": """
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*)::BIGINT AS n_bands
            FROM {t} a JOIN {t} b
              ON a.band = b.band AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        """.replace("{t}", _staged_sql("minhash_lsh_candidates")),
        "hybrid_search": """
            WITH s AS (
              SELECT doc_id, sum(1.0 / (60 + rank)) AS score
              FROM {t} GROUP BY doc_id),
            r AS (
              SELECT doc_id, round(score, 8) AS rrf_score,
                     row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
              FROM s)
            SELECT rank, doc_id, rrf_score FROM r WHERE rank <= 10
        """.replace("{t}", _staged_sql("hybrid_search")),
        "k_hop": """
            WITH RECURSIVE und AS (
              SELECT subj AS src, obj AS dst FROM {t}
              UNION SELECT obj, subj FROM {t}),
            seeds AS (SELECT node FROM (SELECT DISTINCT subj AS node FROM {t})
                      ORDER BY node LIMIT 3),
            walk(node, hop) AS (
              SELECT node, 0 FROM seeds
              UNION
              SELECT u.dst, w.hop + 1 FROM walk w
              JOIN und u ON u.src = w.node WHERE w.hop < 3)
            SELECT node, min(hop)::BIGINT AS hop FROM walk GROUP BY node
        """.replace("{t}", _staged_sql("k_hop")),
        "all_paths": """
            WITH RECURSIVE sym AS (
              SELECT src, dst, w FROM {t}
              UNION ALL SELECT dst, src, w FROM {t}),
            s AS (SELECT min(src) AS a, max(dst) AS b FROM {t}),
            walk(last, path, wsum, n) AS (
              SELECT a, a, 0.0::DOUBLE, 1 FROM s
              UNION ALL
              SELECT e.dst, w.path || '|' || e.dst, w.wsum + e.w, w.n + 1
              FROM walk w JOIN sym e ON e.src = w.last
              WHERE w.n < 4 AND w.last <> (SELECT b FROM s)
                AND position('|' || e.dst || '|'
                             IN '|' || w.path || '|') = 0)
            SELECT path, n::BIGINT AS n_nodes, wsum AS weight
            FROM walk WHERE last = (SELECT b FROM s)
        """.replace("{t}", _staged_sql("all_paths")),
        "centrality": """
            WITH RECURSIVE und AS (SELECT DISTINCT least(subj, obj) AS a,
                                          greatest(subj, obj) AS b
                           FROM {t} WHERE subj <> obj),
            sym AS (SELECT a AS src, b AS dst FROM und
                    UNION SELECT b, a FROM und),
            nodes AS (SELECT DISTINCT src AS node FROM sym),
            nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
            walk(src, node, d) AS (
              SELECT node, node, 0 FROM nodes
              UNION
              SELECT w.src, s.dst, w.d + 1
              FROM walk w JOIN sym s ON s.src = w.node
              WHERE w.d < 12),
            dist AS (SELECT src, node, min(d)::BIGINT AS d
                     FROM walk GROUP BY src, node),
            deg AS (SELECT src AS node, count(*)::BIGINT AS k
                    FROM sym GROUP BY src),
            clos AS (SELECT src AS node,
                            count(*) - 1 AS reach,
                            sum(d)::BIGINT AS total
                     FROM dist GROUP BY src),
            betw AS (SELECT v.node, count(*)::BIGINT AS cnt
                     FROM nodes v
                     JOIN dist d1 ON d1.node = v.node AND d1.src <> v.node
                     JOIN dist d2 ON d2.src = v.node AND d2.node <> v.node
                     JOIN dist d3 ON d3.src = d1.src AND d3.node = d2.node
                     WHERE d1.src <> d2.node AND d1.d + d2.d = d3.d
                     GROUP BY v.node)
            SELECT nd.node,
                   CASE WHEN nn.n > 1 THEN deg.k / (nn.n - 1.0)
                        ELSE 0.0 END AS degree_centrality,
                   CASE WHEN nn.n > 2
                        THEN coalesce(betw.cnt, 0)
                             / ((nn.n - 1.0) * (nn.n - 2.0) / 2.0)
                        ELSE 0.0 END AS betweenness,
                   CASE WHEN clos.reach > 0 AND clos.total > 0
                        THEN clos.reach * 1.0 / clos.total
                        ELSE 0.0 END AS closeness
            FROM nodes nd CROSS JOIN nn
            JOIN deg ON deg.node = nd.node
            LEFT JOIN clos ON clos.node = nd.node
            LEFT JOIN betw ON betw.node = nd.node
        """.replace("{t}", _staged_sql("centrality")),
        "frame_samples": """
            WITH v AS (
              SELECT media_id, n_bytes, (n_bytes // 1000 + 1) AS dur
              FROM {m} WHERE media_type = 'video'),
            f AS (SELECT media_id, dur, least(8, dur) AS n FROM v),
            gs AS (SELECT unnest(range(0, 8)) AS idx)
            SELECT f.media_id, gs.idx::BIGINT AS frame_idx,
                   gs.idx * (f.dur * 1.0 / f.n) AS t_offset_s
            FROM f CROSS JOIN gs WHERE gs.idx < f.n
        """.replace("{m}", _staged_sql("frame_samples")),
        "triangle_counts": """
            WITH und AS (SELECT DISTINCT least(subj, obj) AS a,
                                         greatest(subj, obj) AS b
                         FROM {t} WHERE subj <> obj),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM und e1 JOIN und e2 ON e2.a = e1.b
                                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
            tn AS (SELECT node, count(*)::BIGINT AS triangles FROM (
                     SELECT x AS node FROM tri
                     UNION ALL SELECT y FROM tri
                     UNION ALL SELECT z FROM tri) GROUP BY node),
            deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
                     SELECT a AS node FROM und
                     UNION ALL SELECT b FROM und) GROUP BY node)
            SELECT d.node, d.degree,
                   coalesce(tn.triangles, 0)::BIGINT AS triangles,
                   CASE WHEN d.degree >= 2
                        THEN (2.0 * coalesce(tn.triangles, 0))
                             / (d.degree * (d.degree - 1.0))
                        ELSE 0.0 END AS local_cc
            FROM deg d LEFT JOIN tn USING (node)
        """.replace("{t}", _staged_sql("triangle_counts")),
        "graph_statistics": """
            WITH RECURSIVE und AS (SELECT DISTINCT least(subj, obj) AS a,
                                          greatest(subj, obj) AS b
                           FROM {t} WHERE subj <> obj),
            sym AS (SELECT a AS src, b AS dst FROM und
                    UNION SELECT b, a FROM und),
            nodes AS (SELECT DISTINCT src AS node FROM sym),
            r(node, lab) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT u.dst, r.lab FROM r JOIN sym u ON u.src = r.node),
            comps AS (SELECT node, min(lab) AS lab FROM r GROUP BY node),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM und e1 JOIN und e2 ON e2.a = e1.b
                                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
            tn AS (SELECT node, count(*)::BIGINT AS triangles FROM (
                     SELECT x AS node FROM tri
                     UNION ALL SELECT y FROM tri
                     UNION ALL SELECT z FROM tri) GROUP BY node),
            deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
                     SELECT a AS node FROM und
                     UNION ALL SELECT b FROM und) GROUP BY node),
            cc AS (SELECT d.node, d.degree,
                          CASE WHEN d.degree >= 2
                               THEN (2.0 * coalesce(tn.triangles, 0))
                                    / (d.degree * (d.degree - 1.0))
                               ELSE 0.0 END AS c
                   FROM deg d LEFT JOIN tn USING (node))
            SELECT (SELECT count(*) FROM deg)::BIGINT AS node_count,
                   (SELECT count(*) FROM und)::BIGINT AS edge_count,
                   (SELECT max(degree) FROM deg)::BIGINT AS max_degree,
                   (SELECT count(DISTINCT lab) FROM comps)::BIGINT
                     AS connected_components,
                   round((2.0 * (SELECT count(*) FROM und))
                         / (SELECT count(*) FROM deg), 9) AS average_degree,
                   round((2.0 * (SELECT count(*) FROM und))
                         / ((SELECT count(*) FROM deg)
                            * ((SELECT count(*) FROM deg) - 1.0)), 9) AS density,
                   round((SELECT sum(c) FROM cc WHERE degree >= 2)
                         / (SELECT count(*) FROM cc WHERE degree >= 2), 9)
                     AS clustering_coefficient
        """.replace("{t}", _staged_sql("graph_statistics")),
        "doc_tree": """
            WITH leaves AS (
              SELECT doc_id, chunk_id,
                     regexp_extract(chunk_id, '_(\\d+)$', 1)::BIGINT AS pos
              FROM {s}),
            docs AS (SELECT doc_id, count(*) AS n FROM leaves GROUP BY doc_id),
            leaf_rows AS (
              SELECT l.doc_id, 'leaf_' || l.chunk_id AS node_id,
                     0::BIGINT AS level,
                     CASE WHEN d.n > 1
                          THEN 'level_1_' || (l.pos // 5)
                          ELSE NULL END AS parent_id,
                     0::BIGINT AS n_children, 1::BIGINT AS n_leaves
              FROM leaves l JOIN docs d USING (doc_id)),
            lv AS (SELECT unnest(range(1, 10)) AS L),
            ks AS (SELECT unnest(range(0, greatest(
                     (SELECT max(n)::BIGINT FROM docs), 1))) AS k),
            lk AS (
              SELECT d.doc_id, d.n, l.L, k.k,
                     power(5, l.L)::BIGINT AS p,
                     power(5, l.L - 1)::BIGINT AS pp
              FROM docs d CROSS JOIN lv l CROSS JOIN ks k),
            inner_rows AS (
              SELECT doc_id, 'level_' || L || '_' || k AS node_id,
                     L::BIGINT AS level,
                     CASE WHEN ((n + p - 1) // p) > 1
                          THEN 'level_' || (L + 1) || '_' || (k // 5)
                          ELSE NULL END AS parent_id,
                     least(5, ((n + pp - 1) // pp) - 5 * k)::BIGINT AS n_children,
                     least(p, n - p * k)::BIGINT AS n_leaves
              FROM lk
              WHERE ((n + pp - 1) // pp) > 1
                AND k < ((n + p - 1) // p))
            SELECT * FROM leaf_rows UNION ALL SELECT * FROM inner_rows
        """.replace("{s}", _staged_sql("doc_tree")),
        "gleaning_triples": """
            WITH tr AS (SELECT * FROM {s}),
            er AS (SELECT chunk_id, seq, round, name, lower(name) AS key,
                          type, length(description)::BIGINT AS dl
                   FROM tr WHERE kind = 'e'),
            seed0 AS (
              SELECT chunk_id, key,
                     CASE WHEN count(*) FILTER (WHERE round = 1) > 0
                          THEN max(seq) FILTER (WHERE round = 1)
                          ELSE min(seq) END AS seed_seq
              FROM er GROUP BY chunk_id, key),
            seedrow AS (
              SELECT e.chunk_id, e.key, e.seq AS seed_seq, e.dl AS seed_dl
              FROM er e JOIN seed0 s
                ON e.chunk_id = s.chunk_id AND e.key = s.key
               AND e.seq = s.seed_seq),
            cand AS (
              SELECT e.chunk_id, e.key, e.seq, e.dl
              FROM er e JOIN seedrow s
                ON e.chunk_id = s.chunk_id AND e.key = s.key
              WHERE e.round > 1 AND e.seq > s.seed_seq),
            candwin AS (
              SELECT c.chunk_id, c.key, a.mx, min(c.seq) AS first_mx_seq
              FROM cand c
              JOIN (SELECT chunk_id, key, max(dl) AS mx
                    FROM cand GROUP BY chunk_id, key) a
                ON c.chunk_id = a.chunk_id AND c.key = a.key AND c.dl = a.mx
              GROUP BY c.chunk_id, c.key, a.mx),
            win AS (
              SELECT s.chunk_id, s.key,
                     CASE WHEN cw.mx IS NOT NULL AND cw.mx > s.seed_dl
                          THEN cw.first_mx_seq ELSE s.seed_seq END AS win_seq
              FROM seedrow s LEFT JOIN candwin cw
                ON s.chunk_id = cw.chunk_id AND s.key = cw.key),
            idmap AS (
              SELECT e.chunk_id, e.key,
                     e.type || '_' ||
                     regexp_replace(lower(e.name), '[^a-z0-9_]', '', 'g')
                       AS eid
              FROM er e JOIN win w
                ON e.chunk_id = w.chunk_id AND e.key = w.key
               AND e.seq = w.win_seq
              WHERE e.name <> ''),
            rd0 AS (
              SELECT chunk_id, source, target, relation_type, min(seq) AS seq
              FROM tr WHERE kind = 't'
              GROUP BY chunk_id, source, target, relation_type)
            SELECT r.chunk_id, ms.eid AS subj, r.relation_type AS pred,
                   mt.eid AS obj
            FROM rd0 r
            JOIN idmap ms ON ms.chunk_id = r.chunk_id
                         AND ms.key = lower(r.source)
            JOIN idmap mt ON mt.chunk_id = r.chunk_id
                         AND mt.key = lower(r.target)
        """.replace("{s}", _staged_sql("gleaning_triples")),
        "semantic_chunks": """
            WITH sents AS (SELECT * FROM {s}),
            d AS (SELECT doc_id, sent_idx, diff FROM sents
                  WHERE diff IS NOT NULL),
            thr AS (
              SELECT doc_id, diff AS thr FROM (
                SELECT doc_id, diff,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY diff ASC) AS rk,
                       count(*) OVER (PARTITION BY doc_id) AS n
                FROM d) z
              WHERE rk - 1 = least((floor(n * 80.0 / 100.0))::BIGINT, n - 1)),
            flags AS (
              SELECT s.doc_id, s.sent_idx, s.sentence,
                     CASE WHEN dd.diff > t.thr THEN 1 ELSE 0 END AS brk
              FROM sents s
              LEFT JOIN d dd ON dd.doc_id = s.doc_id
                            AND dd.sent_idx = s.sent_idx - 1
              LEFT JOIN thr t ON t.doc_id = s.doc_id),
            segs AS (
              SELECT doc_id, sent_idx, sentence,
                     sum(brk) OVER (PARTITION BY doc_id
                                    ORDER BY sent_idx) AS seg
              FROM flags),
            chunks AS (
              SELECT doc_id, seg,
                     string_agg(sentence, ' ' ORDER BY sent_idx) AS text,
                     count(*)::BIGINT AS sentence_count,
                     min(sent_idx) AS s0
              FROM segs GROUP BY doc_id, seg)
            SELECT doc_id,
                   (row_number() OVER (PARTITION BY doc_id ORDER BY s0) - 1)
                     ::BIGINT AS chunk_idx,
                   text, sentence_count
            FROM chunks
        """.replace("{s}", _staged_sql("semantic_chunks")),
        "multimodal_features": """
            WITH m AS (SELECT * FROM {s}),
            dims AS (
              SELECT media_id, media_type, n_bytes,
                     (16 + digest[17] % 240)::INTEGER AS width,
                     (16 + digest[18] % 240)::INTEGER AS height,
                     unnest(range(0, 16)) AS dim,
                     unnest(digest[1:16]) AS b
              FROM m)
            SELECT media_id, media_type, n_bytes, width, height, dim,
                   (b::DOUBLE / 255.0)::FLOAT4 AS value
            FROM dims
        """.replace("{s}", _staged_sql("multimodal_features")),
        "kg_extract_text": """
            SELECT url AS doc_id, title,
                   CASE WHEN html_s IS NOT NULL AND length(html_s) > 0
                        THEN trim(replace(regexp_replace(
                               html_s, '<[^>]*(>|$)', '', 'g'), '>', ''),
                             {ws})
                        ELSE coalesce(text_s, '') END AS text,
                   lang
            FROM {s}
        """.replace("{s}", _staged_sql("kg_extract_text"))
          .replace("{ws}", "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"),
        "community_summaries": """
            WITH m AS (SELECT community, name, type, mention_count FROM {s}),
            counts AS (SELECT community, count(*)::BIGINT AS n_entities
                       FROM m GROUP BY community),
            ranked AS (
              SELECT community, type, name,
                     row_number() OVER (PARTITION BY community, type
                                        ORDER BY mention_count DESC, name ASC) AS rk,
                     count(*) OVER (PARTITION BY community, type) AS type_n
              FROM m),
            type_lines AS (
              SELECT community, type,
                     '- ' || type || ': ' ||
                     string_agg(name, ', ' ORDER BY rk) ||
                     CASE WHEN max(type_n) > 5
                          THEN ' and ' || (max(type_n) - 5)::VARCHAR || ' more'
                          ELSE '' END AS line
              FROM ranked WHERE rk <= 5 GROUP BY community, type),
            body AS (SELECT community, string_agg(line, chr(10) ORDER BY type) AS lines
                     FROM type_lines GROUP BY community),
            assembled AS (
              SELECT c.community, c.n_entities,
                     'Community ' || c.community || ' (Level 0)' || chr(10) ||
                     'Contains ' || c.n_entities::VARCHAR || ' entities:' || chr(10) ||
                     b.lines AS s
              FROM counts c JOIN body b USING (community))
            SELECT community, n_entities,
                   CASE WHEN length(s) > 500 THEN substr(s, 1, 497) || '...'
                        ELSE s END AS summary
            FROM assembled
        """.replace("{s}", _staged_sql("community_summaries")),
        "consistency_report": """
            WITH e AS (SELECT * FROM {e}),
            t AS (SELECT * FROM {t}),
            ep AS (SELECT subj AS name FROM t UNION SELECT obj FROM t)
            SELECT (SELECT count(*) FROM e)::BIGINT AS n_entities,
                   (SELECT count(*) FROM t)::BIGINT AS n_triples,
                   (SELECT count(*) FROM e
                    WHERE name NOT IN (SELECT name FROM ep))::BIGINT AS n_orphaned,
                   (SELECT count(*) FROM t
                    WHERE subj NOT IN (SELECT name FROM e)
                       OR obj NOT IN (SELECT name FROM e))::BIGINT AS n_broken,
                   (SELECT count(*) FROM e
                    WHERE embedding IS NULL)::BIGINT AS n_missing_embeddings,
                   ((SELECT count(*) FROM e WHERE name NOT IN (SELECT name FROM ep))
                    + (SELECT count(*) FROM t WHERE subj NOT IN (SELECT name FROM e)
                                                 OR obj NOT IN (SELECT name FROM e))
                    + (SELECT count(*) FROM e WHERE embedding IS NULL)
                   )::BIGINT AS issues_found,
                   CASE WHEN ((SELECT count(*) FROM e WHERE name NOT IN (SELECT name FROM ep))
                    + (SELECT count(*) FROM t WHERE subj NOT IN (SELECT name FROM e)
                                                 OR obj NOT IN (SELECT name FROM e))
                    + (SELECT count(*) FROM e WHERE embedding IS NULL)) = 0
                        THEN 1 ELSE 0 END::BIGINT AS is_consistent
        """.replace("{e}", _staged_sql("consistency_report"))
          .replace("{t}", _staged_sql("consistency_report", "triples")),
        "lsh_buckets": """
            SELECT e.vec_id,
                   sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) > 0
                            THEN (1::BIGINT << p.plane_idx::INT)
                            ELSE 0 END)::BIGINT AS bucket
            FROM embeddings e CROSS JOIN {p} p
            GROUP BY e.vec_id
        """.replace("{p}", _staged_sql("lsh_buckets")),
        "ngram_dedup_pairs": """
            WITH cand AS (SELECT doc_a, doc_b FROM {c}),
            cd AS (SELECT DISTINCT doc_id FROM
                   (SELECT doc_a AS doc_id FROM cand
                    UNION SELECT doc_b FROM cand)),
            docs AS (SELECT d.doc_id,
                            lower(CASE WHEN length(trim(d.text)) = 0 THEN ''
                                  ELSE array_to_string(
                                    regexp_split_to_array(trim(d.text), '\\s+'), ' ')
                                  END) AS s
                     FROM documents d JOIN cd USING (doc_id)),
            gs AS (SELECT unnest(range(1, 1 + greatest(
                     (SELECT max(length(s))::INT FROM docs), 1))) AS i),
            ngrams AS (
              SELECT doc_id, substr(s, g.i::INT, 3) AS ng
              FROM docs CROSS JOIN gs g
              WHERE length(s) >= 3 AND g.i <= length(s) - 2
              UNION
              SELECT doc_id, s FROM docs WHERE length(s) BETWEEN 1 AND 2),
            sizes AS (SELECT doc_id, count(*) AS nn FROM ngrams GROUP BY doc_id),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS i
              FROM cand c JOIN ngrams na ON na.doc_id = c.doc_a
                          JOIN ngrams nb ON nb.doc_id = c.doc_b
                                        AND nb.ng = na.ng
              GROUP BY c.doc_a, c.doc_b),
            jac AS (
              SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS i,
                     coalesce(sa.nn, 0) + coalesce(sb.nn, 0)
                       - coalesce(i.i, 0) AS u
              FROM cand c
              LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
              LEFT JOIN sizes sa ON sa.doc_id = c.doc_a
              LEFT JOIN sizes sb ON sb.doc_id = c.doc_b)
            SELECT doc_a, doc_b,
                   CASE WHEN u = 0 THEN 1.0
                        ELSE round(i * 1.0 / u, 4) END AS jaccard
            FROM jac
            WHERE (CASE WHEN u = 0 THEN 1.0 ELSE i * 1.0 / u END) >= 0.8
        """.replace("{c}", _staged_sql("ngram_dedup_pairs")),
        # transitive clustering: the same trigram-Jaccard verify as
        # ngram_dedup_pairs, then a recursive reachability closure over
        # the verified pairs (MATERIALIZED is mandatory on CTEs the
        # recursive arm references — DuckDB re-inlines them otherwise),
        # min-member label, sizes, and the keep flag over ALL documents
        "dedup_clusters": """
            WITH RECURSIVE cand AS (SELECT doc_a, doc_b FROM {c}),
            cd AS (SELECT DISTINCT doc_id FROM
                   (SELECT doc_a AS doc_id FROM cand
                    UNION SELECT doc_b FROM cand)),
            docs AS (SELECT d.doc_id,
                            lower(CASE WHEN length(trim(d.text)) = 0 THEN ''
                                  ELSE array_to_string(
                                    regexp_split_to_array(trim(d.text), '\\s+'), ' ')
                                  END) AS s
                     FROM documents d JOIN cd USING (doc_id)),
            gs AS (SELECT unnest(range(1, 1 + greatest(
                     (SELECT max(length(s))::INT FROM docs), 1))) AS i),
            -- inside a WITH RECURSIVE clause DuckDB does NOT apply the
            -- set-semantics dedup of a plain UNION in non-recursive CTEs
            -- (measured: trigram multiplicities leak through and the
            -- union-size arithmetic goes negative) — dedup explicitly
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id, substr(s, g.i::INT, 3) AS ng
                FROM docs CROSS JOIN gs g
                WHERE length(s) >= 3 AND g.i <= length(s) - 2
                UNION ALL
                SELECT doc_id, s FROM docs
                WHERE length(s) BETWEEN 1 AND 2)),
            sizes AS (SELECT doc_id, count(*) AS nn FROM ngrams GROUP BY doc_id),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS i
              FROM cand c JOIN ngrams na ON na.doc_id = c.doc_a
                          JOIN ngrams nb ON nb.doc_id = c.doc_b
                                        AND nb.ng = na.ng
              GROUP BY c.doc_a, c.doc_b),
            jac AS (
              SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS i,
                     coalesce(sa.nn, 0) + coalesce(sb.nn, 0)
                       - coalesce(i.i, 0) AS u
              FROM cand c
              LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
              LEFT JOIN sizes sa ON sa.doc_id = c.doc_a
              LEFT JOIN sizes sb ON sb.doc_id = c.doc_b),
            und AS MATERIALIZED (
              SELECT src, dst FROM (
                SELECT doc_a AS src, doc_b AS dst FROM jac
                WHERE (CASE WHEN u = 0 THEN 1.0 ELSE i * 1.0 / u END) >= 0.8
                UNION
                SELECT doc_b, doc_a FROM jac
                WHERE (CASE WHEN u = 0 THEN 1.0 ELSE i * 1.0 / u END) >= 0.8)),
            vnodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM und),
            r(node, lab) AS (
              SELECT node, node FROM vnodes
              UNION
              SELECT u.dst, r.lab FROM r JOIN und u ON u.src = r.node),
            comp AS (SELECT node AS doc_id, min(lab) AS cluster
                     FROM r GROUP BY node),
            csize AS (SELECT cluster, count(*)::BIGINT AS cluster_size
                      FROM comp GROUP BY cluster)
            SELECT d.doc_id,
                   coalesce(cm.cluster, d.doc_id) AS cluster,
                   coalesce(cs.cluster_size, 1)::BIGINT AS cluster_size,
                   (CASE WHEN coalesce(cm.cluster, d.doc_id) = d.doc_id
                         THEN 1 ELSE 0 END)::BIGINT AS is_kept
            FROM documents d
            LEFT JOIN comp cm USING (doc_id)
            LEFT JOIN csize cs ON cs.cluster = cm.cluster
        """.replace("{c}", _staged_sql("dedup_clusters")),
        "simhash_dup_pairs": """
            WITH s AS (SELECT doc_id, simhash FROM {s}),
            bands AS (
              SELECT doc_id, b.i AS band,
                     (simhash >> (16 * b.i)::INT) & 65535::UBIGINT
                       AS band_val
              FROM s CROSS JOIN generate_series(0, 3) b(i)),
            cand AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
              FROM bands x JOIN bands y
                ON x.band = y.band AND x.band_val = y.band_val
               AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id),
            h AS (
              SELECT c.doc_a, c.doc_b,
                     bit_count(xor(sa.simhash, sb.simhash))::BIGINT
                       AS hamming
              FROM cand c JOIN s sa ON sa.doc_id = c.doc_a
                          JOIN s sb ON sb.doc_id = c.doc_b)
            SELECT doc_a, doc_b, hamming FROM h WHERE hamming <= 3
        """.replace("{s}", _staged_sql("simhash_dup_pairs")),
        # cross-path oracle: Ray = Manku permuted-prefix tables, SQL =
        # pigeonhole banding — identical ground truth (both exact-recall
        # for Hamming ≤ 3 + popcount verify)
        "simhash_dup_pairs_manku": """
            WITH s AS (SELECT doc_id, simhash FROM {s}),
            bands AS (
              SELECT doc_id, b.i AS band,
                     (simhash >> (16 * b.i)::INT) & 65535::UBIGINT
                       AS band_val
              FROM s CROSS JOIN generate_series(0, 3) b(i)),
            cand AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
              FROM bands x JOIN bands y
                ON x.band = y.band AND x.band_val = y.band_val
               AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id),
            h AS (
              SELECT c.doc_a, c.doc_b,
                     bit_count(xor(sa.simhash, sb.simhash))::BIGINT
                       AS hamming
              FROM cand c JOIN s sa ON sa.doc_id = c.doc_a
                          JOIN s sb ON sb.doc_id = c.doc_b)
            SELECT doc_a, doc_b, hamming FROM h WHERE hamming <= 3
        """.replace("{s}", _staged_sql("simhash_dup_pairs_manku")),
        "corpus_curation": """
            WITH w AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS words
              FROM documents),
            q AS (
              SELECT doc_id, text,
                     CASE WHEN regexp_matches(text, '[ñóéíáú]') THEN 'es'
                          WHEN regexp_matches(text, '[çãõ]') THEN 'pt'
                          WHEN regexp_matches(text, '[àèùò]') THEN 'fr'
                          ELSE 'en' END AS lang_pred,
                     len(words)::BIGINT AS n_tokens,
                     length(text)::BIGINT AS n_chars,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE length(regexp_replace(text, '[\\p{L}\\p{N}\\p{Z}\\s]', '', 'g')) * 1.0
                               / length(text) END AS punct_ratio,
                     CASE WHEN len(words) = 0 THEN 0.0
                          ELSE len(list_filter(words, x -> lower(x) IN {stop})) * 1.0
                               / len(words) END AS stopword_ratio
              FROM w),
            filt AS (
              SELECT * FROM q
              WHERE lang_pred = 'en' AND n_tokens >= 20
                AND punct_ratio <= 0.2 AND stopword_ratio >= 0.01),
            ex AS (
              SELECT md5(text) AS fp, min(doc_id) AS keep_id,
                     count(*)::BIGINT AS n_exact_dups
              FROM filt GROUP BY md5(text)),
            surv AS (
              SELECT f.doc_id, f.text, f.lang_pred, f.n_tokens, f.n_chars,
                     f.punct_ratio, f.stopword_ratio, e.n_exact_dups
              FROM filt f JOIN ex e ON f.doc_id = e.keep_id),
            cand AS (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
              FROM {b} x JOIN {b} y
                ON x.band = y.band AND x.band_hash = y.band_hash
               AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id),
            cd AS (SELECT DISTINCT doc_id FROM
                   (SELECT doc_a AS doc_id FROM cand
                    UNION SELECT doc_b FROM cand)),
            docs AS (SELECT sv.doc_id,
                            lower(CASE WHEN length(trim(sv.text)) = 0 THEN ''
                                  ELSE array_to_string(
                                    regexp_split_to_array(trim(sv.text), '\\s+'), ' ')
                                  END) AS s
                     FROM surv sv JOIN cd USING (doc_id)),
            gs AS (SELECT unnest(range(1, 1 + coalesce(
                     (SELECT max(length(s))::INT FROM docs), 1))) AS i),
            ngrams AS (
              SELECT doc_id, substr(s, g.i::INT, 3) AS ng
              FROM docs CROSS JOIN gs g
              WHERE length(s) >= 3 AND g.i <= length(s) - 2
              UNION
              SELECT doc_id, s FROM docs WHERE length(s) BETWEEN 1 AND 2),
            sizes AS (SELECT doc_id, count(*) AS nn FROM ngrams GROUP BY doc_id),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS i
              FROM cand c JOIN ngrams na ON na.doc_id = c.doc_a
                          JOIN ngrams nb ON nb.doc_id = c.doc_b
                                        AND nb.ng = na.ng
              GROUP BY c.doc_a, c.doc_b),
            jac AS (
              SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS i,
                     coalesce(sa.nn, 0) + coalesce(sb.nn, 0)
                       - coalesce(i.i, 0) AS u
              FROM cand c
              LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
              LEFT JOIN sizes sa ON sa.doc_id = c.doc_a
              LEFT JOIN sizes sb ON sb.doc_id = c.doc_b),
            dropped AS (
              SELECT DISTINCT doc_b AS doc_id FROM jac
              WHERE (CASE WHEN u = 0 THEN 1.0 ELSE i * 1.0 / u END) >= 0.8)
            SELECT sv.doc_id, sv.lang_pred, sv.n_tokens, sv.n_chars,
                   sv.punct_ratio, sv.stopword_ratio, sv.n_exact_dups
            FROM surv sv LEFT JOIN dropped d ON sv.doc_id = d.doc_id
            WHERE d.doc_id IS NULL
        """.replace("{b}", _staged_sql("corpus_curation"))
           .replace("{stop}", _STOPLIST_SQL),
        "simhash_signatures": """
            WITH vocab AS (SELECT word, h FROM {v}),
            words AS (
              SELECT d.doc_id,
                     unnest(regexp_split_to_array(lower(trim(d.text)), '\\s+')) AS w
              FROM documents d WHERE length(trim(d.text)) > 0),
            wh AS (SELECT words.doc_id, v.h AS h
                   FROM words JOIN vocab v ON v.word = words.w),
            cnt AS (SELECT doc_id, count(*)::BIGINT AS n FROM wh GROUP BY doc_id),
            votes AS (
              SELECT w.doc_id, b.i AS bit,
                     2 * sum(((w.h >> b.i::INT) & 1)::BIGINT) AS pos2
              FROM wh w CROSS JOIN generate_series(0, 63) b(i)
              GROUP BY w.doc_id, b.i),
            sig AS (
              SELECT v.doc_id,
                     sum(CASE WHEN v.pos2 - c.n > 0
                              THEN (1::HUGEINT << v.bit::INT)
                              ELSE 0::HUGEINT END)::UBIGINT AS simhash
              FROM votes v JOIN cnt c USING (doc_id) GROUP BY v.doc_id)
            SELECT d.doc_id, coalesce(s.simhash, 0)::UBIGINT AS simhash
            FROM documents d LEFT JOIN sig s USING (doc_id)
        """.replace("{v}", _staged_sql("simhash_signatures")),
        "ivf_topk": """
            WITH a AS (SELECT vec_id, cluster FROM {a}),
            pr AS (SELECT query_id, cluster FROM {p}),
            scored AS (
              SELECT pr.query_id, a.vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS score
              FROM pr JOIN a USING (cluster)
                   JOIN embeddings e ON e.vec_id = a.vec_id
                   JOIN embeddings q ON q.vec_id = pr.query_id),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, vec_id ASC) AS rank
              FROM scored)
            SELECT query_id, vec_id, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 10
        """.replace("{a}", _staged_sql("ivf_topk"))
          .replace("{p}", _staged_sql("ivf_topk", "probe")),
        "hnsw_topk": """
            WITH c AS (SELECT DISTINCT query_id, vec_id FROM {c}),
            scored AS (
              SELECT c.query_id, c.vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS score
              FROM c JOIN embeddings e ON e.vec_id = c.vec_id
                     JOIN embeddings q ON q.vec_id = c.query_id),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, vec_id ASC) AS rank
              FROM scored)
            SELECT query_id, vec_id, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 10
        """.replace("{c}", _staged_sql("hnsw_topk")),
        "connected_components": """
            WITH RECURSIVE und AS (
              SELECT a AS src, b AS dst FROM (
                SELECT subj AS a, obj AS b FROM {t} WHERE subj <> obj
                UNION SELECT obj, subj FROM {t} WHERE subj <> obj)),
            nodes AS (SELECT DISTINCT src AS node FROM und),
            r(node, lab) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT u.dst, r.lab FROM r JOIN und u ON u.src = r.node)
            SELECT node, min(lab) AS component FROM r GROUP BY node
        """.replace("{t}", _staged_sql("connected_components")),
        # Leiden refinement + labeling re-derived from the staged
        # local-move assignment: per-lm connected components (recursive
        # reachability closure, leiden.rs:594-668 split semantics) then
        # community = smallest member name.  MATERIALIZED is mandatory on
        # CTEs referenced from the recursive arm (DuckDB re-inlines them
        # per iteration otherwise).
        "communities": """
            WITH RECURSIVE lm AS MATERIALIZED (
              SELECT node, lm FROM {a}),
            ed AS (SELECT a, b FROM {e} WHERE a <> b),
            eds AS MATERIALIZED (
              SELECT e.a, e.b, la.lm FROM (
                 SELECT a, b FROM ed UNION SELECT b, a FROM ed) e
              JOIN lm la ON la.node = e.a
              JOIN lm lb ON lb.node = e.b
              WHERE la.lm = lb.lm),
            r(node, dst, lm) AS (
              SELECT node, node, lm FROM lm
              UNION
              SELECT r.node, e.b, r.lm
              FROM r JOIN eds e ON e.a = r.dst AND e.lm = r.lm),
            comp AS (SELECT node, lm, min(dst) AS comp_label
                     FROM r GROUP BY node, lm),
            grp AS (SELECT lm, comp_label, min(node) AS community
                    FROM comp GROUP BY lm, comp_label)
            SELECT c.node AS node, g.community AS community
            FROM comp c
            JOIN grp g ON g.lm = c.lm AND g.comp_label = c.comp_label
        """.replace("{a}", _staged_sql("communities", "assign"))
           .replace("{e}", _staged_sql("communities", "edges")),
        "degree_stats": """
            WITH ep AS (
              SELECT subj AS node, 1 AS out_d, 0 AS in_d FROM {t}
              UNION ALL SELECT obj, 0, 1 FROM {t}),
            deg AS (SELECT node, sum(out_d)::BIGINT AS out_deg,
                           sum(in_d)::BIGINT AS in_deg
                    FROM ep GROUP BY node),
            n AS (SELECT count(*) AS n FROM deg)
            SELECT node, out_deg, in_deg,
                   (out_deg + in_deg)::BIGINT AS degree,
                   CASE WHEN n.n > 1
                        THEN (out_deg + in_deg) * 1.0 / (n.n - 1)
                        ELSE 0.0 END AS degree_centrality
            FROM deg CROSS JOIN n
        """.replace("{t}", _staged_sql("degree_stats")),
        "semantic_edges": """
            WITH e AS (SELECT entity_id, embedding FROM {t}),
            scored AS (
              SELECT a.entity_id AS subj, b.entity_id AS obj,
                     round(list_cosine_similarity(a.embedding, b.embedding), 12) AS conf
              FROM e a JOIN e b ON a.entity_id <> b.entity_id),
            ranked AS (
              SELECT subj, obj, conf,
                     row_number() OVER (PARTITION BY subj
                       ORDER BY conf DESC, obj ASC) AS rank
              FROM scored WHERE conf > 0.8)
            SELECT subj, 'SEMANTICALLY_SIMILAR' AS pred, obj, conf,
                   rank::BIGINT AS rank
            FROM ranked WHERE rank <= 10
        """.replace("{t}", _staged_sql("semantic_edges")),
    }


# ------------------------------------------------- ROGRAG oracle SQL --
# All five generators build their SQL from the SAME pattern-spec tables
# the Python kernels compile (functions/rograg.py) — parity by
# construction.  DuckDB regexp_* is RE2, matching the reference's Rust
# regex crate (and Python `re` for these patterns).


def _sqq(s: str) -> str:
    return s.replace("'", "''")


_WORDS_LQ = r"list_filter(string_split_regex(lq, '\s+'), x -> x <> '')"
_WORDS_RAW = r"list_filter(string_split_regex(query, '\s+'), x -> x <> '')"
_PL = r"\p{L}"


def _intents_sql() -> str:
    """Generated from INTENT_SPECS (``intent_classifier.rs:312-614``):
    per-intent keyword-contains + regex scores, deterministic ranking
    (score desc, intent asc), ambiguity (secondary > 0.8×primary),
    inappropriate gate, complexity + reformulation."""
    from graphrag_rs_ray.functions.rograg import (
        INAPPROPRIATE_RE, INTENT_SPECS, REFORMULATION_MSGS)
    src = _staged_sql("query_intents")
    scores = ",\n          ".join(
        f"least(({' + '.join(f'''contains(lq, '{_sqq(k)}')::INT''' for k in kws)})::DOUBLE"
        f" / {len(kws)} * 0.5 + "
        f"({' + '.join(f'''regexp_matches(lq, '{_sqq(r)}')::INT''' for r in rxs)})::DOUBLE"
        f" / {len(rxs)} * 0.5, 1.0) AS s_{name}"
        for name, kws, rxs in INTENT_SPECS)
    wc = f"len({_WORDS_LQ})"
    sc = ("greatest(strlen(lq) - strlen(replace(replace(replace(lq, '.', '')"
          ", '?', ''), '!', '')), 1)")
    alpha = "(length(lq) - length(regexp_replace(lq, '" + _PL + "', '', 'g')))"
    cx = (f"least(least({wc} / 20.0, 1.0) * 0.3"
          f" + least({sc} / 3.0, 1.0) * 0.2"
          f" + least({alpha}::DOUBLE / greatest({wc}, 1) / 8.0, 1.0) * 0.2"
          " + CASE WHEN contains(lq, ' and ') OR contains(lq, ' or ')"
          " OR contains(lq, ' but ') OR contains(lq, ' because ')"
          " OR contains(lq, ' since ') OR contains(lq, ' although ')"
          " THEN 0.3 ELSE 0.0 END, 1.0)")
    msgs = {k: _sqq(v) for k, v in REFORMULATION_MSGS.items()}
    reform = (f"CASE WHEN starts_with(lq, 'tell me about') THEN '{msgs['tell']}'"
              f" WHEN contains(lq, ' and ') THEN '{msgs['and']}'"
              f" WHEN len({_WORDS_RAW}) > 20 THEN '{msgs['long']}'"
              " WHEN NOT (ends_with(query, '?') OR ends_with(query, '.')"
              f" OR ends_with(query, '!')) THEN '{msgs['punct']}'"
              f" ELSE '{msgs['default']}' END")
    unp = "\n          UNION ALL ".join(
        f"SELECT query_id, '{name}' AS intent, s_{name} AS s FROM base"
        f" WHERE s_{name} > 0" for name, _, _ in INTENT_SPECS)
    return f"""
        WITH qt AS (SELECT query_id, query, lower(query) AS lq FROM {src}),
        base AS (SELECT query_id, query, lq,
          {scores},
          regexp_matches(lq, '{_sqq(INAPPROPRIATE_RE)}') AS inap,
          {cx} AS cx,
          {reform} AS reform
          FROM qt),
        unp AS ({unp}),
        rankd AS (SELECT query_id, intent, s,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, intent ASC) AS rn
                  FROM unp),
        agg AS (SELECT query_id,
                max(CASE WHEN rn = 1 THEN intent END) AS p_int,
                max(CASE WHEN rn = 1 THEN s END) AS p_s,
                max(CASE WHEN rn = 2 THEN intent END) AS s1_int,
                max(CASE WHEN rn = 2 THEN s END) AS s1_s,
                max(CASE WHEN rn = 3 THEN intent END) AS s2_int,
                max(CASE WHEN rn = 3 THEN s END) AS s2_s
                FROM rankd GROUP BY query_id),
        fin AS (SELECT b.query_id, b.inap, b.cx, b.reform, a.p_int, a.p_s,
                a.s1_int, a.s1_s, a.s2_int, a.s2_s,
                (coalesce(a.s1_s, -1.0) > a.p_s * 0.8
                 OR coalesce(a.s2_s, -1.0) > a.p_s * 0.8) AS amb
                FROM base b LEFT JOIN agg a USING (query_id))
        SELECT query_id,
          CASE WHEN inap THEN 'Inappropriate'
               WHEN p_int IS NULL THEN 'Ambiguous'
               WHEN amb THEN 'Ambiguous' ELSE p_int END AS primary_intent,
          round(CASE WHEN inap THEN 1.0 WHEN p_int IS NULL THEN 0.0
                     ELSE p_s END, 8) AS confidence,
          CASE WHEN inap OR p_int IS NULL THEN TRUE
               ELSE (p_s < 0.8 OR amb) END AS should_refuse,
          CASE WHEN inap THEN 'Query contains inappropriate content'
               WHEN p_int IS NULL THEN 'Unable to understand the query intent'
               WHEN amb THEN 'Query intent is ambiguous - please be more specific'
               WHEN p_s < 0.8 THEN 'Insufficient confidence in understanding the query'
               ELSE '' END AS refusal_reason,
          CASE WHEN inap THEN ''
               WHEN p_int IS NULL THEN reform
               WHEN (p_s < 0.8 OR amb) THEN reform
               ELSE '' END AS suggested_reformulation,
          round(CASE WHEN inap THEN 0.0 ELSE cx END, 8) AS complexity_score,
          CASE WHEN inap THEN '' ELSE coalesce(s1_int, '') END
            AS secondary_intent_1,
          round(CASE WHEN inap THEN 0.0 ELSE coalesce(s1_s, 0.0) END, 8)
            AS secondary_score_1,
          CASE WHEN inap THEN '' ELSE coalesce(s2_int, '') END
            AS secondary_intent_2,
          round(CASE WHEN inap THEN 0.0 ELSE coalesce(s2_s, 0.0) END, 8)
            AS secondary_score_2
        FROM fin ORDER BY query_id
    """


def _tpl_to_sql(tpl: str, pat: str) -> str:
    """Semantic-extractor template ('{1} is {2}') → SQL concat of
    regexp_extract group expressions, trimmed like the reference."""
    import re as _re
    parts = _re.split(r"\{(\d)\}", tpl)
    exprs = []
    for j, part in enumerate(parts):
        if j % 2 == 0:
            if part:
                exprs.append(f"'{_sqq(part)}'")
        else:
            exprs.append(f"regexp_extract(query, '{pat}', {part})")
    return "trim(" + " || ".join(exprs) + ")"


def _decomposition_sql() -> str:
    """Generated from SEMANTIC_PATTERNS + CLAUSE_SEPARATORS
    (``decomposer.rs:291-699``): semantic branch via regexp_extract
    templates; syntactic branch re-derives raw-substring boundary
    positions with a position×separator cross join, replays the 10-step
    leading-separator strip fold as chained CTEs, filters len>3, and
    classifies clause types; single-query fallbacks carry the hybrid /
    semantic strategy exactly as the Rust control flow does."""
    from graphrag_rs_ray.functions.rograg import (
        CLAUSE_SEPARATORS, SEMANTIC_PATTERNS)
    src = _staged_sql("query_decomposition")
    p1 = _sqq(SEMANTIC_PATTERNS[0]["regex"])
    p2 = _sqq(SEMANTIC_PATTERNS[1]["regex"])
    can_syn = " OR ".join(f"contains(lq, '{_sqq(s)}')"
                          for s in CLAUSE_SEPARATORS)
    seps_vals = ", ".join(f"('{_sqq(s)}')" for s in CLAUSE_SEPARATORS)

    sem_rows = []
    for pat, spec, guard in ((p1, SEMANTIC_PATTERNS[0], "m1"),
                             (p2, SEMANTIC_PATTERNS[1], "NOT m1 AND m2")):
        for idx, tpl in enumerate(spec["builds"]):
            deps = f"sem_{idx - 1}" if idx > 0 else ""
            sem_rows.append(
                f"SELECT query_id, {idx} AS tpl_idx, 'sem_{idx}' AS sub_id, "
                f"{_tpl_to_sql(tpl, pat)} AS text, "
                f"'{spec['subquery_type']}' AS query_type, "
                f"round(1.0 - {idx} * 0.1, 8) AS priority, '{deps}' AS deps "
                f"FROM flags WHERE {guard}")
    sem_union = "\n          UNION ALL ".join(sem_rows)

    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # each strip step's CASE references the previous step's expression
    # three times — inlined, the 10-step fold becomes a 3^10-node
    # expression tree (measured: >50 GB planner blow-up).
    strip_ctes = []
    for i, sep in enumerate(CLAUSE_SEPARATORS, 1):
        strip_ctes.append(
            f"c{i} AS MATERIALIZED (SELECT query_id, s, "
            f"CASE WHEN starts_with(lower(c), '{_sqq(sep)}') "
            f"THEN trim(substr(c, {len(sep) + 1})) ELSE c END AS c "
            f"FROM c{i - 1})")
    strips = ",\n        ".join(strip_ctes)
    last = f"c{len(CLAUSE_SEPARATORS)}"

    ctype = ("CASE WHEN starts_with(lower(c), 'who')"
             " OR starts_with(lower(c), 'what person') THEN 'Entity'"
             " WHEN starts_with(lower(c), 'what') THEN 'Definitional'"
             " WHEN starts_with(lower(c), 'when') THEN 'Temporal'"
             " WHEN starts_with(lower(c), 'why')"
             " OR contains(lower(c), 'because') THEN 'Causal'"
             " WHEN contains(lower(c), 'relation')"
             " OR contains(lower(c), 'connect') THEN 'Relationship'"
             " WHEN contains(lower(c), 'compare')"
             " OR contains(lower(c), 'versus') THEN 'Comparative'"
             " ELSE 'Attribute' END")

    return f"""
        WITH qt AS (SELECT query_id, query, lower(query) AS lq FROM {src}),
        flags AS (SELECT query_id, query, lq,
                  regexp_matches(query, '{p1}') AS m1,
                  regexp_matches(query, '{p2}') AS m2,
                  ({can_syn}) AS can_syn
                  FROM qt),
        sem0 AS ({sem_union}),
        sem AS (SELECT query_id, tpl_idx, sub_id, text, query_type, priority,
                       deps FROM sem0 WHERE text <> ''),
        sem_out AS (SELECT query_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY tpl_idx) - 1 AS sub_idx,
                    sub_id, text, query_type, priority, deps,
                    'hybrid' AS strategy, 0.8 AS confidence,
                    count(*) OVER (PARTITION BY query_id) AS n_subqueries
                    FROM sem),
        syn_in AS (SELECT query_id, query, lq FROM flags
                   WHERE NOT m1 AND NOT m2 AND can_syn),
        r AS (SELECT range AS p FROM range(0, 4096)),
        seps(sep) AS (VALUES {seps_vals}),
        pos AS (SELECT f.query_id, r.p
                FROM syn_in f, seps s, r
                WHERE r.p + strlen(s.sep) <= strlen(f.query)
                  AND substr(f.lq, r.p + 1, strlen(s.sep)) = s.sep),
        bnd AS (SELECT DISTINCT query_id, p FROM (
                  SELECT query_id, p FROM pos
                  UNION ALL SELECT query_id, 0 FROM syn_in
                  UNION ALL SELECT query_id, strlen(query) FROM syn_in)),
        win AS (SELECT query_id, p AS s,
                lead(p) OVER (PARTITION BY query_id ORDER BY p) AS e
                FROM bnd),
        c0 AS (SELECT w.query_id, w.s,
               trim(substr(f.query, w.s + 1, w.e - w.s)) AS c
               FROM win w JOIN syn_in f USING (query_id)
               WHERE w.e IS NOT NULL),
        {strips},
        cl AS MATERIALIZED (SELECT query_id, s, c,
               row_number() OVER (PARTITION BY query_id ORDER BY s) - 1
                 AS idx,
               count(*) OVER (PARTITION BY query_id) AS n
               FROM {last} WHERE c <> '' AND strlen(c) > 3),
        syn_out AS (SELECT query_id, idx AS sub_idx,
                    'syn_' || idx AS sub_id, c AS text,
                    {ctype} AS query_type,
                    round(1.0 - idx * 0.1, 8) AS priority, '' AS deps,
                    'hybrid' AS strategy, 0.7 AS confidence,
                    n AS n_subqueries
                    FROM cl WHERE n > 1),
        syn_single AS (SELECT f.query_id, 0 AS sub_idx, 'single' AS sub_id,
                       f.query AS text, 'Entity' AS query_type,
                       1.0 AS priority, '' AS deps, 'hybrid' AS strategy,
                       1.0 AS confidence, 1 AS n_subqueries
                       FROM syn_in f
                       LEFT JOIN (SELECT query_id, count(*) AS n FROM cl
                                  GROUP BY query_id) c USING (query_id)
                       WHERE coalesce(c.n, 0) <= 1),
        fallthrough AS (SELECT query_id, 0 AS sub_idx, 'single' AS sub_id,
                        query AS text, 'Entity' AS query_type,
                        1.0 AS priority, '' AS deps,
                        'semantic' AS strategy, 1.0 AS confidence,
                        1 AS n_subqueries
                        FROM flags WHERE NOT m1 AND NOT m2 AND NOT can_syn)
        SELECT query_id, sub_idx::BIGINT AS sub_idx, sub_id, text,
               query_type, priority, deps, strategy, confidence,
               n_subqueries::BIGINT AS n_subqueries
        FROM (SELECT * FROM sem_out
              UNION ALL SELECT * FROM syn_out
              UNION ALL SELECT * FROM syn_single
              UNION ALL SELECT * FROM fallthrough)
        ORDER BY query_id, sub_idx
    """


def _logic_forms_sql() -> str:
    """Generated from LOGIC_PATTERNS (``logic_form.rs:404-547``): first
    matching (?i) pattern wins; one row per non-empty trimmed argument
    capture, re-indexed post-filter."""
    from graphrag_rs_ray.functions.rograg import LOGIC_PATTERNS
    src = _staged_sql("logic_forms")
    pats = [_sqq(p["regex"]) for p in LOGIC_PATTERNS]
    m_cols = ",\n          ".join(
        f"regexp_matches(query, '{p}') AS m{i}"
        for i, p in enumerate(pats, 1))
    pidx = ("CASE " + " ".join(f"WHEN m{i} THEN {i}"
                               for i in range(1, len(pats) + 1)) + " END")
    arg_rows = []
    for i, spec in enumerate(LOGIC_PATTERNS, 1):
        for order, (gi, atype, var) in enumerate(spec["args"]):
            arg_rows.append(
                f"SELECT query_id, {order} AS ext_idx,"
                f" '{spec['predicate']}' AS predicate,"
                f" '{spec['query_type']}' AS query_type,"
                f" trim(regexp_extract(query, '{pats[i - 1]}', {gi}))"
                f" AS value, '{var}' AS variable, '{atype}' AS arg_type"
                f" FROM m WHERE pidx = {i}")
    args_union = "\n          UNION ALL ".join(arg_rows)
    return f"""
        WITH qt AS (SELECT query_id, query FROM {src}),
        m0 AS (SELECT query_id, query,
          {m_cols}
          FROM qt),
        m AS (SELECT *, {pidx} AS pidx FROM m0),
        args AS ({args_union})
        SELECT query_id, predicate, query_type, 0.8 AS confidence,
               (row_number() OVER (PARTITION BY query_id
                                   ORDER BY ext_idx) - 1)::BIGINT AS arg_idx,
               value, variable, arg_type
        FROM args WHERE value <> ''
        ORDER BY query_id, arg_idx
    """


def _query_validation_sql() -> str:
    """Generated from SAFETY_PATTERNS (``validator.rs:295-365``)."""
    from graphrag_rs_ray.functions.rograg import SAFETY_PATTERNS
    src = _staged_sql("query_validation")
    saf = " OR ".join(f"regexp_matches(lq, '{_sqq(p)}')"
                      for p in SAFETY_PATTERNS)
    return f"""
        WITH qt AS (SELECT query_id, query, lower(query) AS lq FROM {src}),
        t AS (SELECT query_id,
              (trim(query) = '') AS empty,
              (strlen(query) > 1000) AS toolong,
              ({saf}) AS saf,
              (NOT regexp_matches(query, '{_PL}')) AS noalpha
              FROM qt),
        u AS (SELECT query_id, empty,
              (empty OR (NOT empty AND toolong)) AS has_len,
              saf, noalpha,
              (empty::INT + (NOT empty AND toolong)::INT + saf::INT
               + noalpha::INT) AS n
              FROM t)
        SELECT query_id, NOT empty AS is_valid,
               round(CASE WHEN empty THEN 0.0
                          ELSE 1.0 - least(n * 0.1, 0.8) END, 8)
                 AS validation_score,
               n::BIGINT AS n_issues, has_len AS has_length_issue,
               saf AS has_safety_issue, noalpha AS has_format_issue
        FROM u ORDER BY query_id
    """


def _fuzzy_sql() -> str:
    """Fuzzy entity matching oracle (``fuzzy_matcher.rs:308-714``):
    full query×entity cross join at sf scale recomputing
    jaccard/containment/levenshtein (DuckDB levenshtein is char-based
    like the Rust DP; max-len is strlen bytes like ``str::len``), the
    exact/partial/type row rules, <10-matches gated top-5-per-entity
    graph expansion, deterministic ranking and the position×type
    weighted overall confidence.  Thresholds appear as the same float
    EXPRESSIONS the Python side evaluates (0.6 * 0.7, not 0.42)."""
    src = _staged_sql("fuzzy_matches")
    ents = _staged_sql("fuzzy_matches", "entities")
    edges = _staged_sql("fuzzy_matches", "edges")
    return f"""
        WITH q AS (SELECT query_id, query, lower(query) AS lq,
                   list_distinct({_WORDS_LQ}) AS qw,
                   len({_WORDS_LQ}) AS qn
                   FROM {src}),
        e AS (SELECT entity_id, name, lower(name) AS ln,
              lower(type) AS lt,
              list_distinct(list_filter(
                string_split_regex(lower(name), '\\s+'),
                x -> x <> '')) AS nw
              FROM {ents}),
        pair AS (SELECT q.query_id, q.lq, q.qw, q.qn, e.entity_id, e.name,
                 e.ln, e.lt, e.nw FROM q CROSS JOIN e),
        exact AS (SELECT query_id, entity_id AS mid, name AS ename,
                  1.0 AS sim, 'exact_entity' AS mtype
                  FROM pair WHERE ln = lq),
        pscore AS (SELECT query_id, entity_id, name,
                   (CASE WHEN len(list_distinct(qw || nw)) = 0 THEN 0.0
                         ELSE len(list_intersect(qw, nw))::DOUBLE
                              / len(list_distinct(qw || nw)) END * 0.4
                    + CASE WHEN len(qw) = 0 AND len(nw) = 0 THEN 1.0
                           WHEN least(len(qw), len(nw)) = 0 THEN 0.0
                           ELSE len(list_intersect(qw, nw))::DOUBLE
                                / least(len(qw), len(nw)) END * 0.4
                    + CASE WHEN greatest(strlen(lq), strlen(ln)) = 0
                           THEN 1.0
                           ELSE 1.0 - levenshtein(lq, ln)::DOUBLE
                                / greatest(strlen(lq), strlen(ln)) END
                      * 0.2) AS ts
                   FROM pair WHERE ln <> lq),
        part AS (SELECT query_id, entity_id AS mid, name AS ename,
                 round(ts * 0.9, 8) AS sim, 'partial_entity' AS mtype
                 FROM pscore WHERE ts >= 0.6),
        typ AS (SELECT query_id, 'type_' || entity_id AS mid,
                name AS ename, round(1.0 * 0.7, 8) AS sim,
                'semantic_entity' AS mtype
                FROM pair
                WHERE ln <> lq AND qn >= 1 AND lt <> ''
                  AND list_contains(qw, lt)),
        m0 AS (SELECT query_id, mid, sim, mtype FROM exact
               UNION ALL SELECT query_id, mid, sim, mtype FROM part
               UNION ALL SELECT query_id, mid, sim, mtype FROM typ),
        cnt AS (SELECT query_id, count(*) AS n FROM m0 GROUP BY query_id),
        me AS (SELECT DISTINCT query_id, mid FROM
               (SELECT query_id, mid FROM exact
                UNION ALL SELECT query_id, mid FROM part)),
        eadj AS (SELECT x.src, x.conf, e2.entity_id AS nb_id,
                 row_number() OVER (PARTITION BY x.src
                                    ORDER BY x.conf DESC, e2.name ASC,
                                             x.pred ASC) AS rn
                 FROM (SELECT subj AS src, obj AS dst, pred, conf
                       FROM {edges}
                       UNION ALL
                       SELECT obj AS src, subj AS dst, pred, conf
                       FROM {edges}) x
                 JOIN e e1 ON e1.entity_id = x.src
                 JOIN e e2 ON e2.entity_id = x.dst),
        exp AS (SELECT me.query_id, 'expanded_' || a.nb_id AS mid,
                round(a.conf::DOUBLE * 0.6, 8) AS sim,
                'related_concept' AS mtype
                FROM me JOIN cnt USING (query_id)
                JOIN eadj a ON a.src = me.mid
                WHERE cnt.n < 10 AND a.rn <= 5
                  AND a.conf::DOUBLE * 0.6 >= 0.6 * 0.7),
        allm AS (SELECT * FROM m0 UNION ALL SELECT * FROM exp),
        ranked AS (SELECT query_id, mid, sim, mtype,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, mid ASC,
                                               mtype ASC) AS rank
                   FROM allm),
        kept AS (SELECT *, CASE mtype
                   WHEN 'exact_entity' THEN 1.0
                   WHEN 'partial_entity' THEN 0.8
                   WHEN 'semantic_entity' THEN 0.7
                   WHEN 'chunk_content' THEN 0.6
                   ELSE 0.5 END AS tw
                 FROM ranked WHERE rank <= 10),
        oc AS (SELECT query_id,
               round(sum(sim * tw / rank) / sum(tw / rank), 8) AS conf
               FROM kept GROUP BY query_id)
        SELECT k.query_id, k.rank::BIGINT AS rank, k.mid AS match_id,
               k.mtype AS match_type, k.sim AS similarity,
               o.conf AS overall_confidence
        FROM kept k JOIN oc o USING (query_id)
        ORDER BY query_id, rank
    """


def _routing_sql() -> str:
    """Adaptive-routing oracle generated from the query_intel spec
    tables (``adaptive_routing.rs:77-287``).  Occurrence counts use the
    replace-length trick (non-overlapping, like Rust ``str::matches``)."""
    from graphrag_rs_ray.functions.query_intel import (
        BROAD_KEYWORDS, COMPLEXITY_EXPLANATIONS, ROUTING_MAX_LEVEL,
        SPECIFIC_KEYWORDS)
    src = _staged_sql("query_routing")
    bk = " + ".join(f"contains(lq, '{_sqq(k)}')::INT" for k in BROAD_KEYWORDS)
    sk = " + ".join(f"contains(lq, '{_sqq(k)}')::INT"
                    for k in SPECIFIC_KEYWORDS)
    levels = {"VeryBroad": max(ROUTING_MAX_LEVEL, 2),
              "Broad": max(ROUTING_MAX_LEVEL - 1, 1),
              "Medium": 1, "Specific": 0, "VerySpecific": 0}
    expl = " ".join(
        f"WHEN cx = '{c}' THEN '{_sqq(COMPLEXITY_EXPLANATIONS[c].format(lv))}'"
        for c, lv in levels.items())
    lvl = " ".join(f"WHEN cx = '{c}' THEN {lv}" for c, lv in levels.items())
    return f"""
        WITH qt AS (SELECT query_id, query, lower(query) AS lq FROM {src}),
        sc AS (SELECT query_id,
            ({bk}) AS bk, ({sk}) AS sk,
            len({_WORDS_RAW}) AS wc,
            ((strlen(lq) - strlen(replace(lq, '"', ''))) // 2
             + (strlen(lq) - strlen(replace(lq, ' and ', ''))) // 5
             + (strlen(lq) - strlen(replace(lq, 'between', ''))) // 7)
              AS ind
            FROM qt),
        s2 AS (SELECT query_id,
            CASE WHEN bk + sk > 0
                 THEN (bk - sk)::DOUBLE / (bk + sk) ELSE 0.0 END AS ks,
            CASE WHEN wc BETWEEN 1 AND 3 THEN 0.5
                 WHEN wc BETWEEN 4 AND 5 THEN 0.2
                 WHEN wc BETWEEN 6 AND 7 THEN 0.0
                 WHEN wc BETWEEN 8 AND 10 THEN -0.3
                 ELSE -0.5 END AS ls,
            CASE WHEN ind = 0 THEN 0.3 WHEN ind = 1 THEN 0.0
                 WHEN ind = 2 THEN -0.4 ELSE -0.7 END AS es
            FROM sc),
        s3 AS (SELECT query_id, ks, ls, es,
               ks * 0.5 + ls * 0.3 + es * 0.2 AS total FROM s2),
        s4 AS (SELECT *, CASE WHEN total >= 0.7 THEN 'VeryBroad'
                              WHEN total >= 0.4 THEN 'Broad'
                              WHEN total >= -0.2 THEN 'Medium'
                              WHEN total >= -0.5 THEN 'Specific'
                              ELSE 'VerySpecific' END AS cx FROM s3)
        SELECT query_id, cx AS complexity,
               (CASE {lvl} END)::BIGINT AS suggested_level,
               round(ks, 8) AS keyword_score, round(ls, 8) AS length_score,
               round(es, 8) AS entity_score, round(total, 8) AS total_score,
               CASE {expl} END AS explanation
        FROM s4 ORDER BY query_id
    """


def _rewrite_sql() -> str:
    """Query-rewrite oracle generated from the query_intel spec tables
    (``intelligence.rs:92-358``).  The synonym append-if-absent rule is
    replayed as an event stream: base words (always kept) and synonym
    candidates ordered by (pos, kind, j); a candidate survives iff it is
    the FIRST event of its string — exactly 'not already in the
    accumulated list'."""
    from graphrag_rs_ray.functions.query_intel import (
        REWRITE_STOP_WORDS, SYNONYMS, TEMPLATES)
    src = _staged_sql("query_rewrite")
    syn_vals = ", ".join(f"('{_sqq(w)}', {j}, '{_sqq(s)}')"
                         for w, syns in SYNONYMS
                         for j, s in enumerate(syns))
    stop = ", ".join(f"'{_sqq(w)}'" for w in sorted(REWRITE_STOP_WORDS))
    tpl_branches = " ".join(
        f"WHEN qtype = '{t}' AND contains(nq, '{_sqq(p)}') "
        f"THEN replace(nq, '{_sqq(p)}', '{_sqq(r)}')"
        for p, t, r in TEMPLATES)
    qtype = """CASE
        WHEN contains(nq, 'relationship between') OR contains(nq, 'how does')
          OR contains(nq, 'related to') OR contains(nq, 'connection between')
          THEN 'Relationship'
        WHEN starts_with(nq, 'who is') OR starts_with(nq, 'what is')
          OR starts_with(nq, 'define') THEN 'EntityLookup'
        WHEN starts_with(nq, 'how many') OR starts_with(nq, 'count')
          OR contains(nq, 'total') OR contains(nq, 'sum')
          OR contains(nq, 'average') THEN 'Aggregation'
        WHEN contains(nq, 'compare') OR contains(nq, 'difference between')
          OR contains(nq, 'versus') OR contains(nq, 'vs')
          THEN 'Comparison'
        WHEN contains(nq, 'when') OR contains(nq, 'before')
          OR contains(nq, 'after') OR contains(nq, 'during')
          OR contains(nq, 'timeline') THEN 'Temporal'
        WHEN contains(nq, 'why') OR contains(nq, 'because')
          OR contains(nq, 'cause') OR contains(nq, 'reason')
          OR contains(nq, 'led to') THEN 'Causal'
        ELSE 'General' END"""
    return f"""
        WITH qt AS (SELECT query_id, lower(trim(query)) AS nq FROM {src}),
        ty AS (SELECT query_id, nq, {qtype} AS qtype FROM qt),
        tpl AS (SELECT query_id, nq, qtype,
                CASE {tpl_branches} ELSE nq END AS tq FROM ty),
        wl AS (SELECT query_id, nq, qtype,
               list_filter(string_split_regex(tq, '\\s+'), x -> x <> '')
                 AS l FROM tpl),
        w AS (SELECT query_id, unnest(l) AS word,
              unnest(range(len(l))) AS pos FROM wl),
        syn(sw, j, s) AS (SELECT * FROM (VALUES {syn_vals}) t(sw, j, s)),
        ev AS (SELECT query_id, pos, 0 AS kind, 0 AS j, word FROM w
               UNION ALL
               SELECT w.query_id, w.pos, 1 AS kind, syn.j, syn.s AS word
               FROM w JOIN syn ON w.word = syn.sw),
        evr AS (SELECT *, row_number() OVER (PARTITION BY query_id, word
                                             ORDER BY pos, kind, j) AS rn
                FROM ev),
        kept AS (SELECT * FROM evr WHERE kind = 0 OR rn = 1),
        agg AS (SELECT query_id,
                string_agg(word, ' ' ORDER BY pos, kind, j) AS rewritten,
                string_agg(CASE WHEN word NOT IN ({stop}) THEN word END,
                           ' ' ORDER BY pos, kind, j) AS terms,
                sum(CASE WHEN word NOT IN ({stop}) THEN 1 ELSE 0 END) AS tc
                FROM kept GROUP BY query_id),
        fin AS (SELECT t.query_id, t.qtype, t.nq,
                coalesce(a.rewritten, '') AS rewritten,
                coalesce(a.terms, '') AS terms,
                coalesce(a.tc, 0) AS tc,
                len(list_filter(string_split_regex(t.nq, '\\s+'),
                                x -> x <> '')) AS wc
                FROM ty t LEFT JOIN agg a USING (query_id))
        SELECT query_id, qtype AS query_type, rewritten,
               terms AS expanded_terms, tc::BIGINT AS n_terms,
               round(CASE WHEN tc = 0 THEN 0.5
                          ELSE least(tc::DOUBLE / (wc + 1.0), 1.0) * 0.6
                               + 0.5 * 0.4 END, 8) AS confidence
        FROM fin ORDER BY query_id
    """


def _dual_keywords_sql() -> str:
    """Fallback dual-keyword oracle (``keyword_extraction.rs:168-190``):
    words > 3 bytes, first 10 (1-based inclusive list slice), lowered."""
    src = _staged_sql("dual_keywords")
    return f"""
        WITH qt AS (SELECT query_id, query FROM {src}),
        wl AS (SELECT query_id,
               list_filter(string_split_regex(query, '\\s+'),
                           x -> x <> '') AS l FROM qt),
        sl AS (SELECT query_id,
               (list_filter(l, x -> strlen(x) > 3))[1:10] AS l FROM wl),
        w AS (SELECT query_id, lower(unnest(l)) AS keyword,
              unnest(range(len(l))) AS k_idx FROM sl)
        SELECT query_id, 'low_level' AS level, k_idx::BIGINT AS k_idx,
               keyword
        FROM w ORDER BY query_id, k_idx
    """


def _dual_retrieval_sql(top_k: int = 10) -> str:
    """Merge-strategy oracle (``dual_retrieval.rs:197-322``): replays
    interleave / high_first / low_first / weighted from the staged
    positioned candidate lists.  Each strategy = dedup-first-occurrence
    in its event order, rank ≤ top_k; weighted ties pinned (weighted
    score desc, source asc, position asc) matching the kernel."""
    high = _staged_sql("dual_retrieval", "high")
    low = _staged_sql("dual_retrieval", "low")

    def strat(name: str, order: str) -> str:
        return f"""
        SELECT '{name}' AS strategy, rank::BIGINT AS rank, doc_id, score
        FROM (SELECT *, row_number() OVER (ORDER BY {order}) AS rank
              FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                                 ORDER BY {order}) AS dup
                    FROM ev) d WHERE dup = 1) r
        WHERE rank <= {top_k}"""

    parts = [strat("interleave", "j, src"),
             strat("high_first", "src, j"),
             strat("low_first", "1 - src, j"),
             strat("weighted",
                   "score * (CASE WHEN src = 0 THEN 0.6 ELSE 0.4 END) DESC,"
                   " src, j")]
    union = "\n        UNION ALL".join(parts)
    return f"""
        WITH ev AS (
          SELECT j, doc_id, score, 0 AS src FROM {high}
          UNION ALL
          SELECT j, doc_id, score, 1 AS src FROM {low})
        {union}
        ORDER BY strategy, rank
    """


def _tool_search_sql(top_default: int = 10) -> str:
    """graph_search oracle (``functions.rs:121-241``): the three match
    phases with later phases gated on the per-call found-so-far count,
    the fuzzy rule (single-word prefix / last-word equality / edit
    distance ≤ max(min_bytes//4, 1)) and the pinned ranking."""
    calls = _staged_sql("tool_graph_search")
    ents = _staged_sql("tool_graph_search", "entities")
    qp = r"list_filter(string_split_regex(lower(entity_name), '\s+'), x -> x <> '')"
    ep = r"list_filter(string_split_regex(ln, '\s+'), x -> x <> '')"
    return f"""
        WITH calls AS (SELECT call_id, entity_name, limit_arg FROM {calls}),
        e AS (SELECT entity_id, name, type, conf, mention_count,
              lower(name) AS ln FROM {ents}),
        pair AS (SELECT c.call_id, c.entity_name, c.limit_arg, e.*
                 FROM calls c CROSS JOIN e),
        flags AS (SELECT *,
            (trim(ln) = trim(lower(entity_name))) AS ex,
            (contains(ln, lower(entity_name))
             OR contains(lower(entity_name), ln)) AS ct,
            CASE WHEN len({qp}) = 1 AND len({ep}) > 0
                 THEN (starts_with(({ep})[1], ({qp})[1])
                       OR starts_with(({qp})[1], ({ep})[1]))
                 WHEN len({ep}) > 0 AND len({qp}) > 0
                      AND ({ep})[len({ep})] = ({qp})[len({qp})] THEN TRUE
                 ELSE levenshtein(ln, lower(entity_name))
                      <= greatest(least(strlen(lower(entity_name)),
                                        strlen(ln)) // 4, 1) END AS fz
            FROM pair),
        p1 AS (SELECT call_id, entity_id, name, type, conf, mention_count,
               1.0 AS score FROM flags WHERE ex),
        c1 AS (SELECT call_id, count(*) AS n FROM p1 GROUP BY call_id),
        p2 AS (SELECT f.call_id, f.entity_id, f.name, f.type, f.conf,
               f.mention_count, 0.8 AS score
               FROM flags f LEFT JOIN c1 USING (call_id)
               WHERE coalesce(c1.n, 0) < f.limit_arg AND f.ct AND NOT f.ex),
        c2 AS (SELECT call_id, count(*) AS n FROM p2 GROUP BY call_id),
        p3 AS (SELECT f.call_id, f.entity_id, f.name, f.type, f.conf,
               f.mention_count, 0.6 AS score
               FROM flags f LEFT JOIN c1 USING (call_id)
               LEFT JOIN c2 USING (call_id)
               WHERE coalesce(c1.n, 0) + coalesce(c2.n, 0) < f.limit_arg
                 AND f.fz AND NOT f.ex AND NOT f.ct),
        allm AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                 UNION ALL SELECT * FROM p3),
        ranked AS (SELECT a.*, c.limit_arg,
                   row_number() OVER (PARTITION BY a.call_id
                                      ORDER BY a.score DESC, a.name ASC,
                                               a.entity_id ASC) AS rank
                   FROM allm a JOIN calls c USING (call_id))
        SELECT call_id, rank::BIGINT AS rank, entity_id AS id, name, type,
               round(conf::DOUBLE, 6) AS confidence,
               score AS relevance_score, mention_count AS mentions_count
        FROM ranked WHERE rank <= limit_arg
        ORDER BY call_id, rank
    """


def _tool_expand_sql() -> str:
    """entity_expand oracle (``functions.rs:246-376``): incident
    relationships in the pinned (source, type, target) order, take
    limit; unknown ids produce the error row."""
    calls = _staged_sql("tool_entity_expand")
    ents = _staged_sql("tool_entity_expand", "entities")
    rels = _staged_sql("tool_entity_expand", "rels")
    return f"""
        WITH calls AS (SELECT call_id, entity_id, limit_arg FROM {calls}),
        e AS (SELECT entity_id, name, type FROM {ents}),
        r AS (SELECT source, target, type, conf FROM {rels}),
        known AS (SELECT c.* FROM calls c JOIN e ON e.entity_id = c.entity_id),
        unknown AS (SELECT c.* FROM calls c
                    LEFT JOIN e ON e.entity_id = c.entity_id
                    WHERE e.entity_id IS NULL),
        inc AS (SELECT k.call_id, k.limit_arg, r.type AS rel_type, r.conf,
                CASE WHEN r.source = k.entity_id
                     THEN 'outgoing' ELSE 'incoming' END AS direction,
                CASE WHEN r.source = k.entity_id
                     THEN r.target ELSE r.source END AS rid,
                row_number() OVER (PARTITION BY k.call_id
                                   ORDER BY r.source, r.type, r.target)
                  AS rn
                FROM known k JOIN r
                  ON r.source = k.entity_id OR r.target = k.entity_id),
        rows_ AS (SELECT i.call_id, (i.rn - 1)::BIGINT AS idx,
                  i.rel_type AS relationship_type, i.direction,
                  i.rid AS related_id,
                  coalesce(e2.name, '') AS related_name,
                  coalesce(e2.type, '') AS related_type,
                  round(i.conf::DOUBLE, 6) AS confidence, '' AS error
                  FROM inc i LEFT JOIN e e2 ON e2.entity_id = i.rid
                  WHERE i.rn <= i.limit_arg)
        SELECT * FROM rows_
        UNION ALL
        SELECT call_id, -1::BIGINT, '', '', '', '', '', 0.0,
               'Entity with id ''' || entity_id || ''' not found'
        FROM unknown
        ORDER BY call_id, idx
    """


def _tool_context_sql() -> str:
    """get_entity_context oracle (``functions.rs:600-711``): per-call
    chunk rows (chunks containing the entity, chunk_id asc, take limit;
    n_entities = distinct entities in chunk) + mention rows (chunk_id
    asc) + error rows for unknown ids."""
    calls = _staged_sql("tool_entity_context")
    ments = _staged_sql("tool_entity_context", "mentions")
    ents = _staged_sql("tool_entity_context", "entities")
    return f"""
        WITH calls AS (SELECT call_id, entity_id, limit_arg FROM {calls}),
        e AS (SELECT entity_id FROM {ents}),
        m AS (SELECT chunk_id, doc_id, entity_id, conf FROM {ments}),
        known AS (SELECT c.* FROM calls c JOIN e USING (entity_id)),
        unknown AS (SELECT c.* FROM calls c
                    LEFT JOIN e USING (entity_id)
                    WHERE e.entity_id IS NULL),
        nent AS (SELECT chunk_id, count(DISTINCT entity_id) AS n
                 FROM m GROUP BY chunk_id),
        echunks AS (SELECT k.call_id, m.chunk_id, m.doc_id,
                    row_number() OVER (PARTITION BY k.call_id
                                       ORDER BY m.chunk_id) AS rn,
                    k.limit_arg
                    FROM known k JOIN m ON m.entity_id = k.entity_id),
        chunk_rows AS (SELECT ec.call_id, 'chunk' AS kind,
                       (ec.rn - 1)::BIGINT AS idx, ec.chunk_id, ec.doc_id,
                       ne.n::BIGINT AS n_entities, 0.0 AS conf, '' AS error
                       FROM echunks ec JOIN nent ne USING (chunk_id)
                       WHERE ec.rn <= ec.limit_arg),
        mention_rows AS (SELECT k.call_id, 'mention' AS kind,
                         (row_number() OVER (PARTITION BY k.call_id
                                             ORDER BY m.chunk_id) - 1)
                           ::BIGINT AS idx,
                         m.chunk_id, '' AS doc_id, 0::BIGINT AS n_entities,
                         round(m.conf::DOUBLE, 6) AS conf, '' AS error
                         FROM known k JOIN m ON m.entity_id = k.entity_id)
        SELECT * FROM chunk_rows
        UNION ALL SELECT * FROM mention_rows
        UNION ALL
        SELECT call_id, 'error', -1::BIGINT, '', '', 0::BIGINT, 0.0,
               'Entity with id ''' || entity_id || ''' not found'
        FROM unknown
        ORDER BY call_id, kind, idx
    """


def _tool_validation_sql() -> str:
    """Tool-argument validation oracle: each tool's rule chain replayed
    as ordered CASE branches ('' string = absent, -1 int = absent)."""
    calls = _staged_sql("tool_validation")
    return f"""
        WITH c AS (SELECT * FROM {calls}),
        v AS (SELECT call_id, function,
          CASE function
          WHEN 'graph_search' THEN
            CASE WHEN entity_name = ''
                 THEN 'entity_name must be a string'
                 WHEN limit_arg >= 0 AND (limit_arg < 1 OR limit_arg > 100)
                 THEN 'limit must be between 1 and 100'
                 ELSE '' END
          WHEN 'entity_expand' THEN
            CASE WHEN entity_id = ''
                 THEN 'entity_id must be a string'
                 WHEN depth >= 0 AND (depth < 1 OR depth > 5)
                 THEN 'depth must be between 1 and 5'
                 WHEN limit_arg >= 0 AND (limit_arg < 1 OR limit_arg > 100)
                 THEN 'limit must be between 1 and 100'
                 ELSE '' END
          WHEN 'relationship_traverse' THEN
            CASE WHEN bad_param
                 THEN 'PARAMETER ERROR: Use ''source_entity'' and ''target_entity'' (not ''entity_id_1'', ''entity1_id'', etc.)'
                 WHEN source_entity = ''
                 THEN 'REQUIRED PARAMETER: ''source_entity'' must be a string'
                 WHEN target_entity = ''
                 THEN 'REQUIRED PARAMETER: ''target_entity'' must be a string'
                 WHEN max_hops >= 0 AND (max_hops < 1 OR max_hops > 10)
                 THEN 'PARAMETER ERROR: ''max_hops'' must be between 1 and 10'
                 ELSE '' END
          WHEN 'get_entity_context' THEN
            CASE WHEN entity_id = ''
                 THEN 'entity_id must be a string'
                 WHEN limit_arg >= 0 AND (limit_arg < 1 OR limit_arg > 50)
                 THEN 'limit must be between 1 and 50'
                 ELSE '' END
          WHEN 'infer_relationships' THEN
            CASE WHEN entity_name = '' THEN 'entity_name is required'
                 ELSE '' END
          ELSE '' END AS error
          FROM c)
        SELECT call_id, function, error, (error = '') AS is_valid
        FROM v ORDER BY call_id
    """


def _scored_log_cte(src: str) -> str:
    """Shared WITH-fragment: the per-row quality components recomputed
    from a staged response log (``quality_metrics.rs:986-1128``).
    Produces CTE ``scored``."""
    from graphrag_rs_ray.functions.quality_metrics import TRANSITION_WORDS
    trans = " OR ".join(f"contains(lower(s), '{t}')"
                        for t in TRANSITION_WORDS)
    return f"""
        lg AS (SELECT * FROM {src}),
        sr AS (SELECT log_id,
               CASE WHEN sources = '' THEN []::VARCHAR[]
                    ELSE string_split(sources, ';') END AS sl FROM lg),
        parts AS (SELECT l.*, s.sl,
            CASE WHEN len(s.sl) = 0 THEN 0.0
                 ELSE (least(len(s.sl) / 5.0, 1.0)
                       + len(list_distinct(list_transform(
                             s.sl, x -> substr(x, 1, 5))))::DOUBLE
                         / len(s.sl)) / 2.0 END AS cred,
            (least(strlen(content) / 500.0, 1.0)
             + least(n_sources / 3.0, 1.0)
             + least(n_subqueries / 5.0, 1.0)) / 3.0 AS comp_s,
            string_split_regex(content, '[.!?]') AS sents,
            list_filter(string_split_regex(content, '\\s+'),
                        x -> x <> '') AS cwords,
            list_distinct(list_filter(
                string_split_regex(lower(query), '\\s+'),
                w -> w <> '' AND strlen(w) > 3)) AS qw,
            list_distinct(list_filter(
                string_split_regex(lower(content), '\\s+'),
                x -> x <> '')) AS aw
            FROM lg l JOIN sr s USING (log_id)),
        comps AS (SELECT *,
            (confidence + cred) / 2.0 AS acc,
            CASE WHEN len(sents) <= 1 THEN 1.0
                 ELSE (least(len(list_filter(sents, s -> {trans}))::DOUBLE
                             / len(sents), 1.0)
                       + CASE WHEN len(cwords) = 0 THEN 1.0
                              ELSE len(list_distinct(cwords))::DOUBLE
                                   / len(cwords) END) / 2.0 END AS coh,
            CASE WHEN len(qw) = 0 THEN 1.0
                 ELSE len(list_intersect(qw, aw))::DOUBLE / len(qw) END
              AS rel
            FROM parts),
        scored AS (SELECT log_id, query, cohort, timestamp,
            processing_time_ms, decomposition_success,
            round(acc, 8) AS accuracy_score,
            round(comp_s, 8) AS completeness_score,
            round(coh, 8) AS coherence_score,
            round(rel, 8) AS relevance_score,
            round(cred, 8) AS source_credibility,
            round(least(acc * 0.3 + comp_s * 0.25 + coh * 0.2
                        + rel * 0.15 + cred * 0.1, 1.0), 8)
              AS overall_quality,
            CASE WHEN n_fallback > 0 THEN 'Fallback'
                 WHEN n_logic > 0 AND n_fuzzy > 0 THEN 'Hybrid'
                 WHEN n_logic > 0 THEN 'LogicForm'
                 ELSE 'FuzzyMatch' END AS strategy,
            concat_ws(';',
              CASE WHEN round(least(acc * 0.3 + comp_s * 0.25 + coh * 0.2
                                    + rel * 0.15 + cred * 0.1, 1.0), 8)
                        < 0.6 THEN 'QualityDegradation' END,
              CASE WHEN processing_time_ms > 10000
                   THEN 'PerformanceDegradation' END) AS alerts
            FROM comps)"""


def _response_quality_sql() -> str:
    """Per-response quality oracle (``quality_metrics.rs:986-1128``)."""
    return f"""
        WITH {_scored_log_cte(_staged_sql("response_quality"))}
        SELECT log_id, accuracy_score, completeness_score,
               coherence_score, relevance_score, source_credibility,
               overall_quality, strategy, alerts
        FROM scored ORDER BY log_id
    """


def _quality_report_sql() -> str:
    """Corpus-level quality-report oracle (``quality_metrics.rs:
    1131-1337``): performance stats, alert counts, per-cohort
    aggregates (population std-dev), improvement percentages and the
    heuristic significance test, replayed from the staged log."""
    return f"""
        WITH {_scored_log_cte(_staged_sql("quality_report"))},
        n AS (SELECT count(*) AS n FROM scored),
        last10 AS (SELECT timestamp FROM scored
                   ORDER BY log_id DESC LIMIT 10),
        thr AS (SELECT CASE WHEN max(timestamp) - min(timestamp) > 0
                            THEN count(*)::DOUBLE
                                 / (max(timestamp) - min(timestamp))
                            ELSE 0.0 END AS qps FROM last10),
        agg AS (SELECT cohort,
                avg(accuracy_score) AS mean_accuracy,
                avg(completeness_score) AS mean_completeness,
                avg(coherence_score) AS mean_coherence,
                avg(relevance_score) AS mean_relevance,
                avg(processing_time_ms) AS mean_processing_time_ms,
                sum(decomposition_success::INT)::DOUBLE / count(*)
                  AS success_rate,
                sqrt(var_pop(overall_quality)) AS std_dev_quality,
                count(*) AS cn
                FROM scored GROUP BY cohort),
        b AS (SELECT * FROM agg WHERE cohort = 'baseline'),
        r AS (SELECT * FROM agg WHERE cohort = 'rograg'),
        sig AS (SELECT
            (r.mean_accuracy - b.mean_accuracy)
              / ((r.std_dev_quality + b.std_dev_quality) / 2.0)
              AS effect,
            CASE WHEN abs((r.mean_accuracy - b.mean_accuracy)
                 / ((r.std_dev_quality + b.std_dev_quality) / 2.0)) > 0.5
                 THEN 0.01 ELSE 0.1 END AS p_acc,
            CASE WHEN r.mean_completeness > b.mean_completeness
                 THEN 0.05 ELSE 0.1 END AS p_comp,
            CASE WHEN r.mean_coherence > b.mean_coherence
                 THEN 0.05 ELSE 0.1 END AS p_coh
            FROM r, b),
        imp AS (SELECT
            CASE WHEN b.mean_accuracy = 0.0
                 THEN CASE WHEN r.mean_accuracy > 0.0
                           THEN 100.0 ELSE 0.0 END
                 ELSE (r.mean_accuracy - b.mean_accuracy)
                      / b.mean_accuracy * 100.0 END AS i_acc,
            CASE WHEN b.mean_completeness = 0.0
                 THEN CASE WHEN r.mean_completeness > 0.0
                           THEN 100.0 ELSE 0.0 END
                 ELSE (r.mean_completeness - b.mean_completeness)
                      / b.mean_completeness * 100.0 END AS i_comp,
            CASE WHEN b.mean_coherence = 0.0
                 THEN CASE WHEN r.mean_coherence > 0.0
                           THEN 100.0 ELSE 0.0 END
                 ELSE (r.mean_coherence - b.mean_coherence)
                      / b.mean_coherence * 100.0 END AS i_coh,
            CASE WHEN b.mean_relevance = 0.0
                 THEN CASE WHEN r.mean_relevance > 0.0
                           THEN 100.0 ELSE 0.0 END
                 ELSE (r.mean_relevance - b.mean_relevance)
                      / b.mean_relevance * 100.0 END AS i_rel,
            ((r.mean_accuracy + r.mean_completeness + r.mean_coherence
              + r.mean_relevance) / 4.0
             - (b.mean_accuracy + b.mean_completeness + b.mean_coherence
                + b.mean_relevance) / 4.0)
            / ((b.mean_accuracy + b.mean_completeness + b.mean_coherence
                + b.mean_relevance) / 4.0) * 100.0 AS i_all
            FROM r, b)
        SELECT 'performance' AS section, 'total_queries' AS name,
               round(n::DOUBLE, 8) AS value FROM n
        UNION ALL SELECT 'performance', 'successful_decompositions',
          round(sum(decomposition_success::INT)::DOUBLE, 8) FROM scored
        UNION ALL SELECT 'performance', 'avg_processing_time_ms',
          round(avg(processing_time_ms), 8) FROM scored
        UNION ALL SELECT 'performance', 'avg_quality_score',
          round(avg(overall_quality), 8) FROM scored
        UNION ALL SELECT 'performance', 'fallback_rate',
          round(sum((strategy = 'Fallback')::INT)::DOUBLE / count(*), 8)
          FROM scored
        UNION ALL SELECT 'performance', 'throughput_qps',
          round(qps, 8) FROM thr
        UNION ALL SELECT 'alerts', 'quality_degradation',
          round(sum(contains(alerts, 'QualityDegradation')::INT)::DOUBLE,
                8) FROM scored
        UNION ALL SELECT 'alerts', 'performance_degradation',
          round(sum(contains(alerts,
                             'PerformanceDegradation')::INT)::DOUBLE, 8)
          FROM scored
        UNION ALL SELECT cohort, 'mean_accuracy',
          round(mean_accuracy, 8) FROM agg
        UNION ALL SELECT cohort, 'mean_completeness',
          round(mean_completeness, 8) FROM agg
        UNION ALL SELECT cohort, 'mean_coherence',
          round(mean_coherence, 8) FROM agg
        UNION ALL SELECT cohort, 'mean_relevance',
          round(mean_relevance, 8) FROM agg
        UNION ALL SELECT cohort, 'mean_processing_time_ms',
          round(mean_processing_time_ms, 8) FROM agg
        UNION ALL SELECT cohort, 'success_rate',
          round(success_rate, 8) FROM agg
        UNION ALL SELECT cohort, 'std_dev_quality',
          round(std_dev_quality, 8) FROM agg
        UNION ALL SELECT 'improvement', 'accuracy', round(i_acc, 8)
          FROM imp
        UNION ALL SELECT 'improvement', 'completeness', round(i_comp, 8)
          FROM imp
        UNION ALL SELECT 'improvement', 'coherence', round(i_coh, 8)
          FROM imp
        UNION ALL SELECT 'improvement', 'relevance', round(i_rel, 8)
          FROM imp
        UNION ALL SELECT 'improvement', 'overall', round(i_all, 8)
          FROM imp
        UNION ALL SELECT 'significance', 'p_value_accuracy',
          round(p_acc, 8) FROM sig
        UNION ALL SELECT 'significance', 'p_value_completeness',
          round(p_comp, 8) FROM sig
        UNION ALL SELECT 'significance', 'p_value_coherence',
          round(p_coh, 8) FROM sig
        UNION ALL SELECT 'significance', 'p_value_overall',
          round((p_acc + p_comp + p_coh) / 3.0, 8) FROM sig
        UNION ALL SELECT 'significance', 'effect_size',
          round(effect, 8) FROM sig
        UNION ALL SELECT 'significance', 'is_significant_95',
          CASE WHEN (p_acc + p_comp + p_coh) / 3.0 < 0.05
               THEN 1.0 ELSE 0.0 END FROM sig
        UNION ALL SELECT 'significance', 'sample_size',
          round(least((SELECT cn FROM b), (SELECT cn FROM r))::DOUBLE, 8)
    """


def _logic_bindings_sql() -> str:
    """Logic-form execution oracle (``logic_form.rs:562-930``): parse
    (first of six patterns), resolve entities (exact-lower first, else
    contains-either, pinned order), emit Is / Related (incl. the
    no-direct 0.3 binding) / Compare bindings with the name-similarity
    confidence ladder, per-query first-binding answer and mean
    confidence."""
    from graphrag_rs_ray.functions.rograg import LOGIC_PATTERNS
    src = _staged_sql("logic_bindings")
    ents = _staged_sql("logic_bindings", "entities")
    rels = _staged_sql("logic_bindings", "rels")
    pats = [_sqq(p["regex"]) for p in LOGIC_PATTERNS]
    m_cols = ", ".join(f"regexp_matches(query, '{p}') AS m{i}"
                       for i, p in enumerate(pats, 1))
    pidx = ("CASE " + " ".join(f"WHEN m{i} THEN {i}"
                               for i in range(1, 7)) + " END")
    # parsed arg pairs per executor-relevant pattern
    pa_rows = []
    for i, pred, has2 in ((1, "Is", False), (2, "Is", False),
                          (3, "Related", True), (6, "Compare", True)):
        g2 = (f"trim(regexp_extract(query, '{pats[i - 1]}', 2))"
              if has2 else "''")
        pa_rows.append(
            f"SELECT query_id, '{pred}' AS pred,"
            f" trim(regexp_extract(query, '{pats[i - 1]}', 1)) AS a1,"
            f" {g2} AS a2 FROM m WHERE pidx = {i}")
    pa_union = "\n          UNION ALL ".join(pa_rows)
    jac = ("CASE WHEN len(list_distinct(aw || ew)) = 0 THEN 0.0"
           " ELSE len(list_intersect(aw, ew))::DOUBLE"
           " / len(list_distinct(aw || ew)) END")
    wl = (r"list_distinct(list_filter(string_split_regex({c}, '\s+'),"
          r" x -> x <> ''))")
    return f"""
        WITH q AS (SELECT query_id, query FROM {src}),
        e AS (SELECT entity_id, name, type, lower(name) AS ln
              FROM {ents}),
        r AS (SELECT source, target, type, conf FROM {rels}),
        m0 AS (SELECT query_id, query, {m_cols} FROM q),
        m AS (SELECT *, {pidx} AS pidx FROM m0),
        pa AS ({pa_union}),
        is0 AS (
          SELECT p.query_id, e.entity_id, e.name, e.type, e.ln,
                 lower(p.a1) AS al,
                 {wl.replace("{c}", "lower(p.a1)")} AS aw,
                 {wl.replace("{c}", "e.ln")} AS ew
          FROM pa p JOIN e ON contains(e.ln, lower(p.a1))
          WHERE p.pred = 'Is' AND p.a1 <> ''),
        is_rows AS (
          SELECT query_id, 'Is' AS predicate,
            (row_number() OVER (PARTITION BY query_id
                                ORDER BY name, entity_id) - 1)::BIGINT
              AS bind_idx,
            'X' AS variable,
            name || ' (' || type || ')' AS value,
            entity_id,
            CASE WHEN al = ln THEN 1.0
                 WHEN contains(ln, al) OR contains(al, ln) THEN 0.8
                 ELSE {jac} END AS confidence
          FROM is0),
        cand AS (
          SELECT p.query_id, p.pred, w.which, e.entity_id, e.name, e.type,
                 (lower(CASE w.which WHEN 1 THEN p.a1 ELSE p.a2 END)
                  = e.ln) AS ex
          FROM pa p
          CROSS JOIN (SELECT 1 AS which UNION ALL SELECT 2) w
          JOIN e ON (lower(CASE w.which WHEN 1 THEN p.a1 ELSE p.a2 END)
                     = e.ln
                     OR contains(e.ln, lower(CASE w.which WHEN 1 THEN p.a1
                                             ELSE p.a2 END))
                     OR contains(lower(CASE w.which WHEN 1 THEN p.a1
                                       ELSE p.a2 END), e.ln))
          WHERE p.pred IN ('Related', 'Compare')
            AND p.a1 <> '' AND p.a2 <> ''),
        res AS (SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id, pred, which
                                         ORDER BY ex DESC, name, entity_id)
                      AS rn FROM cand) WHERE rn = 1),
        pairs AS (SELECT r1.query_id, r1.pred,
                  r1.entity_id AS id1, r1.name AS n1, r1.type AS t1,
                  r2.entity_id AS id2, r2.name AS n2, r2.type AS t2
                  FROM res r1 JOIN res r2
                    ON r1.query_id = r2.query_id AND r1.pred = r2.pred
                   AND r1.which = 1 AND r2.which = 2),
        rel_rows AS (
          SELECT p.query_id, 'Related' AS predicate,
            (row_number() OVER (PARTITION BY p.query_id
                                ORDER BY r.source, r.type, r.target) - 1)
              ::BIGINT AS bind_idx,
            'R' AS variable,
            p.n1 || ' ' || r.type || ' ' || p.n2 AS value,
            '' AS entity_id, r.conf AS confidence
          FROM pairs p JOIN r
            ON (r.source = p.id1 OR r.target = p.id1)
           AND (r.source = p.id2 OR r.target = p.id2)
          WHERE p.pred = 'Related'),
        nodirect AS (
          SELECT p.query_id, 'Related' AS predicate, 0::BIGINT AS bind_idx,
            'R' AS variable,
            'No direct relationship found between ' || p.n1 || ' and '
              || p.n2 AS value,
            '' AS entity_id, 0.3 AS confidence
          FROM pairs p LEFT JOIN rel_rows rr USING (query_id)
          WHERE p.pred = 'Related' AND rr.query_id IS NULL),
        cmp_rows AS (
          SELECT p.query_id, 'Compare' AS predicate, 0::BIGINT AS bind_idx,
            'comparison' AS variable,
            p.n1 || ' is a ' || p.t1 || ' while ' || p.n2 || ' is a '
              || p.t2 AS value,
            '' AS entity_id, 0.7 AS confidence
          FROM pairs p WHERE p.pred = 'Compare'),
        allb AS (SELECT * FROM is_rows UNION ALL SELECT * FROM rel_rows
                 UNION ALL SELECT * FROM nodirect
                 UNION ALL SELECT * FROM cmp_rows)
        SELECT query_id, predicate, bind_idx, variable, value, entity_id,
               round(confidence, 8) AS confidence,
               first_value(value) OVER (PARTITION BY query_id
                                        ORDER BY bind_idx) AS answer,
               round(avg(confidence) OVER (PARTITION BY query_id), 8)
                 AS overall_confidence
        FROM allb ORDER BY query_id, bind_idx
    """


def _traversal_sql(query: str, n_seeds: int, k: int, mode: str) -> str:
    """Traversal oracles (``traversal.rs:248-374,521-566``): recursive-CTE
    min-hop distances over the confidence-gated symmetric edge multiset,
    then mode-specific projection — 'ego'/'qfs' emit the tagged node∪rel
    union table (occurrence counts / deduped keys), 'msbfs' the
    (node, dist, in_entities) distances map."""
    t = _staged_sql(query)
    base = """
        WITH RECURSIVE rels AS (
          SELECT subj, pred, obj FROM {t} WHERE conf >= 0.5),
        sym AS (SELECT subj AS src, obj AS dst FROM rels
                UNION ALL SELECT obj, subj FROM rels),
        seeds AS (SELECT node FROM (SELECT DISTINCT subj AS node FROM {t})
                  ORDER BY node LIMIT {n}),
        walk(node, hop) AS (
          SELECT node, 0 FROM seeds
          UNION
          SELECT s.dst, w.hop + 1 FROM walk w JOIN sym s ON s.src = w.node
          WHERE w.hop < {k}),
        dist AS (SELECT node, min(hop)::BIGINT AS hop FROM walk
                 GROUP BY node)
    """.replace("{t}", t).replace("{n}", str(n_seeds)).replace("{k}", str(k))
    if mode == "msbfs":
        return base + """
        SELECT node, hop AS dist,
               (CASE WHEN hop < {k} THEN 1 ELSE 0 END)::BIGINT AS in_entities
        FROM dist
        """.replace("{k}", str(k))
    occ_val = "n" if mode == "ego" else "1::BIGINT"
    return base + """
        , occ AS (
          SELECT r.subj, r.pred, r.obj,
                 ((CASE WHEN ds.hop <= {km1} THEN 1 ELSE 0 END)
                + (CASE WHEN dd.hop <= {km1} THEN 1 ELSE 0 END))::BIGINT AS n
          FROM rels r
          LEFT JOIN dist ds ON ds.node = r.subj
          LEFT JOIN dist dd ON dd.node = r.obj)
        SELECT 'node' AS kind, node AS a, '' AS b, '' AS rel_type,
               hop AS val
        FROM dist
        UNION ALL
        SELECT 'rel', subj, obj, pred, {v} FROM occ WHERE n > 0
    """.replace("{km1}", str(k - 1)).replace("{v}", occ_val)
