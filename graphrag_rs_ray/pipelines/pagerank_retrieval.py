"""PageRank-based retrieval (fast-GraphRAG) dataflow — the distributed
twin of ``functions/pagerank_retrieval.py`` kernels
(``retrieval/pagerank_retrieval.rs:134-330``).

Stage shape (100-TB discipline):

- vector similarity: one ``map_batches`` pass over the entities table
  (query constant closed over — a few words, not data); the mention
  bonus is a ``bucketed_join`` of mention rows against the
  query-matching chunk-id table + a hash-bucketed sum — no corpus text
  ever leaves the chunk table's own stage.
- the reset dict is the query-relevant entity shortlist (inherently
  small — Jaccard-passing + bonus entities), the same broadcast-side
  discipline as ``hipporag_retrieve``.
- PPR: local numpy twin ≤ ``small_graph_limit`` edges, else the sharded
  loop (per-iteration ``bucketed_join`` + hash-bucketed sum + Parquet
  checkpoint as lineage cut, the ``pagerank_dataset`` pattern); driver
  state = the dangling-mass scalar + loop counter.
- expansion: mention pairs filtered by the passing-entity broadcast set,
  sorted/limited as a Dataset — the full pair table is never collected.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.pagerank_retrieval import (
    PageRankRetrievalConfig,
    build_reset,
    jaccard_entity_score,
    ppr_weighted_local,
    split_words,
)
from ..stages.hashagg import (
    bucketed_join,
    grouped_arrow_agg,
    hash_grouped_aggregate,
)


def vector_scores_table(entities_ds, mentions_ds, chunks_ds, query: str,
                        cfg: PageRankRetrievalConfig | None = None,
                        num_buckets: int = 16) -> dict[str, float]:
    """Distributed vector-similarity stage
    (``pagerank_retrieval.rs:228-283``) → the small entity→score dict
    (round 8).  ``mentions_ds`` rows are per-chunk aggregates carrying
    ``mention_count`` (mention granularity: each mention in a matching
    chunk adds +0.3, so the bonus is 0.3 · Σ mention_count over
    matching chunks)."""
    cfg = cfg or PageRankRetrievalConfig()
    qwords = split_words(query)
    qlower = query.lower()

    def jacc(t: pa.Table) -> pa.Table:
        ids, vals = [], []
        for eid, name, etype in zip(t.column("entity_id").to_pylist(),
                                    t.column("name").to_pylist(),
                                    t.column("type").to_pylist()):
            sim = jaccard_entity_score(qwords, name or "", etype or "")
            if sim is not None:
                ids.append(eid)
                vals.append(sim)
        return pa.table({"entity": pa.array(ids, pa.string()),
                         "v": pa.array(vals, pa.float64())})

    jacc_part = entities_ds.map_batches(jacc, batch_format="pyarrow")

    def matching(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column("text"))
        m = pc.match_substring(low, qlower)
        return pa.table({"chunk_id": t.column("chunk_id").filter(m)})

    match_ids = chunks_ds.map_batches(matching, batch_format="pyarrow")
    m_pairs = mentions_ds.map_batches(
        lambda t: pa.table({"chunk_id": t.column("chunk_id"),
                            "entity": t.column("entity_id"),
                            "mc": t.column("mention_count")}),
        batch_format="pyarrow")
    bonus_part = hash_grouped_aggregate(
        bucketed_join(m_pairs, match_ids, on=["chunk_id"],
                      num_buckets=num_buckets),
        ["entity"],
        grouped_arrow_agg(["entity"], [("mc", "sum")],
                          rename=["entity", "n_mentions"]),
        num_buckets=num_buckets).map_batches(
            lambda t: pa.table({
                "entity": t.column("entity"),
                "v": pc.multiply(pc.cast(t.column("n_mentions"),
                                         pa.float64()),
                                 cfg.mention_bonus)}),
            batch_format="pyarrow")

    total = hash_grouped_aggregate(
        jacc_part.union(bonus_part), ["entity"],
        grouped_arrow_agg(["entity"], [("v", "sum")],
                          rename=["entity", "v"]),
        num_buckets=num_buckets)
    return {r["entity"]: round(r["v"], cfg.round_digits)
            for r in total.take_all()}


def weighted_edges(conf_triples_ds, num_buckets: int = 16):
    """(src, dst, w) with duplicate (src, dst) confidences SUMMED —
    ``core/mod.rs:731-780`` (TriMat ``add_triplet`` → CSR accumulates
    parallel edges)."""
    return hash_grouped_aggregate(
        conf_triples_ds.map_batches(
            lambda t: pa.table({"src": t.column("subj"),
                                "dst": t.column("obj"),
                                "w": pc.cast(t.column("conf"),
                                             pa.float64())}),
            batch_format="pyarrow"),
        ["src", "dst"],
        grouped_arrow_agg(["src", "dst"], [("w", "sum")],
                          rename=["src", "dst", "w"]),
        num_buckets=num_buckets)


def ppr_weighted(edges_ds, entities_ds,
                 vector_scores: dict[str, float],
                 cfg: PageRankRetrievalConfig | None = None,
                 num_buckets: int = 16,
                 small_graph_limit: int = 2_000_000,
                 work_dir: str | None = None):
    """Personalized PageRank over the weighted entity graph — the
    production recurrence pinned in ``functions/pagerank_retrieval.py``
    (weight-sum out-degrees, uniform dangling redistribution, reset
    default 1/n with normalized vector-score overrides, s0 = 1/n,
    per-iteration round-8).  Returns a (node, score) Dataset over ALL
    entities (``build_adjacency_matrix`` rows every entity, isolated
    ones included, ``core/mod.rs:733-744``).

    Two paths, one recurrence: ≤ ``small_graph_limit`` edges → local
    numpy (np.add.at) twin; above → sharded loop with per-iteration
    Parquet checkpoint (lineage cut) and the dangling mass as the only
    driver scalar.  Equality pinned in ``test_pagerank_retrieval``."""
    import ray
    import ray.data as rd

    cfg = cfg or PageRankRetrievalConfig()
    d = cfg.damping_factor

    n_edges = edges_ds.count()
    if n_edges <= small_graph_limit:
        nodes = sorted(r["entity_id"]
                       for r in entities_ds.select_columns(["entity_id"])
                       .take_all())
        edges = [(r["src"], r["dst"], r["w"]) for r in edges_ds.take_all()]
        reset = build_reset(vector_scores, nodes)
        scores = ppr_weighted_local(edges, nodes, reset, cfg)
        items = sorted(scores.items())
        return rd.from_arrow(pa.table({
            "node": pa.array([k for k, _ in items], pa.string()),
            "score": pa.array([v for _, v in items], pa.float64())}))

    n = entities_ds.count()
    total_v = sum(vector_scores.values())
    vs_ref = ray.put(vector_scores if total_v > 0 else {})

    wsums = hash_grouped_aggregate(
        edges_ds, ["src"],
        grouped_arrow_agg(["src"], [("w", "sum")], rename=["src", "wsum"]),
        num_buckets=num_buckets)
    edges_w = bucketed_join(edges_ds, wsums, on=["src"],
                            num_buckets=num_buckets).materialize()

    node_ids = entities_ds.map_batches(
        lambda t: pa.table({"node": t.column("entity_id")}),
        batch_format="pyarrow")
    nodes_w = bucketed_join(
        node_ids,
        wsums.map_batches(lambda t: pa.table({"node": t.column("src"),
                                              "wsum": t.column("wsum")}),
                          batch_format="pyarrow"),
        on=["node"], how="left", num_buckets=num_buckets)

    def init(t: pa.Table) -> pa.Table:
        vs = ray.get(vs_ref)
        nodes_l = t.column("node").to_pylist()
        r = [vs[v] / total_v if v in vs else 1.0 / n for v in nodes_l]
        ws = np.nan_to_num(t.column("wsum")
                           .to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"node": t.column("node"),
                         "wsum": pa.array(ws, pa.float64()),
                         "reset": pa.array(r, pa.float64()),
                         "score": pa.array([1.0 / n] * len(nodes_l),
                                           pa.float64())})

    own_work_dir = work_dir is None
    if own_work_dir:
        work_dir = tempfile.mkdtemp(prefix="graphrag_pprret_")
    scores = nodes_w.map_batches(init, batch_format="pyarrow").materialize()

    for it in range(cfg.max_iterations):
        # dangling mass: single scalar on the driver (wsum == 0 rows)
        dang = scores.map_batches(
            lambda t: pa.table({"dm": pc.if_else(
                pc.equal(t.column("wsum"), 0.0), t.column("score"), 0.0)}),
            batch_format="pyarrow").sum("dm")
        dang_mass = d * (dang or 0.0) / n

        s_side = scores.map_batches(
            lambda t: pa.table({"src": t.column("node"),
                                "s_score": t.column("score")}),
            batch_format="pyarrow")
        joined = bucketed_join(edges_w, s_side, on=["src"],
                               num_buckets=num_buckets)

        def contrib(t: pa.Table) -> pa.Table:
            s = t.column("s_score").to_numpy()
            w = t.column("w").to_numpy()
            ws = t.column("wsum").to_numpy()
            return pa.table({"node": t.column("dst"),
                             "c": pa.array(d * s * w / ws, pa.float64())})

        sums = hash_grouped_aggregate(
            joined.map_batches(contrib, batch_format="pyarrow"), ["node"],
            grouped_arrow_agg(["node"], [("c", "sum")],
                              rename=["node", "c"]),
            num_buckets=num_buckets)
        updated = bucketed_join(scores, sums, on=["node"], how="left",
                                num_buckets=num_buckets)

        def apply(t: pa.Table, _dm=dang_mass) -> pa.Table:
            c = np.nan_to_num(t.column("c")
                              .to_numpy(zero_copy_only=False)
                              .astype(np.float64))
            reset = t.column("reset").to_numpy()
            new = np.round((1.0 - d) * reset + c + _dm, cfg.round_digits)
            return pa.table({"node": t.column("node"),
                             "wsum": t.column("wsum"),
                             "reset": t.column("reset"),
                             "score": pa.array(new, pa.float64())})

        ck = os.path.join(work_dir, f"scores_{it % 2}")
        if os.path.exists(ck):                   # write_parquet APPENDS
            shutil.rmtree(ck)
        os.makedirs(ck)
        updated.map_batches(apply, batch_format="pyarrow").write_parquet(ck)
        import ray.data as _rd
        scores = _rd.read_parquet(ck)

    out = scores.map_batches(
        lambda t: t.select(["node", "score"]),
        batch_format="pyarrow").materialize()
    if own_work_dir:
        shutil.rmtree(work_dir, ignore_errors=True)
    return out


def search_with_pagerank(entities_ds, mentions_ds, chunks_ds,
                         conf_triples_ds, query: str,
                         cfg: PageRankRetrievalConfig | None = None,
                         num_buckets: int = 16,
                         small_graph_limit: int = 2_000_000,
                         edges_ds=None):
    """End-to-end ``search_with_pagerank``
    (``pagerank_retrieval.rs:134-226``): vector similarity → reset →
    PPR → 0.3/0.4/0.2 combination → threshold → chunk expansion with
    the entity-row fallback quirk → score-desc truncation.

    Returns (rank, entity_id, chunk_id, score, vector_score,
    pagerank_score); ``chunk_id = 'entity_<id>'`` marks fallback rows
    (``:195-215``).  Empty vector scores → empty result (``:146-148``)."""
    import ray
    import ray.data as rd

    cfg = cfg or PageRankRetrievalConfig()
    empty = pa.table({
        "rank": pa.array([], pa.int64()),
        "entity_id": pa.array([], pa.string()),
        "chunk_id": pa.array([], pa.string()),
        "score": pa.array([], pa.float64()),
        "vector_score": pa.array([], pa.float64()),
        "pagerank_score": pa.array([], pa.float64())})

    vscores = vector_scores_table(entities_ds, mentions_ds, chunks_ds,
                                  query, cfg, num_buckets)
    if not vscores:
        return rd.from_arrow(empty)

    # pre-aggregated (src, dst, w) rows may be passed directly (the driver
    # query stages them so oracle and engine consume IDENTICAL weights —
    # re-summing on both sides would differ in ulp by summation order)
    edges = (edges_ds if edges_ds is not None
             else weighted_edges(conf_triples_ds, num_buckets)).materialize()
    pr = ppr_weighted(edges, entities_ds, vscores, cfg, num_buckets,
                      small_graph_limit)

    vs_ref = ray.put(vscores)

    def combine(t: pa.Table) -> pa.Table:
        vs = ray.get(vs_ref)
        nodes = t.column("node").to_pylist()
        p = t.column("score").to_numpy()
        v = np.array([vs.get(x, 0.0) for x in nodes])
        comb = np.round(cfg.vector_weight * v + cfg.pagerank_weight * p,
                        cfg.round_digits)
        keep = comb >= cfg.min_score_threshold
        return pa.table({"entity_id": pa.array(np.array(nodes)[keep]),
                         "score": pa.array(comb[keep], pa.float64()),
                         "vector_score": pa.array(v[keep], pa.float64()),
                         "pagerank_score": pa.array(p[keep], pa.float64())})

    passing = pr.map_batches(combine, batch_format="pyarrow").take_all()
    if not passing:
        return rd.from_arrow(empty)
    pass_map = {r["entity_id"]: (r["score"], r["vector_score"],
                                 r["pagerank_score"]) for r in passing}
    pass_ref = ray.put(pass_map)
    pass_arr = pa.array(sorted(pass_map), pa.string())

    def pairs(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("entity_id"), value_set=pass_arr)
        return pa.table({"entity_id": t.column("entity_id").filter(m),
                         "chunk_id": t.column("chunk_id").filter(m)})

    dpairs = hash_grouped_aggregate(
        mentions_ds.map_batches(pairs, batch_format="pyarrow"),
        ["entity_id", "chunk_id"],
        grouped_arrow_agg(["entity_id", "chunk_id"], [("chunk_id", "count")],
                          rename=["entity_id", "chunk_id", "_n"]),
        num_buckets=num_buckets).map_batches(
            lambda t: t.select(["entity_id", "chunk_id"]),
            batch_format="pyarrow").materialize()

    with_chunks = {r["entity_id"] for r in hash_grouped_aggregate(
        dpairs, ["entity_id"],
        grouped_arrow_agg(["entity_id"], [("chunk_id", "count")],
                          rename=["entity_id", "_n"]),
        num_buckets=num_buckets).take_all()}

    def score_rows(t: pa.Table) -> pa.Table:
        pm = ray.get(pass_ref)
        eids = t.column("entity_id").to_pylist()
        trip = [pm[e] for e in eids]
        return pa.table({
            "entity_id": t.column("entity_id"),
            "chunk_id": t.column("chunk_id"),
            "score": pa.array([x[0] for x in trip], pa.float64()),
            "vector_score": pa.array([x[1] for x in trip], pa.float64()),
            "pagerank_score": pa.array([x[2] for x in trip], pa.float64())})

    rows = dpairs.map_batches(score_rows, batch_format="pyarrow")
    fallback = sorted(set(pass_map) - with_chunks)
    if fallback:
        import ray.data as _rd
        rows = rows.union(_rd.from_arrow(pa.table({
            "entity_id": pa.array(fallback, pa.string()),
            "chunk_id": pa.array([f"entity_{e}" for e in fallback],
                                 pa.string()),
            "score": pa.array([pass_map[e][0] for e in fallback],
                              pa.float64()),
            "vector_score": pa.array([pass_map[e][1] for e in fallback],
                                     pa.float64()),
            "pagerank_score": pa.array([pass_map[e][2] for e in fallback],
                                       pa.float64())})))

    top = (rows.sort(["score", "entity_id", "chunk_id"],
                     descending=[True, False, False])
           .limit(cfg.max_results).take_all())
    return rd.from_arrow(pa.table({
        "rank": pa.array(range(1, len(top) + 1), pa.int64()),
        "entity_id": pa.array([r["entity_id"] for r in top], pa.string()),
        "chunk_id": pa.array([r["chunk_id"] for r in top], pa.string()),
        "score": pa.array([r["score"] for r in top], pa.float64()),
        "vector_score": pa.array([r["vector_score"] for r in top],
                                 pa.float64()),
        "pagerank_score": pa.array([r["pagerank_score"] for r in top],
                                   pa.float64())}))
