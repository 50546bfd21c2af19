"""Hybrid KG retrieval dataflow (``retrieval/hybrid.rs``): the
entity+chunk corpus is indexed BOTH ways — hash-embedding cosine
(semantic) and BM25 (keyword) — each producing a top-``max_candidates``
shortlist distributed; the four fusion methods
(``functions/hybrid_fusion.py``) run on the shortlists.

Scale shape: the corpus never leaves its Dataset (embedding + BM25
scoring are stateless maps with the query / df table broadcast once);
only the two top-k shortlists (≤ 100 rows each) reach the driver.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import bm25_tokenize
from ..stages.hashagg import grouped_arrow_agg, hash_grouped_aggregate


def kg_corpus(entities_ds, chunks_ds):
    """(id, content) corpus with the reference's namespacing
    (``hybrid.rs:118-160``): ``entity:<id>`` with "name entity_type"
    content, ``chunk:<id>`` with the chunk text."""
    def ent_rows(t: pa.Table) -> pa.Table:
        ids = t.column("entity_id").to_pylist()
        names = t.column("name").to_pylist()
        types = t.column("type").to_pylist()
        return pa.table({
            "id": pa.array([f"entity:{i}" for i in ids], pa.string()),
            "content": pa.array([f"{n} {ty}" for n, ty in zip(names, types)],
                                pa.string())})

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = t.column("chunk_id").to_pylist()
        return pa.table({
            "id": pa.array([f"chunk:{i}" for i in ids], pa.string()),
            "content": t.column("text")})

    return entities_ds.map_batches(ent_rows, batch_format="pyarrow").union(
        chunks_ds.map_batches(chunk_rows, batch_format="pyarrow"))


def semantic_shortlist(corpus_ds, query: str, top_n: int = 100,
                       dim: int = 64, round_digits: int = 8):
    """Hash-embedding cosine top-n (score desc, id asc), rank attached.
    The reference's semantic search returns the ID as the row content
    (``hybrid.rs:196-208``) — mirrored in the ``content`` column.
    ``round_digits=6`` for consumers that multiply the staged score by
    a ≤2-decimal weight (keeps products exactly 8-decimal — the
    round-8 midpoint parity rule)."""
    import numpy as np
    import ray
    import ray.data as rd

    from ..functions.embedding import HashEmbedder

    q = HashEmbedder(dim).embed(query)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        emb = HashEmbedder(dim)
        qv = ray.get(q_ref)
        mat = emb.embed_many([c or "" for c in
                              batch.column("content").to_pylist()])
        return pa.table({
            "id": batch.column("id"),
            "score": pa.array(np.round((mat @ qv).astype(np.float64),
                                       round_digits), pa.float64())})

    top = (corpus_ds.map_batches(score, batch_format="pyarrow")
           .sort(["score", "id"], descending=[True, False])
           .limit(top_n).take_all())
    return rd.from_arrow(pa.table({
        "id": pa.array([r["id"] for r in top], pa.string()),
        "score": pa.array([r["score"] for r in top], pa.float64()),
        "content": pa.array([r["id"] for r in top], pa.string()),
        "rank": pa.array(range(len(top)), pa.int64())}))


def keyword_shortlist(corpus_ds, query: str, top_n: int = 100,
                      k1: float = 1.2, b: float = 0.75,
                      round_digits: int = 8):
    """BM25 top-n over the corpus (``retrieval/bm25.rs:70-153``
    semantics: normalized TF, Lucene ln(N/df)+1 IDF, positive scores
    only), distributed df/stats + a stateless scoring map."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Mean

    corpus_ds = corpus_ds.materialize()
    q_terms = sorted(set(bm25_tokenize(query)))

    def term_docs(batch: pa.Table) -> pa.Table:
        terms, ids = [], []
        for i, text in zip(batch.column("id").to_pylist(),
                           batch.column("content").to_pylist()):
            for t in set(bm25_tokenize(text or "")):
                if t in q_terms:
                    terms.append(t)
                    ids.append(i)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "id": pa.array(ids, pa.string())})

    df_rows = hash_grouped_aggregate(
        corpus_ds.map_batches(term_docs, batch_format="pyarrow"), ["term"],
        grouped_arrow_agg(["term"], [("id", "count")],
                          rename=["term", "df"])).take_all()
    df_map = {r["term"]: int(r["df"]) for r in df_rows}

    def doclen(batch: pa.Table) -> pa.Table:
        lens = [len(bm25_tokenize(t or ""))
                for t in batch.column("content").to_pylist()]
        return pa.table({"doc_len": pa.array(lens, pa.int64())})

    agg = (corpus_ds.map_batches(doclen, batch_format="pyarrow")
           .aggregate(Count(alias_name="n"), Mean("doc_len",
                                                  alias_name="avg")))
    n_docs, avg_len = int(agg["n"]), float(agg["avg"])
    ref = ray.put((q_terms, df_map))

    def score(batch: pa.Table) -> pa.Table:
        terms, dfm = ray.get(ref)
        out_id, out_score, out_content = [], [], []
        for i, text in zip(batch.column("id").to_pylist(),
                           batch.column("content").to_pylist()):
            toks = bm25_tokenize(text or "")
            dl = len(toks)
            if dl == 0:
                continue
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            s = 0.0
            for t in terms:
                c = counts.get(t)
                df_t = dfm.get(t, 0)
                if not c or df_t == 0:
                    continue
                idf = math.log(n_docs / df_t) + 1.0
                tf = c / dl
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl / avg_len))
            if s > 0.0:
                out_id.append(i)
                out_score.append(round(s, round_digits))
                out_content.append(text or "")
        return pa.table({"id": pa.array(out_id, pa.string()),
                         "score": pa.array(out_score, pa.float64()),
                         "content": pa.array(out_content, pa.string())})

    top = (corpus_ds.map_batches(score, batch_format="pyarrow")
           .sort(["score", "id"], descending=[True, False])
           .limit(top_n).take_all())
    return rd.from_arrow(pa.table({
        "id": pa.array([r["id"] for r in top], pa.string()),
        "score": pa.array([r["score"] for r in top], pa.float64()),
        "content": pa.array([r["content"] for r in top], pa.string()),
        "rank": pa.array(range(len(top)), pa.int64())}))


def semantic_shortlist_multi(corpus_ds, queries: dict[str, str],
                             top_n: int = 10, dim: int = 64,
                             round_digits: int = 6):
    """Batched ``semantic_shortlist``: ONE embedding pass scores every
    query (corpus × Q matmul), then one cheap per-query sort of the
    materialized scored table.  Returns {qid: Dataset(id, score,
    rank)}."""
    import numpy as np
    import ray
    import ray.data as rd

    from ..functions.embedding import HashEmbedder

    qids = sorted(queries)
    emb = HashEmbedder(dim)
    qmat = np.stack([emb.embed(queries[q]) for q in qids])
    q_ref = ray.put(qmat)

    def score(batch: pa.Table) -> pa.Table:
        e = HashEmbedder(dim)
        qm = ray.get(q_ref)
        mat = e.embed_many([c or "" for c in
                            batch.column("content").to_pylist()])
        scores = np.round((mat @ qm.T).astype(np.float64), round_digits)
        out = {"id": batch.column("id")}
        for k, qid in enumerate(qids):
            out[f"s_{qid}"] = pa.array(scores[:, k], pa.float64())
        return pa.table(out)

    scored = corpus_ds.map_batches(score,
                                   batch_format="pyarrow").materialize()
    out = {}
    for qid in qids:
        top = (scored.map_batches(
            lambda t, _q=qid: pa.table({"id": t.column("id"),
                                        "score": t.column(f"s_{_q}")}),
            batch_format="pyarrow")
            .sort(["score", "id"], descending=[True, False])
            .limit(top_n).take_all())
        out[qid] = rd.from_arrow(pa.table({
            "id": pa.array([r["id"] for r in top], pa.string()),
            "score": pa.array([r["score"] for r in top], pa.float64()),
            "rank": pa.array(range(len(top)), pa.int64())}))
    return out


def keyword_shortlist_multi(corpus_ds, queries: dict[str, str],
                            top_n: int = 10, k1: float = 1.2,
                            b: float = 0.75, round_digits: int = 6):
    """Batched ``keyword_shortlist``: one df pass over the UNION of all
    query terms, one doc-length pass, one scoring pass emitting every
    query's BM25 column.  Per-query score arithmetic is identical to
    the single-query path."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Mean

    corpus_ds = corpus_ds.materialize()
    qids = sorted(queries)
    q_terms = {q: sorted(set(bm25_tokenize(queries[q]))) for q in qids}
    all_terms = sorted({t for ts in q_terms.values() for t in ts})

    def term_docs(batch: pa.Table) -> pa.Table:
        terms, ids = [], []
        for i, text in zip(batch.column("id").to_pylist(),
                           batch.column("content").to_pylist()):
            for t in set(bm25_tokenize(text or "")):
                if t in all_terms:
                    terms.append(t)
                    ids.append(i)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "id": pa.array(ids, pa.string())})

    df_rows = hash_grouped_aggregate(
        corpus_ds.map_batches(term_docs, batch_format="pyarrow"), ["term"],
        grouped_arrow_agg(["term"], [("id", "count")],
                          rename=["term", "df"])).take_all()
    df_map = {r["term"]: int(r["df"]) for r in df_rows}

    def doclen(batch: pa.Table) -> pa.Table:
        lens = [len(bm25_tokenize(t or ""))
                for t in batch.column("content").to_pylist()]
        return pa.table({"doc_len": pa.array(lens, pa.int64())})

    agg = (corpus_ds.map_batches(doclen, batch_format="pyarrow")
           .aggregate(Count(alias_name="n"),
                      Mean("doc_len", alias_name="avg")))
    n_docs, avg_len = int(agg["n"]), float(agg["avg"])
    ref = ray.put((q_terms, df_map))

    def score(batch: pa.Table) -> pa.Table:
        qt, dfm = ray.get(ref)
        ids = batch.column("id").to_pylist()
        texts = batch.column("content").to_pylist()
        cols: dict[str, list] = {"id": []}
        for q in qids:
            cols[f"s_{q}"] = []
        for i, text in zip(ids, texts):
            toks = bm25_tokenize(text or "")
            dl = len(toks)
            if dl == 0:
                continue
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            cols["id"].append(i)
            for q in qids:
                s = 0.0
                for t in qt[q]:
                    c = counts.get(t)
                    df_t = dfm.get(t, 0)
                    if not c or df_t == 0:
                        continue
                    idf = math.log(n_docs / df_t) + 1.0
                    tf = c / dl
                    s += idf * (tf * (k1 + 1.0)) / (
                        tf + k1 * (1.0 - b + b * dl / avg_len))
                cols[f"s_{q}"].append(round(s, round_digits))
        out = {"id": pa.array(cols["id"], pa.string())}
        for q in qids:
            out[f"s_{q}"] = pa.array(cols[f"s_{q}"], pa.float64())
        return pa.table(out)

    scored = corpus_ds.map_batches(score,
                                   batch_format="pyarrow").materialize()
    out = {}
    for qid in qids:
        top_rows = (scored.map_batches(
            lambda t, _q=qid: pa.table({
                "id": t.column("id"),
                "score": t.column(f"s_{_q}")}).filter(
                    pc.greater(t.column(f"s_{_q}"), 0.0)),
            batch_format="pyarrow")
            .sort(["score", "id"], descending=[True, False])
            .limit(top_n).take_all())
        out[qid] = _rows_to_ranked(top_rows)
    return out


def _rows_to_ranked(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "id": pa.array([r["id"] for r in rows], pa.string()),
        "score": pa.array([r["score"] for r in rows], pa.float64()),
        "rank": pa.array(range(len(rows)), pa.int64())}))


def fuse_tables(sem_tbl: pa.Table, kw_tbl: pa.Table, methods,
                cfgs) -> pa.Table:
    """Run each fusion method over the (already-staged) shortlists;
    one output table with a ``method`` discriminator column."""
    from ..functions.hybrid_fusion import fuse_shortlists

    def rows_of(tbl):
        return list(zip(tbl.column("id").to_pylist(),
                        tbl.column("score").to_pylist(),
                        tbl.column("content").to_pylist()))

    sem, kw = rows_of(sem_tbl), rows_of(kw_tbl)
    m_col, cols = [], {k: [] for k in (
        "id", "content", "score", "semantic_score", "keyword_score",
        "result_type", "entities", "source_chunks")}
    for method, cfg in zip(methods, cfgs):
        for r in fuse_shortlists(sem, kw, method, cfg):
            m_col.append(method)
            for k, v in zip(cols, r):
                cols[k].append(v)
    out = {"method": pa.array(m_col, pa.string())}
    for k, v in cols.items():
        typ = pa.float64() if "score" in k else pa.string()
        out[k] = pa.array(v, typ)
    return pa.table(out)
