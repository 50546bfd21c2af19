"""Distributed graph embeddings (``graph/embeddings.rs`` on Ray Data).

Shape: the adjacency is broadcast once (``ray.put``) and the per-node
work — biased random walks (Node2Vec) and per-layer neighborhood
aggregation (GraphSAGE) — fans out as stateless ``map_batches`` over the
node table.  Counter-seeded RNG streams (see
``functions/graph_embeddings.py``) make every walk/sample independent of
partition order, so the fan-out is exact, not approximate.

Two-path discipline (same as communities/paths/traversal): below
``small_graph_limit`` edges the adjacency/features are broadcast once
(``ray.put``) and the per-node work fans out as stateless
``map_batches`` — milliseconds on bounded graphs.  Above it the sharded
twins run with NO broadcast:

* ``node2vec_walks_sharded`` — per-step frontier joins: one state row
  per walk carries (cur, prev, serialized PCG64 state), each round is a
  hash-bucketed exchange of walk rows against the per-node adjacency
  lists, and the walk's RNG stream resumes mid-walk from the carried
  state, so the emitted walks are BIT-IDENTICAL to the broadcast path's
  (equality-gated).  Step rows land in per-round Parquet dirs (the
  iterative-loop lineage-cut rule) and assemble into walks at the end.
* ``graphsage_embeddings_sharded`` — features live as a Dataset; each
  layer is sample (stateless map over adjacency lists) → feature
  lookup (bucketed exchange on neighbor) → per-node mean (bucketed
  exchange on node, sequential add in draw order for bit-equality) →
  combine (bucketed exchange on node), Parquet-checkpointed per layer.

The sharded twins REQUIRE an ``eidx`` edge-input-order column (the
reference's adjacency lists are edge-input-ordered, so the order must
travel with the rows once the build is distributed).  The skip-gram
training pass itself is sequential-by-semantics (each update reads
current state) and runs on the driver over the distributed walk output,
like the reference — ``node2vec_embeddings`` therefore keeps the
bounded contract; at scale the product of the distributed stage is the
walk corpus itself (``node2vec_walks_sharded(...).write_parquet``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from graphrag_rs_ray.functions.graph_embeddings import (
    EmbeddingConfig,
    EmbeddingGraph,
    GraphSAGEConfig,
    _sample_next,
    graphsage_layer,
    init_embeddings,
    node_rng,
    random_walk,
    train_skipgram,
)


def _graph_from_edges_ds(edges_ds) -> EmbeddingGraph:
    """Collect a (src, dst, w[, eidx]) Dataset into the broadcastable
    adjacency (bounded graphs only — see module docstring).  When an
    ``eidx`` edge-input-order column is present the rows are sorted by
    it, so the broadcast and sharded paths see identical adjacency-list
    order regardless of block order."""
    rows = edges_ds.take_all()
    if rows and "eidx" in rows[0]:
        rows.sort(key=lambda r: r["eidx"])
    return EmbeddingGraph.from_edges(
        [(r["src"], r["dst"], float(r["w"])) for r in rows])


def _nodes_ds(graph: EmbeddingGraph) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "node": pa.array(graph.nodes, pa.string())}))


def node2vec_walks_ds(graph: EmbeddingGraph, cfg: EmbeddingConfig
                      ) -> rd.Dataset:
    """Distributed walk generation: node table → map_batches, walks per
    node drawn from (seed, node, walk_idx) streams; adjacency broadcast
    once."""
    gref = ray.put(graph)

    def walks_fn(t: pa.Table) -> pa.Table:
        g = ray.get(gref)
        nodes_out, widx, steps = [], [], []
        for node in t.column("node").to_pylist():
            for w in range(cfg.walks_per_node):
                walk = random_walk(g, node, node_rng(cfg.seed, node, w),
                                   cfg)
                nodes_out.append(node)
                widx.append(w)
                steps.append(walk)
        return pa.table({
            "start": pa.array(nodes_out, pa.string()),
            "walk_idx": pa.array(widx, pa.int64()),
            "walk": pa.array(steps, pa.list_(pa.string()))})

    return _nodes_ds(graph).map_batches(walks_fn, batch_format="pyarrow")


def node2vec_embeddings(edges_ds, cfg: EmbeddingConfig,
                        max_walk_tokens: int = 50_000_000) -> rd.Dataset:
    """Full Node2Vec: distributed walks → deterministic walk reorder
    (walk-index-major over sorted start nodes = the kernel's order) →
    sequential skip-gram on the driver (reference semantics:
    ``graph/embeddings.rs:132-509`` applies ±lr updates to a single
    mutable table in walk order, an inherently sequential recurrence) →
    node embedding table.

    The walk ``take_all`` and the training loop are DRIVER-BOUND by those
    semantics, so the same guard discipline as the ``small_graph_limit``
    two-path ops applies: refuse (loudly, never a silent 100-GB collect)
    when the walk volume ``nodes × walks_per_node × walk_length`` exceeds
    ``max_walk_tokens`` (default ~50M tokens ≈ low-GB driver footprint).
    There is no faithful sharded twin for the training step — for a
    distributed embedding use ``graphsage_embeddings`` (sharded path).
    The adjacency build itself is also driver-side, so the edge table is
    bounded FIRST (same 2M-row default as ``graphsage_embeddings``'s
    broadcast path) — the walk-volume check alone would only fire after
    an unbounded edge collect.  The edge dataset is materialized ONCE
    up front (ADVICE r04): ``count()`` then ``_graph_from_edges_ds`` on
    a lazy lineage executed the upstream twice."""
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges > 2_000_000:
        raise ValueError(
            f"node2vec_embeddings: {n_edges:,} edge rows exceed the "
            "2,000,000-row driver adjacency bound; the reference's "
            "skip-gram training is sequential on the driver "
            "(graph/embeddings.rs:132-509) so this path cannot shard. "
            "Use graphsage_embeddings (sharded) for a distributed "
            "embedding, or node2vec_walks_sharded for walks alone.")
    graph = _graph_from_edges_ds(edges_ds)
    est_tokens = len(graph.nodes) * cfg.walks_per_node * cfg.walk_length
    if est_tokens > max_walk_tokens:
        raise ValueError(
            f"node2vec_embeddings: walk volume ~{est_tokens:,} tokens "
            f"({len(graph.nodes):,} nodes x {cfg.walks_per_node} walks x "
            f"{cfg.walk_length} steps) exceeds max_walk_tokens="
            f"{max_walk_tokens:,}; the skip-gram training is sequential "
            "on the driver by reference semantics "
            "(graph/embeddings.rs:132-509). Raise max_walk_tokens "
            "explicitly if the driver has the memory, or use "
            "graphsage_embeddings (sharded) for a distributed embedding.")
    rows = node2vec_walks_ds(graph, cfg).take_all()
    rows.sort(key=lambda r: (r["walk_idx"], r["start"]))
    walks = [list(r["walk"]) for r in rows]
    embeddings = init_embeddings(graph, cfg)
    train_skipgram(embeddings, walks, cfg)
    return _emb_table(embeddings, cfg.dimension)


def graphsage_embeddings(edges_ds, cfg: GraphSAGEConfig,
                         small_graph_limit: int = 2_000_000,
                         num_buckets: int = 64) -> rd.Dataset:
    """Full GraphSAGE, two-path: ≤ ``small_graph_limit`` edge rows →
    per-layer fan-out over the node table with the (adjacency, features)
    pair re-broadcast each layer (num_layers broadcasts, no shuffle);
    above it → ``graphsage_embeddings_sharded`` (no broadcast; requires
    an ``eidx`` column).  ``small_graph_limit=0`` forces the sharded
    path; both produce bit-identical embeddings (equality-gated).
    Materialized once up front so the guard count and the downstream
    build share one execution of the edge lineage (ADVICE r04)."""
    edges_ds = edges_ds.materialize()
    if edges_ds.count() > small_graph_limit:
        return graphsage_embeddings_sharded(edges_ds, cfg,
                                            num_buckets=num_buckets)
    graph = _graph_from_edges_ds(edges_ds)
    gref = ray.put(graph)
    features = {n: node_rng(cfg.seed, n, 2 ** 30).random(cfg.dimension)
                for n in graph.nodes}
    for layer in range(cfg.num_layers):
        samples = (cfg.samples_per_layer[layer]
                   if layer < len(cfg.samples_per_layer) else 10)
        fref = ray.put(features)

        def layer_fn(t: pa.Table, _layer=layer, _samples=samples,
                     _fref=fref) -> pa.Table:
            g = ray.get(gref)
            feats = ray.get(_fref)
            nodes = t.column("node").to_pylist()
            out = graphsage_layer(g, feats, _samples, _layer, cfg,
                                  nodes=nodes)
            return pa.table({
                "node": pa.array(nodes, pa.string()),
                "embedding": pa.array(
                    [out[n].tolist() for n in nodes],
                    pa.list_(pa.float64()))})

        new = _nodes_ds(graph).map_batches(
            layer_fn, batch_format="pyarrow").take_all()
        features = {r["node"]: np.asarray(r["embedding"]) for r in new}
    return _emb_table(features, cfg.dimension)


# ---------------------------------------------------------------- sharded


def _require_eidx(edges_ds) -> None:
    if "eidx" not in edges_ds.schema().names:
        raise ValueError(
            "sharded graph embeddings need an 'eidx' edge-input-order "
            "column (the reference's adjacency lists are input-ordered; "
            "once the build is distributed the order must travel with "
            "the rows)")


def _adj_lists_ds(edges_ds, num_buckets: int) -> rd.Dataset:
    """(src, dst, w, eidx) → one row per node: (node, nbrs list<string>,
    ws list<double>) with the EXACT adjacency order of
    ``EmbeddingGraph.from_edges`` over eidx-sorted edges (each edge
    appends src→dst then dst→src, so the within-edge tiebreak is the
    direction side)."""
    _require_eidx(edges_ds)

    def both_dirs(t: pa.Table) -> pa.Table:
        src, dst = t.column("src"), t.column("dst")
        w, eidx = t.column("w"), t.column("eidx")
        return pa.table({
            "node": pa.chunked_array(
                [src.combine_chunks(), dst.combine_chunks()]),
            "nbr": pa.chunked_array(
                [dst.combine_chunks(), src.combine_chunks()]),
            "w": pa.chunked_array(
                [w.combine_chunks(), w.combine_chunks()]),
            "eidx": pa.chunked_array(
                [eidx.combine_chunks(), eidx.combine_chunks()]),
            "side": pa.chunked_array(
                [pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                 pa.array(np.ones(t.num_rows, dtype=np.int8))])})

    def to_lists(t: pa.Table) -> pa.Table:
        t = t.sort_by([("node", "ascending"), ("eidx", "ascending"),
                       ("side", "ascending")])
        nodes = t.column("node").to_pylist()
        nbrs = t.column("nbr").to_pylist()
        ws = t.column("w").to_pylist()
        out_n, out_nb, out_w = [], [], []
        i, n = 0, len(nodes)
        while i < n:
            j = i
            while j < n and nodes[j] == nodes[i]:
                j += 1
            out_n.append(nodes[i])
            out_nb.append(nbrs[i:j])
            out_w.append(ws[i:j])
            i = j
        return pa.table({
            "node": pa.array(out_n, pa.string()),
            "nbrs": pa.array(out_nb, pa.list_(pa.string())),
            "ws": pa.array(out_w, pa.list_(pa.float64()))})

    from ..stages.hashagg import hash_grouped_aggregate
    return hash_grouped_aggregate(
        edges_ds.map_batches(both_dirs, batch_format="pyarrow"),
        ["node"], to_lists, num_buckets=num_buckets)


def _rng_state_bytes(rng: np.random.Generator) -> bytes:
    """PCG64 state → 37 bytes (state u128, inc u128, has_uint32 u8,
    uinteger u32) — lets a walk's RNG stream resume mid-walk on another
    worker with bit-identical draws."""
    st = rng.bit_generator.state
    return (st["state"]["state"].to_bytes(16, "big")
            + st["state"]["inc"].to_bytes(16, "big")
            + int(st["has_uint32"]).to_bytes(1, "big")
            + int(st["uinteger"]).to_bytes(4, "big"))


def _rng_from_bytes(b: bytes) -> np.random.Generator:
    g = np.random.Generator(np.random.PCG64())
    g.bit_generator.state = {
        "bit_generator": "PCG64",
        "state": {"state": int.from_bytes(b[:16], "big"),
                  "inc": int.from_bytes(b[16:32], "big")},
        "has_uint32": int(b[32]),
        "uinteger": int.from_bytes(b[33:37], "big")}
    return g


_WALK_STATE_SCHEMA = pa.schema([
    ("start", pa.string()), ("walk_idx", pa.int64()),
    ("step", pa.int64()), ("cur", pa.string()), ("prev", pa.string()),
    ("rng", pa.binary()), ("done", pa.bool_())])


def node2vec_walks_sharded(edges_ds, cfg: EmbeddingConfig,
                           num_buckets: int = 64,
                           work_dir: str | None = None) -> rd.Dataset:
    """Frontier-join walk generation — the no-broadcast twin of
    ``node2vec_walks_ds`` (bit-identical walks, equality-gated).

    One state row per (start node, walk index) carries the walk head and
    its serialized RNG; each round hash-joins the frontier against the
    per-node adjacency lists (one exchange per step), advances every
    walk one step with the SAME kernels as the broadcast path, and
    checkpoints the state to a per-round Parquet dir (iterative-loop
    lineage-cut rule).  Walks assemble at the end from the per-round
    step columns.  Returns (start, walk_idx, walk list<string>) like
    ``node2vec_walks_ds``."""
    import os
    import shutil

    from ..stages.hashagg import hash_grouped_aggregate

    work_dir = work_dir or f"/tmp/graft_n2v_walks_{os.getpid()}"
    if os.path.exists(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(work_dir)

    adj = _adj_lists_ds(edges_ds, num_buckets).materialize()

    def init_rows(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_pylist()
        s, wi, rng_b = [], [], []
        for node in nodes:
            for w in range(cfg.walks_per_node):
                s.append(node)
                wi.append(w)
                rng_b.append(_rng_state_bytes(node_rng(cfg.seed, node, w)))
        n = len(s)
        return pa.table({
            "start": pa.array(s, pa.string()),
            "walk_idx": pa.array(wi, pa.int64()),
            "step": pa.array(np.zeros(n, dtype=np.int64)),
            "cur": pa.array(s, pa.string()),
            "prev": pa.array([""] * n, pa.string()),
            "rng": pa.array(rng_b, pa.binary()),
            "done": pa.array(np.zeros(n, dtype=bool))})

    state = adj.map_batches(init_rows, batch_format="pyarrow")
    ck0 = os.path.join(work_dir, "round=0")
    os.makedirs(ck0)
    state.write_parquet(ck0)
    state = rd.read_parquet(ck0).repartition(num_buckets)

    # one wide exchange schema: walk rows + adjacency rows, keyed by cur
    def tag_state(t: pa.Table) -> pa.Table:
        return t.append_column(
            "nbrs", pa.nulls(t.num_rows, pa.list_(pa.string()))
        ).append_column(
            "ws", pa.nulls(t.num_rows, pa.list_(pa.float64())))

    def tag_adj(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "start": pa.nulls(n, pa.string()),
            "walk_idx": pa.nulls(n, pa.int64()),
            "step": pa.nulls(n, pa.int64()),
            "cur": t.column("node"),
            "prev": pa.nulls(n, pa.string()),
            "rng": pa.nulls(n, pa.binary()),
            "done": pa.nulls(n, pa.bool_()),
            "nbrs": t.column("nbrs"),
            "ws": t.column("ws")})

    for t_step in range(1, cfg.walk_length):

        def advance(tbl: pa.Table, _t=t_step) -> pa.Table:
            is_adj = pc.is_valid(tbl.column("nbrs"))
            adj_rows = tbl.filter(is_adj)
            nbr_map = {n: (nb, w) for n, nb, w in zip(
                adj_rows.column("cur").to_pylist(),
                adj_rows.column("nbrs").to_pylist(),
                adj_rows.column("ws").to_pylist())}
            walk_rows = tbl.filter(pc.invert(is_adj))
            starts = walk_rows.column("start").to_pylist()
            wis = walk_rows.column("walk_idx").to_pylist()
            steps = walk_rows.column("step").to_pylist()
            curs = walk_rows.column("cur").to_pylist()
            prevs = walk_rows.column("prev").to_pylist()
            rngs = walk_rows.column("rng").to_pylist()
            dones = walk_rows.column("done").to_pylist()
            for i in range(len(starts)):
                if dones[i]:
                    continue
                hit = nbr_map.get(curs[i])
                if hit is None:          # dead end — no adjacency row
                    dones[i] = True
                    continue
                nbrs, ws = hit
                rng = _rng_from_bytes(rngs[i])
                if _t == 1:
                    nxt = nbrs[int(rng.integers(0, len(nbrs)))]
                else:
                    nxt = _sample_next(prevs[i], list(zip(nbrs, ws)),
                                       cfg.return_param, cfg.inout_param,
                                       rng)
                prevs[i], curs[i] = curs[i], nxt
                steps[i] = _t
                rngs[i] = _rng_state_bytes(rng)
            return pa.table({
                "start": pa.array(starts, pa.string()),
                "walk_idx": pa.array(wis, pa.int64()),
                "step": pa.array(steps, pa.int64()),
                "cur": pa.array(curs, pa.string()),
                "prev": pa.array(prevs, pa.string()),
                "rng": pa.array(rngs, pa.binary()),
                "done": pa.array(dones, pa.bool_())})

        unioned = state.map_batches(
            tag_state, batch_format="pyarrow").union(
            adj.map_batches(tag_adj, batch_format="pyarrow"))
        advanced = hash_grouped_aggregate(unioned, ["cur"], advance,
                                          num_buckets=num_buckets)
        ck = os.path.join(work_dir, f"round={t_step}")
        os.makedirs(ck)
        advanced.write_parquet(ck)
        # coalesce on read (tiny-block sort hazard; see communities.py)
        state = rd.read_parquet(ck).repartition(num_buckets)

    # assemble: every round checkpoints the full state; a walk's node at
    # step s is the ``cur`` of any round whose row had advanced to s
    all_rounds = rd.read_parquet(work_dir)

    def dedup_steps(t: pa.Table) -> pa.Table:
        t = t.sort_by([("start", "ascending"), ("walk_idx", "ascending"),
                       ("step", "ascending")])
        seen = set()
        keep = np.zeros(t.num_rows, dtype=bool)
        starts = t.column("start").to_pylist()
        wis = t.column("walk_idx").to_pylist()
        steps = t.column("step").to_pylist()
        for i in range(t.num_rows):
            k = (starts[i], wis[i], steps[i])
            if k not in seen:
                seen.add(k)
                keep[i] = True
        kept = t.filter(pa.array(keep))
        # walks are whole within a (start, walk_idx) group by the
        # grouping key, so assemble here
        out_s, out_w, out_walk = [], [], []
        ks = kept.column("start").to_pylist()
        kw = kept.column("walk_idx").to_pylist()
        kc = kept.column("cur").to_pylist()
        i, n = 0, kept.num_rows
        while i < n:
            j = i
            while j < n and ks[j] == ks[i] and kw[j] == kw[i]:
                j += 1
            out_s.append(ks[i])
            out_w.append(kw[i])
            out_walk.append(kc[i:j])
            i = j
        return pa.table({
            "start": pa.array(out_s, pa.string()),
            "walk_idx": pa.array(out_w, pa.int64()),
            "walk": pa.array(out_walk, pa.list_(pa.string()))})

    return hash_grouped_aggregate(
        all_rounds.map_batches(
            lambda t: t.select(["start", "walk_idx", "step", "cur"]),
            batch_format="pyarrow"),
        ["start", "walk_idx"], dedup_steps, num_buckets=num_buckets)


def graphsage_embeddings_sharded(edges_ds, cfg: GraphSAGEConfig,
                                 num_buckets: int = 64,
                                 work_dir: str | None = None
                                 ) -> rd.Dataset:
    """No-broadcast GraphSAGE twin — features live as a Dataset.  Per
    layer: neighbor sampling is a stateless map over the adjacency
    lists (the sample is a pure function of (seed, node, layer, list)),
    feature lookup is a bucketed exchange on the neighbor id, the mean
    aggregate is a bucketed exchange on the node id with the adds
    applied in draw order (bit-equality with the broadcast kernel), and
    the (node + agg)/2 combine is a final exchange.  The feature table
    is Parquet-checkpointed per layer (iterative-loop lineage-cut
    rule).  Embeddings are bit-identical to ``graphsage_embeddings``'s
    broadcast path (equality-gated)."""
    import os
    import shutil

    from ..functions.graph_embeddings import sample_neighbors
    from ..stages.hashagg import hash_grouped_aggregate

    work_dir = work_dir or f"/tmp/graft_sage_{os.getpid()}"
    if os.path.exists(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(work_dir)

    adj = _adj_lists_ds(edges_ds, num_buckets).materialize()
    dim = cfg.dimension

    def init_feats(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_pylist()
        return pa.table({
            "node": pa.array(nodes, pa.string()),
            "emb": pa.array(
                [node_rng(cfg.seed, n, 2 ** 30).random(dim).tolist()
                 for n in nodes], pa.list_(pa.float64()))})

    feats = adj.map_batches(init_feats, batch_format="pyarrow")
    ck = os.path.join(work_dir, "feats_init")
    os.makedirs(ck)
    feats.write_parquet(ck)
    feats = rd.read_parquet(ck).repartition(num_buckets)

    for layer in range(cfg.num_layers):
        samples = (cfg.samples_per_layer[layer]
                   if layer < len(cfg.samples_per_layer) else 10)

        def draw(t: pa.Table, _layer=layer, _samples=samples) -> pa.Table:
            nodes = t.column("node").to_pylist()
            nbrs_l = t.column("nbrs").to_pylist()
            ws_l = t.column("ws").to_pylist()
            out_node, out_nbr, out_si, out_n = [], [], [], []
            for node, nbrs, ws in zip(nodes, nbrs_l, ws_l):
                sampled = sample_neighbors(
                    list(zip(nbrs, ws)), _samples,
                    node_rng(cfg.seed, node, 2 ** 20 + _layer))
                for si, nb in enumerate(sampled):
                    out_node.append(node)
                    out_nbr.append(nb)
                    out_si.append(si)
                    out_n.append(len(sampled))
            return pa.table({
                "node": pa.array(out_node, pa.string()),
                "nbr": pa.array(out_nbr, pa.string()),
                "si": pa.array(out_si, pa.int64()),
                "n_sampled": pa.array(out_n, pa.int64())})

        sampled_ds = adj.map_batches(draw, batch_format="pyarrow")

        # exchange 1 (on nbr): attach the neighbor's feature vector
        def tag_sampled(t: pa.Table) -> pa.Table:
            return t.append_column(
                "emb", pa.nulls(t.num_rows, pa.list_(pa.float64())))

        def tag_feats_nbr(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "node": pa.nulls(n, pa.string()),
                "nbr": t.column("node"),
                "si": pa.nulls(n, pa.int64()),
                "n_sampled": pa.nulls(n, pa.int64()),
                "emb": t.column("emb")})

        def lookup(t: pa.Table) -> pa.Table:
            is_feat = pc.is_null(t.column("node"))
            fr = t.filter(is_feat)
            fmap = dict(zip(fr.column("nbr").to_pylist(),
                            fr.column("emb").to_pylist()))
            sr = t.filter(pc.invert(is_feat))
            return pa.table({
                "node": sr.column("node"),
                "si": sr.column("si"),
                "n_sampled": sr.column("n_sampled"),
                "nbr_emb": pa.array(
                    [fmap[nb] for nb in sr.column("nbr").to_pylist()],
                    pa.list_(pa.float64()))})

        looked = hash_grouped_aggregate(
            sampled_ds.map_batches(tag_sampled, batch_format="pyarrow")
            .union(feats.map_batches(tag_feats_nbr,
                                     batch_format="pyarrow")),
            ["nbr"], lookup, num_buckets=num_buckets)

        # exchange 2 (on node): mean in draw order (bit-equal adds)
        def mean_agg(t: pa.Table) -> pa.Table:
            t = t.sort_by([("node", "ascending"), ("si", "ascending")])
            nodes = t.column("node").to_pylist()
            embs = t.column("nbr_emb").to_pylist()
            ns = t.column("n_sampled").to_pylist()
            out_node, out_agg = [], []
            i, n = 0, t.num_rows
            while i < n:
                j = i
                total = np.zeros(dim)
                while j < n and nodes[j] == nodes[i]:
                    total += np.asarray(embs[j])
                    j += 1
                out_node.append(nodes[i])
                out_agg.append((total / ns[i]).tolist())
                i = j
            return pa.table({
                "node": pa.array(out_node, pa.string()),
                "agg": pa.array(out_agg, pa.list_(pa.float64()))})

        agg_ds = hash_grouped_aggregate(looked, ["node"], mean_agg,
                                        num_buckets=num_buckets)

        # exchange 3 (on node): combine = (node + agg)/2
        def tag_feat_rows(t: pa.Table) -> pa.Table:
            return t.append_column(
                "agg", pa.nulls(t.num_rows, pa.list_(pa.float64())))

        def tag_agg_rows(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column("node"),
                "emb": pa.nulls(t.num_rows, pa.list_(pa.float64())),
                "agg": t.column("agg")})

        def combine(t: pa.Table) -> pa.Table:
            is_agg = pc.is_null(t.column("emb"))
            ar = t.filter(is_agg)
            amap = dict(zip(ar.column("node").to_pylist(),
                            ar.column("agg").to_pylist()))
            fr = t.filter(pc.invert(is_agg))
            nodes = fr.column("node").to_pylist()
            embs = fr.column("emb").to_pylist()
            out = []
            for node, emb in zip(nodes, embs):
                a = amap.get(node)
                agg = (np.asarray(a) if a is not None
                       else np.zeros(dim))        # zero-neighbor node
                out.append(((np.asarray(emb) + agg) / 2.0).tolist())
            return pa.table({
                "node": pa.array(nodes, pa.string()),
                "emb": pa.array(out, pa.list_(pa.float64()))})

        new_feats = hash_grouped_aggregate(
            feats.map_batches(tag_feat_rows, batch_format="pyarrow")
            .union(agg_ds.map_batches(tag_agg_rows,
                                      batch_format="pyarrow")),
            ["node"], combine, num_buckets=num_buckets)

        ck = os.path.join(work_dir, f"feats_{layer}")
        os.makedirs(ck)
        new_feats.write_parquet(ck)
        # coalesce on read (tiny-block sort hazard; see communities.py)
        feats = rd.read_parquet(ck).repartition(num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_pylist()
        embs = t.column("emb").to_pylist()
        return pa.table({
            "node": pa.array(nodes, pa.string()),
            "dim": pa.array([dim] * len(nodes), pa.int64()),
            "l2_norm": pa.array(
                [round(float(np.linalg.norm(np.asarray(e))), 8)
                 for e in embs], pa.float64()),
            "embedding": pa.array(embs, pa.list_(pa.float64()))})

    return feats.map_batches(finalize, batch_format="pyarrow")


def _emb_table(embeddings: dict[str, np.ndarray], dim: int) -> rd.Dataset:
    nodes = sorted(embeddings)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.string()),
        "dim": pa.array([dim] * len(nodes), pa.int64()),
        "l2_norm": pa.array(
            [round(float(np.linalg.norm(embeddings[n])), 8)
             for n in nodes], pa.float64()),
        "embedding": pa.array([embeddings[n].tolist() for n in nodes],
                              pa.list_(pa.float64()))}))
