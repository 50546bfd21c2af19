"""Gates for reproducible per-domain token-budget sampling: greedy
md5-order prefix semantics vs a naive re-derivation, budget edges, and
determinism under resharding."""

import hashlib

import pyarrow as pa


def _ds(rows, override_num_blocks=None):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(override_num_blocks) if override_num_blocks else ds


def _naive(rows, budget):
    by_src = {}
    for d, t, s in rows:
        by_src.setdefault(s, []).append(
            (hashlib.md5(str(d).encode()).hexdigest(), d, len(t.split())))
    sel = {}
    for s, docs in by_src.items():
        before = 0
        for h, d, w in sorted(docs):
            sel[d] = before < budget
            before += w
    return sel


def test_matches_naive_and_resharding(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rows = [(i, " ".join([f"w{i}x{j}" for j in range(3 + i % 7)]),
             f"s{i % 3}") for i in range(60)]
    exp = _naive(rows, budget=40)
    for blocks in (None, 7):
        out = (td.domain_mixture("/unused", budget=40,
                                 docs_ds=_ds(rows, blocks))
               .to_pandas().set_index("doc_id"))
        assert {d: bool(v) for d, v in out.selected.items()} == exp
    # budget is honored: selected tokens stop once cumulative >= budget
    df = (td.domain_mixture("/unused", budget=40, docs_ds=_ds(rows))
          .to_pandas())
    for s, grp in df.groupby("source"):
        sel_toks = int(grp[grp.selected].n_words.sum())
        # greedy prefix: total may overshoot by at most the last doc
        assert sel_toks >= min(40, int(grp.n_words.sum()))
        assert sel_toks - int(grp[grp.selected].n_words.max()) < 40


def test_budget_edges(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rows = [(i, "one two three", "only") for i in range(5)]  # 3 tokens each
    all_in = (td.domain_mixture("/unused", budget=1000, docs_ds=_ds(rows))
              .to_pandas())
    assert all_in.selected.all()  # whole source under budget
    one = (td.domain_mixture("/unused", budget=1, docs_ds=_ds(rows))
           .to_pandas())
    assert one.selected.sum() == 1  # first doc in md5 order only
