"""Gates for the sequence-packing manifest: naive prefix-scan equality
across bucket boundaries, straddling docs, empty-doc sentinel, and
resharding invariance."""

import numpy as np
import pyarrow as pa


def _ds(rows, blocks=None):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks else ds


def _naive(rows, L):
    out, cum = {}, 0
    for d, t in sorted(rows):
        n = len(t.split())
        start_seq, start_off = cum // L, cum % L
        end_seq = start_seq - 1 if n == 0 else (cum + n - 1) // L
        out[d] = (n, cum, start_seq, start_off, end_seq)
        cum += n
    return out


def test_matches_naive_across_buckets(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(41))
    # ids span several 4096-wide buckets, sparse and unordered on disk
    ids = [0, 1, 2, 4095, 4096, 4097, 9000, 20000, 20001, 50000]
    rows = [(d, " ".join(["tok"] * int(rng.integers(0, 40)))) for d in ids]
    rows[4] = (4096, "")  # empty doc at a bucket boundary
    exp = _naive(rows, 64)
    for blocks in (None, 5):
        out = (td.sequence_pack("/unused", seq_len=64,
                                docs_ds=_ds(rows, blocks))
               .to_pandas().set_index("doc_id").sort_index())
        for d, (n, cum, ss, so, es) in exp.items():
            r = out.loc[d]
            assert (r.n_tokens, r.cum_before, r.start_seq, r.start_off,
                    r.end_seq) == (n, cum, ss, so, es), d


def test_straddle_and_contiguity(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rows = [(1, " ".join(["a"] * 100)),    # fills seq 0 + 36 of seq 1
            (2, " ".join(["b"] * 10)),     # seq 1
            (3, " ".join(["c"] * 30))]     # straddles seq 1 -> 2
    out = (td.sequence_pack("/unused", seq_len=64, docs_ds=_ds(rows))
           .to_pandas().set_index("doc_id"))
    assert (out.loc[1].start_seq, out.loc[1].end_seq) == (0, 1)
    assert (out.loc[2].start_seq, out.loc[2].end_seq) == (1, 1)
    assert (out.loc[3].start_seq, out.loc[3].end_seq) == (1, 2)
    # token stream is gapless: cum_before[next] == cum_before + n_tokens
    s = out.sort_index()
    assert (s.cum_before.to_numpy()[1:]
            == (s.cum_before + s.n_tokens).to_numpy()[:-1]).all()
