"""Gates for SimHash near-dup pair generation (pigeonhole banding →
exact Hamming verify).  Signatures are injected via ``sigs_ds`` so the
planted Hamming distances are exact by construction."""

import numpy as np
import pyarrow as pa
import pytest


def _sigs_ds(sig_by_id: dict[int, int]):
    import ray.data as rd
    ids = sorted(sig_by_id)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array([sig_by_id[i] for i in ids], pa.uint64())}))


BASE_SIG = 0x5A5A_1234_ABCD_0F0F


def test_planted_hamming_distances(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    sigs = {
        1: BASE_SIG,
        2: BASE_SIG ^ 0b111,                     # 3 flips, all in band 0
        3: BASE_SIG ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)),
        # ^ one flip in EVERY band: distance 4 — correctly NOT a
        #   candidate (no band agrees), the documented recall bound
        4: 0x0101_0101_0101_0101,                # far away
    }
    out = (td.simhash_dup_pairs("/unused", sigs_ds=_sigs_ds(sigs))
           .to_pandas().sort_values(["doc_a", "doc_b"]))
    got = set(zip(out.doc_a, out.doc_b, out.hamming))
    assert (1, 2, 3) in got
    assert all(a != 3 and b != 3 for a, b, _ in got)
    assert all(a != 4 and b != 4 for a, b, _ in got)


def test_pigeonhole_recall_within_3_flips(ray_session):
    """Any pair within Hamming distance ≤ 3 MUST be found (pigeonhole
    over 4 bands guarantees a shared band)."""
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(42))
    sigs, expected = {}, set()
    for k in range(20):
        base = int(rng.integers(0, 2**63, dtype=np.int64)) * 2 + 1
        a, b = 100 + 2 * k, 101 + 2 * k
        flips = rng.choice(64, size=int(rng.integers(0, 4)), replace=False)
        mut = base
        for f in flips:
            mut ^= (1 << int(f))
        sigs[a], sigs[b] = base & (2**64 - 1), mut & (2**64 - 1)
        expected.add((a, b, len(flips)))
    out = td.simhash_dup_pairs("/unused", sigs_ds=_sigs_ds(sigs)).to_pandas()
    got = set(zip(out.doc_a, out.doc_b, out.hamming))
    missing = {(a, b, h) for a, b, h in expected if (a, b, h) not in got}
    assert not missing, f"pigeonhole recall violated: {missing}"


def test_manku_equals_banding(ray_session):
    """The Manku 2007 permuted-prefix twin must produce the IDENTICAL
    verified pair set as the 4×16 banding path (both have exact recall
    for distance ≤ max_hamming and the same popcount verify)."""
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(13))
    sigs = {}
    for k in range(40):
        base = int(rng.integers(0, 2**63, dtype=np.int64)) & (2**64 - 1)
        a, b = 300 + 2 * k, 301 + 2 * k
        flips = rng.choice(64, size=int(rng.integers(0, 6)), replace=False)
        mut = base
        for f in flips:
            mut ^= 1 << int(f)
        sigs[a], sigs[b] = base, mut & (2**64 - 1)
    cols = ["doc_a", "doc_b", "hamming"]

    def norm(ds):
        return (ds.to_pandas()[cols].sort_values(cols)
                .reset_index(drop=True))

    banding = norm(td.simhash_dup_pairs("/unused", sigs_ds=_sigs_ds(sigs)))
    manku = norm(td.simhash_dup_pairs_manku("/unused",
                                            sigs_ds=_sigs_ds(sigs)))
    assert len(banding) > 0
    assert banding.equals(manku)
    # bucketed-verify twin of the manku path agrees too
    manku_j = norm(td.simhash_dup_pairs_manku(
        "/unused", sigs_ds=_sigs_ds(sigs), small_cand_limit=0))
    assert manku.equals(manku_j)


def test_manku_pigeonhole_recall(ray_session):
    """distance ≤ 3 pairs MUST appear (some 3-of-6 block subset agrees);
    distance-4 pairs spread over ≥ 4 blocks must NOT be candidates when
    no 3 blocks agree... they CAN be (only 4 of 6 blocks touched means
    2+ agree but not 3 — flips in 4 distinct blocks leave exactly 2
    agreeing blocks < 3, so no table catches them)."""
    from graphrag_rs_ray.pipelines import training_data as td

    base = BASE_SIG
    sigs = {
        1: base,
        2: base ^ 0b111,                          # distance 3, one block
        # one flip in 4 DIFFERENT 11/10-bit blocks (offsets 0,11,22,33):
        3: base ^ ((1 << 0) | (1 << 11) | (1 << 22) | (1 << 33)),
        4: 0x0101_0101_0101_0101,
    }
    out = td.simhash_dup_pairs_manku("/unused",
                                     sigs_ds=_sigs_ds(sigs)).to_pandas()
    got = set(zip(out.doc_a, out.doc_b, out.hamming))
    assert (1, 2, 3) in got
    assert all(a != 3 and b != 3 for a, b, _ in got)   # dist 4: excluded
    assert all(a != 4 and b != 4 for a, b, _ in got)


def test_verify_paths_equal(ray_session):
    from graphrag_rs_ray.pipelines import training_data as td

    rng = np.random.Generator(np.random.PCG64(7))
    sigs = {}
    for k in range(30):
        base = int(rng.integers(0, 2**63, dtype=np.int64)) & (2**64 - 1)
        sigs[200 + 2 * k] = base
        sigs[201 + 2 * k] = base ^ 0b11
    cols = ["doc_a", "doc_b", "hamming"]
    fast = (td.simhash_dup_pairs("/unused", sigs_ds=_sigs_ds(sigs))
            .to_pandas()[cols].sort_values(cols).reset_index(drop=True))
    joined = (td.simhash_dup_pairs("/unused", sigs_ds=_sigs_ds(sigs),
                                   small_cand_limit=0)
              .to_pandas()[cols].sort_values(cols).reset_index(drop=True))
    assert fast.equals(joined)
