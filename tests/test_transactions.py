"""Versioned graph store: transactions, rollback, time travel, and the
consistency report (``graph/incremental.rs:2266-2368,2496-2539``)."""

import pyarrow as pa
import pytest


def _ents(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "entity_id": pa.array([r[0] for r in rows], pa.string()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "type": pa.array([r[2] for r in rows], pa.string()),
        "conf": pa.array([r[3] for r in rows], pa.float32()),
        "mention_count": pa.array([r[4] for r in rows], pa.int64()),
    }))


def _tris(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "conf": pa.array([r[3] for r in rows], pa.float32()),
        "n_contexts": pa.array([r[4] for r in rows], pa.int64()),
        "context_sample": pa.array([r[5] for r in rows], pa.string()),
    }))


E0 = [("e1", "Alice Smith", "person", 0.9, 3),
      ("e2", "Acme Corp", "organization", 0.8, 2)]
T0 = [("Alice Smith", "works_for", "Acme Corp", 0.9, 2, "c1")]


def _store(tmp_path):
    from graphrag_rs_ray.state.transactions import VersionedGraphStore
    return VersionedGraphStore(str(tmp_path / "graph"))


def test_commit_and_read_roundtrip(ray_session, tmp_path):
    s = _store(tmp_path)
    v = s.begin().write_entities(_ents(E0)).write_triples(_tris(T0)).commit()
    assert v == 0 and s.current_version() == 0
    ent, tri = s.read()
    edf = ent.to_pandas().sort_values("entity_id")
    assert list(edf["name"]) == ["Alice Smith", "Acme Corp"]
    assert tri.count() == 1


def test_delta_merge_semantics(ray_session, tmp_path):
    s = _store(tmp_path)
    s.begin().write_entities(_ents(E0)).write_triples(_tris(T0)).commit()
    # delta: e1 again with higher conf (name wins), plus a new entity+triple
    s.begin().write_entities(_ents(
        [("e1", "Alice J. Smith", "person", 0.95, 2),
         ("e3", "Bob", "person", 0.7, 1)])).write_triples(_tris(
        [("Alice Smith", "works_for", "Acme Corp", 0.95, 1, "c0"),
         ("Bob", "knows", "Alice Smith", 0.7, 1, "c2")])).commit()
    ent, tri = s.read()
    edf = ent.to_pandas().set_index("entity_id")
    assert len(edf) == 3
    assert edf.loc["e1", "name"] == "Alice J. Smith"      # higher conf wins
    assert edf.loc["e1", "mention_count"] == 5            # counts sum
    tdf = tri.to_pandas().set_index(["subj", "pred", "obj"])
    assert len(tdf) == 2
    row = tdf.loc[("Alice Smith", "works_for", "Acme Corp")]
    assert row["n_contexts"] == 3                         # 2 + 1
    assert abs(row["conf"] - 0.95) < 1e-6                 # max conf
    assert row["context_sample"] == "c0"                  # min sample


def test_abort_leaves_no_trace(ray_session, tmp_path):
    from graphrag_rs_ray.state.transactions import TransactionError
    s = _store(tmp_path)
    s.begin().write_entities(_ents(E0)).commit()
    tx = s.begin().write_entities(_ents([("e9", "Ghost", "person", 0.5, 1)]))
    tx.rollback()
    assert s.current_version() == 0
    ent, _ = s.read()
    assert ent.count() == 2
    with pytest.raises(TransactionError):
        tx.write_entities(_ents(E0))                      # aborted tx is dead


def test_rollback_to_is_nondestructive_time_travel(ray_session, tmp_path):
    s = _store(tmp_path)
    s.begin().write_entities(_ents(E0)).commit()                      # v0
    s.begin().write_entities(
        _ents([("e3", "Bob", "person", 0.7, 1)])).commit()            # v1
    v2 = s.rollback_to(0)                                             # v2
    assert v2 == 2
    ent, _ = s.read()                                  # latest == v0 content
    assert ent.count() == 2
    ent1, _ = s.read(version=1)                        # v1 still reachable
    assert ent1.count() == 3
    ops = [h["op"] for h in s.history()]
    assert ops == ["commit", "commit", "rollback_to"]


CE = [("e1", "A", "person", 0.9, 1), ("e2", "B", "person", 0.9, 1),
      ("e3", "C", "person", 0.9, 1)]
CT = [("A", "knows", "B", 0.9, 1, "c"),
      ("B", "knows", "D", 0.9, 1, "c")]     # D: broken endpoint


def _with_emb(ds, null_names):
    def add(t: pa.Table) -> pa.Table:
        emb = [None if n in null_names else [1.0, 0.0]
               for n in t.column("name").to_pylist()]
        return t.append_column("embedding", pa.array(emb, pa.list_(pa.float64())))
    return ds.map_batches(add, batch_format="pyarrow")


@pytest.mark.parametrize("broadcast_limit", [2_000_000, 0])
def test_consistency_report_counts(ray_session, tmp_path, broadcast_limit):
    from graphrag_rs_ray.state.transactions import consistency_report
    rep = consistency_report(_with_emb(_ents(CE), {"C"}), _tris(CT),
                             broadcast_limit=broadcast_limit).to_pandas()
    r = rep.iloc[0]
    assert r["n_entities"] == 3 and r["n_triples"] == 2
    assert r["n_orphaned"] == 1          # C touches no relationship
    assert r["n_broken"] == 1            # B -> D
    assert r["n_missing_embeddings"] == 1
    assert r["issues_found"] == 3 and r["is_consistent"] == 0


def test_consistency_report_clean_graph(ray_session, tmp_path):
    from graphrag_rs_ray.state.transactions import consistency_report
    rep = consistency_report(
        _with_emb(_ents(CE[:2]), set()),
        _tris([("A", "knows", "B", 0.9, 1, "c")])).to_pandas()
    r = rep.iloc[0]
    assert r["issues_found"] == 0 and r["is_consistent"] == 1
