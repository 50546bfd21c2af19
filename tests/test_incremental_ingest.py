"""Incremental-crawl ingest job (scripts/run_incremental_ingest.py):
diff → fp-index dup flags → curation → sharded append, batch-granular
resume after a mid-job crash."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_ingest_crash_resume(ray_session, tmp_path):
    from run_incremental_ingest import run_job

    out = str(tmp_path / "corpus")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_job(out, batches=2, docs_per_batch=3000, num_shards=4,
                crash_after=1)
    # resume: batch 0 skipped via its manifest, batch 1 redone
    s = run_job(out, batches=2, docs_per_batch=3000, num_shards=4)
    assert s["skipped"] == 1 and s["redone"] == 1
    assert s["batches"][0]["resumed"] is True
    assert s["batches"][1]["resumed"] is False
    # batch 1 re-crawls 25% of batch 0: the unchanged 4/5 are dropped by
    # the diff, and cross-batch content dups are flagged by the fp index
    b1 = s["batches"][1]
    assert b1["n_unchanged_dropped"] > 0
    assert b1["n_corpus_dups_flagged"] > 0
    assert b1["n_written"] > 0
    # a third, identical run is a full no-op
    s2 = run_job(out, batches=2, docs_per_batch=3000, num_shards=4)
    assert s2["skipped"] == 2 and s2["redone"] == 0
    assert s2["corpus_rows"] == s["corpus_rows"]
