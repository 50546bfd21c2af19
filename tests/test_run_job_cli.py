"""Drive the ray-job-submit CLI surface (scripts/run_job.py) in real
subprocesses — fresh Ray session per invocation."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "scripts", "run_job.py")


def _run(args, check=True):
    return subprocess.run([sys.executable, JOB, *args], capture_output=True,
                          text=True, check=check, cwd=REPO,
                          env={**os.environ, "RAY_ADDRESS": "local"})


def test_synthetic_job_and_resume(tmp_path):
    out = str(tmp_path / "graph")
    stage = str(tmp_path / "stage")
    r = _run(["--synthetic", "40", "--out", out, "--work-dir", stage,
              "--num-shards", "4"])
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_triples"] > 0 and res["num_shards"] == 4
    assert os.path.isdir(os.path.join(out, "triples", "shard=0"))
    # resume: second run reuses the staged combined output, same counts
    r2 = _run(["--synthetic", "40", "--out", out, "--work-dir", stage,
               "--num-shards", "4"])
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2["n_triples"] == res["n_triples"]
    assert res2["n_entities"] == res["n_entities"]


def test_gleaning_extractor_flag(tmp_path):
    out = str(tmp_path / "g")
    r = _run(["--synthetic", "20", "--out", out, "--extractor", "gleaning"])
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_triples"] > 0


def test_bad_extractor_fails_cleanly(tmp_path):
    r = _run(["--synthetic", "5", "--out", str(tmp_path / "x"),
              "--extractor", "nope"], check=False)
    assert r.returncode != 0
    assert "unknown extractor" in (r.stderr + r.stdout)
