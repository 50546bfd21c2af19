"""Per-stage / per-partition lineage manifests → checkpoint-resume.

Layout (SURVEY §4 checkpoint row): every stage output is a Parquet
directory plus a ``_MANIFEST.json`` recording the stage name, an input
fingerprint (hash of input description + config), and row counts.  A rerun
with the same fingerprint skips the stage (``stage_complete``); a changed
fingerprint invalidates it.  Writes are atomic: data lands in ``<dir>.tmp``
and is renamed into place before the manifest is written, so a crashed
stage never looks complete.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

MANIFEST_NAME = "_MANIFEST.json"


def fingerprint_config(*parts) -> str:
    blob = json.dumps([repr(p) for p in parts], sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def write_manifest(out_dir: str, stage: str, fingerprint: str,
                   rows: int | None = None, extra: dict | None = None) -> dict:
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": rows,
        "completed_at": time.time(),
        **(extra or {}),
    }
    path = os.path.join(out_dir, MANIFEST_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)
    return manifest


def read_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def stage_complete(out_dir: str, fingerprint: str) -> bool:
    m = read_manifest(out_dir)
    return bool(m and m.get("fingerprint") == fingerprint)


def atomic_write_dir(write_fn, out_dir: str):
    """Run ``write_fn(tmp_dir)`` then rename tmp_dir → out_dir."""
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(tmp, exist_ok=True)
    write_fn(tmp)
    os.replace(tmp, out_dir)
