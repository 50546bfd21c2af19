"""Checkpoint/lineage state helpers."""

from .manifests import write_manifest, read_manifest, stage_complete, fingerprint_config

__all__ = ["write_manifest", "read_manifest", "stage_complete", "fingerprint_config"]
