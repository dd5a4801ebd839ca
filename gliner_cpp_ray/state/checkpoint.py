"""Per-stage / per-shard checkpointing with lineage manifests (B14).

Layout: every pipeline stage writes to ``<out_root>/<stage>/`` (or
``<out_root>/<stage>/shard=<k>/`` for sharded stages), followed by a
``manifest.json`` (input lineage, per-file row counts + bytes, wall
time, config fingerprint) and a ``_SUCCESS`` marker.  A rerun skips any
directory whose marker exists — that is what "resumable from
checkpoint" means for a batch pipeline.  A directory without a marker
is presumed a torn partial write and is removed before re-running.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def is_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def prepare_dir(path: str) -> None:
    """Clear torn partial output; create fresh."""
    if os.path.isdir(path) and not is_done(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def mark_done(path: str, manifest: dict) -> None:
    files = []
    for root, _, names in os.walk(path):
        for name in sorted(names):
            if name.endswith(".parquet"):
                fp = os.path.join(root, name)
                entry = {
                    "file": os.path.relpath(fp, path),
                    "bytes": os.path.getsize(fp),
                }
                try:
                    import pyarrow.parquet as pq

                    entry["rows"] = pq.ParquetFile(fp).metadata.num_rows
                except Exception:
                    pass
                files.append(entry)
    manifest = dict(manifest)
    manifest["files"] = files
    manifest["total_rows"] = sum(f.get("rows", 0) for f in files)
    manifest["total_bytes"] = sum(f["bytes"] for f in files)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("ok\n")


def run_stage(path: str, manifest: dict, producer) -> dict:
    """Run ``producer(path)`` (which must write parquet under ``path``)
    unless the stage is already checkpointed WITH the same config
    fingerprint.  A checkpoint written under a different config (e.g.
    changed lang allowlist or batch size) is stale — silently reusing it
    would return outputs of a different pipeline — so it is discarded
    and the stage re-runs.  Returns the manifest."""
    mpath = os.path.join(path, "manifest.json")
    if is_done(path):
        try:
            with open(mpath) as f:
                prev = json.load(f)
        except (OSError, json.JSONDecodeError):
            prev = None
        if prev is not None and prev.get("config") == manifest.get("config"):
            return prev
        shutil.rmtree(path, ignore_errors=True)
    prepare_dir(path)
    t0 = time.perf_counter()
    extra = producer(path) or {}
    manifest = {**manifest, **extra, "wall_sec": round(time.perf_counter() - t0, 3)}
    mark_done(path, manifest)
    with open(mpath) as f:
        return json.load(f)
