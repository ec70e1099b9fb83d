"""Per-partition checkpoint manifests + lineage for exact resume.

The reference's only "resume" is file-level caching (rerun skips a
stage if its output file exists; the HTTP linker flushes every 50
records, /root/reference/ATLOP+KIRE/data/gen_kg_data.py:137-141).  At
10^12 turns a run *will* be interrupted, so the engine makes resume a
first-class layout (SURVEY.md §4 "checkpoint/resume"):

- output is partitioned: one directory per partition
  (``part=<k>/``), where k = hash(conv_id) % n_parts;
- each partition directory is written atomically (temp dir + rename)
  and carries ``_MANIFEST.json`` with lineage: input fingerprint,
  partition id, row counts per output table, wall time, engine version;
- ``done_partitions`` scans manifests; a resumed run processes only the
  missing partitions and never re-reads finished ones.

Exactness: partitions are disjoint by conv_id hash and every stage
below the partition filter is deterministic, so (resumed ∪ finished) ==
single-run output, verified by tests/test_resume.py.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(partition_dir(out_dir, part), "_MANIFEST.json")


def compacted_segments(out_dir: str) -> list[tuple[str, dict]]:
    """Compacted range directories (``part=<lo>-<hi>``) with their
    manifests — each covers several original partitions (listed in
    ``lineage.partitions``) rewritten into one segment by
    ``kg_construct.compact_segments``."""
    import glob as _glob
    import re as _re

    out = []
    for d in sorted(_glob.glob(os.path.join(out_dir, "part=*-*"))):
        # exact published label only: the staging dir 'part=<lo>-<hi>.tmp'
        # ALSO matches this glob and already contains its manifest
        # before the atomic rename (review r5) — reading it would
        # double-count against the originals it hasn't replaced yet
        if not _re.fullmatch(r"part=\d+-\d+", os.path.basename(d)):
            continue
        mp = os.path.join(d, "_MANIFEST.json")
        if os.path.exists(mp):
            with open(mp) as f:
                out.append((d, json.load(f)))
    return out


def covered_partitions(out_dir: str) -> set[int]:
    """Partition ids already folded into a compacted segment. A
    leftover original ``part=<k>`` dir in this set is IGNORED by
    readers (the compacted copy wins) — which makes compaction
    crash-safe: publish-compacted happens before delete-originals."""
    cov: set[int] = set()
    for _, m in compacted_segments(out_dir):
        cov.update(m.get("lineage", {}).get("partitions", []))
    return cov


def done_partitions(out_dir: str, n_parts: int) -> set[int]:
    done = covered_partitions(out_dir)
    for k in range(n_parts):
        if os.path.exists(manifest_path(out_dir, k)):
            done.add(k)
    return {k for k in done if k < n_parts}


def write_partition_atomic(out_dir: str, part: int, writer, lineage: dict) -> dict:
    """Run ``writer(tmp_dir) -> {table: rows}`` then atomically publish
    the partition with its manifest. Returns the manifest dict."""
    final = partition_dir(out_dir, part)
    os.makedirs(out_dir, exist_ok=True)
    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    t0 = time.time()
    rows = writer(tmp)
    manifest = {
        "partition": part,
        "rows": rows,
        "lineage": lineage,
        "wall_sec": round(time.time() - t0, 3),
        "engine": "kire_ray-0.1.0",
    }
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return manifest


def read_manifests(out_dir: str, n_parts: int) -> list[dict]:
    """Per-partition manifests for every done partition. Partitions
    folded into a compacted segment no longer have their own file
    (compaction deletes the originals) — their lineage is represented
    by the covering SEGMENT manifest, appended once per segment
    (review r5: opening the deleted per-partition path crashed)."""
    out = []
    cov = covered_partitions(out_dir)
    for k in sorted(done_partitions(out_dir, n_parts)):
        if k in cov:
            continue  # the segment manifest below carries its lineage
        mp = manifest_path(out_dir, k)
        if os.path.exists(mp):
            with open(mp) as f:
                out.append(json.load(f))
    for _, m in compacted_segments(out_dir):
        out.append(m)
    return out
