"""Sharded ORC sink/source.

Ray 2.49 ships no ``read_orc`` / ``write_orc``; pyarrow does ship the
codec, so the engine provides the format the same way its JSONL sink
does: the WRITE is a per-block ``map_batches`` emitting one
content-named ``.orc`` file per non-empty block (idempotent across
re-runs — the name is the md5 of the block payload, so a retried task
overwrites its own file rather than duplicating rows), and the READ is
a file-per-task distributed decode (one pyarrow ``orc.read_table`` per
file, column-pruned at the reader like the parquet path).

At 100 TB this is the standard file-granular layout: block size
controls file size, reads parallelize per file, and a partial write is
re-runnable because names are content-derived.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def write_orc_sharded(ds: "ray.data.Dataset", out_dir: str) -> pd.DataFrame:
    """Write every non-empty block as ``<md5(payload)>.orc`` under
    ``out_dir`` (tmp-file + rename = atomic per shard). Returns the
    manifest (path, rows) — driver-side, file-count-bounded.

    Content-addressed naming is deliberately RETRY-idempotent (a
    re-executed task overwrites its own shard); the flip side is that
    two byte-IDENTICAL blocks collapse into one file (review r5) —
    detectable because the manifest then reports more rows than the
    directory holds (``manifest.rows.sum()`` vs the read-back count).
    A corpus with duplicate blocks should dedup upstream or add a
    distinguishing column before export."""
    import hashlib

    from pyarrow import orc

    os.makedirs(out_dir, exist_ok=True)

    def dump(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        orc.write_table(tab, sink)
        payload = sink.getvalue().to_pybytes()
        name = hashlib.md5(payload).hexdigest()[:20]
        path = os.path.join(out_dir, f"{name}.orc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"path": [path], "rows": [tab.num_rows]})

    return ds.map_batches(dump, batch_format="pyarrow", batch_size=None).to_pandas()


def read_orc(dir_path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Distributed ORC read: one decode task per file, column-pruned
    at the pyarrow reader (only the requested columns leave disk)."""
    import glob

    paths = sorted(glob.glob(os.path.join(dir_path, "*.orc")))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {dir_path}")
    files = ray.data.from_items([{"path": p} for p in paths])

    def load(b: dict) -> pa.Table:
        from pyarrow import orc

        tabs = [orc.read_table(p, columns=columns) for p in b["path"]]
        return pa.concat_tables(tabs)

    return files.map_batches(load, batch_size=1, batch_format="numpy")
