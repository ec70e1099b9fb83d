"""Sharded Feather V2 (Arrow IPC file) sink/source.

Ray 2.49 ships no ``read_feather`` / ``write_feather``; pyarrow does,
so the engine provides the format the same way its ORC module does
(``sources/orc.py``): the WRITE is a per-block ``map_batches`` emitting
one content-named ``.feather`` file per non-empty block (idempotent
across re-runs — the name is the md5 of the encoded payload, so a
retried task overwrites its own file rather than duplicating rows),
and the READ is a file-per-task distributed decode, column-pruned at
the pyarrow reader.

Feather V2 IS the Arrow IPC file format — the natural interchange
format for an Arrow-native engine (zero-copy mmap reads, exact Arrow
types round-trip, no parquet re-encode).  Compression stays off so the
payload bytes are a pure function of the data (content-named shards
must be deterministic) and so readers can memory-map.

At 100 TB this is the standard file-granular layout: block size
controls file size, reads parallelize per file, and a partial write is
re-runnable because names are content-derived.
"""
from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray.data


def write_feather_sharded(ds: "ray.data.Dataset", out_dir: str) -> pd.DataFrame:
    """Write every non-empty block as ``<md5(payload)>.feather`` under
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

    from pyarrow import feather

    os.makedirs(out_dir, exist_ok=True)

    def dump(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        feather.write_feather(tab, sink, compression="uncompressed")
        payload = sink.getvalue().to_pybytes()
        name = hashlib.md5(payload).hexdigest()[:20]
        path = os.path.join(out_dir, f"{name}.feather")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"path": [path], "rows": [tab.num_rows]})

    return ds.map_batches(dump, batch_format="pyarrow", batch_size=None).to_pandas()


def read_feather(dir_path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Distributed Feather read: one decode task per file, column-pruned
    at the pyarrow reader (IPC reads project columns without decoding
    the rest — with uncompressed shards this is an mmap + slice)."""
    import glob

    paths = sorted(glob.glob(os.path.join(dir_path, "*.feather")))
    if not paths:
        raise FileNotFoundError(f"no .feather files under {dir_path}")
    files = ray.data.from_items([{"path": p} for p in paths])

    def load(b: dict) -> pa.Table:
        from pyarrow import feather

        tabs = [feather.read_table(p, columns=columns) for p in b["path"]]
        return pa.concat_tables(tabs)

    return files.map_batches(load, batch_size=1, batch_format="numpy")
