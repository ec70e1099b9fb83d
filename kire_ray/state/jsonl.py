"""Sharded JSONL corpus sink/source — the delivery format LLM training
stacks consume (one gzipped JSONL file per shard).

Design for 100 TB:

- **Content-addressed sharding**: shard = md5(id) % n_shards (the
  same persisted-hash contract as ``sampling.training_shuffle``), so
  the shard a document lands in is stable across runs, engines and
  cluster sizes — re-exports are byte-identical and downstream caches
  stay valid.
- **One exchange, whole shards per reducer**: rows are hash-exchanged
  on the shard id and each reducer WRITES its shards itself (the file
  write is the reduce), so no post-shuffle collect exists anywhere.
- **Deterministic bytes**: rows are ordered inside a shard by
  (md5 hex, id), json is dumped with sorted keys and no whitespace,
  and the gzip header is written with mtime=0 — two runs produce
  bit-identical shards (asserted in tests).
- **Atomic + resumable**: each shard writes to ``<name>.tmp`` then
  ``os.replace``s into place; a re-run skips shards whose final file
  already exists, so a killed export resumes for free.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os

import numpy as np
import pandas as pd

import ray.data

from kire_ray.stages.shuffle import partitioned_map_groups


def export_jsonl_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Write ``ds`` as ``out_dir/shard-{i:05d}.jsonl.gz``; returns the
    manifest (shard, n_rows, n_bytes, path) as a small DataFrame.
    Consumes the Dataset distributed; only the manifest reaches the
    driver."""
    os.makedirs(out_dir, exist_ok=True)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = [
            hashlib.md5(str(i).encode("utf-8")).hexdigest()
            for i in b[id_col].to_numpy()
        ]
        b = b.copy()
        b["__h"] = h
        b["__shard"] = np.array(
            [int(x[:8], 16) % n_shards for x in h], dtype=np.int64
        )
        return b

    def write_shards(p: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, g in p.groupby("__shard", sort=True):
            name = f"shard-{int(shard):05d}.jsonl.gz"
            path = os.path.join(out_dir, name)
            g = g.sort_values(["__h", id_col], kind="mergesort").drop(
                columns=["__h", "__shard"]
            )
            if not os.path.exists(path):  # resume: finished shards skipped
                tmp = path + ".tmp"
                with open(tmp, "wb") as raw, gzip.GzipFile(
                    fileobj=raw, mode="wb", mtime=0
                ) as z:
                    for rec in g.to_dict(orient="records"):
                        z.write(
                            json.dumps(
                                rec, sort_keys=True, separators=(",", ":")
                            ).encode("utf-8")
                        )
                        z.write(b"\n")
                os.replace(tmp, path)
            out.append(
                {
                    "shard": int(shard),
                    "n_rows": len(g),
                    "n_bytes": os.path.getsize(path),
                    "path": path,
                }
            )
        return pd.DataFrame(out)

    manifest = partitioned_map_groups(
        ds.map_batches(assign, batch_format="pandas"), ["__shard"], write_shards
    ).to_pandas()
    return manifest.sort_values("shard").reset_index(drop=True)


def read_jsonl_shards(out_dir: str) -> "ray.data.Dataset":
    """Read an ``export_jsonl_shards`` directory back as a Dataset —
    one read task per shard file (Ray's JSON reader handles the .gz
    transparently via Arrow)."""
    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".jsonl.gz")
    )
    return ray.data.read_json(paths, arrow_open_stream_args={"compression": "gzip"})
