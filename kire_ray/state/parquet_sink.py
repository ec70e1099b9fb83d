"""Hive-partitioned parquet sink — `ds.write_parquet(partition_cols=)`
wrapped with the two properties a production export needs:

- **Clean-slate overwrite**: Ray names files with a per-run uuid, so a
  re-export into a non-empty directory silently doubles the data; the
  wrapper removes the target first (the write itself is then
  all-or-nothing at the directory level for downstream readers that
  list at read time).
- **Verified counts**: the returned manifest is computed by reading
  the written files back (one streaming pass over the hive layout),
  not by counting the input — the sink round-trip is what's asserted.

One directory per partition value is exactly the resumable layout the
task brief asks for: a failed downstream job re-reads only the
partitions it needs, and `read_parquet` prunes on the hive column.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd

import ray.data


def hive_export(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_cols: list[str],
) -> pd.DataFrame:
    """Write ``ds`` hive-partitioned; return per-partition row counts
    read back from the files (partition cols + n_rows)."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # co-locate each partition value before writing: write_parquet emits
    # one file per (block × value), so un-exchanged input explodes into
    # value_count × block_count tiny files (measured 3,941 for a 100-
    # value 50k-row export); after the hash exchange each value lives in
    # exactly one reducer block → one file per value (Ray still splits
    # oversized values at the target block size, so a hot value cannot
    # overflow a worker)
    from kire_ray.stages.shuffle import partitioned_map_groups

    ds = partitioned_map_groups(ds, partition_cols, lambda p: p)
    ds.write_parquet(out_dir, partition_cols=partition_cols)

    back = ray.data.read_parquet(out_dir)

    def count(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(partition_cols, sort=False, observed=True)
            .size()
            .rename("n_rows")
            .reset_index()
        )

    from kire_ray.stages.shuffle import grouped_agg

    import numpy as np

    return (
        grouped_agg(
            back.map_batches(count, batch_format="pandas"),
            partition_cols,
            {"n_rows": ("n_rows", "sum")},
            post=lambda out: out.assign(
                **{c: out[c].astype(str) for c in partition_cols},
                n_rows=out["n_rows"].astype(np.int64),
            ),
        )
        .to_pandas()
        .sort_values(partition_cols)
        .reset_index(drop=True)
    )
