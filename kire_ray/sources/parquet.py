"""Size-aware parquet reads.

Ray Data's default read parallelism is CPU-derived (≈ 2 blocks per
CPU), which is right for big inputs but over-splits the small end: a
600k-row table on 32 CPUs becomes 64 blocks of ~10k rows, and every
downstream stage then schedules 64+ near-empty tasks whose launch
latency dominates wall time (measured on TPC-H q4 at sf0.1: 4.9 s at
the default 64 read blocks vs 1.3 s at 8 — the pipeline was ~95% idle).

``sized_read`` overrides the block count ONLY downward: the target is
row-count-derived (``rows // rows_per_block + 1``), and when that
meets or exceeds Ray's own CPU-derived default the override is left
unset so large inputs keep Ray's byte-based splitting. At 100 TB the
override therefore never engages; on driver/test scales it removes
pure scheduling overhead.

``rows_per_block`` is per-call because rows are a proxy for COMPUTE,
and compute per row varies by orders of magnitude: vectorized numeric
kernels (TPC-H columns) want ~64k rows per block, while regex/token
text stages over the documents table want a few hundred so the heavy
stage still fans out across the cluster.
"""
from __future__ import annotations

import ray.data


def _nrows(path: str) -> int:
    import pyarrow.dataset as pads

    return pads.dataset(path).count_rows()  # metadata only, no data read


def sized_read(
    path: str,
    columns=None,
    *,
    rows_per_block: int = 65536,
    min_blocks: int = 2,
) -> "ray.data.Dataset":
    from kire_ray.stages.shuffle import cluster_cpus

    default = 2 * cluster_cpus()
    target = _nrows(path) // rows_per_block + 1
    if target < default:
        return ray.data.read_parquet(
            path, columns=columns, override_num_blocks=max(min_blocks, target)
        )
    return ray.data.read_parquet(path, columns=columns)
