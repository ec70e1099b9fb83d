"""Hash-partitioned group processing — the engine's core shuffle shape.

``Dataset.groupby(keys).map_groups(fn)`` sorts the whole stream by the
key and then invokes ``fn`` once per distinct key.  With millions of
tiny groups (one conversation, one (s,p,o) triple) the per-group
overhead — a pandas DataFrame construction per group plus the sort on a
high-cardinality key — dominates wall time and *degrades* as
parallelism rises (measured on the flagship assembly at sf0.1:
19s at 32 CPUs vs 3.8s with this pattern).

``partitioned_map_groups`` instead shuffles on a *low-cardinality*
partition id (``hash64(keys) % P``) and hands each partition — all of
its groups at once — to a vectorized partition function:

    segments → map_batches(+pid) → groupby(pid) → fn(whole partition)

The partition fn does the per-group work with one pandas
``groupby(keys)`` (C-speed) instead of P map_groups invocations.  This
is exactly the hash-exchange every distributed SQL engine uses for
grouped aggregation; P is the reducer count:

- P defaults to 2× cluster CPUs (one wave of reducers with headroom);
- at 100 TB, P must scale with data so one partition fits a worker's
  heap: P ≈ input_bytes / (target partition ≈ 256 MB);
- keys are uniform content hashes, so only *identical* keys colocate —
  a single hot key (a conversation with millions of turns) is bounded
  upstream by the block-local combiner + per-doc caps, not by salting,
  because grouping semantics need the whole key in one place.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

import ray
import ray.data

from kire_ray.functions.hashing import hash64_fast

PID_COL = "__pid"


def cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def default_partitions() -> int:
    return max(16, 2 * cluster_cpus())


def default_join_partitions() -> int:
    """Partition count for ``Dataset.join``: each partition reserves a
    hash-shuffle aggregator actor, and measured join wall time grows
    ~linearly with partition count at fixed data size (8.6s at 64 vs
    3.4s at 8 on a 600k-row join, 32 CPUs) — so track cluster size at
    half a partition per CPU, floor 8. At 100 TB derive instead from
    input bytes / target partition (~256 MB) so a partition fits a
    worker's heap."""
    return max(8, cluster_cpus() // 2)


def iteration_blocks(ds: "ray.data.Dataset", *, rows_per_block: int = 250_000):
    """Materialize ``ds`` at a block count sized for REPEATED passes
    (iterative algorithms run one execution per round, so per-task
    launch overhead multiplies by the round count): one block per
    ``rows_per_block`` rows, clamped to [cpus/2, default_partitions()].
    At 100 TB the row-count rule keeps the usual many-blocks layout;
    on small/medium graphs it stops a 10-round loop from paying 64
    task launches per round for kilobyte blocks."""
    m = ds.materialize()
    n = m.count()
    lo = max(4, cluster_cpus() // 2)
    target = min(default_partitions(), max(lo, n // rows_per_block + 1))
    return m.repartition(int(target)).materialize()


def partitioned_map_groups(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    partition_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Apply ``partition_fn`` to every hash partition of ``ds``.

    ``partition_fn`` receives ALL rows whose ``hash(keys) % P`` agree
    (the pid column already dropped) and must handle *multiple* groups
    vectorized — typically ``df.groupby(list(keys))``. Rows of one key
    are never split across partitions.

    Mechanics note (measured Aug 2026, Ray 2.49): this exchange rides
    ``groupby(pid).map_groups`` — a sort-based shuffle. The apparent
    alternative, ``repartition(P, keys=keys).map_batches(fn)`` under
    ``DataContext.shuffle_strategy = HASH_SHUFFLE``, measured EQUAL on
    a 255k-row exchange at 32 CPUs (2.49 s vs 2.50 s under the default
    strategy) — the 2× gap seen in a mixed-strategy session was the
    sort path degrading under the HASH strategy (6.2 s), not the hash
    path winning. No reason to swap backends; keeping the default.
    """
    P = num_partitions or default_partitions()
    keys = list(keys)

    def add_pid(b: pd.DataFrame) -> pd.DataFrame:
        if len(keys) == 1:
            sig = b[keys[0]].astype(str)
        else:
            sig = b[keys[0]].astype(str)
            for k in keys[1:]:
                sig = sig + "\x1f" + b[k].astype(str)
        b = b.copy()
        # pid is ephemeral (never persisted) → vectorized fast hash;
        # it sits on every exchanged row, the hottest hash in the engine
        b[PID_COL] = (hash64_fast(sig.to_numpy()) % P).astype(np.int64)
        return b

    def run_part(g: pd.DataFrame) -> pd.DataFrame:
        return partition_fn(g.drop(columns=[PID_COL]))

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby(PID_COL)
        .map_groups(run_part, batch_format="pandas")
    )


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    *,
    num_partitions: int | None = None,
    post: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> "ray.data.Dataset":
    """Distributed grouped aggregation: pandas-style ``agg_spec``
    ({out_col: (in_col, fn)}) applied per key, via one hash exchange.

    The caller is expected to have pre-aggregated inside map_batches
    (combiner) so the exchange moves one row per (key, block); this
    runs the *final* combine. ``post`` runs vectorized on each reduced
    partition (rounding, casts).
    """
    keys = list(keys)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, sort=False).agg(**agg_spec).reset_index()
        return post(out) if post is not None else out

    return partitioned_map_groups(ds, keys, final, num_partitions=num_partitions)
