"""Join strategies, chosen by side size — the engine's join policy.

The reference implements every join as a Python dict/set over a full
in-memory scan (SURVEY.md §2.4): alias lookup (gen_kg_data.py:76-90),
one-hop semi-join (:370-386), fact-set membership (evaluation.py:44-67).
At 100 TB those become:

- ``broadcast_join`` — dimension-sized right side: ``ray.put`` once,
  pandas merge per batch inside ``map_batches``. No shuffle. This is
  the default for alias/KG/vocab tables.
- ``semi_join_broadcast`` / ``anti_join_broadcast`` — broadcast key-set
  membership filter (the reference's set lookups, e.g. train-fact Ign
  filter).
- ``hash_join`` — both sides large: ``Dataset.join`` (hash-partitioned
  shuffle join, Ray 2.49). Skewed keys should be salted *before*
  calling (``salt_column``).
- ``salt_column`` — append ``key_salted = key + '#' + hash(row) % k``
  for hot keys, so one giant key fans out over k reducers; the small
  side is replicated k× for those keys by the caller.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

import ray
import ray.data

from kire_ray.functions.hashing import hash64_fast


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pd.DataFrame,
    on: list[str],
    how: str = "left",
    **merge_kwargs,
) -> "ray.data.Dataset":
    ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how, **merge_kwargs)

    return ds.map_batches(merge, batch_format="pandas")


def semi_join_broadcast(
    ds: "ray.data.Dataset", keys: Iterable, on: str
) -> "ray.data.Dataset":
    ref = ray.put(frozenset(keys))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return batch[batch[on].isin(ks)]

    return ds.map_batches(filt, batch_format="pandas")


def anti_join_broadcast(
    ds: "ray.data.Dataset", keys: Iterable, on: str
) -> "ray.data.Dataset":
    ref = ray.put(frozenset(keys))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return batch[~batch[on].isin(ks)]

    return ds.map_batches(filt, batch_format="pandas")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    *,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Large⋈large: Ray's hash-partitioned shuffle join. Partition
    count follows the cluster by default (half a partition per CPU —
    see shuffle.default_join_partitions); at 100 TB pass one derived
    from input bytes / target partition."""
    from kire_ray.stages.shuffle import default_join_partitions

    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or default_join_partitions(),
        on=tuple(on),
        validate_schemas=False,
    )


def salt_column(
    ds: "ray.data.Dataset", key: str, hot_keys: Iterable, n_salts: int = 8
) -> "ray.data.Dataset":
    """Append ``{key}_salted``: hot keys are spread across n_salts
    sub-keys (deterministic per-row), cold keys keep salt 0."""
    hot_ref = ray.put(frozenset(hot_keys))

    def salt(batch: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        k = batch[key].astype(str)
        row_h = hash64_fast((k + "#" + np.arange(len(k)).astype(str)).to_numpy())
        salts = np.where(k.isin(hot).to_numpy(), row_h % n_salts, 0)
        batch[f"{key}_salted"] = k + "#" + pd.Series(salts, index=batch.index).astype(str)
        return batch

    return ds.map_batches(salt, batch_format="pandas")
