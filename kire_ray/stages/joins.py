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
  shuffle join, Ray 2.49).
- ``salted_hash_join`` — hash join with skew mitigation: hot keys
  (found by ``detect_hot_keys``' bounded per-block top-k scan, or
  supplied by the caller) fan out over ``n_salts`` reducers via
  ``salt_column`` on the probe side + build-side replication. Wired
  into the ``_dim_join`` hash path (``relational.py``) behind
  ``salt_hot=True``.
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


def detect_hot_keys(
    ds: "ray.data.Dataset", key: str, *, top: int = 16, frac: float = 0.05
) -> frozenset:
    """Heavy-hitter scan for join-skew mitigation: per-block top-``top``
    value counts (bounded partials — ≤top+1 rows per block) folded on
    the driver; keys holding more than ``frac`` of total rows are hot.
    Per-block top-k undercounts evenly-spread keys, but a key with a
    ≥frac global share lands in nearly every block's top-k, so true
    hot keys are found; the result feeds ``salted_hash_join``."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[key].astype(str).value_counts().head(top)
        return pd.DataFrame(
            {
                "k": list(vc.index) + ["\x00total"],
                "c": list(vc.to_numpy(np.int64)) + [np.int64(len(b))],
            }
        )

    partials = ds.map_batches(part, batch_format="pandas").to_pandas()
    if partials.empty or "k" not in partials.columns:
        # zero blocks → no partial rows (and possibly no columns) at all
        return frozenset()
    agg = partials.groupby("k")["c"].sum()
    if "\x00total" not in agg.index:
        return frozenset()
    total = int(agg.pop("\x00total"))
    if total == 0:
        return frozenset()
    return frozenset(agg.index[agg.to_numpy() > frac * total])


def salted_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    *,
    hot_keys,
    n_salts: int = 8,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Skew-mitigated hash join (single key): the left (fact/probe)
    side spreads hot keys over ``n_salts`` salted sub-keys
    (``salt_column``), the right (build) side replicates its hot-key
    rows n_salts× so every salted probe row still finds its match —
    the reference's analogue is the batch-size-conditional escape
    hatches (kg_data_loader.py:76-95); here one giant join key fans
    out over n_salts reducers instead of hot-spotting one. Cold keys
    keep salt 0 on both sides: one replica, no overhead.

    Only ``inner`` / ``left_outer`` are sound: the build side is
    replicated n_salts× for hot keys, so any join type that emits
    UNMATCHED build rows (right_outer / full_outer) would emit each
    unmatched hot build row n_salts times — guarded, not silently
    wrong."""
    assert len(on) == 1, "salted_hash_join handles a single join key"
    assert join_type in ("inner", "left_outer"), (
        "salted_hash_join replicates the build side for hot keys; "
        f"join_type={join_type!r} would duplicate unmatched build rows "
        "— use hash_join or dedup unmatched rows first"
    )
    key = on[0]
    sk = f"{key}_salted"
    left_s = salt_column(left, key, hot_keys, n_salts)
    hot_ref = ray.put(frozenset(str(k) for k in hot_keys))

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        k = b[key].astype(str)
        is_hot = k.isin(hot).to_numpy()
        cold = b[~is_hot].copy()
        cold[sk] = k[~is_hot] + "#0"
        outs = [cold]
        h = b[is_hot]
        hk = k[is_hot]
        for j in range(n_salts):
            rep = h.copy()
            rep[sk] = hk + f"#{j}"
            outs.append(rep)
        return pd.concat(outs, ignore_index=True).drop(columns=[key])

    right_s = right.map_batches(replicate, batch_format="pandas")
    out = hash_join(
        left_s, right_s, on=[sk], join_type=join_type, num_partitions=num_partitions
    )
    return out.map_batches(lambda b: b.drop(columns=[sk]), batch_format="pandas")


BLOOM_M = 1 << 16   # bits (8 KiB bitmap)
BLOOM_K = 4         # hash functions


def _bloom_positions(prefix: str, keys) -> "np.ndarray":
    """md5-derived bit positions (same idiom as the sketch/LSH family)
    so Bloom membership is reconstructible exactly in DuckDB SQL."""
    import hashlib

    import numpy as np

    return np.fromiter(
        (
            int(hashlib.md5(f"{prefix}_{k}".encode("utf-8")).hexdigest()[:15], 16)
            % BLOOM_M
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def build_bloom(build: "ray.data.Dataset", on: str) -> "np.ndarray":
    """Distributed Bloom-filter build: each block reduces its keys to
    an 8 KiB bitmap; the driver ORs O(blocks) bitmaps — constant-size
    partials, never the key set. The filter (m/8 bytes) is what gets
    broadcast to probe tasks instead of the full build key set: the
    100 TB point of a Bloom semi-join."""
    import numpy as np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = pd.unique(b[on])
        bm = np.zeros(BLOOM_M // 8, dtype=np.uint8)
        for j in range(BLOOM_K):
            pos = _bloom_positions(str(j), keys)
            np.bitwise_or.at(bm, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({"bm": [bm.tobytes()]})

    parts = build.map_batches(partial, batch_format="pandas").to_pandas()
    out = np.zeros(BLOOM_M // 8, dtype=np.uint8)
    for raw in parts["bm"]:
        out |= np.frombuffer(raw, dtype=np.uint8)
    return out


def bloom_semi_join(
    probe: "ray.data.Dataset", bloom: "np.ndarray", on: str
) -> "ray.data.Dataset":
    """Keep probe rows whose key is (possibly) in the Bloom filter —
    over-approximate by design (false-positive rate ≈ (1-e^{-kn/m})^k);
    compose with an exact join downstream when exactness matters. The
    8 KiB filter rides ``ray.put`` once; each batch tests its distinct
    keys vectorized."""
    import numpy as np

    ref = ray.put(bloom)

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        bm = ray.get(ref)
        keys = pd.unique(b[on])
        ok = np.ones(len(keys), dtype=bool)
        for j in range(BLOOM_K):
            pos = _bloom_positions(str(j), keys)
            ok &= (((bm[pos // 8].astype(np.int64)) >> (pos % 8)) & 1).astype(bool)
        passing = set(keys[ok])
        return b[b[on].isin(passing)]

    return probe.map_batches(filt, batch_format="pandas")


def normalize_blocks(
    ds: "ray.data.Dataset", *, max_blocks: int | None = None
) -> tuple["ray.data.Dataset | None", int]:
    """Materialize ``ds`` and merge away schema-less empty blocks.

    Ray 2.49's grouped exchanges and hash joins emit SCHEMA-LESS empty
    blocks for empty partitions, and a downstream Arrow hash join
    aborts on them ("No match … for FieldRef"). Repartitioning to at
    most row-count blocks guarantees every block is non-empty (typed).
    Returns (dataset, row_count); dataset is None when empty — callers
    short-circuit with their own typed empty result.
    """
    from kire_ray.stages.shuffle import default_partitions

    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        return None, 0
    P = max_blocks or default_partitions()
    return ds.repartition(max(1, min(P, n // 4096 + 1))).materialize(), n
