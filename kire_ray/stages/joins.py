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
    # the join runs on the NATIVE key column plus a small int salt —
    # not on a stringified composite — so key-equality semantics are
    # identical to the plain hash_join this substitutes for (review r5
    # finding: a stringified key silently changes int-vs-float matches
    # when the size threshold flips strategies)
    sk = "\x00__salt"
    hot_ref = ray.put(frozenset(str(k) for k in hot_keys))

    def salt_probe(b: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        b = b.copy()
        k = b[key].astype(str)
        row_h = hash64_fast((k + "#" + np.arange(len(k)).astype(str)).to_numpy())
        b[sk] = np.where(k.isin(hot).to_numpy(), row_h % n_salts, 0).astype(
            np.int64
        )
        return b

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        is_hot = b[key].astype(str).isin(hot).to_numpy()
        cold = b[~is_hot].copy()
        cold[sk] = np.int64(0)
        outs = [cold]
        h = b[is_hot]
        for j in range(n_salts):
            rep = h.copy()
            rep[sk] = np.int64(j)
            outs.append(rep)
        return pd.concat(outs, ignore_index=True)

    out = hash_join(
        left.map_batches(salt_probe, batch_format="pandas"),
        right.map_batches(replicate, batch_format="pandas"),
        on=[key, sk],
        join_type=join_type,
        num_partitions=num_partitions,
    )
    return out.map_batches(lambda b: b.drop(columns=[sk]), batch_format="pandas")


def frag_replicate_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    *,
    n_salts: int = 8,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Fragment-replicate (skew-OBLIVIOUS) hash join: every probe row
    salts by a deterministic row hash % ``n_salts`` — no hot-key
    knowledge needed, so there is NO separate heavy-hitter scan of the
    fact side (VERDICT r4 #3: ``detect_hot_keys`` cost one extra full
    pass) — and the build side replicates ALL its rows n_salts×.
    Any key's probe rows, hot or not, spread over n_salts reducers.

    Economics: probe pays one pass (the salt map fuses into the join's
    input), build pays n_salts× through the exchange — the right trade
    exactly when build ≪ probe (a dimension just above the broadcast
    limit under a skewed fact side). For build sides too big to
    replicate, ``salted_hash_join`` + ``detect_hot_keys`` remains the
    targeted path. Same soundness guard as the salted join:
    inner/left_outer only (unmatched build rows would emit n_salts×).
    """
    assert len(on) == 1, "frag_replicate_join handles a single join key"
    assert join_type in ("inner", "left_outer"), (
        "frag_replicate_join replicates the build side; "
        f"join_type={join_type!r} would duplicate unmatched build rows"
    )
    key = on[0]
    # native [key, salt] join — same key-equality semantics as the
    # plain hash_join this substitutes for (see salted_hash_join note)
    sk = "\x00__salt"

    def salt_probe(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        k = b[key].astype(str)
        row_h = hash64_fast((k + "#" + np.arange(len(k)).astype(str)).to_numpy())
        b[sk] = (row_h % n_salts).astype(np.int64)
        return b

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for j in range(n_salts):
            rep = b.copy()
            rep[sk] = np.int64(j)
            outs.append(rep)
        return pd.concat(outs, ignore_index=True)

    out = hash_join(
        left.map_batches(salt_probe, batch_format="pandas"),
        right.map_batches(replicate, batch_format="pandas"),
        on=[key, sk],
        join_type=join_type,
        num_partitions=num_partitions,
    )
    return out.map_batches(lambda b: b.drop(columns=[sk]), batch_format="pandas")


def mark_membership(
    ds: "ray.data.Dataset",
    keys: "pd.DataFrame | ray.data.Dataset",
    on: list[str],
    out_col: str,
    *,
    broadcast_limit: int = 2_000_000,
    keys_nrows: int | None = None,
    keys_distinct: bool = False,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Append boolean ``out_col``: does the row's ``on`` tuple appear in
    ``keys``? The reference's set-membership shape (gold/train-fact
    lookups, evaluation.py:44-67) with the engine's standard
    size-thresholded switch:

    - under ``broadcast_limit`` key rows: the distinct keys ride ONE
      ``ray.put`` as a frozenset of canonical ``\\x1f``-joined strings;
      each batch marks vectorized via ``isin`` — no shuffle;
    - above it: the keys become a globally-distinct tagged table
      (block-local dedup combiner → one key-hash exchange) and
      membership is ONE left-outer hash exchange on the tuple —
      nothing corpus-scaling ever lands on the driver (the gold set
      grows with document count, so at 100 TB the broadcast is not
      dimension-sized; VERDICT r4 #1).

    ``keys_nrows``: optional row-count hint (parquet metadata) so an
    unmaterialized keys Dataset isn't ``count()``ed into a double
    execution. ``keys_distinct=True`` skips the global key dedup when
    the caller guarantees distinct key tuples (saves one exchange).
    Both paths are bit-equal up to row order
    (test_mark_membership_paths_equal); set ``broadcast_limit=0`` to
    force the exchange path.
    """
    import ray.data as rd

    from kire_ray.stages.shuffle import partitioned_map_groups

    if isinstance(keys, pd.DataFrame):
        n_keys = len(keys)
    elif keys_nrows is not None:
        n_keys = keys_nrows
    else:
        # same single-execution discipline as connected_components'
        # gate: the count would run the keys DAG once and the
        # broadcast's to_pandas() would run it again
        keys = keys.materialize()
        n_keys = keys.count()

    def canon(b: pd.DataFrame) -> pd.Series:
        # LENGTH-PREFIXED concatenation, not plain '\x1f' joining: a
        # separator byte inside a key value would let distinct tuples
        # collide (('x\x1fy','z') vs ('x','y\x1fz') — review r5); the
        # length prefix delimits fields unambiguously for any content
        s = None
        for c in on:
            v = b[c].astype(str)
            part = v.str.len().astype(str) + ":" + v
            s = part if s is None else s + "\x1f" + part
        return s

    if n_keys == 0:
        # empty key set: every row is a non-member on both paths — the
        # exchange would otherwise ship a zero-block tagged side whose
        # schema the join can't resolve
        return ds.map_batches(
            lambda b: b.assign(**{out_col: False}), batch_format="pandas"
        )

    if broadcast_limit and n_keys <= broadcast_limit:
        key_df = keys if isinstance(keys, pd.DataFrame) else keys.to_pandas()
        ref = ray.put(frozenset(canon(key_df)))

        def mark(b: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(ref)
            b = b.copy()
            b[out_col] = canon(b).isin(ks)
            return b

        return ds.map_batches(mark, batch_format="pandas")

    # the exchange path joins on the SAME canonical string the
    # broadcast path hashes, so the two paths agree for ANY key dtypes
    # (a native-value join would match int 5 to float 5.0 where the
    # broadcast isin would not — review r5 finding)
    keys_ds = keys if not isinstance(keys, pd.DataFrame) else rd.from_pandas(keys)
    tag = "\x00__member"
    ckey = "\x00__canon"

    def key_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({ckey: canon(b).drop_duplicates()})

    if keys_distinct:
        tagged = keys_ds.map_batches(
            lambda b: key_rows(b).assign(**{tag: np.int8(1)}),
            batch_format="pandas",
        )
    else:
        # block-local dedup combiner, then a per-key-partition global
        # dedup: duplicate key rows MUST collapse to one before the
        # left-outer join or probe rows would multiply
        tagged = partitioned_map_groups(
            keys_ds.map_batches(key_rows, batch_format="pandas"),
            [ckey],
            lambda part: part.drop_duplicates().assign(**{tag: np.int8(1)}),
            num_partitions=num_partitions,
        )
    probe = ds.map_batches(
        lambda b: b.assign(**{ckey: canon(b)}), batch_format="pandas"
    )
    joined = hash_join(
        probe, tagged, on=[ckey], join_type="left_outer",
        num_partitions=num_partitions,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = b[tag].notna()
        return b.drop(columns=[tag, ckey])

    return joined.map_batches(finish, batch_format="pandas")


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
