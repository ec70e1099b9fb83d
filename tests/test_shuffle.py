"""Unit tests for the hash-partitioned grouped exchange
(kire_ray/stages/shuffle.py) — the engine's core wide-op primitive."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups


@pytest.fixture()
def kv_ds():
    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 400, n).astype(str),
            "k2": rng.integers(0, 3, n),
            "v": rng.random(n),
        }
    )
    return df, ray.data.from_pandas(df).repartition(13)


def test_grouped_agg_matches_pandas(kv_ds):
    df, ds = kv_ds
    out = (
        grouped_agg(ds, ["k1", "k2"], {"s": ("v", "sum"), "n": ("v", "size"), "mx": ("v", "max")})
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    ref = (
        df.groupby(["k1", "k2"], sort=False)
        .agg(s=("v", "sum"), n=("v", "size"), mx=("v", "max"))
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref, check_dtype=False, check_exact=False, rtol=1e-12)


def test_partitioned_map_groups_key_integrity(kv_ds):
    """Every key lands in exactly one partition call; nothing dropped."""
    df, ds = kv_ds

    def fn(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("k1", sort=False).size().rename("n").reset_index()
        g["part_rows"] = len(part)
        return g

    out = partitioned_map_groups(ds, ["k1"], fn, num_partitions=7).to_pandas()
    assert len(out) == df["k1"].nunique(), "each key reduced exactly once"
    ref = df.groupby("k1").size()
    got = out.set_index("k1")["n"]
    assert (got.sort_index() == ref.sort_index()).all()
    # ≤ P distinct partition sizes, and each key's partition holds at
    # least that key's rows
    assert out["part_rows"].nunique() <= 7
    assert (out["part_rows"] >= out["n"]).all()


def test_partition_count_one_and_many(kv_ds):
    df, ds = kv_ds
    for P in (1, 64):
        out = grouped_agg(ds, ["k1"], {"n": ("v", "size")}, num_partitions=P).to_pandas()
        assert len(out) == df["k1"].nunique()
        assert out["n"].sum() == len(df)


def test_hash64_fast_properties():
    """hash64_fast: batch-padding invariance (a string must hash the
    same regardless of the longest string sharing its batch — a plain
    FNV over the fixed-width matrix violated this), determinism,
    distribution, and the wide-string blake2b fallback."""
    import numpy as np

    from kire_ray.functions.hashing import hash64, hash64_fast

    a = hash64_fast(["Q42"])
    b = hash64_fast(["Q42", "x" * 200])
    c = hash64_fast(np.array(["Q42", "longer-neighbor", "third"], dtype=object))
    assert a[0] == b[0] == c[0]
    # determinism across calls
    vals = [f"k{i}" for i in range(10_000)]
    h1, h2 = hash64_fast(vals), hash64_fast(list(vals))
    assert (h1 == h2).all()
    # injective-enough + uniform pid spread on distinct keys
    assert len(np.unique(h1)) == len(vals)
    counts = np.bincount((h1 % 32).astype(int), minlength=32)
    assert counts.min() > 0.7 * counts.mean()
    # >256-char strings take the blake2b fallback: equal to hash64
    wide = ["y" * 300, "z" * 400]
    assert (hash64_fast(wide) == hash64(wide)).all()
    # bytes ('S') dtype path works
    assert hash64_fast([b"abc"]).shape == (1,)
