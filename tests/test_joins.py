"""Join-policy tests (stages/joins.py): broadcast/semi/anti/hash joins
against pandas ground truth, and hot-key salting."""

import numpy as np
import pandas as pd

import ray.data

from kire_ray.stages.joins import (
    anti_join_broadcast,
    broadcast_join,
    hash_join,
    salt_column,
    semi_join_broadcast,
)


def _facts(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, 50, n),
            "v": rng.random(n),
        }
    )


def test_broadcast_join_matches_pandas(ray_session):
    df = _facts()
    dim = pd.DataFrame({"k": np.arange(0, 40), "name": [f"n{i}" for i in range(40)]})
    out = (
        broadcast_join(ray.data.from_pandas(df).repartition(7), dim, on=["k"], how="inner")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = df.merge(dim, on=["k"], how="inner").sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


def test_semi_and_anti_join(ray_session):
    df = _facts()
    keys = {1, 2, 3, 44, 49}
    ds = ray.data.from_pandas(df).repartition(5)
    semi = semi_join_broadcast(ds, keys, on="k").to_pandas()
    anti = anti_join_broadcast(ds, keys, on="k").to_pandas()
    assert set(semi["k"]).issubset(keys)
    assert set(anti["k"]).isdisjoint(keys)
    assert len(semi) + len(anti) == len(df)


def test_hash_join_matches_pandas(ray_session):
    left = _facts(1500, seed=1)
    right = pd.DataFrame({"k": np.arange(0, 50), "w": np.arange(0, 50) * 1.5})
    out = (
        hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            on=["k"],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = left.merge(right, on=["k"], how="inner").sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[sorted(out.columns)], ref[sorted(ref.columns)])


def test_salt_column_spreads_hot_key(ray_session):
    n = 4000
    df = pd.DataFrame({"k": ["hot"] * (n - 100) + [f"cold{i}" for i in range(100)]})
    out = salt_column(ray.data.from_pandas(df).repartition(4), "k", {"hot"}, n_salts=8).to_pandas()
    hot = out[out["k"] == "hot"]["k_salted"]
    assert hot.nunique() == 8, "hot key fans out over all salts"
    # deterministic: same input → same salted keys
    out2 = salt_column(ray.data.from_pandas(df).repartition(4), "k", {"hot"}, n_salts=8).to_pandas()
    assert (out["k_salted"].sort_values().to_numpy() == out2["k_salted"].sort_values().to_numpy()).all()
    cold = out[out["k"] != "hot"]["k_salted"]
    assert (cold.str.endswith("#0")).all(), "cold keys keep salt 0"


def test_bloom_semi_join_no_false_negatives(ray_session):
    import ray.data
    from kire_ray.stages.joins import BLOOM_M, bloom_semi_join, build_bloom

    rng = np.random.default_rng(13)
    build_keys = rng.choice(100_000, 500, replace=False)
    build = ray.data.from_pandas(pd.DataFrame({"k": build_keys})).repartition(4)
    bloom = build_bloom(build, "k")
    assert bloom.nbytes == BLOOM_M // 8

    probe_keys = np.concatenate([build_keys[:200], rng.choice(100_000, 2000)])
    probe = ray.data.from_pandas(pd.DataFrame({"k": probe_keys})).repartition(6)
    passed = bloom_semi_join(probe, bloom, "k").to_pandas()["k"].to_numpy()

    # Bloom filters never drop a true member...
    truth = set(build_keys)
    assert truth.issuperset(set()) and set(
        k for k in probe_keys if k in truth
    ) <= set(passed)
    # ...and at n=500 / m=65536 / k=4 the FP rate is ~1e-6: nothing
    # outside the build set should slip through at this size
    fp = [k for k in passed if k not in truth]
    assert len(fp) <= 2


def test_detect_hot_keys_empty_input(ray_session):
    """ADVICE r4: zero-batch/empty fact side returns frozenset(), not
    KeyError on the sentinel pop."""
    from kire_ray.stages.joins import detect_hot_keys

    empty = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series([], dtype=object)})
    )
    assert detect_hot_keys(empty, "k") == frozenset()
    # filter-to-empty also yields no partial rows per block
    filtered = ray.data.from_pandas(_facts(100)).filter(lambda r: False)
    assert detect_hot_keys(filtered, "k") == frozenset()


def test_salted_join_rejects_outer_types(ray_session):
    """ADVICE r4: right/full outer would emit unmatched hot build rows
    n_salts times — the guard refuses instead of answering wrong."""
    import pytest

    from kire_ray.stages.joins import salted_hash_join

    left = ray.data.from_pandas(_facts(50))
    right = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(5), "name": list("abcde")})
    )
    for jt in ("right_outer", "full_outer"):
        with pytest.raises(AssertionError):
            salted_hash_join(left, right, ["k"], hot_keys={"1"}, join_type=jt)
