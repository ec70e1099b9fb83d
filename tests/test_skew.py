"""Hot-key skew bound for the assembly exchange (SURVEY.md §4): a
pathological conv_id with ~1M turns must not ship unbounded data
through shuffle #1. The ``max_turns`` cap now runs as an exact
two-level top-k — per-block segment cap in the combiner, final cap in
the partition merge — so the exchange moves at most
``max_turns × touched_blocks`` turns of the hot conversation.
"""

import numpy as np
import pandas as pd
import pytest

import ray

from kire_ray.stages.assemble import (
    _combine_segments,
    _merge_partition,
    assemble_documents,
)


def _skewed_frame(n_hot: int, n_normal_convs: int = 50, seed: int = 3):
    rng = np.random.default_rng(seed)
    rows = [
        pd.DataFrame(
            {
                "conv_id": "hot",
                "turn_idx": np.arange(n_hot, dtype=np.int64),
                "role": "user",
                "text": [f"turn {i} words here" for i in range(n_hot)],
                "tool": None,
                "ts": pd.Timestamp("2026-01-01").value
                + np.arange(n_hot, dtype=np.int64) * 1000,
            }
        )
    ]
    for c in range(n_normal_convs):
        k = int(rng.integers(2, 8))
        rows.append(
            pd.DataFrame(
                {
                    "conv_id": f"c{c:04d}",
                    "turn_idx": np.arange(k, dtype=np.int64),
                    "role": "user",
                    "text": [f"c{c} t{i}" for i in range(k)],
                    "tool": None,
                    "ts": pd.Timestamp("2026-01-01").value + np.arange(k) * 1000,
                }
            )
        )
    df = pd.concat(rows, ignore_index=True)
    df["ts"] = pd.to_datetime(df["ts"])
    # interleave so the hot conv touches every block
    return df.sample(frac=1.0, random_state=7).reset_index(drop=True)


def test_combiner_caps_hot_conv_exchange(ray_session):
    """Exchange volume: with the cap, the hot conv contributes at most
    max_turns × blocks rows to the shuffle (vs all 50k without)."""
    df = _skewed_frame(50_000)
    cap = 64
    ds = ray.data.from_pandas(df).repartition(16)
    segments = ds.map_batches(
        lambda b: _combine_segments(b, max_turns=cap), batch_format="pandas"
    ).to_pandas()
    hot = segments[segments["conv_id"] == "hot"]
    # turn_idxs is a packed int32 buffer → 4 bytes per shipped turn
    shipped = int(hot["turn_idxs"].map(len).sum()) // 4
    assert shipped <= cap * 16, shipped
    assert shipped < 50_000 * 0.05  # ≥95% of the hot turns never shuffle


def test_two_level_cap_is_exact():
    """Combiner cap + merge cap == merge cap alone (the pre-cap path),
    including duplicate turn_idx tie-breaks by segment order."""
    rng = np.random.default_rng(11)
    frames = []
    for blk in range(6):
        n = 300
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": "dup",
                    # duplicated turn idxs across blocks — tie-break territory
                    "turn_idx": rng.integers(0, 40, size=n),
                    "role": "user",
                    "text": [f"b{blk} r{i}" for i in range(n)],
                    "tool": None,
                    "ts": pd.to_datetime(pd.Timestamp("2026-01-01")),
                }
            )
        )
    cap = 25
    seg_capped = pd.concat(
        [_combine_segments(f, max_turns=cap) for f in frames], ignore_index=True
    )
    seg_plain = pd.concat(
        [_combine_segments(f) for f in frames], ignore_index=True
    )
    out_two_level = _merge_partition(seg_capped, max_turns=cap)
    out_reference = _merge_partition(seg_plain, max_turns=cap)
    pd.testing.assert_frame_equal(
        out_two_level.reset_index(drop=True), out_reference.reset_index(drop=True)
    )


def test_assemble_capped_end_to_end(ray_session):
    """Full distributed assembly with the cap: the hot doc keeps its
    first max_turns turns in turn order; normal docs are untouched."""
    df = _skewed_frame(20_000, n_normal_convs=20)
    cap = 100
    out = (
        assemble_documents(ray.data.from_pandas(df).repartition(12), max_turns=cap)
        .to_pandas()
        .set_index("doc_id")
    )
    hot = out.loc["hot"]
    assert hot["n_turns"] == cap
    assert list(hot["turn_texts"]) == [f"turn {i} words here" for i in range(cap)]
    for c in range(20):
        doc = out.loc[f"c{c:04d}"]
        assert list(doc["turn_texts"]) == [
            f"c{c} t{i}" for i in range(doc["n_turns"])
        ]


def test_salted_hash_join_planted_hot_key(ray_session):
    """A key holding 80% of fact rows must (a) be found by the bounded
    heavy-hitter scan, (b) fan out over n_salts salted sub-keys so no
    reducer sees the whole hot key, and (c) produce exactly the plain
    hash-join result."""
    import ray as _ray

    from kire_ray.stages.joins import (
        detect_hot_keys,
        hash_join,
        salt_column,
        salted_hash_join,
    )

    n = 20_000
    keys = np.where(np.arange(n) % 5 < 4, "HOT", "k" + pd.Series(np.arange(n) % 97).astype(str))
    fact = pd.DataFrame({"k": keys.astype(object), "v": np.arange(n, dtype=np.int64)})
    dim = pd.DataFrame(
        {"k": ["HOT"] + [f"k{i}" for i in range(97)],
         "name": [f"name{i}" for i in range(98)]}
    )
    fact_ds = _ray.data.from_pandas(fact).repartition(8)
    dim_ds = _ray.data.from_pandas(dim).repartition(2)

    hot = detect_hot_keys(fact_ds, "k")
    assert hot == frozenset({"HOT"})

    # bounded reducer input: the hot key spreads over all 8 salts and
    # the biggest salted group is ~1/8 of the hot rows
    salted = salt_column(fact_ds, "k", hot, n_salts=8).to_pandas()
    hot_groups = salted[salted["k"] == "HOT"]["k_salted"].value_counts()
    assert len(hot_groups) == 8
    assert hot_groups.max() < 0.8 * n * 0.25  # ≤2× the 1/8 ideal share

    want = (
        hash_join(fact_ds, dim_ds, on=["k"])
        .to_pandas()
        .sort_values(["v"])
        .reset_index(drop=True)[["k", "v", "name"]]
    )
    got = (
        salted_hash_join(fact_ds, dim_ds, ["k"], hot_keys=hot)
        .to_pandas()
        .sort_values(["v"])
        .reset_index(drop=True)[["k", "v", "name"]]
    )
    pd.testing.assert_frame_equal(got, want)


def test_salted_hash_join_left_outer(ray_session):
    """left_outer through the salted path: unmatched left rows (hot or
    cold) survive exactly once with null right columns."""
    import ray as _ray

    from kire_ray.stages.joins import hash_join, salted_hash_join

    fact = pd.DataFrame(
        {
            "k": ["HOT"] * 40 + ["cold1", "cold2", "nomatch"] * 2,
            "v": np.arange(46, dtype=np.int64),
        }
    )
    dim = pd.DataFrame({"k": ["HOT", "cold1", "cold2"], "name": ["h", "c1", "c2"]})
    fds = _ray.data.from_pandas(fact).repartition(4)
    dds = _ray.data.from_pandas(dim)

    want = (
        hash_join(fds, dds, on=["k"], join_type="left_outer")
        .to_pandas()
        .sort_values(["v"])
        .reset_index(drop=True)[["k", "v", "name"]]
    )
    got = (
        salted_hash_join(
            fds, dds, ["k"], hot_keys={"HOT"}, n_salts=4, join_type="left_outer"
        )
        .to_pandas()
        .sort_values(["v"])
        .reset_index(drop=True)[["k", "v", "name"]]
    )
    pd.testing.assert_frame_equal(got, want)


def test_hash64_fast_bytes_batch_independent():
    """'S'-dtype arrays must hash identically regardless of the fixed
    width they arrive with (mixed-length fallback path, non-ASCII)."""
    from kire_ray.functions.hashing import hash64_fast

    vals = [b"\xff" * 300, b"abc", b"\xe9\xe9"]
    wide = np.array(vals, dtype="S400")
    narrow = np.array(vals, dtype="S300")
    assert (hash64_fast(wide) == hash64_fast(narrow)).all()
