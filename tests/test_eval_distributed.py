"""VERDICT r4 #1/#7: the eval gold-set membership mark and the official
metrics must not depend on a corpus-scaling driver broadcast — the
size-thresholded switch's two paths are equality-tested with the
fallback FORCED (broadcast_limit=0), and theta tie-breaking is pinned
on adversarial bucket-boundary ties."""

import numpy as np
import pandas as pd

import ray.data

from kire_ray.stages.joins import mark_membership


def _norm(ds):
    out = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    cols = sorted(out.columns)
    return out[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def test_mark_membership_paths_equal(ray_session):
    """Broadcast isin mark ≡ tagged left-outer exchange mark, including
    duplicate key rows on BOTH sides and multi-column tuples."""
    rng = np.random.RandomState(11)
    n = 5000
    ds_df = pd.DataFrame(
        {
            "a": rng.randint(0, 40, n).astype(np.int32),
            "b": np.array([f"x{v}" for v in rng.randint(0, 25, n)], dtype=object),
            "v": rng.rand(n),
        }
    )
    # keys WITH duplicates — the exchange path must collapse them or
    # probe rows would multiply
    keys = pd.DataFrame(
        {
            "a": rng.randint(0, 40, 300).astype(np.int32),
            "b": np.array([f"x{v}" for v in rng.randint(0, 25, 300)], dtype=object),
        }
    )
    ds = ray.data.from_pandas(ds_df).repartition(4)
    fast = _norm(
        mark_membership(ds, keys, ["a", "b"], "hit", broadcast_limit=10**6)
    )
    slow = _norm(mark_membership(ds, keys, ["a", "b"], "hit", broadcast_limit=0))
    pd.testing.assert_frame_equal(fast, slow)
    # ground truth
    truth = ds_df.merge(keys.drop_duplicates(), on=["a", "b"], how="left", indicator=True)
    assert int(fast["hit"].sum()) == int((truth["_merge"] == "both").sum())
    assert len(fast) == n  # no row multiplication from duplicate keys


def test_mark_membership_dataset_keys_distinct(ray_session):
    """keys as a pre-distinct Dataset with keys_nrows hint (the
    materialized-gold shape) marks identically."""
    ds_df = pd.DataFrame({"k": np.arange(20, dtype=np.int64)})
    keys = pd.DataFrame({"k": np.arange(0, 20, 2, dtype=np.int64)})
    ds = ray.data.from_pandas(ds_df).repartition(3)
    kds = ray.data.from_pandas(keys).repartition(2)
    got = _norm(
        mark_membership(
            ds, kds, ["k"], "hit", broadcast_limit=0,
            keys_nrows=len(keys), keys_distinct=True,
        )
    )
    assert got["hit"].tolist() == [(k % 2 == 0) for k in got["k"]]


def test_official_eval_distributed_equal(ray_session):
    """official_evaluate_distributed ≡ official_evaluate on the same
    prediction/gold tables — both the broadcast and the forced-exchange
    path, including the Ign train-fact counts."""
    from kire_ray.pipelines.eval import (
        official_evaluate,
        official_evaluate_distributed,
    )

    rng = np.random.RandomState(3)
    n = 4000
    preds = pd.DataFrame(
        {
            "doc_id": np.array([f"c{v}" for v in rng.randint(0, 50, n)], dtype=object),
            "h_idx": rng.randint(0, 6, n).astype(np.int32),
            "t_idx": rng.randint(0, 6, n).astype(np.int32),
            "r": np.array([f"P{v}" for v in rng.randint(0, 8, n)], dtype=object),
        }
    )
    # fact functional in (doc, idx): derive qids from doc+idx
    preds["subj_qid"] = "Q" + preds["doc_id"].str[1:] + "_" + preds["h_idx"].astype(str)
    preds["obj_qid"] = "Q" + preds["doc_id"].str[1:] + "_" + preds["t_idx"].astype(str)
    gold = pd.DataFrame(
        {
            "doc_id": np.array([f"c{v}" for v in rng.randint(0, 50, 900)], dtype=object),
            "h_idx": rng.randint(0, 6, 900).astype(np.int32),
            "t_idx": rng.randint(0, 6, 900).astype(np.int32),
            "r": np.array([f"P{v}" for v in rng.randint(0, 8, 900)], dtype=object),
        }
    )

    def train_mask(s: pd.Series) -> np.ndarray:
        return (s.str[1:].astype(int) % 2 == 0).to_numpy()

    dedup = preds.drop_duplicates(subset=["doc_id", "h_idx", "t_idx", "r"])
    fact_by_key = {
        (p.doc_id, p.h_idx, p.t_idx, p.r): (p.subj_qid, p.r, p.obj_qid)
        for p in dedup.itertuples()
    }
    train_facts = {
        fact_by_key[(p.doc_id, p.h_idx, p.t_idx, p.r)]
        for p in dedup.itertuples()
        if train_mask(pd.Series([p.doc_id]))[0]
    }
    want = official_evaluate(
        preds[["doc_id", "h_idx", "t_idx", "r"]],
        gold,
        train_facts=train_facts,
        fact_of=lambda k: fact_by_key.get(k, ("?",)),
    )

    ds = ray.data.from_pandas(preds).repartition(5)
    for limit in (10**6, 0):  # broadcast path, then forced exchange path
        got = official_evaluate_distributed(
            ds,
            ray.data.from_pandas(gold).repartition(2) if limit == 0 else gold,
            train_mask=train_mask,
            broadcast_limit=limit,
        )
        assert got == want, (limit, got, want)


def test_theta_ties_straddling_bucket_boundaries(ray_session):
    """VERDICT r4 #7: heavy score ties sitting EXACTLY on the grid's
    bucket boundaries (and at lo/hi) — distributed theta must still
    bit-match the numpy path via the canonical tiebreak."""
    from kire_ray.pipelines.eval import tune_theta, tune_theta_distributed

    rng = np.random.RandomState(5)
    # lo=0.0, hi=1.0, n_buckets=4 → boundaries at .25/.5/.75; every
    # score IS a boundary value, each repeated many times
    vals = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    scores = np.repeat(vals, 40)
    rng.shuffle(scores)
    corr = (rng.rand(len(scores)) < scores * 0.8 + 0.1).astype(np.int64)
    df = pd.DataFrame(
        {
            "score": scores,
            "is_correct": corr,
            "k": np.arange(len(scores), dtype=np.int64),
        }
    )
    n_gold = max(1, int(corr.sum()))
    want = tune_theta(df["score"].to_numpy(), df["is_correct"].to_numpy(), n_gold)
    got = tune_theta_distributed(
        ray.data.from_pandas(df).repartition(7),
        n_gold=n_gold,
        tiebreak_cols=("k",),
        n_buckets=4,
    )
    for key in ("theta", "best_f1", "precision", "recall"):
        assert got[key] == want[key], key
    assert abs(got["auc"] - want["auc"]) < 1e-12


def test_theta_and_official_forced_fallback_at_sf0001(ray_session):
    """End-to-end: kg_theta_tuning and kg_eval_official produce the
    SAME row with the gold broadcast forced off (the 100-TB path) as
    with it on — the driver-facing oracles hold on both paths."""
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    base_theta = E._q_theta_tuning(sf)
    forced_theta = E._q_theta_tuning(sf, broadcast_limit=0)
    pd.testing.assert_frame_equal(base_theta, forced_theta)

    base_off = E._q_kg_eval_official(sf)
    forced_off = E._q_kg_eval_official(sf, collect_limit=0)
    pd.testing.assert_frame_equal(
        base_off[sorted(base_off.columns)], forced_off[sorted(forced_off.columns)]
    )


def test_mark_membership_dtype_mismatch_paths_agree(ray_session):
    """Review r5: with MISMATCHED key dtypes (int probe vs float keys)
    both paths must agree — the exchange path joins on the same
    canonical string the broadcast path hashes, so int 5 and float 5.0
    consistently do NOT match on either path."""
    ds_df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    keys = pd.DataFrame({"k": np.arange(0, 10, 2, dtype=np.float64)})
    ds = ray.data.from_pandas(ds_df).repartition(2)
    fast = _norm(mark_membership(ds, keys, ["k"], "hit", broadcast_limit=100))
    slow = _norm(mark_membership(ds, keys, ["k"], "hit", broadcast_limit=0))
    pd.testing.assert_frame_equal(fast, slow)
    # '4' != '4.0' canonically — consistent non-matches, never a
    # path-dependent answer
    assert not fast["hit"].any()


def test_mark_membership_zero_limit_forces_exchange_on_empty_keys(ray_session):
    """Review r5: broadcast_limit=0 must force the exchange path even
    when the key set is EMPTY (0 <= 0 used to take the broadcast
    branch, leaving the fallback unexercised at exactly that edge)."""
    ds_df = pd.DataFrame({"k": np.arange(5, dtype=np.int64)})
    empty_keys = pd.DataFrame({"k": pd.Series([], dtype=np.int64)})
    out = _norm(
        mark_membership(
            ray.data.from_pandas(ds_df), empty_keys, ["k"], "hit",
            broadcast_limit=0,
        )
    )
    assert len(out) == 5 and not out["hit"].any()
