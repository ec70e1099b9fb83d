"""Evaluation harness semantics (official_evaluate port) + theta tuning."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from kire_ray.pipelines.eval import (
    dedup_sort_predictions,
    official_evaluate,
    split_train_dev,
    triple_prf,
    tune_theta,
)


def test_dedup_sort():
    p = pd.DataFrame(
        {
            "doc_id": ["b", "a", "a", "a"],
            "h_idx": [0, 1, 1, 0],
            "t_idx": [1, 0, 0, 1],
            "r": ["P1", "P2", "P2", "P1"],
        }
    )
    out = dedup_sort_predictions(p)
    assert len(out) == 3
    assert out.iloc[0].doc_id == "a" and out.iloc[-1].doc_id == "b"


def test_official_evaluate_exact():
    gold = pd.DataFrame(
        {"doc_id": ["d1", "d1", "d2"], "h_idx": [0, 0, 1], "t_idx": [1, 2, 0], "r": ["P1", "P2", "P1"]}
    )
    preds = pd.DataFrame(
        {"doc_id": ["d1", "d1", "d2"], "h_idx": [0, 0, 1], "t_idx": [1, 1, 0], "r": ["P1", "P9", "P1"]}
    )
    m = official_evaluate(preds, gold)
    assert m["n_pred"] == 3 and m["n_gold"] == 3
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)


def test_ign_formula():
    gold = pd.DataFrame({"doc_id": ["d"], "h_idx": [0], "t_idx": [1], "r": ["P1"]})
    preds = pd.DataFrame(
        {"doc_id": ["d", "d"], "h_idx": [0, 0], "t_idx": [1, 2], "r": ["P1", "P1"]}
    )
    facts = {("Q1", "P1", "Q2")}
    m = official_evaluate(
        preds, gold, train_facts=facts, fact_of=lambda k: ("Q1", "P1", "Q2") if k[2] == 1 else ("x",)
    )
    # correct=1, in-train=1 → ign numerator 0, denominator 2-1=1
    assert m["ign_precision"] == 0.0 and m["correct_in_train"] == 1


def test_tune_theta_picks_best_cut():
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    correct = np.array([1, 1, 0, 1, 0])
    out = tune_theta(scores, correct, n_gold=3)
    # best F1 at k=4 (P=3/4, R=1) vs k=2 (P=1, R=2/3)
    assert out["theta"] == pytest.approx(0.6)
    assert out["best_f1"] == pytest.approx(2 * 0.75 * 1 / 1.75)


def test_split_deterministic():
    s = pd.Series(["a", "b", "c", "d"])
    assert split_train_dev(s).tolist() == split_train_dev(s).tolist()


def test_harness_on_pipeline_output(ray_session, tiny_corpus):
    from kire_ray.pipelines.kg_construct import build_graph

    g = build_graph(tiny_corpus, concurrency=2)
    preds = g["triples"].to_pandas().rename(columns={"pred": "r"})
    gold = pq.read_table(f"{tiny_corpus}/gold_labels.parquet").to_pandas()
    m = official_evaluate(
        preds[["doc_id", "h_idx", "t_idx", "r"]].assign(),
        gold,
    )
    assert m["f1"] >= 0.95, m

    edges = g["edges"].to_pandas()
    gt = pq.read_table(f"{tiny_corpus}/gold_triples.parquet").to_pandas()
    prf = triple_prf(edges, gt)
    assert prf["f1"] >= 0.95, prf


def test_to_official_and_result_json(tmp_path):
    """Official writer: sorted, deduped, reference column names
    (evaluation.py:10-41 / convert2result.py)."""
    import json

    import pandas as pd

    from kire_ray.pipelines.eval import to_official, write_result_json

    preds = pd.DataFrame(
        {
            "doc_id": ["b", "a", "a", "a"],
            "h_idx": [0, 1, 1, 0],
            "t_idx": [1, 0, 0, 1],
            "pred": ["P2", "P1", "P1", "P9"],
            "score": [2.5, 2.1, 2.1, 2.2],
        }
    )
    off = to_official(preds)
    assert list(off.columns) == ["title", "h_idx", "t_idx", "r"]
    assert len(off) == 3  # exact duplicate dropped
    assert off.iloc[0].tolist() == ["a", 0, 1, "P9"]  # sorted by (title,h,t,r)
    p = write_result_json(preds, str(tmp_path / "result.json"))
    rows = json.load(open(p))
    assert rows == off.to_dict("records")


def test_tune_theta_distributed_equals_numpy(ray_session):
    """The grid-bucket distributed theta tuner must agree with the
    driver-side numpy path on a large synthetic score table with
    planted score ties (the hard case: tie order must follow the
    canonical tiebreak key, and the best-F1 pick must match argmax)."""
    import ray.data

    from kire_ray.pipelines.eval import tune_theta_distributed

    rng = np.random.RandomState(7)
    n = 200_000
    # quantized scores force heavy ties across block boundaries
    scores = np.round(rng.rand(n), 3)
    correct = (rng.rand(n) < np.clip(scores, 0, 1) * 0.6).astype(np.int64)
    df = pd.DataFrame(
        {"score": scores, "is_correct": correct, "k": np.arange(n, dtype=np.int64)}
    )
    # canonical driver-side order: sort by tiebreak key first, then
    # stable argsort(-score) — same convention as _q_theta_tuning
    base = df.sort_values("k", kind="stable").reset_index(drop=True)
    n_gold = 50_000
    want = tune_theta(base["score"].to_numpy(), base["is_correct"].to_numpy(), n_gold)

    ds = ray.data.from_pandas(df).repartition(16)
    got = tune_theta_distributed(
        ds, n_gold=n_gold, tiebreak_cols=("k",), n_buckets=64
    )
    for key in ("theta", "best_f1", "precision", "recall"):
        assert got[key] == want[key], key
    assert abs(got["auc"] - want["auc"]) < 1e-12
