"""Evaluation harness — port of the reference's official DocRED eval.

Mirrors ``official_evaluate``
(/root/reference/ATLOP+KIRE/evaluation.py:70-193):
- predictions sorted by (title, h_idx, t_idx, r) and exact-deduped
  (evaluation.py:112-118);
- micro precision / recall / F1 on exact (title, h_idx, t_idx, r)
  match (evaluation.py:143-145, 166-176);
- Ign-F1: correct predictions whose (h_name-level) fact was seen in the
  train split are removed from both numerator and denominator
  (evaluation.py:147-158, 180-181).

Our analogue of the train/dev split: a deterministic hash split on
doc_id; the train-fact set is (subj_qid, pred, obj_qid) triples of
train docs — a broadcast-set semi-join, exactly the fact-set cache the
reference keeps (evaluation.py:44-67).

The cumulative P/R curve + theta tuning (A6, GLRE trainer
tune_f1_theta:609-682) is driver-side over the score-sorted prediction
table, as in the reference (bounded: one row per predicted pair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kire_ray.functions.hashing import hash64


def dedup_sort_predictions(preds: pd.DataFrame) -> pd.DataFrame:
    """Sort by (doc_id, h_idx, t_idx, r) then drop exact duplicates —
    evaluation.py:112-118 semantics."""
    cols = ["doc_id", "h_idx", "t_idx", "r"]
    return (
        preds.sort_values(cols, kind="stable")
        .drop_duplicates(subset=cols)
        .reset_index(drop=True)
    )


def split_train_dev(doc_ids: pd.Series, train_frac: float = 0.5) -> pd.Series:
    """Deterministic hash split; True = train."""
    h = hash64(doc_ids.to_numpy())
    return pd.Series((h % 1000) < int(train_frac * 1000), index=doc_ids.index)


def split_train_valid(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    valid_proportion: float = 0.1,
    seed: int = 0,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """O8: the AE-style train/valid split
    (knowledge_injection_layer/autoencoder.py:631-649: shuffle, first
    ``valid_proportion`` → valid, rest → train) as a deterministic
    distributed operator: a seeded content hash of the key column
    replaces the RNG shuffle, so the split is the same on every worker,
    partition order, and cluster size, rows are never duplicated or
    dropped, and no global shuffle is needed. Returns (train, valid).

    Both returns are LAZY views over the same input: consuming both
    executes the upstream DAG twice. That is the intended trade at
    100 TB (re-reading beats materializing the full corpus into the
    object store); a caller whose upstream is expensive-compute rather
    than a read should pass ``ds.materialize()``."""
    cut = int(valid_proportion * 1_000_000)

    def part(keep_valid: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            u = hash64((b[key_col].astype(str) + f"#{seed}").to_numpy()) % 1_000_000
            mask = u < cut
            return b[mask] if keep_valid else b[~mask]

        return f

    return (
        ds.map_batches(part(False), batch_format="pandas"),
        ds.map_batches(part(True), batch_format="pandas"),
    )


def official_evaluate(
    preds: pd.DataFrame,
    gold: pd.DataFrame,
    train_facts: set[tuple] | None = None,
    fact_of=None,
) -> dict:
    """preds/gold: columns (doc_id, h_idx, t_idx, r). Returns micro
    P/R/F1 and Ign-P/R/F1."""
    preds = dedup_sort_predictions(preds)
    gold_set = {(g.doc_id, g.h_idx, g.t_idx, g.r) for g in gold.itertuples()}
    pred_keys = [(p.doc_id, p.h_idx, p.t_idx, p.r) for p in preds.itertuples()]
    correct = [k for k in pred_keys if k in gold_set]

    p = len(correct) / len(pred_keys) if pred_keys else 0.0
    r = len(correct) / len(gold_set) if gold_set else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    out = {"precision": p, "recall": r, "f1": f1, "n_pred": len(pred_keys), "n_gold": len(gold_set)}

    if train_facts is not None and fact_of is not None:
        # Ign: remove correct-and-in-train from numerator AND from the
        # prediction count (evaluation.py:180-181 exact formula)
        correct_in_train = sum(1 for k in correct if fact_of(k) in train_facts)
        denom = len(pred_keys) - correct_in_train
        p_ign = (len(correct) - correct_in_train) / denom if denom else 0.0
        f1_ign = 2 * p_ign * r / (p_ign + r) if (p_ign + r) else 0.0
        out.update(
            {"ign_precision": p_ign, "ign_f1": f1_ign, "correct_in_train": correct_in_train}
        )
    return out


def official_evaluate_distributed(
    preds: "ray.data.Dataset",
    gold: "pd.DataFrame | ray.data.Dataset",
    *,
    train_mask=None,
    broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
) -> dict:
    """``official_evaluate`` without collecting the prediction table to
    the driver (VERDICT r4 #1: preds and gold both scale with document
    count, so at 100 TB neither the ``itertuples`` scan nor the
    ``ray.put(frozenset(gold))`` is dimension-sized).

    ``preds``: Dataset with (doc_id, h_idx, t_idx, r) and, when
    ``train_mask`` is given, (subj_qid, obj_qid) for the Ign fact —
    the canonical fact of a prediction key is (subj_qid, r, obj_qid),
    functional in (doc_id, h_idx) / (doc_id, t_idx) by construction.
    ``train_mask(doc_id: pd.Series) -> bool ndarray`` is the
    vectorized train-split predicate (the GLRE intrain flag, M12).

    Shape — every driver-held value is a scalar count:
    1. exact dedup of prediction keys (block-local combiner → one
       key-hash exchange), evaluation.py:112-118;
    2. ``is_correct`` via ``mark_membership`` against the gold keys
       (size-thresholded: broadcast under ``broadcast_limit``, else a
       tagged left-outer exchange — the J5 shape);
    3. train facts = distinct (subj_qid, r, obj_qid) of train-doc
       predictions (one exchange, materialized), then a second
       membership mark (the J6 anti-join sense, evaluation.py:147-158);
    4. one streaming pass folds (n_pred, correct, correct_in_train).
    Bit-equal to ``official_evaluate`` (same integer counts, same float
    formula) — test_official_eval_distributed_equal, which also forces
    ``broadcast_limit=0``.
    """
    from kire_ray.stages.joins import mark_membership
    from kire_ray.stages.shuffle import partitioned_map_groups

    key_cols = ["doc_id", "h_idx", "t_idx", "r"]
    deduped = partitioned_map_groups(
        preds.map_batches(
            lambda b: b.drop_duplicates(subset=key_cols), batch_format="pandas"
        ),
        key_cols,
        lambda part: part.drop_duplicates(subset=key_cols),
        num_partitions=num_partitions,
    ).materialize()
    n_pred = deduped.count()

    # n_gold = DISTINCT gold keys (set semantics, evaluation.py:143-145)
    if isinstance(gold, pd.DataFrame):
        gold_keys = gold[key_cols].drop_duplicates()
        n_gold = len(gold_keys)
    else:
        gold_keys = partitioned_map_groups(
            gold.map_batches(
                lambda b: b[key_cols].drop_duplicates(), batch_format="pandas"
            ),
            key_cols,
            lambda part: part.drop_duplicates(),
            num_partitions=num_partitions,
        ).materialize()
        n_gold = gold_keys.count()

    marked = mark_membership(
        deduped,
        gold_keys,
        key_cols,
        "is_correct",
        broadcast_limit=broadcast_limit,
        keys_nrows=n_gold,
        keys_distinct=True,
        num_partitions=num_partitions,
    )

    if train_mask is not None:
        fact_cols = ["subj_qid", "r", "obj_qid"]
        facts = partitioned_map_groups(
            deduped.map_batches(
                lambda b: b.loc[
                    np.asarray(train_mask(b["doc_id"]), dtype=bool), fact_cols
                ].drop_duplicates(),
                batch_format="pandas",
            ),
            fact_cols,
            lambda part: part.drop_duplicates(),
            num_partitions=num_partitions,
        ).materialize()
        marked = mark_membership(
            marked,
            facts,
            fact_cols,
            "in_train_fact",
            broadcast_limit=broadcast_limit,
            keys_nrows=facts.count(),
            keys_distinct=True,
            num_partitions=num_partitions,
        )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        corr = b["is_correct"].to_numpy(bool)
        row = {"correct": [int(corr.sum())]}
        if "in_train_fact" in b.columns:
            row["correct_in_train"] = [
                int((corr & b["in_train_fact"].to_numpy(bool)).sum())
            ]
        return pd.DataFrame(row)

    parts = marked.map_batches(fold, batch_format="pandas").to_pandas()
    correct = int(parts["correct"].sum()) if not parts.empty else 0

    p = correct / n_pred if n_pred else 0.0
    r = correct / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    out = {
        "precision": p,
        "recall": r,
        "f1": f1,
        "n_pred": n_pred,
        "n_gold": n_gold,
    }
    if train_mask is not None:
        cit = int(parts["correct_in_train"].sum()) if not parts.empty else 0
        denom = n_pred - cit
        p_ign = (correct - cit) / denom if denom else 0.0
        f1_ign = 2 * p_ign * r / (p_ign + r) if (p_ign + r) else 0.0
        out.update(
            {"ign_precision": p_ign, "ign_f1": f1_ign, "correct_in_train": cit}
        )
    return out


def tune_theta(scores: np.ndarray, is_correct: np.ndarray, n_gold: int) -> dict:
    """Global-sort theta tuning (GLRE trainer.tune_f1_theta:609-682,
    B4 Config.py:1028-1221): sort by score desc, cumulative P/R, pick
    the threshold maximizing F1."""
    order = np.argsort(-scores, kind="stable")
    corr = is_correct[order].astype(np.float64)
    cum_tp = np.cumsum(corr)
    k = np.arange(1, len(corr) + 1)
    prec = cum_tp / k
    rec = cum_tp / max(n_gold, 1)
    f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    best = int(np.argmax(f1))
    return {
        "theta": float(scores[order][best]),
        "best_f1": float(f1[best]),
        "precision": float(prec[best]),
        "recall": float(rec[best]),
        "auc": float(np.trapz(prec, rec)),
    }


def tune_theta_distributed(
    preds: "object",
    *,
    n_gold: int,
    score_col: str = "score",
    correct_col: str = "is_correct",
    tiebreak_cols: tuple = (),
    n_buckets: int = 1024,
) -> dict:
    """``tune_theta`` without a global sort or a driver collect — the
    events_cume_dist grid-bucket prefix scan applied to the cumulative
    P/R curve (A6 at 100-TB pair-score scale).

    Shape: (1) block partials for score min/max (2 doubles/block);
    (2) block-local per-bucket (count, tp) partials on a fixed
    DESCENDING score grid, folded on the driver into per-bucket prefix
    offsets (B rows — constant, like a sketch); (3) ONE exchange on
    bucket id: every score in a lower-numbered bucket is strictly
    higher, so offset + local sort position is the exact global rank.
    Each bucket emits its local-best F1 point plus its trapz partial
    and boundary (prec, rec) points; the driver folds ≤B summary rows.
    Ties (equal scores) share a bucket by construction and break by
    ``tiebreak_cols`` ascending — pass the same canonical key the
    driver-side path pre-sorts on, and the two paths are bit-equal on
    theta/best_f1/precision/recall (integer-count arithmetic) and
    equal to ~1e-15 on auc (per-bucket trapz reassociation).
    """
    from kire_ray.stages.shuffle import partitioned_map_groups as pmg

    B = n_buckets
    # consumed three times (min/max pass, bucket counts, the bucketed
    # exchange) — materialize ONCE so an unmaterialized upstream (e.g.
    # the mark_membership exchange) isn't executed per pass (review r5;
    # same single-execution discipline as connected_components' gate)
    preds = preds.materialize()
    mm = preds.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [b[score_col].min()], "hi": [b[score_col].max()]}
        ),
        batch_format="pandas",
    ).to_pandas()
    if mm.empty or mm["lo"].isna().all():
        raise ValueError("tune_theta_distributed: empty prediction table")
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    span = (hi - lo) or 1.0

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.minimum(((hi - v) / span * B).astype(np.int64), B - 1)

    def bcounts(b: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "bucket": bucket_of(b[score_col].to_numpy(np.float64)),
                    "n": np.ones(len(b), np.int64),
                    "tp": b[correct_col].to_numpy().astype(np.int64),
                }
            )
            .groupby("bucket", sort=False)
            .sum()
            .reset_index()
        )

    bc = (
        preds.map_batches(bcounts, batch_format="pandas")
        .to_pandas()
        .groupby("bucket")
        .sum()
    )
    n_arr = np.zeros(B, np.int64)
    tp_arr = np.zeros(B, np.int64)
    n_arr[bc.index.to_numpy()] = bc["n"].to_numpy()
    tp_arr[bc.index.to_numpy()] = bc["tp"].to_numpy()
    k_off = np.concatenate([[0], np.cumsum(n_arr)[:-1]])
    tp_off = np.concatenate([[0], np.cumsum(tp_arr)[:-1]])
    gold_den = max(n_gold, 1)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = bucket_of(b[score_col].to_numpy(np.float64))
        return b

    def per_bucket(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for bk, g in part.groupby("bucket", sort=False):
            g = g.sort_values(
                [score_col, *tiebreak_cols],
                ascending=[False] + [True] * len(tiebreak_cols),
                kind="mergesort",
            )
            corr = g[correct_col].to_numpy().astype(np.float64)
            cum_tp = np.cumsum(corr) + float(tp_off[int(bk)])
            k = (
                np.arange(1, len(g) + 1, dtype=np.float64)
                + float(k_off[int(bk)])
            )
            prec = cum_tp / k
            rec = cum_tp / gold_den
            f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
            best = int(np.argmax(f1))
            # internal trapz pairs; the driver stitches the boundary
            # pair between consecutive non-empty buckets
            auc_part = (
                float(np.trapz(prec, rec)) if len(g) > 1 else 0.0
            )
            outs.append(
                pd.DataFrame(
                    {
                        "bucket": [int(bk)],
                        "best_f1": [float(f1[best])],
                        "best_pos": [int(k[best])],
                        "theta": [float(g[score_col].to_numpy()[best])],
                        "precision": [float(prec[best])],
                        "recall": [float(rec[best])],
                        "auc_part": [auc_part],
                        "first_prec": [float(prec[0])],
                        "first_rec": [float(rec[0])],
                        "last_prec": [float(prec[-1])],
                        "last_rec": [float(rec[-1])],
                    }
                )
            )
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {
                    c: pd.Series([], dtype=d)
                    for c, d in [
                        ("bucket", np.int64),
                        ("best_f1", np.float64),
                        ("best_pos", np.int64),
                        ("theta", np.float64),
                        ("precision", np.float64),
                        ("recall", np.float64),
                        ("auc_part", np.float64),
                        ("first_prec", np.float64),
                        ("first_rec", np.float64),
                        ("last_prec", np.float64),
                        ("last_rec", np.float64),
                    ]
                }
            )
        )

    summ = (
        pmg(
            preds.map_batches(add_bucket, batch_format="pandas"),
            ["bucket"],
            per_bucket,
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # global best: highest f1, first global position on ties (argmax)
    order = np.lexsort((summ["best_pos"].to_numpy(), -summ["best_f1"].to_numpy()))
    top = summ.iloc[order[0]]
    auc = float(summ["auc_part"].sum())
    # boundary trapz terms between consecutive non-empty buckets
    fp, fr = summ["first_prec"].to_numpy(), summ["first_rec"].to_numpy()
    lp, lr = summ["last_prec"].to_numpy(), summ["last_rec"].to_numpy()
    auc += float(np.sum((fr[1:] - lr[:-1]) * (fp[1:] + lp[:-1]) / 2.0))
    return {
        "theta": float(top["theta"]),
        "best_f1": float(top["best_f1"]),
        "precision": float(top["precision"]),
        "recall": float(top["recall"]),
        "auc": auc,
    }


def triple_prf(pred: pd.DataFrame, gold: pd.DataFrame) -> dict:
    """(subj_qid, pred, obj_qid) set-level P/R/F1 — the BASELINE.json
    P/R ≥ 0.95 gate."""
    ps = {(r.subj_qid, r.pred, r.obj_qid) for r in pred.itertuples()}
    gs = {(r.subj_qid, r.pred, r.obj_qid) for r in gold.itertuples()}
    tp = len(ps & gs)
    p = tp / len(ps) if ps else 0.0
    r = tp / len(gs) if gs else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": 2 * p * r / (p + r) if (p + r) else 0.0,
        "n_pred": len(ps),
        "n_gold": len(gs),
    }


def to_official(preds: pd.DataFrame) -> pd.DataFrame:
    """Prediction rows → the official submission columns
    (to_official, /root/reference/ATLOP+KIRE/evaluation.py:10-41):
    (title, h_idx, t_idx, r), sorted + exact-deduped."""
    df = preds.rename(columns={"doc_id": "title", "pred": "r"})[
        ["title", "h_idx", "t_idx", "r"]
    ]
    return (
        df.sort_values(["title", "h_idx", "t_idx", "r"], kind="stable")
        .drop_duplicates()
        .reset_index(drop=True)
    )


def write_result_json(preds: pd.DataFrame, path: str) -> str:
    """Official result.json writer (ATLOP+KIRE/train.py:408-409,
    GLRE convert2result.py:1-44): a JSON array of
    {title, h_idx, t_idx, r}. Predictions are output-sized (bounded),
    so a driver-side dump mirrors the reference exactly."""
    import json

    off = to_official(preds)
    with open(path, "w") as f:
        json.dump(off.to_dict("records"), f)
    return path
