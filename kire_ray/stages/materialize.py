"""Graph materialization: exact dedup into nodes and edges tables.

Shuffle #2 of the DAG (SURVEY.md §7.1): ``groupby((s,p,o)).first`` for
edges — the reference's sorted-dedup of predictions
(/root/reference/ATLOP+KIRE/evaluation.py:112-118) and its doc-triple
list-dedup (gen_kg_data.py:320-323) — and ``groupby(qid)`` merge for
nodes.  Node vectors merge by logsumexp, which is associative over
disjoint mention sets, so the distributed merge equals a global pool.

Keys are content hashes of (s,p,o)/qid — uniformly distributed, so no
salting is needed here even when one entity appears in millions of
documents: the per-qid group carries only small pre-aggregated rows
(one per document), and a combiner pass (map_batches partial merge)
halves shuffle volume before the groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def dedup_edges(
    triples: "ray.data.Dataset", *, extra_keys: tuple[str, ...] = ()
) -> "ray.data.Dataset":
    """(doc_id, …, subj_qid, pred, obj_qid, score) → distinct edges with
    provenance (max score, doc count, first doc). ``extra_keys`` scopes
    the dedup (e.g. a ``part`` column so one execution yields every
    partition's edges independently — the chunked resumable path)."""
    keys = [*extra_keys, "subj_qid", "pred", "obj_qid"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # block-local combiner: collapse to one row per (keys, doc)
        # before the shuffle. doc_id rides through the exchange so the
        # reducer's nunique is EXACT — summing per-block nunique partials
        # double-counts a doc whose rows land in two blocks (batch-layout
        # dependent n_docs).
        return (
            b.groupby([*keys, "doc_id"], sort=False)
            .agg(score=("score", "max"))
            .reset_index()
        )

    part = triples.map_batches(partial, batch_format="pandas")

    def final(out: pd.DataFrame) -> pd.DataFrame:
        out["score"] = out["score"].astype(np.float64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    from kire_ray.stages.shuffle import grouped_agg

    return grouped_agg(
        part,
        keys,
        {
            "score": ("score", "max"),
            "n_docs": ("doc_id", "nunique"),
            "first_doc": ("doc_id", "min"),
        },
        post=final,
    )


def _logsumexp_merge(vecs: np.ndarray) -> np.ndarray:
    m = vecs.max(axis=0)
    return m + np.log(np.exp(vecs - m).sum(axis=0))


def merge_nodes(
    doc_entities: "ray.data.Dataset", *, extra_keys: tuple[str, ...] = ()
) -> "ray.data.Dataset":
    """Per-doc entity rows → one node row per canonical qid.

    label = lexicographic min (deterministic representative), mention
    counts summed, vectors logsumexp-merged (exact: per-doc vectors are
    logsumexp partials over disjoint mention sets).
    """

    keys = [*extra_keys, "qid"]

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        # doc_id sort fixes the floating-point summation order so the
        # distributed merge is bit-identical to the sequential oracle
        part = part.sort_values([*keys, "doc_id"], kind="stable")
        out = {k: [] for k in (*keys, "label", "n_docs", "n_mentions", "vec")}
        for kv, g in part.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            for kcol, v in zip(keys, kv):
                out[kcol].append(v)
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in g["vec"]])
            out["label"].append(g["label"].min())
            out["n_docs"].append(len(g))
            out["n_mentions"].append(int(g["n_mentions"].sum()))
            out["vec"].append(_logsumexp_merge(vecs).tolist())
        df = pd.DataFrame(out)
        df["n_docs"] = df["n_docs"].astype(np.int64)
        df["n_mentions"] = df["n_mentions"].astype(np.int64)
        return df

    from kire_ray.stages.shuffle import partitioned_map_groups

    return partitioned_map_groups(doc_entities, keys, merge_part)
