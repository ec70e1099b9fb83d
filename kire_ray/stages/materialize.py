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


def _coalesce_if_fragmented(
    ds: "ray.data.Dataset", source: "ray.data.Dataset" | None = None
) -> "ray.data.Dataset":
    """Coalesce ``ds`` to the exchange width unless its block count is
    already known (materialized ``source``) to be at/under it — a
    repartition of an already-coalesced stream is a pure extra
    all-to-all (measured ~4s on the sf0.1 nodes merge)."""
    from kire_ray.stages.shuffle import default_partitions

    P = default_partitions()
    probe = source if source is not None else ds
    try:
        if probe.num_blocks() <= P:
            return ds
    except Exception:
        pass  # lazy dataset: block count unknown → coalesce
    return ds.repartition(P)


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

    # the scorer stage upstream runs ~10 blocks/CPU for actor-pool
    # parallelism; an exchange over that many tiny blocks pays sort-task
    # overhead per block (measured 12s → 2-3s on the nodes merge), so
    # coalesce the small combiner partials to the exchange width first —
    # unless the input is already at (or under) the exchange width, in
    # which case the repartition is a pure extra all-to-all pass
    part = _coalesce_if_fragmented(
        triples.map_batches(partial, batch_format="pandas"), triples
    )

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


def grouped_logsumexp(V: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Row-grouped logsumexp over a (rows, dim) matrix whose groups are
    contiguous runs beginning at ``starts`` — ONE reduceat pass instead
    of a python loop per group. This exact kernel is shared by the
    distributed merge, the partitioned-output merge and the sequential
    test oracle, so their floating-point summation order is identical
    by construction (reduceat sums sequentially in row order)."""
    counts = np.diff(np.append(starts, len(V)))
    m = np.maximum.reduceat(V, starts, axis=0)
    s = np.add.reduceat(np.exp(V - np.repeat(m, counts, axis=0)), starts, axis=0)
    return m + np.log(s)


def _vec_matrix(col) -> np.ndarray:
    """vec column (lists / ndarrays) → (rows, dim) float64 matrix."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def merge_nodes(
    doc_entities: "ray.data.Dataset",
    *,
    extra_keys: tuple[str, ...] = (),
    coalesce: bool = True,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-doc entity rows → one node row per canonical qid.

    label = lexicographic min (deterministic representative), mention
    counts summed, vectors logsumexp-merged (exact: per-doc vectors are
    logsumexp partials over disjoint mention sets).
    """

    keys = [*extra_keys, "qid"]

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame(
                {k: [] for k in (*keys, "label", "n_docs", "n_mentions", "vec")}
            )
        # doc_id sort fixes the floating-point summation order so the
        # distributed merge is bit-identical to the sequential oracle
        part = part.sort_values([*keys, "doc_id"], kind="stable").reset_index(drop=True)
        # groupby(sort=False) on the sorted frame yields groups in
        # first-occurrence order == the contiguous-run order of starts
        scal = (
            part.groupby(keys, sort=False)
            .agg(
                label=("label", "min"),
                n_docs=("doc_id", "size"),
                n_mentions=("n_mentions", "sum"),
            )
            .reset_index()
        )
        from kire_ray.stages.assemble import _group_starts

        V = _vec_matrix(part["vec"])
        sig = part[keys[0]].astype(str)
        for k in keys[1:]:
            sig = sig + "\x1f" + part[k].astype(str)
        merged = grouped_logsumexp(V, _group_starts(sig.to_numpy()))
        scal["vec"] = [v.tolist() for v in merged]
        scal["n_docs"] = scal["n_docs"].astype(np.int64)
        scal["n_mentions"] = scal["n_mentions"].astype(np.int64)
        return scal

    from kire_ray.stages.shuffle import default_partitions, partitioned_map_groups

    # coalesce the wide actor-stage output before the exchange (see
    # dedup_edges: per-block sort overhead dominates tiny blocks); pass
    # coalesce=False when the embedder input is already exchange-width
    # (the cached flagship path) — the repartition would be a pure
    # extra all-to-all
    src = (
        doc_entities.repartition(default_partitions()) if coalesce else doc_entities
    )
    return partitioned_map_groups(src, keys, merge_part, num_partitions=num_partitions)
