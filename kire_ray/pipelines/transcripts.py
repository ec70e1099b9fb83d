"""Analytics over the raw agent-transcript table itself — the
north-rule input schema (conv_id, turn_idx, role, text, tool, ts)
consumed directly, without the KG chain: the operational queries a
transcript warehouse runs next to extraction (tool usage, dialogue
structure). All corpus-side oracles (bound to the sf0.01 corpus like
kg_assembled_turns).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data

from kire_ray.functions.rounding import round_half_up
from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups


def _read_full(corpus_dir: str, columns: list[str]) -> "ray.data.Dataset":
    from kire_ray.pipelines.kg_construct import _cluster_cpus

    return ray.data.read_parquet(
        os.path.join(corpus_dir, "transcripts.parquet"),
        columns=columns,
        override_num_blocks=max(8, 2 * _cluster_cpus()),
    )


def tool_usage_stats(corpus_dir: str) -> "ray.data.Dataset":
    """Per (role, tool): turn count, distinct conversations, and mean
    words per turn — the tool-call telemetry rollup for an agent-
    transcript store.

    Shape: block-local combiner to (role, tool, conv_id) partials (the
    distinct-conv grain; sums fold, the conv set dedups by key) → ONE
    exchange on (role, tool) → vectorized final combine. The exchange
    carries one row per (role, tool, conv, block), never turns."""

    ds = _read_full(corpus_dir, ["conv_id", "role", "tool", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # single-space-clean corpus ⇒ words = spaces + 1, matching
        # DuckDB len(string_split(text, ' ')) exactly
        words = (b["text"].str.count(" ") + 1).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "role": b["role"],
                    # tool is NULL on non-tool turns; pandas groupby
                    # drops NaN keys — use an explicit sentinel,
                    # COALESCE'd identically in the oracle
                    "tool": b["tool"].fillna("none"),
                    "conv_id": b["conv_id"],
                    "n_turns": np.int64(1),
                    "n_words": words,
                }
            )
            .groupby(["role", "tool", "conv_id"], sort=False)
            .agg(n_turns=("n_turns", "sum"), n_words=("n_words", "sum"))
            .reset_index()
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = (
            p.groupby(["role", "tool", "conv_id"], sort=False)
            .agg(n_turns=("n_turns", "sum"), n_words=("n_words", "sum"))
            .reset_index()
            .groupby(["role", "tool"], sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_convs=("conv_id", "size"),
                n_words=("n_words", "sum"),
            )
            .reset_index()
        )
        return pd.DataFrame(
            {
                "role": g["role"],
                "tool": g["tool"],
                "n_turns": g["n_turns"].astype(np.int64),
                "n_convs": g["n_convs"].astype(np.int64),
                "avg_words": round_half_up(
                    g["n_words"].to_numpy(np.float64)
                    / g["n_turns"].to_numpy(np.float64),
                    6,
                ),
            }
        )

    return partitioned_map_groups(
        ds.map_batches(partial, batch_format="pandas"), ["role", "tool"], combine
    )


def role_transitions(corpus_dir: str) -> "ray.data.Dataset":
    """Dialogue-structure bigram: counts of (role → next role) under
    stable turn ordering — the Markov skeleton of the conversations
    (who speaks after whom, how often tools interleave).

    Shape: ONE exchange on conv_id (each conversation co-located) →
    per-partition vectorized sort + shift → grouped-agg combine on the
    (role_from, role_to) pairs."""
    ds = _read_full(corpus_dir, ["conv_id", "turn_idx", "role"])

    def per_conv(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        same = p["conv_id"].to_numpy()[1:] == p["conv_id"].to_numpy()[:-1]
        r = p["role"].to_numpy()
        return (
            pd.DataFrame(
                {"role_from": r[:-1][same], "role_to": r[1:][same]}
            )
            .groupby(["role_from", "role_to"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def post(b: pd.DataFrame) -> pd.DataFrame:
        return b.astype({"n": np.int64})

    return grouped_agg(
        partitioned_map_groups(ds, ["conv_id"], per_conv),
        ["role_from", "role_to"],
        {"n": ("n", "sum")},
        post=post,
    )
