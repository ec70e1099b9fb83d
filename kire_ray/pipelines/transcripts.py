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
    from kire_ray.stages.shuffle import cluster_cpus as _cluster_cpus

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


def conv_stats(corpus_dir: str) -> "ray.data.Dataset":
    """Per-conversation profile: turn count, distinct roles, tool-call
    turns, total words, and wall-clock span — the conversation-level
    summary table an agent-transcript warehouse materializes once and
    reuses for routing/sampling decisions.

    Shape: block-local combiner to (conv_id, role) partials (sums fold;
    the role set dedups by key; min/max ts fold) → ONE exchange on
    conv_id → vectorized final combine. All outputs are exact integers
    (duration = floor of the epoch-µs span / 1e6), so there is no fp
    ordering risk anywhere."""
    ds = _read_full(
        corpus_dir, ["conv_id", "turn_idx", "role", "tool", "text", "ts"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        words = (b["text"].str.count(" ") + 1).astype(np.int64)
        ts = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {
                "conv_id": b["conv_id"],
                "role": b["role"],
                "n_turns": np.int64(1),
                "n_tool_turns": b["tool"].notna().to_numpy(np.int64),
                "n_words": words,
                "ts_min": ts,
                "ts_max": ts,
            }
        )
        return (
            g.groupby(["conv_id", "role"], sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_tool_turns=("n_tool_turns", "sum"),
                n_words=("n_words", "sum"),
                ts_min=("ts_min", "min"),
                ts_max=("ts_max", "max"),
            )
            .reset_index()
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        p = (
            p.groupby(["conv_id", "role"], sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_tool_turns=("n_tool_turns", "sum"),
                n_words=("n_words", "sum"),
                ts_min=("ts_min", "min"),
                ts_max=("ts_max", "max"),
            )
            .reset_index()
        )
        g = (
            p.groupby("conv_id", sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_roles=("role", "size"),
                n_tool_turns=("n_tool_turns", "sum"),
                n_words=("n_words", "sum"),
                ts_min=("ts_min", "min"),
                ts_max=("ts_max", "max"),
            )
            .reset_index()
        )
        g["duration_s"] = (g["ts_max"] - g["ts_min"]) // 1_000_000
        out = g[
            ["conv_id", "n_turns", "n_roles", "n_tool_turns", "n_words", "duration_s"]
        ].copy()
        for c in out.columns[1:]:
            out[c] = out[c].astype(np.int64)
        return out

    return partitioned_map_groups(
        ds.map_batches(partial, batch_format="pandas"), ["conv_id"], combine
    )


def turn_latency(corpus_dir: str) -> "ray.data.Dataset":
    """Per-role response latency: for every turn with a predecessor in
    its conversation (stable turn_idx order), the gap in seconds to the
    previous turn, attributed to the responding turn's role — then
    count / mean / interpolated p50 / p95 per role. The agent-ops
    latency dashboard over the north-rule input schema.

    Shape: ONE exchange on conv_id → per-partition vectorized sort +
    shift producing (role, gap_µs) histogram partials → one
    role-cardinality exchange → in-reducer sorted expansion with the
    ``events_quantile_cont`` interpolation (reducer memory bounded by
    per-role distinct gap values). Gaps stay exact int64 µs until the
    final divide-by-1e6 + 6dp round, mirroring the oracle exactly."""
    ds = _read_full(corpus_dir, ["conv_id", "turn_idx", "role", "ts"])

    def per_conv(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = p["conv_id"].to_numpy()
        same = conv[1:] == conv[:-1]
        ts = p["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "role": p["role"].to_numpy()[1:][same],
                    "gap_us": (ts[1:] - ts[:-1])[same],
                }
            )
            .groupby(["role", "gap_us"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def stats(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for role, g in part.groupby("role", sort=False):
            g = g.groupby("gap_us", sort=True)["n"].sum().reset_index()
            vals = g["gap_us"].to_numpy(np.int64)
            cnt = g["n"].to_numpy(np.int64)
            cum = cnt.cumsum()
            n = int(cum[-1])
            total = int((vals * cnt).sum())
            qv = {}
            for q in (0.5, 0.95):
                pos = (n - 1) * q
                lo = int(np.floor(pos))
                frac = pos - lo
                vlo = float(vals[int(np.searchsorted(cum, lo + 1, side="left"))])
                if frac == 0.0:
                    v = vlo
                else:
                    vhi = float(vals[int(np.searchsorted(cum, lo + 2, side="left"))])
                    v = vlo + frac * (vhi - vlo)
                qv[q] = v
            rows.append((role, n, total / n / 1e6, qv[0.5] / 1e6, qv[0.95] / 1e6))
        out = pd.DataFrame(
            rows, columns=["role", "n_gaps", "mean_gap_s", "p50_gap_s", "p95_gap_s"]
        )
        for c in ("mean_gap_s", "p50_gap_s", "p95_gap_s"):
            out[c] = round_half_up(out[c].to_numpy(np.float64), 6)
        out["n_gaps"] = out["n_gaps"].astype(np.int64)
        return out

    return partitioned_map_groups(
        partitioned_map_groups(ds, ["conv_id"], per_conv), ["role"], stats
    )


def tool_chains(corpus_dir: str) -> "ray.data.Dataset":
    """Tool-call chains: the ordered sequence of tools invoked in each
    conversation (tool turns only, stable turn order) collapsed to a
    '>'-joined chain string, counted across conversations — the
    workflow-mining view of an agent log (which tool pipelines actually
    occur, and how often).

    Shape: ONE exchange on conv_id → per-partition sort + filter +
    per-conv join (chain strings are bounded by the per-conv turn cap)
    → grouped-agg combine on the chain key. Conversations with no tool
    turns don't emit a row, matching the oracle's WHERE."""
    ds = _read_full(corpus_dir, ["conv_id", "turn_idx", "tool"])

    def per_conv(p: pd.DataFrame) -> pd.DataFrame:
        p = p[p["tool"].notna()].sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        )
        if p.empty:
            return pd.DataFrame(
                {"chain": pd.Series([], dtype=object),
                 "n_convs": pd.Series([], dtype=np.int64)}
            )
        chains = p.groupby("conv_id", sort=False)["tool"].agg(">".join)
        out = chains.value_counts().rename("n_convs").reset_index()
        out.columns = ["chain", "n_convs"]
        return out

    def post(b: pd.DataFrame) -> pd.DataFrame:
        return b.astype({"n_convs": np.int64})

    return grouped_agg(
        partitioned_map_groups(ds, ["conv_id"], per_conv),
        ["chain"],
        {"n_convs": ("n_convs", "sum")},
        post=post,
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


def conv_segments(corpus_dir: str) -> "ray.data.Dataset":
    """Lexical topic segmentation of each conversation (TextTiling's
    skeleton, Hearst 1997): adjacent turns sharing ZERO distinct words
    mark a segment boundary — an integer-exact cut, no fp threshold —
    and the mean adjacent-turn Jaccard is emitted as the conversation's
    cohesion score. Single-turn conversations have no adjacent pairs
    and drop out (both sides of the oracle compare).

    Shape: ONE exchange on conv_id → per-conversation vectorized sort +
    per-turn distinct word sets (turn-bounded) → one row per
    conversation: (conv_id, n_turns, n_segments, mean_jacc)."""
    ds = _read_full(corpus_dir, ["conv_id", "turn_idx", "text"])

    def per_conv(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        rows = []
        for cid, g in p.groupby("conv_id", sort=False):
            ws = [set(t.split()) for t in g["text"]]
            if len(ws) < 2:
                continue
            inters = np.array(
                [len(a & b) for a, b in zip(ws, ws[1:])], dtype=np.int64
            )
            unions = np.array(
                [len(a | b) for a, b in zip(ws, ws[1:])], dtype=np.int64
            )
            jacc = inters / unions
            rows.append(
                (cid, len(ws), int((inters == 0).sum()) + 1, jacc.mean())
            )
        out = pd.DataFrame(
            rows, columns=["conv_id", "n_turns", "n_segments", "mean_jacc"]
        )
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["n_segments"] = out["n_segments"].astype(np.int64)
        out["mean_jacc"] = round_half_up(out["mean_jacc"].to_numpy(np.float64), 6)
        return out

    return partitioned_map_groups(ds, ["conv_id"], per_conv)


def conv_flows(corpus_dir: str) -> "ray.data.Dataset":
    """Conversation-flow template mining: group conversations by their
    full ordered (role:tool) sequence — the structural dedup an
    agent-transcript curator runs to find over-represented scripted
    flows before sampling (a flow with thousands of near-identical
    instances is template noise, not diversity).

    Shape: ONE conv_id exchange builds each conversation's flow string
    from its (turn_idx)-sorted turns (the assembly contract: one conv
    never splits); per-partition combiner collapses to (flow, count,
    min_conv) partials; ONE flow exchange finishes. Exchange 2 carries
    one row per (flow, partition) — template-bounded, never turns.

    Returns (flow, n_turns, n_convs, sample_conv = lexicographically
    smallest conv_id).
    """
    ds = _read_full(corpus_dir, ["conv_id", "turn_idx", "role", "tool"])

    def per_conv(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        tok = p["role"].str.cat(p["tool"].fillna("none"), sep=":")
        flows = (
            pd.DataFrame({"conv_id": p["conv_id"].to_numpy(), "tok": tok})
            .groupby("conv_id", sort=False)["tok"]
            .agg(">".join)
            .reset_index(name="flow")
        )
        return (
            flows.groupby("flow", sort=False)
            .agg(n_convs=("conv_id", "size"), sample_conv=("conv_id", "min"))
            .reset_index()
        )

    from kire_ray.stages.shuffle import grouped_agg

    partials = partitioned_map_groups(ds, ["conv_id"], per_conv)

    def finish(out: pd.DataFrame) -> pd.DataFrame:
        nt = (out["flow"].str.count(">") + 1).astype(np.int64)
        return pd.DataFrame(
            {
                "flow": out["flow"],
                "n_turns": nt,
                "n_convs": out["n_convs"].astype(np.int64),
                "sample_conv": out["sample_conv"],
            }
        )

    return grouped_agg(
        partials,
        ["flow"],
        {"n_convs": ("n_convs", "sum"), "sample_conv": ("sample_conv", "min")},
        post=finish,
    )
