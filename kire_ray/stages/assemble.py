"""Document assembly: transcript turns → one document row per conv_id.

Re-expresses the reference's sentence→document model (a document is an
ordered list of sentences; mention offsets are rebased by prefix-summed
sentence lengths, /root/reference/B4+KIRE/gen_data.py:36-53 and
ATLOP+KIRE/data/gen_kg_data.py:250-269).  For transcripts, turn ↔
sentence and the BASELINE.json invariant is **per-turn text equality
under stable turn ordering**: after assembly, ``turn_texts[i]`` must
equal the input row with ``turn_idx == i``.

Scale design: this is shuffle #1 (key = conv_id).  Rather than shipping
every turn row through the groupby, a *combiner* first merges the turns
of the same conv_id that happen to sit in the same input block into one
segment row (map_batches, no shuffle), so the all-to-all exchange moves
one row per (conv_id, block) instead of one per turn — the same
partial-aggregation trick the reference never needs because it is
single-process.  Hot conversations (many turns) cannot be salted —
assembly needs all turns of a conv in one group — so skew is bounded
instead by capping turns per document (``max_turns``, mirroring the
reference's max_length=512/1800 truncation,
ATLOP+KIRE/knowledge_injection_layer/kg_data_loader.py:12-16).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_turns", pa.int32()),
        ("turn_texts", pa.list_(pa.string())),
        ("roles", pa.list_(pa.string())),
        ("tools", pa.list_(pa.string())),
        ("ts_first", pa.timestamp("us")),
        ("ts_last", pa.timestamp("us")),
    ]
)


def _combine_segments(batch: pd.DataFrame) -> pd.DataFrame:
    """Block-local combiner: turns → one segment row per conv_id."""
    batch = batch.sort_values(["conv_id", "turn_idx"], kind="stable")
    g = batch.groupby("conv_id", sort=False)
    out = pd.DataFrame(
        {
            "conv_id": list(g.groups.keys()),
            "turn_idxs": g["turn_idx"].agg(list),
            "texts": g["text"].agg(list),
            "roles": g["role"].agg(list),
            "tools": g["tool"].agg(list),
            "ts_min": g["ts"].min(),
            "ts_max": g["ts"].max(),
        }
    )
    return out.reset_index(drop=True)


def _merge_partition(part: pd.DataFrame, max_turns: int | None = None) -> pd.DataFrame:
    """Merge one hash partition's conversations (many per call) —
    segments of each conv_id are concatenated and turns sorted by
    turn_idx (stable, so duplicate turn_idx keeps segment order).
    ``max_turns`` keeps only the first N turns of a conversation — the
    skew bound for pathological conv_ids (the reference truncates at
    max_length=512/1800 the same way, kg_data_loader.py:12-16)."""
    part = part.sort_values("conv_id", kind="stable")
    out = {k: [] for k in ("doc_id", "n_turns", "turn_texts", "roles", "tools", "ts_first", "ts_last")}
    for conv, sub in part.groupby("conv_id", sort=False):
        idxs = np.concatenate([np.asarray(x, dtype=np.int64) for x in sub["turn_idxs"]])
        texts = np.concatenate([np.asarray(x, dtype=object) for x in sub["texts"]])
        roles = np.concatenate([np.asarray(x, dtype=object) for x in sub["roles"]])
        tools = np.concatenate([np.asarray(x, dtype=object) for x in sub["tools"]])
        order = np.argsort(idxs, kind="stable")
        if max_turns is not None and len(order) > max_turns:
            order = order[:max_turns]
        out["doc_id"].append(conv)
        out["n_turns"].append(len(order))
        out["turn_texts"].append(list(texts[order]))
        out["roles"].append(list(roles[order]))
        out["tools"].append(list(tools[order]))
        out["ts_first"].append(sub["ts_min"].min())
        out["ts_last"].append(sub["ts_max"].max())
    df = pd.DataFrame(out)
    df["n_turns"] = df["n_turns"].astype(np.int32)
    return df


def assemble_documents(
    transcripts: "ray.data.Dataset",
    *,
    combine_batch_size: int = 8192,
    num_partitions: int | None = None,
    max_turns: int | None = None,
) -> "ray.data.Dataset":
    """``(conv_id, turn_idx, role, text, ts)`` rows → one row per document.

    Shuffle #1 runs on ``hash(conv_id) % P`` (stages/shuffle.py), not
    on raw conv_id: a sort over millions of distinct conversations plus
    a map_groups call per conversation is 5× slower than P partition
    reduces with a vectorized merge (measured at sf0.1)."""
    from kire_ray.stages.shuffle import partitioned_map_groups

    import functools

    segments = transcripts.map_batches(
        _combine_segments, batch_format="pandas", batch_size=combine_batch_size
    )
    return partitioned_map_groups(
        segments,
        ["conv_id"],
        functools.partial(_merge_partition, max_turns=max_turns),
        num_partitions=num_partitions,
    )
