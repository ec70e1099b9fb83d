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
            "ts_min": g["ts"].min(),
            "ts_max": g["ts"].max(),
        }
    )
    return out.reset_index(drop=True)


def _merge_group(group: pd.DataFrame) -> pd.DataFrame:
    """Merge the segments of one conv_id and sort turns by turn_idx.

    Stable mergesort keeps the ordering deterministic even if duplicate
    turn_idx values appear (first wins by segment order).
    """
    idxs = np.concatenate([np.asarray(x, dtype=np.int64) for x in group["turn_idxs"]])
    texts = np.concatenate([np.asarray(x, dtype=object) for x in group["texts"]])
    roles = np.concatenate([np.asarray(x, dtype=object) for x in group["roles"]])
    order = np.argsort(idxs, kind="stable")
    return pd.DataFrame(
        {
            "doc_id": [group["conv_id"].iloc[0]],
            "n_turns": np.array([len(order)], dtype=np.int32),
            "turn_texts": [list(texts[order])],
            "roles": [list(roles[order])],
            "ts_first": [group["ts_min"].min()],
            "ts_last": [group["ts_max"].max()],
        }
    )


def assemble_documents(
    transcripts: "ray.data.Dataset",
    *,
    combine_batch_size: int = 8192,
) -> "ray.data.Dataset":
    """``(conv_id, turn_idx, role, text, ts)`` rows → one row per document."""
    segments = transcripts.map_batches(
        _combine_segments, batch_format="pandas", batch_size=combine_batch_size
    )
    return segments.groupby("conv_id").map_groups(_merge_group, batch_format="pandas")
