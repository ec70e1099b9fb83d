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


def _group_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Start offsets of each run of equal keys in a sorted array."""
    if len(sorted_keys) == 0:
        return np.empty(0, dtype=np.int64)
    change = np.empty(len(sorted_keys), dtype=bool)
    change[0] = True
    change[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return np.flatnonzero(change)


def _combine_segments(batch: pd.DataFrame, max_turns: int | None = None) -> pd.DataFrame:
    """Block-local combiner: turns → one segment row per conv_id.

    Vectorized: one sort, group boundaries by run detection, per-group
    slices (pandas ``groupby.agg(list)`` cost ~70 µs/row here — this is
    the single hottest stage of the flagship by remote CPU time).

    ``max_turns`` also caps each block-local segment to its first
    ``max_turns`` turns in (turn_idx, block order) — the first level of
    an exact two-level top-k (a conversation's globally-kept first N
    turns are each within their block's first N), so a pathological
    hot conv_id ships at most ``max_turns × touched_blocks`` turns
    through the assembly exchange instead of all of them (the skew
    bound SURVEY.md §4 promises; measured in tests/test_skew.py).

    Column-adaptive: ``role`` / ``tool`` / ``ts`` are carried only when
    present in the input — a column-pruned read (flagship: conv_id,
    turn_idx, text) never pays their exchange bytes (VERDICT r4 #4).

    Exchange representation: each segment packs its turns into SINGLE
    buffers — ``turn_idxs``/``*_lens`` as int32 ``bytes``, the strings
    of a column concatenated into one str (sliced back by lens at
    merge). Pickling one buffer beats per-object pickling of the turn
    strings/ints the same way lists beat ndarray views in the round-2
    lesson (4.5 s vs 0.27 s per 171k-turn block), one level further:
    measured r5 on the 64× corpus, packed segments cut the fused
    flagship 17.1 → 14.4 s at 32 CPUs (length-sliced, so NO separator
    is injected into text — any byte sequence round-trips exactly)."""
    has_role = "role" in batch.columns
    has_tool = "tool" in batch.columns
    has_ts = "ts" in batch.columns
    if batch.empty:
        cols = ["conv_id", "turn_idxs", "texts_cat", "text_lens"]
        cols += ["roles_cat", "role_lens"] * has_role
        cols += ["tools_cat", "tool_lens"] * has_tool
        cols += ["ts_min", "ts_max"] if has_ts else []
        return pd.DataFrame({k: [] for k in cols})
    batch = batch.sort_values(["conv_id", "turn_idx"], kind="stable")
    conv = batch["conv_id"].to_numpy()
    starts = _group_starts(conv)
    if max_turns is not None:
        counts = np.diff(np.append(starts, len(conv)))
        pos_in_grp = np.arange(len(conv)) - np.repeat(starts, counts)
        keep = pos_in_grp < max_turns
        batch = batch.iloc[keep]
        conv = conv[keep]
        starts = _group_starts(conv)
    ends = np.append(starts[1:], len(conv))
    idx_all = batch["turn_idx"].to_numpy().astype(np.int32, copy=False)

    def pack_str(col: str) -> tuple[list, list]:
        # missing values (None OR NaN/pd.NA — pandas nullable columns
        # arrive as floats) round-trip as length -1 contributing no
        # chars and unpack as None; strings round-trip exactly (the
        # per-turn invariant)
        a = batch[col].to_numpy()
        lens = np.fromiter(
            (len(x) if isinstance(x, str) else -1 for x in a),
            np.int32,
            count=len(a),
        )
        cats = [
            "".join([x for x in a[s:e].tolist() if isinstance(x, str)])
            for s, e in zip(starts, ends)
        ]
        lens_b = [lens[s:e].tobytes() for s, e in zip(starts, ends)]
        return cats, lens_b

    texts_cat, text_lens = pack_str("text")
    out = {
        "conv_id": conv[starts],
        "turn_idxs": [idx_all[s:e].tobytes() for s, e in zip(starts, ends)],
        "texts_cat": texts_cat,
        "text_lens": text_lens,
    }
    if has_role:
        out["roles_cat"], out["role_lens"] = pack_str("role")
    if has_tool:
        out["tools_cat"], out["tool_lens"] = pack_str("tool")
    if has_ts:
        ts_raw = batch["ts"].to_numpy()
        ts = ts_raw.view("int64")
        out["ts_min"] = np.minimum.reduceat(ts, starts).view(ts_raw.dtype)
        out["ts_max"] = np.maximum.reduceat(ts, starts).view(ts_raw.dtype)
    return pd.DataFrame(out)


def _merge_partition(part: pd.DataFrame, max_turns: int | None = None) -> pd.DataFrame:
    """Merge one hash partition's conversations (many per call) —
    segments of each conv_id are concatenated and turns sorted by
    turn_idx (stable, so duplicate turn_idx keeps segment order).
    ``max_turns`` keeps only the first N turns of a conversation — the
    skew bound for pathological conv_ids (the reference truncates at
    max_length=512/1800 the same way, kg_data_loader.py:12-16)."""
    has_role = "roles_cat" in part.columns
    has_tool = "tools_cat" in part.columns
    has_ts = "ts_min" in part.columns
    if part.empty:
        empty = {
            "doc_id": pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int32),
            "turn_texts": pd.Series([], dtype=object),
        }
        if has_role:
            empty["roles"] = pd.Series([], dtype=object)
        if has_tool:
            empty["tools"] = pd.Series([], dtype=object)
        if has_ts:
            empty["ts_first"] = pd.Series([], dtype="datetime64[us]")
            empty["ts_last"] = pd.Series([], dtype="datetime64[us]")
        return pd.DataFrame(empty)
    part = part.sort_values("conv_id", kind="stable").reset_index(drop=True)
    conv = part["conv_id"].to_numpy()
    seg_starts = _group_starts(conv)
    # flatten ALL segments of the partition at once; per-turn rows are
    # tagged with a dense group id, then ONE lexsort orders every
    # conversation by turn_idx with segment order as the stable
    # tie-break — no per-conversation python loop
    lens = (
        np.fromiter(
            (len(x) for x in part["turn_idxs"]), dtype=np.int64, count=len(part)
        )
        // 4  # int32 buffers
    )
    new_seg = np.zeros(len(part), dtype=np.int64)
    new_seg[seg_starts] = 1
    gid_seg = np.cumsum(new_seg) - 1
    # every segment row carries >= 1 turn (combiner invariant), so every
    # group id appears in the flattened stream and rows align 1:1 with
    # conv[seg_starts]
    gid = np.repeat(gid_seg, lens)
    # single-buffer unpack: ONE bytes-join + frombuffer per column
    idxs = np.frombuffer(
        b"".join(part["turn_idxs"].tolist()), dtype=np.int32
    ).astype(np.int64)

    def unpack_str(cat_col: str, lens_col: str) -> np.ndarray:
        cat_all = "".join(part[cat_col].tolist())
        slens = np.frombuffer(b"".join(part[lens_col].tolist()), dtype=np.int32)
        offs = np.concatenate(
            ([0], np.cumsum(np.maximum(slens, 0), dtype=np.int64))
        )
        return np.array(
            [
                None if l < 0 else cat_all[o: o + l]
                for o, l in zip(offs[:-1], slens)
            ],
            dtype=object,
        )

    texts = unpack_str("texts_cat", "text_lens")
    roles = unpack_str("roles_cat", "role_lens") if has_role else None
    tools = unpack_str("tools_cat", "tool_lens") if has_tool else None
    order = np.lexsort((np.arange(len(gid)), idxs, gid))
    g_sorted = gid[order]
    starts = _group_starts(g_sorted)
    counts = np.diff(np.append(starts, len(g_sorted)))
    if max_turns is not None:
        pos_in_grp = np.arange(len(g_sorted)) - np.repeat(starts, counts)
        keep = pos_in_grp < max_turns
        order = order[keep]
        g_sorted = g_sorted[keep]
        starts = _group_starts(g_sorted)
        counts = np.diff(np.append(starts, len(g_sorted)))
    ends = starts + counts
    texts_s = texts[order]
    out = {
        "doc_id": conv[seg_starts],
        "n_turns": counts.astype(np.int32),
        "turn_texts": [texts_s[s:e].tolist() for s, e in zip(starts, ends)],
    }
    if has_role:
        roles_s = roles[order]
        out["roles"] = [roles_s[s:e].tolist() for s, e in zip(starts, ends)]
    if has_tool:
        tools_s = tools[order]
        out["tools"] = [tools_s[s:e].tolist() for s, e in zip(starts, ends)]
    if has_ts:
        ts_min = part["ts_min"].to_numpy()
        ts_max = part["ts_max"].to_numpy()
        out["ts_first"] = np.minimum.reduceat(
            ts_min.view("int64"), seg_starts
        ).view(ts_min.dtype)
        out["ts_last"] = np.maximum.reduceat(
            ts_max.view("int64"), seg_starts
        ).view(ts_max.dtype)
    return pd.DataFrame(out)


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
        functools.partial(_combine_segments, max_turns=max_turns),
        batch_format="pandas",
        batch_size=combine_batch_size,
    )
    return partitioned_map_groups(
        segments,
        ["conv_id"],
        functools.partial(_merge_partition, max_turns=max_turns),
        num_partitions=num_partitions,
    )
