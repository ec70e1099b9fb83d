"""Long-document chunk/stitch — the reference's overlapping-window
semantics (/root/reference/ATLOP+KIRE/long_seq.py:8-56 split,
:59-114/:156-211 re-merge).

``process_long_input`` runs the encoder on overlapping windows of a
>max_len document and merges the per-token outputs back: tokens covered
by one window keep that window's output; tokens in an overlap average
the covering windows' outputs (attention-mask-weighted mean in the
reference; plain mean here since the stand-in has no padding).

These are pure functions a scorer UDF applies batch-locally — chunking
never changes dataset row boundaries (a doc stays one row; windows are
an implementation detail of the stage that needs bounded context).
"""

from __future__ import annotations

import numpy as np


def chunk_spans(n: int, max_len: int, overlap: int) -> list[tuple[int, int]]:
    """Window (start, end) spans covering [0, n) with ``overlap`` shared
    tokens between consecutive windows (long_seq.py:12-: two windows
    [0:max_len] and [n-max_len:n] for n < 2*max_len - overlap; the
    general stride ladder beyond)."""
    if n <= max_len:
        return [(0, n)]
    stride = max_len - overlap
    spans = []
    start = 0
    while True:
        end = min(start + max_len, n)
        spans.append((start, end))
        if end == n:
            return spans
        start += stride
        if start + max_len >= n:
            spans.append((n - max_len, n))
            return spans


def stitch(chunks: list[np.ndarray], spans: list[tuple[int, int]], n: int) -> np.ndarray:
    """Merge per-window outputs back to one (n, d) array: mean over the
    windows covering each position (long_seq.py:59-114 semantics)."""
    d = chunks[0].shape[1]
    acc = np.zeros((n, d), dtype=np.float64)
    cnt = np.zeros(n, dtype=np.int64)
    for c, (s, e) in zip(chunks, spans):
        acc[s:e] += c[: e - s]
        cnt[s:e] += 1
    return acc / np.maximum(cnt, 1)[:, None]
