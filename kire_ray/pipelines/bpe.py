"""Distributed BPE vocabulary induction (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units", ACL —
the `learn_bpe` loop re-expressed over a Ray word-frequency table).

The classic algorithm: start from per-character segmentations of the
corpus vocabulary, repeatedly (a) count adjacent symbol pairs weighted
by word frequency, (b) merge the most frequent pair everywhere. The
distributed shape exploits the two cardinality collapses:

- the WORD table is vocab-sized (one grouped exchange over the corpus,
  :func:`word_frequencies`), never the corpus;
- the PAIR table is alphabet-sized (≤ (|chars| + n_merges)² distinct
  symbols), so per-round pair counts are block-local combiners whose
  partials collect to a tiny driver table — no per-round shuffle.

Per round: one streaming pass over the segmented vocab (pair partial
counts) + one map applying the winning merge (materialized so round
r+1 reads r's output once). n_merges rounds total.

Determinism / SQL parity: the winner is (count DESC, pair ASC) — no
RNG, no order dependence — and the greedy leftmost non-overlapping
merge is performed on a DOUBLE-SPACE padded string with a plain
``str.replace``: tokens are joined by two spaces and the pattern
``" a  b "`` keeps a zero-width-boundary space on each side, so
consecutive occurrences ("a b a b") both merge while overlapping runs
("a a a" under pair "a a") merge left-to-right exactly like the
reference's regex with lookarounds. DuckDB's ``replace`` has the same
left-to-right non-overlapping semantics, which makes every round — and
therefore the whole merge table — value-exact in SQL.

Deviation from the paper, documented: no ``</w>`` end-of-word marker
(merges operate within whole words); the marker is a constant suffix
and adds nothing to the distributed shape.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

import ray.data


def _pad(seg: str) -> str:
    return " " + seg.replace(" ", "  ") + " "


def apply_merge(seg: str, left: str, right: str) -> str:
    """Greedy leftmost non-overlapping merge of (left, right) in a
    space-joined symbol string — the double-space trick (module doc)."""
    out = _pad(seg).replace(f" {left}  {right} ", f" {left}{right} ")
    return " ".join(out.split())


def bpe_learn_full(
    docs: "ray.data.Dataset",
    *,
    n_merges: int = 10,
    text_col: str = "text",
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Learn ``n_merges`` BPE merges from a documents table.

    Returns ``(merges, seg)``: the merge table (rank, left, right,
    pair, merged, count) with rank 0 = first (most frequent) merge,
    and the final segmented vocab (word, n, seg) — one learning run
    produces both, so callers never learn twice.
    """
    from kire_ray.pipelines.text_analysis import word_frequencies

    vocab = word_frequencies(docs, text_col=text_col)

    def seed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "word": b["word"].to_numpy(),
                "n": b["n"].to_numpy(),
                "seg": [" ".join(w) for w in b["word"]],
            }
        )

    seg = vocab.map_batches(seed, batch_format="pandas").materialize()

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for s, n in zip(b["seg"], b["n"]):
            toks = s.split()
            for a, t in zip(toks, toks[1:]):
                c[(a, t)] += int(n)
        if not c:
            return pd.DataFrame(
                {"left": pd.Series([], dtype=str), "right": pd.Series([], dtype=str),
                 "c": pd.Series([], dtype=np.int64)}
            )
        ks = list(c.keys())
        return pd.DataFrame(
            {
                "left": [k[0] for k in ks],
                "right": [k[1] for k in ks],
                "c": np.fromiter(c.values(), dtype=np.int64, count=len(ks)),
            }
        )

    merges = []
    for rank in range(n_merges):
        # pair space is alphabet-sized → block partials collect tiny
        parts = seg.map_batches(pair_partial, batch_format="pandas").to_pandas()
        if parts.empty:
            break
        tot = parts.groupby(["left", "right"], sort=False)["c"].sum().reset_index()
        tot["pair"] = tot["left"] + " " + tot["right"]
        tot = tot.sort_values(["c", "pair"], ascending=[False, True], kind="stable")
        best = tot.iloc[0]
        left, right, cnt = str(best["left"]), str(best["right"]), int(best["c"])
        merges.append(
            {
                "rank": np.int32(rank),
                "left": left,
                "right": right,
                "pair": left + " " + right,
                "merged": left + right,
                "count": np.int64(cnt),
            }
        )

        def do_merge(b: pd.DataFrame, left=left, right=right) -> pd.DataFrame:
            b = b.copy()
            b["seg"] = [apply_merge(s, left, right) for s in b["seg"]]
            return b

        seg = seg.map_batches(do_merge, batch_format="pandas").materialize()

    return ray.data.from_pandas(pd.DataFrame(merges)), seg


def bpe_learn(
    docs: "ray.data.Dataset", *, n_merges: int = 10, text_col: str = "text"
) -> "ray.data.Dataset":
    """The merge table of :func:`bpe_learn_full`."""
    return bpe_learn_full(docs, n_merges=n_merges, text_col=text_col)[0]


def bpe_segment(
    docs: "ray.data.Dataset",
    *,
    n_merges: int = 10,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Apply ``n_merges`` learned merges to the corpus vocabulary:
    (word, n, seg, n_subwords) — the tokenizer-fertility table (mean
    subwords/word is the standard tokenizer-quality metric). Reuses the
    learner's final segmented vocab directly (the merges were already
    applied in rank order during learning), adding only the subword
    count projection."""
    seg = bpe_learn_full(docs, n_merges=n_merges, text_col=text_col)[1]

    def project(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_subwords"] = np.array(
            [s.count(" ") + 1 for s in b["seg"]], dtype=np.int32
        )
        return b

    return seg.map_batches(project, batch_format="pandas")
