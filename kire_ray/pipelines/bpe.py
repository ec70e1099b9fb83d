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

    # Each round is ONE streaming pass: apply the chosen merge AND
    # count the post-merge pairs in the same map (pair partials ride as
    # tagged rows with word=NULL, n=count, seg="left\x1fright"), so the
    # per-round cost is one materialize + one tiny filtered collect —
    # not separate count and apply passes.
    def _pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for s, n in zip(b["seg"], b["n"]):
            toks = s.split()
            for a, t in zip(toks, toks[1:]):
                c[(a, t)] += int(n)
        ks = list(c.keys())
        return pd.DataFrame(
            {
                "word": pd.Series([None] * len(ks), dtype=object),
                "n": np.fromiter(c.values(), dtype=np.int64, count=len(ks)),
                "seg": ["\x1f".join(k) for k in ks],
            }
        )

    def seed_and_count(b: pd.DataFrame) -> pd.DataFrame:
        segs = pd.DataFrame(
            {
                "word": b["word"].to_numpy(),
                "n": b["n"].to_numpy(),
                "seg": [" ".join(w) for w in b["word"]],
            }
        )
        return pd.concat([segs, _pair_rows(segs)], ignore_index=True)

    state = vocab.map_batches(seed_and_count, batch_format="pandas").materialize()

    def best_of(state) -> tuple[str, str, int] | None:
        parts = state.map_batches(
            lambda b: b[b["word"].isna()], batch_format="pandas"
        ).to_pandas()
        if parts.empty:
            return None
        tot = parts.groupby("seg", sort=False)["n"].sum().reset_index()
        tot["pair"] = tot["seg"].str.replace("\x1f", " ", regex=False)
        tot = tot.sort_values(["n", "pair"], ascending=[False, True], kind="stable")
        b = tot.iloc[0]
        left, right = b["seg"].split("\x1f")
        return left, right, int(b["n"])

    merges = []
    for rank in range(n_merges):
        best = best_of(state)
        if best is None:
            break
        left, right, cnt = best
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
        last = rank == n_merges - 1

        def merge_and_count(
            b: pd.DataFrame, left=left, right=right, last=last
        ) -> pd.DataFrame:
            segs = b[b["word"].notna()].copy()
            segs["seg"] = [apply_merge(s, left, right) for s in segs["seg"]]
            if last:  # final round's counts are never consumed
                return segs
            return pd.concat([segs, _pair_rows(segs)], ignore_index=True)

        state = state.map_batches(merge_and_count, batch_format="pandas").materialize()

    seg = state.map_batches(
        lambda b: b[b["word"].notna()], batch_format="pandas"
    )
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
