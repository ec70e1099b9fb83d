"""Train/test decontamination: flag training documents that share word
n-grams with a benchmark (eval) set.

The standard LLM-pipeline shape (GPT-3 appendix C / PaLM / Llama data
notes, all public): build the benchmark's n-gram set once, then stream
the training corpus through a membership probe and flag documents with
overlapping n-grams. The benchmark side is an eval set — small by
construction (MBs, not corpus-scale) — so it is broadcast via
``ray.put`` and probed inside ``map_batches``; the training side
streams and never shuffles. At 100 TB the probe stays a single
zero-copy pass; only the benchmark set's distinct n-gram hashes (a
sorted uint64 array) live in each worker.

N-grams are hashed with ``hash64_fast`` (ephemeral, vectorized); the
driver oracle replicates the exact string-level overlap in SQL — the
hash-level result equals the string-level result absent 64-bit
collisions (~1e-11 at these cardinalities, and deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from kire_ray.functions.hashing import hash64_fast


def _ngram_hashes(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of all word ``n``-grams in ``texts`` plus per-row counts.

    Vectorized: one flat word array, pandas str-concat for the n-gram
    strings, one bulk ``hash64_fast`` — no per-row Python loop.
    """
    words = texts.str.split()
    lens = words.map(len).to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(len(texts), dtype=np.int64)
    flat = pd.Series(np.concatenate([np.asarray(w, dtype=object) for w in words]))
    grams = flat.copy()
    for i in range(1, n):
        grams = grams + " " + flat.shift(-i)
    # an n-gram starting at position p is valid iff p + n <= row end
    counts = np.maximum(lens - n + 1, 0)
    ends = np.cumsum(lens)
    starts = ends - lens
    valid = np.zeros(len(flat), dtype=bool)
    for s, c in zip(starts, counts):
        valid[s : s + c] = True
    return hash64_fast(grams.to_numpy()[valid]), counts


def benchmark_ngrams(
    bench: "ray.data.Dataset", *, text_col: str = "text", n: int = 3
) -> np.ndarray:
    """Distinct n-gram hashes of the benchmark set as a sorted uint64
    array (block-local dedup, then a driver union of the small
    partials — the benchmark is an eval set, bounded by construction)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h, _ = _ngram_hashes(b[text_col], n)
        return pd.DataFrame({"h": np.unique(h)})

    parts = bench.map_batches(partial, batch_format="pandas").take_all()
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array([r["h"] for r in parts], dtype=np.uint64))


def decontaminate(
    docs: "ray.data.Dataset",
    bench_hashes: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> "ray.data.Dataset":
    """Flag training docs sharing ≥1 word n-gram with the benchmark:
    (doc_id, n_hits, n_ngrams) for every contaminated doc. The
    benchmark hash array ships once (``ray.put``) and each batch is a
    vectorized ``searchsorted`` membership probe."""
    ref = ray.put(np.sort(np.asarray(bench_hashes, dtype=np.uint64)))

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(ref)
        h, counts = _ngram_hashes(b[text_col], n)
        if len(h) == 0 or len(bench) == 0:
            return pd.DataFrame(
                {id_col: b[id_col][:0], "n_hits": [], "n_ngrams": []}
            ).astype({"n_hits": np.int64, "n_ngrams": np.int64})
        pos = np.searchsorted(bench, h)
        pos[pos == len(bench)] = 0
        hit = bench[pos] == h
        ends = np.cumsum(counts)
        n_hits = np.add.reduceat(
            np.concatenate([hit.astype(np.int64), [0]]),
            np.concatenate([[0], ends[:-1]]),
        )
        n_hits[counts == 0] = 0
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_hits": n_hits.astype(np.int64),
                "n_ngrams": counts.astype(np.int64),
            }
        )
        return out[out["n_hits"] > 0]

    return docs.map_batches(probe, batch_format="pandas")
