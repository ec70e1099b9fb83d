"""Stable 64-bit hashing used for deterministic ids and scores.

The reference assigns ids by first-seen sequential counters
(``/root/reference/ATLOP+KIRE/data/gen_kg_data.py:333-347`` — entity2id /
relation2id; ``:286-290`` — ``NT<k>`` fallback ids).  Sequential counters
are order-dependent and cannot be reproduced under distributed
execution, so this engine replaces them with content hashes (SURVEY.md
§4 item (f)): the id of a thing is a pure function of its content, the
same on every worker, every partition order, every cluster size.

Implementation: blake2b(digest_size=8) over UTF-8 bytes.  Deterministic
across processes and machines (unlike Python's ``hash``), and with no
dependency beyond the stdlib.  A vectorized path hashes a whole numpy
object array per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64


def hash64_str(value: str) -> int:
    """Stable 64-bit hash of one string."""
    return int.from_bytes(
        hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "big"
    )


def hash64(values) -> np.ndarray:
    """Stable 64-bit hash of an array of strings → uint64 ndarray.

    Vectorized enough for per-batch use (~1M strings/sec); hot paths
    hash short keys (QIDs, surface forms), not document bodies.
    """
    arr = np.asarray(values, dtype=object)
    out = np.empty(len(arr), dtype=_U64)
    digest = hashlib.blake2b
    for i, v in enumerate(arr):
        out[i] = int.from_bytes(digest(str(v).encode("utf-8"), digest_size=8).digest(), "big")
    return out


def score01(values) -> np.ndarray:
    """Map strings to deterministic uniform floats in [0, 1).

    Used by the deterministic scorer stand-in (stages/scorer.py) to give
    every (h, r, t) candidate a stable pseudo-logit.
    """
    return hash64(values).astype(np.float64) / float(2**64)


def score01_str(value: str) -> float:
    return hash64_str(value) / float(2**64)
