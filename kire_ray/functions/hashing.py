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


_FNV_OFF = _U64(0xCBF29CE484222325)
_FNV_PRIME = _U64(0x100000001B3)
_SM1 = _U64(0xBF58476D1CE4E5B9)
_SM2 = _U64(0x94D049BB133111EB)


def _splitmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(30))
    h = h * _SM1
    h = h ^ (h >> _U64(27))
    h = h * _SM2
    return h ^ (h >> _U64(31))


_POS_KEYS: dict[int, np.ndarray] = {}


def _pos_keys(width: int) -> np.ndarray:
    """Per-position odd multipliers (precomputed once per width):
    splitmix64 of the position index, forced odd so char*K is a
    bijection mod 2^64. splitmix64(0)=0, hence the NUL-invariance."""
    k = _POS_KEYS.get(width)
    if k is None:
        with np.errstate(over="ignore"):
            k = _splitmix(np.arange(1, width + 1, dtype=_U64) * _SH_WEYL) | _U64(1)
        _POS_KEYS[width] = k
    return k


_SH_WEYL = _U64(0x9E3779B97F4A7C15)


def hash64_fast(values) -> np.ndarray:
    """Vectorized 64-bit hash for *ephemeral* keys (shuffle pids, LSH
    buckets, token/shingle hashes): FNV-1a over UTF-32 code units with
    a splitmix64 finisher — one numpy op per character column instead
    of one blake2b call per string (measured ~40× on short keys).

    NOT interchangeable with ``hash64``: different values. Use only
    where the hash never outlives the run (partition ids, dedup
    signatures, convergence fingerprints); persisted ids (NT entity
    ids, content-hash edge ids) stay on blake2b ``hash64`` so outputs
    are stable across numpy/platform versions.

    The hash of a string must not depend on the numpy fixed-width
    padding (which varies with the longest string in the batch), so
    each character position contributes ``splitmix64(char * K[pos])``
    XOR-combined — a padding NUL contributes exactly 0 regardless of
    how many there are. Wide inputs (documents, not keys) would blow
    up the fixed-width UTF-32 matrix, so strings longer than 256 chars
    hash via the blake2b loop — decided PER STRING, never per batch: a
    key's hash must be a pure function of the key, and a batch-level
    fallback would give the same short key different hashes depending
    on which batch it shared with a long string (a real group-split
    bug caught by conv_flows, whose flow keys span 40..1600 chars).
    """
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind not in ("U", "S"):
        arr = arr.astype("U")
    if len(arr) == 0:
        return np.empty(0, dtype=_U64)
    width = arr.dtype.itemsize // (4 if arr.dtype.kind == "U" else 1)
    if width > 256:
        # np.char.str_len handles 'S' directly (byte lengths) — an
        # astype('U') here would raise on non-ASCII bytes and measure
        # chars against a byte-width threshold
        lens = np.char.str_len(arr)
        long_mask = lens > 256
        if long_mask.all():
            return hash64(arr)
        out = np.empty(len(arr), dtype=_U64)
        out[long_mask] = hash64(arr[long_mask])
        short = arr[~long_mask]
        # re-narrow: fixed width of the short subset is ≤ 256
        out[~long_mask] = hash64_fast(short.astype(short.dtype.kind + str(max(int(lens[~long_mask].max()), 1))))
        return out
    if arr.dtype.kind == "U":
        u = np.ascontiguousarray(arr).view(np.uint32).reshape(len(arr), width)
    else:
        u = np.ascontiguousarray(arr).view(np.uint8).reshape(len(arr), width)
    K = _pos_keys(width)
    h = np.zeros(len(arr), dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(width):
            h ^= _splitmix(u[:, j].astype(_U64) * K[j])
        return _splitmix(h ^ _FNV_OFF)


def score01(values) -> np.ndarray:
    """Map strings to deterministic uniform floats in [0, 1).

    Used by the deterministic scorer stand-in (stages/scorer.py) to give
    every (h, r, t) candidate a stable pseudo-logit.
    """
    return hash64(values).astype(np.float64) / float(2**64)


def score01_str(value: str) -> float:
    return hash64_str(value) / float(2**64)


def score01_md5(value: str) -> float:
    """Uniform [0,1) score derived from md5 — the SQL-parity basis.

    First 13 hex digits = 52 bits, exactly representable in float64,
    and the division by 2**52 is exact, so DuckDB reproduces the value
    bit-for-bit::

        CAST(('0x' || substr(md5(s), 1, 13)) AS BIGINT)
            / 4503599627370496.0

    Used wherever a deterministic score must be *driver-verifiable*
    (relation pair scores, adaptive thresholds) — the same promotion
    trick as simhash / ann_lsh / doc_fingerprints.
    """
    return int(
        hashlib.md5(value.encode("utf-8")).hexdigest()[:13], 16
    ) / float(2**52)


def nt_id(surface_norm: str) -> str:
    """Synthetic id for an unlinkable entity cluster — content-derived
    (replaces the reference's sequential ``NT<k>`` counters,
    gen_kg_data.py:286-290; SURVEY.md §4(f)) and md5-based so SQL can
    mint the identical id: ``'NT' || substr(md5(s), 1, 16)``."""
    return "NT" + hashlib.md5(surface_norm.encode("utf-8")).hexdigest()[:16]
