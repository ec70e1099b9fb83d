"""Deduplication suite over a documents table — exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine.

Algorithms follow the published constructions: MinHash + banded LSH
(Broder, "On the resemblance and containment of documents", 1997;
banding per Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3),
SimHash with pigeonhole band probing (Charikar, "Similarity estimation
techniques from rounding algorithms", STOC 2002; Manku et al., WWW
2007), random-hyperplane cosine LSH (Charikar 2002).

The reference has only exact dedup (triple list-dedup,
/root/reference/ATLOP+KIRE/data/gen_kg_data.py:320-323; sorted
prediction dedup, evaluation.py:112-118).  A 100 TB training-data
pipeline needs the near-dup family too; each operator here follows the
canonical Ray shape:

  vectorized signature per batch (map_batches, numpy)
    → explode to (bucket, doc_id) rows
    → groupby(bucket)            # the ONLY shuffle, uniform keys
    → pairs within bucket → verify (exact metric)
    → connected components → representative per cluster

Signatures are uniformly-distributed hashes, so the groupby keys cannot
be skewed by data skew (identical docs share buckets — bucket size is
bounded by duplicate-cluster size; a pathological bucket is capped by
``max_bucket``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from kire_ray.functions.hashing import hash64, hash64_fast
from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

_MERSENNE = (1 << 61) - 1


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition by content hash, keep min id.

    Returns (doc_id, n_dups): representative id + group size. The
    shuffle moves one small row per (hash, batch) thanks to the
    block-local combiner.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = hash64(b[text_col].to_numpy()).astype("uint64")
        g = pd.DataFrame({"h": h, id_col: b[id_col]}).groupby("h", sort=False)
        return g.agg(doc_id=(id_col, "min"), n_dups=(id_col, "size")).reset_index()

    part = ds.map_batches(partial, batch_format="pandas")

    return grouped_agg(
        part,
        ["h"],
        {"doc_id": ("doc_id", "min"), "n_dups": ("n_dups", "sum")},
        post=lambda out: out.drop(columns=["h"]),
    )


_SH_MIX = np.uint64(0x9E3779B97F4A7C15)  # Weyl constant for rolling combine


def _combine_token_hashes(th: np.ndarray, k: int) -> np.ndarray:
    """Token hashes → unique k-shingle hashes, vectorized: a sliding
    window combined with uint64 wraparound arithmetic (k vector ops)
    instead of re-hashing every joined shingle string."""
    if len(th) == 0:
        return np.array([], dtype=np.uint64)
    if len(th) < k:
        k = len(th)
    sw = np.lib.stride_tricks.sliding_window_view(th, k)
    with np.errstate(over="ignore"):
        h = np.zeros(len(sw), dtype=np.uint64)
        for j in range(k):
            h = h * _SH_MIX + sw[:, j].astype(np.uint64)
    return np.unique(h)


def _shingles(text: str, k: int) -> np.ndarray:
    return _combine_token_hashes(hash64_fast(text.split()), k)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool signature stage: holds the permutation params and a
    token-hash memo (blake2b per string is the dominant cost; the
    token vocabulary is tiny relative to token occurrences)."""

    def __init__(self, *, text_col="text", id_col="doc_id", num_perm=64, shingle_k=3):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.k = num_perm, shingle_k
        self.a, self.b = _minhash_params(num_perm)
        self._memo: dict[str, int] = {}

    def _token_hashes(self, toks: list[str]) -> np.ndarray:
        memo = self._memo
        missing = sorted({t for t in toks if t not in memo})
        if missing:
            for t, h in zip(missing, hash64_fast(missing)):
                memo[t] = int(h)
        return np.fromiter((memo[t] for t in toks), dtype=np.uint64, count=len(toks))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(self._memo) > 2_000_000:  # bound actor memory on open vocab
            self._memo.clear()
        out = []
        for t in batch[self.text_col]:
            sh = _combine_token_hashes(self._token_hashes(t.split()), self.k)
            if len(sh) == 0:
                out.append(np.full(self.num_perm, _MERSENNE, dtype=np.uint64))
                continue
            # (P, S) = (a ⊗ shingle + b) mod M, min over shingles.
            # NOTE (review r5): a·x can reach ~2^122, so the product
            # wraps mod 2^64 BEFORE the mod-M — the realized family is
            # ((a·x mod 2^64) + b) mod M, a deterministic well-mixing
            # hash but NOT the textbook Carter–Wegman construction;
            # the SQL oracle reproduces this exact arithmetic, and
            # banding recall is measured (1.0 at driver scale) rather
            # than assumed from the s^r formula. A 128-bit mulmod would
            # restore the family at ~3× the cost; revisit if measured
            # recall ever degrades on a real corpus.
            v = (self.a[:, None] * (sh[None, :] % _MERSENNE) + self.b[:, None]) % _MERSENNE
            out.append(v.min(axis=1).astype(np.uint64))
        return pd.DataFrame({self.id_col: batch[self.id_col], "sig": [s.tolist() for s in out]})


def minhash_signatures(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 3,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Per-doc MinHash signatures — task pool with a per-worker-process
    MinHasher cache (stages/taskpool.py: the permutation table is
    microseconds to derive; an actor pool's ramp was pure overhead)."""
    from kire_ray.stages.taskpool import process_cached

    return ds.map_batches(
        process_cached(
            MinHasher,
            text_col=text_col, id_col=id_col, num_perm=num_perm, shingle_k=shingle_k,
        ),
        batch_format="pandas",
        concurrency=None if isinstance(concurrency, tuple) else concurrency,
    )


def lsh_candidate_pairs(
    sigs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    bands: int = 16,
    max_bucket: int = 64,
) -> "ray.data.Dataset":
    """Signature → band buckets → candidate pairs.

    Explodes each doc to ``bands`` (band, band_hash) rows; one groupby
    on the uniform bucket key; all-pairs within bucket (capped at
    ``max_bucket`` docs — logged-by-column truncation, not silent).
    """

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized band hashing: (docs, bands, rows_per_band) → one
        # Weyl-mix reduction over the band axis, no per-doc python loop
        S = np.stack([np.asarray(s, dtype=np.uint64) for s in b["sig"]])
        assert S.shape[1] % bands == 0 and S.shape[1] >= bands, (
            f"num_perm={S.shape[1]} must be a positive multiple of "
            f"bands={bands}: r = num_perm // bands = 0 would hash every "
            "doc into one bucket (recall collapses silently under the "
            "max_bucket cap), and a remainder would drop trailing "
            "signature values, changing the documented s^r banding "
            "probability (review r5)"
        )
        r = S.shape[1] // bands
        Sb = S[:, : bands * r].reshape(len(S), bands, r)
        with np.errstate(over="ignore"):
            h = np.zeros((len(S), bands), dtype=np.uint64)
            for j in range(r):
                h = h * _SH_MIX + Sb[:, :, j]
        return pd.DataFrame(
            {
                id_col: np.repeat(b[id_col].to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int64), len(S)),
                "bh": h.reshape(-1).view(np.int64),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pandas")

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        # vectorized all-pairs-within-bucket: distinct ids per bucket,
        # id-asc rank caps each bucket at max_bucket (same semantics as
        # sorted(unique)[:max_bucket]), then one self-merge
        p = part.drop_duplicates(["band", "bh", id_col]).sort_values(
            ["band", "bh", id_col], kind="mergesort"
        )
        rank = p.groupby(["band", "bh"], sort=False).cumcount()
        p = p[rank < max_bucket][["band", "bh", id_col]]
        m = p.merge(p, on=["band", "bh"], suffixes=("_a", "_b"))
        a, b_ = f"{id_col}_a", f"{id_col}_b"
        m = m[m[a] < m[b_]]
        return m[[a, b_]].rename(columns={a: "id_a", b_: "id_b"})

    cand = partitioned_map_groups(buckets, ["band", "bh"], pairs_part)

    def dedup_part(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=["id_a", "id_b"])[["id_a", "id_b"]]

    return partitioned_map_groups(cand, ["id_a", "id_b"], dedup_part)


def verify_jaccard(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    broadcast_limit: int = 100_000,
) -> "ray.data.Dataset":
    """Exact n-gram Jaccard on candidate pairs, auto-selected by size:

    - ≤ ``broadcast_limit`` candidate pairs: collect the candidate
      docs' shingle sets once, broadcast, verify per batch (one
      ``ray.put``, no shuffle) — right when LSH pruned hard;
    - above it (the normal case for a dup-heavy web crawl, where the
      candidate set is corpus-scale): two bucketed hash joins
      pairs⋈shingled-docs on ``id_a`` then ``id_b`` with the Jaccard
      computed inside the join reducers — nothing ever lands on the
      driver, memory is bounded by partition size, not dup volume.

    Both paths compute the identical exact metric on identical pairs,
    so the verified output set is the same (tests assert equality).
    """
    pairs = pairs.materialize()  # consumed twice on either path
    n_pairs = pairs.count()
    if n_pairs == 0 or n_pairs <= broadcast_limit:
        return _verify_jaccard_broadcast(
            pairs, docs, text_col=text_col, id_col=id_col,
            shingle_k=shingle_k, threshold=threshold,
        )
    return _verify_jaccard_joined(
        pairs, docs, text_col=text_col, id_col=id_col,
        shingle_k=shingle_k, threshold=threshold,
    )


def _verify_jaccard_broadcast(
    pairs, docs, *, text_col, id_col, shingle_k, threshold
) -> "ray.data.Dataset":
    from kire_ray.stages.joins import semi_join_broadcast

    # to_pandas, not take_all: the per-row-dict collect path costs
    # ~1000× more than the vectorized block concat (25 s vs 0.08 s on
    # 39k rows, measured) — driver collects here are small but hot
    pair_df = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    cand_ids = set(pair_df["id_a"]) | set(pair_df["id_b"])

    # shingling runs DISTRIBUTED (it dominates verify cost: hashing
    # every candidate doc's tokens); the driver only collects the
    # compact sorted-unique uint64 arrays, never raw text
    def shingle_batch(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "sh": [_shingles(t, shingle_k).tobytes() for t in b[text_col]],
            }
        )

    sh_df = (
        semi_join_broadcast(docs.select_columns([id_col, text_col]), cand_ids, on=id_col)
        .map_batches(shingle_batch, batch_format="pandas")
        .to_pandas()
    )
    empty = np.array([], dtype=np.uint64)
    sh = {
        i: np.frombuffer(s, dtype=np.uint64)
        for i, s in zip(sh_df[id_col], sh_df["sh"])
    }
    ref = ray.put(sh)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        inter = np.empty(len(b), dtype=np.int64)
        union = np.empty(len(b), dtype=np.int64)
        for i, (x, y) in enumerate(zip(b["id_a"], b["id_b"])):
            A, B = m.get(x, empty), m.get(y, empty)
            inter[i] = len(np.intersect1d(A, B, assume_unique=True))
            union[i] = len(A) + len(B) - inter[i]
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        b = b.assign(n_common=inter, n_union=union, jaccard=jac)
        return b[b["jaccard"] >= threshold]

    return pairs.map_batches(verify, batch_format="pandas")


def _verify_jaccard_joined(
    pairs, docs, *, text_col, id_col, shingle_k, threshold
) -> "ray.data.Dataset":
    """Distributed verify: semi-join docs to the candidate id set, hash
    the shingle sets alongside, then route each shingle set to its
    pairs with two bucketed hash joins. All exchanges key on uniform
    ids; no driver-side materialization anywhere."""
    from kire_ray.stages.joins import hash_join
    from kire_ray.stages.shuffle import default_partitions, partitioned_map_groups

    P = default_partitions()

    def explode_ids(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b["id_a"], b["id_b"]]).unique()
        return pd.DataFrame({id_col: u})

    from kire_ray.stages.joins import normalize_blocks

    # normalize exchange/join outputs: sparse candidate sets leave
    # empty partitions whose schema-less blocks abort the Arrow joins
    pairs, n_pairs = normalize_blocks(pairs)
    if n_pairs == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "id_a": np.array([], np.int64),
                    "id_b": np.array([], np.int64),
                    "n_common": np.array([], np.int64),
                    "n_union": np.array([], np.int64),
                    "jaccard": np.array([], np.float64),
                }
            )
        )

    cand_ids, _ = normalize_blocks(
        partitioned_map_groups(
            pairs.map_batches(explode_ids, batch_format="pandas"),
            [id_col],
            lambda p: p.drop_duplicates(),
            num_partitions=P,
        )
    )

    def shingle_batch(b: pd.DataFrame) -> pd.DataFrame:
        # shingle sets ride the joins as binary (sorted-unique uint64
        # bytes): Arrow's hash join rejects list payload columns
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "sh": [_shingles(t, shingle_k).tobytes() for t in b[text_col]],
            }
        )

    # materialize() between joins: each hash-join operator reserves an
    # aggregator-actor pool per partition; three joins stacked in ONE
    # streaming DAG deadlock on small CPU counts (observed at 4 CPUs).
    # One join per execution keeps the pool bounded; intermediates live
    # in the object store (spillable), never on the driver.
    shingled = (
        hash_join(
            docs.select_columns([id_col, text_col]), cand_ids,
            on=[id_col],
        )
        .map_batches(shingle_batch, batch_format="pandas")
        .materialize()
    )

    def rename(col_id, col_sh):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={id_col: col_id, "sh": col_sh})

        return f

    # joins take the join-tuned partition count (half a partition per
    # CPU — wall time grows ~linearly with join partitions), NOT the
    # 2×CPU exchange width P used by the grouped shuffles above
    j1, _ = normalize_blocks(
        hash_join(
            pairs,
            shingled.map_batches(rename("id_a", "sh_a"), batch_format="pandas"),
            on=["id_a"],
        )
    )
    j2 = hash_join(
        j1,
        shingled.map_batches(rename("id_b", "sh_b"), batch_format="pandas"),
        on=["id_b"],
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if "sh_a" not in b.columns:  # schema-less empty join block
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=np.int64),
                 "id_b": pd.Series([], dtype=np.int64),
                 "n_common": pd.Series([], dtype=np.int64),
                 "n_union": pd.Series([], dtype=np.int64),
                 "jaccard": pd.Series([], dtype=np.float64)}
            )
        inter = np.empty(len(b), dtype=np.int64)
        union = np.empty(len(b), dtype=np.int64)
        for i, (sa, sb) in enumerate(zip(b["sh_a"], b["sh_b"])):
            A = np.frombuffer(sa, dtype=np.uint64)
            B = np.frombuffer(sb, dtype=np.uint64)
            inter[i] = len(np.intersect1d(A, B, assume_unique=True))
            union[i] = len(A) + len(B) - inter[i]
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        out = b.drop(columns=["sh_a", "sh_b"]).assign(
            n_common=inter, n_union=union, jaccard=jac
        )
        return out[out["jaccard"] >= threshold]

    return j2.map_batches(verify, batch_format="pandas")


def minhash_dedup(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    broadcast_limit: int = 100_000,
) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dup: returns verified duplicate pairs
    (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col, num_perm=num_perm, shingle_k=shingle_k
    )
    cand = lsh_candidate_pairs(sigs, id_col=id_col, bands=bands)
    return verify_jaccard(
        cand,
        docs,
        text_col=text_col,
        id_col=id_col,
        shingle_k=shingle_k,
        threshold=threshold,
        broadcast_limit=broadcast_limit,
    )


# ------------------------- n-gram Jaccard ---------------------------


def ngram_candidates(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    df_cap: int = 64,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs by rare-n-gram inverted-index blocking.

    Every doc's *distinct* word ``ngram``-grams are exploded to
    ``(gram, doc_id)`` rows; one hash exchange co-locates each gram's
    posting list, and grams whose document frequency is in
    ``[2, df_cap]`` emit all C(df, 2) pairs (vectorized self-merge).
    The ``df_cap`` drops stop-grams — a gram shared by half the corpus
    carries no dedup signal but would emit O(corpus²) pairs; capping
    posting lists is what bounds the blocking stage at 100 TB (the cap
    is part of the operator's declared semantics, mirrored exactly in
    the SQL oracle's ``HAVING df <= cap``).

    Grams ride the exchange as uint64 hashes (``_shingles``), not
    strings — same distinct-counts as the string grams modulo a ~2^-64
    collision. Docs shorter than ``ngram`` tokens emit nothing (the
    SQL ``len(w) >= n`` guard).
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids: list[np.ndarray] = []
        grams: list[np.ndarray] = []
        for i, t in zip(b[id_col], b[text_col]):
            if len(t.split()) < ngram:
                continue
            sh = _shingles(t, ngram)
            grams.append(sh)
            ids.append(np.full(len(sh), i))
        if not grams:
            return pd.DataFrame({"gram": np.array([], dtype=np.uint64),
                                 id_col: np.array([], dtype=np.int64)})
        return pd.DataFrame(
            {"gram": np.concatenate(grams), id_col: np.concatenate(ids)}
        )

    gram_rows = ds.map_batches(explode, batch_format="pandas")

    def gen_pairs(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                              "id_b": np.array([], dtype=np.int64)})
        if len(part) == 0:
            return empty
        df = part.groupby("gram")[id_col].transform("size")
        p = part[(df >= 2) & (df <= df_cap)]
        if len(p) == 0:
            return empty
        m = p.merge(p, on="gram", suffixes=("_a", "_b"))
        a, b_ = f"{id_col}_a", f"{id_col}_b"
        m = m[m[a] < m[b_]]
        return (
            m[[a, b_]]
            .rename(columns={a: "id_a", b_: "id_b"})
            .drop_duplicates()  # block-local combiner; global distinct below
        )

    pairs = partitioned_map_groups(
        gram_rows, ["gram"], gen_pairs, num_partitions=num_partitions
    )
    return partitioned_map_groups(
        pairs, ["id_a", "id_b"], lambda p: p.drop_duplicates(),
        num_partitions=num_partitions,
    )


def ngram_jaccard_dedup(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.5,
    df_cap: int = 64,
    broadcast_limit: int = 100_000,
) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard near-dup: rare-gram blocking
    (``ngram_candidates``) then the exact full-set Jaccard on each
    candidate pair (``verify_jaccard`` — auto broadcast/joined path).

    Unlike ``minhash_dedup`` (probabilistic candidate recall) this is
    *exhaustive within the blocking rule*: every pair sharing at least
    one gram with document frequency ≤ ``df_cap`` is verified, so the
    whole operator is deterministic and SQL-replicable — the driver
    oracle reconstructs blocking AND verification in DuckDB and the
    outputs hash-match. Returns (id_a, id_b, n_common, n_union,
    jaccard≥threshold), jaccard half-up-rounded to 6 decimals.
    """
    from kire_ray.functions.rounding import round_half_up

    cand = ngram_candidates(
        docs, text_col=text_col, id_col=id_col, ngram=ngram, df_cap=df_cap
    )
    v = verify_jaccard(
        cand, docs, text_col=text_col, id_col=id_col,
        shingle_k=ngram, threshold=threshold, broadcast_limit=broadcast_limit,
    )

    def post(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(jaccard=round_half_up(b["jaccard"].to_numpy(), 6))
        return b[["id_a", "id_b", "n_common", "n_union", "jaccard"]]

    return v.map_batches(post, batch_format="pandas")


# ----------------------------- SimHash ------------------------------


def simhash_signatures(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """64-bit SimHash (sign-sum of per-token bit vectors).

    The per-token 64-bit value is the first 16 md5 hex chars — md5 so
    the whole signature (and hence the dedup pairs) is reconstructible
    in DuckDB SQL bit-for-bit; tokens are factorized so md5 runs once
    per distinct token, and the sign-sums are one ``np.add.reduceat``
    over the concatenated token stream (no per-doc loop).
    """
    import hashlib

    def sig(b: pd.DataFrame) -> pd.DataFrame:
        # split(' ') for string_split parity; '' hashes like any token
        tok_lists = b[text_col].str.split(" ")
        n = tok_lists.str.len().to_numpy(dtype=np.int64)
        flat = tok_lists.explode().to_numpy(dtype=object)
        codes, uniques = pd.factorize(pd.Series(flat), sort=False)
        uh = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):
            uh[i] = int(hashlib.md5(str(u).encode("utf-8")).hexdigest()[:16], 16)
        h = uh[codes]
        pm = (
            2 * ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            - 1
        )
        starts = np.cumsum(n) - n
        v = np.add.reduceat(pm, starts, axis=0)  # (n_docs, 64); n >= 1 always
        out = (
            ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :])
        ).sum(axis=1, dtype=np.uint64)
        return pd.DataFrame({id_col: b[id_col], "simhash": out})

    return ds.map_batches(sig, batch_format="pandas")


def simhash_dedup(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: bucket on 4×16-bit bands (pigeonhole —
    any pair within hamming ≤ 3 of 64 bits shares ≥1 exact band),
    verify exact Hamming distance within buckets."""
    sigs = simhash_signatures(docs, text_col=text_col, id_col=id_col)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for bi in range(4):
            band = ((s >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(pd.DataFrame({id_col: b[id_col], "simhash": s, "band": bi, "bh": band}))
        return pd.concat(rows, ignore_index=True)

    buckets = sigs.map_batches(explode, batch_format="pandas")

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        a, b_, d = [], [], []
        for _, g in part.groupby(["band", "bh"], sort=False):
            g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
            ids = g[id_col].to_numpy()
            hs = g["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                x = np.bitwise_xor(hs[i], hs[i + 1 :])
                ham = np.array([bin(int(v)).count("1") for v in x])
                for j in np.nonzero(ham <= max_hamming)[0]:
                    a.append(ids[i])
                    b_.append(ids[i + 1 + j])
                    d.append(int(ham[j]))
        return pd.DataFrame({"id_a": a, "id_b": b_, "hamming": d})

    cand = partitioned_map_groups(buckets, ["band", "bh"], pairs_part)
    return partitioned_map_groups(
        cand,
        ["id_a", "id_b"],
        lambda part: part.sort_values(["id_a", "id_b"]).drop_duplicates(subset=["id_a", "id_b"]),
    )


# ------------------------ embedding cosine --------------------------


def embedding_dedup(
    emb: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
) -> "ray.data.Dataset":
    """Near-dup by cosine: random-hyperplane sign bucket (LSH), then
    exact cosine within buckets. Pairs with cos ≥ threshold."""
    first = emb.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    p_ref = ray.put(planes)

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        P = ray.get(p_ref)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        signs = (M @ P) > 0
        bucket = (signs * (1 << np.arange(P.shape[1]))).sum(axis=1)
        return pd.DataFrame(
            {id_col: b[id_col], "bucket": bucket, "vec": [r.tolist() for r in M]}
        )

    buckets = emb.map_batches(bucketize, batch_format="pandas")

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        a, b_, c = [], [], []
        for _, g in part.groupby("bucket", sort=False):
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            M = np.stack([np.asarray(v) for v in g["vec"]])
            S = M @ M.T
            ii, jj = np.nonzero(np.triu(S >= threshold, k=1))
            a.extend(ids[ii])
            b_.extend(ids[jj])
            c.extend(S[ii, jj].astype(float))
        return pd.DataFrame({"id_a": a, "id_b": b_, "cosine": c})

    return partitioned_map_groups(buckets, ["bucket"], pairs_part)


def dup_clusters(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Duplicate pairs → connected components → (node, cluster_rep)."""
    from kire_ray.stages.canonicalize import connected_components

    edges = pairs.map_batches(
        lambda b: pd.DataFrame(
            {"src": b["id_a"].astype(str), "dst": b["id_b"].astype(str)}
        ),
        batch_format="pandas",
    )
    return connected_components(edges)


def dedup_corpus(
    docs: "ray.data.Dataset",
    clusters: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Apply near-dup clustering to the corpus: keep every unclustered
    doc plus each cluster's representative (min id) — the actual
    "write the deduplicated training set" step downstream of
    ``dup_clusters``.

    The drop set (clustered non-representatives) is bounded by
    duplicate volume and broadcast once; the corpus itself streams
    through a vectorized membership filter — no shuffle. On a
    dup-heavy crawl where the drop set outgrows a worker, swap the
    broadcast for the bucketed anti-join (``stages/joins.py``), same
    dual-path contract as ``verify_jaccard``.
    """
    lab = clusters.to_pandas()
    if lab.empty or "node" not in lab.columns:
        # clean corpus: dup_clusters found nothing — an empty Dataset's
        # to_pandas() may be column-less (review r5)
        dropped = np.array([], dtype=np.int64)
    else:
        dropped = np.sort(
            lab.loc[lab["node"] != lab["label"], "node"].astype(np.int64).to_numpy()
        )
    ref = ray.put(dropped)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        drop = ray.get(ref)
        if len(drop) == 0:  # clean corpus: nothing to drop (review r5:
            return b        # indexing a size-0 array crashed here)
        ids = b[id_col].to_numpy(np.int64)
        pos = np.searchsorted(drop, ids)
        hit = (pos < len(drop)) & (drop[np.minimum(pos, len(drop) - 1)] == ids)
        return b[~hit].reset_index(drop=True)

    return docs.map_batches(keep, batch_format="pandas")


# ---------------------- substring (span) dedup ----------------------


def _window_hashes_positional(th: np.ndarray, k: int) -> np.ndarray:
    """Positional sliding-window combine of token hashes (the
    non-unique sibling of ``_combine_token_hashes``): hash of the
    window starting at each position 0..len-k. Docs shorter than the
    window emit nothing."""
    if len(th) < k:
        return np.array([], dtype=np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(th, k)
    with np.errstate(over="ignore"):
        h = np.zeros(len(sw), dtype=np.uint64)
        for j in range(k):
            h = h * _SH_MIX + sw[:, j].astype(np.uint64)
    return h


def duplicated_spans(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Cross-document substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — the suffix-array
    pass re-expressed over fixed token windows): find every length-
    ``window`` token sequence that occurs more than once corpus-wide,
    then merge the hit positions into maximal per-doc spans
    ``(doc_id, start_pos, end_pos, n_tokens)`` — the spans a cleaning
    pass would cut.

    Dataflow — two hash exchanges, nothing driver-side: position rows
    (doc, p, window-hash) → exchange on the hash (all rows of a window
    co-locate, so the count>1 filter is a partition-local
    ``value_counts`` — no separate aggregate, no join, and the
    duplicated-window table is never broadcast) → per-doc exchange →
    vectorized island merge (adjacent/overlapping spans coalesce).
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    def positions(b: pd.DataFrame) -> pd.DataFrame:
        ids, ps, hs = [], [], []
        for i, t in zip(b[id_col], b[text_col]):
            h = _window_hashes_positional(hash64_fast(t.split()), window)
            if len(h):
                ids.append(np.full(len(h), i))
                ps.append(np.arange(1, len(h) + 1, dtype=np.int64))  # 1-based
                hs.append(h)
        if not ids:
            return pd.DataFrame(
                {
                    id_col: np.array([], dtype=np.int64),
                    "p": np.array([], dtype=np.int64),
                    "h": np.array([], dtype=np.uint64),
                }
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate(ids),
                "p": np.concatenate(ps),
                "h": np.concatenate(hs),
            }
        )

    pos = docs.map_batches(positions, batch_format="pandas")

    def dup_filter(part: pd.DataFrame) -> pd.DataFrame:
        # the exchange co-located every occurrence of a window hash, so
        # a partition-local count IS the corpus-wide count
        vc = part["h"].value_counts()
        keep = part["h"].isin(vc.index[vc > 1])
        return part.loc[keep, [id_col, "p"]]

    hits = partitioned_map_groups(
        pos, ["h"], dup_filter, num_partitions=num_partitions
    )

    def merge_spans(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame(
                {
                    id_col: np.array([], dtype=np.int64),
                    "start_pos": np.array([], dtype=np.int64),
                    "end_pos": np.array([], dtype=np.int64),
                    "n_tokens": np.array([], dtype=np.int64),
                }
            )
        part = part.sort_values([id_col, "p"])
        doc = part[id_col].to_numpy()
        p = part["p"].to_numpy(dtype=np.int64)
        end = p + window  # exclusive
        # per-doc cummax via the offset trick: lift each doc's values
        # onto a disjoint range, global cummax, then project back
        new_doc = np.concatenate([[True], doc[1:] != doc[:-1]])
        gid = np.cumsum(new_doc) - 1
        base = np.int64(end.max() + 1)
        cm = np.maximum.accumulate(end + gid * base) - gid * base
        prev_end = np.concatenate([[0], cm[:-1]])
        island = new_doc | (p > prev_end)
        sid = np.cumsum(island) - 1
        starts = p[island]
        ends = np.maximum.reduceat(end + gid * base, np.nonzero(island)[0]) - (
            gid[island] * base
        )
        return pd.DataFrame(
            {
                id_col: doc[island],
                "start_pos": starts,
                "end_pos": ends.astype(np.int64),
                "n_tokens": (ends - starts).astype(np.int64),
            }
        )

    return partitioned_map_groups(
        hits, [id_col], merge_spans, num_partitions=num_partitions
    )


# --------------------------- Containment ----------------------------


def containment_dedup(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 100_000,
    broadcast_limit: int = 200_000,
) -> "ray.data.Dataset":
    """Directional containment dedup: pairs ``(id_a, id_b)`` where doc
    a's whole token sequence appears contiguously inside doc b and the
    texts differ (exact duplicates are ``exact_dedup``'s job) — the
    "document swallowed by a larger page" case that Jaccard thresholds
    miss when the container is much longer than the contained doc.

    Blocking: word-aligned containment implies every word 3-gram of a
    is a 3-gram of b, so b must contain a's *rarest* 3-gram (min
    corpus df, tie → gram asc). A single-word block key collapses on
    stop-word-heavy text (measured 405 s at sf0.1 on this corpus's
    30-word vocabulary — every word is a stop word); 3-grams are
    discriminative the way ``ngram_candidates`` relies on. Side A
    emits one (rarest gram, id) row per doc with ≥3 words and rarest
    df ≤ ``df_cap`` (a doc whose every 3-gram is corpus-common has no
    discriminative key; the cap is part of the declared semantics,
    mirrored in SQL — and docs under 3 words are never candidates for
    the contained side); side B emits every distinct (gram, id). One
    hash exchange co-locates each gram's A/B postings and emits
    candidates; texts are attached with two bucketed hash joins
    (materialize between — stacked join operators deadlock at low CPU
    counts, see ``_verify_jaccard_joined``) and verified with a padded
    substring test (single-space-clean text ⇒ padded char containment
    == word alignment). Grams exist only as uint64 hashes — per-word
    hashes mixed across each consecutive triple, never materialized as
    strings (the accepted ~2^-64 collision; tie-break on rarest-gram
    selection is therefore hash-asc rather than gram-asc, which cannot
    change the output: a truly-contained doc's every gram is present in
    its container, so any rarest-gram choice generates the true pair,
    and false candidates are removed by verification). The gram-df
    table is broadcast (same documented trade-off as
    ``tfidf_top_terms`` — switch to a second gram-keyed exchange when
    the gram vocabulary outgrows a worker).
    """
    from kire_ray.functions.hashing import _splitmix, hash64_fast
    from kire_ray.stages.joins import hash_join
    from kire_ray.stages.shuffle import (
        default_partitions,
        grouped_agg,
        partitioned_map_groups,
    )

    P = default_partitions()
    _C1 = np.uint64(0x9E3779B97F4A7C15)
    _C2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def _batch_doc_grams(texts: list) -> tuple[np.ndarray, np.ndarray]:
        """(doc_idx, gram_hash) for every distinct 3-gram per doc, one
        factorize + one bulk word hash per batch — no gram strings."""
        words = [t.split() for t in texts]
        lens = np.fromiter((len(w) for w in words), np.int64, len(words))
        total = int(lens.sum())
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        if total < 3:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for w in words:
            flat[pos : pos + len(w)] = w
            pos += len(w)
        codes, uniq = pd.factorize(flat)
        wh = hash64_fast(np.asarray(uniq, dtype=object))[codes]
        didx = np.repeat(np.arange(len(words), dtype=np.int64), lens)
        valid = didx[:-2] == didx[2:]
        if not valid.any():
            return empty
        g = _splitmix(
            wh[:-2] * _C1 ^ _splitmix(wh[1:-1]) * _C2 ^ wh[2:]
        ).astype(np.int64)[valid]
        ex = pd.DataFrame({"i": didx[:-2][valid], "g": g}).drop_duplicates()
        return ex["i"].to_numpy(), ex["g"].to_numpy()

    def gram_df_partial(b: pd.DataFrame) -> pd.DataFrame:
        _, g = _batch_doc_grams(b[text_col].tolist())
        vc = pd.Series(g).value_counts(sort=False)
        return pd.DataFrame(
            {"g": vc.index.to_numpy(np.int64), "df": vc.to_numpy(np.int64)}
        )

    # per-block partials merged on the driver: the merged table is the
    # gram vocabulary, which is broadcast below anyway, so driver-side
    # summation adds no scale exposure beyond the existing broadcast
    # trade-off — and skips a full exchange (measured 2.4s at sf0.1)
    parts = docs.map_batches(gram_df_partial, batch_format="pandas").to_pandas()
    merged = parts.groupby("g", sort=True)["df"].sum()
    grams_sorted = merged.index.to_numpy(np.int64)
    dfs = merged.to_numpy(np.int64)
    ref = ray.put((grams_sorted, dfs))

    def block_rows(b: pd.DataFrame) -> pd.DataFrame:
        voc, dfarr = ray.get(ref)
        ids = b[id_col].to_numpy()
        di, gh = _batch_doc_grams(b[text_col].tolist())
        if not len(gh):
            return pd.DataFrame(
                {"wh": np.array([], np.int64), "id": np.array([], np.int64),
                 "text_a": np.array([], object)}
            )
        dfv = dfarr[np.searchsorted(voc, gh)]
        # rarest gram per doc: lexsort by (doc, df, hash), first per doc
        srt = np.lexsort((gh, dfv, di))
        first = np.ones(len(srt), bool)
        first[1:] = di[srt][1:] != di[srt][:-1]
        sel = srt[first]
        sel = sel[dfv[sel] <= df_cap]
        # side A (one row per doc, rarest gram) carries the contained-
        # candidate's text so verification needs only ONE downstream
        # text join (on id_b) instead of two; side B rows have text_a
        # = None (is_a ≡ text_a non-null)
        txt = b[text_col].to_numpy(object)
        text_a = np.concatenate(
            [txt[di[sel]], np.full(len(gh), None, dtype=object)]
        )
        return pd.DataFrame(
            {
                "wh": np.concatenate([gh[sel], gh]),
                "id": ids[np.concatenate([di[sel], di])].astype(np.int64),
                "text_a": text_a,
            }
        )

    rows = docs.map_batches(block_rows, batch_format="pandas")

    def gen_pairs(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "text_a": np.array([], dtype=object),
            }
        )
        is_a = part["text_a"].notna().to_numpy()
        a = part[is_a].rename(columns={"id": "id_a"})
        b_ = part[~is_a][["wh", "id"]].rename(columns={"id": "id_b"})
        if a.empty or b_.empty:
            return empty
        m = a.merge(b_, on="wh")
        m = m[m["id_a"] != m["id_b"]]
        if m.empty:
            return empty
        out = m[["id_a", "id_b", "text_a"]].reset_index(drop=True)
        out[["id_a", "id_b"]] = out[["id_a", "id_b"]].astype(np.int64)
        return out

    from kire_ray.stages.joins import normalize_blocks

    _EMPTY = pd.DataFrame(
        {"id_a": np.array([], np.int64), "id_b": np.array([], np.int64)}
    )
    # normalize away the schema-less empty blocks the exchange emits
    # for empty pid groups — Arrow hash joins abort on them
    cand, nc = normalize_blocks(
        partitioned_map_groups(rows, ["wh"], gen_pairs, num_partitions=P)
    )
    if nc == 0:
        return ray.data.from_pandas(_EMPTY)

    def _contained(ta: str, tb: str) -> bool:
        return ta != tb and (" " + ta + " ") in (" " + tb + " ")

    # container-text attach, size-thresholded like verify_jaccard: a
    # driver-sized doc table broadcasts once and verification is a pure
    # map (no join barrier); above the limit the bucketed hash join
    # streams both sides (docs.count() on an untransformed parquet read
    # is a metadata probe, not a scan)
    if docs.count() <= broadcast_limit:
        tdf = docs.select_columns([id_col, text_col]).to_pandas()
        tref = ray.put(dict(zip(tdf[id_col].to_numpy(), tdf[text_col])))

        def verify_bcast(b: pd.DataFrame) -> pd.DataFrame:
            if "text_a" not in b.columns:  # schema-less empty block
                return _EMPTY
            tmap = ray.get(tref)
            keep = np.fromiter(
                (
                    _contained(ta, tmap[ib])
                    for ta, ib in zip(b["text_a"], b["id_b"])
                ),
                dtype=bool,
                count=len(b),
            )
            return b.loc[keep, ["id_a", "id_b"]].reset_index(drop=True).astype(np.int64)

        return cand.map_batches(verify_bcast, batch_format="pandas")

    texts = docs.select_columns([id_col, text_col])

    def rename_b(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={id_col: "id_b", text_col: "text_b"})

    j2 = hash_join(
        cand,
        texts.map_batches(rename_b, batch_format="pandas"),
        on=["id_b"],
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if "text_a" not in b.columns:  # schema-less empty block
            return pd.DataFrame(
                {"id_a": np.array([], np.int64), "id_b": np.array([], np.int64)}
            )
        keep = np.fromiter(
            (_contained(ta, tb) for ta, tb in zip(b["text_a"], b["text_b"])),
            dtype=bool,
            count=len(b),
        )
        out = b.loc[keep, ["id_a", "id_b"]].reset_index(drop=True)
        return out.astype(np.int64)

    return j2.map_batches(verify, batch_format="pandas")


def setsim_join(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Exact, COMPLETE set-similarity self-join: every pair of docs
    whose word-``ngram`` sets have Jaccard ≥ ``threshold`` — no
    blocking cap, no candidate recall loss (contrast
    ``ngram_jaccard_dedup``, whose rare-gram blocking is exhaustive
    only within its ``df_cap``).

    AllPairs/PPJoin prefix filtering (Bayardo et al., WWW 2007; Xiao
    et al., WWW 2008): order each doc's grams by a global total order
    (corpus df asc, then gram hash asc — any consistent total order
    preserves completeness), keep the first ``n − ⌈τ·n⌉ + 1`` as the
    doc's *prefix*; two docs with Jaccard ≥ τ must share a prefix
    gram. One hash exchange on prefix grams co-locates candidates;
    the PPJoin length filter (τ·|a| ≤ |b|) prunes in-reducer before
    the exact sorted-set intersection verifies each pair; a second
    exchange makes pairs distinct. Each prefix row carries its doc's
    sorted gram-hash set (bytes), so verification happens where the
    candidate is generated — no text joins. The payload duplication
    factor is the prefix length (≈ (1−τ)·n + 1 rows/doc); at lower
    thresholds the positional filter of PPJoin is the documented
    scale path. Ordering prefixes by df asc means common grams almost
    never act as block keys, which is what bounds posting lists on a
    skewed corpus.

    Output (id_a < id_b): n_common, n_union, jaccard (half-up 6dp for
    SQL parity). Oracle: brute-force distinct-gram self-join — the
    completeness guarantee is exactly what makes this operator
    SQL-equivalent without mirroring the blocking.
    """
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import partitioned_map_groups

    def doc_sets(b: pd.DataFrame) -> pd.DataFrame:
        ids, sets = [], []
        for i, t in zip(b[id_col], b[text_col]):
            if len(t.split()) < ngram:
                continue
            ids.append(i)
            sets.append(_shingles(t, ngram))  # sorted unique uint64
        return pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                "sh": [s.tobytes() for s in sets],
            }
        )

    sets_ds = docs.map_batches(doc_sets, batch_format="pandas").materialize()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"g": np.array([], np.int64), "df": np.array([], np.int64)}
            )
        allg = np.concatenate(
            [np.frombuffer(s, dtype=np.uint64) for s in b["sh"]]
        )
        vc = pd.Series(allg.view(np.int64)).value_counts(sort=False)
        return pd.DataFrame(
            {"g": vc.index.to_numpy(np.int64), "df": vc.to_numpy(np.int64)}
        )

    # driver merge of per-block partials: the merged table is the gram
    # vocabulary, broadcast below anyway (same trade-off as
    # containment_dedup / tfidf_top_terms)
    parts = sets_ds.map_batches(df_partial, batch_format="pandas").to_pandas()
    merged = parts.groupby("g", sort=True)["df"].sum()
    ref = ray.put((merged.index.to_numpy(np.int64), merged.to_numpy(np.int64)))

    def prefix_rows(b: pd.DataFrame) -> pd.DataFrame:
        voc, dfarr = ray.get(ref)
        gs, ids, shs, ns = [], [], [], []
        for i, s in zip(b[id_col], b["sh"]):
            sh = np.frombuffer(s, dtype=np.uint64)
            n = len(sh)
            p = n - int(np.ceil(threshold * n)) + 1
            g64 = sh.view(np.int64)
            dfv = dfarr[np.searchsorted(voc, g64)]
            pref = g64[np.lexsort((g64, dfv))[:p]]
            gs.append(pref)
            ids.append(np.full(p, i, dtype=np.int64))
            shs.extend([s] * p)
            ns.append(np.full(p, n, dtype=np.int64))
        if not gs:
            return pd.DataFrame(
                {"g": np.array([], np.int64), "id": np.array([], np.int64),
                 "sh": np.array([], object), "n": np.array([], np.int64)}
            )
        return pd.DataFrame(
            {
                "g": np.concatenate(gs),
                "id": np.concatenate(ids),
                "sh": np.asarray(shs, dtype=object),
                "n": np.concatenate(ns),
            }
        )

    rows = sets_ds.map_batches(prefix_rows, batch_format="pandas")

    _EMPTY = pd.DataFrame(
        {
            "id_a": np.array([], np.int64),
            "id_b": np.array([], np.int64),
            "n_common": np.array([], np.int64),
            "n_union": np.array([], np.int64),
            "jaccard": np.array([], np.float64),
        }
    )

    def gen_verified(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) < 2:
            return _EMPTY
        m = part.merge(part, on="g", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        # PPJoin length filter: J >= tau forces tau*|a| <= |b| (id-
        # agnostic, so apply both directions)
        na, nb = m["n_a"].to_numpy(), m["n_b"].to_numpy()
        m = m[(threshold * na <= nb) & (threshold * nb <= na)]
        m = m.drop_duplicates(["id_a", "id_b"])
        if m.empty:
            return _EMPTY
        inter = np.empty(len(m), dtype=np.int64)
        for i, (sa, sb) in enumerate(zip(m["sh_a"], m["sh_b"])):
            inter[i] = len(
                np.intersect1d(
                    np.frombuffer(sa, dtype=np.uint64),
                    np.frombuffer(sb, dtype=np.uint64),
                    assume_unique=True,
                )
            )
        union = m["n_a"].to_numpy(np.int64) + m["n_b"].to_numpy(np.int64) - inter
        jac = inter / np.maximum(union, 1)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "id_a": m["id_a"].to_numpy(np.int64)[keep],
                "id_b": m["id_b"].to_numpy(np.int64)[keep],
                "n_common": inter[keep],
                "n_union": union[keep],
                "jaccard": round_half_up(jac[keep], 6),
            }
        )

    verified = partitioned_map_groups(rows, ["g"], gen_verified)
    return partitioned_map_groups(
        verified, ["id_a", "id_b"], lambda p: p.drop_duplicates(["id_a", "id_b"])
    )


def fuzzy_pairs(
    ds: "ray.data.Dataset",
    *,
    col: str = "c_name",
) -> "ray.data.Dataset":
    """Fuzzy string self-match: all pairs of DISTINCT values of
    ``col`` at Levenshtein distance exactly 1 — the blocking step of
    entity resolution / typo-cluster dedup.

    Deletion-neighborhood blocking (complete for distance ≤ 1, the
    SymSpell/FastSS construction): every value emits itself plus each
    single-character deletion as uint64 bucket keys; two strings
    within distance 1 necessarily share a variant (substitution →
    same deletion position; indel → one string IS a deletion of the
    other), so one hash exchange on the variant key generates every
    true pair. Shared variants can also join distance-2 pairs
    ("ab"/"ba"), so the reducer verifies with an O(len) two-pointer
    distance-≤1 check, then a second exchange makes pairs distinct.
    Variant generation is per-string by nature (strings are a few
    bytes; the emitted key column is the vectorized part) — cost is
    (len+1) keys per distinct value, the documented fan-out of this
    blocking.
    """
    from kire_ray.functions.hashing import hash64_fast
    from kire_ray.stages.shuffle import partitioned_map_groups

    # block-local dedup only — a name duplicated ACROSS blocks emits
    # duplicate (k, name) rows, but they land in the same k-partition
    # where ``gen`` dedups them before pairing, so the global distinct
    # exchange this used to run was pure overhead (3 → 2 exchanges,
    # 3.1 → 1.6 s warm at sf0.1)
    distinct = ds.select_columns([col]).map_batches(
        lambda b: b.drop_duplicates(), batch_format="pandas"
    )

    def variants(b: pd.DataFrame) -> pd.DataFrame:
        names: list[str] = []
        keys: list[str] = []
        for s in b[col]:
            vs = [s] + [s[:i] + s[i + 1 :] for i in range(len(s))]
            keys.extend(vs)
            names.extend([s] * len(vs))
        return pd.DataFrame(
            {
                "k": hash64_fast(np.asarray(keys, dtype=object)).astype(np.int64),
                "name": np.asarray(names, dtype=object),
            }
        ).drop_duplicates()

    rows = distinct.map_batches(variants, batch_format="pandas")

    def _dist_le1(a: str, b: str) -> bool:
        la, lb = len(a), len(b)
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if abs(la - lb) != 1:
            return False
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = used = 0
        while i < la and j < lb:
            if a[i] == b[j]:
                i += 1
                j += 1
            elif used:
                return False
            else:
                used = 1
                j += 1
        return True

    _EMPTY = pd.DataFrame(
        {"name_a": np.array([], object), "name_b": np.array([], object)}
    )

    def gen(part: pd.DataFrame) -> pd.DataFrame:
        p = part.drop_duplicates()
        m = p.merge(p, on="k", suffixes=("_a", "_b"))
        m = m[m["name_a"] < m["name_b"]].drop_duplicates(["name_a", "name_b"])
        if m.empty:
            return _EMPTY
        keep = np.fromiter(
            (_dist_le1(a, b) for a, b in zip(m["name_a"], m["name_b"])),
            dtype=bool,
            count=len(m),
        )
        return m.loc[keep, ["name_a", "name_b"]].reset_index(drop=True)

    pairs = partitioned_map_groups(rows, ["k"], gen)
    return partitioned_map_groups(
        pairs, ["name_a", "name_b"], lambda p: p.drop_duplicates()
    )


def span_dedup_corpus(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 8,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """C4-style span-level corpus rewrite (Raffel et al. 2020, §2.2:
    "we discarded all but one of any three-sentence span occurring more
    than once" — re-expressed over fixed ``span_words``-word windows
    because this corpus has no sentence boundaries): split every
    document into consecutive non-overlapping word spans, keep only the
    corpus-wide FIRST occurrence of each distinct span (lexicographic
    min ``(doc_id, span_no)``), and reassemble each document from its
    surviving spans. The sibling of :func:`duplicated_spans` — that one
    *marks* duplicated regions, this one *rewrites* the corpus.

    Dataflow — two hash exchanges, nothing driver-side, both sides
    stream:

      explode (vectorized long-frame spanning, a block-local
      first-occurrence combiner bounds the exchange)
        → exchange on span text  (winner per span = min (doc, span_no))
        → exchange on doc_id     (ordered reassembly + keep counts)

    Returns ``(doc_id, text, n_spans, n_kept)`` for documents with at
    least one surviving span. Every column is replayable in SQL
    (window ``row_number`` over ``(doc_id, span_no)`` per span), so the
    driver verifies the rewritten corpus value-for-value.
    """

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        words = b[text_col].str.split()
        nw = words.map(len).to_numpy(dtype=np.int64)
        n_spans = -(-nw // span_words)  # ceil; 0 for empty docs
        empty = pd.DataFrame(
            {
                id_col: np.array([], dtype=np.int64),
                "span_no": np.array([], dtype=np.int64),
                "span": pd.Series([], dtype=object),
                "n_spans": np.array([], dtype=np.int64),
            }
        )
        if not len(b) or n_spans.sum() == 0:
            return empty
        # long frame: one row per word, grouped into (doc, span_no)
        flat = np.concatenate(
            [np.asarray(w, dtype=object) for w in words if len(w)]
        )
        doc_per_word = np.repeat(b[id_col].to_numpy(), nw)
        word_idx = np.concatenate([np.arange(n) for n in nw if n])
        g = pd.DataFrame(
            {
                id_col: doc_per_word,
                "span_no": word_idx // span_words,
                "w": flat,
            }
        )
        spans = (
            g.groupby([id_col, "span_no"], sort=False)["w"]
            .agg(" ".join)
            .reset_index()
            .rename(columns={"w": "span"})
        )
        spans["n_spans"] = spans[id_col].map(
            pd.Series(n_spans, index=b[id_col].to_numpy())
        )
        # block-local combiner: drop within-block later occurrences so
        # the exchange ships one row per distinct span per block
        spans = spans.sort_values([id_col, "span_no"], kind="stable")
        return spans.drop_duplicates("span", keep="first")

    exploded = docs.map_batches(explode, batch_format="pandas")

    def first_occurrence(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([id_col, "span_no"], kind="stable")
        return part.drop_duplicates("span", keep="first")

    winners = partitioned_map_groups(
        exploded, ["span"], first_occurrence, num_partitions=num_partitions
    )

    def reassemble(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([id_col, "span_no"], kind="stable")
        g = part.groupby(id_col, sort=False)
        out = g["span"].agg(" ".join).reset_index().rename(columns={"span": "text"})
        out["n_spans"] = g["n_spans"].first().to_numpy().astype(np.int32)
        out["n_kept"] = g.size().to_numpy().astype(np.int32)
        return out

    return partitioned_map_groups(
        winners, [id_col], reassemble, num_partitions=num_partitions
    )


def incremental_dedup(
    prior: "ray.data.Dataset",
    new: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Continuous-ingest dedup: which ``new`` documents are unseen
    against an already-ingested ``prior`` corpus (and against each
    other — first id wins within a duplicate group of new docs).

    ONE grouped exchange on the content hash co-locates every
    occurrence of a text across both corpora; the reducer keeps the min
    new id of groups with zero prior members. Neither corpus is
    broadcast or collected — both stream, so the prior side can be the
    full 100 TB history (in production it would be the persisted hash
    column of earlier ingest runs, read without the payload). md5 is
    the content hash so the surviving set is SQL-verifiable.
    """
    import hashlib

    def keyed(flag: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "h": [
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in b[text_col]
                    ],
                    id_col: b[id_col].to_numpy(),
                    "is_prior": np.int8(flag),
                }
            )

        return fn

    both = prior.map_batches(keyed(1), batch_format="pandas").union(
        new.map_batches(keyed(0), batch_format="pandas")
    )

    def keep(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("h", sort=False).agg(
            n_prior=("is_prior", "sum"), first_new=(id_col, "min")
        )
        fresh = g[g["n_prior"] == 0]
        return pd.DataFrame({id_col: fresh["first_new"].astype(np.int64).to_numpy()})

    return partitioned_map_groups(both, ["h"], keep)


def bow_dedup(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Word-order-invariant duplicate groups: two documents collide iff
    their DISTINCT word sets are equal (bag-of-words dedup — catches
    shuffled/reordered copies that exact hash dedup misses and full
    MinHash doesn't need). Key = md5 of the sorted distinct words,
    mirrored verbatim in SQL via
    ``md5(array_to_string(list_sort(list_distinct(string_split(..))),' '))``.

    Shape: the ``exact_dedup`` single content-hash exchange — per-block
    (key → min id, count) combiner, one grouped exchange, groups of
    size ≥ 2 survive. Returns (doc_id = representative min id, n_docs,
    n_distinct_words)."""
    import hashlib

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys, ndw = [], []
        for t in b[text_col]:
            ws = sorted(set(t.split()))
            keys.append(hashlib.md5(" ".join(ws).encode()).hexdigest())
            ndw.append(len(ws))
        g = (
            pd.DataFrame({"k": keys, id_col: b[id_col], "ndw": ndw})
            .groupby("k", sort=False)
            .agg(doc_id=(id_col, "min"), n_docs=(id_col, "size"), ndw=("ndw", "min"))
            .reset_index()
        )
        return g

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out = out[out["n_docs"] >= 2].drop(columns=["k"])
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "n_docs": out["n_docs"].astype(np.int64),
                "n_distinct_words": out["ndw"].astype(np.int64),
            }
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["k"],
        {"doc_id": ("doc_id", "min"), "n_docs": ("n_docs", "sum"), "ndw": ("ndw", "min")},
        post=post,
    )


def ngram_novelty(
    prior: "ray.data.Dataset",
    new: "ray.data.Dataset",
    *,
    n: int = 3,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Corpus freshness at the n-gram level: how many of the incoming
    shard's DISTINCT word n-grams were never seen in the ingested
    history — the novelty-rate signal next to ``incremental_dedup``'s
    doc-level view (a batch can be 0% duplicate docs yet add almost no
    new n-grams). Returns ONE row: (n_prior_grams, n_new_grams,
    n_novel_grams, novelty_rate).

    Shape: per-block distinct (side, gram) combiner → ONE grouped
    exchange on the gram string → per-partition presence classify →
    constant-size partial sums. Both corpora stream; at 100 TB the
    history side is the persisted gram-hash column of earlier runs."""

    def grams(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            seen: set = set()
            for t in b[text_col]:
                ws = t.split()
                for i in range(len(ws) - n + 1):
                    seen.add(" ".join(ws[i : i + n]))
            return pd.DataFrame(
                {"gram": sorted(seen), "side": np.int64(side)}
            ).drop_duplicates()

        return fn

    from kire_ray.stages.shuffle import partitioned_map_groups

    tagged = prior.map_batches(grams(0), batch_format="pandas").union(
        new.map_batches(grams(1), batch_format="pandas")
    )

    def classify(p: pd.DataFrame) -> pd.DataFrame:
        g = p.drop_duplicates().groupby("gram", sort=False)["side"]
        has_prior = g.min() == 0
        has_new = g.max() == 1
        return pd.DataFrame(
            {
                "n_prior_grams": [int(has_prior.sum())],
                "n_new_grams": [int(has_new.sum())],
                "n_novel_grams": [int((has_new & ~has_prior).sum())],
            }
        )

    parts = partitioned_map_groups(tagged, ["gram"], classify)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        from kire_ray.functions.rounding import round_half_up

        tot = b.sum()
        npr, nn, nv = (
            int(tot["n_prior_grams"]),
            int(tot["n_new_grams"]),
            int(tot["n_novel_grams"]),
        )
        return pd.DataFrame(
            {
                "n_prior_grams": np.array([npr], dtype=np.int64),
                "n_new_grams": np.array([nn], dtype=np.int64),
                "n_novel_grams": np.array([nv], dtype=np.int64),
                "novelty_rate": round_half_up(
                    np.array([nv / nn if nn else 0.0]), 6
                ),
            }
        )

    return ray.data.from_pandas(finish(parts.to_pandas()))


def _jaro(s1: str, s2: str) -> float:
    """Jaro similarity (Jaro 1989) — matching window
    max(|s1|,|s2|)//2 - 1, transpositions = half the matched-order
    mismatches. Bit-parity with DuckDB's jaro_similarity verified in
    tests (both follow the RapidFuzz/Winkler reference)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jaro_winkler(s1: str, s2: str) -> float:
    """Winkler's prefix boost (Winkler 1990): applied only above the
    0.7 Jaro threshold, common prefix capped at 4 — the exact variant
    DuckDB's ``jaro_winkler_similarity`` implements."""
    j = _jaro(s1, s2)
    if j > 0.7:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j += l * 0.1 * (1.0 - j)
    return j


def sorted_neighborhood_jw(
    ds: "ray.data.Dataset",
    *,
    col: str = "c_name",
    window: int = 6,
    threshold: float = 0.96,
    prefix_len: int = 16,
) -> "ray.data.Dataset":
    """Sorted-neighborhood entity-resolution blocking (Hernández &
    Stolfo 1995) scored with Jaro–Winkler: every pair of distinct
    values within ``window`` positions of each other in global sort
    order, kept at similarity ≥ ``threshold``. Candidate count is
    n·(window−1) — LINEAR in the corpus, the whole point of the
    method vs the quadratic all-pairs join.

    Distributed shape — an ordered range partition with a boundary
    halo, and exact global ranks WITHOUT a global sort:
    - bucket = value[:prefix_len] (prefix order ≡ sort order, so each
      bucket is a contiguous rank range); ONE exchange on bucket
      dedups and sorts locally;
    - a bucket-bounded stats pass (count + last window−1 values per
      bucket) feeds a driver prefix scan that assigns each bucket its
      rank offset and its halo — the trailing window−1 values of the
      preceding non-empty buckets, walked backwards so short buckets
      borrow further; O(n_buckets · window) driver state;
    - pass 2 re-reads each bucket, prepends its halo, and enumerates
      window pairs vectorized; only pairs whose RIGHT element is a
      real (non-halo) member are emitted, so boundary pairs appear
      exactly once.

    The per-pair Jaro–Winkler itself is per-string Python (string
    dynamic programming has no Arrow kernel) over the linear candidate
    set — the same bounded concession as the engine's md5 derivations.
    """
    from kire_ray.functions.rounding import round_half_up

    W = window - 1

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"name": b[col], "bucket": b[col].str.slice(0, prefix_len)}
        ).drop_duplicates()

    def per_bucket_distinct(p: pd.DataFrame) -> pd.DataFrame:
        out = p.drop_duplicates(subset=["name"]).sort_values("name")
        return out[["bucket", "name"]]

    distinct = partitioned_map_groups(
        ds.map_batches(add_bucket, batch_format="pandas"),
        ["bucket"],
        per_bucket_distinct,
    ).materialize()

    def bucket_stats(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bk, g in b.groupby("bucket", sort=False):
            names = g["name"].sort_values().to_numpy()
            # W == 0 (window=1: no pairs possible) must emit an empty
            # tail — names[-0:] would ship the ENTIRE bucket to driver
            rows.append((bk, len(names), "\x1f".join(names[-W:] if W else [])))
        return pd.DataFrame(rows, columns=["bucket", "n", "tail"])

    stats = (
        # batch_size=None → whole blocks; a bucket never splits across
        # pid blocks, so every stats row sees its complete bucket
        distinct.map_batches(
            bucket_stats, batch_format="pandas", batch_size=None
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    offsets: dict[str, int] = {}
    halos: dict[str, tuple[list[str], list[int]]] = {}
    run = 0
    tails: list[tuple[str, int]] = []  # (name, rank) ascending
    for _, row in stats.iterrows():
        offsets[row["bucket"]] = run
        halo = tails[-W:] if W else []
        halos[row["bucket"]] = ([t[0] for t in halo], [t[1] for t in halo])
        names = row["tail"].split("\x1f") if row["tail"] else []
        first_rank = run + row["n"] - len(names)
        tails.extend((nm, first_rank + i) for i, nm in enumerate(names))
        tails = tails[-W:] if W else []
        run += int(row["n"])
    ref = ray.put((offsets, halos))

    def pairs(p: pd.DataFrame) -> pd.DataFrame:
        offs, hls = ray.get(ref)
        out_a, out_b, raw = [], [], []
        for bk, g in p.groupby("bucket", sort=False):
            names = g["name"].sort_values().to_list()
            hn, hr = hls[bk]
            full = hn + names
            ranks = hr + list(range(offs[bk], offs[bk] + len(names)))
            h = len(hn)
            for j in range(h, len(full)):
                for i in range(j - 1, -1, -1):
                    if ranks[j] - ranks[i] > W:
                        break
                    out_a.append(full[i])
                    out_b.append(full[j])
                    raw.append(_jaro_winkler(full[i], full[j]))
        s = round_half_up(np.asarray(raw, dtype=np.float64), 6)
        keep = s >= threshold
        return pd.DataFrame(
            {
                "name_a": np.asarray(out_a, dtype=object)[keep],
                "name_b": np.asarray(out_b, dtype=object)[keep],
                "jw": s[keep],
            }
        )

    return distinct.map_batches(
        pairs, batch_format="pandas", batch_size=None
    )
