"""Similarity search over an embedding column (list<float>).

- ``ann_brute_force`` — exact cosine top-k: per-batch numpy matmul
  against a broadcast query matrix, per-batch partial top-k, then one
  tiny groupby(query) merge.  Shuffle volume = O(n_queries × k ×
  n_blocks), never the corpus.
- ``ann_lsh`` — scale path: random-hyperplane sign buckets; queries
  probe only their own bucket (+ optional multi-probe by flipping one
  bit). Recall < 1 by construction; the bench reports recall vs the
  brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _norm_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def ann_brute_force(
    emb: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Exact cosine top-k for each query row. Returns
    (query_id, vec_id, cosine, rank) with rank 0..k-1 (desc cosine,
    id-ascending tie-break → fully deterministic)."""
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(Q)

    def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        M = _norm_rows(np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]]))
        ids = b[id_col].to_numpy()
        S = Qm @ M.T  # (n_q, n_batch)
        kk = min(k, S.shape[1])
        out_q, out_id, out_c = [], [], []
        for qi in range(S.shape[0]):
            idx = np.argpartition(-S[qi], kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx])
            out_c.extend(S[qi][idx])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "cosine": out_c})

    partials = emb.map_batches(partial_topk, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _md5_rademacher(dim: int, n_planes: int) -> np.ndarray:
    """±1 (Rademacher) sign-random-projection planes derived from md5 —
    the SRP-LSH guarantee only needs symmetric i.i.d. plane entries,
    and an md5 basis makes every bucket bit reconstructible in SQL."""
    import hashlib

    P = np.empty((dim, n_planes), dtype=np.int64)
    for d in range(dim):
        for p in range(n_planes):
            bit = int(hashlib.md5(f"{d}_{p}".encode("utf-8")).hexdigest()[0], 16) & 1
            P[d, p] = 1 if bit else -1
    return P


def _quantize(M: np.ndarray) -> np.ndarray:
    """floor(x*1e6 + 0.5) int64 — the exact-integer domain in which
    bucket dot products are computed so numpy and DuckDB agree
    bit-for-bit (float summation order can flip a sign at the margin;
    integer sums cannot)."""
    return np.floor(M * 1e6 + 0.5).astype(np.int64)


def ann_lsh(
    emb: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
) -> "ray.data.Dataset":
    """LSH-bucketed approximate top-k: only candidates within Hamming
    distance 2 of the query's sign-bucket are scored (multi-probe r=2).

    Buckets come from md5-derived ±1 planes over 1e-6-quantized raw
    embeddings — exact integer arithmetic, so the candidate set (and
    hence the result) is reconstructible in DuckDB SQL via
    ``bit_count(xor(bucket_a, bucket_b)) <= 2``; cosines are computed
    on the unquantized vectors as usual.
    """
    Qraw = np.asarray(queries, dtype=np.float64)
    Q = _norm_rows(Qraw)
    dim = Q.shape[1]
    planes = _md5_rademacher(dim, n_planes)
    qb = ((_quantize(Qraw) @ planes) > 0).astype(np.int64)
    q_buckets = (qb * (1 << np.arange(n_planes))).sum(axis=1)
    # multi-probe radius 2: query bucket + all 1- and 2-bit flips (the
    # recall/cost knob; radius 2 of 6 planes probes 22/64 buckets)
    probe: dict[int, list[int]] = {}
    for qi, bkt in enumerate(q_buckets):
        cands = {int(bkt)}
        for b in range(n_planes):
            cands.add(int(bkt) ^ (1 << b))
            for b2 in range(b + 1, n_planes):
                cands.add(int(bkt) ^ (1 << b) ^ (1 << b2))
        for cand in cands:
            probe.setdefault(cand, []).append(qi)
    p_ref = ray.put((planes, probe, Q))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        P, pr, Qm = ray.get(p_ref)
        Mraw = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        M = _norm_rows(Mraw)
        ids = b[id_col].to_numpy()
        signs = (_quantize(Mraw) @ P) > 0
        buckets = (signs * (1 << np.arange(P.shape[1]))).sum(axis=1)
        out_q, out_id, out_c = [], [], []
        for bkt in np.unique(buckets):
            qis = pr.get(int(bkt))
            if not qis:
                continue
            mask = buckets == bkt
            sub, sub_ids = M[mask], ids[mask]
            S = Qm[qis] @ sub.T
            kk = min(k, S.shape[1])
            for row, qi in enumerate(qis):
                idx = np.argpartition(-S[row], kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(sub_ids[idx])
                out_c.extend(S[row][idx])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "cosine": out_c})

    partials = emb.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col])
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd iterations on a driver-side sample: init =
    first n_centroids sample rows (sample order is deterministic)."""
    C = sample[:n_centroids].copy()
    for _ in range(iters):
        assign = (sample @ C.T).argmax(axis=1)
        for c in range(len(C)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ann_ivf(
    emb: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
) -> "ray.data.Dataset":
    """IVF approximate top-k — the scale path beyond sign-LSH: k-means
    centroids fit once on a driver-side sample (bounded, deterministic),
    broadcast; every batch assigns its vectors to their nearest centroid
    and scores only the vectors whose cell is among each query's
    ``n_probe`` closest cells. Recall/cost knob = n_probe/n_centroids."""
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    # to_pandas: the block-concat collect (take_all's per-row-dict path
    # costs ~0.6 ms/row — measurable even on a 2k sample)
    sample_df = emb.limit(sample_size).to_pandas()
    S = _norm_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample_df[vec_col]])
    )
    C = _kmeans_fit(S, n_centroids)
    if len(sample_df) < sample_size:
        # small-data guard: the whole dataset fit in the centroid-fit
        # sample, so widening the probe costs almost nothing while cells
        # are tiny (recall at sf0.01 was 0.85 at n_probe=4/16)
        n_probe = max(n_probe, n_centroids // 2)
    q_probe = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (n_q, n_probe)
    ref = ray.put((C, Q, q_probe))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        Cm, Qm, probe = ray.get(ref)
        M = _norm_rows(np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]]))
        ids = b[id_col].to_numpy()
        cell = (M @ Cm.T).argmax(axis=1)
        out_q, out_id, out_c = [], [], []
        for qi in range(Qm.shape[0]):
            mask = np.isin(cell, probe[qi])
            if not mask.any():
                continue
            sub, sub_ids = M[mask], ids[mask]
            s = Qm[qi] @ sub.T
            kk = min(k, len(sub_ids))
            idx = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(sub_ids[idx])
            out_c.extend(s[idx])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "cosine": out_c})

    partials = emb.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col])
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ann_recall(approx: "ray.data.Dataset", exact: "ray.data.Dataset", id_col="vec_id") -> float:
    """Recall@k of an approximate result vs the brute-force baseline."""
    a = approx.to_pandas()
    e = exact.to_pandas()
    hits = tot = 0
    for qid, ge in e.groupby("query_id"):
        truth = set(ge[id_col])
        got = set(a[a["query_id"] == qid][id_col])
        hits += len(truth & got)
        tot += len(truth)
    return hits / max(tot, 1)


def bm25_search(
    ds: "ray.data.Dataset",
    queries: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Okapi BM25 top-``k`` document retrieval for a fixed query set —
    the lexical sibling of ``ann_brute_force`` (keyword search over a
    corpus, e.g. decontamination probes or eval-set retrieval).

    Distributed shape (reference parity: KIRE's alias/keyword scans are
    sequential dict lookups, e.g. ATLOP+KIRE/gen_kg_data.py; here the
    corpus never leaves the workers):

    - pass 1 — one vectorized ``map_batches`` emits per-block partials
      of (df per query term, doc count, token count); the exchanged
      table is O(n_terms × n_blocks), never the corpus, and is summed
      into a tiny broadcast stats tuple (``ray.put`` once).
    - pass 2 — per-batch explode→filter-to-query-terms→grouped tf,
      score every (query, doc) pair locally, keep a per-block partial
      top-k, then merge per query (shuffle volume O(n_q × k × blocks)).

    IDF = ln((N - df + 0.5)/(df + 0.5) + 1)  (Lucene's non-negative
    variant).  Returns (query_id, doc_id, score, rank), rank 1..k by
    (score desc, doc_id asc) — fully deterministic.
    """
    from kire_ray.functions.rounding import round_half_up

    q_terms = [sorted(set(q.split())) for q in queries]
    vocab = np.array(sorted({t for ts in q_terms for t in ts}), dtype=object)

    def partial_stats(batch: pd.DataFrame) -> pd.DataFrame:
        ws = batch[text_col].str.split()
        lens = ws.map(len).to_numpy(dtype=np.int64)
        flat = (
            np.concatenate([np.asarray(w, dtype=object) for w in ws])
            if lens.sum()
            else np.array([], dtype=object)
        )
        pos = np.searchsorted(vocab, flat)
        in_vocab = (pos < len(vocab)) & (vocab[np.minimum(pos, len(vocab) - 1)] == flat)
        doc_idx = np.repeat(np.arange(len(batch)), lens)
        hit = pd.DataFrame({"t": pos[in_vocab], "d": doc_idx[in_vocab]})
        df_partial = hit.drop_duplicates().groupby("t").size()
        df_arr = df_partial.reindex(range(len(vocab)), fill_value=0).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "term_idx": np.arange(len(vocab) + 1, dtype=np.int64),
                "n": np.concatenate([df_arr, [len(batch)]]),
                "len_sum": np.concatenate(
                    [np.zeros(len(vocab), dtype=np.int64), [int(lens.sum())]]
                ),
            }
        )

    stats = (
        ds.map_batches(partial_stats, batch_format="pandas")
        .to_pandas()
        .groupby("term_idx")
        .sum()
    )
    n_docs = int(stats.loc[len(vocab), "n"])
    avgdl = float(stats.loc[len(vocab), "len_sum"]) / n_docs
    df_tot = stats["n"].reindex(range(len(vocab)), fill_value=0).to_numpy(np.float64)
    idf = np.log((n_docs - df_tot + 0.5) / (df_tot + 0.5) + 1.0)
    ref = ray.put((vocab, idf, avgdl))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        voc, idf_arr, adl = ray.get(ref)
        ws = batch[text_col].str.split()
        lens = ws.map(len).to_numpy(dtype=np.int64)
        ids = batch[id_col].to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame(
                {"query_id": [], id_col: [], "score": []}
            ).astype({"query_id": np.int64, id_col: np.int64, "score": np.float64})
        flat = np.concatenate([np.asarray(w, dtype=object) for w in ws])
        pos = np.searchsorted(voc, flat)
        in_vocab = (pos < len(voc)) & (voc[np.minimum(pos, len(voc) - 1)] == flat)
        doc_idx = np.repeat(np.arange(len(batch)), lens)
        tf = (
            pd.DataFrame({"t": pos[in_vocab], "d": doc_idx[in_vocab]})
            .groupby(["d", "t"])
            .size()
            .rename("tf")
            .reset_index()
        )
        dl = lens[tf["d"].to_numpy()]
        tfv = tf["tf"].to_numpy(np.float64)
        # per-(doc, term) partial BM25 weight
        w = idf_arr[tf["t"].to_numpy()] * (
            tfv * (k1 + 1.0) / (tfv + k1 * (1.0 - b + b * dl / adl))
        )
        out = []
        term_col = tf["t"].to_numpy()
        for qi, terms in enumerate(q_terms):
            tsel = np.isin(term_col, np.searchsorted(voc, terms))
            if not tsel.any():
                continue
            per_doc = (
                pd.DataFrame({"d": tf["d"].to_numpy()[tsel], "w": w[tsel]})
                .groupby("d")["w"]
                .sum()
                .reset_index()
            )
            per_doc[id_col] = ids[per_doc["d"].to_numpy()]
            top = per_doc.sort_values(
                ["w", id_col], ascending=[False, True], kind="stable"
            ).head(k)
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.int64(qi),
                        id_col: top[id_col].to_numpy(),
                        "score": top["w"].to_numpy(),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": [], id_col: [], "score": []}
            ).astype({"query_id": np.int64, id_col: np.int64, "score": np.float64})
        return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="stable")
        g = g.head(k).reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype(np.int64),
                id_col: g[id_col].astype(np.int64),
                "score": round_half_up(g["score"], 6),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def label_centroids(
    emb: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> "ray.data.Dataset":
    """Per-label centroid of an embedding column, flattened to
    (label, dim, mean, n) rows — the cluster-statistics pass of an
    embedding-space pipeline (domain drift monitoring, IVF cell audit,
    class prototypes for distillation).

    Distributed shape: each batch reduces to one partial-sum row per
    (label, dim) via a single float64 matmul-free ``np.add.at``; the
    exchange is O(labels × dims × blocks), never the corpus, summed by
    the grouped exchange and divided once. SQL-verifiable: unnest the
    list column with its index and avg per (label, dim).
    """
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        labels, inv = np.unique(b[label_col].to_numpy(), return_inverse=True)
        d = M.shape[1]
        sums = np.zeros((len(labels), d), dtype=np.float64)
        np.add.at(sums, inv, M)
        cnt = np.bincount(inv, minlength=len(labels)).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(labels.astype(np.int64), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(labels)),
                "s": sums.ravel(),
                "n": np.repeat(cnt, d),
            }
        )

    agg = grouped_agg(
        emb.map_batches(partial, batch_format="pandas"),
        ["label", "dim"],
        {"s": ("s", "sum"), "n": ("n", "sum")},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "label": b["label"].astype(np.int64),
                "dim": b["dim"].astype(np.int64),
                "mean": round_half_up(b["s"] / b["n"], 6),
                "n": b["n"].astype(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def inverted_index(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> "ray.data.Dataset":
    """Distributed inverted-index build (the batch counterpart of
    ``bm25_search``'s query-time scan): term → document frequency +
    posting list, the classic MapReduce index construction.

    Per-block combiner emits (word, doc_id, tf) — exact per doc, since
    a document never spans blocks — then ONE exchange on word
    co-locates each term's postings and the reducer serializes them as
    ``"doc:tf,..."`` sorted by doc id. Shuffle volume is O(distinct
    (doc, word)), i.e. the index size, never the corpus text. At 100 TB
    the posting list of a stopword-grade term outgrows one row — the
    production layout shards postings by ``hash(doc) % S`` into S rows
    per hot term; here S=1 keeps the driver-verifiable string layout.

    Returns (word, df, postings) for terms with df ≥ ``min_df``.
    """
    from collections import Counter

    from kire_ray.stages.shuffle import partitioned_map_groups

    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        words: list[str] = []
        tfs: list[int] = []
        for i, t in zip(b[id_col], b[text_col]):
            c = Counter(t.split())
            ids.extend([i] * len(c))
            words.extend(c.keys())
            tfs.extend(c.values())
        return pd.DataFrame({id_col: ids, "word": words, "tf": tfs})

    def build(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([ "word", id_col], kind="mergesort")
        post = p[id_col].astype(str) + ":" + p["tf"].astype(str)
        g = pd.DataFrame({"word": p["word"], "post": post}).groupby(
            "word", sort=False
        )
        out = g.agg(df=("post", "size"), postings=("post", ",".join)).reset_index()
        out = out[out["df"] >= min_df]
        out["df"] = out["df"].astype(np.int64)
        return out

    rows = ds.map_batches(tf_rows, batch_format="pandas")
    return partitioned_map_groups(rows, ["word"], build)


def embedding_quantize_scales(
    ds: "ray.data.Dataset",
    *,
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """Per-dimension int8 quantization table (max-abs calibration):
    the pre-pass an embedding-store/ANN-serving pipeline runs before
    casting a float corpus to int8. Per-block max-abs partial (a single
    numpy reduction over the stacked batch) → one dimension-sized
    exchange → scale = max_abs / 127. max is order-independent, so the
    result is bit-stable under any partitioning.

    Returns (dim, max_abs, scale), dim 1-based to match SQL list
    indexing."""
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        M = np.abs(np.stack(b[emb_col].to_numpy())).max(axis=0)
        return pd.DataFrame(
            {"dim": np.arange(1, len(M) + 1, dtype=np.int64), "m": M}
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        m = out["m"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "dim": out["dim"].astype(np.int64),
                "max_abs": round_half_up(m, 6),
                "scale": round_half_up(m / 127.0, 6),
            }
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["dim"],
        {"m": ("m", "max")},
        post=post,
    )


def knn_graph_mutual(
    emb: "ray.data.Dataset",
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    broadcast_limit: int = 200_000,
    n_centroids: int = 64,
    n_probe: int | None = None,
    sample_size: int = 4096,
) -> "ray.data.Dataset":
    """Mutual-kNN graph over the corpus — the SemDeDup-style primitive
    behind embedding near-dup clustering and diversity sampling: an
    undirected edge (a, b) exists iff a is in b's cosine top-k AND b is
    in a's. Returns (a, b, cosine) with a < b.

    Auto-selected by node-table size (the verify_jaccard pattern,
    dedup.py):

    - ≤ ``broadcast_limit`` rows: the (id, normalized vector) table is
      collected once and broadcast (`ray.put`); each block computes its
      rows' directed top-k with one matmul — exact, zero shuffles
      before the mutual exchange. Right when the node table is
      dimension-sized.
    - above it: NO driver collect — IVF-bucketed candidate generation
      (``_knn_directed_ivf``): centroids fit on a bounded sample, every
      vector is indexed in its argmax cell and probed against its
      ``n_probe`` nearest cells, per-cell partial top-k, then a grouped
      merge to the directed top-k. Approximate with recall set by
      n_probe/n_centroids (``n_probe=None`` → probe every cell =
      exhaustive, exact — the equivalence-test setting).

    Both paths feed the identical mutual-pair exchange: directed edges
    meet in ONE exchange on the unordered pair and survive iff both
    directions arrived.
    """
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import partitioned_map_groups

    emb = emb.select_columns([id_col, vec_col]).materialize()
    if emb.count() <= broadcast_limit:
        edges = _knn_directed_broadcast(emb, k=k, vec_col=vec_col, id_col=id_col)
    else:
        edges = _knn_directed_ivf(
            emb,
            k=k,
            vec_col=vec_col,
            id_col=id_col,
            n_centroids=n_centroids,
            n_probe=n_probe,
            sample_size=sample_size,
        )

    def mutual(p: pd.DataFrame) -> pd.DataFrame:
        g = (
            p.groupby(["lo", "hi"], sort=False)
            .agg(n=("cosine", "size"), cosine=("cosine", "first"))
            .reset_index()
        )
        g = g[g["n"] >= 2]
        return pd.DataFrame(
            {
                "a": g["lo"].to_numpy(),
                "b": g["hi"].to_numpy(),
                "cosine": round_half_up(g["cosine"].to_numpy(np.float64), 6),
            }
        )

    return partitioned_map_groups(edges, ["lo", "hi"], mutual)


def _knn_directed_broadcast(
    emb: "ray.data.Dataset", *, k: int, vec_col: str, id_col: str
) -> "ray.data.Dataset":
    """Directed top-k via one broadcast matmul per block (exact).
    Ties fall back to id order because the broadcast matrix is
    id-sorted — bitwise the SQL ``ORDER BY cos DESC, id`` tie-break."""
    node_df = emb.to_pandas()
    all_ids = node_df[id_col].to_numpy()
    order = np.argsort(all_ids, kind="stable")
    all_ids = all_ids[order]
    Mall = _norm_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in node_df[vec_col]])
    )[order]
    ref = ray.put((all_ids, Mall))

    def directed(b: pd.DataFrame) -> pd.DataFrame:
        ids_g, M = ray.get(ref)
        aids = b[id_col].to_numpy()
        A = _norm_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        )
        S = A @ M.T
        # mask self-matches (below any cosine)
        self_pos = np.searchsorted(ids_g, aids)
        S[np.arange(len(aids)), self_pos] = -2.0
        kk = min(k, S.shape[1] - 1)
        # stable argsort on -S: desc cosine, ties → column order = id asc
        top = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        a = np.repeat(aids, kk)
        bb = ids_g[top].ravel()
        cos = np.take_along_axis(S, top, axis=1).ravel()
        return pd.DataFrame(
            {
                "lo": np.minimum(a, bb),
                "hi": np.maximum(a, bb),
                "cosine": cos,
            }
        )

    return emb.map_batches(directed, batch_format="pandas")


def _knn_directed_ivf(
    emb: "ray.data.Dataset",
    *,
    k: int,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    n_probe: int | None,
    sample_size: int,
) -> "ray.data.Dataset":
    """Directed top-k WITHOUT a driver-side node-table collect — the
    100 TB path. IVF candidate generation (ann_ivf's cells):

    1. centroids fit once on a bounded ``limit(sample_size)`` sample
       (the only driver collect — sample-sized, not corpus-sized);
    2. one streaming pass emits each vector once into its argmax cell
       (index side) and ``n_probe`` times into its query-probe cells;
    3. per-cell grouped matmul → per-(query, cell) partial top-k
       (SHUFFLE #1, keyed by cell — cell-size-quadratic work is IVF's
       cost model: size n_centroids ~ sqrt(N) and raise it with the
       corpus, hot cells split by raising n_centroids);
    4. grouped merge on the query id → directed top-k (SHUFFLE #2,
       k-bounded rows per node).

    Per-pair cosines are the same normalized-vector dots as the
    broadcast path; ties break by id asc in the merge. ``n_probe=None``
    probes every cell — exhaustive and therefore exact (the
    equivalence-test setting); finite n_probe trades recall for cost
    exactly as ann_ivf does.
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    probe_n = n_centroids if n_probe is None else min(n_probe, n_centroids)
    sample_df = emb.limit(sample_size).to_pandas()
    S = _norm_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample_df[vec_col]])
    )
    C = _kmeans_fit(S, min(n_centroids, len(S)))
    cref = ray.put(C)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(cref)
        M = _norm_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        )
        ids = b[id_col].to_numpy()
        sims = M @ Cm.T
        own = sims.argmax(axis=1)
        pn = min(probe_n, Cm.shape[0])
        probes = np.argsort(-sims, axis=1, kind="stable")[:, :pn]
        n = len(ids)
        return pd.DataFrame(
            {
                "cell": np.concatenate([own, probes.ravel()]),
                "role": np.concatenate(
                    [np.zeros(n, dtype=np.int8), np.ones(n * pn, dtype=np.int8)]
                ),
                "id": np.concatenate([ids, np.repeat(ids, pn)]),
                "vec": [v for v in M] + [v for v in np.repeat(M, pn, axis=0)],
            }
        )

    scattered = emb.map_batches(scatter, batch_format="pandas")

    def per_cells(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in part.groupby("cell", sort=False):
            idx = g[g["role"] == 0]
            qry = g[g["role"] == 1]
            if idx.empty or qry.empty:
                continue
            Mi = np.stack(idx["vec"].to_numpy())
            ids_i = idx["id"].to_numpy()
            o = np.argsort(ids_i, kind="stable")  # id-asc tie-break base
            Mi, ids_i = Mi[o], ids_i[o]
            Mq = np.stack(qry["vec"].to_numpy())
            ids_q = qry["id"].to_numpy()
            Scell = Mq @ Mi.T
            Scell[ids_q[:, None] == ids_i[None, :]] = -2.0  # self
            kk = min(k, Scell.shape[1])
            top = np.argsort(-Scell, axis=1, kind="stable")[:, :kk]
            a = np.repeat(ids_q, kk)
            bb = ids_i[top].ravel()
            cos = np.take_along_axis(Scell, top, axis=1).ravel()
            keep = cos > -2.0
            outs.append(
                pd.DataFrame({"qid": a[keep], "nb": bb[keep], "cosine": cos[keep]})
            )
        if not outs:
            return pd.DataFrame(
                {
                    "qid": pd.Series([], dtype=np.int64),
                    "nb": pd.Series([], dtype=np.int64),
                    "cosine": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    partials = partitioned_map_groups(scattered, ["cell"], per_cells)

    def merge_topk(part: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass: dedup (qid, nb) across probed cells, rank
        # by (cosine desc, nb asc) within qid, keep top-k
        part = part.drop_duplicates(subset=["qid", "nb"])
        part = part.sort_values(
            ["qid", "cosine", "nb"], ascending=[True, False, True], kind="stable"
        )
        rank = part.groupby("qid", sort=False).cumcount()
        part = part[rank < k]
        a = part["qid"].to_numpy()
        bb = part["nb"].to_numpy()
        return pd.DataFrame(
            {
                "lo": np.minimum(a, bb),
                "hi": np.maximum(a, bb),
                "cosine": part["cosine"].to_numpy(),
            }
        )

    return partitioned_map_groups(partials, ["qid"], merge_topk)


def embedding_top_component(
    emb: "ray.data.Dataset",
    *,
    iters: int = 5,
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """Dominant right singular direction of the (uncentered) embedding
    matrix by power iteration — the vector ABTT-style embedding
    post-processing removes and drift monitors track.

    The pagerank shape on floats: each iteration v ← normalize(Mᵀ(Mv))
    runs as ONE streaming pass over the corpus (per block: s = M_b v,
    then the dim-sized partial Mᵀ_b s — two numpy matmuls) followed by
    one dimension-sized exchange; only the dim-vector v crosses
    iterations (``ray.put``).  Uniform deterministic init; the returned
    sign is fixed by making the largest-|loading| dimension positive
    (smallest dim on ties), so the result is unique.

    Returns (dim, loading) with dim 1-based, rounded to 6dp — float
    summation-order jitter (~1e-12 after 5 iterations) sits far inside
    the rounding guard, so the unrolled SQL oracle matches value-exact.
    """
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import iteration_blocks

    # materialize once at iteration-friendly width: 5 iterations would
    # otherwise re-read the parquet corpus 5 times
    emb = iteration_blocks(emb)
    ncols = len(emb.take(1)[0][emb_col])
    v = np.full(ncols, 1.0 / np.sqrt(ncols), dtype=np.float64)

    for _ in range(iters):
        ref = ray.put(v)

        def partial(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            vk = ray.get(_ref)
            M = np.stack([np.asarray(x, dtype=np.float64) for x in b[emb_col]])
            w = M.T @ (M @ vk)
            return pd.DataFrame(
                {"dim": np.arange(1, len(w) + 1, dtype=np.int64), "w": w}
            )

        # dim-sized per-block partials merged on the driver (the v
        # vector is driver-resident and broadcast each round — same
        # contract as graph_algos.pagerank; the exchange was pure
        # per-iteration overhead)
        out = (
            emb.map_batches(partial, batch_format="pandas")
            .to_pandas()
            .groupby("dim", sort=True)["w"]
            .sum()
            .reset_index()
        )
        w = out["w"].to_numpy(np.float64)
        v = w / np.sqrt((w * w).sum())

    top = np.lexsort((np.arange(len(v)), -np.abs(v)))[0]
    if v[top] < 0:
        v = -v
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "dim": np.arange(1, len(v) + 1, dtype=np.int64),
                "loading": round_half_up(v, 6),
            }
        )
    )


def embedding_gram(
    emb: "ray.data.Dataset", *, emb_col: str = "embedding"
) -> "ray.data.Dataset":
    """Distributed Gram matrix XᵀX of the embedding corpus — the
    sufficient statistic behind PCA / whitening / ABTT post-processing
    (``embedding_top_component`` extracts one direction from it; this
    materializes the whole upper triangle for offline eigendecomposition).

    ONE streaming pass: each block contributes its d×d Gram partial
    (one numpy matmul, emitted as a single flattened row); the driver
    sums the fixed-size partials — sketch-sized state (d² doubles),
    zero shuffles, the ``lineitem_corr`` shape at embedding width.

    Returns (dim_a ≤ dim_b, 1-based): n, dot (half-up 6dp).
    """
    from kire_ray.functions.rounding import round_half_up

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        M = np.stack([np.asarray(x, dtype=np.float64) for x in b[emb_col]])
        g = M.T @ M
        iu, ju = np.triu_indices(g.shape[0])
        # long format (one row per cell, numpy columns): a 2081-column
        # single-row frame cost ~7s at sf0.1 in pandas dict assembly
        return pd.DataFrame(
            {
                "i": np.concatenate([iu + 1, [0]]).astype(np.int64),
                "j": np.concatenate([ju + 1, [0]]).astype(np.int64),
                "v": np.concatenate([g[iu, ju], [float(len(M))]]),
            }
        )

    tot = (
        emb.map_batches(partial, batch_format="pandas", batch_size=None)
        .to_pandas()
        .groupby(["i", "j"], sort=True)["v"]
        .sum()
        .reset_index()
    )
    n = int(tot.loc[(tot["i"] == 0) & (tot["j"] == 0), "v"].iloc[0])
    cells = tot[tot["i"] > 0]
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "dim_a": cells["i"].to_numpy(np.int64),
                "dim_b": cells["j"].to_numpy(np.int64),
                "n": np.full(len(cells), n, np.int64),
                "dot": round_half_up(cells["v"].to_numpy(np.float64), 6),
            }
        )
    )


def pca_project(
    emb: "ray.data.Dataset",
    *,
    n_components: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """PCA projection of the embedding corpus onto its top principal
    components — the dimensionality-reduction step ahead of clustering
    / visualization / cheap ANN.

    Two streaming passes, no shuffle:

    1. sufficient statistics — each block emits (n, Σx, XᵀX) as ONE
       fixed-size row (d + d² doubles); the driver folds O(blocks)
       partials into the exact covariance (the ``embedding_gram``
       contract, plus the mean for centering);
    2. the d×d eigendecomposition runs on the driver (d is the
       embedding width — model-sized, never data-sized), components get
       a deterministic sign (largest-|loading| dimension positive,
       smallest dim on ties, as ``embedding_top_component``), and the
       d×k projection matrix broadcasts via ``ray.put`` into a
       vectorized per-batch matmul.

    Rows-only at the driver (eigh is float-iterative, like ann_ivf);
    bit-level value checks vs a sequential numpy oracle live in pytest.
    """
    import ray

    from kire_ray.functions.rounding import round_half_up

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        M = np.stack([np.asarray(x, dtype=np.float64) for x in b[emb_col]])
        return pd.DataFrame(
            {
                "n": [len(M)],
                "s": [M.sum(axis=0).tobytes()],
                "g": [(M.T @ M).tobytes()],
            }
        )

    parts = emb.map_batches(stats, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    s = np.sum([np.frombuffer(x) for x in parts["s"]], axis=0)
    d = len(s)
    g = np.sum(
        [np.frombuffer(x).reshape(d, d) for x in parts["g"]], axis=0
    )
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)

    vals, vecs = np.linalg.eigh(cov)  # ascending
    W = vecs[:, ::-1][:, :n_components].copy()  # top-k columns
    for j in range(W.shape[1]):
        top = np.lexsort((np.arange(d), -np.abs(W[:, j])))[0]
        if W[top, j] < 0:
            W[:, j] = -W[:, j]

    ref = ray.put((mu, W))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        mu_, W_ = ray.get(ref)
        M = np.stack([np.asarray(x, dtype=np.float64) for x in b[emb_col]])
        P = (M - mu_) @ W_
        out = {id_col: b[id_col].to_numpy()}
        for j in range(P.shape[1]):
            out[f"pc_{j + 1}"] = round_half_up(P[:, j], 6)
        return pd.DataFrame(out)

    return emb.map_batches(project, batch_format="pandas")


def _kmeans_fit_distributed(
    emb: "ray.data.Dataset", k: int, iters: int
) -> np.ndarray:
    """Distributed Lloyd fit shared by ``kmeans_clusters``/``semdedup``:
    deterministic md5-bottom-k init, then ``iters`` rounds of
    broadcast-assign + per-batch partial (sum, count) folded on the
    driver (k × dim per block — never the vectors).

    Each round streams the table from storage (iters+1 read passes);
    at 100 TB, `.materialize()` the normalized vectors once before the
    loop so rounds re-read from the object store instead of parquet —
    the fold/broadcast structure is unchanged."""
    import hashlib

    def seed_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (
                int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
                for v in b["vec_id"]
            ),
            dtype=np.int64,
            count=len(b),
        )
        idx = np.argsort(h, kind="stable")[:k]
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy()[idx],
                "h": h[idx],
                "embedding": b["embedding"].to_numpy()[idx],
            }
        )

    seeds = emb.map_batches(seed_partial, batch_format="pandas").to_pandas()
    seeds = seeds.sort_values(["h", "vec_id"], kind="mergesort").head(k)
    C = _norm_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in seeds["embedding"]])
    )

    for _ in range(iters):
        ref = ray.put(C)

        def update(b: pd.DataFrame) -> pd.DataFrame:
            Cm = ray.get(ref)
            M = _norm_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
            )
            assign = (M @ Cm.T).argmax(axis=1)
            sums = np.zeros_like(Cm)
            np.add.at(sums, assign, M)
            cnt = np.bincount(assign, minlength=len(Cm))
            return pd.DataFrame(
                {
                    "cluster": np.arange(len(Cm), dtype=np.int64),
                    "s": list(sums),
                    "n": cnt.astype(np.int64),
                }
            )

        parts = emb.map_batches(update, batch_format="pandas").to_pandas()
        sums = np.stack([np.asarray(s, dtype=np.float64) for s in parts["s"]])
        agg = np.zeros_like(C)
        np.add.at(agg, parts["cluster"].to_numpy(), sums)
        cnt = np.bincount(
            parts["cluster"].to_numpy(),
            weights=parts["n"].to_numpy(),
            # len(C), not k: a corpus with fewer than k vectors seeds
            # fewer centroids and a k-length count mask would not align
            # with C (review r5: boolean-index crash on n < k)
            minlength=len(C),
        )
        nz = cnt > 0
        C[nz] = _norm_rows(agg[nz] / cnt[nz, None])
    return C


def kmeans_clusters(
    sf_dir: str, *, k: int = 8, iters: int = 5
) -> "ray.data.Dataset":
    """Fully DISTRIBUTED Lloyd k-means over the embedding table —
    unlike ``ann_ivf``'s bounded driver-sample fit, every iteration
    assigns EVERY vector and updates centroids from per-batch partial
    sums, so the fit sees 100 TB of vectors while the driver only ever
    folds a (k × dim) matrix per block.

    Determinism: init = the k vectors with the smallest
    ``md5(vec_id)`` (order-free bottom-k, the reservoir_sample idiom);
    iteration count fixed; ties in argmin broken by lowest centroid
    index (numpy argmin). Float-iterative like ``ann_ivf`` → rows-only
    at the driver, value-verified against a sequential numpy oracle in
    tests/test_kmeans.py.

    Output: (vec_id, cluster, cosine) — cosine = similarity to the
    assigned centroid (the SemDeDup §3 within-cluster signal).
    """
    from kire_ray.sources.parquet import sized_read

    emb = sized_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    C = _kmeans_fit_distributed(emb, k, iters)
    final_ref = ray.put(C)

    def assign_final(b: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(final_ref)
        M = _norm_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        )
        s = M @ Cm.T
        a = s.argmax(axis=1)
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy(np.int64),
                "cluster": a.astype(np.int64),
                "cosine": s[np.arange(len(a)), a],
            }
        )

    return emb.map_batches(assign_final, batch_format="pandas")


def semdedup(
    sf_dir: str, *, k: int = 8, iters: int = 5, tau: float = 0.45
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means,
    then inside each cluster mark a vector duplicate iff some LOWER-id
    vector in the SAME cluster has cosine ≥ ``tau`` (the paper\'s
    keep-one-per-semantic-group rule with a deterministic min-id
    survivor, matching exact_dedup\'s first-wins convention). The
    default tau is tuned to the synthetic embedding table (whose
    near-dup cosine ceiling is ~0.51; real SemDeDup corpora use ~0.99)
    so the flagging path is observable end-to-end.

    Distribution: the k-means stage is the shared distributed fit; the
    assignment pass CARRIES the embedding into the exchange (an Arrow
    hash join would reject the list column — known Ray 2.49 limit), so
    the within-cluster pairwise step is ONE exchange on cluster id,
    each reducer handling clusters whose pairwise block is
    (cluster_size × dim) — the paper\'s own scaling argument (clusters
    are ~n/k). Skewed clusters would need the IVF-bucketed sub-split
    documented in knn_graph_mutual.

    Output: (vec_id, cluster, is_dup) for every vector.
    """
    from kire_ray.sources.parquet import sized_read
    from kire_ray.stages.shuffle import partitioned_map_groups

    emb = sized_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    C = _kmeans_fit_distributed(emb, k, iters)
    ref = ray.put(C)

    def assign_with_vec(b: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(ref)
        M = _norm_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        )
        a = (M @ Cm.T).argmax(axis=1)
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy(np.int64),
                "cluster": a.astype(np.int64),
                "embedding": b["embedding"].to_numpy(),
            }
        )

    assigned = emb.map_batches(assign_with_vec, batch_format="pandas")

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, grp in g.groupby("cluster", sort=False):
            grp = grp.sort_values("vec_id", kind="mergesort")
            M = _norm_rows(
                np.stack(
                    [np.asarray(v, dtype=np.float64) for v in grp["embedding"]]
                )
            )
            S = M @ M.T
            # strictly-lower-id comparisons only
            dup = (np.tril(S, -1) >= tau).any(axis=1)
            out.append(
                pd.DataFrame(
                    {
                        "vec_id": grp["vec_id"].to_numpy(np.int64),
                        "cluster": np.full(len(grp), cid, dtype=np.int64),
                        "is_dup": dup,
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype=np.int64),
                    "cluster": pd.Series([], dtype=np.int64),
                    "is_dup": pd.Series([], dtype=bool),
                }
            )
        )

    return partitioned_map_groups(assigned, ["cluster"], dedup_cluster)


def embedding_codes(
    ds: "ray.data.Dataset",
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """The actual int8 cast behind ``embedding_quantize_scales``:
    symmetric max-abs quantization code = floor(x * 127/max_abs_d +
    0.501) per dimension — what an ANN store ships instead of floats
    (4× smaller, SIMD-dot-friendly).

    Shape: per-block per-dim max-abs partial (one numpy reduction) →
    driver fold of the dimension-sized partials (D doubles per block,
    constant like a sketch) → broadcast scale vector (closure, D
    doubles) → one vectorized pass emitting the flat (vec_id, dim,
    code, scale) table. No shuffle of the vectors themselves.

    Output is flat so the driver oracle can replay it exactly with
    unnest + generate_subscripts; dims are 1-based to match SQL."""
    from kire_ray.functions.rounding import round_half_up  # noqa: F401

    def dmax(b: pd.DataFrame) -> pd.DataFrame:
        M = np.abs(np.vstack(b[emb_col].to_numpy()).astype(np.float64)).max(axis=0)
        return pd.DataFrame({"dim": np.arange(1, len(M) + 1, dtype=np.int64), "m": M})

    mx = (
        ds.map_batches(dmax, batch_format="pandas")
        .to_pandas()
        .groupby("dim", sort=True)["m"]
        .max()
        .to_numpy(np.float64)
    )
    scale = np.where(mx > 0, 127.0 / np.where(mx > 0, mx, 1.0), 0.0)

    def quant(b: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack(b[emb_col].to_numpy()).astype(np.float64)
        n, D = X.shape
        return pd.DataFrame(
            {
                "vec_id": np.repeat(b[id_col].to_numpy(np.int64), D),
                "dim": np.tile(np.arange(1, D + 1, dtype=np.int64), n),
                "code": np.floor(X * scale + 0.501).astype(np.int64).ravel(),
                "scale": np.tile(scale, n),
            }
        )

    return ds.map_batches(quant, batch_format="pandas")


def _pq_fit(
    emb: "ray.data.Dataset", m: int, k: int, iters: int
) -> np.ndarray:
    """Distributed product-quantization codebook fit (Jégou, Douze,
    Schmid, "Product quantization for nearest neighbor search", TPAMI
    2011 §II): an L2 Lloyd fit per subspace, ALL subspaces advancing in
    the same streaming pass — per batch one (m × k × d/m) partial
    (sum, count) fold, never the vectors. Init = the subvectors of the
    k vectors with the smallest md5(vec_id) (the kmeans_clusters
    idiom). Returns C with shape (m, k, d//m)."""
    import hashlib

    def seed_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (
                int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
                for v in b["vec_id"]
            ),
            dtype=np.int64,
            count=len(b),
        )
        idx = np.argsort(h, kind="stable")[:k]
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy()[idx],
                "h": h[idx],
                "embedding": b["embedding"].to_numpy()[idx],
            }
        )

    seeds = emb.map_batches(seed_partial, batch_format="pandas").to_pandas()
    seeds = seeds.sort_values(["h", "vec_id"], kind="mergesort").head(k)
    S = np.stack([np.asarray(v, dtype=np.float64) for v in seeds["embedding"]])
    d = S.shape[1]
    assert d % m == 0, (
        f"embedding dim {d} must split evenly into m={m} subspaces — a "
        f"remainder would silently drop the last {d % m} dimensions from "
        "both the codes and recon_err (review r5)"
    )
    ds_ = d // m
    C = np.stack([S[:, j * ds_ : (j + 1) * ds_].copy() for j in range(m)])

    for _ in range(iters):
        ref = ray.put(C)

        def update(b: pd.DataFrame) -> pd.DataFrame:
            Cm = ray.get(ref)  # (m, k, ds)
            M = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
            rows = []
            for j in range(m):
                X = M[:, j * ds_ : (j + 1) * ds_]
                # L2 argmin via expanded dot products (ties → lowest code)
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * X @ Cm[j].T
                    + (Cm[j] * Cm[j]).sum(axis=1)[None, :]
                )
                assign = d2.argmin(axis=1)
                sums = np.zeros_like(Cm[j])
                np.add.at(sums, assign, X)
                cnt = np.bincount(assign, minlength=k)
                for c in range(k):
                    rows.append((j, c, sums[c], int(cnt[c])))
            return pd.DataFrame(rows, columns=["j", "c", "s", "n"])

        parts = emb.map_batches(update, batch_format="pandas").to_pandas()
        for j in range(m):
            pj = parts[parts["j"] == j]
            agg = np.zeros((k, ds_))
            np.add.at(
                agg,
                pj["c"].to_numpy(np.int64),
                np.stack([np.asarray(s, dtype=np.float64) for s in pj["s"]]),
            )
            cnt = np.bincount(
                pj["c"].to_numpy(np.int64), weights=pj["n"].to_numpy(), minlength=k
            )
            nz = cnt > 0
            C[j][nz] = agg[nz] / cnt[nz, None]
    return C


def pq_codes(
    sf_dir: str, *, m: int = 4, k: int = 16, iters: int = 3
) -> "ray.data.Dataset":
    """Product-quantization encoding of the embedding table: each
    vector compressed to ``m`` sub-codes of ⌈log2 k⌉ bits (here 4×4 =
    2 bytes per vector) — THE memory lever for billion-scale ANN
    (IVFADC's second stage; the scalar cousin is ``embedding_codes``).
    Emits the long code table (vec_id, subspace, code) plus each row's
    6dp reconstruction error, the fidelity metric a PQ deployment
    tracks.

    Float-iterative (Lloyd per subspace) → rows-only at the driver;
    value equality vs a sequential numpy oracle is proven in
    tests/test_kmeans.py. All m subspaces fit in ONE streaming pass
    per iteration (per-batch (m × k × d/m) partials)."""
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.sources.parquet import sized_read

    emb = sized_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    C = _pq_fit(emb, m, k, iters)
    ds_ = C.shape[2]
    ref = ray.put(C)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(ref)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        ids = b["vec_id"].to_numpy(np.int64)
        out_id, out_j, out_code, out_err = [], [], [], []
        err2 = np.zeros(len(M))
        codes = np.empty((len(M), m), dtype=np.int64)
        for j in range(m):
            X = M[:, j * ds_ : (j + 1) * ds_]
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * X @ Cm[j].T
                + (Cm[j] * Cm[j]).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1)
            r = X - Cm[j][codes[:, j]]
            err2 += (r * r).sum(axis=1)
        err = np.sqrt(err2)
        for j in range(m):
            out_id.append(ids)
            out_j.append(np.full(len(M), j, dtype=np.int64))
            out_code.append(codes[:, j])
            out_err.append(err)
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_id),
                "subspace": np.concatenate(out_j),
                "code": np.concatenate(out_code),
                "recon_err": round_half_up(np.concatenate(out_err), 6),
            }
        )

    return emb.map_batches(encode, batch_format="pandas")


def docsim_cosine(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    min_df: int = 2,
    max_df: int = 20,
    threshold: float = 0.4,
    broadcast_limit: int = 200_000,
) -> "ray.data.Dataset":
    """TF-IDF cosine document-similarity self-join (the weighted
    complement of ``ngram_jaccard_dedup``'s set semantics): every doc
    pair whose cosine over word ``ngram`` TF-IDF vectors clears
    ``threshold``, with the shared-term count as integer evidence.

    The term space is *defined* as n-grams with min_df ≤ df ≤ max_df —
    the df gate is the operator's spec, not an approximation: it is
    the posting-list prune every sparse all-pairs engine applies
    (Broder 1997 shingling; Bayardo et al. 2007 all-pairs), bounding
    per-term pair fan-out at max_df² regardless of corpus size, and
    df=1 terms can never pair anyway.

    Distributed shape (every side scales; the one lookup that is
    doc-bounded — the √norm table — broadcasts under
    ``broadcast_limit`` docs and hash-joins above it, both paths
    bit-equal):
    - block-local tokenize → complete per-doc tf (a doc never splits);
    - ONE term exchange: df = posting-group size, idf = ln(N/df); the
      reducer emits pair dot-product partials (a, b, w_a·w_b, 1) AND
      per-doc squared-norm partials (doc, −1, w², 0) into the SAME
      grouped (a, b) exchange, so dots, shared-term counts and norms
      all reduce in one pass;
    - two bucketed hash joins attach √norm to each pair side
      (doc-count-sized tables — joined, never broadcast).
    """
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.joins import hash_join
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    n_docs = int(ds.count())

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[text_col].str.split(" ").explode()
        words = ex.to_numpy(object)
        docs = b[id_col].reindex(ex.index).to_numpy()
        if len(words) < ngram:
            # typed empty frame — an all-float64 default would break
            # Arrow schema unification at the term exchange (review r5);
            # slice the REAL arrays so doc keeps the block's id dtype
            return pd.DataFrame(
                {"doc": docs[:0], "term": words[:0],
                 "tf": pd.Series([], dtype=np.int64)}
            )
        # explicit end index so ngram=1 works ([:1-ngram] would be [:0])
        end = len(words) - ngram + 1
        same = docs[:end] == docs[ngram - 1 :]
        term = words[:end].copy()
        for j in range(1, ngram):
            term = term + " "
            term = term + words[j : end + j]
        g = (
            pd.DataFrame({"doc": docs[:end][same], "term": term[same]})
            .groupby(["doc", "term"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        return g

    def per_term(p: pd.DataFrame) -> pd.DataFrame:
        sizes = p.groupby("term", sort=False)["doc"].transform("size")
        p = p[(sizes >= min_df) & (sizes <= max_df)]
        if not len(p):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64),
                 "b": pd.Series([], dtype=np.int64),
                 "v": pd.Series([], dtype=np.float64),
                 "c": pd.Series([], dtype=np.int64)}
            )
        p = p.sort_values(["term", "doc"], kind="mergesort")
        df = p.groupby("term", sort=False)["doc"].transform("size").to_numpy(
            np.float64
        )
        w = p["tf"].to_numpy(np.float64) * np.log(n_docs / df)
        doc = p["doc"].to_numpy(np.int64)
        # squared-norm partials, pre-combined per doc
        nrm = pd.DataFrame({"a": doc, "v": w * w}).groupby("a", sort=False)[
            "v"
        ].sum().reset_index()
        nrm["b"] = np.int64(-1)
        nrm["c"] = np.int64(0)
        # pair partials: fully vectorized i<j enumeration per term group
        starts = np.flatnonzero(
            np.concatenate([[True], p["term"].to_numpy()[1:]
                            != p["term"].to_numpy()[:-1]])
        )
        first = np.repeat(starts, np.diff(np.append(starts, len(p))))
        within = np.arange(len(p)) - first  # 0..k-1 inside each group
        rights = np.repeat(np.arange(len(p)), within)
        offs = np.cumsum(within) - within
        lefts = (
            np.arange(int(within.sum()))
            - np.repeat(offs, within)
            + np.repeat(first, within)
        )
        pairs = pd.DataFrame(
            {"a": doc[lefts], "b": doc[rights], "v": w[lefts] * w[rights]}
        )
        pairs = (
            pairs.groupby(["a", "b"], sort=False)
            .agg(v=("v", "sum"), c=("v", "size"))
            .reset_index()
        )
        pairs["c"] = pairs["c"].astype(np.int64)
        return pd.concat(
            [pairs, nrm[["a", "b", "v", "c"]]], ignore_index=True
        )

    post = ds.map_batches(postings, batch_format="pandas")
    reduced = grouped_agg(
        partitioned_map_groups(post, ["term"], per_term),
        ["a", "b"],
        {"v": ("v", "sum"), "c": ("c", "sum")},
    ).materialize()

    norms = reduced.map_batches(
        lambda b: pd.DataFrame(
            {"d": b["a"][b["b"] == -1], "nrm": np.sqrt(b["v"][b["b"] == -1])}
        ),
        batch_format="pandas",
    )
    pairs = reduced.map_batches(
        lambda b: b[b["b"] != -1], batch_format="pandas"
    )

    if n_docs <= broadcast_limit:
        # doc-bounded norm table under the engine's standard broadcast
        # threshold (mutual_knn's 200k contract): ship the norm map
        # once via ray.put and attach both sides inside one map — the
        # two 16-partition hash joins cost ~2.3 s of pure exchange
        # overhead on a pair table that is typically tiny
        import ray as _ray

        nref = _ray.put(
            norms.to_pandas().set_index("d")["nrm"].to_dict()
        )

        def attach(b: pd.DataFrame) -> pd.DataFrame:
            nm = _ray.get(nref)
            b = b.copy()
            b["na"] = b["a"].map(nm)
            b["nb"] = b["b"].map(nm)
            return b

        joined = pairs.map_batches(attach, batch_format="pandas")
    else:
        joined = hash_join(
            hash_join(
                pairs,
                norms.map_batches(
                    lambda b: b.rename(columns={"d": "a", "nrm": "na"}),
                    batch_format="pandas",
                ),
                ["a"],
            ),
            norms.map_batches(
                lambda b: b.rename(columns={"d": "b", "nrm": "nb"}),
                batch_format="pandas",
            ),
            ["b"],
        )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cos = round_half_up(
            b["v"].to_numpy(np.float64)
            / (b["na"].to_numpy(np.float64) * b["nb"].to_numpy(np.float64)),
            6,
        )
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "doc_a": b["a"].to_numpy(np.int64)[keep],
                "doc_b": b["b"].to_numpy(np.int64)[keep],
                "n_shared_terms": b["c"].to_numpy(np.int64)[keep],
                "cosine": cos[keep],
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def knn_classify(
    ds: "ray.data.Dataset",
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
) -> "ray.data.Dataset":
    """Leave-one-out k-NN majority-vote classification — the label-
    quality audit a curation pipeline runs over an embedded corpus
    (a vector whose neighbours disagree with its stored label is a
    labeling error candidate; Northcutt et al., confident learning).

    Similarity is the *integer* dot product of the engine's symmetric
    max-abs int8 codes (``embedding_codes`` spec) — exact arithmetic,
    so ranking and votes are bit-reproducible in SQL: neighbours are
    the top-``k`` by (dot desc, vec_id asc) excluding self; the
    predicted label is the majority with smallest-label tie-break.

    Distributed shape mirrors ``ann_brute_force``: the dimension-sized
    scale vector is a driver fold; the database codes+labels matrix is
    ``ray.put`` ONCE and each streamed query batch runs one int64
    matmul against it. At corpus scale the database side outgrows a
    broadcast — swap candidate generation to ``ann_ivf``'s cells (the
    ``knn_graph_mutual`` IVF path) and keep the vote identical.
    """
    def dmax(b: pd.DataFrame) -> pd.DataFrame:
        M = np.abs(np.vstack(b[emb_col].to_numpy()).astype(np.float64)).max(axis=0)
        return pd.DataFrame(
            {"dim": np.arange(1, len(M) + 1, dtype=np.int64), "m": M}
        )

    mx = (
        ds.map_batches(dmax, batch_format="pandas")
        .to_pandas()
        .groupby("dim", sort=True)["m"]
        .max()
        .to_numpy(np.float64)
    )
    scale = np.where(mx > 0, 127.0 / np.where(mx > 0, mx, 1.0), 0.0)

    def codes_of(b: pd.DataFrame) -> np.ndarray:
        X = np.vstack(b[emb_col].to_numpy()).astype(np.float64)
        return np.floor(X * scale + 0.501).astype(np.int64)

    db = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "vec_id": b[id_col].to_numpy(np.int64),
                "label": b[label_col].to_numpy(np.int64),
                "codes": list(codes_of(b)),
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    db = db.sort_values("vec_id")
    db_ids = db["vec_id"].to_numpy(np.int64)
    db_labels = db["label"].to_numpy(np.int64)
    db_codes = np.vstack(db["codes"].to_numpy())
    ref = ray.put((db_ids, db_labels, db_codes))

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        ids_, labels_, C = ray.get(ref)
        Q = codes_of(b)
        qid = b[id_col].to_numpy(np.int64)
        dots = Q @ C.T  # int64 exact
        dots[qid[:, None] == ids_[None, :]] = np.int64(-(2**62))  # no self
        # top-k by (dot desc, vec_id asc): ids_ is ascending, stable
        # mergesort on -dot preserves id order inside dot ties
        order = np.argsort(-dots, axis=1, kind="stable")[:, :k]
        votes = labels_[order]  # (n, k)
        n = len(qid)
        counts = np.zeros((n, int(labels_.max()) + 1), dtype=np.int64)
        np.add.at(counts, (np.repeat(np.arange(n), k), votes.ravel()), 1)
        pred = counts.argmax(axis=1)  # argmax → smallest label on ties
        true = b[label_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "vec_id": qid,
                "true_label": true,
                "pred_label": pred.astype(np.int64),
                "correct": (pred == true).astype(np.int64),
            }
        )

    return ds.map_batches(classify, batch_format="pandas")
