"""Deterministic corpus sampling / sharding for training-data pipelines.

Both operators key every decision off ``md5(str(doc_id))`` — chosen
deliberately over the engine's fast ephemeral hash because the result
is *persisted* (which docs survive the sample, which shard a doc lands
in must be stable across runs and engines) and because md5 is the one
hash DuckDB and Python compute identically, so the driver can verify
the sampled corpus value-for-value in SQL. The cost is one tiny hash
per document (not per token), amortized over the document payload —
negligible next to the read even at 100 TB.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

from kire_ray.stages.shuffle import default_partitions, partitioned_map_groups

HEX = "0123456789abcdef"


def _md5_hex(ids: np.ndarray) -> list[str]:
    return [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]


def _rate_threshold(rate: float) -> str:
    """8-hex-char keep threshold: keep iff md5(id)[:8] < threshold.

    'g' sorts above every hex digit, so rate>=1 keeps everything."""
    if rate >= 1.0:
        return "g"
    return format(max(0, int(rate * 2**32)), "08x")


def stratified_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    *,
    default_rate: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> "ray.data.Dataset":
    """Deterministic per-source downsampling (source-mix rebalancing):
    keep a document iff its md5 uniform falls under its source's rate.

    Embarrassingly parallel — a pure filter inside ``map_batches``, no
    shuffle, no state; the same doc survives regardless of partitioning,
    cluster size, or resume boundaries.
    """
    thr = {s: _rate_threshold(r) for s, r in rates.items()}
    d = _rate_threshold(default_rate)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array([x[:8] for x in _md5_hex(b[id_col].to_numpy())])
        t = b[source_col].map(lambda s: thr.get(s, d)).to_numpy(dtype=object)
        keep = h < t.astype(h.dtype)
        return b.loc[keep, [id_col, source_col]]

    return ds.map_batches(pick, batch_format="pandas")


def training_shuffle(
    ds: "ray.data.Dataset",
    *,
    n_shards: int | None = None,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic global shuffle into training shards: shard =
    first 8 md5 hex digits (32 bits) mod ``n_shards`` (content-
    addressed; 32 bits keep the mod uniform for any realistic shard
    count — a single byte skewed shards 20% whenever 256 % P != 0 and
    left shards ≥256 permanently EMPTY, review r5), order within a
    shard = full md5 hex (a reproducible random permutation).

    One hash exchange co-locates each shard, then a vectorized
    in-partition sort + cumcount assigns positions — no global sort,
    no driver state; re-running on any partitioning yields identical
    (shard, pos) for every doc.
    """
    P = n_shards or default_partitions()

    def key(b: pd.DataFrame) -> pd.DataFrame:
        h = _md5_hex(b[id_col].to_numpy())
        shard = np.array([int(x[:8], 16) for x in h], dtype=np.int64) % P
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "shard": shard, "sort_key": h}
        )

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "sort_key"], kind="mergesort")
        g["pos"] = g.groupby("shard", sort=False).cumcount().astype(np.int64)
        return g

    keyed = ds.select_columns([id_col]).map_batches(key, batch_format="pandas")
    return partitioned_map_groups(keyed, ["shard"], order)


# 2^60: the md5-prefix uniform below is 60 bits, so thresholds compare
# exactly as int64 on both the engine and the DuckDB-oracle side.
_WS_SCALE = float(1 << 60)


def weighted_sample(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    cap: float = 2000.0,
) -> "ray.data.Dataset":
    """Deterministic importance sampling: keep a document with
    probability proportional to its weight (here length-proportional,
    ``w = min(1, weight_col/cap)`` — the up-weight-long-docs knob of a
    token-budgeted training mix).

    keep ⟺ md5-uniform(id) < floor(w · 2^60): a pure stateless filter
    inside ``map_batches`` — no shuffle, no RNG state, identical
    decisions under any partitioning / resume / cluster size, and
    SQL-replicable so the driver verifies the surviving set exactly.
    The 'ws_' salt decorrelates this uniform from the other md5-keyed
    operators (shuffle shards, stratified sample) over the same ids.
    """

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        u = np.fromiter(
            (
                int(hashlib.md5(("ws_" + str(i)).encode("utf-8")).hexdigest()[:15], 16)
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        w = np.minimum(1.0, b[weight_col].to_numpy(np.float64) / cap)
        thr = np.floor(w * _WS_SCALE).astype(np.int64)
        keep = u < thr
        out = b.loc[keep, [id_col, weight_col]].copy()
        out["weight"] = np.floor(w[keep] * 10**6 + 0.501) / 10**6
        return out

    return ds.map_batches(pick, batch_format="pandas")


def per_source_cap(
    ds: "ray.data.Dataset",
    k: int = 10,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> "ray.data.Dataset":
    """Hard per-source document cap (the "max pages per domain" rule of
    every web-crawl pipeline): keep the k docs of each source with the
    smallest md5(id) — a deterministic uniform draw, stable across
    runs, partitionings and engines.

    Unlike ``stratified_sample`` (a stateless rate filter) a hard cap
    needs global per-source state; the mergeable form is min-k: each
    block keeps its k smallest (hash, id) per source (so the exchange
    moves ≤ k rows per (source, block), never the corpus), and the
    per-source reduce repeats the same head(k). Tie-break on id after
    hash makes the survivor set unique.
    """

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["h", id_col], kind="mergesort")
        return b.groupby(source_col, sort=False).head(k)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return topk(
            pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    source_col: b[source_col].to_numpy(),
                    "h": _md5_hex(b[id_col].to_numpy()),
                }
            )
        )

    def final(p: pd.DataFrame) -> pd.DataFrame:
        return topk(p)[[id_col, source_col]]

    return partitioned_map_groups(
        ds.map_batches(partial, batch_format="pandas"), [source_col], final
    )


def curriculum_schedule(
    docs: "ray.data.Dataset",
    *,
    n_stages: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Length-based curriculum staging (Bengio et al. 2009, "Curriculum
    Learning"; length-ordered curricula à la Shortformer, Press et al.
    2021): assign every document a curriculum ``stage`` by word-count
    quantile (stage 0 = shortest quarter first) plus a deterministic
    md5 ``order_key`` that shuffles documents *within* a stage — the
    consumer materializes the curriculum by sorting on
    ``(stage, order_key)``.

    Quantile thresholds come from a word-count *value histogram*
    (grouped combiner → one value-cardinality exchange → tiny
    cumulative table on the driver, broadcast back): distinct
    word-counts are bounded (≈ max doc length), so the exchange is
    constant-sized no matter the corpus — no global sort, no
    per-document state. Threshold rule: stage s ends at the smallest
    word-count whose cumulative doc count reaches
    ``ceil(n·(s+1)/n_stages)`` (integer arithmetic, replayable in SQL).
    """
    from kire_ray.stages.shuffle import grouped_agg

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        nw = b[text_col].str.split().map(len).astype("int64")
        g = nw.value_counts()
        return pd.DataFrame({"n_words": g.index.to_numpy(), "c": g.to_numpy()})

    hist = (
        grouped_agg(
            docs.map_batches(counts, batch_format="pandas"),
            ["n_words"],
            {"c": ("c", "sum")},
        )
        .to_pandas()
        .sort_values("n_words", kind="stable")
    )
    n = int(hist["c"].sum())
    cc = hist["c"].cumsum().to_numpy()
    vals = hist["n_words"].to_numpy()
    # smallest value whose cumulative count reaches ceil(n*(s+1)/S)
    thr = np.array(
        [
            vals[np.searchsorted(cc, -(-n * (s + 1) // n_stages))]
            for s in range(n_stages - 1)
        ],
        dtype=np.int64,
    )

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        nw = b[text_col].str.split().map(len).astype("int64").to_numpy()
        stage = np.searchsorted(thr, nw)  # thr[s-1] < nw <= thr[s] → s
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_words": nw.astype(np.int32),
                "stage": stage.astype(np.int32),
                "order_key": _md5_hex(b[id_col].to_numpy()),
            }
        )

    return docs.map_batches(assign, batch_format="pandas")


def reservoir_sample(
    ds: "ray.data.Dataset",
    k: int,
    *,
    id_col: str = "doc_id",
    keep_cols: tuple = ("doc_id", "source"),
) -> "ray.data.Dataset":
    """Uniform k-sample without replacement — the distributed
    equivalent of reservoir sampling (Vitter's Algorithm R), expressed
    as a *bottom-k-by-random-priority* selection so it is deterministic,
    mergeable and driver-verifiable: each row's priority is
    ``md5(str(id))`` (the module's persisted-decision hash), and the
    global sample is the k smallest priorities.

    Bottom-k is the associative formulation of the reservoir: each
    block reduces to its own k smallest (a partial reservoir), the
    driver merges O(blocks) k-row partials — no shuffle, no global
    sort, state bounded by k × blocks regardless of corpus size. The
    same trick powers the KMV sketch (`sketches.py`); here the sampled
    rows themselves are the output. Exact SQL oracle:
    ``ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT k``.
    """
    cols = list(keep_cols)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array(_md5_hex(b[id_col].to_numpy()), dtype=object)
        b = b[cols].assign(_pri=h)
        order = np.lexsort((b[id_col].to_numpy(), b["_pri"].to_numpy()))
        return b.iloc[order[:k]]

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    order = np.lexsort((parts[id_col].to_numpy(), parts["_pri"].to_numpy()))
    return ray.data.from_pandas(
        parts.iloc[order[:k]][cols].reset_index(drop=True)
    )


def grouped_reservoir(
    ds: "ray.data.Dataset",
    k: int,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Per-group uniform k-sample (balanced per-source subsampling —
    the "cap every source at k docs, chosen uniformly" step of corpus
    mixing): ``reservoir_sample`` semantics applied independently
    inside each group.

    Same bottom-k-by-md5 formulation, but mergeable per group: each
    block reduces to its own per-group k smallest (one vectorized
    ``groupby.head`` after a priority sort), and ONE grouped exchange
    on ``group_col`` folds the partials — state per reducer is
    O(groups_in_partition × k), never the corpus. SQL oracle:
    ``row_number() OVER (PARTITION BY group ORDER BY md5(id), id) <= k``.
    """
    cols = [id_col, group_col]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array(_md5_hex(b[id_col].to_numpy()), dtype=object)
        b = b[cols].assign(_pri=h)
        order = np.lexsort((b[id_col].to_numpy(), b["_pri"].to_numpy()))
        b = b.iloc[order]
        return b.groupby(group_col, sort=False).head(k)

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((part[id_col].to_numpy(), part["_pri"].to_numpy()))
        part = part.iloc[order]
        return part.groupby(group_col, sort=False).head(k)[cols]

    return partitioned_map_groups(
        ds.map_batches(partial, batch_format="pandas"), [group_col], fold
    )


def dsir_weights(
    sf_dir: str,
    *,
    target_lang: str = "en",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> "ray.data.Dataset":
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): per-document log importance weight under two hashed-unigram
    bag models, log p_target(doc) − log p_raw(doc), the score the paper
    resamples raw web data by to match a target domain (here: the
    ``target_lang`` slice vs the whole corpus).

    Features are md5-hashed token buckets (``md5(w) mod n_buckets`` on
    the 52-bit prefix — the engine's SQL-parity hash), so the driver
    verifies the weights value-exactly in DuckDB. Distribution is the
    sketch pattern: the two bucket-count tables are CONSTANT-size
    (n_buckets), so pass 1 folds per-block partial count vectors on the
    driver (no exchange), broadcasts both Laplace-smoothed log-prob
    tables once, and pass 2 streams every doc through a vectorized
    token→bucket→logprob lookup. Two streaming scans, zero shuffles.

    Output: (doc_id, n_tokens, dsir_logw).
    """
    from hashlib import md5

    from kire_ray.sources.parquet import sized_read

    docs = sized_read(
        f"{sf_dir}/documents.parquet", ["doc_id", "text", "lang"]
    )

    def _buckets(words: np.ndarray) -> np.ndarray:
        # 13-hex-digit md5 prefix == digest[:7] big-endian >> 4
        return np.fromiter(
            (
                (int.from_bytes(md5(w.encode("utf-8")).digest()[:7], "big") >> 4)
                % n_buckets
                for w in words
            ),
            dtype=np.int64,
            count=len(words),
        )

    def _explode(b: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """(row_index, bucket) for every token, hashing each DISTINCT
        word once per batch."""
        words = b["text"].str.split()
        n = words.map(len).to_numpy(np.int64)
        flat = (
            np.concatenate([np.asarray(w, dtype=object) for w in words])
            if len(b)
            else np.array([], dtype=object)
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        return np.repeat(np.arange(len(b)), n), _buckets(uniq)[inv]

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        ri, hb = _explode(b)
        is_tgt = (b["lang"].to_numpy(object) == target_lang)[ri]
        return pd.DataFrame(
            {
                "tgt": [np.bincount(hb[is_tgt], minlength=n_buckets)],
                "raw": [np.bincount(hb, minlength=n_buckets)],
            }
        )

    parts = docs.map_batches(count_partial, batch_format="pandas").to_pandas()
    tgt = np.sum(np.stack([np.asarray(v) for v in parts["tgt"]]), axis=0)
    raw = np.sum(np.stack([np.asarray(v) for v in parts["raw"]]), axis=0)
    log_tgt = np.log((tgt + alpha) / (tgt.sum() + alpha * n_buckets))
    log_raw = np.log((raw + alpha) / (raw.sum() + alpha * n_buckets))
    ref = ray.put(log_tgt - log_raw)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from kire_ray.functions.rounding import round_half_up

        lw = ray.get(ref)
        ri, hb = _explode(b)
        s = np.zeros(len(b), dtype=np.float64)
        np.add.at(s, ri, lw[hb])
        n = np.bincount(ri, minlength=len(b)).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "dsir_logw": round_half_up(s, 6),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def preference_pairs(
    docs: "ray.data.Dataset",
    *,
    group_cols: tuple[str, str] = ("lang", "source"),
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> "ray.data.Dataset":
    """DPO/RLHF-style preference-pair mining: per group, pair the
    highest-scored document (chosen) with the lowest-scored one
    (rejected) — the extreme-pair construction preference-tuning
    pipelines run over (prompt, candidate-response) tables. Ties break
    deterministically AND asymmetrically (chosen: min id, rejected:
    max id), so a group of equal scores still yields a distinct pair;
    single-doc groups emit nothing.

    Shape: block-local extreme-candidate partial (two sorts + head-1
    per group, vectorized) → ONE exchange on the group key → the same
    extreme combine per partition. Both extremes are associative max
    operations under lexicographic orders, so partials compose exactly
    like any other combiner; the exchange carries ≤ 2 candidate rows
    per (group, block), never documents."""
    g1, g2 = group_cols

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[g1, g2, id_col, score_col]]
        ch = (
            b.sort_values([score_col, id_col], ascending=[False, True])
            .drop_duplicates([g1, g2])
            .rename(columns={id_col: "ch_id", score_col: "ch_len"})
        )
        rj = (
            b.sort_values([score_col, id_col], ascending=[True, False])
            .drop_duplicates([g1, g2])
            .rename(columns={id_col: "rj_id", score_col: "rj_len"})
        )
        n = b.groupby([g1, g2], sort=False).size().rename("n").reset_index()
        out = ch.merge(rj, on=[g1, g2]).merge(n, on=[g1, g2])
        for c in ("ch_id", "ch_len", "rj_id", "rj_len", "n"):
            out[c] = out[c].astype(np.int64)
        return out

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        ch = p.sort_values(["ch_len", "ch_id"], ascending=[False, True])[
            [g1, g2, "ch_id", "ch_len"]
        ].drop_duplicates([g1, g2])
        rj = p.sort_values(["rj_len", "rj_id"], ascending=[True, False])[
            [g1, g2, "rj_id", "rj_len"]
        ].drop_duplicates([g1, g2])
        n = p.groupby([g1, g2], sort=False)["n"].sum().reset_index()
        out = ch.merge(rj, on=[g1, g2]).merge(n, on=[g1, g2])
        out = out[out["n"] >= 2]
        return pd.DataFrame(
            {
                g1: out[g1],
                g2: out[g2],
                "chosen_id": out["ch_id"].astype(np.int64),
                "chosen_len": out["ch_len"].astype(np.int64),
                "rejected_id": out["rj_id"].astype(np.int64),
                "rejected_len": out["rj_len"].astype(np.int64),
                "margin": (out["ch_len"] - out["rj_len"]).astype(np.int64),
            }
        )

    return partitioned_map_groups(
        docs.map_batches(partial, batch_format="pandas"), [g1, g2], combine
    )


def weighted_reservoir(
    ds: "ray.data.Dataset",
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    keep_cols: tuple = ("doc_id", "source", "n_chars"),
) -> "ray.data.Dataset":
    """Weighted k-sample WITHOUT replacement (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006): each row
    draws an Exp(w) key ``-ln(u)/w`` from its deterministic md5
    uniform u ∈ (0,1], and the sample is the k SMALLEST keys — the
    A-ExpJ selection, expressed bottom-k so it is associative: every
    block reduces to its own k best, the driver merges O(blocks)
    k-row partials, no shuffle, no global sort. The uniform uses
    (h52 + 1)/(2^52 + 1) so u is never 0 and both compare sides feed
    libm the identical double. Exact SQL oracle: ``ORDER BY
    -ln(u)/w, id LIMIT k``."""
    cols = list(keep_cols)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [int(x[:13], 16) for x in _md5_hex(b[id_col].to_numpy())],
            dtype=np.int64,
        )
        u = (h.astype(np.float64) + 1.0) / 4503599627370497.0
        w = b[weight_col].to_numpy(np.float64)
        key = -np.log(u) / w
        b = b[cols].assign(_key=key)
        order = np.lexsort((b[id_col].to_numpy(), key))
        return b.iloc[order[:k]]

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    order = np.lexsort((parts[id_col].to_numpy(), parts["_key"].to_numpy()))
    return ray.data.from_pandas(
        parts.iloc[order[:k]][cols].reset_index(drop=True)
    )


def train_label_pick(
    gold: "ray.data.Dataset",
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """O9 — multi-label relation pick for training example construction
    (GLRE+KIRE/data/dataset.py:85-86 ``rt = np.random.randint(len(ii))``,
    B4+KIRE/config/Config.py:399-401): when a (doc, head, tail) pair
    carries several gold relation labels, the trainer keeps ONE as the
    single-label target. Re-expressed deterministically like every
    sampling op in the engine: the pick index is the first two hex
    chars of md5("doc|h|t") mod n over the r-sorted label list, so the
    corpus-scale pick is reconstructible exactly in SQL.

    Shape: ONE exchange on doc_id (a pair never splits across docs);
    in-partition vectorized rank/size + one md5 per PAIR (group first
    rows only, np.repeat back over the sorted groups). Output:
    (doc_id, h_idx, t_idx, picked_r, n_labels).
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["doc_id", "h_idx", "t_idx", "r"], kind="mergesort"
        )
        g = part.groupby(["doc_id", "h_idx", "t_idx"], sort=False)
        n = g["r"].transform("size").to_numpy(np.int64)
        rn = g.cumcount().to_numpy(np.int64)
        firsts = rn == 0
        key = (
            part["doc_id"].astype(str)
            + "|"
            + part["h_idx"].astype(str)
            + "|"
            + part["t_idx"].astype(str)
        ).to_numpy(object)[firsts]
        n_first = n[firsts]
        idx_first = (
            np.fromiter(
                (
                    int(hashlib.md5(k.encode("utf-8")).hexdigest()[:2], 16)
                    for k in key
                ),
                dtype=np.int64,
                count=len(key),
            )
            % n_first
        )
        keep = rn == np.repeat(idx_first, n_first)
        out = part[keep]
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(object),
                "h_idx": out["h_idx"].to_numpy(np.int64),
                "t_idx": out["t_idx"].to_numpy(np.int64),
                "picked_r": out["r"].to_numpy(object),
                "n_labels": n[keep],
            }
        )

    return partitioned_map_groups(
        gold, ["doc_id"], pick, num_partitions=num_partitions
    )
