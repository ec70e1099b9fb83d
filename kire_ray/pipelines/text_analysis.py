"""Text analysis over a documents table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All metrics are defined on *SQL-replicable primitives* where possible
(whitespace token count, substring occurrence counts, character-class
ratios, md5-based winnowing) so the DuckDB oracle can verify them
value-for-value.

Everything is one vectorized ``map_batches`` pass — a single stateless
projection, no shuffle (the shape of the reference's per-doc stat loops,
GLRE+KIRE/data/loader.py:307-323, made columnar).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from kire_ray.functions.rounding import round_half_up

STOPWORDS = ["the", "a", "of", "to", "and"]


def _substr_count(s: pd.Series, sub: str) -> pd.Series:
    """Occurrences of ``sub`` — (len(s) - len(replace(s, sub, ''))) /
    len(sub), the exact arithmetic a SQL oracle can replicate."""
    return (s.str.len() - s.str.replace(sub, "", regex=False).str.len()) // len(sub)


def text_metrics(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(doc_id, n_chars, n_tokens, mean_word_len, stop_ratio,
    quality_score, lang_guess)."""

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        n_chars = t.str.len().astype("int64")
        no_space = t.str.replace(" ", "", regex=False).str.len().astype("int64")
        n_tokens = (n_chars - no_space + 1).astype("int64")
        mean_wl = no_space / n_tokens.clip(lower=1)
        # exact token membership (explode + isin), NOT the padded
        # substring count: ' the the ' shares the middle space, so
        # non-overlapping replace counted 1 of 2 adjacent stopwords —
        # a systematic undercount on normal prose (review r5)
        ex = t.str.split(" ").explode()
        stop = (
            ex.isin(STOPWORDS)
            .groupby(level=0)
            .sum()
            .reindex(t.index, fill_value=0)
            .astype("int64")
        )
        stop_ratio = stop / n_tokens.clip(lower=1)
        quality = round_half_up(
            (mean_wl.clip(2.0, 8.0) - 2.0) / 6.0 * 0.5
            + stop_ratio.clip(upper=0.5) * 1.0,
            6,
        )
        lang = np.where(stop_ratio > 0.02, "en", "unknown")
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "mean_word_len": round_half_up(mean_wl, 6),
                "stop_ratio": round_half_up(stop_ratio, 6),
                "quality_score": quality,
                "lang_guess": lang,
            }
        )

    return ds.map_batches(metrics, batch_format="pandas")


def fingerprints(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> "ray.data.Dataset":
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    per-token hash, trailing min over every ``window`` consecutive
    positions (valid starts ``1..max(n-w+1, 1)``), consecutive equal
    minima collapsed, fingerprint = md5 of the comma-joined minima.

    The token hash is the first 8 md5 hex chars (compared as uint32 —
    identical order to lexicographic lowercase hex), which makes the
    entire chain replicable in DuckDB SQL: ``substr(md5(w),1,8)`` +
    ``min() OVER`` + ``lag()`` + ``md5(string_agg(...))`` — so the
    driver verifies fingerprints value-for-value, not just rows.

    Vectorized across the whole batch: tokens are factorized so md5
    runs once per *distinct* token, window minima come from w-1 masked
    shift-minimum passes over the concatenated token stream (no per-doc
    loop), and minima map back to hex via searchsorted. One md5 per doc
    folds the sequence.
    """
    import hashlib

    MAXV = np.uint32(0xFFFFFFFF)

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        # split(' ') (not split()) for exact string_split parity; an
        # empty text yields the single token '' like SQL does
        tok_lists = b[text_col].str.split(" ")
        n = tok_lists.str.len().to_numpy(dtype=np.int64)
        flat = tok_lists.explode().to_numpy(dtype=object)
        codes, uniques = pd.factorize(pd.Series(flat), sort=False)
        hexes = np.empty(len(uniques), dtype="<U8")
        vals = np.empty(len(uniques), dtype=np.uint32)
        for i, u in enumerate(uniques):
            hx = hashlib.md5(str(u).encode("utf-8")).hexdigest()[:8]
            hexes[i] = hx
            vals[i] = int(hx, 16)
        h = vals[codes]
        total = len(h)
        rid = np.repeat(np.arange(len(n)), n)
        starts = np.cumsum(n) - n
        pl = np.arange(total) - starts[rid]

        # trailing window min via masked shifts (window-1 vector passes)
        m = h.copy()
        for s in range(1, window):
            shifted = np.full(total, MAXV, dtype=np.uint32)
            if total > s:
                same_doc = rid[s:] == rid[:-s]
                shifted[: total - s] = np.where(same_doc, h[s:], MAXV)
            m = np.minimum(m, shifted)

        keep = pl <= np.maximum(n[rid] - window, 0)
        mk, rk = m[keep], rid[keep]
        first = np.concatenate([[True], rk[1:] != rk[:-1]])
        changed = np.concatenate([[True], mk[1:] != mk[:-1]])
        sel = first | changed
        minima, rsel = mk[sel], rk[sel]

        order = np.argsort(vals, kind="stable")
        hex_min = hexes[order][np.searchsorted(vals[order], minima)]
        joined = pd.Series(hex_min).groupby(rsel).agg(",".join)
        fp_hex = np.array(
            [hashlib.md5(x.encode("utf-8")).hexdigest() for x in joined],
            dtype=object,
        )
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[joined.index.to_numpy()],
                "fingerprint": fp_hex,
                "n_windows": np.bincount(rsel, minlength=len(n))[
                    joined.index.to_numpy()
                ].astype(np.int64),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


def token_count_total(ds: "ray.data.Dataset", *, text_col: str = "text") -> int:
    """Corpus token count — partial sums per batch, one tiny aggregate
    (the pre-aggregation pattern; never ships rows to the driver)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        n = (t.str.len() - t.str.replace(" ", "", regex=False).str.len() + 1).sum()
        return pd.DataFrame({"n": [int(n)]})

    from ray.data.aggregate import Sum

    return int(
        ds.map_batches(partial, batch_format="pandas").aggregate(Sum("n", alias_name="total"))[
            "total"
        ]
    )


def word_frequencies(
    ds: "ray.data.Dataset", *, text_col: str = "text"
) -> "ray.data.Dataset":
    """Corpus word-frequency table (the reference's singleton/vocab
    statistics, GLRE+KIRE/data/loader.py:191-196,307-323): per-batch
    Counter combiner → one grouped exchange. SQL-replicable
    (unnest(string_split)) for the oracle."""
    from collections import Counter

    from kire_ray.stages.shuffle import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in b[text_col]:
            c.update(t.split())
        return pd.DataFrame({"word": list(c.keys()), "n": list(c.values())})

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"), ["word"], {"n": ("n", "sum")}
    )


# Gopher-style document-quality thresholds (Rae et al. 2021, table A1
# family), adapted to word-level repetition because the corpus is
# single-line text: bounds on length and mean word length, a minimum
# stopword diversity, and caps on repeated words / repeated bigrams
# (the paper's duplicate n-gram fraction with n=1,2).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 10_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_DUP_WORD_FRAC = 0.6
GOPHER_MAX_DUP_2GRAM_FRAC = 0.1


def gopher_metrics(
    b: pd.DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Vectorized per-batch Gopher metrics + ``passes`` verdict (shared
    by the ``gopher_quality`` query and the ``clean_corpus`` gate)."""
    t = b[text_col]
    no_space = t.str.replace(" ", "", regex=False).str.len().astype("int64")
    words = t.str.split()
    n_words = words.map(len).astype("int64")
    mean_wl = no_space / n_words.clip(lower=1)

    padded = " " + t + " "
    stop_hits = sum(
        padded.str.contains(f" {w} ", regex=False).astype("int64")
        for w in STOPWORDS
    )

    # long (doc, word) frame: repetition metrics via grouped nunique
    ex = pd.DataFrame(
        {
            "_i": np.repeat(np.arange(len(b)), n_words.to_numpy()),
            "w": np.concatenate([np.asarray(w, dtype=object) for w in words])
            if len(b)
            else np.array([], dtype=object),
        }
    )
    g = ex.groupby("_i", sort=False)["w"]
    n_distinct = g.nunique().reindex(range(len(b)), fill_value=0).to_numpy()
    nxt = g.shift(-1)
    ex["b2"] = ex["w"] + " " + nxt
    bg = ex.dropna(subset=["b2"]).groupby("_i", sort=False)["b2"]
    n_bg = bg.size().reindex(range(len(b)), fill_value=0).to_numpy()
    n_bg_distinct = bg.nunique().reindex(range(len(b)), fill_value=0).to_numpy()

    dup_word = 1.0 - n_distinct / n_words.clip(lower=1).to_numpy()
    dup_2gram = np.where(n_bg > 0, 1.0 - n_bg_distinct / np.maximum(n_bg, 1), 0.0)

    passes = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
        & (dup_word <= GOPHER_MAX_DUP_WORD_FRAC)
        & (dup_2gram <= GOPHER_MAX_DUP_2GRAM_FRAC)
    )
    return pd.DataFrame(
        {
            id_col: b[id_col],
            "n_words": n_words,
            "mean_word_len": round_half_up(mean_wl, 6),
            "stop_hits": stop_hits,
            "dup_word_frac": round_half_up(pd.Series(dup_word), 6),
            "dup_2gram_frac": round_half_up(pd.Series(dup_2gram), 6),
            "passes": passes.astype(bool),
        }
    )


def gopher_quality(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Gopher-style quality gate: per-doc repetition/length/stopword
    rules with a ``passes`` verdict. One stateless vectorized pass, no
    shuffle; every metric is SQL-replicable (unnest + group by) so the
    driver oracle verifies values exactly.

    Returns (doc_id, n_words, mean_word_len, stop_hits, dup_word_frac,
    dup_2gram_frac, passes).
    """
    import functools

    return ds.map_batches(
        functools.partial(gopher_metrics, text_col=text_col, id_col=id_col),
        batch_format="pandas",
    )


def source_mix(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    source_col: str = "source",
) -> "ray.data.Dataset":
    """Data-mixing table: per-source doc/token counts, the corpus
    share of each source, and the resampling weight that would flatten
    the mix to uniform (weight = mean share / source share — the
    knob a mixture-training pipeline feeds its sampler).

    Block-local combiner (one row per source per batch) → one
    source-cardinality exchange; never ships documents."""
    from kire_ray.stages.shuffle import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        toks = (
            t.str.len() - t.str.replace(" ", "", regex=False).str.len() + 1
        ).astype("int64")
        g = pd.DataFrame({source_col: b[source_col], "n_tokens": toks})
        out = g.groupby(source_col, sort=False)["n_tokens"].agg(["count", "sum"])
        return out.reset_index().rename(
            columns={"count": "n_docs", "sum": "n_tokens"}
        )

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [source_col],
        {"n_docs": ("n_docs", "sum"), "n_tokens": ("n_tokens", "sum")},
    ).to_pandas()
    total = int(agg["n_tokens"].sum())
    n_src = len(agg)
    share = agg["n_tokens"].to_numpy() / total
    out = pd.DataFrame(
        {
            source_col: agg[source_col],
            "n_docs": agg["n_docs"].astype(np.int64),
            "n_tokens": agg["n_tokens"].astype(np.int64),
            "token_share": round_half_up(pd.Series(share), 6),
            "uniform_weight": round_half_up(pd.Series((1.0 / n_src) / share), 6),
        }
    )
    return ray.data.from_pandas(out)


def mixture_weights(
    ds: "ray.data.Dataset",
    *,
    alpha: float = 0.3,
    text_col: str = "text",
    source_col: str = "source",
) -> "ray.data.Dataset":
    """Alpha-smoothed multinomial domain-mixing weights (Lample &
    Conneau 2019, "Cross-lingual Language Model Pretraining" §3.1:
    sample domain i with ``p_i ∝ q_i^alpha`` where ``q_i`` is its token
    share — alpha<1 up-weights low-resource domains): the sampling
    probability each source should get in a training mixture, plus the
    resampling factor (``p_i / q_i`` — equivalently the expected number
    of epochs over source i per corpus-sized epoch of sampling).

    Same dataflow as :func:`source_mix` — per-block combiner → one
    source-cardinality exchange → source-count-sized normalization (the
    reduced table is #domains rows, never documents).
    """
    from kire_ray.stages.shuffle import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        toks = (
            t.str.len() - t.str.replace(" ", "", regex=False).str.len() + 1
        ).astype("int64")
        g = pd.DataFrame({source_col: b[source_col], "n_tokens": toks})
        out = g.groupby(source_col, sort=False)["n_tokens"].agg(["count", "sum"])
        return out.reset_index().rename(
            columns={"count": "n_docs", "sum": "n_tokens"}
        )

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [source_col],
        {"n_docs": ("n_docs", "sum"), "n_tokens": ("n_tokens", "sum")},
    ).to_pandas()
    # deterministic normalization order (sum over sources sorted by
    # name) so the denominator is reproducible across partitionings
    agg = agg.sort_values(source_col, kind="stable").reset_index(drop=True)
    total = int(agg["n_tokens"].sum())
    q = agg["n_tokens"].to_numpy() / total
    qa = q**alpha
    p = qa / qa.sum()
    out = pd.DataFrame(
        {
            source_col: agg[source_col],
            "n_docs": agg["n_docs"].astype(np.int64),
            "n_tokens": agg["n_tokens"].astype(np.int64),
            "token_share": round_half_up(pd.Series(q), 6),
            "p_alpha": round_half_up(pd.Series(p), 6),
            "resample_factor": round_half_up(pd.Series(p / q), 6),
        }
    )
    return ray.data.from_pandas(out)


def doc_frequencies(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(word, df): number of docs containing each word. Per-batch
    doc-distinct combiner → one vocab-sized grouped exchange (the same
    dimension-table shape as ``word_frequencies``)."""
    from kire_ray.stages.shuffle import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in b[text_col]:
            c.update(set(t.split()))
        return pd.DataFrame({"word": list(c.keys()), "df": list(c.values())})

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"), ["word"], {"df": ("df", "sum")}
    )


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> "ray.data.Dataset":
    """Top-``k`` TF-IDF terms per document: score = tf · ln(N/df),
    ranked (score desc, term asc) — the classic keyword-extraction
    stage of a training-data pipeline.

    The document-frequency table is vocab-bounded, built by the
    distributed ``doc_frequencies`` exchange and broadcast once
    (``ray.put``); each batch is then a local explode + grouped
    rank — no per-doc shuffle. (For a web-scale open vocabulary, cap
    the table to the top-V terms by df or switch to a hash-partitioned
    join; the broadcast is the right call while the vocab fits a
    worker heap, which holds far beyond this corpus.)
    """
    df_tab = doc_frequencies(ds, text_col=text_col, id_col=id_col).to_pandas()
    n_docs = ds.count()
    words = np.sort(df_tab["word"].to_numpy())
    dfs = (
        df_tab.set_index("word")["df"].reindex(words).to_numpy(dtype=np.int64)
    )
    ref = ray.put((words, dfs, n_docs))

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        vocab, df_arr, n = ray.get(ref)
        ws = b[text_col].str.split()
        lens = ws.map(len).to_numpy(dtype=np.int64)
        ex = pd.DataFrame(
            {
                id_col: np.repeat(b[id_col].to_numpy(), lens),
                "term": np.concatenate(
                    [np.asarray(w, dtype=object) for w in ws]
                )
                if lens.sum()
                else np.array([], dtype=object),
            }
        )
        tc = ex.groupby([id_col, "term"], sort=False).size().rename("tf").reset_index()
        pos = np.searchsorted(vocab, tc["term"].to_numpy())
        tc["df"] = df_arr[pos]
        tc["score"] = tc["tf"].to_numpy() * np.log(n / tc["df"].to_numpy())
        tc = tc.sort_values(
            [id_col, "score", "term"], ascending=[True, False, True]
        )
        tc["rank"] = tc.groupby(id_col, sort=False).cumcount() + 1
        out = tc[tc["rank"] <= k].reset_index(drop=True)
        return pd.DataFrame(
            {
                id_col: out[id_col],
                "term": out["term"],
                "tf": out["tf"].astype(np.int64),
                "df": out["df"].astype(np.int64),
                "tfidf": round_half_up(out["score"], 6),
                "rank": out["rank"].astype(np.int64),
            }
        )

    return ds.map_batches(topk, batch_format="pandas")


def unigram_logprob(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Per-doc mean unigram log-probability under the corpus's own
    unigram LM — the SQL-verifiable analogue of model-based quality
    scoring (perplexity filtering). Two passes: the vocab-sized
    frequency exchange (broadcast once), then a streaming probe."""
    freq = word_frequencies(ds, text_col=text_col).to_pandas()
    total = int(freq["n"].sum())
    words = np.sort(freq["word"].to_numpy())
    counts = freq.set_index("word")["n"].reindex(words).to_numpy(dtype=np.int64)
    ref = ray.put((words, counts, total))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vocab, cnt, tot = ray.get(ref)
        ws = b[text_col].str.split()
        lens = ws.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {
                    id_col: b[id_col],
                    "n_tokens": lens,
                    "mean_logprob": np.zeros(len(b)),
                }
            )
        flat = np.concatenate([np.asarray(w, dtype=object) for w in ws])
        lp = np.log(cnt[np.searchsorted(vocab, flat)] / tot)
        ends = np.cumsum(lens)
        sums = np.add.reduceat(
            np.concatenate([lp, [0.0]]), np.concatenate([[0], ends[:-1]])
        )
        sums[lens == 0] = 0.0
        mean = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "n_tokens": lens,
                "mean_logprob": round_half_up(pd.Series(mean), 6),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def regex_token_counts(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Per-doc token counts under two tokenizers: whitespace and a
    BPE-ish pretokenizer regex (letter runs / digit runs / punctuation
    runs — the GPT-2 pretokenizer's class structure restricted to ASCII
    so Python re and RE2-based SQL engines agree). One vectorized pass,
    compiled pattern held per task; SQL-replicable via
    regexp_extract_all for the driver oracle."""
    import re

    pat = re.compile(BPE_PATTERN)

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        n_ws = t.str.len() - t.str.replace(" ", "", regex=False).str.len() + 1
        n_re = t.map(lambda s: len(pat.findall(s)))
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "n_ws_tokens": n_ws.astype(np.int64),
                "n_bpe_tokens": n_re.astype(np.int64),
            }
        )

    return ds.map_batches(counts, batch_format="pandas")


EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def redact_text(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """PII-style scrubbing pass: emails → ``<EMAIL>``, then digit runs
    → ``<NUM>`` (in that order — addresses contain digits), plus hit
    counts. Pure vectorized pandas-str kernels (compiled regex under
    the hood), embarrassingly parallel, no shuffle. The patterns are
    chosen to evaluate identically under Python ``re`` and RE2
    (DuckDB), so the scrubbed text itself is SQL-verifiable.
    """

    def scrub(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        n_emails = t.str.count(EMAIL_PATTERN).astype("int64")
        clean = t.str.replace(EMAIL_PATTERN, "<EMAIL>", regex=True)
        n_numbers = clean.str.count(r"[0-9]+").astype("int64")
        clean = clean.str.replace(r"[0-9]+", "<NUM>", regex=True)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_emails": n_emails.to_numpy(),
                "n_numbers": n_numbers.to_numpy(),
                "clean_text": clean.to_numpy(),
            }
        )

    return ds.map_batches(scrub, batch_format="pandas")


def doc_chunks(
    ds: "ray.data.Dataset",
    *,
    window: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Context-window chunking for long documents: overlapping
    ``window``-token spans every ``stride`` tokens (the standard
    sliding-window prep for fixed-context encoders; cf. the KG side's
    chunk_spans/stitch for the 512-token BERT limit). Emits one row per
    chunk with token offsets — vectorized np.repeat explode, doc-local,
    no shuffle.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def chunks(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        n = (
            (t.str.len() - t.str.replace(" ", "", regex=False).str.len() + 1)
            .astype("int64")
            .to_numpy()
        )
        n_chunks = np.where(n <= window, 1, (n - window + stride - 1) // stride + 1)
        total = int(n_chunks.sum())
        rid = np.repeat(np.arange(len(n)), n_chunks)
        starts = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        ci = np.arange(total) - np.repeat(starts, n_chunks)
        tok_start = ci * stride
        tok_end = np.minimum(tok_start + window, n[rid])
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[rid],
                "chunk_idx": ci.astype(np.int64),
                "tok_start": tok_start.astype(np.int64),
                "tok_end": tok_end.astype(np.int64),
                "n_chunks": n_chunks[rid].astype(np.int64),
            }
        )

    return ds.map_batches(chunks, batch_format="pandas")


def length_sorted_batches(
    ds: "ray.data.Dataset",
    *,
    batch_rows: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_ranges: int | None = None,
) -> "ray.data.Dataset":
    """Length-sorted batch assignment (the reference's sort-by-word-count
    batching for padding efficiency, B4+KIRE/config/Config.py:288):
    rank docs globally by (n_tokens desc, doc_id asc), then
    ``batch_idx = rank // batch_rows``.

    The global rank is a distributed counting sort, not a global data
    sort: pass 1 counts docs per (n_tokens, doc-id range) — a
    cardinality-bounded exchange — the driver exclusive-scans the tiny
    count table in (n desc, range asc) order, and pass 2 adds broadcast
    group offsets to an in-group cumcount. Partitioning on the
    composite (n, id-range) key keeps it skew-proof even when one
    length value dominates the corpus (the id-range splits it).
    """
    from kire_ray.stages.shuffle import cluster_cpus, grouped_agg, partitioned_map_groups

    lo, hi = [
        int(x)
        for x in ds.select_columns([id_col])
        .map_batches(
            lambda b: pd.DataFrame({"lo": [b[id_col].min()], "hi": [b[id_col].max()]}),
            batch_format="pandas",
        )
        .to_pandas()
        .agg({"lo": "min", "hi": "max"})
    ]
    n_ranges = num_ranges or max(4 * cluster_cpus(), 64)
    width = max(1, (hi - lo + n_ranges) // n_ranges)

    def tok(b: pd.DataFrame) -> pd.Series:
        t = b[text_col]
        return (
            t.str.len() - t.str.replace(" ", "", regex=False).str.len() + 1
        ).astype("int64")

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"n": tok(b), "r": (b[id_col] - lo) // width})
        out = g.groupby(["n", "r"], sort=False).size()
        return out.rename("c").reset_index()

    tbl = (
        grouped_agg(
            ds.map_batches(counts, batch_format="pandas"),
            ["n", "r"],
            {"c": ("c", "sum")},
        )
        .to_pandas()
        .sort_values(["n", "r"], ascending=[False, True])
        .reset_index(drop=True)
    )
    tbl["off"] = tbl["c"].cumsum() - tbl["c"]
    ref = ray.put(tbl[["n", "r", "off"]])

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        off_tbl = ray.get(ref)
        g = g.sort_values(["n", id_col], kind="mergesort")
        local = g.groupby(["n", "r"], sort=False).cumcount().to_numpy()
        off = g.merge(off_tbl, on=["n", "r"], how="left", sort=False)["off"].to_numpy()
        rank = off + local
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "n_tokens": g["n"].to_numpy(),
                "batch_idx": (rank // batch_rows).astype(np.int64),
                "pos_in_batch": (rank % batch_rows).astype(np.int64),
            }
        )

    keyed = ds.map_batches(
        lambda b: pd.DataFrame(
            {id_col: b[id_col], "n": tok(b), "r": (b[id_col] - lo) // width}
        ),
        batch_format="pandas",
    )
    return partitioned_map_groups(keyed, ["n", "r"], assign)


def pack_sequences(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    num_ranges: int | None = None,
) -> "ray.data.Dataset":
    """Streaming sequence packing for pretraining: assign each doc (in
    ``id_col`` order) to a fixed-token-budget training sequence by the
    running token count — ``seq_id = floor(prefix_tokens / budget)``,
    plus the doc's offset inside its sequence.

    The running count is a *distributed prefix sum* (an operator Ray
    Data has no native primitive for): range-partition on the integer
    doc id, pass 1 reduces per-range token sums (combiner + one
    range-cardinality exchange), the driver exclusive-scans the tiny
    per-range table, pass 2 re-scans streaming and adds the broadcast
    range offsets to an in-range vectorized cumsum. Docs never shuffle;
    only one row per (range, block) moves. Assumes integer doc ids
    (dense not required — ranges may be ragged, the scan only needs
    range order).
    """
    from kire_ray.stages.shuffle import cluster_cpus, grouped_agg

    lo, hi = [
        int(x)
        for x in ds.select_columns([id_col])  # id-only scan, text stays put
        .map_batches(
            lambda b: pd.DataFrame(
                {"lo": [b[id_col].min()], "hi": [b[id_col].max()]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .agg({"lo": "min", "hi": "max"})
    ]
    n_ranges = num_ranges or max(4 * cluster_cpus(), 64)
    width = max(1, (hi - lo + n_ranges) // n_ranges)

    def tok(b: pd.DataFrame) -> pd.Series:
        t = b[text_col]
        return (
            t.str.len() - t.str.replace(" ", "", regex=False).str.len() + 1
        ).astype("int64")

    def range_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"r": (b[id_col] - lo) // width, "n": tok(b)})
        out = g.groupby("r", sort=False)["n"].sum()
        return pd.DataFrame({"r": out.index.to_numpy(), "n": out.to_numpy()})

    ranges = (
        grouped_agg(
            ds.map_batches(range_partial, batch_format="pandas"),
            ["r"],
            {"n": ("n", "sum")},
        )
        .to_pandas()
        .sort_values("r")
    )
    # exclusive scan over the range-cardinality table (driver-side,
    # bounded by n_ranges regardless of corpus size)
    offs = np.zeros(int(ranges["r"].max()) + 2 if len(ranges) else 1, dtype=np.int64)
    np.add.at(offs, ranges["r"].to_numpy(dtype=np.int64) + 1, ranges["n"].to_numpy())
    offs = np.cumsum(offs)
    ref = ray.put(offs)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        range_offs = ray.get(ref)
        b = b.sort_values(id_col)
        n = tok(b).to_numpy()
        r = ((b[id_col].to_numpy() - lo) // width).astype(np.int64)
        # in-range exclusive cumsum (batch == range slice is NOT
        # guaranteed; correctness needs each range fully inside one
        # task — enforced by repartitioning on the range key below)
        csum = np.cumsum(n) - n
        new_r = np.concatenate([[True], r[1:] != r[:-1]])
        # csum is non-decreasing, so a running max over range-start
        # markers carries each range's starting csum forward
        base = np.maximum.accumulate(np.where(new_r, csum, -1))
        start = range_offs[r] + (csum - base)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_tokens": n,
                "seq_id": (start // budget).astype(np.int64),
                "seq_offset": (start % budget).astype(np.int64),
            }
        )

    from kire_ray.stages.shuffle import partitioned_map_groups

    with_r = ds.map_batches(
        lambda b: b.assign(_r=(b[id_col] - lo) // width), batch_format="pandas"
    )
    return partitioned_map_groups(with_r, ["_r"], lambda g: assign(g.drop(columns=["_r"])))


def pmi_bigrams(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> "ray.data.Dataset":
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information — the corpus-statistics stage a tokenizer-training /
    phrase-mining pipeline runs before merging multiword units.

    PMI(w1,w2) = ln( (c12/T2) / ((c1/T1)·(c2/T1)) ) over adjacent
    pairs within a document, filtered to ``c12 >= min_count``, ranked
    (pmi desc, w1 asc, w2 asc).

    Distributed shape: per-batch bigram/unigram Counter combiners →
    one grouped exchange each (``grouped_agg``); the unigram table is
    vocab-bounded and broadcast once (``ray.put`` — same documented
    trade-off as ``tfidf_top_terms``: switch to a hash join when the
    vocab outgrows a worker heap); the bigram table stays distributed
    and each block emits a partial top-k, merged in one tiny final
    sort. Shuffle volume = O(distinct bigrams), never the corpus.

    Returns (w1, w2, c12, pmi, rank) with rank 1..k.
    """
    from collections import Counter

    from kire_ray.stages.shuffle import grouped_agg

    # ONE corpus pass + ONE exchange for both tables: unigram rows ride
    # as (w, "", n), bigram rows as (w1, w2, n) — the second key is ""
    # only for unigrams (tokens are never empty on this corpus)
    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        cu: Counter = Counter()
        cb: Counter = Counter()
        for t in b[text_col]:
            ws = t.split()
            cu.update(ws)
            cb.update(zip(ws, ws[1:]))
        k1u = list(cu.keys())
        k1b, k2b = (
            ([], []) if not cb else [list(x) for x in zip(*cb.keys())]
        )
        return pd.DataFrame(
            {
                "w1": k1u + k1b,
                "w2": [""] * len(k1u) + k2b,
                "n": list(cu.values()) + list(cb.values()),
            }
        )

    counts = grouped_agg(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["w1", "w2"],
        {"n": ("n", "sum")},
    ).materialize()

    uni = counts.map_batches(
        lambda b: b[b["w2"] == ""], batch_format="pandas"
    ).to_pandas()
    t1 = float(uni["n"].sum())
    words = np.sort(uni["w1"].to_numpy())
    cnts = uni.set_index("w1")["n"].reindex(words).to_numpy(np.float64)
    uni_ref = ray.put((words, cnts, t1))

    bi = counts.map_batches(lambda b: b[b["w2"] != ""], batch_format="pandas")
    t2 = float(bi.sum("n"))

    def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        voc, cnt, tot1 = ray.get(uni_ref)
        b = b[b["n"] >= min_count]
        if not len(b):
            return pd.DataFrame(
                {"w1": [], "w2": [], "c12": [], "pmi": []}
            ).astype({"w1": object, "w2": object, "c12": np.int64, "pmi": np.float64})
        c12 = b["n"].to_numpy(np.float64)
        c1 = cnt[np.searchsorted(voc, b["w1"].to_numpy())]
        c2 = cnt[np.searchsorted(voc, b["w2"].to_numpy())]
        pmi = np.log((c12 / t2) / ((c1 / tot1) * (c2 / tot1)))
        out = pd.DataFrame(
            {
                "w1": b["w1"].to_numpy(),
                "w2": b["w2"].to_numpy(),
                "c12": b["n"].to_numpy(np.int64),
                "pmi": pmi,
            }
        )
        return out.sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True], kind="stable"
        ).head(k)

    partials = bi.map_batches(partial_topk, batch_format="pandas").to_pandas()
    top = (
        partials.sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True], kind="stable"
        )
        .head(k)
        .reset_index(drop=True)
    )
    top["pmi"] = round_half_up(top["pmi"], 6)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return ray.data.from_pandas(top)


def lang_id_trigrams(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    profile_size: int = 200,
    carry_cols: tuple = (),
) -> "ray.data.Dataset":
    """Character-trigram language identification (Cavnar–Trenkle style,
    simplified to profile-overlap so the DuckDB oracle reproduces it
    exactly): build a top-``profile_size`` trigram profile per labelled
    language, then classify every document by how many of its distinct
    trigrams hit each profile (ties → lang asc; zero-hit docs emit no
    row). On this synthetic corpus the text carries no real language
    signal — the operator is about the distributed shape + exact
    verification; on real data it is the standard n-gram langid stage.

    Distributed shape: trigram extraction is a byte-level numpy sliding
    window over each batch's concatenated text (ASCII corpus ⇒ byte ==
    char, matching SQL ``substring``; no per-row Python loop). Profile
    pass: per-batch (lang, trigram) count combiner → one grouped
    exchange (trigram-vocab-bounded) → tiny top-P table broadcast.
    Classify pass: per-batch distinct (doc, trigram) → searchsorted
    membership per language → bincount argmax. No corpus-sized shuffle.

    Returns (doc_id, pred_lang, n_hits) [+ ``carry_cols`` passed
    through from the input rows — the columns-travel-with-rows hook
    that lets lang_confusion avoid a doc-keyed join entirely].
    """
    from kire_ray.stages.shuffle import grouped_agg

    def _codes(texts: pd.Series):
        """Per-row trigram uint32 codes; returns (codes, row_idx)."""
        lens = texts.str.len().to_numpy(np.int64)
        joined = "\x00\x00".join(texts.tolist()).encode("ascii", "replace")
        a = np.frombuffer(joined, dtype=np.uint8)
        if len(a) < 3:
            return np.array([], np.uint32), np.array([], np.int64)
        w = np.lib.stride_tricks.sliding_window_view(a, 3)
        valid = ~(w == 0).any(axis=1)
        codes = (
            (w[:, 0].astype(np.uint32) << 16)
            | (w[:, 1].astype(np.uint32) << 8)
            | w[:, 2].astype(np.uint32)
        )
        rows = np.repeat(np.arange(len(texts)), np.maximum(lens - 2, 0))
        return codes[valid], rows

    def prof_partial(b: pd.DataFrame) -> pd.DataFrame:
        codes, rows = _codes(b[text_col])
        langs, lang_idx = np.unique(b[lang_col].to_numpy(), return_inverse=True)
        key = lang_idx[rows].astype(np.int64) * (1 << 24) + codes
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "lang": langs[(uniq >> 24).astype(np.int64)],
                "code": (uniq & 0xFFFFFF).astype(np.int64),
                "n": cnt.astype(np.int64),
            }
        )

    prof = grouped_agg(
        ds.map_batches(prof_partial, batch_format="pandas"),
        ["lang", "code"],
        {"n": ("n", "sum")},
    ).to_pandas()
    prof = prof.sort_values(
        ["lang", "n", "code"], ascending=[True, False, True], kind="stable"
    )
    prof["rn"] = prof.groupby("lang", sort=False).cumcount()
    prof = prof[prof["rn"] < profile_size]
    langs = np.sort(prof["lang"].unique())
    profiles = [
        np.sort(prof[prof["lang"] == lg]["code"].to_numpy(np.int64))
        for lg in langs
    ]
    ref = ray.put((langs, profiles))

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        lgs, profs = ray.get(ref)
        codes, rows = _codes(b[text_col])
        dk = np.unique(rows.astype(np.int64) * (1 << 24) + codes)
        drow, dcode = (dk >> 24).astype(np.int64), (dk & 0xFFFFFF).astype(np.int64)
        scores = np.zeros((len(b), len(lgs)), dtype=np.int64)
        for li, pr in enumerate(profs):
            pos = np.searchsorted(pr, dcode)
            hit = (pos < len(pr)) & (pr[np.minimum(pos, len(pr) - 1)] == dcode)
            scores[:, li] = np.bincount(drow[hit], minlength=len(b))
        best = scores.argmax(axis=1)  # ties → first = lang asc
        n_hits = scores[np.arange(len(b)), best]
        keep = n_hits > 0
        out = {
            id_col: b[id_col].to_numpy()[keep],
            "pred_lang": lgs[best[keep]],
            "n_hits": n_hits[keep],
        }
        for c in carry_cols:
            out[c] = b[c].to_numpy()[keep]
        return pd.DataFrame(out)

    return ds.map_batches(classify, batch_format="pandas")


def top_words_per_lang(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    k: int = 10,
) -> "ray.data.Dataset":
    """Per-language top-``k`` vocabulary — the per-subcorpus frequency
    table a multilingual tokenizer/filter pipeline builds before
    allocating vocab budget across languages.

    Distributed shape: per-batch (lang, word) Counter combiner → one
    grouped exchange (rows = distinct (lang, word), never the corpus)
    → per-block partial top-k per lang → one tiny per-lang reduce.
    Ties break (n desc, word asc); rank is 1..k per lang.
    """
    from collections import Counter

    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for lang, t in zip(b[lang_col], b[text_col]):
            for w in t.split():
                c[(lang, w)] += 1
        ks = list(c.keys())
        return pd.DataFrame(
            {
                lang_col: [x[0] for x in ks],
                "word": [x[1] for x in ks],
                "n": list(c.values()),
            }
        )

    counts = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [lang_col, "word"],
        {"n": ("n", "sum")},
    )

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(["n", "word"], ascending=[False, True], kind="stable")
            .groupby(lang_col, sort=False)
            .head(k)
        )

    def final_topk(p: pd.DataFrame) -> pd.DataFrame:
        out = (
            p.sort_values(["n", "word"], ascending=[False, True], kind="stable")
            .groupby(lang_col, sort=False)
            .head(k)
        )
        out = out.sort_values(
            [lang_col, "n", "word"], ascending=[True, False, True], kind="stable"
        ).reset_index(drop=True)
        out["rank"] = (
            out.groupby(lang_col, sort=False).cumcount().to_numpy() + 1
        ).astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = counts.map_batches(block_topk, batch_format="pandas")
    return partitioned_map_groups(partials, [lang_col], final_topk)


def skipgram_pairs(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
) -> "ray.data.Dataset":
    """Skip-gram co-occurrence counts — the (center, context) pair
    table word2vec/GloVe training data is built from: every ordered
    pair of words at distance ≤ ``window`` inside a document, counted
    corpus-wide, filtered to ``n >= min_count``.

    Same shape as ``pmi_bigrams`` generalized past adjacency: a
    per-block Counter combiner (both directions emitted locally, so
    the exchange sees pre-mirrored keys) → ONE grouped exchange over
    the distinct-pair table, never the corpus. The pair table is
    vocab²-bounded in the worst case but Zipf-sparse in practice; the
    min_count filter runs in the reducer so only surviving rows leave.
    """
    from collections import Counter

    from kire_ray.stages.shuffle import grouped_agg

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in b[text_col]:
            ws = t.split()
            for d in range(1, window + 1):
                c.update(zip(ws, ws[d:]))
                c.update(zip(ws[d:], ws))
        if not c:
            return pd.DataFrame(
                {"center": [], "context": [], "n": pd.Series([], dtype=np.int64)}
            )
        k1, k2 = [list(x) for x in zip(*c.keys())]
        return pd.DataFrame({"center": k1, "context": k2, "n": list(c.values())})

    return grouped_agg(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["center", "context"],
        {"n": ("n", "sum")},
        post=lambda out: out[out["n"] >= min_count].astype({"n": np.int64}),
    )


def bigram_logprob(
    ds: "ray.data.Dataset", *, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Per-doc mean bigram log-probability under the corpus's own
    add-1-smoothed bigram LM — the conditional upgrade of
    ``unigram_logprob``: ln P(w2|w1) = ln((c(w1 w2) + 1)/(c(w1) + V)),
    V = unigram vocabulary size.

    Same two-pass shape: one vocab-bounded exchange builds the
    unigram and bigram count tables (broadcast once — the documented
    ``tfidf_top_terms`` trade-off; swap to a count-keyed exchange when
    the bigram vocabulary outgrows a worker), then a streaming probe
    scores every adjacent pair vectorized (searchsorted over the
    sorted bigram strings; docs with <2 words score 0 over 0 pairs).
    """
    from kire_ray.stages.shuffle import grouped_agg

    def uni_part(b: pd.DataFrame) -> pd.DataFrame:
        ws = b[text_col].str.split()
        arrs = [np.asarray(w, dtype=object) for w in ws if w]
        if not arrs:  # all-empty-text batch (review r5: concatenate crash)
            return pd.DataFrame(
                {"w": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        flat = np.concatenate(arrs)
        vc = pd.Series(flat).value_counts(sort=False)
        return pd.DataFrame({"w": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)})

    def bi_part(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for t in b[text_col]:
            w = t.split()
            if len(w) >= 2:
                outs.append(
                    np.asarray([a + " " + c for a, c in zip(w[:-1], w[1:])], object)
                )
        if not outs:
            return pd.DataFrame({"b2": np.array([], object), "n": np.array([], np.int64)})
        vc = pd.Series(np.concatenate(outs)).value_counts(sort=False)
        return pd.DataFrame({"b2": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)})

    uni = grouped_agg(
        ds.map_batches(uni_part, batch_format="pandas"), ["w"], {"n": ("n", "sum")}
    ).to_pandas()
    bi = grouped_agg(
        ds.map_batches(bi_part, batch_format="pandas"), ["b2"], {"n": ("n", "sum")}
    ).to_pandas()
    V = len(uni)
    uw = np.sort(uni["w"].to_numpy(object))
    uc = uni.set_index("w")["n"].reindex(uw).to_numpy(np.int64)
    bw = np.sort(bi["b2"].to_numpy(object))
    bc = bi.set_index("b2")["n"].reindex(bw).to_numpy(np.int64)
    ref = ray.put((uw, uc, bw, bc, V))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vocab, cnt, bvoc, bcnt, vsz = ray.get(ref)
        ids, n_pairs, mean_lp = [], [], []
        for i, t in zip(b[id_col], b[text_col]):
            w = t.split()
            ids.append(i)
            if len(w) < 2:
                n_pairs.append(0)
                mean_lp.append(0.0)
                continue
            pairs = np.asarray([a + " " + c for a, c in zip(w[:-1], w[1:])], object)
            pi = np.searchsorted(bvoc, pairs)
            hit = (pi < len(bvoc)) & (bvoc[np.minimum(pi, len(bvoc) - 1)] == pairs)
            cb = np.where(hit, bcnt[np.minimum(pi, len(bvoc) - 1)], 0)
            cu = cnt[np.searchsorted(vocab, np.asarray(w[:-1], object))]
            lp = np.log((cb + 1.0) / (cu + float(vsz)))
            n_pairs.append(len(pairs))
            mean_lp.append(float(lp.sum()) / len(pairs))
        return pd.DataFrame(
            {
                id_col: np.asarray(ids),
                "n_pairs": np.asarray(n_pairs, np.int64),
                "mean_logprob": round_half_up(np.asarray(mean_lp, np.float64), 6),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def source_distinctive_terms(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    group_col: str = "source",
    top: int = 10,
) -> "ray.data.Dataset":
    """Distinctive vocabulary per slice: for each source, the ``top``
    terms by log-odds ratio vs the REST of the corpus with add-1
    smoothing — the slice-characterization screen (Monroe, Colaresi &
    Quinn 2008's informative-Dirichlet log-odds, uniform prior).

    One (group, word) combiner + one vocab-bounded exchange produce
    the contingency table; margins and log-odds are computed on the
    driver (vocabulary-sized — the ``tfidf_top_terms`` broadcast
    trade-off). delta = ln((c+1)/(n−c+V)) − ln((C−c+1)/(N−n−(C−c)+V))
    where c/n are the in-slice term count/total and C/N the corpus
    ones. Ties break word-asc; output ordered (source, rank).
    """
    from kire_ray.stages.shuffle import grouped_agg

    def part(b: pd.DataFrame) -> pd.DataFrame:
        rows_g, rows_w = [], []
        for g, t in zip(b[group_col], b[text_col]):
            w = t.split()
            rows_g.extend([g] * len(w))
            rows_w.extend(w)
        df = pd.DataFrame({group_col: rows_g, "word": rows_w})
        return (
            df.groupby([group_col, "word"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    ct = grouped_agg(
        ds.map_batches(part, batch_format="pandas"),
        [group_col, "word"],
        {"n": ("n", "sum")},
    ).to_pandas()
    V = float(ct["word"].nunique())
    N = float(ct["n"].sum())
    C = ct.groupby("word")["n"].transform("sum").to_numpy(np.float64)
    n_g = ct.groupby(group_col)["n"].transform("sum").to_numpy(np.float64)
    c = ct["n"].to_numpy(np.float64)
    delta = np.log((c + 1.0) / (n_g - c + V)) - np.log(
        (C - c + 1.0) / (N - n_g - (C - c) + V)
    )
    out = ct.assign(delta=delta).sort_values(
        [group_col, "delta", "word"], ascending=[True, False, True], kind="mergesort"
    )
    out["rank"] = out.groupby(group_col, sort=False).cumcount() + 1
    out = out[out["rank"] <= top].reset_index(drop=True)
    from kire_ray.functions.rounding import round_half_up

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                group_col: out[group_col],
                "rank": out["rank"].astype(np.int64),
                "word": out["word"],
                "n": out["n"].astype(np.int64),
                "delta": round_half_up(out["delta"].to_numpy(np.float64), 6),
            }
        )
    )


def nb_source_classifier(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Multinomial naive-Bayes source attribution, trained and scored
    on the corpus itself (add-1 smoothing) — model scoring as a pure
    dataflow, and therefore exactly SQL-verifiable end to end: the
    oracle retrains the same counts and re-scores every doc.

    Train pass = ONE (source, word) count exchange (vocab-bounded
    broadcast, the ``tfidf_top_terms`` trade-off); score pass streams
    docs through a vectorized log-likelihood matrix lookup
    (searchsorted into the sorted vocab, one (n_words × n_sources)
    numpy gather per doc). Determinism at near-ties: scores are
    quantized half-up to 6dp BEFORE the argmax on both compare sides,
    ties broken source-asc — float summation order can no longer flip
    a prediction. Returns (doc_id, actual, predicted, correct).
    """
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import grouped_agg

    def part(b: pd.DataFrame) -> pd.DataFrame:
        rows_g, rows_w = [], []
        for g, t in zip(b[group_col], b[text_col]):
            w = t.split()
            rows_g.extend([g] * len(w))
            rows_w.extend(w)
        df = pd.DataFrame({group_col: rows_g, "word": rows_w})
        return (
            df.groupby([group_col, "word"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    ct = grouped_agg(
        ds.map_batches(part, batch_format="pandas"),
        [group_col, "word"],
        {"n": ("n", "sum")},
    ).to_pandas()
    # doc counts per source for the prior
    dc = grouped_agg(
        ds.map_batches(
            lambda b: b.groupby(group_col, sort=False)
            .size()
            .rename("nd")
            .reset_index(),
            batch_format="pandas",
        ),
        [group_col],
        {"nd": ("nd", "sum")},
    ).to_pandas()

    sources = np.sort(dc[group_col].to_numpy(object))
    vocab = np.sort(ct["word"].unique().astype(object))
    V = float(len(vocab))
    tok_tot = (
        ct.groupby(group_col)["n"].sum().reindex(sources).to_numpy(np.float64)
    )
    M = np.zeros((len(vocab), len(sources)), dtype=np.float64)
    wi = np.searchsorted(vocab, ct["word"].to_numpy(object))
    si = np.searchsorted(sources, ct[group_col].to_numpy(object))
    M[wi, si] = ct["n"].to_numpy(np.float64)
    loglik = np.log((M + 1.0) / (tok_tot + V))
    prior = np.log(
        dc.set_index(group_col)["nd"].reindex(sources).to_numpy(np.float64)
        / float(dc["nd"].sum())
    )
    ref = ray.put((vocab, sources, loglik, prior))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        voc, srcs, L, P = ray.get(ref)
        pred, actual, ids = [], [], []
        for i, g, t in zip(b[id_col], b[group_col], b[text_col]):
            w = np.asarray(t.split(), dtype=object)
            s = P + (L[np.searchsorted(voc, w)].sum(axis=0) if len(w) else 0.0)
            sq = np.floor(s * 1e6 + 0.501) / 1e6  # quantized argmax
            pred.append(srcs[int(np.argmax(sq))])  # first max = src asc
            actual.append(g)
            ids.append(i)
        return pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                "actual": np.asarray(actual, dtype=object),
                "predicted": np.asarray(pred, dtype=object),
                "correct": np.asarray(
                    [a == p for a, p in zip(actual, pred)], dtype=bool
                ),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


class Rephraser:
    """Actor-pool LLM-augmentation stage (the WRAP / "Rephrasing the
    Web" recipe, Maini et al. 2024: rewrite web documents with a small
    LM to diversify a pretraining mix). The model itself is a STUB —
    this container ships no LLM — behind ``mode="real"``
    (NotImplementedError, the seam where a batched generate() call
    plugs in), while ``mode="fake"`` is a deterministic md5-keyed
    span permutation so every piece of the distributed plumbing
    (actor pool, per-actor setup, batch routing, output schema, the
    downstream join-back by doc_id) is real, testable and
    driver-verifiable in SQL.
    """

    def __init__(self, mode: str = "fake", span_words: int = 8):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.span_words = span_words
        # per-actor setup seam: tokenizer + model load lives here

    def _rewrite(self, doc_id, text: str) -> tuple[str, int]:
        if self.mode == "real":
            # STUB: no LLM in this container — plug model.generate here
            raise NotImplementedError("real rephrasing unavailable in this container")
        import hashlib

        w = text.split()
        spans = [
            " ".join(w[k : k + self.span_words])
            for k in range(0, len(w), self.span_words)
        ]
        order = sorted(
            range(len(spans)),
            key=lambda j: (
                hashlib.md5(f"{doc_id}:{j}".encode("utf-8")).hexdigest(),
                j,
            ),
        )
        return " ".join(spans[j] for j in order), len(spans)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        out = [self._rewrite(i, t) for i, t in zip(b["doc_id"], b["text"])]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "text_rephrased": [t for t, _ in out],
                "n_spans": np.array([n for _, n in out], dtype=np.int32),
            }
        )


def rephrase_docs(
    docs: "ray.data.Dataset", *, concurrency=(1, 8), batch_size: int = 256
) -> "ray.data.Dataset":
    """Rewrite every document through the :class:`Rephraser` actor pool
    (stateless rows → embarrassingly parallel; no shuffle). Documents
    with no words rephrase to the empty string."""
    from kire_ray.stages.taskpool import process_cached

    return docs.map_batches(
        process_cached(Rephraser, mode="fake"),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=None if isinstance(concurrency, tuple) else concurrency,
    )


def top_ngram_fracs(
    sf_dir: str, *, ns: tuple = (2, 3, 4)
) -> "ray.data.Dataset":
    """Per-doc top-n-gram fraction for n ∈ ``ns`` — the second half of
    Gopher's repetition-removal table (Rae et al. 2021 §A1.1: "fraction
    of characters in the most common n-gram"; word-count base here
    since the corpus is synthetic word soup). Complements
    ``gopher_metrics``'s duplicate-n-gram *fractions* with the
    most-frequent-n-gram *concentration* signal.

    Purely batch-local (each doc's n-grams never leave its block): one
    vectorized explode → shift → grouped max per batch, no shuffle.
    Columns: doc_id, n_words, top{n}_frac…
    """
    from kire_ray.sources.parquet import sized_read

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.split()
        n_words = words.map(len).astype("int64")
        ex = pd.DataFrame(
            {
                "_i": np.repeat(np.arange(len(b)), n_words.to_numpy()),
                "w": np.concatenate(
                    [np.asarray(w, dtype=object) for w in words]
                )
                if len(b)
                else np.array([], dtype=object),
            }
        )
        out = {"doc_id": b["doc_id"].to_numpy(), "n_words": n_words.to_numpy()}
        g = ex.groupby("_i", sort=False)["w"]
        gram = ex["w"].copy()
        orders = sorted(ns)
        # the running-gram extension below appends exactly one word per
        # order, so the order list must be consecutive from 2
        assert orders == list(range(2, 2 + len(orders))), orders
        for n in orders:
            # extend the running (n-1)-gram by the next word, one
            # vectorized shift per order
            if n > 1:
                nxt = g.shift(-(n - 1))
                gram = gram + " " + nxt
            cnt = (
                pd.DataFrame({"_i": ex["_i"], "g": gram})
                .dropna(subset=["g"])
                .groupby(["_i", "g"], sort=False)
                .size()
            )
            top = (
                cnt.groupby(level="_i", sort=False)
                .max()
                .reindex(range(len(b)), fill_value=0)
                .to_numpy(np.float64)
            )
            base = np.maximum(n_words.to_numpy() - (n - 1), 1)
            out[f"top{n}_frac"] = round_half_up(top / base, 6)
        return pd.DataFrame(out)

    return sized_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"]).map_batches(
        metrics, batch_format="pandas"
    )


def ccnet_buckets(sf_dir: str) -> "ray.data.Dataset":
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    language, split the corpus into head / middle / tail terciles by
    language-model score — the published pre-filtering step CCNet runs
    before keeping only head+middle. The LM is the engine's own
    add-1-smoothed bigram model (``bigram_logprob``; higher mean
    log-prob == lower perplexity == head).

    Bucketing is THRESHOLD-based on the 3dp-quantized score (ties go
    to the upper bucket), which keeps the per-(lang, score) count
    table CONSTANT-bounded (langs × score bins) — the
    curriculum_schedule value-histogram trick — so thresholds fold on
    the driver with no per-lang global sort; a rank-exact tercile
    would need the length_batches counting-sort shape instead.
    Distribution: the bigram scoring passes (vocab-bounded exchange +
    streaming probe), one hash join to attach lang (broadcast under a
    dimension-sized doc table), one bounded count exchange, then a
    stateless bucket-assign scan.

    Output: (doc_id, lang, mean_logprob, bucket).
    """
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.sources.parquet import sized_read
    from kire_ray.stages.joins import hash_join, normalize_blocks
    from kire_ray.stages.shuffle import grouped_agg

    docs = sized_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    lp = bigram_logprob(docs)

    import pyarrow.parquet as _pq

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    if n_docs <= 1_000_000:
        lang_map = _pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        from kire_ray.stages.joins import broadcast_join

        scored = broadcast_join(lp, lang_map, ["doc_id"], how="inner")
    else:
        lang_ds = sized_read(f"{sf_dir}/documents.parquet", ["doc_id", "lang"])
        scored, _ = normalize_blocks(hash_join(lp, lang_ds, ["doc_id"]))
    # consumed twice (threshold counts + final assign): one materialize
    # so the bigram scoring probe — the pipeline's most expensive
    # stage — runs once, not per consumer (review r5)
    scored = scored.materialize()

    def q3dp(v: np.ndarray) -> np.ndarray:
        return np.floor(v * 1000.0 + 0.501) / 1000.0

    def cnt_part(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"lang": b["lang"].to_numpy(object), "lp3": q3dp(b["mean_logprob"].to_numpy())}
        ).groupby(["lang", "lp3"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "lang": idx["lang"].to_numpy(object),
                "lp3": idx["lp3"].to_numpy(np.float64),
                "c": g.to_numpy(np.int64),
            }
        )

    cnts = grouped_agg(
        scored.map_batches(cnt_part, batch_format="pandas"),
        ["lang", "lp3"],
        {"c": ("c", "sum")},
    ).to_pandas()

    th = {}
    for lang, grp in cnts.groupby("lang"):
        grp = grp.sort_values("lp3", ascending=False)
        cum = grp["c"].cumsum().to_numpy()
        n = int(cum[-1])
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        lp3s = grp["lp3"].to_numpy()
        t1 = lp3s[np.searchsorted(cum, k1, side="left")]
        t2 = lp3s[np.searchsorted(cum, k2, side="left")]
        th[lang] = (t1, t2)
    ref = ray.put(th)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        lp3 = q3dp(b["mean_logprob"].to_numpy())
        t1 = np.array([t[x][0] for x in b["lang"]])
        t2 = np.array([t[x][1] for x in b["lang"]])
        bucket = np.where(lp3 >= t1, "head", np.where(lp3 >= t2, "middle", "tail"))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "lang": b["lang"].to_numpy(object),
                "mean_logprob": round_half_up(
                    b["mean_logprob"].to_numpy(np.float64), 6
                ),
                "bucket": bucket.astype(object),
            }
        )

    return scored.map_batches(assign, batch_format="pandas")


def zipf_fit(ds: "ray.data.Dataset", *, text_col: str = "text") -> "pd.DataFrame":
    """Zipf's-law fit over the corpus vocabulary: least-squares slope /
    intercept / R² of log10(frequency) against log10(rank) (rank by
    frequency desc, word asc — deterministic ties). The macro corpus
    statistic a curation pipeline tracks across snapshots: natural text
    sits near slope −1; a drifting slope flags template spam or
    boilerplate floods.

    Shape: the ``word_frequencies`` combiner + one grouped exchange do
    all the data-sized work; the fit itself runs on the vocab-bounded
    frequency table (the declared tfidf/df bound) on the driver, in one
    deterministic rank order. Returns ONE row; 6dp rounding absorbs the
    oracle's summation-order jitter (the ``lineitem_corr`` contract).
    """
    from kire_ray.functions.rounding import round_half_up

    wf = (
        word_frequencies(ds, text_col=text_col)
        .to_pandas()
        .sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )
    f = wf["n"].to_numpy(np.float64)
    n_types = len(f)
    n_tokens = int(wf["n"].sum())
    x = np.log10(np.arange(1, n_types + 1, dtype=np.float64))
    y = np.log10(f)
    n = float(n_types)
    sx, sy = x.sum(), y.sum()
    sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    return pd.DataFrame(
        {
            "n_types": np.array([n_types], dtype=np.int64),
            "n_tokens": np.array([n_tokens], dtype=np.int64),
            "slope": round_half_up(np.array([slope]), 6),
            "intercept": round_half_up(np.array([intercept]), 6),
            "r2": round_half_up(np.array([r2]), 6),
        }
    )


def k_anonymity(
    ds: "ray.data.Dataset",
    *,
    qi: tuple[str, ...] = ("lang", "source"),
    size_col: str = "n_chars",
    bucket: int = 256,
    ks: tuple[int, ...] = (2, 5, 10, 20),
) -> "ray.data.Dataset":
    """k-anonymity audit (Sweeney 2002) over a quasi-identifier tuple —
    here (lang, source, ⌊n_chars/bucket⌋): for each threshold k, how
    many QI equivalence classes have fewer than k members and how many
    rows sit in them. The re-identification-risk report a privacy
    review runs on a corpus before release; rows at risk feed
    suppression/generalization.

    Shape: block-local QI-count combiner → one grouped exchange on the
    QI tuple → per-block threshold fold (constant ``len(ks)`` rows per
    block) → a k-cardinality final combine. All outputs exact ints."""
    from kire_ray.stages.shuffle import grouped_agg

    qi = list(qi)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b[qi].copy()
        g["len_bucket"] = (b[size_col].to_numpy(np.int64) // bucket).astype(np.int64)
        return g.groupby(qi + ["len_bucket"], sort=False).size().rename("n").reset_index()

    groups = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        qi + ["len_bucket"],
        {"n": ("n", "sum")},
    )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64) if len(b) else np.array([], dtype=np.int64)
        rows = []
        for k in ks:
            m = n < k
            rows.append((k, int(m.sum()), int(n[m].sum())))
        return pd.DataFrame(
            rows, columns=["k", "n_groups_below", "n_rows_at_risk"]
        ).astype(np.int64)

    return grouped_agg(
        groups.map_batches(fold, batch_format="pandas"),
        ["k"],
        {
            "n_groups_below": ("n_groups_below", "sum"),
            "n_rows_at_risk": ("n_rows_at_risk", "sum"),
        },
        post=lambda out: out.astype(np.int64),
    )


def lang_confusion(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Confusion matrix of the trigram language-ID stage against the
    stored ``lang`` labels: (lang, pred_lang, n_docs) — the quality
    audit a multilingual curation pipeline keeps next to the classifier
    (which language pairs it confuses drives profile-size and
    threshold choices). Zero-hit documents emit no prediction and drop
    out, matching the oracle's inner join.

    Shape: the label rides the classified rows (``carry_cols`` —
    columns travel with rows, the same principle as T5), so there is
    NO doc-keyed join at all: block-local (lang, pred_lang) count
    partials off the one classify scan → a (lang ×
    pred_lang)-cardinality grouped count. The old doc-keyed tagged
    exchange moved every prediction + every label through a
    corpus-sized shuffle to rejoin what one scan already had."""
    from kire_ray.stages.shuffle import grouped_agg

    preds = lang_id_trigrams(ds, carry_cols=("lang",))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["lang", "pred_lang"], sort=False)
            .size()
            .rename("n_docs")
            .reset_index()
        )

    return grouped_agg(
        preds.map_batches(partial, batch_format="pandas"),
        ["lang", "pred_lang"],
        {"n_docs": ("n_docs", "sum")},
        post=lambda o: o.astype({"n_docs": np.int64}),
    )


def source_js_divergence(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    group_col: str = "source",
) -> "ray.data.Dataset":
    """Pairwise Jensen–Shannon divergence (bits) between per-source
    unigram distributions — the distribution-drift screen a corpus
    curator runs before mixing sources (JS ≈ 0 → redundant source;
    high JS → genuinely different text population). Symmetric and
    bounded [0, 1] bit, unlike raw KL.

    Shape: block-local (source, word) count combiner → ONE grouped
    exchange on (source, word) materializes the count table; source
    token totals fold from it (source-cardinality driver state,
    broadcast); ONE word-keyed exchange computes every word's
    contribution to every source pair vectorized (a word's rows all
    colocate, so p, q and the mixture m are complete per word); a
    final pair-keyed reduce sums the (|S|²/2)-bounded partials. The
    corpus text never moves — only count rows."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    def wc(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[text_col].str.split(" ").explode()
        return (
            pd.DataFrame(
                {"s": b[group_col].reindex(ex.index).to_numpy(), "w": ex.to_numpy()}
            )
            .groupby(["s", "w"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    counts = grouped_agg(
        ds.map_batches(wc, batch_format="pandas"),
        ["s", "w"],
        {"c": ("c", "sum")},
    ).materialize()

    totals = (
        counts.map_batches(
            lambda b: b.groupby("s", sort=False)["c"].sum().reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("s", sort=True)["c"]
        .sum()
    )
    src = totals.index.to_numpy(object)
    tot = totals.to_numpy(np.float64)
    ref = ray.put((src, tot))

    def per_word(p: pd.DataFrame) -> pd.DataFrame:
        srcs, tots = ray.get(ref)
        idx = {s: i for i, s in enumerate(srcs)}
        M = np.zeros((p["w"].nunique(), len(srcs)), dtype=np.float64)
        wi = pd.factorize(p["w"])[0]
        M[wi, [idx[s] for s in p["s"]]] = p["c"].to_numpy(np.float64)
        P = M / tots  # words x sources, per-source probability mass
        rows = []
        for i in range(len(srcs)):
            pi = P[:, i]
            for j in range(i + 1, len(srcs)):
                qj = P[:, j]
                m = 0.5 * (pi + qj)
                with np.errstate(divide="ignore", invalid="ignore"):
                    t1 = np.where(pi > 0, pi * np.log2(np.where(pi > 0, pi, 1) / np.where(m > 0, m, 1)), 0.0)
                    t2 = np.where(qj > 0, qj * np.log2(np.where(qj > 0, qj, 1) / np.where(m > 0, m, 1)), 0.0)
                rows.append((srcs[i], srcs[j], 0.5 * (t1.sum() + t2.sum())))
        return pd.DataFrame(rows, columns=["source_a", "source_b", "js"])

    def finish(out: pd.DataFrame) -> pd.DataFrame:
        srcs, tots = ray.get(ref)
        n = dict(zip(srcs, tots.astype(np.int64)))
        return pd.DataFrame(
            {
                "source_a": out["source_a"],
                "source_b": out["source_b"],
                "n_tokens_a": out["source_a"].map(n).astype(np.int64),
                "n_tokens_b": out["source_b"].map(n).astype(np.int64),
                "js_bits": round_half_up(out["js"].to_numpy(np.float64), 6),
            }
        )

    partials = partitioned_map_groups(counts, ["w"], per_word)
    return grouped_agg(
        partials,
        ["source_a", "source_b"],
        {"js": ("js", "sum")},
        post=finish,
    )


def l_diversity(
    sf_dir: str,
    *,
    ls: tuple[int, ...] = (2, 3, 5, 10),
) -> "ray.data.Dataset":
    """l-diversity audit (Machanavajjhala et al. 2007) — the companion
    to the k-anonymity report: a QI equivalence class whose SENSITIVE
    attribute takes fewer than l distinct values leaks it even when
    the class is large. QI = (event_type, day), sensitive = user_id.

    Shape: block-local distinct-(QI, user) combiner carrying partial
    row counts → ONE exchange on the QI tuple (distinct users and
    class sizes finish exactly) → constant-size threshold fold →
    l-cardinality final combine. All outputs exact ints."""
    from kire_ray.pipelines.relational import _read
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    ev = _read(sf_dir, "events", ["event_type", "ts", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (
            b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
        )
        return (
            pd.DataFrame(
                {"event_type": b["event_type"], "day": day, "user_id": b["user_id"]}
            )
            .groupby(["event_type", "day", "user_id"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def per_class(p: pd.DataFrame) -> pd.DataFrame:
        g = (
            p.groupby(["event_type", "day", "user_id"], sort=False)["n"]
            .sum()
            .reset_index()
            .groupby(["event_type", "day"], sort=False)
            .agg(n_rows=("n", "sum"), l=("user_id", "size"))
            .reset_index()
        )
        rows = []
        for l in ls:
            m = g["l"].to_numpy() < l
            rows.append((l, int(m.sum()), int(g["n_rows"].to_numpy()[m].sum())))
        return pd.DataFrame(
            rows, columns=["l", "n_groups_below", "n_rows_at_risk"]
        ).astype(np.int64)

    return grouped_agg(
        partitioned_map_groups(
            ev.map_batches(partial, batch_format="pandas"),
            ["event_type", "day"],
            per_class,
        ),
        ["l"],
        {
            "n_groups_below": ("n_groups_below", "sum"),
            "n_rows_at_risk": ("n_rows_at_risk", "sum"),
        },
    )
