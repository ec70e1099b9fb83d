"""Relational / dedup / similarity / text ops vs DuckDB oracles at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data

from kire_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _cmp(ray_df: pd.DataFrame, sql: str, sort_cols, atol=1e-6):
    con = _duck()
    exp = con.execute(sql).fetchdf()
    got = ray_df[exp.columns.tolist()].sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=atol, rtol=0)


def test_q1(ray_session):
    _cmp(
        R.q1_pricing_summary(SF).to_pandas(),
        """SELECT l_returnflag, l_linestatus,
                  sum(l_quantity) AS sum_qty,
                  round(sum(l_extendedprice), 2) AS sum_base_price,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                  round(avg(l_discount), 6) AS avg_disc,
                  count(*) AS n_rows
           FROM lineitem GROUP BY 1, 2""",
        ["l_returnflag", "l_linestatus"],
        atol=1e-2,
    )


def test_top_parts(ray_session):
    _cmp(
        R.top_parts_by_revenue(SF, 10).to_pandas(),
        """SELECT p_partkey, p_name, p_brand,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2, 3 ORDER BY revenue DESC, p_partkey LIMIT 10""",
        ["p_partkey"],
        atol=1e-2,
    )


def test_customer_order_totals(ray_session):
    _cmp(
        R.customer_order_totals(SF, 20).to_pandas(),
        """SELECT o_custkey AS c_custkey, c_name, c_mktsegment,
                  round(sum(o_totalprice), 2) AS total_spend,
                  count(*) AS n_orders
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2, 3 ORDER BY total_spend DESC, c_custkey LIMIT 20""",
        ["c_custkey"],
        atol=1e-2,
    )


def test_supplier_rollup(ray_session):
    _cmp(
        R.supplier_nation_rollup(SF).to_pandas(),
        """SELECT r_name, count(*) AS n_suppliers,
                  round(sum(s_acctbal), 2) AS total_acctbal
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1""",
        ["r_name"],
        atol=1e-2,
    )


def test_events_window(ray_session):
    _cmp(
        R.events_tumbling_window(SF).to_pandas(),
        """SELECT event_type,
                  (floor(epoch(ts))::BIGINT // 3600) * 3600 AS window_start,
                  count(*) AS n_events,
                  round(sum(value), 2) AS sum_value
           FROM events GROUP BY 1, 2""",
        ["event_type", "window_start"],
        atol=1e-2,
    )


def test_sessionize(ray_session):
    _cmp(
        R.sessionize_events(SF).to_pandas(),
        """WITH t AS (
             SELECT user_id, floor(epoch(ts))::BIGINT AS e, value,
                    CASE WHEN e - lag(e) OVER w > 1800 OR lag(e) OVER w IS NULL
                         THEN 1 ELSE 0 END AS new_s
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY e)
           ), s AS (
             SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY e) AS sid FROM t
           )
           SELECT user_id, min(e) AS session_start, max(e) AS session_end,
                  count(*) AS n_events, round(sum(value), 2) AS sum_value
           FROM s GROUP BY user_id, sid""",
        ["user_id", "session_start"],
        atol=1e-2,
    )


def test_distinct_status(ray_session):
    _cmp(
        R.distinct_order_status(SF).to_pandas(),
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1",
        ["o_orderstatus"],
    )


def test_orders_lineitem_join(ray_session):
    _cmp(
        R.orders_lineitem_join_count(SF).to_pandas(),
        """SELECT o_orderstatus, count(*) AS n_lines, sum(l_quantity)::DOUBLE AS sum_qty
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1""",
        ["o_orderstatus"],
        atol=1e-2,
    )


def test_exact_dedup(ray_session):
    from kire_ray.pipelines.dedup import exact_dedup

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = exact_dedup(docs).to_pandas()
    _cmp(
        got,
        "SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY text",
        ["doc_id"],
    )


def test_text_metrics(ray_session):
    from kire_ray.pipelines.text_analysis import text_metrics

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = text_metrics(docs).to_pandas()
    _cmp(
        got[["doc_id", "n_chars", "n_tokens"]],
        """SELECT doc_id, length(text) AS n_chars,
                  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
           FROM documents""",
        ["doc_id"],
    )
    # metric invariant: quality bounded
    assert got["quality_score"].between(0, 1.5).all()
    assert (got["lang_guess"] == "en").mean() > 0.5


def test_minhash_dedup_finds_planted_dup(ray_session):
    from kire_ray.pipelines.dedup import minhash_dedup

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()[["doc_id", "text"]]
    # plant near-duplicates: copy of doc 0 with one word changed
    base = docs.text.iloc[0]
    toks = base.split()
    toks[3] = "changedword"
    planted = pd.DataFrame(
        {"doc_id": [9001, 9002], "text": [base, " ".join(toks)]}
    )
    all_docs = pd.concat([docs, planted], ignore_index=True)
    ds = ray.data.from_pandas(all_docs)
    pairs = minhash_dedup(ds, threshold=0.5).to_pandas()
    found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (0, 9001) in found  # exact copy
    assert any(9002 in p and (0 in p or 9001 in p) for p in found)  # near-dup


def test_ngram_jaccard_dedup_vs_bruteforce(ray_session):
    """Distributed blocking+verify == a sequential re-implementation of
    the operator's declared semantics (distinct word 3-grams, rare-gram
    blocking df<=cap, exact full-set Jaccard >= threshold)."""
    from itertools import combinations

    from kire_ray.pipelines.dedup import ngram_jaccard_dedup

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()[["doc_id", "text"]]
    base = docs.text.iloc[0]
    toks = base.split()
    toks[3] = "changedword"
    planted = pd.DataFrame({"doc_id": [9001, 9002], "text": [base, " ".join(toks)]})
    all_docs = pd.concat([docs, planted], ignore_index=True)

    cap, thr = 8, 0.5  # small cap so it actually binds on this corpus
    grams = {
        r.doc_id: {tuple(w[i : i + 3]) for i in range(len(w) - 2)}
        for r in all_docs.itertuples()
        if len(w := r.text.split()) >= 3
    }
    df: dict = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    expect = []
    for a, b in combinations(sorted(grams), 2):
        if not any(df[g] <= cap for g in grams[a] & grams[b]):
            continue
        inter = len(grams[a] & grams[b])
        union = len(grams[a] | grams[b])
        if inter / union >= thr:
            expect.append((a, b, inter, union))
    exp = pd.DataFrame(expect, columns=["id_a", "id_b", "n_common", "n_union"])

    got = (
        ngram_jaccard_dedup(
            ray.data.from_pandas(all_docs), ngram=3, threshold=thr, df_cap=cap
        )
        .to_pandas()[["id_a", "id_b", "n_common", "n_union"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(exp) > 0 and (exp.id_a == 0).any()  # planted pair is in gold
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_simhash_dedup(ray_session):
    from kire_ray.pipelines.dedup import simhash_dedup

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()[["doc_id", "text"]]
    planted = pd.DataFrame({"doc_id": [9001], "text": [docs.text.iloc[0]]})
    ds = ray.data.from_pandas(pd.concat([docs, planted], ignore_index=True))
    pairs = simhash_dedup(ds).to_pandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 9001) & (pairs.hamming == 0)).any()


def test_embedding_dedup(ray_session):
    from kire_ray.pipelines.dedup import embedding_dedup

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    v = np.asarray(emb.embedding.iloc[0], dtype=np.float64)
    dup = pd.DataFrame({"vec_id": [9001], "embedding": [(v * 1.001).tolist()], "label": [0]})
    ds = ray.data.from_pandas(pd.concat([emb, dup], ignore_index=True))
    pairs = embedding_dedup(ds, threshold=0.99).to_pandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 9001)).any()


def test_ann_brute_force_vs_numpy(ray_session):
    from kire_ray.pipelines.similarity import ann_brute_force

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    M = np.stack(emb.embedding.map(np.asarray)).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Q = Mn[:3]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = ann_brute_force(ds, Q, k=5).to_pandas()
    for qi in range(3):
        sims = Mn @ Q[qi]
        order = np.lexsort((emb.vec_id.to_numpy(), -sims))[:5]
        exp_ids = emb.vec_id.to_numpy()[order].tolist()
        g = got[got.query_id == qi].sort_values("rank")
        assert g.vec_id.tolist() == exp_ids, qi


def test_ann_lsh_recall(ray_session):
    from kire_ray.pipelines.similarity import ann_brute_force, ann_lsh

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    M = np.stack(emb.embedding.map(np.asarray)).astype(np.float64)
    Q = M[:4]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = ann_brute_force(ds, Q, k=10).to_pandas()
    approx = ann_lsh(ds, Q, k=10).to_pandas()
    recalls = []
    for qi in range(4):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls  # approximate by design


def test_multimodal_plumbing(ray_session):
    from kire_ray.pipelines.multimodal import (
        extract_media_features,
        frame_sample,
        synth_media,
        FEAT_DIM,
        MediaFeatureExtractor,
    )

    media = ray.data.from_arrow(synth_media(50))
    feats = extract_media_features(media).to_pandas()
    assert len(feats) == 50 and len(feats.features.iloc[0]) == FEAT_DIM
    # determinism
    feats2 = extract_media_features(ray.data.from_arrow(synth_media(50))).to_pandas()
    assert feats.sort_values("media_id").features.map(tuple).tolist() == \
        feats2.sort_values("media_id").features.map(tuple).tolist()
    # real decoder is an explicit stub
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decoder="real")._decode(b"xx")
    frames = frame_sample(media).to_pandas()
    assert (frames.frame_ms % 1000 == 0).all()


def test_fingerprints_deterministic(ray_session):
    from kire_ray.pipelines.text_analysis import fingerprints

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    a = fingerprints(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = fingerprints(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a.fingerprint.nunique() > 450  # distinct docs → distinct prints


def test_featurize_channels(ray_session, tiny_corpus):
    """Word/NER/entity channels: ids deterministic, mention positions
    marked, per-turn offsets rebased (M1/M6/M7)."""
    import numpy as np

    from kire_ray.pipelines.kg_construct import (
        KGContext,
        linked_documents,
        read_transcripts,
    )
    from kire_ray.stages.featurize import (
        CHAR_LIMIT,
        UNK_ID,
        build_word_vocab,
        char_vocab_from_counts,
        featurize,
        word_counts,
    )

    ctx = KGContext.from_corpus(tiny_corpus)
    linked = linked_documents(read_transcripts(tiny_corpus), ctx).materialize()
    counts = word_counts(linked)
    vocab = build_word_vocab(linked)
    cvocab = char_vocab_from_counts(counts)
    feats = featurize(
        linked, vocab, char_vocab=cvocab, kg_ref=ctx.kg_ref, canon_ref=ctx.canon_ref
    ).to_pandas()
    docs = linked.to_pandas().set_index("doc_id")
    assert len(feats) == len(docs)
    row = feats.iloc[0]
    doc = docs.loc[row["doc_id"]]
    words = [w for t in doc["turn_texts"] for w in t.split()]
    assert row["n_words"] == len(words) == len(row["word_ids"])
    # every in-vocab word maps consistently; no PAD inside a document
    assert all(w > 0 for w in row["word_ids"])
    assert UNK_ID not in set(row["word_ids"]), "corpus vocab covers corpus"
    # mention positions carry entity channel > 0
    ment = doc["mentions"][0]
    starts = sum(len(t.split()) for t in doc["turn_texts"][: ment["turn_idx"]])
    span = row["ent_ids"][starts + ment["start"] : starts + ment["end"]]
    assert all(v == ment["ent_idx"] + 1 for v in span)
    # B4 char channel: one id list per word, lowered chars, capped 16
    assert len(row["char_ids"]) == len(words)
    for w, cids in zip(words[:50], row["char_ids"][:50]):
        assert list(cids) == [cvocab.get(ch, UNK_ID) for ch in w.lower()[:CHAR_LIMIT]]
        assert len(cids) <= CHAR_LIMIT
    # determinism: same vocab twice
    assert build_word_vocab(linked) == vocab


def test_audio_chunk_boundaries(ray_session):
    import ray.data

    from kire_ray.pipelines.multimodal import audio_chunk, synth_media

    media = ray.data.from_arrow(synth_media(90))
    out = audio_chunk(media, chunk_ms=5000).to_pandas()
    src = synth_media(90).to_pandas()
    audio = src[src.kind == "audio"].set_index("media_id")
    assert set(out.media_id) == set(audio.index[audio.duration_ms > 0]) | {
        m for m in audio.index if audio.loc[m, "duration_ms"] == 0
    }
    for mid, g in out.groupby("media_id"):
        dur = max(int(audio.loc[mid, "duration_ms"]), 1)
        g = g.sort_values("chunk_start_ms")
        assert g.chunk_start_ms.iloc[0] == 0
        assert g.chunk_end_ms.iloc[-1] == dur
        assert (g.chunk_end_ms - g.chunk_start_ms <= 5000).all()
        # contiguous, non-overlapping
        assert (g.chunk_start_ms.iloc[1:].to_numpy() == g.chunk_end_ms.iloc[:-1].to_numpy()).all()


def test_connected_components_chain_and_islands(ray_session):
    """Distributed min-label propagation: a 9-node chain (needs multiple
    rounds), a triangle, and an isolated pair all resolve to their
    lexicographic minimum."""
    import pandas as pd

    import ray.data

    from kire_ray.stages.canonicalize import connected_components

    chain = [(f"n{i}", f"n{i+1}") for i in range(4)]          # n0..n4
    tri = [("t2", "t1"), ("t1", "t0"), ("t2", "t0")]
    pair = [("z9", "z1")]
    edges = pd.DataFrame(chain + tri + pair, columns=["src", "dst"])
    out = (
        connected_components(ray.data.from_pandas(edges), num_partitions=4, collect_limit=0)
        .to_pandas()
        .set_index("node")["label"]
    )
    assert all(out[f"n{i}"] == "n0" for i in range(5))
    assert all(out[t] == "t0" for t in ("t0", "t1", "t2"))
    assert out["z9"] == "z1" and out["z1"] == "z1"
    assert len(out) == 10


def test_embedding_similarity_gap(ray_session):
    """Guard for the embedding_dedup driver oracle: that oracle is
    exact all-pairs while the engine is LSH-bucketed — they agree only
    while no NATURAL pair approaches the 0.95 threshold (planted exact
    copies always bucket-collide). Assert the gap stays wide so any
    testdata drift fails here before it can fail the driver compare."""
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    np.fill_diagonal(S, -1.0)
    assert S.max() < 0.85, f"natural max cosine {S.max():.3f} too close to 0.95"


def test_pack_sequences_prefix_sum(ray_session):
    """Distributed two-pass prefix sum == sequential scan, with sparse
    non-contiguous ids across many blocks and a tiny range width so
    several ranges land in one hash partition (exercises the in-partition
    multi-range base logic)."""
    from kire_ray.pipelines.text_analysis import pack_sequences

    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(100_000, size=400, replace=False))
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, size=400)]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = ray.data.from_pandas(df).repartition(13)

    got = (
        pack_sequences(ds, budget=64, num_ranges=17)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    n = df.sort_values("doc_id")["text"].str.split(" ").str.len().to_numpy()
    start = np.cumsum(n) - n
    assert (got["n_tokens"].to_numpy() == n).all()
    assert (got["seq_id"].to_numpy() == start // 64).all()
    assert (got["seq_offset"].to_numpy() == start % 64).all()
    assert len(got) == 400


def test_stratified_sample_deterministic_rates(ray_session):
    """md5-threshold sampling: deterministic across runs/partitionings,
    and empirical keep-rate tracks the per-source rate."""
    from kire_ray.pipelines.sampling import stratified_sample

    df = pd.DataFrame(
        {"doc_id": np.arange(4000), "source": ["a", "b", "c", "d"] * 1000}
    )
    rates = {"a": 1.0, "b": 0.25, "c": 0.0, "d": 0.6}
    got1 = (
        stratified_sample(ray.data.from_pandas(df).repartition(7), rates)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got2 = (
        stratified_sample(ray.data.from_pandas(df).repartition(3), rates)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got1, got2)
    keep = got1.groupby("source").size()
    assert keep.get("a", 0) == 1000 and "c" not in keep.index
    assert abs(keep["b"] / 1000 - 0.25) < 0.05
    assert abs(keep["d"] / 1000 - 0.6) < 0.05


def test_per_source_cap_min_k(ray_session):
    """Hard cap keeps exactly k md5-smallest ids per source, invariant
    to partitioning (the min-k combiner merges correctly)."""
    import hashlib

    from kire_ray.pipelines.sampling import per_source_cap

    df = pd.DataFrame(
        {"doc_id": np.arange(300), "source": ["a", "b", "c"] * 100}
    )
    got = (
        per_source_cap(ray.data.from_pandas(df).repartition(9), k=5)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    exp_ids = []
    for s, g in df.groupby("source"):
        h = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i in g["doc_id"]
        )
        exp_ids += [i for _, i in h[:5]]
    assert sorted(got["doc_id"]) == sorted(exp_ids)
    assert (got.groupby("source").size() == 5).all()
    got2 = (
        per_source_cap(ray.data.from_pandas(df), k=5)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_training_shuffle_is_permutation(ray_session):
    """Every doc gets exactly one (shard, pos); positions are dense
    0..n_s-1 per shard; assignment is partitioning-invariant."""
    from kire_ray.pipelines.sampling import training_shuffle

    df = pd.DataFrame({"doc_id": np.arange(2000)})
    got = (
        training_shuffle(ray.data.from_pandas(df).repartition(9), n_shards=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == 2000 and got["doc_id"].is_unique
    for s, g in got.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    assert got["shard"].nunique() == 16
    # sizes roughly uniform (md5 byte is uniform)
    sizes = got.groupby("shard").size()
    assert sizes.min() > 60 and sizes.max() < 200


def test_redact_text_scrubs(ray_session):
    from kire_ray.pipelines.text_analysis import redact_text

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail me at a.b+x@sub.example.org or c@d.io, code 42",
                "no pii here",
                "v2 build 2024 x9",
            ],
        }
    )
    got = (
        redact_text(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.loc[0, "clean_text"] == "mail me at <EMAIL> or <EMAIL>, code <NUM>"
    assert got.loc[0, "n_emails"] == 2 and got.loc[0, "n_numbers"] == 1
    assert got.loc[1, "clean_text"] == "no pii here"
    assert got.loc[2, "clean_text"] == "v<NUM> build <NUM> x<NUM>"
    assert got.loc[2, "n_numbers"] == 3


def test_doc_chunks_sliding_window(ray_session):
    from kire_ray.pipelines.text_analysis import doc_chunks

    df = pd.DataFrame(
        {
            "doc_id": [10, 20, 30],
            "text": [
                " ".join(["w"] * 5),      # 5 tokens -> 1 chunk
                " ".join(["w"] * 128),    # exactly window -> 1 chunk
                " ".join(["w"] * 300),    # ceil((300-128)/96)+1 = 3 chunks
            ],
        }
    )
    got = (
        doc_chunks(ray.data.from_pandas(df), window=128, stride=96)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert got.groupby("doc_id")["n_chunks"].first().tolist() == [1, 1, 3]
    g = got[got.doc_id == 30]
    assert g["tok_start"].tolist() == [0, 96, 192]
    assert g["tok_end"].tolist() == [128, 224, 300]
    # full coverage: last chunk reaches the end
    assert (got.groupby("doc_id")["tok_end"].max() == [5, 128, 300]).all()


def test_fingerprints_winnowing_semantics(ray_session):
    """Hand-check the winnowing rules: short docs get one whole-doc
    window; identical docs share a fingerprint; a constant-token doc
    collapses to a single minimum."""
    import hashlib

    from kire_ray.pipelines.text_analysis import fingerprints

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c",                     # n=3 <= 8 -> 1 window
                "a b c",                     # identical -> same fp
                " ".join(["x"] * 30),        # all-same -> 1 collapsed min
                " ".join("abcdefghijklmnop"),  # 16 toks -> 9 windows pre-dedup
            ],
        }
    )
    got = (
        fingerprints(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.loc[0, "n_windows"] == 1
    assert got.loc[0, "fingerprint"] == got.loc[1, "fingerprint"]
    assert got.loc[2, "n_windows"] == 1
    # doc 1: single window min = min md5-prefix of {a,b,c}
    mn = min(hashlib.md5(t.encode()).hexdigest()[:8] for t in "abc")
    assert got.loc[0, "fingerprint"] == hashlib.md5(mn.encode()).hexdigest()
    # doc 4: trailing minima over 9 windows of the 16 distinct tokens
    hs = [hashlib.md5(t.encode()).hexdigest()[:8] for t in "abcdefghijklmnop"]
    minima = [min(hs[i : i + 8]) for i in range(9)]
    dedup = [m for j, m in enumerate(minima) if j == 0 or m != minima[j - 1]]
    assert got.loc[3, "n_windows"] == len(dedup)
    assert got.loc[3, "fingerprint"] == hashlib.md5(",".join(dedup).encode()).hexdigest()


def test_length_sorted_batches_counting_sort(ray_session):
    """Distributed counting-sort rank == sequential (n desc, id asc)
    rank, with heavy length ties split across id ranges."""
    from kire_ray.pipelines.text_analysis import length_sorted_batches

    rng = np.random.default_rng(11)
    ids = np.sort(rng.choice(50_000, size=600, replace=False))
    # only 5 distinct lengths -> massive ties, exercises range splitting
    lens = rng.choice([3, 7, 7, 7, 20], size=600)
    df = pd.DataFrame({"doc_id": ids, "text": [" ".join(["w"] * int(k)) for k in lens]})
    got = (
        length_sorted_batches(
            ray.data.from_pandas(df).repartition(11), batch_rows=32, num_ranges=9
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = df.assign(n=lens).sort_values(["n", "doc_id"], ascending=[False, True])
    exp["rank"] = np.arange(len(exp))
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    assert (got["n_tokens"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["batch_idx"].to_numpy() == exp["rank"].to_numpy() // 32).all()
    assert (got["pos_in_batch"].to_numpy() == exp["rank"].to_numpy() % 32).all()


def test_label_centroids_hand_computed(ray_session):
    import ray.data
    from kire_ray.pipelines.similarity import label_centroids

    df = pd.DataFrame(
        {
            "embedding": [[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]],
            "label": [0, 0, 1],
        }
    )
    got = (
        label_centroids(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert got["label"].tolist() == [0, 0, 1, 1]
    assert got["dim"].tolist() == [0, 1, 0, 1]
    assert got["mean"].tolist() == [2.0, 3.0, 10.0, 20.0]
    assert got["n"].tolist() == [2, 2, 1, 1]


def test_hll_distinct_accuracy_and_layout(ray_session):
    import ray.data
    from kire_ray.pipelines.sketches import hll_distinct

    rng = np.random.default_rng(5)
    n = 20_000
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b"], n),
            "user_id": rng.integers(0, 3_000, n),
        }
    )
    exact = df.groupby("event_type")["user_id"].nunique()
    got = (
        hll_distinct(
            ray.data.from_pandas(df).repartition(8), "user_id", group_col="event_type"
        )
        .to_pandas()
        .set_index("event_type")["estimate"]
    )
    for g in ("a", "b"):
        # 1024 registers -> ~3.25% standard error; 10% is a safe gate
        assert abs(got[g] - exact[g]) / exact[g] < 0.10, (g, got[g], exact[g])
    # batch-layout invariance: registers are max-merged, so the sketch
    # is independent of how rows are blocked
    got2 = (
        hll_distinct(
            ray.data.from_pandas(df).repartition(3), "user_id", group_col="event_type"
        )
        .to_pandas()
        .set_index("event_type")["estimate"]
    )
    assert (got.sort_index() == got2.sort_index()).all()


def test_cms_heavy_hitters_overcount_and_topk(ray_session):
    import ray.data
    from kire_ray.pipelines.sketches import cms_heavy_hitters

    rng = np.random.default_rng(9)
    # skewed corpus: w0 dominates
    texts = [
        " ".join(rng.choice(["w0"] * 8 + [f"w{i}" for i in range(1, 30)], 25))
        for _ in range(200)
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(200), "text": texts})
    ).repartition(6)
    got = cms_heavy_hitters(ds, k=5).to_pandas().sort_values("rank")
    exact = (
        pd.Series(" ".join(texts).split()).value_counts().sort_values(ascending=False)
    )
    # CMS never under-counts, and with vocab(30) << w(2048) collisions
    # are rare: the top hitter must be found with its exact count
    assert got.iloc[0]["word"] == exact.index[0]
    for row in got.itertuples(index=False):
        assert row.est >= exact[row.word]
    # layout invariance (integer sums commute)
    got2 = (
        cms_heavy_hitters(
            ray.data.from_pandas(pd.DataFrame({"doc_id": range(200), "text": texts})),
            k=5,
        )
        .to_pandas()
        .sort_values("rank")
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), got2.reset_index(drop=True)
    )


def test_hist_quantiles_accuracy_and_layout(ray_session):
    import ray.data
    from kire_ray.pipelines.sketches import hist_quantiles

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], 10_000),
            "v": rng.normal(100.0, 15.0, 10_000),
        }
    )
    got = (
        hist_quantiles(
            ray.data.from_pandas(df).repartition(7), "v", group_col="g"
        )
        .to_pandas()
        .set_index(["g", "q"])["est"]
    )
    for g in ("x", "y"):
        vals = np.sort(df[df.g == g]["v"].to_numpy())
        for q in (0.5, 0.9, 0.99):
            exact = vals[min(int(q * len(vals)), len(vals) - 1)]
            # 2048 bins over ~8 sigma -> bin width ~0.06: tight
            assert abs(got[(g, q)] - exact) < 0.5, (g, q, got[(g, q)], exact)
    got2 = (
        hist_quantiles(
            ray.data.from_pandas(df).repartition(2), "v", group_col="g"
        )
        .to_pandas()
        .set_index(["g", "q"])["est"]
    )
    assert (got.sort_index() == got2.sort_index()).all()


def test_pagerank_hand_graph(ray_session):
    import ray.data
    from kire_ray.pipelines.graph_algos import pagerank

    # star graph: everyone links to H, H links to one spoke
    edges = pd.DataFrame(
        {
            "h_qid": ["A", "B", "C", "D", "H"],
            "t_qid": ["H", "H", "H", "H", "A"],
        }
    )
    got = (
        pagerank(ray.data.from_pandas(edges).repartition(3))
        .to_pandas()
        .set_index("qid")["rank"]
    )
    # A receives ALL of H's rank (its only out-link) and beats the
    # plain spokes, which tie by symmetry
    assert got["A"] > got["B"] == got["C"] == got["D"]
    # sequential reference: same 10 iterations in plain numpy
    nodes = sorted(set(edges.h_qid) | set(edges.t_qid))
    idx = {q: i for i, q in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s in edges.h_qid:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        new = np.full(n, 0.15 / n)
        contrib = np.zeros(n)
        for s, t in zip(edges.h_qid, edges.t_qid):
            contrib[idx[t]] += r[idx[s]] / deg[idx[s]]
        nz = contrib > 0
        new[nz] = 0.15 / n + 0.85 * contrib[nz]
        r = new
    for q in nodes:
        assert abs(got[q] - round(r[idx[q]], 6)) < 2e-6


def test_triangle_count_hand_graph(ray_session):
    import ray.data
    from kire_ray.pipelines.graph_algos import triangle_count

    # K4 on {a,b,c,d} (4 triangles) + pendant edge + self-loop + dup edge
    edges = pd.DataFrame(
        {
            "h_qid": ["a", "a", "a", "b", "b", "c", "d", "e", "b"],
            "t_qid": ["b", "c", "d", "c", "d", "d", "e", "e", "a"],
        }
    )
    got = (
        triangle_count(ray.data.from_pandas(edges).repartition(4))
        .to_pandas()
        .iloc[0]
    )
    assert got["n_edges"] == 7  # 6 K4 edges + (d,e); loop + dup collapsed
    assert got["n_triangles"] == 4


def test_kcore_hand_graph(ray_session):
    import ray.data
    from kire_ray.pipelines.graph_algos import kcore

    # K4 {a,b,c,d} is a 3-core; e-f-g tail peels away entirely
    edges = pd.DataFrame(
        {
            "h_qid": ["a", "a", "a", "b", "b", "c", "d", "e", "f"],
            "t_qid": ["b", "c", "d", "c", "d", "d", "e", "f", "g"],
        }
    )
    got = (
        kcore(ray.data.from_pandas(edges).repartition(3), k=3)
        .to_pandas()
        .sort_values("qid")
        .reset_index(drop=True)
    )
    assert got["qid"].tolist() == ["a", "b", "c", "d"]
    assert got["degree"].tolist() == [3, 3, 3, 3]


def test_table_profile_counts_and_estimates(ray_session):
    import ray.data
    from kire_ray.pipelines.sketches import table_profile

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 500, 5000),
            "b": np.where(rng.random(5000) < 0.1, None, "x"),
        }
    )
    got = (
        table_profile(ray.data.from_pandas(df).repartition(6), ["a", "b"])
        .to_pandas()
        .set_index("column")
    )
    assert got.loc["a", "n"] == 5000 and got.loc["a", "n_null"] == 0
    assert got.loc["b", "n"] == 5000
    assert got.loc["b", "n_null"] == (df["b"].isna()).sum()
    exact_a = df["a"].nunique()
    assert abs(got.loc["a", "distinct_est"] - exact_a) / exact_a < 0.10
    assert abs(got.loc["b", "distinct_est"] - 1) < 0.01
