"""Round-3 training-data operators: span-level corpus rewrite,
alpha-smoothed mixture weights, curriculum staging, rephrase plumbing."""
import numpy as np
import pandas as pd
import pytest

import ray


def _docs(texts):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ).repartition(3)


def test_span_dedup_corpus_first_occurrence(ray_session):
    from kire_ray.pipelines.dedup import span_dedup_corpus

    span_a = " ".join(f"a{i}" for i in range(8))
    span_b = " ".join(f"b{i}" for i in range(8))
    span_c = " ".join(f"c{i}" for i in range(8))
    texts = [
        span_a + " " + span_b,          # doc 0: first occurrence of A and B
        span_a + " " + span_c,          # doc 1: A is a dup, C survives
        span_b,                         # doc 2: fully duplicated → dropped
        span_a + " " + span_a,          # doc 3: within-doc repeat, both dup'd
        "tail words only",              # doc 4: short unique span
    ]
    out = span_dedup_corpus(_docs(texts)).to_pandas().set_index("doc_id")
    assert out.loc[0, "text"] == span_a + " " + span_b
    assert out.loc[0, "n_kept"] == 2 and out.loc[0, "n_spans"] == 2
    assert out.loc[1, "text"] == span_c  # A removed, C kept
    assert out.loc[1, "n_kept"] == 1 and out.loc[1, "n_spans"] == 2
    assert 2 not in out.index  # nothing survived
    assert 3 not in out.index  # both copies of A are later occurrences
    assert out.loc[4, "text"] == "tail words only"
    # idempotence: a second pass removes nothing
    again = span_dedup_corpus(
        ray.data.from_pandas(
            out.reset_index()[["doc_id", "text"]]
        ).repartition(2)
    ).to_pandas()
    assert (again["n_kept"] == again["n_spans"]).all()


def test_mixture_weights_alpha_limits(ray_session):
    from kire_ray.pipelines.text_analysis import mixture_weights

    df = pd.DataFrame(
        {
            "text": ["w " * 99 + "w"] * 8 + ["w w"] * 2,
            "source": ["big"] * 8 + ["small"] * 2,
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    # alpha=1 → p equals the raw token share
    w1 = mixture_weights(ds, alpha=1.0).to_pandas().set_index("source")
    assert w1.loc["big", "p_alpha"] == pytest.approx(
        w1.loc["big", "token_share"], abs=2e-6
    )
    # alpha=0 → uniform over sources regardless of size
    w0 = mixture_weights(ds, alpha=0.0).to_pandas()
    assert (w0["p_alpha"] == 0.5).all()
    # alpha in between up-weights the low-resource source
    w = mixture_weights(ds, alpha=0.3).to_pandas().set_index("source")
    assert w.loc["small", "resample_factor"] > 1.0 > w.loc["big", "resample_factor"]
    assert w.loc["small", "p_alpha"] > w.loc["small", "token_share"]


def test_curriculum_schedule_stages(ray_session):
    from kire_ray.pipelines.sampling import curriculum_schedule

    texts = [" ".join(["w"] * n) for n in range(1, 41)]  # 1..40 words
    out = curriculum_schedule(_docs(texts), n_stages=4).to_pandas()
    assert sorted(out["stage"].unique()) == [0, 1, 2, 3]
    # stages are contiguous in n_words and balanced (10 docs each here)
    assert out.groupby("stage")["n_words"].max().is_monotonic_increasing
    assert (out.groupby("stage").size() == 10).all()
    # stage assignment is independent of partitioning
    out2 = curriculum_schedule(_docs(texts).repartition(7), n_stages=4).to_pandas()
    merged = out.merge(out2, on="doc_id", suffixes=("", "_b"))
    assert (merged["stage"] == merged["stage_b"]).all()
    assert (merged["order_key"] == merged["order_key_b"]).all()


def test_rephrase_docs_permutation(ray_session):
    from kire_ray.pipelines.text_analysis import Rephraser, rephrase_docs

    texts = [" ".join(f"t{i}_{j}" for j in range(20)) for i in range(6)] + [""]
    out = rephrase_docs(_docs(texts)).to_pandas().set_index("doc_id")
    # a permutation of spans preserves the word multiset
    for i in range(6):
        assert sorted(out.loc[i, "text_rephrased"].split()) == sorted(
            texts[i].split()
        )
        assert out.loc[i, "n_spans"] == 3  # 20 words / 8-word spans
    assert out.loc[6, "text_rephrased"] == "" and out.loc[6, "n_spans"] == 0
    # deterministic across runs/partitionings
    out2 = rephrase_docs(_docs(texts).repartition(5)).to_pandas().set_index("doc_id")
    assert out.sort_index().text_rephrased.tolist() == \
        out2.sort_index().text_rephrased.tolist()
    # the real-model seam is an explicit stub
    with pytest.raises(NotImplementedError):
        Rephraser(mode="real")._rewrite(1, "x")


def test_bpe_learn_classic(ray_session):
    from kire_ray.pipelines.bpe import apply_merge, bpe_learn

    # greedy-merge semantics on the padded-replace trick
    assert apply_merge("a b a b", "a", "b") == "ab ab"      # consecutive pairs
    assert apply_merge("a a a", "a", "a") == "aa a"         # overlap: leftmost wins
    assert apply_merge("x a b y", "a", "b") == "x ab y"
    assert apply_merge("ab ab", "ab", "ab") == "abab"

    # Sennrich's worked example shape: 'low'×5 'lower'×2 'newest'×6
    # 'widest'×3 → first merges are (e,s) 9, then (es,t) 9, ...
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ).repartition(4)
    m = bpe_learn(docs, n_merges=4).to_pandas()
    assert m.iloc[0][["left", "right", "count"]].tolist() == ["e", "s", 9]
    assert m.iloc[1][["left", "right", "count"]].tolist() == ["es", "t", 9]
    # deterministic across partitionings
    m2 = bpe_learn(docs.repartition(2), n_merges=4).to_pandas()
    assert m.pair.tolist() == m2.pair.tolist()
    assert m["count"].tolist() == m2["count"].tolist()


def test_containment_paths_equal(ray_session):
    """Broadcast-verify vs joined-verify produce identical pairs (the
    verify_jaccard path-equality pattern for containment_dedup)."""
    from kire_ray.pipelines.dedup import containment_dedup

    base = " ".join(f"w{i}" for i in range(30))
    texts = [
        base,                                   # 0: container
        " ".join(f"w{i}" for i in range(5, 15)),  # 1: contained in 0
        " ".join(f"w{i}" for i in range(40, 60)),  # 2: unrelated
        " ".join(f"w{i}" for i in range(50, 56)),  # 3: contained in 2
        base,                                   # 4: exact dup of 0 (excluded)
    ]
    docs = _docs(texts)
    a = containment_dedup(docs).to_pandas().sort_values(["id_a", "id_b"])
    b = containment_dedup(docs, broadcast_limit=0).to_pandas().sort_values(
        ["id_a", "id_b"]
    )
    assert a.values.tolist() == b.values.tolist()
    got = set(map(tuple, a.values.tolist()))
    assert (1, 0) in got and (3, 2) in got
    assert (4, 0) not in got and (0, 4) not in got  # exact dups excluded


def test_reservoir_sample(ray_session):
    """Bottom-k-by-md5 reservoir: matches the sequential oracle exactly,
    is partitioning-invariant, and each element is equally likely under
    the md5 prior (uniformity is by construction; we assert determinism
    + the exact bottom-k semantics)."""
    import hashlib

    from kire_ray.pipelines.sampling import reservoir_sample

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "source"],
    )
    ds = ray.data.from_pandas(docs).repartition(7)
    got = reservoir_sample(ds, 50).to_pandas()
    assert len(got) == 50

    pri = docs["doc_id"].map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
    exp = (
        docs.assign(_p=pri)
        .sort_values(["_p", "doc_id"])
        .head(50)[["doc_id", "source"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # partitioning-invariant
    got2 = reservoir_sample(ds.repartition(2), 50).to_pandas()
    pd.testing.assert_frame_equal(got, got2)


def test_pca_project(ray_session):
    """Distributed two-pass PCA == sequential numpy PCA (same sign
    convention), invariant to partitioning."""
    from kire_ray.pipelines.similarity import pca_project

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    ds = ray.data.from_pandas(emb[["vec_id", "embedding"]]).repartition(5)
    got = pca_project(ds, n_components=2).to_pandas().sort_values("vec_id")

    M = np.stack([np.asarray(x, np.float64) for x in emb["embedding"]])
    mu = M.mean(axis=0)
    C = np.cov(M, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(C)
    W = vecs[:, ::-1][:, :2].copy()
    for j in range(2):
        top = np.lexsort((np.arange(W.shape[0]), -np.abs(W[:, j])))[0]
        if W[top, j] < 0:
            W[:, j] = -W[:, j]
    P = (M - mu) @ W
    exp = pd.DataFrame(
        {"vec_id": emb["vec_id"], "pc_1": P[:, 0], "pc_2": P[:, 1]}
    ).sort_values("vec_id")
    assert np.abs(got["pc_1"].to_numpy() - exp["pc_1"].to_numpy()).max() < 1e-5
    assert np.abs(got["pc_2"].to_numpy() - exp["pc_2"].to_numpy()).max() < 1e-5
    # projection really is 2-D variance-ordered: var(pc1) >= var(pc2)
    assert got["pc_1"].var() >= got["pc_2"].var()
    got2 = pca_project(ds.repartition(2), n_components=2).to_pandas().sort_values("vec_id")
    assert np.abs(got["pc_1"].to_numpy() - got2["pc_1"].to_numpy()).max() < 1e-9


def test_grouped_reservoir(ray_session):
    """Per-group bottom-k-by-md5 == per-group sequential oracle;
    partitioning-invariant; each group capped at exactly min(k, n_g)."""
    import hashlib

    from kire_ray.pipelines.sampling import grouped_reservoir

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "source"],
    )
    ds = ray.data.from_pandas(docs).repartition(7)
    got = (
        grouped_reservoir(ds, 5)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pri = docs["doc_id"].map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
    exp = (
        docs.assign(_p=pri)
        .sort_values(["_p", "doc_id"])
        .groupby("source", sort=False)
        .head(5)[["doc_id", "source"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    sizes = got.groupby("source").size()
    caps = docs.groupby("source").size().clip(upper=5)
    assert sizes.sort_index().equals(caps.sort_index())
    got2 = (
        grouped_reservoir(ds.repartition(2), 5)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
