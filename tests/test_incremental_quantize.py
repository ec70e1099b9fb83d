"""Incremental (cross-corpus) dedup and int8 quantization scales."""

import numpy as np
import pandas as pd

import ray.data


def test_incremental_dedup_semantics(ray_session):
    from kire_ray.pipelines.dedup import incremental_dedup

    prior = pd.DataFrame({"doc_id": [0, 2], "text": ["alpha", "beta"]})
    new = pd.DataFrame(
        {
            "doc_id": [1, 3, 5, 7],
            "text": ["beta", "gamma", "gamma", "delta"],
        }
    )
    out = incremental_dedup(
        ray.data.from_pandas(prior).repartition(2),
        ray.data.from_pandas(new).repartition(3),
    ).to_pandas()
    # 'beta' seen in prior → dropped; 'gamma' twice in new → first id
    # wins; 'delta' fresh
    assert sorted(out["doc_id"]) == [3, 7]


def test_embedding_quantize_vs_numpy(ray_session):
    from kire_ray.pipelines.similarity import embedding_quantize_scales

    rng = np.random.default_rng(3)
    M = rng.normal(size=(200, 16)).astype(np.float32)
    df = pd.DataFrame({"embedding": list(M)})
    out = (
        embedding_quantize_scales(ray.data.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    exp = np.abs(M).max(axis=0).astype(np.float64)
    assert list(out["dim"]) == list(range(1, 17))
    np.testing.assert_allclose(out["max_abs"], exp, atol=1e-6)
    np.testing.assert_allclose(out["scale"], exp / 127.0, atol=1e-6)
    # partitioning-invariant (max is order-free)
    out2 = (
        embedding_quantize_scales(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_knn_graph_mutual_planted(ray_session):
    """Two identical vectors must form a mutual edge with cosine 1.0;
    the graph is symmetric (a<b) and partition-invariant."""
    from kire_ray.pipelines.similarity import knn_graph_mutual

    rng = np.random.default_rng(7)
    M = rng.normal(size=(40, 8))
    M[31] = M[3]  # exact duplicate pair (3, 31)
    df = pd.DataFrame({"vec_id": np.arange(40), "embedding": list(M)})
    out = (
        knn_graph_mutual(ray.data.from_pandas(df).repartition(6), k=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert (out["a"] < out["b"]).all()
    dup = out[(out["a"] == 3) & (out["b"] == 31)]
    assert len(dup) == 1 and abs(dup["cosine"].iloc[0] - 1.0) < 1e-9
    out2 = (
        knn_graph_mutual(ray.data.from_pandas(df), k=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_knn_graph_mutual_ivf_path(ray_session, monkeypatch):
    """The 100 TB path: broadcast_limit=0 forces IVF-bucketed candidate
    generation. With n_probe=None (probe every cell) it is exhaustive,
    so the mutual graph is IDENTICAL to the broadcast path's — and it
    must run without any corpus-sized driver collect (the broadcast
    builder is monkeypatched to raise; the only to_pandas allowed is
    the bounded centroid-fit sample)."""
    import kire_ray.pipelines.similarity as S

    rng = np.random.default_rng(11)
    M = rng.normal(size=(300, 8))
    M[250] = M[17]  # planted duplicate
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(M)})
    ds = ray.data.from_pandas(df).repartition(6)

    want = (
        S.knn_graph_mutual(ds, k=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    def boom(*a, **k):
        raise AssertionError("broadcast path taken above threshold")

    monkeypatch.setattr(S, "_knn_directed_broadcast", boom)
    got = (
        S.knn_graph_mutual(
            ds, k=4, broadcast_limit=0, n_centroids=8, n_probe=None,
            sample_size=64,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # finite n_probe: approximate but well-formed (a<b, within-range)
    approx = S.knn_graph_mutual(
        ds, k=4, broadcast_limit=0, n_centroids=8, n_probe=4, sample_size=64
    ).to_pandas()
    assert (approx["a"] < approx["b"]).all()
    assert set(map(tuple, approx[["a", "b"]].to_numpy())) <= set(
        map(tuple, want[["a", "b"]].to_numpy())
    ) or len(approx) > 0


def test_skipgram_pairs_window(ray_session):
    """Window-3 pairs on a known sentence, both directions, exact
    counts; invariant to partitioning."""
    from kire_ray.pipelines.text_analysis import skipgram_pairs

    docs = pd.DataFrame({"text": ["a b c a b"] * 3})
    out = (
        skipgram_pairs(
            ray.data.from_pandas(docs).repartition(3), min_count=1
        )
        .to_pandas()
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    got = {(r.center, r.context): r.n for r in out.itertuples()}
    # per doc: dist1 a-b x2, b-c, c-a; dist2 a-c, b-a, c-b; dist3 a-a, b-b
    # mirrored; ×3 docs
    assert got[("a", "b")] == (2 + 1) * 3  # dist1 ×2 + mirror of (b,a)@d2
    assert got[("a", "a")] == 2 * 3  # (pos1,pos4) both directions
    assert got[("b", "c")] == (1 + 1) * 3
    assert got[("a", "c")] == (1 + 1) * 3
    sym = {(b, a): n for (a, b), n in got.items()}
    assert sym == got  # symmetric by construction


def test_embedding_top_component_vs_svd(ray_session):
    """Power iteration converges to numpy's top right singular vector
    (up to the fixed sign); partition-invariant."""
    from kire_ray.pipelines.similarity import embedding_top_component

    rng = np.random.default_rng(11)
    # strong planted direction so 5 iterations converge tightly
    u = rng.normal(size=12)
    M = (
        np.outer(rng.normal(size=300), u) + 0.05 * rng.normal(size=(300, 12))
    ).astype(np.float64)
    df = pd.DataFrame({"embedding": list(M)})
    out = (
        embedding_top_component(
            ray.data.from_pandas(df).repartition(5), iters=12
        )
        .to_pandas()
        .sort_values("dim")["loading"]
        .to_numpy()
    )
    _, _, vt = np.linalg.svd(M, full_matrices=False)
    ref = vt[0]
    top = np.argmax(np.abs(ref))
    if ref[top] < 0:
        ref = -ref
    np.testing.assert_allclose(out, ref, atol=1e-4)
    out2 = (
        embedding_top_component(ray.data.from_pandas(df), iters=12)
        .to_pandas()
        .sort_values("dim")["loading"]
        .to_numpy()
    )
    np.testing.assert_allclose(out, out2, atol=1e-9)


def test_winsorize_caps_outliers(ray_session):
    from kire_ray.pipelines.sketches import winsorize

    rng = np.random.default_rng(5)
    v = rng.normal(size=2000)
    v[:3] = [50.0, -50.0, 40.0]  # gross outliers
    df = pd.DataFrame(
        {"event_id": np.arange(2000), "event_type": "a", "value": v}
    )
    out = (
        winsorize(
            ray.data.from_pandas(df).repartition(4),
            "value",
            group_col="event_type",
            id_col="event_id",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["value"].max() < 10 and out["value"].min() > -10
    # interior values untouched (up to rounding)
    inner = df["value"].between(-1, 1)
    np.testing.assert_allclose(
        out.loc[inner.to_numpy(), "value"],
        df.loc[inner, "value"],
        atol=1e-6,
    )


def test_image_resize_geometry(ray_session):
    """Aspect-preserving fit: longest side <= 224, never upscaled,
    ratio preserved to rounding; payload length tracks pixel count."""
    import numpy as np
    import ray.data

    from kire_ray.pipelines.multimodal import image_resize, synth_media

    media = ray.data.from_arrow(synth_media(120))
    out = image_resize(media).to_pandas()
    assert len(out) == 40  # every 3rd synth row is an image
    w, h = out["width"].to_numpy(float), out["height"].to_numpy(float)
    ow, oh = out["out_w"].to_numpy(float), out["out_h"].to_numpy(float)
    assert (np.maximum(ow, oh) <= 224).all()
    assert (ow <= w).all() and (oh <= h).all()
    scale = np.minimum(1.0, 224 / np.maximum(w, h))
    assert (np.abs(ow - np.maximum(1, np.floor(w * scale + 0.5))) == 0).all()
    n = (ow.astype(int) * oh.astype(int) // 64).clip(min=1)
    assert (out["payload"].map(len).to_numpy() == n).all()
