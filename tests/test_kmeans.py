"""Distributed k-means + SemDeDup vs sequential numpy oracles (the
ann_ivf pattern: float-iterative → rows-only at the driver, value
equality proven here)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from kire_ray.pipelines.similarity import kmeans_clusters, semdedup

SF = "/root/testdata/sf0.001"
K, ITERS, TAU = 8, 5, 0.45


def _norm(M):
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.maximum(n, 1e-12)


@pytest.fixture(scope="module")
def oracle():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")[["vec_id", "embedding"]]
    M = _norm(np.stack([np.asarray(v, np.float64) for v in df["embedding"]]))
    ids = df["vec_id"].to_numpy(np.int64)
    h = np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16) for v in ids]
    )
    order = np.lexsort((ids, h))
    C = M[order[:K]].copy()
    for _ in range(ITERS):
        a = (M @ C.T).argmax(axis=1)
        for c in range(K):
            m = M[a == c]
            if len(m):
                C[c] = _norm(m.mean(axis=0)[None, :])[0]
    a = (M @ C.T).argmax(axis=1)
    margin = np.sort(M @ C.T, axis=1)
    return ids, M, C, a, margin[:, -1] - margin[:, -2]


def test_kmeans_matches_sequential(ray_session, oracle):
    ids, M, C, a, margin = oracle
    got = (
        kmeans_clusters(SF, k=K, iters=ITERS)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(ids)
    order = np.argsort(ids)
    want_a = a[order]
    # distributed partial-sum association can move centroids by ulps;
    # require agreement wherever the top-2 margin isn't degenerate
    solid = margin[order] > 1e-9
    assert solid.mean() > 0.99
    np.testing.assert_array_equal(
        got["cluster"].to_numpy()[solid], want_a[solid]
    )
    # all clusters non-trivially populated on this corpus
    assert got["cluster"].nunique() == K
    sim = (M[order] @ C.T)[np.arange(len(ids)), want_a]
    np.testing.assert_allclose(
        got["cosine"].to_numpy()[solid], sim[solid], atol=1e-9
    )


def test_semdedup_matches_sequential(ray_session, oracle):
    ids, M, C, a, margin = oracle
    got = (
        semdedup(SF, k=K, iters=ITERS, tau=TAU)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(ids)
    order = np.argsort(ids)
    sids, sM, sa = ids[order], M[order], a[order]
    want_dup = np.zeros(len(sids), dtype=bool)
    for c in range(K):
        m = sa == c
        sub, sub_ids = sM[m], sids[m]
        o2 = np.argsort(sub_ids)
        S = sub[o2] @ sub[o2].T
        d = (np.tril(S, -1) >= TAU).any(axis=1)
        idx = np.where(m)[0][o2]
        want_dup[idx] = d
    solid = margin[order] > 1e-9
    np.testing.assert_array_equal(
        got["is_dup"].to_numpy()[solid], want_dup[solid]
    )
    # the synthetic corpus plants near-duplicate embeddings — the
    # operator must actually catch some
    assert got["is_dup"].sum() > 0


def test_pq_codes_match_sequential(ray_session):
    """pq_codes vs a sequential numpy replay of the same PQ fit
    (same md5 init, same L2 Lloyd updates, same tie-breaks)."""
    from kire_ray.pipelines.similarity import pq_codes

    M_, ITERS_, KK = 4, 3, 16
    df = pd.read_parquet(f"{SF}/embeddings.parquet")[["vec_id", "embedding"]]
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    ids = df["vec_id"].to_numpy(np.int64)
    h = np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16) for v in ids]
    )
    order = np.lexsort((ids, h))
    d = X.shape[1]
    ds_ = d // M_
    C = np.stack(
        [X[order[:KK], j * ds_ : (j + 1) * ds_].copy() for j in range(M_)]
    )
    for _ in range(ITERS_):
        for j in range(M_):
            Xi = X[:, j * ds_ : (j + 1) * ds_]
            d2 = (
                (Xi * Xi).sum(axis=1)[:, None]
                - 2.0 * Xi @ C[j].T
                + (C[j] * C[j]).sum(axis=1)[None, :]
            )
            a = d2.argmin(axis=1)
            for c in range(KK):
                m = Xi[a == c]
                if len(m):
                    C[j][c] = m.mean(axis=0)
    exp_codes = np.empty((len(X), M_), dtype=np.int64)
    err2 = np.zeros(len(X))
    for j in range(M_):
        Xi = X[:, j * ds_ : (j + 1) * ds_]
        d2 = (
            (Xi * Xi).sum(axis=1)[:, None]
            - 2.0 * Xi @ C[j].T
            + (C[j] * C[j]).sum(axis=1)[None, :]
        )
        exp_codes[:, j] = d2.argmin(axis=1)
        r = Xi - C[j][exp_codes[:, j]]
        err2 += (r * r).sum(axis=1)
    exp_err = np.sqrt(err2)

    got = (
        pq_codes(SF, m=M_, k=KK, iters=ITERS_)
        .to_pandas()
        .sort_values(["vec_id", "subspace"])
        .reset_index(drop=True)
    )
    assert len(got) == len(X) * M_
    by_id = {v: i for i, v in enumerate(ids)}
    g_codes = got["code"].to_numpy(np.int64).reshape(-1, M_)
    g_ids = got["vec_id"].to_numpy(np.int64)[::M_]
    for gi, vid in enumerate(g_ids):
        i = by_id[vid]
        assert (g_codes[gi] == exp_codes[i]).all(), (vid, g_codes[gi], exp_codes[i])
    err_by_vid = dict(zip(got["vec_id"][::M_], got["recon_err"][::M_]))
    for vid, i in list(by_id.items())[:100]:
        assert abs(err_by_vid[vid] - exp_err[i]) < 1e-5
    # compression sanity: codes span the codebook
    assert got["code"].max() < KK and got["code"].nunique() > 1
