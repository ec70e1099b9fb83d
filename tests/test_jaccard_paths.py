"""verify_jaccard scale path: the joined (distributed) verification
must produce exactly the broadcast path's pairs on a dup-heavy corpus
(the case where driver-side candidate materialization would blow up)."""

import numpy as np
import pandas as pd

import ray.data

from kire_ray.pipelines.dedup import minhash_dedup, ngram_jaccard_dedup


def _dup_heavy_corpus(n_families: int = 40, family: int = 6) -> pd.DataFrame:
    """Most of the corpus is near-duplicate families: every doc is a
    light mutation of its family base — candidate volume ~ corpus."""
    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(300)]
    rows = []
    did = 0
    for f in range(n_families):
        base = list(rng.choice(vocab, size=40))
        for k in range(family):
            toks = list(base)
            if k:  # mutate one token per variant
                toks[int(rng.integers(0, len(toks)))] = f"mut{f}_{k}"
            rows.append({"doc_id": did, "text": " ".join(toks)})
            did += 1
    return pd.DataFrame(rows)


def test_joined_verify_equals_broadcast(ray_session):
    docs = _dup_heavy_corpus()
    ds = ray.data.from_pandas(docs).repartition(8)

    def run(limit):
        out = minhash_dedup(ds, threshold=0.6, broadcast_limit=limit).to_pandas()
        out = out[["id_a", "id_b", "jaccard"]].sort_values(["id_a", "id_b"])
        return out.reset_index(drop=True)

    broadcast = run(10**9)  # force driver-broadcast path
    joined = run(0)  # force distributed join path
    assert len(broadcast) > 50  # dup-heavy: plenty of verified pairs
    pd.testing.assert_frame_equal(broadcast, joined)
    # within-family pairs dominate and cross-family pairs don't verify
    fam = lambda d: d // 6
    assert (fam(broadcast.id_a.to_numpy()) == fam(broadcast.id_b.to_numpy())).all()


def test_ngram_jaccard_joined_equals_broadcast(ray_session):
    """Same dual-path invariant through the n-gram Jaccard operator:
    exhaustive rare-gram blocking feeds the shared verify, so both
    verify paths must emit identical (pair, counts, jaccard) rows."""
    docs = _dup_heavy_corpus()
    ds = ray.data.from_pandas(docs).repartition(8)

    def run(limit):
        out = ngram_jaccard_dedup(
            ds, ngram=3, threshold=0.6, df_cap=16, broadcast_limit=limit
        ).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    broadcast = run(10**9)
    joined = run(0)
    assert len(broadcast) > 50
    pd.testing.assert_frame_equal(broadcast, joined)


def test_setsim_join_complete_vs_bruteforce(ray_session):
    """The prefix filter must be lossless: setsim_join's output equals
    the brute-force all-pairs exact Jaccard on a dup-heavy corpus
    (where df-capped blocking WOULD lose pairs)."""
    from kire_ray.pipelines.dedup import _shingles, setsim_join

    docs = _dup_heavy_corpus()
    ds = ray.data.from_pandas(docs).repartition(8)
    got = (
        setsim_join(ds, ngram=3, threshold=0.6)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    sets = {r.doc_id: _shingles(r.text, 3) for r in docs.itertuples()}
    rows = []
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(np.intersect1d(sets[a], sets[b], assume_unique=True))
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= 0.6:
                rows.append((a, b, inter, union))
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "n_common", "n_union"])
    assert len(want) > 50  # dup-heavy: the filter is actually exercised
    pd.testing.assert_frame_equal(
        got[["id_a", "id_b", "n_common", "n_union"]],
        want.astype(got[["id_a", "id_b", "n_common", "n_union"]].dtypes.to_dict()),
    )


def test_containment_dedup_planted(ray_session):
    import ray.data
    from kire_ray.pipelines.dedup import containment_dedup

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(20)]
    # plant: doc 20 = middle slice of doc 0; doc 21 = doc 1 + suffix;
    # doc 22 = exact copy of doc 2 (must NOT appear: texts equal)
    texts.append(" ".join(texts[0].split()[5:15]))
    texts.append(texts[1] + " " + " ".join(rng.choice(vocab, 4)))
    texts.append(texts[2])
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(5)
    got = containment_dedup(ds).to_pandas()
    pairs = set(zip(got.id_a, got.id_b))
    assert (20, 0) in pairs
    assert (1, 21) in pairs
    assert (22, 2) not in pairs and (2, 22) not in pairs
    # oracle: brute force over all ordered pairs
    want = {
        (i, j)
        for i in range(len(texts))
        for j in range(len(texts))
        if i != j
        and texts[i] != texts[j]
        and (" " + texts[i] + " ") in (" " + texts[j] + " ")
    }
    assert pairs == want


def test_fuzzy_pairs_complete_vs_bruteforce(ray_session):
    """Deletion-neighborhood blocking must be lossless for distance 1:
    equals the brute-force Levenshtein-1 pair set (mixed indels and
    substitutions planted)."""
    from kire_ray.pipelines.dedup import fuzzy_pairs

    names = [
        "alpha", "alphb", "alph", "aalpha", "beta", "betas", "bets",
        "gamma", "gxmma", "delta", "delta", "delt", "epsilon",
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"c_name": names})).repartition(4)
    got = set(
        map(tuple, fuzzy_pairs(ds, col="c_name").to_pandas().to_numpy())
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(names))
    want = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if lev(a, b) == 1
    }
    assert want  # fixture actually exercises both indel and substitution
    assert got == want


def test_dedup_corpus_invariants(ray_session):
    """Survivors = all docs minus clustered non-representatives; every
    cluster keeps exactly its min id."""
    from kire_ray.pipelines.dedup import dedup_corpus, dup_clusters, ngram_jaccard_dedup

    docs = _dup_heavy_corpus()
    ds = ray.data.from_pandas(docs).repartition(8)
    pairs = ngram_jaccard_dedup(ds, ngram=3, threshold=0.6, df_cap=16)
    clusters = dup_clusters(pairs)
    lab = clusters.to_pandas()
    surv = set(dedup_corpus(ds, dup_clusters(pairs)).to_pandas()["doc_id"])
    all_ids = set(docs["doc_id"])
    clustered = set(lab["node"].astype(int))
    reps = set(lab.loc[lab["node"] == lab["label"], "node"].astype(int))
    assert surv == (all_ids - clustered) | reps
    assert len(reps) > 0 and len(clustered - reps) > 0  # non-trivial fixture
