"""Property tests (hypothesis) — SURVEY.md §5: the per-turn
text-equality invariant under arbitrary row orderings, and grouped_agg
≡ pandas for arbitrary key/value frames."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

import ray.data

from kire_ray.stages.assemble import assemble_documents
from kire_ray.stages.shuffle import grouped_agg


@st.composite
def transcript_frames(draw):
    n_convs = draw(st.integers(1, 8))
    rows = []
    for c in range(n_convs):
        n_turns = draw(st.integers(1, 6))
        for t in range(n_turns):
            text = draw(st.text(alphabet="abc xyz", min_size=0, max_size=20))
            rows.append((f"c{c}", t, "user", text, None, 1_700_000_000_000_000 + t))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    perm = draw(st.permutations(range(len(df))))
    return df.iloc[list(perm)].reset_index(drop=True)


@settings(max_examples=8, deadline=None)
@given(transcript_frames())
def test_assemble_per_turn_text_equality(ray_session, df):
    """BASELINE.json invariant: every assembled doc's turn_texts[i]
    equals the input row with that turn_idx, regardless of input order."""
    docs = assemble_documents(
        ray.data.from_pandas(df).repartition(3), num_partitions=5
    ).to_pandas()
    assert len(docs) == df["conv_id"].nunique()
    for row in docs.itertuples():
        ref = df[df["conv_id"] == row.doc_id].sort_values("turn_idx", kind="stable")
        assert list(row.turn_texts) == list(ref["text"])
        assert row.n_turns == len(ref)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.floats(-10, 10)),
        min_size=1,
        max_size=200,
    )
)
def test_grouped_agg_equals_pandas(ray_session, rows):
    df = pd.DataFrame(rows, columns=["k1", "k2", "v"])
    out = (
        grouped_agg(
            ray.data.from_pandas(df).repartition(3),
            ["k1", "k2"],
            {"s": ("v", "sum"), "n": ("v", "size")},
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    ref = (
        df.groupby(["k1", "k2"], sort=False)
        .agg(s=("v", "sum"), n=("v", "size"))
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref, check_dtype=False, rtol=1e-9)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    ),
    st.sampled_from([2, 4, 6]),
)
def test_round_half_up_matches_duckdb(values, digits):
    """The parity contract: round_half_up(x, d) equals DuckDB evaluating
    sql_round('x', d) for arbitrary doubles — the property every
    oracle-checked float column relies on."""
    import duckdb

    from kire_ray.functions.rounding import round_half_up, sql_round

    con = duckdb.connect()
    expr = sql_round("v", digits)
    got = round_half_up(np.array(values), digits)
    ref = [
        con.execute(f"SELECT {expr} FROM (SELECT CAST(? AS DOUBLE) AS v)", [v]).fetchone()[0]
        for v in values
    ]
    assert np.array_equal(got, np.array(ref, dtype=np.float64))


@given(
    st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=20),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=60, deadline=None)
def test_wordpiece_roundtrip_under_chunk_vocab(words):
    """Property: under a vocab containing every CHUNK-slice of every
    word, greedy WordPiece emits exactly ceil(len/CHUNK) pieces, never
    [UNK], and the pieces rejoin to the word (subword.py count law)."""
    from kire_ray.stages.subword import CHUNK, SPECIALS, UNK, wordpiece

    pieces_set = set()
    for w in words:
        for i in range(0, len(w), CHUNK):
            p = w[i : i + CHUNK]
            pieces_set.add(p if i == 0 else "##" + p)
    vocab = {s: i for i, s in enumerate(SPECIALS)}
    for p in sorted(pieces_set):
        vocab[p] = len(vocab)
    for w in words:
        pieces = wordpiece(w, vocab)
        assert len(pieces) == -(-len(w) // CHUNK)
        assert UNK not in pieces
        assert "".join(p.removeprefix("##") for p in pieces) == w


@given(st.lists(st.integers(0, 2000), min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_ep_dis_antisymmetry_property(deltas):
    """ep_dis_signed(d) + ep_dis_signed(-d) == 20 for every nonzero
    delta (and == 20 trivially at 0): the SSAN shift keeps the pair
    channel antisymmetric around 10."""
    import numpy as np

    from kire_ray.stages.featurize import ep_dis_signed

    d = np.asarray(deltas, dtype=np.int64)
    assert (ep_dis_signed(d) + ep_dis_signed(-d) == 20).all()


def test_kmv_estimate_accuracy(ray_session):
    """KMV estimates must land within ~3/sqrt(k) of the exact distinct
    counts on the saturated slices (and exactly on unsaturated ones)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kire_ray.pipelines.sketches import kmv_set_ops

    SF = "/root/testdata/sf0.01"
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].astype("int64") // 86400_000_000

    def keys(t):
        s = ev[ev["event_type"] == t]
        return set(zip(s["user_id"], s["day"]))

    a, b = keys("purchase"), keys("click")
    ds = ray.data.from_pandas(ev[["user_id", "day", "event_type"]]).repartition(8)
    got = kmv_set_ops(ds, key_cols=("user_id", "day")).to_pandas().iloc[0]
    tol = 3.0 / np.sqrt(256)  # ~19% at k=256
    for est, exact in [
        (got["est_a"], len(a)),
        (got["est_b"], len(b)),
        (got["est_union"], len(a | b)),
    ]:
        assert abs(est - exact) / exact < tol, (est, exact)


@st.composite
def random_graphs(draw):
    n = draw(st.integers(2, 16))
    m = draw(st.integers(1, 24))
    edges = [
        (f"n{draw(st.integers(0, n - 1)):02d}", f"n{draw(st.integers(0, n - 1)):02d}")
        for _ in range(m)
    ]
    return [(a, b) for a, b in edges if a != b] or [("n00", "n01")]


@given(random_graphs())
@settings(max_examples=15, deadline=None)
def test_connected_components_matches_union_find(ray_session, pairs):
    """Distributed CC ≡ driver-side union-find on arbitrary graphs —
    same components, same lexicographic-min representatives."""
    from kire_ray.stages.canonicalize import (
        canon_map_from_pairs,
        connected_components,
    )

    edges = pd.DataFrame(pairs, columns=["src", "dst"]).drop_duplicates()
    got = (
        connected_components(ray.data.from_pandas(edges), num_partitions=3, collect_limit=0)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    cm = canon_map_from_pairs(pairs)
    nodes = set(edges["src"]) | set(edges["dst"])
    want = {v: cm.get(v, v) for v in nodes}
    assert got == want


@given(st.integers(0, 2**31 - 1), st.integers(1, 4))
@settings(max_examples=10, deadline=None)
def test_tune_theta_distributed_matches_numpy(ray_session, seed, dup):
    """Distributed theta tuning ≡ numpy path on random score tables
    with random tie structure (scores quantized to force ties)."""
    from kire_ray.pipelines.eval import tune_theta, tune_theta_distributed

    rng = np.random.RandomState(seed)
    n = rng.randint(10, 400)
    scores = np.round(rng.rand(n), dup)  # coarser rounding → more ties
    corr = (rng.rand(n) < 0.5).astype(np.int64)
    df = pd.DataFrame(
        {"score": scores, "is_correct": corr, "k": np.arange(n, dtype=np.int64)}
    )
    n_gold = max(1, int(corr.sum()))
    want = tune_theta(df["score"].to_numpy(), df["is_correct"].to_numpy(), n_gold)
    got = tune_theta_distributed(
        ray.data.from_pandas(df).repartition(3),
        n_gold=n_gold,
        tiebreak_cols=("k",),
        n_buckets=16,
    )
    for key in ("theta", "best_f1", "precision", "recall"):
        assert got[key] == want[key], (key, seed)
    assert abs(got["auc"] - want["auc"]) < 1e-10


@given(st.integers(0, 2**31 - 1), st.integers(2, 8))
@settings(max_examples=8, deadline=None)
def test_salted_join_matches_plain(ray_session, seed, n_salts):
    """salted_hash_join ≡ hash_join for arbitrary hot-key sets and
    salt counts (inner join, random skew)."""
    from kire_ray.stages.joins import hash_join, salted_hash_join

    rng = np.random.RandomState(seed)
    n = rng.randint(50, 500)
    keys = rng.choice([f"k{i}" for i in range(rng.randint(2, 12))], n)
    fact = pd.DataFrame({"k": keys.astype(object), "v": np.arange(n, dtype=np.int64)})
    dim_keys = sorted(set(keys))[: max(1, len(set(keys)) - 1)]  # drop one → unmatched rows
    dim = pd.DataFrame(
        {"k": np.array(dim_keys, object), "w": np.arange(len(dim_keys), dtype=np.int64)}
    )
    hot = frozenset(rng.choice(dim_keys, size=min(2, len(dim_keys)), replace=False))
    fds = ray.data.from_pandas(fact).repartition(3)
    dds = ray.data.from_pandas(dim)
    want = (
        hash_join(fds, dds, on=["k"]).to_pandas().sort_values(["v"]).reset_index(drop=True)
    )
    got = (
        salted_hash_join(fds, dds, ["k"], hot_keys=hot, n_salts=n_salts)
        .to_pandas()
        .sort_values(["v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v", "w"]], want[["k", "v", "w"]])


@given(st.integers(0, 2**31 - 1), st.integers(2, 8))
@settings(max_examples=8, deadline=None)
def test_frag_replicate_join_matches_plain(ray_session, seed, n_salts):
    """frag_replicate_join ≡ hash_join under random skew and salt
    counts (skew-oblivious: no hot-key set at all), inner + left_outer
    with unmatched probe rows present."""
    from kire_ray.stages.joins import frag_replicate_join, hash_join

    rng = np.random.RandomState(seed)
    n = rng.randint(50, 500)
    keys = rng.choice([f"k{i}" for i in range(rng.randint(2, 12))], n)
    fact = pd.DataFrame({"k": keys.astype(object), "v": np.arange(n, dtype=np.int64)})
    dim_keys = sorted(set(keys))[: max(1, len(set(keys)) - 1)]
    dim = pd.DataFrame(
        {"k": np.array(dim_keys, object), "w": np.arange(len(dim_keys), dtype=np.int64)}
    )
    fds = ray.data.from_pandas(fact).repartition(3)
    dds = ray.data.from_pandas(dim)
    for jt in ("inner", "left_outer"):
        want = (
            hash_join(fds, dds, on=["k"], join_type=jt)
            .to_pandas()
            .sort_values(["v"])
            .reset_index(drop=True)
        )
        got = (
            frag_replicate_join(fds, dds, ["k"], n_salts=n_salts, join_type=jt)
            .to_pandas()
            .sort_values(["v"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["k", "v", "w"]], want[["k", "v", "w"]])
