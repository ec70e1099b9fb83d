"""Round-3 continued batch: frequent_itemsets (Apriori 2-itemset
rules) vs its DuckDB oracle at sf0.001, and the t-digest quantile
sketch (rank-error bound + merge-order invariance — float-iterative,
rows-only at the driver)."""

import duckdb
import numpy as np
import pandas as pd

from kire_ray.pipelines.relational import frequent_itemsets
from kire_ray.pipelines.sketches import tdigest_quantiles

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ["lineitem", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_frequent_itemsets_vs_oracle(ray_session):
    import __ray_entry__ as E

    exp = _duck().execute(E.oracle_sql()["frequent_itemsets"]).fetchdf()
    got = frequent_itemsets(SF).to_pandas()
    assert len(got) == len(exp) and len(got) > 100
    key = ["part_a", "part_b"]
    got = got[exp.columns.tolist()].sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=0, rtol=0)
    # rule sanity: confidence and support in (0, 1], lift positive
    assert got["support"].between(0, 1).all()
    assert got["conf_a_b"].between(0, 1).all()
    assert got["conf_b_a"].between(0, 1).all()
    assert (got["lift"] > 0).all()


def test_tdigest_rank_error(ray_session):
    import ray

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["value"])
    got = tdigest_quantiles(ev, "value").to_pandas()
    vals = np.sort(pd.read_parquet(f"{SF}/events.parquet")["value"].to_numpy())
    n = len(vals)
    for q, est in zip(got["q"], got["est"]):
        # rank of the estimate must sit within 2% of the target rank
        lo = np.searchsorted(vals, est, side="left") / n
        hi = np.searchsorted(vals, est, side="right") / n
        assert lo - 0.02 <= q <= hi + 0.02, (q, est, lo, hi)
    # estimates are monotone in q and inside the value range
    assert (np.diff(got["est"].to_numpy()) >= 0).all()
    assert got["est"].iloc[0] >= vals[0] and got["est"].iloc[-1] <= vals[-1]


def test_tdigest_partitioning_invariance(ray_session):
    """The digest merge is order-independent (partials sorted before
    every merge), so different partition counts must land within the
    sketch's own error bound of each other."""
    import ray

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["value"])
    a = tdigest_quantiles(ev, "value", num_partitions=4).to_pandas()
    b = tdigest_quantiles(ev, "value", num_partitions=32).to_pandas()
    vals = np.sort(pd.read_parquet(f"{SF}/events.parquet")["value"].to_numpy())
    n = len(vals)
    ra = np.searchsorted(vals, a["est"].to_numpy()) / n
    rb = np.searchsorted(vals, b["est"].to_numpy()) / n
    assert np.abs(ra - rb).max() <= 0.02


def test_pareto_frontier_invariance(ray_session):
    """Local-prune/global-merge must equal the single-block answer and
    be insensitive to input partitioning."""
    import ray
    from kire_ray.pipelines.relational import _pareto_kernel, pareto_frontier

    got = pareto_frontier(SF).to_pandas().sort_values("p_partkey").reset_index(drop=True)
    whole = pd.read_parquet(f"{SF}/part.parquet")[
        ["p_partkey", "p_size", "p_retailprice"]
    ]
    exp = (
        _pareto_kernel(whole).sort_values("p_partkey").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every kept row undominated, every dropped row dominated
    for _, r in exp.iterrows():
        dom = whole[
            (whole.p_retailprice <= r.p_retailprice)
            & (whole.p_size >= r.p_size)
            & (
                (whole.p_retailprice < r.p_retailprice)
                | (whole.p_size > r.p_size)
            )
        ]
        assert len(dom) == 0


def test_events_cume_dist_bucket_invariance(ray_session):
    from kire_ray.pipelines.relational import events_cume_dist

    a = (
        events_cume_dist(SF, n_buckets=8)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        events_cume_dist(SF, n_buckets=4096)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # exact rank semantics on the collected values
    v = a["value"].to_numpy()
    sv = np.sort(v)
    exact = np.searchsorted(sv, v, side="right") / len(v)
    assert np.abs(a["cume"].to_numpy() - exact).max() < 2e-6


def test_embedding_codes_roundtrip(ray_session):
    import ray
    from kire_ray.pipelines.similarity import embedding_codes

    emb = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = embedding_codes(emb).to_pandas()
    X = np.vstack(pd.read_parquet(f"{SF}/embeddings.parquet")["embedding"])
    n, d = X.shape
    assert len(got) == n * d
    assert got["code"].between(-127, 127).all()
    # dequantized values within half a quantization step of the input
    g = got.sort_values(["vec_id", "dim"]).reset_index(drop=True)
    sc = g["scale"].to_numpy()
    deq = np.where(sc > 0, g["code"].to_numpy() / np.where(sc > 0, sc, 1.0), 0.0)
    step = np.where(sc > 0, 1.0 / np.where(sc > 0, sc, 1.0), 0.0)
    xs = X.astype(np.float64).ravel()
    assert (np.abs(deq - xs) <= step * 0.502 + 1e-12).all()


def test_frequent_itemsets_path_equality(ray_session):
    """Driver-side finish (output-sized collect) and the distributed
    hash-join fallback must agree bit-for-bit."""
    from kire_ray.pipelines.relational import frequent_itemsets

    a = frequent_itemsets(SF).to_pandas()
    b = frequent_itemsets(SF, collect_limit=0).to_pandas()
    key = ["part_a", "part_b"]
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(key).reset_index(drop=True),
        b[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_preference_pairs_partition_invariance(ray_session):
    """Extreme-pair mining is an associative combine: 1-block and
    many-block inputs must agree exactly, incl. the asymmetric
    tie-breaks (all-equal scores still yield a distinct pair)."""
    import ray
    from kire_ray.pipelines.sampling import preference_pairs

    tied = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "lang": ["xx"] * 10,
            "source": ["s"] * 5 + ["t"] * 5,
            "n_chars": np.int64(7),
        }
    )
    key = ["lang", "source"]
    a = (
        preference_pairs(ray.data.from_pandas(tied))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        preference_pairs(ray.data.from_pandas(tied).repartition(7))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["chosen_id"] != a["rejected_id"]).all()
    assert list(a["chosen_id"]) == [0, 5] and list(a["rejected_id"]) == [4, 9]


def test_transcript_analytics(ray_session):
    """tool_usage_stats / role_transitions vs a pandas replay on the
    sf0.001 corpus (the DuckDB oracles bind to sf0.01)."""
    import glob

    from kire_ray.pipelines.transcripts import role_transitions, tool_usage_stats
    from kire_ray.sources.synth import corpus_for_sf_dir

    corpus = corpus_for_sf_dir(SF)
    tr = pd.concat(
        [
            pd.read_parquet(f)
            for f in glob.glob(f"{corpus}/transcripts.parquet/*.parquet")
        ],
        ignore_index=True,
    )

    got = (
        tool_usage_stats(corpus)
        .to_pandas()
        .sort_values(["role", "tool"])
        .reset_index(drop=True)
    )
    t = tr.assign(tool=tr["tool"].fillna("none"), nw=tr["text"].str.count(" ") + 1)
    exp = (
        t.groupby(["role", "tool"])
        .agg(
            n_turns=("nw", "size"),
            n_convs=("conv_id", "nunique"),
            nw=("nw", "sum"),
        )
        .reset_index()
    )
    exp["avg_words"] = np.floor(exp["nw"] / exp["n_turns"] * 1e6 + 0.501) / 1e6
    exp = exp.drop(columns=["nw"]).sort_values(["role", "tool"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got_rt = (
        role_transitions(corpus)
        .to_pandas()
        .sort_values(["role_from", "role_to"])
        .reset_index(drop=True)
    )
    s = tr.sort_values(["conv_id", "turn_idx"])
    same = s["conv_id"].to_numpy()[1:] == s["conv_id"].to_numpy()[:-1]
    r = s["role"].to_numpy()
    exp_rt = (
        pd.DataFrame({"role_from": r[:-1][same], "role_to": r[1:][same]})
        .groupby(["role_from", "role_to"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["role_from", "role_to"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_rt, exp_rt, check_dtype=False)


def test_clustering_coefficients(ray_session):
    """Per-node coefficients vs a direct numpy replay on a small graph,
    and consistency with the global triangle count (Σ n_tri = 3·T)."""
    import ray
    from kire_ray.pipelines.graph_algos import (
        clustering_coefficients,
        triangle_count,
    )

    rng = np.random.RandomState(7)
    e = pd.DataFrame(
        {
            "h_qid": [f"n{i}" for i in rng.randint(0, 40, 300)],
            "t_qid": [f"n{i}" for i in rng.randint(0, 40, 300)],
        }
    )
    ds = ray.data.from_pandas(e).repartition(6)
    got = clustering_coefficients(ds).to_pandas().sort_values("qid")
    tri_total = triangle_count(ds).to_pandas()["n_triangles"].iloc[0]
    assert got["n_tri"].sum() == 3 * tri_total

    # replay: adjacency sets
    pairs = {
        tuple(sorted((a, b)))
        for a, b in zip(e["h_qid"], e["t_qid"])
        if a != b
    }
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for _, r in got.iterrows():
        nb = adj[r["qid"]]
        assert r["degree"] == len(nb)
        t = sum(
            1
            for x in nb
            for y in nb
            if x < y and tuple(sorted((x, y))) in pairs
        )
        assert r["n_tri"] == t
        exp = 2.0 * t / (len(nb) * (len(nb) - 1.0)) if len(nb) >= 2 else 0.0
        assert abs(r["coef"] - np.floor(exp * 1e6 + 0.501) / 1e6) < 1e-12


def test_no_duplicate_registry_keys():
    """queries() / oracle_sql() are literal dicts — a duplicate key
    silently shadows an existing operator (bit us once: a second
    orders_rollup). Parse the AST and reject duplicates outright."""
    import ast

    src = open("/root/repo/__ray_entry__.py").read()
    for fn in ast.walk(ast.parse(src)):
        if isinstance(fn, ast.FunctionDef) and fn.name in ("queries", "oracle_sql"):
            for node in ast.walk(fn):
                if isinstance(node, ast.Dict):
                    keys = [
                        k.value for k in node.keys if isinstance(k, ast.Constant)
                    ]
                    if len(keys) > 20:
                        dups = sorted({k for k in keys if keys.count(k) > 1})
                        assert not dups, (fn.name, dups)


def test_conv_stats_turn_latency_tool_chains(ray_session):
    """The conversation-profile trio vs pandas replays on the sf0.001
    corpus (their DuckDB oracles bind to sf0.01)."""
    import glob

    from kire_ray.pipelines.transcripts import (
        conv_stats,
        tool_chains,
        turn_latency,
    )
    from kire_ray.sources.synth import corpus_for_sf_dir

    corpus = corpus_for_sf_dir(SF)
    tr = pd.concat(
        [
            pd.read_parquet(f)
            for f in glob.glob(f"{corpus}/transcripts.parquet/*.parquet")
        ],
        ignore_index=True,
    )

    # --- conv_stats ---
    got = conv_stats(corpus).to_pandas().sort_values("conv_id").reset_index(drop=True)
    us = tr["ts"].astype("datetime64[us]").astype(np.int64)
    t = tr.assign(nw=tr["text"].str.count(" ") + 1, us=us)
    exp = (
        t.groupby("conv_id")
        .agg(
            n_turns=("nw", "size"),
            n_roles=("role", "nunique"),
            n_tool_turns=("tool", "count"),
            n_words=("nw", "sum"),
            ts_min=("us", "min"),
            ts_max=("us", "max"),
        )
        .reset_index()
    )
    exp["duration_s"] = (exp["ts_max"] - exp["ts_min"]) // 1_000_000
    exp = exp.drop(columns=["ts_min", "ts_max"]).sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # --- turn_latency ---
    got_tl = turn_latency(corpus).to_pandas().sort_values("role").reset_index(drop=True)
    s = tr.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    same = s["conv_id"].to_numpy()[1:] == s["conv_id"].to_numpy()[:-1]
    ts = s["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    gaps = pd.DataFrame(
        {"role": s["role"].to_numpy()[1:][same], "gap_us": (ts[1:] - ts[:-1])[same]}
    )
    rows = []
    for role, g in gaps.groupby("role"):
        v = np.sort(g["gap_us"].to_numpy(np.float64))
        r6 = lambda x: np.floor(x * 1e6 + 0.501) / 1e6
        rows.append(
            (
                role,
                len(v),
                r6(v.sum() / len(v) / 1e6),
                r6(np.quantile(v, 0.5) / 1e6),
                r6(np.quantile(v, 0.95) / 1e6),
            )
        )
    exp_tl = pd.DataFrame(
        rows, columns=["role", "n_gaps", "mean_gap_s", "p50_gap_s", "p95_gap_s"]
    ).sort_values("role").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_tl, exp_tl, check_dtype=False)

    # --- tool_chains ---
    got_tc = tool_chains(corpus).to_pandas().sort_values("chain").reset_index(drop=True)
    tt = tr[tr["tool"].notna()].sort_values(["conv_id", "turn_idx"], kind="mergesort")
    exp_tc = (
        tt.groupby("conv_id")["tool"]
        .agg(">".join)
        .value_counts()
        .rename("n_convs")
        .reset_index()
    )
    exp_tc.columns = ["chain", "n_convs"]
    exp_tc = exp_tc.sort_values("chain").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_tc, exp_tc, check_dtype=False)
    # every chain's conversations sum to the tool-turn conv count
    assert got_tc["n_convs"].sum() == tt["conv_id"].nunique()


def test_bow_zipf_skew_vs_oracle(ray_session):
    """bow_dedup / zipf_fit / key_skew_profile vs their DuckDB oracles
    at sf0.001 (view-bound, so any sf compares)."""
    import __ray_entry__ as E

    from kire_ray.pipelines.dedup import bow_dedup
    from kire_ray.pipelines.sketches import key_skew_profile
    from kire_ray.pipelines.text_analysis import zipf_fit

    con = duckdb.connect()
    for t in ["documents", "events", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = E.oracle_sql()

    got = bow_dedup(E._docs(SF)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(oracles["bow_dedup"]).fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # bag-of-words groups must cover every exact-text duplicate group
    n_exact_groups = con.execute(
        "SELECT count(*) FROM (SELECT text FROM documents GROUP BY text HAVING count(*) >= 2)"
    ).fetchone()[0]
    assert got["n_docs"].sum() >= 2 * n_exact_groups or len(got) >= n_exact_groups

    got_z = zipf_fit(E._docs(SF))
    exp_z = con.execute(oracles["zipf_fit"]).fetchdf()
    pd.testing.assert_frame_equal(
        got_z.reset_index(drop=True), exp_z[got_z.columns.tolist()], check_dtype=False
    )
    assert got_z["slope"].iloc[0] < 0  # frequencies decrease with rank

    got_k = key_skew_profile(SF).to_pandas().sort_values("source").reset_index(drop=True)
    exp_k = con.execute(oracles["key_skew_profile"]).fetchdf().sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_k[exp_k.columns.tolist()], exp_k, check_dtype=False)
    assert (got_k["max_n"] <= got_k["n_rows"]).all()
    assert (got_k["n_keys"] <= got_k["n_rows"]).all()


def test_k_anonymity_autocorr_vs_oracle(ray_session):
    """k_anonymity / events_autocorr vs their DuckDB oracles at
    sf0.001 (view-bound)."""
    import __ray_entry__ as E

    from kire_ray.pipelines.temporal import events_autocorr
    from kire_ray.pipelines.text_analysis import k_anonymity

    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = E.oracle_sql()

    got = k_anonymity(
        E._sread(SF, "documents", ["lang", "source", "n_chars"])
    ).to_pandas().sort_values("k").reset_index(drop=True)
    exp = con.execute(oracles["k_anonymity"]).fetchdf().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # risk is monotone in k
    assert got["n_groups_below"].is_monotonic_increasing
    assert got["n_rows_at_risk"].is_monotonic_increasing

    got_a = events_autocorr(SF).to_pandas().sort_values(["event_type", "lag"]).reset_index(drop=True)
    exp_a = con.execute(oracles["events_autocorr"]).fetchdf().sort_values(["event_type", "lag"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_a[exp_a.columns.tolist()], exp_a, check_dtype=False)
    assert got_a["corr"].between(-1, 1).all()


def test_conv_segments_replay(ray_session):
    """conv_segments vs a pandas replay on the sf0.001 corpus."""
    import glob

    from kire_ray.pipelines.transcripts import conv_segments
    from kire_ray.sources.synth import corpus_for_sf_dir

    corpus = corpus_for_sf_dir(SF)
    tr = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{corpus}/transcripts.parquet/*.parquet")],
        ignore_index=True,
    ).sort_values(["conv_id", "turn_idx"])
    rows = []
    for cid, g in tr.groupby("conv_id"):
        ws = [set(t.split()) for t in g["text"]]
        if len(ws) < 2:
            continue
        inters = np.array([len(a & b) for a, b in zip(ws, ws[1:])], dtype=np.int64)
        unions = np.array([len(a | b) for a, b in zip(ws, ws[1:])], dtype=np.int64)
        rows.append(
            (cid, len(ws), int((inters == 0).sum()) + 1,
             np.floor((inters / unions).mean() * 1e6 + 0.501) / 1e6)
        )
    exp = pd.DataFrame(rows, columns=["conv_id", "n_turns", "n_segments", "mean_jacc"])
    got = conv_segments(corpus).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
    assert (got["n_segments"] <= got["n_turns"]).all()


def test_lang_confusion_vs_oracle(ray_session):
    """lang_confusion vs its DuckDB oracle at sf0.001 and the
    diagonal-consistency invariant vs lang_id."""
    import __ray_entry__ as E

    from kire_ray.pipelines.text_analysis import lang_confusion

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    docs = E._sread(SF, "documents", ["doc_id", "text", "lang"])
    got = lang_confusion(docs).to_pandas().sort_values(["lang", "pred_lang"]).reset_index(drop=True)
    exp = con.execute(E.oracle_sql()["lang_confusion"]).fetchdf().sort_values(["lang", "pred_lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # every classified doc lands in exactly one confusion cell
    n_classified = con.execute(
        E.oracle_sql()["lang_id"]
    ).fetchdf().shape[0]
    assert got["n_docs"].sum() == n_classified


def test_user_rfm_vs_oracle(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.temporal import user_rfm

    exp = _duck().execute(E.oracle_sql()["user_rfm"]).fetchdf()
    got = user_rfm(SF).to_pandas()
    got = got[exp.columns.tolist()].sort_values("user_id").reset_index(drop=True)
    exp = exp.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # quartile codes are 1..4 and each quartile is nonempty per metric
    for c in ("r_code", "f_code", "m_code"):
        assert set(got[c]) <= {1, 2, 3, 4}
        assert got[c].nunique() >= 2


def test_ngram_novelty_vs_oracle(ray_session):
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(E.oracle_sql()["ngram_novelty"]).fetchdf()
    got = E.queries()["ngram_novelty"](SF).to_pandas()
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()].reset_index(drop=True), exp, check_dtype=False
    )
    r = got.iloc[0]
    assert 0 < r["n_novel_grams"] <= r["n_new_grams"]
    assert 0.0 < r["novelty_rate"] <= 1.0


def test_events_window_quantiles_vs_oracle(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.temporal import events_window_quantiles

    exp = _duck().execute(E.oracle_sql()["events_window_quantiles"]).fetchdf()
    got = events_window_quantiles(SF).to_pandas()
    key = ["event_type", "w", "q"]
    got = got[exp.columns.tolist()].sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    p = got.pivot_table(index=["event_type", "w"], columns="q", values="value")
    assert (p[0.95] >= p[0.5]).all()


def test_weighted_reservoir_and_column_mi(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.sampling import weighted_reservoir
    from kire_ray.pipelines.sketches import column_mi

    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = E.oracle_sql()

    got = weighted_reservoir(
        E._sread(SF, "documents", ["doc_id", "source", "n_chars"]), 50
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(oracles["weighted_reservoir"]).fetchdf().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # weighting bites: the sample's mean weight exceeds the corpus mean
    corpus_mean = con.execute("SELECT avg(n_chars) FROM documents").fetchone()[0]
    assert got["n_chars"].mean() > corpus_mean

    got_mi = column_mi(SF).to_pandas().sort_values("pair").reset_index(drop=True)
    exp_mi = con.execute(oracles["column_mi"]).fetchdf().sort_values("pair").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_mi[exp_mi.columns.tolist()], exp_mi, check_dtype=False)
    # information inequalities: 0 <= MI <= min(H(X), H(Y))
    assert (got_mi["mi_bits"] >= -1e-9).all()
    assert (got_mi["mi_bits"] <= got_mi[["h_x_bits", "h_y_bits"]].min(axis=1) + 1e-6).all()


def test_scd2_history_vs_oracle(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.temporal import scd2_history

    exp = _duck().execute(E.oracle_sql()["scd2_history"]).fetchdf()
    got = scd2_history(SF).to_pandas()
    key = ["user_id", "valid_from_us"]
    got = got[exp.columns.tolist()].sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # interval sanity: exactly one open (current) interval per user,
    # closed intervals end after they start, runs alternate state
    open_iv = got[got["valid_to_us"] == -1]
    assert len(open_iv) == got["user_id"].nunique()
    closed = got[got["valid_to_us"] != -1]
    assert (closed["valid_to_us"] >= closed["valid_from_us"]).all()
    nxt = got.groupby("user_id")["state"].shift(-1)
    same = nxt.notna()
    assert (got["state"][same] != nxt[same]).all()


def test_late_events_and_window_dedup(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.temporal import late_events, window_dedup

    con = _duck()
    oracles = E.oracle_sql()

    got = (
        late_events(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(oracles["late_events"])
        .fetchdf()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )
    assert (got["lateness_us"] > 3_600_000_000).all() and len(got) > 0
    # partition invariance: the distributed prefix-max must not depend
    # on the arrival-range fan-out
    got3 = (
        late_events(SF, num_ranges=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got3[got.columns.tolist()], got)

    kept = (
        window_dedup(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp_w = (
        con.execute(oracles["window_dedup"])
        .fetchdf()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        kept[exp_w.columns.tolist()], exp_w, check_dtype=False
    )
    # every kept non-first gap exceeds the TTL; one first row per key
    assert (
        (kept["prev_gap_us"] == -1) | (kept["prev_gap_us"] > 86_400_000_000)
    ).all()
    n_keys = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT user_id, event_type FROM events)"
    ).fetchone()[0]
    assert int((kept["prev_gap_us"] == -1).sum()) == n_keys


def test_docsim_cosine_vs_oracle(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.similarity import docsim_cosine

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = (
        docsim_cosine(E._docs(SF))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    exp = (
        con.execute(E.oracle_sql()["docsim_cosine"])
        .fetchdf()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )
    assert len(got) > 0
    assert (got["doc_a"] < got["doc_b"]).all()
    assert got["cosine"].between(0.4, 1.0 + 1e-9).all()
    # the planted exact duplicates surface as cosine == 1 pairs
    assert (got["cosine"] == 1.0).any()


def test_knn_classify_vs_oracle(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.similarity import knn_classify

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    got = (
        knn_classify(E._sread(SF, "embeddings", ["vec_id", "embedding", "label"]))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(E.oracle_sql()["knn_classify"])
        .fetchdf()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )
    # one verdict per vector; stored labels are random w.r.t. the
    # embedding geometry, so the audit reports ~chance agreement —
    # exactly the signal it exists to surface
    assert len(got) == 500
    assert (got["correct"] == (got["true_label"] == got["pred_label"])).all()
    assert got["correct"].mean() < 0.3

    # the vote mechanism itself: on a label-clustered corpus the
    # leave-one-out audit must recover every label
    import ray as _ray

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16)) * 10.0
    lab = np.repeat(np.arange(4), 25)
    X = centers[lab] + rng.normal(size=(100, 16)) * 0.01
    toy = pd.DataFrame(
        {
            "vec_id": np.arange(100, dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in X],
            "label": lab.astype(np.int32),
        }
    )
    res = knn_classify(_ray.data.from_pandas(toy)).to_pandas()
    assert res["correct"].mean() == 1.0


def test_sorted_neighborhood_jw(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.dedup import (
        _jaro_winkler,
        sorted_neighborhood_jw,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    # engine JW is bit-parity with DuckDB's (incl. the 0.7 boost gate)
    for a, b in [
        ("martha", "marhta"), ("DIXON", "DICKSONX"), ("ab", "ba"),
        ("Customer#000000001", "Customer#000000010"), ("a", "b"),
    ]:
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(_jaro_winkler(a, b) - d) < 1e-12

    cust = E._sread(SF, "customer", ["c_name"])
    key = ["name_a", "name_b"]
    got = (
        sorted_neighborhood_jw(cust)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    exp = (
        con.execute(E.oracle_sql()["sorted_neighborhood"])
        .fetchdf()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )
    assert len(got) > 0 and (got["name_a"] < got["name_b"]).all()

    # halo proof: shrinking the bucket prefix to 17 chars forces most
    # windows ACROSS bucket boundaries; output must be bit-identical
    got17 = (
        sorted_neighborhood_jw(cust, prefix_len=17)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got17[got.columns.tolist()], got)


def test_hash64_fast_batch_invariance():
    """Regression: a key's hash must be a pure function of the key —
    the old batch-level >256-char fallback gave the same short string
    different hashes depending on batch composition (split groups in
    any exchange keyed on mixed-length strings)."""
    from kire_ray.functions.hashing import hash64, hash64_fast

    short, mid, lng = "user:none>assistant:tool", "x" * 200, "y" * 1000
    a = hash64_fast(np.array([short, mid], dtype=object))
    b = hash64_fast(np.array([short, lng], dtype=object))
    c = hash64_fast(np.array([mid, lng, short], dtype=object))
    assert a[0] == b[0] == c[2]
    assert a[1] == c[0]
    # >256-char strings ride blake2b, same in any batch
    assert b[1] == c[1] == hash64([lng])[0]


def test_conv_flows(ray_session):
    """Flow-template mining vs a pandas replay on the sf0.001 corpus
    (the DuckDB oracle binds to sf0.01)."""
    import glob

    from kire_ray.pipelines.transcripts import conv_flows
    from kire_ray.sources.synth import corpus_for_sf_dir

    corpus = corpus_for_sf_dir(SF)
    tr = pd.concat(
        [
            pd.read_parquet(f, columns=["conv_id", "turn_idx", "role", "tool"])
            for f in glob.glob(f"{corpus}/transcripts.parquet/*.parquet")
        ]
    ).sort_values(["conv_id", "turn_idx"])
    tok = tr["role"].str.cat(tr["tool"].fillna("none"), sep=":")
    flows = (
        pd.DataFrame({"conv_id": tr["conv_id"].to_numpy(), "tok": tok})
        .groupby("conv_id", sort=False)["tok"]
        .agg(">".join)
    )
    exp = (
        flows.reset_index(name="flow")
        .groupby("flow")
        .agg(n_convs=("conv_id", "size"), sample_conv=("conv_id", "min"))
        .reset_index()
    )
    exp["n_turns"] = (exp["flow"].str.count(">") + 1).astype(np.int64)

    got = (
        conv_flows(corpus)
        .to_pandas()
        .sort_values("flow")
        .reset_index(drop=True)
    )
    exp = exp[got.columns.tolist()].sort_values("flow").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n_convs"].sum() == flows.size
    assert (got["n_convs"] > 1).any()


def test_source_js_l_diversity_theilsen(ray_session):
    import ray as _ray

    import __ray_entry__ as E

    from kire_ray.pipelines.temporal import theilsen_trend
    from kire_ray.pipelines.text_analysis import l_diversity, source_js_divergence

    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = E.oracle_sql()

    key = ["source_a", "source_b"]
    got = (
        source_js_divergence(E._sread(SF, "documents", ["source", "text"]))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    exp = (
        con.execute(oracles["source_js_divergence"])
        .fetchdf()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # JS in bits is bounded [0, 1]; pairs are canonical a < b
    assert got["js_bits"].between(-1e-9, 1.0 + 1e-9).all()
    assert (got["source_a"] < got["source_b"]).all()

    got_l = l_diversity(SF).to_pandas().sort_values("l").reset_index(drop=True)
    exp_l = (
        con.execute(oracles["l_diversity"])
        .fetchdf()
        .sort_values("l")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_l[exp_l.columns.tolist()], exp_l, check_dtype=False)
    # risk is monotone in the threshold
    assert (np.diff(got_l["n_groups_below"].to_numpy()) >= 0).all()
    assert (np.diff(got_l["n_rows_at_risk"].to_numpy()) >= 0).all()

    got_t = (
        theilsen_trend(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    exp_t = (
        con.execute(oracles["theilsen_trend"])
        .fetchdf()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_t[exp_t.columns.tolist()], exp_t, check_dtype=False)
    # robustness: a perfectly linear series with one wild outlier day
    # still yields the exact true slope (the OLS fit would not)
    ts0 = np.datetime64("2025-01-01T00:00:00", "us")
    days = np.arange(21)
    counts = 10 + 3 * days
    counts[10] = 500  # outlier
    rows = []
    eid = 0
    for d, c in zip(days, counts):
        for _ in range(int(c)):
            rows.append((eid, ts0 + np.timedelta64(int(d), "D").astype("timedelta64[us]"), "lin"))
            eid += 1
    toy = pd.DataFrame(rows, columns=["event_id", "ts", "event_type"])
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        toy.to_parquet(f"{td}/events.parquet")
        res = theilsen_trend(td).to_pandas()
    assert float(res["slope"].iloc[0]) == 3.0


def test_changepoint_and_fk_integrity(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.relational import fk_integrity
    from kire_ray.pipelines.temporal import changepoint_cusum

    con = duckdb.connect()
    for t in [
        "lineitem", "orders", "customer", "supplier", "nation", "region",
        "part", "events",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    oracles = E.oracle_sql()

    got = (
        changepoint_cusum(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(oracles["changepoint_cusum"])
        .fetchdf()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # a planted level shift is found at its exact boundary
    ts0 = np.datetime64("2025-03-01T00:00:00", "us")
    rows = []
    eid = 0
    for d in range(30):
        for _ in range(10 if d < 15 else 60):
            rows.append(
                (eid, ts0 + np.timedelta64(d, "D").astype("timedelta64[us]"), "shift")
            )
            eid += 1
    import tempfile

    toy = pd.DataFrame(rows, columns=["event_id", "ts", "event_type"])
    with tempfile.TemporaryDirectory() as td:
        toy.to_parquet(f"{td}/events.parquet")
        res = changepoint_cusum(td).to_pandas()
    day0 = int(ts0.astype("datetime64[D]").astype(int))
    assert int(res["change_day"].iloc[0]) == day0 + 14

    got_fk = (
        fk_integrity(SF).to_pandas().sort_values("rel").reset_index(drop=True)
    )
    exp_fk = (
        con.execute(oracles["fk_integrity"])
        .fetchdf()
        .sort_values("rel")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_fk[exp_fk.columns.tolist()], exp_fk, check_dtype=False)
    # the TPC-H relations are clean; the unconstrained events->customer
    # pairing must be the only place orphans can appear
    clean = got_fk[got_fk["rel"] != "events.user_id->customer.c_custkey"]
    assert (clean["n_orphan_rows"] == 0).all()
    assert (got_fk["n_orphan_keys"] <= got_fk["n_keys"]).all()


def test_dp_histogram(ray_session):
    import __ray_entry__ as E

    from kire_ray.pipelines.sketches import dp_histogram

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    got = (
        dp_histogram(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    exp = (
        con.execute(E.oracle_sql()["dp_histogram"])
        .fetchdf()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # noise is Laplace(2): release stays within a generous tail bound
    # of the exact counts but is NOT exactly the counts
    true = con.execute(
        "SELECT event_type, count(*) n FROM events GROUP BY 1"
    ).fetchdf().set_index("event_type")["n"]
    diff = got.set_index("event_type")["noisy_count"] - true
    assert (diff.abs() > 1e-9).any()
    assert (diff.abs() < 2.0 * 40).all()  # P(|Lap(2)| > 80) ~ 4e-18


def test_connected_components_long_chain(ray_session):
    """A path graph forces ~diameter/2 propagation rounds — the regime
    where the round loop's block growth used to compound (18→378
    blocks in 5 rounds before the per-round repartition cap)."""
    import ray as _ray

    from kire_ray.stages.canonicalize import connected_components

    n = 24
    chain = pd.DataFrame(
        {"src": [f"n{i:03d}" for i in range(n - 1)],
         "dst": [f"n{i + 1:03d}" for i in range(n - 1)]}
    )
    extra = pd.DataFrame({"src": ["z1", "z2"], "dst": ["z2", "z3"]})
    edges = _ray.data.from_pandas(pd.concat([chain, extra])).repartition(5)
    out = connected_components(edges, max_iters=30, collect_limit=0).to_pandas()
    assert len(out) == n + 3
    lab = out.set_index("node")["label"]
    assert (lab[[f"n{i:03d}" for i in range(n)]] == "n000").all()
    assert (lab[["z1", "z2", "z3"]] == "z1").all()


def test_connected_components_pointer_doubling_rounds(ray_session):
    """Pointer jumping must make round count logarithmic in diameter:
    a 200-node path graph (diameter 199) must converge in far fewer
    rounds than the diameter bound — plain min-label propagation would
    need ~200 rounds and blow past max_iters."""
    import ray as _ray

    from kire_ray.stages.canonicalize import connected_components

    n = 200
    chain = pd.DataFrame(
        {"src": [f"n{i:04d}" for i in range(n - 1)],
         "dst": [f"n{i + 1:04d}" for i in range(n - 1)]}
    )
    edges = _ray.data.from_pandas(chain).repartition(5)
    out = connected_components(edges, max_iters=30, collect_limit=0).to_pandas()
    assert (out.set_index("node")["label"] == "n0000").all()
    assert connected_components.last_rounds <= 12


def test_docsim_cosine_unigram(ray_session):
    """ngram=1 must produce unigram postings (the old [:1-ngram] slice
    silently emptied them)."""
    import ray as _ray

    from kire_ray.pipelines.similarity import docsim_cosine

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [
                "apple banana cherry",
                "apple banana date",
                "xylophone zebra quux",
            ],
        }
    )
    out = docsim_cosine(
        _ray.data.from_pandas(docs), ngram=1, min_df=2, max_df=10, threshold=0.1
    ).to_pandas()
    # docs 1 and 2 share two of three unigrams → one surviving pair
    assert len(out) == 1
    pair = {int(out.iloc[0]["doc_a"]), int(out.iloc[0]["doc_b"])}
    assert pair == {1, 2}


def test_sorted_neighborhood_window1(ray_session):
    """window=1 (W=0) is degenerate — no pairs possible; it must
    return empty without shipping whole buckets into driver tails."""
    import ray as _ray

    from kire_ray.pipelines.dedup import sorted_neighborhood_jw

    ds = _ray.data.from_pandas(
        pd.DataFrame({"c_name": [f"name{i:03d}" for i in range(50)]})
    )
    out = sorted_neighborhood_jw(ds, window=1, threshold=0.0).to_pandas()
    assert len(out) == 0


def test_dp_histogram_secret_salt(ray_session):
    """The DP release must accept a secret salt / uniform source: the
    default deterministic release and a salted one differ in noise but
    share schema; a custom uniform_source is honored."""
    from kire_ray.pipelines.sketches import dp_histogram

    sf = "/root/testdata/sf0.001"
    base = dp_histogram(sf).to_pandas().set_index("event_type")
    salted = (
        dp_histogram(sf, noise_salt="s3cret").to_pandas().set_index("event_type")
    )
    assert (base["noisy_count"] != salted["noisy_count"]).any()
    fixed = dp_histogram(sf, uniform_source=lambda k: 0.25).to_pandas()
    # u=0.25 → lap = -b*sign(-.25)*ln(.5) = +2*ln2 for eps=0.5
    import math

    lap = 2.0 * math.log(2.0)
    joined = fixed.set_index("event_type").join(
        base["noisy_count"].rename("b"), how="inner"
    )
    assert len(joined) == len(base)


def test_train_label_pick_deterministic(ray_session):
    """O9: the pick must be within the pair's label set, one row per
    pair, and batch-layout independent."""
    import ray as _ray

    from kire_ray.pipelines.sampling import train_label_pick

    gold = pd.DataFrame(
        {
            "doc_id": ["d1"] * 3 + ["d2"] * 2 + ["d3"],
            "h_idx": np.array([0, 0, 0, 1, 1, 2], dtype=np.int32),
            "t_idx": np.array([1, 1, 1, 2, 2, 3], dtype=np.int32),
            "r": ["P1", "P2", "P3", "P5", "P4", "P9"],
        }
    )
    out1 = (
        train_label_pick(_ray.data.from_pandas(gold))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out2 = (
        train_label_pick(_ray.data.from_pandas(gold).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out1, out2)
    assert len(out1) == 3
    assert list(out1["n_labels"]) == [3, 2, 1]
    assert out1.loc[out1["doc_id"] == "d3", "picked_r"].iloc[0] == "P9"
    sets = {"d1": {"P1", "P2", "P3"}, "d2": {"P4", "P5"}, "d3": {"P9"}}
    for _, row in out1.iterrows():
        assert row["picked_r"] in sets[row["doc_id"]]


def test_cc_paths_equal(ray_session):
    """Driver union-find fast path (edge table under collect_limit)
    must be bit-equal to the distributed min-label propagation."""
    import ray as _ray

    from kire_ray.stages.canonicalize import connected_components

    rng = np.random.RandomState(11)
    edges = pd.DataFrame(
        {
            "src": [f"n{rng.randint(0, 40):02d}" for _ in range(60)],
            "dst": [f"n{rng.randint(0, 40):02d}" for _ in range(60)],
        }
    )
    edges = edges[edges["src"] != edges["dst"]]
    ds = _ray.data.from_pandas(edges).repartition(4)
    fast = (
        connected_components(ds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        connected_components(ds, collect_limit=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist)


def test_cc_single_upstream_execution(ray_session, tmp_path):
    """VERDICT r4 #2: connected_components' size gate must not execute
    an UNMATERIALIZED upstream DAG once for the count and again for the
    real pass. The upstream map drops a marker file per task run; with
    4 input blocks the marker count must stay at one run per block."""
    import os
    import uuid

    import ray as _ray

    from kire_ray.stages.canonicalize import connected_components

    marker_dir = str(tmp_path / "spy")
    os.makedirs(marker_dir, exist_ok=True)

    def spied(b: pd.DataFrame) -> pd.DataFrame:
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w"):
            pass
        return pd.DataFrame({"src": b["src"], "dst": b["dst"]})

    edges = pd.DataFrame(
        {"src": [f"a{i}" for i in range(16)], "dst": ["hub"] * 16}
    )
    ds = (
        _ray.data.from_pandas(edges)
        .repartition(4)
        .map_batches(spied, batch_format="pandas")
    )
    out = connected_components(ds).to_pandas()
    n_runs = len(os.listdir(marker_dir))
    assert n_runs <= 4, f"upstream executed {n_runs} tasks for 4 blocks (double execution)"
    assert set(out["label"]) == {"a0"}  # star graph → one component

    # nrows hint path: same single execution, same answer
    for f in os.listdir(marker_dir):
        os.unlink(os.path.join(marker_dir, f))
    out2 = connected_components(ds, nrows=16).to_pandas()
    assert len(os.listdir(marker_dir)) <= 4
    pd.testing.assert_frame_equal(
        out.sort_values("node").reset_index(drop=True),
        out2.sort_values("node").reset_index(drop=True),
    )


def test_dedup_corpus_clean_corpus_no_drops(ray_session):
    """Review r5: a corpus with ZERO near-duplicates must pass through
    dedup_corpus unchanged (indexing the empty drop array crashed)."""
    import ray as _ray

    from kire_ray.pipelines.dedup import dedup_corpus

    docs = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64), "text": "t"})
    clusters = pd.DataFrame(
        {"node": pd.Series([], dtype=object), "label": pd.Series([], dtype=object)}
    )
    out = dedup_corpus(
        _ray.data.from_pandas(docs), _ray.data.from_pandas(clusters)
    ).to_pandas()
    assert sorted(out["doc_id"]) == list(range(10))


def test_kmeans_fit_fewer_vectors_than_k(ray_session):
    """Review r5: n < k seeds fewer centroids; the driver fold's count
    mask must align with the actual centroid matrix, not k."""
    import ray as _ray

    from kire_ray.pipelines.similarity import _kmeans_fit_distributed

    emb = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype=np.int64),
            "embedding": [np.random.RandomState(i).rand(8).tolist() for i in range(5)],
        }
    )
    C = _kmeans_fit_distributed(_ray.data.from_pandas(emb), k=8, iters=2)
    assert C.shape[0] == 5 and C.shape[1] == 8
    assert np.isfinite(C).all()
