"""Global percent-rank, windowed HLL, and BFS levels."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

SF = "/root/testdata/sf0.001"


def test_events_value_ranks_vs_duckdb(ray_session):
    from kire_ray.pipelines.relational import events_value_ranks

    got = (
        events_value_ranks(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(
        """
        SELECT event_id,
               floor(percent_rank() OVER (ORDER BY value) * 1000000 + 0.501)
                   / 1000000 AS pct_rank
        FROM events ORDER BY event_id
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["pct_rank"].min() == 0.0 and got["pct_rank"].max() <= 1.0


def test_bfs_levels_hand_graph(ray_session):
    from kire_ray.pipelines.graph_algos import bfs_levels

    # a --- b --- c --- d   and   x --- y (separate component)
    edges = pd.DataFrame(
        {
            "h_qid": ["b", "c", "d", "x"],
            "t_qid": ["a", "b", "c", "y"],
        }
    )
    out = (
        bfs_levels(ray.data.from_pandas(edges).repartition(2), max_levels=8)
        .to_pandas()
        .set_index("qid")["level"]
        .to_dict()
    )
    # seed = lexicographic min = 'a'; x/y unreachable
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}

    # max_levels truncates
    out2 = (
        bfs_levels(ray.data.from_pandas(edges), max_levels=2)
        .to_pandas()
        .set_index("qid")["level"]
        .to_dict()
    )
    assert out2 == {"a": 0, "b": 1, "c": 2}


def test_hll_window_partitioning_invariant(ray_session):
    """HLL registers merge by max, so the estimate must not depend on
    block layout."""
    from kire_ray.pipelines.sketches import hll_distinct

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "window_start": rng.integers(0, 3, 3000) * 86400,
            "user_id": rng.integers(0, 500, 3000),
        }
    )
    a = (
        hll_distinct(ray.data.from_pandas(df), "user_id", group_col="window_start")
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    b = (
        hll_distinct(
            ray.data.from_pandas(df).repartition(7),
            "user_id",
            group_col="window_start",
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # sketch accuracy sanity: within 10% of the exact distinct count
    exact = df.groupby("window_start")["user_id"].nunique()
    for _, r in a.iterrows():
        assert abs(r["estimate"] - exact[r["window_start"]]) / exact[r["window_start"]] < 0.1


def test_link_prediction_small(ray_session):
    """Hand-computed graph: path a-b-c-d plus hub x adjacent to a,c.
    Non-adjacent pairs with >=2 common neighbors get the classic
    scores; adjacent pairs are excluded."""
    import numpy as np
    import pandas as pd
    import ray.data
    from kire_ray.pipelines.graph_algos import link_prediction

    edges = pd.DataFrame(
        {"s1": ["a", "b", "c", "x", "x"], "s2": ["b", "c", "d", "a", "c"]}
    )
    got = (
        link_prediction(ray.data.from_pandas(edges), min_common=2)
        .to_pandas()
        .sort_values(["s1", "s2"])
        .reset_index(drop=True)
    )
    # degrees: a2 b2 c3 d1 x2. Non-adjacent pairs with 2 common
    # neighbors: (a,c) via {b,x} and (b,x) via {a,c}.
    assert len(got) == 2
    r = got.iloc[0]
    assert (r["s1"], r["s2"], r["cn"]) == ("a", "c", 2)
    assert abs(r["jaccard"] - 2 / (2 + 3 - 2)) < 1e-6
    assert abs(r["adamic_adar"] - 2 / np.log(2)) < 1e-6
    r = got.iloc[1]
    assert (r["s1"], r["s2"], r["cn"]) == ("b", "x", 2)
    assert abs(r["jaccard"] - 1.0) < 1e-6
    assert abs(r["adamic_adar"] - (1 / np.log(2) + 1 / np.log(3))) < 1e-6


def test_hits_vs_numpy(ray_session):
    """Distributed HITS == sequential numpy on the same edge table."""
    import numpy as np
    import pandas as pd

    from kire_ray.pipelines.graph_algos import hits
    import ray.data

    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 300)
    dst = (src + 1 + rng.integers(0, 38, 300)) % 40
    ed = pd.DataFrame(
        {"h_qid": [f"Q{i}" for i in src], "t_qid": [f"Q{i}" for i in dst]}
    )
    got = (
        hits(ray.data.from_pandas(ed))
        .to_pandas()
        .sort_values("qid")
        .reset_index(drop=True)
    )

    nodes = np.sort(pd.concat([ed["h_qid"], ed["t_qid"]]).unique())
    n = len(nodes)
    si = np.searchsorted(nodes, ed["h_qid"])
    di = np.searchsorted(nodes, ed["t_qid"])
    hub = np.full(n, 1.0 / n)
    for _ in range(5):
        auth = np.zeros(n)
        np.add.at(auth, di, hub[si])
        auth /= auth.sum()
        hub = np.zeros(n)
        np.add.at(hub, si, auth[di])
        hub /= hub.sum()
    np.testing.assert_allclose(got["auth"].to_numpy(), auth, atol=2e-6)
    np.testing.assert_allclose(got["hub"].to_numpy(), hub, atol=2e-6)
    assert abs(got["auth"].sum() - 1.0) < 1e-3 and abs(got["hub"].sum() - 1.0) < 1e-3


def test_negative_samples_protocol(ray_session):
    """No accidental positives, no self-replacement, deterministic."""
    import numpy as np
    import pandas as pd

    from kire_ray.pipelines.graph_algos import negative_samples
    import ray.data

    rng = np.random.default_rng(11)
    ed = pd.DataFrame(
        {
            "h_qid": [f"Q{i}" for i in rng.integers(0, 30, 200)],
            "prop": [f"P{i}" for i in rng.integers(0, 5, 200)],
            "t_qid": [f"Q{i}" for i in rng.integers(0, 30, 200)],
        }
    ).drop_duplicates()
    got = negative_samples(ray.data.from_pandas(ed)).to_pandas()
    got2 = negative_samples(ray.data.from_pandas(ed)).to_pandas()
    key = ["h_qid", "prop", "t_neg", "j"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[key],
        got2.sort_values(key).reset_index(drop=True)[key],
    )
    real = set(map(tuple, ed[["h_qid", "prop", "t_qid"]].to_numpy()))
    assert not any(
        (h, p, t) in real
        for h, p, t in got[["h_qid", "prop", "t_neg"]].to_numpy()
    )
    # ~2 negatives per positive minus the filtered collisions
    assert len(ed) <= len(got) <= 2 * len(ed)


def test_link_eval_vs_bruteforce(ray_session):
    """Filtered tail ranks must equal a sequential brute-force replay
    of the Bordes et al. protocol under the md5 score basis, and the
    summary row must agree with recomputing the aggregates from the
    per-triple ranks."""
    import hashlib

    import numpy as np
    import pandas as pd

    import ray.data
    from kire_ray.pipelines.graph_algos import link_eval, link_eval_summary

    rng = np.random.default_rng(23)
    ed = pd.DataFrame(
        {
            "h_qid": [f"Q{i}" for i in rng.integers(0, 25, 180)],
            "prop": [f"P{i}" for i in rng.integers(0, 4, 180)],
            "t_qid": [f"Q{i}" for i in rng.integers(0, 25, 180)],
        }
    ).drop_duplicates()
    got = (
        link_eval(ray.data.from_pandas(ed))
        .to_pandas()
        .sort_values(["h_qid", "prop", "t_qid"])
        .reset_index(drop=True)
    )

    def s52(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:13], 16)

    nodes = sorted(set(ed["h_qid"]) | set(ed["t_qid"]))
    true = {}
    for h, r, t in ed.itertuples(index=False):
        true.setdefault((h, r), set()).add(t)
    exp_rows = []
    for h, r, t in ed.itertuples(index=False):
        if s52(f"{h}|{r}|{t}|eval") % 10 != 0:
            continue  # only the deterministic 10% test split is ranked
        st = s52(f"{h}|{r}|{t}")
        rank = 1 + sum(
            1
            for c in nodes
            if c not in true[(h, r)] and s52(f"{h}|{r}|{c}") > st
        )
        exp_rows.append((h, r, t, rank, 1.0 / rank))
    assert len(exp_rows) >= 5  # split actually selects something
    exp = (
        pd.DataFrame(exp_rows, columns=["h_qid", "prop", "t_qid", "t_rank", "rr"])
        .sort_values(["h_qid", "prop", "t_qid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns], exp, check_dtype=False
    )

    summ = link_eval_summary(ray.data.from_pandas(ed))
    r = exp["t_rank"].to_numpy(np.int64)
    assert int(summ["n"].iloc[0]) == len(r)
    assert int(summ["hits1"].iloc[0]) == int((r <= 1).sum())
    assert int(summ["hits10"].iloc[0]) == int((r <= 10).sum())
    assert int(summ["sum_rank"].iloc[0]) == int(r.sum())
    assert int(summ["mrr_e12"].iloc[0]) == int(
        np.floor(1e12 / r).astype(np.int64).sum()
    )


def test_walk_paths_equal(ray_session):
    """random_walks' broadcast-frontier and exchange-frontier paths
    must be bit-equal (the knn_graph_mutual auto-select pattern)."""
    import numpy as np
    import pandas as pd

    from kire_ray.pipelines.graph_algos import random_walks
    import ray.data

    rng = np.random.default_rng(5)
    src = rng.integers(0, 25, 150)
    dst = (src + 1 + rng.integers(0, 23, 150)) % 25
    ed = pd.DataFrame(
        {"h_qid": [f"Q{i}" for i in src], "t_qid": [f"Q{i}" for i in dst]}
    )
    key = ["start_qid", "walk", "step", "qid"]

    def run(**kw):
        return (
            random_walks(ray.data.from_pandas(ed), **kw)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)[key]
        )

    fast = run()
    slow = run(broadcast_limit=0)
    pd.testing.assert_frame_equal(fast, slow)
    # every start node walks, step 0 == start, chain is edge-consistent
    assert (fast.loc[fast["step"] == 0, "start_qid"]
            == fast.loc[fast["step"] == 0, "qid"]).all()
    edges = set(map(tuple, ed[["h_qid", "t_qid"]].to_numpy()))
    w = fast.sort_values(["start_qid", "walk", "step"])
    for (st, wk), grp in w.groupby(["start_qid", "walk"]):
        seq = grp["qid"].tolist()
        for a, b in zip(seq[:-1], seq[1:]):
            assert (a, b) in edges
