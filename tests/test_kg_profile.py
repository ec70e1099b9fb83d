"""kg_profile operators: PARIS predicate stats, bounded transitive
closure, HyperBall neighborhood function — each vs a sequential oracle
and at two partitionings (partition invariance)."""

import collections
import hashlib

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from kire_ray.pipelines.kg_profile import hyperball, pred_stats, reachability


def _edges_df() -> pd.DataFrame:
    # chain a→b→c→d→e, a cycle x→y→z→x, a hub h→{a,x,c}, dup edges,
    # and a self-loop (must be ignored)
    rows = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("h", "a"), ("h", "x"), ("h", "c"),
        ("a", "b"),               # duplicate
        ("e", "e"),               # self-loop
    ]
    return pd.DataFrame(
        {
            "h_qid": [r[0] for r in rows],
            "prop": "P1",
            "t_qid": [r[1] for r in rows],
        }
    )


def _ds(df: pd.DataFrame, blocks: int) -> "ray.data.Dataset":
    return ray.data.from_pandas(df).repartition(blocks)


def _bfs_all_pairs(df: pd.DataFrame, max_depth: int) -> dict:
    adj = collections.defaultdict(set)
    for s, t in zip(df["h_qid"], df["t_qid"]):
        if s != t:
            adj[s].add(t)
    dist = {}
    nodes = set(df["h_qid"]) | set(df["t_qid"])
    for s in nodes:
        frontier, d = {s}, 0
        seen = {s}
        while frontier and d < max_depth:
            d += 1
            nxt = set()
            for u in frontier:
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        nxt.add(v)
                        if v != s:
                            dist[(s, v)] = d
            frontier = nxt
    return dist


@pytest.mark.parametrize("blocks", [1, 5])
def test_reachability_matches_bfs(ray_session, blocks):
    df = _edges_df()
    got = reachability(_ds(df, blocks), max_depth=4).to_pandas()
    want = _bfs_all_pairs(df, 4)
    got_map = {(r.src, r.dst): r.dist for r in got.itertuples()}
    assert got_map == want
    assert len(got) == len(got_map)  # no duplicate pairs


def test_pred_stats_exact(ray_session):
    df = pd.concat(
        [
            _edges_df(),
            pd.DataFrame(
                {"h_qid": ["a", "a", "b"], "prop": "P2", "t_qid": ["b", "c", "c"]}
            ),
        ],
        ignore_index=True,
    )
    for blocks in (1, 4):
        got = (
            pred_stats(_ds(df, blocks))
            .to_pandas()
            .sort_values("prop")
            .reset_index(drop=True)
        )
        for _, row in got.iterrows():
            sub = df[df["prop"] == row["prop"]]
            assert row["n_triples"] == len(sub)
            assert row["n_heads"] == sub["h_qid"].nunique()
            assert row["n_tails"] == sub["t_qid"].nunique()
            assert row["functionality"] == pytest.approx(
                np.floor(sub["h_qid"].nunique() / len(sub) * 1e6 + 0.501) / 1e6
            )


def _hyperball_oracle(df: pd.DataFrame, radii: int) -> dict:
    m = 1024
    alpha = 0.7213 / (1.0 + 1.079 / m)
    ed = df[df["h_qid"] != df["t_qid"]][["h_qid", "t_qid"]].drop_duplicates()
    nodes = sorted(set(ed["h_qid"]) | set(ed["t_qid"]))
    regs = {}
    for q in nodes:
        h = int(hashlib.md5(q.encode()).hexdigest()[:15], 16)
        b, w = h >> 50, h & ((1 << 50) - 1)
        regs[q] = {b: (51 - w.bit_length() if w else 51)}
    outadj = collections.defaultdict(list)
    for v, w in zip(ed["h_qid"], ed["t_qid"]):
        outadj[v].append(w)

    def est(r):
        npres = len(r)
        s = sum(2.0 ** -x for x in r.values()) + (m - npres)
        v0 = m - npres
        e = alpha * m * m / s
        if e <= 2.5 * m and v0 > 0:
            e = m * np.log(m / v0)
        return np.floor(e * 1e6 + 0.501) / 1e6

    expect, cur = {}, regs
    for r in range(0, radii + 1):
        for q in nodes:
            expect[(q, r)] = est(cur[q])
        nxt = {q: dict(cur[q]) for q in nodes}
        for v in nodes:
            for w in outadj.get(v, []):
                for b, rho in cur[w].items():
                    if nxt[v].get(b, 0) < rho:
                        nxt[v][b] = rho
        cur = nxt
    return expect


@pytest.mark.parametrize("blocks", [1, 4])
def test_hyperball_matches_sequential(ray_session, blocks):
    df = _edges_df()
    got = hyperball(_ds(df, blocks), radii=3).to_pandas()
    want = _hyperball_oracle(df, 3)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.qid, r.radius)] == pytest.approx(r.estimate, abs=1e-9)


def _meta_paths_oracle(df: pd.DataFrame) -> pd.DataFrame:
    e = df.drop_duplicates(subset=["h_qid", "prop", "t_qid"])
    edges = list(zip(e["h_qid"], e["prop"], e["t_qid"]))
    direct = {(h, t) for h, _, t in edges}
    agg: dict = {}
    for h1, r1, t1 in edges:
        for h2, r2, t2 in edges:
            if t1 != h2:
                continue
            key = (r1, r2)
            pairs = agg.setdefault(key, collections.Counter())
            pairs[(h1, t2)] += 1
    rows = []
    for (r1, r2), pairs in agg.items():
        n_pairs = len(pairs)
        n_paths = sum(pairs.values())
        n_closed = sum(1 for p in pairs if p in direct)
        rows.append(
            (r1, r2, n_paths, n_pairs, n_closed,
             np.floor(n_closed / n_pairs * 1e6 + 0.501) / 1e6)
        )
    return (
        pd.DataFrame(
            rows,
            columns=["r1", "r2", "n_paths", "n_pairs", "n_closed", "support"],
        )
        .sort_values(["r1", "r2"])
        .reset_index(drop=True)
    )


def test_meta_paths_vs_oracle_and_partition_invariance(ray_session):
    from kire_ray.pipelines.kg_profile import meta_paths

    rows = [
        ("a", "P1", "b"), ("b", "P2", "c"), ("a", "P3", "c"),  # closed P1·P2
        ("c", "P1", "d"), ("d", "P2", "e"),                      # open P1·P2
        ("a", "P1", "c"),                                        # P1·P1 via c
        ("x", "P2", "y"), ("y", "P2", "x"),                      # 2-cycle P2·P2
        ("a", "P1", "b"),                                        # duplicate edge
    ]
    df = pd.DataFrame(
        {"h_qid": [r[0] for r in rows], "prop": [r[1] for r in rows],
         "t_qid": [r[2] for r in rows]}
    )
    exp = _meta_paths_oracle(df)
    outs = []
    for blocks in (2, 7):
        got = (
            meta_paths(_ds(df, blocks))
            .to_pandas()
            .sort_values(["r1", "r2"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # spot semantics: P1·P2 has a→c closed and c→e open
    row = exp[(exp["r1"] == "P1") & (exp["r2"] == "P2")].iloc[0]
    assert row["n_pairs"] == 2 and row["n_closed"] == 1


def test_edge_lifespan_vs_oracle(ray_session):
    from kire_ray.pipelines.kg_profile import edge_lifespan

    triples = pd.DataFrame(
        {
            "doc_id": ["c1", "c1", "c2", "c3", "c3"],
            "subj_qid": ["Q1", "Q1", "Q1", "Q2", "Q1"],
            "pred": ["P1", "P1", "P1", "P2", "P1"],
            "obj_qid": ["Q2", "Q2", "Q2", "Q3", "Q2"],
            "score": 1.0,
        }
    )
    tr = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2", "c3", "c4"],
            "ts": pd.to_datetime(
                ["2026-01-02 10:00:01", "2026-01-02 09:00:00",
                 "2026-01-05 00:00:00", "2026-01-01 12:00:00",
                 "2026-01-09 00:00:00"]
            ).astype("datetime64[us]"),
        }
    )
    for blocks in (1, 4):
        got = (
            edge_lifespan(_ds(triples, blocks), _ds(tr, blocks))
            .to_pandas()
            .sort_values(["subj_qid", "pred", "obj_qid"])
            .reset_index(drop=True)
        )
        us = lambda s: int(pd.Timestamp(s).value // 1000)
        exp = pd.DataFrame(
            {
                "subj_qid": ["Q1", "Q2"],
                "pred": ["P1", "P2"],
                "obj_qid": ["Q2", "Q3"],
                # Q1-P1-Q2 in c1 (dup rows fold), c2, c3
                "n_docs": [3, 1],
                "first_us": [us("2026-01-01 12:00:00"), us("2026-01-01 12:00:00")],
                "last_us": [us("2026-01-05 00:00:00"), us("2026-01-01 12:00:00")],
            }
        )
        pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def _brandes_oracle(df: pd.DataFrame, pivots: list) -> dict:
    """Sequential Brandes (2001, alg. 1) restricted to the pivots,
    undirected, self-loops dropped — the distributed op's contract."""
    adj = collections.defaultdict(set)
    for s, t in zip(df["h_qid"], df["t_qid"]):
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    nodes = set(df["h_qid"]) | set(df["t_qid"])
    bc = {q: 0.0 for q in nodes}
    for s in pivots:
        stack, preds = [], collections.defaultdict(list)
        sigma = collections.defaultdict(float)
        sigma[s] = 1.0
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for v in frontier:
                stack.append(v)
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nxt.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
                        preds[w].append(v)
            frontier = nxt
        delta = collections.defaultdict(float)
        for w in reversed(stack):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_vs_brandes(ray_session):
    from kire_ray.pipelines.graph_algos import betweenness

    rows = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),   # path: c is central
        ("b", "f"), ("f", "c"),                             # parallel 2-path b..c
        ("x", "y"),                                         # separate component
        ("e", "e"),                                         # self-loop (dropped)
        ("a", "b"),                                         # duplicate edge
    ]
    df = pd.DataFrame(
        {"h_qid": [r[0] for r in rows], "t_qid": [r[1] for r in rows]}
    )
    nodes = sorted(set(df["h_qid"]) | set(df["t_qid"]) - {"e"} | {"e"})
    pivots = sorted(
        nodes, key=lambda q: (hashlib.md5(q.encode()).hexdigest(), q)
    )[:20]  # all nodes → exact betweenness
    exp = _brandes_oracle(df, pivots)
    outs = []
    for blocks in (2, 7):
        got = (
            betweenness(_ds(df, blocks), n_pivots=20)
            .to_pandas()
            .sort_values("qid")
            .reset_index(drop=True)
        )
        for q, b in zip(got["qid"], got["betweenness"]):
            assert abs(b - np.floor(exp[q] * 1e6 + 0.501) / 1e6) < 2e-6, (q, b, exp[q])
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    g = dict(zip(outs[0]["qid"], outs[0]["betweenness"]))
    # c bridges {a,b,f} to {d,e}: strictly the most central
    assert g["c"] == max(g.values()) and g["c"] > 0
    # isolated-component endpoints carry no betweenness
    assert g["x"] == 0.0 and g["y"] == 0.0


def test_schema_profile_vs_pandas(ray_session):
    from kire_ray.pipelines.kg_profile import schema_profile

    triples = pd.DataFrame(
        {
            "h_qid": ["Q1", "Q1", "Q2", "Q3"],
            "prop": ["P1", "P1", "P2", "P1"],
            "t_qid": ["Q2", "Q3", "Q3", "Q4"],
        }
    )
    attrs = pd.DataFrame(
        {
            "qid": ["Q1", "Q1", "Q2", "Q3"],
            "attr_key": ["instance of", "instance of", "label", "instance of"],
            # Q1 has two types -> min picks 'city'
            "attr_val": ["town", "city", "Q2label", "human"],
        }
    )
    got = (
        schema_profile(_ds(triples, 3), _ds(attrs, 2))
        .to_pandas()
        .sort_values(["pred", "h_type", "t_type"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "pred": ["P1", "P1", "P1", "P2"],
            "h_type": ["city", "city", "human", ""],
            "t_type": ["", "human", "", "human"],
            "n": [1, 1, 1, 1],
        }
    ).sort_values(["pred", "h_type", "t_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_ppr_vs_sequential(ray_session):
    """Personalized PageRank vs a sequential numpy replay (same md5
    seed choice, same no-dangling-redistribution contract) and
    partition invariance."""
    from kire_ray.pipelines.graph_algos import ppr

    rows = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
        ("x", "y"),  # component away from the seeds (maybe)
    ]
    df = pd.DataFrame(
        {"h_qid": [r[0] for r in rows], "t_qid": [r[1] for r in rows]}
    )
    nodes = np.sort(np.array(sorted(set(df["h_qid"]) | set(df["t_qid"])), dtype=object))
    n = len(nodes)
    seeds = sorted(nodes, key=lambda q: (hashlib.md5(q.encode()).hexdigest(), q))[:2]
    seed_idx = np.searchsorted(nodes, np.array(sorted(seeds), dtype=object))
    teleport = np.zeros(n)
    teleport[seed_idx] = 0.15 / len(seeds)
    deg = np.zeros(n)
    for s in df["h_qid"]:
        deg[np.searchsorted(nodes, s)] += 1
    r = teleport / 0.15
    for _ in range(10):
        new = teleport.copy()
        for s, t in rows:
            si, ti = np.searchsorted(nodes, s), np.searchsorted(nodes, t)
            new[ti] += 0.85 * r[si] / deg[si]
        r = new
    exp = {q: np.floor(v * 1e6 + 0.501) / 1e6 for q, v in zip(nodes, r)}
    exp = {q: v for q, v in exp.items() if v > 0.0}

    outs = []
    for blocks in (1, 4):
        got = (
            ppr(_ds(df, blocks), n_seeds=2)
            .to_pandas()
            .sort_values("qid")
            .reset_index(drop=True)
        )
        assert set(got["qid"]) == set(exp)
        for q, v in zip(got["qid"], got["rank"]):
            assert abs(v - exp[q]) < 2e-6, (q, v, exp[q])
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # seeds carry teleport mass
    for s in seeds:
        assert exp[s] >= 0.15 / len(seeds) - 1e-9


def test_edge_lifespan_paths_equal(ray_session):
    """Broadcast conv-start fast path ≡ tagged-exchange scale path."""
    import ray as _ray

    from kire_ray.pipelines.kg_profile import edge_lifespan

    triples = pd.DataFrame(
        {
            "doc_id": ["c1", "c1", "c2", "c3", "c3"],
            "subj_qid": ["Q1", "Q1", "Q1", "Q2", "Q1"],
            "pred": ["P1", "P1", "P1", "P2", "P1"],
            "obj_qid": ["Q9", "Q9", "Q9", "Q8", "Q9"],
        }
    )
    tr = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2", "c3"],
            "ts": pd.to_datetime(
                [1_700_000_000_000_000 + i * 10**6 for i in (5, 1, 9, 3)], unit="us"
            ),
        }
    )
    tds = _ray.data.from_pandas(tr).repartition(2)
    eds = _ray.data.from_pandas(triples).repartition(2)

    def norm(ds):
        out = ds.to_pandas()
        cols = sorted(out.columns)
        return out[cols].sort_values(cols).reset_index(drop=True)

    fast = norm(edge_lifespan(eds, tds, broadcast_limit=1000))
    slow = norm(edge_lifespan(eds, tds, broadcast_limit=0))
    pd.testing.assert_frame_equal(fast, slow)
    # c1's start must be the MIN ts of the conversation (1s, not 5s)
    q1 = fast[fast["subj_qid"] == "Q1"].iloc[0]
    assert q1["n_docs"] == 2 or len(fast) == 2


def test_edge_lifespan_fast_path_dup_across_blocks(ray_session):
    """ADVICE r4: a duplicate (doc, s, p, o) row split across BLOCKS
    must not double-count n_docs on the broadcast fast path — the
    global per-doc dedup lives in the edge-keyed fold, not per block."""
    import ray as _ray

    from kire_ray.pipelines.kg_profile import edge_lifespan

    # the duplicate (c1, Q1, P1, Q9) row is FORCED into two different
    # blocks (one input frame per block)
    b1 = pd.DataFrame(
        {"doc_id": ["c1", "c2"], "subj_qid": ["Q1", "Q1"],
         "pred": ["P1", "P1"], "obj_qid": ["Q9", "Q9"]}
    )
    b2 = pd.DataFrame(
        {"doc_id": ["c1"], "subj_qid": ["Q1"], "pred": ["P1"], "obj_qid": ["Q9"]}
    )
    tr = pd.DataFrame(
        {
            "conv_id": ["c1", "c2"],
            "ts": pd.to_datetime([1_000_000, 2_000_000], unit="us"),
        }
    )
    eds = _ray.data.from_pandas([b1, b2])
    tds = _ray.data.from_pandas(tr)

    def norm(ds):
        out = ds.to_pandas()
        cols = sorted(out.columns)
        return out[cols].sort_values(cols).reset_index(drop=True)

    fast = norm(edge_lifespan(eds, tds, broadcast_limit=1000))
    slow = norm(edge_lifespan(eds, tds, broadcast_limit=0))
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) == 1
    assert int(fast["n_docs"].iloc[0]) == 2  # c1 counted once, not twice
    assert int(fast["first_us"].iloc[0]) == 1_000_000
    assert int(fast["last_us"].iloc[0]) == 2_000_000
