"""Iterative graph algorithms over the KG edge table.

``pagerank`` — power iteration done Dataset-style: each iteration is
ONE streaming pass over the (possibly huge) edge table emitting
per-block partial contribution rows, reduced by a grouped exchange to
a node-sized table; only the node-sized rank vector crosses
iterations (broadcast via ``ray.put``).  The reference has no graph
ranking, but its KG side table (ATLOP+KIRE/data/gen_kg_data.py .nt3
triples) is exactly the edge list a downstream curriculum/importance
pipeline ranks — and iterative algorithms are the one shape Ray Data
doesn't give you for free, so the engine shows the pattern.

Semantics (documented simplification): the dangling-mass
redistribution is omitted — r_{k+1}(v) = 0.15/N + 0.85·Σ_{u→v}
r_k(u)/outdeg(u) — which keeps every iteration a single grouped sum
and the whole run reproducible in SQL (the oracle unrolls the
iterations programmatically).  Multi-edges count once each, matching
the raw triple rows.

At 100 TB: the edge pass is streaming and the exchange is
O(nodes × blocks); the rank vector broadcast assumes the *node* table
is dimension-sized (entities, not documents).  For billion-node
graphs swap the broadcast for a hash join on src — same pipeline
shape, one more exchange per iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from kire_ray.functions.rounding import round_half_up

DAMPING = 0.85
PR_ITERS = 10


def pagerank(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    iters: int = PR_ITERS,
) -> "ray.data.Dataset":
    """Returns (qid, rank) after ``iters`` power iterations (rank
    rounded half-up to 6 decimals)."""
    from kire_ray.stages.shuffle import grouped_agg, iteration_blocks

    ed = iteration_blocks(edges.select_columns([src_col, dst_col]))

    # node universe + out-degrees: two vocab-bounded exchanges
    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b[src_col], b[dst_col]]).unique()
        return pd.DataFrame({"q": u})

    from kire_ray.stages.shuffle import partitioned_map_groups

    nodes = (
        partitioned_map_groups(
            ed.map_batches(node_partial, batch_format="pandas"),
            ["q"],
            lambda p: p.drop_duplicates(),
        )
        .to_pandas()["q"]
        .to_numpy(dtype=object)
    )
    nodes = np.sort(nodes)
    n = len(nodes)

    deg_tab = grouped_agg(
        ed.map_batches(
            lambda b: b.groupby(src_col, sort=False)
            .size()
            .rename("d")
            .reset_index(),
            batch_format="pandas",
        ),
        [src_col],
        {"d": ("d", "sum")},
    ).to_pandas()
    deg = np.zeros(n, dtype=np.float64)
    deg[np.searchsorted(nodes, deg_tab[src_col].to_numpy())] = deg_tab["d"].to_numpy(
        np.float64
    )

    ranks = np.full(n, 1.0 / n, dtype=np.float64)
    base = 0.15 / n
    for _ in range(iters):
        ref = ray.put((nodes, ranks, deg))

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            nd, r, d = ray.get(ref)
            si = np.searchsorted(nd, b[src_col].to_numpy())
            w = r[si] / d[si]
            out = pd.DataFrame({"q": b[dst_col], "c": w})
            return out.groupby("q", sort=False).agg(c=("c", "sum")).reset_index()

        # block-local partials merged on the driver: the merged table
        # is node-bounded, and the node/rank vectors are already
        # driver-resident (the broadcast contract above) — so skipping
        # the grouped exchange adds no scale exposure and removes a
        # whole shuffle per iteration (halves per-iter wall time)
        ct = (
            ed.map_batches(contrib, batch_format="pandas")
            .to_pandas()
            .groupby("q", sort=False)["c"]
            .sum()
            .reset_index()
        )
        new = np.full(n, base, dtype=np.float64)
        di = np.searchsorted(nodes, ct["q"].to_numpy())
        new[di] = base + DAMPING * ct["c"].to_numpy(np.float64)
        ranks = new

    return ray.data.from_pandas(
        pd.DataFrame({"qid": nodes, "rank": round_half_up(pd.Series(ranks), 6)})
    )


def triangle_count(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
) -> "ray.data.Dataset":
    """Exact triangle count of the undirected simple graph underlying
    the edge table (self-loops dropped, multi-edges collapsed).

    Shape: canonicalize to a<b edges (one distinct exchange) → group
    by the smallest endpoint and emit each wedge (a<b<c, vectorized
    pair explode per partition) → one bucketed hash-exchange semi-join
    of wedges against the edge set closes them. Each triangle is
    produced exactly once (at its smallest vertex), so the count needs
    no division — and everything is integer, so the SQL oracle (a
    three-way self-join) matches bit-exactly. Wedge volume is
    Σ_a C(deg_>a(a), 2); for web-scale hub nodes switch to
    degree-ordered orientation (same pipeline, different comparator).

    Returns one row (n_edges, n_wedges, n_triangles).
    """
    from kire_ray.stages.shuffle import iteration_blocks, partitioned_map_groups

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(dtype=object)
        t = b[dst_col].to_numpy(dtype=object)
        keep = s != t
        s, t = s[keep], t[keep]
        lo = np.where(s < t, s, t)
        hi = np.where(s < t, t, s)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    ed = iteration_blocks(
        partitioned_map_groups(
            edges.map_batches(canon, batch_format="pandas"),
            ["a", "b"],
            lambda p: p.drop_duplicates(),
        )
    )
    n_edges = ed.count()

    def wedges(part: pd.DataFrame) -> pd.DataFrame:
        # one frame per partition, not per apex: the loop only gathers
        # index arrays (a per-group pd.DataFrame append measured as the
        # hot spot on thousand-node graphs)
        xs, ys = [], []
        part = part.sort_values(["a", "b"], kind="mergesort")
        b_all = part["b"].to_numpy(dtype=object)
        for _, idx in part.groupby("a", sort=False).indices.items():
            if len(idx) < 2:
                continue
            nb = b_all[idx]
            i, j = np.triu_indices(len(nb), k=1)
            xs.append(nb[i])
            ys.append(nb[j])
        if not xs:
            return pd.DataFrame({"a": [], "b": []}).astype(object)
        return pd.DataFrame(
            {"a": np.concatenate(xs), "b": np.concatenate(ys)}
        )

    wg = partitioned_map_groups(ed, ["a"], wedges)
    n_wedges = wg.count()

    # close wedges: co-locate wedges and edges by (a, b); a wedge that
    # meets an identical edge in its partition is a triangle
    def tag(kind):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(is_edge=kind)

        return f

    both = wg.map_batches(tag(False), batch_format="pandas").union(
        ed.map_batches(tag(True), batch_format="pandas")
    )

    def close(part: pd.DataFrame) -> pd.DataFrame:
        e = part[part["is_edge"]][["a", "b"]].drop_duplicates()
        w = part[~part["is_edge"]][["a", "b"]]
        if e.empty or w.empty:
            return pd.DataFrame({"n": [0]})
        m = w.merge(e, on=["a", "b"], how="inner")
        return pd.DataFrame({"n": [len(m)]})

    tri = partitioned_map_groups(both, ["a", "b"], close).to_pandas()["n"].sum()
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n_edges": [n_edges],
                "n_wedges": [n_wedges],
                "n_triangles": [int(tri)],
            }
        ).astype(np.int64)
    )


KCORE_K = 3
KCORE_ROUNDS = 10


def kcore(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
) -> "ray.data.Dataset":
    """k-core peeling on the undirected simple graph: ``rounds``
    synchronous rounds of "drop every node with degree < k, then drop
    the edges that touched it". The round count is part of the declared
    semantics (deterministic, SQL-unrollable); peeling converges
    geometrically, so 10 rounds reach the fixed point on anything but
    adversarial path-chains — and a non-converged result is still
    exactly "the graph after 10 peels".

    Each round is one degree exchange (O(nodes×blocks) combiner rows)
    + one broadcast membership filter over the edge stream — the
    surviving-node set is node-table-sized (broadcast trade-off as
    elsewhere; swap for a semi-join exchange at billion-node scale).

    Returns (qid, degree) for nodes surviving all rounds, with their
    degree in the peeled graph.
    """
    from kire_ray.stages.joins import semi_join_broadcast
    from kire_ray.stages.shuffle import (
        grouped_agg,
        iteration_blocks,
        partitioned_map_groups,
    )

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(dtype=object)
        t = b[dst_col].to_numpy(dtype=object)
        keep = s != t
        s, t = s[keep], t[keep]
        lo = np.where(s < t, s, t)
        hi = np.where(s < t, t, s)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    ed = iteration_blocks(
        partitioned_map_groups(
            edges.map_batches(canon, batch_format="pandas"),
            ["a", "b"],
            lambda p: p.drop_duplicates(),
        )
    )

    def degrees(e: "ray.data.Dataset") -> pd.DataFrame:
        def part(b: pd.DataFrame) -> pd.DataFrame:
            c = (
                pd.concat([b["a"], b["b"]])
                .value_counts()
                .rename_axis("q")
                .rename("d")
                .reset_index()
            )
            return c

        # node-bounded partials, merged on the driver (the alive set is
        # broadcast from the driver anyway — same contract as pagerank)
        df = e.map_batches(part, batch_format="pandas").to_pandas()
        if len(df):
            df = df.groupby("q", sort=False)["d"].sum().reset_index()
        if "q" not in df.columns:  # fully peeled graph: schema-less empty
            df = pd.DataFrame(
                {"q": pd.Series([], dtype=object), "d": pd.Series([], dtype=np.int64)}
            )
        return df

    for _ in range(rounds):
        deg = degrees(ed)
        alive = deg[deg["d"] >= k]["q"]
        if len(alive) == len(deg):
            break  # fixed point — remaining rounds are no-ops
        alive_set = frozenset(alive)
        ed = semi_join_broadcast(
            semi_join_broadcast(ed, alive_set, "a"), alive_set, "b"
        ).materialize()

    deg = degrees(ed)
    out = deg[deg["d"] >= k].sort_values("q").reset_index(drop=True)
    return ray.data.from_pandas(
        pd.DataFrame({"qid": out["q"], "degree": out["d"].astype(np.int64)})
    )


def bfs_levels(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    max_levels: int = 8,
) -> "ray.data.Dataset":
    """Single-source BFS over the undirected KG graph from the
    lexicographically smallest node — the reachability/diameter probe a
    KG-curation pipeline runs to find satellite components and hub
    distance distributions.

    Frontier expansion, Dataset-style: each level is ONE streaming pass
    over the adjacency table (frontier membership via a broadcast
    sorted array + searchsorted — never a per-row Python set probe)
    followed by one node-bounded distinct. Only node-sized state (the
    visited map / frontier) crosses iterations, under the same
    dimension-sized-node-table assumption ``pagerank`` documents; for
    billion-node graphs swap the broadcast for a hash anti-join on the
    visited table — same pipeline shape.

    Returns (qid, level) for reached nodes, level ≤ ``max_levels``;
    early-exits when a frontier empties.
    """
    from kire_ray.stages.shuffle import iteration_blocks

    ed = edges.select_columns([src_col, dst_col])

    def undirected(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([b[src_col], b[dst_col]], ignore_index=True)
        t = pd.concat([b[dst_col], b[src_col]], ignore_index=True)
        df = pd.DataFrame({"s": s, "t": t})
        return df[df["s"] != df["t"]].drop_duplicates()

    adj = iteration_blocks(ed.map_batches(undirected, batch_format="pandas"))

    seed_parts = adj.map_batches(
        lambda b: pd.DataFrame({"q": [b["s"].min()]}), batch_format="pandas"
    ).to_pandas()
    if seed_parts.empty:
        return ray.data.from_pandas(
            pd.DataFrame({"qid": pd.Series([], dtype=object),
                          "level": pd.Series([], dtype=np.int64)})
        )
    seed = seed_parts["q"].min()

    visited: dict = {seed: 0}
    frontier = np.array([seed], dtype=object)
    for lvl in range(1, max_levels + 1):
        f_ref = ray.put(np.sort(frontier))

        def expand(b: pd.DataFrame, _f=f_ref) -> pd.DataFrame:
            f = ray.get(_f)
            s = b["s"].to_numpy()
            pos = np.searchsorted(f, s)
            hit = (pos < len(f)) & (f[np.minimum(pos, len(f) - 1)] == s)
            return pd.DataFrame({"q": b["t"].to_numpy()[hit]}).drop_duplicates()

        # node-bounded collect (same contract as the pagerank rank
        # vector): candidates are ≤ |V| after per-block dedup
        cand = adj.map_batches(expand, batch_format="pandas").to_pandas()
        new = [q for q in pd.unique(cand["q"]) if q not in visited]
        if not new:
            break
        for q in new:
            visited[q] = lvl
        frontier = np.array(new, dtype=object)

    out = pd.DataFrame(
        {"qid": list(visited.keys()), "level": np.array(list(visited.values()), dtype=np.int64)}
    )
    return ray.data.from_pandas(out)


def lpa_communities(
    edges: "ray.data.Dataset",
    *,
    rounds: int = 5,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
) -> "ray.data.Dataset":
    """Community detection by synchronous label propagation, made
    deterministic: each round every node adopts the most frequent label
    among its neighbours, ties broken toward the lexicographically
    smallest label, all nodes updating simultaneously for a FIXED
    number of rounds (async/random-order LPA is irreproducible by
    construction; the fixed-round synchronous variant is
    layout-invariant and SQL-unrollable like ``pagerank``/``kcore``).

    Each round is ONE streaming edge pass (neighbour labels via the
    broadcast node-sized label vector — same dimension-table contract
    as pagerank; hash-join swap documented there for billion-node
    graphs) emitting per-block partial (node, label, n) counts, then
    one grouped exchange whose reducer finishes the counts and takes
    the (n desc, label asc) argmax per node.

    Returns (qid, community) — community = the stable label name.
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    def undirected(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([b[src_col], b[dst_col]], ignore_index=True)
        t = pd.concat([b[dst_col], b[src_col]], ignore_index=True)
        df = pd.DataFrame({"a": s, "b": t})
        return df[df["a"] != df["b"]].drop_duplicates()

    # undirected() already dedups per block; the global distinct is the
    # exchange right below (an intermediate drop_duplicates pass was a
    # pure extra scan — review r5)
    adj = edges.select_columns([src_col, dst_col]).map_batches(
        undirected, batch_format="pandas"
    )
    # global distinct via one exchange, then materialize once at
    # iteration-friendly block width
    from kire_ray.stages.shuffle import iteration_blocks

    adj = iteration_blocks(
        partitioned_map_groups(adj, ["a", "b"], lambda p: p.drop_duplicates())
    )

    nodes = (
        partitioned_map_groups(
            adj.select_columns(["a"]),
            ["a"],
            lambda p: p.drop_duplicates(),
        )
        .to_pandas()["a"]
        .to_numpy()
    )
    labels = pd.Series(nodes, index=nodes)  # node-bounded state

    for _ in range(rounds):
        ref = ray.put(labels)

        def partial(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            lab = ray.get(_ref)
            return (
                pd.DataFrame(
                    {"node": b["a"].to_numpy(), "label": b["b"].map(lab).to_numpy()}
                )
                .groupby(["node", "label"], sort=False)
                .size()
                .rename("n")
                .reset_index()
            )

        # (node,label) partials merged on the driver — the label vector
        # is driver-resident and broadcast each round anyway (same
        # contract as pagerank), so the per-round grouped exchange is
        # pure overhead; the driver argmax is node-bounded
        p = adj.map_batches(partial, batch_format="pandas").to_pandas()
        new = (
            p.groupby(["node", "label"], sort=False)["n"]
            .sum()
            .reset_index()
            .sort_values(["node", "n", "label"], ascending=[True, False, True],
                         kind="mergesort")
            .drop_duplicates("node")[["node", "label"]]
        )
        labels = pd.Series(new["label"].to_numpy(), index=new["node"].to_numpy())

    out = labels.rename("community").rename_axis("qid").reset_index()
    return ray.data.from_pandas(out)


def link_prediction(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "s1",
    dst_col: str = "s2",
    min_common: int = 2,
    support_col: str | None = None,
    min_support: int = 1,
) -> "ray.data.Dataset":
    """Neighborhood link-prediction scores over an undirected simple
    graph: for every NON-adjacent pair sharing ≥ ``min_common`` common
    neighbors, the three classic scores — common-neighbor count,
    neighborhood Jaccard, Adamic-Adar (Σ 1/ln(deg(c)) over common
    neighbors c; a common neighbor has degree ≥ 2 so the log is never
    zero). The KG-completion candidate generator (Liben-Nowell &
    Kleinberg 2003) run before an expensive relation scorer.

    Shape: wedge enumeration grouped by the CENTER node (one exchange;
    each wedge carries its center's 1/ln(deg) weight so Adamic-Adar is
    a plain grouped sum), then one exchange on the endpoint pair that
    both aggregates scores and anti-joins existing edges (edge rows
    ride the same exchange tagged — the triangle_count close shape).
    Degrees are node-bounded and broadcast (dimension-sized node table
    contract as ``pagerank``). Hub centers emit C(deg,2) wedges — the
    documented skew cost of wedge enumeration; cap or degree-orient at
    web scale (same note as ``triangle_count``). ``min_support`` (on
    ``support_col``, e.g. the co-mention doc count) sparsifies the
    graph BEFORE wedge enumeration — the burst-noise filter that keeps
    degree, and hence wedge volume, bounded on dense co-occurrence
    graphs (387k → 16k edges at sf0.1 with support ≥ 2).
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    if support_col is not None and min_support > 1:
        edges = edges.filter(expr=f"{support_col} >= {int(min_support)}")
    edges = edges.select_columns([src_col, dst_col]).materialize()
    # size the two exchanges to the (sparsified) graph: at 64 default
    # partitions a 16k-edge graph paid ~300 near-empty task launches —
    # pure driver scheduling. ~25k edges per partition, floor 8.
    from kire_ray.stages.shuffle import default_partitions

    n_edges = edges.count()
    P = max(8, min(default_partitions(), -(-n_edges // 25_000)))

    # node-bounded degree table straight off the (unique-pair) edge
    # list: block partials → driver fold → broadcast. The input
    # contract is one row per undirected pair (the co-mention /
    # dedup-pair producers all guarantee it), so no dedup exchange is
    # needed before counting — that exchange used to be a whole extra
    # barrier in front of wedge generation.
    deg = (
        edges.map_batches(
            lambda b: pd.concat([b[src_col], b[dst_col]], ignore_index=True)
            .value_counts()
            .rename("d")
            .rename_axis("c")
            .reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("c", sort=False)["d"]
        .sum()
    )
    deg_nodes = np.sort(deg.index.to_numpy(dtype=object))
    deg_vals = deg.reindex(deg_nodes).to_numpy(np.float64)
    dref = ray.put((deg_nodes, deg_vals))

    def undirected(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([b[src_col], b[dst_col]], ignore_index=True)
        t = pd.concat([b[dst_col], b[src_col]], ignore_index=True)
        df = pd.DataFrame({"c": s, "nb": t})
        return df[df["c"] != df["nb"]]

    edges_p = edges.repartition(P).materialize()
    und = edges_p.map_batches(undirected, batch_format="pandas")

    def wedges(part: pd.DataFrame) -> pd.DataFrame:
        nd, dv = ray.get(dref)
        # the exchange co-located every neighbor of c; drop_duplicates
        # is a cheap safety net for multigraph inputs
        p = part.drop_duplicates().sort_values(["c", "nb"], kind="mergesort")
        m = p.merge(p, on="c", suffixes=("_a", "_b"))
        m = m[m["nb_a"] < m["nb_b"]]
        if m.empty:
            return pd.DataFrame(
                {"x": np.array([], object), "y": np.array([], object),
                 "w": np.array([], np.float64), "is_edge": np.array([], bool)}
            )
        dc = dv[np.searchsorted(nd, m["c"].to_numpy(dtype=object))]
        return pd.DataFrame(
            {
                "x": m["nb_a"].to_numpy(),
                "y": m["nb_b"].to_numpy(),
                "w": 1.0 / np.log(dc),
                "is_edge": np.zeros(len(m), dtype=bool),
            }
        )

    wg = partitioned_map_groups(und, ["c"], wedges, num_partitions=P)

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(dtype=object)
        t = b[dst_col].to_numpy(dtype=object)
        keep = s != t
        s, t = s[keep], t[keep]
        lo = np.where(s < t, s, t)
        hi = np.where(s < t, t, s)
        return pd.DataFrame(
            {"x": lo, "y": hi, "w": 0.0, "is_edge": np.ones(len(lo), dtype=bool)}
        ).drop_duplicates(["x", "y"])

    both = wg.union(edges_p.map_batches(edge_rows, batch_format="pandas"))

    def score(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"s1": np.array([], object), "s2": np.array([], object),
             "cn": np.array([], np.int64),
             "jaccard": np.array([], np.float64),
             "adamic_adar": np.array([], np.float64)}
        )
        if part.empty or "is_edge" not in part.columns:
            return empty
        adjacent = part[part["is_edge"]][["x", "y"]]
        w = part[~part["is_edge"]]
        if len(adjacent):
            w = w.merge(adjacent, on=["x", "y"], how="left", indicator=True)
            w = w[w["_merge"] == "left_only"]
        if w.empty:
            return empty
        g = w.groupby(["x", "y"], sort=False)["w"].agg(["size", "sum"]).reset_index()
        g = g[g["size"] >= min_common]
        if g.empty:
            return empty
        nd, dv = ray.get(dref)
        dx = dv[np.searchsorted(nd, g["x"].to_numpy(dtype=object))]
        dy = dv[np.searchsorted(nd, g["y"].to_numpy(dtype=object))]
        cn = g["size"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "s1": g["x"].to_numpy(),
                "s2": g["y"].to_numpy(),
                "cn": cn,
                "jaccard": round_half_up(cn / (dx + dy - cn), 6),
                "adamic_adar": round_half_up(g["sum"].to_numpy(np.float64), 6),
            }
        )

    return partitioned_map_groups(both, ["x", "y"], score, num_partitions=P)


HITS_ITERS = 5


def hits(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    iters: int = HITS_ITERS,
) -> "ray.data.Dataset":
    """HITS hubs & authorities (Kleinberg 1999) with L1 (sum)
    normalization — the companion centrality to ``pagerank`` that
    scores nodes on BOTH roles of a directed edge (good sources vs
    good targets; in a KG: prolific subjects vs canonical objects).

    Same distributed contract as ``pagerank``: the node/score vectors
    are driver-resident broadcasts (node-bounded — the documented
    billion-node hash-join swap applies identically), and each of the
    ``iters`` rounds is TWO streaming edge passes (auth ← hubs of
    in-neighbors, then hub ← auths of out-neighbors), each a
    block-local grouped partial folded on the driver. L1 rather than
    the textbook L2 normalization keeps every intermediate a plain
    sum/division, mirrored exactly in the unrolled SQL oracle
    (kg_hits); the ranking is invariant to the norm choice.

    Output: (qid, auth, hub), both rounded half-up at 6 decimals.
    """
    from kire_ray.stages.shuffle import iteration_blocks, partitioned_map_groups

    ed = iteration_blocks(edges.select_columns([src_col, dst_col]))

    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b[src_col], b[dst_col]]).unique()
        return pd.DataFrame({"q": u})

    nodes = (
        partitioned_map_groups(
            ed.map_batches(node_partial, batch_format="pandas"),
            ["q"],
            lambda p: p.drop_duplicates(),
        )
        .to_pandas()["q"]
        .to_numpy(dtype=object)
    )
    nodes = np.sort(nodes)
    n = len(nodes)

    hub = np.full(n, 1.0 / n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put((nodes, hub))

        def a_pass(b: pd.DataFrame) -> pd.DataFrame:
            nd, h = ray.get(ref)
            si = np.searchsorted(nd, b[src_col].to_numpy())
            out = pd.DataFrame({"q": b[dst_col], "c": h[si]})
            return out.groupby("q", sort=False).agg(c=("c", "sum")).reset_index()

        at = (
            ed.map_batches(a_pass, batch_format="pandas")
            .to_pandas()
            .groupby("q", sort=False)["c"]
            .sum()
        )
        auth = np.zeros(n, dtype=np.float64)
        auth[np.searchsorted(nodes, at.index.to_numpy())] = at.to_numpy(np.float64)
        auth /= auth.sum()

        ref2 = ray.put((nodes, auth))

        def h_pass(b: pd.DataFrame) -> pd.DataFrame:
            nd, a = ray.get(ref2)
            di = np.searchsorted(nd, b[dst_col].to_numpy())
            out = pd.DataFrame({"q": b[src_col], "c": a[di]})
            return out.groupby("q", sort=False).agg(c=("c", "sum")).reset_index()

        ht = (
            ed.map_batches(h_pass, batch_format="pandas")
            .to_pandas()
            .groupby("q", sort=False)["c"]
            .sum()
        )
        hub = np.zeros(n, dtype=np.float64)
        hub[np.searchsorted(nodes, ht.index.to_numpy())] = ht.to_numpy(np.float64)
        hub /= hub.sum()

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "qid": nodes,
                "auth": round_half_up(pd.Series(auth), 6),
                "hub": round_half_up(pd.Series(hub), 6),
            }
        )
    )


def negative_samples(
    edges: "ray.data.Dataset",
    *,
    h_col: str = "h_qid",
    r_col: str = "prop",
    t_col: str = "t_qid",
    k: int = 2,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """KG-embedding negative sampling (TransE / Bordes et al. 2013
    corrupted-triple protocol, tail corruption): for every positive
    triple, ``k`` deterministic candidate negatives — the corrupt tail
    is the entity at index ``md5(h|r|t|j) mod n_entities`` in the
    SORTED node universe (the engine's SQL-parity hash, so the sample
    is reconstructible in DuckDB) — filtered so no accidental positive
    (an existing (h, r, t') triple) and no self-replacement survives.

    Distribution: the sorted node array broadcasts once (node-bounded,
    same contract as pagerank); candidates generate vectorized per
    batch; the accidental-positive filter is ONE tagged exchange on
    (h, r, t) — real triples ride with candidates and the reducer
    drops matches (the incremental_dedup shape), never a broadcast of
    the fact-sized triple set.

    Output: (h_qid, prop, t_neg, j).
    """
    from hashlib import md5

    from kire_ray.stages.shuffle import partitioned_map_groups

    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b[h_col], b[t_col]]).unique()
        return pd.DataFrame({"q": u})

    nodes = (
        partitioned_map_groups(
            edges.map_batches(node_partial, batch_format="pandas"),
            ["q"],
            lambda p: p.drop_duplicates(),
        )
        .to_pandas()["q"]
        .to_numpy(dtype=object)
    )
    nodes = np.sort(nodes)
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def cand_side(b: pd.DataFrame) -> pd.DataFrame:
        nd = ray.get(nodes_ref)
        hs = b[h_col].to_numpy(object)
        rs = b[r_col].to_numpy(object)
        ts = b[t_col].to_numpy(object)
        out_h, out_r, out_t, out_j = [], [], [], []
        for j in range(1, k + 1):
            ci = np.fromiter(
                (
                    (
                        int.from_bytes(
                            md5(f"{h}|{r}|{t}|{j}".encode("utf-8")).digest()[:7],
                            "big",
                        )
                        >> 4
                    )
                    % n
                    for h, r, t in zip(hs, rs, ts)
                ),
                dtype=np.int64,
                count=len(b),
            )
            neg = nd[ci]
            keep = neg != ts
            out_h.append(hs[keep])
            out_r.append(rs[keep])
            out_t.append(neg[keep])
            out_j.append(np.full(int(keep.sum()), j, dtype=np.int64))
        return pd.DataFrame(
            {
                "h_qid": np.concatenate(out_h),
                "prop": np.concatenate(out_r),
                "t_cand": np.concatenate(out_t),
                "j": np.concatenate(out_j),
            }
        )

    def real_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h_qid": b[h_col].to_numpy(object),
                "prop": b[r_col].to_numpy(object),
                "t_cand": b[t_col].to_numpy(object),
                "j": np.zeros(len(b), dtype=np.int64),  # 0 marks a real triple
            }
        )

    both = edges.map_batches(cand_side, batch_format="pandas").union(
        edges.map_batches(real_side, batch_format="pandas")
    )

    def drop_accidental(part: pd.DataFrame) -> pd.DataFrame:
        real = part[part["j"] == 0]
        cand = part[part["j"] > 0]
        key = ["h_qid", "prop", "t_cand"]
        keep = cand.merge(
            real[key].drop_duplicates(), on=key, how="left", indicator=True
        )
        keep = keep[keep["_merge"] == "left_only"]
        return pd.DataFrame(
            {
                "h_qid": keep["h_qid"].to_numpy(object),
                "prop": keep["prop"].to_numpy(object),
                "t_neg": keep["t_cand"].to_numpy(object),
                "j": keep["j"].to_numpy(np.int64),
            }
        )

    return partitioned_map_groups(
        both,
        ["h_qid", "prop", "t_cand"],
        drop_accidental,
        num_partitions=num_partitions,
    )


def link_eval(
    edges: "ray.data.Dataset",
    *,
    h_col: str = "h_qid",
    r_col: str = "prop",
    t_col: str = "t_qid",
    eval_mod: int = 10,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """KG-embedding link-prediction evaluation, filtered protocol
    (Bordes et al. 2013 §5, tail prediction): every triple's true tail
    is ranked against the full entity universe under a deterministic
    model score, with other TRUE tails of the same (h, r) removed from
    the candidate list (the "filtered" setting).  The model score is
    the engine's SQL-parity md5 basis — the integer value of the first
    13 md5 hex digits of ``h|r|candidate`` (the same 52-bit quantity
    ``score01_md5`` scales to [0,1); comparisons are identical on the
    raw integers, so the oracle never needs the float division) —
    making the whole eval reconstructible in DuckDB.

    rank(h, r, t) = 1 + #{c in nodes : c is not a true tail of (h, r)
    and score(h, r, c) > score(h, r, t)}.

    Only triples in a deterministic 10% TEST SPLIT are ranked —
    ``md5(h|r|t|eval) % eval_mod == 0``, the same seeded content-hash
    split the engine uses for train/dev (pipelines/eval.py, O8): the
    published protocol evaluates the held-out split, never the full
    training graph, and ranking everything is O(|E|·|N|) hash work for
    no extra signal.  The FILTER still uses ALL triples (the filtered
    setting removes every known positive, train or test).

    Distribution: the sorted node universe broadcasts once
    (node-bounded, the pagerank/negative_samples contract); triples
    exchange ONCE on (h, r) so each reducer group holds exactly the
    true-tail set it must filter; per group with a test member the
    candidate scores compute as one bulk digest pass
    (``np.frombuffer`` over joined 8-byte digests — no per-candidate
    Python int conversion) and every test tail ranks via one
    searchsorted.  Full-universe candidate scoring is the published
    protocol — at billion-node scale the standard fallback is a
    deterministic md5-sampled candidate subset, same pipeline shape.

    Output: (h_qid, prop, t_qid, t_rank, rr) with rr = 1.0 / t_rank.
    """
    from hashlib import md5

    from kire_ray.stages.shuffle import partitioned_map_groups

    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b[h_col], b[t_col]]).unique()
        return pd.DataFrame({"q": u})

    nodes = (
        partitioned_map_groups(
            edges.map_batches(node_partial, batch_format="pandas"),
            ["q"],
            lambda p: p.drop_duplicates(),
        )
        .to_pandas()["q"]
        .to_numpy(dtype=object)
    )
    nodes = np.sort(nodes)
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def rank_part(part: pd.DataFrame) -> pd.DataFrame:
        if h_col not in part.columns or len(part) == 0:
            return pd.DataFrame(
                {
                    "h_qid": pd.Series([], dtype=object),
                    "prop": pd.Series([], dtype=object),
                    "t_qid": pd.Series([], dtype=object),
                    "t_rank": pd.Series([], dtype=np.int64),
                    "rr": pd.Series([], dtype=np.float64),
                }
            )
        nd = ray.get(nodes_ref)
        node_b = [str(c).encode("utf-8") for c in nd]
        out_h, out_r, out_t, out_rank = [], [], [], []
        for (h, r), g in part.groupby([h_col, r_col], sort=False):
            pre = f"{h}|{r}|".encode("utf-8")
            tails = pd.unique(g[t_col].to_numpy(object))
            # deterministic 10% test split (md5 % eval_mod == 0)
            is_test = np.fromiter(
                (
                    (int.from_bytes(md5(pre + str(t).encode() + b"|eval").digest()[:7], "big") >> 4)
                    % eval_mod
                    == 0
                    for t in tails
                ),
                dtype=bool,
                count=len(tails),
            )
            if not is_test.any():
                continue
            test_tails = tails[is_test]
            # 52-bit md5 integer per candidate, one bulk digest pass
            # (int path == hex path, see functions/hashing.score01_md5)
            dg = np.frombuffer(
                b"".join([md5(pre + cb).digest()[:8] for cb in node_b]),
                dtype=">u8",
            )
            sc = (dg >> 12).astype(np.int64)
            ti_all = np.searchsorted(nd, tails)
            mask = np.ones(n, dtype=bool)
            mask[ti_all] = False  # filtered: drop ALL true tails
            cand = np.sort(sc[mask])
            st = sc[np.searchsorted(nd, test_tails)]
            rank = 1 + (cand.size - np.searchsorted(cand, st, side="right"))
            out_h.append(np.full(len(test_tails), h, dtype=object))
            out_r.append(np.full(len(test_tails), r, dtype=object))
            out_t.append(test_tails)
            out_rank.append(rank.astype(np.int64))
        if not out_rank:
            return pd.DataFrame(
                {
                    "h_qid": pd.Series([], dtype=object),
                    "prop": pd.Series([], dtype=object),
                    "t_qid": pd.Series([], dtype=object),
                    "t_rank": pd.Series([], dtype=np.int64),
                    "rr": pd.Series([], dtype=np.float64),
                }
            )
        ranks = np.concatenate(out_rank)
        return pd.DataFrame(
            {
                "h_qid": np.concatenate(out_h),
                "prop": np.concatenate(out_r),
                "t_qid": np.concatenate(out_t),
                "t_rank": ranks,
                "rr": 1.0 / ranks,
            }
        )

    return partitioned_map_groups(
        edges, [h_col, r_col], rank_part, num_partitions=num_partitions
    )


def link_eval_summary(
    edges: "ray.data.Dataset",
    **kwargs,
) -> pd.DataFrame:
    """One-row MRR / Hits@k summary over ``link_eval``'s per-triple
    ranks.  Every aggregate is order-independent by construction so the
    row is bit-exact against SQL: hits and rank sums are integers, and
    MRR rides an integer sum of ``floor(1e12 / rank)`` per triple
    (floor of an IEEE division is deterministic; an exact half — the
    round() hazard — cannot occur under floor), divided out as one
    double expression at the end.

    Distribution: per-batch integer partials → constant-size driver
    fold (the sketches contract)."""
    ranks = link_eval(edges, **kwargs)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        r = b["t_rank"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n": [len(r)],
                "hits1": [int((r <= 1).sum())],
                "hits3": [int((r <= 3).sum())],
                "hits10": [int((r <= 10).sum())],
                "sum_rank": [int(r.sum())],
                "mrr_e12": [int(np.floor(1e12 / r).astype(np.int64).sum())],
            }
        )

    parts = ranks.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    mrr_e12 = int(parts["mrr_e12"].sum())
    return pd.DataFrame(
        {
            "n": pd.Series([n], dtype=np.int64),
            "hits1": pd.Series([int(parts["hits1"].sum())], dtype=np.int64),
            "hits3": pd.Series([int(parts["hits3"].sum())], dtype=np.int64),
            "hits10": pd.Series([int(parts["hits10"].sum())], dtype=np.int64),
            "sum_rank": pd.Series([int(parts["sum_rank"].sum())], dtype=np.int64),
            "mrr_e12": pd.Series([mrr_e12], dtype=np.int64),
            "mrr": pd.Series([float(mrr_e12) / n / 1e12], dtype=np.float64),
        }
    )


def random_walks(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    walks_per_node: int = 2,
    walk_len: int = 3,
    num_partitions: int | None = None,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """DeepWalk-style walk corpus (Perozzi et al. 2014) — the
    training-data generator for graph embeddings, made DETERMINISTIC:
    from every node with out-edges, ``walks_per_node`` walks of up to
    ``walk_len`` steps, where the step from ``u`` on walk (start, w)
    at position s picks the sorted-distinct out-neighbor at index
    ``md5(start|w|s|u) mod out_degree(u)`` (the engine's SQL-parity
    hash — the whole corpus is reconstructible in DuckDB). Walks
    reaching a sink node simply end early, like the paper's.

    Distribution: the ranked adjacency (per-src sorted neighbor
    position + degree) is built by ONE exchange on src and stays a
    distributed Dataset — never broadcast. The walker FRONTIER is
    node-bounded (walks_per_node rows per node), so under
    ``broadcast_limit`` walkers it rides the pagerank contract: the
    frontier broadcasts via ``ray.put`` and each step is ONE streaming
    pass over the src-co-located adjacency blocks (measured 7.2 s →
    1.5 s at sf0.1). Above the limit the frontier is itself a Dataset
    and each step is ONE tagged exchange on the current node — walker
    rows ride with that node's adjacency rows and the reducer resolves
    the md5 choice vectorized, so the frontier can outgrow any one
    machine. Both paths are bit-equal (test_walk_paths).

    Output: (start_qid, walk, step, qid) — step 0 is the start node.
    """
    from hashlib import md5

    from kire_ray.stages.shuffle import partitioned_map_groups

    dd = edges.select_columns([src_col, dst_col]).map_batches(
        lambda b: b.drop_duplicates(), batch_format="pandas"
    )

    def rank_adj(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([src_col, dst_col]).sort_values(
            [src_col, dst_col], kind="mergesort"
        )
        grp = g.groupby(src_col, sort=False)
        return pd.DataFrame(
            {
                "node": g[src_col].to_numpy(object),
                "nbr": g[dst_col].to_numpy(object),
                "rn": grp.cumcount().to_numpy(np.int64),
                "deg": grp[dst_col].transform("size").to_numpy(np.int64),
            }
        )

    adj = partitioned_map_groups(
        dd, [src_col], rank_adj, num_partitions=num_partitions
    ).materialize()

    def start_part(b: pd.DataFrame) -> pd.DataFrame:
        starts = b.loc[b["rn"] == 0, "node"].to_numpy(object)
        reps = np.repeat(starts, walks_per_node)
        return pd.DataFrame(
            {
                "start_qid": reps,
                "walk": np.tile(
                    np.arange(1, walks_per_node + 1, dtype=np.int64), len(starts)
                ),
                "cur": reps,
            }
        )

    n_walkers = int(
        adj.map_batches(
            lambda b: pd.DataFrame(
                {"c": [int((b["rn"] == 0).sum()) * walks_per_node]}
            ),
            batch_format="pandas",
        )
        .to_pandas()["c"]
        .sum()
    )
    if n_walkers <= broadcast_limit:
        return _walks_broadcast(
            adj, walks_per_node=walks_per_node, walk_len=walk_len
        )

    walkers = adj.map_batches(start_part, batch_format="pandas").materialize()
    out_frames = [
        walkers.map_batches(
            lambda b: pd.DataFrame(
                {
                    "start_qid": b["start_qid"].to_numpy(object),
                    "walk": b["walk"].to_numpy(np.int64),
                    "step": np.zeros(len(b), dtype=np.int64),
                    "qid": b["cur"].to_numpy(object),
                }
            ),
            batch_format="pandas",
        )
    ]

    for s in range(1, walk_len + 1):

        def w_side(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": b["cur"].to_numpy(object),
                    "nbr": pd.Series([None] * len(b), dtype=object),
                    "rn": np.full(len(b), -1, dtype=np.int64),
                    "deg": np.zeros(len(b), dtype=np.int64),
                    "start_qid": b["start_qid"].to_numpy(object),
                    "walk": b["walk"].to_numpy(np.int64),
                }
            )

        def a_side(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": b["node"].to_numpy(object),
                    "nbr": b["nbr"].to_numpy(object),
                    "rn": b["rn"].to_numpy(np.int64),
                    "deg": b["deg"].to_numpy(np.int64),
                    "start_qid": pd.Series([None] * len(b), dtype=object),
                    "walk": np.zeros(len(b), dtype=np.int64),
                }
            )

        step = s  # bind per-iteration

        def advance(part: pd.DataFrame) -> pd.DataFrame:
            adj_rows = part[part["rn"] >= 0]
            wk = part[part["rn"] < 0]
            if wk.empty or adj_rows.empty:
                return pd.DataFrame(
                    {
                        "start_qid": pd.Series([], dtype=object),
                        "walk": pd.Series([], dtype=np.int64),
                        "cur": pd.Series([], dtype=object),
                    }
                )
            degs = adj_rows.drop_duplicates("node").set_index("node")["deg"]
            d = degs.reindex(wk["node"]).to_numpy()
            ok = ~pd.isna(d)
            wk = wk[ok]
            d = d[ok].astype(np.int64)
            choice = np.fromiter(
                (
                    (
                        int.from_bytes(
                            md5(f"{st}|{w}|{step}|{u}".encode("utf-8")).digest()[:7],
                            "big",
                        )
                        >> 4
                    )
                    % dd_
                    for st, w, u, dd_ in zip(
                        wk["start_qid"], wk["walk"], wk["node"], d
                    )
                ),
                dtype=np.int64,
                count=len(wk),
            )
            m = (
                wk.drop(columns=["nbr", "deg", "rn"])
                .assign(rn=choice)
                .merge(adj_rows[["node", "rn", "nbr"]], on=["node", "rn"])
            )
            return pd.DataFrame(
                {
                    "start_qid": m["start_qid"].to_numpy(object),
                    "walk": m["walk"].to_numpy(np.int64),
                    "cur": m["nbr"].to_numpy(object),
                }
            )

        both = walkers.map_batches(w_side, batch_format="pandas").union(
            adj.map_batches(a_side, batch_format="pandas")
        )
        from kire_ray.stages.shuffle import default_partitions

        walkers = (
            partitioned_map_groups(
                both, ["node"], advance, num_partitions=num_partitions
            )
            # cap blocks per step: map_groups emits one block per
            # (pid, input-block) pair, and the union compounds it —
            # same geometric growth fixed in connected_components
            .repartition(num_partitions or default_partitions())
            .materialize()
        )

        out_frames.append(
            walkers.map_batches(
                lambda b, _s=s: pd.DataFrame(
                    {
                        "start_qid": b["start_qid"].to_numpy(object),
                        "walk": b["walk"].to_numpy(np.int64),
                        "step": np.full(len(b), _s, dtype=np.int64),
                        "qid": b["cur"].to_numpy(object),
                    }
                )
                if "start_qid" in b.columns
                else pd.DataFrame(
                    {
                        "start_qid": pd.Series([], dtype=object),
                        "walk": pd.Series([], dtype=np.int64),
                        "step": pd.Series([], dtype=np.int64),
                        "qid": pd.Series([], dtype=object),
                    }
                ),
                batch_format="pandas",
            )
        )

    out = out_frames[0]
    for f in out_frames[1:]:
        out = out.union(f)
    return out


def _walks_broadcast(
    adj: "ray.data.Dataset", *, walks_per_node: int, walk_len: int
) -> "ray.data.Dataset":
    """random_walks' small-frontier path: the walker table (node ×
    walks_per_node — the pagerank node-bounded contract) lives on the
    driver and broadcasts per step; each step is ONE streaming pass
    over the src-co-located adjacency blocks (each src's ranked rows
    sit in exactly one block, so the md5 choice resolves block-locally)."""
    from hashlib import md5

    starts = (
        adj.map_batches(
            lambda b: b.loc[b["rn"] == 0, ["node"]], batch_format="pandas"
        )
        .to_pandas()["node"]
        .to_numpy(object)
    )
    reps = np.repeat(starts, walks_per_node)
    wk = pd.DataFrame(
        {
            "start_qid": reps,
            "walk": np.tile(
                np.arange(1, walks_per_node + 1, dtype=np.int64), len(starts)
            ),
            "cur": reps,
        }
    )
    frames = [
        pd.DataFrame(
            {
                "start_qid": wk["start_qid"],
                "walk": wk["walk"],
                "step": np.zeros(len(wk), dtype=np.int64),
                "qid": wk["cur"],
            }
        )
    ]
    for s in range(1, walk_len + 1):
        ref = ray.put(wk)

        def step_pass(b: pd.DataFrame, _s=s, _ref=ref) -> pd.DataFrame:
            w = ray.get(_ref)
            m = w.merge(
                b.drop_duplicates("node")[["node", "deg"]],
                left_on="cur",
                right_on="node",
            )
            if m.empty:
                return pd.DataFrame(
                    {
                        "start_qid": pd.Series([], dtype=object),
                        "walk": pd.Series([], dtype=np.int64),
                        "cur": pd.Series([], dtype=object),
                    }
                )
            choice = np.fromiter(
                (
                    (
                        int.from_bytes(
                            md5(f"{st}|{ww}|{_s}|{u}".encode("utf-8")).digest()[:7],
                            "big",
                        )
                        >> 4
                    )
                    % d
                    for st, ww, u, d in zip(
                        m["start_qid"], m["walk"], m["cur"], m["deg"]
                    )
                ),
                dtype=np.int64,
                count=len(m),
            )
            m = (
                m.drop(columns=["deg"])
                .assign(rn=choice)
                .merge(b[["node", "rn", "nbr"]], on=["node", "rn"])
            )
            return pd.DataFrame(
                {
                    "start_qid": m["start_qid"].to_numpy(object),
                    "walk": m["walk"].to_numpy(np.int64),
                    "cur": m["nbr"].to_numpy(object),
                }
            )

        parts = adj.map_batches(step_pass, batch_format="pandas").to_pandas()
        wk = parts if not parts.empty else pd.DataFrame(
            {
                "start_qid": pd.Series([], dtype=object),
                "walk": pd.Series([], dtype=np.int64),
                "cur": pd.Series([], dtype=object),
            }
        )
        frames.append(
            pd.DataFrame(
                {
                    "start_qid": wk["start_qid"],
                    "walk": wk["walk"],
                    "step": np.full(len(wk), s, dtype=np.int64),
                    "qid": wk["cur"],
                }
            )
        )
        if wk.empty:
            break
    return ray.data.from_pandas(pd.concat(frames, ignore_index=True))


def clustering_coefficients(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
) -> "ray.data.Dataset":
    """Per-node local clustering coefficient (Watts–Strogatz):
    2·tri(u) / (deg(u)·(deg(u)−1)) over the undirected simple graph —
    the node-level companion to ``triangle_count``'s global count.

    Shape: same skeleton as ``triangle_count`` (canonical a<b edge
    dedup exchange → wedge explode at the smallest vertex → closure
    semi-join on (b, c)), except each wedge CARRIES its apex, so a
    closed triangle credits all three vertices; per-node triangle
    partials and degree partials then fold through ONE shared qid
    exchange (tagged columns, the join_size_estimate pattern). All
    counts are integers and the coefficient is one float division, so
    the SQL oracle matches bit-exactly at 6 dp."""
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import (
        grouped_agg,
        iteration_blocks,
        partitioned_map_groups,
    )

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(dtype=object)
        t = b[dst_col].to_numpy(dtype=object)
        keep = s != t
        s, t = s[keep], t[keep]
        lo = np.where(s < t, s, t)
        hi = np.where(s < t, t, s)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    ed = iteration_blocks(
        partitioned_map_groups(
            edges.map_batches(canon, batch_format="pandas"),
            ["a", "b"],
            lambda p: p.drop_duplicates(),
        )
    ).materialize()

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        q = np.concatenate(
            [b["a"].to_numpy(dtype=object), b["b"].to_numpy(dtype=object)]
        )
        u, c = np.unique(q, return_counts=True)
        return pd.DataFrame(
            {"qid": u, "deg": c.astype(np.int64), "tri": np.int64(0)}
        )

    def wedges(part: pd.DataFrame) -> pd.DataFrame:
        # array-gathering loop, one frame per partition (see
        # triangle_count.wedges)
        aps, xs, ys = [], [], []
        part = part.sort_values(["a", "b"], kind="mergesort")
        b_all = part["b"].to_numpy(dtype=object)
        for a, idx in part.groupby("a", sort=False).indices.items():
            if len(idx) < 2:
                continue
            nb = b_all[idx]
            i, j = np.triu_indices(len(nb), k=1)
            aps.append(np.full(len(i), a, dtype=object))
            xs.append(nb[i])
            ys.append(nb[j])
        if not xs:
            return pd.DataFrame({"apex": [], "a": [], "b": []}).astype(object)
        return pd.DataFrame(
            {
                "apex": np.concatenate(aps),
                "a": np.concatenate(xs),
                "b": np.concatenate(ys),
            }
        )

    wg = partitioned_map_groups(ed, ["a"], wedges)
    both = wg.map_batches(
        lambda b: b.assign(is_edge=False), batch_format="pandas"
    ).union(
        ed.map_batches(
            lambda b: b.assign(apex="", is_edge=True), batch_format="pandas"
        )
    )

    def close(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "qid": pd.Series([], dtype=object),
                "deg": pd.Series([], dtype=np.int64),
                "tri": pd.Series([], dtype=np.int64),
            }
        )
        if "is_edge" not in part.columns:
            return empty
        e = part[part["is_edge"]][["a", "b"]].drop_duplicates()
        w = part[~part["is_edge"]]
        if e.empty or w.empty:
            return empty
        m = w.merge(e, on=["a", "b"], how="inner")
        q = np.concatenate(
            [
                m["apex"].to_numpy(dtype=object),
                m["a"].to_numpy(dtype=object),
                m["b"].to_numpy(dtype=object),
            ]
        )
        u, c = np.unique(q, return_counts=True)
        return pd.DataFrame(
            {"qid": u, "deg": np.int64(0), "tri": c.astype(np.int64)}
        )

    partials = ed.map_batches(deg_partial, batch_format="pandas").union(
        partitioned_map_groups(both, ["a", "b"], close)
    )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        deg = out["deg"].to_numpy(np.float64)
        tri = out["tri"].to_numpy(np.float64)
        coef = np.zeros(len(out))
        m = deg >= 2
        coef[m] = 2.0 * tri[m] / (deg[m] * (deg[m] - 1.0))
        return pd.DataFrame(
            {
                "qid": out["qid"],
                "degree": out["deg"].astype(np.int64),
                "n_tri": out["tri"].astype(np.int64),
                "coef": round_half_up(coef, 6),
            }
        )

    return grouped_agg(
        partials,
        ["qid"],
        {"deg": ("deg", "sum"), "tri": ("tri", "sum")},
        post=post,
    )


def degree_distribution(
    edges: "ray.data.Dataset", *, src_col: str = "h_qid", dst_col: str = "t_qid"
) -> "ray.data.Dataset":
    """Degree histogram of the KG over DISTINCT directed edges:
    (kind ∈ {in, out}, degree, n_nodes) — the first chart a graph
    publisher draws (hub detection, power-law sanity, join-skew
    planning for the graph algorithms that follow).

    Three bounded exchanges: global edge dedup on the (s, t) pair →
    per-node degree fold (one row per (node, kind, block)) → a
    degree-cardinality histogram exchange. The data-sized work is all
    in combiners."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    def dedup(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"s": b[src_col], "t": b[dst_col]})
        return df.drop_duplicates()

    distinct = partitioned_map_groups(
        edges.map_batches(dedup, batch_format="pandas"),
        ["s", "t"],
        lambda p: p.drop_duplicates(),
    )

    def node_partials(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("s", sort=False).size().rename("d").reset_index()
        inn = b.groupby("t", sort=False).size().rename("d").reset_index()
        return pd.concat(
            [
                pd.DataFrame({"q": out["s"], "kind": "out", "d": out["d"].astype(np.int64)}),
                pd.DataFrame({"q": inn["t"], "kind": "in", "d": inn["d"].astype(np.int64)}),
            ],
            ignore_index=True,
        )

    degrees = grouped_agg(
        distinct.map_batches(node_partials, batch_format="pandas"),
        ["q", "kind"],
        {"d": ("d", "sum")},
    )

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["kind", "d"], sort=False).size().rename("n_nodes").reset_index()
        return g

    return grouped_agg(
        degrees.map_batches(hist, batch_format="pandas"),
        ["kind", "d"],
        {"n_nodes": ("n_nodes", "sum")},
        post=lambda o: pd.DataFrame(
            {"kind": o["kind"], "degree": o["d"].astype(np.int64),
             "n_nodes": o["n_nodes"].astype(np.int64)}
        ),
    )


def betweenness(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    n_pivots: int = 8,
    max_depth: int = 16,
) -> "ray.data.Dataset":
    """Sampled-pivot betweenness centrality over the undirected KG
    graph (Brandes, "A faster algorithm for betweenness centrality",
    J. Math. Sociol. 2001; pivot sampling per Brandes & Pich 2007).
    Pivots are the ``n_pivots`` smallest nodes by md5(qid) —
    deterministic, so the sequential oracle replays the exact sample.

    ALL pivots advance together: the forward phase runs ONE streaming
    pass over the distributed adjacency per BFS level, joining the
    broadcast (pivot, frontier-node, sigma) table and folding
    per-(pivot, node) path-count partials; the backward phase runs one
    pass per level with the broadcast (pivot, successor) map emitting
    Σ (1+delta_w)/sigma_w partials, multiplied by sigma_v and filtered
    to true predecessors (dist_v = dist_w − 1, a BFS-DAG property)
    driver-side. Only (pivots × nodes)-bounded state crosses
    iterations — the pagerank rank-vector contract; the edge table
    itself never leaves the cluster. Float accumulation order differs
    from a sequential run, so the driver row is rows-only and the
    pytest oracle compares at 6dp.

    Returns (qid, betweenness): Σ over pivots of the dependency
    delta(qid), pivot's own row excluded from its term, 6dp."""
    import hashlib

    from kire_ray.stages.shuffle import iteration_blocks

    ed = edges.select_columns([src_col, dst_col])

    def undirected(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat([b[src_col], b[dst_col]], ignore_index=True)
        t = pd.concat([b[dst_col], b[src_col]], ignore_index=True)
        df = pd.DataFrame({"s": s, "t": t})
        return df[df["s"] != df["t"]].drop_duplicates()

    adj = iteration_blocks(
        ed.map_batches(undirected, batch_format="pandas")
    ).materialize()

    # node universe + pivots (node-bounded collect, pagerank contract)
    uni = adj.map_batches(
        lambda b: pd.DataFrame({"q": b["s"].unique()}), batch_format="pandas"
    ).to_pandas()
    nodes = sorted(pd.unique(uni["q"]))
    if not nodes:
        return ray.data.from_pandas(
            pd.DataFrame({"qid": pd.Series([], dtype=object),
                          "betweenness": pd.Series([], dtype=np.float64)})
        )
    pivots = sorted(nodes, key=lambda q: (hashlib.md5(q.encode()).hexdigest(), q))[
        : int(n_pivots)
    ]

    dist: dict = {(p, p): 0 for p in pivots}
    sigma: dict = {(p, p): 1.0 for p in pivots}
    levels: list[pd.DataFrame] = [
        pd.DataFrame({"p": pivots, "s": pivots, "sig": 1.0})
    ]
    # ---- forward: multi-pivot BFS with path counting ----
    for lvl in range(1, max_depth + 1):
        f_ref = ray.put(levels[-1])

        def expand(b: pd.DataFrame, _f=f_ref) -> pd.DataFrame:
            f = ray.get(_f)
            m = b.merge(f, on="s")
            if m.empty:
                return pd.DataFrame(
                    {"p": pd.Series([], dtype=object),
                     "t": pd.Series([], dtype=object),
                     "sig": pd.Series([], dtype=np.float64)}
                )
            return m.groupby(["p", "t"], sort=False)["sig"].sum().reset_index()

        cand = adj.map_batches(expand, batch_format="pandas").to_pandas()
        if cand.empty:
            break
        agg = cand.groupby(["p", "t"], sort=False)["sig"].sum().reset_index()
        rows = []
        for p, t, sg in zip(agg["p"], agg["t"], agg["sig"]):
            if (p, t) in dist:
                continue
            dist[(p, t)] = lvl
            sigma[(p, t)] = sg
            rows.append((p, t, sg))
        if not rows:
            break
        levels.append(pd.DataFrame(rows, columns=["p", "s", "sig"]))

    # ---- backward: dependency accumulation, deepest level first ----
    delta: dict = {k: 0.0 for k in dist}
    for lvl in range(len(levels) - 1, 0, -1):
        w = levels[lvl]
        w_map = pd.DataFrame(
            {
                "p": w["p"],
                "t": w["s"],
                "wpart": (1.0 + np.array([delta[(p, q)] for p, q in zip(w["p"], w["s"])]))
                / w["sig"].to_numpy(np.float64),
            }
        )
        w_ref = ray.put(w_map)

        def back(b: pd.DataFrame, _w=w_ref) -> pd.DataFrame:
            wm = ray.get(_w)
            m = b.merge(wm, on="t")  # edge (s → t) with t at level lvl
            if m.empty:
                return pd.DataFrame(
                    {"p": pd.Series([], dtype=object),
                     "v": pd.Series([], dtype=object),
                     "c": pd.Series([], dtype=np.float64)}
                )
            return (
                m.groupby(["p", "s"], sort=False)["wpart"]
                .sum()
                .rename("c")
                .reset_index()
                .rename(columns={"s": "v"})
            )

        contrib = adj.map_batches(back, batch_format="pandas").to_pandas()
        if contrib.empty:
            continue
        agg = contrib.groupby(["p", "v"], sort=False)["c"].sum().reset_index()
        for p, v, c in zip(agg["p"], agg["v"], agg["c"]):
            if dist.get((p, v)) == lvl - 1:
                delta[(p, v)] += sigma[(p, v)] * c

    bc: dict = {q: 0.0 for q in nodes}
    for (p, q), d in delta.items():
        if q != p:
            bc[q] += d
    from kire_ray.functions.rounding import round_half_up

    out = pd.DataFrame({"qid": list(bc.keys())})
    out["betweenness"] = round_half_up(
        np.array([bc[q] for q in out["qid"]], dtype=np.float64), 6
    )
    return ray.data.from_pandas(out.sort_values("qid").reset_index(drop=True))


def ppr(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    n_seeds: int = 4,
    iters: int = PR_ITERS,
) -> "ray.data.Dataset":
    """Personalized PageRank (Page et al. 1999 §6; the seeded variant
    behind GraphSAGE neighborhoods and related-entity recommendation):
    identical power iteration to ``pagerank`` except the teleport mass
    returns ONLY to the seed set — here the ``n_seeds`` nodes with the
    smallest md5(qid), the engine's deterministic-sample idiom — so
    rank concentrates around the seeds' neighborhoods.

    Same distributed contract as ``pagerank``: per-iteration one
    streaming edge pass with broadcast (nodes, ranks, degrees), driver
    folds node-bounded contributions; dangling mass vanishes (no
    redistribution), mirrored exactly in the unrolled SQL oracle."""
    import hashlib

    from kire_ray.stages.shuffle import grouped_agg, iteration_blocks, partitioned_map_groups

    ed = iteration_blocks(edges.select_columns([src_col, dst_col]))

    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b[src_col], b[dst_col]]).unique()
        return pd.DataFrame({"q": u})

    nodes = (
        partitioned_map_groups(
            ed.map_batches(node_partial, batch_format="pandas"),
            ["q"],
            lambda p: p.drop_duplicates(),
        )
        .to_pandas()["q"]
        .to_numpy(dtype=object)
    )
    nodes = np.sort(nodes)
    n = len(nodes)
    seeds = sorted(nodes, key=lambda q: (hashlib.md5(q.encode()).hexdigest(), q))[
        : int(n_seeds)
    ]
    seed_idx = np.searchsorted(nodes, np.array(sorted(seeds), dtype=object))
    teleport = np.zeros(n, dtype=np.float64)
    teleport[seed_idx] = 0.15 / len(seeds)

    deg_tab = grouped_agg(
        ed.map_batches(
            lambda b: b.groupby(src_col, sort=False).size().rename("d").reset_index(),
            batch_format="pandas",
        ),
        [src_col],
        {"d": ("d", "sum")},
    ).to_pandas()
    deg = np.zeros(n, dtype=np.float64)
    deg[np.searchsorted(nodes, deg_tab[src_col].to_numpy())] = deg_tab["d"].to_numpy(
        np.float64
    )

    ranks = teleport / 0.15  # start as the seed distribution (sums to 1)
    for _ in range(iters):
        ref = ray.put((nodes, ranks, deg))

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            nd, r, d = ray.get(ref)
            si = np.searchsorted(nd, b[src_col].to_numpy())
            w = r[si] / np.maximum(d[si], 1.0)
            keep = r[si] != 0.0
            out = pd.DataFrame({"q": b[dst_col].to_numpy()[keep], "c": w[keep]})
            return out.groupby("q", sort=False).agg(c=("c", "sum")).reset_index()

        ct = (
            ed.map_batches(contrib, batch_format="pandas")
            .to_pandas()
            .groupby("q", sort=False)["c"]
            .sum()
            .reset_index()
        )
        new = teleport.copy()
        di = np.searchsorted(nodes, ct["q"].to_numpy())
        new[di] = new[di] + DAMPING * ct["c"].to_numpy(np.float64)
        ranks = new

    out = pd.DataFrame({"qid": nodes, "rank": round_half_up(pd.Series(ranks), 6)})
    return ray.data.from_pandas(out[out["rank"] > 0.0].reset_index(drop=True))
