"""KG profiling / closure / neighborhood-function operators over the
triple table — the curation-side analytics a KG-construction pipeline
runs between ingest and publish.

``pred_stats`` — per-predicate functionality / inverse functionality
(Suchanek, Abiteboul, Senellart, "PARIS: Probabilistic Alignment of
Relations, Instances, and Schema", VLDB 2012, §4): fun(p) =
|distinct heads| / |triples|, the statistic that decides which
predicates are identity-carrying for alignment and canonicalization.
The reference's KG side table (ATLOP+KIRE/data/gen_kg_data.py .nt3
triples) is exactly the table this profiles.

``reachability`` — bounded-depth multi-source transitive closure with
shortest-distance semantics (semi-naive datalog evaluation: each round
extends only the newest frontier by one edge join, the classic
delta-iteration; distances fold by min). The ontology closure
(subclass-of / part-of chains) every KG publisher materializes.

``hyperball`` — approximate neighborhood function per node (Boldi &
Vigna, "In-Core Computation of Geometric Centralities with HyperBall",
2013; Palmer et al.'s ANF): ball_r(v) is tracked as an HLL register
vector, and one iteration is register-wise max over out-neighbors —
the union of HLL sketches. Registers reuse the engine's md5-derived
60-bit scheme (pipelines/sketches.py), so every estimate is bit-exact
reproducible in SQL (the oracle unrolls the register max-joins).

At 100 TB: every step is a bounded tagged exchange — pred_stats moves
one deduped (prop, kind, key) row per distinct key; reachability moves
the frontier and the (src, dst) seen-check, both closure-bounded;
hyperball moves ≤ m registers per node per round (m = 1024). Nothing
collects to the driver beyond per-round emptiness counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray
import ray.data

from kire_ray.functions.rounding import round_half_up


def pred_stats(
    triples: "ray.data.Dataset",
    *,
    h_col: str = "h_qid",
    prop_col: str = "prop",
    t_col: str = "t_qid",
) -> "ray.data.Dataset":
    """Per-predicate profile: triple count, distinct heads/tails, and
    PARIS functionality = n_heads / n_triples (inverse functionality =
    n_tails / n_triples), rounded half-up to 6 decimals.

    One tagged exchange on (prop, kind, key) carries the deduped
    head/tail keys AND the per-block count partials; because each
    distinct key lands in exactly one partition, per-partition distinct
    counts sum exactly. A second predicate-sized exchange pivots.
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hh = b[[prop_col, h_col]].drop_duplicates()
        tt = b[[prop_col, t_col]].drop_duplicates()
        nn = b.groupby(prop_col, sort=False).size().reset_index(name="w")
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "prop": hh[prop_col].to_numpy(),
                        "kind": "h",
                        "key": hh[h_col].to_numpy(),
                        "w": np.int64(0),
                    }
                ),
                pd.DataFrame(
                    {
                        "prop": tt[prop_col].to_numpy(),
                        "kind": "t",
                        "key": tt[t_col].to_numpy(),
                        "w": np.int64(0),
                    }
                ),
                pd.DataFrame(
                    {
                        "prop": nn[prop_col].to_numpy(),
                        "kind": "n",
                        "key": "",
                        "w": nn["w"].to_numpy(np.int64),
                    }
                ),
            ],
            ignore_index=True,
        )

    def count_part(p: pd.DataFrame) -> pd.DataFrame:
        cnt = (
            p[p["kind"] == "n"]
            .groupby("prop", sort=False)
            .agg(c=("w", "sum"))
            .reset_index()
            .assign(kind="n")
        )
        dk = (
            p[p["kind"] != "n"]
            .drop_duplicates(["prop", "kind", "key"])
            .groupby(["prop", "kind"], sort=False)
            .size()
            .reset_index(name="c")
        )
        out = pd.concat([cnt[["prop", "kind", "c"]], dk], ignore_index=True)
        out["c"] = out["c"].astype(np.int64)
        return out

    partials = partitioned_map_groups(
        triples.map_batches(partial, batch_format="pandas"),
        ["prop", "kind", "key"],
        count_part,
    )

    def pivot(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby(["prop", "kind"], sort=False)["c"].sum().unstack("kind")
        n = g["n"].to_numpy(np.int64)
        nh = g["h"].to_numpy(np.int64)
        nt = g["t"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "prop": g.index.to_numpy(),
                "n_triples": n,
                "n_heads": nh,
                "n_tails": nt,
                "functionality": round_half_up(nh / n, 6),
                "inv_functionality": round_half_up(nt / n, 6),
            }
        )

    return partitioned_map_groups(partials, ["prop"], pivot)


def reachability(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    max_depth: int = 4,
) -> "ray.data.Dataset":
    """Multi-source bounded-depth transitive closure with min-distance
    semantics: (src, dst, dist) for every ordered pair src ≠ dst
    connected by a directed path of length ≤ ``max_depth``; ``dist`` is
    the shortest such length.

    Semi-naive: round r joins only the round-(r-1) frontier with the
    edge table (one tagged exchange on the pivot node), then anti-joins
    the accumulated closure (one exchange on the pair) so each pair is
    discovered exactly once, at its shortest distance. Early-exits on
    an empty frontier.
    """
    from kire_ray.stages.shuffle import iteration_blocks, partitioned_map_groups

    def dedup_edges(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"s": b[src_col], "t": b[dst_col]})
        return df[df["s"] != df["t"]].drop_duplicates()

    ed = iteration_blocks(
        partitioned_map_groups(
            edges.select_columns([src_col, dst_col]).map_batches(
                dedup_edges, batch_format="pandas"
            ),
            ["s", "t"],
            lambda p: p.drop_duplicates(),
        )
    ).materialize()

    def as_paths(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": b["s"], "dst": b["t"], "dist": np.int64(1)})

    seen = ed.map_batches(as_paths, batch_format="pandas").materialize()
    frontier = seen
    out_parts = [seen]

    for r in range(2, max_depth + 1):
        # extend: frontier (src →[dist r-1]→ k) ⋈ edges (k → t) on k
        def tag_frontier(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"k": b["dst"], "other": b["src"], "kind": np.int64(1)}
            )

        def tag_edge(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"k": b["s"], "other": b["t"], "kind": np.int64(0)})

        tagged = frontier.map_batches(tag_frontier, batch_format="pandas").union(
            ed.map_batches(tag_edge, batch_format="pandas")
        )

        def extend(p: pd.DataFrame) -> pd.DataFrame:
            fr = p[p["kind"] == 1][["k", "other"]].rename(columns={"other": "src"})
            eg = p[p["kind"] == 0][["k", "other"]].rename(columns={"other": "dst"})
            if fr.empty or eg.empty:
                return pd.DataFrame(
                    {"src": pd.Series([], dtype=object),
                     "dst": pd.Series([], dtype=object)}
                )
            m = fr.merge(eg, on="k")[["src", "dst"]]
            m = m[m["src"] != m["dst"]]
            return m.drop_duplicates()

        cand = partitioned_map_groups(tagged, ["k"], extend)

        # anti-join the accumulated closure on the pair
        def tag_seen(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"src": b["src"], "dst": b["dst"], "kind": np.int64(0)}
            )

        def tag_cand(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"src": b["src"], "dst": b["dst"], "kind": np.int64(1)}
            )

        pairs = seen.map_batches(tag_seen, batch_format="pandas").union(
            cand.map_batches(tag_cand, batch_format="pandas")
        )

        def fresh(p: pd.DataFrame, _r: int = r) -> pd.DataFrame:
            g = p.groupby(["src", "dst"], sort=False)["kind"].min().reset_index()
            g = g[g["kind"] == 1]
            return pd.DataFrame(
                {
                    "src": g["src"].to_numpy(),
                    "dst": g["dst"].to_numpy(),
                    "dist": np.int64(_r),
                }
            )

        new = iteration_blocks(
            partitioned_map_groups(pairs, ["src", "dst"], fresh)
        ).materialize()
        if new.count() == 0:
            break
        out_parts.append(new)
        seen = seen.union(new).materialize()
        frontier = new

    res = out_parts[0]
    for p in out_parts[1:]:
        res = res.union(p)
    return res


# HyperBall reuses the engine-wide md5 60-bit register scheme
# (pipelines/sketches.py): bucket = top 10 bits, rho = leading-zero
# rank of the low 50 bits.
from kire_ray.pipelines.sketches import HLL_M, _ALPHA, _bit_length_u64, _W_BITS


def _node_regs(qids: np.ndarray) -> pd.DataFrame:
    h = np.fromiter(
        (
            int(hashlib.md5(str(q).encode("utf-8")).hexdigest()[:15], 16)
            for q in qids
        ),
        dtype=np.int64,
        count=len(qids),
    )
    bucket = h >> _W_BITS
    w = h & ((np.int64(1) << _W_BITS) - 1)
    rho = np.where(w == 0, _W_BITS + 1, _W_BITS + 1 - _bit_length_u64(w))
    return pd.DataFrame({"node": qids, "bucket": bucket, "rho": rho})


def _estimate(part: pd.DataFrame, radius: int) -> pd.DataFrame:
    """Per-node HLL estimate from its (sparse) register rows — the
    hll_distinct finalize math, vectorized over many nodes at once.
    Callers must hand ALL of a node's register rows in one frame (an
    exchange keyed on node); rho ≥ 1 always under the md5 scheme, so
    v_zero = m - n_present."""
    if part.empty:
        return pd.DataFrame(
            {
                "qid": pd.Series([], dtype=object),
                "radius": pd.Series([], dtype=np.int64),
                "estimate": pd.Series([], dtype=np.float64),
            }
        )
    g = part.groupby("node", sort=False)
    n_present = g.size()
    s = (
        pd.Series(np.ldexp(1.0, -part["rho"].to_numpy(np.int64)), index=part.index)
        .groupby(part["node"], sort=False)
        .sum()
        + (HLL_M - n_present).astype(np.float64)
    )
    v0 = (HLL_M - n_present).to_numpy(np.int64)
    e = (_ALPHA * float(HLL_M) * float(HLL_M) / s).to_numpy(np.float64)
    small = (e <= 2.5 * HLL_M) & (v0 > 0)
    v0safe = np.where(v0 > 0, v0, 1).astype(np.float64)
    e = np.where(small, HLL_M * np.log(HLL_M / v0safe), e)
    return pd.DataFrame(
        {
            "qid": n_present.index.to_numpy(),
            "radius": np.int64(radius),
            "estimate": round_half_up(e, 6),
        }
    )


def hyperball(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "h_qid",
    dst_col: str = "t_qid",
    radii: int = 3,
) -> "ray.data.Dataset":
    """Approximate out-neighborhood function: (qid, radius, estimate)
    for radius 0..``radii``, where estimate ≈ |{w : dist(v→w) ≤ r}|
    (including v) from an HLL register vector per node.

    One round = one tagged exchange on the edge target (copies each
    node's registers to its in-neighbors' accumulators — i.e.
    ball_r(v) ⊇ ball_{r-1}(w) for each v→w) followed by a grouped
    register-max exchange. Register rows per node are bounded by
    min(ball size, m); the estimate is emitted per round.
    """
    from kire_ray.stages.shuffle import iteration_blocks, partitioned_map_groups

    def dedup_edges(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"v": b[src_col], "w": b[dst_col]})
        return df[df["v"] != df["w"]].drop_duplicates()

    ed = iteration_blocks(
        partitioned_map_groups(
            edges.select_columns([src_col, dst_col]).map_batches(
                dedup_edges, batch_format="pandas"
            ),
            ["v", "w"],
            lambda p: p.drop_duplicates(),
        )
    ).materialize()

    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.concat([b["v"], b["w"]]).unique()})

    nodes = partitioned_map_groups(
        ed.map_batches(node_partial, batch_format="pandas"),
        ["node"],
        lambda p: p.drop_duplicates(),
    )

    regs = iteration_blocks(
        nodes.map_batches(
            lambda b: _node_regs(b["node"].to_numpy(dtype=object)),
            batch_format="pandas",
        )
    ).materialize()

    # r = 0: exactly one register row per node — block-local estimate
    # is exact (no node can straddle blocks with a single row)
    outs = [
        regs.map_batches(
            lambda b: _estimate(b, 0), batch_format="pandas"
        ).materialize()
    ]

    for r in range(1, radii + 1):
        # copy regs(w) to v for each edge v→w: exchange on w
        def tag_regs(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "k": b["node"],
                    "other": "",
                    "bucket": b["bucket"].to_numpy(np.int64),
                    "rho": b["rho"].to_numpy(np.int64),
                    "kind": np.int64(0),
                }
            )

        def tag_edge(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "k": b["w"],
                    "other": b["v"],
                    "bucket": np.int64(0),
                    "rho": np.int64(0),
                    "kind": np.int64(1),
                }
            )

        tagged = regs.map_batches(tag_regs, batch_format="pandas").union(
            ed.map_batches(tag_edge, batch_format="pandas")
        )

        def copy_to_sources(p: pd.DataFrame) -> pd.DataFrame:
            rg = p[p["kind"] == 0][["k", "bucket", "rho"]]
            eg = p[p["kind"] == 1][["k", "other"]]
            if rg.empty or eg.empty:
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype=object),
                        "bucket": pd.Series([], dtype=np.int64),
                        "rho": pd.Series([], dtype=np.int64),
                    }
                )
            m = eg.merge(rg, on="k")
            # block-local register-max combiner before the grouped max
            m = (
                m.groupby(["other", "bucket"], sort=False)["rho"]
                .max()
                .reset_index()
                .rename(columns={"other": "node"})
            )
            return m[["node", "bucket", "rho"]]

        shipped = partitioned_map_groups(tagged, ["k"], copy_to_sources)

        # register-max combine keyed on node alone, so the following
        # estimate exchange sees whole nodes
        def combine(p: pd.DataFrame) -> pd.DataFrame:
            out = (
                p.groupby(["node", "bucket"], sort=False)["rho"]
                .max()
                .reset_index()
            )
            out["rho"] = out["rho"].astype(np.int64)
            return out

        regs = iteration_blocks(
            partitioned_map_groups(regs.union(shipped), ["node"], combine)
        ).materialize()

        outs.append(
            partitioned_map_groups(
                regs, ["node"], lambda p, _r=r: _estimate(p, _r)
            ).materialize()
        )

    res = outs[0]
    for p in outs[1:]:
        res = res.union(p)
    return res


def meta_paths(
    triples: "ray.data.Dataset",
    *,
    h_col: str = "h_qid",
    prop_col: str = "prop",
    t_col: str = "t_qid",
) -> "ray.data.Dataset":
    """PRA-style 2-hop meta-path mining (Lao & Cohen, "Relational
    retrieval using a combination of path-constrained random walks",
    Machine Learning 2010): for every relation composition (r1, r2),
    the number of 2-hop path instances, the number of DISTINCT
    endpoint pairs, and how many of those pairs are also directly
    linked by any edge — support = n_closed / n_pairs, the signal that
    ranks compositions as link-prediction features and candidate
    inference rules (r1·r2 ⇒ r3).

    Distributed shape (no driver collect): SHUFFLE #1 on the middle
    node co-locates each node's in- and out-edges (tagged union) and a
    per-partition merge emits (r1, r2, a, c) path groups; SHUFFLE #2 on
    the endpoint pair (a, c) co-locates path rows with the direct-edge
    tag, dedups pairs globally, and folds per-composition partials;
    a final relation²-bounded exchange sums. Exchange volume is
    bounded by the path count (the Σ in(b)·out(b) the operator
    measures), never by a driver-sized structure."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    def tag_mid(b: pd.DataFrame) -> pd.DataFrame:
        e = b[[h_col, prop_col, t_col]].drop_duplicates()
        return pd.concat(
            [
                pd.DataFrame(
                    {"mid": e[t_col].to_numpy(), "kind": "in",
                     "r": e[prop_col].to_numpy(), "o": e[h_col].to_numpy()}
                ),
                pd.DataFrame(
                    {"mid": e[h_col].to_numpy(), "kind": "out",
                     "r": e[prop_col].to_numpy(), "o": e[t_col].to_numpy()}
                ),
            ],
            ignore_index=True,
        )

    def join_mid(p: pd.DataFrame) -> pd.DataFrame:
        p = p.drop_duplicates()  # fold cross-block duplicate edges
        i = p[p["kind"] == "in"].rename(columns={"r": "r1", "o": "a"})
        o = p[p["kind"] == "out"].rename(columns={"r": "r2", "o": "c"})
        m = i.merge(o, on="mid")[["r1", "r2", "a", "c"]]
        if m.empty:
            return pd.DataFrame(
                {"r1": pd.Series([], dtype=object), "r2": pd.Series([], dtype=object),
                 "a": pd.Series([], dtype=object), "c": pd.Series([], dtype=object),
                 "n_paths": pd.Series([], dtype=np.int64)}
            )
        return (
            m.groupby(["r1", "r2", "a", "c"], sort=False)
            .size()
            .rename("n_paths")
            .reset_index()
        )

    paths = partitioned_map_groups(
        triples.map_batches(tag_mid, batch_format="pandas"), ["mid"], join_mid
    )

    def tag_pair(b: pd.DataFrame) -> pd.DataFrame:
        e = b[[h_col, t_col]].drop_duplicates()
        return pd.DataFrame(
            {"r1": "", "r2": "",
             "a": e[h_col].to_numpy(), "c": e[t_col].to_numpy(),
             "n_paths": np.int64(0), "direct": np.int64(1)}
        )

    def add_tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["direct"] = np.int64(0)
        return b

    tagged = paths.map_batches(add_tag, batch_format="pandas").union(
        triples.map_batches(tag_pair, batch_format="pandas")
    )

    def fold_pair(p: pd.DataFrame) -> pd.DataFrame:
        direct = p[p["direct"] == 1][["a", "c"]].drop_duplicates()
        direct = set(zip(direct["a"], direct["c"]))
        pp = p[p["direct"] == 0]
        if pp.empty:
            return pd.DataFrame(
                {"r1": pd.Series([], dtype=object), "r2": pd.Series([], dtype=object),
                 "n_paths": pd.Series([], dtype=np.int64),
                 "n_pairs": pd.Series([], dtype=np.int64),
                 "n_closed": pd.Series([], dtype=np.int64)}
            )
        # (r1, r2, a, c) is NOT unique here — the same composition and
        # endpoints via different middle nodes arrive from different
        # shuffle-#1 partitions; this sum is the required fold (do not
        # "optimize" it away)
        pp = pp.groupby(["r1", "r2", "a", "c"], sort=False)["n_paths"].sum().reset_index()
        closed = np.fromiter(
            ((a, c) in direct for a, c in zip(pp["a"], pp["c"])),
            dtype=np.int64, count=len(pp),
        )
        pp = pp.assign(n_pairs=np.int64(1), n_closed=closed)
        return (
            pp.groupby(["r1", "r2"], sort=False)
            .agg(n_paths=("n_paths", "sum"), n_pairs=("n_pairs", "sum"),
                 n_closed=("n_closed", "sum"))
            .reset_index()
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out = out.astype({"n_paths": np.int64, "n_pairs": np.int64, "n_closed": np.int64})
        out["support"] = round_half_up(
            out["n_closed"].to_numpy(np.float64) / out["n_pairs"].to_numpy(np.float64), 6
        )
        return out

    return grouped_agg(
        partitioned_map_groups(tagged, ["a", "c"], fold_pair),
        ["r1", "r2"],
        {"n_paths": ("n_paths", "sum"), "n_pairs": ("n_pairs", "sum"),
         "n_closed": ("n_closed", "sum")},
        post=post,
    )


def edge_lifespan(
    triples: "ray.data.Dataset",
    transcripts: "ray.data.Dataset",
    *,
    broadcast_limit: int = 0,
) -> "ray.data.Dataset":
    """Temporal validity of every constructed KG edge: for each
    (subj, pred, obj), the number of supporting conversations and the
    epoch-µs timestamps of the earliest and latest supporting
    conversation's start — the edge-lifespan table a temporal-KG
    publisher materializes next to the edges (when did this fact first
    appear, is it still being asserted).

    Shape: the conv-start lookup is conversation-bounded. When the
    CALLER knows the conv count is under its broadcast threshold (it
    holds the parquet metadata; this function only sees Datasets) it
    passes ``broadcast_limit`` > 0 and the lookup folds from
    block-combined (conv, min) partials into a ``ray.put`` map
    attached vectorized inside the triples scan — ONE edge-keyed
    exchange total, with ``len(starts) <= broadcast_limit`` re-checked
    as a guard. Default (0) is the scale path: a tagged exchange on
    the conversation id co-locates the per-doc distinct (s, p, o)
    rows with that conversation's start time, then the edge-keyed
    exchange folds (sum, min, max) — both paths bit-equal
    (test_edge_lifespan_paths_equal)."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    def t_part(b: pd.DataFrame) -> pd.DataFrame:
        e = b[["doc_id", "subj_qid", "pred", "obj_qid"]].drop_duplicates()
        return pd.DataFrame(
            {"key": e["doc_id"].to_numpy(), "kind": np.int64(0),
             "subj_qid": e["subj_qid"].to_numpy(), "pred": e["pred"].to_numpy(),
             "obj_qid": e["obj_qid"].to_numpy(), "tus": np.int64(0)}
        )

    def c_part(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {"conv_id": b["conv_id"],
                 "tus": b["ts"].to_numpy("datetime64[us]").astype(np.int64)}
            )
            .groupby("conv_id", sort=False)["tus"]
            .min()
            .reset_index()
        )
        return pd.DataFrame(
            {"key": g["conv_id"].to_numpy(), "kind": np.int64(1),
             "subj_qid": "", "pred": "", "obj_qid": "",
             "tus": g["tus"].to_numpy(np.int64)}
        )

    if broadcast_limit:
        starts_df = (
            transcripts.map_batches(c_part, batch_format="pandas")
            .to_pandas()
            .groupby("key")["tus"]
            .min()
        )
        if len(starts_df) <= broadcast_limit:
            sref = ray.put(starts_df.to_dict())

            def attach(b: pd.DataFrame) -> pd.DataFrame:
                # block-local dedup is only a COMBINER here: two entity
                # clusters sharing a QID make the same (doc, s, p, o)
                # appear twice in one doc's scorer output, and dynamic
                # block splitting can put the copies in different
                # blocks — so n_docs must NOT be counted per block
                # (ADVICE r4: it double-counted). The global per-doc
                # dedup happens in the edge-keyed fold below, where all
                # rows of one (s, p, o) are co-located.
                sm = ray.get(sref)
                e = b[["doc_id", "subj_qid", "pred", "obj_qid"]].drop_duplicates()
                if e.empty:
                    return pd.DataFrame(
                        {"doc_id": pd.Series([], dtype=object),
                         "subj_qid": pd.Series([], dtype=object),
                         "pred": pd.Series([], dtype=object),
                         "obj_qid": pd.Series([], dtype=object),
                         "tus": pd.Series([], dtype=np.int64)}
                    )
                return e.assign(tus=e["doc_id"].map(sm).astype(np.int64))

            def fold_edges(part: pd.DataFrame) -> pd.DataFrame:
                e = part.drop_duplicates(
                    ["doc_id", "subj_qid", "pred", "obj_qid"]
                )
                return (
                    e.groupby(["subj_qid", "pred", "obj_qid"], sort=False)
                    .agg(n_docs=("doc_id", "size"), first_us=("tus", "min"),
                         last_us=("tus", "max"))
                    .reset_index()
                    .astype({"n_docs": np.int64, "first_us": np.int64,
                             "last_us": np.int64})
                )

            # still ONE exchange (edge-keyed) — the conv-id exchange the
            # fast path exists to eliminate stays eliminated
            return partitioned_map_groups(
                triples.map_batches(attach, batch_format="pandas"),
                ["subj_qid", "pred", "obj_qid"],
                fold_edges,
            )

    tagged = triples.map_batches(t_part, batch_format="pandas").union(
        transcripts.map_batches(c_part, batch_format="pandas")
    )

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        starts = (
            p[p["kind"] == 1].groupby("key", sort=False)["tus"].min()
        )
        e = p[p["kind"] == 0][["key", "subj_qid", "pred", "obj_qid"]].drop_duplicates()
        if e.empty:
            return pd.DataFrame(
                {"subj_qid": pd.Series([], dtype=object),
                 "pred": pd.Series([], dtype=object),
                 "obj_qid": pd.Series([], dtype=object),
                 "n_docs": pd.Series([], dtype=np.int64),
                 "first_us": pd.Series([], dtype=np.int64),
                 "last_us": pd.Series([], dtype=np.int64)}
            )
        e = e.assign(tus=starts.reindex(e["key"]).to_numpy(np.int64))
        return (
            e.groupby(["subj_qid", "pred", "obj_qid"], sort=False)
            .agg(n_docs=("key", "size"), first_us=("tus", "min"), last_us=("tus", "max"))
            .reset_index()
        )

    return grouped_agg(
        partitioned_map_groups(tagged, ["key"], fold),
        ["subj_qid", "pred", "obj_qid"],
        {"n_docs": ("n_docs", "sum"), "first_us": ("first_us", "min"),
         "last_us": ("last_us", "max")},
        post=lambda out: out.astype(
            {"n_docs": np.int64, "first_us": np.int64, "last_us": np.int64}
        ),
    )


def schema_profile(
    triples: "ray.data.Dataset",
    attrs: "ray.data.Dataset",
    *,
    h_col: str = "h_qid",
    prop_col: str = "prop",
    t_col: str = "t_qid",
) -> "ray.data.Dataset":
    """Relation type-signature mining (ontology induction's first
    table): for every (pred, head instance-of, tail instance-of)
    combination, the triple count — which type pairs each relation
    actually connects. A qid's type is its lexicographically smallest
    'instance of' attribute value ('' when untyped) so the choice is
    deterministic on both compare sides.

    Shape: the instance-of map is entity-bounded (a dimension table) —
    broadcast once (``ray.put``), looked up vectorized per block; one
    signature-cardinality grouped exchange folds the counts. The
    triple table streams; nothing else moves."""
    from kire_ray.stages.shuffle import grouped_agg

    io = (
        attrs.map_batches(
            lambda b: b[b["attr_key"] == "instance of"][["qid", "attr_val"]],
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("qid")["attr_val"]
        .min()
    )
    io_ref = ray.put(io.to_dict())

    def partial(b: pd.DataFrame, _r=io_ref) -> pd.DataFrame:
        ty = ray.get(_r)
        h_type = b[h_col].map(ty).fillna("")
        t_type = b[t_col].map(ty).fillna("")
        return (
            pd.DataFrame({"pred": b[prop_col], "h_type": h_type, "t_type": t_type})
            .groupby(["pred", "h_type", "t_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    return grouped_agg(
        triples.map_batches(partial, batch_format="pandas"),
        ["pred", "h_type", "t_type"],
        {"n": ("n", "sum")},
        post=lambda o: o.astype({"n": np.int64}),
    )
