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
    edges: "ray.data.Dataset", max_iters: int = 12
) -> "ray.data.Dataset":
    """Distributed connected components by min-label propagation.

    ``edges``: Dataset with string columns ``src``, ``dst`` (undirected
    interpretation). Returns Dataset ``(node, label)`` where ``label`` is
    the component's lexicographically-smallest node id.

    Each iteration: candidate labels = own label ∪ labels flowing along
    edges; ``groupby(node).min(label)``. Converges in O(diameter)
    rounds; ``max_iters`` bounds pathological chains (a chain longer
    than 2^max_iters would need pointer-doubling — equivalence cliques
    in KG/dedup workloads are shallow).
    """

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([b["src"].to_numpy(), b["dst"].to_numpy()]),
                "peer": np.concatenate([b["dst"].to_numpy(), b["src"].to_numpy()]),
            }
        )

    sym = edges.map_batches(both_dirs, batch_format="pandas")
    # labels: node → current best label; start with label = node
    labels = sym.groupby("node").map_groups(
        lambda g: pd.DataFrame({"node": [g["node"].iloc[0]], "label": [g["node"].iloc[0]]}),
        batch_format="pandas",
    ).materialize()

    for _ in range(max_iters):
        lab_map_rows = labels.take_all()  # bounded: one row per distinct node
        lab_map = {r["node"]: r["label"] for r in lab_map_rows}
        lab_ref = ray.put(lab_map)

        def relabel(b: pd.DataFrame, ref=lab_ref) -> pd.DataFrame:
            m = ray.get(ref)
            return pd.DataFrame(
                {
                    "node": b["node"],
                    "label": b["peer"].map(lambda p: m.get(p, p)),
                }
            )

        msgs = sym.map_batches(relabel, batch_format="pandas")
        new_labels = (
            labels.union(msgs)
            .groupby("node")
            .map_groups(
                lambda g: pd.DataFrame(
                    {"node": [g["node"].iloc[0]], "label": [g["label"].min()]}
                ),
                batch_format="pandas",
            )
            .materialize()
        )
        new_map = {r["node"]: r["label"] for r in new_labels.take_all()}
        labels = new_labels
        if new_map == lab_map:
            break
    return labels


def eq_pairs_from_kg(kg_triples_path: str, eq_prop: str = "P_eq") -> list[tuple[str, str]]:
    """Scan the KG triple store for equivalence edges (column-pruned,
    predicate-pushdown read — only the P_eq rows leave storage)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(kg_triples_path)
    t = dset.to_table(columns=["h_qid", "t_qid"], filter=pads.field("prop") == eq_prop)
    return list(zip(t.column("h_qid").to_pylist(), t.column("t_qid").to_pylist()))
