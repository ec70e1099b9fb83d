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
    from kire_ray.stages.shuffle import grouped_agg

    ed = edges.select_columns([src_col, dst_col]).materialize()

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

        ct = grouped_agg(
            ed.map_batches(contrib, batch_format="pandas"),
            ["q"],
            {"c": ("c", "sum")},
        ).to_pandas()
        new = np.full(n, base, dtype=np.float64)
        di = np.searchsorted(nodes, ct["q"].to_numpy())
        new[di] = base + DAMPING * ct["c"].to_numpy(np.float64)
        ranks = new

    return ray.data.from_pandas(
        pd.DataFrame({"qid": nodes, "rank": round_half_up(pd.Series(ranks), 6)})
    )
