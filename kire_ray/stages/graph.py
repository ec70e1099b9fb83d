"""Per-document typed graph construction (GLRE's node/adjacency model).

Re-expresses GLRE's document graph
(/root/reference/GLRE+KIRE/data/dataset.py:40-73 node table,
:127-200 5-channel RGCN adjacency): three node types — entity (E),
mention (M), sentence (S) — and five edge channels:

  MM: mentions co-occurring in the same sentence/turn
  MS: mention ↔ its sentence
  ME: mention ↔ its entity cluster
  ES: entity ↔ every sentence containing one of its mentions
  SS: consecutive sentences (the sentence chain)

The reference materializes a dense (5, N, N) adjacency per doc; here
each doc row carries ragged edge lists (src, dst, channel) — the
consumer builds whatever rectangle it needs batch-locally.  Node ids
are doc-local: entities first (by ent_idx), then mentions (document
order), then sentences (turn order) — the reference's insertion-order
convention made explicit.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

NODE_E, NODE_M, NODE_S = 0, 1, 2
CH_MM, CH_MS, CH_ME, CH_ES, CH_SS = 0, 1, 2, 3, 4

GRAPH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_nodes", pa.int32()),
        ("node_types", pa.list_(pa.int32())),
        ("node_refs", pa.list_(pa.int32())),  # ent_idx | mention ordinal | turn_idx
        ("edge_src", pa.list_(pa.int32())),
        ("edge_dst", pa.list_(pa.int32())),
        ("edge_channel", pa.list_(pa.int32())),
    ]
)


def _doc_graph(doc_id, n_turns, ents, ments):
    n_e = len(ents)
    n_m = len(ments)
    node_types = [NODE_E] * n_e + [NODE_M] * n_m + [NODE_S] * n_turns
    node_refs = (
        [e["ent_idx"] for e in ents]
        + list(range(n_m))
        + list(range(n_turns))
    )
    ent_node = {e["ent_idx"]: i for i, e in enumerate(ents)}
    sent_node = lambda t: n_e + n_m + t  # noqa: E731

    src, dst, ch = [], [], []

    def add(a, b, c):
        # undirected: both directions, like the reference's symmetric
        # adjacency (dataset.py:137-199)
        src.extend((a, b))
        dst.extend((b, a))
        ch.extend((c, c))

    by_turn: dict[int, list[int]] = {}
    ent_turns: dict[int, set[int]] = {}
    for mi, m in enumerate(ments):
        m_node = n_e + mi
        add(m_node, sent_node(m["turn_idx"]), CH_MS)
        if m["ent_idx"] in ent_node:
            add(m_node, ent_node[m["ent_idx"]], CH_ME)
            ent_turns.setdefault(m["ent_idx"], set()).add(m["turn_idx"])
        by_turn.setdefault(m["turn_idx"], []).append(m_node)
    for nodes in by_turn.values():
        for i in range(len(nodes)):
            for j in range(i + 1, len(nodes)):
                add(nodes[i], nodes[j], CH_MM)
    for ent_idx, turns in sorted(ent_turns.items()):
        for t in sorted(turns):
            add(ent_node[ent_idx], sent_node(t), CH_ES)
    for t in range(n_turns - 1):
        add(sent_node(t), sent_node(t + 1), CH_SS)

    return {
        "doc_id": doc_id,
        "n_nodes": len(node_types),
        "node_types": node_types,
        "node_refs": node_refs,
        "edge_src": src,
        "edge_dst": dst,
        "edge_channel": ch,
    }


def build_doc_graphs(linked: "ray.data.Dataset") -> "ray.data.Dataset":
    """Linked documents → one typed-graph row per document (stateless
    map_batches; purely doc-local, no shuffle)."""

    def to_graphs(batch: pa.Table) -> pa.Table:
        rows = [
            _doc_graph(d, n, e, m)
            for d, n, e, m in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("n_turns").to_pylist(),
                batch.column("entities").to_pylist(),
                batch.column("mentions").to_pylist(),
            )
        ]
        return pa.Table.from_pylist(rows, schema=GRAPH_SCHEMA)

    return linked.map_batches(to_graphs, batch_format="pyarrow")


def explode_edges(graphs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Graph rows → one row per directed edge (doc_id, src, dst,
    channel) — the SQL-comparable flat projection of the ragged
    adjacency (both directions present, exactly as ``_doc_graph``
    emits them). Zero-copy Arrow flatten: list_parent_indices +
    take, no Python loop."""
    import pyarrow.compute as pc

    def fl(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        src = b.column("edge_src")
        dst = b.column("edge_dst")
        ch = b.column("edge_channel")
        parent = pc.list_parent_indices(src)
        return pa.table(
            {
                "doc_id": pc.take(b.column("doc_id"), parent),
                "src": pc.list_flatten(src),
                "dst": pc.list_flatten(dst),
                "channel": pc.list_flatten(ch),
            }
        )

    return graphs.map_batches(fl, batch_format="pyarrow")
