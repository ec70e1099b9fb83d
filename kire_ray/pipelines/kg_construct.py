"""The flagship DAG: transcripts → knowledge graph (nodes + edges).

    read_parquet(transcripts)                 # prune to needed columns
      └ map_batches(combine segments)         # shuffle combiner
      └ groupby(conv_id).map_groups(merge)    # SHUFFLE #1: document assembly
      └ map_batches(MentionLinker, actors)    # detect + cluster + link + vote
      ├ map_batches(RelationScorer, actors)   # KG evidence + adaptive threshold
      │   └ dedup_edges (groupby s,p,o)       # SHUFFLE #2 → edges
      ├ map_batches(EntityEmbedder, actors)
      │   └ merge_nodes (groupby qid)         # SHUFFLE #3 (small rows) → nodes
      └ map_batches(CorefScorer, actors)      # coref pair table (side output)

Side inputs (alias table, KG triples/attrs, P_eq closure) are dimension
tables: loaded once on the driver, ``ray.put`` once, indexed once per
actor.  Resumability: ``run_resumable`` partitions the input by
``hash(conv_id) % n_parts`` and runs the DAG per partition-chunk with
an atomic output directory + manifest per chunk; a rerun skips finished
chunks (state/manifest.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import ray
import ray.data

from kire_ray.stages.assemble import assemble_documents
from kire_ray.stages.canonicalize import canon_map_from_pairs, eq_pairs_from_kg
from kire_ray.stages.coref import CorefScorer
from kire_ray.stages.linking import MentionLinker, load_alias_broadcast
from kire_ray.stages.materialize import dedup_edges, merge_nodes
from kire_ray.stages.scorer import EntityEmbedder, RelationScorer, load_kg_broadcast

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "ts"]


@dataclass
class KGContext:
    """Broadcast handles shared by every stage of one pipeline run."""

    alias_ref: object
    kg_ref: object
    canon_ref: object
    canon: dict

    @classmethod
    def from_corpus(cls, corpus_dir: str) -> "KGContext":
        alias = load_alias_broadcast(
            os.path.join(corpus_dir, "kg_alias.parquet"),
            os.path.join(corpus_dir, "lexicon.parquet"),
        )
        kg = load_kg_broadcast(
            os.path.join(corpus_dir, "kg_triples.parquet"),
            os.path.join(corpus_dir, "kg_attrs.parquet"),
        )
        canon = canon_map_from_pairs(
            eq_pairs_from_kg(os.path.join(corpus_dir, "kg_triples.parquet"))
        )
        return cls(
            alias_ref=ray.put(alias),
            kg_ref=ray.put(kg),
            canon_ref=ray.put(canon),
            canon=canon,
        )


def read_transcripts(corpus_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(corpus_dir, "transcripts.parquet"), columns=TRANSCRIPT_COLS
    )


def linked_documents(
    transcripts: "ray.data.Dataset",
    ctx: KGContext,
    *,
    concurrency: int | None = None,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    docs = assemble_documents(transcripts)
    return docs.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"alias_ref": ctx.alias_ref, "canon_ref": ctx.canon_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency or 4),
    )


def extract_triples(
    linked: "ray.data.Dataset", ctx: KGContext, *, concurrency: int | None = None
) -> "ray.data.Dataset":
    return linked.map_batches(
        RelationScorer,
        fn_constructor_kwargs={"kg_ref": ctx.kg_ref, "canon_ref": ctx.canon_ref},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, concurrency or 4),
    )


def entity_vectors(
    linked: "ray.data.Dataset", ctx: KGContext, *, concurrency: int | None = None
) -> "ray.data.Dataset":
    return linked.map_batches(
        EntityEmbedder,
        fn_constructor_kwargs={"kg_ref": ctx.kg_ref, "canon_ref": ctx.canon_ref},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, concurrency or 4),
    )


def coref_pairs(
    linked: "ray.data.Dataset", ctx: KGContext, *, concurrency: int | None = None
) -> "ray.data.Dataset":
    return linked.map_batches(
        CorefScorer,
        fn_constructor_kwargs={"kg_ref": ctx.kg_ref, "canon_ref": ctx.canon_ref},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, concurrency or 4),
    )


def build_graph(
    corpus_dir: str, *, concurrency: int | None = None
) -> dict[str, "ray.data.Dataset"]:
    """Lazy end-to-end build; caller consumes (write/collect) to run."""
    ctx = KGContext.from_corpus(corpus_dir)
    linked = linked_documents(read_transcripts(corpus_dir), ctx, concurrency=concurrency)
    triples = extract_triples(linked, ctx, concurrency=concurrency)
    edges = dedup_edges(triples)
    nodes = merge_nodes(entity_vectors(linked, ctx, concurrency=concurrency))
    return {"linked": linked, "triples": triples, "edges": edges, "nodes": nodes, "_ctx": ctx}
