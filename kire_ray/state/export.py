"""Id-mapped KG export — the reference's downstream-tool file layout.

Re-expresses the export block of
/root/reference/ATLOP+KIRE/data/gen_kg_data.py:328-355: five files —
``one_hop_relation_triplets.nt3`` (``h\\tr\\tt``),
``one_hop_relation_triplets_ids.nt3`` (``hid\\trid\\ttid``),
``one_hop_entity2id.txt``, ``one_hop_relation2id.txt``,
``one_hop_entity2label.txt`` — with dense integer ids assigned
first-seen over the triple stream.

The reference's stream order is its in-memory list order
(partition-order-dependent); this engine feeds the SAME first-seen
assignment a deterministically *sorted* triple stream, so ids are
reproducible under any distributed execution (SURVEY.md §4(f)) while
keeping the reference's assignment algorithm and file layout byte-level
compatible.

Scale note: distinct entities/relations are KG-dimension-sized (≪
corpus — the same bound as the alias/vocab broadcasts), so the id maps
assemble on the driver after a distributed distinct; the triple files
themselves are written from the sorted Dataset. If the edge set itself
outgrew a single text file, the parquet tables written alongside
(``edges_ids.parquet``) are the sharded scale path.
"""

from __future__ import annotations

import os

import pandas as pd

import ray.data


def export_id_mapped_kg(
    edges: "ray.data.Dataset",
    out_dir: str,
    *,
    labels: dict[str, str] | None = None,
    prefix: str = "one_hop_",
) -> dict[str, int]:
    """Edges Dataset (subj_qid, pred, obj_qid, …) → reference-layout
    export. Returns {"n_entities": …, "n_relations": …, "n_triples": …}.
    """
    from kire_ray.stages.shuffle import grouped_agg

    os.makedirs(out_dir, exist_ok=True)
    triples = (
        grouped_agg(
            edges.map_batches(
                lambda b: b[["subj_qid", "pred", "obj_qid"]].drop_duplicates(),
                batch_format="pandas",
            ),
            ["subj_qid", "pred", "obj_qid"],
            {"n": ("pred", "size")},
        )
        .to_pandas()[["subj_qid", "pred", "obj_qid"]]
        .sort_values(["subj_qid", "pred", "obj_qid"], kind="stable")
        .reset_index(drop=True)
    )

    # first-seen dense ids over the sorted stream (gen_kg_data.py:334-347)
    entity_id: dict[str, int] = {}
    relation_id: dict[str, int] = {}
    ent_lines, rel_lines, id_lines, tr_lines = [], [], [], []
    for h, r, t in triples.itertuples(index=False):
        tr_lines.append(f"{h}\t{r}\t{t}")
        for e in (h, t):
            if e not in entity_id:
                entity_id[e] = len(entity_id)
                ent_lines.append(f"{e}\t{entity_id[e]}")
        if r not in relation_id:
            relation_id[r] = len(relation_id)
            rel_lines.append(f"{r}\t{relation_id[r]}")
        id_lines.append(f"{entity_id[h]}\t{relation_id[r]}\t{entity_id[t]}")

    def write(name: str, lines: list[str]) -> None:
        with open(os.path.join(out_dir, name), "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))

    write(f"{prefix}relation_triplets.nt3", tr_lines)
    write(f"{prefix}relation_triplets_ids.nt3", id_lines)
    write(f"{prefix}entity2id.txt", ent_lines)
    write(f"{prefix}relation2id.txt", rel_lines)
    write(
        f"{prefix}entity2label.txt",
        [f"{e}\t{(labels or {}).get(e, e)}" for e in entity_id],
    )
    # sharded scale path alongside the text layout
    ids = triples.assign(
        h_id=triples["subj_qid"].map(entity_id),
        r_id=triples["pred"].map(relation_id),
        t_id=triples["obj_qid"].map(entity_id),
    )
    ids.to_parquet(os.path.join(out_dir, "edges_ids.parquet"), index=False)
    return {
        "n_entities": len(entity_id),
        "n_relations": len(relation_id),
        "n_triples": len(triples),
    }


def load_id_maps(out_dir: str, prefix: str = "one_hop_") -> tuple[dict, dict]:
    """Read entity2id / relation2id back (reader side of the layout)."""

    def read(name: str) -> dict[str, int]:
        out: dict[str, int] = {}
        with open(os.path.join(out_dir, name), encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    k, v = line.rstrip("\n").split("\t")
                    out[k] = int(v)
        return out

    return read(f"{prefix}entity2id.txt"), read(f"{prefix}relation2id.txt")
