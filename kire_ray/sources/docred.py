"""DocRED-style JSON source — the reference's primary input format.

A reference user's data is JSON documents ``{title, sents: [[word,..],..],
vertexSet: [[{name, sent_id, pos:[s,e), type, (link)}..]..],
labels: [{h,t,r,evidence}]}`` (ATLOP+KIRE/prepro.py:30-44,
SSAN+KIRE/dataset.py:406-417). This module reads that format straight
into the engine's *linked-document* schema, so every downstream stage —
RelationScorer, EntityEmbedder, CorefScorer, materialize — runs
unchanged on DocRED input:

- sentence ↔ turn (``sent_id`` ↔ ``turn_idx``), words joined by spaces;
- vertexSet clusters are taken as given (the pre-annotated counterpart
  of the transcript pipeline's detect+cluster stage);
- the canonical QID per vertex follows the reference's rule
  (gen_kg_data.py:272-304): doc-provided ``link`` wins per mention,
  else alias lookup of the normalized name; majority vote with
  first-seen tie-break; hash-based NT id when nothing links.

Small files (a JSON array, as the reference ships) are loaded on the
driver and distributed with ``from_items``; NDJSON shards stream
through ``ray.data.read_json`` for scale.
"""

from __future__ import annotations

import json
from collections import Counter

import pyarrow as pa

import ray
import ray.data

from kire_ray.functions.hashing import nt_id
from kire_ray.functions.textnorm import normalize_label
from kire_ray.stages.linking import ENTITY_T, MENTION_T

DOC_COLUMNS = ["doc_id", "n_turns", "turn_texts", "roles", "ts_first", "ts_last"]


def _vote_vertex(vertex: list[dict], alias_lookup, canon: dict[str, str]) -> str:
    """Canonical QID for one vertexSet cluster (gen_kg_data.py:272-304):
    per-mention candidate = doc 'link' override else first alias
    candidate; majority vote, first-seen tie-break, NT hash fallback."""
    votes: Counter = Counter()
    for m in vertex:
        cand = m.get("link") or m.get("wikidata_eid")
        if not cand and alias_lookup is not None:
            cands = alias_lookup(normalize_label(m.get("name", "")))
            cand = cands[0] if cands else None
        if cand:
            votes[cand] += 1
    if votes:
        qid = max(votes, key=lambda q: votes[q])  # insertion order = first seen
        return canon.get(qid, qid)
    surf0 = normalize_label(vertex[0].get("name", "")) if vertex else ""
    return nt_id(surf0)


def docs_to_linked(
    docs: list[dict], alias_lookup=None, canon: dict[str, str] | None = None
) -> pa.Table:
    """DocRED document dicts → the engine's linked-document Arrow table."""
    canon = canon or {}
    cols = {k: [] for k in DOC_COLUMNS + ["entities", "mentions"]}
    for d in docs:
        sents = d.get("sents", [])
        texts = [" ".join(s) for s in sents]
        cols["doc_id"].append(str(d.get("title", "")))
        cols["n_turns"].append(len(sents))
        cols["turn_texts"].append(texts)
        cols["roles"].append(["sent"] * len(sents))
        cols["ts_first"].append(None)
        cols["ts_last"].append(None)
        ents, ments = [], []
        for ent_idx, vertex in enumerate(d.get("vertexSet", [])):
            qid = _vote_vertex(vertex, alias_lookup, canon)
            label = normalize_label(vertex[0].get("name", "")) if vertex else ""
            ents.append(
                {"ent_idx": ent_idx, "qid": qid, "label": label, "n_mentions": len(vertex)}
            )
            for m in vertex:
                s, e = (m.get("pos") or [0, 0])[:2]
                ments.append(
                    {
                        "ent_idx": ent_idx,
                        "turn_idx": int(m.get("sent_id", 0)),
                        "start": int(s),
                        "end": int(e),
                        "surface": str(m.get("name", "")),
                    }
                )
        ments.sort(key=lambda m: (m["turn_idx"], m["start"]))
        cols["entities"].append(ents)
        cols["mentions"].append(ments)
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "n_turns": pa.array(cols["n_turns"], pa.int32()),
            "turn_texts": pa.array(cols["turn_texts"], pa.list_(pa.string())),
            "roles": pa.array(cols["roles"], pa.list_(pa.string())),
            "ts_first": pa.array(cols["ts_first"], pa.timestamp("us")),
            "ts_last": pa.array(cols["ts_last"], pa.timestamp("us")),
            "entities": pa.array(cols["entities"], pa.list_(ENTITY_T)),
            "mentions": pa.array(cols["mentions"], pa.list_(MENTION_T)),
        }
    )


def read_docred_json(
    path: str, alias_lookup=None, canon: dict[str, str] | None = None
) -> "ray.data.Dataset":
    """DocRED JSON (array file or NDJSON shards) → linked-docs Dataset."""
    with open(path) as f:
        head = f.read(64).lstrip()
    if head.startswith("["):
        # the reference's format: one JSON array per split (small —
        # 3k docs for DocRED); parse on the driver, distribute
        with open(path) as f:
            docs = json.load(f)
        return ray.data.from_arrow(docs_to_linked(docs, alias_lookup, canon))
    # NDJSON shards (the scale path): stream + convert per batch
    ds = ray.data.read_json(path)

    def convert(batch: pa.Table) -> pa.Table:
        return docs_to_linked(batch.to_pylist(), alias_lookup, canon)

    return ds.map_batches(convert, batch_format="pyarrow")


def write_docred_json(corpus_dir: str, out_path: str) -> str:
    """Deterministic DocRED-style export of a synthetic corpus: sents
    from turn texts, vertexSet from gold mentions (with QID links for
    linkable entities), labels from gold pair labels. Lets the DocRED
    reader path be exercised against the same planted truth."""
    import pyarrow.parquet as pq

    tr = pq.read_table(f"{corpus_dir}/transcripts.parquet").to_pylist()
    ge = pq.read_table(f"{corpus_dir}/gold_entities.parquet").to_pylist()
    gm = pq.read_table(f"{corpus_dir}/gold_mentions.parquet").to_pylist()
    gl = pq.read_table(f"{corpus_dir}/gold_labels.parquet").to_pylist()

    sents: dict[str, dict[int, list[str]]] = {}
    for r in tr:
        sents.setdefault(r["conv_id"], {})[r["turn_idx"]] = r["text"].split()
    ent_meta = {(r["doc_id"], r["ent_idx"]): r for r in ge}
    mentions_by_doc: dict[str, list[dict]] = {}
    for m in gm:
        mentions_by_doc.setdefault(m["doc_id"], []).append(m)
    labels: dict[str, list[dict]] = {}
    for r in gl:
        labels.setdefault(r["doc_id"], []).append(
            {"h": r["h_idx"], "t": r["t_idx"], "r": r["r"], "evidence": []}
        )

    # vertexSet index = first-mention order, which is exactly the
    # generator's ent_idx convention (sources/synth.py: order =
    # sorted(chosen, key=first_pos))
    out_docs = []
    for conv, turn_map in sorted(sents.items()):
        doc_ms = sorted(
            mentions_by_doc.get(conv, []), key=lambda m: (m["turn_idx"], m["start"])
        )
        first_seen: dict[int, int] = {}
        for m in doc_ms:
            if m["ent"] not in first_seen:
                first_seen[m["ent"]] = len(first_seen)
        vertex_set: list[list[dict]] = [[] for _ in range(len(first_seen))]
        for m in doc_ms:
            ent_idx = first_seen[m["ent"]]
            meta = ent_meta[(conv, ent_idx)]
            entry = {
                "name": m["surface"],
                "sent_id": m["turn_idx"],
                "pos": [m["start"], m["end"]],
                "type": meta["ent_type"],
            }
            if meta["linkable"]:
                entry["link"] = meta["qid"]
            vertex_set[ent_idx].append(entry)
        out_docs.append(
            {
                "title": conv,
                "sents": [turn_map[i] for i in range(max(turn_map) + 1)],
                "vertexSet": vertex_set,
                "labels": labels.get(conv, []),
            }
        )
    with open(out_path, "w") as f:
        json.dump(out_docs, f)
    return out_path
