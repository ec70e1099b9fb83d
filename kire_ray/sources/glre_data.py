"""GLRE flattened pair-row ``.data`` format — writer (S5) and reader (S2).

The reference's main intermediate format: one line per document, a
tab-separated meta (``pmid \\t sent||sent||…``) followed by one
18-field chunk per (head, tail) pair *including NA pairs* and the
``indev_train`` flag
(/root/reference/GLRE+KIRE/data_processing/docRedProcess.py:15-125);
read back by /root/reference/GLRE+KIRE/data/reader.py:71-161 (chunking,
first-seen entity registry, min-sentence-distance, coref ids by first
position).

Field layout per pair chunk (docRedProcess.py:80-120):
  0 rel   1 dir("L2R")   2 cross("CROSS"/"NON-CROSS")
  3 head[0] global pos "s-e"   4 tail[0] global pos "s-e"
  5 h_idx  6 h names "||"  7 h types ":"  8 h starts ":"  9 h ends ":"
 10 h sent_ids ":"
 11 t_idx 12 t names "||" 13 t types ":" 14 t starts ":" 15 t ends ":"
 16 t sent_ids ":"
 17 indev_train ("True"/"False")
Mention positions are global word offsets (sentence prefix sums,
docRedProcess.py:54-66); entity end offsets are exclusive, as in
DocRED's ``pos``.

Ray shape: the writer is an embarrassingly-parallel ``map_batches``
that renders each linked document to its line and writes one ``.data``
shard per block (deterministic shard names from the block's first
doc_id — rerunnable); the reader streams shards through
``ray.data.read_text`` and parses per batch. The train-fact set for
``indev_train`` is a broadcast dimension table (the reference builds it
as a module-global set while writing the train split,
docRedProcess.py:12,93-96).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from kire_ray.functions.hashing import hash64_str

NA_REL = "NA"


def sanitize_name(name: str) -> str:
    """Mention-surface sanitizer for the tab/'||'/':'-delimited layout.
    MUST be applied identically when building train-fact sets and when
    rendering lines, or name-level fact lookups silently miss."""
    return name.replace("\t", " ").replace("||", "|")


def _sanitize_text(text: str) -> str:
    return text.replace("\t", " ").replace("||", "|")


def _doc_pairs(entities: list[dict], labels: list[dict]) -> list[dict]:
    """Labeled pairs + NA pairs for every other ordered (j, k), j != k
    (docRedProcess.py:69-79: NA is added when the *pair* carries no
    label, regardless of relation)."""
    labeled = {(l["h"], l["t"]) for l in labels}
    out = list(labels)
    n = len(entities)
    for j in range(n):
        for k in range(n):
            if j != k and (j, k) not in labeled:
                out.append({"h": j, "t": k, "r": NA_REL})
    return out


def render_doc_line(
    doc_id: str,
    turn_tokens: list[list[str]],
    entities: list[dict],
    mentions: list[dict],
    labels: list[dict],
    train_facts: set | None = None,
    type_of=None,
) -> str:
    """One document → one ``.data`` line (docRedProcess.py:20-123)."""
    # sentence prefix sums for the global-offset rebase
    Ls = [0]
    for s in turn_tokens:
        Ls.append(Ls[-1] + len(s))
    # per-entity mention lists in document order, with global offsets
    by_ent: dict[int, list[dict]] = {}
    for m in mentions:
        g = Ls[m["turn_idx"]]
        by_ent.setdefault(m["ent_idx"], []).append(
            {
                "name": sanitize_name(m["surface"]),
                "sent_id": m["turn_idx"],
                "pos": (g + m["start"], g + m["end"]),
            }
        )
    ent_type = {}
    for e in entities:
        t = type_of(e) if type_of is not None else "MISC"
        # ':' joins per-mention types, so single colons corrupt the
        # field too (the reference only replaced '::')
        ent_type[e["ent_idx"]] = (t or "MISC").replace("::", "_").replace(":", "_")

    parts = [
        str(doc_id),
        "||".join(_sanitize_text(" ".join(s)) for s in turn_tokens),
    ]
    for label in _doc_pairs(entities, labels):
        h, t, rel = label["h"], label["t"], label["r"]
        head, tail = by_ent.get(h, []), by_ent.get(t, [])
        if not head or not tail:
            continue
        non_cross = any(
            m1["sent_id"] == m2["sent_id"] for m1 in head for m2 in tail
        )
        cross = "NON-CROSS" if non_cross else "CROSS"
        indev = False
        if train_facts is not None:
            indev = any(
                (m1["name"], m2["name"], rel) in train_facts
                for m1 in head
                for m2 in tail
            )

        def ent_fields(idx, ms):
            return [
                str(idx),
                "||".join(m["name"] for m in ms),
                ":".join(ent_type[idx] for _ in ms),
                ":".join(str(m["pos"][0]) for m in ms),
                ":".join(str(m["pos"][1]) for m in ms),
                ":".join(str(m["sent_id"]) for m in ms),
            ]

        parts.extend(
            [
                str(rel),
                "L2R",
                cross,
                f"{head[0]['pos'][0]}-{head[0]['pos'][1]}",
                f"{tail[0]['pos'][0]}-{tail[0]['pos'][1]}",
                *ent_fields(h, head),
                *ent_fields(t, tail),
                str(indev),
            ]
        )
    return "\t".join(parts)


def collect_train_facts(
    linked: "ray.data.Dataset", labels_by_doc: dict[str, list[dict]]
) -> set:
    """(head name, tail name, rel) facts over the train split — one
    small row per fact from each block, aggregated on the driver
    (fact-set is dimension-sized; the reference holds it as an
    in-process set, docRedProcess.py:12)."""
    ref = ray.put(labels_by_doc)

    def facts(b: pa.Table) -> pa.Table:
        lb = ray.get(ref)
        rows = set()
        for doc_id, ments in zip(
            b.column("doc_id").to_pylist(), b.column("mentions").to_pylist()
        ):
            by_ent: dict[int, list[str]] = {}
            for m in ments:
                # same sanitizer as render_doc_line, or fact lookups miss
                by_ent.setdefault(m["ent_idx"], []).append(sanitize_name(m["surface"]))
            for l in lb.get(doc_id, []):
                for n1 in by_ent.get(l["h"], []):
                    for n2 in by_ent.get(l["t"], []):
                        rows.add((n1, n2, l["r"]))
        h, t, r = zip(*rows) if rows else ((), (), ())
        return pa.table({"h": list(h), "t": list(t), "r": list(r)})

    out = linked.map_batches(facts, batch_format="pyarrow").to_pandas()
    return set(zip(out["h"], out["t"], out["r"]))


def write_glre_data(
    linked: "ray.data.Dataset",
    labels_by_doc: dict[str, list[dict]],
    out_dir: str,
    *,
    train_facts: set | None = None,
    type_of=None,
) -> str:
    """Linked docs → sharded ``.data`` files (one per block).

    Shards land in a fresh staging directory that atomically replaces
    ``out_dir`` on completion — a rerun under a different partitioning
    (different block boundaries → different shard names) can never mix
    new shards with stale ones, and a crash mid-write leaves the old
    export intact."""
    import shutil

    stage = out_dir.rstrip("/") + ".staging"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    lb_ref = ray.put(labels_by_doc)
    tf_ref = ray.put(train_facts)

    def write_shard(b: pa.Table) -> pa.Table:
        lb = ray.get(lb_ref)
        tf = ray.get(tf_ref)
        lines = []
        for i in range(len(b)):
            doc_id = b.column("doc_id")[i].as_py()
            turns = [t.split() for t in b.column("turn_texts")[i].as_py()]
            lines.append(
                render_doc_line(
                    doc_id,
                    turns,
                    b.column("entities")[i].as_py(),
                    b.column("mentions")[i].as_py(),
                    lb.get(doc_id, []),
                    train_facts=tf,
                    type_of=type_of,
                )
            )
        if lines:
            first = sorted(l.split("\t", 1)[0] for l in lines)[0]
            shard = os.path.join(stage, f"shard-{hash64_str(first):016x}.data")
            with open(shard + ".tmp", "w", encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
            os.replace(shard + ".tmp", shard)  # atomic per shard
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    linked.map_batches(write_shard, batch_format="pyarrow").count()
    import shutil as _sh

    # publish without a lose-both window (review r5): move the OLD
    # export aside first, rename the stage into place, then delete the
    # old one — a crash at any point leaves either the old or the new
    # export at out_dir (the old rmtree-then-rename order had a window
    # with NEITHER present)
    old = out_dir + ".old"
    _sh.rmtree(old, ignore_errors=True)
    if os.path.isdir(out_dir):
        os.replace(out_dir, old)
    os.replace(stage, out_dir)
    _sh.rmtree(old, ignore_errors=True)
    return out_dir


PAIR_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("h_idx", pa.int32()),
        ("t_idx", pa.int32()),
        ("rel", pa.string()),
        ("dir", pa.string()),
        ("cross", pa.string()),
        ("dist", pa.int32()),
        ("intrain", pa.bool_()),
        ("h_names", pa.list_(pa.string())),
        ("h_type", pa.string()),
        ("h_starts", pa.list_(pa.int32())),
        ("h_ends", pa.list_(pa.int32())),
        ("h_sent_ids", pa.list_(pa.int32())),
        ("t_names", pa.list_(pa.string())),
        ("t_type", pa.string()),
        ("t_starts", pa.list_(pa.int32())),
        ("t_ends", pa.list_(pa.int32())),
        ("t_sent_ids", pa.list_(pa.int32())),
    ]
)


def parse_glre_line(line: str) -> list[dict]:
    """One ``.data`` line → pair rows (reader.py:71-161 semantics:
    18-field chunks, min-sentence distance, '||' sentence split)."""
    f = line.rstrip("\n").split("\t")
    pmid = f[0]
    rest = f[2:]
    rows = []
    for i in range(0, len(rest) - len(rest) % 18, 18):
        p = rest[i : i + 18]
        h_sents = [int(x) for x in p[10].split(":")]
        t_sents = [int(x) for x in p[16].split(":")]
        dist = min(abs(a - b) for a in h_sents for b in t_sents)
        rows.append(
            {
                "doc_id": pmid,
                "h_idx": int(p[5]),
                "t_idx": int(p[11]),
                "rel": p[0],
                "dir": p[1],
                "cross": p[2],
                "dist": dist,
                "intrain": p[17] == "True",
                "h_names": p[6].split("||"),
                "h_type": p[7].split(":")[0],
                "h_starts": [int(x) for x in p[8].split(":")],
                "h_ends": [int(x) for x in p[9].split(":")],
                "h_sent_ids": h_sents,
                "t_names": p[12].split("||"),
                "t_type": p[13].split(":")[0],
                "t_starts": [int(x) for x in p[14].split(":")],
                "t_ends": [int(x) for x in p[15].split(":")],
                "t_sent_ids": t_sents,
            }
        )
    return rows


def _data_paths(path: str) -> list[str] | str:
    """Restrict directory reads to ``*.data`` shards (skip markers and
    stray temp files)."""
    if os.path.isdir(path):
        import glob

        return sorted(glob.glob(os.path.join(path, "*.data")))
    return path


def read_glre_pairs(path: str) -> "ray.data.Dataset":
    """``.data`` file or shard directory → flattened pair-row Dataset."""
    ds = ray.data.read_text(_data_paths(path))

    def parse(b: pa.Table) -> pa.Table:
        rows = []
        for line in b.column("text").to_pylist():
            if line.strip():
                rows.extend(parse_glre_line(line))
        cols = {
            name: pa.array(
                [r[name] for r in rows], type=PAIR_SCHEMA.field(name).type
            )
            for name in PAIR_SCHEMA.names
        }
        return pa.table(cols)

    return ds.map_batches(parse, batch_format="pyarrow")


def read_glre_documents(path: str) -> "ray.data.Dataset":
    """``.data`` → (doc_id, turn_texts) document table (the reader's
    ``documents`` dict, reader.py:95-97)."""
    ds = ray.data.read_text(_data_paths(path))

    def parse(b: pa.Table) -> pa.Table:
        ids, turns = [], []
        for line in b.column("text").to_pylist():
            if not line.strip():
                continue
            f = line.split("\t")
            ids.append(f[0])
            turns.append(f[1].split("||"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "turn_texts": pa.array(turns, pa.list_(pa.string())),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
