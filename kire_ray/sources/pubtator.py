"""PubTator source (S3) — the CDR/GDA biomedical input format.

Re-expresses ``readPubTator``
(/root/reference/GLRE+KIRE/data_processing/readers.py:16-101) and the
downstream conversion in process.py: documents arrive as
``pmid|t|title`` / ``pmid|a|abstract`` text lines, entity annotations as
6/7-column tab lines ``pmid off1 off2 name type kbid(s)`` (character
offsets over ``title + " " + abstract``; a ``|``-joined kbid list means
one annotation per candidate id — readers.py:61-66), and relations as
4-column ``pmid type arg1 arg2`` lines.

Ray shape: every line is self-describing (starts with its pmid), so the
format parses as a *line-level* ``map_batches`` followed by one grouped
exchange on pmid — the same assembly shuffle as the transcript pipeline
— instead of a whole-file driver parse. Character offsets are rebased
to the engine's (turn_idx, word_start, word_end) coordinates; entities
cluster by kb id (one cluster per id, first-appearance order, the
reference's "each possible ID is another entity").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from kire_ray.stages.linking import ENTITY_T, MENTION_T


def _classify(line: str) -> dict | None:
    """One PubTator line → a tagged row (or None for blank lines)."""
    line = line.rstrip("\n")
    if not line.strip():
        return None
    # tab-delimited annotation lines FIRST: an entity name containing
    # '|t|' / '|a|' would otherwise classify as a title/abstract line
    # with a garbage pmid (review r5); real t/a lines contain no tabs
    # before the text, and the pmid field itself is never tabbed
    tab = line.split("\t")
    if len(tab) in (6, 7):
        return {"pmid": tab[0], "kind": "ent", "f": tab[1:6]}
    if len(tab) == 4:
        return {"pmid": tab[0], "kind": "rel", "f": tab[1:4]}
    bar = line.split("|", 2)
    if len(bar) == 3 and bar[1] in ("t", "a") and "\t" not in bar[0]:
        return {"pmid": bar[0], "kind": bar[1], "f": [bar[2]]}
    return None


def _char_to_word_span(starts: np.ndarray, lens: np.ndarray, o1: int, o2: int):
    """[o1, o2) char span → [word_start, word_end) over a tokenized
    turn (words overlapping the span)."""
    ends = starts + lens
    w1 = int(np.searchsorted(ends, o1, side="right"))
    w2 = int(np.searchsorted(starts, o2, side="left"))
    return w1, max(w2, w1 + 1)


def _assemble_doc(pmid: str, rows: pd.DataFrame) -> dict:
    title = ""
    abstract = ""
    ents_raw = []
    rels = []
    for r in rows.itertuples():
        if r.kind == "t":
            title = r.f[0]
        elif r.kind == "a":
            abstract = r.f[0]
        elif r.kind == "ent":
            off1, off2, name, etype, kbids = r.f
            for kb in str(kbids).split("|"):
                ents_raw.append((int(off1), int(off2), name, etype, kb))
        elif r.kind == "rel":
            rels.append(tuple(r.f))
    turns = [title, abstract] if abstract else [title]
    tok = [t.split() for t in turns]
    starts, lens = [], []
    for words in tok:
        s, pos = [], 0
        for w in words:
            s.append(pos)
            pos += len(w) + 1
        starts.append(np.asarray(s, dtype=np.int64))
        lens.append(np.asarray([len(w) for w in words], dtype=np.int64))
    t_len = len(title)

    ents_raw.sort(key=lambda e: (e[0], e[1], e[4]))
    ent_idx_of: dict[str, int] = {}
    entities, mentions = [], []
    for off1, off2, name, etype, kb in ents_raw:
        if off1 >= t_len + 1 and len(turns) > 1:
            turn, o1, o2 = 1, off1 - t_len - 1, off2 - t_len - 1
        else:
            turn, o1, o2 = 0, off1, off2
        if len(starts[turn]) == 0:
            continue
        w1, w2 = _char_to_word_span(starts[turn], lens[turn], o1, o2)
        if kb not in ent_idx_of:
            ent_idx_of[kb] = len(ent_idx_of)
            entities.append(
                {"ent_idx": ent_idx_of[kb], "qid": kb, "label": name, "n_mentions": 0}
            )
        e = entities[ent_idx_of[kb]]
        e["n_mentions"] += 1
        mentions.append(
            {
                "ent_idx": ent_idx_of[kb],
                "turn_idx": turn,
                "start": w1,
                "end": w2,
                "surface": name,
            }
        )
    mentions.sort(key=lambda m: (m["turn_idx"], m["start"]))
    return {
        "doc_id": pmid,
        "n_turns": len(turns),
        "turn_texts": turns,
        "entities": entities,
        "mentions": mentions,
        "relations": [
            {"rel": t, "arg1": a1, "arg2": a2} for t, a1, a2 in sorted(rels)
        ],
    }


REL_T = pa.struct([("rel", pa.string()), ("arg1", pa.string()), ("arg2", pa.string())])


def write_pubtator_export(corpus_dir: str, out_path: str) -> str:
    """Deterministic PubTator rendering of a synthetic corpus: turn 0 →
    title, remaining turns joined → abstract, gold mentions → entity
    lines with char offsets over ``title + " " + abstract``, gold pair
    labels → relation lines keyed by QID. Lets the PubTator reader path
    be exercised against the same planted truth (the CDR/GDA analogue
    of sources/docred.write_docred_json)."""
    import pyarrow.parquet as pq

    tr = pq.read_table(corpus_dir + "/transcripts.parquet").to_pylist()
    gm = pq.read_table(corpus_dir + "/gold_mentions.parquet").to_pylist()
    ge = pq.read_table(corpus_dir + "/gold_entities.parquet").to_pylist()
    gl = pq.read_table(corpus_dir + "/gold_labels.parquet").to_pylist()

    turns: dict[str, dict[int, str]] = {}
    for r in tr:
        turns.setdefault(r["conv_id"], {})[r["turn_idx"]] = r["text"]
    ments: dict[str, list[dict]] = {}
    for m in gm:
        ments.setdefault(m["doc_id"], []).append(m)
    ent_meta = {(r["doc_id"], r["ent_idx"]): r for r in ge}
    labels: dict[str, list[dict]] = {}
    for r in gl:
        labels.setdefault(r["doc_id"], []).append(r)

    lines = []
    for conv in sorted(turns):
        tm = turns[conv]
        ordered = [tm[i] for i in range(max(tm) + 1)]
        title, abstract = ordered[0], " ".join(ordered[1:])
        lines.append(f"{conv}|t|{title}")
        if abstract:
            lines.append(f"{conv}|a|{abstract}")
        # word → char offset tables per PubTator coordinate system
        docs_words = [title.split(), abstract.split()]
        char_start = []
        for ti, words in enumerate(docs_words):
            base = 0 if ti == 0 else len(title) + 1
            s, pos = [], base
            for w in words:
                s.append(pos)
                pos += len(w) + 1
            char_start.append(s)
        # map corpus turn coords → (0|1, word offset in joined text)
        turn_word_base = [0]
        for t in ordered[1:]:
            turn_word_base.append(turn_word_base[-1] + len(t.split()))
        doc_ms = sorted(
            ments.get(conv, []), key=lambda m: (m["turn_idx"], m["start"])
        )
        # ent_idx convention = first-mention order (docred.py:156-168)
        first_seen: dict[int, int] = {}
        for m in doc_ms:
            if m["ent"] not in first_seen:
                first_seen[m["ent"]] = len(first_seen)
        for m in doc_ms:
            if m["turn_idx"] == 0:
                ti, w1, w2 = 0, m["start"], m["end"]
            else:
                base = turn_word_base[m["turn_idx"] - 1]
                ti, w1, w2 = 1, base + m["start"], base + m["end"]
            words = docs_words[ti]
            if w2 > len(words):
                continue
            o1 = char_start[ti][w1]
            o2 = char_start[ti][w2 - 1] + len(words[w2 - 1])
            meta = ent_meta[(conv, first_seen[m["ent"]])]
            lines.append(
                f"{conv}\t{o1}\t{o2}\t{m['surface']}\t{meta['ent_type']}\t{meta['qid']}"
            )
        idx_to_qid = {v: ent_meta[(conv, v)]["qid"] for v in first_seen.values()}
        for l in sorted(
            labels.get(conv, []), key=lambda r: (r["h_idx"], r["t_idx"], r["r"])
        ):
            q1 = idx_to_qid.get(l["h_idx"])
            q2 = idx_to_qid.get(l["t_idx"])
            if q1 and q2:
                lines.append(f"{conv}\t{l['r']}\t{q1}\t{q2}")
        lines.append("")
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return out_path


def write_pubtator_export_sharded(
    corpus_dir: str, out_dir: str, *, n_shards: int = 16
) -> str:
    """Sharded variant of :func:`write_pubtator_export`: the same lines
    striped doc-contiguously across ``n_shards`` files under
    ``out_dir``. One big text file caps ``read_text`` at a single task
    (measured: 3.4 s single-threaded read at sf0.1 before the reader
    pipeline even starts); a directory of shards parallelizes the read.
    Documents never split across shards, and the reader's pmid exchange
    makes output identical to the single-file path."""
    import os
    import tempfile

    os.makedirs(out_dir, exist_ok=True)
    one = os.path.join(tempfile.gettempdir(), f"pubtator_all_{os.getpid()}.txt")
    write_pubtator_export(corpus_dir, one)
    with open(one, encoding="utf-8") as f:
        text = f.read()
    os.unlink(one)
    # doc blocks are separated by blank lines; stripe them round-robin
    blocks = [b for b in text.split("\n\n") if b.strip()]
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for i, b in enumerate(blocks):
        shards[i % n_shards].append(b)
    for si, blk in enumerate(shards):
        p = os.path.join(out_dir, f"part-{si:04d}.txt")
        tmp = p + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n\n".join(blk) + "\n")
        os.replace(tmp, p)
    return out_dir


def read_pubtator(path: str) -> "ray.data.Dataset":
    """PubTator file(s) → linked-document Dataset (+ a ``relations``
    list column of the document-level kb-id relation annotations).

    Line classification is embarrassingly parallel; documents assemble
    through one grouped exchange on pmid (partitioned_map_groups)."""
    from kire_ray.stages.shuffle import partitioned_map_groups

    lines = ray.data.read_text(path)

    def classify(b: pa.Table) -> pa.Table:
        rows = [r for r in (_classify(l) for l in b.column("text").to_pylist()) if r]
        return pa.table(
            {
                "pmid": pa.array([r["pmid"] for r in rows], pa.string()),
                "kind": pa.array([r["kind"] for r in rows], pa.string()),
                "f": pa.array([r["f"] for r in rows], pa.list_(pa.string())),
            }
        )

    tagged = lines.map_batches(classify, batch_format="pyarrow")

    def assemble_part(part: pd.DataFrame) -> pd.DataFrame:
        docs = [
            _assemble_doc(pmid, g) for pmid, g in part.groupby("pmid", sort=True)
        ]
        return pd.DataFrame(docs)

    docs = partitioned_map_groups(tagged, ["pmid"], assemble_part)

    def to_arrow(b: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"].tolist(), pa.string()),
                "n_turns": pa.array(b["n_turns"].tolist(), pa.int32()),
                "turn_texts": pa.array(
                    [list(t) for t in b["turn_texts"]], pa.list_(pa.string())
                ),
                "entities": pa.array(
                    [list(e) for e in b["entities"]], pa.list_(ENTITY_T)
                ),
                "mentions": pa.array(
                    [list(m) for m in b["mentions"]], pa.list_(MENTION_T)
                ),
                "relations": pa.array(
                    [list(r) for r in b["relations"]], pa.list_(REL_T)
                ),
            }
        )

    return docs.map_batches(to_arrow, batch_format="pandas")
