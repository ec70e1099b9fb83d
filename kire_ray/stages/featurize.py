"""Dense-feature encoding: word-id / NER / entity-id channels per doc.

Re-expresses the reference's feature-tensor generation
(/root/reference/B4+KIRE/gen_data.py:144-185: ``word/pos/ner`` int64
arrays; GLRE word-id encode with UNK, GLRE+KIRE/data/dataset.py:217-244)
with two scale changes:

- the vocabulary is built *distributed* (per-batch Counter combiner →
  one grouped exchange → driver-side id assignment — the vocab itself
  is dimension-sized), and ids are deterministic: sorted by
  (-count, word), PAD=0 / UNK=1 — not first-seen counters (SURVEY §4f);
- features stay *ragged* per document (Arrow list columns) — the
  max_length padding rectangle (B4 gen_data.py:145-149) is built
  batch-locally inside whatever consumer needs rectangles, never
  globally.

Channels per document (global word offsets = prefix-summed turn
lengths, gen_data.py:36-53):
- word_ids: vocab id per token (UNK=1 for OOV)
- ner_ids: entity-type id at mention token positions, 0 elsewhere
  (B4 gen_data.py:173-179 semantics)
- ent_ids: ent_idx+1 at mention positions, 0 elsewhere (coref/entity
  channel, GLRE dataset.py:250-256)
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

PAD_ID, UNK_ID = 0, 1
NER2ID = {"": 0, "PER": 2, "ORG": 3, "LOC": 4, "MISC": 5, "TIME": 6, "NUM": 7}

FEATURE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_words", pa.int32()),
        ("word_ids", pa.list_(pa.int32())),
        ("ner_ids", pa.list_(pa.int32())),
        ("ent_ids", pa.list_(pa.int32())),
        # per-token char-id rectangles (B4+KIRE/gen_data.py:148,165-168:
        # sen_char[i, j, :16] = char2id of the lowered word's chars),
        # ragged here instead of zero-padded
        ("char_ids", pa.list_(pa.list_(pa.int32()))),
        # per-pair distance channel (parallel lists over ordered entity
        # pairs i != j): the reference's ep_dis / ent_distance
        ("pair_h", pa.list_(pa.int32())),
        ("pair_t", pa.list_(pa.int32())),
        ("ep_dis", pa.list_(pa.int32())),
    ]
)

CHAR_LIMIT = 16  # B4+KIRE/gen_data.py:15

# dis2idx: log2 distance bucketing (kg_data_loader.py:62-72 /
# SSAN+KIRE/dataset.py:79-102 — identical tables): 0→0, 1→1, [2,4)→2,
# [4,8)→3 … [256,∞)→9
_DIS_EDGES = np.array([1, 2, 4, 8, 16, 32, 64, 128, 256], dtype=np.int64)


def dis_bucket(dist) -> np.ndarray:
    """Vectorized dis2idx lookup over non-negative distances."""
    return np.searchsorted(_DIS_EDGES, np.asarray(dist, dtype=np.int64), side="right")


def ep_dis_signed(delta) -> np.ndarray:
    """Signed, shifted pair distance (SSAN dataset.py:210-220): sign ×
    bucket(|delta|) + 10 → ids in [1, 19] with 10 = same position."""
    d = np.asarray(delta, dtype=np.int64)
    return (np.sign(d) * dis_bucket(np.abs(d)) + 10).astype(np.int32)


def word_counts(
    docs: "ray.data.Dataset", *, text_col: str = "turn_texts"
) -> pd.DataFrame:
    """Corpus word-count table (word, n): per-batch Counter combiner →
    grouped_agg sum. One exchange row per (word, block); the result is
    vocabulary-sized. Shared base for ``build_word_vocab`` and the
    subword chunk vocab so the flagship scans the corpus once."""
    from kire_ray.stages.shuffle import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        col = b[text_col]
        for v in col:
            if isinstance(v, str):
                c.update(v.split())
            else:  # list of turn texts
                for t in v:
                    c.update(t.split())
        return pd.DataFrame({"word": list(c.keys()), "n": list(c.values())})

    return grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["word"],
        {"n": ("n", "sum")},
    ).to_pandas()


def vocab_from_counts(counts: pd.DataFrame, *, min_count: int = 1) -> dict[str, int]:
    """Deterministic id assignment over a (word, n) table, sorted by
    (-count, word); ids 0/1 reserved for PAD/UNK."""
    counts = counts[counts["n"] >= min_count]
    counts = counts.sort_values(["n", "word"], ascending=[False, True], kind="stable")
    return {w: i + 2 for i, w in enumerate(counts["word"])}  # 0=PAD, 1=UNK


def char_vocab_from_counts(counts: pd.DataFrame) -> dict[str, int]:
    """Character vocabulary for the B4 char channel (char2id.json,
    B4+KIRE/gen_data.py:137): ids ranked by corpus character frequency
    (occurrences of the lowered word × its count), ties by char;
    0=PAD, 1=UNK like the word vocab. Derived driver-side from the
    vocabulary-sized (word, n) table — no extra corpus pass."""
    from collections import Counter

    c: Counter = Counter()
    for w, n in zip(counts["word"], counts["n"]):
        for ch in str(w).lower():
            c[ch] += int(n)
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return {ch: i + 2 for i, (ch, _) in enumerate(ordered)}


def build_word_vocab(
    docs: "ray.data.Dataset", *, text_col: str = "turn_texts", min_count: int = 1
) -> dict[str, int]:
    """Distributed word-frequency vocabulary (see ``word_counts``)."""
    return vocab_from_counts(
        word_counts(docs, text_col=text_col), min_count=min_count
    )


class FeaturizeDocs:
    """Actor-pool stage: linked documents → ragged feature channels.

    The vocab and KG stores arrive as ``ray.put`` refs, indexed once
    per actor; entity types resolve through the KG 'instance of'
    attribute (the reference's ner2id channel keyed by vertex type)."""

    def __init__(
        self,
        vocab_ref,
        kg_ref=None,
        canon_ref=None,
        max_entities: int | None = None,
        char_vocab_ref=None,
    ):
        from kire_ray.config import DOCRED

        self.max_entities = max_entities or DOCRED.max_entity_size
        self.vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) else vocab_ref
        self.char_vocab = (
            ray.get(char_vocab_ref)
            if char_vocab_ref is not None and not isinstance(char_vocab_ref, dict)
            else (char_vocab_ref or {})
        )
        # per-actor word → char-id-list memo (pure lookup; words repeat
        # heavily, so the char loop runs once per distinct word)
        self._chars: dict[str, list[int]] = {}
        self.type_of: dict[str, str] = {}
        if kg_ref is not None:
            from kire_ray.stages.scorer import KGIndex

            kg = ray.get(kg_ref) if not isinstance(kg_ref, dict) else kg_ref
            canon = (
                ray.get(canon_ref)
                if canon_ref is not None and not isinstance(canon_ref, dict)
                else (canon_ref or {})
            )
            idx = KGIndex(kg, canon)
            self.type_of = {
                q: (idx.entity_type(q) or "").upper() for q in idx.attrs.keys()
            }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self._chars) > 2_000_000:  # bound worker memory on open
            self._chars.clear()          # vocab (review r5; same gate
                                         # as SubwordTokenizer._memo)
        vocab = self.vocab
        out = {k: [] for k in FEATURE_SCHEMA.names}
        for doc_id, turns, ents, ments in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("turn_texts").to_pylist(),
            batch.column("entities").to_pylist(),
            batch.column("mentions").to_pylist(),
        ):
            words: list[str] = []
            turn_start = [0]
            for t in turns:
                words.extend(t.split())
                turn_start.append(len(words))
            wid = np.fromiter(
                (vocab.get(w, UNK_ID) for w in words), dtype=np.int32, count=len(words)
            )
            cmemo, cvocab = self._chars, self.char_vocab
            char_ids = [
                cmemo[w]
                if w in cmemo
                else cmemo.setdefault(
                    w,
                    [cvocab.get(ch, UNK_ID) for ch in w.lower()[:CHAR_LIMIT]],
                )
                for w in words
            ]
            ner = np.zeros(len(words), dtype=np.int32)
            eid = np.zeros(len(words), dtype=np.int32)
            ent_type = {
                e["ent_idx"]: NER2ID.get(self.type_of.get(e["qid"], ""), 0) for e in ents
            }
            first_pos: dict[int, int] = {}
            for m in ments:
                g = turn_start[m["turn_idx"]]
                ner[g + m["start"] : g + m["end"]] = ent_type.get(m["ent_idx"], 0)
                eid[g + m["start"] : g + m["end"]] = m["ent_idx"] + 1
                if m["ent_idx"] not in first_pos:
                    first_pos[m["ent_idx"]] = g + m["start"]
            # ep_dis channel: signed log2 bucket of first-appearance
            # deltas over ordered entity pairs (capped at the profile's
            # entity budget, like the reference's max_entity_size
            # rectangle). Word offsets stand in for the reference's
            # subword offsets — same bucket table, coarser coordinate.
            ents_sorted = sorted(first_pos)[: self.max_entities]
            fp = np.array([first_pos[e] for e in ents_sorted], dtype=np.int64)
            n_e = len(fp)
            if n_e >= 2:
                hh, tt = np.nonzero(~np.eye(n_e, dtype=bool))
                dis = ep_dis_signed(fp[hh] - fp[tt])
                pair_h = np.array([ents_sorted[i] for i in hh], dtype=np.int32)
                pair_t = np.array([ents_sorted[i] for i in tt], dtype=np.int32)
            else:
                pair_h = pair_t = np.array([], dtype=np.int32)
                dis = np.array([], dtype=np.int32)
            out["doc_id"].append(doc_id)
            out["n_words"].append(len(words))
            out["word_ids"].append(wid.tolist())
            out["char_ids"].append(char_ids)
            out["ner_ids"].append(ner.tolist())
            out["ent_ids"].append(eid.tolist())
            out["pair_h"].append(pair_h.tolist())
            out["pair_t"].append(pair_t.tolist())
            out["ep_dis"].append(dis.tolist())
        return pa.table(
            {k: pa.array(out[k], type=FEATURE_SCHEMA.field(k).type) for k in FEATURE_SCHEMA.names}
        )


def featurize(
    linked: "ray.data.Dataset",
    vocab: dict[str, int],
    *,
    char_vocab: dict[str, int] | None = None,
    kg_ref=None,
    canon_ref=None,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    from kire_ray.stages.taskpool import process_cached

    # task pool (stages/taskpool.py): featurizer state = broadcast
    # vocab dicts, built once per worker process — no actor ramp
    return linked.map_batches(
        process_cached(
            FeaturizeDocs,
            vocab_ref=ray.put(vocab),
            kg_ref=kg_ref,
            canon_ref=canon_ref,
            char_vocab_ref=ray.put(char_vocab or {}),
        ),
        batch_format="pyarrow",
        concurrency=None if isinstance(concurrency, tuple) else concurrency,
    )
