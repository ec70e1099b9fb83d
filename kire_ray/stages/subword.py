"""WordPiece subword tokenization: input_ids, word→subword maps,
``*`` entity-boundary markers.

Re-expresses the reference's encoder-input preparation
(/root/reference/ATLOP+KIRE/prepro.py:37-78; same loop in
SSAN+KIRE/dataset.py:111-151 and
GLRE+KIRE/nnet/transformers_word_handle.py:99-148):

- greedy longest-match-first WordPiece (the published algorithm: Wu et
  al. 2016 §4.1, Devlin et al. 2019) with ``##`` continuation pieces
  and ``[UNK]`` when no prefix matches;
- per word, the pieces are wrapped with ``*`` markers when the word
  starts / ends an entity mention (prepro.py:62-66: ``["*"] + pieces``
  at an entity start, ``pieces + ["*"]`` at an entity end, end position
  = ``pos[1]-1`` inclusive);
- ``sent_map`` — per sentence, word index → offset of the word's first
  subword in the flattened stream, with the closing ``new_map[i_t+1]``
  entry (prepro.py:67-77);
- ``subword_indexs`` — the reference's marker-adjusted word-start
  positions, reproduced operation-for-operation including its
  ``index += 1 … index -= 1`` star compensation (prepro.py:61-76).

Scale shape: the vocabulary is a dimension table — built distributed
(distinct-word exchange, vocab-sized result) or loaded from a BERT
``vocab.txt``, then ``ray.put`` once and indexed once per actor; the
tokenizer stage is a stateful actor pool over zero-copy Arrow batches
with a per-actor piece memo (token vocabulary ≪ token occurrences).

The default corpus vocab (``build_chunk_vocab``) contains every 8-char
chunk of every corpus word (``##``-prefixed beyond the first), under
which greedy longest-match provably emits ceil(len(word)/8) pieces —
making corpus-level subword counts replicable in ANSI SQL for the
driver's DuckDB oracle while the tokenizer itself stays the real
WordPiece algorithm (swap in a real vocab.txt and nothing else
changes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"
SPECIALS = [PAD, UNK, CLS, SEP, "*"]
CHUNK = 8  # build_chunk_vocab piece length (SQL-replicable: ceil(len/8))


def wordpiece(word: str, vocab: dict[str, int], max_chars: int = 100) -> list[str]:
    """Greedy longest-match-first WordPiece split of one word.

    Exactly the published algorithm (Devlin et al. 2019; HF
    ``WordpieceTokenizer.tokenize`` semantics): repeatedly take the
    longest vocab piece that prefixes the remainder (``##``-prefixed
    after the first piece); if none matches, the whole word becomes
    ``[UNK]``; words longer than ``max_chars`` are ``[UNK]`` outright
    (HF's ``max_input_chars_per_word=100`` — reference parity).

    CAVEAT (review r5): the chunk-vocab SQL oracle counts
    ``ceil(len(word)/chunk)`` pieces UNCONDITIONALLY, so its
    zero-[UNK] invariant holds only for corpora whose words are
    ≤ max_chars — true by construction for every shipped corpus. A
    real corpus with >100-char tokens (URLs, hashes) keeps reference
    semantics here and must adjust the oracle, not this function."""
    n = len(word)
    if n == 0:
        return []
    if n > max_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def _doc_subword_stream(
    turn_tokens: list[list[str]],
    mentions: list[dict] | None,
    vocab: dict[str, int],
    memo: dict[str, list[str]],
    max_chars: int = 100,
):
    """One document through the prepro.py:37-78 loop.

    ``mentions``: [{turn_idx, start, end}] with end EXCLUSIVE (the
    engine's convention); the reference marks ``(sent_id, pos[0])`` as
    entity start and ``(sent_id, pos[1]-1)`` as entity end.

    Returns (subwords, sent_map, subword_indexs, n_markers) where
    sent_map[i_s][i_t] = flattened offset of word i_t's first subword
    (with the closing entry at i_t+1), matching prepro.py's new_map.
    """
    entity_start: set[tuple[int, int]] = set()
    entity_end: set[tuple[int, int]] = set()
    for m in mentions or []:
        s, e = int(m["start"]), int(m["end"])
        if e <= s:  # the reference's DWIE degenerate-span branch
            entity_start.add((int(m["turn_idx"]), s))
            entity_end.add((int(m["turn_idx"]) + 1, e - 1))
        else:
            entity_start.add((int(m["turn_idx"]), s))
            entity_end.add((int(m["turn_idx"]), e - 1))

    sents: list[str] = []
    sent_map: list[list[int]] = []
    subword_indexs: list[int] = []
    seen_idx: set[int] = set()  # O(1) companion for the reference's
    # `if index not in subword_indexs` list scan (same emitted values)
    index = 0
    flag = False
    n_markers = 0
    for i_s, sent in enumerate(turn_tokens):
        new_map: list[int] = []
        for i_t, token in enumerate(sent):
            pieces = memo.get(token)
            if pieces is None:
                pieces = wordpiece(token, vocab, max_chars)
                memo[token] = pieces
            tw = pieces
            if (i_s, i_t) in entity_start:
                tw = ["*"] + tw
                index += 1
                flag = True
                n_markers += 1
            if (i_s, i_t) in entity_end:
                tw = tw + ["*"]
                n_markers += 1
            new_map.append(len(sents))
            sents.extend(tw)
            if index not in seen_idx:
                seen_idx.add(index)
                subword_indexs.append(index)
            index += len(tw)
            if flag:
                index -= 1
            flag = False
        new_map.append(len(sents))
        sent_map.append(new_map)
    return sents, sent_map, subword_indexs, n_markers


SUBWORD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),  # doc_id keeps the INPUT column's type
        ("n_words", pa.int32()),
        ("n_subwords", pa.int32()),
        ("n_unk", pa.int32()),
        ("n_markers", pa.int32()),
        ("input_ids", pa.list_(pa.int32())),
        ("word_starts", pa.list_(pa.int32())),  # flattened sent_map (per word)
        ("turn_ends", pa.list_(pa.int32())),  # sent_map's closing entries
        ("subword_indexs", pa.list_(pa.int32())),
    ]
)


class SubwordTokenizer:
    """Actor-pool stage: documents → subword channels.

    ``map_batches(SubwordTokenizer, fn_constructor_kwargs={"vocab_ref":
    ray.put(vocab)}, batch_format="pyarrow", concurrency=N)``. The
    vocab (a dimension table) is fetched and kept once per actor; a
    token→pieces memo is carried across batches (bounded).

    Input batches need ``doc_id`` + either ``turn_texts``
    (list<string>, the linked-doc schema) or ``text`` (plain documents
    table). If a ``mentions`` column is present, entity ``*`` markers
    are emitted (prepro.py:62-66 semantics).
    """

    def __init__(self, vocab_ref, max_chars: int = 100):
        self.vocab: dict[str, int] = (
            ray.get(vocab_ref) if not isinstance(vocab_ref, dict) else vocab_ref
        )
        self.max_chars = max_chars
        self._memo: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self._memo) > 2_000_000:
            self._memo.clear()
        names = set(batch.schema.names)
        if "turn_texts" in names:
            docs_tokens = [
                [t.split() for t in turns]
                for turns in batch.column("turn_texts").to_pylist()
            ]
        else:
            docs_tokens = [[t.split()] for t in batch.column("text").to_pylist()]
        mentions = (
            batch.column("mentions").to_pylist()
            if "mentions" in names
            else [None] * len(docs_tokens)
        )
        vocab = self.vocab
        unk_id = vocab.get(UNK, 1)
        out = {k: [] for k in SUBWORD_SCHEMA.names}
        for doc_id, toks, ments in zip(
            batch.column("doc_id").to_pylist(), docs_tokens, mentions
        ):
            sents, sent_map, sw_idx, n_markers = _doc_subword_stream(
                toks, ments, vocab, self._memo, self.max_chars
            )
            ids = [vocab.get(p, unk_id) for p in sents]
            out["doc_id"].append(doc_id)
            out["n_words"].append(sum(len(s) for s in toks))
            out["n_subwords"].append(len(sents) - n_markers)
            out["n_unk"].append(sum(1 for p in sents if p == UNK))
            out["n_markers"].append(n_markers)
            out["input_ids"].append(ids)
            out["word_starts"].append(
                [o for m in sent_map for o in m[:-1]]
            )
            out["turn_ends"].append([m[-1] for m in sent_map])
            out["subword_indexs"].append(sw_idx)
        return pa.table(
            {
                k: (
                    pa.array(out[k], type=batch.schema.field("doc_id").type)
                    if k == "doc_id"
                    else pa.array(out[k], type=SUBWORD_SCHEMA.field(k).type)
                )
                for k in SUBWORD_SCHEMA.names
            }
        )


def tokenize_subwords(
    ds: "ray.data.Dataset",
    vocab: dict[str, int],
    *,
    concurrency: tuple[int, int] | None = None,
    max_chars: int = 100,
) -> "ray.data.Dataset":
    from kire_ray.stages.taskpool import process_cached

    # task pool + per-worker-process cache (stages/taskpool.py): the
    # tokenizer state is one broadcast vocab dict — the actor-pool ramp
    # (which a fixed cap of 8 made worse, idling 3/4 of a 32-CPU node)
    # was pure overhead
    return ds.map_batches(
        process_cached(
            SubwordTokenizer, vocab_ref=ray.put(vocab), max_chars=max_chars
        ),
        batch_format="pyarrow",
        concurrency=None if isinstance(concurrency, tuple) else concurrency,
    )


def build_chunk_vocab(
    ds: "ray.data.Dataset", *, text_col: str = "text", chunk: int = CHUNK
) -> dict[str, int]:
    """Distributed corpus-derived WordPiece vocab: every ``chunk``-char
    slice of every distinct word (``##``-prefixed beyond the first).

    Under greedy longest-match this vocab yields exactly
    ceil(len(word)/chunk) pieces per word and zero [UNK]s — piece
    boundaries are provable (no piece longer than ``chunk`` exists, and
    each word's own slices are all present), so corpus subword counts
    are replicable in SQL. The distinct-word exchange is the same
    dimension-sized shuffle as featurize.build_word_vocab; piece ids
    are deterministic: specials first, then sorted pieces.
    """
    from kire_ray.stages.shuffle import grouped_agg

    def words_of(b: pd.DataFrame) -> pd.DataFrame:
        seen: set[str] = set()
        for v in b[text_col]:
            if isinstance(v, str):
                seen.update(v.split())
            else:
                for t in v:
                    seen.update(t.split())
        return pd.DataFrame({"word": sorted(seen)})

    distinct = grouped_agg(
        ds.map_batches(words_of, batch_format="pandas"),
        ["word"],
        {"n": ("word", "size")},
    ).to_pandas()
    return chunk_vocab_from_words(distinct["word"], chunk=chunk)


def chunk_vocab_from_words(words, *, chunk: int = CHUNK) -> dict[str, int]:
    """Chunk-vocab assembly from an already-distinct word iterable
    (e.g. a shared ``featurize.word_counts`` table) — skips the
    corpus scan when the distinct-word exchange already ran."""
    pieces: set[str] = set()
    for w in words:
        for i in range(0, len(w), chunk):
            p = w[i : i + chunk]
            pieces.add(p if i == 0 else "##" + p)
    vocab = {s: i for i, s in enumerate(SPECIALS)}
    for p in sorted(pieces):
        vocab[p] = len(vocab)
    return vocab


def load_vocab(path: str) -> dict[str, int]:
    """A standard BERT ``vocab.txt`` (one piece per line, id = line
    number) — drop-in for the corpus chunk vocab when a real encoder
    vocabulary is available."""
    out: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            out[line.rstrip("\n")] = i
    return out
