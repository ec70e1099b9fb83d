"""WordPiece subword stage: greedy-match semantics, prepro.py marker /
sent_map / subword_indexs parity, chunk-vocab count law, distributed
equality."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from kire_ray.stages.subword import (
    CHUNK,
    UNK,
    SubwordTokenizer,
    _doc_subword_stream,
    build_chunk_vocab,
    tokenize_subwords,
    wordpiece,
)


def test_wordpiece_greedy_longest_match():
    # the canonical BERT example (Devlin et al. 2019)
    vocab = {w: i for i, w in enumerate(["un", "##aff", "##able", "aff", "able", "##a"])}
    assert wordpiece("unaffable", vocab) == ["un", "##aff", "##able"]
    # longest match wins over shorter prefixes
    vocab2 = {w: i for i, w in enumerate(["a", "ab", "abc", "##d"])}
    assert wordpiece("abcd", vocab2) == ["abc", "##d"]
    # no continuation match -> whole word UNK
    assert wordpiece("abx", vocab2) == [UNK]
    # no initial match -> UNK; over-length -> UNK
    assert wordpiece("zzz", vocab2) == [UNK]
    assert wordpiece("a" * 101, vocab2) == [UNK]
    assert wordpiece("", vocab2) == []


def test_prepro_loop_markers_and_maps():
    """Hand-run of the ATLOP+KIRE/prepro.py:37-78 loop on a 2-sentence
    doc with one 2-word mention and one 1-word mention."""
    vocab = {
        w: i
        for i, w in enumerate(
            ["alice", "met", "bob", "smith", "yesterday", "again", "##s"]
        )
    }
    turns = [["alice", "met", "bob", "smith"], ["alice", "again"]]
    mentions = [
        {"turn_idx": 0, "start": 0, "end": 1},  # alice
        {"turn_idx": 0, "start": 2, "end": 4},  # bob smith
        {"turn_idx": 1, "start": 0, "end": 1},  # alice
    ]
    sents, sent_map, sw_idx, n_markers = _doc_subword_stream(
        turns, mentions, vocab, {}
    )
    assert sents == [
        "*", "alice", "*", "met", "*", "bob", "smith", "*",
        "*", "alice", "*", "again",
    ]
    assert n_markers == 6
    # new_map: word -> offset of its first subword (incl. leading '*'),
    # closing entry = len(sents) after the sentence
    assert sent_map[0] == [0, 3, 4, 6, 8]
    assert sent_map[1] == [8, 11, 12]
    # subword_indexs: the reference's star-compensated word starts —
    # replay its exact bookkeeping
    idx, flag, got = 0, False, []
    starts = {(0, 0), (0, 2), (1, 0)}
    ends = {(0, 0), (0, 3), (1, 0)}
    for i_s, sent in enumerate(turns):
        for i_t, tok in enumerate(sent):
            tw = [tok]
            if (i_s, i_t) in starts:
                tw = ["*"] + tw
                idx += 1
                flag = True
            if (i_s, i_t) in ends:
                tw = tw + ["*"]
            if idx not in got:
                got.append(idx)
            idx += len(tw)
            if flag:
                idx -= 1
            flag = False
    assert sw_idx == got


def test_degenerate_span_branch():
    # the reference's DWIE pos[1] <= pos[0] branch: start marks (sent,
    # s), end marks (sent+1, e-1)
    vocab = {"a": 0, "b": 1}
    sents, _, _, n_markers = _doc_subword_stream(
        [["a"], ["b"]], [{"turn_idx": 0, "start": 0, "end": 0}], vocab, {}
    )
    assert sents[0] == "*" and n_markers >= 1


def test_chunk_vocab_count_law(ray_session):
    """Under the corpus chunk vocab, every word splits into exactly
    ceil(len/CHUNK) pieces, zero UNKs, and pieces rejoin to the word."""
    texts = [
        "short words only here",
        "internationalization antidisestablishmentarianism xyz",
        "overlapping prefixes prefix pref p",
    ]
    ds = ray.data.from_items(
        [{"doc_id": f"d{i}", "text": t} for i, t in enumerate(texts)]
    )
    vocab = build_chunk_vocab(ds)
    for t in texts:
        for w in t.split():
            pieces = wordpiece(w, vocab)
            assert len(pieces) == -(-len(w) // CHUNK), (w, pieces)
            assert UNK not in pieces
            assert "".join(p.removeprefix("##") for p in pieces) == w
    out = tokenize_subwords(ds, vocab).to_pandas().sort_values("doc_id")
    exp_words = [len(t.split()) for t in texts]
    exp_sub = [sum(-(-len(w) // CHUNK) for w in t.split()) for t in texts]
    assert out["n_words"].tolist() == exp_words
    assert out["n_subwords"].tolist() == exp_sub
    assert out["n_unk"].sum() == 0
    assert out["n_markers"].sum() == 0  # no mentions column


def test_linked_docs_channels(ray_session):
    """turn_texts + mentions input: ids decode back to the stream, maps
    are consistent, markers counted."""
    vocab = {"[PAD]": 0, "[UNK]": 1, "*": 2, "hello": 3, "world": 4, "bye": 5}
    rows = [
        {
            "doc_id": "c1",
            "turn_texts": ["hello world", "bye"],
            "mentions": [{"turn_idx": 0, "start": 1, "end": 2}],
        }
    ]
    ds = ray.data.from_items(rows)
    out = tokenize_subwords(ds, vocab).to_pandas()
    r = out.iloc[0]
    assert r["n_words"] == 3
    assert r["n_markers"] == 2
    assert r["n_subwords"] == 3
    inv = {v: k for k, v in vocab.items()}
    assert [inv[i] for i in r["input_ids"]] == ["hello", "*", "world", "*", "bye"]
    assert list(r["word_starts"]) == [0, 1, 4]
    assert list(r["turn_ends"]) == [4, 5]


def test_distributed_matches_local(ray_session):
    """tokenize_subwords over many blocks == a single local pass."""
    rng = np.random.default_rng(5)
    words = ["w%d" % i for i in range(50)] + ["longword%d suffix" % i for i in range(20)]
    docs = [
        {"doc_id": f"d{i:03d}", "text": " ".join(rng.choice(words, size=30))}
        for i in range(200)
    ]
    ds = ray.data.from_items(docs).repartition(16)
    vocab = build_chunk_vocab(ds)
    got = (
        tokenize_subwords(ds, vocab)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    memo = {}
    exp_sub = []
    for d in docs:
        sents, _, _, _ = _doc_subword_stream([d["text"].split()], None, vocab, memo)
        exp_sub.append(len(sents))
    assert got["n_subwords"].tolist() == exp_sub
    assert (got["n_unk"] == 0).all()
