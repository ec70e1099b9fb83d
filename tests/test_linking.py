"""Mention detection, clustering, majority-vote linking vs planted gold."""

import pyarrow.parquet as pq

import ray
import ray.data

from kire_ray.functions.textnorm import normalize_label
from kire_ray.stages.assemble import assemble_documents
from kire_ray.stages.linking import (
    MentionLinker,
    build_alias_trie,
    detect_mentions,
    load_alias_broadcast,
)


def _linked(corpus):
    ds = ray.data.read_parquet(f"{corpus}/transcripts.parquet")
    docs = assemble_documents(ds)
    alias = load_alias_broadcast(f"{corpus}/kg_alias.parquet", f"{corpus}/lexicon.parquet")
    return docs.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"alias_ref": alias, "canon_ref": {}},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    ).to_pandas()


def test_detection_recovers_planted_mentions(ray_session, tiny_corpus):
    out = _linked(tiny_corpus)
    gm = pq.read_table(f"{tiny_corpus}/gold_mentions.parquet").to_pandas()
    gold_spans = {
        (m.doc_id, m.turn_idx, m.start, m.end) for m in gm.itertuples()
    }
    got_spans = set()
    for row in out.itertuples():
        for m in row.mentions:
            got_spans.add((row.doc_id, m["turn_idx"], m["start"], m["end"]))
    assert got_spans == gold_spans


def test_cluster_qids_match_gold(ray_session, tiny_corpus):
    """Majority-vote canonical QIDs ≈ planted qids (ambiguous aliases may
    flip a few clusters — tolerance mirrors the P/R≥0.95 gate)."""
    out = _linked(tiny_corpus)
    ge = pq.read_table(f"{tiny_corpus}/gold_entities.parquet").to_pandas()
    gold = {}
    for e in ge.itertuples():
        gold.setdefault(e.doc_id, {})[e.ent_idx] = (e.qid, e.linkable)
    total = correct = 0
    for row in out.itertuples():
        gd = gold[row.doc_id]
        assert len(row.entities) == len(gd)  # ambiguity never merges in-conv
        for e in row.entities:
            qid, linkable = gd[e["ent_idx"]]
            total += 1
            if linkable:
                correct += qid == e["qid"]
            else:
                assert e["qid"].startswith("NT"), (row.doc_id, e)
                correct += 1
    assert correct / total >= 0.95, (correct, total)


def test_unlinkable_nt_ids_deterministic(ray_session):
    trie = build_alias_trie(["known one"], ["Q7"])
    from kire_ray.stages.linking import cluster_and_vote

    mentions = detect_mentions([["zzz", "known", "one"]], trie, 2)
    assert len(mentions) == 1
    ents, _ = cluster_and_vote(mentions, {})
    assert ents[0][1] == "Q7"
    # unlinked cluster: same surface → same NT id in any doc
    fake = [(0, 0, 1, "Mystery Person", [], [])]
    e1, _ = cluster_and_vote(fake, {})
    e2, _ = cluster_and_vote(list(fake), {})
    assert e1[0][1] == e2[0][1] and e1[0][1].startswith("NT")


def test_leftmost_longest_priority():
    trie = build_alias_trie(["alpha", "alpha beta"], ["Q1", "Q2"])
    ms = detect_mentions([["alpha", "beta", "x", "alpha"]], trie, 2)
    assert [(m[1], m[2]) for m in ms] == [(0, 2), (3, 4)]
    assert ms[0][4] == ["Q2"] and ms[1][4] == ["Q1"]


def test_normalization_in_detection():
    trie = build_alias_trie(["New York"], ["Q60"])
    ms = detect_mentions([["visited", "NEW", "york", "today"]], trie, 2)
    assert len(ms) == 1 and ms[0][4] == ["Q60"]
    # exact _handleLabel semantics (gen_kg_data.py:92-94): '\n'→' ',
    # '.' removed, '-'→' ', lowercase — whitespace folds at tokenization
    assert normalize_label("N.ew-York\n") == "new york "
    assert normalize_label("N.ew-York\n").split() == ["new", "york"]


def test_hyphenated_token_matches_multiword_alias():
    """Review r5: _handleLabel turns '-' into ' ' (gen_kg_data.py:92-94),
    so the ONE-token surface 'New-York' must match the alias 'New York'
    — the reference's substring scan would. Spans stay on the original
    token grid (complete tokens only); punct-only tokens still block."""
    from kire_ray.stages.linking import build_alias_trie, detect_mentions

    trie = build_alias_trie(["New York", "Big Apple"], ["Q60", "Q60"])
    ml = max(len(k) for k in trie)
    # single hyphenated token
    ms = detect_mentions([["visit", "New-York", "today"]], trie, ml)
    assert len(ms) == 1
    ti, s, e, surface, cands, _ = ms[0]
    assert (ti, s, e) == (0, 1, 2) and surface == "New-York" and cands == ["Q60"]
    # split across two tokens still works (the old path)
    ms2 = detect_mentions([["New", "York"]], trie, ml)
    assert [(m[1], m[2]) for m in ms2] == [(0, 2)]
    # a PARTIAL token never matches: alias 'new' alone must not claim
    # half of 'New-York'
    trie2 = build_alias_trie(["New"], ["Q1"])
    ms3 = detect_mentions([["New-York"]], trie2, max(len(k) for k in trie2))
    assert ms3 == []
    # a punct-only token between words still blocks bridging
    trie3 = build_alias_trie(["New York"], ["Q60"])
    ms4 = detect_mentions([["New", "...", "York"]], trie3, 2)
    assert ms4 == []
