"""Mention detection + entity linking + in-document clustering.

Reference semantics re-expressed (all citations /root/reference/):
- alias dictionary lookup with normalized labels
  (``label2kgids`` build + ``getEntityId``, ATLOP+KIRE/data/gen_kg_data.py:31-101);
- per-entity-cluster canonical QID by majority vote over mention-level
  ids, dict-insertion-order (= first-seen) tie-break
  (gen_kg_data.py:272-304);
- unlinked clusters get a synthetic ``NT…`` id (gen_kg_data.py:286-290).
  The reference mints sequential ``NT<k>`` counters, which are
  partition-order-dependent; this engine uses a content hash of the
  cluster's normalized first surface instead, so ids are deterministic
  under any distributed execution order (SURVEY.md §4(f)).
- alias occurrence scan — finding alias token subsequences in the
  document (gen_coref_data.py:163-176 ``find_position``) — is the
  mention detector here, since transcripts carry no vertexSet
  annotations: leftmost-longest match against the alias trie.

Scale design: the alias table is a dimension table (≈ KG label count,
not corpus-sized), broadcast once via ``ray.put`` and materialized into
a token-trie once per actor in ``__init__`` — never per batch.  All of
detection, clustering, and voting are **document-local**: no shuffle.
(SURVEY.md §7.1 sketches a groupby for the vote; keeping it doc-local
is strictly better — the mention→cluster relation never crosses a
document boundary.)  If the alias table outgrew broadcast (a full
Wikidata label set), this stage would switch to a bucketed hash join on
a normalized-surface key; the trade-off is documented in
``stages/joins.py``.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray

from kire_ray.functions.hashing import nt_id
from kire_ray.functions.textnorm import normalize_label

ENTITY_T = pa.struct(
    [
        ("ent_idx", pa.int32()),
        ("qid", pa.string()),
        ("label", pa.string()),
        ("n_mentions", pa.int32()),
    ]
)
MENTION_T = pa.struct(
    [
        ("ent_idx", pa.int32()),
        ("turn_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
    ]
)


def build_alias_trie(
    alias_norm: list[str],
    qid: list[str],
    lexicon: list[str] | None = None,
    lex_ids: list[str] | None = None,
) -> dict:
    """alias table rows (+ optional surface lexicon) → detection index
    {token-tuple: (sorted candidate qids, sorted lex ids)}.

    Keys are the _handleLabel-normalized surface split into tokens
    (gen_kg_data.py:92-94); an alias mapping to several QIDs keeps all
    candidates, sorted for a deterministic mention-level pick.  Lexicon
    surfaces with no alias entry are *detectable but unlinkable* (the
    reference's "missing ids" case, gen_kg_data.py:86-87, 4113/63256
    labels) and produce NT clusters; their ``lex_id`` groups the surface
    forms of one lexicon entry so they can still be coreferred — the
    stand-in for the pre-clustered vertexSet the reference receives.
    """
    qids: dict[tuple[str, ...], list[str]] = {}
    lexs: dict[tuple[str, ...], list[str]] = {}
    for a, q in zip(alias_norm, qid):
        key = tuple(normalize_label(a).split())
        if not key:
            continue
        qids.setdefault(key, [])
        if q not in qids[key]:
            qids[key].append(q)
    if lexicon:
        for s, lx in zip(lexicon, lex_ids or [""] * len(lexicon)):
            key = tuple(normalize_label(s).split())
            if not key:
                continue
            lexs.setdefault(key, [])
            if lx and lx not in lexs[key]:
                lexs[key].append(lx)
    return {
        key: (sorted(qids.get(key, [])), sorted(lexs.get(key, [])))
        for key in qids.keys() | lexs.keys()
    }


def detect_mentions(
    turn_tokens: list[list[str]],
    trie: dict,
    max_len: int,
    first_tokens: set[str] | None = None,
    norm_memo: dict[str, str] | None = None,
):
    """Leftmost-longest token-subsequence scan per turn.

    Returns [(turn_idx, start, end, surface, candidates, lex_ids)] in
    document order. Deterministic; no overlaps (scan resumes after each
    match), mirroring the reference's substring scan semantics
    (gen_coref_data.py:163-176) with greedy-longest disambiguation.

    ``first_tokens`` (the trie's first-token set) and ``norm_memo`` (a
    token→normalized cache) are carried by the caller across documents —
    rebuilding the set per doc was the stage's single largest cost.
    """
    out = []
    if first_tokens is None:
        first_tokens = {k[0] for k in trie}
    memo = norm_memo if norm_memo is not None else {}
    for ti, toks in enumerate(turn_tokens):
        # each token normalizes to a TUPLE of words — the reference's
        # _handleLabel turns '-' into ' ' (gen_kg_data.py:92-94), so a
        # single token 'New-York' must match the 2-word alias key
        # ('new','york') exactly like the reference's substring scan
        # does (review r5: the old 1:1 token→string normalization could
        # never match multi-word normalizations — silent recall loss).
        # For 1-word-per-token input (the common case) words == the old
        # norm list and the scan is bit-identical.
        words: list[str] = []
        w2tok: list[int] = []
        for j, t in enumerate(toks):
            ws = memo.get(t)
            if ws is None:
                ws = memo.setdefault(t, tuple(normalize_label(t).split()))
            for w in ws:
                words.append(w)
                w2tok.append(j)
        i, n = 0, len(words)
        # word i starts / ends a token iff its neighbors belong to
        # other tokens — matches must consume COMPLETE original tokens
        # so spans stay on the original token grid
        while i < n:
            if words[i] not in first_tokens or (i > 0 and w2tok[i - 1] == w2tok[i]):
                i += 1
                continue
            match = None
            for ln in range(min(max_len, n - i), 0, -1):
                last = i + ln - 1
                # end on a token boundary; reject spans bridging a
                # token that contributed no words (punct-only) — the
                # old scan never matched across those either
                if last + 1 < n and w2tok[last + 1] == w2tok[last]:
                    continue
                if w2tok[last] - w2tok[i] >= ln:
                    continue
                key = tuple(words[i : i + ln])
                if key in trie:
                    match = (ln, trie[key])
                    break
            if match is None:
                i += 1
                continue
            ln, (cands, lexes) = match
            ts_, te_ = w2tok[i], w2tok[i + ln - 1] + 1
            out.append((ti, ts_, te_, " ".join(toks[ts_:te_]), cands, lexes))
            i += ln
    return out


class _UF:
    __slots__ = ("p",)

    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def cluster_and_vote(mentions, canon: dict[str, str]):
    """Cluster doc mentions and pick a canonical QID per cluster.

    Coreference rule (alias-match coref, gen_coref_data.py:130-217):
    two mentions corefer iff they share a candidate QID or have the same
    normalized surface.  Canonical QID = majority vote over mention-level
    ids with first-seen tie-break (gen_kg_data.py:281-294); clusters with
    no linked mention get a hash-based NT id.  Linked ids are then mapped
    through the P_eq union-find closure ``canon``.

    Returns (entities, tagged_mentions): entities =
    [(ent_idx, qid, label, n_mentions)] in first-mention order;
    tagged_mentions = [(ent_idx, turn_idx, start, end, surface)].
    """
    n = len(mentions)
    uf = _UF(n)
    by_key: dict[tuple[str, str], int] = {}
    for i, (_, _, _, surface, cands, lexes) in enumerate(mentions):
        for key in [
            ("s", normalize_label(surface)),
            *(("q", c) for c in cands),
            *(("l", x) for x in lexes),
        ]:
            if key in by_key:
                uf.union(by_key[key], i)
            else:
                by_key[key] = i
    clusters: dict[int, list[int]] = {}
    for i in range(n):
        clusters.setdefault(uf.find(i), []).append(i)
    # first-mention order (mentions are already in (turn, start) order)
    roots = sorted(clusters, key=lambda r: clusters[r][0])
    entities, tagged = [], []
    for ent_idx, root in enumerate(roots):
        members = clusters[root]
        votes = Counter()
        for i in members:
            cands = mentions[i][4]
            if cands:
                votes[cands[0]] += 1  # deterministic first candidate
        if votes:
            qid = max(votes, key=lambda q: votes[q])  # Counter iteration =
            # insertion order → ties resolve to the first-seen id, like
            # the reference's stable sort over a dict (gen_kg_data.py:292-294)
            qid = canon.get(qid, qid)
        else:
            surf0 = normalize_label(mentions[members[0]][3])
            qid = nt_id(surf0)
        label = normalize_label(mentions[members[0]][3])
        entities.append((ent_idx, qid, label, len(members)))
        for i in members:
            ti, s, e, surface = mentions[i][:4]
            tagged.append((ent_idx, ti, s, e, surface))
    tagged.sort(key=lambda m: (m[1], m[2]))
    return entities, tagged


class MentionLinker:
    """Actor-pool stage: documents → documents + entities + mentions.

    ``map_batches(MentionLinker, fn_constructor_kwargs={"alias_ref": ref,
    "canon_ref": ref2}, concurrency=N, batch_format="pyarrow")``.
    The alias table and P_eq closure arrive as ``ray.put`` object refs —
    fetched and indexed once per actor, zero-copy from the object store.
    """

    def __init__(self, alias_ref, canon_ref=None):
        alias = ray.get(alias_ref) if not isinstance(alias_ref, dict) else alias_ref
        self.trie = build_alias_trie(
            alias["alias_norm"], alias["qid"], alias.get("lexicon"), alias.get("lex_ids")
        )
        self.max_len = max((len(k) for k in self.trie), default=1)
        self.first_tokens = {k[0] for k in self.trie}
        self.norm_memo: dict[str, str] = {}
        canon = ray.get(canon_ref) if canon_ref is not None and not isinstance(canon_ref, dict) else (canon_ref or {})
        self.canon = canon

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.norm_memo) > 500_000:  # bound actor memory on open vocab
            self.norm_memo.clear()
        docs_turns = batch.column("turn_texts").to_pylist()
        ents_col, ments_col, nw_col = [], [], []
        for turns in docs_turns:
            turn_tokens = [t.split() for t in turns]
            # word count rides along so downstream stages (embedder's
            # long-doc gate) never rescan the text; the split() grid IS
            # the grid mention positions index, and since review r5 the
            # embedder/oracle word grid (doc_mention_vecs) uses the
            # same split() counts — consistent on any whitespace
            nw_col.append(sum(len(tt) for tt in turn_tokens))
            raw = detect_mentions(
                turn_tokens, self.trie, self.max_len, self.first_tokens, self.norm_memo
            )
            entities, tagged = cluster_and_vote(raw, self.canon)
            ents_col.append(
                [
                    {"ent_idx": e[0], "qid": e[1], "label": e[2], "n_mentions": e[3]}
                    for e in entities
                ]
            )
            ments_col.append(
                [
                    {"ent_idx": m[0], "turn_idx": m[1], "start": m[2], "end": m[3], "surface": m[4]}
                    for m in tagged
                ]
            )
        return (
            batch.append_column(
                "entities", pa.array(ents_col, type=pa.list_(ENTITY_T))
            )
            .append_column("mentions", pa.array(ments_col, type=pa.list_(MENTION_T)))
            .append_column("n_words", pa.array(nw_col, type=pa.int32()))
        )


def load_alias_broadcast(alias_parquet: str, lexicon_parquet: str | None = None):
    """Read the alias dimension table (+ optional surface lexicon) and
    return a dict ready for ``ray.put`` (the trie is built per actor)."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(alias_parquet, columns=["alias_norm", "qid"])
    out = {
        "alias_norm": t.column("alias_norm").to_pylist(),
        "qid": t.column("qid").to_pylist(),
    }
    if lexicon_parquet and os.path.exists(lexicon_parquet):
        lex = pq.read_table(lexicon_parquet, columns=["surface_norm", "lex_id"])
        out["lexicon"] = lex.column("surface_norm").to_pylist()
        out["lex_ids"] = lex.column("lex_id").to_pylist()
    return out
