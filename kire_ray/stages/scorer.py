"""KG subgraph join + deterministic relation scorer (actor-pool stage).

Re-expressed reference semantics (citations /root/reference/):
- one-hop KG subgraph per document = semi-join of the triple store
  against the document's QID set, TIME-typed entities excluded
  (ATLOP+KIRE/data/gen_kg_data.py:370-386, :557-572);
- attribute lookup with defaulting — description←label, alias←label,
  instance-of←label; label itself falls back to the corpus surface form
  (entity2label), gen_kg_data.py:578-609;
- entity representation = logsumexp pooling over mention embeddings
  (ATLOP+KIRE/model.py:70-98) fused with an attribute encoding
  (the LSTM autoencoder stand-in: hashed bag-of-words,
  knowledge_injection_layer/kg_encoder.py:68-115);
- per-pair multi-label scoring with an adaptive per-pair threshold
  class and a top-k cap (num_labels=4), ATLOP+KIRE/losses.py:32-42,
  train.py:330-331;
- prediction explode to official rows (evaluation.py:10-41).

No torch in this engine: the neural encoder is replaced by a
*deterministic stand-in* with the same dataflow shape and decision
semantics.  score(h,r,t) = 2·[KG evidence] + ½·u(h|r|t) where u is a
stable hash-uniform in [0,1); the adaptive threshold per pair is
θ(h,t) = 1 + ½·u(TH|h|t) ∈ [1, 1.5).  Evidence candidates always clear
θ, non-evidence candidates never do — so skipping the full |R|×pairs
logit matrix is an *exact* optimization, and emitted triples equal the
distant-supervision set the reference derives from co-occurring cluster
QIDs (gen_kg_data.py:306-323).

Scale design: the KG triple/attr stores are broadcast once (``ray.put``)
and indexed per actor in ``__init__``; documents stream through
``map_batches`` in Arrow batches; output is an exploded triples table
(flat_map shape).  For a KG too large to broadcast, the evidence lookup
becomes a bucketed hash join on (h_qid, t_qid) — see stages/joins.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from kire_ray.functions.hashing import hash64_str, score01_md5
from kire_ray.functions.textnorm import normalize_label

EMB_DIM = 16
KG_BOOST = 2.0
BASE_W = 0.5
TH_BASE = 1.0
TH_W = 0.5
TOP_K = 4  # adaptive-threshold top-k cap (losses.py:32-42, num_labels=4)

TRIPLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("h_idx", pa.int32()),
        ("t_idx", pa.int32()),
        ("subj_qid", pa.string()),
        ("pred", pa.string()),
        ("obj_qid", pa.string()),
        ("score", pa.float64()),
    ]
)


def pair_score(h_qid: str, rel: str, t_qid: str, evidence: bool) -> float:
    """Deterministic stand-in for the RE model logit (scorer contract,
    ATLOP+KIRE losses.py adaptive-threshold semantics). md5-derived so
    the driver's DuckDB oracle reproduces the value bit-for-bit:
    ``2.0 + 0.5 * (('0x'||substr(md5(h||'|'||r||'|'||t),1,13))::BIGINT
    / 4503599627370496.0)``."""
    base = BASE_W * score01_md5(f"{h_qid}|{rel}|{t_qid}")
    return (KG_BOOST if evidence else 0.0) + base


def pair_threshold(h_qid: str, t_qid: str) -> float:
    """Adaptive per-pair threshold (losses.py TH class), md5-derived
    for SQL parity (see pair_score)."""
    return TH_BASE + TH_W * score01_md5(f"TH|{h_qid}|{t_qid}")


def token_vec(token: str) -> np.ndarray:
    """Deterministic pseudo-embedding of one token (unit-free)."""
    h = hash64_str(token)
    rng = np.random.default_rng(h)
    return rng.standard_normal(EMB_DIM)


def logsumexp_pool(vecs: np.ndarray) -> np.ndarray:
    """logsumexp over axis 0 — the reference's mention→entity pooling
    (model.py:81). Associative under disjoint unions, so per-doc partials
    merge exactly across documents in the nodes aggregation."""
    m = vecs.max(axis=0)
    return m + np.log(np.exp(vecs - m).sum(axis=0))


class KGIndex:
    """Per-actor index over the (canonicalized) KG stores.

    Attribute policy under P_eq canonicalization: relational evidence
    keys are canon-MAPPED (both endpoints), but ``attrs`` stays keyed
    by raw qid and lookups use the (canonical) qid the linker emits —
    i.e. the REPRESENTATIVE's own attributes win; attributes recorded
    only under a merged-away member are not unioned in. This is a
    deliberate policy (the reference has no cross-entity
    canonicalization at all, so there is no reference behavior to
    match), it is what the SQL chain oracle reconstructs, and the
    synthetic corpus gives every linkable qid its own label +
    instance-of so representative lookups never miss. A union-of-
    members policy would need a matching oracle change and a
    deterministic merge rule — revisit if a real corpus hangs
    attributes off non-representative members."""

    def __init__(self, kg: dict, canon: dict[str, str], eq_prop: str = "P_eq"):
        self.canon = canon
        ev: dict[tuple[str, str], list[str]] = {}
        for h, r, t in zip(kg["h_qid"], kg["prop"], kg["t_qid"]):
            if r == eq_prop:
                continue
            ch, ct = canon.get(h, h), canon.get(t, t)
            ev.setdefault((ch, ct), []).append(r)
        self.evidence = {k: sorted(set(v)) for k, v in ev.items()}
        attrs: dict[str, dict[str, list[str]]] = {}
        for q, k, v in zip(kg["attr_qid"], kg["attr_key"], kg["attr_val"]):
            attrs.setdefault(q, {}).setdefault(k, []).append(v)
        self.attrs = attrs

    def entity_attrs(self, qid: str, fallback_label: str) -> dict[str, str]:
        """4 attribute strings with the reference's defaulting
        (gen_kg_data.py:586-599 + entity2label fallback :580-584)."""
        a = self.attrs.get(qid, {})
        label = " ".join(a.get("label", [])) or fallback_label
        return {
            "label": "label # " + (" ".join(a["label"]) if a.get("label") else label),
            "description": "description # " + (a["description"][0] if a.get("description") else label),
            "instance of": "instance of # " + (" ".join(a["instance of"]) if a.get("instance of") else label),
            "alias": "alias # " + (" ".join(a["alias"]) if a.get("alias") else label),
        }

    def entity_type(self, qid: str) -> str:
        io = self.attrs.get(qid, {}).get("instance of")
        return io[0] if io else ""


class RelationScorer:
    """Actor-pool stage: linked documents → exploded triple rows.

    ``map_batches(RelationScorer, fn_constructor_kwargs={...},
    concurrency=N, batch_format="pyarrow")``. KG stores and the P_eq
    closure are fetched from the object store once per actor.
    """

    def __init__(self, kg_ref, canon_ref, max_entities: int | None = None):
        from kire_ray.config import DOCRED

        kg = ray.get(kg_ref) if not isinstance(kg_ref, dict) else kg_ref
        canon = ray.get(canon_ref) if canon_ref is not None and not isinstance(canon_ref, dict) else (canon_ref or {})
        self.index = KGIndex(kg, canon)
        # per-document entity budget (the reference's fixed-size vertex
        # rectangles, kg_data_loader.py:12-16 / config.py profiles):
        # entities beyond the profile cap — in first-mention (ent_idx)
        # order — never enter pair scoring. SQL mirror: ent_idx < cap.
        self.max_entities = max_entities or DOCRED.max_entity_size
        # per-actor memos over PURE functions of qids: the surviving
        # (rel, score) list of a (h,t) pair and the keep/skip flag of a
        # qid are document-independent, so caching them is numerically
        # invisible (the distributed-vs-sequential bit-equality test
        # proves it) and turns the per-doc pair scoring into dict hits
        # on the dimension-sized qid/pair universe
        self._pair: dict[tuple[str, str], list[tuple[str, float]]] = {}
        self._keep: dict[str, bool] = {}

    def _kept(self, qid: str) -> bool:
        k = self._keep.get(qid)
        if k is None:
            k = not qid.startswith("NT") and self.index.entity_type(qid) != "time"
            self._keep[qid] = k
        return k

    def _pair_rows(self, hq: str, tq: str) -> list[tuple[str, float]]:
        key = (hq, tq)
        v = self._pair.get(key)
        if v is None:
            rels = self.index.evidence.get(key)
            if not rels:
                v = []
            else:
                th = pair_threshold(hq, tq)
                scored = sorted(
                    ((pair_score(hq, r, tq, True), r) for r in rels),
                    key=lambda x: (-x[0], x[1]),
                )[:TOP_K]
                v = [(r, s) for s, r in scored if s > th]
            self._pair[key] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        ents_col = batch.column("entities").to_pylist()
        out = {k: [] for k in TRIPLE_SCHEMA.names}
        ap = {k: out[k].append for k in TRIPLE_SCHEMA.names}
        for doc_id, ents in zip(doc_ids, ents_col):
            good = [
                e
                for e in ents
                if e["ent_idx"] < self.max_entities and self._kept(e["qid"])
            ]
            for h in good:
                hq = h["qid"]
                for t in good:
                    if h["ent_idx"] == t["ent_idx"] or hq == t["qid"]:
                        continue
                    for r, s in self._pair_rows(hq, t["qid"]):
                        ap["doc_id"](doc_id)
                        ap["h_idx"](h["ent_idx"])
                        ap["t_idx"](t["ent_idx"])
                        ap["subj_qid"](hq)
                        ap["pred"](r)
                        ap["obj_qid"](t["qid"])
                        ap["score"](s)
        return pa.table(
            {k: pa.array(out[k], type=TRIPLE_SCHEMA.field(k).type) for k in TRIPLE_SCHEMA.names}
        )


def score_document(
    doc_id: str, ents: list[dict], index: KGIndex, max_entities: int | None = None
):
    """Per-document pair scoring. Shared verbatim with the sequential
    oracle (oracle/pyoracle.py) so distributed == sequential is exact."""
    from kire_ray.config import DOCRED

    cap = max_entities or DOCRED.max_entity_size
    good = [
        e
        for e in ents
        if e["ent_idx"] < cap
        and not e["qid"].startswith("NT")
        and index.entity_type(e["qid"]) != "time"
    ]
    rows = []
    for h in good:
        for t in good:
            if h["ent_idx"] == t["ent_idx"] or h["qid"] == t["qid"]:
                continue
            rels = index.evidence.get((h["qid"], t["qid"]))
            if not rels:
                continue
            th = pair_threshold(h["qid"], t["qid"])
            scored = sorted(
                ((pair_score(h["qid"], r, t["qid"], True), r) for r in rels),
                key=lambda x: (-x[0], x[1]),
            )[:TOP_K]
            for s, r in scored:
                if s > th:
                    rows.append(
                        (doc_id, h["ent_idx"], t["ent_idx"], h["qid"], r, t["qid"], s)
                    )
    return rows


def doc_mention_vecs(
    turns: list[str],
    ments: list[dict],
    vec_of,
    max_len: int,
    overlap: int,
) -> dict[int, list["np.ndarray"]]:
    """Per-doc mention vectors with the reference's long-document
    chunk/stitch (long_seq.py:8-56 split, :156-211 merge): documents
    over ``max_len`` words run per-window and a mention in an overlap
    averages its covering windows' outputs (stitch at the mention's
    start position). Shared verbatim by the distributed EntityEmbedder
    and the sequential oracle (oracle/pyoracle.py) so the float ops —
    including the overlap mean — are identical by construction.

    The stand-in encoder is context-free, so the merge is numerically
    the identity; short documents take the single-window branch
    untouched."""
    from kire_ray.functions.chunking import chunk_spans

    # word-grid length = len(t.split()) — the SAME grid the linker's
    # mention positions index (turn_tokens = t.split()), so a mention's
    # global offset always falls inside a chunk span. The old
    # count(' ')+1 formula disagreed with split() on tabs/newlines/
    # double spaces, leaving an out-of-grid mention with no covering
    # window → None/0 division (review r5, confirmed by repro)
    turn_lens = [len(t.split()) for t in turns]
    n_words = sum(turn_lens)
    by_ent: dict[int, list[np.ndarray]] = {}
    if n_words <= max_len:
        for m in ments:  # one O(M) pass, not O(E×M) rescans
            by_ent.setdefault(m["ent_idx"], []).append(vec_of(m["surface"]))
        return by_ent
    spans = chunk_spans(n_words, max_len, overlap)
    offs = np.concatenate(([0], np.cumsum(turn_lens)))
    for m in ments:
        g = int(offs[m["turn_idx"]]) + m["start"]
        acc, cnt = None, 0
        for s, e in spans:
            if s <= g < e:
                w_out = vec_of(m["surface"])  # per-window output
                acc = w_out if acc is None else acc + w_out
                cnt += 1
        if acc is None:  # belt: a foreign-grid mention still embeds
            acc, cnt = vec_of(m["surface"]), 1
        by_ent.setdefault(m["ent_idx"], []).append(acc / cnt)
    return by_ent


class EntityEmbedder:
    """Actor-pool stage: linked documents → per-doc entity vectors.

    Mention token vectors → logsumexp pooling per entity (model.py:81)
    + mean-pooled hashed encoding of the 4 attribute strings (the
    autoencoder stand-in, kg_encoder.py:68-115). Emits one row per
    (doc, entity) with a fixed-size vector for the nodes table.

    Long documents (> ``max_len`` words) run through the reference's
    overlapping-window chunk/stitch (long_seq.py:8-56 split,
    :156-211 merge; functions/chunking.py): each window computes the
    mention vectors it covers, and a mention in an overlap averages
    its covering windows' outputs (stitch semantics at the mention's
    start position). The per-window stand-in encoder is
    context-free, so the merge is numerically the identity — short
    documents are bit-unchanged and long documents match the
    single-window values to fp-mean precision, exactly like the
    reference where windows agree.
    """

    def __init__(self, kg_ref, canon_ref, max_len: int = 512, overlap: int = 128):
        self.max_len = int(max_len)
        self.overlap = int(overlap)
        kg = ray.get(kg_ref) if not isinstance(kg_ref, dict) else kg_ref
        canon = ray.get(canon_ref) if canon_ref is not None and not isinstance(canon_ref, dict) else (canon_ref or {})
        self.index = KGIndex(kg, canon)
        # per-actor memos: token_vec builds an RNG per call (~15 µs) and
        # the same qid's attr vector recurs in every doc mentioning it —
        # caching changes nothing numerically (pure functions), it only
        # removes recomputation. Keys are tokens / (qid, label): bounded
        # by vocab + entity count, both dimension-sized.
        self._tok: dict[str, np.ndarray] = {}
        self._attr: dict[tuple[str, str], np.ndarray] = {}
        self._surf: dict[str, np.ndarray] = {}
        # fused-output memo: pooled-mentions ⊕ attr vector per
        # (qid, label, ordered surface tuple). Pure function of the key
        # (logsumexp over the same stack in the same order + the same
        # attr vec), so hits are bit-identical to recomputation; short
        # docs repeat (entity, surface-sequence) combinations heavily.
        self._fused: dict[tuple, np.ndarray] = {}

    def _token_vec(self, tok: str) -> np.ndarray:
        v = self._tok.get(tok)
        if v is None:
            v = self._tok[tok] = token_vec(tok)
        return v

    def _attr_vec(self, qid: str, label: str) -> np.ndarray:
        key = (qid, label)
        v = self._attr.get(key)
        if v is None:
            attrs = self.index.entity_attrs(qid, label)
            attr_toks = [tok for s in attrs.values() for tok in s.split()]
            v = self._attr[key] = np.mean([self._token_vec(t) for t in attr_toks], axis=0)
        return v

    def _mention_vec(self, surface: str) -> np.ndarray:
        v = self._surf.get(surface)
        if v is None:
            v = self._surf[surface] = self._token_vec(normalize_label(surface))
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self._tok) > 500_000:  # bound actor memory on open vocab
            self._tok.clear()
            self._attr.clear()
            self._surf.clear()
        if len(self._fused) > 500_000:
            # separate gate: _fused keys are corpus-combinatorial
            # (qid, label, surface sequence) while _tok is dimension-
            # bounded (trie + attr vocabulary) — gating _fused on
            # len(_tok) never fired and the memo grew without bound on
            # long streaming runs (review r5)
            self._fused.clear()
        doc_ids = batch.column("doc_id").to_pylist()
        turns_col = batch.column("turn_texts").to_pylist()
        ents_col = batch.column("entities").to_pylist()
        ments_col = batch.column("mentions").to_pylist()
        # linker-provided word counts skip the per-token text rescan in
        # the long-doc gate (same split() grid by construction)
        nw_col = (
            batch.column("n_words").to_pylist()
            if "n_words" in batch.schema.names
            else [sum(len(t.split()) for t in turns) for turns in turns_col]
        )
        out_doc, out_idx, out_qid, out_label, out_nm, out_vec = [], [], [], [], [], []
        fused = self._fused
        # _mention_vec memoizes raw-surface → token_vec (pure, so
        # numerically neutral; collapses the normalize+hash per mention
        # to one dict hit — surfaces repeat heavily across the corpus)
        for doc_id, turns, ents, ments, n_words in zip(
            doc_ids, turns_col, ents_col, ments_col, nw_col
        ):
            long_doc = n_words > self.max_len
            by_ent: dict | None = None
            by_surf: dict[int, tuple] | None = None
            if not long_doc:
                # short docs (the hot path): the fused vector is a pure
                # function of (qid, label, ordered surfaces) — group the
                # surfaces here and let the memo skip stack+logsumexp
                by_surf = {}
                for m in ments:
                    by_surf.setdefault(m["ent_idx"], []).append(m["surface"])
            else:
                by_ent = doc_mention_vecs(
                    turns, ments, self._mention_vec, self.max_len, self.overlap
                )
            for e in ents:
                if by_surf is not None:
                    key = (e["qid"], e["label"], tuple(by_surf[e["ent_idx"]]))
                    vec = fused.get(key)
                    if vec is None:
                        pooled = logsumexp_pool(
                            np.stack([self._mention_vec(s) for s in key[2]])
                        )
                        # KG-attention fusion stand-in
                        vec = pooled + 0.5 * self._attr_vec(e["qid"], e["label"])
                        fused[key] = vec
                else:
                    pooled = logsumexp_pool(np.stack(by_ent[e["ent_idx"]]))
                    vec = pooled + 0.5 * self._attr_vec(e["qid"], e["label"])
                out_doc.append(doc_id)
                out_idx.append(e["ent_idx"])
                out_qid.append(e["qid"])
                out_label.append(e["label"])
                out_nm.append(e["n_mentions"])
                out_vec.append(vec)
        flat = (
            np.concatenate(out_vec).astype(np.float64, copy=False)
            if out_vec
            else np.array([], dtype=np.float64)
        )
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.string()),
                "ent_idx": pa.array(out_idx, type=pa.int32()),
                "qid": pa.array(out_qid, type=pa.string()),
                "label": pa.array(out_label, type=pa.string()),
                "n_mentions": pa.array(out_nm, type=pa.int32()),
                "vec": pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float64()), EMB_DIM),
            }
        )


def load_kg_broadcast(kg_triples_path: str, kg_attrs_path: str) -> dict:
    """Read KG dimension tables into one broadcastable dict."""
    import pyarrow.parquet as pq

    t = pq.read_table(kg_triples_path)
    a = pq.read_table(kg_attrs_path)
    return {
        "h_qid": t.column("h_qid").to_pylist(),
        "prop": t.column("prop").to_pylist(),
        "t_qid": t.column("t_qid").to_pylist(),
        "attr_qid": a.column("qid").to_pylist(),
        "attr_key": a.column("attr_key").to_pylist(),
        "attr_val": a.column("attr_val").to_pylist(),
    }
