"""Deterministic synthetic corpus: transcripts + KG side tables + gold.

Mirrors FIXTURES.md. The input table follows BASELINE.json's
``input_hint`` exactly: ``(conv_id: string, turn_idx: int32, role:
string, text: string, tool: string, ts: timestamp[us])``; a document is
all turns of one ``conv_id`` in ``turn_idx`` order (turn ↔ sentence in
the reference's document model, /root/reference/ATLOP+KIRE/prepro.py:30-44).

Side tables mirror the reference's Wikidata-derived stores:
- ``kg_alias(alias_norm, qid)``  ↔ ``label2kgids``
  (ATLOP+KIRE/data/gen_kg_data.py:31-101)
- ``kg_triples(h_qid, prop, t_qid)`` ↔ ``relation_triplets.nt3``
  (gen_kg_data.py:370-394); includes one-hop neighbor endpoints that are
  not corpus entities, plus ``P_eq`` equivalence edges that drive
  canonicalization (union-find), which are excluded from relation
  candidates the same way the reference excludes TIME entities
  (gen_kg_data.py:557).
- ``kg_attrs(qid, attr_key, attr_val)`` ↔ ``query_entity_attr`` input
  (gen_kg_data.py:578-609) with its defaulting semantics exercised by
  omitting description/alias rows for some entities.

Gold tables are *planted truth*: which entities each conversation
mentions and which KG-supported relations hold between co-occurring,
linkable, non-TIME entities. The pipeline's P/R ≥ 0.95 gate compares
extracted triples against ``gold_triples``.

Everything is a pure function of ``SynthConfig`` (numpy Generator,
fixed seed). No Ray; callers read the written parquet with
``ray.data.read_parquet``.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from dataclasses import dataclass, asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SYLL = [
    "al", "ber", "cor", "dan", "el", "far", "gol", "hem", "ir", "jor",
    "kal", "lum", "mar", "nor", "ol", "par", "qu", "rol", "sam", "tor",
    "ul", "vor", "wex", "xan", "yor", "zel",
]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "calc", "browse", "code", "none"]
_TYPES = ["PER", "ORG", "LOC", "MISC", "TIME"]  # ner2id vocabulary minus PAD/NUM
_BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

EQ_PROP = "P_eq"  # equivalence property consumed by canonicalization only


@dataclass(frozen=True)
class SynthConfig:
    n_convs: int = 200
    seed: int = 42
    n_props: int = 30
    hot_convs: int = 2          # skewed conv_ids (many turns) to exercise salting
    hot_turns: int = 64
    # every Nth conversation is LONG (> the DocRED 512-word profile
    # cap), so the scorer's long_seq.py chunk/stitch path executes on
    # the synthetic corpus (not only in unit tests)
    long_convs_every: int = 97
    long_turns: int = 110
    # entities per conversation are drawn from [2, ent_hi); the DWIE
    # corpus variant raises this past the profile's max_entity_size=100
    # so the per-doc entity-budget truncation actually binds
    ent_hi: int = 7
    # bump to invalidate cached corpora when the GENERATOR code changes
    # (write_corpus only compares this config dict, not the code)
    gen_version: int = 2
    ambiguous_frac: float = 0.03   # aliases mapping to two QIDs
    unlinkable_frac: float = 0.06  # entities absent from kg_alias (→ NT ids)
    time_frac: float = 0.05        # TIME-typed entities (excluded from KG joins)
    eq_frac: float = 0.04          # entity pairs merged by P_eq (union-find)

    @property
    def n_entities(self) -> int:
        # 4·ent_hi: the per-conv entity draw samples 4·k_ent candidates
        # without replacement, so the pool must cover the largest draw
        return max(60, self.n_convs // 3, 4 * self.ent_hi)


def _name_words(rng: np.random.Generator, n: int) -> list[str]:
    words, seen = [], set()
    while len(words) < n:
        k = rng.integers(2, 4)
        w = "".join(rng.choice(_SYLL) for _ in range(k))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def generate_corpus(cfg: SynthConfig) -> dict[str, pa.Table]:
    rng = np.random.default_rng(cfg.seed)
    nE = cfg.n_entities
    words = _name_words(rng, max(40, int(nE**0.5) * 4))

    # --- entities -----------------------------------------------------
    # Entity i: qid Q{1000+i}; label = two name words; aliases = the
    # 2-token label + a unique 1-token short form (concatenation).
    qids = [f"Q{1000 + i}" for i in range(nE)]
    ent_type = [
        _TYPES[int(t)]
        for t in rng.choice(
            len(_TYPES), size=nE,
            p=[0.3, 0.25, 0.25, 0.2 - cfg.time_frac, cfg.time_frac],
        )
    ]
    labels, aliases = [], []  # aliases[i] = list of token-tuples
    used_pairs: set[tuple[str, str]] = set()
    for i in range(nE):
        while True:
            w1, w2 = rng.choice(words, size=2, replace=False)
            if (w1, w2) not in used_pairs:
                used_pairs.add((w1, w2))
                break
        labels.append(f"{w1} {w2}")
        aliases.append([(w1, w2), (w1 + w2,)])

    linkable = rng.random(nE) >= cfg.unlinkable_frac
    linkable[: min(4, nE)] = True  # keep the head of the pool linkable

    # Deliberately ambiguous aliases: entity j's short form also maps to
    # entity i (same alias_norm → two qids). Majority vote / first-
    # candidate tie-break (gen_kg_data.py:281-294) decides; the
    # generator guarantees i and j never co-occur in one conversation.
    ambig_group = np.full(nE, -1, dtype=np.int64)
    n_amb = int(nE * cfg.ambiguous_frac)
    amb_rows: list[tuple[str, str]] = []
    for g in range(n_amb):
        i, j = rng.choice(np.flatnonzero(linkable), size=2, replace=False)
        if ambig_group[i] >= 0 or ambig_group[j] >= 0:
            # an entity in two ambiguous pairs would get its group id
            # OVERWRITTEN, defeating the never-co-occur guard below —
            # observed as cluster merges on the entity-dense DWIE corpus
            continue
        ambig_group[i] = ambig_group[j] = g
        amb_rows.append((" ".join(aliases[j][1]), qids[i]))  # j's short form → also i

    # --- P_eq equivalence pairs (canonicalization input) --------------
    n_eq = int(nE * cfg.eq_frac)
    eq_pairs: list[tuple[str, str]] = []
    eq_used: set[int] = set()
    cand = [i for i in range(nE) if linkable[i] and ent_type[i] != "TIME"]
    for _ in range(n_eq):
        i, j = rng.choice(cand, size=2, replace=False)
        if i in eq_used or j in eq_used or ambig_group[i] >= 0 or ambig_group[j] >= 0:
            continue
        eq_used.update((i, j))
        eq_pairs.append((qids[i], qids[j]))
    # canonical representative: min qid within each eq pair (union-find
    # closure is trivial here — pairs are disjoint by construction)
    canon = {q: q for q in qids}
    for a, b in eq_pairs:
        rep = min(a, b)
        canon[a] = canon[b] = rep

    # --- kg_alias ------------------------------------------------------
    alias_rows: list[tuple[str, str]] = []
    for i in range(nE):
        if not linkable[i]:
            continue
        for al in aliases[i]:
            alias_rows.append((" ".join(al), qids[i]))
    alias_rows.extend(amb_rows)

    # --- conversations -------------------------------------------------
    n_filler = 240
    filler = [f"w{k:04d}" for k in range(n_filler)]
    conv_ids = [f"c{i:07d}" for i in range(cfg.n_convs)]

    t_conv, t_turn, t_role, t_text, t_tool, t_ts = [], [], [], [], [], []
    gold_ent_rows = []      # (doc_id, ent_idx, qid, ent_type, linkable, n_mentions)
    gold_mention_rows = []  # (doc_id, ent_idx, turn_idx, start, end, surface)
    planted_kg: set[tuple[str, str, str]] = set()
    conv_good: list[tuple[str, list[tuple[int, int]]]] = []  # (doc_id, [(ent_idx, entity)])

    # entity popularity: Zipf-ish so some entities are hot across convs
    ent_weights = 1.0 / np.arange(1, nE + 1) ** 0.7
    ent_weights /= ent_weights.sum()
    props = [f"P{p+1}" for p in range(cfg.n_props)]

    for ci, conv in enumerate(conv_ids):
        if ci < cfg.hot_convs:
            n_turns = int(cfg.hot_turns)
        elif cfg.long_convs_every and (ci % cfg.long_convs_every) == cfg.long_convs_every - 1:
            n_turns = int(cfg.long_turns)  # > max_len words → chunk/stitch path
        else:
            n_turns = int(rng.integers(3, 13))
        k_ent = int(rng.integers(2, cfg.ent_hi))
        chosen: list[int] = []
        seen_groups: set[int] = set()
        for e in rng.choice(nE, size=4 * k_ent, replace=False, p=ent_weights, shuffle=False):
            g = ambig_group[e]
            if g >= 0:
                if g in seen_groups:
                    continue
                seen_groups.add(g)
            chosen.append(int(e))
            if len(chosen) == k_ent:
                break

        # schedule mentions: every chosen entity ≥1 mention; extras random
        n_mentions = k_ent + int(rng.integers(0, 2 * k_ent))
        mention_ents = chosen + [int(chosen[int(rng.integers(0, k_ent))]) for _ in range(n_mentions - k_ent)]
        rng.shuffle(mention_ents)
        per_turn: list[list[int]] = [[] for _ in range(n_turns)]
        for me in mention_ents:
            per_turn[int(rng.integers(0, n_turns))].append(me)

        first_pos: dict[int, tuple[int, int]] = {}
        mention_count: dict[int, int] = {}
        for ti in range(n_turns):
            toks: list[str] = []
            for me in per_turn[ti]:
                # ≥1 filler token between mentions / at turn start
                toks.extend(rng.choice(filler, size=int(rng.integers(1, 4))))
                surf = aliases[me][int(rng.integers(0, len(aliases[me])))]
                start = len(toks)
                disp = [t.capitalize() if rng.random() < 0.25 else t for t in surf]
                toks.extend(disp)
                end = len(toks)
                mention_count[me] = mention_count.get(me, 0) + 1
                if me not in first_pos:
                    first_pos[me] = (ti, start)
                gold_mention_rows.append((conv, me, ti, start, end, " ".join(disp)))
            toks.extend(rng.choice(filler, size=int(rng.integers(3, 9))))
            role = _ROLES[ti % 3]
            t_conv.append(conv)
            t_turn.append(ti)
            t_role.append(role)
            t_text.append(" ".join(toks))
            t_tool.append(_TOOLS[int(rng.integers(0, 4))] if role == "tool" else None)
            t_ts.append(_BASE_TS_US + ci * 1_000_000_000 + ti * 7_000_000)

        # entity cluster indices: first-mention order (matches the
        # pipeline's cluster enumeration and the reference's vertexSet
        # insertion-order convention, GLRE+KIRE/data/reader.py:102-125)
        order = sorted(chosen, key=lambda e: first_pos[e])
        ent_idx = {e: k for k, e in enumerate(order)}
        for e in order:
            gold_ent_rows.append(
                (conv, ent_idx[e], qids[e], ent_type[e], bool(linkable[e]), mention_count[e])
            )
        # plant KG triples between linkable, non-TIME pairs so every
        # conversation has extractable relations
        good = [e for e in order if linkable[e] and ent_type[e] != "TIME"]
        conv_good.append((conv, [(ent_idx[e], int(e)) for e in good]))
        n_rel = int(rng.integers(1, 4))
        for _ in range(n_rel):
            if len(good) < 2:
                break
            h, t = rng.choice(good, size=2, replace=False)
            r = props[int(rng.integers(0, cfg.n_props))]
            planted_kg.add((qids[h], r, qids[t]))

    # --- kg_triples: planted + noise + one-hop neighbors + P_eq -------
    kg_rows: set[tuple[str, str, str]] = set(planted_kg)
    n_noise = 3 * nE
    corpus_q = [qids[i] for i in range(nE) if linkable[i] and ent_type[i] != "TIME"]
    for _ in range(n_noise):
        a, b = rng.choice(nE, size=2, replace=False)
        kg_rows.add((qids[a], props[int(rng.integers(0, cfg.n_props))], qids[b]))
    neighbors = [f"QN{9000 + i}" for i in range(nE // 2)]
    for i, nq in enumerate(neighbors):
        kg_rows.add((rng.choice(corpus_q), props[int(rng.integers(0, cfg.n_props))], nq))
        kg_rows.add((nq, props[int(rng.integers(0, cfg.n_props))], rng.choice(corpus_q)))
    for a, b in eq_pairs:
        kg_rows.add((a, EQ_PROP, b))

    # --- gold (canonical space, distant-supervision semantics) --------
    # Gold = exactly what the reference's distant-triple rule produces
    # (gen_kg_data.py:306-323 derives doc triples from co-occurring
    # cluster QID pairs): every KG triple (noise included, P_eq and
    # self-loops excluded) whose canonical endpoints co-occur in some
    # conversation among linkable non-TIME entities. The pipeline links
    # mentions by majority vote, so ambiguous aliases (≈3% of entities)
    # can mislink a cluster — the tolerated gap inside the P/R ≥ 0.95
    # gate.
    kg_by_head: dict[str, list[tuple[str, str]]] = {}
    for h, r, t in kg_rows:
        if r != EQ_PROP:
            kg_by_head.setdefault(canon.get(h, h), []).append((r, canon.get(t, t)))
    gold_label_rows = []
    gold_triple_set: set[tuple[str, str, str]] = set()
    for conv, good in conv_good:
        cq = [canon[qids[e]] for _, e in good]
        for hi, (h_idx, _) in enumerate(good):
            for ti_, (t_idx, _) in enumerate(good):
                if hi == ti_:
                    continue
                ch, ct = cq[hi], cq[ti_]
                if ch == ct:
                    continue
                for r, t2 in kg_by_head.get(ch, ()):
                    if t2 == ct:
                        gold_label_rows.append((conv, h_idx, t_idx, r))
                        gold_triple_set.add((ch, r, ct))
    gold_triples = sorted(gold_triple_set)

    # --- kg_attrs ------------------------------------------------------
    attr_rows: list[tuple[str, str, str]] = []
    for i in range(nE):
        if not linkable[i]:
            continue
        q = qids[i]
        attr_rows.append((q, "label", labels[i]))
        # "instance of" is always present: the pipeline's TIME-entity
        # exclusion (mirroring gen_kg_data.py:557) resolves types from it
        attr_rows.append((q, "instance of", ent_type[i].lower()))
        if rng.random() < 0.7:
            attr_rows.append((q, "description", f"a {ent_type[i].lower()} named {labels[i]}"))
        if rng.random() < 0.5:
            attr_rows.append((q, "alias", " ".join(aliases[i][1])))

    # --- assemble tables (transcripts deterministically shuffled so the
    # stable-sort invariant is actually exercised) ----------------------
    perm = np.random.default_rng(cfg.seed + 1).permutation(len(t_conv))
    transcripts = pa.table(
        {
            "conv_id": pa.array(np.asarray(t_conv, dtype=object)[perm], type=pa.string()),
            "turn_idx": pa.array(np.asarray(t_turn)[perm], type=pa.int32()),
            "role": pa.array(np.asarray(t_role, dtype=object)[perm], type=pa.string()),
            "text": pa.array(np.asarray(t_text, dtype=object)[perm], type=pa.string()),
            "tool": pa.array(np.asarray(t_tool, dtype=object)[perm], type=pa.string()),
            "ts": pa.array(np.asarray(t_ts, dtype=np.int64)[perm], type=pa.timestamp("us")),
        }
    )
    kg_alias = pa.table(
        {
            "alias_norm": pa.array([a for a, _ in alias_rows]),
            "qid": pa.array([q for _, q in alias_rows]),
        }
    )
    # surface lexicon: every entity surface form, including unlinkable
    # entities' — the mention detector's gazetteer. lex_id groups the
    # surface forms of one lexicon entry, standing in for the
    # pre-clustered vertexSet the reference receives as input
    # (ATLOP+KIRE/prepro.py:40-51): without it, the two surfaces of an
    # unlinkable entity could never be coreferred.
    lex_surf, lex_ids = [], []
    for i in range(nE):
        for al in aliases[i]:
            lex_surf.append(" ".join(al))
            lex_ids.append(f"L{i}")
    lexicon = pa.table(
        {"surface_norm": pa.array(lex_surf), "lex_id": pa.array(lex_ids)}
    )
    kg_sorted = sorted(kg_rows)
    kg_triples = pa.table(
        {
            "h_qid": pa.array([h for h, _, _ in kg_sorted]),
            "prop": pa.array([p for _, p, _ in kg_sorted]),
            "t_qid": pa.array([t for _, _, t in kg_sorted]),
        }
    )
    kg_attrs = pa.table(
        {
            "qid": pa.array([q for q, _, _ in attr_rows]),
            "attr_key": pa.array([k for _, k, _ in attr_rows]),
            "attr_val": pa.array([v for _, _, v in attr_rows]),
        }
    )
    gold_entities = pa.table(
        {
            "doc_id": pa.array([r[0] for r in gold_ent_rows]),
            "ent_idx": pa.array([r[1] for r in gold_ent_rows], type=pa.int32()),
            "qid": pa.array([r[2] for r in gold_ent_rows]),
            "ent_type": pa.array([r[3] for r in gold_ent_rows]),
            "linkable": pa.array([r[4] for r in gold_ent_rows]),
            "n_mentions": pa.array([r[5] for r in gold_ent_rows], type=pa.int32()),
        }
    )
    gold_mentions = pa.table(
        {
            "doc_id": pa.array([r[0] for r in gold_mention_rows]),
            "ent": pa.array([r[1] for r in gold_mention_rows], type=pa.int32()),
            "turn_idx": pa.array([r[2] for r in gold_mention_rows], type=pa.int32()),
            "start": pa.array([r[3] for r in gold_mention_rows], type=pa.int32()),
            "end": pa.array([r[4] for r in gold_mention_rows], type=pa.int32()),
            "surface": pa.array([r[5] for r in gold_mention_rows]),
        }
    )
    gold_labels = pa.table(
        {
            "doc_id": pa.array([r[0] for r in gold_label_rows]),
            "h_idx": pa.array([r[1] for r in gold_label_rows], type=pa.int32()),
            "t_idx": pa.array([r[2] for r in gold_label_rows], type=pa.int32()),
            "r": pa.array([r[3] for r in gold_label_rows]),
        }
    )
    gold_triples_t = pa.table(
        {
            "subj_qid": pa.array([h for h, _, _ in gold_triples]),
            "pred": pa.array([r for _, r, _ in gold_triples]),
            "obj_qid": pa.array([t for _, _, t in gold_triples]),
        }
    )
    return {
        "transcripts": transcripts,
        "kg_alias": kg_alias,
        "lexicon": lexicon,
        "kg_triples": kg_triples,
        "kg_attrs": kg_attrs,
        "gold_entities": gold_entities,
        "gold_mentions": gold_mentions,
        "gold_labels": gold_labels,
        "gold_triples": gold_triples_t,
    }


def write_corpus(out_dir: str, cfg: SynthConfig, overwrite: bool = False) -> str:
    """Write all corpus tables as parquet into ``out_dir``; idempotent.

    Atomic: builds in a temp dir next to the target, then renames, so a
    concurrent/killed run never observes a half-written corpus.
    """
    marker = os.path.join(out_dir, "_SYNTH_MANIFEST.json")
    if os.path.exists(marker) and not overwrite:
        with open(marker) as f:
            if json.load(f).get("config") == asdict(cfg):
                return out_dir
    tables = generate_corpus(cfg)
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".synth_", dir=parent)
    try:
        for name, tbl in tables.items():
            if name == "transcripts":
                # the primary input ships as a sharded directory — the
                # shape a real 100 TB corpus has — so Ray's read
                # parallelizes across files (a single file caps the
                # scan at one read task regardless of row groups)
                shard_dir = os.path.join(tmp, f"{name}.parquet")
                os.makedirs(shard_dir)
                n_shards = max(1, min(16, tbl.num_rows // 20_000))
                step = -(-tbl.num_rows // n_shards)
                for si in range(n_shards):
                    pq.write_table(
                        tbl.slice(si * step, step),
                        os.path.join(shard_dir, f"shard-{si:03d}.parquet"),
                        row_group_size=max(4096, step // 8),
                    )
                continue
            # bounded row groups so a reader (Ray's read_parquet) can
            # parallelize the scan within one file
            pq.write_table(
                tbl,
                os.path.join(tmp, f"{name}.parquet"),
                row_group_size=max(4096, tbl.num_rows // 64),
            )
        with open(os.path.join(tmp, "_SYNTH_MANIFEST.json"), "w") as f:
            json.dump({"config": asdict(cfg), "rows": {k: t.num_rows for k, t in tables.items()}}, f)
        if os.path.exists(out_dir):
            import shutil

            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
    finally:
        if os.path.isdir(tmp):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def sf_of_dir(sf_dir: str) -> float:
    """Parse the scale factor from a testdata dir name like .../sf0.01."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def corpus_for_sf_dir(sf_dir: str, cache_root: str = "/tmp/kire_ray_corpus") -> str:
    """Deterministic synthetic transcript corpus sized to a testdata sf
    dir (the testdata has no transcripts table; BASELINE.json says to
    synthesise the input-hint shape at small scale). Cached under /tmp.
    """
    sf = sf_of_dir(sf_dir)
    n_convs = max(50, int(200_000 * sf))
    out = os.path.join(cache_root, f"sf{sf}")
    return write_corpus(out, SynthConfig(n_convs=n_convs))
