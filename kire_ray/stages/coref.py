"""Coreference scoring (doc-local, no shuffle): the reference's two
coref sources, re-expressed.

1. **Scored mention-pair coref with per-mention top-8** — the primary
   path (/root/reference/ATLOP+KIRE/data/gen_coref_data.py:34-53):
   every mention gets its candidate partners ranked by score, keeps the
   top 8 (``:40-41``), pairs with identical start positions are
   skipped (``:41-42``), scores pass through a sigmoid (``:44``) and
   fill symmetrically with first-insertion-wins (``:45-52``). The
   reference's scores come from neuralcoref (not available in this
   container — SURVEY.md §8); this engine substitutes a deterministic
   hash-uniform pair logit (the same stand-in family as the relation
   scorer's pair_score), which preserves every ranking/top-k/symmetry
   semantic exactly and is reproducible across any execution order.

2. **Alias-match coref with a fixed 0.9 prior** — ``get_coref_by_alias``
   (gen_coref_data.py:130-217): for every entity cluster, union the KG
   label/alias occurrence positions (``find_position``, :163-176) with
   the cluster's mention spans and emit all ordered pairs at prior 0.9
   (:131, :199-204).

Pair counts are capped per dataset profile (max_pair_cnt — 3200 DocRED
/ 9000 DWIE, gen_coref_data.py:220-233, kire_ray.config) by
deterministic truncation in emission order.

Offsets are *global word offsets* over the turn-concatenated document,
the reference's rebased coordinate system (prefix-summed sentence
lengths, gen_kg_data.py:250-269).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from kire_ray.config import DOCRED, DatasetProfile
from kire_ray.stages.scorer import KGIndex

PRIOR = 0.9
MAX_PAIRS = DOCRED.max_pair_cnt

COREF_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("ent_idx", pa.int32()),  # -1 for scored (cross-cluster) rows
        ("h_start", pa.int32()),
        ("h_end", pa.int32()),
        ("t_start", pa.int32()),
        ("t_end", pa.int32()),
        ("score", pa.float64()),
        ("rank", pa.int32()),  # partner rank within h's list; -1 = alias row
        ("source", pa.string()),  # 'scored' | 'alias'
    ]
)


def find_positions(words: list[str], alias_tokens: list[str]) -> set[tuple[int, int]]:
    """All occurrences of the alias token run in the word sequence
    (gen_coref_data.py:163-176 semantics: every position, overlaps
    allowed)."""
    n, k = len(words), len(alias_tokens)
    out = set()
    if k == 0 or n < k:
        return out
    first = alias_tokens[0]
    for i in range(n - k + 1):
        # first-token prefilter: skip the slice allocation unless the
        # anchor matches (the scan is per alias × per doc — hot)
        if words[i] == first and words[i : i + k] == alias_tokens:
            out.add((i, i + k))
    return out


def pair_logits(doc_id: str, pos: list[tuple[int, int]]) -> np.ndarray:
    """Deterministic symmetric mention-pair logit matrix (M×M).

    Stand-in for the neuralcoref pairwise scores: uniform in [-4, 4),
    a pure function of (doc_id, unordered span pair) — same on every
    worker and cluster size. md5-derived (functions.hashing.score01_md5)
    so the driver's DuckDB oracle reproduces every logit bit-for-bit:
    ``(('0x'||substr(md5(key),1,13))::BIGINT / 2^52 - 0.5) * 8``.
    """
    import hashlib

    m = len(pos)
    logits = np.zeros((m, m), dtype=np.float64)
    if m < 2:
        return logits
    iu, ju = np.triu_indices(m, k=1)
    # bit-equal fast path of functions.hashing.score01_md5: the first
    # 13 hex digits are digest[:7] big-endian >> 4 (14 nibbles → 13) —
    # skips the hexdigest string + int parse on the hottest md5 loop
    # in the engine (M² keys per doc). Span strings are precomputed
    # once per mention instead of twice per pair.
    ps = [f"{s},{e}" for s, e in pos]
    pre = f"{doc_id}|"
    md5 = hashlib.md5
    vals = np.fromiter(
        (
            int.from_bytes(md5(f"{pre}{ps[i]}|{ps[j]}".encode("utf-8")).digest()[:7], "big") >> 4
            for i, j in zip(iu, ju)
        ),
        dtype=np.float64,
        count=len(iu),
    )
    vals = (vals / float(2**52) - 0.5) * 8.0
    logits[iu, ju] = vals
    logits[ju, iu] = vals
    return logits


def scored_doc_coref_pairs(
    doc_id: str,
    positions: list[tuple[int, int]],
    *,
    top_k: int = 8,
    max_mentions: int = DOCRED.max_coref_mention_size,
    max_pairs: int = MAX_PAIRS,
):
    """gen_coref_data.py:34-53 re-expressed over explicit spans.

    Returns [(h_start, h_end, t_start, t_end, score, rank)]: per
    mention, candidate partners sorted by score desc, top ``top_k``
    kept, same-start pairs skipped, sigmoid scores, symmetric
    first-insertion-wins fill.
    """
    pos = sorted(set(positions))[:max_mentions]
    m = len(pos)
    if m < 2:
        return []
    logits = pair_logits(doc_id, pos)
    # one stable argsort over the whole matrix replaces m python sorts;
    # removing self (logits[i,i]=0) from a stable descending order
    # leaves the other candidates' relative order unchanged, so this
    # matches the reference's sorted(j != i, key=score desc) exactly
    order = np.argsort(-logits, axis=1, kind="stable").tolist()
    logit_rows = logits.tolist()  # plain-float rows: no np-scalar boxing
    starts = [s for s, _ in pos]
    out: dict[int, dict[int, float]] = {}
    for i in range(m):
        taken = 0
        row = logit_rows[i]
        si = starts[i]
        for j in order[i]:
            if j == i:
                continue
            if taken >= top_k:
                break
            taken += 1  # a same-start candidate still consumes a slot
            if si == starts[j]:  # identical start: skipped (:41-42)
                continue
            score = 1.0 / (1.0 + math.exp(-row[j]))
            out.setdefault(i, {}).setdefault(j, score)
            out.setdefault(j, {}).setdefault(i, score)
    rows = []
    for i in sorted(out):
        for rank, (j, score) in enumerate(out[i].items()):
            rows.append((*pos[i], *pos[j], score, rank))
            if len(rows) >= max_pairs:
                return rows
    return rows


def doc_coref_pairs(
    doc_id,
    turn_texts,
    entities,
    mentions,
    index: KGIndex,
    *,
    max_pairs: int = MAX_PAIRS,
):
    """Alias-match coref pairs at the fixed 0.9 prior (the
    get_coref_by_alias path). Returns [(ent_idx, h_s, h_e, t_s, t_e)]
    plus the per-cluster global position sets for reuse."""
    words: list[str] = []
    turn_start = [0]
    for t in turn_texts:
        words.extend(t.split())
        turn_start.append(len(words))
    lowered = [w.lower() for w in words]
    rows = []
    all_positions: set[tuple[int, int]] = set()
    truncated = False
    for e in entities:
        a = index.attrs.get(e["qid"], {})
        alias_strings = set(a.get("label", []) + a.get("alias", []))
        coref_pos: set[tuple[int, int]] = set()
        for s in alias_strings:
            coref_pos |= find_positions(lowered, s.lower().split())
        for m in mentions:
            if m["ent_idx"] == e["ent_idx"]:
                g = turn_start[m["turn_idx"]]
                coref_pos.add((g + m["start"], g + m["end"]))
        # positions accumulate for EVERY entity even after the alias
        # pair-row cap fires: the scored top-8 path consumes these
        # positions independently (the reference's neuralcoref pass
        # covers the whole document regardless of the alias cap —
        # review r5: an early return here silently dropped all later
        # entities' mentions from the scored path). Emitted ROWS still
        # stop at exactly max_pairs, byte-identical to before.
        all_positions |= coref_pos
        if truncated:
            continue
        pos = sorted(coref_pos)
        for i, p1 in enumerate(pos):
            if truncated:
                break
            for j, p2 in enumerate(pos):
                if i != j:
                    rows.append((e["ent_idx"], p1[0], p1[1], p2[0], p2[1]))
                    if len(rows) >= max_pairs:
                        truncated = True
                        break
    return rows, all_positions


class CorefScorer:
    """Actor-pool stage: linked documents → coref pair rows (both the
    scored top-8 path and the alias-prior path, tagged by ``source``)."""

    def __init__(self, kg_ref, canon_ref=None, profile: DatasetProfile = DOCRED):
        kg = ray.get(kg_ref) if not isinstance(kg_ref, dict) else kg_ref
        canon = ray.get(canon_ref) if canon_ref is not None and not isinstance(canon_ref, dict) else (canon_ref or {})
        self.index = KGIndex(kg, canon)
        self.profile = profile

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.profile
        # one flat row-tuple list + a single zip(*) transpose instead of
        # a 9-append emit() per row (measured: emit was ~20% of the UDF)
        rows: list[tuple] = []
        for doc_id, turns, ents, ments in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("turn_texts").to_pylist(),
            batch.column("entities").to_pylist(),
            batch.column("mentions").to_pylist(),
        ):
            alias_rows, positions = doc_coref_pairs(
                doc_id, turns, ents, ments, self.index, max_pairs=p.max_pair_cnt
            )
            for ent_idx, h_s, h_e, t_s, t_e in alias_rows:
                rows.append((doc_id, ent_idx, h_s, h_e, t_s, t_e, PRIOR, -1, "alias"))
            for h_s, h_e, t_s, t_e, score, rank in scored_doc_coref_pairs(
                doc_id,
                sorted(positions),
                top_k=p.coref_top_k,
                max_mentions=p.max_coref_mention_size,
                max_pairs=p.max_pair_cnt,
            ):
                rows.append((doc_id, -1, h_s, h_e, t_s, t_e, score, rank, "scored"))
        cols = list(zip(*rows)) if rows else [[] for _ in COREF_SCHEMA.names]
        return pa.table(
            {
                k: pa.array(cols[n], type=COREF_SCHEMA.field(k).type)
                for n, k in enumerate(COREF_SCHEMA.names)
            }
        )
