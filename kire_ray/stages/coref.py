"""Alias-match coreference scoring (doc-local, no shuffle).

Re-expresses ``get_coref_by_alias``
(/root/reference/ATLOP+KIRE/data/gen_coref_data.py:130-217): for every
entity cluster, collect its KG label/alias strings, find every position
where an alias token-subsequence occurs in the flattened document
(``find_position``, :163-176), union those with the cluster's own
mention spans, and emit all ordered pairs of distinct positions with a
fixed coreference prior of 0.9 (:131, :199-204).  Pair count per doc is
capped (max_pair_cnt = 3200 for DocRED, :220-233) — deterministic
truncation in emission order.

Offsets here are *global word offsets* over the turn-concatenated
document, the reference's rebased coordinate system (prefix-summed
sentence lengths, gen_kg_data.py:250-269).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from kire_ray.stages.scorer import KGIndex

PRIOR = 0.9
MAX_PAIRS = 3200

COREF_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("ent_idx", pa.int32()),
        ("h_start", pa.int32()),
        ("h_end", pa.int32()),
        ("t_start", pa.int32()),
        ("t_end", pa.int32()),
        ("score", pa.float64()),
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


def doc_coref_pairs(doc_id, turn_texts, entities, mentions, index: KGIndex):
    words: list[str] = []
    turn_start = [0]
    for t in turn_texts:
        words.extend(t.split())
        turn_start.append(len(words))
    lowered = [w.lower() for w in words]
    rows = []
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
        pos = sorted(coref_pos)
        for i, p1 in enumerate(pos):
            for j, p2 in enumerate(pos):
                if i != j:
                    rows.append((doc_id, e["ent_idx"], p1[0], p1[1], p2[0], p2[1], PRIOR))
                    if len(rows) >= MAX_PAIRS:
                        return rows
    return rows


class CorefScorer:
    """Actor-pool stage: linked documents → coref pair rows."""

    def __init__(self, kg_ref, canon_ref=None):
        kg = ray.get(kg_ref) if not isinstance(kg_ref, dict) else kg_ref
        canon = ray.get(canon_ref) if canon_ref is not None and not isinstance(canon_ref, dict) else (canon_ref or {})
        self.index = KGIndex(kg, canon)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in COREF_SCHEMA.names}
        for doc_id, turns, ents, ments in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("turn_texts").to_pylist(),
            batch.column("entities").to_pylist(),
            batch.column("mentions").to_pylist(),
        ):
            for r in doc_coref_pairs(doc_id, turns, ents, ments, self.index):
                for k, v in zip(COREF_SCHEMA.names, r):
                    out[k].append(v)
        return pa.table(
            {k: pa.array(out[k], type=COREF_SCHEMA.field(k).type) for k in COREF_SCHEMA.names}
        )
