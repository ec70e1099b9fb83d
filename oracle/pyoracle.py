"""Sequential single-process oracle for the KG-construction pipeline.

Mirrors the reference's execution model (one Python process, whole
corpus in memory — exactly how /root/reference/ATLOP+KIRE/data/
gen_kg_data.py runs) and shares the per-document functions with the Ray
stages, so any disagreement between this and the distributed pipeline
isolates a bug in the *distributed plumbing* (shuffles, combiners,
broadcasts, dedup), not in per-doc semantics.  The independent
correctness gate against *planted* gold lives in the generator
(sources/synth.py: gold_triples) — the oracle is deliberately not the
same thing.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from kire_ray.stages.canonicalize import canon_map_from_pairs
from kire_ray.stages.coref import PRIOR, doc_coref_pairs, scored_doc_coref_pairs
from kire_ray.stages.linking import build_alias_trie, cluster_and_vote, detect_mentions
from kire_ray.stages.scorer import (
    EMB_DIM,
    KGIndex,
    logsumexp_pool,
    score_document,
    token_vec,
)
from kire_ray.functions.textnorm import normalize_label


def run_oracle(corpus_dir: str) -> dict[str, pd.DataFrame]:
    tr = pq.read_table(os.path.join(corpus_dir, "transcripts.parquet")).to_pandas()
    alias = pq.read_table(os.path.join(corpus_dir, "kg_alias.parquet"))
    kg_t = pq.read_table(os.path.join(corpus_dir, "kg_triples.parquet"))
    kg_a = pq.read_table(os.path.join(corpus_dir, "kg_attrs.parquet"))

    lex_path = os.path.join(corpus_dir, "lexicon.parquet")
    lexicon = lex_ids = None
    if os.path.exists(lex_path):
        lex = pq.read_table(lex_path)
        lexicon = lex.column("surface_norm").to_pylist()
        lex_ids = lex.column("lex_id").to_pylist()
    trie = build_alias_trie(
        alias.column("alias_norm").to_pylist(),
        alias.column("qid").to_pylist(),
        lexicon,
        lex_ids,
    )
    max_len = max((len(k) for k in trie), default=1)
    eq = [
        (h, t)
        for h, p, t in zip(
            kg_t.column("h_qid").to_pylist(),
            kg_t.column("prop").to_pylist(),
            kg_t.column("t_qid").to_pylist(),
        )
        if p == "P_eq"
    ]
    canon = canon_map_from_pairs(eq)
    index = KGIndex(
        {
            "h_qid": kg_t.column("h_qid").to_pylist(),
            "prop": kg_t.column("prop").to_pylist(),
            "t_qid": kg_t.column("t_qid").to_pylist(),
            "attr_qid": kg_a.column("qid").to_pylist(),
            "attr_key": kg_a.column("attr_key").to_pylist(),
            "attr_val": kg_a.column("attr_val").to_pylist(),
        },
        canon,
    )

    triple_rows, node_partials, coref_rows, doc_rows = [], [], [], []
    for conv_id, g in tr.sort_values(["conv_id", "turn_idx"], kind="stable").groupby(
        "conv_id", sort=True
    ):
        turns = g["text"].tolist()
        doc_rows.append((conv_id, len(turns), turns))
        turn_tokens = [t.split() for t in turns]
        raw = detect_mentions(turn_tokens, trie, max_len)
        entities, tagged = cluster_and_vote(raw, canon)
        ents = [
            {"ent_idx": e[0], "qid": e[1], "label": e[2], "n_mentions": e[3]}
            for e in entities
        ]
        ments = [
            {"ent_idx": m[0], "turn_idx": m[1], "start": m[2], "end": m[3], "surface": m[4]}
            for m in tagged
        ]
        triple_rows.extend(score_document(conv_id, ents, index))
        from kire_ray.stages.scorer import doc_mention_vecs

        by_ent = doc_mention_vecs(
            turns,
            ments,
            lambda s: token_vec(normalize_label(s)),
            512,
            128,
        )
        for e in ents:
            vecs = by_ent[e["ent_idx"]]
            pooled = logsumexp_pool(np.stack(vecs))
            attrs = index.entity_attrs(e["qid"], e["label"])
            attr_toks = [tok for s in attrs.values() for tok in s.split()]
            vec = pooled + 0.5 * np.mean([token_vec(t) for t in attr_toks], axis=0)
            node_partials.append((conv_id, e["qid"], e["label"], e["n_mentions"], vec))
        alias_rows, positions = doc_coref_pairs(conv_id, turns, ents, ments, index)
        for ent_idx, h_s, h_e, t_s, t_e in alias_rows:
            coref_rows.append(
                (conv_id, ent_idx, h_s, h_e, t_s, t_e, PRIOR, -1, "alias")
            )
        for h_s, h_e, t_s, t_e, score, rank in scored_doc_coref_pairs(
            conv_id, sorted(positions)
        ):
            coref_rows.append(
                (conv_id, -1, h_s, h_e, t_s, t_e, score, rank, "scored")
            )

    triples = pd.DataFrame(
        triple_rows,
        columns=["doc_id", "h_idx", "t_idx", "subj_qid", "pred", "obj_qid", "score"],
    )
    # edges: exact dedup with provenance (max score, doc count, min doc)
    edges = (
        triples.groupby(["subj_qid", "pred", "obj_qid"], sort=True)
        .agg(
            score=("score", "max"),
            n_docs=("doc_id", "nunique"),
            first_doc=("doc_id", "min"),
        )
        .reset_index()
    )
    # nodes: logsumexp merge in doc_id order through the SAME grouped
    # reduceat kernel the distributed merge uses (materialize.py
    # grouped_logsumexp) so summation order is identical by construction
    from kire_ray.stages.materialize import grouped_logsumexp

    by_qid: dict[str, list] = defaultdict(list)
    for conv_id, qid, label, n_m, vec in node_partials:
        by_qid[qid].append((conv_id, label, n_m, vec))
    node_rows = []
    for qid in sorted(by_qid):
        rows = sorted(by_qid[qid], key=lambda r: r[0])
        vecs = np.stack([np.asarray(r[3], dtype=np.float64) for r in rows])
        merged = grouped_logsumexp(vecs, np.array([0]))[0]
        node_rows.append(
            (
                qid,
                min(r[1] for r in rows),
                len(rows),
                int(sum(r[2] for r in rows)),
                merged.tolist(),
            )
        )
    nodes = pd.DataFrame(
        node_rows, columns=["qid", "label", "n_docs", "n_mentions", "vec"]
    )
    coref = pd.DataFrame(
        coref_rows,
        columns=[
            "doc_id", "ent_idx", "h_start", "h_end", "t_start", "t_end",
            "score", "rank", "source",
        ],
    )
    return {"triples": triples, "edges": edges, "nodes": nodes, "coref": coref}


def precision_recall(
    pred: set[tuple], gold: set[tuple]
) -> tuple[float, float, float]:
    """Micro P/R/F1 over exact triple match — the reference's evaluation
    semantics (ATLOP+KIRE/evaluation.py:120-193) applied to (s,p,o)."""
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f1
