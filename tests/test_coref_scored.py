"""Scored coref: per-mention top-8 rule parity with the reference's
gen_coref_data.py:34-53 loop, and distributed == sequential oracle."""

import math

import numpy as np
import pandas as pd
import pytest

from kire_ray.stages.coref import (
    pair_logits,
    scored_doc_coref_pairs,
)


def _reference_loop(doc_id, pos, top_k=8):
    """Literal mirror of gen_coref_data.py:38-52 over the deterministic
    logit matrix: sorted-desc candidates, top-8, same-start skip,
    sigmoid, symmetric first-insertion-wins."""
    logits = pair_logits(doc_id, pos)
    coref_scores = {}
    for i in range(len(pos)):
        mentions2 = sorted(
            ((j, logits[i, j]) for j in range(len(pos)) if j != i),
            key=lambda x: x[1],
            reverse=True,
        )
        for j, raw in mentions2[:top_k]:
            if pos[i][0] == pos[j][0]:
                continue
            score = 1 / (1 + math.exp(-raw))
            coref_scores.setdefault(i, {})
            if j not in coref_scores[i]:
                coref_scores[i][j] = score
            coref_scores.setdefault(j, {})
            if i not in coref_scores[j]:
                coref_scores[j][i] = score
    return coref_scores


def test_top8_rule_matches_reference_loop():
    rng = np.random.default_rng(3)
    starts = sorted(rng.choice(200, size=25, replace=False).tolist())
    pos = [(int(s), int(s) + int(rng.integers(1, 3))) for s in starts]
    # inject a same-start duplicate pair (must be skipped)
    pos.append((pos[0][0], pos[0][1] + 5))
    got = scored_doc_coref_pairs("docX", pos, top_k=8)
    exp = _reference_loop("docX", sorted(set(pos)), top_k=8)
    spos = sorted(set(pos))
    exp_rows = []
    for i in sorted(exp):
        for rank, (j, score) in enumerate(exp[i].items()):
            exp_rows.append((*spos[i], *spos[j], score, rank))
    assert got == exp_rows
    # every mention initiates at most 8 partners itself, but symmetric
    # fills may push its total degree above 8 (reference behavior)
    by_h = {}
    for h_s, h_e, t_s, t_e, score, rank in got:
        by_h.setdefault((h_s, h_e), []).append(rank)
    for ranks in by_h.values():
        assert ranks == list(range(len(ranks)))  # dense insertion-order ranks
    # same-start pairs never appear
    assert all(r[0] != r[2] for r in got)


def test_symmetry_and_score_range():
    pos = [(i * 10, i * 10 + 2) for i in range(12)]
    rows = scored_doc_coref_pairs("d", pos, top_k=3)
    pairs = {((r[0], r[1]), (r[2], r[3])): r[4] for r in rows}
    for (a, b), s in pairs.items():
        assert 0.0 < s < 1.0
        assert pairs.get((b, a)) == s  # symmetric, same score


def test_caps():
    pos = [(i * 5, i * 5 + 1) for i in range(40)]
    rows = scored_doc_coref_pairs("d", pos, max_mentions=10, top_k=8)
    spans = {(r[0], r[1]) for r in rows} | {(r[2], r[3]) for r in rows}
    assert spans <= {(i * 5, i * 5 + 1) for i in range(10)}
    rows2 = scored_doc_coref_pairs("d", pos, max_pairs=17)
    assert len(rows2) == 17


def test_pipeline_coref_matches_oracle(ray_session, small_corpus):
    from kire_ray.pipelines.kg_construct import (
        KGContext,
        coref_pairs,
        linked_documents,
        read_transcripts,
    )
    from oracle.pyoracle import run_oracle

    ctx = KGContext.from_corpus(small_corpus)
    got = (
        coref_pairs(linked_documents(read_transcripts(small_corpus), ctx), ctx)
        .to_pandas()
    )
    exp = run_oracle(small_corpus)["coref"]
    cols = list(exp.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["source"] == "scored").any() and (got["source"] == "alias").any()
    assert (got.loc[got["source"] == "alias", "score"] == 0.9).all()
