"""End-to-end KG construction: distributed == sequential oracle,
P/R ≥ 0.95 vs planted gold, determinism across runs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from kire_ray.pipelines.kg_construct import build_graph
from oracle.pyoracle import precision_recall, run_oracle


@pytest.fixture(scope="module")
def graph(ray_session, small_corpus):
    g = build_graph(small_corpus, concurrency=2)
    return {
        "edges": g["edges"].to_pandas(),
        "nodes": g["nodes"].to_pandas(),
        "triples": g["triples"].to_pandas(),
    }


@pytest.fixture(scope="module")
def oracle_out(small_corpus):
    return run_oracle(small_corpus)


def _edge_key(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["subj_qid", "pred", "obj_qid"]).reset_index(drop=True)


def test_edges_match_oracle_exactly(graph, oracle_out):
    got = _edge_key(graph["edges"])[["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]]
    exp = _edge_key(oracle_out["edges"])[["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_triples_match_oracle_exactly(graph, oracle_out):
    cols = ["doc_id", "h_idx", "t_idx", "subj_qid", "pred", "obj_qid", "score"]
    got = graph["triples"][cols].sort_values(cols).reset_index(drop=True)
    exp = oracle_out["triples"][cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_nodes_match_oracle(graph, oracle_out):
    got = graph["nodes"].sort_values("qid").reset_index(drop=True)
    exp = oracle_out["nodes"].sort_values("qid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["qid", "label", "n_docs", "n_mentions"]],
        exp[["qid", "label", "n_docs", "n_mentions"]],
        check_dtype=False,
    )
    gv = np.stack(got["vec"].map(np.asarray))
    ev = np.stack(exp["vec"].map(np.asarray))
    np.testing.assert_allclose(gv, ev, rtol=0, atol=1e-12)


def test_pr_gate_vs_planted_gold(graph, small_corpus):
    gold = pq.read_table(f"{small_corpus}/gold_triples.parquet").to_pandas()
    gold_set = {(r.subj_qid, r.pred, r.obj_qid) for r in gold.itertuples()}
    pred_set = {
        (r.subj_qid, r.pred, r.obj_qid) for r in graph["edges"].itertuples()
    }
    p, r, f1 = precision_recall(pred_set, gold_set)
    assert p >= 0.95, f"precision {p:.4f}"
    assert r >= 0.95, f"recall {r:.4f}"


def test_deterministic_across_runs(ray_session, small_corpus, graph):
    g2 = build_graph(small_corpus, concurrency=3)
    e2 = _edge_key(g2["edges"].to_pandas())
    e1 = _edge_key(graph["edges"])
    pd.testing.assert_frame_equal(
        e1[["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]],
        e2[["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]],
        check_dtype=False,
    )


def test_no_self_loops_no_eq_preds(graph):
    e = graph["edges"]
    assert (e["subj_qid"] != e["obj_qid"]).all()
    assert (e["pred"] != "P_eq").all()
    assert not e["subj_qid"].str.startswith("NT").any()


def test_dwie_profile_caps_bind(ray_session, tmp_path):
    """The DWIE corpus shape (1800-word docs, >100-entity docs) runs
    end-to-end and the profile's entity budget actually binds: no
    triple references an entity past max_entity_size, while the same
    docs DO carry entities past it."""
    import duckdb

    from kire_ray.config import DWIE
    from kire_ray.pipelines.kg_construct import (
        KGContext,
        extract_triples,
        linked_documents,
        read_transcripts,
    )
    from kire_ray.sources.synth import SynthConfig, write_corpus

    corpus = write_corpus(
        str(tmp_path / "dwie"),
        SynthConfig(n_convs=60, seed=77, ent_hi=110, long_convs_every=3, long_turns=310),
    )
    ge = pq.read_table(f"{corpus}/gold_entities.parquet").to_pandas()
    assert (ge["ent_idx"] >= DWIE.max_entity_size).any(), "corpus must exceed the cap"
    n_long = duckdb.sql(
        f"""SELECT count(*) FROM (
              SELECT conv_id, sum(len(string_split(text,' '))) nw
              FROM read_parquet('{corpus}/transcripts.parquet/*.parquet')
              GROUP BY conv_id) WHERE nw > {DWIE.max_len}"""
    ).fetchone()[0]
    assert n_long >= 1, "corpus must exceed the 1800-word window cap"

    ctx = KGContext.from_corpus(corpus)
    linked = linked_documents(read_transcripts(corpus), ctx).materialize()
    t = extract_triples(linked, ctx, profile=DWIE).to_pandas()
    assert len(t) > 0
    assert int(max(t["h_idx"].max(), t["t_idx"].max())) < DWIE.max_entity_size
    # the DOCRED budget (42) would prune more: the caps are real knobs
    t42 = extract_triples(linked, ctx).to_pandas()
    assert len(t42) < len(t)
