"""Round-2 late additions: grouped normalization, per-lang vocab,
weighted sampling, inverted-index build (driver oracle covers the same
SQL at sf0.01; these pin the semantics in pytest at tiny scale)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def test_events_zscore_vs_duckdb(ray_session):
    from kire_ray.pipelines.relational import events_zscore

    got = events_zscore(SF).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(
        """
        WITH s AS (SELECT event_type, sum(value) sv, sum(value*value) svv,
                          CAST(count(*) AS DOUBLE) n
                   FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type,
               floor(((e.value - s.sv/s.n)
                      / sqrt(s.svv/s.n - (s.sv/s.n)*(s.sv/s.n))) * 1000000
                     + 0.501) / 1000000 AS zscore
        FROM events e JOIN s USING (event_type)
        ORDER BY e.event_id
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # z-scores standardize: per-type mean ≈ 0, std ≈ 1
    per_type = got.groupby("event_type")["zscore"].agg(["mean", "std"])
    assert (per_type["mean"].abs() < 1e-3).all()
    assert ((per_type["std"] - 1.0).abs() < 0.01).all()


def test_top_words_per_lang_ordering(ray_session):
    from kire_ray.pipelines.text_analysis import top_words_per_lang

    docs = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "de"],
            "text": [
                "a a a b b c",
                "b d",
                "x y",
                "y z",
                "z z q",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    out = (
        top_words_per_lang(ds, k=2)
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    # en: a=3, b=3 -> tie broken word-asc; de: z=3, y=2
    exp = pd.DataFrame(
        {
            "lang": ["de", "de", "en", "en"],
            "word": ["z", "y", "a", "b"],
            "n": [3, 2, 3, 3],
            "rank": [1, 2, 1, 2],
        }
    )
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp, check_dtype=False)


def test_weighted_sample_deterministic_and_monotone(ray_session):
    from kire_ray.pipelines.sampling import weighted_sample

    docs = pd.DataFrame(
        {"doc_id": np.arange(500), "n_chars": np.arange(500) * 10}
    )
    ds = ray.data.from_pandas(docs).repartition(4)
    kept = weighted_sample(ds, cap=2000.0).to_pandas()
    kept2 = weighted_sample(ray.data.from_pandas(docs), cap=2000.0).to_pandas()
    # partitioning-independent decisions
    assert sorted(kept["doc_id"]) == sorted(kept2["doc_id"])
    # weight 1.0 docs (n_chars >= cap) always survive: u < 2^60 is a tautology
    full = docs[docs["n_chars"] >= 2000]["doc_id"]
    assert set(full).issubset(set(kept["doc_id"]))
    # weight 0 docs never survive
    assert 0 not in set(kept["doc_id"])
    # the realized rate tracks the mean weight (law of large numbers, loose)
    w = np.minimum(1.0, docs["n_chars"] / 2000.0)
    assert abs(len(kept) / len(docs) - w.mean()) < 0.1


def test_inverted_index_postings(ray_session):
    from kire_ray.pipelines.similarity import inverted_index

    docs = pd.DataFrame(
        {
            "doc_id": [3, 1, 2],
            "text": ["a b a", "b c", "a c c"],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    out = inverted_index(ds, min_df=1).to_pandas().set_index("word")
    # explicit expectations (postings sorted by doc id, "doc:tf")
    assert out.loc["a", "df"] == 2 and out.loc["a", "postings"] == "2:1,3:2"
    assert out.loc["b", "df"] == 2 and out.loc["b", "postings"] == "1:1,3:1"
    assert out.loc["c", "df"] == 2 and out.loc["c", "postings"] == "1:1,2:2"
    # min_df prunes
    pruned = inverted_index(ds, min_df=3).to_pandas()
    assert len(pruned) == 0
