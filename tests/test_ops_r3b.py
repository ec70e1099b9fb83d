"""Round-3 continued batch (rolling window mean, grouped z-score
anomalies, hopping windows, Gopher top-n-gram fractions) vs their
DuckDB oracles at sf0.001."""

import duckdb
import pandas as pd

from kire_ray.pipelines import temporal as T
from kire_ray.pipelines import text_analysis as TA

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ["events", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _cmp(ray_ds, query_name, sort_cols):
    import __ray_entry__ as E

    exp = _duck().execute(E.oracle_sql()[query_name]).fetchdf()
    got = ray_ds.to_pandas()
    got = got[exp.columns.tolist()].sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9, rtol=0)


def test_events_rolling_mean(ray_session):
    _cmp(T.events_rolling_mean(SF), "events_rolling_mean", ["event_id"])


def test_events_anomaly_zscore(ray_session):
    got = T.events_anomaly_zscore(SF)
    _cmp(got, "events_anomaly_zscore", ["event_id"])
    assert len(got.to_pandas()) > 0


def test_hopping_window_counts(ray_session):
    got = T.hopping_window_counts(SF).to_pandas()
    _cmp(T.hopping_window_counts(SF), "hopping_window_counts", ["win_start"])
    # every event lands in exactly win/hop = 2 windows
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert got["n"].sum() == 2 * len(ev)


def test_top_ngram_fracs(ray_session):
    got = TA.top_ngram_fracs(SF)
    _cmp(got, "repetition_top_ngrams", ["doc_id"])
    df = got.to_pandas()
    assert (df["top2_frac"] > 0).all()
    # a repeated 4-gram implies at least as many repeats of its leading
    # 2-gram (raw counts, not fractions — the denominators differ)
    assert (df["top2_frac"] * (df["n_words"] - 1).clip(lower=1)).ge(
        df["top4_frac"] * (df["n_words"] - 3).clip(lower=1) - 1e-3
    ).all()  # 1e-3: fractions are 6dp-rounded, counts reconstruct ±n·5e-7


def test_dsir_weights(ray_session):
    from kire_ray.pipelines.sampling import dsir_weights

    got = dsir_weights(SF)
    _cmp(got, "dsir_weights", ["doc_id"])
    df = got.to_pandas().merge(
        pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "lang"]],
        on="doc_id",
    )
    # the importance weight must actually rank the target domain first
    en = df.loc[df["lang"] == "en", "dsir_logw"].mean()
    rest = df.loc[df["lang"] != "en", "dsir_logw"].mean()
    assert en > rest


def test_ccnet_buckets(ray_session):
    from kire_ray.pipelines.text_analysis import ccnet_buckets

    got = ccnet_buckets(SF)
    _cmp(got, "ccnet_buckets", ["doc_id"])
    df = got.to_pandas()
    # terciles are near-equal per language (threshold ties go upward)
    for lang, grp in df.groupby("lang"):
        vc = grp["bucket"].value_counts()
        assert set(vc.index) == {"head", "middle", "tail"}
        assert vc.max() - vc.min() <= max(3, len(grp) // 10)
    # head really is the low-perplexity (high log-prob) end, per lang
    for lang, grp in df.groupby("lang"):
        assert (
            grp.loc[grp["bucket"] == "head", "mean_logprob"].min()
            >= grp.loc[grp["bucket"] == "tail", "mean_logprob"].max() - 1e-3
        )  # 1e-3: buckets cut on the 3dp-quantized score
