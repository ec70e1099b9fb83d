"""Round-2 relational operators vs DuckDB at sf0.001 (the driver's
sf0.01 oracle compare covers the same SQL; this keeps the check in
pytest)."""

import duckdb
import pandas as pd
import pytest

from kire_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ["orders", "lineitem", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _cmp(ray_df, sql, sort_cols):
    exp = _duck().execute(sql).fetchdf()
    got = ray_df[exp.columns.tolist()].sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9, rtol=0)


def test_events_asof_join(ray_session):
    _cmp(
        R.events_asof_join(SF).to_pandas(),
        """
        WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS tus
                   FROM events WHERE event_type = 'purchase'),
             v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS tus
                   FROM events WHERE event_type = 'view'),
             j AS (SELECT p.purchase_id, p.user_id, v.view_id,
                          (p.tus - v.tus) // 1000000 AS gap_s,
                          row_number() OVER (PARTITION BY p.purchase_id
                                             ORDER BY v.tus DESC, v.view_id DESC) rn
                   FROM p JOIN v ON p.user_id = v.user_id AND v.tus <= p.tus)
        SELECT purchase_id, user_id, view_id, gap_s FROM j WHERE rn = 1
        """,
        ["purchase_id"],
    )


def test_orders_lineitem_range_join(ray_session):
    _cmp(
        R.orders_lineitem_range_join(SF).to_pandas(),
        """
        SELECT o.o_orderkey, count(*) AS n_shipped, sum(l.l_quantity) AS sum_qty
        FROM orders o JOIN lineitem l
          ON epoch_us(l.l_shipdate) // 86400000000
                 >= epoch_us(o.o_orderdate) // 86400000000
         AND epoch_us(l.l_shipdate) // 86400000000
                 < epoch_us(o.o_orderdate) // 86400000000 + 7
        GROUP BY o.o_orderkey
        """,
        ["o_orderkey"],
    )


def test_events_rolling_avg(ray_session):
    _cmp(
        R.events_rolling_avg(SF).to_pandas(),
        """
        SELECT event_id, user_id,
               floor(avg(value) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id
                                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                     * 1000000 + 0.501) / 1000000 AS rolling_avg
        FROM events
        """,
        ["event_id"],
    )


def test_events_distinct_users_and_quantiles(ray_session):
    _cmp(
        R.events_distinct_users(SF).to_pandas(),
        """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
           FROM events GROUP BY event_type""",
        ["event_type"],
    )
    _cmp(
        R.orders_status_quantiles(SF).to_pandas(),
        """SELECT o_orderstatus, 0.5 AS q, quantile_disc(o_totalprice, 0.5) AS value
           FROM orders GROUP BY o_orderstatus
           UNION ALL
           SELECT o_orderstatus, 0.9, quantile_disc(o_totalprice, 0.9)
           FROM orders GROUP BY o_orderstatus""",
        ["o_orderstatus", "q"],
    )


def test_events_regression_vs_polyfit(ray_session):
    """Distributed moment OLS must agree with numpy's least-squares fit
    (independent algorithm: lstsq on the design matrix, not moments)."""
    import numpy as np

    got = R.events_regression(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    base = pd.Timestamp("2024-01-01")
    ev["x"] = (ev["ts"] - base).dt.total_seconds() / 3600.0
    for t, grp in ev.groupby("event_type"):
        slope, icept = np.polyfit(grp["x"], grp["value"], 1)
        r = np.corrcoef(grp["x"], grp["value"])[0, 1]
        row = got.loc[t]
        assert row["n"] == len(grp)
        assert abs(row["slope"] - slope) < 1e-5
        assert abs(row["intercept"] - icept) < 1e-4
        assert abs(row["r"] - r) < 1e-5


def test_running_totals_and_ntile(ray_session):
    from kire_ray.pipelines.temporal import events_ntile, running_totals

    _cmp(
        running_totals(SF).to_pandas(),
        """SELECT event_id, user_id,
                  floor(sum(value) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                        * 1000000 + 0.501) / 1000000 AS running_total
           FROM events""",
        ["event_id"],
    )
    _cmp(
        events_ntile(SF).to_pandas(),
        """SELECT event_id, event_type,
                  CAST(ntile(10) OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS BIGINT)
                  AS bucket
           FROM events""",
        ["event_id"],
    )


def test_event_hour_pmi(ray_session):
    """PMI sanity: sums reproduce the corpus and cells match an
    independently-computed pandas contingency."""
    import numpy as np

    got = R.event_hour_pmi(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert got["n"].sum() == len(ev)
    ct = ev.groupby([ev["event_type"], ev["ts"].dt.hour]).size()
    t = float(len(ev))
    for _, r in got.head(20).iterrows():
        n = ct.loc[(r["event_type"], r["hour"])]
        assert n == r["n"]
        nx = ct.groupby(level=0).sum().loc[r["event_type"]]
        ny = ct.groupby(level=1).sum().loc[r["hour"]]
        assert abs(r["pmi"] - np.log(n * t / (nx * ny))) < 1e-5


def test_q3_and_corr(ray_session):
    _cmp(
        R.q3_shipping_priority(SF).to_pandas(),
        """WITH r AS (
             SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                    sum(l.l_extendedprice * (1.0 - l.l_discount)) AS rev
             FROM lineitem l
             JOIN orders o ON l.l_orderkey = o.o_orderkey
             JOIN (SELECT * FROM read_parquet('{sf}/customer.parquet')) c
               ON c.c_custkey = o.o_custkey
             WHERE c.c_mktsegment = 'BUILDING'
               AND o.o_orderdate < DATE '1998-06-01'
               AND l.l_shipdate > DATE '1998-06-01'
             GROUP BY 1, 2, 3)
           SELECT o_orderkey, o_orderdate, o_orderpriority,
                  floor(rev * 1000000 + 0.501) / 1000000 AS revenue
           FROM r ORDER BY rev DESC, o_orderdate, o_orderkey LIMIT 10""".format(sf=SF),
        ["o_orderkey"],
    )
    # corr vs pandas (independent implementation)
    got = R.lineitem_corr(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for _, r in got.iterrows():
        want = li[r["col_a"]].corr(li[r["col_b"]])
        assert abs(r["corr"] - want) < 1e-6
        assert r["n"] == len(li)


def test_events_mad_vs_numpy(ray_session):
    """Discrete median/MAD vs an independent numpy order-statistic
    computation (k = ceil(n/2) in ascending order)."""
    import numpy as np

    got = R.events_mad(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for t, grp in ev.groupby("event_type"):
        x = np.sort(grp["value"].to_numpy())
        med = x[int(np.ceil(0.5 * len(x))) - 1]
        d = np.sort(np.abs(grp["value"].to_numpy() - med))
        mad = d[int(np.ceil(0.5 * len(d))) - 1]
        r = got.loc[t]
        assert r["n"] == len(x)
        assert r["median"] == med
        assert r["mad"] == mad


def test_events_ab_test_and_gram(ray_session):
    """z-test vs an independent statsmodels-style computation; Gram vs
    a direct numpy matmul over the whole table."""
    import numpy as np

    got = R.events_ab_test(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    we = ev["ts"].dt.dayofweek >= 5
    conv = ev["value"] > 100.0
    for t, grp in ev.groupby("event_type"):
        m = ev["event_type"] == t
        n1, x1 = int((we & m).sum()), int((we & m & conv).sum())
        n2, x2 = int((~we & m).sum()), int((~we & m & conv).sum())
        p1, p2, pp = x1 / n1, x2 / n2, (x1 + x2) / (n1 + n2)
        z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
        r = got.loc[t]
        assert (r["n_weekend"], r["n_weekday"]) == (n1, n2)
        assert abs(r["z"] - z) < 1e-5

    from kire_ray.pipelines.similarity import embedding_gram
    import ray.data

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    G = X.T @ X
    gram = embedding_gram(
        ray.data.from_pandas(emb[["vec_id", "embedding"]]).repartition(4)
    ).to_pandas()
    for _, r in gram.head(50).iterrows():
        assert abs(r["dot"] - G[int(r["dim_a"]) - 1, int(r["dim_b"]) - 1]) < 1e-5
        assert r["n"] == len(X)


def test_events_quantile_cont_vs_numpy(ray_session):
    """Interpolated quantiles vs numpy's 'linear' method (the same
    (n-1)q definition, independently implemented)."""
    import numpy as np

    got = R.events_quantile_cont(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for (t, q), grp in got.groupby(["event_type", "q"]):
        want = np.quantile(
            ev.loc[ev["event_type"] == t, "value"].to_numpy(), q, method="linear"
        )
        assert abs(grp["value"].iloc[0] - want) < 1e-5, (t, q)


def test_wow_change_and_nb_classifier(ray_session):
    import numpy as np

    got = (
        R.events_wow_change(SF)
        .to_pandas()
        .sort_values(["event_type", "wk"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["wk"] = ev["ts"].astype("int64") // 604_800_000_000
    w = (
        ev.groupby(["event_type", "wk"])["value"]
        .agg(["sum", "size"])
        .reset_index()
        .sort_values(["event_type", "wk"])
        .reset_index(drop=True)
    )
    assert (got["n"].to_numpy() == w["size"].to_numpy()).all()
    prev = w.groupby("event_type")["sum"].shift(1)
    pct = ((w["sum"] - prev) / prev).fillna(0.0)
    assert np.abs(got["pct_change"].to_numpy() - pct.to_numpy()).max() < 1e-5

    # NB classifier: deterministic, self-consistent, beats random
    from kire_ray.pipelines.text_analysis import nb_source_classifier
    import ray.data

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ds = ray.data.from_pandas(docs[["doc_id", "text", "source"]]).repartition(4)
    out = nb_source_classifier(ds).to_pandas().sort_values("doc_id")
    out2 = nb_source_classifier(ds).to_pandas().sort_values("doc_id")
    assert (out["predicted"].to_numpy() == out2["predicted"].to_numpy()).all()
    assert (out["correct"] == (out["actual"] == out["predicted"])).all()
    n_src = docs["source"].nunique()
    assert out["correct"].mean() > 1.0 / n_src  # better than chance


def test_q6_q14_q4_shapes(ray_session):
    """Round-3 TPC-H additions: value sanity + the q14 broadcast/join
    path equivalence (the q3/q5 threshold pattern)."""
    from kire_ray.pipelines.relational import (
        q4_order_priority,
        q6_forecast_revenue,
        q14_promo_revenue,
    )

    sf = "/root/testdata/sf0.001"
    q6 = q6_forecast_revenue(sf).to_pandas()
    assert len(q6) == 1 and q6.revenue.iloc[0] >= 0 and q6.n_items.iloc[0] >= 0
    a = q14_promo_revenue(sf).to_pandas()
    b = q14_promo_revenue(sf, broadcast_limit=0).to_pandas()  # force hash join
    assert a.promo_share_pct.iloc[0] == b.promo_share_pct.iloc[0]
    assert a.total_revenue.iloc[0] == b.total_revenue.iloc[0]
    assert 0.0 <= a.promo_share_pct.iloc[0] <= 100.0
    q4 = q4_order_priority(sf).to_pandas()
    assert (q4.order_count > 0).all()
