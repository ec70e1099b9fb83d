"""The round-3 TPC-H completions (q2/q11/q12/q16/q19/q20/q21 shapes,
closing out all 22): forced-fallback path equality for every
size-thresholded plan, plus value checks of the tagged-exchange shapes
against sequential pandas oracles.
"""

import numpy as np
import pandas as pd
import pytest

import kire_ray.pipelines.relational as R
import kire_ray.stages.joins as J

SF = "/root/testdata/sf0.001"


def _df(ds):
    out = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.fixture
def count_joins(monkeypatch):
    calls = []
    orig = J.hash_join

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(J, "hash_join", counted)
    return calls


def test_q19_paths_equal(ray_session, count_joins):
    want = _df(R.q19_discounted_revenue(SF))
    n_broadcast = len(count_joins)
    got = _df(R.q19_discounted_revenue(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 0 and n_joined == 1
    assert float(want["revenue"].iloc[0]) > 0.0


def test_q2_paths_equal(ray_session, count_joins):
    want = _df(R.q2_min_cost_supplier(SF))
    n_broadcast = len(count_joins)
    got = _df(R.q2_min_cost_supplier(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    # join plan swaps both the supplier-attr and part-attr broadcasts
    assert n_broadcast == 0 and n_joined == 2
    assert len(want) > 0
    # every part's winner carries that part's min acctbal (ties all kept)
    m = want.groupby("p_partkey")["s_acctbal"].transform("min")
    assert (want["s_acctbal"].to_numpy() == m.to_numpy()).all()


def test_q11_paths_equal(ray_session, count_joins):
    want = _df(R.q11_important_stock(SF))
    n_broadcast = len(count_joins)
    got = _df(R.q11_important_stock(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 0 and n_joined == 1
    # the qualifying set is 1/frac-bounded by construction
    assert 0 < len(want) <= 1000


def test_q16_paths_equal(ray_session, count_joins):
    want = _df(R.q16_supplier_cnt(SF))
    n_broadcast = len(count_joins)
    got = _df(R.q16_supplier_cnt(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    # join plan: part attrs; the NOT-IN anti join short-circuits here
    # (sf0.001 has no negative-balance supplier)
    assert n_broadcast == 0 and n_joined == 1
    assert (want["supplier_cnt"] >= 1).all()


def test_q16_anti_join_engages(ray_session, count_joins):
    """At sf0.01 the complaint set is non-empty, so the forced-fallback
    plan must run BOTH hash joins and still match the broadcast plan."""
    sf = "/root/testdata/sf0.01"
    want = _df(R.q16_supplier_cnt(sf))
    n_broadcast = len(count_joins)
    got = _df(R.q16_supplier_cnt(sf, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 0 and n_joined == 2


def test_q20_paths_equal(ray_session, count_joins):
    want = _df(R.q20_excess_suppliers(SF))
    n_broadcast = len(count_joins)
    got = _df(R.q20_excess_suppliers(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 0 and n_joined == 1
    assert len(want) > 0


def _pandas_q12(sf):
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    o = pd.read_parquet(f"{sf}/orders.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m = m[
        (m["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (m["l_shipdate"] < pd.Timestamp("1998-01-01"))
        & (m["l_shipdate"] > m["o_orderdate"])
    ]
    high = m["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    g = m.assign(h=high).groupby("l_linestatus")["h"]
    return pd.DataFrame(
        {
            "l_linestatus": g.sum().index,
            "high_line_count": g.sum().to_numpy(np.int64),
            "low_line_count": (g.count() - g.sum()).to_numpy(np.int64),
        }
    ).reset_index(drop=True)


def test_q12_vs_pandas(ray_session):
    got = R.q12_shipmode_priority(SF).to_pandas()
    want = _pandas_q12(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    assert got["high_line_count"].sum() > 0


def _pandas_q21(sf):
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    o = pd.read_parquet(f"{sf}/orders.parquet")
    s = pd.read_parquet(f"{sf}/supplier.parquet")
    fkeys = set(o.loc[o["o_orderstatus"] == "F", "o_orderkey"])
    li = li[li["l_orderkey"].isin(fkeys)]
    agg = (
        li.assign(late=(li["l_returnflag"] == "R").astype(int))
        .groupby(["l_orderkey", "l_suppkey"])["late"]
        .sum()
        .reset_index()
    )
    per = agg.groupby("l_orderkey").agg(
        nsupp=("l_suppkey", "size"),
        nlate=("late", lambda x: int((x > 0).sum())),
    )
    qual = per[(per["nsupp"] >= 2) & (per["nlate"] == 1)].index
    late = agg[(agg["late"] > 0) & agg["l_orderkey"].isin(qual)]
    c = late.groupby("l_suppkey")["late"].sum().reset_index()
    c = c.merge(s[["s_suppkey", "s_name"]], left_on="l_suppkey", right_on="s_suppkey")
    c = c.sort_values(["late", "s_name"], ascending=[False, True]).head(100)
    return pd.DataFrame(
        {
            "s_name": c["s_name"].to_numpy(object),
            "numwait": c["late"].to_numpy(np.int64),
        }
    )


def test_q21_vs_pandas(ray_session):
    got = R.q21_waiting_suppliers(SF).to_pandas()
    want = _pandas_q21(SF)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert got["numwait"].sum() > 0
