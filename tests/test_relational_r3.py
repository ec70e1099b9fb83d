"""Round-3 late TPC-H shapes (q18/q22/q17/q7/q13) vs DuckDB at
sf0.001, plus the forced distributed-join fallback paths that the
driver's broadcast-sized run never exercises."""

import duckdb
import pandas as pd

from kire_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"
TABLES = ["orders", "lineitem", "customer", "supplier", "nation", "part", "region"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
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


def test_q18_large_volume(ray_session):
    _cmp(
        R.q18_large_volume_customers(SF),
        "q18_large_volume_customers",
        ["o_orderkey"],
    )


def test_q22_dormant_customers(ray_session):
    _cmp(R.q22_dormant_customers(SF), "q22_dormant_customers", ["cntry"])


def test_q17_small_quantity_and_join_fallback(ray_session):
    a = R.q17_small_quantity_revenue(SF).to_pandas()
    # broadcast_limit=0 forces the distributed hash-join prune path
    b = R.q17_small_quantity_revenue(SF, broadcast_limit=0).to_pandas()
    assert a["avg_yearly"].iloc[0] == b["avg_yearly"].iloc[0]
    _cmp(R.q17_small_quantity_revenue(SF), "q17_small_quantity_revenue", [])


def test_q7_volume_shipping_and_join_fallback(ray_session):
    keys = ["supp_nation", "cust_nation", "l_year"]
    a = (
        R.q7_volume_shipping(SF)
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    # force the no-driver-map plan: both nation attaches become hash joins
    b = (
        R.q7_volume_shipping(SF, broadcast_limit=0)
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    _cmp(R.q7_volume_shipping(SF), "q7_volume_shipping", keys)


def test_q13_order_count_distribution(ray_session):
    out = R.q13_order_count_distribution(SF)
    _cmp(out, "q13_order_count_distribution", ["c_count"])
    # the LEFT-OUTER zero bucket must actually appear (status filter
    # guarantees unmatched customers at every synthetic scale)
    got = R.q13_order_count_distribution(SF).to_pandas()
    assert (got["c_count"] == 0).any()


def test_q8_market_share_and_fallback(ray_session):
    a = (
        R.q8_market_share(SF)
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    b = (
        R.q8_market_share(SF, broadcast_limit=0)
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert ((a["mkt_share_pct"] >= 0) & (a["mkt_share_pct"] <= 100)).all()
    _cmp(R.q8_market_share(SF), "q8_market_share", ["o_year"])


def test_q9_product_type_profit_and_fallback(ray_session):
    keys = ["nation", "o_year"]
    a = R.q9_product_type_profit(SF).to_pandas().sort_values(keys).reset_index(drop=True)
    b = (
        R.q9_product_type_profit(SF, broadcast_limit=0)
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    _cmp(R.q9_product_type_profit(SF), "q9_product_type_profit", keys)


def test_q15_top_supplier(ray_session):
    _cmp(R.q15_top_supplier(SF), "q15_top_supplier", ["s_suppkey"])
    got = R.q15_top_supplier(SF).to_pandas()
    assert len(got) >= 1  # at least one winner; ties all included
