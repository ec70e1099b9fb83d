"""Rollup / pivot / resample / funnel invariants at sf0.001 (the
driver's sf0.01 DuckDB compare verifies exact values; these pin the
cross-level consistency the SQL can't see)."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_orders_rollup_levels_consistent(ray_session):
    from kire_ray.pipelines.relational import orders_rollup

    out = orders_rollup(SF).to_pandas()
    fine = out[(out.o_orderstatus != "(all)") & (out.o_orderpriority != "(all)")]
    lvl1 = out[(out.o_orderstatus != "(all)") & (out.o_orderpriority == "(all)")]
    lvl0 = out[(out.o_orderstatus == "(all)") & (out.o_orderpriority == "(all)")]
    assert len(lvl0) == 1
    assert lvl0["n_orders"].iloc[0] == fine["n_orders"].sum()
    per_status = fine.groupby("o_orderstatus")["n_orders"].sum()
    got = lvl1.set_index("o_orderstatus")["n_orders"]
    pd.testing.assert_series_equal(
        got.sort_index(), per_status.sort_index(), check_names=False
    )


def test_pivot_matches_rollup(ray_session):
    from kire_ray.pipelines.relational import (
        orders_rollup,
        status_priority_pivot,
    )

    piv = status_priority_pivot(SF).to_pandas().set_index("o_orderstatus")
    roll = orders_rollup(SF).to_pandas()
    lvl1 = roll[
        (roll.o_orderstatus != "(all)") & (roll.o_orderpriority == "(all)")
    ].set_index("o_orderstatus")
    ncols = [c for c in piv.columns if c.startswith("n_")]
    # pivot row sums == per-status rollup counts
    pd.testing.assert_series_equal(
        piv[ncols].sum(axis=1).sort_index(),
        lvl1["n_orders"].sort_index(),
        check_names=False,
        check_dtype=False,
    )


def test_events_resampled_grid(ray_session):
    from kire_ray.pipelines.relational import (
        events_resampled,
        events_tumbling_window,
    )

    out = events_resampled(SF).to_pandas()
    agg = events_tumbling_window(SF).to_pandas()
    lo, hi = agg["window_start"].min(), agg["window_start"].max()
    n_hours = (hi - lo) // 3600 + 1
    # complete rectangular grid: every type × every hour, no dupes
    assert len(out) == out["event_type"].nunique() * n_hours
    assert not out.duplicated(["event_type", "window_start"]).any()
    # zero-filled rows exist and non-zero rows match the tumbling agg
    merged = out.merge(
        agg, on=["event_type", "window_start"], how="left", suffixes=("", "_agg")
    )
    filled = merged["n_events_agg"].isna()
    assert (merged.loc[filled, "n_events"] == 0).all()
    assert (merged.loc[filled, "sum_value"] == 0.0).all()
    nz = ~filled
    assert (merged.loc[nz, "n_events"] == merged.loc[nz, "n_events_agg"]).all()


def test_user_funnel_monotone(ray_session):
    from kire_ray.pipelines.relational import user_funnel

    f = user_funnel(SF).to_pandas().iloc[0]
    assert f["n_view"] >= f["n_view_click"] >= f["n_view_click_purchase"] >= 0
    assert f["n_view"] > 0


def test_orders_cube_vs_duckdb(ray_session):
    """CUBE must equal DuckDB's native GROUP BY CUBE with coalesced
    labels (independent construction from the UNION-ALL oracle)."""
    import duckdb
    import pandas as pd

    from kire_ray.pipelines.relational import orders_cube

    SF = "/root/testdata/sf0.001"
    got = (
        orders_cube(SF)
        .to_pandas()
        .sort_values(["o_orderstatus", "o_orderpriority"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
                   coalesce(o_orderpriority, '(all)') AS o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   floor(sum(o_totalprice) * 100 + 0.501) / 100 AS total_price
            FROM read_parquet('{SF}/orders.parquet')
            GROUP BY CUBE (o_orderstatus, o_orderpriority)"""
    ).fetchdf().sort_values(["o_orderstatus", "o_orderpriority"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_moments_vs_scipy_style(ray_session):
    """Moments vs pandas' independent two-pass implementation."""
    import numpy as np
    import pandas as pd

    from kire_ray.pipelines.relational import events_moments

    SF = "/root/testdata/sf0.001"
    got = events_moments(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for t, grp in ev.groupby("event_type"):
        x = grp["value"].to_numpy()
        c = x - x.mean()
        m2, m3, m4 = (c**2).mean(), (c**3).mean(), (c**4).mean()
        r = got.loc[t]
        assert r["n"] == len(x)
        assert abs(r["var_pop"] - m2) < 1e-4
        assert abs(r["skewness"] - m3 / m2**1.5) < 1e-5
        assert abs(r["kurtosis_excess"] - (m4 / m2**2 - 3)) < 1e-5
