"""Round-3 continued batch: frequent_itemsets (Apriori 2-itemset
rules) vs its DuckDB oracle at sf0.001, and the t-digest quantile
sketch (rank-error bound + merge-order invariance — float-iterative,
rows-only at the driver)."""

import duckdb
import numpy as np
import pandas as pd

from kire_ray.pipelines.relational import frequent_itemsets
from kire_ray.pipelines.sketches import tdigest_quantiles

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ["lineitem", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_frequent_itemsets_vs_oracle(ray_session):
    import __ray_entry__ as E

    exp = _duck().execute(E.oracle_sql()["frequent_itemsets"]).fetchdf()
    got = frequent_itemsets(SF).to_pandas()
    assert len(got) == len(exp) and len(got) > 100
    key = ["part_a", "part_b"]
    got = got[exp.columns.tolist()].sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=0, rtol=0)
    # rule sanity: confidence and support in (0, 1], lift positive
    assert got["support"].between(0, 1).all()
    assert got["conf_a_b"].between(0, 1).all()
    assert got["conf_b_a"].between(0, 1).all()
    assert (got["lift"] > 0).all()


def test_tdigest_rank_error(ray_session):
    import ray

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["value"])
    got = tdigest_quantiles(ev, "value").to_pandas()
    vals = np.sort(pd.read_parquet(f"{SF}/events.parquet")["value"].to_numpy())
    n = len(vals)
    for q, est in zip(got["q"], got["est"]):
        # rank of the estimate must sit within 2% of the target rank
        lo = np.searchsorted(vals, est, side="left") / n
        hi = np.searchsorted(vals, est, side="right") / n
        assert lo - 0.02 <= q <= hi + 0.02, (q, est, lo, hi)
    # estimates are monotone in q and inside the value range
    assert (np.diff(got["est"].to_numpy()) >= 0).all()
    assert got["est"].iloc[0] >= vals[0] and got["est"].iloc[-1] <= vals[-1]


def test_tdigest_partitioning_invariance(ray_session):
    """The digest merge is order-independent (partials sorted before
    every merge), so different partition counts must land within the
    sketch's own error bound of each other."""
    import ray

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["value"])
    a = tdigest_quantiles(ev, "value", num_partitions=4).to_pandas()
    b = tdigest_quantiles(ev, "value", num_partitions=32).to_pandas()
    vals = np.sort(pd.read_parquet(f"{SF}/events.parquet")["value"].to_numpy())
    n = len(vals)
    ra = np.searchsorted(vals, a["est"].to_numpy()) / n
    rb = np.searchsorted(vals, b["est"].to_numpy()) / n
    assert np.abs(ra - rb).max() <= 0.02
