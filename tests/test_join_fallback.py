"""Size-thresholded broadcast→hash-join fallback (q3/q5) and the
k-row-bounded q10 name lookup: both plans must produce identical rows,
and the threshold must actually steer the plan (hash_join call count).
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

    # relational.py imports hash_join inside the function bodies from
    # kire_ray.stages.joins, so patching the module attr is enough
    monkeypatch.setattr(J, "hash_join", counted)
    return calls


def test_q5_paths_equal(ray_session, count_joins):
    want = _df(R.q5_local_supplier_revenue(SF))
    n_broadcast = len(count_joins)
    got = _df(R.q5_local_supplier_revenue(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    # broadcast plan: 1 fact⋈fact join; join plan adds the two dim joins
    assert n_broadcast == 1 and n_joined == 3


def test_q3_paths_equal(ray_session, count_joins):
    want = _df(R.q3_shipping_priority(SF))
    n_broadcast = len(count_joins)
    got = _df(R.q3_shipping_priority(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 1 and n_joined == 2


def test_q10_lookup_bounded(ray_session, monkeypatch):
    """q10's post-top-k customer lookup must read k-row-bounded data:
    the filtered read returns exactly the top-k custkeys, never the
    whole customer table."""
    import pyarrow.dataset as pads

    seen = {}
    orig = pads.dataset

    class Spy:
        def __init__(self, d):
            self._d = d

        def to_table(self, *aa, **kk):
            t = self._d.to_table(*aa, **kk)
            seen["rows"] = t.num_rows
            return t

        def __getattr__(self, name):
            return getattr(self._d, name)

    def spying(*a, **k):
        d = orig(*a, **k)
        if "customer" in str(a[0]):
            seen["path"] = str(a[0])
            return Spy(d)
        return d

    monkeypatch.setattr(pads, "dataset", spying)
    out = R.q10_returned_items(SF, top=7).to_pandas()
    assert len(out) == 7
    assert seen["rows"] == 7  # one row per surviving custkey
    assert list(out.columns) == ["c_custkey", "c_name", "n_name", "revenue"]
    # deterministic order: revenue desc, custkey asc
    assert (out["revenue"].to_numpy()[:-1] >= out["revenue"].to_numpy()[1:]).all()


@pytest.mark.parametrize(
    "fn,n_hash_joins",
    [
        (R.top_parts_by_revenue, 1),
        (R.customer_order_totals, 1),
        (R.top_orders_per_segment, 1),
        (R.part_brand_stats, 1),
    ],
)
def test_round1_dim_joins_paths_equal(ray_session, count_joins, fn, n_hash_joins):
    """The four round-1 queries retrofitted with the size-thresholded
    broadcast→hash-join switch (_dim_join): forced-fallback plan must be
    bit-equal to the broadcast plan and actually take the join path."""
    want = _df(fn(SF))
    n_broadcast = len(count_joins)
    got = _df(fn(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 0 and n_joined == n_hash_joins


def test_customers_without_orders_paths_equal(ray_session, count_joins):
    """Anti-join: distributed distinct key-set + broadcast under the
    limit; left-outer hash join + null filter above it — bit-equal."""
    want = _df(R.customers_without_orders(SF))
    n_broadcast = len(count_joins)
    got = _df(R.customers_without_orders(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 0 and n_joined == 1


def test_customers_without_orders_no_driver_fact_read(ray_session, monkeypatch):
    """The orders fact table must never be driver-materialized: the
    key-set build goes through a distributed distinct exchange."""
    import pyarrow.parquet as _pq

    orig = _pq.read_table

    def spying(path, *a, **k):
        assert "orders" not in str(path), "driver read of the orders fact table"
        return orig(path, *a, **k)

    monkeypatch.setattr(R.pq, "read_table", spying)
    out = R.customers_without_orders(SF).to_pandas()
    assert len(out) > 0


def test_suppliers_with_lineitems_paths_equal(ray_session, count_joins):
    """Semi-join: distributed distinct + broadcast under the limit;
    hash semi-join above it — bit-equal."""
    want = _df(R.suppliers_with_lineitems(SF))
    n_broadcast = len(count_joins)
    got = _df(R.suppliers_with_lineitems(SF, broadcast_limit=0))
    n_joined = len(count_joins) - n_broadcast
    pd.testing.assert_frame_equal(got, want)
    assert n_broadcast == 0 and n_joined == 1


def test_docsim_norm_paths_equal(ray_session):
    """docsim_cosine's norm attach: broadcast map under the limit,
    bucketed hash joins above — bit-equal outputs."""
    import numpy as np

    from kire_ray.pipelines.similarity import docsim_cosine

    import ray as _ray

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, 12)) for _ in range(40)
            ],
        }
    )
    ds = _ray.data.from_pandas(docs).repartition(4)
    a = docsim_cosine(ds, ngram=2, min_df=2, max_df=30, threshold=0.05).to_pandas()
    b = docsim_cosine(
        ds, ngram=2, min_df=2, max_df=30, threshold=0.05, broadcast_limit=0
    ).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
