"""Relational pipelines over the TPC-H-ish test tables.

These exercise the engine's generic operator set (SURVEY.md §2.2–2.7 —
maps, filters, joins, grouped aggregates, sorts, top-k, dedup, windowed
aggregates) with DuckDB-verifiable semantics.  Patterns:

- aggregates are *pre-aggregated* inside ``map_batches`` (partial
  per-batch combine) before the groupby shuffle;
- dimension tables join via broadcast (``stages/joins.py``), fact⋈fact
  via ``Dataset.join``;
- top-k = per-batch partial top-k → tiny global merge, never a full
  sort when k ≪ n;
- event windows = tumbling buckets by ``floor(epoch/size)`` — a plain
  groupby after a vectorized bucket projection (Ray Data has no
  event-time windowing; the bucket column IS the window).

Column names match the oracle SQL in __ray_entry__ exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data

from kire_ray.functions.rounding import round_half_up
from kire_ray.stages.joins import broadcast_join
from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    from kire_ray.sources.parquet import sized_read

    return sized_read(f"{sf_dir}/{table}.parquet", columns)


def _dim_join(
    ds: "ray.data.Dataset",
    sf_dir: str,
    table: str,
    columns: list[str],
    *,
    key_map: dict[str, str],
    how: str = "inner",
    broadcast_limit: int = 1_000_000,
    salt_hot: bool = False,
) -> "ray.data.Dataset":
    """Size-thresholded dimension join (the q14 pattern as a helper):
    under ``broadcast_limit`` rows the dimension table is pandas +
    ``ray.put`` (no shuffle); above it both sides hash-join as
    Datasets.  ``key_map`` renames the dimension's key column(s) to the
    fact side's names — part/customer grow with SF (20M/15M rows at
    SF100), so every SF-scaled lookup must route through this switch.
    ``salt_hot=True`` makes the hash path skew-proof. The dimension's
    row count is ALREADY known here (parquet metadata — the same number
    that failed the broadcast gate), so no extra pass decides the
    strategy: when ``dim_rows × n_salts`` fits ``frag_limit``, the
    skew-OBLIVIOUS ``frag_replicate_join`` runs (probe rows salt by row
    hash, build replicates n_salts× — handles any skew with ZERO
    fact-side detection scans, VERDICT r4 #3); only a build side too
    big to replicate falls back to ``detect_hot_keys`` +
    ``salted_hash_join``, where the one bounded-partial scan is
    amortized against a genuinely huge shuffle."""
    from kire_ray.stages.joins import (
        detect_hot_keys,
        frag_replicate_join,
        hash_join,
        salted_hash_join,
    )

    path = f"{sf_dir}/{table}.parquet"
    on = [key_map.get(c, c) for c in columns if c in key_map]
    dim_rows = _nrows_parquet(path)
    if dim_rows <= broadcast_limit:
        dim = pq.read_table(path, columns=columns).to_pandas().rename(columns=key_map)
        return broadcast_join(ds, dim, on=on, how=how)
    dim_ds = _read(sf_dir, table, columns).map_batches(
        lambda b, _m=key_map: b.rename(columns=_m), batch_format="pandas"
    )
    # pandas merge names → Dataset.join names
    jt = {"left": "left_outer", "right": "right_outer", "outer": "full_outer"}.get(
        how, how
    )
    if salt_hot and len(on) == 1 and jt in ("inner", "left_outer"):
        n_salts, frag_limit = 8, 32_000_000
        if dim_rows * n_salts <= frag_limit:
            return frag_replicate_join(ds, dim_ds, on, n_salts=n_salts, join_type=jt)
        hot = detect_hot_keys(ds, on[0])
        if hot:
            return salted_hash_join(ds, dim_ds, on, hot_keys=hot, join_type=jt)
    return hash_join(ds, dim_ds, on=on, join_type=jt)


def q1_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1 shape: grouped sums over lineitem with a block-local
    combiner (one partial row per key per batch crosses the shuffle)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(revenue=b.l_extendedprice * (1 - b.l_discount))
        g = b.groupby(["l_returnflag", "l_linestatus"], sort=False)
        return g.agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            revenue=("revenue", "sum"),
            sum_disc=("l_discount", "sum"),
            n_rows=("l_quantity", "size"),
        ).reset_index()

    part = ds.map_batches(partial, batch_format="pandas")

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out["sum_base_price"] = round_half_up(out["sum_base_price"], 2)
        out["revenue"] = round_half_up(out["revenue"], 2)
        out["avg_disc"] = round_half_up(out["sum_disc"] / out["n_rows"], 6)
        return out.drop(columns=["sum_disc"])

    return grouped_agg(
        part,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum_qty", "sum"),
            "sum_base_price": ("sum_base_price", "sum"),
            "revenue": ("revenue", "sum"),
            "sum_disc": ("sum_disc", "sum"),
            "n_rows": ("n_rows", "sum"),
        },
        post=post,
    )


def top_parts_by_revenue(
    sf_dir: str, k: int = 10, *, broadcast_limit: int = 1_000_000
) -> "ray.data.Dataset":
    """Join lineitem⋈part (size-thresholded dim lookup) → grouped
    revenue → top-k."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(revenue=b.l_extendedprice * (1 - b.l_discount))
        return (
            b.groupby("l_partkey", sort=False)
            .agg(revenue=("revenue", "sum"))
            .reset_index()
        )

    agg = grouped_agg(
        li.map_batches(partial, batch_format="pandas"),
        ["l_partkey"],
        {"revenue": ("revenue", "sum")},
        post=lambda out: out.assign(revenue=round_half_up(out["revenue"], 2)),
    )
    joined = _dim_join(
        agg,
        sf_dir,
        "part",
        ["p_partkey", "p_name", "p_brand"],
        key_map={"p_partkey": "l_partkey"},
        broadcast_limit=broadcast_limit,
    )
    # global top-k: dataset sort is fine at k rows output; demonstrate
    # sort+limit composition
    return (
        joined.sort(["revenue", "l_partkey"], descending=[True, False])
        .limit(k)
        .map_batches(
            lambda b: b.rename(columns={"l_partkey": "p_partkey"}),
            batch_format="pandas",
        )
    )


def customer_order_totals(
    sf_dir: str, k: int = 20, *, broadcast_limit: int = 1_000_000
) -> "ray.data.Dataset":
    """orders → per-customer totals ⋈ customer (size-thresholded dim
    lookup) → top-k by spend."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("o_custkey", sort=False)
            .agg(total_spend=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
            .reset_index()
        )

    agg = grouped_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        {"total_spend": ("total_spend", "sum"), "n_orders": ("n_orders", "sum")},
        post=lambda out: out.assign(total_spend=round_half_up(out["total_spend"], 2)),
    )
    joined = _dim_join(
        agg,
        sf_dir,
        "customer",
        ["c_custkey", "c_name", "c_mktsegment"],
        key_map={"c_custkey": "o_custkey"},
        broadcast_limit=broadcast_limit,
    )
    return (
        joined.sort(["total_spend", "o_custkey"], descending=[True, False])
        .limit(k)
        .map_batches(
            lambda b: b.rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas",
        )
    )


def supplier_nation_rollup(sf_dir: str) -> "ray.data.Dataset":
    """supplier ⋈ nation ⋈ region (two broadcast dims) → per-region
    supplier account rollup."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    dim = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey", how="inner"
    )[["n_nationkey", "n_name", "r_name"]]
    sup = sup.map_batches(
        lambda b: b.rename(columns={"s_nationkey": "n_nationkey"}), batch_format="pandas"
    )
    joined = broadcast_join(sup, dim, on=["n_nationkey"], how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("r_name", sort=False)
            .agg(n_suppliers=("s_acctbal", "size"), total_acctbal=("s_acctbal", "sum"))
            .reset_index()
        )

    return grouped_agg(
        joined.map_batches(partial, batch_format="pandas"),
        ["r_name"],
        {"n_suppliers": ("n_suppliers", "sum"), "total_acctbal": ("total_acctbal", "sum")},
        post=lambda out: out.assign(total_acctbal=round_half_up(out["total_acctbal"], 2)),
    )


def events_tumbling_window(sf_dir: str, window_s: int = 3600) -> "ray.data.Dataset":
    """Tumbling window per event_type: bucket = floor(epoch/window)."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        epoch = b["ts"].astype("int64") // 10**6
        b = b.assign(window_start=(epoch // window_s) * window_s)
        g = b.groupby(["event_type", "window_start"], sort=False)
        return g.agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        ).reset_index()

    part = ev.map_batches(bucketize, batch_format="pandas")

    return grouped_agg(
        part,
        ["event_type", "window_start"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")},
        post=lambda out: out.assign(sum_value=round_half_up(out["sum_value"], 2)),
    )


def sessionize_events(sf_dir: str, gap_s: int = 1800) -> "ray.data.Dataset":
    """Session windows per user (gap > gap_s starts a new session) —
    groupby(user).map_groups over ts-sorted events, the engine's
    streaming-shaped pattern (ordering assumption: ts sorted within
    user group, enforced inside the group fn)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def sessions_part(part: pd.DataFrame) -> pd.DataFrame:
        # all users of one hash partition at once: session boundary =
        # user change OR gap > gap_s on the (user, ts)-sorted stream
        part = part.sort_values(["user_id", "ts"], kind="stable")
        epoch = part["ts"].astype("int64") // 10**6
        new_user = part["user_id"].ne(part["user_id"].shift())
        gap = epoch.diff().fillna(gap_s + 1) > gap_s
        sid = (new_user | gap).cumsum()
        out = (
            part.assign(session=sid.to_numpy(), epoch=epoch.to_numpy())
            .groupby("session")
            .agg(
                user_id=("user_id", "first"),
                session_start=("epoch", "min"),
                session_end=("epoch", "max"),
                n_events=("value", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["sum_value"] = round_half_up(out["sum_value"], 2)
        return out

    return partitioned_map_groups(ev, ["user_id"], sessions_part)


def events_gap_buckets(sf_dir: str) -> "ray.data.Dataset":
    """dis2idx log2 distance bucketing (kg_data_loader.py:62-72, the
    ep_dis channel's table) demonstrated SQL-checkably: per-user gaps
    between consecutive events, in minutes, bucketed 0,1,[2,4),[4,8)…
    [256,∞)→9, histogrammed per event_type. Same shape as sessionize:
    one hash exchange on user_id, vectorized per partition."""
    from kire_ray.stages.featurize import dis_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def gaps_part(part: pd.DataFrame) -> pd.DataFrame:
        # sort on the SECOND-resolution epoch with event_type tiebreak —
        # the exact window order the SQL oracle uses (sorting on raw
        # microsecond ts would break same-second ties differently)
        part = part.assign(epoch=part["ts"].astype("int64") // 10**6).sort_values(
            ["user_id", "epoch", "event_type"], kind="stable"
        )
        epoch = part["epoch"]
        same_user = part["user_id"].eq(part["user_id"].shift())
        gap_min = (epoch.diff() // 60).where(same_user)
        keep = part.assign(bucket=dis_bucket(gap_min.fillna(0)))[same_user]
        return (
            keep.groupby(["event_type", "bucket"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    part = partitioned_map_groups(ev, ["user_id"], gaps_part)
    return grouped_agg(
        part,
        ["event_type", "bucket"],
        {"n": ("n", "sum")},
        post=lambda out: out.assign(
            bucket=out["bucket"].astype(np.int64), n=out["n"].astype(np.int64)
        ),
    )


def distinct_order_status(sf_dir: str) -> "ray.data.Dataset":
    """Distinct + count per key (A4-style corpus stats)."""
    ds = _read(sf_dir, "orders", ["o_orderstatus"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_orderstatus", sort=False).size().rename("n").reset_index()

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderstatus"],
        {"n": ("n", "sum")},
    )


def orders_lineitem_join_count(sf_dir: str) -> "ray.data.Dataset":
    """Fact⋈fact hash join (orders⋈lineitem on orderkey) → per-status
    line counts. Demonstrates the shuffle join path on the two largest
    tables."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}), batch_format="pandas"
    )
    from kire_ray.stages.shuffle import default_join_partitions

    # partitions scale with the cluster (at 100 TB: with data volume),
    # never a hard-coded constant
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("o_orderkey",),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("o_orderstatus", sort=False)
            .agg(n_lines=("l_quantity", "size"), sum_qty=("l_quantity", "sum"))
            .reset_index()
        )

    return grouped_agg(
        joined.map_batches(partial, batch_format="pandas"),
        ["o_orderstatus"],
        {"n_lines": ("n_lines", "sum"), "sum_qty": ("sum_qty", "sum")},
        post=lambda out: out.assign(sum_qty=out["sum_qty"].astype(float)),
    )


def filter_high_value_orders(sf_dir: str, min_price: float = 200000.0) -> "ray.data.Dataset":
    """Vectorized row filter (M10 doc-filter shape): open high-value
    orders — a mask inside map_batches, never ds.filter(row_fn)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        return b[(b.o_totalprice > min_price) & (b.o_orderstatus == "O")]

    return ds.map_batches(filt, batch_format="pandas")


def region_nation_union(sf_dir: str) -> "ray.data.Dataset":
    """ds.union of two projected sources (§2.7 union — the reference's
    label-set accumulation, gen_kg_data.py:51-60)."""
    r = _read(sf_dir, "region", ["r_name"]).map_batches(
        lambda b: pd.DataFrame({"name": b.r_name, "src": "region"}), batch_format="pandas"
    )
    n = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda b: pd.DataFrame({"name": b.n_name, "src": "nation"}), batch_format="pandas"
    )
    return r.union(n)


def customers_without_orders(
    sf_dir: str,
    min_price: float = 300000.0,
    *,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """Anti-join (J6 shape: train-fact Ign filter,
    evaluation.py:147-158): customers with no high-value order. The
    qualifying-custkey set is built DISTRIBUTED — vectorized filter +
    per-batch unique + distinct exchange; the orders fact table never
    lands on the driver. Under ``broadcast_limit`` distinct keys the
    (already customer-bounded) set ships once via ``ray.put``; above it
    the anti-join runs as a distributed left-outer hash join + null
    filter, so neither side is ever driver-materialized."""
    from kire_ray.stages.joins import anti_join_broadcast, hash_join

    qual = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda b: pd.DataFrame(
                {"c_custkey": b.loc[b["o_totalprice"] > min_price, "o_custkey"].unique()}
            ),
            batch_format="pandas",
        )
        .groupby("c_custkey")
        .count()
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    if _nrows_parquet(f"{sf_dir}/customer.parquet") <= broadcast_limit:
        keys = set(qual.to_pandas()["c_custkey"])
        return anti_join_broadcast(cust, keys, on="c_custkey")
    marker = qual.map_batches(
        lambda b: pd.DataFrame(
            {"c_custkey": b["c_custkey"].to_numpy(), "_hit": np.ones(len(b), np.int64)}
        ),
        batch_format="pandas",
    )
    def unmatched(b: pd.DataFrame) -> pd.DataFrame:
        if "_hit" not in b.columns:  # schema-less empty join block
            if "c_custkey" not in b.columns:
                return pd.DataFrame(
                    {"c_custkey": pd.Series([], dtype=np.int64),
                     "c_name": pd.Series([], dtype=object)}
                )
            return b[["c_custkey", "c_name"]]
        return b.loc[b["_hit"].isna(), ["c_custkey", "c_name"]]

    return hash_join(
        cust, marker, on=["c_custkey"], join_type="left_outer"
    ).map_batches(unmatched, batch_format="pandas")


def price_bucket_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Log2 distance-bucketing (M8, B4+KIRE/config/Config.py:95-106
    shape) + grouped count with block-local combiner."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bucket = np.floor(np.log2(b.o_totalprice.to_numpy())).astype(np.int64)
        return (
            pd.DataFrame({"bucket": bucket})
            .groupby("bucket", sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["bucket"],
        {"n": ("n", "sum")},
    )


def top_orders_per_segment(
    sf_dir: str, k: int = 3, *, broadcast_limit: int = 1_000_000
) -> "ray.data.Dataset":
    """Windowed rank per group (row_number over partition): top-k orders
    by price within each market segment. Grouped top-k never global-
    sorts — per-batch partial top-k shrinks the exchange to k rows per
    (segment, block), then the partition reduce ranks."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    # raw-fact join (no pre-aggregation shrinks o_custkey first), so a
    # hot customer would hot-spot one reducer — salt on the hash path
    joined = _dim_join(
        orders,
        sf_dir,
        "customer",
        ["c_custkey", "c_mktsegment"],
        key_map={"c_custkey": "o_custkey"},
        broadcast_limit=broadcast_limit,
        salt_hot=True,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .groupby("c_mktsegment", sort=False)
            .head(k)[["c_mktsegment", "o_orderkey", "o_totalprice"]]
        )

    def rank_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["c_mktsegment", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
        )
        part["rnk"] = part.groupby("c_mktsegment", sort=False).cumcount() + 1
        return part[part["rnk"] <= k]

    return partitioned_map_groups(
        joined.map_batches(partial, batch_format="pandas"), ["c_mktsegment"], rank_part
    )


def events_props_sum(sf_dir: str) -> "ray.data.Dataset":
    """Semi-structured parse (M-series parser shape, JSON ops §2.8):
    extract props.k with a vectorized regex, grouped sum per event
    type. The regex is the C-speed path — never json.loads per row."""
    ev = _read(sf_dir, "events", ["event_type", "props"])

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        kv = b["props"].str.extract(r'"k": (-?\d+)')[0].astype("int64")
        return (
            pd.DataFrame({"event_type": b.event_type, "k": kv})
            .groupby("event_type", sort=False)
            .agg(sum_k=("k", "sum"), n=("k", "size"))
            .reset_index()
        )

    return grouped_agg(
        ev.map_batches(parse, batch_format="pandas"),
        ["event_type"],
        {"sum_k": ("sum_k", "sum"), "n": ("n", "sum")},
    )


def events_hopping_window(
    sf_dir: str, window_s: int = 3600, hop_s: int = 900
) -> "ray.data.Dataset":
    """Hopping (sliding) window per event_type: each event lands in
    window_s/hop_s overlapping windows — a vectorized explode (numpy
    tile, no per-row loop) + partial agg + one grouped exchange."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    assert window_s % hop_s == 0 and window_s >= hop_s, (
        f"window_s={window_s} must be a positive multiple of hop_s="
        f"{hop_s}: a remainder silently shrinks the effective window to "
        "fan*hop_s and understates every count (review r5; same guard "
        "as temporal.hopping_window_counts)"
    )
    fan = window_s // hop_s

    def explode_agg(b: pd.DataFrame) -> pd.DataFrame:
        epoch = (b["ts"].astype("int64") // 10**6).to_numpy()
        ws_max = (epoch // hop_s) * hop_s
        parts = []
        for j in range(fan):
            parts.append(
                pd.DataFrame(
                    {
                        "event_type": b["event_type"].to_numpy(),
                        "window_start": ws_max - j * hop_s,
                        "value": b["value"].to_numpy(),
                    }
                )
            )
        x = pd.concat(parts, ignore_index=True)
        return (
            x.groupby(["event_type", "window_start"], sort=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
            .reset_index()
        )

    return grouped_agg(
        ev.map_batches(explode_agg, batch_format="pandas"),
        ["event_type", "window_start"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")},
        post=lambda out: out.assign(sum_value=round_half_up(out["sum_value"], 2)),
    )


def lineitem_monthly_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Date-truncated grouped aggregate (§2.8 adds date kernels the
    reference never needed): revenue per ship month. The month key is
    an int (year*100+month) so Ray and the SQL oracle agree exactly
    without timestamp-representation drift."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        month = (b["l_shipdate"].dt.year * 100 + b["l_shipdate"].dt.month).astype("int64")
        rev = b.l_extendedprice * (1 - b.l_discount)
        return (
            pd.DataFrame({"ship_month": month, "revenue": rev})
            .groupby("ship_month", sort=False)
            .agg(revenue=("revenue", "sum"), n_lines=("revenue", "size"))
            .reset_index()
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["ship_month"],
        {"revenue": ("revenue", "sum"), "n_lines": ("n_lines", "sum")},
        post=lambda out: out.assign(revenue=round_half_up(out["revenue"], 2)),
    )


def part_brand_stats(
    sf_dir: str, *, broadcast_limit: int = 1_000_000
) -> "ray.data.Dataset":
    """Min/max/avg/count per group (the aggregate kinds beyond
    sum/count): per-brand lineitem price stats. avg composes from
    (sum, count) partials — never an average of averages."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    joined = _dim_join(
        li,
        sf_dir,
        "part",
        ["p_partkey", "p_brand"],
        key_map={"p_partkey": "l_partkey"},
        broadcast_limit=broadcast_limit,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("p_brand", sort=False)
            .agg(
                min_price=("l_extendedprice", "min"),
                max_price=("l_extendedprice", "max"),
                sum_price=("l_extendedprice", "sum"),
                n=("l_extendedprice", "size"),
            )
            .reset_index()
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out["avg_price"] = round_half_up(out["sum_price"] / out["n"], 4)
        return out.drop(columns=["sum_price"])

    return grouped_agg(
        joined.map_batches(partial, batch_format="pandas"),
        ["p_brand"],
        {
            "min_price": ("min_price", "min"),
            "max_price": ("max_price", "max"),
            "sum_price": ("sum_price", "sum"),
            "n": ("n", "sum"),
        },
        post=post,
    )


def suppliers_with_lineitems(
    sf_dir: str, *, broadcast_limit: int = 1_000_000
) -> "ray.data.Dataset":
    """Semi-join (J3 shape at the relational surface): suppliers
    appearing in lineitem. The qualifying-key set goes through a
    distributed distinct exchange (per-batch unique combiner first, so
    the exchange is supplier-bounded); under ``broadcast_limit`` the
    distinct set ships once via ``ray.put``, above it the semi-join is
    a distributed inner hash join on the distinct keys — supplier
    scales with SF (1M rows at SF100), so the driver set is
    size-gated like every other lookup."""
    from kire_ray.stages.joins import hash_join, semi_join_broadcast

    li = _read(sf_dir, "lineitem", ["l_suppkey"])

    def distinct(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"l_suppkey": b["l_suppkey"].unique()})

    qual = (
        li.map_batches(distinct, batch_format="pandas")
        .groupby("l_suppkey")
        .count()
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal"])
    if _nrows_parquet(f"{sf_dir}/supplier.parquet") <= broadcast_limit:
        keys = set(qual.to_pandas()["l_suppkey"])
        return semi_join_broadcast(sup, keys, on="s_suppkey")
    key_ds = qual.map_batches(
        lambda b: pd.DataFrame({"s_suppkey": b["l_suppkey"].to_numpy()}),
        batch_format="pandas",
    )
    return hash_join(sup, key_ds, on=["s_suppkey"])


def price_quantiles(sf_dir: str, quantiles=(0.25, 0.5, 0.75, 0.9)) -> pd.DataFrame:
    """Exact distributed quantiles (quantile_disc semantics: the order
    statistic at ceil(q*n)-1): per-batch value→count histogram
    (combiner), one grouped exchange, then a driver-side cumulative
    pick over the *distinct-value* histogram — bounded by value
    cardinality, not row count. At 100 TB an unbounded-cardinality
    column would first quantize to fixed-width buckets (the sketch the
    reference never needed; SURVEY §2.5 'no approximate aggregates')."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("o_totalprice", sort=False).size().rename("n").reset_index()
        )

    h = (
        grouped_agg(
            ds.map_batches(hist, batch_format="pandas"),
            ["o_totalprice"],
            {"n": ("n", "sum")},
        )
        .to_pandas()
        .sort_values("o_totalprice")
        .reset_index(drop=True)
    )
    cum = h["n"].cumsum().to_numpy()
    total = int(cum[-1])
    out = []
    for q in quantiles:
        k = int(np.ceil(q * total))  # 1-based rank, quantile_disc rule
        idx = int(np.searchsorted(cum, k, side="left"))
        out.append((float(q), float(h["o_totalprice"].iloc[idx])))
    return pd.DataFrame(out, columns=["q", "value"])


# ------------------- round-2 operator extensions --------------------


def events_asof_join(sf_dir: str) -> "ray.data.Dataset":
    """As-of (backward) join — an operator Ray Data has no primitive
    for: for every 'purchase' event, the latest 'view' event of the
    same user at or before its timestamp, with a deterministic
    tie-break (latest ts, then highest event_id).

    Shape: ONE hash exchange on user_id co-locates both sides, then a
    vectorized ``pd.merge_asof`` per partition (sorted once per
    partition, not per user). At 100 TB this is the standard
    partitioned as-of: no replication, partition count scales with
    data, skewed users bounded by per-user event caps upstream."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def part(p: pd.DataFrame) -> pd.DataFrame:
        p = p.assign(tus=p["ts"].astype("int64"))
        buys = (
            p[p["event_type"] == "purchase"]
            .rename(columns={"event_id": "purchase_id"})[
                ["purchase_id", "user_id", "tus"]
            ]
            .sort_values(["tus", "purchase_id"], kind="stable")
        )
        views = (
            p[p["event_type"] == "view"]
            .rename(columns={"event_id": "view_id"})[["view_id", "user_id", "tus"]]
            .assign(view_tus=lambda d: d["tus"])
            # merge_asof keeps the LAST right row among equal keys →
            # sorting by (tus, view_id) makes the tie-break = max id
            .sort_values(["tus", "view_id"], kind="stable")
        )
        if buys.empty or views.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "view_id": pd.Series([], dtype=np.int64),
                    "gap_s": pd.Series([], dtype=np.int64),
                }
            )
        m = pd.merge_asof(
            buys, views, on="tus", by="user_id", direction="backward"
        ).dropna(subset=["view_id"])
        return pd.DataFrame(
            {
                "purchase_id": m["purchase_id"].astype(np.int64),
                "user_id": m["user_id"].astype(np.int64),
                "view_id": m["view_id"].astype(np.int64),
                "gap_s": ((m["tus"] - m["view_tus"]) // 1_000_000).astype(np.int64),
            }
        )

    return partitioned_map_groups(ev, ["user_id"], part)


def orders_lineitem_range_join(sf_dir: str, window_days: int = 7) -> "ray.data.Dataset":
    """Date-band range join with NO equi-key (orders × lineitems
    shipped within [o_orderdate, o_orderdate + window)): bucket both
    sides by epoch-week. Each ORDER lands in exactly one bucket; each
    ITEM is replicated into its own bucket and the one below, so bucket
    b locally holds every ship-day in [bW, (b+2)W) — a superset of any
    resident order's window. One exchange therefore produces FINAL
    per-order results (match vectorized: sorted ship days + prefix sums
    → searchsorted range counts); no partial-merge exchange, and each
    order's float sum is computed once from one contiguous prefix-sum
    range. (The previous shape replicated orders and merged per-bucket
    partials through a second exchange — one whole barrier more for the
    same moved-row volume.) Join work is O(band density), never the
    full cross product."""
    W = window_days  # bucket width in days = window length

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    items = _read(sf_dir, "lineitem", ["l_shipdate", "l_quantity"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        od = (b["o_orderdate"].astype("int64") // (86_400 * 10**6)).to_numpy()
        return pd.DataFrame(
            {
                "bucket": od // W,
                "key": b["o_orderkey"].to_numpy(),
                "day": od,
                "qty": 0.0,
                "is_order": True,
            }
        )

    def tag_items(b: pd.DataFrame) -> pd.DataFrame:
        sd = (b["l_shipdate"].astype("int64") // (86_400 * 10**6)).to_numpy()
        bk = sd // W
        return pd.DataFrame(
            {
                "bucket": np.concatenate([bk, bk - 1]),
                "key": np.int64(-1),
                "day": np.concatenate([sd, sd]),
                "qty": np.tile(b["l_quantity"].astype(np.float64).to_numpy(), 2),
                "is_order": False,
            }
        )

    tagged = orders.map_batches(tag_orders, batch_format="pandas").union(
        items.map_batches(tag_items, batch_format="pandas")
    )

    def bucket_part(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in part.groupby("bucket", sort=False):
            o = g[g["is_order"]]
            it = g[~g["is_order"]].sort_values("day", kind="stable")
            if o.empty or it.empty:
                continue
            days = it["day"].to_numpy()
            csum = np.concatenate([[0.0], np.cumsum(it["qty"].to_numpy())])
            lo = np.searchsorted(days, o["day"].to_numpy(), side="left")
            hi = np.searchsorted(days, o["day"].to_numpy() + W, side="left")
            n = hi - lo
            keep = n > 0
            out.append(
                pd.DataFrame(
                    {
                        "o_orderkey": o["key"].to_numpy()[keep],
                        "n_shipped": n[keep],
                        "sum_qty": csum[hi][keep] - csum[lo][keep],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "n_shipped": pd.Series([], dtype=np.int64),
                    "sum_qty": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            n_shipped=b["n_shipped"].astype(np.int64),
            sum_qty=b["sum_qty"].astype(np.float64),
        )

    return partitioned_map_groups(tagged, ["bucket"], bucket_part).map_batches(
        finalize, batch_format="pandas"
    )


def events_rolling_avg(sf_dir: str, window: int = 3) -> "ray.data.Dataset":
    """Per-user rolling mean over the trailing ``window`` events (ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW): one exchange on
    user_id, explicit shift-sum per partition (not pandas' online
    rolling accumulator, whose fp drift would flip half-up rounding)."""

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def part(p: pd.DataFrame) -> pd.DataFrame:
        p = p.assign(tus=p["ts"].astype("int64")).sort_values(
            ["user_id", "tus", "event_id"], kind="stable"
        )
        v = p["value"].astype(np.float64)
        same = [pd.Series(True, index=p.index)]
        for k in range(1, window):
            same.append(p["user_id"].eq(p["user_id"].shift(k)))
        total = v.copy()
        cnt = np.ones(len(p))
        mask = pd.Series(True, index=p.index)
        for k in range(1, window):
            mask = mask & same[k]
            total = total + v.shift(k).where(mask, 0.0)
            cnt = cnt + mask.to_numpy()
        return pd.DataFrame(
            {
                "event_id": p["event_id"].astype(np.int64),
                "user_id": p["user_id"].astype(np.int64),
                "rolling_avg": round_half_up(total.to_numpy() / cnt, 6),
            }
        )

    return partitioned_map_groups(ev, ["user_id"], part)


def events_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """Exact grouped distinct count: block-local (type, user) dedup
    combiner → exchange on event_type → exact nunique in the reducer
    (all rows of a type co-locate, so no approximate sketch needed)."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["event_type", "user_id"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    return grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"n_users": ("user_id", "nunique"), "n": ("n", "sum")},
        post=lambda out: out.assign(
            n_users=out["n_users"].astype(np.int64), n=out["n"].astype(np.int64)
        ),
    )


def orders_status_quantiles(sf_dir: str, quantiles=(0.5, 0.9)) -> "ray.data.Dataset":
    """Per-group exact quantiles (quantile_disc): per-block (status,
    price) histogram combiner → exchange on status → cumulative pick
    per group in the reducer. Reducer memory is bounded by per-group
    distinct-value cardinality (the price_quantiles quantization note
    applies at open cardinality)."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["o_orderstatus", "o_totalprice"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for status, g in part.groupby("o_orderstatus", sort=False):
            g = (
                g.groupby("o_totalprice", sort=True)["n"].sum().reset_index()
            )
            cum = g["n"].cumsum().to_numpy()
            total = int(cum[-1])
            for q in quantiles:
                k = int(np.ceil(q * total))
                idx = int(np.searchsorted(cum, k, side="left"))
                rows.append((status, float(q), float(g["o_totalprice"].iloc[idx])))
        return pd.DataFrame(rows, columns=["o_orderstatus", "q", "value"])

    return partitioned_map_groups(
        ds.map_batches(hist, batch_format="pandas"), ["o_orderstatus"], pick
    )


def events_ab_test(sf_dir: str, threshold: float = 100.0) -> "ray.data.Dataset":
    """Two-proportion z-test per event type: weekend vs weekday
    conversion (value > ``threshold``) — the slice-comparison screen a
    curation/eval pipeline runs before trusting a data mix change.

    Block-local (type × arm) success/trial partials → one
    type-cardinality exchange → pooled two-proportion z on the driver
    row set, expressions mirrored in the SQL oracle (half-up 6dp).
    """
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        we = (b["ts"].dt.dayofweek >= 5).to_numpy()
        conv = (b["value"].to_numpy(np.float64) > threshold).astype(np.int64)
        g = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "n_we": we.astype(np.int64),
                "x_we": conv * we,
                "n_wd": (~we).astype(np.int64),
                "x_wd": conv * ~we,
            }
        )
        return g.groupby("event_type", sort=False).sum().reset_index()

    cols = ["n_we", "x_we", "n_wd", "x_wd"]
    st = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {c: (c, "sum") for c in cols},
    ).to_pandas()
    n1 = st["n_we"].to_numpy(np.float64)
    x1 = st["x_we"].to_numpy(np.float64)
    n2 = st["n_wd"].to_numpy(np.float64)
    x2 = st["x_wd"].to_numpy(np.float64)
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    out = pd.DataFrame(
        {
            "event_type": st["event_type"],
            "n_weekend": st["n_we"].astype(np.int64),
            "n_weekday": st["n_wd"].astype(np.int64),
            "p_weekend": round_half_up(p1, 6),
            "p_weekday": round_half_up(p2, 6),
            "z": round_half_up(z, 6),
        }
    ).sort_values("event_type", kind="stable")
    return ray.data.from_pandas(out.reset_index(drop=True))


def user_decay_scores(
    sf_dir: str,
    *,
    ref_ts: str = "2024-02-01",
    half_life_days: float = 7.0,
) -> "ray.data.Dataset":
    """Exponentially time-decayed engagement score per user —
    score = Σ value · 2^(−age_days / half_life) at a FIXED reference
    time (recency weighting for retention/engagement features; a fixed
    epoch keeps the operator a pure per-row map + grouped sum, no
    global max-ts pass, and makes it incremental across ingest runs).

    Block-local per-user partials → one user-cardinality exchange.
    The decay expression is mirrored literally in the SQL oracle;
    rounding absorbs summation order.
    """
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    ref_us = pd.Timestamp(ref_ts).value // 1000

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        age_days = (
            ref_us - b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ) / 86400e6
        w = b["value"].to_numpy(np.float64) * np.exp2(-age_days / half_life_days)
        return (
            pd.DataFrame({"user_id": b["user_id"], "score": w, "n": 1})
            .groupby("user_id", sort=False)
            .sum()
            .reset_index()
        )

    return grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        {"score": ("score", "sum"), "n": ("n", "sum")},
        post=lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "n": b["n"].astype(np.int64),
                "score": round_half_up(b["score"].to_numpy(np.float64), 6),
            }
        ),
    )


def events_mad(sf_dir: str) -> "ray.data.Dataset":
    """Grouped robust location/scale: per-type exact (discrete) median
    and median absolute deviation — the outlier-resistant sibling of
    ``events_zscore`` a curation pipeline prefers on heavy-tailed
    values.

    ONE exchange: the per-block (type, value) histogram combiner
    co-locates each type's value multiset; the reducer picks the
    discrete median (the ``orders_status_quantiles`` rule —
    ceil(q·n)-th order statistic) and then the median of |value − med|
    from the same in-partition histogram, so the two-pass statistic
    costs a single shuffle. Reducer memory is bounded by per-group
    distinct-value cardinality (same declared bound and quantization
    mitigation as ``orders_status_quantiles``).
    """
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["event_type", "value"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def _disc_median(vals: np.ndarray, cnt: np.ndarray) -> float:
        cum = cnt.cumsum()
        k = int(np.ceil(0.5 * cum[-1]))
        return float(vals[int(np.searchsorted(cum, k, side="left"))])

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in part.groupby("event_type", sort=False):
            g = g.groupby("value", sort=True)["n"].sum().reset_index()
            vals = g["value"].to_numpy(np.float64)
            cnt = g["n"].to_numpy(np.int64)
            med = _disc_median(vals, cnt)
            dev = pd.DataFrame({"d": np.abs(vals - med), "n": cnt})
            dev = dev.groupby("d", sort=True)["n"].sum().reset_index()
            mad = _disc_median(dev["d"].to_numpy(np.float64),
                               dev["n"].to_numpy(np.int64))
            rows.append((t, int(cnt.sum()), med, mad))
        return pd.DataFrame(rows, columns=["event_type", "n", "median", "mad"])

    out = partitioned_map_groups(
        ds.map_batches(hist, batch_format="pandas"), ["event_type"], pick
    )
    return out.map_batches(
        lambda b: b.astype({"n": np.int64}), batch_format="pandas"
    )


def events_quantile_cont(
    sf_dir: str, quantiles=(0.25, 0.5, 0.75, 0.95)
) -> "ray.data.Dataset":
    """Per-type INTERPOLATED quantiles (SQL ``quantile_cont``): the
    continuous sibling of ``orders_status_quantiles`` — linear
    interpolation at position (n−1)·q between the two bracketing order
    statistics, mirrored expression-for-expression in the oracle.

    Same single-exchange histogram shape: per-block (type, value)
    count combiner → one type-cardinality exchange → in-reducer sorted
    expansion and interpolation (reducer memory bounded by per-group
    distinct values, the declared ``orders_status_quantiles`` bound).
    """
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["event_type", "value"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in part.groupby("event_type", sort=False):
            g = g.groupby("value", sort=True)["n"].sum().reset_index()
            vals = g["value"].to_numpy(np.float64)
            cum = g["n"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            for q in quantiles:
                pos = (n - 1) * q
                lo = int(np.floor(pos))
                frac = pos - lo
                # order statistics x[lo], x[lo+1] from the cumulative
                # histogram (searchsorted for the k-th, 0-based)
                vlo = vals[int(np.searchsorted(cum, lo + 1, side="left"))]
                if frac == 0.0:
                    v = vlo
                else:
                    vhi = vals[int(np.searchsorted(cum, lo + 2, side="left"))]
                    v = vlo + frac * (vhi - vlo)
                rows.append((t, float(q), v))
        out = pd.DataFrame(rows, columns=["event_type", "q", "value"])
        out["value"] = round_half_up(out["value"].to_numpy(np.float64), 6)
        return out

    return partitioned_map_groups(
        ds.map_batches(hist, batch_format="pandas"), ["event_type"], pick
    )


def events_wow_change(sf_dir: str) -> "ray.data.Dataset":
    """Week-over-week trend per event type: weekly value totals with
    the lagged percentage change — the growth dashboard's core window
    query (LAG over an aggregated series).

    Block-local (type, week) combiner → one tiny exchange co-locating
    each type's weekly series → vectorized shift inside the reducer
    (series length = corpus weeks; the big data never reshuffles on
    the output key — the ``event_transitions`` two-level shape).
    """
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        wk = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 604_800_000_000
        g = pd.DataFrame({"event_type": b["event_type"], "wk": wk,
                          "v": b["value"].to_numpy(np.float64), "n": 1})
        return g.groupby(["event_type", "wk"], sort=False).sum().reset_index()

    weekly = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "wk"],
        {"v": ("v", "sum"), "n": ("n", "sum")},
    )

    def change(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["event_type", "wk"], kind="mergesort").reset_index(drop=True)
        prev = p.groupby("event_type", sort=False)["v"].shift(1)
        # first week has no predecessor: 0.0 on both compare sides
        # (NaN-vs-NULL would hash-mismatch)
        pct = ((p["v"] - prev) / prev).fillna(0.0)
        return pd.DataFrame(
            {
                "event_type": p["event_type"],
                "wk": p["wk"].astype(np.int64),
                "n": p["n"].astype(np.int64),
                "total": round_half_up(p["v"].to_numpy(np.float64), 6),
                "pct_change": round_half_up(pct.to_numpy(np.float64), 6),
            }
        )

    return partitioned_map_groups(weekly, ["event_type"], change)


def snapshot_diff(sf_dir: str) -> "ray.data.Dataset":
    """Change-data-capture between two corpus snapshots: one hash
    exchange on the key co-locates both versions of every row and the
    reducer emits (key, change ∈ added|removed|changed) — the
    snapshot-reconciliation pass an incremental ingest runs before
    reprocessing only what moved.

    Snapshot B is derived deterministically from the documents table
    (every 10th doc deleted, every 7th's text revised, every 13th
    re-added under a shifted id), so the whole diff — including the
    synthetic snapshot — is reconstructible in the SQL oracle. Rows
    ride the exchange tagged with their side; equality is computed
    in-reducer on the co-located pair (never a driver collect).
    """
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tag_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype(np.int64), "text": b["text"],
             "is_b": np.zeros(len(b), dtype=bool)}
        )

    def make_b(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        txt = b["text"].to_numpy(object)
        keep = ids % 10 != 0
        ids_k, txt_k = ids[keep], txt[keep].copy()
        rev = ids_k % 7 == 0
        txt_k[rev] = np.char.add(txt_k[rev].astype(str), " v2")
        add = ids % 13 == 0
        # re-added ids shift to the NEGATIVE range (-id - 1): doc_ids
        # are non-negative, so the synthetic ids can never collide with
        # a real kept id at any corpus size (review r5: +1_000_000
        # collided once the table passed ~1M rows)
        out_ids = np.concatenate([ids_k, -ids[add] - 1])
        out_txt = np.concatenate([txt_k, txt[add]])
        return pd.DataFrame(
            {"doc_id": out_ids, "text": out_txt,
             "is_b": np.ones(len(out_ids), dtype=bool)}
        )

    both = docs.map_batches(tag_a, batch_format="pandas").union(
        docs.map_batches(make_b, batch_format="pandas")
    )

    def diff(p: pd.DataFrame) -> pd.DataFrame:
        a = p[~p["is_b"]].set_index("doc_id")["text"]
        b = p[p["is_b"]].set_index("doc_id")["text"]
        removed = a.index.difference(b.index)
        added = b.index.difference(a.index)
        common = a.index.intersection(b.index)
        changed = common[(a.loc[common] != b.loc[common]).to_numpy()]
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [removed.to_numpy(np.int64), added.to_numpy(np.int64),
                     changed.to_numpy(np.int64)]
                ),
                "change": np.concatenate(
                    [np.full(len(removed), "removed", object),
                     np.full(len(added), "added", object),
                     np.full(len(changed), "changed", object)]
                ),
            }
        )

    return partitioned_map_groups(both, ["doc_id"], diff)


def users_every_day(sf_dir: str) -> "ray.data.Dataset":
    """Relational division: users active on EVERY day the corpus
    spans — the "for all" join SQL expresses as HAVING count(DISTINCT)
    = divisor size (power users / full-coverage entities).

    Distinct (user, day) block combiner → one user exchange counting
    distinct days per user; the divisor (the global day set) is
    day-bounded, merged on the driver from per-block partials and
    broadcast as a single count. Returns (user_id, n_days) for
    qualifying users.
    """
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86400_000_000
        return pd.DataFrame(
            {"user_id": b["user_id"], "day": day}
        ).drop_duplicates()

    up = ev.map_batches(pairs, batch_format="pandas").materialize()
    n_days = int(
        up.map_batches(
            lambda b: pd.DataFrame({"day": b["day"].unique()}),
            batch_format="pandas",
        )
        .to_pandas()["day"]
        .nunique()
    )

    def divide(p: pd.DataFrame) -> pd.DataFrame:
        g = (
            p.drop_duplicates()
            .groupby("user_id", sort=False)
            .size()
            .rename("n_days")
            .reset_index()
        )
        g = g[g["n_days"] == n_days]
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype(np.int64),
                "n_days": g["n_days"].astype(np.int64),
            }
        )

    return partitioned_map_groups(up, ["user_id"], divide)


def events_anomalies(sf_dir: str, k: float = 5.0) -> "ray.data.Dataset":
    """Robust anomaly flags: events whose value deviates from their
    type's discrete median by more than ``k``·MAD — the outlier screen
    built on ``events_mad``'s statistics (median/MAD resist the very
    outliers being hunted, unlike mean/std).

    Pass 1 = the single-exchange median+MAD (type-cardinality stats,
    collected and broadcast); pass 2 streams the corpus through a
    vectorized threshold filter. Expressions mirrored in the oracle.
    """
    from kire_ray.pipelines.relational import events_mad as _mad

    stats = _mad(sf_dir).to_pandas().set_index("event_type")
    ref = ray.put(
        {t: (r["median"], r["mad"]) for t, r in stats.iterrows()}
    )
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(ref)
        med = b["event_type"].map(lambda t: lut[t][0]).to_numpy(np.float64)
        mad = b["event_type"].map(lambda t: lut[t][1]).to_numpy(np.float64)
        dev = np.abs(b["value"].to_numpy(np.float64) - med)
        keep = dev > k * mad
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(np.int64)[keep],
                "event_type": b["event_type"].to_numpy()[keep],
                "value": b["value"].to_numpy(np.float64)[keep],
                "deviation": round_half_up(dev[keep], 6),
            }
        )

    return ev.map_batches(flag, batch_format="pandas")


def events_zscore(sf_dir: str) -> "ray.data.Dataset":
    """Per-type z-score normalization of event values — the grouped
    standardization step a feature pipeline runs before model training.

    Two-pass broadcast shape (the canonical small-stats normalization):
    pass 1 computes per-type (count, sum, sum-of-squares) via a
    block-local combiner + one type-cardinality exchange (the stats
    table is O(#types) — tiny); the driver collects it and re-broadcasts
    the per-type mean/std into a stateless vectorized pass 2. No row
    ever shuffles; the corpus streams through twice.

    Population variance, expression-ordered to mirror the SQL oracle
    exactly: mean = sv/n, var = svv/n - mean*mean.
    """
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].astype(np.float64)
        g = pd.DataFrame(
            {"event_type": b["event_type"], "sv": v, "svv": v * v, "n": 1}
        )
        return (
            g.groupby("event_type", sort=False)
            .agg(sv=("sv", "sum"), svv=("svv", "sum"), n=("n", "sum"))
            .reset_index()
        )

    stats = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"sv": ("sv", "sum"), "svv": ("svv", "sum"), "n": ("n", "sum")},
    ).to_pandas()
    n = stats["n"].to_numpy(np.float64)
    mean = stats["sv"].to_numpy(np.float64) / n
    var = stats["svv"].to_numpy(np.float64) / n - mean * mean
    lut = {
        t: (m, np.sqrt(v))
        for t, m, v in zip(stats["event_type"], mean, var)
    }

    def normalize(b: pd.DataFrame) -> pd.DataFrame:
        ms = b["event_type"].map(lambda t: lut[t][0]).to_numpy(np.float64)
        sd = b["event_type"].map(lambda t: lut[t][1]).to_numpy(np.float64)
        z = (b["value"].to_numpy(np.float64) - ms) / sd
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype(np.int64),
                "event_type": b["event_type"],
                "zscore": round_half_up(z, 6),
            }
        )

    return ev.map_batches(normalize, batch_format="pandas")


def events_regression(sf_dir: str) -> "ray.data.Dataset":
    """Group-wise ordinary-least-squares fit of event value against
    time — the trend/drift profile a data-curation pass computes per
    slice before deciding what to resample.

    Distributed sufficient statistics: each block contributes per-type
    (n, Σx, Σy, Σxy, Σx², Σy²) via a block-local combiner; one
    type-cardinality exchange sums them; slope / intercept / Pearson r
    fall out of the closed-form moments. No row ever shuffles — the
    classic one-pass parallel OLS (the same shape every MPP engine
    uses for REGR_* aggregates).

    x is hours since 2024-01-01 (a fixed epoch shift keeps Σx² well
    conditioned in float64 — epoch-microseconds would lose the slope
    to cancellation); the moment expressions are mirrored token-for-
    token in the SQL oracle so only summation order differs, absorbed
    by the half-up rounding guard at 6dp.
    """
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    base_us = pd.Timestamp("2024-01-01").value // 1000

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = (
            b["ts"].to_numpy("datetime64[us]").astype(np.int64) - base_us
        ) / 3.6e9
        y = b["value"].to_numpy(np.float64)
        g = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "n": 1,
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        )
        return g.groupby("event_type", sort=False).sum().reset_index()

    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    stats = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {c: (c, "sum") for c in cols},
    ).to_pandas()
    n = stats["n"].to_numpy(np.float64)
    sx, sy = stats["sx"].to_numpy(), stats["sy"].to_numpy()
    sxy, sxx, syy = (
        stats["sxy"].to_numpy(),
        stats["sxx"].to_numpy(),
        stats["syy"].to_numpy(),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    out = pd.DataFrame(
        {
            "event_type": stats["event_type"],
            "n": stats["n"].astype(np.int64),
            "slope": round_half_up(slope, 6),
            "intercept": round_half_up(intercept, 6),
            "r": round_half_up(r, 6),
        }
    ).sort_values("event_type", kind="stable")
    return ray.data.from_pandas(out.reset_index(drop=True))


def event_hour_pmi(sf_dir: str) -> "ray.data.Dataset":
    """Association profile between two categorical columns (event_type
    × hour-of-day): joint counts and pointwise mutual information per
    cell — the dependence screen a curation pipeline runs to find
    leakage / confounded slices before sampling. Σ p·pmi over the rows
    is the mutual information of the two columns.

    Block-local contingency partials → one cell-cardinality exchange
    (|types| × 24 keys) → margins and PMI on the driver (the
    contingency table is dimension-sized by construction). PMI
    expression mirrored literally in the SQL oracle:
    ln((n·t)/(nx·ny)), half-up 6dp.
    """
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"event_type": b["event_type"], "hour": b["ts"].dt.hour.astype(np.int64)}
        )
        return (
            g.groupby(["event_type", "hour"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    j = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour"],
        {"n": ("n", "sum")},
    ).to_pandas()
    t = float(j["n"].sum())
    nx = j.groupby("event_type")["n"].transform("sum").to_numpy(np.float64)
    ny = j.groupby("hour")["n"].transform("sum").to_numpy(np.float64)
    n = j["n"].to_numpy(np.float64)
    out = pd.DataFrame(
        {
            "event_type": j["event_type"],
            "hour": j["hour"].astype(np.int64),
            "n": j["n"].astype(np.int64),
            "pmi": round_half_up(np.log((n * t) / (nx * ny)), 6),
        }
    ).sort_values(["event_type", "hour"], kind="stable")
    return ray.data.from_pandas(out.reset_index(drop=True))


def events_value_ranks(sf_dir: str) -> "ray.data.Dataset":
    """Global percent-rank of every event's value (SQL
    ``percent_rank() OVER (ORDER BY value)``) — the distributed ranking
    primitive behind percentile-based outlier gates and quantile
    normalization.

    Shape: per-block distinct-value count combiner → one exchange on
    value (rows = distinct values, which the generator quantizes to
    cents, so the merged table is cardinality-bounded, NOT row-scale) →
    the sorted (value, count-below) table broadcasts once and a
    stateless vectorized pass maps each row via searchsorted.
    percent_rank = count(value' < value) / (n - 1), ties share a rank.
    For unbounded-cardinality keys swap the broadcast for a range
    exchange + per-partition offsets (the ``pack_sequences`` prefix-sum
    shape) — same semantics, one more shuffle.
    """
    ev = _read(sf_dir, "events", ["event_id", "value"])

    def vcount(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("value", sort=False).size().rename("c").reset_index()
        )

    vc = (
        grouped_agg(
            ev.map_batches(vcount, batch_format="pandas"),
            ["value"],
            {"c": ("c", "sum")},
        )
        .to_pandas()
        .sort_values("value", kind="mergesort")
        .reset_index(drop=True)
    )
    n = int(vc["c"].sum())
    below = np.concatenate([[0], np.cumsum(vc["c"].to_numpy(np.int64))[:-1]])
    lut = ray.put((vc["value"].to_numpy(np.float64), below, n))

    def rank(b: pd.DataFrame) -> pd.DataFrame:
        vals, blw, total = ray.get(lut)
        pct = blw[np.searchsorted(vals, b["value"].to_numpy(np.float64))] / np.float64(
            total - 1
        )
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype(np.int64),
                "pct_rank": round_half_up(pct, 6),
            }
        )

    return ev.map_batches(rank, batch_format="pandas")


ORDER_PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]


def orders_rollup(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY ROLLUP (status, priority): the multi-level aggregate a
    reporting pipeline materializes in one pass. Coarser levels derive
    from the *finest* aggregated table (the standard rollup-from-cube
    optimization), so the corpus streams exactly once and only the
    key-cardinality-bounded finest table is re-aggregated (it is tiny —
    15 rows here — so the final rollup is one reduce task). '(all)'
    marks the rolled-up label, as coalesce does in the SQL oracle."""
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["o_orderstatus", "o_orderpriority"], sort=False)
            .agg(n_orders=("o_totalprice", "size"), s=("o_totalprice", "sum"))
            .reset_index()
        )

    fine = grouped_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("n_orders", "sum"), "s": ("s", "sum")},
    )

    def rollup(p: pd.DataFrame) -> pd.DataFrame:
        lvl1 = (
            p.groupby("o_orderstatus", sort=False)
            .agg(n_orders=("n_orders", "sum"), s=("s", "sum"))
            .reset_index()
            .assign(o_orderpriority="(all)")
        )
        lvl0 = pd.DataFrame(
            {
                "o_orderstatus": ["(all)"],
                "o_orderpriority": ["(all)"],
                "n_orders": [p["n_orders"].sum()],
                "s": [p["s"].sum()],
            }
        )
        out = pd.concat([p, lvl1, lvl0], ignore_index=True)
        out["n_orders"] = out["n_orders"].astype(np.int64)
        out["total_price"] = round_half_up(out["s"], 2)
        return out.drop(columns=["s"])

    # the finest table is O(|status|·|priority|) — one reduce task
    return fine.repartition(1).map_batches(rollup, batch_format="pandas")


def orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY CUBE (status, priority): all four grouping sets in one
    corpus pass. Like ``orders_rollup``, every coarser level derives
    from the finest aggregated table (key-cardinality-bounded, one
    reduce task); the CUBE adds the (priority)-only set the rollup
    lacks. '(all)' marks the aggregated-out label."""
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["o_orderstatus", "o_orderpriority"], sort=False)
            .agg(n_orders=("o_totalprice", "size"), s=("o_totalprice", "sum"))
            .reset_index()
        )

    fine = grouped_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("n_orders", "sum"), "s": ("s", "sum")},
    )

    def cube(p: pd.DataFrame) -> pd.DataFrame:
        by_s = (
            p.groupby("o_orderstatus", sort=False)
            .agg(n_orders=("n_orders", "sum"), s=("s", "sum"))
            .reset_index()
            .assign(o_orderpriority="(all)")
        )
        by_p = (
            p.groupby("o_orderpriority", sort=False)
            .agg(n_orders=("n_orders", "sum"), s=("s", "sum"))
            .reset_index()
            .assign(o_orderstatus="(all)")
        )
        top = pd.DataFrame(
            {
                "o_orderstatus": ["(all)"],
                "o_orderpriority": ["(all)"],
                "n_orders": [p["n_orders"].sum()],
                "s": [p["s"].sum()],
            }
        )
        out = pd.concat([p, by_s, by_p, top], ignore_index=True)
        out["n_orders"] = out["n_orders"].astype(np.int64)
        out["total_price"] = round_half_up(out["s"], 2)
        return out[["o_orderstatus", "o_orderpriority", "n_orders", "total_price"]]

    return fine.repartition(1).map_batches(cube, batch_format="pandas")


def events_moments(sf_dir: str) -> "ray.data.Dataset":
    """Grouped distribution-shape profile: population variance,
    skewness and excess kurtosis of event values per type, from raw
    power sums (Σx..Σx⁴) — ONE block-local combiner + one
    type-cardinality exchange, the same one-pass sufficient-statistics
    shape as ``events_regression``. Central-moment expressions are
    mirrored token-for-token in the SQL oracle; values are O(100) so
    the power sums stay well conditioned in float64."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["value"].to_numpy(np.float64)
        g = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "n": 1.0,
                "s1": x,
                "s2": x * x,
                "s3": x * x * x,
                "s4": x * x * x * x,
            }
        )
        return g.groupby("event_type", sort=False).sum().reset_index()

    cols = ["n", "s1", "s2", "s3", "s4"]
    st = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {c: (c, "sum") for c in cols},
    ).to_pandas()
    n = st["n"].to_numpy(np.float64)
    s1, s2, s3, s4 = (st[c].to_numpy(np.float64) for c in ["s1", "s2", "s3", "s4"])
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean**3
    m4 = s4 / n - 4 * mean * (s3 / n) + 6 * mean * mean * (s2 / n) - 3 * mean**4
    out = pd.DataFrame(
        {
            "event_type": st["event_type"],
            "n": n.astype(np.int64),
            "mean": round_half_up(mean, 6),
            "var_pop": round_half_up(m2, 6),
            "skewness": round_half_up(m3 / np.power(m2, 1.5), 6),
            "kurtosis_excess": round_half_up(m4 / (m2 * m2) - 3.0, 6),
        }
    ).sort_values("event_type", kind="stable")
    return ray.data.from_pandas(out.reset_index(drop=True))


def status_priority_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Pivot priorities into columns (one row per status, one count
    column per priority) — conditional aggregation done block-local
    (each batch emits an already-pivoted partial) so the exchange moves
    |status| rows of 5 ints, never the fact table."""
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    cols = {p: "n_" + p.split("-")[0] for p in ORDER_PRIORITIES}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = {"o_orderstatus": []}
        out.update({c: [] for c in cols.values()})
        for status, g in b.groupby("o_orderstatus", sort=False):
            vc = g["o_orderpriority"].value_counts()
            out["o_orderstatus"].append(status)
            for p, c in cols.items():
                out[c].append(int(vc.get(p, 0)))
        return pd.DataFrame(out)

    return grouped_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_orderstatus"],
        {c: (c, "sum") for c in cols.values()},
        post=lambda out: out.assign(
            **{c: out[c].astype(np.int64) for c in cols.values()}
        ),
    )


def events_resampled(sf_dir: str, window_s: int = 3600) -> "ray.data.Dataset":
    """Gap-filled hourly series per event type (time-series alignment
    before any windowed model): tumbling aggregate → per-type
    reindex onto the global hour grid with zero fill. The aggregate
    table is O(|types| · hours) — the grid fill runs per type after one
    tiny exchange; the global bounds are two scalars off that table."""
    agg = events_tumbling_window(sf_dir, window_s)
    agg = agg.materialize()
    lo = int(agg.min("window_start"))
    hi = int(agg.max("window_start"))

    def fill(p: pd.DataFrame) -> pd.DataFrame:
        grid = np.arange(lo, hi + 1, window_s, dtype=np.int64)
        outs = []
        for t, g in p.groupby("event_type", sort=False):
            g = g.set_index("window_start").reindex(grid)
            outs.append(
                pd.DataFrame(
                    {
                        "event_type": t,
                        "window_start": grid,
                        "n_events": g["n_events"].fillna(0).astype(np.int64).to_numpy(),
                        "sum_value": g["sum_value"].fillna(0.0).to_numpy(),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return partitioned_map_groups(agg, ["event_type"], fill)


def user_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Ordered conversion funnel view → click → purchase: per-user
    first-view, first click strictly after it, first purchase strictly
    after that — one exchange on user_id, vectorized per partition,
    then a 3-int global sum. The classic sessionized product-analytics
    aggregate (strictly-ordered sequence, not mere co-occurrence)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["view", "click", "purchase"])]
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
            }
        )

    def steps(p: pd.DataFrame) -> pd.DataFrame:
        # all vectorized: per-step first-timestamp via C-speed groupby
        # min + merge, never a per-user Python loop
        t0 = (
            p.loc[p["event_type"] == "view"]
            .groupby("user_id", sort=False)["tus"]
            .min()
            .rename("t0")
        )
        c = p.loc[p["event_type"] == "click"].merge(t0, on="user_id")
        t1 = (
            c.loc[c["tus"] > c["t0"]]
            .groupby("user_id", sort=False)["tus"]
            .min()
            .rename("t1")
        )
        pu = p.loc[p["event_type"] == "purchase"].merge(t1, on="user_id")
        n_vcp = int(pu.loc[pu["tus"] > pu["t1"], "user_id"].nunique())
        return pd.DataFrame(
            {
                "n_view": [len(t0)],
                "n_view_click": [len(t1)],
                "n_view_click_purchase": [n_vcp],
            }
        )

    parts = partitioned_map_groups(
        ev.map_batches(gate, batch_format="pandas"), ["user_id"], steps
    )

    def total(p: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_view": [np.int64(p["n_view"].sum())],
                "n_view_click": [np.int64(p["n_view_click"].sum())],
                "n_view_click_purchase": [np.int64(p["n_view_click_purchase"].sum())],
            }
        )

    return parts.repartition(1).map_batches(total, batch_format="pandas")


def customer_order_outer(sf_dir: str) -> "ray.data.Dataset":
    """FULL OUTER customer⋈orders accounting — the join type that
    completes the engine's family (inner/broadcast/semi/anti/bloom/
    as-of already exist): rows are classified matched / customer_only /
    order_only and aggregated, so outer semantics are proven without
    nullable columns crossing the driver compare.

    Uses the hash-partitioned shuffle join (`stages/joins.hash_join`
    with join_type='full_outer'); the classify+count runs as a combiner
    before one tiny grouped exchange on the 3-row category key.  Each
    side is pre-filtered (customers key<1000, only 'F' orders) so every
    synthetic scale actually produces unmatched rows on BOTH sides —
    otherwise the outer semantics would never leave the matched branch.
    """
    from kire_ray.stages.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: b[b["c_custkey"] < 1000].assign(k=b["c_custkey"]),
        batch_format="pandas",
    )
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderstatus"]
    ).map_batches(
        lambda b: b[b["o_orderstatus"] == "F"].assign(k=b["o_custkey"]),
        batch_format="pandas",
    )
    j = hash_join(
        cust.select_columns(["k", "c_custkey"]),
        orders.select_columns(["k", "o_custkey", "o_totalprice"]),
        ["k"],
        join_type="full_outer",
    )

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        has_c = b["c_custkey"].notna().to_numpy()
        has_o = b["o_custkey"].notna().to_numpy()
        # Ray 2.49's hash full_outer emits one all-NULL row per empty
        # input block (measured: 21 phantom rows on this shape) — a
        # both-sides-NULL row cannot exist in a true outer join, so
        # dropping is exact, same family as joins.normalize_blocks
        keep = has_c | has_o
        b, has_c, has_o = b[keep], has_c[keep], has_o[keep]
        side = np.where(has_c & has_o, "matched",
                        np.where(has_c, "customer_only", "order_only"))
        return (
            pd.DataFrame(
                {"side": side, "price": b["o_totalprice"].fillna(0.0).to_numpy()}
            )
            .groupby("side", sort=False)
            .agg(n_rows=("price", "size"), total_price=("price", "sum"))
            .reset_index()
        )

    return grouped_agg(
        j.map_batches(classify, batch_format="pandas"),
        ["side"],
        {"n_rows": ("n_rows", "sum"), "total_price": ("total_price", "sum")},
        post=lambda out: out.assign(
            n_rows=out["n_rows"].astype(np.int64),
            total_price=round_half_up(out["total_price"], 2),
        ),
    )


def lineitem_corr(
    sf_dir: str,
    cols: tuple[str, ...] = ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
) -> "ray.data.Dataset":
    """Pairwise Pearson correlation matrix over the fact table's
    numeric columns — the feature-association profile a curation
    pipeline computes before pruning redundant columns.

    ONE streaming pass: each block emits its Gram-matrix partial
    (XᵀX, column sums, row count — a single flattened row per block);
    the driver sums the fixed-size partials (k² + k + 1 doubles —
    sketch-sized by construction) and finishes the closed-form moment
    correlations. No shuffle at all. Moment expressions are mirrored
    literally in the SQL oracle (same formula as
    ``events_regression``); rounding absorbs summation-order jitter.

    Returns one row per unordered pair (col_a < col_b): n, corr.
    """
    k = len(cols)
    li = _read(sf_dir, "lineitem", list(cols))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = b[list(cols)].to_numpy(np.float64)
        g = X.T @ X
        row = {"n": float(len(b))}
        for i, c in enumerate(cols):
            row[f"s_{i}"] = X[:, i].sum()
            for jj in range(i, k):
                row[f"g_{i}_{jj}"] = g[i, jj]
        return pd.DataFrame([row])

    tot = (
        li.map_batches(partial, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sum()
    )
    n = tot["n"]
    rows = []
    for i in range(k):
        for jj in range(i + 1, k):
            sx, sy = tot[f"s_{i}"], tot[f"s_{jj}"]
            sxx, syy, sxy = tot[f"g_{i}_{i}"], tot[f"g_{jj}_{jj}"], tot[f"g_{i}_{jj}"]
            corr = (n * sxy - sx * sy) / np.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
            rows.append((cols[i], cols[jj], int(n), corr))
    out = pd.DataFrame(rows, columns=["col_a", "col_b", "n", "corr"])
    out["corr"] = round_half_up(out["corr"].to_numpy(np.float64), 6)
    out["n"] = out["n"].astype(np.int64)
    return ray.data.from_pandas(out)


def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    top: int = 10,
    *,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q3 shape — the top unshipped orders by revenue for one
    market segment: date-filtered fact⋈fact join, grouped revenue,
    global top-k.

    Plan: the segment filter over customer is size-thresholded
    (customer scales with SF): under ``broadcast_limit`` rows the
    segment custkeys ride as a broadcast set applied inside the orders
    scan (no shuffle); above it, a distributed semi-join
    orders⋈customer(segment) on custkey replaces the broadcast — same
    rows either way (tests assert equality + path choice). Then ONE
    fact⋈fact hash join lineitem⋈orders on orderkey (both sides pruned
    to 3 columns and date-filtered BEFORE the exchange — predicate
    pushdown is what keeps the shuffle small); per-order revenue via
    block-local combiner + one grouped exchange; partial top-k per
    block before the driver-side k-row merge (the
    ``top_parts_by_revenue`` pattern). Deterministic order: revenue
    desc, then o_orderdate asc, l_orderkey asc.
    """
    from kire_ray.stages.joins import hash_join

    cut = pd.Timestamp(cutoff)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                      "o_orderpriority"])

    if _nrows_parquet(f"{sf_dir}/customer.parquet") <= broadcast_limit:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ).to_pandas()
        seg_keys = frozenset(cust[cust["c_mktsegment"] == segment]["c_custkey"])
        seg_ref = ray.put(seg_keys)

        def o_side(b: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(seg_ref)
            b = b[(b["o_orderdate"] < cut) & b["o_custkey"].isin(keys)]
            return b[["o_orderkey", "o_orderdate", "o_orderpriority"]]
    else:
        seg_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "o_custkey": b.loc[
                        b["c_mktsegment"] == segment, "c_custkey"
                    ].to_numpy()
                }
            ),
            batch_format="pandas",
        )
        pre = orders.map_batches(
            lambda b: b[b["o_orderdate"] < cut], batch_format="pandas"
        )
        # customer is unique on custkey → inner join == semi-join;
        # materialize before the stacked fact⋈fact join (joins.py)
        orders = hash_join(pre, seg_ds, ["o_custkey"]).materialize()

        def o_side(b: pd.DataFrame) -> pd.DataFrame:
            if "o_orderkey" not in b.columns:
                return pd.DataFrame(
                    {
                        "o_orderkey": pd.Series([], dtype=np.int64),
                        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                        "o_orderpriority": pd.Series([], dtype=object),
                    }
                )
            return b[["o_orderkey", "o_orderdate", "o_orderpriority"]]

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def l_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] > cut]
        return pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].to_numpy(),
                "rev": (b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy(),
            }
        )

    j = hash_join(
        li.map_batches(l_side, batch_format="pandas"),
        orders.map_batches(o_side, batch_format="pandas"),
        ["o_orderkey"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if "rev" not in b.columns:  # schema-less empty join block
            return pd.DataFrame(
                {"o_orderkey": pd.Series([], dtype=np.int64),
                 "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                 "o_orderpriority": pd.Series([], dtype=object),
                 "revenue": pd.Series([], dtype=np.float64)}
            )
        g = (
            b.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"], sort=False)
            ["rev"].sum().rename("revenue").reset_index()
        )
        return g

    per_order = grouped_agg(
        j.map_batches(partial, batch_format="pandas"),
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
        {"revenue": ("revenue", "sum")},
    )

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["revenue", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(top)

    merged = topk(
        per_order.map_batches(topk, batch_format="pandas").to_pandas()
    ).reset_index(drop=True)
    merged["revenue"] = round_half_up(merged["revenue"].to_numpy(np.float64), 6)
    merged["o_orderkey"] = merged["o_orderkey"].astype(np.int64)
    return ray.data.from_pandas(
        merged[["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]]
    )


def q10_returned_items(sf_dir: str, top: int = 20) -> "ray.data.Dataset":
    """TPC-H Q10 shape — customers ranked by revenue lost to returned
    items, with their nation name: the returned-item report.

    Plan mirrors Q3/Q5: the return-flag filter prunes lineitem BEFORE
    the single fact⋈fact hash join on orderkey (orders side reduced to
    orderkey→custkey); per-customer revenue via block-local combiner +
    one grouped exchange; partial top-k per block then a k-row driver
    merge. Customer names/nations attach AFTER the top-k via a
    predicate-pushdown read filtered to the k surviving custkeys — the
    customer table scales with SF (it is NOT a dimension), so a
    driver-built custkey→name dict would be multi-GB at the target
    scale while the filtered read stays k-row-bounded at any scale.
    Deterministic order: revenue desc, c_custkey asc.
    """
    from kire_ray.stages.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def l_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        return pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].to_numpy(),
                "rev": (b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy(),
            }
        )

    j = hash_join(
        li.map_batches(l_side, batch_format="pandas"),
        orders,
        ["o_orderkey"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if "rev" not in b.columns:
            return pd.DataFrame(
                {"o_custkey": pd.Series([], dtype=np.int64),
                 "revenue": pd.Series([], dtype=np.float64)}
            )
        return (
            b.groupby("o_custkey", sort=False)["rev"]
            .sum()
            .rename("revenue")
            .reset_index()
        )

    per_cust = grouped_agg(
        j.map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        {"revenue": ("revenue", "sum")},
    )

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["revenue", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(top)

    merged = topk(
        per_cust.map_batches(topk, batch_format="pandas").to_pandas()
    ).reset_index(drop=True)
    # k-row-bounded name lookup: row-filtered, column-pruned read
    import pyarrow.dataset as pads

    keys = [int(x) for x in merged["o_custkey"]]
    cust = (
        pads.dataset(f"{sf_dir}/customer.parquet")
        .to_table(
            columns=["c_custkey", "c_name", "c_nationkey"],
            filter=pads.field("c_custkey").isin(keys),
        )
        .to_pandas()
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    out = merged.merge(cust, left_on="o_custkey", right_on="c_custkey")
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "c_custkey": out["o_custkey"].astype(np.int64),
                "c_name": out["c_name"],
                "n_name": out["n_name"],
                "revenue": round_half_up(
                    out["revenue"].to_numpy(np.float64), 6
                ),
            }
        )
    )


def _nrows_parquet(path: str) -> int:
    """Metadata-only row count of a parquet file/dir (no data read) —
    the size probe behind the broadcast-vs-join plan choice."""
    import pyarrow.dataset as pads

    return pads.dataset(path).count_rows()


def q5_local_supplier_revenue(
    sf_dir: str, region: str = "ASIA", *, broadcast_limit: int = 1_000_000
) -> "ray.data.Dataset":
    """TPC-H Q5 shape — revenue per nation from lineitems whose
    customer and supplier share the nation, nation restricted to one
    region: the canonical multi-way join.

    The distributed plan has exactly ONE fact⋈fact exchange (lineitem ⋈
    orders on orderkey, both sides column-pruned to 2-4 columns before
    the shuffle); nation⋈region is a true dimension and always rides
    broadcast. Customer and supplier scale WITH SF (they are not
    dimensions), so their id→nationkey maps are size-thresholded
    (metadata row count, no data read):

    - ≤ ``broadcast_limit`` rows: driver dict + ``ray.put``, applied
      inside map_batches — zero extra shuffles;
    - above it: two distributed hash joins (orders⋈customer on custkey,
      lineitem⋈supplier on suppkey) BEFORE the fact⋈fact exchange —
      the plan every distributed SQL engine picks for Q5 once the
      "small" sides stop fitting an executor. Both paths feed the same
      combiner and produce identical rows (tests assert equality and
      the path choice).

    The final aggregate is a per-nation combiner into a 5-row exchange.
    """
    from kire_ray.stages.joins import hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    in_region = nat[nat["r_name"] == region]
    n_name = dict(zip(in_region["n_nationkey"], in_region["n_name"]))
    names_ref = ray.put(n_name)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    use_broadcast = (
        max(
            _nrows_parquet(f"{sf_dir}/customer.parquet"),
            _nrows_parquet(f"{sf_dir}/supplier.parquet"),
        )
        <= broadcast_limit
    )

    if use_broadcast:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        supp = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        c_nat_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
        s_nat_ref = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))

        def o_side(b: pd.DataFrame) -> pd.DataFrame:
            cn = ray.get(c_nat_ref)
            return pd.DataFrame(
                {
                    "o_orderkey": b["o_orderkey"].to_numpy(),
                    "c_nat": b["o_custkey"].map(cn).to_numpy(np.int64),
                }
            )

        def l_side(b: pd.DataFrame) -> pd.DataFrame:
            sn = ray.get(s_nat_ref)
            return pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "s_nat": b["l_suppkey"].map(sn).to_numpy(np.int64),
                    "rev": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                }
            )

        o_branch = orders.map_batches(o_side, batch_format="pandas")
        l_branch = li.map_batches(l_side, batch_format="pandas")
    else:
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "o_custkey": b["c_custkey"].to_numpy(),
                    "c_nat": b["c_nationkey"].to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        )
        supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "l_suppkey": b["s_suppkey"].to_numpy(),
                    "s_nat": b["s_nationkey"].to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        )
        # materialize the two dim-join outputs: stacked lazy
        # Dataset.join stages deadlock the streaming executor (measured
        # Ray 2.49 — see stages/joins.py)
        o_branch = (
            hash_join(orders, cust_ds, ["o_custkey"])
            .map_batches(
                lambda b: b[["o_orderkey", "c_nat"]]
                if "c_nat" in b.columns
                else pd.DataFrame(
                    {
                        "o_orderkey": pd.Series([], dtype=np.int64),
                        "c_nat": pd.Series([], dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            )
            .materialize()
        )

        def l_pre(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "l_suppkey": b["l_suppkey"].to_numpy(),
                    "rev": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                }
            )

        l_branch = (
            hash_join(
                li.map_batches(l_pre, batch_format="pandas"),
                supp_ds,
                ["l_suppkey"],
            )
            .map_batches(
                lambda b: b[["o_orderkey", "s_nat", "rev"]]
                if "s_nat" in b.columns
                else pd.DataFrame(
                    {
                        "o_orderkey": pd.Series([], dtype=np.int64),
                        "s_nat": pd.Series([], dtype=np.int64),
                        "rev": pd.Series([], dtype=np.float64),
                    }
                ),
                batch_format="pandas",
            )
            .materialize()
        )

    j = hash_join(l_branch, o_branch, ["o_orderkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(names_ref)
        if "c_nat" not in b.columns or "s_nat" not in b.columns:
            return pd.DataFrame(
                {"n_name": pd.Series([], dtype=object),
                 "revenue": pd.Series([], dtype=np.float64)}
            )
        b = b[(b["c_nat"] == b["s_nat"]) & b["s_nat"].isin(names)]
        out = (
            b.groupby("s_nat", sort=False)["rev"].sum().rename("revenue").reset_index()
        )
        out["n_name"] = out["s_nat"].map(names)
        return out[["n_name", "revenue"]]

    return grouped_agg(
        j.map_batches(partial, batch_format="pandas"),
        ["n_name"],
        {"revenue": ("revenue", "sum")},
        post=lambda out: out.assign(revenue=round_half_up(out["revenue"], 2)),
    )


def customer_status_setops(sf_dir: str) -> "ray.data.Dataset":
    """Distributed INTERSECT / EXCEPT in one pass: customers with 'F'
    orders vs customers with 'O' orders, classified into f_only /
    o_only / both — the set-operation family done as a single grouped
    exchange over per-block (custkey, has_f, has_o) flag partials
    instead of two separate distinct+join passes.
    """
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderstatus"].isin(["F", "O"])]
        return (
            pd.DataFrame(
                {
                    "o_custkey": b["o_custkey"].to_numpy(),
                    "has_f": (b["o_orderstatus"] == "F").to_numpy(np.int8),
                    "has_o": (b["o_orderstatus"] == "O").to_numpy(np.int8),
                }
            )
            .groupby("o_custkey", sort=False)
            .max()
            .reset_index()
        )

    def classify(out: pd.DataFrame) -> pd.DataFrame:
        side = np.where(
            (out["has_f"] > 0) & (out["has_o"] > 0),
            "both",
            np.where(out["has_f"] > 0, "f_only", "o_only"),
        )
        return pd.DataFrame({"o_custkey": out["o_custkey"].to_numpy(), "side": side})

    return grouped_agg(
        orders.map_batches(flags, batch_format="pandas"),
        ["o_custkey"],
        {"has_f": ("has_f", "max"), "has_o": ("has_o", "max")},
        post=classify,
    )


def q6_forecast_revenue(
    sf_dir: str,
    *,
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> "ray.data.Dataset":
    """TPC-H Q6 — forecasting revenue change: one filtered scan of
    lineitem, block-local partial sums, a one-row reduce. The simplest
    possible distributed plan (no shuffle at all: partials are
    1-row-per-block) and the canonical predicate-pushdown showcase —
    only the four needed columns leave the parquet."""
    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    li = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b["l_shipdate"] >= lo)
            & (b["l_shipdate"] < hi)
            & (b["l_discount"] >= disc_lo)
            & (b["l_discount"] <= disc_hi)
            & (b["l_quantity"] < max_qty)
        )
        rev = (b.loc[m, "l_extendedprice"] * b.loc[m, "l_discount"]).sum()
        return pd.DataFrame({"revenue": [float(rev)], "n": [int(m.sum())]})

    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "revenue": round_half_up(
                    np.array([parts["revenue"].sum()]), 6
                ),
                "n_items": np.array([parts["n"].sum()], dtype=np.int64),
            }
        )
    )


def q14_promo_revenue(
    sf_dir: str,
    *,
    date_lo: str = "1997-09-01",
    date_hi: str = "1997-10-01",
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q14 — promotion revenue share: date-filtered lineitem ⋈
    part on partkey, conditional revenue sums, one output row.

    part scales with SF, so the lookup is size-thresholded exactly like
    q3/q5: under ``broadcast_limit`` rows the partkey→is-promo map is a
    broadcast dict applied inside the lineitem scan (no shuffle);
    above it a distributed hash join on partkey replaces the broadcast.
    Revenue = extendedprice·(1−discount), promo share in percent."""
    from kire_ray.stages.joins import hash_join

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def date_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        return b[["l_partkey", "l_extendedprice", "l_discount"]]

    li = li.map_batches(date_filter, batch_format="pandas")

    if _nrows_parquet(f"{sf_dir}/part.parquet") <= broadcast_limit:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        ).to_pandas()
        promo_ref = ray.put(frozenset(part.loc[part["p_type"] == "PROMO", "p_partkey"]))

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            promo = ray.get(promo_ref)
            b = b.copy()
            b["is_promo"] = b["l_partkey"].isin(promo)
            return b

        joined = li.map_batches(tag, batch_format="pandas")
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "l_partkey": b["p_partkey"].to_numpy(),
                    "is_promo": (b["p_type"] == "PROMO").to_numpy(),
                }
            ),
            batch_format="pandas",
        )
        joined = hash_join(li, part_ds, ["l_partkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if "l_extendedprice" not in b.columns:  # schema-less empty join
            return pd.DataFrame({"promo": [0.0], "total": [0.0]})
        rev = b["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - b["l_discount"].to_numpy(np.float64)
        )
        return pd.DataFrame(
            {
                "promo": [float(rev[b["is_promo"].to_numpy(bool)].sum())],
                "total": [float(rev.sum())],
            }
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    promo, total = parts["promo"].sum(), parts["total"].sum()
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "promo_revenue": round_half_up(np.array([promo]), 6),
                "total_revenue": round_half_up(np.array([total]), 6),
                "promo_share_pct": round_half_up(
                    np.array([100.0 * promo / total if total else 0.0]), 6
                ),
            }
        )
    )


def q4_order_priority(
    sf_dir: str,
    *,
    date_lo: str = "1997-01-01",
    date_hi: str = "1997-04-01",
) -> "ray.data.Dataset":
    """TPC-H Q4 shape — order-priority checking: count orders of one
    quarter that have at least one lineitem shipped AFTER the order
    date (the corpus lacks commit/receipt dates, so the reference's
    ``l_commitdate < l_receiptdate`` EXISTS becomes the equivalent
    correlated-date EXISTS ``l_shipdate > o_orderdate``).

    The correlated EXISTS distributes as ONE tagged exchange on
    orderkey (the incremental_dedup pattern): lineitem ships one
    block-local MAX(l_shipdate) partial per (orderkey, block), the
    date-filtered orders ride the same exchange, and the reducer
    evaluates ``max(max_ship) > o_orderdate`` with every row of an
    orderkey co-located — no separate join barrier. The reduced output
    is priority-cardinality partials folded by a second (tiny) grouped
    exchange.
    """
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def max_ship(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("l_orderkey", sort=False)["l_shipdate"].max()
        return pd.DataFrame(
            {
                "o_orderkey": g.index.to_numpy(),
                "max_ship": g.to_numpy(),
                "o_orderdate": pd.Series([pd.NaT] * len(g)),
                "o_orderpriority": pd.Series([None] * len(g), dtype=object),
            }
        )

    def o_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "max_ship": pd.Series([pd.NaT] * len(b)),
                "o_orderdate": b["o_orderdate"].to_numpy(),
                "o_orderpriority": b["o_orderpriority"].to_numpy(),
            }
        )

    both = li.map_batches(max_ship, batch_format="pandas").union(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(o_side, batch_format="pandas")
    )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("o_orderkey", sort=False)
        ms = g["max_ship"].max()
        orders = part[part["o_orderpriority"].notna()]
        keep = orders[
            orders["o_orderdate"] < ms.reindex(orders["o_orderkey"]).to_numpy()
        ]
        c = keep.groupby("o_orderpriority", sort=False).size()
        return pd.DataFrame(
            {
                "o_orderpriority": c.index.to_numpy(),
                "order_count": c.to_numpy(np.int64),
            }
        )

    return grouped_agg(
        partitioned_map_groups(both, ["o_orderkey"], reduce_part),
        ["o_orderpriority"],
        {"order_count": ("order_count", "sum")},
    )


def q18_large_volume_customers(
    sf_dir: str, *, min_qty: float = 250.0, top: int = 100
) -> "ray.data.Dataset":
    """TPC-H Q18 shape — large-volume customers: orders whose total
    lineitem quantity exceeds ``min_qty``, ranked by order value.

    The HAVING-subquery join distributes as ONE tagged exchange on
    orderkey (the q4 pattern): lineitem ships block-local
    SUM(l_quantity) partials, orders ride the same exchange, and the
    reducer folds partials, applies the HAVING filter and attaches the
    co-located order row — no separate join barrier and no broadcast of
    a data-dependent qualifying set. Top-k (totalprice desc, orderdate,
    orderkey) runs as per-block partials + a k-row driver merge; the
    customer name attaches AFTER the top-k via a k-row predicate-
    pushdown read (the q10 pattern — customer scales with SF).
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_part(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("l_orderkey", sort=False)["l_quantity"].sum()
        return pd.DataFrame(
            {
                "o_orderkey": g.index.to_numpy(),
                "qty": g.to_numpy(np.float64),
                "o_custkey": np.full(len(g), -1, dtype=np.int64),
                "o_totalprice": np.full(len(g), np.nan),
                "o_orderdate": pd.Series([pd.NaT] * len(g)),
            }
        )

    def o_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "qty": np.full(len(b), np.nan),
                "o_custkey": b["o_custkey"].to_numpy(),
                "o_totalprice": b["o_totalprice"].to_numpy(),
                "o_orderdate": b["o_orderdate"].to_numpy(),
            }
        )

    both = li.map_batches(qty_part, batch_format="pandas").union(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
        ).map_batches(o_side, batch_format="pandas")
    )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        qty = part.groupby("o_orderkey", sort=False)["qty"].sum()
        big = qty[qty > min_qty]
        orders = part[part["o_custkey"] >= 0]
        keep = orders[orders["o_orderkey"].isin(big.index)]
        return pd.DataFrame(
            {
                "o_orderkey": keep["o_orderkey"].to_numpy(),
                "o_custkey": keep["o_custkey"].to_numpy(),
                "o_orderdate": keep["o_orderdate"].to_numpy(),
                "o_totalprice": keep["o_totalprice"].to_numpy(),
                "total_qty": big.reindex(keep["o_orderkey"]).to_numpy(np.float64),
            }
        )

    qualified = partitioned_map_groups(both, ["o_orderkey"], reduce_part)

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["o_totalprice", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(top)

    merged = topk(
        qualified.map_batches(topk, batch_format="pandas").to_pandas()
    ).reset_index(drop=True)

    import pyarrow.dataset as pads

    keys = [int(x) for x in merged["o_custkey"]]
    cust = (
        pads.dataset(f"{sf_dir}/customer.parquet")
        .to_table(
            columns=["c_custkey", "c_name"],
            filter=pads.field("c_custkey").isin(keys),
        )
        .to_pandas()
    )
    out = merged.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
        kind="mergesort",
    )
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "c_name": out["c_name"].to_numpy(),
                "c_custkey": out["c_custkey"].to_numpy(np.int64),
                "o_orderkey": out["o_orderkey"].to_numpy(np.int64),
                "o_orderdate": out["o_orderdate"].to_numpy(),
                "o_totalprice": round_half_up(
                    out["o_totalprice"].to_numpy(np.float64), 6
                ),
                "total_qty": round_half_up(out["total_qty"].to_numpy(np.float64), 6),
            }
        )
    )


def q22_dormant_customers(
    sf_dir: str, *, cutoff: str = "2001-01-01"
) -> "ray.data.Dataset":
    """TPC-H Q22 shape — global sales opportunity: above-average-balance
    customers with NO recent order (the corpus has no phone column, so
    the country-code grouping becomes the nation key and "never ordered"
    becomes "no order since ``cutoff``" — at every synthetic scale each
    customer has *some* order, so the unmodified anti-join would be
    vacuously empty).

    Three distributed pieces: (1) the scalar AVG over positive balances
    is block-local partial sums + a driver fold; (2) the NOT-EXISTS
    anti-join runs as ONE tagged exchange on custkey — customer rows and
    block-local distinct custkeys of recent orders ride together, and
    the reducer keeps customers with no order tag (no broadcast of the
    fact-sized order keys); (3) per-nation counts fold via block-local
    combiners + a 25-row grouped exchange.
    """
    cut = pd.Timestamp(cutoff)
    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]

    # (1) scalar subquery: avg of positive account balances
    def bal_part(b: pd.DataFrame) -> pd.DataFrame:
        pos = b.loc[b["c_acctbal"] > 0.0, "c_acctbal"]
        return pd.DataFrame({"s": [float(pos.sum())], "n": [int(pos.size)]})

    parts = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(bal_part, batch_format="pandas")
        .to_pandas()
    )
    avg_bal = parts["s"].sum() / max(parts["n"].sum(), 1)

    # (2) tagged anti-join exchange on custkey
    def c_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["c_acctbal"] > avg_bal]
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].to_numpy(),
                "c_nationkey": b["c_nationkey"].to_numpy(np.int64),
                "c_acctbal": b["c_acctbal"].to_numpy(),
            }
        )

    def o_side(b: pd.DataFrame) -> pd.DataFrame:
        k = b.loc[b["o_orderdate"] >= cut, "o_custkey"].unique()
        return pd.DataFrame(
            {
                "c_custkey": k,
                "c_nationkey": np.full(len(k), -1, dtype=np.int64),
                "c_acctbal": np.full(len(k), np.nan),
            }
        )

    both = (
        _read(sf_dir, "customer", cust_cols)
        .map_batches(c_side, batch_format="pandas")
        .union(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
                o_side, batch_format="pandas"
            )
        )
    )

    def anti(part: pd.DataFrame) -> pd.DataFrame:
        has_order = set(part.loc[part["c_nationkey"] < 0, "c_custkey"])
        keep = part[
            (part["c_nationkey"] >= 0) & ~part["c_custkey"].isin(has_order)
        ]
        g = keep.groupby("c_nationkey", sort=False)["c_acctbal"].agg(["size", "sum"])
        return pd.DataFrame(
            {
                "cntry": g.index.to_numpy(np.int64),
                "numcust": g["size"].to_numpy(np.int64),
                "totacctbal": g["sum"].to_numpy(np.float64),
            }
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out["totacctbal"] = round_half_up(out["totacctbal"].to_numpy(np.float64), 6)
        return out.sort_values("cntry", kind="mergesort")

    return grouped_agg(
        partitioned_map_groups(both, ["c_custkey"], anti),
        ["cntry"],
        {"numcust": ("numcust", "sum"), "totacctbal": ("totacctbal", "sum")},
        post=post,
    )


def q17_small_quantity_revenue(
    sf_dir: str,
    *,
    brand: str = "Brand#13",
    frac: float = 0.2,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q17 shape — small-quantity-order revenue: average yearly
    revenue lost if small orders (below ``frac``× the part's mean
    quantity) of one brand were not filled.

    The correlated AVG-subquery needs every lineitem of a part in one
    place ONCE: brand partkeys prune lineitem at the scan (broadcast
    set under ``broadcast_limit`` part rows, else a distributed hash
    join — the q14 threshold pattern), then a single exchange on
    partkey lets the reducer compute each part's mean quantity and the
    below-threshold revenue sum locally. Output is one row
    (avg_yearly = Σprice/7) folded from per-partition partials.
    """
    from kire_ray.stages.joins import hash_join

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )

    if _nrows_parquet(f"{sf_dir}/part.parquet") <= broadcast_limit:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        ).to_pandas()
        brand_ref = ray.put(
            frozenset(part.loc[part["p_brand"] == brand, "p_partkey"])
        )

        def prune(b: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(brand_ref)
            return b[b["l_partkey"].isin(keys)]

        pruned = li.map_batches(prune, batch_format="pandas")
    else:
        brand_parts = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
            lambda b: pd.DataFrame(
                {"l_partkey": b.loc[b["p_brand"] == brand, "p_partkey"].to_numpy()}
            ),
            batch_format="pandas",
        )
        pruned = hash_join(li, brand_parts, ["l_partkey"])

    def reduce_part(part_df: pd.DataFrame) -> pd.DataFrame:
        g = part_df.groupby("l_partkey", sort=False)["l_quantity"]
        thresh = (g.transform("mean") * frac).to_numpy()
        m = part_df["l_quantity"].to_numpy() < thresh
        return pd.DataFrame(
            {"s": [float(part_df.loc[m, "l_extendedprice"].sum())]}
        )

    parts = (
        partitioned_map_groups(pruned, ["l_partkey"], reduce_part)
        .to_pandas()
    )
    # all-filtered collect is schema-less (the q11/q16/q21 guard): a
    # brand with no matching lineitems means avg_yearly = 0
    total = float(parts["s"].sum()) if "s" in parts.columns and len(parts) else 0.0
    return ray.data.from_pandas(
        pd.DataFrame(
            {"avg_yearly": round_half_up(np.array([total / 7.0]), 6)}
        )
    )


def q7_volume_shipping(
    sf_dir: str,
    *,
    group_a: tuple = ("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"),
    group_b: tuple = ("NATION_5", "NATION_6", "NATION_7", "NATION_8", "NATION_9"),
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q7 shape — volume shipping between two nation groups:
    revenue of lineitems shipped by a supplier in one group to a
    customer in the other (either direction), grouped by
    (supp_nation, cust_nation, ship year). Groups rather than TPC-H's
    single nation pair because the synthetic corpus spreads 25 nations
    thinly — a single pair is empty at sf0.001.

    supplier and customer scale with SF, so both nation lookups are
    size-thresholded (broadcast dict under ``broadcast_limit`` rows,
    else a distributed hash join — the q5 pattern). Each fact side is
    pruned to the two nations BEFORE the single fact⋈fact exchange on
    orderkey (the q4 tagged-union pattern: lineitem partials and tagged
    orders ride one exchange); the reducer joins co-located rows, drops
    same-nation pairs, and emits per-(pair, year) combiner rows folded
    by a tiny grouped exchange.
    """
    from kire_ray.stages.joins import hash_join

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    grp = {n: 0 for n in group_a} | {n: 1 for n in group_b}
    nk = {
        int(r.n_nationkey): r.n_name
        for r in nat.itertuples()
        if r.n_name in grp
    }

    def nation_map(table: str, key_col: str, nat_col: str) -> dict[int, str]:
        t = pq.read_table(
            f"{sf_dir}/{table}.parquet", columns=[key_col, nat_col]
        ).to_pandas()
        m = t[nat_col].map(nk)
        return dict(zip(t.loc[m.notna(), key_col], m.dropna()))

    li_cols = ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    li = _read(sf_dir, "lineitem", li_cols)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    small = _nrows_parquet(f"{sf_dir}/supplier.parquet") <= broadcast_limit and (
        _nrows_parquet(f"{sf_dir}/customer.parquet") <= broadcast_limit
    )
    if small:
        supp_ref = ray.put(nation_map("supplier", "s_suppkey", "s_nationkey"))
        cust_ref = ray.put(nation_map("customer", "c_custkey", "c_nationkey"))

        def l_side(b: pd.DataFrame) -> pd.DataFrame:
            smap = ray.get(supp_ref)
            b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
            sn = b["l_suppkey"].map(smap)
            b = b[sn.notna()]
            return pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "supp_nation": sn.dropna().to_numpy(),
                    "cust_nation": pd.Series([None] * len(b), dtype=object),
                    "l_year": b["l_shipdate"].dt.year.to_numpy(np.int64),
                    "volume": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                }
            )

        def o_side(b: pd.DataFrame) -> pd.DataFrame:
            cmap = ray.get(cust_ref)
            cn = b["o_custkey"].map(cmap)
            b = b[cn.notna()]
            return pd.DataFrame(
                {
                    "o_orderkey": b["o_orderkey"].to_numpy(),
                    "supp_nation": pd.Series([None] * len(b), dtype=object),
                    "cust_nation": cn.dropna().to_numpy(),
                    "l_year": np.full(len(b), -1, dtype=np.int64),
                    "volume": np.full(len(b), np.nan),
                }
            )

        l_tag = li.map_batches(l_side, batch_format="pandas")
        o_tag = orders.map_batches(o_side, batch_format="pandas")
    else:
        # distributed nation attach on each fact side, then the same
        # tagged exchange — no driver-sized map anywhere. The nation
        # filters leave schema-less empty blocks behind (the Ray 2.49
        # quirk), so every join input is normalize_blocks-ed, and the
        # two joins are materialized apart (stacked lazy Dataset.join
        # stages deadlock the streaming executor — see q5).
        from kire_ray.stages.joins import normalize_blocks

        supp, n_s = normalize_blocks(
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "l_suppkey": b["s_suppkey"].to_numpy(),
                        "supp_nation": b["s_nationkey"].map(nk).to_numpy(object),
                    }
                ).dropna(subset=["supp_nation"]),
                batch_format="pandas",
            )
        )
        cust, n_c = normalize_blocks(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "o_custkey": b["c_custkey"].to_numpy(),
                        "cust_nation": b["c_nationkey"].map(nk).to_numpy(object),
                    }
                ).dropna(subset=["cust_nation"]),
                batch_format="pandas",
            )
        )
        if supp is None or cust is None:
            return ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "supp_nation": pd.Series([], dtype=object),
                        "cust_nation": pd.Series([], dtype=object),
                        "l_year": pd.Series([], dtype=np.int64),
                        "revenue": pd.Series([], dtype=np.float64),
                    }
                )
            )

        def l_pre(b: pd.DataFrame) -> pd.DataFrame:
            b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
            return pd.DataFrame(
                {
                    "l_suppkey": b["l_suppkey"].to_numpy(),
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "l_year": b["l_shipdate"].dt.year.to_numpy(np.int64),
                    "volume": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                }
            )

        li_pruned, n_li = normalize_blocks(
            li.map_batches(l_pre, batch_format="pandas")
        )
        if li_pruned is None:
            return ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "supp_nation": pd.Series([], dtype=object),
                        "cust_nation": pd.Series([], dtype=object),
                        "l_year": pd.Series([], dtype=np.int64),
                        "revenue": pd.Series([], dtype=np.float64),
                    }
                )
            )
        def _tag_empty() -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "supp_nation": pd.Series([], dtype=object),
                    "cust_nation": pd.Series([], dtype=object),
                    "l_year": pd.Series([], dtype=np.int64),
                    "volume": pd.Series([], dtype=np.float64),
                }
            )

        # empty join partitions emit schema-less blocks (q5 guard)
        l_tag = (
            hash_join(li_pruned, supp, ["l_suppkey"])
            .map_batches(
                lambda b: b.assign(
                    cust_nation=pd.Series([None] * len(b), dtype=object)
                )[["o_orderkey", "supp_nation", "cust_nation", "l_year", "volume"]]
                if "supp_nation" in b.columns
                else _tag_empty(),
                batch_format="pandas",
            )
            .materialize()
        )
        o_tag = hash_join(orders, cust, ["o_custkey"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "o_orderkey": b["o_orderkey"].to_numpy(),
                    "supp_nation": pd.Series([None] * len(b), dtype=object),
                    "cust_nation": b["cust_nation"].to_numpy(object),
                    "l_year": np.full(len(b), -1, dtype=np.int64),
                    "volume": np.full(len(b), np.nan),
                }
            )
            if "cust_nation" in b.columns
            else _tag_empty(),
            batch_format="pandas",
        )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        o = part[part["cust_nation"].notna()][["o_orderkey", "cust_nation"]]
        l = part[part["supp_nation"].notna()]
        j = l.merge(o, on="o_orderkey", suffixes=("", "_o"))
        j = j[j["supp_nation"].map(grp) != j["cust_nation_o"].map(grp)]
        g = j.groupby(
            ["supp_nation", "cust_nation_o", "l_year"], sort=False
        )["volume"].sum()
        out = g.reset_index()
        return pd.DataFrame(
            {
                "supp_nation": out["supp_nation"].to_numpy(object),
                "cust_nation": out["cust_nation_o"].to_numpy(object),
                "l_year": out["l_year"].to_numpy(np.int64),
                "revenue": out["volume"].to_numpy(np.float64),
            }
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out["revenue"] = round_half_up(out["revenue"].to_numpy(np.float64), 6)
        return out.sort_values(
            ["supp_nation", "cust_nation", "l_year"], kind="mergesort"
        )

    return grouped_agg(
        partitioned_map_groups(l_tag.union(o_tag), ["o_orderkey"], reduce_part),
        ["supp_nation", "cust_nation", "l_year"],
        {"revenue": ("revenue", "sum")},
        post=post,
    )


def q13_order_count_distribution(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed exactly N qualifying orders, INCLUDING the zero
    bucket (the LEFT-OUTER part; orders are restricted to status 'F'
    so every scale produces genuinely unmatched customers).

    Two chained exchanges, both combiner-fed: (1) per-block order-count
    partials and customer keys ride one exchange on custkey, the
    reducer emits each customer's total count (0 when no order row
    arrived); (2) per-(count) combiner rows fold via a tiny grouped
    exchange into (c_count, custdist).
    """

    def o_part(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.loc[b["o_orderstatus"] == "F"]
            .groupby("o_custkey", sort=False)
            .size()
        )
        return pd.DataFrame(
            {
                "c_custkey": g.index.to_numpy(),
                "n": g.to_numpy(np.int64),
                "is_cust": np.zeros(len(g), dtype=bool),
            }
        )

    def c_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].to_numpy(),
                "n": np.zeros(len(b), dtype=np.int64),
                "is_cust": np.ones(len(b), dtype=bool),
            }
        )

    both = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(o_part, batch_format="pandas")
        .union(
            _read(sf_dir, "customer", ["c_custkey"]).map_batches(
                c_side, batch_format="pandas"
            )
        )
    )

    def per_cust(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("c_custkey", sort=False).agg(
            n=("n", "sum"), is_cust=("is_cust", "any")
        )
        g = g[g["is_cust"]]
        c = g.groupby("n", sort=False).size()
        return pd.DataFrame(
            {
                "c_count": c.index.to_numpy(np.int64),
                "custdist": c.to_numpy(np.int64),
            }
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        return out.sort_values(
            ["custdist", "c_count"], ascending=[False, False], kind="mergesort"
        )

    return grouped_agg(
        partitioned_map_groups(both, ["c_custkey"], per_cust),
        ["c_count"],
        {"custdist": ("custdist", "sum")},
        post=post,
    )


def q8_market_share(
    sf_dir: str,
    *,
    region: str = "ASIA",
    supp_group: tuple = ("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"),
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q8 shape — national market share: of all order revenue
    shipped to customers in one REGION, the share supplied by one
    nation group, per order year. (The corpus lacks part-type filters'
    selectivity at small SF, so the part predicate is dropped and the
    "nation" generalizes to the synthetic nation group, as q7.)

    Same distributed skeleton as q5/q7: nation/region are true
    dimensions (always broadcast); the supplier→in-group and
    customer→in-region maps are size-thresholded (broadcast dict under
    ``broadcast_limit``, else distributed hash joins); ONE fact⋈fact
    exchange on orderkey joins lineitem volume to the order's year and
    region-filtered customer; the share is a conditional-sum combiner
    into a years-sized grouped exchange.
    """
    from kire_ray.stages.joins import hash_join, normalize_blocks

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    region_keys = set(nat.loc[nat["r_name"] == region, "n_nationkey"])
    group_keys = set(nat.loc[nat["n_name"].isin(supp_group), "n_nationkey"])

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    small = max(
        _nrows_parquet(f"{sf_dir}/supplier.parquet"),
        _nrows_parquet(f"{sf_dir}/customer.parquet"),
    ) <= broadcast_limit

    if small:
        supp = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        in_group_ref = ray.put(
            frozenset(supp.loc[supp["s_nationkey"].isin(group_keys), "s_suppkey"])
        )
        in_region_ref = ray.put(
            frozenset(cust.loc[cust["c_nationkey"].isin(region_keys), "c_custkey"])
        )

        def l_side(b: pd.DataFrame) -> pd.DataFrame:
            grp = ray.get(in_group_ref)
            return pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "volume": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                    "in_group": b["l_suppkey"].isin(grp).to_numpy(),
                    "o_year": np.full(len(b), -1, dtype=np.int64),
                }
            )

        def o_side(b: pd.DataFrame) -> pd.DataFrame:
            rg = ray.get(in_region_ref)
            b = b[b["o_custkey"].isin(rg)]
            return pd.DataFrame(
                {
                    "o_orderkey": b["o_orderkey"].to_numpy(),
                    "volume": np.full(len(b), np.nan),
                    "in_group": np.zeros(len(b), dtype=bool),
                    "o_year": b["o_orderdate"].dt.year.to_numpy(np.int64),
                }
            )

        l_tag = li.map_batches(l_side, batch_format="pandas")
        o_tag = orders.map_batches(o_side, batch_format="pandas")
    else:
        supp_ds, _ = normalize_blocks(
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "l_suppkey": b["s_suppkey"].to_numpy(),
                        "in_group": b["s_nationkey"].isin(group_keys).to_numpy(),
                    }
                ),
                batch_format="pandas",
            )
        )
        cust_ds, _ = normalize_blocks(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "o_custkey": b.loc[
                            b["c_nationkey"].isin(region_keys), "c_custkey"
                        ].to_numpy()
                    }
                ),
                batch_format="pandas",
            )
        )
        if cust_ds is None:
            return ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "o_year": pd.Series([], dtype=np.int64),
                        "mkt_share_pct": pd.Series([], dtype=np.float64),
                    }
                )
            )

        def l_pre(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "l_suppkey": b["l_suppkey"].to_numpy(),
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "volume": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                }
            )

        l_tag = (
            hash_join(
                li.map_batches(l_pre, batch_format="pandas"),
                supp_ds,
                ["l_suppkey"],
            )
            .map_batches(
                lambda b: pd.DataFrame(
                    {
                        "o_orderkey": b["o_orderkey"].to_numpy(),
                        "volume": b["volume"].to_numpy(),
                        "in_group": b["in_group"].to_numpy(bool),
                        "o_year": np.full(len(b), -1, dtype=np.int64),
                    }
                )
                if "in_group" in b.columns
                else pd.DataFrame(
                    {
                        "o_orderkey": pd.Series([], dtype=np.int64),
                        "volume": pd.Series([], dtype=np.float64),
                        "in_group": pd.Series([], dtype=bool),
                        "o_year": pd.Series([], dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            )
            .materialize()
        )
        o_tag = hash_join(orders, cust_ds, ["o_custkey"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "o_orderkey": b["o_orderkey"].to_numpy(),
                    "volume": np.full(len(b), np.nan),
                    "in_group": np.zeros(len(b), dtype=bool),
                    "o_year": b["o_orderdate"].dt.year.to_numpy(np.int64),
                }
            )
            if "o_orderdate" in b.columns
            else pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "volume": pd.Series([], dtype=np.float64),
                    "in_group": pd.Series([], dtype=bool),
                    "o_year": pd.Series([], dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        o = part[part["o_year"] >= 0][["o_orderkey", "o_year"]]
        l = part[part["o_year"] < 0]
        j = l.merge(o, on="o_orderkey", suffixes=("_l", ""))
        j = j.assign(gvol=j["volume"].to_numpy() * j["in_group"].to_numpy())
        g = j.groupby("o_year", sort=False).agg(
            group_vol=("gvol", "sum"), total_vol=("volume", "sum")
        )
        out = g.reset_index()
        return pd.DataFrame(
            {
                "o_year": out["o_year"].to_numpy(np.int64),
                "group_vol": out["group_vol"].to_numpy(np.float64),
                "total_vol": out["total_vol"].to_numpy(np.float64),
            }
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out["mkt_share_pct"] = round_half_up(
            100.0 * out["group_vol"].to_numpy(np.float64)
            / out["total_vol"].to_numpy(np.float64),
            6,
        )
        return out[["o_year", "mkt_share_pct"]].sort_values(
            "o_year", kind="mergesort"
        )

    return grouped_agg(
        partitioned_map_groups(l_tag.union(o_tag), ["o_orderkey"], reduce_part),
        ["o_year"],
        {"group_vol": ("group_vol", "sum"), "total_vol": ("total_vol", "sum")},
        post=post,
    )


def q9_product_type_profit(
    sf_dir: str,
    *,
    part_match: str = "AR",
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q9 shape — product-type revenue by supplier nation and
    order year (the corpus has no partsupp/supplycost, so "profit"
    reduces to revenue = Σ extendedprice·(1−discount); the part
    predicate keeps Q9's name-match shape via substring on p_type).

    Three attaches around ONE fact⋈fact exchange: the matching-part
    keyset prunes lineitem at the scan (broadcast set under
    ``broadcast_limit``, else hash join); supplier→nation rides the
    same size threshold; orders contributes the year through the
    orderkey exchange; per-(nation, year) combiner into a tiny
    grouped exchange.
    """
    from kire_ray.stages.joins import hash_join, normalize_blocks

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nk = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    small = max(
        _nrows_parquet(f"{sf_dir}/part.parquet"),
        _nrows_parquet(f"{sf_dir}/supplier.parquet"),
    ) <= broadcast_limit

    if small:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        ).to_pandas()
        keys_ref = ray.put(
            frozenset(
                part.loc[
                    part["p_type"].str.contains(part_match, regex=False),
                    "p_partkey",
                ]
            )
        )
        supp = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        snat_ref = ray.put(
            dict(
                zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].map(nk))
            )
        )

        def l_side(b: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(keys_ref)
            snat = ray.get(snat_ref)
            b = b[b["l_partkey"].isin(keys)]
            return pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "nation": b["l_suppkey"].map(snat).to_numpy(object),
                    "volume": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                    "o_year": np.full(len(b), -1, dtype=np.int64),
                }
            )

        l_tag = li.map_batches(l_side, batch_format="pandas")
    else:
        part_ds, _ = normalize_blocks(
            _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "l_partkey": b.loc[
                            b["p_type"].str.contains(part_match, regex=False),
                            "p_partkey",
                        ].to_numpy()
                    }
                ),
                batch_format="pandas",
            )
        )
        supp_ds, _ = normalize_blocks(
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "l_suppkey": b["s_suppkey"].to_numpy(),
                        "nation": b["s_nationkey"].map(nk).to_numpy(object),
                    }
                ),
                batch_format="pandas",
            )
        )
        if part_ds is None:
            return ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "nation": pd.Series([], dtype=object),
                        "o_year": pd.Series([], dtype=np.int64),
                        "revenue": pd.Series([], dtype=np.float64),
                    }
                )
            )
        pruned = hash_join(li, part_ds, ["l_partkey"]).materialize()
        l_tag = hash_join(pruned, supp_ds, ["l_suppkey"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "nation": b["nation"].to_numpy(object),
                    "volume": (
                        b["l_extendedprice"] * (1.0 - b["l_discount"])
                    ).to_numpy(),
                    "o_year": np.full(len(b), -1, dtype=np.int64),
                }
            )
            if "nation" in b.columns
            else pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "nation": pd.Series([], dtype=object),
                    "volume": pd.Series([], dtype=np.float64),
                    "o_year": pd.Series([], dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ).materialize()

    def o_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "nation": pd.Series([None] * len(b), dtype=object),
                "volume": np.full(len(b), np.nan),
                "o_year": b["o_orderdate"].dt.year.to_numpy(np.int64),
            }
        )

    o_tag = orders.map_batches(o_side, batch_format="pandas")

    def reduce_part(part_df: pd.DataFrame) -> pd.DataFrame:
        o = part_df[part_df["o_year"] >= 0][["o_orderkey", "o_year"]]
        l = part_df[part_df["o_year"] < 0]
        j = l.merge(o, on="o_orderkey", suffixes=("_l", ""))
        g = j.groupby(["nation", "o_year"], sort=False)["volume"].sum()
        out = g.reset_index()
        return pd.DataFrame(
            {
                "nation": out["nation"].to_numpy(object),
                "o_year": out["o_year"].to_numpy(np.int64),
                "revenue": out["volume"].to_numpy(np.float64),
            }
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out["revenue"] = round_half_up(out["revenue"].to_numpy(np.float64), 6)
        return out.sort_values(["nation", "o_year"], kind="mergesort")

    return grouped_agg(
        partitioned_map_groups(l_tag.union(o_tag), ["o_orderkey"], reduce_part),
        ["nation", "o_year"],
        {"revenue": ("revenue", "sum")},
        post=post,
    )


def q15_top_supplier(
    sf_dir: str,
    *,
    date_lo: str = "1997-01-01",
    date_hi: str = "1997-04-01",
) -> "ray.data.Dataset":
    """TPC-H Q15 shape — top supplier(s) by quarterly revenue, ties
    included (the reference's revenue VIEW + WHERE total = MAX(total)).

    One filtered lineitem scan with block-local per-suppkey partials,
    one grouped exchange to finalize supplier revenue, then the global
    max folds from per-block 1-row maxima and the equality filter
    streams — no global sort for a single-max query. Supplier names
    attach post-filter via the q10 k-row predicate-pushdown read.
    """
    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    li = _read(
        sf_dir,
        "lineitem",
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        rev = b["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - b["l_discount"].to_numpy(np.float64)
        )
        g = pd.DataFrame({"s_suppkey": b["l_suppkey"].to_numpy(), "r": rev}).groupby(
            "s_suppkey", sort=False
        )["r"].sum()
        return pd.DataFrame(
            {"s_suppkey": g.index.to_numpy(), "total_revenue": g.to_numpy()}
        )

    per_supp = grouped_agg(
        li.map_batches(partial, batch_format="pandas"),
        ["s_suppkey"],
        {"total_revenue": ("total_revenue", "sum")},
    ).materialize()

    def block_max(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"m": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"m": [float(b["total_revenue"].max())]})

    mx = per_supp.map_batches(block_max, batch_format="pandas").to_pandas()
    best = (
        float(mx["m"].max()) if "m" in mx.columns and len(mx) else float("nan")
    )

    winners = (
        per_supp.map_batches(
            lambda b: (
                b[b["total_revenue"] == best]
                if "total_revenue" in b.columns
                else b  # schema-less empty block (empty date window)
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if "s_suppkey" not in winners.columns:
        winners = pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype=np.int64),
             "total_revenue": pd.Series([], dtype=np.float64)}
        )
    winners = winners.sort_values("s_suppkey").reset_index(drop=True)

    import pyarrow.dataset as pads

    keys = [int(x) for x in winners["s_suppkey"]]
    names = (
        pads.dataset(f"{sf_dir}/supplier.parquet")
        .to_table(
            columns=["s_suppkey", "s_name"],
            filter=pads.field("s_suppkey").isin(keys),
        )
        .to_pandas()
    )
    out = winners.merge(names, on="s_suppkey").sort_values("s_suppkey")
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "s_suppkey": out["s_suppkey"].to_numpy(np.int64),
                "s_name": out["s_name"].to_numpy(object),
                "total_revenue": round_half_up(
                    out["total_revenue"].to_numpy(np.float64), 6
                ),
            }
        )
    )

def q12_shipmode_priority(
    sf_dir: str,
    *,
    ship_lo: str = "1997-01-01",
    ship_hi: str = "1998-01-01",
) -> "ray.data.Dataset":
    """TPC-H Q12 shape — shipping-class vs order priority: for each
    lineitem class (the corpus lacks ``l_shipmode``, so the class
    column is ``l_linestatus``; it lacks commit/receipt dates, so the
    late-delivery predicate ``l_commitdate < l_receiptdate`` becomes
    the equivalent correlated-date test ``l_shipdate > o_orderdate``),
    count high-priority vs low-priority orders among one ship-year's
    lineitems.

    Distributes as ONE tagged exchange on orderkey (the q4 pattern):
    the date-filtered lineitems and the order rows ride the same
    exchange; the reducer evaluates the correlated date predicate with
    every row of an orderkey co-located and emits per-class partial
    counts folded by a tiny second grouped exchange. No join barrier,
    no broadcast of a fact-sized table.
    """
    lo, hi = pd.Timestamp(ship_lo), pd.Timestamp(ship_hi)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])

    def li_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        return pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].to_numpy(),
                "l_linestatus": b["l_linestatus"].to_numpy(object),
                "l_shipdate": b["l_shipdate"].to_numpy(),
                "o_orderdate": pd.Series([pd.NaT] * len(b)),
                "o_orderpriority": pd.Series([None] * len(b), dtype=object),
            }
        )

    def o_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "l_linestatus": pd.Series([None] * len(b), dtype=object),
                "l_shipdate": pd.Series([pd.NaT] * len(b)),
                "o_orderdate": b["o_orderdate"].to_numpy(),
                "o_orderpriority": b["o_orderpriority"].to_numpy(object),
            }
        )

    both = li.map_batches(li_side, batch_format="pandas").union(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(o_side, batch_format="pandas")
    )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        li_rows = part[part["l_linestatus"].notna()]
        o_rows = part[part["o_orderpriority"].notna()]
        m = li_rows.merge(
            o_rows[["o_orderkey", "o_orderdate", "o_orderpriority"]]
            .rename(columns={"o_orderdate": "od", "o_orderpriority": "pr"}),
            on="o_orderkey",
        )
        m = m[m["l_shipdate"] > m["od"]]
        high = m["pr"].isin(("1-URGENT", "2-HIGH")).to_numpy()
        g = pd.DataFrame(
            {"l_linestatus": m["l_linestatus"].to_numpy(object), "h": high}
        ).groupby("l_linestatus", sort=False)["h"]
        return pd.DataFrame(
            {
                "l_linestatus": g.sum().index.to_numpy(object),
                "high_line_count": g.sum().to_numpy(np.int64),
                "low_line_count": (g.count() - g.sum()).to_numpy(np.int64),
            }
        )

    out = grouped_agg(
        partitioned_map_groups(both, ["o_orderkey"], reduce_part),
        ["l_linestatus"],
        {
            "high_line_count": ("high_line_count", "sum"),
            "low_line_count": ("low_line_count", "sum"),
        },
    ).to_pandas()
    out = out.sort_values("l_linestatus").reset_index(drop=True)
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return ray.data.from_pandas(out)


_Q19_ARMS = (
    ("Brand#1", 1, 15, 1.0, 11.0),
    ("Brand#2", 1, 25, 10.0, 20.0),
    ("Brand#3", 1, 35, 20.0, 30.0),
)


def q19_discounted_revenue(
    sf_dir: str,
    *,
    arms: tuple = _Q19_ARMS,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q19 — discounted revenue under an OR of three conjunctive
    (brand, size-range, quantity-range) predicates over lineitem⋈part
    (the corpus lacks ``p_container``/``l_shipmode``, so each arm is
    the available brand/size/quantity conjunction).

    part attrs join via broadcast under ``broadcast_limit`` rows (dims
    `ray.put` once, read per actor) else a distributed hash join — the
    q14/q17 threshold pattern; the arm disjunction is ONE vectorized
    numpy mask per batch; revenue folds from per-batch partial sums
    (one row per block, no shuffle).
    """
    from kire_ray.stages.joins import hash_join

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    if _nrows_parquet(f"{sf_dir}/part.parquet") <= broadcast_limit:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
        ).to_pandas()
        brands = {a[0] for a in arms}
        part = part[part["p_brand"].isin(brands)].rename(
            columns={"p_partkey": "l_partkey"}
        )
        joined = broadcast_join(li, part, ["l_partkey"], how="inner")
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
            lambda b: b[b["p_brand"].isin({a[0] for a in arms})].rename(
                columns={"p_partkey": "l_partkey"}
            ),
            batch_format="pandas",
        )
        joined = hash_join(li, part_ds, ["l_partkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if "p_brand" not in b.columns:  # schema-less empty join block
            return pd.DataFrame({"s": [0.0]})
        keep = np.zeros(len(b), dtype=bool)
        for brand, size_lo, size_hi, qty_lo, qty_hi in arms:
            keep |= (
                (b["p_brand"].to_numpy(object) == brand)
                & (b["p_size"].to_numpy() >= size_lo)
                & (b["p_size"].to_numpy() <= size_hi)
                & (b["l_quantity"].to_numpy() >= qty_lo)
                & (b["l_quantity"].to_numpy() <= qty_hi)
            )
        rev = (
            b["l_extendedprice"].to_numpy()[keep]
            * (1.0 - b["l_discount"].to_numpy()[keep])
        ).sum()
        return pd.DataFrame({"s": [float(rev)]})

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    return ray.data.from_pandas(
        pd.DataFrame(
            {"revenue": round_half_up(np.array([parts["s"].sum()]), 6)}
        )
    )

def q2_min_cost_supplier(
    sf_dir: str,
    *,
    region: str = "AFRICA",
    ptype: str = "LARGE",
    max_size: int = 25,
    top: int = 100,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q2 shape — min-cost supplier per part: for each qualifying
    part, the region's cheapest supplier among those that actually
    supplied it (the corpus lacks ``partsupp``, so "supplied" = a
    distinct (l_partkey, l_suppkey) pair in lineitem and the supply
    cost is the supplier's ``s_acctbal``).

    The correlated MIN-subquery distributes as ONE exchange on partkey:
    supplier attrs (region-filtered via the nation/region dims,
    broadcast under ``broadcast_limit`` supplier rows else a hash
    join) attach per batch, then each part's rows co-locate once and
    the reducer dedups pairs and keeps the min-cost ties locally. Final
    order is a per-block top-k partial + a k-row driver merge (the q18
    pattern); part attrs attach the same thresholded way.
    """
    from kire_ray.stages.joins import hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nmap = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nmap_ref = ray.put(nmap)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        lambda b: b.drop_duplicates(), batch_format="pandas"
    )

    if _nrows_parquet(f"{sf_dir}/supplier.parquet") <= broadcast_limit:
        sup = pq.read_table(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        ).to_pandas()
        sup = sup[sup["s_nationkey"].isin(nmap)].copy()
        sup["n_name"] = sup["s_nationkey"].map(nmap)
        eligible = broadcast_join(
            li,
            sup[["s_suppkey", "s_name", "s_acctbal", "n_name"]].rename(
                columns={"s_suppkey": "l_suppkey"}
            ),
            ["l_suppkey"],
            how="inner",
        )
    else:
        def sup_side(b: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(nmap_ref)
            b = b[b["s_nationkey"].isin(m)].copy()
            b["n_name"] = b["s_nationkey"].map(m)
            return b[["s_suppkey", "s_name", "s_acctbal", "n_name"]].rename(
                columns={"s_suppkey": "l_suppkey"}
            )

        sup_ds = _read(
            sf_dir, "supplier",
            ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        ).map_batches(sup_side, batch_format="pandas")
        from kire_ray.stages.joins import normalize_blocks

        # join outputs can carry schema-less empty partitions that the
        # exchange's add_pid would KeyError on (the q7/q16 guard)
        eligible, _ = normalize_blocks(hash_join(li, sup_ds, ["l_suppkey"]))

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_partkey", "l_suppkey"])
        m = g.groupby("l_partkey", sort=False)["s_acctbal"].transform("min")
        return g[g["s_acctbal"].to_numpy() == m.to_numpy()]

    winners = partitioned_map_groups(eligible, ["l_partkey"], keep_min)

    if _nrows_parquet(f"{sf_dir}/part.parquet") <= broadcast_limit:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type", "p_size"]
        ).to_pandas()
        part = part[
            (part["p_type"] == ptype) & (part["p_size"] <= max_size)
        ].rename(columns={"p_partkey": "l_partkey"})
        qualified = broadcast_join(
            winners, part[["l_partkey", "p_type"]], ["l_partkey"], how="inner"
        )
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_type", "p_size"]).map_batches(
            lambda b: b[(b["p_type"] == ptype) & (b["p_size"] <= max_size)][
                ["p_partkey", "p_type"]
            ].rename(columns={"p_partkey": "l_partkey"}),
            batch_format="pandas",
        )
        qualified = hash_join(winners, part_ds, ["l_partkey"])

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        if "s_acctbal" not in b.columns:  # schema-less empty join block
            return b
        return b.sort_values(
            ["s_acctbal", "n_name", "s_name", "l_partkey"],
            ascending=[False, True, True, True],
            kind="mergesort",
        ).head(top)

    out = qualified.map_batches(topk, batch_format="pandas").to_pandas()
    if out.empty:  # all-filtered collect is schema-less
        out = pd.DataFrame(
            {
                "s_acctbal": [],
                "s_name": pd.Series([], dtype=object),
                "n_name": pd.Series([], dtype=object),
                "l_partkey": [],
                "p_type": pd.Series([], dtype=object),
            }
        )
    out = topk(out).reset_index(drop=True)
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "s_acctbal": round_half_up(out["s_acctbal"].to_numpy(np.float64), 6),
                "s_name": out["s_name"].to_numpy(object),
                "n_name": out["n_name"].to_numpy(object),
                "p_partkey": out["l_partkey"].to_numpy(np.int64),
                "p_type": out["p_type"].to_numpy(object),
            }
        )
    )


def q11_important_stock(
    sf_dir: str,
    *,
    regions: tuple = ("AFRICA", "AMERICA"),
    frac: float | None = None,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q11 shape — important stock: per-part value
    Σ(l_extendedprice·l_quantity) over suppliers in a region group,
    keeping parts whose value exceeds ``frac`` of the total (the
    corpus lacks ``partsupp``, so the value base is lineitem and the
    nation filter is a region group).

    The supplier semi-join is broadcast under ``broadcast_limit``
    supplier rows else a distributed hash join; per-part value
    pre-aggregates in every batch (combiner) before ONE grouped
    exchange; the HAVING total folds from one partial row per block.
    ``frac`` defaults to TPC-H's data-scaled rule (0.0001/SF there;
    2/n_parts here) so the query stays selective-but-non-empty at
    every SF. The qualifying set is ≤ 1/frac rows BY CONSTRUCTION
    (each exceeds frac of the total) — n_parts/2 under the default —
    so the final sort is driver-side today; swap it for Dataset.sort
    at the scale where that bound outgrows the driver.
    """
    from kire_ray.stages.joins import hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkeys = set(reg.loc[reg["r_name"].isin(regions), "r_regionkey"])
    nkeys = set(nat.loc[nat["n_regionkey"].isin(rkeys), "n_nationkey"])

    if frac is None:
        frac = 2.0 / _nrows_parquet(f"{sf_dir}/part.parquet")

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    if _nrows_parquet(f"{sf_dir}/supplier.parquet") <= broadcast_limit:
        sup = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        keys_ref = ray.put(
            frozenset(sup.loc[sup["s_nationkey"].isin(nkeys), "s_suppkey"])
        )

        def prune(b: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keys_ref)
            return b[b["l_suppkey"].isin(ks)]

        pruned = li.map_batches(prune, batch_format="pandas")
    else:
        sup_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda b: pd.DataFrame(
                {"l_suppkey": b.loc[b["s_nationkey"].isin(nkeys), "s_suppkey"].to_numpy()}
            ),
            batch_format="pandas",
        )
        pruned = hash_join(li, sup_ds, ["l_suppkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if "l_extendedprice" not in b.columns:  # schema-less empty join
            return pd.DataFrame(
                {"l_partkey": pd.Series([], dtype=np.int64),
                 "value": pd.Series([], dtype=np.float64)}
            )
        v = b["l_extendedprice"].to_numpy() * b["l_quantity"].to_numpy()
        g = pd.DataFrame({"l_partkey": b["l_partkey"].to_numpy(), "v": v}).groupby(
            "l_partkey", sort=False
        )["v"].sum()
        return pd.DataFrame(
            {"l_partkey": g.index.to_numpy(), "value": g.to_numpy()}
        )

    val = grouped_agg(
        pruned.map_batches(partial, batch_format="pandas"),
        ["l_partkey"],
        {"value": ("value", "sum")},
    )

    def total_part(b: pd.DataFrame) -> pd.DataFrame:
        v = float(b["value"].sum()) if "value" in b.columns else 0.0
        return pd.DataFrame({"s": [v]})

    total = float(
        val.map_batches(total_part, batch_format="pandas")
        .to_pandas()["s"].sum()
    )
    thresh = total * frac

    out = val.map_batches(
        lambda b: b[b["value"].to_numpy() > thresh]
        if "value" in b.columns
        else b,
        batch_format="pandas",
    ).to_pandas()
    if out.empty:
        # an all-filtered Dataset collects schema-less; at large SF the
        # fixed frac legitimately qualifies nothing (TPC-H scales it 1/SF)
        out = pd.DataFrame({"l_partkey": [], "value": []})
    out = out.sort_values(
        ["value", "l_partkey"], ascending=[False, True]
    ).reset_index(drop=True)
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "l_partkey": out["l_partkey"].to_numpy(np.int64),
                "value": round_half_up(out["value"].to_numpy(np.float64), 6),
            }
        )
    )

def q16_supplier_cnt(
    sf_dir: str,
    *,
    excl_brand: str = "Brand#1",
    excl_type: str = "PROMO",
    sizes: tuple = (1, 4, 9, 14, 19, 23, 36, 45),
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q16 shape — supplier count per part attribute combo:
    distinct suppliers per (brand, type, size) over parts NOT of one
    brand/type, for a size list, excluding "complaint" suppliers (the
    corpus lacks ``partsupp``/``s_comment``, so supplied = a lineitem
    pair and the complaint set is ``s_acctbal < 0``).

    part attrs and the NOT-IN supplier set attach broadcast under
    ``broadcast_limit`` rows else via hash join / anti join; the
    COUNT DISTINCT runs as per-batch 4-tuple dedup (combiner) → ONE
    exchange keyed on the group → local dedup + size. The output is
    bounded by the attribute-combination cardinality (a constant), so
    the final sort is driver-side.
    """
    from kire_ray.stages.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    size_set = set(int(s) for s in sizes)

    small_part = _nrows_parquet(f"{sf_dir}/part.parquet") <= broadcast_limit
    if small_part:
        part = pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_type", "p_size"],
        ).to_pandas()
        part = part[
            (part["p_brand"] != excl_brand)
            & (part["p_type"] != excl_type)
            & (part["p_size"].isin(size_set))
        ].rename(columns={"p_partkey": "l_partkey"})
        joined = broadcast_join(li, part, ["l_partkey"], how="inner")
    else:
        part_ds = _read(
            sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
        ).map_batches(
            lambda b: b[
                (b["p_brand"] != excl_brand)
                & (b["p_type"] != excl_type)
                & (b["p_size"].isin(size_set))
            ].rename(columns={"p_partkey": "l_partkey"}),
            batch_format="pandas",
        )
        joined = hash_join(li, part_ds, ["l_partkey"])

    if _nrows_parquet(f"{sf_dir}/supplier.parquet") <= broadcast_limit:
        sup = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
        ).to_pandas()
        from kire_ray.stages.joins import anti_join_broadcast

        joined = anti_join_broadcast(
            joined,
            frozenset(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"]),
            "l_suppkey",
        )
    else:
        from kire_ray.stages.joins import normalize_blocks

        excl_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "l_suppkey": b.loc[b["s_acctbal"] < 0, "s_suppkey"].to_numpy(),
                    "_excl": np.ones(int((b["s_acctbal"] < 0).sum()), dtype=np.int8),
                }
            ),
            batch_format="pandas",
        )
        # two stacked hash joins: normalize between them (schema-less
        # empty blocks from the first break the second; see
        # joins.normalize_blocks) and short-circuit an empty NOT-IN set
        joined, _ = normalize_blocks(joined)
        excl_ds, n_excl = normalize_blocks(excl_ds)
        if joined is not None and n_excl > 0:
            joined = hash_join(
                joined, excl_ds, ["l_suppkey"], join_type="left_outer"
            ).map_batches(
                lambda b: b[b["_excl"].isna()].drop(columns=["_excl"])
                if "_excl" in b.columns
                else b,
                batch_format="pandas",
            )
        if joined is None:
            joined = ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "l_partkey": pd.Series([], dtype=np.int64),
                        "l_suppkey": pd.Series([], dtype=np.int64),
                        "p_brand": pd.Series([], dtype=object),
                        "p_type": pd.Series([], dtype=object),
                        "p_size": pd.Series([], dtype=np.int64),
                    }
                )
            )

    keys = ["p_brand", "p_type", "p_size", "l_suppkey"]

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(keys)
        c = d.groupby(["p_brand", "p_type", "p_size"], sort=False).size()
        idx = c.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "p_brand": idx["p_brand"].to_numpy(object),
                "p_type": idx["p_type"].to_numpy(object),
                "p_size": idx["p_size"].to_numpy(np.int64),
                "supplier_cnt": c.to_numpy(np.int64),
            }
        )

    grouped = partitioned_map_groups(
        joined.map_batches(
            lambda b: b.drop_duplicates(keys), batch_format="pandas"
        ),
        ["p_brand", "p_type", "p_size"],
        cnt,
    )
    out = grouped.to_pandas()
    if out.empty:  # all-filtered collect is schema-less
        out = pd.DataFrame(
            {
                "p_brand": pd.Series([], dtype=object),
                "p_type": pd.Series([], dtype=object),
                "p_size": [],
                "supplier_cnt": [],
            }
        )
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)
    out["p_size"] = out["p_size"].astype(np.int64)
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    return ray.data.from_pandas(out)


def q20_excess_suppliers(
    sf_dir: str,
    *,
    prefix: str = "large",
    min_qty: float = 100.0,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """TPC-H Q20 shape — suppliers with excess stock of one part
    family: suppliers whose shipped quantity of any '``prefix``%'-named
    part exceeds ``min_qty`` (the corpus lacks ``partsupp.availqty``,
    so the half-of-availqty test becomes a fixed quantity threshold
    over the same nested-IN chain: name-like parts → per
    (supplier, part) quantity sums → qualifying supplier keys).

    The name-like partkey set broadcasts under ``broadcast_limit``
    part rows else joins hash-partitioned; (suppkey, partkey) sums
    pre-aggregate per batch before ONE grouped exchange; the
    qualifying supplier set is data-dependent-small, so names attach
    via a k-row predicate-pushdown read (the q18 customer pattern).
    """
    from kire_ray.stages.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    if _nrows_parquet(f"{sf_dir}/part.parquet") <= broadcast_limit:
        part = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
        ).to_pandas()
        keys_ref = ray.put(
            frozenset(
                part.loc[
                    part["p_name"].str.startswith(prefix), "p_partkey"
                ]
            )
        )

        def prune(b: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keys_ref)
            return b[b["l_partkey"].isin(ks)]

        pruned = li.map_batches(prune, batch_format="pandas")
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "l_partkey": b.loc[
                        b["p_name"].str.startswith(prefix), "p_partkey"
                    ].to_numpy()
                }
            ),
            batch_format="pandas",
        )
        pruned = hash_join(li, part_ds, ["l_partkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["l_suppkey", "l_partkey"], sort=False)["l_quantity"].sum()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "l_suppkey": idx["l_suppkey"].to_numpy(),
                "l_partkey": idx["l_partkey"].to_numpy(),
                "q": g.to_numpy(np.float64),
            }
        )

    sums = grouped_agg(
        pruned.map_batches(partial, batch_format="pandas"),
        ["l_suppkey", "l_partkey"],
        {"q": ("q", "sum")},
    )

    def qual_part(b: pd.DataFrame) -> pd.DataFrame:
        if "q" not in b.columns:  # schema-less empty exchange block
            return pd.DataFrame({"l_suppkey": pd.Series([], dtype=np.int64)})
        return pd.DataFrame(
            {"l_suppkey": b.loc[b["q"].to_numpy() > min_qty, "l_suppkey"].unique()}
        )

    qual_df = sums.map_batches(qual_part, batch_format="pandas").to_pandas()
    qual = (
        qual_df["l_suppkey"].unique()
        if "l_suppkey" in qual_df.columns
        else np.array([], dtype=np.int64)
    )

    import pyarrow.dataset as pads

    sup = (
        pads.dataset(f"{sf_dir}/supplier.parquet")
        .to_table(
            columns=["s_suppkey", "s_name", "s_nationkey"],
            filter=pads.field("s_suppkey").isin([int(k) for k in qual]),
        )
        .to_pandas()
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    sup["n_name"] = sup["s_nationkey"].map(
        dict(zip(nat["n_nationkey"], nat["n_name"]))
    )
    out = sup.sort_values("s_name").reset_index(drop=True)
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "s_name": out["s_name"].to_numpy(object),
                "n_name": out["n_name"].to_numpy(object),
            }
        )
    )


def q21_waiting_suppliers(sf_dir: str, *, top: int = 100) -> "ray.data.Dataset":
    """TPC-H Q21 shape — suppliers who kept orders waiting: for
    finished (status 'F') multi-supplier orders where EXACTLY ONE
    supplier's items were flagged, count that supplier's flagged items
    (the corpus lacks commit/receipt dates, so "late" =
    ``l_returnflag = 'R'``; the EXISTS/NOT-EXISTS self-joins become
    the co-located supplier-set tests).

    The double correlated EXISTS distributes as ONE tagged exchange on
    orderkey: lineitem ships per-(orderkey, suppkey) flagged/total
    partial counts (combiner), the F-orders ride the same exchange,
    and the reducer evaluates the sole-late-supplier rule with every
    row of an orderkey co-located — vectorized, no self-join barrier.
    Supplier names attach via a k-row predicate-pushdown read.
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

    def li_side(b: pd.DataFrame) -> pd.DataFrame:
        late = (b["l_returnflag"].to_numpy(object) == "R").astype(np.int64)
        g = pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].to_numpy(),
                "l_suppkey": b["l_suppkey"].to_numpy(),
                "n_late": late,
            }
        ).groupby(["o_orderkey", "l_suppkey"], sort=False)["n_late"].sum()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "o_orderkey": idx["o_orderkey"].to_numpy(),
                "l_suppkey": idx["l_suppkey"].to_numpy(np.int64),
                "n_late": g.to_numpy(np.int64),
            }
        )

    def o_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderstatus"] == "F"]
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "l_suppkey": np.full(len(b), -1, dtype=np.int64),
                "n_late": np.zeros(len(b), dtype=np.int64),
            }
        )

    both = li.map_batches(li_side, batch_format="pandas").union(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
            o_side, batch_format="pandas"
        )
    )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        fkeys = part.loc[part["l_suppkey"] < 0, "o_orderkey"].unique()
        li_rows = part[part["l_suppkey"] >= 0]
        li_rows = li_rows[li_rows["o_orderkey"].isin(fkeys)]
        agg = (
            li_rows.groupby(["o_orderkey", "l_suppkey"], sort=False)["n_late"]
            .sum()
            .reset_index()
        )
        per_order = agg.groupby("o_orderkey", sort=False).agg(
            nsupp=("l_suppkey", "size"),
            nlate_sups=("n_late", lambda s: int((s.to_numpy() > 0).sum())),
        )
        qual = per_order[
            (per_order["nsupp"] >= 2) & (per_order["nlate_sups"] == 1)
        ].index
        late = agg[(agg["n_late"] > 0) & agg["o_orderkey"].isin(qual)]
        g = late.groupby("l_suppkey", sort=False)["n_late"].sum()
        return pd.DataFrame(
            {
                "l_suppkey": g.index.to_numpy(np.int64),
                "numwait": g.to_numpy(np.int64),
            }
        )

    counts = grouped_agg(
        partitioned_map_groups(both, ["o_orderkey"], reduce_part),
        ["l_suppkey"],
        {"numwait": ("numwait", "sum")},
    ).to_pandas()
    if counts.empty:  # all-filtered collect is schema-less
        counts = pd.DataFrame({"l_suppkey": [], "numwait": []})

    import pyarrow.dataset as pads

    names = (
        pads.dataset(f"{sf_dir}/supplier.parquet")
        .to_table(
            columns=["s_suppkey", "s_name"],
            filter=pads.field("s_suppkey").isin(
                [int(k) for k in counts["l_suppkey"]]
            ),
        )
        .to_pandas()
    )
    out = (
        counts.merge(names, left_on="l_suppkey", right_on="s_suppkey")
        .sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(top)
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "s_name": out["s_name"].to_numpy(object),
                "numwait": out["numwait"].to_numpy(np.int64),
            }
        )
    )


def frequent_itemsets(
    sf_dir: str, *, min_count: int = 2, collect_limit: int = 500_000
) -> "ray.data.Dataset":
    """Market-basket association rules (Agrawal & Srikant Apriori,
    2-itemsets): for every part pair co-ordered at least ``min_count``
    times, the support / confidence / lift triple — the co-occurrence
    screen a curation pipeline runs over (document, tag) or
    (session, item) tables.  Basket = the distinct parts of one order.

    Shape: block-local (orderkey, partkey) dedup combiner → ONE
    exchange on orderkey co-locating each basket → per-partition
    vectorized self-merge emits pair partials PLUS tagged item-count
    (part_b = -1) and basket-count (part_a = -2) rows into the same
    grouped_agg — one shuffle carries all three aggregates (the
    join_size_estimate tagged-exchange pattern).  Rule metrics attach
    the per-item counts via two hash joins (parts scale with SF like
    customer/supplier — a broadcast dict here is the q5/q10 trap), with
    a materialize between the stacked joins (Ray 2.49 deadlocks on
    back-to-back Dataset.join) and normalize_blocks after the filters
    (all-filtered exchange partitions yield schema-less blocks).
    """
    from kire_ray.stages.joins import hash_join, normalize_blocks

    # no pre-exchange dedup pass: (orderkey, partkey) is ~unique in
    # lineitem (599,995/600,000 at sf0.1 — a whole extra pass saved
    # nothing); baskets() dedups after co-location anyway
    dl = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def baskets(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates()
        j = part.merge(part, on="l_orderkey")
        j = j[j["l_partkey_x"] < j["l_partkey_y"]]
        pairs = (
            j.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
            .size()
            .rename("pair_count")
            .reset_index()
        )
        pairs.columns = ["part_a", "part_b", "pair_count"]
        items = (
            part.groupby("l_partkey", sort=False)
            .size()
            .rename("pair_count")
            .reset_index()
        )
        items.columns = ["part_a", "pair_count"]
        items["part_b"] = np.int64(-1)
        tot = pd.DataFrame(
            {
                "part_a": [np.int64(-2)],
                "part_b": [np.int64(-2)],
                "pair_count": [np.int64(part["l_orderkey"].nunique())],
            }
        )
        out = pd.concat(
            [pairs, items[["part_a", "part_b", "pair_count"]], tot],
            ignore_index=True,
        )
        out["part_a"] = out["part_a"].astype(np.int64)
        out["part_b"] = out["part_b"].astype(np.int64)
        out["pair_count"] = out["pair_count"].astype(np.int64)
        return out

    def keep(out: pd.DataFrame) -> pd.DataFrame:
        # prune inside the reducer: rare pairs die here (1.2M -> ~k
        # rows at sf0.1), so the three downstream passes and both
        # joins run over survivors + tag rows only
        return out[(out["part_a"] < 0) | (out["pair_count"] >= min_count)]

    agg = grouped_agg(
        partitioned_map_groups(dl, ["l_orderkey"], baskets),
        ["part_a", "part_b"],
        {"pair_count": ("pair_count", "sum")},
        post=keep,
    ).materialize()

    # vectorized mask filters — a row-lambda Dataset.filter here costs
    # ~50 s on a 120k-row table (Python per-row), the mask is ~0.1 s
    def _mask(pred):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b[pred(b)]

        return f

    n_orders = float(
        agg.map_batches(_mask(lambda b: b["part_a"] == -2), batch_format="pandas")
        .to_pandas()["pair_count"]
        .iloc[0]
    )

    def _typed_empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "part_a": pd.Series([], dtype=np.int64),
                "part_b": pd.Series([], dtype=np.int64),
                "pair_count": pd.Series([], dtype=np.int64),
                "c_a": pd.Series([], dtype=np.int64),
                "c_b": pd.Series([], dtype=np.int64),
                "support": pd.Series([], dtype=np.float64),
                "conf_a_b": pd.Series([], dtype=np.float64),
                "conf_b_a": pd.Series([], dtype=np.float64),
                "lift": pd.Series([], dtype=np.float64),
            }
        )

    pairs, n_pairs = normalize_blocks(
        agg.map_batches(
            _mask(
                lambda b: (b["part_a"] >= 0)
                & (b["part_b"] >= 0)
                & (b["pair_count"] >= min_count)
            ),
            batch_format="pandas",
        )
    )
    if pairs is None:
        return ray.data.from_pandas(_typed_empty())
    items = agg.map_batches(_mask(lambda b: b["part_b"] == -1), batch_format="pandas")

    if n_pairs <= collect_limit:
        # surviving pairs are OUTPUT-sized after the reducer prune —
        # finish on the driver: semi-join the (parts-sized) item counts
        # down to the pair members with a broadcast membership mask,
        # then one pandas merge. Avoids 2 × 64-partition hash joins
        # over a few-thousand-row table (scheduling-bound). The
        # join path below stays for outputs past ``collect_limit``
        # (forced in tests for path equality).
        pdf = pairs.to_pandas()
        members = np.unique(
            np.concatenate([pdf["part_a"].to_numpy(), pdf["part_b"].to_numpy()])
        )
        idf = items.map_batches(
            _mask(lambda b: np.isin(b["part_a"].to_numpy(), members)),
            batch_format="pandas",
        ).to_pandas()
        cnt = idf.set_index("part_a")["pair_count"]
        out = pdf.assign(
            c_a=cnt.reindex(pdf["part_a"]).to_numpy(np.int64),
            c_b=cnt.reindex(pdf["part_b"]).to_numpy(np.int64),
        )
        pc = out["pair_count"].to_numpy(np.float64)
        c_a = out["c_a"].to_numpy(np.float64)
        c_b = out["c_b"].to_numpy(np.float64)
        return ray.data.from_pandas(
            out.assign(
                support=round_half_up(pc / n_orders, 6),
                conf_a_b=round_half_up(pc / c_a, 6),
                conf_b_a=round_half_up(pc / c_b, 6),
                lift=round_half_up(pc * n_orders / (c_a * c_b), 6),
            )
        )

    def as_ca(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "part_a": b["part_a"].astype(np.int64),
                "c_a": b["pair_count"].astype(np.int64),
            }
        )

    def as_cb(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "part_b": b["part_a"].astype(np.int64),
                "c_b": b["pair_count"].astype(np.int64),
            }
        )

    ca, _ = normalize_blocks(items.map_batches(as_ca, batch_format="pandas"))
    cb, _ = normalize_blocks(items.map_batches(as_cb, batch_format="pandas"))
    joined = hash_join(pairs, ca, ["part_a"]).materialize()
    joined = hash_join(joined, cb, ["part_b"])

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        if "pair_count" not in b.columns:  # schema-less empty block
            return _typed_empty()
        pc = b["pair_count"].to_numpy(np.float64)
        c_a = b["c_a"].to_numpy(np.float64)
        c_b = b["c_b"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "part_a": b["part_a"].astype(np.int64),
                "part_b": b["part_b"].astype(np.int64),
                "pair_count": b["pair_count"].astype(np.int64),
                "c_a": b["c_a"].astype(np.int64),
                "c_b": b["c_b"].astype(np.int64),
                "support": round_half_up(pc / n_orders, 6),
                "conf_a_b": round_half_up(pc / c_a, 6),
                "conf_b_a": round_half_up(pc / c_b, 6),
                "lift": round_half_up(pc * n_orders / (c_a * c_b), 6),
            }
        )

    return joined.map_batches(metrics, batch_format="pandas")


def _pareto_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 2-D Pareto filter: keep rows not dominated under
    (minimize p_retailprice, maximize p_size). Dominance = other row
    has price <= AND size >= with at least one strict; exact duplicates
    dominate nothing and are all kept. Sort by (price asc, size desc),
    then a row is dominated iff the running max size over strictly
    cheaper price groups reaches its size, or a same-price row has a
    strictly larger size (the price group's head, sorted desc)."""
    if len(df) == 0 or "p_retailprice" not in df.columns:
        return pd.DataFrame(
            {
                "p_partkey": pd.Series([], dtype=np.int64),
                "p_size": pd.Series([], dtype=np.int32),
                "p_retailprice": pd.Series([], dtype=np.float64),
            }
        )
    d = df.sort_values(
        ["p_retailprice", "p_size"], ascending=[True, False], kind="mergesort"
    )
    price = d["p_retailprice"].to_numpy(np.float64)
    size = d["p_size"].to_numpy(np.int64)
    new_grp = np.concatenate([[True], price[1:] != price[:-1]])
    grp = np.cumsum(new_grp) - 1  # 0-based price-group index per row
    heads = size[new_grp]  # per-group max size (desc within group)
    prev_max = np.concatenate([[np.iinfo(np.int64).min], np.maximum.accumulate(heads)[:-1]])
    dominated = (prev_max[grp] >= size) | (heads[grp] > size)
    return d[~dominated]


def pareto_frontier(sf_dir: str) -> "ray.data.Dataset":
    """Skyline query (Börzsönyi et al. 2001) over part: the Pareto
    frontier under (min p_retailprice, max p_size) — the multi-objective
    screen a data-curation pipeline runs to shortlist candidates
    (cheapest-at-each-quality / best-quality-at-each-cost).

    Shape: block-local Pareto filter (sort + running-max, fully
    vectorized) → single-partition merge of the local frontiers with
    the same kernel. Local frontiers are tiny for any data with spread
    (expected O(log n) per block for independent dims), so the merge
    input is frontier-sized, never data-sized — the classic
    local-prune/global-merge skyline plan."""
    p = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    local = p.map_batches(_pareto_kernel, batch_format="pandas")
    return local.repartition(1).map_batches(_pareto_kernel, batch_format="pandas")


def user_retention_cohorts(sf_dir: str) -> "ray.data.Dataset":
    """Cohort retention triangle: users grouped by their first active
    week (cohort), counted per week-offset they returned — the
    engagement table every events warehouse materializes.

    Shape: block-local (user, week) dedup projection → ONE exchange on
    user_id (each user's weeks co-located; per-user min + offsets are
    then partition-local and vectorized) → grouped-agg combine on
    (cohort_week, week_offset). Both exchanges carry deduped
    user-week rows, never raw events."""
    WEEK = 604800
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        wk = (b["ts"].astype("int64") // 10**6 // WEEK).astype(np.int64)
        return pd.DataFrame(
            {"user_id": b["user_id"].astype(np.int64), "wk": wk}
        ).drop_duplicates()

    def per_user(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates()
        cw = part.groupby("user_id", sort=False)["wk"].transform("min")
        return (
            pd.DataFrame(
                {
                    "cohort_week": cw.to_numpy(np.int64),
                    "week_offset": (part["wk"] - cw).to_numpy(np.int64),
                }
            )
            .groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .rename("n_users")
            .reset_index()
        )

    def post(b: pd.DataFrame) -> pd.DataFrame:
        return b.astype(
            {"cohort_week": np.int64, "week_offset": np.int64, "n_users": np.int64}
        )

    return grouped_agg(
        partitioned_map_groups(
            ev.map_batches(proj, batch_format="pandas"), ["user_id"], per_user
        ),
        ["cohort_week", "week_offset"],
        {"n_users": ("n_users", "sum")},
        post=post,
    )


def events_cume_dist(sf_dir: str, *, n_buckets: int = 1024) -> "ray.data.Dataset":
    """Distributed ``cume_dist() OVER (ORDER BY value)`` — a global
    rank window function without a global sort: cume(v) = |{x ≤ v}|/n.

    Shape: (1) block partials for global min/max (2 doubles/block);
    (2) block-local per-bucket counts on a fixed value grid (≤B rows
    per block) folded on the driver into bucket prefix offsets (B
    rows — constant, like a sketch); (3) ONE exchange on bucket id:
    the grid is monotone, so every value in a lower bucket is strictly
    smaller, and within a bucket a sort + searchsorted(right) gives
    the local ≤-count; offset + local count is the exact global rank.
    Ties share a bucket by construction, so results are exact, not
    approximate. Skew note: a near-constant column collapses into one
    bucket (one hot partition) — the grid assumes value spread.
    """
    from kire_ray.stages.shuffle import partitioned_map_groups as pmg

    ev = _read(sf_dir, "events", ["event_id", "value"])

    mm = ev.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [b["value"].min()], "hi": [b["value"].max()]}
        ),
        batch_format="pandas",
    ).to_pandas()
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    span = (hi - lo) or 1.0

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.minimum(
            ((v - lo) / span * n_buckets).astype(np.int64), n_buckets - 1
        )

    def bcounts(b: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(bucket_of(b["value"].to_numpy(np.float64)), return_counts=True)
        return pd.DataFrame({"bucket": u, "c": c.astype(np.int64)})

    bc = (
        ev.map_batches(bcounts, batch_format="pandas")
        .to_pandas()
        .groupby("bucket")["c"]
        .sum()
    )
    counts = np.zeros(n_buckets, np.int64)
    counts[bc.index.to_numpy()] = bc.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = float(counts.sum())

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = bucket_of(b["value"].to_numpy(np.float64))
        return b

    def per_bucket(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for bk, g in part.groupby("bucket", sort=False):
            v = g["value"].to_numpy(np.float64)
            sv = np.sort(v)
            le = np.searchsorted(sv, v, side="right") + offsets[int(bk)]
            outs.append(
                pd.DataFrame(
                    {
                        "event_id": g["event_id"].to_numpy(np.int64),
                        "value": v,
                        "cume": round_half_up(le / n_total, 6),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "value": pd.Series([], dtype=np.float64),
                    "cume": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return pmg(
        ev.map_batches(add_bucket, batch_format="pandas"), ["bucket"], per_bucket
    )


FK_RELATIONS: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    # deliberately unconstrained pairing — the audit must also REPORT
    # violations, not just confirm clean schemas
    ("events", "user_id", "customer", "c_custkey"),
)


def fk_integrity(sf_dir: str) -> "ray.data.Dataset":
    """Referential-integrity audit over every declared FK relation —
    the data-quality gate a warehouse load runs before publishing:
    per relation, child row/key counts and how many rows/keys have no
    matching parent (orphans).

    Shape: ONE shared tagged exchange for ALL relations — child sides
    ship block-combined (relation, key, n) partials, parent sides ship
    distinct (relation, key) markers, the reducer counts keys lacking
    a parent marker. Shuffle volume is O(distinct keys per block),
    never child rows; adding a relation adds rows to the same
    exchange, not a new one. Each TABLE is read exactly once — a table
    serving several relations (lineitem childs three, nation parents
    two) emits all of its partials from the one scan."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    roles: dict[str, list[tuple[str, str, int]]] = {}
    for child, ckey, parent, pkey in FK_RELATIONS:
        rel = f"{child}.{ckey}->{parent}.{pkey}"
        roles.setdefault(child, []).append((rel, ckey, 0))
        roles.setdefault(parent, []).append((rel, pkey, 1))

    sides = []
    for table, specs in roles.items():
        cols = sorted({c for _, c, _ in specs})

        def table_partial(
            b: pd.DataFrame, specs=tuple(specs)
        ) -> pd.DataFrame:
            outs = []
            for rel, col, is_parent in specs:
                if is_parent:
                    keys = np.unique(b[col].to_numpy(np.int64))
                    outs.append(
                        pd.DataFrame(
                            {
                                "rel": rel,
                                "key": keys,
                                "n": np.int64(0),
                                "is_parent": np.int64(1),
                            }
                        )
                    )
                else:
                    g = (
                        pd.DataFrame({"key": b[col].to_numpy(np.int64)})
                        .groupby("key", sort=False)
                        .size()
                        .rename("n")
                        .reset_index()
                    )
                    g.insert(0, "rel", rel)
                    g["is_parent"] = np.int64(0)
                    outs.append(g)
            return pd.concat(outs, ignore_index=True)

        sides.append(
            _read(sf_dir, table, cols).map_batches(
                table_partial, batch_format="pandas"
            )
        )

    tagged = sides[0]
    for s in sides[1:]:
        tagged = tagged.union(s)

    def per_key(p: pd.DataFrame) -> pd.DataFrame:
        g = (
            p.groupby(["rel", "key"], sort=False)
            .agg(n=("n", "sum"), has_parent=("is_parent", "max"))
            .reset_index()
        )
        child = g[g["n"] > 0]
        orphan = child["has_parent"].to_numpy() == 0
        out = (
            pd.DataFrame(
                {
                    "rel": child["rel"],
                    "n_rows": child["n"].to_numpy(np.int64),
                    "n_keys": np.int64(1),
                    "n_orphan_rows": np.where(orphan, child["n"], 0).astype(np.int64),
                    "n_orphan_keys": orphan.astype(np.int64),
                }
            )
            .groupby("rel", sort=False)
            .sum()
            .reset_index()
        )
        return out

    def finish(out: pd.DataFrame) -> pd.DataFrame:
        for c in ["n_rows", "n_keys", "n_orphan_rows", "n_orphan_keys"]:
            out[c] = out[c].astype(np.int64)
        return out

    return grouped_agg(
        partitioned_map_groups(tagged, ["rel", "key"], per_key),
        ["rel"],
        {
            "n_rows": ("n_rows", "sum"),
            "n_keys": ("n_keys", "sum"),
            "n_orphan_rows": ("n_orphan_rows", "sum"),
            "n_orphan_keys": ("n_orphan_keys", "sum"),
        },
        post=finish,
    )
