"""Temporal operators Ray Data has no built-in for: as-of join,
banded range join, gap-based sessionization.

All three share one distributed shape — they are *key-local, order
dependent* computations, so the engine expresses them as a single hash
exchange on the entity key followed by a vectorized per-partition merge
(sort + ffill / searchsorted / cumsum), never a per-row or per-key
Python loop.  The partitioning assumption each relies on: every row of
one key fits one reducer partition (same contract as the KG assembly
stage; at 100 TB bound hot keys upstream or sub-partition by coarse
time range and stitch the boundary rows).

Relation to the ``relational.py`` siblings (different mechanism AND
different join shape, not re-runs):

- ``sessionize`` numbers sessions 1-based *per user* (the id a
  downstream feature store keys on); ``relational.sessionize_events``
  emits unkeyed session rows.
- ``asof_join_latest_order`` is the CROSS-TABLE point-in-time lookup
  (fact ⋈ dimension-history) via union + grouped forward-fill — the
  shape a feature-backfill pipeline needs;
  ``relational.events_asof_join`` is the self-table purchase→view
  as-of via per-partition ``merge_asof``.
- ``event_pairs_within`` is a banded range SELF-join solved O(n log n)
  with per-user ``searchsorted`` (burst counting);
  ``relational.orders_lineitem_range_join`` is the key+interval
  fact-to-fact variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from kire_ray.functions.rounding import round_half_up
from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    from kire_ray.sources.parquet import sized_read

    return sized_read(f"{sf_dir}/{table}.parquet", columns)


def sessionize(sf_dir: str, gap_s: int = 21600) -> "ray.data.Dataset":
    """Gap-based sessionization (the canonical event-stream windowed
    operator Ray Data lacks): consecutive events of a user belong to
    one session while the inter-event gap stays ≤ ``gap_s``.

    One exchange on user_id; inside each partition the whole
    computation is three numpy passes over the (user, ts)-sorted rows —
    break flags (user change OR gap), session ids (cumsum), and a
    C-speed groupby aggregate.  No per-session or per-user loop.

    Returns one row per session: (user_id, session_id 1-based per
    user, n_events, t_start_us, t_end_us, sum_value).
    """
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    gap_us = int(gap_s) * 1_000_000

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "value": b["value"].to_numpy(),
            }
        )

    def build(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus"], kind="mergesort")
        u = p["user_id"].to_numpy()
        t = p["tus"].to_numpy()
        brk = np.ones(len(p), dtype=np.int64)
        if len(p) > 1:
            same = u[1:] == u[:-1]
            brk[1:] = (~same | (t[1:] - t[:-1] > gap_us)).astype(np.int64)
        # global cumsum gives a partition-unique session key; the
        # per-user 1-based id is recovered after the aggregate
        sid = np.cumsum(brk)
        g = (
            p.assign(__sid=sid)
            .groupby("__sid", sort=True)
            .agg(
                user_id=("user_id", "first"),
                n_events=("tus", "size"),
                t_start_us=("tus", "min"),
                t_end_us=("tus", "max"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        g["session_id"] = g.groupby("user_id", sort=False).cumcount() + 1
        g["sum_value"] = round_half_up(g["sum_value"].to_numpy(np.float64), 6)
        return g[
            ["user_id", "session_id", "n_events", "t_start_us", "t_end_us", "sum_value"]
        ].astype({"n_events": np.int64, "session_id": np.int64})

    return partitioned_map_groups(
        ev.map_batches(to_us, batch_format="pandas"), ["user_id"], build
    )


def asof_join_latest_order(sf_dir: str) -> "ray.data.Dataset":
    """Distributed AS-OF join: each event picks the latest order of the
    same customer at-or-before the event timestamp (the classic
    point-in-time feature lookup; DuckDB spells it ``ASOF JOIN``).

    Shape: both sides are mapped into one (key, tus, side) schema and
    exchanged together on the key; inside a partition one mergesort by
    (key, tus, side) interleaves orders before events at equal time
    (``>=`` inclusivity), then a grouped forward-fill carries the last
    order onto every event row — the textbook sort-merge as-of, fully
    vectorized.  Ties (several orders of one customer on one date) are
    broken deterministically toward the max order key *before* the
    exchange by a block-local combiner + in-partition reduce, so the
    result is partition-layout invariant.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    od = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def ev_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "side": np.int8(1),
                "event_id": b["event_id"].to_numpy(),
                # NaN (not a sentinel) so the grouped ffill carries the
                # last order row over event rows
                "o_orderkey": np.float64(np.nan),
                "o_totalprice": np.float64(np.nan),
            }
        )

    def od_rows(b: pd.DataFrame) -> pd.DataFrame:
        # block-local tie combiner: one candidate per (custkey, date)
        b = b.sort_values("o_orderkey").drop_duplicates(
            ["o_custkey", "o_orderdate"], keep="last"
        )
        return pd.DataFrame(
            {
                "key": b["o_custkey"].to_numpy(),
                "tus": b["o_orderdate"].astype("int64").to_numpy(),
                "side": np.int8(0),
                "event_id": np.int64(-1),
                "o_orderkey": b["o_orderkey"].to_numpy(np.float64),
                "o_totalprice": b["o_totalprice"].to_numpy(),
            }
        )

    both = od.map_batches(od_rows, batch_format="pandas").union(
        ev.map_batches(ev_rows, batch_format="pandas")
    )

    def merge(p: pd.DataFrame) -> pd.DataFrame:
        # finish the tie reduce across blocks, then the as-of ffill
        p = p.sort_values(["key", "tus", "side", "o_orderkey"], kind="mergesort")
        is_o = p["side"].to_numpy() == 0
        dup = np.zeros(len(p), dtype=bool)
        if len(p) > 1:
            k = p["key"].to_numpy()
            t = p["tus"].to_numpy()
            dup[:-1] = is_o[:-1] & is_o[1:] & (k[:-1] == k[1:]) & (t[:-1] == t[1:])
        p = p.loc[~dup]
        filled = p.groupby("key", sort=False)[["o_orderkey", "o_totalprice"]].ffill()
        out = p.loc[p["side"] == 1, ["event_id", "key"]].copy()
        out["o_orderkey"] = filled.loc[p["side"] == 1, "o_orderkey"]
        out["o_totalprice"] = filled.loc[p["side"] == 1, "o_totalprice"]
        out = out.loc[out["o_orderkey"].notna()]
        return pd.DataFrame(
            {
                "event_id": out["event_id"].to_numpy(np.int64),
                "user_id": out["key"].to_numpy(np.int64),
                "o_orderkey": out["o_orderkey"].to_numpy(np.int64),
                "o_totalprice": out["o_totalprice"].to_numpy(np.float64),
            }
        )

    return partitioned_map_groups(both, ["key"], merge)


def latest_by_key(sf_dir: str) -> "ray.data.Dataset":
    """CDC / changelog compaction — the upsert reducer every
    continuous-ingest table needs: one surviving row per key, the one
    with the greatest event time (tie-break max event_id, so the result
    is deterministic even on tied timestamps).

    The arg-max shape of the engine's combiner pattern: each block
    keeps its per-key latest row (a sort + ``drop_duplicates(keep=
    'last')``, both C-speed), so the exchange moves at most one row per
    (key, block); the partition reduce repeats the same two calls.  At
    100 TB this is exactly log-structured compaction: shuffle volume is
    bounded by distinct keys × blocks, never by changelog length.

    Key = (user_id, event_type); returns the latest (tus, event_id,
    value) per key.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])
    keys = ["user_id", "event_type"]

    def reduce_latest(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["tus", "event_id"], kind="mergesort")
        return b.drop_duplicates(keys, keep="last")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return reduce_latest(
            pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(),
                    "event_type": b["event_type"].to_numpy(),
                    "tus": b["ts"].astype("int64").to_numpy(),
                    "event_id": b["event_id"].to_numpy(),
                    "value": b["value"].to_numpy(),
                }
            )
        )

    return partitioned_map_groups(
        ev.map_batches(combine, batch_format="pandas"), keys, reduce_latest
    )


def user_event_sequences(sf_dir: str) -> "ray.data.Dataset":
    """Time-ordered behavior sequences — the grouped ordered-collect
    that turns an event log into sequence-model training rows (one
    string of event types per user, '>'-joined in event order).

    One exchange on user_id, then a single partition-wide sort and a
    C-speed ``groupby.agg(join)`` — no per-user Python loop.  The
    per-user row is bounded by the user's own history (cap upstream for
    adversarial keys; same contract as the KG assembly's max_turns).
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "event_id": b["event_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(),
            }
        )

    def build(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        g = p.groupby("user_id", sort=False)["event_type"]
        out = g.agg(">".join).rename("seq").reset_index()
        out["n_events"] = g.size().to_numpy()
        return out.astype({"n_events": np.int64})

    return partitioned_map_groups(
        ev.map_batches(to_us, batch_format="pandas"), ["user_id"], build
    )


def event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Global first-order transition counts between consecutive event
    types of one user (the Markov statistics a behavior model is
    initialized from): (src, dst, n) over every adjacent pair in every
    user's time-ordered stream.

    Two-level aggregate: the per-user adjacency is computed inside the
    user_id exchange partitions with one vectorized shift, reduced
    there to partial (src, dst) counts, and the |types|²-sized partials
    meet in a second, tiny exchange — the big data never reshuffles on
    the output key.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "event_id": b["event_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(),
            }
        )

    def partial(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        u = p["user_id"].to_numpy()
        t = p["event_type"].to_numpy()
        same = u[1:] == u[:-1] if len(p) > 1 else np.zeros(0, dtype=bool)
        pairs = pd.DataFrame({"src": t[:-1][same], "dst": t[1:][same]})
        return (
            pairs.groupby(["src", "dst"], sort=False).size().rename("n").reset_index()
        )

    parts = partitioned_map_groups(
        ev.map_batches(to_us, batch_format="pandas"), ["user_id"], partial
    )
    return grouped_agg(
        parts,
        ["src", "dst"],
        {"n": ("n", "sum")},
        post=lambda out: out.astype({"n": np.int64}),
    )


def next_event_labels(sf_dir: str) -> "ray.data.Dataset":
    """Supervised-label generation for next-event prediction: every
    event row paired with the SAME user's next event type and the gap
    to it (the training rows a sequence/recommendation model consumes;
    ``event_transitions`` is this table aggregated).  Last event of a
    user gets label '<end>' / gap -1 so the row count equals the input
    and no nullable columns cross the driver compare.

    One exchange on user_id, one vectorized shift per partition.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "event_id": b["event_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(),
            }
        )

    def label(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        u = p["user_id"].to_numpy()
        t = p["tus"].to_numpy()
        ty = p["event_type"].to_numpy()
        nxt = np.full(len(p), "<end>", dtype=object)
        gap = np.full(len(p), -1, dtype=np.int64)
        if len(p) > 1:
            same = u[:-1] == u[1:]
            nxt[:-1][same] = ty[1:][same]
            gap[:-1][same] = (t[1:] - t[:-1])[same]
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy(),
                "event_type": ty,
                "next_type": nxt,
                "gap_us": gap,
            }
        )

    return partitioned_map_groups(
        ev.map_batches(to_us, batch_format="pandas"), ["user_id"], label
    )


def event_pairs_within(sf_dir: str, window_s: int = 3600) -> "ray.data.Dataset":
    """Banded range self-join, aggregated: for every event, how many
    strictly-later events of the same user fall within ``window_s``
    (burst detection / dwell features).  A naive SQL range join is
    O(n²) per key; here one exchange on user_id plus a per-user
    ``np.searchsorted`` over the time-sorted array gives O(n log n) —
    the searchsorted handles all of a user's events in one call, so the
    only Python loop is over users in the partition, not rows.

    Returns (event_id, n_within) for every event (0 when none follow).
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    w_us = int(window_s) * 1_000_000

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "event_id": b["event_id"].to_numpy(),
            }
        )

    def count(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus"], kind="mergesort")
        ids, ns = [], []
        for _, g in p.groupby("user_id", sort=False):
            t = g["tus"].to_numpy()
            lo = np.searchsorted(t, t, side="right")
            hi = np.searchsorted(t, t + w_us, side="right")
            ids.append(g["event_id"].to_numpy())
            ns.append(hi - lo)
        return pd.DataFrame(
            {
                "event_id": np.concatenate(ids),
                "n_within": np.concatenate(ns).astype(np.int64),
            }
        )

    return partitioned_map_groups(
        ev.map_batches(to_us, batch_format="pandas"), ["user_id"], count
    )


def daily_retention(sf_dir: str) -> "ray.data.Dataset":
    """New-vs-returning daily actives — the retention table every
    product-analytics pipeline derives: per UTC day, how many active
    users saw their first-ever event that day vs earlier.

    Two tiny exchanges: per-user first-day (grouped min with a
    block-local combiner), broadcast (user-table-bounded, the pagerank
    dimension contract), then per-(day, is_new) distinct-user counts
    via one more grouped exchange over per-block partials.
    """
    from kire_ray.stages.shuffle import grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "day": b["ts"].astype("int64").to_numpy() // 86_400_000_000,
            }
        ).drop_duplicates()

    days = ev.map_batches(day_rows, batch_format="pandas")
    first = (
        grouped_agg(
            days,
            ["user_id"],
            {"first_day": ("day", "min")},
        )
        .to_pandas()
        .set_index("user_id")["first_day"]
        .to_dict()
    )
    ref = ray.put(first)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(ref)
        is_new = b["day"].to_numpy() == b["user_id"].map(f).to_numpy()
        return (
            pd.DataFrame(
                {"day": b["day"].to_numpy(), "is_new": is_new, "u": b["user_id"]}
            )
            .drop_duplicates()
        )

    def count(p: pd.DataFrame) -> pd.DataFrame:
        g = (
            p.drop_duplicates()
            .groupby(["day", "is_new"], sort=False)
            .size()
            .rename("n_users")
            .reset_index()
        )
        return g.astype({"day": np.int64, "n_users": np.int64})

    from kire_ray.stages.shuffle import partitioned_map_groups

    return partitioned_map_groups(
        days.map_batches(flag, batch_format="pandas"), ["day", "is_new"], count
    )


def running_totals(sf_dir: str) -> "ray.data.Dataset":
    """Per-user running total of event value in time order — the
    cumulative window aggregate (``SUM() OVER (PARTITION BY user ORDER
    BY ts)``) behind burn-down counters, spend caps, and cumulative
    feature engineering.

    Same key-local ordered shape as ``sessionize``: ONE exchange on
    user_id, then a partition-wide mergesort by (user, ts, event_id)
    and a C-speed ``groupby.cumsum`` — no per-user loop.  The per-user
    accumulation order is total (event_id breaks ts ties), so the sum
    sequence is deterministic and matches the SQL window frame
    addend-for-addend; rounding guards the final float anyway.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "value": b["value"].to_numpy(),
            }
        )

    def build(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        run = p.groupby("user_id", sort=False)["value"].cumsum()
        return pd.DataFrame(
            {
                "event_id": p["event_id"].astype(np.int64),
                "user_id": p["user_id"].astype(np.int64),
                "running_total": round_half_up(run.to_numpy(np.float64), 6),
            }
        )

    rows = ev.map_batches(to_us, batch_format="pandas")
    return partitioned_map_groups(rows, ["user_id"], build)


def events_ntile(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Within-type NTILE(k) value buckets — the quantile-binning /
    stratification pass a curation pipeline uses to balance sampling.

    One exchange on event_type, a partition-wide mergesort by
    (type, value, event_id) and a vectorized cumcount; the bucket
    follows SQL NTILE exactly: with n rows and r = n mod k, the first
    r buckets carry ⌈n/k⌉ rows and the rest ⌊n/k⌋ (ORDER BY value,
    event_id makes the assignment total and deterministic).
    """
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def build(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["event_type", "value", "event_id"], kind="mergesort")
        rank0 = p.groupby("event_type", sort=False).cumcount().to_numpy(np.int64)
        n = p.groupby("event_type", sort=False)["event_id"].transform("size")
        n = n.to_numpy(np.int64)
        small = n // k
        rem = n % k
        lead = rem * (small + 1)
        in_lead = rank0 < lead
        bucket = np.where(
            in_lead,
            rank0 // np.maximum(small + 1, 1) + 1,
            rem + (rank0 - lead) // np.maximum(small, 1) + 1,
        )
        return pd.DataFrame(
            {
                "event_id": p["event_id"].astype(np.int64),
                "event_type": p["event_type"],
                "bucket": bucket.astype(np.int64),
            }
        )

    return partitioned_map_groups(ev, ["event_type"], build)


def markov_steady_state(sf_dir: str, iters: int = 10) -> "ray.data.Dataset":
    """Steady-state distribution of the user-behavior Markov chain:
    power iteration vᵀP over the row-normalized ``event_transitions``
    matrix, uniform start, ``iters`` fixed iterations (deterministic
    and SQL-unrollable like ``kg_pagerank``; absorbing/dangling rows
    keep their mass in place via a self-loop, mirrored in the oracle).

    The DATA work is the distributed transition count (two-level
    aggregate, see ``event_transitions``); the iteration runs on the
    driver over the |types|² matrix — dimension-sized by construction.
    """
    tr = event_transitions(sf_dir).to_pandas()
    states = np.sort(
        pd.unique(pd.concat([tr["src"], tr["dst"]], ignore_index=True))
    )
    k = len(states)
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((k, k), dtype=np.float64)
    for _, r in tr.iterrows():
        P[idx[r["src"]], idx[r["dst"]]] = r["n"]
    row = P.sum(axis=1)
    for i in range(k):
        if row[i] > 0:
            P[i] /= row[i]
        else:
            P[i, i] = 1.0
    v = np.full(k, 1.0 / k)
    for _ in range(iters):
        v = v @ P
    return ray.data.from_pandas(
        pd.DataFrame(
            {"event_type": states, "prob": round_half_up(v, 6)}
        )
    )


def purchase_attribution(sf_dir: str, gap_s: int = 21600) -> "ray.data.Dataset":
    """First-touch attribution: for every purchase event, the event
    type that OPENED its session (gap-based, same ``gap_s`` rule as
    ``sessionize``) — the marketing/behavior question sessionization
    exists to answer.

    One exchange on user_id; inside the partition the session break /
    cumsum machinery is shared with ``sessionize`` and the opener is a
    vectorized first-per-session lookup (no per-session loop).
    Returns (event_id, user_id, first_touch) for purchase events.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    gap_us = int(gap_s) * 1_000_000

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
            }
        )

    def attribute(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        u = p["user_id"].to_numpy()
        t = p["tus"].to_numpy()
        brk = np.ones(len(p), dtype=np.int64)
        if len(p) > 1:
            brk[1:] = ((u[1:] != u[:-1]) | (t[1:] - t[:-1] > gap_us)).astype(np.int64)
        sid = brk.cumsum() - 1  # global session index within partition
        types = p["event_type"].to_numpy()
        opener = types[brk.astype(bool)]  # one per session, in sid order
        first_touch = opener[sid]
        is_purchase = types == "purchase"
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy(np.int64)[is_purchase],
                "user_id": p["user_id"].to_numpy(np.int64)[is_purchase],
                "first_touch": first_touch[is_purchase],
            }
        )

    rows = ev.map_batches(to_us, batch_format="pandas")
    return partitioned_map_groups(rows, ["user_id"], attribute)


def events_rolling_mean(sf_dir: str, *, window: int = 3) -> "ray.data.Dataset":
    """Per-user rolling mean of the last ``window`` event values in
    time order — the bounded sliding-window aggregate (``AVG() OVER
    (… ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``) behind
    trailing-average features; complements ``running_totals``'s
    UNBOUNDED cumulative frame with the ROWS-bounded frame.

    Same key-local ordered shape: ONE exchange on user_id, a
    partition-wide mergesort by (user, ts, event_id), then a C-speed
    ``groupby.rolling`` — no per-user loop. Total order (event_id
    breaks ts ties) keeps the addend set deterministic.

    Implementation note vs ``relational.events_rolling_avg`` (the
    trailing-window twin): that one hand-rolls shift-subtracted sums
    because pandas' ONLINE rolling accumulator can drift and flip a
    6 dp half-up boundary; here ``groupby.rolling().mean()`` recomputes
    each window exactly for the small fixed ``window`` (pandas uses a
    fresh windowed mean, not a running one, for ROWS frames this
    small), and the SQL oracle hash-matches — if the window ever grows
    large enough that pandas switches to the online kernel, port the
    twin's shift-sum here."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "tus": b["ts"].astype("int64").to_numpy(),
                "value": b["value"].to_numpy(),
            }
        )

    def build(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        roll = (
            p.groupby("user_id", sort=False)["value"]
            .rolling(window, min_periods=1)
            .mean()
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                "user_id": p["user_id"].astype(np.int64).to_numpy(),
                "event_id": p["event_id"].astype(np.int64).to_numpy(),
                "rolling_mean": round_half_up(roll.to_numpy(np.float64), 6),
            }
        )

    rows = ev.map_batches(to_us, batch_format="pandas")
    return partitioned_map_groups(rows, ["user_id"], build)


def events_anomaly_zscore(
    sf_dir: str, *, z_thresh: float = 2.0, min_events: int = 5
) -> "ray.data.Dataset":
    """Grouped anomaly detection: events whose value is more than
    ``z_thresh`` population-σ from their user's mean — the per-entity
    outlier flagging pass feature pipelines run before training (the
    two-sided sibling of ``winsorize_events``'s capping).

    Unlike the per-TYPE siblings (``relational.events_zscore`` /
    ``events_anomalies``, whose stats key is constant-cardinality and
    trivially collectible), the key here is the USER — a cardinality
    that scales with the data — so the moment table is built by a real
    grouped exchange with per-batch (Σ, Σx², n) combiners, and only the
    σ>0, n≥``min_events`` survivors broadcast back over a second
    streaming scan. Never ships raw events to a reducer; at 100 TB
    swap the broadcast for a hash join when the survivor table outgrows
    worker heap (the q5/q10 threshold pattern).
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        g = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "s": v, "s2": v * v, "n": 1}
        ).groupby("user_id", sort=False).agg(
            s=("s", "sum"), s2=("s2", "sum"), n=("n", "sum")
        )
        return g.reset_index()

    stats = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        {"s": ("s", "sum"), "s2": ("s2", "sum"), "n": ("n", "sum")},
    ).to_pandas()
    stats = stats[stats["n"] >= min_events].copy()
    m = stats["s"] / stats["n"]
    var = stats["s2"] / stats["n"] - m * m
    stats["m"] = m
    stats["sd"] = np.sqrt(np.maximum(var, 0.0))
    stats = stats[stats["sd"] > 0]
    ref = ray.put(stats.set_index("user_id")[["m", "sd"]])

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        mm = st["m"].reindex(b["user_id"]).to_numpy()
        sd = st["sd"].reindex(b["user_id"]).to_numpy()
        z = (b["value"].to_numpy(np.float64) - mm) / sd
        keep = np.abs(z) > z_thresh
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(np.int64)[keep],
                "user_id": b["user_id"].to_numpy(np.int64)[keep],
                "z": round_half_up(z[keep], 6),
            }
        )

    return ev.map_batches(flag, batch_format="pandas")


def hopping_window_counts(
    sf_dir: str, *, hop_s: int = 1800, win_s: int = 3600
) -> "ray.data.Dataset":
    """Overlapping (hopping) window aggregate: event count + value sum
    per ``win_s``-second window advancing every ``hop_s`` seconds —
    the sliding-window rate counter streaming engines provide natively
    and Ray Data lacks. Tumbling windows (``events_resampled``) are the
    degenerate hop == win case.

    Each event replicates to its win_s/hop_s covering windows with one
    vectorized ``np.repeat`` (no per-row loop), partial (count, sum)
    per window per batch (combiner), then ONE tiny grouped exchange —
    the window-key cardinality is time-range/hop, not event-count.
    """
    assert win_s % hop_s == 0, "window must be a whole number of hops"
    k = win_s // hop_s
    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].astype("int64").to_numpy() // 1_000_000
        base = t // hop_s
        wins = (
            np.repeat(base, k).reshape(-1, k) - np.arange(k, dtype=np.int64)
        ).ravel()
        v = np.repeat(b["value"].to_numpy(np.float64), k)
        g = pd.DataFrame({"w": wins, "v": v}).groupby("w", sort=False)["v"]
        return pd.DataFrame(
            {
                "win_start": g.size().index.to_numpy(np.int64) * hop_s,
                "n": g.size().to_numpy(np.int64),
                "sum_value": g.sum().to_numpy(np.float64),
            }
        )

    def post(out: pd.DataFrame) -> pd.DataFrame:
        out["n"] = out["n"].astype(np.int64)
        out["sum_value"] = round_half_up(out["sum_value"].to_numpy(np.float64), 6)
        return out

    return grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["win_start"],
        {"n": ("n", "sum"), "sum_value": ("sum_value", "sum")},
        post=post,
    )


def events_autocorr(
    sf_dir: str, lags: tuple[int, ...] = (1, 2, 3)
) -> "ray.data.Dataset":
    """Per-type autocorrelation of the daily value series at small
    lags — the seasonality/trend screen a telemetry pipeline runs
    before forecasting (near-1 at lag 1 = strong persistence; the
    moment formula is ``events_regression``'s, applied to (day d,
    day d+lag) pairs that BOTH exist, so calendar gaps drop out
    exactly like the oracle's self-join).

    Shape: block-local (type, day) sum combiner → one type-keyed
    exchange co-locating each type's day series (days-bounded) →
    in-reducer vectorized lag matching + closed-form correlation.
    """
    import numpy as np

    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import partitioned_map_groups

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
        return (
            pd.DataFrame(
                {"event_type": b["event_type"], "day": day,
                 "v": b["value"].to_numpy(np.float64)}
            )
            .groupby(["event_type", "day"], sort=False)
            .agg(v=("v", "sum"))
            .reset_index()
        )

    def corr_part(p: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in p.groupby("event_type", sort=False):
            s = g.groupby("day", sort=True)["v"].sum()
            days = s.index.to_numpy(np.int64)
            v = s.to_numpy(np.float64)
            for lag in lags:
                tgt = days + lag
                idx = np.searchsorted(days, tgt)
                idx_c = np.minimum(idx, len(days) - 1)
                valid = days[idx_c] == tgt
                x, y = v[valid], v[idx_c[valid]]
                n = len(x)
                if n < 2:
                    continue
                sx, sy = x.sum(), y.sum()
                sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
                dx, dy = n * sxx - sx * sx, n * syy - sy * sy
                if dx <= 0 or dy <= 0:
                    continue
                rows.append((t, lag, n, (n * sxy - sx * sy) / np.sqrt(dx * dy)))
        out = pd.DataFrame(rows, columns=["event_type", "lag", "n", "corr"])
        out["lag"] = out["lag"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        out["corr"] = round_half_up(out["corr"].to_numpy(np.float64), 6)
        return out

    return partitioned_map_groups(
        ev.map_batches(partial, batch_format="pandas"), ["event_type"], corr_part
    )


def events_dow_chisq(sf_dir: str) -> "ray.data.Dataset":
    """Chi-square goodness-of-fit of each event type's day-of-week
    profile against uniformity — the seasonality screen (a large chi²
    says the type has strong weekly structure worth modeling;
    dof = 6). Zero-count weekdays enter the statistic with their full
    expected mass, exactly like the oracle's 7-day grid.

    Shape: block-local (type, dow) count combiner → one type-keyed
    exchange → in-reducer 7-term fold. dow = (epoch_days + 4) % 7 —
    epoch day 0 (1970-01-01) was a Thursday, so this convention is
    SUNDAY = 0 / Thursday = 4 (NOT pandas' Monday = 0), mirrored in
    SQL; the χ² statistic itself is label-invariant."""
    import numpy as np

    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import partitioned_map_groups

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
        dow = (day + 4) % 7
        return (
            pd.DataFrame({"event_type": b["event_type"], "dow": dow})
            .groupby(["event_type", "dow"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    def chisq(p: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in p.groupby("event_type", sort=False):
            c = np.zeros(7, dtype=np.float64)
            gg = g.groupby("dow")["c"].sum()
            c[gg.index.to_numpy(np.int64)] = gg.to_numpy(np.float64)
            n = c.sum()
            exp = n / 7.0
            rows.append((t, int(n), float(((c - exp) ** 2 / exp).sum())))
        out = pd.DataFrame(rows, columns=["event_type", "n", "chi2"])
        out["n"] = out["n"].astype(np.int64)
        out["chi2"] = round_half_up(out["chi2"].to_numpy(np.float64), 6)
        out["dof"] = np.int64(6)
        return out

    return partitioned_map_groups(
        ev.map_batches(partial, batch_format="pandas"), ["event_type"], chisq
    )


def user_rfm(sf_dir: str) -> "ray.data.Dataset":
    """RFM segmentation (recency / frequency / monetary — the classic
    user-value quartile coding): per user, days since last event
    (relative to the corpus' latest event day), event count, and the
    6dp-rounded value sum, each coded 1-4 by its interpolated global
    quartiles (code = 1 + #thresholds strictly exceeded).

    Scale shape: per-user aggregates fold in ONE user-keyed exchange;
    the quartile thresholds come from (metric, value)-histogram
    partials — never a global sort — reduced once and broadcast to a
    final assignment pass (the ``events_quantile_cont`` machinery).
    M is rounded BEFORE thresholding on both compare sides, so code
    comparisons see identical inputs (the events_props_sum 6dp-sum
    precedent)."""
    import numpy as np

    import ray as _ray

    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
        return (
            pd.DataFrame(
                {"user_id": b["user_id"], "last_day": day,
                 "f": np.int64(1), "m": b["value"].to_numpy(np.float64)}
            )
            .groupby("user_id", sort=False)
            .agg(last_day=("last_day", "max"), f=("f", "sum"), m=("m", "sum"))
            .reset_index()
        )

    users = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        {"last_day": ("last_day", "max"), "f": ("f", "sum"), "m": ("m", "sum")},
        post=lambda o: o.assign(m=round_half_up(o["m"].to_numpy(np.float64), 6)),
    ).materialize()

    # corpus reference day (scalar collect of block maxima)
    d0 = int(
        users.map_batches(
            lambda b: pd.DataFrame({"d": [b["last_day"].max()]}),
            batch_format="pandas",
        )
        .to_pandas()["d"]
        .max()
    )

    # quartile thresholds from histogram partials (distinct-bounded)
    def hist(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, col in (("r", d0 - b["last_day"]), ("f", b["f"]), ("m", b["m"])):
            g = col.value_counts()
            out.append(
                pd.DataFrame({"metric": k, "v": g.index.to_numpy(np.float64),
                              "n": g.to_numpy(np.int64)})
            )
        return pd.concat(out, ignore_index=True)

    hp = (
        users.map_batches(hist, batch_format="pandas")
        .to_pandas()
        .groupby(["metric", "v"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    thr: dict[str, tuple] = {}
    for k, g in hp.groupby("metric", sort=False):
        vals = g["v"].to_numpy(np.float64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        qs = []
        for q in (0.25, 0.5, 0.75):
            pos = (n - 1) * q
            lo = int(np.floor(pos))
            frac = pos - lo
            vlo = vals[int(np.searchsorted(cum, lo + 1, side="left"))]
            if frac == 0.0:
                qs.append(float(vlo))
            else:
                vhi = vals[int(np.searchsorted(cum, lo + 2, side="left"))]
                qs.append(float(vlo + frac * (vhi - vlo)))
        thr[k] = tuple(qs)
    thr_ref = _ray.put(thr)

    def assign(b: pd.DataFrame, _t=thr_ref) -> pd.DataFrame:
        t = _ray.get(_t)

        def code(v: np.ndarray, k: str) -> np.ndarray:
            q1, q2, q3 = t[k]
            return (
                1 + (v > q1).astype(np.int64) + (v > q2).astype(np.int64)
                + (v > q3).astype(np.int64)
            )

        r = (d0 - b["last_day"].to_numpy(np.int64)).astype(np.float64)
        f = b["f"].to_numpy(np.float64)
        m = b["m"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "user_id": b["user_id"],
                "r_days": r.astype(np.int64),
                "f_events": f.astype(np.int64),
                "m_value": m,
                "r_code": code(r, "r"),
                "f_code": code(f, "f"),
                "m_code": code(m, "m"),
            }
        )

    return users.map_batches(assign, batch_format="pandas")


def events_window_quantiles(
    sf_dir: str, *, window_s: int = 86_400, quantiles=(0.5, 0.95)
) -> "ray.data.Dataset":
    """Windowed latency-style percentiles: interpolated p50/p95 of
    event value per (event_type, tumbling window) — the SLO dashboard
    query (``events_quantile_cont`` per time bucket instead of
    globally).

    Same single-exchange histogram shape: per-block (type, window,
    value) count combiner → one exchange on (type, window) →
    in-reducer sorted expansion + interpolation. Reducer memory is
    bounded by per-(type, window) distinct values."""
    import numpy as np

    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.shuffle import partitioned_map_groups

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    wus = window_s * 1_000_000

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        w = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // wus
        return (
            pd.DataFrame(
                {"event_type": b["event_type"], "w": w, "value": b["value"]}
            )
            .groupby(["event_type", "w", "value"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (t, w), g in part.groupby(["event_type", "w"], sort=False):
            g = g.groupby("value", sort=True)["n"].sum().reset_index()
            vals = g["value"].to_numpy(np.float64)
            cum = g["n"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            for q in quantiles:
                pos = (n - 1) * q
                lo = int(np.floor(pos))
                frac = pos - lo
                vlo = vals[int(np.searchsorted(cum, lo + 1, side="left"))]
                if frac == 0.0:
                    v = vlo
                else:
                    vhi = vals[int(np.searchsorted(cum, lo + 2, side="left"))]
                    v = vlo + frac * (vhi - vlo)
                rows.append((t, int(w), n, float(q), v))
        out = pd.DataFrame(
            rows, columns=["event_type", "w", "n", "q", "value"]
        )
        out["w"] = out["w"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        out["value"] = round_half_up(out["value"].to_numpy(np.float64), 6)
        return out

    return partitioned_map_groups(
        ev.map_batches(hist, batch_format="pandas"), ["event_type", "w"], pick
    )


def scd2_history(sf_dir: str) -> "ray.data.Dataset":
    """Slowly-changing-dimension (type 2) state history: each user's
    event_type stream collapsed to change runs with validity intervals
    — (user_id, state, valid_from_us, valid_to_us), the current state
    carrying valid_to_us = -1. The warehouse pattern that turns an
    append-only event log into an as-of-queryable dimension.

    Shape: ONE exchange on user_id → per-partition vectorized sort by
    (ts, event_id) + run-boundary shift + lead. Deterministic under
    equal timestamps via the event_id tiebreak, mirrored in the
    oracle's window ORDER BY."""
    import numpy as np

    from kire_ray.stages.shuffle import partitioned_map_groups

    ev = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])

    def per_user(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = p["user_id"].to_numpy()
        et = p["event_type"].to_numpy()
        tus = p["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_user = np.ones(len(p), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        change = new_user.copy()
        change[1:] |= et[1:] != et[:-1]
        ru, rs, rf = u[change], et[change], tus[change]
        run_user_same = np.zeros(change.sum(), dtype=bool)
        run_user_same[:-1] = ru[:-1] == ru[1:]
        vt = np.full(len(ru), -1, dtype=np.int64)
        vt[:-1][run_user_same[:-1]] = rf[1:][run_user_same[:-1]]
        return pd.DataFrame(
            {
                "user_id": ru,
                "state": rs,
                "valid_from_us": rf.astype(np.int64),
                "valid_to_us": vt,
            }
        )

    return partitioned_map_groups(ev, ["user_id"], per_user)


def late_events(
    sf_dir: str,
    *,
    max_delay_s: int = 14400,
    allowed_s: int = 3600,
    num_ranges: int | None = None,
) -> "ray.data.Dataset":
    """Watermark late-arrival audit — the out-of-order-stream health
    check a windowed streaming job runs before trusting its windows:
    an event is *late* if, at the moment it arrives, the watermark
    (max event-time seen over all earlier arrivals) is already more
    than ``allowed_s`` past the event's own event-time.

    The stored table is perfectly time-ordered, so arrival order is a
    deterministic md5-derived network delay per event
    (``arr = t + md5_uniform(event_id) % max_delay``) — the engine's
    standard content-hash derivation, mintable identically in SQL.

    Distributed shape: a *distributed prefix MAX over a derived order*
    (Ray Data has no native scan primitive) — range-partition on
    arrival time; pass 1 reduces per-range event-time maxima (block
    combiner + one range-cardinality exchange); the driver runs an
    exclusive prefix-max over the tiny range table and broadcasts it;
    pass 2 moves each event once to its arrival range and finishes
    with a grouped cummax/shift inside the partition. Driver state is
    O(n_ranges) regardless of stream length.

    Returns late rows only: (event_id, user_id, event_type,
    lateness_us = watermark − event-time, > allowed).
    """
    import hashlib

    from kire_ray.stages.shuffle import (
        cluster_cpus,
        grouped_agg,
        partitioned_map_groups,
    )

    max_delay_us = int(max_delay_s) * 1_000_000
    allowed_us = int(allowed_s) * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def with_arrival(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        delay = np.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
                % max_delay_us
                for i in b["event_id"].to_numpy()
            ],
            dtype=np.int64,
        )
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(),
                "t": t,
                "arr": t + delay,
            }
        )

    # materialize once: three downstream passes (lo/hi, range-max,
    # final audit) would otherwise re-run the per-row md5 delay loop
    # and the events scan each time
    arrived = ev.map_batches(with_arrival, batch_format="pandas").materialize()

    lo, hi = [
        int(x)
        for x in arrived.map_batches(
            lambda b: pd.DataFrame(
                {"lo": [b["arr"].min()], "hi": [b["arr"].max()]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .agg({"lo": "min", "hi": "max"})
    ]
    n_ranges = num_ranges or max(4 * cluster_cpus(), 64)
    width = max(1, (hi - lo + n_ranges) // n_ranges)

    def range_max(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"r": (b["arr"] - lo) // width, "m": b["t"]})
        out = g.groupby("r", sort=False)["m"].max()
        return pd.DataFrame({"r": out.index.to_numpy(), "m": out.to_numpy()})

    ranges = (
        grouped_agg(
            arrived.map_batches(range_max, batch_format="pandas"),
            ["r"],
            {"m": ("m", "max")},
        )
        .to_pandas()
        .sort_values("r")
    )
    SENTINEL = np.int64(-(2**62))
    maxes = np.full(int(ranges["r"].max()) + 2 if len(ranges) else 1, SENTINEL)
    maxes[ranges["r"].to_numpy(dtype=np.int64) + 1] = ranges["m"].to_numpy()
    incoming = np.maximum.accumulate(maxes)  # exclusive prefix max per range
    ref = ray.put(incoming)

    def audit(p: pd.DataFrame) -> pd.DataFrame:
        pre = ray.get(ref)
        p = p.sort_values(["_r", "arr", "event_id"], kind="mergesort")
        g = p.groupby("_r", sort=False)["t"]
        prev_local = (
            g.cummax().groupby(p["_r"], sort=False).shift(1).fillna(SENTINEL)
        )
        wm = np.maximum(
            prev_local.to_numpy(np.int64),
            pre[p["_r"].to_numpy(np.int64)],
        )
        lateness = wm - p["t"].to_numpy(np.int64)
        keep = lateness > allowed_us
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy()[keep],
                "user_id": p["user_id"].to_numpy()[keep],
                "event_type": p["event_type"].to_numpy()[keep],
                "lateness_us": lateness[keep],
            }
        )

    with_r = arrived.map_batches(
        lambda b: b.assign(_r=(b["arr"] - lo) // width), batch_format="pandas"
    )
    return partitioned_map_groups(with_r, ["_r"], audit)


def window_dedup(sf_dir: str, *, ttl_s: int = 86400) -> "ray.data.Dataset":
    """Streaming TTL dedup: keep an event iff it is the first of its
    (user_id, event_type) key or its gap from the key's *previous*
    event exceeds ``ttl_s`` — lag semantics, i.e. the keyed state a
    streaming dedup operator holds is exactly one timestamp per key.

    One hash exchange on user_id (all of a key's rows colocate);
    inside each partition a vectorized (key, ts, event_id) sort + a
    C-speed grouped shift produce the gaps — no per-key loop.

    Returns kept rows: (event_id, user_id, event_type, prev_gap_us)
    with prev_gap_us = -1 for the first event of a key.
    """
    from kire_ray.stages.shuffle import partitioned_map_groups

    ttl_us = int(ttl_s) * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def per_key(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        t = p["ts"].to_numpy("datetime64[us]").astype(np.int64)
        prev = (
            pd.Series(t)
            .groupby(
                [p["user_id"].to_numpy(), p["event_type"].to_numpy()],
                sort=False,
            )
            .shift(1)
        )
        gap = t - prev.to_numpy(np.float64)
        keep = np.isnan(gap) | (gap > ttl_us)
        out_gap = np.where(np.isnan(gap), -1, gap).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy()[keep],
                "user_id": p["user_id"].to_numpy()[keep],
                "event_type": p["event_type"].to_numpy()[keep],
                "prev_gap_us": out_gap[keep],
            }
        )

    return partitioned_map_groups(ev, ["user_id"], per_key)


def theilsen_trend(sf_dir: str) -> "ray.data.Dataset":
    """Theil–Sen robust trend per event_type over the daily count
    series: slope = median over all day pairs i<j of
    (c_j − c_i)/(d_j − d_i), intercept = median(c − slope·d) — the
    outlier-resistant complement to ``events_regression``'s OLS (one
    anomalous day moves OLS, not the pairwise median).

    Shape: daily counts via a block combiner + one (type, day)
    exchange; then ONE type-keyed exchange where each type's
    day-bounded series (≪ row count — days, not events) enumerates
    its O(days²) slope pairs vectorized and takes medians. The events
    themselves never move twice."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def daily(b: pd.DataFrame) -> pd.DataFrame:
        day = (
            b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
        )
        return (
            pd.DataFrame({"event_type": b["event_type"], "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    counts = grouped_agg(
        ev.map_batches(daily, batch_format="pandas"),
        ["event_type", "day"],
        {"c": ("c", "sum")},
    )

    def per_type(p: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in p.groupby("event_type", sort=False):
            g = g.sort_values("day")
            d = g["day"].to_numpy(np.float64)
            c = g["c"].to_numpy(np.float64)
            if len(d) < 2:
                continue
            i, j = np.triu_indices(len(d), k=1)
            slope = float(np.median((c[j] - c[i]) / (d[j] - d[i])))
            intercept = float(np.median(c - slope * d))
            rows.append((t, len(d), slope, intercept))
        out = pd.DataFrame(
            rows, columns=["event_type", "n_days", "slope", "intercept"]
        )
        out["n_days"] = out["n_days"].astype(np.int64)
        out["slope"] = round_half_up(out["slope"].to_numpy(np.float64), 6)
        out["intercept"] = round_half_up(
            out["intercept"].to_numpy(np.float64), 6
        )
        return out

    return partitioned_map_groups(counts, ["event_type"], per_type)


def changepoint_cusum(sf_dir: str) -> "ray.data.Dataset":
    """CUSUM changepoint detection per event_type over the daily count
    series (Page 1954): the change day is the argmax of
    |Σ_{d≤t}(c_d − mean)| — where the cumulative deviation from the
    series mean peaks, i.e. the most likely level-shift boundary.
    Deterministic tie-break: earliest day.

    Shape: identical to ``theilsen_trend`` — block combiner + one
    (type, day) exchange, then ONE type-keyed exchange whose series
    are day-bounded; the cumsum/argmax fold is O(days) per type."""
    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def daily(b: pd.DataFrame) -> pd.DataFrame:
        day = (
            b["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
        )
        return (
            pd.DataFrame({"event_type": b["event_type"], "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    counts = grouped_agg(
        ev.map_batches(daily, batch_format="pandas"),
        ["event_type", "day"],
        {"c": ("c", "sum")},
    )

    def per_type(p: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in p.groupby("event_type", sort=False):
            g = g.sort_values("day")
            d = g["day"].to_numpy(np.int64)
            c = g["c"].to_numpy(np.float64)
            dev = np.cumsum(c - c.mean())
            mag = np.abs(dev)
            best = int(mag.argmax())  # argmax → earliest day on ties
            rows.append((t, len(d), int(d[best]), float(mag[best])))
        out = pd.DataFrame(
            rows, columns=["event_type", "n_days", "change_day", "cusum_max"]
        )
        out["n_days"] = out["n_days"].astype(np.int64)
        out["change_day"] = out["change_day"].astype(np.int64)
        out["cusum_max"] = round_half_up(
            out["cusum_max"].to_numpy(np.float64), 6
        )
        return out

    return partitioned_map_groups(counts, ["event_type"], per_type)
