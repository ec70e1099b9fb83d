"""Temporal operators: sessionize, as-of join, banded range join.

Each test checks the distributed result against a tiny hand-computed
fixture AND that the result is invariant to input partitioning (the
ops move rows through a hash exchange, so layout must not matter).
"""

import numpy as np
import pandas as pd

import ray.data


def _write_tables(tmp_path, events=None, orders=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    if events is not None:
        pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
    if orders is not None:
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _ts(s):
    return pd.to_datetime(s).as_unit("us")


def test_sessionize_gap_semantics(ray_session, tmp_path):
    from kire_ray.pipelines.temporal import sessionize

    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": _ts(
                [
                    "2024-01-01 00:00:00",  # u1 s1
                    "2024-01-01 05:59:00",  # u1 s1 (gap < 6h)
                    "2024-01-01 12:00:00",  # u1 s2 (gap > 6h)
                    "2024-01-01 00:00:00",  # u2 s1
                    "2024-01-02 00:00:00",  # u2 s2
                ]
            ),
            "value": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    sf = _write_tables(tmp_path, events=ev)
    out = (
        sessionize(sf)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert list(out["user_id"]) == [1, 1, 2, 2]
    assert list(out["session_id"]) == [1, 2, 1, 2]
    assert list(out["n_events"]) == [2, 1, 1, 1]
    np.testing.assert_allclose(out["sum_value"], [3.0, 4.0, 8.0, 16.0])
    t0 = int(ev["ts"].astype("int64").iloc[0])
    assert out.loc[0, "t_start_us"] == t0
    assert out.loc[0, "t_end_us"] == int(ev["ts"].astype("int64").iloc[1])


def test_asof_join_picks_latest_at_or_before(ray_session, tmp_path):
    from kire_ray.pipelines.temporal import asof_join_latest_order

    orders = pd.DataFrame(
        {
            "o_orderkey": [10, 11, 12, 13],
            "o_custkey": [1, 1, 1, 2],
            "o_orderdate": _ts(
                ["2024-01-01", "2024-01-05", "2024-01-05", "2024-02-01"]
            ),
            "o_totalprice": [100.0, 200.0, 300.0, 400.0],
        }
    )
    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [1, 1, 1, 2],
            "ts": _ts(
                [
                    "2023-12-31",  # before any order → dropped (inner)
                    "2024-01-03",  # → order 10
                    "2024-01-05",  # ties: latest date picks max key → 12
                    "2024-03-01",  # → order 13
                ]
            ),
        }
    )
    sf = _write_tables(tmp_path, events=ev, orders=orders)
    out = (
        asof_join_latest_order(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == [1, 2, 3]
    assert list(out["o_orderkey"]) == [10, 12, 13]
    np.testing.assert_allclose(out["o_totalprice"], [100.0, 300.0, 400.0])


def test_event_pairs_within_counts(ray_session, tmp_path):
    from kire_ray.pipelines.temporal import event_pairs_within

    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            "user_id": [1, 1, 1, 1, 2],
            "ts": _ts(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:30:00",
                    "2024-01-01 01:00:00",  # exactly +1h from e0 → inclusive
                    "2024-01-01 05:00:00",
                    "2024-01-01 00:10:00",  # other user
                ]
            ),
        }
    )
    sf = _write_tables(tmp_path, events=ev)
    out = (
        event_pairs_within(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == [0, 1, 2, 3, 4]
    assert list(out["n_within"]) == [2, 1, 0, 0, 0]


def test_latest_by_key_compaction(ray_session, tmp_path):
    from kire_ray.pipelines.temporal import latest_by_key

    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [1, 1, 1, 2],
            "event_type": ["view", "view", "click", "view"],
            "ts": _ts(
                [
                    "2024-01-02",  # later view… but see event 1
                    "2024-01-03",  # latest view for u1
                    "2024-01-01",
                    "2024-01-01",
                ]
            ),
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    sf = _write_tables(tmp_path, events=ev)
    out = (
        latest_by_key(sf)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == [2, 1, 3]
    np.testing.assert_allclose(out["value"], [3.0, 2.0, 4.0])


def test_sequences_and_transitions(ray_session, tmp_path):
    from kire_ray.pipelines.temporal import event_transitions, user_event_sequences

    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["view", "click", "view", "view", "click"],
            "ts": _ts(
                [
                    "2024-01-01 00:00",
                    "2024-01-01 00:01",
                    "2024-01-01 00:02",
                    "2024-01-01 00:00",
                    "2024-01-01 00:01",
                ]
            ),
        }
    )
    sf = _write_tables(tmp_path, events=ev)
    seq = (
        user_event_sequences(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(seq["seq"]) == ["view>click>view", "view>click"]
    assert list(seq["n_events"]) == [3, 2]
    tr = (
        event_transitions(sf)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    got = {(r.src, r.dst): r.n for r in tr.itertuples()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_temporal_partition_invariance(ray_session):
    """Same sf0.001 input through 1 vs many blocks → identical rows."""
    from kire_ray.pipelines.temporal import sessionize, event_pairs_within

    sf = "/root/testdata/sf0.001"
    for fn, keys in [
        (sessionize, ["user_id", "session_id"]),
        (event_pairs_within, ["event_id"]),
    ]:
        a = fn(sf).to_pandas().sort_values(keys).reset_index(drop=True)
        cols = sorted(a.columns)
        b = fn(sf).to_pandas().sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[cols], b[cols])


def test_comention_edges_counts(ray_session):
    """Hand-built linked docs → exact unordered pair counts."""
    from kire_ray.pipelines.kg_construct import comention_edges

    def doc(did, surfaces):
        return {
            "doc_id": did,
            "mentions": [
                {"ent_idx": i, "turn_idx": 0, "start": 0, "end": 1, "surface": s}
                for i, s in enumerate(surfaces)
            ],
        }

    docs = pd.DataFrame(
        [doc("d1", ["a", "b", "a", "c"]), doc("d2", ["b", "c"]), doc("d3", ["a"])]
    )
    out = comention_edges(ray.data.from_pandas(docs).repartition(2)).to_pandas()
    got = {(r.s1, r.s2): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 2}


def test_lpa_communities_planted(ray_session):
    """Two cliques joined by one bridge edge: LPA assigns each clique
    one community; deterministic + partition-invariant."""
    from kire_ray.pipelines.graph_algos import lpa_communities

    k1 = ["a1", "a2", "a3", "a4"]
    k2 = ["b1", "b2", "b3", "b4"]
    edges = [(x, y) for i, x in enumerate(k1) for y in k1[i + 1 :]]
    edges += [(x, y) for i, x in enumerate(k2) for y in k2[i + 1 :]]
    edges.append(("a1", "b1"))  # bridge
    df = pd.DataFrame(edges, columns=["h_qid", "t_qid"])
    out = (
        lpa_communities(ray.data.from_pandas(df).repartition(3), rounds=5)
        .to_pandas()
        .set_index("qid")["community"]
    )
    assert len(set(out[k] for k in k1)) == 1
    assert len(set(out[k] for k in k2)) == 1
    assert out["a2"] != out["b2"]
    out2 = (
        lpa_communities(ray.data.from_pandas(df), rounds=5)
        .to_pandas()
        .set_index("qid")["community"]
    )
    pd.testing.assert_series_equal(out.sort_index(), out2.sort_index())
