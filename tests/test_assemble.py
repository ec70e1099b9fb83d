"""Document assembly: the per-turn text-equality invariant (BASELINE.json)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data

from kire_ray.stages.assemble import assemble_documents


def test_invariant_per_turn_text_equality(ray_session, tiny_corpus):
    tr = pq.read_table(f"{tiny_corpus}/transcripts.parquet").to_pandas()
    ds = ray.data.read_parquet(f"{tiny_corpus}/transcripts.parquet")
    docs = assemble_documents(ds).to_pandas()

    expected = {
        conv: g.sort_values("turn_idx")["text"].tolist()
        for conv, g in tr.groupby("conv_id")
    }
    assert set(docs["doc_id"]) == set(expected)
    for row in docs.itertuples():
        assert list(row.turn_texts) == expected[row.doc_id], row.doc_id
        assert row.n_turns == len(expected[row.doc_id])


def test_assembly_small_batches_force_segment_merge(ray_session, tiny_corpus):
    # tiny combine batches → every conv is split across many segments,
    # exercising the merge path of the two-stage assembly
    ds = ray.data.read_parquet(f"{tiny_corpus}/transcripts.parquet")
    docs = assemble_documents(ds, combine_batch_size=7).to_pandas()
    tr = pq.read_table(f"{tiny_corpus}/transcripts.parquet").to_pandas()
    for conv, g in tr.groupby("conv_id"):
        row = docs[docs["doc_id"] == conv].iloc[0]
        assert list(row["turn_texts"]) == g.sort_values("turn_idx")["text"].tolist()


def test_assembly_roles_and_ts(ray_session, tiny_corpus):
    ds = ray.data.read_parquet(f"{tiny_corpus}/transcripts.parquet")
    docs = assemble_documents(ds).to_pandas()
    tr = pq.read_table(f"{tiny_corpus}/transcripts.parquet").to_pandas()
    g = tr[tr["conv_id"] == docs["doc_id"].iloc[0]]
    row = docs.iloc[0]
    assert row["ts_first"] == g["ts"].min()
    assert row["ts_last"] == g["ts"].max()


def test_assemble_max_turns_caps_hot_conv(ray_session):
    """Skew bound: a pathological conversation is truncated to its
    first max_turns turns (by turn_idx), others untouched."""
    import pandas as pd

    import ray.data

    from kire_ray.stages.assemble import assemble_documents

    rows = [("hot", t, "user", f"h{t}", None, t) for t in range(50)]
    rows += [("cold", t, "user", f"c{t}", None, t) for t in range(3)]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    docs = assemble_documents(
        ray.data.from_pandas(df.sample(frac=1, random_state=3)), max_turns=10
    ).to_pandas().set_index("doc_id")
    assert docs.loc["hot", "n_turns"] == 10
    assert list(docs.loc["hot", "turn_texts"]) == [f"h{t}" for t in range(10)]
    assert docs.loc["cold", "n_turns"] == 3


def test_hot_conv_skew_bounded_by_combiner(ray_session):
    """Skew mitigation for hot conv_ids: a 20k-turn conversation spread
    over many blocks reaches the merge as one segment row per block
    (the combiner), not 20k rows — the exchange is bounded by block
    count, and assembly output stays exact."""
    import numpy as np
    import pandas as pd

    import ray.data

    from kire_ray.stages.assemble import _combine_segments, assemble_documents

    n_hot, n_cold = 20_000, 50
    rows = [("hot", t, "user", f"h{t}", None, t) for t in range(n_hot)]
    for c in range(n_cold):
        rows += [(f"c{c}", t, "user", f"{c}:{t}", None, t) for t in range(3)]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    df = df.sample(frac=1, random_state=7).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(16)

    # combiner bound: one segment per (conv, block) → ≤ 16 rows for the
    # hot conv instead of 20k
    segs = ds.map_batches(_combine_segments, batch_format="pandas", batch_size=None).to_pandas()
    hot_segs = (segs["conv_id"] == "hot").sum()
    assert hot_segs <= 16, hot_segs

    docs = assemble_documents(ds).to_pandas().set_index("doc_id")
    assert docs.loc["hot", "n_turns"] == n_hot
    texts = docs.loc["hot", "turn_texts"]
    assert texts[0] == "h0" and texts[-1] == f"h{n_hot-1}"
    assert list(texts[:5]) == [f"h{t}" for t in range(5)]
    assert len(docs) == 1 + n_cold


def test_assemble_packed_roundtrip_nasty_strings(ray_session):
    """The packed-segment exchange is length-sliced (no separator), so
    control bytes, unicode, empty strings and None tools must all
    round-trip exactly."""
    texts = [
        "",  # empty turn
        "a\x00b\x1fc\x1ed",  # control chars that a separator scheme would break on
        "héllo wörld ☃ \U0001F600",  # multi-byte unicode
        "trailing  spaces  ",
        "\n\ttabs\nand\nnewlines",
    ]
    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 5,
            "turn_idx": np.arange(5, dtype=np.int32),
            "role": ["user", "assistant", None, "user", "tool"],
            "text": texts,
            "tool": [None, "grep", None, "", "bash"],
            "ts": pd.to_datetime([1, 2, 3, 4, 5], unit="us"),
        }
    )
    import ray as _ray

    from kire_ray.stages.assemble import assemble_documents

    docs = assemble_documents(
        _ray.data.from_pandas(df).repartition(3), num_partitions=2
    ).to_pandas()
    assert len(docs) == 1
    row = docs.iloc[0]
    assert list(row["turn_texts"]) == texts
    assert list(row["roles"]) == ["user", "assistant", None, "user", "tool"]
    assert list(row["tools"]) == [None, "grep", None, "", "bash"]
    assert row["n_turns"] == 5
