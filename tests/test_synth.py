"""Generator determinism + structural sanity of the synthetic corpus."""

import pyarrow.parquet as pq

from kire_ray.sources.synth import SynthConfig, generate_corpus


def test_generator_deterministic():
    a = generate_corpus(SynthConfig(n_convs=40))
    b = generate_corpus(SynthConfig(n_convs=40))
    for name in a:
        assert a[name].equals(b[name]), name


def test_transcript_schema(tiny_corpus):
    t = pq.read_table(f"{tiny_corpus}/transcripts.parquet")
    assert [f.name for f in t.schema] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(t.schema.field("turn_idx").type) == "int32"
    assert str(t.schema.field("ts").type) == "timestamp[us]"


def test_turn_idx_contiguous(tiny_corpus):
    df = pq.read_table(f"{tiny_corpus}/transcripts.parquet").to_pandas()
    for conv, g in df.groupby("conv_id"):
        idxs = sorted(g["turn_idx"])
        assert idxs == list(range(len(idxs))), conv
        # ts monotone under turn order
        ts = g.sort_values("turn_idx")["ts"].to_numpy()
        assert (ts[1:] > ts[:-1]).all()


def test_rows_written_out_of_order(tiny_corpus):
    df = pq.read_table(f"{tiny_corpus}/transcripts.parquet").to_pandas()
    assert not df["conv_id"].is_monotonic_increasing  # shuffle happened


def test_gold_mentions_match_text(tiny_corpus):
    tr = pq.read_table(f"{tiny_corpus}/transcripts.parquet").to_pandas()
    gm = pq.read_table(f"{tiny_corpus}/gold_mentions.parquet").to_pandas()
    text = {(r.conv_id, r.turn_idx): r.text for r in tr.itertuples()}
    for m in gm.itertuples():
        toks = text[(m.doc_id, m.turn_idx)].split()
        assert " ".join(toks[m.start : m.end]) == m.surface


def test_gold_triples_nonempty(tiny_corpus):
    gt = pq.read_table(f"{tiny_corpus}/gold_triples.parquet")
    assert gt.num_rows > 20
