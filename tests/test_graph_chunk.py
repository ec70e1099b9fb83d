"""GLRE-style doc graphs and long-doc chunk/stitch semantics."""

import numpy as np

from kire_ray.functions.chunking import chunk_spans, stitch
from kire_ray.stages.graph import (
    CH_ES,
    CH_ME,
    CH_MM,
    CH_MS,
    CH_SS,
    NODE_E,
    NODE_M,
    NODE_S,
    _doc_graph,
    build_doc_graphs,
)


def test_doc_graph_counts_tiny():
    ents = [
        {"ent_idx": 0, "qid": "Q1", "label": "a", "n_mentions": 2},
        {"ent_idx": 1, "qid": "Q2", "label": "b", "n_mentions": 1},
    ]
    ments = [
        {"ent_idx": 0, "turn_idx": 0, "start": 0, "end": 1, "surface": "a"},
        {"ent_idx": 1, "turn_idx": 0, "start": 2, "end": 3, "surface": "b"},
        {"ent_idx": 0, "turn_idx": 2, "start": 1, "end": 2, "surface": "a"},
    ]
    g = _doc_graph("d", 3, ents, ments)
    assert g["n_nodes"] == 2 + 3 + 3  # E + M + S
    assert g["node_types"] == [NODE_E] * 2 + [NODE_M] * 3 + [NODE_S] * 3
    ch = np.array(g["edge_channel"])
    # undirected pairs, counted once per direction
    assert (ch == CH_MS).sum() == 3 * 2
    assert (ch == CH_ME).sum() == 3 * 2
    assert (ch == CH_MM).sum() == 1 * 2  # the two turn-0 mentions
    assert (ch == CH_ES).sum() == 3 * 2  # e0@{0,2}, e1@{0}
    assert (ch == CH_SS).sum() == 2 * 2  # sentence chain 0-1-2


def test_build_doc_graphs_runs(ray_session, tiny_corpus):
    from kire_ray.pipelines.kg_construct import (
        KGContext,
        linked_documents,
        read_transcripts,
    )

    ctx = KGContext.from_corpus(tiny_corpus)
    linked = linked_documents(read_transcripts(tiny_corpus), ctx)
    graphs = build_doc_graphs(linked).to_pandas()
    assert len(graphs) == 60
    assert (graphs["n_nodes"] > 0).all()
    # every edge endpoint is a valid node id
    for r in graphs.head(5).itertuples():
        assert max(r.edge_src) < r.n_nodes and max(r.edge_dst) < r.n_nodes


def test_explode_edges_matches_ragged(ray_session, tiny_corpus):
    """The flat edge projection is exactly the ragged lists,
    row-aligned by doc — same multiset of (doc, src, dst, channel)."""
    from kire_ray.pipelines.kg_construct import (
        KGContext,
        linked_documents,
        read_transcripts,
    )
    from kire_ray.stages.graph import explode_edges

    ctx = KGContext.from_corpus(tiny_corpus)
    linked = linked_documents(read_transcripts(tiny_corpus), ctx)
    graphs = build_doc_graphs(linked)
    ragged = graphs.to_pandas()
    flat = explode_edges(graphs).to_pandas()

    want = sorted(
        (r.doc_id, s, d, c)
        for r in ragged.itertuples()
        for s, d, c in zip(r.edge_src, r.edge_dst, r.edge_channel)
    )
    got = sorted(zip(flat.doc_id, flat.src, flat.dst, flat.channel))
    assert got == want
    # both directions of every undirected pair are present
    assert set(map(tuple, want)) == {
        (doc, d, s, c) for doc, s, d, c in want
    }


def test_chunk_spans_cover_and_overlap():
    for n in (5, 512, 700, 1024, 3000):
        spans = chunk_spans(n, 512, 128)
        covered = np.zeros(n, dtype=bool)
        for s, e in spans:
            assert e - s <= 512
            covered[s:e] = True
        assert covered.all()
        if n <= 512:
            assert spans == [(0, n)]


def test_embedder_long_doc_windows():
    """Flagship wiring of chunk/stitch: a >max_len doc runs the
    windowed path (mentions in overlaps averaged over covering
    windows); output equals the single-window run to fp-mean
    precision, and short docs take the unchanged branch bitwise."""
    import pyarrow as pa

    from kire_ray.functions.chunking import chunk_spans
    from kire_ray.stages.scorer import EntityEmbedder

    kg = {"h_qid": [], "prop": [], "t_qid": [],
          "attr_qid": [], "attr_key": [], "attr_val": []}
    turns = [" ".join(f"w{i}x{j}" for j in range(10)) for i in range(80)]
    ments = [
        {"ent_idx": 0, "turn_idx": t, "start": 2, "end": 3, "surface": "foo bar"}
        for t in (0, 38, 45, 79)  # head, overlap zone, tail
    ]
    ents = [{"ent_idx": 0, "qid": "Q1", "label": "foo bar", "n_mentions": 4}]
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "turn_texts": [turns],
            "entities": [ents],
            "mentions": [ments],
        }
    )
    assert len(chunk_spans(800, 512, 128)) > 1  # the path is exercised
    win = EntityEmbedder(kg, {}, max_len=512, overlap=128)(batch)
    one = EntityEmbedder(kg, {}, max_len=10**9)(batch)
    vw = np.asarray(win.column("vec").to_pylist()[0])
    vo = np.asarray(one.column("vec").to_pylist()[0])
    np.testing.assert_allclose(vw, vo, rtol=0, atol=1e-12)

    # short doc: windowed config takes the single-window branch → bitwise
    short = pa.table(
        {
            "doc_id": ["d2"],
            "turn_texts": [turns[:3]],
            "entities": [ents],
            "mentions": [ments[:1]],
        }
    )
    a = EntityEmbedder(kg, {}, max_len=512, overlap=128)(short)
    b = EntityEmbedder(kg, {}, max_len=10**9)(short)
    assert a.column("vec").to_pylist() == b.column("vec").to_pylist()


def test_corpus_plants_long_docs(small_corpus):
    """The generator plants >512-word documents (every 97th conv) so
    the chunk/stitch path executes on the synthetic corpus."""
    import duckdb

    n = duckdb.sql(
        f"""SELECT count(*) FROM (
              SELECT conv_id, sum(len(string_split(text,' '))) nw
              FROM read_parquet('{small_corpus}/transcripts.parquet/*.parquet')
              GROUP BY conv_id) WHERE nw > 512"""
    ).fetchone()[0]
    assert n >= 1


def test_stitch_identity_when_windows_agree():
    n, d = 700, 4
    x = np.arange(n * d, dtype=np.float64).reshape(n, d)
    spans = chunk_spans(n, 512, 128)
    chunks = [x[s:e] for s, e in spans]
    out = stitch(chunks, spans, n)
    np.testing.assert_allclose(out, x)
