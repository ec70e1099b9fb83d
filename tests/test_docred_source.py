"""DocRED JSON source: the reference's input format through the same
downstream stages (scorer → dedup) against the planted gold."""

import pyarrow.parquet as pq

import ray

from kire_ray.sources.docred import read_docred_json, write_docred_json


def test_docred_roundtrip_text_and_schema(ray_session, tiny_corpus, tmp_path):
    path = write_docred_json(tiny_corpus, str(tmp_path / "docred.json"))
    linked = read_docred_json(path)
    df = linked.to_pandas().set_index("doc_id")

    tr = pq.read_table(f"{tiny_corpus}/transcripts.parquet").to_pandas()
    # per-turn text equality under stable ordering — through the
    # export→import round trip
    for conv, g in tr.groupby("conv_id"):
        ref = g.sort_values("turn_idx")["text"].tolist()
        assert list(df.loc[conv, "turn_texts"]) == ref


def test_docred_path_triples_match_gold_exactly(ray_session, tiny_corpus, tmp_path):
    """vertexSet carries gold QID links, so the scorer over the DocRED
    path must reproduce the planted triples with P = R = 1.0 (no
    detection/voting ambiguity left)."""
    from kire_ray.pipelines.eval import triple_prf
    from kire_ray.pipelines.kg_construct import KGContext, extract_triples
    from kire_ray.stages.materialize import dedup_edges

    path = write_docred_json(tiny_corpus, str(tmp_path / "docred.json"))
    ctx = KGContext.from_corpus(tiny_corpus)
    linked = read_docred_json(path, canon=ctx.canon)
    edges = dedup_edges(extract_triples(linked, ctx)).to_pandas()
    gold = pq.read_table(f"{tiny_corpus}/gold_triples.parquet").to_pandas()
    m = triple_prf(edges, gold)
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m


def test_docred_unlinkable_vertex_gets_nt_id(ray_session):
    docs = [
        {
            "title": "d0",
            "sents": [["Alpha", "visited", "Beta", "today"]],
            "vertexSet": [
                [{"name": "Alpha", "sent_id": 0, "pos": [0, 1], "type": "PER"}],
                [{"name": "Beta", "sent_id": 0, "pos": [2, 3], "type": "LOC", "link": "Q7"}],
            ],
            "labels": [],
        }
    ]
    import json

    import tempfile

    from kire_ray.sources.docred import docs_to_linked

    t = docs_to_linked(docs)
    ents = t.column("entities").to_pylist()[0]
    assert ents[0]["qid"].startswith("NT")
    assert ents[1]["qid"] == "Q7"


def test_ndjson_branch_equals_array_branch(ray_session, tiny_corpus, tmp_path):
    """read_docred_json: NDJSON shards (scale path) produce the same
    linked docs as the array-file branch."""
    import json

    path = write_docred_json(tiny_corpus, str(tmp_path / "arr.json"))
    nd = str(tmp_path / "nd.jsonl")
    with open(nd, "w") as f:
        for d in json.load(open(path)):
            f.write(json.dumps(d) + "\n")
    a = read_docred_json(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = read_docred_json(nd).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    for i in range(len(a)):
        assert list(a["entities"][i]) == list(b["entities"][i])
        assert list(a["turn_texts"][i]) == list(b["turn_texts"][i])
