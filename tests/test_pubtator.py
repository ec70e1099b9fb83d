"""PubTator source: line parse, char→word rebase, kb-id clustering,
multi-id annotations, relations — against a hand-built fixture."""

import pytest

import ray.data

from kire_ray.sources.pubtator import read_pubtator

FIXTURE = """\
100|t|Aspirin cures headache
100|a|Aspirin is a common drug for headache relief
100\t0\t7\tAspirin\tChemical\tD001
100\t14\t22\theadache\tDisease\tD002
100\t23\t30\tAspirin\tChemical\tD001
100\t52\t60\theadache\tDisease\tD002
100\tCID\tD001\tD002

200|t|Gene X binds protein Y
200\t0\t6\tGene X\tGene\tG1|G2
200\t14\t23\tprotein Y\tGene\tG3
"""


@pytest.fixture()
def pt_file(tmp_path):
    p = tmp_path / "sample.pubtator"
    p.write_text(FIXTURE)
    return str(p)


def test_read_pubtator(ray_session, pt_file):
    docs = read_pubtator(pt_file).to_pandas().sort_values("doc_id")
    assert docs["doc_id"].tolist() == ["100", "200"]

    d1 = docs.iloc[0]
    assert list(d1["turn_texts"]) == [
        "Aspirin cures headache",
        "Aspirin is a common drug for headache relief",
    ]
    ents = {e["qid"]: e for e in d1["entities"]}
    assert set(ents) == {"D001", "D002"}
    assert ents["D001"]["n_mentions"] == 2 and ents["D002"]["n_mentions"] == 2
    # char offsets rebased to word coordinates per turn:
    # title 'Aspirin cures headache': Aspirin=[0,1), headache=[2,3)
    # abstract offsets shift by len(title)+1=23: 'Aspirin'=[0,1),
    # 'headache' at chars 52-60 -> abstract chars 29-37 -> word 6
    ms = sorted(
        ({**m} for m in d1["mentions"]),
        key=lambda m: (m["turn_idx"], m["start"]),
    )
    spans = [(m["turn_idx"], m["start"], m["end"], m["ent_idx"]) for m in ms]
    d001 = ents["D001"]["ent_idx"]
    d002 = ents["D002"]["ent_idx"]
    assert (0, 0, 1, d001) in spans
    assert (0, 2, 3, d002) in spans
    assert (1, 0, 1, d001) in spans
    assert (1, 6, 7, d002) in spans
    rels = list(d1["relations"])
    assert rels == [{"rel": "CID", "arg1": "D001", "arg2": "D002"}]

    d2 = docs.iloc[1]
    # 'G1|G2' -> one entity per candidate id (reference behavior)
    assert {e["qid"] for e in d2["entities"]} == {"G1", "G2", "G3"}
    # multi-word span: 'Gene X' covers words [0,2), 'protein Y' [3,5)
    g1_spans = [
        (m["turn_idx"], m["start"], m["end"])
        for m in d2["mentions"]
        if m["surface"] == "Gene X"
    ]
    assert all(s == (0, 0, 2) for s in g1_spans) and len(g1_spans) == 2
    g3 = [m for m in d2["mentions"] if m["surface"] == "protein Y"]
    assert (g3[0]["start"], g3[0]["end"]) == (3, 5)
    assert len(list(d2["relations"])) == 0


def test_downstream_stages_run_on_pubtator(ray_session, pt_file):
    """The linked-doc schema is the engine's lingua franca: featurize
    runs unchanged on PubTator input."""
    from kire_ray.stages.featurize import build_word_vocab, featurize

    docs = read_pubtator(pt_file)
    vocab = build_word_vocab(docs)
    feats = featurize(docs, vocab).to_pandas()
    assert len(feats) == 2
    assert (feats["n_words"] > 0).all()
    row = feats.sort_values("doc_id").iloc[0]
    assert max(row["ent_ids"]) >= 1  # mention channel populated
    assert len(row["ep_dis"]) > 0
