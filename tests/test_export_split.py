"""Id-mapped KG export layout + AE-style train/valid split."""

import os

import pandas as pd
import pytest

import ray.data

from kire_ray.state.export import export_id_mapped_kg, load_id_maps


def test_export_layout_and_roundtrip(ray_session, tmp_path):
    edges = pd.DataFrame(
        {
            "subj_qid": ["Q2", "Q1", "Q1", "Q3", "Q2"],
            "pred": ["P1", "P2", "P1", "P1", "P1"],
            "obj_qid": ["Q1", "Q3", "Q2", "Q1", "Q1"],  # last = dup of first
            "score": [0.9] * 5,
        }
    )
    out = str(tmp_path / "kg")
    stats = export_id_mapped_kg(
        ray.data.from_pandas(edges).repartition(3),
        out,
        labels={"Q1": "alpha"},
    )
    assert stats == {"n_entities": 3, "n_relations": 2, "n_triples": 4}
    ent, rel = load_id_maps(out)
    # first-seen over the SORTED triple stream:
    # (Q1,P1,Q2) (Q1,P2,Q3) (Q2,P1,Q1) (Q3,P1,Q1)
    assert ent == {"Q1": 0, "Q2": 1, "Q3": 2}
    assert rel == {"P1": 0, "P2": 1}
    with open(os.path.join(out, "one_hop_relation_triplets.nt3")) as f:
        lines = [l.rstrip("\n") for l in f]
    assert lines == ["Q1\tP1\tQ2", "Q1\tP2\tQ3", "Q2\tP1\tQ1", "Q3\tP1\tQ1"]
    with open(os.path.join(out, "one_hop_relation_triplets_ids.nt3")) as f:
        ids = [tuple(map(int, l.split("\t"))) for l in f if l.strip()]
    assert ids == [(0, 0, 1), (0, 1, 2), (1, 0, 0), (2, 0, 0)]
    with open(os.path.join(out, "one_hop_entity2label.txt")) as f:
        lbl = dict(l.rstrip("\n").split("\t") for l in f if l.strip())
    assert lbl == {"Q1": "alpha", "Q2": "Q2", "Q3": "Q3"}
    # determinism: re-export over a different partitioning
    out2 = str(tmp_path / "kg2")
    export_id_mapped_kg(ray.data.from_pandas(edges).repartition(1), out2)
    with open(os.path.join(out2, "one_hop_relation_triplets_ids.nt3")) as f:
        assert [tuple(map(int, l.split("\t"))) for l in f if l.strip()] == ids


def test_split_train_valid(ray_session):
    from kire_ray.pipelines.eval import split_train_valid

    docs = pd.DataFrame({"doc_id": [f"d{i}" for i in range(5000)], "x": range(5000)})
    ds = ray.data.from_pandas(docs).repartition(8)
    train, valid = split_train_valid(ds, key_col="doc_id", valid_proportion=0.1, seed=3)
    t = train.to_pandas()
    v = valid.to_pandas()
    assert len(t) + len(v) == 5000
    assert not set(t.doc_id) & set(v.doc_id)
    assert 0.07 < len(v) / 5000 < 0.13  # proportional
    # deterministic across runs and partitionings
    t2, v2 = split_train_valid(
        ray.data.from_pandas(docs).repartition(3), key_col="doc_id",
        valid_proportion=0.1, seed=3,
    )
    assert set(v2.to_pandas().doc_id) == set(v.doc_id)
    # different seed -> different split
    _, v3 = split_train_valid(ds, key_col="doc_id", valid_proportion=0.1, seed=4)
    assert set(v3.to_pandas().doc_id) != set(v.doc_id)
