"""GLRE ``.data`` pair-row format: round-trip, NA-pair semantics,
global-offset rebase, cross/dist, and a DuckDB oracle for the
indev_train name-level semi-join."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kire_ray.sources.glre_data import (
    parse_glre_line,
    read_glre_documents,
    read_glre_pairs,
    render_doc_line,
    write_glre_data,
)
from kire_ray.stages.linking import ENTITY_T, MENTION_T


def _linked_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "turn_texts": pa.array(
                [r["turn_texts"] for r in rows], pa.list_(pa.string())
            ),
            "entities": pa.array([r["entities"] for r in rows], pa.list_(ENTITY_T)),
            "mentions": pa.array([r["mentions"] for r in rows], pa.list_(MENTION_T)),
        }
    )


@pytest.fixture()
def tiny_docs():
    def ent(i, qid, label, n):
        return {"ent_idx": i, "qid": qid, "label": label, "n_mentions": n}

    def men(i, turn, s, e, surf):
        return {"ent_idx": i, "turn_idx": turn, "start": s, "end": e, "surface": surf}

    return [
        {
            "doc_id": "d1",
            "turn_texts": ["alice met bob", "bob called alice back"],
            "entities": [ent(0, "Q1", "alice", 2), ent(1, "Q2", "bob", 2)],
            "mentions": [
                men(0, 0, 0, 1, "alice"),
                men(1, 0, 2, 3, "bob"),
                men(1, 1, 0, 1, "bob"),
                men(0, 1, 2, 3, "alice"),
            ],
        },
        {
            "doc_id": "d2",
            "turn_texts": ["carol works alone", "dave visited carol"],
            "entities": [ent(0, "Q3", "carol", 2), ent(1, "Q4", "dave", 1)],
            "mentions": [
                men(0, 0, 0, 1, "carol"),
                men(1, 1, 0, 1, "dave"),
                men(0, 1, 2, 3, "carol"),
            ],
        },
    ]


LABELS = {
    "d1": [{"h": 0, "t": 1, "r": "knows"}],
    "d2": [{"h": 1, "t": 0, "r": "visited"}],
}


def test_render_line_fields(tiny_docs):
    d = tiny_docs[0]
    line = render_doc_line(
        d["doc_id"], [t.split() for t in d["turn_texts"]],
        d["entities"], d["mentions"], LABELS["d1"],
        train_facts={("alice", "bob", "knows")},
    )
    f = line.split("\t")
    assert f[0] == "d1"
    assert f[1] == "alice met bob||bob called alice back"
    chunks = [f[2 + i * 18 : 2 + (i + 1) * 18] for i in range((len(f) - 2) // 18)]
    assert len(chunks) == 2  # 1 labeled + 1 NA (2 entities -> 2 ordered pairs)
    lab = chunks[0]
    assert lab[0] == "knows" and lab[1] == "L2R"
    assert lab[2] == "NON-CROSS"  # alice & bob share sentence 0
    # global offsets: sentence 1 rebases by 3 words
    assert lab[3] == "0-1"  # head alice first mention
    assert lab[4] == "2-3"  # tail bob first mention
    assert lab[5] == "0" and lab[11] == "1"
    assert lab[8] == "0:5" and lab[9] == "1:6"  # alice at 0 and 3+2
    assert lab[14] == "2:3" and lab[15] == "3:4"  # bob at 2 and 3+0
    assert lab[10] == "0:1" and lab[16] == "0:1"
    assert lab[17] == "True"
    na = chunks[1]
    assert na[0] == "NA" and na[5] == "1" and na[11] == "0" and na[17] == "False"


def test_roundtrip_parse(tiny_docs):
    d = tiny_docs[0]
    line = render_doc_line(
        d["doc_id"], [t.split() for t in d["turn_texts"]],
        d["entities"], d["mentions"], LABELS["d1"],
        train_facts=set(),
    )
    rows = parse_glre_line(line)
    assert [r["rel"] for r in rows] == ["knows", "NA"]
    r = rows[0]
    assert (r["h_idx"], r["t_idx"]) == (0, 1)
    assert r["h_names"] == ["alice", "alice"]
    assert r["h_starts"] == [0, 5] and r["h_ends"] == [1, 6]
    assert r["dist"] == 0  # share sentence 0
    assert r["cross"] == "NON-CROSS"
    assert not r["intrain"]


def test_write_read_dataset_roundtrip(ray_session, tiny_docs, tmp_path):
    ds = ray.data.from_arrow(_linked_table(tiny_docs)).repartition(2)
    out = str(tmp_path / "glre")
    write_glre_data(ds, LABELS, out, train_facts={("dave", "carol", "visited")})
    pairs = read_glre_pairs(out).to_pandas().sort_values(["doc_id", "rel"])
    assert len(pairs) == 4  # 2 docs x (1 labeled + 1 NA)
    assert set(pairs["doc_id"]) == {"d1", "d2"}
    d2 = pairs[(pairs.doc_id == "d2") & (pairs.rel == "visited")].iloc[0]
    assert d2["intrain"]  # fact present in the train-fact set
    assert d2["dist"] == 0  # dave sent {1}, carol sents {0,1} -> min |1-1| = 0
    docs = read_glre_documents(out).to_pandas().sort_values("doc_id")
    assert [list(t) for t in docs["turn_texts"]] == [
        ["alice met bob", "bob called alice back"],
        ["carol works alone", "dave visited carol"],
    ]


def test_intrain_duckdb_oracle(ray_session, tmp_path):
    """The indev_train flag == a name-level train-fact semi-join,
    verified against DuckDB SQL over the written pair table."""
    import numpy as np

    rng = np.random.default_rng(7)
    names = [f"p{i}" for i in range(12)]
    docs, labels = [], {}
    for d in range(30):
        ids = rng.choice(len(names), size=3, replace=False)
        ents, ments = [], []
        toks = []
        for j, ni in enumerate(ids):
            ents.append({"ent_idx": j, "qid": f"Q{ni}", "label": names[ni], "n_mentions": 1})
            ments.append(
                {"ent_idx": j, "turn_idx": 0, "start": j, "end": j + 1, "surface": names[ni]}
            )
            toks.append(names[ni])
        docs.append(
            {
                "doc_id": f"doc{d:02d}",
                "turn_texts": [" ".join(toks)],
                "entities": ents,
                "mentions": ments,
            }
        )
        labels[f"doc{d:02d}"] = [{"h": 0, "t": 1, "r": "rel%d" % (d % 3)}]
    # train = first 20 docs; fact set = their (h_name, t_name, rel)
    train_facts = set()
    for d in docs[:20]:
        l = labels[d["doc_id"]][0]
        h = d["mentions"][l["h"]]["surface"]
        t = d["mentions"][l["t"]]["surface"]
        train_facts.add((h, t, l["r"]))
    ds = ray.data.from_arrow(_linked_table(docs)).repartition(4)
    out = str(tmp_path / "glre2")
    write_glre_data(ds, labels, out, train_facts=train_facts)
    pairs = read_glre_pairs(out).to_pandas()
    pairs["h_name0"] = [n[0] for n in pairs["h_names"]]
    pairs["t_name0"] = [n[0] for n in pairs["t_names"]]
    tf = pd.DataFrame(sorted(train_facts), columns=["h", "t", "r"])
    con = duckdb.connect()
    con.register("pairs", pairs[["doc_id", "h_idx", "t_idx", "rel", "h_name0", "t_name0", "intrain"]])
    con.register("train_facts", tf)
    got = con.execute(
        """
        SELECT doc_id, h_idx, t_idx, rel,
               EXISTS (SELECT 1 FROM train_facts f
                       WHERE f.h = p.h_name0 AND f.t = p.t_name0 AND f.r = p.rel)
                   AS intrain_sql,
               intrain
        FROM pairs p ORDER BY doc_id, h_idx, t_idx, rel
        """
    ).fetchdf()
    assert (got["intrain"] == got["intrain_sql"]).all()
    assert got["intrain"].sum() >= 20  # every train fact flags its own pair
