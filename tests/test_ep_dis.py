"""ep_dis per-pair distance channel: dis2idx table parity and the
signed/shifted SSAN semantics; featurize emission over linked docs."""

import numpy as np
import pandas as pd

from kire_ray.stages.featurize import dis_bucket, ep_dis_signed


def test_dis2idx_table_parity():
    """dis_bucket == the reference's dis2idx_dir lookup table
    (kg_data_loader.py:62-72) for every distance it covers."""
    table = np.zeros(1024, dtype=np.int64)
    table[1] = 1
    for k, v in ((2, 2), (4, 3), (8, 4), (16, 5), (32, 6), (64, 7), (128, 8), (256, 9)):
        table[k:] = v
    d = np.arange(1024)
    np.testing.assert_array_equal(dis_bucket(d), table[d])


def test_ep_dis_signed_shift():
    """SSAN dataset.py:210-220: sign(delta)*bucket(|delta|) + 10."""
    assert ep_dis_signed([0]).tolist() == [10]
    assert ep_dis_signed([1, -1]).tolist() == [11, 9]
    assert ep_dis_signed([300, -300]).tolist() == [19, 1]
    assert ep_dis_signed([7, -7]).tolist() == [13, 7]


def test_featurize_pair_channel(ray_session, tiny_corpus):
    from kire_ray.pipelines.kg_construct import (
        KGContext,
        linked_documents,
        read_transcripts,
    )
    from kire_ray.stages.featurize import build_word_vocab, featurize

    ctx = KGContext.from_corpus(tiny_corpus)
    linked = linked_documents(read_transcripts(tiny_corpus), ctx).materialize()
    vocab = build_word_vocab(linked)
    feats = featurize(linked, vocab, kg_ref=ctx.kg_ref, canon_ref=ctx.canon_ref).to_pandas()
    docs = linked.to_pandas().set_index("doc_id")
    multi = feats[feats["pair_h"].map(len) > 0]
    assert len(multi) > 0, "corpus has multi-entity docs"
    row = multi.iloc[0]
    doc = docs.loc[row["doc_id"]]
    # recompute first-appearance offsets by hand
    turn_start = np.cumsum([0] + [len(t.split()) for t in doc["turn_texts"]])
    first = {}
    for m in doc["mentions"]:
        g = int(turn_start[m["turn_idx"]]) + m["start"]
        first.setdefault(m["ent_idx"], g)
    n_e = len(first)
    assert len(row["pair_h"]) == n_e * (n_e - 1)
    for h, t, d in zip(row["pair_h"], row["pair_t"], row["ep_dis"]):
        assert d == ep_dis_signed([first[h] - first[t]])[0]
        assert h != t
    # antisymmetry around 10
    lut = {(h, t): d for h, t, d in zip(row["pair_h"], row["pair_t"], row["ep_dis"])}
    for (h, t), d in lut.items():
        assert lut[(t, h)] == 20 - d or (d == 10 and lut[(t, h)] == 10)
