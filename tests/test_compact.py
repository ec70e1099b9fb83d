"""Segment compaction for continuous ingest (compact_segments):
N immutable segments rewritten into one partition-range dir with the
same associative merges — merge-on-read bounded, output equal to the
one-shot build, crash-safe publication order."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from kire_ray.pipelines.kg_construct import (
    build_graph,
    compact_segments,
    ingest_batch,
    load_output,
    segment_table_paths,
)


def _edges_df(out):
    return (
        load_output(out, "edges")
        .to_pandas()
        .sort_values(["subj_qid", "pred", "obj_qid"])
        .reset_index(drop=True)
    )


def test_compaction_equal_and_bounded(ray_session, tiny_corpus, tmp_path):
    from kire_ray.state.manifest import done_partitions

    out = str(tmp_path / "ingest_out")
    ingest_batch(tiny_corpus, out, 0, n_batches=3, n_parts=2, concurrency=2)
    ingest_batch(tiny_corpus, out, 1, n_batches=3, n_parts=2, concurrency=2)
    ingest_batch(tiny_corpus, out, 2, n_batches=3, n_parts=2, concurrency=2)

    before = {
        t: segment_table_paths(out, t) for t in ("triples", "edges", "nodes")
    }
    e_before = _edges_df(out)
    t_before = load_output(out, "triples").count()
    n_before = (
        load_output(out, "nodes").to_pandas().sort_values("qid").reset_index(drop=True)
    )

    m = compact_segments(out)  # fold all six segments into one range
    assert m["lineage"]["partitions"] == [0, 1, 2, 3, 4, 5]
    assert os.path.isdir(os.path.join(out, "part=0-5"))
    # originals deleted after publication
    assert not glob.glob(os.path.join(out, "part=[0-9]"))
    # read path is bounded: one segment dir now, fewer files per table
    for t in ("triples", "edges", "nodes"):
        after = segment_table_paths(out, t)
        assert len(after) < len(before[t]), t
        assert all("part=0-5" in p for p in after)

    # bit-equal merge-on-read after compaction (edges/triples exact,
    # node scalars exact, node vectors at the fp-merge tolerance)
    pd.testing.assert_frame_equal(_edges_df(out), e_before)
    assert load_output(out, "triples").count() == t_before
    n_after = (
        load_output(out, "nodes").to_pandas().sort_values("qid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        n_after[["qid", "label", "n_docs", "n_mentions"]],
        n_before[["qid", "label", "n_docs", "n_mentions"]],
    )
    np.testing.assert_allclose(
        np.stack(n_after["vec"].map(np.asarray)),
        np.stack(n_before["vec"].map(np.asarray)),
        atol=1e-9,
    )

    # the compacted range still counts as done → re-ingest is a no-op
    assert done_partitions(out, 6) == {0, 1, 2, 3, 4, 5}
    assert ingest_batch(tiny_corpus, out, 1, n_batches=3, n_parts=2) == []

    # ...and a NEW batch lands beside the compacted range and merges in
    m3 = ingest_batch(tiny_corpus, out, 0, n_batches=3, n_parts=2, concurrency=2)
    assert m3 == []  # batch 0 fully covered by the compacted manifest


def test_compaction_matches_oneshot(ray_session, tiny_corpus, tmp_path):
    out = str(tmp_path / "ingest_out2")
    ingest_batch(tiny_corpus, out, 0, n_batches=2, n_parts=2, concurrency=2)
    ingest_batch(tiny_corpus, out, 1, n_batches=2, n_parts=2, concurrency=2)
    compact_segments(out, parts=[0, 1])  # partial compaction: one batch only

    single = build_graph(tiny_corpus, concurrency=2)
    e_single = (
        single["edges"]
        .to_pandas()
        .sort_values(["subj_qid", "pred", "obj_qid"])
        .reset_index(drop=True)
    )
    cols = ["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]
    pd.testing.assert_frame_equal(
        _edges_df(out)[cols], e_single[cols], check_dtype=False
    )
    assert load_output(out, "triples").count() == single["triples"].count()


def test_crash_between_publish_and_delete(ray_session, tiny_corpus, tmp_path):
    """If compaction crashes after the compacted dir is live but before
    the originals are deleted, readers must NOT double-count: covered
    originals are ignored."""
    import shutil

    out = str(tmp_path / "ingest_out3")
    ingest_batch(tiny_corpus, out, 0, n_batches=2, n_parts=2, concurrency=2)
    e_before = _edges_df(out)
    # simulate the crash: compact, then RESTORE the original dirs
    backup = str(tmp_path / "backup")
    shutil.copytree(out, backup)
    compact_segments(out, parts=[0, 1])
    for d in glob.glob(os.path.join(backup, "part=*")):
        shutil.copytree(d, os.path.join(out, os.path.basename(d)))
    # originals AND compacted both on disk → compacted wins, no dupes
    for t in ("triples", "edges", "nodes"):
        assert all("part=0-1" in p for p in segment_table_paths(out, t)), t
    pd.testing.assert_frame_equal(_edges_df(out), e_before)
