"""Kill-resume: interrupted run + resume == single uninterrupted run."""

import numpy as np
import pandas as pd
import pytest

from kire_ray.pipelines.kg_construct import build_graph, load_output, run_resumable
from kire_ray.state.manifest import done_partitions, read_manifests


def test_kill_resume_exact(ray_session, tiny_corpus, tmp_path):
    out = str(tmp_path / "kg_out")
    n_parts = 4

    with pytest.raises(RuntimeError, match="simulated failure"):
        run_resumable(tiny_corpus, out, n_parts=n_parts, concurrency=2, fail_after=2)
    assert done_partitions(out, n_parts) == {0, 1}

    # resume: only the remaining partitions run
    manifests = run_resumable(tiny_corpus, out, n_parts=n_parts, concurrency=2)
    assert [m["partition"] for m in manifests] == [2, 3]
    assert done_partitions(out, n_parts) == {0, 1, 2, 3}

    # lineage recorded per partition
    for m in read_manifests(out, n_parts):
        assert m["lineage"]["partition_key"] == "hash64(conv_id) % n_parts"
        assert m["rows"]["triples"] >= 0 and "wall_sec" in m

    # merged output == single-run output
    single = build_graph(tiny_corpus, concurrency=2)
    e_single = (
        single["edges"]
        .to_pandas()
        .sort_values(["subj_qid", "pred", "obj_qid"])
        .reset_index(drop=True)
    )
    e_resumed = (
        load_output(out, "edges")
        .to_pandas()
        .sort_values(["subj_qid", "pred", "obj_qid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        e_resumed[["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]],
        e_single[["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]],
        check_dtype=False,
    )

    n_single = single["nodes"].to_pandas().sort_values("qid").reset_index(drop=True)
    n_resumed = (
        load_output(out, "nodes").to_pandas().sort_values("qid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        n_resumed[["qid", "label", "n_docs", "n_mentions"]],
        n_single[["qid", "label", "n_docs", "n_mentions"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(
        np.stack(n_resumed["vec"].map(np.asarray)),
        np.stack(n_single["vec"].map(np.asarray)),
        atol=1e-9,
    )

    # idempotent: nothing left to do
    assert run_resumable(tiny_corpus, out, n_parts=n_parts, concurrency=2) == []


def test_kill_mid_chunk_resume_odd_sizes(ray_session, tiny_corpus, tmp_path):
    """Chunked execution: kill after 2 of 5 partitions with chunk_size=3
    (failure lands mid-chunk), resume, and require bit-identical output
    to a single chunk_size=5 run — including float node vectors."""
    import pandas as pd
    import pyarrow.dataset as pads
    import pytest

    from kire_ray.pipelines.kg_construct import run_resumable

    mid, full = str(tmp_path / "mid"), str(tmp_path / "full")
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_resumable(tiny_corpus, mid, n_parts=5, chunk_size=3, fail_after=2)
    resumed = run_resumable(tiny_corpus, mid, n_parts=5, chunk_size=3)
    assert len(resumed) == 3  # exactly the missing partitions
    run_resumable(tiny_corpus, full, n_parts=5, chunk_size=5)
    for part in range(5):
        for table in ("triples", "edges", "nodes"):
            a = pads.dataset(f"{mid}/part={part}/{table}").to_table().to_pandas()
            b = pads.dataset(f"{full}/part={part}/{table}").to_table().to_pandas()
            key = [c for c in a.columns if c != "vec"]
            a = a.sort_values(key).reset_index(drop=True)
            b = b.sort_values(key).reset_index(drop=True)
            if "vec" in a.columns:
                assert [tuple(v) for v in a.pop("vec")] == [tuple(v) for v in b.pop("vec")]
            pd.testing.assert_frame_equal(a, b)


def test_ingest_batches_equal_oneshot(ray_session, tiny_corpus, tmp_path):
    """Continuous ingestion: two disjoint corpus slices written as
    immutable segments into ONE output dir (batch-namespaced partition
    ranges), merged on read — bit-equal to the one-shot build."""
    from kire_ray.pipelines.kg_construct import ingest_batch

    out = str(tmp_path / "ingest_out")
    m0 = ingest_batch(tiny_corpus, out, 0, n_batches=2, n_parts=2, concurrency=2)
    m1 = ingest_batch(tiny_corpus, out, 1, n_batches=2, n_parts=2, concurrency=2)
    assert [m["partition"] for m in m0] == [0, 1]
    assert [m["partition"] for m in m1] == [2, 3]
    # batch 1's arrival rewrote nothing of batch 0
    assert all(m["lineage"]["part_offset"] == 0 for m in m0)
    # re-ingesting a batch is a no-op (segments are immutable)
    assert ingest_batch(tiny_corpus, out, 0, n_batches=2, n_parts=2) == []

    single = build_graph(tiny_corpus, concurrency=2)
    e_single = (
        single["edges"]
        .to_pandas()
        .sort_values(["subj_qid", "pred", "obj_qid"])
        .reset_index(drop=True)
    )
    e_merged = (
        load_output(out, "edges")
        .to_pandas()
        .sort_values(["subj_qid", "pred", "obj_qid"])
        .reset_index(drop=True)
    )
    cols = ["subj_qid", "pred", "obj_qid", "score", "n_docs", "first_doc"]
    pd.testing.assert_frame_equal(e_merged[cols], e_single[cols], check_dtype=False)

    t_single = single["triples"].count()
    t_merged = load_output(out, "triples").count()
    assert t_single == t_merged

    n_single = single["nodes"].to_pandas().sort_values("qid").reset_index(drop=True)
    n_merged = (
        load_output(out, "nodes").to_pandas().sort_values("qid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        n_merged[["qid", "label", "n_docs", "n_mentions"]],
        n_single[["qid", "label", "n_docs", "n_mentions"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(
        np.stack(n_merged["vec"].map(np.asarray)),
        np.stack(n_single["vec"].map(np.asarray)),
        atol=1e-9,
    )
