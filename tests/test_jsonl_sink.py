"""Sharded JSONL sink: round-trip, deterministic bytes, resume."""

import hashlib
import os

import pandas as pd

import ray.data


def _docs(n=200):
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"doc {i} body" for i in range(n)],
            "lang": ["en", "de"] * (n // 2),
        }
    )


def _sha_dir(d):
    return {
        f: hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(d))
        if f.endswith(".jsonl.gz")
    }


def test_jsonl_roundtrip_and_determinism(ray_session, tmp_path):
    from kire_ray.state.jsonl import export_jsonl_shards, read_jsonl_shards

    df = _docs()
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_jsonl_shards(
        ray.data.from_pandas(df).repartition(7), d1, n_shards=8
    )
    m2 = export_jsonl_shards(ray.data.from_pandas(df), d2, n_shards=8)
    assert m1["n_rows"].sum() == len(df)
    # bit-identical across runs and partitionings
    assert _sha_dir(d1) == _sha_dir(d2)
    back = (
        read_jsonl_shards(d1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        back[["doc_id", "text", "lang"]], df.reset_index(drop=True)
    )


def test_jsonl_resume_skips_finished(ray_session, tmp_path):
    from kire_ray.state.jsonl import export_jsonl_shards

    df = _docs(50)
    d = str(tmp_path / "r")
    export_jsonl_shards(ray.data.from_pandas(df), d, n_shards=4)
    before = _sha_dir(d)
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in before}
    m = export_jsonl_shards(ray.data.from_pandas(df), d, n_shards=4)
    assert _sha_dir(d) == before
    after = {f: os.path.getmtime(os.path.join(d, f)) for f in before}
    assert after == mtimes  # files untouched, not rewritten
    assert m["n_rows"].sum() == 50


def test_hive_export_overwrite_and_prune(ray_session, tmp_path):
    """Re-export doesn't double data; hive column prunes on read."""
    from kire_ray.state.parquet_sink import hive_export

    df = _docs(60)
    d = str(tmp_path / "hive")
    m1 = hive_export(ray.data.from_pandas(df), d, ["lang"])
    m2 = hive_export(ray.data.from_pandas(df), d, ["lang"])  # overwrite
    pd.testing.assert_frame_equal(m1, m2)
    assert m1["n_rows"].sum() == 60
    only_en = ray.data.read_parquet(d, filter=None)
    en = only_en.to_pandas()
    assert set(en["lang"].astype(str)) == {"en", "de"}
    import os

    assert sorted(os.listdir(d)) == ["lang=de", "lang=en"]


def test_orc_roundtrip_idempotent(ray_session, tmp_path):
    """ORC shards are content-named: a re-run overwrites its own files
    (no duplicate rows), and the read is column-pruned."""
    import pandas as pd

    import ray.data
    from kire_ray.sources.orc import read_orc, write_orc_sharded

    df = pd.DataFrame({"a": range(100), "b": [f"s{i}" for i in range(100)]})
    ds = ray.data.from_pandas(df).repartition(4)
    out = str(tmp_path / "orc")
    m1 = write_orc_sharded(ds, out)
    m2 = write_orc_sharded(ds, out)  # idempotent re-run
    assert sorted(m1["path"]) == sorted(m2["path"])
    back = read_orc(out).to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)
    only_a = read_orc(out, columns=["a"]).to_pandas()
    assert list(only_a.columns) == ["a"] and len(only_a) == 100


def test_feather_roundtrip_idempotent(ray_session, tmp_path):
    """Feather/IPC shards are content-named: a re-run overwrites its
    own files (no duplicate rows), and the read is column-pruned."""
    import pandas as pd

    import ray.data
    from kire_ray.sources.feather import read_feather, write_feather_sharded

    df = pd.DataFrame({"a": range(100), "b": [f"s{i}" for i in range(100)]})
    ds = ray.data.from_pandas(df).repartition(4)
    out = str(tmp_path / "feather")
    m1 = write_feather_sharded(ds, out)
    m2 = write_feather_sharded(ds, out)  # idempotent re-run
    assert sorted(m1["path"]) == sorted(m2["path"])
    back = read_feather(out).to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)
    only_a = read_feather(out, columns=["a"]).to_pandas()
    assert list(only_a.columns) == ["a"] and len(only_a) == 100
