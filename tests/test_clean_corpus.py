"""clean_corpus: composed gate→dedup→redact pipeline + exact resume."""

import re

import numpy as np
import pandas as pd
import pytest

import ray.data

from kire_ray.pipelines.clean_corpus import (
    clean_corpus_build,
    clean_docs,
    load_clean,
)
from kire_ray.pipelines.text_analysis import EMAIL_PATTERN

SF = "/root/testdata/sf0.001"


def _sequential_clean(df: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas oracle of the whole chain."""
    from kire_ray.pipelines.text_analysis import gopher_metrics

    passes = gopher_metrics(df)["passes"].to_numpy()
    kept = df.loc[passes].sort_values("doc_id")
    grp = kept.groupby("text", sort=False)
    first = grp.head(1).copy()
    first["n_dups"] = grp.size().reindex(first["text"]).to_numpy(dtype=np.int64)
    t = first["text"].str.replace(EMAIL_PATTERN, "<EMAIL>", regex=True)
    first["clean_text"] = t.str.replace(r"[0-9]+", "<NUM>", regex=True)
    return (
        first[["doc_id", "source", "clean_text", "n_dups"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def docs_df():
    df = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "source", "text"]]
    # plant exact duplicates (shifted ids, later than originals) and a
    # PII-bearing passing doc so every stage has work to do
    dup = df.head(8).copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    pii = pd.DataFrame(
        {
            "doc_id": [2_000_000],
            "source": ["srcpii"],
            "text": [
                "please send the report to a.b+x@sub.example.org and also "
                "to c@d.io before the end of week 42 thanks a lot of the team"
            ],
        }
    )
    return pd.concat([df, dup, pii], ignore_index=True)


def test_clean_docs_matches_sequential(ray_session, docs_df):
    got = (
        clean_docs(ray.data.from_pandas(docs_df).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _sequential_clean(docs_df)
    pd.testing.assert_frame_equal(got, exp)
    # the planted dup docs were removed, originals kept with n_dups=2
    planted = exp[exp.n_dups > 1]
    assert len(planted) >= 1
    assert (got["doc_id"] < 1_000_000).sum() == len(got) - 1  # only pii row above
    # redaction really fired on the planted PII doc
    pii_row = got[got.doc_id == 2_000_000]
    if len(pii_row):  # only present if it passes the gopher gate
        assert "<EMAIL>" in pii_row.iloc[0]["clean_text"]
        assert "<NUM>" in pii_row.iloc[0]["clean_text"]
        assert not re.search(EMAIL_PATTERN, pii_row.iloc[0]["clean_text"])


def test_clean_corpus_build_resume_exact(ray_session, docs_df, tmp_path):
    src = tmp_path / "docs.parquet"
    docs_df.to_parquet(src)
    full_dir = tmp_path / "full"
    clean_corpus_build(str(src), str(full_dir), n_parts=8, chunk_size=3)
    full = (
        load_clean(str(full_dir)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    # kill after 2 partitions, then resume
    resumed_dir = tmp_path / "resumed"
    with pytest.raises(RuntimeError, match="simulated failure"):
        clean_corpus_build(
            str(src), str(resumed_dir), n_parts=8, chunk_size=3, fail_after=2
        )
    from kire_ray.state.manifest import done_partitions

    assert len(done_partitions(str(resumed_dir), 8)) == 2
    clean_corpus_build(str(src), str(resumed_dir), n_parts=8, chunk_size=3)
    resumed = (
        load_clean(str(resumed_dir))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(resumed, full)
    pd.testing.assert_frame_equal(full, _sequential_clean(docs_df))
