"""End-to-end resumable corpus cleaning: Gopher quality gate → exact
dedup (keep lowest doc_id) → email/number redaction → partitioned
parquet with atomic per-partition manifests.

The partition key is ``hash64_fast(text) % n_parts`` — the DEDUP key,
not the doc id: byte-identical copies of a document always co-locate,
so keep-min dedup is partition-local and the per-partition outputs
compose to exactly the global result with no cross-partition
reconciliation. That property is what makes kill-resume exact: a
resumed run recomputes only missing partitions and the union equals a
single-run build bit-for-bit (same layout as the KG build,
state/manifest.py; the reference's only resume is file-level caching,
/root/reference/ATLOP+KIRE/data/gen_kg_data.py:137-141).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data

from kire_ray.functions.hashing import hash64_fast
from kire_ray.pipelines.text_analysis import EMAIL_PATTERN, gopher_metrics

PID = "_cpid"


def _gate_and_key(n_parts: int, text_col: str, id_col: str):
    """Quality-filter a batch and attach the dedup-key partition id."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        passes = gopher_metrics(b, text_col=text_col, id_col=id_col)["passes"]
        keep = b.loc[passes.to_numpy(), [id_col, "source", text_col]].copy()
        keep[PID] = (hash64_fast(keep[text_col].to_numpy()) % n_parts).astype(
            np.int64
        )
        return keep

    return fn


def _dedup_redact(text_col: str, id_col: str):
    """Per-partition: keep the lowest doc_id per text, count the copies,
    then scrub emails → <EMAIL> and digit runs → <NUM> (vectorized)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        grp = g.groupby(text_col, sort=False)
        first = grp.head(1).copy()
        first["n_dups"] = grp.size().reindex(first[text_col]).to_numpy(dtype=np.int64)
        t = first[text_col].str.replace(EMAIL_PATTERN, "<EMAIL>", regex=True)
        first["clean_text"] = t.str.replace(r"[0-9]+", "<NUM>", regex=True)
        return first[[id_col, "source", "clean_text", "n_dups", PID]]

    return fn


def clean_docs(
    ds: "ray.data.Dataset",
    *,
    n_parts: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_pid: bool = False,
    only_pids: "list[int] | None" = None,
) -> "ray.data.Dataset":
    """The in-memory pipeline (driver-query form): survivors only, as
    (doc_id, source, clean_text, n_dups). One stateless gate pass, one
    hash exchange on the text key, vectorized reducers. ``only_pids``
    restricts to a set of text-hash buckets BEFORE the exchange (the
    resumable build's chunk filter)."""
    from kire_ray.stages.shuffle import default_partitions, partitioned_map_groups

    P = n_parts or default_partitions()
    gated = ds.map_batches(_gate_and_key(P, text_col, id_col), batch_format="pandas")
    if only_pids is not None:
        keep = list(only_pids)
        gated = gated.map_batches(
            lambda b: b[b[PID].isin(keep)], batch_format="pandas"
        )
    out = partitioned_map_groups(gated, [PID], _dedup_redact(text_col, id_col))
    if keep_pid:
        return out
    return out.drop_columns([PID])


def clean_corpus_build(
    docs_path: str,
    out_dir: str,
    *,
    n_parts: int = 8,
    chunk_size: int = 4,
    fail_after: int | None = None,
) -> list[dict]:
    """Resumable build: one atomic parquet partition (+ manifest with
    lineage) per text-hash bucket; a rerun skips finished partitions.
    Chunked like the KG build — ``chunk_size`` buckets share one Ray
    execution so resume granularity stays cheap."""
    from kire_ray.state.manifest import done_partitions, write_partition_atomic

    done = done_partitions(out_dir, n_parts)
    pending = [p for p in range(n_parts) if p not in done]
    manifests: list[dict] = []
    n_run = 0
    for ci in range(0, len(pending), chunk_size):
        chunk = pending[ci : ci + chunk_size]
        if fail_after is not None and n_run >= fail_after:
            raise RuntimeError(f"simulated failure after {fail_after} partitions")
        ds = ray.data.read_parquet(docs_path, columns=["doc_id", "source", "text"])
        cleaned = clean_docs(
            ds, n_parts=n_parts, keep_pid=True, only_pids=chunk
        ).materialize()

        for part in chunk:
            if fail_after is not None and n_run >= fail_after:
                raise RuntimeError(f"simulated failure after {fail_after} partitions")

            def writer(tmp: str, _part=part) -> dict:
                sub = os.path.join(tmp, "docs")
                part_ds = cleaned.map_batches(
                    lambda b, _p=_part: b[b[PID] == _p].drop(columns=[PID]),
                    batch_format="pandas",
                )
                part_ds.write_parquet(sub)
                import pyarrow.dataset as pads

                return {"docs": pads.dataset(sub).count_rows()}

            lineage = {
                "docs_path": os.path.abspath(docs_path),
                "n_parts": n_parts,
                "partition_key": "hash64_fast(text) % n_parts",
                "stages": "gopher_gate -> exact_dedup(min doc_id) -> redact",
            }
            manifests.append(write_partition_atomic(out_dir, part, writer, lineage))
            n_run += 1
    return manifests


def load_clean(out_dir: str) -> "ray.data.Dataset":
    """Read every finished partition; partitions are disjoint by text
    hash, so plain concatenation equals the single-run output.

    PUBLISHED partitions only (review r5): the glob would also match a
    crashed writer's ``part=<k>.tmp`` staging dir — same manifest gate
    as the KG-side segment readers. Zero finished partitions yield a
    typed empty dataset, not a read_parquet error (the resume scenario
    this module exists for)."""
    import glob
    import re

    paths: list[str] = []
    for d in sorted(glob.glob(os.path.join(out_dir, "part=*"))):
        label = os.path.basename(d).split("=", 1)[1]
        if not re.fullmatch(r"\d+", label):
            continue
        if not os.path.exists(os.path.join(d, "_MANIFEST.json")):
            continue
        paths.extend(sorted(glob.glob(os.path.join(d, "docs", "*.parquet"))))
    if not paths:
        return ray.data.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "source": pd.Series([], dtype=object),
                 "clean_text": pd.Series([], dtype=object),
                 "n_dups": pd.Series([], dtype=np.int64)}
            )
        )
    # explicit columns: the reader would otherwise hive-infer a `part`
    # column from the partition directory names
    return ray.data.read_parquet(
        paths, columns=["doc_id", "source", "clean_text", "n_dups"]
    )
