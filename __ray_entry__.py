"""Driver contract: entry() smoke, queries() per operator, oracle_sql().

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/shutdown() here or in anything these callables reach.

Coverage map (SURVEY.md §2 → queries; §9 for the round-2 delta):
- flagship KG construction (§3.1/§7.1, transcripts synthesised per
  BASELINE.json input_hint): kg_* entries — non-SQL (rows-only checks;
  the pytest oracle harness does the value-level verification), plus
  subwords, GLRE .data, PubTator and id-mapped export round-trips.
- relational operator set (§2.2–2.7 maps/filters/joins/aggregates/
  sorts/top-k/windows/union/anti-join/bucketing, plus as-of join,
  keyless range join, rolling windows, exact grouped distinct, grouped
  quantiles): SQL-verified.
- training-data suite (dedup/similarity/text/sampling/multimodal):
  the whole dedup family (exact, minhash, simhash, n-gram Jaccard,
  embedding, clusters, spans), winnowing fingerprints, ANN brute +
  LSH, text metrics/quality/decontam/TF-IDF/LM-score, sampling/
  shuffle/packing/chunking/redaction are all SQL-verified — hash
  primitives are md5-based exactly so DuckDB can replicate them.
  58 of 75 queries carry exact DuckDB oracles, incl. five corpus-side
  reconstructions (assembly invariant, exact gold mention spans, kg subword counts, the GLRE
  .data round trip, PubTator counts); the rest are rows-only by
  nature (the KG pipeline over the synthetic transcript corpus,
  k-means IVF, multimodal feature plumbing, nested-list outputs).

Float columns that cross the DuckDB compare are rounded half-up on BOTH
sides (kire_ray.functions.rounding) so hashes match bit-exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

N_ANN_QUERIES = 8
ANN_K = 10
# fixed BM25 probe queries over the synthetic corpus vocabulary
BM25_QUERIES = [
    "hash join merge",
    "window stream batch",
    "sort filter query",
    "customer data table scan",
]
BM25_K = 10

# Shared CTE chain for the n-gram Jaccard oracles (word 4-grams,
# rare-gram blocking df<=64): distinct grams per doc -> set sizes ->
# document frequency -> candidate pairs -> full-set intersections.
# Mirrors kire_ray.pipelines.dedup.ngram_candidates + verify_jaccard.
_NGRAM_CTES = """toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
                FROM documents
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
                FROM toks, unnest(generate_series(1, len(w) - 3)) AS t(i)
                WHERE len(w) >= 4
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
            df AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM grams a JOIN grams b USING (gram) JOIN df USING (gram)
                WHERE df.c <= 64 AND a.doc_id < b.doc_id
            ),
            inter AS (
                SELECT c.id_a, c.id_b, count(*) AS n_common
                FROM cand c
                JOIN grams ga ON ga.doc_id = c.id_a
                JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
                GROUP BY 1, 2
            )"""


# --------------------------------------------------------------------
# flagship: transcripts → knowledge graph
# --------------------------------------------------------------------


# size-aware reads for the relational/training query surface: Ray's
# CPU-derived default over-splits the small end (64 near-empty blocks
# per stage -> scheduling-bound pipelines, see sources/parquet.py);
# rows-per-block is per TABLE because compute per row varies: numeric
# TPC-H columns want ~64k-row blocks, regex/token text stages over
# documents and matmul stages over embeddings want small blocks so the
# heavy stage still fans out.
_ROWS_PER_BLOCK = {"documents": 256, "embeddings": 128}


def _sread(sf_dir: str, table: str, columns=None) -> Any:
    from kire_ray.sources.parquet import sized_read

    return sized_read(
        f"{sf_dir}/{table}.parquet",
        columns,
        rows_per_block=_ROWS_PER_BLOCK.get(table, 65536),
    )


def _corpus(sf_dir: str) -> str:
    from kire_ray.sources.synth import corpus_for_sf_dir

    return corpus_for_sf_dir(sf_dir)


# One flagship build per corpus per driver session: every kg_* /
# doc_features / doc_graphs / eval query derives from the same
# materialized linked-docs dataset + broadcast context instead of
# re-running assembly + linking + the ray.put of the dimension tables
# (measured: kg_edges 22.1s + kg_nodes 19.3s + doc_graphs 11.6s at
# sf0.1 were mostly repeated upstream work).
_FLAGSHIP: dict[str, dict] = {}


def _flagship(sf_dir: str) -> dict:
    """Context cache only (broadcast dims + canon closure)."""
    from kire_ray.pipelines.kg_construct import KGContext

    corpus = _corpus(sf_dir)
    c = _FLAGSHIP.get(corpus)
    if c is None:
        c = {"corpus": corpus, "ctx": KGContext.from_corpus(corpus)}
        _FLAGSHIP[corpus] = c
    return c


def _flagship_linked(sf_dir: str) -> dict:
    """+ materialized linked docs (paid once, by the first consumer
    that needs the linked dataset itself — nodes/coref/features)."""
    from kire_ray.pipelines.kg_construct import (
        FLAGSHIP_COLS,
        linked_documents,
        read_transcripts,
    )

    c = _flagship(sf_dir)
    if "linked" not in c:
        from kire_ray.stages.shuffle import default_partitions

        # guard against block explosion for downstream consumers, but
        # only when it actually happened: the linker task pool preserves
        # the 2×CPU pre-link width nowadays, so the unconditional
        # coalesce was a pure extra all-to-all (measured r5: 1.44 s vs
        # 1.00 s for the sf0.1 linked materialization)
        m = linked_documents(
            read_transcripts(c["corpus"], columns=FLAGSHIP_COLS), c["ctx"]
        ).materialize()
        P = default_partitions()
        if m.num_blocks() > 2 * P:
            m = m.repartition(P).materialize()
        c["linked"] = m
    return c


def _flagship_triples(sf_dir: str) -> dict:
    """+ materialized triples via ONE fused streaming execution
    (read → assemble → link → score with no mid-pipeline barrier — the
    headline path; a barrier here cost 43% of the headline throughput).
    Reuses the cached linked dataset when a linked consumer already
    materialized it."""
    from kire_ray.pipelines.kg_construct import (
        FLAGSHIP_COLS,
        extract_triples,
        linked_documents,
        read_transcripts,
    )

    c = _flagship(sf_dir)
    if "triples" not in c:
        linked = c.get("linked")
        if linked is None:
            linked = linked_documents(
                read_transcripts(c["corpus"], columns=FLAGSHIP_COLS), c["ctx"]
            )
        c["triples"] = extract_triples(linked, c["ctx"]).materialize()
    return c


def _flagship_graph(sf_dir: str, *, with_nodes: bool = False) -> dict:
    """Graph tables over the caches: edges/eval reuse the materialized
    triples; nodes (built only when asked — it is the only table that
    needs the linked docs) reuses the materialized linked dataset."""
    from kire_ray.pipelines.kg_construct import entity_vectors
    from kire_ray.stages.materialize import dedup_edges, merge_nodes

    c = _flagship_triples(sf_dir)
    if "graph" not in c:
        c["graph"] = {"triples": c["triples"], "edges": dedup_edges(c["triples"])}
    g = c["graph"]
    if with_nodes and "nodes" not in g:
        from kire_ray.stages.shuffle import default_partitions

        lc = _flagship_linked(sf_dir)
        g["linked"] = lc["linked"]
        # linked cache is materialized at exchange width and the
        # embedder preserves block count -> skip the pre-exchange
        # coalesce; the node exchange is data-sized (~4 entity rows per
        # doc, 25k rows/partition — the CC sizing rule; doc count is
        # metadata on the materialized cache)
        n_docs = lc["linked"].count()
        g["nodes"] = merge_nodes(
            entity_vectors(lc["linked"], c["ctx"]),
            coalesce=False,
            num_partitions=max(
                8, min(default_partitions(), 4 * n_docs // 25_000 + 1)
            ),
        )
    return g


def entry() -> Any:
    """Flagship KG build at sf0.001: transcripts → linked docs →
    scored triples → deduped edges. Returns the edges Dataset."""
    return _flagship_graph("/root/testdata/sf0.001")["edges"]


_KG_DOC = {
    "triples": "Flagship output: scored (subj, pred, obj) triples from "
    "one fused streaming execution (read → assemble → link → score), "
    "driver-verified against the SQL reconstruction of the whole "
    "vote→canon→score chain from the gold parquet.",
    "edges": "Deduplicated KG edge table: distinct (subj, pred, obj) of "
    "the flagship triples with evidence counts (grouped-agg combiner).",
    "linked": "Mention-linked documents (the flagship's shared "
    "intermediate): entities, mentions and QID links per document.",
}


def _kg(table: str) -> Callable[[str], Any]:
    def run(sf_dir: str) -> Any:
        if table == "triples":
            return _flagship_triples(sf_dir)["triples"]
        if table == "linked":
            return _flagship_linked(sf_dir)["linked"]
        return _flagship_graph(sf_dir, with_nodes=(table == "nodes"))[table]

    run.__doc__ = _KG_DOC.get(table)
    return run


def _kg_coref(sf_dir: str) -> Any:
    """T2/O4 coref pair table (alias-prior + scored top-8 paths),
    driver-verifiable: logits are md5-derived, so the DuckDB oracle
    reconstructs the whole loop — candidate top-8, same-start skip,
    symmetric first-insertion-wins rank — from the gold parquet.
    Scores round to 6dp on both compare sides (sigmoid crosses libm)."""
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.pipelines.kg_construct import coref_pairs

    c = _flagship_linked(sf_dir)

    def rnd(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["score"] = round_half_up(b["score"].to_numpy(np.float64), 6)
        return b

    return coref_pairs(c["linked"], c["ctx"]).map_batches(rnd, batch_format="pandas")


_DWIE_CACHE: dict = {}


def _dwie_corpus() -> str:
    """The second reference dataset shape (DWIE profile,
    kg_data_loader.py:12-16 / config.py): fewer, much longer documents
    (>1800 words via every-3rd long convs) with entity counts past the
    100-entity budget (ent_hi=110), so the profile caps actually bind.
    Fixed-size corpus, cached under the corpus root; sf-independent."""
    from kire_ray.sources.synth import SynthConfig, write_corpus

    return write_corpus(
        "/tmp/kire_ray_corpus/dwie",
        SynthConfig(
            n_convs=300, seed=77, ent_hi=110, long_convs_every=3, long_turns=310
        ),
    )


def _q_kg_triples_dwie(sf_dir: str) -> Any:
    """The flagship chain under the DWIE profile (1800-word window cap,
    100-entity budget) over the DWIE-shaped corpus — both reference
    datasets' shapes run end-to-end, driver-verified against the same
    SQL chain with the DWIE entity cap."""
    from kire_ray.config import DWIE
    from kire_ray.pipelines.kg_construct import (
        FLAGSHIP_COLS,
        KGContext,
        extract_triples,
        linked_documents,
        read_transcripts,
    )

    corpus = _dwie_corpus()
    if "triples" not in _DWIE_CACHE:
        ctx = KGContext.from_corpus(corpus)
        linked = linked_documents(
            read_transcripts(corpus, columns=FLAGSHIP_COLS), ctx
        )
        _DWIE_CACHE["triples"] = extract_triples(
            linked, ctx, profile=DWIE
        ).materialize()
    return _DWIE_CACHE["triples"]


def _q_doc_chunk_stitch(sf_dir: str) -> Any:
    """Long-document chunk/stitch (long_seq.py semantics) as a
    driver-verifiable row: windowed position-dependent encoder over
    the assembled word grid, merged with the flagship's own
    chunk_spans/stitch kernels."""
    from kire_ray.pipelines.kg_construct import doc_chunk_stitch

    return doc_chunk_stitch(_corpus(sf_dir))


def _q_kg_nodes(sf_dir: str) -> Any:
    """Node identity + provenance columns of the flagship nodes table
    (driver-verifiable: the vote→canon→NT chain is reconstructed in SQL
    from the gold parquet — see the kg_nodes oracle). The logsumexp
    vector column rides in kg_node_vectors (rows-only; bit-equality vs
    the sequential pool is pytest-verified, test_materialize)."""
    return _flagship_graph(sf_dir, with_nodes=True)["nodes"].select_columns(
        ["qid", "label", "n_docs", "n_mentions"]
    )


def _q_kg_node_vectors(sf_dir: str) -> Any:
    """Full nodes table incl. the pooled entity vectors (M9/T3 output).
    Vectors are logsumexp merges of RNG stand-in token embeddings — not
    SQL-expressible; value-verified by pytest bit-equality instead."""
    return _flagship_graph(sf_dir, with_nodes=True)["nodes"]


def _q_kg_linked_docs(sf_dir: str) -> Any:
    """Per-document linking summary, driver-verifiable: turn / entity /
    mention counts and how many clusters linked to a KG id (non-NT).
    The nested entities/mentions structure itself feeds every
    downstream consumer (scorer/embedder/coref/features) and is
    value-covered by kg_mentions_flat + kg_triples + kg_nodes."""
    c = _flagship_linked(sf_dir)

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_turns": b["turn_texts"].map(len).astype(np.int64),
                "n_entities": b["entities"].map(len).astype(np.int64),
                "n_mentions": b["mentions"].map(len).astype(np.int64),
                "n_linked": b["entities"]
                .map(lambda es: sum(1 for e in es if not e["qid"].startswith("NT")))
                .astype(np.int64),
            }
        )

    return c["linked"].map_batches(summarize, batch_format="pandas")


# --------------------------------------------------------------------
# training-data suite wrappers
# --------------------------------------------------------------------


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return _sread(sf_dir, "documents", ["doc_id", "text"])


def _emb(sf_dir: str) -> "ray.data.Dataset":
    return _sread(sf_dir, "embeddings", ["vec_id", "embedding"])


def _ann_query_matrix(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df.vec_id < N_ANN_QUERIES].sort_values("vec_id")
    return np.stack([np.asarray(v, dtype=np.float64) for v in df.embedding])


def _round_cosine(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    from kire_ray.functions.rounding import round_half_up

    return ds.map_batches(
        lambda b: b.assign(cosine=round_half_up(b.cosine, 6)), batch_format="pandas"
    )


def _q_ann_brute(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import ann_brute_force

    return _round_cosine(
        ann_brute_force(_emb(sf_dir), _ann_query_matrix(sf_dir), k=ANN_K)
    )


def _q_ann_recall(sf_dir: str) -> Any:
    """Retrieval-evaluation harness entry: recall@k of the LSH path vs
    exact brute force on the shared probe set (id membership, so the
    metric is rounding-free until the final division)."""
    from kire_ray.functions.rounding import round_half_up

    b = _q_ann_brute(sf_dir).to_pandas()[["query_id", "vec_id"]]
    l = _q_ann_lsh(sf_dir).to_pandas()[["query_id", "vec_id"]]
    n_hits = len(b.merge(l, on=["query_id", "vec_id"]))
    denom = N_ANN_QUERIES * ANN_K
    return pd.DataFrame(
        {
            "n_hits": [np.int64(n_hits)],
            "recall": round_half_up(np.array([n_hits / denom]), 6),
        }
    )


def _q_ann_lsh(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import ann_lsh

    return _round_cosine(ann_lsh(_emb(sf_dir), _ann_query_matrix(sf_dir), k=ANN_K))


def _q_ann_ivf(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import ann_ivf

    return _round_cosine(ann_ivf(_emb(sf_dir), _ann_query_matrix(sf_dir), k=ANN_K))


def _cread(corpus: str, table: str, columns=None) -> Any:
    """Corpus-side table read at graph-iteration-friendly block sizes
    (the KG edge tables are thousands of rows at test scales; Ray's
    CPU-derived split would hand the iterative algorithms 64 near-empty
    blocks per round)."""
    from kire_ray.sources.parquet import sized_read

    return sized_read(
        f"{corpus}/{table}.parquet", columns, rows_per_block=4096
    )


def _q_kg_kcore(sf_dir: str) -> Any:
    from kire_ray.pipelines.graph_algos import kcore

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return kcore(edges)


def _q_kg_triangles(sf_dir: str) -> Any:
    from kire_ray.pipelines.graph_algos import triangle_count

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return triangle_count(edges)


def _q_kg_clustering_coef(sf_dir: str) -> Any:
    # A/B'd r5: data-sizing the dedup/wedge/close exchange widths from
    # parquet metadata measured NEUTRAL-to-worse (2.55 s baseline vs
    # 2.66 s dedup-only sizing vs 3.74 s all-stage P=4 — the wedge
    # explode is output-dominated and needs the full cluster width), so
    # the default widths stand.
    from kire_ray.pipelines.graph_algos import clustering_coefficients

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return clustering_coefficients(edges)


def _q_kg_edge_lifespan(sf_dir: str) -> Any:
    """Temporal validity per constructed edge: supporting-conversation
    count + earliest/latest supporting conversation start (epoch µs) —
    the temporal-KG table next to kg_edges. Reuses the memoized
    flagship triples; one tagged conv-id exchange joins conversation
    start times, one edge-keyed exchange folds. SQL oracle: the full
    _kg_chain_sql reconstruction joined to grouped transcript minima."""
    from kire_ray.pipelines.kg_construct import read_transcripts
    from kire_ray.pipelines.kg_profile import edge_lifespan

    c = _flagship_triples(sf_dir)
    # conv count ≤ turn count, known from parquet metadata → the
    # caller-side gate for the broadcast conv-start fast path
    import pyarrow.dataset as _pads

    n_turns = _pads.dataset(f"{c['corpus']}/transcripts.parquet").count_rows()
    return edge_lifespan(
        c["triples"],
        read_transcripts(c["corpus"]),
        broadcast_limit=1_000_000 if n_turns <= 20_000_000 else 0,
    )


def _q_kg_meta_paths(sf_dir: str) -> Any:
    """PRA-style 2-hop meta-path mining over the corpus KG
    (pipelines/kg_profile.py meta_paths): per relation composition
    (r1, r2) — path instances, distinct endpoint pairs, and the
    directly-linked (closed) share that ranks compositions as
    link-prediction features. Corpus-side oracle: edge self-join."""
    from kire_ray.pipelines.kg_profile import meta_paths

    corpus = _corpus(sf_dir)
    return meta_paths(_cread(corpus, "kg_triples", ["h_qid", "prop", "t_qid"]))


def _q_kg_pred_stats(sf_dir: str) -> Any:
    """PARIS-style per-predicate functionality / inverse functionality
    profile of the corpus KG (pipelines/kg_profile.py) — the statistic
    entity-alignment and canonicalization weight evidence by.
    Corpus-side oracle: plain grouped COUNT DISTINCT."""
    from kire_ray.pipelines.kg_profile import pred_stats

    corpus = _corpus(sf_dir)
    return pred_stats(_cread(corpus, "kg_triples", ["h_qid", "prop", "t_qid"]))


def _q_kg_reachability(sf_dir: str) -> Any:
    """Bounded-depth (≤4) multi-source transitive closure with
    shortest-distance semantics over the P1 sub-relation — semi-naive
    delta iteration, one tagged exchange per round
    (pipelines/kg_profile.py). Corpus-side oracle: unrolled
    Bellman-Ford rounds with a min-dist fold."""
    from kire_ray.pipelines.kg_profile import reachability

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "prop", "t_qid"]).filter(
        expr="prop == 'P1'"
    )
    return reachability(edges, max_depth=4)


def _q_kg_hyperball(sf_dir: str) -> Any:
    """HyperBall/ANF out-neighborhood function per node, radii 0–3:
    per-node HLL register vectors iterated by register-max over
    out-edges (pipelines/kg_profile.py; md5 register scheme shared with
    hll_distinct). Corpus-side oracle: the SQL unrolls the register
    max-joins and replays the estimate arithmetic bit-exactly."""
    from kire_ray.pipelines.kg_profile import hyperball

    corpus = _corpus(sf_dir)
    return hyperball(_cread(corpus, "kg_triples", ["h_qid", "t_qid"]), radii=3)


def _q_kg_communities(sf_dir: str) -> Any:
    """Deterministic synchronous LPA over the corpus KG (5 rounds);
    corpus-side oracle unrolls the identical rounds in SQL."""
    from kire_ray.pipelines.graph_algos import lpa_communities

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return lpa_communities(edges)


def _q_kg_schema_profile(sf_dir: str) -> Any:
    """Relation type signatures over the corpus KG: per (pred,
    head-type, tail-type) triple counts, types = lexicographically
    smallest 'instance of' attr. Corpus-side oracle: two attr joins."""
    from kire_ray.pipelines.kg_profile import schema_profile

    corpus = _corpus(sf_dir)
    return schema_profile(
        _cread(corpus, "kg_triples", ["h_qid", "prop", "t_qid"]),
        _cread(corpus, "kg_attrs", ["qid", "attr_key", "attr_val"]),
    )


def _q_scd2_history(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import scd2_history

    return scd2_history(sf_dir)


def _q_late_events(sf_dir: str) -> Any:
    """Watermark late-arrival audit via a distributed prefix-max over
    the md5-derived arrival order."""
    from kire_ray.pipelines.temporal import late_events

    return late_events(sf_dir)


def _q_window_dedup(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import window_dedup

    return window_dedup(sf_dir)


def _q_source_js(sf_dir: str) -> Any:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions."""
    from kire_ray.pipelines.text_analysis import source_js_divergence

    return source_js_divergence(_sread(sf_dir, "documents", ["source", "text"]))


def _q_l_diversity(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import l_diversity

    return l_diversity(sf_dir)


def _q_theilsen_trend(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import theilsen_trend

    return theilsen_trend(sf_dir)


def _q_changepoint_cusum(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import changepoint_cusum

    return changepoint_cusum(sf_dir)


def _q_dp_histogram(sf_dir: str) -> Any:
    """Seeded-Laplace DP histogram release (reproducible md5 uniforms;
    production swaps in a CSPRNG draw)."""
    from kire_ray.pipelines.sketches import dp_histogram

    return dp_histogram(sf_dir)


def _q_train_label_pick(sf_dir: str) -> Any:
    """O9 — deterministic multi-label relation pick (the trainer's
    rt = randint(len(labels)) re-expressed as md5(doc|h|t)[:2] % n over
    the r-sorted label list; GLRE+KIRE/data/dataset.py:85-86)."""
    from kire_ray.pipelines.sampling import train_label_pick
    from kire_ray.sources.parquet import sized_read

    gold = sized_read(f"{_corpus(sf_dir)}/gold_labels.parquet")
    return train_label_pick(gold)


def _q_fk_integrity(sf_dir: str) -> Any:
    """Referential-integrity audit: one shared tagged exchange for all
    declared FK relations."""
    from kire_ray.pipelines.relational import fk_integrity

    return fk_integrity(sf_dir)


def _q_docsim_cosine(sf_dir: str) -> Any:
    """TF-IDF cosine doc-similarity self-join over word-trigram terms
    (df-gated posting lists, one term exchange, joined norms)."""
    from kire_ray.pipelines.similarity import docsim_cosine

    return docsim_cosine(_docs(sf_dir))


def _q_knn_classify(sf_dir: str) -> Any:
    """Leave-one-out k-NN label audit over exact int8-code dots."""
    from kire_ray.pipelines.similarity import knn_classify

    return knn_classify(
        _sread(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    )


def _q_sorted_neighborhood(sf_dir: str) -> Any:
    """Sorted-neighborhood ER blocking scored with Jaro-Winkler:
    ordered range partition with a boundary halo, exact global ranks
    without a global sort."""
    from kire_ray.pipelines.dedup import sorted_neighborhood_jw

    return sorted_neighborhood_jw(_sread(sf_dir, "customer", ["c_name"]))


def _q_kg_components(sf_dir: str) -> Any:
    """Weakly-connected components of the corpus KG via the engine's
    distributed min-label propagation (the dup_clusters machinery on
    graph edges); corpus-side oracle: recursive-CTE closure."""
    from kire_ray.stages.canonicalize import connected_components

    import pyarrow.dataset as _pads

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"]).map_batches(
        lambda b: pd.DataFrame({"src": b["h_qid"], "dst": b["t_qid"]}),
        batch_format="pandas",
    )
    # row-preserving map → edge count IS the parquet metadata count;
    # the hint skips connected_components' materialize-and-count
    return connected_components(
        edges, nrows=_pads.dataset(f"{corpus}/kg_triples.parquet").count_rows()
    )


def _q_events_window_quantiles(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import events_window_quantiles

    return events_window_quantiles(sf_dir)


def _q_user_rfm(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import user_rfm

    return user_rfm(sf_dir)


def _q_events_dow_chisq(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import events_dow_chisq

    return events_dow_chisq(sf_dir)


def _q_kg_ppr(sf_dir: str) -> Any:
    """Personalized PageRank from the 4 md5-smallest seed nodes over
    the corpus KG; corpus-side oracle unrolls the seeded power
    iteration (the pagerank pattern with teleport restricted to the
    seed set)."""
    from kire_ray.pipelines.graph_algos import ppr

    corpus = _corpus(sf_dir)
    return ppr(_cread(corpus, "kg_triples", ["h_qid", "t_qid"]))


def _q_kg_degree_distribution(sf_dir: str) -> Any:
    """In/out degree histogram over DISTINCT corpus-KG edges —
    corpus-side oracle: grouped counts over the gold kg_triples."""
    from kire_ray.pipelines.graph_algos import degree_distribution

    corpus = _corpus(sf_dir)
    return degree_distribution(_cread(corpus, "kg_triples", ["h_qid", "t_qid"]))


def _q_kg_betweenness(sf_dir: str) -> Any:
    """Sampled-pivot Brandes betweenness over the corpus KG (8
    md5-deterministic pivots). Float accumulation order crosses
    partitions → rows-only at the driver; the pytest oracle replays
    sequential Brandes on the same pivots at 6dp."""
    from kire_ray.pipelines.graph_algos import betweenness

    corpus = _corpus(sf_dir)
    return betweenness(_cread(corpus, "kg_triples", ["h_qid", "t_qid"]))


def _q_kg_pagerank(sf_dir: str) -> Any:
    """PageRank over the corpus KG triple table (h→t multi-edges, 10
    damped power iterations, no dangling redistribution — see
    pipelines/graph_algos.py). Corpus-side oracle: the SQL unrolls the
    same 10 iterations over the gold kg_triples parquet."""
    from kire_ray.pipelines.graph_algos import pagerank

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return pagerank(edges)


def _q_kg_hits(sf_dir: str) -> Any:
    """HITS hubs & authorities over the corpus KG triple table (5
    L1-normalized iterations — see pipelines/graph_algos.py).
    Corpus-side oracle: the SQL unrolls the same 5 iterations over the
    gold kg_triples parquet (_hits_sql)."""
    from kire_ray.pipelines.graph_algos import hits

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return hits(edges)


def _q_kg_negative_samples(sf_dir: str) -> Any:
    """TransE-protocol corrupted-tail negatives over the corpus KG
    triples (md5-derived candidate index, accidental positives dropped
    by one tagged exchange). Corpus-side oracle: md5 index + NOT
    EXISTS reconstruction over the gold kg_triples parquet."""
    from kire_ray.pipelines.graph_algos import negative_samples

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "prop", "t_qid"])
    return negative_samples(edges)


def _q_kg_link_eval(sf_dir: str) -> Any:
    """Filtered link-prediction ranks (Bordes et al. 2013 tail
    protocol) over the corpus KG triples under the md5 score basis —
    one (h, r) exchange + node-bounded broadcast, see
    pipelines/graph_algos.link_eval. Corpus-side oracle: the SQL
    rebuilds candidate scores as raw 52-bit md5 integers and counts
    strictly-greater unfiltered candidates per triple."""
    from kire_ray.pipelines.graph_algos import link_eval

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "prop", "t_qid"])
    return link_eval(edges)


def _q_kg_link_eval_summary(sf_dir: str) -> Any:
    """One-row MRR / Hits@{1,3,10} / mean-rank summary of
    kg_link_eval; every aggregate integer (MRR via floor(1e12/rank)
    partial sums) so the row is bit-exact in SQL."""
    from kire_ray.pipelines.graph_algos import link_eval_summary

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "prop", "t_qid"])
    return link_eval_summary(edges)


def _q_kg_random_walks(sf_dir: str) -> Any:
    """Deterministic DeepWalk corpus over the gold triples (md5-chosen
    neighbor per step, one tagged exchange per step — see
    pipelines/graph_algos.random_walks). Corpus-side oracle:
    _walks_sql unrolls the per-step adjacency joins."""
    from kire_ray.pipelines.graph_algos import random_walks

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return random_walks(edges)


def _q_winsorize(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import winsorize

    ev = _sread(sf_dir, "events", ["event_id", "event_type", "value"])
    return winsorize(ev, "value", group_col="event_type", id_col="event_id")


def _q_hist_quantiles(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import hist_quantiles

    ev = _sread(sf_dir, "events", ["event_type", "value"])
    return hist_quantiles(ev, "value", group_col="event_type")


def _q_bloom_filter_join(sf_dir: str) -> Any:
    """Bloom-filtered semi-join lineitem⋈orders(high-value): the 8 KiB
    filter is broadcast instead of the build key set; the query reports
    the row accounting (probe rows, bloom-passed, true matches, false
    positives) so the over-approximation is visible and SQL-checkable
    (md5 bit positions reproduce membership exactly). True-match
    accounting routes through ``mark_membership``'s size-thresholded
    switch — the build key set scales with SF, so the old
    ``ray.put(frozenset(...))`` of it was the eval-gold antipattern
    (VERDICT r4 #1) in one more spot."""
    from kire_ray.stages.joins import bloom_semi_join, build_bloom, mark_membership

    orders = _sread(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    build = orders.map_batches(
        lambda b: b.loc[b.o_totalprice > 450000, ["o_orderkey"]],
        batch_format="pandas",
    ).materialize()  # consumed by the bloom build AND the membership mark
    bloom = build_bloom(build, "o_orderkey")

    li = _sread(sf_dir, "lineitem", ["l_orderkey"])
    n_probe = li.count()
    passed = mark_membership(
        bloom_semi_join(li, bloom, "l_orderkey"),
        build.map_batches(
            lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
            batch_format="pandas",
        ),
        ["l_orderkey"],
        "is_true",
        keys_nrows=build.count(),  # metadata on the materialized build
        keys_distinct=True,  # o_orderkey is the orders PK
    )

    def part_stats(b: pd.DataFrame) -> pd.DataFrame:
        t = int(b["is_true"].sum())
        return pd.DataFrame({"n_pass": [len(b)], "n_true": [t]})

    agg = passed.map_batches(part_stats, batch_format="pandas").to_pandas().sum()
    n_pass, n_true = int(agg["n_pass"]), int(agg["n_true"])
    return pd.DataFrame(
        {
            "n_probe": [n_probe],
            "n_pass": [n_pass],
            "n_true": [n_true],
            "n_false_pos": [n_pass - n_true],
        }
    ).astype(np.int64)


def _q_kmv_set_ops(sf_dir: str) -> Any:
    """KMV/Theta sketch set algebra over (user, day) activity keys of
    the purchase vs click slices."""
    from kire_ray.pipelines.sketches import kmv_set_ops

    ev = _sread(sf_dir, "events", ["user_id", "ts", "event_type"])

    def add_day(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"],
                "day": b["ts"].to_numpy("datetime64[us]").astype(np.int64)
                // 86400_000_000,
                "event_type": b["event_type"],
            }
        )

    return kmv_set_ops(
        ev.map_batches(add_day, batch_format="pandas"),
        key_cols=("user_id", "day"),
    )


def _q_join_size_estimate(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import join_size_estimate

    orders = _sread(sf_dir, "orders", ["o_custkey"])
    cust = _sread(sf_dir, "customer", ["c_custkey"])
    return join_size_estimate(orders, cust, left_key="o_custkey", right_key="c_custkey")


def _q_cms_heavy_hitters(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import cms_heavy_hitters

    return cms_heavy_hitters(_docs(sf_dir), k=20)


PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def _q_table_profile(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import table_profile

    orders = _sread(sf_dir, "orders", PROFILE_COLS)
    return table_profile(orders, PROFILE_COLS)


def _q_hll_distinct_users(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import hll_distinct

    ev = _sread(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct(ev, "user_id", group_col="event_type")


def _q_tdigest_quantiles(sf_dir: str) -> Any:
    """t-digest quantile sketch over events.value (Dunning & Ertl
    2019) — the mergeable-quantile sketch next to HLL/CMS/KMV.
    Float-iterative estimate (rows-only at the driver, like
    ann_ivf/kmeans); pytest bounds its rank error vs the exact
    quantiles (test_tdigest)."""
    from kire_ray.pipelines.sketches import tdigest_quantiles

    ev = _sread(sf_dir, "events", ["value"])
    return tdigest_quantiles(ev, "value")


def _q_frequent_itemsets(sf_dir: str) -> Any:
    """Apriori 2-itemset association rules over lineitem baskets:
    support / confidence / lift per co-ordered part pair (min pair
    count 2). One basket exchange + tagged-count shuffle + two hash
    joins — see pipelines/relational.frequent_itemsets."""
    from kire_ray.pipelines.relational import frequent_itemsets

    return frequent_itemsets(sf_dir)


def _q_pareto_frontier(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import pareto_frontier

    return pareto_frontier(sf_dir)


def _q_user_retention_cohorts(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import user_retention_cohorts

    return user_retention_cohorts(sf_dir)


def _q_events_cume_dist(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_cume_dist

    return events_cume_dist(sf_dir)


def _q_tool_usage_stats(sf_dir: str) -> Any:
    from kire_ray.pipelines.transcripts import tool_usage_stats

    return tool_usage_stats(_corpus(sf_dir))


def _q_conv_flows(sf_dir: str) -> Any:
    """Conversation-flow template mining over the transcript corpus."""
    from kire_ray.pipelines.transcripts import conv_flows

    return conv_flows(_corpus(sf_dir))


def _q_role_transitions(sf_dir: str) -> Any:
    from kire_ray.pipelines.transcripts import role_transitions

    return role_transitions(_corpus(sf_dir))


def _q_conv_segments(sf_dir: str) -> Any:
    from kire_ray.pipelines.transcripts import conv_segments

    return conv_segments(_corpus(sf_dir))


def _q_conv_stats(sf_dir: str) -> Any:
    from kire_ray.pipelines.transcripts import conv_stats

    return conv_stats(_corpus(sf_dir))


def _q_turn_latency(sf_dir: str) -> Any:
    from kire_ray.pipelines.transcripts import turn_latency

    return turn_latency(_corpus(sf_dir))


def _q_tool_chains(sf_dir: str) -> Any:
    from kire_ray.pipelines.transcripts import tool_chains

    return tool_chains(_corpus(sf_dir))


def _q_preference_pairs(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import preference_pairs

    return preference_pairs(
        _sread(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    )


def _q_embedding_codes(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import embedding_codes

    return embedding_codes(_sread(sf_dir, "embeddings", ["vec_id", "embedding"]))


def _q_containment_dedup(sf_dir: str) -> Any:
    from kire_ray.pipelines.dedup import containment_dedup

    return containment_dedup(_docs(sf_dir))


def _q_kg_bfs_levels(sf_dir: str) -> Any:
    """Single-source BFS (undirected, seed = min qid) over the corpus
    KG triple table; corpus-side oracle unrolls the frontier expansion
    as a CTE chain."""
    from kire_ray.pipelines.graph_algos import bfs_levels

    corpus = _corpus(sf_dir)
    edges = _cread(corpus, "kg_triples", ["h_qid", "t_qid"])
    return bfs_levels(edges, max_levels=8)


def _q_events_value_ranks(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_value_ranks

    return events_value_ranks(sf_dir)


def _q_sessionize(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import sessionize

    return sessionize(sf_dir)


def _q_asof_join(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import asof_join_latest_order

    return asof_join_latest_order(sf_dir)


def _q_event_pairs_within(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import event_pairs_within

    return event_pairs_within(sf_dir)


_COMENTION_CACHE: dict[str, Any] = {}


def _comention_cached(sf_dir: str) -> Any:
    """Memoized materialized co-mention graph (kg_comention and
    kg_link_prediction share it — same cache-the-shared-prefix fix as
    the flagship and the ngram-dedup DAG)."""
    from kire_ray.pipelines.kg_construct import comention_edges

    c = _COMENTION_CACHE.get(sf_dir)
    if c is None:
        lc = _flagship_linked(sf_dir)
        c = comention_edges(lc["linked"]).materialize()
        _COMENTION_CACHE[sf_dir] = c
    return c


def _q_kg_comention(sf_dir: str) -> Any:
    """Surface co-mention graph off the cached linked docs; the mention
    scan is span-exact vs planted gold (see kg_mentions_flat), so the
    oracle is a gold_mentions self-join (corpus-side, sf0.01-bound)."""
    return _comention_cached(sf_dir)


def _q_kg_link_prediction(sf_dir: str) -> Any:
    """Common-neighbor / Jaccard / Adamic-Adar candidate scores over
    the surface co-mention graph (non-adjacent pairs, cn ≥ 2); mention
    scan is span-exact vs gold, so the oracle reconstructs the same
    scores from a gold_mentions self-join (corpus-side, sf0.01)."""
    from kire_ray.pipelines.graph_algos import link_prediction

    return link_prediction(
        _comention_cached(sf_dir), support_col="n", min_support=2
    )


def _q_jsonl_roundtrip(sf_dir: str) -> Any:
    """Distributed READ of the gzipped JSONL export (the import side of
    the sink): shards → ray.data.read_json → per-doc projection; the
    oracle is the original documents table, so the round trip is
    value-exact end to end."""
    import hashlib as _h

    from kire_ray.state.jsonl import export_jsonl_shards

    docs = _sread(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = f"/tmp/kire_ray_jsonl/{_h.md5(sf_dir.encode()).hexdigest()[:12]}"
    export_jsonl_shards(docs, out, n_shards=64)  # cached: byte-deterministic
    back = ray.data.read_json(out, arrow_open_stream_args={"compression": "gzip"})

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64),
                "lang": b["lang"],
                "n_chars": b["text"].str.len().astype(np.int64),
            }
        )

    return back.map_batches(project, batch_format="pandas")


def _q_csv_roundtrip(sf_dir: str) -> Any:
    """CSV interop surface: documents → sharded CSV under /tmp →
    distributed read_csv back; oracle = the source table, so write AND
    read are value-exact end to end. Text stays out of the CSV (the
    synthetic corpus is single-line but CSV quoting of free text is
    not part of the declared surface — id/lang/n_chars are)."""
    import hashlib as _h
    import os as _os
    import shutil as _sh

    docs = _sread(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = f"/tmp/kire_ray_csv/{_h.md5(sf_dir.encode()).hexdigest()[:12]}"
    if _os.path.isdir(out):
        _sh.rmtree(out)  # Ray uuid-names shards; stale files double-count
    docs.repartition(16).write_csv(out)
    return ray.data.read_csv(out)


def _q_orc_roundtrip(sf_dir: str) -> Any:
    """ORC interop surface (Ray 2.49 has no native ORC I/O; the engine
    supplies the sharded sink + file-per-task source —
    sources/orc.py): documents → content-named .orc shards under /tmp
    → distributed column-pruned read back; oracle = the source table,
    so write AND read are value-exact end to end."""
    import hashlib as _h
    import os as _os
    import shutil as _sh

    from kire_ray.sources.orc import read_orc, write_orc_sharded

    docs = _sread(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = f"/tmp/kire_ray_orc/{_h.md5(sf_dir.encode()).hexdigest()[:12]}"
    if _os.path.isdir(out):
        _sh.rmtree(out)  # content-named shards; a stale sf would linger
    write_orc_sharded(docs.repartition(16), out)
    return read_orc(out, columns=["doc_id", "lang", "n_chars"])


def _q_feather_roundtrip(sf_dir: str) -> Any:
    """Feather V2 / Arrow IPC interop surface (Ray 2.49 has no native
    feather I/O; the engine supplies the sharded sink + file-per-task
    source — sources/feather.py): documents → content-named
    uncompressed .feather shards under /tmp → distributed
    column-pruned read back; oracle = the source table, so write AND
    read are value-exact end to end."""
    import hashlib as _h
    import os as _os
    import shutil as _sh

    from kire_ray.sources.feather import read_feather, write_feather_sharded

    docs = _sread(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = f"/tmp/kire_ray_feather/{_h.md5(sf_dir.encode()).hexdigest()[:12]}"
    if _os.path.isdir(out):
        _sh.rmtree(out)  # content-named shards; a stale sf would linger
    write_feather_sharded(docs.repartition(16), out)
    return read_feather(out, columns=["doc_id", "lang", "n_chars"])


def _q_parquet_hive_export(sf_dir: str) -> Any:
    """documents → hive-partitioned parquet by (lang, source) under
    /tmp; the returned counts are computed by READING THE FILES BACK,
    so the green oracle row verifies the sink round-trip."""
    import hashlib as _h

    from kire_ray.state.parquet_sink import hive_export

    docs = _sread(sf_dir, "documents")
    out = f"/tmp/kire_ray_hive/{_h.md5(sf_dir.encode()).hexdigest()[:12]}"
    return hive_export(docs, out, ["lang", "source"])


def _q_jsonl_export(sf_dir: str) -> Any:
    """Exports the documents table as content-addressed gzipped JSONL
    shards under /tmp, returns the (shard, n_rows) manifest — the
    counts are the SQL-checkable face of the sink (byte-determinism
    and round-trip are asserted in tests/test_jsonl_sink.py)."""
    import hashlib as _h

    from kire_ray.state.jsonl import export_jsonl_shards

    docs = _sread(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = f"/tmp/kire_ray_jsonl/{_h.md5(sf_dir.encode()).hexdigest()[:12]}"
    m = export_jsonl_shards(docs, out, n_shards=64)
    return m[["shard", "n_rows"]]


def _q_skipgram_pairs(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import skipgram_pairs

    return skipgram_pairs(_docs(sf_dir))


def _q_knn_graph(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import knn_graph_mutual

    return knn_graph_mutual(_emb(sf_dir), k=5)


def _q_per_source_cap(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import per_source_cap

    docs = _sread(sf_dir, "documents", ["doc_id", "source"])
    return per_source_cap(docs)


def _q_latest_by_key(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import latest_by_key

    return latest_by_key(sf_dir)


def _q_user_event_sequences(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import user_event_sequences

    return user_event_sequences(sf_dir)


def _q_event_transitions(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import event_transitions

    return event_transitions(sf_dir)


def _q_next_event_labels(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import next_event_labels

    return next_event_labels(sf_dir)


def _q_daily_retention(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import daily_retention

    return daily_retention(sf_dir)


_HLL_WINDOW_S = 86_400


def _q_hll_window_users(sf_dir: str) -> Any:
    """Per-tumbling-window distinct users via the mergeable HLL sketch
    — sketches compose with event-time windows because registers merge
    by max, so late/out-of-order blocks need no re-read."""
    from kire_ray.pipelines.sketches import hll_distinct

    ev = _sread(sf_dir, "events", ["ts", "user_id"])

    def win(b: "pd.DataFrame") -> "pd.DataFrame":
        epoch = b["ts"].astype("int64") // 10**6
        return pd.DataFrame(
            {
                "window_start": (epoch // _HLL_WINDOW_S) * _HLL_WINDOW_S,
                "user_id": b["user_id"],
            }
        )

    return hll_distinct(
        ev.map_batches(win, batch_format="pandas"),
        "user_id",
        group_col="window_start",
    )


def _powerit_oracle_sql(iters: int = 5, dims: int = 64) -> str:
    """Unrolled-CTE mirror of ``similarity.embedding_top_component``:
    v{i} = normalize(Mᵀ(M v{i-1})), uniform init, sign fixed at the
    largest-|loading| dimension."""
    from kire_ray.functions.rounding import sql_round

    parts = [
        f"""
            WITH e AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                FROM embeddings),
            d AS MATERIALIZED (
                SELECT unnest(generate_series(1, {dims})) AS dim),
            v0 AS MATERIALIZED (
                SELECT dim, 1.0 / sqrt({dims}) AS val FROM d)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
            s{i} AS MATERIALIZED (
                SELECT e.vec_id, sum(e.ev[v.dim] * v.val) AS s
                FROM e, v{i - 1} v GROUP BY e.vec_id),
            w{i} AS MATERIALIZED (
                SELECT d.dim, sum(e.ev[d.dim] * s.s) AS w
                FROM e JOIN s{i} s USING (vec_id) CROSS JOIN d
                GROUP BY d.dim),
            v{i} AS MATERIALIZED (
                SELECT dim,
                       w / sqrt((SELECT sum(w * w) FROM w{i})) AS val
                FROM w{i})"""
        )
    return (
        "".join(parts)
        + f""",
            sgn AS (
                SELECT CASE WHEN val < 0 THEN -1.0 ELSE 1.0 END AS s
                FROM v{iters} ORDER BY abs(val) DESC, dim LIMIT 1)
            SELECT v.dim,
                   {sql_round('(SELECT s FROM sgn) * v.val', 6)} AS loading
            FROM v{iters} v"""
    )


def _lpa_oracle_sql(corpus: str, rounds: int = 5) -> str:
    """Unrolled-CTE mirror of ``graph_algos.lpa_communities``: l{i} =
    per-node argmax (count desc, label asc) over neighbour labels of
    l{i-1}, synchronous, fixed rounds."""
    parts = [
        f"""
            WITH raw AS MATERIALIZED (
                SELECT h_qid AS s, t_qid AS t
                FROM read_parquet('{corpus}/kg_triples.parquet')),
            und AS MATERIALIZED (
                SELECT DISTINCT a, b FROM (
                    SELECT s AS a, t AS b FROM raw WHERE s <> t
                    UNION ALL
                    SELECT t, s FROM raw WHERE s <> t)),
            l0 AS MATERIALIZED (
                SELECT DISTINCT a AS node, a AS label FROM und)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
            l{i} AS MATERIALIZED (
                SELECT node, label FROM (
                    SELECT u.a AS node, l.label,
                           row_number() OVER (
                               PARTITION BY u.a
                               ORDER BY count(*) DESC, l.label) AS rk
                    FROM und u JOIN l{i - 1} l ON l.node = u.b
                    GROUP BY u.a, l.label)
                WHERE rk = 1)"""
        )
    return (
        "".join(parts)
        + f"\n            SELECT node AS qid, label AS community FROM l{rounds}"
    )


def _bfs_oracle_sql(corpus: str, levels: int = 8) -> str:
    """Unrolled-CTE BFS mirror of ``graph_algos.bfs_levels``: l{i} =
    distinct neighbors of l{i-1} not in any earlier level."""
    parts = [
        f"""
            WITH raw AS MATERIALIZED (
                SELECT h_qid AS s, t_qid AS t
                FROM read_parquet('{corpus}/kg_triples.parquet')),
            e AS MATERIALIZED (
                SELECT DISTINCT s, t FROM (
                    SELECT s, t FROM raw WHERE s <> t
                    UNION ALL
                    SELECT t, s FROM raw WHERE s <> t)),
            l0 AS MATERIALIZED (SELECT min(s) AS q, 0 AS level FROM e)"""
    ]
    for i in range(1, levels + 1):
        seen = " UNION ALL ".join(f"SELECT q FROM l{j}" for j in range(i))
        parts.append(
            f""",
            v{i} AS MATERIALIZED (SELECT DISTINCT q FROM ({seen})),
            l{i} AS MATERIALIZED (
                SELECT DISTINCT e.t AS q, {i} AS level
                FROM e JOIN l{i - 1} f ON e.s = f.q
                WHERE e.t NOT IN (SELECT q FROM v{i}))"""
        )
    union = "\n            UNION ALL ".join(
        f"SELECT q AS qid, CAST(level AS BIGINT) AS level FROM l{i}"
        for i in range(levels + 1)
    )
    return "".join(parts) + "\n            " + union


def _q_span_dedup_corpus(sf_dir: str) -> Any:
    from kire_ray.pipelines.dedup import span_dedup_corpus

    return span_dedup_corpus(_docs(sf_dir))


def _q_incremental_dedup(sf_dir: str) -> Any:
    """Even doc_ids stand in for the already-ingested history, odd ones
    for the incoming shard."""
    from kire_ray.pipelines.dedup import incremental_dedup

    docs = _docs(sf_dir)
    prior = docs.map_batches(
        lambda b: b[b["doc_id"] % 2 == 0], batch_format="pandas"
    )
    new = docs.map_batches(
        lambda b: b[b["doc_id"] % 2 == 1], batch_format="pandas"
    )
    return incremental_dedup(prior, new)


def _q_embedding_top_component(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import embedding_top_component

    return embedding_top_component(
        _sread(sf_dir, "embeddings", ["embedding"])
    )


def _q_embedding_quantize(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import embedding_quantize_scales

    emb = _sread(sf_dir, "embeddings", ["embedding"])
    return embedding_quantize_scales(emb)


def _q_top_words_per_lang(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import top_words_per_lang

    docs = _sread(sf_dir, "documents", ["text", "lang"])
    return top_words_per_lang(docs, k=10)


def _q_events_zscore(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_zscore

    return events_zscore(sf_dir)


def _q_events_regression(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_regression

    return events_regression(sf_dir)


def _q_events_ab_test(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_ab_test

    return events_ab_test(sf_dir)


def _q_embedding_gram(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import embedding_gram

    return embedding_gram(_emb(sf_dir))


def _q_events_quantile_cont(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_quantile_cont

    return events_quantile_cont(sf_dir)


def _q_user_decay_scores(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import user_decay_scores

    return user_decay_scores(sf_dir)


def _q_bigram_logprob(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import bigram_logprob

    return bigram_logprob(_docs(sf_dir))


def _q_events_anomalies(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_anomalies

    return events_anomalies(sf_dir)


def _q_nb_source_classifier(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import nb_source_classifier

    docs = _sread(sf_dir, "documents", ["doc_id", "text", "source"])
    return nb_source_classifier(docs)


def _q_source_distinctive_terms(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import source_distinctive_terms

    docs = _sread(sf_dir, "documents", ["doc_id", "text", "source"])
    return source_distinctive_terms(docs)


def _q_purchase_attribution(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import purchase_attribution

    return purchase_attribution(sf_dir)


def _q_markov_steady_state(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import markov_steady_state

    return markov_steady_state(sf_dir)


def _q_events_wow_change(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_wow_change

    return events_wow_change(sf_dir)


def _q_snapshot_diff(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import snapshot_diff

    return snapshot_diff(sf_dir)


def _q_users_every_day(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import users_every_day

    return users_every_day(sf_dir)


def _q_events_mad(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import events_mad

    return events_mad(sf_dir)


def _q_event_hour_pmi(sf_dir: str) -> Any:
    from kire_ray.pipelines.relational import event_hour_pmi

    return event_hour_pmi(sf_dir)


def _q_running_totals(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import running_totals

    return running_totals(sf_dir)


def _q_events_rolling_mean(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import events_rolling_mean

    return events_rolling_mean(sf_dir)


def _q_events_anomaly_zscore(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import events_anomaly_zscore

    return events_anomaly_zscore(sf_dir)


def _q_hopping_window_counts(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import hopping_window_counts

    return hopping_window_counts(sf_dir)


def _q_repetition_top_ngrams(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import top_ngram_fracs

    return top_ngram_fracs(sf_dir)


def _q_ccnet_buckets(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import ccnet_buckets

    return ccnet_buckets(sf_dir)


def _q_dsir_weights(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import dsir_weights

    return dsir_weights(sf_dir)


def _q_kmeans_clusters(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import kmeans_clusters

    return kmeans_clusters(sf_dir)


def _q_semdedup(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import semdedup

    return semdedup(sf_dir)


def _q_events_ntile(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import events_ntile

    return events_ntile(sf_dir)


def _q_weighted_sample(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import weighted_sample

    docs = _sread(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample(docs, cap=2000.0)


def _q_inverted_index(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import inverted_index

    return inverted_index(_docs(sf_dir), min_df=2)


def _q_label_centroids(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import label_centroids

    emb = _sread(sf_dir, "embeddings", ["embedding", "label"])
    return label_centroids(emb)


def _q_lang_id(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import lang_id_trigrams

    docs = _sread(sf_dir, "documents", ["doc_id", "text", "lang"])
    return lang_id_trigrams(docs, profile_size=200)


def _q_lang_confusion(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import lang_confusion

    return lang_confusion(_sread(sf_dir, "documents", ["doc_id", "text", "lang"]))


def _q_pmi_bigrams(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import pmi_bigrams

    return pmi_bigrams(_docs(sf_dir), min_count=5, k=20)


def _q_bm25_search(sf_dir: str) -> Any:
    from kire_ray.pipelines.similarity import bm25_search

    return bm25_search(_docs(sf_dir), BM25_QUERIES, k=BM25_K)


def _q_exact_dedup(sf_dir: str) -> Any:
    from kire_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_ngram_novelty(sf_dir: str) -> Any:
    """n-gram-level corpus freshness of the incoming shard vs history
    (even doc_ids = history, odd = incoming — the incremental_dedup
    split)."""
    from kire_ray.pipelines.dedup import ngram_novelty

    docs = _docs(sf_dir)
    prior = docs.map_batches(
        lambda b: b[b["doc_id"] % 2 == 0], batch_format="pandas"
    )
    new = docs.map_batches(
        lambda b: b[b["doc_id"] % 2 == 1], batch_format="pandas"
    )
    return ngram_novelty(prior, new)


def _q_pq_codes(sf_dir: str) -> Any:
    """Product-quantization codes + reconstruction error over the
    embedding table (Jégou et al. 2011). Float-iterative Lloyd per
    subspace → rows-only at the driver; sequential numpy oracle in
    tests/test_kmeans.py."""
    from kire_ray.pipelines.similarity import pq_codes

    return pq_codes(sf_dir)


def _q_bow_dedup(sf_dir: str) -> Any:
    from kire_ray.pipelines.dedup import bow_dedup

    return bow_dedup(_docs(sf_dir))


def _q_k_anonymity(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import k_anonymity

    return k_anonymity(_sread(sf_dir, "documents", ["lang", "source", "n_chars"]))


def _q_events_autocorr(sf_dir: str) -> Any:
    from kire_ray.pipelines.temporal import events_autocorr

    return events_autocorr(sf_dir)


def _q_zipf_fit(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import zipf_fit

    return zipf_fit(_docs(sf_dir))


def _q_weighted_reservoir(sf_dir: str) -> Any:
    """Efraimidis–Spirakis weighted k-sample without replacement
    (Exp(w) keys from md5 uniforms, associative bottom-k)."""
    from kire_ray.pipelines.sampling import weighted_reservoir

    return weighted_reservoir(
        _sread(sf_dir, "documents", ["doc_id", "source", "n_chars"]), 50
    )


def _q_column_mi(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import column_mi

    return column_mi(sf_dir)


def _q_key_skew_profile(sf_dir: str) -> Any:
    from kire_ray.pipelines.sketches import key_skew_profile

    return key_skew_profile(sf_dir)


def _q_minhash(sf_dir: str) -> Any:
    """MinHash+LSH near-dup (64 perms, 16 bands, word-3-gram shingles,
    exact Jaccard verify at 0.8). Carries an exact DuckDB oracle: the
    verify stage computes true Jaccard over distinct word 3-grams, and
    the fixed-seed banding surfaces every true pair at driver scale
    (measured recall 1.0 at sf0.01; deterministic, so the oracle's
    all-pairs Jaccard reproduces the output value-for-value)."""
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.pipelines.dedup import minhash_dedup

    def rounded(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["jaccard"] = round_half_up(b["jaccard"], 6)
        return b

    return minhash_dedup(_docs(sf_dir)).map_batches(rounded, batch_format="pandas")


def _q_simhash(sf_dir: str) -> Any:
    from kire_ray.pipelines.dedup import simhash_dedup

    return simhash_dedup(_docs(sf_dir))


_NGRAM_PAIRS_CACHE: dict[str, Any] = {}
_DUP_CLUSTERS_CACHE: dict[str, Any] = {}


def _ngram_pairs(sf_dir: str) -> Any:
    """Memoized MATERIALIZED n-gram Jaccard pair table per sf_dir:
    four driver queries (ngram_jaccard_dedup, dup_clusters,
    dedup_corpus, pretrain_pack) consume the identical deterministic
    DAG — the same cache-the-shared-prefix fix the flagship uses."""
    from kire_ray.pipelines.dedup import ngram_jaccard_dedup

    c = _NGRAM_PAIRS_CACHE.get(sf_dir)
    if c is None:
        c = ngram_jaccard_dedup(
            _docs(sf_dir), ngram=4, threshold=0.5, df_cap=64
        ).materialize()
        _NGRAM_PAIRS_CACHE[sf_dir] = c
    return c


def _dup_clusters_cached(sf_dir: str) -> Any:
    from kire_ray.pipelines.dedup import dup_clusters

    c = _DUP_CLUSTERS_CACHE.get(sf_dir)
    if c is None:
        c = dup_clusters(_ngram_pairs(sf_dir)).materialize()
        _DUP_CLUSTERS_CACHE[sf_dir] = c
    return c


def _q_ngram_jaccard(sf_dir: str) -> Any:
    """Exact word-4-gram Jaccard near-dup (rare-gram blocking, df≤64,
    threshold 0.5) — fully deterministic, blocking AND verification
    reconstructed in the SQL oracle. 4-grams (not 3) keep the blocking
    selective on templated text: at sf0.1 they cut candidate pairs 30×
    (1.13M → 39k) with the identical verified output set."""
    return _ngram_pairs(sf_dir)


def _q_fuzzy_name_pairs(sf_dir: str) -> Any:
    """Deletion-neighborhood fuzzy match over customer names: all
    distinct-name pairs at Levenshtein distance exactly 1."""
    from kire_ray.pipelines.dedup import fuzzy_pairs

    cust = _sread(sf_dir, "customer", ["c_name"])
    return fuzzy_pairs(cust, col="c_name")


def _q_setsim_join(sf_dir: str) -> Any:
    """Exact COMPLETE set-similarity self-join (AllPairs/PPJoin prefix
    filter, word 3-gram sets, Jaccard ≥ 0.5) — no blocking cap, so the
    oracle is the brute-force distinct-gram self-join."""
    from kire_ray.pipelines.dedup import setsim_join

    return setsim_join(_docs(sf_dir), ngram=3, threshold=0.5)


def _q_dup_clusters(sf_dir: str) -> Any:
    """Connected components over the (deterministic, SQL-replicable)
    n-gram Jaccard duplicate pairs — the distributed min-label
    propagation verified against a recursive-CTE transitive closure."""
    return _dup_clusters_cached(sf_dir)


N_PLANTED_DUPS = 32
PLANT_ID_BASE = 10_000_000


def _q_dedup_corpus(sf_dir: str) -> Any:
    """End-to-end deduplicated corpus: doc_ids surviving near-dup
    clustering (cluster representative = min id; singletons kept)."""
    from kire_ray.pipelines.dedup import dedup_corpus

    return dedup_corpus(
        _docs(sf_dir), _dup_clusters_cached(sf_dir)
    ).select_columns(["doc_id"])


def _q_pretrain_pack(sf_dir: str) -> Any:
    """End-to-end pretraining prep showcase: near-dup-deduplicated
    corpus packed into fixed 2048-token sequences (clean→dedup→pack
    composed as ONE streaming chain; the oracle composes the same
    recursive-closure + window-prefix-sum SQL)."""
    from kire_ray.pipelines.dedup import dedup_corpus
    from kire_ray.pipelines.text_analysis import pack_sequences

    return pack_sequences(
        dedup_corpus(_docs(sf_dir), _dup_clusters_cached(sf_dir)), budget=2048
    )


def _q_embdedup(sf_dir: str) -> Any:
    """Cosine near-dup over the embeddings table with deterministic
    planted duplicates: the synthetic table has no natural pairs at
    cos ≥ 0.95 (the sf0.01 run returned 0 rows, proving only that the
    pipeline runs), so exact copies of the first N_PLANTED_DUPS vectors
    are appended under shifted ids — the query's output is non-empty
    and value-stable (each planted pair at cosine 1.0).

    Oracle scoping: the DuckDB oracle is EXACT all-pairs cosine while
    the engine compares only LSH-bucket-colliding pairs. Parity holds
    because (a) exact duplicates always share a bucket, and (b) the
    synthetic table's max natural cosine is ~0.60, far under the 0.95
    threshold — tests/test_ops.py::test_embedding_similarity_gap
    asserts that gap so a testdata drift fails in pytest before it can
    fail the driver compare. On real data the LSH path under-reports
    borderline pairs by design (recall/cost trade documented in
    pipelines/dedup.embedding_dedup)."""
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.pipelines.dedup import embedding_dedup

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b.vec_id < N_PLANTED_DUPS]
        return pd.concat(
            [b, keep.assign(vec_id=keep.vec_id + PLANT_ID_BASE)], ignore_index=True
        )

    planted = _emb(sf_dir).map_batches(plant, batch_format="pandas")
    return embedding_dedup(planted).map_batches(
        lambda b: b.assign(cosine=round_half_up(b.cosine, 6)), batch_format="pandas"
    )


def _q_text_metrics(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import text_metrics

    return text_metrics(_docs(sf_dir))


def _q_token_total(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import token_count_total

    return pd.DataFrame({"total_tokens": [token_count_total(_docs(sf_dir))]})


def _q_gopher_quality(sf_dir: str) -> Any:
    """Gopher-style quality gate (length / mean word length / stopword
    diversity / duplicate word+bigram fractions) with a ``passes``
    verdict; every metric reconstructed exactly in the DuckDB oracle."""
    from kire_ray.pipelines.text_analysis import gopher_quality

    return gopher_quality(_docs(sf_dir))


def _q_decontaminate(sf_dir: str) -> Any:
    """Train/test decontamination: benchmark = every 50th doc_id; flag
    training docs sharing ≥1 word 3-gram with it. The benchmark n-gram
    set broadcasts once; the training side is a streaming probe."""
    from kire_ray.pipelines.decontam import benchmark_ngrams, decontaminate

    docs = _docs(sf_dir)

    def pick(bench: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            m = (b["doc_id"] % 50 == 0) == bench
            return b[m]

        return f

    hashes = benchmark_ngrams(docs.map_batches(pick(True), batch_format="pandas"))
    return decontaminate(docs.map_batches(pick(False), batch_format="pandas"), hashes)


def _q_tfidf_top_terms(sf_dir: str) -> Any:
    """Top-5 TF-IDF terms per doc: vocab-bounded df exchange broadcast
    once, per-batch explode+rank — verified value-for-value in SQL."""
    from kire_ray.pipelines.text_analysis import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir), k=5)


def _q_unigram_logprob(sf_dir: str) -> Any:
    """Per-doc mean unigram log-prob under the corpus unigram LM — the
    SQL-checkable stand-in for perplexity-based quality filtering."""
    from kire_ray.pipelines.text_analysis import unigram_logprob

    return unigram_logprob(_docs(sf_dir))


def _q_duplicated_spans(sf_dir: str) -> Any:
    """Substring dedup (Lee et al. 2021 family): maximal per-doc spans
    covered by token-8-grams that repeat anywhere in the corpus. Every
    stage hash-partitioned; the duplicated-window table is semi-joined
    back via a large⋈large hash join, never broadcast."""
    from kire_ray.pipelines.dedup import duplicated_spans

    return duplicated_spans(_docs(sf_dir), window=8)


def _q_source_mix(sf_dir: str) -> Any:
    """Per-source doc/token counts + uniform-resampling weights (the
    data-mixing stage); combiner → source-cardinality exchange."""
    from kire_ray.pipelines.text_analysis import source_mix

    docs = _sread(sf_dir, "documents", ["doc_id", "text", "source"])
    return source_mix(docs)


_BPE_CACHE: dict[str, Any] = {}


def _q_bpe_learn(sf_dir: str) -> Any:
    """Distributed BPE vocab induction (Sennrich 2016): 10 merge rounds
    over the vocab-sized word-frequency table; per-round pair counts
    are alphabet-bounded block partials (pipelines/bpe.py). The learned
    state (merge table + final segmented vocab, both materialized) is
    memoized per corpus so bpe_segment rides the same 10 rounds instead
    of re-learning — the _FLAGSHIP shared-DAG pattern."""
    return _bpe_state(sf_dir)["merges"]


def _bpe_state(sf_dir: str) -> dict:
    s = _BPE_CACHE.get(sf_dir)
    if s is None:
        from kire_ray.pipelines.bpe import bpe_learn_full

        merges, seg = bpe_learn_full(_docs(sf_dir), n_merges=10)
        s = _BPE_CACHE[sf_dir] = {"merges": merges.materialize(), "seg": seg}
    return s


def _bpe_sql(n_merges: int) -> str:
    """The BPE merge loop unrolled round-for-round in SQL (the
    markov_steady_state unrolling pattern): each round counts adjacent
    symbol pairs via lead() over the exploded segmentation, picks the
    (count DESC, pair ASC) winner, and applies the greedy leftmost
    merge with the same double-space replace trick as
    kire_ray/pipelines/bpe.py:apply_merge — plain ``replace`` has
    identical left-to-right non-overlapping semantics in DuckDB and
    Python, so every round is value-exact."""
    parts = [
        """
            WITH bpe_w AS MATERIALIZED (
                SELECT w AS word, count(*) AS n FROM (
                    SELECT unnest(list_filter(string_split(text, ' '),
                                              x -> x <> '')) AS w
                    FROM documents) GROUP BY w),
            bpe_seg0 AS MATERIALIZED (
                SELECT word, n,
                       array_to_string(string_split(word, ''), ' ') AS seg
                FROM bpe_w)"""
    ]
    for r in range(n_merges):
        parts.append(
            f""",
            bpe_pr{r} AS (
                SELECT word, n,
                       s || ' ' || lead(s) OVER (PARTITION BY word ORDER BY i)
                           AS pr
                FROM (SELECT word, n, unnest(ts) AS s,
                             generate_subscripts(ts, 1) AS i
                      FROM (SELECT word, n, string_split(seg, ' ') AS ts
                            FROM bpe_seg{r}))
                QUALIFY pr IS NOT NULL),
            bpe_best{r} AS MATERIALIZED (
                SELECT pr, sum(n) AS c FROM bpe_pr{r}
                GROUP BY pr ORDER BY c DESC, pr ASC LIMIT 1),
            bpe_seg{r + 1} AS MATERIALIZED (
                SELECT word, n,
                       trim(regexp_replace(
                           replace(' ' || replace(seg, ' ', '  ') || ' ',
                                   ' ' || replace((SELECT pr FROM bpe_best{r}), ' ', '  ') || ' ',
                                   ' ' || replace((SELECT pr FROM bpe_best{r}), ' ', '') || ' '),
                           ' +', ' ', 'g')) AS seg
                FROM bpe_seg{r})"""
        )
    union = "\n            UNION ALL ".join(
        f"""SELECT CAST({r} AS INT) AS rank,
                   split_part(pr, ' ', 1) AS "left",
                   split_part(pr, ' ', 2) AS "right",
                   pr AS pair, replace(pr, ' ', '') AS merged,
                   CAST(c AS BIGINT) AS count FROM bpe_best{r}"""
        for r in range(n_merges)
    )
    return "".join(parts) + "\n            " + union


def _bpe_segment_sql(n_merges: int) -> str:
    """Same unrolled prefix as _bpe_sql, but the final projection is the
    fully-merged vocab segmentation (the bpe_segment output)."""
    prefix = _bpe_sql(n_merges)
    prefix = prefix[: prefix.rindex("SELECT CAST(0 AS INT) AS rank")]
    return (
        prefix
        + f"""SELECT word, CAST(n AS BIGINT) AS n, seg,
                   CAST(len(string_split(seg, ' ')) AS INT) AS n_subwords
            FROM bpe_seg{n_merges}"""
    )


def _q_bpe_segment(sf_dir: str) -> Any:
    """Tokenizer-fertility table: the learned merges applied to the
    corpus vocabulary (word, n, seg, n_subwords) — rides the memoized
    learner's final segmented vocab (no re-learning)."""

    def project(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_subwords"] = np.array(
            [s.count(" ") + 1 for s in b["seg"]], dtype=np.int32
        )
        return b

    return _bpe_state(sf_dir)["seg"].map_batches(project, batch_format="pandas")


def _q_rephrase_docs(sf_dir: str) -> Any:
    """LLM-rephrase augmentation plumbing (WRAP, Maini et al. 2024):
    actor-pool rewrite stage; the model is the documented stub, the
    fake path is an md5-keyed span permutation the oracle replays."""
    from kire_ray.pipelines.text_analysis import rephrase_docs

    return rephrase_docs(_docs(sf_dir))


def _q_curriculum_schedule(sf_dir: str) -> Any:
    """Length-quantile curriculum stages + md5 within-stage order key
    (value-histogram thresholds — no global sort; sampling.py)."""
    from kire_ray.pipelines.sampling import curriculum_schedule

    return curriculum_schedule(_docs(sf_dir), n_stages=4)


def _q_mixture_weights(sf_dir: str) -> Any:
    """Alpha-smoothed multinomial domain weights (XLM §3.1,
    p_i ∝ q_i^0.3) — the sampling distribution a mixture trainer feeds
    weighted_sample; same combiner→exchange shape as source_mix."""
    from kire_ray.pipelines.text_analysis import mixture_weights

    docs = _sread(sf_dir, "documents", ["text", "source"])
    return mixture_weights(docs, alpha=0.3)


def _q_fingerprints(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import fingerprints

    return fingerprints(_docs(sf_dir))


def _q_word_freq(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import word_frequencies

    return word_frequencies(_docs(sf_dir))


def _q_token_counts(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import regex_token_counts

    return regex_token_counts(_docs(sf_dir))


# fixed per-source sampling rates for the stratified_sample query —
# shared with oracle_sql(), which generates the SQL CASE from this dict
_SAMPLE_RATES = {"src1": 1.0, "src2": 0.25, "src3": 0.75, "src4": 0.1}
_SAMPLE_DEFAULT = 0.5
_SHUFFLE_SHARDS = 32
# duplicated from kire_ray.pipelines.text_analysis.EMAIL_PATTERN by a
# contract test — the oracle f-string needs it at module scope
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _stratified_sample_sql() -> str:
    """SQL twin of sampling.stratified_sample over _SAMPLE_RATES: the
    CASE thresholds are generated from the same dict + threshold rule
    the engine uses (single source of truth)."""
    from kire_ray.pipelines.sampling import _rate_threshold

    arms = "".join(
        f"WHEN '{s}' THEN '{_rate_threshold(r)}' "
        for s, r in _SAMPLE_RATES.items()
    )
    return f"""
        SELECT doc_id, source
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
              CASE source {arms}ELSE '{_rate_threshold(_SAMPLE_DEFAULT)}' END
    """


def _q_stratified_sample(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import stratified_sample

    docs = _sread(sf_dir, "documents", ["doc_id", "source"])
    return stratified_sample(docs, _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT)


def _q_reservoir_sample(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import reservoir_sample

    docs = _sread(sf_dir, "documents", ["doc_id", "source"])
    return reservoir_sample(docs, 100)


def _q_grouped_reservoir(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import grouped_reservoir

    docs = _sread(sf_dir, "documents", ["doc_id", "source"])
    return grouped_reservoir(docs, 20)


def _q_pca_project(sf_dir: str) -> Any:
    """Rows-only at the driver (eigh is float-iterative, like ann_ivf);
    value equality vs a sequential numpy PCA is pytest-verified
    (test_training_ops_r3)."""
    from kire_ray.pipelines.similarity import pca_project

    emb = _sread(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_project(emb, n_components=2)


def _q_training_shuffle(sf_dir: str) -> Any:
    from kire_ray.pipelines.sampling import training_shuffle

    docs = _sread(sf_dir, "documents", ["doc_id"])
    return training_shuffle(docs, n_shards=_SHUFFLE_SHARDS)


def _q_redact_text(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import redact_text

    return redact_text(_docs(sf_dir))


def _q_doc_chunks(sf_dir: str) -> Any:
    from kire_ray.pipelines.text_analysis import doc_chunks

    return doc_chunks(_docs(sf_dir), window=32, stride=24)


def _q_clean_corpus(sf_dir: str) -> Any:
    """Composed cleaning pipeline: Gopher gate → exact dedup (keep min
    doc_id, copies counted) → email/number redaction. Partitioned on
    the text hash so dedup is exchange-local (the same layout the
    resumable clean_corpus_build writes)."""
    from kire_ray.pipelines.clean_corpus import clean_docs

    docs = _sread(sf_dir, "documents", ["doc_id", "source", "text"])
    return clean_docs(docs)


def _q_length_batches(sf_dir: str) -> Any:
    """O3: length-sorted batch packing via a distributed counting sort
    (no global data sort)."""
    from kire_ray.pipelines.text_analysis import length_sorted_batches

    return length_sorted_batches(_docs(sf_dir), batch_rows=16)


def _q_pack_sequences(sf_dir: str) -> Any:
    """Pretraining sequence packing via distributed prefix sum (range-
    partitioned two-pass scan; no doc shuffle)."""
    from kire_ray.pipelines.text_analysis import pack_sequences

    return pack_sequences(_docs(sf_dir), budget=2048)


def _q_doc_subwords(sf_dir: str) -> Any:
    """M2/T1: real greedy WordPiece over a corpus-derived chunk vocab —
    per-doc word/subword counts are SQL-replicable (ceil(len/8) pieces
    per word by construction, stages/subword.py)."""
    from kire_ray.stages.subword import build_chunk_vocab, tokenize_subwords

    docs = _docs(sf_dir)
    vocab = build_chunk_vocab(docs)
    sw = tokenize_subwords(docs, vocab)

    def to_counts(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_words": b["n_words"].astype(np.int64),
                "n_subwords": b["n_subwords"].astype(np.int64),
            }
        )

    return sw.map_batches(to_counts, batch_format="pandas")


def _q_kg_doc_subwords(sf_dir: str) -> Any:
    """Full subword channels over the flagship's linked docs: input_ids,
    word→subword maps (sent_map), '*' entity markers, subword_indexs —
    the ATLOP+KIRE/prepro.py:37-78 feature surface."""
    from kire_ray.stages.subword import chunk_vocab_from_words, tokenize_subwords

    c = _flagship_linked(sf_dir)
    if "subwords" not in c:
        # memoized: the flat projection query re-consumes the same
        # channels — don't rebuild the vocab + retokenize per consumer;
        # the chunk vocab derives from the shared word-counts exchange
        vocab = chunk_vocab_from_words(_flagship_word_counts(sf_dir)["word"])
        c["subwords"] = tokenize_subwords(c["linked"], vocab).materialize()
    return c["subwords"]


def _q_kg_doc_subwords_flat(sf_dir: str) -> Any:
    """Scalar projection of kg_doc_subwords with an exact oracle: under
    the corpus chunk vocab, per-doc subword counts over the assembled
    transcripts are SQL-recomputable (ceil(len/8) per word)."""
    sw = _q_kg_doc_subwords(sf_dir)

    def flat(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_words": b["n_words"].astype(np.int64),
                "n_subwords": b["n_subwords"].astype(np.int64),
            }
        )

    return sw.map_batches(flat, batch_format="pandas")


def _flagship_word_counts(sf_dir: str) -> pd.DataFrame:
    """One distinct-word exchange per corpus per session, shared by the
    featurize vocab and the subword chunk vocab (both scan the same
    linked turn_texts otherwise)."""
    from kire_ray.stages.featurize import word_counts

    c = _flagship_linked(sf_dir)
    if "word_counts" not in c:
        c["word_counts"] = word_counts(c["linked"])
    return c["word_counts"]


def _q_doc_features(sf_dir: str) -> Any:
    """M6/M7 dense channels (+ the B4 char-id rectangles) over the
    flagship's linked docs (ragged Arrow lists, vocab built
    distributed, char vocab derived from the same counts table)."""
    from kire_ray.stages.featurize import (
        char_vocab_from_counts,
        featurize,
        vocab_from_counts,
    )

    c = _flagship_linked(sf_dir)
    counts = _flagship_word_counts(sf_dir)
    return featurize(
        c["linked"],
        vocab_from_counts(counts),
        char_vocab=char_vocab_from_counts(counts),
        kg_ref=c["ctx"].kg_ref,
        canon_ref=c["ctx"].canon_ref,
    )


def _q_doc_char_ids_flat(sf_dir: str) -> Any:
    """B4 char channel flattened to (doc_id, pos, cpos, char_id) rows —
    the char vocab rank is a plain SQL window over corpus character
    counts, so the whole channel is driver-verifiable value-exactly."""
    import pyarrow.compute as pc

    feats = _q_doc_features(sf_dir)

    def flatten(t: pa.Table) -> pa.Table:
        ci = t.column("char_ids")  # list<list<int32>> per doc
        words = pc.list_flatten(ci)  # list<int32> per word
        wdoc = pc.take(t.column("doc_id"), pc.list_parent_indices(ci))
        wlens = pc.list_value_length(ci).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.repeat(np.cumsum(wlens) - wlens, wlens)
        wpos = np.arange(int(wlens.sum()), dtype=np.int64) - offs
        chars = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        doc = pc.take(wdoc, parent)
        pos = pa.array(wpos, pa.int64()).take(parent)
        clens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        coffs = np.repeat(np.cumsum(clens) - clens, clens)
        cpos = np.arange(int(clens.sum()), dtype=np.int64) - coffs
        return pa.table(
            {
                "doc_id": doc,
                "pos": pos,
                "cpos": pa.array(cpos, pa.int64()),
                "char_id": pc.cast(chars, pa.int64()),
            }
        )

    return feats.map_batches(flatten, batch_format="pyarrow")


def _q_doc_word_ids_flat(sf_dir: str) -> Any:
    """M6 word-id channel flattened to (doc_id, pos, word_id) rows so
    the driver's DuckDB oracle can verify the distributed vocab encode
    value-exactly (vocab rank = row_number over (count desc, word);
    the ragged ``doc_features`` stays rows-only for the NER/entity
    channels, which depend on linking clusters)."""
    import pyarrow.compute as pc

    feats = _q_doc_features(sf_dir)

    def flatten(t: pa.Table) -> pa.Table:
        wi = t.column("word_ids")
        flat = pc.list_flatten(wi)
        parent = pc.list_parent_indices(wi)
        doc = pc.take(t.column("doc_id"), parent)
        lens = pc.list_value_length(wi).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(int(lens.sum()), dtype=np.int64) - offs
        return pa.table(
            {
                "doc_id": doc,
                "pos": pa.array(pos, pa.int64()),
                "word_id": pc.cast(flat, pa.int64()),
            }
        )

    return feats.map_batches(flatten, batch_format="pyarrow")


def _q_doc_token_tags_flat(sf_dir: str) -> Any:
    """M7 NER/entity channels flattened to (doc_id, pos, ner_id,
    ent_id) rows — mention coverage, cluster ids and the KG-typed
    ner2id mapping all reconstructable in SQL from the gold parquet."""
    import pyarrow.compute as pc

    feats = _q_doc_features(sf_dir)

    def flatten(t: pa.Table) -> pa.Table:
        ner = t.column("ner_ids")
        ent = t.column("ent_ids")
        parent = pc.list_parent_indices(ner)
        doc = pc.take(t.column("doc_id"), parent)
        lens = pc.list_value_length(ner).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(int(lens.sum()), dtype=np.int64) - offs
        return pa.table(
            {
                "doc_id": doc,
                "pos": pa.array(pos, pa.int64()),
                "ner_id": pc.cast(pc.list_flatten(ner), pa.int64()),
                "ent_id": pc.cast(pc.list_flatten(ent), pa.int64()),
            }
        )

    return feats.map_batches(flatten, batch_format="pyarrow")


def _q_doc_pair_dis_flat(sf_dir: str) -> Any:
    """M8 per-pair signed distance buckets flattened to (doc_id, h, t,
    ep_dis) — the dis2idx table + entity budget as SQL."""
    import pyarrow.compute as pc

    feats = _q_doc_features(sf_dir)

    def flatten(t: pa.Table) -> pa.Table:
        ph = t.column("pair_h")
        parent = pc.list_parent_indices(ph)
        doc = pc.take(t.column("doc_id"), parent)
        return pa.table(
            {
                "doc_id": doc,
                "h": pc.cast(pc.list_flatten(ph), pa.int64()),
                "t": pc.cast(pc.list_flatten(t.column("pair_t")), pa.int64()),
                "ep_dis": pc.cast(pc.list_flatten(t.column("ep_dis")), pa.int64()),
            }
        )

    return feats.map_batches(flatten, batch_format="pyarrow")


def _q_doc_graphs(sf_dir: str) -> Any:
    """GLRE's typed document graph (entity/mention/sentence nodes,
    5-channel edges) as ragged per-doc rows."""
    from kire_ray.stages.graph import build_doc_graphs

    return build_doc_graphs(_flagship_linked(sf_dir)["linked"])


def _q_doc_graphs_flat(sf_dir: str) -> Any:
    """The typed document graph as one row per directed edge —
    the SQL-comparable projection of ``doc_graphs``' ragged
    adjacency (node-id arithmetic: entities [0, n_e), mentions
    [n_e, n_e+n_m) in (ent_idx, turn, start) order, sentences
    [n_e+n_m, n_e+n_m+n_turns))."""
    from kire_ray.stages.graph import build_doc_graphs, explode_edges

    return explode_edges(build_doc_graphs(_flagship_linked(sf_dir)["linked"]))


def _n_media(sf_dir: str) -> int:
    from kire_ray.sources.synth import sf_of_dir

    return max(120, int(12000 * sf_of_dir(sf_dir)))


def _media_meta(sf_dir: str) -> str:
    """Persist the deterministic synth-media *metadata* (payload
    replaced by its md5 hex) under the corpus dir so the frame_sample /
    audio_chunk / media_features_flat / image_resize_geom oracles can
    reconstruct the chunk arithmetic, the md5-derived fake features and
    the resize geometry in SQL. Idempotent (v2: + payload_md5, width,
    height)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    path = os.path.join(_corpus(sf_dir), "media_meta_v2.parquet")
    if not os.path.exists(path):
        from kire_ray.pipelines.multimodal import synth_media

        t = synth_media(_n_media(sf_dir))
        md5s = pa.array(
            [hashlib.md5(p).hexdigest() for p in t.column("payload").to_pylist()],
            pa.string(),
        )
        t = t.drop_columns(["payload"]).append_column("payload_md5", md5s)
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


def _q_kg_eval(sf_dir: str) -> Any:
    """DocRED-style harness (A5/A6, evaluation.py:70-193 semantics):
    P/R/F1 of extracted canonical triples vs the planted gold — the
    BASELINE.json P/R >= 0.95 gate as a one-row metrics table."""
    from kire_ray.functions.rounding import round_half_up
    from kire_ray.pipelines.eval import triple_prf

    corpus = _corpus(sf_dir)
    edges = _flagship_graph(sf_dir)["edges"].to_pandas()
    gold = pq.read_table(f"{corpus}/gold_triples.parquet").to_pandas()
    m = triple_prf(edges, gold)
    for k in ("precision", "recall", "f1"):
        m[k] = round_half_up(m[k], 6)
    m["n_pred"] = np.int64(m["n_pred"])
    m["n_gold"] = np.int64(m["n_gold"])
    return pd.DataFrame([m])


def _q_kg_eval_official(sf_dir: str, *, collect_limit: int = 2_000_000) -> Any:
    """Full official DocRED metrics incl. Ign (evaluation.py:70-193):
    doc-level (doc,h,t,r) exact match; the Ign variant removes
    correct-and-in-train predictions via the train-fact semi-join
    (J5/J6/M12 at the driver surface). Train split = the md5 doc split
    (SQL-replicable, same as the GLRE intrain flag) so the whole row is
    driver-verifiable against the gold parquet.

    Size-thresholded (VERDICT r4 #1: preds AND gold scale with the
    corpus): under ``collect_limit`` gold rows (parquet metadata — the
    prediction table is the same order) the reference-faithful
    driver-side path runs; above it (or forced with
    ``collect_limit=0``) ``official_evaluate_distributed`` computes the
    same integer counts via tagged membership exchanges — paths equal
    in test_official_eval_distributed_equal."""
    import pyarrow.dataset as _pads

    from kire_ray.functions.rounding import round_half_up
    from kire_ray.pipelines.eval import (
        official_evaluate,
        official_evaluate_distributed,
    )

    corpus = _corpus(sf_dir)
    gold_path = f"{corpus}/gold_labels.parquet"
    n_gold_rows = _pads.dataset(gold_path).count_rows()
    if n_gold_rows > collect_limit:
        m = official_evaluate_distributed(
            _flagship_graph(sf_dir)["triples"].map_batches(
                lambda b: b.rename(columns={"pred": "r"}), batch_format="pandas"
            ),
            ray.data.read_parquet(gold_path),
            train_mask=_md5_is_train_vec,
        )
    else:
        preds = (
            _flagship_graph(sf_dir)["triples"]
            .to_pandas()
            .rename(columns={"pred": "r"})
        )
        gold = pq.read_table(gold_path).to_pandas()
        # canonical-triple fact per prediction key, for the Ign anti-join
        fact_by_key = {
            (p.doc_id, p.h_idx, p.t_idx, p.r): (p.subj_qid, p.r, p.obj_qid)
            for p in preds.itertuples()
        }
        train_facts = {
            fact_by_key[(p.doc_id, p.h_idx, p.t_idx, p.r)]
            for p in preds.itertuples()
            if _md5_is_train(p.doc_id)
        }
        m = official_evaluate(
            preds,
            gold,
            train_facts=train_facts,
            fact_of=lambda k: fact_by_key.get(k, ("?",)),
        )
    for k in ("precision", "recall", "f1", "ign_precision", "ign_f1"):
        m[k] = round_half_up(m[k], 6)
    for k in ("n_pred", "n_gold", "correct_in_train"):
        m[k] = np.int64(m[k])
    return pd.DataFrame([m])


def _q_theta_tuning(sf_dir: str, *, broadcast_limit: int = 2_000_000) -> Any:
    """A6 global-sort theta tuning (GLRE tune_f1_theta semantics) over
    the flagship's scored predictions vs the planted doc-level gold.

    The gold membership mark routes through ``mark_membership``'s
    size-thresholded switch (VERDICT r4 #1): gold rows scale with the
    corpus, so under ``broadcast_limit`` parquet-metadata rows the
    distinct keys broadcast once, above it they become a tagged
    left-outer exchange on (doc_id, h_idx, t_idx, pred) — forced-path
    equality in test_theta_mark_paths_equal.

    Predictions are pre-sorted on (doc_id, h_idx, t_idx, pred) so the
    within-tie order of equal scores (same (s,r,o) triple in several
    docs) is canonical — the stable descending argsort inside
    tune_theta then matches the SQL oracle's ORDER BY exactly."""
    import pyarrow.dataset as _pads

    from kire_ray.functions.rounding import round_half_up
    from kire_ray.pipelines.eval import tune_theta_distributed
    from kire_ray.stages.joins import mark_membership
    from kire_ray.stages.shuffle import partitioned_map_groups

    corpus = _corpus(sf_dir)
    gold_path = f"{corpus}/gold_labels.parquet"
    key_cols = ["doc_id", "h_idx", "t_idx", "pred"]
    if _pads.dataset(gold_path).count_rows() <= broadcast_limit:
        gold = (
            pq.read_table(gold_path)
            .to_pandas()
            .rename(columns={"r": "pred"})[key_cols]
            .drop_duplicates()
        )
        gold_keys: Any = gold
        n_gold = len(gold)
    else:
        gold_keys = partitioned_map_groups(
            ray.data.read_parquet(gold_path).map_batches(
                lambda b: b.rename(columns={"r": "pred"})[
                    key_cols
                ].drop_duplicates(),
                batch_format="pandas",
            ),
            key_cols,
            lambda part: part.drop_duplicates(),
        ).materialize()
        n_gold = gold_keys.count()

    preds = mark_membership(
        _flagship_graph(sf_dir)["triples"],
        gold_keys,
        key_cols,
        "is_correct",
        broadcast_limit=broadcast_limit,
        keys_nrows=n_gold,
        keys_distinct=True,
    )
    m = tune_theta_distributed(
        preds,
        n_gold=n_gold,
        tiebreak_cols=("doc_id", "h_idx", "t_idx", "pred"),
    )
    return pd.DataFrame(
        [{k: round_half_up(v, 6) for k, v in m.items()}]
    )


def _q_kg_assembled_turns(sf_dir: str) -> Any:
    """The BASELINE per-row invariant, driver-verifiable: assembled
    documents exploded back to (doc_id, turn_idx, text) must equal the
    input transcript rows exactly (per-turn text equality under stable
    turn ordering) — the oracle is a plain scan of transcripts.parquet."""
    c = _flagship_linked(sf_dir)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        n = b["turn_texts"].map(len).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": np.repeat(b["doc_id"].to_numpy(), n),
                "turn_idx": np.concatenate(
                    [np.arange(k, dtype=np.int64) for k in n]
                ),
                "text": np.concatenate(
                    [np.asarray(t, dtype=object) for t in b["turn_texts"]]
                ),
            }
        )

    return c["linked"].map_batches(explode, batch_format="pandas")


def _q_kg_mentions_flat(sf_dir: str) -> Any:
    """Driver-verifiable mention detection (J8): linked docs' mention
    spans flattened to rows. The corpus generator plants gold mentions
    from the same lexicon the leftmost-longest alias scan uses, and the
    scan recovers every planted span exactly (span-level P=R=1.0), so
    the oracle is a plain scan of gold_mentions.parquet — verifying the
    assemble→scan chain value-for-value. (QID assignment is NOT part of
    this row: majority-vote linking legitimately diverges from
    per-mention gold on ambiguous aliases, and unlinkable entities get
    content-hash NT ids.)"""
    c = _flagship_linked(sf_dir)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        n = b["mentions"].map(len).to_numpy(dtype=np.int64)
        flat = [m for ms in b["mentions"] for m in ms]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(b["doc_id"].to_numpy(), n),
                "turn_idx": np.array([m["turn_idx"] for m in flat], dtype=np.int64),
                "start": np.array([m["start"] for m in flat], dtype=np.int64),
                "end": np.array([m["end"] for m in flat], dtype=np.int64),
                "surface": np.array([m["surface"] for m in flat], dtype=object),
            }
        )

    return c["linked"].map_batches(explode, batch_format="pandas")


def _q_docred_triples(sf_dir: str) -> Any:
    """The reference's own input format (DocRED JSON) through the same
    scorer/dedup stages: corpus → JSON export → read_docred_json →
    triples (tests assert P=R=1.0 vs gold on this path).

    Value-exact SQL oracle: _kg_chain_sql(docred=True) swaps the vote
    for the reader's rule (document 'link' override when linkable,
    first alias candidate otherwise — _vote_vertex). That vote is also
    the verified cause of the small edge-set divergence vs kg_edges
    (the flagship votes purely by alias, so ambiguous-alias clusters
    can resolve differently); both paths hash-match their own oracles."""
    import os

    from kire_ray.pipelines.kg_construct import extract_triples
    from kire_ray.sources.docred import read_docred_json, write_docred_json
    from kire_ray.stages.materialize import dedup_edges

    cache = _flagship(sf_dir)
    corpus = cache["corpus"]
    path = os.path.join(corpus, "docred_export.json")
    if not os.path.exists(path):
        write_docred_json(corpus, path)
    linked = read_docred_json(path, canon=cache["ctx"].canon)
    return dedup_edges(extract_triples(linked, cache["ctx"]))


def _md5_is_train(doc_id: str) -> bool:
    """SQL-replicable 50% split: first md5 hex byte < 0x80 (DuckDB:
    ``substr(md5(doc_id), 1, 2) < '80'`` — byte-identical hex)."""
    import hashlib

    return hashlib.md5(str(doc_id).encode("utf-8")).hexdigest()[:2] < "80"


def _md5_is_train_vec(doc_ids: "pd.Series") -> "np.ndarray":
    """Vectorized ``_md5_is_train`` for the distributed eval path."""
    import hashlib

    return np.fromiter(
        (
            hashlib.md5(str(d).encode("utf-8")).hexdigest()[:2] < "80"
            for d in doc_ids
        ),
        dtype=bool,
        count=len(doc_ids),
    )


def _glre_export(sf_dir: str, *, split: str) -> str:
    """Build (once per corpus per split flavour) the GLRE ``.data``
    export of the DocRED-export docs with gold labels and an
    indev_train fact set from the chosen train split."""
    import os

    from kire_ray.pipelines.eval import split_train_dev
    from kire_ray.sources.docred import read_docred_json, write_docred_json
    from kire_ray.sources.glre_data import collect_train_facts, write_glre_data

    cache = _flagship(sf_dir)
    corpus = cache["corpus"]
    json_path = os.path.join(corpus, "docred_export.json")
    if not os.path.exists(json_path):
        write_docred_json(corpus, json_path)
    out_dir = os.path.join(corpus, f"glre_export_{split}")
    if not os.path.exists(os.path.join(out_dir, "_DONE")):
        linked = read_docred_json(json_path, canon=cache["ctx"].canon)
        gl = (
            pq.read_table(f"{corpus}/gold_labels.parquet")
            .to_pandas()
            .drop_duplicates()  # exact duplicate annotation rows would
            # desync the .data chunk count from the oracle's GROUP BY
        )
        labels_by_doc: dict[str, list[dict]] = {}
        for r in gl.itertuples():
            labels_by_doc.setdefault(r.doc_id, []).append(
                {"h": int(r.h_idx), "t": int(r.t_idx), "r": r.r}
            )
        docs = sorted(labels_by_doc)
        if split == "md5":
            is_train = [_md5_is_train(d) for d in docs]
        else:
            is_train = split_train_dev(pd.Series(docs)).tolist()
        train_labels = {d: labels_by_doc[d] for d, t in zip(docs, is_train) if t}
        facts = collect_train_facts(linked, train_labels)
        # the JSON source arrives as ~1 block and write_glre_data
        # shards per block — repartition so the export (and therefore
        # every later read_text + parse of it) parallelizes; 16-way,
        # the pubtator_export_sharded precedent
        write_glre_data(
            linked.repartition(16), labels_by_doc, out_dir, train_facts=facts
        )
        open(os.path.join(out_dir, "_DONE"), "w").close()
    return out_dir


def _q_glre_pairs(sf_dir: str) -> Any:
    """S5/S2 interop: DocRED-export docs → GLRE flattened pair-row
    ``.data`` (NA pairs + indev_train flags) → parsed back as a pair
    Dataset. The ``.data`` chain mirrors docRedProcess.py → reader.py;
    the train-fact set comes from the deterministic hash split."""
    from kire_ray.sources.glre_data import read_glre_pairs

    return read_glre_pairs(_glre_export(sf_dir, split="blake"))


def _q_glre_pairs_flat(sf_dir: str) -> Any:
    """The GLRE chain's scalar projection with an md5-based train
    split, making the whole write→read round trip value-verifiable by
    the driver's DuckDB oracle: the oracle independently reconstructs
    labeled+NA pairs, min-sentence distance, CROSS/NON-CROSS and the
    name-level indev_train semi-join from the corpus gold parquet
    (the corpus lives at a deterministic path derived from sf_dir —
    the oracle SQL targets the sf0.01 cache the driver compares at)."""
    from kire_ray.sources.glre_data import read_glre_pairs

    out_dir = _glre_export(sf_dir, split="md5")

    def flat(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "h_idx": b["h_idx"].astype(np.int64),
                "t_idx": b["t_idx"].astype(np.int64),
                "rel": b["rel"],
                "dir": b["dir"],
                "cross": b["cross"],
                "dist": b["dist"].astype(np.int64),
                "intrain": b["intrain"].astype(bool),
            }
        )

    return read_glre_pairs(out_dir).map_batches(flat, batch_format="pandas")


def _q_pubtator_docs_flat(sf_dir: str) -> Any:
    """Scalar projection of the PubTator round trip with an exact
    oracle: per-doc turn/mention/entity/relation counts recomputed in
    SQL from the gold parquet (entities cluster by QID; title+abstract
    collapse the corpus to ≤2 turns)."""
    docs = _q_pubtator_docs(sf_dir)

    def flat(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_turns": b["n_turns"].astype(np.int64),
                "n_entities": b["entities"].map(len).astype(np.int64),
                "n_mentions": b["mentions"].map(len).astype(np.int64),
                "n_relations": b["relations"].map(len).astype(np.int64),
            }
        )

    return docs.map_batches(flat, batch_format="pandas")


def _q_kg_export_ids(sf_dir: str) -> Any:
    """Id-mapped KG export (gen_kg_data.py:328-355 layout) over the
    flagship edges: entity2id/relation2id/.nt3 files written once per
    corpus; returns the sharded edges_ids table."""
    import os

    from kire_ray.state.export import export_id_mapped_kg

    corpus = _corpus(sf_dir)
    out_dir = os.path.join(corpus, "kg_export")
    if not os.path.exists(os.path.join(out_dir, "one_hop_entity2id.txt")):
        export_id_mapped_kg(_flagship_graph(sf_dir)["edges"], out_dir)
    return ray.data.read_parquet(os.path.join(out_dir, "edges_ids.parquet"))


def _q_pubtator_docs(sf_dir: str) -> Any:
    """S3: the corpus rendered to PubTator (title/abstract + char-offset
    entity lines + QID relations) and read back through the PubTator
    source into the linked-doc schema."""
    import os

    from kire_ray.sources.pubtator import read_pubtator, write_pubtator_export_sharded

    corpus = _corpus(sf_dir)
    path = os.path.join(corpus, "pubtator_export_sharded")
    if not os.path.isdir(path):
        write_pubtator_export_sharded(corpus, path)
    return read_pubtator(path)


def _q_media_features(sf_dir: str) -> Any:
    from kire_ray.pipelines.multimodal import extract_media_features, synth_media

    media = ray.data.from_arrow(synth_media(_n_media(sf_dir)))
    return extract_media_features(media)


def _q_media_features_flat(sf_dir: str) -> Any:
    """media_features exploded to one row per (media_id, dim) — the
    SQL-exact projection of the ragged feature list (the fake decode is
    md5-derived, multimodal.py:MediaFeatureExtractor, so DuckDB replays
    every float bit-for-bit from the persisted payload_md5)."""
    from kire_ray.pipelines.multimodal import FEAT_DIM, extract_media_features, synth_media

    media = ray.data.from_arrow(synth_media(_n_media(sf_dir)))
    feats = extract_media_features(media)

    def flat(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ids = pa.array(np.repeat(b.column("media_id").to_numpy(zero_copy_only=False), FEAT_DIM))
        dims = pa.array(np.tile(np.arange(FEAT_DIM, dtype=np.int32), n), pa.int32())
        vals = b.column("features").combine_chunks().flatten()
        return pa.table({"media_id": ids, "dim": dims, "f": vals})

    return feats.select_columns(["media_id", "features"]).map_batches(
        flat, batch_format="pyarrow"
    )


def _q_image_resize(sf_dir: str) -> Any:
    from kire_ray.pipelines.multimodal import image_resize, synth_media

    media = ray.data.from_arrow(synth_media(_n_media(sf_dir)))
    return image_resize(media)


def _q_image_resize_geom(sf_dir: str) -> Any:
    """image_resize minus the opaque output payload, plus its exact
    byte length — every column pure arithmetic over (width, height), so
    the resize geometry (aspect-preserving fit, never-upscale, the
    pixel→byte accounting) is driver-verifiable in SQL."""
    from kire_ray.pipelines.multimodal import image_resize, synth_media

    media = ray.data.from_arrow(synth_media(_n_media(sf_dir)))
    out = image_resize(media)

    def geom(b: pa.Table) -> pa.Table:
        lens = pa.array(
            [len(p) for p in b.column("payload").to_pylist()], pa.int64()
        )
        return b.drop_columns(["payload"]).append_column("out_len", lens)

    return out.map_batches(geom, batch_format="pyarrow")


def _q_frame_sample(sf_dir: str) -> Any:
    from kire_ray.pipelines.multimodal import frame_sample, synth_media

    media = ray.data.from_arrow(synth_media(_n_media(sf_dir)))
    return frame_sample(media)


def _q_audio_chunk(sf_dir: str) -> Any:
    from kire_ray.pipelines.multimodal import audio_chunk, synth_media

    media = ray.data.from_arrow(synth_media(_n_media(sf_dir)))
    return audio_chunk(media)


# --------------------------------------------------------------------
# contract
# --------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    from kire_ray.pipelines import relational as R

    return {
        # flagship KG construction (SQL-verified: the vote→canon→score
        # chain is md5-derived, reconstructable from the gold parquet)
        "kg_triples": _kg("triples"),
        "kg_edges": _kg("edges"),
        "kg_nodes": _q_kg_nodes,
        "kg_node_vectors": _q_kg_node_vectors,
        "kg_linked_docs": _q_kg_linked_docs,
        "kg_coref_pairs": _kg_coref,
        "kg_assembled_turns": _q_kg_assembled_turns,
        "kg_mentions_flat": _q_kg_mentions_flat,
        "doc_chunk_stitch": _q_doc_chunk_stitch,
        "kg_triples_dwie": _q_kg_triples_dwie,
        "kg_eval_prf": _q_kg_eval,
        "kg_eval_official": _q_kg_eval_official,
        "kg_theta_tuning": _q_theta_tuning,
        "docred_triples": _q_docred_triples,
        "glre_pairs": _q_glre_pairs,
        "glre_pairs_flat": _q_glre_pairs_flat,
        "pubtator_docs": _q_pubtator_docs,
        "pubtator_docs_flat": _q_pubtator_docs_flat,
        "kg_export_ids": _q_kg_export_ids,
        # relational operator set (SQL-verified)
        "q1_pricing_summary": R.q1_pricing_summary,
        "top_parts_by_revenue": R.top_parts_by_revenue,
        "customer_order_totals": R.customer_order_totals,
        "supplier_nation_rollup": R.supplier_nation_rollup,
        "events_tumbling_window": R.events_tumbling_window,
        "events_hopping_window": R.events_hopping_window,
        "sessionize_events": R.sessionize_events,
        "events_gap_buckets": R.events_gap_buckets,
        "events_asof_join": R.events_asof_join,
        "orders_lineitem_range_join": R.orders_lineitem_range_join,
        "events_rolling_avg": R.events_rolling_avg,
        "events_distinct_users": R.events_distinct_users,
        "orders_status_quantiles": R.orders_status_quantiles,
        "distinct_order_status": R.distinct_order_status,
        "orders_lineitem_join_count": R.orders_lineitem_join_count,
        "filter_high_value_orders": R.filter_high_value_orders,
        "region_nation_union": R.region_nation_union,
        "customers_without_orders": R.customers_without_orders,
        "price_bucket_histogram": R.price_bucket_histogram,
        "top_orders_per_segment": R.top_orders_per_segment,
        "events_props_sum": R.events_props_sum,
        "lineitem_monthly_revenue": R.lineitem_monthly_revenue,
        "part_brand_stats": R.part_brand_stats,
        "suppliers_with_lineitems": R.suppliers_with_lineitems,
        "price_quantiles": R.price_quantiles,
        # training-data suite
        "exact_dedup": _q_exact_dedup,
        "bow_dedup": _q_bow_dedup,
        "zipf_fit": _q_zipf_fit,
        "key_skew_profile": _q_key_skew_profile,
        "k_anonymity": _q_k_anonymity,
        "events_autocorr": _q_events_autocorr,
        "ngram_novelty": _q_ngram_novelty,
        "pq_codes": _q_pq_codes,
        "weighted_reservoir": _q_weighted_reservoir,
        "column_mi": _q_column_mi,
        "minhash_dedup": _q_minhash,
        "simhash_dedup": _q_simhash,
        "ngram_jaccard_dedup": _q_ngram_jaccard,
        "setsim_join": _q_setsim_join,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "dup_clusters": _q_dup_clusters,
        "dedup_corpus": _q_dedup_corpus,
        "pretrain_pack": _q_pretrain_pack,
        "embedding_dedup": _q_embdedup,
        "text_metrics": _q_text_metrics,
        "gopher_quality": _q_gopher_quality,
        "decontaminate": _q_decontaminate,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "unigram_logprob": _q_unigram_logprob,
        "source_mix": _q_source_mix,
        "mixture_weights": _q_mixture_weights,
        "curriculum_schedule": _q_curriculum_schedule,
        "rephrase_docs": _q_rephrase_docs,
        "bpe_learn": _q_bpe_learn,
        "bpe_segment": _q_bpe_segment,
        "duplicated_spans": _q_duplicated_spans,
        "token_count_total": _q_token_total,
        "doc_fingerprints": _q_fingerprints,
        "word_frequencies": _q_word_freq,
        "doc_subwords": _q_doc_subwords,
        "token_counts": _q_token_counts,
        "pack_sequences": _q_pack_sequences,
        "length_batches": _q_length_batches,
        "clean_corpus": _q_clean_corpus,
        "stratified_sample": _q_stratified_sample,
        "reservoir_sample": _q_reservoir_sample,
        "grouped_reservoir": _q_grouped_reservoir,
        "pca_project": _q_pca_project,
        "training_shuffle": _q_training_shuffle,
        "redact_text": _q_redact_text,
        "doc_chunks": _q_doc_chunks,
        "kg_doc_subwords": _q_kg_doc_subwords,
        "kg_doc_subwords_flat": _q_kg_doc_subwords_flat,
        "doc_features": _q_doc_features,
        "doc_word_ids_flat": _q_doc_word_ids_flat,
        "doc_char_ids_flat": _q_doc_char_ids_flat,
        "doc_token_tags_flat": _q_doc_token_tags_flat,
        "doc_pair_dis_flat": _q_doc_pair_dis_flat,
        "doc_graphs": _q_doc_graphs,
        "doc_graphs_flat": _q_doc_graphs_flat,
        "ann_brute_force": _q_ann_brute,
        "ann_recall": _q_ann_recall,
        "bm25_search": _q_bm25_search,
        "pmi_bigrams": _q_pmi_bigrams,
        "lang_id": _q_lang_id,
        "lang_confusion": _q_lang_confusion,
        "label_centroids": _q_label_centroids,
        "containment_dedup": _q_containment_dedup,
        "top_words_per_lang": _q_top_words_per_lang,
        "events_zscore": _q_events_zscore,
        "events_regression": _q_events_regression,
        "event_hour_pmi": _q_event_hour_pmi,
        "events_mad": _q_events_mad,
        "users_every_day": _q_users_every_day,
        "snapshot_diff": _q_snapshot_diff,
        "events_wow_change": _q_events_wow_change,
        "markov_steady_state": _q_markov_steady_state,
        "purchase_attribution": _q_purchase_attribution,
        "events_anomalies": _q_events_anomalies,
        "source_distinctive_terms": _q_source_distinctive_terms,
        "nb_source_classifier": _q_nb_source_classifier,
        "user_decay_scores": _q_user_decay_scores,
        "bigram_logprob": _q_bigram_logprob,
        "events_quantile_cont": _q_events_quantile_cont,
        "events_ab_test": _q_events_ab_test,
        "embedding_gram": _q_embedding_gram,
        "running_totals": _q_running_totals,
        "events_rolling_mean": _q_events_rolling_mean,
        "events_anomaly_zscore": _q_events_anomaly_zscore,
        "hopping_window_counts": _q_hopping_window_counts,
        "repetition_top_ngrams": _q_repetition_top_ngrams,
        "kmeans_clusters": _q_kmeans_clusters,
        "dsir_weights": _q_dsir_weights,
        "ccnet_buckets": _q_ccnet_buckets,
        "semdedup": _q_semdedup,
        "events_ntile": _q_events_ntile,
        "weighted_sample": _q_weighted_sample,
        "inverted_index": _q_inverted_index,
        "events_value_ranks": _q_events_value_ranks,
        "hll_window_users": _q_hll_window_users,
        "kg_bfs_levels": _q_kg_bfs_levels,
        "incremental_dedup": _q_incremental_dedup,
        "span_dedup_corpus": _q_span_dedup_corpus,
        "embedding_quantize": _q_embedding_quantize,
        "embedding_top_component": _q_embedding_top_component,
        "sessionize": _q_sessionize,
        "asof_join": _q_asof_join,
        "event_pairs_within": _q_event_pairs_within,
        "latest_by_key": _q_latest_by_key,
        "per_source_cap": _q_per_source_cap,
        "knn_graph": _q_knn_graph,
        "skipgram_pairs": _q_skipgram_pairs,
        "jsonl_export": _q_jsonl_export,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "csv_roundtrip": _q_csv_roundtrip,
        "orc_roundtrip": _q_orc_roundtrip,
        "feather_roundtrip": _q_feather_roundtrip,
        "parquet_hive_export": _q_parquet_hive_export,
        "kg_comention": _q_kg_comention,
        "kg_link_prediction": _q_kg_link_prediction,
        "customer_order_outer": R.customer_order_outer,
        "q3_shipping_priority": R.q3_shipping_priority,
        "lineitem_corr": R.lineitem_corr,
        "q5_local_supplier_revenue": R.q5_local_supplier_revenue,
        "q10_returned_items": R.q10_returned_items,
        "q6_forecast_revenue": R.q6_forecast_revenue,
        "q14_promo_revenue": R.q14_promo_revenue,
        "q4_order_priority": R.q4_order_priority,
        "q18_large_volume_customers": R.q18_large_volume_customers,
        "q22_dormant_customers": R.q22_dormant_customers,
        "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
        "q7_volume_shipping": R.q7_volume_shipping,
        "q13_order_count_distribution": R.q13_order_count_distribution,
        "q8_market_share": R.q8_market_share,
        "q9_product_type_profit": R.q9_product_type_profit,
        "q15_top_supplier": R.q15_top_supplier,
        "q12_shipmode_priority": R.q12_shipmode_priority,
        "q19_discounted_revenue": R.q19_discounted_revenue,
        "q2_min_cost_supplier": R.q2_min_cost_supplier,
        "q11_important_stock": R.q11_important_stock,
        "q16_supplier_cnt": R.q16_supplier_cnt,
        "q20_excess_suppliers": R.q20_excess_suppliers,
        "q21_waiting_suppliers": R.q21_waiting_suppliers,
        "customer_status_setops": R.customer_status_setops,
        "user_event_sequences": _q_user_event_sequences,
        "event_transitions": _q_event_transitions,
        "next_event_labels": _q_next_event_labels,
        "daily_retention": _q_daily_retention,
        "orders_rollup": R.orders_rollup,
        "orders_cube": R.orders_cube,
        "events_moments": R.events_moments,
        "status_priority_pivot": R.status_priority_pivot,
        "events_resampled": R.events_resampled,
        "user_funnel": R.user_funnel,
        "hll_distinct_users": _q_hll_distinct_users,
        "tdigest_quantiles": _q_tdigest_quantiles,
        "frequent_itemsets": _q_frequent_itemsets,
        "pareto_frontier": _q_pareto_frontier,
        "user_retention_cohorts": _q_user_retention_cohorts,
        "events_cume_dist": _q_events_cume_dist,
        "embedding_codes": _q_embedding_codes,
        "preference_pairs": _q_preference_pairs,
        "tool_usage_stats": _q_tool_usage_stats,
        "conv_flows": _q_conv_flows,
        "role_transitions": _q_role_transitions,
        "conv_stats": _q_conv_stats,
        "turn_latency": _q_turn_latency,
        "tool_chains": _q_tool_chains,
        "conv_segments": _q_conv_segments,
        "table_profile": _q_table_profile,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "join_size_estimate": _q_join_size_estimate,
        "kmv_set_ops": _q_kmv_set_ops,
        "bloom_filter_join": _q_bloom_filter_join,
        "hist_quantiles": _q_hist_quantiles,
        "winsorize_events": _q_winsorize,
        "kg_pagerank": _q_kg_pagerank,
        "kg_hits": _q_kg_hits,
        "kg_negative_samples": _q_kg_negative_samples,
        "kg_link_eval": _q_kg_link_eval,
        "kg_link_eval_summary": _q_kg_link_eval_summary,
        "kg_random_walks": _q_kg_random_walks,
        "kg_triangles": _q_kg_triangles,
        "kg_clustering_coef": _q_kg_clustering_coef,
        "kg_kcore": _q_kg_kcore,
        "kg_communities": _q_kg_communities,
        "kg_pred_stats": _q_kg_pred_stats,
        "kg_meta_paths": _q_kg_meta_paths,
        "kg_edge_lifespan": _q_kg_edge_lifespan,
        "kg_degree_distribution": _q_kg_degree_distribution,
        "kg_betweenness": _q_kg_betweenness,
        "kg_ppr": _q_kg_ppr,
        "kg_schema_profile": _q_kg_schema_profile,
        "events_dow_chisq": _q_events_dow_chisq,
        "user_rfm": _q_user_rfm,
        "events_window_quantiles": _q_events_window_quantiles,
        "scd2_history": _q_scd2_history,
        "late_events": _q_late_events,
        "window_dedup": _q_window_dedup,
        "docsim_cosine": _q_docsim_cosine,
        "knn_classify": _q_knn_classify,
        "source_js_divergence": _q_source_js,
        "l_diversity": _q_l_diversity,
        "theilsen_trend": _q_theilsen_trend,
        "changepoint_cusum": _q_changepoint_cusum,
        "fk_integrity": _q_fk_integrity,
        "dp_histogram": _q_dp_histogram,
        "train_label_pick": _q_train_label_pick,
        "sorted_neighborhood": _q_sorted_neighborhood,
        "kg_components": _q_kg_components,
        "kg_reachability": _q_kg_reachability,
        "kg_hyperball": _q_kg_hyperball,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        # multimodal plumbing (deterministic fake decode)
        "media_features": _q_media_features,
        "media_features_flat": _q_media_features_flat,
        "image_resize": _q_image_resize,
        "image_resize_geom": _q_image_resize_geom,
        "frame_sample": _q_frame_sample,
        "audio_chunk": _q_audio_chunk,
    }


def _sql_norm(col: str) -> str:
    """DuckDB expression mirroring functions.textnorm.normalize_label
    (the reference's _handleLabel) + whitespace collapse, so surface
    forms join to alias_norm exactly as the linker's token-trie does."""
    return (
        "trim(regexp_replace(lower(replace(replace(replace("
        f"{col}, chr(10), ' '), '.', ''), '-', ' ')), ' +', ' ', 'g'))"
    )


def _ppr_sql(c01: str, iters: int = 10, n_seeds: int = 4) -> str:
    """Unrolled personalized-PageRank oracle: the kg_pagerank CTE chain
    with teleport mass restricted to the md5-smallest seed set."""
    head = f"""
        WITH edges AS (
            SELECT h_qid AS src, t_qid AS dst
            FROM read_parquet('{c01}/kg_triples.parquet')),
        nodes AS (
            SELECT DISTINCT q FROM (
                SELECT src AS q FROM edges
                UNION ALL SELECT dst FROM edges)),
        seeds AS (SELECT q FROM nodes ORDER BY md5(q), q LIMIT {n_seeds}),
        ns AS (SELECT count(*) AS k FROM seeds),
        outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        r0 AS (SELECT n.q,
                      CASE WHEN s.q IS NOT NULL
                           THEN 1.0 / (SELECT k FROM ns) ELSE 0.0 END AS r
               FROM nodes n LEFT JOIN seeds s ON s.q = n.q)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f""",
        r{i} AS (
            SELECT n.q,
                   (CASE WHEN s.q IS NOT NULL
                         THEN 0.15 / (SELECT k FROM ns) ELSE 0.0 END)
                       + 0.85 * coalesce(c.contrib, 0.0) AS r
            FROM nodes n
            LEFT JOIN seeds s ON s.q = n.q
            LEFT JOIN (
                SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                FROM edges e
                JOIN r{i - 1} p ON p.q = e.src
                JOIN outdeg od ON od.src = e.src
                GROUP BY 1) c ON c.q = n.q)"""
        )
    tail = f"""
        SELECT q AS qid,
               floor(r * 1000000 + 0.501) / 1000000 AS rank
        FROM r{iters}
        WHERE floor(r * 1000000 + 0.501) / 1000000 > 0.0"""
    return head + "".join(steps) + tail


def _hits_sql(c01: str, iters: int = 5) -> str:
    """Unrolled HITS oracle over the gold triple table — same shape as
    the kg_pagerank oracle. MATERIALIZED on every iteration CTE: each
    is referenced twice downstream and DuckDB would otherwise inline
    (re-evaluate) the whole chain exponentially."""
    from kire_ray.functions.rounding import sql_round

    parts = [
        f"""
        WITH hedges AS (SELECT h_qid AS src, t_qid AS dst
                        FROM read_parquet('{c01}/kg_triples.parquet')),
        hnodes AS (SELECT DISTINCT q FROM (
            SELECT src AS q FROM hedges UNION ALL SELECT dst FROM hedges)),
        hnn AS (SELECT count(*) AS n FROM hnodes),
        h0 AS (SELECT q, 1.0 / (SELECT n FROM hnn) AS r FROM hnodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
        a{i}raw AS MATERIALIZED (
            SELECT e.dst AS q, sum(p.r) AS c
            FROM hedges e JOIN h{i-1} p ON p.q = e.src GROUP BY 1),
        a{i} AS MATERIALIZED (
            SELECT n.q, coalesce(r.c, 0.0) / (SELECT sum(c) FROM a{i}raw) AS r
            FROM hnodes n LEFT JOIN a{i}raw r USING (q)),
        h{i}raw AS MATERIALIZED (
            SELECT e.src AS q, sum(p.r) AS c
            FROM hedges e JOIN a{i} p ON p.q = e.dst GROUP BY 1),
        h{i} AS MATERIALIZED (
            SELECT n.q, coalesce(r.c, 0.0) / (SELECT sum(c) FROM h{i}raw) AS r
            FROM hnodes n LEFT JOIN h{i}raw r USING (q))"""
        )
    parts.append(
        f"""
        SELECT a.q AS qid, {sql_round('a.r', 6)} AS auth,
               {sql_round('h.r', 6)} AS hub
        FROM a{iters} a JOIN h{iters} h USING (q)"""
    )
    return "".join(parts)


def _reach_sql(c01: str, prop: str = "P1", depth: int = 4) -> str:
    """Unrolled bounded transitive-closure oracle with a min-dist fold
    (Bellman-Ford rounds) — mirrors kg_profile.reachability's
    semi-naive result exactly: every pair at its shortest distance."""
    parts = [
        f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT h_qid AS s, t_qid AS t
            FROM read_parquet('{c01}/kg_triples.parquet')
            WHERE prop = '{prop}' AND h_qid != t_qid),
        r1 AS (SELECT s, t, 1 AS d FROM e)"""
    ]
    for i in range(2, depth + 1):
        parts.append(
            f""",
        r{i} AS (SELECT s, t, min(d) AS d FROM (
            SELECT * FROM r{i - 1}
            UNION ALL
            SELECT r.s, e.t, r.d + 1 FROM r{i - 1} r JOIN e ON e.s = r.t
            WHERE e.t != r.s) GROUP BY s, t)"""
        )
    return (
        "".join(parts)
        + f"""
        SELECT s AS src, t AS dst, CAST(d AS BIGINT) AS dist FROM r{depth}"""
    )


def _hyperball_sql(c01: str, radii: int = 3) -> str:
    """Unrolled HyperBall oracle: the md5 60-bit register scheme of
    hll_distinct_users' oracle, iterated as register max-joins over
    out-edges, with the identical estimate arithmetic per radius."""
    from kire_ray.functions.rounding import sql_round

    mask = "((CAST(1 AS BIGINT) << 50) - 1)"
    parts = [
        f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT h_qid AS v, t_qid AS w
            FROM read_parquet('{c01}/kg_triples.parquet')
            WHERE h_qid != t_qid),
        nodes AS (SELECT DISTINCT q
                  FROM (SELECT v AS q FROM e UNION ALL SELECT w FROM e)),
        hh AS (SELECT q, CAST(('0x' || substr(md5(q), 1, 15)) AS BIGINT) AS h
               FROM nodes),
        r0 AS MATERIALIZED (
            SELECT q AS node, h >> 50 AS bucket,
                   CASE WHEN (h & {mask}) = 0 THEN 51
                        ELSE 51 - length(bin(h & {mask})) END AS rho
            FROM hh)"""
    ]
    for i in range(1, radii + 1):
        parts.append(
            f""",
        r{i} AS MATERIALIZED (
            SELECT node, bucket, max(rho) AS rho FROM (
                SELECT * FROM r{i - 1}
                UNION ALL
                SELECT e.v AS node, r.bucket, r.rho
                FROM r{i - 1} r JOIN e ON e.w = r.node)
            GROUP BY node, bucket)"""
        )
    sel = " UNION ALL ".join(
        f"""
            SELECT node, {i} AS radius,
                   sum(power(2.0, -rho)) + (1024 - count(*)) AS s,
                   1024 - count(*) AS v0
            FROM r{i} GROUP BY node"""
        for i in range(0, radii + 1)
    )
    branch = (
        "CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0 "
        "THEN 1024.0 * ln(1024.0 / v0) ELSE e_raw END"
    )
    return (
        "".join(parts)
        + f""",
        agg AS ({sel}),
        est AS (SELECT node, radius,
                       (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw,
                       v0
                FROM agg)
        SELECT node AS qid, CAST(radius AS BIGINT) AS radius,
               {sql_round(branch, 6)} AS estimate
        FROM est"""
    )


def _walks_sql(c01: str, walks_per_node: int = 2, walk_len: int = 3) -> str:
    """Unrolled deterministic-DeepWalk oracle: per step, the walker
    joins the ranked adjacency on rn == md5(start|w|s|cur) % deg —
    exactly pipelines/graph_algos.random_walks."""
    wlist = ", ".join(str(i) for i in range(1, walks_per_node + 1))
    parts = [
        f"""
        WITH rwdd AS (SELECT DISTINCT h_qid AS src, t_qid AS dst
                      FROM read_parquet('{c01}/kg_triples.parquet')),
        rwadj AS (SELECT src, dst,
                         row_number() OVER (PARTITION BY src ORDER BY dst) - 1
                             AS rn,
                         count(*) OVER (PARTITION BY src) AS deg
                  FROM rwdd),
        rws0 AS (SELECT start_qid, w, start_qid AS cur
                 FROM (SELECT DISTINCT src AS start_qid FROM rwadj)
                 CROSS JOIN (SELECT unnest([{wlist}]) AS w))"""
    ]
    for s in range(1, walk_len + 1):
        parts.append(
            f""",
        rws{s} AS MATERIALIZED (
            SELECT s.start_qid, s.w, a.dst AS cur
            FROM rws{s-1} s JOIN rwadj a ON a.src = s.cur
             AND a.rn = ('0x' || substr(md5(s.start_qid || '|' || s.w
                    || '|{s}|' || s.cur), 1, 13))::BIGINT % a.deg)"""
        )
    selects = [
        f"""
        SELECT start_qid, CAST(w AS BIGINT) AS walk,
               CAST({s} AS BIGINT) AS step, cur AS qid FROM rws{s}"""
        for s in range(0, walk_len + 1)
    ]
    parts.append(" UNION ALL ".join(selects))
    return "".join(parts)


def _kg_chain_sql(c01: str, max_ent: int = 42, docred: bool = False) -> str:
    """The flagship chain as one SQL CTE prefix (WITH RECURSIVE … ,
    triples AS (…)) over the gold parquet — the driver-side oracle of
    kg_triples / kg_edges / kg_nodes / kg_linked_docs / the eval rows.

    Reconstructs, stage for stage:
    - P_eq union-find closure → lexicographic-min representative
      (stages/canonicalize.py:33) as a recursive transitive closure;
    - mention→candidate lookup (normalized surface = alias_norm,
      stages/linking.py build_alias_trie/detect_mentions — the scan is
      span-exact vs planted gold, see kg_mentions_flat);
    - per-mention vote = first (= lexicographic min) candidate,
      majority vote per cluster with first-seen tie-break
      (linking.py cluster_and_vote), canon-mapped; unlinked clusters
      get the md5 NT id (functions/hashing.py nt_id);
    - the scorer's keep filter (NT / 'time'-typed entities dropped),
      evidence join against the canonicalized KG, md5 pair scores,
      top-4 per pair, adaptive threshold (stages/scorer.py).
    All md5-derived, so every value is bit-exact vs the pipeline.

    ``docred=True`` swaps the vote for the DocRED reader's rule
    (sources/docred.py:_vote_vertex, gen_kg_data.py:272-304): a
    mention's candidate is the document-provided ``link`` when the
    entity is linkable (every mention of a linkable vertex carries it,
    so the winner is the gold qid) and the first (= min) alias
    candidate otherwise — which is exactly why docred_triples and
    kg_triples legitimately differ on ambiguous-alias clusters."""
    n_surf = _sql_norm("surface")
    n_alias = _sql_norm("alias_norm")
    n_fsurf = _sql_norm("d.fsurf")
    if docred:
        vote_expr = "CASE WHEN ge.linkable THEN ge.qid ELSE w.vote END"
        ge_join = f"""
           JOIN read_parquet('{c01}/gold_entities.parquet') ge
             ON ge.doc_id = d.doc_id AND ge.ent_idx = d.ent_idx"""
    else:
        vote_expr = "w.vote"
        ge_join = ""
    return f"""
WITH RECURSIVE
kg AS (SELECT * FROM read_parquet('{c01}/kg_triples.parquet')),
eq_edges AS (SELECT h_qid AS a, t_qid AS b FROM kg WHERE prop = 'P_eq'
             UNION SELECT t_qid, h_qid FROM kg WHERE prop = 'P_eq'),
reach(a, b) AS (
    SELECT a, b FROM eq_edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN eq_edges e ON e.a = r.b
    WHERE e.b <> r.a),
canon AS (SELECT a AS qid, least(min(b), a) AS rep FROM reach GROUP BY a),
gm AS (SELECT * FROM read_parquet('{c01}/gold_mentions.parquet')),
al AS (SELECT {n_alias} AS k, qid
       FROM read_parquet('{c01}/kg_alias.parquet')),
firsts AS (SELECT doc_id, ent, min(turn_idx * 1000000 + start) AS fp,
                  arg_min(surface, turn_idx * 1000000 + start) AS fsurf,
                  count(*) AS nm
           FROM gm GROUP BY doc_id, ent),
dense AS (SELECT doc_id, ent, fsurf, nm,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY fp, ent) - 1 AS ent_idx
          FROM firsts),
mn AS (SELECT doc_id, ent, turn_idx, start, {n_surf} AS k FROM gm),
mv AS (SELECT mn.doc_id, mn.ent, mn.turn_idx, mn.start, min(al.qid) AS vote
       FROM mn JOIN al ON al.k = mn.k GROUP BY 1, 2, 3, 4),
vc AS (SELECT doc_id, ent, vote, count(*) AS n,
              min(turn_idx * 1000000 + start) AS fpos
       FROM mv GROUP BY 1, 2, 3),
win AS (SELECT doc_id, ent, vote FROM vc
        QUALIFY row_number() OVER (PARTITION BY doc_id, ent
                                   ORDER BY n DESC, fpos ASC) = 1),
entall AS (SELECT d.doc_id, d.ent_idx,
                  coalesce(c.rep, {vote_expr},
                           'NT' || substr(md5({n_fsurf}), 1, 16)) AS qid,
                  {n_fsurf} AS label, d.nm
           FROM dense d{ge_join}
           LEFT JOIN win w ON w.doc_id = d.doc_id AND w.ent = d.ent
           LEFT JOIN canon c ON c.qid = {vote_expr}),
etype AS (SELECT qid, min(attr_val) AS t
          FROM read_parquet('{c01}/kg_attrs.parquet')
          WHERE attr_key = 'instance of' GROUP BY qid),
kept AS (SELECT e.doc_id, e.ent_idx, e.qid
         FROM entall e LEFT JOIN etype ty ON ty.qid = e.qid
         WHERE e.ent_idx < {max_ent}
           AND e.qid NOT LIKE 'NT%' AND coalesce(ty.t, '') <> 'time'),
ev AS (SELECT DISTINCT coalesce(ch.rep, kg.h_qid) AS h, kg.prop AS r,
                       coalesce(ct.rep, kg.t_qid) AS t
       FROM kg
       LEFT JOIN canon ch ON ch.qid = kg.h_qid
       LEFT JOIN canon ct ON ct.qid = kg.t_qid
       WHERE kg.prop <> 'P_eq'),
scored AS (
    SELECT h.doc_id, h.ent_idx AS h_idx, t.ent_idx AS t_idx,
           h.qid AS subj_qid, ev.r AS pred, t.qid AS obj_qid,
           2.0 + 0.5 * (CAST(('0x' || substr(md5(h.qid || '|' || ev.r
                             || '|' || t.qid), 1, 13)) AS BIGINT)
                        / 4503599627370496.0) AS score,
           1.0 + 0.5 * (CAST(('0x' || substr(md5('TH|' || h.qid || '|'
                             || t.qid), 1, 13)) AS BIGINT)
                        / 4503599627370496.0) AS th
    FROM kept h
    JOIN kept t ON t.doc_id = h.doc_id AND t.ent_idx <> h.ent_idx
               AND t.qid <> h.qid
    JOIN ev ON ev.h = h.qid AND ev.t = t.qid),
triples AS (
    SELECT doc_id, CAST(h_idx AS INT) AS h_idx, CAST(t_idx AS INT) AS t_idx,
           subj_qid, pred, obj_qid, score
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id, h_idx, t_idx
                               ORDER BY score DESC, pred ASC) <= 4
       AND score > th)
"""


_LANG_ID_SQL_BODY = """
    WITH tri AS (
        SELECT doc_id, lang, substring(text, i, 3) AS tri
        FROM (SELECT doc_id, lang, text,
                     unnest(generate_series(1, length(text) - 2)) AS i
              FROM documents WHERE length(text) >= 3)),
    prof AS (
        SELECT lang, tri FROM (
            SELECT lang, tri,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY count(*) DESC, tri) AS rn
            FROM tri GROUP BY lang, tri)
        WHERE rn <= 200),
    dt AS (SELECT DISTINCT doc_id, tri FROM tri),
    sc AS (
        SELECT dt.doc_id, p.lang, count(*) AS n_hits
        FROM dt JOIN prof p USING (tri)
        GROUP BY 1, 2),
    best AS (
        SELECT doc_id, lang AS pred_lang, n_hits,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n_hits DESC, lang) AS rn
        FROM sc)
"""


def oracle_sql() -> dict[str, str]:
    """Static SQL strings, one per SQL-verified query.

    Corpus-side oracles (kg_assembled_turns / kg_mentions_flat / kg_doc_subwords_flat /
    glre_pairs_flat / pubtator_docs_flat / doc_word_ids_flat / kg_pagerank / kg_triangles / kg_kcore / kg_bfs_levels / kg_comention / kg_communities) read the synthetic corpus'
    gold parquet via its deterministic path. SQL strings carry no sf
    parameter, so these (plus frame_sample / audio_chunk, which read
    the persisted media metadata) are bound to sf0.01 — the scale the
    driver's correctness compare runs at; comparing them at another sf
    is out of contract (the per-sf view-bound oracles are unaffected).
    Calling this function materializes the sf0.01 corpus cache if
    missing (idempotent, seconds) so query/oracle ordering cannot race.
    They also reconstruct only gold-consistent corpora: exact-duplicate
    label rows are deduped on both sides, and mentions/labels always
    reference mentioned entities (guaranteed by the generator).
    """
    from kire_ray.functions.rounding import sql_round

    nq, k = N_ANN_QUERIES, ANN_K
    bm25_qt = ", ".join(
        f"({qi}, '{t}')"
        for qi, q in enumerate(BM25_QUERIES)
        for t in sorted(set(q.split()))
    )
    c01 = _corpus("/root/testdata/sf0.01")
    media01 = _media_meta("/root/testdata/sf0.01")
    d = {
        "kg_assembled_turns": f"""
            SELECT conv_id AS doc_id,
                   CAST(turn_idx AS BIGINT) AS turn_idx,
                   text
            FROM read_parquet('{c01}/transcripts.parquet/*.parquet')
        """,
        "train_label_pick": f"""
            WITH tlp AS (
                SELECT doc_id, h_idx, t_idx, r,
                       row_number() OVER (
                           PARTITION BY doc_id, h_idx, t_idx ORDER BY r
                       ) - 1 AS rn,
                       count(*) OVER (
                           PARTITION BY doc_id, h_idx, t_idx
                       ) AS n
                FROM read_parquet('{c01}/gold_labels.parquet'))
            SELECT doc_id, CAST(h_idx AS BIGINT) AS h_idx,
                   CAST(t_idx AS BIGINT) AS t_idx, r AS picked_r,
                   CAST(n AS BIGINT) AS n_labels
            FROM tlp
            WHERE rn = ((strpos('0123456789abcdef', substr(md5(doc_id || '|' || CAST(h_idx AS VARCHAR) || '|' || CAST(t_idx AS VARCHAR)), 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(md5(doc_id || '|' || CAST(h_idx AS VARCHAR) || '|' || CAST(t_idx AS VARCHAR)), 2, 1)) - 1) % n
        """,
        "tool_usage_stats": f"""
            WITH tus_t AS (SELECT role, COALESCE(tool, 'none') AS tool, conv_id,
                                  len(string_split(text, ' ')) AS nw
                           FROM read_parquet('{c01}/transcripts.parquet/*.parquet'))
            SELECT role, tool,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
                   {sql_round('sum(nw) * 1.0 / count(*)', 6)} AS avg_words
            FROM tus_t
            GROUP BY role, tool
        """,
        "conv_flows": f"""
            WITH cfl AS (
                SELECT conv_id,
                       string_agg(role || ':' || COALESCE(tool, 'none'), '>'
                                  ORDER BY turn_idx) AS flow
                FROM read_parquet('{c01}/transcripts.parquet/*.parquet')
                GROUP BY conv_id)
            SELECT flow,
                   CAST(len(string_split(flow, '>')) AS BIGINT) AS n_turns,
                   CAST(count(*) AS BIGINT) AS n_convs,
                   min(conv_id) AS sample_conv
            FROM cfl GROUP BY flow
        """,
        "role_transitions": f"""
            WITH rt_l AS (SELECT conv_id, role,
                                 lead(role) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS role_to
                          FROM read_parquet('{c01}/transcripts.parquet/*.parquet'))
            SELECT role AS role_from, role_to,
                   CAST(count(*) AS BIGINT) AS n
            FROM rt_l
            WHERE role_to IS NOT NULL
            GROUP BY 1, 2
        """,
        "conv_stats": f"""
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
                   CAST(count(tool) AS BIGINT) AS n_tool_turns,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
                   CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                        AS BIGINT) AS duration_s
            FROM read_parquet('{c01}/transcripts.parquet/*.parquet')
            GROUP BY conv_id
        """,
        "turn_latency": f"""
            WITH tl_g AS (SELECT role,
                                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                                     PARTITION BY conv_id ORDER BY turn_idx)
                                     AS gap_us
                          FROM read_parquet('{c01}/transcripts.parquet/*.parquet'))
            SELECT role,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   {sql_round('sum(gap_us) / count(*) / 1e6', 6)} AS mean_gap_s,
                   {sql_round('quantile_cont(gap_us, 0.5) / 1e6', 6)} AS p50_gap_s,
                   {sql_round('quantile_cont(gap_us, 0.95) / 1e6', 6)} AS p95_gap_s
            FROM tl_g
            WHERE gap_us IS NOT NULL
            GROUP BY role
        """,
        "tool_chains": f"""
            WITH tc_c AS (SELECT conv_id,
                                 string_agg(tool, '>' ORDER BY turn_idx) AS chain
                          FROM read_parquet('{c01}/transcripts.parquet/*.parquet')
                          WHERE tool IS NOT NULL
                          GROUP BY conv_id)
            SELECT chain, CAST(count(*) AS BIGINT) AS n_convs
            FROM tc_c
            GROUP BY chain
        """,
        "conv_segments": f"""
            WITH cs_t AS (SELECT conv_id,
                                 row_number() OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS pos,
                                 text
                          FROM read_parquet('{c01}/transcripts.parquet/*.parquet')),
            cs_w AS (SELECT DISTINCT conv_id, pos, word
                     FROM (SELECT conv_id, pos,
                                  unnest(string_split(text, ' ')) AS word
                           FROM cs_t)),
            cs_d AS (SELECT conv_id, pos, count(*) AS nw
                     FROM cs_w GROUP BY 1, 2),
            cs_i AS (SELECT a.conv_id, a.pos, count(*) AS inter
                     FROM cs_w a
                     JOIN cs_w b ON b.conv_id = a.conv_id
                                AND b.pos = a.pos + 1 AND b.word = a.word
                     GROUP BY 1, 2),
            cs_p AS (SELECT d1.conv_id,
                            coalesce(i.inter, 0) AS inter,
                            d1.nw + d2.nw - coalesce(i.inter, 0) AS uni
                     FROM cs_d d1
                     JOIN cs_d d2 ON d2.conv_id = d1.conv_id
                                 AND d2.pos = d1.pos + 1
                     LEFT JOIN cs_i i ON i.conv_id = d1.conv_id
                                     AND i.pos = d1.pos),
            cs_n AS (SELECT conv_id, count(*) AS n_turns
                     FROM cs_t GROUP BY conv_id)
            SELECT p.conv_id,
                   CAST(n.n_turns AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN p.inter = 0 THEN 1 ELSE 0 END) + 1
                        AS BIGINT) AS n_segments,
                   {sql_round('avg(p.inter * 1.0 / p.uni)', 6)} AS mean_jacc
            FROM cs_p p JOIN cs_n n ON n.conv_id = p.conv_id
            GROUP BY p.conv_id, n.n_turns
        """,
        "kg_mentions_flat": f"""
            SELECT doc_id,
                   CAST(turn_idx AS BIGINT) AS turn_idx,
                   CAST(start AS BIGINT) AS start,
                   CAST("end" AS BIGINT) AS "end",
                   surface
            FROM read_parquet('{c01}/gold_mentions.parquet')
        """,
        "kg_triples": _kg_chain_sql(c01)
        + """
            SELECT doc_id, h_idx, t_idx, subj_qid, pred, obj_qid, score
            FROM triples
        """,
        "doc_chunk_stitch": f"""
            WITH tr AS (SELECT conv_id AS doc_id, turn_idx,
                               string_split(text, ' ') AS ws
                        FROM read_parquet('{c01}/transcripts.parquet/*.parquet')),
            tlen AS (SELECT doc_id, turn_idx, len(ws) AS nw FROM tr),
            toff AS (SELECT doc_id, turn_idx,
                            CAST(coalesce(sum(nw) OVER (
                                PARTITION BY doc_id ORDER BY turn_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS BIGINT)
                                AS off
                     FROM tlen),
            tok0 AS (SELECT doc_id, turn_idx, unnest(ws) AS w,
                            generate_subscripts(ws, 1) AS i
                     FROM tr),
            tok AS (SELECT t.doc_id, o.off + t.i - 1 AS pos, t.w,
                           CAST(('0x' || substr(md5(t.w), 1, 13)) AS BIGINT)
                               / 4503599627370496.0 AS u
                    FROM tok0 t
                    JOIN toff o ON o.doc_id = t.doc_id
                               AND o.turn_idx = t.turn_idx),
            dl AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            wins AS (SELECT doc_id, CAST(s AS BIGINT) AS s FROM (
                        SELECT doc_id, unnest(range(0, n - 64, 48)) AS s
                        FROM dl WHERE n > 64
                        UNION SELECT doc_id, n - 64 FROM dl WHERE n > 64
                        UNION SELECT doc_id, 0 FROM dl WHERE n <= 64) q)
            SELECT tok.doc_id, tok.pos, tok.w AS word,
                   {sql_round('sum(tok.u + (tok.pos - w.s) / 64.0) / count(*)', 6)}
                       AS enc
            FROM tok JOIN wins w ON w.doc_id = tok.doc_id
                                AND tok.pos >= w.s AND tok.pos < w.s + 64
            GROUP BY tok.doc_id, tok.pos, tok.w
        """,
        "kg_triples_dwie": _kg_chain_sql(_dwie_corpus(), max_ent=100)
        + """
            SELECT doc_id, h_idx, t_idx, subj_qid, pred, obj_qid, score
            FROM triples
        """,
        "kg_coref_pairs": _kg_chain_sql(c01)
        + f"""
            , tl AS (SELECT conv_id AS doc_id, turn_idx,
                            len(string_split(text, ' ')) AS nw
                     FROM read_parquet('{c01}/transcripts.parquet/*.parquet')),
            toff AS (SELECT doc_id, turn_idx,
                            CAST(coalesce(sum(nw) OVER (
                                PARTITION BY doc_id ORDER BY turn_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS BIGINT)
                                AS off
                     FROM tl),
            mg AS (SELECT m.doc_id, m.ent,
                          o.off + m.start AS gs, o.off + m."end" AS ge,
                          lower(m.surface) AS ls
                   FROM gm m
                   JOIN toff o ON o.doc_id = m.doc_id
                              AND o.turn_idx = m.turn_idx),
            ast AS (SELECT qid, lower(attr_val) AS s
                    FROM read_parquet('{c01}/kg_attrs.parquet')
                    WHERE attr_key IN ('label', 'alias')),
            -- per-cluster position set: alias-string occurrences (all
            -- occurrences are planted mention spans — filler tokens
            -- never collide with name tokens) ∪ own mention spans
            pose AS (SELECT DISTINCT doc_id, ent_idx, gs, ge FROM (
                       SELECT e.doc_id, e.ent_idx, m2.gs, m2.ge
                       FROM entall e
                       JOIN ast a ON a.qid = e.qid
                       JOIN mg m2 ON m2.doc_id = e.doc_id AND m2.ls = a.s
                     UNION ALL
                       SELECT d.doc_id, d.ent_idx, m.gs, m.ge
                       FROM mg m
                       JOIN dense d ON d.doc_id = m.doc_id
                                   AND d.ent = m.ent) q),
            alias_rows AS (
                SELECT p1.doc_id, p1.ent_idx,
                       p1.gs AS h_start, p1.ge AS h_end,
                       p2.gs AS t_start, p2.ge AS t_end,
                       0.9 AS score, -1 AS rank, 'alias' AS source
                FROM pose p1
                JOIN pose p2 ON p2.doc_id = p1.doc_id
                            AND p2.ent_idx = p1.ent_idx
                            AND NOT (p1.gs = p2.gs AND p1.ge = p2.ge)),
            ap AS (SELECT doc_id, gs, ge,
                          row_number() OVER (PARTITION BY doc_id
                                             ORDER BY gs, ge) - 1 AS pi
                   FROM (SELECT DISTINCT doc_id, gs, ge FROM pose) q
                   QUALIFY row_number() OVER (PARTITION BY doc_id
                                              ORDER BY gs, ge) <= 250),
            cand AS (SELECT a.doc_id, a.pi AS i, b.pi AS j,
                            a.gs AS gs_i, a.ge AS ge_i,
                            b.gs AS gs_j, b.ge AS ge_j,
                            ((CAST(('0x' || substr(md5(
                                a.doc_id || '|'
                                || CAST(least(a.gs, b.gs) AS VARCHAR) || ','
                                || CAST(CASE WHEN a.gs < b.gs OR (a.gs = b.gs
                                             AND a.ge < b.ge)
                                        THEN a.ge ELSE b.ge END AS VARCHAR)
                                || '|'
                                || CAST(greatest(a.gs, b.gs) AS VARCHAR) || ','
                                || CAST(CASE WHEN a.gs < b.gs OR (a.gs = b.gs
                                             AND a.ge < b.ge)
                                        THEN b.ge ELSE a.ge END AS VARCHAR)
                              ), 1, 13)) AS BIGINT)
                              / 4503599627370496.0 - 0.5) * 8.0) AS logit
                     FROM ap a
                     JOIN ap b ON b.doc_id = a.doc_id AND b.pi <> a.pi),
            top8 AS (SELECT *,
                            row_number() OVER (PARTITION BY doc_id, i
                                               ORDER BY logit DESC, j ASC)
                                AS rj
                     FROM cand
                     QUALIFY rj <= 8),
            emits AS (SELECT * FROM top8 WHERE gs_i <> gs_j),
            cev AS (SELECT doc_id, i AS a, j AS b, logit,
                          i * 100000 + rj AS k FROM emits
                   UNION ALL
                   SELECT doc_id, j, i, logit, i * 100000 + rj FROM emits),
            fe AS (SELECT doc_id, a, b, min(k) AS k, min(logit) AS logit
                   FROM cev GROUP BY 1, 2, 3),
            scored_rows AS (
                SELECT fe.doc_id, -1 AS ent_idx,
                       pa.gs AS h_start, pa.ge AS h_end,
                       pb.gs AS t_start, pb.ge AS t_end,
                       {sql_round('1.0 / (1.0 + exp(-fe.logit))', 6)} AS score,
                       row_number() OVER (PARTITION BY fe.doc_id, fe.a
                                          ORDER BY fe.k) - 1 AS rank,
                       'scored' AS source
                FROM fe
                JOIN ap pa ON pa.doc_id = fe.doc_id AND pa.pi = fe.a
                JOIN ap pb ON pb.doc_id = fe.doc_id AND pb.pi = fe.b)
            SELECT doc_id, CAST(ent_idx AS INT) AS ent_idx,
                   CAST(h_start AS INT) AS h_start,
                   CAST(h_end AS INT) AS h_end,
                   CAST(t_start AS INT) AS t_start,
                   CAST(t_end AS INT) AS t_end,
                   score, CAST(rank AS INT) AS rank, source
            FROM (SELECT * FROM alias_rows UNION ALL
                  SELECT * FROM scored_rows) allrows
        """,
        "doc_token_tags_flat": _kg_chain_sql(c01)
        + f"""
            , tl AS (SELECT conv_id AS doc_id, turn_idx,
                            string_split(text, ' ') AS ws
                     FROM read_parquet('{c01}/transcripts.parquet/*.parquet')),
            toff AS (SELECT doc_id, turn_idx,
                            CAST(coalesce(sum(len(ws)) OVER (
                                PARTITION BY doc_id ORDER BY turn_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS BIGINT)
                                AS off
                     FROM tl),
            tok AS (SELECT t.doc_id, o.off + u.i - 1 AS pos
                    FROM (SELECT doc_id, turn_idx, unnest(ws) AS w,
                                 generate_subscripts(ws, 1) AS i
                          FROM tl) u
                    JOIN tl t ON t.doc_id = u.doc_id
                             AND t.turn_idx = u.turn_idx
                    JOIN toff o ON o.doc_id = u.doc_id
                               AND o.turn_idx = u.turn_idx),
            mgx AS (SELECT m.doc_id, d.ent_idx,
                           o.off + m.start AS gs, o.off + m."end" AS ge
                    FROM gm m
                    JOIN toff o ON o.doc_id = m.doc_id
                               AND o.turn_idx = m.turn_idx
                    JOIN dense d ON d.doc_id = m.doc_id AND d.ent = m.ent),
            nid AS (SELECT e.doc_id, e.ent_idx,
                           CASE upper(coalesce(ty.t, ''))
                                WHEN 'PER' THEN 2 WHEN 'ORG' THEN 3
                                WHEN 'LOC' THEN 4 WHEN 'MISC' THEN 5
                                WHEN 'TIME' THEN 6 WHEN 'NUM' THEN 7
                                ELSE 0 END AS ner
                    FROM entall e
                    LEFT JOIN etype ty ON ty.qid = e.qid)
            SELECT tok.doc_id, tok.pos,
                   CAST(coalesce(n.ner, 0) AS BIGINT) AS ner_id,
                   CAST(coalesce(m.ent_idx + 1, 0) AS BIGINT) AS ent_id
            FROM tok
            LEFT JOIN mgx m ON m.doc_id = tok.doc_id
                           AND tok.pos >= m.gs AND tok.pos < m.ge
            LEFT JOIN nid n ON n.doc_id = tok.doc_id
                           AND n.ent_idx = m.ent_idx
        """,
        "doc_pair_dis_flat": _kg_chain_sql(c01)
        + f"""
            , tl AS (SELECT conv_id AS doc_id, turn_idx,
                            len(string_split(text, ' ')) AS nw
                     FROM read_parquet('{c01}/transcripts.parquet/*.parquet')),
            toff AS (SELECT doc_id, turn_idx,
                            CAST(coalesce(sum(nw) OVER (
                                PARTITION BY doc_id ORDER BY turn_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS BIGINT)
                                AS off
                     FROM tl),
            fp AS (SELECT m.doc_id, d.ent_idx,
                          min(o.off + m.start) AS p
                   FROM gm m
                   JOIN toff o ON o.doc_id = m.doc_id
                              AND o.turn_idx = m.turn_idx
                   JOIN dense d ON d.doc_id = m.doc_id AND d.ent = m.ent
                   WHERE d.ent_idx < 42
                   GROUP BY 1, 2),
            pr AS (SELECT h.doc_id, h.ent_idx AS h, t.ent_idx AS t,
                          h.p - t.p AS delta, abs(h.p - t.p) AS ad
                   FROM fp h
                   JOIN fp t ON t.doc_id = h.doc_id
                            AND t.ent_idx <> h.ent_idx)
            SELECT doc_id, h, t,
                   CAST(sign(delta) * (CASE
                        WHEN ad = 0 THEN 0 WHEN ad < 2 THEN 1
                        WHEN ad < 4 THEN 2 WHEN ad < 8 THEN 3
                        WHEN ad < 16 THEN 4 WHEN ad < 32 THEN 5
                        WHEN ad < 64 THEN 6 WHEN ad < 128 THEN 7
                        WHEN ad < 256 THEN 8 ELSE 9 END) + 10 AS BIGINT)
                       AS ep_dis
            FROM pr
        """,
        "doc_graphs_flat": _kg_chain_sql(c01)
        + f"""
            , g_ment AS (
                SELECT m.doc_id, d.ent_idx, m.turn_idx,
                       row_number() OVER (
                           PARTITION BY m.doc_id
                           ORDER BY m.turn_idx * 1000000 + m.start) - 1
                           AS mi
                FROM gm m
                JOIN dense d ON d.doc_id = m.doc_id AND d.ent = m.ent),
            g_sent AS (SELECT conv_id AS doc_id, count(*) AS n_t
                       FROM read_parquet(
                           '{c01}/transcripts.parquet/*.parquet')
                       GROUP BY conv_id),
            g_cnt AS (SELECT doc_id, count(*) AS n_m,
                             count(DISTINCT ent_idx) AS n_e
                      FROM g_ment GROUP BY doc_id),
            g_dim AS (SELECT s.doc_id,
                             coalesce(c.n_e, 0) AS n_e,
                             coalesce(c.n_m, 0) AS n_m,
                             s.n_t
                      FROM g_sent s
                      LEFT JOIN g_cnt c ON c.doc_id = s.doc_id),
            g_fwd AS (
                -- MS: mention <-> its sentence (channel 1)
                SELECT m.doc_id, g.n_e + m.mi AS a,
                       g.n_e + g.n_m + m.turn_idx AS b, 1 AS ch
                FROM g_ment m JOIN g_dim g ON g.doc_id = m.doc_id
                UNION ALL
                -- ME: mention <-> its entity cluster (channel 2)
                SELECT m.doc_id, g.n_e + m.mi, m.ent_idx, 2
                FROM g_ment m JOIN g_dim g ON g.doc_id = m.doc_id
                UNION ALL
                -- MM: same-turn mention pairs (channel 0)
                SELECT i.doc_id, g.n_e + i.mi, g.n_e + j.mi, 0
                FROM g_ment i
                JOIN g_ment j ON j.doc_id = i.doc_id
                             AND j.turn_idx = i.turn_idx
                             AND j.mi > i.mi
                JOIN g_dim g ON g.doc_id = i.doc_id
                UNION ALL
                -- ES: entity <-> every sentence with one of its
                -- mentions (channel 3)
                SELECT DISTINCT m.doc_id, m.ent_idx,
                       g.n_e + g.n_m + m.turn_idx, 3
                FROM g_ment m JOIN g_dim g ON g.doc_id = m.doc_id
                UNION ALL
                -- SS: consecutive sentences (channel 4)
                SELECT tr.conv_id, g.n_e + g.n_m + tr.turn_idx,
                       g.n_e + g.n_m + tr.turn_idx + 1, 4
                FROM read_parquet(
                    '{c01}/transcripts.parquet/*.parquet') tr
                JOIN g_dim g ON g.doc_id = tr.conv_id
                WHERE tr.turn_idx < g.n_t - 1)
            SELECT doc_id, CAST(a AS INT) AS src, CAST(b AS INT) AS dst,
                   CAST(ch AS INT) AS channel
            FROM g_fwd
            UNION ALL
            SELECT doc_id, CAST(b AS INT), CAST(a AS INT), CAST(ch AS INT)
            FROM g_fwd
        """,
        "kg_export_ids": _kg_chain_sql(c01)
        + """
            , d AS (SELECT DISTINCT subj_qid, pred, obj_qid FROM triples),
            tr AS (SELECT subj_qid, pred, obj_qid,
                          row_number() OVER (ORDER BY subj_qid, pred,
                                             obj_qid) AS rn
                   FROM d),
            occ AS (SELECT subj_qid AS e, rn * 2 AS k FROM tr
                    UNION ALL SELECT obj_qid, rn * 2 + 1 FROM tr),
            eids AS (SELECT e, row_number() OVER (ORDER BY min(k)) - 1 AS eid
                     FROM occ GROUP BY e),
            rids AS (SELECT pred, row_number() OVER (ORDER BY min(rn)) - 1
                             AS rid
                     FROM tr GROUP BY pred)
            SELECT tr.subj_qid, tr.pred, tr.obj_qid,
                   CAST(he.eid AS BIGINT) AS h_id,
                   CAST(r.rid AS BIGINT) AS r_id,
                   CAST(te.eid AS BIGINT) AS t_id
            FROM tr
            JOIN eids he ON he.e = tr.subj_qid
            JOIN rids r ON r.pred = tr.pred
            JOIN eids te ON te.e = tr.obj_qid
        """,
        "kg_edges": _kg_chain_sql(c01)
        + """
            SELECT subj_qid, pred, obj_qid, max(score) AS score,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   min(doc_id) AS first_doc
            FROM triples GROUP BY 1, 2, 3
        """,
        "kg_edge_lifespan": _kg_chain_sql(c01)
        + f"""
            , els AS (SELECT DISTINCT doc_id, subj_qid, pred, obj_qid
                      FROM triples),
            elc AS (SELECT conv_id, min(epoch_us(ts)) AS tus
                    FROM read_parquet('{c01}/transcripts.parquet/*.parquet')
                    GROUP BY conv_id)
            SELECT subj_qid, pred, obj_qid,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(tus) AS BIGINT) AS first_us,
                   CAST(max(tus) AS BIGINT) AS last_us
            FROM els JOIN elc ON elc.conv_id = els.doc_id
            GROUP BY 1, 2, 3
        """,
        "docred_triples": _kg_chain_sql(c01, docred=True)
        + """
            SELECT subj_qid, pred, obj_qid, max(score) AS score,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   min(doc_id) AS first_doc
            FROM triples GROUP BY 1, 2, 3
        """,
        "kg_nodes": _kg_chain_sql(c01)
        + """
            SELECT qid, min(label) AS label,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nm) AS BIGINT) AS n_mentions
            FROM entall GROUP BY qid
        """,
        "kg_linked_docs": _kg_chain_sql(c01)
        + f"""
            , tr AS (SELECT conv_id AS doc_id,
                            CAST(count(*) AS BIGINT) AS n_turns
                     FROM read_parquet('{c01}/transcripts.parquet/*.parquet')
                     GROUP BY 1),
            es AS (SELECT doc_id,
                          count(*) AS n_entities,
                          sum(nm) AS n_mentions,
                          sum(CASE WHEN qid NOT LIKE 'NT%'
                                   THEN 1 ELSE 0 END) AS n_linked
                   FROM entall GROUP BY doc_id)
            SELECT tr.doc_id, tr.n_turns,
                   CAST(coalesce(es.n_entities, 0) AS BIGINT) AS n_entities,
                   CAST(coalesce(es.n_mentions, 0) AS BIGINT) AS n_mentions,
                   CAST(coalesce(es.n_linked, 0) AS BIGINT) AS n_linked
            FROM tr LEFT JOIN es ON es.doc_id = tr.doc_id
        """,
        "kg_eval_prf": _kg_chain_sql(c01)
        + f"""
            , ps AS (SELECT DISTINCT subj_qid, pred, obj_qid FROM triples),
            gs AS (SELECT DISTINCT subj_qid, pred, obj_qid
                   FROM read_parquet('{c01}/gold_triples.parquet')),
            cnt AS (SELECT (SELECT count(*) FROM ps) AS np,
                           (SELECT count(*) FROM gs) AS ng,
                           (SELECT count(*) FROM ps
                            JOIN gs USING (subj_qid, pred, obj_qid)) AS tp),
            pr AS (SELECT CAST(tp AS DOUBLE) / np AS p,
                          CAST(tp AS DOUBLE) / ng AS r,
                          np, ng FROM cnt)
            SELECT {sql_round('p', 6)} AS precision,
                   {sql_round('r', 6)} AS recall,
                   {sql_round('2 * p * r / (p + r)', 6)} AS f1,
                   CAST(np AS BIGINT) AS n_pred,
                   CAST(ng AS BIGINT) AS n_gold
            FROM pr
        """,
        "kg_eval_official": _kg_chain_sql(c01)
        + f"""
            , gl AS (SELECT DISTINCT doc_id, CAST(h_idx AS INT) AS h_idx,
                            CAST(t_idx AS INT) AS t_idx, r
                     FROM read_parquet('{c01}/gold_labels.parquet')),
            pk AS (SELECT t.*,
                          CASE WHEN g.r IS NOT NULL THEN 1 ELSE 0 END AS corr,
                          CASE WHEN substr(md5(t.doc_id), 1, 2) < '80'
                               THEN 1 ELSE 0 END AS intrain
                   FROM triples t
                   LEFT JOIN gl g ON g.doc_id = t.doc_id
                                 AND g.h_idx = t.h_idx
                                 AND g.t_idx = t.t_idx AND g.r = t.pred),
            tf AS (SELECT DISTINCT subj_qid, pred, obj_qid
                   FROM pk WHERE intrain = 1),
            cit AS (SELECT count(*) AS c FROM pk
                    JOIN tf USING (subj_qid, pred, obj_qid)
                    WHERE pk.corr = 1),
            cnt AS (SELECT (SELECT count(*) FROM pk) AS np,
                           (SELECT count(*) FROM gl) AS ng,
                           (SELECT sum(corr) FROM pk) AS tp,
                           (SELECT c FROM cit) AS ct),
            pr AS (SELECT CAST(tp AS DOUBLE) / np AS p,
                          CAST(tp AS DOUBLE) / ng AS r,
                          CAST(tp - ct AS DOUBLE) / (np - ct) AS p_ign,
                          np, ng, ct FROM cnt)
            SELECT {sql_round('p', 6)} AS precision,
                   {sql_round('r', 6)} AS recall,
                   {sql_round('2 * p * r / (p + r)', 6)} AS f1,
                   CAST(np AS BIGINT) AS n_pred,
                   CAST(ng AS BIGINT) AS n_gold,
                   {sql_round('p_ign', 6)} AS ign_precision,
                   {sql_round('2 * p_ign * r / (p_ign + r)', 6)} AS ign_f1,
                   CAST(ct AS BIGINT) AS correct_in_train
            FROM pr
        """,
        "kg_theta_tuning": _kg_chain_sql(c01)
        + f"""
            , gl AS (SELECT DISTINCT doc_id, CAST(h_idx AS INT) AS h_idx,
                            CAST(t_idx AS INT) AS t_idx, r
                     FROM read_parquet('{c01}/gold_labels.parquet')),
            ng AS (SELECT greatest(count(*), 1) AS n FROM gl),
            p AS (SELECT t.score,
                         CASE WHEN g.r IS NOT NULL THEN 1.0 ELSE 0.0 END AS corr,
                         row_number() OVER (ORDER BY t.score DESC, t.doc_id,
                                            t.h_idx, t.t_idx, t.pred) AS k
                  FROM triples t
                  LEFT JOIN gl g ON g.doc_id = t.doc_id AND g.h_idx = t.h_idx
                                AND g.t_idx = t.t_idx AND g.r = t.pred),
            c AS (SELECT score, k,
                         sum(corr) OVER (ORDER BY k) AS tp
                  FROM p),
            m AS (SELECT score, k,
                         tp / CAST(k AS DOUBLE) AS prec,
                         tp / CAST((SELECT n FROM ng) AS DOUBLE) AS rec
                  FROM c),
            f AS (SELECT score, k, prec, rec,
                         CASE WHEN prec + rec > 0
                              THEN 2 * prec * rec / (prec + rec)
                              ELSE 0.0 END AS f1
                  FROM m),
            fl AS (SELECT rec, prec,
                          lag(rec) OVER (ORDER BY k) AS rec0,
                          lag(prec) OVER (ORDER BY k) AS prec0
                   FROM f),
            auc AS (SELECT sum((rec - rec0) * (prec + prec0) / 2) AS a
                    FROM fl WHERE rec0 IS NOT NULL),
            best AS (SELECT * FROM f ORDER BY f1 DESC, k ASC LIMIT 1)
            SELECT {sql_round('best.score', 6)} AS theta,
                   {sql_round('best.f1', 6)} AS best_f1,
                   {sql_round('best.prec', 6)} AS precision,
                   {sql_round('best.rec', 6)} AS recall,
                   {sql_round('(SELECT a FROM auc)', 6)} AS auc
            FROM best
        """,
        "csv_roundtrip": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        "orc_roundtrip": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        "feather_roundtrip": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        "jsonl_roundtrip": """
            SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "kg_comention": f"""
            WITH m AS (SELECT DISTINCT doc_id, surface
                       FROM read_parquet('{c01}/gold_mentions.parquet'))
            SELECT a.surface AS s1, b.surface AS s2, count(*) AS n
            FROM m a JOIN m b
              ON a.doc_id = b.doc_id AND a.surface < b.surface
            GROUP BY 1, 2
        """,
        "kg_link_prediction": f"""
            WITH m AS (SELECT DISTINCT doc_id, surface
                       FROM read_parquet('{c01}/gold_mentions.parquet')),
            e AS (SELECT a.surface AS s1, b.surface AS s2
                  FROM m a JOIN m b
                    ON a.doc_id = b.doc_id AND a.surface < b.surface
                  GROUP BY 1, 2
                  HAVING count(*) >= 2),
            u AS (SELECT s1 AS c, s2 AS nb FROM e
                  UNION ALL SELECT s2, s1 FROM e),
            deg AS (SELECT c, count(*) AS d FROM u GROUP BY c),
            w AS (SELECT a.nb AS x, b.nb AS y, a.c AS c
                  FROM u a JOIN u b ON a.c = b.c AND a.nb < b.nb),
            nw AS (SELECT w.x, w.y, count(*) AS cn,
                          sum(1.0 / ln(dc.d)) AS aa
                   FROM w JOIN deg dc ON dc.c = w.c
                   LEFT JOIN e ON e.s1 = w.x AND e.s2 = w.y
                   WHERE e.s1 IS NULL
                   GROUP BY 1, 2)
            SELECT nw.x AS s1, nw.y AS s2, cn,
                   floor((cn * 1.0 / (dx.d + dy.d - cn))
                         * 1000000 + 0.501) / 1000000 AS jaccard,
                   floor(aa * 1000000 + 0.501) / 1000000 AS adamic_adar
            FROM nw
            JOIN deg dx ON dx.c = nw.x
            JOIN deg dy ON dy.c = nw.y
            WHERE cn >= 2
        """,
        "kg_doc_subwords_flat": f"""
            SELECT conv_id AS doc_id,
                   count(*) AS n_words,
                   CAST(sum((length(word) + 7) // 8) AS BIGINT) AS n_subwords
            FROM (SELECT conv_id, unnest(string_split(text, ' ')) AS word
                  FROM read_parquet('{c01}/transcripts.parquet/*.parquet'))
            WHERE word <> ''
            GROUP BY conv_id
        """,
        "pubtator_docs_flat": f"""
            WITH gm AS (SELECT * FROM read_parquet('{c01}/gold_mentions.parquet')),
            gl AS (SELECT * FROM read_parquet('{c01}/gold_labels.parquet')),
            ge AS (SELECT * FROM read_parquet('{c01}/gold_entities.parquet')),
            tr AS (
                SELECT conv_id AS doc_id,
                       CASE WHEN max(turn_idx) > 0 THEN 2 ELSE 1 END AS n_turns
                FROM read_parquet('{c01}/transcripts.parquet/*.parquet')
                GROUP BY conv_id),
            firsts AS (
                SELECT doc_id, ent, min(turn_idx * 1000000 + start) AS fp
                FROM gm GROUP BY doc_id, ent),
            dense AS (
                SELECT doc_id, ent,
                       row_number() OVER (PARTITION BY doc_id ORDER BY fp, ent) - 1
                           AS ent_idx
                FROM firsts),
            entq AS (
                SELECT d.doc_id, d.ent, ge.qid
                FROM dense d
                JOIN ge ON ge.doc_id = d.doc_id AND ge.ent_idx = d.ent_idx),
            mcounts AS (
                SELECT gm.doc_id,
                       count(*) AS n_mentions,
                       count(DISTINCT q.qid) AS n_entities
                FROM gm JOIN entq q ON q.doc_id = gm.doc_id AND q.ent = gm.ent
                GROUP BY gm.doc_id),
            rcounts AS (
                SELECT doc_id, count(*) AS n_relations FROM gl GROUP BY doc_id)
            SELECT tr.doc_id, CAST(tr.n_turns AS BIGINT) AS n_turns,
                   CAST(coalesce(m.n_entities, 0) AS BIGINT) AS n_entities,
                   CAST(coalesce(m.n_mentions, 0) AS BIGINT) AS n_mentions,
                   CAST(coalesce(r.n_relations, 0) AS BIGINT) AS n_relations
            FROM tr
            LEFT JOIN mcounts m ON m.doc_id = tr.doc_id
            LEFT JOIN rcounts r ON r.doc_id = tr.doc_id
        """,
        "glre_pairs_flat": f"""
            WITH gm AS (SELECT * FROM read_parquet('{c01}/gold_mentions.parquet')),
            gl AS (SELECT * FROM read_parquet('{c01}/gold_labels.parquet')),
            firsts AS (
                SELECT doc_id, ent, min(turn_idx * 1000000 + start) AS fp
                FROM gm GROUP BY doc_id, ent),
            dense AS (
                SELECT doc_id, ent,
                       row_number() OVER (PARTITION BY doc_id ORDER BY fp, ent) - 1
                           AS ent_idx
                FROM firsts),
            m AS (
                SELECT gm.doc_id, d.ent_idx, gm.turn_idx, gm.surface
                FROM gm JOIN dense d ON d.doc_id = gm.doc_id AND d.ent = gm.ent),
            pairs0 AS (
                SELECT doc_id, CAST(h_idx AS BIGINT) AS h_idx,
                       CAST(t_idx AS BIGINT) AS t_idx, r AS rel
                FROM gl
                UNION ALL
                SELECT a.doc_id, a.ent_idx, b.ent_idx, 'NA'
                FROM dense a JOIN dense b
                  ON a.doc_id = b.doc_id AND a.ent_idx <> b.ent_idx
                WHERE NOT EXISTS (SELECT 1 FROM gl
                                  WHERE gl.doc_id = a.doc_id
                                    AND gl.h_idx = a.ent_idx
                                    AND gl.t_idx = b.ent_idx)),
            train_facts AS (
                SELECT DISTINCT mh.surface AS h, mt.surface AS t, gl.r AS r
                FROM gl
                JOIN m mh ON mh.doc_id = gl.doc_id AND mh.ent_idx = gl.h_idx
                JOIN m mt ON mt.doc_id = gl.doc_id AND mt.ent_idx = gl.t_idx
                WHERE substr(md5(gl.doc_id), 1, 2) < '80')
            SELECT p.doc_id, p.h_idx, p.t_idx, p.rel,
                   'L2R' AS dir,
                   CASE WHEN max(CASE WHEN mh.turn_idx = mt.turn_idx
                                      THEN 1 ELSE 0 END) = 1
                        THEN 'NON-CROSS' ELSE 'CROSS' END AS "cross",
                   CAST(min(abs(mh.turn_idx - mt.turn_idx)) AS BIGINT) AS dist,
                   max(CASE WHEN f.h IS NOT NULL THEN 1 ELSE 0 END) = 1 AS intrain
            FROM pairs0 p
            JOIN m mh ON mh.doc_id = p.doc_id AND mh.ent_idx = p.h_idx
            JOIN m mt ON mt.doc_id = p.doc_id AND mt.ent_idx = p.t_idx
            LEFT JOIN train_facts f
                   ON f.h = mh.surface AND f.t = mt.surface AND f.r = p.rel
            GROUP BY p.doc_id, p.h_idx, p.t_idx, p.rel
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   floor(sum(l_extendedprice) * 100 + 0.501) / 100 AS sum_base_price,
                   floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.501) / 100 AS revenue,
                   floor(sum(l_discount) / count(*) * 1000000 + 0.501) / 1000000 AS avg_disc,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_parts_by_revenue": """
            SELECT p.p_partkey, p.p_name, p.p_brand,
                   floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.501) / 100 AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_partkey, p.p_name, p.p_brand
            ORDER BY revenue DESC, p.p_partkey LIMIT 10
        """,
        "customer_order_totals": """
            WITH agg AS (
                SELECT o_custkey,
                       floor(sum(o_totalprice) * 100 + 0.501) / 100 AS total_spend,
                       count(*) AS n_orders
                FROM orders GROUP BY o_custkey)
            SELECT c.c_custkey, agg.total_spend, agg.n_orders, c.c_name, c.c_mktsegment
            FROM agg JOIN customer c ON agg.o_custkey = c.c_custkey
            ORDER BY agg.total_spend DESC, c.c_custkey LIMIT 20
        """,
        "supplier_nation_rollup": """
            SELECT r.r_name, count(*) AS n_suppliers,
                   floor(sum(s.s_acctbal) * 100 + 0.501) / 100 AS total_acctbal
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "events_hopping_window": """
            WITH e AS (
                SELECT event_type, epoch_us(ts) // 1000000 AS epoch, value FROM events),
            x AS (
                SELECT event_type, (epoch // 900) * 900 - 900 * j AS window_start, value
                FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) t(j))
            SELECT event_type, window_start, count(*) AS n_events,
                   floor(sum(value) * 100 + 0.501) / 100 AS sum_value
            FROM x GROUP BY event_type, window_start
        """,
        "events_tumbling_window": """
            SELECT event_type,
                   (epoch_us(ts) // 1000000 // 3600) * 3600 AS window_start,
                   count(*) AS n_events,
                   floor(sum(value) * 100 + 0.501) / 100 AS sum_value
            FROM events GROUP BY event_type, window_start
        """,
        "sessionize_events": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) // 1000000 AS epoch, value,
                       CASE WHEN epoch_us(ts) // 1000000
                                 - lag(epoch_us(ts) // 1000000)
                                   OVER (PARTITION BY user_id ORDER BY ts) > 1800
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_s
                FROM events),
            s AS (
                SELECT user_id, epoch, value,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY epoch
                                        ROWS UNBOUNDED PRECEDING) AS session
                FROM e)
            SELECT user_id,
                   min(epoch) AS session_start, max(epoch) AS session_end,
                   count(*) AS n_events,
                   floor(sum(value) * 100 + 0.501) / 100 AS sum_value
            FROM s GROUP BY user_id, session
        """,
        "distinct_order_status": """
            SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus
        """,
        "events_gap_buckets": """
            WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) // 1000000 AS epoch
                FROM events),
            g AS (
                SELECT event_type,
                       (epoch - lag(epoch) OVER (PARTITION BY user_id
                                                 ORDER BY epoch, event_type)) // 60
                           AS gap_min
                FROM e),
            b AS (
                SELECT event_type,
                       CASE WHEN gap_min < 1 THEN 0
                            WHEN gap_min < 2 THEN 1
                            WHEN gap_min < 4 THEN 2
                            WHEN gap_min < 8 THEN 3
                            WHEN gap_min < 16 THEN 4
                            WHEN gap_min < 32 THEN 5
                            WHEN gap_min < 64 THEN 6
                            WHEN gap_min < 128 THEN 7
                            WHEN gap_min < 256 THEN 8
                            ELSE 9 END AS bucket
                FROM g WHERE gap_min IS NOT NULL)
            SELECT event_type, bucket, count(*) AS n
            FROM b GROUP BY event_type, bucket
        """,
        "orders_lineitem_join_count": """
            SELECT o.o_orderstatus, count(*) AS n_lines, sum(l.l_quantity) AS sum_qty
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderstatus
        """,
        "filter_high_value_orders": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_totalprice > 200000.0 AND o_orderstatus = 'O'
        """,
        "region_nation_union": """
            SELECT r_name AS name, 'region' AS src FROM region
            UNION ALL
            SELECT n_name AS name, 'nation' AS src FROM nation
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        """,
        "price_bucket_histogram": """
            SELECT CAST(floor(log2(o_totalprice)) AS BIGINT) AS bucket, count(*) AS n
            FROM orders GROUP BY bucket
        """,
        "top_orders_per_segment": """
            WITH r AS (
                SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                       row_number() OVER (PARTITION BY c.c_mktsegment
                                          ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
            SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM r WHERE rnk <= 3
        """,
        "events_props_sum": """
            SELECT event_type,
                   CAST(sum(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "lineitem_monthly_revenue": """
            SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ship_month,
                   floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.501) / 100 AS revenue,
                   count(*) AS n_lines
            FROM lineitem GROUP BY ship_month
        """,
        "part_brand_stats": """
            SELECT p.p_brand,
                   min(l.l_extendedprice) AS min_price,
                   max(l.l_extendedprice) AS max_price,
                   count(*) AS n,
                   floor(sum(l.l_extendedprice) / count(*) * 10000 + 0.501) / 10000 AS avg_price
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
        """,
        "suppliers_with_lineitems": """
            SELECT s_suppkey, s_name, s_acctbal FROM supplier
            WHERE s_suppkey IN (SELECT DISTINCT l_suppkey FROM lineitem)
        """,
        "price_quantiles": """
            SELECT 0.25 AS q, quantile_disc(o_totalprice, 0.25) AS value FROM orders
            UNION ALL
            SELECT 0.5, quantile_disc(o_totalprice, 0.5) FROM orders
            UNION ALL
            SELECT 0.75, quantile_disc(o_totalprice, 0.75) FROM orders
            UNION ALL
            SELECT 0.9, quantile_disc(o_totalprice, 0.9) FROM orders
        """,
        "events_asof_join": """
            WITH p AS (
                SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS tus
                FROM events WHERE event_type = 'purchase'),
            v AS (
                SELECT event_id AS view_id, user_id, epoch_us(ts) AS tus
                FROM events WHERE event_type = 'view'),
            j AS (
                SELECT p.purchase_id, p.user_id, v.view_id,
                       (p.tus - v.tus) // 1000000 AS gap_s,
                       row_number() OVER (PARTITION BY p.purchase_id
                                          ORDER BY v.tus DESC, v.view_id DESC) AS rn
                FROM p JOIN v ON p.user_id = v.user_id AND v.tus <= p.tus)
            SELECT purchase_id, user_id, view_id, gap_s FROM j WHERE rn = 1
        """,
        "orders_lineitem_range_join": """
            SELECT o.o_orderkey,
                   count(*) AS n_shipped,
                   sum(l.l_quantity) AS sum_qty
            FROM orders o JOIN lineitem l
              ON epoch_us(l.l_shipdate) // 86400000000
                     >= epoch_us(o.o_orderdate) // 86400000000
             AND epoch_us(l.l_shipdate) // 86400000000
                     < epoch_us(o.o_orderdate) // 86400000000 + 7
            GROUP BY o.o_orderkey
        """,
        "events_rolling_avg": """
            SELECT event_id, user_id,
                   floor(avg(value) OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts), event_id
                                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                         * 1000000 + 0.501) / 1000000 AS rolling_avg
            FROM events
        """,
        "events_distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "orders_status_quantiles": """
            SELECT o_orderstatus, 0.5 AS q,
                   quantile_disc(o_totalprice, 0.5) AS value
            FROM orders GROUP BY o_orderstatus
            UNION ALL
            SELECT o_orderstatus, 0.9, quantile_disc(o_totalprice, 0.9)
            FROM orders GROUP BY o_orderstatus
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "bow_dedup": """
            WITH bd_b AS (SELECT doc_id,
                                 md5(array_to_string(list_sort(list_distinct(
                                     string_split(text, ' '))), ' ')) AS k,
                                 len(list_distinct(string_split(text, ' '))) AS ndw
                          FROM documents),
            bd_g AS (SELECT k, min(doc_id) AS doc_id, count(*) AS n_docs,
                            min(ndw) AS ndw
                     FROM bd_b GROUP BY k)
            SELECT doc_id, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(ndw AS BIGINT) AS n_distinct_words
            FROM bd_g WHERE n_docs >= 2
        """,
        "weighted_reservoir": """
            WITH wr AS (SELECT doc_id, source, n_chars,
                               -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                                    AS BIGINT) + 1) / 4503599627370497.0)
                                   / n_chars AS key
                        FROM documents)
            SELECT doc_id, source, n_chars
            FROM wr ORDER BY key, doc_id LIMIT 50
        """,
        "column_mi": f"""
            WITH mi_d AS (SELECT 'documents.lang|source' AS pair,
                                 lang AS x, source AS y, count(*) AS c
                          FROM documents GROUP BY 1, 2, 3),
            mi_e AS (SELECT 'events.event_type|dow' AS pair, event_type AS x,
                            CAST((epoch_us(ts) // 86400000000 + 4) % 7
                                 AS VARCHAR) AS y,
                            count(*) AS c
                     FROM events GROUP BY 1, 2, 3),
            mi_j AS (SELECT * FROM mi_d UNION ALL SELECT * FROM mi_e),
            mi_n AS (SELECT pair, sum(c) AS n FROM mi_j GROUP BY pair),
            mi_x AS (SELECT pair, x, sum(c) AS cx FROM mi_j GROUP BY 1, 2),
            mi_y AS (SELECT pair, y, sum(c) AS cy FROM mi_j GROUP BY 1, 2),
            mi_m AS (SELECT j.pair,
                            sum(j.c * 1.0 / n.n
                                * log2(j.c * 1.0 * n.n / (x.cx * 1.0 * y.cy)))
                                AS mi
                     FROM mi_j j
                     JOIN mi_n n USING (pair)
                     JOIN mi_x x ON x.pair = j.pair AND x.x = j.x
                     JOIN mi_y y ON y.pair = j.pair AND y.y = j.y
                     GROUP BY 1),
            mi_hx AS (SELECT x.pair,
                             -sum(cx * 1.0 / n.n * log2(cx * 1.0 / n.n)) AS hx
                      FROM mi_x x JOIN mi_n n USING (pair) GROUP BY 1),
            mi_hy AS (SELECT y.pair,
                             -sum(cy * 1.0 / n.n * log2(cy * 1.0 / n.n)) AS hy
                      FROM mi_y y JOIN mi_n n USING (pair) GROUP BY 1)
            SELECT m.pair, CAST(n.n AS BIGINT) AS n,
                   {sql_round('m.mi', 6)} AS mi_bits,
                   {sql_round('hx.hx', 6)} AS h_x_bits,
                   {sql_round('hy.hy', 6)} AS h_y_bits
            FROM mi_m m
            JOIN mi_n n USING (pair)
            JOIN mi_hx hx USING (pair)
            JOIN mi_hy hy USING (pair)
        """,
        "ngram_novelty": f"""
            WITH nv_w AS (SELECT doc_id, generate_subscripts(ws, 1) AS i,
                                 unnest(ws) AS w
                          FROM (SELECT doc_id, string_split(text, ' ') AS ws
                                FROM documents)),
            nv_g AS (SELECT a.doc_id,
                            a.w || ' ' || b.w || ' ' || c.w AS gram
                     FROM nv_w a
                     JOIN nv_w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                     JOIN nv_w c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            nv_p AS (SELECT DISTINCT gram FROM nv_g WHERE doc_id % 2 = 0),
            nv_n AS (SELECT DISTINCT gram FROM nv_g WHERE doc_id % 2 = 1),
            nv_x AS (SELECT count(*) AS nv FROM nv_n
                     WHERE gram NOT IN (SELECT gram FROM nv_p))
            SELECT CAST((SELECT count(*) FROM nv_p) AS BIGINT) AS n_prior_grams,
                   CAST((SELECT count(*) FROM nv_n) AS BIGINT) AS n_new_grams,
                   CAST((SELECT nv FROM nv_x) AS BIGINT) AS n_novel_grams,
                   {sql_round('(SELECT nv FROM nv_x) * 1.0 / (SELECT count(*) FROM nv_n)', 6)}
                       AS novelty_rate
        """,
        "k_anonymity": """
            WITH ka_g AS (SELECT lang, source, n_chars // 256 AS lb,
                                 count(*) AS n
                          FROM documents GROUP BY 1, 2, 3),
            ka_k(k) AS (VALUES (2), (5), (10), (20))
            SELECT CAST(k AS BIGINT) AS k,
                   CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_groups_below,
                   CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
                       AS n_rows_at_risk
            FROM ka_k CROSS JOIN ka_g
            GROUP BY k
        """,
        "events_autocorr": f"""
            WITH ac_d AS (SELECT event_type,
                                 epoch_us(ts) // 86400000000 AS day,
                                 sum(value) AS v
                          FROM events GROUP BY 1, 2),
            ac_l(lag) AS (VALUES (1), (2), (3)),
            ac_p AS (SELECT a.event_type, l.lag, a.v AS x, b.v AS y
                     FROM ac_l l
                     CROSS JOIN ac_d a
                     JOIN ac_d b ON b.event_type = a.event_type
                                AND b.day = a.day + l.lag),
            ac_s AS (SELECT event_type, lag,
                            CAST(count(*) AS DOUBLE) AS n,
                            sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                            sum(x * x) AS sxx, sum(y * y) AS syy
                     FROM ac_p GROUP BY 1, 2)
            SELECT event_type, CAST(lag AS BIGINT) AS lag,
                   CAST(n AS BIGINT) AS n,
                   {sql_round('(n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))', 6)}
                       AS corr
            FROM ac_s
            WHERE n >= 2 AND (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
        """,
        "zipf_fit": f"""
            WITH zf_wf AS (SELECT w AS word, count(*) AS n
                           FROM (SELECT unnest(string_split(text, ' ')) AS w
                                 FROM documents)
                           GROUP BY w),
            zf_xy AS (SELECT log10(CAST(row_number() OVER
                                 (ORDER BY n DESC, word) AS DOUBLE)) AS x,
                             log10(CAST(n AS DOUBLE)) AS y
                      FROM zf_wf),
            zf_s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                            sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                            sum(x * x) AS sxx, sum(y * y) AS syy
                     FROM zf_xy)
            SELECT CAST((SELECT count(*) FROM zf_wf) AS BIGINT) AS n_types,
                   CAST((SELECT sum(n) FROM zf_wf) AS BIGINT) AS n_tokens,
                   {sql_round('(n*sxy - sx*sy) / (n*sxx - sx*sx)', 6)} AS slope,
                   {sql_round('(sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n', 6)}
                       AS intercept,
                   {sql_round('((n*sxy - sx*sy) * (n*sxy - sx*sy)) / ((n*sxx - sx*sx) * (n*syy - sy*sy))', 6)}
                       AS r2
            FROM zf_s
        """,
        "key_skew_profile": f"""
            WITH ks(source, n_rows, n_keys, max_n) AS (
                {" UNION ALL ".join(
                    f"SELECT '{t}.{c}', sum(n), count(*), max(n) FROM "
                    f"(SELECT count(*) AS n FROM {t} GROUP BY {c})"
                    for t, c in (
                        ("events", "user_id"),
                        ("events", "event_type"),
                        ("orders", "o_custkey"),
                        ("lineitem", "l_orderkey"),
                        ("lineitem", "l_partkey"),
                        ("documents", "source"),
                    )
                )}
            )
            SELECT source,
                   CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(n_keys AS BIGINT) AS n_keys,
                   CAST(max_n AS BIGINT) AS max_n,
                   {sql_round('max_n * 1.0 / n_rows', 6)} AS top_share
            FROM ks
        """,
        "frame_sample": f"""
            SELECT media_id, CAST(f * 1000 AS BIGINT) AS frame_ms
            FROM (
                SELECT media_id,
                       unnest(range((greatest(duration_ms, 1) + 999) // 1000)) AS f
                FROM read_parquet('{media01}')
                WHERE kind = 'video')
        """,
        "audio_chunk": f"""
            SELECT media_id,
                   CAST(c * 5000 AS BIGINT) AS chunk_start_ms,
                   CAST(least(c * 5000 + 5000, greatest(duration_ms, 1)) AS BIGINT)
                       AS chunk_end_ms
            FROM (
                SELECT media_id, greatest(duration_ms, 1) AS duration_ms,
                       unnest(range((greatest(duration_ms, 1) + 4999) // 5000)) AS c
                FROM read_parquet('{media01}')
                WHERE kind = 'audio')
        """,
        "media_features_flat": f"""
            SELECT m.media_id,
                   CAST(r.j AS INT) AS dim,
                   CAST(('0x' || substr(md5(m.payload_md5 || ':' || r.j), 1, 13))
                        AS BIGINT) / 4503599627370496.0 AS f
            FROM read_parquet('{media01}') m
            CROSS JOIN (SELECT unnest(range(32)) AS j) r
        """,
        "image_resize_geom": f"""
            WITH g AS (
                SELECT media_id, width, height,
                       CAST(greatest(1, floor(width  * least(1.0, 224.0 / greatest(width, height)) + 0.5)) AS BIGINT) AS out_w,
                       CAST(greatest(1, floor(height * least(1.0, 224.0 / greatest(width, height)) + 0.5)) AS BIGINT) AS out_h
                FROM read_parquet('{media01}')
                WHERE kind = 'image')
            SELECT media_id, width, height,
                   CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
                   greatest(out_w * out_h // 64, 1) AS out_len
            FROM g
        """,
        "minhash_dedup": f"""
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS p
                FROM documents),
            ng AS (
                SELECT DISTINCT doc_id,
                       w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
                FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY p)
                QUALIFY g IS NOT NULL),
            sizes AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
            SELECT i.id_a, i.id_b, i.n_common,
                   sa.sz + sb.sz - i.n_common AS n_union,
                   {sql_round('i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common)', 6)}
                       AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common) >= 0.8
        """,
        "ngram_jaccard_dedup": f"""
            WITH {_NGRAM_CTES}
            SELECT i.id_a, i.id_b, i.n_common,
                   sa.sz + sb.sz - i.n_common AS n_union,
                   {sql_round('i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common)', 6)}
                       AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common) >= 0.5
        """,
        "pretrain_pack": f"""
            WITH RECURSIVE {_NGRAM_CTES},
            pairs AS (
                SELECT i.id_a, i.id_b FROM inter i
                JOIN sizes sa ON sa.doc_id = i.id_a
                JOIN sizes sb ON sb.doc_id = i.id_b
                WHERE i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common) >= 0.5
            ),
            edges AS (
                SELECT CAST(id_a AS VARCHAR) AS u, CAST(id_b AS VARCHAR) AS v FROM pairs
                UNION ALL
                SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR) FROM pairs
            ),
            reach(u, v) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                UNION
                SELECT e.u, r.v FROM edges e JOIN reach r ON r.u = e.v
            ),
            lab AS (SELECT u AS node, min(v) AS label FROM reach GROUP BY u),
            surv AS (
                SELECT d.doc_id, d.text FROM documents d
                LEFT JOIN lab ON lab.node = CAST(d.doc_id AS VARCHAR)
                WHERE lab.node IS NULL OR lab.label = lab.node),
            t AS (
                SELECT doc_id,
                       CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS BIGINT) AS n_tokens
                FROM surv),
            s AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS start
                FROM t)
            SELECT doc_id, n_tokens,
                   CAST(start // 2048 AS BIGINT) AS seq_id,
                   CAST(start % 2048 AS BIGINT) AS seq_offset
            FROM s
        """,
        "dedup_corpus": f"""
            WITH RECURSIVE {_NGRAM_CTES},
            pairs AS (
                SELECT i.id_a, i.id_b FROM inter i
                JOIN sizes sa ON sa.doc_id = i.id_a
                JOIN sizes sb ON sb.doc_id = i.id_b
                WHERE i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common) >= 0.5
            ),
            edges AS (
                SELECT CAST(id_a AS VARCHAR) AS u, CAST(id_b AS VARCHAR) AS v FROM pairs
                UNION ALL
                SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR) FROM pairs
            ),
            reach(u, v) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                UNION
                SELECT e.u, r.v FROM edges e JOIN reach r ON r.u = e.v
            ),
            lab AS (SELECT u AS node, min(v) AS label FROM reach GROUP BY u)
            SELECT d.doc_id FROM documents d
            LEFT JOIN lab ON lab.node = CAST(d.doc_id AS VARCHAR)
            WHERE lab.node IS NULL OR lab.label = lab.node
        """,
        "dup_clusters": f"""
            WITH RECURSIVE {_NGRAM_CTES},
            pairs AS (
                SELECT i.id_a, i.id_b FROM inter i
                JOIN sizes sa ON sa.doc_id = i.id_a
                JOIN sizes sb ON sb.doc_id = i.id_b
                WHERE i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common) >= 0.5
            ),
            edges AS (
                SELECT CAST(id_a AS VARCHAR) AS u, CAST(id_b AS VARCHAR) AS v FROM pairs
                UNION ALL
                SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR) FROM pairs
            ),
            reach(u, v) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                UNION
                SELECT e.u, r.v FROM edges e JOIN reach r ON r.u = e.v
            )
            SELECT u AS node, min(v) AS label FROM reach GROUP BY u
        """,
        "embedding_dedup": f"""
            WITH p AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                UNION ALL
                SELECT vec_id + {PLANT_ID_BASE}, CAST(embedding AS DOUBLE[])
                FROM embeddings WHERE vec_id < {N_PLANTED_DUPS}),
            s AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_cosine_similarity(a.v, b.v) AS cos
                FROM p a JOIN p b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b,
                   floor(cos * 1000000 + 0.501) / 1000000 AS cosine
            FROM s WHERE cos >= 0.95
        """,
        "text_metrics": """
            WITH m AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       length(replace(text, ' ', '')) AS no_space,
                       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                       len(list_filter(string_split(text, ' '),
                           x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS stop
                FROM documents),
            m2 AS (
                SELECT doc_id, n_chars, n_tokens,
                       no_space / CAST(greatest(n_tokens, 1) AS DOUBLE) AS mean_wl,
                       stop / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stop_ratio
                FROM m)
            SELECT doc_id, n_chars, n_tokens,
                   floor(mean_wl * 1000000 + 0.501) / 1000000 AS mean_word_len,
                   floor(stop_ratio * 1000000 + 0.501) / 1000000 AS stop_ratio,
                   floor(((least(greatest(mean_wl, 2.0), 8.0) - 2.0) / 6.0 * 0.5
                          + least(stop_ratio, 0.5)) * 1000000 + 0.501) / 1000000
                       AS quality_score,
                   CASE WHEN stop_ratio > 0.02 THEN 'en' ELSE 'unknown' END AS lang_guess
            FROM m2
        """,
        "gopher_quality": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS p
                FROM documents),
            bg AS (
                SELECT doc_id,
                       w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS b2
                FROM w QUALIFY b2 IS NOT NULL),
            bstat AS (
                SELECT doc_id, count(*) AS n_bg, count(DISTINCT b2) AS nd_bg
                FROM bg GROUP BY doc_id),
            wstat AS (
                SELECT doc_id, count(*) AS n_words, count(DISTINCT w) AS nd_w
                FROM w GROUP BY doc_id),
            base AS (
                SELECT d.doc_id,
                       s.n_words,
                       length(replace(d.text, ' ', ''))
                           / CAST(greatest(s.n_words, 1) AS DOUBLE) AS mean_wl,
                       (CASE WHEN ' ' || d.text || ' ' LIKE '% the %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% a %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% of %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% to %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% and %' THEN 1 ELSE 0 END)
                           AS stop_hits,
                       1.0 - s.nd_w / CAST(greatest(s.n_words, 1) AS DOUBLE)
                           AS dup_word,
                       coalesce(1.0 - b.nd_bg / CAST(b.n_bg AS DOUBLE), 0.0)
                           AS dup_2gram
                FROM documents d
                JOIN wstat s ON s.doc_id = d.doc_id
                LEFT JOIN bstat b ON b.doc_id = d.doc_id)
            SELECT doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   floor(mean_wl * 1000000 + 0.501) / 1000000 AS mean_word_len,
                   CAST(stop_hits AS BIGINT) AS stop_hits,
                   floor(dup_word * 1000000 + 0.501) / 1000000 AS dup_word_frac,
                   floor(dup_2gram * 1000000 + 0.501) / 1000000 AS dup_2gram_frac,
                   (n_words BETWEEN 20 AND 10000
                    AND mean_wl BETWEEN 3.0 AND 10.0
                    AND stop_hits >= 2
                    AND dup_word <= 0.6
                    AND dup_2gram <= 0.1) AS passes
            FROM base
        """,
        "bpe_learn": _bpe_sql(10),
        "bpe_segment": _bpe_segment_sql(10),
        "rephrase_docs": """
            WITH sw2 AS (
                SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
                FROM (SELECT doc_id,
                             list_filter(string_split(text, ' '), x -> x <> '') AS ws
                      FROM documents)),
            spans2 AS (
                SELECT doc_id, CAST((i - 1) // 8 AS BIGINT) AS span_no,
                       string_agg(w, ' ' ORDER BY i) AS span
                FROM sw2 GROUP BY doc_id, (i - 1) // 8),
            agg2 AS (
                SELECT doc_id,
                       string_agg(span, ' '
                           ORDER BY md5(doc_id || ':' || span_no), span_no)
                           AS text_rephrased,
                       count(*) AS n
                FROM spans2 GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.text_rephrased, '') AS text_rephrased,
                   CAST(coalesce(a.n, 0) AS INT) AS n_spans
            FROM documents d LEFT JOIN agg2 a USING (doc_id)
        """,
        "curriculum_schedule": """
            WITH nw AS (
                SELECT doc_id,
                       len(list_filter(string_split(text, ' '), x -> x <> ''))
                           AS n_words
                FROM documents),
            h AS (SELECT n_words, count(*) AS c FROM nw GROUP BY n_words),
            cum AS (SELECT n_words, sum(c) OVER (ORDER BY n_words) AS cc FROM h),
            nn AS (SELECT count(*) AS n FROM nw),
            thr AS (
                SELECT
                    min(CASE WHEN cc >= ((SELECT n FROM nn) * 1 + 3) // 4
                             THEN n_words END) AS t1,
                    min(CASE WHEN cc >= ((SELECT n FROM nn) * 2 + 3) // 4
                             THEN n_words END) AS t2,
                    min(CASE WHEN cc >= ((SELECT n FROM nn) * 3 + 3) // 4
                             THEN n_words END) AS t3
                FROM cum)
            SELECT doc_id,
                   CAST(n_words AS INT) AS n_words,
                   CAST(CASE WHEN n_words <= t1 THEN 0
                             WHEN n_words <= t2 THEN 1
                             WHEN n_words <= t3 THEN 2
                             ELSE 3 END AS INT) AS stage,
                   md5(CAST(doc_id AS VARCHAR)) AS order_key
            FROM nw, thr
        """,
        "mixture_weights": f"""
            WITH s AS (
                SELECT source, count(*) AS n_docs,
                       sum(length(text) - length(replace(text, ' ', '')) + 1)
                           AS n_tokens
                FROM documents GROUP BY source),
            t AS (SELECT sum(n_tokens) AS tot FROM s),
            qx AS (
                SELECT source, n_docs, n_tokens,
                       n_tokens * 1.0 / (SELECT tot FROM t) AS q,
                       pow(n_tokens * 1.0 / (SELECT tot FROM t), 0.3) AS qa
                FROM s),
            z AS (SELECT sum(qa) AS zs FROM qx)
            SELECT source,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   {sql_round('q', 6)} AS token_share,
                   {sql_round('qa / (SELECT zs FROM z)', 6)} AS p_alpha,
                   {sql_round('qa / (SELECT zs FROM z) / q', 6)} AS resample_factor
            FROM qx
        """,
        "duplicated_spans": f"""
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS p
                FROM documents),
            ng AS (
                SELECT doc_id, p,
                       {" || ' ' || ".join(["w"] + [f"lead(w, {i}) OVER win" for i in range(1, 8)])} AS g
                FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY p)
                QUALIFY g IS NOT NULL),
            dup AS (SELECT g FROM ng GROUP BY g HAVING count(*) > 1),
            pos AS (SELECT ng.doc_id, ng.p FROM ng JOIN dup USING (g)),
            lagend AS (
                SELECT doc_id, p,
                       max(p + 8) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS prev_end
                FROM pos),
            grp AS (
                SELECT *, sum(CASE WHEN prev_end IS NULL OR p > prev_end
                                   THEN 1 ELSE 0 END)
                              OVER (PARTITION BY doc_id ORDER BY p) AS gid
                FROM lagend)
            SELECT doc_id,
                   CAST(min(p) AS BIGINT) AS start_pos,
                   CAST(max(p) + 8 AS BIGINT) AS end_pos,
                   CAST(max(p) + 8 - min(p) AS BIGINT) AS n_tokens
            FROM grp GROUP BY doc_id, gid
        """,
        "source_mix": f"""
            WITH s AS (
                SELECT source, count(*) AS n_docs,
                       sum(length(text) - length(replace(text, ' ', '')) + 1)
                           AS n_tokens
                FROM documents GROUP BY source),
            t AS (SELECT sum(n_tokens) AS tot, count(*) AS k FROM s)
            SELECT source,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   {sql_round('n_tokens * 1.0 / (SELECT tot FROM t)', 6)}
                       AS token_share,
                   {sql_round('(1.0 / (SELECT k FROM t)) / (n_tokens * 1.0 / (SELECT tot FROM t))', 6)}
                       AS uniform_weight
            FROM s
        """,
        "tfidf_top_terms": f"""
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents),
            tc AS (
                SELECT doc_id, term, count(*) AS tf
                FROM w WHERE term <> '' GROUP BY doc_id, term),
            dft AS (
                SELECT term, count(*) AS df
                FROM (SELECT DISTINCT doc_id, term FROM w WHERE term <> '')
                GROUP BY term),
            nd AS (SELECT count(*) AS n FROM documents),
            s AS (
                SELECT tc.doc_id, tc.term, tc.tf, dft.df,
                       tc.tf * ln((SELECT n FROM nd) * 1.0 / dft.df) AS score
                FROM tc JOIN dft USING (term)),
            r AS (
                SELECT *, row_number() OVER (
                           PARTITION BY doc_id ORDER BY score DESC, term) AS rank
                FROM s)
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df,
                   {sql_round('score', 6)} AS tfidf,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5
        """,
        "unigram_logprob": f"""
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents),
            freq AS (
                SELECT term, count(*) AS c FROM w WHERE term <> '' GROUP BY term),
            tot AS (SELECT sum(c) AS t FROM freq),
            d AS (
                SELECT w.doc_id,
                       count(*) AS n_tokens,
                       avg(ln(freq.c / (SELECT t FROM tot))) AS mlp
                FROM w JOIN freq USING (term)
                GROUP BY w.doc_id)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   {sql_round('mlp', 6)} AS mean_logprob
            FROM d
        """,
        "decontaminate": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS p
                FROM documents),
            ng AS (
                SELECT doc_id,
                       w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
                FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY p)
                QUALIFY g IS NOT NULL),
            bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 50 = 0),
            cnt AS (
                SELECT doc_id, count(*) AS n_ngrams
                FROM ng WHERE doc_id % 50 <> 0 GROUP BY doc_id),
            hits AS (
                SELECT ng.doc_id, count(*) AS n_hits
                FROM ng JOIN bench USING (g)
                WHERE ng.doc_id % 50 <> 0 GROUP BY ng.doc_id)
            SELECT h.doc_id,
                   CAST(h.n_hits AS BIGINT) AS n_hits,
                   CAST(c.n_ngrams AS BIGINT) AS n_ngrams
            FROM hits h JOIN cnt c USING (doc_id)
        """,
        "word_frequencies": """
            SELECT word, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> ''
            GROUP BY word
        """,
        "span_dedup_corpus": """
            WITH sw AS (
                SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
                FROM (SELECT doc_id,
                             list_filter(string_split(text, ' '), x -> x <> '') AS ws
                      FROM documents)),
            spans AS (
                SELECT doc_id, CAST((i - 1) // 8 AS BIGINT) AS span_no,
                       string_agg(w, ' ' ORDER BY i) AS span
                FROM sw GROUP BY doc_id, (i - 1) // 8),
            tot AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id),
            win AS (
                SELECT doc_id, span_no, span,
                       row_number() OVER (PARTITION BY span
                                          ORDER BY doc_id, span_no) AS rn
                FROM spans)
            SELECT w.doc_id,
                   string_agg(w.span, ' ' ORDER BY w.span_no) AS text,
                   CAST(any_value(t.n_spans) AS INT) AS n_spans,
                   CAST(count(*) AS INT) AS n_kept
            FROM win w JOIN tot t ON w.doc_id = t.doc_id
            WHERE w.rn = 1
            GROUP BY w.doc_id
        """,
        "incremental_dedup": """
            WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
            prior AS (SELECT DISTINCT h FROM h WHERE doc_id % 2 = 0),
            fresh AS (SELECT h, min(doc_id) AS doc_id
                      FROM h WHERE doc_id % 2 = 1 GROUP BY h)
            SELECT f.doc_id
            FROM fresh f ANTI JOIN prior p ON f.h = p.h
        """,
        "embedding_quantize": f"""
            WITH d AS (SELECT unnest(generate_series(1, 64)) AS dim),
            m AS (SELECT d.dim,
                         max(CAST(abs(e.embedding[d.dim]) AS DOUBLE)) AS m
                  FROM embeddings e CROSS JOIN d
                  GROUP BY d.dim)
            SELECT dim, {sql_round('m', 6)} AS max_abs,
                   {sql_round('m / 127.0', 6)} AS scale
            FROM m
        """,
        "sessionize": f"""
            WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
            l AS (SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
                         AS prev FROM e),
            f AS (SELECT *, CASE WHEN prev IS NULL
                                      OR tus - prev > 21600000000
                                 THEN 1 ELSE 0 END AS brk FROM l),
            s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                                           ROWS UNBOUNDED PRECEDING) AS sid
                  FROM f)
            SELECT user_id, CAST(sid AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(tus) AS t_start_us, max(tus) AS t_end_us,
                   {sql_round('sum(value)', 6)} AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "asof_join": """
            WITH o AS (SELECT o_custkey, o_orderdate,
                              max(o_orderkey) AS o_orderkey,
                              arg_max(o_totalprice, o_orderkey) AS o_totalprice
                       FROM orders GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
            FROM events e ASOF JOIN o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "event_pairs_within": """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus
                       FROM events)
            SELECT a.event_id, count(b.event_id) AS n_within
            FROM e a LEFT JOIN e b
              ON a.user_id = b.user_id AND b.tus > a.tus
                 AND b.tus <= a.tus + 3600000000
            GROUP BY a.event_id
        """,
        "customer_order_outer": f"""
            WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey < 1000),
            o AS (SELECT o_custkey, o_totalprice FROM orders
                  WHERE o_orderstatus = 'F'),
            j AS (
                SELECT c.c_custkey, o.o_custkey, o.o_totalprice
                FROM c FULL OUTER JOIN o
                  ON c.c_custkey = o.o_custkey),
            s AS (
                SELECT CASE
                         WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
                           THEN 'matched'
                         WHEN c_custkey IS NOT NULL THEN 'customer_only'
                         ELSE 'order_only'
                       END AS side,
                       coalesce(o_totalprice, 0.0) AS price
                FROM j)
            SELECT side, count(*) AS n_rows,
                   {sql_round('sum(price)', 2)} AS total_price
            FROM s GROUP BY side
        """,
        "jsonl_export": """
            SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 64 AS shard,
                   count(*) AS n_rows
            FROM documents GROUP BY 1
        """,
        "parquet_hive_export": """
            SELECT lang, source, count(*) AS n_rows
            FROM documents GROUP BY 1, 2
        """,
        "customer_status_setops": """
            WITH f AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderstatus = 'F'),
            o AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE o_orderstatus = 'O')
            SELECT o_custkey, 'both' AS side
            FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
            UNION ALL
            SELECT o_custkey, 'f_only'
            FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
            UNION ALL
            SELECT o_custkey, 'o_only'
            FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f)
        """,
        "lineitem_corr": """
            WITH s AS (
                SELECT count(*) * 1.0 AS n,
                       sum(l_quantity) AS s0, sum(l_extendedprice) AS s1,
                       sum(l_discount) AS s2, sum(l_tax) AS s3,
                       sum(l_quantity * l_quantity) AS g00,
                       sum(l_quantity * l_extendedprice) AS g01,
                       sum(l_quantity * l_discount) AS g02,
                       sum(l_quantity * l_tax) AS g03,
                       sum(l_extendedprice * l_extendedprice) AS g11,
                       sum(l_extendedprice * l_discount) AS g12,
                       sum(l_extendedprice * l_tax) AS g13,
                       sum(l_discount * l_discount) AS g22,
                       sum(l_discount * l_tax) AS g23,
                       sum(l_tax * l_tax) AS g33
                FROM lineitem),
            p AS (
                SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                       n, g01 AS sxy, s0 AS sx, s1 AS sy, g00 AS sxx, g11 AS syy FROM s
                UNION ALL SELECT 'l_quantity', 'l_discount',
                       n, g02, s0, s2, g00, g22 FROM s
                UNION ALL SELECT 'l_quantity', 'l_tax',
                       n, g03, s0, s3, g00, g33 FROM s
                UNION ALL SELECT 'l_extendedprice', 'l_discount',
                       n, g12, s1, s2, g11, g22 FROM s
                UNION ALL SELECT 'l_extendedprice', 'l_tax',
                       n, g13, s1, s3, g11, g33 FROM s
                UNION ALL SELECT 'l_discount', 'l_tax',
                       n, g23, s2, s3, g22, g33 FROM s)
            SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
                   floor(((n*sxy - sx*sy)
                          / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)))
                         * 1000000 + 0.501) / 1000000 AS corr
            FROM p
        """,
        "q3_shipping_priority": """
            WITH r AS (
                SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                       sum(l.l_extendedprice * (1.0 - l.l_discount)) AS rev
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                WHERE c.c_mktsegment = 'BUILDING'
                  AND o.o_orderdate < DATE '1998-06-01'
                  AND l.l_shipdate > DATE '1998-06-01'
                GROUP BY 1, 2, 3)
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   floor(rev * 1000000 + 0.501) / 1000000 AS revenue
            FROM r
            ORDER BY rev DESC, o_orderdate, o_orderkey
            LIMIT 10
        """,
        "q6_forecast_revenue": f"""
            SELECT {sql_round('sum(l_extendedprice * l_discount)', 6)}
                       AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q14_promo_revenue": f"""
            WITH j14 AS (
                SELECT l_extendedprice * (1.0 - l_discount) AS rev,
                       (p_type = 'PROMO') AS is_promo
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-09-01'
                  AND l_shipdate <  TIMESTAMP '1997-10-01'),
            s14 AS (
                SELECT sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS promo,
                       sum(rev) AS total
                FROM j14)
            SELECT {sql_round('promo', 6)} AS promo_revenue,
                   {sql_round('total', 6)} AS total_revenue,
                   {sql_round('100.0 * promo / total', 6)} AS promo_share_pct
            FROM s14
        """,
        "q4_order_priority": """
            WITH ms4 AS (
                SELECT l_orderkey AS o_orderkey, max(l_shipdate) AS max_ship
                FROM lineitem GROUP BY 1)
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders JOIN ms4 USING (o_orderkey)
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1997-04-01'
              AND max_ship > o_orderdate
            GROUP BY 1
        """,
        "q10_returned_items": """
            WITH r AS (
                SELECT o.o_custkey, sum(l.l_extendedprice
                                        * (1.0 - l.l_discount)) AS rev
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE l.l_returnflag = 'R'
                GROUP BY 1)
            SELECT c.c_custkey, c.c_name, n.n_name,
                   floor(r.rev * 1000000 + 0.501) / 1000000 AS revenue
            FROM r
            JOIN customer c ON c.c_custkey = r.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            ORDER BY r.rev DESC, c.c_custkey
            LIMIT 20
        """,
        "q5_local_supplier_revenue": f"""
            SELECT n_name,
                   {sql_round("sum(l_extendedprice * (1 - l_discount))", 2)}
                       AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
            GROUP BY n_name
        """,
        "q18_large_volume_customers": f"""
            WITH big18 AS (
                SELECT l_orderkey, sum(l_quantity) AS total_qty
                FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   {sql_round('o.o_totalprice', 6)} AS o_totalprice,
                   {sql_round('b.total_qty', 6)} AS total_qty
            FROM big18 b
            JOIN orders o ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
            LIMIT 100
        """,
        "q22_dormant_customers": f"""
            WITH avg22 AS (
                SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0),
            dormant AS (
                SELECT c_custkey, c_nationkey, c_acctbal
                FROM customer, avg22
                WHERE c_acctbal > a
                  AND NOT EXISTS (
                      SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01'))
            SELECT CAST(c_nationkey AS BIGINT) AS cntry,
                   CAST(count(*) AS BIGINT) AS numcust,
                   {sql_round('sum(c_acctbal)', 6)} AS totacctbal
            FROM dormant GROUP BY 1
        """,
        "q17_small_quantity_revenue": f"""
            WITH pavg17 AS (
                SELECT l_partkey, 0.2 * avg(l_quantity) AS thresh
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                WHERE p_brand = 'Brand#13'
                GROUP BY 1)
            SELECT {sql_round('coalesce(sum(l_extendedprice), 0.0) / 7.0', 6)}
                       AS avg_yearly
            FROM lineitem JOIN pavg17 USING (l_partkey)
            WHERE l_quantity < thresh
        """,
        "q7_volume_shipping": f"""
            WITH ga7 AS (SELECT unnest(['NATION_0','NATION_1','NATION_2',
                                        'NATION_3','NATION_4']) AS n),
            gb7 AS (SELECT unnest(['NATION_5','NATION_6','NATION_7',
                                   'NATION_8','NATION_9']) AS n)
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   {sql_round("sum(l_extendedprice * (1.0 - l_discount))", 6)}
                       AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation ns ON ns.n_nationkey = s.s_nationkey
            JOIN nation nc ON nc.n_nationkey = c.c_nationkey
            WHERE ((ns.n_name IN (SELECT n FROM ga7)
                    AND nc.n_name IN (SELECT n FROM gb7))
                OR (ns.n_name IN (SELECT n FROM gb7)
                    AND nc.n_name IN (SELECT n FROM ga7)))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
        "q8_market_share": f"""
            WITH vol8 AS (
                SELECT year(o.o_orderdate) AS o_year,
                       l.l_extendedprice * (1.0 - l.l_discount) AS volume,
                       (ns.n_name IN ('NATION_0','NATION_1','NATION_2',
                                      'NATION_3','NATION_4')) AS in_group
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation nc ON nc.n_nationkey = c.c_nationkey
                JOIN region r ON r.r_regionkey = nc.n_regionkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN nation ns ON ns.n_nationkey = s.s_nationkey
                WHERE r.r_name = 'ASIA')
            SELECT CAST(o_year AS BIGINT) AS o_year,
                   {sql_round(
                       "100.0 * sum(CASE WHEN in_group THEN volume ELSE 0 END)"
                       " / sum(volume)", 6)} AS mkt_share_pct
            FROM vol8 GROUP BY 1
        """,
        "q9_product_type_profit": f"""
            SELECT ns.n_name AS nation,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   {sql_round(
                       "sum(l.l_extendedprice * (1.0 - l.l_discount))", 6
                   )} AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation ns ON ns.n_nationkey = s.s_nationkey
            WHERE p.p_type LIKE '%AR%'
            GROUP BY 1, 2
        """,
        "q15_top_supplier": f"""
            WITH rev15 AS (
                SELECT l_suppkey AS s_suppkey,
                       sum(l_extendedprice * (1.0 - l_discount)) AS total
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-04-01'
                GROUP BY 1)
            SELECT r.s_suppkey, s.s_name,
                   {sql_round('r.total', 6)} AS total_revenue
            FROM rev15 r
            JOIN supplier s USING (s_suppkey)
            WHERE r.total = (SELECT max(total) FROM rev15)
            ORDER BY r.s_suppkey
        """,
        "q12_shipmode_priority": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate
            GROUP BY 1 ORDER BY 1
        """,
        "q19_discounted_revenue": f"""
            SELECT {sql_round(
                "coalesce(sum(l_extendedprice * (1.0 - l_discount)), 0.0)", 6)}
                       AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q2_min_cost_supplier": f"""
            WITH ps2 AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            el2 AS (
                SELECT ps2.l_partkey, s.s_acctbal, s.s_name, n.n_name
                FROM ps2
                JOIN supplier s ON s.s_suppkey = ps2.l_suppkey
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = 'AFRICA'),
            mc2 AS (SELECT l_partkey, min(s_acctbal) AS m FROM el2 GROUP BY 1)
            SELECT {sql_round('e.s_acctbal', 6)} AS s_acctbal,
                   e.s_name, e.n_name,
                   CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_type
            FROM part p
            JOIN el2 e ON e.l_partkey = p.p_partkey
            JOIN mc2 ON mc2.l_partkey = p.p_partkey AND e.s_acctbal = mc2.m
            WHERE p.p_type = 'LARGE' AND p.p_size <= 25
            ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
            LIMIT 100
        """,
        "q11_important_stock": f"""
            WITH val11 AS (
                SELECT l_partkey, sum(l_extendedprice * l_quantity) AS v
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE r_name IN ('AFRICA', 'AMERICA')
                GROUP BY 1)
            SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
                   {sql_round('v', 6)} AS value
            FROM val11
            WHERE v > (SELECT sum(v) * (2.0 / (SELECT count(*) FROM part))
                       FROM val11)
            ORDER BY v DESC, l_partkey
        """,
        "q16_supplier_cnt": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps16
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q20_excess_suppliers": """
            SELECT s_name, n_name
            FROM supplier JOIN nation ON n_nationkey = s_nationkey
            WHERE s_suppkey IN (
                SELECT l_suppkey
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                WHERE p_name LIKE 'large%'
                GROUP BY l_suppkey, l_partkey
                HAVING sum(l_quantity) > 100.0)
            ORDER BY s_name
        """,
        "q21_waiting_suppliers": """
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM supplier s
            JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
            JOIN orders o ON o.o_orderkey = l1.l_orderkey
            WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 100
        """,
        "ccnet_buckets": f"""
            WITH ccw AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS p
                FROM documents),
            ccuni AS (SELECT w, count(*) AS cu FROM ccw GROUP BY w),
            ccv AS (SELECT count(*) * 1.0 AS v FROM ccuni),
            ccbg AS (
                SELECT doc_id, w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
                FROM ccw QUALIFY w2 IS NOT NULL),
            ccbc AS (SELECT w1, w2, count(*) AS cb FROM ccbg GROUP BY 1, 2),
            ccsc AS (
                SELECT g.doc_id, ln((c.cb + 1.0) / (u.cu + v.v)) AS lp
                FROM ccbg g
                JOIN ccbc c ON c.w1 = g.w1 AND c.w2 = g.w2
                JOIN ccuni u ON u.w = g.w1
                CROSS JOIN ccv v),
            ccagg AS (SELECT doc_id, sum(lp) / count(*) AS m
                      FROM ccsc GROUP BY 1),
            ccdoc AS (
                SELECT d.doc_id, d.lang,
                       floor(coalesce(a.m, 0.0) * 1000000 + 0.501) / 1000000
                           AS mlp
                FROM documents d LEFT JOIN ccagg a USING (doc_id)),
            ccq AS (SELECT doc_id, lang, mlp,
                           floor(mlp * 1000 + 0.501) / 1000 AS lp3
                    FROM ccdoc),
            cccnt AS (SELECT lang, lp3, count(*) AS c FROM ccq GROUP BY 1, 2),
            cccum AS (
                SELECT lang, lp3,
                       sum(c) OVER (PARTITION BY lang
                                    ORDER BY lp3 DESC) AS cum,
                       sum(c) OVER (PARTITION BY lang) AS n
                FROM cccnt),
            ccth AS (
                SELECT lang,
                       max(CASE WHEN cum >= (n + 2) // 3 THEN lp3 END) AS t1,
                       max(CASE WHEN cum >= (2 * n + 2) // 3 THEN lp3 END)
                           AS t2
                FROM cccum GROUP BY 1)
            SELECT q.doc_id, q.lang,
                   {sql_round('q.mlp', 6)} AS mean_logprob,
                   CASE WHEN q.lp3 >= t.t1 THEN 'head'
                        WHEN q.lp3 >= t.t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM ccq q JOIN ccth t USING (lang)
        """,
        "dsir_weights": f"""
            WITH tokd AS (
                SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                FROM documents),
            hbd AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(w), 1, 13))::BIGINT % 1024 AS h
                FROM tokd),
            tgtd AS (SELECT h, count(*) AS c FROM hbd
                     WHERE lang = 'en' GROUP BY 1),
            rawd AS (SELECT h, count(*) AS c FROM hbd GROUP BY 1),
            totd AS (SELECT (SELECT coalesce(sum(c), 0) FROM tgtd) AS tt,
                            (SELECT sum(c) FROM rawd) AS rt),
            wd AS (
                SELECT hbd.doc_id,
                       sum(ln((coalesce(t.c, 0) + 1.0) / (totd.tt + 1024.0))
                           - ln((r.c + 1.0) / (totd.rt + 1024.0))) AS lw,
                       count(*) AS n
                FROM hbd
                LEFT JOIN tgtd t USING (h)
                JOIN rawd r USING (h)
                CROSS JOIN totd
                GROUP BY 1)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n AS BIGINT) AS n_tokens,
                   {sql_round('lw', 6)} AS dsir_logw
            FROM wd
        """,
        "events_rolling_mean": f"""
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS event_id,
                   {sql_round(
                       "avg(value) OVER (PARTITION BY user_id "
                       "ORDER BY ts, event_id "
                       "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", 6)}
                       AS rolling_mean
            FROM events
        """,
        "events_anomaly_zscore": f"""
            WITH stz AS (
                SELECT user_id, sum(value) AS s, sum(value * value) AS s2,
                       count(*) AS n
                FROM events GROUP BY 1),
            momz AS (
                SELECT user_id, n, s / n AS m,
                       sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) AS sd
                FROM stz)
            SELECT CAST(e.event_id AS BIGINT) AS event_id,
                   CAST(e.user_id AS BIGINT) AS user_id,
                   {sql_round('(e.value - m.m) / m.sd', 6)} AS z
            FROM events e JOIN momz m USING (user_id)
            WHERE m.n >= 5 AND m.sd > 0
              AND abs((e.value - m.m) / m.sd) > 2.0
        """,
        "hopping_window_counts": f"""
            WITH ehop AS (
                SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) AS b, value
                FROM events),
            hwin AS (
                SELECT unnest(generate_series(b - 1, b)) AS w, value
                FROM ehop)
            SELECT w * 1800 AS win_start,
                   CAST(count(*) AS BIGINT) AS n,
                   {sql_round('sum(value)', 6)} AS sum_value
            FROM hwin GROUP BY 1
        """,
        "repetition_top_ngrams": f"""
            WITH wtg AS (SELECT doc_id, string_split(text, ' ') AS l
                         FROM documents),
            nbase AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_words
                      FROM wtg),
            tg2 AS (SELECT doc_id, max(c) AS t FROM (
                        SELECT doc_id, l[i] || ' ' || l[i+1] AS g,
                               count(*) AS c
                        FROM (SELECT doc_id, l,
                                     unnest(generate_series(1, len(l)-1)) AS i
                              FROM wtg)
                        GROUP BY doc_id, g) GROUP BY 1),
            tg3 AS (SELECT doc_id, max(c) AS t FROM (
                        SELECT doc_id,
                               l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g,
                               count(*) AS c
                        FROM (SELECT doc_id, l,
                                     unnest(generate_series(1, len(l)-2)) AS i
                              FROM wtg)
                        GROUP BY doc_id, g) GROUP BY 1),
            tg4 AS (SELECT doc_id, max(c) AS t FROM (
                        SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' ||
                               l[i+2] || ' ' || l[i+3] AS g,
                               count(*) AS c
                        FROM (SELECT doc_id, l,
                                     unnest(generate_series(1, len(l)-3)) AS i
                              FROM wtg)
                        GROUP BY doc_id, g) GROUP BY 1),
            topfr AS (
                SELECT nbase.doc_id, nbase.n_words,
                       CAST(coalesce(tg2.t, 0) AS DOUBLE)
                           / greatest(nbase.n_words - 1, 1) AS f2,
                       CAST(coalesce(tg3.t, 0) AS DOUBLE)
                           / greatest(nbase.n_words - 2, 1) AS f3,
                       CAST(coalesce(tg4.t, 0) AS DOUBLE)
                           / greatest(nbase.n_words - 3, 1) AS f4
                FROM nbase
                LEFT JOIN tg2 USING (doc_id)
                LEFT JOIN tg3 USING (doc_id)
                LEFT JOIN tg4 USING (doc_id))
            SELECT doc_id, n_words,
                   {sql_round('f2', 6)} AS top2_frac,
                   {sql_round('f3', 6)} AS top3_frac,
                   {sql_round('f4', 6)} AS top4_frac
            FROM topfr
        """,
        "q13_order_count_distribution": """
            WITH oc13 AS (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                                   AND o.o_orderstatus = 'F'
                GROUP BY 1)
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM oc13 GROUP BY 1
        """,
        "skipgram_pairs": """
            WITH docs AS (SELECT string_split(text, ' ') AS l
                          FROM documents),
            dist AS (SELECT unnest([1, 2, 3]) AS d),
            g AS (SELECT l, len(l) AS n FROM docs),
            pos AS (SELECT l, dist.d,
                           unnest(generate_series(1,
                                greatest(n - dist.d, 0))) AS i
                    FROM g CROSS JOIN dist),
            pairs AS (
                SELECT l[i] AS center, l[i + d] AS context FROM pos
                UNION ALL
                SELECT l[i + d] AS center, l[i] AS context FROM pos)
            SELECT center, context, count(*) AS n
            FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5
        """,
        "knn_graph": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings),
            s AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
                         list_cosine_similarity(a.e, b.e) AS cos
                  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
            r AS (SELECT ai, bi, cos,
                         row_number() OVER (PARTITION BY ai
                                            ORDER BY cos DESC, bi) AS rk
                  FROM s),
            d AS (SELECT ai, bi, cos FROM r WHERE rk <= 5),
            m AS (SELECT d1.ai AS a, d1.bi AS b, d1.cos AS cos
                  FROM d d1 JOIN d d2
                    ON d1.ai = d2.bi AND d1.bi = d2.ai
                  WHERE d1.ai < d1.bi)
            SELECT a, b, floor(cos * 1000000 + 0.501) / 1000000 AS cosine
            FROM m
        """,
        "per_source_cap": """
            WITH r AS (SELECT doc_id, source,
                              row_number() OVER (
                                  PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rk
                       FROM documents)
            SELECT doc_id, source FROM r WHERE rk <= 10
        """,
        "latest_by_key": """
            SELECT user_id, event_type,
                   max(epoch_us(ts)) AS tus,
                   arg_max(event_id, epoch_us(ts)) AS event_id,
                   arg_max(value, epoch_us(ts)) AS value
            FROM events GROUP BY 1, 2
        """,
        "user_event_sequences": """
            SELECT user_id, count(*) AS n_events,
                   string_agg(event_type, '>'
                              ORDER BY epoch_us(ts), event_id) AS seq
            FROM events GROUP BY user_id
        """,
        "event_transitions": """
            WITH o AS (SELECT user_id, event_type,
                              lag(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS prev
                       FROM events)
            SELECT prev AS src, event_type AS dst, count(*) AS n
            FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
        """,
        "daily_retention": """
            WITH d AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events),
            f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY 1)
            SELECT d.day, d.day = f.first_day AS is_new,
                   count(DISTINCT d.user_id) AS n_users
            FROM d JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "next_event_labels": """
            WITH o AS (SELECT event_id, user_id, event_type,
                              epoch_us(ts) AS tus FROM events),
            l AS (SELECT event_id, event_type,
                         lead(event_type) OVER w AS nt,
                         lead(tus) OVER w - tus AS g
                  FROM o
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY tus, event_id))
            SELECT event_id, event_type,
                   coalesce(nt, '<end>') AS next_type,
                   coalesce(g, -1) AS gap_us
            FROM l
        """,
        "orders_rollup": f"""
            WITH fine AS (
                SELECT o_orderstatus, o_orderpriority,
                       count(*) AS n_orders, sum(o_totalprice) AS s
                FROM orders GROUP BY 1, 2)
            SELECT o_orderstatus, o_orderpriority,
                   CAST(n_orders AS BIGINT) AS n_orders,
                   {sql_round('s', 2)} AS total_price
            FROM fine
            UNION ALL
            SELECT o_orderstatus, '(all)',
                   CAST(sum(n_orders) AS BIGINT),
                   {sql_round('sum(s)', 2)}
            FROM fine GROUP BY 1
            UNION ALL
            SELECT '(all)', '(all)',
                   CAST(sum(n_orders) AS BIGINT),
                   {sql_round('sum(s)', 2)}
            FROM fine
        """,
        "orders_cube": f"""
            WITH fine AS (
                SELECT o_orderstatus, o_orderpriority,
                       count(*) AS n_orders, sum(o_totalprice) AS s
                FROM orders GROUP BY 1, 2)
            SELECT o_orderstatus, o_orderpriority,
                   CAST(n_orders AS BIGINT) AS n_orders,
                   {sql_round('s', 2)} AS total_price
            FROM fine
            UNION ALL
            SELECT o_orderstatus, '(all)',
                   CAST(sum(n_orders) AS BIGINT), {sql_round('sum(s)', 2)}
            FROM fine GROUP BY 1
            UNION ALL
            SELECT '(all)', o_orderpriority,
                   CAST(sum(n_orders) AS BIGINT), {sql_round('sum(s)', 2)}
            FROM fine GROUP BY 2
            UNION ALL
            SELECT '(all)', '(all)',
                   CAST(sum(n_orders) AS BIGINT), {sql_round('sum(s)', 2)}
            FROM fine
        """,
        "events_moments": """
            WITH s AS (
                SELECT event_type, count(*) * 1.0 AS n,
                       sum(value) AS s1, sum(value * value) AS s2,
                       sum(value * value * value) AS s3,
                       sum(value * value * value * value) AS s4
                FROM events GROUP BY 1),
            m AS (
                SELECT event_type, n, s1 / n AS mean,
                       s2 / n - (s1/n) * (s1/n) AS m2,
                       s3 / n - 3 * (s1/n) * (s2/n) + 2 * pow(s1/n, 3) AS m3,
                       s4 / n - 4 * (s1/n) * (s3/n)
                             + 6 * (s1/n) * (s1/n) * (s2/n)
                             - 3 * pow(s1/n, 4) AS m4
                FROM s)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   floor(mean * 1000000 + 0.501) / 1000000 AS mean,
                   floor(m2 * 1000000 + 0.501) / 1000000 AS var_pop,
                   floor((m3 / pow(m2, 1.5)) * 1000000 + 0.501) / 1000000
                       AS skewness,
                   floor((m4 / (m2 * m2) - 3.0) * 1000000 + 0.501) / 1000000
                       AS kurtosis_excess
            FROM m ORDER BY event_type
        """,
        "status_priority_pivot": """
            SELECT o_orderstatus,
                   CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
                   CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_2,
                   CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_3,
                   CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_4,
                   CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_5
            FROM orders GROUP BY 1
        """,
        "events_resampled": f"""
            WITH agg AS (
                SELECT event_type,
                       (epoch_us(ts) // 1000000 // 3600) * 3600 AS ws,
                       count(*) AS n, sum(value) AS sv
                FROM events GROUP BY 1, 2),
            b AS (SELECT min(ws) AS lo, max(ws) AS hi FROM agg),
            grid AS (
                SELECT t.event_type, g.ws
                FROM (SELECT DISTINCT event_type FROM agg) t
                CROSS JOIN (SELECT unnest(generate_series(
                                (SELECT lo FROM b), (SELECT hi FROM b),
                                3600)) AS ws) g)
            SELECT grid.event_type, grid.ws AS window_start,
                   CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
                   {sql_round('coalesce(a.sv, 0.0)', 2)} AS sum_value
            FROM grid LEFT JOIN agg a
              ON a.event_type = grid.event_type AND a.ws = grid.ws
        """,
        "user_funnel": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus
                       FROM events),
            v AS (SELECT user_id, min(tus) AS t0 FROM e
                  WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(e.tus) AS t1
                  FROM e JOIN v USING (user_id)
                  WHERE e.event_type = 'click' AND e.tus > v.t0 GROUP BY 1),
            p AS (SELECT DISTINCT e.user_id
                  FROM e JOIN c USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.tus > c.t1)
            SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
                   CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
                   CAST((SELECT count(*) FROM p) AS BIGINT)
                       AS n_view_click_purchase
        """,
        "events_value_ranks": f"""
            SELECT event_id,
                   {sql_round('percent_rank() OVER (ORDER BY value)', 6)}
                       AS pct_rank
            FROM events
        """,
        "hll_window_users": f"""
            WITH dv AS (
                SELECT DISTINCT
                       (epoch_us(ts) // 1000000 // {_HLL_WINDOW_S})
                           * {_HLL_WINDOW_S} AS window_start,
                       user_id
                FROM events),
            h AS (SELECT window_start,
                         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                              1, 15)) AS BIGINT) AS h
                  FROM dv),
            rb AS (SELECT window_start, h >> 50 AS bucket,
                          h & ((CAST(1 AS BIGINT) << 50) - 1) AS w
                   FROM h),
            regs AS (SELECT window_start, bucket,
                            max(CASE WHEN w = 0 THEN 51
                                     ELSE 51 - length(bin(w)) END) AS rho
                     FROM rb GROUP BY 1, 2),
            fullregs AS (
                SELECT g.window_start, s.bucket, coalesce(r.rho, 0) AS rho
                FROM (SELECT DISTINCT window_start FROM dv) g
                CROSS JOIN (SELECT unnest(generate_series(0, 1023)) AS bucket) s
                LEFT JOIN regs r
                  ON r.window_start = g.window_start AND r.bucket = s.bucket),
            agg AS (
                SELECT window_start,
                       sum(power(2.0, -rho)) AS s,
                       sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v0
                FROM fullregs GROUP BY 1),
            est AS (
                SELECT window_start,
                       (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw,
                       v0
                FROM agg)
            SELECT window_start,
                   floor((CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0
                               THEN 1024.0 * ln(1024.0 / v0)
                               ELSE e_raw END) * 1000000 + 0.501) / 1000000
                       AS estimate,
                   CAST(v0 AS BIGINT) AS v_zero
            FROM est
        """,
        "kg_bfs_levels": _bfs_oracle_sql(c01, levels=8),
        "top_words_per_lang": """
            WITH wc AS (
                SELECT lang, word, count(*) AS n
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> ''
                GROUP BY lang, word),
            r AS (
                SELECT lang, word, n,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n DESC, word) AS rank
                FROM wc)
            SELECT lang, word, CAST(n AS BIGINT) AS n,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10
        """,
        "events_ab_test": """
            WITH s AS (
                SELECT event_type,
                       sum(CASE WHEN isodow(ts) IN (6, 7) THEN 1 ELSE 0 END) * 1.0 AS n1,
                       sum(CASE WHEN isodow(ts) IN (6, 7) AND value > 100.0
                                THEN 1 ELSE 0 END) * 1.0 AS x1,
                       sum(CASE WHEN isodow(ts) NOT IN (6, 7) THEN 1 ELSE 0 END) * 1.0 AS n2,
                       sum(CASE WHEN isodow(ts) NOT IN (6, 7) AND value > 100.0
                                THEN 1 ELSE 0 END) * 1.0 AS x2
                FROM events GROUP BY 1)
            SELECT event_type,
                   CAST(n1 AS BIGINT) AS n_weekend,
                   CAST(n2 AS BIGINT) AS n_weekday,
                   floor((x1 / n1) * 1000000 + 0.501) / 1000000 AS p_weekend,
                   floor((x2 / n2) * 1000000 + 0.501) / 1000000 AS p_weekday,
                   floor(((x1 / n1 - x2 / n2)
                          / sqrt(((x1 + x2) / (n1 + n2))
                                 * (1 - (x1 + x2) / (n1 + n2))
                                 * (1 / n1 + 1 / n2)))
                         * 1000000 + 0.501) / 1000000 AS z
            FROM s ORDER BY event_type
        """,
        "embedding_gram": """
            WITH ex AS (
                SELECT vec_id,
                       unnest(CAST(embedding AS DOUBLE[])) AS e,
                       unnest(generate_series(1, len(embedding))) AS i
                FROM embeddings)
            SELECT CAST(a.i AS BIGINT) AS dim_a, CAST(b.i AS BIGINT) AS dim_b,
                   CAST(count(*) AS BIGINT) AS n,
                   floor(sum(a.e * b.e) * 1000000 + 0.501) / 1000000 AS dot
            FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2
        """,
        "events_quantile_cont": """
            SELECT event_type, 0.25 AS q,
                   floor(quantile_cont(value, 0.25) * 1000000 + 0.501) / 1000000
                       AS value
            FROM events GROUP BY event_type\n            UNION ALL\n            SELECT event_type, 0.5 AS q,
                   floor(quantile_cont(value, 0.5) * 1000000 + 0.501) / 1000000
                       AS value
            FROM events GROUP BY event_type\n            UNION ALL\n            SELECT event_type, 0.75 AS q,
                   floor(quantile_cont(value, 0.75) * 1000000 + 0.501) / 1000000
                       AS value
            FROM events GROUP BY event_type\n            UNION ALL\n            SELECT event_type, 0.95 AS q,
                   floor(quantile_cont(value, 0.95) * 1000000 + 0.501) / 1000000
                       AS value
            FROM events GROUP BY event_type
        """,
        "user_decay_scores": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   floor(sum(value * pow(2.0,
                             -(epoch(TIMESTAMP '2024-02-01' - ts) / 86400.0)
                             / 7.0))
                         * 1000000 + 0.501) / 1000000 AS score
            FROM events GROUP BY user_id
        """,
        "bigram_logprob": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS p
                FROM documents),
            uni AS (SELECT w, count(*) AS cu FROM w GROUP BY w),
            vsz AS (SELECT count(*) * 1.0 AS v FROM uni),
            bg AS (
                SELECT doc_id, w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
                FROM w QUALIFY w2 IS NOT NULL),
            bcnt AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
            scored AS (
                SELECT g.doc_id,
                       ln((c.cb + 1.0) / (u.cu + v.v)) AS lp
                FROM bg g
                JOIN bcnt c ON c.w1 = g.w1 AND c.w2 = g.w2
                JOIN uni u ON u.w = g.w1
                CROSS JOIN vsz v),
            agg AS (
                SELECT doc_id, count(*) AS n_pairs, sum(lp) / count(*) AS m
                FROM scored GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(a.n_pairs, 0) AS BIGINT) AS n_pairs,
                   floor(coalesce(a.m, 0.0) * 1000000 + 0.501) / 1000000
                       AS mean_logprob
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        """,
        "events_anomalies": """
            WITH med AS (
                SELECT event_type, quantile_disc(value, 0.5) AS med
                FROM events GROUP BY 1),
            mad AS (
                SELECT e.event_type, m.med,
                       quantile_disc(abs(e.value - m.med), 0.5) AS mad
                FROM events e JOIN med m USING (event_type)
                GROUP BY e.event_type, m.med)
            SELECT e.event_id, e.event_type, e.value,
                   floor(abs(e.value - s.med) * 1000000 + 0.501) / 1000000
                       AS deviation
            FROM events e JOIN mad s USING (event_type)
            WHERE abs(e.value - s.med) > 5.0 * s.mad
        """,
        "nb_source_classifier": """
            WITH w AS (
                SELECT doc_id, source,
                       unnest(string_split(text, ' ')) AS word
                FROM documents),
            ct AS (SELECT source, word, count(*) * 1.0 AS n
                   FROM w GROUP BY 1, 2),
            tok AS (SELECT source, sum(n) AS t FROM ct GROUP BY 1),
            vs AS (SELECT count(DISTINCT word) * 1.0 AS v FROM ct),
            dc AS (SELECT source, count(*) * 1.0 AS nd
                   FROM documents GROUP BY 1),
            ll AS (
                SELECT s.source, w2.word,
                       ln((coalesce(c.n, 0) + 1.0) / (tok.t + vs.v)) AS l
                FROM (SELECT DISTINCT word FROM ct) w2
                CROSS JOIN (SELECT source FROM dc) s
                LEFT JOIN ct c ON c.source = s.source AND c.word = w2.word
                JOIN tok ON tok.source = s.source
                CROSS JOIN vs),
            sc AS (
                SELECT wd.doc_id, ll.source AS cand, sum(ll.l) AS sl
                FROM w wd JOIN ll ON ll.word = wd.word
                GROUP BY 1, 2),
            q AS (
                SELECT sc.doc_id, sc.cand,
                       floor((ln(dc.nd / (SELECT sum(nd) FROM dc)) + sc.sl)
                             * 1000000 + 0.501) / 1000000 AS qs
                FROM sc JOIN dc ON dc.source = sc.cand),
            pick AS (
                SELECT doc_id, cand,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY qs DESC, cand) AS rn
                FROM q)
            SELECT d.doc_id, d.source AS actual, p.cand AS predicted,
                   d.source = p.cand AS correct
            FROM documents d JOIN pick p
              ON p.doc_id = d.doc_id AND p.rn = 1
        """,
        "source_distinctive_terms": """
            WITH w AS (
                SELECT source, unnest(string_split(text, ' ')) AS word
                FROM documents),
            ct AS (SELECT source, word, count(*) * 1.0 AS c
                   FROM w GROUP BY 1, 2),
            vsz AS (SELECT count(DISTINCT word) * 1.0 AS v, count(*) * 1.0 AS n
                    FROM w),
            wm AS (SELECT word, sum(c) AS cw FROM ct GROUP BY word),
            gm AS (SELECT source, sum(c) AS ng FROM ct GROUP BY source),
            d AS (
                SELECT ct.source, ct.word, ct.c,
                       ln((ct.c + 1.0) / (gm.ng - ct.c + vsz.v))
                       - ln((wm.cw - ct.c + 1.0)
                            / (vsz.n - gm.ng - (wm.cw - ct.c) + vsz.v)) AS delta
                FROM ct
                JOIN wm USING (word)
                JOIN gm USING (source)
                CROSS JOIN vsz),
            r AS (
                SELECT source, word, c, delta,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY delta DESC, word) AS rank
                FROM d)
            SELECT source, CAST(rank AS BIGINT) AS rank, word,
                   CAST(c AS BIGINT) AS n,
                   floor(delta * 1000000 + 0.501) / 1000000 AS delta
            FROM r WHERE rank <= 10
        """,
        "purchase_attribution": """
            WITH o AS (
                SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
                       lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS prev
                FROM events),
            b AS (
                SELECT *, CASE WHEN prev IS NULL
                                 OR tus - prev > 21600000000
                               THEN 1 ELSE 0 END AS brk
                FROM o),
            s AS (
                SELECT *, sum(brk) OVER (
                           PARTITION BY user_id
                           ORDER BY tus, event_id) AS sid
                FROM b),
            f AS (
                SELECT *, first_value(event_type) OVER (
                           PARTITION BY user_id, sid
                           ORDER BY tus, event_id) AS first_touch
                FROM s)
            SELECT event_id, user_id, first_touch
            FROM f WHERE event_type = 'purchase'
        """,
        "markov_steady_state": """
            WITH o AS (SELECT user_id, event_type,
                              lag(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS prev
                       FROM events),
            trans AS MATERIALIZED (SELECT prev AS src, event_type AS dst,
                             count(*) * 1.0 AS n
                      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
            states AS MATERIALIZED (SELECT DISTINCT src AS s FROM trans
                       UNION SELECT DISTINCT dst FROM trans),
            pm AS MATERIALIZED (
                SELECT src, dst, n / sum(n) OVER (PARTITION BY src) AS p
                FROM trans
                UNION ALL
                SELECT s, s, 1.0 FROM states
                WHERE s NOT IN (SELECT DISTINCT src FROM trans)),
            v0 AS MATERIALIZED (SELECT s, 1.0 / (SELECT count(*) FROM states) AS v
                   FROM states),
            v1 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v0.v * pm.p) AS v
                FROM v0 JOIN pm ON pm.src = v0.s GROUP BY 1),
            v2 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v1.v * pm.p) AS v
                FROM v1 JOIN pm ON pm.src = v1.s GROUP BY 1),
            v3 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v2.v * pm.p) AS v
                FROM v2 JOIN pm ON pm.src = v2.s GROUP BY 1),
            v4 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v3.v * pm.p) AS v
                FROM v3 JOIN pm ON pm.src = v3.s GROUP BY 1),
            v5 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v4.v * pm.p) AS v
                FROM v4 JOIN pm ON pm.src = v4.s GROUP BY 1),
            v6 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v5.v * pm.p) AS v
                FROM v5 JOIN pm ON pm.src = v5.s GROUP BY 1),
            v7 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v6.v * pm.p) AS v
                FROM v6 JOIN pm ON pm.src = v6.s GROUP BY 1),
            v8 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v7.v * pm.p) AS v
                FROM v7 JOIN pm ON pm.src = v7.s GROUP BY 1),
            v9 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v8.v * pm.p) AS v
                FROM v8 JOIN pm ON pm.src = v8.s GROUP BY 1),
            v10 AS MATERIALIZED (
                SELECT pm.dst AS s, sum(v9.v * pm.p) AS v
                FROM v9 JOIN pm ON pm.src = v9.s GROUP BY 1)
            SELECT st.s AS event_type,
                   floor(coalesce(v10.v, 0.0) * 1000000 + 0.501) / 1000000
                       AS prob
            FROM states st LEFT JOIN v10 ON v10.s = st.s
        """,
        "events_wow_change": """
            WITH w AS (
                SELECT event_type,
                       epoch_us(ts) // 604800000000 AS wk,
                       sum(value) AS v, count(*) AS n
                FROM events GROUP BY 1, 2)
            SELECT event_type, wk, CAST(n AS BIGINT) AS n,
                   floor(v * 1000000 + 0.501) / 1000000 AS total,
                   floor(coalesce((v - lag(v) OVER (PARTITION BY event_type
                                                    ORDER BY wk))
                                  / lag(v) OVER (PARTITION BY event_type
                                                 ORDER BY wk), 0.0)
                         * 1000000 + 0.501) / 1000000 AS pct_change
            FROM w
        """,
        "snapshot_diff": """
            WITH b AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 0
                UNION ALL
                SELECT -doc_id - 1, text
                FROM documents WHERE doc_id % 13 = 0),
            j AS (
                SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                       a.text AS ta, b.text AS tb
                FROM documents a FULL OUTER JOIN b USING (doc_id))
            SELECT doc_id,
                   CASE WHEN ta IS NULL THEN 'added'
                        WHEN tb IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM j
            WHERE ta IS NULL OR tb IS NULL OR ta <> tb
        """,
        "users_every_day": """
            WITH d AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events),
            tot AS (SELECT count(DISTINCT day) AS n FROM d)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_days
            FROM d GROUP BY user_id
            HAVING count(*) = (SELECT n FROM tot)
        """,
        "events_mad": """
            WITH med AS (
                SELECT event_type, quantile_disc(value, 0.5) AS med
                FROM events GROUP BY 1)
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                   m.med AS median,
                   quantile_disc(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type, m.med
        """,
        "event_hour_pmi": """
            WITH j AS (
                SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                       count(*) AS n
                FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n) * 1.0 AS t FROM j),
            mx AS (SELECT event_type, sum(n) * 1.0 AS nx FROM j GROUP BY 1),
            my AS (SELECT hour, sum(n) * 1.0 AS ny FROM j GROUP BY 1)
            SELECT j.event_type, j.hour, j.n,
                   floor(ln((j.n * t.t) / (mx.nx * my.ny))
                         * 1000000 + 0.501) / 1000000 AS pmi
            FROM j
            JOIN mx USING (event_type)
            JOIN my USING (hour)
            CROSS JOIN t
        """,
        "frequent_itemsets": """
            WITH fis_dl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                            FROM lineitem),
            fis_n AS (SELECT count(DISTINCT ok) * 1.0 AS n FROM fis_dl),
            fis_ic AS (SELECT pk, count(*) AS c FROM fis_dl GROUP BY 1),
            fis_pr AS (SELECT a.pk AS part_a, b.pk AS part_b,
                              count(*) AS pair_count
                       FROM fis_dl a JOIN fis_dl b
                         ON a.ok = b.ok AND a.pk < b.pk
                       GROUP BY 1, 2
                       HAVING count(*) >= 2)
            SELECT CAST(pr.part_a AS BIGINT) AS part_a,
                   CAST(pr.part_b AS BIGINT) AS part_b,
                   CAST(pr.pair_count AS BIGINT) AS pair_count,
                   CAST(ca.c AS BIGINT) AS c_a,
                   CAST(cb.c AS BIGINT) AS c_b,
                   floor(pr.pair_count / fis_n.n
                         * 1000000 + 0.501) / 1000000 AS support,
                   floor(pr.pair_count * 1.0 / ca.c
                         * 1000000 + 0.501) / 1000000 AS conf_a_b,
                   floor(pr.pair_count * 1.0 / cb.c
                         * 1000000 + 0.501) / 1000000 AS conf_b_a,
                   floor(pr.pair_count * fis_n.n / (ca.c * cb.c)
                         * 1000000 + 0.501) / 1000000 AS lift
            FROM fis_pr pr
            JOIN fis_ic ca ON ca.pk = pr.part_a
            JOIN fis_ic cb ON cb.pk = pr.part_b
            CROSS JOIN fis_n
        """,
        "pareto_frontier": """
            SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey,
                   CAST(p.p_size AS INT) AS p_size,
                   p.p_retailprice
            FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size))
        """,
        "user_retention_cohorts": """
            WITH urc_uw AS (SELECT user_id,
                                   epoch_us(ts) // 1000000 // 604800 AS wk
                            FROM events GROUP BY 1, 2),
            urc_fu AS (SELECT user_id, min(wk) AS cw FROM urc_uw GROUP BY 1)
            SELECT CAST(f.cw AS BIGINT) AS cohort_week,
                   CAST(u.wk - f.cw AS BIGINT) AS week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM urc_uw u JOIN urc_fu f USING (user_id)
            GROUP BY 1, 2
        """,
        "events_cume_dist": f"""
            SELECT event_id, value,
                   {sql_round('cume_dist() OVER (ORDER BY value)', 6)} AS cume
            FROM events
        """,
        "preference_pairs": """
            WITH pp_r AS (
                SELECT lang, source, doc_id, n_chars,
                       row_number() OVER (PARTITION BY lang, source
                           ORDER BY n_chars DESC, doc_id ASC) AS rc,
                       row_number() OVER (PARTITION BY lang, source
                           ORDER BY n_chars ASC, doc_id DESC) AS rr,
                       count(*) OVER (PARTITION BY lang, source) AS n
                FROM documents)
            SELECT lang, source,
                   CAST(max(CASE WHEN rc = 1 THEN doc_id END) AS BIGINT)
                       AS chosen_id,
                   CAST(max(CASE WHEN rc = 1 THEN n_chars END) AS BIGINT)
                       AS chosen_len,
                   CAST(max(CASE WHEN rr = 1 THEN doc_id END) AS BIGINT)
                       AS rejected_id,
                   CAST(max(CASE WHEN rr = 1 THEN n_chars END) AS BIGINT)
                       AS rejected_len,
                   CAST(max(CASE WHEN rc = 1 THEN n_chars END)
                        - max(CASE WHEN rr = 1 THEN n_chars END) AS BIGINT)
                       AS margin
            FROM pp_r
            WHERE n >= 2
            GROUP BY lang, source
        """,
        "embedding_codes": """
            WITH ec_f AS (SELECT vec_id,
                                 generate_subscripts(embedding, 1) AS dim,
                                 CAST(unnest(embedding) AS DOUBLE) AS x
                          FROM embeddings),
            ec_s AS (SELECT dim,
                            CASE WHEN max(abs(x)) > 0
                                 THEN 127.0 / max(abs(x)) ELSE 0.0 END AS scale
                     FROM ec_f GROUP BY dim)
            SELECT CAST(f.vec_id AS BIGINT) AS vec_id,
                   CAST(f.dim AS BIGINT) AS dim,
                   CAST(floor(f.x * s.scale + 0.501) AS BIGINT) AS code,
                   s.scale
            FROM ec_f f JOIN ec_s s USING (dim)
        """,
        "running_totals": """
            SELECT event_id, user_id,
                   floor(sum(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                         * 1000000 + 0.501) / 1000000 AS running_total
            FROM events
        """,
        "events_ntile": """
            SELECT event_id, event_type,
                   CAST(ntile(10) OVER (PARTITION BY event_type
                                        ORDER BY value, event_id)
                        AS BIGINT) AS bucket
            FROM events
        """,
        "events_regression": """
            WITH s AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       sum(x) AS sx, sum(value) AS sy,
                       sum(x * value) AS sxy, sum(x * x) AS sxx,
                       sum(value * value) AS syy
                FROM (SELECT event_type, value,
                             epoch(ts - TIMESTAMP '2024-01-01') / 3600.0 AS x
                      FROM events)
                GROUP BY 1)
            SELECT event_type, n,
                   floor(((n*sxy - sx*sy) / (n*sxx - sx*sx))
                         * 1000000 + 0.501) / 1000000 AS slope,
                   floor(((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n)
                         * 1000000 + 0.501) / 1000000 AS intercept,
                   floor(((n*sxy - sx*sy)
                          / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)))
                         * 1000000 + 0.501) / 1000000 AS r
            FROM s ORDER BY event_type
        """,
        "events_zscore": f"""
            WITH s AS (
                SELECT event_type,
                       sum(value) AS sv,
                       sum(value * value) AS svv,
                       CAST(count(*) AS DOUBLE) AS n
                FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type,
                   {sql_round('(e.value - s.sv / s.n)'
                              ' / sqrt(s.svv / s.n - (s.sv / s.n) * (s.sv / s.n))', 6)}
                       AS zscore
            FROM events e JOIN s USING (event_type)
        """,
        "weighted_sample": f"""
            WITH w AS (
                SELECT doc_id, n_chars,
                       least(1.0, n_chars / 2000.0) AS wt,
                       CAST(('0x' || substr(md5('ws_' || CAST(doc_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) AS u
                FROM documents)
            SELECT doc_id, n_chars,
                   {sql_round('wt', 6)} AS weight
            FROM w
            WHERE u < CAST(floor(wt * 1152921504606846976.0) AS BIGINT)
        """,
        "inverted_index": """
            WITH tf AS (
                SELECT doc_id, word, count(*) AS tf
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> ''
                GROUP BY doc_id, word)
            SELECT word, CAST(count(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                              ',' ORDER BY doc_id) AS postings
            FROM tf GROUP BY word
            HAVING count(*) >= 2
        """,
        "doc_subwords": """
            SELECT doc_id,
                   count(*) AS n_words,
                   CAST(sum((length(word) + 7) // 8) AS BIGINT) AS n_subwords
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> ''
            GROUP BY doc_id
        """,
        "token_counts": """
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                       AS n_ws_tokens,
                   CAST(length(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS BIGINT)
                       AS n_bpe_tokens
            FROM documents
        """,
        "simhash_dedup": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents),
            tb AS (
                SELECT doc_id, md5(w) AS h,
                       unnest(generate_series(0, 63)) AS b
                FROM tok),
            bits AS (
                SELECT doc_id, b,
                       SUM(CASE WHEN ((strpos('0123456789abcdef',
                                              substr(h, 16 - b // 4, 1)) - 1)
                                      >> (b % 4)) & 1 = 1
                                THEN 1 ELSE -1 END) AS v
                FROM tb GROUP BY doc_id, b),
            sh AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN v > 0
                                     THEN CAST(1 AS HUGEINT) << b
                                     ELSE 0 END) AS UBIGINT) AS simhash
                FROM bits GROUP BY doc_id),
            bands AS (
                SELECT doc_id, simhash, bi,
                       (simhash >> CAST(16 * bi AS UBIGINT))
                           & CAST(65535 AS UBIGINT) AS bh
                FROM sh, generate_series(0, 3) AS t(bi))
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                       AS hamming
            FROM bands a JOIN bands b
              ON a.bi = b.bi AND a.bh = b.bh AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "doc_fingerprints": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS w,
                       unnest(generate_series(1, len(string_split(text, ' ')))) AS i,
                       len(string_split(text, ' ')) AS n
                FROM documents),
            h AS (SELECT doc_id, i, n, substr(md5(w), 1, 8) AS hh FROM tok),
            m AS (
                SELECT doc_id, i, n,
                       min(hh) OVER (PARTITION BY doc_id ORDER BY i
                                     ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
                           AS mn
                FROM h),
            k AS (
                SELECT doc_id, i, mn,
                       lag(mn) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                FROM m WHERE i <= greatest(n - 8 + 1, 1))
            SELECT doc_id,
                   md5(string_agg(mn, ',' ORDER BY i)) AS fingerprint,
                   CAST(count(*) AS BIGINT) AS n_windows
            FROM k WHERE prev IS NULL OR mn <> prev
            GROUP BY doc_id
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT doc_id,
                       CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS BIGINT) AS n_tokens
                FROM documents),
            s AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS start
                FROM t)
            SELECT doc_id, n_tokens,
                   CAST(start // 2048 AS BIGINT) AS seq_id,
                   CAST(start % 2048 AS BIGINT) AS seq_offset
            FROM s
        """,
        "clean_corpus": f"""
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS p
                FROM documents),
            bg AS (
                SELECT doc_id,
                       w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS b2
                FROM w QUALIFY b2 IS NOT NULL),
            bstat AS (
                SELECT doc_id, count(*) AS n_bg, count(DISTINCT b2) AS nd_bg
                FROM bg GROUP BY doc_id),
            wstat AS (
                SELECT doc_id, count(*) AS n_words, count(DISTINCT w) AS nd_w
                FROM w GROUP BY doc_id),
            base AS (
                SELECT d.doc_id, d.source, d.text,
                       s.n_words,
                       length(replace(d.text, ' ', ''))
                           / CAST(greatest(s.n_words, 1) AS DOUBLE) AS mean_wl,
                       (CASE WHEN ' ' || d.text || ' ' LIKE '% the %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% a %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% of %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% to %' THEN 1 ELSE 0 END
                        + CASE WHEN ' ' || d.text || ' ' LIKE '% and %' THEN 1 ELSE 0 END)
                           AS stop_hits,
                       1.0 - s.nd_w / CAST(greatest(s.n_words, 1) AS DOUBLE)
                           AS dup_word,
                       coalesce(1.0 - b.nd_bg / CAST(b.n_bg AS DOUBLE), 0.0)
                           AS dup_2gram
                FROM documents d
                JOIN wstat s ON s.doc_id = d.doc_id
                LEFT JOIN bstat b ON b.doc_id = d.doc_id),
            pass AS (
                SELECT doc_id, source, text FROM base
                WHERE n_words BETWEEN 20 AND 10000
                  AND mean_wl BETWEEN 3.0 AND 10.0
                  AND stop_hits >= 2
                  AND dup_word <= 0.6
                  AND dup_2gram <= 0.1),
            ded AS (
                SELECT min(doc_id) AS doc_id,
                       arg_min(source, doc_id) AS source,
                       text,
                       CAST(count(*) AS BIGINT) AS n_dups
                FROM pass GROUP BY text)
            SELECT doc_id, source,
                   regexp_replace(
                       regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                       '[0-9]+', '<NUM>', 'g') AS clean_text,
                   n_dups
            FROM ded
        """,
        "length_batches": """
            WITH t AS (
                SELECT doc_id,
                       CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS BIGINT) AS n_tokens
                FROM documents),
            r AS (
                SELECT doc_id, n_tokens,
                       row_number() OVER (ORDER BY n_tokens DESC, doc_id)
                           - 1 AS rank
                FROM t)
            SELECT doc_id, n_tokens,
                   CAST(rank // 16 AS BIGINT) AS batch_idx,
                   CAST(rank % 16 AS BIGINT) AS pos_in_batch
            FROM r
        """,
        "stratified_sample": _stratified_sample_sql(),
        "reservoir_sample": """
            SELECT doc_id, source FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            LIMIT 100
        """,
        "grouped_reservoir": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rk
                FROM documents)
            WHERE rk <= 20
        """,
        "training_shuffle": f"""
            WITH k AS (
                SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sort_key
                FROM documents),
            s AS (
                SELECT doc_id, sort_key,
                       CAST(('0x' || substr(sort_key, 1, 8))::BIGINT
                            % {_SHUFFLE_SHARDS} AS BIGINT) AS shard
                FROM k)
            SELECT doc_id, shard, sort_key,
                   CAST(row_number() OVER (PARTITION BY shard ORDER BY sort_key)
                        - 1 AS BIGINT) AS pos
            FROM s
        """,
        "redact_text": f"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT)
                       AS n_emails,
                   CAST(length(regexp_extract_all(
                        regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                        '[0-9]+')) AS BIGINT) AS n_numbers,
                   regexp_replace(
                       regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                       '[0-9]+', '<NUM>', 'g') AS clean_text
            FROM documents
        """,
        "doc_chunks": """
            WITH t AS (
                SELECT doc_id,
                       CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS BIGINT) AS n
                FROM documents),
            c AS (
                SELECT doc_id, n,
                       CASE WHEN n <= 32 THEN 1
                            ELSE (n - 32 + 23) // 24 + 1 END AS n_chunks
                FROM t),
            e AS (
                SELECT doc_id, n, n_chunks,
                       unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
                FROM c)
            SELECT doc_id,
                   CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   CAST(chunk_idx * 24 AS BIGINT) AS tok_start,
                   CAST(least(chunk_idx * 24 + 32, n) AS BIGINT) AS tok_end,
                   CAST(n_chunks AS BIGINT) AS n_chunks
            FROM e
        """,
        "token_count_total": """
            SELECT CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
                   AS total_tokens
            FROM documents
        """,
        "ann_lsh": f"""
            WITH ex AS (
                SELECT vec_id,
                       unnest(CAST(embedding AS DOUBLE[])) AS x,
                       unnest(generate_series(0, len(embedding) - 1)) AS d
                FROM embeddings),
            q AS (SELECT vec_id, d,
                         CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS qx
                  FROM ex),
            pl AS (
                SELECT d, p,
                       CASE WHEN (strpos('0123456789abcdef',
                                         substr(md5(d || '_' || p), 1, 1)) - 1)
                                 & 1 = 1
                            THEN 1 ELSE -1 END AS w
                FROM generate_series(0, 63) AS t1(d),
                     generate_series(0, 5) AS t2(p)),
            dots AS (
                SELECT q.vec_id, pl.p, SUM(q.qx * pl.w) AS dot
                FROM q JOIN pl USING (d) GROUP BY q.vec_id, pl.p),
            buck AS (
                SELECT vec_id,
                       CAST(SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END)
                            AS UBIGINT) AS bkt
                FROM dots GROUP BY vec_id),
            cand AS (
                SELECT qb.vec_id AS query_id, vb.vec_id
                FROM buck qb JOIN buck vb
                  ON bit_count(xor(qb.bkt, vb.bkt)) <= 2
                WHERE qb.vec_id < {nq}),
            s AS (
                SELECT c.query_id, c.vec_id,
                       list_cosine_similarity(
                           CAST(eq.embedding AS DOUBLE[]),
                           CAST(ev.embedding AS DOUBLE[])) AS cos
                FROM cand c
                JOIN embeddings eq ON eq.vec_id = c.query_id
                JOIN embeddings ev ON ev.vec_id = c.vec_id),
            r AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id) - 1 AS rank
                FROM s)
            SELECT query_id, vec_id,
                   floor(cos * 1000000 + 0.501) / 1000000 AS cosine,
                   rank
            FROM r WHERE rank < {k}
        """,
        "ann_brute_force": f"""
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < {nq}),
            s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
                FROM q CROSS JOIN embeddings e),
            r AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id) - 1 AS rank
                FROM s)
            SELECT query_id, vec_id,
                   floor(cos * 1000000 + 0.501) / 1000000 AS cosine,
                   rank
            FROM r WHERE rank < {k}
        """,
        "bm25_search": f"""
            WITH docs AS (
                SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            dl AS (SELECT doc_id, len(l) AS dl FROM docs),
            st AS (SELECT count(*) AS n_docs,
                          CAST(sum(len(l)) AS DOUBLE) / count(*) AS avgdl
                   FROM docs),
            toks AS (SELECT doc_id, unnest(l) AS w FROM docs),
            qt(query_id, term) AS (VALUES {bm25_qt}),
            df AS (SELECT w AS term,
                          CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                   FROM toks WHERE w IN (SELECT term FROM qt) GROUP BY 1),
            tf AS (SELECT doc_id, w AS term, CAST(count(*) AS DOUBLE) AS tf
                   FROM toks WHERE w IN (SELECT term FROM qt) GROUP BY 1, 2),
            sc AS (
                SELECT qt.query_id, tf.doc_id,
                       sum( ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                            * (tf.tf * (1.2 + 1.0)
                               / (tf.tf + 1.2 * (1.0 - 0.75
                                                 + 0.75 * dl.dl / st.avgdl)))
                       ) AS score
                FROM qt
                JOIN tf USING (term)
                JOIN df USING (term)
                JOIN dl ON dl.doc_id = tf.doc_id, st
                GROUP BY 1, 2),
            r AS (SELECT query_id, doc_id, score,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY score DESC, doc_id) AS rank
                  FROM sc)
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
                   floor(score * 1000000 + 0.501) / 1000000 AS score,
                   rank
            FROM r WHERE rank <= {BM25_K}
        """,
        "pmi_bigrams": """
            WITH docs AS (
                SELECT string_split(text, ' ') AS l FROM documents),
            ucnt AS (
                SELECT w, CAST(count(*) AS DOUBLE) AS c
                FROM (SELECT unnest(l) AS w FROM docs) GROUP BY 1),
            ut AS (SELECT sum(c) AS t FROM ucnt),
            bcnt AS (
                SELECT z[1] AS w1, z[2] AS w2,
                       CAST(count(*) AS DOUBLE) AS c
                FROM (SELECT unnest(list_zip(l, l[2:])) AS z FROM docs)
                WHERE z[2] IS NOT NULL
                GROUP BY 1, 2),
            bt AS (SELECT sum(c) AS t FROM bcnt),
            sc AS (
                SELECT b.w1, b.w2, CAST(b.c AS BIGINT) AS c12,
                       ln((b.c / bt.t)
                          / ((u1.c / ut.t) * (u2.c / ut.t))) AS pmi
                FROM bcnt b
                JOIN ucnt u1 ON u1.w = b.w1
                JOIN ucnt u2 ON u2.w = b.w2, ut, bt
                WHERE b.c >= 5),
            r AS (SELECT w1, w2, c12, pmi,
                         row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank
                  FROM sc)
            SELECT w1, w2, c12,
                   floor(pmi * 1000000 + 0.501) / 1000000 AS pmi,
                   rank
            FROM r WHERE rank <= 20
        """,
        "lang_id": _LANG_ID_SQL_BODY
        + """
            SELECT doc_id, pred_lang, n_hits FROM best WHERE rn = 1
        """,
        "lang_confusion": _LANG_ID_SQL_BODY
        + """
            SELECT d.lang, b.pred_lang,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM best b JOIN documents d USING (doc_id)
            WHERE b.rn = 1
            GROUP BY 1, 2
        """,
        "kg_communities": _lpa_oracle_sql(c01),
        "embedding_top_component": _powerit_oracle_sql(),
        "kg_kcore": f"""
            WITH raw AS MATERIALIZED (
                SELECT h_qid AS s, t_qid AS t
                FROM read_parquet('{c01}/kg_triples.parquet')),
            e0 AS MATERIALIZED (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM raw WHERE s <> t),
            d0 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e0
                    UNION ALL SELECT b FROM e0)
                GROUP BY q),
            alive0 AS MATERIALIZED (SELECT q FROM d0 WHERE d >= 3),
            e1 AS MATERIALIZED (
                SELECT e.a, e.b FROM e0 e
                JOIN alive0 x ON x.q = e.a
                JOIN alive0 y ON y.q = e.b),
            d1 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e1
                    UNION ALL SELECT b FROM e1)
                GROUP BY q),
            alive1 AS MATERIALIZED (SELECT q FROM d1 WHERE d >= 3),
            e2 AS MATERIALIZED (
                SELECT e.a, e.b FROM e1 e
                JOIN alive1 x ON x.q = e.a
                JOIN alive1 y ON y.q = e.b),
            d2 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e2
                    UNION ALL SELECT b FROM e2)
                GROUP BY q),
            alive2 AS MATERIALIZED (SELECT q FROM d2 WHERE d >= 3),
            e3 AS MATERIALIZED (
                SELECT e.a, e.b FROM e2 e
                JOIN alive2 x ON x.q = e.a
                JOIN alive2 y ON y.q = e.b),
            d3 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e3
                    UNION ALL SELECT b FROM e3)
                GROUP BY q),
            alive3 AS MATERIALIZED (SELECT q FROM d3 WHERE d >= 3),
            e4 AS MATERIALIZED (
                SELECT e.a, e.b FROM e3 e
                JOIN alive3 x ON x.q = e.a
                JOIN alive3 y ON y.q = e.b),
            d4 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e4
                    UNION ALL SELECT b FROM e4)
                GROUP BY q),
            alive4 AS MATERIALIZED (SELECT q FROM d4 WHERE d >= 3),
            e5 AS MATERIALIZED (
                SELECT e.a, e.b FROM e4 e
                JOIN alive4 x ON x.q = e.a
                JOIN alive4 y ON y.q = e.b),
            d5 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e5
                    UNION ALL SELECT b FROM e5)
                GROUP BY q),
            alive5 AS MATERIALIZED (SELECT q FROM d5 WHERE d >= 3),
            e6 AS MATERIALIZED (
                SELECT e.a, e.b FROM e5 e
                JOIN alive5 x ON x.q = e.a
                JOIN alive5 y ON y.q = e.b),
            d6 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e6
                    UNION ALL SELECT b FROM e6)
                GROUP BY q),
            alive6 AS MATERIALIZED (SELECT q FROM d6 WHERE d >= 3),
            e7 AS MATERIALIZED (
                SELECT e.a, e.b FROM e6 e
                JOIN alive6 x ON x.q = e.a
                JOIN alive6 y ON y.q = e.b),
            d7 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e7
                    UNION ALL SELECT b FROM e7)
                GROUP BY q),
            alive7 AS MATERIALIZED (SELECT q FROM d7 WHERE d >= 3),
            e8 AS MATERIALIZED (
                SELECT e.a, e.b FROM e7 e
                JOIN alive7 x ON x.q = e.a
                JOIN alive7 y ON y.q = e.b),
            d8 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e8
                    UNION ALL SELECT b FROM e8)
                GROUP BY q),
            alive8 AS MATERIALIZED (SELECT q FROM d8 WHERE d >= 3),
            e9 AS MATERIALIZED (
                SELECT e.a, e.b FROM e8 e
                JOIN alive8 x ON x.q = e.a
                JOIN alive8 y ON y.q = e.b),
            d9 AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e9
                    UNION ALL SELECT b FROM e9)
                GROUP BY q),
            alive9 AS MATERIALIZED (SELECT q FROM d9 WHERE d >= 3),
            e10 AS MATERIALIZED (
                SELECT e.a, e.b FROM e9 e
                JOIN alive9 x ON x.q = e.a
                JOIN alive9 y ON y.q = e.b),
            dfin AS MATERIALIZED (
                SELECT q, count(*) AS d FROM (
                    SELECT a AS q FROM e10
                    UNION ALL SELECT b FROM e10)
                GROUP BY q)
            SELECT q AS qid, CAST(d AS BIGINT) AS degree
            FROM dfin WHERE d >= 3
        """,
        "kg_triangles": f"""
            WITH raw AS (
                SELECT h_qid AS s, t_qid AS t
                FROM read_parquet('{c01}/kg_triples.parquet')),
            ed AS (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM raw WHERE s <> t),
            wg AS (
                SELECT e1.b AS a, e2.b AS b
                FROM ed e1 JOIN ed e2 ON e1.a = e2.a AND e1.b < e2.b)
            SELECT (SELECT count(*) FROM ed) AS n_edges,
                   (SELECT count(*) FROM wg) AS n_wedges,
                   (SELECT count(*) FROM wg JOIN ed USING (a, b))
                       AS n_triangles
        """,
        "kg_clustering_coef": f"""
            WITH ccf_raw AS (
                SELECT h_qid AS s, t_qid AS t
                FROM read_parquet('{c01}/kg_triples.parquet')),
            ccf_ed AS (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM ccf_raw WHERE s <> t),
            ccf_deg AS (
                SELECT qid, count(*) AS deg
                FROM (SELECT a AS qid FROM ccf_ed
                      UNION ALL SELECT b FROM ccf_ed)
                GROUP BY qid),
            ccf_tr AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM ccf_ed e1
                JOIN ccf_ed e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN ccf_ed e3 ON e3.a = e1.b AND e3.b = e2.b),
            ccf_tc AS (
                SELECT qid, count(*) AS tri
                FROM (SELECT x AS qid FROM ccf_tr
                      UNION ALL SELECT y FROM ccf_tr
                      UNION ALL SELECT z FROM ccf_tr)
                GROUP BY qid)
            SELECT d.qid,
                   CAST(d.deg AS BIGINT) AS degree,
                   CAST(COALESCE(t.tri, 0) AS BIGINT) AS n_tri,
                   {sql_round('CASE WHEN d.deg >= 2 THEN 2.0 * COALESCE(t.tri, 0) / (d.deg * (d.deg - 1.0)) ELSE 0.0 END', 6)} AS coef
            FROM ccf_deg d LEFT JOIN ccf_tc t USING (qid)
        """,
        "kg_hits": _hits_sql(c01),
        "kg_reachability": _reach_sql(c01),
        "kg_hyperball": _hyperball_sql(c01),
        "kg_meta_paths": f"""
            WITH mp_e AS (SELECT DISTINCT h_qid AS h, prop AS r, t_qid AS t
                          FROM read_parquet('{c01}/kg_triples.parquet')),
            mp_p AS (SELECT e1.r AS r1, e2.r AS r2, e1.h AS a, e2.t AS c,
                            count(*) AS np
                     FROM mp_e e1 JOIN mp_e e2 ON e1.t = e2.h
                     GROUP BY 1, 2, 3, 4),
            mp_d AS (SELECT DISTINCT h, t FROM mp_e)
            SELECT r1, r2,
                   CAST(sum(np) AS BIGINT) AS n_paths,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_closed,
                   {sql_round('sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*)', 6)}
                       AS support
            FROM mp_p p LEFT JOIN mp_d d ON d.h = p.a AND d.t = p.c
            GROUP BY r1, r2
        """,
        "kg_schema_profile": f"""
            WITH sp_io AS (SELECT qid, min(attr_val) AS ty
                           FROM read_parquet('{c01}/kg_attrs.parquet')
                           WHERE attr_key = 'instance of'
                           GROUP BY qid)
            SELECT e.prop AS pred,
                   coalesce(h.ty, '') AS h_type,
                   coalesce(t.ty, '') AS t_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('{c01}/kg_triples.parquet') e
            LEFT JOIN sp_io h ON h.qid = e.h_qid
            LEFT JOIN sp_io t ON t.qid = e.t_qid
            GROUP BY 1, 2, 3
        """,
        "scd2_history": """
            WITH sc_s AS (SELECT user_id, event_type, event_id,
                                 epoch_us(ts) AS tus,
                                 lag(event_type) OVER (
                                     PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev
                          FROM events),
            sc_r AS (SELECT user_id, event_type, tus, event_id
                     FROM sc_s
                     WHERE prev IS NULL OR prev <> event_type)
            SELECT user_id, event_type AS state,
                   CAST(tus AS BIGINT) AS valid_from_us,
                   CAST(coalesce(lead(tus) OVER (
                            PARTITION BY user_id
                            ORDER BY tus, event_id), -1)
                        AS BIGINT) AS valid_to_us
            FROM sc_r
        """,
        "late_events": """
            WITH la_a AS (
                SELECT event_id, user_id, event_type, epoch_us(ts) AS t,
                       epoch_us(ts)
                       + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                              1, 13)) AS BIGINT)
                         % 14400000000 AS arr
                FROM events),
            la_w AS (
                SELECT event_id, user_id, event_type, t,
                       max(t) OVER (ORDER BY arr, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS wm
                FROM la_a)
            SELECT event_id, user_id, event_type,
                   CAST(wm - t AS BIGINT) AS lateness_us
            FROM la_w WHERE wm - t > 3600000000
        """,
        "window_dedup": """
            WITH wd AS (
                SELECT event_id, user_id, event_type, epoch_us(ts) AS t,
                       lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY epoch_us(ts), event_id) AS p
                FROM events)
            SELECT event_id, user_id, event_type,
                   CAST(coalesce(t - p, -1) AS BIGINT) AS prev_gap_us
            FROM wd WHERE p IS NULL OR t - p > 86400000000
        """,
        "docsim_cosine": f"""
            WITH dsc_l AS (SELECT doc_id, string_split(text, ' ') AS l
                           FROM documents),
            dsc_w AS (SELECT doc_id, generate_subscripts(l, 1) AS i,
                             unnest(l) AS w
                      FROM dsc_l),
            dsc_t AS (SELECT a.doc_id,
                             a.w || ' ' || b.w || ' ' || c.w AS term
                      FROM dsc_w a
                      JOIN dsc_w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                      JOIN dsc_w c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            dsc_tf AS (SELECT doc_id, term, count(*) AS tf
                       FROM dsc_t GROUP BY 1, 2),
            dsc_df AS (SELECT term, count(*) AS df FROM dsc_tf GROUP BY 1),
            dsc_n AS (SELECT count(*) AS n FROM documents),
            dsc_wt AS (SELECT tf.doc_id, tf.term,
                              tf.tf * ln(dsc_n.n * 1.0 / df.df) AS w
                       FROM dsc_tf tf
                       JOIN dsc_df df USING (term), dsc_n
                       WHERE df.df BETWEEN 2 AND 20),
            dsc_nm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm
                       FROM dsc_wt GROUP BY 1),
            dsc_dot AS (SELECT p1.doc_id AS doc_a, p2.doc_id AS doc_b,
                               count(*) AS n_shared_terms,
                               sum(p1.w * p2.w) AS dot
                        FROM dsc_wt p1
                        JOIN dsc_wt p2 ON p2.term = p1.term
                                      AND p1.doc_id < p2.doc_id
                        GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   CAST(n_shared_terms AS BIGINT) AS n_shared_terms,
                   {sql_round('d.dot / (na.nrm * nb.nrm)', 6)} AS cosine
            FROM dsc_dot d
            JOIN dsc_nm na ON na.doc_id = d.doc_a
            JOIN dsc_nm nb ON nb.doc_id = d.doc_b
            WHERE {sql_round('d.dot / (na.nrm * nb.nrm)', 6)} >= 0.4
        """,
        "knn_classify": """
            WITH kc_f AS (SELECT vec_id,
                                 generate_subscripts(embedding, 1) AS dim,
                                 CAST(unnest(embedding) AS DOUBLE) AS x
                          FROM embeddings),
            kc_s AS (SELECT dim,
                            CASE WHEN max(abs(x)) > 0
                                 THEN 127.0 / max(abs(x)) ELSE 0.0 END AS scale
                     FROM kc_f GROUP BY dim),
            kc_c AS (SELECT f.vec_id, f.dim,
                            CAST(floor(f.x * s.scale + 0.501) AS BIGINT)
                                AS code
                     FROM kc_f f JOIN kc_s s USING (dim)),
            kc_dot AS (SELECT a.vec_id AS q, b.vec_id AS v,
                              sum(a.code * b.code) AS dot
                       FROM kc_c a
                       JOIN kc_c b ON b.dim = a.dim
                                  AND b.vec_id <> a.vec_id
                       GROUP BY 1, 2),
            kc_top AS (SELECT q, v
                       FROM (SELECT q, v,
                                    row_number() OVER (
                                        PARTITION BY q
                                        ORDER BY dot DESC, v) AS r
                             FROM kc_dot)
                       WHERE r <= 5),
            kc_vote AS (SELECT t.q, e.label, count(*) AS c
                        FROM kc_top t
                        JOIN embeddings e ON e.vec_id = t.v
                        GROUP BY 1, 2),
            kc_pred AS (SELECT q, label
                        FROM (SELECT q, label,
                                     row_number() OVER (
                                         PARTITION BY q
                                         ORDER BY c DESC, label) AS r
                              FROM kc_vote)
                        WHERE r = 1)
            SELECT p.q AS vec_id,
                   CAST(e.label AS BIGINT) AS true_label,
                   CAST(p.label AS BIGINT) AS pred_label,
                   CAST(e.label = p.label AS BIGINT) AS correct
            FROM kc_pred p JOIN embeddings e ON e.vec_id = p.q
        """,
        "source_js_divergence": f"""
            WITH sjd_t AS (SELECT source AS s, unnest(string_split(text, ' ')) AS w
                           FROM documents),
            sjd_c AS (SELECT s, w, count(*) AS c FROM sjd_t GROUP BY 1, 2),
            sjd_n AS (SELECT s, sum(c) AS n FROM sjd_c GROUP BY 1),
            sjd_p AS (SELECT a.s AS sa, b.s AS sb, a.n AS na, b.n AS nb
                      FROM sjd_n a JOIN sjd_n b ON a.s < b.s),
            sjd_w AS (SELECT DISTINCT w FROM sjd_c),
            sjd_u AS (SELECT p.sa, p.sb, p.na, p.nb, w.w,
                             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
                      FROM sjd_p p
                      CROSS JOIN sjd_w w
                      LEFT JOIN sjd_c ca ON ca.s = p.sa AND ca.w = w.w
                      LEFT JOIN sjd_c cb ON cb.s = p.sb AND cb.w = w.w
                      WHERE COALESCE(ca.c, 0) + COALESCE(cb.c, 0) > 0),
            sjd_j AS (SELECT sa, sb, max(na) AS na, max(nb) AS nb,
                             sum(CASE WHEN ca > 0 THEN
                                   0.5 * (ca * 1.0 / na)
                                       * log2((ca * 1.0 / na)
                                              / ((ca * 1.0 / na + cb * 1.0 / nb) / 2))
                                 ELSE 0 END
                               + CASE WHEN cb > 0 THEN
                                   0.5 * (cb * 1.0 / nb)
                                       * log2((cb * 1.0 / nb)
                                              / ((ca * 1.0 / na + cb * 1.0 / nb) / 2))
                                 ELSE 0 END) AS js
                      FROM sjd_u GROUP BY sa, sb)
            SELECT sa AS source_a, sb AS source_b,
                   CAST(na AS BIGINT) AS n_tokens_a,
                   CAST(nb AS BIGINT) AS n_tokens_b,
                   {sql_round('js', 6)} AS js_bits
            FROM sjd_j
        """,
        "l_diversity": """
            WITH ld_g AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                       count(*) AS n_rows,
                       count(DISTINCT user_id) AS l
                FROM events GROUP BY 1, 2),
            ld_k(l) AS (VALUES (2), (3), (5), (10))
            SELECT CAST(k.l AS BIGINT) AS l,
                   CAST(count(*) FILTER (g.l < k.l) AS BIGINT)
                       AS n_groups_below,
                   CAST(COALESCE(sum(g.n_rows) FILTER (g.l < k.l), 0)
                        AS BIGINT) AS n_rows_at_risk
            FROM ld_k k CROSS JOIN ld_g g
            GROUP BY k.l
        """,
        "theilsen_trend": f"""
            WITH tst_d AS (SELECT event_type,
                                  CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                                      AS day,
                                  count(*) AS c
                           FROM events GROUP BY 1, 2),
            tst_p AS (SELECT a.event_type,
                             (b.c - a.c) * 1.0 / (b.day - a.day) AS s
                      FROM tst_d a
                      JOIN tst_d b ON b.event_type = a.event_type
                                  AND b.day > a.day),
            tst_m AS (SELECT event_type, median(s) AS slope
                      FROM tst_p GROUP BY 1),
            tst_i AS (SELECT d.event_type,
                             median(d.c - m.slope * d.day) AS ic,
                             count(*) AS n_days
                      FROM tst_d d JOIN tst_m m USING (event_type)
                      GROUP BY 1)
            SELECT i.event_type, CAST(i.n_days AS BIGINT) AS n_days,
                   {sql_round('m.slope', 6)} AS slope,
                   {sql_round('i.ic', 6)} AS intercept
            FROM tst_i i JOIN tst_m m USING (event_type)
            WHERE i.n_days >= 2
        """,
        "changepoint_cusum": f"""
            WITH cp_d AS (SELECT event_type,
                                 CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                                     AS day,
                                 count(*) AS c
                          FROM events GROUP BY 1, 2),
            cp_m AS (SELECT event_type, avg(c) AS mu, count(*) AS n_days
                     FROM cp_d GROUP BY 1),
            cp_c AS (SELECT d.event_type, d.day, m.n_days,
                            sum(d.c - m.mu) OVER (PARTITION BY d.event_type
                                                  ORDER BY d.day) AS dev
                     FROM cp_d d JOIN cp_m m USING (event_type)),
            cp_r AS (SELECT event_type, day, n_days, abs(dev) AS mag,
                            row_number() OVER (PARTITION BY event_type
                                               ORDER BY abs(dev) DESC, day)
                                AS rn
                     FROM cp_c)
            SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
                   day AS change_day, {sql_round('mag', 6)} AS cusum_max
            FROM cp_r WHERE rn = 1
        """,
        "dp_histogram": f"""
            WITH dph_c AS (SELECT event_type, count(*) AS n
                           FROM events GROUP BY 1),
            dph_u AS (SELECT event_type, n,
                             CAST(('0x' || substr(md5('dp|' || event_type),
                                                  1, 13)) AS BIGINT)
                                 / 4503599627370496.0 AS u
                      FROM dph_c)
            SELECT event_type,
                   {sql_round(
                       "n + (-2.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))",
                       6,
                   )} AS noisy_count,
                   0.5 AS epsilon
            FROM dph_u
        """,
        "fk_integrity": """
            WITH fk_u AS (
                SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS rel,
                       l_orderkey AS k,
                       (SELECT count(*) FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey) > 0 AS ok
                FROM lineitem l
                UNION ALL
                SELECT 'lineitem.l_partkey->part.p_partkey', l_partkey,
                       (SELECT count(*) FROM part p
                        WHERE p.p_partkey = l.l_partkey) > 0
                FROM lineitem l
                UNION ALL
                SELECT 'lineitem.l_suppkey->supplier.s_suppkey', l_suppkey,
                       (SELECT count(*) FROM supplier s
                        WHERE s.s_suppkey = l.l_suppkey) > 0
                FROM lineitem l
                UNION ALL
                SELECT 'orders.o_custkey->customer.c_custkey', o_custkey,
                       (SELECT count(*) FROM customer c
                        WHERE c.c_custkey = o.o_custkey) > 0
                FROM orders o
                UNION ALL
                SELECT 'customer.c_nationkey->nation.n_nationkey', c_nationkey,
                       (SELECT count(*) FROM nation n
                        WHERE n.n_nationkey = c.c_nationkey) > 0
                FROM customer c
                UNION ALL
                SELECT 'supplier.s_nationkey->nation.n_nationkey', s_nationkey,
                       (SELECT count(*) FROM nation n
                        WHERE n.n_nationkey = s.s_nationkey) > 0
                FROM supplier s
                UNION ALL
                SELECT 'nation.n_regionkey->region.r_regionkey', n_regionkey,
                       (SELECT count(*) FROM region r
                        WHERE r.r_regionkey = n.n_regionkey) > 0
                FROM nation n
                UNION ALL
                SELECT 'events.user_id->customer.c_custkey', user_id,
                       (SELECT count(*) FROM customer c
                        WHERE c.c_custkey = e.user_id) > 0
                FROM events e)
            SELECT rel,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
                   CAST(count(*) FILTER (NOT ok) AS BIGINT) AS n_orphan_rows,
                   CAST(count(DISTINCT k) FILTER (NOT ok) AS BIGINT)
                       AS n_orphan_keys
            FROM fk_u GROUP BY rel
        """,
        "sorted_neighborhood": f"""
            WITH snj AS (SELECT DISTINCT c_name AS name FROM customer),
            snr AS (SELECT name, row_number() OVER (ORDER BY name) AS rk
                    FROM snj),
            snp AS (SELECT a.name AS name_a, b.name AS name_b,
                           jaro_winkler_similarity(a.name, b.name) AS jw
                    FROM snr a
                    JOIN snr b ON b.rk > a.rk AND b.rk <= a.rk + 5)
            SELECT name_a, name_b, {sql_round('jw', 6)} AS jw
            FROM snp WHERE {sql_round('jw', 6)} >= 0.96
        """,
        "kg_components": f"""
            WITH RECURSIVE kc_raw AS (
                SELECT h_qid, t_qid
                FROM read_parquet('{c01}/kg_triples.parquet')),
            kc_e AS (
                SELECT h_qid AS u, t_qid AS v FROM kc_raw
                UNION
                SELECT t_qid, h_qid FROM kc_raw),
            kc_reach(u, v) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM kc_e)
                UNION
                SELECT e.u, r.v FROM kc_e e JOIN kc_reach r ON r.u = e.v)
            SELECT u AS node, min(v) AS label
            FROM kc_reach GROUP BY u
        """,
        "events_window_quantiles": f"""
            WITH ewq AS (SELECT event_type,
                                epoch_us(ts) // 86400000000 AS w,
                                value
                         FROM events)
            SELECT event_type, CAST(w AS BIGINT) AS w,
                   CAST(count(*) AS BIGINT) AS n,
                   0.5 AS q, {sql_round('quantile_cont(value, 0.5)', 6)} AS value
            FROM ewq GROUP BY event_type, w
            UNION ALL
            SELECT event_type, CAST(w AS BIGINT) AS w,
                   CAST(count(*) AS BIGINT) AS n,
                   0.95 AS q, {sql_round('quantile_cont(value, 0.95)', 6)} AS value
            FROM ewq GROUP BY event_type, w
        """,
        "user_rfm": f"""
            WITH rfm_u AS (SELECT user_id,
                                  CAST(count(*) AS BIGINT) AS f_events,
                                  {sql_round('sum(value)', 6)} AS m_value,
                                  max(epoch_us(ts) // 86400000000) AS last_day
                           FROM events GROUP BY user_id),
            rfm_r AS (SELECT user_id, f_events, m_value,
                             (SELECT max(last_day) FROM rfm_u) - last_day
                                 AS r_days
                      FROM rfm_u),
            rfm_q AS (SELECT quantile_cont(CAST(r_days AS DOUBLE), 0.25) AS r1,
                             quantile_cont(CAST(r_days AS DOUBLE), 0.5)  AS r2,
                             quantile_cont(CAST(r_days AS DOUBLE), 0.75) AS r3,
                             quantile_cont(CAST(f_events AS DOUBLE), 0.25) AS f1,
                             quantile_cont(CAST(f_events AS DOUBLE), 0.5)  AS f2,
                             quantile_cont(CAST(f_events AS DOUBLE), 0.75) AS f3,
                             quantile_cont(m_value, 0.25) AS m1,
                             quantile_cont(m_value, 0.5)  AS m2,
                             quantile_cont(m_value, 0.75) AS m3
                      FROM rfm_r)
            SELECT user_id,
                   CAST(r_days AS BIGINT) AS r_days,
                   f_events,
                   m_value,
                   CAST(1 + (r_days > q.r1)::INT + (r_days > q.r2)::INT
                          + (r_days > q.r3)::INT AS BIGINT) AS r_code,
                   CAST(1 + (f_events > q.f1)::INT + (f_events > q.f2)::INT
                          + (f_events > q.f3)::INT AS BIGINT) AS f_code,
                   CAST(1 + (m_value > q.m1)::INT + (m_value > q.m2)::INT
                          + (m_value > q.m3)::INT AS BIGINT) AS m_code
            FROM rfm_r, rfm_q q
        """,
        "events_dow_chisq": f"""
            WITH dc AS (SELECT event_type,
                               (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                               count(*) AS c
                        FROM events GROUP BY 1, 2),
            dct AS (SELECT event_type, sum(c) AS n FROM dc GROUP BY 1),
            dcg AS (SELECT t.event_type, t.n, d.dow,
                           coalesce(dc.c, 0) AS c
                    FROM dct t
                    CROSS JOIN (SELECT unnest(range(7)) AS dow) d
                    LEFT JOIN dc ON dc.event_type = t.event_type
                                AND dc.dow = d.dow)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   {sql_round('sum((c - n / 7.0) * (c - n / 7.0) / (n / 7.0))', 6)}
                       AS chi2,
                   CAST(6 AS BIGINT) AS dof
            FROM dcg
            GROUP BY event_type, n
        """,
        "kg_degree_distribution": f"""
            WITH dd_e AS (SELECT DISTINCT h_qid AS s, t_qid AS t
                          FROM read_parquet('{c01}/kg_triples.parquet')),
            dd_d AS (SELECT s AS q, 'out' AS kind, count(*) AS d
                     FROM dd_e GROUP BY s
                     UNION ALL
                     SELECT t, 'in', count(*) FROM dd_e GROUP BY t)
            SELECT kind, CAST(d AS BIGINT) AS degree,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM dd_d GROUP BY kind, d
        """,
        "kg_pred_stats": f"""
            SELECT prop,
                   count(*) AS n_triples,
                   count(DISTINCT h_qid) AS n_heads,
                   count(DISTINCT t_qid) AS n_tails,
                   floor(count(DISTINCT h_qid) * 1.0 / count(*)
                         * 1000000 + 0.501) / 1000000 AS functionality,
                   floor(count(DISTINCT t_qid) * 1.0 / count(*)
                         * 1000000 + 0.501) / 1000000 AS inv_functionality
            FROM read_parquet('{c01}/kg_triples.parquet')
            GROUP BY prop
        """,
        "kg_ppr": _ppr_sql(c01),
        "kg_random_walks": _walks_sql(c01),
        "kg_negative_samples": f"""
            WITH nsed AS (SELECT h_qid, prop, t_qid
                          FROM read_parquet('{c01}/kg_triples.parquet')),
            nsn AS (SELECT q, row_number() OVER (ORDER BY q) - 1 AS idx
                    FROM (SELECT DISTINCT q FROM (
                        SELECT h_qid AS q FROM nsed
                        UNION ALL SELECT t_qid FROM nsed))),
            nscnt AS (SELECT count(*) AS n FROM nsn),
            nscand AS (
                SELECT e.h_qid, e.prop, e.t_qid, js.j,
                       ('0x' || substr(md5(e.h_qid || '|' || e.prop || '|'
                            || e.t_qid || '|' || js.j), 1, 13))::BIGINT
                           % (SELECT n FROM nscnt) AS ci
                FROM nsed e CROSS JOIN (SELECT unnest([1, 2]) AS j) js),
            nsneg AS (
                SELECT c.h_qid, c.prop, n.q AS t_neg,
                       CAST(c.j AS BIGINT) AS j, c.t_qid
                FROM nscand c JOIN nsn n ON n.idx = c.ci)
            SELECT h_qid, prop, t_neg, j FROM nsneg
            WHERE t_neg <> t_qid
              AND NOT EXISTS (SELECT 1 FROM nsed e
                              WHERE e.h_qid = nsneg.h_qid
                                AND e.prop = nsneg.prop
                                AND e.t_qid = nsneg.t_neg)
        """,
        "kg_link_eval": f"""
            WITH le AS (SELECT DISTINCT h_qid, prop, t_qid
                        FROM read_parquet('{c01}/kg_triples.parquet')),
            len0 AS (SELECT DISTINCT q FROM (
                        SELECT h_qid AS q FROM le
                        UNION ALL SELECT t_qid FROM le)),
            letest AS (SELECT * FROM le
                       WHERE ('0x' || substr(md5(h_qid || '|' || prop
                             || '|' || t_qid || '|eval'), 1, 13))::BIGINT
                             % 10 = 0),
            lehr AS (SELECT DISTINCT h_qid, prop FROM letest),
            lesc AS (SELECT hr.h_qid, hr.prop, n.q,
                            ('0x' || substr(md5(hr.h_qid || '|' || hr.prop
                                || '|' || n.q), 1, 13))::BIGINT AS s
                     FROM lehr hr CROSS JOIN len0 n),
            lecand AS (SELECT sc.h_qid, sc.prop, sc.q, sc.s FROM lesc sc
                       WHERE NOT EXISTS (SELECT 1 FROM le e
                             WHERE e.h_qid = sc.h_qid AND e.prop = sc.prop
                               AND e.t_qid = sc.q)),
            lets AS (SELECT e.h_qid, e.prop, e.t_qid, sc.s AS st
                     FROM letest e JOIN lesc sc
                       ON sc.h_qid = e.h_qid AND sc.prop = e.prop
                      AND sc.q = e.t_qid)
            SELECT t.h_qid, t.prop, t.t_qid,
                   CAST(1 + count(c.q) AS BIGINT) AS t_rank,
                   1.0 / (1 + count(c.q)) AS rr
            FROM lets t LEFT JOIN lecand c
              ON c.h_qid = t.h_qid AND c.prop = t.prop AND c.s > t.st
            GROUP BY t.h_qid, t.prop, t.t_qid
        """,
        "kg_link_eval_summary": f"""
            WITH le AS (SELECT DISTINCT h_qid, prop, t_qid
                        FROM read_parquet('{c01}/kg_triples.parquet')),
            len0 AS (SELECT DISTINCT q FROM (
                        SELECT h_qid AS q FROM le
                        UNION ALL SELECT t_qid FROM le)),
            letest AS (SELECT * FROM le
                       WHERE ('0x' || substr(md5(h_qid || '|' || prop
                             || '|' || t_qid || '|eval'), 1, 13))::BIGINT
                             % 10 = 0),
            lehr AS (SELECT DISTINCT h_qid, prop FROM letest),
            lesc AS (SELECT hr.h_qid, hr.prop, n.q,
                            ('0x' || substr(md5(hr.h_qid || '|' || hr.prop
                                || '|' || n.q), 1, 13))::BIGINT AS s
                     FROM lehr hr CROSS JOIN len0 n),
            lecand AS (SELECT sc.h_qid, sc.prop, sc.q, sc.s FROM lesc sc
                       WHERE NOT EXISTS (SELECT 1 FROM le e
                             WHERE e.h_qid = sc.h_qid AND e.prop = sc.prop
                               AND e.t_qid = sc.q)),
            lets AS (SELECT e.h_qid, e.prop, e.t_qid, sc.s AS st
                     FROM letest e JOIN lesc sc
                       ON sc.h_qid = e.h_qid AND sc.prop = e.prop
                      AND sc.q = e.t_qid),
            leranks AS (
                SELECT t.h_qid, t.prop, t.t_qid,
                       CAST(1 + count(c.q) AS BIGINT) AS t_rank
                FROM lets t LEFT JOIN lecand c
                  ON c.h_qid = t.h_qid AND c.prop = t.prop AND c.s > t.st
                GROUP BY t.h_qid, t.prop, t.t_qid),
            lesum AS (
                SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN t_rank <= 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS hits1,
                       CAST(sum(CASE WHEN t_rank <= 3 THEN 1 ELSE 0 END)
                            AS BIGINT) AS hits3,
                       CAST(sum(CASE WHEN t_rank <= 10 THEN 1 ELSE 0 END)
                            AS BIGINT) AS hits10,
                       CAST(sum(t_rank) AS BIGINT) AS sum_rank,
                       CAST(sum(CAST(floor(1000000000000.0 / t_rank)
                            AS BIGINT)) AS BIGINT) AS mrr_e12
                FROM leranks)
            SELECT n, hits1, hits3, hits10, sum_rank, mrr_e12,
                   CAST(mrr_e12 AS DOUBLE) / n / 1000000000000.0 AS mrr
            FROM lesum
        """,
        "kg_pagerank": f"""
            WITH edges AS (
                SELECT h_qid AS src, t_qid AS dst
                FROM read_parquet('{c01}/kg_triples.parquet')),
            nodes AS (
                SELECT DISTINCT q FROM (
                    SELECT src AS q FROM edges
                    UNION ALL SELECT dst FROM edges)),
            nn AS (SELECT count(*) AS n FROM nodes),
            outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
            r0 AS (SELECT q, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
            r1 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r0 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r2 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r1 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r3 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r2 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r4 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r3 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r5 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r4 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r6 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r5 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r7 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r6 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r8 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r7 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r9 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r8 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q),
            r10 AS (
                SELECT n.q,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * coalesce(s.contrib, 0.0) AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS q, sum(p.r / od.d) AS contrib
                    FROM edges e
                    JOIN r9 p ON p.q = e.src
                    JOIN outdeg od ON od.src = e.src
                    GROUP BY 1) s ON s.q = n.q)
            SELECT q AS qid,
                   floor(r * 1000000 + 0.501) / 1000000 AS rank
            FROM r10
        """,
        "hist_quantiles": """
            WITH st AS (
                SELECT event_type, min(value) AS mn, max(value) AS mx,
                       count(*) AS n
                FROM events GROUP BY 1),
            b AS (
                SELECT e.event_type,
                       CASE WHEN s.mx = s.mn THEN 0
                            ELSE least(CAST(floor((e.value - s.mn)
                                     / ((s.mx - s.mn) / 2048.0)) AS BIGINT),
                                       2047) END AS bin
                FROM events e JOIN st s USING (event_type)),
            h AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
            cum AS (
                SELECT event_type, bin, c,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY bin) AS cc
                FROM h),
            qv(q) AS (VALUES (0.5), (0.9), (0.99)),
            pick AS (
                SELECT c.event_type, q.q, c.bin, c.c, c.cc,
                       row_number() OVER (PARTITION BY c.event_type, q.q
                                          ORDER BY c.bin) AS rn
                FROM cum c JOIN st s USING (event_type), qv q
                WHERE CAST(c.cc AS DOUBLE) >= q.q * s.n),
            est AS (
                SELECT p.event_type, p.q,
                       CASE WHEN s.mx = s.mn THEN s.mn
                            ELSE s.mn + ((s.mx - s.mn) / 2048.0)
                                 * (p.bin + (p.q * s.n - (p.cc - p.c)) / p.c)
                       END AS est
                FROM pick p JOIN st s USING (event_type)
                WHERE p.rn = 1)
            SELECT event_type, q,
                   floor(est * 1000000 + 0.501) / 1000000 AS est
            FROM est
        """,
        "winsorize_events": """
            WITH st AS (
                SELECT event_type, min(value) AS mn, max(value) AS mx,
                       count(*) AS n
                FROM events GROUP BY 1),
            b AS (
                SELECT e.event_type,
                       CASE WHEN s.mx = s.mn THEN 0
                            ELSE least(CAST(floor((e.value - s.mn)
                                     / ((s.mx - s.mn) / 2048.0)) AS BIGINT),
                                       2047) END AS bin
                FROM events e JOIN st s USING (event_type)),
            h AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
            cum AS (
                SELECT event_type, bin, c,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY bin) AS cc
                FROM h),
            qv(q) AS (VALUES (0.01), (0.99)),
            pick AS (
                SELECT c.event_type, q.q, c.bin, c.c, c.cc,
                       row_number() OVER (PARTITION BY c.event_type, q.q
                                          ORDER BY c.bin) AS rn
                FROM cum c JOIN st s USING (event_type), qv q
                WHERE CAST(c.cc AS DOUBLE) >= q.q * s.n),
            est AS (
                SELECT p.event_type, p.q,
                       floor((CASE WHEN s.mx = s.mn THEN s.mn
                              ELSE s.mn + ((s.mx - s.mn) / 2048.0)
                                   * (p.bin + (p.q * s.n - (p.cc - p.c))
                                      / p.c)
                              END) * 1000000 + 0.501) / 1000000 AS est
                FROM pick p JOIN st s USING (event_type)
                WHERE p.rn = 1),
            lo AS (SELECT event_type, est AS lo FROM est WHERE q = 0.01),
            hi AS (SELECT event_type, est AS hi FROM est WHERE q = 0.99)
            SELECT e.event_id, e.event_type,
                   floor(greatest(l.lo, least(h.hi, e.value))
                         * 1000000 + 0.501) / 1000000 AS value
            FROM events e
            JOIN lo l USING (event_type) JOIN hi h USING (event_type)
        """,
        "bloom_filter_join": """
            WITH build AS (
                SELECT DISTINCT o_orderkey AS key FROM orders
                WHERE o_totalprice > 450000),
            rj AS (SELECT unnest(generate_series(0, 3)) AS j),
            bits AS (
                SELECT DISTINCT
                       CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '_'
                                                || CAST(key AS VARCHAR)),
                                            1, 15)) AS BIGINT) % 65536 AS pos
                FROM build, rj),
            pk AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
            pkj AS (
                SELECT pk.key,
                       CAST(('0x' || substr(md5(CAST(rj.j AS VARCHAR) || '_'
                                                || CAST(pk.key AS VARCHAR)),
                                            1, 15)) AS BIGINT) % 65536 AS pos
                FROM pk, rj),
            hit AS (
                SELECT pkj.key,
                       min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS pass
                FROM pkj LEFT JOIN bits b USING (pos)
                GROUP BY 1)
            SELECT count(*) AS n_probe,
                   CAST(sum(h.pass) AS BIGINT) AS n_pass,
                   CAST(sum(CASE WHEN bk.key IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
                   CAST(sum(CASE WHEN h.pass = 1 AND bk.key IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
            FROM lineitem l
            JOIN hit h ON h.key = l.l_orderkey
            LEFT JOIN build bk ON bk.key = l.l_orderkey
        """,
        "kmv_set_ops": """
            WITH keyed AS (
                SELECT event_type,
                       CAST(user_id AS VARCHAR) || '_'
                           || CAST(epoch_us(ts) // 86400000000 AS VARCHAR)
                           AS k
                FROM events
                WHERE event_type IN ('purchase', 'click')),
            ha AS (SELECT DISTINCT
                       CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) AS h
                   FROM keyed WHERE event_type = 'purchase'),
            hb AS (SELECT DISTINCT
                       CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) AS h
                   FROM keyed WHERE event_type = 'click'),
            ka AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha),
            kb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb),
            sa AS (SELECT h FROM ka WHERE rn <= 256),
            sb AS (SELECT h FROM kb WHERE rn <= 256),
            ku AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
                   FROM (SELECT h FROM sa UNION SELECT h FROM sb)),
            su AS (SELECT h FROM ku WHERE rn <= 256),
            e AS (
                SELECT
                    CASE WHEN (SELECT count(*) FROM sa) < 256
                         THEN (SELECT count(*) * 1.0 FROM sa)
                         ELSE 255 / ((SELECT max(h) FROM sa)
                                     / 1152921504606846976.0) END AS ea,
                    CASE WHEN (SELECT count(*) FROM sb) < 256
                         THEN (SELECT count(*) * 1.0 FROM sb)
                         ELSE 255 / ((SELECT max(h) FROM sb)
                                     / 1152921504606846976.0) END AS eb,
                    CASE WHEN (SELECT count(*) FROM su) < 256
                         THEN (SELECT count(*) * 1.0 FROM su)
                         ELSE 255 / ((SELECT max(h) FROM su)
                                     / 1152921504606846976.0) END AS eu)
            SELECT floor(ea * 1000000 + 0.501) / 1000000 AS est_a,
                   floor(eb * 1000000 + 0.501) / 1000000 AS est_b,
                   floor(eu * 1000000 + 0.501) / 1000000 AS est_union,
                   floor((ea + eb - eu) * 1000000 + 0.501) / 1000000
                       AS est_inter
            FROM e
        """,
        "join_size_estimate": """
            WITH ka AS (SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS n
                        FROM orders GROUP BY 1),
            kb AS (SELECT CAST(c_custkey AS VARCHAR) AS k, count(*) AS n
                   FROM customer GROUP BY 1),
            rws AS (SELECT unnest(generate_series(0, 2)) AS j),
            ha AS (SELECT k, n,
                          CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) AS h
                   FROM ka),
            hb AS (SELECT k, n,
                          CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) AS h
                   FROM kb),
            ca AS (SELECT r.j, (ha.h >> (16 * r.j)) % 65536 AS bucket,
                          sum(ha.n) AS c
                   FROM rws r CROSS JOIN ha GROUP BY 1, 2),
            cb AS (SELECT r.j, (hb.h >> (16 * r.j)) % 65536 AS bucket,
                          sum(hb.n) AS c
                   FROM rws r CROSS JOIN hb GROUP BY 1, 2),
            ip AS (SELECT ca.j, sum(ca.c * cb.c) AS x
                   FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
                   GROUP BY ca.j),
            ex AS (SELECT sum(ka.n * kb.n) AS exact
                   FROM ka JOIN kb USING (k))
            SELECT CAST((SELECT exact FROM ex) AS BIGINT) AS exact,
                   CAST((SELECT min(x) FROM ip) AS BIGINT) AS estimate
        """,
        "cms_heavy_hitters": """
            WITH tok AS (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents),
            wc AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
            rws AS (SELECT unnest(generate_series(0, 3)) AS j),
            hb AS (SELECT r.j, wc.w, wc.n,
                          CAST(('0x' || substr(md5(CAST(r.j AS VARCHAR)
                                                   || '_' || wc.w),
                                               1, 15)) AS BIGINT) % 2048
                              AS bucket
                   FROM rws r CROSS JOIN wc),
            counters AS (SELECT j, bucket, sum(n) AS c FROM hb GROUP BY 1, 2),
            est AS (SELECT h.w AS word, min(c.c) AS est
                    FROM hb h
                    JOIN counters c ON c.j = h.j AND c.bucket = h.bucket
                    GROUP BY 1),
            r AS (SELECT word, CAST(est AS BIGINT) AS est,
                         row_number() OVER (ORDER BY est DESC, word) AS rank
                  FROM est)
            SELECT word, est, rank FROM r WHERE rank <= 20
        """,
        "table_profile": """
            SELECT 'o_orderkey' AS "column",
                   (SELECT count(*) FROM orders) AS n,
                   (SELECT count(*) - count(o_orderkey) FROM orders) AS n_null,
                   floor((CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0
                               THEN 1024.0 * ln(1024.0 / v0)
                               ELSE e_raw END) * 1000000 + 0.501) / 1000000
                       AS distinct_est,
                   CAST(v0 AS BIGINT) AS v_zero
            FROM (
                SELECT (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw, v0
                FROM (
                    SELECT sum(power(2.0, -rho)) AS s,
                           sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v0
                    FROM (
                        SELECT sk.bucket, coalesce(r.rho, 0) AS rho
                        FROM (SELECT unnest(generate_series(0, 1023)) AS bucket) sk
                        LEFT JOIN (
                            SELECT h >> 50 AS bucket,
                                   max(CASE WHEN (h & ((CAST(1 AS BIGINT) << 50) - 1)) = 0
                                            THEN 51
                                            ELSE 51 - length(bin(h & ((CAST(1 AS BIGINT) << 50) - 1)))
                                       END) AS rho
                            FROM (
                                SELECT CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
                                FROM (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS v
                                      FROM orders WHERE o_orderkey IS NOT NULL))
                            GROUP BY 1) r ON r.bucket = sk.bucket)))
            UNION ALL
            SELECT 'o_custkey' AS "column",
                   (SELECT count(*) FROM orders) AS n,
                   (SELECT count(*) - count(o_custkey) FROM orders) AS n_null,
                   floor((CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0
                               THEN 1024.0 * ln(1024.0 / v0)
                               ELSE e_raw END) * 1000000 + 0.501) / 1000000
                       AS distinct_est,
                   CAST(v0 AS BIGINT) AS v_zero
            FROM (
                SELECT (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw, v0
                FROM (
                    SELECT sum(power(2.0, -rho)) AS s,
                           sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v0
                    FROM (
                        SELECT sk.bucket, coalesce(r.rho, 0) AS rho
                        FROM (SELECT unnest(generate_series(0, 1023)) AS bucket) sk
                        LEFT JOIN (
                            SELECT h >> 50 AS bucket,
                                   max(CASE WHEN (h & ((CAST(1 AS BIGINT) << 50) - 1)) = 0
                                            THEN 51
                                            ELSE 51 - length(bin(h & ((CAST(1 AS BIGINT) << 50) - 1)))
                                       END) AS rho
                            FROM (
                                SELECT CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
                                FROM (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS v
                                      FROM orders WHERE o_custkey IS NOT NULL))
                            GROUP BY 1) r ON r.bucket = sk.bucket)))
            UNION ALL
            SELECT 'o_orderstatus' AS "column",
                   (SELECT count(*) FROM orders) AS n,
                   (SELECT count(*) - count(o_orderstatus) FROM orders) AS n_null,
                   floor((CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0
                               THEN 1024.0 * ln(1024.0 / v0)
                               ELSE e_raw END) * 1000000 + 0.501) / 1000000
                       AS distinct_est,
                   CAST(v0 AS BIGINT) AS v_zero
            FROM (
                SELECT (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw, v0
                FROM (
                    SELECT sum(power(2.0, -rho)) AS s,
                           sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v0
                    FROM (
                        SELECT sk.bucket, coalesce(r.rho, 0) AS rho
                        FROM (SELECT unnest(generate_series(0, 1023)) AS bucket) sk
                        LEFT JOIN (
                            SELECT h >> 50 AS bucket,
                                   max(CASE WHEN (h & ((CAST(1 AS BIGINT) << 50) - 1)) = 0
                                            THEN 51
                                            ELSE 51 - length(bin(h & ((CAST(1 AS BIGINT) << 50) - 1)))
                                       END) AS rho
                            FROM (
                                SELECT CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
                                FROM (SELECT DISTINCT CAST(o_orderstatus AS VARCHAR) AS v
                                      FROM orders WHERE o_orderstatus IS NOT NULL))
                            GROUP BY 1) r ON r.bucket = sk.bucket)))
            UNION ALL
            SELECT 'o_totalprice' AS "column",
                   (SELECT count(*) FROM orders) AS n,
                   (SELECT count(*) - count(o_totalprice) FROM orders) AS n_null,
                   floor((CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0
                               THEN 1024.0 * ln(1024.0 / v0)
                               ELSE e_raw END) * 1000000 + 0.501) / 1000000
                       AS distinct_est,
                   CAST(v0 AS BIGINT) AS v_zero
            FROM (
                SELECT (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw, v0
                FROM (
                    SELECT sum(power(2.0, -rho)) AS s,
                           sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v0
                    FROM (
                        SELECT sk.bucket, coalesce(r.rho, 0) AS rho
                        FROM (SELECT unnest(generate_series(0, 1023)) AS bucket) sk
                        LEFT JOIN (
                            SELECT h >> 50 AS bucket,
                                   max(CASE WHEN (h & ((CAST(1 AS BIGINT) << 50) - 1)) = 0
                                            THEN 51
                                            ELSE 51 - length(bin(h & ((CAST(1 AS BIGINT) << 50) - 1)))
                                       END) AS rho
                            FROM (
                                SELECT CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
                                FROM (SELECT DISTINCT CAST(o_totalprice AS VARCHAR) AS v
                                      FROM orders WHERE o_totalprice IS NOT NULL))
                            GROUP BY 1) r ON r.bucket = sk.bucket)))
            UNION ALL
            SELECT 'o_orderpriority' AS "column",
                   (SELECT count(*) FROM orders) AS n,
                   (SELECT count(*) - count(o_orderpriority) FROM orders) AS n_null,
                   floor((CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0
                               THEN 1024.0 * ln(1024.0 / v0)
                               ELSE e_raw END) * 1000000 + 0.501) / 1000000
                       AS distinct_est,
                   CAST(v0 AS BIGINT) AS v_zero
            FROM (
                SELECT (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw, v0
                FROM (
                    SELECT sum(power(2.0, -rho)) AS s,
                           sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v0
                    FROM (
                        SELECT sk.bucket, coalesce(r.rho, 0) AS rho
                        FROM (SELECT unnest(generate_series(0, 1023)) AS bucket) sk
                        LEFT JOIN (
                            SELECT h >> 50 AS bucket,
                                   max(CASE WHEN (h & ((CAST(1 AS BIGINT) << 50) - 1)) = 0
                                            THEN 51
                                            ELSE 51 - length(bin(h & ((CAST(1 AS BIGINT) << 50) - 1)))
                                       END) AS rho
                            FROM (
                                SELECT CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
                                FROM (SELECT DISTINCT CAST(o_orderpriority AS VARCHAR) AS v
                                      FROM orders WHERE o_orderpriority IS NOT NULL))
                            GROUP BY 1) r ON r.bucket = sk.bucket)))
        """,
        "hll_distinct_users": """
            WITH dv AS (SELECT DISTINCT event_type, user_id FROM events),
            h AS (SELECT event_type,
                         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                              1, 15)) AS BIGINT) AS h
                  FROM dv),
            rb AS (SELECT event_type, h >> 50 AS bucket,
                          h & ((CAST(1 AS BIGINT) << 50) - 1) AS w
                   FROM h),
            regs AS (SELECT event_type, bucket,
                            max(CASE WHEN w = 0 THEN 51
                                     ELSE 51 - length(bin(w)) END) AS rho
                     FROM rb GROUP BY 1, 2),
            fullregs AS (
                SELECT g.event_type, s.bucket, coalesce(r.rho, 0) AS rho
                FROM (SELECT DISTINCT event_type FROM events) g
                CROSS JOIN (SELECT unnest(generate_series(0, 1023)) AS bucket) s
                LEFT JOIN regs r
                  ON r.event_type = g.event_type AND r.bucket = s.bucket),
            agg AS (
                SELECT event_type,
                       sum(power(2.0, -rho)) AS s,
                       sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v0
                FROM fullregs GROUP BY 1),
            est AS (
                SELECT event_type,
                       (0.7213 / (1.0 + 1.079 / 1024.0))
                           * 1024.0 * 1024.0 / s AS e_raw,
                       v0
                FROM agg)
            SELECT event_type,
                   floor((CASE WHEN e_raw <= 2.5 * 1024.0 AND v0 > 0
                               THEN 1024.0 * ln(1024.0 / v0)
                               ELSE e_raw END) * 1000000 + 0.501) / 1000000
                       AS estimate,
                   CAST(v0 AS BIGINT) AS v_zero
            FROM est
        """,
        "fuzzy_name_pairs": """
            WITH c AS (SELECT DISTINCT c_name FROM customer)
            SELECT a.c_name AS name_a, b.c_name AS name_b
            FROM c a JOIN c b
              ON a.c_name < b.c_name
             AND levenshtein(a.c_name, b.c_name) = 1
        """,
        "setsim_join": """
            WITH tl AS (
                SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            grams AS (
                SELECT DISTINCT doc_id,
                       l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
                FROM (SELECT doc_id, l,
                             unnest(generate_series(1, len(l) - 2)) AS i
                      FROM tl WHERE len(l) >= 3)),
            sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_common
                FROM grams a JOIN grams b USING (g)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i.id_a, i.id_b, i.n_common,
                   sa.n + sb.n - i.n_common AS n_union,
                   floor((i.n_common * 1.0 / (sa.n + sb.n - i.n_common))
                         * 1000000 + 0.501) / 1000000 AS jaccard
            FROM inter i
            JOIN sz sa ON sa.doc_id = i.id_a
            JOIN sz sb ON sb.doc_id = i.id_b
            WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= 0.5
        """,
        "containment_dedup": """
            WITH tl AS (
                SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            grams AS (
                SELECT DISTINCT doc_id,
                       l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
                FROM (SELECT doc_id, l,
                             unnest(generate_series(1, len(l) - 2)) AS i
                      FROM tl WHERE len(l) >= 3)),
            df AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
            rare AS (
                SELECT doc_id AS id_a, g FROM (
                    SELECT gr.doc_id, gr.g, df.df,
                           row_number() OVER (PARTITION BY gr.doc_id
                                              ORDER BY df.df, gr.g) AS rn
                    FROM grams gr JOIN df USING (g))
                WHERE rn = 1 AND df <= 100000),
            cand AS (
                SELECT r.id_a, gr.doc_id AS id_b
                FROM rare r JOIN grams gr USING (g)
                WHERE gr.doc_id <> r.id_a)
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN documents a ON a.doc_id = c.id_a
            JOIN documents b ON b.doc_id = c.id_b
            WHERE a.text <> b.text
              AND contains(' ' || b.text || ' ', ' ' || a.text || ' ')
        """,
        "label_centroids": """
            WITH ex AS (
                SELECT label,
                       unnest(CAST(embedding AS DOUBLE[])) AS e,
                       unnest(generate_series(1, len(embedding))) AS i
                FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(i - 1 AS BIGINT) AS dim,
                   floor((sum(e) / count(*)) * 1000000 + 0.501) / 1000000 AS mean,
                   count(*) AS n
            FROM ex GROUP BY 1, 2
        """,
        "doc_word_ids_flat": f"""
            WITH toks AS (
                SELECT conv_id AS doc_id, turn_idx,
                       unnest(string_split(text, ' ')) AS w,
                       unnest(generate_series(1, len(string_split(text, ' ')))) AS p
                FROM read_parquet('{c01}/transcripts.parquet/*.parquet')),
            vocab AS (
                SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) + 1 AS wid
                FROM toks GROUP BY w),
            pos AS (
                SELECT doc_id, w,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY turn_idx, p) - 1 AS pos
                FROM toks)
            SELECT pos.doc_id, CAST(pos.pos AS BIGINT) AS pos,
                   CAST(v.wid AS BIGINT) AS word_id
            FROM pos JOIN vocab v USING (w)
        """,
        "doc_char_ids_flat": f"""
            WITH toks AS (
                SELECT conv_id AS doc_id, turn_idx,
                       unnest(string_split(text, ' ')) AS w,
                       unnest(generate_series(1, len(string_split(text, ' ')))) AS p
                FROM read_parquet('{c01}/transcripts.parquet/*.parquet')),
            -- corpus character counts over lowered word occurrences →
            -- char2id rank (B4 char2id.json stand-in; 0=PAD, 1=UNK)
            chars AS (
                SELECT doc_id, turn_idx, p,
                       unnest(string_split(lower(w), '')) AS ch,
                       unnest(generate_series(1, length(w))) AS ci
                FROM toks),
            cvocab AS (
                SELECT ch, row_number() OVER (ORDER BY count(*) DESC, ch) + 1 AS cid
                FROM chars GROUP BY ch),
            pos AS (
                SELECT doc_id, turn_idx, p,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY turn_idx, p) - 1 AS pos
                FROM toks)
            SELECT c.doc_id, CAST(pos.pos AS BIGINT) AS pos,
                   CAST(c.ci - 1 AS BIGINT) AS cpos,
                   CAST(v.cid AS BIGINT) AS char_id
            FROM chars c
            JOIN pos ON pos.doc_id = c.doc_id AND pos.turn_idx = c.turn_idx
                    AND pos.p = c.p
            JOIN cvocab v USING (ch)
            WHERE c.ci <= 16
        """,
    }
    # retrieval-evaluation metric composed from the two constructions
    # above: recall@k of the LSH candidates against exact brute force —
    # |lsh∩brute| per query, averaged. The compare is on id membership
    # (join on query_id, vec_id), so cosine rounding cancels out.
    d["ann_recall"] = f"""
            WITH b AS ({d["ann_brute_force"]}),
            l AS ({d["ann_lsh"]})
            SELECT count(*) AS n_hits,
                   {sql_round(f'count(*) * 1.0 / {nq * k}', 6)} AS recall
            FROM b JOIN l USING (query_id, vec_id)
        """
    return d
