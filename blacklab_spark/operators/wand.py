"""Block-max WAND top-k: metadata-driven pruning + per-bucket DAAT kernel.

Distributed shape of block-max WAND (Ding & Suel 2011) adapted to
Spark's execution model — the reference's analog is its cost-based
forward-index-vs-postings decision (SURVEY.md §4.4); Lucene itself
does per-segment WAND. Here:

1. **Threshold seeding from metadata only.** Per-block ``max_score``
   is the *achieved* best single-term contribution of some doc in the
   block (k1/b frozen at build). Blocks of one term are doc-disjoint,
   so the k-th largest ``max_score`` among one term's blocks is a
   certified lower bound on the k-th best *total* score (k distinct
   docs each score ≥ their block max). t0 = max over query terms of
   that bound. Pure metadata aggregation — no posting decode.
2. **Safe pruning (DataFrame ops on block metadata).** Per bucket,
   ub(bucket) = Σ_terms max(max_score within bucket). A bucket with
   ub < t0 cannot contain a top-k doc → pruned *before* decode. The
   pruning predicate lands on the parquet scan of block metadata;
   posting payloads of pruned buckets are never read (column pruning +
   the bucket semi-join). Single-term queries prune per *block*
   (score == contribution, so ``max_score < t0`` is individually safe).
3. **Exact per-bucket kernel.** Surviving buckets hold *all* blocks of
   all query terms for their doc range (a doc's postings always land
   in its own bucket), so the applyInPandas kernel computes exact
   BM25 totals (numpy sort + reduceat) and emits a local top-k.
4. Global ``orderBy(score desc, doc_id).limit(k)`` finishes.

Rank/score-identical to operators/scoring.py by construction; the
dual-path pytest enforces it (≙ reference _FI1/_FI2 goldens,
test/test/hits.js:55-57).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T

from blacklab_spark import codec
from blacklab_spark.index import InvertedIndex
from blacklab_spark.operators.scoring import (finish_topk,
                                              score_bucket_kernel,
                                              score_bucket_kernel_filtered)

LOCAL_TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])

# Skip the threshold-seeding pass below this many candidate postings
# (Σ df over the query terms). Seeding costs one fixed Spark job
# (collect round-trip + block-metadata scan) before scoring can start;
# decoding the unpruned postings is vectorized ~10^7 entries/s/core,
# so below ~10^6 entries the seed job costs more wall-clock than the
# decode it could save. At 10^11-posting stopword volume the seed +
# block-max prune is what makes the query feasible at all — the same
# statistics-driven physical choice as engine.topk's mode="auto".
WAND_SEED_MIN_POSTINGS = 1_000_000


# Salt width of the two-level k-th threshold seed: per-term bucket
# maxima are pre-reduced to a top-k per (term_id, pmod(bucket, S))
# slice before the per-term k-th is taken, so no single task ever
# holds more than max(n_buckets/S, S·k) rows for a term. At 10^12
# docs / 8192-doc buckets a stopword has ~1.2×10^8 buckets; S=4096
# caps the per-task row count at ~3×10^4 either level.
WAND_SEED_SALT = 4096


def _seed_threshold_frame(blocks: DataFrame, k: int) -> DataFrame:
    """One-row frame with the seed threshold ``t0`` (collected by
    :func:`_seed_threshold`; factored out so tests can assert the
    PLAN — notably that no per-term single-partition window remains).

    k-th largest per-BUCKET max_score within a single term → lower
    bound on the k-th best total score (see module docstring §1).
    Buckets are doc-disjoint, so k buckets above the bound certify k
    distinct docs scoring ≥ it — a valid (slightly weaker) bound vs
    the per-block k-th.

    Skew shape (r3 What's-wrong #3): a ``Window.partitionBy(term_id)``
    k-th would funnel ALL of a stopword's bucket maxima through one
    task (~1.2×10^8 rows at 10^12 docs). Instead: two-level exact
    k-th — (1) groupBy(term_id, bucket) max with map-side partial
    aggregation, (2) per (term_id, pmod(bucket, S)) salt slice keep
    the top-k bucket maxima (any value below a slice's k-th can never
    be the term's k-th), (3) k-th of the ≤S·k survivors per term,
    (4) max over terms. Every stage is a groupBy with bounded task
    input; no window, no single-partition shuffle."""
    per_bucket = (blocks.groupBy("term_id", "bucket")
                  .agg(F.max("max_score").alias("bucket_max")))
    partial = (per_bucket
               .groupBy("term_id",
                        F.pmod("bucket", F.lit(WAND_SEED_SALT))
                        .alias("salt"))
               .agg(F.slice(F.sort_array(F.collect_list("bucket_max"),
                                         asc=False),
                            1, k).alias("top"))
               .select("term_id", F.explode("top").alias("bucket_max")))
    return (partial.groupBy("term_id")
            .agg(F.try_element_at(
                F.sort_array(F.collect_list("bucket_max"), asc=False),
                F.lit(k)).alias("kth"))
            .agg(F.max("kth").alias("t0")))


def _seed_threshold(blocks: DataFrame, k: int) -> float:
    kth = _seed_threshold_frame(blocks, k).collect()[0]["t0"]
    return float(kth) if kth is not None else 0.0


def topk_wand(index: InvertedIndex, terms: list[str], k: int = 10) -> DataFrame:
    """Block-max-pruned BM25 top-k (unfiltered queries).

    Filtered queries (role/tool/...) go through topk_wand_filtered:
    the metadata threshold certifies the *unfiltered* k-th score, which
    is not a valid bound once candidates are removed — the same reason
    an index with delete-tombstones reroutes below (a deleted doc
    could otherwise certify a threshold that prunes real results).
    """
    if index.has_deletes:
        return topk_wand_filtered(index, terms, F.lit(True), k)
    return finish_topk(index, wand_scores(index, terms, k), k)


def wand_scores(index: InvertedIndex, terms: list[str],
                k: int, seed: bool | None = None) -> DataFrame:
    """The block-pruned per-bucket local-top-k scores stage of
    :func:`topk_wand` (factored out so plan assertions can inspect the
    scoring plan — finish_topk materializes the winners eagerly).

    ``seed=None`` decides from term statistics whether the
    threshold-seeding job pays for itself (WAND_SEED_MIN_POSTINGS);
    True/False forces it (tests / debugging)."""
    spark = index.spark
    info = index.lookup_terms(terms)
    if info.empty:
        return spark.createDataFrame([], "doc_id long, score double")
    term_ids = [int(t) for t in info["term_id"]]
    idf_map = {int(t): float(i) for t, i in zip(info["term_id"], info["idf"])}
    blocks = index.postings.filter(F.col("term_id").isin(term_ids))

    if seed is None:
        seed = int(info["df"].sum()) >= WAND_SEED_MIN_POSTINGS
    t0 = _seed_threshold(blocks, k) if seed else 0.0
    if t0 > 0.0:
        if len(term_ids) == 1:
            pruned = blocks.filter(F.col("max_score") >= t0)
        else:
            per_term = (blocks.groupBy("bucket", "term_id")
                        .agg(F.max("max_score").alias("term_best")))
            ub = (per_term.groupBy("bucket")
                  .agg(F.sum("term_best").alias("ub"))
                  .filter(F.col("ub") >= t0)
                  .select("bucket"))
            # semi-join on bucket ids; AQE picks broadcast when the
            # surviving bucket list is small (selective queries), SMJ
            # when it isn't (stopword queries at 10^8+ buckets).
            pruned = blocks.join(ub, "bucket", "left_semi")
    else:
        pruned = blocks

    return (pruned.select("bucket", "term_id", "doc_ids", "tfs", "dls")
            .groupBy("bucket")
            .applyInPandas(
                score_bucket_kernel(idf_map, index.cfg.k1, index.cfg.b,
                                    index.avgdl, local_k=k),
                LOCAL_TOPK_SCHEMA))


def _filtered_scores(index: InvertedIndex, blocks: DataFrame,
                     allowed: DataFrame, idf_map: dict[int, float],
                     local_k: int | None = None) -> DataFrame:
    """Score ONLY the allowed docs: cogroup blocks with the allowed
    doc ids per bucket, so disallowed docs never enter the sum."""
    kern = score_bucket_kernel_filtered(
        idf_map, index.cfg.k1, index.cfg.b, index.avgdl, local_k=local_k)
    return (blocks.select("bucket", "term_id", "doc_ids", "tfs", "dls")
            .groupBy("bucket")
            .cogroup(allowed.groupBy("bucket"))
            .applyInPandas(kern, LOCAL_TOPK_SCHEMA))


def topk_wand_filtered(index: InvertedIndex, terms: list[str],
                       doc_filter: Column, k: int = 10,
                       seed_blocks: int = 64, seed: bool | None = None,
                       _debug: dict | None = None) -> DataFrame:
    """Filter-then-score block-max top-k under a metadata filter
    (VERDICT r01 #3 — the scale-safe filtered plan):

    1. **Allowed set first.** ``doc_meta.filter(...)`` → (doc_id,
       bucket); blocks of the query terms semi-join on the allowed
       BUCKETS before any payload decode — postings of buckets with no
       qualifying doc are never touched.
    2. **Threshold from filtered candidates.** The unfiltered metadata
       bound is invalid once candidates are removed (wand.topk_wand
       docstring), so seed exactly: decode the ``seed_blocks``
       highest-``max_score`` surviving blocks, score their ALLOWED
       docs, and take the k-th best. Those are partial sums of real
       allowed docs (a doc's other-term contributions may live in
       non-seed blocks), and BM25 contributions are non-negative, so
       the k-th best partial sum certifies ≥k allowed docs scoring at
       least t0 — a valid lower bound.
    3. **Safe pruning.** ub(bucket) = Σ_terms max(max_score) computed
       on surviving blocks (block maxima are unfiltered per-doc upper
       bounds, valid for the allowed subset); drop buckets with
       ub < t0.
    4. Exact cogrouped kernel over survivors (allowed docs only) →
       TakeOrderedAndProject.

    Rank/score-identical to exhaustive-then-filter by construction
    (dual-path tested)."""
    info = index.lookup_terms(terms)
    spark = index.spark
    if info.empty:
        return finish_topk(
            index, spark.createDataFrame([], "doc_id long, score double"), k)
    term_ids = [int(t) for t in info["term_id"]]
    idf_map = {int(t): float(i) for t, i in zip(info["term_id"], info["idf"])}
    bs = index.cfg.bucket_size
    # no persist: each reuse recomputes a pushdown-pruned parquet scan
    # (cheap), and cached frames would otherwise accumulate per query
    # in a long-lived engine.
    allowed = (index.doc_meta.filter(doc_filter)
               .select("doc_id",
                       F.expr(f"doc_id div {bs}").alias("bucket")))
    abuckets = allowed.select("bucket").distinct()
    blocks = (index.postings.filter(F.col("term_id").isin(term_ids))
              .join(abuckets, "bucket", "left_semi"))

    # seed pass: exact partial scores of allowed docs in the top
    # metadata blocks (tiny: seed_blocks blocks through the kernel).
    # Statistics-gated like wand_scores: below WAND_SEED_MIN_POSTINGS
    # candidate postings the two seed/prune jobs cost more wall-clock
    # than the decode they could save.
    if seed is None:
        seed = int(info["df"].sum()) >= WAND_SEED_MIN_POSTINGS
    t0 = 0.0
    if seed:
        sblocks = (blocks.orderBy(F.desc("max_score")).limit(seed_blocks))
        seed_rows = (_filtered_scores(index, sblocks, allowed, idf_map)
                     .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
                     .collect())
        t0 = float(seed_rows[-1]["score"]) if len(seed_rows) == k else 0.0

    pruned = blocks
    if t0 > 0.0:
        per_term = (blocks.groupBy("bucket", "term_id")
                    .agg(F.max("max_score").alias("term_best")))
        ub = (per_term.groupBy("bucket")
              .agg(F.sum("term_best").alias("ub"))
              .filter(F.col("ub") >= t0)
              .select("bucket"))
        pruned = blocks.join(ub, "bucket", "left_semi")
    if _debug is not None:
        _debug["t0"] = t0
        _debug["blocks_total"] = blocks.count()
        _debug["blocks_after_prune"] = pruned.count()

    local = _filtered_scores(index, pruned, allowed, idf_map, local_k=k)
    out = finish_topk(index, local, k)
    return out
