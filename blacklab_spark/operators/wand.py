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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F, types as T

from blacklab_spark import codec
from blacklab_spark.index import InvertedIndex
from blacklab_spark.operators.scoring import finish_topk, score_bucket_kernel

LOCAL_TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def _seed_threshold(blocks: DataFrame, k: int) -> float:
    """k-th largest per-BUCKET max_score within a single term → lower
    bound on the k-th best total score (see module docstring §1).

    Buckets are doc-disjoint, so k buckets above the bound certify k
    distinct docs scoring ≥ it — a valid (slightly weaker) bound vs
    the per-block k-th. The pre-aggregation matters for skew: for a
    stopword at 10^12 turns the per-term window would funnel ~10^9
    block-metadata rows through ONE window partition; the
    groupBy(term_id, bucket) max runs with map-side partial
    aggregation first, shrinking the window input by the
    blocks-per-bucket factor and keeping it shuffle-balanced."""
    per_bucket = (blocks.groupBy("term_id", "bucket")
                  .agg(F.max("max_score").alias("bucket_max")))
    w = Window.partitionBy("term_id").orderBy(F.desc("bucket_max"))
    kth = (per_bucket
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == k)
           .agg(F.max("bucket_max").alias("t0"))
           .collect()[0]["t0"])
    return float(kth) if kth is not None else 0.0


def topk_wand(index: InvertedIndex, terms: list[str], k: int = 10) -> DataFrame:
    """Block-max-pruned BM25 top-k (unfiltered queries).

    Filtered queries (role/tool/...) go through the exhaustive path:
    the metadata threshold certifies the *unfiltered* k-th score, which
    is not a valid bound once candidates are removed.
    """
    info = index.lookup_terms(terms)
    spark = index.spark
    if info.empty:
        return finish_topk(
            index, spark.createDataFrame([], "doc_id long, score double"), k)
    term_ids = [int(t) for t in info["term_id"]]
    idf_map = {int(t): float(i) for t, i in zip(info["term_id"], info["idf"])}
    blocks = index.postings.filter(F.col("term_id").isin(term_ids))

    t0 = _seed_threshold(blocks, k)
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

    local = (pruned.select("bucket", "term_id", "doc_ids", "tfs", "dls")
             .groupBy("bucket")
             .applyInPandas(
                 score_bucket_kernel(idf_map, index.cfg.k1, index.cfg.b,
                                     index.avgdl, local_k=k),
                 LOCAL_TOPK_SCHEMA))
    return finish_topk(index, local, k)
