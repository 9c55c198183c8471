"""Exhaustive BM25 scorer — the reference path of the dual-path gate.

Decodes every posting block of the query terms, emits per-posting
score contributions, and lets Spark do the rest declaratively:
``groupBy(doc_id).sum`` (map-side partial aggregation) →
``orderBy(score desc, doc_id).limit(k)`` (Catalyst compiles this to
TakeOrderedAndProject — per-partition top-k, no global sort).

Mirrors the role of plain Lucene scoring without WAND; the WAND path
(operators/wand.py) must be rank- and score-identical to this one
(dual-path testing ≙ the reference's _FI1/_FI2 golden equality,
reference: test/test/hits.js:55-57).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F, types as T

from blacklab_spark import codec
from blacklab_spark.index import InvertedIndex

CONTRIB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("contribution", T.DoubleType(), False),
])

TOPK_SCHEMA = T.StructType([
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("conv_id", T.StringType(), True),
    T.StructField("turn_idx", T.IntegerType(), True),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("text", T.StringType(), True),
])


def _decode_contribs(idf_by_term: dict[int, float], k1: float, b: float,
                     avgdl: float):
    """mapInPandas kernel: posting blocks → (doc_id, contribution)."""
    def decode(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            docs_out, contribs_out = [], []
            for term_id, blob_doc, blob_tf, blob_dl in zip(
                    pdf["term_id"], pdf["doc_ids"], pdf["tfs"], pdf["dls"]):
                doc = codec.decode_deltas(blob_doc).astype(np.int64)
                tf = codec.decode_varints(blob_tf).astype(np.float64)
                dl = codec.decode_varints(blob_dl).astype(np.float64)
                idf = idf_by_term[int(term_id)]
                contrib = idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dl / avgdl))
                docs_out.append(doc)
                contribs_out.append(contrib)
            if docs_out:
                yield pd.DataFrame({
                    "doc_id": np.concatenate(docs_out),
                    "contribution": np.concatenate(contribs_out),
                })
    return decode


def doc_scores(index: InvertedIndex, terms: list[str],
               doc_filter: Column | None = None) -> DataFrame:
    """Full BM25 score per candidate doc (no top-k cut). Empty-safe."""
    info = index.lookup_terms(terms)
    spark = index.spark
    if info.empty:
        return spark.createDataFrame([], "doc_id long, score double")
    idf_map = {int(t): float(i) for t, i in zip(info["term_id"], info["idf"])}
    blocks = index.postings.filter(
        F.col("term_id").isin([int(t) for t in info["term_id"]]))
    contribs = blocks.select("term_id", "doc_ids", "tfs", "dls").mapInPandas(
        _decode_contribs(idf_map, index.cfg.k1, index.cfg.b, index.avgdl),
        CONTRIB_SCHEMA)
    if doc_filter is not None:
        allowed = index.doc_meta.filter(doc_filter).select("doc_id")
        contribs = contribs.join(allowed, "doc_id", "left_semi")
    return contribs.groupBy("doc_id").agg(
        F.sum("contribution").alias("score"))


def finish_topk(index: InvertedIndex, scores: DataFrame, k: int) -> DataFrame:
    """orderBy+limit (TakeOrderedAndProject) → join doc meta → rank."""
    topk = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    meta = index.doc_meta.select("doc_id", "conv_id", "turn_idx", "text")
    out = F.broadcast(topk).join(meta, "doc_id")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (out.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("rank", "doc_id", "conv_id", "turn_idx", "score", "text"))


def topk_exhaustive(index: InvertedIndex, terms: list[str], k: int = 10,
                    doc_filter: Column | None = None) -> DataFrame:
    return finish_topk(index, doc_scores(index, terms, doc_filter), k)
