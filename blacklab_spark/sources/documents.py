"""Adapter: driver testdata ``documents`` table → transcript shape.

The engine's document unit is one transcript turn (SURVEY.md §1.1).
The driver's generic ``documents`` parquet (doc_id, text, lang, source,
n_chars) maps naturally: one document = a single-turn conversation.
``lang``/``source`` ride along as the filterable annotations in place
of role/tool (BlackLab metadata fields, SURVEY.md §1.1 "Metadata
fields").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("doc%08d", F.col("doc_id").cast("int")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("lang").alias("role"),      # filterable annotation slot 1
        F.col("text"),
        F.col("source").alias("tool"),    # filterable annotation slot 2
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
