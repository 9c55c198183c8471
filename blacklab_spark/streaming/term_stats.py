"""Streaming event-time term statistics — watermarked windowed
aggregation over the transcript stream.

The reference has no streaming surface (SURVEY §2.D); this is the
Spark-native extension a large-scale ingestion pipeline needs next to
the delta-index path (streaming/ingest.py): continuously maintained
per-time-window term frequencies with bounded state.

Structured-Streaming shape (all JVM-side):

* ``readStream`` over the transcript source directory (declared
  schema, no inference);
* ``withWatermark("ts", ...)`` bounds state and admits late events up
  to the watermark delay — late rows beyond it are dropped, exactly
  Spark's documented late-data contract;
* tokenize with the frozen tokenizer expression, ``explode`` to one
  row per token;
* ``groupBy(window(ts), term).count()`` — an incremental, partial-agg
  (map-side combine) shuffle, the same plan a batch groupBy gets;
* ``writeStream`` in **append** mode: a window's row is emitted once,
  when the watermark passes its end — so the sink is an immutable
  parquet log of finalized windows.

At 100 TB/day this is the shape that scales: state is bounded by
(windows in flight × distinct terms), the shuffle is keyed on
(window, term), and the sink append is idempotent per finalized
window. The ``availableNow`` trigger processes a static backlog and
stops — what the tests (and backfills) use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from blacklab_spark.tokenizer import tokens_insensitive


def windowed_term_counts(df: DataFrame, window: str = "1 hour",
                         watermark: str = "1 hour",
                         slide: str | None = None) -> DataFrame:
    """The aggregation itself — works on a stream AND on a static
    frame (the dual-path identity the tests pin: a batch run over the
    full input equals the union of the stream's finalized windows)."""
    wm = df.withWatermark("ts", watermark) if df.isStreaming else df
    toks = wm.select(
        "ts", F.explode(tokens_insensitive("text")).alias("term"))
    win = F.window("ts", window, slide) if slide \
        else F.window("ts", window)
    return (toks.groupBy(win.alias("win"), "term")
            .agg(F.count("*").alias("count"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "term", "count"))


def stream_term_counts(spark: SparkSession, source_dir: str,
                       out_dir: str, checkpoint_dir: str,
                       window: str = "1 hour",
                       watermark: str = "1 hour",
                       available_now: bool = True):
    """readStream → watermarked windowed term counts → append-mode
    parquet sink of FINALIZED windows. Returns the started query
    (caller awaits/stops)."""
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .parquet(source_dir))
    agg = windowed_term_counts(stream, window, watermark)
    writer = (agg.writeStream.outputMode("append")
              .option("checkpointLocation", checkpoint_dir)
              .format("parquet").option("path", out_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
