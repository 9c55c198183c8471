"""Streaming near-duplicate detection — incremental MinHash-LSH of
arriving documents against everything already seen.

The training-data-pipeline shape: documents stream in; each new doc
must be checked for near-duplicates against the full history WITHOUT
re-running all-pairs LSH over the whole corpus per batch. The LSH
bucket table IS the incremental state:

* state = parquet log of banded signature rows ``(id, s, band, key)``
  (`functions/dedup.minhash_banded` — the same rows the batch
  all-pairs path builds), one subdirectory per micro-batch so a
  replayed batch overwrites its own rows instead of duplicating them
  (the foreachBatch at-least-once contract → exactly-once state);
* per batch: candidate pairs = new rows ⋈ state rows on
  ``(band, key)`` (an equi-join — new docs collide only with history
  sharing a band signature) PLUS the in-batch self-join; both verify
  with the exact shingle Jaccard (`verify_jaccard_pairs`);
* output = parquet log of ``(id_a, id_b, jaccard)`` pairs, again one
  subdirectory per batch (idempotent).

Determinism: with monotonically increasing doc ids across batches the
union of all emitted pairs equals the OFFLINE `minhash_lsh_pairs`
over the full corpus — the batch ≡ stream identity the tests pin.

Scale: state grows as n·bands rows keyed by (band, key). The join
against a small batch broadcasts the batch side and — when the
batch's distinct bucket keys fit a literal list (≤ ``push_limit``) —
pushes ``key IN (...)`` into the state scan, so a micro-batch reads
only row groups whose key ranges intersect its own buckets instead of
the full history (the same pushdown pattern as
`operators/hits.push_hit_docs`). Beyond the limit it degrades to the
plain shuffle equi-join, which is still one pass, not all-pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.functions.dedup import (minhash_banded,
                                            verify_jaccard_pairs)

#: max distinct bucket keys pushed into the state scan as an IN filter
PUSH_LIMIT = 65536

_STATE_SCHEMA = "id long, s array<string>, band int, key string"
_OUT_SCHEMA = "id_a long, id_b long, jaccard double"


def _pairs_against_state(new_banded: DataFrame, state: DataFrame,
                         threshold: float,
                         push_limit: int = PUSH_LIMIT) -> DataFrame:
    """Verified near-dup pairs of new docs vs state docs + within the
    new docs themselves. Pairs are normalized ``id_a < id_b``
    regardless of arrival order, so the union over batches equals the
    offline all-pairs result."""
    new_b = F.broadcast(new_banded)
    keys = [r["key"] for r in
            new_banded.select("key").distinct()
            .limit(push_limit + 1).collect()]
    if len(keys) <= push_limit:
        # one parsed SQL IN — Column.isin marshals each key through
        # Py4J individually (~1ms each: minutes per micro-batch at
        # this bound; see operators.hits.in_list_pred)
        from blacklab_spark.operators.hits import in_list_pred
        state = state.filter(in_list_pred(keys, col="key"))
    both = state.unionByName(new_banded)
    cand = (both.alias("a").join(
        new_b.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.id") != F.col("b.id")))
        .select(F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
                F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
        .dropDuplicates(["id_a", "id_b"]))
    return verify_jaccard_pairs(cand, threshold)


def stream_dedup(spark: SparkSession, source_dir: str, state_dir: str,
                 out_dir: str, checkpoint_dir: str, schema: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.5, num_hashes: int = 16,
                 bands: int = 8, shingle_n: int = 3,
                 available_now: bool = True):
    """readStream over document parquet → per-batch incremental LSH
    dedup. Returns the started StreamingQuery (caller awaits).

    ``schema`` declares the source columns (no inference pass).
    Emits ``(id_a, id_b, jaccard)`` to ``out_dir`` and appends banded
    signatures to ``state_dir``; both are keyed by batch id, so
    checkpoint replays are idempotent."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        part = f"batch={batch_id:08d}"
        # 1. materialize this batch's banded rows (overwrite ⇒ replay-
        #    safe), then read them back — one computation, reused by
        #    both joins
        (minhash_banded(batch_df, num_hashes, bands, id_col, text_col,
                        shingle_n)
         .write.mode("overwrite")
         .parquet(os.path.join(state_dir, part)))
        new_banded = spark.read.schema(_STATE_SCHEMA).parquet(
            os.path.join(state_dir, part))
        # 2. history = every OTHER batch's state rows
        prior = [os.path.join(state_dir, d)
                 for d in sorted(os.listdir(state_dir))
                 if d.startswith("batch=") and d != part]
        state = (spark.read.schema(_STATE_SCHEMA).parquet(*prior)
                 if prior else
                 spark.createDataFrame([], _STATE_SCHEMA))
        # 3. verified pairs for this batch (replay-safe overwrite)
        (_pairs_against_state(new_banded, state, threshold)
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, part)))

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_pairs(spark: SparkSession, out_dir: str) -> DataFrame:
    """All pairs emitted so far (union of the per-batch outputs)."""
    parts = [os.path.join(out_dir, d) for d in sorted(os.listdir(out_dir))
             if d.startswith("batch=")]
    if not parts:
        return spark.createDataFrame([], _OUT_SCHEMA)
    return spark.read.schema(_OUT_SCHEMA).parquet(*parts)
