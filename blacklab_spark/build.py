"""Index build pipeline: transcripts table → inverted-index artifacts.

Replaces the reference's Lucene write path (IndexerImpl → BlackLab40
codec, reference: engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java:145-225,
SURVEY.md §2.C) with Spark jobs:

  1. stable ordering + dense int64 doc ids by global (conv_id, turn_idx)
     rank — range-partition + per-partition offsets, no zipWithIndex,
     no single-partition window (scales to 10^12 rows);
  2. tokenize (JVM regexp, §tokenizer) → doc_meta: the engine's
     *forward index* + *content store* in one table (token arrays +
     text column; SURVEY.md §1.1);
  3. SPIMI: per-partition vectorized posting construction
     (mapInPandas; one output row per (term, doc) with tf + positions
     — the per-(term,doc) aggregation happens inside the doc row, so
     nothing is shuffled per token occurrence);
  4. terms dictionary with dense term ids (sorted by term string —
     deterministic across reruns, mirrors the reference's sorted terms
     file, reference: forwardindex/TermsIntegrated.java:82-111);
  5. shuffle merge by (term_id, doc-range bucket) → delta-gap+varint
     posting blocks with per-block max BM25 score (k1/b frozen at
     build; reference analog: per-segment postings merged by codec,
     BlackLab40PostingsWriter.java:87-106).

Doc-range bucketing doubles as the skew strategy: a hot term's
postings split across all buckets (≤ bucket_size docs per group), so
no reducer sees more than bucket_size rows per term.

Build is resumable: each stage writes its artifact dir + a manifest
entry (`_index_meta.json`); ``resume=True`` skips completed stages.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F, types as T

from blacklab_spark import codec
from blacklab_spark.config import BuildConfig
from blacklab_spark.oracle import bm25_idf  # same formula, one source of truth
from blacklab_spark.tokenizer import tokens_insensitive

POSTING_ROW_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("tf", T.IntegerType(), False),
    T.StructField("positions", T.ArrayType(T.IntegerType()), False),
    T.StructField("dl", T.IntegerType(), False),
])

BLOCK_SCHEMA = T.StructType([
    T.StructField("term_id", T.LongType(), False),
    T.StructField("bucket", T.LongType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("n_docs", T.IntegerType(), False),
    T.StructField("doc_ids", T.BinaryType(), False),
    T.StructField("tfs", T.BinaryType(), False),
    T.StructField("dls", T.BinaryType(), False),
    T.StructField("positions", T.BinaryType(), True),
    T.StructField("max_tf", T.IntegerType(), False),
    T.StructField("max_score", T.DoubleType(), False),
])


def assign_dense_ids(df: DataFrame, key_cols: list[str], id_col: str,
                     num_partitions: int) -> DataFrame:
    """Dense 0-based int64 ids by global sort order of unique ``key_cols``.

    Range-partition on the keys (disjoint ordered ranges per partition),
    count rows per partition (small driver-side cumsum), then
    ``offset + row_number within partition``. Equivalent to a global
    row_number but with no single-partition bottleneck — this is the
    10^12-row-safe scheme from SURVEY.md §7 "hard parts (3)".
    Deterministic: ids depend only on the key order, not on boundaries.
    """
    spark = df.sparkSession
    d = df.repartitionByRange(num_partitions, *key_cols) \
          .withColumn("_pid", F.spark_partition_id()).persist()
    counts = {r["_pid"]: r["cnt"] for r in
              d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets, schema="_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in key_cols])
    out = (d.join(F.broadcast(off_df), "_pid")
            .withColumn(id_col, (F.row_number().over(w) - 1 + F.col("_off")).cast("long"))
            .drop("_pid", "_off"))
    return out


def _spimi_postings(tokenized: DataFrame) -> DataFrame:
    """Per-partition vectorized posting construction (SPIMI).

    Input: (doc_id, tokens). Output: one row per (term, doc) with tf,
    positions, dl. All heavy lifting is numpy over the Arrow batch —
    flatten, lexsort, run-length boundaries — no per-token Python.
    """
    def build(batches):
        for pdf in batches:
            doc_ids = pdf["doc_id"].to_numpy()
            tok_lists = pdf["tokens"].tolist()
            lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                               count=len(tok_lists))
            total = int(lens.sum())
            if total == 0:
                continue
            flat = np.concatenate([np.asarray(t, dtype=object)
                                   for t in tok_lists if len(t)])
            docs_flat = np.repeat(doc_ids, lens)
            starts = np.repeat(np.cumsum(lens) - lens, lens)
            pos_flat = (np.arange(total) - starts).astype(np.int32)
            dls_flat = np.repeat(lens, lens).astype(np.int32)
            # group by (term, doc): stable lexsort keeps positions ascending
            order = np.lexsort((pos_flat, docs_flat, flat))
            f, dcs, ps, dls = flat[order], docs_flat[order], pos_flat[order], dls_flat[order]
            change = np.empty(f.size, dtype=bool)
            change[0] = True
            change[1:] = (f[1:] != f[:-1]) | (dcs[1:] != dcs[:-1])
            g_starts = np.nonzero(change)[0]
            g_ends = np.append(g_starts[1:], f.size)
            tfs = (g_ends - g_starts).astype(np.int32)
            yield pd.DataFrame({
                "term": f[g_starts],
                "doc_id": dcs[g_starts].astype(np.int64),
                "tf": tfs,
                "positions": [ps[s:e] for s, e in zip(g_starts, g_ends)],
                "dl": dls[g_starts],
            })

    return tokenized.select("doc_id", "tokens").mapInPandas(build, POSTING_ROW_SCHEMA)


def _block_builder(cfg: BuildConfig, n_docs: int, avgdl: float):
    """applyInPandas kernel: one (term_id, bucket) group → encoded blocks."""
    k1, b, bs = cfg.k1, cfg.b, cfg.block_size
    store_pos = cfg.store_positions

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term_id, bucket = int(key[0]), int(key[1])
        pdf = pdf.sort_values("doc_id")
        doc = pdf["doc_id"].to_numpy(dtype=np.int64)
        tf = pdf["tf"].to_numpy(dtype=np.int64)
        dl = pdf["dl"].to_numpy(dtype=np.int64)
        df_t = int(pdf["df"].iloc[0])
        idf = bm25_idf(n_docs, df_t)
        tf_norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        score = idf * tf_norm
        pos_lists = pdf["positions"].tolist() if store_pos else None
        rows = []
        for blk, s in enumerate(range(0, len(doc), bs)):
            e = min(s + bs, len(doc))
            rows.append({
                "term_id": term_id,
                "bucket": bucket,
                "block_id": blk,
                "n_docs": e - s,
                "doc_ids": codec.encode_deltas(doc[s:e]),
                "tfs": codec.encode_varints(tf[s:e]),
                "dls": codec.encode_varints(dl[s:e]),
                "positions": codec.encode_positions(
                    [np.asarray(p, dtype=np.uint64) for p in pos_lists[s:e]])
                    if store_pos else None,
                "max_tf": int(tf[s:e].max()),
                "max_score": float(score[s:e].max()),
            })
        return pd.DataFrame(rows)

    return build


class IndexBuilder:
    """Drives the staged, checkpointed build. See module docstring."""

    def __init__(self, spark: SparkSession, out_dir: str,
                 cfg: BuildConfig | None = None):
        self.spark = spark
        self.out = out_dir.rstrip("/")
        self.cfg = cfg or BuildConfig()
        self.manifest_path = os.path.join(self.out, "_index_meta.json")

    # -- manifest / checkpoint helpers ---------------------------------
    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"format_version": self.cfg.format_version,
                "config": self.cfg.to_dict(), "stages": {}}

    def _save_manifest(self, m: dict) -> None:
        os.makedirs(self.out, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2, default=str)
        os.replace(tmp, self.manifest_path)

    def _stage_done(self, m: dict, name: str) -> bool:
        st = m["stages"].get(name)
        return bool(st and st.get("status") == "done"
                    and os.path.exists(os.path.join(self.out, name, "_SUCCESS")))

    def _finish_stage(self, m: dict, name: str, t0: float, rows: int,
                      partitions: int) -> None:
        dur = time.time() - t0
        m["stages"][name] = {
            "status": "done", "rows": rows, "partitions": partitions,
            "duration_sec": round(dur, 3),
            "rows_per_sec": round(rows / dur, 1) if dur > 0 else None,
        }
        self._save_manifest(m)

    # -- build ---------------------------------------------------------
    def build(self, transcripts: DataFrame, resume: bool = False) -> dict:
        """Run all stages; returns the final manifest."""
        cfg = self.cfg
        parts = cfg.num_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions"))
        m = self._load_manifest() if resume else {
            "format_version": cfg.format_version, "config": cfg.to_dict(),
            "stages": {}}

        # Stage 1: doc_meta = ids + tokens + text (forward index+content store)
        doc_meta_path = os.path.join(self.out, "doc_meta")
        if not (resume and self._stage_done(m, "doc_meta")):
            t0 = time.time()
            with_ids = assign_dense_ids(transcripts, ["conv_id", "turn_idx"],
                                        "doc_id", parts)
            doc_meta = (with_ids
                        .withColumn("tokens", tokens_insensitive("text"))
                        .withColumn("n_tokens", F.size("tokens").cast("int"))
                        .select("doc_id", "conv_id", "turn_idx", "role",
                                "tool", "ts", "n_tokens", "tokens", "text"))
            (doc_meta.repartitionByRange(parts, "doc_id")
                     .sortWithinPartitions("doc_id")
                     .write.mode("overwrite").parquet(doc_meta_path))
            n_rows = self.spark.read.parquet(doc_meta_path).count()
            self._finish_stage(m, "doc_meta", t0, n_rows, parts)

        doc_meta = self.spark.read.parquet(doc_meta_path)
        agg = doc_meta.agg(F.count("*").alias("n"),
                           F.sum("n_tokens").alias("tot")).collect()[0]
        n_docs, total_tokens = int(agg["n"]), int(agg["tot"] or 0)
        avgdl = total_tokens / max(1, n_docs)
        m["stats"] = {"n_docs": n_docs, "total_tokens": total_tokens,
                      "avgdl": avgdl}
        self._save_manifest(m)

        # Stage 2: SPIMI posting rows (kept as an explicit checkpoint —
        # both the terms stage and the blocks stage consume it, and a
        # resumed build must not re-tokenize).
        postings_rows_path = os.path.join(self.out, "postings_rows")
        if not (resume and self._stage_done(m, "postings_rows")):
            t0 = time.time()
            rows = _spimi_postings(doc_meta)
            rows.write.mode("overwrite").parquet(postings_rows_path)
            nr = self.spark.read.parquet(postings_rows_path).count()
            self._finish_stage(m, "postings_rows", t0, nr, parts)
        postings_rows = self.spark.read.parquet(postings_rows_path)

        # Stage 3: terms dictionary with dense ids (sorted by term).
        terms_path = os.path.join(self.out, "terms")
        if not (resume and self._stage_done(m, "terms")):
            t0 = time.time()
            terms_agg = (postings_rows.groupBy("term")
                         .agg(F.count("*").alias("df"),
                              F.sum("tf").alias("cf")))
            terms = assign_dense_ids(terms_agg, ["term"], "term_id", parts) \
                .select("term", "term_id", "df", "cf")
            (terms.repartitionByRange(max(1, parts // 4), "term_id")
                  .sortWithinPartitions("term_id")
                  .write.mode("overwrite").parquet(terms_path))
            nt = self.spark.read.parquet(terms_path).count()
            self._finish_stage(m, "terms", t0, nt, parts)
        terms = self.spark.read.parquet(terms_path)

        # Stage 4: shuffle merge into posting blocks per (term_id, bucket).
        postings_path = os.path.join(self.out, "postings")
        if not (resume and self._stage_done(m, "postings")):
            t0 = time.time()
            joined = (postings_rows
                      .join(terms.select("term", "term_id", "df"), "term")
                      .withColumn("bucket",
                                  (F.col("doc_id") / F.lit(cfg.bucket_size))
                                  .cast("long")))
            blocks = (joined.groupBy("term_id", "bucket")
                      .applyInPandas(_block_builder(cfg, n_docs, avgdl),
                                     BLOCK_SCHEMA))
            (blocks.repartitionByRange(parts, "term_id", "bucket")
                   .sortWithinPartitions("term_id", "bucket", "block_id")
                   .write.mode("overwrite").parquet(postings_path))
            nb = self.spark.read.parquet(postings_path).count()
            self._finish_stage(m, "postings", t0, nb, parts)

        m["built_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        self._save_manifest(m)
        return m


def build_index(spark: SparkSession, transcripts: DataFrame, out_dir: str,
                cfg: BuildConfig | None = None, resume: bool = False) -> dict:
    return IndexBuilder(spark, out_dir, cfg).build(transcripts, resume=resume)
