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

# positions are emitted varint-ENCODED per (term, doc): ``[tf,
# first_abs, gaps...]`` — the exact per-doc layout of the final block
# positions stream, so the merge stage just concatenates bytes. An
# array<int> column here would dominate the stage in pandas→Arrow
# conversion (~10µs/row × 10^5 rows/batch, measured).
POSTING_ROW_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("tf", T.IntegerType(), False),
    T.StructField("positions", T.BinaryType(), False),
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
                     num_partitions: int):
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
    # caller must unpersist `d` once `out` is materialized — leaving the
    # whole input cached poisons later stages' execution memory / GC
    return out, d


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
            # factorize token strings once → int codes (object-array
            # lexsort is 10×+ slower than int lexsort)
            codes, uniques = pd.factorize(flat, sort=False)
            # group by (term, doc): stable lexsort keeps positions ascending
            order = np.lexsort((pos_flat, docs_flat, codes))
            f, dcs, ps, dls = codes[order], docs_flat[order], pos_flat[order], dls_flat[order]
            change = np.empty(f.size, dtype=bool)
            change[0] = True
            change[1:] = (f[1:] != f[:-1]) | (dcs[1:] != dcs[:-1])
            g_starts = np.nonzero(change)[0]
            g_ends = np.append(g_starts[1:], f.size)
            n_groups = g_starts.size
            tfs = (g_ends - g_starts).astype(np.int32)
            # encode [tf, first_abs, gaps...] per group in one pass
            cnt_idx = g_starts + np.arange(n_groups)
            stream = np.empty(f.size + n_groups, dtype=np.uint64)
            stream[cnt_idx] = tfs.astype(np.uint64)
            mask = np.ones(f.size + n_groups, dtype=bool)
            mask[cnt_idx] = False
            ps64 = ps.astype(np.int64)
            pdelta = ps64.copy()
            pdelta[1:] = ps64[1:] - ps64[:-1]
            pdelta[g_starts] = ps64[g_starts]
            stream[mask] = pdelta.astype(np.uint64)
            enc = codec.encode_varints(stream)
            boff = np.concatenate(([0], np.cumsum(codec.varint_lengths(stream))))
            v_bounds = np.append(cnt_idx, stream.size)
            yield pd.DataFrame({
                "term": np.asarray(uniques, dtype=object)[f[g_starts]],
                "doc_id": dcs[g_starts].astype(np.int64),
                "tf": tfs,
                "positions": [enc[boff[a]:boff[b]]
                              for a, b in zip(v_bounds[:-1], v_bounds[1:])],
                "dl": dls[g_starts],
            })

    return tokenized.select("doc_id", "tokens").mapInPandas(build, POSTING_ROW_SCHEMA)


def _encode_block_batch(pdf: pd.DataFrame, cfg: BuildConfig, n_docs: int,
                        avgdl: float) -> pd.DataFrame:
    """Encode a batch of posting rows — sorted by (term_id, bucket,
    doc_id), groups complete — into posting-block rows.

    Fully vectorized: one varint stream per column for the whole batch
    (delta-gapped with absolutes re-seeded at block starts), then
    per-block byte-range slicing from cumsum offsets. Per-block Python
    work is 4 byte-slices — no per-group pandas frames, which is what
    makes 10^5+ (term,bucket) groups per partition tractable.
    """
    k1, b, bs = cfg.k1, cfg.b, cfg.block_size
    store_pos = cfg.store_positions
    n = len(pdf)
    tid = pdf["term_id"].to_numpy(dtype=np.int64)
    bkt = pdf["bucket"].to_numpy(dtype=np.int64)
    doc = pdf["doc_id"].to_numpy(dtype=np.int64)
    tf = pdf["tf"].to_numpy(dtype=np.int64)
    dl = pdf["dl"].to_numpy(dtype=np.int64)
    dfv = pdf["df"].to_numpy(dtype=np.int64)

    group_change = np.empty(n, dtype=bool)
    group_change[0] = True
    group_change[1:] = (tid[1:] != tid[:-1]) | (bkt[1:] != bkt[:-1])
    gidx = np.cumsum(group_change) - 1
    g_start_row = np.nonzero(group_change)[0]
    idx_in_group = np.arange(n) - g_start_row[gidx]
    block_start = group_change | (idx_in_group % bs == 0)
    b_starts = np.nonzero(block_start)[0]
    b_ends = np.append(b_starts[1:], n)
    block_ids = (idx_in_group[b_starts] // bs).astype(np.int32)
    n_docs_blk = (b_ends - b_starts).astype(np.int32)

    # doc ids: delta-gap, absolute re-seeded at each block start
    deltas = doc.astype(np.uint64)
    deltas = deltas.copy()
    deltas[1:] = doc[1:].astype(np.uint64) - doc[:-1].astype(np.uint64)
    deltas[b_starts] = doc[b_starts].astype(np.uint64)
    doc_stream = codec.encode_varints(deltas)
    doc_off = np.concatenate(([0], np.cumsum(codec.varint_lengths(deltas))))
    tf_stream = codec.encode_varints(tf)
    tf_off = np.concatenate(([0], np.cumsum(codec.varint_lengths(tf))))
    dl_stream = codec.encode_varints(dl)
    dl_off = np.concatenate(([0], np.cumsum(codec.varint_lengths(dl))))

    # per-block BM25 upper bound (exact contribution of best doc)
    idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
    contrib = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    max_score = np.maximum.reduceat(contrib, b_starts)
    max_tf = np.maximum.reduceat(tf, b_starts).astype(np.int32)

    if store_pos:
        # per-row positions are already block-format byte runs
        pos_bytes = pdf["positions"].to_numpy()

    rows_doc, rows_tf, rows_dl, rows_pos = [], [], [], []
    for i, (s, e) in enumerate(zip(b_starts, b_ends)):
        rows_doc.append(doc_stream[doc_off[s]:doc_off[e]])
        rows_tf.append(tf_stream[tf_off[s]:tf_off[e]])
        rows_dl.append(dl_stream[dl_off[s]:dl_off[e]])
        if store_pos:
            rows_pos.append(b"".join(pos_bytes[s:e]))
    return pd.DataFrame({
        "term_id": tid[b_starts],
        "bucket": bkt[b_starts],
        "block_id": block_ids,
        "n_docs": n_docs_blk,
        "doc_ids": rows_doc,
        "tfs": rows_tf,
        "dls": rows_dl,
        "positions": rows_pos if store_pos else [None] * len(b_starts),
        "max_tf": max_tf,
        "max_score": max_score.astype(np.float64),
    })


def _block_stream_builder(cfg: BuildConfig, n_docs: int, avgdl: float):
    """mapInPandas kernel over partitions sorted by (term_id, bucket,
    doc_id): encodes blocks batch-wise, carrying the (possibly
    incomplete) trailing group across Arrow batch boundaries."""
    def build(batches):
        leftover: pd.DataFrame | None = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            tid = pdf["term_id"].to_numpy()
            bkt = pdf["bucket"].to_numpy()
            in_last = (tid == tid[-1]) & (bkt == bkt[-1])
            cut = len(pdf) - int(in_last.sum())
            if cut > 0:
                yield _encode_block_batch(pdf.iloc[:cut], cfg, n_docs, avgdl)
            leftover = pdf.iloc[cut:]
        if leftover is not None and len(leftover):
            yield _encode_block_batch(leftover, cfg, n_docs, avgdl)

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
            with_ids, cached = assign_dense_ids(
                transcripts, ["conv_id", "turn_idx"], "doc_id", parts)
            doc_meta = (with_ids
                        .withColumn("tokens", tokens_insensitive("text"))
                        .withColumn("n_tokens", F.size("tokens").cast("int"))
                        .select("doc_id", "conv_id", "turn_idx", "role",
                                "tool", "ts", "n_tokens", "tokens", "text"))
            # with_ids is already range-partitioned by (conv_id, turn_idx)
            # = doc_id order, rows sorted within partitions by the
            # row_number window → files hold disjoint sorted doc_id
            # runs; writing directly keeps parquet row-group pruning
            # and avoids a second shuffle (repartitionByRange would
            # also re-execute the pipeline for boundary sampling).
            doc_meta.write.mode("overwrite").parquet(doc_meta_path)
            cached.unpersist()
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
            terms, t_cached = assign_dense_ids(terms_agg, ["term"],
                                               "term_id", parts)
            terms = terms.select("term", "term_id", "df", "cf")
            # same: assign_dense_ids leaves terms range-partitioned
            # and sorted by term (= term_id order); write directly
            terms.write.mode("overwrite").parquet(terms_path)
            t_cached.unpersist()
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
            # hash-shuffle on (term_id, bucket) keeps each group whole
            # within a partition; sortWithinPartitions gives the kernel
            # contiguous sorted groups — the SPIMI merge shuffle.
            blocks = (joined
                      .repartition(parts, "term_id", "bucket")
                      .sortWithinPartitions("term_id", "bucket", "doc_id")
                      .select("term_id", "bucket", "doc_id", "tf", "dl",
                              "df", "positions")
                      .mapInPandas(_block_stream_builder(cfg, n_docs, avgdl),
                                   BLOCK_SCHEMA))
            # kernel output preserves the (term_id, bucket, doc_id)
            # sort of its input partition → each file is a sorted run
            # with non-overlapping row-group [min,max] on term_id, so
            # a k-term lookup touches ≤k row groups per file. A
            # repartitionByRange here would re-run the whole encode
            # pipeline for boundary sampling — write directly.
            blocks.write.mode("overwrite").parquet(postings_path)
            nb = self.spark.read.parquet(postings_path).count()
            self._finish_stage(m, "postings", t0, nb, parts)

        m["built_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        self._save_manifest(m)
        return m


def build_index(spark: SparkSession, transcripts: DataFrame, out_dir: str,
                cfg: BuildConfig | None = None, resume: bool = False) -> dict:
    return IndexBuilder(spark, out_dir, cfg).build(transcripts, resume=resume)
