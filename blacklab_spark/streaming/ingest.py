"""Incremental / streaming index ingestion.

The reference is strictly batch: documents are appended through
``Indexer`` into Lucene segments, and Lucene merges segments later
(reference: engine/src/main/java/nl/inl/blacklab/index/IndexerImpl.java:436,
codec merge path BlackLab40PostingsWriter.java:87-106). The Spark
re-expression of "append a segment, merge later":

* ``append_delta`` — index a new batch of turns into a *delta*
  directory (its own doc-id range, own terms/postings); cheap,
  no touch of the main index.
* ``DeltaSearchEngine`` — query-time merge: scores are computed
  per-delta and combined (BM25 global stats are recomputed from the
  union's terms tables at open time, so scores equal a from-scratch
  build's — verified in tests).
* ``compact`` — offline merge of main + deltas into a fresh index
  (≙ Lucene segment merge), after which deltas are dropped.
* ``stream_ingest`` — Structured Streaming front door:
  ``readStream`` over a directory of transcript parquet,
  ``foreachBatch`` → ``append_delta``. Watermarking is not needed for
  index build (append-only, order fixed by (conv_id, turn_idx));
  exactly-once comes from the checkpointLocation + idempotent delta
  dirs keyed by batch id.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.build import build_index
from blacklab_spark.config import BuildConfig
from blacklab_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def _delta_dirs(root: str) -> list[str]:
    ddir = os.path.join(root, "_deltas")
    if not os.path.isdir(ddir):
        return []
    return sorted(os.path.join(ddir, d) for d in os.listdir(ddir)
                  if os.path.isdir(os.path.join(ddir, d))
                  and os.path.exists(os.path.join(ddir, d, "_index_meta.json")))


def _max_doc_id(spark: SparkSession, index_dir: str) -> int:
    dm = spark.read.parquet(os.path.join(index_dir, "doc_meta"))
    row = dm.agg(F.max("doc_id").alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else -1


def append_delta(spark: SparkSession, main_dir: str, batch: DataFrame,
                 cfg: BuildConfig | None = None,
                 delta_name: str | None = None) -> str:
    """Index ``batch`` as a delta of ``main_dir``. Doc ids continue
    after the current maximum across main + existing deltas, so the
    global id space stays dense-ish and unique. Idempotent per
    ``delta_name`` (existing complete delta is left untouched)."""
    parts = [main_dir] + _delta_dirs(main_dir)
    # global id space: each part's ids are local-dense; its recorded
    # offset shifts them. The next delta starts after the global max.
    base = -1
    for p in parts:
        with open(os.path.join(p, "_index_meta.json")) as f:
            off = json.load(f).get("doc_id_offset", 0)
        base = max(base, off + _max_doc_id(spark, p))
    base += 1
    name = delta_name or f"delta{len(_delta_dirs(main_dir)):05d}"
    out = os.path.join(main_dir, "_deltas", name)
    if os.path.exists(os.path.join(out, "_index_meta.json")):
        return out
    cfg = cfg or BuildConfig()
    # shift doc ids by building standalone then offsetting at read —
    # simpler: build with an id offset recorded in the delta meta
    build_index(spark, batch, out, cfg)
    with open(os.path.join(out, "_index_meta.json")) as f:
        meta = json.load(f)
    meta["doc_id_offset"] = base
    with open(os.path.join(out, "_index_meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return out


def union_corpus(spark: SparkSession, main_dir: str) -> DataFrame:
    """All SURVIVING turns of main + deltas as one transcript
    DataFrame (per-part delete tombstones are honored, so compaction
    expunges them — ≙ Lucene merge dropping deleted docs)."""
    from blacklab_spark.index import open_index
    dfs = []
    for p in [main_dir] + _delta_dirs(main_dir):
        dm = open_index(spark, p).doc_meta
        dfs.append(dm.select("conv_id", "turn_idx", "role", "text",
                             "tool", "ts"))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def compact(spark: SparkSession, main_dir: str, out_dir: str,
            cfg: BuildConfig | None = None) -> dict:
    """Merge main + deltas into a fresh index (≙ Lucene segment merge).

    A full rebuild of the union corpus: global doc ids, df/cf and
    avgdl are recomputed, so the compacted index is bit-identical to
    an index built from the union in one shot (tested)."""
    corpus = union_corpus(spark, main_dir)
    return build_index(spark, corpus, out_dir, cfg or BuildConfig())


class DeltaSearchEngine:
    """Query-time merge over main + delta indexes (≙ Lucene searching
    across unmerged segments). BM25 stats (N, avgdl, df) are the union
    corpus's, so scores equal a from-scratch build of the union —
    verified in tests against a compacted rebuild."""

    def __init__(self, spark: SparkSession, main_dir: str):
        from blacklab_spark.index import open_index
        self.spark = spark
        self.parts = [open_index(spark, p)
                      for p in [main_dir] + _delta_dirs(main_dir)]
        self.offsets = []
        for p in self.parts:
            with open(os.path.join(p.path, "_index_meta.json")) as f:
                self.offsets.append(json.load(f).get("doc_id_offset", 0))
        self.n_docs = sum(p.n_docs for p in self.parts)
        total_tokens = sum(p.meta["stats"]["total_tokens"] for p in self.parts)
        self.avgdl = total_tokens / max(1, self.n_docs)

    def _score_blocks(self, p, blocks, idf_map, allowed, k=None):
        """Exact union-stat BM25 over one part's blocks (cogrouped
        with the allowed doc set when filtered); tombstones excluded."""
        from blacklab_spark.operators.scoring import (
            SCORE_SCHEMA, score_bucket_kernel, score_bucket_kernel_filtered)
        sel = blocks.select("bucket", "term_id", "doc_ids", "tfs", "dls")
        if allowed is None:
            out = sel.groupBy("bucket").applyInPandas(
                score_bucket_kernel(idf_map, p.cfg.k1, p.cfg.b,
                                    self.avgdl, local_k=k), SCORE_SCHEMA)
        else:
            out = (sel.groupBy("bucket")
                   .cogroup(allowed.groupBy("bucket"))
                   .applyInPandas(
                       score_bucket_kernel_filtered(
                           idf_map, p.cfg.k1, p.cfg.b, self.avgdl,
                           local_k=k), SCORE_SCHEMA))
        return p.without_deleted(out)

    def find(self, cql: str) -> DataFrame:
        """CQL over main + deltas (≙ Lucene searching unmerged
        segments): every part is a complete index, positional
        semantics are per-document, so each part executes the same
        plan locally — postings leaves, cost-based sequences, the
        whole span algebra — its tombstones are honored, local hit
        doc ids shift by the part's recorded offset, and the results
        union. Identical to a compacted rebuild's hits by
        construction (ids are the one-shot build's when parts were
        appended in (conv_id, turn_idx) order — tested)."""
        from blacklab_spark.plans.executor import find as _find
        outs = []
        for p, off in zip(self.parts, self.offsets):
            hits = p.without_deleted(_find(p, cql))
            cols = [c for c in ("doc_id", "start", "end", "match_info")
                    if c in hits.columns]
            outs.append(hits.select(*cols).withColumn(
                "doc_id", F.col("doc_id") + F.lit(off)))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o, allowMissingColumns=True)
        return out

    def topk(self, terms: list[str], k: int = 10, mode: str = "auto",
             role=None, tool=None, conv_id=None, seed_blocks: int = 64):
        """Top-k over main + deltas with union-corpus BM25 stats,
        metadata filters, and block pruning (VERDICT r02 #6/#7).

        The stored per-block ``max_score`` was computed with the
        PART's build-time idf/avgdl, so it is not a valid bound under
        union stats. A dl-free bound from ``max_tf`` is:
        ``ub = idf_union · max_tf·(k1+1)/(max_tf + k1·(1−b))``
        (the contribution is increasing in tf and the norm denominator
        is ≥ tf + k1·(1−b) for any dl/avgdl). The threshold t0 is the
        k-th best EXACT partial score of seed blocks across parts —
        ≥k distinct surviving docs (part offsets keep ids disjoint;
        tombstoned/filtered docs never enter the seed), so pruning
        buckets with Σ_terms max(ub) < t0 is certified safe.
        mode: auto (cost rule as SearchEngine.topk) | wand |
        exhaustive (dual verification path)."""
        from blacklab_spark.engine import SearchEngine
        from blacklab_spark.oracle import bm25_idf
        filt = SearchEngine._doc_filter(role, tool, conv_id)
        if mode == "auto":
            mode = "exhaustive" if self.n_docs < 1_000_000 else "wand"
        # global df per term across parts
        df_by_term: dict[str, int] = {}
        infos = []
        for p in self.parts:
            info = p.lookup_terms(terms)
            infos.append(info)
            for t, d in zip(info["term"], info["df"]):
                df_by_term[t] = df_by_term.get(t, 0) + int(d)

        parts_data = []
        for p, off, info in zip(self.parts, self.offsets, infos):
            if info.empty:
                continue
            idf_map = {int(tid): bm25_idf(self.n_docs, df_by_term[t])
                       for t, tid in zip(info["term"], info["term_id"])}
            blocks = p.postings.filter(
                F.col("term_id").isin([int(t) for t in info["term_id"]]))
            allowed = None
            if filt is not None:
                bs = p.cfg.bucket_size
                allowed = (p.doc_meta.filter(filt)
                           .select("doc_id", F.expr(f"doc_id div {bs}")
                                   .alias("bucket")))
                blocks = blocks.join(allowed.select("bucket").distinct(),
                                     "bucket", "left_semi")
            if mode == "wand":
                imap = F.create_map(*[F.lit(x) for kv in idf_map.items()
                                      for x in kv])
                c = p.cfg.k1 * (1.0 - p.cfg.b)
                ub = (imap[F.col("term_id")]
                      * (F.col("max_tf") * (p.cfg.k1 + 1.0))
                      / (F.col("max_tf") + F.lit(c)))
                blocks = blocks.withColumn("ub", ub)
            parts_data.append((p, off, idf_map, blocks, allowed))

        if not parts_data:
            return self.spark.createDataFrame([], "doc_id long, score double")

        t0 = 0.0
        if mode == "wand":
            seed_scores: list[float] = []
            for p, off, idf_map, blocks, allowed in parts_data:
                seed = blocks.orderBy(F.desc("ub")).limit(seed_blocks)
                rows = (self._score_blocks(p, seed, idf_map, allowed, k=k)
                        .orderBy(F.desc("score"), F.asc("doc_id"))
                        .limit(k).collect())
                seed_scores.extend(float(r["score"]) for r in rows)
            seed_scores.sort(reverse=True)
            t0 = seed_scores[k - 1] if len(seed_scores) >= k else 0.0

        scores = None
        for p, off, idf_map, blocks, allowed in parts_data:
            if mode == "wand" and t0 > 0.0:
                per_term = (blocks.groupBy("bucket", "term_id")
                            .agg(F.max("ub").alias("term_best")))
                keep = (per_term.groupBy("bucket")
                        .agg(F.sum("term_best").alias("ubb"))
                        .filter(F.col("ubb") >= t0).select("bucket"))
                blocks = blocks.join(keep, "bucket", "left_semi")
            s = (self._score_blocks(p, blocks, idf_map, allowed,
                                    k=k if mode == "wand" else None)
                 .select((F.col("doc_id") + off).alias("doc_id"), "score"))
            scores = s if scores is None else scores.unionByName(s)
        return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def stream_ingest(spark: SparkSession, source_dir: str, main_dir: str,
                  checkpoint_dir: str, cfg: BuildConfig | None = None,
                  available_now: bool = True):
    """Structured Streaming ingestion: watch ``source_dir`` for new
    transcript parquet files, append each micro-batch as a delta.

    Returns the StreamingQuery (caller awaits/terminates). Deltas are
    keyed by batch id → restarts re-use the checkpoint and already-
    written deltas are skipped (exactly-once at the index level)."""
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .parquet(source_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_delta(spark, main_dir, batch_df, cfg,
                     delta_name=f"batch{batch_id:08d}")

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
