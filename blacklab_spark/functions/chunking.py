"""Sequence-preparation operators for training-data pipelines:
token-window document chunking (with overlap) and deterministic
greedy sequence packing.

Both are standard steps between a curated corpus and a pretraining
data loader: chunking splits long documents into model-context-sized
windows; packing concatenates short documents into fixed-capacity
bins so batches waste no padding.

Scale notes (the 100-TB shapes):
- chunk_documents: per-row array expressions + one explode — no
  shuffle at all, whole-stage codegen end to end. The chunk count per
  row is ceil(n_tokens / stride), so output size is predictable from
  input stats.
- pack_sequences: packing is inherently sequential (bin state), so
  the corpus is hash-partitioned into ``n_groups`` independent pack
  groups and the greedy fold runs per group in ONE Arrow-batched
  kernel over (doc_id, n_tok) pairs only — never the text. Group
  assignment is a pure hash of the doc id, so the SAME packing comes
  out at any cluster size or input order; at 10^12 docs you raise
  ``n_groups`` until a group's (id, count) pairs fit an executor
  (10^6 groups → ~10^6 docs × 16 bytes each — trivially bounded).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from blacklab_spark.functions.hashing import md5_long
from blacklab_spark.tokenizer import tokens_insensitive

PACK_SALT = "pack|"


def chunk_documents(df: DataFrame, max_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document's insensitive token stream into windows of
    ``max_tokens`` tokens advancing by ``stride = max_tokens -
    overlap`` (consecutive chunks share ``overlap`` tokens — the
    sliding-window chunking used to fit long documents into a model
    context). The last window may be shorter; documents with zero
    tokens produce no chunks.

    Output: (doc_id, chunk_idx, start_tok, n_tok, chunk_digest) —
    the digest is md5 of the space-joined chunk tokens, which is what
    makes the op value-checkable cross-engine without shipping text.

    Pure JVM expressions + one explode: no shuffle, no Python.
    """
    if max_tokens < 1 or not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need max_tokens >= 1 and 0 <= overlap < max_tokens, got "
            f"max_tokens={max_tokens}, overlap={overlap}")
    stride = max_tokens - overlap
    toks = tokens_insensitive(text_col)
    return (df.select(F.col(id_col).alias("doc_id"), toks.alias("_ts"))
            .select("doc_id", "_ts",
                    F.explode(F.when(
                        F.size("_ts") > 0,
                        F.sequence(F.lit(0), F.size("_ts") - 1,
                                   F.lit(stride)))
                        .otherwise(F.array().cast("array<int>")))
                    .alias("start_tok"))
            .select("doc_id",
                    (F.col("start_tok") / stride).cast("int")
                    .alias("chunk_idx"),
                    F.col("start_tok").cast("int").alias("start_tok"),
                    F.size(F.slice("_ts", F.col("start_tok") + 1,
                                   F.lit(max_tokens))).cast("int")
                    .alias("n_tok"),
                    F.md5(F.concat_ws(" ", F.slice(
                        "_ts", F.col("start_tok") + 1,
                        F.lit(max_tokens)))).alias("chunk_digest")))


def chunk_documents_sql(max_tokens: int, stride: int,
                        tokens_expr: str) -> str:
    """DuckDB mirror of chunk_documents over the ``documents`` view
    (same window arithmetic, same md5-of-joined-tokens digest)."""
    sl = f"ts[start_tok + 1 : start_tok + {max_tokens}]"
    return f"""
WITH toks AS (SELECT doc_id, {tokens_expr} AS ts FROM documents),
starts AS (SELECT doc_id, ts,
                  unnest(generate_series(0, len(ts) - 1, {stride}))
                    AS start_tok
           FROM toks WHERE len(ts) > 0)
SELECT doc_id, (start_tok // {stride})::INT AS chunk_idx,
       start_tok::INT AS start_tok, len({sl})::INT AS n_tok,
       md5(array_to_string({sl}, ' ')) AS chunk_digest
FROM starts
"""


def _pack_kernel(cap: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort",
                              ignore_index=True)
        bins, offsets = [], []
        fill, bin_idx = 0, -1
        for n in pdf["n_tok"]:
            n = int(n)
            if bin_idx < 0 or fill + n > cap:
                bin_idx += 1
                offsets.append(0)
                fill = n
            else:
                offsets.append(fill)
                fill += n
            bins.append(bin_idx)
        pdf["bin_idx"] = pd.Series(bins, dtype="int32")
        pdf["offset"] = pd.Series(offsets, dtype="int32")
        return pdf[["doc_id", "pack_group", "bin_idx", "offset",
                    "n_tok"]]

    return fn


def pack_sequences(df: DataFrame, cap: int = 256, n_groups: int = 8,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Deterministic greedy sequence packing: documents are
    hash-assigned to ``n_groups`` independent pack groups
    (md5(salt || doc_id) mod n_groups), ordered by doc_id within a
    group, and folded greedily into bins of capacity ``cap`` tokens —
    a new bin starts whenever adding the next document would exceed
    the capacity. A document longer than ``cap`` gets a bin of its
    own (it is never truncated here; chunk first if that matters).

    The assignment depends only on doc ids and token counts, so the
    SAME packing comes out at any partitioning or cluster size —
    what makes a 10^12-doc packing job resumable and its batches
    reproducible.

    Output: (doc_id, pack_group, bin_idx, offset, n_tok) where
    ``offset`` is the document's start position inside its bin.

    Plan: one narrow projection (doc_id, group, token count — the
    text never leaves the scan stage), one shuffle on pack_group,
    one Arrow-batched greedy fold per group.
    """
    # null text → 0 tokens (size() of a null array is null; without
    # the coalesce one null row NaN-poisons the pandas kernel)
    n_tok = F.coalesce(F.size(tokens_insensitive(text_col)), F.lit(0))
    grp = F.pmod(md5_long(F.col(id_col).cast("string"),
                          salt=PACK_SALT), F.lit(n_groups))
    narrow = df.select(F.col(id_col).alias("doc_id"),
                       grp.cast("int").alias("pack_group"),
                       n_tok.cast("int").alias("n_tok"))
    return (narrow.groupBy("pack_group")
            .applyInPandas(_pack_kernel(cap),
                           "doc_id long, pack_group int, bin_idx int, "
                           "offset int, n_tok int"))


def pack_sequences_sql(cap: int, n_groups: int, tokens_expr: str,
                       md5_long_sql) -> str:
    """DuckDB mirror of pack_sequences: the greedy fold is replayed as
    a recursive CTE stepping one document per iteration within each
    pack group (groups advance in parallel per iteration; iteration
    count = the largest group's row count — fine at oracle scale, and
    the point is an INDEPENDENT re-derivation of the same
    deterministic semantics). ``md5_long_sql(expr, salt)`` is
    hashing.duckdb_md5_long."""
    h = md5_long_sql("doc_id::VARCHAR", PACK_SALT)
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, ((({h}) % {n_groups}) + {n_groups}) % {n_groups}
           AS pack_group,
         COALESCE(len({tokens_expr}), 0) AS n_tok
  FROM documents),
ordered AS (
  SELECT doc_id, pack_group, n_tok,
         row_number() OVER (PARTITION BY pack_group ORDER BY doc_id)
           AS rn
  FROM toks),
walk AS (
  SELECT pack_group, rn, doc_id, n_tok, 0 AS bin_idx, 0 AS off,
         n_tok AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT t.pack_group, t.rn, t.doc_id, t.n_tok,
         CASE WHEN w.fill + t.n_tok > {cap} THEN w.bin_idx + 1
              ELSE w.bin_idx END,
         CASE WHEN w.fill + t.n_tok > {cap} THEN 0 ELSE w.fill END,
         CASE WHEN w.fill + t.n_tok > {cap} THEN t.n_tok
              ELSE w.fill + t.n_tok END
  FROM walk w JOIN ordered t
    ON t.pack_group = w.pack_group AND t.rn = w.rn + 1)
SELECT doc_id, pack_group::INT AS pack_group, bin_idx::INT AS bin_idx,
       off::INT AS "offset", n_tok::INT AS n_tok
FROM walk
"""


SHARD_SALT = "shard|"


def shard_corpus(df: DataFrame, n_shards: int = 8,
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle + sharding for training
    dataloaders: every document gets a shard and a position within
    the shard, both pure functions of its id —

        key      = md5(salt || doc_id)        (60-bit int)
        shard    = key mod n_shards
        position = rank of key within the shard (ties → doc_id)

    so the read order (shard s ascending position) is a reproducible
    pseudo-random permutation of the corpus at ANY cluster size,
    partitioning or input order — resumable mid-epoch by (shard,
    position) watermark.

    Plan: one narrow projection (id + key — the text never moves),
    one shuffle on shard, one per-shard sort. Each shard's ordering
    is a single-task window, so at 10^12 docs raise ``n_shards``
    until one shard's (key, id) pairs fit a task — the same bounding
    knob as pack_sequences' n_groups.

    Output: (doc_id, shard, position).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = md5_long(F.col(id_col).cast("string"), salt=SHARD_SALT)
    narrow = df.select(F.col(id_col).alias("doc_id"),
                       key.alias("_key"),
                       F.pmod(key, F.lit(n_shards)).cast("int")
                       .alias("shard"))
    w = Window.partitionBy("shard").orderBy("_key", "doc_id")
    return narrow.select(
        "doc_id", "shard",
        (F.row_number().over(w) - 1).cast("int").alias("position"))


def shard_corpus_sql(n_shards: int, md5_long_sql) -> str:
    """DuckDB mirror of shard_corpus over the ``documents`` view
    (same hash key, same mod, same rank-within-shard)."""
    h = md5_long_sql("doc_id::VARCHAR", SHARD_SALT)
    return f"""
WITH keyed AS (SELECT doc_id, {h} AS k,
                      (((({h}) % {n_shards}) + {n_shards})
                        % {n_shards})::INT AS shard
               FROM documents)
SELECT doc_id, shard,
       (row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
         - 1)::INT AS position
FROM keyed
"""
