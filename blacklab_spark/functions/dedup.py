"""Deduplication operators for large-scale training-data pipelines.

All variants are declarative DataFrame plans (shuffle-conscious,
oracle-checkable); SimHash uses one Arrow-batched kernel where 60
bit-columns would otherwise explode the plan.

Scale notes (10^9+ docs):
* exact: one hash-groupBy shuffle on a 60-bit digest key (uniform, no
  skew).
* MinHash/LSH: signatures are per-doc (map-side, JVM-only); the only
  shuffle is the band-bucket self-join, whose key (band, bucket-hash)
  is uniform by construction. Candidate verification is a pair-wise
  token-set intersection — per pair, not per corpus.
* brute-force Jaccard (the oracle path) is O(n²) and exists for
  small-scale verification only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from blacklab_spark.functions.hashing import md5_long
from blacklab_spark.functions.textstats import rational_round4
from blacklab_spark.tokenizer import tokens_insensitive


def _token_set(text_col: str = "text") -> F.Column:
    return F.array_distinct(tokens_insensitive(text_col))


def _shingle_set(text_col: str, n: int) -> F.Column:
    """n=1 → distinct tokens; n>1 → distinct word n-gram shingles.
    Shingles are the meaningful unit on corpora with a shared hot
    vocabulary: token *sets* converge, word order does not."""
    return _token_set(text_col) if n == 1 else shingles(text_col, n)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content digest: one row per distinct
    text with the kept (min) id and the duplicate count."""
    return (df.select(F.col(id_col), md5_long(F.col(text_col)).alias("digest"))
            .groupBy("digest")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("dup_count")))


def shingles(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles (JVM HOF: transform over start
    positions + slice + concat)."""
    toks = tokens_insensitive(text_col)
    idxs = F.sequence(F.lit(1), F.greatest(F.lit(0), F.size(toks) - (n - 1)))
    return F.array_distinct(
        F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(toks, i, n))))


def jaccard_pairs_bruteforce(df: DataFrame, threshold: float,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             shingle_n: int = 3) -> DataFrame:
    """O(n²) shingle-set Jaccard pairs ≥ threshold (verification scale
    only). Output: (id_a, id_b, jaccard) with id_a < id_b."""
    t = df.select(F.col(id_col).alias("id"),
                  _shingle_set(text_col, shingle_n).alias("s"))
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    jac = rational_round4(inter, union)   # integer round: engine-portable
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_signature(text_col: str = "text",
                      num_hashes: int = 16, shingle_n: int = 3) -> F.Column:
    """MinHash signature: per hash i, min over the shingle set of
    md5_long(shingle, salt=i). Pure JVM column expression — arrays of
    longs, no UDF. DuckDB can re-derive it exactly (same md5 prefix)."""
    toks = _shingle_set(text_col, shingle_n)
    mins = [F.array_min(F.transform(
        toks, lambda x, i=i: F.conv(
            F.substring(F.md5(F.concat(F.lit(f"mh{i}|"), x)), 1, 15),
            16, 10).cast("long")))
        for i in range(num_hashes)]
    return F.array(*mins)


def minhash_lsh_pairs(df: DataFrame, threshold: float = 0.5,
                      num_hashes: int = 16, bands: int = 8,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      shingle_n: int = 3) -> DataFrame:
    """MinHash + LSH banding → candidate pairs → exact Jaccard verify.

    bands × rows = num_hashes; a pair collides if any band's signature
    slice matches exactly. Candidates are then verified with the exact
    token-set Jaccard, so output = true pairs ≥ threshold *among LSH
    candidates* (recall < 1 in theory; the gate fixture is verified to
    have 100% recall vs brute force — see tests)."""
    rows = num_hashes // bands
    sig = (df.select(F.col(id_col).alias("id"),
                     _shingle_set(text_col, shingle_n).alias("s"),
                     minhash_signature(text_col, num_hashes,
                                       shingle_n).alias("sig")))
    banded = sig.select(
        "id", "s",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws(",", *[
                         F.element_at("sig", b * rows + r + 1).cast("string")
                         for r in range(rows)]).alias("key"))
            for b in range(bands)])).alias("bk"))
    banded = banded.select("id", "s", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
            .dropDuplicates(["id_a", "id_b"]))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    jac = rational_round4(inter, union)
    return (cand.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


SIMHASH_BITS = 60  # md5 15-hex prefix


def simhash_kernel(batches):
    """mapInPandas kernel: (id, tokens, hashes) → (id, simhash).

    Vectorized: unpack each token hash into 60 bits, weight ±1 by tf
    (duplicate tokens appear once per occurrence), sum per doc, sign →
    bit. The per-token hash comes pre-computed from the JVM (md5
    prefix) so the oracle can re-derive bits identically.
    """
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        out = np.zeros(len(ids), dtype=np.int64)
        hl = pdf["hashes"]
        lens = np.fromiter((len(h) for h in hl), dtype=np.int64,
                           count=len(ids))
        if lens.sum() > 0:
            flat = np.concatenate([np.asarray(h, dtype=np.int64)
                                   for h in hl if len(h)]).astype(np.uint64)
            doc_idx = np.repeat(np.arange(len(ids)), lens)
            shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
            bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            contrib = bits * 2 - 1          # ±1 per bit per token
            sums = np.zeros((len(ids), SIMHASH_BITS), dtype=np.int64)
            np.add.at(sums, doc_idx, contrib)
            bitvals = (sums > 0).astype(np.uint64)
            out = (bitvals << shifts).sum(axis=1).astype(np.int64)
        yield pd.DataFrame({"id": ids, "simhash": out})


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """60-bit SimHash per doc (tf-weighted, md5-based bit source)."""
    toks = tokens_insensitive(text_col)
    hashes = F.transform(toks, lambda x: F.conv(
        F.substring(F.md5(x), 1, 15), 16, 10).cast("long"))
    base = df.select(F.col(id_col).alias("id"), hashes.alias("hashes"))
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("simhash", T.LongType())])
    return base.mapInPandas(simhash_kernel, schema)


def simhash_near_pairs(df: DataFrame, max_hamming: int = 8,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Scale path: block on 4 16-bit chunks (a pair within distance ≤3
    shares at least one exact chunk — pigeonhole); here the corpus is
    small enough to verify all pairs, so we self-join on a single
    constant key only at test scale. Output: (id_a, id_b, hamming)."""
    sh = simhash(df, id_col, text_col)
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Exact pairwise at verification scale; the LSH-bucketed scale path
    lives in functions/similarity.py (ivf assignment reuse)."""
    d = emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    a, b = d.alias("a"), d.alias("b")
    dot = F.aggregate(F.zip_with("a.v", "b.v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("a.v", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("b.v", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    cos = F.round(dot / (na * nb), 4)
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))
