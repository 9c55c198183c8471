"""Corpus-curation operators for training-data pipelines:
benchmark decontamination, PII redaction, deterministic stratified
sampling, within-document repetition scoring.

Same discipline as textstats.py: pure JVM column expressions
(whole-stage codegen, zero Python in the hot path), integer/rational
arithmetic with explicit rounding, and an exact DuckDB-SQL mirror for
every op in driver_gate_pipeline.py.

Scale notes (the 100-TB shapes):
- decontaminate: the benchmark side (eval/test sets) is small by
  construction — its distinct shingle set is broadcast, so the only
  wide plan over the corpus is a map-side explode + broadcast
  semi-join + partial count aggregation. No corpus-side shuffle on
  the raw text.
- stratified_sample: the per-stratum rate table is a literal
  broadcast; sampling is a deterministic hash predicate evaluated in
  the scan stage (filter pushdown keeps it before any shuffle), so
  the same doc set is kept at any partitioning or cluster size.
- redact_pii / repetition_ratio: per-row expressions only — embarrass
  ingly parallel, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.functions.hashing import md5_long
from blacklab_spark.functions.textstats import rational_round4
from blacklab_spark.tokenizer import tokens_insensitive


def _all_shingles(toks, n: int):
    """All word-level n-gram strings of a token array in order
    (1-based slice, space-joined) — empty when the doc has < n tokens.
    The < n guard matters: Spark's sequence(1, 0) counts DOWN ([1, 0])
    rather than yielding an empty array."""
    empty = F.array().cast("array<string>")
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)))) \
        .otherwise(empty)


def _shingles(toks, n: int):
    """Distinct n-grams of a token array (order dropped)."""
    return F.array_distinct(_all_shingles(toks, n))


def benchmark_shingles(benchmark: DataFrame, n: int = 8,
                       text_col: str = "text") -> DataFrame:
    """Distinct n-gram set of the benchmark (the contamination
    blocklist). Output: one row per distinct shingle."""
    toks = tokens_insensitive(text_col)
    return (benchmark
            .select(F.explode(_shingles(toks, n)).alias("shingle"))
            .distinct())


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: for each document, count distinct
    word n-grams it shares with the benchmark set and flag it
    contaminated if any overlap (the n-gram-overlap rule used to
    scrub eval sets out of web-scale training corpora; n=8..13
    typical).

    Plan: benchmark shingles (small — eval sets are MBs) are
    broadcast; the corpus side is ONE scan — explode_outer (so docs
    with < n tokens keep a null-shingle row) → broadcast left join →
    groupBy(doc_id) partial agg. Every input doc appears exactly
    once; the corpus is never scanned twice and never shuffled on
    anything but the final doc_id aggregation.

    Output: (doc_id, n_contaminated_ngrams, contaminated 0/1).
    """
    toks = tokens_insensitive(text_col)
    bench = F.broadcast(benchmark_shingles(benchmark, n, text_col)
                        .withColumn("_m", F.lit(1)))
    exploded = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_shingles(toks, n)).alias("shingle")))
    n_hits = F.sum(F.coalesce(F.col("_m"), F.lit(0)))
    return (exploded.join(bench, "shingle", "left")
            .groupBy("doc_id")
            .agg(n_hits.cast("int").alias("n_contaminated_ngrams"),
                 F.when(n_hits > 0, F.lit(1)).otherwise(F.lit(0))
                  .alias("contaminated")))


#: PII patterns — intersection of Java-regex and RE2 syntax so the
#: DuckDB oracle runs the *same* pattern strings verbatim. Applied in
#: declaration order (email first so its digits/dots never re-match as
#: an IP or number run).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{13,19}\b", "<NUMBER>"),
)


def redact_pii(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """PII redaction: replace emails, IPv4 addresses and long digit
    runs (card/account numbers) with typed placeholder tokens.
    Per-pattern match counts are taken on the PRE-redaction text;
    replacement is sequential in PII_PATTERNS order.

    Pure regexp_replace / regexp_count chain — no shuffle, fully
    whole-stage-codegen; the pattern set is the common Java/RE2
    syntax subset so the oracle replays it verbatim.

    Output: (doc_id, n_email, n_ipv4, n_card, redacted_digest).
    """
    text = F.col(text_col)
    counts = {name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
              for name, pat, _ in PII_PATTERNS}
    red = text
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[counts[name].cast("int").alias(f"n_{name}")
          for name, _, _ in PII_PATTERNS],
        F.md5(red).alias("redacted_digest"))


SAMPLE_SALT = "strat|"
SAMPLE_DENOM = 1000


def stratified_sample(df: DataFrame, rates: dict[str, int],
                      strata_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified sampling: keep a document iff
    md5(salt || doc_id) mod 1000 < rate[stratum] (rate in permille).
    Strata absent from ``rates`` are dropped (rate 0).

    The hash predicate depends only on the doc id — the SAME subset
    is selected at any partitioning, executor count or input order
    (unlike rand()-based sampling), which is what makes a 100-TB
    sampling job resumable and its output reproducible. The rate
    table is a literal broadcast join (no shuffle of the corpus).

    Output: (doc_id, stratum, bucket) for kept docs.
    """
    spark = SparkSession.getActiveSession()
    rate_df = F.broadcast(spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, _rate int"))
    bucket = F.pmod(md5_long(F.col(id_col).cast("string"),
                             salt=SAMPLE_SALT), F.lit(SAMPLE_DENOM))
    return (df.join(rate_df, strata_col)
            .withColumn("bucket", bucket.cast("int"))
            .filter(F.col("bucket") < F.col("_rate"))
            .select(F.col(id_col).alias("doc_id"),
                    F.col(strata_col).alias("stratum"), "bucket"))


def repetition_ratio(df: DataFrame, n: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition score (a Gopher-style quality rule):
    the fraction of word n-gram occurrences that are repeats of an
    earlier n-gram in the same document —
    (total − distinct) / total n-grams, 4dp rational rounding.
    High values mark boilerplate / degenerate generations.

    Per-row array expressions only (transform + array_distinct);
    embarrassingly parallel. Output:
    (doc_id, n_ngrams, n_distinct, dup_ratio).
    """
    toks = tokens_insensitive(text_col)
    all_sh = _all_shingles(toks, n)
    total = F.size(all_sh)
    dist = F.size(F.array_distinct(all_sh))
    ratio = F.when(total > 0, rational_round4(total - dist, total)) \
             .otherwise(F.lit(0.0))
    return df.select(F.col(id_col).alias("doc_id"),
                     total.cast("int").alias("n_ngrams"),
                     dist.cast("int").alias("n_distinct"),
                     ratio.alias("dup_ratio"))
