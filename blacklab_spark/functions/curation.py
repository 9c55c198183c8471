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


MIX_SALT = "mix|"


def mixture_sample(df: DataFrame, weights: dict[str, int],
                   budget_tokens: int | None = None,
                   domain_col: str = "lang", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Deterministic domain-mixture sampling: choose per-domain
    acceptance rates so the KEPT corpus's token composition matches
    the target ``weights`` (positive integers, normalized by their
    sum), scaled as large as the scarcest domain allows — optionally
    capped by ``budget_tokens``. Domains absent from ``weights`` (or
    with zero corpus tokens) are dropped.

    All arithmetic is exact integer floor math so the DuckDB oracle
    re-derives the identical rate table: with W = weights, S = sum(W),
    tok_d = corpus tokens of domain d,

        cap     = min(min_d tok_d * S // W_d, budget_tokens)
        rate_d  = min(1000, 1000 * (W_d * cap // S) // tok_d)   # permille

    and a document is kept iff md5(salt || doc_id) mod 1000 < rate_d —
    the same hash predicate as stratified_sample, so the selection is
    partition/cluster-size invariant and resumable.

    Two-pass plan (inherent: the rates depend on corpus totals):
    pass 1 is a map-side partial aggregation to one row per domain
    (collected — bounded by the domain-vocabulary size, never by
    corpus size); pass 2 broadcasts the literal rate table and
    filters in the scan stage. The text column never shuffles.

    Output: (doc_id, domain, n_tok, bucket, rate) for kept docs.
    """
    if not weights or any(int(w) <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    weights = {d: int(w) for d, w in weights.items()}
    w_sum = sum(weights.values())
    narrow = df.select(F.col(id_col).alias("doc_id"),
                       F.col(domain_col).alias("domain"),
                       F.coalesce(F.size(tokens_insensitive(text_col)),
                                  F.lit(0))
                       .cast("long").alias("n_tok"))
    toks = {r["domain"]: int(r["tok"]) for r in
            narrow.groupBy("domain").agg(F.sum("n_tok").alias("tok"))
                  .collect()
            if r["domain"] in weights and r["tok"] and r["tok"] > 0}
    if not toks:
        cap = 0
    else:
        cap = min(tok * w_sum // weights[d] for d, tok in toks.items())
    if budget_tokens is not None:
        cap = min(cap, int(budget_tokens))
    rates = {d: min(1000, 1000 * (weights[d] * cap // w_sum) // tok)
             for d, tok in toks.items()}
    spark = SparkSession.getActiveSession()
    rate_df = F.broadcast(spark.createDataFrame(
        [(d, int(r)) for d, r in sorted(rates.items())],
        "domain string, rate int"))
    bucket = F.pmod(md5_long(F.col("doc_id").cast("string"),
                             salt=MIX_SALT), F.lit(SAMPLE_DENOM))
    return (narrow.join(rate_df, "domain")
            .withColumn("bucket", bucket.cast("int"))
            .filter(F.col("bucket") < F.col("rate"))
            .select("doc_id", "domain",
                    F.col("n_tok").cast("int").alias("n_tok"),
                    "bucket", "rate"))


def mixture_sample_sql(weights: dict[str, int],
                       budget_tokens: int | None, tokens_expr: str,
                       md5_long_sql, domain_col: str = "lang") -> str:
    """DuckDB mirror of mixture_sample over the ``documents`` view:
    the same integer floor arithmetic re-derived entirely in SQL
    (``//`` is exact integer division for positive BIGINTs in both
    DuckDB and Python). ``md5_long_sql`` is hashing.duckdb_md5_long."""
    w_sum = sum(int(w) for w in weights.values())
    vals = ", ".join(f"('{d}', {int(w)})"
                     for d, w in sorted(weights.items()))
    cap = "cap0" if budget_tokens is None \
        else f"LEAST(cap0, {int(budget_tokens)})"
    h = md5_long_sql("doc_id::VARCHAR", MIX_SALT)
    return f"""
WITH narrow AS (SELECT doc_id, {domain_col} AS domain,
                       COALESCE(len({tokens_expr}), 0)::BIGINT AS n_tok
                FROM documents),
w(domain, wt) AS (VALUES {vals}),
tok AS (SELECT domain, SUM(n_tok) AS tok FROM narrow GROUP BY domain),
j AS (SELECT domain, tok, wt FROM tok JOIN w USING (domain)
      WHERE tok > 0),
cap AS (SELECT MIN(tok * {w_sum} // wt) AS cap0 FROM j),
rates AS (SELECT domain,
                 LEAST(1000, (1000 * (wt * ({cap}) // {w_sum})) // tok)
                   AS rate
          FROM j, cap)
SELECT n.doc_id, n.domain, n.n_tok::INT AS n_tok,
       (((({h}) % 1000) + 1000) % 1000)::INT AS bucket,
       r.rate::INT AS rate
FROM narrow n JOIN rates r USING (domain)
WHERE (((({h}) % 1000) + 1000) % 1000) < r.rate
"""
