"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

All pure JVM column expressions (whole-stage codegen; zero Python),
each with an exact DuckDB-SQL mirror in driver_gate. Arithmetic is
integer/ratio-based with explicit rounding so the oracle matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from blacklab_spark.tokenizer import tokens_insensitive


def rational_round4(num, den) -> F.Column:
    """round(num/den, 4) with half-up semantics computed in *integer*
    arithmetic: float round() of a rational whose 5th decimal is
    exactly 5 (e.g. 0.48325) is a cross-engine coin flip — the double
    sits on either side of the half depending on how each engine got
    there. (20000·num + den) // (2·den) is deterministic everywhere.
    """
    q = F.floor((20000 * num + den) / (2 * den))
    return q.cast("double") / 10000.0

# frozen stopword list v1 (shared with oracle SQL verbatim)
EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is",
                "you", "that", "it", "for", "on", "with", "as", "at", "be"]

# BPE-ish subword proxy: alnum runs + punctuation singles
BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"


def _stopword_count(toks) -> F.Column:
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def _stopword_ratio(toks) -> F.Column:
    return F.when(F.size(toks) > 0,
                  rational_round4(_stopword_count(toks), F.size(toks))) \
            .otherwise(F.lit(0.0))


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic: docs whose English-stopword
    ratio ≥ 0.08 classify 'en', else 'other'. (An n-gram profile model
    would slot in here; the gate needs a deterministic, SQL-mirrorable
    heuristic.) Output: (doc_id, sw_ratio, pred_lang)."""
    toks = tokens_insensitive(text_col)
    ratio = _stopword_ratio(toks)
    # threshold test in integers (100·count ≥ 8·n), not on the rounded
    # float — boundary docs must classify identically in the oracle
    is_en = _stopword_count(toks) * 100 >= F.size(toks) * 8
    return df.select(
        F.col(id_col).alias("doc_id"), ratio.alias("sw_ratio"),
        F.when(is_en, F.lit("en")).otherwise(F.lit("other"))
         .alias("pred_lang"))


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-doc quality metrics + a combined [0,1] score:
    length (saturating at 200 tokens), mean token length in a sane
    band, stopword presence. Output columns rounded to 4dp."""
    toks = tokens_insensitive(text_col)
    n = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_len = F.when(n > 0, rational_round4(sum_len, n)).otherwise(F.lit(0.0))
    swc = _stopword_count(toks)
    # quality = (min(n,200)/200 + min(5·swc, n)/n) / 2
    #         = (m·n + 200·c) / (400·n) — one rational, rounded once
    m = F.least(n, F.lit(200))
    c = F.least(swc * 5, n)
    score = F.when(n > 0, rational_round4(m * n + 200 * c, 400 * n)) \
             .otherwise(F.lit(0.0))
    return df.select(F.col(id_col).alias("doc_id"),
                     n.cast("int").alias("n_tokens"),
                     mean_len.alias("mean_token_len"),
                     _stopword_ratio(toks).alias("stopword_ratio"),
                     score.alias("quality"))


def token_stats(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Token counting: whitespace words vs BPE-ish subword units
    (alnum runs + punctuation singles over lowercased text)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                      F.lit(BPE_RE), 0))
    return df.select(F.col(id_col).alias("doc_id"),
                     F.when(F.length(F.trim(F.col(text_col))) > 0, ws)
                      .otherwise(F.lit(0)).cast("int").alias("ws_tokens"),
                     bpe.cast("int").alias("bpe_tokens"))


FP_MOD = (1 << 31) - 1   # Mersenne prime 2^31-1; h*31+x stays < 2^36
FP_MULT = 31


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling document fingerprint:
    fold over tokens of h = (h*31 + md5_long(tok) mod M) mod M.
    JVM aggregate HOF; DuckDB mirrors with list_reduce."""
    toks = tokens_insensitive(text_col)
    tok_h = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10) \
        .cast("long") % FP_MOD
    fp = F.aggregate(toks, F.lit(0).cast("long"),
                     lambda acc, t: (acc * FP_MULT + tok_h(t)) % FP_MOD)
    return df.select(F.col(id_col).alias("doc_id"),
                     fp.alias("fingerprint"))
