"""Annotation layers beyond ``word`` — BlackLab's parallel token
layers (reference: search/indexmetadata/Annotation.java:9; the test
corpus indexes word/lemma/pos, test/data/voice-tei.blf.yaml; grammar
``[pos="..."]`` — query-parser cql.jj:631 attValuePair).

The transcript corpus has no gold linguistic annotation, so the
``pos`` layer is a DETERMINISTIC synthetic tagger over the insensitive
token — a pure per-token function expressible identically in Spark
SQL, DuckDB SQL and Python, which is what the multi-layer machinery
needs to be gate-checkable. A real tagger (or a lemma layer) drops in
as another derived array column with the same plumbing.

Layout: one token-array column per (annotation, sensitivity) —
``tokens`` (word@i), ``tokens_s`` (word@s), ``tokens_pos`` (pos) —
the columnar equivalent of the reference's ``contents%word@i`` /
``contents%pos@i`` Lucene fields (AnnotatedFieldNameUtil.java:66-72).
All layers are position-aligned by construction.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column, functions as F

POS_FUNC_WORDS = ("the", "a", "and", "you", "of", "to", "in", "is",
                  "it", "that", "for", "on", "with", "please")

#: annotation name → doc_meta column holding its token array.
#: The four word sensitivities mirror the reference's per-annotation
#: variants (indexmetadata/MatchSensitivity.java:12-17): @i both-
#: insensitive, @s both-sensitive, @ci case-insensitive only (common
#: for German/French corpora), @di diacritics-insensitive only.
ANNOTATION_COLUMNS = {
    "word": "tokens",        # insensitive (@i) — the default layer
    "word_s": "tokens_s",    # sensitive (@s)
    "word_ci": "tokens_ci",  # lower(tokens_s): accent-sensitive
    "word_di": "tokens_di",  # fold(tokens_s): case-sensitive
    "pos": "tokens_pos",
    # SUBANNOTATION (grammar annotName: name "/" subAnnot,
    # cql.jj:643-654; indexed as annotation "pos/coarse" — the
    # reference's subannotation naming, AnnotatedFieldNameUtil):
    # a coarse view of the pos layer (fw = function word, cw =
    # content word), derived from tokens_pos.
    "pos/coarse": "tokens_pos_coarse",
    "lemma": "tokens_lemma",  # MULTI-VALUE: array of values per pos
}

#: layers whose column is array<array<string>> — multiple values per
#: token position, the reference's position-increment-0 model
#: (AnnotationWriter.java:233-311: addValue(value, posIncrement=0)
#: stacks values on one position; a payload flag marks ONE value
#: primary). Here: element 0 is the primary value (drives display),
#: the rest are searchable secondaries. A query value matches a
#: position iff ANY stacked value equals it.
MULTI_VALUE_LAYERS = {"lemma"}


def pos_tag(tok: Column) -> Column:
    """Synthetic POS tag of one (insensitive) token — JVM expr.
    Suffix checks use endswith (plain string ops) rather than a regex;
    identical semantics in DuckDB (LIKE '%ing') and Python."""
    return (F.when(tok.isin(*POS_FUNC_WORDS), F.lit("func"))
            .when(F.substring(tok, 1, 1).rlike("\\p{N}"), F.lit("num"))
            .when(tok.endswith("ing") | tok.endswith("ed"), F.lit("verb"))
            .otherwise(F.lit("noun")))


def tokens_pos(tokens_col: Column | str) -> Column:
    """Derive the pos layer from the insensitive token array."""
    col = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.transform(col, pos_tag)


def pos_coarse(tag: Column) -> Column:
    """Coarse view of one pos tag — the pos/coarse subannotation:
    'fw' (function word) vs 'cw' (content word)."""
    return F.when(tag == "func", F.lit("fw")).otherwise(F.lit("cw"))


def tokens_pos_coarse(pos_col: Column | str) -> Column:
    """Derive the pos/coarse subannotation layer from the pos layer."""
    col = F.col(pos_col) if isinstance(pos_col, str) else pos_col
    return F.transform(col, pos_coarse)


def lemma_stem(tok: Column) -> Column:
    """Deterministic suffix-strip stem of one insensitive token — the
    synthetic 'ambiguous lemma' generator (same role the synthetic pos
    tagger plays): a pure per-token function identical in Spark SQL,
    DuckDB and Python. -ing (len>5), -ed (len>4), -s (len>3, not -ss)."""
    return (F.when((F.length(tok) > 5) & tok.endswith("ing"),
                   tok.substr(F.lit(1), F.length(tok) - 3))
            .when((F.length(tok) > 4) & tok.endswith("ed"),
                  tok.substr(F.lit(1), F.length(tok) - 2))
            .when((F.length(tok) > 3) & tok.endswith("s")
                  & ~tok.endswith("ss"),
                  tok.substr(F.lit(1), F.length(tok) - 1))
            .otherwise(tok))


def lemma_values(tok: Column) -> Column:
    """Stacked values for one position: [token] when the stem is the
    token itself, else [token, stem] — token is the primary value."""
    stem = lemma_stem(tok)
    return F.when(stem == tok, F.array(tok)).otherwise(F.array(tok, stem))


def tokens_lemma(tokens_col: Column | str) -> Column:
    """Derive the multi-value lemma layer (array<array<string>>) from
    the insensitive token array."""
    col = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.transform(col, lemma_values)


def with_token_layers(df, annotations: tuple = ()):
    """Ensure the token-layer columns exist on a doc_meta frame,
    deriving any missing one from ``text`` (format v5 default: the
    content store is the forward index; tokenizer expressions are
    deterministic JVM columns, so a layer not selected downstream
    costs nothing — Catalyst prunes it)."""
    from blacklab_spark.tokenizer import (fold_diacritics,
                                          tokens_insensitive,
                                          tokens_sensitive)
    # One withColumns call = ONE Project node: chained withColumn
    # builds six nested Projects that every downstream analysis pass
    # re-walks per query — measurable driver latency on a serving
    # engine (~0.1s/action at 6 layers, r3 profiling).
    derived: dict[str, Column] = {}
    if "tokens" not in df.columns:
        derived["tokens"] = tokens_insensitive("text")
    if "tokens_s" not in df.columns:
        derived["tokens_s"] = tokens_sensitive("text")
    tokens_s = (F.col("tokens_s") if "tokens_s" in df.columns
                else derived.get("tokens_s"))
    tokens_i = (F.col("tokens") if "tokens" in df.columns
                else derived.get("tokens"))
    # ci/di are always derived (never stored): one transform() over
    # the sensitive layer each, pruned away unless a query probes them
    if "tokens_ci" not in df.columns:
        derived["tokens_ci"] = F.transform(tokens_s, F.lower)
    if "tokens_di" not in df.columns:
        derived["tokens_di"] = F.transform(tokens_s, fold_diacritics)
    if "pos" in (annotations or ()) and "tokens_pos" not in df.columns:
        derived["tokens_pos"] = tokens_pos(tokens_i)
    # pos/coarse subannotation: derived from the pos layer whenever
    # pos exists (stored or just derived), pruned unless probed
    if "tokens_pos_coarse" not in df.columns:
        pos_src = (F.col("tokens_pos") if "tokens_pos" in df.columns
                   else derived.get("tokens_pos"))
        if pos_src is not None:
            derived["tokens_pos_coarse"] = tokens_pos_coarse(pos_src)
    # lemma is always derived (never stored), like ci/di: a transform
    # over the insensitive layer, pruned unless a query probes it —
    # so it is available on every index regardless of build-time
    # `annotations` and needs no format/manifest change.
    if "tokens_lemma" not in df.columns:
        derived["tokens_lemma"] = tokens_lemma(tokens_i)
    return df.withColumns(derived) if derived else df


def py_pos_tag(tok: str) -> str:
    """Pure-Python mirror (oracle)."""
    if tok in POS_FUNC_WORDS:
        return "func"
    if tok and unicodedata.category(tok[0])[0] == "N":
        return "num"
    if tok.endswith("ing") or tok.endswith("ed"):
        return "verb"
    return "noun"


def py_pos_coarse(tag: str) -> str:
    """Pure-Python mirror of pos_coarse (oracle)."""
    return "fw" if tag == "func" else "cw"


def py_lemma_stem(tok: str) -> str:
    """Pure-Python mirror of lemma_stem (oracle)."""
    if len(tok) > 5 and tok.endswith("ing"):
        return tok[:-3]
    if len(tok) > 4 and tok.endswith("ed"):
        return tok[:-2]
    if len(tok) > 3 and tok.endswith("s") and not tok.endswith("ss"):
        return tok[:-1]
    return tok


def duckdb_lemma_stem(tok: str = "tok") -> str:
    """DuckDB CASE expression mirroring lemma_stem over a token
    column expression ``tok`` — identical rules."""
    return (f"CASE WHEN len({tok}) > 5 AND {tok} LIKE '%ing' "
            f"THEN substr({tok}, 1, len({tok}) - 3) "
            f"WHEN len({tok}) > 4 AND {tok} LIKE '%ed' "
            f"THEN substr({tok}, 1, len({tok}) - 2) "
            f"WHEN len({tok}) > 3 AND {tok} LIKE '%s' "
            f"AND {tok} NOT LIKE '%ss' "
            f"THEN substr({tok}, 1, len({tok}) - 1) "
            f"ELSE {tok} END")


def duckdb_pos_coarse(ps: str) -> str:
    """DuckDB list expression deriving pos/coarse from a pos-tag
    array expression ``ps`` — identical rules."""
    return (f"list_transform({ps}, t -> "
            "CASE WHEN t = 'func' THEN 'fw' ELSE 'cw' END)")


def duckdb_pos_tags(ts: str) -> str:
    """DuckDB list expression deriving the pos layer from a token
    array expression ``ts`` — identical rules."""
    fw = ", ".join(f"'{w}'" for w in POS_FUNC_WORDS)
    return (f"list_transform({ts}, t -> "
            f"CASE WHEN t IN ({fw}) THEN 'func' "
            "WHEN regexp_matches(substr(t, 1, 1), '\\p{N}') THEN 'num' "
            "WHEN t LIKE '%ing' OR t LIKE '%ed' THEN 'verb' "
            "ELSE 'noun' END)")
