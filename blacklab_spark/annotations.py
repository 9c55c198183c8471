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

#: annotation name → doc_meta column holding its token array
ANNOTATION_COLUMNS = {
    "word": "tokens",        # insensitive (@i) — the default layer
    "word_s": "tokens_s",    # sensitive (@s)
    "pos": "tokens_pos",
}


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


def py_pos_tag(tok: str) -> str:
    """Pure-Python mirror (oracle)."""
    if tok in POS_FUNC_WORDS:
        return "func"
    if tok and unicodedata.category(tok[0])[0] == "N":
        return "num"
    if tok.endswith("ing") or tok.endswith("ed"):
        return "verb"
    return "noun"


def duckdb_pos_tags(ts: str) -> str:
    """DuckDB list expression deriving the pos layer from a token
    array expression ``ts`` — identical rules."""
    fw = ", ".join(f"'{w}'" for w in POS_FUNC_WORDS)
    return (f"list_transform({ts}, t -> "
            f"CASE WHEN t IN ({fw}) THEN 'func' "
            "WHEN regexp_matches(substr(t, 1, 1), '\\p{N}') THEN 'num' "
            "WHEN t LIKE '%ing' OR t LIKE '%ed' THEN 'verb' "
            "ELSE 'noun' END)")
