"""Frozen deterministic tokenizer — the analyzer of the engine.

BlackLab's default analyzer lowercases + accent-folds for the
insensitive ("@i") layer and keeps the raw token for the sensitive
("@s") layer (reference:
engine/src/main/java/nl/inl/blacklab/analysis/BLStandardAnalyzer.java:20,
SURVEY.md §2.C). We mirror the two-sensitivity model with two derived
token columns. Tokenizer v1 is ASCII-alnum so that the *identical*
tokenization is expressible in Spark SQL, DuckDB (the driver's oracle)
and pure Python — rank-identical BM25 requires all three to agree.

All Spark paths are JVM-side column expressions (regexp_extract_all)
— no Python in the hot path. The pure-Python variant exists only for
the oracle (FIXTURES.md §4).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

from blacklab_spark.config import TOKEN_RE_INSENSITIVE, TOKEN_RE_SENSITIVE

_PY_RE_I = re.compile(TOKEN_RE_INSENSITIVE)
_PY_RE_S = re.compile(TOKEN_RE_SENSITIVE)


def tokens_insensitive(text: Column | str) -> Column:
    """Insensitive token layer: lowercase, ascii alnum runs (JVM expr)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE_INSENSITIVE), 0)


def tokens_sensitive(text: Column | str) -> Column:
    """Sensitive token layer: original case, ascii alnum runs (JVM expr)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(TOKEN_RE_SENSITIVE), 0)


def py_tokens_insensitive(text: str) -> list[str]:
    """Pure-Python mirror of :func:`tokens_insensitive` (oracle only)."""
    return _PY_RE_I.findall(text.lower()) if text else []


def py_tokens_sensitive(text: str) -> list[str]:
    return _PY_RE_S.findall(text) if text else []


# DuckDB SQL fragment producing the identical token array for a text
# expression — used when composing oracle SQL.
DUCKDB_TOKENS_I = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def duckdb_tokens_i(col: str) -> str:
    return DUCKDB_TOKENS_I.format(col=col)
