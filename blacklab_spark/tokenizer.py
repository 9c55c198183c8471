"""Frozen deterministic tokenizer — the analyzer of the engine.

BlackLab's default analyzer lowercases + accent-folds for the
insensitive ("@i") layer and keeps the raw token for the sensitive
("@s") layer (reference:
engine/src/main/java/nl/inl/blacklab/analysis/BLStandardAnalyzer.java:20,30-33,
DesensitizeFilter.java; SURVEY.md §2.C). We mirror the two-sensitivity
model with two derived token columns.

Tokenizer v2 (round 2): Unicode — a token is a maximal run of Unicode
letter/mark/number characters; the insensitive layer is
``accent_fold(lower(text))`` (fixed translate table, config.FOLD_*).
The *identical* tokenization is expressible in Spark SQL
(``regexp_extract_all`` with Java ``\\p{L}``), DuckDB (RE2 ``\\p{L}``)
and pure Python (``unicodedata`` category runs) — rank-identical BM25
requires all three to agree. ASCII text tokenizes exactly as v1 did.

All Spark paths are JVM-side column expressions — no Python in the
hot path. The pure-Python variant exists only for the oracle
(FIXTURES.md §4).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column, functions as F

from blacklab_spark.config import (FOLD_DST, FOLD_SRC,
                                   TOKEN_RE_INSENSITIVE, TOKEN_RE_SENSITIVE)

_PY_FOLD = {ord(s): d for s, d in zip(FOLD_SRC, FOLD_DST)}
for _ch in FOLD_SRC[len(FOLD_DST):]:          # combining marks → delete
    _PY_FOLD[ord(_ch)] = None


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def fold_insensitive(text: Column | str) -> Column:
    """lower + accent-fold (JVM expr) — the @i desensitizer."""
    return F.translate(F.lower(_col(text)), FOLD_SRC, FOLD_DST)


def tokens_insensitive(text: Column | str) -> Column:
    """Insensitive token layer: fold(lower(text)) then unicode-word
    runs. (Measured note: deriving this per-token from the sensitive
    run-split — transform(lower∘translate) — is 2× SLOWER than the
    second whole-text regex pass; per-element expression eval overhead
    dominates. Keep the two-pass form.)"""
    return F.regexp_extract_all(fold_insensitive(text),
                                F.lit(TOKEN_RE_INSENSITIVE), 0)


def tokens_sensitive(text: Column | str) -> Column:
    """Sensitive token layer: original case/accents, unicode runs."""
    return F.regexp_extract_all(_col(text), F.lit(TOKEN_RE_SENSITIVE), 0)


def py_fold_insensitive(text: str) -> str:
    return text.lower().translate(_PY_FOLD)


def fold_diacritics(text: Column | str) -> Column:
    """Accent-fold WITHOUT lowercasing — the ``di`` desensitizer
    (diacritics-insensitive, case-sensitive; reference:
    indexmetadata/MatchSensitivity.java:12-17). The fold table carries
    both cases (É→E, é→e), so no lower() is needed."""
    return F.translate(_col(text), FOLD_SRC, FOLD_DST)


def py_fold_diacritics(text: str) -> str:
    # _PY_FOLD maps both cases (É→E, é→e) and never lowercases —
    # lower() is a separate step in py_fold_insensitive.
    return text.translate(_PY_FOLD)


def fold_for_layer(value: str, layer: str | None) -> str:
    """Desensitize a literal exactly as ``layer``'s stored values
    were: @i (word) lowercases + accent-folds, @ci lowercases, @di
    accent-folds, everything else (word_s, pos, lemma, None, …) is
    layer-literal. THE single definition — the optimizer's literal
    folding (plans/rewrite.py) and the constraint compiler's literal
    operands (plans/executor._compile_constraint) both use it, so a
    new sensitivity layer or a fold change lands in one place
    (r3 ADVICE #1)."""
    if layer == "word":
        return py_fold_insensitive(value)
    if layer == "word_ci":
        return value.lower()
    if layer == "word_di":
        return py_fold_diacritics(value)
    return value


def _py_runs(text: str) -> list[str]:
    """Maximal runs of Unicode L/M/N chars — the category-run
    definition of ``[\\p{L}\\p{M}\\p{N}]+`` without regex, identical
    across engines by Unicode general category."""
    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        if unicodedata.category(ch)[0] in ("L", "M", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def py_token_spans(text: str) -> list[tuple[int, int]]:
    """Character span [start, end) of each token of ``text`` under the
    frozen run definition — the content-store ↔ token-position map the
    reference keeps as character offsets in the forward index
    (integrated.md:288-352; used by DocUtil.highlightContent to insert
    ``<hl/>`` around hits). Driver-side, one document at a time."""
    spans: list[tuple[int, int]] = []
    start = -1
    for i, ch in enumerate(text):
        if unicodedata.category(ch)[0] in ("L", "M", "N"):
            if start < 0:
                start = i
        elif start >= 0:
            spans.append((start, i))
            start = -1
    if start >= 0:
        spans.append((start, len(text)))
    return spans


def py_tokens_insensitive(text: str) -> list[str]:
    """Pure-Python mirror of :func:`tokens_insensitive` (oracle only)."""
    return _py_runs(py_fold_insensitive(text)) if text else []


def py_tokens_sensitive(text: str) -> list[str]:
    return _py_runs(text) if text else []


# DuckDB SQL fragment producing the identical token array for a text
# expression — used when composing oracle SQL. The fold table chars
# are embedded as plain string literals (no quotes occur in them).
DUCKDB_TOKENS_I = ("regexp_extract_all(translate(lower({col}), "
                   "'" + FOLD_SRC + "', '" + FOLD_DST + "'), "
                   "'[\\p{{L}}\\p{{M}}\\p{{N}}]+')")


def duckdb_tokens_i(col: str) -> str:
    return DUCKDB_TOKENS_I.format(col=col)


def duckdb_tokens_ci(col: str) -> str:
    """DuckDB mirror of the ci layer: sensitive tokenization, then
    lower each token (= Spark transform(tokens_s, lower))."""
    return ("list_transform(regexp_extract_all(" + col +
            ", '[\\p{L}\\p{M}\\p{N}]+'), t -> lower(t))")
