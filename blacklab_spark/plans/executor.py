"""Pattern AST → hits DataFrame, via the span-algebra operators.

The translate step of the reference lifecycle (TextPattern.toQuery →
BLSpanQuery → BLSpans, SURVEY.md §3.1 steps 4-7), except the physical
side is a Catalyst plan: each AST node maps to one operators.spans
function, and Catalyst then handles join strategy, pushdown and AQE.

``find()`` = parse → rewrite → execute; ``explain()`` returns the
original and rewritten pattern plus the op mapping (≙
BlackLabIndex.explain → QueryExplanation,
engine/src/main/java/nl/inl/blacklab/search/BlackLabIndex.java:230).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from blacklab_spark.index import InvertedIndex
from blacklab_spark.operators import spans as S
from blacklab_spark.plans import query as Q
from blacklab_spark.plans.parser import parse
from blacklab_spark.plans.rewrite import rewrite


def _exec(index: InvertedIndex, p: Q.Pattern) -> DataFrame:
    if isinstance(p, Q.Term):
        return S.term(index, p.text)
    if isinstance(p, Q.Regex):
        return S.regex_terms(index, p.pattern)
    if isinstance(p, Q.AnyToken):
        return S.any_token(index, p.min_len, p.max_len)
    if isinstance(p, Q.Turn):
        return (index.doc_meta
                .select("doc_id", F.lit(0).cast("int").alias("start"),
                        F.col("n_tokens").cast("int").alias("end")))
    if isinstance(p, Q.Seq):
        if any(_has_capture(c) for c in p.clauses):
            out = S.capture_noop(_exec(index, p.clauses[0]))
            for c in p.clauses[1:]:
                out = S.sequence_keep_info(out, _exec(index, c))
            return out
        out = _exec(index, p.clauses[0])
        for c in p.clauses[1:]:
            out = S.sequence(out, _exec(index, c))
        return out
    if isinstance(p, Q.Or):
        return S.or_(*[_exec(index, c) for c in p.clauses])
    if isinstance(p, Q.And):
        return S.and_(*[_exec(index, c) for c in p.clauses])
    if isinstance(p, Q.Not):
        return S.not_(index, _exec(index, p.clause))
    if isinstance(p, Q.Rep):
        if p.min_rep == 0:
            raise ValueError(
                "possibly-empty pattern at top level is not supported "
                "(inside a sequence it is rewritten to alternatives)")
        return S.repetition(_exec(index, p.clause), p.min_rep, p.max_rep)
    if isinstance(p, Q.Expand):
        return S.expand(index, _exec(index, p.clause), p.direction,
                        p.min_exp, p.max_exp)
    if isinstance(p, Q.PosFilter):
        prod = _exec(index, p.producer)
        filt = _exec(index, p.filter)
        if p.operation == "within":
            return S.within(prod, filt, p.invert)
        return S.containing(prod, filt, p.invert)
    if isinstance(p, Q.Capture):
        return S.capture(_exec(index, p.clause), p.name)
    raise ValueError(f"unsupported pattern node: {p!r}")


def _has_capture(p: Q.Pattern) -> bool:
    if isinstance(p, Q.Capture):
        return True
    for attr in ("clauses",):
        if hasattr(p, attr):
            return any(_has_capture(c) for c in getattr(p, attr))
    if hasattr(p, "clause"):
        return _has_capture(p.clause)
    return False


def find(index: InvertedIndex, cql: str) -> DataFrame:
    """CQL-lite string → hits DataFrame (doc_id, start, end[, match_info])."""
    ast = rewrite(parse(cql))
    return _exec(index, ast)


def explain(cql: str) -> str:
    original = parse(cql)
    rewritten = rewrite(original)
    return (f"original : {Q.pattern_str(original)}\n"
            f"rewritten: {Q.pattern_str(rewritten)}")
