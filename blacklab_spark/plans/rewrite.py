"""Logical rewrite rules over the Pattern AST.

The reference's rule catalog (doc/technical/query rewriting.md:30-64,
SURVEY.md §4.1) for the supported subset. The single most important
class is any-token elimination (CCAnyExpansion / CCAnyCombine /
NGramsToLengthFilter): a materialized ``[]`` relation is a full-corpus
explode, so every rule that turns ``[]{m,n}`` neighbours into
Expansion — or drops them — removes a corpus-sized scan from the plan.

Rules run to fixpoint (the reference iterates inside
SpanQuerySequence.java:303-360; we iterate the whole tree).
"""

from __future__ import annotations

import re

from blacklab_spark.plans.query import (And, AnyToken, Capture, Constrained,
                                        CrossField, Expand, Force, Not, Or,
                                        Overlap,
                                        Pattern, PosFilter, RCapture, Regex,
                                        RelBranch, RelFunc, RelMatch,
                                        RelMulti, RMatch, Rep, RField,
                                        RootRel, RSpan, Seq, Term, Turn)

_META = re.compile(r"[.*+?^$|\\(){}\[\]]")


def _mul(a: int | None, b: int | None) -> int | None:
    """Bound arithmetic where None = unbounded."""
    return None if a is None or b is None else a * b


def _add(a: int | None, b: int | None) -> int | None:
    return None if a is None or b is None else a + b


def _map_children(p: Pattern, fn) -> Pattern:
    if isinstance(p, Seq):
        return Seq(*[fn(c) for c in p.clauses])
    if isinstance(p, Or):
        return Or(*[fn(c) for c in p.clauses])
    if isinstance(p, And):
        return And(*[fn(c) for c in p.clauses])
    if isinstance(p, Not):
        return Not(fn(p.clause))
    if isinstance(p, Rep):
        return Rep(fn(p.clause), p.min_rep, p.max_rep)
    if isinstance(p, Expand):
        return Expand(fn(p.clause), p.direction, p.min_exp, p.max_exp)
    if isinstance(p, PosFilter):
        return PosFilter(fn(p.producer), fn(p.filter), p.operation, p.invert)
    if isinstance(p, Capture):
        return Capture(fn(p.clause), p.name)
    if isinstance(p, Constrained):
        return Constrained(fn(p.clause), p.filter)
    if isinstance(p, RelMatch):
        return RelMatch(fn(p.source), p.rel_type, fn(p.target), p.negate,
                        p.label)
    if isinstance(p, RelMulti):
        return RelMulti(fn(p.source), tuple(
            RelBranch(b.rel_type, fn(b.target), b.negate, b.label)
            for b in p.branches))
    if isinstance(p, RMatch):
        return RMatch(tuple(fn(c) for c in p.clauses))
    if isinstance(p, Overlap):
        return Overlap(fn(p.a), fn(p.b))
    if isinstance(p, RelFunc):
        return RelFunc(p.rel_type,
                       fn(p.target) if p.target is not None else None,
                       p.span_mode, p.direction)
    if isinstance(p, RSpan):
        return RSpan(fn(p.clause), p.span_mode)
    if isinstance(p, RField):
        return RField(fn(p.clause), p.field)
    if isinstance(p, RCapture):
        return RCapture(fn(p.clause), p.capture_as, p.rel_type,
                        p.within)
    if isinstance(p, Force):
        if p.strategy == "ident":
            # _ident is a pure pass-through — rewrite it away
            return fn(p.clause)
        # rewrite leaves INSIDE the forced sequence (regex→term etc.)
        # but keep the barrier: the any-token/flattening rules must
        # not dissolve the sequence whose strategy is being pinned
        if isinstance(p.clause, Seq):
            return Force(Seq(*[fn(c) for c in p.clause.clauses]),
                         p.strategy)
        return Force(fn(p.clause), p.strategy)
    if isinstance(p, RootRel):
        return RootRel(p.rel_type, fn(p.target), p.label)
    if isinstance(p, CrossField):
        # rewrite the source only: the target leaf is interpreted
        # against field b (an any-token elimination or regex→term
        # rewrite is still valid there, but expansions are not)
        return CrossField(fn(p.source), p.target, p.rel_type,
                          p.target_version, p.optional)
    return p


def _rewrite_once(p: Pattern) -> Pattern:
    p = _map_children(p, _rewrite_once)

    # SimplestMatcher: REGEX with no metachars → TERM (query
    # rewriting.md: "REGEX(appel) → TERM(appel)")
    if isinstance(p, Regex) and not _META.search(p.pattern):
        return Term(p.pattern.lower())

    # TrivialRep: A{1,1} → A ; REP(ANY) merge: []{a,b}{c,d} → []{ac,bd}
    if isinstance(p, Rep):
        if p.min_rep == 1 and p.max_rep == 1:
            return p.clause
        if isinstance(p.clause, AnyToken):
            return AnyToken(p.clause.min_len * p.min_rep,
                            _mul(p.clause.max_len, p.max_rep))
        # nested repetition: (A{a,b}){c,d} → A{a·c, b·d} (consecutive)
        if isinstance(p.clause, Rep):
            return Rep(p.clause.clause, p.clause.min_rep * p.min_rep,
                       _mul(p.clause.max_rep, p.max_rep))

    # Flatten + Trivial Seq/Or/And
    if isinstance(p, Seq):
        flat: list[Pattern] = []
        for c in p.clauses:
            flat.extend(c.clauses if isinstance(c, Seq) else [c])
        # CCAnyCombine: adjacent []{a,b} []{c,d} → []{a+c,b+d}
        merged: list[Pattern] = []
        for c in flat:
            if (merged and isinstance(c, AnyToken)
                    and isinstance(merged[-1], AnyToken)):
                prev = merged.pop()
                merged.append(AnyToken(prev.min_len + c.min_len,
                                       _add(prev.max_len, c.max_len)))
            else:
                merged.append(c)
        # CCAnyExpansion: A []{m,n} → EXPAND(A, right, m, n);
        # []{m,n} A → EXPAND(A, left, m, n)
        out: list[Pattern] = []
        for c in merged:
            if (out and isinstance(c, AnyToken)
                    and not isinstance(out[-1], AnyToken)):
                out.append(Expand(out.pop(), "right", c.min_len, c.max_len))
            elif (out and isinstance(out[-1], AnyToken)
                  and not isinstance(c, AnyToken)):
                any_t = out.pop()
                out.append(Expand(c, "left", any_t.min_len, any_t.max_len))
            else:
                out.append(c)
        if len(out) == 1:
            return out[0]
        # EmptyClauseAlts (correctness-critical, SURVEY §4.1 / §7 hard
        # part 2): a possibly-empty clause inside a sequence becomes an
        # OR of with/without variants: A B{0,n} C → (A C) | (A B{1,n} C)
        for i, c in enumerate(out):
            if isinstance(c, Rep) and c.min_rep == 0:
                without = [x for j, x in enumerate(out) if j != i]
                with_ = list(out)
                with_[i] = Rep(c.clause, 1, c.max_rep)
                left = without[0] if len(without) == 1 else Seq(*without)
                return Or(left, Seq(*with_))
        if out != list(p.clauses):
            return Seq(*out)
        return p
    if isinstance(p, Or):
        flat = []
        for c in p.clauses:
            flat.extend(c.clauses if isinstance(c, Or) else [c])
        if len(flat) == 1:
            return flat[0]
        if flat != list(p.clauses):
            return Or(*flat)
    if isinstance(p, And):
        flat = []
        for c in p.clauses:
            flat.extend(c.clauses if isinstance(c, And) else [c])
        # OnlyNGrams drop: AND(A, []{m,n}) → length filter — here we
        # drop all-token clauses that match any length ≥ the others
        non_any = [c for c in flat if not isinstance(c, AnyToken)]
        if non_any and len(non_any) < len(flat):
            # keep as PosFilter 'matches' on lengths via Rep of any —
            # subset case: single-token anys just disappear
            flat = non_any
        if len(flat) == 1:
            return flat[0]
        if flat != list(p.clauses):
            return And(*flat)

    # !!A → A
    if isinstance(p, Not) and isinstance(p.clause, Not):
        return p.clause.clause

    # EXPAND with 0,0 → clause
    if isinstance(p, Expand) and p.min_exp == 0 and p.max_exp == 0:
        return p.clause

    # WITHIN(A, <turn/>) → A (turn = row; structurally free, §1.4)
    if isinstance(p, PosFilter) and isinstance(p.filter, Turn) \
            and p.operation == "within" and not p.invert:
        return p.producer

    return p


def rewrite(p: Pattern, max_iters: int = 10) -> Pattern:
    """Apply rules to fixpoint."""
    for _ in range(max_iters):
        q = _rewrite_once(p)
        if q == p:
            return q
        p = q
    return p
