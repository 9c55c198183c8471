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

from blacklab_spark.plans.guarantees import _add, _mul, guarantees
from blacklab_spark.plans.query import (And, AnyToken, CAnnot, Capture,
                                        CBool, CCmp, Constrained, CrossField,
                                        CStr, Expand, Force, Fuzzy,
                                        LenFilter, NoHits, Not, Or,
                                        Overlap,
                                        Pattern, PosFilter, RCapture, Regex,
                                        RelBranch, RelFunc, RelMatch,
                                        RelMulti, RMatch, Rep, RField,
                                        RootRel, RSpan, Seq, Term, Turn)

_META = re.compile(r"[.*+?^$|\\(){}\[\]]")


def _fold_for_layer(value: str, layer: str) -> str:
    """Desensitize a literal exactly as the layer's stored values were
    — delegates to the single shared definition
    (tokenizer.fold_for_layer, also used by the constraint
    compiler's literal operands)."""
    from blacklab_spark.tokenizer import fold_for_layer
    return fold_for_layer(value, layer)


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
    if isinstance(p, LenFilter):
        return LenFilter(fn(p.clause), p.min_len, p.max_len)
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


def _fold_constrained(p: Constrained) -> Pattern:
    """Constant-propagation through captures (the analog of the
    reference's clause-combining optimizations, query rewriting.md):
    a top-level ``=`` conjunct whose one side is (a) a string literal
    or (b) an annotation of a capture over a single fixed TERM, and
    whose other side is an annotation of a capture over ``[]``, pins
    that ``[]`` to a constant — the ``[]`` leaf becomes a TERM leaf
    and the conjunct disappears. ``A:"the" B:[] :: A.word = B.word``
    thereby becomes the postings phrase ``A:"the" B:"the"`` with no
    forward-index join at all. Only ``=`` folds (``!=`` would
    materialize a token complement, costlier than the FI join); only
    single-occurrence captures reachable through Seq/Capture nesting
    are eligible (a capture under OR/REP does not bind on every
    match)."""
    from blacklab_spark.annotations import (ANNOTATION_COLUMNS,
                                            MULTI_VALUE_LAYERS)
    caps: dict[str, Pattern] = {}
    dup: set[str] = set()

    def walk(q):
        """Eligible bindings: captures reachable through pure
        Seq/Capture nesting (bind exactly once per match)."""
        if isinstance(q, Capture):
            if q.name in caps:
                dup.add(q.name)
            else:
                caps[q.name] = q.clause
            walk(q.clause)
        elif isinstance(q, Seq):
            for c in q.clauses:
                walk(c)

    walk(p.clause)

    def walk_all(q, counts: dict):
        """EVERY capture binding anywhere (Or branches, repetitions,
        position filters, …) — a label bound outside the eligible
        Seq/Capture spine does not bind once-per-match and must not
        fold (round-3 review: a Rep-nested rebinding was invisible)."""
        if isinstance(q, Capture):
            counts[q.name] = counts.get(q.name, 0) + 1
        for c in getattr(q, "clauses", ()):
            walk_all(c, counts)
        for br in getattr(q, "branches", ()):   # RelBranch children
            walk_all(br.target, counts)
        for attr in ("clause", "producer", "filter", "a", "b",
                     "source", "target"):
            v = getattr(q, attr, None)
            if isinstance(v, Pattern):
                walk_all(v, counts)

    all_counts: dict[str, int] = {}
    walk_all(p.clause, all_counts)
    for name, n in all_counts.items():
        if n > (1 if name in caps else 0):
            dup.add(name)

    conjs: list = []

    def split(c):
        if isinstance(c, CBool) and c.op == "&":
            split(c.a)
            split(c.b)
        else:
            conjs.append(c)

    split(p.filter)

    def _single_col(annot: str) -> str | None:
        if annot in ANNOTATION_COLUMNS and annot not in MULTI_VALUE_LAYERS:
            return ANNOTATION_COLUMNS[annot]
        return None

    replaced: dict[str, Pattern] = {}
    remaining: list = []
    for c in conjs:
        folded = False
        if isinstance(c, CCmp) and c.op == "=":
            for lhs, rhs in ((c.lhs, c.rhs), (c.rhs, c.lhs)):
                if not (isinstance(rhs, CAnnot) and rhs.label in caps
                        and rhs.label not in dup
                        and rhs.label not in replaced
                        and _single_col(rhs.annot) is not None):
                    continue
                tgt = caps[rhs.label]
                if not (isinstance(tgt, AnyToken) and tgt.min_len == 1
                        and tgt.max_len == 1):
                    continue
                if isinstance(lhs, CStr):
                    # literal desensitizes per the annot layer (the
                    # same fold _compile_constraint.lit applies — the
                    # @i dictionary/postings are folded, so the TERM
                    # leaf must carry the folded form)
                    text = _fold_for_layer(lhs.value, rhs.annot)
                elif (isinstance(lhs, CAnnot) and lhs.label in caps
                      and lhs.label not in dup
                      and lhs.label not in replaced
                      and lhs.annot == rhs.annot):
                    tc = caps[lhs.label]
                    col = _single_col(lhs.annot)
                    if not (isinstance(tc, Term) and col is not None
                            and ANNOTATION_COLUMNS[tc.layer] == col):
                        continue
                    text = tc.text
                else:
                    continue
                replaced[rhs.label] = Term(text, layer=rhs.annot)
                folded = True
                break
        if not folded:
            remaining.append(c)
    if not replaced:
        return p

    def rep(q):
        if isinstance(q, Capture):
            if q.name in replaced:
                return Capture(replaced[q.name], q.name)
            return Capture(rep(q.clause), q.name)
        if isinstance(q, Seq):
            return Seq(*[rep(c) for c in q.clauses])
        return q

    new_clause = rep(p.clause)
    if not remaining:
        return new_clause
    filt = remaining[0]
    for c in remaining[1:]:
        filt = CBool("&", filt, c)
    return Constrained(new_clause, filt)


def _matches_empty(p: Pattern) -> bool:
    """Can ``p`` match the empty token sequence? (TextPattern
    matchesEmptySequence() in the reference — every composite that can
    contribute zero tokens must be lifted out of sequences by
    EmptyClauseAlts before physical planning.)"""
    if isinstance(p, Rep):
        return p.min_rep == 0 or _matches_empty(p.clause)
    if isinstance(p, AnyToken):
        return p.min_len == 0
    if isinstance(p, LenFilter):
        return p.min_len == 0 and _matches_empty(p.clause)
    if isinstance(p, Or):
        return any(_matches_empty(c) for c in p.clauses)
    if isinstance(p, Seq):
        return all(_matches_empty(c) for c in p.clauses)
    if isinstance(p, Capture):
        return _matches_empty(p.clause)
    return False


def _nonempty(p: Pattern) -> Pattern:
    """The variant of ``p`` that matches everything ``p`` matches
    EXCEPT the empty sequence (noEmpty() in the reference's
    TextPattern rewrites). Only called on empty-matchable patterns;
    identity otherwise. A pattern that matches ONLY the empty
    sequence (``A{0,0}``, ``[]{0,0}``) has no non-empty variant —
    NoHits — which the simplification rules then collapse."""
    if not _matches_empty(p):
        return p
    if isinstance(p, Rep):
        if p.max_rep == 0:
            return NoHits()      # A{0,0} matches only the empty seq
        # repetitions of an empty match contribute nothing, so the
        # non-empty variant always needs just one non-empty turn:
        # (a?){2,5} ≡ ε | a{1,5}
        inner = _nonempty(p.clause)
        if isinstance(inner, NoHits):
            return NoHits()
        return Rep(inner, 1, p.max_rep)
    if isinstance(p, AnyToken):
        if p.max_len == 0:
            return NoHits()
        return AnyToken(1, p.max_len)
    if isinstance(p, LenFilter):
        # raising the bound to ≥1 excludes the empty match, so the
        # clause itself can (and must, for executability) go nonempty
        inner = _nonempty(p.clause)
        if isinstance(inner, NoHits):
            return NoHits()
        return LenFilter(inner, max(1, p.min_len), p.max_len)
    if isinstance(p, Or):
        branches = [_nonempty(c) for c in p.clauses]
        kept = [b for b in branches if not isinstance(b, NoHits)]
        if not kept:
            return NoHits()
        return kept[0] if len(kept) == 1 else Or(*kept)
    if isinstance(p, Capture):
        inner = _nonempty(p.clause)
        if isinstance(inner, NoHits):
            return NoHits()
        return Capture(inner, p.name)
    if isinstance(p, Seq):
        # nonempty(A·R) = nonempty(A)·R ∪ nonempty(R)  (A,R both
        # empty-matchable here, else the Seq itself would not be)
        a, rest = p.clauses[0], p.clauses[1:]
        if not rest:
            return _nonempty(a)
        r = Seq(*rest)
        a_ne, r_ne = _nonempty(a), _nonempty(r)
        left = None if isinstance(a_ne, NoHits) else Seq(a_ne, r)
        if left is None and isinstance(r_ne, NoHits):
            return NoHits()
        if left is None:
            return r_ne
        if isinstance(r_ne, NoHits):
            return left
        return Or(left, r_ne)
    return p


def _ccnot_neighbour_ok(b: Pattern) -> bool:
    """CCNot eligibility of the Not's neighbour: the rewrite reports
    the neighbour through an expansion + position semi-join, which
    preserves multiplicity instead of the sequence join's dedup — so
    it must be PROVABLY duplicate-free (SpanGuarantees; a by-exactly-1
    expansion is injective, so the neighbour's uniqueness is the
    output's). Captures are fine: both the expansion and the position
    join carry match_info through."""
    return guarantees(b).unique


def _rewrite_once(p: Pattern) -> Pattern:
    p = _map_children(p, _rewrite_once)

    # NoHits collapse (SpanQueryNoHits absorption): a no-match child
    # annihilates conjunctive parents, disappears from alternations,
    # and inverts under NOT (complement of nothing = every token).
    if isinstance(p, Seq) and any(isinstance(c, NoHits)
                                  for c in p.clauses):
        return NoHits()
    if isinstance(p, Or):
        kept = [c for c in p.clauses if not isinstance(c, NoHits)]
        if len(kept) < len(p.clauses):
            if not kept:
                return NoHits()
            return kept[0] if len(kept) == 1 else Or(*kept)
    if isinstance(p, And) and any(isinstance(c, NoHits)
                                  for c in p.clauses):
        return NoHits()
    if isinstance(p, Not) and isinstance(p.clause, NoHits):
        return AnyToken(1, 1)
    if isinstance(p, Rep) and isinstance(p.clause, NoHits) \
            and p.min_rep >= 1:
        return NoHits()
    if isinstance(p, (Expand, Capture, Constrained, LenFilter)) \
            and isinstance(p.clause, NoHits):
        return NoHits()
    if isinstance(p, Overlap) and (isinstance(p.a, NoHits)
                                   or isinstance(p.b, NoHits)):
        return NoHits()
    if isinstance(p, PosFilter):
        if isinstance(p.producer, NoHits):
            return NoHits()
        if isinstance(p.filter, NoHits):
            # nothing to relate to: inverted filters keep everything,
            # plain ones keep nothing
            return p.producer if p.invert else NoHits()

    # SimplestMatcher: REGEX with no metachars → TERM (query
    # rewriting.md: "REGEX(appel) → TERM(appel)") — keeping the
    # annotation layer, with the literal folded exactly as that
    # layer's stored values (non-word layers are layer-literal; the
    # old unconditional .lower() corrupted pos/word_s values and
    # skipped the @i accent fold)
    if isinstance(p, Regex) and not _META.search(p.pattern):
        return Term(_fold_for_layer(p.pattern, p.layer), p.layer)

    # TrivialRep: A{1,1} → A ; REP(ANY) merge: []{a,b}{c,d} → []{ac,bd}
    if isinstance(p, Rep):
        if p.min_rep == 1 and p.max_rep == 1:
            return p.clause
        # (A{a,b}){c,d} → A{a·c, b·d} is only sound when the per-count
        # length ranges [a·k, b·k] for k = c..d tile with no holes:
        # a·(k+1) ≤ b·k + 1 for every k in [c, d). The gap a(k+1)−bk
        # is non-increasing in k (a ≤ b), so the smallest k binds.
        # Counterexample the merge must NOT fire on: (A{2,}){0,1} —
        # lengths {0} ∪ {2,3,…}, whereas A{0,} also admits 1.
        # Non-mergeable nestings stay nested; the executor evaluates
        # Rep over the inner pattern's hit relation directly.
        def _contiguous(a: int, b: int | None) -> bool:
            if p.max_rep == p.min_rep:      # single k: one range
                return True
            if b is None:                    # inner unbounded: only the
                return p.min_rep >= 1 or a <= 1   # k=0→1 step can gap
            return a * (p.min_rep + 1) <= b * p.min_rep + 1
        if isinstance(p.clause, AnyToken):
            if _contiguous(p.clause.min_len, p.clause.max_len):
                return AnyToken(p.clause.min_len * p.min_rep,
                                _mul(p.clause.max_len, p.max_rep))
        elif isinstance(p.clause, Rep):
            if _contiguous(p.clause.min_rep, p.clause.max_rep):
                return Rep(p.clause.clause, p.clause.min_rep * p.min_rep,
                           _mul(p.clause.max_rep, p.max_rep))

    # Flatten + Trivial Seq/Or/And
    if isinstance(p, Seq):
        flat: list[Pattern] = []
        for c in p.clauses:
            flat.extend(c.clauses if isinstance(c, Seq) else [c])
        # CCAnyCombine: adjacent []{a,b} []{c,d} → []{a+c,b+d}
        # CCRepetition (query rewriting.md): adjacent identical simple
        # leaves (or repetitions of one) combine — A A → A{2},
        # A{a,b} A{c,d} → A{a+c,b+d} (integer count intervals sum to
        # an interval, so the merge is always exact). Simple leaves
        # only: captures must keep their own spans.
        def _rep_parts(c: Pattern) -> tuple | None:
            if isinstance(c, (Term, Regex, Fuzzy)):
                return c, 1, 1
            if isinstance(c, Rep) and \
                    isinstance(c.clause, (Term, Regex, Fuzzy)):
                return c.clause, c.min_rep, c.max_rep
            return None
        merged: list[Pattern] = []
        for c in flat:
            if (merged and isinstance(c, AnyToken)
                    and isinstance(merged[-1], AnyToken)):
                prev = merged.pop()
                merged.append(AnyToken(prev.min_len + c.min_len,
                                       _add(prev.max_len, c.max_len)))
                continue
            rc, rp = _rep_parts(c), (_rep_parts(merged[-1])
                                     if merged else None)
            if rc is not None and rp is not None and rc[0] == rp[0]:
                merged.pop()
                merged.append(Rep(rc[0], rp[1] + rc[1],
                                  _add(rp[2], rc[2])))
            else:
                merged.append(c)
        # EmptyClauseAlts (correctness-critical, SURVEY §4.1 / §7 hard
        # part 2): a possibly-empty clause inside a sequence becomes an
        # OR of with/without variants: A B{0,n} C → (A C) | (A B{1,n} C).
        # Runs BEFORE CCAnyExpansion (which would otherwise bury a
        # possibly-empty Rep inside an Expand where it can no longer be
        # lifted) and recognizes ANY empty-matchable clause — Rep{0,},
        # Or with an optional branch, nested Seq/Capture — not just
        # direct Rep children. AnyToken children are exempt: []{0,n}
        # neighbours are handled natively (and more cheaply) by the
        # expansion rewrite below.
        if len(merged) > 1:
            for i, c in enumerate(merged):
                if isinstance(c, AnyToken) or not _matches_empty(c):
                    continue
                without = [x for j, x in enumerate(merged) if j != i]
                with_ = list(merged)
                with_[i] = _nonempty(c)
                left = without[0] if len(without) == 1 else Seq(*without)
                return Or(left, Seq(*with_))
        # CCAnyExpansion: A []{m,n} → EXPAND(A, right, m, n);
        # []{m,n} A → EXPAND(A, left, m, n)
        # CCNot (query rewriting.md): a token-complement clause next
        # to a real neighbour never materializes — ``!A B`` becomes
        # NOTCONTAINING_AT_START(EXPAND(B, left, 1), A) and ``B !A``
        # becomes NOTCONTAINING_AT_END(EXPAND(B, right, 1), A): the
        # neighbour's hits stretch one token toward the complement and
        # an anti position-join against A's (small) hit set replaces
        # the corpus-wide token-complement explode.
        _not1_memo: dict[int, bool] = {}

        def _not1(c: Pattern) -> bool:
            # guarantees() recurses over the clause subtree; memoize
            # per node so the adjacency loop below stays linear in
            # clause count (r4 VERDICT #6)
            if not isinstance(c, Not):
                return False
            r = _not1_memo.get(id(c))
            if r is None:
                g = guarantees(c.clause)
                r = bool(g.fixed_width and g.len_min == 1)
                _not1_memo[id(c)] = r
            return r
        out: list[Pattern] = []
        for c in merged:
            if (out and _not1(c)
                    and not isinstance(out[-1], (AnyToken, Not))
                    and _ccnot_neighbour_ok(out[-1])):
                out.append(PosFilter(Expand(out.pop(), "right", 1, 1),
                                     c.clause, "containing_at_end",
                                     invert=True))
            elif (out and _not1(out[-1])
                    and not isinstance(c, (AnyToken, Not))
                    and _ccnot_neighbour_ok(c)):
                na = out.pop()
                out.append(PosFilter(Expand(c, "left", 1, 1),
                                     na.clause, "containing_at_start",
                                     invert=True))
            elif (out and isinstance(c, AnyToken)
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
        # NGramsToLengthFilter (query rewriting.md):
        # AND(A, []{m,n}) → LENFILTER(AND(A), m, n). An all-token
        # clause in a same-span AND constrains ONLY the hit width, so
        # it must never materialize the n-gram relation; when the
        # remaining clauses' width bounds (SpanGuarantees) already
        # fall inside [m, n] the filter disappears entirely
        # (RedundantNGrams).
        non_any = [c for c in flat if not isinstance(c, AnyToken)]
        anys = [c for c in flat if isinstance(c, AnyToken)]
        if non_any and anys:
            m = max(a.min_len for a in anys)
            n: int | None = None
            for a in anys:
                if a.max_len is not None:
                    n = a.max_len if n is None else min(n, a.max_len)
            rest = non_any[0] if len(non_any) == 1 else And(*non_any)
            g = guarantees(rest)
            if m <= g.len_min and (
                    n is None
                    or (g.len_max is not None and g.len_max <= n)):
                return rest          # bounds subsume: filter is free
            if m >= 1 and _matches_empty(rest):
                # width ≥ 1 excludes the empty match anyway, and the
                # executor cannot run a possibly-empty pattern outside
                # a sequence (no EmptyClauseAlts lift applies here) —
                # LENFILTER(A, ≥1) ≡ LENFILTER(nonempty(A), ≥1)
                rest = _nonempty(rest)
            return LenFilter(rest, m, n)
        if len(flat) == 1:
            return flat[0]
        if flat != list(p.clauses):
            return And(*flat)

    # constraint constant-folding: Constrained → phrase when conjuncts
    # pin [] captures to constants
    if isinstance(p, Constrained):
        q = _fold_constrained(p)
        if q is not p:
            return q

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


def rewrite(p: Pattern, max_iters: int = 30) -> Pattern:
    """Apply rules to fixpoint."""
    for _ in range(max_iters):
        q = _rewrite_once(p)
        if q == p:
            return q
        p = q
    return p
