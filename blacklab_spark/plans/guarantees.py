"""SpanGuarantees — static result properties per query-AST node.

The reference attaches a property lattice to every BLSpanQuery
(engine/src/main/java/nl/inl/blacklab/search/lucene/SpanGuarantees.java:16-233;
doc/technical/blacklab-internals.md:113-122): hitsAllSameLength,
hitsHaveUniqueStartEnd, hitsLengthMin/Max, … — and uses it to pick
fast physical variants (SpansSequenceSimple vs WithGap, SpansAndSimple
vs SpansAnd) and to know when a SpansUnique dedup or a per-document
re-sort must be inserted (SpanQuerySequence.java:641-730).

Catalyst has no span semantics, so the same lattice lives here as
custom pre-planning (SURVEY.md §4.2): :func:`guarantees` computes, for
the frame ``plans/executor._exec`` would produce for a node,

* ``len_min`` / ``len_max`` — bounds on hit width ``end - start``
  (``len_max=None`` = unbounded), the reference's hitsLengthMin/Max;
* ``unique`` — whether the frame is provably free of duplicate
  ``(doc_id, start, end)`` rows (hitsHaveUniqueStartEnd).

The executor uses it to ELIDE ``dropDuplicates`` shuffles: a
same-span AND of unique inputs needs no per-input dedup, a sequence
join of unique inputs where either side is fixed-width produces
unique output by construction, and a repetition over a unique clause
needs no base dedup. Every elision removes one full exchange +
aggregate over the operator's input or output — the dominant cost of
the generic span-join path at corpus scale.

Soundness note: ``unique=True`` claims are proofs, not heuristics —
each rule's justification is in its comment, and the randomized
differential harness (tests/test_property_cql.py) asserts observed
duplicate-freedom and width bounds for every generated pattern.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from blacklab_spark.plans import query as Q


@dataclass(frozen=True)
class SpanGuarantees:
    len_min: int
    len_max: int | None          # None = unbounded
    unique: bool                 # no duplicate (doc_id, start, end) rows

    @property
    def fixed_width(self) -> bool:
        """hitsAllSameLength: every hit has width len_min == len_max."""
        return self.len_max is not None and self.len_min == self.len_max


#: conservative bottom element: nothing known.
ANY = SpanGuarantees(0, None, False)


def _add(a: int | None, b: int | None) -> int | None:
    return None if a is None or b is None else a + b


def _mul(a: int | None, b: int | None) -> int | None:
    return None if a is None or b is None else a * b


def _min_none_inf(a: int | None, b: int | None) -> int | None:
    """min where None means +inf."""
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def guarantees(p: Q.Pattern) -> SpanGuarantees:
    """Memoized: rewrite rules query the same subtree repeatedly
    (the CCNot adjacency scan alone called this once per neighbour
    pair per pass — quadratic in clause count, r3 ADVICE #3), and
    Patterns are frozen/hashable, so one LRU entry per distinct
    subtree makes every repeat O(1). Unhashable shapes (none today)
    just compute uncached."""
    try:
        return _guarantees_cached(p)
    except TypeError:
        return _guarantees(p)


@lru_cache(maxsize=8192)
def _guarantees_cached(p: Q.Pattern) -> SpanGuarantees:
    return _guarantees(p)


def _guarantees(p: Q.Pattern) -> SpanGuarantees:
    """Static guarantees for the hits frame ``_exec`` produces for
    ``p``.  Sound under every physical strategy the executor may pick:
    all leaf paths (postings block decode, forward-index posexplode
    probe, dictionary-expansion probe) emit one row per matching
    corpus position, and a single-value annotation position matches a
    term set at most once — so every leaf is duplicate-free."""
    if isinstance(p, Q.NoHits):
        # the empty set satisfies every width claim
        return SpanGuarantees(0, 0, True)
    if isinstance(p, (Q.Term, Q.Regex, Q.Fuzzy)):
        return SpanGuarantees(1, 1, True)
    if isinstance(p, Q.Not):
        # token complement: single-token positions, one row each
        return SpanGuarantees(1, 1, True)
    if isinstance(p, Q.AnyToken):
        # one row per (doc, start, width) by construction
        return SpanGuarantees(p.min_len, p.max_len, True)
    if isinstance(p, Q.Turn):
        return SpanGuarantees(0, None, True)   # one span per doc
    if isinstance(p, Q.Tag):
        # stored spans may repeat (identical nested extents); edges
        # inherit that
        if p.adjust in ("lead", "trail"):
            return SpanGuarantees(0, 0, False)
        return SpanGuarantees(0, None, False)
    if isinstance(p, Q.Seq):
        gs = [guarantees(c) for c in p.clauses]
        lo = 0
        hi: int | None = 0
        for g in gs:
            lo += g.len_min
            hi = _add(hi, g.len_max)
        # Adjacency-join fold: a pair of unique inputs is unique when
        # either side is fixed-width (the output (start, end) then
        # pins both operands — SpansSequenceSimple's condition).
        # Folding left, the accumulated prefix stays fixed-width until
        # the first variable-width clause, so ≤1 variable-width clause
        # keeps every fold step unique.
        variable = sum(1 for g in gs if not g.fixed_width)
        return SpanGuarantees(
            lo, hi, all(g.unique for g in gs) and variable <= 1)
    if isinstance(p, Q.Or):
        gs = [guarantees(c) for c in p.clauses]
        return SpanGuarantees(
            min(g.len_min for g in gs),
            None if any(g.len_max is None for g in gs)
            else max(g.len_max for g in gs),
            False)   # clauses may overlap; union keeps duplicates
    if isinstance(p, Q.And):
        # Same-span intersection: output ⊆ each POSITIVE clause's
        # deduped set. Negated clauses execute as an exact-span
        # anti-join (AND(A,!C) → ANDNOT): they can only REMOVE rows,
        # never bound the output width — intersecting a Not's width-1
        # bound would wrongly shrink the interval (a width-2 span is
        # simply never equal to a width-1 complement hit).
        pos = [c for c in p.clauses if not isinstance(c, Q.Not)]
        gs = [guarantees(c) for c in (pos or p.clauses)]
        hi: int | None = None
        for g in gs:
            hi = _min_none_inf(hi, g.len_max)
        return SpanGuarantees(
            max(g.len_min for g in gs), hi,
            True)    # and_ dedups inputs; join on the full hit key
    if isinstance(p, Q.Rep):
        g = guarantees(p.clause)
        hi = None if p.max_rep is None else _mul(g.len_max, p.max_rep)
        # every repetition path ends duplicate-free: the fixed-width
        # chain enumeration generates each (chain, i, j) once; the
        # variable-width paths dedup their output
        return SpanGuarantees(g.len_min * p.min_rep, hi, True)
    if isinstance(p, Q.Expand):
        g = guarantees(p.clause)
        # unique when the operand row is pinned by an output span:
        # a FIXED amount (min==max) is an injective shift for any
        # clause; a variable amount is pinned only by a fixed-width
        # clause (then amount = output width − clause width)
        fixed_amount = p.max_exp is not None and p.min_exp == p.max_exp
        return SpanGuarantees(
            g.len_min + p.min_exp, _add(g.len_max, p.max_exp),
            g.unique and (fixed_amount or g.fixed_width))
    if isinstance(p, Q.PosFilter):
        # semi/anti join: keeps a subset of producer rows, multiplicity
        # untouched
        return guarantees(p.producer)
    if isinstance(p, Q.LenFilter):
        # row filter: bounds tighten, uniqueness preserved
        g = guarantees(p.clause)
        return SpanGuarantees(max(g.len_min, p.min_len),
                              _min_none_inf(g.len_max, p.max_len),
                              g.unique)
    if isinstance(p, Q.Overlap):
        ga, gb = guarantees(p.a), guarantees(p.b)
        # overlap regions are ≥1 token ONLY when both operands are —
        # a width-0 operand hit (tag edge) strictly inside the other
        # operand emits a width-0 overlap region; output is dedup'd
        lo = 1 if ga.len_min >= 1 and gb.len_min >= 1 else 0
        return SpanGuarantees(
            lo, _min_none_inf(ga.len_max, gb.len_max), True)
    if isinstance(p, (Q.Capture, Q.Force)):
        return guarantees(p.clause)
    if isinstance(p, Q.Constrained):
        # row filter over the clause's hits
        return guarantees(p.clause)
    # relation / parallel-field operators: conservative bottom (their
    # own dedups make most of them unique in practice, but nothing
    # downstream currently needs the proof)
    return ANY
