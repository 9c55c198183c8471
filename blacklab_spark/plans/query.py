"""Query AST — the engine's TextPattern layer.

Mirrors the reference's TextPattern classes 1:1 for the supported
subset (reference: engine/src/main/java/nl/inl/blacklab/search/textpattern/,
SURVEY.md §2.A query-language surface); dataclasses instead of a class
hierarchy, and Spark DataFrames instead of BLSpans at execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Pattern:
    """Base of all query AST nodes."""


@dataclass(frozen=True)
class Term(Pattern):          # TextPatternTerm
    text: str
    layer: str = "word"       # annotation layer (TextPatternAnnotation)


@dataclass(frozen=True)
class Regex(Pattern):         # TextPatternRegex
    pattern: str
    layer: str = "word"


@dataclass(frozen=True)
class Fuzzy(Pattern):         # TextPatternFuzzy  "word"~edits
    """Edit-distance term expansion (reference:
    search/lucene/SpanFuzzyQuery.java:35): all dictionary terms within
    ``max_edits`` Levenshtein edits of ``text``, OR-ed."""
    text: str
    max_edits: int = 1
    layer: str = "word"


@dataclass(frozen=True)
class NoHits(Pattern):        # SpanQueryNoHits.java:20
    """Matches nothing — the rewrite product of impossible shapes
    (e.g. the non-empty variant of ``A{0,0}``); simplification rules
    collapse most parents of a NoHits child."""


@dataclass(frozen=True)
class AnyToken(Pattern):      # TextPatternAnyToken  []{min,max}
    min_len: int = 1
    max_len: int | None = 1   # None = unbounded (clamped to doc length)


@dataclass(frozen=True)
class Seq(Pattern):           # TextPatternSequence
    clauses: tuple

    def __init__(self, *clauses):
        object.__setattr__(self, "clauses", tuple(clauses))


@dataclass(frozen=True)
class Or(Pattern):            # TextPatternOr
    clauses: tuple

    def __init__(self, *clauses):
        object.__setattr__(self, "clauses", tuple(clauses))


@dataclass(frozen=True)
class And(Pattern):           # TextPatternAnd (same-span)
    clauses: tuple

    def __init__(self, *clauses):
        object.__setattr__(self, "clauses", tuple(clauses))


@dataclass(frozen=True)
class Not(Pattern):           # TextPatternNot (token complement)
    clause: Pattern


@dataclass(frozen=True)
class Rep(Pattern):           # TextPatternRepetition  A{min,max}
    clause: Pattern
    min_rep: int
    max_rep: int | None       # None = unbounded (reference MAX_UNLIMITED,
                              # cql.jj:415; executed as a fixpoint join)


@dataclass(frozen=True)
class Expand(Pattern):        # TextPatternExpansion (rewrite product)
    clause: Pattern
    direction: str            # 'left' | 'right'
    min_exp: int
    max_exp: int | None       # None = unbounded (clamped to doc bounds)


@dataclass(frozen=True)
class PosFilter(Pattern):     # TextPatternPositionFilter (within/containing)
    producer: Pattern
    filter: Pattern
    operation: str            # 'within' | 'containing' |
    # 'containing_at_start' | 'containing_at_end' (the reference's
    # SpanQueryPositionFilter.Operation enum :160-181; the *_at_*
    # forms are rewrite products of CCNot — no surface syntax)
    invert: bool = False


@dataclass(frozen=True)
class LenFilter(Pattern):     # SpanQueryFilterByHitLength.java:21
    """Keep hits whose width ∈ [min_len, max_len] — the rewrite
    product of NGramsToLengthFilter (query rewriting.md:
    ``AND(A, []{m,n}) → LENFILTER(AND(A))``). ``max_len=None`` =
    unbounded. Executes as a pure row filter, never a join."""
    clause: Pattern
    min_len: int
    max_len: int | None


@dataclass(frozen=True)
class Overlap(Pattern):       # TextPatternOverlapping  a overlap b
    """``a overlap b`` (reference TextPatternOverlapping, grammar
    cql.jj:261): emit the overlap region of each overlapping pair."""
    a: Pattern
    b: Pattern


@dataclass(frozen=True)
class Capture(Pattern):       # TextPatternCaptureGroup  name:(...)
    clause: Pattern
    name: str


# -- global-constraint (MatchFilter) AST ------------------------------
# Mirrors the reference's MatchFilter hierarchy (cql.jj:171-243):
# values (string literal / capture annotation / start|end function),
# comparisons (= != >= <= > <), boolean combinators (& | -> !). The
# whole tree compiles to ONE Catalyst expression over match_info + the
# forward-index arrays (plans/executor._compile_constraint).

@dataclass(frozen=True)
class CStr:                   # MatchFilterString  "literal"
    value: str


@dataclass(frozen=True)
class CAnnot:                 # MatchFilterTokenAnnotation  A / A.annot
    label: str
    annot: str                # default layer = "word"


@dataclass(frozen=True)
class CFunc:                  # MatchFilterFunctionCall  start(A)/end(A)
    fn: str
    label: str


@dataclass(frozen=True)
class CCmp:                   # MatchFilterEquals / MatchFilterCompare
    lhs: object
    op: str                   # = != >= <= > <
    rhs: object


@dataclass(frozen=True)
class CBool:                  # MatchFilterAnd / Or / Implication
    op: str                   # & | ->
    a: object
    b: object


@dataclass(frozen=True)
class CNot:                   # MatchFilterNot  !(...)
    v: object


def constraint_str(c) -> str:
    if isinstance(c, CStr):
        return f'"{c.value}"'
    if isinstance(c, CAnnot):
        return f"{c.label}.{c.annot}"
    if isinstance(c, CFunc):
        return f"{c.fn}({c.label})"
    if isinstance(c, CCmp):
        return (f"{constraint_str(c.lhs)} {c.op} "
                f"{constraint_str(c.rhs)}")
    if isinstance(c, CBool):
        return (f"({constraint_str(c.a)} {c.op} "
                f"{constraint_str(c.b)})")
    if isinstance(c, CNot):
        return f"!({constraint_str(c.v)})"
    return repr(c)


@dataclass(frozen=True)
class Constrained(Pattern):   # TextPatternConstrained  A:[] B:[] :: A.word = B.word
    """Global constraint over captured groups (reference:
    SpanQueryConstrained.java:25; grammar cql.jj:157 constrainedQuery;
    the MatchFilter AST compiles to one Catalyst predicate)."""
    clause: Pattern
    filter: object            # constraint AST (CCmp/CBool/CNot root)


@dataclass(frozen=True)
class RelFunc(Pattern):       # rel(type[, target[, spanMode[, direction]]])
    """Query extension function ``rel(...)`` (reference:
    XFRelations.java:54 rel — find relations matching type (+target),
    reported under a span mode; registry QueryExtensions.java:142,
    grammar cql.jj:515 queryFunctionCall). captureAs is not supported:
    relation operands ride along as columns, not named captures."""
    rel_type: str
    target: Pattern | None = None
    span_mode: str = "source"
    direction: str = "both"


@dataclass(frozen=True)
class RCapture(Pattern):      # rcapture(query[, captureAs[, type]])
    """Query extension function ``rcapture(...)``
    (XFRelations.java:170 / SpanQueryCaptureRelationsWithinSpan):
    hits pass through; relations inside each hit are captured into
    match_info (index-keyed — the reference's list, flat-encoded)."""
    clause: Pattern
    capture_as: str = "captured_rels"
    rel_type: str | None = None
    #: rcapture2(query, toCapture, captureAs, type) — capture inside
    #: the clause's EXISTING capture group of this name instead of
    #: the whole hit (XFRelations.rcaptureWithinCapture)
    within: str | None = None


@dataclass(frozen=True)
class RField(Pattern):        # rfield(query, fieldOrVersion)
    """Query extension function ``rfield(q, field)``
    (XFRelations.java:131 / SpanQueryOtherFieldHits): report a source-
    field clause's hits in another (parallel) field's coordinates.
    The source field itself is a no-op, exactly like the reference."""
    clause: Pattern
    field: str


@dataclass(frozen=True)
class RSpan(Pattern):         # rspan(query, spanMode)
    """Query extension function ``rspan(q, mode)`` (XFRelations.java
    rspan / SpanQueryRelationSpanAdjust): re-report a relation-
    producing clause's hits under another span mode."""
    clause: Pattern
    span_mode: str


@dataclass(frozen=True)
class RootRel(Pattern):       # ^--> target  /  ^-type-> target
    """Root-relation operator (grammar cql.jj:102 ROOT_DEP_OP, :332
    rootRelationType): relations WITHOUT a source whose target span
    matches the clause — reported at the target ('root relations are
    indexed at the target')."""
    rel_type: str | None
    target: Pattern
    label: str | None = None  # 'label: ^--> tgt' capture (cql.jj:335)


@dataclass(frozen=True)
class RelMatch(Pattern):      # source -type-> target / !-type->
    """Relation operator ``source -type-> target`` (reference:
    SpanQueryCaptureRelationsBetweenSpans.java — relations of a type
    whose source span matches the left clause and target span matches
    the right clause; type is a regex like the reference's
    RegexpQuery rewrite). Top-level only in v1 (like Constrained).
    ``negate`` is the DEP_OP ``!`` prefix (cql.jj:103): source hits
    WITHOUT such a relation to a matching target — the hit is then
    the source span itself."""
    source: Pattern
    rel_type: str
    target: Pattern
    negate: bool = False
    #: capture label (cql.jj:308 ``[label ':'] relType target``): the
    #: matched relation's span is recorded in match_info under this
    #: name (reference: RelationTarget.captureAs; default name is
    #: derived from the type — here: no capture unless labeled)
    label: str | None = None


@dataclass(frozen=True)
class RelBranch:              # one ';'-separated child relation
    """One child-relation branch of a multi-branch relation query
    (cql.jj:308 childRelation: ``[label ':'] -type-> target``).
    ``negate`` mirrors RelMatch's DEP_OP ``!`` prefix; ``label``
    captures the branch's relation span in match_info."""
    rel_type: str
    target: Pattern
    negate: bool = False
    label: str | None = None


@dataclass(frozen=True)
class RelMulti(Pattern):      # src -t1-> a ; -t2-> b ; ...
    """Multi-branch relation query ``source -t1-> tgt1 ; -t2-> tgt2``
    (cql.jj:282 relationQuery with >1 childRelation; reference
    TextPatternRelationMatch.createRelMatchQuery → SpanQueryAnd with
    requireUniqueRelations — SpansAndMultiUniqueRelations.java:51):
    every positive branch must find a relation of its type whose
    SOURCE is the same parent span and whose target matches the
    branch clause; the same relation edge may not satisfy two
    branches (unique-relations AND). Hit = envelope of the parent
    span and all matched relation spans (consistent with RelMatch's
    full-span convention; the reference reports the source span and
    widens display via captured relations)."""
    source: Pattern
    branches: tuple  # of RelBranch, len >= 2


@dataclass(frozen=True)
class RMatch(Pattern):        # rmatch(q1, q2, ...)
    """``rmatch(q1, q2, ...)`` extension function (XFRelations.java:152
    rmatch → createRelMatchQuery): same-span AND of the argument
    queries after dropping any-n-gram arguments, with the
    unique-relations requirement applied when every clause carries
    relation match info (rel() hits)."""
    clauses: tuple  # of Pattern


@dataclass(frozen=True)
class Force(Pattern):         # _FI1(q) / _FI2(q) / _ident(q)
    """Debug extension functions (XFDebug.java:42, registry
    QueryExtensions.java:146): ``_ident(q)`` is the identity;
    ``_FI1(q)`` / ``_FI2(q)`` force a sequence's physical strategy —
    forward-index (NFA analog) vs postings intersection — bypassing
    the cost-based choice, so golden-equality tests can pin both
    paths (the reference uses them the same way)."""
    clause: Pattern
    strategy: str             # "fiseq" | "postings" | "ident"


@dataclass(frozen=True)
class CrossField(Pattern):    # source =type=>version? target
    """Cross-field alignment operator ``source ==> target`` (reference
    BCQL parallel-corpora syntax; SpanQueryCaptureRelationsBetween-
    Spans.java:32 with cross-field relations): source-field hits whose
    aligned field-b span matches the target clause, which is evaluated
    against field b's annotations (SpansOverrideField analog). Target
    is a word-layer term/regex/any-token leaf in v1. Top-level only,
    like RelMatch.

    Full ALIGNMENT_OP form (cql.jj:104, RelationOperatorInfo.
    fromOperator): ``rel_type`` = the ``=type=>`` relation-type regex
    (the derived alignment layer carries the single type ``align``);
    ``target_version`` = the ``==>name`` parallel-field name (``b`` is
    the one derived target version); ``optional`` = trailing ``?`` —
    source hits are kept even without an aligned target match
    (optionalMatch, null target span)."""
    source: Pattern
    target: Pattern
    rel_type: str | None = None
    target_version: str | None = None
    optional: bool = False


@dataclass(frozen=True)
class Turn(Pattern):
    """Whole-turn span ``<turn/>`` — the structural analog of the
    reference's ``<u/>`` inline tag (turns are rows here, SURVEY §1.4)."""


@dataclass(frozen=True)
class Tag(Pattern):
    """Stored inline-tag span ``<name/>`` / ``<name key="val"/>`` —
    the reference's tags annotation leaf (SpanQueryTags.java:30,
    TextPatternTags). ``adjust`` maps the grammar's three tag forms
    (cql.jj:359-371 TextPatternTags.Adjust): ``full`` = ``<s/>``
    whole span, ``lead`` = ``<s>`` zero-width leading edge,
    ``trail`` = ``</s>`` zero-width trailing edge. ``attr_range`` =
    the ``key=in[min,max]`` integer-range attribute test
    (cql.jj:401-412 MatchValue.intRange). Requires an index built
    with ``BuildConfig(tags=True)``; composes with within/containing
    like any span producer."""
    name: str
    attr_key: str | None = None
    attr_val: str | None = None
    adjust: str = "full"
    attr_range: tuple | None = None       # (key, min, max)


def static_width(p: Pattern) -> int | None:
    """Token width of every hit ``p`` can produce, if statically
    known; ``None`` when hits can vary in length. The reference keeps
    the same notion as BLSpanQuery.hitsLengthMin()==hitsLengthMax()
    (used by its NFA/clause-combining decisions); here it gates the
    JVM chain-closure fast path for repetition of fixed-width clauses
    (operators/spans.py) and other width-dependent rewrites."""
    if isinstance(p, (Term, Regex, Fuzzy, Not)):
        return 1                       # token leaves / token complement
    if isinstance(p, AnyToken):
        return p.min_len if p.max_len == p.min_len else None
    if isinstance(p, Seq):
        ws = [static_width(c) for c in p.clauses]
        return None if any(w is None for w in ws) else sum(ws)
    if isinstance(p, Or):
        ws = {static_width(c) for c in p.clauses}
        return ws.pop() if len(ws) == 1 and None not in ws else None
    if isinstance(p, And):
        # same-span AND: any POSITIVE clause with a known width pins
        # the result width. Negated clauses execute as an exact-span
        # anti-join (they only remove rows) — counting their width-1
        # bound would wrongly pin a variable-width AND-NOT.
        pos = [c for c in p.clauses if not isinstance(c, Not)]
        ws = {static_width(c) for c in (pos or p.clauses)} - {None}
        return ws.pop() if len(ws) == 1 else None
    if isinstance(p, (Capture, Force)):
        return static_width(p.clause)
    if isinstance(p, Rep):
        w = static_width(p.clause)
        if w is not None and p.max_rep == p.min_rep:
            return w * p.min_rep
        return None
    if isinstance(p, Expand):
        w = static_width(p.clause)
        if w is not None and p.max_exp == p.min_exp:
            return w + p.min_exp
        return None
    if isinstance(p, PosFilter):
        return static_width(p.producer)
    if isinstance(p, LenFilter):
        # a fixed-width clause stays fixed (an out-of-bounds filter
        # just yields the empty set, which satisfies any width claim)
        return static_width(p.clause)
    if isinstance(p, Constrained):
        return static_width(p.clause)
    if isinstance(p, Tag):
        return 0 if p.adjust in ("lead", "trail") else None
    return None


def _b(v: int | None) -> str:
    return "inf" if v is None else str(v)


def pattern_str(p: Pattern) -> str:
    """Stable printable form (used by explain())."""
    if isinstance(p, NoHits):
        return "NOHITS"
    if isinstance(p, Term):
        return f'"{p.text}"' if p.layer == "word" else \
            f'[{p.layer}="{p.text}"]'
    if isinstance(p, Regex):
        return f'/{p.pattern}/' if p.layer == "word" else \
            f'[{p.layer}=/{p.pattern}/]'
    if isinstance(p, Fuzzy):
        return f'"{p.text}"~{p.max_edits}'
    if isinstance(p, AnyToken):
        return f"[]{{{p.min_len},{_b(p.max_len)}}}"
    if isinstance(p, Seq):
        return "SEQ(" + ", ".join(pattern_str(c) for c in p.clauses) + ")"
    if isinstance(p, Or):
        return "OR(" + ", ".join(pattern_str(c) for c in p.clauses) + ")"
    if isinstance(p, And):
        return "AND(" + ", ".join(pattern_str(c) for c in p.clauses) + ")"
    if isinstance(p, Not):
        return f"NOT({pattern_str(p.clause)})"
    if isinstance(p, Rep):
        return f"REP({pattern_str(p.clause)},{p.min_rep},{_b(p.max_rep)})"
    if isinstance(p, Expand):
        return (f"EXPAND({pattern_str(p.clause)},{p.direction},"
                f"{p.min_exp},{_b(p.max_exp)})")
    if isinstance(p, PosFilter):
        inv = "NOT" if p.invert else ""
        return (f"{inv}{p.operation.upper()}({pattern_str(p.producer)}, "
                f"{pattern_str(p.filter)})")
    if isinstance(p, LenFilter):
        return (f"LENFILTER({pattern_str(p.clause)},"
                f"{p.min_len},{_b(p.max_len)})")
    if isinstance(p, Overlap):
        return f"OVERLAP({pattern_str(p.a)}, {pattern_str(p.b)})"
    if isinstance(p, Capture):
        return f"{p.name}:({pattern_str(p.clause)})"
    if isinstance(p, Constrained):
        return (f"CONSTRAINED({pattern_str(p.clause)} :: "
                f"{constraint_str(p.filter)})")
    if isinstance(p, RelMatch):
        neg = "!" if p.negate else ""
        return (f"REL({pattern_str(p.source)} {neg}-{p.rel_type}-> "
                f"{pattern_str(p.target)})")
    if isinstance(p, RelMulti):
        brs = " ; ".join(
            f"{b.label + ':' if b.label else ''}"
            f"{'!' if b.negate else ''}-{b.rel_type}-> "
            f"{pattern_str(b.target)}" for b in p.branches)
        return f"RELMULTI({pattern_str(p.source)} {brs})"
    if isinstance(p, RMatch):
        return ("rmatch(" +
                ", ".join(pattern_str(c) for c in p.clauses) + ")")
    if isinstance(p, Force):
        name = {"fiseq": "_FI1", "postings": "_FI2",
                "ident": "_ident"}[p.strategy]
        return f"{name}({pattern_str(p.clause)})"
    if isinstance(p, RootRel):
        return (f"ROOTREL(^-{p.rel_type or ''}-> "
                f"{pattern_str(p.target)})")
    if isinstance(p, RelFunc):
        tgt = "" if p.target is None else f", {pattern_str(p.target)}"
        return (f"rel({p.rel_type!r}{tgt}, {p.span_mode}, "
                f"{p.direction})")
    if isinstance(p, RSpan):
        return f"rspan({pattern_str(p.clause)}, {p.span_mode})"
    if isinstance(p, RField):
        return f"rfield({pattern_str(p.clause)}, {p.field})"
    if isinstance(p, RCapture):
        return (f"rcapture({pattern_str(p.clause)}, {p.capture_as}"
                f"{', ' + p.rel_type if p.rel_type else ''})")
    if isinstance(p, CrossField):
        op = (f"={p.rel_type or ''}=>"
              f"{p.target_version or ''}{'?' if p.optional else ''}")
        return (f"CROSSFIELD({pattern_str(p.source)} {op} "
                f"{pattern_str(p.target)})")
    if isinstance(p, Turn):
        return "<turn/>"
    if isinstance(p, Tag):
        attr = f' {p.attr_key}="{p.attr_val}"' if p.attr_key else ""
        if p.attr_range:
            k, lo, hi = p.attr_range
            attr += f" {k}=in[{lo},{hi}]"
        if p.adjust == "trail":
            return f"</{p.name}>"
        return f"<{p.name}{attr}" + ("/>" if p.adjust == "full"
                                     else ">")
    return repr(p)
