"""SRU Contextual Query Language (CQL / "contextql") parser.

The reference ships TWO query languages; this is the second one
(reference: query-parser/src/main/javacc/nl/inl/blacklab/queryParser/
contextql/contextql.jj, semantics in
ContextualQueryLanguageParser.java and CompleteQuery.java). A query
is a boolean combination of ``[index relation] term`` search clauses;
each clause is either a CONTENTS search (index names an annotation
layer, or ``contents`` / ``contents.<layer>``) or a METADATA filter
(any other index name). The result is a :class:`CompleteQuery`
carrying a contents :class:`~blacklab_spark.plans.query.Pattern`
and/or a doc-level predicate (a Spark SQL boolean expression over
``doc_meta`` columns — the analog of the reference's Lucene filter
Query).

Faithful to the reference's supported subset: only the ``=``
("contains") relation is implemented; ``any``/``all``/``exact``,
ordering relations, ``prox`` and relation modifiers raise exactly
where the reference throws UnsupportedOperationException. Wildcards
``*``/``?`` are supported in terms (TextPatternWildcard analog);
multi-word terms become a phrase sequence (PhraseQuery analog).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from blacklab_spark.plans.query import And, Not, Pattern, Seq, Or
from blacklab_spark.plans.parser import ParseError, _attr_leaf

#: layers a clause index may name directly (ContextualQueryLanguageParser
#: .contains: "word", "lemma" and "pos" by themselves are interpreted
#: as being prefixed with "contents.")
_DIRECT_LAYERS = ("word", "word_s", "word_ci", "word_di", "pos", "lemma")

_BOOL_OPS = ("and", "or", "not", "prox")
_CMP_SYMBOLS = ("=", ">", "<", ">=", "<=", "<>")
_NAMED_CMPS = ("any", "all", "exact", "within", "encloses")

_TOKEN_RE = re.compile(r"""
    \s*(
        "(?:[^"\\]|\\.)*"        |   # quoted string
        >=|<=|<>                 |
        [()><=/]                 |
        [A-Za-z0-9_.\-*?]+           # identifier (incl. wildcards)
    )""", re.VERBOSE)


def _strip_comments(s: str) -> str:
    s = re.sub(r"/\*(?:[^*]|\*(?!/))*\*/", " ", s)
    return re.sub(r"#[^\n\r]*", " ", s)


def _lex(s: str) -> list[str]:
    out, pos = [], 0
    s = _strip_comments(s)
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ParseError(f"contextql: cannot tokenize at "
                             f"{s[pos:pos + 20]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


@dataclass(frozen=True)
class CompleteQuery:
    """Contents pattern + metadata filter pair (CompleteQuery.java).
    ``filter`` is a Spark SQL boolean expression over doc_meta
    columns; combination rules mirror the reference exactly."""
    pattern: Pattern | None
    filter: str | None

    def and_(self, other: "CompleteQuery") -> "CompleteQuery":
        # contents combined token-level, filters doc-level (java:53-75)
        p = (And(self.pattern, other.pattern)
             if self.pattern is not None and other.pattern is not None
             else self.pattern if other.pattern is None else other.pattern)
        f = (f"({self.filter}) AND ({other.filter})"
             if self.filter is not None and other.filter is not None
             else self.filter if other.filter is None else other.filter)
        return CompleteQuery(p, f)

    def or_(self, other: "CompleteQuery") -> "CompleteQuery":
        if ((self.pattern is None) != (other.pattern is None)
                or (self.filter is None) != (other.filter is None)):
            raise ValueError(
                "or can only be used to combine contents clauses or "
                "metadata clauses; you can't combine the two with "
                "eachother with or")       # CompleteQuery.java:95
        p = (Or(self.pattern, other.pattern)
             if self.pattern is not None else None)
        f = (f"({self.filter}) OR ({other.filter})"
             if self.filter is not None else None)
        return CompleteQuery(p, f)

    def not_(self, other: "CompleteQuery") -> "CompleteQuery":
        # token-level and-not; filter MUST_NOT (java:126-151)
        if other.pattern is not None:
            p = (And(self.pattern, Not(other.pattern))
                 if self.pattern is not None else Not(other.pattern))
        else:
            p = self.pattern
        if self.filter is not None and other.filter is not None:
            f = f"({self.filter}) AND NOT ({other.filter})"
        elif other.filter is not None:
            raise ValueError(
                "Cannot have not without positive clause first!")
        else:
            f = self.filter
        return CompleteQuery(p, f)


def _wildcard_regex(val: str) -> str:
    return "".join(".*" if c == "*" else "." if c == "?"
                   else re.escape(c) for c in val)


def _contents_leaf(layer: str, val: str) -> Pattern:
    """TextPatternWildcard analog: wildcards become a regex leaf,
    plain terms a (desensitized) term leaf — both via the corpusql
    leaf builder so folding rules are identical across languages."""
    if "*" in val or "?" in val:
        return _attr_leaf(layer, _wildcard_regex(val))
    return _attr_leaf(layer, val)


def _sql_str(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _meta_predicate(field: str, value: str) -> str:
    """Metadata clause → doc_meta predicate. Single term with
    wildcards ≙ Lucene WildcardQuery (LIKE, case-insensitive — the
    reference's metadata fields default to insensitive analysis);
    multi-word value ≙ PhraseQuery (token-boundary substring)."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", field):
        raise ParseError(f"contextql: bad metadata field {field!r}")
    parts = value.split()
    if len(parts) <= 1:
        like = (value.lower().replace("\\", "\\\\")
                .replace("%", "\\%").replace("_", "\\_")
                .replace("*", "%").replace("?", "_"))
        return f"lower({field}) LIKE '{_sql_str(like)}'"
    rx = ("(^| )" + re.escape(" ".join(p.lower() for p in parts))
          + "($| )")
    return f"lower({field}) RLIKE '{_sql_str(rx)}'"


def _contains(field: str | None, value: str) -> CompleteQuery:
    """ContextualQueryLanguageParser.contains — decide contents vs
    metadata by the index name, then wildcard-term or phrase."""
    layer = None
    if field is None or field == "contents":
        layer = "word"
    elif field in _DIRECT_LAYERS:
        layer = field
    elif field.startswith("contents."):
        layer = field[len("contents."):]
        if layer not in _DIRECT_LAYERS:
            raise ParseError(f"contextql: unknown annotation {layer!r}")
    if layer is not None:
        parts = value.split()
        if len(parts) <= 1:
            return CompleteQuery(_contents_leaf(layer, value), None)
        return CompleteQuery(
            Seq(*(_contents_leaf(layer, p) for p in parts)), None)
    return CompleteQuery(None, _meta_predicate(field, value))


class _CqlParser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ParseError("contextql: unexpected end of query")
        self.i += 1
        return t

    def term(self) -> str:
        t = self.next()
        if t[0] == '"':
            return t[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if t in ("(", ")", ">", "<", "=", ">=", "<=", "<>", "/"):
            raise ParseError(f"contextql: expected term, got {t!r}")
        return t

    # queryInternal := scope queryInternal | scopedClause
    def query_internal(self) -> CompleteQuery:
        if self.peek() == ">":
            # scope: '>' [prefix '='] uri — parsed and discarded,
            # exactly like the reference grammar
            self.next()
            self.term()
            if self.peek() == "=":
                self.next()
                self.term()
            return self.query_internal()
        return self.scoped_clause()

    # scopedClause := searchClause [boolean scopedClause]
    def scoped_clause(self) -> CompleteQuery:
        a = self.search_clause()
        t = self.peek()
        if t is not None and t.lower() in _BOOL_OPS:
            op = self.next().lower()
            if self.peek() == "/":
                raise ValueError("Relation modifiers not supported yet!")
            if op == "prox":
                raise ValueError("prox is not yet supported!")
            b = self.scoped_clause()
            if op == "and":
                return a.and_(b)
            if op == "or":
                return a.or_(b)
            return a.not_(b)
        return a

    # searchClause := '(' queryInternal ')' | [index relation] term
    def search_clause(self) -> CompleteQuery:
        if self.peek() == "(":
            self.next()
            v = self.query_internal()
            if self.next() != ")":
                raise ParseError("contextql: expected ')'")
            return v
        first = self.term()
        nxt = self.peek()
        rel = None
        if nxt in _CMP_SYMBOLS or (
                nxt is not None and nxt.lower() in _NAMED_CMPS):
            rel = self.next().lower()
            if self.peek() == "/":
                raise ValueError("Relation modifiers not supported yet!")
            value = self.term()
            if rel != "=":
                # same unsupported set as the reference (clause())
                raise ValueError(
                    "Only contains (=) relation is supported!"
                    if rel in _CMP_SYMBOLS
                    else f"{rel} not yet supported")
            return _contains(first, value)
        return _contains(None, first)


def parse_contextql(q: str) -> CompleteQuery:
    p = _CqlParser(_lex(q))
    out = p.query_internal()
    if p.peek() is not None:
        raise ParseError(f"contextql: trailing content {p.peek()!r}")
    return out
