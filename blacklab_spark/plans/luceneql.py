"""Lucene-classic filter-query syntax → doc_meta predicate.

The reference server's ``filter`` parameter takes a Lucene
QueryParser query over document METADATA (reference:
server/src/main/java/nl/inl/blacklab/server/lib/SearchCreator.java
``filter``/``filterlang=luceneql``; parsed with
org.apache.lucene.queryparser.classic.QueryParser). This module
implements the practical subset as a compiler to a Spark SQL boolean
expression over ``doc_meta`` columns:

- ``field:value`` — insensitive term match; ``*``/``?`` wildcards
  (WildcardQuery analog → ``LIKE``)
- ``field:"multi word"`` — phrase (token-boundary substring, the same
  analog contextql uses for PhraseQuery)
- ``field:[a TO b]`` / ``field:{a TO b}`` — inclusive / exclusive
  range (TermRangeQuery analog; Spark coerces the literal to the
  column type, so ts ranges work with ISO timestamps)
- ``field:(a b OR c)`` — grouped subquery on one field
- ``AND`` / ``OR`` / ``NOT`` with Lucene precedence (NOT > AND > OR);
  bare juxtaposition = OR (QueryParser's default operator);
  ``+clause`` required / ``-clause`` prohibited map to AND / AND NOT
  within their group

Field names must be explicit (no default field) — a filter over
unnamed text is a contents query's job, not the metadata filter's.
"""

from __future__ import annotations

import re

from blacklab_spark.plans.parser import ParseError

_TOKEN_RE = re.compile(r"""
    \s*(
        "(?:[^"\\]|\\.)*"            |  # quoted phrase
        \[|\]|\{|\}|\(|\)|\+|-|:     |
        [^\s()\[\]{}+:"]+               # term / field / AND / OR / TO
    )""", re.VERBOSE)


def _lex(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ParseError(f"luceneql: cannot tokenize at "
                             f"{s[pos:pos + 20]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _sql_str(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _term_predicate(field: str, value: str) -> str:
    """One term/phrase against one metadata column (insensitive, like
    the reference's default metadata analyzer)."""
    if value and value[0] == '"':
        value = value[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        parts = value.split()
        if len(parts) > 1:
            rx = ("(^| )" + re.escape(" ".join(p.lower() for p in parts))
                  + "($| )")
            return f"lower({field}) RLIKE '{_sql_str(rx)}'"
    if "*" in value or "?" in value:
        like = (value.lower().replace("\\", "\\\\")
                .replace("%", "\\%").replace("_", "\\_")
                .replace("*", "%").replace("?", "_"))
        return f"lower({field}) LIKE '{_sql_str(like)}'"
    return f"lower({field}) = '{_sql_str(value.lower())}'"


class _LuceneParser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ParseError("luceneql: unexpected end of filter")
        self.i += 1
        return t

    def _field_name(self, t: str) -> str:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            raise ParseError(f"luceneql: bad field name {t!r}")
        return t

    # query := clause ((AND|OR|bare) clause)*   — OR default operator
    # query := [+|-] andChain ((OR | bare) [+|-] andChain)*
    # Two precedence levels (docstring contract, NOT > AND > OR):
    # OR / bare juxtaposition bind loosest, AND tighter — so
    # ``a:x OR b:y c:z AND d:w`` is x ∨ y ∨ (z ∧ w), not
    # ((x ∨ y ∨ z) ∧ w) as a flat left fold would give. ``+``/``-``
    # mark their chain required / prohibited within this group:
    # result = AND(required) ∧ ¬each(prohibited) ∧ (OR of the
    # unmarked chains, when any exist).
    def query(self, field: str | None = None) -> str:
        shoulds: list[str] = []
        musts: list[str] = []
        must_nots: list[str] = []

        def take() -> None:
            t = self.peek()
            if t == "+":
                self.next()
                musts.append(self.and_chain(field))
            elif t == "-":
                self.next()
                must_nots.append(self.and_chain(field))
            else:
                shoulds.append(self.and_chain(field))

        take()
        while True:
            t = self.peek()
            if t is None or t == ")":
                break
            if t.upper() == "OR":
                self.next()
            take()
        disj = None
        if shoulds:
            disj = shoulds[0]
            for s in shoulds[1:]:
                disj = f"({disj}) OR ({s})"
        if not (musts or must_nots):
            return disj
        conjs = list(musts) + [f"NOT ({m})" for m in must_nots]
        if disj is not None:
            conjs.append(disj)
        out = conjs[0]
        for c in conjs[1:]:
            out = f"({out}) AND ({c})"
        return out

    # andChain := clause (AND clause)*
    def and_chain(self, field: str | None) -> str:
        out = self.clause(field)
        while True:
            t = self.peek()
            if t is not None and t.upper() == "AND":
                self.next()
                out = f"({out}) AND ({self.clause(field)})"
            else:
                return out

    # clause := [+|-|NOT] atom
    def clause(self, field: str | None) -> str:
        t = self.peek()
        if t == "+":
            self.next()
            return self.clause(field)          # MUST ≈ plain AND member
        if t == "-" or (t is not None and t.upper() == "NOT"):
            self.next()
            return f"NOT ({self.clause(field)})"
        return self.atom(field)

    # atom := '(' query ')' | field ':' value | term (in-field group)
    def atom(self, field: str | None) -> str:
        t = self.next()
        if t == "(":
            v = self.query(field)
            if self.next() != ")":
                raise ParseError("luceneql: expected ')'")
            return v
        if self.peek() == ":":
            self.next()
            return self.value(self._field_name(t))
        if field is None:
            raise ParseError(
                f"luceneql: term {t!r} has no field — metadata filters "
                "need explicit field:value (no default field)")
        return _term_predicate(field, t)

    # value := '(' query<field> ')' | range | term
    def value(self, field: str) -> str:
        t = self.peek()
        if t == "(":
            self.next()
            v = self.query(field)
            if self.next() != ")":
                raise ParseError("luceneql: expected ')'")
            return v
        if t in ("[", "{"):
            lo_inc = self.next() == "["
            lo = self.next()
            if self.next().upper() != "TO":
                raise ParseError("luceneql: expected TO in range")
            hi = self.next()
            closer = self.next()
            if closer not in ("]", "}"):
                raise ParseError("luceneql: expected ] or } in range")
            hi_inc = closer == "]"
            conds = []
            if lo != "*":
                conds.append(
                    f"{field} >{'=' if lo_inc else ''} "
                    f"'{_sql_str(_unq(lo))}'")
            if hi != "*":
                conds.append(
                    f"{field} <{'=' if hi_inc else ''} "
                    f"'{_sql_str(_unq(hi))}'")
            if not conds:
                return f"{field} IS NOT NULL"
            return "(" + " AND ".join(conds) + ")"
        return _term_predicate(field, self.next())


def _unq(t: str) -> str:
    return t[1:-1] if t[:1] == '"' else t


def parse_lucene_filter(q: str) -> str:
    """Lucene filter query string → Spark SQL boolean expression over
    doc_meta columns."""
    p = _LuceneParser(_lex(q))
    out = p.query()
    if p.peek() is not None:
        raise ParseError(f"luceneql: trailing content {p.peek()!r}")
    return out
