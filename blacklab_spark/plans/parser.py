"""CQL-lite parser: a corpus-query-language subset → Pattern AST.

Covers the productions of the reference grammar we support
(reference grammar: query-parser/src/main/javacc/.../cql.jj —
sequence:465, booleanQuery:443, repetitionAmount:415,
containingWithinQuery:247; written from scratch as a recursive-descent
parser, not a translation):

    query        := boolean (('within'|'containing') boolean)*
    boolean      := seq (('|' | '&') seq)*
    seq          := unary+
    unary        := '!' unary | postfixed

Precedence matches the reference grammar (cql.jj booleanQuery :=
sequence [op booleanQuery]): adjacency binds tighter than ``|``/``&``,
so ``a b | c d`` parses as ``Or(Seq(a,b), Seq(c,d))``.
    postfixed    := atom ('*' | '+' | '?' | '{m,n}' | '{m,}' | '{m}')*
    atom         := '"text"' | "'text'" | '[]' | '[word="re"]'
                    | '(' query ')' | name ':(' query ')' | '<turn/>'
                    | bareword

A quoted/bare token containing regex metacharacters parses as Regex
(the rewriter may simplify it back to Term/prefix — SimplestMatcher,
SURVEY.md §4.1).
"""

from __future__ import annotations

import re

from blacklab_spark.plans.query import (And, AnyToken, Capture, CAnnot,
                                        CBool, CCmp, CFunc, CNot, Constrained,
                                        CrossField, CStr, Force, Fuzzy,
                                        Not, Or,
                                        Overlap, Pattern, PosFilter, RCapture,
                                        Regex, RelBranch, RelFunc, RelMatch,
                                        RelMulti, RMatch, Rep, RField,
                                        RootRel, RSpan, Seq, Tag, Term, Turn)

_TOKEN_RE = re.compile(r"""
    \s*(
        @[A-Za-z_][A-Za-z0-9_]*=[^\s]+ |  # @key=value settings
        l?"(?:[^"\\]|\\.)*"        |  # double-quoted (l = literal)
        l?'(?:[^'\\]|\\.)*'        |  # single-quoted
        \[\s*\]                    |  # []
        \[(?:[^\]"]|"[^"]*")*\]    |  # [annot="..."] / boolean bracket expr
        <turn/>                    |
        <[A-Za-z][A-Za-z0-9_-]*(?:\s[^>]*)?/> |  # inline tag <s/> <ne k="v"/>
        </[A-Za-z][A-Za-z0-9_-]*>  |  # trailing tag edge </s>
        <[A-Za-z][A-Za-z0-9_-]*(?:\s[^>]*?)?> |  # leading tag edge <s>

        \{\s*\d*\s*(?:,\s*\d*\s*)?\} |  # {m}, {m,}, {m,n}, {,n}
        ~\d+                       |  # fuzzy postfix "word"~edits
        =(?:[A-Za-z_][A-Za-z0-9_.*|?-]*)?=>[A-Za-z0-9_-]*\??
                                   |  # alignment op =type=>version?
        ::                         |  # global-constraint separator
        [A-Za-z_][A-Za-z0-9_]*:\(  |  # capture open (parenthesized)
        [A-Za-z_][A-Za-z0-9_]*:    |  # capture of the next atom
        !=                         |  # constraint inequality
        \(|\)|\||&|!|\*|\+|\?|,|;  |
        (?:within|containing|overlap)\b |
        [^\s()\[\]{}|&!*+?:'"~,;]+     # bare word / regex (no quotes)
    )""", re.VERBOSE)

_META = re.compile(r"[.*+?^$|\\(){}\[\]]")


class ParseError(ValueError):
    pass


def _lex(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ParseError(f"cannot tokenize at: {s[pos:pos+20]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _fold_regex_literals(pat: str) -> str:
    """Fold (lower + de-accent) only the LITERAL characters of a regex.

    Lowercasing a whole pattern corrupts uppercase escapes — \\S→\\s,
    \\D→\\d, \\W→\\w invert their meaning and \\p{L}→\\p{l} is an
    invalid Java property — so escapes (and the {...} argument of
    \\p/\\P) are copied verbatim; everything else is folded per-char
    so literals compare against the folded @i dictionary. Case
    matching of literals is additionally covered by (?iu) applied at
    expansion time (index.expand_regex)."""
    from blacklab_spark.tokenizer import py_fold_insensitive
    out: list[str] = []
    i, n = 0, len(pat)
    while i < n:
        ch = pat[i]
        if ch == "\\" and i + 1 < n:
            out.append(pat[i:i + 2])
            i += 2
            if pat[i - 1] in "pP" and i < n and pat[i] == "{":
                close = pat.find("}", i)
                close = n - 1 if close < 0 else close
                out.append(pat[i:close + 1])
                i = close + 1
        else:
            out.append(py_fold_insensitive(ch))
            i += 1
    return "".join(out)


#: session default sensitivity layer for bare word values — the
#: reference's index.setDefaultMatchSensitivity (QueryToolImpl
#: 'sensitive' command); set per-parse via parse(..., sensitivity=).
_DEFAULT_LAYER = "word"


def _word_pattern(text: str) -> Pattern:
    """Word-layer value → desensitized pattern: the @i dictionary is
    lowercased AND accent-folded (tokenizer v2), so query terms fold
    the same way — 'Café' must match the stored term 'cafe' (reference
    desensitizes query terms identically, DesensitizeFilter). Regex
    patterns fold only their literal runs (escape sequences kept
    verbatim — see _fold_regex_literals). A non-default session
    sensitivity (QueryTool 'sensitive' command) reroutes bare values
    to the matching layer."""
    if _DEFAULT_LAYER != "word":
        return _word_pattern_sens(text, _DEFAULT_LAYER)
    from blacklab_spark.tokenizer import py_fold_insensitive
    if _META.search(text):
        return Regex(_fold_regex_literals(text))
    return Term(py_fold_insensitive(text))


_FLAGS_RE = re.compile(r"^%([A-Za-z]+)$")

#: (case_sensitive, diacritics_sensitive) → annotation layer
_SENS_LAYER = {(False, False): "word", (True, False): "word_di",
               (False, True): "word_ci", (True, True): "word_s"}


def _sens_layer(flags: str) -> tuple[str, bool]:
    """``%c``-style sensitivity flags (grammar cql.jj:108 FLAGS token
    ``[cCdDlL]+`` — the reference lexes c/C/d/D and discards them;
    here they select the matching sensitivity layer, which the index
    materializes for all four MatchSensitivity variants): c/C = case
    sensitive/insensitive, d/D = diacritics, l/L = treat the value as
    a literal string / as a regex (getStringBetweenQuotes's ``l``
    prefix as a flag). Last flag of a dimension wins; default
    insensitive, regex-interpreted. → (layer, literal)."""
    case_s = diac_s = literal = False
    for ch in flags:
        if ch == "c":
            case_s = True
        elif ch == "C":
            case_s = False
        elif ch == "d":
            diac_s = True
        elif ch == "D":
            diac_s = False
        elif ch == "l":
            literal = True
        elif ch == "L":
            literal = False
        else:
            raise ParseError(
                f"unsupported sensitivity flag {ch!r} (use c/C/d/D/l/L)")
    return _SENS_LAYER[(case_s, diac_s)], literal


def _word_pattern_sens(text: str, layer: str,
                       literal: bool = False) -> Pattern:
    """Word-layer value desensitized for the CHOSEN sensitivity layer
    (flags path): the value folds exactly like the layer's tokens.
    ``literal`` (the ``l"..."`` prefix, CorpusQueryLanguageParser.
    getStringBetweenQuotes:70-83) suppresses regex interpretation —
    metacharacters match themselves."""
    if layer == "word" and not literal:
        return _word_pattern(text)
    if not literal and _META.search(text):
        return Regex(text, layer)
    from blacklab_spark.tokenizer import fold_for_layer
    return Term(fold_for_layer(text, layer), layer)


_TAG_ATTR = re.compile(
    r'([A-Za-z_][A-Za-z0-9_-]*)\s*=\s*'
    r'(?:"([^"]*)"|in\s*\[\s*(\d+)\s*,\s*(\d+)\s*\])')


def _parse_tag(t: str) -> Pattern:
    """One tag leaf in its three grammar forms (cql.jj:359-371
    tag()): ``<s/>`` full span, ``<s>`` leading edge, ``</s>``
    trailing edge; attributes ``key="val"`` (exact) or
    ``key=in[min,max]`` (integer range, cql.jj:401)."""
    m = re.match(r'^</([A-Za-z][A-Za-z0-9_-]*)>$', t)
    if m:
        return Tag(m.group(1), adjust="trail")
    m = re.match(r'^<([A-Za-z][A-Za-z0-9_-]*)([^>]*?)(/?)>$', t)
    if not m:
        raise ParseError(f"malformed tag leaf: {t!r}")
    name, attrs_s, self_close = m.groups()
    adjust = "full" if self_close else "lead"
    attr_key = attr_val = attr_range = None
    pos = 0
    for am in _TAG_ATTR.finditer(attrs_s):
        if attrs_s[pos:am.start()].strip():
            raise ParseError(f"malformed tag attributes: {t!r}")
        pos = am.end()
        if am.group(2) is not None:
            if attr_key is not None:
                raise ParseError(
                    "at most one exact attribute test per tag leaf")
            attr_key, attr_val = am.group(1), am.group(2)
        else:
            if attr_range is not None:
                raise ParseError(
                    "at most one range attribute test per tag leaf")
            attr_range = (am.group(1), int(am.group(3)),
                          int(am.group(4)))
    if attrs_s[pos:].strip():
        raise ParseError(f"malformed tag attributes: {t!r}")
    return Tag(name, attr_key, attr_val, adjust, attr_range)


def _attr_leaf(layer: str, val: str, literal: bool = False) -> Pattern:
    """One annotation test inside a token bracket (cql.jj:631
    attValuePair). ``literal`` = the ``l"..."`` value prefix."""
    if layer == "word":
        return _word_pattern_sens(val, "word", literal) if literal \
            else _word_pattern(val)
    # ci/di sensitivity pseudo-layers desensitize the value exactly
    # like their token column (MatchSensitivity.java):
    # [word_ci="Café"] probes lower(tokens_s) with "café".
    as_term = literal or not _META.search(val)
    if layer == "word_ci":
        val = val.lower() if as_term else val
    elif layer == "word_di":
        from blacklab_spark.tokenizer import py_fold_diacritics
        if as_term:
            val = py_fold_diacritics(val)
    # non-word annotation layer ([pos="..."]): values are
    # layer-literal (no folding)
    return Term(val, layer) if as_term else Regex(val, layer)


_BRACKET_TOKEN = re.compile(r"""
    \s*(
        [A-Za-z_][A-Za-z0-9_]*(?:/[A-Za-z_][A-Za-z0-9_]*)?
            \s*!?=\s*l?"[^"]*"(?:%[A-Za-z]+)? |
        \(|\)|&|\||!    # annot[/sub] =/!= [l]"value" [%flags]
    )""", re.VERBOSE)
_BRACKET_TEST = re.compile(
    r'^([A-Za-z_][A-Za-z0-9_]*(?:/[A-Za-z_][A-Za-z0-9_]*)?)'
    r'\s*(!?=)\s*(l?)"([^"]*)"(?:%([A-Za-z]+))?$')


def _parse_bracket(inner: str) -> Pattern:
    """Boolean expression over annotation tests inside one token
    bracket: ``[lemma="x" & pos="y"]``, ``[word="a" | word="b"]``,
    ``[pos!="noun"]``, parentheses and ``!`` (reference cql.jj
    attValuePair grammar; TextPatternAndNot over single-token
    clauses). ``&`` binds tighter than ``|``; every operand is a
    width-1 leaf, so And is same-span intersection, Not the token
    complement — the existing span operators."""
    toks, pos = [], 0
    while pos < len(inner):
        if inner[pos:].strip() == "":
            break
        m = _BRACKET_TOKEN.match(inner, pos)
        if not m:
            raise ParseError(
                f"cannot tokenize bracket expression at: "
                f"{inner[pos:pos+20]!r}")
        toks.append(m.group(1))
        pos = m.end()
    p = _Parser(toks)

    def unary() -> Pattern:
        t = p.next()
        if t == "!":
            return Not(unary())
        if t == "(":
            node = or_()
            if p.next() != ")":
                raise ParseError("expected ) in bracket expression")
            return node
        m = _BRACKET_TEST.match(t)
        if not m:
            raise ParseError(f"expected annot=\"value\" test, got {t!r}")
        lit = bool(m.group(3))            # [word=l"a.b"]
        if m.group(5):                    # [word="Foo"%c]
            layer, flit = _sens_layer(m.group(5))
            if layer != "word" and m.group(1) != "word":
                raise ParseError(
                    "sensitivity flags apply to the 'word' "
                    f"annotation, not {m.group(1)!r}")
            if m.group(1) == "word":
                leaf = _word_pattern_sens(m.group(4), layer,
                                          lit or flit)
            else:
                leaf = _attr_leaf(m.group(1), m.group(4),
                                  lit or flit)
        else:
            leaf = _attr_leaf(m.group(1), m.group(4), lit)
        return Not(leaf) if m.group(2) == "!=" else leaf

    def and_() -> Pattern:
        node = unary()
        while p.peek() == "&":
            p.next()
            node = And(node, unary())
        return node

    def or_() -> Pattern:
        node = and_()
        while p.peek() == "|":
            p.next()
            node = Or(node, and_())
        return node

    node = or_()
    if p.peek() is not None:
        raise ParseError(
            f"trailing content in bracket expression: {p.peek()!r}")
    return node


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of query")
        self.i += 1
        return t

    # query := constrained
    # constrained := posfiltered ('::' constraint)?   (cql.jj:157)
    # relation operator token: -type-> (type may be a regex alternation
    # like -det|obj->; reference BCQL relation operator, matched as a
    # RegexpQuery over relation types)
    _REL_OP = re.compile(
        r"^-([A-Za-z_][A-Za-z0-9_.*|?]*)->([A-Za-z0-9_-]*)$")
    # ALIGNMENT_OP (cql.jj:104): =type=>targetversion with optional
    # trailing '?' (optionalMatch)
    _ALIGN_OP = re.compile(
        r"^=([A-Za-z_][A-Za-z0-9_.*|?-]*)?=>([A-Za-z0-9_-]*)(\?)?$")
    # root-relation prefix operator ^--> / ^-type-> (cql.jj:102
    # ROOT_DEP_OP, rootRelationType production)
    _ROOT_OP = re.compile(
        r"^\^-([A-Za-z_][A-Za-z0-9_.*|?]*)?->([A-Za-z0-9_-]*)$")

    @staticmethod
    def _rel_type(m) -> str:
        """Relation type of a matched [ROOT_]DEP_OP; the grammar
        allows a target-version suffix (cql.jj:102-103, parallel
        corpora) which this single-field relation layer rejects
        honestly instead of mis-lexing it."""
        if m.group(2):
            raise ParseError(
                f"cross-field relation target {m.group(2)!r} not "
                "supported: the relation layer is single-field "
                "(use the ==> alignment operator for field b)")
        return m.group(1)
    # capture label before a relation operator: 'label: -type-> tgt'
    # (cql.jj:308 childRelation / :335 rootRelationType captureLabel)
    _CAP_TOK = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*:$")

    def _rel_label(self) -> str | None:
        """Consume and return a capture label iff the current token is
        ``name:`` immediately followed by a (possibly negated)
        relation operator; else leave the stream untouched."""
        t = self.peek()
        if not (t and self._CAP_TOK.match(t)):
            return None
        nxt = self.peek_ahead(1)
        if nxt and (self._REL_OP.match(nxt) or self._ROOT_OP.match(nxt)
                    or (nxt == "!" and self.peek_ahead(2)
                        and self._REL_OP.match(self.peek_ahead(2)))):
            return self.next()[:-1]
        return None

    def query(self) -> Pattern:
        t0 = self.peek()
        root_label = None
        if t0 and self._CAP_TOK.match(t0):
            nxt = self.peek_ahead(1)
            if nxt and self._ROOT_OP.match(nxt):
                root_label = self.next()[:-1]
                t0 = self.peek()
        mroot = self._ROOT_OP.match(t0) if t0 else None
        if mroot:
            self.next()
            return RootRel(self._rel_type(mroot), self.posfiltered(),
                           label=root_label)
        left = self.posfiltered()
        label = self._rel_label()
        t = self.peek()
        m = self._REL_OP.match(t) if t else None
        neg_next = self.peek_ahead(1)
        mneg = (self._REL_OP.match(neg_next)
                if t == "!" and neg_next else None)
        if m or mneg:
            # source [!]-type-> target (SpanQueryCaptureRelations-
            # BetweenSpans analog; '!' = DEP_OP negation, cql.jj:103).
            # Top-level only, like the :: constraint. Further
            # ';'-separated branches (cql.jj:293) share the same
            # source span → RelMulti (unique-relations AND).
            self.next()
            if mneg:
                self.next()
            branches = [RelBranch(self._rel_type(m or mneg),
                                  self.posfiltered(), bool(mneg),
                                  label)]
            while self.peek() == ";":
                self.next()
                label2 = self._rel_label()
                t2 = self.peek()
                m2 = self._REL_OP.match(t2) if t2 else None
                neg2 = self.peek_ahead(1)
                mneg2 = (self._REL_OP.match(neg2)
                         if t2 == "!" and neg2 else None)
                if not (m2 or mneg2):
                    raise ParseError(
                        "expected a relation operator after ';' "
                        f"(got {t2!r})")
                self.next()
                if mneg2:
                    self.next()
                branches.append(RelBranch(self._rel_type(m2 or mneg2),
                                          self.posfiltered(),
                                          bool(mneg2), label2))
            if len(branches) == 1:
                b = branches[0]
                left = RelMatch(left, b.rel_type, b.target,
                                negate=b.negate, label=b.label)
            else:
                left = RelMulti(left, tuple(branches))
        elif t is not None and self._ALIGN_OP.match(t):
            # source =type=>version? target: cross-field alignment
            # (reference BCQL parallel-corpora operator; target
            # clause runs against field b's annotations). Top-level
            # only, like RelMatch.
            ma = self._ALIGN_OP.match(self.next())
            left = CrossField(left, self.posfiltered(),
                              rel_type=ma.group(1) or None,
                              target_version=ma.group(2) or None,
                              optional=bool(ma.group(3)))
        if self.peek() == "::":
            self.next()
            left = Constrained(left, self.constraint())
        return left

    # posfiltered := boolean ((within|containing|overlap) boolean)*
    # (cql.jj:247 containingWithinQuery; 'overlap' → Overlapping)
    def posfiltered(self) -> Pattern:
        left = self.boolean()
        while self.peek() in ("within", "containing", "overlap"):
            op = self.next()
            right = self.boolean()
            left = (Overlap(left, right) if op == "overlap"
                    else PosFilter(left, right, op))
        return left

    # constraint := simpleConstraint (('&'|'|'|'->') constraint)?
    # (cql.jj:171 — right-associative like the reference grammar)
    _CMP_OPS = ("=", "!=", ">=", "<=", ">", "<")

    def constraint(self):
        a = self.simple_constraint()
        if self.peek() in ("&", "|", "->"):
            op = self.next()
            return CBool(op, a, self.constraint())
        return a

    # simpleConstraint := constraintValue (cmpOp constraintValue)?
    # (cql.jj:189; bare values are only meaningful as booleans, which
    # the executor validates)
    def simple_constraint(self):
        v = self.cvalue()
        if self.peek() in self._CMP_OPS:
            op = self.next()
            return CCmp(v, op, self.cvalue())
        return v

    # constraintValue := string | '(' constraint ')' | '!' value |
    #                    NAME '(' label ')' | label ['.' annot]
    # (cql.jj:226)
    def cvalue(self):
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of constraint")
        if t[0] in "\"'":
            self.next()
            return CStr(t[1:-1])
        if t == "(":
            self.next()
            v = self.constraint()
            if self.next() != ")":
                raise ParseError("expected ')' in constraint")
            return v
        if t == "!":
            self.next()
            return CNot(self.cvalue())
        self.next()
        if (re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t)
                and self.peek() == "("):
            self.next()                       # '('
            label = self.next()
            if self.next() != ")":
                raise ParseError(f"expected ')' after {t}({label!r}")
            return CFunc(t, label)
        if "." in t:
            name, annot = t.split(".", 1)
            return CAnnot(name, annot)
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            raise ParseError(f"bad constraint operand: {t!r}")
        return CAnnot(t, "word")              # default annotation

    # boolean := seq (('|'|'&') seq)* — |/& bind LOOSER than adjacency
    # (reference: cql.jj booleanQuery := sequence [op booleanQuery])
    def boolean(self) -> Pattern:
        left = self.seq()
        while self.peek() in ("|", "&"):
            op = self.next()
            right = self.seq()
            if op == "|":
                left = Or(left, right)
            else:
                left = And(left, right)
        return left

    def seq(self) -> Pattern:
        clauses = [self.unary()]
        while self.peek() is not None and self.peek() not in (
                ")", ",", ";", "within", "containing", "overlap",
                "|", "&", "::") \
                and not self._ALIGN_OP.match(self.peek()) \
                and not self._REL_OP.match(self.peek()) \
                and not (self.peek() == "!" and self.peek_ahead(1)
                         and self._REL_OP.match(self.peek_ahead(1))) \
                and not self._label_starts_relation():
            clauses.append(self.unary())
        return clauses[0] if len(clauses) == 1 else Seq(*clauses)

    def _label_starts_relation(self) -> bool:
        """True when the upcoming tokens are ``label: [!]-type->`` —
        a relation capture label, which belongs to the enclosing
        relationQuery, not to this sequence."""
        t = self.peek()
        if not (t and self._CAP_TOK.match(t)):
            return False
        nxt = self.peek_ahead(1)
        return bool(nxt and (
            self._REL_OP.match(nxt)
            or (nxt == "!" and self.peek_ahead(2)
                and self._REL_OP.match(self.peek_ahead(2)))))

    def unary(self) -> Pattern:
        if self.peek() == "!":
            self.next()
            return Not(self.unary())
        return self.postfixed()

    def postfixed(self) -> Pattern:
        node = self.atom()
        while True:
            t = self.peek()
            if t is not None and t.startswith("~"):
                # fuzzy term postfix (reference SpanFuzzyQuery.java:35;
                # TextPatternFuzzy): only meaningful on a plain term
                self.next()
                if not isinstance(node, Term):
                    raise ParseError(
                        f"~{t[1:]} fuzzy postfix applies to a plain "
                        f"term, got {node!r}")
                node = Fuzzy(node.text, int(t[1:]), node.layer)
            elif t == "*":
                self.next()
                node = Rep(node, 0, None)   # unbounded (cql.jj:415)
            elif t == "+":
                self.next()
                node = Rep(node, 1, None)
            elif t == "?":
                self.next()
                node = Rep(node, 0, 1)
            elif t is not None and t.startswith("{"):
                self.next()
                inner = t[1:-1].strip()
                if "," in inner:
                    lo, hi = inner.split(",")
                    node = Rep(node, int(lo or 0),
                               int(hi) if hi.strip() else None)
                else:
                    node = Rep(node, int(inner), int(inner))
            else:
                return node

    def atom(self) -> Pattern:
        t = self.next()
        if t.startswith(('"', "'", 'l"', "l'")):
            literal = t.startswith("l")   # l"..." literal string
            if literal:
                t = t[1:]
            body = t[1:-1]
            layer = "word"
            nxt = self.peek()
            mfl = _FLAGS_RE.match(nxt) if nxt else None
            if mfl:                       # "Foo"%c sensitivity flags
                self.next()
                layer, flit = _sens_layer(mfl.group(1))
                literal = literal or flit
            words = body.split()
            if len(words) > 1:            # "very good" → phrase
                return Seq(*[_word_pattern_sens(w, layer, literal)
                             for w in words])
            return _word_pattern_sens(body, layer, literal)
        if t == "[]":
            return AnyToken(1, 1)
        if t.startswith("[") and "=" in t:
            return _parse_bracket(t[1:-1])
        if t == "<turn/>":
            return Turn()
        if t.startswith("<") and t.endswith(">"):
            return _parse_tag(t)
        if t == "(":
            node = self.query()
            if self.next() != ")":
                raise ParseError("expected )")
            return node
        if t.endswith(":("):
            name = t[:-2]
            node = self.posfiltered()
            if self.next() != ")":
                raise ParseError("expected )")
            return Capture(node, name)
        if t.endswith(":") and len(t) > 1 and t != "::":
            # bare capture: A:[] / A:"word" / A:[]{2,2} (cql.jj:486 —
            # the label wraps sequencePartNoCapture INCLUDING its
            # repetition postfix, so A:[]{2,2} captures the 2-gram)
            return Capture(self.postfixed(), t[:-1])
        if t in (")", "|", "&", "!", "*", "+", "?"):
            raise ParseError(f"unexpected {t!r}")
        if t == "_":
            # default value (reference TextPatternDefaultValue,
            # SpanQueryDefaultValue.java:21): any token here
            return AnyToken(1, 1)
        if t in ("rel", "rmatch", "rspan", "rfield", "rcapture",
                 "rcapture2", "_FI1", "_FI2", "_ident") \
                and self.peek() == "(":
            return self._func_call(t)
        return _word_pattern(t)

    # queryFunctionCall := NAME '(' [arg (',' arg)*] ')' (cql.jj:515;
    # registry QueryExtensions.java:142 — registered names shadow the
    # bare term, exactly like the reference)
    def _func_call(self, name: str) -> Pattern:
        self.next()                               # '('
        args: list = []
        if self.peek() != ")":
            while True:
                t = self.peek()
                if t is not None and t[0] in "\"'" and self.peek_ahead(
                        1) in (",", ")"):
                    args.append(("s", self.next()[1:-1]))  # string arg
                else:
                    args.append(("q", self.query()))       # query arg
                if self.peek() == ",":
                    self.next()
                    continue
                break
        if self.next() != ")":
            raise ParseError(f"expected ')' closing {name}(...)")
        return self._build_func(name, args)

    def peek_ahead(self, k: int) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def _build_func(self, name: str, args: list) -> Pattern:
        def s_arg(i, default=None, what="a string"):
            if i >= len(args):
                return default
            kind, v = args[i]
            if kind != "s":
                raise ParseError(f"{name}() argument {i + 1} must be "
                                 f"{what} (quoted)")
            return v
        if name == "rel":
            if not args:
                raise ParseError("rel() needs a relation type")
            rel_type = s_arg(0, what="the relation type")
            target = None
            if len(args) > 1:
                kind, v = args[1]
                target = v if kind == "q" else _word_pattern(v)
                # any-n-gram target ≙ no target (XFRelations:79)
                if isinstance(target, AnyToken):
                    target = None
            span_mode = s_arg(2, "source", "a span mode")
            direction = s_arg(3, "both", "a direction")
            return RelFunc(rel_type, target, span_mode, direction)
        if name in ("_FI1", "_FI2", "_ident"):
            # debug strategy-forcing functions (XFDebug.java:42)
            if len(args) != 1 or args[0][0] != "q":
                raise ParseError(f"{name}() takes exactly one query")
            strat = {"_FI1": "fiseq", "_FI2": "postings",
                     "_ident": "ident"}[name]
            return Force(args[0][1], strat)
        if name == "rmatch":
            # rmatch(q1, q2, ...) — XFRelations.java:152: one or more
            # queries, same-span AND with unique relations
            if not args:
                raise ParseError(
                    "rmatch() requires one or more queries")
            clauses = tuple(v if kind == "q" else _word_pattern(v)
                            for kind, v in args)
            return RMatch(clauses)
        if name == "rcapture":
            # rcapture(query[, captureAs[, relationType]])
            if not args:
                raise ParseError("rcapture() requires at least a query")
            clause = (args[0][1] if args[0][0] == "q"
                      else _word_pattern(args[0][1]))
            return RCapture(clause,
                            s_arg(1, "captured_rels", "a capture name"),
                            s_arg(2, None, "a relation type"))
        if name == "rcapture2":
            # rcapture2(query, toCapture[, captureAs[, relationType]])
            # — XFRelations.rcaptureWithinCapture
            if len(args) < 2:
                raise ParseError(
                    "rcapture2() requires a query and the capture "
                    "group to search within")
            clause = (args[0][1] if args[0][0] == "q"
                      else _word_pattern(args[0][1]))
            return RCapture(clause,
                            s_arg(2, "captured_rels", "a capture name"),
                            s_arg(3, None, "a relation type"),
                            within=s_arg(1, what="a capture group"))
        # rspan(query, spanMode) / rfield(query, field)
        if len(args) != 2:
            raise ParseError(f"{name}() takes (query, "
                             f"{'span mode' if name == 'rspan' else 'field'})")
        clause = (args[0][1] if args[0][0] == "q"
                  else _word_pattern(args[0][1]))
        if name == "rfield":
            return RField(clause, s_arg(1, what="a field name"))
        return RSpan(clause, s_arg(1, what="a span mode"))


def parse_with_settings(query: str,
                        sensitivity: str | None = None
                        ) -> tuple[Pattern, dict]:
    """Parse a CQL-lite query, consuming leading ``@key=value``
    settings tokens (reference: textpattern/TextPatternSettings.java:17
    — per-query SearchSettings passthrough). Values parse as int when
    they look like one. ``sensitivity`` overrides the default word
    layer for bare values (index.setDefaultMatchSensitivity analog:
    one of word/word_s/word_ci/word_di). Returns (pattern,
    settings dict)."""
    global _DEFAULT_LAYER
    toks = _lex(query)
    settings: dict = {}
    while toks and toks[0].startswith("@") and "=" in toks[0]:
        k, v = toks.pop(0)[1:].split("=", 1)
        settings[k] = int(v) if re.fullmatch(r"-?\d+", v) else v
    if not toks:
        raise ParseError("empty query")
    if sensitivity is not None and sensitivity not in (
            "word", "word_s", "word_ci", "word_di"):
        raise ParseError(f"unknown sensitivity layer {sensitivity!r}")
    prev = _DEFAULT_LAYER
    _DEFAULT_LAYER = sensitivity or "word"
    try:
        p = _Parser(toks)
        node = p.query()
        if p.peek() is not None:
            raise ParseError(f"trailing input: {p.toks[p.i:]}")
    finally:
        _DEFAULT_LAYER = prev
    return node, settings


def parse(query: str, sensitivity: str | None = None) -> Pattern:
    """Parse a CQL-lite query string into a Pattern AST."""
    return parse_with_settings(query, sensitivity)[0]
