"""Randomized differential CQL testing: generated patterns vs a
brute-force span oracle.

The reference's parser/engine correctness rests on a large corpus of
hand-picked queries (engine/src/test/java/nl/inl/blacklab/search/
TestSearches.java); this file complements our hand-picked suite the
same way QuickCheck complements unit tests — a seeded generator emits
random pattern ASTs (term / regex / any-token / negated-token /
pos-layer / lemma-layer / bracket-boolean leaves; sequence,
alternation, bounded & unbounded repetition, within / containing /
overlap combinators), renders each to CQL-lite surface syntax, and
asserts the engine's span set over the tiny corpus equals a
dynamic-programming matcher evaluated directly on the oracle's token
lists.

Seeds are pytest parameters, so a failure reproduces deterministically
(`pytest "tests/test_property_cql.py::test_random_pattern[17]"`) with
the offending CQL string in the assertion message — no hypothesis
shrinking against a live SparkSession needed.

Bugs found by this harness so far (fixed in plans/rewrite.py):
empty-matchable Or/Capture/Seq clauses inside sequences escaping
EmptyClauseAlts, and the unsound (A{a,b}){c,d} → A{ac,bd} merge for
non-contiguous count ranges.
"""

from __future__ import annotations

import random
import re

import pytest

from blacklab_spark.annotations import py_lemma_stem, py_pos_tag
from blacklab_spark.plans.executor import find

# drawn from the tiny corpus's head vocabulary + one absent term, so
# generated queries hit the full selectivity range (stopword 'the',
# mid-frequency content words, zero-df 'zzzmissing').
VOCAB = ["the", "a", "and", "you", "visa", "very", "good",
         "application", "search", "python", "please", "zzzmissing"]
POS_TAGS = ["func", "noun", "verb", "num"]
LAYERS = ["word", "pos", "lemma"]


def _layer_value(rng: random.Random, layer: str) -> str:
    if layer == "pos":
        return rng.choice(POS_TAGS)
    if layer == "lemma":
        return py_lemma_stem(rng.choice(VOCAB))
    return rng.choice(VOCAB)


# ---------------- AST: generation ----------------

def _leaf(rng: random.Random):
    r = rng.random()
    if r < 0.35:
        return ("term", rng.choice(VOCAB))
    if r < 0.47:
        return ("any",)
    if r < 0.57:
        return ("neg", rng.choice(VOCAB))
    if r < 0.67:
        w = rng.choice([w for w in VOCAB if len(w) >= 3])
        if rng.random() < 0.5:
            i = rng.randrange(len(w))
            pat = w[:i] + "." + w[i + 1:]
        else:
            pat = w[:rng.randrange(2, len(w))] + ".*"
        return ("rx", pat)
    if r < 0.77:
        return ("pos", rng.choice(POS_TAGS))
    if r < 0.84:
        return ("lemma", py_lemma_stem(rng.choice(VOCAB)))
    # bracket boolean over two single-token tests on random layers
    op = rng.choice(["&", "|"])
    tests = tuple((ly, _layer_value(rng, ly), rng.choice(["=", "!="]))
                  for ly in (rng.choice(LAYERS), rng.choice(LAYERS)))
    return ("bool", op, tests)


def _minlen(node) -> int:
    t = node[0]
    if t in ("term", "any", "neg", "rx", "pos", "lemma", "bool"):
        return 1
    if t == "seq":
        return sum(_minlen(k) for k in node[1])
    if t == "or":
        return min(_minlen(k) for k in node[1])
    if t == "pf":
        return 1 if node[3] == "overlap" else _minlen(node[1])
    if t == "lenand":
        return max(_minlen(node[1]), node[2])
    return node[2] * _minlen(node[1])  # rep


def _gen(rng: random.Random, depth: int):
    if depth == 0:
        return _leaf(rng)
    r = rng.random()
    if r < 0.30:
        if rng.random() < 0.2:
            # identical neighbours — the CCRepetition merge shape
            k = _gen(rng, depth - 1)
            return ("seq", (k, k))
        return ("seq", tuple(_gen(rng, depth - 1)
                              for _ in range(rng.randint(2, 3))))
    if r < 0.48:
        return ("or", tuple(_gen(rng, depth - 1) for _ in range(2)))
    if r < 0.70:
        kid = _gen(rng, depth - 1)
        if _minlen(kid) == 0:
            # repetition over a possibly-empty clause is degenerate
            # (a* where a is itself optional); neither engine nor
            # oracle should have to define it — regenerate as a leaf.
            kid = _leaf(rng)
        c = rng.random()
        if c < 0.30:
            m, mx = 0, 1          # ?
        elif c < 0.50:
            m, mx = 1, None       # +
        elif c < 0.65:
            m, mx = 0, None       # *
        elif c < 0.80:
            m, mx = rng.randint(1, 2), None   # {m,}
        else:
            m = rng.randint(1, 2)
            mx = m + rng.randint(0, 2)        # {m,n}
        return ("rep", kid, m, mx)
    if r < 0.82:
        a, b = _gen(rng, depth - 1), _gen(rng, depth - 1)
        if _minlen(a) == 0:
            a = _leaf(rng)
        if _minlen(b) == 0:
            b = _leaf(rng)
        return ("pf", a, b, rng.choice(["within", "containing",
                                        "overlap"]))
    if r < 0.90:
        # same-span AND with an all-token clause — the
        # NGramsToLengthFilter shape (A & []{m,n})
        inner = _gen(rng, depth - 1)
        if _minlen(inner) == 0:
            inner = _leaf(rng)
        m = rng.randint(1, 3)
        mx = None if rng.random() < 0.3 else m + rng.randint(0, 2)
        return ("lenand", inner, m, mx)
    return _leaf(rng)


def gen_pattern(seed: int):
    """Top-level pattern for one seed; guaranteed non-empty-matchable
    (a pattern whose every alternative can match zero tokens has no
    defined hit set)."""
    rng = random.Random(seed)
    node = _gen(rng, rng.randint(1, 3))
    if _minlen(node) == 0:
        node = ("seq", (("term", rng.choice(VOCAB)), node))
    return node


# ---------------- AST: render to CQL-lite ----------------

_SUFFIX = {(0, 1): "?", (1, None): "+", (0, None): "*"}


def render(node, parenthesize: bool = False) -> str:
    t = node[0]
    if t == "term":
        return f'"{node[1]}"'
    if t == "any":
        return "[]"
    if t == "neg":
        return f'[word!="{node[1]}"]'
    if t == "rx":
        return f'[word="{node[1]}"]'
    if t in ("pos", "lemma"):
        return f'[{t}="{node[1]}"]'
    if t == "bool":
        op, tests = node[1], node[2]
        return "[" + f" {op} ".join(f'{ly}{o}"{v}"'
                                    for ly, v, o in tests) + "]"
    if t == "seq":
        s = " ".join(render(k, parenthesize=(k[0] in ("or", "pf",
                                                      "lenand")))
                     for k in node[1])
    elif t == "or":
        s = " | ".join(render(k, parenthesize=(k[0] in ("pf",
                                                        "lenand")))
                       for k in node[1])
    elif t == "pf":
        # both sides fully parenthesized: within/containing bind
        # loosest, so a composite operand would otherwise swallow the
        # rest of the query
        s = (f"({render(node[1])}) {node[3]} ({render(node[2])})")
    elif t == "lenand":
        _, inner, m, mx = node
        rng_s = f"{{{m},}}" if mx is None else f"{{{m},{mx}}}"
        s = f"({render(inner)}) & []{rng_s}"
    else:  # rep
        kid, m, mx = node[1], node[2], node[3]
        base = render(kid,
                      parenthesize=kid[0] in ("seq", "or", "rep", "pf",
                                              "lenand"))
        suf = _SUFFIX.get((m, mx))
        if suf is None:
            suf = f"{{{m},}}" if mx is None else f"{{{m},{mx}}}"
        return base + suf
    return f"({s})" if parenthesize else s


# ---------------- brute-force span oracle ----------------

def _lemma_values(tok: str) -> tuple:
    """Stacked lemma values, mirroring annotations.lemma_values:
    [token] when the stem equals the token, else [token, stem]."""
    s = py_lemma_stem(tok)
    return (tok,) if s == tok else (tok, s)


def _tok_ok(test, tok: str) -> bool:
    layer, value, op = test
    if layer == "pos":
        hit = py_pos_tag(tok) == value
    elif layer == "lemma":
        # multi-value layer: equality = any stacked value matches
        hit = value in _lemma_values(tok)
    else:
        hit = tok == value
    return hit if op == "=" else not hit


def _ends(node, toks: list[str], start: int, memo: dict) -> set[int]:
    """All positions where ``node`` can finish a match beginning at
    ``start`` (half-open spans). Pure recursive DP — no cleverness, so
    it is trustworthy as a referee."""
    key = (node, start)
    if key in memo:
        return memo[key]
    t = node[0]
    n = len(toks)
    out: set[int]
    if t == "term":
        out = {start + 1} if start < n and toks[start] == node[1] else set()
    elif t == "any":
        out = {start + 1} if start < n else set()
    elif t == "neg":
        out = {start + 1} if start < n and toks[start] != node[1] else set()
    elif t == "rx":
        rx = re.compile(node[1])
        out = ({start + 1} if start < n and rx.fullmatch(toks[start])
               else set())
    elif t == "pos":
        out = ({start + 1}
               if start < n and py_pos_tag(toks[start]) == node[1]
               else set())
    elif t == "lemma":
        out = ({start + 1}
               if start < n and node[1] in _lemma_values(toks[start])
               else set())
    elif t == "bool":
        op, tests = node[1], node[2]
        comb = all if op == "&" else any
        out = ({start + 1}
               if start < n and comb(_tok_ok(ts, toks[start])
                                     for ts in tests)
               else set())
    elif t == "seq":
        cur = {start}
        for k in node[1]:
            cur = set().union(*(_ends(k, toks, s, memo) for s in cur)) \
                if cur else set()
        out = cur
    elif t == "or":
        out = set().union(*(_ends(k, toks, start, memo) for k in node[1]))
    elif t in ("pf", "lenand"):
        out = {e for (s, e) in _spans_node(node, toks, memo) if s == start}
    else:
        # rep: expand count-by-count; no cross-count frontier pruning
        # (a position reachable at several counts must still be
        # collected at the first count >= m). Terminates: every rep
        # consumes >= 1 token.
        kid, m, mx = node[1], node[2], node[3]
        out = {start} if m == 0 else set()
        frontier = {start}
        limit = mx if mx is not None else (n - start)
        i = 0
        while frontier and i < limit:
            i += 1
            frontier = set().union(*(_ends(kid, toks, s, memo)
                                     for s in frontier))
            if i >= m:
                out |= frontier
    memo[key] = out
    return out


def _spans_node(node, toks: list[str], memo: dict):
    """Full span set of ``node`` over one token list. Position filters
    and overlap are evaluated here (they relate two global span sets,
    not a single start position)."""
    key = ("SPANS", node)
    if key in memo:
        return memo[key]
    t = node[0]
    if t == "lenand":
        _, inner, m, mx = node
        out = {(s, e) for (s, e) in _spans_node(inner, toks, memo)
               if e - s >= m and (mx is None or e - s <= mx)}
        memo[key] = out
        return out
    if t == "pf":
        A = _spans_node(node[1], toks, memo)
        B = _spans_node(node[2], toks, memo)
        kind = node[3]
        if kind == "within":
            out = {(s, e) for (s, e) in A
                   if any(bs <= s and e <= be for (bs, be) in B)}
        elif kind == "containing":
            out = {(s, e) for (s, e) in A
                   if any(s <= bs and be <= e for (bs, be) in B)}
        else:  # overlap: emit the intersection region per pair
            out = {(max(s, bs), min(e, be))
                   for (s, e) in A for (bs, be) in B
                   if s < be and bs < e}
    else:
        out = {(s, e) for s in range(len(toks))
               for e in _ends(node, toks, s, memo) if e > s}
    memo[key] = out
    return out


def oracle_spans(node, tokens_by_doc: dict[int, list[str]]):
    got = set()
    for doc_id, toks in tokens_by_doc.items():
        for s, e in _spans_node(node, toks, {}):
            got.add((doc_id, s, e))
    return got


# ---------------- rewrite-level regression (no Spark) ----------------

def _no_liftable_empties(node) -> bool:
    """After rewrite, no Seq may retain an empty-matchable non-AnyToken
    child and no Or branch may be empty-matchable below a non-empty
    top level — the executor's 'possibly-empty pattern' guard fires on
    exactly those shapes."""
    from blacklab_spark.plans import query as Q
    from blacklab_spark.plans.rewrite import _matches_empty
    kids = []
    if isinstance(node, Q.Seq):
        for c in node.clauses:
            if not isinstance(c, Q.AnyToken) and _matches_empty(c):
                return False
        kids = list(node.clauses)
    elif isinstance(node, (Q.Or, Q.And)):
        kids = list(node.clauses)
    elif isinstance(node, Q.Rep):
        kids = [node.clause]
    elif isinstance(node, Q.Capture):
        kids = [node.clause]
    elif isinstance(node, Q.Expand):
        kids = [node.clause]
    elif isinstance(node, Q.LenFilter):
        kids = [node.clause]
    elif isinstance(node, Q.PosFilter):
        kids = [node.producer, node.filter]
    return all(_no_liftable_empties(k) for k in kids)


@pytest.mark.parametrize("cql", [
    '[word!="you"]* [] "visa"',                 # Rep{0,} buried in Expand
    '"zzzmissing" ("good"? | [] "search")',     # Or with optional branch
    '"a" x:("b"?) "c"',                         # Capture over optional
    '"a" ("b"? "c"?) "d"',                      # Seq of optionals
    '"a" ("b" "c"){0,2}',                       # trailing group rep
    '"application" [word!="the"]{2,}?',         # non-mergeable Rep(Rep)
    '"a" ([]{2,2})?',                           # non-mergeable Rep(Any)
])
def test_rewrite_lifts_empty_clauses(cql):
    from blacklab_spark.plans.parser import parse
    from blacklab_spark.plans.rewrite import rewrite
    ast = rewrite(parse(cql))
    assert _no_liftable_empties(ast), f"{cql!r} rewrote to {ast!r}"


def test_nonempty_seq_of_optionals():
    """nonempty(A? B?) = A?B | B-only alternatives — exact span check
    via the oracle matcher on a hand token list."""
    node = ("seq", (("term", "x"),
                    ("rep", ("term", "a"), 0, 1),
                    ("rep", ("term", "b"), 0, 1)))
    toks = ["x", "a", "b", "x", "b", "x"]
    want = {(0, 1), (0, 2), (0, 3), (3, 4), (3, 5), (5, 6)}
    got = {(s, e) for s in range(len(toks))
           for e in _ends(node, toks, s, {}) if e > s}
    assert got == want


# ---------------- global-constraint fuzzing ----------------
# The `:: ...` machinery has three physical paths (constant-fold to a
# postings phrase, join-free all-any-token scan, forward-index join) —
# the generator's leaf mix drives all three against one oracle.

_ORDERED = ("=", "!=", ">=", "<=", ">", "<")


def _c_leaf(rng: random.Random):
    r = rng.random()
    if r < 0.40:
        return ("any",)
    if r < 0.65:
        return ("term", rng.choice(VOCAB))
    if r < 0.85:
        return ("pos", rng.choice(POS_TAGS))
    return ("neg", rng.choice(VOCAB))


def _gen_cmp(rng: random.Random, labels: list[str]):
    r = rng.random()
    if r < 0.5 and len(labels) >= 2:
        l1, l2 = rng.sample(labels, 2)
        layer = rng.choice(LAYERS)
        if rng.random() < 0.2 and layer != "lemma":
            # lexicographic on strings; undefined (engine raises) on
            # the multi-value lemma layer
            op = rng.choice(_ORDERED)
        else:
            op = rng.choice(["=", "!="])
        return ("cmp", ("annot", l1, layer), op, ("annot", l2, layer))
    if r < 0.8:
        label = rng.choice(labels)
        layer = rng.choice(LAYERS)
        return ("cmp", ("annot", label, layer), rng.choice(["=", "!="]),
                ("str", _layer_value(rng, layer)))
    f1, f2 = rng.choice(["start", "end"]), rng.choice(["start", "end"])
    l1, l2 = rng.choice(labels), rng.choice(labels)
    return ("cmp", ("posfn", f1, l1), rng.choice(_ORDERED),
            ("posfn", f2, l2))


def _gen_filter(rng: random.Random, labels: list[str], depth: int):
    if depth <= 0:
        return _gen_cmp(rng, labels)
    r = rng.random()
    if r < 0.5:
        return ("cbool", rng.choice(["&", "|", "->"]),
                _gen_filter(rng, labels, depth - 1),
                _gen_filter(rng, labels, depth - 1))
    if r < 0.65:
        return ("cnot", _gen_filter(rng, labels, depth - 1))
    return _gen_cmp(rng, labels)


def gen_constraint_query(seed: int):
    rng = random.Random(seed + 77_777)
    k = rng.randint(2, 4)
    names = iter("ABCD")
    elems = []          # (capture-name | None, leaf) — all width 1
    for i in range(k):
        cap = next(names) if (i < 2 or rng.random() < 0.5) else None
        elems.append((cap, _c_leaf(rng)))
    labels = [c for c, _ in elems if c]
    filt = _gen_filter(rng, labels, rng.randint(0, 2))
    return elems, filt


def _render_cval(v, rng_bare: bool = False) -> str:
    if v[0] == "str":
        return f'"{v[1]}"'
    if v[0] == "posfn":
        return f"{v[1]}({v[2]})"
    label, layer = v[1], v[2]
    if layer == "word":
        return label if rng_bare else f"{label}.word"
    return f"{label}.{layer}"


def _render_filter(c) -> str:
    t = c[0]
    if t == "cmp":
        # bare label ≡ label.word (MatchFilterTokenAnnotation default)
        bare = c[1][0] == "annot" and c[3][0] == "str"
        return (f"{_render_cval(c[1], rng_bare=bare)} {c[2]} "
                f"{_render_cval(c[3])}")
    if t == "cnot":
        return f"!({_render_filter(c[1])})"
    return f"({_render_filter(c[2])}) {c[1]} ({_render_filter(c[3])})"


def render_constraint(elems, filt) -> str:
    parts = []
    for cap, leaf in elems:
        body = render(leaf)
        parts.append(f"{cap}:{body}" if cap else body)
    return " ".join(parts) + " :: " + _render_filter(filt)


def _cval(v, env):
    """→ ('s', str), ('i', int) or ('m', frozenset) — 'm' is a
    multi-value (lemma) position. env: label → (pos, token)."""
    if v[0] == "str":
        return ("s", v[1])
    if v[0] == "posfn":
        pos, _tok = env[v[2]]
        return ("i", pos if v[1] == "start" else pos + 1)
    _pos, tok = env[v[1]]
    layer = v[2]
    if layer == "pos":
        return ("s", py_pos_tag(tok))
    if layer == "lemma":
        return ("m", frozenset(_lemma_values(tok)))
    return ("s", tok)


def _ceval(c, env) -> bool:
    t = c[0]
    if t == "cmp":
        (ka, a), (kb, b) = _cval(c[1], env), _cval(c[3], env)
        op = c[2]
        if ka == "m" or kb == "m":
            # multi-value equality: any value in common / contains
            if ka == "m" and kb == "m":
                eq = bool(a & b)
            elif ka == "m":
                eq = b in a
            else:
                eq = a in b
            return eq if op == "=" else not eq
        return {"=": a == b, "!=": a != b, ">=": a >= b,
                "<=": a <= b, ">": a > b, "<": a < b}[op]
    if t == "cnot":
        return not _ceval(c[1], env)
    op, a, b = c[1], c[2], c[3]
    if op == "&":
        return _ceval(a, env) and _ceval(b, env)
    if op == "|":
        return _ceval(a, env) or _ceval(b, env)
    return (not _ceval(a, env)) or _ceval(b, env)   # ->


def oracle_constraint_spans(elems, filt, tokens_by_doc):
    k = len(elems)
    got = set()
    for doc_id, toks in tokens_by_doc.items():
        for p in range(len(toks) - k + 1):
            ok = True
            env = {}
            for i, (cap, leaf) in enumerate(elems):
                tok = toks[p + i]
                lt = leaf[0]
                if lt == "term":
                    ok = tok == leaf[1]
                elif lt == "pos":
                    ok = py_pos_tag(tok) == leaf[1]
                elif lt == "neg":
                    ok = tok != leaf[1]
                else:
                    ok = True
                if not ok:
                    break
                if cap:
                    env[cap] = (p + i, tok)
            if ok and _ceval(filt, env):
                got.add((doc_id, p, p + k))
    return got


@pytest.mark.parametrize("seed", range(40))
def test_random_constraint(seed, tiny_engine, tiny_oracle):
    elems, filt = gen_constraint_query(seed)
    cql = render_constraint(elems, filt)
    got = {(r["doc_id"], r["start"], r["end"]) for r in
           find(tiny_engine.index, cql)
           .select("doc_id", "start", "end").collect()}
    want = oracle_constraint_spans(elems, filt, tiny_oracle.tokens)
    assert got == want, (
        f"seed {seed}: query {cql!r}\n"
        f"  engine-only: {sorted(got - want)[:10]}\n"
        f"  oracle-only: {sorted(want - got)[:10]}")


# ---------------- the differential test ----------------

@pytest.mark.parametrize("seed", range(60))
def test_random_pattern(seed, tiny_engine, tiny_oracle):
    node = gen_pattern(seed)
    cql = render(node)
    rows = [(r["doc_id"], r["start"], r["end"]) for r in
            find(tiny_engine.index, cql)
            .select("doc_id", "start", "end").collect()]
    got = set(rows)
    want = oracle_spans(node, tiny_oracle.tokens)
    assert got == want, (
        f"seed {seed}: pattern {cql!r}\n"
        f"  engine-only: {sorted(got - want)[:10]}\n"
        f"  oracle-only: {sorted(want - got)[:10]}")
    # SpanGuarantees soundness (plans/guarantees.py, SURVEY §4.2):
    # claimed uniqueness and width bounds must hold on the observed
    # result of every generated pattern — this is what licenses the
    # executor's dropDuplicates elisions.
    from blacklab_spark.plans.guarantees import guarantees
    from blacklab_spark.plans.parser import parse
    from blacklab_spark.plans.rewrite import rewrite
    g = guarantees(rewrite(parse(cql)))
    if g.unique:
        assert len(rows) == len(got), (
            f"seed {seed}: {cql!r} claims unique but produced "
            f"{len(rows) - len(got)} duplicate rows")
    for d, s, e in rows:
        assert e - s >= g.len_min, (seed, cql, (d, s, e), g)
        if g.len_max is not None:
            assert e - s <= g.len_max, (seed, cql, (d, s, e), g)
