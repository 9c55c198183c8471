"""Randomized differential CQL testing: generated patterns vs a
brute-force span oracle.

The reference's parser/engine correctness rests on a large corpus of
hand-picked queries (engine/src/test/java/nl/inl/blacklab/search/
TestSearches.java); this file complements our hand-picked suite the
same way QuickCheck complements unit tests — a seeded generator emits
random pattern ASTs (term / regex / any-token / negated-token leaves;
sequence, alternation, bounded & unbounded repetition combinators),
renders each to CQL-lite surface syntax, and asserts the engine's span
set over the tiny corpus equals a dynamic-programming matcher evaluated
directly on the oracle's token lists.

Seeds are pytest parameters, so a failure reproduces deterministically
(`pytest "tests/test_property_cql.py::test_random_pattern[17]"`) with
the offending CQL string in the assertion message — no hypothesis
shrinking against a live SparkSession needed.
"""

from __future__ import annotations

import random
import re

import pytest

from blacklab_spark.plans.executor import find

# drawn from the tiny corpus's head vocabulary + one absent term, so
# generated queries hit the full selectivity range (stopword 'the',
# mid-frequency content words, zero-df 'zzzmissing').
VOCAB = ["the", "a", "and", "you", "visa", "very", "good",
         "application", "search", "python", "please", "zzzmissing"]


# ---------------- AST: generation ----------------

def _leaf(rng: random.Random):
    r = rng.random()
    if r < 0.45:
        return ("term", rng.choice(VOCAB))
    if r < 0.60:
        return ("any",)
    if r < 0.75:
        return ("neg", rng.choice(VOCAB))
    w = rng.choice([w for w in VOCAB if len(w) >= 3])
    if rng.random() < 0.5:
        i = rng.randrange(len(w))
        pat = w[:i] + "." + w[i + 1:]
    else:
        pat = w[:rng.randrange(2, len(w))] + ".*"
    return ("rx", pat)


def _minlen(node) -> int:
    t = node[0]
    if t in ("term", "any", "neg", "rx"):
        return 1
    if t == "seq":
        return sum(_minlen(k) for k in node[1])
    if t == "or":
        return min(_minlen(k) for k in node[1])
    return node[2] * _minlen(node[1])  # rep


def _gen(rng: random.Random, depth: int):
    if depth == 0:
        return _leaf(rng)
    r = rng.random()
    if r < 0.35:
        return ("seq", [_gen(rng, depth - 1)
                        for _ in range(rng.randint(2, 3))])
    if r < 0.55:
        return ("or", [_gen(rng, depth - 1) for _ in range(2)])
    if r < 0.80:
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
    return _leaf(rng)


def gen_pattern(seed: int):
    """Top-level pattern for one seed; guaranteed non-empty-matchable
    (a pattern whose every alternative can match zero tokens has no
    defined hit set)."""
    rng = random.Random(seed)
    node = _gen(rng, rng.randint(1, 3))
    if _minlen(node) == 0:
        node = ("seq", [("term", rng.choice(VOCAB)), node])
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
    if t == "seq":
        s = " ".join(render(k, parenthesize=(k[0] == "or"))
                     for k in node[1])
    elif t == "or":
        s = " | ".join(render(k) for k in node[1])
    else:  # rep
        kid, m, mx = node[1], node[2], node[3]
        base = render(kid, parenthesize=kid[0] in ("seq", "or", "rep"))
        suf = _SUFFIX.get((m, mx))
        if suf is None:
            suf = f"{{{m},}}" if mx is None else f"{{{m},{mx}}}"
        return base + suf
    return f"({s})" if parenthesize else s


# ---------------- brute-force span oracle ----------------

def _ends(node, toks: list[str], start: int) -> set[int]:
    """All positions where ``node`` can finish a match beginning at
    ``start`` (half-open spans). Pure recursive DP — no cleverness, so
    it is trustworthy as a referee."""
    t = node[0]
    n = len(toks)
    if t == "term":
        return {start + 1} if start < n and toks[start] == node[1] else set()
    if t == "any":
        return {start + 1} if start < n else set()
    if t == "neg":
        return {start + 1} if start < n and toks[start] != node[1] else set()
    if t == "rx":
        rx = re.compile(node[1])
        return ({start + 1} if start < n and rx.fullmatch(toks[start])
                else set())
    if t == "seq":
        cur = {start}
        for k in node[1]:
            cur = set().union(*(_ends(k, toks, s) for s in cur)) if cur \
                else set()
        return cur
    if t == "or":
        return set().union(*(_ends(k, toks, start) for k in node[1]))
    # rep: expand count-by-count; no cross-count frontier pruning (a
    # position reachable at several counts must still be collected at
    # the first count >= m). Terminates: every rep consumes >=1 token.
    kid, m, mx = node[1], node[2], node[3]
    out = {start} if m == 0 else set()
    frontier = {start}
    limit = mx if mx is not None else (n - start)
    i = 0
    while frontier and i < limit:
        i += 1
        frontier = set().union(*(_ends(kid, toks, s) for s in frontier))
        if i >= m:
            out |= frontier
    return out


def oracle_spans(node, tokens_by_doc: dict[int, list[str]]):
    got = set()
    for doc_id, toks in tokens_by_doc.items():
        for s in range(len(toks)):
            for e in _ends(node, toks, s):
                if e > s:
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
    node = ("seq", [("term", "x"),
                    ("rep", ("term", "a"), 0, 1),
                    ("rep", ("term", "b"), 0, 1)])
    toks = ["x", "a", "b", "x", "b", "x"]
    want = {(0, 1), (0, 2), (0, 3), (3, 4), (3, 5), (5, 6)}
    got = {(s, e) for s in range(len(toks))
           for e in _ends(node, toks, s) if e > s}
    assert got == want


# ---------------- the differential test ----------------

@pytest.mark.parametrize("seed", range(60))
def test_random_pattern(seed, tiny_engine, tiny_oracle):
    node = gen_pattern(seed)
    cql = render(node)
    got = {(r["doc_id"], r["start"], r["end"]) for r in
           find(tiny_engine.index, cql)
           .select("doc_id", "start", "end").collect()}
    want = oracle_spans(node, tiny_oracle.tokens)
    assert got == want, (
        f"seed {seed}: pattern {cql!r}\n"
        f"  engine-only: {sorted(got - want)[:10]}\n"
        f"  oracle-only: {sorted(want - got)[:10]}")
