"""Randomized LuceneQL metadata-filter testing vs a Python evaluator.

Random filter trees over role / conv_id terms, ``*``/``?`` wildcards,
turn_idx ranges, and AND / OR / NOT with Lucene's precedence
(NOT > AND > OR, bare juxtaposition = the default OR operator) are
compiled by plans/luceneql.py to a Spark SQL predicate and executed on
doc_meta; the matched (conv_id, turn_idx) set must equal a direct
Python evaluation of the same tree over the oracle's metadata rows.
Rendering leaves composites UNparenthesized where precedence allows,
so the parser's precedence handling — not just leaf compilation — is
under test.
"""

from __future__ import annotations

import random
import re

import pytest

_ROLES = ["user", "assistant", "system", "nosuchrole"]


def _gen_leaf(rng: random.Random, convs: list[str]):
    r = rng.random()
    if r < 0.35:
        return ("t", "role", rng.choice(_ROLES))
    if r < 0.55:
        return ("t", "conv_id", rng.choice(convs))
    if r < 0.75:
        c = rng.choice(convs)
        n = rng.randrange(len(c))
        pat = c[:n] + "*" if rng.random() < 0.6 else \
            c[:n] + "?" + c[n + 1:]
        return ("w", "conv_id", pat)
    a = rng.randint(0, 6)
    return ("r", "turn_idx", a, a + rng.randint(0, 8),
            rng.random() < 0.7)      # inclusive?


def _gen(rng: random.Random, depth: int, convs):
    if depth == 0:
        return _gen_leaf(rng, convs)
    r = rng.random()
    if r < 0.25:
        return ("and", _gen(rng, depth - 1, convs),
                _gen(rng, depth - 1, convs))
    if r < 0.50:
        return ("or", _gen(rng, depth - 1, convs),
                _gen(rng, depth - 1, convs))
    if r < 0.62:
        return ("juxt", _gen(rng, depth - 1, convs),
                _gen(rng, depth - 1, convs))    # bare = default OR
    if r < 0.80:
        return ("not", _gen(rng, depth - 1, convs))
    return _gen_leaf(rng, convs)


def render(node, parent: str = "") -> str:
    t = node[0]
    if t == "t":
        return f"{node[1]}:{node[2]}"
    if t == "w":
        return f"{node[1]}:{node[2]}"
    if t == "r":
        lo, hi = ("[", "]") if node[4] else ("{", "}")
        return f"{node[1]}:{lo}{node[2]} TO {node[3]}{hi}"
    if t == "not":
        inner = render(node[1], "not")
        return f"NOT {inner}"
    op = {"and": " AND ", "or": " OR ", "juxt": " "}[t]
    s = render(node[1], t) + op + render(node[2], t)
    # parenthesize only where Lucene precedence (NOT > AND > OR/juxt)
    # would otherwise re-associate the tree
    needs = (parent == "not") or \
        (parent == "and" and t in ("or", "juxt"))
    return f"({s})" if needs else s


def _eval(node, meta) -> bool:
    t = node[0]
    if t == "t":
        return str(meta[node[1]]).lower() == node[2].lower()
    if t == "w":
        rx = re.escape(node[2].lower()).replace(r"\*", ".*") \
            .replace(r"\?", ".")
        return re.fullmatch(rx, str(meta[node[1]]).lower()) is not None
    if t == "r":
        v = int(meta[node[1]])
        return (node[2] <= v <= node[3]) if node[4] \
            else (node[2] < v < node[3])
    if t == "not":
        return not _eval(node[1], meta)
    if t == "and":
        return _eval(node[1], meta) and _eval(node[2], meta)
    return _eval(node[1], meta) or _eval(node[2], meta)   # or / juxt


@pytest.mark.parametrize("seed", range(30))
def test_random_lucene_filter(seed, tiny_engine, tiny_oracle):
    rng = random.Random(seed + 2_024)
    convs = sorted({m["conv_id"] for m in tiny_oracle.meta.values()})
    node = _gen(rng, rng.randint(1, 3), convs)
    q = render(node)
    got = {(r["conv_id"], r["turn_idx"]) for r in
           tiny_engine.docs(filter=q)
           .select("conv_id", "turn_idx").collect()}
    want = {(m["conv_id"], m["turn_idx"])
            for m in tiny_oracle.meta.values() if _eval(node, m)}
    assert got == want, f"seed {seed}: filter {q!r}"
