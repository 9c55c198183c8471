"""Randomized differential testing of the hit-property DSL
(sort_hits / group_hits) against a pure-Python evaluator.

For each seed: pick an anchor term, a random 1-2 key property spec
(hit / before:k / after:k / context:k / field:... / decade /
hitposition / length, each optionally '-' descending), then assert

* ``group_hits``: exact key-tuple → count equality with a Python
  Counter over the oracle's tokens/metadata;
* ``sort_hits``: the output is a permutation of the input hits AND its
  oracle-computed key sequence is monotone under the spec's
  asc/desc directions. Monotonicity (not positional equality) is the
  right contract: ties are unordered, and it keeps the oracle honest
  without reimplementing ICU — every generated key value here is
  ``[a-z0-9 ]*``, where ICU root primary order and byte order agree
  (asserted, so a vocabulary change fails loudly rather than silently
  weakening the check).
"""

from __future__ import annotations

import random
import re

import pytest

from blacklab_spark.operators.properties import group_hits, sort_hits

_ASCII_SORTABLE = re.compile(r"[a-z0-9 ]*\Z")

_ANCHORS = ["the", "a", "visa", "good", "application"]

# (key template, needs_k, textual)
_KEYS = [
    ("hit", False, True),
    ("before", True, True),
    ("after", True, True),
    ("context", True, True),
    ("field:role", False, False),
    ("field:conv_id", False, False),
    ("decade", False, False),
    ("hitposition", False, False),
    ("length", False, False),
]


def _gen_spec(rng: random.Random):
    nkeys = rng.randint(1, 2)
    keys = []
    for head, needs_k, textual in rng.sample(_KEYS, nkeys):
        key = f"{head}:{rng.randint(1, 3)}" if needs_k else head
        keys.append((key, rng.random() < 0.4, textual))
    spec = ",".join(("-" if desc else "") + key for key, desc, _ in keys)
    return spec, keys


def _py_key(key: str, oracle, doc_id: int, s: int, e: int):
    toks = oracle.tokens[doc_id]
    meta = oracle.meta[doc_id]
    head, *rest = key.split(":")
    k = int(rest[-1]) if rest and rest[-1].isdigit() else 1
    if head == "hit":
        return " ".join(toks[s:e])
    if head in ("before", "left"):
        i = s - k
        return toks[i] if i >= 0 else ""
    if head in ("after", "right"):
        i = e + k - 1
        return toks[i] if i < len(toks) else ""
    if head == "context":
        lo = max(0, s - k)
        return " ".join(toks[lo:e + k])
    if head == "field":
        return meta[rest[0]]
    if head == "decade":
        return (meta["ts"].year // 10) * 10
    if head == "hitposition":
        return s
    if head == "length":
        return e - s
    raise AssertionError(key)


@pytest.mark.parametrize("seed", range(30))
def test_random_property_spec(seed, tiny_engine, tiny_oracle):
    rng = random.Random(seed + 9_999)
    term = rng.choice(_ANCHORS)
    spec, keys = _gen_spec(rng)
    hits = tiny_engine.term_hits(term)
    hit_rows = [(r["doc_id"], r["start"], r["end"])
                for r in hits.select("doc_id", "start", "end").collect()]
    assert hit_rows, term

    def oracle_keys(row):
        return tuple(_py_key(key, tiny_oracle, *row) for key, _, _ in keys)

    # ---- grouping: exact counts ----
    from collections import Counter
    want_groups = Counter(oracle_keys(row) for row in hit_rows)
    got_groups = Counter()
    for r in group_hits(tiny_engine.index, hits, spec).collect():
        got_groups[tuple(r[f"key_{i}"] for i in range(len(keys)))] += \
            r["count"]
    assert got_groups == want_groups, f"{term!r} groupBy {spec!r}"

    # ---- sorting: permutation + oracle-monotone key sequence ----
    out = [(r["doc_id"], r["start"], r["end"])
           for r in sort_hits(tiny_engine.index, hits, spec).collect()]
    assert sorted(out) == sorted(hit_rows), f"{term!r} sort {spec!r}"
    seq = [oracle_keys(row) for row in out]
    for kv in seq:
        for v, (_, _, textual) in zip(kv, keys):
            if textual:
                assert _ASCII_SORTABLE.match(v), (
                    f"non-ASCII sort value {v!r}: the byte-order oracle "
                    "no longer matches ICU — extend the oracle")
    for prev, cur in zip(seq, seq[1:]):
        for pv, cv, (_, desc, _) in zip(prev, cur, keys):
            if pv == cv:
                continue
            if desc:
                assert pv > cv, f"{term!r} sort {spec!r}: {prev} !>= {cur}"
            else:
                assert pv < cv, f"{term!r} sort {spec!r}: {prev} !<= {cur}"
            break
