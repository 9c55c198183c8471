"""Span-algebra operators vs brute-force Python reference on the tiny
fixture — mirrors the reference's MockSpans unit tests
(engine/src/test/java/.../TestSpanQueryAnd.java etc., SURVEY.md §5.1)."""

import re

import pytest
from pyspark.sql import functions as F

from blacklab_spark.operators import spans as S


def hits_of(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in
                  df.select("doc_id", "start", "end").collect())


def oracle_term(o, t):
    return sorted((d, p, p + 1) for d, ps in o.postings.get(t, {}).items()
                  for p in ps)


@pytest.fixture(scope="module")
def idx(tiny_engine):
    return tiny_engine.index


def test_term(idx, tiny_oracle):
    assert hits_of(S.term(idx, "visa")) == oracle_term(tiny_oracle, "visa")


def test_regex_terms(idx, tiny_oracle):
    pat = "vi.a|go.d"
    rx = re.compile(f"^(?:{pat})$")
    expected = sorted(h for t in tiny_oracle.postings if rx.match(t)
                      for h in oracle_term(tiny_oracle, t))
    assert hits_of(S.regex_terms(idx, pat)) == expected


def test_any_token_ngrams(idx, tiny_oracle):
    expected = sorted((d, s, s + w)
                      for d in tiny_oracle.doc_ids
                      for w in (2, 3)
                      for s in range(tiny_oracle.dl[d] - w + 1))
    assert hits_of(S.any_token(idx, 2, 3)) == expected


def test_no_hits_and_fixed_span(idx, tiny_oracle):
    assert hits_of(S.no_hits(idx)) == []
    expected = sorted((d, 2, 5) for d in tiny_oracle.doc_ids
                      if tiny_oracle.dl[d] >= 5)
    assert hits_of(S.fixed_span(idx, 2, 5)) == expected


def test_or_and_andnot_not(idx, tiny_oracle):
    a, b = S.term(idx, "the"), S.term(idx, "a")
    ta, tb = oracle_term(tiny_oracle, "the"), oracle_term(tiny_oracle, "a")
    assert hits_of(S.or_(a, b)) == sorted(ta + tb)
    assert hits_of(S.and_(a, b)) == sorted(set(ta) & set(tb))  # disjoint → []
    assert hits_of(S.and_(a, a)) == sorted(set(ta))
    assert hits_of(S.and_not(S.or_(a, b), b)) == sorted(set(ta) - set(tb))
    # NOT: all single tokens that are not 'the'
    expected = sorted((d, p, p + 1) for d in tiny_oracle.doc_ids
                      for p in range(tiny_oracle.dl[d])
                      if (d, p, p + 1) not in set(ta))
    assert hits_of(S.not_(idx, a)) == expected


def test_sequence_adjacent(idx, tiny_oracle):
    got = hits_of(S.sequence(S.term(idx, "very"), S.term(idx, "good")))
    expected = sorted(
        (d, p, p + 2) for d, ps in tiny_oracle.postings.get("very", {}).items()
        for p in ps if p + 1 in tiny_oracle.postings.get("good", {}).get(d, []))
    assert got == expected and len(got) > 0


def test_sequence_with_gap(idx, tiny_oracle):
    got = hits_of(S.sequence(S.term(idx, "visa"), S.term(idx, "good"),
                             min_gap=0, max_gap=3))
    expected = set()
    for d, ps in tiny_oracle.postings.get("visa", {}).items():
        goods = tiny_oracle.postings.get("good", {}).get(d, [])
        for p in ps:
            for g in goods:
                if p + 1 <= g <= p + 4:
                    expected.add((d, p, g + 1))
    assert got == sorted(expected)


def test_expand(idx, tiny_oracle):
    base = S.term(idx, "visa")
    got = hits_of(S.expand(idx, base, "right", 1, 2))
    expected = sorted({(d, p, p + 1 + amt)
                       for d, ps in tiny_oracle.postings.get("visa", {}).items()
                       for p in ps for amt in (1, 2)
                       if p + 1 + amt <= tiny_oracle.dl[d]})
    assert got == expected
    got_l = hits_of(S.expand(idx, base, "left", 1, 1))
    expected_l = sorted({(d, p - 1, p + 1)
                         for d, ps in tiny_oracle.postings.get("visa", {}).items()
                         for p in ps if p >= 1})
    assert got_l == expected_l


def test_repetition(idx, tiny_oracle):
    got = hits_of(S.repetition(S.term(idx, "the"), 2, 3))
    ts = {d: set(ps) for d, ps in tiny_oracle.postings.get("the", {}).items()}
    expected = set()
    for d, ps in ts.items():
        for p in ps:
            if p + 1 in ps:
                expected.add((d, p, p + 2))
                if p + 2 in ps:
                    expected.add((d, p, p + 3))
    assert got == sorted(expected) and len(got) > 0


def _windows(o, d, w):
    return [(d, s, s + w) for s in range(o.dl[d] - w + 1)]


def test_position_filters(idx, tiny_oracle):
    big = S.any_token(idx, 3, 3)          # all 3-grams
    visa = S.term(idx, "visa")
    tv = set(oracle_term(tiny_oracle, "visa"))
    all3 = [h for d in tiny_oracle.doc_ids
            for h in _windows(tiny_oracle, d, 3)]
    # containing: 3-grams containing a 'visa' token
    expected_c = sorted({(d, s, e) for (d, s, e) in all3
                         if any(dv == d and s <= sv and ev <= e
                                for (dv, sv, ev) in tv)})
    assert hits_of(S.containing(big, visa)) == expected_c
    # within: 'visa' tokens within some 3-gram (i.e. doc length ≥ 3)
    expected_w = sorted({h for h in tv
                         if tiny_oracle.dl[h[0]] >= 3})
    assert hits_of(S.within(visa, big)) == expected_w
    # inverted containing
    expected_nc = sorted(set(map(tuple, all3)) - set(expected_c))
    assert hits_of(S.containing(big, visa, invert=True)) == expected_nc
    # matches / starts_at / ends_at
    two = S.any_token(idx, 2, 2)
    seq = S.sequence(S.term(idx, "very"), S.term(idx, "good"))
    sq = set(hits_of(seq))
    assert hits_of(S.matches(seq, two)) == sorted(sq)
    assert hits_of(S.starts_at(S.term(idx, "very"), seq)) == \
        sorted({(d, s, s + 1) for (d, s, e) in sq})
    assert hits_of(S.ends_at(S.term(idx, "good"), seq)) == \
        sorted({(d, e - 1, e) for (d, s, e) in sq})


def test_overlapping(idx, tiny_oracle):
    a = S.expand(idx, S.term(idx, "visa"), "right", 2, 2)  # visa + 2
    b = S.expand(idx, S.term(idx, "good"), "left", 1, 1)
    ah, bh = hits_of(a), hits_of(b)
    expected = sorted({(d, max(s1, s2), min(e1, e2))
                       for (d, s1, e1) in ah for (d2, s2, e2) in bh
                       if d == d2 and s1 < e2 and s2 < e1})
    assert hits_of(S.overlapping(a, b)) == expected


def test_edge_unique_length(idx, tiny_oracle):
    seq = S.sequence(S.term(idx, "very"), S.term(idx, "good"))
    sq = hits_of(seq)
    assert hits_of(S.edge(seq)) == sorted({(d, s, s) for d, s, e in sq})
    assert hits_of(S.edge(seq, trailing=True)) == \
        sorted({(d, e, e) for d, s, e in sq})
    dup = S.or_(seq, seq)
    assert hits_of(S.unique(dup)) == sorted(set(sq))
    grams = S.any_token(idx, 1, 3)
    assert hits_of(S.filter_by_length(grams, 2, 2)) == \
        hits_of(S.any_token(idx, 2, 2))


def test_filter_by_docs(idx, tiny_oracle):
    docs = idx.doc_meta.filter(F.col("role") == "assistant")
    allowed = {d for d in tiny_oracle.doc_ids
               if tiny_oracle.meta[d]["role"] == "assistant"}
    expected = sorted(h for h in oracle_term(tiny_oracle, "visa")
                      if h[0] in allowed)
    assert hits_of(S.filter_by_docs(S.term(idx, "visa"), docs)) == expected


def test_capture_and_constraint(idx, tiny_oracle):
    """X:[] Y:[] :: X.word = Y.word — adjacent token pairs with equal
    words (SpanQueryConstrained.java:25 analog)."""
    a = S.capture(S.any_token(idx, 1, 1), "A")
    b = S.capture(S.any_token(idx, 1, 1), "B")
    seq = S.sequence_keep_info(a, b)
    out = S.constrained(
        idx, seq, S.capture_token("A") == S.capture_token("B"))
    got = hits_of(out)
    expected = sorted((d, p, p + 2)
                      for d in tiny_oracle.doc_ids
                      for p in range(tiny_oracle.dl[d] - 1)
                      if tiny_oracle.tokens[d][p] == tiny_oracle.tokens[d][p + 1])
    assert got == expected and len(got) > 0


def test_sensitivity_layers(spark, tmp_path):
    """@s vs @i term search on a mixed-case corpus (SURVEY §1.1;
    reference MatchSensitivity.java:12-17)."""
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.index import open_index
    import datetime as dt
    rows = [("c0", 0, "user", "Visa visa VISA application", None,
             dt.datetime(2025, 1, 1)),
            ("c0", 1, "assistant", "the Visa office", None,
             dt.datetime(2025, 1, 1, 0, 1))]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = str(tmp_path / "sens")
    build_index(spark, df, out, BuildConfig(num_partitions=1))
    idx = open_index(spark, out)
    insens = hits_of(S.term(idx, "visa"))              # all case variants
    assert insens == [(0, 0, 1), (0, 1, 2), (0, 2, 3), (1, 1, 2)]
    sens = hits_of(S.term(idx, "Visa", sensitivity="s"))
    assert sens == [(0, 0, 1), (1, 1, 2)]
    assert hits_of(S.term(idx, "VISA", sensitivity="s")) == [(0, 2, 3)]
    assert hits_of(S.term(idx, "visa", sensitivity="s")) == [(0, 1, 2)]


def test_filter_ngrams(tiny_engine, tiny_oracle):
    """filter_ngrams ≡ distinct right-expansions of the anchor
    (SpanQueryFilterNGrams as expand+unique)."""
    from blacklab_spark.operators import spans as S
    idx = tiny_engine.index
    anchor = tiny_engine.term_hits("visa")
    got = sorted(map(tuple, S.filter_ngrams(idx, anchor, "right", 1, 2)
                     .collect()))
    expected = set()
    for d, poss in tiny_oracle.postings["visa"].items():
        n = len(tiny_oracle.tokens[d])
        for p in poss:
            for w in (1, 2):
                if p + 1 + w <= n:
                    expected.add((d, p, p + 1 + w))
    assert got == sorted(expected) and got


def test_repetition_chain_fast_path(idx, tiny_oracle):
    """Fixed-width repetition rides the JVM chain-closure path
    (gaps-and-islands window + explode — no Python kernel, output
    pre-deduplicated); hits identical to the variable-width fallback
    across widths and bound shapes."""
    the = S.term(idx, "the")
    pairs = S.sequence(S.term(idx, "the"), S.any_token(idx, 1, 1))
    for clause, w, m, n in [(the, 1, 1, None), (the, 1, 2, None),
                            (the, 1, 2, 4), (pairs, 2, 1, None),
                            (pairs, 2, 2, 3)]:
        fast = hits_of(S.repetition(clause, m, n, width=w))
        slow = hits_of(S.repetition(clause, m, n, width=None))
        assert fast == slow, (w, m, n)
    assert hits_of(S.repetition(the, 1, None, width=1))
