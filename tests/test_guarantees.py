"""SpanGuarantees lattice (plans/guarantees.py, SURVEY §4.2) — rule
unit tests, dedup-elision identity, and plan-shape assertions.

Reference analog: SpanGuarantees.java properties drive whether
SpansUnique is inserted (SpanQuerySequence.java:641-730); here the
same proofs elide dropDuplicates exchanges. Every ``unique=True``
claim is checked two ways: the observed result carries no duplicate
rows, and the elided plan is value-identical to the always-dedup
plan."""

from __future__ import annotations

import pytest

from blacklab_spark.plans import query as Q
from blacklab_spark.plans.executor import (_guar, _or_merge_term_ids,
                                           explain, find)
from blacklab_spark.plans.guarantees import SpanGuarantees, guarantees
from blacklab_spark.plans.parser import parse
from blacklab_spark.plans.rewrite import rewrite


@pytest.fixture(scope="module")
def idx(tiny_engine):
    return tiny_engine.index


def g_of(cql: str) -> SpanGuarantees:
    return guarantees(rewrite(parse(cql)))


def rows_of(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in
                  df.select("doc_id", "start", "end").collect())


# ---------------- lattice rules (pure, no Spark) ----------------

def test_leaf_rules():
    assert g_of('"a"') == SpanGuarantees(1, 1, True)
    assert g_of('[pos="noun"]') == SpanGuarantees(1, 1, True)
    assert guarantees(Q.Fuzzy("visa", 1)) == SpanGuarantees(1, 1, True)
    assert guarantees(Q.Not(Q.Term("a"))) == SpanGuarantees(1, 1, True)
    assert guarantees(Q.AnyToken(2, 5)) == SpanGuarantees(2, 5, True)
    assert guarantees(Q.AnyToken(1, None)) == \
        SpanGuarantees(1, None, True)
    assert guarantees(Q.Turn()) == SpanGuarantees(0, None, True)
    # stored tag spans may repeat → never claimed unique
    assert not guarantees(Q.Tag("s")).unique


def test_seq_rules():
    # all fixed-width → fixed sum, unique
    assert g_of('"a" "b" "c"') == SpanGuarantees(3, 3, True)
    # one variable-width clause keeps uniqueness, bounds add up
    assert g_of('"a" []{1,2} "b"') == SpanGuarantees(3, 4, True)
    # two variable-width clauses → duplicates possible
    g = guarantees(Q.Seq(Q.AnyToken(1, 2), Q.AnyToken(1, 2)))
    assert (g.len_min, g.len_max, g.unique) == (2, 4, False)
    # a non-unique child (Or of overlapping shapes) poisons uniqueness
    g = guarantees(Q.Seq(Q.Or(Q.Term("a"), Q.Term("b")), Q.Term("c")))
    assert not g.unique


def test_or_and_rep_rules():
    g = g_of('"a" | "b" "c"')
    assert (g.len_min, g.len_max, g.unique) == (1, 2, False)
    # same-span AND: bounds intersect, output always unique
    g = guarantees(Q.And(Q.AnyToken(1, 5), Q.AnyToken(2, None)))
    assert (g.len_min, g.len_max, g.unique) == (2, 5, True)
    assert g_of('"a"{2,4}') == SpanGuarantees(2, 4, True)
    g = g_of('("a" "b")+')
    assert (g.len_min, g.len_max, g.unique) == (2, None, True)


def test_expand_and_posfilter_rules():
    # Expand of a fixed-width unique clause stays unique
    g = guarantees(Q.Expand(Q.Term("a"), "left", 1, 3))
    assert (g.len_min, g.len_max, g.unique) == (2, 4, True)
    # variable-width clause AND variable amount → nothing pins the
    # operand → not unique
    g = guarantees(Q.Expand(Q.AnyToken(1, 2), "right", 1, 2))
    assert not g.unique
    # a FIXED amount is an injective shift even for a variable-width
    # clause (the CCNot product shape)
    g = guarantees(Q.Expand(Q.AnyToken(1, 2), "left", 1, 1))
    assert g.unique and (g.len_min, g.len_max) == (2, 3)
    # position filter passes the producer through
    assert g_of('"a" within <turn/>') == SpanGuarantees(1, 1, True)
    g = guarantees(Q.Overlap(Q.AnyToken(1, 3), Q.AnyToken(1, 2)))
    assert (g.len_min, g.len_max, g.unique) == (1, 2, True)


def test_relation_nodes_conservative():
    g = guarantees(Q.RelFunc("det"))
    assert not g.unique and g.len_max is None


# ---------------- executor integration ----------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_hash_aggregates(df) -> int:
    return _plan(df).count("HashAggregate")


def test_generic_seq_elides_dedup(idx):
    """[pos=...] [pos=...] rides the generic adjacency join; both
    leaves are fixed-width and unique, so the output dedup exchange
    must be gone — and the result must still be duplicate-free."""
    df = find(idx, '[pos="noun"] [pos="verb"]')
    assert "HashAggregate" not in _plan(df)
    rows = rows_of(df)
    assert len(rows) == len(set(rows))
    assert all(e - s == 2 for _, s, e in rows)


def test_generic_seq_keeps_dedup_when_unprovable(idx):
    """A sequence of two variable-width clauses must KEEP its dedup
    (duplicates genuinely arise from different split points)."""
    from blacklab_spark.operators import spans as S
    a = S.any_token(idx, 1, 2)
    joined_nodedup = S.sequence(a, S.any_token(idx, 1, 2), dedup=False)
    joined = S.sequence(a, S.any_token(idx, 1, 2))
    n_raw = joined_nodedup.count()
    n_dedup = joined.count()
    assert n_dedup < n_raw  # duplicates really existed


def test_fiseq_output_is_unique_without_dedup(idx):
    """_fiseq dropped its trailing dropDuplicates — prove the output
    really is duplicate-free (anchor postings unique, 1:1 meta join)."""
    from blacklab_spark.plans.executor import fi_match
    with fi_match(1 << 40):          # force the FiSeq strategy
        df = find(idx, '"visa" "application"')
        rows = rows_of(df)
    assert len(rows) == len(set(rows))
    # identical to the postings-intersection path
    assert rows == rows_of(find(idx, '_FI2("visa" "application")'))


def test_and_elides_input_dedups(idx):
    """Same-span AND over unique leaves: no HashAggregate from input
    dedups in the plan; result identical to the conservative path."""
    from blacklab_spark.operators import spans as S
    df = find(idx, '[word="th.*" & pos="func"]')
    conservative = S.and_(
        find(idx, '[word="th.*"]'), find(idx, '[pos="func"]'))
    assert rows_of(df) == rows_of(conservative)
    assert _n_hash_aggregates(df) < _n_hash_aggregates(conservative)


def test_repetition_elides_base_dedup(idx):
    """"the"{2,2}: the chain path needs duplicate-free input; the
    leaf proves it, so no dedup aggregate should precede the window."""
    df = find(idx, '"the"{2,2}')
    assert "HashAggregate" not in _plan(df)
    rows = rows_of(df)
    assert len(rows) == len(set(rows))


# ---------------- OR → merged postings decode ----------------

def test_or_merges_disjoint_terms(idx):
    ids = _or_merge_term_ids(idx, (Q.Term("visa"), Q.Term("good")))
    assert ids is not None and len(ids) == 2
    merged = find(idx, '"visa" | "good"')
    union = rows_of(find(idx, '"visa"')) + rows_of(find(idx, '"good"'))
    assert rows_of(merged) == sorted(union)
    # ONE postings scan, no Union node
    plan = _plan(merged)
    assert "Union" not in plan
    assert "or " in explain('"visa" | "good"', idx) and \
        "merged postings decode" in explain('"visa" | "good"', idx)


def test_or_merge_expansion_runs_once_per_node(idx, monkeypatch):
    """r4 VERDICT #6: planning touches the same Or node up to three
    times (_guar, the exec branch, explain()); the memoizing wrapper
    must run the driver-side dictionary expansion exactly ONCE per
    distinct clause tuple."""
    import blacklab_spark.plans.executor as ex
    calls = []
    real = ex._or_merge_term_ids_uncached

    def counting(index, clauses):
        calls.append(tuple(clauses))
        return real(index, clauses)

    monkeypatch.setattr(ex, "_or_merge_term_ids_uncached", counting)
    # fresh cache so the spy observes this query's expansions
    idx._term_cache.clear()
    q = '[word="vis.*"] | "good"'
    find(idx, q).count()
    explain(q, idx)
    distinct = set(calls)
    assert len(calls) == len(distinct), (
        f"uncached expansion ran {len(calls)}x for "
        f"{len(distinct)} distinct Or nodes: {calls}")


def test_or_overlapping_expansions_keep_union_semantics(idx):
    """Regexes that both match 'visa' must NOT merge: the reference's
    OR yields one hit per matching clause (duplicates kept)."""
    assert _or_merge_term_ids(
        idx, (Q.Regex("vis."), Q.Regex("v.sa"))) is None
    df = find(idx, '"vis." | "v.sa"')
    n_visa = len(rows_of(find(idx, '"visa"')))
    assert df.count() >= 2 * n_visa  # per-clause duplicates preserved
    assert "Union" in _plan(df)


def test_or_mixed_layers_not_merged(idx):
    assert _or_merge_term_ids(
        idx, (Q.Term("visa"), Q.Term("noun", "pos"))) is None


def test_guar_upgrades_merged_or(idx):
    g = _guar(idx, Q.Or(Q.Term("visa"), Q.Term("good")))
    assert g.unique
    g2 = _guar(idx, Q.Or(Q.Regex("vis."), Q.Regex("v.sa")))
    assert not g2.unique


def test_seq_over_merged_or_elides_dedup(idx):
    """("visa"|"good") "application": the merged Or is unique and
    width-1, so the adjacency join needs no output dedup."""
    df = find(idx, '("visa" | "good") "application"')
    assert "HashAggregate" not in _plan(df)
    rows = rows_of(df)
    assert len(rows) == len(set(rows))
    # identity vs the two separate phrases
    a = rows_of(find(idx, '"visa" "application"'))
    b = rows_of(find(idx, '"good" "application"'))
    assert rows == sorted(a + b)


def test_explain_reports_guarantees():
    s = explain('"a" []{1,2} "b"')
    assert "guarantees: width=[3,4] unique=True" in s


def test_or_annot_terms_single_probe(idx):
    """[pos="noun"] | [pos="verb"] → one forward-index pass; identical
    to the generic union, duplicate-free, and treated as unique by the
    planner."""
    from blacklab_spark.operators import spans as S
    from blacklab_spark.plans.executor import _or_annot_merge
    assert _or_annot_merge(
        (Q.Term("noun", "pos"), Q.Term("verb", "pos"))) == \
        ("pos", ("noun", "verb"))
    # mixed layers / word layer / duplicate values do not merge
    assert _or_annot_merge(
        (Q.Term("noun", "pos"), Q.Term("x", "word"))) is None
    assert _or_annot_merge(
        (Q.Term("noun", "pos"), Q.Term("noun", "pos"))) is None
    merged = find(idx, '[pos="noun"] | [pos="verb"]')
    union = S.or_(find(idx, '[pos="noun"]'), find(idx, '[pos="verb"]'))
    got = rows_of(merged)
    assert got == rows_of(union)
    assert len(got) == len(set(got))
    # exactly ONE Generate (posexplode) in the merged plan, two in the
    # generic union
    assert _plan(merged).count("Generate") == 1
    assert _plan(union).count("Generate") == 2
    g = _guar(idx, Q.Or(Q.Term("noun", "pos"), Q.Term("verb", "pos")))
    assert g.unique
    assert "single pos-layer probe" in explain(
        '[pos="noun"] | [pos="verb"]', idx)
