"""Lucene-classic metadata filter language (the reference server's
``filter`` / ``filterlang=luceneql`` parameter) → doc_meta SQL."""

import pytest

from blacklab_spark.plans.luceneql import parse_lucene_filter
from blacklab_spark.plans.parser import ParseError


def test_term_and_wildcard():
    assert parse_lucene_filter("role:assistant") == \
        "lower(role) = 'assistant'"
    assert parse_lucene_filter("conv_id:conv00*") == \
        "lower(conv_id) LIKE 'conv00%'"


def test_boolean_and_default_or():
    sql = parse_lucene_filter("role:user AND tool:search")
    assert sql == "(lower(role) = 'user') AND (lower(tool) = 'search')"
    # juxtaposition = OR (QueryParser default operator)
    sql2 = parse_lucene_filter("role:user role:assistant")
    assert " OR " in sql2


def test_not_minus_plus():
    assert parse_lucene_filter("-role:user").startswith("NOT (")
    sql = parse_lucene_filter("+role:user AND NOT tool:search")
    assert sql.endswith("(NOT (lower(tool) = 'search'))")


def test_field_group():
    sql = parse_lucene_filter("role:(user OR assistant)")
    assert sql == "(lower(role) = 'user') OR (lower(role) = 'assistant')"


def test_range_inclusive_exclusive_open():
    assert parse_lucene_filter("turn_idx:[2 TO 5]") == \
        "(turn_idx >= '2' AND turn_idx <= '5')"
    assert parse_lucene_filter("turn_idx:{2 TO 5}") == \
        "(turn_idx > '2' AND turn_idx < '5')"
    assert parse_lucene_filter("turn_idx:[2 TO *]") == \
        "(turn_idx >= '2')"
    assert parse_lucene_filter("ts:[* TO *]") == "ts IS NOT NULL"


def test_phrase_value():
    sql = parse_lucene_filter('role:"assis tant"')
    assert "RLIKE" in sql


def test_errors():
    with pytest.raises(ParseError, match="no default field"):
        parse_lucene_filter("bare_term")
    with pytest.raises(ParseError, match="TO"):
        parse_lucene_filter("x:[1 5]")
    with pytest.raises(ParseError, match="trailing"):
        parse_lucene_filter("role:user )")


def test_injection_is_quoted():
    sql = parse_lucene_filter("role:it's")
    assert "\\'" in sql  # quote escaped, not breaking out of the literal


# ---------------- execution ------------------------------------------
def test_docs_filter_execution(tiny_engine):
    eng = tiny_engine
    got = eng.docs(filter="role:assistant").count()
    want = eng.index.doc_meta.filter("role = 'assistant'").count()
    assert got == want > 0


def test_docs_range_and_boolean_execution(tiny_engine):
    eng = tiny_engine
    got = eng.docs(filter="role:assistant AND turn_idx:[0 TO 3]").count()
    want = eng.index.doc_meta.filter(
        "role = 'assistant' AND turn_idx BETWEEN 0 AND 3").count()
    assert got == want > 0


def test_docs_filter_composes_with_kwargs(tiny_engine):
    eng = tiny_engine
    got = eng.docs(filter="turn_idx:[0 TO 0]", role="user").count()
    want = eng.index.doc_meta.filter(
        "turn_idx = 0 AND role = 'user'").count()
    assert got == want > 0


def test_patt_plus_filter_find(tiny_engine):
    """The server's patt + filter combination on find()."""
    eng = tiny_engine
    got = eng.find('"visa"', filter="role:assistant").count()
    want = eng.find('"visa"', role="assistant").count()
    assert got == want > 0


def test_patt_plus_filter_topk(tiny_engine):
    eng = tiny_engine
    got = [tuple(r) for r in eng.topk(
        "visa", k=5, filter="role:assistant").collect()]
    want = [tuple(r) for r in eng.topk(
        "visa", k=5, role="assistant").collect()]
    assert got == want and got
