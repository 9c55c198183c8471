"""SRU Contextual Query Language — the reference's second query
language (query-parser contextql.jj,
ContextualQueryLanguageParser.java, CompleteQuery.java)."""

import pytest

from blacklab_spark.plans import query as Q
from blacklab_spark.plans.contextql import parse_contextql
from blacklab_spark.plans.parser import ParseError


# ---------------- parse level ----------------------------------------
def test_bare_term_is_contents_word():
    cq = parse_contextql("visa")
    assert cq.filter is None
    assert cq.pattern == Q.Term("visa")


def test_quoted_phrase_becomes_sequence():
    cq = parse_contextql('"visa application"')
    assert isinstance(cq.pattern, Q.Seq) and len(cq.pattern.clauses) == 2


def test_wildcard_term_becomes_regex():
    cq = parse_contextql('word = "vis*"')
    assert isinstance(cq.pattern, Q.Regex)
    assert cq.pattern.pattern == "vis.*"


def test_contents_dot_layer_and_direct_layer():
    assert parse_contextql('contents.pos = "func"').pattern == \
        Q.Term("func", "pos")
    assert parse_contextql('pos = "func"').pattern == Q.Term("func", "pos")
    assert parse_contextql('contents = "visa"').pattern == Q.Term("visa")


def test_metadata_clause_becomes_filter():
    cq = parse_contextql('role = "assistant"')
    assert cq.pattern is None
    assert cq.filter == "lower(role) LIKE 'assistant'"
    wild = parse_contextql('conv_id = "conv00*"')
    assert wild.filter == "lower(conv_id) LIKE 'conv00%'"


def test_and_combines_contents_and_metadata():
    cq = parse_contextql('visa and role = "user"')
    assert isinstance(cq.pattern, Q.Term) and "role" in cq.filter


def test_and_or_not_contents():
    cq = parse_contextql("visa or application")
    assert isinstance(cq.pattern, Q.Or)
    cq2 = parse_contextql("visa not application")
    assert isinstance(cq2.pattern, Q.And)
    assert isinstance(cq2.pattern.clauses[1], Q.Not)


def test_or_across_kinds_raises():
    with pytest.raises(ValueError, match="or can only be used"):
        parse_contextql('visa or role = "user"')


def test_unsupported_relations_and_prox_raise():
    with pytest.raises(ValueError, match="Only contains"):
        parse_contextql('word > "a"')
    with pytest.raises(ValueError, match="prox"):
        parse_contextql("visa prox application")
    with pytest.raises(ValueError, match="any not yet|not yet supported"):
        parse_contextql('word any "a b"')


def test_scope_prefix_is_parsed_and_ignored():
    cq = parse_contextql('> dc = "http://example.org" visa')
    assert cq.pattern == Q.Term("visa")


def test_parens_and_comments():
    cq = parse_contextql(
        '(visa or application) and role = "user" # trailing comment')
    assert isinstance(cq.pattern, Q.Or) and "role" in cq.filter


def test_trailing_garbage_raises():
    with pytest.raises(ParseError):
        parse_contextql("visa )")


# ---------------- execution level ------------------------------------
def test_exec_matches_corpusql(tiny_engine):
    eng = tiny_engine
    got = sorted(map(tuple, eng.find_contextql("visa").collect()))
    want = sorted(map(tuple, eng.find('"visa"').collect()))
    assert got == want and got


def test_exec_phrase_matches_corpusql(tiny_engine):
    eng = tiny_engine
    got = eng.find_contextql('"visa application"').count()
    want = eng.find('"visa" "application"').count()
    assert got == want > 0


def test_exec_metadata_filter(tiny_engine):
    eng = tiny_engine
    got = eng.find_contextql('visa and role = "assistant"').count()
    want = eng.find('"visa"', role="assistant").count()
    assert got == want > 0


def test_exec_wildcard(tiny_engine):
    eng = tiny_engine
    got = eng.find_contextql('word = "vis*"').count()
    want = eng.find('[word="vis.*"]').count()
    assert got == want > 0


def test_exec_pure_metadata_returns_docs(tiny_engine):
    docs = tiny_engine.find_contextql('role = "assistant"')
    assert set(docs.columns) == {"doc_id", "conv_id", "turn_idx"}
    n_all = tiny_engine.index.doc_meta.count()
    assert 0 < docs.count() < n_all
