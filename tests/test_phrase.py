import pytest

from blacklab_spark.oracle import phrase_hits as oracle_phrase


def _collect_hits(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in df.collect())


@pytest.mark.parametrize("phrase", [
    ["visa", "application"], ["very", "good"], ["the", "a"],
    ["visa", "nosuchterm"],
])
@pytest.mark.parametrize("path", ["postings", "tokens"])
def test_phrase_matches_oracle_tiny(tiny_engine, tiny_oracle, phrase, path):
    expected = oracle_phrase(tiny_oracle, phrase)
    got = _collect_hits(tiny_engine.phrase_hits(phrase, path=path))
    assert got == expected


@pytest.mark.parametrize("phrase", [["visa", "application"], ["very", "good"]])
def test_phrase_dualpath_small(small_engine, small_oracle, phrase):
    expected = oracle_phrase(small_oracle, phrase)
    a = _collect_hits(small_engine.phrase_hits(phrase, path="postings"))
    b = _collect_hits(small_engine.phrase_hits(phrase, path="tokens"))
    assert a == expected
    assert b == expected


def test_phrase_repeated_term(tiny_engine, tiny_oracle):
    # "the the" has a repeated term → engine falls back to token path
    expected = oracle_phrase(tiny_oracle, ["the", "the"])
    got = _collect_hits(tiny_engine.phrase_hits(["the", "the"]))
    assert got == expected


def test_phrase_three_terms(small_engine, small_oracle):
    expected = oracle_phrase(small_oracle, ["visa", "application", "the"])
    got = _collect_hits(small_engine.phrase_hits(["visa", "application", "the"]))
    assert got == expected


def test_phrase_within_conversation(small_engine, small_oracle):
    """`within conversation` structural filter (SURVEY §2.A#13 — free,
    conv is a column)."""
    expected = [h for h in oracle_phrase(small_oracle, ["very", "good"])
                if small_oracle.meta[h[0]]["conv_id"] == "conv00003"]
    got = _collect_hits(small_engine.phrase_hits(
        ["very", "good"], path="tokens", conv_id="conv00003"))
    assert got == expected


def test_term_hits(tiny_engine, tiny_oracle):
    expected = sorted(
        (d, p, p + 1)
        for d, poss in tiny_oracle.postings.get("visa", {}).items()
        for p in poss)
    got = _collect_hits(tiny_engine.term_hits("visa"))
    assert got == expected
