"""Hit/doc property DSL (sort/group keys) vs brute-force reference."""

import pytest

from blacklab_spark.operators import properties as P
from blacklab_spark.operators import spans as S


@pytest.fixture(scope="module")
def idx(tiny_engine):
    return tiny_engine.index


def test_sort_by_doc_and_position(idx, tiny_oracle):
    hits = S.term(idx, "the")
    rows = [(r["doc_id"], r["start"]) for r in
            P.sort_hits(idx, hits, "doc,hitposition").collect()]
    assert rows == sorted(rows)


def test_sort_desc_by_after_word(idx, tiny_oracle):
    hits = S.term(idx, "a")
    rows = P.sort_hits(idx, hits, "-after:word:i:1,doc,hitposition").collect()
    def after(d, e):
        toks = tiny_oracle.tokens[d]
        return toks[e] if e < len(toks) else ""
    got = [after(r["doc_id"], r["end"]) for r in rows]
    assert got == sorted(got, reverse=True)


def test_group_by_hit_text(idx, tiny_oracle):
    hits = S.or_(S.term(idx, "visa"), S.term(idx, "good"))
    groups = {r["key_0"]: r["count"] for r in
              P.group_hits(idx, hits, "hit").collect()}
    expected = {
        "visa": sum(len(p) for p in tiny_oracle.postings["visa"].values()),
        "good": sum(len(p) for p in tiny_oracle.postings["good"].values()),
    }
    assert groups == expected


def test_group_by_field_and_after(idx, tiny_oracle):
    hits = S.term(idx, "visa")
    groups = {(r["key_0"], r["key_1"]): r["count"] for r in
              P.group_hits(idx, hits, "field:role,after:word:i:1").collect()}
    expected: dict = {}
    for d, ps in tiny_oracle.postings["visa"].items():
        role = tiny_oracle.meta[d]["role"]
        toks = tiny_oracle.tokens[d]
        for p in ps:
            nxt = toks[p + 1] if p + 1 < len(toks) else ""
            expected[(role, nxt)] = expected.get((role, nxt), 0) + 1
    assert groups == expected


def test_group_with_stored_hits(idx):
    hits = S.term(idx, "visa")
    rows = P.group_hits(idx, hits, "field:role", max_stored=3).collect()
    for r in rows:
        assert 1 <= len(r["stored_hits"]) <= 3
        assert len(r["stored_hits"]) <= r["count"]


def test_group_stats(idx, tiny_oracle):
    hits = S.term(idx, "the")
    g = P.group_hits(idx, hits, "field:role")
    stats = P.group_stats(g)
    total = sum(len(p) for p in tiny_oracle.postings["the"].values())
    assert stats["total_hits"] == total
    assert stats["largest_group"] <= total
    assert stats["n_groups"] >= 2


def test_facets(idx, tiny_oracle):
    docs = idx.doc_meta
    f = P.facets(idx, docs, ["role", "conv_id"])
    roles = {r["value"]: r["count"] for r in f["role"].collect()}
    expected: dict = {}
    for d in tiny_oracle.doc_ids:
        role = tiny_oracle.meta[d]["role"]
        expected[role] = expected.get(role, 0) + 1
    assert roles == expected
    assert len(f["conv_id"].collect()) == 3


def test_length_and_unknown_key(idx):
    hits = S.any_token(idx, 2, 2)
    rows = P.group_hits(idx, hits, "length").collect()
    assert len(rows) == 1 and rows[0]["key_0"] == 2
    with pytest.raises(ValueError):
        P.compile_property("bogus:key")
