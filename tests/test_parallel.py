"""Parallel-corpora operators — operators/parallel.py vs an
independent pure-Python derivation of the synthetic 2:1 translation
field and its alignment (the cross-engine identity pattern used for
the pos/lemma/relations layers)."""

from __future__ import annotations

import pytest

from blacklab_spark.operators.parallel import (alignment_edges,
                                               cross_field_matches,
                                               other_field_hits,
                                               term_hits_field_b,
                                               tokens_other_field)


def py_tokens_b(tokens: list[str]) -> list[str]:
    out = []
    for j in range((len(tokens) + 1) // 2):
        if 2 * j + 1 < len(tokens):
            out.append(tokens[2 * j] + "_" + tokens[2 * j + 1])
        else:
            out.append(tokens[2 * j])
    return out


def py_edges(n: int) -> list[tuple]:
    """(src_start, src_end, tgt_start, tgt_end) per target position."""
    return [(2 * j, min(2 * j + 2, n), j, j + 1)
            for j in range((n + 1) // 2)]


@pytest.fixture(scope="module")
def doc_tokens(tiny_engine):
    rows = tiny_engine.index.doc_meta.select("doc_id", "tokens").collect()
    return {r["doc_id"]: list(r["tokens"]) for r in rows}


def test_tokens_b_matches_python_oracle(tiny_engine, doc_tokens):
    from pyspark.sql import functions as F
    got = {r["doc_id"]: list(r["tb"]) for r in
           tiny_engine.index.doc_meta.select(
               "doc_id", tokens_other_field("tokens").alias("tb"))
           .collect()}
    exp = {d: py_tokens_b(ts) for d, ts in doc_tokens.items()}
    assert got == exp
    # odd and even source lengths both present in the corpus
    lens = {len(ts) % 2 for ts in doc_tokens.values() if ts}
    assert lens == {0, 1}


def test_alignment_edges_match_python_oracle(tiny_engine, doc_tokens):
    got = {tuple(r) for r in alignment_edges(tiny_engine.index).collect()}
    exp = {(d, *e) for d, ts in doc_tokens.items()
           for e in py_edges(len(ts))}
    assert got == exp and got


def test_other_field_projection_arithmetic(tiny_engine, doc_tokens):
    """With total 2:1 alignment, the projected span of [s,e) is
    exactly [s//2, ceil(e/2)) — the join-based operator must agree
    with the closed form, and b_text must slice tokens_b."""
    hits = tiny_engine.find('"visa" []')
    proj = other_field_hits(tiny_engine.index, hits).collect()
    exp = {}
    for r in hits.collect():
        key = (r["doc_id"], r["start"] // 2, (r["end"] + 1) // 2)
        exp[key] = (r["start"], r["end"])
    got = {(r["doc_id"], r["start"], r["end"]): (r["a_start"], r["a_end"])
           for r in proj}
    assert got == exp and got
    for r in proj:
        tb = py_tokens_b(doc_tokens[r["doc_id"]])
        assert r["b_text"] == " ".join(tb[r["start"]:r["end"]])


def test_other_field_empty_hits(tiny_engine):
    hits = tiny_engine.find('"zzz_no_such_token_zzz"')
    assert other_field_hits(tiny_engine.index, hits).count() == 0


def test_term_hits_field_b(tiny_engine, doc_tokens):
    from pyspark.sql import functions as F
    got = {(r["doc_id"], r["start"], r["token"]) for r in
           term_hits_field_b(tiny_engine.index,
                             lambda t: t.startswith("visa_")).collect()}
    exp = {(d, j, t) for d, ts in doc_tokens.items()
           for j, t in enumerate(py_tokens_b(ts))
           if t.startswith("visa_")}
    assert got == exp and got


def test_cross_field_matches_python_oracle(tiny_engine, doc_tokens):
    """"visa" ==> [b-token containing 'application']: a source hit
    survives iff its pair-partner fuses with 'application'."""
    src = tiny_engine.find('"visa"')
    tgt = term_hits_field_b(
        tiny_engine.index,
        lambda t: t.contains("application"))
    got = {(r["doc_id"], r["start"], r["b_start"]) for r in
           cross_field_matches(tiny_engine.index, src, tgt).collect()}
    exp = set()
    for d, ts in doc_tokens.items():
        tb = py_tokens_b(ts)
        for p, t in enumerate(ts):
            if t != "visa":
                continue
            j = p // 2
            if "application" in tb[j]:
                exp.add((d, p, j))
    assert got == exp and got


def test_cql_crossfield_operator(tiny_engine, doc_tokens):
    """CQL '"visa" ==> "visa_.*"' ≡ cross_field with a prefix
    predicate on the fused field-b token; target term equality and
    bad-target errors also covered."""
    got = {(r["doc_id"], r["start"], r["b_start"]) for r in
           tiny_engine.find('"visa" ==> "visa_.*"').collect()}
    exp = set()
    for d, ts in doc_tokens.items():
        tb = py_tokens_b(ts)
        for p, t in enumerate(ts):
            if t == "visa" and tb[p // 2].startswith("visa_"):
                exp.add((d, p, p // 2))
    assert got == exp and got
    # [] target = "has any alignment" — every source hit survives
    assert (tiny_engine.find('"visa" ==> []').count()
            == tiny_engine.find('"visa"').count())
    # non-leaf target rejected
    with pytest.raises(ValueError, match="==>"):
        tiny_engine.find('"visa" ==> "a" "b"').count()


def test_other_field_pushes_anchor_docs_into_scan(tiny_engine):
    """A rare-phrase other-field projection must derive alignment
    edges only for the anchor docs: the hits' doc ids are pushed as a
    doc_id IN (...) parquet filter (the kwic/_fiseq pattern)."""
    hits = tiny_engine.find('"visa" "application"')
    df = other_field_hits(tiny_engine.index, hits)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 1-element IN-lists fold to EqualTo — accept either shape
    assert "In(doc_id" in plan or "EqualTo(doc_id" in plan


def test_engine_facade_cross_field(tiny_engine):
    out = tiny_engine.cross_field('"visa"', lambda t: t.contains("visa"))
    # every 'visa' source hit is aligned to a b-token containing it
    assert out.count() == tiny_engine.find('"visa"').count()


def test_alignment_op_full_form(tiny_engine):
    """Full ALIGNMENT_OP grammar (cql.jj:104, RelationOperatorInfo.
    fromOperator): =type=> regex filters the alignment layer's
    relation type, ==>name selects the target version, trailing ?
    keeps unmatched source hits (optionalMatch)."""
    eng = tiny_engine
    base = {tuple(r) for r in
            eng.find('"visa" ==> []').collect()}
    assert base
    # type regex matching the derived layer's single type ≡ untyped
    assert {tuple(r) for r in
            eng.find('"visa" =align=> []').collect()} == base
    assert {tuple(r) for r in
            eng.find('"visa" =al.*=> []').collect()} == base
    # explicit target version 'b' ≡ default; unknown version raises
    assert {tuple(r) for r in
            eng.find('"visa" ==>b []').collect()} == base
    with pytest.raises(ValueError, match="parallel field version"):
        eng.find('"visa" ==>nl []').count()
    # non-matching type regex: no alignment relations of that type
    assert eng.find('"visa" =dep=> []').count() == 0
    # optionalMatch: every source hit survives; unmatched rows carry
    # a null target span
    src = {(r["doc_id"], r["start"], r["end"])
           for r in eng.find('"visa"').collect()}
    opt = eng.find('"visa" =dep=>? []').collect()
    assert {(r["doc_id"], r["start"], r["end"]) for r in opt} == src
    assert all(r["b_start"] is None for r in opt)
    # with a real target the optional result is inner ∪ unmatched
    optb = eng.find('"visa" ==>? "visa_gi"').collect()
    inner = {tuple(r) for r in
             eng.find('"visa" ==> "visa_gi"').collect()}
    got_inner = {tuple(r) for r in optb if r["b_start"] is not None}
    assert got_inner == inner
    assert {(r["doc_id"], r["start"], r["end"]) for r in optb} == src
