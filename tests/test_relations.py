"""Relation (dependency) queries — operators/relations.py vs an
independent pure-Python derivation of the same synthetic grammar
(the cross-engine identity pattern used for the pos/lemma layers)."""

from __future__ import annotations

import pytest

from blacklab_spark.annotations import py_pos_tag
from blacklab_spark.operators.relations import (doc_relations, relations,
                                                rel_span_adjust,
                                                relations_between,
                                                relations_within_span)


def py_edges(tokens: list[str]) -> list[tuple]:
    """(rel_type, src_start, src_end, tgt_start, tgt_end) — the
    synthetic grammar, independently in Python."""
    pos = [py_pos_tag(t) for t in tokens]
    out = []
    for i in range(len(pos) - 1):
        if pos[i] == "func" and pos[i + 1] == "noun":
            out.append(("det", i, i + 1, i + 1, i + 2))
        if pos[i] == "verb" and pos[i + 1] == "noun":
            out.append(("obj", i, i + 1, i + 1, i + 2))
        if pos[i] == "noun" and pos[i + 1] == "noun":
            out.append(("nn", i + 1, i + 2, i, i + 1))
            out.append(("nmod", i, i + 1, i + 1, i + 2))
        if pos[i] == "noun" and pos[i + 1] == "verb":
            out.append(("nsubj", i + 1, i + 2, i, i + 1))
    if pos:
        out.append(("root", None, None, 0, 1))
    return out


@pytest.fixture(scope="module")
def expected_edges(tiny_engine):
    rows = tiny_engine.index.doc_meta.select("doc_id", "tokens").collect()
    return {
        (r["doc_id"], *e) for r in rows for e in py_edges(r["tokens"])
    }


def test_doc_relations_matches_python_oracle(tiny_engine, expected_edges):
    got = {tuple(r) for r in doc_relations(tiny_engine.index).collect()}
    assert got == expected_edges and got


def test_relations_direction_filters(tiny_engine, expected_edges):
    idx = tiny_engine.index
    # root: exactly one per non-empty doc, reported at the target
    n_docs_nonempty = len({d for d, *_ in expected_edges})
    rows = relations(idx, direction="root").collect()
    assert len(rows) == n_docs_nonempty
    assert all(r["start"] == 0 and r["end"] == 1
               and r["src_start"] is None for r in rows)
    # backward: exactly the head-last edges (nn; nsubj when the
    # corpus has verbs)
    back = relations(idx, direction="backward").collect()
    assert back and all(r["rel_type"] in ("nn", "nsubj") for r in back)
    # forward ∪ backward = both; root ⊂ forward
    both = relations(idx, direction="both").count()
    fwd = relations(idx, direction="forward").count()
    assert fwd + len(back) == both


def test_relations_type_regex_and_span_modes(tiny_engine, expected_edges):
    idx = tiny_engine.index
    det = {(r["doc_id"], r["start"], r["end"])
           for r in relations(idx, "det", span_mode="target").collect()}
    exp = {(d, t0, t1) for (d, ty, s0, s1, t0, t1) in expected_edges
           if ty == "det"}
    assert det == exp and det
    # regex alternation + full span
    full = relations(idx, "det|obj", span_mode="full")
    assert all(r["end"] - r["start"] == 2 for r in full.collect())
    # span adjust round-trip: source-mode spans re-adjusted to target
    src = relations(idx, "nn", span_mode="source")
    tgt = {tuple(r) for r in
           rel_span_adjust(src, "target").collect()}
    assert tgt and tgt == {tuple(r) for r in
                           relations(idx, "nn",
                                     span_mode="target").collect()}


def test_relations_within_span(tiny_engine):
    idx = tiny_engine.index
    rels = relations(idx, "det")
    within = relations_within_span(rels, tiny_engine.find("<turn/>"))
    # every det relation lies inside its whole-turn span
    assert within.count() == rels.count()
    assert all(r["c_start"] <= r["start"] and r["end"] <= r["c_end"]
               for r in within.limit(50).collect())


def test_cql_relation_operator(tiny_engine, expected_edges):
    """[pos="func"] -det-> [pos="noun"] ≡ all det edges (operands
    match the grammar's own conditions), full-span hits."""
    hits = {(r["doc_id"], r["start"], r["end"])
            for r in tiny_engine.find(
                '[pos="func"] -det-> [pos="noun"]').collect()}
    exp = {(d, s0, t1) for (d, ty, s0, s1, t0, t1) in expected_edges
           if ty == "det"}
    assert hits == exp and hits
    # narrowing the target narrows the result
    sub = tiny_engine.find('[] -det-> "visa"')
    assert 0 < sub.count() <= len(exp)


def test_relations_between_root_never_matches_source(tiny_engine):
    """Root relations have no source span: the between-spans join can
    never produce them (NULL join keys)."""
    idx = tiny_engine.index
    any_hits = tiny_engine.find("[]")
    out = relations_between(idx, any_hits, any_hits, "root")
    assert out.count() == 0


def test_relations_requires_pos_layer(spark, tiny_pdf, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.engine import SearchEngine
    out = str(tmp_path_factory.mktemp("idx") / "nopos")
    build_index(spark, spark.createDataFrame(tiny_pdf), out,
                BuildConfig(annotations=(), num_partitions=2))
    eng = SearchEngine.open(spark, out)
    with pytest.raises(ValueError, match="pos"):
        eng.relations("det").count()


# ---------------- query extension functions rel()/rspan() ------------
# (reference: XFRelations.java:27-36, registry QueryExtensions.java:142,
# grammar cql.jj:515 queryFunctionCall)
def test_rel_function_equals_operator(tiny_engine):
    eng = tiny_engine
    got = sorted(map(tuple, eng.find('rel("det")')
                     .select("doc_id", "start", "end").collect()))
    want = sorted(map(tuple, relations(eng.index, "det")
                      .select("doc_id", "start", "end").collect()))
    assert got == want and got


def test_rel_function_span_mode_and_direction(tiny_engine):
    eng = tiny_engine
    fwd = eng.find('rel("det|obj", [], "target", "forward")')
    want = relations(eng.index, "det|obj", direction="forward",
                     span_mode="target")
    assert sorted(map(tuple, fwd.select("doc_id", "start", "end")
                      .collect())) == \
        sorted(map(tuple, want.select("doc_id", "start", "end")
                   .collect()))


def test_rel_function_with_target(tiny_engine):
    eng = tiny_engine
    got = {(r.doc_id, r.start, r.end)
           for r in eng.find('rel("det", "visa", "target")').collect()}
    visa = {(r.doc_id, r.start, r.end)
            for r in eng.find('"visa"').collect()}
    # matched-at-target relations report exactly visa hits with a det
    assert got and got <= visa
    # widening span mode to full grows (or keeps) every span
    full = eng.find('rel("det", "visa", "full")')
    assert full.count() == len(got)


def test_rspan_adjusts_relation_operator(tiny_engine):
    eng = tiny_engine
    full = eng.find('[] -det-> "visa"')
    tgt = eng.find('rspan([] -det-> "visa", "target")')
    assert tgt.count() == full.count() > 0
    rows = {(r.doc_id, r.start, r.end) for r in tgt.collect()}
    visa = {(r.doc_id, r.start, r.end)
            for r in eng.find('"visa"').collect()}
    assert rows <= visa


def test_rspan_requires_relation_clause(tiny_engine):
    with pytest.raises(ValueError, match="relation-producing"):
        tiny_engine.find('rspan("visa", "target")').count()


def test_rel_function_parse_errors():
    from blacklab_spark.plans.parser import ParseError, parse
    with pytest.raises(ParseError, match="relation type"):
        parse("rel()")
    with pytest.raises(ParseError, match="span mode"):
        parse('rspan("a")')


def test_rfield_function_equals_facade(tiny_engine):
    """rfield(q, "b") ≙ engine.find_other_field (XFRelations.rfield /
    SpanQueryOtherFieldHits); source field is a no-op."""
    eng = tiny_engine
    got = sorted(map(tuple, eng.find('rfield("the" "visa", "b")')
                     .select("doc_id", "start", "end").collect()))
    want = sorted(map(tuple, eng.find_other_field('"the" "visa"')
                      .select("doc_id", "start", "end").collect()))
    assert got == want and got
    noop = sorted(map(tuple,
                      eng.find('rfield("the" "visa", "contents")')
                      .select("doc_id", "start", "end").collect()))
    assert noop == sorted(map(tuple, eng.find('"the" "visa"')
                              .select("doc_id", "start", "end")
                              .collect()))


def test_rfield_unknown_field_raises(tiny_engine):
    with pytest.raises(ValueError, match="unknown parallel field"):
        tiny_engine.find('rfield("the", "nl")').count()


def test_rcapture_function(tiny_engine, expected_edges):
    """rcapture(q, name, type): hits pass through; relations inside
    each hit land in match_info as name_0, name_1, ... (index-keyed
    list encoding of SpanQueryCaptureRelationsWithinSpan)."""
    eng = tiny_engine
    rows = eng.find('rcapture([]{5,5}, "rels", "det")').collect()
    base = eng.find("[]{5,5}")
    assert len(rows) == base.count() > 0
    dets = {}  # full det spans per doc
    for (d, ty, s0, s1, t0, t1) in expected_edges:
        if ty == "det":
            dets.setdefault(d, []).append((min(s0, t0), max(s1, t1)))
    for r in rows:
        inside = sorted((s, e) for (s, e) in dets.get(r["doc_id"], [])
                        if s >= r["start"] and e <= r["end"])
        got = sorted((v["s"], v["e"]) for k, v in r["match_info"].items())
        assert got == inside, (r["doc_id"], r["start"], r["end"])
        for i in range(len(got)):
            assert f"rels_{i}" in r["match_info"]


def test_rcapture_keeps_existing_captures(tiny_engine):
    """rcapture over a capture-carrying clause merges the old map
    with the new indexed keys (grouping on the sorted entry array —
    the round-3 map-groupBy limitation is gone)."""
    rows = tiny_engine.find('rcapture(A:"the", "r")').limit(5).collect()
    assert rows and all(
        r["match_info"]["A"] == (r["start"], r["end"]) for r in rows)


def test_root_relation_operator(tiny_engine):
    """^--> target (ROOT_DEP_OP, cql.jj:102): root relations (no
    source) whose target matches, reported at the target [0,1)."""
    eng = tiny_engine
    all_roots = eng.find('^--> []')
    n_docs = eng.index.doc_meta.filter("n_tokens >= 1").count()
    assert all_roots.count() == n_docs
    rows = all_roots.select("doc_id", "start", "end").collect()
    assert all(r["start"] == 0 and r["end"] == 1 for r in rows)
    # target narrows to docs whose first token matches
    the_roots = {r["doc_id"] for r in eng.find('^--> "the"').collect()}
    first_tok = {r["doc_id"] for r in eng.index.doc_meta
                 .filter("tokens[0] = 'the'").select("doc_id").collect()}
    assert the_roots == first_tok and the_roots
    # explicit type spelling
    assert eng.find('^-root-> "the"').count() == len(the_roots)
    # unknown root type matches nothing
    assert eng.find('^-det-> []').count() == 0


def test_negated_relation_operator(tiny_engine, expected_edges):
    """A !-det-> B (DEP_OP '!' prefix, cql.jj:103): source hits
    without a det relation to a matching target — hit = the source
    span; positive + negative partition the source hits."""
    eng = tiny_engine
    pos = {(r["doc_id"], r["src_start"], r["src_end"])
           for r in eng.find('[pos="func"] -det-> [pos="noun"]')
           .collect()}
    neg = {(r["doc_id"], r["start"], r["end"])
           for r in eng.find('[pos="func"] !-det-> [pos="noun"]')
           .collect()}
    allsrc = {(r["doc_id"], r["start"], r["end"])
              for r in eng.find('[pos="func"]').collect()}
    assert pos | neg == allsrc and not (pos & neg) and pos and neg
    # negation parses distinctly; plain '!' before a term still works
    from blacklab_spark.plans.parser import parse
    from blacklab_spark.plans import query as Q
    p = parse('"the" !-det-> []')
    assert isinstance(p, Q.RelMatch) and p.negate
    assert isinstance(parse("!the"), Q.Not)


# ---------------- multi-branch relation match / rmatch() -------------
# (reference: cql.jj:282 relationQuery with ';'-separated branches,
# TextPatternRelationMatch.createRelMatchQuery → SpanQueryAnd with
# requireUniqueRelations — SpansAndMultiUniqueRelations.java:51;
# rmatch(): XFRelations.java:152)
def _noun3_centres(tiny_engine):
    """(doc_id, j) of every noun at j with nouns at j-1 and j+1 — the
    only spans that source two different edge types (nn + nmod)."""
    rows = tiny_engine.index.doc_meta.select("doc_id",
                                             "tokens").collect()
    out = set()
    for r in rows:
        pos = [py_pos_tag(t) for t in r["tokens"]]
        for j in range(1, len(pos) - 1):
            if pos[j - 1] == pos[j] == pos[j + 1] == "noun":
                out.add((r["doc_id"], j))
    return out


def test_relmulti_two_branches_envelope(tiny_engine):
    """[pos="noun"] -nmod-> [] ; -nn-> []: middle nouns of noun^3
    trigrams; hit = envelope of source + both relation spans =
    [j-1, j+2)."""
    got = {(r.doc_id, r.start, r.end) for r in tiny_engine.find(
        '[pos="noun"] -nmod-> [] ; -nn-> []').collect()}
    want = {(d, j - 1, j + 2) for d, j in _noun3_centres(tiny_engine)}
    assert got == want and got


def test_relmulti_unique_relations(tiny_engine):
    """Repeating the same branch type must find a SECOND distinct
    edge of that type from the same source — the grammar has at most
    one nn edge per source, so the result is empty (while a single
    branch matches plenty). This is the requireUniqueRelations rule."""
    single = tiny_engine.find('[pos="noun"] -nn-> []')
    double = tiny_engine.find('[pos="noun"] -nn-> [] ; -nn-> []')
    assert single.count() > 0 and double.count() == 0


def test_relmulti_negated_branch(tiny_engine):
    """[pos="noun"] -nmod-> [] ; !-nn-> []: nouns starting a noun-noun
    pair WITHOUT an incoming-source nn edge — i.e. pos[j+1]=noun and
    (j==0 or pos[j-1]!=noun). Envelope = source + nmod full span."""
    got = {(r.doc_id, r.start, r.end) for r in tiny_engine.find(
        '[pos="noun"] -nmod-> [] ; !-nn-> []').collect()}
    rows = tiny_engine.index.doc_meta.select("doc_id",
                                             "tokens").collect()
    want = set()
    for r in rows:
        pos = [py_pos_tag(t) for t in r["tokens"]]
        for j in range(len(pos) - 1):
            if pos[j] == "noun" and pos[j + 1] == "noun" \
                    and (j == 0 or pos[j - 1] != "noun"):
                want.add((r["doc_id"], j, j + 2))
    assert got == want and got


def test_rmatch_same_span_unique_relations(tiny_engine):
    """rmatch(rel("nmod", _, "source"), rel("nn", _, "source")) —
    source spans carrying both edge types = noun^3 centres, reported
    as the shared source span [j, j+1)."""
    got = {(r.doc_id, r.start, r.end) for r in tiny_engine.find(
        'rmatch(rel("nmod", _, "source"), rel("nn", _, "source"))'
    ).collect()}
    want = {(d, j, j + 1) for d, j in _noun3_centres(tiny_engine)}
    assert got == want and got
    # same clause twice: the only candidate edge is shared → empty
    dup = tiny_engine.find(
        'rmatch(rel("nn", _, "source"), rel("nn", _, "source"))')
    assert dup.count() == 0


def test_rmatch_single_and_plain_clauses(tiny_engine):
    """One real clause passes through; non-relation clauses fall back
    to the plain same-span AND."""
    one = tiny_engine.find('rmatch(rel("det"))')
    assert one.count() == tiny_engine.find('rel("det")').count() > 0
    # plain clauses: same-span AND of two word patterns
    both = tiny_engine.find('rmatch("visa", [word="v.*"])')
    visa = tiny_engine.find('"visa"')
    assert both.count() == visa.dropDuplicates(
        ["doc_id", "start", "end"]).count() > 0


def test_relation_capture_labels(tiny_engine):
    """'label: -type-> tgt' records the matched relation's full span
    in match_info (childRelation captureLabel, cql.jj:308)."""
    hits = tiny_engine.find('[pos="func"] d:-det-> [pos="noun"]')
    rows = hits.collect()
    assert rows and all(
        r["match_info"]["d"] == (r["start"], r["end"]) for r in rows)
    # multi-branch: each labeled branch gets its own entry
    multi = tiny_engine.find(
        '[pos="noun"] a:-nmod-> [] ; b:-nn-> []').collect()
    assert multi
    for r in multi:
        mi = r["match_info"]
        # nmod full span sits right of the source, nn left of it
        assert mi["a"]["s"] + 1 == mi["b"]["s"] + 2 == r["start"] + 2
        assert (mi["a"]["e"], mi["b"]["e"]) == (r["end"], r["end"] - 1)
    # unlabeled queries keep the bare schema
    bare = tiny_engine.find('[pos="noun"] -nmod-> [] ; -nn-> []')
    assert "match_info" not in bare.columns
    # root-relation label
    root = tiny_engine.find('c: ^--> [pos="noun"]').limit(5).collect()
    assert root and all(
        r["match_info"]["c"] == (r["start"], r["end"]) for r in root)


def test_rcapture2_within_capture(tiny_engine):
    """rcapture2(A:[]{2,2} [], "A", "rels", "det") — relations
    captured inside the NAMED capture group's span, not the whole hit
    (XFRelations.rcaptureWithinCapture). A det edge [p,p+2) fits in
    A = [s,s+2) iff p == s."""
    hits = tiny_engine.find(
        'rcapture2(A:[]{2,2} [], "A", "rels", "det")').collect()
    assert hits
    rows = {r["doc_id"]: list(r["tokens"])
            for r in tiny_engine.index.doc_meta.select(
                "doc_id", "tokens").collect()}
    for r in hits[:500]:
        mi = r["match_info"]
        assert mi["A"] == (r["start"], r["start"] + 2)
        toks = rows[r["doc_id"]]
        pos = [py_pos_tag(t) for t in toks[r["start"]:r["start"] + 2]]
        has_det = pos == ["func", "noun"]
        assert ("rels_0" in mi) == has_det
        if has_det:
            assert mi["rels_0"] == (r["start"], r["start"] + 2)
            assert "rels_1" not in mi
    # rcapture (v1) now also accepts capture-carrying clauses: the
    # old map-groupBy limitation is gone
    v1 = tiny_engine.find(
        'rcapture(A:[]{2,2} [], "rels", "det")').limit(5).collect()
    assert all("A" in r["match_info"] for r in v1)
    # missing capture name → clear error
    with pytest.raises(ValueError, match="capture group"):
        tiny_engine.find('rcapture2("visa", "A", "rels")').count()


def test_relmulti_pushes_source_docs_into_scan(tiny_engine):
    """The multi-branch edge derivation must be pruned to the SOURCE
    hits' docs (push_hit_docs): with a rare source pattern the
    executed plan carries a doc_id IN (...) parquet filter."""
    df = tiny_engine.find('[word="visa"] -nmod-> [] ; -nn-> []')
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 1-element IN-lists fold to EqualTo — accept either shape
    assert "In(doc_id" in plan or "EqualTo(doc_id" in plan


def test_rel_op_version_suffix_rejected(tiny_engine):
    """-type->version (cql.jj:103 target-version suffix, parallel
    corpora) must fail loudly, not mis-lex as a bare word."""
    from blacklab_spark.plans.parser import ParseError
    with pytest.raises(ParseError, match="cross-field relation"):
        tiny_engine.find('[pos="func"] -det->nl [pos="noun"]')
