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


def test_before_context_no_wraparound(tiny_engine):
    """Regression (ADVICE r01): before:word:i:2 for hits within 2
    tokens of doc start must group under '' — not wrap to the doc's
    LAST tokens (Spark negative element_at indexes from the end)."""
    from pyspark.sql import functions as F
    from blacklab_spark.operators.properties import (_with_meta,
                                                     compile_property)
    idx = tiny_engine.index
    # hits at position 0 of every doc: before:word:i:2 → idx = -1
    hits = idx.doc_meta.filter(F.col("n_tokens") >= 3).select(
        "doc_id", F.lit(0).cast("int").alias("start"),
        F.lit(1).cast("int").alias("end"))
    frame = _with_meta(idx, hits)
    vals = [r[0] for r in
            frame.select(compile_property("before:word:i:2")).collect()]
    assert vals and all(v == "" for v in vals)


def test_group_by_context_word_no_wraparound(tiny_engine):
    """Same wraparound in group_hits_by_context_word for offset<=-2:
    hits at doc start must be dropped (NULL group), not grouped under
    end-of-doc tokens."""
    from pyspark.sql import functions as F
    idx = tiny_engine.index
    hits = idx.doc_meta.filter(F.col("n_tokens") >= 3).select(
        "doc_id", F.lit(0).cast("int").alias("start"),
        F.lit(1).cast("int").alias("end"))
    out = tiny_engine.group_hits_by_context_word(hits, offset=-2)
    assert out.count() == 0


def test_decade_and_capture_keys(tiny_engine):
    """Round-2 property keys: decade (DocumentDecade) and capture:
    (HitPropertyCaptureGroup)."""
    from pyspark.sql import functions as F
    import blacklab_spark.operators.properties as P
    idx = tiny_engine.index
    frame = P._with_meta(idx, tiny_engine.term_hits("visa"))
    decades = {r[0] for r in
               frame.select(P.compile_property("decade")).collect()}
    assert decades == {2020}
    hits = tiny_engine.find('x:("visa")')
    f2 = P._with_meta(idx, hits.select("doc_id", "start", "end",
                                       "match_info"))
    caps = {r[0] for r in
            f2.select(P.compile_property("capture:x")).collect()}
    assert caps == {"visa"}


def test_collated_sort_folds_accents(spark, tmp_path):
    """Sort by hit text must use the folded collation key: 'étude'
    sorts with 'etude', not after 'zebra' (binary UTF-8 would)."""
    import pandas as pd
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.engine import SearchEngine
    import blacklab_spark.operators.properties as P
    pdf = pd.DataFrame({
        "conv_id": ["c1"] * 3, "turn_idx": [0, 1, 2],
        "role": ["user"] * 3,
        "text": ["zebra word", "étude word", "apple word"],
        "tool": [None] * 3,
        "ts": pd.to_datetime(["2024-01-01"] * 3),
    })
    out = str(tmp_path / "coll")
    build_index(spark, spark.createDataFrame(pdf), out,
                BuildConfig(block_size=8, bucket_size=8, num_partitions=1))
    eng = SearchEngine.open(spark, out)
    # hits = first token of each turn; @s layer keeps the accent
    from pyspark.sql import functions as F
    frame = eng.index.doc_meta.select(
        "doc_id", F.lit(0).cast("int").alias("start"),
        F.lit(1).cast("int").alias("end"),
        F.col("tokens_s").alias("tokens"))
    key = P.compile_property("hit")
    ordered = [r[0] for r in
               frame.orderBy(P.collation_key(key).asc(), key.asc())
               .select(key).collect()]
    assert ordered == ["apple", "étude", "zebra"]


def test_context_property_key(tiny_engine, tiny_oracle):
    """context:word:i:k — full ±k window text (ContextPart analog)."""
    import blacklab_spark.operators.properties as P
    idx = tiny_engine.index
    frame = P._with_meta(idx, tiny_engine.term_hits("visa"))
    got = {(r["doc_id"], r["start"]): r["ctx"] for r in
           frame.select("doc_id", "start",
                        P.compile_property("context:word:i:2").alias("ctx"))
           .collect()}
    for (d, s), ctx in got.items():
        toks = tiny_oracle.tokens[d]
        lo = max(0, s - 2)
        assert ctx == " ".join(toks[lo:s + 1 + 2])


def test_collation_icu_multichar_folds(spark):
    """TRUE ICU collation (round-3): ß ≡ ss and œ ≡ oe at primary
    strength — the multi-char folds the round-2 translate-table
    surrogate documented as unsupported."""
    from pyspark.sql import functions as F

    from blacklab_spark.operators.properties import collation_key
    df = spark.createDataFrame(
        [("Straße",), ("strasse",), ("strasze",),
         ("œuf",), ("oeuf",), ("ozz",)], "w string")
    out = [r.w for r in df.orderBy(collation_key(F.col("w")),
                                   F.col("w")).collect()]
    assert abs(out.index("Straße") - out.index("strasse")) == 1
    assert abs(out.index("œuf") - out.index("oeuf")) == 1
    assert out.index("œuf") < out.index("ozz")
    assert out.index("strasse") < out.index("strasze")


def test_group_hits_subcorpus(idx, tiny_oracle):
    """Per-group subcorpus sizes + relative frequency (BLS grouped
    subcorpusSize): subcorpus = ALL docs sharing the group's doc-field
    value, hits or not; rel_freq = hits / subcorpus tokens."""
    import pytest as _pt
    from blacklab_spark.operators import spans as S_
    hits = S_.term(idx, "visa")
    rows = {r["key_0"]: r for r in
            P.group_hits_subcorpus(idx, hits, "field:role").collect()}
    exp_counts: dict = {}
    for d, ps in tiny_oracle.postings["visa"].items():
        role = tiny_oracle.meta[d]["role"]
        exp_counts[role] = exp_counts.get(role, 0) + len(ps)
    exp_sub: dict = {}
    for d, m in tiny_oracle.meta.items():
        docs, toks = exp_sub.get(m["role"], (0, 0))
        exp_sub[m["role"]] = (docs + 1, toks + len(tiny_oracle.tokens[d]))
    assert set(rows) == set(exp_counts)
    for role, r in rows.items():
        docs, toks = exp_sub[role]
        assert r["count"] == exp_counts[role]
        assert r["subcorpus_docs"] == docs
        assert r["subcorpus_tokens"] == toks
        assert r["rel_freq"] == _pt.approx(exp_counts[role] / toks)
    # hit-text keys have no per-group subcorpus
    with _pt.raises(ValueError):
        P.group_hits_subcorpus(idx, hits, "hit")
