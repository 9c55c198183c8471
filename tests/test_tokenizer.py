import duckdb
import pytest

from blacklab_spark.tokenizer import (
    duckdb_tokens_i,
    py_tokens_insensitive,
    py_tokens_sensitive,
    tokens_insensitive,
)


def test_python_tokenizer():
    assert py_tokens_insensitive("Hello, World! 42x") == ["hello", "world", "42x"]
    assert py_tokens_insensitive("") == []
    assert py_tokens_sensitive("Hello X") == ["Hello", "X"]


@pytest.mark.parametrize("text", [
    "The quick brown fox", "a,b;;c  d", "", "  ", "UPPER lower 123",
    "visa application please", "x" * 500,
])
def test_three_way_agreement(spark, text):
    """Spark, DuckDB and Python must tokenize identically — the
    rank-identity gate rests on this."""
    py = py_tokens_insensitive(text)
    row = spark.createDataFrame([(text,)], "text string") \
        .select(tokens_insensitive("text").alias("t")).collect()[0]
    assert row["t"] == py
    duck = duckdb.sql(
        f"select {duckdb_tokens_i('?')} ", params=[text]).fetchone()[0]
    assert list(duck) == py


def test_corpus_agreement(spark, tiny_pdf):
    """Whole tiny corpus: Spark tokenization == Python tokenization."""
    sdf = spark.createDataFrame(tiny_pdf)
    rows = sdf.select("conv_id", "turn_idx",
                      tokens_insensitive("text").alias("t")).collect()
    by_key = {(r["conv_id"], r["turn_idx"]): r["t"] for r in rows}
    for rec in tiny_pdf.to_dict("records"):
        assert by_key[(rec["conv_id"], rec["turn_idx"])] == \
            py_tokens_insensitive(rec["text"])


# ---------------- tokenizer v2 (Unicode) -----------------------------
V2_TEXTS = [
    "Café Über naïve ÉLAN", "Привет МИР спасибо", "ελληνικά ΚΑΛΆ",
    "łódź Đông Hà São", "日本語 と 東京", "mixed Ästhetik 42x",
    "foo_bar don't 3.14", "étude",
]


@pytest.mark.parametrize("text", V2_TEXTS)
def test_three_way_agreement_unicode(spark, text):
    """v2: Unicode word runs + lower + accent-fold agree across
    Spark (Java regex), DuckDB (RE2) and Python (unicodedata)."""
    py = py_tokens_insensitive(text)
    row = spark.createDataFrame([(text,)], "text string") \
        .select(tokens_insensitive("text").alias("t")).collect()[0]
    assert row["t"] == py
    duck = duckdb.sql(
        f"select {duckdb_tokens_i('?')} ", params=[text]).fetchone()[0]
    assert list(duck) == py


def test_v2_folding_semantics():
    """@i layer: case + Latin-accent insensitive (reference
    BLStandardAnalyzer @i = lowercase + desensitize); non-Latin
    scripts lowercase but keep diacritics; CJK runs survive."""
    assert py_tokens_insensitive("Café café CAFE") == ["cafe"] * 3
    assert py_tokens_insensitive("Łódź") == ["lodz"]
    assert py_tokens_insensitive("ΚΑΛΆ") == ["καλά"]    # Greek keeps accent
    assert py_tokens_insensitive("日本語") == ["日本語"]
    assert py_tokens_sensitive("Café") == ["Café"]      # @s untouched
