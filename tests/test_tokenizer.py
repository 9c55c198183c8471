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
