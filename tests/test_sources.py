"""File-format sources (SURVEY §2.C source scan) + physical explain."""

from __future__ import annotations

import os

import pytest

from blacklab_spark.sources.files import read_transcripts
from blacklab_spark.sources.transcripts import gen_transcripts_pandas


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    return gen_transcripts_pandas("micro", seed=42)


def _normalize(df):
    return sorted(map(tuple, df.select(
        "conv_id", "turn_idx", "role", "text", "tool").collect()))


def test_jsonl_and_csv_sources_roundtrip(spark, raw, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("src"))
    sdf = spark.createDataFrame(raw)
    sdf.write.mode("overwrite").parquet(f"{base}/p")
    sdf.write.mode("overwrite").json(f"{base}/j")
    (sdf.selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                    "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts")
     .write.mode("overwrite").option("header", "true").csv(f"{base}/c"))
    ref = _normalize(read_transcripts(spark, f"{base}/p", "parquet"))
    assert _normalize(read_transcripts(spark, f"{base}/j", "jsonl")) == ref
    assert _normalize(read_transcripts(spark, f"{base}/c", "csv")) == ref
    assert len(ref) == len(raw)


def test_source_schema_validation(spark):
    import pandas as pd
    bad = spark.createDataFrame(pd.DataFrame({"conv_id": ["a"],
                                              "text": ["x"]}))
    from blacklab_spark.sources.files import _canonicalize
    with pytest.raises(ValueError, match="missing columns"):
        _canonicalize(bad)
    with pytest.raises(ValueError, match="unknown source format"):
        read_transcripts(spark, "/nonexistent", "xml")


def test_explain_reports_physical_choice(tiny_engine):
    s = tiny_engine.explain_cql('"visa" [word="th.*"]')
    assert "original" in s and "rewritten" in s
    assert "postings" in s  # leaf strategy reported
    s2 = tiny_engine.explain_cql('"very" "good"')
    assert "postings position-intersection" in s2 or "FiSeq" in s2
