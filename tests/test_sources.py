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
        read_transcripts(spark, "/nonexistent", "avro")


def test_tsv_source_roundtrip(spark, raw, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("tsv"))
    (spark.createDataFrame(raw)
     .selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                 "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts")
     .write.mode("overwrite").option("header", "true")
     .option("sep", "\t").csv(base))
    out = _normalize(read_transcripts(spark, base, "tsv"))
    assert len(out) == len(raw)
    assert out == _normalize(spark.createDataFrame(raw))


def _write_xml(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "convA.xml"), "w") as f:
        f.write(
            '<conversation id="convA">\n'
            '  <turn role="user" ts="2026-01-01 10:00:00">hello <ne '
            'type="per">World Bank</ne> again</turn>\n'
            '  <turn role="assistant" ts="2026-01-01 10:00:05" '
            'tool="search">the answer\nspans lines</turn>\n'
            '</conversation>\n')
    with open(os.path.join(dirpath, "convB.xml"), "w") as f:
        # no root id attribute: conv_id falls back to the file name
        f.write('<conversation>'
                '<turn role="user" ts="2026-01-02 09:00:00">solo turn'
                '</turn></conversation>')


def test_xml_source(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("xml"))
    _write_xml(base)
    df = read_transcripts(spark, base, "xml")
    rows = {(r.conv_id, r.turn_idx): r for r in df.collect()}
    assert set(rows) == {("convA", 0), ("convA", 1), ("convB", 0)}
    a0 = rows[("convA", 0)]
    assert a0.role == "user" and a0.tool is None
    assert a0.text == 'hello <ne type="per">World Bank</ne> again'
    assert str(a0.ts).startswith("2026-01-01 10:00:00")
    a1 = rows[("convA", 1)]
    assert a1.tool == "search" and "answer\nspans" in a1.text
    assert rows[("convB", 0)].role == "user"


def test_xml_source_builds_tag_layer(spark, tmp_path_factory):
    """A tags=True build over the XML source indexes inline markup as
    the _spans layer and tokenizes the stripped text."""
    base = str(tmp_path_factory.mktemp("xmlidx"))
    _write_xml(f"{base}/src")
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.engine import SearchEngine
    df = read_transcripts(spark, f"{base}/src", "xml")
    build_index(spark, df, f"{base}/idx",
                BuildConfig(num_partitions=2, tags=True))
    eng = SearchEngine.open(spark, f"{base}/idx")
    ne = eng.find('<ne/>').collect()
    assert len(ne) == 1 and ne[0].end - ne[0].start == 2  # "World Bank"
    inside = eng.find('"bank" within <ne type="per"/>').collect()
    assert len(inside) == 1


def test_explain_reports_physical_choice(tiny_engine):
    s = tiny_engine.explain_cql('"visa" [word="th.*"]')
    assert "original" in s and "rewritten" in s
    assert "postings" in s  # leaf strategy reported
    s2 = tiny_engine.explain_cql('"very" "good"')
    assert "postings position-intersection" in s2 or "FiSeq" in s2


def test_read_plaintext(spark, tmp_path):
    (tmp_path / "conv-x.txt").write_text(
        "Hello there.\n\nHi, how can I  help?\n\n \n\nVisa question.\n")
    (tmp_path / "conv-y.txt").write_text("Single turn only.")
    from blacklab_spark.sources.files import read_plaintext
    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in read_plaintext(spark, str(tmp_path)).collect()}
    assert set(rows) == {("conv-x", 0), ("conv-x", 1), ("conv-x", 2),
                         ("conv-y", 0)}
    # blank-only paragraph skipped, whitespace collapsed, roles alternate
    assert rows[("conv-x", 1)]["text"] == "Hi, how can I help?"
    assert rows[("conv-x", 2)]["text"] == "Visa question."
    assert rows[("conv-x", 0)]["role"] == "user"
    assert rows[("conv-x", 1)]["role"] == "assistant"
    assert rows[("conv-y", 0)]["ts"] is not None


def test_plaintext_builds(spark, tmp_path):
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.sources.files import read_transcripts
    (tmp_path / "c.txt").write_text("the visa\n\nvisa approved")
    out = str(tmp_path / "idx")
    build_index(spark, read_transcripts(spark, str(tmp_path), fmt="txt"),
                out, BuildConfig(num_partitions=2))
    assert SearchEngine.open(spark, out).find('"visa"').count() == 2
