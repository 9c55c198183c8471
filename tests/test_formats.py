"""Declarative input-format configs (sources/formats.py) — the
user-uploadable .blf.yaml analog (ConfigInputFormat.java,
RequestHandlerAddFormat.java) — plus the hits-based collocation
operator behind /hits?calc=colloc."""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pytest

from blacklab_spark.sources.formats import FormatConfig


def _cfg(**kw):
    base = {"name": "fmt1", "baseFormat": "csv"}
    base.update(kw)
    return json.dumps(base)


# ---- validation ------------------------------------------------------

def test_config_validation_errors():
    for bad, msg in [
        (_cfg(name="1bad"), "illegal format name"),
        (_cfg(baseFormat="parquet"), "unknown baseFormat"),
        (_cfg(columns={"nope": "x"}), "unknown target fields"),
        (_cfg(defaults={"text": "x"}), "cannot be defaulted"),
        (_cfg(columns={"role": "r"}, defaults={"role": "user"}),
         "both mapped and defaulted"),
        (_cfg(columns={"role": "same", "tool": "same"}),
         "same source column"),
        (_cfg(baseFormat="xml", columns={"role": "r"}),
         "fixed document structure"),
        (_cfg(baseFormat="tsv", options={"sep": ";"}),
         "applies to baseFormat csv"),
        (_cfg(options={"bogus": 1}), "unknown options"),
        ("{not json", "not valid JSON"),
        ('["list"]', "must be a JSON object"),
        (_cfg(extra=1), "unknown format config keys"),
    ]:
        with pytest.raises(ValueError, match=msg):
            FormatConfig.from_json(bad)


def test_config_roundtrip():
    cfg = FormatConfig.from_json(_cfg(
        displayName="Chat CSV", columns={"text": "utterance"},
        defaults={"tool": None}))
    again = FormatConfig.from_json(cfg.to_json())
    assert again == cfg


# ---- mapped reads ----------------------------------------------------

def test_mapped_csv_read(spark, tmp_path):
    p = tmp_path / "chat.csv"
    p.write_text(
        "conversation;n;speaker;utterance\n"
        "c1;0;user;the visa application\n"
        "c1;1;assistant;very good thanks\n")
    cfg = FormatConfig.from_json(_cfg(
        columns={"conv_id": "conversation", "turn_idx": "n",
                 "role": "speaker", "text": "utterance"},
        defaults={"tool": None, "ts": "2026-01-01 00:00:00"},
        options={"sep": ";"}))
    rows = {(r.conv_id, r.turn_idx): r
            for r in cfg.read(spark, str(p)).collect()}
    assert set(rows) == {("c1", 0), ("c1", 1)}
    r0 = rows[("c1", 0)]
    assert (r0.role, r0.text, r0.tool) == (
        "user", "the visa application", None)
    assert r0.ts is not None and r0.ts.year == 2026


def test_mapped_jsonl_read_same_name_passthrough(spark, tmp_path):
    # unmapped fields read a source column of the SAME name
    p = tmp_path / "chat.jsonl"
    p.write_text(json.dumps({
        "conv_id": "c9", "turn_idx": 3, "speaker": "user",
        "text": "search the browser",
        "ts": "2026-01-01T00:00:00.000Z"}) + "\n")
    cfg = FormatConfig.from_json(_cfg(
        baseFormat="jsonl", columns={"role": "speaker"},
        defaults={"tool": "calc"}))
    (r,) = cfg.read(spark, str(p)).collect()
    assert (r.conv_id, r.turn_idx, r.role, r.tool) == (
        "c9", 3, "user", "calc")


def test_metadata_only_config_aliases_base_reader(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text(json.dumps({
        "conv_id": "c1", "turn_idx": 0, "role": "user",
        "text": "hello there", "tool": None,
        "ts": "2026-01-01T00:00:00.000Z"}) + "\n")
    cfg = FormatConfig.from_json(_cfg(baseFormat="jsonl",
                                      displayName="plain"))
    from blacklab_spark.sources.files import read_transcripts
    got = cfg.read(spark, str(p)).collect()
    want = read_transcripts(spark, str(p), "jsonl").collect()
    assert got == want


# ---- xslt ------------------------------------------------------------

def test_xslt_only_for_xml_base():
    xcfg = FormatConfig.from_json(_cfg(baseFormat="xml"))
    xslt = xcfg.xslt()
    root = ET.fromstring(xslt)  # well-formed
    assert root.tag.endswith("stylesheet")
    assert "local-name(.)='turn'" in xslt
    with pytest.raises(ValueError, match="cannot be converted to XSLT"):
        FormatConfig.from_json(_cfg(baseFormat="csv")).xslt()


# ---- hits-based collocations ----------------------------------------

def test_collocations_from_hits_matches_term_collocations(tiny_engine):
    from blacklab_spark.operators import hits as H
    idx = tiny_engine.index
    term = H.collocations(idx, "visa", window=3).collect()
    hits = tiny_engine.find('"visa"')
    general = H.collocations_from_hits(idx, hits, window=3).collect()
    assert {(r.term, r["count"]) for r in term} == \
        {(r.term, r["count"]) for r in general} and term


def test_collocations_from_hits_excludes_whole_span(tiny_engine):
    from blacklab_spark.operators import hits as H
    idx = tiny_engine.index
    hits = tiny_engine.find('"the" []')  # width-2 spans
    rows = H.collocations_from_hits(idx, hits, window=2).collect()
    assert rows
    # manual oracle over the token arrays
    import collections
    toks = {r.doc_id: r.tokens
            for r in idx.doc_meta.select("doc_id", "tokens").collect()}
    want = collections.Counter()
    for h in hits.collect():
        ts = toks[h.doc_id]
        lo = max(0, h.start - 2)
        hi = min(len(ts) - 1, h.end - 1 + 2)
        for i in range(lo, hi + 1):
            if not (h.start <= i < h.end):
                want[ts[i]] += 1
    assert {(r.term, r["count"]) for r in rows} == set(want.items())
