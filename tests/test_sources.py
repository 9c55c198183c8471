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


CHA_FIXTURE = ("@UTF8\n@PID:\t11312/c-00044224-1\n@Begin\n"
               "@Participants:\tCHI Target_Child, MOT Mother\n"
               "*MOT:\tare you okay ?\n"
               "*CHI:\tyes I am\n\tvery happy today . \x152500_4800\x15\n"
               "%mor:\tco|yes pro|I\n"
               "*MOT:\tgood !\n@End\n")


def test_read_chat(spark, tmp_path):
    (tmp_path / "conv_a.cha").write_text(CHA_FIXTURE)
    from blacklab_spark.sources.files import read_chat
    rows = {r["turn_idx"]: r for r in
            read_chat(spark, str(tmp_path / "*.cha")).collect()}
    assert len(rows) == 3                         # %mor / @headers skipped
    assert all(r["conv_id"] == "11312/c-00044224-1" for r in rows.values())
    assert rows[0]["role"] == "MOT" and rows[0]["text"] == "are you okay ?"
    # continuation line re-joined, media bullet stripped from text
    assert rows[1]["role"] == "CHI"
    assert rows[1]["text"] == "yes I am very happy today ."
    # bullet start ms becomes the timestamp
    assert rows[1]["ts"].microsecond == 500000
    assert rows[2]["text"] == "good !"


def test_chat_builds(spark, tmp_path):
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.sources.files import read_transcripts
    (tmp_path / "a.cha").write_text(CHA_FIXTURE)
    out = str(tmp_path / "idx")
    build_index(spark, read_transcripts(spark, str(tmp_path / "*.cha"),
                                        fmt="chat"),
                out, BuildConfig(num_partitions=2))
    eng = SearchEngine.open(spark, out)
    assert eng.find('"happy"').count() == 1
    assert eng.topk("okay", k=1, role="MOT").count() == 1


FOLIA_FIXTURE = """<?xml version="1.0"?>
<FoLiA xmlns="http://ilk.uvt.nl/folia" xml:id="folia_demo" version="2.0">
 <text>
  <s xml:id="s.1" speaker="alice">
   <w xml:id="w.1"><t>Cafés</t><pos class="NOUN"/><lemma class="café"/></w>
   <w xml:id="w.2" space="no"><t>are</t><pos class="VERB"/><lemma class="be"/></w>
   <w xml:id="w.3"><t>!</t><pos class="PUNCT"/></w>
  </s>
  <s xml:id="s.2">
   <w><t>a &amp; b</t><pos class="X"/><lemma class="ab"/></w>
   <w><t>end</t></w>
  </s>
 </text>
</FoLiA>
"""


def test_read_folia(spark, tmp_path):
    (tmp_path / "doc1.xml").write_text(FOLIA_FIXTURE, encoding="utf-8")
    from blacklab_spark.sources.files import read_folia
    rows = {r["turn_idx"]: r for r in
            read_folia(spark, str(tmp_path / "*.xml")).collect()}
    assert len(rows) == 2
    assert rows[0]["conv_id"] == "folia_demo"
    assert rows[0]["role"] == "alice" and rows[1]["role"] is None
    # space="no" honored; pre-annotated layers taken as given
    assert rows[0]["text"] == "Cafés are!"
    assert rows[0]["tokens_s"] == ["Cafés", "are", "!"]
    assert rows[0]["tokens_pos"] == ["NOUN", "VERB", "PUNCT"]
    assert [list(v) for v in rows[0]["tokens_lemma"]] == \
        [["café"], ["be"], ["!"]]
    # entity unescape; missing pos -> "_"; missing lemma -> surface form
    assert rows[1]["tokens_s"] == ["a & b", "end"]
    assert rows[1]["tokens_pos"] == ["X", "_"]
    assert [list(v) for v in rows[1]["tokens_lemma"]] == [["ab"], ["end"]]


def test_folia_builds_preannotated(spark, tmp_path):
    """FoLiA feeds the pre-tokenized build path: the given pos layer
    is queryable and the word layer folds the given forms."""
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.sources.files import read_transcripts
    (tmp_path / "d.xml").write_text(FOLIA_FIXTURE, encoding="utf-8")
    out = str(tmp_path / "idx")
    build_index(spark, read_transcripts(spark, str(tmp_path / "*.xml"),
                                        fmt="folia"),
                out, BuildConfig(num_partitions=2,
                                 annotations=("pos", "lemma")))
    eng = SearchEngine.open(spark, out)
    assert eng.find('[pos="NOUN"]').count() == 1      # the given UPOS
    assert eng.find('"cafes"').count() == 1           # fold of given form
    assert eng.find('[lemma="be"]').count() == 1


WPL_FIXTURE = """<doc id="wdoc1" src="news">
<s>
The\tDET\tthe
visa\tNOUN\tvisa
<g/>
.\tPUNCT\t.
</s>
<s>
Granted\tVERB\tgrant
</s>
</doc>
<doc>
<s>
ok\tINTJ\tok
</s>
</doc>
"""


def test_read_wpl(spark, tmp_path):
    (tmp_path / "corp.wpl").write_text(WPL_FIXTURE)
    from blacklab_spark.sources.files import read_wpl
    rows = {(r["conv_id"], r["turn_idx"]): r for r in
            read_wpl(spark, str(tmp_path / "*.wpl")).collect()}
    assert set(rows) == {("wdoc1", 0), ("wdoc1", 1), ("corp-1", 0)}
    r0 = rows[("wdoc1", 0)]
    # glue tag suppresses the space before '.'
    assert r0["text"] == "The visa."
    assert r0["tokens_s"] == ["The", "visa", "."]
    assert r0["tokens_pos"] == ["DET", "NOUN", "PUNCT"]
    assert [list(v) for v in r0["tokens_lemma"]] == [["the"], ["visa"], ["."]]
    assert rows[("corp-1", 0)]["tokens_s"] == ["ok"]


FROG_FIXTURE = ("1\tDit\tdit\t[dit]\tVNW\t0.9\tO\tB-NP\t0\tROOT\n"
                "2\twerkt\twerken\t[werk]\tWW\t0.8\tO\tB-VP\t1\tsu\n"
                "\n"
                "1\tKlaar\tklaar\t[klaar]\tADJ\t0.7\tO\tB-AP\t0\tROOT\n")


def test_read_frog(spark, tmp_path):
    (tmp_path / "conv7.tsv").write_text(FROG_FIXTURE)
    from blacklab_spark.sources.files import read_frog
    rows = {r["turn_idx"]: r for r in
            read_frog(spark, str(tmp_path / "*.tsv")).collect()}
    assert len(rows) == 2
    assert rows[0]["conv_id"] == "conv7"
    assert rows[0]["text"] == "Dit werkt"
    assert rows[0]["tokens_s"] == ["Dit", "werkt"]
    assert rows[0]["tokens_pos"] == ["VNW", "WW"]
    assert [list(v) for v in rows[0]["tokens_lemma"]] == \
        [["dit"], ["werken"]]
    assert rows[1]["tokens_s"] == ["Klaar"]


def test_wpl_builds_preannotated(spark, tmp_path):
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.sources.files import read_transcripts
    (tmp_path / "c.wpl").write_text(WPL_FIXTURE)
    out = str(tmp_path / "idx")
    build_index(spark, read_transcripts(spark, str(tmp_path / "*.wpl"),
                                        fmt="wpl"),
                out, BuildConfig(num_partitions=2,
                                 annotations=("pos", "lemma")))
    eng = SearchEngine.open(spark, out)
    assert eng.find('[pos="NOUN"]').count() == 1
    assert eng.find('[lemma="grant"]').count() == 1


EAF_FIXTURE = """<?xml version="1.0"?>
<ANNOTATION_DOCUMENT AUTHOR="t" DATE="2024-01-01" FORMAT="3.0">
 <TIME_ORDER>
  <TIME_SLOT TIME_SLOT_ID="ts1" TIME_VALUE="1500"/>
  <TIME_SLOT TIME_SLOT_ID="ts2" TIME_VALUE="2000"/>
  <TIME_SLOT TIME_SLOT_ID="ts3" TIME_VALUE="4200"/>
  <TIME_SLOT TIME_SLOT_ID="ts4" TIME_VALUE="5000"/>
 </TIME_ORDER>
 <TIER LINGUISTIC_TYPE_REF="Words" PARTICIPANT="spkA" TIER_ID="W1">
  <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a1"
    TIME_SLOT_REF1="ts1" TIME_SLOT_REF2="ts2">
   <ANNOTATION_VALUE>hello</ANNOTATION_VALUE>
  </ALIGNABLE_ANNOTATION></ANNOTATION>
  <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a2"
    TIME_SLOT_REF1="ts2" TIME_SLOT_REF2="ts3">
   <ANNOTATION_VALUE>world</ANNOTATION_VALUE>
  </ALIGNABLE_ANNOTATION></ANNOTATION>
 </TIER>
 <TIER LINGUISTIC_TYPE_REF="Words" PARTICIPANT="spkB" TIER_ID="W2">
  <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a3"
    TIME_SLOT_REF1="ts3" TIME_SLOT_REF2="ts4">
   <ANNOTATION_VALUE>bye</ANNOTATION_VALUE>
  </ALIGNABLE_ANNOTATION></ANNOTATION>
 </TIER>
 <TIER LINGUISTIC_TYPE_REF="Lemma" TIER_ID="L">
  <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="l1" ANNOTATION_REF="a1">
   <ANNOTATION_VALUE>hello</ANNOTATION_VALUE></REF_ANNOTATION></ANNOTATION>
  <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="l2" ANNOTATION_REF="a2">
   <ANNOTATION_VALUE>world</ANNOTATION_VALUE></REF_ANNOTATION></ANNOTATION>
 </TIER>
 <TIER LINGUISTIC_TYPE_REF="PoS" TIER_ID="P">
  <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="p1" ANNOTATION_REF="a1">
   <ANNOTATION_VALUE>INTJ</ANNOTATION_VALUE></REF_ANNOTATION></ANNOTATION>
  <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="p3" ANNOTATION_REF="a3">
   <ANNOTATION_VALUE>INTJ</ANNOTATION_VALUE></REF_ANNOTATION></ANNOTATION>
 </TIER>
</ANNOTATION_DOCUMENT>
"""


def test_read_eaf(spark, tmp_path):
    (tmp_path / "sess1.eaf").write_text(EAF_FIXTURE)
    from blacklab_spark.sources.files import read_eaf
    rows = {r["turn_idx"]: r for r in
            read_eaf(spark, str(tmp_path / "*.eaf")).collect()}
    assert len(rows) == 2                       # one turn per Words tier
    assert rows[0]["conv_id"] == "sess1"
    assert rows[0]["role"] == "spkA" and rows[1]["role"] == "spkB"
    assert rows[0]["text"] == "hello world"
    assert rows[0]["tokens_s"] == ["hello", "world"]
    # standoff joins: pos present for a1 only, lemma falls back for a3
    assert rows[0]["tokens_pos"] == ["INTJ", "_"]
    assert [list(v) for v in rows[1]["tokens_lemma"]] == [["bye"]]
    # TIME_ORDER resolution: turn ts = first slot's ms offset
    assert rows[0]["ts"].microsecond == 500000          # 1500 ms
    assert rows[1]["ts"].second % 10 == 4               # 4200 ms


TCF_FIXTURE = """<?xml version="1.0"?>
<D-Spin><TextCorpus lang="en">
 <tokens>
  <token ID="t1">The</token>
  <token ID="t2">visa</token>
  <token ID="t3">works</token>
  <token ID="t4">Done</token>
 </tokens>
 <sentences>
  <sentence ID="s1" tokenIDs="t1 t2 t3"/>
  <sentence ID="s2" tokenIDs="t4"/>
 </sentences>
 <lemmas>
  <lemma ID="l1" tokenIDs="t1">the</lemma>
  <lemma ID="l2" tokenIDs="t2 t4">visa</lemma>
 </lemmas>
 <POStags tagset="upos">
  <tag ID="p1" tokenIDs="t2">NOUN</tag>
  <tag ID="p2" tokenIDs="t3">VERB</tag>
 </POStags>
</TextCorpus></D-Spin>
"""


def test_read_tcf(spark, tmp_path):
    (tmp_path / "corp1.tcf").write_text(TCF_FIXTURE)
    from blacklab_spark.sources.files import read_tcf
    rows = {r["turn_idx"]: r for r in
            read_tcf(spark, str(tmp_path / "*.tcf")).collect()}
    assert len(rows) == 2
    assert rows[0]["conv_id"] == "corp1"
    assert rows[0]["text"] == "The visa works"
    assert rows[0]["tokens_s"] == ["The", "visa", "works"]
    assert rows[0]["tokens_pos"] == ["_", "NOUN", "VERB"]
    assert [list(v) for v in rows[0]["tokens_lemma"]] == \
        [["the"], ["visa"], ["works"]]
    # multi-token lemma ref (t2 t4) reaches the second sentence too
    assert [list(v) for v in rows[1]["tokens_lemma"]] == [["visa"]]


NAF_FIXTURE = """<?xml version="1.0"?>
<NAF xml:lang="en" version="3.0">
 <text>
  <wf id="w1" sent="1" offset="0" length="3">The</wf>
  <wf id="w2" sent="1" offset="4" length="4">visa</wf>
  <wf id="w3" sent="2" offset="9" length="4">Done</wf>
 </text>
 <terms>
  <term id="term1" lemma="the" pos="DET"><span><target id="w1"/></span></term>
  <term id="term2" lemma="visa" pos="NOUN"><span><target id="w2"/></span></term>
 </terms>
</NAF>
"""


def test_read_naf(spark, tmp_path):
    (tmp_path / "doc9.naf").write_text(NAF_FIXTURE)
    from blacklab_spark.sources.files import read_naf
    rows = {r["turn_idx"]: r for r in
            read_naf(spark, str(tmp_path / "*.naf")).collect()}
    assert len(rows) == 2                    # sent attr groups turns
    assert rows[0]["conv_id"] == "doc9"
    assert rows[0]["text"] == "The visa"
    assert rows[0]["tokens_pos"] == ["DET", "NOUN"]
    assert [list(v) for v in rows[0]["tokens_lemma"]] == \
        [["the"], ["visa"]]
    # w3 has no term: pos default, lemma falls back to the form
    assert rows[1]["tokens_pos"] == ["_"]
    assert [list(v) for v in rows[1]["tokens_lemma"]] == [["Done"]]


CMDI_FIXTURE = """<?xml version="1.0"?>
<CMD CMDVersion="1.2">
 <Header>
  <MdCreator>tool</MdCreator>
  <MdSelfLink> conv-42 </MdSelfLink>
 </Header>
 <Components>
  <Session>
    <Name>morning call</Name>
    <Country>NL</Country>
    <Actors><Actor><Role>interviewer</Role><Age>31</Age></Actor></Actors>
    <Empty></Empty>
  </Session>
 </Components>
</CMD>
"""


def test_read_cmdi(spark, tmp_path):
    """Leaf-element metadata harvest cross-checked against an
    ElementTree parse (cmdi.blf.yaml forEachPath leaf rule)."""
    import xml.etree.ElementTree as ET
    (tmp_path / "sess.cmdi").write_text(CMDI_FIXTURE)
    from blacklab_spark.sources.files import read_cmdi, cmdi_metadata_map
    got = {(r["conv_id"], r["field"], r["value"]) for r in
           read_cmdi(spark, str(tmp_path / "*.cmdi")).collect()}
    root = ET.fromstring(CMDI_FIXTURE)
    expect = {("conv-42", el.tag, el.text.strip())
              for el in root.iter()
              if len(el) == 0 and el.text and el.text.strip()}
    assert got == expect
    assert ("conv-42", "Role", "interviewer") in got
    assert ("conv-42", "Age", "31") in got
    m = cmdi_metadata_map(
        read_cmdi(spark, str(tmp_path / "*.cmdi"))).collect()
    assert len(m) == 1 and m[0]["metadata"]["Country"] == "NL"
