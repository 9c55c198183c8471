"""CoNLL-U source + pre-annotated build (reference:
engine/src/main/resources/formats/conll-u.blf.yaml — word=col2,
lemma=col3, pos=col4; sentence block = turn, file = conversation).

The pre-annotated path is the reference's pre-tagged-corpus mode: the
input defines the token stream (never re-tokenized) and its pos/lemma
layers are stored as given rather than derived."""

import os

import pytest

from blacklab_spark.build import build_index
from blacklab_spark.config import BuildConfig
from blacklab_spark.engine import SearchEngine
from blacklab_spark.sources.files import read_conllu, read_transcripts

DOC_A = """\
# newdoc id = conv-a
# sent_id = a-1
# speaker = user
# ts = 2024-03-01 10:00:00
1\tThe\tthe\tDET\tDT\t_\t2\tdet\t_\t_
2\tVisa\tvisa\tNOUN\tNN\t_\t0\troot\t_\tSpaceAfter=No
3\t.\t.\tPUNCT\t.\t_\t2\tpunct\t_\t_

# sent_id = a-2
# speaker = assistant
1-2\tcannot\t_\t_\t_\t_\t_\t_\t_\t_
1\tcan\tcan\tAUX\tMD\t_\t3\taux\t_\t_
2\tnot\tnot\tPART\tRB\t_\t3\tadvmod\t_\t_
3\tHelp\thelp\tVERB\tVB\t_\t0\troot\t_\t_
3.1\thelped\thelp\tVERB\tVBD\t_\t_\t_\t_\t_
4\ttoday\t_\tNOUN\tNN\t_\t3\tobl\t_\t_
"""

DOC_B = """\
1\tVisa\tvisa\tNOUN\tNN\t_\t0\troot\t_\t_
2\tapproved\tapprove\tVERB\tVBN\t_\t1\tacl\t_\t_
"""


@pytest.fixture(scope="module")
def conllu_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("conllu")
    (d / "conv-a.conllu").write_text(DOC_A)
    (d / "conv-b.conllu").write_text(DOC_B)
    return str(d)


@pytest.fixture(scope="module")
def conllu_engine(spark, conllu_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "conllu_idx")
    src = read_conllu(spark, conllu_dir)
    build_index(spark, src, out, BuildConfig(num_partitions=4))
    return SearchEngine.open(spark, out)


def test_read_conllu_parses(spark, conllu_dir):
    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in read_conllu(spark, conllu_dir).collect()}
    assert set(rows) == {("conv-a", 0), ("conv-a", 1), ("conv-b", 0)}
    a0 = rows[("conv-a", 0)]
    # SpaceAfter=No glues the period to "Visa"
    assert a0["text"] == "The Visa."
    assert a0["tokens_s"] == ["The", "Visa", "."]
    assert a0["tokens_pos"] == ["DET", "NOUN", "PUNCT"]
    assert a0["tokens_lemma"] == [["the"], ["visa"], ["."]]
    assert a0["role"] == "user" and str(a0["ts"]).startswith("2024-03-01")
    a1 = rows[("conv-a", 1)]
    # multiword range (1-2) and empty node (3.1) are skipped;
    # LEMMA '_' falls back to the surface form
    assert a1["tokens_s"] == ["can", "not", "Help", "today"]
    assert a1["tokens_lemma"][3] == ["today"]
    assert a1["role"] == "assistant"
    b0 = rows[("conv-b", 0)]
    # no newdoc id → conv id from the file name; no ts comment →
    # deterministic synthetic timestamp
    assert b0["role"] is None and b0["ts"] is not None


def test_read_transcripts_dispatch(spark, conllu_dir):
    df = read_transcripts(spark, conllu_dir, fmt="conllu")
    assert "tokens_pos" in df.columns


def test_preannotated_layers_stored_not_derived(conllu_engine):
    dm = conllu_engine.index.doc_meta
    assert {"tokens", "tokens_s", "tokens_pos", "tokens_lemma"} <= set(
        dm.columns)
    # given UPOS survives (the derived heuristic would say "func"/"noun",
    # never "DET"), and tokens are the folded surface forms — including
    # a punctuation token the text tokenizer would never emit
    row = dm.filter("conv_id = 'conv-a' and turn_idx = 0").first()
    assert row["tokens_pos"] == ["DET", "NOUN", "PUNCT"]
    assert row["tokens"] == ["the", "visa", "."]


def test_cql_over_given_annotations(conllu_engine):
    eng = conllu_engine
    # word layer rides the postings built from the folded given tokens
    assert eng.find('"visa"').count() == 2
    # pos layer = given UPOS values (Visa, today, Visa)
    assert eng.find('[pos="NOUN"]').count() == 3
    # sequence mixing word + given-pos leaves
    assert eng.find('"visa" [pos="VERB"]').count() == 1
    # lemma layer = given lemmas ("approved" stems to lemma "approve")
    assert eng.find('[lemma="approve"]').count() == 1
    # sensitive layer keeps original case
    assert eng.find('[word_s="Visa"]').count() == 2
    assert eng.find('[word_s="visa"]').count() == 0


def test_bm25_and_kwic_on_preannotated(conllu_engine):
    top = conllu_engine.topk(["visa"], k=5).collect()
    assert len(top) == 2 and all(r["score"] > 0 for r in top)
    kw = conllu_engine.kwic(conllu_engine.term_hits("visa"), context=1)
    assert kw.count() == 2


def test_compact_preserves_preannotation(spark, conllu_dir,
                                         tmp_path_factory):
    from blacklab_spark.delete import compact, delete_docs
    base = str(tmp_path_factory.mktemp("idx") / "pre_del")
    out = str(tmp_path_factory.mktemp("idx") / "pre_cmp")
    build_index(spark, read_conllu(spark, conllu_dir), base,
                BuildConfig(num_partitions=4))
    eng = SearchEngine.open(spark, base)
    assert delete_docs(eng.index, "conv_id = 'conv-b'") == 1
    idx2 = compact(spark, base, out)
    assert "tokens_pos" in idx2.doc_meta.columns
    eng2 = SearchEngine.open(spark, out)
    assert eng2.find('[pos="NOUN"]').count() == 2  # conv-a only
    assert eng2.find('"visa"').count() == 1
