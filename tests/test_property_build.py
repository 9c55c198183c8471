"""Randomized build-path testing: adversarial corpora and random
Unicode through the three tokenizer engines.

Complements tests/test_build.py (fixed tiny corpus) the same way
test_property_cql.py complements test_cql.py: seeded generators push
the SPIMI build, the postings codec and the tokenizer-identity
contract through inputs a synthetic transcript generator never emits —
empty and whitespace-only turns, single-token documents, one very long
document, mixed-script Unicode with combining marks, zero-width
characters and emoji.
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pytest

from blacklab_spark import codec
from blacklab_spark.build import build_index
from blacklab_spark.config import BuildConfig
from blacklab_spark.engine import SearchEngine
from blacklab_spark.index import open_index
from blacklab_spark.oracle import brute_topk, build_oracle_index, phrase_hits
from blacklab_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from blacklab_spark.tokenizer import (duckdb_tokens_i,
                                      py_tokens_insensitive,
                                      tokens_insensitive)

# ---------------- randomized three-engine tokenizer identity ---------

# pools chosen to hit every tokenizer-v2 decision point: Latin with
# diacritics (folded), non-Latin scripts (lowercased, diacritics kept),
# CJK (no case), digits, apostrophes/underscores inside words,
# combining marks, zero-width and control characters, emoji.
_POOLS = [
    "abcdefgh ",
    "ÀÁÂÃÄÅàáâãäåÇçÉÈÊËéèêëÍÌÎÏíìîïÑñÓÒÔÕÖóòôõöÚÙÛÜúùûüÝýÿ ",
    "ПриветМирСпасибоДа ",
    "ελληνικάΚαλά ",
    "日本語東京中文 ",
    "0123456789 ",
    "'_-.,!?;:()[]{}<>/\\|@#$%^&*+=~`\"",
    "̧́̈",          # combining acute/diaeresis/cedilla
    "​‍﻿\t\n\r",    # zero-width + whitespace controls
    "😀🎉🚀",
]


def _random_text(rng: random.Random, length: int) -> str:
    return "".join(rng.choice(rng.choice(_POOLS))
                   for _ in range(length))


@pytest.mark.parametrize("seed", range(40))
def test_tokenizer_random_unicode(spark, seed):
    """Spark (Java regex), DuckDB (RE2) and Python (unicodedata) must
    produce the IDENTICAL insensitive token list on random mixed-script
    text — the three-engine identity every oracle gate stands on."""
    rng = random.Random(seed + 555)
    text = _random_text(rng, rng.randint(0, 80))
    py = py_tokens_insensitive(text)
    row = (spark.createDataFrame([(text,)], "text string")
           .select(tokens_insensitive("text").alias("t")).collect()[0])
    assert row["t"] == py, f"spark != python on {text!r}"
    duck = duckdb.sql(f"select {duckdb_tokens_i('?')}",
                      params=[text]).fetchone()[0]
    assert list(duck) == py, f"duckdb != python on {text!r}"


# ---------------- adversarial corpus through the full build ----------

def _nasty_rows():
    """~30 turns engineered at the build's edge cases. Deterministic
    (no RNG): failures must reproduce bit-for-bit."""
    rows = []

    def add(conv, idx, text, role="user"):
        ts = datetime.datetime(2026, 1, 1) + \
            datetime.timedelta(minutes=len(rows))
        rows.append({"conv_id": conv, "turn_idx": idx, "role": role,
                     "text": text, "tool": None, "ts": ts})

    add("c00", 0, "")                          # empty turn
    add("c00", 1, "   \t\n  ")                 # whitespace-only
    add("c00", 2, "one")                       # single token
    add("c00", 3, "!!! ??? ...")               # punctuation-only
    add("c00", 4, "Café CAFE café")            # folds to one term ×3
    add("c00", 5, "visa " * 50)                # high-tf single term
    add("c01", 0, " ".join(f"w{i:03d}" for i in range(300)))  # long doc
    add("c01", 1, "Привет мир ПРИВЕТ")         # non-Latin case fold
    add("c01", 2, "日本語 と 東京 日本語")       # CJK
    add("c01", 3, "don't can't won't")         # apostrophes
    add("c01", 4, "a b a b a b a")             # alternating bigram
    add("c02", 0, "3.14 42x 2026")             # digits
    add("c02", 1, "émigré étude émigré", role="assistant")
    add("c02", 2, "zzz​split zero‍width")   # zero-width chars
    add("c02", 3, "the the the the")           # stopword run
    add("c02", 4, "😀 emoji 🎉 tokens")
    add("c03", 0, "naïve naive NAÏVE")         # accent fold collision
    add("c03", 1, "x")                         # another 1-token doc
    add("c03", 2, "")                          # second empty
    for i in range(3, 12):                     # filler for multi-block
        add("c03", i, f"common tok{i} visa common tok{i}")
    return rows


@pytest.fixture(scope="module")
def nasty(spark, tmp_path_factory):
    rows = _nasty_rows()
    out = str(tmp_path_factory.mktemp("idx") / "nasty")
    pdf_rows = [(r["conv_id"], r["turn_idx"], r["role"], r["text"],
                 r["tool"], r["ts"]) for r in rows]
    df = spark.createDataFrame(pdf_rows, TRANSCRIPT_SCHEMA)
    # tiny blocks/buckets so even this corpus spans several of each
    build_index(spark, df, out,
                BuildConfig(block_size=4, bucket_size=8, num_partitions=3))
    return out, build_oracle_index(rows)


def test_nasty_doc_meta(spark, nasty):
    path, oracle = nasty
    idx = open_index(spark, path)
    assert idx.n_docs == oracle.n_docs       # empty docs are still docs
    meta = {r["doc_id"]: r for r in idx.doc_meta.collect()}
    for d in oracle.doc_ids:
        assert meta[d]["n_tokens"] == oracle.dl[d]
        assert list(meta[d]["tokens"]) == oracle.tokens[d]


def test_nasty_postings_decode(spark, nasty):
    path, oracle = nasty
    idx = open_index(spark, path)
    term_of = {r["term_id"]: r["term"] for r in idx.terms.collect()}
    seen: dict[str, dict[int, tuple[int, list[int]]]] = {}
    for r in idx.postings.collect():
        term = term_of[r["term_id"]]
        docs = codec.decode_deltas(r["doc_ids"]).astype(int)
        tfs = codec.decode_varints(r["tfs"]).astype(int)
        poss = codec.decode_positions(r["positions"], r["n_docs"])
        assert r["n_docs"] == len(docs) <= idx.cfg.block_size
        for d, tf, pos in zip(docs, tfs, poss):
            seen.setdefault(term, {})[int(d)] = \
                (int(tf), list(pos.astype(int)))
    for term, plist in oracle.postings.items():
        assert term in seen, term
        for doc_id, positions in plist.items():
            tf, pos = seen[term][doc_id]
            assert tf == len(positions)
            assert pos == positions
    assert sum(len(v) for v in seen.values()) == \
        sum(len(v) for v in oracle.postings.values())


def test_nasty_queries(spark, nasty):
    path, oracle = nasty
    eng = SearchEngine.open(spark, path)
    # BM25 over the skewed corpus (high-tf doc, long doc, empty docs)
    for terms in (["visa"], ["visa", "common"], ["the"], ["cafe"]):
        expected = brute_topk(oracle, terms, k=5)
        got = [(r["doc_id"], r["score"])
               for r in eng.topk(terms, k=5).collect()]
        assert [g[0] for g in got] == [e[0] for e in expected], terms
        for g, e in zip(got, expected):
            assert g[1] == pytest.approx(e[1], abs=1e-6)
    # phrase across the alternating-bigram and repeated-term docs
    for phrase in (["a", "b"], ["visa", "visa"], ["the", "the"]):
        got = sorted((r["doc_id"], r["start"], r["end"])
                     for r in eng.phrase_hits(phrase).collect())
        assert got == phrase_hits(oracle, phrase), phrase
