"""Sequence-prep operators: chunking + greedy packing vs pure-Python
oracles, plus determinism and invariant checks."""

import random

import pytest

from pyspark.sql import functions as F

from blacklab_spark.functions.chunking import (
    PACK_SALT, chunk_documents, pack_sequences)
from blacklab_spark.functions.hashing import py_md5_long
from blacklab_spark.tokenizer import py_tokens_insensitive
import hashlib


def _py_tokens(text: str) -> list[str]:
    return py_tokens_insensitive(text or "")


def _py_chunks(doc_id, text, max_tokens, overlap):
    ts = _py_tokens(text)
    stride = max_tokens - overlap
    out = []
    for idx, start in enumerate(range(0, len(ts), stride)):
        chunk = ts[start:start + max_tokens]
        out.append((doc_id, idx, start, len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest()))
    return out


def _py_pack(rows, cap, n_groups):
    """rows: [(doc_id, text)] → {doc_id: (group, bin, offset, n_tok)}"""
    groups = {}
    for doc_id, text in rows:
        g = py_md5_long(str(doc_id), salt=PACK_SALT) % n_groups
        groups.setdefault(g, []).append((doc_id, len(_py_tokens(text))))
    out = {}
    for g, docs in groups.items():
        fill, bin_idx = 0, -1
        for doc_id, n in sorted(docs):
            if bin_idx < 0 or fill + n > cap:
                bin_idx, off, fill = bin_idx + 1, 0, n
            else:
                off, fill = fill, fill + n
            out[doc_id] = (g, bin_idx, off, n)
    return out


_TEXTS = [
    "",                                    # zero tokens -> no chunks
    "one",
    "The quick brown fox jumps over the lazy dog again and again",
    "a " * 100,                            # long repeat
    "Ångström café naïve ÉLÈVE straße",    # folding path
    None,
]


def _rand_rows(seed, n):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "Gamma", "Δelta", "ε", "zeta-7", "eta"]
    rows = []
    for i in range(n):
        k = rng.randint(0, 40)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    return rows


def test_chunk_matches_python_oracle(spark):
    rows = [(i, t) for i, t in enumerate(_TEXTS)] + _rand_rows(7, 40)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in chunk_documents(
        df, max_tokens=8, overlap=3).collect()}
    want = {c for i, t in rows for c in _py_chunks(i, t, 8, 3)}
    assert got == want
    assert len(got) > len(rows)  # some docs produced several chunks


def test_chunk_window_invariants(spark):
    rows = _rand_rows(11, 60)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=10, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        n = len(_py_tokens(dict(rows)[doc_id]))
        chunks.sort(key=lambda r: r.chunk_idx)
        # stride spacing, full coverage, bounded width
        for j, r in enumerate(chunks):
            assert r.start_tok == j * 6
            assert 1 <= r.n_tok <= 10
            assert r.start_tok + r.n_tok <= n
        assert chunks[-1].start_tok + chunks[-1].n_tok == n


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_pack_matches_python_oracle(spark):
    rows = _rand_rows(13, 120) + [(1000, "tok " * 500),  # oversize doc
                              (1001, None)]          # null text
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.pack_group, r.bin_idx, r.offset, r.n_tok)
           for r in pack_sequences(df, cap=50, n_groups=4).collect()}
    assert got == _py_pack(rows, 50, 4)
    assert len(got) == len(rows)  # every doc packed exactly once


def test_pack_bin_invariants_and_determinism(spark):
    rows = _rand_rows(17, 150)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = pack_sequences(df, cap=64, n_groups=3).collect()
    b = pack_sequences(df.repartition(13), cap=64, n_groups=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    bins = {}
    for r in a:
        bins.setdefault((r.pack_group, r.bin_idx), []).append(r)
    for members in bins.values():
        members.sort(key=lambda r: r.offset)
        # contiguous layout within the bin, capacity respected
        # (except a single oversize doc alone in its bin)
        pos = 0
        for r in members:
            assert r.offset == pos
            pos += r.n_tok
        assert pos <= 64 or len(members) == 1


def test_shard_matches_python_oracle(spark):
    from blacklab_spark.functions.chunking import SHARD_SALT, shard_corpus

    rows = _rand_rows(23, 97)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.shard, r.position)
           for r in shard_corpus(df, n_shards=5).collect()}
    shards = {}
    for doc_id, _ in rows:
        k = py_md5_long(str(doc_id), salt=SHARD_SALT)
        shards.setdefault(k % 5, []).append((k, doc_id))
    want = {doc_id: (s, pos)
            for s, members in shards.items()
            for pos, (_, doc_id) in enumerate(sorted(members))}
    assert got == want
    assert len(got) == len(rows)


def test_shard_partition_invariant_and_contiguous(spark):
    from blacklab_spark.functions.chunking import shard_corpus

    rows = _rand_rows(29, 150)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, shard_corpus(df, n_shards=4).collect()))
    b = sorted(map(tuple,
                   shard_corpus(df.repartition(11), n_shards=4).collect()))
    assert a == b
    by_shard = {}
    for doc_id, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    assert sorted(by_shard) == [0, 1, 2, 3]
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_shard_rejects_bad_n(spark):
    from blacklab_spark.functions.chunking import shard_corpus

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_shards"):
        shard_corpus(df, n_shards=0)


def test_sequence_prep_plan_shapes(spark):
    """Scale assertions: chunking is one codegen stage (zero
    exchanges — no shuffle at any corpus size); packing and sharding
    shuffle exactly once, on narrow (id, count/key) projections; the
    mixture rate table joins as a broadcast, never a corpus-side
    sort-merge join."""
    from blacklab_spark.functions.chunking import (
        chunk_documents, pack_sequences, shard_corpus)
    from blacklab_spark.functions.curation import mixture_sample

    docs = spark.createDataFrame(
        [(i, "en", "alpha beta gamma " * 5) for i in range(50)],
        "doc_id long, lang string, text string")

    p = chunk_documents(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in p, p

    for op in (pack_sequences(docs), shard_corpus(docs)):
        p = op._jdf.queryExecution().executedPlan().toString()
        assert p.count("Exchange") == 1, p
        # plans print top-down: everything before the Exchange marker
        # executes AFTER the shuffle — the text column must not be
        # there (only the narrow (id, count/key) projection shuffles)
        assert "text" not in p.split("Exchange", 1)[0], p

    p = mixture_sample(docs, {"en": 500})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
