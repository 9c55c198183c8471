"""Randomized differential tests for the STORED edge artifacts
(r4 VERDICT #9): random synthetic HEAD/DEPREL trees and random
alignment edge sets, built through the real `_relations`/`_alignments`
ingestion stages, compared edge-for-edge against a pure-Python oracle
applied to the same generated input.

Round 4 made the stored paths load-bearing (doc_relations /
alignment_edges prefer them over the synthetic fallbacks); these seeds
push shapes the deterministic fixtures don't: null HEADs mixed with
roots, self-referential-adjacent heads, duplicate alignment pairs,
empty docs, and reversal edges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from blacklab_spark.build import build_index
from blacklab_spark.config import BuildConfig
from blacklab_spark.engine import SearchEngine
from blacklab_spark.operators.parallel import alignment_edges
from blacklab_spark.operators.relations import doc_relations

VOCAB = ["Alpha", "beta", "Gamma", "delta", "x1", "née", "word"]


def _mk_engine(spark, tmp_path, rows, schema):
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds(F.lit(946684800)))
    out = str(tmp_path / "idx")
    build_index(spark, df, out,
                BuildConfig(block_size=8, bucket_size=16,
                            num_partitions=2))
    return SearchEngine.open(spark, out)


@pytest.mark.parametrize("seed", range(5))
def test_stored_relations_random_trees(spark, tmp_path, seed):
    rng = random.Random(7000 + seed)
    rows, docs = [], []
    for conv in range(3):
        for t in range(rng.randint(1, 3)):
            n = rng.randint(1, 8)
            toks = [rng.choice(VOCAB) for _ in range(n)]
            heads, deprels = [], []
            for i in range(n):
                r = rng.random()
                if r < 0.2:            # unspecified '_' HEAD
                    heads.append(None)
                    deprels.append(None)
                elif r < 0.35:         # root (indexed at target only)
                    heads.append(0)
                    deprels.append("root")
                else:                  # 1-based head incl. i+1 itself
                    heads.append(rng.randint(1, n))
                    deprels.append(
                        rng.choice(["det", "obj", "nsubj", None]))
            rows.append((f"c{conv:02d}", t, "user", " ".join(toks),
                         None, toks, heads, deprels))
            docs.append((f"c{conv:02d}", t, heads, deprels))
    eng = _mk_engine(
        spark, tmp_path, rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, tokens_s array<string>, "
        "tokens_head array<int>, tokens_deprel array<string>")
    got = {(r["doc_id"], r["rel_type"], r["src_start"], r["src_end"],
            r["tgt_start"], r["tgt_end"])
           for r in doc_relations(eng.index).collect()}
    exp = set()
    for did, (_, _, heads, deprels) in enumerate(
            sorted(docs, key=lambda d: (d[0], d[1]))):
        for i, (h, d) in enumerate(zip(heads, deprels)):
            if h is None:
                continue
            rel = d if d is not None else "dep"
            if h == 0:
                exp.add((did, rel, None, None, i, i + 1))
            else:
                exp.add((did, rel, h - 1, h, i, i + 1))
    assert got == exp


@pytest.mark.parametrize("seed", range(5))
def test_stored_alignments_random_edges(spark, tmp_path, seed):
    rng = random.Random(8000 + seed)
    rows, docs = [], []
    for conv in range(3):
        for t in range(rng.randint(1, 3)):
            n_a = rng.randint(1, 6)
            n_b = rng.randint(1, 6)
            toks_a = [rng.choice(VOCAB) for _ in range(n_a)]
            toks_b = [rng.choice(VOCAB) for _ in range(n_b)]
            # random edge SET incl. reversals (src/tgt order freely
            # crossed) — the shape the derived 2:1 fallback can never
            # produce, so a pass proves the stored artifact is serving
            pairs = sorted({(rng.randrange(n_a), rng.randrange(n_b))
                            for _ in range(rng.randint(0, 8))})
            rows.append((f"c{conv:02d}", t, "user", " ".join(toks_a),
                         None, toks_a, toks_b, pairs))
            docs.append((f"c{conv:02d}", t, pairs))
    eng = _mk_engine(
        spark, tmp_path, rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, tokens_s array<string>, tokens_b array<string>, "
        "align_pairs array<struct<src:int,tgt:int>>")
    got = sorted(
        (r["doc_id"], r["al_src_start"], r["al_src_end"],
         r["al_tgt_start"], r["al_tgt_end"])
        for r in alignment_edges(eng.index).collect())
    exp = sorted(
        (did, s, s + 1, g, g + 1)
        for did, (_, _, pairs) in enumerate(
            sorted(docs, key=lambda d: (d[0], d[1])))
        for s, g in pairs)
    assert got == exp
