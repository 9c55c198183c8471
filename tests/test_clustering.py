"""Duplicate-cluster formation (functions/clustering.py) vs a Python
union-find oracle, plus end-to-end LSH-pairs → clusters → filtered
corpus."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from blacklab_spark.functions.clustering import (duplicate_clusters,
                                                 keep_canonical)


def _uf_clusters(n_ids: list[int], edges: list[tuple[int, int]]):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp: dict[int, list[int]] = {}
    for i in n_ids:
        comp.setdefault(find(i), []).append(i)
    return {i: min(ms) for r, ms in comp.items() for i in ms}


def _run(spark, ids, edges):
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [], "id_a long, id_b long")
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in duplicate_clusters(docs, pairs).collect()}
    want = _uf_clusters(ids, edges)
    assert {k: v[0] for k, v in got.items()} == want
    for i, (cid, canon) in got.items():
        assert canon == (1 if cid == i else 0)
    return got


def test_path_triangle_singletons(spark):
    # path 1-2-3-4 (diameter 3 → exercises pointer jumping),
    # triangle 10-11-12, singletons 20, 21
    _run(spark, [1, 2, 3, 4, 10, 11, 12, 20, 21],
         [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)])


def test_empty_pairs_all_singletons(spark):
    got = _run(spark, [5, 6, 7], [])
    assert all(c == (i, 1) for i, c in got.items())


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path: naive propagation needs 63 rounds; pointer
    # jumping must finish well inside the 20-round guard
    ids = list(range(64))
    _run(spark, ids, [(i, i + 1) for i in range(63)])


@pytest.mark.parametrize("seed", range(8))
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed + 77)
    n = rng.randint(5, 40)
    ids = rng.sample(range(1000), n)
    m = rng.randint(0, n * 2)
    edges = [tuple(rng.sample(ids, 2)) for _ in range(m)]
    edges = [(a, b) for a, b in edges]
    _run(spark, ids, edges)


def test_keep_canonical_filters_corpus(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3), (3, 5)],
                                  "id_a long, id_b long")
    clusters = duplicate_clusters(docs, pairs)
    kept = keep_canonical(docs, clusters)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 4]


def test_lsh_pairs_to_clusters_end_to_end(spark):
    """minhash_lsh_pairs over sf0.01 documents → clusters must equal
    union-find over the same pairs, and the kept corpus must shrink by
    exactly (component size − 1) per duplicate group."""
    from blacklab_spark.functions.dedup import minhash_lsh_pairs
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    pairs_l = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    clusters = duplicate_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == _uf_clusters(ids, pairs_l)
    n_kept = keep_canonical(docs, clusters).count()
    assert n_kept == len(set(got.values()))
    assert n_kept < len(ids)   # the corpus has planted near-dups


def test_no_lingering_persisted_frames(spark):
    """Superseded per-round checkpoints are unpersisted: one call
    leaves at most ONE resident block set (the returned frame's final
    checkpoint), regardless of how many rounds ran."""
    docs = spark.createDataFrame([(i,) for i in range(32)],
                                 "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(31)],
                                  "id_a long, id_b long")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    duplicate_clusters(docs, pairs).collect()
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)
