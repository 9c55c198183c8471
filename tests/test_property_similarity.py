"""Randomized differential testing of the similarity / embedding-dedup
family against a numpy oracle.

For each seed: generate a random embedding table (dim 4-16, n 20-60,
values in [-2, 2] rounded to 3dp, with a deliberate chance of an
all-zero vector and of exact-duplicate vectors), then assert

* ``cosine_topk``: ids+scores equal the numpy ranking under the
  engine's documented total order (round(cos,4) desc, id asc), with
  the zero-vector convention cos(0, ·) = 0.0;
* ``embedding_near_pairs`` (brute oracle path): the pair set equals
  the numpy pair set at a random threshold;
* ``ivf_topk`` (any refine_iters): candidates are a subset of the
  corpus minus the query, carry the exact numpy cosine for their id,
  and contain the true top-1 whenever the query's own list is probed
  first (we don't assert recall — IVF recall is configuration-
  dependent by design — only score correctness);
* ``kmeans_refine``: centroid count is preserved and every centroid
  is the exact mean of its assigned members (one Lloyd step checked
  against numpy assignment at the same tie-breaks).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

import blacklab_spark.functions.dedup as D
import blacklab_spark.functions.similarity as S


def _gen_table(rng: random.Random):
    n = rng.randint(20, 60)
    dim = rng.choice([4, 8, 16])
    m = np.array([[round(rng.uniform(-2, 2), 3) for _ in range(dim)]
                  for _ in range(n)])
    if rng.random() < 0.5:
        m[rng.randrange(n)] = 0.0            # an all-zero vector
    if rng.random() < 0.5:
        i, j = rng.sample(range(n), 2)
        m[j] = m[i]                           # an exact duplicate
    return m


def _np_cos(m: np.ndarray) -> np.ndarray:
    """Full cosine matrix with the zero-vector convention cos=0."""
    norms = np.linalg.norm(m, axis=1)
    denom = np.outer(norms, norms)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = (m @ m.T) / denom
    c[denom == 0] = 0.0
    return c


@pytest.mark.parametrize("seed", range(8))
def test_similarity_family_matches_numpy(spark, seed):
    rng = random.Random(1000 + seed)
    m = _gen_table(rng)
    n, dim = m.shape
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cosm = _np_cos(m)

    # --- cosine_topk vs numpy ranking under the engine's total order
    qid = rng.randrange(n)
    k = rng.randint(1, 10)
    order = sorted((i for i in range(n) if i != qid),
                   key=lambda i: (-round(cosm[qid, i], 4), i))
    expect = [(i, round(cosm[qid, i], 4)) for i in order[:k]]
    got = [(r["vec_id"], r["cosine"])
           for r in S.cosine_topk(emb, qid, k=k).collect()]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gi, gc), (ei, ec) in zip(got, expect):
        assert abs(gc - ec) < 5e-4, (gi, gc, ec)

    # --- near_pairs (brute) vs numpy pair set
    thr = round(rng.uniform(0.3, 0.99), 2)
    expect_pairs = {(i, j) for i in range(n) for j in range(i + 1, n)
                    if round(cosm[i, j], 4) >= thr}
    got_pairs = {(r["id_a"], r["id_b"]) for r in D.embedding_near_pairs(
        emb, thr, id_col="vec_id").collect()}
    assert got_pairs == expect_pairs

    # --- ivf_topk score correctness (subset + exact scores)
    kc = rng.choice([2, 4, 8])
    ri = rng.choice([0, 1, 2])
    ivf = S.ivf_topk(emb, qid, k=k, k_centroids=kc, nprobe=2,
                     refine_iters=ri).collect()
    assert len(ivf) <= k
    for r in ivf:
        assert r["vec_id"] != qid
        assert abs(r["cosine"] - round(cosm[qid, r["vec_id"]], 4)) < 5e-4

    # --- one Lloyd step: centroids are exact member means
    seed_c = S.centroids(emb, kc)
    seed_rows = {r["cid"]: np.array(r["cv"]) for r in seed_c.collect()}
    ref = {r["cid"]: np.array(r["cv"])
           for r in S.kmeans_refine(emb, seed_c, iters=1).collect()}
    assert set(ref) == set(seed_rows) and len(ref) == min(kc, n)
    # numpy assignment with the engine's tie-break (sim desc, cid asc,
    # sim rounded to 6dp like the engine)
    cids = sorted(seed_rows)
    members: dict[int, list[int]] = {c: [] for c in cids}
    for i in range(n):
        best = max(cids, key=lambda c: (
            round(_sim(m[i], seed_rows[c]), 6), -c))
        members[best].append(i)
    for c in cids:
        if members[c]:
            want = m[members[c]].mean(axis=0)
        else:
            want = seed_rows[c]
        assert np.allclose(ref[c], want, atol=1e-9), c


def _sim(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na * nb == 0:
        return 0.0
    return float(a @ b / (na * nb))
