"""Randomized delta-ingest + delete op sequences vs the Python oracle.

Each seed partitions the tiny corpus into a base build plus 1-3 delta
batches split and APPENDED IN RANDOM CONVERSATION ORDER (the fixed
streaming tests append in conv order, where global ids happen to equal
a one-shot build's — random order exercises the offset-shifted id
space for real), optionally deletes one conversation from whichever
part holds it, then checks the query-time-merged engine:

* CQL hit visibility (term + phrase) mapped through (conv_id,
  turn_idx) equals the oracle over the surviving rows — deleted docs
  must vanish from postings-backed paths, not just doc_meta;
* top-k: without deletes, scores are rank- and value-identical to the
  brute scorer over the union corpus; with deletes, the VISIBLE
  candidate set is exact while scores keep the build-time corpus
  stats (the Lucene visibility model: tombstoned docs leave df/avgdl
  untouched until compaction — documented engine semantics).
"""

from __future__ import annotations

import os
import random

import pytest

from blacklab_spark.build import build_index
from blacklab_spark.config import BuildConfig
from blacklab_spark.delete import delete_docs
from blacklab_spark.index import open_index
from blacklab_spark.oracle import (brute_topk, build_oracle_index,
                                   phrase_hits)
from blacklab_spark.streaming.ingest import DeltaSearchEngine, append_delta

_CFG = BuildConfig(block_size=8, bucket_size=16, num_partitions=2)


def _doc_key_map(dse):
    """global doc_id → (conv_id, turn_idx) across surviving part docs."""
    out = {}
    for part, off in zip(dse.parts, dse.offsets):
        for r in part.doc_meta.select("doc_id", "conv_id",
                                      "turn_idx").collect():
            out[r["doc_id"] + off] = (r["conv_id"], r["turn_idx"])
    return out


@pytest.mark.parametrize("seed", range(8))
def test_random_delta_delete_sequence(seed, spark, tiny_pdf, tmp_path):
    rng = random.Random(seed + 4_242)
    convs = sorted(tiny_pdf.conv_id.unique())
    rng.shuffle(convs)
    n_batches = rng.randint(1, 3)
    cut = rng.randint(1, len(convs) - n_batches)
    base_convs, rest = convs[:cut], convs[cut:]
    batches = [sorted(rest[i::n_batches]) for i in range(n_batches)]
    batches = [b for b in batches if b]

    main = str(tmp_path / "main")
    build_index(spark,
                spark.createDataFrame(
                    tiny_pdf[tiny_pdf.conv_id.isin(base_convs)]),
                main, _CFG)
    for i, b in enumerate(batches):
        append_delta(spark, main,
                     spark.createDataFrame(
                         tiny_pdf[tiny_pdf.conv_id.isin(b)]),
                     _CFG, f"d{i}")

    deleted_conv = None
    if rng.random() < 0.5:
        deleted_conv = rng.choice(convs)
        part_dirs = [main] + [os.path.join(main, "_deltas", f"d{i}")
                              for i in range(len(batches))]
        for pd in part_dirs:
            idx = open_index(spark, pd)
            if idx.doc_meta.filter(
                    f"conv_id = '{deleted_conv}'").count():
                assert delete_docs(idx,
                                   f"conv_id = '{deleted_conv}'") > 0
                break

    survivors = tiny_pdf[tiny_pdf.conv_id != deleted_conv] \
        if deleted_conv else tiny_pdf
    oracle = build_oracle_index(survivors.to_dict("records"))
    okey = {d: (oracle.meta[d]["conv_id"], oracle.meta[d]["turn_idx"])
            for d in oracle.doc_ids}

    dse = DeltaSearchEngine(spark, main)
    key_of = _doc_key_map(dse)
    assert deleted_conv not in {c for c, _ in key_of.values()}

    # ---- CQL visibility: term + phrase through the merged engine ----
    got = {(*key_of[r["doc_id"]], r["start"], r["end"]) for r in
           dse.find('"visa"').select("doc_id", "start", "end").collect()}
    want = {(*okey[d], p, p + 1)
            for d, ps in oracle.postings.get("visa", {}).items()
            for p in ps}
    assert got == want
    got = {(*key_of[r["doc_id"]], r["start"], r["end"]) for r in
           dse.find('"very" "good"')
           .select("doc_id", "start", "end").collect()}
    want = {(*okey[d], s, e)
            for d, s, e in phrase_hits(oracle, ["very", "good"])}
    assert got == want

    # ---- top-k over the union ----
    rows = dse.topk(["visa", "good"], k=500).collect()
    if deleted_conv is None:
        expected = brute_topk(oracle, ["visa", "good"], k=500)
        got_scored = sorted(((*key_of[r["doc_id"]],) for r in rows))
        want_scored = sorted((*okey[d],) for d, _ in expected)
        assert got_scored == want_scored
        by_key = {key_of[r["doc_id"]]: r["score"] for r in rows}
        for d, s in expected:
            assert by_key[okey[d]] == pytest.approx(s, abs=1e-6)
    else:
        # Lucene visibility model: exact candidate SET, stats unchanged
        got_set = {key_of[r["doc_id"]] for r in rows}
        cands = set()
        for t in ("visa", "good"):
            cands.update(okey[d] for d in oracle.postings.get(t, {}))
        assert got_set == cands
        assert deleted_conv not in {c for c, _ in got_set}
