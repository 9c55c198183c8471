"""Phrase / sequence matching → hits ``(doc_id, start, end)``.

Two physical strategies for the same logical operator, mirroring the
reference's cost-based choice between postings-join sequences
(SpanQuerySequence, reference:
engine/src/main/java/nl/inl/blacklab/search/lucene/SpanQuerySequence.java:50)
and forward-index NFA matching (SpanQueryFiSeq, SpansFiSeq.java:14;
decision logic SURVEY.md §4.4):

* ``phrase_via_tokens`` — probe the token-array column of doc_meta
  (our forward index) with pure JVM higher-order functions: for each
  start position check ``slice(tokens, i, n) == phrase``. Whole-stage
  codegen, no shuffle, no Python. Best when the corpus scan is
  acceptable or a cheap pre-filter (array_contains of the rarest term)
  prunes most docs — exactly the reference's NFA-side win.
* ``phrase_via_postings`` — decode the phrase terms' position lists
  from posting blocks, per-bucket document-at-a-time position
  intersection (numpy). Best for rare phrases over huge corpora:
  touches only the terms' postings, never the corpus.

Both must return identical hit lists (dual-path test ≙ reference
_FI1/_FI2 goldens, test/test/hits.js:55-57). Hits are half-open token
intervals, the reference's Hit contract
(search/results/EphemeralHit.java:13-15).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from blacklab_spark import codec
from blacklab_spark.index import InvertedIndex

HITS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
])


def phrase_via_tokens(index: InvertedIndex, terms: list[str],
                      doc_filter=None) -> DataFrame:
    """Forward-index probe: JVM-only HOF scan over token arrays."""
    n = len(terms)
    dm = index.doc_meta
    if doc_filter is not None:
        dm = dm.filter(doc_filter)
    # cheap pre-filter: every phrase term must occur in the doc
    for t in terms:
        dm = dm.filter(F.array_contains("tokens", t))
    phrase = F.array(*[F.lit(t) for t in terms])
    starts = F.filter(
        F.sequence(F.lit(0), F.size("tokens") - n),
        lambda i: F.slice("tokens", i + 1, n) == phrase,
    )
    return (dm.select("doc_id", F.explode(starts).alias("start"))
            .select("doc_id", F.col("start").cast("int"),
                    (F.col("start") + n).cast("int").alias("end")))


def _phrase_kernel(term_order: dict[int, int], n_terms: int):
    """Per-bucket kernel: positions-list intersection, doc at a time."""
    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # positions per (term slot, doc)
        per_slot: list[dict[int, np.ndarray]] = [dict() for _ in range(n_terms)]
        for term_id, blob_doc, n_docs, blob_pos in zip(
                pdf["term_id"], pdf["doc_ids"], pdf["n_docs"], pdf["positions"]):
            slot = term_order[int(term_id)]
            docs = codec.decode_deltas(blob_doc).astype(np.int64)
            pos_lists = codec.decode_positions(blob_pos, int(n_docs))
            d = per_slot[slot]
            for doc, plist in zip(docs, pos_lists):
                d[doc] = plist.astype(np.int64)
        if any(not d for d in per_slot):
            return pd.DataFrame({"doc_id": [], "start": [], "end": []}).astype(
                {"doc_id": "int64", "start": "int32", "end": "int32"})
        cand = set(per_slot[0])
        for d in per_slot[1:]:
            cand &= set(d)
        out_doc, out_start = [], []
        for doc in sorted(cand):
            starts = per_slot[0][doc]
            for i in range(1, n_terms):
                nxt = per_slot[i][doc]
                starts = starts[np.isin(starts + i, nxt)]
                if starts.size == 0:
                    break
            for s in starts:
                out_doc.append(doc)
                out_start.append(int(s))
        return pd.DataFrame({
            "doc_id": np.asarray(out_doc, dtype=np.int64),
            "start": np.asarray(out_start, dtype=np.int32),
            "end": (np.asarray(out_start, dtype=np.int32) + n_terms),
        })

    return kernel


def phrase_via_postings(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Postings path: bucket-grouped position intersection."""
    if not index.cfg.store_positions:
        raise ValueError("index built without positions")
    info = index.lookup_terms(terms)
    have = set(info["term"])
    if any(t not in have for t in terms):
        return index.spark.createDataFrame([], HITS_SCHEMA)
    tid_of = {t: int(i) for t, i in zip(info["term"], info["term_id"])}
    # slot = position of the term in the phrase; a repeated term maps
    # to its first slot and the kernel re-checks adjacency per slot via
    # the same positions array, so dedupe ids but keep slot order.
    term_order: dict[int, int] = {}
    for i, t in enumerate(terms):
        term_order.setdefault(tid_of[t], i)
    n = len(terms)
    if len(term_order) < n:
        # repeated words in the phrase: fall back to slot-agnostic
        # kernel is incorrect → use the forward-index path instead.
        return phrase_via_tokens(index, terms)
    blocks = index.postings.filter(
        F.col("term_id").isin(list(term_order.keys())))
    return (blocks.select("bucket", "term_id", "doc_ids", "n_docs", "positions")
            .groupBy("bucket")
            .applyInPandas(_phrase_kernel(term_order, n), HITS_SCHEMA)
            .orderBy("doc_id", "start"))
