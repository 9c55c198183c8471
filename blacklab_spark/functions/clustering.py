"""Duplicate clustering: connected components over near-dup pairs.

The dedup ops in functions/dedup.py (MinHash-LSH, SimHash, embedding
LSH) emit PAIRS; a training-data pipeline needs CLUSTERS — one
canonical document kept per duplicate group, the rest dropped. This
module computes, for every document, the id of its duplicate cluster
(the minimum doc id reachable through the pair graph) entirely with
DataFrame joins, then filters the corpus to cluster representatives.

Algorithm: min-label propagation with pointer jumping (the
"hash-to-min" family — Rastogi et al., *Finding Connected Components
in MapReduce and Beyond*; Kiveris et al., *Connected Components in
MapReduce* large-star/small-star). Each round does

1. one equi-join propagating the smallest known label across edges
   (``label(v) := min(label(v), min over neighbors' labels)``), and
2. one self-join shortcutting label chains (``label := label(label)``),

so convergence is O(log diameter) rounds — 1-2 rounds for real dedup
graphs, whose components are small and star-shaped around a shared
near-duplicate. Every step is an equi-join / groupBy on a single long
key: no driver-side graph state, AQE-skew-safe, and the convergence
test is a monotone scalar (labels only ever decrease, so the label sum
is stationary exactly at the fixpoint) — one tiny agg per round
instead of an old-vs-new join. Each round's label frame is cut from
its lineage with an eager ``localCheckpoint`` — without the cut the
logical plan doubles per round (both joins reference the previous
round twice) and Catalyst planning time, not execution, dominates.
The checkpoint blocks are (long, long) per document and are the only
state carried between rounds; superseded rounds' blocks are freed
eagerly (id-tracked unpersist — plain ``DataFrame.unpersist`` is a
no-op for checkpoint frames), the final round's blocks back the
returned mapping and are reclaimed by the ContextCleaner when it is
garbage-collected.

BlackLab has no dedup surface; this is part of the training-data
pipeline extension (SURVEY §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _checkpoint_tracked(df: DataFrame, owned_ids: list) -> DataFrame:
    """Eager localCheckpoint, recording the persistent-RDD ids the
    checkpoint created. ``DataFrame.unpersist`` is a cache-manager
    no-op for checkpoint frames, so superseded rounds are freed by
    unpersisting exactly these ids (_free_tracked)."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    after = sc._jsc.getPersistentRDDs()
    owned_ids.append(
        [k for k in after.keySet().toArray() if k not in before])
    return out


def _free_tracked(df: DataFrame, ids: list) -> None:
    jm = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for k in ids:
        rdd = jm.get(k)
        if rdd is not None:
            rdd.unpersist(False)


def duplicate_clusters(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       a_col: str = "id_a", b_col: str = "id_b",
                       max_rounds: int = 20) -> DataFrame:
    """(doc_id, cluster_id, is_canonical) for every row of ``docs``.

    ``cluster_id`` is the minimum doc id in the document's connected
    component of the (undirected) ``pairs`` graph; documents that
    appear in no pair are singleton clusters of themselves.
    ``is_canonical`` (int 0/1) marks the cluster representative —
    filtering on it yields the deduplicated corpus.

    Raises ValueError if the propagation has not converged after
    ``max_rounds`` pointer-jumping rounds (needs a component of
    diameter > 2^max_rounds — not a realistic dedup graph).
    """
    nodes = (docs.select(F.col(id_col).cast("long").alias("id"))
             .distinct())
    fwd = pairs.select(F.col(a_col).cast("long").alias("u"),
                       F.col(b_col).cast("long").alias("v"))
    edges = (fwd.unionByName(fwd.select(F.col("v").alias("u"),
                                        F.col("u").alias("v")))
             .distinct())

    owned: list[list] = []
    labels = _checkpoint_tracked(
        nodes.select("id", F.col("id").alias("label")), owned)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_rounds):
        # 1. edge propagation: best label reachable in one hop
        prop = (edges.join(labels, edges["u"] == labels["id"])
                .groupBy("v").agg(F.min("label").alias("nl")))
        stepped = (labels.join(prop, labels["id"] == prop["v"],
                               "left")
                   .select(labels["id"],
                           F.least(labels["label"],
                                   F.coalesce(prop["nl"],
                                              labels["label"]))
                           .alias("label")))
        # 2. pointer jumping: label := label(label). Labels are
        # always node ids, so the inner lookup always resolves.
        lk = stepped.select(F.col("id").alias("lid"),
                            F.col("label").alias("ll"))
        labels = _checkpoint_tracked(
            stepped.join(lk, stepped["label"] == lk["lid"], "left")
            .select(stepped["id"],
                    F.coalesce(lk["ll"], stepped["label"])
                    .alias("label")), owned)
        _free_tracked(labels, owned.pop(0))  # superseded round
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:   # labels only decrease → fixpoint
            break
        prev_sum = cur_sum
    else:
        raise ValueError(
            f"duplicate_clusters did not converge in {max_rounds} "
            "rounds (component diameter over 2^rounds)")
    return labels.select(
        F.col("id").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).cast("int")
        .alias("is_canonical"))


def keep_canonical(docs: DataFrame, clusters: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: rows of ``docs`` whose id is its
    cluster's representative (minimum id in the duplicate group)."""
    keep = (clusters.filter(F.col("is_canonical") == 1)
            .select(F.col(id_col)))
    return docs.join(keep, on=id_col, how="left_semi")
