"""Parallel-corpora operators — other-field hits and cross-field
alignment re-expressed as DataFrame algebra (reference:
search/lucene/SpanQueryOtherFieldHits.java:23 /
SpansOtherFieldHits.java:19 — project a source-field hit onto a target
field as min(targetStart)/max(targetEnd) over the hit's cross-field
alignment relations; SpansOverrideField.java:10 — run a clause against
another field's annotations; the CQL alignment operator ``==>``
executes through SpanQueryCaptureRelationsBetweenSpans.java:32 with
cross-field relations).

The reference models a parallel corpus as two annotated fields of the
same document (``contents__en`` / ``contents__nl``) linked by
alignment relations. Columnar equivalent: a second position-aligned
token-array column in its OWN coordinate system plus an alignment
edges frame ``(doc_id, src_start, src_end, tgt_start, tgt_end)`` —
exactly the relations-layer shape (operators/relations.py) minus the
type column.

The transcript corpus has no gold translation layer, so field ``b``
is a DETERMINISTIC synthetic translation — the same stand-in pattern
as the synthetic pos tagger (annotations.py): target token j fuses
source tokens 2j and 2j+1 (``w1_w2``), a trailing odd token maps
alone. The 2:1 fusion makes target coordinates GENUINELY different
from source coordinates, so the projection machinery is exercised for
real (identity-aligned fields would make every operator a no-op). The
alignment is expressible identically in Spark SQL, DuckDB SQL and
Python, which is what makes the machinery gate-checkable; a real
aligner's edge table (fast_align/eflomal output) drops in as a stored
artifact with the same schema.

All derivations are JVM higher-order functions over the existing
``tokens`` column — no Python, no shuffle; Catalyst prunes them away
for queries that never touch field b.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from blacklab_spark.index import InvertedIndex

_EDGE_COLS = ("al_src_start", "al_src_end", "al_tgt_start", "al_tgt_end")

#: relation type of the derived alignment layer — the reference tags
#: alignment relations with a type the ``=type=>`` operator's regex
#: filters on (RelationOperatorInfo.typeRegex); the derived layer
#: carries this single type.
ALIGN_REL_TYPE = "align"


def tokens_other_field(tokens_col: Column | str) -> Column:
    """Derive the field-b token array from the source (insensitive)
    token array: target j = ``tokens[2j] '_' tokens[2j+1]``, trailing
    odd token passes through. len_b = ceil(len/2)."""
    ts = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    n = F.size(ts)
    nb = F.ceil(n / F.lit(2.0)).cast("int")
    idx = F.when(nb >= 1, F.sequence(F.lit(0), nb - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda j: F.when(
        2 * j + 2 <= n,
        F.concat(F.element_at(ts, 2 * j + 1), F.lit("_"),
                 F.element_at(ts, 2 * j + 2))
    ).otherwise(F.element_at(ts, 2 * j + 1)))


def _doc_meta_b(dm: DataFrame) -> DataFrame:
    """doc_meta frame with the derived field-b token array."""
    if "tokens_b" in dm.columns:
        return dm
    return dm.withColumn("tokens_b", tokens_other_field("tokens"))


def alignment_edges(index: InvertedIndex,
                    dm: DataFrame | None = None) -> DataFrame:
    """All alignment relations, one row per edge.

    Prefers the STORED ``_alignments`` build artifact (a real
    aligner's edges ingested from the input's ``align_pairs`` column
    — build stage 'alignments'); the derived 2:1 fusion below is the
    fallback for corpora without one. Pass ``dm`` to restrict to an
    already-pruned doc set (semi-join on the stored path, pruned
    derivation on the fallback).

    Fallback derivation is JVM-side (sequence + transform + explode,
    the doc_relations pattern). Edge j: source [2j, min(2j+2, n)) →
    target [j, j+1)."""
    stored = index.doc_alignments_stored
    if stored is not None:
        if dm is not None:
            stored = stored.join(dm.select("doc_id"), "doc_id",
                                 "leftsemi")
        return stored
    dm = index.doc_meta if dm is None else dm
    ts = F.col("tokens")
    n = F.size(ts)
    nb = F.ceil(n / F.lit(2.0)).cast("int")
    idx = F.when(nb >= 1, F.sequence(F.lit(0), nb - 1)) \
        .otherwise(F.array().cast("array<int>"))
    edges = F.transform(idx, lambda j: F.struct(
        (2 * j).cast("int").alias("al_src_start"),
        F.least(2 * j + 2, n).cast("int").alias("al_src_end"),
        j.cast("int").alias("al_tgt_start"),
        (j + 1).cast("int").alias("al_tgt_end")))
    return (dm.select("doc_id", F.explode(edges).alias("e"))
            .select("doc_id", *[F.col(f"e.{c}") for c in _EDGE_COLS]))


def other_field_hits(index: InvertedIndex, hits: DataFrame) -> DataFrame:
    """Project source-field hits onto field b — for each hit, the span
    covering min(tgt_start)..max(tgt_end) of all alignment relations
    overlapping the hit (SpansOtherFieldHits.java:66-90: the adjusted
    span is the min/max over target-field match infos; hits with no
    alignment in the target field are dropped, AcceptStatus.NO).

    Output: (doc_id, start, end, b_text) in FIELD-B coordinates, the
    source span riding along as (a_start, a_end) match info. The join
    shuffles both sides on doc_id only — co-partitioned at scale; the
    hits' doc ids are pushed into the doc_meta scan (push_hit_docs, the
    _fiseq anchor pattern), so a rare-phrase projection reads only the
    anchor docs' row groups instead of deriving edges corpus-wide."""
    from blacklab_spark.operators.hits import push_hit_docs
    h = hits.select("doc_id", "start", "end").distinct()
    dm = push_hit_docs(hits, index.doc_meta)
    e = alignment_edges(index, dm)
    proj = (h.join(e, "doc_id")
            .filter((F.col("al_src_start") < F.col("end"))
                    & (F.col("al_src_end") > F.col("start")))
            .groupBy("doc_id", "start", "end")
            .agg(F.min("al_tgt_start").cast("int").alias("b_start"),
                 F.max("al_tgt_end").cast("int").alias("b_end")))
    dmb = _doc_meta_b(dm).select("doc_id", "tokens_b")
    return (proj.join(dmb, "doc_id")
            .select("doc_id",
                    F.col("b_start").alias("start"),
                    F.col("b_end").alias("end"),
                    F.array_join(
                        F.slice(F.col("tokens_b"), F.col("b_start") + 1,
                                F.col("b_end") - F.col("b_start")),
                        " ").alias("b_text"),
                    F.col("start").alias("a_start"),
                    F.col("end").alias("a_end")))


def term_hits_field_b(index: InvertedIndex, predicate,
                      dm: DataFrame | None = None) -> DataFrame:
    """Single-position hits over field b's annotations — the
    SpansOverrideField analog: the same posexplode probe leaf the main
    field uses, against the derived tokens_b column. ``predicate`` is
    a Column function of the token. (A STORED parallel field would get
    its own postings artifact by the same build path as the main
    field; the derived field has no postings, so the probe is the
    planned leaf, not a fallback.) Pass ``dm`` to probe an already-
    pruned doc_meta scan (the ==> executor pushes the source clause's
    doc ids)."""
    dmb = _doc_meta_b(index.doc_meta if dm is None else dm) \
        .select("doc_id", "tokens_b")
    tok = dmb.select("doc_id", F.posexplode("tokens_b")
                     .alias("pos", "token"))
    return (tok.filter(predicate(F.col("token")))
            .select("doc_id", F.col("pos").cast("int").alias("start"),
                    (F.col("pos") + 1).cast("int").alias("end"),
                    "token"))


def cross_field_matches(index: InvertedIndex, source_hits: DataFrame,
                        target_hits: DataFrame,
                        dm: DataFrame | None = None) -> DataFrame:
    """The CQL alignment operator ``A ==> B``: source-field hits A
    paired with field-b hits B connected by an alignment relation that
    overlaps A in source coordinates and B in target coordinates
    (SpanQueryCaptureRelationsBetweenSpans.java:32 with cross-field
    relations, SpansCaptureRelationsBetweenSpans.java:22: 'find
    relations whose source overlaps the span and whose target matches
    the target clause'). Reported hit = the source span, with the
    matched target span as (b_start, b_end) match info. Pass ``dm``
    (a pruned doc_meta scan) to derive the edges from the anchor docs
    only; otherwise the source hits' doc ids are pushed here."""
    from blacklab_spark.operators.hits import push_hit_docs
    a = source_hits.select("doc_id", "start", "end").distinct()
    b = (target_hits.select(
        "doc_id", F.col("start").alias("b_start"),
        F.col("end").alias("b_end")).distinct())
    if dm is None:
        dm = push_hit_docs(source_hits, index.doc_meta)
    e = alignment_edges(index, dm)
    return (a.join(e, "doc_id")
            .filter((F.col("al_src_start") < F.col("end"))
                    & (F.col("al_src_end") > F.col("start")))
            .join(b, "doc_id")
            .filter((F.col("al_tgt_start") < F.col("b_end"))
                    & (F.col("al_tgt_end") > F.col("b_start")))
            .select("doc_id", "start", "end", "b_start", "b_end")
            .distinct())
