"""Relation (dependency) queries — SpanQueryRelations and friends
re-expressed as DataFrame algebra (reference:
search/lucene/SpanQueryRelations.java:34 — typed relation spans with a
direction filter and a span mode; SpansRelationSpanAdjust.java:24 —
re-report a relation hit as its source/target/full span;
SpansCaptureRelationsWithinSpan.java:30 — capture relations inside a
container span).

The reference indexes relations as payloads on a ``_relation``
annotation (RelationInfo.java:30: type + source span + target span,
root relations have no source). Columnar equivalent: a derived
``(doc_id, rel_type, src_start, src_end, tgt_start, tgt_end)`` frame.

The transcript corpus has no gold dependency layer, so the edges come
from a DETERMINISTIC synthetic grammar over the synthetic ``pos``
layer — the same stand-in pattern as the pos tagger itself
(annotations.py): adjacency rules expressible identically in Spark
SQL, DuckDB SQL and Python, which is what makes the machinery
gate-checkable. A real parser's edge table drops in as a stored
relations artifact with the same schema.

Synthetic grammar (all spans are [start, end) token intervals):

* ``det``   — pos[i]=func, pos[i+1]=noun → source [i,i+1) → target
  [i+1,i+2) (forward)
* ``obj``   — pos[i]=verb, pos[i+1]=noun → source [i,i+1) → target
  [i+1,i+2) (forward)
* ``nn``    — pos[i]=noun, pos[i+1]=noun → source [i+1,i+2) (the
  second noun is the head, UD-compound style) → target [i,i+1): a
  BACKWARD relation
* ``nmod``  — pos[i]=noun, pos[i+1]=noun → source [i,i+1) → target
  [i+1,i+2): the head-initial FORWARD companion of ``nn`` (UD
  flat-style). Together they give the middle noun of a noun³
  trigram two same-source edges of different types — the shape the
  multi-branch relation operator (relations_match_multi) needs
* ``nsubj`` — pos[i]=noun, pos[i+1]=verb → source [i+1,i+2) (the
  verb) → target [i,i+1): BACKWARD
* ``root``  — every non-empty doc has one root relation with no
  source, target [0,1) (SpanQueryRelations Direction.ROOT: "relations
  without a source ... indexed at the target")
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from blacklab_spark.index import InvertedIndex

#: span modes (RelationInfo.SpanMode analog)
SPAN_MODES = ("source", "target", "full")
#: direction filters (SpanQueryRelations.Direction)
DIRECTIONS = ("root", "forward", "backward", "both")

_EDGE_FIELDS = ("rel_type", "src_start", "src_end", "tgt_start",
                "tgt_end")


def _edge(typ, s0, s1, t0, t1) -> Column:
    def _c(v):
        return F.lit(v).cast("int") if v is None or isinstance(v, int) \
            else v.cast("int")
    return F.struct(F.lit(typ).alias("rel_type"),
                    _c(s0).alias("src_start"), _c(s1).alias("src_end"),
                    _c(t0).alias("tgt_start"), _c(t1).alias("tgt_end"))


def edges_from_head_layer(df: DataFrame) -> DataFrame:
    """Relation edges from a per-token HEAD/DEPREL layer (the real
    dependency source — e.g. read_conllu's ``tokens_head`` /
    ``tokens_deprel`` columns; reference: DocIndexerConfig relation
    indexing over formats/conll-u.blf.yaml's HEAD/DEPREL mapping,
    RelationInfo.java:30 source=head span, target=dependent span).

    JVM higher-order functions only (no shuffle, no Python): per doc,
    positions with a non-null HEAD become one edge each — HEAD=0 is a
    root edge (no source, indexed at the target like the reference),
    HEAD=h>0 sources at the 0-based head token [h-1, h). Unspecified
    ('_' → null) HEADs are skipped."""
    hd, dp = F.col("tokens_head"), F.col("tokens_deprel")
    n = F.size(hd)
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1)) \
        .otherwise(F.array().cast("array<int>"))
    keep = F.filter(idx, lambda i: F.element_at(hd, i + 1).isNotNull())

    def mk(i: Column) -> Column:
        h = F.element_at(hd, i + 1)
        return F.struct(
            F.coalesce(F.element_at(dp, i + 1), F.lit("dep"))
            .alias("rel_type"),
            F.when(h > 0, h - 1).cast("int").alias("src_start"),
            F.when(h > 0, h).cast("int").alias("src_end"),
            i.cast("int").alias("tgt_start"),
            (i + 1).cast("int").alias("tgt_end"))

    return (df.select("doc_id",
                      F.explode(F.transform(keep, mk)).alias("e"))
            .select("doc_id", *[F.col(f"e.{f}") for f in _EDGE_FIELDS]))


def doc_relations(index: InvertedIndex,
                  dm: DataFrame | None = None) -> DataFrame:
    """All relation edges, one row per edge.

    Prefers the STORED ``_relations`` build artifact (real edges
    ingested from the input's HEAD/DEPREL layer — build stage
    'relations'); the synthetic pos-grammar derivation below is the
    fallback for corpora that arrive without a dependency layer.
    Pass ``dm`` (an already-pruned doc_meta scan, e.g. push_hit_docs
    of an operand's hits) to restrict edges to the anchor docs
    instead of corpus-wide — a semi-join doc filter on the stored
    path, a pruned derivation on the synthetic path.

    The synthetic path is derived JVM-side from the pos layer with
    higher-order array functions (no shuffle, no Python: the per-doc
    edge array is built inside the projection and exploded) and
    requires the ``pos`` annotation layer (same materialization check
    as the executor's layer leaves)."""
    stored = index.doc_relations_stored
    if stored is not None:
        if dm is not None:
            stored = stored.join(dm.select("doc_id"), "doc_id",
                                 "leftsemi")
        return stored
    dm = index.doc_meta if dm is None else dm
    if "tokens_pos" not in dm.columns:
        raise ValueError(
            "relations require the 'pos' annotation layer; this index "
            "was built without it (BuildConfig.annotations)")
    pos = F.col("tokens_pos")
    n = F.size(pos)
    pairs = F.when(n >= 2, F.sequence(F.lit(0), n - 2)) \
        .otherwise(F.array().cast("array<int>"))

    def adj(a: str, b: str) -> Column:
        # positions i with pos[i]=a and pos[i+1]=b (element_at is
        # 1-based)
        return F.filter(pairs, lambda i:
                        (F.element_at(pos, i + 1) == a)
                        & (F.element_at(pos, i + 2) == b))

    det = F.transform(adj("func", "noun"),
                      lambda i: _edge("det", i, i + 1, i + 1, i + 2))
    obj = F.transform(adj("verb", "noun"),
                      lambda i: _edge("obj", i, i + 1, i + 1, i + 2))
    nn = F.transform(adj("noun", "noun"),
                     lambda i: _edge("nn", i + 1, i + 2, i, i + 1))
    nmod = F.transform(adj("noun", "noun"),
                       lambda i: _edge("nmod", i, i + 1, i + 1, i + 2))
    nsubj = F.transform(adj("noun", "verb"),
                        lambda i: _edge("nsubj", i + 1, i + 2, i, i + 1))
    root = F.when(n >= 1, F.array(_edge("root", None, None, 0, 1))) \
        .otherwise(F.array().cast(
            "array<struct<rel_type:string,src_start:int,src_end:int,"
            "tgt_start:int,tgt_end:int>>"))
    edges = F.concat(det, obj, nn, nmod, nsubj, root)
    return (dm.select("doc_id", F.explode(edges).alias("e"))
            .select("doc_id", *[F.col(f"e.{f}") for f in _EDGE_FIELDS]))


def span_mode_cols(span_mode: str) -> tuple[Column, Column]:
    """(start, end) of a relation row under a span mode. Root
    relations have no source and are reported at the target in every
    mode (SpanQueryRelations.createGuarantees comment: 'Root relations
    don't have a source and are indexed at the target')."""
    if span_mode == "source":
        return (F.coalesce("src_start", "tgt_start"),
                F.coalesce("src_end", "tgt_end"))
    if span_mode == "target":
        return F.col("tgt_start"), F.col("tgt_end")
    if span_mode == "full":
        return (F.least(F.coalesce("src_start", "tgt_start"), "tgt_start"),
                F.greatest(F.coalesce("src_end", "tgt_end"), "tgt_end"))
    raise ValueError(f"unknown span mode {span_mode!r} "
                     f"(expected one of {SPAN_MODES})")


def relations(index: InvertedIndex, rel_type: str | None = None,
              direction: str = "both", span_mode: str = "source",
              doc_filter: Column | None = None,
              dm: DataFrame | None = None) -> DataFrame:
    """Relation spans matching a type regex + direction, reported
    under ``span_mode`` (SpanQueryRelations.java:34; the type is
    matched as a regex like the reference's RegexpQuery over relation
    terms). Output: (doc_id, start, end, rel_type, src_start, src_end,
    tgt_start, tgt_end) — the relation operands ride along as match
    info (RelationInfo analog)."""
    if direction not in DIRECTIONS:
        raise ValueError(f"unknown direction {direction!r} "
                         f"(expected one of {DIRECTIONS})")
    r = doc_relations(index, dm=dm)
    if doc_filter is not None:
        allowed = index.doc_meta.filter(doc_filter).select("doc_id")
        r = r.join(allowed, "doc_id", "left_semi")
    if rel_type is not None:
        # full-match semantics like Lucene RegexpQuery
        r = r.filter(F.col("rel_type").rlike(f"^(?:{rel_type})$"))
    if direction == "root":
        r = r.filter(F.col("src_start").isNull())
    elif direction == "forward":
        # target occurs at/after the source (root has no source →
        # counts as forward-sorted per the reference's guarantee)
        r = r.filter(F.col("src_start").isNull()
                     | (F.col("tgt_start") >= F.col("src_start")))
    elif direction == "backward":
        r = r.filter(F.col("src_start").isNotNull()
                     & (F.col("tgt_start") < F.col("src_start")))
    start, end = span_mode_cols(span_mode)
    return r.select("doc_id", start.cast("int").alias("start"),
                    end.cast("int").alias("end"), *_EDGE_FIELDS)


def rel_span_adjust(rels: DataFrame, span_mode: str) -> DataFrame:
    """Re-report relation hits under another span mode
    (SpanQueryRelationSpanAdjust.java:21 / rspan())."""
    start, end = span_mode_cols(span_mode)
    return rels.select("doc_id", start.cast("int").alias("start"),
                       end.cast("int").alias("end"), *_EDGE_FIELDS)


def relations_within_span(rels: DataFrame,
                          containers: DataFrame) -> DataFrame:
    """Relations whose FULL span lies inside a container hit
    (SpansCaptureRelationsWithinSpan.java:30 — e.g. all relations
    within a sentence/turn span). Range equi-join on doc_id; the
    container span rides along as (c_start, c_end)."""
    full = rel_span_adjust(rels, "full")
    c = containers.select("doc_id",
                          F.col("start").alias("c_start"),
                          F.col("end").alias("c_end"))
    return (full.join(c, "doc_id")
            .filter((F.col("start") >= F.col("c_start"))
                    & (F.col("end") <= F.col("c_end")))
            .select("doc_id", "start", "end", *_EDGE_FIELDS,
                    "c_start", "c_end"))


def relations_between(index: InvertedIndex, source_hits: DataFrame,
                      target_hits: DataFrame,
                      rel_type: str | None = None) -> DataFrame:
    """Relations whose source span matches a source hit and target
    span matches a target hit (SpansCaptureRelationsBetweenSpans.java
    — the alignment-query primitive; the CQL ``A -type-> B`` operator
    executes through this). Equi-joins on (doc_id, exact span) keep it
    shuffle-partitioned on doc_id; the reported hit is the FULL
    relation span with both operands as match info."""
    from blacklab_spark.operators.hits import push_hit_docs
    # edges must match BOTH operands, so either side's doc set bounds
    # the derivation; probe the source first, fall back to the target
    # when the source is hot (push_hit_docs returns doc_meta itself on
    # fallback, so the identity check is exact)
    dm = push_hit_docs(source_hits, index.doc_meta)
    if dm is index.doc_meta:
        dm = push_hit_docs(target_hits, index.doc_meta)
    r = relations(index, rel_type, span_mode="full", dm=dm)
    s = source_hits.select("doc_id", F.col("start").alias("src_start"),
                           F.col("end").alias("src_end"))
    t = target_hits.select("doc_id", F.col("start").alias("tgt_start"),
                           F.col("end").alias("tgt_end"))
    return (r.join(s, ["doc_id", "src_start", "src_end"])
            .join(t, ["doc_id", "tgt_start", "tgt_end"])
            .select("doc_id", "start", "end", *_EDGE_FIELDS))


_EDGE_ARRAY_T = ("array<struct<rel_type:string,src_start:int,"
                 "src_end:int,tgt_start:int,tgt_end:int>>")


def _edge_struct() -> Column:
    return F.struct(*_EDGE_FIELDS)


def relations_match_multi(index: InvertedIndex, source_hits: DataFrame,
                          branches: list) -> DataFrame:
    """Multi-branch relation match ``src -t1-> a ; -t2-> b`` (reference
    TextPatternRelationMatch.createRelMatchQuery → SpanQueryAnd with
    setRequireUniqueRelations(true), physically
    SpansAndMultiUniqueRelations.java:51). ``branches`` is a list of
    ``(rel_type, target_hits, negate[, label])``; a labeled positive
    branch records its matched relation's full span in match_info
    under the label (childRelation captureLabel, cql.jj:308).

    Every positive branch must contribute a relation edge of its type
    whose SOURCE span equals the shared parent span and whose target
    span matches a branch target hit; one combination may not reuse
    the same edge twice (unique-relations AND — enforced per
    combination by filtering each joined edge against the combo's
    accumulated edge array). Negated branches anti-join parent spans
    that have any such edge (RelMatch ``!`` semantics). The hit is
    the distinct envelope of the parent span and all matched relation
    spans (RelMatch's full-span convention; the reference reports the
    source span and widens display via captured relations)."""
    from blacklab_spark.operators.hits import push_hit_docs
    src = (source_hits.select("doc_id",
                              F.col("start").alias("s_start"),
                              F.col("end").alias("s_end"))
           .dropDuplicates())
    # one pruned doc_meta scan feeds every branch's edge derivation
    dm = push_hit_docs(source_hits, index.doc_meta)
    acc = (src.withColumn("_env_start", F.col("s_start"))
              .withColumn("_env_end", F.col("s_end"))
              .withColumn("_edges", F.array().cast(_EDGE_ARRAY_T)))
    caps: list[str] = []
    for br in branches:
        rel_type, target_hits, negate = br[0], br[1], br[2]
        label = br[3] if len(br) > 3 else None
        r = relations(index, rel_type, span_mode="full", dm=dm)
        t = target_hits.select(
            "doc_id", F.col("start").alias("tgt_start"),
            F.col("end").alias("tgt_end")).dropDuplicates()
        bi = (r.join(t, ["doc_id", "tgt_start", "tgt_end"])
              .select("doc_id",
                      F.col("src_start").alias("s_start"),
                      F.col("src_end").alias("s_end"),
                      F.col("start").alias("_b_start"),
                      F.col("end").alias("_b_end"),
                      _edge_struct().alias("_b_edge")))
        if negate:
            bad = bi.select("doc_id", "s_start", "s_end")
            acc = acc.join(bad, ["doc_id", "s_start", "s_end"],
                           "left_anti")
            continue
        acc = (acc.join(bi, ["doc_id", "s_start", "s_end"])
               .filter(~F.array_contains("_edges", F.col("_b_edge")))
               .withColumn("_env_start",
                           F.least("_env_start", "_b_start"))
               .withColumn("_env_end", F.greatest("_env_end", "_b_end"))
               .withColumn("_edges",
                           F.concat("_edges", F.array("_b_edge"))))
        if label:
            acc = (acc.withColumn(f"_cap_{label}_s", F.col("_b_start"))
                   .withColumn(f"_cap_{label}_e", F.col("_b_end")))
            caps.append(label)
        acc = acc.drop("_b_start", "_b_end", "_b_edge")
    cols = [F.col("doc_id"),
            F.col("_env_start").cast("int").alias("start"),
            F.col("_env_end").cast("int").alias("end")]
    if caps:
        cols.append(F.create_map(*[
            x for lbl in caps for x in (
                F.lit(lbl),
                F.struct(F.col(f"_cap_{lbl}_s").cast("int").alias("s"),
                         F.col(f"_cap_{lbl}_e").cast("int").alias("e")))
        ]).alias("match_info"))
        # distinct capture combinations stay distinct hits (the map
        # itself can't be a dedup key, its entry columns can)
        return acc.select(
            *cols, *[F.col(f"_cap_{lbl}_{x}")
                     for lbl in caps for x in ("s", "e")]) \
            .dropDuplicates(
                ["doc_id", "start", "end"]
                + [f"_cap_{lbl}_{x}" for lbl in caps
                   for x in ("s", "e")]) \
            .select("doc_id", "start", "end", "match_info")
    return acc.select(*cols).dropDuplicates()


def rmatch_same_span(frames: list) -> DataFrame:
    """``rmatch(q1, q2, ...)`` combine step (XFRelations.java:152 →
    createRelMatchQuery → SpanQueryAnd(requireUniqueRelations)):
    same-span intersection of the clause hit sets. When EVERY clause
    carries relation match info (the edge columns rel() hits ride
    along), a combination may not match the same relation edge twice
    — the unique-relations rule; otherwise it is a plain same-span
    AND (and_, with its documented dedup divergence)."""
    has_rel = all(set(_EDGE_FIELDS) <= set(f.columns) for f in frames)
    if not has_rel:
        from blacklab_spark.operators.spans import and_
        return and_(*frames)
    acc = frames[0].select(
        "doc_id", "start", "end",
        F.array(_edge_struct()).alias("_edges"))
    for f in frames[1:]:
        fi = f.select("doc_id", "start", "end",
                      _edge_struct().alias("_b_edge"))
        acc = (acc.join(fi, ["doc_id", "start", "end"])
               .filter(~F.array_contains("_edges", F.col("_b_edge")))
               .withColumn("_edges",
                           F.concat("_edges", F.array("_b_edge")))
               .drop("_b_edge"))
    return acc.select("doc_id", "start", "end").dropDuplicates()


def capture_relations_within(index: InvertedIndex, hits: DataFrame,
                             capture_as: str,
                             rel_type: str | None = None,
                             within_capture: str | None = None
                             ) -> DataFrame:
    """``rcapture(query, captureAs, relationType)`` and
    ``rcapture2(query, toCapture, captureAs, relationType)`` —
    SpanQueryCaptureRelationsWithinSpan.java:25 / XFRelations
    rcapture / rcaptureWithinCapture: every hit passes through
    unchanged; relations of the type whose FULL span lies inside the
    container span are captured into match_info. The container is the
    hit itself, or — with ``within_capture`` — the clause's existing
    capture group of that name (hits whose match_info lacks the name
    capture nothing). The reference captures a LIST under one name;
    match_info is a map<name, span>, so the list is index-keyed
    (``<captureAs>_0``, ``_1``, … in (start, end) order) — same
    information, flat encoding. Edge derivation is pruned to the
    hits' docs (push_hit_docs anchor pattern).

    Grouping note: Spark cannot group by a map column, so a clause
    WITH existing captures is grouped on the sorted entry array of
    its match_info and the map is rebuilt afterwards (duplicate
    capture names across the old map and the new indexed keys raise
    under Spark's default map-key dedup policy — pick a fresh
    ``capture_as``)."""
    from blacklab_spark.operators.hits import push_hit_docs
    has_mi = "match_info" in hits.columns
    if within_capture is not None and not has_mi:
        raise ValueError(
            "rcapture2() needs a clause with a capture group "
            f"(no match_info to look up {within_capture!r} in)")
    rels = relations(index, rel_type, span_mode="full",
                     dm=push_hit_docs(hits, index.doc_meta))
    cols = ["doc_id", "start", "end"]
    hsel = [F.col(c) for c in cols]
    if has_mi:
        # sorted entries array: group-able stand-in for the map
        hsel.append(F.sort_array(
            F.map_entries("match_info")).alias("_mi"))
    if within_capture is not None:
        cap = F.col("match_info")[within_capture]
        hsel.extend([cap["s"].alias("c_start"),
                     cap["e"].alias("c_end")])
    else:
        hsel.extend([F.col("start").alias("c_start"),
                     F.col("end").alias("c_end")])
    h = hits.select(*hsel).alias("h")
    r = rels.select("doc_id", F.col("start").alias("r_start"),
                    F.col("end").alias("r_end")).alias("r")
    cond = (F.col("h.doc_id") == F.col("r.doc_id")) & \
           (F.col("r.r_start") >= F.col("h.c_start")) & \
           (F.col("r.r_end") <= F.col("h.c_end"))
    j = h.join(r, cond, "left_outer")
    # collect_list skips NULLs, so relation-free hits get an empty map
    captured = F.sort_array(F.collect_list(F.when(
        F.col("r.r_start").isNotNull(),
        F.struct(F.col("r.r_start").alias("s"),
                 F.col("r.r_end").alias("e")))))
    gcols = [F.col(f"h.{c}").alias(c) for c in cols]
    if has_mi:
        gcols.append(F.col("h._mi").alias("_mi"))
    g = j.groupBy(*gcols).agg(captured.alias("_rs"))
    mi = F.map_from_entries(F.transform(
        F.col("_rs"),
        lambda e, i: F.struct(
            F.concat(F.lit(capture_as + "_"), i.cast("string")), e)))
    if has_mi:
        mi = F.map_concat(F.map_from_entries("_mi"), mi)
    return g.select(*cols, mi.alias("match_info"))
