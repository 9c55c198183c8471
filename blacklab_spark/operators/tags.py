"""Inline-tag span layer — the reference's "tags" annotation.

BlackLab indexes XML elements in the content (``<s/>``, ``<ne/>``,
...) as spans on a dedicated annotation, queried with ``<s/>`` leaves
and ``within``/``containing`` filters (reference:
engine/src/main/java/nl/inl/blacklab/search/lucene/SpanQueryTags.java:30,
index/annotated/AnnotatedFieldWriter.java tag handling,
AnnotatedFieldNameUtil.TAGS_ANNOT_NAME). Here the layer is a parquet
artifact ``_spans`` with rows ``(doc_id, tag, start, end, attrs)`` in
token coordinates — produced at build time by a **map-side** stack
machine over the document text (one ``aggregate`` HOF projection; no
shuffle, no Python), so deriving spans scales exactly like
tokenization.

Event model: the text is scanned once with a single regex whose
alternation yields, in document order, either a tag
(``</?name ...>``) or a token (the frozen tokenizer's ``[L M N]+``
run). Token events advance the position counter; open tags push
(name, pos, attrs) on a stack; close tags pop and emit a span
``[start, end)``; self-closing tags emit an empty span at the current
position. Tags must be well-nested (the reference requires
well-formed XML input, DocIndexerXmlHandlers); a stray close tag is
ignored. Token positions count tokens of the TAG-STRIPPED text, which
is exactly what the build tokenizes — spans and token arrays stay
aligned by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A tag: '<' optional '/', ASCII name, anything but '>', then '>'.
TAG_RE = r"</?[A-Za-z][^>]*>"
# One scan, tags before tokens (a token can never start at '<').
EVENT_RE = TAG_RE + r"|[\p{L}\p{M}\p{N}]+"
_NAME_RE = r"^</?\s*([A-Za-z][A-Za-z0-9_-]*)"
_ATTRS_RE = r"^<[A-Za-z][A-Za-z0-9_-]*\s+([^>]*?)/?\s*>$"

_ACC_T = ("struct<pos:int,onames:array<string>,ostarts:array<int>,"
          "oattrs:array<string>,"
          "spans:array<struct<tag:string,start:int,end:int,attrs:string>>>")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_tags(text: Column | str) -> Column:
    """Tag-stripped text — what the tokenizer sees on a tagged corpus.
    Tags become a space so adjacent tokens never merge."""
    return F.regexp_replace(_col(text), TAG_RE, " ")


def tag_spans_col(text: Column | str) -> Column:
    """array<struct<tag,start,end,attrs>> of all tag spans in one
    text — a single JVM ``aggregate`` over the event stream (the
    stack machine described in the module docstring)."""
    ev = F.regexp_extract_all(_col(text), F.lit(EVENT_RE), 0)
    init = F.expr(
        "named_struct('pos', 0,"
        " 'onames', CAST(array() AS array<string>),"
        " 'ostarts', CAST(array() AS array<int>),"
        " 'oattrs', CAST(array() AS array<string>),"
        " 'spans', CAST(array() AS"
        " array<struct<tag:string,start:int,end:int,attrs:string>>))"
    ).cast(_ACC_T)

    def st(pos, onames, ostarts, oattrs, spans):
        return F.struct(pos.cast("int").alias("pos"),
                        onames.alias("onames"), ostarts.alias("ostarts"),
                        oattrs.alias("oattrs"), spans.alias("spans"))

    def merge(acc, e):
        is_close = e.startswith("</")
        is_self = e.startswith("<") & e.endswith("/>")
        is_open = e.startswith("<") & ~is_close & ~is_self
        name = F.regexp_extract(e, _NAME_RE, 1)
        attrs = F.regexp_extract(e, _ATTRS_RE, 1)
        n = F.size(acc.onames)
        closed = F.struct(
            F.element_at(acc.onames, -1).alias("tag"),
            F.element_at(acc.ostarts, -1).alias("start"),
            acc.pos.alias("end"),
            F.element_at(acc.oattrs, -1).alias("attrs"))
        selfspan = F.struct(name.alias("tag"), acc.pos.alias("start"),
                            acc.pos.alias("end"), attrs.alias("attrs"))
        return (
            F.when(is_close & (n > 0),
                   st(acc.pos,
                      F.slice(acc.onames, 1, n - 1),
                      F.slice(acc.ostarts, 1, n - 1),
                      F.slice(acc.oattrs, 1, n - 1),
                      F.array_append(acc.spans, closed)))
            .when(is_close, acc)           # stray close: ignore
            .when(is_self,
                  st(acc.pos, acc.onames, acc.ostarts, acc.oattrs,
                     F.array_append(acc.spans, selfspan)))
            .when(is_open,
                  st(acc.pos,
                     F.array_append(acc.onames, name),
                     F.array_append(acc.ostarts, acc.pos),
                     F.array_append(acc.oattrs, attrs),
                     acc.spans))
            .otherwise(st(acc.pos + 1, acc.onames, acc.ostarts,
                          acc.oattrs, acc.spans)))

    return F.aggregate(ev, init, merge, lambda a: a["spans"])


def doc_tag_spans(dm: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tag, start, end, attrs) — one row per tag span.
    Narrow map-side projection + explode; docs without tags vanish."""
    return (dm.select("doc_id",
                      F.explode(tag_spans_col(text_col)).alias("sp"))
            .select("doc_id",
                    F.col("sp.tag").alias("tag"),
                    F.col("sp.start").alias("start"),
                    F.col("sp.end").alias("end"),
                    F.col("sp.attrs").alias("attrs")))


def attr_value(attrs: Column | str, key: str) -> Column:
    """Value of one ``key="value"`` attribute (empty if absent) —
    the query-time attribute probe (SpanQueryTags attribute filter)."""
    return F.regexp_extract(_col(attrs), key + r'\s*=\s*"([^"]*)"', 1)


def tag_hits(index, name: str, attr_key: str | None = None,
             attr_val: str | None = None,
             spans: DataFrame | None = None,
             adjust: str = "full",
             attr_range: tuple | None = None) -> DataFrame:
    """Hits = stored spans of ``<name/>`` (optionally filtered on one
    attribute value) — the SpanQueryTags.java:30 leaf. Reads only the
    (small) ``_spans`` artifact; the tag filter pushes into its
    parquet scan. Pass ``spans`` to probe an already doc-id-pruned
    scan (the `within <tag/>` executor pushes the producer's docs).
    ``adjust`` = ``full`` | ``lead`` | ``trail`` (TextPatternTags.
    Adjust: ``<s>``/``</s>`` are the zero-width tag edges);
    ``attr_range`` = (key, min, max) integer attribute test
    (MatchValue.intRange)."""
    sp = (index.doc_spans if spans is None else spans) \
        .filter(F.col("tag") == name)
    if attr_key is not None:
        sp = sp.filter(attr_value(F.col("attrs"), attr_key)
                       == (attr_val or ""))
    if attr_range is not None:
        k, lo, hi = attr_range
        sp = sp.filter(attr_value(F.col("attrs"), k).cast("int")
                       .between(lo, hi))
    if adjust == "lead":
        return sp.select("doc_id", "start",
                         F.col("start").alias("end"))
    if adjust == "trail":
        return sp.select("doc_id", F.col("end").alias("start"), "end")
    return sp.select("doc_id", "start", "end")


# ------------------------------------------------------------------
# DuckDB oracle: same spans via depth-matching window functions
# (well-nested same-name tags pair open(depth d) with the first
# following close whose running depth is d-1).
# ------------------------------------------------------------------

def duckdb_tag_spans_cte(docs_cte: str = "tdocs",
                         text_col: str = "text") -> str:
    """CTE fragment defining ``tagspans(doc_id, tag, start, end,
    attrs)`` over ``docs_cte(doc_id, text)`` — an independent
    relational formulation (windows, not a stack) of the same
    semantics, for the paired gate."""
    ev_re = EVENT_RE.replace("'", "''")
    return f"""
tev0 AS (
  SELECT doc_id,
         unnest(regexp_extract_all({text_col}, '{ev_re}')) AS e,
         generate_subscripts(regexp_extract_all({text_col}, '{ev_re}'), 1)
           AS seq
  FROM {docs_cte}),
tev AS (
  SELECT doc_id, e, seq,
         CASE WHEN e LIKE '</%' THEN 'close'
              WHEN e LIKE '<%/>' THEN 'self'
              WHEN e LIKE '<%' THEN 'open'
              ELSE 'tok' END AS kind,
         regexp_extract(e, '^</?\\s*([A-Za-z][A-Za-z0-9_-]*)', 1) AS name,
         regexp_extract(e, '^<[A-Za-z][A-Za-z0-9_-]*\\s+([^>]*?)/?\\s*>$', 1)
           AS attrs
  FROM tev0),
tevp AS (
  SELECT *,
         CAST(coalesce(sum(CASE WHEN kind = 'tok' THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS INT) AS p,
         sum(CASE WHEN kind = 'open' THEN 1
                  WHEN kind = 'close' THEN -1 ELSE 0 END)
             OVER (PARTITION BY doc_id, name ORDER BY seq) AS depth
  FROM tev),
tagspans0 AS (
  SELECT o.doc_id, o.name AS tag, o.p AS start,
         (SELECT c.p FROM tevp c
          WHERE c.doc_id = o.doc_id AND c.name = o.name
            AND c.kind = 'close' AND c.seq > o.seq
            AND c.depth = o.depth - 1
          ORDER BY c.seq LIMIT 1) AS "end",
         o.attrs
  FROM tevp o WHERE o.kind = 'open'
  UNION ALL
  SELECT doc_id, name, p, p, attrs FROM tevp WHERE kind = 'self'),
tagspans AS (
  -- unclosed opens (NULL end) are dropped, like the stack machine
  SELECT * FROM tagspans0 WHERE "end" IS NOT NULL)"""
