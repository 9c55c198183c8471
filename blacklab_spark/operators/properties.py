"""Hit/Doc property key DSL → Column expressions.

The reference's sort/group/filter key language (reference:
engine/src/main/java/nl/inl/blacklab/resultproperty/HitProperty.java:25,60-128
dispatcher; HitPropertyHitText / BeforeHit / AfterHit / ContextPart /
DocumentStoredField / DocumentDecade / HitPosition; DocProperty*;
``-`` prefix = descending, ``,`` = multi-key). Here a property key
compiles to a Spark Column over the joined (hits ⋈ doc_meta) frame —
sorting/grouping is then plain ``orderBy`` / ``groupBy``.

Supported keys (single annotation 'word', insensitive corpus):
    hit[:word[:i]]        text of the hit (tokens joined by space)
    before[:word[:i][:k]] k-th token before the hit (default 1)
    after[:word[:i][:k]]  k-th token after the hit (default 1)
    left / right          aliases of before/after
    capture:<name>        text of a named capture group (match_info)
    field:<name>          doc metadata column (role, tool, conv_id, …)
    decade[:ts]           decade of the doc timestamp
                          (HitPropertyDocumentDecade analog)
    doc / docid           doc_id
    hitposition           start offset
    length                hit length in tokens
Prefix ``-`` → descending. Multi-key: comma-separated.

Collation: textual sort keys order by ``(accent_fold(v), v)`` — the
fold is the same fixed table the @i analyzer uses, approximating the
reference's ICU-collated term sort positions (Terms.java:34-69,
integrated.md:144-149) at primary strength with a deterministic
raw-string tie-break, identically expressible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from blacklab_spark.index import InvertedIndex

_DOC_FIELDS = {"role", "tool", "conv_id", "turn_idx", "ts", "n_tokens"}


def compile_property(key: str) -> Column:
    """One property key (no ``-`` prefix) → Column expr. Assumes the
    frame has hit cols + doc_meta cols (incl. ``tokens``)."""
    parts = key.split(":")
    head = parts[0]
    if head in ("hit",):
        return F.concat_ws(
            " ", F.slice("tokens", F.col("start") + 1,
                         F.col("end") - F.col("start")))
    if head in ("before", "left", "after", "right"):
        k = 1
        for p in parts[1:]:
            if p.isdigit():
                k = int(p)
        if head in ("before", "left"):
            idx = F.col("start") - k + 1          # 1-based element_at
        else:
            idx = F.col("end") + k
        # idx < 1 means "off the left edge" — group under '' like the
        # reference's empty context. Spark's negative element_at indexes
        # from the array END, so it must never reach try_element_at.
        return F.coalesce(
            F.when(idx >= 1, F.try_element_at("tokens", idx.cast("int"))),
            F.lit(""))
    if head == "context" and len(parts) > 1 and parts[-1].isdigit():
        # full ±k context window text (HitPropertyContextPart analog)
        k = int(parts[-1])
        lo = F.greatest(F.lit(0), F.col("start") - k)
        return F.coalesce(
            F.concat_ws(" ", F.slice(
                "tokens", (lo + 1).cast("int"),
                (F.col("end") + k - lo).cast("int"))), F.lit(""))
    if head == "capture" and len(parts) > 1:
        # text of the captured span (HitPropertyCaptureGroup analog)
        name = parts[1]
        s = F.col("match_info")[name]["s"]
        e = F.col("match_info")[name]["e"]
        return F.coalesce(
            F.concat_ws(" ", F.slice("tokens", (s + 1).cast("int"),
                                     (e - s).cast("int"))), F.lit(""))
    if head == "field" and len(parts) > 1:
        return F.col(parts[1])
    if head == "decade":
        field = parts[1] if len(parts) > 1 else "ts"
        return (F.floor(F.year(field) / 10) * 10).cast("int")
    if head in _DOC_FIELDS:
        return F.col(head)
    if head in ("doc", "docid"):
        return F.col("doc_id")
    if head == "hitposition":
        return F.col("start")
    if head == "length":
        return F.col("end") - F.col("start")
    raise ValueError(f"unknown property key: {key!r}")


_TEXTUAL_HEADS = {"hit", "before", "left", "after", "right", "capture",
                  "context"}


def _is_textual(key: str) -> bool:
    return key.split(":")[0] in _TEXTUAL_HEADS


def collation_key(c: Column) -> Column:
    """TRUE ICU primary-strength collation via Spark 4 collated
    strings: UNICODE_CI_AI = root collator, case- and accent-
    insensitive — the reference's insensitive sort-position order
    (forwardindex/Terms.java:34-69 collator sort positions). Handles
    the multi-char folds (ß/œ) the round-2 fold-table surrogate
    documented as unsupported. Callers pair this with the raw column
    as tiebreak for determinism."""
    return F.collate(c, "UNICODE_CI_AI")


def _parse_keys(spec: str) -> list[tuple[str, bool]]:
    out = []
    for raw in spec.split(","):
        raw = raw.strip()
        desc = raw.startswith("-")
        out.append((raw.lstrip("-"), desc))
    return out


def _with_meta(index: InvertedIndex, hits: DataFrame) -> DataFrame:
    meta_cols = ["doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                 "n_tokens", "tokens"]
    return hits.join(index.doc_meta.select(*meta_cols), "doc_id")


def sort_hits(index: InvertedIndex, hits: DataFrame, spec: str) -> DataFrame:
    """Sort hits by a property spec, e.g. ``field:conv_id,hitposition``
    or ``-after:word:i:1`` (HitsAbstract.sort analog). Textual keys
    sort collated: (folded, raw) — see module docstring."""
    frame = _with_meta(index, hits)
    cols = []
    for key, desc in _parse_keys(spec):
        c = compile_property(key)
        if _is_textual(key):
            ck = collation_key(c)
            cols.extend([ck.desc() if desc else ck.asc(),
                         c.desc() if desc else c.asc()])
        else:
            cols.append(c.desc() if desc else c.asc())
    return frame.orderBy(*cols).select("doc_id", "start", "end")


def group_hits(index: InvertedIndex, hits: DataFrame, spec: str,
               max_stored: int = 0) -> DataFrame:
    """Group hits by property spec → (group_key..., count[, hits]).

    ≙ HitGroups (reference: search/results/HitGroups.java:54): sizes
    always; ≤max_stored example hits per group when requested."""
    frame = _with_meta(index, hits)
    keys = _parse_keys(spec)
    key_cols = [compile_property(k).alias(f"key_{i}")
                for i, (k, _) in enumerate(keys)]
    aggs = [F.count("*").alias("count")]
    if max_stored > 0:
        aggs.append(F.slice(
            F.sort_array(F.collect_list(F.struct("doc_id", "start", "end"))),
            1, max_stored).alias("stored_hits"))
    return frame.select(*key_cols, "doc_id", "start", "end") \
        .groupBy(*[f"key_{i}" for i in range(len(keys))]).agg(*aggs)


#: property-key heads whose value is a pure function of the DOCUMENT
#: (not the hit) — the keys for which a per-group subcorpus exists
_DOC_BASED_HEADS = {"field", "decade", "doc", "docid"} | _DOC_FIELDS


def group_hits_subcorpus(index: InvertedIndex, hits: DataFrame,
                         spec: str, docs: DataFrame | None = None
                         ) -> DataFrame:
    """HitGroups with per-group subcorpus sizes + relative frequency
    (reference: the BLS grouped-hits response's ``subcorpusSize``
    {documents, tokens} per group — server
    WebserviceOperations/ResultHitGroup: when hits are grouped by a
    DOCUMENT property, each group's subcorpus is every doc in the
    (optionally filtered) corpus sharing the group's key values,
    whether or not it has hits; relative frequency = group hit count /
    subcorpus token count).

    All keys must be document-based (``field:``/``decade``/``doc``);
    hit-text keys have no per-group subcorpus and raise. The subcorpus
    sizes come from ONE aggregation over doc_meta (scalar columns
    only — the scan never touches token arrays) joined to the already-
    aggregated group frame: two small post-agg relations, no per-group
    scans, broadcast-joinable at any corpus size."""
    keys = _parse_keys(spec)
    for k, _ in keys:
        if k.split(":")[0] not in _DOC_BASED_HEADS:
            raise ValueError(
                f"subcorpus sizes need document-based group keys "
                f"(field:/decade/doc); got {k!r}")
    groups = group_hits(index, hits, spec)
    dm = docs if docs is not None else index.doc_meta
    key_cols = [compile_property(k).alias(f"key_{i}")
                for i, (k, _) in enumerate(keys)]
    key_names = [f"key_{i}" for i in range(len(keys))]
    sub = (dm.select(*key_cols, "n_tokens")
           .groupBy(*key_names)
           .agg(F.count("*").alias("subcorpus_docs"),
                F.sum("n_tokens").alias("subcorpus_tokens")))
    return (groups.join(sub, key_names)
            .withColumn("rel_freq",
                        F.col("count") / F.col("subcorpus_tokens")))


def group_stats(groups: DataFrame) -> dict:
    """largestGroupSize / totalResults over a grouped frame
    (HitGroups.java:140-190)."""
    row = groups.agg(F.max("count").alias("largest"),
                     F.sum("count").alias("total"),
                     F.count("*").alias("n_groups")).collect()[0]
    return {"largest_group": row["largest"], "total_hits": row["total"],
            "n_groups": row["n_groups"]}


def facets(index: InvertedIndex, docs: DataFrame,
           fields: list[str]) -> dict[str, DataFrame]:
    """Multi-criteria doc counts, sizes only (Facets.java:9-31):
    one groupBy per facet field over the same filtered doc set."""
    out = {}
    for f_ in fields:
        out[f_] = (docs.groupBy(F.col(f_).alias("value"))
                   .agg(F.count("*").alias("count")))
    return out


def group_of_groups(groups: DataFrame) -> DataFrame:
    """Group the groups by size (HitGroupPropertySize analog,
    reference: resultproperty/HitGroupPropertySize.java): how many
    groups have each size."""
    return (groups.groupBy(F.col("count").alias("group_size"))
            .agg(F.count("*").alias("n_groups"))
            .orderBy(F.desc("group_size")))
