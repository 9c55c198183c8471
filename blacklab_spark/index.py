"""Index handle: loads artifacts, exposes stats + term lookup.

Spark analog of ``BlackLab.open(dir)`` → ``BlackLabIndex``
(reference: engine/src/main/java/nl/inl/blacklab/search/BlackLab.java:105).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.config import BuildConfig
from blacklab_spark.oracle import bm25_idf


class InvertedIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        with open(os.path.join(self.path, "_index_meta.json")) as f:
            self.meta = json.load(f)
        c = self.meta["config"]
        self.cfg = BuildConfig(**{k: v for k, v in c.items()
                                  if k in BuildConfig.__dataclass_fields__})
        s = self.meta["stats"]
        self.n_docs: int = s["n_docs"]
        self.avgdl: float = s["avgdl"]
        # driver-side memo for dictionary lookups: the terms table is
        # immutable per index, and one query resolves the same terms
        # several times (cost choice, execution, explain) — each was a
        # separate Spark job before.
        self._term_cache: dict = {}

    # Lazy DataFrames over the artifacts -------------------------------
    @property
    def terms(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "terms"))

    @property
    def doc_meta(self) -> DataFrame:
        """Doc rows minus tombstoned docs (Lucene-tombstone model:
        deleted docs are invisible to results, corpus statistics stay
        stale until compaction — reference: IndexTool delete /
        Lucene deletes, tools/.../IndexTool.java:65)."""
        dm = self.spark.read.parquet(os.path.join(self.path, "doc_meta"))
        return self.without_deleted(dm)

    @property
    def postings(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "postings"))

    # -- deletes (tombstones) ------------------------------------------
    @property
    def deletes_path(self) -> str:
        return os.path.join(self.path, "_deletes")

    @property
    def has_deletes(self) -> bool:
        p = self.deletes_path
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p))

    @property
    def deleted_doc_ids(self) -> DataFrame | None:
        if not self.has_deletes:
            return None
        return (self.spark.read.parquet(self.deletes_path)
                .select("doc_id").distinct())

    def without_deleted(self, df: DataFrame) -> DataFrame:
        """Anti-join a (doc_id, ...) frame against the tombstones —
        no-op (and no plan change) when the index has no deletes.
        Postings-only paths (block decode kernels) must route through
        this; doc_meta applies it automatically."""
        d = self.deleted_doc_ids
        if d is None:
            return df
        # plain left_anti: AQE broadcasts when the tombstone set is
        # small, falls back to shuffle join for mass deletions.
        return df.join(d, "doc_id", "left_anti")

    # Term planning (driver-side; the terms dict is tiny vs the corpus;
    # mirrors Lucene's rewrite of multi-term queries to term ORs,
    # reference: search/lucene/BLSpanMultiTermQueryWrapper.java:53) ----
    def lookup_terms(self, terms: list[str]) -> pd.DataFrame:
        """Exact term lookup → pandas (term, term_id, df, cf, idf).
        Memoized per index (callers must not mutate the result)."""
        uniq = tuple(sorted(set(terms)))
        key = ("terms", uniq)
        if key not in self._term_cache:
            pdf = (self.terms.filter(F.col("term").isin(list(uniq)))
                   .select("term", "term_id", "df", "cf").toPandas())
            pdf["idf"] = [bm25_idf(self.n_docs, int(d)) for d in pdf["df"]]
            self._term_cache[key] = \
                pdf.sort_values("term_id").reset_index(drop=True)
        return self._term_cache[key]

    def expand_regex(self, pattern: str, limit: int = 10000) -> pd.DataFrame:
        """Regex → matching terms (SpanMultiTermQueryWrapper analog).
        Memoized per index."""
        key = ("regex", pattern, limit)
        if key not in self._term_cache:
            pdf = (self.terms.filter(F.col("term").rlike(pattern))
                   .select("term", "term_id", "df", "cf")
                   .limit(limit).toPandas())
            pdf["idf"] = [bm25_idf(self.n_docs, int(d)) for d in pdf["df"]]
            self._term_cache[key] = \
                pdf.sort_values("term_id").reset_index(drop=True)
        return self._term_cache[key]

    def expand_prefix(self, prefix: str, limit: int = 10000) -> pd.DataFrame:
        pdf = (self.terms.filter(F.col("term").startswith(prefix))
               .select("term", "term_id", "df", "cf").limit(limit).toPandas())
        pdf["idf"] = [bm25_idf(self.n_docs, int(d)) for d in pdf["df"]]
        return pdf.sort_values("term_id").reset_index(drop=True)


def open_index(spark: SparkSession, path: str) -> InvertedIndex:
    return InvertedIndex(spark, path)
