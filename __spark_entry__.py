"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 top-k over sf0.001 documents;
``queries``/``oracle_sql`` pair every implemented operator with a
DuckDB-checkable oracle (see blacklab_spark/driver_gate.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 'spark vector' over sf0.001 documents via
    the full index-build + block-max-WAND path."""
    from blacklab_spark.driver_gate import docs_engine, fmt_topk_docs
    eng = docs_engine(spark, "/root/testdata/sf0.001")
    return fmt_topk_docs(eng.topk(["spark", "vector"], k=10, mode="wand"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blacklab_spark.driver_gate import gate_queries
    return gate_queries()


def oracle_sql() -> dict[str, str]:
    from blacklab_spark.driver_gate import gate_oracles
    return gate_oracles()
