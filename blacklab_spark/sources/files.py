"""File-format sources for the transcript table — the engine's
input-format surface (reference: 16 ``DocIndexer`` input formats,
engine/src/main/resources/formats/*.blf.yaml, SURVEY.md §2.C "Source
scan"). Columnar world needs only a handful: parquet (native),
JSON-lines and CSV with the DECLARED transcript schema (schema is
declared, not inferred — the reference freezes its input-format
config the same way, ConfigInputFormat.java).

Every reader returns the canonical ``TRANSCRIPT_SCHEMA`` frame (extra
columns dropped, required columns verified) so ``build_index`` accepts
any of them interchangeably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.sources.transcripts import TRANSCRIPT_SCHEMA

_REQUIRED = [f.name for f in TRANSCRIPT_SCHEMA.fields]


def _canonicalize(df: DataFrame) -> DataFrame:
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"transcript source is missing columns: {missing}")
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return _canonicalize(spark.read.parquet(path))


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines with the declared schema — no schema inference pass
    (an extra full read at 100 TB)."""
    return _canonicalize(spark.read.schema(TRANSCRIPT_SCHEMA).json(path))


def read_csv(spark: SparkSession, path: str, header: bool = True,
             sep: str = ",") -> DataFrame:
    return _canonicalize(
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("header", str(header).lower()).option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path))


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg catalog table (the production input per
    BASELINE.json.input_hint): ``spark.read.table`` against a
    configured Iceberg catalog — filter/partition pruning and
    snapshot pinning come from the Iceberg source. The sandbox has no
    Iceberg runtime jar, so this path is exercised on a real cluster
    (`--packages org.apache.iceberg:iceberg-spark-runtime-...`); the
    engine is source-agnostic past this point (build_index takes any
    DataFrame with the declared schema)."""
    return _canonicalize(spark.read.table(table))


READERS = {"parquet": read_parquet, "jsonl": read_jsonl, "csv": read_csv,
           "iceberg": read_iceberg}


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet", **kw) -> DataFrame:
    if fmt not in READERS:
        raise ValueError(f"unknown source format {fmt!r} "
                         f"(have: {sorted(READERS)})")
    return READERS[fmt](spark, path, **kw)
