"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media ride as ``binary``
columns (or object-store URIs) beside typed metadata structs; decode /
resize / frame-sample run as Arrow-batched kernels over
``mapInPandas`` so bytes never round-trip through Python row objects.

The decode step itself is STUBBED here (PIL/ffmpeg are not in this
container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless the optional lib imports — but the
Spark-side contract (schemas, batching, kernel signatures, feature
extraction over raw bytes) is real and tested. ``byte_features`` is
the oracle-checkable representative: metadata computed from payload
bytes inside the kernel, verified by DuckDB against the same bytes.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("digest", T.StringType(), False),
    T.StructField("head_byte", T.IntegerType(), True),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of text.

    Stands in for real decoded media so the pipeline (binary column →
    kernel → features) runs end-to-end and stays oracle-checkable
    (md5 of ascii text == md5 of payload bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(None).cast("int").alias("sample_rate"),
                 F.lit(None).cast("int").alias("duration_ms")).alias("meta"),
    )


def _features_kernel(batches):
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "n_bytes": [len(p) if p is not None else 0 for p in payloads],
            "digest": [hashlib.md5(p).hexdigest() if p is not None else ""
                       for p in payloads],
            "head_byte": [p[0] if p else None for p in payloads],
        })


def byte_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over raw payload bytes."""
    return (media.select("media_id", "payload")
            .mapInPandas(_features_kernel, FEATURE_SCHEMA))


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


def decode_image_kernel(batches):
    """mapInPandas kernel: payload → (media_id, width, height, mode).

    Real decode requires PIL; in this container it raises — the
    plumbing (signature, schema, batch shape) is the tested contract.
    """
    PIL = _try_import("PIL.Image")
    if PIL is None:
        raise NotImplementedError(
            "image decode requires Pillow (not in container); "
            "plumbing is exercised via byte_features instead")
    import io
    for pdf in batches:  # pragma: no cover - needs PIL
        rows = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            img = PIL.open(io.BytesIO(payload))
            rows.append({"media_id": mid, "width": img.width,
                         "height": img.height, "mode": img.mode})
        yield pd.DataFrame(rows)


DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("mode", T.StringType(), False),
])


def decode_images(media: DataFrame) -> DataFrame:
    """Decode image payloads (stubbed; raises at execution without PIL)."""
    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(decode_image_kernel, DECODED_IMAGE_SCHEMA))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts).

    The timestamps come from metadata (duration), so the plan is pure
    DataFrame ops; actual frame extraction would be a kernel like
    decode_images. Demonstrates explode-based fan-out without decoding.
    """
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.coalesce(F.col("meta.duration_ms"),
                                              F.lit(0)) - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))
