"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (task brief).

The Spark-side plumbing is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partition-size control for large
blobs. The codec step is stubbed: the image/audio libraries are not in
this container, so each kernel calls ``_decode_image``/``_decode_audio``
which (a) raises ``NotImplementedError`` in strict mode, or (b) runs a
clearly-marked deterministic fake (header-derived pseudo-decode) so the
dataflow is exercisable end-to-end in tests.

Scale notes: media blobs are orders of magnitude larger than text —
``media_repartition`` targets a bytes-per-partition budget so a task's
Arrow batch never exceeds executor memory; decode kernels stream via
``mapInPandas`` (iterator of batches) rather than materializing a
partition at once.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

AUDIO_FRAMES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("rms", T.FloatType(), True),
    ]
)

def _decode_image(payload: bytes, strict: bool = False) -> tuple[int, int]:
    """STUB: real impl uses PIL/opencv (absent in this container).
    Deterministic fake derives dimensions from the payload digest."""
    if strict:
        raise NotImplementedError("image codecs not available in sandbox")
    h = zlib.crc32(payload or b"")
    return 64 + h % 1024, 64 + (h >> 10) % 1024


def _decode_audio(payload: bytes, strict: bool = False) -> list[float]:
    """STUB: real impl uses soundfile/ffmpeg. Deterministic fake:
    pseudo-RMS series from rolling digests."""
    if strict:
        raise NotImplementedError("audio codecs not available in sandbox")
    n_frames = max(1, len(payload or b"") // 256)
    return [
        (zlib.crc32((payload or b"")[i * 256:(i + 1) * 256]) % 10_000) / 10_000.0
        for i in range(n_frames)
    ]


def media_repartition(media: DataFrame, target_mb: int = 64,
                      size_col: str = "payload") -> DataFrame:
    """Partition-size control for blob tables: estimate total bytes,
    hash-repartition on media_id into ceil(total/target) partitions so
    one task's batch stays within memory."""
    total = media.select(
        F.sum(F.length(F.col(size_col))).alias("b")
    ).first().b or 0
    n_parts = max(1, int(total // (target_mb * 1024 * 1024)) + 1)
    return media.repartition(n_parts, "media_id")


def image_features(media: DataFrame, embed_dim: int = 8,
                   strict: bool = False) -> DataFrame:
    """decode → resize → feature-extract as a streaming mapInPandas
    kernel. Embedding here is the deterministic fake (digest-seeded)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "n_bytes", "phash", "embedding")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                w, h = _decode_image(raw, strict)
                digest = hashlib.blake2b(raw, digest_size=16).digest()
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["phash"].append(
                    int.from_bytes(digest[:8], "little", signed=True)
                )
                out["embedding"].append(
                    [b / 255.0 for b in digest[:embed_dim]]
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        _kernel, schema=IMAGE_FEATURES
    )


def audio_frames(media: DataFrame, frame_ms: int = 1000,
                 strict: bool = False) -> DataFrame:
    """decode → frame-sample: one output row per audio frame
    (UDTF-shaped mapInPandas — rows out ≫ rows in)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "start_ms", "rms")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                series = _decode_audio(
                    bytes(payload) if payload is not None else b"", strict
                )
                for i, rms in enumerate(series):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["start_ms"].append(i * frame_ms)
                    out["rms"].append(rms)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _kernel, schema=AUDIO_FRAMES
    )


VIDEO_FRAMES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def _decode_video(payload: bytes, strict: bool = False) -> list[bytes]:
    """STUB: real impl uses ffmpeg/pyav frame iteration (absent in this
    container). Deterministic fake: one pseudo-frame per 4 KB of
    payload, each a digest of its slice."""
    if strict:
        raise NotImplementedError("video codecs not available in sandbox")
    n = max(1, len(payload or b"") // 4096)
    return [
        hashlib.blake2b((payload or b"")[i * 4096:(i + 1) * 4096],
                        digest_size=8).digest()
        for i in range(n)
    ]


def video_frames(media: DataFrame, every_nth: int = 5, fps: int = 30,
                 strict: bool = False) -> DataFrame:
    """decode → sample every Nth frame → per-frame phash (UDTF-shaped
    mapInPandas). Frame phashes feed ``near_dup_images`` unchanged, so
    video near-dup detection = frame-level phash banding."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "phash")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = _decode_video(
                    bytes(payload) if payload is not None else b"", strict
                )
                for i in range(0, len(frames), every_nth):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(int(i * 1000 / fps))
                    out["phash"].append(
                        int.from_bytes(frames[i], "little", signed=True)
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        _kernel, schema=VIDEO_FRAMES
    )


def near_dup_images(features: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual near-dup pairs by phash banding (same pigeonhole trick
    as text SimHash) — composes with dedupe.simhash_near_pairs logic."""
    bands = 4
    width = 64 // bands
    banded = features.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("phash", i * width)
                    .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    l = banded.select(F.col("media_id").alias("a"),
                      F.col("phash").alias("ph_a"), "band_id", "band_key")
    r = banded.select(F.col("media_id").alias("b"),
                      F.col("phash").alias("ph_b"), "band_id", "band_key")
    return (
        l.join(r, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
