"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample stages.

The Spark-side plumbing (schemas, Arrow batching, mapInPandas
signatures, partitioning) is real and tested; the codec step itself is
STUBBED behind ``DecodeBackend`` because no image/audio library exists
in this container. ``FakeDecodeBackend`` produces deterministic
synthetic pixels/samples from the bytes, so every downstream stage
(resize, features, frame sampling) is exercised end-to-end; swap in a
Pillow/ffmpeg-backed backend on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),      # typed metadata (nullable)
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_luma", FloatType()),
    StructField("phash", StringType()),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_luma", FloatType()),
])

EMBED_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("embedding", ArrayType(FloatType())),
])


class DecodeBackend:
    """Codec interface. Real deployments subclass with Pillow/ffmpeg."""

    def decode_image(self, payload: bytes) -> tuple[int, int, list[float]]:
        """→ (width, height, row-major luma plane in [0,1])."""
        raise NotImplementedError("no image codec in this environment")

    def sample_frames(self, payload: bytes, n: int) -> list[list[float]]:
        raise NotImplementedError("no video codec in this environment")

    def decode_audio(self, payload: bytes) -> tuple[int, list[float]]:
        """→ (sample_rate, mono samples in [-1,1])."""
        raise NotImplementedError("no audio codec in this environment")


class FakeDecodeBackend(DecodeBackend):
    """Deterministic synthetic decode: pixels derived from sha256 of the
    payload. Keeps every Spark-side stage testable and reproducible."""

    def __init__(self, width: int = 8, height: int = 8):
        self.width = width
        self.height = height

    def _plane(self, payload: bytes, salt: bytes) -> list[float]:
        n = self.width * self.height
        out: list[float] = []
        counter = 0
        while len(out) < n:
            block = hashlib.sha256(salt + payload + counter.to_bytes(4, "big")).digest()
            out.extend(b / 255.0 for b in block)
            counter += 1
        return out[:n]

    def decode_image(self, payload: bytes) -> tuple[int, int, list[float]]:
        return self.width, self.height, self._plane(payload, b"img")

    def sample_frames(self, payload: bytes, n: int) -> list[list[float]]:
        return [self._plane(payload, b"frame%d" % i) for i in range(n)]

    def decode_audio(self, payload: bytes) -> tuple[int, list[float]]:
        samples = [(x * 2.0) - 1.0 for x in self._plane(payload, b"audio")]
        return 16000, samples


def _avg_pool(plane: list[float], w: int, h: int, ow: int, oh: int) -> list[float]:
    """Box-filter resize of a row-major plane (pure Python, deterministic)."""
    out = []
    for oy in range(oh):
        y0, y1 = oy * h // oh, max((oy + 1) * h // oh, oy * h // oh + 1)
        for ox in range(ow):
            x0, x1 = ox * w // ow, max((ox + 1) * w // ow, ox * w // ow + 1)
            acc = 0.0
            cnt = 0
            for y in range(y0, y1):
                row = y * w
                for x in range(x0, x1):
                    acc += plane[row + x]
                    cnt += 1
            out.append(acc / cnt)
    return out


def image_features(df: DataFrame, backend: DecodeBackend | None = None) -> DataFrame:
    """Decode → luma stats + 64-bit perceptual hash (8×8 avg-pool,
    threshold at mean). mapInPandas: one Arrow batch of payloads at a
    time; binary stays off the driver."""
    backend = backend or FakeDecodeBackend()

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image" or payload is None:
                    continue
                w, h, plane = backend.decode_image(bytes(payload))
                pooled = _avg_pool(plane, w, h, 8, 8)
                mean = sum(pooled) / len(pooled)
                bits = "".join("1" if p > mean else "0" for p in pooled)
                rows.append({
                    "media_id": media_id, "width": w, "height": h,
                    "mean_luma": float(mean),
                    "phash": f"{int(bits, 2):016x}",
                })
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  backend: DecodeBackend | None = None) -> DataFrame:
    """Decode → box resize → re-emit as embedding-like float plane."""
    backend = backend or FakeDecodeBackend()

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image" or payload is None:
                    continue
                w, h, plane = backend.decode_image(bytes(payload))
                rows.append({
                    "media_id": media_id,
                    "embedding": [float(x) for x in _avg_pool(plane, w, h, out_w, out_h)],
                })
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return df.select("media_id", "kind", "payload").mapInPandas(batches, EMBED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("rms", FloatType()),
    StructField("peak", FloatType()),
])


def audio_features(df: DataFrame, backend: DecodeBackend | None = None) -> DataFrame:
    """Decode audio → sample-rate / RMS / peak features (stub decode,
    real Spark plumbing)."""
    backend = backend or FakeDecodeBackend()

    def batches(it: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "audio" or payload is None:
                    continue
                rate, samples = backend.decode_audio(bytes(payload))
                rms = math.sqrt(sum(s * s for s in samples) / len(samples)) if samples else 0.0
                peak = max((abs(s) for s in samples), default=0.0)
                rows.append({
                    "media_id": media_id, "sample_rate": rate,
                    "n_samples": len(samples),
                    "rms": float(rms), "peak": float(peak),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


EXACT_IMAGE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sum_luma", IntegerType()),
    StructField("phash", StringType()),
])

EXACT_FRAME_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_sum", IntegerType()),
])


def _exact_plane(payload: bytes, salt: str, n_bytes: int = 64) -> list[int]:
    """Deterministic synthetic 'decode': byte plane from chained sha256
    of '<salt><i>:' + payload. Integer-exact by construction so a SQL
    oracle can reproduce it bit-for-bit (no float rounding anywhere)."""
    out: list[int] = []
    i = 0
    while len(out) < n_bytes:
        out.extend(hashlib.sha256(f"{salt}{i}:".encode() + payload).digest())
        i += 1
    return out[:n_bytes]


def image_features_exact(df: DataFrame) -> DataFrame:
    """Integer-exact image features over the stub decode: 8×8 luma-byte
    plane → sum_luma and a 64-bit perceptual hash with the integer
    threshold rule bit_i = (b_i * 64 > Σb) — equivalent to
    (b_i/255 > mean) but free of float ties, so Spark and the DuckDB
    oracle agree bit-for-bit. Same mapInPandas plumbing as the float
    pipeline (binary never on the driver)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image" or payload is None:
                    continue
                plane = _exact_plane(bytes(payload), "img")
                total = sum(plane)
                bits = "".join("1" if b * 64 > total else "0" for b in plane)
                rows.append({
                    "media_id": media_id, "width": 8, "height": 8,
                    "sum_luma": total, "phash": f"{int(bits, 2):016x}",
                })
            yield pd.DataFrame(rows, columns=[f.name for f in EXACT_IMAGE_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(batches, EXACT_IMAGE_SCHEMA)


def video_frame_sums_exact(df: DataFrame, n_frames: int = 3) -> DataFrame:
    """Integer-exact frame sampling: per sampled frame, the sum of its
    32-byte synthetic luma block (one row per frame — the explode shape
    of real frame sampling, with oracle-reproducible values)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                for idx in range(n_frames):
                    block = hashlib.sha256(f"vid{idx}:".encode() + bytes(payload)).digest()
                    rows.append({
                        "media_id": media_id, "frame_idx": idx,
                        "frame_sum": sum(block),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in EXACT_FRAME_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(batches, EXACT_FRAME_SCHEMA)


def sample_video_frames(df: DataFrame, n_frames: int = 3,
                        backend: DecodeBackend | None = None) -> DataFrame:
    """Frame-sample videos → per-frame mean luma rows (explode shape)."""
    backend = backend or FakeDecodeBackend()

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                for idx, frame in enumerate(backend.sample_frames(bytes(payload), n_frames)):
                    rows.append({
                        "media_id": media_id,
                        "frame_idx": idx,
                        "frame_luma": float(sum(frame) / len(frame)),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(batches, FRAME_SAMPLE_SCHEMA)
