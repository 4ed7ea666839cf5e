"""Multimodal columns: opaque ``binary`` media + typed metadata.

The Spark-side plumbing (schemas, batch shapes, partition strategy, UDF
signatures) is real and tested; the codec work itself is stubbed behind
:data:`HAVE_MEDIA_LIBS` because no image/audio library ships in this
container — :func:`_decode_image_stub` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces a seeded fake feature vector so
the distributed plumbing can be exercised end-to-end.

Design points that survive a 100 TB corpus:
* media bytes stay in-column (no driver collect, no temp files);
* ``mapInPandas`` processes whole Arrow batches — metadata-only projections
  never deserialize the binary column (columnar pruning);
* decode output is a fixed-width ``array<float>`` feature column + a typed
  metadata struct, so downstream joins/ANN shuffle features, not bytes;
* per-batch byte budget: huge blobs are truncated with a lineage note, the
  analog of the resize cap P7 (``image_processor.py:227-241``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - the container has no media libs by design
    import PIL.Image  # noqa: F401
    HAVE_MEDIA_LIBS = True
except ImportError:
    HAVE_MEDIA_LIBS = False

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),       # image | audio | video
    T.StructField("payload", T.BinaryType(), True),    # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_DIM = 32

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha_prefix", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])

MAX_PAYLOAD_BYTES = 8 * 1024 * 1024  # P7 analog: cap pathological blobs


def _decode_image_stub(payload: bytes, deterministic_fake: bool) -> np.ndarray:
    """Decode + feature-extract one media payload.

    Real implementation would be: decode (PIL/libav) → resize/frame-sample
    → embed.  STUB: without media libs, either raise (production guard) or
    emit a deterministic fake derived from the payload bytes (test path).
    """
    if HAVE_MEDIA_LIBS:  # pragma: no cover
        raise NotImplementedError("real decode path not wired in this build")
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this container")
    # seeded fake: stable per payload, exercises the full distributed path
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.RandomState(seed)
    return rng.normal(size=FEATURE_DIM).astype("float32")


def extract_media_features(df: DataFrame, deterministic_fake: bool = True,
                           batch_max_bytes: int = 64 * 1024 * 1024) -> DataFrame:
    """media table → (media_id, kind, n_bytes, sha_prefix, features).

    ``mapInPandas`` so one Python worker handles an entire Arrow batch; the
    ``batch_max_bytes`` argument documents the operational knob (pair with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of blobs
    fits in worker memory).
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            # column-wise over the Arrow batch (no per-row Series views);
            # the per-payload codec call is inherently per-blob work
            payloads = [bytes(p)[:MAX_PAYLOAD_BYTES] if p is not None else b""
                        for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(dtype=object),
                "n_bytes": [len(p) for p in payloads],
                "sha_prefix": [hashlib.sha256(p).hexdigest()[:16]
                               for p in payloads],
                "features": [
                    [float(x) for x in _decode_image_stub(p, deterministic_fake)]
                    for p in payloads],
            })

    # project only the needed columns BEFORE the python stage so parquet
    # column pruning skips unrelated data
    slim = df.select("media_id", "kind", "payload")
    return slim.mapInPandas(process, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_ms", T.IntegerType(), True),
    T.StructField("frame", T.BinaryType(), True),
])


def resize_images(df: DataFrame, max_px: int = 512,
                  deterministic_fake: bool = True) -> DataFrame:
    """Image rows → capped-dimension payloads (P7 resize analog).

    Real path: decode → Lanczos downscale → re-encode (stubbed, no codec in
    this container).  The deterministic fake scales the recorded dims and
    truncates the payload proportionally, so schema, batch shape, and the
    byte-budget behavior are exercised end-to-end.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            raise NotImplementedError("image codecs not present")
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]):
                w = meta["width"] or max_px
                h = meta["height"] or max_px
                scale = min(1.0, max_px / max(w, h, 1))
                payload = bytes(payload or b"")
                keep = max(1, int(len(payload) * scale * scale))
                rows.append({"media_id": mid, "kind": kind,
                             "payload": payload[:keep],
                             "width": int(w * scale), "height": int(h * scale)})
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    slim = df.filter(F.col("kind") == "image") \
        .select("media_id", "kind", "payload", "meta")
    return slim.mapInPandas(process, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  deterministic_fake: bool = True) -> DataFrame:
    """Video/audio rows → one row per sampled frame (1→N mapInPandas shape).

    Real path: demux + keyframe decode at the sampling grid (stubbed).  The
    fake emits duration//every_ms frames, each a deterministic payload
    slice, exercising the explode-shaped batch contract downstream feature
    extraction depends on.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            raise NotImplementedError("av codecs not present")
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                    pdf["media_id"], pdf["payload"], pdf["meta"]):
                duration = meta["duration_ms"] or 0
                payload = bytes(payload or b"")
                n = max(1, duration // every_ms) if duration else 1
                step = max(1, len(payload) // n)
                for i in range(n):
                    rows.append({"media_id": mid, "frame_idx": i,
                                 "ts_ms": i * every_ms,
                                 "frame": payload[i * step:(i + 1) * step]})
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    slim = df.filter(F.col("kind").isin("video", "audio")) \
        .select("media_id", "payload", "meta")
    return slim.mapInPandas(process, schema=FRAME_SCHEMA)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches the binary column (pruned scan)."""
    return (df.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.avg(F.col("meta.width")).alias("avg_width"),
                 F.max(F.col("meta.duration_ms")).alias("max_duration_ms")))


def synthetic_media(spark, rows: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches (seeded payloads)."""
    def make(i: int):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(((i * 131 + j * 17) % 256) for j in range(256 + i % 512))
        return (i, kind, payload,
                {"mime": f"application/x-fake-{kind}",
                 "width": 640 if kind == "image" else None,
                 "height": 480 if kind == "image" else None,
                 "duration_ms": 1000 * (i % 30) if kind != "image" else None})
    return spark.createDataFrame([make(i) for i in range(rows)], schema=MEDIA_SCHEMA)
