"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels. The actual codecs are NOT in this
container — the decode step is a clearly-marked deterministic fake (or
``NotImplementedError`` in strict mode); everything Spark-side (schema,
batching, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

# STRICT by default: a production caller must either plug a real codec
# or EXPLICITLY opt into the deterministic fake (tests do) — a silent
# fake in the default path could masquerade as real features.
STRICT_DECODE = True


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}|{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                mimes[kind],
                bytearray(payload),
                64 + i % 512 if kind != "audio" else None,
                64 + (i * 3) % 512 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _pil_image_features(payload: bytes, dim: int) -> list[float]:
    """Real-codec path (used automatically when Pillow is importable and
    the payload decodes): grayscale → dim×dim resize → column means.
    Raises ImportError when Pillow is absent (this sandbox)."""
    import io

    from PIL import Image  # noqa: F401 — optional dependency

    import numpy as np

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, dim))
    a = np.asarray(img, dtype="float32") / 255.0
    return [float(x) for x in a.mean(axis=0)]


def _fake_decode_features(payload: bytes, dim: int = 16, strict: bool | None = None) -> list[float]:
    """STUB: stands in for image/audio decode + embedding.

    Deterministic: unpack sha256(payload) into floats. A real deployment
    replaces this body with PIL/torchvision/librosa calls — the Spark
    plumbing (Arrow batches in, fixed-dim float vectors out) is identical.
    """
    if STRICT_DECODE if strict is None else strict:
        raise NotImplementedError(
            "media codecs not available in this environment; pass strict=False "
            "to extract_features to use the deterministic fake embedding"
        )
    h = hashlib.sha256(payload).digest() + hashlib.sha256(payload + b"x").digest()
    vals = struct.unpack("<16H", h[:32])
    return [v / 65535.0 for v in vals[:dim]]


def _decode_features(payload: bytes, kind: str, dim: int, strict: bool | None) -> list[float]:
    """Codec dispatch: real Pillow decode for images when available and
    decodable; otherwise the strict/fake policy above. Keeps strict mode
    honest — with no codec installed, the default still raises."""
    if kind == "image":
        try:
            return _pil_image_features(payload, dim)
        except ImportError:
            pass  # Pillow absent (this sandbox) — fall through to policy
        except Exception:
            pass  # undecodable payload (synthetic bytes) — same fallthrough
    return _fake_decode_features(payload, dim, strict)


def extract_features(
    media: DataFrame, dim: int = 16, strict: bool | None = None, with_features: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch of payloads in,
    one batch of fixed-dim vectors out. Only (media_id, kind, payload)
    cross the JVM→Python boundary (column pruning does the rest).

    Images route through Pillow when it is importable (real codec path);
    otherwise strict by default: raises NotImplementedError unless
    ``strict=False`` opts into the deterministic fake embedding.

    ``with_features=False`` emits the codec-FREE columns only
    (payload_sha, n_bytes; features stays null) — the part of the
    contract that is oracle-checkable in a codec-less environment."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload_sha": pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": (
                    [
                        _decode_features(bytes(b), k, dim, strict)
                        for b, k in zip(pdf["payload"], pdf["kind"])
                    ]
                    if with_features
                    else None
                ),
            }
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (the decode itself is the stub above). Pure column ops —
    sequence+explode, no UDF."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
