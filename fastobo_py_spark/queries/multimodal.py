"""Multimodal queries: Arrow-kernel feature extraction plumbing and the
real PNG decode path (vendored pure-stdlib codec)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastobo_py_spark.queries._registry import (
    GENERATED_ORACLES as _GENERATED_ORACLES,
    QUERIES,
)
from fastobo_py_spark.queries._shared import _values_sql


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked on the codec-FREE part of the
    contract (payload_sha / n_bytes / frame sampling): the Arrow kernel,
    schema, and batching are the real production path — only the decode
    body is environment-stubbed (strict by default; Pillow used when
    importable). Per-kind census over the deterministic media table."""
    from fastobo_py_spark.operators.multimodal import extract_features, sample_frames, synth_media

    media = synth_media(spark, n=64)
    feats = extract_features(media, with_features=False)
    agg = feats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.countDistinct("payload_sha").alias("n_distinct_payloads"),
    )
    frames = (
        sample_frames(media)
        .groupBy(F.lit("video").alias("kind"))
        .agg(F.count("*").alias("n_frames"))
    )
    return (
        agg.join(frames, "kind", "left")
        .select("kind", "n_media", "total_bytes", "n_distinct_payloads",
                F.coalesce("n_frames", F.lit(0)).alias("n_frames"))
        .orderBy("kind")
    )


def sql_multimodal_features() -> str:
    import hashlib as _hl
    from collections import defaultdict

    # independent re-derivation of synth_media(n=64, seed=42) + the
    # sample_frames sequence semantics (0 .. duration_ms-1 step 5000)
    kinds = ["image", "audio", "video"]
    per = defaultdict(lambda: [0, 0, set()])
    n_frames = 0
    for i in range(64):
        kind = kinds[i % 3]
        payload = _hl.sha256(f"42|{i}".encode()).digest() * (4 + i % 5)
        st = per[kind]
        st[0] += 1
        st[1] += len(payload)
        st[2].add(_hl.sha256(payload).hexdigest())
        if kind == "video":
            duration_ms = 1000 * (1 + i % 30)
            n_frames += (duration_ms - 1) // 5000 + 1
    rows = [
        (k, st[0], st[1], len(st[2]), n_frames if k == "video" else 0)
        for k, st in sorted(per.items())
    ]
    return _values_sql(rows, ["kind", "n_media", "total_bytes", "n_distinct_payloads", "n_frames"])


QUERIES.update({"multimodal_features": q_multimodal_features})
_GENERATED_ORACLES.update({"multimodal_features": sql_multimodal_features})
_PNG_DIM = 8


def q_multimodal_real_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode end-to-end, no Pillow required: valid PNGs (all
    four color types, every scanline filter cycled by the encoder) flow
    through the strict-mode Arrow kernel — features exist only if the
    vendored decoder recovered the exact pixel plane (codec="png" pins
    it even where Pillow exists — PIL resamples bicubic, a different
    feature vector by design). Integer column sums
    are read back out of the float32 feature vector (sum ≤ 2040 « 2^24,
    so round() is exact) and checked against an oracle that re-derives
    luma/resize/sums straight from the pixel pattern, never touching the
    decoder."""
    from fastobo_py_spark.operators.multimodal import extract_features, synth_png_media

    media = synth_png_media(spark, n=12)
    feats = extract_features(media, dim=_PNG_DIM, codec="png")  # strict + pinned vendored codec
    scale = F.lit(float(_PNG_DIM * 255))
    colsum = lambda k: F.round(F.element_at("features", k).cast("double") * scale).cast("bigint")
    return (
        feats.select(
            "media_id",
            "payload_sha",
            F.col("n_bytes").cast("bigint").alias("n_bytes"),
            colsum(1).alias("col_first_sum"),
            colsum(_PNG_DIM // 2).alias("col_mid_sum"),
            colsum(_PNG_DIM).alias("col_last_sum"),
            F.round(
                F.expr("aggregate(features, 0D, (acc, x) -> acc + x)") * scale
            ).cast("bigint").alias("total_sum"),
        )
        .orderBy("media_id")
    )


def sql_multimodal_real_decode() -> str:
    import hashlib as _hl

    from fastobo_py_spark.operators.multimodal import _synth_png_pixels
    from fastobo_py_spark.operators.png_codec import encode_png

    rows = []
    for i in range(12):
        w, h, ch, pix = _synth_png_pixels(i)
        payload = encode_png(w, h, ch, pix)
        # independent luma / nearest-resize / column-sum re-derivation
        # (shares only the INPUT pattern and the encoder with the engine;
        # the decode+unfilter under test is not reused here)
        if ch == 1:
            gray = list(pix)
        elif ch == 2:
            gray = list(pix[0::2])
        else:
            gray = [
                (299 * pix[j] + 587 * pix[j + 1] + 114 * pix[j + 2]) // 1000
                for j in range(0, len(pix), ch)
            ]
        grid = [
            [gray[((ty * h) // _PNG_DIM) * w + ((tx * w) // _PNG_DIM)] for tx in range(_PNG_DIM)]
            for ty in range(_PNG_DIM)
        ]
        sums = [sum(grid[ty][tx] for ty in range(_PNG_DIM)) for tx in range(_PNG_DIM)]
        rows.append(
            (
                i,
                _hl.sha256(payload).hexdigest(),
                len(payload),
                sums[0],
                sums[_PNG_DIM // 2 - 1],
                sums[_PNG_DIM - 1],
                sum(sums),
            )
        )
    return _values_sql(
        rows,
        ["media_id", "payload_sha", "n_bytes", "col_first_sum", "col_mid_sum", "col_last_sum", "total_sum"],
    )


QUERIES.update({"multimodal_real_decode": q_multimodal_real_decode})
_GENERATED_ORACLES.update({"multimodal_real_decode": sql_multimodal_real_decode})
