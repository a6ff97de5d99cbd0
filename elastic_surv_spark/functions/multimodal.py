"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface (SURVEY §2.12). The container has no image/audio codecs,
so the DECODE step is stubbed (``decode_stub_enabled`` gate raises
``NotImplementedError``; the deterministic fake path derives features from
the bytes themselves) — but everything Spark-side is real and tested: the
schema convention, batch iteration shape, Arrow transfer, partition sizing.

Schema convention:
    content   binary          — the raw media bytes
    media     struct<kind string, width int, height int, sample_rate int,
                     duration_ms int, codec string>

Scale notes: media rows are large and skewed — the operators below
``repartition`` by byte-size budget (rows-per-partition derived from the
average payload) before the Pandas-UDF pass so a partition's Arrow batch
stays within executor memory; feature outputs are small and re-coalesce
naturally at the next shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

DECODE_LIBS_AVAILABLE = False  # no PIL/av/librosa in this container


def synthetic_media_pandas(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media rows (bytes + metadata) as a pandas frame —
    shared by the in-session table builder and the committed parquet fixture
    writer (scripts/make_media_fixture.py)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8)
        rows.append(
            {
                "media_id": i,
                "content": bytes(payload.tobytes()),
                "media": {
                    "kind": kind,
                    "width": int(rng.integers(16, 512)) if kind != "audio" else 0,
                    "height": int(rng.integers(16, 512)) if kind != "audio" else 0,
                    "sample_rate": 16000 if kind != "image" else 0,
                    "duration_ms": int(rng.integers(100, 60000)) if kind != "image" else 0,
                    "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
                },
            }
        )
    return pd.DataFrame(rows)


def synthetic_media_table(
    spark: SparkSession, n: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic fake media rows (bytes + metadata) for plumbing tests."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("media", MEDIA_STRUCT),
        ]
    )
    return spark.createDataFrame(synthetic_media_pandas(n, seed), schema=schema)


def size_aware_repartition(
    df: DataFrame, content_col: str = "content", target_bytes: int = 64 << 20
) -> DataFrame:
    """Repartition so each partition's payload ≈ target_bytes (Arrow batch
    memory guard for wide binary rows)."""
    stats = df.select(
        F.count("*").alias("n"), F.avg(F.length(content_col)).alias("avg_sz")
    ).first()
    if not stats["n"]:
        return df
    rows_per_part = max(1, int(target_bytes / max(float(stats["avg_sz"] or 1), 1.0)))
    n_parts = max(1, int(np.ceil(stats["n"] / rows_per_part)))
    return df.repartition(n_parts)


def decode_media(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Real decode path — requires codec libraries; explicitly stubbed."""
    if not DECODE_LIBS_AVAILABLE:
        raise NotImplementedError(
            "media decoding requires PIL/av/librosa which are not in this "
            "container; use extract_features(fake_decode=True) for the "
            "deterministic plumbing path"
        )
    return df  # pragma: no cover


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    media_col: str = "media",
    n_features: int = 8,
    fake_decode: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Per-media feature vectors via an Arrow-batched mapInPandas pass.

    With ``fake_decode`` the "decoder" derives a deterministic feature
    vector from the payload bytes (moment statistics of byte histograms) —
    a stand-in with the exact batch shape, schema, and memory profile the
    real decoder would have. ``normalize=False`` keeps raw bin counts
    (exact integers — what the duckdb oracle recomputes from exploded
    bytes).
    """
    if not fake_decode:
        decode_media(df, content_col)  # raises: real decode unavailable

    id_cols = [c for c in df.columns if c not in (content_col, media_col)]
    kind_col = f"{media_col}.kind"

    def featurize(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            feats = []
            for payload in pdf[content_col]:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(float)
                hist = np.histogram(arr, bins=n_features, range=(0, 256))[0]
                if normalize:
                    total = hist.sum() or 1
                    feats.append((hist / total).tolist())
                else:
                    feats.append(hist.astype(float).tolist())
            out = pdf[id_cols + ["_kind"]].copy()
            out["features"] = feats
            out["n_bytes"] = [len(p) for p in pdf[content_col]]
            yield out

    prepared = size_aware_repartition(df, content_col).withColumn(
        "_kind", F.col(kind_col)
    )
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in id_cols
    )
    out = prepared.select(*id_cols, "_kind", content_col).mapInPandas(
        featurize,
        schema=f"{id_schema}, _kind string, features array<double>, n_bytes long",
    )
    return out.withColumnRenamed("_kind", "kind")


def frame_sample_plan(
    df: DataFrame, media_col: str = "media", every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: explode per-media sample timestamps
    (JVM-side sequence; the decode of each frame is the stubbed step)."""
    dur = F.col(f"{media_col}.duration_ms")
    return (
        df.filter(F.col(f"{media_col}.kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), dur - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def audio_window_plan(
    df: DataFrame,
    media_col: str = "media",
    window_ms: int = 500,
    hop_ms: int = 250,
) -> DataFrame:
    """Audio STFT-style windowing plumbing: per-clip overlapping analysis
    windows (start_ms, n_samples-at-sample_rate) — the partitioning a real
    feature extractor (mel spectrogram etc.) consumes; the DSP itself is
    the stubbed codec step. JVM sequence + explode, map-only."""
    dur = F.col(f"{media_col}.duration_ms")
    rate = F.col(f"{media_col}.sample_rate")
    return (
        df.filter(F.col(f"{media_col}.kind") == "audio")
        .select(
            "media_id",
            rate.alias("sample_rate"),
            F.explode(
                F.sequence(F.lit(0), F.greatest(dur - window_ms, F.lit(0)), F.lit(hop_ms))
            ).alias("window_start_ms"),
        )
        .select(
            "media_id",
            "sample_rate",
            "window_start_ms",
            (F.col("sample_rate") * window_ms / 1000).cast("int").alias("n_samples"),
        )
    )
