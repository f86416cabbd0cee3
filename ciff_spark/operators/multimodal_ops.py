"""Driver-facing multimodal entries (rows-only checks: the media pipeline is
not ANSI-SQL-expressible — feature extraction runs a stubbed decoder inside
Arrow batches — so these deliberately omit oracle_sql and the driver records
the weaker row-count/schema check; determinism is still guaranteed by the
seeded synthetic media table and is pytest-asserted)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ciff_spark.multimodal import extract_features, frame_sample, media_stats, synth_media_df

N_MEDIA = 120


def mm_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_stats(synth_media_df(spark, N_MEDIA, seed=42)).orderBy("kind")


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(synth_media_df(spark, N_MEDIA, seed=42))
    # surface a deterministic scalar per row so the rows-only check still
    # pins content shape (norms ≈ 1, first component)
    return feats.select(
        "media_id",
        "kind",
        F.size("feature").alias("dim"),
        F.round(F.element_at("feature", 1), 6).alias("f0"),
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(synth_media_df(spark, N_MEDIA, seed=42), every_ms=10_000)


QUERIES: dict[str, tuple] = {
    "mm_media_stats": (mm_media_stats, None),
    "mm_feature_extract": (mm_feature_extract, None),
    "mm_frame_sample": (mm_frame_sample, None),
}
