"""F5: min-max 8-bit score quantization (SURVEY §2.G F5).

The reference's jsonl2ciff path quantizes learned-sparse scores into [1,255]
with a min-max scheme over positive scores, mapping score ≤ 0 to 0
(/root/reference/src/lib.rs:87-148; range discovery at src/lib.rs:922-957).
Pinned formula here (ours — used identically in Spark and the oracle SQL):

    q(v) = 0                                        if v ≤ 0
         = clamp(round((v - lo) / (hi - lo) * 254) + 1, 1, 255)   otherwise
    lo, hi = min/max over POSITIVE values; hi == lo → q = 1.

Demonstrated over ``events.value`` (the table with a continuous score-like
column). Two relational passes, like the reference's two-pass design: a
global positive min/max agg, then the vectorized map."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ciff_spark.sources.testdata import load


def f5_quantize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stats = ev.where(F.col("value") > 0).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return (
        ev.crossJoin(F.broadcast(stats))
        .select(
            "event_id",
            F.when(F.col("value") <= 0, F.lit(0))
            .when(F.col("hi") == F.col("lo"), F.lit(1))
            .otherwise(
                F.least(
                    F.lit(255),
                    F.greatest(
                        F.lit(1),
                        (F.round((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 254) + 1).cast("int"),
                    ),
                )
            )
            .cast("int")
            .alias("q"),
        )
    )


F5_QUANTIZE_SQL = """
WITH stats AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events WHERE value > 0
)
SELECT event_id,
       CAST(CASE WHEN value <= 0 THEN 0
                 WHEN hi = lo THEN 1
                 ELSE least(255, greatest(1, CAST(round((value - lo) / (hi - lo) * 254) AS INTEGER) + 1))
            END AS INTEGER) AS q
FROM events CROSS JOIN stats
"""

QUERIES: dict[str, tuple] = {
    "f5_quantize_scores": (f5_quantize_scores, F5_QUANTIZE_SQL),
}
