"""Event-stream operators over ``events``: sessionization (gap-based) and
tumbling-window aggregation. Batch implementations here (window functions /
date_trunc); the streaming module reuses the same semantics with
Structured Streaming primitives."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ciff_spark.sources.testdata import load

SESSION_GAP_S = 1800  # 30 min

# Cross-engine-deterministic value sums: round-1 showed `round(sum(value), 6)`
# hash-flipping between Spark and DuckDB (f64 accumulation-order noise landing
# ON a rounding boundary). Fix: convert each value to integer micro-units
# PER ROW (both engines round the identical double identically — the input
# has ≤2 decimals, so the nearest-integer choice is never a tie) and sum
# exact int64s — associative, order-free, bit-identical everywhere.
MICROS = 1_000_000


def _micros_col(col: str):
    return F.round(F.col(col) * MICROS).cast("long")


def _micros_sql(expr: str) -> str:
    return f"CAST(round({expr} * {MICROS}) AS BIGINT)"


def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                # fractional-second epoch (cast to double) — unix_timestamp()
                # truncates to whole seconds while the DuckDB oracle's epoch()
                # keeps fractions, which flips sessions whose gap lands within
                # 1s of the threshold
                | (
                    F.col("ts").cast("timestamp").cast("double")
                    - F.col("prev_ts").cast("timestamp").cast("double")
                    > SESSION_GAP_S
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_idx", F.sum("new_sess").over(w))
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        F.sum(_micros_col("value")).alias("sum_value_micros"),
    )


EV_SESSIONIZE_SQL = f"""
WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_idx
  FROM s
)
-- CAST(session_idx): DuckDB types a windowed integer sum() as HUGEINT, which
-- .df() materializes to pandas float64 (1.0 vs Spark's int64 1) — rows/schema
-- still match but the driver's value hash flips. Red in rounds 1-2.
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*)::BIGINT AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
       CAST(sum({_micros_sql('value')}) AS BIGINT) AS sum_value_micros
FROM sess GROUP BY user_id, session_idx
"""


def ev_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(_micros_col("value")).alias("sum_value_micros"),
    ).withColumn(
        # avg derived from the exact integer sum: identical doubles on both
        # engines, so the final rounding can't flip
        "avg_value",
        F.round(F.col("sum_value_micros") / F.lit(float(MICROS)) / F.col("n"), 6),
    )


EV_TUMBLING_SQL = f"""
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(*)::BIGINT AS n,
       CAST(sum({_micros_sql('value')}) AS BIGINT) AS sum_value_micros,
       round(CAST(sum({_micros_sql('value')}) AS BIGINT) / {float(MICROS)!r} / count(*), 6) AS avg_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


QUERIES: dict[str, tuple] = {
    "ev_sessionize": (ev_sessionize, EV_SESSIONIZE_SQL),
    "ev_tumbling_hour": (ev_tumbling_hour, EV_TUMBLING_SQL),
}
