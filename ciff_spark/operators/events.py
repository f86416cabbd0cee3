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


# ONE pinned copy of the session-derivation CTEs — both the batch and the
# streamed oracle interpolate it, so the gap predicate / tie-break order can
# never drift between the two entries (the repo's shared-fragment rule)
_SESS_CTES_SQL = f"""
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
"""

EV_SESSIONIZE_SQL = f"""
{_SESS_CTES_SQL}
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


def ev_sessionize_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sessionization, driver-checkable: feed the events table
    through the stateful ``applyInPandasWithState`` sessionizer
    (``streaming/sessionize.py``) as a file stream — one ``availableNow``
    run over the real events plus a far-future sentinel, then a second run
    whose later sentinel advances the watermark past every real session's
    close point (timeouts fire against the previous run's watermark, hence
    two runs; state crosses the runs via the checkpoint, so this also
    exercises restart recovery). The emitted closed sessions must equal the
    batch window-function answer — the oracle is ``ev_sessionize``'s SQL
    minus the session numbering (a stream has no global per-user index)."""
    import os
    import shutil
    import tempfile

    import pandas as pd

    from ciff_spark.streaming.sessionize import streaming_sessionize

    work = tempfile.mkdtemp(prefix="ciff_evstream_")
    inp, out, cp = f"{work}/in", f"{work}/out", f"{work}/cp"
    os.makedirs(inp)
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{inp}/events.parquet")
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        mx = ev["ts"].max()
        schema = (
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        sentinel_uid = 10**12
        for i in range(2):
            s = pd.DataFrame(
                {
                    "event_id": [10**9 + i],
                    "ts": [mx + pd.Timedelta(days=30 * (i + 1))],
                    "user_id": [sentinel_uid + i],
                    "event_type": ["x"],
                    "value": [0.0],
                    "props": [""],
                }
            )
            s["ts"] = s["ts"].astype("datetime64[us]")
            s.to_parquet(f"{inp}/z_sentinel{i}.parquet")
            q = (
                streaming_sessionize(spark, inp, schema)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", cp)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            # fail loud on timeout: proceeding would start a second query on
            # the SAME checkpoint while this one is active, or compare a
            # partially-emitted session set against the oracle
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError(
                    f"streaming sessionize run {i} exceeded 600s on {sf_dir}"
                )
        # pure column expressions over the emitted parquet — no driver hop
        # (the pre-r6 version pulled every closed session through
        # .toPandas(), reformatted in pandas, and createDataFrame'd back).
        # timestamp_seconds keeps fractional seconds; date_format truncates
        # to whole seconds exactly like the pandas strftime it replaces
        # (session timezone is pinned UTC). localCheckpoint materializes the
        # result BEFORE the temp workdir is removed in the finally block.
        return (
            spark.read.schema(
                "user_id long, start_s double, end_s double, n_events long, "
                "sum_value_micros long"
            )
            .parquet(out)
            .where(F.col("user_id") < sentinel_uid)
            .select(
                F.col("user_id").cast("long").alias("user_id"),
                F.date_format(
                    F.timestamp_seconds(F.col("start_s")), "yyyy-MM-dd HH:mm:ss"
                ).alias("start_ts"),
                F.date_format(
                    F.timestamp_seconds(F.col("end_s")), "yyyy-MM-dd HH:mm:ss"
                ).alias("end_ts"),
                F.col("n_events").cast("long").alias("n_events"),
                F.col("sum_value_micros").cast("long").alias("sum_value_micros"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the batch oracle minus session numbering: a stream emits closed sessions,
# not a per-user index (rows stay distinct — sessions of one user differ in
# start_ts)
EV_SESSIONIZE_STREAMED_SQL = f"""
{_SESS_CTES_SQL}
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
       count(*)::BIGINT AS n_events,
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
    "ev_sessionize_streamed": (ev_sessionize_streamed, EV_SESSIONIZE_STREAMED_SQL),
    "ev_tumbling_hour": (ev_tumbling_hour, EV_TUMBLING_SQL),
}
