"""Streaming gap-sessionization — the stateful Structured Streaming twin of
``operators.events.ev_sessionize`` (same 30-min-gap semantics), built on
``applyInPandasWithState`` with event-time timeouts.

Per user, the state holds the OPEN sessions as pre-aggregated interval atoms
``(start_s, end_s, n_events, sum_value_micros)``. Each micro-batch merges the
user's new events into those atoms with the same sweep the batch operator's
window expresses: sort atoms by start, merge neighbors whose gap is ≤ GAP
(strictly-greater gap splits — ``ev_sessionize``'s ``> SESSION_GAP_S``). The
sweep over pre-aggregated atoms equals a full re-sweep over raw events for
any arrival order the watermark admits: a late event that lands inside or
between open sessions merges (and can bridge) them exactly as it would have
in batch order, and sessions are only CLOSED — emitted and dropped from
state — once ``watermark > end + gap``, after which no admissible event can
extend them. Users receiving no new rows close via event-time timeout
(``GroupStateTimeout.EventTimeTimeout`` at ``min(end) + gap``), so emission
does not depend on more data arriving for that key.

This is exactly-once at the operator level (state lives in the checkpoint;
reprocessed batches rebuild the same state), and restart-safe: a new query
over the same checkpoint resumes the open sessions — the test drives two
separate ``availableNow`` runs through one checkpoint and closes round-one
sessions with a later run's watermark.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ciff_spark.operators.events import MICROS, SESSION_GAP_S

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

OUT_SCHEMA = (
    "user_id long, start_s double, end_s double, n_events long, "
    "sum_value_micros long"
)
STATE_SCHEMA = (
    "starts array<double>, ends array<double>, ns array<long>, "
    "sums array<long>"
)


def _merge_atoms(atoms: list[list[float]], gap_s: float) -> list[list[float]]:
    """Sweep-merge (start, end, n, sum) atoms sorted by start; gap ≤ gap_s
    joins, strictly greater splits (the batch operator's ``>`` predicate)."""
    atoms.sort(key=lambda a: (a[0], a[1]))
    out: list[list[float]] = []
    for a in atoms:
        if out and a[0] - out[-1][1] <= gap_s:
            last = out[-1]
            last[1] = max(last[1], a[1])
            last[2] += a[2]
            last[3] += a[3]
        else:
            out.append(list(a))
    return out


def _session_func_factory(gap_s: float):
    def func(key, pdf_iter, state: "GroupState"):
        (user_id,) = key
        atoms: list[list[float]] = []
        if state.exists:
            starts, ends, ns, sums = state.get
            atoms = [list(t) for t in zip(starts, ends, ns, sums)]
        for pdf in pdf_iter:
            if len(pdf):
                atoms.extend(
                    [float(t), float(t), 1, int(m)]
                    for t, m in zip(pdf["ts_s"], pdf["micros"])
                )
        atoms = _merge_atoms(atoms, gap_s)

        wm_s = state.getCurrentWatermarkMs() / 1000.0
        closed = [a for a in atoms if a[1] + gap_s < wm_s]
        kept = [a for a in atoms if a[1] + gap_s >= wm_s]

        if kept:
            state.update((
                [a[0] for a in kept], [a[1] for a in kept],
                [int(a[2]) for a in kept], [int(a[3]) for a in kept],
            ))
            # fire when the earliest open session becomes closable even if no
            # further rows arrive for this user; must be > current watermark
            fire_ms = int(max(
                (min(a[1] for a in kept) + gap_s) * 1000 + 1,
                state.getCurrentWatermarkMs() + 1,
            ))
            state.setTimeoutTimestamp(fire_ms)
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(closed),
                    "start_s": [a[0] for a in closed],
                    "end_s": [a[1] for a in closed],
                    "n_events": [int(a[2]) for a in closed],
                    "sum_value_micros": [int(a[3]) for a in closed],
                }
            )

    return func


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    gap_s: float = float(SESSION_GAP_S),
    watermark: str = "10 minutes",
    reader_options: dict | None = None,
) -> DataFrame:
    """File-source event stream → closed sessions, append-mode.

    ``schema`` is the event DDL (needs ``user_id``, ``ts``, ``value``).
    Returns the unstarted streaming DataFrame; callers attach a sink
    (``writeStream`` parquet/foreachBatch) and a checkpoint.
    ``reader_options`` pass through to the file source (e.g.
    ``maxFilesPerTrigger`` to pin micro-batch granularity).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    ev = reader.parquet(input_dir)
    # parquet may carry TIMESTAMP_NTZ; watermarks need session-TZ TIMESTAMP
    ev = ev.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("ts").cast("timestamp").cast("double").alias("ts_s"),
        F.round(F.col("value") * MICROS).cast("long").alias("micros"),
    ).withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_func_factory(gap_s),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
