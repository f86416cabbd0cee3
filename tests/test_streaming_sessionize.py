"""Streaming gap-sessionization (applyInPandasWithState) ≡ batch semantics.

Drives THREE separate ``availableNow`` runs through ONE checkpoint:
run 1 processes the real events (two files — late rows in file 2 extend and
bridge file-1 sessions), runs 2-3 each add a far-future sentinel event whose
watermark advance fires the event-time timeouts that close the remaining
sessions (two runs because timeouts fire against the PREVIOUS batch's
watermark). The union of emitted sessions must equal a pandas re-derivation
of ``ev_sessionize``'s gap rule over the raw events — and runs 2-3 starting
fresh queries proves the session state survives restarts via the checkpoint.
"""

import os
import time

import numpy as np
import pandas as pd

from ciff_spark.streaming.sessionize import streaming_sessionize

GAP = 1800.0
# pandas parquet carries TIMESTAMP (µs, no tz) → declare NTZ; the operator
# casts to session-TZ TIMESTAMP for the watermark (UTC session, exact epochs)
SCHEMA = "event_id long, user_id long, ts timestamp_ntz, value double"


def _events_pdf(rows):
    return pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "user_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows], unit="s").astype(
                "datetime64[us]"
            ),
            "value": np.array([r[2] for r in rows], np.float64),
        }
    )


def _batch_sessions(pdf: pd.DataFrame) -> set:
    out = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        cur = None
        epoch_s = g["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        for ts, v in zip(epoch_s, g["value"]):
            m = int(round(v * 1_000_000))
            if cur is not None and ts - cur[1] <= GAP:
                cur[1] = float(ts)
                cur[2] += 1
                cur[3] += m
            else:
                if cur is not None:
                    out.append((int(uid), *cur))
                cur = [float(ts), float(ts), 1, m]
        if cur is not None:
            out.append((int(uid), *cur))
    return {(u, s, e, n, m) for u, (s, e, n, m) in ((r[0], r[1:]) for r in out)}


def _run_once(spark, input_dir, out_dir, cp_dir):
    q = (
        streaming_sessionize(
            spark, input_dir, SCHEMA, gap_s=GAP, watermark="10 minutes",
            reader_options={"maxFilesPerTrigger": "1"},
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    os.makedirs(input_dir)

    base = 1_700_000_000
    file1 = []
    for u in range(1, 6):
        # an early session, closed long before the stream's max event time so
        # it is emitted mid-stream (during run 1), not only by the sentinels
        file1 += [(u, base + u * 7 + d, 1.25 + u) for d in (0, 600, 1200)]
        # a later session still open at end of file 1
        file1 += [(u, base + 20_000 + u * 11 + d, 0.5) for d in (0, 900)]
    file2 = []
    for u in range(1, 6):
        # extends the open session (within gap of base+20900+..)
        file2 += [(u, base + 20_000 + u * 11 + 1800 + 900, 2.0)]
        # and a fresh session far past it
        file2 += [(u, base + 30_000 + u, 0.01)]

    pdf1, pdf2 = _events_pdf(file1), _events_pdf(file2)
    pdf1.to_parquet(f"{input_dir}/f1.parquet")
    time.sleep(1.1)  # file source orders batches by modification time
    pdf2.to_parquet(f"{input_dir}/f2.parquet")

    _run_once(spark, input_dir, out_dir, cp_dir)
    # mid-stream emission: file 2's batch (same run) saw file 1's watermark,
    # which closed the five early sessions — emitted before any sentinel
    mid = spark.read.schema(
        "user_id long, start_s double, end_s double, n_events long, "
        "sum_value_micros long"
    ).parquet(out_dir).count()
    assert mid >= 5

    sentinel_users = []
    for i, off in enumerate((200_000, 400_000)):
        u = 900 + i
        sentinel_users.append(u)
        time.sleep(1.1)
        _events_pdf([(u, base + off, 0.0)]).to_parquet(
            f"{input_dir}/sentinel{i}.parquet"
        )
        _run_once(spark, input_dir, out_dir, cp_dir)

    got_pdf = spark.read.parquet(out_dir).toPandas()
    got = {
        (int(r.user_id), float(r.start_s), float(r.end_s), int(r.n_events),
         int(r.sum_value_micros))
        for r in got_pdf.itertuples(index=False)
        if int(r.user_id) not in sentinel_users
    }
    want = _batch_sessions(pd.concat([pdf1, pdf2], ignore_index=True))
    assert got == want
    # no duplicates emitted across the three runs
    assert len(got_pdf) == len(
        got_pdf.drop_duplicates(["user_id", "start_s", "end_s"])
    )
    # mid-stream emission actually happened: run 1 closed the early sessions
    # (sanity that closure does not rely solely on the sentinels)
    early = {t for t in got if t[1] < base + 10_000}
    assert len(early) == 5
