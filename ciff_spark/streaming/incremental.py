"""Incremental index maintenance with Structured Streaming.

New transcript turns arrive as files in a directory (stand-in for a Kafka /
Iceberg CDC feed). ``foreachBatch`` assigns each micro-batch a contiguous
docid range continuing from the current index size (preserving the dense
0..N-1 DocRecord contract across batches — /root/reference/src/lib.rs:545-547),
block-encodes the batch's postings as a SEGMENT, and appends to segment
tables. Because batch docid ranges are disjoint and increasing, a per-term
merge across segments is — like the shard merge — pure concatenation in
segment order; ``compact_segments`` folds segments into the base tables.

Readers that want fresh results use ``ciff_spark.serve.FreshSearcher``, which
recomputes collection statistics over base ∪ segments and scores both
exhaustively (segment rows carry ``shard = 0`` relative to their own docid
range, so they are NOT unionable into the shard-cogrouped distributed reader
— the serving path handles them natively). Rank-identity with a cold batch
build / the oracle over the same rows is asserted in tests (the metamorphic
"incremental ≡ batch" and "fresh ≡ rebuild" properties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ciff_spark.build import POSTINGS_SCHEMA, BuildConfig, build_index
from ciff_spark.functions.codec import encode_many
from ciff_spark.functions.tokenizer import tokenize_expr
from ciff_spark.store import IndexStore

SEG_POSTINGS = "seg_postings"
SEG_DOCS = "seg_docs"

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _current_num_docs(spark: SparkSession, store: IndexStore) -> int:
    import os

    n = 0
    if store.exists("docs"):
        n += store.read(spark, "docs").count()
    if os.path.isdir(store.path(SEG_DOCS)):
        n += store.read(spark, SEG_DOCS).count()
    return n


def append_batch(
    spark: SparkSession,
    store: IndexStore,
    batch_df: DataFrame,
    batch_id: int,
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    block_size: int = 128,
) -> None:
    """Index one micro-batch as a segment (called from foreachBatch)."""
    base = _current_num_docs(spark, store)
    avgdl = float(store.meta(spark)["avgdl"]) if store.exists("meta") else 0.0

    pdf = batch_df.select(*id_cols, text_col).toPandas()
    if pdf.empty:
        return
    pdf = pdf.sort_values(list(id_cols), kind="mergesort").reset_index(drop=True)
    pdf["docid"] = np.arange(base, base + len(pdf), dtype=np.int64)
    sdf = spark.createDataFrame(pdf)

    toks = sdf.select("docid", tokenize_expr(text_col).alias("tokens"))
    docs = toks.select(
        "docid", F.coalesce(F.size("tokens"), F.lit(0)).alias("doclength")
    ).withColumn("segment", F.lit(int(batch_id)))
    docs_pdf = docs.toPandas()

    tf = (
        toks.select("docid", F.explode("tokens").alias("term"))
        .groupBy("term", "docid")
        .agg(F.count("*").alias("tf"))
        .sort("term", "docid")
        .toPandas()
    )
    # segments always carry dl-FREE bounds: the collection avgdl keeps moving
    # as batches arrive, and a bound computed against a stale (lower) avgdl
    # could undershoot the true tfnorm — dl-free stays a true upper bound
    # under any future avgdl; compaction re-encodes with exact bounds
    rows = encode_many(
        tf["term"].to_numpy(),
        np.zeros(len(tf), np.int64),
        tf["docid"].to_numpy(),
        tf["tf"].to_numpy(),
        None,
        avgdl or 1.0,
        block_size,
    )
    seg = pd.DataFrame(rows, columns=["term", "shard", "df", "cf", "blocks"])
    seg["segment"] = int(batch_id)
    spark.createDataFrame(seg, POSTINGS_SCHEMA + ", segment int").write.mode(
        "append"
    ).parquet(store.path(SEG_POSTINGS))
    docs.write.mode("append").parquet(store.path(SEG_DOCS))


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source stream → foreachBatch segment indexing. ``availableNow``
    drains what's there and stops (test mode); without it the query runs
    continuously with exactly-once foreachBatch semantics."""
    store = IndexStore(index_root)
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL).parquet(input_dir)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(spark, store, batch_df, batch_id)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_segments(
    spark: SparkSession, index_root: str, rebuild_from: DataFrame | None = None,
    config: BuildConfig | None = None,
) -> IndexStore:
    """Fold segments into the base index. The streaming path accumulates
    per-segment posting runs with (by construction) disjoint increasing docid
    ranges; compaction here rebuilds base tables from the full corpus —
    equivalently, a pure concat merge — and drops the segments."""
    import shutil

    store = IndexStore(index_root)
    if rebuild_from is not None:
        store.drop()
        build_index(rebuild_from, index_root, config=config, resume=False)
    for t in (SEG_POSTINGS, SEG_DOCS):
        shutil.rmtree(store.path(t), ignore_errors=True)
    return store


def streaming_windowed_events(
    spark: SparkSession, input_dir: str, schema: str,
    gap: str = "5 minutes", watermark: str = "10 minutes",
):
    """Watermarked tumbling-window aggregation over an event stream — the
    streaming twin of operators.events.ev_tumbling_hour."""
    ev = spark.readStream.schema(schema).parquet(input_dir)
    # parquet may carry TIMESTAMP_NTZ; watermarks need session-TZ TIMESTAMP
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", gap), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
