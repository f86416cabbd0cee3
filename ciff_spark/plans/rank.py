"""Scalable dense docid assignment (SURVEY §4.2(4)).

The reference requires DocRecords in dense 0..N-1 docid order and hard-fails
otherwise (/root/reference/src/lib.rs:545-547). Its jsonl path assigns ids
first-seen from a single in-memory HashMap (/root/reference/src/lib.rs:1014-1022)
— the exact scalability wall this module removes.

The naive Spark translation, ``row_number().over(Window.orderBy(...))`` with no
partition key, funnels every row through ONE task. Instead we do the classic
two-phase rank:

  1. range-partition + sort within partitions on the ordering key
     (``repartitionByRange`` keeps ranges ordered across partition indexes);
  2. one tiny job counts rows per partition; an exclusive prefix sum on the
     driver (numPartitions entries, not rows) gives each partition's offset;
  3. a narrow ``mapInPandas`` adds ``offset + local_index``.

The sorted DataFrame is persisted between the two jobs so both see identical
partition contents (range boundaries come from sampling; two independent
executions could otherwise draw different boundaries). At cluster scale the
same pattern works with ``StorageLevel.DISK_ONLY`` or a staging table write —
one materialization, which a global sort shuffle pays anyway.
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def add_dense_docid(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
    docid_col: str = "docid",
    assume_sorted: bool = False,
) -> DataFrame:
    """Return ``df`` plus a dense 0..N-1 ``docid`` = rank of ``order_cols``.

    ``assume_sorted=True`` skips the range shuffle entirely: the caller
    asserts partitions are already key-ordered (partition i's keys all ≤
    partition i+1's, sorted within) — true for generators and for Iceberg
    tables with a matching sort order, where the shuffle would be pure waste.

    The result is persisted (MEMORY_AND_DISK); callers should ``unpersist()``
    it when downstream stages have materialized.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    if assume_sorted:
        sdf = df
    else:
        sdf = df.repartitionByRange(n, *[F.col(c) for c in order_cols]).sortWithinPartitions(
            *order_cols
        )
    sdf = sdf.persist(StorageLevel.MEMORY_AND_DISK)

    # job 1: per-partition counts (numPartitions rows to the driver, not data)
    counts = (
        sdf.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .count()
        .collect()
    )
    cmap = {int(r["_pid"]): int(r["count"]) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(cmap):
        offsets[pid] = acc
        acc += cmap[pid]
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        list(sdf.schema.fields) + [T.StructField(docid_col, T.LongType(), False)]
    )

    # job 2: narrow pass — no shuffle, ordering within partitions preserved
    def assign(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for pdf in iterator:
            pdf = pdf.copy()
            pdf[docid_col] = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return sdf.mapInPandas(assign, out_schema)
