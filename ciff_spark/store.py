"""IndexStore — the on-disk layout of a ciff_spark index.

The reference's index is one flat CIFF file (Header + PostingsLists +
DocRecords, /root/reference/proto/common-index-format-v1.proto:3-7). Ours is a
set of columnar tables under one root directory — Parquet in this sandbox,
Iceberg in production (same layout; only the writer/committer changes, see
``TableFormat``):

  docs/         docid:long, <id cols...>, doclength:int       ≙ DocRecords
  postings/     term, shard:int, df:long, cf:long,
                blocks:array<struct<count,max_docid,max_tf,
                max_tfnorm,docs_bin,tfs_bin>>                  ≙ PostingsLists,
                doc-sharded: shard = docid // shard_size, so the global
                per-term list is the concatenation of its shards in shard
                order (disjoint, ascending docid ranges — merge is concat)
  term_stats/   term, df:long, cf:long (collection-global, for idf)
  shard_sizes/  shard:int, start_docid:long, count:int, dl_bin:binary
                (u32 LE doclengths for the shard's dense docid range —
                the distributed analog of PISA's mmap'd .sizes file,
                /root/reference/src/lib.rs:520-549)
  meta/         single row ≙ CIFF Header (num_docs, num_terms, total_terms,
                avgdl, shard_size, block_size, description)
  _lineage/     stage, partition_id, rows, postings, bytes, wall_ms, status
                — per-partition build manifests for resume + metrics

Writes are stage-atomic: each table is written to a temp dir and renamed into
place (the Parquet stand-in for an Iceberg snapshot commit), so a killed build
never leaves a half-written stage and resume can trust directory presence.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

TABLES = ("docs", "postings", "term_stats", "shard_sizes", "meta", "_lineage")


def committed_segment_ids(root: str) -> list[int]:
    """Streaming-segment COMMIT PROTOCOL, single source of truth (used by
    the streaming writer, compaction, and the serving readers): a segment
    ``<id>`` is committed iff ``seg_docs/seg_<id>/_SUCCESS`` exists —
    ``append_batch`` writes seg_postings first and seg_docs LAST, so the
    docs marker is the commit point; anything else is a torn segment that
    readers must not see."""
    import glob

    out = []
    for d in glob.glob(f"{root.rstrip('/')}/seg_docs/seg_*"):
        if os.path.exists(f"{d}/_SUCCESS"):
            out.append(int(os.path.basename(d).removeprefix("seg_")))
    return sorted(out)

META_SCHEMA = (
    "num_docs bigint, num_terms bigint, total_terms bigint, avgdl double, "
    "shard_size bigint, block_size int, description string, "
    # bounds_avgdl: the MINIMUM avgdl any live block's max_tfnorm bound was
    # computed under. Segment compaction appends rows encoded under the NEW
    # avgdl while base blocks keep bounds from the OLD one; tfnorm grows with
    # avgdl, so WAND stays exact by inflating every bound by
    # max(1, avgdl / bounds_avgdl) at query time (sup of the per-doc ratio).
    # n_pgroups: the term-hash modulus of the postings layout — compaction
    # must route appended rows to the same pgroup dirs serving prunes on.
    # q_lo/q_hi: for quantized (impact) indexes, the min-max range the 8-bit
    # ScoreQuantizer was fitted on at base-build time (NULL otherwise).
    # Streaming appends MUST quantize new scores with this frozen range
    # (clamped) — re-fitting per batch would make stored impacts incomparable
    # across segments.
    # block_span/span_adaptive: the block-geometry policy the base was built
    # with — streaming appends and compaction re-encodes read these so a
    # refreshed index keeps its CONFIGURED geometry (NULL on pre-r5 metas →
    # the codec defaults).
    "bounds_avgdl double, n_pgroups int, q_lo double, q_hi double, "
    "block_span int, span_adaptive boolean"
)


class IndexStore:
    def __init__(self, root: str, fmt: str = "parquet") -> None:
        self.root = root.rstrip("/")
        if fmt != "parquet":  # Iceberg needs its runtime jar — not in this image
            raise NotImplementedError(
                "only parquet in the sandbox; production uses the same layout on Iceberg"
            )
        self.fmt = fmt

    def path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and os.path.exists(f"{p}/_SUCCESS")

    def write(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Atomic stage commit: write to a temp sibling, then rename."""
        final = self.path(table)
        tmp = f"{final}.__tmp_{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def read_or_empty(self, spark: SparkSession, table: str, schema: str) -> DataFrame:
        """Schema-explicit read that tolerates an empty/fileless table dir
        (a valid state for e.g. postings of a corpus whose every posting was
        filtered out)."""
        import glob

        if glob.glob(f"{self.path(table)}/**/*.parquet", recursive=True):
            return spark.read.schema(schema).parquet(self.path(table))
        return spark.createDataFrame([], schema)

    def drop(self) -> None:
        if os.path.isdir(self.root):
            shutil.rmtree(self.root)

    def meta(self, spark: SparkSession) -> dict:
        row = self.read(spark, "meta").first()
        return row.asDict()

    def meta_local(self) -> dict:
        """The single meta row via pyarrow — no Spark job (the Header analog
        is one row; reading it should never schedule cluster work)."""
        import pyarrow.parquet as papq

        return papq.read_table(self.path("meta")).to_pylist()[0]

    def write_meta_local(
        self, num_docs: int, num_terms: int, total_terms: int, avgdl: float,
        shard_size: int, block_size: int, description: str,
        bounds_avgdl: float | None = None, n_pgroups: int | None = None,
        q_lo: float | None = None, q_hi: float | None = None,
        block_span: int | None = None, span_adaptive: bool | None = None,
    ) -> None:
        """Write the single Header row driver-side (pyarrow, atomic rename,
        Spark-readable types per META_SCHEMA) — one row must not cost a job."""
        import pyarrow as pa
        import pyarrow.parquet as papq

        tbl = pa.table(
            {
                "num_docs": pa.array([int(num_docs)], pa.int64()),
                "num_terms": pa.array([int(num_terms)], pa.int64()),
                "total_terms": pa.array([int(total_terms)], pa.int64()),
                "avgdl": pa.array([float(avgdl)], pa.float64()),
                "shard_size": pa.array([int(shard_size)], pa.int64()),
                "block_size": pa.array([int(block_size)], pa.int32()),
                "description": pa.array([str(description)], pa.string()),
                "bounds_avgdl": pa.array(
                    [float(avgdl if bounds_avgdl is None else bounds_avgdl)],
                    pa.float64(),
                ),
                "n_pgroups": pa.array(
                    [None if n_pgroups is None else int(n_pgroups)], pa.int32()
                ),
                "q_lo": pa.array(
                    [None if q_lo is None else float(q_lo)], pa.float64()
                ),
                "q_hi": pa.array(
                    [None if q_hi is None else float(q_hi)], pa.float64()
                ),
                "block_span": pa.array(
                    [None if block_span is None else int(block_span)], pa.int32()
                ),
                "span_adaptive": pa.array(
                    [span_adaptive], pa.bool_()
                ),
            }
        )
        final = self.path("meta")
        tmp = f"{final}.__tmp_{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        papq.write_table(tbl, f"{tmp}/part-00000.parquet")
        open(f"{tmp}/_SUCCESS", "w").close()
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
