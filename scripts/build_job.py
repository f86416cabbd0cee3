"""spark-submit entry point for the index build.

Cluster usage (the north-rule invocation shape):

    cd /root/repo && zip -r /tmp/ciff_spark.zip ciff_spark
    spark-submit --py-files /tmp/ciff_spark.zip scripts/build_job.py \
        --input /path/to/transcripts_parquet --output /path/to/index \
        [--docid-col doc_id] [--n-shards 64] [--n-pgroups 256] [--batches 8]

On a real cluster the same command runs unchanged with ``--master yarn`` /
``--master k8s://...``; every knob that matters at N-executor scale
(shards, pgroups, checkpoint batches) is a flag.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of the corpus table")
    ap.add_argument("--output", required=True, help="index root directory")
    ap.add_argument("--id-cols", default="conv_id,turn_idx")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--docid-col", default=None, help="pre-existing dense docid column")
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--n-pgroups", type=int, default=32)
    ap.add_argument("--batches", type=int, default=1, help="checkpoint batches")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ciff-spark-build").getOrCreate()
    from ciff_spark.build import BuildConfig, build_index

    df = spark.read.parquet(args.input)
    t0 = time.time()
    store = build_index(
        df,
        args.output,
        id_cols=tuple(args.id_cols.split(",")),
        text_col=args.text_col,
        docid_col=args.docid_col,
        config=BuildConfig(
            n_shards=args.n_shards, n_pgroups=args.n_pgroups,
            pgroup_batches=args.batches,
        ),
        resume=not args.no_resume,
        description=f"ciff_spark index of {args.input}",
    )
    meta = store.meta(spark)
    wall = time.time() - t0
    print(json.dumps({**meta, "build_sec": round(wall, 2),
                      "turns_per_sec": round(meta["num_docs"] / wall, 1)}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
