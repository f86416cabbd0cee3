"""One-off study: Block-Max pruning on a QUANTIZED IMPACT index over the
Zipf transcript corpus — the learned-sparse serving case (DeepImpact /
uniCOIL-style) where block-max pruning is the modern standard.

Derives tf·(N/df) vectors from the staged transcript table, builds the
8-bit-quantized impact index through the jsonl2ciff-parity path, then
measures (a) the serving decode ratio on rare+mid+stopword query mixes and
(b) LocalSearcher (Block-Max WAND, Σ-impact) vs FreshSearcher (exhaustive)
p50 walls, asserting rank identity between the engines.

Round-4 recorded result (131k-turn corpus, quiet window, see
BENCH/BASELINE.md): decode ratio 0.26, serve p50 101-114 ms WAND vs
222-265 ms exhaustive across two runs, rank-identical. Kept out of the per-round bench.py
because the extra ~30 s impact build would dominate the headline wall;
run `python scripts/impact_prune_study.py` to reproduce (stages the
20000-conv corpus if absent).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from pyspark.sql import functions as F

from ciff_spark import get_spark
from ciff_spark.functions.tokenizer import tokenize_expr
from ciff_spark.serve import FreshSearcher, LocalSearcher
from ciff_spark.sources.jsonl_vectors import build_index_from_vector_rows

N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
ROOT = f"/tmp/ciff_imp_tx_{N_CONVS}"


def main() -> None:
    spark = get_spark("impact-prune-study", cores=32, shuffle_partitions=32)
    spark.range(10).count()
    from bench import stage_transcripts

    data = stage_transcripts(spark, N_CONVS)
    docs = spark.read.parquet(data)
    ids = docs.select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("ext_id"), "text"
    )
    ncol = ids.agg(F.count("*").cast("double").alias("_n"))
    tf = (
        ids.select("ext_id", F.explode(tokenize_expr("text")).alias("term"))
        .groupBy("ext_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
    rows = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(ncol))
        .select(
            "ext_id",
            F.col("ext_id").alias("pos"),
            "term",
            (F.col("tf").cast("double") * (F.col("_n") / F.col("df").cast("double"))).alias("score"),
        )
    )
    t0 = time.time()
    build_index_from_vector_rows(
        spark, rows, ROOT, quantize=True, n_shards=32, n_pgroups=64
    )
    build_sec = time.time() - t0
    spark.stop()

    from bench import zipf_query_mixes, zipf_term_bands

    n = LocalSearcher(ROOT).num_docs
    bands = zipf_term_bands(ROOT, n)
    if bands is None:
        raise SystemExit("corpus too small for the df bands — raise N_CONVS")
    qs, _sel = zipf_query_mixes(bands)
    st: dict = {}
    for q in qs:
        LocalSearcher(ROOT).search(q, k=10, scoring="impact", stats=st)
    for q in qs:  # rank identity between the pruned and exhaustive engines
        assert LocalSearcher(ROOT).search(q, k=10, scoring="impact") == \
            FreshSearcher(ROOT).search(q, k=10, scoring="impact", prune=False), q

    def p50(mk):
        walls = []
        for q in qs:
            s = mk()
            t = time.time()
            s(q)
            walls.append(time.time() - t)
        return sorted(walls)[len(walls) // 2] * 1000

    def _mk_wand():
        s = LocalSearcher(ROOT)
        return lambda q: s.search(q, k=10, scoring="impact")

    def _mk_exhaustive():
        s = FreshSearcher(ROOT)
        return lambda q: s.search(q, k=10, scoring="impact", prune=False)

    print(json.dumps({
        "impact_tx_build_sec": round(build_sec, 1),
        "impact_prune_decode_ratio": round(st["decoded_blocks"] / st["total_blocks"], 4),
        "impact_serve_wand_p50_ms": round(p50(_mk_wand), 1),
        "impact_serve_exhaustive_p50_ms": round(p50(_mk_exhaustive), 1),
        "turns": n,
    }))


if __name__ == "__main__":
    main()
