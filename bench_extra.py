"""Supplementary measurement harness (bench.py is FROZEN for the driver's
measurement — extra benchmarks live here, per the round-6 rules).

What it adds over bench.py:

- per-section 1-min loadavg samples (``load_before``/``load_after``) so every
  number carries its own window evidence (the r5 verdict's ask — this host's
  co-tenant steal swings single runs ±50%);
- noop-sink isolation (guide §1.4) for the operator families, timing the
  computation rather than ``count()``'s column-pruned plan;
- cold vs warm same-session pairs, separating first-use codegen compile
  (a per-session constant) from steady-state cost;
- an ANN recall probe: recall@10 of the compressed-domain IVFPQ searchers
  vs the exact cosine baseline at nprobe ∈ {1, 2}.

Prints ONE JSON object. Usage: ``python bench_extra.py`` (same
``$SPARK_GRAFT_SF_DIR`` / ``$SPARK_GRAFT_CPUS`` contract as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ciff_spark import get_spark
    from ciff_spark.operators import dedup, events, relational, simsearch, textquality

    spark = get_spark("ciff-bench-extra", cores=cores, shuffle_partitions=cores)
    spark.range(10).count()

    out: dict = {"metric": "noop-isolated operator walls (cold/warm pairs)",
                 "unit": "sec", "sections": {}, "sf": sf_dir, "cores": cores}

    ops = {
        "dedup_minhash_lsh": lambda: dedup.dedup_minhash_lsh_pairs(spark, sf_dir),
        "dedup_clusters": lambda: dedup.dedup_clusters(spark, sf_dir),
        "dedup_simhash": lambda: dedup.dedup_simhash(spark, sf_dir),
        "neardup_cosine_pairs": lambda: simsearch.neardup_cosine_pairs(spark, sf_dir),
        "ann_cosine_topk": lambda: simsearch.ann_cosine_topk(spark, sf_dir),
        "tq_quality": lambda: textquality.tq_quality(spark, sf_dir),
        "ev_sessionize": lambda: events.ev_sessionize(spark, sf_dir),
        "rel_pricing_summary": lambda: relational.rel_pricing_summary(spark, sf_dir),
    }
    for name, mk in ops.items():
        sec = {"load_before": round(os.getloadavg()[0], 2)}
        t0 = time.time(); _noop(mk()); sec["cold"] = round(time.time() - t0, 3)
        t0 = time.time(); _noop(mk()); sec["warm"] = round(time.time() - t0, 3)
        sec["load_after"] = round(os.getloadavg()[0], 2)
        out["sections"][name] = sec
        log(f"{name}: cold {sec['cold']}s warm {sec['warm']}s "
            f"(load {sec['load_before']}->{sec['load_after']})")

    # ANN recall@10 of the compressed-domain searchers vs the exact baseline
    # (correctness entries are hash-checked; this reports retrieval QUALITY
    # of the lossy index structures, the missing axis the r5 verdict named)
    exact = [r["vec_id"] for r in simsearch.ann_cosine_topk(spark, sf_dir).limit(10).collect()]
    probes = {
        "ivf_nprobe1": simsearch.ann_ivf_kmeans,
        "ivf_nprobe2": simsearch.ann_ivf_kmeans_probe2,
        "ivfpq_adc_nprobe2": simsearch.ann_ivfpq_adc_topk,
        "ivfpq_residual_nprobe2": simsearch.ann_ivfpq_residual_topk,
    }
    rec = {}
    for name, fn in probes.items():
        got = [r["vec_id"] for r in fn(spark, sf_dir).limit(10).collect()]
        rec[name] = round(len(set(got) & set(exact)) / max(1, len(exact)), 3)
        log(f"recall@10 {name}: {rec[name]}")
    out["ann_recall_at_10_vs_exact"] = rec

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
