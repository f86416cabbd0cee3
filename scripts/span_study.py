"""Adaptive-span trade study: postings bytes, WAND decode ratios, and serving
walls across block-span policies on the Zipf transcript corpus.

Policies:
  adaptive   — per-list cap (codec.SPAN_ADAPT_FACTOR, the default): only
               lists with avg docid gap > 4 are width-capped
  fixed256   — r4 geometry: every list window-capped at 256 docids
  unbounded  — pre-r4 geometry: count-only blocks

Usage: python scripts/span_study.py [n_convs]   (default 20000 ≈ 131k turns)
Prints one JSON line per policy.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from bench import stage_transcripts, zipf_query_mixes, zipf_term_bands

    from ciff_spark import get_spark
    from ciff_spark.build import BuildConfig, build_index
    from ciff_spark.serve import FreshSearcher, LocalSearcher

    spark = get_spark("span-study", cores=32, shuffle_partitions=32)
    spark.range(10).count()
    data = stage_transcripts(spark, n_convs)
    df = spark.read.parquet(data)

    policies = {
        "adaptive": {"span_adaptive": True},
        "fixed256": {"span_adaptive": False},
        "unbounded": {"block_span": None},
    }
    for name, kw in policies.items():
        root = f"/tmp/ciff_span_study/{name}_{n_convs}"
        shutil.rmtree(root, ignore_errors=True)
        cfg = BuildConfig(n_shards=32, n_pgroups=64, rank_partitions=64, **kw)
        t0 = time.time()
        store = build_index(df, root, config=cfg, resume=False)
        build_sec = time.time() - t0
        turns = store.meta(spark)["num_docs"]
        pbytes = dir_bytes(f"{root}/postings")

        bands = zipf_term_bands(root, int(turns))
        zipf_qs, sel_qs = zipf_query_mixes(bands)

        def ratio(qs):
            st: dict = {}
            for q in qs:
                LocalSearcher(root).search(q, k=10, stats=st)
            return st.get("decoded_blocks", 0) / max(st.get("total_blocks", 1), 1)

        def serve_p50(cls, qs, **kw):
            lats = []
            for q in qs:
                s = cls(root)
                t = time.time()
                s.search(q, k=10, **kw)
                lats.append(time.time() - t)
            lats.sort()
            return lats[len(lats) // 2]

        out = {
            "policy": name,
            "n_convs": n_convs,
            "turns": int(turns),
            "build_sec": round(build_sec, 2),
            "postings_mb": round(pbytes / 1e6, 1),
            "zipf_ratio": round(ratio(zipf_qs), 3),
            "sel_ratio": round(ratio(sel_qs), 3),
            "wand_p50_ms": round(serve_p50(LocalSearcher, zipf_qs) * 1000, 1),
            "exhaustive_p50_ms": round(
                serve_p50(FreshSearcher, zipf_qs, prune=False) * 1000, 1
            ),
        }
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
