"""Quantized-impact retrieval over the ``documents`` table — the reference's
learned-sparse model, end-to-end and driver-checkable.

The reference's jsonl2ciff path exists to exchange impact indexes (DeepImpact /
uniCOIL-style): per-(doc, term) float scores are 8-bit min-max quantized into
[1,255] and stored AS the posting tf (ScoreQuantizer,
/root/reference/src/lib.rs:87-148); query engines then rank on Σ impact with no
per-doc normalization (PISA's ``quantized`` scorer). Here the whole cycle runs
in-engine:

1. derive deterministic learned-sparse-style vectors from ``documents``:
   score(doc, term) = tf · (N / df) — multiplicative idf, chosen over ln()
   because every operation (int→double widening, one division, one multiply)
   is IEEE-754 exactly-rounded and therefore BIT-IDENTICAL between Spark and
   DuckDB, while libm ``log`` may differ by 1 ulp between runtimes;
2. quantize + index via the reference-parity jsonl2ciff build
   (``build_index_from_vector_rows``, quantize=True — F5 semantics);
3. answer top-k by Σ impact through BOTH index engines (exact decode and
   Block-Max WAND with per-block ``max_tf`` bounds, ``scoring="impact"``);
4. the DuckDB oracle recomputes the same pipeline relationally from the raw
   parquet — proving quantization, encode, decode, and impact pruning
   preserve the semantics cross-engine.

Impact sums are exact integers (≤ 255·|q| per doc), so no score rounding is
involved; ties break by ascending docid in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ciff_spark.functions.tokenizer import tokenize_expr, tokenize_py
from ciff_spark.operators.index_queries import _TOKS_SQL, K, Q_MIX, Q_MULTI, index_root_for
from ciff_spark.query import IndexReader
from ciff_spark.sources.testdata import load
from ciff_spark.store import IndexStore


def impact_vector_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ext_id, pos, term, score) learned-sparse-style rows derived from
    ``documents``: score = tf · (N / df). All-positive by construction, so
    the quantizer's positive-range pass sees every row. N rides in-plan as a
    broadcast 1-row cross join — no separate ``docs.count()`` action/scan
    (the same one-scan pattern ``a4_index_meta`` uses)."""
    docs = load(spark, sf_dir, "documents")
    ncol = docs.agg(F.count("*").cast("double").alias("_n"))
    tf = (
        docs.select(
            F.col("doc_id").cast("long").alias("ext_id"),
            F.explode(tokenize_expr("text")).alias("term"),
        )
        .groupBy("ext_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(ncol))
        .select(
            "ext_id",
            F.col("ext_id").alias("pos"),  # first-seen order = doc_id order
            "term",
            (
                F.col("tf").cast("double")
                * (F.col("_n") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )


def impact_index(spark: SparkSession, sf_dir: str) -> IndexStore:
    """Build (or reuse) the quantized impact index for ``sf_dir``. ``meta``
    is written last by the build, so its presence is the commit marker — a
    crash mid-build leaves no meta and the next call rebuilds from scratch."""
    from ciff_spark.sources.jsonl_vectors import build_index_from_vector_rows

    root = index_root_for(sf_dir) + "_impact"
    store = IndexStore(root)
    if store.exists("meta"):
        return store
    return build_index_from_vector_rows(
        spark, impact_vector_rows(spark, sf_dir), root, quantize=True,
        source_desc=f"tf·idf impact vectors @ {sf_dir}",
    )


def _impact_indexed(query: str, mode: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        store = impact_index(spark, sf_dir)
        reader = IndexReader(spark, store.root)
        out = reader.topk([(0, query)], k=K, mode=mode, scoring="impact")
        # map internal docids back to external doc_ids: big-side docs table
        # joins against the broadcast ≤k-row result, never the reverse
        docs = store.read(spark, "docs").select(
            "docid", F.col("ext_id").cast("long").alias("doc_id")
        )
        return (
            docs.join(F.broadcast(out), "docid")
            .select("doc_id", F.col("score").cast("long").alias("impact"))
            .orderBy(F.desc("impact"), F.asc("doc_id"))
        )

    return fn


IMPACT_FRESH_BASE_FRAC = 0.8


def _impact_fresh(query: str, base_frac: float = IMPACT_FRESH_BASE_FRAC):
    """Streaming-freshness for the IMPACT index, driver-checkable: quantize
    + index the first ``base_frac`` of the corpus's learned-sparse vectors as
    the base (fitting the quantizer range there), stream the rest in as a
    vector segment (``append_vector_batch`` — quantized with the base's
    FROZEN range, clamped), and serve Σ-impact over base ∪ segment with
    ``FreshSearcher(scoring="impact")``. The oracle recomputes exactly that:
    range fitted on the base slice only, every doc quantized with it."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        import pandas as pd

        from ciff_spark.serve import FreshSearcher
        from ciff_spark.sources.jsonl_vectors import build_index_from_vector_rows
        from ciff_spark.streaming.incremental import (
            SEG_DOCS,
            _committed_segment_ids,
            append_vector_batch,
            read_segments,
        )

        docs = load(spark, sf_dir, "documents")
        cut = int(docs.count() * base_frac)
        root = index_root_for(sf_dir) + "_impact_fresh"
        store = IndexStore(root)
        # reuse point is base AND committed segment (a crash between the two
        # must rebuild, not serve a base-only index forever)
        if not (store.exists("meta") and _committed_segment_ids(store)):
            store.drop()
            rows = impact_vector_rows(spark, sf_dir).persist()
            try:
                build_index_from_vector_rows(
                    spark, rows.where(F.col("ext_id") < cut), root, quantize=True,
                    source_desc=f"fresh-base impact vectors @ {sf_dir}",
                )
                append_vector_batch(
                    spark, store, rows.where(F.col("ext_id") >= cut), 0
                )
            finally:
                rows.unpersist()
        hits = FreshSearcher(root).search(query, k=K, scoring="impact")
        out = spark.createDataFrame(
            pd.DataFrame(hits, columns=["docid", "score"]),
            "docid bigint, score double",
        )
        idmap = store.read(spark, "docs").select("docid", "ext_id").unionAll(
            read_segments(spark, store, SEG_DOCS).select("docid", "ext_id")
        )
        return (
            idmap.join(F.broadcast(out), "docid")
            .select(
                F.col("ext_id").cast("long").alias("doc_id"),
                F.col("score").cast("long").alias("impact"),
            )
            .orderBy(F.desc("impact"), F.asc("doc_id"))
        )

    return fn


def impact_fresh_topk_sql(query: str, k: int = K, base_frac: float = IMPACT_FRESH_BASE_FRAC) -> str:
    """DuckDB oracle for fresh impact serving: same derive → quantize → Σ
    pipeline as ``impact_topk_sql``, but the quantizer range is fitted ONLY
    on the base slice (docid < floor(N·base_frac)) and then applied, clamped,
    to every doc — exactly the frozen-range semantics of
    ``append_vector_batch``."""
    qterms = sorted(set(tokenize_py(query)))
    terms_in = ", ".join(f"'{t}'" for t in qterms) or "''"
    return f"""
WITH toks AS ({_TOKS_SQL}),
tf AS (SELECT term, docid, count(*)::BIGINT AS tf FROM toks GROUP BY term, docid),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.term, tf.docid,
         tf.tf * ((SELECT count(*) FROM documents) * 1.0 / dfs.df) AS score
  FROM tf JOIN dfs USING (term)
),
cut AS (
  SELECT CAST(floor(count(*) * {base_frac}) AS BIGINT) AS c FROM documents
),
rng AS (
  SELECT min(score) AS lo, max(score) AS hi
  FROM w CROSS JOIN cut WHERE score > 0 AND docid < cut.c
),
q AS (
  SELECT term, docid,
         CASE WHEN score <= 0 THEN 0
              WHEN hi = lo THEN 1
              ELSE least(255, greatest(1,
                     CAST(round((score - lo) / (hi - lo) * 254) AS BIGINT) + 1))
         END AS tfq
  FROM w CROSS JOIN rng
),
scored AS (
  SELECT docid, CAST(sum(tfq) AS BIGINT) AS impact
  FROM q WHERE tfq > 0 AND term IN ({terms_in})
  GROUP BY docid
)
SELECT docid AS doc_id, impact FROM scored
ORDER BY impact DESC, docid ASC LIMIT {k}
"""


def impact_topk_sql(query: str, k: int = K) -> str:
    """DuckDB oracle: the full derive → quantize → Σ-impact pipeline,
    relationally, from the same parquet — fragment-pinned to the Spark side
    (tokenizer, F5 quantizer formula, multiplicative idf, tie-breaks)."""
    qterms = sorted(set(tokenize_py(query)))
    terms_in = ", ".join(f"'{t}'" for t in qterms) or "''"
    return f"""
WITH toks AS ({_TOKS_SQL}),
tf AS (SELECT term, docid, count(*)::BIGINT AS tf FROM toks GROUP BY term, docid),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.term, tf.docid,
         tf.tf * ((SELECT count(*) FROM documents) * 1.0 / dfs.df) AS score
  FROM tf JOIN dfs USING (term)
),
rng AS (SELECT min(score) AS lo, max(score) AS hi FROM w WHERE score > 0),
q AS (
  SELECT term, docid,
         CASE WHEN score <= 0 THEN 0
              WHEN hi = lo THEN 1
              ELSE least(255, greatest(1,
                     CAST(round((score - lo) / (hi - lo) * 254) AS BIGINT) + 1))
         END AS tfq
  FROM w CROSS JOIN rng
),
scored AS (
  SELECT docid, CAST(sum(tfq) AS BIGINT) AS impact
  FROM q WHERE tfq > 0 AND term IN ({terms_in})
  GROUP BY docid
)
SELECT docid AS doc_id, impact FROM scored
ORDER BY impact DESC, docid ASC LIMIT {k}
"""


QUERIES: dict[str, tuple] = {
    "impact_idx_wand_mix": (_impact_indexed(Q_MIX, "wand"), impact_topk_sql(Q_MIX)),
    "impact_idx_exact_multi": (
        _impact_indexed(Q_MULTI, "exact"),
        impact_topk_sql(Q_MULTI),
    ),
    # streaming freshness for the impact index: base (range-fitting) build +
    # frozen-range vector segment, FreshSearcher Σ-impact vs the same-
    # semantics whole-corpus oracle (fresh ≡ rebuild-with-frozen-range)
    "impact_fresh_mix": (_impact_fresh(Q_MIX), impact_fresh_topk_sql(Q_MIX)),
}
