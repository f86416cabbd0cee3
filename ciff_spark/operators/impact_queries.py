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
    the quantizer's positive-range pass sees every row."""
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    tf = (
        docs.select(
            F.col("doc_id").cast("long").alias("ext_id"),
            F.explode(tokenize_expr("text")).alias("term"),
        )
        .groupBy("ext_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
    return tf.join(F.broadcast(dfs), "term").select(
        "ext_id",
        F.col("ext_id").alias("pos"),  # first-seen order = doc_id order
        "term",
        (
            F.col("tf").cast("double")
            * (F.lit(float(n)) / F.col("df").cast("double"))
        ).alias("score"),
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
}
