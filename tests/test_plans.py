"""Physical-plan audits: the plans we'd want at 100 TB, asserted.

- query-term postings fetch: the `term IN (...)` predicate reaches the
  Parquet scan (PushedFilters) and prunes columns (no blocks read when only
  stats are selected);
- small-dim joins go broadcast;
- the dense-rank plan contains no single-partition global Window;
- relational BM25 keeps the aggregation pipeline in whole-stage codegen.
"""

import pytest
from pyspark.sql import functions as F

from ciff_spark.build import BuildConfig, build_index
from ciff_spark.sources.transcripts import transcripts_df


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("planidx") / "idx")
    df = transcripts_df(spark, 25, seed=21, partitions=3)
    build_index(df, root, config=BuildConfig(n_shards=2, n_pgroups=4), resume=False)
    return root


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_term_filter_pushed_to_parquet(spark, idx):
    post = spark.read.parquet(f"{idx}/postings").where(
        F.col("term").isin(["w000001", "w000002"])
    )
    plan = _plan(post)
    assert "PushedFilters" in plan and "In(term" in plan, plan[:800]


def test_column_pruning_skips_blocks(spark, idx):
    stats = (
        spark.read.parquet(f"{idx}/postings")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    plan = _plan(stats)
    scan = plan[plan.index("FileScan") :].split("\n")[0]
    assert "blocks" not in scan, scan  # ReadSchema must exclude the fat column


def test_relational_bm25_uses_broadcast_and_codegen(spark):
    from ciff_spark.query import bm25_topk_relational

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bm25_topk_relational(docs, "dup batch", k=10, docid_col="doc_id")
    out.collect()  # AQE reveals the final plan (and codegen spans) post-run
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:1500]
    # '*(' prefixes mark operators inside WholeStageCodegen spans
    assert "*(" in plan, plan[:1500]
    # final top-k must be TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_rank_has_no_global_window(spark):
    from ciff_spark.plans.rank import add_dense_docid

    df = transcripts_df(spark, 10, seed=4, partitions=3)
    ranked = add_dense_docid(df, ["conv_id", "turn_idx"], 4)
    plan = _plan(ranked)
    assert "Window" not in plan


def test_dim_join_broadcasts(spark):
    from ciff_spark.operators.relational import rel_nation_revenue

    out = rel_nation_revenue(spark, "/root/testdata/sf0.001")
    assert "BroadcastHashJoin" in _plan(out)
