"""Physical-plan guards for the pair-finding operators: the 100 TB contract
is that candidate generation is a bucketed equi-join, NEVER a cartesian /
nested-loop product (VERDICT r1 flagged dedup_simhash_pairs for exactly
this). Plans are asserted, not just walls measured, so a regression to an
all-pairs join fails fast at sf0.001."""

import pytest

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "opname",
    ["dedup_simhash_pairs", "dedup_minhash_lsh_pairs", "neardup_cosine_pairs",
     "neardup_lsh_pairs"],
)
def test_pair_finders_have_no_cartesian_product(spark, opname):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[opname](spark, SF_DIR)
    plan = _plan(df)
    for bad in FORBIDDEN:
        assert bad not in plan, f"{opname}: {bad} in physical plan:\n{plan}"


def test_simhash_banding_is_exact(spark):
    """The banded candidate join must reproduce the all-pairs answer exactly
    (pigeonhole recall guarantee) — checked against a brute-force cross join
    at toy scale."""
    from pyspark.sql import functions as F

    from ciff_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        dedup_simhash,
        dedup_simhash_pairs,
    )

    sh = dedup_simhash(spark, SF_DIR)
    a, b = sh.alias("a"), sh.alias("b")
    brute = (
        a.join(b, F.col("a.docid") < F.col("b.docid"))
        .select(
            F.col("a.docid").alias("d1"),
            F.col("b.docid").alias("d2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .toPandas()
        .sort_values(["d1", "d2"])
        .reset_index(drop=True)
    )
    banded = (
        dedup_simhash_pairs(spark, SF_DIR)
        .toPandas()
        .sort_values(["d1", "d2"])
        .reset_index(drop=True)
    )
    assert banded.equals(brute)


def test_kmeans_assignment_is_pure_codegen(spark):
    """The Lloyd's assignment pass is the per-iteration hot path over the
    full embedding table: it must stay JVM-side expression work (aggregate/
    zip_with inside codegen), never a Python UDF and never a join against a
    centroid table (the centroids are driver literals)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["ann_kmeans_clusters"](spark, SF_DIR)
    plan = _plan(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Join"):
        assert bad not in plan, f"{bad} in assignment plan:\n{plan}"


def test_zipf_term_bands_none_on_degenerate_vocab(tmp_path):
    """bench's band helper must signal (None) rather than hand empty lists
    to the query-synthesis modulo when a corpus is too small/degenerate."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from bench import zipf_term_bands

    d = tmp_path / "term_stats"
    d.mkdir()
    papq.write_table(
        pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}),
        str(d / "part-0.parquet"),
    )
    assert zipf_term_bands(str(tmp_path), 100) is None
