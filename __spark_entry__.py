"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship path: build the block-compressed inverted
index over sf0.001 ``documents`` and answer a BM25 top-k query with Block-Max
WAND. ``queries()``/``oracle_sql()`` enumerate every implemented operator from
SURVEY.md §2 plus the training-data-pipeline families (dedup / similarity /
text analysis / events / relational), each paired with DuckDB oracle SQL
generated from the same pinned semantic fragments the engine uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index build + Block-Max WAND BM25 top-k on sf0.001."""
    from ciff_spark.operators.index_queries import QUERIES

    fn, _ = QUERIES["bm25_idx_wand_mix"]
    return fn(spark, "/root/testdata/sf0.001")


def _all_modules():
    from ciff_spark.operators import (  # noqa: PLC0415
        dedup,
        events,
        impact_queries,
        index_queries,
        multimodal_ops,
        quantize,
        relational,
        simsearch,
        textquality,
    )

    return (
        index_queries, impact_queries, dedup, textquality, simsearch, events,
        relational, quantize, multimodal_ops,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _all_modules():
        for name, (fn, _sql) in mod.QUERIES.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _all_modules():
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
