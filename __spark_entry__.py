"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: one crawl-round schedule (anti-join + priority
                top-k + per-host politeness budget) over sf0.001.
queries()     — every SQL-expressible operator from SURVEY.md §2 plus the
                training-data ops (dedup / similarity / text / multimodal),
                implemented in crawler_spark/operators/*.
oracle_sql()  — DuckDB twins, same column names, floats rounded both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.operators import ALL_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = ALL_QUERIES["crawl_round_schedule"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
