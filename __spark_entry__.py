"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's workload registry
(``pandarallel_spark/workload``): one query per implemented operator
from SURVEY.md §2, each with a DuckDB oracle when SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandarallel_spark.workload import oracle_sql as _oracle_sql
from pandarallel_spark.workload import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary (reference op #7,
    groupby-apply — its richest operator) on sf0.001."""
    return _queries()["groupby_agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
