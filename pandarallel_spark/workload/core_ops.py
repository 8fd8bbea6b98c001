"""Core-operator queries (SURVEY.md §2.1) over the driver testdata.

Naming: ``<op>_<variant>``. Each query exists to prove one operator of
the reference surface end-to-end against a DuckDB oracle.

Exact-arithmetic note: monetary columns carry exactly 2 decimals (checked
on the generated data), so aggregates are computed on int64 *cents* —
bit-exact in Spark, DuckDB and pandas alike, and faster than decimal.
At larger-than-int64 scales the production path would swap the cents
columns to ``decimal(38,4)``; the expression shape is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandarallel_spark import parallelize
from pandarallel_spark.operators.groupby import grouped_agg
from pandarallel_spark.sources import load_table
from pandarallel_spark.workload import register

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS sum_disc_price,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT))*(100 + CAST(round(l_tax*100) AS BIGINT))) AS DOUBLE)/1000000.0 AS sum_charge,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
  CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


@register(
    "groupby_agg_pricing_summary",
    _Q1_ORACLE,
    "TPC-H-Q1-shaped pricing summary — grouped_agg builtin fast path "
    "(reference op #7's expressible form). Map-side partial aggregation; "
    "filter pushed to the parquet scan.",
)
def q1_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    price_c, disc_c, tax_c = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    qty = F.col("l_quantity").cast("long")
    n = F.count(F.lit(1))
    return grouped_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.sum(qty).cast("double"),
            "sum_base_price": F.sum(price_c).cast("double") / 100.0,
            "sum_disc_price": F.sum(price_c * (100 - disc_c)).cast("double") / 10000.0,
            "sum_charge": F.sum(price_c * (100 - disc_c) * (100 + tax_c)).cast("double")
            / 1000000.0,
            "avg_qty": F.sum(qty).cast("double") / n,
            "avg_price": F.sum(price_c).cast("double") / 100.0 / n,
            "avg_disc": F.sum(disc_c).cast("double") / 100.0 / n,
            "count_order": n,
        },
    )


def _pricing_summary_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group pandas aggregate, arithmetic identical to the builtin
    path (int64 cents) so all three computations hash-match."""
    price_c = np.round(pdf["l_extendedprice"].to_numpy() * 100).astype("int64")
    disc_c = np.round(pdf["l_discount"].to_numpy() * 100).astype("int64")
    tax_c = np.round(pdf["l_tax"].to_numpy() * 100).astype("int64")
    qty = pdf["l_quantity"].to_numpy().astype("int64")
    n = len(pdf)
    sum_qty = int(qty.sum())
    sum_price_c = int(price_c.sum())
    sum_disc_c = int(disc_c.sum())
    sum_disc_price_u = int((price_c * (100 - disc_c)).sum())
    sum_charge_u = int((price_c * (100 - disc_c) * (100 + tax_c)).sum())
    return pd.DataFrame(
        [
            {
                "sum_qty": float(sum_qty),
                "sum_base_price": sum_price_c / 100.0,
                "sum_disc_price": sum_disc_price_u / 10000.0,
                "sum_charge": sum_charge_u / 1000000.0,
                "avg_qty": float(sum_qty) / n,
                "avg_price": sum_price_c / 100.0 / n,
                "avg_disc": sum_disc_c / 100.0 / n,
                "count_order": n,
            }
        ]
    )


@register(
    "groupby_apply_pricing_summary",
    _Q1_ORACLE,
    "Same pricing summary through the arbitrary-UDF path: "
    "groupBy().applyInPandas (reference op #7, data_types/dataframe_groupby.py). "
    "Proves grouped-map machinery + schema declaration.",
)
def q1_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    schema = (
        "l_returnflag string, l_linestatus string, sum_qty double, "
        "sum_base_price double, sum_disc_price double, sum_charge double, "
        "avg_qty double, avg_price double, avg_disc double, count_order bigint"
    )
    return (
        parallelize(li)
        .groupby("l_returnflag", "l_linestatus")
        .parallel_apply(_pricing_summary_pandas, schema=schema, mode="frame")
    )
