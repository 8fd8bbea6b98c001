"""Relational + point-in-time queries (operators/join.py,
operators/relational.py) — coverage the reference lacks entirely
(SURVEY.md §2.2: no joins, no sort/limit/top-k, no set ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandarallel_spark.operators.join import asof_join, range_join
from pandarallel_spark.operators.relational import (
    rollup_agg,
    skew_safe_count_distinct,
    topk_per_group,
)
from pandarallel_spark.sources import load_table
from pandarallel_spark.workload import register

# events.ts is ns-grained in the parquet but µs-grained in Spark (nanos
# read as long, ÷1000) — oracles truncate to µs so both engines compare
# and emit identical instants.
_TS_US = "date_trunc('microseconds', {})"


@register(
    "asof_last_purchase_before_click",
    f"""
WITH c AS (SELECT event_id, user_id, {_TS_US.format('ts')} AS ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, {_TS_US.format('ts')} AS ts,
             CAST(round(value*100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS ts_asof, p.cents AS cents_asof
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    "As-of (point-in-time) join: latest purchase at-or-before each click "
    "per user — union + keyed last(ignorenulls) window, one shuffle, no "
    "range explosion. The reference has no joins at all; pandas users "
    "know this as merge_asof.",
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["cents"],
    ).select("event_id", "user_id", "ts", "ts_asof", "cents_asof")


@register(
    "range_purchases_after_error",
    f"""
WITH e AS (SELECT event_id AS error_id, user_id, {_TS_US.format('ts')} AS error_ts
           FROM events WHERE event_type = 'error'),
p AS (SELECT user_id, event_id AS purchase_id, {_TS_US.format('ts')} AS purchase_ts
      FROM events WHERE event_type = 'purchase')
SELECT e.error_id, p.purchase_id, e.user_id
FROM e JOIN p ON e.user_id = p.user_id
 AND p.purchase_ts >= e.error_ts
 AND p.purchase_ts <= e.error_ts + INTERVAL 1 HOUR
""",
    "Range join: purchases within 1 hour after an error, per user — "
    "equi-key hash join + range predicate inside key groups (never a "
    "cross product).",
)
def range_purchases_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    out = range_join(
        errors,
        purchases,
        on="user_id",
        condition=(
            (F.col("purchase_ts") >= F.col("error_ts"))
            & (F.col("purchase_ts") <= F.col("error_ts") + F.expr("INTERVAL 1 HOUR"))
        ),
    )
    return out.select("error_id", "purchase_id", errors["user_id"].alias("user_id"))


@register(
    "topk_orders_per_segment",
    """
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
WHERE rnk <= 3
""",
    "Top-3 orders by price per market segment — broadcast dim join + "
    "ranking window (one shuffle on the segment key; no global sort).",
)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    out = topk_per_group(
        joined,
        ["c_mktsegment"],
        F.col("o_totalprice").desc(),
        k=3,
        tiebreak=["o_orderkey"],
    )
    return out.select(
        "c_mktsegment", "o_orderkey", "o_totalprice", F.col("rank").cast("bigint").alias("rank")
    )


@register(
    "count_distinct_parts_per_supplier",
    """
SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS l_partkey_distinct
FROM lineitem GROUP BY l_suppkey
""",
    "Exact distinct count per key in two mergeable stages — duplicates "
    "of a hot key collapse map-side before the shuffle (COUNT(DISTINCT) "
    "skew pattern).",
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return skew_safe_count_distinct(li, ["l_suppkey"], "l_partkey")


@register(
    "rollup_quantity",
    """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "Grouping-set rollup: per-(flag,status) totals + flag subtotals + "
    "grand total in one pass (grouping sets expanded map-side).",
)
def rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.sum(F.col("l_quantity").cast("bigint")),
            "n_rows": F.count(F.lit(1)),
        },
    )
