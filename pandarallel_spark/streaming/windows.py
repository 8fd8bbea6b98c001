"""Event-time windowed aggregations (batch + streaming forms).

Batch form runs on any DataFrame with an event-time column and is what
the DuckDB oracle checks (``F.window`` buckets == ``date_trunc``-style
bucketing in SQL). Streaming form wraps the same transformation around
``readStream`` with a watermark, so late data past the watermark is
dropped — state stays bounded on a long-running 100 TB/day stream.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Mapping[str, Column],
    group_by: list[str] | None = None,
) -> DataFrame:
    """Non-overlapping event-time buckets; window start/end reified as
    plain timestamp columns so batch and oracle outputs align."""
    keys = [F.window(F.col(ts_col), duration).alias("w"), *(group_by or [])]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(group_by or []),
        *aggs.keys(),
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Mapping[str, Column],
    group_by: list[str] | None = None,
) -> DataFrame:
    keys = [F.window(F.col(ts_col), duration, slide).alias("w"), *(group_by or [])]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(group_by or []),
        *aggs.keys(),
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str,
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Session windows: ``F.session_window`` in streaming; here the batch
    equivalent via a gap-based island computation (lag + cumulative sum)
    so the DuckDB oracle can express the same thing.

    Gap comparison is strict ``>``: ``F.session_window`` MERGES an event
    at exactly ``last_event + gap`` into the session (inclusive
    boundary — verified empirically in
    tests/test_review_fixes.py::test_sessionize_exact_gap_matches_session_window;
    a review suggestion to use ``>=`` was checked and refuted there)."""
    from pyspark.sql import Window

    gap_expr = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(user_col).orderBy(ts_col)
    flagged = df.withColumn(
        "__new_session__",
        (
            F.col(ts_col)
            > (F.lag(F.col(ts_col)).over(w) + gap_expr)
        ).cast("int"),
    ).withColumn(
        "__session_id__",
        F.sum(F.coalesce(F.col("__new_session__"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy(user_col, "__session_id__")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            *[c.alias(n) for n, c in aggs.items()],
        )
        .drop("__session_id__")
    )


def stream_sessions(
    spark: SparkSession,
    path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization: ``F.session_window`` merges events
    within ``gap`` of each other per user; the watermark closes sessions
    whose window end falls behind it, so state stays bounded on an
    unbounded stream (the batch ``sessionize`` above is the oracle twin
    — same gap semantics via lag + cumulative sum)."""
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_events(
    spark: SparkSession,
    path: str,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Real Structured Streaming pipeline over the events parquet dir:
    readStream → watermark → tumbling count/sum. Callers attach a sink
    (tests use format("memory") + availableNow trigger)."""
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    # Parquet round-trips may infer TIMESTAMP_NTZ (Spark 4 default when the
    # file lacks a tz marker); withWatermark requires TimestampType (LTZ), so
    # normalize before declaring event time.
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), duration), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_to_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    partition_by: list[str] | None = None,
):
    """The production sink: append the stream to a parquet directory
    with a checkpoint — Spark's file sink is exactly-once END TO END
    (source offsets + sink file manifest both live in the checkpoint,
    so a crashed/restarted query neither drops nor duplicates rows; the
    memory sink the tests use elsewhere is at-least-once and
    driver-bounded). ``partition_by`` lays out the files for partition
    pruning downstream, same as the batch writer. Returns the started
    ``StreamingQuery``; with ``trigger_available_now`` the query drains
    what exists and stops — the batch-like mode a backfill wants —
    otherwise it runs continuously."""
    w = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
