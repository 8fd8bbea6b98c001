"""Real Structured Streaming coverage: the same tumbling-window
transformation that the batch oracle checks, run through
readStream → watermark → writeStream(memory sink) with availableNow,
must produce the batch result."""

import pandas as pd

from pandarallel_spark.sources import load_table
from pandarallel_spark.streaming import stream_events, tumbling_window_agg
from pyspark.sql import functions as F


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    # the raw testdata events file has a nanos timestamp Spark's reader
    # rejects; stage a micros copy as the stream source dir
    batch_src = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_stream")
    batch_src.write.parquet(src)

    stream_df = stream_events(spark, src, duration="1 hour", watermark="2 hours")
    q = (
        stream_df.writeStream.format("memory")
        .queryName("ev_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.table("ev_windows")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    expected = (
        tumbling_window_agg(
            batch_src,
            "ts",
            "1 hour",
            {"n_events": F.count(F.lit(1)), "sum_value": F.sum("value")},
            group_by=["event_type"],
        )
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expected) > 0
    pd.testing.assert_frame_equal(
        got[["window_start", "event_type", "n_events"]],
        expected[["window_start", "event_type", "n_events"]],
    )


def test_sessionize_batch(spark, sf_dir):
    from pandarallel_spark.streaming import sessionize

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(
        ev, "ts", "user_id", "30 minutes", {"n_events": F.count(F.lit(1))}
    ).toPandas()
    assert (sessions.session_end >= sessions.session_start).all()
    # every event lands in exactly one session
    assert sessions.n_events.sum() == ev.count()
