"""Real Structured Streaming coverage: the same tumbling-window
transformation that the batch oracle checks, run through
readStream → watermark → writeStream(memory sink) with availableNow,
must produce the batch result."""

import pandas as pd
import pytest

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


def test_stream_sessions_match_batch(spark, sf_dir, tmp_path):
    """F.session_window streaming sessionization must produce the batch
    gap-island sessionization's (user, session_start, n_events) —
    session_end differs by construction (streaming end = last ts + gap,
    batch end = last ts)."""
    from pandarallel_spark.streaming import sessionize, stream_sessions

    batch_src = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_sessions")
    batch_src.write.parquet(src)

    q = (
        stream_sessions(spark, src, gap="30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("ev_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.table("ev_sessions")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    expected = (
        sessionize(
            batch_src.withColumn("ts", F.col("ts").cast("timestamp")),
            "ts",
            "user_id",
            "30 minutes",
            {"n_events": F.count(F.lit(1))},
        )
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expected) > 0
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "n_events"]],
        expected[["user_id", "session_start", "n_events"]],
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


def test_stateful_dedup_stream(spark, sf_dir, tmp_path):
    """Cross-batch first-seen dedup via applyInPandasWithState: two
    micro-batches with overlapping keys — each key emitted exactly once,
    and the second batch's repeats dropped."""
    from pandarallel_spark.streaming import dedup_stream

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    src = str(tmp_path / "dedup_src")
    chk = str(tmp_path / "dedup_chk")
    # batch 1: half the users; batch 2: ALL users (so every batch-2 user
    # already in batch 1 must be dropped)
    half = ev.filter("user_id % 2 = 0")
    half.coalesce(1).write.parquet(src)

    sink = str(tmp_path / "dedup_sink")
    schema = ev.schema

    def run_wave():
        # parquet sink: supports checkpoint recovery (memory sink doesn't)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            dedup_stream(stream, ["user_id"])
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).toPandas()

    n_half_users = half.select("user_id").distinct().count()
    got1 = run_wave()
    assert len(got1) == n_half_users
    assert got1.user_id.is_unique

    # second wave of files → second run picks up from the checkpoint:
    # every user seen in wave 1 must be dropped, new users emitted once
    ev.coalesce(1).write.mode("append").parquet(src)
    got2 = run_wave()
    n_all_users = ev.select("user_id").distinct().count()
    assert len(got2) == n_all_users
    assert got2.user_id.is_unique


def test_stateful_running_counts(spark, sf_dir, tmp_path):
    from pandarallel_spark.streaming import running_counts

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    src = str(tmp_path / "rc_src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = running_counts(stream, ["user_id"])
    q = (
        out.writeStream.format("memory").queryName("rc_out")
        .option("checkpointLocation", str(tmp_path / "rc_chk"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("rc_out").toPandas().set_index("user_id")["n_events_total"]
    expected = ev.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    assert (got.sort_index() == expected.sort_index()).all()


def test_content_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming fingerprint dedup keeps exactly one doc per normalized
    content — same survivor-set size as the batch fingerprint_dedup
    (survivor identity differs: stream keeps first-SEEN, batch keeps
    min-id), and re-sending the same files emits nothing new."""
    from pandarallel_spark.operators.dedup import fingerprint_dedup
    from pandarallel_spark.streaming import content_dedup_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "cd_src")
    chk = str(tmp_path / "cd_chk")
    sink = str(tmp_path / "cd_sink")
    docs.coalesce(1).write.parquet(src)
    schema = docs.schema

    def run_wave():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            content_dedup_stream(stream, "text")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).toPandas()

    n_batch = fingerprint_dedup(docs, "text", "doc_id").count()
    got1 = run_wave()
    assert len(got1) == n_batch
    assert got1.doc_id.is_unique

    # duplicate wave: every fingerprint already seen → nothing new
    docs.coalesce(1).write.mode("append").parquet(src)
    got2 = run_wave()
    assert len(got2) == n_batch


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner interval join (clicks ⋈ purchases per user
    within 1h): two watermarked readStream sources joined on key +
    time-range — the shape whose state Spark can bound — must equal the
    identical batch join. The test watermark is generous so no row can
    be late across availableNow micro-batches (equality, not
    late-data-drop, is what's under test)."""
    from pandarallel_spark.streaming import stream_stream_interval_join

    batch_src = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_ssj")
    batch_src.write.parquet(src)

    joined = stream_stream_interval_join(
        spark, src, within="1 hour", watermark="30 days"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("ssj").toPandas()
        .sort_values(["user_id", "click_id", "purchase_id"])
        .reset_index(drop=True)
    )

    ev = batch_src.withColumn("ts", F.col("ts").cast("timestamp"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    exp = (
        c.join(
            p,
            (F.col("user_id") == F.col("u2"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 hour")),
        )
        .select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")
        .toPandas()
        .sort_values(["user_id", "click_id", "purchase_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)

    # output columns follow the ACTUAL event types (review finding r7:
    # they were hardcoded click_*/purchase_*), with _l/_r suffixes when
    # both sides name the same type
    j2 = stream_stream_interval_join(
        spark, src, left_type="error", right_type="click"
    )
    assert j2.columns == [
        "user_id", "error_id", "error_ts", "click_id", "click_ts"
    ]
    j3 = stream_stream_interval_join(
        spark, src, left_type="click", right_type="click"
    )
    assert j3.columns == [
        "user_id", "click_l_id", "click_l_ts", "click_r_id", "click_r_ts"
    ]


def test_stream_to_parquet_exactly_once_restart(spark, sf_dir, tmp_path):
    """The checkpointed file sink must be exactly-once across a
    restart: run the same availableNow query twice over the same source
    with the same checkpoint — the second run finds no new offsets and
    writes NOTHING, so the parquet output equals the batch result with
    no duplicates."""
    from pandarallel_spark.streaming import stream_events, stream_to_parquet

    batch_src = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_sink_src")
    batch_src.write.parquet(src)
    out_dir = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    for _ in range(2):  # second run = restart against the same checkpoint
        q = stream_to_parquet(
            stream_events(spark, src, duration="1 hour", watermark="2 hours"),
            out_dir, ckpt,
        )
        q.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir).toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    expected = (
        tumbling_window_agg(
            batch_src, "ts", "1 hour",
            {"n_events": F.count(F.lit(1)), "sum_value": F.sum("value")},
            group_by=["event_type"],
        )
        .toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    # append mode emits only FINALIZED windows: window_end ≤ final
    # watermark (max event time − 2h). The unfinalized tail stays in
    # state — correct streaming semantics, not loss.
    wm = batch_src.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][
        0
    ] - pd.Timedelta("2 hours")
    finalized = expected[expected.window_end <= wm].reset_index(drop=True)
    assert len(got) == len(finalized) > 0  # run 2 added NOTHING (no dups)
    pd.testing.assert_frame_equal(
        got[["window_start", "event_type", "n_events"]],
        finalized[["window_start", "event_type", "n_events"]],
    )


def test_stream_stream_left_outer_emits_expired_only(spark, tmp_path):
    """leftOuter stream-stream interval join (r8): an unmatched left
    row emits with NULLs only after the watermark passes its join-
    window expiry — and rows the final watermark has NOT sealed stay
    buffered at query end (Spark's documented outer-join contract).
    Three time-ordered files + maxFilesPerTrigger=1 force multiple
    micro-batches so the watermark actually advances mid-query."""
    import time as _time

    from pandarallel_spark.streaming import stream_stream_interval_join

    src = str(tmp_path / "ev_outer")
    base = pd.Timestamp("2024-01-01")

    def mk(rows):
        return pd.DataFrame({
            "event_id": pd.array([r[0] for r in rows], dtype="int64"),
            "user_id": pd.array([r[1] for r in rows], dtype="int64"),
            "event_type": [r[2] for r in rows],
            "ts": [base + pd.Timedelta(minutes=r[3]) for r in rows],
        })

    batches = [
        #              matched pair (u10) + unmatched click (u20)
        mk([(1, 10, "click", 0), (2, 10, "purchase", 30), (3, 20, "click", 5)]),
        #              a day later: matched pair (u30) — advances the watermark
        mk([(4, 30, "click", 24 * 60), (5, 30, "purchase", 24 * 60 + 10)]),
        #              two days in: unmatched click (u40), never sealed
        mk([(6, 40, "click", 48 * 60)]),
    ]
    for b in batches:
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes → deterministic file order

    joined = stream_stream_interval_join(
        spark, src, within="1 hour", watermark="1 hour",
        join_type="leftOuter", read_options={"maxFilesPerTrigger": 1},
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ssj_outer").toPandas().sort_values("click_id")

    inner = got[got.purchase_id.notna()]
    outer = got[got.purchase_id.isna()]
    # both true matches emitted
    assert sorted(inner.user_id) == [10, 30]
    # u20's click expired (watermark reached 23h+ after batch 2) →
    # emitted with NULLs; u40's click is NOT sealed by the final
    # watermark → still buffered, NOT emitted
    assert list(outer.user_id) == [20]
    assert outer.purchase_ts.isna().all()


def test_stream_stream_right_outer_emits_expired_purchase(spark, tmp_path):
    """rightOuter: the symmetric state-bounding direction — an early
    unmatched PURCHASE emits with NULL click columns once sealed."""
    import time as _time

    from pandarallel_spark.streaming import stream_stream_interval_join

    src = str(tmp_path / "ev_router")
    base = pd.Timestamp("2024-01-01")

    def mk(rows):
        return pd.DataFrame({
            "event_id": pd.array([r[0] for r in rows], dtype="int64"),
            "user_id": pd.array([r[1] for r in rows], dtype="int64"),
            "event_type": [r[2] for r in rows],
            "ts": [base + pd.Timedelta(minutes=r[3]) for r in rows],
        })

    batches = [
        mk([(1, 10, "click", 0), (2, 10, "purchase", 30),
            (3, 20, "purchase", 5)]),                     # unmatched purchase
        mk([(4, 30, "click", 24 * 60), (5, 30, "purchase", 24 * 60 + 10)]),
        mk([(6, 40, "purchase", 48 * 60)]),               # late, never sealed
    ]
    for b in batches:
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    q = (
        stream_stream_interval_join(
            spark, src, within="1 hour", watermark="1 hour",
            join_type="rightOuter", read_options={"maxFilesPerTrigger": 1},
        )
        .writeStream.format("memory")
        .queryName("ssj_router")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_router"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ssj_router").toPandas()
    inner = got[got.click_id.notna()]
    outer = got[got.click_id.isna()]
    assert sorted(inner.user_id) == [10, 30]
    assert list(outer.user_id) == [20]   # expired; u40 still buffered
    assert outer.click_ts.isna().all()


def test_stream_stream_full_outer_union_of_directions(spark, tmp_path):
    """fullOuter = both expiry directions at once: sealed unmatched
    rows from EITHER side emit with the other side NULL, user_id
    coalesced across sides."""
    import time as _time

    from pandarallel_spark.streaming import stream_stream_interval_join

    src = str(tmp_path / "ev_fouter")
    base = pd.Timestamp("2024-01-01")

    def mk(rows):
        return pd.DataFrame({
            "event_id": pd.array([r[0] for r in rows], dtype="int64"),
            "user_id": pd.array([r[1] for r in rows], dtype="int64"),
            "event_type": [r[2] for r in rows],
            "ts": [base + pd.Timedelta(minutes=r[3]) for r in rows],
        })

    batches = [
        mk([(1, 10, "click", 0), (2, 10, "purchase", 30),
            (3, 20, "click", 5), (4, 21, "purchase", 6)]),  # one orphan each side
        mk([(5, 30, "click", 24 * 60), (6, 30, "purchase", 24 * 60 + 10)]),
        mk([(7, 40, "click", 48 * 60)]),
    ]
    for b in batches:
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    q = (
        stream_stream_interval_join(
            spark, src, within="1 hour", watermark="1 hour",
            join_type="fullOuter", read_options={"maxFilesPerTrigger": 1},
        )
        .writeStream.format("memory")
        .queryName("ssj_fouter")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_fouter"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ssj_fouter").toPandas()
    inner = got[got.click_id.notna() & got.purchase_id.notna()]
    left_orphans = got[got.purchase_id.isna()]
    right_orphans = got[got.click_id.isna()]
    assert sorted(inner.user_id) == [10, 30]
    assert list(left_orphans.user_id) == [20]   # sealed unmatched click
    assert list(right_orphans.user_id) == [21]  # sealed unmatched purchase
    assert got.user_id.notna().all()            # coalesced across sides


def test_streaming_heavy_hitters_envelope_and_state_bound(spark, tmp_path):
    """r9: Misra-Gries in keyed state — the final snapshot per key must
    satisfy the MG envelope lower <= exact <= lower + decr against the
    exact batch counts, every truly-frequent key must survive when its
    count exceeds its bucket's decrement, state stays bounded at
    capacity per bucket, and a second wave of files accumulates
    cumulatively through the checkpoint."""
    import numpy as np
    import pandas as pd

    from pandarallel_spark.streaming import streaming_heavy_hitters

    rng = np.random.default_rng(4)
    # skewed: a few hot users + a long tail, split into two waves
    hot = np.repeat([f"u{i}" for i in range(5)], 400)
    tail = [f"t{i}" for i in rng.integers(0, 2000, 3000)]
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    pdf = pd.DataFrame({"user": vals})
    half = len(pdf) // 2
    src = str(tmp_path / "hh_src")
    chk = str(tmp_path / "hh_chk")
    sink = str(tmp_path / "hh_sink")  # parquet: checkpoint-recoverable
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(src)

    def run_wave():
        stream = spark.readStream.schema("user string").parquet(src)
        out = streaming_heavy_hitters(stream, "user", capacity=64, n_buckets=8)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        snap = spark.read.parquet(sink).toPandas()
        # the LATEST state per bucket = rows at its max n_seen (the
        # operator's recency handle); older snapshots are stale by design
        latest = snap[
            snap.n_seen == snap.groupby("bucket").n_seen.transform("max")
        ]
        return latest.set_index("key")

    got1 = run_wave()
    # second wave appends; state carries over via the checkpoint
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        src, mode="append"
    )
    got = run_wave()

    exact = pdf.user.value_counts()
    # envelope per surviving candidate
    for k, row in got.iterrows():
        true = int(exact.get(k, 0))
        assert row.lower_bound <= true <= row.lower_bound + row.decr, (
            k, row.lower_bound, row.decr, true
        )
    # the hot users (400 each) dominate any bucket's decrement at this
    # capacity and must all survive with tight bounds
    for i in range(5):
        assert f"u{i}" in got.index, f"u{i} evicted"
        assert got.loc[f"u{i}"].lower_bound + got.loc[f"u{i}"].decr >= 400
    # state bound: no bucket ever holds more than capacity candidates
    per_bucket = got.reset_index().groupby("bucket").size()
    assert (per_bucket <= 64).all()
    # wave 2 snapshots strictly dominate wave 1 for the hot keys
    for i in range(5):
        if f"u{i}" in got1.index:
            assert got.loc[f"u{i}"].lower_bound >= got1.loc[f"u{i}"].lower_bound


def test_streaming_heavy_hitters_emit_modes(spark, tmp_path):
    """r10 (r9 verdict task 7): delta emission. 'changed' rows applied
    as an upsert (delete on the -1 tombstone) reconstruct EXACTLY the
    snapshot mode's latest state; 'topk' emits at most top_k rows per
    bucket per batch. Two micro-batches (maxFilesPerTrigger=1) with a
    small capacity force trims, so tombstones are exercised."""
    import numpy as np
    import pandas as pd

    from pandarallel_spark.streaming import streaming_heavy_hitters

    rng = np.random.default_rng(9)
    hot = np.repeat(["h0", "h1", "h2"], 150)
    tail = [f"t{i}" for i in rng.integers(0, 300, 800)]
    w1 = pd.DataFrame({"user": np.concatenate([hot, tail[:400]])})
    w2 = pd.DataFrame({"user": np.concatenate([hot, tail[400:]])})
    w3 = pd.DataFrame({"user": ["h0"] * 50})  # stable batch: one key moves
    src = str(tmp_path / "em_src")
    spark.createDataFrame(w1).coalesce(1).write.parquet(src)
    spark.createDataFrame(w2).coalesce(1).write.parquet(src, mode="append")
    spark.createDataFrame(w3).coalesce(1).write.parquet(src, mode="append")

    def run(mode, **kw):
        stream = (
            spark.readStream.schema("user string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = streaming_heavy_hitters(
            stream, "user", capacity=8, n_buckets=4, emit=mode, **kw
        )
        sink = str(tmp_path / f"em_sink_{mode}")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / f"em_chk_{mode}"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).toPandas()

    snap = run("snapshot")
    latest = snap[snap.n_seen == snap.groupby("bucket").n_seen.transform("max")]
    want = {
        (r.bucket, r.key): (r.lower_bound, r.decr) for _, r in latest.iterrows()
    }

    chg = run("changed")
    # the delta contract, shown on the stable third batch: only h0
    # moved, so its bucket's final changed-emission is ONE row where the
    # snapshot re-emits the whole candidate list. (Trim-heavy batches
    # legitimately emit MORE than a snapshot — every count shifts plus
    # tombstones — the mode buys its savings exactly when state is
    # stable, which is the long-running steady state.)
    h0_bucket = int(snap[snap.key == "h0"].bucket.iloc[0])
    sb = snap[snap.bucket == h0_bucket]
    cb = chg[chg.bucket == h0_bucket]
    snap_last = sb[sb.n_seen == sb.n_seen.max()]
    chg_last = cb[cb.n_seen == cb.n_seen.max()]
    assert len(chg_last) == 1 and chg_last.key.iloc[0] == "h0"
    assert len(snap_last) > 1
    rebuilt = {}
    for _, r in chg.sort_values(["bucket", "n_seen"]).iterrows():
        if r.lower_bound == -1:
            rebuilt.pop((r.bucket, r.key), None)
        else:
            rebuilt[(r.bucket, r.key)] = (r.lower_bound, r.decr)
    assert rebuilt == want
    # trim-batch contract: a batch that moved a bucket's decr re-emits
    # that bucket's WHOLE candidate list (every surviving row's error
    # envelope true ≤ lower + decr changed, even counts a trim left
    # coincidentally equal), so it must match the snapshot run's full
    # set at the same (bucket, n_seen). Same data, same per-bucket
    # arrival order → the runs are state-identical batch for batch.
    prev_decr: dict = {}
    saw_trim_batch = False
    for (b, ns), grp in chg.sort_values("n_seen").groupby(["bucket", "n_seen"]):
        live = set(grp[grp.lower_bound != -1].key)
        d = int(grp.decr.iloc[0])
        if d != prev_decr.get(b, 0):
            saw_trim_batch = True
            snap_set = set(snap[(snap.bucket == b) & (snap.n_seen == ns)].key)
            assert live == snap_set, (b, ns)
        prev_decr[b] = d
    assert saw_trim_batch  # capacity=8 under 300 tail keys must trim

    tk = run("topk", top_k=3)
    per_batch = tk.groupby(["bucket", "n_seen"]).size()
    assert (per_batch <= 3).all()
    # the head keys with the highest bounds are all present
    head = {k for k, _ in sorted(want.items(), key=lambda kv: -kv[1][0])[:3]}
    assert {(r.bucket, r.key) for _, r in tk.iterrows()} >= head

    with pytest.raises(ValueError, match="top_k"):
        streaming_heavy_hitters(
            spark.readStream.schema("user string").parquet(src),
            "user", emit="topk",
        )
    with pytest.raises(ValueError, match="emit"):
        streaming_heavy_hitters(
            spark.readStream.schema("user string").parquet(src),
            "user", emit="deltas",
        )
