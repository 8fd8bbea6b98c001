"""KLL quantile sketches + Theta set sketches (operators/sketches.py)
— the remaining two mergeable summaries next to relational.py's HLL
and Misra-Gries. Load-bearing invariants:

- EXACT regime: below k (KLL) / 2^lg_k (Theta) distinct values the
  sketches store everything, so quantiles and set estimates must equal
  exact computations — a hard differential, not a tolerance check;
- merge == whole-build (the mergeable-summaries contract);
- past the exact regime, KLL rank error stays inside the published
  ~1.65/√k envelope and Theta estimates inside a few RSE;
- type dispatch and mixed-family refusal.

Reference frame: Karnin/Lang/Liberty FOCS'16 (KLL); Agarwal et al.
PODS'12 (mergeable summaries); the reference repo (pandarallel) has no
sketch surface.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.sketches import (
    corpus_overlap,
    quantile_sketch_merge,
    quantile_sketch_rollup,
    theta_rollup,
    theta_rollup_merge,
)


def test_kll_exact_regime_and_merge_equals_whole_build(spark):
    """Each (day, source) slice holds < k values, so per-key sketches
    are exact; merging day-level partials up to source level must give
    the EXACT quantiles of the union — the persisted-partials backfill
    story, differentially checked against numpy on the raw data."""
    rng = np.random.default_rng(5)
    # 4 days x 2 sources x 60 values = 480 total — below k=1024 at
    # EVERY merge level, so no sketch ever compacts and the quantiles
    # are exact by the KLL contract (exactness ends at first
    # compaction, which the per-source 240 and global 480 never reach)
    rows = [
        (d, s, int(v))
        for d in range(4)
        for s in ("web", "books")
        for v in rng.integers(0, 10_000, size=60)
    ]
    df = spark.createDataFrame(rows, "day int, source string, n_tokens long")
    partials = quantile_sketch_rollup(df, ["day", "source"], "n_tokens", k=1024)
    assert set(partials.columns) == {
        "day", "source", "n_tokens_kll", "n_tokens_kll_dtype"
    }

    merged = quantile_sketch_merge(
        partials, ["source"], "n_tokens_kll", quantiles=[0.5, 0.9, 0.999]
    )
    got = {r["source"]: r for r in merged.collect()}
    by_source = {}
    for d, s, v in rows:
        by_source.setdefault(s, []).append(v)
    for s, vals in by_source.items():
        arr = np.sort(np.array(vals))
        assert got[s]["n"] == len(vals)
        # DataSketches KLL quantile rule (inclusive): smallest item
        # whose normalized rank >= q
        for q, colname in [(0.5, "p50"), (0.9, "p90"), (0.999, "p99_9")]:
            idx = int(np.ceil(q * len(arr))) - 1
            assert got[s][colname] == int(arr[max(idx, 0)]), (s, q)

    # global rollup (keys=[]) over the same partials
    g = quantile_sketch_merge(
        partials, [], "n_tokens_kll", quantiles=[0.5]
    ).collect()[0]
    allv = np.sort(np.array([v for _, _, v in rows]))
    assert g["n"] == len(allv)
    assert g["p50"] == int(allv[int(np.ceil(0.5 * len(allv))) - 1])


def test_kll_rank_error_envelope_past_exact_regime(spark):
    """1e5 values through a k=200 sketch: the returned p50/p95 must sit
    within the published ~1.65/√k normalized-rank envelope (±~1.2%,
    asserted at a safe 3%) of the true ranks."""
    rng = np.random.default_rng(11)
    vals = rng.normal(loc=1000.0, scale=100.0, size=100_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    partials = quantile_sketch_rollup(df, [], "x", k=200)
    out = quantile_sketch_merge(
        partials, [], "x_kll", quantiles=[0.5, 0.95]
    ).collect()[0]
    srt = np.sort(vals)
    for q, col in [(0.5, "p50"), (0.95, "p95")]:
        true_rank = np.searchsorted(srt, out[col]) / len(srt)
        assert abs(true_rank - q) < 0.03, (q, out[col], true_rank)


def test_kll_type_dispatch_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 1.5, "a")], "i long, d double, s string"
    )
    pi = quantile_sketch_rollup(df, [], "i")
    pd_ = quantile_sketch_rollup(df, [], "d")
    assert pi.collect()[0]["i_kll_dtype"] == "bigint"
    assert pd_.collect()[0]["d_kll_dtype"] == "double"
    with pytest.raises(TypeError, match="numeric"):
        quantile_sketch_rollup(df, [], "s")
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        quantile_sketch_merge(pi, [], "i_kll", quantiles=[1.5])
    with pytest.raises(ValueError, match="dtype="):
        quantile_sketch_merge(pi.drop("i_kll_dtype"), [], "i_kll", [0.5])
    # mixed families refuse instead of decoding garbage
    mixed = pi.select(
        F.col("i_kll").alias("k"), F.col("i_kll_dtype").alias("k_dtype")
    ).unionByName(
        pd_.select(
            F.col("d_kll").alias("k"), F.col("d_kll_dtype").alias("k_dtype")
        )
    )
    with pytest.raises(ValueError, match="mix KLL families"):
        quantile_sketch_merge(mixed, [], "k", [0.5])
    # ADVICE r12: EXPLICIT dtype with a present-but-mismatched pin
    # column fails lazily with the named error, not a JVM
    # deserialization fault — and a MATCHING pin passes through
    from pyspark.errors import SparkRuntimeException

    bad = quantile_sketch_merge(mixed, [], "k", [0.5], dtype="bigint")
    with pytest.raises(SparkRuntimeException, match="binary-incompatible"):
        bad.collect()
    ok = quantile_sketch_merge(pi, [], "i_kll", [0.5], dtype="bigint")
    assert ok.collect()[0]["p50"] == 1
    # strictLazy: the family probe is gated; explicit dtype skips it
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="quantile_sketch_merge"):
            quantile_sketch_merge(pi, [], "i_kll", [0.5])
        lazy = quantile_sketch_merge(pi, [], "i_kll", [0.5], dtype="bigint")
        assert "p50" in lazy.columns  # plan built, nothing ran
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_theta_exact_regime_rollup_and_overlap(spark):
    """Below 2^lg_k distinct values Theta sketches are exact: per-key
    rollups equal exact COUNT(DISTINCT), and corpus_overlap recovers
    the exact set algebra of two corpora including Jaccard."""
    rows_a = [(i % 3, f"doc{i}") for i in range(600)]
    a = spark.createDataFrame(rows_a, "src int, fp string")
    partials = theta_rollup(a, ["src"], "fp")
    est = {
        r["src"]: r["fp_theta_estimate"]
        for r in theta_rollup_merge(partials, ["src"], "fp_theta").collect()
    }
    exact = {
        r["src"]: r["n"]
        for r in a.groupBy("src")
        .agg(F.countDistinct("fp").alias("n"))
        .collect()
    }
    assert {k: round(v) for k, v in est.items()} == exact
    total = theta_rollup_merge(partials, [], "fp_theta").collect()[0]
    assert round(total["fp_theta_estimate"]) == 600

    # overlap: A = 0..599, B = 400..899 → |A∩B| = 200, |A∪B| = 900
    b = spark.createDataFrame(
        [(f"doc{i}",) for i in range(400, 900)], "fp string"
    )
    ov = corpus_overlap(a, b, "fp").collect()[0]
    assert round(ov["n_a"]) == 600 and round(ov["n_b"]) == 500
    assert round(ov["n_intersection"]) == 200
    assert round(ov["n_union"]) == 900
    assert round(ov["n_only_a"]) == 400 and round(ov["n_only_b"]) == 300
    assert ov["jaccard"] == pytest.approx(200 / 900, abs=1e-9)


def test_theta_estimate_tolerance_past_exact_regime(spark):
    """1e5 distinct fingerprints through lg_k=12 sketches: estimates
    must sit within a few RSE (1.6% at lg_k=12; asserted at 8%) and
    the overlap fractions must still be usable for planning."""
    n = 100_000
    a = spark.range(n).select(F.concat(F.lit("d"), "id").alias("fp"))
    b = spark.range(n // 2, n + n // 2).select(
        F.concat(F.lit("d"), "id").alias("fp")
    )
    ov = corpus_overlap(a, b, "fp", lg_k=12).collect()[0]
    assert ov["n_a"] == pytest.approx(n, rel=0.08)
    assert ov["n_intersection"] == pytest.approx(n / 2, rel=0.08)
    assert ov["jaccard"] == pytest.approx(1 / 3, rel=0.12)

    # plan shape: one aggregate per side + a broadcast 1x1 join — the
    # corpora are never shuffled
    plan = corpus_overlap(a, b, "fp")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
