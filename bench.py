#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (r4, hardened r13): headline queries run min-of-2 with a
System.gc() between, in one shared session (they are JVM-side plans;
shared-session effects measured <±10% run-over-run); a query whose two
draws disagree >1.5x gets a third and reports the min of all three,
and a fixed driver-side CPU canary timed between queries stamps
``contended`` into the record when a slow window (spread vs the run's
median) or a uniformly slow run (median vs an absolute bar derived
from the newest clean recorded anchor — ``canary_bar_source`` names
it) shows up (r12's driver record was silently ~26% inflated by
exactly that), or — r14 — when a PARALLEL canary (cpu_count()
concurrent sha256 loops) runs slow relative to the single-thread one:
host-level core oversubscription (steal) slows 32-wide Spark stages
~3x while a single busy thread still schedules, which once produced a
94 s contended=false record on a 33-36 s clean band; a query whose
tiebreak draw still disagrees >1.5x is
named in ``suspect_queries`` (bursts inside one query window are
invisible to between-query canaries). The vs-pandas ratio section runs
each BASELINE.md workload in its OWN fresh-JVM subprocess: Python-UDF
workloads measurably pollute reused Python workers for everything after
them (applymap measured 0.85 s clean vs 1.6 s after a row-apply in the
same session), and the reference itself forks a fresh worker pool per
call — per-workload isolation is the apples-to-apples comparison, and
it makes round-over-round deltas mean something. Run the bench alone:
concurrent Spark sessions skew every number.
"""

from __future__ import annotations

import json
import os
import statistics
import time

from pandarallel_spark.session import get_spark
from pandarallel_spark.workload import REGISTRY, queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: grows as operators land; keep it ≤ ~10 so the round bench
# stays fast. Fallback: everything registered.
HEADLINE = [
    "groupby_agg_pricing_summary",
    "groupby_apply_pricing_summary",
    "row_apply_disc_price",
    "grouped_rolling_sum",
    "series_map_dict",
    "text_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_topk",
    "similarity_lsh_bucketed",
    "similarity_ivf_topk",
    "join_revenue_per_nation",
    "events_windows_tumbling_sliding",
    "global_asof_purchase_before_click",
    "rolling_corr_qty_price",
    "events_sessionize_30m",
    "time_rolling_purchase_cents_1h",
    "text_bpe_tokens",
    "corpus_cleanup_pipeline",
    "embedding_cosine_pairs",
    "decontaminate_ngram_hits",
    "dedup_substring_spans",
    "text_repetition",
    "bm25_topk",
]


def _ratio_workloads() -> dict:
    """BASELINE.md's 8 reference workloads (+1 engine extra), each a
    setup() producing (pandas_call, spark_build) given a spark_input
    helper. Sizes are scaled down from the notebook's (1e6-5e7) to keep
    the pandas side bounded; every workload is linear in rows
    (expanding: per-group quadratic, scaled likewise), so the ratio is
    size-stable once past Spark's fixed overhead. Data is regenerated
    per workload from a fixed seed — deterministic across rounds."""
    import math

    import numpy as np
    import pandas as pd

    from pandarallel_spark import parallelize

    wl = {}

    def workload(name):
        def deco(fn):
            wl[name] = fn
            return fn
        return deco

    # 1. df.parallel_apply(axis=1): sin(a²)+sin(b²) — notebook cells 4-7
    @workload("row_apply_vs_pandas")
    def w_row_apply(spark_input):
        rng = np.random.default_rng(0)
        n = 500_000
        pdf = pd.DataFrame({"a": rng.integers(1, 8, n), "b": rng.random(n)})
        func = lambda row: math.sin(row.a**2) + math.sin(row.b**2)  # noqa: E731
        sdf = spark_input(pdf, "row_apply")
        return (
            lambda: pdf.apply(func, axis=1),
            lambda: parallelize(sdf).parallel_apply(
                func, axis=1, schema="a bigint, b double, result double"
            ),
        )

    # 2. df.parallel_applymap: sin(x²)-cos(x²) per cell — cells 10-13
    @workload("applymap_vs_pandas")
    def w_applymap(spark_input):
        rng = np.random.default_rng(1)
        n = 4_000_000
        pdf = pd.DataFrame({"a": rng.random(n), "b": rng.random(n)})
        mfunc = lambda x: math.sin(x**2) - math.cos(x**2)  # noqa: E731
        sdf = spark_input(pdf, "applymap")
        return (
            lambda: pdf.map(mfunc),
            lambda: parallelize(sdf).parallel_applymap(mfunc),
        )

    # 3. groupby.parallel_apply — cells 16-19: python math loop per
    # group. 16M rows: the Spark side carries ~3s of fixed shuffle/Arrow
    # cost, so smaller sizes understate the ratio (8M measured 1.98×
    # vs 2.6-2.7× here) — the pandas side's ~16s/draw is the price of
    # measuring the operator, not its overhead. At this size the r6
    # driver recorded 2.67×, and the two clean full-bench runs in
    # SURVEY.md's r6 ratio-stability note measured 2.31× / 2.48× —
    # all clear of the ≥2.0× bar.
    @workload("groupby_apply_vs_pandas")
    def w_groupby(spark_input):
        rng = np.random.default_rng(2)
        n = 16_000_000
        pdf = pd.DataFrame({"a": rng.integers(0, 3000, n), "b": rng.random(n)})

        def gfunc(g):
            return sum(math.log10(math.sqrt(math.exp(x**2))) for x in g.b)

        sdf = spark_input(pdf, "groupby_apply")
        return (
            lambda: pdf.groupby("a")[["b"]].apply(gfunc),
            lambda: parallelize(sdf).groupby("a").parallel_apply(
                gfunc, schema="a bigint, result double", mode="scalar"
            ),
        )

    # 4. groupby rolling(4).parallel_apply — cells 22-25: polynomial of
    # the 4 window values. 4M rows: at 2M the fixed shuffle/Arrow floor
    # was most of the Spark measurement (1.1 s of 1.19 s at 4M — the
    # extra 2M rows cost ~0.1 s) and capped the ratio at ~2.2.
    @workload("grouped_rolling_vs_pandas")
    def w_grouped_rolling(spark_input):
        rng = np.random.default_rng(3)
        n = 4_000_000
        pdf = pd.DataFrame(
            {"idx": np.arange(n), "a": rng.integers(0, 300, n), "b": rng.random(n)}
        )
        wfunc = lambda x: x[0] + x[1] ** 2 + x[2] ** 3 + x[3] ** 4  # noqa: E731
        sdf = spark_input(pdf, "grouped_rolling")
        return (
            lambda: pdf.groupby("a").b.rolling(4).apply(wfunc, raw=True),
            lambda: parallelize(sdf, order_by="idx")
            .groupby("a")
            .series("b")
            .rolling(4)
            .parallel_apply(wfunc, raw=True, output_col="r"),
        )

    # 5. groupby expanding(4).parallel_apply — cells 28-31 (per-group
    # quadratic: prefix arrays grow with group size)
    @workload("grouped_expanding_vs_pandas")
    def w_grouped_expanding(spark_input):
        rng = np.random.default_rng(4)
        n = 1_000_000
        pdf = pd.DataFrame(
            {"idx": np.arange(n), "a": rng.integers(0, 300, n), "b": rng.random(n)}
        )
        efunc = lambda x: float(np.sum(x)) / len(x)  # noqa: E731
        sdf = spark_input(pdf, "grouped_expanding")
        return (
            lambda: pdf.groupby("a").b.expanding(4).apply(efunc, raw=True),
            lambda: parallelize(sdf, order_by="idx")
            .groupby("a")
            .series("b")
            .expanding(4)
            .parallel_apply(efunc, raw=True, output_col="r"),
        )

    # 6. series.parallel_map (callable) — cells 34-37
    @workload("series_map_vs_pandas")
    def w_series_map(spark_input):
        rng = np.random.default_rng(5)
        n = 5_000_000
        pdf = pd.DataFrame({"x": rng.random(n) + 1})
        sfunc = lambda x: math.log10(math.sqrt(math.exp(x**2)))  # noqa: E731
        sdf = spark_input(pdf, "series_map")
        return (
            lambda: pdf.x.map(sfunc),
            lambda: parallelize(sdf).series("x").parallel_map(
                sfunc, return_type="double"
            ),
        )

    # 7. series.parallel_apply — cells 40-43 (same func, args form)
    @workload("series_apply_vs_pandas")
    def w_series_apply(spark_input):
        rng = np.random.default_rng(6)
        n = 8_000_000
        pdf = pd.DataFrame({"x": rng.random(n) + 1})
        sfunc = lambda x: math.log10(math.sqrt(math.exp(x**2)))  # noqa: E731
        sdf = spark_input(pdf, "series_apply")
        return (
            lambda: pdf.x.apply(sfunc),
            lambda: parallelize(sdf).series("x").parallel_apply(
                sfunc, return_type="double"
            ),
        )

    # 8. series.rolling(4).parallel_apply — cells 46-49: GLOBAL ordered
    # rolling; runs the range-bucket halo plan (operators/window.py):
    # boundary/context extraction at plan build (memoized), then ONE
    # exec job — for slot-arithmetic UDFs like this one a pure-JVM
    # bucketed window expression, no Python workers in the hot path.
    # The operator caches no DATA between runs (the memo holds plan
    # fragments — literal boundaries, a few hundred context rows — not
    # results), so every measured run recomputes from parquet. 8M rows
    # (like series_apply; groupby uses 16M): at 4M the fixed shuffle
    # floor (~0.75 s) was ~60% of the measurement and capped the ratio
    # at ~2.3 despite a ~4.6× marginal-throughput ratio (measured
    # 4M→12M: +0.78 s Spark per +3.6 s pandas).
    @workload("series_rolling_vs_pandas")
    def w_series_rolling(spark_input):
        rng = np.random.default_rng(7)
        n = 8_000_000
        pdf = pd.DataFrame({"idx": np.arange(n), "x": rng.random(n)})
        wfunc = lambda x: x[0] + x[1] ** 2 + x[2] ** 3 + x[3] ** 4  # noqa: E731
        sdf = spark_input(pdf, "series_rolling")
        return (
            lambda: pdf.x.rolling(4).apply(wfunc, raw=True),
            lambda: parallelize(sdf, order_by="idx")
            .series("x")
            .rolling(4)
            .parallel_apply(wfunc, raw=True, output_col="r"),
        )

    # --- engine extra (NOT a reference row): row apply with a
    # pure-arithmetic UDF, where the express-or-fallback layer
    # (operators/_vectorize.py) evaluates the UDF once per batch instead
    # of per row. The reference's math.*-based workloads above fall back
    # to the stock loop by design; this shows the fast path's headroom.
    @workload("row_apply_arith_vs_pandas")
    def w_row_apply_arith(spark_input):
        rng = np.random.default_rng(8)
        n = 500_000
        pdf = pd.DataFrame({"a": rng.integers(1, 8, n), "b": rng.random(n)})
        afunc = lambda row: row.a * 2 + row.b / 3 - 1  # noqa: E731
        sdf = spark_input(pdf, "row_apply_arith")
        return (
            lambda: pdf.apply(afunc, axis=1),
            lambda: parallelize(sdf).parallel_apply(
                afunc, axis=1, schema="a bigint, b double, result double"
            ),
        )

    return wl


def _measure_ratio(spark, setup) -> dict:
    """INTERLEAVED per-pair ratio (r8). The r7 design measured all Spark
    draws, then all pandas draws, and guarded only against variance
    BETWEEN draws of the same engine — so contention that slowed the
    whole measurement window roughly uniformly (r7: the driver's box ran
    ~1.7x slow for minutes; every same-engine pair "agreed" and two
    false bar misses were recorded) sailed through. Here the engines
    alternate — spark, pandas, pandas, spark, spark, pandas, … — and the
    reported ratio is the MEDIAN of per-pair ratios (pandas_i/spark_i
    from back-to-back draws): a common-mode slowdown hits both members
    of a pair and cancels in the quotient instead of landing on
    whichever engine drew during the bad minutes. Pair order alternates
    so a monotone contention ramp inside the window biases half the
    pairs each way and the median sheds it.

    Spark side gets one warm build first (Python-worker / Arrow /
    codegen startup — BASELINE.md excludes fixed overhead), a
    System.gc() before each draw, and executes via noop-format writes
    (full compute, no result materialization). 3 pairs minimum — this
    box's single-core speed measurably flips ~1.7x within seconds, and
    a flip landing BETWEEN the two draws of one pair skews that pair;
    the median of 3 sheds one such pair. When no two pair ratios agree
    within 1.3x, keep drawing up to 6 pairs — the median reports the
    workload either way, and ``contended`` flags a spread that outlived
    the budget. Returns every raw draw so the full record (written to
    BENCH_LOCAL.json by the parent) carries variance bands."""
    import atexit
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_ratio_")
    # r13: these dirs (60-150 MB of ratio-workload parquet each) used
    # to leak — 171 of them (~10 GB) had accumulated across rounds
    atexit.register(shutil.rmtree, tmp, True)

    def spark_input(pdf, name):
        # parquet-backed input — the engine's native path (vectorized
        # scan), not a row-serialized .cache() whose deserialization
        # would dominate the measurement. 32 files → full parallelism.
        path = f"{tmp}/{name}"
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    pandas_call, build = setup(spark_input)
    build().write.format("noop").mode("overwrite").save()  # warm

    def draw_spark() -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        d = round(time.perf_counter() - t0, 4)
        spark_draws.append(d)
        return d

    def draw_pandas() -> float:
        t0 = time.perf_counter()
        pandas_call()
        d = round(time.perf_counter() - t0, 4)
        pandas_draws.append(d)
        return d

    spark_draws: list[float] = []
    pandas_draws: list[float] = []
    pair_ratios: list[float] = []

    def draw_pair(i: int) -> None:
        if i % 2 == 0:
            s = draw_spark()
            p = draw_pandas()
        else:
            p = draw_pandas()
            s = draw_spark()
        pair_ratios.append(round(p / s, 4))

    def steady() -> bool:
        # some two pair-ratios agree within 1.3x — enough for the
        # median to sit on consistent evidence
        rs = sorted(pair_ratios)
        return any(hi <= 1.3 * lo for lo, hi in zip(rs, rs[1:]))

    for i in range(3):
        draw_pair(i)
    while not steady() and len(pair_ratios) < 6:
        draw_pair(len(pair_ratios))
    return {
        "ratio": round(float(statistics.median(pair_ratios)), 2),
        "pair_ratios": pair_ratios,
        "spark_draws": spark_draws,
        "pandas_draws": pandas_draws,
        "contended": not steady(),
    }


def _ratio_child_main(name: str) -> None:
    """Child-process entry: ONE ratio workload in a fresh JVM."""
    spark = get_spark(f"bench_ratio_{name}")
    setup = _ratio_workloads()[name]
    m = _measure_ratio(spark, setup)
    print(json.dumps({name: m["ratio"], "_bands": {name: m}}))


def _warm(spark, sf_dir: str) -> None:
    # warm-up: session + parquet footer reads + Python worker pool +
    # Arrow serializer paths (BASELINE.md excludes fixed startup
    # overhead; without this the first Python-UDF query pays ~1-2 s of
    # worker fork/import that no steady-state run would see)
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.count()
    warm.limit(32 * 64).repartition(32).mapInPandas(
        lambda it: it, warm.schema
    ).count()


# driver-side contention canary (r13, the r12 verdict's "headline
# draws have no contention guard" task): a fixed ~150-250 ms
# single-thread CPU job (sha256 over a constant buffer) timed between
# queries. Its absolute time is calibration-free noise; its SPREAD
# within one run is the signal — on an idle box consecutive canaries
# agree within a few %, while the contended r12 driver box ran 2-3×
# slow for minutes at a time. The headline record can now self-report
# that it is dirty instead of presenting phantom regressions as data.
_CANARY_REPS = 40
_CANARY_SPREAD_BAR = 2.0
# absolute second trigger: a UNIFORMLY loaded run has no slow window
# for the spread to catch (max/median ≈ 1 when every draw is equally
# slow), so the median itself is checked against an absolute bar.
# r14 (the r13 verdict's calibration finding): the fixed 0.45 s value
# was ~3.7× this box's observed idle median (0.123-0.125 s across
# every recorded run), so a uniform ~3× slowdown would have passed.
# The bar is now DERIVED from the recorded history — 1.5× the newest
# prior record's canary_median_sec anchor (BENCH_r*.json, preferring
# records that were themselves clean) — and 0.45 s remains only the
# no-history fallback. SPARK_GRAFT_CANARY_BAR (seconds) overrides both
# for foreign hardware (ADVICE r13: on a slower box every record would
# otherwise flag, on a faster one uniform load could hide).
_CANARY_MEDIAN_BAR_FALLBACK_SEC = 0.45
_CANARY_ANCHOR_FACTOR = 1.5


def _canary_median_bar() -> tuple[float, str]:
    """(bar_seconds, source) — env override, else 1.5× the MINIMUM
    recorded clean anchor, else the absolute fallback. Minimum, not
    newest (r15, the r14 verdict's ratchet finding): a record that was
    mildly contaminated yet passed the then-current bar would, as the
    newest anchor, LOOSEN the detector that should have caught it;
    the minimum across clean records only ever ratchets tighter. The
    source string is recorded next to the verdict so every record
    names what its contended flag was judged against."""
    env = os.environ.get("SPARK_GRAFT_CANARY_BAR")
    if env:
        return float(env), "env:SPARK_GRAFT_CANARY_BAR"
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[float, str] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as fh:
                rec = json.load(fh)
            # driver records may nest the parsed summary
            if "canary_median_sec" not in rec and isinstance(
                rec.get("parsed"), dict
            ):
                rec = rec["parsed"]
            anchor = rec.get("canary_median_sec")
            if anchor is None or rec.get("contended") is not False:
                continue
            if best is None or float(anchor) < best[0]:
                best = (float(anchor), os.path.basename(path))
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            continue
    if best is not None:
        return (
            round(_CANARY_ANCHOR_FACTOR * best[0], 4),
            f"anchor:min-clean:{best[1]} x{_CANARY_ANCHOR_FACTOR}",
        )
    return _CANARY_MEDIAN_BAR_FALLBACK_SEC, "fallback:absolute"


def _canary_draw(buf: bytes = b"\xa5" * (4 << 20)) -> float:
    import hashlib

    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(_CANARY_REPS):
        h.update(buf)
    h.digest()
    return round(time.perf_counter() - t0, 4)


# r14 (second measurement gap, found the hard way): the single-thread
# canary CANNOT see host-level core oversubscription. A run on this box
# read 94 s total (clean band 33-36 s) with every query uniformly ~3×
# slow, yet contended=false — /proc/stat showed steal time ≈ user time:
# the virtualized host was overcommitted, which slows 32-wide Spark
# stages ~3× while a single busy thread still gets scheduled almost
# normally (canary median 0.178 s vs the 0.187 s bar). The fix is a
# PARALLEL canary: os.cpu_count() threads each doing the same sha256
# loop (hashlib releases the GIL on large buffers, so threads occupy
# real cores). On healthy hardware wall-clock ≈ the single-thread draw
# (ratio ~1-1.5 with SMT); under host steal the ratio tracks the
# oversubscription factor. Flagged against 1.5× the newest clean
# recorded ``canary_mt_ratio`` anchor (same derivation as the median
# bar), fallback 2.5 when no record carries the field yet, env
# override SPARK_GRAFT_CANARY_MT_BAR.
_CANARY_MT_RATIO_BAR_FALLBACK = 2.5
# r15 (the r14 verdict's ratchet finding): BENCH_r14's 32-core record
# carried canary_mt_ratio 2.09 — elevated by host steal, passed only
# via the 2.5 no-history fallback — and as the NEWEST clean anchor it
# would have set the next bar to 3.14: a mildly-stolen record LOOSENING
# the detector built to catch it. The anchor is now the MINIMUM across
# clean records, and additionally clamped into [1.0, 1.3] before the
# 1.5× factor (healthy band on real hardware is ~1-1.5 incl. SMT), so
# the bar lives in [1.5, 1.95] once any clean record exists — r14's
# 2.09 record flags against it.
_CANARY_MT_ANCHOR_CLAMP = (1.0, 1.3)


def _canary_mt_bar() -> tuple[float, str]:
    env = os.environ.get("SPARK_GRAFT_CANARY_MT_BAR")
    if env:
        return float(env), "env:SPARK_GRAFT_CANARY_MT_BAR"
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[float, str] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as fh:
                rec = json.load(fh)
            if "canary_mt_ratio" not in rec and isinstance(
                rec.get("parsed"), dict
            ):
                rec = rec["parsed"]
            anchor = rec.get("canary_mt_ratio")
            if anchor is None or rec.get("contended") is not False:
                continue
            if best is None or float(anchor) < best[0]:
                best = (float(anchor), os.path.basename(path))
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            continue
    if best is not None:
        lo, hi = _CANARY_MT_ANCHOR_CLAMP
        anchor = min(max(best[0], lo), hi)
        return (
            round(_CANARY_ANCHOR_FACTOR * anchor, 4),
            f"anchor:min-clean:{best[1]} clamp[{lo},{hi}] "
            f"x{_CANARY_ANCHOR_FACTOR}",
        )
    return _CANARY_MT_RATIO_BAR_FALLBACK, "fallback:absolute"


def _canary_draw_mt(buf: bytes = b"\xa5" * (4 << 20)) -> float:
    """Wall-clock of ``os.cpu_count()`` concurrent single-draw-sized
    sha256 loops. Thread count follows the BOX (not SPARK_GRAFT_CPUS):
    the question is whether the hardware can deliver its cores, which
    is independent of how many Spark asks for."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    n = os.cpu_count() or 1

    def one(_i: int) -> None:
        h = hashlib.sha256()
        for _ in range(_CANARY_REPS):
            h.update(buf)
        h.digest()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n) as ex:
        list(ex.map(one, range(n)))
    return round(time.perf_counter() - t0, 4)


def _time_queries(
    spark, qs, names: list[str], sf_dir: str
) -> tuple[
    dict[str, float], dict[str, list[float]], dict[str, list[float]], list[str]
]:
    # min-of-2 with a GC between queries: single cold runs of the
    # heavier queries swing 2-4× run-over-run on this box (JVM old-gen
    # debt + codegen compilation landing on whichever query is unlucky),
    # which made round-over-round comparisons meaningless (r3 verdict
    # "uniform drift"). The first run still pays plan build + codegen;
    # the second is steady-state; min reports the query, not its luck.
    # r13: when the two draws disagree >1.5× the query gets a THIRD
    # draw and reports the MIN of all three — one unlucky draw (GC
    # pause, a contention burst landing inside the window) no longer
    # decides anything by itself, and min stays comparable with every
    # prior round's min-based record. Min, not median: a draw can be
    # spuriously SLOW but never spuriously fast, so median-of-3 only
    # adds upward bias — measured +26-38% on queries whose first draw
    # legitimately pays plan build (review finding r13); uniform
    # slowdown across all draws is the canary's job to flag, not a
    # statistic's to hide.
    timings: dict[str, float] = {}
    query_bands: dict[str, list[float]] = {}
    suspects: list[str] = []
    # warm draws (index 0): page the buffer / spawn the thread pool once
    canary_draws: dict[str, list[float]] = {
        "st": [_canary_draw()],
        "mt": [_canary_draw_mt()],
    }
    for name in names:
        # drop the PREVIOUS query's persisted intermediates (several
        # dedup/similarity plans persist candidate sets): accumulated
        # caches turn into old-gen GC debt that lands on whichever
        # heavy query runs next — measured 30-50% run-over-run swings
        # on dedup_minhash_lsh. Within a query's two draws caches stay,
        # matching steady-state reuse.
        spark.catalog.clearCache()
        draws = []
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.count()
            draws.append(round(time.perf_counter() - t0, 4))
        if max(draws) > 1.5 * min(draws):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            draws.append(round(time.perf_counter() - t0, 4))
            if max(draws[1:]) > 1.5 * min(draws[1:]):
                # the two WARM draws disagree: something moved INSIDE
                # this query's windows (which the between-query canary
                # cannot see — ADVICE r13); the min is still reported
                # but the query is named suspect. The cold first draw
                # is excluded — it legitimately pays plan build +
                # codegen and would name half the sf0.01 battery
                suspects.append(name)
        timings[name] = min(draws)
        query_bands[name] = draws
        canary_draws["st"].append(_canary_draw())
        canary_draws["mt"].append(_canary_draw_mt())
    return timings, query_bands, canary_draws, suspects


def _canary_verdict(
    canary_draws: dict[str, list[float]],
    median_bar_sec: float,
    mt_ratio_bar: float,
) -> tuple[bool, float, float, float]:
    """(contended, spread, mt_ratio, mt_median) over the post-warm-up
    draws — index 0 is the page-in/branch-warm draw and would inflate
    the spread into false positives on a genuinely idle box. Spread =
    max/MEDIAN, not max/min: the signal is a SLOW window against the
    run's robust center; one anomalously fast draw (brief CPU turbo)
    must not stamp a clean record dirty (review finding r13). Three
    triggers: a slow window (spread), a uniformly slow single thread
    (median vs the anchored absolute bar), and — r14 — a box that
    cannot deliver its CORES (mt_ratio = parallel canary median /
    single canary median vs its anchored bar): host-level CPU steal
    slows 32-wide Spark stages by the oversubscription factor while a
    single busy thread still schedules, which produced a 94 s
    contended=false record on this box (clean band 33-36 s). Sampling
    limitation (ADVICE r13): canaries run BETWEEN queries, so a burst
    fully contained inside one query's window can leave every canary
    clean — contended=false is necessary, not sufficient; the
    per-query suspect list (3rd draw still >1.5× off) covers that
    gap."""
    live = canary_draws["st"][1:] or canary_draws["st"]
    med = float(statistics.median(live))
    spread = round(max(live) / max(med, 1e-9), 2)
    live_mt = canary_draws["mt"][1:] or canary_draws["mt"]
    med_mt = float(statistics.median(live_mt))
    mt_ratio = round(med_mt / max(med, 1e-9), 2)
    return (
        spread > _CANARY_SPREAD_BAR
        or med > median_bar_sec
        or mt_ratio > mt_ratio_bar
    ), spread, mt_ratio, round(med_mt, 4)


# per-kind attribution for the heavy kind-tagged family rows (r12, the
# r11 verdict's "record the per-kind split" task): these rows execute
# several capability kinds in one union, so a headline delta on the ROW
# doesn't say which kind moved. Filtering on the literal kind tag prunes
# the other union legs (Catalyst folds lit(k)=lit(j) to false and
# PruneFilters empties the leg), so each draw approximates that kind's
# own cost. min-of-1: this is attribution for regression triage, not a
# headline number. Recorded in BENCH_LOCAL.json only.
KIND_SPLIT = {
    "embedding_cosine_pairs": ("batch", "incr_old", "incr_new"),
    "bm25_topk": ("bm25", "rrf"),
    "similarity_ivf_topk": ("ivf", "ivfpq"),
    "text_stats": ("stats", "langid_ct"),  # r13: the row went two-kind
}


def _time_kind_splits(spark, qs, sf_dir: str) -> dict[str, dict[str, float]]:
    from pyspark.sql import functions as F

    out: dict[str, dict[str, float]] = {}
    for name, kinds in KIND_SPLIT.items():
        if name not in qs:
            continue
        for k in kinds:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).filter(F.col("kind") == k).count()
            out.setdefault(name, {})[k] = round(time.perf_counter() - t0, 3)
    return out


# scale-ramp regression gate (r8): sf0.1 holds 10× sf0.01's rows, so a
# LINEAR plan's time ratio sits ≤ 10 — usually well under, because the
# fixed session/plan overhead is a big share of the small-SF draw. The
# generous default catches the failure mode min-of-2 at ONE scale never
# can: an accidentally quadratic plan (ratio → ~100). Queries whose
# OUTPUT is itself superlinear in the corpus (near-dup pair counts grow
# faster than docs) get explicit wider bounds rather than a looser
# global bar.
RAMP_SCALE = 10.0
RAMP_DEFAULT_MAX = 30.0
RAMP_MAX_OVERRIDES = {
    # candidate-pair/self-join outputs scale superlinearly with corpus
    # size by SEMANTICS (10× docs ⇒ up to ~100× same-bucket pairs);
    # bounded here at well under the quadratic ceiling to still catch
    # an unbucketed all-pairs regression
    "dedup_ngram_jaccard": 60.0,
    "dedup_minhash_lsh": 60.0,
    "embedding_cosine_pairs": 60.0,
}


def _ramp_main() -> None:
    """`python bench.py --ramp`: run the headline set at sf0.01 AND
    sf0.1 in one session, report per-query time ratios, exit 1 when a
    query grows faster than the per-query bound. Full table lands in
    BENCH_LOCAL.json under "ramp"; stdout gets one JSON line."""
    qs = queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)
    small = os.environ.get("SPARK_GRAFT_RAMP_SMALL", "/root/testdata/sf0.01")
    big = os.environ.get("SPARK_GRAFT_RAMP_BIG", "/root/testdata/sf0.1")
    spark = get_spark("pandarallel_spark_bench_ramp")
    _warm(spark, small)
    t_small, _, _, _ = _time_queries(spark, qs, names, small)
    _warm(spark, big)
    t_big, _, _, _ = _time_queries(spark, qs, names, big)
    table = {}
    violations = []
    for n in names:
        r = round(t_big[n] / max(t_small[n], 1e-9), 2)
        bound = RAMP_MAX_OVERRIDES.get(n, RAMP_DEFAULT_MAX)
        table[n] = {
            "sec_small": t_small[n],
            "sec_big": t_big[n],
            "ratio": r,
            "max": bound,
        }
        if r > bound:
            violations.append(n)
    out = {
        "metric": "scale_ramp",
        "scale": RAMP_SCALE,
        "small": small,
        "big": big,
        "violations": violations,
        "ramp": {n: v["ratio"] for n, v in table.items()},
    }
    try:
        local_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
        )
        record = {}
        if os.path.exists(local_path):
            with open(local_path) as fh:
                record = json.load(fh)
        record["ramp"] = table
        record["ramp_violations"] = violations
        with open(local_path, "w") as fh:
            json.dump(record, fh, indent=1)
    except (OSError, ValueError):
        pass
    print(json.dumps(out))
    if violations:
        raise SystemExit(1)


def main() -> None:
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "")
    if mode.startswith("ratio:"):
        _ratio_child_main(mode.split(":", 1)[1])
        return
    import sys

    if "--ramp" in sys.argv or os.environ.get("SPARK_GRAFT_BENCH_RAMP") == "1":
        _ramp_main()
        return

    qs = queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)
    spark = get_spark("pandarallel_spark_bench")
    _warm(spark, SF_DIR)
    timings, query_bands, canary_draws, suspects = _time_queries(
        spark, qs, names, SF_DIR
    )
    kind_split = _time_kind_splits(spark, qs, SF_DIR)
    canary_bar, canary_bar_source = _canary_median_bar()
    canary_mt_bar, canary_mt_bar_source = _canary_mt_bar()
    contended, canary_spread, canary_mt_ratio, canary_mt_median = (
        _canary_verdict(canary_draws, canary_bar, canary_mt_bar)
    )

    ratios: dict[str, float] = {}
    ratio_bands: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_RATIOS", "1") != "0":
        # one fresh-JVM child per workload (see module docstring); stop
        # the headline session first so JVMs never compete for cores
        import subprocess
        import sys

        spark.stop()
        for name in _ratio_workloads():
            env = dict(os.environ, SPARK_GRAFT_BENCH_MODE=f"ratio:{name}")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, env=env, check=False,
            )
            try:
                payload = json.loads(proc.stdout.strip().splitlines()[-1])
                ratio_bands.update(payload.pop("_bands", {}))
                ratios.update(payload)
            except Exception:  # noqa: BLE001 — surface the child's noise
                ratios[name] = None
                ratios[f"{name}_error"] = (proc.stderr or proc.stdout)[-300:]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": float(sf),
        # r13 contention sentinel: spread of a fixed driver-side CPU
        # canary timed between queries. contended=true means the box
        # ran ≥2× slower at some point during the headline window —
        # treat per-query deltas in THIS record as suspect and rerun
        # idle (r12's driver record was ~26% inflated with no way to
        # tell from the record itself).
        "contended": contended,
        "canary_spread": canary_spread,
        # absolute anchor: cross-round comparison catches uniform
        # slowness the within-run spread can't see
        "canary_median_sec": round(
            float(
                statistics.median(canary_draws["st"][1:] or canary_draws["st"])
            ),
            4,
        ),
        # r14: the absolute bar the median was judged against names its
        # own source (env override / recorded-anchor×1.5 / fallback)
        "canary_bar_sec": canary_bar,
        "canary_bar_source": canary_bar_source,
        # r14 parallel canary: median wall of cpu_count() concurrent
        # single-draw sha256 loops / the single-thread median. ~1 on
        # healthy hardware (≤ ~1.5 with SMT); rises with host core
        # oversubscription, which the single-thread canary cannot see
        "canary_mt_ratio": canary_mt_ratio,
        "canary_mt_median_sec": canary_mt_median,
        "canary_mt_bar": canary_mt_bar,
        "canary_mt_bar_source": canary_mt_bar_source,
        # queries whose tiebreak draw STILL disagreed >1.5× — movement
        # inside the query window the between-query canary cannot see
        "suspect_queries": suspects,
        "vs_pandas_speedup": ratios,
    }
    # Full record (variance bands, methodology, exact timings) goes to a
    # FILE — r6's single fat JSON line outgrew the driver's stdout-tail
    # capture and the round's headline total was lost (BENCH_r06.json
    # "parsed": null). stdout gets ONE compact summary line, printed
    # LAST, sized well inside the tail window.
    full = dict(
        summary,
        queries_exact=timings,
        kind_split_sec=kind_split,
        kind_split_methodology=(
            "min-of-1, cold cache, per kind-filtered union leg — "
            "attribution for regression triage only; NOT comparable "
            "to the min-of-2 warm headline numbers above (a kind "
            "split can read 1.5-2x its query's headline share)"
        ),
        variance={
            "query_draws_sec": query_bands,
            "canary_draws_sec": canary_draws["st"],
            "canary_mt_draws_sec": canary_draws["mt"],
            "ratio_draws_sec": ratio_bands,
        },
        methodology=(
            "headline: min-of-2 per query (build+count), System.gc() "
            "between, one shared session; a 3rd draw (still min) when "
            "the first two disagree >1.5x (still >1.5x after 3 draws "
            "-> suspect_queries); contended = a fixed driver-side "
            "sha256 canary timed between queries, flagged on spread "
            ">2x vs the run median (slow window) OR median > "
            "canary_bar_sec (uniform load; bar = 1.5x the newest clean "
            "recorded anchor, SPARK_GRAFT_CANARY_BAR override, 0.45s "
            "no-history fallback — see canary_bar_source) OR "
            "canary_mt_ratio > canary_mt_bar (r14: cpu_count() "
            "concurrent sha256 loops vs one — host core "
            "oversubscription/steal slows parallel stages while a "
            "single busy thread still schedules; bar = 1.5x the newest "
            "clean recorded canary_mt_ratio anchor, "
            "SPARK_GRAFT_CANARY_MT_BAR override, 2.5 no-history "
            "fallback). Canaries "
            "sample BETWEEN queries only: a burst contained inside one "
            "query window shows up in suspect_queries, not contended. "
            "ratios: one fresh-JVM "
            "process per workload (reference forks a fresh pool per "
            "call; reused-worker pollution measured 2x on applymap), "
            "INTERLEAVED spark/pandas draws — ratio = median of "
            "per-pair (back-to-back) ratios, so sustained common-mode "
            "box slowdown cancels in the quotient; 3 pairs, up to 6 "
            "when no two pair ratios agree within 1.3x; noop writes; "
            "run the bench alone"
        ),
    )
    try:
        local_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "BENCH_LOCAL.json")
        with open(local_path, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass  # read-only checkout: the summary line still carries the result
    print(json.dumps(summary))
    _ = REGISTRY


if __name__ == "__main__":
    main()
