#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: warm-up actions absorb JVM/session/Python-worker startup
(BASELINE.md excludes fixed overhead). Headline queries are timed once,
cold-ish, as plan-build + ``count()`` (executes the full query). The
vs-pandas ratio section measures steady state: min-of-3 on both engines,
``noop``-format writes (full execution, no result materialization), and
cache-defeating warm builds for operators that persist internally.
"""

from __future__ import annotations

import json
import os
import time

from pandarallel_spark.session import get_spark
from pandarallel_spark.workload import REGISTRY, queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: grows as operators land; keep it ≤ ~10 so the round bench
# stays fast. Fallback: everything registered.
HEADLINE = [
    "groupby_agg_pricing_summary",
    "groupby_apply_pricing_summary",
    "row_apply_expr_disc_price",
    "row_apply_udf_disc_price",
    "grouped_rolling_sum",
    "series_map_dict",
    "text_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_topk_numpy",
    "similarity_lsh_bucketed",
    "similarity_ivf_topk",
    "join_revenue_per_nation",
    "events_tumbling_hour",
    "events_sliding_hour_15m",
    "events_sessionize_30m",
    "text_bpe_tokens",
    "corpus_cleanup_pipeline",
    "embedding_cosine_pairs",
    "decontaminate_ngram_hits",
    "text_repetition",
    "bm25_topk",
]


def _pandas_ratios(spark) -> dict[str, float]:
    """Speedup of this engine vs single-core pandas on the reference's
    own benchmark workloads — all 8 BASELINE.md rows (pandarallel
    publishes ≈4.0× on 4 cores, 3.2× for series.map; matching or beating
    those ratios here means the Spark plans parallelize at least as well
    as the reference's fork pool). Sizes are scaled down from the
    notebook's (1e6-5e7) to keep the pandas side bounded; every workload
    is linear in rows (expanding: per-group quadratic, scaled likewise),
    so the ratio is size-stable once past Spark's fixed ~1 s overhead.
    """
    import math

    import numpy as np
    import pandas as pd

    from pandarallel_spark import parallelize

    import tempfile

    rng = np.random.default_rng(0)
    ratios: dict[str, float] = {}
    # the headline queries leave the JVM with GC debt (unpersisted RDD
    # carcasses, codegen caches); collect once so the first ratio
    # workloads aren't taxed for it
    spark.sparkContext._jvm.System.gc()
    tmp = tempfile.mkdtemp(prefix="bench_ratio_")

    def spark_input(pdf: pd.DataFrame, name: str):
        """Parquet-backed input — the engine's native path (vectorized
        scan), not a row-serialized .cache() whose deserialization would
        dominate the measurement. 32 files → full parallelism."""
        path = f"{tmp}/{name}"
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def run_spark(build, warm_build=None):
        """Steady-state timing: a warm-up run absorbs Python-worker /
        Arrow / codegen startup (BASELINE.md excludes fixed overhead),
        then min-of-3 is measured with a System.gc() between runs — the
        big earlier workloads leave old-gen debt that otherwise lands as
        a mid-run collection in whichever later measurement is unlucky
        (the r3→r4 'uniform drift' was exactly this). Operators that
        persist intermediate state get a ``warm_build`` on different
        lineage + a cache clear, so the measured run is a genuine full
        compute, never a cache read."""
        (warm_build or build)().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):  # min-of-3: single runs swing ±30% on this box
            if warm_build is not None:
                spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(name, pandas_call, build, warm_build=None):
        # per-workload GC: the big workloads (16M-row groupby) leave JVM
        # old-gen debt that would tax every LATER workload's measurement
        # — collect between workloads so each ratio reflects the
        # operator, not its position in the run order
        spark.sparkContext._jvm.System.gc()
        # min-of-3 on BOTH sides — taking Spark's favorable noise tail
        # against fewer pandas draws would bias every ratio upward
        t_pandas = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pandas_call()
            t_pandas = min(t_pandas, time.perf_counter() - t0)
        ratios[name] = round(t_pandas / run_spark(build, warm_build), 2)

    # 1. df.parallel_apply(axis=1): sin(a²)+sin(b²) — notebook cells 4-7
    n = 500_000
    pdf = pd.DataFrame({"a": rng.integers(1, 8, n), "b": rng.random(n)})
    func = lambda row: math.sin(row.a**2) + math.sin(row.b**2)  # noqa: E731
    sdf = spark_input(pdf, "row_apply")
    measure(
        "row_apply_vs_pandas",
        lambda: pdf.apply(func, axis=1),
        lambda: parallelize(sdf).parallel_apply(
            func, axis=1, schema="a bigint, b double, result double"
        ),
    )

    # 2. df.parallel_applymap: sin(x²)-cos(x²) per cell — cells 10-13
    n = 4_000_000
    pdf = pd.DataFrame({"a": rng.random(n), "b": rng.random(n)})
    mfunc = lambda x: math.sin(x**2) - math.cos(x**2)  # noqa: E731
    sdf = spark_input(pdf, "applymap")
    measure(
        "applymap_vs_pandas",
        lambda: pdf.map(mfunc),
        lambda: parallelize(sdf).parallel_applymap(mfunc),
    )

    # 3. groupby.parallel_apply — cells 16-19: python math loop per group
    n = 16_000_000
    pdf = pd.DataFrame({"a": rng.integers(0, 3000, n), "b": rng.random(n)})

    def gfunc(g):
        return sum(math.log10(math.sqrt(math.exp(x**2))) for x in g.b)

    sdf = spark_input(pdf, "groupby_apply")
    measure(
        "groupby_apply_vs_pandas",
        lambda: pdf.groupby("a")[["b"]].apply(gfunc),
        lambda: parallelize(sdf).groupby("a").parallel_apply(
            gfunc, schema="a bigint, result double", mode="scalar"
        ),
    )

    # 4. groupby rolling(4).parallel_apply — cells 22-25: polynomial of
    # the 4 window values
    n = 2_000_000
    pdf = pd.DataFrame(
        {
            "idx": np.arange(n),
            "a": rng.integers(0, 300, n),
            "b": rng.random(n),
        }
    )
    wfunc = lambda x: x[0] + x[1] ** 2 + x[2] ** 3 + x[3] ** 4  # noqa: E731
    sdf = spark_input(pdf, "grouped_rolling")
    measure(
        "grouped_rolling_vs_pandas",
        lambda: pdf.groupby("a").b.rolling(4).apply(wfunc, raw=True),
        lambda: parallelize(sdf, order_by="idx")
        .groupby("a")
        .series("b")
        .rolling(4)
        .parallel_apply(wfunc, raw=True, output_col="r"),
    )

    # 5. groupby expanding(4).parallel_apply — cells 28-31 (per-group
    # quadratic: prefix arrays grow with group size)
    n = 1_000_000
    pdf = pd.DataFrame(
        {
            "idx": np.arange(n),
            "a": rng.integers(0, 300, n),
            "b": rng.random(n),
        }
    )
    efunc = lambda x: float(np.sum(x)) / len(x)  # noqa: E731
    sdf = spark_input(pdf, "grouped_expanding")
    measure(
        "grouped_expanding_vs_pandas",
        lambda: pdf.groupby("a").b.expanding(4).apply(efunc, raw=True),
        lambda: parallelize(sdf, order_by="idx")
        .groupby("a")
        .series("b")
        .expanding(4)
        .parallel_apply(efunc, raw=True, output_col="r"),
    )

    # 6. series.parallel_map (callable) — cells 34-37
    n = 5_000_000
    pdf = pd.DataFrame({"x": rng.random(n) + 1})
    sfunc = lambda x: math.log10(math.sqrt(math.exp(x**2)))  # noqa: E731
    sdf = spark_input(pdf, "series_map")
    measure(
        "series_map_vs_pandas",
        lambda: pdf.x.map(sfunc),
        lambda: parallelize(sdf).series("x").parallel_map(sfunc, return_type="double"),
    )

    # 7. series.parallel_apply — cells 40-43 (same func, args form)
    n = 8_000_000
    pdf = pd.DataFrame({"x": rng.random(n) + 1})
    sdf = spark_input(pdf, "series_apply")
    measure(
        "series_apply_vs_pandas",
        lambda: pdf.x.apply(sfunc),
        lambda: parallelize(sdf).series("x").parallel_apply(sfunc, return_type="double"),
    )

    # 8. series.rolling(4).parallel_apply — cells 46-49: GLOBAL ordered
    # rolling; runs the range-bucket halo plan (operators/window.py):
    # boundary/context extraction at plan build (memoized), then ONE
    # exec job — for slot-arithmetic UDFs like this one a pure-JVM
    # bucketed window expression, no Python workers in the hot path.
    # Warm on the SAME build: since the r4 redesign the operator caches
    # no DATA between runs (the memo holds plan fragments — literal
    # boundaries, a few hundred context rows — not results), so every
    # measured run recomputes the full 4M-row rolling from parquet;
    # same-build warm-up just absorbs codegen/JIT like every other
    # workload here.
    n = 4_000_000
    pdf = pd.DataFrame({"idx": np.arange(n), "x": rng.random(n)})
    sdf = spark_input(pdf, "series_rolling")

    def _roll_build(frame):
        return (
            parallelize(frame, order_by="idx")
            .series("x")
            .rolling(4)
            .parallel_apply(wfunc, raw=True, output_col="r")
        )

    measure(
        "series_rolling_vs_pandas",
        lambda: pdf.x.rolling(4).apply(wfunc, raw=True),
        lambda: _roll_build(sdf),
    )

    # --- engine extras (NOT reference rows): the same operators with
    # pure-arithmetic UDFs, where the express-or-fallback layer
    # (operators/_vectorize.py) evaluates the UDF once per batch instead
    # of per row. The reference's math.*-based workloads above fall back
    # to the stock loop by design; these show the fast path's headroom.
    n = 500_000
    pdf = pd.DataFrame({"a": rng.integers(1, 8, n), "b": rng.random(n)})
    afunc = lambda row: row.a * 2 + row.b / 3 - 1  # noqa: E731
    sdf = spark_input(pdf, "row_apply_arith")
    measure(
        "row_apply_arith_vs_pandas",
        lambda: pdf.apply(afunc, axis=1),
        lambda: parallelize(sdf).parallel_apply(
            afunc, axis=1, schema="a bigint, b double, result double"
        ),
    )

    return ratios


def main() -> None:
    qs = queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)
    spark = get_spark("pandarallel_spark_bench")

    # warm-up: session + parquet footer reads + Python worker pool +
    # Arrow serializer paths (BASELINE.md excludes fixed startup
    # overhead; without this the first Python-UDF query pays ~1-2 s of
    # worker fork/import that no steady-state run would see)
    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    warm.count()
    warm.limit(32 * 64).repartition(32).mapInPandas(
        lambda it: it, warm.schema
    ).count()

    # min-of-2 with a GC between queries: single cold runs of the
    # heavier queries swing 2-4× run-over-run on this box (JVM old-gen
    # debt + codegen compilation landing on whichever query is unlucky),
    # which made round-over-round comparisons meaningless (r3 verdict
    # "uniform drift"). The first run still pays plan build + codegen;
    # the second is steady-state; min reports the query, not its luck.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    ratios = (
        _pandas_ratios(spark)
        if os.environ.get("SPARK_GRAFT_BENCH_RATIOS", "1") != "0"
        else {}
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "vs_pandas_speedup": ratios,
                "methodology": (
                    "headline: min-of-2 per query (build+count), System.gc() "
                    "between; ratios: min-of-3 both engines, noop writes, "
                    "gc between runs; run the bench alone — concurrent Spark "
                    "sessions skew every number"
                ),
            }
        )
    )
    _ = REGISTRY


if __name__ == "__main__":
    main()
