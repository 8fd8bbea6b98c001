#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one warm-up action to absorb JVM/session startup (BASELINE.md
excludes fixed overhead), then each query timed as plan-build + execute to
a count/collect-free materialization (``df.write.format("noop")`` is not
in OSS pyspark; we use ``count()`` on the final plan, which executes the
full query).
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
    "join_revenue_per_nation",
    "events_tumbling_hour",
]


def _pandas_ratios(spark) -> dict[str, float]:
    """Speedup of this engine vs single-core pandas on the reference's
    own benchmark workload shapes (BASELINE.md: pandarallel publishes
    ≈4.0× on 4 cores; ≥4× here means we match its ratio, and the number
    scales with cores because the plan, not a fork pool, is doing the
    work). Sizes are scaled down from the notebook's (5e6-5e7) to keep
    the pandas side bounded; the ratio is what matters.
    """
    import math

    import numpy as np
    import pandas as pd

    from pandarallel_spark import parallelize

    import tempfile

    rng = np.random.default_rng(0)
    ratios: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench_ratio_")

    def spark_input(pdf: pd.DataFrame, name: str):
        """Parquet-backed input — the engine's native path (vectorized
        scan), not a row-serialized .cache() whose deserialization would
        dominate the measurement. 32 files → full parallelism."""
        path = f"{tmp}/{name}"
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def run_spark(build):
        """Steady-state timing: first run warms Python workers / Arrow
        paths, second run is the measurement — matching BASELINE.md's
        exclusion of fixed startup overhead."""
        build().write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # df.parallel_apply(axis=1): sin(a²)+sin(b²) — notebook cells 4-7
    # (notebook n=1e6; halved — apply(axis=1) is linear, ratio unchanged)
    n = 500_000
    pdf = pd.DataFrame({"a": rng.integers(1, 8, n), "b": rng.random(n)})
    func = lambda row: math.sin(row.a**2) + math.sin(row.b**2)  # noqa: E731
    t0 = time.perf_counter()
    pdf.apply(func, axis=1)
    t_pandas = time.perf_counter() - t0
    sdf = spark_input(pdf, "row_apply")
    t_spark = run_spark(
        lambda: parallelize(sdf).parallel_apply(
            func, axis=1, schema="a bigint, b double, result double"
        )
    )
    ratios["row_apply_vs_pandas"] = round(t_pandas / t_spark, 2)

    # groupby.parallel_apply — notebook cells 16-19 run a python math
    # loop over each group (compute-bound, like the reference's bench;
    # notebook n=3e7 / 3000 groups, halved to bound the pandas side)
    n = 16_000_000
    pdf = pd.DataFrame({"a": rng.integers(0, 3000, n), "b": rng.random(n)})

    def gfunc(g):
        return sum(math.log10(math.sqrt(math.exp(x**2))) for x in g.b)

    t0 = time.perf_counter()
    pdf.groupby("a")[["b"]].apply(gfunc)
    t_pandas = time.perf_counter() - t0
    sdf = spark_input(pdf, "groupby_apply")
    t_spark = run_spark(
        lambda: parallelize(sdf).groupby("a").parallel_apply(
            gfunc, schema="a bigint, result double", mode="scalar"
        )
    )
    ratios["groupby_apply_vs_pandas"] = round(t_pandas / t_spark, 2)

    # series.parallel_apply: log10(sqrt(exp(x²))) — notebook cells 40-43
    n = 4_000_000
    pdf = pd.DataFrame({"x": rng.random(n) + 1})
    sfunc = lambda x: math.log10(math.sqrt(math.exp(x**2)))  # noqa: E731
    t0 = time.perf_counter()
    pdf.x.apply(sfunc)
    t_pandas = time.perf_counter() - t0
    sdf = spark_input(pdf, "series_apply")
    t_spark = run_spark(
        lambda: parallelize(sdf).series("x").parallel_apply(sfunc, return_type="double")
    )
    ratios["series_apply_vs_pandas"] = round(t_pandas / t_spark, 2)

    return ratios


def main() -> None:
    qs = queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)
    spark = get_spark("pandarallel_spark_bench")

    # warm-up: session + parquet footer reads
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

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
            }
        )
    )
    _ = REGISTRY


if __name__ == "__main__":
    main()
