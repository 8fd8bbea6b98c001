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

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    _ = REGISTRY


if __name__ == "__main__":
    main()
