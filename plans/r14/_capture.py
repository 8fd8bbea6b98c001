"""Capture .explain("formatted") for every declared query into
plans/r14/<query>_<tag>.txt  (tag = sys.argv[1], default "before").

Usage: python plans/r14/_capture.py [before|after] [query ...]
Plan capture only — no query execution beyond what plan construction
itself triggers (the MinHash-family plans run localCheckpoint jobs at
build time).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from pandarallel_spark.session import get_spark  # noqa: E402
from pandarallel_spark.workload import queries  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.dirname(os.path.abspath(__file__))

spark = get_spark("plan_capture", cpus=8, driver_memory="8g")
qs = queries()
for name, fn in sorted(qs.items()):
    if only and name not in only:
        continue
    try:
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # noqa: BLE001
        plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
    with open(f"{out_dir}/{name}_{tag}.txt", "w") as fh:
        fh.write(plan)
    print(name, "ok" if not plan.startswith("PLAN CAPTURE FAILED") else "FAIL")
spark.stop()
