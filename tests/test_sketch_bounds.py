"""Error-bound tests for the mergeable-sketch twins (VERDICT r2 #10).

Sketch values are engine-specific, so their PUBLISHED error bounds are
asserted against exact results:

- ``percentile_approx(col, p, accuracy)`` guarantees a RANK error of at
  most ``n / accuracy`` (Greenwald-Khanna): the returned value must lie
  between the exact order statistics at ranks ``(p ∓ 1/accuracy)·n``.
- ``approx_count_distinct(col, rsd)`` is HyperLogLog++ with relative
  standard deviation ``rsd``; we allow 6σ (plus the integer floor for
  tiny groups, where HLL++'s sparse mode is exact anyway).

Since r4 the registered queries carry this contract themselves
(``approx_within_bound`` asserted TRUE by the SQL oracle); these tests
keep the RAW sketch values under the published bounds — a second,
sharper line of defense with the bound math independent of the query's
in-plan check — and assert the queries' booleans are all TRUE.
"""

import numpy as np
from pyspark.sql import functions as F

from pandarallel_spark.workload import queries


def test_percentile_approx_within_rank_bound(spark, sf_dir):
    accuracy = 10_000  # must match the registered query
    sk = F.percentile_approx(
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(accuracy),
    )
    li_sdf = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = (
        li_sdf.groupBy("l_returnflag")
        .agg(sk.alias("p"))
        .toPandas()
        .set_index("l_returnflag")["p"]
    )
    li = li_sdf.select("l_returnflag", "l_extendedprice").toPandas()
    li["cents"] = np.round(li.l_extendedprice * 100).astype("int64")
    eps = 1.0 / accuracy
    for flag, grp in li.groupby("l_returnflag"):
        vals = np.sort(grp.cents.to_numpy())
        n = len(vals)
        for i, p in enumerate((0.5, 0.9, 0.99)):
            got = approx.loc[flag][i]
            lo_rank = max(0, int(np.floor((p - eps) * n)) - 1)
            hi_rank = min(n - 1, int(np.ceil((p + eps) * n)))
            assert vals[lo_rank] <= got <= vals[hi_rank], (
                f"{flag} p{int(p*100)}: {got} outside "
                f"[{vals[lo_rank]}, {vals[hi_rank]}] (rank bound ±{eps:n})"
            )
    # the registered query's in-plan contract boolean must hold too
    # (r7: both sketches live in the merged sketches_error_contracts row)
    q = queries()["sketches_error_contracts"](spark, sf_dir).toPandas()
    assert q[q["src"].str.startswith("tdigest")]["approx_within_bound"].all()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    rsd = 0.01  # must match the registered query
    both = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_suppkey")
        .agg(
            F.approx_count_distinct("l_partkey", rsd).alias("approx"),
            F.count_distinct("l_partkey").alias("exact"),
        )
        .toPandas()
        .set_index("l_suppkey")
        .sort_index()
    )
    tol = 6 * rsd
    rel_err = (both["approx"] - both["exact"]).abs() / both["exact"].clip(lower=1)
    worst = rel_err.max()
    assert (rel_err <= tol + 1.0 / both["exact"].clip(lower=1)).all(), (
        f"HLL++ estimates exceed {tol:.0%} + integer slack: worst {worst:.3%}"
    )
    q = queries()["sketches_error_contracts"](spark, sf_dir).toPandas()
    assert q[q["src"] == "hll"]["approx_within_bound"].all()


def test_sketch_rollup_merge_equals_single_shot(spark):
    """Mergeability is the whole contract: per-partition HLL partials
    merged with hll_union_agg must estimate EXACTLY what one sketch
    over all rows estimates (DataSketches HLL union of same-lgk
    sketches is lossless), and land within the published error bound
    of the exact distinct count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pandarallel_spark.operators.relational import (
        sketch_rollup,
        sketch_rollup_merge,
    )

    rng = np.random.default_rng(8)
    n = 60_000
    pdf = pd.DataFrame({
        "g": rng.integers(0, 3, n),
        "part": rng.integers(0, 12, n),          # ingest partition
        "v": rng.integers(0, 9000, n),
    })
    sdf = spark.createDataFrame(pdf).repartition(16)
    partials = sketch_rollup(sdf, ["g", "part"], "v", lgk=12)
    merged = {
        r.g: r.est
        for r in sketch_rollup_merge(
            partials, ["g"], "v_hll", estimate_col="est"
        ).collect()
    }
    single = {
        r.g: r.est
        for r in sketch_rollup(sdf, ["g"], "v", lgk=12)
        .select("g", F.hll_sketch_estimate("v_hll").alias("est"))
        .collect()
    }
    assert merged == single  # lossless union
    exact = pdf.groupby("g").v.nunique().to_dict()
    rse = 1.04 / 2**6
    for g, ex in exact.items():
        assert abs(merged[g] - ex) <= max(5 * rse * ex, 2), (g, merged[g], ex)
    # grand total via keys=[]
    tot = sketch_rollup_merge(partials, [], "v_hll", estimate_col="est").collect()
    assert len(tot) == 1
    assert abs(tot[0].est - pdf.v.nunique()) <= 5 * rse * pdf.v.nunique()
