"""Error-bound tests for the mergeable-sketch twins (VERDICT r2 #10).

The two sketch queries (`percentiles_approx_price_per_flag`,
`approx_distinct_parts_per_supplier`) cannot be value-oracled — the
interpolation is engine-specific — but their PUBLISHED error bounds can
be asserted against the exact oracle-checked twins:

- ``percentile_approx(col, p, accuracy)`` guarantees a RANK error of at
  most ``n / accuracy`` (Greenwald-Khanna): the returned value must lie
  between the exact order statistics at ranks ``(p ∓ 1/accuracy)·n``.
- ``approx_count_distinct(col, rsd)`` is HyperLogLog++ with relative
  standard deviation ``rsd``; we allow 6σ (plus the integer floor for
  tiny groups, where HLL++'s sparse mode is exact anyway).
"""

import numpy as np

from pandarallel_spark.workload import queries


def test_percentile_approx_within_rank_bound(spark, sf_dir):
    approx = (
        queries()["percentiles_approx_price_per_flag"](spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    ).toPandas()
    li["cents"] = np.round(li.l_extendedprice * 100).astype("int64")
    accuracy = 10_000  # must match the registered query
    eps = 1.0 / accuracy
    for flag, grp in li.groupby("l_returnflag"):
        vals = np.sort(grp.cents.to_numpy())
        n = len(vals)
        for p, colname in ((0.5, "p50_cents"), (0.9, "p90_cents"), (0.99, "p99_cents")):
            got = approx.loc[flag, colname]
            lo_rank = max(0, int(np.floor((p - eps) * n)) - 1)
            hi_rank = min(n - 1, int(np.ceil((p + eps) * n)))
            assert vals[lo_rank] <= got <= vals[hi_rank], (
                f"{flag} p{int(p*100)}: {got} outside "
                f"[{vals[lo_rank]}, {vals[hi_rank]}] (rank bound ±{eps:n})"
            )


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = (
        queries()["approx_distinct_parts_per_supplier"](spark, sf_dir)
        .toPandas()
        .set_index("l_suppkey")["l_partkey_distinct_approx"]
    )
    exact = (
        queries()["count_distinct_parts_per_supplier"](spark, sf_dir)
        .toPandas()
        .set_index("l_suppkey")["l_partkey_distinct"]
    )
    assert set(approx.index) == set(exact.index)
    approx, exact = approx.sort_index(), exact.sort_index()
    rsd = 0.01  # must match the registered query
    tol = 6 * rsd
    rel_err = (approx - exact).abs() / exact.clip(lower=1)
    worst = rel_err.max()
    assert (rel_err <= tol + 1.0 / exact.clip(lower=1)).all(), (
        f"HLL++ estimates exceed {tol:.0%} + integer slack: worst {worst:.3%}"
    )
