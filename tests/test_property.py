"""Property-based differential testing (hypothesis): random frames and
random affine/polynomial UDFs must match stock pandas through every
operator path. Extends the reference's fixed-fixture differential method
(SURVEY.md §5) to generated inputs.
"""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pandarallel_spark import parallelize

_SETTINGS = dict(
    max_examples=8,  # each example runs Spark jobs — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, 5, n),
            "x": rng.integers(-100, 100, n).astype("int64"),
            "y": rng.random(n) * 10 - 5,
        }
    )


@given(pdf=frames(), a=st.integers(-5, 5), b=st.integers(-5, 5))
@settings(**_SETTINGS)
def test_row_apply_matches_pandas(spark, pdf, a, b):
    sdf = spark.createDataFrame(pdf)
    func = lambda row: a * row.x + b * row.y + math.sin(row.y)  # noqa: E731
    expected = pdf.apply(func, axis=1)
    got = (
        parallelize(sdf)
        .parallel_apply(func, axis=1, schema="g bigint, x bigint, y double, result double")
        .toPandas()
        .sort_values(["g", "x", "y"])
        .reset_index(drop=True)["result"]
    )
    exp_sorted = (
        pdf.assign(result=expected)
        .sort_values(["g", "x", "y"])
        .reset_index(drop=True)["result"]
    )
    pd.testing.assert_series_equal(got, exp_sorted, check_names=False)


@given(pdf=frames())
@settings(**_SETTINGS)
def test_groupby_scalar_matches_pandas(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    func = lambda g: float(g.y.sum() - g.x.max())  # noqa: E731
    expected = (
        pdf.groupby("g")[["x", "y"]].apply(func).rename("result").reset_index()
    )
    got = (
        parallelize(sdf)
        .groupby("g")
        .parallel_apply(func, schema="g bigint, result double", mode="scalar")
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, expected.sort_values("g").reset_index(drop=True), check_dtype=False
    )


@given(pdf=frames(), w=st.integers(2, 6))
@settings(**_SETTINGS)
def test_grouped_rolling_matches_pandas(spark, pdf, w):
    pdf = pdf.reset_index().rename(columns={"index": "idx"})
    sdf = spark.createDataFrame(pdf)
    func = lambda arr: float(np.sum(arr**2))  # noqa: E731
    expected = (
        pdf.sort_values("idx")
        .groupby("g").y.rolling(w).apply(func, raw=True)
        .reset_index(level=0, drop=True)
        .sort_index()
        .reset_index(drop=True)
    )
    got = (
        parallelize(sdf, order_by="idx")
        .groupby("g")
        .series("y")
        .rolling(w)
        .parallel_apply(func, raw=True, output_col="r")
        .toPandas()
        .sort_values("idx")
        .reset_index(drop=True)["r"]
    )
    pd.testing.assert_series_equal(got, expected, check_names=False)


@pytest.mark.parametrize("n", [0, 1])
def test_degenerate_sizes(spark, n):
    pdf = pd.DataFrame({"g": [1] * n, "x": [2.0] * n})
    sdf = spark.createDataFrame(pdf, schema="g bigint, x double")
    out = (
        parallelize(sdf)
        .parallel_apply(lambda r: r.x * 2, axis=1, schema="g bigint, x double, result double")
        .toPandas()
    )
    assert len(out) == n


def test_hash_split_invariant_under_partitioning(spark):
    """A row's split assignment must depend only on its id — identical
    across partition counts, row order, and subsetting (the property
    randomSplit lacks)."""
    from pandarallel_spark.operators.sampling import hash_split

    pdf = pd.DataFrame({"id": np.arange(5000, dtype="int64")})
    w = {"train": 0.8, "val": 0.1, "test": 0.1}

    def assign(df):
        out = hash_split(df, "id", w).toPandas()
        return out.sort_values("id", ignore_index=True)

    base = assign(spark.createDataFrame(pdf))
    re32 = assign(spark.createDataFrame(pdf).repartition(32))
    re1 = assign(spark.createDataFrame(pdf.sample(frac=1.0, random_state=0)).coalesce(1))
    pd.testing.assert_frame_equal(base, re32)
    pd.testing.assert_frame_equal(base, re1)

    # subsetting doesn't move surviving rows between splits
    sub = assign(spark.createDataFrame(pdf[pdf["id"] % 3 == 0]))
    merged = base.merge(sub, on="id", suffixes=("_full", "_sub"))
    assert (merged["split_full"] == merged["split_sub"]).all()

    # fractions roughly honored (md5 uniformity)
    frac = base["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02


def test_pack_sequences_greedy_contiguous(spark):
    """Within each shard: pack ids are nondecreasing in walk order,
    every pack but the last is filled past capacity only by its final
    (straddling) row, and the exclusive-prefix-sum definition holds."""
    from pandarallel_spark.operators.sampling import pack_sequences

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "id": np.arange(3000, dtype="int64"),
            "shard": rng.integers(0, 4, 3000),
            "toks": rng.integers(1, 400, 3000).astype("int64"),
        }
    )
    cap = 2048
    got = (
        pack_sequences(
            spark.createDataFrame(pdf).repartition(16),
            "toks", cap, shard_by=["shard"], order_by="id",
        )
        .toPandas()
        .sort_values(["shard", "id"], ignore_index=True)
    )
    for shard, g in got.groupby("shard"):
        prefix = g["toks"].cumsum().shift(fill_value=0).to_numpy()
        expect = prefix // cap
        assert (g["pack_id"].to_numpy() == expect).all()
        assert (np.diff(g["pack_id"].to_numpy()) >= 0).all()


@given(
    pdf=frames(),
    w=st.integers(1, 6),
    mp=st.integers(1, 4),
    center=st.booleans(),
    closed=st.sampled_from(["right", "left", "both", "neither"]),
)
@settings(**_SETTINGS)
def test_global_rolling_closed_matches_pandas(spark, pdf, w, mp, center, closed):
    """Every (window, min_periods, center, closed) combination of the
    global halo-rolling path must bit-match pandas (frame-bound replay +
    bucket boundary fixup under random sizes incl. n < w)."""
    pdf = pdf.reset_index().rename(columns={"index": "idx"})
    sdf = spark.createDataFrame(pdf).repartition(4)
    mp = min(mp, w)
    func = lambda a: float(np.sum(a)) if len(a) else 0.0  # noqa: E731
    expected = (
        pdf.sort_values("idx").y
        .rolling(w, min_periods=mp, center=center, closed=closed)
        .apply(func, raw=True)
        .reset_index(drop=True)
    )
    got = (
        parallelize(sdf, order_by="idx")
        .series("y")
        .rolling(w, min_periods=mp, center=center, closed=closed)
        .parallel_apply(func, raw=True, output_col="r", vectorize=False)
        .toPandas()
        .sort_values("idx")
        .reset_index(drop=True)["r"]
    )
    pd.testing.assert_series_equal(got, expected, check_names=False)


@given(
    seed=st.integers(0, 2**31 - 1),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 3, 25]),
    exact=st.booleans(),
    keyed=st.booleans(),
)
@settings(**_SETTINGS)
def test_asof_property_matches_merge_asof(spark, seed, direction, tol, exact, keyed):
    """Random event sets through every direction × tolerance ×
    allow_exact_matches must match pd.merge_asof exactly — both the
    keyed (by=) path and the global on=None range-bucketed path."""
    from pyspark.sql import functions as F

    from pandarallel_spark.operators.join import asof_join

    rng = np.random.default_rng(seed)
    nl, nr = rng.integers(1, 80), rng.integers(1, 80)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], nl),
            "t": np.sort(rng.choice(np.arange(0, 500), nl, replace=False)),
            "v": np.arange(nl),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], nr),
            "t": np.sort(rng.choice(np.arange(0, 500), nr, replace=False)),
            "px": rng.random(nr).round(4),
        }
    ).drop_duplicates(["k", "t"])
    expected = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t",
        by="k" if keyed else None,
        direction=direction,
        tolerance=tol,
        allow_exact_matches=exact,
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k" if keyed else None,
        left_ts="t",
        value_cols=["px"],
        direction=direction,
        tolerance=None if tol is None else F.lit(tol),
        allow_exact_matches=exact,
        suffix="",
    ).toPandas()
    key = ["k", "t", "v"] if keyed else ["t", "v"]
    e = expected.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    pd.testing.assert_series_equal(g["px"], e["px"], check_names=False)


@given(
    seed=st.integers(0, 2**31 - 1),
    win_type=st.sampled_from(["boxcar", "triang", "hamming", "gaussian", "exponential"]),
    agg=st.sampled_from(["sum", "mean", "var", "std"]),
    w=st.integers(2, 7),
    mp=st.sampled_from([None, 1, 2]),
    center=st.booleans(),
    ddof=st.sampled_from([0, 1]),
)
@settings(**_SETTINGS)
def test_weighted_rolling_property_matches_pandas(
    spark, seed, win_type, agg, w, mp, center, ddof
):
    """Random win_type × agg × window × min_periods × center × NaN
    patterns must match stock pandas weighted rolling exactly (pandas
    runs via the scipy-free weight stub; see tests/test_window.py)."""
    import sys
    import types

    from pandarallel_spark.operators.window import WEIGHT_GENERATORS

    # install the fake scipy inline (function-scoped monkeypatch doesn't
    # compose with @given)
    windows_mod = types.ModuleType("scipy.signal.windows")
    for name, fn in WEIGHT_GENERATORS.items():
        setattr(windows_mod, name, (lambda f: lambda M, **kw: f(M, **kw))(fn))
    signal = types.ModuleType("scipy.signal")
    signal.windows = windows_mod
    scipy = types.ModuleType("scipy")
    scipy.signal = signal
    scipy.__version__ = "1.11.4"
    saved = {k: sys.modules.get(k) for k in ("scipy", "scipy.signal", "scipy.signal.windows")}
    sys.modules.update(
        {"scipy": scipy, "scipy.signal": signal, "scipy.signal.windows": windows_mod}
    )
    try:
        rng = np.random.default_rng(seed)
        n = int(rng.integers(10, 120))
        vals = rng.standard_normal(n)
        nan_idx = rng.integers(0, n, max(1, n // 10))
        vals[nan_idx] = np.nan
        pdf = pd.DataFrame({"idx": np.arange(n, dtype="int64"), "v": vals})
        win_args = (
            {"std": float(rng.uniform(0.5, 3.0))}
            if win_type == "gaussian"
            else {"tau": float(rng.uniform(0.5, 3.0))}
            if win_type == "exponential"
            else {}
        )
        r = pdf.v.rolling(w, win_type=win_type, min_periods=mp, center=center)
        pandas_kwargs = dict(win_args)
        spark_win_args = dict(win_args)
        if agg in ("var", "std"):
            pandas_kwargs["ddof"] = ddof
            spark_win_args["ddof"] = ddof
        expected = getattr(r, agg)(**pandas_kwargs).to_numpy()
        got = (
            parallelize(spark.createDataFrame(pdf).repartition(4), order_by="idx")
            .series("v")
            .rolling(w, min_periods=mp, center=center, win_type=win_type)
            .parallel_apply(agg, win_args=spark_win_args, output_col="r")
            .toPandas()
            .sort_values("idx")["r"]
            .to_numpy(dtype="float64")
        )
        # var/std: pandas runs West's incremental update, we run the
        # algebraic two-moment form — identical math, last-ulp drift
        tol = dict(rtol=1e-9, atol=1e-9) if agg in ("var", "std") else dict(
            rtol=1e-12, atol=1e-12
        )
        assert np.allclose(got, expected, equal_nan=True, **tol)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@given(
    seed=st.integers(0, 2**31 - 1),
    agg=st.sampled_from(["sum", "mean", "min", "max", "count", "std"]),
    window=st.sampled_from(["7min", "30min", "2h"]),
    closed=st.sampled_from([None, "right", "left", "both", "neither"]),
    mp=st.sampled_from([None, 1, 3]),
    grouped=st.booleans(),
)
@settings(**_SETTINGS)
def test_time_rolling_property_matches_pandas(
    spark, seed, agg, window, closed, mp, grouped
):
    """Random agg × offset × closed × min_periods × NaN × grouping must
    match stock pandas time-offset rolling exactly. Timestamps are
    strictly increasing per key — duplicate timestamps are the
    documented value-based-vs-positional divergence and excluded."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 120))
    # strictly increasing (gaps 1s..40min straddle every window width)
    offs = np.cumsum(rng.integers(1, 2400, n))
    ts = pd.Timestamp("2022-03-01") + pd.to_timedelta(offs, unit="s")
    vals = rng.standard_normal(n)
    vals[rng.integers(0, n, max(1, n // 8))] = np.nan
    keys = rng.integers(0, 3, n) if grouped else np.zeros(n, dtype="int64")
    pdf = pd.DataFrame({"i": np.arange(n, dtype="int64"), "k": keys, "ts": ts, "x": vals})

    exp_parts = []
    for _, g in pdf.groupby("k"):
        s = pd.Series(g.x.to_numpy(), index=pd.DatetimeIndex(g.ts))
        r = getattr(s.rolling(window, min_periods=mp, closed=closed), agg)()
        exp_parts.append(pd.Series(r.to_numpy(), index=g.index))
    exp = pd.concat(exp_parts).sort_index().to_numpy(dtype="float64")

    base = parallelize(spark.createDataFrame(pdf).repartition(3), order_by="ts")
    if grouped:
        base = base.groupby("k")
    got = (
        base.series("x")
        .rolling(window, min_periods=mp, closed=closed)
        .parallel_apply(agg, output_col="r")
        .toPandas()
        .sort_values("i")["r"]
        .to_numpy(dtype="float64")
    )
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)


@given(
    seed=st.integers(0, 2**31 - 1),
    alpha=st.floats(0.05, 0.95),
    adjust=st.booleans(),
    ignore_na=st.booleans(),
)
@settings(**_SETTINGS)
def test_ewm_mean_property_matches_pandas(spark, seed, alpha, adjust, ignore_na):
    """Random alpha × adjust × ignore_na × NaN patterns: the global
    bucket-carry ewm must match single-core pandas to float
    re-association tolerance (the chained-seed algebra is exact; only
    FP op order differs at bucket boundaries)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 200))
    vals = rng.standard_normal(n)
    vals[rng.integers(0, n, max(1, n // 6))] = np.nan
    pdf = pd.DataFrame({"idx": np.arange(n, dtype="int64"), "x": vals})
    exp = pdf.x.ewm(alpha=alpha, adjust=adjust, ignore_na=ignore_na).mean().to_numpy()
    got = (
        parallelize(spark.createDataFrame(pdf).repartition(5), order_by="idx")
        .series("x")
        .ewm(alpha=alpha, adjust=adjust, ignore_na=ignore_na)
        .mean(output_col="r")
        .toPandas().sort_values("idx")["r"].to_numpy(dtype="float64")
    )
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)


@given(
    seed=st.integers(0, 2**31 - 1),
    func=st.sampled_from(["cov", "corr"]),
    window=st.sampled_from([2, 4, 7]),
    mp=st.sampled_from([None, 1, 3]),
    ddof=st.sampled_from([0, 1]),
    grouped=st.booleans(),
)
@settings(**_SETTINGS)
def test_rolling_cov_corr_property_matches_pandas(
    spark, seed, func, window, mp, ddof, grouped
):
    """Random two-column windows (NaN holes on both sides, constant
    stretches) must match pandas rolling.cov/corr wherever pandas is
    finite, and agree on "undefined" (we emit NaN where pandas' FP luck
    picks NaN or ±inf on zero-variance windows)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 100))
    x, y = rng.standard_normal(n), rng.standard_normal(n)
    x[rng.integers(0, n, max(1, n // 6))] = np.nan
    y[rng.integers(0, n, max(1, n // 6))] = np.nan
    if n > 10:  # constant stretch → zero-variance windows
        i = int(rng.integers(0, n - 5))
        x[i : i + 5] = 1.25
    keys = rng.integers(0, 3, n) if grouped else np.zeros(n, dtype="int64")
    pdf = pd.DataFrame(
        {"i": np.arange(n, dtype="int64"), "k": keys, "x": x, "y": y}
    )
    if mp is not None:
        mp = min(mp, window)  # pandas rejects min_periods > window
    kw = {"ddof": ddof} if func == "cov" else {}
    exp_parts = []
    for _, g in pdf.groupby("k"):
        r = getattr(g.x.rolling(window, min_periods=mp), func)(g.y, **kw)
        exp_parts.append(pd.Series(r.to_numpy(), index=g.index))
    exp = pd.concat(exp_parts).sort_index().to_numpy(dtype="float64")

    base = parallelize(spark.createDataFrame(pdf).repartition(3), order_by="i")
    if grouped:
        base = base.groupby("k")
    wa = {"other": "y", **({"ddof": ddof} if func == "cov" else {})}
    got = (
        base.series("x")
        .rolling(window, min_periods=mp)
        .parallel_apply(func, win_args=wa, output_col="r")
        .toPandas()
        .sort_values("i")["r"]
        .to_numpy(dtype="float64")
    )
    fin = np.isfinite(exp)
    # atol floor 1e-8: near-degenerate windows (within-window spread
    # ~1e-4 of the magnitude) hit catastrophic cancellation in BOTH
    # engines — pandas' Welford form itself emits impossible values
    # like -1.0000000066 there — so sub-1e-8 disagreement is shared FP
    # noise, not a semantic difference.
    assert np.allclose(got[fin], exp[fin], rtol=1e-6, atol=1e-8)
    assert not np.isfinite(got[~fin]).any()


@given(
    seed=st.integers(0, 2**31 - 1),
    window=st.sampled_from(["7min", "30min", "2h"]),
    closed=st.sampled_from([None, "right", "left", "both", "neither"]),
    mp=st.sampled_from([None, 0, 1, 3]),
    raw=st.booleans(),
)
@settings(**_SETTINGS)
def test_global_time_rolling_udf_matches_pandas(spark, seed, window, closed, mp, raw):
    """GLOBAL (ungrouped) time-offset rolling UDF — the r7 closure of the
    last rolling NotImplementedError — must match stock pandas
    ``rolling("1h").apply`` across offset × closed × min_periods × NaN ×
    raw. Runs the explode-to-reachable-buckets plan (per-bucket stock
    pandas); duplicate timestamps excluded (same tie caveat as the
    builtin bucketed path)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 120))
    offs = np.cumsum(rng.integers(1, 2400, n))
    ts = pd.Timestamp("2022-03-01") + pd.to_timedelta(offs, unit="s")
    vals = rng.standard_normal(n)
    vals[rng.integers(0, n, max(1, n // 8))] = np.nan

    def f(w):
        arr = np.asarray(w, dtype="float64")
        arr = arr[~np.isnan(arr)]
        return float(arr.max() - arr.min()) if len(arr) else np.nan

    pdf = pd.DataFrame({"i": np.arange(n, dtype="int64"), "ts": ts, "x": vals})
    s = pd.Series(pdf.x.to_numpy(), index=pd.DatetimeIndex(pdf.ts))
    exp = (
        s.rolling(window, min_periods=mp if mp is not None else 1, closed=closed)
        .apply(f, raw=raw)
        .to_numpy(dtype="float64")
    )
    got = (
        parallelize(spark.createDataFrame(pdf).repartition(3), order_by="ts")
        .series("x")
        .rolling(window, min_periods=mp, closed=closed)
        .parallel_apply(f, raw=raw, output_col="r")
        .toPandas()
        .sort_values("i")["r"]
        .to_numpy(dtype="float64")
    )
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)


@given(
    seed=st.integers(0, 2**31 - 1),
    hl_min=st.sampled_from([5, 30, 240]),
    ignore_na=st.booleans(),
    mp=st.sampled_from([0, 2]),
)
@settings(**_SETTINGS)
def test_ewm_times_property_matches_pandas(spark, seed, hl_min, ignore_na, mp):
    """Random irregular gaps (seconds→days, incl. decay-underflow
    spans) × NaN patterns × halflife × ignore_na × min_periods: the
    distributed wall-clock ewm must match stock pandas. Times are
    strictly increasing here — duplicate-timestamp tie order is the
    documented arbitrary case, covered separately in test_window.py."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 150))
    gaps = rng.choice([1.0, 30.0, 3600.0, 86400.0 * 3], size=n,
                      p=[0.5, 0.3, 0.15, 0.05])
    t = pd.Timestamp("2024-01-01") + pd.to_timedelta(np.cumsum(gaps), unit="s")
    vals = rng.standard_normal(n) * 5
    vals[rng.integers(0, n, max(1, n // 8))] = np.nan
    if np.isnan(vals).all():
        vals[0] = 1.0
    pdf = pd.DataFrame({"idx": np.arange(n, dtype="int64"), "ts": t, "x": vals})
    hl = pd.Timedelta(minutes=hl_min)
    expected = pdf.x.ewm(
        halflife=hl, times=pd.DatetimeIndex(pdf.ts),
        ignore_na=ignore_na, min_periods=mp,
    ).mean().to_numpy()
    got = (
        parallelize(spark.createDataFrame(pdf).repartition(6))
        .series("x")
        .ewm(halflife=hl, times="ts", ignore_na=ignore_na, min_periods=mp)
        .mean(output_col="r")
        .toPandas().sort_values("idx")["r"].to_numpy(dtype="float64")
    )
    assert np.allclose(got, expected, rtol=1e-9, atol=1e-12, equal_nan=True)


# ---------------------------------------------------------------------------
# r9: graph + dedup-collapse properties
# ---------------------------------------------------------------------------


@st.composite
def edge_lists(draw):
    """Random multi-component graphs: dup edges, reversed edges,
    self-loops, shuffled non-contiguous ids."""
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    n_nodes = draw(st.integers(min_value=2, max_value=60))
    n_edges = draw(st.integers(min_value=1, max_value=120))
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n_nodes * 3)[:n_nodes]  # sparse id space
    a = ids[rng.integers(0, n_nodes, n_edges)]
    b = ids[rng.integers(0, n_nodes, n_edges)]
    return pd.DataFrame({"id_a": a, "id_b": b})


@given(edges=edge_lists())
@settings(**_SETTINGS)
def test_star_contraction_matches_propagation_property(spark, edges):
    """The r9 default (large-star/small-star) must label EVERY random
    graph identically to min-label propagation — components, ids,
    row-per-node multiplicity."""
    from pandarallel_spark.operators.graph import connected_components

    sdf = spark.createDataFrame(edges)
    star = (
        connected_components(sdf, max_iter=40, algorithm="star")
        .toPandas().sort_values("node", ignore_index=True)
    )
    prop = (
        connected_components(sdf, max_iter=200, algorithm="propagation")
        .toPandas().sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(star, prop)


@st.composite
def dup_corpora(draw):
    """Random small corpora with injected exact duplicates and
    one-word-edit near-duplicates over a tiny vocabulary."""
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    n_base = draw(st.integers(min_value=2, max_value=10))
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "zeta", "kappa"]
    rows = []
    next_id = 0
    for _ in range(n_base):
        ln = int(rng.integers(4, 10))
        words = [vocab[i] for i in rng.integers(0, len(vocab), ln)]
        text = " ".join(words)
        for _ in range(int(rng.integers(1, 4))):  # exact copies
            rows.append((next_id, text))
            next_id += 1
        if rng.random() < 0.5 and ln >= 4:  # a near-dup edit
            w2 = list(words)
            w2[int(rng.integers(0, ln))] = vocab[int(rng.integers(0, len(vocab)))]
            rows.append((next_id, " ".join(w2)))
            next_id += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@given(corpus=dup_corpora())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_minhash_collapse_matches_exact_property(spark, corpus):
    """The exact-first collapsed MinHash pipeline must reproduce the
    exact n-gram Jaccard pair set VALUE-for-value on random corpora
    with injected exact- and near-duplicates (identical shingle sets
    collide in all bands, so LSH recall is total on the dup structure
    this generator plants)."""
    from pandarallel_spark.operators import dedup

    sdf = spark.createDataFrame(corpus)
    exact = (
        dedup.ngram_jaccard_pairs(sdf, "doc_id", "text", n=3, threshold=0.6)
        .toPandas().set_index(["id_a", "id_b"]).jaccard.sort_index()
    )
    lsh = (
        dedup.minhash_lsh_pairs(sdf, "doc_id", "text", n=3, threshold=0.6)
        .toPandas().set_index(["id_a", "id_b"]).jaccard.sort_index()
    )
    # LSH ⊆ exact always, with identical values where present
    assert set(lsh.index) <= set(exact.index)
    pd.testing.assert_series_equal(lsh, exact.loc[lsh.index].sort_index())
    # exact-duplicate pairs (jaccard 1.0) are NEVER missed — all-band
    # collision is structural, not probabilistic
    ones = exact[exact == 1.0]
    assert set(ones.index) <= set(lsh.index)
