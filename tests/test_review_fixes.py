"""Regression tests for the r4 review findings on the pre-r4 operator
core (relational set ops, NULL handling in distinct counts / sampling /
quality, as-of name collisions, similarity scale-path guards)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_except_rows_is_set_difference(spark):
    """SQL EXCEPT: a row present ANYWHERE in b is excluded, regardless
    of multiplicities (exceptAll().distinct() kept rows whose count in
    a exceeded their count in b)."""
    from pandarallel_spark.operators.relational import except_rows

    a = spark.createDataFrame(pd.DataFrame({"x": [1, 1, 2, 3]}))
    b = spark.createDataFrame(pd.DataFrame({"x": [1, 3]}))
    out = sorted(r.x for r in except_rows(a, b).collect())
    assert out == [2]


def test_skew_safe_count_distinct_ignores_nulls(spark):
    """COUNT(DISTINCT col) semantics: NULLs don't count, and an
    all-NULL key still appears with count 0."""
    from pandarallel_spark.operators.relational import skew_safe_count_distinct

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b", "b", "c"],
                "v": [1.0, None, 2.0, None, None, 3.0],
            }
        )
    )
    got = {
        r.k: r.v_distinct
        for r in skew_safe_count_distinct(df, ["k"], "v").collect()
    }
    exact = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == exact == {"a": 2, "b": 0, "c": 1}


def test_asof_join_output_name_collisions(spark):
    """Left columns named like suffixed outputs (or suffix='') must get
    fresh unique names instead of duplicate columns / AnalysisException."""
    from pandarallel_spark.operators.join import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1], "ts": [10, 20], "price_asof": [0.1, 0.2]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [5], "price": [9.9]})
    )
    out = asof_join(left, right, on="k", left_ts="ts", value_cols=["price"])
    assert len(out.columns) == len(set(out.columns))
    pdf = out.toPandas().sort_values("ts")
    # the matched right price lands in a NON-colliding column
    new_cols = [c for c in out.columns if c not in ("k", "ts", "price_asof", "ts_asof")]
    assert len(new_cols) == 1 and pdf[new_cols[0]].tolist() == [9.9, 9.9]
    # the left payload column is untouched
    assert pdf["price_asof"].tolist() == [0.1, 0.2]


def test_hash_split_null_ids_get_null_split(spark):
    from pandarallel_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        pd.DataFrame({"id": pd.array([1, 2, None, 4, None], dtype="Int64")})
    )
    out = hash_split(df, "id", {"train": 0.5, "test": 0.5}).toPandas()
    assert out.loc[out.id.isna(), "split"].isna().all()
    assert out.loc[~out.id.isna(), "split"].notna().all()


def test_sample_per_group_nulls_rank_last(spark):
    from pandarallel_spark.operators.sampling import sample_per_group

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": ["a"] * 5 + ["b"],
                "id": pd.array([None, 1, 2, 3, 4, None], dtype="Int64"),
            }
        )
    )
    out = sample_per_group(df, ["g"], 2, "id").toPandas()
    # group a has 4 non-null ids → the NULL row must not be sampled
    assert out.loc[out.g == "a", "id"].notna().all()
    # group b has only a NULL row → it fills the shortfall
    assert len(out[out.g == "b"]) == 1


def test_quality_score_empty_text_is_zero(spark):
    from pandarallel_spark.operators.text import quality_score

    df = spark.createDataFrame(
        pd.DataFrame({"t": ["", "   ", "a solid little sentence here"]})
    )
    vals = df.select(quality_score("t").alias("q")).toPandas()["q"]
    assert vals.notna().all()
    assert vals.iloc[0] == 0.0 and vals.iloc[1] == 0.0 and vals.iloc[2] > 0.0


def test_similarity_scale_paths_reject_non_integral_ids(spark):
    from pandarallel_spark.operators import similarity

    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": ["a", "b"], "embedding": [[1.0, 0.0], [0.0, 1.0]]}
        )
    )
    for fn in (similarity.topk_numpy, similarity.ivf_topk,
               similarity.lsh_bucketed_topk, similarity.ivf_pq_topk):
        with pytest.raises(TypeError, match="integral id"):
            fn(emb, emb, k=1)


def test_cosine_pairs_q_empty_input_clear_error(spark):
    from pandarallel_spark.operators.similarity import cosine_pairs_q

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        cosine_pairs_q(empty)


def test_pack_sequences_tiebreak_total_order(spark):
    """With tied order_by values, the documented tiebreak column makes
    pack assignment deterministic: equal inputs under different
    partitionings must agree."""
    from pandarallel_spark.operators.sampling import pack_sequences

    pdf = pd.DataFrame(
        {
            "shard": ["s"] * 8,
            "ord": [1, 1, 1, 1, 2, 2, 2, 2],
            "doc": [f"d{i}" for i in range(8)],
            "n": [3, 3, 3, 3, 3, 3, 3, 3],
        }
    )
    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(pdf).repartition(parts)
        outs.append(
            pack_sequences(
                df, "n", 4, shard_by=["shard"], order_by="ord", tiebreak=["doc"]
            )
            .toPandas()
            .sort_values("doc")["pack_id"]
            .tolist()
        )
    assert outs[0] == outs[1]
    # greedy by (ord, doc): prefix sums 0,3,6,... → pack = prefix // 4
    assert outs[0] == [0, 0, 1, 2, 3, 3, 4, 5]


# ---------------------------------------------------------------------------
# compat-shim parity fixes (round 4 review, second pass)
# ---------------------------------------------------------------------------


@pytest.fixture()
def shim():
    from pandarallel_spark.compat import pandarallel

    pandarallel.initialize(progress_bar=False, verbose=0)
    return pandarallel


def test_shim_groupby_row_subset_matches_pandas(spark, shim):
    """Row-subset results (nlargest) must carry the selected rows' REAL
    labels under a (key, label) MultiIndex, exactly like pandas — not
    the group's first labels."""
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {"k": rng.integers(0, 5, 300), "x": rng.random(300)},
        index=rng.permutation(np.arange(1000, 1300)),
    )
    expected = pdf.groupby("k").apply(lambda g: g.nlargest(2, "x"), include_groups=True)
    got = pdf.groupby("k").parallel_apply(lambda g: g.nlargest(2, "x"))
    pd.testing.assert_frame_equal(got, expected)


def test_shim_groupby_series_result_matches_pandas(spark, shim):
    """Series-per-group results widen into a DataFrame with the Series
    labels as columns, like pandas — not a Series stuffed in a double."""
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({"k": rng.integers(0, 4, 200), "x": rng.random(200)})
    f = lambda g: pd.Series(  # noqa: E731
        {"lo": float(g.x.min()), "hi": float(g.x.max())}
    )
    expected = pdf.groupby("k").apply(f, include_groups=True)
    got = pdf.groupby("k").parallel_apply(f)
    pd.testing.assert_frame_equal(got, expected)


def test_shim_col_apply_int_labels_and_int_dtypes(spark, shim):
    """Default integer column labels (RangeIndex columns) must survive
    the axis=0 distribution, and int reductions stay int64 — including
    values past 2^53, which a forced double round-trip corrupts."""
    big = (1 << 55) + 3
    pdf = pd.DataFrame(
        np.ones((200, 6), dtype="int64"), columns=range(6)
    )
    pdf.iloc[0, :] = big
    f = lambda s: s.max()  # noqa: E731
    expected = pdf.apply(f, axis=0)
    got = pdf.parallel_apply(f, axis=0)
    pd.testing.assert_series_equal(got, expected)
    assert got.dtype == np.dtype("int64") and got.iloc[0] == big
    # transform with int labels: pivot path must map labels back
    t = lambda s: s * 2  # noqa: E731
    pd.testing.assert_frame_equal(
        pdf.parallel_apply(t, axis=0), pdf.apply(t, axis=0)
    )


def test_shim_applymap_kwargs_and_na_action(spark, shim):
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({"a": rng.random(200), "b": rng.random(200)})
    pdf.iloc[3, 0] = np.nan
    f = lambda x, k: x * k  # noqa: E731
    expected = pdf.map(f, na_action="ignore", k=3.0)
    got = pdf.parallel_applymap(f, na_action="ignore", k=3.0)
    pd.testing.assert_frame_equal(got, expected)


def test_shim_multiindex_inputs_fall_back_exactly(spark, shim):
    """MultiIndexed inputs have no faithful Arrow shipping — they must
    run stock pandas (exact), not crash in createDataFrame."""
    idx = pd.MultiIndex.from_product([["a", "b"], range(100)], names=["g", "i"])
    pdf = pd.DataFrame({"x": np.arange(200, dtype="float64")}, index=idx)
    f = lambda row: row.x * 2  # noqa: E731
    pd.testing.assert_series_equal(
        pdf.parallel_apply(f, axis=1), pdf.apply(f, axis=1)
    )
    s = pdf["x"]
    pd.testing.assert_series_equal(
        s.parallel_apply(lambda v: v + 1), s.apply(lambda v: v + 1)
    )


def test_apply_rows_result_shadows_input_column(spark):
    """include_input=True with a result that reuses input names must
    resolve result-wins (single occurrence per name), not emit a
    duplicate-name schema that dies in mapInPandas."""
    from pandarallel_spark.operators.apply import apply_rows

    pdf = pd.DataFrame({"a": np.arange(100, dtype="float64"), "b": np.ones(100)})
    sdf = spark.createDataFrame(pdf)
    out = apply_rows(sdf, lambda row: row * 2)
    assert sorted(out.columns) == ["a", "b"]
    got = out.toPandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == (pdf["a"] * 2).tolist()


def test_grouped_apply_frame_mode_without_schema(spark):
    """mode='frame' with schema=None must infer, and a pinned mode that
    contradicts the sampled shape must raise, not be overwritten."""
    from pandarallel_spark.operators.groupby import grouped_apply

    pdf = pd.DataFrame({"k": [1, 1, 2, 2], "x": [1.0, 2.0, 3.0, 4.0]})
    sdf = spark.createDataFrame(pdf)
    out = grouped_apply(
        sdf, ["k"], lambda g: g.assign(y=g.x * 2), mode="frame"
    ).toPandas()
    assert "y" in out.columns and len(out) == 4
    with pytest.raises(ValueError, match="pinned mode"):
        grouped_apply(sdf, ["k"], lambda g: g.assign(y=g.x * 2), mode="scalar")


def test_sessionize_exact_gap_matches_session_window(spark):
    """An event at exactly prev+gap MERGES into the session:
    F.session_window's boundary is inclusive (verified here — a review
    suggestion claimed half-open [start, last+gap) and was refuted), so
    the batch twin's strict '>' gap test is the correct mirror."""
    from pandarallel_spark.streaming import sessionize

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 12:00:00",
                    "2024-01-01 12:30:00",  # exactly prev+gap → merges
                    "2024-01-01 12:45:00",
                    "2024-01-01 13:15:00.000001",  # 1µs past gap → new
                ],
                format="ISO8601",
            ),
        }
    )
    ev = spark.createDataFrame(pdf)
    batch = sessionize(
        ev, "ts", "user_id", "30 minutes", {"n": F.count(F.lit(1))}
    ).toPandas()
    sw = (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    assert len(batch) == len(sw) == 2
    assert sorted(batch["n"]) == sorted(sw["n"]) == [1, 3]


def test_uint64_schema_inference_rejected():
    """uint64 has no lossless signed Spark type — inference must raise,
    not silently declare bigint (hash outputs live above 2^63)."""
    from pandarallel_spark.plans.schema import pandas_dtype_to_spark

    with pytest.raises(TypeError, match="uint64"):
        pandas_dtype_to_spark(np.dtype("uint64"))
    # the other unsigned widths still widen losslessly
    assert pandas_dtype_to_spark(np.dtype("uint32")).simpleString() == "bigint"


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_heavy_hitters_exact_matches_groupby(spark):
    """exact=True must EQUAL groupBy().count().filter(>= T) even with a
    tiny capacity that forces constant decrements — the candidate
    superset guarantee is what's being stressed."""
    import numpy as np
    import pandas as pd
    from pandarallel_spark.operators.relational import heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish: few hot keys, long tail of ~2000 rare keys
    hot = np.repeat([f"hot{i}" for i in range(8)], [900, 700, 500, 400, 300, 250, 200, 150])
    tail = np.array([f"t{i}" for i in rng.integers(0, 2000, 4000)])
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    pdf = pd.DataFrame({"k": keys})
    pdf.loc[rng.integers(0, len(pdf), 50), "k"] = None  # NULLs ignored
    sdf = spark.createDataFrame(pdf).repartition(16)

    exp = (
        pdf.dropna().groupby("k").size().reset_index(name="count")
        .query("count >= 140").sort_values("k").reset_index(drop=True)
    )
    for cap in (16, 256):  # cap=16 ≪ distinct: heavy decrement pressure
        got = (
            heavy_hitters(sdf, "k", min_count=140, capacity=cap)
            .toPandas().sort_values("k").reset_index(drop=True)
        )
        assert got.equals(exp.astype({"count": got["count"].dtype})), f"cap={cap}"
    # share-based threshold: 140 / n_nonnull as a fraction
    n = len(pdf.dropna())
    got_share = (
        heavy_hitters(sdf, "k", min_share=140.0 / n, capacity=64)
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert got_share.equals(exp.astype({"count": got_share["count"].dtype}))


def test_heavy_hitters_bounds_mode(spark):
    """exact=False returns (key, lower, upper) with the MG guarantee
    lower ≤ true ≤ upper for every candidate, and every true heavy
    hitter present."""
    import numpy as np
    import pandas as pd
    from pandarallel_spark.operators.relational import heavy_hitters

    rng = np.random.default_rng(11)
    keys = np.concatenate([
        np.repeat("alpha", 500), np.repeat("beta", 300),
        np.array([f"r{i}" for i in rng.integers(0, 800, 1500)]),
    ])
    rng.shuffle(keys)
    sdf = spark.createDataFrame(pd.DataFrame({"k": keys})).repartition(8)
    true = pd.Series(keys).value_counts()
    got = heavy_hitters(sdf, "k", min_count=250, capacity=32, exact=False).toPandas()
    for _, row in got.iterrows():
        t = int(true[row.k])
        assert row.lower_bound <= t <= row.upper_bound, row.k
    present = set(got.k)
    for k, c in true.items():
        if c >= 250:
            assert k in present, f"missing true heavy hitter {k} ({c})"


def test_heavy_hitters_rejections(spark):
    import pandas as pd
    from pandarallel_spark.operators.relational import heavy_hitters

    sdf = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"]}))
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(sdf, "k")
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(sdf, "k", min_count=2, min_share=0.5)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(sdf, "k", min_count=2, capacity=0)


def test_heavy_hitters_superset_guard_fallback(spark):
    """Review finding r7 (high): when the total MG decrement reaches the
    threshold, a key with true count ≥ T can be evicted from EVERY
    partition summary and silently vanish from the candidate set. The
    guard must detect decr ≥ T, warn, and fall back to the exact plan —
    output still EQUALS groupBy().count().filter(>= T)."""
    import warnings as _w

    import numpy as np
    import pandas as pd
    from pandarallel_spark.operators.relational import heavy_hitters

    rng = np.random.default_rng(42)
    # a key universe far above capacity with NO dominant keys: with
    # capacity=4 every partition evicts constantly, so the total
    # decrement dwarfs a small absolute threshold like 6 — the exact
    # scenario the old gate missed (keys with count 6-10 evicted
    # everywhere, lb absent, yet true count ≥ T)
    keys = np.array([f"k{i}" for i in rng.integers(0, 400, 6000)])
    pdf = pd.DataFrame({"k": keys})
    sdf = spark.createDataFrame(pdf).repartition(16)
    exp = (
        pdf.groupby("k").size().reset_index(name="count")
        .query("count >= 18").sort_values("k").reset_index(drop=True)
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got = (
            heavy_hitters(sdf, "k", min_count=18, capacity=4)
            .toPandas().sort_values("k").reset_index(drop=True)
        )
    assert any("cannot guarantee" in str(w.message) for w in rec)
    assert got.equals(exp.astype({"count": got["count"].dtype}))
    # bounds mode degenerates to lower == upper == count in fallback
    with _w.catch_warnings(record=True):
        _w.simplefilter("always")
        bounds = heavy_hitters(
            sdf, "k", min_count=18, capacity=4, exact=False
        ).toPandas()
    assert (bounds.lower_bound == bounds.upper_bound).all()
    assert set(bounds.k) == set(exp.k)
    # sketch path (ample capacity) must NOT warn
    with _w.catch_warnings(record=True) as rec2:
        _w.simplefilter("always")
        heavy_hitters(sdf, "k", min_count=18, capacity=4096).toPandas()
    assert not any("cannot guarantee" in str(w.message) for w in rec2)


def test_heavy_hitters_preserves_key_type(spark):
    """Non-string keys come back in their source type (review low r7):
    the advertised groupBy(col).count() equivalence includes dtype."""
    import pandas as pd
    from pandarallel_spark.operators.relational import (
        grouped_heavy_hitters,
        heavy_hitters,
    )

    pdf = pd.DataFrame({"k": [1, 1, 1, 2, 2, 3], "g": [10, 10, 10, 10, 20, 20]})
    sdf = spark.createDataFrame(pdf)
    out = heavy_hitters(sdf, "k", min_count=2, capacity=64)
    assert dict(out.dtypes)["k"] == "bigint"
    got = out.toPandas().sort_values("k").reset_index(drop=True)
    assert list(got.k) == [1, 2] and list(got["count"]) == [3, 2]
    gout = grouped_heavy_hitters(sdf, "g", "k", min_count=2, capacity=64)
    dt = dict(gout.dtypes)
    assert dt["g"] == "bigint" and dt["k"] == "bigint"
    grows = gout.toPandas().sort_values(["g", "k"]).values.tolist()
    assert grows == [[10, 1, 3]]


def test_grouped_heavy_hitters_superset_guard(spark):
    """Grouped form: the decrement budget is global, the threshold is
    per-group — the guard must key off the SMALLEST group threshold."""
    import warnings as _w

    import numpy as np
    import pandas as pd
    from pandarallel_spark.operators.relational import grouped_heavy_hitters

    rng = np.random.default_rng(5)
    rows = [("big", f"t{i}") for i in rng.integers(0, 300, 5000)]
    rows += [("small", "hh")] * 12 + [("small", f"s{i}") for i in range(20)]
    pdf = pd.DataFrame(rows, columns=["g", "k"])
    sdf = spark.createDataFrame(pdf).repartition(16)
    # min_share=0.3: threshold for "small" is ceil(0.3*32)=10 — far
    # below the decrement a capacity-4 sketch racks up on "big"
    truth = pdf.groupby(["g", "k"]).size().reset_index(name="count")
    gn = pdf.groupby("g").size()
    import math

    exp = truth[truth.apply(
        lambda r: r["count"] >= math.ceil(0.3 * gn[r.g]), axis=1
    )].sort_values(["g", "k"]).reset_index(drop=True)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got = (
            grouped_heavy_hitters(sdf, "g", "k", min_share=0.3, capacity=4)
            .toPandas().sort_values(["g", "k"]).reset_index(drop=True)
        )
    assert any("cannot guarantee" in str(w.message) for w in rec)
    assert got.equals(exp.astype({"count": got["count"].dtype}))


def test_grouped_heavy_hitters_exact(spark):
    """Per-group MG must equal groupBy(group,key).count().filter(per-
    group threshold) even under tiny capacity, for both absolute and
    share thresholds."""
    import numpy as np
    import pandas as pd
    from pandarallel_spark.operators.relational import grouped_heavy_hitters

    rng = np.random.default_rng(3)
    rows = []
    for g, hot_n in (("en", 400), ("fr", 150)):
        rows += [(g, "hot")] * hot_n
        rows += [(g, f"t{i}") for i in rng.integers(0, 500, 1200)]
    pdf = pd.DataFrame(rows, columns=["lang", "tok"])
    sdf = spark.createDataFrame(pdf).repartition(16)

    truth = pdf.groupby(["lang", "tok"]).size().reset_index(name="count")
    # absolute threshold
    exp = truth.query("count >= 100").sort_values(["lang", "tok"]).reset_index(drop=True)
    got = (
        grouped_heavy_hitters(sdf, "lang", "tok", min_count=100, capacity=32)
        .toPandas().sort_values(["lang", "tok"]).reset_index(drop=True)
    )
    assert got.equals(exp.astype({"count": got["count"].dtype}))
    # per-group share: 10% of each group's rows
    gn = pdf.groupby("lang").size()
    import math
    exp2 = truth[truth.apply(lambda r: r["count"] >= math.ceil(0.1 * gn[r.lang]), axis=1)]
    exp2 = exp2.sort_values(["lang", "tok"]).reset_index(drop=True)
    got2 = (
        grouped_heavy_hitters(sdf, "lang", "tok", min_share=0.1, capacity=64)
        .toPandas().sort_values(["lang", "tok"]).reset_index(drop=True)
    )
    assert got2.equals(exp2.astype({"count": got2["count"].dtype}))


# ---------------------------------------------------------------------------
# A-ES weighted sampling (r8)
# ---------------------------------------------------------------------------


def _aes_reference(ids, weights, k, seed):
    """Driver-side reference of the exact same md5 key math."""
    import hashlib
    import math

    keyed = []
    for i, w in zip(ids, weights):
        if w is None or w <= 0 or i is None:
            continue
        h = int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 2**32
        keyed.append((math.log(u) / w, -i))
    keyed.sort(reverse=True)
    return [-i for _, i in keyed[:k]]


def test_weighted_sample_matches_reference_and_stats(spark):
    """A-ES weighted sample: bit-equal to a hashlib/math reference of
    the same key construction (global and grouped), deterministic
    across runs, excludes non-positive/NULL weights — and statistically
    favors heavy rows across seeds."""
    import numpy as np
    import pandas as pd
    from pandarallel_spark.operators.sampling import weighted_sample

    rng = np.random.default_rng(3)
    n = 300
    pdf = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "w": rng.integers(1, 50, n).astype("float64"),
        "g": np.repeat(["a", "b", "c"], n // 3),
    })
    pdf.loc[5, "w"] = 0.0     # excluded
    pdf.loc[6, "w"] = -2.0    # excluded
    sdf = spark.createDataFrame(pdf).repartition(8)

    got = sorted(
        r.id for r in weighted_sample(sdf, "id", "w", 25, seed=9).collect()
    )
    exp = sorted(_aes_reference(pdf.id, pdf.w, 25, 9))
    assert got == exp
    assert 5 not in got and 6 not in got
    # grouped form: per-group reference
    gout = weighted_sample(sdf, "id", "w", 7, seed=9, keys=["g"]).toPandas()
    for g, grp in pdf.groupby("g"):
        exp_g = sorted(_aes_reference(grp.id, grp.w, 7, 9))
        assert sorted(gout[gout.g == g].id) == exp_g
    # statistics: across seeds, a weight-40 row should be drawn far
    # more often than a weight-1 row (successive-sampling marginals)
    small = pd.DataFrame({
        "id": np.arange(80, dtype="int64"),
        "w": np.where(np.arange(80) < 40, 1.0, 40.0),
    })
    sm = spark.createDataFrame(small)
    heavy_hits = light_hits = 0
    for seed in range(20):
        ids = [r.id for r in weighted_sample(sm, "id", "w", 10, seed=seed).collect()]
        heavy_hits += sum(1 for i in ids if i >= 40)
        light_hits += sum(1 for i in ids if i < 40)
    assert heavy_hits > 6 * max(light_hits, 1), (heavy_hits, light_hits)


def test_weighted_sample_global_plan_is_partial_topk(spark):
    """The global form must plan as TakeOrderedAndProject (per-task
    local top-k), never a full sort."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    import numpy as np
    import pandas as pd
    from pandarallel_spark.operators.sampling import weighted_sample

    pdf = pd.DataFrame({
        "id": np.arange(1000, dtype="int64"),
        "w": np.ones(1000),
    })
    out = weighted_sample(spark.createDataFrame(pdf).repartition(8), "id", "w", 10)
    buf = _io.StringIO()
    with _rs(buf):
        out.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_heavy_hitters_strict_lazy_and_empty_input(spark):
    """r8 review: the MG summary pass is an eager build-time job, so it
    must honor strictLazy like every other eager site; an EMPTY input
    must not emit the raise-capacity warning (thr = decr = 0 is the
    trivial fallback, not a capacity problem)."""
    import warnings as _w

    from pandarallel_spark.operators.relational import (
        grouped_heavy_hitters,
        heavy_hitters,
    )

    sdf = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "g": ["x", "y"]}))
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="strictLazy.*heavy-hitters"):
            heavy_hitters(sdf, "k", min_count=1)
        with pytest.raises(RuntimeError, match="strictLazy.*heavy-hitters"):
            grouped_heavy_hitters(sdf, "g", "k", min_count=1)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
    empty = spark.createDataFrame([], "k string, g string")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        assert heavy_hitters(empty, "k", min_share=0.1).count() == 0
        assert grouped_heavy_hitters(empty, "g", "k", min_share=0.1).count() == 0
    assert not any("cannot guarantee" in str(w.message) for w in rec)
    # a Column threshold is rejected with a message naming the reason
    with pytest.raises(ValueError, match="plain int"):
        heavy_hitters(sdf, "k", min_count=F.lit(5))


def test_weighted_sample_accepts_bare_string_key(spark):
    from pandarallel_spark.operators.sampling import weighted_sample

    pdf = pd.DataFrame({
        "id": np.arange(40, dtype="int64"),
        "w": np.ones(40),
        "grp": np.repeat(["a", "b"], 20),
    })
    out = weighted_sample(
        spark.createDataFrame(pdf), "id", "w", 3, keys="grp"
    ).toPandas()
    assert sorted(out.grp.value_counts().to_dict().items()) == [("a", 3), ("b", 3)]


def test_temperature_mix_rates_and_edges(spark):
    """Temperature mixing: the smallest stratum keeps 100%, head
    strata thin toward (n/n_min)^(alpha-1), alpha=1 keeps everything,
    NULL strata/ids drop, bad alpha rejected."""
    from pandarallel_spark.operators.sampling import temperature_mix

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "id": np.arange(13_000, dtype="int64"),
        "lang": np.repeat(
            ["en", "es", "fr"], [10_000, 2_000, 1_000]
        ),
    })
    pdf.loc[0, "lang"] = None
    sdf = spark.createDataFrame(pdf).repartition(8)
    out = temperature_mix(sdf, "lang", "id", alpha=0.5).toPandas()
    kept = out.lang.value_counts().to_dict()
    # fr (smallest): rate 1 → all 1000 kept
    assert kept["fr"] == 1_000
    # en: rate = (10000/1000)^(-0.5) ≈ 0.3162 → ~3162 of 10000 (md5
    # uniformity at this n: ±3σ ≈ ±44)
    assert abs(kept["en"] - 3162) < 150, kept
    # es: rate = 2^(-0.5) ≈ 0.7071 → ~1414 of 2000
    assert abs(kept["es"] - 1414) < 100, kept
    assert out.lang.notna().all()
    # alpha=1: identity (minus the NULL-strata row)
    full = temperature_mix(sdf, "lang", "id", alpha=1.0).count()
    assert full == 12_999
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(sdf, "lang", "id", alpha=1.5)


def test_weighted_sample_excludes_nan_weights(spark):
    """NaN > 0 is TRUE in Spark and NaN sorts first under desc() — a
    NaN-weight row must be excluded, not crowned (review finding r8)."""
    from pandarallel_spark.operators.sampling import weighted_sample

    pdf = pd.DataFrame({
        "id": np.arange(6, dtype="int64"),
        "w": [1.0, 2.0, float("nan"), 3.0, float("nan"), 4.0],
    })
    got = sorted(
        r.id for r in weighted_sample(
            spark.createDataFrame(pdf), "id", "w", 3
        ).collect()
    )
    assert 2 not in got and 4 not in got and len(got) == 3


def test_grouped_heavy_hitters_rejects_column_threshold(spark):
    from pandarallel_spark.operators.relational import grouped_heavy_hitters

    sdf = spark.createDataFrame(pd.DataFrame({"g": ["a"], "k": ["x"]}))
    with pytest.raises(ValueError, match="plain int"):
        grouped_heavy_hitters(sdf, "g", "k", min_count=F.lit(5))


def test_temperature_mix_null_ids_excluded_from_rates(spark):
    """ADVICE r9: per-stratum counts must run over the SAMPLEABLE
    population (id NOT NULL). A stratum made of only-NULL ids must not
    pin n_min, and NULL ids inside a stratum must not deflate its
    realized keep rate."""
    import numpy as np
    import pandas as pd

    from pandarallel_spark.operators.sampling import temperature_mix

    pdf = pd.DataFrame({
        "id": pd.array(np.arange(5_000, dtype="int64"), dtype="Int64"),
        "lang": np.repeat(["en", "es"], [4_000, 1_000]),
    })
    # a ghost stratum of 10 rows, ALL with NULL ids: must neither
    # appear in the output nor become n_min (which would crush en/es
    # rates by 100x)
    ghost = pd.DataFrame({
        "id": pd.array([None] * 10, dtype="Int64"),
        "lang": ["zz"] * 10,
    })
    # and 2_000 NULL-id rows inside en: en's rate must come from its
    # 4_000 sampleable rows, not 6_000
    en_null = pd.DataFrame({
        "id": pd.array([None] * 2_000, dtype="Int64"),
        "lang": ["en"] * 2_000,
    })
    sdf = spark.createDataFrame(pd.concat([pdf, ghost, en_null]))
    out = temperature_mix(sdf, "lang", "id", alpha=0.5).toPandas()
    kept = out.lang.value_counts().to_dict()
    assert "zz" not in kept
    # es is the smallest sampleable stratum → rate 1, all 1000 kept
    assert kept["es"] == 1_000
    # en rate = (4000/1000)^(-0.5) = 0.5 over 4000 sampleable rows
    # (the buggy form computed (6000/10)^(-0.5) ≈ 0.041 → ~163 rows)
    assert abs(kept["en"] - 2_000) < 120, kept


def test_pin_small_overcap_falls_back_to_checkpoint(spark):
    """r9 (ADVICE): _pin_small collects small sets driver-side for
    fault tolerance; past the cap it must fall back to localCheckpoint
    (never a driver OOM) and both forms must return identical rows."""
    import pandas as pd

    from pandarallel_spark.operators.relational import _pin_small

    pdf = pd.DataFrame({"__k__": [f"k{i}" for i in range(50)],
                        "__lb__": range(50)})
    sdf = spark.createDataFrame(pdf)
    small = _pin_small(sdf, "__k__ string, __lb__ bigint")
    over = _pin_small(sdf, "__k__ string, __lb__ bigint", cap=10)
    a = small.toPandas().sort_values("__k__", ignore_index=True)
    b = over.toPandas().sort_values("__k__", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    # the pinned form must not reference the source lineage (it is a
    # LocalRelation/parallelized plan, not a projection of sdf)
    plan = small._jdf.queryExecution().executedPlan().toString().lower()
    assert "localtablescan" in plan or "existingrdd" in plan, plan
