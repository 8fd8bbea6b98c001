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
    for fn in (similarity.topk_numpy, similarity.ivf_topk, similarity.lsh_bucketed_topk):
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
