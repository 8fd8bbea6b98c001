"""Trained quality filter (operators/quality_model.py): curated-vs-
crawl logistic regression over the library's JVM feature expressions.
Reference frame: Brown et al. 2020 §A / CCNet quality filtering; the
reference repo (pandarallel) has no corpus-quality surface."""

import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.quality_model import (
    QualityFilter,
    feature_names,
    train_quality_filter,
)

_CLEAN = [
    "the quick brown fox jumps over the lazy dog and runs into the field",
    "a clear and well formed sentence with normal words of usual length",
    "spark compiles the declarative plan into stages and runs them",
    "the weather in the valley was mild and the harvest was plentiful",
    "she walked to the market and bought bread and cheese for the family",
    "engineers write tests so that the behavior of the system is pinned",
    "the committee agreed to publish the findings in the spring report",
    "a calm river flows past the old mill at the edge of the town",
]
_GARBAGE = [
    "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~",
    "zzzzzzzzzzzz qqqqqqqqqqq xxxxxxxxxxxx jjjjjjjjjjjj wwwwwwwww",
    "buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy",
    "192.168.0.1 10.0.0.2 172.16.4.5 8.8.8.8 1.1.1.1 255.255.255.0",
    "AAAAA BBBBB CCCCC DDDDD EEEEE FFFFF GGGGG HHHHH IIIII JJJJJ",
    "!@# $%^ &*( )_+ {}| :\"< >?~ `12 345 678 90- =[] \\;' ,./",
    "x x x x x x x x x x x x x x x x x x x x x x x x x x x x",
    "0101010101 1010101010 0101010101 1010101010 0101010101",
]


def _df(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "id long, text string"
    )


@pytest.fixture()
def model(spark):
    return train_quality_filter(
        _df(spark, _CLEAN), _df(spark, _GARBAGE, 100), "text"
    )


def test_separates_clean_from_garbage(spark, model):
    # held-out docs of each style, not in the training sets
    holdout_clean = _df(spark, [
        "the train arrived at the station and the passengers stepped out",
        "a good essay states its claim and then supports it with evidence",
    ])
    holdout_garbage = _df(spark, [
        "### $$$ %%% ((( ))) !!! ??? *** ~~~ ``` ^^^ @@@",
        "k k k k k k k k k k k k k k k k k k k k k k",
    ], 200)
    pc = model.score(holdout_clean, "text").collect()
    pg = model.score(holdout_garbage, "text").collect()
    assert all(r["quality_prob"] > 0.5 for r in pc)
    assert all(r["quality_prob"] < 0.5 for r in pg)
    # apply keeps the original schema and drops the low side
    kept = model.apply(
        holdout_clean.unionByName(holdout_garbage), "text", min_prob=0.5
    )
    assert kept.columns == ["id", "text"]
    assert sorted(r.id for r in kept.collect()) == [0, 1]


def test_score_preserves_rows_and_handles_empty_text(spark, model):
    df = _df(spark, ["", "   ", "a normal little sentence about the town"])
    got = model.score(df, "text").orderBy("id").collect()
    assert len(got) == 3
    assert all(r["quality_prob"] is not None for r in got)
    assert got[2]["quality_prob"] > got[0]["quality_prob"]


def test_coefficients_and_feature_names(model):
    names = feature_names()
    co = model.coefficients
    assert set(co) == set(names) | {"__intercept__"}
    # stopword_ratio separates these corpora: curated English is
    # stopword-rich, the garbage has none
    assert co["stopword_ratio"] > 0


def test_save_load_scores_identically(spark, model, tmp_path):
    df = _df(spark, _CLEAN + _GARBAGE)
    pth = str(tmp_path / "qmodel")
    model.save(pth)
    again = QualityFilter.load(spark, pth)
    a = [r["quality_prob"] for r in model.score(df, "text").orderBy("id").collect()]
    b = [r["quality_prob"] for r in again.score(df, "text").orderBy("id").collect()]
    assert a == b


def test_end_to_end_on_testdata(spark, sf_dir):
    """Smoke over the synthetic documents table: a model trained on
    high-vs-low heuristic-quality halves scores every doc without
    nulls and with a sane spread."""
    from pandarallel_spark.operators.text import quality_score
    from pandarallel_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = docs.withColumn("h", quality_score("text"))
    med = scored.approxQuantile("h", [0.5], 0.01)[0]
    model = train_quality_filter(
        scored.filter(F.col("h") >= med),
        scored.filter(F.col("h") < med),
        "text",
        max_iter=20,
    )
    out = model.score(docs, "text")
    assert out.filter(F.col("quality_prob").isNull()).count() == 0
    lo, hi = out.agg(
        F.min("quality_prob"), F.max("quality_prob")
    ).first()
    assert 0.0 <= lo <= hi <= 1.0 and hi > lo


def test_rescore_replaces_quality_prob(spark, model):
    """score → apply on an already-scored frame must replace the old
    quality_prob, not duplicate it into ambiguity (review finding r11)."""
    df = _df(spark, _CLEAN[:2])
    scored = model.score(df, "text")
    again = model.score(scored, "text")
    assert again.columns.count("quality_prob") == 1
    # apply on a scored frame re-scores and returns the corpus WITHOUT
    # the (stale) score column — the score is apply's dial, not output
    kept = model.apply(scored, "text", min_prob=0.0)
    assert kept.columns == df.columns
    assert kept.count() == 2


def test_load_rejects_foreign_model(spark, tmp_path):
    """A persisted model whose coefficient count disagrees with this
    library's feature recipe must fail fast, not silently mis-score."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    tiny = spark.createDataFrame(
        [(Vectors.dense([0.0, 1.0]), 0.0), (Vectors.dense([1.0, 0.0]), 1.0)],
        ["features", "label"],
    )
    other = LogisticRegression(maxIter=5).fit(tiny)
    pth = str(tmp_path / "foreign")
    other.write().overwrite().save(pth)
    with pytest.raises(ValueError, match="different recipe"):
        QualityFilter.load(spark, pth)
