"""Trained corpus-quality filtering (SURVEY.md §2.3) — the CCNet /
GPT-3-style classifier: learn "does this document look like the
curated reference corpus?" from a positive (curated) and a negative
(raw crawl) sample, then score and filter the whole corpus with it.

``text.quality_score`` is the fixed HEURISTIC (oracle-exact, zero
training); this module is the TRAINED tier the big pretraining
pipelines actually use (Brown et al. 2020 §A trained a classifier with
curated data as positives and raw Common Crawl as negatives; CCNet
used a fastText model against Wikipedia). Spark-first all the way
down:

- features are the library's existing pure-JVM expressions
  (``text.quality_features`` + ``text.repetition_signals`` + script
  ratios) — codegen, no Python, NULL-safe;
- training is ``pyspark.ml``'s ``LogisticRegression`` (distributed
  JVM L-BFGS — gradient aggregations are map-side combined tree
  aggregates; nothing is collected but the coefficient vector);
- scoring is ``model.transform`` on the assembled features — a JVM
  projection, no shuffle, usable inside any corpus-cleanup plan.

The model round-trips through ``save``/``load`` (MLlib's native
persistence); the feature recipe is pinned by :func:`feature_names`
order, which both the trainer and every scorer derive from the same
``_feature_cols`` definition — a model trained by one session scores
identically in another.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandarallel_spark.operators.text import (
    quality_features,
    repetition_signals,
)

_PROB_IDX = 1  # P(label=1) inside MLlib's probability vector


def _feature_cols(text_col: str) -> dict[str, Column]:
    """The classifier's feature recipe — pure JVM expressions, ratios
    coalesced to 0.0 so empty/degenerate docs are scoreable instead of
    NULL-poisoning the assembled vector. ONE definition shared by the
    trainer and every scorer: feature order is part of the model."""
    q = quality_features(text_col)
    r = repetition_signals(text_col)
    c = F.col(text_col)
    n_chars = F.nullif(F.length(c).cast("double"), F.lit(0.0))
    count_of = lambda pat: F.length(  # noqa: E731
        F.regexp_replace(c, pat, "")
    ).cast("double")
    out = {
        # log-compressed sizes: raw counts would dominate the linear
        # model's geometry and tie it to document length
        "log_chars": F.log1p(q["n_chars"].cast("double")),
        "log_tokens": F.log1p(q["n_tokens"].cast("double")),
        "avg_token_len": q["avg_token_len"],
        "stopword_ratio": q["stopword_ratio"],
        "dup_line_frac": r["dup_line_frac"],
        "dup_ngram_frac": r["dup_ngram_frac"],
        # script-mix ratios: keep-what-matches counts via strip-and-
        # measure (regexp_replace removes NON-matching chars)
        "alpha_ratio": (F.length(c) - count_of(r"[A-Za-z]")) / n_chars,
        "digit_ratio": (F.length(c) - count_of(r"[0-9]")) / n_chars,
        "punct_ratio": (
            F.length(c) - count_of(r"[^\sA-Za-z0-9]")
        ) / n_chars,
        "upper_ratio": (F.length(c) - count_of(r"[A-Z]")) / n_chars,
    }
    return {k: F.coalesce(v, F.lit(0.0)) for k, v in out.items()}


def feature_names() -> tuple[str, ...]:
    """The assembled feature order — part of the model contract: a
    persisted model only scores correctly through the same recipe."""
    return tuple(sorted(_feature_cols("text")))


def _assemble(df: DataFrame, text_col: str) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    feats = _feature_cols(text_col)
    names = sorted(feats)
    with_feats = df.select(
        "*", *[feats[k].alias(f"__qf_{k}__") for k in names]
    )
    return VectorAssembler(
        inputCols=[f"__qf_{k}__" for k in names], outputCol="__qfeat__"
    ).transform(with_feats)


class QualityFilter:
    """A trained quality classifier. Get one from
    :func:`train_quality_filter` or :meth:`load`; then ``score`` adds
    a ``quality_prob`` column (P(curated-like), JVM projection) and
    ``apply`` filters by it."""

    def __init__(self, model):
        self.model = model

    @property
    def coefficients(self) -> dict[str, float]:
        """Feature-name → learned weight (plus ``__intercept__``) —
        the interpretability read: which signals the curated corpus
        actually separates on."""
        names = sorted(_feature_cols("text"))
        out = dict(zip(names, [float(x) for x in self.model.coefficients]))
        out["__intercept__"] = float(self.model.intercept)
        return out

    def score(self, df: DataFrame, text_col: str) -> DataFrame:
        """``df`` + ``quality_prob`` double — P(label=1 = curated-like).
        A pure JVM projection over the assembled features; the helper
        columns are dropped on the way out."""
        from pyspark.ml.functions import vector_to_array

        scored = self.model.transform(_assemble(df, text_col))
        # a prior quality_prob (re-scoring a persisted frame after a
        # retrain) is REPLACED, not duplicated — a second column of the
        # same name makes every downstream reference ambiguous
        keep = [c for c in df.columns if c != "quality_prob"]
        return scored.select(
            *keep,
            vector_to_array(F.col(self.model.getProbabilityCol()))[
                _PROB_IDX
            ].alias("quality_prob"),
        )

    def apply(
        self, df: DataFrame, text_col: str, min_prob: float = 0.5
    ) -> DataFrame:
        """The corpus filter: rows with ``quality_prob >= min_prob``,
        original schema preserved."""
        return self.score(df, text_col).filter(
            F.col("quality_prob") >= min_prob
        ).drop("quality_prob")

    def save(self, path: str) -> None:
        self.model.write().overwrite().save(path)

    @classmethod
    def load(cls, spark, path: str) -> "QualityFilter":
        from pyspark.ml.classification import LogisticRegressionModel

        from pandarallel_spark.operators._memo import eager_build_guard

        eager_build_guard(
            spark,
            "QualityFilter.load model read (eager MLlib load)",
            "Load the model outside strict-lazy scope.",
        )
        model = LogisticRegressionModel.load(path)
        want = len(feature_names())
        got = len(model.coefficients)
        if got != want:
            raise ValueError(
                f"the model at {path!r} has {got} coefficients but this "
                f"library version's feature recipe has {want} features — "
                "it was trained under a different recipe (or is not a "
                "quality filter); retrain with train_quality_filter"
            )
        return cls(model)


def train_quality_filter(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str,
    max_iter: int = 100,
    reg_param: float = 0.0,
    elastic_net_param: float = 0.0,
) -> QualityFilter:
    """Train the curated-vs-crawl classifier: ``positive`` is the
    reference corpus (label 1), ``negative`` the raw sample (label 0);
    both only need the ``text_col``. Returns a :class:`QualityFilter`.

    Distributed end to end: feature extraction is the shared JVM
    recipe, optimization is MLlib's L-BFGS (each iteration one
    tree-aggregated gradient pass — map-side combined, nothing corpus-
    sized reaches the driver). Class imbalance is the caller's dial:
    sample the sides to the ratio you want before calling (the
    standard setup uses comparable sizes; ``sampling.hash_split``
    gives a deterministic subsample).
    """
    from pyspark.ml.classification import LogisticRegression

    labeled = positive.select(
        F.col(text_col), F.lit(1.0).alias("__qlabel__")
    ).unionByName(
        negative.select(F.col(text_col), F.lit(0.0).alias("__qlabel__"))
    )
    lr = LogisticRegression(
        featuresCol="__qfeat__",
        labelCol="__qlabel__",
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net_param,
    )
    return QualityFilter(lr.fit(_assemble(labeled, text_col)))
