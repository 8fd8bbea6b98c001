"""Engine-config matrix (FIXTURES.md): results must be identical across
Arrow on/off, shuffle-partition counts, and AQE on/off — the analog of
the reference's progress-bar × data-plane × worker-count matrix
(tests/test_pandarallel.py:15-22, 160-164).
"""

import math

import pandas as pd
import pytest

from pandarallel_spark import parallelize


@pytest.fixture(scope="module")
def pdf():
    import numpy as np

    rng = np.random.default_rng(21)
    return pd.DataFrame({"a": rng.integers(1, 8, 500), "b": rng.random(500)})


def _run(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    func = lambda row: math.sin(row.a**2) + math.sin(row.b**2)  # noqa: E731
    out = parallelize(sdf).parallel_apply(func, axis=1).toPandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


@pytest.mark.parametrize(
    "conf",
    [
        {"spark.sql.execution.arrow.pyspark.enabled": "false"},
        {"spark.sql.shuffle.partitions": "1"},
        {"spark.sql.shuffle.partitions": "2"},
        {"spark.sql.adaptive.enabled": "false"},
    ],
    ids=["arrow-off", "shuffle-1", "shuffle-2", "aqe-off"],
)
def test_config_invariance(spark, pdf, conf):
    baseline = _run(spark, pdf)
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        got = _run(spark, pdf)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    pd.testing.assert_frame_equal(got, baseline)


def test_rolling_center(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({"idx": range(200), "b": rng.random(200)})
    sdf = spark.createDataFrame(pdf)
    for w in (4, 5):
        expected = pdf.b.rolling(w, center=True).sum().reset_index(drop=True)
        got = (
            parallelize(sdf, order_by="idx")
            .series("b")
            .rolling(w, center=True)
            .parallel_apply("sum", output_col="r")
            .toPandas()
            .sort_values("idx")
            .reset_index(drop=True)["r"]
        )
        pd.testing.assert_series_equal(got, expected, check_names=False)
