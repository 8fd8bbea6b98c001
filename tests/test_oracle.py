"""Run EVERY registered workload query against its DuckDB oracle —
exactly what the driver's t2 does, but in-repo so regressions surface
before commit. Queries without an oracle get a rows-run smoke check.
"""

import pytest

from pandarallel_spark.workload import REGISTRY, queries

queries()  # force registration


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle_utils import compare

    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0
        return
    compare(df, q.oracle, sf_dir)
