"""Local replica of the driver's t2 correctness check: run the Spark
query and the DuckDB oracle on the same parquet, sort columns by name,
sort rows, compare values exactly. If this passes at a given sf, the
driver's order-insensitive value-hash will too.

The comparison is dtype-faithful: the driver's value-hash is sensitive
to pandas dtype drift (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64 vs
Spark int64 — the round-1 failure class), so ``compare`` asserts dtype
equality per column instead of normalizing dtypes away.  The one
normalization kept is datetime64 unit (DuckDB returns us, Spark ns) —
empirically the driver hash treats those as equal.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _has_sequence_cells(s: pd.Series) -> bool:
    """True if any cell is list-like. Lazily scans ALL non-null cells
    (stops at the first hit), so a column whose first list appears after
    a long scalar prefix is still detected (ADVICE r1/r2; the all-scalar
    worst case is a linear scan of a test-scale result set)."""
    if s.dtype != object or not len(s):
        return False
    return any(
        isinstance(v, (list, tuple, np.ndarray)) for v in s.dropna()
    )


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            s = pd.to_datetime(out[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            out[c] = s.astype("datetime64[ns]")
        # list-valued cells can't be sorted on; stringify for comparison.
        # Only list-LIKE cells convert (None/NaN/scalars pass through
        # unchanged — a NaN would raise on list()); np.asarray().tolist()
        # yields Python scalars so numpy>=2's 'np.float64(1.0)' reprs
        # can't diverge between the Spark and DuckDB sides (ADVICE r2).
        if _has_sequence_cells(out[c]):
            out[c] = out[c].apply(
                lambda v: str(np.asarray(v).tolist())
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = _normalize(spark_df.toPandas())
    conn = duckdb_conn(sf_dir)
    try:
        exp = _normalize(conn.execute(oracle_sql).df())
    finally:
        conn.close()
    assert list(got.columns) == list(exp.columns), f"columns {got.columns} != {exp.columns}"
    assert len(got) == len(exp), f"rowcount {len(got)} != {len(exp)}"
    for c in got.columns:
        assert got[c].dtype == exp[c].dtype, (
            f"dtype drift on {c!r}: spark={got[c].dtype} oracle={exp[c].dtype} "
            "(the driver value-hash is dtype-sensitive — align the oracle SQL "
            "cast or the Spark output type)"
        )
    pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
