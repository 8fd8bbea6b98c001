"""Local replica of the driver's t2 correctness check: run the Spark
query and the DuckDB oracle on the same parquet, sort columns by name,
sort rows, compare values exactly. If this passes at a given sf, the
driver's order-insensitive value-hash will too.
"""

from __future__ import annotations

import duckdb
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


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            s = pd.to_datetime(out[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            out[c] = s.astype("datetime64[ns]")
        # list-valued cells can't be sorted on; stringify for comparison
        if out[c].dtype == object and len(out) and isinstance(out[c].iloc[0], (list, tuple)):
            out[c] = out[c].apply(lambda v: str(list(v)))
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
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
