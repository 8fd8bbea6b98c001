"""Order reification.

pandas frames are ordered; Spark DataFrames are not (SURVEY.md §1.1).
Every order-sensitive operator in this engine takes an explicit
``order_by`` column. When the caller has none, ``with_row_id`` attaches a
stable global row id derived from the *current* partition layout.

Scale note: ``monotonically_increasing_id`` is per-partition monotonic but
not globally dense. For operators that need a dense global order (global
rolling windows), we rank over the mono id — that is a single-pass window
and is only used when the caller genuinely asked for a *global* order,
which is inherently a sequential semantic no engine can shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROW_ID = "__row_id__"


def with_row_id(df: DataFrame, dense: bool = False) -> DataFrame:
    """Attach a stable ``__row_id__`` column.

    ``dense=False`` (default): partition-monotonic ids — cheap, no
    shuffle, sufficient as a tie-breaker or arbitrary-but-stable order.
    ``dense=True``: globally dense 0..n-1 rank — costs one global sort
    window; only for semantics that truly need contiguous positions.
    """
    out = df.withColumn(ROW_ID, F.monotonically_increasing_id())
    if dense:
        out = out.withColumn(
            ROW_ID, F.row_number().over(Window.orderBy(F.col(ROW_ID))) - F.lit(1)
        )
    return out
