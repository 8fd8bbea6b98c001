"""Sources & sinks.

The reference has none (data lives in driver RAM; I/O is pandas',
SURVEY.md §2.2). Here sources are Spark's native readers — parquet first
(the driver testdata contract), csv/json for parity with what a pandas
user would load. Keeping these declarative is what buys predicate
pushdown and column pruning at 100 TB: `.explain` must show
``PushedFilters`` / a pruned ``ReadSchema`` for any query that filters
or projects.
"""

from pandarallel_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    read_binary_dir,
    read_csv,
    read_orc,
    read_json,
    write_bucketed,
    write_csv,
    write_orc,
    write_json,
    write_parquet,
    zorder_key,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_binary_dir",
    "read_csv",
    "read_orc",
    "read_json",
    "write_parquet",
    "write_csv",
    "write_orc",
    "write_json",
    "write_bucketed",
    "zorder_key",
]
