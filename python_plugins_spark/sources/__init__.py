from python_plugins_spark.sources.io import (
    TABLES,
    fix_nanos_ts,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    register_views,
    write_parquet,
)

__all__ = [
    "TABLES",
    "fix_nanos_ts",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "register_views",
    "write_parquet",
]
