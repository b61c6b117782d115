from bigdata_logs_spark.sources.io import (
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_orc,
    read_ssh_log_text,
    write_csv,
    write_json,
    write_orc,
    write_bucketed,
    write_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_orc",
    "read_ssh_log_text",
    "write_csv",
    "write_json",
    "write_orc",
    "write_bucketed",
    "write_parquet",
]
