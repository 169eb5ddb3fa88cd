"""File / JDBC sources and scale-aware sinks (SURVEY §2.2 sources table)."""

from .io import (  # noqa: F401
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    write_table,
)
