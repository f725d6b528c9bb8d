from .readers import load_testdata, read_json_lines, read_parquet_table
from .writers import write_append_idempotent, write_overwrite

__all__ = [
    "load_testdata",
    "read_json_lines",
    "read_parquet_table",
    "write_append_idempotent",
    "write_overwrite",
]
