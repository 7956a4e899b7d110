from .readers import (
    fan_out,
    load_table,
    load_tables,
    scan_csv,
    scan_json,
    scan_orc,
    scan_parquet,
)
from .sinks import (
    sink_csv,
    sink_json,
    sink_orc,
    sink_parquet,
    sink_parquet_bucketed,
)

__all__ = [
    "fan_out",
    "load_table",
    "load_tables",
    "scan_csv",
    "scan_json",
    "scan_orc",
    "scan_parquet",
    "sink_csv",
    "sink_json",
    "sink_orc",
    "sink_parquet",
    "sink_parquet_bucketed",
]
