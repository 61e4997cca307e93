"""Sources & sinks: parquet table IO, the partitioned prices dataset,
the symbol-status table, and (stubbed) network fetchers."""

from asset_prices_parquet_saver_spark.sources.tables import load_tables, read_table
from asset_prices_parquet_saver_spark.sources.prices import (
    read_prices,
    write_prices,
)
from asset_prices_parquet_saver_spark.sources.status import (
    append_status,
    read_status,
    write_status,
)

__all__ = [
    "load_tables",
    "read_table",
    "read_prices",
    "write_prices",
    "append_status",
    "read_status",
    "write_status",
]
