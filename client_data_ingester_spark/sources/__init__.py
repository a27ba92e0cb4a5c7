"""Table sources for the synthetic testdata directories.

One schema-adaptive loader shared by the driver entry point, the bench
harness, and the test fixtures — so a change in the testdata's on-disk
encoding is absorbed in exactly one place.
"""

from client_data_ingester_spark.sources.testdata import (
    load_table,
    normalize_event_ts,
)

__all__ = ["load_table", "normalize_event_ts"]
