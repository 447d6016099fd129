"""Sources / sinks / ingest policy (SURVEY.md §2.1 S1-S13)."""

from cdc_makanmana_spark.sources.cache import SnapshotCache
from cdc_makanmana_spark.sources.landing import LandingJob, LandingResult
from cdc_makanmana_spark.sources.layout import read_table, write_bucketed
from cdc_makanmana_spark.sources.readers import (
    load_with_fallback,
    read_csv_source,
    read_json_source,
    with_retries,
    write_csv_sink,
    write_json_sink,
)

__all__ = [
    "read_json_source",
    "read_csv_source",
    "write_csv_sink",
    "write_json_sink",
    "with_retries",
    "load_with_fallback",
    "SnapshotCache",
    "LandingJob",
    "LandingResult",
    "write_bucketed",
    "read_table",
]
