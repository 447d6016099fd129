"""Geospatial radius query (SURVEY.md G1-G3, F6, O2).

Parity target: the postal-search branch (reference:
src/utils/merchantUtils.ts:28-62): geocode → annotate distance →
filter <= radius → sort ascending.

Scale design: the bounding-box predicate runs BEFORE the haversine —
it is sargable (plain comparisons on the raw lat/lon columns), so it
reaches the parquet scan as PushedFilters and prunes row groups /
partitions. The trig only runs on bbox survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_makanmana_spark.functions.geo import bounding_box_predicate, haversine_km


def radius_query(
    df: DataFrame,
    center_lat: float,
    center_lon: float,
    radius_km: float = 10.0,
    lat_col: str = "LAT",
    lon_col: str = "LON",
    dist_col: str = "distance_km",
    limit: int | None = None,
) -> DataFrame:
    """Rows within ``radius_km`` of the center, annotated with
    ``dist_col`` and sorted nearest-first (default 10 km cutoff per
    merchantUtils.ts:56)."""
    out = (
        df.filter(bounding_box_predicate(lat_col, lon_col, center_lat, center_lon, radius_km))
        .withColumn(
            dist_col,
            haversine_km(F.lit(center_lat), F.lit(center_lon), F.col(lat_col), F.col(lon_col)),
        )
        .filter(F.col(dist_col) <= radius_km)
        .orderBy(F.asc_nulls_last(dist_col))
    )
    # limit after orderBy → Catalyst plans TakeOrderedAndProject (top-k,
    # no global sort materialization).
    return out.limit(limit) if limit is not None else out
