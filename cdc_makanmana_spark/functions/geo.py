"""Geospatial column expressions.

Parity targets: ``calculateDistance`` haversine (reference:
src/utils/locationUtils.ts:30-49, R=6371 km) and ``formatDistance``
(reference: src/utils/locationUtils.ts:157-163). Pure expressions —
no UDF — so they codegen and vectorize.

Scale note: at 100 TB the exact haversine never runs over the full
table; ``bounding_box_predicate`` gives a sargable lat/lon range
pre-filter that pushes to the parquet scan and prunes partitions
before the trig math runs on survivors.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km (haversine, R=6371).

    Parity: locationUtils.ts:30-49 uses the identical formula.
    """
    rlat1, rlon1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    rlat2, rlon2 = F.radians(_c(lat2)), F.radians(_c(lon2))
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def bounding_box_predicate(lat_col, lon_col, center_lat: float, center_lon: float, radius_km: float) -> Column:
    """Cheap rectangular pre-filter containing the radius circle.

    This is plain comparisons on raw columns → Catalyst pushes it into
    the parquet scan (PushedFilters) and prunes row groups; the exact
    haversine then runs only on the surviving rows.
    """
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    # Longitude degrees shrink with cos(lat); guard the poles.
    coslat = max(math.cos(math.radians(center_lat)), 1e-6)
    dlon = math.degrees(radius_km / (EARTH_RADIUS_KM * coslat))
    return (
        _c(lat_col).between(center_lat - dlat, center_lat + dlat)
        & _c(lon_col).between(center_lon - dlon, center_lon + dlon)
    )


def format_distance(dist_km) -> Column:
    """``<1 km → "850m"``, else ``"1.2km"`` (locationUtils.ts:157-163)."""
    d = _c(dist_km)
    return F.when(
        d < 1.0, F.concat(F.round(d * 1000).cast("int").cast("string"), F.lit("m"))
    ).otherwise(F.format_string("%.1fkm", d))
