"""Geospatial column expressions — pure Catalyst math, no UDFs.

Re-expresses the reference's haversine SQL
(trips_lambda.py:119-125: 6371*2*asin(sqrt(power(sin(radians(Δlat)/2),2)
+ cos(radians(lat1))*cos(radians(lat2))*power(sin(radians(Δlon)/2),2))))
as a Spark Column expression so it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two WGS84 points.

    Pure column math: vectorized, codegen'd, and usable in pushed-down
    projections — never a Python UDF (reference parity: the reference
    also keeps this in-engine as SQL math rather than app code).
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    # clamp: float rounding can push a infinitesimally above 1 for
    # near-antipodal pairs, and asin(>1) is NaN — the standard
    # haversine guard, mirrored in the SQL twin below so both engines
    # compute the identical expression tree
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.sqrt(a), F.lit(1.0)))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as an ANSI-SQL string (for oracle parity)."""
    return (
        f"6371.0*2*asin(least(sqrt(power(sin(radians(({lat2})-({lat1}))/2),2)"
        f"+cos(radians({lat1}))*cos(radians({lat2}))"
        f"*power(sin(radians(({lon2})-({lon1}))/2),2)),1.0))"
    )
