"""Spatial join (SURVEY §2.3 J9): point -> region assignment.

The reference declares point-in-polygon enrichment (municipality/canton
columns, trips_lambda.py:65-66; lambda_spatial_analysis.py declared in
README.md:12,16) but ships no implementation. The engine provides the
scalable pattern:

  1. grid prefilter — bucket points to coarse grid cells; explode each
     region's bounding box into the cells it covers; equi-join on cell.
     Turns the O(points x regions) test into a hash join.
  2. exact test — for axis-aligned boxes a range predicate (pure SQL);
     for true polygons, a ray-casting pandas UDF slot (stub here: no
     GIS libs in this environment — the join/bucket plumbing is the
     engine part and is exercised for boxes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_spatial_join(points: DataFrame, boxes: DataFrame,
                      lat_col: str = "lat", lon_col: str = "lon",
                      cell_deg: float = 1.0) -> DataFrame:
    """Assign each point the region boxes containing it.

    points: (..., lat, lon); boxes: (region_id, lat_min, lat_max,
    lon_min, lon_max). Both sides map to integer grid cells of
    `cell_deg` degrees; boxes explode into all covered cells (bounded:
    box_extent/cell_deg per axis); the join is equi on the cell id.
    """
    def cell(col: F.Column) -> F.Column:
        return F.floor(col / cell_deg).cast("long")

    p = points.withColumn("__clat", cell(F.col(lat_col))) \
              .withColumn("__clon", cell(F.col(lon_col)))
    b = (boxes
         .withColumn("__clat", F.explode(F.sequence(cell(F.col("lat_min")),
                                                    cell(F.col("lat_max")))))
         .withColumn("__clon", F.explode(F.sequence(cell(F.col("lon_min")),
                                                    cell(F.col("lon_max"))))))
    joined = p.join(b, on=["__clat", "__clon"])
    exact = ((F.col(lat_col) >= F.col("lat_min"))
             & (F.col(lat_col) <= F.col("lat_max"))
             & (F.col(lon_col) >= F.col("lon_min"))
             & (F.col(lon_col) <= F.col("lon_max")))
    return joined.filter(exact).drop("__clat", "__clon")


def point_in_polygon_exact(points: DataFrame, polygons_wkt: DataFrame) -> DataFrame:
    """Exact polygon test slot (ray casting over WKT rings) — requires
    a geometry lib not present in this environment; the grid prefilter
    above is the engine-side part. Kept as an explicit stub so callers
    see the contract."""
    raise NotImplementedError(
        "exact polygon test needs a geometry library (e.g. shapely) on "
        "executors; use grid_spatial_join for axis-aligned extents")
