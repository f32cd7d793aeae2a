"""Spatial join (SURVEY §2.3 J9): point -> region assignment.

The reference declares point-in-polygon enrichment (municipality/canton
columns, trips_lambda.py:65-66; lambda_spatial_analysis.py declared in
README.md:12,16) but ships no implementation. The engine provides the
scalable pattern:

  1. grid prefilter — bucket points to coarse grid cells; explode each
     region's bounding box into the cells it covers; equi-join on cell.
     Turns the O(points x regions) test into a hash join.
  2. exact test — for axis-aligned boxes a range predicate (pure SQL);
     for true polygons an even-odd ray-cast in an Arrow-batched pandas
     UDF (pure-Python arithmetic, no GIS dependency; exact for concave
     rings).
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


def point_in_polygon_exact(points: DataFrame, polygons: DataFrame,
                           lat_col: str = "lat", lon_col: str = "lon",
                           ring_col: str = "ring",
                           cell_deg: float = 1.0) -> DataFrame:
    """Exact point-in-polygon join (the reference's municipality/canton
    enrichment: README.md:12,16, fact columns trips_lambda.py:65-66).

    polygons: any columns + `ring_col` = array<struct<lon,lat>> (outer
    ring, implicitly closed, no self-intersection). Plan shape:

      1. bbox per polygon from the ring (array_min/array_max over a
         field projection — JVM expressions, one pass);
      2. grid prefilter: points and bboxes bucket to coarse grid cells,
         equi-join on cell + exact bbox test (grid_spatial_join) — the
         candidate set is O(points x overlapping-bboxes), never
         O(points x polygons);
      3. exact even-odd ray cast on the survivors in an Arrow-batched
         pandas UDF (pure Python arithmetic — no GIS lib needed; the
         crossing test `(y1>y) != (y2>y) and x < (x2-x1)*(y-y1)/(y2-y1)
         + x1` is written identically to the SQL oracle so both engines
         do the same IEEE double ops).

    Rows on a polygon edge follow even-odd boundary ambiguity (standard
    for ray casts); callers needing closed/open boundary semantics
    should buffer the ring. Concave and non-axis-aligned polygons are
    exact — covered by tests/test_operators.py with a chevron.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    boxes = (polygons
             .withColumn("lat_min", F.array_min(F.transform(ring_col, lambda p: p.lat)))
             .withColumn("lat_max", F.array_max(F.transform(ring_col, lambda p: p.lat)))
             .withColumn("lon_min", F.array_min(F.transform(ring_col, lambda p: p.lon)))
             .withColumn("lon_max", F.array_max(F.transform(ring_col, lambda p: p.lon))))
    candidates = grid_spatial_join(points, boxes, lat_col=lat_col,
                                   lon_col=lon_col, cell_deg=cell_deg)

    # no type hints: PEP-563 string annotations (module-level future
    # import) break pandas_udf's hint inference; the returnType plus
    # the default SCALAR eval type fully specify the UDF
    @pandas_udf("boolean")
    def _inside(lon, lat, ring):
        out = []
        for x, y, r in zip(lon, lat, ring):
            n = len(r)
            c = False
            for i in range(n):
                x1, y1 = r[i]["lon"], r[i]["lat"]
                x2, y2 = r[(i + 1) % n]["lon"], r[(i + 1) % n]["lat"]
                if (y1 > y) != (y2 > y) and \
                        x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                    c = not c
            out.append(c)
        return pd.Series(out)

    return (candidates
            .filter(_inside(F.col(lon_col), F.col(lat_col), F.col(ring_col)))
            .drop(ring_col, "lat_min", "lat_max", "lon_min", "lon_max"))
