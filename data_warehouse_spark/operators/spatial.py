"""Spatial join (SURVEY §2.3 J9): point -> region assignment.

The reference declares point-in-polygon enrichment (municipality/canton
columns, trips_lambda.py:65-66; lambda_spatial_analysis.py declared in
README.md:12,16) but ships no implementation. The engine provides the
scalable pattern:

  1. grid prefilter — bucket points to coarse grid cells; explode each
     region's bounding box into the cells it covers; equi-join on cell.
     Turns the O(points x regions) test into a hash join.
  2. exact test — for axis-aligned boxes a range predicate (pure SQL);
     for true polygons an even-odd ray-cast in a mapInArrow kernel
     (numpy over the flattened ring buffers, every edge of every
     candidate tested in one vectorized pass; no GIS dependency; exact
     for concave rings).
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
      3. exact even-odd ray cast on the survivors in a mapInArrow
         kernel: the ring ListArray flattens to contiguous coordinate
         buffers, every edge of every candidate row is tested in ONE
         set of numpy operations (edge endpoints gathered with a
         wrap-at-row-end index, crossings summed per row with
         add.reduceat) — no per-row Python, no GIS lib. The crossing
         test `(y1>y) != (y2>y) & x < (x2-x1)*(y-y1)/(y2-y1)+x1` uses
         the same IEEE double ops as the SQL oracle; where an edge is
         horizontal the division yields inf/nan but the parity term is
         already False, matching the scalar short-circuit exactly.

    Rows on a polygon edge follow even-odd boundary ambiguity (standard
    for ray casts); callers needing closed/open boundary semantics
    should buffer the ring. Concave and non-axis-aligned polygons are
    exact — covered by tests/test_operators.py with a chevron.
    """
    import numpy as np
    import pyarrow as pa

    boxes = (polygons
             .withColumn("lat_min", F.array_min(F.transform(ring_col, lambda p: p.lat)))
             .withColumn("lat_max", F.array_max(F.transform(ring_col, lambda p: p.lat)))
             .withColumn("lon_min", F.array_min(F.transform(ring_col, lambda p: p.lon)))
             .withColumn("lon_max", F.array_max(F.transform(ring_col, lambda p: p.lon))))
    candidates = grid_spatial_join(points, boxes, lat_col=lat_col,
                                   lon_col=lon_col, cell_deg=cell_deg)

    drop_cols = {ring_col, "lat_min", "lat_max", "lon_min", "lon_max"}
    out_fields = [f for f in candidates.schema.fields
                  if f.name not in drop_cols]
    keep_names = [f.name for f in out_fields]
    out_schema = type(candidates.schema)(out_fields)

    def ray_cast_batches(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            idx = b.schema.get_field_index
            px_row = b.column(idx(lon_col)).to_numpy(zero_copy_only=False)
            py_row = b.column(idx(lat_col)).to_numpy(zero_copy_only=False)
            ring = b.column(idx(ring_col))
            if ring.null_count:
                raise ValueError("null polygon ring in candidate batch")
            # offsets are absolute into the untrimmed values buffer
            # (sliced arrays don't start at 0); flatten() trims, so
            # rebase to relative offsets before indexing into it.
            offs = ring.offsets.to_numpy()
            offs = offs - offs[0]
            lens = np.diff(offs)
            flat = ring.flatten()
            rx = flat.field("lon").to_numpy(zero_copy_only=False)
            ry = flat.field("lat").to_numpy(zero_copy_only=False)

            inside = np.zeros(b.num_rows, dtype=bool)
            if len(rx):
                # one entry per (row, edge): endpoint 1 is the vertex
                # itself; endpoint 2 is the next vertex, wrapping to the
                # row's first vertex at the row end ((i+1) % n).
                starts = np.repeat(offs[:-1], lens)
                ends = np.repeat(offs[1:], lens)
                nxt = np.arange(len(rx)) + 1
                at_end = nxt == ends
                nxt[at_end] = starts[at_end]
                x1, y1, x2, y2 = rx, ry, rx[nxt], ry[nxt]
                row_of = np.repeat(np.arange(b.num_rows), lens)
                px, py = px_row[row_of], py_row[row_of]
                t1 = (y1 > py) != (y2 > py)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xcross = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                # int64, not bool: add.reduceat on booleans computes
                # logical OR per segment, not the crossing COUNT
                crossed = (t1 & (px < xcross)).astype(np.int64)
                nz = lens > 0
                if nz.any():
                    sums = np.add.reduceat(crossed, offs[:-1][nz])
                    inside[nz] = (sums % 2).astype(bool)
            kept = b.filter(pa.array(inside))
            yield pa.RecordBatch.from_arrays(
                [kept.column(idx(n)) for n in keep_names], names=keep_names)

    return candidates.mapInArrow(ray_cast_batches, out_schema)
