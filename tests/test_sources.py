"""Sources library + multimodal plumbing tests (SURVEY §2.1 S2/S3,
[ext] multimodal mandate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_spark.operators.multimodal import (
    attach_blob, decode_images, resize_plan, sample_frames,
)
from data_warehouse_spark.sources.jdbc import (
    connection_options, partitioned_read_options,
)
from data_warehouse_spark.sources.rest_json import (
    fetch_air_quality, gbfs_sample_frame, parse_gbfs,
)

SF = "/root/testdata/sf0.001"


def test_parse_gbfs_shreds_nested_payload(spark):
    out = parse_gbfs(gbfs_sample_frame(spark)).collect()
    assert len(out) == 3
    byid = {r.bike_id: r for r in out}
    assert byid["b2"].is_reserved is True
    assert byid["b3"].is_disabled is True
    assert byid["b1"].lat == 47.37
    # observation-time stamping (bike_lambda.py:62)
    assert all(r.observed_at is not None for r in out)


def test_fetch_air_quality_per_unit_error_isolation(spark):
    cities = spark.createDataFrame(
        [("Zurich",), ("BAD",), ("Bern",)], ["city"])

    def fetch(city):
        if city == "BAD":
            raise RuntimeError("api down")
        return {"aqi": 1, "iaqi": {"t": {"v": 2.0}, "h": {"v": 3},
                                   "pm25": {"v": 4}}}

    rows = fetch_air_quality(cities, fetch=fetch).collect()
    # the failed key is skipped, the batch survives (air_lambda.py:62-64)
    assert sorted(r.city for r in rows) == ["Bern", "Zurich"]


def test_fetch_air_quality_fanout_scales_with_cluster(spark):
    """S3 de-cap: default fan-out is min(n_keys, defaultParallelism) —
    one fetch task per key up to the cluster's slots — not the
    reference's fixed ThreadPool(3) (air_lambda.py:79), which stays
    available as an explicit argument for rate-limited APIs."""
    cities = spark.createDataFrame([(f"c{i}",) for i in range(40)], ["city"])
    dp = spark.sparkContext.defaultParallelism
    out = fetch_air_quality(cities)
    assert out.rdd.getNumPartitions() == min(40, dp)
    capped = fetch_air_quality(cities, parallelism=3)
    assert capped.rdd.getNumPartitions() == 3


def test_jdbc_partitioned_read_options():
    conn = connection_options("db.example", "warehouse", "u", "p")
    assert conn["url"].startswith("jdbc:postgresql://db.example:5432/warehouse")
    assert "connectTimeout=300" in conn["url"]  # trips_lambda.py:22
    opts = partitioned_read_options(
        conn, "bike_status", "timestamp",
        "2024-01-01 00:00:00", "2024-01-02 00:00:00", num_partitions=16)
    assert opts["numPartitions"] == "16"
    assert opts["partitionColumn"] == "timestamp"
    assert opts["dbtable"] == "bike_status"


def test_resize_plan_preserves_aspect_and_bounds(spark):
    from data_warehouse_spark.io import load_table
    docs = load_table(spark, SF, "documents")
    planned = resize_plan(decode_images(attach_blob(docs)), max_side=512)
    bad_bounds = planned.filter(
        (F.col("out_w") > 512) | (F.col("out_h") > 512)
        | (F.col("out_w") < 1) | (F.col("out_h") < 1)).count()
    assert bad_bounds == 0
    # aspect ratio preserved within 1-pixel floor error
    drift = planned.filter(
        (F.greatest("width", "height") > 512)
        & (F.abs(F.col("out_w") / F.col("out_h")
                 - F.col("width") / F.col("height")) > 0.05)).count()
    assert drift == 0


def test_sample_frames_count_matches_metadata(spark):
    from data_warehouse_spark.io import load_table
    docs = load_table(spark, SF, "documents")
    blobs = attach_blob(docs)
    frames = sample_frames(blobs, frame_every_bytes=1024)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("byte_offset").alias("max_off"))
    joined = per_doc.join(blobs.select("doc_id", "n_bytes"), "doc_id")
    wrong = joined.filter(
        (F.col("n_frames") != (F.col("n_bytes") / 1024).cast("int") + 1)
        | (F.col("max_off") >= F.col("n_bytes") + 1024)).count()
    assert wrong == 0


def test_decode_images_pil_codec_real_header(spark):
    """Real-codec path: a genuine PNG decodes to its true dims and a
    malformed payload degrades to ok=false (never a task failure).
    Self-skips where Pillow is absent — the stub path is the
    hash-checked default either way."""
    import pytest

    from data_warehouse_spark.operators.multimodal import (
        _pil_available, decode_images,
    )

    if not _pil_available():
        with pytest.raises(ImportError):
            decode_images(spark.range(0), codec="pil")
        pytest.skip("Pillow not installed in this environment")

    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (37, 21)).save(buf, format="PNG")
    rows = [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r.doc_id: r for r in decode_images(df, codec="pil").collect()}
    assert (got[1].width, got[1].height, got[1].ok) == (37, 21, True)
    assert got[2].ok is False and got[2].width is None
