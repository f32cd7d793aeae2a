"""Multimodal column plumbing ([ext] north-star mandate): image/audio/
video payloads as opaque `binary` columns with typed metadata, processed
by Arrow-batched `mapInPandas` stages.

Design for 100 TB of media:
  - payloads never pass the driver; each mapInPandas task decodes its
    Arrow batch only (batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch);
  - metadata (format, dims, duration) lives in plain columns so
    filters/joins on it stay codegen'd and pushdown-able — only the
    decode itself pays the Python boundary;
  - every stage is DataFrame -> DataFrame, so decode / resize / frame-
    sample compose with relational operators (join frames to labels,
    aggregate features, dedup by content hash).

Decode kernels: `decode_images(codec="pil")` does real header decode
through Pillow (guarded import, executor-side) when the library is
present; the default `codec="stub"` computes a deterministic result
from the payload bytes so the pipeline stays oracle-checkable in
codec-less environments. The schemas, batching, partitioning, and
composition are identical either way — swapping the kernel moves
nothing else (tests cover both paths; the PIL test self-skips where
Pillow is absent).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def attach_blob(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Turn a text column into an opaque binary payload + typed metadata
    — the storage shape for any media column: (id, blob, media_type,
    n_bytes). Real pipelines land here straight from ingestion."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        blob.alias("blob"),
        F.lit("image/png").alias("media_type"),
        F.octet_length(blob).alias("n_bytes"),
    )


def _stub_dims(n_bytes: "pd.Series") -> tuple["pd.Series", "pd.Series"]:
    """Deterministic stand-in for image header decode: derive (w, h)
    from payload size. A real decoder reads them from the codec."""
    w = (n_bytes % 1920) + 16
    h = (n_bytes % 1080) + 16
    return w, h


def _pil_available() -> bool:
    try:
        from PIL import Image  # noqa: F401
        return True
    except ImportError:
        return False


def decode_images(df: DataFrame, codec: str = "stub") -> DataFrame:
    """Decode stage: blob -> (width, height, ok). Arrow-batched; one
    task decodes one batch; malformed payloads yield ok=false rows
    instead of failing the task (per-unit error isolation, the
    reference's per-city try/except pattern weather_lambda.py:147-149).

    codec: "stub" (deterministic arithmetic from payload size — the
    oracle-checkable default), "pil" (real header decode via Pillow,
    imported inside the executor task; raises at plan time if Pillow is
    absent), or "auto" (pil when importable, else stub). Whichever
    kernel runs, the plan is identical — schema, batching, partitioning
    don't move when the codec is swapped in.
    """
    import pandas as pd

    if codec == "auto":
        codec = "pil" if _pil_available() else "stub"
    if codec == "pil" and not _pil_available():
        raise ImportError("codec='pil' requires Pillow on the executors")
    if codec not in ("stub", "pil"):
        raise ValueError(f"unknown codec: {codec!r}")

    def run_stub(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n = pdf["blob"].map(len)
            w, h = _stub_dims(n)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "ok": pd.Series(True, index=pdf.index),
            })

    def run_pil(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        from PIL import Image

        for pdf in batches:
            ws, hs, oks = [], [], []
            for blob in pdf["blob"]:
                try:
                    with Image.open(io.BytesIO(blob)) as img:
                        ws.append(img.width)
                        hs.append(img.height)
                        oks.append(True)
                except Exception:
                    ws.append(None)
                    hs.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "ok": oks,
            })

    run = run_pil if codec == "pil" else run_stub
    return df.mapInPandas(run, schema="doc_id long, width int, height int, ok boolean")


def resize_plan(decoded: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize stage, metadata part: compute aspect-preserving output
    dims entirely in column expressions (integer math — exactly what a
    resize kernel would be handed). The pixel transform itself would be
    a second mapInPandas over (blob, out_w, out_h); the planning stays
    JVM-side so it can be filtered/joined without touching payloads."""
    scale_num = F.lit(max_side)
    longest = F.greatest("width", "height")
    need = longest > max_side
    out_w = F.when(need, (F.col("width") * scale_num) / longest).otherwise(F.col("width"))
    out_h = F.when(need, (F.col("height") * scale_num) / longest).otherwise(F.col("height"))
    return decoded.select(
        "doc_id", "width", "height",
        F.floor(out_w).cast("int").alias("out_w"),
        F.floor(out_h).cast("int").alias("out_h"),
    )


def sample_frames(df: DataFrame, frame_every_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stage (video/audio analogue): one output row per
    sampled frame — a UDTF-shaped explode driven by metadata. The frame
    index table is rows-per-KiB here; a real video pipeline derives it
    from duration x fps, then a mapInPandas stage extracts each frame's
    pixels from the blob. Output is (doc_id, frame_idx, byte_offset)."""
    n_frames = (F.col("n_bytes") / frame_every_bytes).cast("int") + 1
    return (df.select("doc_id", "n_bytes",
                      F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
            .select("doc_id", "frame_idx",
                    (F.col("frame_idx") * frame_every_bytes).alias("byte_offset")))
