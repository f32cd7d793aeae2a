"""Overlapping token-window chunking (the RAG / pretraining chunker —
the training-data-pipeline mandate's missing slice between per-doc
stats (x5) and cross-doc packing (x15)).

`chunk_overlapping` splits every document into fixed-size token
windows with a fixed stride (overlap = chunk_size - stride), emitting
one row per chunk with a stable (doc_id, chunk_idx) identity and the
token offset — the layout an embedding/indexing stage consumes.

100 TB design: the whole operator is map-only — scan -> Generate
(explode of a per-row int sequence) -> Project; NO exchange at any
scale (plan-asserted in tests/test_plans.py). Output volume is
amplified ~n_tokens/stride per doc, but each task amplifies only its
own input split, so the shape is embarrassingly parallel and the
writer behind it (not this operator) decides output partitioning.
The token array is materialized once per row and sliced per chunk;
per-row memory is bounded by the longest document, the same bound the
x5/x14 token counters already carry.

Tokenization is `word_tokens` (functions/text.py) — the repo-wide
split contract (lower + trim + split on whitespace, empty text ->
['']), so chunk counts agree bit-for-bit with the DuckDB oracle's
string_split_regex and with every other token-counting query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_warehouse_spark.functions.text import word_tokens


def n_chunks_for(n_tokens: Column, chunk_size: int, stride: int) -> Column:
    """Chunk count for a document of `n_tokens` tokens: 1 if the doc
    fits in one window, else ceil((n - chunk_size) / stride) + 1 —
    i.e. windows start at 0, stride, 2*stride, ... and the last window
    starts at the smallest multiple of stride covering the tail (it is
    allowed to be short; a start position is only emitted if it adds
    at least one new token). Float division by a small int literal is
    exact in double well past any real document length, so the DuckDB
    oracle's ceil((n - c) / s.0) matches bit-for-bit."""
    return F.when(n_tokens <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n_tokens - F.lit(chunk_size)) / F.lit(float(stride)))
        .cast("int") + 1)


def chunk_overlapping(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", chunk_size: int = 64,
                      stride: int = 48) -> DataFrame:
    """Explode `df` into overlapping token-window chunks.

    Returns one row per (doc, chunk): id_col, chunk_idx (0-based),
    tok_start (0-based token offset of the window), chunk_text (the
    window's tokens re-joined with single spaces), n_tokens (window
    size; only the final chunk of a doc may be short).

    stride must be in (0, chunk_size] — stride == chunk_size is
    non-overlapping tiling, smaller strides overlap by
    chunk_size - stride tokens (the RAG default shape).
    """
    if not 0 < stride <= chunk_size:
        raise ValueError(
            f"stride must be in (0, chunk_size]; got stride={stride} "
            f"chunk_size={chunk_size}")
    toks = word_tokens(F.col(text_col))
    n = F.size(toks)
    base = df.select(
        F.col(id_col), toks.alias("__toks"), n.alias("__n"),
        n_chunks_for(n, chunk_size, stride).alias("__nc"))
    start = F.col("chunk_idx") * stride
    return (
        base
        .select(
            id_col, "__toks", "__n",
            # sequence(int, int) yields array<int>, so chunk_idx is
            # already int — no cast on the generator (Catalyst rejects
            # generators nested inside expressions)
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))
             .alias("chunk_idx"))
        .select(
            id_col,
            "chunk_idx",
            start.cast("int").alias("tok_start"),
            F.concat_ws(" ", F.slice(F.col("__toks"), start + 1,
                                     F.lit(chunk_size)))
             .alias("chunk_text"),
            F.least(F.lit(chunk_size), F.col("__n") - start)
             .cast("int").alias("n_tokens"),
        ))
