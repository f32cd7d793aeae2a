"""[ext] Vector similarity-search operators (SURVEY §2.12 X3/X4 + the
ANN / embedding-near-dup mandate) over the `embeddings` fixture
(array<float> column).

Dot products/norms are zip_with/aggregate column expressions in double
precision — fully JVM-side. The DuckDB oracles spell out the identical
elementwise-double formula, so values agree to the last bit before the
shared round(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.operators.similarity import (
    cosine, cosine_pairs_blocked, cosine_topk, ivf_topk,
)
from data_warehouse_spark.queries.registry import register

_COS_SQL = """
list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))
/ (sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))
 * sqrt(list_sum(list_transform(range(1, 65), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE))))
"""


_QUERY_VEC_CACHE: dict[tuple[str, float], list[float]] = {}


def _embeddings_mtime(sf_dir: str) -> float:
    """Latest mtime under the embeddings table path (file or directory
    of part files) — 0.0 if unreadable (cache then keys on path only)."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        if os.path.isdir(path):
            return max((e.stat().st_mtime for e in os.scandir(path)),
                       default=os.stat(path).st_mtime)
        return os.stat(path).st_mtime
    except OSError:
        return 0.0


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The query vector = embedding of vec_id 0 (a deterministic fixture
    row; collecting one parameter row is query setup, not data flow).
    Cached per (sf_dir, file mtime): fixtures are regenerated in place
    between driver rounds, so a long-lived process must not keep
    scoring against a stale parameter row — the mtime key invalidates
    the cache exactly when the file changes."""
    key = (sf_dir, _embeddings_mtime(sf_dir))
    if key not in _QUERY_VEC_CACHE:
        row = (load_table(spark, sf_dir, "embeddings")
               .filter(F.col("vec_id") == 0).select("embedding").first())
        _QUERY_VEC_CACHE[key] = list(row[0])
    return _QUERY_VEC_CACHE[key]


@register(
    "x3_cosine_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND({_COS_SQL.format(a='embedding', b='qv')}, 6) AS cos_sim
FROM embeddings CROSS JOIN q
ORDER BY cos_sim DESC, vec_id
LIMIT 20
""",
    doc="X3: exact brute-force cosine top-k vs a query vector — the "
        "correctness baseline for ANN. Executes as one scan + "
        "TakeOrderedAndProject (per-partition heap, k-row driver merge).",
    tags=("ext", "vector"),
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, vec_col="embedding", id_col="vec_id",
                       query_vec=_query_vec(spark, sf_dir), k=20)


@register(
    "x3b_ivf_topk",
    oracle=None,  # approximate by design -> rows-only (+ pytest recall check)
    doc="X3b: IVF-style approximate top-k — deterministic coarse "
        "quantizer (seeded centroids + Lloyd steps as DataFrame ops), "
        "probe nprobe=4 of 16 cells. The scale path: scoring cost drops "
        "~4x here, ~n_cells/nprobe generally; recall vs X3 asserted in "
        "tests.",
    tags=("ext", "vector"),
)
def x3b_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, vec_col="embedding", id_col="vec_id",
                    query_vec=_query_vec(spark, sf_dir), k=20,
                    n_cells=16, nprobe=4)


@register(
    "x4_pairwise_sim",
    oracle=f"""
SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_COS_SQL.format(a='a.embedding', b='b.embedding')}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({_COS_SQL.format(a='a.embedding', b='b.embedding')}, 6) >= 0.25
""",
    doc="X4: pairwise cosine similarity join within label blocks — the "
        "embedding-cosine near-dup pattern. Blocking bounds the "
        "quadratic term; the label join is a hash join (AQE skew-"
        "handled), and blocks beyond max_block_rows auto-route through "
        "an IVF-cell prefilter (operators/similarity.py) so a giant "
        "block degrades to Σ|cell|² instead of |block|². Threshold "
        "applied on the rounded value in both engines so boundary "
        "membership is identical.",
    tags=("ext", "vector"),
)
def x4_pairwise_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(emb, vec_col="embedding", id_col="vec_id",
                                block_col="label", threshold=0.25,
                                dim=64)
