"""End-of-pipeline dedup clustering: near-dup PAIRS -> duplicate
COMPONENTS (operators/graph.py). Loads inside the driver's 50-query
window (composition pinned by tests/test_registry.py); the DuckDB
oracle computes the same components with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.operators.dedup import ngram_jaccard_pairs
from data_warehouse_spark.operators.graph import connected_components
from data_warehouse_spark.queries.registry import register

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "x8_dup_components",
    oracle=f"""
WITH RECURSIVE toks AS (
    SELECT doc_id AS id, lang AS block, {_TOKS} AS l FROM documents
), grams AS (
    SELECT id, block,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(l) - 1, 0) + 1),
               i -> l[i] || ' ' || l[i + 1]))) AS g
    FROM toks
), sizes AS (
    SELECT id, block, COUNT(*) AS n_g FROM grams GROUP BY id, block
), inter AS (
    SELECT a.block, a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
    FROM grams a JOIN grams b
      ON a.block IS NOT DISTINCT FROM b.block
     AND a.g = b.g AND a.id < b.id
    GROUP BY a.block, a.id, b.id
), pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN sizes sa ON i.id_a = sa.id AND i.block IS NOT DISTINCT FROM sa.block
    JOIN sizes sb ON i.id_b = sb.id AND i.block IS NOT DISTINCT FROM sb.block
    WHERE n_inter * 1.0 / (sa.n_g + sb.n_g - n_inter) >= 0.1
), edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL SELECT id_b, id_a FROM pairs
), reach (id, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id
)
SELECT id AS doc_id, MIN(r) AS component_id FROM reach GROUP BY id
""",
    doc="X8: duplicate clusters from near-dup pairs — the retention "
        "step of a dedup pipeline (keep min-id doc per component). "
        "Pairs are X2c's exact n-gram Jaccard (same threshold); "
        "components via iterative min-label propagation "
        "(operators/graph.py): one shuffle join per round, rounds = "
        "graph diameter (clique-like dup clusters converge in 2-4). "
        "The DuckDB oracle computes identical components with a "
        "recursive CTE, making this one of the few oracle-checked "
        "ITERATIVE queries in the registry.",
    tags=("ext", "dedup", "graph"),
)
def x8_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id",
                                block_col="lang", n=2, threshold=0.1)
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(F.col("id").alias("doc_id"), "component_id")


@register(
    "x12_dedup_corpus",
    oracle=f"""
WITH RECURSIVE toks AS (
    SELECT doc_id AS id, lang AS block, {_TOKS} AS l FROM documents
), grams AS (
    SELECT id, block,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(l) - 1, 0) + 1),
               i -> l[i] || ' ' || l[i + 1]))) AS g
    FROM toks
), sizes AS (
    SELECT id, block, COUNT(*) AS n_g FROM grams GROUP BY id, block
), inter AS (
    SELECT a.block, a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
    FROM grams a JOIN grams b
      ON a.block IS NOT DISTINCT FROM b.block
     AND a.g = b.g AND a.id < b.id
    GROUP BY a.block, a.id, b.id
), pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN sizes sa ON i.id_a = sa.id AND i.block IS NOT DISTINCT FROM sa.block
    JOIN sizes sb ON i.id_b = sb.id AND i.block IS NOT DISTINCT FROM sb.block
    WHERE n_inter * 1.0 / (sa.n_g + sb.n_g - n_inter) >= 0.1
), edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL SELECT id_b, id_a FROM pairs
), reach (id, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id
), dupes AS (
    SELECT id FROM (SELECT id, MIN(r) AS cid FROM reach GROUP BY id)
    WHERE id <> cid
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d LEFT JOIN dupes ON d.doc_id = dupes.id
WHERE dupes.id IS NULL
""",
    doc="X12 [ext]: the END-TO-END dedup deliverable — the corpus a "
        "training run actually consumes. Composes the whole pipeline "
        "under one plan: X2c exact n-gram Jaccard pairs -> X8 connected "
        "components -> keep the min-id doc per cluster -> LEFT ANTI "
        "join the drop-list back against the corpus. The drop-list is "
        "the duplicate tail (tiny by construction), so the final join "
        "broadcasts it: removing duplicates from 100 TB costs one "
        "corpus scan beyond the pair generation itself. Docs that "
        "appear in no near-dup pair never enter the component join at "
        "all — they stream straight through the anti join.",
    tags=("ext", "dedup", "graph"),
)
def x12_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id",
                                block_col="lang", n=2, threshold=0.1)
    comp = connected_components(pairs, "id_a", "id_b")
    drop = comp.filter(F.col("id") != F.col("component_id")) \
               .select(F.col("id").alias("doc_id"))
    return docs.join(F.broadcast(drop), on="doc_id", how="left_anti") \
               .select("doc_id", "lang", "n_chars")
