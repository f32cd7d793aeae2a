"""Distributed deterministic sampling primitives (SURVEY §2.12 X9/X14).

`token_budget_sample_scalable` is the 100 TB form of the x14 query's
windowed running sum. The naive spelling —
``SUM(w) OVER (PARTITION BY stratum ORDER BY key)`` — funnels every row
of a stratum through ONE reducer, so a 5-language corpus uses 5 cores
no matter the cluster. This operator computes the identical prefix sum
with a classic two-phase decomposition:

  1. range-partition rows by (stratum, key) into `coarse` chunks and
     tag each row with its chunk id — chunks hold contiguous key
     ranges, so the global per-stratum order is (chunk, key);
  2. aggregate one (stratum, chunk) subtotal per chunk (map-side
     combined, so the subtotal exchange carries chunk-count rows);
  3. run the running sum over the TINY subtotal table (its window
     touches #chunks rows, not #rows) to get each chunk's offset;
  4. broadcast-join offsets back and window WITHIN (stratum, chunk) —
     parallelism is now strata x chunks instead of strata.

Shuffle budget, honestly: full data moves TWICE (the range partition,
then the within-chunk window's hash exchange on (stratum, chunk) —
Catalyst cannot know each chunk already sits in one range partition).
That is still the winning trade against the naive window whenever
strata are few: two balanced all-data shuffles beat one shuffle that
serializes on #strata reducers.

Chunk boundaries come from range-partition sampling and are NOT
deterministic across plan instances — but the result is: every
boundary placement yields the same contiguous per-stratum order, and
prefix sums are associative, so offset + within-chunk sum reproduces
the single-window value exactly (property-tested against the naive
window in tests) — PROVIDED (stratum, key) pairs are unique, which
every caller guarantees (x14's keys are md5 hashes): on duplicate
keys BOTH forms order ties arbitrarily, so neither is deterministic
and they can disagree with each other. The `ranged` subtree is
localCheckpoint(eager=False)'d because BOTH the subtotal branch and
the probe branch consume it: sharing one materialized RDD instance
guarantees one boundary sample regardless of whether exchange reuse
fires (with reuse off, two un-shared subtrees would sample boundaries
independently and chunk ids could diverge between offsets and probes —
silently wrong cums). Checkpoint, not persist(): persist registers in
the CacheManager until an explicit unpersist no caller can issue on a
lazily-returned frame, accumulating a pinned copy per call in a
long-lived driver; checkpoint blocks are executor-local and freed by
the ContextCleaner once unreferenced (graph.py documents the same
trade — no lineage replay on executor loss, re-run instead). At
warehouse scale the same role is played by materializing the chunked
table, the multi-consumer-intermediate norm (see x7's tf note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_budget_sample_scalable(df: DataFrame, stratum: str, key: str,
                                 weight: str, budget: int,
                                 coarse: int = 32) -> DataFrame:
    """Rows of each stratum in ``key`` order while cumulative
    ``weight`` stays within ``budget`` — same semantics as the
    single-window form (including NULL as its own stratum), with
    per-stratum work spread over ``coarse`` range chunks. Returns
    (stratum, key, weight, cum) rows.
    """
    return (prefix_sum_scalable(df, stratum, key, weight, coarse)
            .filter(F.col("cum") <= budget))


def sequence_pack(df: DataFrame, stratum: str, key: str, weight: str,
                  seq_len: int, coarse: int = 32) -> DataFrame:
    """GPT-style pretraining sequence packing: per stratum, documents
    are concatenated in deterministic ``key`` order and the token
    stream is chopped into fixed ``seq_len`` sequences; each doc's
    placement is pure arithmetic off the prefix sum —
    ``start_seq = (cum - w) div L`` (the sequence its first token
    lands in), ``end_seq = (cum - 1) div L`` (its last token), so a
    long doc straddles ``end - start + 1`` sequences. Zero-weight rows
    must be filtered by the caller (they occupy no tokens; the
    arithmetic would place them degenerately).

    ``weight`` must be a NON-NEGATIVE INTEGRAL column (token counts).
    Spark's ``div`` operator only accepts integral/decimal operands —
    a double weight column fails analysis outright — and it truncates
    toward zero where DuckDB's ``//`` floors, so negative weights (and
    the negative cums they produce) would silently diverge between the
    engines. Both constraints are vacuous for real token counts, hence
    documented rather than runtime-validated.

    Scale shape: identical to token_budget_sample_scalable — the
    two-phase distributed prefix sum (range-chunk subtotals + offsets
    over the chunk-count-sized table) followed by a map-only
    projection; no extra shuffle beyond the prefix sum itself.
    Returns (stratum, key, weight, cum, start_seq, end_seq).
    """
    from data_warehouse_spark.functions.colref import quote_ident

    cum = prefix_sum_scalable(df, stratum, key, weight, coarse)
    # quoted (shared colref escape) so any weight column name — spaces,
    # reserved words, backticks — parses instead of injecting into the
    # expression
    w = quote_ident(weight)
    return (cum
            .withColumn("start_seq", F.expr(
                f"(cum - {w}) div {int(seq_len)}"))
            .withColumn("end_seq", F.expr(f"(cum - 1) div {int(seq_len)}")))


def prefix_sum_scalable(df: DataFrame, stratum: str, key: str,
                        weight: str, coarse: int = 32) -> DataFrame:
    """Per-stratum running sum of ``weight`` in ``key`` order as
    (stratum, key, weight, cum) — the two-phase decomposition the
    module docstring describes, shared by the budget sampler and the
    sequence packer."""
    ranged = (df.select(stratum, key, weight)
              .repartitionByRange(coarse, F.col(stratum), F.col(key))
              .withColumn("__chunk", F.spark_partition_id())
              .localCheckpoint(eager=False))
    subtotals = (ranged.groupBy(stratum, "__chunk")
                 .agg(F.sum(weight).alias("__sub")))
    # chunk ids ascend with the range order within a stratum, so the
    # offset is the running subtotal of all earlier chunks
    w_off = (Window.partitionBy(stratum).orderBy("__chunk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (subtotals
               .withColumn("__off",
                           F.coalesce(F.sum("__sub").over(w_off), F.lit(0)))
               .select(F.col(stratum).alias("__s"),
                       F.col("__chunk").alias("__c"), "__off"))
    w_in = (Window.partitionBy(stratum, "__chunk").orderBy(key)
            .rowsBetween(Window.unboundedPreceding, 0))
    # null-safe on the stratum: a NULL stratum is a real window
    # partition in the naive form, and a plain equi-join would drop it
    return (ranged
            .join(F.broadcast(offsets),
                  on=[F.col(stratum).eqNullSafe(F.col("__s")),
                      F.col("__chunk") == F.col("__c")])
            .withColumn("cum", F.col("__off") + F.sum(weight).over(w_in))
            .select(stratum, key, weight, "cum"))


def mixture_schedule(df: DataFrame, stratum: str, id_col: str,
                     weights: dict[str, float], default_weight: float,
                     coarse: int = 32) -> DataFrame:
    """Deterministic source-mixture schedule (the data-mixing pass a
    pretraining pipeline runs: interleave strata at target sampling
    weights): per-stratum md5-order rank r, virtual time r / w_s —
    classic stride scheduling, so reading the output in vtime order
    yields each stratum at ~its weight share of every prefix (a
    stratum with weight 0.5 appears every 2 ticks, 0.1 every 10).

    Output: stratum, id, rnk (1-based md5-order rank within the
    stratum), vtime (round-6). The GLOBAL interleave order is vtime —
    deliberately NOT materialized as a row_number here: a global rank
    would serialize on one reducer, while the writer's range-sort on
    vtime (or a downstream prefix_sum_scalable over vtime-as-key)
    partitions it. Ranks come from the same two-phase prefix sum as
    the budget sampler — parallelism strata x chunks, never one
    reducer per stratum.

    Weights must all be finite and > 0 (including default_weight): a
    zero/negative weight would silently emit an infinite or negative
    vtime — a nonsensical schedule — so it raises here instead. Caveat
    the validation cannot cover cheaply: a typo'd `weights` key never
    matches any stratum value and silently falls through to
    default_weight; checking would cost a distinct-scan per call, so
    callers own key spelling (the x21 oracle pins it end to end)."""
    import math
    for s, sw in {**weights, "<default_weight>": default_weight}.items():
        if not (isinstance(sw, (int, float)) and math.isfinite(sw)
                and sw > 0):
            raise ValueError(
                f"mixture_schedule: weight for {s!r} must be finite "
                f"and > 0, got {sw!r}")
    keyed = df.select(
        F.col(stratum),
        F.struct(F.md5(F.col(id_col).cast("string")).alias("h"),
                 F.col(id_col).alias("id")).alias("__k"),
        F.lit(1).cast("long").alias("__one"))
    ranked = (prefix_sum_scalable(keyed, stratum=stratum, key="__k",
                                  weight="__one", coarse=coarse)
              .select(F.col(stratum), F.col("__k.id").alias(id_col),
                      F.col("cum").alias("rnk")))
    w: Column = F.lit(float(default_weight))
    for s, sw in sorted(weights.items()):
        w = F.when(F.col(stratum) == s, F.lit(float(sw))).otherwise(w)
    return ranked.select(
        stratum, id_col, "rnk",
        F.round(F.col("rnk") / w, 6).alias("vtime"))
