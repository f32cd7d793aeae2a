"""Declarative data-validation report — the reference's declared-but-
absent ``utils/data_validation.py`` (``/root/reference/README.md:21``),
re-expressed engine-side.

The reference's actual validity machinery is DB constraints and inline
SQL filters (PK/UNIQUE rejection ``bike_lambda.py:46``,
``trips_lambda.py:73-74``; semantic bounds ``trips_lambda.py:128,
160-162``). Spark enforces none of that declaratively, so the engine
provides the audit as an operator: named boolean rules evaluated in ONE
scan, plus optional key-uniqueness, emitted as a long-format
(rule, n_violations, n_rows) report.

Scale shape: every row rule is a conditional-sum aggregate — map-side
combined, one row per task reaches the exchange, so the report costs
one scan at any corpus size. Key uniqueness rides the SAME aggregate as
``count - count(distinct struct(keys))`` (Spark plans the distinct via
Expand over the one aggregation — no second scan). NULL rule results
count as violations (``when(pred, 0).otherwise(1)``): a check that
cannot evaluate is a failed check, the conservative audit contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validation_report(df: DataFrame, rules: dict[str, Column],
                      unique_key: list[str] | None = None,
                      uniqueness: str = "grouped",
                      sketch_rsd: float = 0.02,
                      sketch_bound_rsds: float = 4.0) -> DataFrame:
    """Evaluate named pass-predicates over ``df`` in one aggregate.

    Returns a DataFrame of (rule string, n_violations long, n_rows
    long), one row per rule (plus ``<col,...>_unique`` when
    ``unique_key`` is given). A row violates a rule when its predicate
    is false OR null.

    NULL-key semantics of the uniqueness check: a NULL key value is
    ONE real key value — two NULL-keyed rows count as a duplicate
    (the grouped path's groupBy and the inline path's
    ``struct(*unique_key)`` both behave so). This matches the engine's
    PK contract everywhere else (upsert/dedup are null-safe,
    operators/merge.py:46-49) but DIVERGES from the bare SQL spelling
    ``COUNT(*) - COUNT(DISTINCT col)``, which ignores NULLs entirely
    and would count every NULL-keyed row as a violation. Oracles for
    tables whose keys can be NULL must use ``COUNT(DISTINCT
    struct_pack(...))``-style null-safe forms (dq1 is unaffected:
    event_id is never NULL).

    ``uniqueness`` picks the physical strategy for the (identical)
    uniqueness number:
      - "grouped" (default): a separate groupBy(keys) aggregation,
        ``sum(cnt - 1)`` = n - n_distinct, cross-joined (two 1-row
        relations -> broadcast NLJ, never a real cartesian) into the
        report. NO Expand: the inline form makes Spark duplicate EVERY
        input row 2x through the first aggregate (regular aggs on one
        copy, the distinct's keys on the other); splitting keeps the
        row-rule scan single-pass and the distinct branch pruned to
        the key columns only (the rule columns never reach it).
      - "inline": count(*) - countDistinct(struct(keys)) inside the
        one aggregate (the historical form, kept measurable).
      - "sketch": the 100 TB form (DQ1b). No exact distinct ANYWHERE:
        approx_count_distinct (HyperLogLog++, `sketch_rsd`) rides the
        one row-rule aggregate, and the report row is a VERDICT, not a
        count — rule ``<keys>_near_unique`` with n_violations 0 when
        ``n_rows - est <= sketch_bound_rsds * sketch_rsd * est`` else
        1, i.e. "duplicate mass is below the tolerance band" (default
        4 * 2% = 8% of distinct keys). The band is a DATA claim both
        engines can evaluate with their OWN sketches (DuckDB's HLL
        differs bit-for-bit from Spark's, so no raw estimate can
        hash-match, but both estimates carry ~rsd error and agree on
        any dup mass far from the band edge). Contract: dup mass well
        below (ingest healthy) or well above (replayed/doubled ingest
        — the failure this check exists to catch) the band; data
        sitting NEAR the 8% edge is out of contract (same class as
        A8's regen note). The exact answer stays available as
        uniqueness="grouped" (DQ1), the audit form.

    Round-7 note (SCALE.md "Round-7 perf closures"): an observe()-based
    fusion — rule metrics collected by CollectMetrics during the
    uniqueness job's scan, one pass total — was built and measured at
    256x: 2.58 s vs 2.62 s for the two-branch form. No gain (the
    branch costs are additive either way, and fusing re-widens the
    uniqueness pass to every rule column), so the two-branch plan
    stays: it is simpler, retry-exact (accumulator semantics under
    stage retries are a cluster-side caveat for CollectMetrics), and
    each branch prunes to exactly the columns it needs.
    """
    if not rules:
        raise ValueError("validation_report needs at least one rule")
    if uniqueness not in ("grouped", "inline", "sketch"):
        raise ValueError(f"unknown uniqueness strategy: {uniqueness!r}")
    # coalesce: SUM over zero rows is NULL, but an empty input must
    # report 0 violations per rule, not an un-gateable NULL
    aggs = [F.coalesce(F.sum(F.when(pred, 0).otherwise(1)), F.lit(0))
            .cast("long").alias(name)
            for name, pred in rules.items()]
    rule_names = list(rules)
    if "__n" in rules:
        raise ValueError("rule name '__n' collides with the internal "
                         "total-count column")
    uniq_name = None
    if unique_key:
        suffix = "_near_unique" if uniqueness == "sketch" else "_unique"
        uniq_name = "_".join(unique_key) + suffix
        if uniq_name in rules:
            raise ValueError(f"rule name {uniq_name!r} collides with the "
                             "derived uniqueness check")
        rule_names.append(uniq_name)
        if uniqueness == "inline":
            aggs.append((F.count(F.lit(1))
                         - F.countDistinct(F.struct(*unique_key)))
                        .cast("long").alias(uniq_name))
        elif uniqueness == "sketch":
            if "__est" in rules:
                raise ValueError("rule name '__est' collides with the "
                                 "internal sketch column")
            # ALWAYS struct-wrapped, even for one key (r10 review
            # finding): a bare column's approx_count_distinct IGNORES
            # NULLs, so a NULL-keyed row would count as pure duplicate
            # mass — diverging from the NULL-is-one-key-value contract
            # the grouped/inline strategies honor (struct(<null>) is a
            # non-null value the sketch counts).
            aggs.append(F.approx_count_distinct(F.struct(*unique_key),
                                                rsd=sketch_rsd)
                        .alias("__est"))
    aggs.append(F.count(F.lit(1)).cast("long").alias("__n"))
    wide = df.agg(*aggs)
    if unique_key and uniqueness == "sketch":
        wide = (wide.withColumn(
                    uniq_name,
                    F.when(F.col("__n") - F.col("__est")
                           <= sketch_bound_rsds * sketch_rsd
                           * F.col("__est"),
                           F.lit(0)).otherwise(F.lit(1)).cast("long"))
                .drop("__est"))
    if unique_key and uniqueness == "grouped":
        uniq = (df.groupBy(*unique_key)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                     .cast("long").alias(uniq_name)))
        wide = wide.crossJoin(uniq)
    return (wide.unpivot(["__n"], rule_names, "rule", "n_violations")
            .select("rule", "n_violations", F.col("__n").alias("n_rows")))
