"""Connected components over a pair/edge DataFrame — the clustering
step a real dedup pipeline runs AFTER pair generation (X2/X2c emit
near-duplicate PAIRS; retention policy needs duplicate CLUSTERS: keep
one canonical doc per component).

Algorithm: iterative min-label propagation (Pregel-style). Every node
starts labeled with its own id; each round every node takes the min
label among itself and its neighbors; converged when no label
changed. Rounds = graph diameter, and near-dup graphs are
clique-like (diameter 1-3 in practice), so the loop runs 2-4 rounds
on real corpora. Each round is one shuffle join on node id + one
groupBy — no driver-side graph state; the only driver traffic is the
scalar changed-count per round (the standard Pregel convergence
check).

Lineage is truncated every round with localCheckpoint: without it the
iterated self-join doubles the logical plan per round and Catalyst
re-optimization dominates past ~10 rounds. On a cluster, a reliable
checkpoint dir (spark.sparkContext.setCheckpointDir + .checkpoint())
is the durable equivalent; localCheckpoint is the right trade in a
single-JVM session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str, dst: str,
                         max_iters: int = 25) -> DataFrame:
    """(id, component_id) for every node appearing in `edges`;
    component_id = min node id reachable. Raises if not converged
    within max_iters (diameter-bound exceeded — raise max_iters).

    Storage note: each round's eager localCheckpoint snapshots the
    (2-column) label table to executor-local blocks. Rebinding
    `labels`/`stepped` drops the Python reference each round, and once
    the py4j proxy is collected Spark's ContextCleaner frees the
    blocks — so live storage is bounded by GC lag (typically 1-2
    snapshots), not by rounds x labels. The lineage truncation is why
    checkpoint (not persist) is required here: without it the plan
    doubles per round and analysis time explodes."""
    # Materialize the symmetrized edge list ONCE: edges is typically the
    # output of an expensive pair-generation pipeline (X2c at sf0.1 is
    # ~3 s), and without this checkpoint every round's join — plus the
    # union's two branches and the initial distinct — re-executes that
    # whole upstream DAG (measured 62 s -> ~15 s for x8 at sf0.1).
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("a").alias("id")).distinct()
              .withColumn("component_id", F.col("id"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        nbr_min = (sym.join(labels, sym.b == labels.id)
                   .groupBy(F.col("a").alias("id"))
                   .agg(F.min("component_id").alias("nbr_min")))
        stepped = (labels.join(nbr_min, on="id", how="left")
                   .select("id",
                           F.col("component_id").alias("prev"),
                           F.least(F.col("component_id"),
                                   F.coalesce("nbr_min", "component_id"))
                           .alias("component_id")))
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(
            F.col("component_id") != F.col("prev")).limit(1).count()
        labels = stepped.drop("prev")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds")
