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


def connected_components_stars(edges: DataFrame, src: str, dst: str,
                               max_iters: int = 50) -> DataFrame:
    """(id, component_id) via the ALTERNATING large-star/small-star
    algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond" — the public two-phase algorithm): round count is
    O(log^2 n) REGARDLESS of graph diameter, vs min-label
    propagation's rounds = diameter. Same output contract as
    connected_components (component_id = min reachable id; isolated
    nodes absent).

    When to use which: near-dup clusters are clique-like (diameter
    2-4), where min-label's 2-4 cheap rounds beat stars' 3-shuffle
    iterations; chains/web-graph shapes (diameter >> log n) invert
    that completely — at diameter D, min-label runs D rounds while
    stars runs ~log D alternations (x8c's lane measures the
    crossover: D=256 means 257 min-label rounds vs 7 alternations).

    Each alternation is three bounded shuffles (two groupBy-min +
    distinct), all on the CURRENT edge set, which only shrinks
    (toward the star forest whose centers are the component minima):

      large-star: for every node u with neighborhood N(u), connect
        each v in N(u) with v > u to m = min(N(u) + {u}) — strictly
        larger nodes re-hang under the local minimum;
      small-star: orient every edge to (hi, lo); for hi's
        lo-neighborhood N, connect each v in N + {hi} except the
        minimum to that minimum.

    Both phases preserve connectivity and never raise any node's
    reachable minimum; termination = the edge set reaches the star
    fixpoint (large-star then changes nothing). Convergence check is
    an exact exceptAll probe per alternation (one scalar to the
    driver, same discipline as connected_components' changed-count).
    Lineage is truncated per alternation with eager localCheckpoint
    for the same reason as min-label's loop.
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v"))
         .distinct()
         .localCheckpoint(eager=True))

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.union(ed.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
        m = (sym.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (sym.join(m, on="u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct())

    def small_star(ed: DataFrame) -> DataFrame:
        ori = ed.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
        m = ori.groupBy("u").agg(F.min("v").alias("m"))
        hang = (ori.join(m, on="u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(m.select(F.col("u"), F.col("m").alias("v"))))
        return (hang.filter(F.col("u") != F.col("v"))
                .select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
                .distinct())

    for _ in range(max_iters):
        stepped = small_star(large_star(e)).localCheckpoint(eager=True)
        changed = (stepped.exceptAll(e).limit(1).count()
                   or e.exceptAll(stepped).limit(1).count())
        e = stepped
        if changed == 0:
            # The fixpoint of the COMPOSED step implies a star forest
            # by the paper's potential argument — but rather than
            # lean on theory for correctness, CHECK the structure
            # (one cheap aggregate, convergence-time only): a star
            # forest means no node sits on both sides (a center is
            # never someone's member) and each member hangs under
            # exactly one center. If either fails, keep alternating.
            bad = (e.select(F.col("u").alias("id"))
                   .join(e.select(F.col("v").alias("id")).distinct(),
                         on="id", how="left_semi")
                   .union(e.groupBy("u").agg(F.count(F.lit(1))
                                             .alias("c"))
                          .filter(F.col("c") > 1)
                          .select(F.col("u").alias("id")))
                   .limit(1).count())
            if bad:
                # changed == 0 means the composed step is already a
                # fixpoint, so re-iterating would recompute the same
                # state forever — fail loudly with the REAL condition
                raise RuntimeError(
                    "connected_components_stars reached a composed-"
                    "step fixpoint that is not a star forest — "
                    "violates the Kiveris et al. convergence "
                    "invariant; please report the input graph")
            # star forest: e holds (member, center) with center =
            # component min; centers label themselves
            members = e.select(F.col("u").alias("id"),
                               F.col("v").alias("component_id"))
            centers = e.select(F.col("v").alias("id")).distinct() \
                .withColumn("component_id", F.col("id"))
            return members.union(centers)
    raise RuntimeError(
        f"connected_components_stars did not converge in {max_iters} "
        "alternations")
