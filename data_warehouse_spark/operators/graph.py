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
    sym, labels = _symmetrize(edges, src, dst)
    labels, converged = _min_label_rounds(sym, labels, max_iters)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")
    return labels


def _symmetrize(edges: DataFrame, src: str, dst: str
                ) -> tuple[DataFrame, DataFrame]:
    """Checkpointed symmetric edge list + self-labeled node table — the
    min-label loop's starting state."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("a").alias("id")).distinct()
              .withColumn("component_id", F.col("id"))
              .localCheckpoint(eager=True))
    return sym, labels


def _min_label_rounds(sym: DataFrame, labels: DataFrame, rounds: int
                      ) -> tuple[DataFrame, bool]:
    """Up to `rounds` min-label propagation steps; returns the label
    table and whether a fixpoint was reached within the budget. The
    partial state is a valid intermediate (every label is the min id
    within some hop radius — still a node id of the same component),
    which is what lets connected_components_auto hand it to the
    star-contraction path instead of discarding the work."""
    for _ in range(rounds):
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
            return labels, True
    return labels, False


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
            # Scope of the probe (round-12 advice note): WITHIN a star
            # the center is the minimum by construction (edges are
            # canonicalized (u, v) with v < u, so every member id
            # exceeds its center's). That the center is the whole
            # COMPONENT's minimum rests on the steps' monotonicity
            # invariant (neither phase ever raises any node's
            # reachable minimum) — that property is not locally
            # checkable at the fixpoint without recomputing CC, so it
            # is covered by the cross-algorithm equivalence tests
            # (tests/test_properties.py pits stars against min-label
            # on random graphs, chains, and cliques) rather than a
            # runtime assert.
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


def connected_components_auto(edges: DataFrame, src: str, dst: str,
                              probe_rounds: int = 8,
                              max_iters: int = 50) -> DataFrame:
    """Connected components with AUTOMATIC algorithm selection — the
    form a pipeline author who doesn't know their graph's diameter
    should call (VERDICT r11 ask #4: the min-label-vs-stars choice is
    12.7x apart at diameter 256 and previously lived in a docstring).

    Strategy: run min-label propagation for a small round budget.
    Clique-like near-dup graphs (diameter 2-4, the common case for
    X2/X2c pair output) converge inside the budget and pay nothing
    beyond min-label's cheap rounds. If the budget is exhausted, the
    graph has diameter > probe_rounds: CONTRACT the graph by the
    current labels (each partial label = min id within <=probe_rounds
    hops, so blocks are label-preimages; quotient edges are original
    edges crossing blocks, deduped) and hand the quotient to the
    alternating-stars loop, whose round count is O(log^2 n) regardless
    of diameter. The probe work is kept, not discarded: a diameter-D
    chain contracts to ~D/probe_rounds quotient nodes before stars
    ever runs — measured on the x8c lane this beats restarting stars
    from the raw edges (see SCALE.md round-12 note).

    Exactness of the composition: the component minimum m keeps label
    m under min-label (no smaller id exists to displace it), so m is
    a quotient node; quotient components are exactly the images of
    original components (contraction preserves connectivity both
    ways); stars returns the quotient component's min label = m; the
    final join maps every node's partial label to m. A quotient node
    with no quotient edges is a whole original component already
    collapsed to its min, and the left-join coalesce keeps its label.
    """
    sym, labels = _symmetrize(edges, src, dst)
    labels, converged = _min_label_rounds(sym, labels, probe_rounds)
    if converged:
        return labels
    half = sym.filter(F.col("a") < F.col("b"))
    la = labels.select(F.col("id").alias("a"),
                       F.col("component_id").alias("ca"))
    lb = labels.select(F.col("id").alias("b"),
                       F.col("component_id").alias("cb"))
    contracted = (half.join(la, on="a").join(lb, on="b")
                  .select(F.col("ca").alias("cu"), F.col("cb").alias("cv"))
                  .filter(F.col("cu") != F.col("cv"))
                  .distinct()
                  .localCheckpoint(eager=True))
    quotient = connected_components_stars(contracted, "cu", "cv",
                                          max_iters=max_iters)
    q = quotient.select(F.col("id").alias("component_id"),
                        F.col("component_id").alias("final"))
    return (labels.join(q, on="component_id", how="left")
            .select("id", F.coalesce("final", "component_id")
                    .alias("component_id")))
