"""Bucketed co-located join (operators/bucketing.py, J12): the point
is the PLAN — same answer as the shuffle join, zero Exchange and zero
Sort on the join key."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import load_all

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_j12_matches_j11_and_joins_without_exchange(spark):
    specs = load_all()
    j11 = specs["j11_fact_fact_join"].fn(spark, SF_SMOKE)
    j12 = specs["j12_bucketed_fact_join"].fn(spark, SF_SMOKE)

    rows11 = {tuple(r) for r in j11.collect()}
    rows12 = {tuple(r) for r in j12.collect()}
    assert rows12 == rows11 and rows12

    # at the smoke SF, AQE turns the join into a broadcast (correct at
    # that size); pin the fact-x-fact regime to assert the bucketed
    # sort-merge shape the layout exists for
    thresholds = ["spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    saved = {c: spark.conf.get(c, None) for c in thresholds}
    for c in thresholds:
        spark.conf.set(c, "-1")
    try:
        j12 = specs["j12_bucketed_fact_join"].fn(spark, SF_SMOKE)
        j12.collect()
        plan = _plan(j12)
    finally:
        for c, v in saved.items():
            spark.conf.set(c, v) if v is not None else spark.conf.unset(c)
    # round 6: the smaller fact hints shuffle_hash — on co-bucketed
    # scans the hash join is equally Exchange-free but skips the merge
    # machinery (20.3 -> 8.5 s at 1024x)
    assert "ShuffledHashJoin" in plan
    # the one-off bucketed write already clustered both sides: the join
    # key must never appear in a runtime exchange or sort
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Sort [l_orderkey" not in plan
    assert "Sort [o_orderkey" not in plan
    # the final 5-group aggregate is the only shuffle left
    assert plan.count("Exchange") <= 2  # agg exchange (+AQE read wrapper)


def test_e2b_matches_e2_and_sessionizes_without_exchange(spark):
    """E2b (round-9): the carbon rollup off the bucketed events layout
    must return e2's exact answer while the sessionization window runs
    with NO Exchange and NO Sort on the bike key — the scan's bucket
    clustering + write-time sort satisfy both. Only the 5-group
    provider rollup and the presentation sort may shuffle."""
    specs = load_all()
    # sf0.01, not the smoke SF: the fact's validity filter leaves zero
    # trips at sf0.001, which would vacuously pass the identity check
    sf = "/root/testdata/sf0.01"
    e2 = specs["e2_carbon_savings"].fn(spark, sf)
    e2b = specs["e2b_carbon_bucketed"].fn(spark, sf)

    rows_a = {tuple(r) for r in e2.collect()}
    rows_b = {tuple(r) for r in e2b.collect()}
    assert rows_b == rows_a and rows_b

    plan = _plan(e2b)
    # the window's distribution/order come from the bucketed scan
    assert "Exchange hashpartitioning(bike_id" not in plan
    assert "Exchange hashpartitioning(user_id" not in plan
    assert "Sort [bike_id" not in plan and "Sort [user_id" not in plan
    # what remains: the provider rollup's hash exchange + the ORDER BY
    # range exchange (each may appear twice in the AQE-wrapped dump)
    assert "Exchange hashpartitioning(provider_id" in plan


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """U8's payoff, quantified: after the z-order rewrite each file
    covers a small box in (lat, lon) space, so parquet min-max stats
    prune 2-D range predicates. A round-robin write gives every file
    the FULL span of both columns (no pruning possible); the z-ordered
    files must shrink the mean per-file span of BOTH dimensions by at
    least 2x. Content identity is also asserted — layout must never
    change data."""
    import glob

    from pyspark.sql import functions as F

    from data_warehouse_spark.io import load_table
    from data_warehouse_spark.operators.bucketing import (
        write_zordered, zorder_cell, zorder_key,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        F.expr("value % 90").alias("lat"),
        F.expr("(event_id % 36000) / 100.0 - 180.0").alias("lon"))
    b = ev.agg(F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")).first()
    xi = zorder_cell(F.col("lat"), b[0], b[1])
    yi = zorder_cell(F.col("lon"), b[2], b[3])

    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "rr")
    write_zordered(ev, zdir, zorder_key(xi, yi), n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(rdir)

    def mean_spans(path):
        tot_lat = tot_lon = n = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            row = (spark.read.parquet(f)
                   .agg(F.max("lat") - F.min("lat"),
                        F.max("lon") - F.min("lon")).first())
            if row[0] is None:
                continue
            tot_lat += row[0]; tot_lon += row[1]; n += 1
        assert n >= 8, f"too few files under {path}"
        return tot_lat / n, tot_lon / n

    z_lat, z_lon = mean_spans(zdir)
    r_lat, r_lon = mean_spans(rdir)
    assert z_lat * 2 <= r_lat, (z_lat, r_lat)
    assert z_lon * 2 <= r_lon, (z_lon, r_lon)

    # layout changed, content did not
    a = sorted(r.event_id for r in spark.read.parquet(zdir).collect())
    b = sorted(r.event_id for r in ev.select("event_id").collect())
    assert a == b


def test_x2g_probe_join_has_no_index_side_exchange(spark, tmp_path):
    """Round-13 (VERDICT r12 ask #5): the daily probe against the
    PERSISTED (band, bucket)-bucketed LSH index must shuffle only the
    batch side. Comparative assert, self-calibrating: the same probe
    against the same index stored as PLAIN parquet carries one more
    Exchange on the join key — that extra exchange is exactly the
    corpus-side shuffle the persisted layout pays once at write time."""
    from pyspark.sql import functions as F

    from data_warehouse_spark.io import load_table
    from data_warehouse_spark.operators.bucketing import write_bucketed
    from data_warehouse_spark.operators.dedup import (
        minhash_band_index, minhash_probe_index, probe_candidates,
    )

    corpus = (load_table(spark, SF_SMOKE, "documents")
              .select("doc_id", "text").limit(80))
    batch = corpus.limit(10).select(
        (F.col("doc_id") + 90_000).alias("doc_id"), "text")
    index = minhash_band_index(corpus, "text", "doc_id")

    spark.sql("DROP TABLE IF EXISTS x2g_index_plan_test")
    write_bucketed(index, "x2g_index_plan_test",
                   str(tmp_path / "x2gix"), keys=["band", "bucket"],
                   n_buckets=8)
    plain_path = str(tmp_path / "x2gix_plain")
    index.write.mode("overwrite").parquet(plain_path)

    def fetch(ids):
        return corpus.join(ids, on="doc_id", how="left_semi")

    # end-to-end equivalence first: same answer off either layout
    bucketed_full = minhash_probe_index(
        spark.table("x2g_index_plan_test"), batch, fetch,
        "text", "doc_id")
    plain_full = minhash_probe_index(
        spark.read.parquet(plain_path), batch, fetch, "text", "doc_id")
    assert ({tuple(r) for r in bucketed_full.collect()}
            == {tuple(r) for r in plain_full.collect()})

    # plan shape on the candidate join itself (minhash_probe_index
    # checkpoints it, which truncates the executed plan — assert on
    # the exposed subplan instead)
    thresholds = ["spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    saved = {c: spark.conf.get(c, None) for c in thresholds}
    for c in thresholds:  # pin the big-index regime, as in j12's test
        spark.conf.set(c, "-1")
    try:
        cb = probe_candidates(spark.table("x2g_index_plan_test"),
                              batch, "text", "doc_id")
        cp = probe_candidates(spark.read.parquet(plain_path),
                              batch, "text", "doc_id")
        cb.collect(), cp.collect()
        pb, pp = _plan(cb), _plan(cp)
    finally:
        for c, v in saved.items():
            spark.conf.set(c, v) if v is not None else spark.conf.unset(c)
    nb = pb.count("Exchange hashpartitioning(band")
    np_ = pp.count("Exchange hashpartitioning(band")
    # AQE's plan string renders each shuffle twice (the exchange node
    # + its ShuffleQueryStage), so compare the RATIO: plain parquet
    # shuffles both sides (2 real exchanges on the key), bucketed
    # shuffles only the batch side (1) — and the bucketed scan must
    # say so itself
    assert nb * 2 == np_ and nb > 0, (
        f"bucketed probe shows {nb} (band, bucket) exchanges vs "
        f"{np_} on plain parquet — the index side is shuffling")
    assert "Bucketed: true" in pb
    assert "Bucketed: true" not in pp
