"""Property tests (SURVEY §5): invariants over randomized-but-seeded
inputs, batched into single DataFrames so each property costs one Spark
job, not one per example."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from data_warehouse_spark.functions.geo import haversine_km
from data_warehouse_spark.operators.merge import upsert
from data_warehouse_spark.operators.sessionize import with_session_id


def test_haversine_properties(spark):
    rng = random.Random(42)
    rows = [(i, rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9),
             rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, lat1 double, lon1 double, "
                                     "lat2 double, lon2 double")
    checked = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat2"), F.col("lon2")).alias("d"),
        haversine_km(F.col("lat2"), F.col("lon2"),
                     F.col("lat1"), F.col("lon1")).alias("d_rev"),
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat1"), F.col("lon1")).alias("d_self"),
    )
    bad = checked.filter(
        (F.col("d") < 0) | (F.col("d") > 20015.1)          # half circumference
        | (F.abs(F.col("d") - F.col("d_rev")) > 1e-9)      # symmetry
        | (F.col("d_self") > 1e-9)).count()                # identity
    assert bad == 0


def test_upsert_algebraic_properties(spark):
    rng = random.Random(7)
    old = spark.createDataFrame(
        [(k, rng.randint(0, 100), "old") for k in range(200)],
        "k long, v long, src string")
    new = spark.createDataFrame(
        [(k, rng.randint(0, 100), "new") for k in range(100, 300)],
        "k long, v long, src string")

    once = upsert(old, new, keys=["k"])
    twice = upsert(once, new, keys=["k"])
    # idempotency: applying the same batch again changes nothing
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0
    # key coverage: result keys = old ∪ new, with new winning overlaps
    got = {r.k: r.src for r in once.collect()}
    assert set(got) == set(range(300))
    assert all(src == "new" for k, src in got.items() if k >= 100)
    assert all(src == "old" for k, src in got.items() if k < 100)


def test_sessionize_partition_invariance(spark):
    """Session assignment must not depend on physical partitioning —
    the property that guarantees identical results on any cluster
    layout (and under AQE re-planning)."""
    rng = random.Random(13)
    base_ts = 1_700_000_000
    rows = []
    for uid in range(20):
        t = base_ts + rng.randint(0, 3600)
        for i in range(50):
            t += rng.choice([30, 120, 4000])  # within-gap / new-session mix
            rows.append((uid, t, float(i)))
    df = spark.createDataFrame(rows, "user_id long, epoch long, value double") \
        .withColumn("ts", F.timestamp_seconds("epoch"))

    def sessions(d):
        out = with_session_id(d, key="user_id", ts="ts",
                              gap_seconds=1800.0, order_tiebreak="epoch")
        return {(r.user_id, r.epoch): r.session_id for r in out.collect()}

    a = sessions(df.repartition(1))
    b = sessions(df.repartition(17, "value"))  # adversarial layout
    assert a == b


def test_a8_approx_within_bounds(spark, sf_dir):
    """approx_count_distinct at rsd=0.02 and approx_percentile at
    accuracy=10000 must land near the exact answers. The registry query
    now emits the contract form (exact counts + verdict booleans, so
    the driver can hash-certify it); the raw estimates are replayed
    inline here to keep the tighter numeric bounds."""
    from data_warehouse_spark.io import load_table
    from data_warehouse_spark.queries.registry import load_all

    ev = load_table(spark, sf_dir, "events")
    approx = {r.event_type: r for r in
              ev.groupBy("event_type").agg(
                  F.approx_count_distinct("user_id", rsd=0.02)
                  .alias("approx_users"),
                  F.percentile_approx("value", F.lit(0.5), F.lit(10000))
                  .alias("approx_median_value")).collect()}
    exact = {r.event_type: r for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("users"),
                 F.expr("percentile(value, 0.5)").alias("median")).collect()}
    assert approx.keys() == exact.keys() and approx
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(2, 0.1 * e.users), et
        spread = abs(e.median) + 1e-9
        assert abs(a.approx_median_value - e.median) <= 0.05 * spread + 0.01, et
    # and the certified contract holds: verdicts TRUE, exact branch exact
    rows = {r.event_type: r for r in
            load_all()["a8_approx_agg"].fn(spark, sf_dir).collect()}
    assert rows.keys() == exact.keys()
    for et, r in rows.items():
        assert r.users_within_4rsd and r.median_within_rank_bound, et
        assert r.exact_users == exact[et].users, et
    # tighter 3 rsd bound lives HERE (pytest), not in the hash gate:
    # a fixture regen that lands a group at 3-4 rsd should flake a
    # diagnosable test, not fail the driver's parity hash (r10 advice)
    for et, a in approx.items():
        assert abs(a.approx_users - exact[et].users) \
            <= 3 * 0.02 * exact[et].users + 1, et


def test_cosine_lsh_recall_vs_exact_cosine():
    """X2d's recall net: planted pairs at controlled cosine, quantified
    against the sign-random-projection banding bound
    p(detect) = 1 - (1 - p_bit^r)^b with p_bit = 1 - arccos(c)/pi
    (r=8 bits/band, b=16 bands at the 128-bit default). The hyperplanes
    are seeded, so the run is deterministic; the assertion allows
    finite-sample slack under the theoretical mean. Returned cos_sim
    must equal brute force exactly (candidates are exact-verified)."""
    import numpy as np

    from data_warehouse_spark.operators.similarity import cosine_lsh_pairs
    from data_warehouse_spark.session import get_spark

    spark = get_spark("tests")
    rng = np.random.RandomState(3)
    dim, n_pairs = 64, 40
    rows, truth = [], {}
    for i in range(n_pairs):
        target = 0.80 + 0.19 * (i / (n_pairs - 1))  # cosines 0.80..0.99
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        w = rng.standard_normal(dim)
        w -= (w @ v) * v
        w /= np.linalg.norm(w)
        u = target * v + math.sqrt(1 - target * target) * w
        a32 = v.astype(np.float32)
        b32 = u.astype(np.float32)
        # truth from the float32-cast vectors, double accumulation —
        # exactly what the operator computes
        ad, bd = a32.astype(np.float64), b32.astype(np.float64)
        c = float((ad @ bd) / (np.linalg.norm(ad) * np.linalg.norm(bd)))
        rows += [(2 * i, [float(x) for x in a32]),
                 (2 * i + 1, [float(x) for x in b32])]
        truth[(2 * i, 2 * i + 1)] = c

    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.id_a, r.id_b): r.cos_sim
           for r in cosine_lsh_pairs(corpus, "embedding", "vec_id",
                                     threshold=0.8).collect()}

    # exact-verify: every returned planted pair carries the brute-force value
    for pair, c in got.items():
        if pair in truth:
            assert abs(c - round(truth[pair], 6)) < 2e-6, (pair, c, truth[pair])

    eligible = {p: c for p, c in truth.items() if c >= 0.8}
    assert len(eligible) >= 35
    found = sum(1 for p in eligible if p in got)
    recall = found / len(eligible)
    mean_p = sum(1 - (1 - (1 - math.acos(min(c, 1.0)) / math.pi) ** 8) ** 16
                 for c in eligible.values()) / len(eligible)
    assert recall >= mean_p - 0.15, (
        f"recall {recall:.3f} below banding bound {mean_p:.3f} - 0.15")
    # the near-identical tail must never be missed: p(detect) > 0.9998
    for pair, c in truth.items():
        if c >= 0.95:
            assert pair in got, f"missed near-identical pair {pair} (c={c:.3f})"


def test_minhash_lsh_recall_vs_exact_jaccard():
    """X2's only correctness net (it stays rows-only for the driver):
    quantified recall against brute-force exact Jaccard.

    40 planted (base, mutated) pairs with controlled similarity; a pair
    whose true word-3-gram Jaccard is j becomes an LSH candidate with
    probability p(j) = 1 - (1 - j^r)^b over the hash draw (b=8 bands,
    r=4 rows). The hash functions are fixed (seeded (a*h+b) mod p over
    one xxhash64 per shingle — dedup._minhash_coeffs), so the test is
    deterministic; the assertion allows finite-sample slack
    under the theoretical mean. Reported jaccard values must equal the
    brute-force computation exactly (the operator exact-verifies its
    candidates, so this is equality, not approximation)."""
    from data_warehouse_spark.operators.dedup import minhash_lsh_pairs
    from data_warehouse_spark.session import get_spark

    spark = get_spark("tests")

    def shingles(text: str, n: int = 3) -> set:
        toks = text.strip().lower().split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    def jaccard(a: set, b: set) -> float:
        return len(a & b) / len(a | b)

    rng = random.Random(7)
    rows, truth = [], {}
    n_tokens = 30
    for i in range(40):
        base = [f"a{i}w{j}" for j in range(n_tokens)]
        mutated = list(base)
        for j in rng.sample(range(n_tokens), k=i % 5):  # 0..4 edits
            mutated[j] = f"x{i}w{j}"
        a, b = " ".join(base), " ".join(mutated)
        rows += [(2 * i, a), (2 * i + 1, b)]
        truth[(2 * i, 2 * i + 1)] = jaccard(shingles(a), shingles(b))

    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in minhash_lsh_pairs(corpus, "text", "doc_id",
                                      num_hashes=32, bands=8,
                                      jaccard_threshold=0.5).collect()}

    # reported jaccard == brute force, for every returned planted pair
    for pair, j in got.items():
        if pair in truth:
            assert abs(j - round(truth[pair], 6)) < 1e-9, (pair, j, truth[pair])

    # recall floor: banding theory gives mean p(j) over eligible pairs;
    # allow 0.15 finite-sample slack below it
    eligible = {p: j for p, j in truth.items() if j >= 0.65}
    assert len(eligible) >= 15  # the corpus actually plants enough signal
    found = sum(1 for p in eligible if p in got)
    recall = found / len(eligible)
    mean_p = sum(1 - (1 - j ** 4) ** 8 for j in eligible.values()) / len(eligible)
    assert recall >= mean_p - 0.15, (
        f"recall {recall:.3f} below banding bound {mean_p:.3f} - 0.15")
    # and the near-identical tail must never be missed: p(j>=0.9) > 0.999
    for pair, j in truth.items():
        if j >= 0.9:
            assert pair in got, f"missed near-identical pair {pair} (j={j:.3f})"


def test_two_phase_prefix_sum_equals_window_on_random_strata(spark):
    """operators/sampling.py must agree with the naive per-stratum
    window on adversarial shapes: strata of wildly different sizes
    (incl. size 1), zero weights, duplicate weights, budgets that cut
    mid-stratum and budgets nothing fits under."""
    from pyspark.sql import Window

    from data_warehouse_spark.operators.sampling import (
        token_budget_sample_scalable,
    )

    rng = random.Random(777)
    rows = []
    for s, size in (("a", 1), ("b", 37), ("c", 400), ("d", 3)):
        for i in range(size):
            rows.append((s, f"k{rng.randrange(10**9):09d}_{s}{i}",
                         rng.choice([0, 1, 1, 5, 40, 900])))
    df = spark.createDataFrame(rows, "stratum string, k string, w long")

    for budget in (0, 7, 100, 10**6):
        naive_w = (Window.partitionBy("stratum").orderBy("k")
                   .rowsBetween(Window.unboundedPreceding, 0))
        naive = {(r.stratum, r.k, r.w, r.cum) for r in
                 df.withColumn("cum", F.sum("w").over(naive_w))
                 .filter(F.col("cum") <= budget).collect()}
        scaled = {(r.stratum, r.k, r.w, r.cum) for r in
                  token_budget_sample_scalable(
                      df, "stratum", "k", "w", budget, coarse=5).collect()}
        assert scaled == naive
        # prefix closure: everything selected sorts before everything
        # dropped, per stratum
        per = {}
        for (s, k, _, _) in naive:
            per.setdefault(s, set()).add(k)
        all_keys = {}
        for s, k, _ in rows:
            all_keys.setdefault(s, []).append(k)
        for s, sel in per.items():
            cut = max(sel)
            assert all(k in sel for k in all_keys[s] if k <= cut)


def test_sequence_pack_boundary_invariant_and_covers_stream(spark):
    """sequence_pack must equal the naive single-window arithmetic at
    several chunk counts (boundary invariance, as for the sampler),
    and the packing must tile the token stream: per stratum the first
    doc starts at sequence 0, start <= end everywhere, consecutive
    docs' ranges abut (next.start in {prev.end, prev.end + 1}), and
    the last doc ends at (total_tokens - 1) div L."""
    import random

    from data_warehouse_spark.operators.sampling import sequence_pack

    rng = random.Random(4242)
    rows = []
    for s, size in (("a", 1), ("b", 53), ("c", 400)):
        for i in range(size):
            rows.append((s, f"k{rng.randrange(10**9):09d}_{s}{i}",
                         rng.choice([1, 2, 7, 100, 900, 1500])))
    df = spark.createDataFrame(rows, "stratum string, k string, w long")
    L = 128

    ref = None
    for coarse in (1, 5, 32):
        got = {(r.stratum, r.k, r.w, r.cum, r.start_seq, r.end_seq)
               for r in sequence_pack(df, "stratum", "k", "w", L,
                                      coarse=coarse).collect()}
        if ref is None:
            ref = got
        assert got == ref, f"coarse={coarse} diverged"

    per = {}
    for (s, k, w, cum, a, b) in sorted(ref, key=lambda t: (t[0], t[3])):
        assert a <= b and a == (cum - w) // L and b == (cum - 1) // L
        per.setdefault(s, []).append((a, b, cum))
    for s, spans in per.items():
        assert spans[0][0] == 0
        for (pa, pb, _), (na, nb, _) in zip(spans, spans[1:]):
            assert na in (pb, pb + 1)
        total = spans[-1][2]
        assert spans[-1][1] == (total - 1) // L


def test_wide_sum_exact_vs_python_and_overflow_regime(spark):
    """util.wide_sum must equal the exact integer sum (as double) on
    random cents^3-scale operands, including values near the split
    boundary — and in a regime where a plain LONG sum would overflow."""
    from data_warehouse_spark.queries.util import wide_sum

    rng = random.Random(99)
    # cents^3-scale rows plus adversarial boundary values (exact
    # multiples of the split and off-by-one neighbors)
    vals = [rng.randrange(0, 4 * 10**10) for _ in range(2000)]
    vals += [0, 1, 10**6 - 1, 10**6, 10**6 + 1, 4 * 10**10]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.agg(wide_sum(F.col("v")).alias("s")).collect()[0].s
    assert got == float(sum(vals))
    # overflow regime: per-row operands of ~4.6e18 (half of LONG max)
    # would overflow a plain F.sum at two rows; wide_sum must not
    big = [4 * 10**18, 5 * 10**18, 3 * 10**18]
    bdf = spark.createDataFrame([(v,) for v in big], "v long")
    got_big = bdf.agg(wide_sum(F.col("v")).alias("s")).collect()[0].s
    assert got_big == float(sum(big))


def test_scd2_apply_matches_python_model_on_random_batches(spark):
    """scd2_apply vs an obviously-correct Python model of its
    documented semantics (close/insert/no-op/new-key/late-update/
    null-eff-drop), over seeded random dimensions and update batches —
    the randomized net for the engine's most intricate merge logic."""
    import datetime as dt

    from pyspark.sql import Row

    from data_warehouse_spark.operators.merge import scd2_apply

    rng = random.Random(4242)
    T = lambda d: dt.datetime(2024, 1, d)  # noqa: E731

    for trial in range(5):
        # random current dimension: keys 0..9, attrs from a small pool
        dim_rows, model = [], {}
        hist_rows = []
        for k in range(10):
            if rng.random() < 0.8:
                a = rng.choice("xyz")
                vf = T(rng.randint(1, 5))
                dim_rows.append(Row(k=k, a=a, valid_from=vf,
                                    valid_to=None, is_current=True))
                model[k] = (a, vf)
            if rng.random() < 0.3:  # some closed history rows
                hist_rows.append(Row(k=k, a=rng.choice("xyz"),
                                     valid_from=T(1), valid_to=T(2),
                                     is_current=False))
        # random update batch, possibly multiple per key + null eff_ts;
        # (k, eff_ts) kept unique — on an exact tie the engine's
        # survivor is deliberately arbitrary (dedup_latest row_number),
        # so a tie with differing attrs would make the model ambiguous
        upd_rows, seen = [], set()
        for _ in range(12):
            k = rng.randrange(14)          # 10..13 are new keys
            a = rng.choice("xyzw")
            eff = None if rng.random() < 0.1 else T(rng.randint(1, 9))
            if eff is not None and (k, eff) in seen:
                continue
            seen.add((k, eff))
            upd_rows.append(Row(k=k, a=a, eff_ts=eff))

        # python model: latest non-null-eff update per key applies
        latest = {}
        for r in upd_rows:
            if r.eff_ts is None:
                continue
            if r.k not in latest or r.eff_ts > latest[r.k].eff_ts:
                latest[r.k] = r
        want = [(r.k, r.a, r.valid_from, r.valid_to, False)
                for r in hist_rows]
        for k, (a, vf) in model.items():
            u = latest.get(k)
            if u is None or u.a == a or u.eff_ts < vf:
                want.append((k, a, vf, None, True))       # no-op / late
            else:
                want.append((k, a, vf, u.eff_ts, False))  # closed
                want.append((k, u.a, u.eff_ts, None, True))
        for k, u in latest.items():
            if k not in model:
                want.append((k, u.a, u.eff_ts, None, True))  # new key

        schema = ("k int, a string, valid_from timestamp, "
                  "valid_to timestamp, is_current boolean")
        dim = spark.createDataFrame(dim_rows + hist_rows, schema)
        ups = spark.createDataFrame(upd_rows,
                                    "k int, a string, eff_ts timestamp")
        got = {(r.k, r.a, r.valid_from, r.valid_to, r.is_current)
               for r in scd2_apply(dim, ups, keys=["k"],
                                   attrs=["a"]).collect()}
        assert got == set(want), f"trial {trial}: {got ^ set(want)}"


def test_asof_join_matches_python_model_on_random_series(spark):
    """asof_join vs a Python model: per left row, the latest right row
    with rts <= ts wins ATOMICALLY (its genuine NULLs included).
    (k, rts) kept unique — exact ties break by a content hash the
    model can't replicate, and real time series don't collide."""
    import datetime as dt

    from pyspark.sql import Row

    from data_warehouse_spark.operators.joins import asof_join

    rng = random.Random(77)
    T = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731

    for trial in range(4):
        right_rows, seen = [], set()
        for _ in range(40):
            k = rng.randrange(5)
            m = rng.randrange(500)
            if (k, m) in seen:
                continue
            seen.add((k, m))
            right_rows.append(Row(
                k=k, rts=T(m),
                temp=None if rng.random() < 0.25 else float(m),
                wind=float(rng.randrange(50))))
        left_rows = [Row(k=rng.randrange(6), ts=T(rng.randrange(520)),
                         row_id=i) for i in range(60)]

        model = {}
        for lr in left_rows:
            cands = [r for r in right_rows
                     if r.k == lr.k and r.rts <= lr.ts]
            if cands:
                w = max(cands, key=lambda r: r.rts)
                model[lr.row_id] = (w.temp, w.wind)
            else:
                model[lr.row_id] = (None, None)

        out = asof_join(
            spark.createDataFrame(left_rows, "k int, ts timestamp, row_id int"),
            spark.createDataFrame(
                right_rows, "k int, rts timestamp, temp double, wind double"),
            on="k", left_ts="ts", right_ts="rts",
            value_cols=["temp", "wind"])
        got = {r.row_id: (r.temp, r.wind) for r in out.collect()}
        assert got == model, f"trial {trial}"


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """x8's label propagation vs a Python union-find over random sparse
    graphs (including isolated pairs, chains, and a dense clique) —
    component_id must be the min node id of each component."""
    from data_warehouse_spark.operators.graph import connected_components

    rng = random.Random(31337)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        edges += [(i, i + 1) for i in range(50, 54)]      # a chain
        edges += [(55, 56), (57, 58)]                     # isolated pairs
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        nodes = {x for e in edges for x in e}
        want = {}
        comp_min = {}
        for x in nodes:
            comp_min.setdefault(find(x), []).append(x)
        for root, members in comp_min.items():
            m = min(members)
            for x in members:
                want[x] = m

        df = spark.createDataFrame(edges, "a long, b long")
        got = {r.id: r.component_id for r in
               connected_components(df, "a", "b").collect()}
        assert got == want, f"trial {trial}"


def test_rolling_fingerprint_matches_python_model(spark):
    """x5d's engine-side min-over-windows must equal a pure-Python
    reference on randomized seeded unicode strings, for BOTH hash
    families. The md5-60 reference recomputes conv(substr(md5,1,15))
    with hashlib; the xxhash64 family has no portable Python twin, so
    its property is the structural one: fingerprint equals the min of
    the per-window xxhash64 column computed independently (same
    engine, different plan — catches windowing/indexing bugs without
    trusting the hash)."""
    import hashlib
    import random

    from data_warehouse_spark.functions.text import rolling_fingerprint

    rng = random.Random(88)
    alphabet = "ab c.12 äö 東京 🙂"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
             for _ in range(150)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")

    def py_md5_60(t):
        n = max(len(t) - 7, 1)
        return min(int(hashlib.md5(t[k:k + 8].encode()).hexdigest()[:15], 16)
                   for k in range(n))

    got = {r.i: r.fp for r in df.select(
        "i", rolling_fingerprint(F.col("t"), hash_family="md5")
        .alias("fp")).collect()}
    assert got == {i: py_md5_60(t) for i, t in enumerate(texts)}

    # structural property for the production family: same min via an
    # independent explode plan
    win = df.select(
        "i", F.explode(F.sequence(
            F.lit(1), F.greatest(F.length("t") - 7, F.lit(1)))).alias("k"))
    win = win.join(df, "i").select(
        "i", F.xxhash64(F.substr(F.col("t"), F.col("k"), F.lit(8))).alias("h"))
    want_xx = {r.i: r.m for r in
               win.groupBy("i").agg(F.min("h").alias("m")).collect()}
    got_xx = {r.i: r.fp for r in df.select(
        "i", rolling_fingerprint(F.col("t")).alias("fp")).collect()}
    assert got_xx == want_xx


def test_colref_quoting_pathological_names(spark):
    """functions/colref.py is load-bearing for every merge op (round-9
    made all caller-name resolution go through qcol); pin it over
    adversarial names — dots, backticks, spaces, unicode, SQL
    metacharacters — through upsert, dedup_latest, and scd2_apply
    (round-10 VERDICT ask #7). House style: seeded generation, one
    Spark job per op."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from data_warehouse_spark.functions.colref import qcol, quote_ident
    from data_warehouse_spark.operators.merge import (
        dedup_latest, scd2_apply, upsert,
    )

    # the adversarial battery: every class the advice named, plus the
    # SQL-injection-shaped ones a quoting bug would mangle
    names = ["a.b", "k`tick", "has space", "naïve名前",
             "semi;colon--x", "back\\slash", "`lead", "trail`",
             "dot.and`tick", "select * from t"]

    # quote_ident round-trip property (pure string level): wrapped in
    # single backticks, embedded ones doubled
    rng = random.Random(9)
    fuzz = ["".join(rng.choice("ab`. 名-*;'\"\\") for _ in range(rng.randint(1, 12)))
            for _ in range(200)]
    for s in names + fuzz:
        q = quote_ident(s)
        assert q[0] == "`" and q[-1] == "`"
        assert q[1:-1] == s.replace("`", "``")

    # qcol resolution property: a one-row frame whose columns carry
    # every adversarial name at once — each must resolve as a PLAIN
    # column (never struct access / SQL parse), aliased or not
    schema = StructType([StructField(n, LongType()) for n in names])
    row = tuple(range(len(names)))
    df = spark.createDataFrame([row], schema)
    got = df.alias("fr").select(
        *[qcol(n).alias(f"c{i}") for i, n in enumerate(names)],
        *[qcol(n, "fr").alias(f"q{i}") for i, n in enumerate(names)],
    ).collect()[0]
    for i in range(len(names)):
        assert got[f"c{i}"] == i and got[f"q{i}"] == i

    # each merge op end-to-end, key AND order/attr/ts columns all
    # pathological (>=3 pathological names per op)
    for key in ("a.b", "k`tick", "has space"):
        ord_col, attr = "or`der.x", "at tr.`y"
        ms = StructType([StructField(key, LongType()),
                         StructField(ord_col, LongType()),
                         StructField(attr, StringType())])
        old = spark.createDataFrame([(1, 10, "old"), (2, 10, "keep")], ms)
        new = spark.createDataFrame([(1, 20, "new"), (1, 15, "stale")], ms)

        up = {r[key]: r[attr] for r in
              upsert(old, new, [key], order_col=ord_col).collect()}
        assert up == {1: "new", 2: "keep"}, key

        dl = {r[key]: r[ord_col] for r in
              dedup_latest(new, [key], ord_col).collect()}
        assert dl == {1: 20}, key

        ds = StructType([StructField(key, LongType()),
                         StructField(attr, StringType()),
                         StructField("valid_from", LongType()),
                         StructField("valid_to", LongType()),
                         StructField("is_current", StringType())])
        dim = spark.createDataFrame([(1, "v1", 0, None, "true")], ds) \
            .withColumn("is_current", F.col("is_current") == "true")
        us = StructType([StructField(key, LongType()),
                         StructField(attr, StringType()),
                         StructField("eff", LongType())])
        ups = spark.createDataFrame([(1, "v2", 5), (3, "v9", 7)], us)
        out = scd2_apply(dim, ups, [key], [attr], eff_ts_col="eff")
        rows = {(r[key], r[attr], r["is_current"]) for r in out.collect()}
        assert rows == {(1, "v1", False), (1, "v2", True),
                        (3, "v9", True)}, key

    # r10 review fix: the span-dedup operators take caller names too
    from data_warehouse_spark.operators.dedup import (
        remove_shared_spans, shared_spans,
    )
    import hashlib
    shared = "".join(hashlib.md5(f"c{i}".encode()).hexdigest()[:4]
                     for i in range(16))  # 64 aperiodic chars
    for tcol, icol in (("te.xt", "doc.id"), ("t`ext", "i d")):
        ss = StructType([StructField(icol, LongType()),
                         StructField(tcol, StringType())])
        sdf = spark.createDataFrame(
            [(1, "x" * 30 + shared), (2, "z" * 41 + shared)], ss)
        spans = shared_spans(sdf, tcol, icol, min_span=40).collect()
        assert len(spans) == 1 and spans[0].span_len == 64, (tcol, icol)
        cleaned = {r[icol]: r.text_clean for r in
                   remove_shared_spans(sdf, tcol, icol,
                                       min_span=40).collect()}
        assert cleaned[1] == "x" * 30 + shared   # first copy kept
        assert cleaned[2] == "z" * 41, (tcol, icol)


def test_span_removal_idempotent_on_planted_and_junction_exception(spark):
    """X16b fixed-point property (r11, VERDICT r10 ask #5): running
    remove_shared_spans on its own output produces zero cuts for
    planted corpora — keep-first excision leaves at most one copy of
    every >=min_span shared span, so a second pass finds nothing.

    The one class where idempotence genuinely FAILS (documented, not
    papered over): a splice junction can CREATE a new >=min_span
    match — cutting S out of u+S+v makes u+v adjacent, and if u+v
    happens to equal a window of another doc, pass 2 finds it. One
    natural instance: a shared span planted INSIDE another shared
    span (u+v = the outer span, S = the inner) — cutting the inner
    splices the outer back together; an early version of this test's
    random planting did exactly that by inserting into the already-
    planted body. The counterexample below constructs the class
    directly and asserts pass 2 cuts ONCE then pass 3 is clean;
    pipelines needing a guaranteed fixed point iterate until
    sum(n_cut) = 0 (Lee et al. 2022 run exact-substring dedup to
    convergence for the same reason). The random trials therefore
    plant at distinct ORIGINAL-body offsets, right-to-left, so spans
    may touch but never nest — the regime where idempotence is the
    theorem: excision returns the victim to its unique original
    body, restoring only adjacencies that already existed."""
    import hashlib
    import random

    from data_warehouse_spark.operators.dedup import remove_shared_spans

    def md5_stream(tag: str, n_hex: int) -> str:
        out = []
        i = 0
        while sum(len(s) for s in out) < n_hex:
            out.append(hashlib.md5(f"{tag}-{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n_hex]

    def rerun(df):
        out = remove_shared_spans(df, "text", "doc_id", min_span=40)
        again = out.selectExpr("doc_id", "text_clean AS text")
        n2 = remove_shared_spans(again, "text", "doc_id", min_span=40)
        return out, n2

    # randomized planted corpora: unique md5-stream bodies, shared
    # spans planted across random pairs/triples at random offsets,
    # some overlapping within one victim doc
    rng = random.Random(1106)
    for trial in range(3):
        spans = [md5_stream(f"sp{trial}-{k}", rng.randrange(48, 160))
                 for k in range(6)]
        rows = []
        for d in range(24):
            body = md5_stream(f"doc{trial}-{d}", rng.randrange(200, 500))
            # plant 0-3 shared spans at distinct ORIGINAL-body offsets,
            # inserted right-to-left: spans may touch, never nest (a
            # nested plant is the documented junction class below)
            chosen = rng.sample(spans, rng.randrange(0, 4))
            ats = sorted((rng.randrange(0, len(body) + 1)
                          for _ in chosen), reverse=True)
            for s, at in zip(chosen, ats):
                body = body[:at] + s + body[at:]
            rows.append((d, body))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        _, second = rerun(df)
        leftover = second.agg(F.sum("n_cut")).collect()[0][0]
        assert leftover == 0, f"trial {trial}: second pass cut {leftover}"

    # the junction counterexample: W = u+v lives in doc 1; doc 2 is
    # u + S + v with S shared with doc 1 -> pass 1 cuts S from doc 2,
    # splicing u+v = W into existence; pass 2 cuts W; pass 3 clean
    S = md5_stream("junction-S", 64)
    W = md5_stream("junction-W", 40)
    u, v = W[:20], W[20:]
    filler = "q" * 60
    d1 = S + filler + W
    d2 = u + S + v
    df = spark.createDataFrame([(1, d1), (2, d2)],
                               "doc_id long, text string")
    first, second = rerun(df)
    assert {r.doc_id: r.n_cut for r in first.collect()} == {1: 0, 2: 1}
    spliced = dict((r.doc_id, r.text_clean) for r in first.collect())
    assert spliced[2] == W  # the junction recreated W verbatim
    assert second.agg(F.sum("n_cut")).collect()[0][0] == 1  # NOT idempotent
    third_in = second.selectExpr("doc_id", "text_clean AS text")
    third = remove_shared_spans(third_in, "text", "doc_id", min_span=40)
    assert third.agg(F.sum("n_cut")).collect()[0][0] == 0  # converged


def test_chain_lane_components_closed_form(spark):
    """X8b lane construction (r11): on dense ids 0..n-1 with chain
    length L = max(2, ceil(log2(n))), the component of id is
    floor(id/L)*L — asserted against the actual min-label propagation
    output, plus the lane's two scale claims: singleton tail chains
    drop out (no edges), and L grows with n (the planted-diameter
    dimension)."""
    import math

    from data_warehouse_spark.operators.graph import connected_components

    for n in (23, 64, 300):
        L = max(2, math.ceil(math.log2(n)))
        docs = spark.range(n).selectExpr("id AS doc_id")
        a, b = docs.alias("a"), docs.alias("b")
        edges = (a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
                 .filter(F.floor(F.col("a.doc_id") / L)
                         == F.floor(F.col("b.doc_id") / L))
                 .select(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b")))
        comp = {r.id: r.component_id
                for r in connected_components(edges, "id_a", "id_b",
                                              max_iters=64).collect()}
        expect = {i: (i // L) * L for i in range(n)
                  if n - (i // L) * L >= 2 or (i // L) * L + L <= n}
        # drop singleton tail chain (a chain with exactly 1 node has
        # no edges and never enters the component table)
        expect = {i: c for i, c in expect.items()
                  if min(L, n - c) >= 2}
        assert comp == expect, n
    # diameter dimension: L strictly grows across the floorfree lane
    mults = [5000, 5000 * 64, 5000 * 256, 5000 * 1024]
    Ls = [max(2, math.ceil(math.log2(m))) for m in mults]
    assert Ls == sorted(set(Ls)) and Ls[-1] == 23


@pytest.mark.slow  # r17: heavyweight lane, out of the default driver gate (pytest.ini)
def test_stars_cc_matches_minlabel_on_random_and_chain_graphs(spark):
    """connected_components_stars (alternating large/small-star) must
    produce exactly min-label propagation's output on random sparse
    graphs, cliques, and — its reason to exist — long chains, where
    min-label needs diameter rounds and stars needs ~log."""
    from data_warehouse_spark.operators.graph import (
        connected_components, connected_components_stars,
    )

    rng = random.Random(2718)
    cases = []
    for _ in range(3):
        edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
        cases.append([(a, b) for a, b in edges if a != b])
    cases.append([(i, i + 1) for i in range(100, 180)])      # 81-chain
    cases.append([(i, j) for i in range(8) for j in range(i)])  # clique
    # lollipop: clique 0-5 with a 30-node tail off node 5
    cases.append([(i, j) for i in range(6) for j in range(i)]
                 + [(i, i + 1) for i in range(5, 35)])
    # two chains bridged mid-to-mid (min label enters from the side)
    cases.append([(i, i + 1) for i in range(200, 230)]
                 + [(i, i + 1) for i in range(300, 330)]
                 + [(215, 315)])

    for k, edges in enumerate(cases):
        df = spark.createDataFrame(edges, "a long, b long")
        stars = {r.id: r.component_id for r in
                 connected_components_stars(df, "a", "b").collect()}
        # min-label on the 81-chain needs 81 rounds — raise its cap
        label = {r.id: r.component_id for r in
                 connected_components(df, "a", "b",
                                      max_iters=120).collect()}
        assert stars == label, f"case {k}"


@pytest.mark.slow  # r17: heavyweight lane, out of the default driver gate (pytest.ini)
def test_auto_cc_matches_minlabel_on_all_regimes(spark):
    """connected_components_auto must equal min-label's output on every
    graph shape, whichever path it takes internally: cliques converge
    inside the probe budget (pure min-label path), chains exhaust it
    and route through label-contraction + stars, and the mixed
    lollipop exercises the contraction with a partially-collapsed
    clique head. probe_rounds=4 forces the fallback on every
    diameter>4 case; probe_rounds high enough to converge must also
    agree (both-paths-same-answer)."""
    import random

    from data_warehouse_spark.operators.graph import (
        connected_components, connected_components_auto,
    )

    rng = random.Random(1414)
    cases = []
    for _ in range(2):
        edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
        cases.append([(a, b) for a, b in edges if a != b])
    cases.append([(i, i + 1) for i in range(100, 160)])      # 61-chain
    cases.append([(i, j) for i in range(8) for j in range(i)])  # clique
    cases.append([(i, j) for i in range(6) for j in range(i)]   # lollipop
                 + [(i, i + 1) for i in range(5, 30)])
    cases.append([(i, i + 1) for i in range(200, 220)]       # bridged chains
                 + [(i, i + 1) for i in range(300, 320)]
                 + [(210, 310)])

    for k, edges in enumerate(cases):
        df = spark.createDataFrame(edges, "a long, b long")
        want = {r.id: r.component_id for r in
                connected_components(df, "a", "b", max_iters=120).collect()}
        for probe in (4, 128):
            got = {r.id: r.component_id for r in
                   connected_components_auto(df, "a", "b",
                                             probe_rounds=probe).collect()}
            assert got == want, f"case {k} probe {probe}"


def test_chunk_overlapping_properties_random_params(spark):
    """chunk_overlapping vs a plain-Python reference across random
    (chunk_size, stride) configs and adversarial texts (empty,
    whitespace-only, single-token, exact-boundary lengths). Invariants
    beyond equality: full coverage (every token index falls in >= 1
    chunk), exact overlap (consecutive chunks share chunk_size -
    stride token positions), and no chunk is empty."""
    import re

    from data_warehouse_spark.operators.chunking import chunk_overlapping

    rng = random.Random(13)
    words = ["tok%d" % i for i in range(40)]
    texts = ["", "   ", "one", "a b", "  padded  text  "]
    for n in (1, 47, 48, 49, 63, 64, 65, 96, 112, 113, 200):
        texts.append(" ".join(rng.choice(words) for _ in range(n)))
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    for chunk_size, stride in ((64, 48), (64, 64), (5, 2), (1, 1),
                               (16, 5), (7, 7)):
        got = {}
        out = chunk_overlapping(df, text_col="text", id_col="doc_id",
                                chunk_size=chunk_size, stride=stride)
        for r in out.collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_idx, r.tok_start, r.chunk_text, r.n_tokens))
        for doc_id, text in rows:
            toks = re.split(r"\s+", text.strip().lower())
            n = len(toks)
            nc = 1 if n <= chunk_size else \
                math.ceil((n - chunk_size) / stride) + 1
            want = []
            covered = set()
            for i in range(nc):
                s = i * stride
                w = toks[s:s + chunk_size]
                covered.update(range(s, s + len(w)))
                want.append((i, s, " ".join(w), len(w)))
            assert sorted(got[doc_id]) == want, \
                (doc_id, chunk_size, stride)
            assert covered == set(range(n)), (doc_id, chunk_size, stride)
            assert all(c[3] >= 1 for c in want)


def test_cents_exact_on_random_two_decimal_values(spark):
    """util.cents backs every money oracle: for ANY 2-decimal value
    stored as its nearest double — positive, negative, boundary .x5,
    account-balance magnitudes — cents(v) must equal the exact scaled
    integer, and money_sum must equal the exact Decimal sum. A single
    half-offset mistake (e.g. sign-blind +0.5) fails this on the
    negative half."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from data_warehouse_spark.queries.util import cents, money_sum

    rng = random.Random(4242)
    ks = [rng.randrange(-10**11, 10**11) for _ in range(4000)]
    ks += [5, -5, 15, -15, 105, -105, 0,          # .x5 boundaries
           99999999995, -99999999995]             # big .x5
    rows = [(i, k / 100) for i, (k) in enumerate(ks)]
    df = spark.createDataFrame(rows, "i long, v double")
    got = {r.i: r.c for r in
           df.select("i", cents("v").alias("c")).collect()}
    for i, k in enumerate(ks):
        assert got[i] == k, f"cents({k/100!r}) = {got[i]}, want {k}"
    s = df.agg(money_sum("v").alias("s")).collect()[0].s
    want = float(sum(Decimal(k) for k in ks) / 100)
    assert s == want, (s, want)
