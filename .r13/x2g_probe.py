"""X2g probe-scaling measurement (round-13, VERDICT r12 ask #5).

The 100 TB claim under test: "the LSH band index is the persisted
bucketed artifact; per-run probe cost is O(batch), not O(corpus)".
Protocol, per multiplier m:

  1. corpus = the x2f sparse-sharing synthetic text over the AMPLIFIED
     doc_id space (every doc unique except every-third salted-id pair
     — candidate volume provably O(batch) at any corpus size);
  2. build minhash_band_index(corpus) ONCE and persist it bucketed by
     (band, bucket) — the one-off ETL write, timed separately;
  3. probe a FIXED 5000-doc batch (1/3 planted near-dups of corpus
     docs, 2/3 novel) best-of-3 through minhash_probe_index, with
     fetch_texts synthesizing candidate texts from ids (the
     production point-lookup's O(candidates) cost model);
  4. also time the bare index columnar scan — the one probe term that
     MUST grow with the corpus on single-box parquet (no exchange, no
     text, pure I/O; on a real cluster it parallelizes with the data,
     so at fixed data-per-executor it is ~constant wall-clock).

Output: one JSON line per multiplier -> .r13/x2g_probe.json and a
SCALE.md table. The near-flat claim is asserted on (probe - scan):
the COMPUTE term must not grow with the corpus.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.operators.bucketing import write_bucketed  # noqa: E402
from data_warehouse_spark.operators.dedup import (  # noqa: E402
    minhash_band_index, minhash_probe_index,
)
from data_warehouse_spark.session import get_spark  # noqa: E402

BATCH_DOCS = 5_000
MULTS = [int(m) for m in (sys.argv[1].split(",") if len(sys.argv) > 1
                          else ["64", "256", "1024", "4096"])]
AMP = "/tmp/floorfree/ddbe1476_amp{m}"

spark = get_spark("x2gprobe")


def x2f_text(ids_df, id_col="doc_id"):
    """The x2f sparse-sharing construction (queries/llm_text.py) as a
    reusable expression over an arbitrary id frame: 60 md5 tokens per
    doc; every third id-pair shares tokens 1-58."""
    did = F.col(id_col)
    pair = F.floor(did / 2).cast("long")
    shared = pair % 3 == 0
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda j: F.when(shared & (j <= 58),
                         F.md5(F.concat(F.lit("w"), pair.cast("string"),
                                        F.lit("-"), j.cast("string"))))
        .otherwise(F.md5(F.concat(F.lit("u"), did.cast("string"),
                                  F.lit("-"), j.cast("string")))))
    return ids_df.select(id_col, F.concat_ws(" ", toks).alias("text"))


def batch_df(m: int):
    """Fixed 5000-doc batch in a disjoint id space: k % 3 == 0 docs
    are near-dups of corpus doc k*m (copy 0 of source doc k — exists
    at every multiplier; last 2 of 60 tokens replaced, 3-gram Jaccard
    well above 0.5), the rest fully novel."""
    ks = spark.range(BATCH_DOCS).select(F.col("id").alias("k"))
    k = F.col("k")
    target = (k * m).cast("long")
    tpair = F.floor(target / 2).cast("long")
    tshared = tpair % 3 == 0
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda j: F.when(
            (k % 3 == 0) & (j <= 58),
            F.when(tshared,
                   F.md5(F.concat(F.lit("w"), tpair.cast("string"),
                                  F.lit("-"), j.cast("string"))))
            .otherwise(F.md5(F.concat(F.lit("u"), target.cast("string"),
                                      F.lit("-"), j.cast("string")))))
        .otherwise(F.md5(F.concat(F.lit("b"), k.cast("string"),
                                  F.lit("-"), j.cast("string")))))
    return ks.select((k + F.lit(10 ** 12)).alias("doc_id"),
                     F.concat_ws(" ", toks).alias("text"))


results = []
for m in MULTS:
    amp = AMP.format(m=m)
    ids = spark.read.parquet(f"{amp}/documents.parquet").select("doc_id")
    corpus = x2f_text(ids)
    tbl = f"x2g_probe_index_{m}"
    t0 = time.time()
    if not spark.catalog.tableExists(tbl):
        write_bucketed(minhash_band_index(corpus, "text", "doc_id"),
                       tbl, f"/tmp/x2g_probe/ix_{m}",
                       keys=["band", "bucket"], n_buckets=32)
    build_s = round(time.time() - t0, 2)
    index = spark.table(tbl)

    # the bare index scan: every probe must read these columns once
    scan_s = None
    for _ in range(3):
        t0 = time.time()
        index.select("band", "bucket", "corpus_id") \
            .write.format("noop").mode("overwrite").save()
        scan_s = min(scan_s or 1e9, time.time() - t0)

    batch = batch_df(m).localCheckpoint()  # fixed input, built once

    def fetch(idf):
        return x2f_text(idf)

    probe_s, out = None, None
    for _ in range(3):
        t0 = time.time()
        res = minhash_probe_index(index, batch, fetch, "text", "doc_id")
        res.write.format("noop").mode("overwrite").save()
        probe_s = min(probe_s or 1e9, time.time() - t0)
    res = minhash_probe_index(index, batch, fetch, "text", "doc_id")
    n_dup = res.filter("is_dup").count()
    n_rows = index.count()
    row = {"mult": m, "corpus_docs": ids.count(), "index_rows": n_rows,
           "index_build_s": build_s, "index_scan_s": round(scan_s, 2),
           "probe_s": round(probe_s, 2),
           "probe_minus_scan_s": round(probe_s - scan_s, 2),
           "batch_docs": BATCH_DOCS, "dups_found": n_dup}
    results.append(row)
    print(json.dumps(row), flush=True)

(REPO / ".r13" / "x2g_probe.json").write_text(
    json.dumps(results, indent=2) + "\n")
exp = BATCH_DOCS // 3 + (1 if BATCH_DOCS % 3 else 0)
for r in results:
    assert r["dups_found"] == exp, (r, exp)
print("planted recall exact at every multiplier:", exp)
