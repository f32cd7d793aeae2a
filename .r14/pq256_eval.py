"""256-vs-16-codeword IVF-PQ ranking at 1M (round-14 follow-through
on the codebook-size finding).

At 1M rows / 64 clusters the query's cluster holds ~15.6k members —
larger than any practical shortlist — so the 16-codeword book's
within-cluster ADC ties collapse to an id-lottery (measured mean
recall 0.36 at shortlist 2000 in .r14/pq_train_eval.json). The
256-codeword sampled book rides the Arrow-kernel encode
(pq_encode_arrow, the >32-codeword auto-route) and should rank
within-cluster for real. 8-query mean recall at shortlists 500/2000,
same prebuilt IVF index for both books. Also times one encode pass
per book over the probed candidates (expr vs Arrow kernel at 16 is
the kernel's overhead price; 256 has no expr form to compare).
"""

import hashlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from data_warehouse_spark.operators.similarity import (  # noqa: E402
    build_ivf_index, cosine, ivf_pq_topk, pq_codebook_sample,
    pq_encode, pq_encode_arrow,
)
from data_warehouse_spark.session import get_spark  # noqa: E402

DIM, N_CLUSTERS, N, K = 64, 64, 1_000_000, 20
QUERY_IDS = list(range(8))
spark = get_spark("pq256")


def h01(tag):
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) / 2 ** 32 * 2 - 1


centers = [[h01(f"c{k}-{j}") for j in range(DIM)]
           for k in range(N_CLUSTERS)]
centers_lit = F.array(*[F.array(*[F.lit(v) for v in row])
                        for row in centers])
noise = F.transform(
    F.sequence(F.lit(0), F.lit(DIM - 1)),
    lambda j: (F.conv(F.substring(F.md5(F.concat(
        F.lit("n"), F.col("id").cast("string"), F.lit("-"),
        j.cast("string"))), 1, 8), 16, 10).cast("double")
        / F.lit(2.0 ** 32) * 2 - 1) * 0.25)
ctr = F.element_at(centers_lit, (F.col("id") % N_CLUSTERS).cast("int") + 1)
df = spark.range(N).select(
    F.col("id").alias("vec_id"),
    F.zip_with(ctr, noise, lambda c, x: (c + x).cast("float"))
    .alias("embedding")).persist()
df.count()

qvs = {r.vec_id: [float(x) for x in r.embedding]
       for r in df.filter(F.col("vec_id").isin(QUERY_IDS)).collect()}
exacts = {}
for qid in QUERY_IDS:
    qarr = F.array(*[F.lit(x) for x in qvs[qid]])
    exacts[qid] = {r.vec_id for r in df.select(
        "vec_id", F.round(cosine(F.col("embedding"), qarr, DIM), 6)
        .alias("c")).orderBy(F.col("c").desc(), "vec_id")
        .limit(K).collect()}

idx = build_ivf_index(df, "embedding", "vec_id", n_cells=50,
                      iters=1, dim=DIM, persist=True)
out = {"corpus": N, "cluster_size": N // N_CLUSTERS,
       "n_queries": len(QUERY_IDS)}
for nc in (16, 256):
    cb = pq_codebook_sample(df, "embedding", "vec_id",
                            n_codes=nc, dim=DIM)
    for rr in (25, 100):
        hits = 0
        for qid in QUERY_IDS:
            got = {r.vec_id for r in ivf_pq_topk(
                df, "embedding", "vec_id", qvs[qid], k=K, nprobe=8,
                rerank=rr, index=idx, codebook=cb).collect()}
            hits += len(got & exacts[qid])
        out[f"codes{nc}_mean_recall_shortlist_{rr * K}"] = \
            round(hits / (K * len(QUERY_IDS)), 3)
    # full-corpus encode wall, best-of-2 (expr at 16, Arrow at 16 and
    # 256 — the kernel's overhead and the production-size feasibility)
    variants = [("arrow", pq_encode_arrow)]
    if nc == 16:
        variants.append(("expr", pq_encode))
    for tag, fn in variants:
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(df, "embedding", "vec_id", cb, n_sub=8,
               query_vec=qvs[0]).write.format("noop") \
                .mode("overwrite").save()
            best = min(best or 1e9, time.time() - t0)
        out[f"encode_{tag}_{nc}codes_s"] = round(best, 2)
idx.unpersist()
print(json.dumps(out))
(REPO / ".r14" / "pq256_eval.json").write_text(
    json.dumps(out, indent=2) + "\n")
