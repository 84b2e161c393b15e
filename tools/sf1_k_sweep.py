"""The parameterization lever for the two sf1-profile outliers,
measured: the bucketed bipartite ANN queries hold their demo centroid
count at K=8, so candidate pairs grow as |eval|x|train|/K — 100x when
both sides replicate 10x.  A real 10x deployment scales K with the
data.  This sweep re-runs the contamination probe pipeline at sf1
with K in {8, 32, 128} and reports candidate pairs + wall time,
demonstrating that K ∝ √N restores the sub-linear posture without
touching the plan.

Usage: python tools/sf1_k_sweep.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_cdc_spark.llm.similarity import cosine_sim, ivf_assign  # noqa: E402
from lakehouse_cdc_spark.plans.registry import table  # noqa: E402
from lakehouse_cdc_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir: str, k: int):
    """Build the probe pipeline fresh (a NEW DataFrame each call, so
    timed passes cannot reuse the previous pass's shuffle outputs —
    same protocol as tools/sf1_profile.py)."""
    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    train = emb.filter(F.col("vec_id") % 97 != 0)
    eval_rows = emb.filter(F.col("vec_id") % 97 == 0)
    assign = ivf_assign(train, centroids).select("vec_id", "cluster")
    eprobe = ivf_assign(eval_rows, centroids, probes=2).select(
        F.col("vec_id").alias("eval_id"), "cluster"
    )
    evecs = eval_rows.select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("eemb")
    )
    cand = (
        F.broadcast(eprobe)
        .join(assign, on="cluster")
        .select("eval_id", "vec_id")
        .distinct()
    )
    hits = (
        cand.join(train.select("vec_id", "embedding"), on="vec_id")
        .join(F.broadcast(evecs), on="eval_id")
        .select(
            "eval_id",
            "vec_id",
            cosine_sim(
                F.col("embedding").cast("array<double>"),
                F.col("eemb").cast("array<double>"),
            ).alias("cs"),
        )
    )
    out = hits.groupBy("eval_id").agg(
        F.count_if(F.col("cs") >= 0.5).alias("n")
    )
    return cand, out


def run(spark, sf_dir: str, k: int):
    cand, out = build(spark, sf_dir, k)
    out.collect()  # warm (codegen, footers)
    pairs = cand.count()
    best = float("inf")
    for _ in range(2):
        _, fresh = build(spark, sf_dir, k)  # new plan: no shuffle reuse
        t0 = time.perf_counter()
        fresh.collect()
        best = min(best, time.perf_counter() - t0)
    return pairs, round(best, 3)


def main():
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_testdata"
    spark = get_spark("k-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for k in (8, 32, 128):
        pairs, secs = run(spark, sf1_dir, k)
        res[k] = {"candidate_pairs": pairs, "sec": secs}
        print(f"K={k}: pairs={pairs} time={secs}s", file=sys.stderr)
    print(json.dumps({"sf1_dir": sf1_dir, "sweep": res}))


if __name__ == "__main__":
    main()
