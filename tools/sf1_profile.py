"""sf1 scaling profile: run the heaviest bench queries at sf0.1 and
at the 10x replicated sf1 set (tools/gen_sf1.py), and report the
wall-time ratio.  The 100 TB posture claims rest on plan shape; this
is the empirical check that wall time scales sub-linearly (ratio
< 10x) under AQE partition coalescing on local[32].

Usage: python tools/sf1_profile.py [sf1_dir]
Prints one JSON line: {"queries": {name: {"sf0.1": s, "sf1": s,
"ratio": r}}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_cdc_spark.plans import REGISTRY  # noqa: E402
from lakehouse_cdc_spark.session import get_spark  # noqa: E402

TOP = [
    "dedup_incremental_new_shard",
    "checksum_stats_lineitem",
    "graph_pagerank_purchases",
    "emb_late_interaction_maxsim",
    "graph_kcore_membership",
    "emb_semantic_dedup",
    "emb_ivf_recall_probe",
    "sketch_kmv_jaccard",
    "contamination_embedding_overlap",
    "sketch_histogram_quantiles",
    # round 11: the third quadratic-class ANN row (now auto-K) and the
    # heaviest map-side bench row join the per-round scale watch
    "emb_neardup_bucketed",
    "dedup_lsh_parameter_sweep",
]


def _time(spark, name, sf_dir):
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).collect()  # warm (footers, codegen)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_testdata"
    spark = get_spark("sf1-profile")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in TOP:
        t01 = _time(spark, name, "/root/testdata/sf0.1")
        t1 = _time(spark, name, sf1_dir)
        out[name] = {
            "sf0.1": t01,
            "sf1": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"{name}: sf0.1={t01}s sf1={t1}s ratio={out[name]['ratio']}x",
              file=sys.stderr)
    print(json.dumps({"queries": out, "replicas": 10}))


if __name__ == "__main__":
    main()
