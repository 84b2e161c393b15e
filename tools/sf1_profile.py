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
    # round 12: one row per remaining heavy family, so the scale watch
    # covers entity resolution, graph, time series, LM scoring, text
    # retrieval, lexical contamination, and the multimodal Arrow
    # kernels — not just dedup/ANN
    "er_blocked_fuzzy_match",
    "er_sorted_neighborhood",
    "graph_triangle_count",
    "ts_anomaly_zscore",
    "text_bigram_lm_score",
    "text_bm25_search",
    "contamination_ngram_overlap",
    "multimodal_decode_real",
    "multimodal_scene_cuts",
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
    stream_row = _stream_row(sf1_dir)
    out["stream_ingest"] = stream_row
    print(json.dumps({"queries": out, "replicas": 10}))
    if stream_row["ratio"] is None:
        # a failed stream measurement must read as a RED battery step,
        # not as a permanently-skipped row (the >25% comparator skips
        # None ratios, so exit code is the only enforcement point)
        sys.exit(1)


def _stream_row(sf1_dir: str) -> dict:
    """Streaming ingest at both SFs (round-12 verdict ask): run
    tools/stream_bench.py — the full file-source → classify →
    compact → snapshot-upsert path — against sf0.1 and the sf1 set in
    fresh subprocess JVMs, and report absolute rows/sec at both SFs
    plus a PER-REPLICA wall ratio: ``ingest_sec`` covers 10x the rows
    through the same 8 micro-batches, so the raw wall ratio is
    divided by 10 — **1.0 = perfectly linear throughput**, above 1
    means per-row cost grew with scale.  NOTE this is a different
    scale from the query rows' raw sf1/sf0.1 ratios (where ≤4x for
    10x data is the target); the >25% ROUND-OVER-ROUND drift flag in
    close_battery applies uniformly to both."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    walls, rps = {}, {}
    for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=d)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "stream_bench.py")],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("{")),
            None,
        )
        if proc.returncode != 0 or line is None:
            print(f"stream_bench {label} failed:\n"
                  + "\n".join(proc.stderr.splitlines()[-5:]), file=sys.stderr)
            return {"sf0.1": None, "sf1": None, "ratio": None}
        rec = json.loads(line)
        walls[label] = rec["ingest_sec"]
        rps[label] = rec["value"]
        print(f"stream_ingest {label}: {rec['ingest_sec']}s "
              f"({rec['value']} rows/s)", file=sys.stderr)
    return {
        "sf0.1": walls["sf0.1"],
        "sf1": walls["sf1"],
        # rows grow 10x between the SFs: normalize the wall ratio PER
        # REPLICA so 1.0 = linear throughput (see docstring — this row
        # is on a different scale from the query rows' raw ratios; the
        # round-over-round >25% drift flag applies to both the same)
        "ratio": round(walls["sf1"] / walls["sf0.1"] / 10.0, 2),
        "rows_per_sec_sf1": rps["sf1"],
        "rows_per_sec_sf0.1": rps["sf0.1"],
    }


if __name__ == "__main__":
    main()
