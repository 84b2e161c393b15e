"""Headline-query benchmark.

Runs the bench-tagged registry queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_cdc_spark.plans import REGISTRY  # noqa: E402
from lakehouse_cdc_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_specs = {n: s for n, s in REGISTRY.items() if s.bench}

    # warm the JVM + parquet footers once so timings measure the
    # queries, not session startup
    for spec in bench_specs.values():
        spec.fn(spark, sf_dir).collect()

    # best-of-2 to damp co-tenant noise on shared hardware
    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    # NOTE: no clearCache between queries — rounds 1-2 were measured
    # under the same protocol, so per-round comparisons stay apples to
    # apples (tools/check_oracle.py DOES clear between its 235 queries,
    # where memory hygiene matters and timing doesn't)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
