"""Spark-native validation operators (SURVEY §2.1 S8, §2.4 A1–A8, §5).

The reference's validation toolkit (``src/validation/validation.py``)
compares source (PostgreSQL) and target (Iceberg) with driver-side
loops: per-key ``collect()`` probes, Python set intersections, lag math
after collect.  Each operator here is the distributed equivalent — one
DataFrame program per check, no data leaves the cluster except the
verdict row.
"""

from lakehouse_cdc_spark.quality.validation import (
    freshness_check,
    freshness_lag,
    missing_keys,
    row_count_diff,
    run_suite,
    sample_match_rate,
)

__all__ = [
    "row_count_diff",
    "missing_keys",
    "sample_match_rate",
    "freshness_check",
    "freshness_lag",
    "run_suite",
]
