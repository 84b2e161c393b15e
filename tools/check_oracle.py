"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB at the
given sf dir, then compares row count, sorted column names, and an
order-insensitive multiset of canonicalized rows.  Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter
from datetime import datetime

import duckdb

sys.path.insert(0, "/root/repo")

from lakehouse_cdc_spark.plans import REGISTRY  # noqa: E402
from lakehouse_cdc_spark.session import TABLES, get_spark  # noqa: E402


def canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # EXACT repr: the driver's value-hash may be bit-exact, so the
        # local gate must be at least as strict — any query that needs
        # rounding to pass is order-dependent and will flake
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_noracle = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # queries that persist() plan intermediates cannot
            # unpersist them (the cache backs the returned lazy plan);
            # dropping here keeps a 235-query run's memory flat
            spark.catalog.clearCache()
        if spec.oracle is None:
            print(f"----  {name}: rows-only ({len(srows)} rows)")
            n_noracle += 1
            continue
        try:
            ores = con.execute(spec.oracle)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm = rows_to_multiset(srows, scols)
            om = rows_to_multiset(orows, ocols)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                problems.append(f"values spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
