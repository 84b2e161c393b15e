"""Generate an sf1-scale profiling dataset (~6M-row lineitem) by
replicating sf0.1 ten times with key-space offsets.

The driver's testdata stops at sf0.1; the 100×-scale claims in
SCALE.md otherwise rest on plan-shape argument alone.  This builds a
10× dataset whose per-key densities, group cardinalities, and value
distributions match sf0.1 exactly — each replica's entity keys are
shifted by ``i * (max_key + 1)`` so entity counts (customers, users,
docs, vectors, orders) scale 10×, not densify.  Caveats, documented
for any reader of the numbers:

- dimension tables (region/nation/customer/supplier/part) are copied
  UNSHIFTED, so shifted foreign keys in the replicas dangle; the
  profiling set targets the fact-table-heavy queries (dedup / ANN /
  graph / sketch / checksum / events), not the dimensional joins the
  oracle gate already covers at three SFs.
- document texts and embedding vectors repeat verbatim across
  replicas (10 copies of every near-dup cluster) — a HARDER dedup/ANN
  workload than organic sf1, so scaling numbers read conservative.

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sf1_testdata)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_cdc_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

#: key columns shifted per replica (entity scaling, not densification)
SHIFT = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "customer", "supplier", "part"]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_testdata"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for name in COPY:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: copied")

    for name, keys in SHIFT.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        offs = {
            k: int(r[0]) + 1
            for k, r in (
                (k, df.agg(F.max(F.col(k))).collect()[0]) for k in keys
            )
        }
        parts = []
        for i in range(REPLICAS):
            rep = df
            for k in keys:
                rep = rep.withColumn(
                    k, (F.col(k) + F.lit(i * offs[k])).cast("long")
                )
            parts.append(rep)
        union = parts[0]
        for rep in parts[1:]:
            union = union.unionByName(rep)
        union.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
