"""Fourth relational wave: the last TPC-H query *shapes* missing from
the registry — q2/q9/q11/q12/q16/q20/q21 — adapted to the reduced
testdata schema.  There is no ``partsupp`` table and lineitem has no
commit/receipt dates or ship modes, so:

- part-supplier facts (cost, supply) derive from ``lineitem`` grouped
  by ``(l_partkey, l_suppkey)`` — the "ps proxy";
- lateness is ship-vs-order date (as q4 already established);
- q12's ship-mode bands become line-status bands.

Each adaptation preserves the canonical PLAN shape the original
exercises (correlated min, multi-dim star join, fraction-of-total
HAVING, conditional two-band aggregation, NOT-IN variety count, nested
aggregated IN, double-correlated EXISTS / NOT EXISTS), which is what
matters for engine coverage.  Money math rides fixed-point BIGINTs
(see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import (
    dsum,
    fixed_point,
    register,
    sql_dsum,
    sql_fixed_point,
    table,
)

_VOLUME = "l_extendedprice * (1.0 - l_discount)"

#: lineitem-derived part-supplier cost proxy (min observed unit price,
#: fixed-point so MIN and the correlated equality are exact)
_PS_CTE = """
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(floor(l_extendedprice / l_quantity * 10000.0 + 0.5)
                 AS BIGINT)) AS ps_cost_fp
      FROM lineitem GROUP BY 1, 2
    )
"""


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           CAST(ps.ps_cost_fp AS DOUBLE) / 10000.0 AS supply_cost
    FROM ps
    JOIN part p     ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 10 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND ps.ps_cost_fp = (
        SELECT MIN(ps2.ps_cost_fp)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("tpch", "q2", "correlated-min", "join"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H q2 shape: cheapest supplier per part within a region —
    correlated MIN over the ps proxy.  Planned as ONE pass: the
    region-filtered ps relation is built once, a per-part window MIN
    replaces the correlated subquery (no re-scan, no self-join
    re-aggregation), dims broadcast."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(
            fixed_point(F.col("l_extendedprice") / F.col("l_quantity"))
        ).alias("ps_cost_fp")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost_fp", F.min("ps_cost_fp").over(w))
        .filter(F.col("ps_cost_fp") == F.col("min_cost_fp"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("ps_cost_fp").cast("double") / 10000.0).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
           {sql_dsum("l_extendedprice * (1.0 - l_discount)"
                     " - p_retailprice * l_quantity * 0.1", "profit")}
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("tpch", "q9", "join", "agg"),
)
def q9_product_profit(spark, sf_dir):
    """TPC-H q9 shape: profit by supplier nation × ship year for a
    part-name family.  Supply cost proxies as 10% of retail price per
    unit (no partsupp).  part/supplier/nation broadcast; the only
    shuffle is the final group-by partials."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1.0 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(dsum(profit, "profit"))
    )


@register(
    "q11_important_value",
    oracle=f"""
    WITH nat_value AS (
      SELECT l.l_partkey,
             SUM(CAST(floor({_VOLUME} * 10000.0 + 0.5) AS BIGINT)) AS value_fp
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT l_partkey,
           CAST(value_fp AS DOUBLE) / 10000.0 AS part_value
    FROM nat_value
    WHERE CAST(value_fp AS DOUBLE) > (
      SELECT CAST(SUM(value_fp) AS DOUBLE) * 0.002 FROM nat_value
    )
    """,
    tags=("tpch", "q11", "having", "scalar-subquery"),
)
def q11_important_value(spark, sf_dir):
    """TPC-H q11 shape: parts holding an outsized share of one
    nation's traded value — group-by plus a fraction-of-total scalar
    subquery.  The threshold is a FRACTION (0.2%), so the query is
    scale-free: the same plan answers sf0.001 and 100 TB.  The nation
    total reuses the per-part aggregate (one broadcast scalar), not a
    second fact scan."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    vol = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    nat_value = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(fixed_point(vol)).alias("value_fp"))
    )
    total = nat_value.agg(
        (F.sum("value_fp").cast("double") * 0.002).alias("threshold")
    )
    return (
        nat_value.crossJoin(F.broadcast(total))
        .filter(F.col("value_fp").cast("double") > F.col("threshold"))
        .select(
            "l_partkey",
            (F.col("value_fp").cast("double") / 10000.0).alias("part_value"),
        )
    )


@register(
    "q12_status_bands",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= DATE '1995-01-01'
      AND l.l_shipdate < DATE '1996-01-01'
    GROUP BY 1
    """,
    tags=("tpch", "q12", "conditional-agg", "join"),
)
def q12_status_bands(spark, sf_dir):
    """TPC-H q12 shape: late-shipped 1995 lines split into
    high/low-priority bands per line status (status stands in for ship
    mode).  Fact⋈fact equi-join with the year filter pushed to the
    lineitem scan; the band split is a conditional aggregation, not
    two passes."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "q16", "not-in", "distinct-agg"),
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H q16 shape: how many distinct suppliers serve each
    (brand, type, size) bucket, excluding a supplier blocklist
    (negative balance ~ the complaints filter) — NOT IN planned as an
    anti-join, part-supplier pairs from the lineitem bridge."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    blocked = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(blocked), li.l_suppkey == blocked.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_heavy_shippers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        )
          AND l.l_shipdate >= DATE '1995-01-01'
          AND l.l_shipdate < DATE '1996-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 30
      )
    """,
    tags=("tpch", "q20", "nested-in", "semi-join"),
)
def q20_heavy_shippers(spark, sf_dir):
    """TPC-H q20 shape: suppliers in one nation who moved serious
    volume of a part family in 1995 — nested IN subqueries planned as
    aggregation → semi-join chain (no fan-out; the HAVING filter runs
    before the supplier probe)."""
    li = table(spark, sf_dir, "lineitem")
    red_parts = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
        )
        .join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q21_kept_waiting",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_2'
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("tpch", "q21", "exists", "anti-join"),
)
def q21_kept_waiting(spark, sf_dir):
    """TPC-H q21 shape: suppliers who were the SOLE late shipper on
    finished multi-supplier orders — the double-correlated
    EXISTS / NOT EXISTS, planned as semi-join + anti-join on the
    self-joined fact.  Lateness is ship-vs-order (+60d, as q4)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")

    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    # some OTHER supplier appears on the order
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    l1 = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    # ...but no OTHER supplier was late on it
    late_others = (
        li.join(
            table(spark, sf_dir, "orders"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select(
            F.col("l_orderkey").alias("y_orderkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
    )
    l1 = l1.join(
        late_others,
        (F.col("l_orderkey") == F.col("y_orderkey"))
        & (F.col("l_suppkey") != F.col("y_suppkey")),
        "left_anti",
    )
    return (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "agg_mode_median",
    oracle="""
    WITH q AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
      FROM lineitem
    ),
    counts AS (
      SELECT flag, qty, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM q GROUP BY flag, qty
    ),
    mode AS (
      SELECT flag, qty AS mode_qty, cnt AS mode_cnt FROM (
        SELECT flag, qty, cnt,
               ROW_NUMBER() OVER (PARTITION BY flag
                                  ORDER BY cnt DESC, qty ASC) AS rn
        FROM counts) WHERE rn = 1
    ),
    med AS (
      SELECT flag, qty AS median_qty FROM (
        SELECT flag, qty,
               ROW_NUMBER() OVER (PARTITION BY flag ORDER BY qty) AS rn,
               COUNT(*) OVER (PARTITION BY flag) AS n
        FROM q) WHERE rn = (n + 1) // 2
    ),
    ns AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_rows FROM q GROUP BY flag)
    SELECT ns.flag, ns.n_rows, mode.mode_qty, mode.mode_cnt, med.median_qty
    FROM ns JOIN mode ON ns.flag = mode.flag JOIN med ON ns.flag = med.flag
    ORDER BY ns.flag
    """,
    tags=("agg", "mode", "median", "A4-scale"),
)
def agg_mode_median(spark, sf_dir):
    """Ordered-set aggregates the ANSI way: per-group MODE (most
    frequent quantity, deterministic min-value tie-break) and discrete
    MEDIAN (the element at rank (n+1) div 2 — percentile_disc(0.5)
    semantics, no interpolation arithmetic to disagree on).  Mode rides
    the (flag, qty) count table — map-side combined, |groups x
    distinct-values| rows, then a per-flag argmax window over a tiny
    frame.  Median reads the SAME count table via cumulative counts
    (first qty whose cum covers rank (n+1) div 2), so neither
    aggregate ever sorts raw rows — the whole query is one map-side
    pass plus windows over ~50-row frames, exact at any corpus size.
    Quantities are integral by generator contract; floor(q+0.5) makes
    the BIGINT cast explicit and engine-identical."""
    q = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("qty"),
    )
    counts = q.groupBy("flag", "qty").agg(F.count(F.lit(1)).alias("cnt"))
    w_mode = Window.partitionBy("flag").orderBy(F.desc("cnt"), F.asc("qty"))
    mode = (
        counts.withColumn("rn", F.row_number().over(w_mode))
        .filter(F.col("rn") == 1)
        .select("flag", F.col("qty").alias("mode_qty"), F.col("cnt").alias("mode_cnt"))
    )
    # median from the counts table, not the rows: cum counts over the
    # ~50 distinct quantities replace a per-group row sort — the same
    # histogram-readout trick sketch_histogram_quantiles uses, so the
    # exact median costs |groups x distinct-values| at any corpus size
    w_cum = Window.partitionBy("flag").orderBy("qty")
    w_n = Window.partitionBy("flag")
    med = (
        counts.select(
            "flag",
            "qty",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_n).alias("n"),
        )
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("flag")
        .agg(F.min("qty").alias("median_qty"))
    )
    ns = q.groupBy("flag").agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        ns.join(mode, "flag").join(med, "flag")
        .select("flag", "n_rows", "mode_qty", "mode_cnt", "median_qty")
        .orderBy("flag")
    )


@register(
    "topk_skyline_suppliers",
    oracle="""
    WITH per_supp AS (
      SELECT l.l_suppkey AS suppkey,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  * 1000 // COUNT(*) AS BIGINT) AS avg_price_mc,
             CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE))) * 1000
                  // COUNT(*) AS BIGINT) AS avg_delay_md
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_suppkey
    ),
    ranked AS (
      SELECT *,
             MIN(avg_delay_md) OVER (
               ORDER BY avg_price_mc, avg_delay_md, suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_delay_before
      FROM per_supp
    )
    SELECT suppkey, avg_price_mc, avg_delay_md
    FROM ranked
    WHERE best_delay_before IS NULL OR avg_delay_md < best_delay_before
    ORDER BY avg_price_mc, avg_delay_md, suppkey
    """,
    tags=("skyline", "pareto", "topk", "O-scale"),
)
def topk_skyline_suppliers(spark, sf_dir):
    """2-D skyline (Pareto frontier) of suppliers minimizing (average
    line price, average ship delay) — the multi-criteria \"best
    suppliers\" query no single ORDER BY can answer.  Uses the
    sort-filter formulation: order by price (ties broken totally), a
    point survives iff its delay beats the best delay seen at any
    strictly better sort position — ONE window pass over the
    |suppliers|-sized aggregate instead of the naive O(N^2) dominance
    anti-join.  Both dimensions are exact fixed-point integers
    (milli-cents / milli-days via integer floor-division), so frontier
    membership is bit-identical in the oracle.  Scale shape: the heavy
    join+aggregate is the usual map-side-combined fact pass; the
    running best-delay is the two-pass distributed prefix MIN
    (operators/prefix.py): range-bucket on avg_price_mc → per-bucket
    cummin window → strictly-lower-bucket minima combined by
    broadcast — the |suppliers|-sized aggregate never funnels through
    a SinglePartition window."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
                "* 1000 div COUNT(*) AS BIGINT)"
            ).alias("avg_price_mc"),
            F.expr(
                "CAST(SUM(datediff(to_date(l_shipdate), to_date(o_orderdate))) "
                "* 1000 div COUNT(*) AS BIGINT)"
            ).alias("avg_delay_md"),
        )
    )
    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    b = with_range_bucket(per_supp, "avg_price_mc", 64)
    carry = lower_bucket_agg(
        b.groupBy("__bkt").agg(F.min("avg_delay_md").alias("__bmin")),
        "__bkt",
        "__bmin",
        "__carry",
        combine="min",
        default=None,
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy("avg_price_mc", "avg_delay_md", "suppkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = b.join(F.broadcast(carry), "__bkt", "left").withColumn(
        # least() skips NULLs: bucket-first rows use the carry alone;
        # the global first row has neither -> NULL (frontier by def.)
        "best_delay_before",
        F.least(F.min("avg_delay_md").over(w), F.col("__carry")),
    )
    return (
        ranked.filter(
            F.col("best_delay_before").isNull()
            | (F.col("avg_delay_md") < F.col("best_delay_before"))
        )
        .select("suppkey", "avg_price_mc", "avg_delay_md")
        .orderBy("avg_price_mc", "avg_delay_md", "suppkey")
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH maxd AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS d_ref FROM orders
    ),
    rfm AS (
      SELECT o.o_custkey AS custkey,
             date_diff('day', MAX(CAST(o.o_orderdate AS DATE)), m.d_ref)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders o, maxd m
      GROUP BY o.o_custkey, m.d_ref
    ),
    scored AS (
      SELECT *,
             NTILE(4) OVER (ORDER BY recency_days ASC, custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_value_cents,
           CAST(MIN(custkey) AS BIGINT) AS sample_customer
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("rfm", "segmentation", "analytics", "W1"),
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation — the classic BI cohorting: per customer,
    recency (days since last order, anchored to the corpus max date so
    the query is reproducible), frequency, and fixed-point monetary
    value, each quartiled with NTILE under a total order (key
    tie-break, so bucket boundaries are engine-identical), then
    aggregated into the 64-cell segment matrix with per-segment value.
    One order scan + customer-keyed aggregate; the three quartile
    rankings use the two-pass distributed NTILE
    (operators/prefix.py:ntile_two_pass — range-bucket rank +
    broadcast lower-bucket counts + NTILE's exact arithmetic), so the
    |customers|-sized RFM table never funnels through a
    SinglePartition window; output is <= 64 rows at any volume."""
    o = table(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("d_ref"))
    rfm = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("d_ref"), F.max(F.to_date("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
    )
    from lakehouse_cdc_spark.operators.prefix import ntile_two_pass

    scored = ntile_two_pass(
        ntile_two_pass(
            ntile_two_pass(
                rfm, 4, "recency_days", "custkey", "r_score", ascending=True
            ),
            4,
            "frequency",
            "custkey",
            "f_score",
            ascending=False,
        ),
        4,
        "monetary_cents",
        "custkey",
        "m_score",
        ascending=False,
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").cast("bigint").alias("segment_value_cents"),
            F.min("custkey").alias("sample_customer"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "customer_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS ck,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS r
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(r) AS BIGINT) AS rt,
                   CAST(COUNT(*) AS BIGINT) AS nc FROM rev),
    ranked AS (
      SELECT ck, r,
             SUM(r) OVER (ORDER BY r DESC, ck) AS cum_r,
             ROW_NUMBER() OVER (ORDER BY r DESC, ck) AS rn
      FROM rev
    ),
    classed AS (
      SELECT ck, r, rn,
             CASE WHEN (cum_r - r) * 100 < t.rt * 80 THEN 'A'
                  WHEN (cum_r - r) * 100 < t.rt * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked, tot t
    )
    SELECT c.abc,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(c.r) AS BIGINT) AS class_revenue_cents,
           round(CAST(SUM(c.r) AS DOUBLE) / t.rt, 6) AS revenue_share,
           round(CAST(COUNT(*) AS DOUBLE) / t.nc, 6) AS customer_share
    FROM classed c, tot t
    GROUP BY c.abc, t.rt, t.nc
    ORDER BY c.abc
    """,
    tags=("abc", "pareto", "analytics", "O-scale"),
)
def customer_abc_pareto(spark, sf_dir):
    """ABC / Pareto classification of customers by revenue: rank by
    fixed-point revenue under a total order, classify by the
    cumulative share BEFORE each customer (strictly-integer
    comparison (cum - r)*100 < total*80 — no float share ever drives
    a class boundary), and report each class's customer and revenue
    shares — the 80/20 curve purchasing and support tiers are built
    on.  The running revenue sum over (r DESC, ck) is the two-pass
    distributed prefix sum (operators/prefix.py): range-bucket on the
    NEGATED revenue (so buckets ascend with the descending order) →
    per-bucket cumsum window → strictly-lower-bucket totals combined
    by broadcast — the |customers|-sized aggregate never funnels
    through a SinglePartition window.  Exact integers everywhere;
    shares rounded once."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    rev = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
    )
    tot = rev.agg(
        F.sum("r").cast("bigint").alias("rt"),
        F.count(F.lit(1)).alias("nc"),
    )
    b = with_range_bucket(rev.withColumn("__negr", -F.col("r")), "__negr", 64)
    carry = lower_bucket_agg(
        b.groupBy("__bkt").agg(F.sum("r").alias("__btot")),
        "__bkt",
        "__btot",
        "__carry",
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.desc("r"), F.asc("ck"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = b.join(F.broadcast(carry), "__bkt").select(
        "ck",
        "r",
        (F.sum("r").over(w) + F.col("__carry")).alias("cum_r"),
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "r",
        "rt",
        "nc",
        F.when((F.col("cum_r") - F.col("r")) * 100 < F.col("rt") * 80, "A")
        .when((F.col("cum_r") - F.col("r")) * 100 < F.col("rt") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc", "rt", "nc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("r").cast("bigint").alias("class_revenue_cents"),
        )
        .select(
            "abc",
            "n_customers",
            "class_revenue_cents",
            F.round(
                F.col("class_revenue_cents").cast("double") / F.col("rt"), 6
            ).alias("revenue_share"),
            F.round(F.col("n_customers").cast("double") / F.col("nc"), 6).alias(
                "customer_share"
            ),
        )
        .orderBy("abc")
    )


@register(
    "orders_seasonal_index",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%m') AS BIGINT) AS month,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(rev) AS BIGINT) AS rt,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM monthly
    )
    SELECT m.month, m.n_orders, m.rev,
           round(CAST(m.rev AS DOUBLE) * t.n_months / t.rt, 6)
             AS seasonal_index
    FROM monthly m, tot t
    ORDER BY m.month
    """,
    tags=("seasonal", "analytics", "A4"),
)
def orders_seasonal_index(spark, sf_dir):
    """Monthly seasonal indices (month revenue over the average
    month, across all years) — the demand-planning normalization that
    turns raw monthlies into \"December runs 1.3x\".  Index =
    rev_m * n_months / total — one multiplication before one division
    of exact integers, rounded once; a 12-row output from one
    map-side-combined aggregate at any scale."""
    monthly = (
        table(spark, sf_dir, "orders")
        .groupBy(F.month("o_orderdate").cast("bigint").alias("month"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    tot = monthly.agg(
        F.sum("rev").cast("bigint").alias("rt"),
        F.count(F.lit(1)).alias("n_months"),
    )
    return (
        monthly.crossJoin(F.broadcast(tot))
        .select(
            "month",
            "n_orders",
            "rev",
            F.round(
                F.col("rev").cast("double") * F.col("n_months") / F.col("rt"), 6
            ).alias("seasonal_index"),
        )
        .orderBy("month")
    )


@register(
    "customer_revenue_lorenz",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT o_custkey, rev_c,
             NTILE(10) OVER (ORDER BY rev_c DESC, o_custkey) AS decile
      FROM rev
    ),
    per AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(rev_c) AS BIGINT) AS revenue_c
      FROM tiled GROUP BY decile
    ),
    tot AS (SELECT SUM(revenue_c) AS t FROM per)
    SELECT CAST(decile AS INT) AS decile, n_customers, revenue_c,
           CAST(revenue_c * 1000000 // t AS BIGINT) AS share_ppm,
           CAST(SUM(revenue_c) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 // t AS BIGINT) AS cum_share_ppm
    FROM per, tot ORDER BY decile
    """,
    tags=("analytics", "pareto", "lorenz", "two-pass-prefix", "O-family"),
)
def customer_revenue_lorenz(spark, sf_dir):
    """REVENUE CONCENTRATION (Lorenz/Pareto deciles) — the who-pays-
    the-bills table every revenue review opens with: customers ranked
    by lifetime order value, cut into exact NTILE(10) deciles, each
    decile reporting customer count, exact revenue cents, revenue
    share, and the cumulative (Lorenz) share in integer ppm — the
    80/20 read-off is cum_share_ppm at decile 1–2.  The global decile
    assignment uses the TWO-PASS prefix scan
    (operators/prefix.py:ntile_two_pass — range-bucket row numbers +
    broadcast carry, bit-identical to NTILE), so NO data-sized window
    ever single-partitions; the final cumulative runs over the
    10-row decile table.

    Scale shape: one |customers|-keyed revenue rollup (map-side
    combined), the two-pass tile assignment (bucket-partitioned
    window + two broadcast joins), a 10-row aggregate.  At 100 TB the
    decile cut costs the same as any global-rank query — which is
    exactly why the two-pass form exists."""
    from lakehouse_cdc_spark.operators.prefix import ntile_two_pass

    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("rev_c")
    )
    tiled = ntile_two_pass(
        rev, 10, "rev_c", "o_custkey", "decile", ascending=False
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev_c").cast("bigint").alias("revenue_c"),
    )
    tot = per.agg(F.sum("revenue_c").alias("t"))
    from lakehouse_cdc_spark.operators.prefix import lower_bucket_agg

    carry = lower_bucket_agg(per, "decile", "revenue_c", "prior_rev")
    return (
        per.join(carry, "decile")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            "revenue_c",
            F.expr("CAST(revenue_c * 1000000 div t AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(
                "CAST((prior_rev + revenue_c) * 1000000 div t AS BIGINT)"
            ).alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


_ONTIME_DAYS = 21  # ship within 3 weeks of order date counts as on time
_WILSON_Z = 1.96  # 95% score interval


@register(
    "supplier_ontime_wilson",
    oracle=f"""
    WITH lat AS (
      SELECT l.l_suppkey,
             CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE))
                       <= {_ONTIME_DAYS}
                  THEN 1 ELSE 0 END AS ontime
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    agg AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ontime) AS BIGINT) AS k
      FROM lat GROUP BY l_suppkey
    ),
    scored AS (
      SELECT l_suppkey, n, k,
             (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + {_WILSON_Z} * {_WILSON_Z} / (2.0 * CAST(n AS DOUBLE))
              - {_WILSON_Z} * sqrt(
                  (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + {_WILSON_Z} * {_WILSON_Z}
                    / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / CAST(n AS DOUBLE))
               AS wilson
      FROM agg
    )
    SELECT l_suppkey AS suppkey, n, k,
           CAST(k * 1000000 // n AS BIGINT) AS ontime_ppm,
           round(wilson, 6) AS wilson_lower
    FROM scored
    ORDER BY wilson_lower DESC, suppkey
    LIMIT 25
    """,
    tags=("analytics", "slo", "wilson", "ranking", "A-family"),
)
def supplier_ontime_wilson(spark, sf_dir):
    """SUPPLIER ON-TIME SLO ranking with the WILSON score lower bound
    — the small-sample-honest ranking (the reddit-comment-sort
    statistic): a supplier with 3/3 on-time must NOT outrank one with
    97/100, which a raw rate does and the 95% Wilson lower bound
    corrects exactly.  On-time = shipped within 21 days of the order
    date.  Cross-engine determinism: counts are exact integers small
    enough to be exact doubles, and the Wilson formula uses only
    +,−,×,÷ and sqrt — every one a CORRECTLY-ROUNDED IEEE-754
    operation — in the identical expression tree, so even before the
    final round(·, 6) both engines hold bit-identical doubles.

    Scale shape: one fact-fact join on the order key (co-partitioned
    at 100 TB if both tables bucket by orderkey; AQE otherwise), a
    map-side-combined per-supplier (n, k), then |suppliers|-row
    arithmetic and a top-25 TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.when(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            <= _ONTIME_DAYS,
            1,
        )
        .otherwise(0)
        .alias("ontime"),
    )
    agg = lat.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ontime").cast("bigint").alias("k"),
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    z = F.lit(_WILSON_Z)
    wilson = (
        p
        + z * z / (F.lit(2.0) * nd)
        - z
        * F.sqrt(
            p * (F.lit(1.0) - p) / nd
            + z * z / (F.lit(4.0) * nd * nd)
        )
    ) / (F.lit(1.0) + z * z / nd)
    return (
        agg.select(
            F.col("l_suppkey").alias("suppkey"),
            "n",
            "k",
            F.expr("CAST(k * 1000000 div n AS BIGINT)").alias("ontime_ppm"),
            F.round(wilson, 6).alias("wilson_lower"),
        )
        .orderBy(F.desc("wilson_lower"), F.asc("suppkey"))
        .limit(25)
    )
