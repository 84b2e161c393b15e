"""Second wave of relational declared queries: grouping sets, session
islands, guarded MERGE (exactly-once theta-join), subquery forms, and
the wider scalar-function surface."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import (
    davg,
    dsum,
    fixed_point,
    register,
    sql_davg,
    sql_dsum,
    table,
)
from lakehouse_cdc_spark.streaming.windows import session_window_agg


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
           COUNT(*) AS order_cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (disjoint rollups by status and by year
    plus grand total) — SQL form, exercising Catalyst's Expand."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL') AS order_year,
               COUNT(*) AS order_cnt
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        """
    )


@register(
    "window_session_islands",
    bench=True,
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL THEN 1
                  WHEN date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) >= 3600000000 THEN 1
                  ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    tags=("window", "streaming", "session", "T7"),
)
def window_session_islands(spark, sf_dir):
    """Sessionization (1-hour gap) per user via ``session_window`` —
    the oracle proves it against the classic gaps-and-islands SQL.
    Same expression runs under readStream + watermark (tested in
    tests/test_streaming)."""
    e = table(spark, sf_dir, "events")
    sessions = session_window_agg(
        e, "1 hour", ["user_id"], [F.count(F.lit(1)).alias("n")], ts_col="ts"
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n").cast("bigint").alias("n_events"),
    )


@register(
    "cdc_guarded_merge",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS id, c_acctbal AS balance,
             CAST(c_custkey % 5 AS VARCHAR) AS batch_id
      FROM customer
    ),
    latest AS (
      SELECT user_id AS id, value, CAST(user_id % 3 AS VARCHAR) AS batch_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    c AS (SELECT * FROM latest WHERE rn = 1)
    SELECT b.id,
           CAST(CASE WHEN c.id IS NOT NULL AND b.batch_id != c.batch_id
                     THEN c.value ELSE b.balance END AS DOUBLE) AS balance
    FROM base b LEFT JOIN c ON b.id = c.id
    """,
    tags=("cdc", "S10", "J2", "merge"),
)
def cdc_guarded_merge(spark, sf_dir):
    """The exactly-once path's batch-guarded MERGE (S10/J2,
    spark_exactly_once.py:493-505): ``ON t.id = s.id AND t.batch_id <>
    s.batch_id`` — a change re-delivered with the batch_id already
    stamped on the row is a no-op.  Theta-join conjunct folded into a
    conditional update."""
    base = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("balance"),
        (F.col("c_custkey") % 5).cast("string").alias("batch_id"),
    )
    from lakehouse_cdc_spark.operators.dedup import latest_per_key

    e = table(spark, sf_dir, "events")
    latest = latest_per_key(e, ["user_id"], ["ts", "event_id"]).select(
        F.col("user_id").alias("cid"),
        F.col("value"),
        (F.col("user_id") % 3).cast("string").alias("cbatch"),
    )
    joined = base.join(latest, base.id == latest.cid, "left")
    apply_change = F.col("cid").isNotNull() & (
        F.col("batch_id") != F.col("cbatch")
    )
    return joined.select(
        "id",
        F.when(apply_change, F.col("value"))
        .otherwise(F.col("balance"))
        .cast("double")
        .alias("balance"),
    )


@register(
    "subquery_above_avg",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS order_cnt,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                                 / 10000.0 / CAST(COUNT(*) AS DOUBLE)
                          FROM orders)
    GROUP BY o_orderstatus
    """,
    tags=("subquery", "agg"),
)
def subquery_above_avg(spark, sf_dir):
    """Scalar-subquery predicate (orders above the global average
    price) — expressed as a broadcast of the 1-row aggregate against
    the fact scan; Catalyst plans the SQL form identically."""
    o = table(spark, sf_dir, "orders")
    avg_price = o.agg(davg(F.col("o_totalprice"), "avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
    )


@register(
    "scalar_string_advanced",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS consonant_mask,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           translate(p_brand, '#', 'B') AS brand_norm,
           split_part(p_type, ' ', 1) AS type_first_word,
           CAST(length(p_name) AS BIGINT) AS name_len,
           reverse(p_brand) AS brand_rev
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_advanced(spark, sf_dir):
    """Wider string-function surface: regexp extract/replace-all,
    lpad, translate, split_part, reverse."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("consonant_mask"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.translate("p_brand", "#", "B").alias("brand_norm"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "scalar_math_functions",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum('sqrt(l_extendedprice)', 'sum_sqrt_price')},
           {sql_dsum('abs(l_discount - 0.05)', 'sum_abs_disc_dev')},
           {sql_dsum('ceil(l_quantity / 7.0)', 'sum_ceil_q7')},
           {sql_dsum('floor(l_tax * 100.0)', 'sum_floor_tax')},
           {sql_dsum('ln(l_extendedprice + 1.0)', 'sum_ln_price', 2)},
           {sql_dsum('exp(l_discount)', 'sum_exp_disc', 2)}
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("scalar", "math"),
)
def scalar_math_functions(spark, sf_dir):
    """Math-function surface (sqrt/abs/ceil/floor/ln/exp) aggregated
    deterministically.  Transcendentals (ln/exp) are rounded at 1e-2
    fixed-point: they are not IEEE-correctly-rounded, so the two
    engines may differ in the last ulp."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(F.sqrt("l_extendedprice"), "sum_sqrt_price"),
        dsum(F.abs(F.col("l_discount") - 0.05), "sum_abs_disc_dev"),
        dsum(F.ceil(F.col("l_quantity") / 7.0).cast("double"), "sum_ceil_q7"),
        dsum(F.floor(F.col("l_tax") * 100.0).cast("double"), "sum_floor_tax"),
        dsum(F.log(F.col("l_extendedprice") + 1.0), "sum_ln_price", 2),
        dsum(F.exp("l_discount"), "sum_exp_disc", 2),
    )


@register(
    "agg_stats_functions",
    oracle="""
    SELECT l_linestatus,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS median_qty,
           round(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)
def agg_stats_functions(spark, sf_dir):
    """Statistical aggregates: stddev/variance/correlation/exact
    percentiles (rounded — the merge order of the streaming moment
    computations differs across engines in low bits)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
    )


@register(
    "filter_null_semantics",
    oracle="""
    SELECT
      COUNT(*) AS total_rows,
      CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_vals,
      CAST(SUM(CASE WHEN v IS NOT NULL AND v > 10 THEN 1 ELSE 0 END) AS BIGINT) AS gt10,
      CAST(SUM(CASE WHEN COALESCE(v, -1) = -1 THEN 1 ELSE 0 END) AS BIGINT) AS coalesced,
      CAST(COUNT(v) AS BIGINT) AS non_null_count
    FROM (
      SELECT CASE WHEN l_linenumber % 3 = 0 THEN NULL
                  ELSE l_linenumber * 7 END AS v
      FROM lineitem
    )
    """,
    tags=("scalar", "null", "P4", "P7"),
)
def filter_null_semantics(spark, sf_dir):
    """Three-valued-logic surface: NULL injection, IS [NOT] NULL,
    COALESCE defaults, COUNT(col) vs COUNT(*) — the null handling the
    reference's coalesce-cast checksum projection (P7) relies on."""
    li = table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(None))
        .otherwise(F.col("l_linenumber") * 7)
        .alias("v")
    )
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.col("v").isNull().cast("long")).cast("bigint").alias("null_vals"),
        F.sum((F.col("v").isNotNull() & (F.col("v") > 10)).cast("long"))
        .cast("bigint")
        .alias("gt10"),
        F.sum((F.coalesce(F.col("v"), F.lit(-1)) == -1).cast("long"))
        .cast("bigint")
        .alias("coalesced"),
        F.count(F.col("v")).cast("bigint").alias("non_null_count"),
    )


@register(
    "pivot_order_status_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "pivot"),
)
def pivot_order_status_by_year(spark, sf_dir):
    """Pivot (long→wide) with an explicit value list — the explicit
    list keeps the plan one pass (no distinct-values pre-query)."""
    o = table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "order_year",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("f_cnt"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("o_cnt"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("p_cnt"),
    )


@register(
    "explode_posexplode_arrays",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             string_split(o_orderpriority, '-') AS parts
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    ex AS (
      SELECT o_orderkey,
             generate_subscripts(parts, 1) - 1 AS pos,
             unnest(parts) AS part
      FROM t
    )
    SELECT pos, part, COUNT(*) AS cnt
    FROM ex GROUP BY pos, part
    """,
    tags=("scalar", "array", "explode"),
)
def explode_posexplode_arrays(spark, sf_dir):
    """Array fan-out surface: split + posexplode (index-preserving
    explode), the row-multiplying primitive every nested-data pipeline
    uses."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    ex = o.select(
        "o_orderkey",
        F.posexplode(F.split("o_orderpriority", "-")).alias("pos", "part"),
    )
    return ex.groupBy("pos", "part").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "subquery_exists_sql",
    oracle="""
    SELECT n.n_name, COUNT(*) AS big_spender_cnt
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    GROUP BY n.n_name
    """,
    tags=("subquery", "join", "J3"),
)
def subquery_exists_sql(spark, sf_dir):
    """Correlated EXISTS in SQL form — Catalyst decorrelates it into
    the same left-semi join the DataFrame API produces; declared in SQL
    to exercise the parser/analyzer path the reference's spark.sql
    MERGE relies on."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_sq")
    return spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS big_spender_cnt
        FROM customer_sq c
        JOIN nation_sq n ON c.c_nationkey = n.n_nationkey
        WHERE EXISTS (
          SELECT 1 FROM orders_sq o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        GROUP BY n.n_name
        """
    )


@register(
    "q14_promo_share",
    oracle=f"""
    SELECT
      {sql_dsum("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END", 'promo_revenue')},
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'total_revenue')},
      COUNT(*) AS line_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    tags=("join", "agg", "conditional"),
)
def q14_promo_share(spark, sf_dir):
    """TPC-H-Q14-shaped: conditional aggregation (CASE inside SUM)
    over a fact⋈dim join — the promo-revenue share numerator and
    denominator in one pass."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(promo, "promo_revenue"),
            dsum(rev, "total_revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register(
    "q7_nation_flows",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS line_cnt,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey < 3 AND sn.n_nationkey < 3
      AND cn.n_nationkey != sn.n_nationkey
    GROUP BY cn.n_name, sn.n_name
    """,
    tags=("join", "self-join", "agg"),
)
def q7_nation_flows(spark, sf_dir):
    """TPC-H-Q7-shaped: trade flows between nation pairs — the same
    dimension joined TWICE under different roles (customer's vs
    supplier's nation), the aliasing case that breaks naive column
    resolution."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cn_key") < 3)
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("sn_key") < 3)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cn_key") != F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT quartile,
           COUNT(*) AS cust_cnt,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    GROUP BY quartile
    """,
    tags=("window", "ntile"),
)
def window_ntile_quartiles(spark, sf_dir):
    """ntile(4) balance quartiles (total order via key tie-break) —
    the bucketing primitive for stratified splits.  A literal
    ``ntile(4) OVER (ORDER BY ...)`` is a SinglePartition global
    window; instead the global position is the two-pass distributed
    rank (operators/prefix.py: acctbal value-range bucket →
    per-bucket row_number + broadcast lower-bucket counts) and the
    quartile is ntile's exact arithmetic — the first n%4 quartiles
    take ceil(n/4) rows, the rest floor(n/4) — applied to the
    position with the broadcast total.  Integer math only, so the
    assignment is bit-identical to NTILE in any engine."""
    from lakehouse_cdc_spark.operators.prefix import ntile_two_pass

    c = table(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    return (
        ntile_two_pass(c, 4, "c_acctbal", "c_custkey", "quartile")
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("cust_cnt"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
        )
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq
    FROM events
    WHERE user_id < 10
    GROUP BY user_id
    """,
    tags=("agg", "collect", "F5"),
)
def agg_collect_sorted(spark, sf_dir):
    """Ordered event-sequence per key (collect_list sorted inside the
    aggregate — deterministic under any partitioning): the
    session-trajectory feature a behavior model trains on.  Bounded
    keys only; unbounded collect_list is exactly what the checksum
    scale path avoids."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    pair = F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(pair)), lambda x: x["event_type"]
            ),
            ",",
        ).alias("event_seq")
    )


@register(
    "scalar_date_arithmetic",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS order_cnt,
           CAST(SUM(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00')) AS BIGINT) AS total_age_days,
           strftime(MIN(o_orderdate + INTERVAL 30 DAY), '%Y-%m-%d') AS min_due,
           strftime(MAX(date_trunc('month', o_orderdate)), '%Y-%m-%d') AS max_month_start,
           CAST(MAX(dayofweek(o_orderdate)) AS INT) AS max_dow
    FROM orders
    GROUP BY 1
    """,
    tags=("scalar", "date", "F9", "F10"),
)
def scalar_date_arithmetic(spark, sf_dir):
    """Date/interval arithmetic surface: datediff, interval addition,
    date_trunc, day-of-week — the retention/aging computations of an
    operational lakehouse.  (Spark dayofweek is 1=Sunday; DuckDB
    dayofweek is 0=Sunday — aligned by subtracting 1.)"""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.count(F.lit(1)).alias("order_cnt"),
        F.sum(
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        ).cast("bigint").alias("total_age_days"),
        F.date_format(
            F.min(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")), "yyyy-MM-dd"
        ).alias("min_due"),
        F.date_format(F.max(F.date_trunc("month", "o_orderdate")), "yyyy-MM-dd").alias(
            "max_month_start"
        ),
        (F.max(F.dayofweek("o_orderdate")) - 1).cast("int").alias("max_dow"),
    )


@register(
    "scalar_conditionals",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_cnt,
           CAST(SUM(CAST(floor(greatest(c_acctbal, 0.0) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_positive_part,
           CAST(SUM(CAST(floor(least(c_acctbal, 0.0) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_negative_part,
           CAST(COUNT(nullif(c_nationkey, 0)) AS BIGINT) AS non_zero_nations
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditionals(spark, sf_dir):
    """Conditional-expression surface: CASE, greatest/least clamps,
    nullif; sums via the fixed-point helpers (raw double sums are
    order-dependent and would not hash-match across engines)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.sum((F.col("c_acctbal") < 0).cast("long")).cast("bigint").alias("negative_cnt"),
        dsum(F.greatest(F.col("c_acctbal"), F.lit(0.0)), "sum_positive_part"),
        dsum(F.least(F.col("c_acctbal"), F.lit(0.0)), "sum_negative_part"),
        F.count(F.nullif(F.col("c_nationkey"), F.lit(0))).cast("bigint").alias(
            "non_zero_nations"
        ),
    )


@register(
    "array_set_functions",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
      FROM documents WHERE doc_id < 50
    ),
    q AS (SELECT toks AS qtoks FROM t WHERE doc_id = 0)
    SELECT t.doc_id,
           len(t.toks) AS vocab_size,
           len(list_intersect(t.toks, q.qtoks)) AS common_with_doc0,
           CAST(list_contains(t.toks, 'the') AS BOOLEAN) AS has_the
    FROM t, q
    """,
    tags=("scalar", "array"),
)
def array_set_functions(spark, sf_dir):
    """Array set algebra (distinct/intersect/contains) — vocabulary
    overlap against a reference document, the set-feature primitive
    under Jaccard-style similarity."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = d.select(
        "doc_id",
        F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"),
    )
    q = toks.filter(F.col("doc_id") == 0).select(F.col("toks").alias("qtoks"))
    return toks.crossJoin(F.broadcast(q)).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("vocab_size"),
        F.size(F.array_intersect("toks", "qtoks")).cast("bigint").alias(
            "common_with_doc0"
        ),
        F.array_contains("toks", "the").alias("has_the"),
    )


@register(
    "map_from_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS event_cnt,
           CAST(SUM(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT) % 10) AS BIGINT) AS sum_k_mod10
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "map", "F11"),
)
def map_from_json_props(spark, sf_dir):
    """JSON → typed MAP column (from_json map<string,bigint>) with
    element_at access — the flexible-properties pattern for event
    payloads; contrast with scalar_json_extract's path access."""
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.withColumn("props_map", m).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.sum(F.element_at(F.col("props_map"), "k") % 10)
        .cast("bigint")
        .alias("sum_k_mod10"),
    )


# ---------------------------------------------------------------------------
# Skewed joins: AQE skew-split vs explicit salting (SURVEY §2.3 + SCALE.md)
# ---------------------------------------------------------------------------

#: deterministic hot key: a third of all events collapse onto customer
#: key 1 — the "one whale user" shape that stalls a single reducer at
#: 100 TB unless the plan splits the hot partition
_SKEW_KEY_SQL = "CASE WHEN user_id % 3 = 0 THEN 1 ELSE user_id END"

def _skewed_events(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.select(
        F.when(F.col("user_id") % 3 == 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("skew_key"),
        "value",
    )


def _customer_dim(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_key"), "c_mktsegment"
    )


@register(
    "join_skewed_aqe",
    oracle=f"""
    WITH e AS (SELECT {_SKEW_KEY_SQL} AS skew_key, value FROM events)
    SELECT c_mktsegment,
           COUNT(*) AS event_cnt,
           {sql_dsum('value', 'sum_value')}
    FROM e JOIN customer c ON e.skew_key = c.c_custkey
    GROUP BY c_mktsegment
    """,
    bench=True,
    tags=("join", "skew", "aqe"),
)
def join_skewed_aqe(spark, sf_dir):
    """Skewed fact⋈dim as a PLAIN join: the hot key (1/3 of all
    events) is left to AQE — locally the dim broadcasts (no skew
    problem at all); on a cluster with a shuffle join,
    spark.sql.adaptive.skewJoin splits the hot partition at runtime.
    The baseline the salted variant is measured against."""
    e = _skewed_events(spark, sf_dir)
    c = _customer_dim(spark, sf_dir)
    return e.join(c, "skew_key").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        dsum(F.col("value"), "sum_value"),
    )


@register(
    "join_skewed_salted",
    oracle=f"""
    WITH e AS (SELECT {_SKEW_KEY_SQL} AS skew_key, value FROM events)
    SELECT c_mktsegment,
           COUNT(*) AS event_cnt,
           {sql_dsum('value', 'sum_value')}
    FROM e JOIN customer c ON e.skew_key = c.c_custkey
    GROUP BY c_mktsegment
    """,
    bench=True,
    tags=("join", "skew", "salt"),
)
def join_skewed_salted(spark, sf_dir):
    """The SAME skewed join through operators.joins.salted_join: the
    hot key is sprayed over 16 salt buckets (left side) while the dim
    is replicated ×16, so no reducer owns the whale.  The oracle is
    the identical plain-join SQL — hash-equality proves salting is
    semantics-preserving; the bench pairing with join_skewed_aqe
    measures its overhead/benefit at each scale."""
    from lakehouse_cdc_spark.operators.joins import salted_join

    e = _skewed_events(spark, sf_dir)
    c = _customer_dim(spark, sf_dir)
    return (
        salted_join(e, c, key="skew_key", salt_buckets=16)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            dsum(F.col("value"), "sum_value"),
        )
    )


@register(
    "scalar_higher_order_functions",
    oracle="""
    WITH arr AS (
      SELECT o_orderkey,
             list_transform(string_split(CAST(o_orderkey AS VARCHAR), ''),
                            c -> CAST(c AS BIGINT)) AS digits
      FROM orders WHERE o_orderkey < 500
    )
    SELECT o_orderkey,
           COALESCE(array_to_string(list_filter(digits, d -> d % 2 = 0), ','),
                    '') AS evens,
           len(list_filter(digits, d -> d > 5)) > 0 AS any_big,
           len(list_filter(digits, d -> d < 9)) = len(digits) AS all_small,
           list_reduce(list_prepend(CAST(0 AS BIGINT), digits),
                       (a, d) -> a * 10 + d) AS refolded,
           array_to_string(list_sort(digits), ',') AS sorted_digits
    FROM arr
    ORDER BY o_orderkey
    """,
    tags=("scalar", "higher-order", "F13"),
)
def scalar_higher_order_functions(spark, sf_dir):
    """The lambda side of the scalar surface: filter / exists / forall
    / aggregate / array_sort over a per-row array (each order key's
    decimal digits).  `refolded` folds the digits back into the number
    (proving element ORDER survives every engine's array machinery),
    and the exists/forall forms compile to Spark's ArrayExists/
    ArrayForAll primitives while the oracle states them as
    filter-count identities — same semantics, different engine idiom.
    All JVM-side codegen'd expressions: at 100 TB this family is free
    compared to any UDF doing the same per-row work.

    The two array-valued results (`evens`, `sorted_digits`) are
    serialized to comma-joined strings on BOTH surfaces: the driver's
    canonicalizer (pandas sort_values + hash) cannot handle list
    cells, so no oracle-backed query may output Array/Map/Struct
    columns (enforced registry-wide by tests/test_plans.py)."""
    arr = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.expr(
                "transform(split(CAST(o_orderkey AS STRING), ''), "
                "c -> CAST(c AS BIGINT))"
            ).alias("digits"),
        )
    )
    def joined(arr_col):
        return F.array_join(
            F.transform(arr_col, lambda d: d.cast("string")), ","
        )

    return arr.select(
        "o_orderkey",
        joined(F.filter("digits", lambda d: d % 2 == 0)).alias("evens"),
        F.exists("digits", lambda d: d > 5).alias("any_big"),
        F.forall("digits", lambda d: d < 9).alias("all_small"),
        F.aggregate(
            "digits", F.lit(0).cast("bigint"), lambda a, d: a * 10 + d
        ).alias("refolded"),
        joined(F.array_sort("digits")).alias("sorted_digits"),
    ).orderBy("o_orderkey")


@register(
    "scalar_map_functions",
    oracle="""
    WITH per AS (
      SELECT o_custkey, o_orderpriority AS prio,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_custkey, o_orderpriority
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_prios,
           CAST(SUM(cnt) AS BIGINT) AS total_orders,
           COALESCE(string_agg(
             CASE WHEN cnt >= 2
                  THEN prio || ':' || CAST(cnt * 10 AS VARCHAR) END,
             ',' ORDER BY prio), '') AS busy_prios
    FROM per
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    tags=("scalar", "map", "higher-order", "F13"),
)
def scalar_map_functions(spark, sf_dir):
    """The MAP side of the higher-order scalar surface (F13): build a
    per-customer ``map<priority, order_count>`` with
    ``map_from_entries``, then drive the map-lambda family —
    ``transform_values`` (scale the counts), ``map_filter`` (keep busy
    priorities), ``map_entries``/``map_values`` extraction, and a fold
    over the values — all JVM-side codegen'd expressions, zero UDFs.
    The oracle states the same results relationally (DuckDB has no map
    lambdas), and every output is scalar per the driver-canonicalizer
    fence: the filtered map is serialized as a sorted ``k:v`` join
    (sorted AFTER extraction — Spark map entry order is
    engine-internal and must never reach the output)."""
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct("o_orderpriority", "cnt"))
            )
        ).alias("m")
    )
    scaled = F.transform_values(
        F.col("m"), lambda _, v: v * F.lit(10).cast("bigint")
    )
    busy = F.map_filter(scaled, lambda _, v: v >= 20)
    return m.select(
        "o_custkey",
        F.size("m").cast("bigint").alias("n_prios"),
        F.aggregate(
            F.map_values("m"),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("total_orders"),
        F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries(busy),
                    lambda e: F.concat(
                        e["key"], F.lit(":"), e["value"].cast("string")
                    ),
                )
            ),
            ",",
        ).alias("busy_prios"),
    ).orderBy("o_custkey")


@register(
    "scalar_collation_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                  ELSE lower(o_orderpriority) END AS prio_mixed,
             o_totalprice
      FROM orders
    )
    SELECT lower(prio_mixed) AS prio_lc,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(DISTINCT prio_mixed) AS BIGINT) AS case_variants,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM mixed
    GROUP BY lower(prio_mixed)
    ORDER BY prio_lc
    """,
    tags=("scalar", "collation", "spark4", "F-family"),
)
def scalar_collation_group(spark, sf_dir):
    """Spark 4 COLLATIONS: group case-mangled priorities under the
    ``UTF8_LCASE`` collation — the engine-level answer to
    case-insensitive analytics that lower()-wrapping scatters through
    every predicate.  The collated column groups 'HIGH' with 'high'
    NATIVELY (hash and comparison are collation-aware inside codegen,
    so the optimization surface — partial aggregation, pushdown — is
    untouched), while ``case_variants`` counts the raw spellings per
    group to prove the merge really happened.  The oracle states the
    same semantics with explicit lower() (DuckDB has no collation
    expression); the display key is lower-cased on both sides so the
    output is engine-neutral."""
    o = table(spark, sf_dir, "orders")
    mixed = o.select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority")
        )
        .otherwise(F.lower("o_orderpriority"))
        .alias("prio_mixed"),
        "o_totalprice",
    )
    return (
        mixed.groupBy(
            F.collate(F.col("prio_mixed"), "UTF8_LCASE").alias("prio_coll")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.countDistinct(
                F.collate(F.col("prio_mixed"), "UTF8_BINARY")
            ).cast("bigint").alias("case_variants"),
            F.sum(fixed_point(F.col("o_totalprice"), 2))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .select(
            F.lower(F.col("prio_coll"))
            .cast("string")
            .alias("prio_lc"),
            "cnt",
            "case_variants",
            "sum_cents",
        )
        .orderBy("prio_lc")
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 <> 0
                  THEN o_orderkey // (o_orderkey % 3) END AS safe_div,
             CASE WHEN CAST(o_orderkey AS HUGEINT) * 9000000000000000
                       <= 9223372036854775807
                  THEN o_orderkey * 9000000000000000 END AS safe_mul
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN safe_div IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS div_by_zero_nulls,
           CAST(SUM(CASE WHEN safe_mul IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS overflow_nulls,
           CAST(SUM(safe_div) AS BIGINT) AS sum_safe_div,
           CAST(MAX(safe_mul) AS BIGINT) AS max_safe_mul
    FROM t
    """,
    tags=("scalar", "ansi", "try-functions", "F-family"),
)
def scalar_try_arithmetic(spark, sf_dir):
    """ANSI-mode SAFETY functions: ``try_divide`` and ``try_multiply``
    return NULL instead of failing the job on division-by-zero and
    int64 overflow — the contract that lets a 100 TB pipeline survive
    one poisoned row without try/except UDFs or job restarts.  The
    overflow boundary is real data-dependent behavior: multiplying by
    9e15 overflows int64 exactly when the key exceeds 1024, so every
    SF exercises both arms.  The oracle (DuckDB would raise on the
    same overflow) states the boundary arithmetically via HUGEINT;
    matching NULL counts and surviving aggregates prove Spark nulls
    EXACTLY the rows the int64 range excludes — no more, no fewer.
    ``try_divide`` on integers is floating in Spark, so the Spark side
    uses the same integer ``div`` guarded by NULLIF for engine-neutral
    integer semantics, keeping try_multiply as the genuine try_* under
    test plus try_divide in a double-checked shadow column."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    t = o.select(
        # integer division with a NULL-on-zero divisor: the try_divide
        # CONTRACT (Spark's try_divide itself returns double, so the
        # exact-integer surface states it as div over NULLIF — and a
        # shadow equality against try_divide is asserted in the filter
        # below, keeping the real function under test)
        F.expr("o_orderkey div nullif(o_orderkey % 3, 0)").alias("safe_div"),
        F.expr("try_multiply(o_orderkey, 9000000000000000)").alias(
            "safe_mul"
        ),
        F.expr(
            "(try_divide(o_orderkey, o_orderkey % 3) IS NULL)"
            " = (o_orderkey % 3 = 0)"
        ).alias("__try_div_contract"),
    )
    return t.filter(F.col("__try_div_contract")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("safe_div").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("div_by_zero_nulls"),
        F.sum(F.when(F.col("safe_mul").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("overflow_nulls"),
        F.sum("safe_div").cast("bigint").alias("sum_safe_div"),
        F.max("safe_mul").cast("bigint").alias("max_safe_mul"),
    )
