"""Modern-SQL declared queries (round 3): LATERAL joins and recursive
CTEs, which Spark supports natively as of 4.x — the same SQL text (up
to view naming and integer-division spelling) runs on BOTH engines,
so these are the tightest possible oracle rows in the registry.

- ``join_lateral_topn`` — per-customer top-3 orders via a correlated
  LATERAL subquery (the "top-N per group without a window over the
  whole fact table" idiom).  Catalyst rewrites the lateral into a
  ranked window / limited join under the hood; at 100 TB the shuffle
  is one hash partition by the correlation key, identical to the
  window form, with predicate pushdown into the inner scan.
- ``recursive_referral_rollup`` — a WITH RECURSIVE hierarchy walk
  over a derived referral forest (parent(k) = floor(k/7), roots
  k < 7): every customer is labeled with its root and depth.  Depth
  is O(log N) so the recursion executes O(log N) joins — each one a
  key-hash join of the frontier against the dimension, the same
  frontier-expansion shape the iterative DataFrame loops
  (operators/graph.py) use for unbounded iteration.  Spark's
  recursive-CTE executor materializes the frontier per step, so this
  is the SQL-native spelling of the same plan.

The reference has no recursion or lateral support at all; DuckDB
recursion was previously oracle-only machinery (the
connected-components closure) — with Spark 4 the engine itself speaks
it, and parity is checked hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 3
    ) o
    WHERE c.c_custkey <= 300
    """,
    tags=("sql", "lateral", "J1", "topk-per-group"),
)
def join_lateral_topn(spark, sf_dir):
    """Correlated LATERAL top-3 orders per customer — the same SQL
    text DuckDB runs (view names aside).  The correlation predicate
    pushes into the inner orders scan; the ORDER BY ... LIMIT inside
    the lateral becomes a per-key ranked limit, not a global sort."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer_lat c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_lat
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) o
        WHERE c.c_custkey <= 300
        """
    )


# parent(k) = floor(k/7); spelled with floor(k/7.0) because Spark uses
# `div` and DuckDB `//` for integer division, while floor-over-double
# is exact here (k ≤ ~1.5e6 ≪ 2^53) and parses identically on both.
_REFERRAL_SQL = """
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS k, c_custkey AS root, 0 AS depth
      FROM {customer} WHERE c_custkey < 7
      UNION ALL
      SELECT c.c_custkey, chain.root, chain.depth + 1
      FROM {customer} c
      JOIN chain ON CAST(floor(c.c_custkey / 7.0) AS BIGINT) = chain.k
      WHERE c.c_custkey >= 7
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(k) AS BIGINT) AS sum_keys,
           CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM chain
    GROUP BY depth
"""


@register(
    "recursive_referral_rollup",
    oracle=_REFERRAL_SQL.format(customer="customer"),
    tags=("sql", "recursive", "hierarchy", "A4"),
)
def recursive_referral_rollup(spark, sf_dir):
    """WITH RECURSIVE over the derived referral forest: roots are
    custkeys < 7, each node's parent is floor(k/7), so the recursion
    runs exactly ceil(log7(N)) frontier-expansion joins and labels
    every customer with (root, depth).  Output is the per-depth
    rollup (count / key-sum / distinct roots / key range) — every
    level of the recursion contributes, so a missed or duplicated
    frontier breaks the hash.  Identical SQL text on DuckDB."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_rec")
    return spark.sql(_REFERRAL_SQL.format(customer="customer_rec"))


@register(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus,
           CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "modern", "group-by-all"),
)
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL / ORDER BY ALL — the DuckDB-originated ergonomics
    Spark adopted in 3.4: every non-aggregate select item groups, and
    the output orders by the full select list, so adding a dimension
    to a report is a ONE-line change with no position lists to keep in
    sync.  Same fixed-point revenue discipline as every money column;
    both engines parse and execute the identical modern-SQL text."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(date_format(o_orderdate, 'yyyy') AS BIGINT) AS yr,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders_gba
        GROUP BY ALL
        ORDER BY ALL
        """
    )


_CENTS = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"


@register(
    "script_bisect_revenue_threshold",
    oracle=f"""
    WITH cents AS (SELECT {_CENTS} AS c FROM orders),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM cents),
    by_val AS (SELECT c, CAST(SUM(c) AS BIGINT) AS s FROM cents GROUP BY c),
    cum AS (SELECT c, CAST(SUM(s) OVER (ORDER BY c DESC) AS BIGINT) AS cum
            FROM by_val)
    SELECT CAST(MAX(c) AS BIGINT) AS threshold_cents,
           CAST((SELECT cum FROM cum c2
                 WHERE c2.c = MAX(cum.c)) AS BIGINT) AS covered_cents,
           CAST((SELECT total FROM tot) AS BIGINT) AS total_cents
    FROM cum
    WHERE cum >= (SELECT (total + 1) // 2 FROM tot)
    """,
    tags=("sql", "scripting", "spark4", "control-flow"),
)
def script_bisect_revenue_threshold(spark, sf_dir):
    """Spark 4 **SQL scripting** (BEGIN/DECLARE/WHILE/IF — the
    procedural control-flow surface) exercised on a real convergence
    loop: bisect the maximal integer cent threshold T such that orders
    priced >= T still cover at least half of all revenue (the
    "where do the whales start" cut).  The loop keeps the classic
    bisection invariant S(lo) >= half > S(hi) and runs one aggregate
    per iteration (~log2(max_price) scans).

    The ORACLE computes the same T in ONE windowed pass (descending
    cumulative revenue over distinct price points) — so the hash match
    proves the scripted iteration converges to exactly the
    direct-computation answer, and the docstring can be honest about
    scale: the one-pass form is what you run on 100 TB; the scripted
    form is the control-flow surface demonstration (state in scalar
    variables, loop bounds data-independent and logarithmic)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "__script_orders"
    )
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(f"""
        BEGIN
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE hi BIGINT;
          DECLARE half BIGINT;
          DECLARE mid BIGINT;
          DECLARE s BIGINT;
          SET hi = (SELECT MAX({_CENTS}) + 1 FROM __script_orders);
          SET half = (SELECT (SUM({_CENTS}) + 1) div 2
                      FROM __script_orders);
          WHILE hi - lo > 1 DO
            SET mid = (lo + hi) div 2;
            SET s = (SELECT COALESCE(SUM({_CENTS}), 0)
                     FROM __script_orders WHERE {_CENTS} >= mid);
            IF s >= half THEN
              SET lo = mid;
            ELSE
              SET hi = mid;
            END IF;
          END WHILE;
          SELECT lo AS threshold_cents,
                 (SELECT CAST(SUM({_CENTS}) AS BIGINT)
                  FROM __script_orders
                  WHERE {_CENTS} >= lo) AS covered_cents,
                 (SELECT CAST(SUM({_CENTS}) AS BIGINT)
                  FROM __script_orders) AS total_cents;
        END
        """)
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


@register(
    "scalar_xml_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '%URGENT%'
                         THEN 1 ELSE 0 END) AS BIGINT) AS urgent_rows,
           CAST(COUNT(*) AS BIGINT) AS roundtrip_ok
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("scalar", "xml", "F-family", "spark4"),
)
def scalar_xml_roundtrip(spark, sf_dir):
    """XML scalar surface (``to_xml`` / ``from_xml``): serialize each
    order row to an XML fragment and parse it back with an explicit
    schema — the document-interchange path (feeds, legacy B2B
    payloads) an ingestion pipeline normalizes BEFORE the lakehouse
    sees columns.  The declared result aggregates the PARSED fields,
    and ``roundtrip_ok`` counts rows whose parsed struct equals the
    original values — the oracle states COUNT(*) for it, so a hash
    match proves the round trip is lossless on every row.  Both
    functions are JVM-side expressions (StaxXmlParser under codegen);
    no UDFs, no Python."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    xml = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(
            "to_xml(struct(o_orderkey AS k, o_orderpriority AS p))"
        ).alias("doc"),
    )
    parsed = xml.select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("from_xml(doc, 'k BIGINT, p STRING')").alias("r"),
    )
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("r.k").cast("bigint").alias("sum_keys"),
        F.sum(
            F.when(F.col("r.p").like("%URGENT%"), 1).otherwise(0)
        ).cast("bigint").alias("urgent_rows"),
        F.sum(
            F.when(
                (F.col("r.k") == F.col("o_orderkey"))
                & (F.col("r.p") == F.col("o_orderpriority")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("roundtrip_ok"),
    )
