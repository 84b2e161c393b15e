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


@register(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    tags=("sql", "listagg", "A-family", "F5"),
)
def agg_listagg_ordered(spark, sf_dir):
    """ORDERED string aggregation — Spark 4.0's ``listagg`` (the ANSI
    SQL:2023 function; DuckDB spells it string_agg ... ORDER BY).
    Unordered string_agg output is partition-dependent garbage for
    hashing or diffing; the WITHIN-GROUP order makes the concatenation
    a pure function of the group — the only honest way a distributed
    engine can emit delimited lists (report exports, label sets,
    grouped id manifests).  One groupBy over the 25-row dimension;
    at scale the per-group sort is local to each group after the hash
    exchange."""
    n = table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "scalar_regexp_functions",
    oracle=r"""
    WITH d AS (SELECT doc_id, text FROM documents),
    m AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
             CAST(COALESCE(TRY_CAST(
               regexp_extract(text, '([0-9]+)', 1) AS BIGINT), -1) AS BIGINT)
               AS first_number,
             len(regexp_extract_all(text, '\b[a-z]{4}\b')) AS n_four_letter,
             length(regexp_replace(text, '[aeiou]', '*', 'g')) AS n_chars
      FROM d
    )
    SELECT CAST(SUM(n_numbers) AS BIGINT) AS total_numbers,
           CAST(SUM(CASE WHEN first_number >= 0 THEN first_number
                         ELSE 0 END) AS BIGINT) AS sum_first_numbers,
           CAST(SUM(n_four_letter) AS BIGINT) AS total_four_letter,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars_after_replace,
           CAST(COUNT(CASE WHEN n_numbers > 0 THEN 1 END) AS BIGINT)
             AS docs_with_numbers
    FROM m
    """,
    tags=("scalar", "regexp", "F-family", "text"),
)
def scalar_regexp_functions(spark, sf_dir):
    """REGEXP surface contract — extract-all counts, first-match
    capture, word-boundary classes, and global replace, executed on
    real corpus text and reduced to exact integer totals so any
    engine divergence in regex semantics (greedy match spans, \\b
    word-boundary interpretation, empty-match handling) breaks the
    hash.  Spark's regexp_extract_all / regexp_count / regexp_replace
    are all codegen'd JVM operators (this entire query is one
    map-side pass + a scalar aggregate — the right way to run regex
    over 100 TB of text; a Python re loop would be the 100× slow
    path)."""
    d = table(spark, sf_dir, "documents")
    m = d.select(
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)
        ).alias("n_numbers"),
        F.coalesce(
            F.expr(
            "try_cast(regexp_extract(text, '([0-9]+)', 1) AS BIGINT)"
            ),
            F.lit(-1),
        ).cast("bigint").alias("first_number"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"\b[a-z]{4}\b"), 0)
        ).alias("n_four_letter"),
        F.length(
            F.regexp_replace(F.col("text"), "[aeiou]", "*")
        ).alias("n_chars"),
    )
    return m.agg(
        F.sum("n_numbers").cast("bigint").alias("total_numbers"),
        F.sum(
            F.when(F.col("first_number") >= 0, F.col("first_number")).otherwise(0)
        )
        .cast("bigint")
        .alias("sum_first_numbers"),
        F.sum("n_four_letter").cast("bigint").alias("total_four_letter"),
        F.sum("n_chars").cast("bigint").alias("total_chars_after_replace"),
        F.count(F.when(F.col("n_numbers") > 0, 1))
        .cast("bigint")
        .alias("docs_with_numbers"),
    )


@register(
    "scalar_calendar_edges",
    oracle="""
    WITH probes AS (
      SELECT 'jan31+1mo' AS probe,
             CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE) AS d
      UNION ALL
      SELECT 'feb29+1yr',
             CAST(DATE '2024-02-29' + INTERVAL 12 MONTH AS DATE)
      UNION ALL
      SELECT 'may31-3mo',
             CAST(DATE '2024-05-31' - INTERVAL 3 MONTH AS DATE)
      UNION ALL
      SELECT 'dec31+2mo',
             CAST(DATE '2023-12-31' + INTERVAL 2 MONTH AS DATE)
    )
    SELECT probe,
           strftime(d, '%Y-%m-%d') AS result_date,
           CAST(EXTRACT(dow FROM d) AS BIGINT) AS day_of_week_sun0,
           CAST(EXTRACT(quarter FROM d) AS BIGINT) AS quarter
    FROM probes ORDER BY probe
    """,
    tags=("scalar", "calendar", "semantics", "F9"),
)
def scalar_calendar_edges(spark, sf_dir):
    """CALENDAR-ARITHMETIC EDGE CONTRACT, executed: month arithmetic
    from a month-end clamps to the target month's last day (Jan 31 +
    1 month = Feb 29 in a leap year, NOT Mar 2), leap day + 12 months
    clamps to Feb 28, and subtraction clamps symmetrically — the
    add_months semantics both engines share but many hand-rolled
    day-arithmetic pipelines get wrong (the +30d approximation drifts
    forever).  Each probe also extracts day-of-week (Sunday=0
    convention pinned explicitly: Spark's dayofweek is 1-based
    Sunday=1, so the query subtracts 1 to meet DuckDB's dow) and
    quarter.  A calendar divergence anywhere breaks the hash — this
    is the executed contract billing/cohort code relies on."""
    probes = [
        ("jan31+1mo", "2024-01-31", 1),
        ("feb29+1yr", "2024-02-29", 12),
        ("may31-3mo", "2024-05-31", -3),
        ("dec31+2mo", "2023-12-31", 2),
    ]
    rows = None
    for name, base, months in probes:
        r = spark.range(1).select(
            F.lit(name).alias("probe"),
            F.add_months(F.lit(base).cast("date"), months).alias("d"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.select(
        "probe",
        F.date_format("d", "yyyy-MM-dd").alias("result_date"),
        (F.dayofweek("d") - 1).cast("bigint").alias("day_of_week_sun0"),
        F.quarter("d").cast("bigint").alias("quarter"),
    ).orderBy("probe")


@register(
    "scalar_url_functions",
    oracle="""
    WITH u AS (
      SELECT source || '.example.com' AS host,
             '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
             n_chars AS len_param,
             lang
      FROM documents
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(len_param) AS BIGINT) AS sum_len_param
    FROM u GROUP BY host ORDER BY host
    """,
    tags=("scalar", "url", "F-family"),
)
def scalar_url_functions(spark, sf_dir):
    """URL-PARSING surface contract — ``parse_url`` over URLs
    synthesized deterministically from document attributes
    (``https://<source>.example.com/docs/<lang>/<id>?lang=..&len=..``):
    HOST, PATH, per-key QUERY extraction are each parsed back out of
    the assembled string and reduced to a per-host census (doc count,
    distinct paths, distinct lang params, exact sum of the len
    param).  The oracle recomputes the census from the generation
    algebra WITHOUT parsing — so the hash match proves Spark's URL
    parser inverts the construction exactly (one mangled query-string
    split or host boundary shifts a distinct count).  URL
    canonicalization is the first step of every web-corpus dedup; the
    parse is codegen'd JVM work, one map-side pass + a |hosts|-row
    aggregate at any corpus size."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&len="),
        F.col("n_chars").cast("string"),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("len"))
        .cast("bigint")
        .alias("len_param"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("path").cast("bigint").alias("n_paths"),
            F.count_distinct("lang_param").cast("bigint").alias("n_langs"),
            F.sum("len_param").cast("bigint").alias("sum_len_param"),
        )
        .orderBy("host")
    )


@register(
    "scalar_bitwise_functions",
    oracle="""
    WITH b AS (
      SELECT o_orderkey AS k, o_custkey AS c,
             bit_count(CAST(o_orderkey AS BIGINT)) AS pop,
             xor(CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT))
               AS kx,
             (CAST(o_orderkey AS BIGINT) << 3) AS shl,
             (CAST(o_orderkey AS BIGINT) >> 2) AS shr,
             (CAST(o_orderkey AS BIGINT) & 255) AS lo_byte,
             (CAST(o_orderkey AS BIGINT) | 1) AS set_lsb
      FROM orders
    )
    SELECT CAST(SUM(pop) AS BIGINT) AS total_popcount,
           CAST(bit_xor(kx) AS BIGINT) AS xor_fold,
           CAST(SUM(shl) AS BIGINT) AS sum_shl,
           CAST(SUM(shr) AS BIGINT) AS sum_shr,
           CAST(SUM(lo_byte) AS BIGINT) AS sum_lo_byte,
           CAST(SUM(CASE WHEN set_lsb % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_odd_after_set,
           CAST(COUNT(DISTINCT pop) AS BIGINT) AS distinct_popcounts
    FROM b
    """,
    tags=("scalar", "bitwise", "F-family"),
)
def scalar_bitwise_functions(spark, sf_dir):
    """BITWISE surface contract — popcount (``bit_count``), XOR,
    shifts, AND/OR masks executed over real keys and reduced to exact
    totals (plus an XOR fold, the order-free membership digest this
    repo's checksums already lean on).  Bit arithmetic underpins the
    engine's own structures — bloom filter words, bitmap distinct
    counts, SimHash bands — so the primitive semantics (arithmetic
    shift, two's-complement AND, popcount width) get their own gate
    row: one map-side codegen pass + a scalar aggregate at any
    scale."""
    o = table(spark, sf_dir, "orders")
    b = o.select(
        F.bit_count(F.col("o_orderkey")).cast("bigint").alias("pop"),
        F.expr("o_orderkey ^ o_custkey").alias("kx"),
        F.expr("shiftleft(o_orderkey, 3)").alias("shl"),
        F.expr("shiftright(o_orderkey, 2)").alias("shr"),
        F.expr("o_orderkey & 255").alias("lo_byte"),
        F.expr("o_orderkey | 1").alias("set_lsb"),
    )
    return b.agg(
        F.sum("pop").cast("bigint").alias("total_popcount"),
        F.expr("bit_xor(kx)").cast("bigint").alias("xor_fold"),
        F.sum("shl").cast("bigint").alias("sum_shl"),
        F.sum("shr").cast("bigint").alias("sum_shr"),
        F.sum("lo_byte").cast("bigint").alias("sum_lo_byte"),
        F.sum(F.when(F.col("set_lsb") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_odd_after_set"),
        F.count_distinct("pop").cast("bigint").alias("distinct_popcounts"),
    )
