"""Cross-engine SQL-semantics contract rows (wave 21).

Like ``subquery_not_in_null_trap``, these queries EXECUTE the traps
that silently diverge between engines, so the gate pins the portable
formulation:

- ``sort_null_ordering_contract`` — Spark's default null ordering is
  NULLS FIRST for ASC (and NULLS LAST for DESC); DuckDB's is the
  opposite.  Any rank/order an engine ships across engines must spell
  the modifier out; this row proves the explicit forms agree.
- ``agg_grouping_id_rollup`` — a rollup over a column that CONTAINS
  nulls: without GROUPING() the subtotal rows are indistinguishable
  from null-valued data rows.  gid disambiguates; the labels show
  the coalesce-on-null mistake this prevents.
- ``scalar_div_by_zero_contract`` — integer division by zero: Spark
  (non-ANSI) yields NULL, DuckDB raises.  The portable form is an
  explicit ``nullif`` denominator — executed identically here.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table


@register(
    "sort_null_ordering_contract",
    oracle="""
    WITH k AS (
      SELECT n_nationkey, nullif(n_regionkey % 3, 0) AS k FROM nation
    )
    SELECT n_nationkey, k,
           ROW_NUMBER() OVER (ORDER BY k ASC NULLS LAST, n_nationkey)
             AS rn_asc_nl,
           ROW_NUMBER() OVER (ORDER BY k DESC NULLS FIRST, n_nationkey)
             AS rn_desc_nf
    FROM k
    """,
    tags=("sort", "semantics", "nulls", "O1"),
)
def sort_null_ordering_contract(spark, sf_dir):
    """Null-ordering contract: rank under ``ASC NULLS LAST`` and
    ``DESC NULLS FIRST`` with explicit modifiers on BOTH engines —
    Spark defaults to the opposite of DuckDB in each direction, so an
    unmodified ORDER BY would hash-mismatch here.  The green row is
    the proof the engine's sorts are portable only when spelled out
    (and the engine does spell them out)."""
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.nullif(F.col("n_regionkey") % 3, F.lit(0)).alias("k")
    )
    return n.select(
        "n_nationkey",
        "k",
        F.row_number()
        .over(Window.orderBy(F.col("k").asc_nulls_last(), F.col("n_nationkey")))
        .alias("rn_asc_nl"),
        F.row_number()
        .over(Window.orderBy(F.col("k").desc_nulls_first(), F.col("n_nationkey")))
        .alias("rn_desc_nf"),
    )


@register(
    "agg_grouping_id_rollup",
    oracle="""
    WITH src AS (
      SELECT nullif(o_orderpriority, '1-URGENT') AS prio, o_orderstatus
      FROM orders
    )
    SELECT COALESCE(o_orderstatus, '<total>') AS status_label,
           COALESCE(prio, '<null-or-subtotal>') AS prio_label,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(prio) AS BIGINT)
             AS gid,
           COUNT(*) AS cnt
    FROM src
    GROUP BY ROLLUP (o_orderstatus, prio)
    """,
    tags=("agg", "semantics", "rollup", "grouping"),
)
def agg_grouping_id_rollup(spark, sf_dir):
    """GROUPING() disambiguation under rollup when the grouped column
    itself contains nulls ('1-URGENT' is nulled out, so ~20% of data
    rows carry a null prio): the coalesced label alone CANNOT tell a
    null-data group from a subtotal row — identical
    ``<null-or-subtotal>`` labels appear with different gid.  gid is
    composed from per-column GROUPING() bits (portable; Spark's
    grouping_id() and DuckDB's GROUPING_ID() agree with it too)."""
    src = table(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio"),
        "o_orderstatus",
    )
    return (
        src.rollup("o_orderstatus", "prio")
        .agg(
            # grouping() is only legal INSIDE the rollup aggregate
            (
                F.grouping("o_orderstatus").cast("bigint") * 2
                + F.grouping("prio").cast("bigint")
            ).alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<total>")).alias(
                "status_label"
            ),
            F.coalesce(F.col("prio"), F.lit("<null-or-subtotal>")).alias(
                "prio_label"
            ),
            "gid",
            "cnt",
        )
    )


@register(
    "scalar_div_by_zero_contract",
    oracle="""
    SELECT o_orderkey,
           o_custkey % 7 AS den,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             // nullif(o_custkey % 7, 0) AS cents_per_unit
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
    tags=("scalar", "semantics", "division"),
)
def scalar_div_by_zero_contract(spark, sf_dir):
    """Division-by-zero contract: Spark's non-ANSI integer division
    quietly returns NULL on a zero denominator while DuckDB raises —
    the portable formulation is an explicit ``nullif`` denominator,
    which this row executes on both engines (zero denominators DO
    occur: custkey % 7 hits 0).  Everything stays exact bigint
    (fixed-point cents, ``div``), so NULL placement is the only
    degree of freedom being tested."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        (F.col("o_custkey") % 7).alias("den"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            " div nullif(o_custkey % 7, 0)"
        ).alias("cents_per_unit"),
    )


#: nested JSON payload derived from event columns (string concat in
#: both dialects), so the VARIANT path walks real nesting
_VJ_SPARK = (
    "concat('{\"k\": ', get_json_object(props, '$.k'),"
    " ', \"meta\": {\"type\": \"', event_type, '\", \"vc\": ',"
    " CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS STRING), '}}')"
)
_VJ_DUCK = (
    "'{\"k\": ' || json_extract_string(props, '$.k')"
    " || ', \"meta\": {\"type\": \"' || event_type || '\", \"vc\": '"
    " || CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR) || '}}'"
)


@register(
    "scalar_variant_semistructured",
    oracle=f"""
    WITH j AS (SELECT {_VJ_DUCK} AS doc FROM events),
    x AS (
      SELECT json_extract_string(doc, '$.meta.type') AS etype,
             CAST(json_extract(doc, '$.meta.vc') AS BIGINT) AS vc,
             CAST(json_extract(doc, '$.k') AS BIGINT) AS k
      FROM j
    )
    SELECT etype,
           COUNT(*) AS cnt,
           CAST(SUM(vc) AS BIGINT) AS sum_vc,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM x GROUP BY etype
    """,
    tags=("scalar", "variant", "json", "spark4"),
)
def scalar_variant_semistructured(spark, sf_dir):
    """Spark 4 VARIANT over semi-structured payloads: a nested JSON
    document is parsed ONCE to the binary variant encoding
    (``parse_json``) and fields come out with ``variant_get`` typed
    path extraction — the open-schema ingestion shape (vs declaring a
    StructType up front, the reference's fixed-schema decode).  At
    100 TB the win is the encoding: variant parses/shreds at the scan
    and repeated path access skips re-parsing the JSON text.  The
    oracle walks the identical documents with DuckDB's JSON
    extraction, pinning value-level equivalence of the two paths."""
    e = table(spark, sf_dir, "events")
    v = e.select(F.expr(f"parse_json({_VJ_SPARK})").alias("v"))
    x = v.select(
        F.expr("variant_get(v, '$.meta.type', 'string')").alias("etype"),
        F.expr("variant_get(v, '$.meta.vc', 'bigint')").alias("vc"),
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
    )
    return x.groupBy("etype").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("vc").cast("bigint").alias("sum_vc"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )
