"""Data-profiling and layout declared queries (round 2 wave 5).

- ``profile_table_summary`` — per-column null/distinct/min/max profile
  of a table in ONE scan (the oracle is allowed its lazy N scans; the
  Spark side is the production one-pass shape).
- ``agg_exact_percentiles`` — exact percentile_disc by rank selection:
  pure integer rank logic, so the result is engine- and
  partitioning-exact (no interpolation arithmetic to disagree on).
- ``layout_zorder_clustering`` — Morton/Z-order interleave of
  (customer, order-day) with per-bucket min/max extents: the layout
  primitive behind multi-dimensional data skipping.  A green row
  proves the bit math is portable; the per-bucket extents SHOW the
  locality a writer would get clustering files by z-value.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, sql_fixed_point, table


def _profile_struct(col: str, min_expr, max_expr):
    return F.struct(
        F.lit(col).alias("col_name"),
        (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
        F.countDistinct(col).alias("n_distinct"),
        min_expr.cast("string").alias("min_repr"),
        max_expr.cast("string").alias("max_repr"),
    )


def _sql_profile_row(col: str, min_sql: str, max_sql: str) -> str:
    return f"""
      SELECT '{col}' AS col_name,
             COUNT(*) - COUNT({col}) AS n_nulls,
             COUNT(DISTINCT {col}) AS n_distinct,
             CAST({min_sql} AS VARCHAR) AS min_repr,
             CAST({max_sql} AS VARCHAR) AS max_repr
      FROM orders"""


#: doubles go through fixed-point before the string repr — double→string
#: formatting is NOT identical across engines, bigint→string is
_PROFILE_COLS = [
    ("o_orderkey", "MIN(o_orderkey)", "MAX(o_orderkey)"),
    ("o_custkey", "MIN(o_custkey)", "MAX(o_custkey)"),
    ("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
    (
        "o_totalprice",
        "CAST(floor(MIN(o_totalprice) * 10000.0 + 0.5) AS BIGINT)",
        "CAST(floor(MAX(o_totalprice) * 10000.0 + 0.5) AS BIGINT)",
    ),
    ("o_orderdate", "MIN(o_orderdate)", "MAX(o_orderdate)"),
    ("o_orderpriority", "MIN(o_orderpriority)", "MAX(o_orderpriority)"),
]


@register(
    "profile_table_summary",
    oracle="\n      UNION ALL\n".join(
        _sql_profile_row(c, mn, mx) for c, mn, mx in _PROFILE_COLS
    ),
    tags=("profiling", "validation", "agg"),
)
def profile_table_summary(spark, sf_dir):
    """One-pass column profiler: nulls, distincts, min/max for every
    column of ``orders`` from a SINGLE scan + single aggregate (the
    naive per-column loop is N scans — unaffordable at 100 TB).
    Numeric extremes are emitted as fixed-point bigints before the
    string repr because double→string formatting differs between
    engines.  countDistinct expands to one grouping pass per column
    under the hood (expand + partial aggs), still one scan."""
    o = table(spark, sf_dir, "orders")
    fp = lambda c: F.floor(c * 10000.0 + 0.5).cast("bigint")  # noqa: E731
    structs = [
        _profile_struct("o_orderkey", F.min("o_orderkey"), F.max("o_orderkey")),
        _profile_struct("o_custkey", F.min("o_custkey"), F.max("o_custkey")),
        _profile_struct(
            "o_orderstatus", F.min("o_orderstatus"), F.max("o_orderstatus")
        ),
        _profile_struct(
            "o_totalprice",
            fp(F.min("o_totalprice")),
            fp(F.max("o_totalprice")),
        ),
        _profile_struct("o_orderdate", F.min("o_orderdate"), F.max("o_orderdate")),
        _profile_struct(
            "o_orderpriority", F.min("o_orderpriority"), F.max("o_orderpriority")
        ),
    ]
    return o.agg(F.inline(F.array(*structs)))


@register(
    "agg_exact_percentiles",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus, CAST(q_pct AS DOUBLE) AS q_pct,
           CAST({sql_fixed_point("o_totalprice")} AS DOUBLE) / 10000.0
             AS pct_value
    FROM ranked, (VALUES (0.25), (0.5), (0.75)) qs(q_pct)
    WHERE rn = CAST(ceil(CAST(q_pct AS DOUBLE) * n) AS BIGINT)
    """,
    tags=("agg", "percentile", "window"),
)
def agg_exact_percentiles(spark, sf_dir):
    """Exact 25/50/75th percentiles of order value per status, by rank
    selection: pick the value at row ceil(q·n) of the sorted group.
    Integer rank logic only — no percentile interpolation arithmetic,
    which engines implement differently.  (Scale note: this ranks the
    full group; the approximate scale path is approx_percentile /
    HLL-style sketches, already covered by agg_approx_distinct — here
    the point is the EXACT distributed formulation.)  The quantile
    probes are a 3-row broadcast, so one window pass serves all
    three."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    qs = spark.createDataFrame([(0.25,), (0.5,), (0.75,)], "q_pct double")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rn") == F.ceil(F.col("q_pct") * F.col("n")))
        .select(
            "o_orderstatus",
            "q_pct",
            (
                F.floor(F.col("o_totalprice") * 10000.0 + 0.5).cast("bigint")
                .cast("double")
                / 10000.0
            ).alias("pct_value"),
        )
    )


_Z_BITS = 16


def _z_spark(col: str, offset: int) -> str:
    return " + ".join(
        f"shiftleft(shiftright({col}, {i}) & 1, {2 * i + offset})"
        for i in range(_Z_BITS)
    )


def _z_duck(col: str, offset: int) -> str:
    return " + ".join(
        f"((({col} >> {i}) & 1) << {2 * i + offset})" for i in range(_Z_BITS)
    )


@register(
    "layout_zorder_clustering",
    oracle=f"""
    WITH dims AS (
      SELECT (o_custkey & 65535) AS ck,
             (date_diff('day', DATE '1992-01-01', o_orderdate) & 65535) AS dd
      FROM orders
    ),
    z AS (
      SELECT ck, dd,
             ({_z_duck("ck", 0)} + {_z_duck("dd", 1)}) AS zval
      FROM dims
    )
    SELECT zval >> 16 AS z_bucket,
           COUNT(*) AS cnt,
           MIN(ck) AS min_ck, MAX(ck) AS max_ck,
           MIN(dd) AS min_dd, MAX(dd) AS max_dd
    FROM z GROUP BY 1
    """,
    tags=("layout", "zorder", "data-skipping"),
)
def layout_zorder_clustering(spark, sf_dir):
    """Z-order (Morton) clustering key over (customer, order-day):
    interleave 16 bits of each dimension, bucket by the upper z-bits (zval >> 16)
    — the write-side layout primitive for multi-dimensional data
    skipping (each z-bucket's min/max extents stay narrow in BOTH
    dimensions, so a reader filtering on either prunes most buckets;
    a linear sort would only prune on its leading column).  All bit
    arithmetic, portable to the byte across engines."""
    o = table(spark, sf_dir, "orders")
    dims = o.select(
        F.expr("o_custkey & 65535").alias("ck"),
        F.expr("datediff(o_orderdate, DATE '1992-01-01') & 65535").alias("dd"),
    )
    z = dims.withColumn(
        "zval", F.expr(f"({_z_spark('ck', 0)}) + ({_z_spark('dd', 1)})")
    )
    return (
        z.groupBy(F.expr("zval >> 16").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("ck").alias("min_ck"),
            F.max("ck").alias("max_ck"),
            F.min("dd").alias("min_dd"),
            F.max("dd").alias("max_dd"),
        )
    )


_ZM_FILE_ROWS = 4096  # synthetic file = l_orderkey div 4096
_ZM_LO = "DATE '1995-06-01'"
_ZM_HI = "DATE '1995-08-31'"


@register(
    "maintenance_zone_map_skipping",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey // {_ZM_FILE_ROWS} AS file_id,
             CAST(l_shipdate AS DATE) AS d
      FROM lineitem
    ),
    zones AS (
      SELECT file_id, MIN(d) AS zmin, MAX(d) AS zmax,
             CAST(COUNT(*) AS BIGINT) AS rows_in_file,
             CAST(COUNT(*) FILTER (WHERE d BETWEEN {_ZM_LO} AND {_ZM_HI})
                  AS BIGINT) AS rows_matching
      FROM li GROUP BY file_id
    ),
    flagged AS (
      SELECT *, (zmax >= {_ZM_LO} AND zmin <= {_ZM_HI}) AS scanned FROM zones
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS files_total,
           CAST(COUNT(*) FILTER (WHERE scanned) AS BIGINT) AS files_scanned,
           CAST(COUNT(*) FILTER (WHERE NOT scanned) AS BIGINT) AS files_skipped,
           CAST(SUM(rows_in_file) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN scanned THEN rows_in_file ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(SUM(rows_matching) AS BIGINT) AS rows_matching,
           CAST(SUM(CASE WHEN NOT scanned THEN rows_matching ELSE 0 END) AS BIGINT)
             AS rows_missed
    FROM flagged
    """,
    tags=("maintenance", "zonemap", "data-skipping", "M1-scale"),
)
def maintenance_zone_map_skipping(spark, sf_dir):
    """Zone-map (min/max statistics) data skipping, made explicit: rows
    are assigned to synthetic files (orderkey div 4096 — the insert
    order a CDC sink would produce), each file keeps a (min, max)
    l_shipdate zone, and a 3-month predicate consults ONLY the zones to
    decide which files to open.  Emits the skipping economics — files
    skipped, rows NOT read, and the correctness invariant rows_missed
    (matches inside skipped files) which MUST be 0, oracle-enforced:
    zone pruning is lossless by construction.  The zone build is one
    map-side-combined aggregate into |files| rows; at 100 TB this is
    the maintenance scan that writes parquet footer/Iceberg manifest
    stats, and the ratio rows_scanned/rows_matching is exactly the
    read-amplification a z-order rewrite (layout_zorder_clustering)
    exists to shrink."""
    li = table(spark, sf_dir, "lineitem").select(
        F.expr(f"l_orderkey div {_ZM_FILE_ROWS}").alias("file_id"),
        F.to_date("l_shipdate").alias("d"),
    )
    lo, hi = F.lit("1995-06-01").cast("date"), F.lit("1995-08-31").cast("date")
    zones = li.groupBy("file_id").agg(
        F.min("d").alias("zmin"),
        F.max("d").alias("zmax"),
        F.count(F.lit(1)).alias("rows_in_file"),
        F.count(F.when((F.col("d") >= lo) & (F.col("d") <= hi), 1)).alias(
            "rows_matching"
        ),
    )
    flagged = zones.withColumn(
        "scanned", (F.col("zmax") >= lo) & (F.col("zmin") <= hi)
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("files_total"),
        F.count(F.when(F.col("scanned"), 1)).alias("files_scanned"),
        F.count(F.when(~F.col("scanned"), 1)).alias("files_skipped"),
        F.sum("rows_in_file").cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("scanned"), F.col("rows_in_file")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("rows_matching").cast("bigint").alias("rows_matching"),
        F.sum(F.when(~F.col("scanned"), F.col("rows_matching")).otherwise(0))
        .cast("bigint")
        .alias("rows_missed"),
    )


_CP_TARGET = 4 * 1024 * 1024  # compaction group target, bytes


@register(
    "maintenance_compaction_planner",
    oracle=f"""
    WITH files AS (
      SELECT l_orderkey // 512 AS file_id,
             -- deterministic synthetic on-disk size: ~rows x row width
             CAST(COUNT(*) AS BIGINT) * 96 AS bytes
      FROM lineitem GROUP BY file_id
    ),
    small AS (SELECT * FROM files WHERE bytes < {_CP_TARGET}),
    packed AS (
      SELECT file_id, bytes,
             (SUM(bytes) OVER (ORDER BY file_id) - bytes) // {_CP_TARGET}
               AS group_id
      FROM small
    )
    SELECT CAST(group_id AS BIGINT) AS group_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS group_bytes,
           CAST(MIN(file_id) AS BIGINT) AS first_file,
           CAST(MAX(file_id) AS BIGINT) AS last_file
    FROM packed
    GROUP BY group_id
    ORDER BY group_id
    """,
    tags=("maintenance", "compaction", "bin-packing", "M1-scale"),
)
def maintenance_compaction_planner(spark, sf_dir):
    """The PLANNING half of small-file compaction (the execute half
    lives in maintenance.compact_small_files / the sink's
    compact_buckets): files under the target size are packed into
    rewrite groups by prefix-sum bin-packing — a file joins the group
    its CUMULATIVE size before it falls into, so groups are contiguous
    in layout order (preserving clustering/sort locality) and every
    group lands within one file of the target.  The cumsum over the
    |files|-sized stats table (a 100 TB lakehouse has millions of
    files) is the two-pass distributed prefix sum
    (operators/prefix.py): file_id range-bucket → per-bucket window
    cumsum → strictly-lower-bucket byte totals combined by broadcast
    — no SinglePartition window.  No data pages are read to plan,
    which is what lets table services schedule compaction across a
    100 TB lakehouse every few minutes.  Exact integer sizes; group
    boundaries identical in both engines."""
    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    files = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.expr("l_orderkey div 512").alias("file_id"))
        .agg((F.count(F.lit(1)) * 96).cast("bigint").alias("bytes"))
    )
    small = with_range_bucket(
        files.filter(F.col("bytes") < _CP_TARGET), "file_id", 64
    )
    offsets = lower_bucket_agg(
        small.groupBy("__bkt").agg(F.sum("bytes").alias("__btot")),
        "__bkt",
        "__btot",
        "__off",
    )
    w = Window.partitionBy("__bkt").orderBy("file_id")
    packed = small.join(F.broadcast(offsets), "__bkt").withColumn(
        "group_id",
        (
            (F.sum("bytes").over(w) + F.col("__off") - F.col("bytes"))
            / _CP_TARGET
        ).cast("bigint"),
    )
    return (
        packed.groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").cast("bigint").alias("group_bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
        .orderBy("group_id")
    )


_CORR_PAIRS = (
    ("l_extendedprice", "l_quantity"),
    ("l_extendedprice", "l_discount"),
    ("l_discount", "l_tax"),
    ("l_quantity", "l_tax"),
)

#: every column fixed-pointed to integers (prices cents, rates x100)
_CORR_FP = {
    "l_extendedprice": "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
    "l_quantity": "CAST(floor(l_quantity + 0.5) AS BIGINT)",
    "l_discount": "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)",
    "l_tax": "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)",
}


def _corr_cell_sql(cx: str, cy: str) -> str:
    x, y = _CORR_FP[cx], _CORR_FP[cy]
    return f"""
      SELECT '{cx}' AS col_x, '{cy}' AS col_y,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({x}) AS HUGEINT) AS sx,
             CAST(SUM({y}) AS HUGEINT) AS sy,
             CAST(SUM({x} * {y}) AS HUGEINT) AS sxy,
             CAST(SUM({x} * {x}) AS HUGEINT) AS sxx,
             CAST(SUM({y} * {y}) AS HUGEINT) AS syy
      FROM lineitem"""


@register(
    "stats_correlation_matrix",
    oracle=f"""
    WITH cells AS (
{" UNION ALL ".join(_corr_cell_sql(cx, cy) for cx, cy in _CORR_PAIRS)}
    ),
    wide AS (
      SELECT col_x, col_y,
             CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
               - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS cov,
             CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
               - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS varx,
             CAST(n AS HUGEINT) * CAST(syy AS HUGEINT)
               - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS vary
      FROM cells
    )
    SELECT col_x, col_y,
           CAST(cov AS VARCHAR) AS cov_num,
           CAST(varx AS VARCHAR) AS varx_num,
           CAST(vary AS VARCHAR) AS vary_num,
           CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END
                AS INT) AS r_sign,
           round(CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE)
                 / (CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)), 6)
             AS r_squared
    FROM wide
    ORDER BY col_x, col_y
    """,
    tags=("stats", "correlation", "profiling", "A4"),
)
def stats_correlation_matrix(spark, sf_dir):
    """Pearson correlation between numeric column pairs with the
    denominators CLEARED (the ACF/CUSUM discipline): covariance and
    variance numerators n·Σxy − ΣxΣy etc. are exact bigints over
    fixed-point columns, the SIGN of r is read off the integer
    covariance, and r² is the exact rational rounded once — no sqrt
    ever computed, so nothing transcendental sits on the oracle
    surface.  One scan produces all four pairs' sufficient statistics
    as map-side-combined sums — the profiling pass a feature-selection
    or drift job runs, exact at ANY scale: per-row products are
    int64-safe, the sums accumulate in DECIMAL(38,0), and the final
    n*S products run in 128-bit (Spark decimal / DuckDB HUGEINT) with
    numerators emitted as digit strings — no overflow cliff to fall
    off when the table grows 1000x."""
    li = table(spark, sf_dir, "lineitem")
    cells = None
    for cx, cy in _CORR_PAIRS:
        x, y = F.expr(_CORR_FP[cx]), F.expr(_CORR_FP[cy])
        cell = li.agg(
            F.count(F.lit(1)).alias("n"),
            # per-row products are int64-safe; the SUMS accumulate in
            # decimal(38,0)/HUGEINT with NO bigint narrowing anywhere —
            # sf0.1 already pushes sum(x^2) past int64 (2.2e19)
            F.sum(x.cast("decimal(38,0)")).alias("sx"),
            F.sum(y.cast("decimal(38,0)")).alias("sy"),
            F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
            F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
            F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
        ).select(
            F.lit(cx).alias("col_x"), F.lit(cy).alias("col_y"), "*"
        )
        cells = cell if cells is None else cells.unionAll(cell)
    def d(col):  # int64 sums widen to decimal(38,0) before products
        return F.col(col).cast("decimal(38,0)")

    cov = d("n") * d("sxy") - d("sx") * d("sy")
    varx = d("n") * d("sxx") - d("sx") * d("sx")
    vary = d("n") * d("syy") - d("sy") * d("sy")
    wide = cells.select(
        "col_x",
        "col_y",
        cov.alias("cov"),
        varx.alias("varx"),
        vary.alias("vary"),
    )
    return wide.select(
        "col_x",
        "col_y",
        F.col("cov").cast("decimal(38,0)").cast("string").alias("cov_num"),
        F.col("varx").cast("decimal(38,0)").cast("string").alias("varx_num"),
        F.col("vary").cast("decimal(38,0)").cast("string").alias("vary_num"),
        F.when(F.col("cov") > 0, 1)
        .when(F.col("cov") < 0, -1)
        .otherwise(0)
        .cast("int")
        .alias("r_sign"),
        F.round(
            F.col("cov").cast("double") * F.col("cov").cast("double")
            / (F.col("varx").cast("double") * F.col("vary").cast("double")),
            6,
        ).alias("r_squared"),
    ).orderBy("col_x", "col_y")


_SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def _skew_cell_sql(tbl: str, col: str) -> str:
    return f"""
      SELECT '{tbl}.{col}' AS key_col,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
             CAST(MIN(cnt) AS BIGINT) AS min_key_rows
      FROM (SELECT {col}, COUNT(*) AS cnt FROM {tbl} GROUP BY {col})"""


@register(
    "profile_join_key_skew",
    oracle=f"""
    WITH cells AS (
{" UNION ALL ".join(_skew_cell_sql(t, c) for t, c in _SKEW_KEYS)}
    )
    SELECT key_col, n_rows, n_keys, max_key_rows,
           -- hottest key's share in parts-per-million (integer div)
           max_key_rows * 1000000 // n_rows AS top_key_ppm,
           -- skew factor: hottest key vs the average key (x1000)
           max_key_rows * n_keys * 1000 // n_rows AS skew_x1000
    FROM cells
    ORDER BY key_col
    """,
    tags=("profiling", "skew", "join-tuning", "A4"),
)
def profile_join_key_skew(spark, sf_dir):
    """Join-key skew diagnostic — the measurement that DECIDES between
    a plain shuffle join, AQE skew splitting, and the salted variant
    (join_skewed_salted): for each join-key family, the hottest key's
    row share and its ratio to the average key (x1000, integer
    floor-division — no float thresholds).  A skew_x1000 near 1000
    means uniform keys (salting would only add overhead); orders of
    magnitude above means one reducer owns the whale and the salted
    path pays for itself.  Each cell is one group-count aggregate
    (map-side combined) over its table; the report is five rows that
    an autotuner — or the engineer reading SCALE.md — acts on."""
    cells = None
    for tbl, col in _SKEW_KEYS:
        t = table(spark, sf_dir, tbl)
        per_key = t.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        cell = per_key.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").cast("bigint").alias("max_key_rows"),
            F.min("cnt").cast("bigint").alias("min_key_rows"),
        ).select(F.lit(f"{tbl}.{col}").alias("key_col"), "*")
        cells = cell if cells is None else cells.unionAll(cell)
    return cells.select(
        "key_col",
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.expr("max_key_rows * 1000000 div n_rows").alias("top_key_ppm"),
        F.expr("max_key_rows * n_keys * 1000 div n_rows").alias("skew_x1000"),
    ).orderBy("key_col")


@register(
    "stats_winsorized_means",
    oracle=f"""
    WITH ranked AS (
      SELECT l_returnflag,
             {sql_fixed_point('l_extendedprice')} AS fp,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY {sql_fixed_point('l_extendedprice')},
                        l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    bounds AS (
      SELECT l_returnflag,
             MIN(CASE WHEN rn = (n + 19) // 20 THEN fp END) AS lo,
             MIN(CASE WHEN rn = (19 * n + 19) // 20 THEN fp END) AS hi
      FROM ranked
      WHERE rn = (n + 19) // 20 OR rn = (19 * n + 19) // 20
      GROUP BY l_returnflag
    )
    SELECT r.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           b.lo AS p05_fp, b.hi AS p95_fp,
           CAST(SUM(LEAST(GREATEST(r.fp, b.lo), b.hi)) // COUNT(*)
                AS BIGINT) AS winsor_mean_fp,
           CAST(SUM(CASE WHEN r.fp BETWEEN b.lo AND b.hi THEN r.fp END)
                // SUM(CASE WHEN r.fp BETWEEN b.lo AND b.hi
                            THEN 1 ELSE 0 END) AS BIGINT)
             AS trimmed_mean_fp,
           CAST(SUM(CASE WHEN r.fp < b.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_lo,
           CAST(SUM(CASE WHEN r.fp > b.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_hi
    FROM ranked r JOIN bounds b USING (l_returnflag)
    GROUP BY r.l_returnflag, b.lo, b.hi
    ORDER BY r.l_returnflag
    """,
    tags=("stats", "robust", "winsorize", "profiling"),
)
def stats_winsorized_means(spark, sf_dir):
    """Winsorized and trimmed means per return flag — the robust-stats
    treatment every metrics pipeline applies before averaging
    long-tailed money columns (a handful of whale orders otherwise own
    the mean): exact p05/p95 thresholds by RANK PICK (the
    percentile_disc trick of agg_exact_percentiles — ceil(p·n)-th
    value under a total order, no interpolation), then one aggregation
    that clamps to the band (winsorize), averages only the band (trim),
    and counts what was clamped on each side.  Everything is integer
    fixed-point: thresholds, sums, and `div` means are bit-identical
    cross-engine — the float version of this query would drift in the
    last digit and flake the gate.

    Scale shape: Catalyst prunes the rank window OUT of the clamp
    branch (its rn/n columns are only consumed by the threshold
    branch), so the executed plan is: one group-partitioned window
    pass to pick the thresholds (collapsing to a |groups|-sized
    broadcast), and one plain scan + broadcast join + map-side-combined
    aggregation for the clamped stats — the big table is never
    shuffled twice, and the second pass carries no sort at all."""
    fp = F.expr(
        "CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)"
    )
    ranked = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        fp.alias("fp"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_returnflag")
    ranked = ranked.select(
        "l_returnflag",
        "fp",
        F.row_number()
        .over(w.orderBy("fp", "l_orderkey", "l_linenumber"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    c05 = F.expr("(n + 19) div 20")
    c95 = F.expr("(19 * n + 19) div 20")
    bounds = (
        ranked.filter((F.col("rn") == c05) | (F.col("rn") == c95))
        .groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("rn") == c05, F.col("fp"))).alias("lo"),
            F.min(F.when(F.col("rn") == c95, F.col("fp"))).alias("hi"),
        )
    )
    r = ranked.join(F.broadcast(bounds), "l_returnflag")
    return (
        r.groupBy("l_returnflag", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(
                "CAST(sum(least(greatest(fp, lo), hi)) div count(1) "
                "AS BIGINT)"
            ).alias("winsor_mean_fp"),
            F.expr(
                "CAST(sum(CASE WHEN fp BETWEEN lo AND hi THEN fp END) div "
                "sum(CASE WHEN fp BETWEEN lo AND hi THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("trimmed_mean_fp"),
            F.expr(
                "CAST(sum(CASE WHEN fp < lo THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_clamped_lo"),
            F.expr(
                "CAST(sum(CASE WHEN fp > hi THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_clamped_hi"),
        )
        .select(
            "l_returnflag",
            "n",
            F.col("lo").alias("p05_fp"),
            F.col("hi").alias("p95_fp"),
            "winsor_mean_fp",
            "trimmed_mean_fp",
            "n_clamped_lo",
            "n_clamped_hi",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Rebucket planner (round 6) — the planning half of partition evolution
# ---------------------------------------------------------------------------

_RB_P = 2_147_483_647  # 2^31-1; same overflow-free mixing as the shuffle
_RB_CURRENT = 4  # the bucket count being outgrown
_RB_TARGET_ROWS = 8_192  # max rows one bucket should hold at this tier


@register(
    "maintenance_rebucket_planner",
    oracle=f"""
    WITH assigned AS (
      SELECT ((1103515245 * (o_orderkey % {_RB_P}) + 12345) % {_RB_P})
               % {_RB_CURRENT} AS bucket
      FROM orders
    ),
    per_bucket AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rows_in_bucket
      FROM assigned GROUP BY bucket
    ),
    stats AS (
      SELECT CAST(SUM(rows_in_bucket) AS BIGINT) AS total_rows,
             CAST(MAX(rows_in_bucket) AS BIGINT) AS max_bucket_rows,
             CAST(MIN(rows_in_bucket) AS BIGINT) AS min_bucket_rows
      FROM per_bucket
    )
    SELECT CAST({_RB_CURRENT} AS BIGINT) AS n_current,
           total_rows, max_bucket_rows,
           max_bucket_rows * 1000000 * {_RB_CURRENT} // total_rows
             AS skew_ppm,
           CAST({_RB_TARGET_ROWS} AS BIGINT) AS target_rows,
           CAST(
             CASE WHEN (total_rows + {_RB_TARGET_ROWS} - 1)
                       // {_RB_TARGET_ROWS} <= 1 THEN 1
                  ELSE 1 << length(bin(
                    (total_rows + {_RB_TARGET_ROWS} - 1)
                    // {_RB_TARGET_ROWS} - 1))
             END AS BIGINT) AS n_recommended,
           CAST(max_bucket_rows > {_RB_TARGET_ROWS} AS BOOLEAN)
             AS rebucket_needed
    FROM stats
    """,
    tags=("maintenance", "rebucket", "partition-evolution", "M-scale"),
)
def maintenance_rebucket_planner(spark, sf_dir):
    """The PLANNING half of partition evolution (the execute half is
    ``SnapshotUpsertSink.rebucket``): from per-bucket row counts under
    the CURRENT key-hash map, decide whether any bucket exceeds the
    per-bucket row budget and recommend the next power-of-two count
    that brings the EXPECTED bucket back under it.  Powers of two keep
    the recommendation stable under growth (each doubling halves every
    bucket) and make successive rebuckets split buckets evenly.  The
    plan is one |buckets|-row aggregate over a key-only projection —
    no data pages read, so a table service can evaluate every table's
    bucket health on a schedule, exactly like the compaction planner.
    skew_ppm (max/avg as exact integer ppm) is the 'is the key hashed
    badly' alarm that says rebucketing alone will NOT fix a hot key.
    The hash is the same overflow-free affine-modular mix as
    sample_global_shuffle, and EVERY output is exact-integer: the
    power-of-two rounding is ``1 << bit_length(ceil_div - 1)`` via
    ``length(bin(…))`` — no log2/pow doubles whose last-ulp behavior
    could differ between engines at exact powers of two."""
    k = F.col("o_orderkey")
    bucket = (
        (F.lit(1103515245) * (k % _RB_P) + 12345) % _RB_P
    ) % _RB_CURRENT
    per_bucket = (
        table(spark, sf_dir, "orders")
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_in_bucket"))
    )
    stats = per_bucket.agg(
        F.sum("rows_in_bucket").cast("bigint").alias("total_rows"),
        F.max("rows_in_bucket").cast("bigint").alias("max_bucket_rows"),
        F.min("rows_in_bucket").cast("bigint").alias("min_bucket_rows"),
    )
    return stats.select(
        F.lit(_RB_CURRENT).cast("bigint").alias("n_current"),
        "total_rows",
        "max_bucket_rows",
        F.expr(
            f"max_bucket_rows * 1000000 * {_RB_CURRENT} div total_rows"
        ).alias("skew_ppm"),
        F.lit(_RB_TARGET_ROWS).cast("bigint").alias("target_rows"),
        F.expr(
            f"CAST(CASE WHEN (total_rows + {_RB_TARGET_ROWS} - 1) "
            f"div {_RB_TARGET_ROWS} <= 1 THEN 1 "
            f"ELSE shiftleft(1L, length(bin("
            f"(total_rows + {_RB_TARGET_ROWS} - 1) "
            f"div {_RB_TARGET_ROWS} - 1))) END AS BIGINT)"
        ).alias("n_recommended"),
        (F.col("max_bucket_rows") > _RB_TARGET_ROWS).alias("rebucket_needed"),
    )


# ---------------------------------------------------------------------------
# Grouped OLS regression from sufficient statistics (round 7)
# ---------------------------------------------------------------------------


@register(
    "stats_ols_by_brand",
    oracle="""
    WITH pts AS (
      SELECT p.p_brand AS brand,
             CAST(l.l_quantity AS BIGINT) AS x,
             CAST(ROUND(l.l_extendedprice) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    suff AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pts GROUP BY brand
    ),
    d AS (
      SELECT brand, n, sx, sy,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dxx,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS dxy,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dyy
      FROM suff
    )
    SELECT brand, n, sx, sy,
           round(dxy / dxx, 6) AS slope,
           round((CAST(sy AS DOUBLE) - (dxy / dxx) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept,
           round((dxy * dxy) / (dxx * dyy), 6) AS r2
    FROM d ORDER BY brand
    """,
    tags=("stats", "regression", "A-family"),
)
def stats_ols_by_brand(spark, sf_dir):
    """Per-brand ordinary least squares (extended price in whole
    dollars regressed on quantity) computed ENTIRELY from mergeable
    sufficient statistics — the one-pass distributed regression shape:
    one groupBy collects exact-integer (n, Σx, Σy, Σxy, Σx², Σy²)
    with map-side partial aggregation, then slope / intercept / R²
    are pure driver-free arithmetic on the six columns.  Adding a
    measure never adds a shuffle; the same six sums serve correlation,
    variance, and forecast-error bands.  Determinism: the sums are
    exact integers small enough to be exactly representable as
    doubles (< 2^53 at every tested sf), and both engines then apply
    the IDENTICAL IEEE expression tree, so round(·, 6) agrees
    bit-for-bit.  Scale: |brands| output rows; the only wide exchange
    is the brand hash — and the part-side join is broadcast
    (|part| << |lineitem|).

    Reference parity: extends the reference's per-table COUNT/SUM
    validation probes (src/validation/validation.py) to second-order
    statistics."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice")).cast("bigint").alias("y"),
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    pts = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    suff = pts.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    dxx = nd * F.col("sxx").cast("double") - sxd * sxd
    dxy = nd * F.col("sxy").cast("double") - sxd * syd
    dyy = nd * F.col("syy").cast("double") - syd * syd
    return suff.select(
        "brand",
        "n",
        "sx",
        "sy",
        F.round(dxy / dxx, 6).alias("slope"),
        F.round((syd - (dxy / dxx) * sxd) / nd, 6).alias("intercept"),
        F.round((dxy * dxy) / (dxx * dyy), 6).alias("r2"),
    ).orderBy("brand")


@register(
    "profile_fd_violations",
    oracle="""
    WITH cands AS (
      SELECT 'customer: c_nationkey -> region' AS fd,
             CAST(c.c_nationkey AS VARCHAR) AS lhs,
             CAST(n.n_regionkey AS VARCHAR) AS rhs
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      UNION ALL
      SELECT 'orders: o_custkey -> priority',
             CAST(o_custkey AS VARCHAR), o_orderpriority
      FROM orders
      UNION ALL
      SELECT 'lineitem: l_orderkey -> returnflag',
             CAST(l_orderkey AS VARCHAR), l_returnflag
      FROM lineitem
    ),
    per_lhs AS (
      SELECT fd, lhs, COUNT(DISTINCT rhs) AS n_rhs
      FROM cands GROUP BY fd, lhs
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_distinct,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS violation_ppm
    FROM per_lhs GROUP BY fd ORDER BY fd
    """,
    tags=("profiling", "quality", "functional-dependency"),
)
def profile_fd_violations(spark, sf_dir):
    """FUNCTIONAL-DEPENDENCY discovery probes (the Metanome-style
    profiling step schema-inference and data-contract tooling runs):
    for each candidate FD ``lhs → rhs``, count left-hand groups whose
    right side is NOT single-valued.  Three candidates spanning the
    three outcomes: a TRUE dependency (customer nation → region
    through the nation dim — 0 violations by construction), a
    NEAR-dependency (customer → order priority: violated by most
    multi-order customers), and a NON-dependency (order → line return
    flag).  Violation rate in exact integer ppm.

    Scale shape: one map-side projection per candidate unioned into a
    single (fd, lhs)-keyed aggregate — the |lhs groups| shuffle, with
    COUNT(DISTINCT rhs) expanded by Spark into the standard two-phase
    partial-distinct plan (no row explosion); the dimension join for
    the first candidate is broadcast.  At 100 TB candidate FDs
    evaluate in ONE pass over the fact table each, the profiling
    posture that makes contract checks affordable."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cands = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.lit("customer: c_nationkey -> region").alias("fd"),
            F.col("c_nationkey").cast("string").alias("lhs"),
            F.col("n_regionkey").cast("string").alias("rhs"),
        )
        .unionByName(
            o.select(
                F.lit("orders: o_custkey -> priority").alias("fd"),
                F.col("o_custkey").cast("string").alias("lhs"),
                F.col("o_orderpriority").alias("rhs"),
            )
        )
        .unionByName(
            li.select(
                F.lit("lineitem: l_orderkey -> returnflag").alias("fd"),
                F.col("l_orderkey").cast("string").alias("lhs"),
                F.col("l_returnflag").alias("rhs"),
            )
        )
    )
    per_lhs = cands.groupBy("fd", "lhs").agg(
        F.countDistinct("rhs").alias("n_rhs")
    )
    return (
        per_lhs.groupBy("fd")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_groups"),
            F.max("n_rhs").cast("bigint").alias("max_rhs_distinct"),
            F.expr(
                "CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("violation_ppm"),
        )
        .orderBy("fd")
    )


@register(
    "profile_gini_impurity",
    oracle="""
    WITH cols AS (
      SELECT 'orders.o_orderpriority' AS col, o_orderpriority AS v
      FROM orders
      UNION ALL
      SELECT 'orders.o_orderstatus', o_orderstatus FROM orders
      UNION ALL
      SELECT 'lineitem.l_returnflag', l_returnflag FROM lineitem
      UNION ALL
      SELECT 'events.event_type', event_type FROM events
      UNION ALL
      SELECT 'documents.lang', lang FROM documents
      UNION ALL
      SELECT 'documents.source', source FROM documents
    ),
    counts AS (
      SELECT col, v, CAST(COUNT(*) AS HUGEINT) AS c
      FROM cols GROUP BY col, v
    ),
    stats AS (
      SELECT col,
             CAST(SUM(c) AS HUGEINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c * c) AS HUGEINT) AS sum_c2
      FROM counts GROUP BY col
    )
    SELECT col,
           CAST(n AS BIGINT) AS n,
           n_distinct,
           CAST((n * n - sum_c2) * 1000000 // (n * n) AS BIGINT)
             AS gini_ppm
    FROM stats ORDER BY col
    """,
    tags=("profiling", "stats", "cbo", "A-family"),
)
def profile_gini_impurity(spark, sf_dir):
    """CATEGORICAL-COLUMN GINI IMPURITY (1 − Σpᵢ²) in exact integer
    ppm — the selectivity/skew probe a cost-based optimizer and a
    stratified sampler both read: 0 means one value dominates
    (predicates on it are useless), values near the uniform bound
    (1 − 1/k) mean even strata.  Unlike entropy this needs NO
    logarithm, so the whole statistic is integer arithmetic: per
    column one value-count aggregate, then (n² − Σc²)·10⁶ div n² with
    the squares accumulated in DECIMAL(38,0)/HUGEINT (n² at 100 TB
    overflows int64 — the round-3 overflow-cliff lesson applied ahead
    of time).  Six columns ride one unioned plan; each probe is a
    map-side-combined count like the reference's validation
    aggregates."""
    specs = [
        ("orders.o_orderpriority", "orders", "o_orderpriority"),
        ("orders.o_orderstatus", "orders", "o_orderstatus"),
        ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
        ("events.event_type", "events", "event_type"),
        ("documents.lang", "documents", "lang"),
        ("documents.source", "documents", "source"),
    ]
    parts = []
    for label, tbl, col in specs:
        t = table(spark, sf_dir, tbl)
        parts.append(
            t.select(F.lit(label).alias("col"), F.col(col).alias("v"))
        )
    cols = parts[0]
    for p in parts[1:]:
        cols = cols.unionByName(p)
    counts = cols.groupBy("col", "v").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    stats = counts.groupBy("col").agg(
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("sum_c2"),
    )
    return stats.select(
        "col",
        F.col("n").cast("bigint").alias("n"),
        "n_distinct",
        (
            (F.col("n") * F.col("n") - F.col("sum_c2"))
            * F.lit(1000000).cast("decimal(38,0)")
            / (F.col("n") * F.col("n"))
        )
        .cast("bigint")
        .alias("gini_ppm"),
    ).orderBy("col")


_CD_FILE_ROWS = 4096  # insert-order synthetic file size (zone-map twin)
_CD_DAYS_PER_FILE = 30  # date-clustered layout: one file per ~month


@register(
    "maintenance_clustering_depth",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey // {_CD_FILE_ROWS} AS f_ins,
             datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
               AS d
      FROM lineitem
    ),
    layouts AS (
      SELECT 'date_clustered' AS layout, d // {_CD_DAYS_PER_FILE} AS file_id,
             d FROM li
      UNION ALL
      SELECT 'insert_order', f_ins, d FROM li
    ),
    zones AS (
      SELECT layout, file_id, MIN(d) AS zmin, MAX(d) AS zmax
      FROM layouts GROUP BY layout, file_id
    ),
    deltas AS (
      SELECT layout, zmin AS d, 1 AS delta FROM zones
      UNION ALL
      SELECT layout, zmax + 1, -1 FROM zones
    ),
    daily AS (
      SELECT layout, d, SUM(delta) AS net FROM deltas GROUP BY layout, d
    ),
    curve AS (
      SELECT layout, d, net,
             SUM(net) OVER (PARTITION BY layout ORDER BY d) AS depth
      FROM daily
    ),
    files AS (SELECT layout, COUNT(*) AS nf FROM zones GROUP BY layout)
    SELECT c.layout,
           CAST(f.nf AS BIGINT) AS files_total,
           CAST(MAX(c.depth) AS BIGINT) AS max_depth,
           CAST(COUNT(*) FILTER (c.depth >= 2) * 1000000
                // COUNT(*) FILTER (c.depth >= 1) AS BIGINT)
             AS overlapped_boundary_ppm
    FROM curve c JOIN files f ON c.layout = f.layout
    GROUP BY c.layout, f.nf ORDER BY c.layout
    """,
    tags=("maintenance", "clustering", "zonemap", "M1-scale"),
)
def maintenance_clustering_depth(spark, sf_dir):
    """CLUSTERING DEPTH — the file-overlap metric that tells a
    lakehouse WHEN to rewrite (Delta's OPTIMIZE/clustering metric,
    made explicit): each file's l_shipdate zone [zmin, zmax] enters a
    +1/−1 interval sweep, and the running sum is how many files a
    point-in-time reader must open.  Insert-order files (orderkey
    div 4096 — what a CDC ingest produces) each span nearly the whole
    calendar, so max_depth ≈ file count and every boundary day is
    overlapped; date-clustered files are near-disjoint (depth ~1-2).
    The report quantifies exactly the read-amplification gap
    maintenance_zone_map_skipping prices and layout_zorder_clustering
    fixes — the decision input for scheduling the rewrite.  Scale
    shape: one |lineitem| aggregate reduces to |files| zones; the
    sweep runs on the per-day delta table (calendar-bounded) via the
    two-pass prefix carry — no SinglePartition window, same discipline
    as orders_concurrency_curve."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    li = table(spark, sf_dir, "lineitem").select(
        F.expr(f"l_orderkey div {_CD_FILE_ROWS}").alias("f_ins"),
        F.expr(
            "datediff(to_date(l_shipdate), DATE '1992-01-01')"
        ).alias("d"),
    )
    layouts = li.select(
        F.lit("date_clustered").alias("layout"),
        F.expr(f"d div {_CD_DAYS_PER_FILE}").alias("file_id"),
        "d",
    ).unionAll(li.select(F.lit("insert_order"), F.col("f_ins"), F.col("d")))
    zones = layouts.groupBy("layout", "file_id").agg(
        F.min("d").alias("zmin"), F.max("d").alias("zmax")
    )
    deltas = zones.select(
        "layout", F.col("zmin").alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        zones.select("layout", (F.col("zmax") + 1).alias("d"), F.lit(-1))
    )
    daily = with_range_bucket(
        deltas.groupBy("layout", "d").agg(F.sum("delta").alias("net")),
        "d",
        16,
    )
    carry = lower_bucket_agg(
        daily.groupBy("layout", "__bkt").agg(F.sum("net").alias("__btot")),
        "__bkt",
        "__btot",
        "__carry",
        partition_cols=["layout"],
    )
    curve = daily.join(carry, ["layout", "__bkt"]).withColumn(
        "depth",
        F.sum("net").over(
            Window.partitionBy("layout", "__bkt").orderBy("d")
        )
        + F.col("__carry"),
    )
    files = zones.groupBy("layout").agg(F.count(F.lit(1)).alias("nf"))
    return (
        curve.groupBy("layout")
        .agg(
            F.max("depth").cast("bigint").alias("max_depth"),
            F.expr(
                "count(CASE WHEN depth >= 2 THEN 1 END) * 1000000"
                " div count(CASE WHEN depth >= 1 THEN 1 END)"
            )
            .cast("bigint")
            .alias("overlapped_boundary_ppm"),
        )
        .join(F.broadcast(files), "layout")
        .select(
            "layout",
            F.col("nf").cast("bigint").alias("files_total"),
            "max_depth",
            "overlapped_boundary_ppm",
        )
        .orderBy("layout")
    )


@register(
    "stats_higher_moments",
    oracle="""
    WITH suff AS (
      SELECT l_returnflag AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(SUM(CAST(l_quantity AS HUGEINT)
                      * CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS s2,
             CAST(SUM(CAST(l_quantity AS HUGEINT)
                      * CAST(l_quantity AS HUGEINT)
                      * CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS s3,
             CAST(SUM(CAST(l_quantity AS HUGEINT)
                      * CAST(l_quantity AS HUGEINT)
                      * CAST(l_quantity AS HUGEINT)
                      * CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    d AS (
      SELECT grp, n,
             CAST(s1 AS BIGINT) AS s1_out,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM suff
    ),
    c AS (
      SELECT grp, n, s1_out, m,
             r2 - m * m AS m2,
             r3 - 3.0 * m * r2 + 2.0 * m * m * m AS m3,
             r4 - 4.0 * m * r3 + 6.0 * m * m * r2
                - 3.0 * m * m * m * m AS m4
      FROM d
    )
    SELECT grp, n, s1_out AS sum_x,
           round(m, 6) AS mean,
           round(m2, 6) AS variance_pop,
           round(m3 / (sqrt(m2) * m2), 6) AS skewness,
           round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM c ORDER BY grp
    """,
    tags=("stats", "moments", "profiling", "A-family"),
)
def stats_higher_moments(spark, sf_dir):
    """SKEWNESS and EXCESS KURTOSIS per group from exact integer power
    sums — the one-pass distributed higher-moment shape (the same
    mergeable-suffstats discipline as stats_ols_by_brand, two moments
    further): one groupBy collects (n, Σx, Σx², Σx³, Σx⁴) with
    map-side combine, central moments and the standardized statistics
    are pure arithmetic on five columns.  The power sums accumulate in
    DECIMAL(38,0)/HUGEINT — Σx⁴ overflows int64 long before 100 TB
    (the round-3 overflow-cliff class, pre-empted) — and are exactly
    representable as doubles at tested SFs, after which both engines
    apply IDENTICAL IEEE trees (raw moments first, then the central-
    moment polynomial, then the ratios), so round(·, 6) agrees
    bit-for-bit.  Skew/kurtosis are what a data profiler stores to
    pick between histogram shapes and to flag heavy-tailed columns
    before a z-score monitor is trusted."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(38,0)")
    suff = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("s1"),
        F.sum(x * x).cast("decimal(38,0)").alias("s2"),
        F.sum(x * x * x).cast("decimal(38,0)").alias("s3"),
        F.sum(x * x * x * x).cast("decimal(38,0)").alias("s4"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    d = suff.select(
        "grp",
        "n",
        F.col("s1").cast("bigint").alias("sum_x"),
        m.alias("m"),
        r2.alias("r2"),
        r3.alias("r3"),
        r4.alias("r4"),
    )
    m_, r2_, r3_, r4_ = F.col("m"), F.col("r2"), F.col("r3"), F.col("r4")
    c = d.select(
        "grp",
        "n",
        "sum_x",
        m_.alias("m"),
        (r2_ - m_ * m_).alias("m2"),
        (r3_ - F.lit(3.0) * m_ * r2_ + F.lit(2.0) * m_ * m_ * m_).alias("m3"),
        (
            r4_
            - F.lit(4.0) * m_ * r3_
            + F.lit(6.0) * m_ * m_ * r2_
            - F.lit(3.0) * m_ * m_ * m_ * m_
        ).alias("m4"),
    )
    m2_, m3_, m4_ = F.col("m2"), F.col("m3"), F.col("m4")
    return c.select(
        "grp",
        "n",
        "sum_x",
        F.round(F.col("m"), 6).alias("mean"),
        F.round(m2_, 6).alias("variance_pop"),
        F.round(m3_ / (F.sqrt(m2_) * m2_), 6).alias("skewness"),
        F.round(m4_ / (m2_ * m2_) - F.lit(3.0), 6).alias("excess_kurtosis"),
    ).orderBy("grp")


#: cumulative Poisson(1) CDF thresholds in millionths — the inverse-CDF
#: table that turns an md5-uniform into a deterministic Poisson weight
#: (k=0..5, capped at 6; P(k>6) < 1e-4 adds negligible mass)
_BOOT_CDF_PPM = (367879, 735759, 919699, 981012, 996340, 999406)
_BOOT_B = 16  # bootstrap replicates


def _boot_weight_sql(key_expr: str, b: int) -> str:
    """SQL for the replicate-b Poisson(1) weight of a row — identical
    text in both engines: md5 of (key | b) -> uniform millionths ->
    inverse CDF."""
    u = (
        f"CAST(conv(substring(md5(concat(CAST({key_expr} AS STRING), "
        f"'|{b}')), 1, 6), 16, 10) AS BIGINT) % 1000000"
    )
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF_PPM)
    )
    return f"CASE {cases} ELSE 6 END"


def _boot_weight_duck(key_expr: str, b: int) -> str:
    u = (
        f"CAST(from_hex(substring(md5(CAST({key_expr} AS VARCHAR) "
        f"|| '|{b}'), 1, 6)) AS BIGINT)"
    )
    # DuckDB lacks conv(); from_hex gives a 3-byte blob -> cast path
    # differs, so derive the integer via a portable hex walk instead
    u = (
        "("
        + " + ".join(
            f"CASE substring(md5(CAST({key_expr} AS VARCHAR) || '|{b}'), {i + 1}, 1) "
            + " ".join(
                f"WHEN '{d}' THEN {int(d, 16) * 16 ** (5 - i)}"
                for d in "0123456789abcdef"
            )
            + " END"
            for i in range(6)
        )
        + ") % 1000000"
    )
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF_PPM)
    )
    return f"CASE {cases} ELSE 6 END"


@register(
    "stats_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             {", ".join(
                 f"CAST(SUM(({_boot_weight_duck('k', b)}) * x) AS BIGINT)"
                 f" AS wx{b}, "
                 f"CAST(SUM({_boot_weight_duck('k', b)}) AS BIGINT) AS w{b}"
                 for b in range(_BOOT_B)
             )}
      FROM base
    ),
    reps AS (
      SELECT n, sx,
             {", ".join(
                 f"CAST(wx{b} AS DOUBLE) / CAST(w{b} AS DOUBLE) AS m{b}"
                 for b in range(_BOOT_B)
             )}
      FROM agg
    )
    SELECT n,
           round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS point_mean,
           round(least({", ".join(f"m{b}" for b in range(_BOOT_B))}), 6)
             AS boot_lo,
           round(greatest({", ".join(f"m{b}" for b in range(_BOOT_B))}), 6)
             AS boot_hi,
           round(({" + ".join(f"m{b}" for b in range(_BOOT_B))})
                 / {_BOOT_B}.0, 6) AS boot_mean
    FROM reps
    """,
    tags=("stats", "bootstrap", "resampling", "A-family"),
)
def stats_bootstrap_ci(spark, sf_dir):
    """DETERMINISTIC POISSON BOOTSTRAP — resampling uncertainty for
    the mean with no randomness anywhere: each of 16 replicates draws
    every row's multiplicity from Poisson(1) via inverse-CDF over an
    md5-uniform of (row key | replicate id) — the Poisson bootstrap
    (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams", Google TR 2012 — public) that makes bootstrap feasible
    in ONE distributed pass: no per-replicate reshuffle, no resampled
    copies, just 2·B extra aggregate columns riding the same scan
    (Σw·x and Σw per replicate; the CDF thresholds are exact
    millionth-integer constants, so weights are engine-identical by
    md5 contract).  Replicate means and the [min, max] envelope are
    identical IEEE trees both sides.  The same md5-derived
    reproducibility discipline as SRP planes / PQ codebooks: the
    OPERATOR is exercised, not a random fixture."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("x"),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
    ]
    for b in range(_BOOT_B):
        w = F.expr(_boot_weight_sql("k", b))
        aggs.append(F.sum(w * F.col("x")).cast("bigint").alias(f"wx{b}"))
        aggs.append(F.sum(w).cast("bigint").alias(f"w{b}"))
    agg = base.agg(*aggs)
    reps = agg.select(
        "n",
        "sx",
        *[
            (F.col(f"wx{b}").cast("double") / F.col(f"w{b}").cast("double")).alias(
                f"m{b}"
            )
            for b in range(_BOOT_B)
        ],
    )
    ms = [F.col(f"m{b}") for b in range(_BOOT_B)]
    total = ms[0]
    for m in ms[1:]:
        total = total + m
    return reps.select(
        "n",
        F.round(F.col("sx").cast("double") / F.col("n").cast("double"), 6).alias(
            "point_mean"
        ),
        F.round(F.least(*ms), 6).alias("boot_lo"),
        F.round(F.greatest(*ms), 6).alias("boot_hi"),
        F.round(total / float(_BOOT_B), 6).alias("boot_mean"),
    )
