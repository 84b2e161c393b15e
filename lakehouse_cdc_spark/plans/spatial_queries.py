"""Spatial declared queries: grid-bucketed proximity join.

The testdata has no geo columns, so coordinates are DERIVED
deterministically (md5 of the key, fixed-point integers on a 1M x 1M
planar grid — the same engine-reproducibility trick the SRP planes and
PQ codebook use).  What is being exercised is the OPERATOR, not the
fixture: the grid-cell spatial join is how every distributed engine
(Sedona, BigQuery GIS, PostGIS parallel plans) scales "find pairs
within distance r" —

1. bucket each point into an r-sized grid cell,
2. replicate each LEFT point into its 3x3 cell neighborhood
   (a bounded x9 map-side explode),
3. equi-join on the cell key — candidates are provably a superset of
   all true pairs, because two points within L-inf distance r cannot
   sit more than one cell apart,
4. exact distance filter on the candidates.

Cost is |points| x 9 shuffle rows plus per-cell products — O(N)
for bounded density — versus the O(N^2) cross join the naive form
plans.  L-inf (Chebyshev) distance keeps every comparison exact
integer; a haversine variant changes only step 4's filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table

_GRID = 1_000_000  # coordinate space per axis
_RADIUS = 20_000  # proximity threshold (2% of the axis)

_XY_SPARK = (
    "CAST(conv(substring(md5(concat('{tag}x', CAST({key} AS STRING))), 1, 15), "
    f"16, 10) AS BIGINT) % {_GRID}",
    "CAST(conv(substring(md5(concat('{tag}y', CAST({key} AS STRING))), 1, 15), "
    f"16, 10) AS BIGINT) % {_GRID}",
)
_XY_DUCK = (
    "CAST('0x' || substr(md5('{tag}x' || CAST({key} AS VARCHAR)), 1, 15) "
    f"AS BIGINT) % {_GRID}",
    "CAST('0x' || substr(md5('{tag}y' || CAST({key} AS VARCHAR)), 1, 15) "
    f"AS BIGINT) % {_GRID}",
)


@register(
    "spatial_grid_join",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey AS ck,
             {_XY_DUCK[0].format(tag='c', key='c_custkey')} AS x,
             {_XY_DUCK[1].format(tag='c', key='c_custkey')} AS y
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey AS sk,
             {_XY_DUCK[0].format(tag='s', key='s_suppkey')} AS x,
             {_XY_DUCK[1].format(tag='s', key='s_suppkey')} AS y
      FROM supplier
    ),
    -- replicate customers into the 3x3 neighborhood of their cell
    cgrid AS (
      SELECT ck, x, y,
             (x // {_RADIUS}) + dx.dx AS gx,
             (y // {_RADIUS}) + dy.dy AS gy
      FROM cust, range(-1, 2) dx(dx), range(-1, 2) dy(dy)
    ),
    sgrid AS (
      SELECT sk, x, y, x // {_RADIUS} AS gx, y // {_RADIUS} AS gy FROM supp
    ),
    pairs AS (
      SELECT c.ck, s.sk,
             GREATEST(abs(c.x - s.x), abs(c.y - s.y)) AS dist_linf
      FROM cgrid c JOIN sgrid s ON c.gx = s.gx AND c.gy = s.gy
      WHERE GREATEST(abs(c.x - s.x), abs(c.y - s.y)) <= {_RADIUS}
    )
    SELECT ck AS custkey, sk AS suppkey, dist_linf
    FROM pairs
    ORDER BY custkey, suppkey
    """,
    tags=("spatial", "grid", "proximity-join", "J-scale"),
)
def spatial_grid_join(spark, sf_dir):
    """Grid-bucketed spatial proximity join: every customer paired
    with every supplier within L-inf distance r on the derived planar
    grid.  Left points replicate into their 3x3 cell neighborhood
    (bounded x9 explode), the join is a plain equi-join on the cell
    key, and the exact integer distance filter runs only on
    co-celled candidates — the standard distributed-GIS plan that
    replaces the O(N x M) cross join with |N|x9 shuffle rows.  The
    3x3 superset property is exact: two points within r cannot be
    more than one r-cell apart on either axis.  All coordinates and
    distances are md5-derived integers, so the emitted pair set is
    bit-identical in the oracle."""
    cx = F.expr(_XY_SPARK[0].format(tag="c", key="c_custkey"))
    cy = F.expr(_XY_SPARK[1].format(tag="c", key="c_custkey"))
    sx = F.expr(_XY_SPARK[0].format(tag="s", key="s_suppkey"))
    sy = F.expr(_XY_SPARK[1].format(tag="s", key="s_suppkey"))
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), cx.alias("x"), cy.alias("y")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), sx.alias("x"), sy.alias("y")
    )
    offsets = F.explode(
        F.array(*[F.lit(d) for d in (-1, 0, 1)])
    )
    cgrid = (
        cust.select("ck", "x", "y", offsets.alias("dx"))
        .select("ck", "x", "y", "dx", offsets.alias("dy"))
        .select(
            "ck",
            "x",
            "y",
            (F.expr(f"x div {_RADIUS}") + F.col("dx")).alias("gx"),
            (F.expr(f"y div {_RADIUS}") + F.col("dy")).alias("gy"),
        )
    )
    sgrid = supp.select(
        "sk",
        F.col("x").alias("sx_"),
        F.col("y").alias("sy_"),
        F.expr(f"x div {_RADIUS}").alias("gx"),
        F.expr(f"y div {_RADIUS}").alias("gy"),
    )
    dist = F.greatest(
        F.abs(F.col("x") - F.col("sx_")), F.abs(F.col("y") - F.col("sy_"))
    )
    return (
        cgrid.join(sgrid, ["gx", "gy"])
        .withColumn("dist_linf", dist)
        .filter(F.col("dist_linf") <= _RADIUS)
        .select(
            F.col("ck").alias("custkey"),
            F.col("sk").alias("suppkey"),
            "dist_linf",
        )
        .orderBy("custkey", "suppkey")
    )


_DB_MIN_PTS = 4  # neighbors (excluding self) within r that make a core


@register(
    "spatial_dbscan_cores",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             {_XY_DUCK[0].format(tag='c', key='c_custkey')} AS x,
             {_XY_DUCK[1].format(tag='c', key='c_custkey')} AS y
      FROM customer
    ),
    agrid AS (
      SELECT k, x, y,
             (x // {_RADIUS}) + dx.dx AS gx,
             (y // {_RADIUS}) + dy.dy AS gy
      FROM pts, range(-1, 2) dx(dx), range(-1, 2) dy(dy)
    ),
    bgrid AS (
      SELECT k, x, y, x // {_RADIUS} AS gx, y // {_RADIUS} AS gy FROM pts
    ),
    neigh AS (
      SELECT a.k, CAST(COUNT(*) AS BIGINT) AS n_neighbors
      FROM agrid a JOIN bgrid b ON a.gx = b.gx AND a.gy = b.gy
      WHERE a.k <> b.k
        AND GREATEST(abs(a.x - b.x), abs(a.y - b.y)) <= {_RADIUS}
      GROUP BY a.k
    ),
    labeled AS (
      SELECT p.k, COALESCE(n.n_neighbors, 0) AS n_neighbors,
             COALESCE(n.n_neighbors, 0) >= {_DB_MIN_PTS} AS is_core
      FROM pts p LEFT JOIN neigh n ON p.k = n.k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) FILTER (WHERE is_core) AS BIGINT) AS n_core,
           CAST(COUNT(*) FILTER (WHERE n_neighbors = 0) AS BIGINT) AS n_isolated,
           CAST(MAX(n_neighbors) AS BIGINT) AS max_neighbors,
           CAST(SUM(n_neighbors) AS BIGINT) AS total_neighbor_links
    FROM labeled
    """,
    tags=("spatial", "dbscan", "density", "clustering"),
)
def spatial_dbscan_cores(spark, sf_dir):
    """The density step of DBSCAN: a point is CORE when at least
    minPts other points sit within distance r — computed with the
    same 3x3 grid replication as spatial_grid_join, but as a
    SELF-join (each point's neighborhood count is one grouped
    aggregate over co-celled candidates).  Core identification is the
    expensive, shuffling part of DBSCAN; the subsequent cluster
    expansion is connected components over core-core edges, which
    operators/graph.py already provides — so this query plus CC IS
    distributed DBSCAN.  Emits the density profile (cores, isolated
    points, the hottest neighborhood) as exact integers."""
    cx = F.expr(_XY_SPARK[0].format(tag="c", key="c_custkey"))
    cy = F.expr(_XY_SPARK[1].format(tag="c", key="c_custkey"))
    pts = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), cx.alias("x"), cy.alias("y")
    )
    offsets = F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
    agrid = (
        pts.select("k", "x", "y", offsets.alias("dx"))
        .select("k", "x", "y", "dx", offsets.alias("dy"))
        .select(
            "k",
            "x",
            "y",
            (F.expr(f"x div {_RADIUS}") + F.col("dx")).alias("gx"),
            (F.expr(f"y div {_RADIUS}") + F.col("dy")).alias("gy"),
        )
    )
    bgrid = pts.select(
        F.col("k").alias("bk"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.expr(f"x div {_RADIUS}").alias("gx"),
        F.expr(f"y div {_RADIUS}").alias("gy"),
    )
    neigh = (
        agrid.join(bgrid, ["gx", "gy"])
        .filter(
            (F.col("k") != F.col("bk"))
            & (
                F.greatest(
                    F.abs(F.col("x") - F.col("bx")),
                    F.abs(F.col("y") - F.col("by")),
                )
                <= _RADIUS
            )
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    labeled = pts.join(neigh, "k", "left").select(
        F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors")
    )
    return labeled.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count(F.when(F.col("n_neighbors") >= _DB_MIN_PTS, 1)).alias("n_core"),
        F.count(F.when(F.col("n_neighbors") == 0, 1)).alias("n_isolated"),
        F.max("n_neighbors").cast("bigint").alias("max_neighbors"),
        F.sum("n_neighbors").cast("bigint").alias("total_neighbor_links"),
    )


@register(
    "spatial_nearest_in_radius",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey AS ck,
             {_XY_DUCK[0].format(tag='c', key='c_custkey')} AS x,
             {_XY_DUCK[1].format(tag='c', key='c_custkey')} AS y
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey AS sk,
             {_XY_DUCK[0].format(tag='s', key='s_suppkey')} AS x,
             {_XY_DUCK[1].format(tag='s', key='s_suppkey')} AS y
      FROM supplier
    ),
    cgrid AS (
      SELECT ck, x, y,
             (x // {_RADIUS}) + dx.dx AS gx,
             (y // {_RADIUS}) + dy.dy AS gy
      FROM cust, range(-1, 2) dx(dx), range(-1, 2) dy(dy)
    ),
    sgrid AS (
      SELECT sk, x, y, x // {_RADIUS} AS gx, y // {_RADIUS} AS gy FROM supp
    ),
    cand AS (
      SELECT c.ck, s.sk,
             GREATEST(abs(c.x - s.x), abs(c.y - s.y)) AS d
      FROM cgrid c JOIN sgrid s ON c.gx = s.gx AND c.gy = s.gy
      WHERE GREATEST(abs(c.x - s.x), abs(c.y - s.y)) <= {_RADIUS}
    )
    SELECT ck AS custkey, sk AS nearest_suppkey, d AS dist_linf
    FROM (
      SELECT ck, sk, d,
             ROW_NUMBER() OVER (PARTITION BY ck ORDER BY d, sk) AS rn
      FROM cand
    ) WHERE rn = 1
    ORDER BY custkey
    """,
    tags=("spatial", "knn", "nearest", "W1"),
)
def spatial_nearest_in_radius(spark, sf_dir):
    """Nearest-neighbor-within-radius (\"closest depot within range\"):
    for every customer with at least one supplier inside r, the single
    closest one — grid candidates from spatial_grid_join's 3x3
    replication, resolved by a per-customer argmin window with a total
    order (distance, then key).  The radius bound is what keeps this
    exact AND bounded: within r the 3x3 superset is provably complete,
    so no expanding-ring search is needed; customers with nothing in
    range are correctly absent (the business answer is \"none in
    range\", not a far-away fallback).  All integer distances —
    bit-identical pick in the oracle."""
    from pyspark.sql import Window

    cx = F.expr(_XY_SPARK[0].format(tag="c", key="c_custkey"))
    cy = F.expr(_XY_SPARK[1].format(tag="c", key="c_custkey"))
    sx = F.expr(_XY_SPARK[0].format(tag="s", key="s_suppkey"))
    sy = F.expr(_XY_SPARK[1].format(tag="s", key="s_suppkey"))
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), cx.alias("x"), cy.alias("y")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), sx.alias("sx_"), sy.alias("sy_")
    )
    offsets = F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)]))
    cgrid = (
        cust.select("ck", "x", "y", offsets.alias("dx"))
        .select("ck", "x", "y", "dx", offsets.alias("dy"))
        .select(
            "ck",
            "x",
            "y",
            (F.expr(f"x div {_RADIUS}") + F.col("dx")).alias("gx"),
            (F.expr(f"y div {_RADIUS}") + F.col("dy")).alias("gy"),
        )
    )
    sgrid = supp.select(
        "sk",
        "sx_",
        "sy_",
        F.expr(f"sx_ div {_RADIUS}").alias("gx"),
        F.expr(f"sy_ div {_RADIUS}").alias("gy"),
    )
    dist = F.greatest(
        F.abs(F.col("x") - F.col("sx_")), F.abs(F.col("y") - F.col("sy_"))
    )
    cand = (
        cgrid.join(sgrid, ["gx", "gy"])
        .withColumn("d", dist)
        .filter(F.col("d") <= _RADIUS)
    )
    rn = F.row_number().over(Window.partitionBy("ck").orderBy("d", "sk"))
    return (
        cand.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            F.col("ck").alias("custkey"),
            F.col("sk").alias("nearest_suppkey"),
            F.col("d").alias("dist_linf"),
        )
        .orderBy("custkey")
    )
