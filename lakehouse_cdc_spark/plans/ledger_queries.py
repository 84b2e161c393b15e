"""Declared queries over the sink's TRANSACTION LEDGER and the
snapshot-expiry SAFETY analysis (round 7).

The reference keeps exactly-once bookkeeping in a ``processed_batches``
Postgres table (src/processor/spark_exactly_once.py) that nothing can
query after the fact; here the ledger is reconstructed from the sink's
immutable manifests (``ledger_table``) and joined with per-snapshot
visible row counts, so "did batch N land exactly once, and what did it
change?" is a DataFrame query.  The expiry-safety report is the
operational dual of ``changes_between``'s expired-base refusal: a dry
run of ``expire_snapshots`` that names, BEFORE anything is deleted,
which snapshots die and which time-travel / CDF capabilities go with
them.

Demo algebra (same modulus scheme as plans/cdf_queries.py, over
``orders``): b0 inserts keys ``% 3 = 0``; b1 updates ``% 6 = 0``
(+100000 cents) and inserts ``% 3 = 1 AND % 5 = 0``; b1 is then
REPLAYED under the same batch id (a consumer crash between sink commit
and checkpoint ack) and must be skipped; b2 deletes ``% 9 = 0``; a
``rebucket(4)`` maintenance commit follows (advances the snapshot,
carries batch id 2).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.cdf_queries import _demo_batches
from lakehouse_cdc_spark.plans.registry import register

_LEDGER_CACHE: dict[str, object] = {}


def _ledger_demo_sink(spark, sf_dir):
    """Three data commits + one replayed batch (skipped) + one
    rebucket maintenance commit — cached per sf_dir."""
    from lakehouse_cdc_spark.streaming import SnapshotUpsertSink

    sink = _LEDGER_CACHE.get(sf_dir)
    if sink is not None and sink.committed_snapshot() == 3:
        return sink
    sink = SnapshotUpsertSink(
        tempfile.mkdtemp(prefix="ledger_demo_"),
        keys=["k"],
        order_by=["seq"],
        n_buckets=8,
    )
    b0, b1, b2 = _demo_batches(spark, sf_dir)
    sink.process_batch(b0, 0)
    sink.process_batch(b1, 1)
    sink.process_batch(b1, 1)  # REPLAY: must be skipped, no snapshot
    sink.process_batch(b2, 2)
    assert sink.committed_snapshot() == 2  # replay left no trace
    sink.rebucket(spark, 4)  # maintenance commit → snapshot 3
    _LEDGER_CACHE[sf_dir] = sink
    return sink


_LEDGER_COUNTS = """
    SELECT
      CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 0) AS BIGINT) AS n0,
      CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 1
                              AND o_orderkey % 5 = 0) AS BIGINT) AS nins,
      CAST(COUNT(*) FILTER (WHERE o_orderkey % 9 = 0) AS BIGINT) AS ndel
    FROM orders
"""


@register(
    "ledger_exactly_once_replay",
    bench=True,
    oracle=f"""
    WITH c AS ({_LEDGER_COUNTS})
    SELECT * FROM (
      SELECT CAST(0 AS INTEGER) AS snapshot, CAST(0 AS BIGINT) AS batch_id,
             TRUE AS is_data_commit, n0 AS visible_rows FROM c
      UNION ALL
      SELECT 1, 1, TRUE, n0 + nins FROM c
      UNION ALL
      SELECT 2, 2, TRUE, n0 + nins - ndel FROM c
      UNION ALL
      SELECT 3, 2, FALSE, n0 + nins - ndel FROM c
    ) ORDER BY snapshot
    """,
    tags=("cdc", "ledger", "exactly-once", "audit", "S12", "T3"),
)
def ledger_exactly_once_replay(spark, sf_dir):
    """The EXACTLY-ONCE LEDGER as a query: the demo sink takes three
    data batches, a REPLAY of batch 1 (skipped by the lineage+batch
    guard — the reference's processed_batches check,
    spark_exactly_once.py, done against the sink's own manifests), and
    a rebucket maintenance commit.  The declared result reads
    ``ledger_table`` (one row per committed snapshot: batch id,
    data-vs-maintenance classification) joined with each snapshot's
    visible row count via time travel.  The oracle derives the same
    ledger from the declared batch algebra: the replayed batch appears
    ZERO times (4 process_batch calls, 3 data commits), the
    maintenance commit carries batch id 2 with is_data_commit =
    FALSE, and every snapshot's row count matches — replay economics,
    auditable after the fact."""
    sink = _ledger_demo_sink(spark, sf_dir)
    ledger = sink.ledger_table(spark).select(
        "snapshot", "batch_id", "is_data_commit"
    )
    counts = None
    for s in range(4):
        c = (
            sink.state_at(spark, s)
            .filter(F.col("operation") != "d")
            .select(F.lit(s).cast("int").alias("snapshot"))
        )
        counts = c if counts is None else counts.unionByName(c)
    counts = counts.groupBy("snapshot").agg(
        F.count(F.lit(1)).cast("bigint").alias("visible_rows")
    )
    return ledger.join(counts, on="snapshot", how="left").orderBy("snapshot")


_EVO_CACHE: dict[str, object] = {}


def _schema_evo_sink(spark, sf_dir):
    """A sink whose batch 1 ADDS a column (``flag``) — schema
    evolution mid-stream, the Iceberg add-column shape.  Cached per
    sf_dir."""
    from lakehouse_cdc_spark.streaming import SnapshotUpsertSink

    sink = _EVO_CACHE.get(sf_dir)
    if sink is not None and sink.committed_snapshot() == 2:
        return sink
    sink = SnapshotUpsertSink(
        tempfile.mkdtemp(prefix="schema_evo_"),
        keys=["k"],
        order_by=["seq"],
        n_buckets=4,
    )
    b0, b1, b2 = _demo_batches(spark, sf_dir)
    sink.process_batch(b0, 0)
    sink.process_batch(b1.withColumn("flag", F.lit(1).cast("bigint")), 1)
    sink.process_batch(b2, 2)  # b2 has no flag column: stays NULL
    _EVO_CACHE[sf_dir] = sink
    return sink


@register(
    "source_schema_evolution",
    oracle=f"""
    WITH c AS ({{counts}})
    SELECT * FROM (
      SELECT 'flag' AS field, 'bigint' AS dtype, 1 AS first_snapshot,
             nupd_live + nins AS non_null_rows FROM c
      UNION ALL
      SELECT 'grp', 'string', 0, n_visible FROM c
      UNION ALL
      SELECT 'k', 'bigint', 0, n_visible FROM c
      UNION ALL
      SELECT 'val_cents', 'bigint', 0, n_visible FROM c
    ) ORDER BY field
    """.format(
        counts="""
      SELECT
        CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 0
                                AND o_orderkey % 9 <> 0)
             + COUNT(*) FILTER (WHERE o_orderkey % 3 = 1
                                  AND o_orderkey % 5 = 0) AS BIGINT)
          AS n_visible,
        CAST(COUNT(*) FILTER (WHERE o_orderkey % 6 = 0
                                AND o_orderkey % 9 <> 0) AS BIGINT)
          AS nupd_live,
        CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 1
                                AND o_orderkey % 5 = 0) AS BIGINT) AS nins
      FROM orders
    """
    ),
    tags=("cdc", "schema-evolution", "S12", "audit"),
)
def source_schema_evolution(spark, sf_dir):
    """SCHEMA EVOLUTION audit: batch 1 adds a ``flag`` column
    mid-stream; the sink's manifest-tracked union schema widens
    (pipeline.py:_union_schema_json — buckets evolve independently,
    the state schema is the union, footer-only cost; Spark's own
    mergeSchema cannot merge this with later int32/int64 drift, which
    is why the sink tracks it).  The declared result reports, per
    final-state column: its resolved dtype, the first snapshot whose
    batch carried it, and the LIVE non-null row count — old rows read
    NULL for the added column, deleted flag-carriers drop out.  The
    oracle re-derives all of it from the declared batch algebra; a
    hash match proves evolution changed no pre-existing value."""
    sink = _schema_evo_sink(spark, sf_dir)
    t = sink.current_table(spark)
    data_cols = [c for c in t.columns if c not in ("operation", "seq")]
    dtypes = dict(t.dtypes)
    first = {c: (1 if c == "flag" else 0) for c in data_cols}
    meta = spark.createDataFrame(
        [(c, dtypes[c], first[c]) for c in data_cols],
        "field string, dtype string, first_snapshot int",
    )
    counts = t.select(
        *[
            F.count(F.col(c)).cast("bigint").alias(c)
            for c in data_cols
        ]
    )
    long = counts.selectExpr(
        "stack({n}, {args}) AS (field, non_null_rows)".format(
            n=len(data_cols),
            args=", ".join(f"'{c}', {c}" for c in data_cols),
        )
    )
    return meta.join(long, on="field").orderBy("field")


_XSINK_CACHE: dict[str, object] = {}


def _dual_store_sinks(spark, sf_dir):
    """Two sinks fed from the SAME batch stream — the reference's
    dual-store shape (Iceberg table + Postgres validation shadow,
    src/validation/validation.py) — with a simulated CRASH between the
    two stores on batch 1: it lands on ``fact``, the process dies
    before ``shadow``, and recovery REPLAYS batch 1 into both (the
    fact-side replay is skipped by the ledger guard, the shadow-side
    completes).  Cached per sf_dir."""
    from lakehouse_cdc_spark.streaming import SnapshotUpsertSink

    cached = _XSINK_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    fact = SnapshotUpsertSink(
        tempfile.mkdtemp(prefix="xledger_fact_"),
        keys=["k"],
        order_by=["seq"],
        n_buckets=8,
    )
    shadow = SnapshotUpsertSink(
        tempfile.mkdtemp(prefix="xledger_shadow_"),
        keys=["k"],
        order_by=["seq"],
        n_buckets=4,
    )
    b0, b1, b2 = _demo_batches(spark, sf_dir)
    fact.process_batch(b0, 0)
    shadow.process_batch(b0, 0)
    fact.process_batch(b1, 1)
    # -- crash here: shadow never saw batch 1 --
    # recovery replays the whole batch into BOTH stores:
    fact.process_batch(b1, 1)  # skipped (already committed)
    shadow.process_batch(b1, 1)  # completes the torn batch
    fact.process_batch(b2, 2)
    shadow.process_batch(b2, 2)
    _XSINK_CACHE[sf_dir] = (fact, shadow)
    return fact, shadow


@register(
    "ledger_cross_sink_alignment",
    oracle=f"""
    WITH c AS ({_LEDGER_COUNTS}),
    u AS (SELECT CAST(COUNT(*) FILTER (WHERE o_orderkey % 6 = 0) AS BIGINT)
                 AS nupd FROM orders)
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS batch_id, CAST(0 AS INTEGER) AS fact_snapshot,
             CAST(0 AS INTEGER) AS shadow_snapshot, TRUE AS landed_both,
             n0 AS rows_changed FROM c
      UNION ALL
      SELECT 1, 1, 1, TRUE, nupd + nins FROM c, u
      UNION ALL
      SELECT 2, 2, 2, TRUE, ndel FROM c
    ) ORDER BY batch_id
    """,
    tags=("cdc", "ledger", "exactly-once", "audit", "dual-store", "T3"),
)
def ledger_cross_sink_alignment(spark, sf_dir):
    """CROSS-SINK exactly-once audit: two stores fed from one batch
    stream (the reference's Iceberg-table + Postgres-shadow sync),
    with a simulated crash that tears batch 1 across them; recovery
    blind-replays the batch into both — the already-landed side skips
    it (ledger guard), the torn side completes it.  The declared
    result full-outer joins both stores' data-commit ledgers on batch
    id: every batch must appear on BOTH (``landed_both``) exactly
    once, with the fact feed's change-row count per batch.  The oracle
    re-derives the aligned ledger from the declared algebra — a hash
    match proves the dual-store replay protocol converges with no
    torn or doubled batch.  (An actually-torn pair would surface as
    landed_both = FALSE — the alerting row an operator queries for.)"""
    fact, shadow = _dual_store_sinks(spark, sf_dir)
    fl = (
        fact.ledger_table(spark)
        .filter(F.col("is_data_commit"))
        .select("batch_id", F.col("snapshot").alias("fact_snapshot"))
    )
    sl = (
        shadow.ledger_table(spark)
        .filter(F.col("is_data_commit"))
        .select("batch_id", F.col("snapshot").alias("shadow_snapshot"))
    )
    changed = None
    for s in range(3):
        c = fact.changes_between(spark, s - 1, s).select(
            F.lit(s).cast("bigint").alias("batch_id")
        )
        changed = c if changed is None else changed.unionByName(c)
    changed = changed.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_changed")
    )
    return (
        fl.join(sl, on="batch_id", how="full_outer")
        .select(
            "batch_id",
            "fact_snapshot",
            "shadow_snapshot",
            (
                F.col("fact_snapshot").isNotNull()
                & F.col("shadow_snapshot").isNotNull()
            ).alias("landed_both"),
        )
        .join(changed, on="batch_id", how="left")
        .orderBy("batch_id")
    )


@register(
    "maintenance_expiry_safety",
    oracle=f"""
    WITH c AS ({_LEDGER_COUNTS})
    SELECT * FROM (
      SELECT CAST(0 AS INTEGER) AS snapshot, TRUE AS would_expire,
             FALSE AS cdf_base_usable_after,
             n0 AS rows_lost FROM c
      UNION ALL
      SELECT 1, TRUE, FALSE, n0 + nins FROM c
      UNION ALL
      SELECT 2, TRUE, FALSE, n0 + nins - ndel FROM c
      UNION ALL
      SELECT 3, FALSE, TRUE, CAST(0 AS BIGINT) FROM c
    ) ORDER BY snapshot
    """,
    tags=("maintenance", "expiry", "time-travel", "cdf", "M2", "S12"),
)
def maintenance_expiry_safety(spark, sf_dir):
    """SNAPSHOT-EXPIRY SAFETY REPORT (dry run): before running
    ``expire_snapshots(retain_last=1)`` on the post-rebucket demo
    sink, report per snapshot whether it would expire, whether it
    remains usable as a change-feed base afterwards, and how many
    visible rows of time-travel state die with it (``rows_lost`` = the
    snapshot's visible row count when expiring, else 0).  After a
    rebucket the committed manifest references only its own full
    rewrite, so retain_last=1 expires everything older — exactly the
    history a lagging FeedCursor/stream offset might still need; the
    report is the check a deployment runs BEFORE expiry instead of
    discovering the refusal at read time.  The oracle re-derives the
    report from the declared batch algebra (maintenance.py:
    expiry_safety; the engine-vs-engine reference-retention case —
    where shared bucket files keep old snapshots alive past
    retain_last — is pytest-covered in tests/test_ledger.py)."""
    from lakehouse_cdc_spark.maintenance import expiry_safety

    sink = _ledger_demo_sink(spark, sf_dir)
    report = expiry_safety(sink.target_dir, retain_last=1)
    rep = spark.createDataFrame(
        [
            (r["snapshot"], r["would_expire"], r["cdf_base_usable_after"])
            for r in report
        ],
        "snapshot int, would_expire boolean, cdf_base_usable_after boolean",
    )
    counts = None
    for s in range(4):
        c = (
            sink.state_at(spark, s)
            .filter(F.col("operation") != "d")
            .select(F.lit(s).cast("int").alias("snapshot"))
        )
        counts = c if counts is None else counts.unionByName(c)
    counts = counts.groupBy("snapshot").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    return (
        rep.join(counts, on="snapshot", how="left")
        .select(
            "snapshot",
            "would_expire",
            "cdf_base_usable_after",
            F.when(F.col("would_expire"), F.col("n_rows"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("rows_lost"),
        )
        .orderBy("snapshot")
    )
