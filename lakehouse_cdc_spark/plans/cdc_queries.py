"""CDC-semantics declared queries (SURVEY §1.4, §2.1, §2.9).

The `events` table stands in for the change stream (user_id = primary
key, ts = event time, event_id = offset).  Operation mapping used
throughout: ``signup → 'c'``, ``error → 'd'``, anything else → ``'u'``
— the c/u/d mix the reference's Locust workload produces
(src/locust/locustfile.py:43-138).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.cdc.apply import apply_changes, compact_changes
from lakehouse_cdc_spark.cdc.classify import classify_operation
from lakehouse_cdc_spark.cdc.decode import decode_debezium
from lakehouse_cdc_spark.plans.registry import (
    dsum,
    fixed_point,
    register,
    sql_dsum,
    table,
)

#: event_type → CDC operation (CASE expression, shared with oracles)
_OP_CASE_SQL = (
    "CASE WHEN event_type = 'error' THEN 'd' "
    "WHEN event_type = 'signup' THEN 'c' ELSE 'u' END"
)


def _op_col():
    return (
        F.when(F.col("event_type") == "error", F.lit("d"))
        .when(F.col("event_type") == "signup", F.lit("c"))
        .otherwise(F.lit("u"))
    )


@register(
    "flagship_cdc_compaction",
    oracle="""
    WITH latest AS (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT l.user_id, c.c_name,
           l.event_type AS last_event_type,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           CAST(l.value AS DOUBLE) AS last_value
    FROM latest l
    JOIN customer c ON l.user_id = c.c_custkey
    WHERE l.rn = 1
    """,
    bench=True,
    tags=("cdc", "W1", "J1", "flagship"),
)
def flagship_cdc_compaction(spark, sf_dir):
    """THE flagship: last-write-wins compaction of the change stream
    (W1, spark_batch.py:253-260) joined to a dimension — scan → window
    dedup → broadcast join in one plan.  The window shuffle partitions
    by key; the dimension is broadcast so compacted state never
    reshuffles."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    latest = compact_changes(e, keys=["user_id"], order_by=["ts", "event_id"])
    return latest.join(
        F.broadcast(c), latest.user_id == c.c_custkey
    ).select(
        "user_id",
        "c_name",
        F.col("event_type").alias("last_event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.col("value").cast("double").alias("last_value"),
    )


@register(
    "cdc_classify_operations",
    oracle=f"""
    SELECT {_OP_CASE_SQL} AS operation,
           COUNT(*) AS op_cnt,
           COUNT(DISTINCT user_id) AS distinct_keys
    FROM events
    GROUP BY 1
    """,
    tags=("cdc", "S4"),
)
def cdc_classify_operations(spark, sf_dir):
    """Operation classification (S4) over the change stream, columnar
    `when` chain instead of per-record Python (spark_batch.py:101-116)."""
    e = table(spark, sf_dir, "events").withColumn("operation", _op_col())
    return e.groupBy("operation").agg(
        F.count(F.lit(1)).alias("op_cnt"),
        F.countDistinct("user_id").alias("distinct_keys"),
    )


@register(
    "cdc_latest_state",
    oracle=f"""
    WITH latest AS (
      SELECT user_id, value, {_OP_CASE_SQL} AS operation,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, CAST(value AS DOUBLE) AS latest_value, operation
    FROM latest
    WHERE rn = 1 AND operation != 'd'
    """,
    tags=("cdc", "W1", "S9"),
)
def cdc_latest_state(spark, sf_dir):
    """Change stream applied to an empty base: compact to newest per
    key, drop keys whose final operation is a delete — the post-MERGE
    table state as a pure function of the stream."""
    e = table(spark, sf_dir, "events").withColumn("operation", _op_col())
    latest = compact_changes(e, keys=["user_id"], order_by=["ts", "event_id"])
    return latest.filter(F.col("operation") != "d").select(
        "user_id",
        F.col("value").cast("double").alias("latest_value"),
        "operation",
    )


@register(
    "cdc_apply_changes",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey AS user_id, c_acctbal AS balance
      FROM customer WHERE c_custkey >= 50
    ),
    latest AS (
      SELECT user_id, value, {_OP_CASE_SQL} AS operation,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    compacted AS (SELECT * FROM latest WHERE rn = 1)
    SELECT COALESCE(b.user_id, c.user_id) AS user_id,
           CAST(CASE WHEN c.operation IS NOT NULL THEN c.value
                     ELSE b.balance END AS DOUBLE) AS balance
    FROM base b
    FULL OUTER JOIN compacted c ON b.user_id = c.user_id
    WHERE c.operation IS NULL OR c.operation != 'd'
    """,
    bench=True,
    tags=("cdc", "S9", "J1", "merge"),
)
def cdc_apply_changes(spark, sf_dir):
    """The MERGE upsert itself (S9) in oracle-checkable form: base
    table ⟵ change batch with matched-update / matched-delete /
    unmatched-insert / unmatched-delete-dropped semantics, including
    the reference's insert-of-deletes bug fix (SURVEY §1.4).  Base is
    restricted to keys ≥ 50 so every MERGE arm fires (users < 50
    exercise the INSERT arm)."""
    base = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= 50)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    changes = (
        table(spark, sf_dir, "events")
        .withColumn("operation", _op_col())
        .select("user_id", F.col("value").alias("balance"), "operation", "ts", "event_id")
    )
    merged = apply_changes(
        base,
        changes,
        keys=["user_id"],
        order_by=["ts", "event_id"],
    )
    return merged.select("user_id", F.col("balance").cast("double").alias("balance"))


@register(
    "cdc_debezium_decode",
    oracle=f"""
    SELECT CASE WHEN event_type = 'error' THEN 'd'
                WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS operation,
           COUNT(*) AS msg_cnt,
           CAST(SUM(CAST(floor(value * 100) AS INT)) AS BIGINT) AS sum_price
    FROM events
    GROUP BY 1
    """,
    tags=("cdc", "S3", "S4", "F11"),
)
def cdc_debezium_decode(spark, sf_dir):
    """Debezium-envelope decode round-trip (S3): events are serialized
    into the exact envelope shape the connector emits
    ({"payload": {..., "__deleted": "true|false"}}, with null id for
    creates), poison messages are injected, and the engine's
    from_json decoder + classifier must recover the original stream —
    oracle = direct projection of the source."""
    e = table(spark, sf_dir, "events")
    envelope = e.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.when(F.col("event_type") == "signup", F.lit(None).cast("int"))
                    .otherwise(F.col("event_id").cast("int"))
                    .alias("id"),
                    F.col("event_type").alias("name"),
                    F.col("props").alias("description"),
                    F.floor(F.col("value") * 100).cast("int").alias("price"),
                    (F.col("event_type") == "purchase").alias("on_offer"),
                    F.when(F.col("event_type") == "error", F.lit("true"))
                    .otherwise(F.lit("false"))
                    .alias("__deleted"),
                ).alias("payload")
            )
        ).alias("value")
    )
    poison = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("empty",), ("{not json",), ('{"no_payload": 1}',)],
        "value string",
    )
    decoded = decode_debezium(envelope.unionByName(poison))
    classified = classify_operation(decoded, key_col="id", deleted_col="__deleted")
    return classified.groupBy("operation").agg(
        F.count(F.lit(1)).alias("msg_cnt"),
        F.sum("price").cast("bigint").alias("sum_price"),
    )


@register(
    "window_tumbling_daily",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS event_cnt,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "T7", "window"),
)
def window_tumbling_daily(spark, sf_dir):
    """Tumbling event-time window (T7's missing half: the reference is
    processing-time-only).  Same `window()` expression runs unchanged
    under readStream + withWatermark — tested in tests/test_streaming."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "event_cnt",
            "sum_value",
        )
    )


@register(
    "window_sliding_2d",
    oracle=f"""
    SELECT strftime(w_start, '%Y-%m-%d') AS win_start,
           event_type,
           COUNT(*) AS event_cnt,
           {sql_dsum('value', 'sum_value')}
    FROM (
      SELECT date_trunc('day', ts) - INTERVAL (k) DAY AS w_start,
             event_type, value
      FROM (SELECT ts, event_type, value,
                   unnest(generate_series(0, 1)) AS k
            FROM events)
    )
    GROUP BY 1, 2
    """,
    tags=("streaming", "T7", "window", "sliding"),
)
def window_sliding_2d(spark, sf_dir):
    """Sliding event-time window (2-day windows sliding daily): every
    event lands in exactly two windows.  Spark's window() emits the
    overlap natively; the oracle replays it by fanning each event to
    its two day-aligned window starts.  Same expression runs unchanged
    under readStream + withWatermark (streaming/windows.py
    sliding_window_agg)."""
    from lakehouse_cdc_spark.streaming.windows import sliding_window_agg

    e = table(spark, sf_dir, "events")
    return sliding_window_agg(
        e,
        duration="2 days",
        slide="1 day",
        group_cols=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("event_cnt"),
            dsum(F.col("value"), "sum_value"),
        ],
    ).select(
        F.date_format("w.start", "yyyy-MM-dd").alias("win_start"),
        "event_type",
        "event_cnt",
        "sum_value",
    )


@register(
    "window_range_30d_peak",
    oracle="""
    SELECT event_type,
           CAST(MAX(roll_fp) AS DOUBLE) / 10000.0 AS peak_30d_sum
    FROM (
      SELECT event_type,
             SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) OVER (
               PARTITION BY event_type
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
             ) AS roll_fp
      FROM events
    )
    GROUP BY event_type
    """,
    tags=("streaming", "window", "range-frame"),
)
def window_range_30d_peak(spark, sf_dir):
    """RANGE-framed window (value-based, not row-based): per event the
    rolling 30-DAY sum of `value` over event time, reduced to each
    event type's historical peak.  RANGE frames bound by the ORDER
    value (epoch seconds) — ties all enter the frame together, so the
    rolling sum is a pure function of the data, partition-layout-free.
    The summand is fixed-point bigint → exact, order-independent.

    The ~5-value series key would cap the window at 5 tasks (see
    ts_anomaly_zscore); the frame is bounded by VALUE (30 days), so it
    chunks with the map-side value-based carry
    (operators/chunked.with_trailing_range_carry): 30-day buckets with
    each row exploded into the later buckets whose frames can still
    reach it (≤2x duplication), identical frame contents, parallelism
    |key| x |span/30d| instead of |key|."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.chunked import (
        with_trailing_range_carry,
    )

    width = 30 * 86400
    e = table(spark, sf_dir, "events")
    aug = with_trailing_range_carry(
        e.select(
            "event_type",
            F.col("ts").cast("long").alias("tsec"),
            fixed_point(F.col("value")).alias("v_fp"),
        ),
        key_cols=["event_type"],
        order_col="tsec",
        range_width=width,
        bucket_span=width,
    )
    w = (
        Window.partitionBy("event_type", "__b")
        .orderBy("tsec")
        .rangeBetween(-width, 0)
    )
    return (
        aug.select(
            "event_type", "__carry", F.sum("v_fp").over(w).alias("roll_fp")
        )
        .filter(F.col("__carry") == 0)
        .groupBy("event_type")
        .agg((F.max("roll_fp").cast("double") / 10000.0).alias("peak_30d_sum"))
    )


_DIFF_STATE_SQL = """
      SELECT user_id, CAST(value AS DOUBLE) AS latest_value
      FROM (
        SELECT user_id, value, {op_case} AS operation,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events {where}
      )
      WHERE rn = 1 AND operation != 'd'
"""


def _latest_state(e):
    """Post-merge table state as a pure function of a change stream."""
    compacted = compact_changes(
        e.withColumn("operation", _op_col()),
        keys=["user_id"],
        order_by=["ts", "event_id"],
    )
    return compacted.filter(F.col("operation") != "d").select(
        "user_id", F.col("value").cast("double").alias("latest_value")
    )


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH before_state AS ({_DIFF_STATE_SQL.format(
        op_case=_OP_CASE_SQL, where="WHERE ts < TIMESTAMP '2024-01-16'")}),
    after_state AS ({_DIFF_STATE_SQL.format(op_case=_OP_CASE_SQL, where="")})
    SELECT COALESCE(b.user_id, a.user_id) AS user_id,
           CASE WHEN a.user_id IS NULL THEN b.latest_value
                ELSE a.latest_value END AS latest_value,
           CASE WHEN b.user_id IS NULL THEN 'insert'
                WHEN a.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS _change_type
    FROM before_state b
    FULL OUTER JOIN after_state a ON b.user_id = a.user_id
    WHERE b.user_id IS NULL OR a.user_id IS NULL
       OR b.latest_value IS DISTINCT FROM a.latest_value
    """,
    tags=("cdc", "S9", "cdf"),
)
def cdc_snapshot_diff(spark, sf_dir):
    """Change-data-feed between two table versions (the INVERSE of
    apply_changes): the state at 2024-01-16 vs the final state, as the
    minimal insert/update/delete row set a CDF reader would serve
    (Iceberg changelog scan / Delta CDF equivalent).  One key-hash
    shuffle per side, then map-side classification — on key-bucketed
    layouts the join plans with zero extra shuffle.  Replaying the
    diff through apply_changes(before) reproduces `after` exactly
    (property-tested in tests/test_cdc.py)."""
    from lakehouse_cdc_spark.cdc.diff import snapshot_diff

    e = table(spark, sf_dir, "events")
    before = _latest_state(e.filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp")))
    after = _latest_state(e)
    return snapshot_diff(before, after, keys=["user_id"])


@register(
    "cdc_lateness_audit",
    oracle="""
    WITH arr AS (
      SELECT ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS high_water
      FROM events
    ),
    late AS (
      SELECT CASE WHEN high_water IS NULL OR ts >= high_water THEN 0
                  ELSE epoch_us(high_water) - epoch_us(ts) END AS late_us
      FROM arr
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE late_us > 0) AS BIGINT) AS n_late,
           CAST(COUNT(*) FILTER (WHERE late_us > 60000000) AS BIGINT)
             AS late_over_1m,
           CAST(COUNT(*) FILTER (WHERE late_us > 600000000) AS BIGINT)
             AS late_over_10m,
           CAST(COUNT(*) FILTER (WHERE late_us > 3600000000) AS BIGINT)
             AS late_over_1h,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us
    FROM late
    """,
    tags=("cdc", "watermark", "lateness", "tuning", "W1"),
)
def cdc_lateness_audit(spark, sf_dir):
    """Watermark-tuning audit: replay the stream in ARRIVAL order
    (event_id) and measure each event's lateness against the running
    event-time high-water mark — exactly the quantity
    ``withWatermark(delay)`` trades against state size.  The emitted
    row answers \"what would a 1-minute / 10-minute / 1-hour
    watermark drop?\" BEFORE deploying the streaming job; pair it
    with events_interarrival_histogram for gap-based TTL tuning.
    The running max is the two-pass distributed prefix max
    (operators/prefix.py): event_id range-bucket → per-bucket cummax
    window (UNBOUNDED PRECEDING .. 1 PRECEDING) → per-bucket max ts
    combined over strictly-lower buckets by broadcast; high_water =
    greatest(within-bucket prev max, lower-bucket carry) — no
    unpartitioned global window, no SinglePartition exchange.  Integer
    microsecond arithmetic throughout."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    e = with_range_bucket(
        table(spark, sf_dir, "events").select("event_id", "ts"), "event_id", 64
    )
    carry = lower_bucket_agg(
        e.groupBy("__bkt").agg(F.max("ts").alias("__bmax")),
        "__bkt",
        "__bmax",
        "__carry",
        combine="max",
        default=None,
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = (
        e.join(F.broadcast(carry), "__bkt", "left")
        .select(
            "ts",
            # greatest() skips NULLs: a bucket's first row has no
            # within-bucket prev max (carry alone applies); bucket 0's
            # first row has neither -> NULL, exactly the global first
            F.greatest(F.max("ts").over(w), F.col("__carry")).alias(
                "high_water"
            ),
        )
    )
    late = arr.select(
        F.when(
            F.col("high_water").isNull() | (F.col("ts") >= F.col("high_water")),
            0,
        )
        .otherwise(F.unix_micros("high_water") - F.unix_micros("ts"))
        .alias("late_us")
    )
    return late.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("late_us") > 0, 1)).alias("n_late"),
        F.count(F.when(F.col("late_us") > 60_000_000, 1)).alias("late_over_1m"),
        F.count(F.when(F.col("late_us") > 600_000_000, 1)).alias(
            "late_over_10m"
        ),
        F.count(F.when(F.col("late_us") > 3_600_000_000, 1)).alias(
            "late_over_1h"
        ),
        F.max("late_us").cast("bigint").alias("max_late_us"),
    )


@register(
    "cdc_partial_column_upsert",
    oracle="""
    WITH patches AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 2 = 0
                  THEN CAST(ROUND(value * 100) AS BIGINT) END AS val_patch,
             CASE WHEN event_id % 2 = 1 THEN event_type END AS type_patch
      FROM events
    )
    SELECT user_id,
           (max(CASE WHEN val_patch IS NOT NULL THEN
                struct_pack(ts := ts, eid := event_id, v := val_patch)
            END)).v AS val_cents,
           (max(CASE WHEN type_patch IS NOT NULL THEN
                struct_pack(ts := ts, eid := event_id, v := type_patch)
            END)).v AS last_type,
           CAST(COUNT(*) FILTER (val_patch IS NOT NULL) AS BIGINT)
             AS n_val_patches,
           CAST(COUNT(*) FILTER (type_patch IS NOT NULL) AS BIGINT)
             AS n_type_patches
    FROM patches GROUP BY user_id ORDER BY user_id
    """,
    tags=("cdc", "merge", "partial-update", "S9", "W1"),
)
def cdc_partial_column_upsert(spark, sf_dir):
    """COLUMN-LEVEL partial upsert compaction — the patch-stream
    semantics row-level LWW (cdc_latest_state / apply_changes) cannot
    express: real CDC streams carry SPARSE updates (Debezium partial
    events, MERGE ... UPDATE SET col = COALESCE(src.col, tgt.col)),
    where NULL means "field untouched", so the current state of each
    COLUMN is its own latest NON-NULL value — two columns of one key
    can come from two different change events.  Executed as ONE
    groupBy with per-column max-of-struct aggregates (the (ts,
    event_id, value) struct orders lexicographically, so the max among
    non-null carriers IS the latest patch — no window, no per-column
    join, and adding patched columns adds aggregate expressions, never
    shuffles).  The fixture derives a deterministic patch stream from
    events (even event_ids patch the value column, odd ones the type
    column); the oracle replays it with arg_max FILTER.  At 100 TB
    this is the compaction a wide sparse-update table needs: the
    row-LWW form would resurrect stale columns from the last full
    row."""
    e = table(spark, sf_dir, "events")
    patches = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_id") % 2 == 0,
            F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
        ).alias("val_patch"),
        F.when(F.col("event_id") % 2 == 1, F.col("event_type")).alias(
            "type_patch"
        ),
    )

    def latest_non_null(col):
        return F.max(
            F.when(
                F.col(col).isNotNull(),
                F.struct("ts", "event_id", col),
            )
        ).getField(col)

    return (
        patches.groupBy("user_id")
        .agg(
            latest_non_null("val_patch").alias("val_cents"),
            latest_non_null("type_patch").alias("last_type"),
            F.count("val_patch").cast("bigint").alias("n_val_patches"),
            F.count("type_patch").cast("bigint").alias("n_type_patches"),
        )
        .orderBy("user_id")
    )
