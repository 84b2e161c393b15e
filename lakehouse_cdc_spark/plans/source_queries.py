"""Declared queries over the custom Python Data Source (wave 19).

These put the Spark-4 ``pyspark.sql.datasource`` source
(``sources/cdclog.py``) on the correctness gate: the source generates
a deterministic Debezium-style change log, Spark consumes it through
the REAL pipeline (scan → from_json decode → window compaction), and
DuckDB regenerates the identical log from ``generate_series`` — so a
brand-new source *kind* (not just a new format) is oracle-checked
end-to-end.

Scale: generation is lazy and per-partition on executors; pushdown
prunes whole partitions before a row exists (see the source module).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register
from lakehouse_cdc_spark.sources.cdclog import duck_log_cte, register_cdclog

_N, _PARTS, _KEYS = 4000, 8, 400

_ENV_SCHEMA = "id BIGINT, name STRING, __deleted STRING, ts_ms BIGINT"


def _scan(spark, n=_N, parts=_PARTS, keys=_KEYS):
    register_cdclog(spark)  # also enables python filter pushdown
    return (
        spark.read.format("cdclog")
        .option("n", n)
        .option("parts", parts)
        .option("keys", keys)
        .load()
    )


@register(
    "source_python_cdclog_latest",
    bench=True,
    oracle=f"""
    WITH {duck_log_cte(_N, _PARTS, _KEYS)},
    ranked AS (
      SELECT id, name, deleted, ts_ms,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY ts_ms DESC) AS rn
      FROM envelope
    )
    SELECT id, name, deleted, ts_ms FROM ranked WHERE rn = 1
    """,
    tags=("source", "python-datasource", "cdc", "S1"),
)
def source_python_cdclog_latest(spark, sf_dir):
    """Full CDC pipeline over the Python data source: scan the
    generated envelope stream, ``from_json`` decode (the real S3
    decode path, not the oracle's direct regeneration), then
    last-write-wins compaction per id — W1 applied to a source Spark
    itself planned and parallelized.  ts_ms is unique per offset so
    the rank needs no extra tie-break."""
    raw = _scan(spark)
    parsed = raw.select(
        F.from_json("value", _ENV_SCHEMA).alias("p")
    ).select("p.*")
    # Last-write-wins as an algebraic argmax (max_by on the unique
    # ts_ms) instead of a rank-1 window: each map task folds its
    # envelope rows to one partial per id, so the compaction shuffle
    # carries |ids| partials rather than every change event — the
    # canonical CDC-compaction shape at scale.  Row-identical to the
    # window form (ts_ms unique per id).
    return (
        parsed.groupBy("id")
        .agg(
            F.max_by(F.struct("name", "__deleted"), F.col("ts_ms")).alias("p"),
            F.max("ts_ms").alias("ts_ms"),
        )
        .select(
            "id",
            F.col("p.name").alias("name"),
            (F.col("p.__deleted") == "true").alias("deleted"),
            "ts_ms",
        )
    )


@register(
    "source_python_cdclog_pushdown",
    oracle=f"""
    WITH {duck_log_cte(_N, _PARTS, _KEYS)}
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN("offset") AS min_off,
           MAX("offset") AS max_off,
           CAST(SUM(id) AS BIGINT) AS sum_id
    FROM envelope
    WHERE part = 3 AND "offset" >= 1000 AND "offset" < 3000
    """,
    tags=("source", "python-datasource", "pushdown", "S6"),
)
def source_python_cdclog_pushdown(spark, sf_dir):
    """Filter pushdown through the Python source: the part equality
    prunes 7 of 8 input partitions and the offset bounds narrow the
    generation range arithmetically — both consumed by ``pushFilters``
    before any row is generated (asserted object-level in
    tests/test_pyds.py).  The aggregate proves the pruned scan still
    produces exactly the oracle's row set."""
    raw = _scan(spark)
    pid = F.from_json("value", _ENV_SCHEMA).alias("p")
    return (
        raw.filter(
            (F.col("part") == 3)
            & (F.col("offset") >= 1000)
            & (F.col("offset") < 3000)
        )
        .select("offset", pid)
        .select("offset", "p.id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("offset").alias("min_off"),
            F.max("offset").alias("max_off"),
            F.sum("id").cast("bigint").alias("sum_id"),
        )
    )


@register(
    "source_metadata_provenance",
    oracle="""
    SELECT 'documents.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS rows_in_file,
           CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS sum_row_index,
           CAST(COUNT(*) AS BIGINT) AS distinct_row_index,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    """,
    tags=("source", "metadata", "provenance", "S7"),
)
def source_metadata_provenance(spark, sf_dir):
    """Sample-level PROVENANCE through Spark's hidden ``_metadata``
    struct — the per-row (file, offset) identity a training pipeline
    records so any example can be traced back to its source file (and
    the same machinery ``changes_between`` uses to stamp snapshots
    from file paths).  The audit groups by ``_metadata.file_name`` and
    proves ``_metadata.row_index`` is a true 0-based per-file row
    number by its closed forms: the index sum must equal n(n-1)/2 and
    the distinct count must equal n — properties the oracle states
    arithmetically (DuckDB's view has no metadata columns, which is
    the point: the identities make them verifiable anyway).  Metadata
    columns are constant-folded at scan time — no widening of the
    read schema, free at any scale."""
    from lakehouse_cdc_spark.plans.registry import table as _table

    d = _table(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.row_index").alias("row_index"),
            "doc_id",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("rows_in_file"),
            F.sum("row_index").cast("bigint").alias("sum_row_index"),
            F.countDistinct("row_index").cast("bigint").alias(
                "distinct_row_index"
            ),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


@register(
    "source_connector_fleet_reconcile",
    oracle="""
    SELECT 'src-' || regexp_replace(lower(n_name), '[^a-z0-9]+', '-', 'g')
             AS connector,
           CASE n_nationkey % 3
             WHEN 0 THEN 'create'
             WHEN 1 THEN 'replace'
             ELSE 'noop' END AS action
    FROM nation ORDER BY connector
    """,
    tags=("connectors", "lifecycle", "reconcile", "S1"),
)
def source_connector_fleet_reconcile(spark, sf_dir):
    """CONNECTOR-FLEET RECONCILIATION as a distributed diff — the
    multi-tenant form of the lifecycle module (connectors.py, itself
    the declarative re-expression of the reference's imperative
    create_source_connector.py): one desired Debezium source per
    nation-tenant is GENERATED by the validated pure config functions
    (full configs, canonical sorted-key JSON), the live fleet is the
    declared drift scheme (every 3rd tenant absent → create; the next
    drifted in slot.name → replace; the rest identical → noop), and
    the reconcile decision is a full-outer join + config comparison
    over DataFrames.  The oracle maps the drift scheme straight to
    actions — a hash match proves the REAL generated configs diff to
    exactly the declared plan (a config-generation or comparison bug
    flips an action).  pytest separately pins this DataFrame diff ≡
    connectors.reconcile_plan on the same fleet.

    Scale shape: the per-tenant spec tables here are 25 rows from the
    nation dim, but the plan is the one that matters at fleet scale
    (thousands of connectors across tenants): a name-keyed full-outer
    hash join of two config tables with a string comparison — no
    driver loop over connectors, unlike the reference's one-REST-call-
    per-connector script."""
    import json as _json

    from lakehouse_cdc_spark.connectors import debezium_postgres_source
    from lakehouse_cdc_spark.plans.registry import table

    nations = [
        (int(r.n_nationkey), str(r.n_name))
        for r in table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .collect()  # 25-row dimension: the fleet spec source
    ]

    def spec(name_raw: str, slot: str) -> tuple[str, str]:
        import re as _re

        tenant = _re.sub(r"[^a-z0-9]+", "-", name_raw.lower())
        s = debezium_postgres_source(
            name=f"src-{tenant}",
            database_hostname=f"{tenant}.db.internal.example",
            database_dbname=tenant,
            tables=["public.orders"],
            topic_prefix=tenant,
            slot_name=slot,
        )
        return s["name"], _json.dumps(s["config"], sort_keys=True)

    desired = spark.createDataFrame(
        [spec(nm, "debezium_slot") for _, nm in nations],
        "connector string, desired_cfg string",
    )
    live_rows = []
    for k, nm in nations:
        if k % 3 == 0:
            continue  # absent from the live fleet
        slot = "old_slot" if k % 3 == 1 else "debezium_slot"
        n, cfg = spec(nm, slot)
        live_rows.append((n, cfg))
    live = spark.createDataFrame(
        live_rows, "connector string, live_cfg string"
    )
    return (
        desired.join(live, "connector", "full_outer")
        .select(
            "connector",
            F.when(F.col("live_cfg").isNull(), F.lit("create"))
            .when(F.col("live_cfg") != F.col("desired_cfg"), F.lit("replace"))
            .otherwise(F.lit("noop"))
            .alias("action"),
        )
        .orderBy("connector")
    )


# ---------------------------------------------------------------------------
# Text-format source round-trips (round 9): CSV + JSON Lines
# ---------------------------------------------------------------------------
#
# The reference ingests parquet/Iceberg only; real pipelines also land
# CSV and JSONL drops.  These queries prove the ENGINE's text-format
# read paths are lossless end to end: a deterministic orders-derived
# frame (quote/escape/NULL/unicode hazards planted on key parity) is
# written in the text format and read back with an EXPLICIT schema —
# at 100 TB schema inference costs a full extra scan, so the explicit
# schema IS the scale discipline — and the census the reader produces
# must hash-match the oracle's recomputation from the original rows.
# A CSV reader that mangles one quoted delimiter or drops one NULL
# changes a sum/xor and fails the gate.

import os as _os
import tempfile as _tempfile

from lakehouse_cdc_spark.plans.registry import table as _table

_CSV_CACHE: dict[str, str] = {}
_JSONL_CACHE: dict[str, str] = {}

#: planted hazards, keyed on order-key parity (engine-neutral):
#: %7 → embedded delimiter + double quote, %11 → NULL note,
#: %13 → leading/trailing spaces (must survive quoting)
_NOTE_SQL = (
    "CASE WHEN o_orderkey % 7 = 0 THEN 'a,b\"c'"
    " WHEN o_orderkey % 11 = 0 THEN NULL"
    " WHEN o_orderkey % 13 = 0 THEN '  padded  '"
    " ELSE o_orderpriority END"
)


def _roundtrip_frame(spark, sf_dir):
    o = _table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderstatus").alias("status"),
        F.expr(_NOTE_SQL).alias("note"),
    )


_RT_ORACLE = f"""
    WITH rt AS (
      SELECT o_orderkey AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderstatus AS status,
             {_NOTE_SQL} AS note
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(bit_xor(k) AS BIGINT) AS keys_xor,
           CAST(SUM(CASE WHEN note IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_note,
           CAST(SUM(CASE WHEN note LIKE '%,%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_delim_note,
           CAST(SUM(CASE WHEN note LIKE ' %' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_padded_note,
           CAST(SUM(length(note)) AS BIGINT) AS sum_note_len
    FROM rt
"""


def _rt_census(df):
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.expr("bit_xor(k)").cast("bigint").alias("keys_xor"),
        F.sum(F.col("note").isNull().cast("int"))
        .cast("bigint")
        .alias("n_null_note"),
        F.sum(F.col("note").contains(",").cast("int"))
        .cast("bigint")
        .alias("n_delim_note"),
        F.sum(F.col("note").startswith(" ").cast("int"))
        .cast("bigint")
        .alias("n_padded_note"),
        F.sum(F.length("note")).cast("bigint").alias("sum_note_len"),
    )


@register(
    "source_csv_roundtrip",
    oracle=_RT_ORACLE,
    tags=("source", "csv", "roundtrip", "S-family"),
)
def source_csv_roundtrip(spark, sf_dir):
    """CSV SOURCE ROUND-TRIP — the text-format ingest contract: a
    deterministic orders frame with planted CSV hazards (embedded
    delimiter + double quote on key%7, NULL on key%11, significant
    leading/trailing spaces on key%13) is written as quoted CSV and
    read back with an EXPLICIT schema (no inference scan — the 100 TB
    discipline) and explicit quote/escape/null options.  The census
    (row count, exact sums, key XOR, per-hazard counts, total note
    length) must hash-match the oracle's recomputation from the
    ORIGINAL rows — one swallowed quote or NULL→empty-string coercion
    shifts a count and fails the gate.

    Scale shape: the write/read are both full-parallel text jobs; the
    census is one map-side aggregate.  CSV at scale is exactly this —
    schema declared, hazards quoted, never inferred."""
    cached = _CSV_CACHE.get(sf_dir)
    if cached is None or not _os.path.isdir(cached):
        path = _tempfile.mkdtemp(prefix="src_csv_")
        (
            _roundtrip_frame(spark, sf_dir)
            .write.mode("overwrite")
            .option("header", "true")
            .option("quoteAll", "true")
            .option("escape", '"')
            # Spark's CSV WRITER trims field whitespace by default —
            # silent data corruption for significant padding; off for
            # a lossless round-trip
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .csv(path)
        )
        _CSV_CACHE[sf_dir] = cached = path
    back = (
        spark.read.schema("k long, cents long, status string, note string")
        .option("header", "true")
        .option("escape", '"')
        # quoted empty field = empty string; UNQUOTED empty = NULL.
        # quoteAll wrote NULL as an unquoted empty field, so this
        # round-trips the NULL/empty distinction exactly
        .option("nullValue", "")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(cached)
    )
    return _rt_census(back)


@register(
    "source_jsonl_roundtrip",
    oracle=_RT_ORACLE,
    tags=("source", "json", "roundtrip", "S-family"),
)
def source_jsonl_roundtrip(spark, sf_dir):
    """JSON-LINES SOURCE ROUND-TRIP — the same hazard frame as
    source_csv_roundtrip lands as JSONL (the other text format real
    drops arrive in), with the payload NESTED one level
    (``m: {cents, note}``) so the reader's struct path is exercised,
    then read back with an EXPLICIT nested schema and flattened.  The
    identical census must hash-match the same oracle: JSON escaping
    of the planted quote, NULL field omission, and significant
    whitespace all survive or the gate fails.

    Scale shape: as the CSV twin — explicit schema (inference over
    100 TB of JSONL is a full extra scan), map-side flatten, one
    aggregate."""
    cached = _JSONL_CACHE.get(sf_dir)
    if cached is None or not _os.path.isdir(cached):
        path = _tempfile.mkdtemp(prefix="src_jsonl_")
        (
            _roundtrip_frame(spark, sf_dir)
            .select(
                "k",
                "status",
                F.struct("cents", "note").alias("m"),
            )
            .write.mode("overwrite")
            .json(path)
        )
        _JSONL_CACHE[sf_dir] = cached = path
    back = (
        spark.read.schema(
            "k long, status string, m struct<cents: long, note: string>"
        )
        .json(cached)
        .select("k", "status", F.col("m.cents").alias("cents"),
                F.col("m.note").alias("note"))
    )
    return _rt_census(back)
