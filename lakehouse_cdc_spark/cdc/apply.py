"""Apply-changes upsert — the engine's core operator (SURVEY S9/J1/W1).

The reference's target semantics are last-write-wins upsert by primary
key: within a batch keep only the newest record per key (window dedup,
``src/processor/spark_batch.py:253-260``), then MERGE — matched+'d' →
DELETE, matched → UPDATE all columns, not matched → INSERT
(``:266-280``).

Two deliberate fixes over the reference (documented deviations):

1. **insert-of-deletes**: the reference's ``WHEN NOT MATCHED THEN
   INSERT *`` arm has no operation guard, so a delete for a never-seen
   key inserts a ghost row (``spark_batch.py:277-279``).  We guard the
   insert arm with ``operation != 'd'``.
2. **nondeterministic ties**: the reference orders the dedup window by
   ``processing_time`` only; we require explicit tie-breakers so the
   result is a pure function of the input.

``apply_changes`` is the pure-DataFrame formulation (outer join +
conditional select) — ANSI-expressible, so DuckDB can oracle-check it,
and exactly what ``MERGE INTO`` plans to anyway (a full-outer join
feeding a writer).  ``merge_into_sql`` emits the equivalent Iceberg
MERGE for deployments with a transactional catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.dedup import latest_per_key


def compact_changes(
    changes: DataFrame,
    keys: list[str],
    order_by: list[str | Column],
) -> DataFrame:
    """In-batch last-write-wins compaction (W1) — ≤1 row per key, which
    MERGE cardinality correctness requires (spark_batch.py:253-260)."""
    return latest_per_key(changes, keys, order_by)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str | Column],
    op_col: str = "operation",
) -> DataFrame:
    """Pure-DataFrame MERGE: returns the post-merge state of ``base``.

    Semantics (spark_batch.py:266-280, with the insert-of-deletes fix):
      matched  + op='d'  → row removed
      matched  + op≠'d'  → row replaced by the change's columns
      unmatched change, op≠'d' → row inserted
      unmatched change, op='d' → dropped (the reference inserts it — bug)
      base rows with no change → kept unchanged

    Implementation: compact to ≤1 change/key, then a single full-outer
    join on the key, then one conditional projection per column.  One
    shuffle each side (or map-side only if ``changes`` is small enough
    for AQE to broadcast); no driver involvement.  This is the plan
    MERGE INTO itself executes, minus the transactional commit.
    """
    # NULL-operation rows are malformed non-changes: exclude them
    # BEFORE compaction, so a newest-but-NULL-op row cannot mask an
    # earlier valid change for the same key within the batch
    latest = compact_changes(
        changes.filter(F.col(op_col).isNotNull()), keys, order_by
    )
    value_cols = [c for c in base.columns if c not in keys]

    # non-nullable existence marker: inferring base-row existence from
    # key columns would silently drop base rows whose key is NULL.
    # (The change side needs no marker: post-filter, a change row
    # always has a non-null __c_op.)
    b = base.select(
        *(F.col(c).alias(f"__b_{c}") for c in base.columns),
        F.lit(True).alias("__b_exists"),
    )
    c_ = latest.select(
        *(F.col(k).alias(f"__c_{k}") for k in keys),
        *(F.col(c).alias(f"__c_{c}") for c in value_cols),
        F.col(op_col).alias("__c_op"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__b_{k}") == F.col(f"__c_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = b.join(c_, on=cond, how="full_outer")

    has_change = F.col("__c_op").isNotNull()
    is_delete = has_change & (F.col("__c_op") == "d")
    survives = ~is_delete & (has_change | F.col("__b_exists").isNotNull())

    out_cols = []
    for k in keys:
        out_cols.append(F.coalesce(F.col(f"__b_{k}"), F.col(f"__c_{k}")).alias(k))
    for c in value_cols:
        out_cols.append(
            F.when(has_change, F.col(f"__c_{c}"))
            .otherwise(F.col(f"__b_{c}"))
            .alias(c)
        )
    return joined.filter(survives).select(*out_cols)


def merge_into_sql(
    target: str,
    source_view: str,
    keys: list[str],
    columns: list[str],
    op_col: str = "operation",
) -> str:
    """The Iceberg/Delta MERGE equivalent of :func:`apply_changes`
    (spark_batch.py:266-280 shape, insert arm guarded).  Run via
    ``spark.sql`` when the session has a transactional catalog.

    NULL-operation rows are no-ops in every arm (matching
    apply_changes, which ignores them): the update and insert arms
    require ``operation IS NOT NULL`` explicitly — an unguarded
    ``WHEN MATCHED THEN UPDATE`` would let a NULL-op row overwrite
    the target."""
    on = " AND ".join(f"target.{k} = source.{k}" for k in keys)
    set_clause = ", ".join(f"target.{c} = source.{c}" for c in columns)
    insert_cols = ", ".join(keys + columns)
    insert_vals = ", ".join(f"source.{c}" for c in keys + columns)
    return f"""
        MERGE INTO {target} AS target
        USING {source_view} AS source
        ON {on}
        WHEN MATCHED AND source.{op_col} = 'd' THEN DELETE
        WHEN MATCHED AND source.{op_col} IS NOT NULL
          THEN UPDATE SET {set_clause}
        WHEN NOT MATCHED AND source.{op_col} IS NOT NULL
                         AND source.{op_col} != 'd'
          THEN INSERT ({insert_cols}) VALUES ({insert_vals})
    """
