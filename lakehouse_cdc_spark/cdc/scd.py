"""Slowly-Changing-Dimension Type 2 history from a CDC change stream.

The reference materializes only the *latest* state of each key
(last-write-wins MERGE, ``src/processor/spark_batch.py:253-280``).
SCD2 is the other canonical lakehouse consumption pattern for the same
stream: every change opens a dimension *version* row stamped
``[valid_from, valid_to)``; the newest open version is ``is_current``.
Deletes close the open version without opening a new one.

Plan shape: ONE hash-partition shuffle on the key + one sort feeds two
window functions (``lead`` for the closing timestamp, ``row_number``
for the version ordinal).  The filter that drops delete rows sits
between the two windows and preserves both the partitioning and the
sort order, so Catalyst plans a single Exchange — the same shuffle
budget as plain compaction, which is what makes this viable at 100 TB
(state never materializes anywhere; versions stream out of the sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    time_col: str,
    tiebreak: list[str] | None = None,
    op_col: str | Column = "operation",
    delete_op: str = "d",
) -> DataFrame:
    """Expand a change stream into SCD Type 2 version rows.

    Every input row ordered by ``(time_col, *tiebreak)`` within its key:

    - non-delete → a version row: ``valid_from = time_col``,
      ``valid_to`` = the next change's time (NULL while open),
      ``version`` = ordinal among the key's non-delete rows,
      ``is_current`` = open AND not later deleted;
    - delete → closes the previous version (its time becomes that
      version's ``valid_to``) and emits nothing itself.

    A key may be re-created after a delete; versioning just continues.
    Column set: all input columns + ``valid_to``/``version``/
    ``is_current`` (callers rename ``time_col`` to ``valid_from``).
    """
    tiebreak = tiebreak or []
    op = F.col(op_col) if isinstance(op_col, str) else op_col
    w = Window.partitionBy(*keys).orderBy(time_col, *tiebreak)
    closed = changes.withColumn("valid_to", F.lead(time_col).over(w)).withColumn(
        "__is_delete", op == delete_op
    )
    versions = closed.filter(~F.col("__is_delete")).withColumn(
        "version", F.row_number().over(w)
    )
    return versions.withColumn(
        "is_current", F.col("valid_to").isNull()
    ).drop("__is_delete")
