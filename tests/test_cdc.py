"""Unit tests for the CDC operator family — hand-built change batches
exercising every MERGE arm and the reference's edge cases
(FIXTURES.md §1.2/§1.5)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lakehouse_cdc_spark.cdc import (
    apply_changes,
    classify_operation,
    compact_changes,
    decode_debezium,
)
from lakehouse_cdc_spark.cdc.apply import merge_into_sql


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_decode_skips_poison_messages(spark):
    raw = spark.createDataFrame(
        [
            ('{"payload": {"id": 1, "name": "a", "description": "d", '
             '"price": 10, "on_offer": true, "__deleted": "false"}}',),
            (None,),
            ("",),
            ("   ",),
            ("empty",),
            ("{not json",),
            ('{"other": 1}',),
            ('{"payload": {"id": 2, "name": "b", "description": null, '
             '"price": 20, "on_offer": false, "__deleted": "true"}}',),
        ],
        "value string",
    )
    rows = decode_debezium(raw).orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2]
    assert rows[0].name == "a" and rows[0].price == 10
    assert rows[1]["__deleted"] == "true"


def test_classify_operation_c_u_d(spark):
    df = spark.createDataFrame(
        [
            (1, "false"),
            (None, "false"),  # null id → create
            (2, "true"),  # deleted → delete
            (3, None),  # missing flag → update
            (4, "TRUE"),  # case-insensitive → delete (spark_batch.py:107)
        ],
        "id int, __deleted string",
    )
    got = {
        (r.id, r.operation)
        for r in classify_operation(df).collect()
    }
    assert got == {(1, "u"), (None, "c"), (2, "d"), (3, "u"), (4, "d")}


def test_compact_changes_last_write_wins_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), 100, "a"),
            (1, ts("2024-01-01T11:00:00"), 101, "b"),  # newest ts wins
            (2, ts("2024-01-01T10:00:00"), 200, "x"),
            (2, ts("2024-01-01T10:00:00"), 201, "y"),  # ts tie → higher seq wins
        ],
        "id int, t timestamp, seq int, v string",
    )
    rows = compact_changes(df, keys=["id"], order_by=["t", "seq"]).orderBy("id").collect()
    assert [(r.id, r.v) for r in rows] == [(1, "b"), (2, "y")]


def test_apply_changes_all_merge_arms(spark):
    base = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "id int, v string"
    )
    changes = spark.createDataFrame(
        [
            # matched update (two versions; newest wins)
            (1, "new1-early", "u", ts("2024-01-01T10:00:00"), 1),
            (1, "new1", "u", ts("2024-01-01T11:00:00"), 2),
            # matched delete
            (2, "whatever", "d", ts("2024-01-01T10:00:00"), 3),
            # unmatched insert
            (4, "new4", "c", ts("2024-01-01T10:00:00"), 4),
            # unmatched delete → must NOT insert (reference bug, fixed:
            # spark_batch.py:277-279 would insert this ghost row)
            (5, "ghost", "d", ts("2024-01-01T10:00:00"), 5),
        ],
        "id int, v string, operation string, t timestamp, seq int",
    )
    result = apply_changes(base, changes, keys=["id"], order_by=["t", "seq"])
    got = {(r.id, r.v) for r in result.collect()}
    assert got == {(1, "new1"), (3, "old3"), (4, "new4")}


def test_apply_changes_delete_then_recreate_within_batch(spark):
    base = spark.createDataFrame([(1, "old")], "id int, v string")
    changes = spark.createDataFrame(
        [
            (1, None, "d", ts("2024-01-01T10:00:00"), 1),
            (1, "recreated", "c", ts("2024-01-01T11:00:00"), 2),
        ],
        "id int, v string, operation string, t timestamp, seq int",
    )
    result = apply_changes(base, changes, keys=["id"], order_by=["t", "seq"])
    assert [(r.id, r.v) for r in result.collect()] == [(1, "recreated")]


def test_merge_into_sql_shape():
    sql = merge_into_sql("iceberg.db.items", "source_data", ["id"],
                         ["name", "price"])
    assert "WHEN MATCHED AND source.operation = 'd' THEN DELETE" in sql
    assert "source.operation != 'd'" in sql  # guarded insert arm
    assert "WHEN NOT MATCHED AND source.operation IS NOT NULL" in sql
    assert "target.id = source.id" in sql


def test_apply_changes_is_idempotent(spark):
    """Replaying the same compacted batch must be a no-op — the
    property the exactly-once path's batch ledger protects
    (spark_exactly_once.py:292-341); here it holds algebraically."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    changes = spark.createDataFrame(
        [(1, "a2", "u", ts("2024-01-01T10:00:00"), 1),
         (3, "c", "c", ts("2024-01-01T10:00:00"), 2)],
        "id int, v string, operation string, t timestamp, seq int",
    )
    once = apply_changes(base, changes, keys=["id"], order_by=["t", "seq"])
    twice = apply_changes(once, changes, keys=["id"], order_by=["t", "seq"])
    assert sorted((r.id, r.v) for r in once.collect()) == sorted(
        (r.id, r.v) for r in twice.collect()
    )


def test_decode_tolerates_schema_drift(spark):
    """Unknown payload fields (upstream added a column) are ignored;
    missing fields decode as NULL — the from_json permissive contract
    the CDC pipeline's schema evolution relies on."""
    raw = spark.createDataFrame(
        [
            # extra field never seen in the schema
            ('{"payload": {"id": 1, "name": "a", "description": "d", '
             '"price": 10, "on_offer": true, "__deleted": "false", '
             '"brand_new_column": "surprise"}}',),
            # missing most fields
            ('{"payload": {"id": 2}}',),
        ],
        "value string",
    )
    rows = decode_debezium(raw).orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2]
    assert rows[0].name == "a"
    assert "brand_new_column" not in rows[0].asDict()
    assert rows[1].name is None and rows[1].price is None


def test_snapshot_diff_replay_reproduces_after(spark):
    """diff(before, after) replayed through apply_changes(before)
    must reproduce `after` exactly — the CDF round-trip property."""
    from lakehouse_cdc_spark.cdc.diff import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (6, None, 60.0)],
        "id int, v string, x double",
    )
    after = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", None), (6, None, 60.0)],
        "id int, v string, x double",
    )
    diff = snapshot_diff(before, after, keys=["id"])
    got = {(r.id, r.v, r.x, r._change_type) for r in diff.collect()}
    assert got == {
        (2, "B", 20.0, "update"),
        (3, "c", 30.0, "delete"),
        (4, "d", None, "insert"),
    }  # unchanged keys 1 and 6 (with NULL value col) emit no row

    changes = diff.withColumn(
        "operation",
        F.when(F.col("_change_type") == "delete", "d").otherwise("u"),
    ).withColumn("seq", F.lit(1))
    replayed = apply_changes(
        before, changes.drop("_change_type"), keys=["id"], order_by=["seq"]
    )
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in after.collect()
    }


def test_snapshot_diff_rejects_schema_mismatch(spark):
    from lakehouse_cdc_spark.cdc.diff import snapshot_diff

    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(1,)], "id int")
    try:
        snapshot_diff(a, b, keys=["id"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_decode_dlq_accounts_for_every_dropped_message(spark):
    """good + dlq must partition the input exactly, with the right
    reason tag per drop class."""
    from lakehouse_cdc_spark.cdc.decode import (
        decode_debezium,
        decode_debezium_with_dlq,
    )

    rows = [
        ('{"payload": {"id": 1, "name": "a", "description": "d", '
         '"price": 10, "on_offer": true, "__deleted": "false"}}',),
        (None,),
        ("   ",),
        ("empty",),
        ("{not json at all",),
        ('{"other": 1}',),  # parseable but no payload
        ('{"payload": {"id": 2, "name": "b", "description": "e", '
         '"price": 20, "on_offer": false, "__deleted": "true"}}',),
    ]
    raw = spark.createDataFrame(rows, "value string")
    good, dlq = decode_debezium_with_dlq(raw)
    assert {r.id for r in good.collect()} == {1, 2}
    reasons = sorted(r.reason for r in dlq.collect())
    assert reasons == [
        "null_or_empty",
        "null_or_empty",
        "sentinel_empty",
        "unparseable",
        "unparseable",
    ]
    assert good.count() + dlq.count() == len(rows)
    # and the plain decoder keeps exactly the good half
    assert decode_debezium(raw).count() == good.count()


# --------------------------------------------------------------------------
# Executed-equivalence proof for the MERGE emitter (VERDICT r3 item 5).
# This container's DuckDB (1.0) predates MERGE INTO, so the harness
# below PARSES the emitted statement and executes its clauses verbatim
# (first-match-wins in clause order, match state evaluated against the
# PRE-merge target) as DELETE USING / UPDATE FROM / guarded INSERT —
# the conditions and actions that run are the emitter's own text, not a
# re-derivation of what it should have said.
def _exec_emitted_merge_duckdb(con, sql: str) -> None:
    import re

    head = re.search(
        r"MERGE INTO\s+(\S+)\s+AS\s+target\s+USING\s+(\S+)\s+AS\s+source"
        r"\s+ON\s+(.+?)\s+WHEN",
        sql,
        re.S,
    )
    assert head, "unparseable MERGE head"
    target, source, on = head.group(1), head.group(2), head.group(3).strip()
    clause_re = re.compile(
        r"WHEN\s+(NOT\s+MATCHED|MATCHED)\s*(.*?)\s*THEN\s+"
        r"(DELETE|UPDATE\s+SET\s+.*?|INSERT\s*\(.*?\)\s*VALUES\s*\(.*?\))"
        r"(?=\s*WHEN\s|\s*$)",
        re.S,
    )
    clauses = clause_re.findall(sql)
    assert clauses, "unparseable MERGE clauses"
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE __pre AS SELECT * FROM {target}"
    )
    # NOT MATCHED is always judged against the PRE-merge target
    not_matched = (
        f"NOT EXISTS (SELECT 1 FROM __pre AS target WHERE {on})"
    )
    prev: dict[bool, list[str]] = {True: [], False: []}
    for kind, cond, action in clauses:
        matched = not kind.upper().startswith("NOT")
        cond = cond.strip()
        cond_sql = cond[3:].strip() if cond.upper().startswith("AND") else None
        # first-match-wins: negate every EARLIER same-match-kind clause
        conds = ([cond_sql] if cond_sql else []) + [
            f"NOT ({c})" for c in prev[matched]
        ]
        if cond_sql:
            prev[matched].append(cond_sql)
        extra = (" AND " + " AND ".join(conds)) if conds else ""
        act = action.strip()
        if act.upper() == "DELETE":
            con.execute(
                f"DELETE FROM {target} AS target USING {source} AS source "
                f"WHERE {on}{extra}"
            )
        elif act.upper().startswith("UPDATE"):
            sets = act[len("UPDATE SET"):].strip().replace("target.", "")
            con.execute(
                f"UPDATE {target} AS target SET {sets} "
                f"FROM {source} AS source WHERE {on}{extra}"
            )
        else:  # INSERT (cols) VALUES (vals)
            m = re.match(
                r"INSERT\s*\((.*?)\)\s*VALUES\s*\((.*?)\)", act, re.S
            )
            cols, vals = m.group(1), m.group(2)
            con.execute(
                f"INSERT INTO {target} ({cols}) SELECT {vals} "
                f"FROM {source} AS source WHERE {not_matched}{extra}"
            )


def _duckdb_merge_state(batches, base_rows):
    """Final DuckDB state after running the EMITTED MERGE for each
    compacted batch in order."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE tgt(id INT, v VARCHAR)")
    con.executemany("INSERT INTO tgt VALUES (?, ?)", base_rows)
    sql = merge_into_sql("tgt", "src", ["id"], ["v"])
    for batch in batches:
        con.execute("CREATE OR REPLACE TABLE src(id INT, v VARCHAR, operation VARCHAR)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", batch)
        _exec_emitted_merge_duckdb(con, sql)
    return sorted(map(tuple, con.execute("SELECT id, v FROM tgt").fetchall()))


def test_merge_emitter_executes_equivalent_to_apply_changes(spark):
    """The emitted MERGE, EXECUTED against a real SQL engine, must land
    on exactly apply_changes' final state — covering every arm: update,
    delete, guarded insert, the NOT-MATCHED-insert-of-deletes reference
    bug (spark_batch.py:277-279 would insert the ghost row), NULL-op
    no-ops, delete-then-recreate across batches, and replay
    idempotence."""
    from lakehouse_cdc_spark.cdc.apply import compact_changes

    base = [(1, "old1"), (2, "old2"), (3, "old3")]
    raw_batches = [
        [
            (1, "new1-early", "u", ts("2024-01-01T10:00:00"), 1),
            (1, "new1", "u", ts("2024-01-01T11:00:00"), 2),
            (2, "whatever", "d", ts("2024-01-01T10:00:00"), 3),
            (4, "new4", "c", ts("2024-01-01T10:00:00"), 4),
            (5, "ghost", "d", ts("2024-01-01T10:00:00"), 5),  # ghost delete
            (3, "null-op", None, ts("2024-01-01T10:00:00"), 6),  # no-op
        ],
        [
            (1, None, "d", ts("2024-01-02T10:00:00"), 1),  # delete...
            (4, "re4", "u", ts("2024-01-02T10:00:00"), 2),
        ],
        [
            (1, "recreated", "c", ts("2024-01-03T10:00:00"), 1),  # ...recreate
        ],
    ]
    # replay the LAST batch verbatim (the crash-replay shape): MERGE
    # on compacted batches is idempotent
    raw_batches.append(raw_batches[2])

    schema = "id int, v string, operation string, t timestamp, seq int"
    state = spark.createDataFrame(base, "id int, v string")
    compacted = []
    for rows in raw_batches:
        df = spark.createDataFrame(rows, schema)
        state = apply_changes(state, df, keys=["id"], order_by=["t", "seq"])
        compacted.append(
            [
                (r.id, r.v, r.operation)
                for r in compact_changes(
                    df, keys=["id"], order_by=["t", "seq"]
                ).collect()
            ]
        )
    spark_state = sorted((r.id, r.v) for r in state.collect())
    duck_state = _duckdb_merge_state(compacted, base)
    assert spark_state == duck_state
    # and the arms really fired: ghost row absent, recreate present
    ids = {i for i, _ in duck_state}
    assert 5 not in ids
    assert (1, "recreated") in duck_state
