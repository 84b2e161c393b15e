"""Connector lifecycle management (round 7): declarative configs +
idempotent reconcile — the pure re-expression of the reference's
imperative create_source_connector.py / create_sink_connector.py."""

import json

import pytest

from lakehouse_cdc_spark.connectors import (
    debezium_postgres_source,
    iceberg_sink,
    reconcile_plan,
    rest_calls,
)


def _src(**over):
    kw = dict(
        name="pg-src",
        database_hostname="db.svc",
        database_dbname="appdb",
        tables=["public.items"],
        topic_prefix="pg",
    )
    kw.update(over)
    return debezium_postgres_source(**kw)


def _sink(**over):
    kw = dict(
        name="ice-sink",
        topics=["pg.public.items"],
        table="db.items",
        catalog_uri="http://rest:8181",
        warehouse="s3a://wh/",
        id_columns=["id"],
    )
    kw.update(over)
    return iceberg_sink(**kw)


def test_source_config_matches_decode_contract():
    """The unwrap SMT must emit exactly what cdc/decode.py parses:
    flattened payload + __deleted rewrite marker, tombstones kept."""
    cfg = _src()["config"]
    assert cfg["transforms.unwrap.type"].endswith("ExtractNewRecordState")
    assert cfg["transforms.unwrap.delete.handling.mode"] == "rewrite"
    assert cfg["transforms.unwrap.drop.tombstones"] == "false"
    assert cfg["table.include.list"] == "public.items"
    assert cfg["publication.autocreate.mode"] == "filtered"
    # no secrets inline by default — provider refs only
    assert cfg["database.password"].startswith("${")


def test_sink_config_pins_upsert_and_cdc_rename():
    cfg = _sink()["config"]
    assert cfg["iceberg.tables.upsert-mode-enabled"] == "true"
    assert cfg["iceberg.tables.default-id-columns"] == "id"
    # Debezium's __deleted marker drives Iceberg deletes via rename
    assert cfg["transforms.RenameField.renames"] == "__deleted:_deleted"
    assert cfg["iceberg.tables.cdc-field"] == "_deleted"
    # s3 block only appears when an endpoint is configured
    assert "iceberg.catalog.s3.endpoint" not in cfg
    with_s3 = _sink(s3_endpoint="http://s3:80")["config"]
    assert with_s3["iceberg.catalog.s3.path-style-access"] == "true"


def test_config_validation_rejects_misconfiguration():
    with pytest.raises(ValueError, match="schema-qualified"):
        _src(tables=["items"])
    with pytest.raises(ValueError, match="non-empty"):
        _src(tables=[])
    with pytest.raises(ValueError, match="snapshot_mode"):
        _src(snapshot_mode="bogus")
    with pytest.raises(ValueError, match="id_columns"):
        _sink(id_columns=[])
    with pytest.raises(ValueError, match="namespace-qualified"):
        _sink(table="items")
    with pytest.raises(ValueError, match="connector name"):
        _src(name="bad name!")


def test_reconcile_is_idempotent_and_offset_preserving():
    desired = [_src(), _sink()]
    # empty cluster: create both
    assert reconcile_plan(desired, {}) == [
        ("create", "pg-src"),
        ("create", "ice-sink"),
    ]
    # converged cluster: all noop — the reference's delete+recreate
    # would needlessly reset the sink's consumer group here
    live = {s["name"]: dict(s["config"]) for s in desired}
    assert reconcile_plan(desired, live) == [
        ("noop", "pg-src"),
        ("noop", "ice-sink"),
    ]
    # drift on one: replace exactly that one
    live["ice-sink"]["tasks.max"] = "4"
    assert reconcile_plan(desired, live) == [
        ("noop", "pg-src"),
        ("replace", "ice-sink"),
    ]
    with pytest.raises(ValueError, match="duplicate"):
        reconcile_plan([_src(), _src()], {})


def test_rest_calls_render_create_and_replace():
    desired = [_src(), _sink()]
    live = {"ice-sink": {"stale": "config"}}
    calls = rest_calls(desired, live)
    assert [(m, p) for m, p, _ in calls] == [
        ("POST", "/connectors"),
        ("PUT", "/connectors/ice-sink/config"),
    ]
    posted = json.loads(calls[0][2])
    assert posted["name"] == "pg-src" and "config" in posted
    put = json.loads(calls[1][2])
    assert put["iceberg.tables.upsert-mode-enabled"] == "true"
    # converged → no calls at all
    live = {s["name"]: dict(s["config"]) for s in desired}
    assert rest_calls(desired, live) == []


def test_fleet_reconcile_query_matches_pure_plan(spark, sf_dir):
    """The distributed diff (declared query) and the pure-function
    reconcile_plan must land the identical fleet plan."""
    from lakehouse_cdc_spark.connectors import (
        debezium_postgres_source,
        reconcile_plan,
    )
    from lakehouse_cdc_spark.plans.source_queries import (
        source_connector_fleet_reconcile,
    )
    from lakehouse_cdc_spark.plans.registry import table
    import pyspark.sql.functions as F  # noqa: F401
    import re

    got = {
        r.connector: r.action
        for r in source_connector_fleet_reconcile(spark, sf_dir).collect()
    }

    nations = [
        (int(r.n_nationkey), str(r.n_name))
        for r in table(spark, sf_dir, "nation").collect()
    ]

    def spec(nm, slot):
        tenant = re.sub(r"[^a-z0-9]+", "-", nm.lower())
        return debezium_postgres_source(
            name=f"src-{tenant}",
            database_hostname=f"{tenant}.db.internal.example",
            database_dbname=tenant,
            tables=["public.orders"],
            topic_prefix=tenant,
            slot_name=slot,
        )

    desired = [spec(nm, "debezium_slot") for _, nm in nations]
    live = {
        s["name"]: s["config"]
        for s in (
            spec(nm, "old_slot" if k % 3 == 1 else "debezium_slot")
            for k, nm in nations
            if k % 3 != 0
        )
    }
    pure = {
        name: ("noop" if action == "noop" else action)
        for action, name in reconcile_plan(desired, live)
    }
    assert got == pure
