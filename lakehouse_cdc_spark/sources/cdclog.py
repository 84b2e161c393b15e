"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic Debezium-style CDC change log.

The reference's change stream arrives via Kafka+Debezium
(``src/processor/spark_batch.py:304-406``); this sandbox has no
broker, so the engine ships a first-class Spark SOURCE instead of a
driver loop.  Every row derives purely from its offset (arithmetic +
md5 — the SRP-hyperplane reproducibility trick), so a DuckDB oracle
regenerates the identical log from ``generate_series`` and the whole
decode→classify→compact pipeline stays on the correctness gate.

Capabilities:

- **Batch read, partitioned generation** — one ``InputPartition`` per
  log partition (offset round-robin), rows generated lazily on
  executors; nothing materializes on the driver at any row count.
- **Filter pushdown** (``pushFilters``, Spark 4.1): ``EqualTo`` on
  ``part`` prunes whole input partitions before a single row is
  generated; ``>,>=,<,<=`` bounds on ``offset`` narrow each
  partition's generation range arithmetically.  The handled filters
  are consumed (not re-evaluated by Spark) — the Python-source
  equivalent of parquet's PushedFilters.
- **Streaming read** (``SimpleDataSourceStreamReader``) — replays the
  same log in bounded micro-batches with offset-range tracking, so
  the CDC pipeline's streaming form consumes the identical envelope
  stream the batch form scans.

Envelope row (offset o, P partitions, K key space):

- ``part``   = o % P
- ``id``     = 1 + (o * 7919) % K        (7919 prime → full key cycle)
- ``h``      = int(md5(str(o))[:8], 16)  (engine-neutral randomness)
- ``name``   = 'item_' || (h % 1000)
- deleted    = (h % 10 == 0)             (10% tombstones)
- ``ts_ms``  = 1700000000000 + o         (monotone arrival order)
- ``value``  = the flattened-Debezium JSON string of those fields
  (`ExtractNewRecordState` shape: payload fields + ``__deleted``,
  reference ``create_source_connector.py:32-35``)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = "offset BIGINT, part INT, value STRING"

_TS0 = 1_700_000_000_000


def _row(o: int, parts: int, keys: int) -> tuple[int, int, str]:
    h = int(hashlib.md5(str(o).encode()).hexdigest()[:8], 16)
    rid = 1 + (o * 7919) % keys
    deleted = "true" if h % 10 == 0 else "false"
    value = (
        f'{{"id": {rid}, "name": "item_{h % 1000}", '
        f'"__deleted": "{deleted}", "ts_ms": {_TS0 + o}}}'
    )
    return (o, o % parts, value)


class _Opts:
    """Parsed, validated reader options (shared batch/stream)."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))
        self.keys = int(options.get("keys", 100))
        if self.n < 0 or self.parts <= 0 or self.keys <= 0:
            raise ValueError("cdclog: n >= 0, parts > 0, keys > 0 required")


class CdcLogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.o = _Opts(options)
        self.lo = 0  # inclusive offset bound after pushdown
        self.hi = self.o.n - 1  # inclusive
        self.part_eq: int | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("part",):
                v = int(f.value)
                if self.part_eq is not None and self.part_eq != v:
                    # contradictory equalities (part = 1 AND part = 2):
                    # both filters are CONSUMED here, so Spark never
                    # re-evaluates them — record the contradiction by
                    # emptying the offset range so partitions() prunes
                    # the scan to [] (the correct empty result)
                    self.hi = self.lo - 1
                else:
                    self.part_eq = v
            elif isinstance(f, GreaterThan) and f.attribute == ("offset",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("offset",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("offset",):
                self.hi = min(self.hi, int(f.value) - 1)
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("offset",):
                self.hi = min(self.hi, int(f.value))
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self):
        ps = range(self.o.parts) if self.part_eq is None else [self.part_eq]
        return [
            InputPartition(p)
            for p in ps
            if 0 <= p < self.o.parts and self.lo <= self.hi
        ]

    def read(self, partition) -> Iterator[tuple]:
        if partition is None:
            # PySpark substitutes [None] when partitions() returns []
            # (fully-pruned scan) and still calls read — yield nothing
            return
        p, step = partition.value, self.o.parts
        # first offset >= lo congruent to p (mod parts)
        start = self.lo + (p - self.lo) % step
        for o in range(start, self.hi + 1, step):
            yield _row(o, step, self.o.keys)


class CdcLogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.o = _Opts(options)
        self.batch = int(options.get("batch", 100))
        if self.batch <= 0:
            raise ValueError("cdclog: batch > 0 required (batch <= 0 "
                             "would yield empty micro-batches forever)")

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.batch, self.o.n)
        rows = iter([_row(o, self.o.parts, self.o.keys) for o in range(lo, hi)])
        return rows, {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic generation ⇒ exact replay for recovery
        return iter(
            [
                _row(o, self.o.parts, self.o.keys)
                for o in range(int(start["offset"]), int(end["offset"]))
            ]
        )


class CdcLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdclog"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CdcLogBatchReader:
        return CdcLogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> CdcLogStreamReader:
        return CdcLogStreamReader(self.options)


def register_cdclog(spark) -> None:
    """Idempotently register the source with a session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, same pattern as ``nanosAsLong`` in ``registry.table``):
    Spark REFUSES to plan a reader that implements ``pushFilters``
    while the capability flag is off, so registration and the flag
    must travel together — including on the driver's vanilla harness
    session."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CdcLogDataSource)


#: DuckDB regeneration of the same log (shared CTE for oracles) —
#: md5 + arithmetic only, so both engines emit identical envelopes.
def duck_log_cte(n: int, parts: int, keys: int) -> str:
    return f"""
    log AS (
      SELECT o AS "offset",
             CAST(o % {parts} AS INT) AS part,
             1 + (o * 7919) % {keys} AS id,
             CAST('0x' || substr(md5(CAST(o AS VARCHAR)), 1, 8) AS BIGINT) AS h,
             {_TS0} + o AS ts_ms
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS o)
    ),
    envelope AS (
      SELECT "offset", part, id,
             'item_' || CAST(h % 1000 AS VARCHAR) AS name,
             (h % 10 = 0) AS deleted,
             ts_ms
      FROM log
    )
    """
