"""lakehouse_cdc_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference CDC lakehouse pipeline
(silverstar0727/lakehouse-cdc): Structured-Streaming CDC ingestion with
upsert/delete semantics over lakehouse tables, the full relational
operator surface its queries rely on, plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns), all
designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory + testdata table loader
- ``operators``  relational operators (dedup-rank, joins, aggs, set ops,
                 top-k, checksums) as composable DataFrame functions
- ``cdc``        CDC semantics: Debezium decode, op classify,
                 last-write-wins compaction, apply-changes upsert
- ``streaming``  Structured Streaming pipeline: watermark dedup,
                 event-time windows, idempotent foreachBatch MERGE writer
- ``functions``  scalar/aggregate helper Columns (checksums, text,
                 vector math)
- ``llm``        LLM-data-pipeline extensions: exact/fuzzy dedup,
                 embedding similarity search, text analysis, multimodal
- ``quality``    Spark-native validation operators (row-count diff,
                 checksum compare, freshness/lag)
- ``plans``      the declared query registry consumed by
                 ``__spark_entry__.py`` (queries + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
