"""Declared query registry — the engine's public, judged surface.

Every operator from SURVEY §2 is exposed as a named query here; the
driver compares each against its DuckDB oracle (sf0.01) and benches
the headline set (sf0.1).  Importing this package populates
``REGISTRY``.
"""

from lakehouse_cdc_spark.plans.registry import REGISTRY, QuerySpec, register, table

# import for side effects: each module registers its queries
from lakehouse_cdc_spark.plans import relational  # noqa: E402,F401
from lakehouse_cdc_spark.plans import cdc_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import llm_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import validation_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import relational2  # noqa: E402,F401
from lakehouse_cdc_spark.plans import relational3  # noqa: E402,F401
from lakehouse_cdc_spark.plans import temporal_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import graph_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import relational4  # noqa: E402,F401
from lakehouse_cdc_spark.plans import profiling_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import quant_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import curation_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import timeseries_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import er_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import tokenizer_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import sketch_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import sql_modern  # noqa: E402,F401
from lakehouse_cdc_spark.plans import span_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import funnel_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import spatial_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import lm_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import source_queries  # noqa: E402,F401
from lakehouse_cdc_spark.plans import semantics_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "table"]
