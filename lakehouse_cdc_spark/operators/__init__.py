"""Relational operators as composable DataFrame functions.

Each function is a thin, tested wrapper over declarative DataFrame
operations — Catalyst plans and optimizes the physical execution
(SURVEY §4: no custom planner rules are needed for parity).
"""

from lakehouse_cdc_spark.operators.dedup import latest_per_key
from lakehouse_cdc_spark.operators.joins import (
    anti_join,
    broadcast_join,
    equi_join,
    semi_join,
)
from lakehouse_cdc_spark.operators.checksum import (
    ordered_table_md5,
    table_checksum_stats,
)

__all__ = [
    "latest_per_key",
    "equi_join",
    "broadcast_join",
    "semi_join",
    "anti_join",
    "ordered_table_md5",
    "table_checksum_stats",
]
