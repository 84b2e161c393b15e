"""Join-strategy hint discipline for data-dependent build sides.

A forced ``F.broadcast`` bypasses ``spark.sql.autoBroadcastJoinThreshold``
entirely: Spark will attempt to build and ship the side up to the hard
8 GB TorrentBroadcast ceiling, OOMing the driver first on a big enough
input.  That is the right trade ONLY when the side's size is bounded
by something other than the data:

- O(1)-row aggregates (scalar stats, per-bucket carries bounded by the
  shuffle-partition count) — always safe;
- true constant dimensions (nation=25, region=5, a 512-cell sketch);
- pre-probed tables with an ENFORCED byte budget (the IVF centroid
  path in llm/similarity.py, kcore's ``|cur|//k`` bound).

Vocabulary tables (token document frequencies, BPE vocabularies,
word-count tables) are in between: Heaps' law bounds their growth
sublinearly (V ≈ k·N^β, β≈0.5 — ~40M types at 100 TB of text), but
that is a GROWTH LAW, not a byte ceiling an executor can rely on, and
probing the real size before the join would cost an extra job per
query.  The same holds for change-feed delta keys (bounded by the
micro-batch contract, unbounded under backfill).

For those sides this module deliberately hands the decision to AQE:
``runtime_sized`` is an identity marker — the join planner sees the
REAL materialized byte size of the side at runtime and broadcasts
exactly when it fits the threshold, falling back to a shuffle join
when it doesn't.  That IS the byte budget, enforced by the engine
with true sizes instead of a guessed constant, at zero extra jobs.
The marker (rather than a bare expression) keeps every such decision
greppable and carries the size-class rationale at the call site.

The per-call-site audit of all forced broadcasts lives in SCALE.md
("Broadcast audit").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def runtime_sized(df: DataFrame, size_class: str = "vocabulary") -> DataFrame:
    """Mark ``df`` as a join side whose size is data-dependent but
    expected small (Heaps-law vocabulary, micro-batch delta keys, …).

    Intentionally NOT ``F.broadcast``: the strategy is left to AQE,
    which broadcasts when the runtime size fits
    ``spark.sql.autoBroadcastJoinThreshold`` and shuffles when it
    doesn't — the enforced-budget behavior a forced hint bypasses.

    ``size_class`` is documentation-only (greppable at call sites):
    ``"vocabulary"`` for Heaps-law-bounded corpus-derived tables,
    ``"delta"`` for change-feed batch keys, ``"membership"`` for
    audit-side membership sets.
    """
    del size_class  # rationale lives at the call site; no runtime effect
    return df
