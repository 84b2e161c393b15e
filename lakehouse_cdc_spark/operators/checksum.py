"""Table checksum operators (validation family).

The reference collapses a whole table to one MD5 via a global sort +
``collect_list`` + ``concat_ws`` + ``md5``
(``src/validation/validation.py:294-302``), with the PostgreSQL
``MD5(STRING_AGG(...))`` as its oracle (``:278-279``).  That formulation
is inherently serial (one concatenated string on one node).

We keep an order-*deterministic* variant for small-table parity checks
(``ordered_table_md5`` — sorts inside the aggregate via ``array_sort``
so it's independent of partitioning), and provide the scale path
``table_checksum_stats``: order-insensitive per-row MD5 reduced with
count / distinct-count / min / max — pure map-side work + one tiny
aggregate, valid at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_signature(df: DataFrame, cols: list[str] | None = None, sep: str = "#") -> Column:
    """Null-safe deterministic per-row string, as the reference builds
    with ``coalesce(col(c).cast("string"), lit(""))`` + ``concat_ws``
    (``src/validation/validation.py:291-294``)."""
    cols = cols or df.columns
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    return F.concat_ws(sep, *parts)


def ordered_table_md5(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-row DataFrame ``(table_md5 string, row_cnt bigint)``.

    Equivalent to the reference's orderBy → collect_list → concat_ws →
    md5 chain, but deterministic under any partitioning: rows are
    sorted *inside* the aggregate (``array_sort``) rather than relying
    on a global sort surviving ``collect_list``.  Small tables only —
    the concatenation materializes on one node by construction.
    """
    sig = row_signature(df, cols)
    return df.select(sig.alias("combined_cols")).agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("combined_cols")), ",")).alias(
            "table_md5"
        ),
        F.count(F.lit(1)).alias("row_cnt"),
    )


def table_checksum_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive checksum that scales: per-row MD5 (map-side,
    whole-stage codegen) reduced to ``(row_cnt, distinct_sigs,
    min_sig, max_sig, xor_sig)``.

    ``xor_sig`` is the bit-XOR of a 60-bit prefix of each row hash —
    a *content* aggregate every row contributes to, so any single-row
    change flips it with probability 1 - 2^-60 (min/max/count alone
    miss a mid-range row swap ~ (N-4)/N of the time).  XOR never
    overflows, is order- and partition-independent, and DuckDB
    reproduces it exactly (``bit_xor(CAST('0x'||substr(sig,1,15) AS
    BIGINT))``).  Residual blind spot: *pairs* of identical changes
    cancel in XOR, which count/distinct then catch — collisions
    require an adversarial md5 preimage, not bad luck.  No row ever
    leaves its partition except the five scalar partials.

    ``distinct_sigs`` counts distinct over TWO 60-bit integer halves
    of the hash (chars 1-15 and 17-31), not the 32-char hex string:
    the exact-distinct shuffle then moves 16 bytes of ints instead of
    ~40-byte strings (the round-2 20× win), and the 120-bit effective
    width puts the birthday bound at ~2^60 distinct rows — comfortably
    past any 100 TB table (a single 60-bit half would start colliding
    near 2^30 ≈ 1e9 rows and silently weaken the pair-cancellation
    backstop distinct/count provide for XOR)."""
    sig = F.md5(row_signature(df, cols))
    hi = F.expr("CAST(conv(substr(sig, 1, 15), 16, 10) AS BIGINT)")
    lo = F.expr("CAST(conv(substr(sig, 17, 15), 16, 10) AS BIGINT)")
    return (
        df.select(sig.alias("sig"))
        .select("sig", hi.alias("sig_hi"), lo.alias("sig_lo"))
        .agg(
            F.count(F.lit(1)).alias("row_cnt"),
            F.countDistinct("sig_hi", "sig_lo").alias("distinct_sigs"),
            F.min("sig").alias("min_sig"),
            F.max("sig").alias("max_sig"),
            F.expr("bit_xor(sig_hi)").alias("xor_sig"),
        )
    )
