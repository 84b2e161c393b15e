"""Text-analysis primitives for training-data pipelines.

Pure native-function Columns (split / regexp / transform) — the hot
path stays inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """n-word shingles (space-joined) → array<string>.

    Documents shorter than ``n`` words yield a single shingle of the
    whole text, so no document silently disappears from dedup.
    """
    toks = tokens(text)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
