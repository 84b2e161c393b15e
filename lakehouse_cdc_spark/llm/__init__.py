"""LLM-data-pipeline extension operators (north-star surface).

Beyond reference parity, the engine ships the operators a large-scale
training-data pipeline needs: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), embedding similarity search (brute-force
cosine baseline + bucketed scale path), text analysis (language-ID,
quality scoring, token counting, fingerprinting), and multimodal
binary-column plumbing.  Everything is built on native columnar
functions — no row-at-a-time Python in any hot path.
"""

from lakehouse_cdc_spark.llm.similarity import cosine_sim, cosine_topk
from lakehouse_cdc_spark.llm.text import token_count, tokens, word_shingles

__all__ = [
    "cosine_sim",
    "cosine_topk",
    "tokens",
    "token_count",
    "word_shingles",
]
