"""LLM-pipeline declared queries (dedup / similarity / text analysis).

Round-1 set: exact dedup, brute-force cosine top-k, token stats.
Widened in later slices with MinHash+LSH, SimHash, n-gram Jaccard,
IVF-bucketed ANN, language-ID, quality scoring, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.llm.similarity import cosine_topk
from lakehouse_cdc_spark.llm.text import token_count
from lakehouse_cdc_spark.plans.registry import davg, register, sql_davg, table


@register(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(text) AS text_hash,
           COUNT(*) AS dup_cnt,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact_documents(spark, sf_dir):
    """Exact dedup: hash-groupBy on content digest, keep lowest id.
    Map-side partial agg means only one row per distinct hash
    shuffles — at 100 TB the shuffle is |distinct docs|, not |docs|."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("dup_cnt"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@register(
    "emb_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(
             list_sum(list_transform(generate_series(1, 64),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> CAST(q.q_embedding[i] AS DOUBLE) * CAST(q.q_embedding[i] AS DOUBLE))))),
             6) AS cos_sim
    FROM embeddings e, q
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT 10
    """,
    bench=True,
    tags=("llm", "similarity", "ann"),
)
def emb_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 against the vec_id=0 embedding —
    native zip_with/aggregate vector math, broadcast query side."""
    emb = table(spark, sf_dir, "embeddings")
    query = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("q_embedding"))
    )
    return cosine_topk(emb, query, k=10)


_TOKCNT = "len(string_split_regex(trim(text), '\\s+'))"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS doc_cnt,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({_TOKCNT}) AS BIGINT) AS total_tokens,
           {sql_davg(_TOKCNT, 'avg_tokens')}
    FROM documents
    GROUP BY lang
    """,
    tags=("llm", "text"),
)
def text_token_stats(spark, sf_dir):
    """Token counting per language — whitespace tokenizer, all
    codegen'd (no UDF)."""
    d = table(spark, sf_dir, "documents")
    tc = token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(tc).cast("bigint").alias("total_tokens"),
        davg(tc.cast("double"), "avg_tokens"),
    )
