"""Embedding quantization declared queries.

At 100 TB the embedding column dominates storage and shuffle width:
int8 symmetric quantization cuts vector bytes 4× (float32→int8) and
makes dot products EXACT integer arithmetic — candidate ranking
becomes bit-deterministic on any partitioning, with an optional fp32
rescore of the short list.  That rank-int8 / rescore-fp32 split is the
standard large-scale ANN serving layout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table

_DIM = 64

#: DuckDB fragments (embedding is array<float>; all math via DOUBLE)
_D_ABSMAX = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"


def _d_quant(tbl: str) -> str:
    return (
        f"list_transform({tbl}.embedding, x -> CAST(floor("
        f"CAST(x AS DOUBLE) * {tbl}.scale + 0.5) AS BIGINT))"
    )


@register(
    "emb_int8_quantize_topk",
    oracle=f"""
    WITH scaled AS (
      SELECT vec_id, embedding, 127.0 / {_D_ABSMAX} AS scale
      FROM embeddings
    ),
    quant AS (
      SELECT vec_id, embedding,
             {_d_quant('scaled')} AS q
      FROM scaled
    ),
    qv AS (SELECT embedding AS q_emb, q AS q_q FROM quant WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             list_sum(list_transform(generate_series(1, {_DIM}),
                      i -> e.q[i] * qv.q_q[i])) AS dot_q,
             list_sum(list_transform(generate_series(1, {_DIM}),
                      i -> e.q[i] * e.q[i])) AS nq_self,
             list_sum(list_transform(generate_series(1, {_DIM}),
                      i -> qv.q_q[i] * qv.q_q[i])) AS nq_query,
             round(
               list_sum(list_transform(generate_series(1, {_DIM}),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
                    i -> CAST(qv.q_emb[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE))))),
               6) AS cos_exact
      FROM quant e, qv
    )
    SELECT vec_id, dot_q,
           round(CAST(dot_q AS DOUBLE)
                 / (sqrt(CAST(nq_self AS DOUBLE)) * sqrt(CAST(nq_query AS DOUBLE))),
                 6) AS cos_q,
           cos_exact
    FROM scored
    ORDER BY dot_q DESC, vec_id ASC
    LIMIT 10
    """,
    tags=("llm", "similarity", "quantization", "topk"),
)
def emb_int8_quantize_topk(spark, sf_dir):
    """Int8 symmetric quantization (per-vector scale = 127/max|x|,
    explicit floor(x·s + 0.5) so rounding matches on every engine)
    followed by quantized top-10 against query vector 0.  Candidate
    RANKING uses the integer dot product — exact bigint arithmetic,
    so the order is identical on any partitioning — and the fp32
    cosine is carried alongside as the rescore column (the result
    itself exhibits the quantization error).  Broadcast query row,
    map-side math, TakeOrderedAndProject top-k: no shuffle of the
    corpus at any scale."""
    e = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    scale = 127.0 / F.array_max(F.transform(vec, lambda x: F.abs(x)))
    q = e.select(
        "vec_id",
        vec.alias("emb_d"),
        F.transform(
            vec, lambda x: F.floor(x * scale + 0.5).cast("bigint")
        ).alias("q"),
    )
    qv = q.filter(F.col("vec_id") == 0).select(
        F.col("emb_d").alias("q_emb"), F.col("q").alias("q_q")
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("q"), F.col("q_q"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    int_self = F.aggregate(
        F.zip_with(F.col("q"), F.col("q"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    int_query = F.aggregate(
        F.zip_with(F.col("q_q"), F.col("q_q"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    fdot = F.aggregate(
        F.zip_with(F.col("emb_d"), F.col("q_emb"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    fself = F.aggregate(
        F.zip_with(F.col("emb_d"), F.col("emb_d"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    fquery = F.aggregate(
        F.zip_with(F.col("q_emb"), F.col("q_emb"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        q.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            int_dot.alias("dot_q"),
            F.round(
                int_dot.cast("double")
                / (F.sqrt(int_self.cast("double")) * F.sqrt(int_query.cast("double"))),
                6,
            ).alias("cos_q"),
            F.round(fdot / (F.sqrt(fself) * F.sqrt(fquery)), 6).alias("cos_exact"),
        )
        .orderBy(F.desc("dot_q"), F.asc("vec_id"))
        .limit(10)
    )
