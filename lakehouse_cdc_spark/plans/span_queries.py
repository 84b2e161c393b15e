"""Span-level (substring) near-duplicate detection via winnowing.

Document-level dedup (exact md5, MinHash, SimHash — llm/dedup.py)
misses PARTIAL overlap: a document that embeds a long span of another
survives every whole-doc signature.  Winnowing (Schleimer, Wilkerson &
Aiken, SIGMOD 2003 — the MOSS algorithm) fixes that with a guarantee:
hash every k-token gram, slide a w-gram window, keep each window's
MINIMUM hash; any shared substring of length >= w + k - 1 tokens is
then guaranteed to contribute at least one IDENTICAL selected
fingerprint to both documents, while only ~2/(w+1) of gram hashes are
kept.

Reference parity: the reference has no substring-dedup operator; this
extends its dedup family (SURVEY §2 LLM additions) with the span-level
member every large-scale training-data pipeline needs.

Scale notes (100 TB): gram hashing and the winnowing window are
map-side per document (ONE shuffle on doc_id only if documents are
split across rows — here they are single rows, so selection is
entirely within a partition and the plan's first exchange is already
the fingerprint join).  The fingerprint join is bounded two ways:
winnowing itself drops ~60% of grams (w=4), and a document-frequency
cap on fingerprints (mirrored in the oracle) excises degenerate
boilerplate spans, the same guard dedup_ngram_jaccard uses — so the
pair stage is |postings|-shaped, never |docs|^2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table

_WIN_K = 4  # tokens per gram
_WIN_W = 4  # grams per winnowing window
_WIN_MAX_DF = 64  # fingerprint document-frequency cap
_WIN_SHARED = 5  # min shared fingerprints to emit a pair

_WIN_H_DUCK = (
    "CAST('0x' || substr(md5(array_to_string(t[p : p + {hi}], ' ')), 1, 15) "
    "AS BIGINT)"
).format(hi=_WIN_K - 1)
_WIN_H_SPARK = (
    "CAST(conv(substring(md5(concat_ws(' ', slice(t, p, {k}))), 1, 15), 16, 10) "
    "AS BIGINT)"
).format(k=_WIN_K)


@register(
    "dedup_winnowing_spans",
    bench=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, len(t) - {_WIN_K - 1} AS np,
             unnest(generate_series(1, len(t) - {_WIN_K - 1})) AS p
      FROM toks
    ),
    grams AS (
      SELECT doc_id, p, np, {_WIN_H_DUCK} AS h FROM pos
    ),
    winnowed AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
               AS fp,
             p, np
      FROM grams
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM winnowed WHERE p <= np - {_WIN_W - 1}
    ),
    capped AS (
      SELECT doc_id, fp FROM fps
      QUALIFY COUNT(*) OVER (PARTITION BY fp) <= {_WIN_MAX_DF}
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_WIN_SHARED}
    ORDER BY d1, d2
    """,
    tags=("llm", "dedup", "winnowing", "span", "fingerprint"),
)
def dedup_winnowing_spans(spark, sf_dir):
    """Winnowing span dedup: k=4-token gram hashes, w=4 window minima
    as fingerprints (guarantee: any shared run of >= w+k-1 = 7 tokens
    yields a common fingerprint), document-frequency-capped postings
    join, pairs sharing >= 5 fingerprints.  Hashes are 60-bit md5
    prefixes and the window min is an integer selection, so the
    fingerprint sets — and therefore the emitted pair list — are
    bit-identical in DuckDB.  Tokenize/hash/winnow are all map-side
    (documents are single rows; the window partitions by doc_id, which
    arrives pre-grouped); the ONLY data-sized shuffle is the
    fingerprint-keyed join, bounded by the ~2/(w+1) winnowing
    selection rate times the df-cap — the |postings| shape that keeps
    span dedup linear at 100 TB."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    pos = toks.select(
        "doc_id",
        "t",
        (F.size("t") - (_WIN_K - 1)).alias("np"),
        F.explode(F.sequence(F.lit(1), F.size("t") - (_WIN_K - 1))).alias("p"),
    )
    grams = pos.select("doc_id", "p", "np", F.expr(_WIN_H_SPARK).alias("h"))
    w_min = (
        Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, _WIN_W - 1)
    )
    winnowed = grams.select(
        "doc_id", "p", "np", F.min("h").over(w_min).alias("fp")
    )
    fps = (
        winnowed.filter(F.col("p") <= F.col("np") - (_WIN_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )
    capped = (
        fps.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("df") <= _WIN_MAX_DF)
        .select("doc_id", "fp")
    )
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= _WIN_SHARED)
        .orderBy("d1", "d2")
    )


# -- exact-substring duplicate spans (Lee et al. 2022) ----------------------

_ES_K = 8  # tokens per gram: a position is duplicated iff its 8-gram repeats
_ES_MIN_SPAN = 12  # emit only merged spans of >= 12 duplicated tokens

_ES_H_DUCK = (
    "CAST('0x' || substr(md5(array_to_string(t[p : p + {hi}], ' ')), 1, 15) "
    "AS BIGINT)"
).format(hi=_ES_K - 1)
_ES_H_SPARK = (
    "CAST(conv(substring(md5(concat_ws(' ', slice(t, p, {k}))), 1, 15), 16, 10) "
    "AS BIGINT)"
).format(k=_ES_K)

#: shared oracle CTE chain — tokens → gram hashes → corpus-repeated
#: positions → running-max island merge → one row per maximal span.
#: Both substring queries compose on `spans`; the island logic lives
#: in exactly one place per engine.
_ES_SPAN_CTES = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t) - {_ES_K - 1})) AS p
      FROM toks WHERE len(t) >= {_ES_K}
    ),
    grams AS (SELECT doc_id, p, {_ES_H_DUCK} AS h FROM pos),
    freq AS (SELECT h, COUNT(*) AS c FROM grams GROUP BY h),
    dup AS (SELECT g.doc_id, g.p FROM grams g JOIN freq f ON g.h = f.h
            WHERE f.c >= 2),
    islands AS (
      SELECT doc_id, p,
             CASE WHEN p > COALESCE(MAX(p + {_ES_K - 1}) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) + 1
                  THEN 1 ELSE 0 END AS new_island
      FROM dup
    ),
    numbered AS (
      SELECT doc_id, p,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM islands
    ),
    spans AS (
      SELECT doc_id,
             CAST(MIN(p) AS BIGINT) AS span_start,
             CAST(MAX(p) + {_ES_K - 1} AS BIGINT) AS span_end,
             CAST(MAX(p) + {_ES_K - 1} - MIN(p) + 1 AS BIGINT) AS dup_tokens
      FROM numbered
      GROUP BY doc_id, island
    )
"""


def _exact_substring_spans(spark, sf_dir):
    """Shared Spark half of the ExactSubstr pipeline: returns
    ``(toks, spans)`` where ``spans`` has one row per maximal
    corpus-repeated span — (doc_id, span_start, span_end, dup_tokens),
    unfiltered.  Mirrors ``_ES_SPAN_CTES`` exactly."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    pos = toks.filter(F.size("t") >= _ES_K).select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t") - (_ES_K - 1))).alias("p"),
    )
    grams = pos.select("doc_id", "p", F.expr(_ES_H_SPARK).alias("h"))
    # ONE |grams| shuffle: the corpus-wide occurrence count rides a
    # window over h (same pattern as the winnowing df-cap) — a
    # groupBy+join-back would shuffle the gram table twice
    dup = (
        grams.withColumn(
            "__c", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("__c") >= 2)
        .select("doc_id", "p")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.select(
        "doc_id",
        "p",
        F.when(
            F.col("p")
            > F.coalesce(
                F.max(F.col("p") + (_ES_K - 1)).over(w_prev), F.lit(-1)
            )
            + 1,
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        islands.select(
            "doc_id", "p", F.sum("new_island").over(w_run).alias("island")
        )
        .groupBy("doc_id", "island")
        .agg(
            F.min("p").cast("bigint").alias("span_start"),
            (F.max("p") + (_ES_K - 1)).cast("bigint").alias("span_end"),
            (F.max("p") + (_ES_K - 1) - F.min("p") + 1)
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .select("doc_id", "span_start", "span_end", "dup_tokens")
    )
    return toks, spans


@register(
    "dedup_exact_substring_spans",
    bench=True,
    oracle=_ES_SPAN_CTES
    + f"""
    SELECT doc_id, span_start, span_end, dup_tokens
    FROM spans
    WHERE dup_tokens >= {_ES_MIN_SPAN}
    ORDER BY doc_id, span_start
    """,
    tags=("llm", "dedup", "span", "exact-substring", "curation"),
)
def dedup_exact_substring_spans(spark, sf_dir):
    """EXACT-substring duplicate spans — the ExactSubstr dedup of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), which removes any substring repeated verbatim anywhere in
    the corpus, re-expressed relationally (their suffix array is a
    single-machine structure; the gram-frequency join below is its
    shuffle-native equivalent): a token position is *duplicated* iff
    its {_ES_K}-gram occurs >= 2 times corpus-wide (within- OR
    cross-document — both are training repeats), and overlapping
    duplicated positions merge into MAXIMAL spans via the classic
    running-max island scan.  Emits every merged span of >=
    {_ES_MIN_SPAN} tokens — the byte ranges a curation pass cuts out,
    in contrast to dedup_winnowing_spans which only *pairs up*
    documents sharing fingerprints.

    Scale shape: gram hashing is map-side; the frequency count and the
    postings join are |grams|-shaped shuffles keyed on the 60-bit hash
    (never |docs|^2); the island merge windows over doc_id — documents
    arrive pre-grouped from the join, and no global window exists.
    Hashes are md5 prefixes, so even collisions replay identically in
    the oracle."""
    _toks, spans = _exact_substring_spans(spark, sf_dir)
    return (
        spans.filter(F.col("dup_tokens") >= _ES_MIN_SPAN)
        .orderBy("doc_id", "span_start")
    )


@register(
    "dedup_substring_residual",
    oracle=_ES_SPAN_CTES
    + """,
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS total_tokens,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           CAST(len(t.t) - COALESCE(p.dup_tokens, 0) AS BIGINT)
             AS residual_tokens,
           CAST(COALESCE(p.dup_tokens, 0) * 1000 // len(t.t) AS BIGINT)
             AS dup_permille
    FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    ORDER BY t.doc_id
    """,
    tags=("llm", "dedup", "span", "exact-substring", "curation"),
)
def dedup_substring_residual(spark, sf_dir):
    """The budgeting view of exact-substring dedup: per document, how
    many tokens sit inside corpus-repeated spans (no minimum span
    length here — every merged island counts) and what survives after
    cutting them — the number that decides whether a source is worth
    keeping post-dedup.  ``dup_permille`` is exact integer
    (dup_tokens*1000 div total), so the distribution is
    engine-identical.

    Same |grams|-shaped shuffles as dedup_exact_substring_spans (the
    whole span pipeline is the shared ``_exact_substring_spans``
    helper); the per-doc rollup and the left join back to the corpus
    are doc_id keyed."""
    toks, spans = _exact_substring_spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("dup_tokens").cast("bigint").alias("dup_tokens"),
    )
    return (
        toks.select("doc_id", F.size("t").cast("bigint").alias("total_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            (F.col("total_tokens") - F.coalesce("dup_tokens", F.lit(0)))
            .cast("bigint")
            .alias("residual_tokens"),
            F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000 div total_tokens "
                "AS BIGINT)"
            ).alias("dup_permille"),
        )
        .orderBy("doc_id")
    )


_BP_TOP = 20


@register(
    "text_boilerplate_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, len(t) - {_WIN_K - 1} AS np,
             unnest(generate_series(1, len(t) - {_WIN_K - 1})) AS p
      FROM toks
    ),
    grams AS (
      SELECT doc_id, p, np,
             array_to_string(t[p : p + {_WIN_K - 1}], ' ') AS gram,
             {_WIN_H_DUCK} AS h
      FROM pos
    ),
    winnowed AS (
      SELECT doc_id, gram, h,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
               AS fp,
             p, np
      FROM grams
    ),
    -- a doc's selected fingerprints, each tagged with ONE gram whose
    -- hash equals the selected minimum (deterministic representative)
    fps AS (
      SELECT DISTINCT doc_id, fp FROM winnowed WHERE p <= np - {_WIN_W - 1}
    ),
    reps AS (
      SELECT h AS fp, MIN(gram) AS sample_gram FROM grams GROUP BY h
    ),
    df AS (
      SELECT fp, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM fps GROUP BY fp
    )
    SELECT d.fp, d.doc_freq, r.sample_gram
    FROM df d JOIN reps r ON r.fp = d.fp
    ORDER BY d.doc_freq DESC, d.fp
    LIMIT {_BP_TOP}
    """,
    tags=("llm", "text", "boilerplate", "winnowing", "curation"),
)
def text_boilerplate_spans(spark, sf_dir):
    """Boilerplate mining — the other use of winnowing fingerprints:
    rank selected fingerprints by DOCUMENT FREQUENCY and surface the
    spans that appear across the most documents (headers, footers,
    license blocks — the text a curation pipeline strips before
    training, and exactly what dedup_winnowing_spans' df-cap
    excises).  Each fingerprint carries a deterministic representative
    gram (min gram among those hashing to it) so the output is
    human-auditable.  Same map-side winnowing pass; the df ranking is
    one fingerprint-keyed count — the |postings| shape again."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    pos = toks.select(
        "doc_id",
        "t",
        (F.size("t") - (_WIN_K - 1)).alias("np"),
        F.explode(F.sequence(F.lit(1), F.size("t") - (_WIN_K - 1))).alias("p"),
    )
    grams = pos.select(
        "doc_id",
        "p",
        "np",
        F.expr(f"concat_ws(' ', slice(t, p, {_WIN_K}))").alias("gram"),
        F.expr(_WIN_H_SPARK).alias("h"),
    )
    w_min = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, _WIN_W - 1)
    winnowed = grams.select(
        "doc_id", "p", "np", F.min("h").over(w_min).alias("fp")
    )
    fps = (
        winnowed.filter(F.col("p") <= F.col("np") - (_WIN_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )
    reps = grams.groupBy(F.col("h").alias("fp")).agg(
        F.min("gram").alias("sample_gram")
    )
    df = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        df.join(reps, "fp")
        .select("fp", "doc_freq", "sample_gram")
        .orderBy(F.desc("doc_freq"), F.asc("fp"))
        .limit(_BP_TOP)
    )
