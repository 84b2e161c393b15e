"""Curation / governance declared queries (round 2 wave 6).

The last mile of a training-data pipeline, each stage oracle-checked:

- ``text_repetition_quality`` — Gopher-style repetition filters
  (top-token / top-bigram fraction, distinct-token ratio).
- ``contamination_ngram_overlap`` — benchmark-contamination scan:
  n-gram collisions between a held-out eval slice and the training
  corpus (the train/test leak detector every LLM pipeline runs).
- ``dedup_keep_best`` — near-dup groups resolved to ONE kept document
  by quality argmax (components choose the best member, not just the
  lowest id).
- ``mix_sources_budget`` — deterministic per-source mixing rates via
  content hashing (the data-mixture step, reproducible on any engine).
- ``pii_pseudonymize`` — deterministic pseudonymization + value
  generalization of identifier-bearing columns (governance pass).

Reference parity: extends /root/reference/src/validation/validation.py's
data-quality family with the LLM-curation stages the reference's OLTP
focus never needed; same declarative, oracle-checked contract.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.llm.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_table,
)
from lakehouse_cdc_spark.llm.text import quality_score, token_count, tokens, word_shingles
from lakehouse_cdc_spark.operators.hints import runtime_sized
from lakehouse_cdc_spark.operators.graph import connected_components
from lakehouse_cdc_spark.plans.llm_queries import (
    _BAND_UNION,
    _BANDS,
    _LSH_MAX_BUCKET,
    _MINS,
    _Q_DIGIT,
    _Q_NTOK,
    _Q_PUNCT,
    _Q_STOP,
    _SH_CTE,
)
from lakehouse_cdc_spark.plans.registry import register, table

#: the shared quality formula (mirror of llm/text.py:quality_score)
_QUALITY_SQL = f"""round(0.4 * least({_Q_NTOK} / 100.0, 1.0)
               + 0.4 * least(CAST({_Q_STOP} AS DOUBLE)
                             / greatest({_Q_NTOK}, 1.0) * 5.0, 1.0)
               + 0.2 * (1.0 - least(({_Q_PUNCT} / greatest(CAST(length(text) AS DOUBLE), 1.0)
                                    + {_Q_DIGIT} / greatest(CAST(length(text) AS DOUBLE), 1.0))
                                    * 5.0, 1.0)),
               6)"""


def _sh_cte_n(n: int) -> str:
    """DuckDB CTE for distinct n-word shingles per document (mirror of
    llm/dedup.py:shingle_table at arbitrary n; llm_queries._SH_CTE is
    the n=3 instance)."""
    return f"""
    toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
             FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - {n - 1}, 1))) AS i
            FROM toks),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS shingle
           FROM idx)
"""


@register(
    "text_repetition_quality",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    tcnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    tstat AS (SELECT doc_id,
                     CAST(SUM(c) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct,
                     MAX(c) AS top_tok
              FROM tcnt GROUP BY doc_id),
    toks2 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents),
    bidx AS (SELECT doc_id, t,
                    unnest(generate_series(1, greatest(len(t) - 1, 1))) AS i
             FROM toks2),
    bg AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS b FROM bidx),
    bcnt AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    bstat AS (SELECT doc_id, MAX(c) AS top_bg, SUM(c) AS n_bg
              FROM bcnt GROUP BY doc_id)
    SELECT t.doc_id,
           t.n_tokens,
           round(CAST(t.n_distinct AS DOUBLE) / CAST(t.n_tokens AS DOUBLE), 6)
             AS distinct_ratio,
           round(CAST(t.top_tok AS DOUBLE) / CAST(t.n_tokens AS DOUBLE), 6)
             AS top_token_frac,
           round(CAST(b.top_bg AS DOUBLE) / CAST(b.n_bg AS DOUBLE), 6)
             AS top_bigram_frac,
           (CAST(t.n_distinct AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) < 0.5
            OR CAST(b.top_bg AS DOUBLE) / CAST(b.n_bg AS DOUBLE) > 0.05)
             AS repetitive
    FROM tstat t JOIN bstat b ON t.doc_id = b.doc_id
    """,
    tags=("llm", "text", "quality", "repetition"),
)
def text_repetition_quality(spark, sf_dir):
    """Gopher-style repetition filters: per-document distinct-token
    ratio, most-frequent-token fraction, most-frequent-bigram fraction,
    and the composite ``repetitive`` flag (distinct ratio < 0.5 or top
    bigram > 5%) a curation pass drops on.  Both profiles are one
    explode → two-level aggregation with map-side partials; nothing is
    quadratic and no UDF runs, so the filter costs one corpus scan at
    any scale.  Both flag polarities occur at sf0.01."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tstat = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").alias("top_tok"),
        )
    )
    bg = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 2)).alias("b")
    )
    bstat = (
        bg.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("n_bg"))
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
    top_tok_frac = F.col("top_tok").cast("double") / F.col("n_tokens").cast("double")
    top_bg_frac = F.col("top_bg").cast("double") / F.col("n_bg").cast("double")
    return tstat.join(bstat, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_tok_frac, 6).alias("top_token_frac"),
        F.round(top_bg_frac, 6).alias("top_bigram_frac"),
        ((distinct_ratio < 0.5) | (top_bg_frac > 0.05)).alias("repetitive"),
    )


#: contamination-scan shingle size and train-side document-frequency
#: cap: 4-word shingles in more than 3 training docs are boilerplate,
#: not leakage — dropping them bounds the collision join's fan-out at
#: 3 per shingle (the cap genuinely triggers at sf0.01: max DF is 4).
_CONTAM_N = 4
_CONTAM_MAX_DF = 3


@register(
    "contamination_ngram_overlap",
    bench=True,
    oracle=f"""
    WITH {_sh_cte_n(_CONTAM_N)},
    ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 = 1),
    tr AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh WHERE doc_id % 50 != 1)
      WHERE df <= {_CONTAM_MAX_DF}
    )
    SELECT ev.doc_id AS eval_doc,
           tr.doc_id AS train_doc,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM ev JOIN tr ON ev.shingle = tr.shingle
    GROUP BY 1, 2
    """,
    tags=("llm", "curation", "contamination", "dedup"),
)
def contamination_ngram_overlap(spark, sf_dir):
    """Benchmark-contamination scan: 4-gram collisions between the
    held-out eval slice (doc_id % 50 = 1) and the training corpus —
    the train/test leak detector run before every LLM training job.
    Inverted-index shape (shingle equi-join, map-side distinct inside
    each row), with a train-side shingle-DF cap (> 3 docs = boilerplate,
    no leakage signal) bounding join fan-out exactly like the Jaccard
    DF cap; the cap triggers at sf0.01.  Finds the planted eval/train
    near-duplicate (90 shared shingles) plus background collisions."""
    sh = shingle_table(table(spark, sf_dir, "documents"), n=_CONTAM_N)
    ev = sh.filter(F.col("doc_id") % 50 == 1).select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    tr = sh.filter(F.col("doc_id") % 50 != 1)
    freq_w = Window.partitionBy("shingle")
    tr = (
        tr.withColumn("__df", F.count(F.lit(1)).over(freq_w))
        .filter(F.col("__df") <= _CONTAM_MAX_DF)
        .select(F.col("doc_id").alias("train_doc"), "shingle")
    )
    return (
        ev.join(tr, "shingle")
        .groupBy("eval_doc", "train_doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_SH_CTE},
    sig AS (SELECT doc_id,
             {_MINS}
            FROM sh GROUP BY doc_id),
    bands AS (SELECT doc_id,
             {_BANDS}
            FROM sig),
    cand AS (
{_BAND_UNION}
    ),
    sym AS (SELECT da AS u, db AS v FROM cand
            UNION SELECT db, da FROM cand),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.v, w.label FROM walk w JOIN sym e ON e.u = w.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
    quality AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents),
    member AS (
      SELECT comp.component, comp.node, q.quality
      FROM comp JOIN quality q ON q.doc_id = comp.node
    )
    SELECT dup_group, group_size, keep_doc_id, keep_quality FROM (
      SELECT component AS dup_group,
             CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS group_size,
             node AS keep_doc_id,
             quality AS keep_quality,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY quality DESC, node ASC) AS rn
      FROM member) WHERE rn = 1
    """,
    tags=("llm", "dedup", "curation", "graph"),
)
def dedup_keep_best(spark, sf_dir):
    """Near-dup resolution a real pipeline ships: LSH candidate pairs
    → connected components → keep the HIGHEST-QUALITY member of each
    group (quality argmax, doc_id tie-break) instead of the naive
    lowest-id.  The quality join touches only component members (a few
    % of the corpus), the argmax is one per-component window, and the
    component iteration is the tested O(diameter)-round min-label
    propagation — no stage is quadratic.  Oracle replays the closure
    with a recursive CTE plus the same quality formula."""
    d = table(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, k=8)
    pairs = lsh_candidate_pairs(
        sigs, bands=4, rows_per_band=2, max_bucket_size=_LSH_MAX_BUCKET
    )
    cc = connected_components(pairs, src="da", dst="db")
    q = d.select("doc_id", quality_score(F.col("text")).alias("quality"))
    member = cc.join(q, cc["node"] == q["doc_id"]).select(
        "component", "node", "quality"
    )
    w = Window.partitionBy("component").orderBy(F.desc("quality"), F.asc("node"))
    sz = Window.partitionBy("component")
    return (
        member.withColumn("group_size", F.count(F.lit(1)).over(sz).cast("bigint"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("component").alias("dup_group"),
            "group_size",
            F.col("node").alias("keep_doc_id"),
            F.col("quality").alias("keep_quality"),
        )
    )


@register(
    "mix_sources_budget",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source, text,
             (['40', '80', 'c0', 'zz'])[(CAST(substr(source, 4) AS INT) % 4) + 1]
               AS thr
      FROM documents
    ),
    kept AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(text), '\\s+')) AS ntok,
             thr
      FROM rated
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < thr
    )
    SELECT source,
           MIN(thr) AS rate_thr,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           bit_xor(doc_id) AS kept_ids_xor
    FROM kept
    GROUP BY source
    """,
    tags=("llm", "sampling", "curation", "mixing"),
)
def mix_sources_budget(spark, sf_dir):
    """The data-mixture step: each source gets a sampling rate (25%,
    50%, 75% or 100% by source index mod 4 — stand-in for the tuned
    per-source weights of a training mix), applied by CONTENT-HASH
    membership (md5 prefix vs per-source threshold) so the same docs
    are kept on any engine, any partitioning, any rerun, and new data
    composes without reshuffling old membership.  Pure map-side filter
    + one aggregation; the XOR digest proves the exact kept SET.  All
    four rates are exercised at sf0.01 (20 sources)."""
    d = table(spark, sf_dir, "documents")
    thr = F.element_at(
        F.array(F.lit("40"), F.lit("80"), F.lit("c0"), F.lit("zz")),
        (F.substring("source", 4, 8).cast("int") % 4) + 1,
    )
    kept = (
        d.withColumn("thr", thr)
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < F.col("thr"))
    )
    return kept.groupBy("source").agg(
        F.min("thr").alias("rate_thr"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
        F.expr("bit_xor(doc_id)").alias("kept_ids_xor"),
    )


@register(
    "pii_pseudonymize",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked_name,
           substr(md5(regexp_extract(c_name, '([0-9]+)', 1)), 1, 8)
             AS surrogate_id,
           CAST(floor(c_acctbal / 1000.0) AS INT) AS acctbal_band
    FROM customer
    """,
    tags=("pii", "governance", "curation"),
)
def pii_pseudonymize(spark, sf_dir):
    """Governance pass over an identifier-bearing dimension:
    identifiers are masked (digit runs → '#'), replaced by a
    DETERMINISTIC surrogate (md5 of the extracted id — the same entity
    maps to the same surrogate across tables and runs, so joins still
    work after pseudonymization), and the quasi-identifier
    ``acctbal`` is generalized to 1000-unit bands (k-anonymity-style
    coarsening).  Pure per-row expressions — codegen'd, shuffle-free,
    trivially 100 TB-safe."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("masked_name"),
        F.substring(
            F.md5(F.regexp_extract("c_name", "([0-9]+)", 1)), 1, 8
        ).alias("surrogate_id"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("acctbal_band"),
    )


@register(
    "text_rare_token_ratio",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    flagged AS (
      SELECT t.doc_id, t.tok,
             CASE WHEN d.df * 10 < n.n_docs THEN 1 ELSE 0 END AS is_rare
      FROM tok t JOIN dfreq d USING (tok), n
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(is_rare) AS BIGINT) AS rare_tokens,
           CAST(SUM(is_rare) AS DOUBLE) / COUNT(*) AS rare_ratio
    FROM flagged
    GROUP BY doc_id
    """,
    tags=("llm", "text", "quality", "curation"),
)
def text_rare_token_ratio(spark, sf_dir):
    """Rare-token (OOV-style) quality signal: the fraction of each
    document's tokens whose CORPUS document frequency is under 10% of
    the corpus — high ratios flag gibberish/markup/misencoded docs in
    real pipelines.  Two aggregations (token DF, per-doc rollup) and
    one equi-join of the exploded tokens against the DF table; the DF
    table is vocabulary-sized (≪ corpus), so Catalyst broadcasts it —
    the exploded token stream itself never reshuffles.  Integer
    df*10 < n_docs comparison and exact int/int division keep the
    ratio bit-identical across engines."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    flagged = (
        tok.join(runtime_sized(dfreq, "vocabulary"), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.when(F.col("df") * 10 < F.col("n_docs"), 1)
            .otherwise(0)
            .alias("is_rare"),
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("is_rare").cast("bigint").alias("rare_tokens"),
        (F.sum("is_rare").cast("double") / F.count(F.lit(1))).alias("rare_ratio"),
    )


_TEMP_SCALE = 1_000_000  # fixed-point scale for sqrt(n) partials


@register(
    "mix_temperature_weights",
    oracle=f"""
    WITH ns AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT source, n_docs, n_chars,
             CAST(floor(sqrt(CAST(n_chars AS DOUBLE)) * {_TEMP_SCALE})
                  AS BIGINT) AS s
      FROM ns
    ),
    tot AS (SELECT SUM(s) AS st, SUM(n_chars) AS nt FROM scaled)
    SELECT sc.source, sc.n_docs, sc.n_chars,
           round(CAST(sc.n_chars AS DOUBLE) / tot.nt, 8) AS p_natural,
           round(CAST(sc.s AS DOUBLE) / tot.st, 8) AS p_temperature,
           round((CAST(sc.s AS DOUBLE) / tot.st)
                 / (CAST(sc.n_chars AS DOUBLE) / tot.nt), 6) AS upsample_factor
    FROM scaled sc, tot
    ORDER BY sc.source
    """,
    tags=("llm", "curation", "mixing", "temperature"),
)
def mix_temperature_weights(spark, sf_dir):
    """Temperature-scaled source mixing (the alpha=0.5 sampling scheme
    multilingual/multi-source training runs use: q_i proportional to
    p_i^alpha flattens the source distribution so small sources are
    not drowned): per source, natural share p_i = chars_i/total vs
    temperature share q_i = sqrt(chars_i)/sum_j sqrt(chars_j), plus
    the upsample factor q_i/p_i a sampler would apply.  Determinism:
    sqrt is IEEE-correctly-rounded in both engines, and each sqrt is
    floor-scaled to an INTEGER before the cross-source sum — so the
    normalizing constant is an exact bigint sum (order-independent),
    never a float accumulation.  One map-side-combined aggregate into
    |sources| rows; the weights table is what the downstream
    mix_sources_budget-style hash sampler consumes."""
    ns = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    scaled = ns.withColumn(
        "s",
        F.floor(F.sqrt(F.col("n_chars").cast("double")) * _TEMP_SCALE).cast(
            "bigint"
        ),
    )
    tot = scaled.agg(
        F.sum("s").alias("st"), F.sum("n_chars").alias("nt")
    )
    return (
        scaled.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(F.col("n_chars").cast("double") / F.col("nt"), 8).alias(
                "p_natural"
            ),
            F.round(F.col("s").cast("double") / F.col("st"), 8).alias(
                "p_temperature"
            ),
            F.round(
                (F.col("s").cast("double") / F.col("st"))
                / (F.col("n_chars").cast("double") / F.col("nt")),
                6,
            ).alias("upsample_factor"),
        )
        .orderBy("source")
    )


def _split_oracle() -> str:
    from lakehouse_cdc_spark.plans.llm_queries import (
        _BAND_UNION,
        _BANDS,
        _MINS,
        _SH_CTE,
    )

    return f"""
    WITH RECURSIVE {_SH_CTE},
    sig AS (SELECT doc_id,
             {_MINS}
            FROM sh GROUP BY doc_id),
    bands AS (SELECT doc_id,
             {_BANDS}
            FROM sig),
    cand AS (
{_BAND_UNION}
    ),
    sym AS (SELECT da AS u, db AS v FROM cand
            UNION SELECT db, da FROM cand),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.v, w.label FROM walk w JOIN sym e ON e.u = w.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
    assigned AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS canonical,
             CASE WHEN CAST('0x' || substr(md5(CAST(COALESCE(c.component, d.doc_id)
                                                    AS VARCHAR)), 1, 1) AS BIGINT) < 12
                    THEN 'train'
                  WHEN CAST('0x' || substr(md5(CAST(COALESCE(c.component, d.doc_id)
                                                    AS VARCHAR)), 1, 1) AS BIGINT) < 14
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS leakage_pairs
      FROM cand
      JOIN assigned a1 ON a1.doc_id = cand.da
      JOIN assigned a2 ON a2.doc_id = cand.db
      WHERE a1.split <> a2.split
    )
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT a.canonical) AS BIGINT) AS n_clusters,
           bit_xor(a.doc_id) AS doc_xor,
           MAX(l.leakage_pairs) AS leakage_pairs
    FROM assigned a, leak l
    GROUP BY a.split
    ORDER BY a.split
    """


@register(
    "sample_leakage_safe_split",
    oracle=_split_oracle(),
    tags=("llm", "curation", "split", "dedup", "graph"),
)
def sample_leakage_safe_split(spark, sf_dir):
    """Cluster-aware train/val/test split — the guard that stops
    near-duplicate leakage from inflating eval scores: documents are
    first grouped into near-dup clusters (MinHash+LSH candidates
    promoted to connected components, the dedup_connected_components
    machinery), then the split is assigned by hashing the CLUSTER
    canonical id, so every member of a cluster lands in the same
    split by construction.  The emitted leakage_pairs column counts
    candidate pairs straddling splits — MUST be 0, oracle-enforced
    (hash the doc_id instead and it is not).  Split shares ride the
    first md5 hex digit of the canonical (12/2/2 of 16) — content-
    derived, so the split is reproducible on any cluster and stable
    under re-ingestion.  Scale shape: LSH + CC are the documented
    bounded paths; assignment is map-side; the leakage audit joins
    the pair list (LSH-bucket-capped) against the assignment twice on
    doc_id."""
    from lakehouse_cdc_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from lakehouse_cdc_spark.operators.graph import connected_components
    from lakehouse_cdc_spark.plans.llm_queries import _LSH_MAX_BUCKET

    docs = table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, k=8)
    # feeds connected_components AND the leakage join — one build per
    # invocation (localCheckpoint; a bare persist would leak this plan
    # into the CacheManager for the next invocation to reuse)
    pairs = lsh_candidate_pairs(
        sigs, bands=4, rows_per_band=2, max_bucket_size=_LSH_MAX_BUCKET
    ).localCheckpoint()
    cc = connected_components(pairs, src="da", dst="db")
    h = F.expr(
        "CAST(conv(substring(md5(CAST(canonical AS STRING)), 1, 1), 16, 10) "
        "AS BIGINT)"
    )
    assigned = (
        docs.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("canonical"),
        )
        .withColumn(
            "split",
            F.when(h < 12, "train").when(h < 14, "val").otherwise("test"),
        )
        # read by both leakage-join endpoints and the split histogram
        .localCheckpoint()
    )
    a1 = assigned.select(
        F.col("doc_id").alias("da"), F.col("split").alias("split_a")
    )
    a2 = assigned.select(
        F.col("doc_id").alias("db"), F.col("split").alias("split_b")
    )
    leak = (
        pairs.join(a1, "da")
        .join(a2, "db")
        .filter(F.col("split_a") != F.col("split_b"))
        .agg(F.count(F.lit(1)).alias("leakage_pairs"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical").alias("n_clusters"),
            F.expr("bit_xor(doc_id)").alias("doc_xor"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_docs", "n_clusters", "doc_xor", "leakage_pairs")
        .orderBy("split")
    )


def _cascade_oracle() -> str:
    from lakehouse_cdc_spark.plans.llm_queries import (
        _BAND_UNION,
        _BANDS,
        _MINS,
        _SH_CTE,
    )

    sh_on_surv = _SH_CTE.replace("FROM documents", "FROM surv")
    return f"""
    WITH RECURSIVE surv AS (
      SELECT * FROM documents
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id ASC) = 1
    ),
    {sh_on_surv},
    sig AS (SELECT doc_id,
             {_MINS}
            FROM sh GROUP BY doc_id),
    bands AS (SELECT doc_id,
             {_BANDS}
            FROM sig),
    cand AS (
{_BAND_UNION}
    ),
    sym AS (SELECT da AS u, db AS v FROM cand
            UNION SELECT db, da FROM cand),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.v, w.label FROM walk w JOIN sym e ON e.u = w.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_after_exact,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM comp
              WHERE node <> component) AS removed_near
    )
    SELECT n_docs,
           n_docs - n_after_exact AS removed_exact,
           removed_near,
           n_after_exact - removed_near AS n_kept,
           round(CAST(n_docs - n_after_exact AS DOUBLE) / n_docs, 6)
             AS exact_rate,
           round(CAST(removed_near AS DOUBLE) / n_after_exact, 6)
             AS near_rate,
           round(CAST(n_after_exact - removed_near AS DOUBLE) / n_docs, 6)
             AS keep_rate
    FROM stats
    """


@register(
    "dedup_cascade_report",
    oracle=_cascade_oracle(),
    tags=("llm", "dedup", "cascade", "pipeline-economics"),
)
def dedup_cascade_report(spark, sf_dir):
    """Dedup-cascade economics — the per-stage removal accounting every
    curation pipeline publishes: stage 1 removes byte-exact copies
    (md5 canonical, cheapest first), stage 2 runs MinHash+LSH →
    connected components ONLY on the exact survivors and removes the
    non-canonical member of every near-dup group.  Ordering matters
    operationally (each stage shrinks the next stage's input — here
    LSH shingles ~stage-1-survivors instead of the full corpus) and
    statistically (near-dup rates are reported against the deduped
    base, not inflated by exact copies).  The oracle replays both
    stages including the recursive-CTE closure, so the whole
    cascade's arithmetic is pinned.  Scale posture inherits from the
    member operators: one md5 window, the LSH-bucket-capped pair
    join, and the bounded CC iteration."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from lakehouse_cdc_spark.operators.graph import connected_components
    from lakehouse_cdc_spark.plans.llm_queries import _LSH_MAX_BUCKET

    docs = table(spark, sf_dir, "documents")
    surv = (
        docs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy(F.asc("doc_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        # survivors feed the signature pipeline and the count readout;
        # materialized per invocation (no cross-run CacheManager entry)
        .localCheckpoint()
    )
    sigs = minhash_signatures(surv, k=8)
    pairs = lsh_candidate_pairs(
        sigs, bands=4, rows_per_band=2, max_bucket_size=_LSH_MAX_BUCKET
    )
    cc = connected_components(pairs, src="da", dst="db")
    counts = (
        docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(surv.agg(F.count(F.lit(1)).alias("n_after_exact")))
        .crossJoin(
            cc.filter(F.col("node") != F.col("component")).agg(
                F.count(F.lit(1)).alias("removed_near")
            )
        )
    )
    return counts.select(
        "n_docs",
        (F.col("n_docs") - F.col("n_after_exact")).alias("removed_exact"),
        "removed_near",
        (F.col("n_after_exact") - F.col("removed_near")).alias("n_kept"),
        F.round(
            (F.col("n_docs") - F.col("n_after_exact")).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("exact_rate"),
        F.round(
            F.col("removed_near").cast("double") / F.col("n_after_exact"), 6
        ).alias("near_rate"),
        F.round(
            (F.col("n_after_exact") - F.col("removed_near")).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("keep_rate"),
    )


_APPORTION_BUDGET = 10_000  # sample slots to allocate


@register(
    "sample_apportion_quotas",
    oracle=f"""
    WITH ns AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM ns),
    shares AS (
      SELECT ns.source, ns.n,
             (ns.n * {_APPORTION_BUDGET}) // t.nt AS floor_quota,
             (ns.n * {_APPORTION_BUDGET}) % t.nt AS remainder
      FROM ns, tot t
    ),
    short AS (
      SELECT CAST({_APPORTION_BUDGET} - SUM(floor_quota) AS BIGINT) AS slots
      FROM shares
    ),
    ranked AS (
      SELECT s.*, ROW_NUMBER() OVER (ORDER BY s.remainder DESC, s.source)
               AS rr
      FROM shares s
    )
    SELECT r.source, r.n, r.floor_quota,
           CAST(CASE WHEN r.rr <= sh.slots THEN 1 ELSE 0 END AS BIGINT)
             AS bonus,
           r.floor_quota
             + CASE WHEN r.rr <= sh.slots THEN 1 ELSE 0 END AS quota
    FROM ranked r, short sh
    ORDER BY r.source
    """,
    tags=("llm", "sampling", "apportionment", "curation"),
)
def sample_apportion_quotas(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment of a fixed sample
    budget across sources — the integer-correct answer to \"take
    10,000 docs proportionally\": floor quotas always under-allocate,
    and naive per-source rounding can over- or under-shoot the budget;
    distributing the leftover slots by largest remainder (totally
    ordered, remainder then name) is the standard method that sums to
    the budget EXACTLY.  Every quantity is an integer (remainders via
    modulo, never floats), so the quota table is engine-identical —
    and downstream, mix_sources_budget-style hash sampling consumes
    exactly these quotas."""
    from lakehouse_cdc_spark.operators.prefix import row_number_two_pass

    ns = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = ns.agg(F.sum("n").alias("nt"))
    shares = ns.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr(f"(n * {_APPORTION_BUDGET}) div nt").alias("floor_quota"),
        F.expr(f"(n * {_APPORTION_BUDGET}) % nt").alias("remainder"),
    )
    short = shares.agg(
        (F.lit(_APPORTION_BUDGET) - F.sum("floor_quota"))
        .cast("bigint")
        .alias("slots")
    )
    # two-pass distributed rank (largest remainder first, name
    # tie-break) — no SinglePartition window even if the source
    # taxonomy grows to thousands of entries
    ranked = row_number_two_pass(
        shares, "remainder", ["source"], "rr", ascending=False
    )
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "source",
            "n",
            "floor_quota",
            F.when(F.col("rr") <= F.col("slots"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("bonus"),
            (
                F.col("floor_quota")
                + F.when(F.col("rr") <= F.col("slots"), 1).otherwise(0)
            ).alias("quota"),
        )
        .orderBy("source")
    )


_EPOCH_BUDGET = 2_000_000  # training token budget
_EPOCH_CAP_MILLI = 4_000  # max 4 epochs per source (milli-epochs)


@register(
    "sample_stratified_exact",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             md5(concat('strat-', CAST(doc_id AS VARCHAR))) AS hx
      FROM documents
    ),
    sized AS (
      SELECT doc_id, lang, hx,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY hx, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM h
    )
    SELECT lang,
           CASE WHEN rn <= (8 * n_lang) // 10
                THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM sized GROUP BY 1, 2 ORDER BY lang, split
    """,
    tags=("llm", "sampling", "split", "training-prep", "curation"),
)
def sample_stratified_exact(spark, sf_dir):
    """EXACT stratified 80/20 split: within every stratum (language)
    the train share is exactly ``floor(0.8 · n)`` docs — the guarantee
    hash-threshold splits (sample_leakage_safe_split) only deliver in
    expectation, needed when strata are small (a 60-doc low-resource
    language must not lose 5 extra docs to sampling noise).  Selection
    inside a stratum is a deterministic hash order (salted md5), so
    the split is reproducible and unbiased by ingestion order; the
    per-stratum window is lang-partitioned (never global), and the
    per-stratum counts ride the same window — one shuffle total.
    Output: the (lang × split) census with exact id-sums."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.concat(F.lit("strat-"), F.col("doc_id").cast("string"))).alias(
            "hx"
        ),
    )
    w = Window.partitionBy("lang").orderBy("hx", "doc_id")
    wc = Window.partitionBy("lang")
    sized = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_lang"),
    )
    return (
        sized.select(
            "lang",
            F.when(
                F.col("rn") <= F.expr("(8 * n_lang) div 10"),
                F.lit("train"),
            )
            .otherwise(F.lit("test"))
            .alias("split"),
            "doc_id",
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        )
        .orderBy("lang", "split")
    )


@register(
    "mix_curriculum_phases",
    oracle="""
    WITH docs AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS difficulty
      FROM documents
    ),
    t AS (SELECT *, NTILE(4) OVER (ORDER BY difficulty, doc_id) AS phase
          FROM docs)
    SELECT CAST(phase AS INTEGER) AS phase, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(difficulty) AS BIGINT) AS sum_difficulty,
           CAST(MAX(difficulty) AS BIGINT) AS max_difficulty
    FROM t GROUP BY phase, source ORDER BY phase, source
    """,
    tags=("llm", "mixing", "curriculum", "training-prep", "curation"),
)
def mix_curriculum_phases(spark, sf_dir):
    """CURRICULUM SCHEDULING: order the corpus easy→hard (difficulty =
    token count; any integer score plugs in) and cut it into 4 exact
    NTILE phases — the shortest-first curriculum a pretraining run
    warms up with — then audit each phase's source composition (count,
    difficulty mass, hardest doc).  A skewed phase (one source owning
    phase 1) is the classic curriculum failure mode this report
    catches before training.  Scale shape: the global NTILE uses the
    two-pass prefix scan (operators/prefix.py:ntile_two_pass —
    quantile range-buckets + per-bucket window + broadcast offsets),
    NEVER a SinglePartition window; integer tile arithmetic makes the
    assignment bit-identical to the oracle's NTILE."""
    from lakehouse_cdc_spark.operators.prefix import ntile_two_pass

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("difficulty"),
    )
    phased = ntile_two_pass(d, 4, "difficulty", "doc_id", "phase")
    return (
        phased.groupBy("phase", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("difficulty").cast("bigint").alias("sum_difficulty"),
            F.max("difficulty").cast("bigint").alias("max_difficulty"),
        )
        .orderBy("phase", "source")
    )


@register(
    "mix_epoch_schedule",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
                  AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS all_tokens FROM per_src),
    first_pass AS (
      SELECT s.source, s.tokens,
             LEAST({_EPOCH_CAP_MILLI},
                   ({_EPOCH_BUDGET} * s.tokens // t.all_tokens) * 1000
                   // s.tokens) AS epochs_milli_0
      FROM per_src s, tot t
    ),
    spare AS (
      SELECT {_EPOCH_BUDGET}
             - CAST(SUM(tokens * epochs_milli_0 // 1000) AS BIGINT)
               AS spare_tokens,
             CAST(SUM(CASE WHEN epochs_milli_0 < {_EPOCH_CAP_MILLI}
                           THEN tokens ELSE 0 END) AS BIGINT)
               AS uncapped_tokens
      FROM first_pass
    ),
    final AS (
      SELECT f.source, f.tokens,
             CASE WHEN f.epochs_milli_0 < {_EPOCH_CAP_MILLI}
                       AND sp.uncapped_tokens > 0
                  THEN LEAST({_EPOCH_CAP_MILLI},
                             f.epochs_milli_0
                             + sp.spare_tokens * 1000 // sp.uncapped_tokens)
                  ELSE f.epochs_milli_0 END AS epochs_milli
      FROM first_pass f, spare sp
    )
    SELECT source, tokens, CAST(epochs_milli AS BIGINT) AS epochs_milli,
           CAST(tokens * epochs_milli // 1000 AS BIGINT) AS planned_tokens,
           CAST(CASE WHEN epochs_milli >= {_EPOCH_CAP_MILLI}
                     THEN 1 ELSE 0 END AS INT) AS capped
    FROM final
    ORDER BY source
    """,
    tags=("llm", "mixing", "epochs", "training-prep", "curation"),
)
def mix_epoch_schedule(spark, sf_dir):
    """Token-budget epoch scheduler — the "how many times do we repeat
    each source" decision behind every pretraining mix (repeating
    high-value sources up to a staleness cap, cf. the 4-epoch
    repeated-data guidance of Muennighoff et al. 2023): proportional
    token targets per source, converted to milli-epochs and capped at
    4 epochs, then ONE redistribution round hands the budget freed by
    capped sources to the uncapped ones (again capped).  Exact integer
    milli-epoch arithmetic end to end, so the schedule is
    engine-identical — a float scheduler would drift at the cap
    boundaries.

    Scale shape: one map-side token count + a |sources|-row aggregate;
    the schedule math never touches row-level data again.  Composes
    with sample_apportion_quotas (exact doc budgets) and
    mix_sources_budget (hash sampling to the planned share)."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("tokens")
    )
    tot = per_src.agg(F.sum("tokens").cast("bigint").alias("all_tokens"))
    first_pass = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        F.least(
            F.lit(_EPOCH_CAP_MILLI),
            F.expr(
                f"({_EPOCH_BUDGET} * tokens div all_tokens) * 1000 div tokens"
            ),
        ).alias("epochs_milli_0"),
    )
    spare = first_pass.agg(
        (
            F.lit(_EPOCH_BUDGET)
            - F.sum(F.expr("tokens * epochs_milli_0 div 1000"))
        )
        .cast("bigint")
        .alias("spare_tokens"),
        F.sum(
            F.when(
                F.col("epochs_milli_0") < _EPOCH_CAP_MILLI, F.col("tokens")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("uncapped_tokens"),
    )
    final = first_pass.crossJoin(F.broadcast(spare)).select(
        "source",
        "tokens",
        F.when(
            (F.col("epochs_milli_0") < _EPOCH_CAP_MILLI)
            & (F.col("uncapped_tokens") > 0),
            F.least(
                F.lit(_EPOCH_CAP_MILLI),
                F.col("epochs_milli_0")
                + F.expr("spare_tokens * 1000 div uncapped_tokens"),
            ),
        )
        .otherwise(F.col("epochs_milli_0"))
        .alias("epochs_milli"),
    )
    return final.select(
        "source",
        "tokens",
        F.col("epochs_milli").cast("bigint").alias("epochs_milli"),
        F.expr("tokens * epochs_milli div 1000")
        .cast("bigint")
        .alias("planned_tokens"),
        F.when(F.col("epochs_milli") >= _EPOCH_CAP_MILLI, 1)
        .otherwise(0)
        .cast("int")
        .alias("capped"),
    ).orderBy("source")


@register(
    "text_gopher_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, text,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             CAST(len(w) AS BIGINT) AS n,
             CAST(len(array_to_string(w, '')) AS BIGINT) AS sum_len,
             CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
               AS hash_cnt,
             CAST((len(text) - len(replace(text, '...', ''))) // 3
               AS BIGINT) AS ell_cnt,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               AS BIGINT) AS alpha_cnt,
             CAST(list_contains(list_transform(w, x -> lower(x)), 'the')
                  AS INT)
             + CAST(list_contains(list_transform(w, x -> lower(x)), 'a')
                  AS INT)
             + CAST(list_contains(list_transform(w, x -> lower(x)), 'of')
                  AS INT)
             + CAST(list_contains(list_transform(w, x -> lower(x)), 'and')
                  AS INT)
             + CAST(list_contains(list_transform(w, x -> lower(x)), 'to')
                  AS INT) AS stop_hits
      FROM t
    ),
    f AS (
      SELECT source,
             CAST(n < 50 OR n > 100000 AS INT) AS r_wc,
             CAST(sum_len < 3 * n OR sum_len > 10 * n AS INT) AS r_mwl,
             CAST(hash_cnt * 10 > n AS INT) AS r_sym,
             CAST(ell_cnt * 10 > n AS INT) AS r_ell,
             CAST(alpha_cnt * 10 < n * 8 AS INT) AS r_alpha,
             CAST(stop_hits < 2 AS INT) AS r_stop
      FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r_wc) AS BIGINT) AS flag_word_count,
           CAST(SUM(r_mwl) AS BIGINT) AS flag_mean_word_len,
           CAST(SUM(r_sym) AS BIGINT) AS flag_symbol_ratio,
           CAST(SUM(r_ell) AS BIGINT) AS flag_ellipsis_ratio,
           CAST(SUM(r_alpha) AS BIGINT) AS flag_alpha_words,
           CAST(SUM(r_stop) AS BIGINT) AS flag_stopwords,
           CAST(SUM(CASE WHEN r_wc + r_mwl + r_sym + r_ell
                              + r_alpha + r_stop = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM f
    GROUP BY source
    ORDER BY source
    """,
    tags=("llm", "curation", "quality", "gopher", "O-scale"),
)
def text_gopher_rules(spark, sf_dir):
    """Gopher-style RULE-BASED quality filtering (Rae et al. 2021
    §A1.1; the C4/Gopher heuristics every large-corpus pipeline runs
    before model-based scoring): per-document boolean rules — word
    count in [50, 100k], mean word length in [3, 10], symbol-to-word
    and ellipsis-to-word ratios ≤ 0.1, ≥ 80% of words containing an
    alphabetic character, ≥ 2 required English stopwords — reported as
    per-source flag counts plus the surviving-document count.  EVERY
    rule is an exact integer rational (counts cleared of denominators:
    ``hash_cnt·10 > n`` instead of a float ratio), so the report is
    bit-identical across engines.  Pure map-side columnar work (token
    arrays + HOF filters, no UDF) into a |sources|-row aggregate —
    scan-bound and mergeable at any corpus size."""
    low = F.transform(tokens(F.col("text")), lambda x: F.lower(x))
    stop_hits = None
    for wd in ("the", "a", "of", "and", "to"):
        h = F.array_contains(low, wd).cast("int")
        stop_hits = h if stop_hits is None else stop_hits + h
    w = tokens(F.col("text"))
    m = table(spark, sf_dir, "documents").select(
        "source",
        F.size(w).cast("bigint").alias("n"),
        F.aggregate(
            w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        (
            F.length("text") - F.length(F.expr("replace(text, '#', '')"))
        )
        .cast("bigint")
        .alias("hash_cnt"),
        F.expr(
            "CAST((length(text) - length(replace(text, '...', ''))) div 3"
            " AS BIGINT)"
        ).alias("ell_cnt"),
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("alpha_cnt"),
        stop_hits.alias("stop_hits"),
    )
    f = m.select(
        "source",
        ((F.col("n") < 50) | (F.col("n") > 100000)).cast("int").alias("r_wc"),
        (
            (F.col("sum_len") < 3 * F.col("n"))
            | (F.col("sum_len") > 10 * F.col("n"))
        )
        .cast("int")
        .alias("r_mwl"),
        (F.col("hash_cnt") * 10 > F.col("n")).cast("int").alias("r_sym"),
        (F.col("ell_cnt") * 10 > F.col("n")).cast("int").alias("r_ell"),
        (F.col("alpha_cnt") * 10 < F.col("n") * 8)
        .cast("int")
        .alias("r_alpha"),
        (F.col("stop_hits") < 2).cast("int").alias("r_stop"),
    )
    total_flags = (
        F.col("r_wc")
        + F.col("r_mwl")
        + F.col("r_sym")
        + F.col("r_ell")
        + F.col("r_alpha")
        + F.col("r_stop")
    )
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("r_wc").cast("bigint").alias("flag_word_count"),
            F.sum("r_mwl").cast("bigint").alias("flag_mean_word_len"),
            F.sum("r_sym").cast("bigint").alias("flag_symbol_ratio"),
            F.sum("r_ell").cast("bigint").alias("flag_ellipsis_ratio"),
            F.sum("r_alpha").cast("bigint").alias("flag_alpha_words"),
            F.sum("r_stop").cast("bigint").alias("flag_stopwords"),
            F.sum(F.when(total_flags == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


_LGB_BATCH = 32  # examples per training batch


@register(
    "llm_length_grouped_batching",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS ntok,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS rkey
      FROM documents
    ),
    g AS (
      SELECT doc_id, ntok,
             ROW_NUMBER() OVER (ORDER BY ntok, doc_id) AS rn,
             ROW_NUMBER() OVER (ORDER BY rkey, doc_id) AS rr
      FROM toks
    ),
    gb AS (
      SELECT (rn - 1) // {_LGB_BATCH} AS b, COUNT(*) AS c,
             MAX(ntok) AS m, SUM(ntok) AS s
      FROM g GROUP BY 1
    ),
    rb AS (
      SELECT (rr - 1) // {_LGB_BATCH} AS b, COUNT(*) AS c,
             MAX(ntok) AS m, SUM(ntok) AS s
      FROM g GROUP BY 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM gb) AS n_batches,
           (SELECT CAST(SUM(c * m - s) AS BIGINT) FROM gb)
             AS grouped_pad_tokens,
           (SELECT CAST(SUM(c * m - s) AS BIGINT) FROM rb)
             AS random_pad_tokens,
           CAST((SELECT SUM(c * m - s) FROM rb)
                - (SELECT SUM(c * m - s) FROM gb) AS BIGINT)
             AS saved_tokens,
           CAST(((SELECT SUM(c * m - s) FROM rb)
                 - (SELECT SUM(c * m - s) FROM gb)) * 1000000
                // GREATEST((SELECT SUM(c * m - s) FROM rb), 1)
                AS BIGINT) AS saving_ppm
    """,
    tags=("llm", "batching", "training-prep", "A4-scale"),
)
def llm_length_grouped_batching(spark, sf_dir):
    """LENGTH-GROUPED batch construction (dynamic batching / the
    HuggingFace ``group_by_length`` primitive): documents are ranked
    by token count and cut into fixed-size batches, so each padded
    batch wastes ``batch_size x max(len) - sum(len)`` tokens on
    near-uniform lengths instead of random draws.  The query
    quantifies the choice — padding waste under length-grouped vs
    HASH-RANDOM batching of the same corpus, and the integer ppm
    saving — the number a trainer uses to justify the sampler.

    Both rankings are the two-pass distributed rank
    (operators/prefix.py:row_number_two_pass — range-bucket +
    per-bucket window + broadcast carry), so there is NO
    SinglePartition global window at any corpus size; the random
    ranking orders by a 48-bit md5-prefix integer so both engines
    tie-break identically.  Everything downstream of the two ranks is
    a pair of |batches|-row aggregates.  Exact integers end to end."""
    from lakehouse_cdc_spark.operators.prefix import row_number_two_pass
    from lakehouse_cdc_spark.llm.text import tokens as _toks

    toks = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_toks(F.col("text"))).cast("bigint").alias("ntok"),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12),"
            " 16, 10) AS BIGINT)"
        ).alias("rkey"),
    )
    g = row_number_two_pass(toks, "ntok", ["doc_id"], "rn")
    g = row_number_two_pass(g, "rkey", ["doc_id"], "rr")

    def waste(rank_col):
        per_batch = (
            g.groupBy(
                F.expr(f"({rank_col} - 1) div {_LGB_BATCH}").alias("b")
            )
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.max("ntok").alias("m"),
                F.sum("ntok").alias("s"),
            )
        )
        return per_batch.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum(F.col("c") * F.col("m") - F.col("s"))
            .cast("bigint")
            .alias("pad"),
        )

    gb = waste("rn").select(
        "n_batches", F.col("pad").alias("grouped_pad_tokens")
    )
    rb = waste("rr").select(F.col("pad").alias("random_pad_tokens"))
    return (
        gb.crossJoin(F.broadcast(rb))
        .select(
            "n_batches",
            "grouped_pad_tokens",
            "random_pad_tokens",
            (F.col("random_pad_tokens") - F.col("grouped_pad_tokens"))
            .cast("bigint")
            .alias("saved_tokens"),
            F.expr(
                "CAST(CAST(random_pad_tokens - grouped_pad_tokens"
                " AS DECIMAL(38,0)) * 1000000"
                " div greatest(random_pad_tokens, 1) AS BIGINT)"
            ).alias("saving_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Global deterministic training shuffle (round 6)
# ---------------------------------------------------------------------------

#: 2^31-1 (Mersenne prime) — every mix below is (a*x + b) mod _SHUF_P
#: with x pre-reduced mod _SHUF_P, so a*x <= ~1.1e9 * 2.1e9 < 2^63:
#: overflow-free in int64 at ANY doc_id, including 1e12-row corpora.
_SHUF_P = 2_147_483_647
_SHUF_SHARDS = 8


@register(
    "sample_global_shuffle",
    oracle=f"""
    WITH mixed AS (
      SELECT doc_id,
             ((69069 * ((1103515245 * (doc_id % {_SHUF_P}) + 12345)
                        % {_SHUF_P}) + 362437) % {_SHUF_P}) AS h2,
             ((1103515245 * (doc_id % {_SHUF_P}) + 12345) % {_SHUF_P})
               % {_SHUF_SHARDS} AS shard
      FROM documents
    ),
    heads AS (
      SELECT shard, doc_id,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY h2, doc_id) AS rn
      FROM mixed
    )
    SELECT m.shard,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(m.doc_id) AS BIGINT) AS sum_doc_id,
           CAST(MIN(m.h2) AS BIGINT) AS min_key,
           CAST(MAX(m.h2) AS BIGINT) AS max_key,
           (SELECT string_agg(h.doc_id, ',' ORDER BY h.rn)
            FROM heads h WHERE h.shard = m.shard AND h.rn <= 5)
             AS first_docs
    FROM mixed m
    GROUP BY m.shard ORDER BY m.shard
    """,
    tags=("llm", "sampling", "shuffle", "training-order"),
)
def sample_global_shuffle(spark, sf_dir):
    """Deterministic GLOBAL SHUFFLE for training-data ordering — the
    op every epoch of LLM training needs over a 100 TB corpus, where
    'shuffle the dataset' cannot mean a materialized random sort.
    Each document gets a seeded affine-modular mix (two LCG rounds mod
    2^31-1, overflow-free int64 at any corpus size): the FIRST round
    assigns the shard (which output file the example lands in), the
    SECOND gives the within-shard sort key — so the training order is
    a pure function of (doc_id, seed): map-side, shuffle-free to
    assign, and reproducible across reruns/engines (no
    rand()/hash-seed dependence).  A dataloader reads shards in any
    order, each sorted by the key; re-seeding re-permutes without
    rewriting data.  The declared result is the per-shard audit a
    pipeline validates: row count (balance), doc_id checksum
    (partition correctness), key range, and the first five examples
    each shard would train on (WindowGroupLimit keeps the per-shard
    sort bounded to k=5 survivors per task)."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    h1 = (F.lit(1103515245) * (F.col("doc_id") % _SHUF_P) + 12345) % _SHUF_P
    mixed = d.select(
        "doc_id",
        ((F.lit(69069) * h1 + 362437) % _SHUF_P).alias("h2"),
        (h1 % _SHUF_SHARDS).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h2", "doc_id")
    heads = (
        mixed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("shard")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "doc_id"))
                    ),
                    lambda s: s["doc_id"].cast("string"),
                ),
            ).alias("first_docs")
        )
    )
    stats = mixed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.min("h2").cast("bigint").alias("min_key"),
        F.max("h2").cast("bigint").alias("max_key"),
    )
    return (
        stats.join(heads, "shard")
        .select(
            "shard", "cnt", "sum_doc_id", "min_key", "max_key", "first_docs"
        )
        .orderBy("shard")
    )


_RSV_K = 3  # uniform sample size per source


@register(
    "sample_reservoir_per_source",
    oracle=f"""
    SELECT source, doc_id, rank FROM (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS rank
      FROM documents)
    WHERE rank <= {_RSV_K}
    ORDER BY source, rank
    """,
    tags=("llm", "sampling", "reservoir", "stratified"),
)
def sample_reservoir_per_source(spark, sf_dir):
    """Uniform k-RESERVOIR per stratum, distributed and deterministic:
    every document draws a priority from the md5 hash of its id (a
    uniform deterministic permutation — the same derandomization trick
    as sample_hash_deterministic) and each source keeps its k lowest
    priorities.  This is the bounded-size companion to the
    fraction-based stratified samplers: a fixed per-source quota that
    needs no second pass to discover stratum sizes, which is exactly
    how eval-set carving and per-domain spot-check samples are drawn
    at corpus scale.

    Plan shape: the rank-k filter compiles to WindowGroupLimit, so
    each partition discards everything beyond its top-k BEFORE the
    single source-keyed exchange — per-stratum traffic is O(k), not
    O(|stratum|), the reservoir property in distributed form."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select(
            "source",
            "doc_id",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= _RSV_K)
        .orderBy("source", "rank")
    )


_QNORM_DROP_PPM = 200_000  # drop the bottom 20% per source


@register(
    "text_quality_quantile_normalize",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           CAST((rnk - 1) * 1000000 // GREATEST(n_src - 1, 1) AS BIGINT)
             AS pct_ppm,
           CAST(CASE WHEN (rnk - 1) * 1000000 // GREATEST(n_src - 1, 1)
                          >= {_QNORM_DROP_PPM}
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rnk,
             COUNT(*) OVER (PARTITION BY source) AS n_src
      FROM documents)
    ORDER BY source, pct_ppm, doc_id
    """,
    tags=("llm", "text", "quality", "calibration", "window"),
)
def text_quality_quantile_normalize(spark, sf_dir):
    """PER-SOURCE QUANTILE NORMALIZATION of a quality signal — the
    calibration step before any global keep/drop threshold: raw scores
    (here the integer length signal) are NOT comparable across sources
    (a median news article and a median forum post differ wildly), so
    each document's score becomes its within-source percentile in
    exact integer ppm (``(rank−1)·1e6 // (n−1)``), and the gate
    "drop the bottom 20%" then means the same thing in every source —
    the rank-based equivalent of per-source z-scoring, robust to any
    monotone score transform.

    Plan shape: ONE source-keyed exchange serves both window passes
    (rank + per-source count share the partitioning); the threshold is
    a map-side comparison.  At 100 TB this is the cheap half of
    calibration — no global sort, no quantile sketch, just per-source
    ranking that parallelizes on the source hash (salt ultra-hot
    sources into sub-strata if one source dominates the corpus)."""
    d = table(spark, sf_dir, "documents")
    wp = Window.partitionBy("source")
    wr = wp.orderBy("n_chars", "doc_id")
    pct = F.expr(
        "CAST((rnk - 1) * 1000000 div greatest(n_src - 1, 1) AS BIGINT)"
    )
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(wr).alias("rnk"),
            F.count(F.lit(1)).over(wp).alias("n_src"),
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            pct.alias("pct_ppm"),
            F.when(pct >= _QNORM_DROP_PPM, 1).otherwise(0).cast("int").alias("keep"),
        )
        .orderBy("source", "pct_ppm", "doc_id")
    )


# ---------------------------------------------------------------------------
# Purged time-series split (round 8)
# ---------------------------------------------------------------------------

_TS_SPLIT_TEST_START = "2024-01-24 00:00:00"
_TS_SPLIT_EMBARGO = "2024-01-21 00:00:00"  # 3-day embargo before test


@register(
    "sample_time_series_split",
    oracle=f"""
    WITH lanes AS (
      SELECT event_id, user_id,
             CASE WHEN ts < TIMESTAMP '{_TS_SPLIT_EMBARGO}' THEN 'train'
                  WHEN ts < TIMESTAMP '{_TS_SPLIT_TEST_START}' THEN 'embargo'
                  ELSE 'test' END AS lane
      FROM events
    )
    SELECT CAST(COUNT(*) FILTER (lane = 'train') AS BIGINT) AS n_train,
           CAST(COUNT(*) FILTER (lane = 'embargo') AS BIGINT)
             AS n_embargo_purged,
           CAST(COUNT(*) FILTER (lane = 'test') AS BIGINT) AS n_test,
           CAST(COUNT(DISTINCT user_id) FILTER (lane = 'train') AS BIGINT)
             AS train_users,
           CAST(COUNT(DISTINCT user_id) FILTER (lane = 'test') AS BIGINT)
             AS test_users,
           CAST(bit_xor(CASE WHEN lane = 'test' THEN event_id
                             ELSE 0 END) AS BIGINT) AS test_ids_xor
    FROM lanes
    """,
    tags=("sampling", "split", "timeseries", "leakage"),
)
def sample_time_series_split(spark, sf_dir):
    """PURGED TIME-SERIES SPLIT — the temporal complement of
    sample_leakage_safe_split (which guards against CONTENT leakage by
    splitting on near-dup clusters): forecasting and financial-ML
    evaluation must split on TIME, and rows inside the embargo window
    immediately before the test boundary are PURGED entirely — a
    trailing-window feature computed at the end of train would
    otherwise overlap the first test labels (the lookahead leak;
    de Prado's purged CV — public).  Emits the three lane sizes, the
    per-lane user counts, and an XOR digest of the test-lane event ids
    pinning the exact membership across engines and reruns.  Pure
    map-side lane assignment + one aggregate — at 100 TB the split IS
    a predicate, never a shuffle; with a date-partitioned layout the
    lanes are partition-pruned scans."""
    e = table(spark, sf_dir, "events")
    lane = (
        F.when(
            F.col("ts") < F.lit(_TS_SPLIT_EMBARGO).cast("timestamp"),
            F.lit("train"),
        )
        .when(
            F.col("ts") < F.lit(_TS_SPLIT_TEST_START).cast("timestamp"),
            F.lit("embargo"),
        )
        .otherwise(F.lit("test"))
    )
    lanes = e.select("event_id", "user_id", lane.alias("lane"))
    return lanes.agg(
        F.count(F.when(F.col("lane") == "train", 1))
        .cast("bigint")
        .alias("n_train"),
        F.count(F.when(F.col("lane") == "embargo", 1))
        .cast("bigint")
        .alias("n_embargo_purged"),
        F.count(F.when(F.col("lane") == "test", 1))
        .cast("bigint")
        .alias("n_test"),
        F.countDistinct(
            F.when(F.col("lane") == "train", F.col("user_id"))
        )
        .cast("bigint")
        .alias("train_users"),
        F.countDistinct(
            F.when(F.col("lane") == "test", F.col("user_id"))
        )
        .cast("bigint")
        .alias("test_users"),
        F.expr(
            "bit_xor(CASE WHEN lane = 'test' THEN event_id ELSE 0 END)"
        )
        .cast("bigint")
        .alias("test_ids_xor"),
    )


@register(
    "text_length_histogram_by_source",
    oracle="""
    WITH lens AS (
      SELECT source,
             CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS bucket,
             n_chars
      FROM documents
    )
    SELECT source, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM lens GROUP BY source, bucket ORDER BY source, bucket
    """,
    tags=("text", "histogram", "packing", "curation"),
)
def text_length_histogram_by_source(spark, sf_dir):
    """DOCUMENT-LENGTH HISTOGRAM per source in log2 buckets — the
    packing planner's input (llm_sequence_packing bins against a fixed
    token budget; this table says what budget utilization each source
    CAN achieve and how much overflow chunking to expect) and the
    curation diff that catches a source whose scrape started
    truncating.  Bucket = floor(log2(n_chars)) — integer-exact in both
    engines because n_chars is an integer and log2 of an int is
    correctly rounded well past 2^53... except exactly at powers of
    two, where floor(log2(2^k)) = k is exact anyway.  One map-side
    bucket assignment + a (source × ~20 buckets)-row aggregate."""
    d = table(spark, sf_dir, "documents")
    lens = d.select(
        "source",
        F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1))))
        .cast("bigint")
        .alias("bucket"),
        "n_chars",
    )
    return (
        lens.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("source", "bucket")
    )
