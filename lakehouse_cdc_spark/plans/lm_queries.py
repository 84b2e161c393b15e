"""Language-model-flavored curation queries (wave 18).

The quality-filter family a real pretraining pipeline runs between
dedup and tokenization:

- ``text_bigram_lm_score`` — corpus-trained add-one-smoothed bigram
  LM, per-document fluency score (the CCNet/KenLM perplexity-filter
  shape, in exact integer arithmetic so DuckDB reproduces it bit-for-
  bit: probabilities are parts-per-billion integers, never floats).
- ``text_pii_redaction`` — regex PII detection + redaction with a
  residual-match audit column (the scrubbing stage; patterns planted
  deterministically so both engines see identical inputs).
- ``text_quality_logit`` — a linear quality classifier with fixed
  integer weights over integer features (the fasttext-style keep/drop
  gate, exact end to end).
- ``text_ngram_novelty`` — per-document fraction of 3-gram shingles
  first seen in that document (corpus-order novelty curve; the
  "how much new text does each shard add" curation metric).

Scale notes (100 TB):
- The bigram LM's shuffles are |bigram-vocab|-sized (groupBy on the
  pair key with map-side partial counts), never |corpus|-sized; the
  score join shuffles doc-bigrams on the pair key — AQE broadcasts
  the stats side automatically when the vocabulary is small, and
  falls back to a plain shuffle join when it isn't (a 100 TB corpus
  can have 1e9+ distinct bigrams, so a forced broadcast would be
  wrong).
- PII redaction and the logit gate are pure map-side codegen (regexp
  + arithmetic) — streamable, no shuffle at any scale.
- Novelty pays ONE |shingles|-sized shuffle (window min on a 60-bit
  md5 key) then a |docs|-sized rollup — the same posture as the
  dedup inverted index.

Reference parity: the reference has no LM/PII operators; these are
north-star LLM-pipeline extensions (BASELINE.json), built per
SURVEY.md §7 item 7.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.llm.text import (
    digit_count,
    punct_count,
    token_count,
    tokens,
    word_shingles,
)
from lakehouse_cdc_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# Bigram LM fluency score
# ---------------------------------------------------------------------------

#: fixed-point probability scale: parts-per-billion.  (c2+1)*1e9 stays
#: far under int64 even at 1e7 occurrences of one bigram.
_PPB = 1_000_000_000


def _bigram_stream(spark, sf_dir):
    """(tok, bg): the tokenized corpus and the raw (doc_id, w1, w2)
    bigram occurrence stream (one map-side tokenize + explode, no
    shuffle) — the shared front end of every bigram-LM query.

    A (doc_id, w1, w2)-keyed pre-aggregation was measured here and
    REJECTED (guide §1.1 — the "ideal" plan is often slower for a
    gotcha): per-doc bigram multiplicities are ~1, so the extra
    corpus-sized hash(doc_id, w1, w2) exchange cost more than the
    explode recomputation it saved (bigram 1.6 s -> 2.5 s, tertiles
    1.8 s -> 5.3 s isolated at sf0.1)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens("text").alias("t"))
    bg = (
        tok.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    "             element_at(t, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    return tok, bg


#: enforced row budget for the probed static broadcast of the pair
#: table and its derived stats: ~2M (w1, w2, c) rows is tens of MB
#: framed — inside the executor/driver budget — while a 100 TB
#: corpus' 1e9+ bigram types blow past it and take the shuffle-join
#: fallback.  The hints-module discipline: a forced broadcast needs
#: an ENFORCED budget; here the probe is a count over the ALREADY
#: MATERIALIZED checkpoint blocks (no extra corpus pass), so the
#: decision uses the true size, not a Catalyst estimate.
_C2_BCAST_ROW_BUDGET = 2_000_000


def _pair_table(spark, sf_dir):
    """(tok, bg, c2, fits_broadcast): the shared bigram front end plus
    the distinct pair table ``c2``, eagerly ``localCheckpoint``-ed
    ONCE PER INVOCATION.  Every derived stats table (C(w1), N1+(w1·),
    N1+(·w2), B) reads the materialized |bigram-type| blocks instead
    of replaying the corpus pair aggregation — the r12 form carried
    2–4 EXECUTED copies of that aggregation per query (runtime
    exchange reuse never fired: the executed sf0.1 plans showed 8–10
    parquet scans, zero ReusedExchange).  ``fits_broadcast`` is the
    probed budget check for a static broadcast of the (vocabulary-
    sized) stats sides."""
    tok, bg = _bigram_stream(spark, sf_dir)
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    fits = c2.count() <= _C2_BCAST_ROW_BUDGET
    return tok, bg, c2, fits


def _addone_per_doc(spark, sf_dir):
    """Per-document add-one-smoothed bigram LM stats: (doc_id,
    n_bigrams, score_sum, avg_p_ppb) — the shared Spark side of
    text_bigram_lm_score and text_perplexity_tertiles.

    C(w1) derives from the |bigram-type| table ``c2`` (sum of c per
    w1), which is checkpointed once (``_pair_table``) so the corpus
    pair aggregation executes exactly once per invocation; the score
    join's stats sides are statically broadcast under the probed
    budget (guide §3.1 — broadcast the side that fits, known true
    size) and fall back to AQE-planned shuffle joins above it."""
    tok, bg, c2, fits = _pair_table(spark, sf_dir)
    c1 = c2.groupBy("w1").agg(F.sum("c").alias("cn"))
    if fits:
        c2, c1 = F.broadcast(c2), F.broadcast(c1)
    # V counts distinct tokens over ALL docs (including single-token
    # docs whose token appears in no bigram), so it keeps its own
    # tokenize pass
    v = (
        tok.select(F.explode("t").alias("u"))
        .agg(F.count_distinct("u").alias("vsz"))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.expr(f"((c + 1) * {_PPB}) div (cn + vsz)").alias("p_ppb"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_ppb").cast("bigint").alias("score_sum"),
            F.expr("sum(p_ppb) div count(*)").cast("bigint").alias("avg_p_ppb"),
        )
    )


@register(
    "text_bigram_lm_score",
    bench=True,
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM documents),
    bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t) - 1)) AS i
                 FROM toks WHERE len(t) >= 2)),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS cn FROM bg GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT u) AS vsz
          FROM (SELECT unnest(t) AS u FROM toks)),
    scored AS (SELECT bg.doc_id,
                      ((c2.c + 1) * {_PPB}) // (c1.cn + v.vsz) AS p_ppb
               FROM bg JOIN c2 USING (w1, w2)
                       JOIN c1 USING (w1)
                       CROSS JOIN v)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(p_ppb) AS BIGINT) AS score_sum,
           CAST(SUM(p_ppb) // COUNT(*) AS BIGINT) AS avg_p_ppb
    FROM scored GROUP BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_bigram_lm_score(spark, sf_dir):
    """Corpus-trained bigram LM score per document — the perplexity-
    filter shape (CCNet-style) with add-one smoothing, entirely in
    integer arithmetic: P(w2|w1) = (C(w1,w2)+1)/(C(w1)+V) emitted as
    floor(P * 1e9).  Summing scaled probabilities (not log-probs)
    keeps both engines bit-exact while preserving the filter's
    ranking power on the fixture distribution.

    Plan shape: bigrams are built MAP-SIDE from the token array
    (transform over sequence — no window, no self-join), then
    aggregated on the pair key ONCE (checkpointed ``_pair_table``);
    C(w1) derives from the materialized pair table, not from a second
    corpus aggregation.  V is a one-row broadcast.  The stats sides
    are statically broadcast under the probed row budget (true
    materialized size, not an estimate) and the score join is then
    map-side; above the budget they fall back to shuffle joins.
    """
    return _addone_per_doc(spark, sf_dir).select(
        "doc_id", "n_bigrams", "score_sum", "avg_p_ppb"
    )


_LM_SCORED_CTES = f"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM documents),
    bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t) - 1)) AS i
                 FROM toks WHERE len(t) >= 2)),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS cn FROM bg GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT u) AS vsz
          FROM (SELECT unnest(t) AS u FROM toks)),
    scored AS (SELECT bg.doc_id,
                      ((c2.c + 1) * {_PPB}) // (c1.cn + v.vsz) AS p_ppb
               FROM bg JOIN c2 USING (w1, w2)
                       JOIN c1 USING (w1)
                       CROSS JOIN v),
    per_doc AS (SELECT doc_id,
                       CAST(SUM(p_ppb) // COUNT(*) AS BIGINT) AS avg_p_ppb
                FROM scored GROUP BY doc_id)
"""


@register(
    "text_perplexity_tertiles",
    oracle=_LM_SCORED_CTES
    + """
    , bucketed AS (
      SELECT d.source, p.avg_p_ppb,
             NTILE(3) OVER (PARTITION BY d.source
                            ORDER BY p.avg_p_ppb DESC, p.doc_id) AS tertile
      FROM per_doc p JOIN documents d USING (doc_id)
    )
    SELECT source, tertile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(avg_p_ppb) AS BIGINT) AS min_p_ppb,
           CAST(MAX(avg_p_ppb) AS BIGINT) AS max_p_ppb
    FROM bucketed
    GROUP BY source, tertile
    ORDER BY source, tertile
    """,
    tags=("llm", "text", "quality", "ccnet", "mixing"),
)
def text_perplexity_tertiles(spark, sf_dir):
    """CCNet-style per-source perplexity bucketing: score every
    document with the corpus-trained bigram LM (same exact-integer
    pipeline as text_bigram_lm_score), then split EACH source into
    head/middle/tail tertiles by fluency (NTILE(3) partitioned by
    source, fully-tied order) — the bucketing CCNet uses to keep the
    head of every language/domain rather than letting one source's
    distribution decide for all.  Output is the 3-row-per-source
    bucket table a mixing stage consumes.

    Scale shape: the LM shuffles are |bigram-vocab|-sized; the tertile
    split uses the keyed two-pass NTILE
    (operators/chunked.ntile_keyed_two_pass) — ~20 sources would cap a
    source-partitioned window at 20 tasks each sorting its whole
    stratum, while the two-pass form ranks within (source,
    per-source-quantile bucket) and adds tiny broadcast offsets:
    bit-identical tiles, |source| x |buckets| parallelism.
    """
    from lakehouse_cdc_spark.operators.chunked import ntile_keyed_two_pass

    d = table(spark, sf_dir, "documents")
    # the two-pass NTILE references its input ~5x (quantile bounds,
    # bucket counts/offsets/totals, final join) — checkpoint the
    # narrow (doc_id, avg_p_ppb, source) table once so those
    # references read materialized blocks instead of replaying the
    # whole LM scoring pipeline per reference (the executed r12 plan
    # carried 60 parquet scans; one scoring pass is the floor)
    per_doc = (
        _addone_per_doc(spark, sf_dir)
        .select("doc_id", "avg_p_ppb")
        .join(d.select("doc_id", "source"), "doc_id")
        .localCheckpoint()
    )
    bucketed = ntile_keyed_two_pass(
        per_doc,
        n=3,
        key_cols=["source"],
        order_col="avg_p_ppb",
        tiebreak_col="doc_id",
        out_col="tertile",
        ascending=False,
    ).select("source", "avg_p_ppb", "tertile")
    return (
        bucketed.groupBy("source", "tertile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_p_ppb").cast("bigint").alias("min_p_ppb"),
            F.max("avg_p_ppb").cast("bigint").alias("max_p_ppb"),
        )
        .orderBy("source", "tertile")
    )


_DSIR_B = 512  # hashed feature buckets
_DSIR_BKT_SQL = "CAST('0x' || substr(md5(u), 1, 3) AS INTEGER) % " + str(_DSIR_B)


#: shared oracle CTE chain ending at ``scored`` = (doc_id, source,
#: dsir_score) — the DSIR scoring pipeline both the weights query and
#: the resampling query compose on (one place per engine).
_DSIR_CTES = f"""
    WITH ref AS (SELECT MIN(source) AS target_src FROM documents),
    feats AS (
      SELECT doc_id, source, {_DSIR_BKT_SQL} AS f
      FROM (SELECT doc_id, source,
                   unnest(string_split_regex(trim(text), '\\s+')) AS u
            FROM documents)
    ),
    tstat AS (
      SELECT f, COUNT(*) AS tc FROM feats, ref
      WHERE source = ref.target_src GROUP BY f
    ),
    rstat AS (SELECT f, COUNT(*) AS rc FROM feats GROUP BY f),
    tot AS (
      SELECT (SELECT COUNT(*) FROM feats, ref
              WHERE source = ref.target_src) AS tt,
             (SELECT COUNT(*) FROM feats) AS rt
    ),
    ratio AS (
      SELECT r.f,
             (COALESCE(t.tc, 0) + 1) * {_PPB} // (tot.tt + {_DSIR_B})
             - (r.rc + 1) * {_PPB} // (tot.rt + {_DSIR_B}) AS delta_ppb
      FROM rstat r LEFT JOIN tstat t USING (f), tot
    ),
    per_doc AS (
      SELECT fe.doc_id,
             CAST(SUM(ratio.delta_ppb) AS BIGINT) AS dsir_score
      FROM feats fe JOIN ratio USING (f)
      GROUP BY fe.doc_id
    ),
    scored AS (
      SELECT p.doc_id, d.source, p.dsir_score
      FROM per_doc p JOIN documents d USING (doc_id)
    )
"""


def _dsir_per_doc_scores(spark, sf_dir):
    """Shared Spark half of the DSIR pipeline: per-document importance
    scores — (doc_id, source, dsir_score).  Mirrors ``_DSIR_CTES``."""
    d = table(spark, sf_dir, "documents")
    ref = d.agg(F.min("source").alias("target_src"))
    feats = (
        d.select("doc_id", "source", F.explode(tokens("text")).alias("u"))
        .select(
            "doc_id",
            "source",
            (F.conv(F.substring(F.md5("u"), 1, 3), 16, 10).cast("int")
             % _DSIR_B).alias("f"),
        )
    )
    feats_t = feats.crossJoin(F.broadcast(ref)).filter(
        F.col("source") == F.col("target_src")
    )
    tstat = feats_t.groupBy("f").agg(F.count(F.lit(1)).alias("tc"))
    rstat = feats.groupBy("f").agg(F.count(F.lit(1)).alias("rc"))
    tot = feats_t.agg(F.count(F.lit(1)).alias("tt")).crossJoin(
        feats.agg(F.count(F.lit(1)).alias("rt"))
    )
    ratio = (
        rstat.join(tstat, "f", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "f",
            F.expr(
                f"(COALESCE(tc, 0) + 1) * {_PPB} div (tt + {_DSIR_B})"
                f" - (rc + 1) * {_PPB} div (rt + {_DSIR_B})"
            ).alias("delta_ppb"),
        )
    )
    per_doc = (
        feats.join(F.broadcast(ratio), "f")
        .groupBy("doc_id")
        .agg(F.sum("delta_ppb").cast("bigint").alias("dsir_score"))
    )
    return per_doc.join(d.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", "dsir_score"
    )


@register(
    "curation_dsir_weights",
    oracle=_DSIR_CTES
    + """
    SELECT doc_id, source, dsir_score
    FROM scored
    ORDER BY dsir_score DESC, doc_id
    LIMIT 20
    """,
    tags=("llm", "curation", "dsir", "importance-sampling", "mixing"),
)
def curation_dsir_weights(spark, sf_dir):
    """DSIR-shaped importance scoring (Xie et al. 2023: Data Selection
    via Importance Resampling): hashed unigram features (md5 -> 512
    buckets, identical hash both engines), a TARGET feature
    distribution from the reference domain (deterministically the
    lexicographically first source, standing in for "curated wiki"),
    a RAW distribution from the whole pool, add-one smoothing over the
    bucket space, and a per-document score summing the per-feature
    (p_target - p_raw) mass in parts-per-billion — the fixed-point
    linearization of the DSIR log-ratio (ordering-equivalent for the
    resampling cut at small deviations, and bit-identical across
    engines, which the float log-ratio could never be).  Emits the
    top-20 most target-like documents.

    Scale shape: the feature stats tables are <= 512 rows (broadcast);
    the only |corpus|-sized shuffle is the per-doc score aggregation
    keyed on doc_id.  This is the standard pretraining-data reweighting
    step ahead of mix_sources_budget."""
    return (
        _dsir_per_doc_scores(spark, sf_dir)
        .orderBy(F.desc("dsir_score"), F.asc("doc_id"))
        .limit(20)
    )


_DSIR_SAMPLE_K = 64


@register(
    "sample_dsir_resample",
    oracle=_DSIR_CTES
    + f"""
    , lo AS (SELECT MIN(dsir_score) AS min_s FROM scored),
    weighted AS (
      SELECT s.doc_id, s.source, s.dsir_score,
             s.dsir_score - lo.min_s + 1 AS w
      FROM scored s, lo
    )
    SELECT doc_id, source, dsir_score,
           (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                 AS BIGINT) + 1) // w AS priority
    FROM weighted
    ORDER BY priority, doc_id LIMIT {_DSIR_SAMPLE_K}
    """,
    tags=("llm", "curation", "dsir", "importance-sampling", "sampling"),
)
def sample_dsir_resample(spark, sf_dir):
    """The RESAMPLING half of DSIR (Xie et al. 2023) — the step
    curation_dsir_weights scores for: draw a without-replacement
    sample whose inclusion probability is proportional to each
    document's target-likeness.  Scores shift to strictly-positive
    weights (score − min + 1, min broadcast from a 1-row aggregate)
    and feed the SAME deterministic priority-sampling machinery as
    sample_weighted_priority (hash-seeded key = h/w; P(selection)
    linear in w): the {_DSIR_SAMPLE_K} smallest priorities win.
    End-to-end this is score → importance-resample, the complete DSIR
    pipeline, reproducible bit-for-bit on any engine or rerun — the
    Gumbel-top-k that the paper uses needs float randomness this
    stack deliberately avoids.

    Scale shape: the scoring pipeline's shuffles are unchanged
    (<=512-row broadcasts + one doc_id-keyed aggregation); the
    resample adds a map-side priority and a TakeOrderedAndProject —
    no new shuffle of the corpus."""
    scored = _dsir_per_doc_scores(spark, sf_dir)
    lo = scored.agg(F.min("dsir_score").alias("min_s"))
    return (
        scored.crossJoin(F.broadcast(lo))
        .select(
            "doc_id",
            "source",
            "dsir_score",
            F.expr(
                "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT) + 1)"
                " div (dsir_score - min_s + 1)"
            ).alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(_DSIR_SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

#: regexes kept to constructs with identical semantics in Java regex
#: (Spark) and RE2 (DuckDB): character classes, +, bounded repeats.
_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"

#: deterministic planted-PII body: docs with doc_id % 3 != 0 get one
#: email + one phone appended to a text prefix; multiples of 3 stay
#: clean so the detector has true negatives to prove itself on.
#: (only the string-type keyword differs between dialects)
def _body_sql(strty: str) -> str:
    return (
        "substr(text, 1, 120) || CASE WHEN doc_id % 3 = 0 THEN ''"
        f" ELSE ' contact user' || CAST(doc_id AS {strty})"
        f"   || '@mail' || CAST(doc_id % 7 AS {strty}) || '.com"
        f" tel 555-' || lpad(CAST(doc_id % 10000 AS {strty}), 4, '0') END"
    )


_BODY_SQL = _body_sql("VARCHAR")  # DuckDB oracle form
_BODY_SPARK = _body_sql("STRING")  # Spark form


@register(
    "text_pii_redaction",
    oracle=f"""
    WITH body AS (SELECT doc_id, {_BODY_SQL} AS body FROM documents),
    red AS (SELECT doc_id, body,
                   regexp_replace(regexp_replace(body, '{_EMAIL_RE}',
                       '<EMAIL>', 'g'), '{_PHONE_RE}', '<PHONE>', 'g')
                   AS redacted
            FROM body)
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(redacted, '{_EMAIL_RE}'))
              + len(regexp_extract_all(redacted, '{_PHONE_RE}')) AS BIGINT)
             AS n_residual,
           md5(redacted) AS red_hash
    FROM red
    """,
    tags=("llm", "text", "governance"),
)
def text_pii_redaction(spark, sf_dir):
    """PII scrub stage: detect emails/phones, redact with typed
    placeholders, and audit that zero matches survive redaction
    (``n_residual`` — the column a governance gate alerts on).
    Patterns are planted deterministically from doc_id so the oracle
    sees byte-identical input; the operator itself is the real one.

    Pure map-side regexp codegen — no shuffle, streamable, and at
    100 TB it is scan-bound (the correct cost model for scrubbing).
    """
    d = table(spark, sf_dir, "documents")
    body = d.select("doc_id", F.expr(_BODY_SPARK).alias("body"))
    red = body.withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace("body", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
    )
    return red.select(
        "doc_id",
        F.regexp_count("body", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("body", F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        (
            F.regexp_count("redacted", F.lit(_EMAIL_RE))
            + F.regexp_count("redacted", F.lit(_PHONE_RE))
        ).cast("bigint").alias("n_residual"),
        F.md5("redacted").alias("red_hash"),
    )


# ---------------------------------------------------------------------------
# Linear quality classifier (integer logit)
# ---------------------------------------------------------------------------

#: fixed integer weights (micro-units).  A trained classifier would
#: load these from a table; the operator — feature extraction + dot
#: product + threshold, all codegen — is identical either way.
_W_UNIQ = 15_000
_W_TOK = 500
_W_PUNCT = -20_000
_W_DIGIT = -10_000
_BIAS = -2_000_000


@register(
    "text_quality_logit",
    oracle=f"""
    WITH f AS (SELECT doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tok,
                 len(list_distinct(string_split_regex(trim(text), '\\s+')))
                   AS n_uniq,
                 length(text)
                   - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                   AS n_punct,
                 length(text)
                   - length(regexp_replace(text, '[0-9]', '', 'g'))
                   AS n_digit
               FROM documents)
    SELECT doc_id, n_tok, n_uniq, n_punct, n_digit,
           CAST({_BIAS} + {_W_UNIQ} * n_uniq + {_W_TOK} * n_tok
              + {_W_PUNCT} * n_punct + {_W_DIGIT} * n_digit AS BIGINT)
             AS logit_micro,
           ({_BIAS} + {_W_UNIQ} * n_uniq + {_W_TOK} * n_tok
              + {_W_PUNCT} * n_punct + {_W_DIGIT} * n_digit) > 0 AS keep
    FROM f
    """,
    tags=("llm", "text", "quality"),
)
def text_quality_logit(spark, sf_dir):
    """Linear keep/drop quality gate: integer features (token count,
    distinct-token count, punctuation, digits) dotted with fixed
    integer micro-weights; sigmoid is monotone so thresholding the
    logit IS thresholding the probability — no float ever appears.
    Map-side only; the shape of every fasttext-style quality filter.
    """
    d = table(spark, sf_dir, "documents")
    t = tokens("text")
    f = d.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_uniq"),
        punct_count("text").cast("bigint").alias("n_punct"),
        digit_count("text").cast("bigint").alias("n_digit"),
    )
    logit = (
        F.lit(_BIAS)
        + F.lit(_W_UNIQ) * F.col("n_uniq")
        + F.lit(_W_TOK) * F.col("n_tok")
        + F.lit(_W_PUNCT) * F.col("n_punct")
        + F.lit(_W_DIGIT) * F.col("n_digit")
    )
    return f.select(
        "doc_id",
        "n_tok",
        "n_uniq",
        "n_punct",
        "n_digit",
        logit.cast("bigint").alias("logit_micro"),
        (logit > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty curve
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
            FROM toks),
    shs AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
            FROM idx),
    sh AS (SELECT doc_id,
                  CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)
                    AS shingle_h
           FROM shs),
    flagged AS (
      SELECT doc_id,
             CASE WHEN MIN(doc_id) OVER (PARTITION BY shingle_h) = doc_id
                  THEN 1 ELSE 0 END AS novel
      FROM sh
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           CAST((SUM(novel) * 1000000) // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM flagged
    GROUP BY doc_id
    """,
    tags=("llm", "text", "curation"),
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document novelty: the fraction of its distinct 3-gram
    shingles whose corpus-wide first occurrence (min doc_id) is this
    document.  Plotted over ingest order this is the "new information
    per shard" curve that decides when more of a source stops paying.

    ONE |shingle|-keyed shuffle: ``min(doc_id) over (partition by
    shingle)`` marks first occurrences in the same pass that groups
    them (the aggregate-then-join-back formulation pays the shingle
    shuffle twice — measured 2× slower at sf0.1), then a |docs|-sized
    groupBy rolls up.  The key is a 60-bit md5 prefix, not the
    shingle string — the shuffle/sort moves 8-byte ints instead of
    ~40-byte strings (the checksum-distinct trick; both engines hash
    identically, so any prefix collision merges the same pair on both
    sides and results stay bit-equal).  Same inverted-index posture
    as the Jaccard dedup family; no quadratic term anywhere."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.llm.dedup import shingle_table

    # shingle_table (not an inline explode): it carries the explicit
    # repartition that stops AQE from coalescing the CPU-heavy explode
    # onto one task
    d = table(spark, sf_dir, "documents")
    sh = shingle_table(d).select(
        "doc_id",
        F.expr(
            "CAST(conv(substr(md5(shingle), 1, 15), 16, 10) AS BIGINT)"
        ).alias("shingle_h"),
    )
    w = Window.partitionBy("shingle_h")
    flagged = sh.select(
        "doc_id",
        F.when(F.min("doc_id").over(w) == F.col("doc_id"), 1)
        .otherwise(0)
        .alias("novel"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("novel").cast("bigint").alias("n_novel"),
        F.expr(
            "CAST((sum(novel) * 1000000) div count(*) AS BIGINT)"
        ).alias("novelty_ppm"),
    )


@register(
    "text_zipf_profile",
    oracle="""
    WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
                 FROM documents),
    freq AS (SELECT w, COUNT(*) AS f FROM tok WHERE w <> '' GROUP BY w),
    ranked AS (SELECT w, f,
                      ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS rnk
               FROM freq)
    SELECT rnk, w, f, CAST(rnk * f AS BIGINT) AS rank_x_freq
    FROM ranked WHERE rnk <= 30
    """,
    tags=("llm", "text", "stats", "zipf"),
)
def text_zipf_profile(spark, sf_dir):
    """Zipf rank-frequency profile: top-30 words with the rank×freq
    product — near-constant under Zipf's law, so drift in this column
    across corpus snapshots flags distribution shift (the companion
    to the Heaps-law vocabulary-growth probe, `text_vocab_growth`).
    One |vocab|-sized aggregate then a tiny global rank; everything
    exact integers."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w = Window.orderBy(F.desc("f"), F.asc("w"))
    return (
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 30)
        .select(
            "rnk", "w", "f", (F.col("rnk") * F.col("f")).cast("bigint").alias("rank_x_freq")
        )
    )


@register(
    "text_kneser_ney_bigram",
    bench=True,
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM documents),
    bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t) - 1)) AS i
                 FROM toks WHERE len(t) >= 2)),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS cn,
                  COUNT(DISTINCT w2) AS n1fw
           FROM bg GROUP BY 1),
    cont AS (SELECT w2, COUNT(DISTINCT w1) AS n1bw FROM bg GROUP BY 1),
    b AS (SELECT COUNT(*) AS btypes FROM c2),
    scored AS (
      SELECT bg.doc_id,
             (greatest(4 * c2.c - 3, 0) * {_PPB}) // (4 * c1.cn)
               AS t1_ppb,
             (3 * c1.n1fw * cont.n1bw * {_PPB}) // (4 * c1.cn * b.btypes)
               AS t2_ppb
      FROM bg JOIN c2 USING (w1, w2)
              JOIN c1 USING (w1)
              JOIN cont USING (w2)
              CROSS JOIN b)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(t1_ppb + t2_ppb) AS BIGINT) AS score_sum,
           CAST(SUM(t1_ppb + t2_ppb) // COUNT(*) AS BIGINT) AS avg_p_ppb
    FROM scored GROUP BY doc_id
    """,
    tags=("llm", "text", "quality", "lm"),
)
def text_kneser_ney_bigram(spark, sf_dir):
    """Interpolated KNESER-NEY bigram scoring per document — the
    smoother real LM-quality filters (KenLM/CCNet lineage) actually
    use, next to ``text_bigram_lm_score``'s add-one baseline:
    P(w2|w1) = max(c(w1w2)−D, 0)/c(w1) + D·N1+(w1·)/c(w1) · Pcont(w2)
    with discount D = 0.75 and the continuation probability
    Pcont(w2) = N1+(·w2)/|bigram types| — so a word's score reflects
    how many CONTEXTS it completes, not raw frequency (the property
    that makes KN robust to bursty tokens).  With D = 3/4 both terms
    are exact integer rationals; each is floored to parts-per-billion
    separately (t1 = (4c−3)⁺·1e9 // 4c₁;
    t2 = 3·N1fw·N1bw·1e9 // (4c₁·B)) so both engines agree
    bit-for-bit — same fixed-point discipline as the add-one query.

    Plan shape: bigrams build MAP-SIDE from the token array; the pair
    table ``c2`` is the ONLY corpus-sized aggregation and is
    checkpointed once (``_pair_table``), so it EXECUTES once — every
    other count table derives from its materialized |bigram-type|
    rows: C(w1) = sum of c per w1, N1+(w1·) = c2's row count per w1,
    N1+(·w2) = c2's row count per w2, B = count(c2).  (The r12 form
    derived these from an unmaterialized c2 and runtime exchange
    reuse never fired, so the corpus pair aggregation executed FOUR
    times per run.)  B is a one-row broadcast; the other stats sides
    are statically broadcast under the probed row budget and fall
    back to shuffle joins above it.  At 100 TB every stats shuffle is
    |bigram-type|-sized, never |corpus|."""
    _tok, bg, c2, fits = _pair_table(spark, sf_dir)
    # COUNT(DISTINCT w2) per w1 over the raw stream == row count per
    # w1 in the distinct-pair table; same for the predecessor side.
    # All four stats tables read the checkpointed |bigram-type|
    # blocks, so the corpus pair aggregation executes ONCE (the r12
    # form executed it four times — once per derived side).
    c1 = c2.groupBy("w1").agg(
        F.sum("c").alias("cn"),
        F.count(F.lit(1)).alias("n1fw"),
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1bw"))
    b = c2.agg(F.count(F.lit(1)).alias("btypes"))
    if fits:
        c2, c1, cont = F.broadcast(c2), F.broadcast(c1), F.broadcast(cont)
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .join(cont, ["w2"])
        .crossJoin(F.broadcast(b))
        .select(
            "doc_id",
            F.expr(
                f"(greatest(4 * c - 3, 0) * {_PPB}) div (4 * cn)"
            ).alias("t1_ppb"),
            F.expr(
                f"(3 * n1fw * n1bw * {_PPB}) div (4 * cn * btypes)"
            ).alias("t2_ppb"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum(F.col("t1_ppb") + F.col("t2_ppb")).cast("bigint").alias("score_sum"),
        F.expr(
            "CAST(sum(t1_ppb + t2_ppb) div count(*) AS BIGINT)"
        ).alias("avg_p_ppb"),
    )


# ---------------------------------------------------------------------------
# Within-document repetition (round 9; the rule-gate census itself is
# curation_queries.text_gopher_rules — this is its missing dimension)
# ---------------------------------------------------------------------------

_REP_FLAG_PPM = 100_000  # "repetitive" at >= 10% duplicate 2-grams


@register(
    "text_repetition_profile",
    bench=True,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             greatest(len(t) - 1, 1) AS n_2,
             len(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 1, 1)),
               i -> array_to_string(t[i:i+1], ' ')))) AS u_2,
             greatest(len(t) - 2, 1) AS n_3,
             len(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 1)),
               i -> array_to_string(t[i:i+2], ' ')))) AS u_3
      FROM toks
    )
    SELECT doc_id,
           CAST(n_2 AS BIGINT) AS n_2grams,
           CAST((n_2 - u_2) * 1000000 // n_2 AS BIGINT) AS dup2_ppm,
           CAST(n_3 AS BIGINT) AS n_3grams,
           CAST((n_3 - u_3) * 1000000 // n_3 AS BIGINT) AS dup3_ppm,
           (n_2 - u_2) * 1000000 // n_2 >= {_REP_FLAG_PPM} AS repetitive
    FROM grams ORDER BY doc_id
    """,
    tags=("llm", "text", "quality", "repetition", "gopher", "curation"),
)
def text_repetition_profile(spark, sf_dir):
    """WITHIN-DOCUMENT REPETITION PROFILE — the Gopher repetition
    filter (duplicate-n-gram fraction; looping/boilerplate text is the
    classic model-collapse input): per document, the fraction of 2-gram
    and 3-gram occurrences that are repeats of an earlier n-gram in the
    SAME document, in exact integer ppm (dup = occurrences − distinct;
    both are array lengths, no join, no shuffle), plus the keep/drop
    flag at the 10% duplicate-2-gram threshold.

    Scale shape: per-row array arithmetic (shingle build +
    array_distinct), embarrassingly parallel — but CPU-bound, not
    byte-bound, so the input is spread to defaultParallelism first
    (the shingle_table lesson: a scan often has fewer splits than
    cores, and AQE coalesces by bytes, serializing the expensive
    higher-order-function work onto one task — measured 10.0 s → 1.1 s
    at sf0.1 on local[32]).  Contrast with cross-document dedup
    (dedup_*): repetition is the within-row complement the same
    pipelines run in the same pass."""
    d = table(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    d = d.repartition(n_parts, F.col("doc_id"))
    g2 = word_shingles("text", 2)
    g3 = word_shingles("text", 3)
    grams = d.select(
        "doc_id",
        F.size(g2).cast("bigint").alias("n_2"),
        F.size(F.array_distinct(g2)).cast("bigint").alias("u_2"),
        F.size(g3).cast("bigint").alias("n_3"),
        F.size(F.array_distinct(g3)).cast("bigint").alias("u_3"),
    )
    dup2 = F.expr("(n_2 - u_2) * 1000000 div n_2").cast("bigint")
    dup3 = F.expr("(n_3 - u_3) * 1000000 div n_3").cast("bigint")
    return grams.select(
        "doc_id",
        F.col("n_2").alias("n_2grams"),
        dup2.alias("dup2_ppm"),
        F.col("n_3").alias("n_3grams"),
        dup3.alias("dup3_ppm"),
        (dup2 >= _REP_FLAG_PPM).alias("repetitive"),
    ).orderBy("doc_id")
