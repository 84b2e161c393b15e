"""Tokenizer-training / distributional-stats declared queries (wave 8).

The two corpus-statistics passes every tokenizer / embedding pipeline
runs before training, expressed as pure aggregation plans:

- ``text_bpe_pair_merge`` — ONE byte-pair-encoding merge step: count
  adjacent symbol pairs across the corpus and rank the merge
  candidates.  The classic trick makes this vocabulary-sized work:
  aggregate words to (word, count) FIRST, then explode each DISTINCT
  word's pairs weighted by its count — corpus size only enters
  through the word-count aggregation (map-side combined), never
  through the pair explosion.
- ``text_cooccurrence_topk`` — skip-gram co-occurrence counts (the
  PMI/word2vec input): token pairs within a ±2 position window in the
  same document, with each word's global frequency attached (exact
  integers; downstream PMI is a per-row log over these columns).

Scale notes (100 TB): BPE pair counting shuffles |vocab| rows, not
|corpus| — vocabulary grows ~Heaps' law (sub-linearly), so the
explode side stays small no matter the corpus.  Co-occurrence
self-joins positions WITHIN a document (shuffle key doc_id, window
bounded by ±2), so the pair stream is O(tokens * window) with no
cross-document traffic; the global word-count table is
vocabulary-sized and broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.llm.text import tokens
from lakehouse_cdc_spark.operators.hints import runtime_sized
from lakehouse_cdc_spark.plans.registry import register, table

# ---------------------------------------------------------- iterative BPE
# Symbol sequences are encoded as marker-wrapped strings — each symbol
# becomes "␟sym␞" — so one BPE merge is a LITERAL string replace:
# replace(s, '␟a␞␟b␞', '␟ab␞').  The wrap makes boundary confusion
# impossible (a pattern can neither start mid-symbol nor stop inside
# one, and adjacent matches share no characters), so left-to-right
# non-overlapping replace() — identical semantics in Spark and DuckDB
# — IS the textbook greedy BPE merge scan.
_BPE_ROUNDS = 3
_BPE_TOPK = 5
_M1, _M2 = "␟", "␞"  # ␟ symbol-start, ␞ symbol-end


def _bpe_round_sql(r: int) -> str:
    prev = f"words{r - 1}"
    return f"""
    syms{r} AS (SELECT string_split(s, '{_M2}') AS parts, cnt FROM {prev}),
    pairs{r} AS (
      SELECT substr(parts[i], 2) AS a, substr(parts[i + 1], 2) AS b, cnt
      FROM syms{r}, unnest(generate_series(1, len(parts) - 2)) AS t(i)
    ),
    counted{r} AS (
      SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c FROM pairs{r} GROUP BY a, b
    ),
    top{r} AS (
      SELECT CAST({r} AS INT) AS round,
             CAST(ROW_NUMBER() OVER (ORDER BY c DESC, a, b) AS INT) AS rnk,
             a AS pair_a, b AS pair_b, c AS pair_count
      FROM counted{r} QUALIFY rnk <= {_BPE_TOPK}
    ),
    best{r} AS (SELECT pair_a AS a, pair_b AS b FROM top{r} WHERE rnk = 1),
    words{r} AS (
      SELECT w, replace(s,
               '{_M1}' || (SELECT a FROM best{r}) || '{_M2}{_M1}'
                       || (SELECT b FROM best{r}) || '{_M2}',
               '{_M1}' || (SELECT a FROM best{r})
                       || (SELECT b FROM best{r}) || '{_M2}') AS s,
             cnt
      FROM {prev}
    )"""


def _bpe_train_oracle() -> str:
    rounds = ",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))
    unions = " UNION ALL ".join(
        f"SELECT * FROM top{r}" for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ),
    words0 AS (
      SELECT w, regexp_replace(w, '(.)', '{_M1}\\1{_M2}', 'g') AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok WHERE w <> '' GROUP BY w
    ),
    {rounds}
    {unions}
    """


@register(
    "text_bpe_pair_merge",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ),
    words AS (SELECT w, COUNT(*) AS cnt FROM tok WHERE length(w) >= 2 GROUP BY w),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, cnt
      FROM words, unnest(generate_series(1, length(w) - 1)) AS t(i)
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
    tags=("llm", "text", "tokenizer", "A4"),
)
def text_bpe_pair_merge(spark, sf_dir):
    """One BPE merge step: the top adjacent character pairs over the
    corpus, counted word-frequency-weighted.  Words are aggregated to
    (word, cnt) before any pair explosion, so the explode runs over
    the DISTINCT vocabulary (sub-linear in corpus size) and each
    pair's count is cnt-weighted — the exact layout fast BPE trainers
    use.  Single-char words carry no pair and are filtered explicitly
    (Spark's sequence(1, 0) would count DOWN, not return empty).
    Top-20 with a total order (count desc, pair asc) so the ranking
    is partitioning-independent."""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = words.select(
        "cnt",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(20)
    )


@register(
    "text_bpe_train_iterative",
    oracle=_bpe_train_oracle(),
    tags=("llm", "text", "tokenizer", "iterative", "A4"),
)
def text_bpe_train_iterative(spark, sf_dir):
    """Per-round top-5 merge candidates of the 3-round BPE fit (see
    _bpe_fit for the full walkthrough and scale shape)."""
    out, _ = _bpe_fit(spark, sf_dir)
    return out


def _bpe_fit(spark, sf_dir):
    """ITERATIVE BPE training: 3 merge rounds with the vocabulary
    rewritten between rounds (text_bpe_pair_merge is the single-step
    form).  Per round: count adjacent symbol pairs over the DISTINCT
    vocabulary weighted by word count (the shuffle is |vocab|-sized,
    never |corpus| — corpus size enters only through the words0
    aggregation), pull the argmax pair to the driver (an O(1)-row
    probe, same class as the documented convergence probes), and
    rewrite every word with one literal replace() on the
    marker-wrapped encoding — map-side over the cached vocabulary,
    no shuffle.  Emits each round's top-5 merge candidates
    (rank 1 = the applied merge); the oracle unrolls the identical
    three rounds as CTEs, scalar-subquery argmax included."""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "w", F.regexp_replace("w", "(.)", f"{_M1}$1{_M2}").alias("s"), "cnt"
        )
        # the vocabulary every merge round rewrites — one corpus
        # tokenization per invocation (localCheckpoint, no cross-run
        # CacheManager reuse)
        .localCheckpoint()
    )
    parts = f"split(s, '{_M2}')"
    pair_expr = (
        f"transform(sequence(1, size({parts}) - 2), "
        f"i -> struct(substring(element_at({parts}, i), 2) AS a, "
        f"substring(element_at({parts}, i + 1), 2) AS b))"
    )
    order = [F.desc("pair_count"), F.asc("a"), F.asc("b")]
    rnk = F.row_number().over(Window.orderBy(*order))
    cur = words
    rounds = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        counted = (
            # ≥ 2 symbols, i.e. ≥ 3 split parts: Spark's sequence(1, 0)
            # counts DOWN instead of returning empty
            cur.filter(F.expr(f"size({parts}) >= 3"))
            .select("cnt", F.explode(F.expr(pair_expr)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        top = counted.orderBy(*order).limit(_BPE_TOPK)
        rounds.append(
            top.select(
                F.lit(rnd).alias("round"),
                rnk.alias("rnk"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                "pair_count",
            )
        )
        best = top.orderBy(*order).first()  # O(1)-row driver probe
        if best is None:
            break
        pat = f"{_M1}{best['a']}{_M2}{_M1}{best['b']}{_M2}"
        rep = f"{_M1}{best['a']}{best['b']}{_M2}"
        cur = cur.select(
            "w", F.replace("s", F.lit(pat), F.lit(rep)).alias("s"), "cnt"
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionAll(r)
    return out, cur


@register(
    "text_cooccurrence_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, toks[i] AS tok, i AS pos
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents),
           unnest(generate_series(1, len(toks))) AS t(i)
    ),
    wcnt AS (SELECT tok, COUNT(*) AS wc FROM tok GROUP BY tok),
    pairs AS (
      SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos + 1 AND a.pos + 2
    ),
    top AS (
      SELECT w1, w2, COUNT(*) AS pair_cnt FROM pairs GROUP BY w1, w2
    )
    SELECT t.w1, t.w2, CAST(t.pair_cnt AS BIGINT) AS pair_cnt,
           CAST(c1.wc AS BIGINT) AS w1_cnt, CAST(c2.wc AS BIGINT) AS w2_cnt
    FROM top t JOIN wcnt c1 ON t.w1 = c1.tok JOIN wcnt c2 ON t.w2 = c2.tok
    ORDER BY pair_cnt DESC, w1, w2
    LIMIT 30
    """,
    tags=("llm", "text", "cooccurrence", "J1"),
)
def text_cooccurrence_topk(spark, sf_dir):
    """Skip-gram co-occurrence: unordered token pairs within a ±2
    window in the same document, top-30 by count, each word annotated
    with its global frequency (the exact-integer inputs to PMI — the
    log itself stays out of the oracle surface on purpose; transcen-
    dental rounding is engine-specific).  The position self-join keys
    on doc_id so pair generation never crosses documents, and the
    window predicate bounds fan-out at 2 pairs per token; the
    vocabulary-sized count table joins broadcast."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), "tok")
    a = tok.select(
        F.col("doc_id"), F.col("pos").alias("a_pos"), F.col("tok").alias("a_tok")
    )
    b = tok.select(
        F.col("doc_id"), F.col("pos").alias("b_pos"), F.col("tok").alias("b_tok")
    )
    pairs = a.join(b, "doc_id").filter(
        F.col("b_pos").between(F.col("a_pos") + 1, F.col("a_pos") + 2)
    )
    top = (
        pairs.select(
            F.least("a_tok", "b_tok").alias("w1"),
            F.greatest("a_tok", "b_tok").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    wcnt = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("wc"))
    return (
        top.join(runtime_sized(wcnt.withColumnRenamed("tok", "w1"), "vocabulary"), "w1")
        .withColumnRenamed("wc", "w1_cnt")
        .join(
            runtime_sized(
                wcnt.select(F.col("tok").alias("w2"), F.col("wc").alias("w2_cnt")),
                "vocabulary",
            ),
            "w2",
        )
        .select("w1", "w2", "pair_cnt", "w1_cnt", "w2_cnt")
        .orderBy(F.desc("pair_cnt"), F.asc("w1"), F.asc("w2"))
        .limit(30)
    )


def _bpe_encode_oracle() -> str:
    rounds = ",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))
    return f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ),
    words0 AS (
      SELECT w, regexp_replace(w, '(.)', '{_M1}\\1{_M2}', 'g') AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok WHERE w <> '' GROUP BY w
    ),
    {rounds},
    enc AS (
      SELECT w,
             CAST(len(string_split(s, '{_M2}')) - 1 AS BIGINT) AS enc_len
      FROM words{_BPE_ROUNDS}
    ),
    docw AS (
      SELECT d.source, d.doc_id,
             unnest(string_split_regex(trim(d.text), '\\s+')) AS w
      FROM documents d
    )
    SELECT dw.source,
           CAST(COUNT(DISTINCT dw.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(dw.w)) AS BIGINT) AS chars_total,
           CAST(SUM(e.enc_len) AS BIGINT) AS symbols_total,
           round(CAST(SUM(e.enc_len) AS DOUBLE)
                 / SUM(length(dw.w)), 6) AS compression
    FROM docw dw JOIN enc e ON dw.w = e.w
    WHERE dw.w <> ''
    GROUP BY dw.source
    ORDER BY dw.source
    """


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("llm", "text", "tokenizer", "encode", "A4"),
)
def text_bpe_encode(spark, sf_dir):
    """The APPLY half of BPE: encode the whole corpus with the 3
    trained merges and report per-source token economics (chars in,
    symbols out, compression ratio).  The fitted vocabulary maps each
    DISTINCT word to its merged symbol count, so encoding the corpus
    is a broadcast join of that |vocab|-sized table against the
    exploded token stream — documents are never re-scanned per merge,
    and per-doc work is O(tokens).  This is exactly how production
    tokenizers amortize: fit on the vocabulary, apply by lookup.  The
    oracle replays the identical 3-round fit as CTEs and joins the
    same mapping, so the compression numbers match bit-for-bit (ratio
    derived from exact integer sums at the end)."""
    _, vocab = _bpe_fit(spark, sf_dir)
    enc = vocab.select(
        "w",
        (F.size(F.split("s", _M2)) - 1).cast("bigint").alias("enc_len"),
    )
    d = table(spark, sf_dir, "documents")
    docw = d.select(
        "source", "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    return (
        docw.join(runtime_sized(enc, "vocabulary"), "w")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("chars_total"),
            F.sum("enc_len").cast("bigint").alias("symbols_total"),
            F.round(
                F.sum("enc_len").cast("double") / F.sum(F.length("w")), 6
            ).alias("compression"),
        )
        .orderBy("source")
    )


_HEAPS_FRACS = (125, 250, 500, 1000)  # permille of max doc_id


@register(
    "text_vocab_growth",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    fr AS (SELECT unnest(ARRAY{list(_HEAPS_FRACS)}) AS permille),
    tok AS (
      SELECT d.doc_id, unnest(string_split_regex(trim(d.text), '\\s+')) AS w
      FROM documents d
    )
    SELECT f.permille,
           CAST(COUNT(DISTINCT CASE WHEN t.doc_id * 1000 <= m.m * f.permille
                                    THEN t.doc_id END) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN t.doc_id * 1000 <= m.m * f.permille
                           AND t.w <> '' THEN 1 END) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT CASE WHEN t.doc_id * 1000 <= m.m * f.permille
                                    AND t.w <> '' THEN t.w END) AS BIGINT)
             AS vocab_size
    FROM tok t, mx m, fr f
    GROUP BY f.permille
    ORDER BY f.permille
    """,
    tags=("llm", "text", "heaps", "vocabulary", "A3"),
)
def text_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth: distinct-word counts over nested
    corpus prefixes (12.5% / 25% / 50% / 100% by doc id) — the
    empirical sub-linear curve that justifies every \"shuffle is
    |vocab|, not |corpus|\" claim the tokenizer family makes, measured
    rather than asserted.  One token explosion serves all four
    prefixes via conditional aggregation (integer permille thresholds,
    no float fractions), so the scan cost is paid once.  At 100 TB the
    same query shape monitors vocabulary drift between ingest
    snapshots."""
    docs = table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("m"))
    # NO early w != '' filter: a token-less document must still count
    # in n_docs (the oracle guards only n_tokens/vocab_size on w —
    # both sides now agree for all-whitespace documents)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    fr = spark.createDataFrame([(p,) for p in _HEAPS_FRACS], "permille long")
    in_prefix = F.col("doc_id") * 1000 <= F.col("m") * F.col("permille")
    nonempty = F.col("w") != ""
    return (
        tok.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(fr))
        .groupBy("permille")
        .agg(
            F.countDistinct(F.when(in_prefix, F.col("doc_id"))).alias("n_docs"),
            F.count(F.when(in_prefix & nonempty, 1)).alias("n_tokens"),
            F.countDistinct(
                F.when(in_prefix & nonempty, F.col("w"))
            ).alias("vocab_size"),
        )
        .orderBy("permille")
    )


@register(
    "text_word_burstiness",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM tok),
    per_doc AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY w, doc_id
    ),
    stats AS (
      SELECT w,
             CAST(SUM(c) AS BIGINT) AS total,
             SUM(c * c) AS total_sq,  -- HUGEINT: Σc² cliffs int64 first
             CAST(COUNT(*) AS BIGINT) AS docs_with
      FROM per_doc GROUP BY w
    )
    SELECT s.w AS word, s.total, s.docs_with,
           -- Fano factor (VMR) with denominators cleared: zero-count
           -- docs included via nd; var_num = nd*Σc² - (Σc)², mean_num
           -- = nd*Σc — 128-bit math, emitted as digit strings
           CAST(CAST(n.nd AS HUGEINT) * s.total_sq
                - CAST(s.total AS HUGEINT) * s.total AS VARCHAR) AS var_num,
           CAST(CAST(n.nd AS HUGEINT) * s.total AS VARCHAR) AS mean_num,
           round(CAST(CAST(n.nd AS HUGEINT) * s.total_sq
                      - CAST(s.total AS HUGEINT) * s.total AS DOUBLE)
                 / CAST(CAST(n.nd AS HUGEINT) * s.total AS DOUBLE), 6)
             AS burstiness_vmr
    FROM stats s, nd n
    ORDER BY s.total DESC, s.w
    LIMIT 20
    """,
    tags=("llm", "text", "burstiness", "dispersion", "A4"),
)
def text_word_burstiness(spark, sf_dir):
    """Word burstiness (Fano factor / variance-to-mean ratio of
    per-document counts, zero-count documents included): function
    words spread evenly (VMR near 1, Poisson-like) while topical
    words CLUMP (VMR >> 1) — the dispersion signal behind stopword
    induction and keyword weighting, computed for the corpus' top-20
    words.  Denominators cleared as everywhere: var and mean
    numerators are exact bigints over one (word, doc) count table;
    the output ratio rounds once.  Shape: token explosion → two
    grouped aggregates, both map-side combined."""
    tok = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
    )
    nd = tok.agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    stats = per_doc.groupBy("w").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias(
            "total_sq"
        ),
        F.count(F.lit(1)).alias("docs_with"),
    )
    ndw = F.col("nd").cast("decimal(38,0)")
    totw = F.col("total").cast("decimal(38,0)")
    var_num = ndw * F.col("total_sq") - totw * totw
    mean_num = ndw * totw
    return (
        stats.crossJoin(F.broadcast(nd))
        .select(
            F.col("w").alias("word"),
            "total",
            "docs_with",
            var_num.cast("decimal(38,0)").cast("string").alias("var_num"),
            mean_num.cast("decimal(38,0)").cast("string").alias("mean_num"),
            F.round(
                var_num.cast("double") / mean_num.cast("double"), 6
            ).alias("burstiness_vmr"),
        )
        .orderBy(F.desc("total"), F.asc("word"))
        .limit(20)
    )


def _bpe_roundtrip_oracle() -> str:
    rounds = ",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))
    return f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ),
    words0 AS (
      SELECT w, regexp_replace(w, '(.)', '{_M1}\\1{_M2}', 'g') AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok WHERE w <> '' GROUP BY w
    ),
    {rounds},
    audit AS (
      SELECT w, s,
             replace(replace(s, '{_M1}', ''), '{_M2}', '') AS decoded,
             CAST(len(string_split(s, '{_M2}')) - 1 AS BIGINT) AS n_syms,
             CAST((SELECT MAX(length(substr(p, 2)))
                   FROM unnest(string_split(s, '{_M2}')) AS u(p)
                   WHERE p <> '') AS BIGINT) AS max_sym
      FROM words{_BPE_ROUNDS}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_words,
           CAST(SUM(CASE WHEN decoded = w THEN 1 ELSE 0 END) AS BIGINT)
             AS decoded_ok,
           CAST(COUNT(*) = SUM(CASE WHEN decoded = w THEN 1 ELSE 0 END)
                AS BOOLEAN) AS lossless,
           CAST(SUM(n_syms) AS BIGINT) AS symbols_total,
           CAST(MAX(max_sym) AS BIGINT) AS max_symbol_chars,
           CAST(SUM(CASE WHEN n_syms = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS fully_merged_words
    FROM audit
    """


@register(
    "text_bpe_roundtrip",
    oracle=_bpe_roundtrip_oracle(),
    tags=("llm", "text", "tokenizer", "roundtrip", "detokenize"),
)
def text_bpe_roundtrip(spark, sf_dir):
    """The DETOKENIZE half + the losslessness audit every tokenizer
    ships with: decode each fitted vocabulary entry (strip the symbol
    markers, i.e. concatenate its symbols in order) and verify
    decode(encode(w)) == w for EVERY word — merges must never lose or
    reorder characters.  Also reports the vocabulary economics a
    tokenizer card records: total symbols, the longest learned symbol,
    and how many words collapsed to a single symbol after 3 merge
    rounds.  One |vocab|-row aggregate over the broadcast-sized fitted
    table — the corpus is not re-read at all (fit once, audit the
    artifact), so the audit is free at any corpus scale.  The oracle
    replays the identical fit and audit in SQL."""
    _, vocab = _bpe_fit(spark, sf_dir)
    audit = vocab.select(
        "w",
        F.regexp_replace(
            F.regexp_replace("s", _M1, ""), _M2, ""
        ).alias("decoded"),
        (F.size(F.split("s", _M2)) - 1).cast("bigint").alias("n_syms"),
        F.aggregate(
            F.filter(F.split("s", _M2), lambda p: p != ""),
            F.lit(0).cast("bigint"),
            lambda acc, p: F.greatest(
                acc, (F.length(p) - 1).cast("bigint")
            ),
        ).alias("max_sym"),
    )
    return audit.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_words"),
        F.sum(F.when(F.col("decoded") == F.col("w"), 1).otherwise(0))
        .cast("bigint")
        .alias("decoded_ok"),
        (
            F.count(F.lit(1))
            == F.sum(F.when(F.col("decoded") == F.col("w"), 1).otherwise(0))
        ).alias("lossless"),
        F.sum("n_syms").cast("bigint").alias("symbols_total"),
        F.max("max_sym").cast("bigint").alias("max_symbol_chars"),
        F.sum(F.when(F.col("n_syms") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("fully_merged_words"),
    )
