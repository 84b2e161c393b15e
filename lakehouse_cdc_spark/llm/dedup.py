"""Fuzzy-deduplication operators: n-gram Jaccard, MinHash+LSH, SimHash.

All three run on native columnar functions only (split / transform /
md5 / explode / joins) — no Python in the hot path, so the plans
scale out like any other Spark job.

Hashing is md5-based everywhere (not xxhash64/murmur) deliberately:
md5 is bit-identical across engines, which makes every stage of the
pipeline oracle-checkable in DuckDB.

Scale notes (100 TB):
- the shingle inverted index (explode → self-join) is quadratic in
  per-shingle document frequency; production adds a frequency cap
  (drop shingles appearing in > F docs — they carry no dedup signal).
  ``jaccard_pairs(max_shingle_freq=...)`` implements the cap.
- MinHash+LSH replaces the all-pairs join with |bands| equi-joins on
  band buckets — candidates only, verified afterwards.  That IS the
  scale path: cost is O(docs × k) + bucket-join, never O(docs²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.llm.text import tokens, word_shingles


def shingle_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, shingle) — distinct n-word shingles per document.

    Two scale decisions:
    - ``repartition(id_col)`` first: a documents scan often has far
      fewer splits than cores (locally: one file = one task), and the
      shingle explosion is the expensive part — spread it across the
      cluster before it runs.  Downstream per-doc windows then reuse
      this hash partitioning (no second shuffle).
    - dedup happens *inside* the row (``array_distinct`` before
      explode), so no (id, shingle) distinct-shuffle is ever needed —
      per-doc shingle sets are tiny; the cluster-wide shingle table
      never has to be deduplicated."""
    # explicit partition count: AQE would coalesce a tiny exchange to
    # one partition by byte size, serializing the CPU-heavy explode —
    # shingle cost scales with tokens, not input bytes
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias(
            "shingle"
        ),
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ≥ threshold.

    shingle inverted index → self-equi-join → |∩| per pair →
    J = |∩| / (|A|+|B|−|∩|).  ``max_shingle_freq`` drops ubiquitous
    shingles before the join (the standard guard against quadratic
    blowup on boilerplate text).
    """
    sh = shingle_table(docs, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq_w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(freq_w))
            .filter(F.col("__df") <= max_shingle_freq)
            .drop("__df")
        )
    # carry |doc| on every shingle row (one window pass) so the pair
    # aggregation needs NO post-join with a sizes table — and both join
    # sides share an identical subplan, which Catalyst executes once
    # (ReusedExchange) instead of recomputing the shingle explosion
    sized = sh.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    a = sized.select(F.col(id_col).alias("da"), "shingle", F.col("__n").alias("na"))
    b = sized.select(F.col(id_col).alias("db"), "shingle", F.col("__n").alias("nb"))
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("da", "db", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    threshold_permille: int = 800,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """DIRECTIONAL shingle containment |A∩B| / |A| ≥ threshold — the
    asymmetric companion to Jaccard that symmetric scores miss: a
    short document wholly embedded in a long one has tiny Jaccard (the
    union is dominated by B) but containment(A→B) ≈ 1.  This is
    Broder's containment coefficient, the quote/mirror/sub-document
    detector every crawl-dedup stack runs next to resemblance.

    Same inverted-index shape as :func:`jaccard_pairs` (one shingle
    explosion, self-equi-join on the DF-capped shingle space), and the
    score is exact integer permille — engine-identical, no float
    thresholds.

    Intersection counts are SYMMETRIC (|A∩B| = |B∩A|), so the pair
    space is generated and aggregated ONCE under ``da < db`` — half
    the join output and half the aggregate's hash state, the same
    halving :func:`jaccard_pairs` uses — and the two directional rows
    are then minted map-side from each aggregated pair with a 2-way
    ``explode`` (a ``union`` of the swapped projection would instead
    duplicate the whole join subtree: Spark computes each union branch
    independently).  Both sides of the self-join carry their doc size
    from one identical subplan, so exchange reuse applies and no
    post-aggregation sizes join is needed.
    """
    sh = shingle_table(docs, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq_w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(freq_w))
            .filter(F.col("__df") <= max_shingle_freq)
            .drop("__df")
        )
    sized = sh.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    a = sized.select(
        F.col(id_col).alias("da"), "shingle", F.col("__n").alias("na")
    )
    b = sized.select(
        F.col(id_col).alias("db"), "shingle", F.col("__n").alias("nb")
    )
    half = (
        a.join(b, on="shingle")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    both = half.select(
        F.explode(
            F.array(
                F.struct(F.col("da"), F.col("db"), F.col("na")),
                F.struct(
                    F.col("db").alias("da"),
                    F.col("da").alias("db"),
                    F.col("nb").alias("na"),
                ),
            )
        ).alias("p"),
        "inter",
    ).select("p.da", "p.db", "p.na", "inter")
    return (
        both.withColumn(
            "containment_permille",
            F.expr("inter * 1000 div na").cast("bigint"),
        )
        .filter(F.col("containment_permille") >= threshold_permille)
        .select(
            "da",
            "db",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("inter").cast("bigint").alias("inter"),
            "containment_permille",
        )
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """EXACT Jaccard ≥ 0.5 similarity join via PREFIX FILTERING — the
    SSJoin/PPJoin principle (Chaudhuri et al. ICDE 2006, Xiao et al.
    WWW 2008): order every document's shingles by ascending global
    document frequency (rarest first, shingle tie-break) and keep only
    the first |A| − ceil(t·|A|) + 1 as its *prefix*; any pair with
    Jaccard ≥ t MUST share at least one prefix token under that common
    ordering, so joining on prefix tokens alone loses no true pair.
    Candidates are then verified with the exact intersection count.

    Unlike MinHash-LSH (probabilistic recall) or a DF cap (changed
    semantics), the output here is IDENTICAL to the naive all-shingle
    join — which is exactly what the DuckDB oracle computes, making
    the equivalence a proof, not a claim.  The pruning is what makes
    the exact join scale: prefixes are the RAREST tokens, so the
    candidate join is bounded by rare-token postings, never by
    boilerplate."""
    t_num, t_den = 1, 2  # threshold 0.5 as an exact rational
    sh = shingle_table(docs, id_col, text_col, n)
    sized = sh.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    # prefix length |A| - ceil(t*|A|) + 1, exact integer
    ranked = sized.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy("df", "shingle")
        ),
    )
    prefix = ranked.filter(
        F.col("r")
        <= F.col("n")
        - F.expr(f"(n * {t_num} + {t_den} - 1) div {t_den}")
        + 1
    )
    pa = prefix.select(F.col(id_col).alias("da"), "shingle")
    pb = prefix.select(F.col(id_col).alias("db"), "shingle")
    cand = (
        pa.join(pb, "shingle")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    full_a = sized.select(
        F.col(id_col).alias("da"), "shingle", F.col("n").alias("na")
    )
    full_b = sized.select(
        F.col(id_col).alias("db"), "shingle", F.col("n").alias("nb")
    )
    inter = (
        cand.join(full_a, "da")
        .join(full_b, ["db", "shingle"])
        .groupBy("da", "db", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(
            F.col("inter") * t_den >= (F.col("na") + F.col("nb") - F.col("inter")) * t_num
        )
        .select("da", "db", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """k-permutation MinHash signature per document.

    Hash family j = md5('<j>|' + shingle): uniformly random per j, so
    min() over a document's shingle set is a proper minhash.  One
    groupBy computes all k mins (k aggregate expressions — the shingle
    table is scanned once, not k times).
    """
    sh = shingle_table(docs, id_col, text_col, n)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*mins)


def band_key(b: int, rows_per_band: int = 2):
    """THE band-key derivation (md5 over the band's '|'-joined
    signature rows) — single source of truth shared by
    :func:`band_table`, :func:`lsh_candidate_pairs`, and the streaming
    index maintainer (streaming/indexing.py:lsh_index_changes); the
    DuckDB oracles mirror it as ``md5(h{i} || '|' || h{j})``.
    Changing it in one place keeps stored indexes, ad-hoc pair
    generation, and feed-maintained indexes join-compatible."""
    return F.md5(
        F.concat_ws(
            "|", *[f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        )
    )


def band_table(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Long-format banded LSH index: one row ``(id_col, band,
    band_key)`` per (document, band), with the same band-key formula
    as :func:`lsh_candidate_pairs` (md5 over the band's signature
    rows) and the streaming maintainer
    (streaming/indexing.py:lsh_index_changes).

    This is the STORED-INDEX shape: persist it once for the deduped
    corpus and every future shard joins against it on (band,
    band_key) — per-shard cost is O(|shard|·k) signature work plus
    |bands| equi-joins, never a recompute of the corpus side.
    ``max_bucket_size`` applies index-build hygiene: degenerate
    buckets (template-identical documents) are dropped AT WRITE TIME,
    so no future reader ever pays their quadratic join — oversized
    buckets mean exact duplicates, which the hash-groupBy exact pass
    catches for free."""
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            band_key(b, rows_per_band).alias("band_key"),
        )
        for b in range(bands)
    ]
    idx = signatures.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.band_key").alias("band_key"),
    )
    if max_bucket_size is not None:
        bw = Window.partitionBy("band", "band_key")
        idx = (
            idx.withColumn("__bs", F.count(F.lit(1)).over(bw))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    return idx


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH: documents sharing any band bucket become a
    candidate pair.  |bands| equi-joins on bucket hash — never an
    all-pairs comparison (the 100 TB path).

    ``max_bucket_size`` drops degenerate buckets (e.g. thousands of
    empty or template-identical documents hash to one bucket, making
    that bucket's self-join quadratic).  With the cap, worst-case
    pair count is O(|buckets|·cap²); an oversized bucket signals
    *exact* duplicates, which the cheap hash-groupBy exact-dedup pass
    handles — LSH only needs to catch the near-misses.

    Implemented as ONE self-join of the :func:`band_table` long-format
    index on (band, band_key) — a single exchange of the bands×N-row
    index (Spark's ReuseExchange shares the identical child between
    the two join sides) instead of |bands| separate full-table
    self-joins unioned together, which at 100 TB is 2·|bands| full
    shuffles of the signature table versus one."""
    idx = band_table(
        signatures,
        bands=bands,
        rows_per_band=rows_per_band,
        id_col=id_col,
        max_bucket_size=max_bucket_size,
    )
    left = idx.select(F.col(id_col).alias("da"), "band", "band_key")
    right = idx.select(F.col(id_col).alias("db"), "band", "band_key")
    return (
        left.join(right, on=["band", "band_key"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )


def simhash_bits(
    docs: DataFrame,
    bits: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "simhash",
) -> DataFrame:
    """``bits``-wide SimHash per document over whitespace tokens
    (bits ≤ 62 so the fingerprint stays a nonnegative signed bigint).

    Each token votes ±1 on every bit of md5(token) (hex nibbles);
    bit p of the fingerprint is 1 iff the vote sum is positive.
    Near-identical documents land within a small Hamming distance.
    Pure SQL expressions (instr/substr/bitmask) so the oracle
    reproduces it bit-for-bit.  One groupBy with ``bits`` conditional
    sums — the shingle table is scanned once."""
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    votes = [
        F.sum(F.expr(_bit_vote_sql(p))).alias(f"s{p}") for p in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    value = None
    for p in range(bits):
        term = F.when(F.col(f"s{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        value = term if value is None else (value + term)
    return agg.select(F.col(id_col), value.cast("bigint").alias(out_col))


def simhash16(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """16-bit SimHash (see :func:`simhash_bits`) — the compact demo
    width; use wider fingerprints for Hamming-join dedup."""
    return simhash_bits(
        docs, bits=16, id_col=id_col, text_col=text_col, out_col="simhash16"
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    bits: int = 60,
    blocks: int = 4,
    max_distance: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs within SimHash Hamming distance
    ``max_distance`` — the Manku/Jain/Sarma web-crawl dedup operator
    (WWW'07), Spark-first: NO recall loss and NO all-pairs scan.

    Pigeonhole exactness: split the ``bits``-wide fingerprint into
    ``blocks`` contiguous blocks; flipping ≤ ``max_distance`` <
    ``blocks`` bits leaves ≥ 1 block untouched, so every pair within
    the Hamming ball shares at least one EXACT block value.
    Candidates are therefore the union of ``blocks`` equi-joins on
    (block index, block value) — each a hash-partitioned shuffle on a
    16-bit-ish key — and the exact ``bit_count(sa ^ sb)`` filter
    keeps precision perfect.  Blocked candidates ≡ brute force by
    construction (tests assert the equivalence), unlike banded
    MinHash-LSH which is probabilistic.

    At 100 TB: the pair space is O(Σ block-bucket²); bucket sizes are
    ~N/2^(bits/blocks) for well-mixed fingerprints, and
    ``max_bucket_size`` caps the degenerate buckets (boilerplate
    templates voting identical blocks) exactly like the LSH cap —
    oversized buckets mean exact duplicates, which hash-groupBy
    catches for free.  Returns (da, db, hamming), da < db."""
    if blocks <= max_distance:
        raise ValueError(
            f"pigeonhole needs blocks > max_distance, got "
            f"{blocks} <= {max_distance}"
        )
    if bits % blocks:
        raise ValueError(f"bits={bits} not divisible by blocks={blocks}")
    width = bits // blocks
    mask = (1 << width) - 1
    sigs = simhash_bits(
        docs, bits=bits, id_col=id_col, text_col=text_col, out_col="simhash"
    )
    pair_sets = []
    for b in range(blocks):
        side = sigs.select(
            F.col(id_col),
            F.col("simhash"),
            F.expr(f"shiftright(simhash, {b * width}) & {mask}").alias("bk"),
        )
        if max_bucket_size is not None:
            bw = Window.partitionBy("bk")
            side = (
                side.withColumn("__bs", F.count(F.lit(1)).over(bw))
                .filter(F.col("__bs") <= max_bucket_size)
                .drop("__bs")
            )
        left = side.select(
            F.col(id_col).alias("da"), F.col("simhash").alias("sa"), "bk"
        )
        right = side.select(
            F.col(id_col).alias("db"), F.col("simhash").alias("sb"), "bk"
        )
        pair_sets.append(
            left.join(right, on=["bk"])
            .filter(F.col("da") < F.col("db"))
            .select("da", "db", "sa", "sb")
        )
    cands = pair_sets[0]
    for ps in pair_sets[1:]:
        cands = cands.unionByName(ps)
    return (
        cands.distinct()
        .select(
            "da",
            "db",
            F.expr("bit_count(sa ^ sb)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
    )


def _bit_vote_sql(p: int) -> str:
    """±1 vote of a token on simhash bit ``p`` — shared verbatim with
    the DuckDB oracle (plans/llm_queries.py)."""
    nibble_char = 1 + p // 4
    mask = 1 << (p % 4)
    return (
        f"CASE WHEN ((instr('0123456789abcdef', substr(md5(tok), {nibble_char}, 1)) - 1)"
        f" & {mask}) > 0 THEN 1 ELSE -1 END"
    )


def fingerprint_min_k(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Document fingerprint: the k smallest shingle hashes, joined —
    a winnowing-style content signature that survives small edits."""
    sh = shingle_table(docs, id_col, text_col, n).select(
        F.col(id_col), F.md5("shingle").alias("h")
    ).distinct()
    w = Window.partitionBy(id_col).orderBy("h")
    return (
        sh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(id_col)
        .agg(F.array_join(F.array_sort(F.collect_list("h")), ",").alias("fingerprint"))
    )
