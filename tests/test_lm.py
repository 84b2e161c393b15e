"""Invariant tests for the wave-18 LM-curation operators: bigram LM
scoring, PII redaction, the integer logit gate, and n-gram novelty."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans import REGISTRY


def test_bigram_lm_score_bounds_and_coverage(spark, sf_dir):
    rows = REGISTRY["text_bigram_lm_score"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # every multi-token doc is scored exactly once
    assert len(rows) == n_docs
    for r in rows:
        # scaled probabilities are in (0, 1e9]; the average divides out
        assert 0 < r.avg_p_ppb <= 1_000_000_000
        assert r.score_sum >= r.n_bigrams  # each term >= 1 ppb
        # n_bigrams = tokens - 1 cross-check on one doc would need the
        # text; the per-row identity sum//count == avg is the contract
        assert r.score_sum // r.n_bigrams == r.avg_p_ppb


def test_bigram_lm_repetitive_doc_scores_higher(spark, tmp_path):
    # one doc is a pure 2-word loop (maximally predictable), the other
    # never repeats a bigram — the LM must rank the loop higher
    rows = [
        (1, "a b " * 30, "en", "s", 90),
        (2, " ".join(f"w{i}" for i in range(60)), "en", "s", 180),
    ]
    spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string, n_chars int"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.avg_p_ppb
        for r in REGISTRY["text_bigram_lm_score"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1] > got[2]


def test_pii_redaction_no_residual_and_counts(spark, sf_dir):
    rows = REGISTRY["text_pii_redaction"].fn(spark, sf_dir).collect()
    assert rows, "no documents scanned"
    for r in rows:
        assert r.n_residual == 0  # redaction must be total
        if r.doc_id % 3 == 0:
            assert (r.n_emails, r.n_phones) == (0, 0)  # true negatives
        else:
            assert r.n_emails == 1 and r.n_phones == 1
        assert len(r.red_hash) == 32


def test_quality_logit_monotone_in_features(spark, tmp_path):
    # adding punctuation noise to the same text can only lower the logit
    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " .,!?;: .,!?;:", "en", "s", len(base) + 14),
    ]
    spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string, n_chars int"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.logit_micro
        for r in REGISTRY["text_quality_logit"].fn(spark, str(tmp_path)).collect()
    }
    assert got[2] < got[1]


def test_ngram_novelty_first_doc_fully_novel(spark, sf_dir):
    rows = REGISTRY["text_ngram_novelty"].fn(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    first = by_id[min(by_id)]
    # the earliest document introduces every one of its shingles
    assert first.n_novel == first.n_shingles
    assert first.novelty_ppm == 1_000_000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
    # every distinct shingle is introduced exactly once corpus-wide
    total_novel = sum(r.n_novel for r in rows)
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, greatest(size(split(trim(text),"
                        " '\\\\s+')) - 2, 1)),"
                        " i -> array_join(slice(split(trim(text), '\\\\s+'),"
                        " i, 3), ' '))"
                    )
                )
            ).alias("s")
        )
        .agg(F.count_distinct("s"))
        .collect()[0][0]
    )
    assert total_novel == n_distinct


def test_kneser_ney_rewards_continuation_diversity(spark, tmp_path):
    """The defining KN property: two equally-rare bigrams differ only
    in how many contexts their second word completes — the
    diverse-continuation word must score strictly higher (raw
    frequency alone cannot produce this ordering)."""
    from lakehouse_cdc_spark.plans.lm_queries import text_kneser_ney_bigram

    docs = spark.createDataFrame(
        [
            (1, "a cat"),
            (2, "b cat"),
            (3, "c cat"),
            (4, "d cat"),
            (5, "f gnu"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in text_kneser_ney_bigram(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # both probe docs hold a single count-1 bigram with a count-1
    # left context; only n1bw (contexts completed by w2) differs
    assert got[1].n_bigrams == got[5].n_bigrams == 1
    assert got[1].avg_p_ppb > got[5].avg_p_ppb
    # 'cat' completes 4 contexts vs 'gnu' 1, B = 5 bigram types:
    # t2 = 3*1*4*1e9 // (4*1*5) vs 3*1*1*1e9 // (4*1*5); t1 equal
    assert got[1].avg_p_ppb - got[5].avg_p_ppb == (
        3 * 4 * 10**9 // 20 - 3 * 10**9 // 20
    )
