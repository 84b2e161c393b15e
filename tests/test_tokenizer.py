"""Wave-8 semantics tests: BPE pair counting, co-occurrence windows,
and incremental join-view maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans import REGISTRY
from lakehouse_cdc_spark.plans.registry import table

SF = "/root/testdata/sf0.001"


def test_bpe_pairs_are_two_chars_and_weighted(spark):
    rows = REGISTRY["text_bpe_pair_merge"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    assert all(len(r.pair) == 2 for r in rows)
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # hand-check the top pair against a driver-side recount
    docs = table(spark, SF, "documents").select("text").collect()
    from collections import Counter

    c = Counter()
    for d in docs:
        for w in d.text.split():
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    c[w[i : i + 2]] += 1
    top = rows[0]
    assert c[top.pair] == top.pair_count


def test_cooccurrence_pairs_are_canonical_and_windowed(spark):
    rows = REGISTRY["text_cooccurrence_topk"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.w1 <= r.w2  # unordered pair canonicalization
        assert r.w1_cnt > 0 and r.w2_cnt > 0
        assert r.pair_cnt <= r.w1_cnt * 2 + r.w2_cnt * 2  # window bound


def test_mv_incremental_join_equals_full_recompute(spark):
    got = REGISTRY["mv_incremental_join"].fn(spark, SF)
    o = table(spark, SF, "orders")
    c = table(spark, SF, "customer")
    full = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "c_nationkey", "o_totalprice"
    )
    assert got.count() == full.count()  # no dupes from overlapping arms
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0


def test_bpe_iterative_rounds_see_merged_vocabulary(spark):
    """Round r+1 must count pairs over the REWRITTEN vocabulary: the
    merge applied in round r (rank 1) can never be a candidate pair
    again, and merged symbols (length > 1) must show up as pair
    members in later rounds."""
    rows = REGISTRY["text_bpe_train_iterative"].fn(spark, SF).collect()
    by_round = {}
    for r in rows:
        by_round.setdefault(r.round, []).append(r)
    assert set(by_round) == {1, 2, 3}
    applied = {}
    for rnd, rs in by_round.items():
        ranks = sorted(r.rnk for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        applied[rnd] = next((r.pair_a, r.pair_b) for r in rs if r.rnk == 1)
        # counts are positive and ranked consistently
        ordered = sorted(rs, key=lambda r: (-r.pair_count, r.pair_a, r.pair_b))
        assert [r.rnk for r in ordered] == list(range(1, len(rs) + 1))
    # an applied merge is gone from every later round's candidates
    for rnd in (1, 2):
        later = {(r.pair_a, r.pair_b) for n in range(rnd + 1, 4) for r in by_round[n]}
        assert applied[rnd] not in later
    # rewriting has an observable effect on the candidate ranking
    sets = [
        {(r.pair_a, r.pair_b) for r in by_round[n]} for n in (1, 2, 3)
    ]
    assert sets[0] != sets[1] and sets[1] != sets[2]
