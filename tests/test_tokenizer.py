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
