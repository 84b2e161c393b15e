"""Tests for distributed connected components and BM25 retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.graph import connected_components
from lakehouse_cdc_spark.plans import REGISTRY


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    out = connected_components(df, src="a", dst="b", **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_two_components_and_chain(spark):
    # component {1..5} is a PATH (worst diameter for label prop),
    # component {10,11,12} is a triangle; 99 is not incident → absent
    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_cc_duplicate_and_self_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3)]
    got = _cc(spark, edges)
    assert got[1] == 1 and got[2] == 1
    assert got[3] == 3  # self-loop node is its own component


def test_cc_unconverged_raises(spark):
    edges = [(i, i + 1) for i in range(1, 8)]  # diameter 7 path
    with pytest.raises(RuntimeError):
        connected_components(
            spark.createDataFrame(edges, "a bigint, b bigint"),
            src="a",
            dst="b",
            max_iter=2,
        ).collect()


def test_cc_label_is_min_reachable(spark):
    # star centered on a HIGH id: min must still win through the hub
    edges = [(100, 7), (100, 50), (100, 3), (100, 80)]
    got = _cc(spark, edges)
    assert set(got.values()) == {3}


def test_bm25_scores_are_plausible(spark, sf_dir):
    rows = REGISTRY["text_bm25_search"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    scores = [r["score_fp"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["hit_terms"] <= 3 for r in rows)
    # a doc hitting all three query terms should outrank a one-term doc
    # within this fixture's top slice when scores differ; at minimum the
    # top doc must hit at least as many terms as the bottom doc's score
    # would suggest — sanity-level invariant only
    assert all(s > 0 for s in scores)


def test_bm25_plans_take_ordered(spark, sf_dir):
    plan = (
        REGISTRY["text_bm25_search"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_components_cover_all_lsh_pair_members(spark, sf_dir):
    """Every doc appearing in an LSH candidate pair lands in exactly
    one group, and group sizes sum to the node count."""
    from lakehouse_cdc_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from lakehouse_cdc_spark.plans.llm_queries import _LSH_MAX_BUCKET
    from lakehouse_cdc_spark.plans.registry import table

    sigs = minhash_signatures(table(spark, sf_dir, "documents"), k=8)
    pairs = lsh_candidate_pairs(
        sigs, bands=4, rows_per_band=2, max_bucket_size=_LSH_MAX_BUCKET
    )
    nodes = (
        pairs.select(F.col("da").alias("n"))
        .union(pairs.select("db"))
        .distinct()
        .count()
    )
    groups = REGISTRY["dedup_connected_components"].fn(spark, sf_dir)
    agg = groups.agg(
        F.sum("group_size").alias("total"), F.count(F.lit(1)).alias("n_groups")
    ).collect()[0]
    assert agg["total"] == nodes
    assert all(r["group_size"] >= 2 for r in groups.collect())


def test_pagerank_fixed_point_properties(spark, sf_dir):
    """PageRank sanity: every node retains at least the base rank,
    rank reflects degree (the best-connected node outranks the
    median), and the integer arithmetic is partitioning-invariant."""
    from lakehouse_cdc_spark.plans import REGISTRY

    fn = REGISTRY["graph_pagerank_purchases"].fn
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.pr_scaled >= 150_000 for r in rows)
    assert rows[0].pr_scaled >= rows[-1].pr_scaled
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = fn(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_pagerank_converged_probe_and_invariance(spark, sf_dir):
    """The probe-driven loop must actually converge (delta <= tol),
    agree with itself under different partitioning (exact integer
    arithmetic), and one further round must not move any rank by more
    than the tolerance decays."""
    rows = REGISTRY["graph_pagerank_converged"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    n_iters = rows[0].n_iters
    assert all(r.n_iters == n_iters for r in rows)
    assert n_iters > 3  # strictly beyond the unrolled query's budget
    assert all(r.final_delta <= 1_000_000 // 100 for r in rows)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        again = REGISTRY["graph_pagerank_converged"].fn(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_triangle_count_orientation_matches_naive(spark):
    """Degree-ordered orientation must find exactly the triangles the
    naive id-ordered (x<y<z) triple join finds."""
    from pyspark.sql import functions as F

    from lakehouse_cdc_spark.plans.graph_queries import _TRI_MIN_CO
    from lakehouse_cdc_spark.plans.registry import table

    sf = "/root/testdata/sf0.001"
    items = (
        table(spark, sf, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("co_cnt"))
        .filter(F.col("co_cnt") >= _TRI_MIN_CO)
        .select("p1", "p2")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    naive = (
        e1.join(e2, F.col("e2.p1") == F.col("e1.p2"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1")) & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .count()
    )
    deg = (
        edges.select(F.col("p1").alias("node"))
        .unionAll(edges.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    d1 = deg.select(F.col("node").alias("p1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("node").alias("p2"), F.col("d").alias("d2"))
    lower = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("p1") < F.col("p2"))
    )
    oriented = (
        edges.join(d1, "p1")
        .join(d2, "p2")
        .select(
            F.when(lower, F.col("p1")).otherwise(F.col("p2")).alias("u"),
            F.when(lower, F.col("p2")).otherwise(F.col("p1")).alias("v"),
        )
    )
    o1, o2, o3 = oriented.alias("o1"), oriented.alias("o2"), oriented.alias("o3")
    by_degree = (
        o1.join(o2, F.col("o2.u") == F.col("o1.v"))
        .join(
            o3,
            (F.col("o3.u") == F.col("o1.u")) & (F.col("o3.v") == F.col("o2.v")),
        )
        .count()
    )
    assert by_degree == naive  # same triangles, each found once


def test_distribution_drift_tv_is_a_metric(spark):
    from lakehouse_cdc_spark.plans import REGISTRY

    rows = REGISTRY["validation_distribution_drift"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    tv = rows[0].tv_distance_ppm
    # constant across rows, and a genuine TV distance (ppm of [0, 1])
    assert all(r.tv_distance_ppm == tv for r in rows)
    assert 0 <= tv <= 1_000_000
    # the exact rationals must actually assemble the total: shares sum
    # to the distance up to the per-row ppm floor (one ulp per bucket)
    assert 0 <= tv - sum(r.tv_share_ppm for r in rows) <= len(rows)
    num = sum(r.tv_num for r in rows)
    assert rows[0].tv_num_total == num
    assert tv == num * 1_000_000 // rows[0].tv_den


def test_kcore_operator_on_crafted_graphs(spark):
    """Peeling fixpoint on hand-checkable graphs: a clique survives,
    pendant chains peel away, and a graph whose core is EMPTY returns
    an empty edge set (the sf0.1 shape) without spinning."""
    from lakehouse_cdc_spark.operators.graph import kcore

    def sym(pairs):
        rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        return spark.createDataFrame(rows, "src int, dst int")

    # K4 with a pendant chain 4-5-6: the 3-core is exactly the K4
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    chain = [(3, 4), (4, 5), (5, 6)]
    core, rounds = kcore(sym(k4 + chain), k=3)
    got = sorted((r.src, r.dst) for r in core.collect())
    want = sorted([(a, b) for a, b in k4] + [(b, a) for a, b in k4])
    assert got == want
    assert rounds >= 1

    # a pure cycle has no 3-core: everything peels to empty
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    core, _ = kcore(sym(cyc), k=3)
    assert core.count() == 0

    # ...but the cycle IS its own 2-core (fixpoint on round 1)
    core, rounds = kcore(sym(cyc), k=2)
    assert core.count() == 10
    assert rounds == 1


def test_kcore_broadcast_budget_guard(spark, monkeypatch):
    """Above the broadcast byte budget the alive-set join must still
    produce the identical core via the shuffle path — the 100×-scale
    posture: a data-sized alive set never ships to every executor."""
    from lakehouse_cdc_spark.operators import graph as g

    def sym(pairs):
        rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        return spark.createDataFrame(rows, "src int, dst int")

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    chain = [(3, 4), (4, 5), (5, 6)]
    # budget 0 ⇒ the |cur|//k bound always exceeds it ⇒ no broadcast
    # hint on any round; the peel answer must not change
    monkeypatch.setattr(g, "_KCORE_BROADCAST_MAX_NODES", 0)
    core, rounds = g.kcore(sym(k4 + chain), k=3)
    got = sorted((r.src, r.dst) for r in core.collect())
    want = sorted([(a, b) for a, b in k4] + [(b, a) for a, b in k4])
    assert got == want
    assert rounds >= 1


def test_kcore_is_subgraph_closed(spark, sf_dir):
    """Every core member's reported degree counts only neighbors that
    are themselves core members — the defining k-core property (not
    just 'degree >= k in the full graph')."""
    from lakehouse_cdc_spark.plans import graph_queries as gq

    rows = gq.graph_kcore_membership(spark, sf_dir).collect()
    members = {r.part_key for r in rows}
    assert members  # non-degenerate fixture
    # rebuild the raw co-purchase edges and check closure manually
    import pyspark.sql.functions as F
    from lakehouse_cdc_spark.plans.registry import table

    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    co = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= gq._TRI_MIN_CO)
        .select("p1", "p2")
        .collect()
    )
    adj: dict[int, set[int]] = {}
    for r in co:
        adj.setdefault(r.p1, set()).add(r.p2)
        adj.setdefault(r.p2, set()).add(r.p1)
    got = {r.part_key: r.core_degree for r in rows}
    for node, deg in got.items():
        in_core = len(adj.get(node, set()) & members)
        assert in_core == deg
        assert deg >= gq._KCORE_K
