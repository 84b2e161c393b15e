"""Round-7 third wave: grouped OLS from sufficient statistics,
day-of-week seasonal profile, and MATCH_RECOGNIZE-style V-shape
pattern matching — property checks beyond the oracle hash."""

import pyspark.sql.functions as F

from lakehouse_cdc_spark.plans.funnel_queries import events_pattern_vshape
from lakehouse_cdc_spark.plans.profiling_queries import stats_ols_by_brand
from lakehouse_cdc_spark.plans.timeseries_queries import ts_seasonal_dow_profile


def test_ols_recovers_exact_line(spark, tmp_path, monkeypatch):
    """On synthetic y = 3x + 7 data the sufficient-statistics path
    must recover the line exactly (r2 == 1)."""
    li = spark.createDataFrame(
        [(i % 5 + 1, i % 7 + 1, float(3 * (i % 7 + 1) + 7)) for i in range(70)],
        "l_partkey long, l_quantity long, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(k, f"B{k % 2}") for k in range(1, 6)], "p_partkey long, p_brand string"
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    part.write.parquet(str(tmp_path / "part.parquet"))
    rows = stats_ols_by_brand(spark, str(tmp_path)).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.slope == 3.0
        assert r.intercept == 7.0
        assert r.r2 == 1.0


def test_ols_fixture_r2_bounds(spark, sf_dir):
    rows = stats_ols_by_brand(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0
        assert r.n > 0


def test_seasonal_profile_partitions_days(spark, sf_dir):
    """Per event type: the dow buckets partition the day set exactly,
    and the ppm indices average (day-weighted) back to one million —
    the defining property of a multiplicative seasonal index."""
    rows = ts_seasonal_dow_profile(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert len({r.dow for r in rs}) == len(rs)
        assert all(0 <= r.dow <= 6 for r in rs)
        total_days = sum(r.n_days for r in rs)
        total_c = sum(r.dow_sum_c for r in rs)
        # weighted mean of per-dow means equals the overall mean:
        # sum(n_days * dow_mean) ~ total within integer-floor slack
        approx = sum(r.n_days * (r.dow_sum_c // r.n_days) for r in rs)
        assert 0 <= total_c - approx < total_days
        # ppm index: day-weighted average is 1e6 up to floor slack
        wavg = sum(r.n_days * r.seasonal_ppm for r in rs) / total_days
        assert abs(wavg - 1_000_000) < 100


def test_vshape_detects_crafted_pattern(spark, tmp_path):
    """A hand-built series down-down-up-up yields exactly one match
    with the exact depth/recovery; flat steps break the legs."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = []

    def add(uid, vals):
        for i, v in enumerate(vals):
            rows.append(
                (len(rows) + 1, base + dt.timedelta(minutes=i), uid, "view", v, "{}")
            )

    # user 1: clean V — 10 > 8 > 5 < 7 < 12
    add(1, [10.0, 8.0, 5.0, 7.0, 12.0])
    # user 2: valley too shallow (one down step only)
    add(2, [10.0, 5.0, 7.0, 12.0])
    # user 3: flat step splits the down leg — no >=2 strict down run
    # directly followed by >=2 strict up run
    add(3, [10.0, 8.0, 8.0, 5.0, 7.0, 12.0])
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = events_pattern_vshape(spark, str(tmp_path)).collect()
    # user 3's flat step splits the decline into two length-1 down
    # runs, so only user 1 matches
    assert len(got) == 1
    matches = {r.user_id: r for r in got}
    assert 1 in matches
    m = matches[1]
    assert m.down_len == 2 and m.up_len == 2
    assert m.depth_c == 500  # 10.00 -> 5.00
    assert m.recovery_c == 700  # 5.00 -> 12.00
    assert 2 not in matches


def test_sessionize_batch_gap_splitting(spark, tmp_path):
    """Events 29 minutes apart share a session; a 31-minute gap opens
    a new one, with exact duration and census."""
    import datetime as dt

    from lakehouse_cdc_spark.plans.funnel_queries import events_sessionize_batch

    base = dt.datetime(2026, 1, 1)
    mins = [0, 29, 58, 95, 96]  # 58->95 is a 37-min gap
    rows = [
        (i + 1, base + dt.timedelta(minutes=m), 7, "view" if i % 2 else "click", 1.0, "{}")
        for i, m in enumerate(mins)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = events_sessionize_batch(spark, str(tmp_path)).collect()
    assert [(r.sess_idx, r.n_events) for r in got] == [(1, 3), (2, 2)]
    assert got[0].duration_us == 58 * 60 * 1_000_000
    assert got[1].duration_us == 1 * 60 * 1_000_000
    assert got[0].n_types == 2


def test_backlog_reconstruction_crafted(spark, tmp_path):
    """Two orders opening on days 1/2, closing on days 2/4: the
    backlog curve must be 1, 1, 0-gap, 0 with the close day defined by
    the LAST shipped line."""
    import datetime as dt

    from lakehouse_cdc_spark.plans.temporal_queries import (
        orders_open_backlog_daily,
    )

    d = lambda n: dt.datetime(2026, 1, n)  # noqa: E731
    spark.createDataFrame(
        [(1, 10, "O", 5.0, d(1), "1-URGENT"), (2, 11, "O", 6.0, d(2), "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity long, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp"
    )
    spark.createDataFrame(
        [
            (1, 1, 1, 1, 1, 1.0, 0.0, 0.0, "N", "O", d(2)),
            (2, 1, 1, 1, 1, 1.0, 0.0, 0.0, "N", "O", d(3)),
            (2, 2, 1, 2, 1, 1.0, 0.0, 0.0, "N", "O", d(4)),  # last line day 4
        ],
        li_schema,
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = [
        (r.day, r.n_opened, r.n_closed, r.open_backlog)
        for r in orders_open_backlog_daily(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2026-01-01", 1, 0, 1),
        ("2026-01-02", 1, 1, 1),
        ("2026-01-04", 0, 1, 0),
    ]


def test_rake_phrase_delimiting_and_scoring(spark, tmp_path):
    """Stopwords delimit phrases; a word that always appears inside a
    long phrase outranks an equally-frequent isolated word."""
    from lakehouse_cdc_spark.plans.llm_queries import text_rake_keywords

    docs = spark.createDataFrame(
        [
            (1, "deep learning model beats the baseline"),
            (2, "deep learning model wins again"),
            (3, "baseline of simple rules"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.phrase: r for r in text_rake_keywords(spark, str(tmp_path)).collect()}
    # 'the' and 'of' never appear inside any phrase
    assert not any(" the " in f" {p} " or p.startswith("the ") for p in got)
    # the 3-word run before 'the' forms one phrase in doc 1
    assert "deep learning model beats" in got
    # 'baseline' occurs twice (freq 2), both times as a length-1
    # phrase: degree 2 => score 1000 permille; 'deep' occurs twice
    # inside length-4/5 phrases: degree 9, freq 2 => 4500 — isolated
    # words rank below phrase-dwelling words of equal frequency
    assert got["baseline"].score_permille == 1000
    four = got["deep learning model wins again"]
    assert four.score_permille > got["baseline"].score_permille
