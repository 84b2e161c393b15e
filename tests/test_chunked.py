"""operators/chunked.py — the chunk-with-carry trailing-frame window
must agree BIT-FOR-BIT with the naive key-partitioned global window it
replaces (fine as a test oracle at test scale), including across
sparse buckets, empty buckets, and keys with fewer rows than the
frame is deep."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.chunked import (
    lead_one_bucketed,
    ntile_keyed_two_pass,
    with_trailing_carry,
    with_trailing_range_carry,
)


def _events(spark):
    """3 keys x uneven buckets: key 'a' dense, 'b' sparse (1-2 rows in
    most buckets, several empty buckets — carry must walk back through
    multiple buckets), 'c' has fewer total rows than the frame."""
    rows = []
    sid = 0
    for b in range(12):
        for i in range(17):  # dense key: 17 rows/bucket
            rows.append(("a", b * 100 + i, sid, (sid * 37) % 101))
            sid += 1
        if b % 3 == 0:  # sparse key: 2 rows in every third bucket
            for i in range(2):
                rows.append(("b", b * 100 + i, sid, (sid * 59) % 83))
                sid += 1
    for i in range(3):  # tiny key: 3 rows total
        rows.append(("c", 400 + i, sid, sid % 7))
        sid += 1
    return spark.createDataFrame(rows, "k string, t long, sid long, v long")


def _naive(df, frame):
    w = Window.partitionBy("k").orderBy("t", "sid").rowsBetween(*frame)
    return df.select(
        "k",
        "sid",
        F.count("v").over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
    )


def _chunked(df, frame, max_preceding):
    aug = with_trailing_carry(
        df,
        key_cols=["k"],
        order_cols=["t", "sid"],
        max_preceding=max_preceding,
        bucket=(F.col("t") / 100).cast("int").cast("long"),
    )
    w = Window.partitionBy("k", "__b").orderBy("t", "sid").rowsBetween(*frame)
    return (
        aug.select(
            "k",
            "sid",
            "__carry",
            F.count("v").over(w).alias("n"),
            F.sum("v").over(w).alias("s"),
        )
        .filter(F.col("__carry") == 0)
        .drop("__carry")
    )


@pytest.mark.parametrize(
    "frame,depth",
    [((-5, -1), 5), ((-40, -1), 40), ((-5, 0), 5), ((-1, -1), 1)],
)
def test_chunked_equals_naive(spark, frame, depth):
    df = _events(spark)
    exp = {(r.k, r.sid): (r.n, r.s) for r in _naive(df, frame).collect()}
    got = {(r.k, r.sid): (r.n, r.s) for r in _chunked(df, frame, depth).collect()}
    assert got == exp


def test_no_single_key_exchange_in_plan(spark):
    """The point of the operator: every window in the chunked plan
    partitions on (key, bucket), never on the low-cardinality key
    alone (metadata windows over the tiny per-bucket count table are
    the allowed exception — they carry __cnt/__cum columns)."""
    df = _events(spark)
    plan = _chunked(df, (-40, -1), 40)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line and "__cum" not in line:
            # physical Window spec prints as [... windowspecdefinition(k, __b, ...)]
            if "windowspecdefinition(k#" in line:
                assert "__b#" in line, line


def test_null_key_group_carries_correctly(spark):
    """A NULL partition key is a legitimate group (SQL window
    semantics group NULLs together) — the null-safe metadata joins
    must carry its rows like any other key's."""
    rows = [(None if k == "n" else k, b * 100 + i, b * 100 + i, i)
            for k in ("a", "n")
            for b in range(4)
            for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t long, sid long, v long")
    exp = {(r.k, r.sid): (r.n, r.s) for r in _naive(df, (-10, -1)).collect()}
    got = {(r.k, r.sid): (r.n, r.s)
           for r in _chunked(df, (-10, -1), 10).collect()}
    assert got == exp
    assert any(k is None for k, _ in got)  # the null group was exercised


def test_carry_rows_flagged_and_bounded(spark):
    df = _events(spark)
    aug = with_trailing_carry(
        df,
        key_cols=["k"],
        order_cols=["t", "sid"],
        max_preceding=7,
        bucket=(F.col("t") / 100).cast("int").cast("long"),
    )
    base = aug.filter(F.col("__carry") == 0)
    assert base.count() == df.count()  # base rows preserved exactly
    per_bucket = (
        aug.filter(F.col("__carry") == 1)
        .groupBy("k", "__b")
        .count()
        .collect()
    )
    assert per_bucket  # carries exist
    for r in per_bucket:
        assert r["count"] <= 7  # never more than max_preceding per bucket


def test_bucketed_lead_with_head_patch_equals_global_lead(spark):
    """The 1-row LOOKAHEAD counterpart (ts_time_weighted_average's
    shape), via the SHARED lead_one_bucketed helper the query calls:
    must equal the global per-key lead — including single-row buckets,
    empty buckets, each key's open last row (stays NULL), and a NULL
    key (null-safe metadata join)."""
    df = _events(spark).union(
        _events(spark).filter(F.col("k") == "b").withColumn("k", F.lit(None).cast("string"))
    )
    w = Window.partitionBy("k").orderBy("t", "sid")
    exp = {
        (r.k, r.sid): r.nxt
        for r in df.select("k", "sid", F.lead("t").over(w).alias("nxt")).collect()
    }
    got = {
        (r.k, r.sid): r.nxt
        for r in lead_one_bucketed(
            df,
            key_cols=["k"],
            order_cols=["t", "sid"],
            lead_col="t",
            bucket=(F.col("t") / 100).cast("int").cast("long"),
            out_col="nxt",
        ).collect()
    }
    assert got == exp
    assert any(k is None for k, _ in got)  # the NULL group was exercised


@pytest.mark.parametrize(
    "width,span",
    [(40, 40), (40, 100), (0, 50), (40, 25)],  # incl. span < width
)
def test_range_carry_equals_naive_range_window(spark, width, span):
    """Value-based carry vs the naive key-partitioned RANGE window:
    ties exactly on bucket boundaries, a gap wider than the frame
    (empty buckets), and span < width (multi-bucket reach)."""
    rows = []
    sid = 0
    for k in ("a", "b"):
        # clustered values incl. exact boundary multiples and a long
        # empty-bucket gap (700..1000)
        for t in [0, 1, 39, 40, 40, 41, 99, 100, 101, 200, 200, 250,
                  699, 700, 1400, 1401, 1440, 1441]:
            rows.append((k, t, sid, (sid * 13) % 29))
            sid += 1
    df = spark.createDataFrame(rows, "k string, t long, sid long, v long")

    wn = Window.partitionBy("k").orderBy("t").rangeBetween(-width, 0)
    exp = {
        (r.k, r.sid): (r.s, r.c)
        for r in df.select(
            "k", "sid",
            F.sum("v").over(wn).alias("s"),
            F.count("v").over(wn).alias("c"),
        ).collect()
    }
    aug = with_trailing_range_carry(df, ["k"], "t", width, span)
    wc = Window.partitionBy("k", "__b").orderBy("t").rangeBetween(-width, 0)
    got = {
        (r.k, r.sid): (r.s, r.c)
        for r in aug.select(
            "k", "sid", "__carry",
            F.sum("v").over(wc).alias("s"),
            F.count("v").over(wc).alias("c"),
        ).filter(F.col("__carry") == 0).collect()
    }
    assert got == exp


def test_range_carry_duplication_bounded(spark):
    df = spark.createDataFrame(
        [("a", t, t, 1) for t in range(200)], "k string, t long, sid long, v long"
    )
    aug = with_trailing_range_carry(df, ["k"], "t", 50, 50)
    # duplication factor <= 1 + ceil(width/span) = 2
    assert aug.count() <= 2 * df.count()
    assert aug.filter(F.col("__carry") == 0).count() == df.count()


@pytest.mark.parametrize("n,ascending", [(3, False), (3, True), (4, True)])
def test_ntile_keyed_equals_global_window(spark, n, ascending):
    """Keys with DISJOINT value ranges (per-key quantile boundaries
    must cope), heavy ties, a key smaller than n, and sizes not
    divisible by n — tiles must match NTILE bit-for-bit."""
    rows = []
    sid = 0
    for k, base, cnt in (("a", 0, 50), ("b", 100000, 37), ("c", 5, 2)):
        for i in range(cnt):
            rows.append((k, base + (i * 7) % 13, sid))  # ~13 tied values
            sid += 1
    df = spark.createDataFrame(rows, "k string, v long, sid long")
    order = F.desc("v") if not ascending else F.asc("v")
    w = Window.partitionBy("k").orderBy(order, F.asc("sid"))
    exp = {
        (r.k, r.sid): r.t
        for r in df.select("k", "sid", F.ntile(n).over(w).alias("t")).collect()
    }
    got = {
        (r.k, r.sid): r.t
        for r in ntile_keyed_two_pass(
            df, n, ["k"], "v", "sid", "t", ascending=ascending, n_buckets=8
        ).collect()
    }
    assert got == exp


def test_ntile_keyed_preserves_schema_and_rowcount(spark):
    df = spark.createDataFrame(
        [("a", i, i) for i in range(10)], "k string, v long, sid long"
    )
    out = ntile_keyed_two_pass(df, 3, ["k"], "v", "sid", "t")
    assert out.columns == ["k", "v", "sid", "t"]
    assert out.count() == 10


_CONVERTED = [
    "ts_anomaly_zscore",
    "ts_breakout_channel",
    "ts_time_weighted_average",
    "window_range_30d_peak",
    "text_perplexity_tertiles",
]


def _window_partition_specs(plan: str):
    """Partition-column name lists of every windowspecdefinition in a
    physical plan string (args up to the first ASC/DESC sort spec)."""
    import re

    specs = []
    marker = "windowspecdefinition("
    i = plan.find(marker)
    while i != -1:
        depth, j = 1, i + len(marker)
        start, args = j, []
        while j < len(plan) and depth:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args.append(plan[start:j])
            elif ch == "," and depth == 1:
                args.append(plan[start:j])
                start = j + 1
            j += 1
        part, order = [], []
        for a in args:
            if "specifiedwindowframe" in a:
                break
            m = re.match(r"\s*(?:.*?\()?([A-Za-z_][A-Za-z0-9_]*)#\d+", a)
            name = m.group(1) if m else a.strip()
            if " ASC" in a or " DESC" in a:
                order.append(name)
            else:
                part.append(name)
        specs.append((part, order))
        i = plan.find(marker, i + 1)
    return specs


@pytest.mark.parametrize("name", _CONVERTED)
def test_converted_queries_never_window_on_bare_series_key(spark, name):
    """Regression guard for the chunked-window conversions: none of
    these queries may ever again plan a row-level window partitioned
    SOLELY by its ~5-20-value series/stratum key — every window spec
    must carry the chunk bucket (or operate on metadata columns)."""
    from lakehouse_cdc_spark.plans import REGISTRY

    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = _window_partition_specs(plan)
    assert specs, name  # the queries do use windows
    for part, order in specs:
        if part in (["event_type"], ["source"]):
            # bare-key windows are allowed ONLY over per-bucket
            # metadata (ordered by the chunk bucket), never row-level
            assert order and order[0] in ("__b", "__bkt"), (
                name, part, order,
            )


def _model_trailing(rows, depth):
    """Pure-Python oracle: per-key trailing (count, sum) over the last
    ``depth`` rows ordered by (t, sid)."""
    out = {}
    bykey = {}
    for k, t, sid, v in rows:
        bykey.setdefault(k, []).append((t, sid, v))
    for k, rs in bykey.items():
        rs.sort()
        for i, (t, sid, v) in enumerate(rs):
            frame = rs[max(0, i - depth): i]
            s = sum(x[2] for x in frame) if frame else None
            out[(k, sid)] = (len(frame), s)
    return out


@pytest.mark.slow
def test_trailing_carry_fuzz_against_python_model(spark):
    """Randomized (key, t, v) sets — duplicate t values, NULL keys,
    random frame depths and bucket spans — against a pure-Python
    rolling model (independent of any Spark window)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.integers(min_value=0, max_value=600),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        raw=rows_strategy,
        depth=st.integers(min_value=1, max_value=7),
        span=st.sampled_from([25, 100, 400]),
    )
    def _run(raw, depth, span):
        rows = [(k, t, sid, v) for sid, (k, t, v) in enumerate(raw)]
        df = spark.createDataFrame(
            rows, "k string, t long, sid long, v long"
        )
        aug = with_trailing_carry(
            df,
            key_cols=["k"],
            order_cols=["t", "sid"],
            max_preceding=depth,
            bucket=(F.col("t") / span).cast("int").cast("long"),
        )
        w = (
            Window.partitionBy("k", "__b")
            .orderBy("t", "sid")
            .rowsBetween(-depth, -1)
        )
        got = {
            (r.k, r.sid): (r.n, r.s)
            for r in aug.select(
                "k",
                "sid",
                "__carry",
                F.count("v").over(w).alias("n"),
                F.sum("v").over(w).alias("s"),
            )
            .filter(F.col("__carry") == 0)
            .collect()
        }
        assert got == _model_trailing(rows, depth)

    _run()


def test_rejects_bad_args(spark):
    df = _events(spark)
    with pytest.raises(ValueError):
        with_trailing_carry(df, ["k"], ["t"], 0, F.col("t"))
    with pytest.raises(ValueError):
        with_trailing_carry(
            df.withColumn("__b", F.lit(1)), ["k"], ["t"], 5, F.col("t")
        )
