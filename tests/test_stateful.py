"""applyInPandasWithState: running totals across micro-batches must
equal the batch aggregate, and state must survive across batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import table
from lakehouse_cdc_spark.streaming.sources import file_cdc_source
from lakehouse_cdc_spark.streaming.stateful import running_totals


def test_running_totals_across_batches(spark, sf_dir, tmp_path):
    e = table(spark, sf_dir, "events").select("user_id", "value", "ts", "event_id")
    # two chronological chunks → two micro-batches
    src = str(tmp_path / "src")
    e.orderBy("ts").limit(500).coalesce(1).write.parquet(src + "/a")
    e.orderBy(F.desc("ts")).limit(500).coalesce(1).write.parquet(src + "/b")
    import os

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ["a", "b"]:
        for f_ in sorted(os.listdir(f"{src}/{sub}")):
            if f_.endswith(".parquet"):
                os.link(f"{src}/{sub}/{f_}", f"{flat}/{i:03d}.parquet")
                i += 1

    stream = file_cdc_source(spark, flat, e.schema, max_files_per_trigger=1)
    out = running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per user = final running state
    emitted = spark.sql("SELECT * FROM running_out").collect()
    final: dict = {}
    for r in emitted:  # memory sink appends in batch order
        final[r.user_id] = (r.n_events, r.total_value)

    expected = {
        r.user_id: (r.n, r.s)
        for r in (
            table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        )
    }
    assert set(final) == set(expected)
    for u in expected:
        assert final[u][0] == expected[u][0]
        assert abs(final[u][1] - expected[u][1]) < 1e-6
    # state accumulated across batches: users seen in both chunks must
    # have been emitted more than once
    multi = [r.user_id for r in emitted]
    assert len(multi) > len(set(multi))
