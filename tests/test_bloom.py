"""Per-bucket bloom filters on the snapshot sink (round 5).

Point lookups on NON-key columns (key lookups hash straight to their
bucket) prune the scan to the buckets whose manifest bloom filter may
contain the value.  The filters ride the merge's write job as
observe() aggregates — no extra pass — and the invariants under test
are the ones that keep pruning SAFE:

- never a false negative: every row a full scan finds, lookup finds;
- rewritten buckets drop stale filters (rows added ⇒ old filter wrong)
  and gain fresh ones in the same commit;
- GC/compaction carry filters (row removal only over-approximates);
- pending MOR deltas disable pruning (delta rows are un-bloomed).
"""

import pyspark.sql.functions as F
import pytest

from lakehouse_cdc_spark.streaming import SnapshotUpsertSink


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id int, city string, operation string, seq int"
    )


@pytest.fixture()
def bloom_sink(spark, tmp_path):
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"),
        keys=["id"],
        order_by=["seq"],
        n_buckets=8,
        bloom_cols=["city"],
        bloom_bits=4096,
        bloom_hashes=3,
    )
    # 64 keys over 8 cities — each city lands in a FEW buckets only
    sink.process_batch(
        _batch(spark, [(i, f"city_{i % 8}", "u", 0) for i in range(64)]), 0
    )
    return sink


def test_blooms_land_in_manifest_and_prune(spark, bloom_sink):
    manifest = bloom_sink._read_manifest(bloom_sink.committed_snapshot())
    doc = manifest["blooms"]
    assert doc["bits"] == 4096 and doc["hashes"] == 3
    assert set(doc["cols"]) == {"city"}
    # every committed bucket has a filter (all were rewritten in batch 0)
    assert set(doc["cols"]["city"]) == set(manifest["buckets"])

    cand = bloom_sink.probe_buckets(spark, "city", "city_3")
    assert len(cand) < len(manifest["buckets"])  # actually pruned
    got = {r.id for r in bloom_sink.lookup(spark, "city", "city_3").collect()}
    want = {i for i in range(64) if i % 8 == 3}
    assert got == want  # no false negatives, exact rows

    # a value that was never written: either provably-empty or a
    # filtered read of false-positive buckets — always zero rows
    assert bloom_sink.lookup(spark, "city", "nowhere").count() == 0


def test_rewritten_bucket_gets_fresh_filter(spark, bloom_sink):
    # key 7 moves to a NEW city: its bucket is rewritten, and the fresh
    # filter must see the new value in that bucket
    bloom_sink.process_batch(_batch(spark, [(7, "atlantis", "u", 1)]), 1)
    got = {r.id for r in bloom_sink.lookup(spark, "city", "atlantis").collect()}
    assert got == {7}
    # key 7's OLD city row is gone from its bucket
    old = {r.id for r in bloom_sink.lookup(spark, "city", "city_7").collect()}
    assert old == {i for i in range(64) if i % 8 == 7} - {7}


def test_bloom_off_sink_drops_stale_filters_on_rewrite(spark, tmp_path):
    """A bloom-less writer rewriting a bucket must DROP that bucket's
    carried filter (rows were added it never saw) while untouched
    buckets keep theirs — no false negatives either way."""
    d = str(tmp_path / "t")
    s1 = SnapshotUpsertSink(
        d, keys=["id"], order_by=["seq"], n_buckets=8, bloom_cols=["city"]
    )
    s1.process_batch(
        _batch(spark, [(i, f"city_{i % 8}", "u", 0) for i in range(64)]), 0
    )
    # reopen WITHOUT bloom tracking, add a brand-new key/city
    s2 = SnapshotUpsertSink(d, keys=["id"], order_by=["seq"], n_buckets=8)
    s2.process_batch(_batch(spark, [(99, "valhalla", "u", 1)]), 1)
    manifest = s2._read_manifest(s2.committed_snapshot())
    rewritten = [b for b, s in manifest["buckets"].items() if s == 1]
    for b in rewritten:
        assert b not in manifest["blooms"]["cols"]["city"]
    # the un-bloomed bucket is always a candidate → row is found
    got = {r.id for r in s2.lookup(spark, "city", "valhalla").collect()}
    assert got == {99}


def test_probe_buckets_honors_the_callers_manifest(spark, bloom_sink):
    """Reader consistency: lookup() reads ONE manifest and must probe
    with THAT manifest's filters — re-reading the pointer could pair a
    newer rewrite's filter with the older snapshot's files and
    silently false-negative the lookup."""
    m0 = bloom_sink._read_manifest(bloom_sink.committed_snapshot())
    cand0 = bloom_sink.probe_buckets(spark, "city", "city_3", manifest=m0)
    # a later commit rewrites key 3's bucket to a different city
    bloom_sink.process_batch(_batch(spark, [(3, "elsewhere", "u", 1)]), 1)
    # probing with the OLD manifest still yields the OLD candidates
    again = bloom_sink.probe_buckets(spark, "city", "city_3", manifest=m0)
    assert again == cand0


def test_gc_carries_filters_and_lookup_stays_exact(spark, tmp_path):
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"),
        keys=["id"],
        order_by=["seq"],
        n_buckets=4,
        bloom_cols=["city"],
    )
    rows = [(i, f"city_{i % 4}", "u", 0) for i in range(32)]
    rows += [(100 + i, f"city_{i % 4}", "d", 0) for i in range(8)]
    sink.process_batch(_batch(spark, rows), 0)
    sink.gc_tombstones(spark, watermark=10)
    manifest = sink._read_manifest(sink.committed_snapshot())
    assert manifest.get("blooms")  # carried through the GC commit
    got = {r.id for r in sink.lookup(spark, "city", "city_2").collect()}
    assert got == {i for i in range(32) if i % 4 == 2}


def test_mor_deltas_disable_pruning_but_not_correctness(spark, tmp_path):
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"),
        keys=["id"],
        order_by=["seq"],
        n_buckets=8,
        bloom_cols=["city"],
        merge_on_read=True,
        fold_deltas_every=None,
    )
    sink.process_batch(
        _batch(spark, [(i, f"city_{i % 8}", "u", 0) for i in range(64)]), 0
    )
    sink.fold_deltas(spark)  # bloomed, read-optimized base
    # un-folded delta introduces a value in a bucket the bloom cleared
    sink.process_batch(_batch(spark, [(3, "shangri-la", "u", 1)]), 1)
    got = {r.id for r in sink.lookup(spark, "city", "shangri-la").collect()}
    assert got == {3}  # found despite living only in a delta
    # after folding, pruned lookups resume and stay exact
    sink.fold_deltas(spark)
    got = {r.id for r in sink.lookup(spark, "city", "shangri-la").collect()}
    assert got == {3}
    stale = {r.id for r in sink.lookup(spark, "city", "city_3").collect()}
    assert stale == {i for i in range(64) if i % 8 == 3} - {3}
