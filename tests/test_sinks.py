"""Tests for sources/sinks.py (partitioned parquet, JSON lines) and the
streaming dedup operator."""

import tempfile

from pyspark.sql import functions as F

from naru_spark.sources import load_table
from naru_spark.sources.sinks import (
    read_jsonl,
    read_partitioned,
    write_jsonl,
    write_partitioned,
)
from tests.conftest import SF_SMOKE


def test_partition_pruning(spark):
    """A filter on the partition column must prune at the DIRECTORY level:
    the scan's PartitionFilters carries it and only matching partitions'
    files are read."""
    ev = load_table(spark, "events", SF_SMOKE).select("event_id", "ts", "event_type", "value")
    path = tempfile.mkdtemp(prefix="part_test_") + "/events"
    write_partitioned(ev, path, ["event_type"])

    back = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    # correctness of the round trip
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click


def test_partitioned_roundtrip_complete(spark):
    ev = load_table(spark, "events", SF_SMOKE).select("event_id", "event_type", "ts", "value")
    path = tempfile.mkdtemp(prefix="part_test_") + "/events"
    write_partitioned(ev, path, ["event_type"])
    back = read_partitioned(spark, path)
    assert back.count() == ev.count()
    a = {r["event_type"]: r["count"] for r in back.groupBy("event_type").count().collect()}
    b = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert a == b


def test_dynamic_partition_overwrite_preserves_others(spark, tmp_path):
    """overwrite_partitions replaces ONLY the partitions present in the
    incoming frame; untouched partitions survive byte-for-byte. A static
    overwrite (the footgun the helper pins the conf against) would wipe
    them — asserted by contrast."""
    from naru_spark.sources.sinks import overwrite_partitions

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(20)],
        ["id", "part", "v"],
    )
    write_partitioned(base, path, ["part"])
    upd = spark.createDataFrame([(100, "a", 999.0)], ["id", "part", "v"])
    overwrite_partitions(upd, path, ["part"])
    back = read_partitioned(spark, path)
    assert back.filter(F.col("part") == "a").count() == 1  # replaced
    assert back.filter(F.col("part") == "b").count() == 10  # untouched
    # contrast: STATIC overwrite wipes everything else
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    upd.write.mode("overwrite").partitionBy("part").parquet(path)
    assert read_partitioned(spark, path).filter(F.col("part") == "b").count() == 0


def test_merged_schema_read_nulls_legacy_rows(spark, tmp_path):
    """read_merged_schema unions evolved parquet footers: rows from files
    predating a column surface NULL there, newer rows keep their values."""
    from naru_spark.sources.sinks import read_merged_schema

    path = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "x")], ["id", "s"]).write.parquet(path)
    spark.createDataFrame([(2, "y", 7)], ["id", "s", "extra"]).write.mode(
        "append"
    ).parquet(path)
    rows = {r["id"]: r for r in read_merged_schema(spark, path).collect()}
    assert rows[1]["extra"] is None and rows[2]["extra"] == 7


def test_jsonl_roundtrip_exact(spark):
    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="jsonl_test_") + "/docs"
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, "doc_id long, lang string, n_chars long")
    orig = {tuple(r) for r in docs.collect()}
    rt = {tuple(r) for r in back.collect()}
    assert rt == orig


def test_dedup_stream_restores_original(spark):
    """Self-unioned (fully duplicated) stream deduped by event_id must equal
    the original batch table exactly."""
    from naru_spark.streaming.events import dedup_stream, events_stream, run_stream_to_memory

    out = run_stream_to_memory(
        spark, dedup_stream(events_stream(spark, SF_SMOKE)), output_mode="append"
    )
    ev = load_table(spark, "events", SF_SMOKE)
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in ev.select("event_id", "event_type", "value").collect()}
    assert got == want


def test_csv_roundtrip_lossless_with_schema(spark, tmp_path):
    """CSV sink + explicit-schema source: values (incl. timestamps) must
    round-trip exactly."""
    from naru_spark.sources import load_table
    from naru_spark.sources.sinks import read_csv, write_csv
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    li = load_table(spark, "lineitem", SF_SMOKE).select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"
    )
    path = str(tmp_path / "li_csv")
    write_csv(li, path)
    back = read_csv(
        spark, path,
        "l_orderkey long, l_returnflag string, l_quantity double, l_shipdate timestamp",
    )
    assert back.count() == li.count()
    a = li.orderBy("l_orderkey", "l_quantity", "l_shipdate").toPandas()
    b = back.orderBy("l_orderkey", "l_quantity", "l_shipdate").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_zorder_skips_on_both_dims(spark, tmp_path):
    """Z-order vs single-column sort: for a two-column box, the z-ordered
    layout's per-file min/max stats must prune files on BOTH dimensions,
    while a layout sorted only on col A cannot prune a predicate on col B
    alone. Results are layout-invariant (identical box aggregates)."""
    from naru_spark.sources import load_table
    from naru_spark.sources.sinks import file_skip_fraction, zorder_write
    from tests.conftest import SF_T2

    li = load_table(spark, "lineitem", SF_T2).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    info = zorder_write(li, zpath, ["l_partkey", "l_suppkey"], n_files=16, bits=8)
    # baseline: range-sorted on l_partkey ONLY, same file count
    li.repartitionByRange(16, F.col("l_partkey")).sortWithinPartitions(
        "l_partkey"
    ).write.mode("overwrite").parquet(spath)

    def frac(c):
        lo = info["mins"][c] + 0.4 * (info["maxs"][c] - info["mins"][c])
        hi = info["mins"][c] + 0.52 * (info["maxs"][c] - info["mins"][c])
        return lo, hi

    box = {"l_partkey": frac("l_partkey"), "l_suppkey": frac("l_suppkey")}
    zm, zt = file_skip_fraction(spark, zpath, box)
    # range-exchange SAMPLING nudges file boundaries between runs: measured
    # zm rides 7-9 of 16 for this box, so a hard "half the files" line
    # flakes. 5/8 keeps the claim (a 12%-per-dim box touches well under
    # the full set; the 1-dim layout below touches everything) with margin.
    assert zt >= 8 and zm <= zt * 5 // 8, (zm, zt)

    # suppkey-only predicate: the partkey-sorted layout cannot skip
    supp_box = {"l_suppkey": box["l_suppkey"]}
    sm, st = file_skip_fraction(spark, spath, supp_box)
    zm2, _ = file_skip_fraction(spark, zpath, supp_box)
    assert sm >= st - 1  # linear layout: essentially every file intersects
    assert zm2 < sm  # z-order: strictly fewer files touched

    # layout invariance: identical aggregates over the box
    def agg(path):
        df = spark.read.parquet(path)
        for c, (lo, hi) in box.items():
            df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("s"),
        ).collect()[0]
        return int(r["n"]), str(r["s"])

    assert agg(zpath) == agg(spath)


def test_snapshot_time_travel_isolation(spark, tmp_path):
    """Snapshot semantics: v1 stays byte-identical after the v2 append
    (time travel), latest sees both, the manifest commit is atomic
    (no .tmp left behind), and a reader never needs to list data dirs."""
    import json
    import os

    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    path = str(tmp_path / "t")
    a = spark.range(0, 10).withColumnRenamed("id", "k")
    b = spark.range(10, 15).withColumnRenamed("id", "k")
    assert write_snapshot(a, path) == 1
    v1_before = sorted(r["k"] for r in read_snapshot(spark, path, version=1).collect())
    assert write_snapshot(b, path) == 2
    v1_after = sorted(r["k"] for r in read_snapshot(spark, path, version=1).collect())
    assert v1_before == v1_after == list(range(10))
    latest = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert latest == list(range(15))
    man_dir = os.path.join(path, "_manifests")
    assert sorted(os.listdir(man_dir)) == ["v1.json", "v2.json"]  # no .tmp
    m2 = json.load(open(os.path.join(man_dir, "v2.json")))
    assert len(m2["dirs"]) == 2 and m2["version"] == 2


def test_snapshot_replace_mode_time_travel(spark, tmp_path):
    """replace-mode commits: latest sees ONLY the new rewrite, while the
    earlier append chain stays time-travelable."""
    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    path = str(tmp_path / "t")
    write_snapshot(spark.range(0, 5).withColumnRenamed("id", "k"), path)
    write_snapshot(spark.range(5, 8).withColumnRenamed("id", "k"), path)
    write_snapshot(
        spark.range(100, 102).withColumnRenamed("id", "k"), path, mode="replace"
    )
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == [100, 101]
    assert sorted(r["k"] for r in read_snapshot(spark, path, version=2).collect()) == list(range(8))


def test_expire_snapshots_retention(spark, tmp_path):
    """expire_snapshots keeps the last N manifests and deletes every data
    dir no kept manifest references — current version always readable,
    expired versions gone, referenced-by-kept dirs preserved."""
    import os

    import pytest as _pytest

    from naru_spark.sources.sinks import expire_snapshots, read_snapshot, write_snapshot

    path = str(tmp_path / "t")
    write_snapshot(spark.range(0, 5).withColumnRenamed("id", "k"), path)       # v1
    write_snapshot(spark.range(5, 8).withColumnRenamed("id", "k"), path)       # v2 (refs v1 dir too)
    write_snapshot(spark.range(100, 102).withColumnRenamed("id", "k"), path,   # v3 replace
                   mode="replace")
    deleted = expire_snapshots(path, keep_last=1)
    # v3 references only its own dir; v1/v2 dirs are unreferenced -> gone
    assert len(deleted) == 2
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == [100, 101]
    assert os.listdir(os.path.join(path, "_manifests")) == ["v3.json"]
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, version=2)
    # keep_last=0 would delete the current version: refused
    with _pytest.raises(AssertionError):
        expire_snapshots(path, keep_last=0)

    # append-chain retention: kept manifests protect the dirs they reference
    p2 = str(tmp_path / "t2")
    write_snapshot(spark.range(0, 3).withColumnRenamed("id", "k"), p2)   # v1
    write_snapshot(spark.range(3, 6).withColumnRenamed("id", "k"), p2)   # v2 refs v1+v2 dirs
    assert expire_snapshots(p2, keep_last=1) == []  # v2's manifest refs BOTH dirs
    assert sorted(r["k"] for r in read_snapshot(spark, p2).collect()) == list(range(6))


def test_snapshot_concurrent_commit_raises_history_intact(spark, tmp_path):
    """Two writers claiming the same version: the loser's manifest publish
    must fail loudly (create-exclusive link -> SnapshotConflictError),
    never silently last-win — and the winner's history stays readable.
    The race window is simulated by giving the loser a STALE manifest
    listing (it does not see the winner's just-committed version)."""
    import os
    import unittest.mock as mock

    import pytest

    from naru_spark.sources.sinks import (
        SnapshotConflictError,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    write_snapshot(spark.range(0, 5).withColumnRenamed("id", "k"), path)  # v1
    write_snapshot(spark.range(5, 8).withColumnRenamed("id", "k"), path)  # v2: winner

    man_dir = os.path.join(path, "_manifests")
    real_listdir = os.listdir

    def stale_listdir(p):
        out = real_listdir(p)
        if os.path.abspath(str(p)) == os.path.abspath(man_dir):
            return [f for f in out if f != "v2.json"]  # loser can't see v2
        return out

    with mock.patch("os.listdir", side_effect=stale_listdir):
        with pytest.raises(SnapshotConflictError):
            write_snapshot(spark.range(8, 9).withColumnRenamed("id", "k"), path)

    # winner's chain untouched: v2 is still the winner's manifest and reads
    assert sorted(r["k"] for r in read_snapshot(spark, path, version=2).collect()) == list(range(8))
    assert sorted(r["k"] for r in read_snapshot(spark, path, version=1).collect()) == list(range(5))


def test_snapshot_txn_id_replay_is_noop(spark, tmp_path):
    """Delta txnAppId/txnVersion pattern: re-committing an already-
    recorded txn_id (Structured Streaming's at-least-once batch replay)
    returns the original version and appends nothing."""
    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    path = str(tmp_path / "snap")
    a = spark.range(0, 4).withColumnRenamed("id", "k")
    b = spark.range(4, 6).withColumnRenamed("id", "k")
    assert write_snapshot(a, path, txn_id="ingest:0") == 1
    assert write_snapshot(b, path, txn_id="ingest:1") == 2
    # replayed batch 1: same txn_id -> no-op, version unchanged
    assert write_snapshot(b, path, txn_id="ingest:1") == 2
    rows = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert rows == [0, 1, 2, 3, 4, 5]  # no double-count

def test_read_snapshot_changes_incremental(spark, tmp_path):
    """Incremental scan (Iceberg incremental read): the v(i)..v(j) delta
    is exactly the rows the commits in that range appended; from_version=0
    means everything; a replace commit inside the range raises instead of
    returning a wrong diff."""
    import pytest

    from naru_spark.sources.sinks import (
        read_snapshot_changes,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    write_snapshot(spark.range(0, 5).withColumnRenamed("id", "k"), path)    # v1
    write_snapshot(spark.range(5, 8).withColumnRenamed("id", "k"), path)    # v2
    write_snapshot(spark.range(8, 10).withColumnRenamed("id", "k"), path)   # v3

    d12 = sorted(r["k"] for r in read_snapshot_changes(spark, path, 1, 2).collect())
    assert d12 == [5, 6, 7]
    d13 = sorted(r["k"] for r in read_snapshot_changes(spark, path, 1).collect())
    assert d13 == [5, 6, 7, 8, 9]  # to_version defaults to latest
    d03 = sorted(r["k"] for r in read_snapshot_changes(spark, path, 0).collect())
    assert d03 == list(range(10))  # from 0 = full table
    # degenerate range refused (ValueError like every bad-bound case —
    # never a bare assert that python -O would strip)
    with pytest.raises(ValueError, match="empty change range"):
        read_snapshot_changes(spark, path, 3, 3)

    # a replace commit breaks the append-superset invariant -> loud error
    write_snapshot(
        spark.range(100, 102).withColumnRenamed("id", "k"), path, mode="replace"
    )  # v4
    with pytest.raises(ValueError, match="replace commit"):
        read_snapshot_changes(spark, path, 1, 4)
    # ranges entirely after the replace are fine again
    write_snapshot(spark.range(102, 104).withColumnRenamed("id", "k"), path)  # v5
    d45 = sorted(r["k"] for r in read_snapshot_changes(spark, path, 4, 5).collect())
    assert d45 == [102, 103]

def test_compact_snapshot_content_invariant(spark, tmp_path):
    """Compaction (Iceberg rewrite_data_files analog): the rewrite shrinks
    the file count, changes NO rows, commits as a replace version that
    leaves earlier versions time-travelable, and the superseded small
    files are reclaimed by expire_snapshots afterwards."""
    import os

    from naru_spark.sources.sinks import (
        compact_snapshot,
        expire_snapshots,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    write_snapshot(spark.range(0, 40).withColumnRenamed("id", "k").repartition(5), path)
    write_snapshot(spark.range(40, 60).withColumnRenamed("id", "k").repartition(5), path)
    info = compact_snapshot(spark, path, target_files=2)
    assert info["version"] == 3
    assert info["files_before"] == 10 and info["files_after"] <= 2, info
    # content invariant, pre-compaction versions intact
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == list(range(60))
    assert sorted(r["k"] for r in read_snapshot(spark, path, version=2).collect()) == list(range(60))
    assert sorted(r["k"] for r in read_snapshot(spark, path, version=1).collect()) == list(range(40))
    # retention reclaims the superseded small-file dirs (v3 refs only its own)
    deleted = expire_snapshots(path, keep_last=1)
    assert len(deleted) == 2
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == list(range(60))
    assert os.listdir(os.path.join(path, "_manifests")) == ["v3.json"]
    # default target_files: derived from current bytes / target size — a
    # tiny table bin-packs to ONE file
    info2 = compact_snapshot(spark, path)
    assert info2["files_after"] == 1, info2
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == list(range(60))

def test_snapshot_stream_source_guards_and_tailing(spark, tmp_path):
    """Stream-from-snapshot: an availableNow drain sees exactly the
    committed rows; a second drain on the same checkpoint picks up ONLY a
    later commit; replace-in-history and orphan data dirs raise at start
    instead of streaming wrong rows."""
    import os

    import pytest

    from naru_spark.sources.sinks import (
        snapshot_stream_source,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    write_snapshot(spark.range(0, 6).withColumnRenamed("id", "k"), path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            snapshot_stream_source(spark, path)
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    drain()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == list(range(6))
    write_snapshot(spark.range(6, 9).withColumnRenamed("id", "k"), path)
    drain()  # only the delta is appended
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == list(range(9))

    # orphan data dir (conflict loser's leftovers) -> refuse to start
    os.makedirs(os.path.join(path, "data", "v9-orphan"))
    with pytest.raises(ValueError, match="orphan"):
        snapshot_stream_source(spark, path)
    os.rmdir(os.path.join(path, "data", "v9-orphan"))

    # replace commit in history -> refuse to start
    write_snapshot(
        spark.range(100, 102).withColumnRenamed("id", "k"), path, mode="replace"
    )
    with pytest.raises(ValueError, match="replace commit"):
        snapshot_stream_source(spark, path)

def test_gc_orphans_unblocks_stream_history_intact(spark, tmp_path):
    """A forged conflict-loser data dir blocks snapshot_stream_source's
    startup; gc_orphans collects exactly that dir (every referenced dir
    of every version survives — time travel intact), the stream then
    starts. The older_than_s safety window spares young dirs (the
    in-flight-commit guard)."""
    import os

    import pytest

    from naru_spark.sources.sinks import (
        gc_orphans,
        read_snapshot,
        snapshot_stream_source,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    write_snapshot(spark.range(0, 4).withColumnRenamed("id", "k"), path)
    write_snapshot(spark.range(4, 7).withColumnRenamed("id", "k"), path)

    loser = os.path.join(path, "data", "v3-deadbeef")
    os.makedirs(loser)
    with open(os.path.join(loser, "part-0.parquet"), "w") as fh:
        fh.write("junk")
    with pytest.raises(ValueError, match="orphan"):
        snapshot_stream_source(spark, path)

    # a young orphan survives the safety window...
    assert gc_orphans(path, older_than_s=3600) == []
    # ...and is collected once eligible
    assert gc_orphans(path) == [loser]
    assert not os.path.exists(loser)

    # stream now starts; both historical versions still read
    snapshot_stream_source(spark, path)
    assert read_snapshot(spark, path, version=1).count() == 4
    assert read_snapshot(spark, path, version=2).count() == 7
    # idempotent on a clean tree
    assert gc_orphans(path) == []


def test_delete_from_snapshot_null_semantics_and_history(spark, tmp_path):
    """Delta DELETE semantics: rows where the condition is NULL never
    match, so they SURVIVE; the matched count is exact; pre-delete
    versions stay time-travelable; the delete commit is pinned to the
    version it read."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 3), (4, 99), (5, None)], "k int, v int"
    )
    write_snapshot(df, path)
    info = delete_from_snapshot(spark, path, "v > 5")
    assert (info["version"], info["n_deleted"]) == (2, 2)  # k=1 and k=4
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == [2, 3, 5]
    # NULL-v rows survived; history intact
    assert read_snapshot(spark, path, version=1).count() == 5
    # a no-match delete is a NO-OP: no rewrite, no replace commit, same
    # version (Delta behavior — a replace commit here would break
    # incremental reads over the range for nothing)
    info2 = delete_from_snapshot(spark, path, "v > 1000")
    assert (info2["version"], info2["n_deleted"]) == (2, 0)
    assert info2["files_rewritten"] == 0


def test_selective_compaction_carries_right_sized_entries(spark, tmp_path):
    """Delta OPTIMIZE's actual behavior: only UNDER-SIZED entries (per
    the manifest's stamped stats) are rewritten; a cold right-sized
    entry's files survive BYTE-IDENTICAL on disk (same paths, same
    bytes — zero rewrite I/O), the maintenance trigger fires on the
    fragmented subset, and a table with nothing fragmented is a
    commit-free noop."""
    import hashlib
    import json
    import os

    from naru_spark.sources.sinks import (
        compact_snapshot,
        maintain_snapshot,
        read_snapshot,
        write_snapshot,
    )

    def file_hashes(entry):
        out = {}
        for f in sorted(os.listdir(entry)):
            if f.endswith(".parquet"):
                fp = os.path.join(entry, f)
                out[fp] = hashlib.md5(open(fp, "rb").read()).hexdigest()
        return out

    path = str(tmp_path / "t")
    # v1: one "right-sized" cold entry (1 file); v2..v4: fragmented
    # appends (5 tiny files each)
    write_snapshot(
        spark.range(0, 1000).withColumnRenamed("id", "k").coalesce(1), path
    )
    man1 = json.load(open(os.path.join(path, "_manifests", "v1.json")))
    cold_entry = man1["dirs"][0]
    cold_bytes = man1["stats"][cold_entry]["n_bytes"]
    cold_before = file_hashes(cold_entry)
    for lo in (1000, 1040, 1080):
        write_snapshot(
            spark.range(lo, lo + 40).withColumnRenamed("id", "k")
            .repartition(5), path
        )

    # threshold below the cold file's size but above the tiny ones
    res = compact_snapshot(spark, path, min_file_bytes=cold_bytes)
    assert res["mode"] == "selective", res
    assert res["files_rewritten"] == 15 and res["entries_carried"] == 1, res
    assert res["files_after"] < res["files_before"], res
    man = json.load(open(os.path.join(
        path, "_manifests", f"v{res['version']}.json")))
    assert cold_entry in man["dirs"]  # re-referenced, not rewritten
    assert file_hashes(cold_entry) == cold_before  # byte-identical
    got = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert got == list(range(1120))

    # nothing fragmented left at this threshold: commit-free noop
    versions_before = sorted(os.listdir(os.path.join(path, "_manifests")))
    res2 = compact_snapshot(spark, path, min_file_bytes=cold_bytes)
    assert res2["mode"] == "noop" and res2["version"] == res["version"], res2
    assert sorted(os.listdir(os.path.join(path, "_manifests"))) == versions_before

    # the maintenance trigger weighs the FRAGMENTED subset: new tiny
    # appends on a mostly-right-sized table fire it (a whole-table count
    # would need small files to outnumber the cold files several-fold)
    for lo in (1120, 1160):
        write_snapshot(
            spark.range(lo, lo + 40).withColumnRenamed("id", "k")
            .repartition(5), path
        )
    res3 = maintain_snapshot(
        spark, path, merge_factor=2, min_file_bytes=cold_bytes
    )
    assert res3["action"] == "compact" and res3["mode"] == "selective", res3
    assert file_hashes(cold_entry) == cold_before  # still untouched
    assert sorted(
        r["k"] for r in read_snapshot(spark, path).collect()
    ) == list(range(1200))

    # full=True is the explicit whole-table materialization mode
    res4 = compact_snapshot(spark, path, full=True, target_files=2)
    assert res4["mode"] == "full", res4
    man4 = json.load(open(os.path.join(
        path, "_manifests", f"v{res4['version']}.json")))
    assert cold_entry not in man4["dirs"]


def test_maintain_snapshot_policy(spark, tmp_path):
    """The auto-OPTIMIZE loop: fragmented commits trip the file-count
    policy and compact exactly once; a compact table is a metadata-only
    no-op; history stays readable."""
    from naru_spark.sources.sinks import (
        maintain_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    for lo in (0, 40, 80):
        write_snapshot(
            spark.range(lo, lo + 40).withColumnRenamed("id", "k").repartition(5),
            path,
        )
    res = maintain_snapshot(spark, path, merge_factor=2)
    assert res["action"] == "compact"
    assert res["files_after"] <= res["target_files"] < res["files"]
    assert maintain_snapshot(spark, path, merge_factor=2)["action"] == "noop"
    assert read_snapshot(spark, path).count() == 120
    assert read_snapshot(spark, path, version=2).count() == 80


def test_gc_and_expire_survive_path_respelling(spark, tmp_path):
    """Manifests carry the WRITER's path spelling; GC paths compare data
    dirs by basename, so a respelled manifest (relative prefix, doubled
    slashes) must not cause live dirs to be deleted — and a manifest set
    that matches NOTHING on disk makes gc_orphans refuse outright."""
    import json
    import os

    import pytest

    from naru_spark.sources.sinks import (
        expire_snapshots,
        gc_orphans,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(spark.range(0, 5).withColumnRenamed("id", "k"), path)
    write_snapshot(spark.range(5, 8).withColumnRenamed("id", "k"), path)

    # respell v1's manifest dirs (writer used a different spelling)
    man1 = os.path.join(path, "_manifests", "v1.json")
    m = json.load(open(man1))
    m["dirs"] = ["./" + d.replace(path, os.path.relpath(path)) + "/" for d in m["dirs"]]
    json.dump(m, open(man1, "w"))

    assert gc_orphans(path) == []  # v1's respelled dirs are NOT orphans
    assert read_snapshot(spark, path, version=1).count() == 5
    deleted = expire_snapshots(path, keep_last=2)  # keeps v1+v2 -> nothing
    assert deleted == []
    assert read_snapshot(spark, path).count() == 8

    # a manifest set matching NOTHING on disk -> refuse, delete nothing
    for f in os.listdir(os.path.join(path, "_manifests")):
        mp = os.path.join(path, "_manifests", f)
        mm = json.load(open(mp))
        mm["dirs"] = ["/elsewhere/data/" + os.path.basename(os.path.normpath(d)) + "-x"
                      for d in mm["dirs"]]
        json.dump(mm, open(mp, "w"))
    n_dirs = len(os.listdir(os.path.join(path, "data")))
    with pytest.raises(ValueError, match="refusing to delete"):
        gc_orphans(path)
    # nothing was touched
    assert len(os.listdir(os.path.join(path, "data"))) == n_dirs


def test_snapshot_base_version_stale_read_conflicts(spark, tmp_path):
    """Optimistic concurrency for read-modify-write commits: a replace
    built against a base that is no longer latest (an append landed in
    between) must raise, never silently supersede the interleaved rows —
    the compaction lost-update case."""
    import pytest

    from naru_spark.sources.sinks import (
        SnapshotConflictError,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    write_snapshot(spark.range(0, 5).withColumnRenamed("id", "k"), path)   # v1
    write_snapshot(spark.range(5, 8).withColumnRenamed("id", "k"), path)   # v2
    # compactor reads latest=2; a writer appends v3 before it commits
    write_snapshot(spark.range(8, 10).withColumnRenamed("id", "k"), path)  # v3
    with pytest.raises(SnapshotConflictError):
        write_snapshot(
            spark.range(0, 8).withColumnRenamed("id", "k").coalesce(1),
            path, mode="replace", base_version=2,
        )
    # nothing lost: v3's rows still in the current table
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == list(range(10))
    # retry against the true latest succeeds
    v = write_snapshot(
        spark.range(0, 10).withColumnRenamed("id", "k").coalesce(1),
        path, mode="replace", base_version=3,
    )
    assert v == 4
    # a base that never existed is refused outright
    with pytest.raises(AssertionError):
        write_snapshot(
            spark.range(0, 1).withColumnRenamed("id", "k"), path, base_version=99
        )


def test_snapshot_txns_map_bounded_per_app(spark, tmp_path):
    """Delta txnAppId/txnVersion pattern: the manifest's txns map holds
    ONE entry per app however many batches commit, and replaying any
    already-recorded batch version is a no-op."""
    import json
    import os

    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    path = str(tmp_path / "snap")
    for b in range(4):
        write_snapshot(
            spark.range(b * 2, b * 2 + 2).withColumnRenamed("id", "k"),
            path, txn_id=f"ingest:{b}",
        )
    man = json.load(open(os.path.join(path, "_manifests", "v4.json")))
    assert list(man["txns"]) == ["ingest"], man["txns"]  # bounded: one app entry
    assert man["txns"]["ingest"] == {"v": 3, "commit": 4}
    # replay of the LAST batch returns its own commit; an OLDER batch is
    # equally skipped (at-least-once replay never re-appends)
    assert write_snapshot(spark.range(6, 8).withColumnRenamed("id", "k"),
                          path, txn_id="ingest:3") == 4
    write_snapshot(spark.range(2, 4).withColumnRenamed("id", "k"),
                   path, txn_id="ingest:1")
    rows = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert rows == list(range(8))  # no double-counts from either replay

def test_snapshot_schema_evolution_read(spark, tmp_path):
    """Additive schema evolution across snapshot commits: mergeSchema
    reads the evolved union with NULLs for pre-evolution rows; time
    travel to a pre-evolution version still sees the narrow schema."""
    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    path = str(tmp_path / "snap")
    write_snapshot(spark.createDataFrame([(1, "a")], ["k", "s"]), path)          # v1
    write_snapshot(spark.createDataFrame([(2, "b", 7.5)], ["k", "s", "x"]), path)  # v2 adds x
    rows = {r["k"]: r for r in read_snapshot(spark, path, merge_schema=True).collect()}
    assert rows[1]["x"] is None and rows[2]["x"] == 7.5
    assert read_snapshot(spark, path, version=1).columns == ["k", "s"]


def test_snapshot_txns_legacy_format_migrates(spark, tmp_path):
    """Manifests written by the old flat {txn_id: commit} format must keep
    their idempotence under the new per-app map: a replayed old-format
    batch is skipped (no double-append) and colon-free legacy keys do not
    crash the replay check."""
    import json
    import os

    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    path = str(tmp_path / "snap")
    write_snapshot(spark.range(0, 4).withColumnRenamed("id", "k"), path)  # v1
    # forge a legacy-format manifest (what pre-change code wrote)
    man = os.path.join(path, "_manifests", "v1.json")
    m = json.load(open(man))
    m["txns"] = {"ingest:0": 1, "once": 1}
    json.dump(m, open(man, "w"))
    # replay of the legacy-recorded batch: no-op, no double-count
    assert write_snapshot(spark.range(0, 4).withColumnRenamed("id", "k"),
                          path, txn_id="ingest:0") == 1
    assert write_snapshot(spark.range(9, 10).withColumnRenamed("id", "k"),
                          path, txn_id="once") == 1  # colon-free legacy key
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == [0, 1, 2, 3]
    # a NEW batch still commits and upgrades the map format
    assert write_snapshot(spark.range(4, 6).withColumnRenamed("id", "k"),
                          path, txn_id="ingest:1") == 2
    m2 = json.load(open(os.path.join(path, "_manifests", "v2.json")))
    assert m2["txns"]["ingest"] == {"v": 1, "commit": 2}
    assert m2["txns"]["once"] == {"v": 0, "commit": 1}


def test_delete_from_snapshot_file_pruned_rewrite(spark, tmp_path):
    """A selective delete rewrites ONLY the files holding matching rows:
    untouched files are carried into the new manifest verbatim as FILE
    entries — same path, byte-identical on disk — and whole commits with
    no match carry forward as dir entries."""
    import hashlib
    import json
    import os

    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    # three commits with disjoint key ranges -> the predicate hits only v2
    write_snapshot(spark.range(0, 40).withColumnRenamed("id", "k"), path)
    write_snapshot(spark.range(40, 80).withColumnRenamed("id", "k"), path)
    write_snapshot(spark.range(80, 120).withColumnRenamed("id", "k"), path)
    man_dir = os.path.join(path, "_manifests")
    v3 = json.load(open(os.path.join(man_dir, "v3.json")))
    untouched_dirs = v3["dirs"][:1] + v3["dirs"][2:]  # v1 + v3 commits

    def digest(p):
        return {
            f: hashlib.md5(open(os.path.join(p, f), "rb").read()).hexdigest()
            for f in os.listdir(p) if f.endswith(".parquet")
        }

    before = {d: digest(d) for d in untouched_dirs}
    info = delete_from_snapshot(spark, path, "k >= 50 and k < 60")
    assert info["n_deleted"] == 10
    # untouched commits carried verbatim, bytes unchanged
    v4 = json.load(open(os.path.join(man_dir, "v4.json")))
    for d in untouched_dirs:
        assert d in v4["dirs"], "non-overlapping commit must carry as-is"
        assert digest(d) == before[d]
    # the rewrite touched only v2's matching files
    v2_dir = v3["dirs"][1]
    n_v2_files = sum(1 for f in os.listdir(v2_dir) if f.endswith(".parquet"))
    assert 1 <= info["files_rewritten"] <= n_v2_files
    # v2's non-matching files (if any) carry forward as FILE entries
    assert info["files_carried"] >= 2
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == (
        list(range(0, 50)) + list(range(60, 120))
    )
    # pre-delete versions stay time-travelable
    assert read_snapshot(spark, path, version=2).count() == 80


def test_delete_file_entries_survive_gc_expire_and_redelete(spark, tmp_path):
    """After a file-pruned delete the manifest holds FILE entries; GC and
    expiry must treat them as references to their parent dir (not delete
    a dir whose files are still live), and a second delete over a
    file-entry manifest still works."""
    import json
    import os

    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        expire_snapshots,
        gc_orphans,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 100).withColumnRenamed("id", "k").repartition(4), path
    )
    info = delete_from_snapshot(spark, path, "k % 10 = 0")  # hits all files
    assert info["n_deleted"] == 10
    # second delete over the (possibly file-entry) manifest
    info2 = delete_from_snapshot(spark, path, "k = 55")
    assert info2["n_deleted"] == 1
    assert gc_orphans(path) == []  # nothing live is an orphan
    expire_snapshots(path, keep_last=1)  # drop pre-delete versions
    got = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert got == [k for k in range(100) if k % 10 != 0 and k != 55]


def test_manifest_stats_stamped_and_maintain_metadata_only(spark, tmp_path):
    """Every commit stamps per-entry {n_rows,n_bytes,n_files} stats into
    the manifest (footer-read at commit, O(delta)); maintain_snapshot's
    no-op decision then reads the MANIFEST only — zero data-file
    getsize/listdir calls — and a legacy stats-less manifest back-fills."""
    import json
    import os
    from unittest import mock

    from naru_spark.sources.sinks import maintain_snapshot, write_snapshot

    path = str(tmp_path / "t")
    write_snapshot(spark.range(0, 50).withColumnRenamed("id", "k"), path)
    write_snapshot(spark.range(50, 60).withColumnRenamed("id", "k"), path)
    man_dir = os.path.join(path, "_manifests")
    man = json.load(open(os.path.join(man_dir, "v2.json")))
    assert set(man["stats"]) == set(man["dirs"])
    for e in man["dirs"]:
        n_parquet = sum(1 for f in os.listdir(e) if f.endswith(".parquet"))
        assert man["stats"][e]["n_files"] == n_parquet
        assert man["stats"][e]["n_bytes"] > 0
    assert sum(s["n_rows"] for s in man["stats"].values()) == 60
    # the no-op maintenance decision must not stat/list any data file
    with mock.patch("os.path.getsize", side_effect=AssertionError("walked!")):
        res = maintain_snapshot(spark, path, merge_factor=1000)
    assert res["action"] == "noop"
    # legacy manifest (no stats key): maintenance back-fills from footers
    del man["stats"]
    json.dump(man, open(os.path.join(man_dir, "v2.json"), "w"))
    res2 = maintain_snapshot(spark, path, merge_factor=1000)
    assert res2 == res
    # and the next commit re-stamps stats for every entry
    write_snapshot(spark.range(60, 70).withColumnRenamed("id", "k"), path)
    man3 = json.load(open(os.path.join(man_dir, "v3.json")))
    assert set(man3["stats"]) == set(man3["dirs"])
    assert sum(s["n_rows"] for s in man3["stats"].values()) == 70


def test_maintain_snapshot_zorder_clusters_the_rewrite(spark, tmp_path):
    """maintain_snapshot(zorder_by=...) routes the triggered compaction
    through the Morton-interleave clustering: content identical to the
    plain-coalesce rewrite, file count right-sized the same way, and the
    compacted files' footer min/max stats prune a 2-D box strictly
    better than the coalesced layout."""
    import json
    import os

    from naru_spark.sources.sinks import (
        file_skip_fraction,
        maintain_snapshot,
        read_snapshot,
        write_snapshot,
    )

    zp, pp = str(tmp_path / "z"), str(tmp_path / "p")
    df = spark.range(0, 4000).select(
        F.col("id").alias("a"), (F.col("id") * 37 % 4000).alias("b")
    )
    for path in (zp, pp):
        for k in range(3):
            write_snapshot(df.filter(F.col("a") % 3 == k).repartition(6), path)
    kw = dict(merge_factor=1, target_file_bytes=4 * 1024)
    rz = maintain_snapshot(spark, zp, zorder_by=["a", "b"], **kw)
    rp = maintain_snapshot(spark, pp, **kw)
    assert rz["action"] == rp["action"] == "compact"

    def one_dir(path):
        man_dir = os.path.join(path, "_manifests")
        latest = max(int(f[1:-5]) for f in os.listdir(man_dir)
                     if f.startswith("v") and f.endswith(".json"))
        (d,) = json.load(open(os.path.join(man_dir, f"v{latest}.json")))["dirs"]
        return d

    box = {"a": (1600.0, 2200.0), "b": (1600.0, 2200.0)}
    zm, zt = file_skip_fraction(spark, one_dir(zp), box)
    pm, pt = file_skip_fraction(spark, one_dir(pp), box)
    assert zt >= 8 and zm / zt < pm / pt, (zm, zt, pm, pt)
    a = sorted(map(tuple, read_snapshot(spark, zp).collect()))
    b = sorted(map(tuple, read_snapshot(spark, pp).collect()))
    assert a == b  # clustering never changes content


def test_maintain_snapshot_retention_composition(spark, tmp_path):
    """maintain_snapshot(keep_last=, gc_older_than_s=) is the full
    maintenance tick: compaction first, then expiry anchored on the
    fresh version, then orphan GC. Time travel works exactly to the
    retention boundary, crash debris is swept, and the stream source
    starts cleanly afterwards."""
    import os

    import pytest

    from naru_spark.sources.sinks import (
        maintain_snapshot,
        read_snapshot,
        snapshot_stream_source,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    for k in range(3):
        write_snapshot(
            spark.range(k * 40, k * 40 + 40).withColumnRenamed("id", "k")
            .repartition(5),
            path,
        )
    # crash debris: a data dir no manifest references
    debris = os.path.join(path, "data", "v9-deadbeef")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-0.parquet"), "w") as fh:
        fh.write("junk")

    res = maintain_snapshot(spark, path, merge_factor=2, keep_last=1)
    assert res["action"] == "compact"
    # the 3 superseded ingest dirs AND the never-referenced debris all
    # expire (expiry keeps exactly what the kept manifests reference)
    assert res["expired_dirs"] == 4 and not os.path.exists(debris)
    assert "gc_dirs" not in res
    # time travel: exactly the retention boundary
    assert sorted(r["k"] for r in read_snapshot(spark, path).collect()) == list(range(120))
    assert read_snapshot(spark, path, version=4).count() == 120
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, version=3)
    # fresh debris with history PRESERVED: the gc knob sweeps it without
    # touching manifests (time travel to every kept version intact)
    os.makedirs(debris)
    with open(os.path.join(debris, "part-0.parquet"), "w") as fh:
        fh.write("junk")
    res2 = maintain_snapshot(spark, path, merge_factor=2, gc_older_than_s=0.0)
    assert res2["action"] == "noop"
    assert "expired_dirs" not in res2 and res2["gc_dirs"] == 1
    assert not os.path.exists(debris)
    # the stream source starts on the retained table (no orphans, and the
    # expired replace history is gone with its manifests)
    snapshot_stream_source(spark, path)
    # a second full tick on the now-compact table: noop, nothing to retire
    res3 = maintain_snapshot(
        spark, path, merge_factor=2, keep_last=1, gc_older_than_s=0.0
    )
    assert res3["action"] == "noop"
    assert res3["expired_dirs"] == 0 and res3["gc_dirs"] == 0


def test_merge_on_read_delete_lifecycle(spark, tmp_path):
    """Iceberg-v2-style merge-on-read DELETE: the delete commit is
    metadata-only (zero data files touched), readers apply the recorded
    predicates with sequence semantics (later appends unaffected),
    stream/copy-on-write paths refuse while deletes are pending, and
    compaction materializes + clears them with time travel intact."""
    import json
    import os

    import pytest

    from naru_spark.sources.sinks import (
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        read_snapshot_changes,
        snapshot_stats,
        snapshot_stream_source,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(spark.range(0, 40).withColumnRenamed("id", "k"), path)   # v1
    write_snapshot(spark.range(40, 80).withColumnRenamed("id", "k"), path)  # v2

    def data_files():
        root = os.path.join(path, "data")
        return sorted(
            os.path.join(d, f)
            for d in os.listdir(root)
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        )

    before = data_files()
    info = delete_from_snapshot(spark, path, "k % 10 = 0", mode="merge-on-read")
    assert info == {"version": 3, "n_deleted": None,
                    "files_rewritten": 0, "files_carried": 2}
    assert data_files() == before  # metadata-only: zero data I/O
    assert snapshot_stats(path)["n_delete_preds"] == 1
    got = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert got == [k for k in range(80) if k % 10 != 0]
    assert read_snapshot(spark, path, version=2).count() == 80  # time travel

    # sequence semantics: rows appended AFTER the delete survive even
    # where the predicate matches them (80, 90)
    write_snapshot(spark.range(80, 100).withColumnRenamed("id", "k"), path)  # v4
    got = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert got == [k for k in range(80) if k % 10 != 0] + list(range(80, 100))
    # the delete commit is an empty delta; the append is a real one
    assert read_snapshot_changes(spark, path, 2, 3).count() == 0
    assert read_snapshot_changes(spark, path, 3, 4).count() == 20

    # a second predicate stacks; both apply to their own visible dirs
    delete_from_snapshot(spark, path, "k >= 95", mode="merge-on-read")  # v5
    expect = [k for k in range(80) if k % 10 != 0] + list(range(80, 95))
    got = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert got == expect

    # raw-file consumers refuse while deletes are pending
    with pytest.raises(ValueError, match="merge-on-read"):
        snapshot_stream_source(spark, path)
    with pytest.raises(ValueError, match="merge-on-read"):
        delete_from_snapshot(spark, path, "k = 1")  # copy-on-write

    # compaction materializes the deletes and clears them
    res = compact_snapshot(spark, path, target_files=2)
    man = json.load(open(os.path.join(
        path, "_manifests", f"v{res['version']}.json")))
    assert man.get("deletes", []) == []
    got = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert got == expect
    assert snapshot_stats(path)["n_rows"] == len(expect)  # stats exact again
    # pre-compaction versions still apply their recorded predicates
    got5 = sorted(r["k"] for r in read_snapshot(spark, path, version=5).collect())
    assert got5 == expect
    # copy-on-write delete works again post-materialization
    info2 = delete_from_snapshot(spark, path, "k = 1")
    assert info2["n_deleted"] == 1


def test_manifest_column_stats_prune_reads_and_deletes(spark, tmp_path):
    """Per-column min/max stamped into the manifest at commit powers
    entry elimination with ZERO query-time I/O: a pruned read plans
    against only the overlapping entries (results identical to the full
    filtered read), a fully-disjoint box yields a typed empty frame, and
    a pruned delete scans only the overlapping commits."""
    import json
    import os

    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    for lo in (0, 100, 200):  # disjoint key ranges, one commit each
        write_snapshot(
            spark.range(lo, lo + 100).withColumnRenamed("id", "k"), path
        )
    man = json.load(open(os.path.join(path, "_manifests", "v3.json")))
    for e in man["dirs"]:
        rng = man["stats"][e]["cols"]["k"]
        assert rng[1] - rng[0] == 99  # each commit's exact key range

    # pruned read == full read under the same predicate
    full = sorted(
        r["k"] for r in read_snapshot(spark, path)
        .where("k >= 120 and k <= 150").collect()
    )
    pruned = read_snapshot(spark, path, prune={"k": (120, 150)})
    got = sorted(r["k"] for r in pruned.where("k >= 120 and k <= 150").collect())
    assert got == full == list(range(120, 151))
    # disjoint box: typed empty, zero rows
    empty = read_snapshot(spark, path, prune={"k": (1000, 2000)})
    assert empty.count() == 0 and "k" in empty.columns

    # pruned delete: two commits eliminated before the matching scan
    info = delete_from_snapshot(
        spark, path, "k % 10 = 0 and k < 100", prune={"k": (0, 99)}
    )
    assert info["n_deleted"] == 10
    assert info["entries_pruned"] == 2 and info["entries_scanned"] == 1
    got = sorted(r["k"] for r in read_snapshot(spark, path).collect())
    assert got == [k for k in range(300) if not (k < 100 and k % 10 == 0)]
    # unknown column in the box: never wrongly prunes
    assert read_snapshot(spark, path, prune={"zzz": (0, 1)}).count() == len(got)


def test_mor_and_prune_read_plans(spark, tmp_path):
    """Plan shape pins for the snapshot read paths: (1) a merge-on-read
    delete plans as ONE Filter fused over the FileScan (no join, no
    shuffle — the survivor predicate rides in DataFilters); (2) a pruned
    read's scan lists ONLY the overlapping entries' files (entry
    elimination happened at the manifest, before the file index)."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(spark.range(0, 100).withColumnRenamed("id", "k"), path)
    write_snapshot(spark.range(100, 200).withColumnRenamed("id", "k"), path)
    delete_from_snapshot(spark, path, "k % 10 = 0", mode="merge-on-read")

    df = read_snapshot(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan
    assert plan.count("Filter") >= 1 and "DataFilters: [" in plan, plan
    got = sorted(r["k"] for r in df.collect())
    assert got == [k for k in range(200) if k % 10 != 0]

    pruned = read_snapshot(spark, path, prune={"k": (150, 160)})
    files = pruned.inputFiles()
    assert files, "pruned read must still scan the overlapping entry"
    assert all("/data/v2-" in f for f in files), files  # v1's dir eliminated


def test_bloom_key_pruning_on_unclustered_layout(spark, tmp_path):
    """Bloom sidecars prune point/IN-list operations where min/max boxes
    cannot: three commits with fully-INTERLEAVED key ranges (every box
    overlaps everything), bloom_key stamped at commit; a two-key read
    and delete scan only the commits whose bloom may contain the keys,
    and expiry reclaims the sidecars with their dirs."""
    import os

    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        expire_snapshots,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 300).withColumnRenamed("id", "k")
    for m in range(3):  # k % 3 == m: interleaved, boxes useless
        write_snapshot(base.filter(F.col("k") % 3 == m), path, bloom_key="k")
    assert len(os.listdir(os.path.join(path, "_blooms"))) == 3

    # point read: only the k%3==0 commit survives the bloom probe
    r = read_snapshot(spark, path, prune_keys={"k": [6]})
    assert sorted(x["k"] for x in r.where("k = 6").collect()) == [6]
    assert all("/data/v1-" in f for f in r.inputFiles()), r.inputFiles()

    # IN-list delete: keys 6 (commit 1) and 7 (commit 2) — commit 3's
    # bloom misses both, so it is eliminated before the matching scan
    info = delete_from_snapshot(
        spark, path, "k IN (6, 7)", prune_keys={"k": [6, 7]}
    )
    assert info["n_deleted"] == 2
    assert info["entries_pruned"] == 1 and info["entries_scanned"] == 2, info
    got = sorted(x["k"] for x in read_snapshot(spark, path).collect())
    assert got == [k for k in range(300) if k not in (6, 7)]

    # the bloom index SURVIVES the rewrite: the delete re-stamped its
    # survivor commit (fresh sidecar) and carried split files inherit
    # their parent's superset bloom — a point probe still prunes, and a
    # probe for a surviving key still finds it
    import json

    man_dir = os.path.join(path, "_manifests")
    latest = max(int(f[1:-5]) for f in os.listdir(man_dir)
                 if f.startswith("v") and f.endswith(".json"))
    man = json.load(open(os.path.join(man_dir, f"v{latest}.json")))
    assert all(
        (man["stats"][e].get("bloom") or {}).get("key") == "k"
        for e in man["dirs"]
    ), man["stats"]
    r2 = read_snapshot(spark, path, prune_keys={"k": [9]})
    assert sorted(x["k"] for x in r2.where("k = 9").collect()) == [9]

    # ...and through compaction (OPTIMIZE rebuilds the bloom index)
    from naru_spark.sources.sinks import compact_snapshot
    res = compact_snapshot(spark, path, full=True, target_files=2)
    man = json.load(open(os.path.join(man_dir, f"v{res['version']}.json")))
    assert all(
        (man["stats"][e].get("bloom") or {}).get("key") == "k"
        for e in man["dirs"]
    ), man["stats"]
    r3 = read_snapshot(spark, path, prune_keys={"k": [9]})
    assert sorted(x["k"] for x in r3.where("k = 9").collect()) == [9]

    # retention reclaims sidecars with their dirs
    expire_snapshots(path, keep_last=1)
    blooms_left = set(os.listdir(os.path.join(path, "_blooms")))
    kept_dirs = set(os.listdir(os.path.join(path, "data")))
    assert blooms_left <= {d + ".bloom" for d in kept_dirs}, (blooms_left, kept_dirs)


def test_bloom_probe_matches_non_long_key_types(spark, tmp_path):
    """xxhash64 is TYPE-SENSITIVE: the build hashes the key column's
    native parquet type, so a probe that hashed python ints as long
    against an int/short/float column would miss every value and
    WRONGLY PRUNE entries that do hold the keys (silently losing rows
    in a pruned delete). The stamped dtype makes the probe cast first;
    pruning must stay conservative-correct for every key type."""
    import pytest

    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    for dtype, probe in (("int", 6), ("smallint", 6), ("float", 6.0),
                         ("decimal(9,2)", 6), ("string", "6")):
        path = str(tmp_path / f"t_{dtype.split('(')[0]}")
        base = spark.range(0, 60).select(
            F.col("id").cast(dtype).alias("k"), F.col("id").alias("v")
        )
        for m in range(2):  # interleaved so boxes can't prune
            write_snapshot(base.filter(F.col("v") % 2 == m), path,
                           bloom_key="k")
        r = read_snapshot(spark, path, prune_keys={"k": [probe]})
        got = r.where(F.col("k") == F.lit(probe).cast(dtype)).collect()
        assert len(got) == 1, (dtype, got)  # the entry holding 6 survived
        # and the OTHER entry (odd v) was actually eliminated
        assert len(set(r.inputFiles())) < len(
            set(read_snapshot(spark, path).inputFiles())
        ), dtype

    # a probe value that cannot represent in the stamped type raises
    # instead of pruning on a lossy cast
    path = str(tmp_path / "t_int")
    with pytest.raises(ValueError, match="stamped key type"):
        read_snapshot(spark, path, prune_keys={"k": ["not-a-number"]})


def test_bloom_probe_packed_seek_path(tmp_path, monkeypatch):
    """Large sidecars are probed by per-byte pread()s on the PACKED
    bitmap — no np.unpackbits (8× blowup) and no whole-file read. The
    seek path must agree with the whole-read path and touch O(values·k)
    bytes, not the file."""
    import os

    import numpy as np

    from naru_spark.sources import sinks

    m = 1 << 16  # 8 KiB sidecar
    bits = np.zeros(m, dtype=np.uint8)
    present = [[11, 222, 3333], [7, 44444, 65535]]
    absent = [[11, 222, 3334], [12345, 54321, 1]]
    for row in present:
        for p in row:
            bits[p] = 1
    fp = str(tmp_path / "x.bloom")
    with open(fp, "wb") as fh:
        fh.write(np.packbits(bits).tobytes())
    size = os.path.getsize(fp)

    hit_whole, read_whole = sinks._bloom_probe_file(fp, present)
    miss_whole, _ = sinks._bloom_probe_file(fp, absent)
    assert hit_whole and not miss_whole and read_whole == size

    monkeypatch.setattr(sinks, "_BLOOM_WHOLE_READ_MAX", 0)
    hit_seek, read_hit = sinks._bloom_probe_file(fp, present)
    miss_seek, read_miss = sinks._bloom_probe_file(fp, absent)
    assert hit_seek and not miss_seek
    # each probed position costs at most one byte; misses short-circuit
    assert read_hit <= 6 and read_miss <= 6, (read_hit, read_miss)

def test_alter_snapshot_schema_rename_drop_without_rewrite(spark, tmp_path):
    """Rename/drop without rewriting data (Iceberg/Delta column-mapping
    shape): the op is a metadata-only commit pinned to the entries
    visible now; reads map old physical names to the logical schema,
    later appends write the new name physically, raw-file consumers
    refuse while ops are pending, and compaction materializes them."""
    import os

    import pytest

    from naru_spark.sources.sinks import (
        alter_snapshot_schema,
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        snapshot_stream_source,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(i, i * 10, "x") for i in range(50)], "k int, n_chars int, junk string"
    )
    write_snapshot(df1, path)  # v1: physical (k, n_chars, junk)

    def data_files():
        root = os.path.join(path, "data")
        return sorted(
            f for d in os.listdir(root)
            for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")
        )

    before = data_files()
    v = alter_snapshot_schema(path, rename={"n_chars": "chars"}, drop=["junk"])
    assert v == 2 and data_files() == before  # metadata-only

    got = read_snapshot(spark, path)
    assert set(got.columns) == {"k", "chars"}
    assert got.agg(F.sum("chars")).collect()[0][0] == sum(i * 10 for i in range(50))
    # time travel predates the op: original names
    assert set(read_snapshot(spark, path, version=1).columns) == {
        "k", "n_chars", "junk"}

    # appends after the op write the NEW name physically and are not in
    # the op's pinned set
    df2 = spark.createDataFrame([(100 + i, 7) for i in range(5)], "k int, chars int")
    write_snapshot(df2, path)  # v3
    got = read_snapshot(spark, path)
    assert set(got.columns) == {"k", "chars"} and got.count() == 55

    # RAW-FILE consumers refuse while ops are pending (they would read
    # stale physical names); metadata-only deletes COMPOSE instead
    with pytest.raises(ValueError, match="schema ops"):
        snapshot_stream_source(spark, path)
    with pytest.raises(ValueError, match="schema ops"):
        delete_from_snapshot(spark, path, "k = 1")
    # a typo'd rename/drop/predicate refuses BEFORE the metadata publish
    # (a poisoned manifest would break every later read AND compaction)
    with pytest.raises(ValueError, match="does not resolve"):
        delete_from_snapshot(spark, path, "no_such_col = 1",
                             mode="merge-on-read")
    with pytest.raises(ValueError, match="unknown column"):
        alter_snapshot_schema(path, rename={"nope": "x"})
    with pytest.raises(ValueError, match="collides"):
        alter_snapshot_schema(path, rename={"chars": "k"})
    with pytest.raises(ValueError, match="unknown column"):
        alter_snapshot_schema(path, drop=["n_chars"])  # pre-rename name
    # a merge-on-read delete against the LOGICAL (renamed) schema
    # composes with the pending ops: k=7's chars=70 row is in the
    # pre-rename v1 entry, and the replay renames before filtering
    delete_from_snapshot(spark, path, "chars = 70", mode="merge-on-read")
    assert read_snapshot(spark, path).count() == 54

    # compaction materializes: physical == logical, ops AND deletes
    # cleared, content preserved
    res = compact_snapshot(spark, path, target_files=2)
    import json
    man = json.load(open(os.path.join(
        path, "_manifests", f"v{res['version']}.json")))
    assert man.get("schema_ops", []) == [] and man.get("deletes", []) == []
    got2 = read_snapshot(spark, path)
    assert set(got2.columns) == {"k", "chars"} and got2.count() == 54
    # and copy-on-write deletes work again
    assert delete_from_snapshot(spark, path, "k = 1")["n_deleted"] == 1


def test_partitioned_snapshot_table_and_replace_where(spark, tmp_path):
    """Identity-partitioned snapshot tables (write_snapshot(partition_by=))
    + transactional dynamic partition overwrite (replace_where — Delta
    replaceWhere): per-partition manifest entries with stamped values,
    footer-free partition pruning on reads and deletes, carry-verbatim
    overwrite of exactly the named partitions, the replaceWhere
    constraint and boundary guards, optimistic concurrency, and spec
    preservation through compaction and GC."""
    import json
    import os

    import pytest

    from naru_spark.sources.sinks import (
        SnapshotConflictError,
        compact_snapshot,
        delete_from_snapshot,
        expire_snapshots,
        read_snapshot,
        replace_where,
        write_snapshot,
    )

    def mk(lo, hi, srcs):
        return spark.createDataFrame(
            [(i, srcs[i % len(srcs)]) for i in range(lo, hi)],
            "k int, src string",
        )

    path = str(tmp_path / "t")
    write_snapshot(mk(0, 90, ["a", "b", "c"]), path, partition_by="src")  # v1
    man = json.load(open(os.path.join(path, "_manifests", "v1.json")))
    assert len(man["dirs"]) == 3  # one entry per partition value
    stamps = sorted(
        man["stats"][e]["partition"]["src"] for e in man["dirs"]
    )
    assert stamps == ["a", "b", "c"]

    # footer-free partition pruning: only src=b's entry is planned
    r = read_snapshot(spark, path, partitions={"src": ["b"]})
    assert sorted(x["k"] for x in r.collect()) == [k for k in range(90) if k % 3 == 1]
    assert all("__part_src=b" in f for f in r.inputFiles()), r.inputFiles()
    # the real column is IN the data files (duplicated hive col trick)
    assert set(r.columns) == {"k", "src"}

    write_snapshot(mk(90, 120, ["b", "d"]), path, partition_by="src")   # v2

    # replace src=b across BOTH commits; a, c, d carry verbatim
    new_b = spark.createDataFrame([(1000 + i, "b") for i in range(5)],
                                  "k int, src string")
    info = replace_where(spark, path, new_b, "src", ["b"])              # v3
    assert info == {"version": 3, "partitions_replaced": 2,
                    "entries_carried": 3}, info
    got = sorted(x["k"] for x in read_snapshot(spark, path).collect())
    keep = [k for k in range(90) if k % 3 != 1] + \
           [k for k in range(90, 120) if k % 2 == 1] + \
           [1000 + i for i in range(5)]
    assert got == sorted(keep)
    # time travel predates the overwrite
    assert read_snapshot(spark, path, version=2).count() == 120

    # constraint guard: out-of-set and NULL rows refuse BEFORE writing
    bad = spark.createDataFrame([(1, "zzz")], "k int, src string")
    with pytest.raises(ValueError, match="out-of-set"):
        replace_where(spark, path, bad, "src", ["b"])
    with pytest.raises(ValueError, match="out-of-set"):
        replace_where(
            spark, path,
            spark.createDataFrame([(1, None)], "k int, src string"),
            "src", ["b"],
        )

    # optimistic concurrency: an append lands between read and publish
    stale = 3
    write_snapshot(mk(200, 210, ["a"]), path, partition_by="src")       # v4
    with pytest.raises(SnapshotConflictError):
        replace_where(spark, path, new_b, "src", ["b"], base_version=stale)

    # txn replay: a re-delivered batch returns the recorded commit
    # without re-validating or re-writing anything
    r1 = replace_where(spark, path, new_b, "src", ["b"], txn_id="rw:1")
    r2 = replace_where(spark, path, new_b, "src", ["b"], txn_id="rw:1")
    assert r2["version"] == r1["version"] and r2["partitions_replaced"] == 0

    # partition-pruned COW delete: only src=a entries scanned
    dinfo = delete_from_snapshot(
        spark, path, "src = 'a' and k < 3", partitions={"src": ["a"]}
    )
    assert dinfo["n_deleted"] == 1 and dinfo["entries_pruned"] >= 3, dinfo
    # ...and the table stays replace_where-able: the delete's survivor
    # commit re-stamped its rewrite and its carried split files
    info2 = replace_where(
        spark, path,
        spark.createDataFrame([(5000, "d")], "k int, src string"),
        "src", ["d"],
    )
    assert info2["partitions_replaced"] >= 1

    # boundary guard: an UNPARTITIONED append blocks replace_where...
    write_snapshot(mk(300, 305, ["a"]), path)
    with pytest.raises(ValueError, match="no stamp"):
        replace_where(spark, path, new_b, "src", ["b"])
    # ...and a full compaction under the spec re-stamps the whole table
    compact_snapshot(spark, path, full=True, partition_by="src")
    info3 = replace_where(spark, path, new_b, "src", ["b"])
    assert info3["partitions_replaced"] >= 1
    expected = sorted(
        r_["k"] for r_ in read_snapshot(spark, path).collect()
    )

    # GC identity: partition entries keep their COMMIT DIR alive (the
    # basename-under-data rule) — retention must not eat live subdir
    # entries, and the table reads back identically afterwards
    expire_snapshots(path, keep_last=1)
    assert sorted(
        r_["k"] for r_ in read_snapshot(spark, path).collect()
    ) == expected


def test_snapshot_check_constraints(spark, tmp_path):
    """Delta CHECK constraints: validated against EXISTING rows when
    added (refused if violated), enforced on the just-written bytes of
    every data commit (violating appends/merges refuse cleanly, nothing
    published, no orphan data), SQL NULL-passes semantics, carried
    through metadata-only commits, skipped by content-identical
    rewrites, and droppable to recover."""
    import json
    import os

    import pytest

    from naru_spark.sources.sinks import (
        add_snapshot_constraint,
        compact_snapshot,
        delete_from_snapshot,
        drop_snapshot_constraint,
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k int, v int"), path)        # v1

    # adding a constraint the existing data violates refuses
    with pytest.raises(ValueError, match="violated by existing row"):
        add_snapshot_constraint(spark, path, "v_big", "v >= 100")
    # an unresolvable expression refuses
    with pytest.raises(ValueError, match="does not resolve"):
        add_snapshot_constraint(spark, path, "bad", "no_col > 0")
    v = add_snapshot_constraint(spark, path, "v_nonneg", "v >= 0")      # v2
    assert v == 2

    # a violating append refuses BEFORE publishing, leaving no orphan
    data_root = os.path.join(path, "data")
    dirs_before = sorted(os.listdir(data_root))
    with pytest.raises(ValueError, match="CHECK constraint 'v_nonneg'"):
        write_snapshot(spark.createDataFrame(
            [(100, -5)], "k int, v int"), path)
    assert sorted(os.listdir(data_root)) == dirs_before  # cleaned up
    assert read_snapshot(spark, path).count() == 20

    # a valid append passes and CARRIES the constraint; NULL passes
    write_snapshot(spark.createDataFrame(
        [(100, 7), (101, None)], "k int, v int"), path)                 # v3
    assert read_snapshot(spark, path).count() == 22

    # a violating MERGE refuses (updates are new bytes)
    with pytest.raises(ValueError, match="CHECK constraint 'v_nonneg'"):
        merge_into_snapshot(
            spark, path,
            spark.createDataFrame([(5, -1, "U")], "k int, v int, op string"),
            key="k",
        )

    # content-identical rewrites skip the probe and keep the constraint
    delete_from_snapshot(spark, path, "k = 0")
    compact_snapshot(spark, path, full=True, target_files=1)
    man_dir = os.path.join(path, "_manifests")
    latest = max(int(f[1:-5]) for f in os.listdir(man_dir)
                 if f.startswith("v") and f.endswith(".json"))
    man = json.load(open(os.path.join(man_dir, f"v{latest}.json")))
    assert man["constraints"] == {"v_nonneg": "v >= 0"}

    # re-adding under an existing name refuses (silent weakening)
    with pytest.raises(ValueError, match="already exists"):
        add_snapshot_constraint(spark, path, "v_nonneg", "v >= -100")
    # renaming/dropping a constrained column refuses up front (a stale
    # constraint would refuse every later commit, or re-bind wrongly)
    from naru_spark.sources.sinks import alter_snapshot_schema
    with pytest.raises(ValueError, match="referenced by CHECK"):
        alter_snapshot_schema(path, rename={"v": "w"})
    with pytest.raises(ValueError, match="referenced by CHECK"):
        alter_snapshot_schema(path, drop=["v"])
    alter_snapshot_schema(path, rename={"k": "kk"})  # unconstrained: fine
    compact_snapshot(spark, path, full=True, target_files=1)  # materialize

    # an EMPTY constrained commit has nothing to check and must not crash
    from naru_spark.sources.sinks import replace_where, write_snapshot as _ws
    ppath = str(tmp_path / "p")
    _ws(spark.createDataFrame([(1, "a"), (2, "b")], "k int, src string"),
        ppath, partition_by="src")
    add_snapshot_constraint(spark, ppath, "k_pos", "k > 0")
    empty = spark.createDataFrame([], "k int, src string")
    replace_where(spark, ppath, empty, "src", ["b"])  # clear partition b
    assert sorted(
        r["k"] for r in read_snapshot(spark, ppath).collect()
    ) == [1]

    # drop recovers: the violating append now commits
    drop_snapshot_constraint(path, "v_nonneg")
    write_snapshot(spark.createDataFrame([(102, -5)], "kk int, v int"), path)
    assert read_snapshot(spark, path).where("v = -5").count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        drop_snapshot_constraint(path, "v_nonneg")


def test_read_snapshot_as_of_timestamp(spark, tmp_path):
    """Delta timestampAsOf: every publish stamps commit wall-clock into
    the manifest; read_snapshot(as_of=t) resolves to the LAST version
    committed at-or-before t, and a time before the first commit
    raises."""
    import time

    import pytest

    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    path = str(tmp_path / "t")
    t_before = time.time()
    time.sleep(0.02)
    write_snapshot(spark.range(0, 10).withColumnRenamed("id", "k"), path)
    time.sleep(0.02)
    t_mid = time.time()
    time.sleep(0.02)
    write_snapshot(spark.range(10, 20).withColumnRenamed("id", "k"), path)

    assert read_snapshot(spark, path, as_of=t_mid).count() == 10
    assert read_snapshot(spark, path, as_of=time.time()).count() == 20
    with pytest.raises(ValueError, match="predates every commit"):
        read_snapshot(spark, path, as_of=t_before)
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_snapshot(spark, path, version=1, as_of=t_mid)

    # commit stamps are clamped MONOTONE (Delta's adjustment): a clock
    # step backwards between commits must not let as_of=t surface a
    # version committed after an earlier one
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    v2 = json.load(open(os.path.join(man_dir, "v2.json")))
    future = v2["ts"] + 3600.0
    v2["ts"] = future
    json.dump(v2, open(os.path.join(man_dir, "v2.json"), "w"))
    write_snapshot(spark.range(20, 25).withColumnRenamed("id", "k"), path)
    v3 = json.load(open(os.path.join(man_dir, "v3.json")))
    assert v3["ts"] >= future  # clamped to the predecessor, not wall-clock
    # just before the (future) v2 stamp: v1; ties resolve to the LATEST
    # version at that stamp (Delta timestampAsOf semantics)
    assert read_snapshot(spark, path, as_of=future - 1.0).count() == 10
    assert read_snapshot(spark, path, as_of=future).count() == 25


def test_expire_reclaims_superseded_partition_subdirs(spark, tmp_path):
    """A replace_where supersedes ONE partition's subdirs while their
    siblings stay live — retention must reclaim exactly those subdirs
    (else a daily reprocess-one-partition loop leaks the replaced bytes
    forever), while whole-dir references keep everything."""
    import os

    from naru_spark.sources.sinks import (
        expire_snapshots,
        read_snapshot,
        replace_where,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "abc"[i % 3]) for i in range(60)], "k int, src string"
    )
    write_snapshot(df, path, partition_by="src")                        # v1
    data_root = os.path.join(path, "data")
    v1_dir = os.path.join(data_root, os.listdir(data_root)[0])
    assert os.path.isdir(os.path.join(v1_dir, "__part_src=b"))

    new_b = spark.createDataFrame([(1000, "b")], "k int, src string")
    replace_where(spark, path, new_b, "src", ["b"])                     # v2
    expected = sorted(
        r["k"] for r in read_snapshot(spark, path).collect()
    )

    deleted = expire_snapshots(path, keep_last=1)
    # v1's superseded b subdir reclaimed; live siblings a/c survive
    assert any(d.endswith("__part_src=b") and v1_dir in d for d in deleted), (
        deleted, v1_dir)
    assert not os.path.exists(os.path.join(v1_dir, "__part_src=b"))
    assert os.path.isdir(os.path.join(v1_dir, "__part_src=a"))
    assert os.path.isdir(os.path.join(v1_dir, "__part_src=c"))
    assert sorted(
        r["k"] for r in read_snapshot(spark, path).collect()
    ) == expected


def test_merge_into_snapshot_auto_prune_and_single_eval(spark, tmp_path):
    """MERGE derives its own entry elimination from the changeset's keys
    (exact per-key containment against the stamped min/max — a far-out
    insert key matches NO entry instead of inflating a covering box),
    removing the hand-hint footgun: a too-small hand box silently turns
    a matched update into a duplicate insert. And the changeset is
    evaluated exactly ONCE (eager localCheckpoint) — asserted via a
    side-effecting UDF."""
    import os
    import uuid

    from naru_spark.sources.sinks import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i * 10) for i in range(lo, hi)], "k int, v int"
    )

    path = str(tmp_path / "auto")
    for lo in (0, 100, 200):
        write_snapshot(mk(lo, lo + 100), path)
    changes = spark.createDataFrame(
        [(5, -1, "U"), (7, None, "D"), (900000, -1, "U")],
        "k int, v int, op string",
    )
    info = merge_into_snapshot(spark, path, changes, key="k")
    # entries (100,199) and (200,299) were never scanned, despite the
    # 900000 insert key lying far outside every box
    assert info["entries_pruned"] == 2, info
    got = {r["k"]: r["v"] for r in read_snapshot(spark, path).collect()}
    assert got[5] == -1 and 7 not in got and got[900000] == -1
    assert len(got) == 300  # 300 - 1 delete + 1 insert

    # the footgun: a non-covering HAND box (violating the documented
    # contract) turns the matched update into a duplicate insert...
    upd = spark.createDataFrame([(150, -1, "U")], "k int, v int, op string")
    path2 = str(tmp_path / "hand")
    for lo in (0, 100, 200):
        write_snapshot(mk(lo, lo + 100), path2)
    merge_into_snapshot(spark, path2, upd, key="k", prune={"k": (0, 99)})
    assert read_snapshot(spark, path2).where("k = 150").count() == 2
    # ...while auto-derivation covers the keys by construction
    path3 = str(tmp_path / "auto2")
    for lo in (0, 100, 200):
        write_snapshot(mk(lo, lo + 100), path3)
    merge_into_snapshot(spark, path3, upd, key="k")
    rows = read_snapshot(spark, path3).where("k = 150").collect()
    assert len(rows) == 1 and rows[0]["v"] == -1

    # ONE evaluation: the side-effecting UDF fires once per changeset
    # row even though the changeset feeds the count, the key scan, and
    # the merge as separate jobs
    marker = str(tmp_path / "evals")
    os.makedirs(marker)

    @F.udf("int")
    def tick(k):
        open(os.path.join(marker, uuid.uuid4().hex), "w").close()
        return k

    path4 = str(tmp_path / "once")
    write_snapshot(mk(0, 60), path4)
    nd = mk(0, 50).select(
        tick("k").alias("k"), F.lit(-1).alias("v"), F.lit("U").alias("op")
    )
    info4 = merge_into_snapshot(spark, path4, nd, key="k")
    assert info4["n_changes"] == 50
    assert len(os.listdir(marker)) == 50, len(os.listdir(marker))
    assert read_snapshot(spark, path4).where("v = -1").count() == 50

    # a replayed txn returns the recorded version WITHOUT evaluating the
    # changeset (no new UDF firings) and without committing
    info5 = merge_into_snapshot(spark, path4, nd, key="k", txn_id="cdc:0")
    assert info5["n_changes"] == 50  # first time for this txn: committed
    n_marks = len(os.listdir(marker))
    replay = merge_into_snapshot(spark, path4, nd, key="k", txn_id="cdc:0")
    assert replay["version"] == info5["version"] and replay["n_changes"] is None
    assert len(os.listdir(marker)) == n_marks  # changeset never touched


def test_mor_deletes_compose_with_schema_ops(spark, tmp_path):
    """The two metadata-only planes interleave through one commit-ordered
    log (seq = committing version): rename -> merge-on-read delete whose
    predicate references the POST-rename logical schema -> append ->
    second delete; reads replay per entry in order, compaction
    materializes the whole log, and the aggregate is invariant."""
    import json
    import os

    from naru_spark.sources.sinks import (
        alter_snapshot_schema,
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "k int, grp int"), path)       # v1
    alter_snapshot_schema(path, rename={"grp": "bucket"})                # v2
    delete_from_snapshot(spark, path, "bucket = 0",
                         mode="merge-on-read")                           # v3
    assert read_snapshot(spark, path).count() == 80  # k%5==0 gone
    # append AFTER the delete: bucket=0 rows SURVIVE (sequence semantics)
    # and write the new name physically
    write_snapshot(spark.createDataFrame(
        [(100 + i, 0) for i in range(10)], "k int, bucket int"), path)   # v4
    assert read_snapshot(spark, path).count() == 90
    # a second delete pins ALL entries; the logical schema holds everywhere
    delete_from_snapshot(spark, path, "k >= 105", mode="merge-on-read")  # v5
    got = read_snapshot(spark, path)
    assert set(got.columns) == {"k", "bucket"}
    expect = [k for k in range(100) if k % 5 != 0] + list(range(100, 105))
    assert sorted(r["k"] for r in got.collect()) == expect
    agg = got.agg(F.sum("k").alias("s"), F.sum("bucket").alias("b")).collect()[0]

    # compaction materializes deletes AND ops in one rewrite
    res = compact_snapshot(spark, path, target_files=2)
    man = json.load(open(os.path.join(
        path, "_manifests", f"v{res['version']}.json")))
    assert man.get("deletes", []) == [] and man.get("schema_ops", []) == []
    got2 = read_snapshot(spark, path)
    assert sorted(r["k"] for r in got2.collect()) == expect
    assert got2.agg(F.sum("k").alias("s"),
                    F.sum("bucket").alias("b")).collect()[0] == agg
    # time travel mid-log replays only seq <= 3
    v3 = read_snapshot(spark, path, version=3)
    assert v3.count() == 80 and set(v3.columns) == {"k", "bucket"}


def test_pruned_to_empty_read_keeps_logical_schema(spark, tmp_path):
    """A read whose pruning eliminates every entry must surface the same
    LOGICAL schema as a non-empty read — pending rename ops applied, not
    the physical pre-rename names — or downstream column references and
    unionByName break on the empty result."""
    from naru_spark.sources.sinks import (
        alter_snapshot_schema,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(spark.createDataFrame(
        [(i, i) for i in range(50)], "k int, n_chars int"), path)
    alter_snapshot_schema(path, rename={"n_chars": "chars"})
    empty = read_snapshot(spark, path, prune={"k": (1000, 2000)})
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "chars"}, empty.columns


def test_zorder_compaction_of_emptied_table(spark, tmp_path):
    """compact_snapshot(zorder_by=...) after merge-on-read deletes
    removed every row: the clustering's min/max aggregate sees an empty
    input — it must compact to an empty table like the coalesce path,
    not crash on float(None)."""
    from naru_spark.sources.sinks import (
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    write_snapshot(spark.createDataFrame(
        [(i, i) for i in range(20)], "k int, v int"), path)
    delete_from_snapshot(spark, path, "k >= 0", mode="merge-on-read")
    res = compact_snapshot(spark, path, target_files=2, zorder_by=["k", "v"])
    assert read_snapshot(spark, path, version=res["version"]).count() == 0


def test_merge_into_snapshot_file_pruned(spark, tmp_path):
    """File-pruned MERGE: a changeset whose matched keys live in one
    commit rewrites only that commit's matching files; untouched files
    carry verbatim; pure inserts land in the new dir; a pure-insert
    changeset rewrites nothing."""
    from naru_spark.sources.sinks import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "t")
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i * 10) for i in range(lo, hi)], "k int, v int"
    )
    write_snapshot(mk(0, 100), path)
    write_snapshot(mk(100, 200), path)
    write_snapshot(mk(200, 300), path)
    changes = spark.createDataFrame(
        [(5, None, "D"), (7, 777, "U"), (1000, 1, "U")],  # del, update, insert
        "k int, v int, op string",
    )
    info = merge_into_snapshot(spark, path, changes, key="k",
                               prune={"k": (0, 99)})
    assert info["n_changes"] == 3
    assert info["entries_pruned"] == 2 and info["files_carried"] >= 2, info
    rows = {r["k"]: r["v"] for r in read_snapshot(spark, path).collect()}
    assert 5 not in rows and rows[7] == 777 and rows[1000] == 1
    assert len(rows) == 300  # 300 - 1 del + 1 insert
    assert rows[250] == 2500  # carried commit untouched

    # pure-insert changeset: zero files rewritten
    ins = spark.createDataFrame([(2000, 2, "U")], "k int, v int, op string")
    info2 = merge_into_snapshot(spark, path, ins, key="k")
    assert info2["files_rewritten"] == 0, info2
    assert read_snapshot(spark, path).count() == 301


def test_merge_distributed_containment_past_enumeration_cap(spark, tmp_path):
    """Past ``auto_prune_max_keys`` the keys are NOT collected to the
    driver — the same exact per-entry containment runs as a distributed
    range join against the stamped boxes. Forced here with a tiny cap:
    pruning stays exact (out-of-box entries eliminated, far-out insert
    keys match nothing) and the merge result is identical to the
    enumerated path's."""
    from naru_spark.sources.sinks import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i * 10) for i in range(lo, hi)], "k int, v int"
    )
    path = str(tmp_path / "dist")
    for lo in (0, 100, 200):
        write_snapshot(mk(lo, lo + 100), path)
    changes = spark.createDataFrame(
        [(k, -1, "U") for k in range(100, 160)]
        + [(7_000_000, -1, "U")],  # far-out insert: inside NO box
        "k int, v int, op string",
    )
    info = merge_into_snapshot(spark, path, changes, key="k",
                               auto_prune_max_keys=10)  # force the join
    assert info["entries_pruned"] == 2, info
    got = {r["k"]: r["v"] for r in read_snapshot(spark, path).collect()}
    assert all(got[k] == -1 for k in range(100, 160))
    assert got[7_000_000] == -1 and len(got) == 301
    # a NaN float key defeats min/max containment: nothing is pruned,
    # nothing is lost
    pathf = str(tmp_path / "distf")
    write_snapshot(
        spark.createDataFrame([(1.0, 1), (2.0, 2)], "k double, v int"), pathf
    )
    nan_changes = spark.createDataFrame(
        [(float("nan"), -1, "U"), (1.0, -1, "U")], "k double, v int, op string"
    )
    inf = merge_into_snapshot(spark, pathf, nan_changes, key="k",
                              auto_prune_max_keys=1)
    assert inf["entries_pruned"] == 0, inf
    assert read_snapshot(spark, pathf).where("v = -1").count() == 2


def test_replace_where_replay_reads_latest_txn_map(spark, tmp_path):
    """A replayed replace_where batch must no-op even when the caller
    pins an explicitly STALE base_version: the replay fast-path reads
    the txn map from the LATEST manifest (like merge_into_snapshot),
    so the recorded commit returns instead of a doomed
    SnapshotConflictError."""
    from naru_spark.sources.sinks import (
        read_snapshot,
        replace_where,
        write_snapshot,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i) for i in range(40)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "rw")
    write_snapshot(df, path, partition_by="p")                        # v1
    new_a = df.where("p = 'a'").withColumn("v", F.col("v") + 100)
    info = replace_where(spark, path, new_a, "p", ["a"],
                         txn_id="job:1")                              # v2
    # replay pinned to the PRE-commit base: returns the recorded commit
    replay = replace_where(spark, path, new_a, "p", ["a"],
                           txn_id="job:1", base_version=1)
    assert replay["version"] == info["version"]
    assert replay["partitions_replaced"] == 0
    assert read_snapshot(spark, path).where("v >= 100").count() == 20


def test_empty_partitioned_delta_leaves_no_orphan_dir(spark, tmp_path):
    """replace_where with an EMPTY replacement frame (clearing a
    partition) must not leave an unreferenced data dir behind — the
    husk dir (only _SUCCESS) is removed at write time, so gc_orphans
    finds nothing and the orphan startup check stays green."""
    import os

    from naru_spark.sources.sinks import (
        gc_orphans,
        read_snapshot,
        replace_where,
        write_snapshot,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i) for i in range(40)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "clear")
    write_snapshot(df, path, partition_by="p")                        # v1
    empty = df.where("1 = 0")
    info = replace_where(spark, path, empty, "p", ["a"])              # v2
    assert info["partitions_replaced"] == 1 and info["entries_carried"] == 1
    out = read_snapshot(spark, path)
    assert out.count() == 20 and out.where("p = 'a'").count() == 0
    # no husk dir: every on-disk dir is referenced by some manifest
    assert gc_orphans(path) == []
    data_root = os.path.join(path, "data")
    assert len(os.listdir(data_root)) == 1  # just v1's commit dir


def test_selective_compaction_merges_evolved_schemas(spark, tmp_path):
    """Selective compaction over entries whose schemas EVOLVED
    additively must keep every column (mergeSchema read): the rewrite
    set spans a pre-evolution and a post-evolution commit, and the
    compacted entry carries the union schema with NULLs for
    pre-evolution rows — a plain read would let one footer win
    inference and silently drop the added column's data."""
    from naru_spark.sources.sinks import (
        compact_snapshot,
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "evo")
    write_snapshot(
        spark.createDataFrame([(i, i) for i in range(50)], "k int, v int")
        .repartition(4),
        path,
    )                                                                  # v1
    write_snapshot(
        spark.createDataFrame(
            [(i, i, i * 2) for i in range(50, 100)], "k int, v int, w int"
        ).repartition(4),
        path,
    )                                                                  # v2
    info = compact_snapshot(spark, path, target_files=2)
    assert info["mode"] == "selective", info
    out = read_snapshot(spark, path)
    assert "w" in out.columns
    assert out.count() == 100
    assert out.where("w IS NOT NULL").count() == 50
    assert out.agg(F.sum("w")).collect()[0][0] == sum(i * 2 for i in range(50, 100))


def test_mor_validation_propagates_runtime_errors(spark, tmp_path, monkeypatch):
    """Only ANALYSIS failures mean a bad merge-on-read predicate; a
    runtime failure during validation (manifest I/O, missing files)
    propagates untouched instead of being rewrapped as 'predicate does
    not resolve' with the real traceback suppressed."""
    import pytest

    from naru_spark.sources import sinks

    path = str(tmp_path / "prop")
    sinks.write_snapshot(
        spark.createDataFrame([(1, 1)], "k int, v int"), path
    )
    # a genuinely bad predicate still maps to ValueError...
    with pytest.raises(ValueError, match="does not resolve"):
        sinks.delete_from_snapshot(spark, path, "no_such_col = 1",
                                   mode="merge-on-read")
    # ...but an unrelated runtime error surfaces as itself
    def boom(*a, **k):
        raise RuntimeError("manifest storage unreachable")

    monkeypatch.setattr(sinks, "read_snapshot", boom)
    with pytest.raises(RuntimeError, match="storage unreachable"):
        sinks.delete_from_snapshot(spark, path, "k = 1",
                                   mode="merge-on-read")


def test_maintain_snapshot_occ_retry(spark, tmp_path, monkeypatch):
    """A commit landing between maintenance's plan read and the
    compaction's publish raises SnapshotConflictError — the tick
    re-reads, re-plans against the new head, and re-commits (bounded by
    ``retries``). Injected deterministically: the first replace-mode
    write is preceded by a concurrent append. With retries=0 the
    conflict propagates instead."""
    import pytest

    from naru_spark.sources import sinks

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i) for i in range(lo, hi)], "k int, v int"
    )

    real = sinks.write_snapshot

    def build(path):
        for lo in (0, 100, 200):
            real(mk(lo, lo + 100).repartition(6), path)

    path = str(tmp_path / "occ")
    build(path)
    state = {"fired": 0}

    def racy(df, p, **kw):
        if kw.get("mode") == "replace" and not state["fired"]:
            state["fired"] += 1
            real(mk(300, 310).repartition(2), p)  # concurrent append wins
        return real(df, p, **kw)

    monkeypatch.setattr(sinks, "write_snapshot", racy)
    info = sinks.maintain_snapshot(spark, path, merge_factor=2)
    assert state["fired"] == 1 and info["action"] == "compact", info
    out = sinks.read_snapshot(spark, path)
    # the interleaved append's rows were re-planned in, not superseded
    assert out.count() == 310

    # retries=0: the conflict surfaces to the caller
    path2 = str(tmp_path / "occ0")
    build(path2)
    state["fired"] = 0
    with pytest.raises(sinks.SnapshotConflictError):
        sinks.maintain_snapshot(spark, path2, merge_factor=2, retries=0)


def test_change_data_feed_row_level(spark, tmp_path):
    """Row-level CHANGE DATA FEED through the whole commit vocabulary:
    append (inserts from the data, no change files), MERGE (persisted
    delete / update_preimage / update_postimage / insert rows), COW
    DELETE (persisted deletes), replace_where (reconstructed from the
    manifest diff — through a REPLACE commit), MoR delete (persisted
    matched rows; data plane stays metadata-only), compaction (skipped:
    no row changed). Ranges over pre-cdf row rewrites refuse instead of
    under-reporting; expiry reclaims change planes with their
    manifests."""
    import os

    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(k, "a" if k < 20 else "b", k) for k in range(40)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "cdf")
    sinks.write_snapshot(df, path, partition_by="p", cdf=True)        # v1
    changes = spark.createDataFrame(
        [(1, "a", -1, "U"), (2, "a", -1, "U"), (3, "a", None, "D"),
         (100, "b", 100, "U")],
        "k int, p string, v int, op string",
    )
    sinks.merge_into_snapshot(spark, path, changes, key="k")          # v2
    sinks.delete_from_snapshot(spark, path, "k >= 30 and k < 35")     # v3
    new_a = spark.createDataFrame(
        [(k, "a", k) for k in range(200, 205)], "k int, p string, v int"
    )
    sinks.replace_where(spark, path, new_a, "p", ["a"])               # v4
    sinks.delete_from_snapshot(spark, path, "k % 10 = 9",
                               mode="merge-on-read")                  # v5
    info = sinks.compact_snapshot(spark, path)                        # v6
    assert info["mode"] == "full"  # pending MoR forced materialization

    out = sinks.read_snapshot_changes(spark, path, 0, row_level=True)
    counts = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in out.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n")).collect()
    }
    assert counts == {
        (1, "insert"): 40,
        (2, "delete"): 1, (2, "update_preimage"): 2,
        (2, "update_postimage"): 2, (2, "insert"): 1,
        (3, "delete"): 5,
        (4, "delete"): 19, (4, "insert"): 5,
        (5, "delete"): 2,
    }, counts
    # v5's MoR deletes named exactly the matched rows at delete time
    mor = {r["k"] for r in out.where("_commit_version = 5").collect()}
    assert mor == {29, 39}, mor
    # update images pair up and timestamps ride along
    v2 = out.where("_commit_version = 2 AND _change_type LIKE 'update%'")
    assert v2.where("_commit_timestamp IS NULL").count() == 0
    assert {r["v"] for r in v2.where(
        "_change_type = 'update_postimage'").collect()} == {-1}
    # subranges serve too (consumer following one version at a time)
    assert sinks.read_snapshot_changes(
        spark, path, 3, 4, row_level=True).count() == 24
    # compaction contributed nothing
    assert sinks.read_snapshot_changes(
        spark, path, 5, 6, row_level=True).count() == 0
    # the file-level fast path still refuses across the replace
    with pytest.raises(ValueError, match="replace commit"):
        sinks.read_snapshot_changes(spark, path, 1)

    # a row-rewriting commit made with cdf OFF refuses row-level reads
    path2 = str(tmp_path / "nocdf")
    sinks.write_snapshot(df, path2)
    sinks.delete_from_snapshot(spark, path2, "k = 1")
    with pytest.raises(ValueError, match="without a change plane"):
        sinks.read_snapshot_changes(spark, path2, 0, row_level=True)
    # ...while plain appends serve row-level inserts without cdf
    path3 = str(tmp_path / "appends")
    sinks.write_snapshot(df, path3)
    sinks.write_snapshot(df.withColumn("k", F.col("k") + 100), path3)
    ins = sinks.read_snapshot_changes(spark, path3, 1, row_level=True)
    assert ins.count() == 40
    assert {r["_change_type"] for r in ins.select("_change_type")
            .distinct().collect()} == {"insert"}

    # expiry reclaims the expired versions' change planes
    ch_root = os.path.join(path, "_changes")
    assert len(os.listdir(ch_root)) == 3  # v2 merge, v3 delete, v5 MoR
    sinks.expire_snapshots(path, keep_last=1)
    assert os.listdir(ch_root) == []


def test_partition_scoped_optimize(spark, tmp_path):
    """OPTIMIZE ... WHERE: compaction (and ZORDER re-layout) scoped to
    one partition's entries — out-of-scope entries carry byte-identical
    into the replace commit, the scoped trigger in maintain_snapshot
    weighs only in-scope fragmentation, and a scoped pass over pending
    merge-on-read deletes refuses (materialization is whole-log)."""
    import json
    import os

    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(200)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "opt")
    sinks.write_snapshot(df, path, partition_by="p")                  # v1
    for i in range(3):  # fragment ONLY partition a
        sinks.write_snapshot(
            spark.createDataFrame(
                [(1000 + 100 * i + j, "a", j) for j in range(40)],
                "k int, p string, v int",
            ).repartition(5),
            path,
            partition_by="p",
        )
    man_dir = os.path.join(path, "_manifests")
    with open(os.path.join(man_dir, "v4.json")) as fh:
        man4 = json.load(fh)
    b_entries = [e for e in man4["dirs"] if e.endswith("__part_p=b")]
    assert len(b_entries) == 1
    info = sinks.compact_snapshot(
        spark, path, partitions={"p": ["a"]}, zorder_by=["k"]
    )
    assert info["mode"] == "selective" and info["entries_carried"] == 1, info
    with open(os.path.join(man_dir, f"v{info['version']}.json")) as fh:
        man5 = json.load(fh)
    # partition b's entry carried VERBATIM (same path string, same bytes)
    assert b_entries[0] in man5["dirs"]
    a_entries = [e for e in man5["dirs"] if e != b_entries[0]]
    # the rewrite re-committed under the partition spec (stamps intact)
    assert all(
        man5["stats"][e]["partition"] == {"p": "a"} for e in a_entries
    ), man5["stats"]
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 200 + 120
    assert out.where("p = 'b'").count() == 100
    # scoped maintenance: partition a is compact now -> noop; fragment it
    # again and the scoped tick fires while an UNSCOPED tick with the
    # same thresholds would also see partition b's big entry
    res = sinks.maintain_snapshot(spark, path, merge_factor=2,
                                  partitions={"p": ["a"]})
    assert res["action"] == "noop", res
    for i in range(3):
        sinks.write_snapshot(
            spark.createDataFrame(
                [(2000 + 100 * i + j, "a", j) for j in range(40)],
                "k int, p string, v int",
            ).repartition(5),
            path,
            partition_by="p",
        )
    res2 = sinks.maintain_snapshot(spark, path, merge_factor=2,
                                   partitions={"p": ["a"]})
    assert res2["action"] == "compact", res2
    # pending MoR delete: scoped pass refuses
    sinks.delete_from_snapshot(spark, path, "v = 7", mode="merge-on-read")
    with pytest.raises(ValueError, match="partition-scoped compaction"):
        sinks.compact_snapshot(spark, path, partitions={"p": ["a"]})


def test_bloom_composes_with_partition_spec(spark, tmp_path):
    """partition_by + bloom_key on one table: per-partition-entry
    sidecars (commit-prefixed names, no collisions across commits),
    composed DELETE pruning, replace_where re-stamping fresh sidecars
    on the replacement partitions, and retention reclaiming a
    superseded partition subdir's sidecar with it."""
    import os

    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(100)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "bp")
    sinks.write_snapshot(df, path, partition_by="p", bloom_key="k")   # v1
    sinks.write_snapshot(
        df.withColumn("k", F.col("k") + 1000), path,
        partition_by="p", bloom_key="k",
    )                                                                  # v2
    blooms = sorted(os.listdir(os.path.join(path, "_blooms")))
    assert len(blooms) == 4  # 2 commits x 2 partition entries
    assert all(".__part_p=" in b for b in blooms)
    # composed pruning: partition identity drops the 2 'b' entries,
    # blooms drop v2's 'a' entry (its keys are 1000+)
    info = sinks.delete_from_snapshot(
        spark, path, "k IN (1, 3)",
        partitions={"p": ["a"]}, prune_keys={"k": [1, 3]},
    )
    assert info["n_deleted"] == 2
    assert info["entries_pruned"] == 3 and info["entries_scanned"] == 1, info
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 198
    # replace_where re-stamps a fresh bloom on the replacement partition
    new_b = spark.createDataFrame(
        [(5000 + k, "b", k) for k in range(10)], "k int, p string, v int"
    )
    sinks.replace_where(spark, path, new_b, "p", ["b"])
    pruned = sinks.read_snapshot(spark, path, partitions={"p": ["b"]},
                                 prune_keys={"k": [5003]})
    files = pruned.inputFiles()
    assert files and all("__part_p=b" in f for f in files)
    assert pruned.where("k = 5003").count() == 1
    # retention reclaims superseded 'b' subdirs AND their sidecars
    before = set(os.listdir(os.path.join(path, "_blooms")))
    sinks.expire_snapshots(path, keep_last=1)
    after = set(os.listdir(os.path.join(path, "_blooms")))
    assert after < before  # superseded partition sidecars died
    # the live composed read still works post-retention
    assert sinks.read_snapshot(spark, path).count() == 108


def test_multi_column_partition_spec(spark, tmp_path):
    """Iceberg-style multi-field identity spec: partition_by=["d","s"]
    stamps one manifest entry per LEAF dir with one key per column;
    pruning composes per-column; replace_where takes a composite
    predicate (conjunction) or a subset-column predicate and re-commits
    under the FULL spec; rewrites (delete survivors, compaction) keep
    the multi-column spec."""
    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(k, f"d{k % 2}", f"s{k % 3}", k) for k in range(120)],
        "k int, d string, s string, v int",
    )
    path = str(tmp_path / "mc")
    sinks.write_snapshot(df, path, partition_by=["d", "s"])           # v1
    import json
    import os

    with open(os.path.join(path, "_manifests", "v1.json")) as fh:
        man = json.load(fh)
    assert len(man["dirs"]) == 6  # 2 x 3 leaf cells
    assert all(
        set(man["stats"][e]["partition"]) == {"d", "s"}
        for e in man["dirs"]
    )
    # per-column pruning composes: one cell plans one entry
    pruned = sinks.read_snapshot(
        spark, path, partitions={"d": ["d0"], "s": ["s1"]}
    )
    files = pruned.inputFiles()
    assert files and all(
        "__part_d=d0" in f and "__part_s=s1" in f for f in files
    )
    # composite replace: exactly the (d0, s1) cell
    new_cell = spark.createDataFrame(
        [(1000 + k, "d0", "s1", k) for k in range(5)],
        "k int, d string, s string, v int",
    )
    info = sinks.replace_where(spark, path, new_cell,
                               {"d": ["d0"], "s": ["s1"]})
    assert info["partitions_replaced"] == 1 and info["entries_carried"] == 5
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 120 - 20 + 5  # the d0/s1 cell held 20 rows
    assert out.where("d = 'd0' AND s = 's1'").count() == 5
    # subset-column replace: one d value across ALL s cells
    new_d1 = spark.createDataFrame(
        [(2000 + k, "d1", f"s{k % 3}", k) for k in range(9)],
        "k int, d string, s string, v int",
    )
    info2 = sinks.replace_where(spark, path, new_d1, {"d": ["d1"]})
    assert info2["partitions_replaced"] == 3, info2
    out2 = sinks.read_snapshot(spark, path)
    assert out2.where("d = 'd1'").count() == 9
    # the replacement re-committed under the FULL spec: another
    # composite replace still finds every entry stamped on both columns
    with open(os.path.join(
        path, "_manifests", f"v{info2['version']}.json"
    )) as fh:
        man3 = json.load(fh)
    assert all(
        set(man3["stats"][e]["partition"]) == {"d", "s"}
        for e in man3["dirs"]
    )
    # an out-of-conjunction row refuses
    with pytest.raises(ValueError, match="out-of-set"):
        sinks.replace_where(spark, path, new_cell, {"d": ["d1"]})
    # a predicate column outside the spec refuses
    with pytest.raises(ValueError, match="outside the table's partition"):
        sinks.replace_where(spark, path, new_cell, {"v": [1]})
    # a COW delete's survivors re-commit under the multi-column spec
    sinks.delete_from_snapshot(spark, path, "k = 1000")
    with open(os.path.join(
        path, "_manifests",
        f"v{sinks._latest_version(os.path.join(path, '_manifests'))}.json",
    )) as fh:
        man4 = json.load(fh)
    assert all(
        set(man4["stats"][e]["partition"]) == {"d", "s"}
        for e in man4["dirs"]
    ), man4["stats"]
    # 120 - 20 (d0/s1 cell) + 5 - 60 (all of d1) + 9 - 1 (the delete)
    assert sinks.read_snapshot(spark, path).count() == 53


def test_delete_auto_prune_from_condition(spark, tmp_path):
    """DELETE derives its own entry elimination from the WHERE string
    (min/max boxes, partition values, bloom keys — covering by
    construction), so a plain `DELETE WHERE k <= …` on a range-
    clustered table or `WHERE p = … AND k IN (…)` on a partitioned+
    bloomed table prunes with NO caller hints; unparseable conditions
    (OR) scan everything but stay correct."""
    from naru_spark.sources import sinks
    from naru_spark.sources.sinks import _condition_prune_hints

    # parser guardrails: conjunctions parse, anything else derives None
    assert _condition_prune_hints("k <= 100")["prune"] == {"k": (-float("inf"), 100)}
    assert _condition_prune_hints("k = 1 OR k = 2") is None
    assert _condition_prune_hints("NOT k = 1") is None
    assert _condition_prune_hints("k % 10 = 9") is None
    assert _condition_prune_hints("substr(s, 1) = 'a'") is None
    got = _condition_prune_hints("p = 'a' AND k IN (3, 7)")
    assert got["partitions"] == {"p": ["a"], "k": ["3", "7"]}
    assert got["keys"]["k"] == [3, 7]

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i * 10) for i in range(lo, hi)], "k int, v int"
    )
    # range-committed table: a one-sided range hits ONE entry, no hints
    path = str(tmp_path / "auto_box")
    for lo in (0, 100, 200):
        sinks.write_snapshot(mk(lo, lo + 100), path)
    info = sinks.delete_from_snapshot(spark, path, "k <= 50")
    assert info["entries_pruned"] == 2 and info["n_deleted"] == 51, info
    assert sinks.read_snapshot(spark, path).count() == 249

    # partitioned + bloomed table: equality + IN composes all three
    # hint planes automatically
    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(100)],
        "k int, p string, v int",
    )
    path2 = str(tmp_path / "auto_comp")
    sinks.write_snapshot(df, path2, partition_by="p", bloom_key="k")
    sinks.write_snapshot(df.withColumn("k", F.col("k") + 1000), path2,
                         partition_by="p", bloom_key="k")
    info2 = sinks.delete_from_snapshot(spark, path2,
                                       "p = 'a' AND k IN (3, 7)")
    assert info2["n_deleted"] == 2, info2
    # partition identity drops both 'b' entries; box+bloom drop v2's 'a'
    assert info2["entries_pruned"] == 3 and info2["entries_scanned"] == 1, info2

    # an OR condition derives nothing but deletes correctly
    info3 = sinks.delete_from_snapshot(spark, path2, "k = 9 OR k = 11")
    assert "entries_pruned" not in info3 and info3["n_deleted"] == 2, info3
    assert sinks.read_snapshot(spark, path2).count() == 196

    # MoR + cdf: the change-plane scan reuses the derivation (content
    # check only — the pruning there is a plan hint)
    path3 = str(tmp_path / "auto_mor")
    sinks.write_snapshot(df, path3, partition_by="p", cdf=True)
    sinks.delete_from_snapshot(spark, path3, "p = 'a' AND k <= 9",
                               mode="merge-on-read")
    ch = sinks.read_snapshot_changes(spark, path3, 1, row_level=True)
    assert ch.count() == 5 and ch.where("p = 'a'").count() == 5


def test_cdf_and_delete_across_schema_evolution(spark, tmp_path):
    """Additive schema evolution composes with the row-mutation paths:
    a COW DELETE whose condition names a later-added column resolves
    over the evolved scan (pre-evolution files read NULL — NULL never
    matches, so their rows survive), its CDF change rows carry the
    evolved column, and the row-level feed unions the epochs by name
    (pre-evolution inserts surface NULL for the added column)."""
    from naru_spark.sources import sinks

    path = str(tmp_path / "evo_cdf")
    sinks.write_snapshot(
        spark.createDataFrame([(i, i) for i in range(40)], "k int, v int"),
        path, cdf=True,
    )                                                                  # v1
    sinks.write_snapshot(
        spark.createDataFrame(
            [(i, i, i * 2) for i in range(40, 80)], "k int, v int, w int"
        ),
        path,
    )                                                                  # v2
    info = sinks.delete_from_snapshot(spark, path, "w >= 150")         # v3
    # w >= 150 -> k in 75..79; v1 rows have w NULL and all survive
    assert info["n_deleted"] == 5, info
    out = sinks.read_snapshot(spark, path, merge_schema=True)
    assert out.count() == 75
    ch = sinks.read_snapshot_changes(spark, path, 0, row_level=True)
    assert ch.where("_commit_version = 3").count() == 5
    assert ch.where(
        "_commit_version = 3 AND _change_type = 'delete' AND w >= 150"
    ).count() == 5
    # pre-evolution insert rows union by name: w is NULL
    assert ch.where("_commit_version = 1 AND w IS NULL").count() == 40


def test_apply_cdf_to_aggregate_sign_algebra(spark, tmp_path):
    """The IVM fold's sign algebra: updates are count-neutral and
    sum-exact, deletes subtract, inserts add, a group emptied by a
    replace commit DROPS from the view (exactly a recompute), and the
    fold over every commit type converges to the final table state."""
    from naru_spark.sources import sinks
    from naru_spark.sources.sinks import apply_cdf_to_aggregate

    df = spark.createDataFrame(
        [(k, "a" if k < 10 else "b", k) for k in range(20)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "ivm")
    sinks.write_snapshot(df, path, partition_by="p", cdf=True)        # v1
    changes = spark.createDataFrame(
        [(1, "a", 100, "U"), (2, "a", None, "D"), (50, "b", 7, "U")],
        "k int, p string, v int, op string",
    )
    sinks.merge_into_snapshot(spark, path, changes, key="k")          # v2
    # clear partition a entirely: its group must DROP from the view
    sinks.replace_where(spark, path, df.where("1 = 0"), "p", ["a"])   # v3
    view = (
        sinks.read_snapshot(spark, path, version=1)
        .groupBy("p")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
    )
    for v in (2, 3):
        ch = sinks.read_snapshot_changes(spark, path, v - 1, v,
                                         row_level=True)
        view = apply_cdf_to_aggregate(view, ch, keys=["p"], sums=["v"])
    got = {r["p"]: (r["n"], r["sum_v"]) for r in view.collect()}
    expect = {
        r["p"]: (r["n"], r["s"])
        for r in sinks.read_snapshot(spark, path).groupBy("p")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    assert got == expect, (got, expect)
    assert "a" not in got  # the emptied group dropped
    # update at v2: count-neutral, sum moved by the value delta (+99 -2... )
    # b group: 10 rows (10..19) + insert k=50 v=7 = 11 rows, sum 145+7+... 
    assert got["b"][0] == 11


def test_round12_robustness_guards(spark, tmp_path):
    """Expired CDF ranges raise a clear retention error; VACUUM dry-run
    reports exactly what a real pass deletes while touching nothing;
    ZORDER refuses non-numeric cluster columns instead of silently
    landing every row in bucket 0."""
    import os

    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(40)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "guards")
    sinks.write_snapshot(df, path, cdf=True)                          # v1
    sinks.delete_from_snapshot(spark, path, "k = 1")                  # v2
    sinks.write_snapshot(df.withColumn("k", F.col("k") + 100), path)  # v3

    # dry run: reports the doomed dirs, deletes nothing
    planned = sinks.expire_snapshots(path, keep_last=1, dry_run=True)
    assert planned, planned
    assert all(os.path.exists(p) for p in planned)
    assert os.path.exists(os.path.join(path, "_manifests", "v1.json"))
    real = sinks.expire_snapshots(path, keep_last=1)
    assert sorted(real) == sorted(planned)
    assert not any(os.path.exists(p) for p in real)

    # CDF range starting at an expired version raises a clear error
    with pytest.raises(ValueError, match="not retained"):
        sinks.read_snapshot_changes(spark, path, 1, row_level=True)

    # ZORDER on a string column CLUSTERS via sampled boundaries
    # (content-invariant)...
    n_before = sinks.read_snapshot(spark, path).count()
    info = sinks.compact_snapshot(spark, path, zorder_by=["p", "k"])
    assert info["mode"] == "full"
    assert sinks.read_snapshot(spark, path).count() == n_before
    # ...while genuinely non-orderable types still refuse loudly
    path2 = str(tmp_path / "guards2")
    sinks.write_snapshot(
        spark.createDataFrame([(1, ["x"]), (2, ["y"])],
                              "k int, tags array<string>"),
        path2,
    )
    with pytest.raises(ValueError, match="non-orderable"):
        sinks.compact_snapshot(spark, path2, zorder_by=["tags"])


def test_deletion_vector_lifecycle(spark, tmp_path):
    """Positional deletion vectors end-to-end: a DV delete rewrites ZERO
    data files yet every read (plain, pruned, time-travel, grouped with
    schema ops absent) drops exactly the matched rows; DV deletes STACK
    without re-counting; appends after a DV commit are unaffected and
    carry the plane; CDF reports the matched rows; compaction
    materializes and clears; the stream source and partial rewrites
    refuse while vectors are pending; expiry reclaims the sidecars."""
    import json
    import os

    import pytest

    from naru_spark.sources import sinks

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i * 10) for i in range(lo, hi)], "k int, v int"
    )
    path = str(tmp_path / "dv")
    for lo in (0, 100):
        sinks.write_snapshot(mk(lo, lo + 100), path, cdf=True)        # v1 v2
    info = sinks.delete_from_snapshot(spark, path, "k % 10 = 3",
                                      mode="deletion-vector")         # v3
    assert info["n_deleted"] == 20 and info["files_rewritten"] == 0, info
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 180 and out.where("k % 10 = 3").count() == 0
    # no data file changed: v2's dirs are byte-identical (same entries)
    with open(os.path.join(path, "_manifests", "v3.json")) as fh:
        man3 = json.load(fh)
    with open(os.path.join(path, "_manifests", "v2.json")) as fh:
        man2 = json.load(fh)
    assert man3["dirs"] == man2["dirs"]
    # time travel: the pre-delete version still shows everything
    assert sinks.read_snapshot(spark, path, version=2).count() == 200
    # stacking: an overlapping second DV delete counts only NEW rows
    info2 = sinks.delete_from_snapshot(spark, path, "k % 5 = 3",
                                       mode="deletion-vector")        # v4
    assert info2["n_deleted"] == 20, info2  # k%5=3 is 40 rows, 20 were gone
    assert sinks.read_snapshot(spark, path).count() == 160
    # CDF reported exactly the per-commit matched rows
    ch = sinks.read_snapshot_changes(spark, path, 2, row_level=True)
    counts = {
        r["_commit_version"]: r["n"]
        for r in ch.groupBy("_commit_version")
        .agg(F.count("*").alias("n")).collect()
    }
    assert counts == {3: 20, 4: 20}, counts
    assert {r["_change_type"] for r in ch.select("_change_type")
            .distinct().collect()} == {"delete"}
    # appends after DV commits are unaffected; the plane carries
    sinks.write_snapshot(mk(200, 210), path)                          # v5
    assert sinks.read_snapshot(spark, path).count() == 170
    # raw-file consumers refuse while vectors are pending (DML no longer
    # does — COW DELETE/UPDATE/MERGE now COMPOSE with pending vectors,
    # covered by test_dv_aware_dml_composition)
    with pytest.raises(ValueError, match="deletion vector"):
        sinks.snapshot_stream_source(spark, path)
    # compaction materializes the vectors and clears the plane (all
    # entries here are under-sized, so the DV-aware SELECTIVE pass
    # rewrites them all — no full-table materialization forced)
    cinfo = sinks.compact_snapshot(spark, path)
    assert cinfo["entries_carried"] == 0, cinfo
    with open(os.path.join(
        path, "_manifests", f"v{cinfo['version']}.json"
    )) as fh:
        man = json.load(fh)
    assert "dvs" not in man
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 170
    assert out.where("k % 10 = 3 AND k < 200").count() == 0
    # stats/history surface the plane while it was pending
    hist = {h["version"]: h["n_dvs"] for h in sinks.snapshot_history(path)}
    assert hist[4] == 2 and hist[cinfo["version"]] == 0, hist
    # expiry reclaims the dv sidecars with their manifests
    assert os.path.isdir(os.path.join(path, "_dv"))
    planned = sinks.expire_snapshots(path, keep_last=1, dry_run=True)
    assert any("_dv" in p for p in planned)
    sinks.expire_snapshots(path, keep_last=1)
    assert os.listdir(os.path.join(path, "_dv")) == []


def test_update_snapshot_semantics(spark, tmp_path):
    """UPDATE ... SET: simultaneous assignment against the PRE-update
    row (a=b, b=a swaps), a SET changing a condition column doesn't
    flip matching mid-flight, NULL conditions leave rows untouched, CDF
    persists exact pre/post pairs, and an UPDATE introducing a CHECK
    violation refuses with nothing published."""
    import pytest

    from naru_spark.sources import sinks

    path = str(tmp_path / "upd")
    sinks.write_snapshot(
        spark.createDataFrame(
            [(1, 10, 20), (2, 30, 40), (3, None, 5)], "k int, a int, b int"
        ),
        path, cdf=True,
    )
    # swap on matched rows; the NULL-condition row (a IS NULL -> NULL
    # for k=3's `a < 25`... use explicit condition) stays untouched
    info = sinks.update_snapshot(spark, path, "a < 25",
                                 {"a": "b", "b": "a"})
    assert info["n_updated"] == 1, info  # k=1 only; k=3's NULL a: no match
    got = {r["k"]: (r["a"], r["b"])
           for r in sinks.read_snapshot(spark, path).collect()}
    assert got[1] == (20, 10) and got[2] == (30, 40) and got[3] == (None, 5)
    # a SET that changes the condition column: matching decided on the
    # pre-image (n stays 1 even though the new a no longer matches)
    info2 = sinks.update_snapshot(spark, path, "a = 20", {"a": "a + 100"})
    assert info2["n_updated"] == 1
    assert sinks.read_snapshot(spark, path).where("a = 120").count() == 1
    # CDF: exact pre/post pairs for both updates
    ch = sinks.read_snapshot_changes(spark, path, 1, row_level=True)
    pairs = {(r["_commit_version"], r["_change_type"], r["a"])
             for r in ch.collect()}
    assert (2, "update_preimage", 10) in pairs
    assert (2, "update_postimage", 20) in pairs
    assert (3, "update_preimage", 20) in pairs
    assert (3, "update_postimage", 120) in pairs
    # constraints: an UPDATE that would violate refuses, nothing commits
    sinks.add_snapshot_constraint(spark, path, "b_pos", "b >= 0")
    v_before = sinks.snapshot_stats(path)["version"]
    with pytest.raises(ValueError, match="b_pos"):
        sinks.update_snapshot(spark, path, "k = 2", {"b": "-1"})
    assert sinks.snapshot_stats(path)["version"] == v_before
    # unknown SET column refuses
    with pytest.raises(ValueError, match="unknown column"):
        sinks.update_snapshot(spark, path, "k = 1", {"zz": "1"})


def test_zorder_string_clustering_skips(spark, tmp_path):
    """String ZORDER columns cluster via sampled order-preserving
    boundaries: after the rewrite, a narrow string-range probe skips
    most files on footer min/max stats alone (an unclustered layout
    intersects every file), and content is invariant."""
    from naru_spark.sources.sinks import file_skip_fraction, zorder_write

    df = spark.createDataFrame(
        [(f"word_{i % 20:02d}", i, i % 7) for i in range(20_000)],
        "s string, k int, v int",
    ).repartition(16)  # scatter so the input layout is unclustered
    path = str(tmp_path / "zs")
    zorder_write(df, path, ["s", "k"], n_files=10)
    out = spark.read.parquet(path)
    assert out.count() == 20_000
    # a 2-of-20-words band: the clustered layout confines it to fewer
    # files than the scattered input (where EVERY file holds all words)
    raw_path = str(tmp_path / "raw")
    df.repartition(10).write.parquet(raw_path)
    raw_matching, raw_total = file_skip_fraction(
        spark, raw_path, {"s": ("word_05", "word_06")}
    )
    assert raw_matching == raw_total == 10  # unclustered: no skipping
    matching, total = file_skip_fraction(
        spark, path, {"s": ("word_05", "word_06")}
    )
    assert total == 10
    # the interleave shares bits with k (and the range-exchange's
    # boundary sampling adds run-to-run layout jitter), so assert the
    # robust property: the clustered layout SKIPS files where the
    # scattered one cannot skip any
    assert matching < raw_matching, (matching, raw_matching)
    assert matching <= 8, (matching, total)


def test_branch_write_audit_publish(spark, tmp_path):
    """Branch refs: a branch is an in-tree zero-copy fork that evolves
    independently; publish atomically fast-forwards main to the branch
    state; the non-fast-forward guard refuses when main advanced."""
    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "k int, g int")
    path = str(tmp_path / "t")
    sinks.write_snapshot(df, path)

    bpath = sinks.create_branch(path, "staging")
    assert bpath == sinks.branch_path(path, "staging")
    with pytest.raises(ValueError, match="already exists"):
        sinks.create_branch(path, "staging")
    with pytest.raises(ValueError, match="invalid"):
        sinks.create_branch(path, "../escape")
    # fork is zero-copy-equal; branch append is invisible to main
    assert sinks.read_snapshot(spark, bpath).count() == 30
    sinks.write_snapshot(
        df.withColumn("k", F.col("k") + 100).filter(F.col("g") == 0), bpath
    )
    assert sinks.read_snapshot(spark, bpath).count() == 40
    assert sinks.read_snapshot(spark, path).count() == 30
    assert sinks.list_branches(path) == [
        {"name": "staging", "head_version": 2, "fork_version": 1}
    ]
    # publish: main == branch state, one atomic commit
    n = sinks.publish_branch(path, "staging")
    assert n == 2
    main = sinks.read_snapshot(spark, path)
    assert main.count() == 40
    assert (
        sorted(r.k for r in main.collect())
        == sorted(r.k for r in sinks.read_snapshot(spark, bpath).collect())
    )
    # pre-publish main stays time-travelable
    assert sinks.read_snapshot(spark, path, version=1).count() == 30
    # non-fast-forward: main advances past a new branch's fork -> refuse
    sinks.create_branch(path, "late")
    sinks.write_snapshot(df.select((F.col("k") + 500).alias("k"), "g"), path)
    with pytest.raises(sinks.SnapshotConflictError, match="non-fast-forward"):
        sinks.publish_branch(path, "late")
    # force replaces the head; intervening commit stays in history
    head = sinks.publish_branch(path, "late", force=True)
    assert sinks.read_snapshot(spark, path).count() == 40  # branch state
    assert sinks.read_snapshot(spark, path, version=head - 1).count() == 70


def test_branch_drop_guard_and_gc_safety(spark, tmp_path):
    """Main's GC never reclaims published branch-owned dirs; drop_branch
    refuses while main references them and succeeds after a main
    compaction localizes the data."""
    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i,) for i in range(20)], "k int")
    path = str(tmp_path / "t")
    sinks.write_snapshot(df, path)
    bpath = sinks.create_branch(path, "b")
    sinks.write_snapshot(df.select((F.col("k") + 100).alias("k")), bpath)
    sinks.publish_branch(path, "b")
    # gc on main: branch-owned published dirs are outside its sweep root
    assert sinks.gc_orphans(path) == []
    assert sinks.read_snapshot(spark, path).count() == 40
    with pytest.raises(ValueError, match="still references"):
        sinks.drop_branch(path, "b")
    # compaction localizes the HEAD, but retained older manifests (the
    # publish commit) still reference branch dirs — the guard protects
    # time travel too, so expiry must release them first
    sinks.compact_snapshot(spark, path, full=True)
    with pytest.raises(ValueError, match="still references"):
        sinks.drop_branch(path, "b")
    sinks.expire_snapshots(path, keep_last=1)
    sinks.drop_branch(path, "b")
    assert sinks.list_branches(path) == []
    assert sinks.read_snapshot(spark, path).count() == 40


def test_branch_tag_named_ref_reads(spark, tmp_path):
    """Ergonomic named-ref selectors: read_snapshot(branch=/tag=) and the
    DataSource's .option("branch"/"tag") resolve the same states as the
    explicit path/version spellings; contradictory selectors refuse."""
    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i,) for i in range(10)], "k int")
    path = str(tmp_path / "t")
    sinks.write_snapshot(df, path)
    sinks.create_tag(path, "first")
    sinks.write_snapshot(df.select((F.col("k") + 10).alias("k")), path)
    bpath = sinks.create_branch(path, "exp")
    sinks.write_snapshot(df.select((F.col("k") + 100).alias("k")), bpath)

    assert sinks.read_snapshot(spark, path, tag="first").count() == 10
    assert sinks.read_snapshot(spark, path, branch="exp").count() == 30
    assert sinks.read_snapshot(spark, path).count() == 20
    with pytest.raises(ValueError, match="mutually exclusive"):
        sinks.read_snapshot(spark, path, tag="first", version=1)
    with pytest.raises(ValueError, match="no branch"):
        sinks.read_snapshot(spark, path, branch="nope")

    # the format-string spelling sees the same states — including WRITES
    # to a branch via .option("branch")
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    def fmt():
        return spark.read.format("naru_snapshot")

    assert fmt().option("tag", "first").load(path).count() == 10
    assert fmt().option("branch", "exp").load(path).count() == 30
    with pytest.raises(Exception, match="mutually exclusive"):
        fmt().option("tag", "first").option("branch", "exp").load(path).count()
    df.select((F.col("k") + 200).alias("k")).write.format(
        "naru_snapshot"
    ).option("branch", "exp").mode("append").save(path)
    assert sinks.read_snapshot(spark, path, branch="exp").count() == 40
    assert sinks.read_snapshot(spark, path).count() == 20  # main untouched
    # a tag is batch-read-only: writes and streams refuse it loudly
    with pytest.raises(Exception, match="BATCH READS only"):
        df.write.format("naru_snapshot").option("tag", "first").mode(
            "append"
        ).save(path)
    with pytest.raises(Exception, match="BATCH READS only"):
        q = (
            spark.readStream.format("naru_snapshot")
            .option("tag", "first")
            .load(path)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "tag_ck"))
            .start()
        )
        # the reader may instantiate asynchronously: surface its error
        try:
            q.awaitTermination(60)
        finally:
            q.stop()


def test_branch_publish_interactions(spark, tmp_path):
    """Second-order interactions of publish with the rest of the plane:
    the file-stream source refuses a branch-backed head (it would
    silently miss the published rows), the drop guard also protects
    SIBLING branches forked after a publish, fork metadata survives
    branch-side retention, and gc_orphans still sweeps a crashed
    writer's orphan when the head is fully branch-backed."""
    import os

    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i,) for i in range(20)], "k int")

    # 1) stream source refuses a branch-backed head, loudly
    p1 = str(tmp_path / "t1")
    sinks.write_snapshot(df, p1)
    sinks.write_snapshot(df.select((F.col("k") + 100).alias("k")),
                         sinks.create_branch(p1, "a"))
    sinks.publish_branch(p1, "a")
    with pytest.raises(ValueError, match="outside its data tree"):
        sinks.snapshot_stream_source(spark, p1)

    # 2) sibling-branch guard: B forks main AFTER A's publish, so B's
    # manifests reference A's dirs even once main localizes + expires
    sinks.create_branch(p1, "b")
    sinks.compact_snapshot(spark, p1, full=True)
    sinks.expire_snapshots(p1, keep_last=1)
    with pytest.raises(ValueError, match="sibling"):
        sinks.drop_branch(p1, "a")
    sinks.drop_branch(p1, "b")
    sinks.drop_branch(p1, "a")  # no sibling left -> clean
    assert sinks.read_snapshot(spark, p1).count() == 40

    # 3) fork metadata survives branch-side retention (v1 expired)
    p2 = str(tmp_path / "t2")
    sinks.write_snapshot(df, p2)
    bpath = sinks.create_branch(p2, "s")
    sinks.write_snapshot(df.select((F.col("k") + 100).alias("k")), bpath)
    sinks.compact_snapshot(spark, bpath, full=True)
    sinks.expire_snapshots(bpath, keep_last=1)
    assert not os.path.exists(os.path.join(bpath, "_manifests", "v1.json"))
    assert sinks.list_branches(p2)[0]["fork_version"] == 1
    sinks.publish_branch(p2, "s")
    assert sinks.read_snapshot(spark, p2).count() == 40

    # 4) gc_orphans on a fully branch-backed head sweeps a real orphan
    # instead of raising the foreign-manifest heuristic
    # head is compacted-local at this point; make it fully branch-backed
    # (publish a branch state, expire the local manifests), THEN plant
    # the orphan — expire_snapshots would otherwise sweep it first
    b2 = sinks.create_branch(p2, "s2")
    sinks.compact_snapshot(spark, b2, full=True)
    sinks.publish_branch(p2, "s2")
    sinks.expire_snapshots(p2, keep_last=1)
    orphan = os.path.join(p2, "data", "v9-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as fh:
        fh.write("x")
    deleted = sinks.gc_orphans(p2)
    assert any(d.endswith("v9-deadbeef") for d in deleted)
    assert sinks.read_snapshot(spark, p2).count() == 40


def test_branch_carries_txn_replay_protection(spark, tmp_path):
    """The WAP streaming loop is crash-safe: a branch inherits main's
    txn idempotence map at fork, advances it with staged batches, and
    publish merges it back — a replayed batch no-ops on the branch AND
    on main after publish."""
    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i,) for i in range(10)], "k int")
    path = str(tmp_path / "t")
    sinks.write_snapshot(df, path, txn_id="ingest:1")
    bpath = sinks.create_branch(path, "s")
    # replaying batch 1 into the branch must NO-OP (map carried at fork)
    sinks.write_snapshot(df, bpath, txn_id="ingest:1")
    assert sinks.read_snapshot(spark, bpath).count() == 10
    sinks.write_snapshot(
        df.select((F.col("k") + 100).alias("k")), bpath, txn_id="ingest:2"
    )
    sinks.publish_branch(path, "s")
    # replaying batch 2 into MAIN must no-op (map merged at publish)
    sinks.write_snapshot(
        df.select((F.col("k") + 100).alias("k")), path, txn_id="ingest:2"
    )
    assert sinks.read_snapshot(spark, path).count() == 20


def test_tags_immutable_named_versions(spark, tmp_path):
    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i,) for i in range(10)], "k int")
    path = str(tmp_path / "t")
    sinks.write_snapshot(df, path)
    sinks.write_snapshot(df.select((F.col("k") + 10).alias("k")), path)
    v = sinks.create_tag(path, "train-run-1", version=1)
    assert v == 1 and sinks.resolve_tag(path, "train-run-1") == 1
    assert sinks.read_snapshot(
        spark, path, version=sinks.resolve_tag(path, "train-run-1")
    ).count() == 10
    with pytest.raises(ValueError, match="immutable"):
        sinks.create_tag(path, "train-run-1", version=2)
    assert sinks.create_tag(path, "head") == 2  # defaults to latest
    assert [t["name"] for t in sinks.list_tags(path)] == ["head", "train-run-1"]
    with pytest.raises(ValueError, match="not retained"):
        sinks.create_tag(path, "nope", version=99)
    with pytest.raises(ValueError, match="no tag"):
        sinks.resolve_tag(path, "missing")


def test_clone_snapshot_gc_safety(spark, tmp_path):
    """A shallow clone's own maintenance never touches the SOURCE's
    files: expire/gc on the clone reclaim only clone-local dirs, the
    clone refuses to overwrite an existing table, and a clone
    compaction localizes the data (after which source retention is
    safe)."""
    import os

    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i, i) for i in range(50)], "k int, v int")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    sinks.write_snapshot(df, src)
    sinks.clone_snapshot(src, dst)
    with pytest.raises(ValueError, match="already a snapshot table"):
        sinks.clone_snapshot(src, dst)
    # clone evolves: append + compact localizes everything
    sinks.write_snapshot(df.withColumn("k", F.col("k") + 100), dst)
    sinks.compact_snapshot(spark, dst, full=True)
    # clone retention: reclaims only clone-local dirs; source intact
    src_dirs = set(os.listdir(os.path.join(src, "data")))
    deleted = sinks.expire_snapshots(dst, keep_last=1)
    assert deleted and all(p.startswith(dst) for p in deleted)
    assert set(os.listdir(os.path.join(src, "data"))) == src_dirs
    assert sinks.gc_orphans(dst) == []
    assert sinks.read_snapshot(spark, dst).count() == 100
    assert sinks.read_snapshot(spark, src).count() == 50


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    """The third MERGE clause: base rows absent from the changeset drop
    (target == source afterwards), matched rows update, unmatched
    changeset rows insert — in ONE commit; plain merges keep base-only
    rows as before."""
    from naru_spark.operators.merge import merge_into
    from naru_spark.sources import sinks

    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k int, v int"
    )
    src = spark.createDataFrame(
        [(2, -2, "U"), (4, -4, "U")], "k int, v int, op string"
    )
    # operator level: sync drops k=1, k=3; updates k=2; inserts k=4
    got = {r["k"]: r["v"] for r in merge_into(
        base, src, key="k", not_matched_by_source="delete").collect()}
    assert got == {2: -2, 4: -4}, got
    # classic upsert unchanged
    got2 = {r["k"]: r["v"] for r in merge_into(base, src, key="k").collect()}
    assert got2 == {1: 10, 2: -2, 3: 30, 4: -4}, got2
    # table level: one replace commit, no pruning by construction
    path = str(tmp_path / "sync")
    sinks.write_snapshot(base, path)
    sinks.write_snapshot(
        spark.createDataFrame([(10, 100)], "k int, v int"), path
    )
    info = sinks.merge_into_snapshot(
        spark, path, src, key="k", not_matched_by_source="delete"
    )
    assert info["entries_pruned"] == 0 and info["files_carried"] == 0, info
    got3 = {r["k"]: r["v"]
            for r in sinks.read_snapshot(spark, path).collect()}
    assert got3 == {2: -2, 4: -4}, got3


def test_update_moves_rows_across_partitions(spark, tmp_path):
    """UPDATE SET on the PARTITION column itself: rewritten rows land in
    their new partition's subdirs (stamps recomputed from the new
    values), partition-pruned reads see the moved rows, and
    replace_where's every-entry-stamped invariant still holds after."""
    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(k, "a" if k < 10 else "b", k) for k in range(20)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "mv")
    sinks.write_snapshot(df, path, partition_by="p")
    info = sinks.update_snapshot(spark, path, "k < 5", {"p": "'b'"})
    assert info["n_updated"] == 5, info
    pruned_b = sinks.read_snapshot(spark, path, partitions={"p": ["b"]})
    assert all("__part_p=b" in f for f in pruned_b.inputFiles())
    assert pruned_b.where("p = 'b'").count() == 15
    assert sinks.read_snapshot(spark, path).where("p = 'a'").count() == 5
    # the spec survived: replace_where still finds every entry stamped
    new_a = spark.createDataFrame([(100, "a", 0)], "k int, p string, v int")
    r = sinks.replace_where(spark, path, new_a, "p", ["a"])
    assert r["partitions_replaced"] >= 1
    assert sinks.read_snapshot(spark, path).where("p = 'a'").count() == 1


def test_read_snapshot_where_auto_skipping(spark, tmp_path):
    """read_snapshot_where: Delta-style data skipping straight from the
    WHERE string — entry elimination on boxes + partition values +
    bloom keys with zero hint plumbing, the real filter still applied;
    unparseable conditions scan unpruned but stay correct."""
    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k) for k in range(100)],
        "k int, p string, v int",
    )
    path = str(tmp_path / "rsw")
    sinks.write_snapshot(df, path, partition_by="p", bloom_key="k")
    sinks.write_snapshot(df.withColumn("k", F.col("k") + 1000), path,
                         partition_by="p", bloom_key="k")
    out = sinks.read_snapshot_where(spark, path, "p = 'a' AND k IN (3, 7)")
    # composed elimination: only v1's 'a' entry is planned
    files = out.inputFiles()
    assert files and all("__part_p=a" in f for f in files)
    assert len({f.rsplit("/", 2)[1] for f in files}) == 1
    assert {r["k"] for r in out.collect()} == {3, 7}
    # range condition: box pruning, exact rows
    out2 = sinks.read_snapshot_where(spark, path, "k >= 1050")
    assert out2.count() == 50 and len(out2.inputFiles()) < len(
        sinks.read_snapshot(spark, path).inputFiles())
    # unparseable: full scan, correct rows
    out3 = sinks.read_snapshot_where(spark, path, "k = 3 OR k = 1003")
    assert out3.count() == 2


def test_cdf_timestamp_ranges(spark, tmp_path):
    """Timestamp-bounded change ranges resolve to commit versions via
    the stamped wall-clocks: from_ts serves everything committed
    strictly after it, to_ts caps the range, bounds are exclusive with
    their version twins, and a from_ts before the first commit means
    'from the beginning'."""
    import json
    import os

    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame([(i, i) for i in range(30)], "k int, v int")
    path = str(tmp_path / "tsr")
    for lo in (0, 100, 200):
        sinks.write_snapshot(
            df.withColumn("k", F.col("k") + lo), path
        )
    man_dir = os.path.join(path, "_manifests")
    ts = {}
    for v in (1, 2, 3):
        with open(os.path.join(man_dir, f"v{v}.json")) as fh:
            ts[v] = json.load(fh)["ts"]
    # from v1's stamp: v2+v3's rows
    out = sinks.read_snapshot_changes(spark, path, from_ts=ts[1],
                                      row_level=True)
    assert out.count() == 60
    # capped at v2's stamp: only v2's rows
    out2 = sinks.read_snapshot_changes(spark, path, from_ts=ts[1],
                                       to_ts=ts[2], row_level=True)
    assert out2.count() == 30
    assert {r["_commit_version"] for r in
            out2.select("_commit_version").distinct().collect()} == {2}
    # before the first commit: everything
    out3 = sinks.read_snapshot_changes(spark, path, from_ts=ts[1] - 10,
                                       row_level=True)
    assert out3.count() == 90
    # file-level path works with ts bounds too
    assert sinks.read_snapshot_changes(spark, path, from_ts=ts[2]).count() == 30
    with pytest.raises(ValueError, match="mutually exclusive"):
        sinks.read_snapshot_changes(spark, path, from_version=1,
                                    from_ts=ts[1])


def test_r13_advice_fixes(spark, tmp_path):
    """The four round-12 ADVICE items, pinned: (1) auto-derived prune
    hints are TYPE-CHECKED against the column dtypes, so SQL coercion
    ('string_col = 5' matching row '05', 'int_col = '05'') can no longer
    wrongly prune entries holding matching rows; (2) an all-NULL sum
    group stays NULL through apply_cdf_to_aggregate; (3) an empty change
    range raises ValueError (never a strippable assert); (4) MERGE CDF
    routes NULL-op changeset rows as updates (null-safe branches)."""
    import pytest

    from naru_spark.sources import sinks

    # --- (1a) string partition column probed with an int literal
    df = spark.createDataFrame(
        [("05", 1), ("05", 2), ("7", 3)], "code string, v int"
    )
    p1 = str(tmp_path / "coerce_str")
    sinks.write_snapshot(df, p1, partition_by="code")
    # Spark coerces: '05' = 5 → the two '05' rows match; the stamp-string
    # compare ('05' vs '5') must NOT prune their entry
    assert sinks.read_snapshot_where(spark, p1, "code = 5").count() == 2
    # --- (1b) int bloom key probed with a zero-padded string literal
    df2 = spark.createDataFrame([(5, "a"), (6, "b")], "id int, s string")
    p2 = str(tmp_path / "coerce_int")
    sinks.write_snapshot(df2, p2, bloom_key="id")
    assert sinks.read_snapshot_where(spark, p2, "id = '05'").count() == 1
    # ...and the auto-pruned DELETE takes the same guard
    info = sinks.delete_from_snapshot(spark, p1, "code = 5")
    assert info["n_deleted"] == 2, info
    # exact-type hints still prune (the guard costs nothing when safe)
    p3 = str(tmp_path / "typed_ok")
    sinks.write_snapshot(
        spark.createDataFrame([("a", 1)], "k string, v int"), p3,
        partition_by="k",
    )
    sinks.write_snapshot(
        spark.createDataFrame([("b", 2)], "k string, v int"), p3,
        partition_by="k",
    )
    d = sinks.delete_from_snapshot(spark, p3, "k = 'a'")
    assert d["entries_pruned"] == 1, d

    # --- (2) all-NULL sum group stays NULL through the IVM fold
    agg = spark.createDataFrame(
        [("g1", 2, None), ("g2", 1, 5)],
        "k string, n bigint, sum_x bigint",
    )
    changes = spark.createDataFrame(
        [("g1", "insert", None), ("g3", "insert", None)],
        "k string, _change_type string, x bigint",
    )
    out = {
        r["k"]: (r["n"], r["sum_x"])
        for r in sinks.apply_cdf_to_aggregate(
            agg, changes, keys=["k"], sums=["x"]
        ).collect()
    }
    assert out["g1"] == (3, None)       # NULL + NULL delta stays NULL
    assert out["g2"] == (1, 5)          # untouched group unchanged
    assert out["g3"] == (1, None)       # new all-NULL group is NULL

    # --- (3) empty change range raises ValueError
    with pytest.raises(ValueError, match="empty change range"):
        sinks.read_snapshot_changes(spark, p1, from_version=1,
                                    to_version=1)
    import json
    import os

    with open(os.path.join(p2, "_manifests", "v1.json")) as fh:
        last_ts = json.load(fh)["ts"]
    with pytest.raises(ValueError, match="empty change range"):
        sinks.read_snapshot_changes(spark, p2, from_ts=last_ts + 1)

    # --- (4) NULL-op changeset rows surface as update pre/post images
    p4 = str(tmp_path / "null_op")
    base = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id int, s string")
    sinks.write_snapshot(base, p4, cdf=True)
    ch = spark.createDataFrame(
        [(1, "x2", None), (3, "z", None)],
        "doc_id int, s string, op string",
    )
    sinks.merge_into_snapshot(spark, p4, ch, key="doc_id")
    feed = sinks.read_snapshot_changes(spark, p4, from_version=1,
                                       row_level=True)
    kinds = {(r["doc_id"], r["_change_type"]) for r in feed.collect()}
    assert (1, "update_preimage") in kinds and (1, "update_postimage") in kinds
    assert (3, "insert") in kinds


def test_dv_aware_dml_composition(spark, tmp_path):
    """DELETE / UPDATE / MERGE compose with PENDING deletion vectors
    (Delta's DV-aware DML) instead of refusing: the rewrite anti-joins
    the vectors (a positionally-dead row can neither match, update, nor
    be resurrected by a merge), the touched files' vectors materialize
    out with the rewrite, untouched DATA files stay byte-identical and
    their dead rows stay dead, and the change feed reports only live
    rows. A follow-up compaction still clears everything."""
    import json
    import os

    from naru_spark.sources import sinks

    path = str(tmp_path / "dvdml")
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 4), i * 10) for i in range(100)],
        "id int, g string, v int",
    )
    # two commits so some files stay untouched by later DML
    sinks.write_snapshot(df.where("id < 50"), path, cdf=True)     # v1
    sinks.write_snapshot(df.where("id >= 50"), path)              # v2
    # v3: DV delete — every multiple of 10 dies positionally
    d = sinks.delete_from_snapshot(spark, path, "id % 10 = 0",
                                   mode="deletion-vector")
    assert d["files_rewritten"] == 0 and d["n_deleted"] == 10, d

    # --- copy-on-write DELETE over the pending vectors (v4)
    # deletes ids 5..14; id 10 is ALREADY dead → must not re-count
    d2 = sinks.delete_from_snapshot(spark, path,
                                    "id >= 5 AND id <= 14")
    assert d2["n_deleted"] == 9, d2
    with open(os.path.join(path, "_manifests", "v4.json")) as fh:
        man4 = json.load(fh)
    # the untouched half's vectors survive as a (consolidated) plane
    assert man4.get("dvs"), man4.get("dvs")
    out = sinks.read_snapshot(spark, path)
    want = {i for i in range(100) if i % 10 != 0 and not (5 <= i <= 14)}
    assert {r["id"] for r in out.select("id").collect()} == want
    # v2's data files were never rewritten (byte-identical carry)
    with open(os.path.join(path, "_manifests", "v2.json")) as fh:
        man2 = json.load(fh)
    assert any(e in man4["dirs"] for e in man2["dirs"])

    # --- UPDATE over the pending vectors (v5): bump every id < 25;
    # dead rows in that range (id 0,20,5..14 gone) must NOT update
    u = sinks.update_snapshot(spark, path, "id < 25",
                              {"v": "v + 100000"})
    n_live_lt25 = len([i for i in want if i < 25])
    assert u["n_updated"] == n_live_lt25, (u, n_live_lt25)
    out5 = sinks.read_snapshot(spark, path)
    assert out5.where("v >= 100000").count() == n_live_lt25
    assert {r["id"] for r in out5.select("id").collect()} == want
    # CDF through the composition: only live rows appear in the feed
    feed = sinks.read_snapshot_changes(spark, path, 4, 5, row_level=True)
    pre = {r["id"] for r in feed.where(
        "_change_type = 'update_preimage'").collect()}
    assert pre == {i for i in want if i < 25}

    # --- MERGE over pending vectors: fresh table, DV delete, then a
    # changeset that updates a live key AND upserts a dead key
    p2 = str(tmp_path / "dvmerge")
    base = spark.createDataFrame(
        [(i, "s", i) for i in range(20)], "doc_id int, s string, v int"
    )
    sinks.write_snapshot(base, p2)                                 # v1
    sinks.delete_from_snapshot(spark, p2, "doc_id = 7",
                               mode="deletion-vector")             # v2
    ch = spark.createDataFrame(
        [(3, "upd", 333, "U"), (7, "res", 777, "U")],
        "doc_id int, s string, v int, op string",
    )
    m = sinks.merge_into_snapshot(spark, p2, ch, key="doc_id")     # v3
    assert m["n_changes"] == 2, m
    got = {r["doc_id"]: (r["s"], r["v"])
           for r in sinks.read_snapshot(spark, p2).collect()}
    assert got[3] == ("upd", 333)
    # the dead key RE-INSERTS as the changeset row (it was not a live
    # match), never resurrects the old row
    assert got[7] == ("res", 777)
    assert len(got) == 20
    # the touched-file vectors materialized out; plane state is exact:
    # a full compaction still converges to the same content
    sinks.compact_snapshot(spark, p2, full=True)
    got2 = {r["doc_id"]: (r["s"], r["v"])
            for r in sinks.read_snapshot(spark, p2).collect()}
    assert got2 == got


def test_append_rebase_on_conflict(spark, tmp_path, monkeypatch):
    """Two interleaved appenders BOTH land (Delta WriteSerializable):
    the loser re-reads the head and re-publishes its already-written
    entries instead of re-running the job; an appender racing a
    compaction rebases onto the compacted head; a pinned commit
    (base_version) still raises; DESCRIBE HISTORY shows both commits
    with the rebased marker."""
    import pytest

    from naru_spark.sources import sinks

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i) for i in range(lo, hi)], "k int, v int"
    )
    path = str(tmp_path / "rebase")
    sinks.write_snapshot(mk(0, 100), path)                         # v1

    real_pub = sinks._publish_manifest
    state = {"fired": False}

    def racy(man_dir, n, manifest):
        if not state["fired"]:
            state["fired"] = True
            sinks.write_snapshot(mk(100, 110), path)  # competitor wins v2
        return real_pub(man_dir, n, manifest)

    monkeypatch.setattr(sinks, "_publish_manifest", racy)
    v = sinks.write_snapshot(mk(200, 220), path)                   # loser
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)
    assert v == 3, v                                   # rebased onto v2
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 130                          # BOTH appends live
    hist = sinks.snapshot_history(path)
    assert hist[-1]["op"] == "append"
    assert hist[-1]["op_params"].get("rebased") is True
    assert hist[-2]["op"] == "append"                  # the competitor

    # appender racing a compaction: rebases onto the compacted head
    state["fired"] = False

    def racy2(man_dir, n, manifest):
        if not state["fired"]:
            state["fired"] = True
            sinks.compact_snapshot(spark, path, full=True)
        return real_pub(man_dir, n, manifest)

    monkeypatch.setattr(sinks, "_publish_manifest", racy2)
    v2 = sinks.write_snapshot(mk(300, 310), path)
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)
    assert v2 == 5, v2                  # compact took v4, append rebased
    assert sinks.read_snapshot(spark, path).count() == 140

    # a PINNED append (read-modify-write contract) still raises
    state["fired"] = False
    monkeypatch.setattr(sinks, "_publish_manifest", racy)
    with pytest.raises(sinks.SnapshotConflictError):
        sinks.write_snapshot(mk(400, 410), path, base_version=v2)
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)

    # a replayed txn discovered ON rebase reclaims and no-ops
    pr = str(tmp_path / "rebase_txn")
    sinks.write_snapshot(mk(0, 10), pr, txn_id="app:1")            # v1
    state["fired"] = False

    def racy3(man_dir, n, manifest):
        if not state["fired"]:
            state["fired"] = True
            sinks.write_snapshot(mk(10, 20), pr, txn_id="app:2")
        return real_pub(man_dir, n, manifest)

    monkeypatch.setattr(sinks, "_publish_manifest", racy3)
    v3 = sinks.write_snapshot(mk(10, 20), pr, txn_id="app:2")  # same batch
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)
    assert v3 == 2, v3                       # the racer's commit, reused
    assert sinks.read_snapshot(spark, pr).count() == 20  # no double rows


def test_hidden_partitioning_transforms(spark, tmp_path):
    """Iceberg hidden-partitioning specs — days(ts), bucket(n, key),
    truncate(w, col) — prune on SOURCE-column predicates with no
    materialized derived column: a timestamp-range read prunes day
    partitions (counter-asserted via inputFiles), a bucket point lookup
    touches one bucket, truncate prefixes prune, and the auto-pruned
    DELETE composes (entries_pruned counters). Unsafe probes keep
    everything (never a wrong prune)."""
    import datetime

    from naru_spark.sources import sinks

    # --- days(ts): 6 day-partitions, 8 rows each
    rows = [
        (datetime.datetime(2024, 1, 1 + d, 6 + h), d * 8 + h)
        for d in range(6) for h in range(8)
    ]
    dfe = spark.createDataFrame(rows, "ts timestamp, v int")
    p1 = str(tmp_path / "days")
    sinks.write_snapshot(dfe, p1, partition_by="days(ts)")
    full_files = len(sinks.read_snapshot(spark, p1).inputFiles())
    q = sinks.read_snapshot_where(
        spark, p1, "ts >= '2024-01-02 00:00:00' AND ts < '2024-01-04'"
    )
    assert q.count() == 16                      # days 2 and 3
    assert 0 < len(q.inputFiles()) < full_files  # day entries pruned
    # equality (a string literal on a timestamp col) prunes to one day
    q2 = sinks.read_snapshot_where(spark, p1, "ts = '2024-01-03 06:00:00'")
    assert q2.count() == 1
    assert len(q2.inputFiles()) < full_files
    # the auto-pruned DELETE takes the same day-range elimination
    d = sinks.delete_from_snapshot(
        spark, p1, "ts >= '2024-01-05' AND ts <= '2024-01-05 23:59:59'"
    )
    assert d["n_deleted"] == 8 and d["entries_pruned"] >= 4, d
    assert sinks.read_snapshot(spark, p1).count() == 40

    # --- bucket(8, k): point lookups touch one bucket
    dfb = spark.createDataFrame(
        [(i, "r%d" % i) for i in range(400)], "k int, s string"
    )
    p2 = str(tmp_path / "bucket")
    sinks.write_snapshot(dfb, p2, partition_by="bucket(8,k)")
    fullb = len(sinks.read_snapshot(spark, p2).inputFiles())
    qb = sinks.read_snapshot_where(spark, p2, "k = 123")
    assert qb.count() == 1 and {r["k"] for r in qb.collect()} == {123}
    assert len(qb.inputFiles()) < fullb
    db = sinks.delete_from_snapshot(spark, p2, "k IN (7, 8)")
    assert db["n_deleted"] == 2 and db["entries_pruned"] >= 1, db
    # a type-coercing probe (string literal on an int bucket key) must
    # NOT prune — and still answers correctly
    qc = sinks.read_snapshot_where(spark, p2, "k = '0123'")
    assert qc.count() == 1 and len(qc.inputFiles()) == len(
        sinks.read_snapshot(spark, p2).inputFiles()
    )

    # --- truncate(3, s): string-prefix partitions
    dft = spark.createDataFrame(
        [("abc%03d" % i, i) for i in range(50)]
        + [("xyz%03d" % i, i) for i in range(50)],
        "s string, v int",
    )
    p3 = str(tmp_path / "trunc")
    sinks.write_snapshot(dft, p3, partition_by="truncate(3,s)")
    fullt = len(sinks.read_snapshot(spark, p3).inputFiles())
    qt = sinks.read_snapshot_where(spark, p3, "s = 'xyz007'")
    assert qt.count() == 1
    assert len(qt.inputFiles()) < fullt
    # int truncate composes with DELETE pruning through a rewrite:
    # survivors re-commit under the SAME transformed spec
    p4 = str(tmp_path / "trunc_int")
    dfi = spark.createDataFrame([(i, i) for i in range(300)], "k int, v int")
    sinks.write_snapshot(dfi, p4, partition_by="truncate(100,k)")
    di = sinks.delete_from_snapshot(spark, p4, "k = 250")
    assert di["n_deleted"] == 1 and di["entries_pruned"] >= 2, di
    # post-rewrite: stamps survived, a fresh point lookup still prunes
    q4 = sinks.read_snapshot_where(spark, p4, "k = 50")
    assert q4.count() == 1
    assert len(q4.inputFiles()) < len(
        sinks.read_snapshot(spark, p4).inputFiles()
    )
    # replace_where refuses transformed specs (constraint on a derived
    # value is inexpressible) — loudly, not wrongly
    import pytest

    with pytest.raises(ValueError, match="IDENTITY"):
        sinks.replace_where(spark, p4, dfi.limit(1),
                            col="truncate(100,k)", values=["0"])


def test_merge_schema_evolution_guards(spark, tmp_path):
    """merge_into_snapshot(schema_evolution=True): additive columns land
    (target rows NULL), TYPE conflicts refuse loudly, and with evolution
    OFF an unknown changeset column is simply not applied."""
    import pytest

    from naru_spark.sources import sinks

    path = str(tmp_path / "mev")
    base = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "doc_id int, s string")
    sinks.write_snapshot(base, path)
    ch = spark.createDataFrame(
        [(2, "b2", 7, "U"), (3, "c", 9, "U")],
        "doc_id int, s string, extra int, op string",
    )
    # evolution OFF: extra column not applied, schema unchanged
    sinks.merge_into_snapshot(spark, path, ch, key="doc_id")
    out = sinks.read_snapshot(spark, path, merge_schema=True)
    assert "extra" not in out.columns and out.count() == 3
    # evolution ON: the column lands additively
    ch2 = spark.createDataFrame(
        [(1, "a2", 5, "U")], "doc_id int, s string, extra int, op string"
    )
    sinks.merge_into_snapshot(spark, path, ch2, key="doc_id",
                              schema_evolution=True)
    out2 = sinks.read_snapshot(spark, path, merge_schema=True)
    got = {r["doc_id"]: r["extra"] for r in out2.collect()}
    assert got == {1: 5, 2: None, 3: None}
    # a TYPE conflict refuses
    bad = spark.createDataFrame(
        [(1, 99, "U")], "doc_id int, s int, op string"
    )
    with pytest.raises(ValueError, match="conflict"):
        sinks.merge_into_snapshot(spark, path, bad, key="doc_id",
                                  schema_evolution=True)


def test_clone_carries_evolved_planes(spark, tmp_path):
    """SHALLOW CLONE over a source with LIVE deletion vectors, pending
    merge-on-read deletes and rename schema ops: the clone serves the
    same logical rows, its compaction MATERIALIZES the planes into the
    clone's own tree without touching a single source byte, and the
    source keeps its planes and content untouched."""
    import json
    import os

    from naru_spark.sources import sinks

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i) for i in range(60)],
        "id int, g string, v int",
    )
    sinks.write_snapshot(df, src)                                  # v1
    sinks.delete_from_snapshot(spark, src, "id % 10 = 0",
                               mode="deletion-vector")             # v2
    sinks.delete_from_snapshot(spark, src, "id % 7 = 1",
                               mode="merge-on-read")               # v3
    sinks.alter_snapshot_schema(src, rename={"v": "val"})          # v4
    want = {
        (i, i) for i in range(60) if i % 10 != 0 and i % 7 != 1
    }

    dst = str(tmp_path / "dst")
    sinks.clone_snapshot(src, dst)
    got = {(r["id"], r["val"])
           for r in sinks.read_snapshot(spark, dst).collect()}
    assert got == want
    # snapshot of every source byte before clone-local maintenance
    def tree(p):
        out = {}
        for root, _, files in os.walk(p):
            for f in files:
                fp = os.path.join(root, f)
                out[fp] = (os.path.getsize(fp), os.path.getmtime(fp))
        return out

    before = tree(src)
    cinfo = sinks.compact_snapshot(spark, dst)
    assert cinfo["mode"] == "full", cinfo  # pending planes force it
    assert tree(src) == before            # ZERO source bytes touched
    with open(os.path.join(
        dst, "_manifests", f"v{cinfo['version']}.json"
    )) as fh:
        man = json.load(fh)
    assert not man.get("dvs") and not man.get("deletes")
    assert not man.get("schema_ops")
    # all clone entries now live under the clone's own tree
    assert all(e.startswith(dst) for e in man["dirs"])
    got2 = {(r["id"], r["val"])
            for r in sinks.read_snapshot(spark, dst).collect()}
    assert got2 == want
    # the source still serves its own (plane-applied) rows
    src_rows = {(r["id"], r["val"])
                for r in sinks.read_snapshot(spark, src).collect()}
    assert src_rows == want
    # and the clone's GC/retention never reaches outside its tree
    sinks.maintain_snapshot(spark, dst, keep_last=1, gc_older_than_s=0.0)
    assert tree(src) == before
    assert {(r["id"], r["val"])
            for r in sinks.read_snapshot(spark, dst).collect()} == want


def test_dv_aware_selective_compaction(spark, tmp_path):
    """Delta OPTIMIZE over deletion vectors: a selective compaction no
    longer forces a full-table materialization — the under-sized
    entries rewrite with their dead rows materialized OUT, the
    right-sized cold entry carries byte-identical with its vectors
    ALIVE in the remainder plane, and content is exact throughout."""
    import json
    import os

    from naru_spark.sources import sinks

    path = str(tmp_path / "dvopt")
    df = spark.createDataFrame([(i, i) for i in range(2000)],
                               "k int, v int")
    sinks.write_snapshot(df.where("k < 1600").coalesce(4), path)  # cold
    for lo in (1600, 1700, 1800, 1900):                    # fragments
        sinks.write_snapshot(
            df.where(f"k >= {lo} AND k < {lo + 100}").repartition(4),
            path,
        )
    d = sinks.delete_from_snapshot(spark, path, "k % 100 = 5",
                                   mode="deletion-vector")
    assert d["n_deleted"] == 20, d
    from naru_spark.sources.sinks import snapshot_stats

    cold_bytes = snapshot_stats(path)["n_bytes"]
    cinfo = sinks.compact_snapshot(
        spark, path, min_file_bytes=max(1, cold_bytes // 4 // 2)
    )
    assert cinfo["mode"] == "selective", cinfo
    assert cinfo["entries_carried"] >= 1, cinfo       # cold entry kept
    man_dir = os.path.join(path, "_manifests")
    with open(os.path.join(
        man_dir, f"v{cinfo['version']}.json"
    )) as fh:
        man = json.load(fh)
    # the cold entry's vectors survive (remainder plane), the rewritten
    # fragments' vectors materialized out
    assert man.get("dvs"), man.get("dvs")
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 2000 - 20
    assert out.where("k % 100 = 5").count() == 0
    # a later FULL pass clears the plane without changing content
    f = sinks.compact_snapshot(spark, path, full=True)
    with open(os.path.join(man_dir, f"v{f['version']}.json")) as fh:
        assert "dvs" not in json.load(fh)
    assert sinks.read_snapshot(spark, path).count() == 1980


def test_dml_occ_retry_loops(spark, tmp_path, monkeypatch):
    """DML-level optimistic retry (Delta's internal conflict loop): a
    DELETE / UPDATE / MERGE / replace_where racing a concurrent append
    re-reads the head and re-executes — BOTH land, serialized, with the
    interleaved rows intact. retries=0 surfaces the conflict; an
    explicit base_version disables the loop."""
    import pytest

    from naru_spark.sources import sinks

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i) for i in range(lo, hi)], "k int, v int"
    )
    path = str(tmp_path / "occdml")
    sinks.write_snapshot(mk(0, 100), path)                         # v1

    real_pub = sinks._publish_manifest
    state = {"fired": False}

    def racy(man_dir, n, manifest):
        # the first publish from the DML loser is preceded by a winner
        if not state["fired"] and manifest.get("op", {}).get("name") != "append":
            state["fired"] = True
            sinks.write_snapshot(mk(1000, 1010), path)
        return real_pub(man_dir, n, manifest)

    monkeypatch.setattr(sinks, "_publish_manifest", racy)
    info = sinks.delete_from_snapshot(spark, path, "k < 10")
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)
    assert info["n_deleted"] == 10, info
    out = sinks.read_snapshot(spark, path)
    # the interleaved append's rows survived the retried delete
    assert out.count() == 100, out.count()
    assert out.where("k >= 1000").count() == 10

    # UPDATE retries the same way
    state["fired"] = False
    monkeypatch.setattr(sinks, "_publish_manifest", racy)
    u = sinks.update_snapshot(spark, path, "k >= 1000",
                              {"v": "v + 1"})
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)
    # 20 rows match: the delete-race appender AND this race's appender
    # both landed k>=1000 batches before the retried update ran
    assert u["n_updated"] == 20, u
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 110  # both the append and the update landed

    # retries=0: the conflict propagates
    state["fired"] = False
    monkeypatch.setattr(sinks, "_publish_manifest", racy)
    with pytest.raises(sinks.SnapshotConflictError):
        sinks.delete_from_snapshot(spark, path, "k = 42", retries=0)
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)

    # MERGE retries
    state["fired"] = False
    monkeypatch.setattr(sinks, "_publish_manifest", racy)
    m = sinks.merge_into_snapshot(
        spark, path,
        spark.createDataFrame([(42, -1, "U")], "k int, v int, op string"),
        key="k",
    )
    monkeypatch.setattr(sinks, "_publish_manifest", real_pub)
    assert m["n_changes"] == 1, m
    out = sinks.read_snapshot(spark, path)
    assert out.where("k = 42 AND v = -1").count() == 1
    assert out.count() == 130  # two more interleaved appends landed


def test_snapshot_datasource(spark, tmp_path):
    """format("naru_snapshot") — the Spark 4 Python DataSource over the
    manifest protocol: batch reads serve exactly the manifest's files
    with Catalyst-pushed filters eliminating entries (counter-asserted
    via planned partitions), version time travel works, streaming
    offsets are manifest versions (exactly-once across restarts, a
    replace commit in range raises), and pending planes refuse at plan
    time."""
    import pytest

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 2) for i in range(100)],
        "k int, g string, v int",
    )
    sinks.write_snapshot(df.where("k < 50").repartition(4), path)   # v1
    sinks.write_snapshot(df.where("k >= 50").repartition(4), path)  # v2

    out = spark.read.format("naru_snapshot").load(path)
    assert out.count() == 100
    assert sorted(out.columns) == ["g", "k", "v"]
    # Catalyst's own pushed range filter eliminates v1's entry — the
    # plan has half the partitions (one per surviving file)
    filt = spark.read.format("naru_snapshot").load(path).where(
        "k >= 50 AND k < 60"
    )
    assert filt.count() == 10
    assert filt.rdd.getNumPartitions() < out.rdd.getNumPartitions()
    # ...and the filter still applies exactly (skipping is I/O-only)
    assert {r["k"] for r in filt.collect()} == set(range(50, 60))
    # version time travel through the option
    v1 = spark.read.format("naru_snapshot").option("version", 1).load(path)
    assert v1.count() == 50

    # streaming: offsets are manifest versions, exactly-once across
    # restarts, O(delta) per trigger
    outp, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("naru_snapshot").load(path)
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(outp)
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(outp).count() == 100
    sinks.write_snapshot(df.limit(7), path)                          # v3
    drain()
    assert spark.read.parquet(outp).count() == 107
    drain()  # no new commits: no new rows
    assert spark.read.parquet(outp).count() == 107

    # pending planes refuse at plan time (raw files are not the rows)
    sinks.delete_from_snapshot(spark, path, "k = 1",
                               mode="deletion-vector")
    with pytest.raises(Exception, match="deletion vector"):
        spark.read.format("naru_snapshot").load(path).count()
    # a replace commit inside a stream range raises instead of
    # re-serving superseded files
    sinks.compact_snapshot(spark, path, full=True)  # replace commit
    q = (
        spark.readStream.format("naru_snapshot").load(path)
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception, match="replace commit"):
        q.awaitTermination()


def test_snapshot_datasource_writer(spark, tmp_path):
    """The naru_snapshot WRITE side: df.write.format("naru_snapshot")
    appends commit one snapshot version each (manifest protocol, CHECK
    constraints enforced on the staged bytes, overwrite refused);
    writeStream.format("naru_snapshot") is a Structured Streaming SINK
    whose micro-batches commit under txn ids — exactly-once across
    re-drains with zero foreachBatch code."""
    import pytest

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "w")
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(100)], "k int, g string"
    )
    df.where("k < 50").write.format("naru_snapshot").mode("append").save(path)
    df.where("k >= 50").write.format("naru_snapshot").mode("append").save(path)
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 100
    assert {r["k"] for r in out.collect()} == set(range(100))
    hist = sinks.snapshot_history(path)
    assert [h["version"] for h in hist] == [1, 2]
    assert all(h["op"] == "append" for h in hist)
    # overwrite is refused (replaces go through the explicit APIs)
    with pytest.raises(Exception, match="append-only"):
        df.write.format("naru_snapshot").mode("overwrite").save(path)
    # a CONSTRAINED table: the session-less commit worker probes the
    # staged bytes with DuckDB in the whitelisted dialect — a violating
    # batch refuses with zero trace, a clean batch commits
    sinks.add_snapshot_constraint(spark, path, "k_nonneg", "k >= 0")
    with pytest.raises(Exception, match="CHECK constraint"):
        spark.createDataFrame([(-1, "g")], "k int, g string").write.format(
            "naru_snapshot"
        ).mode("append").save(path)
    assert sinks.read_snapshot(spark, path).count() == 100  # no trace
    spark.createDataFrame([(500, "g")], "k int, g string").write.format(
        "naru_snapshot"
    ).mode("append").save(path)
    assert sinks.read_snapshot(spark, path).count() == 101  # clean commit
    sinks.delete_from_snapshot(spark, path, "k = 500")
    sinks.drop_snapshot_constraint(path, "k_nonneg")
    # time travel still works over datasource-written commits
    assert sinks.read_snapshot(spark, path, version=1).count() == 50

    # --- streaming sink: exactly-once micro-batch commits
    src = str(tmp_path / "src")
    df.where("k < 60").write.parquet(src)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema("k int, g string").parquet(src)
            .writeStream.format("naru_snapshot")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(sink)
        )
        q.awaitTermination()

    drain()
    assert sinks.read_snapshot(spark, sink).count() == 60
    drain()  # restart with the same checkpoint: nothing re-commits
    assert sinks.read_snapshot(spark, sink).count() == 60
    df.where("k >= 60").write.mode("append").parquet(src)
    drain()
    got = sinks.read_snapshot(spark, sink)
    assert got.count() == 100
    assert {r["k"] for r in got.collect()} == set(range(100))
    # the commits carry the stream writer's op metadata + txn ids
    hist = sinks.snapshot_history(sink)
    assert all(
        h["op"] == "append"
        and h["op_params"].get("writer") == "datasource_stream"
        for h in hist
    )


def test_snapshot_datasource_cdf_stream(spark, tmp_path):
    """readStream.format("naru_snapshot").option("readChangeFeed") —
    the change feed as a streaming source: the streamed rows match
    read_snapshot_changes(row_level=True) exactly (types, versions),
    a second drain serves only commits landed since, and a commit that
    cannot be served row-level fails the stream loudly."""
    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "cdfs")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "k int, v int"
    )
    sinks.write_snapshot(df, path, cdf=True)                       # v1
    sinks.delete_from_snapshot(spark, path, "k < 5")               # v2
    sinks.update_snapshot(spark, path, "k >= 45", {"v": "v + 1"})  # v3

    out, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("naru_snapshot")
            .option("readChangeFeed", "true").load(path)
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    drain()
    got = {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in sinks.read_snapshot_changes(
            spark, path, 0, row_level=True
        ).collect()
    }
    assert got == want and len(got) > 50
    # incremental: only the new commit's changes stream on re-drain
    sinks.write_snapshot(df.limit(3).selectExpr("k + 100 as k", "v"),
                         path)                                     # v4
    drain()
    got2 = spark.read.parquet(out)
    assert got2.count() == len(want) + 3
    assert got2.where("_commit_version = 4").count() == 3
    assert {
        r["_change_type"]
        for r in got2.where("_commit_version = 4").collect()
    } == {"insert"}


def test_datasource_transform_pruning_and_scoped_optimize(spark, tmp_path):
    """(a) The naru_snapshot batch reader prunes TRANSFORMED stamps from
    Catalyst's own pushed filters: a timestamp-range WHERE on a days()
    table and a prefix-equality on a truncate() table plan fewer
    partitions (bucket needs a session the planning worker lacks — it
    survives, never misprunes). (b) compact/maintain partition scoping
    accepts SOURCE-column probes on transformed specs."""
    import datetime

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    # --- (a) days() through the DataSource
    rows = [
        (datetime.datetime(2024, 1, 1 + d, 6 + h), d * 8 + h)
        for d in range(6) for h in range(8)
    ]
    p1 = str(tmp_path / "dsdays")
    sinks.write_snapshot(
        spark.createDataFrame(rows, "ts timestamp, v int"), p1,
        partition_by="days(ts)",
    )
    n_full = (
        spark.read.format("naru_snapshot").load(p1).rdd.getNumPartitions()
    )
    q = spark.read.format("naru_snapshot").load(p1).where(
        "ts >= timestamp'2024-01-03 00:00:00' "
        "AND ts < timestamp'2024-01-05 00:00:00'"
    )
    assert q.count() == 16
    assert q.rdd.getNumPartitions() < n_full
    # truncate() prefix equality through the DataSource
    p2 = str(tmp_path / "dstrunc")
    sinks.write_snapshot(
        spark.createDataFrame(
            [("abc%02d" % i, i) for i in range(20)]
            + [("xyz%02d" % i, i) for i in range(20)],
            "s string, v int",
        ),
        p2, partition_by="truncate(3,s)",
    )
    n2 = spark.read.format("naru_snapshot").load(p2).rdd.getNumPartitions()
    q2 = spark.read.format("naru_snapshot").load(p2).where("s = 'xyz07'")
    assert q2.count() == 1
    assert q2.rdd.getNumPartitions() < n2

    # --- (b) scoped OPTIMIZE with source-column probes on days()
    for d in range(3):  # fragment day 2024-01-02 with extra appends
        sinks.write_snapshot(
            spark.createDataFrame(
                [(datetime.datetime(2024, 1, 2, 20 + d), 900 + d)],
                "ts timestamp, v int",
            ),
            p1, partition_by="days(ts)",
        )
    info = sinks.compact_snapshot(
        spark, p1, partitions={"ts": ["2024-01-02"]},
        min_file_bytes=1 << 30,
    )
    assert info["mode"] == "selective", info
    assert info["files_rewritten"] >= 2, info
    assert info["entries_carried"] >= 5, info    # other days untouched
    out = sinks.read_snapshot(spark, p1)
    assert out.count() == 48 + 3                 # content unchanged


def test_datasource_time_options_and_snapshot_files(spark, tmp_path):
    """timestampAsOf (batch) / startingTimestamp (stream) on the
    DataSource resolve through the monotone commit stamps exactly like
    the JVM read paths; snapshot_files answers the per-entry metadata
    relation from one manifest read."""
    import json
    import os

    import pytest

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "tt")
    df = spark.createDataFrame([(i, "s%d" % (i % 2)) for i in range(40)],
                               "k int, s string")
    sinks.write_snapshot(df.where("k < 20"), path, partition_by="s",
                         bloom_key="k")                            # v1
    sinks.write_snapshot(df.where("k >= 20"), path, partition_by="s")  # v2
    with open(os.path.join(path, "_manifests", "v1.json")) as fh:
        t1 = json.load(fh)["ts"]
    out = (
        spark.read.format("naru_snapshot")
        .option("timestampAsOf", t1).load(path)
    )
    assert out.count() == 20                       # v1's state
    with pytest.raises(Exception, match="mutually exclusive"):
        spark.read.format("naru_snapshot").option("timestampAsOf", t1) \
            .option("version", 2).load(path).count()
    # streaming from a wall-clock (Delta-INCLUSIVE): a timestamp just
    # past v1's stamp serves v2 onward; exactly t1 would include v1
    outp, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        spark.readStream.format("naru_snapshot")
        .option("startingTimestamp", t1 + 1e-4).load(path)
        .writeStream.foreachBatch(
            lambda b, i: b.write.mode("append").parquet(outp)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(outp)
    assert got.count() == 20 and got.agg({"k": "min"}).collect()[0][0] == 20

    # snapshot_files: the metadata relation matches the stamped stats
    files = sinks.snapshot_files(spark, path)
    rows = files.collect()
    assert len(rows) == 4                          # 2 commits x 2 langs
    assert sum(r["n_rows"] for r in rows) == 40
    assert all(r["partition"] and "s" in r["partition"] for r in rows)
    assert {r["bloom_key"] for r in rows} == {"k", None}
    # version-pinned metadata
    assert sinks.snapshot_files(spark, path, version=1).count() == 2


def test_expire_snapshots_age_retention(spark, tmp_path):
    """keep_newer_than_s: versions committed within the window survive
    in addition to keep_last — and expired ones reclaim exactly as
    before."""
    import json
    import os

    from naru_spark.sources import sinks

    path = str(tmp_path / "age")
    for lo in (0, 10, 20, 30):
        sinks.write_snapshot(
            spark.createDataFrame([(i,) for i in range(lo, lo + 10)],
                                  "k int"),
            path,
        )
    man_dir = os.path.join(path, "_manifests")
    # age v1/v2's stamps far into the past (manifests are plain JSON)
    for v in (1, 2):
        p = os.path.join(man_dir, f"v{v}.json")
        with open(p) as fh:
            man = json.load(fh)
        man["ts"] = man["ts"] - 10_000
        with open(p, "w") as fh:
            json.dump(man, fh)
    deleted = sinks.expire_snapshots(path, keep_last=1,
                                     keep_newer_than_s=3600)
    kept = sorted(
        int(f[1:-5]) for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    # v3/v4 are young (age-kept), v4 also keep_last; v1/v2 expired
    assert kept == [3, 4], kept
    # append-only history: the expired manifests' dirs stay referenced
    # by the kept versions, so no data is (or may be) reclaimed
    assert deleted == [], deleted
    assert sinks.read_snapshot(spark, path).count() == 40
    assert sinks.read_snapshot(spark, path, version=3).count() == 30


def test_partition_spec_evolution(spark, tmp_path):
    """Iceberg's signature SPEC EVOLUTION: a table whose commits carry
    DIFFERENT partition specs (unpartitioned history, then identity,
    then days(ts)) prunes each entry by ITS OWN stamp — a range read
    eliminates the transformed entries it can prove and keeps the
    unstamped history, always correct, increasingly skippy as the
    table rewrites under the newest spec."""
    import datetime

    from naru_spark.sources import sinks

    path = str(tmp_path / "specevo")
    rows = lambda d0, d1, tag: [
        (datetime.datetime(2024, 1, d, 12), tag, d)
        for d in range(d0, d1)
    ]
    df = lambda rs: spark.createDataFrame(rs, "ts timestamp, g string, v int")
    sinks.write_snapshot(df(rows(1, 4, "a")), path)              # v1: none
    sinks.write_snapshot(df(rows(4, 7, "b")), path,
                         partition_by="g")                       # v2: ident
    sinks.write_snapshot(df(rows(7, 13, "c")), path,
                         partition_by="days(ts)")                # v3: days
    full = sinks.read_snapshot(spark, path)
    assert full.count() == 12
    n_full = len(full.inputFiles())
    # a day-range read: v3's out-of-range day entries prune, v1 (no
    # stamp) and v2 (identity-on-g stamp) conservatively survive
    q = sinks.read_snapshot_where(
        spark, path, "ts >= '2024-01-08' AND ts <= '2024-01-09 23:59'"
    )
    assert q.count() == 2
    assert len(q.inputFiles()) < n_full
    # an identity probe on g prunes v2's entries only
    q2 = sinks.read_snapshot_where(spark, path, "g = 'b' AND v = 5")
    assert q2.count() == 1
    assert len(q2.inputFiles()) < n_full
    # DML across the mixed specs stays exact (no common spec: the
    # rewrite re-commits unpartitioned, correctness before cleverness)
    d = sinks.delete_from_snapshot(spark, path, "ts = '2024-01-08 12:00:00'")
    assert d["n_deleted"] == 1, d
    assert sinks.read_snapshot(spark, path).count() == 11


def test_merge_evolution_composes_with_full_sync(spark, tmp_path):
    """schema_evolution=True composes with WHEN NOT MATCHED BY SOURCE
    THEN DELETE: the target converges to exactly the changeset's keys
    AND gains the changeset's new column in one commit."""
    from naru_spark.sources import sinks

    path = str(tmp_path / "mevsync")
    sinks.write_snapshot(
        spark.createDataFrame([(i, "s") for i in range(10)],
                              "doc_id int, s string"),
        path,
    )
    ch = spark.createDataFrame(
        [(3, "s3", 30, "U"), (4, "s4", 40, "U"), (99, "s99", 990, "U")],
        "doc_id int, s string, extra int, op string",
    )
    sinks.merge_into_snapshot(spark, path, ch, key="doc_id",
                              schema_evolution=True,
                              not_matched_by_source="delete")
    got = {r["doc_id"]: (r["s"], r["extra"])
           for r in sinks.read_snapshot(spark, path,
                                        merge_schema=True).collect()}
    assert got == {3: ("s3", 30), 4: ("s4", 40), 99: ("s99", 990)}


def test_datasource_partitioned_writes(spark, tmp_path):
    """option("partitionBy", "col") on the naru_snapshot writer: each
    task fans its batches out per identity value, the commit assembles
    stamped __part leaf entries — the ingested table prunes,
    replace_where's, and streams exactly like a write_snapshot-
    partitioned one; transformed specs refuse loudly."""
    import pytest

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "pw")
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 2) for i in range(90)],
        "k int, g string, v int",
    )
    (df.write.format("naru_snapshot").option("partitionBy", "g")
       .mode("append").save(path))
    out = sinks.read_snapshot(spark, path)
    assert out.count() == 90
    # the commit stamped one entry per partition value
    files = sinks.snapshot_files(spark, path)
    stamps = {r["partition"]["g"] for r in files.collect()}
    assert stamps == {"g0", "g1", "g2"}
    # partition pruning works on the ingested stamps
    d = sinks.delete_from_snapshot(spark, path, "g = 'g1' AND k = 1")
    assert d["n_deleted"] == 1 and d["entries_pruned"] >= 2, d
    # ...and replace_where does too
    new_g0 = df.where("g = 'g0'").limit(5)
    r = sinks.replace_where(spark, path, new_g0, "g", ["g0"])
    assert r["partitions_replaced"] >= 1, r
    assert sinks.read_snapshot(spark, path).where("g = 'g0'").count() == 5
    # NULL partition values land in the hive default dir and read back
    p2 = str(tmp_path / "pwnull")
    (spark.createDataFrame([(1, None), (2, "x")], "k int, g string")
     .write.format("naru_snapshot").option("partitionBy", "g")
     .mode("append").save(p2))
    got = {(r["k"], r["g"]) for r in sinks.read_snapshot(spark, p2).collect()}
    assert got == {(1, None), (2, "x")}
    # a spec naming a column the frame lacks refuses loudly
    with pytest.raises(Exception, match="absent|unknown"):
        (df.write.format("naru_snapshot")
           .option("partitionBy", "days(ts)").mode("append")
           .save(str(tmp_path / "pwbad")))
    # the streaming sink partitions too
    src, sink, ckpt = (str(tmp_path / "s"), str(tmp_path / "snk"),
                       str(tmp_path / "ck"))
    df.write.parquet(src)
    q = (
        spark.readStream.schema("k int, g string, v int").parquet(src)
        .writeStream.format("naru_snapshot")
        .option("partitionBy", "g")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(sink)
    )
    q.awaitTermination()
    sf = sinks.snapshot_files(spark, sink)
    assert {r["partition"]["g"] for r in sf.collect()} == {"g0", "g1", "g2"}
    assert sinks.read_snapshot(spark, sink).count() == 90


def test_datasource_float_partition_probe_never_prunes(spark, tmp_path):
    """Review regression (r13): a FLOAT equality pushed into the
    DataSource must not feed the identity-partition probe — the JVM
    writes float partition dirs in Java repr ('1.0E-4'), so a str()
    compare would wrongly prune entries holding matching rows."""
    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "fl")
    df = spark.createDataFrame(
        [(0.0001, 1), (2.5, 2)], "price double, v int"
    )
    sinks.write_snapshot(df, path, partition_by="price")
    out = spark.read.format("naru_snapshot").load(path).where(
        "price = 0.0001"
    )
    assert out.count() == 1 and out.collect()[0]["v"] == 1
    out2 = spark.read.format("naru_snapshot").load(path).where(
        "price IN (0.0001, 2.5)"
    )
    assert out2.count() == 2


def test_xxh64_twin_bit_parity(spark):
    """The pure-Python XXH64 twin (sources/xxh64.py) is BIT-IDENTICAL
    to Spark's F.xxhash64 for every dtype the bucket transform accepts
    — negative/boundary ints, bigints, unicode/empty/long strings —
    which is what lets session-less contexts (DataSource planning and
    commit workers) compute bucket partition values that the JVM probe
    side agrees with."""
    from naru_spark.sources.xxh64 import bucket_of, spark_xxhash64

    cases = {
        "tinyint": [-128, -1, 0, 1, 127],
        "smallint": [-32768, -7, 0, 9, 32767],
        "int": [-2147483648, -1, 0, 42, 2147483647],
        "bigint": [-(2**63), -1, 0, 1, 2**63 - 1, 123456789012345],
        "string": ["", "a", "hello", "naïve-ünïcode-😀",
                   "x" * 7, "y" * 8, "z" * 31, "w" * 32, "v" * 100],
    }
    for dtype, vals in cases.items():
        src = "string" if dtype == "string" else "bigint"
        rows = spark.createDataFrame([(v,) for v in vals], f"v {src}")
        jvm = [
            r["h"] for r in rows.select(
                F.xxhash64(F.col("v").cast(dtype)).alias("h")
            ).collect()
        ]
        ours = [spark_xxhash64(v, dtype) for v in vals]
        assert ours == jvm, (dtype, list(zip(vals, ours, jvm)))
        jvm_b = [
            r["b"] for r in rows.select(
                F.pmod(F.xxhash64(F.col("v").cast(dtype)), F.lit(16))
                .cast("int").alias("b")
            ).collect()
        ]
        assert [bucket_of(v, dtype, 16) for v in vals] == jvm_b, dtype
        if dtype != "string":
            # the numpy-vectorized twin (the writer's fanout path)
            # agrees with the JVM too
            import numpy as np

            from naru_spark.sources.xxh64 import buckets_np

            got = buckets_np(np.array(vals, dtype=np.int64), dtype, 16)
            assert list(got) == jvm_b, dtype


def test_datasource_transformed_partitioned_writes(spark, tmp_path):
    """option("partitionBy", "days(ts)" / "bucket(n,col)" /
    "truncate(w,col)") on the naru_snapshot WRITER: the Python tasks
    compute the transform values (UTC epoch-day; XXH64 twin; floor/
    prefix) and the commit stamps canonical specs + partition_meta
    dtypes EXACTLY like write_snapshot — proven by comparing stamps
    against a write_snapshot twin of the same data, and by
    read_snapshot_where pruning both tables identically."""
    import datetime

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)

    def stamps(path):
        import json
        import os

        from naru_spark.sources.sinks import _latest_version

        man_dir = os.path.join(path, "_manifests")
        v = _latest_version(man_dir)
        with open(os.path.join(man_dir, f"v{v}.json")) as fh:
            man = json.load(fh)
        out = {}
        for st in man.get("stats", {}).values():
            if st and st.get("partition"):
                meta = st.get("partition_meta") or {}
                out[tuple(sorted(st["partition"].items()))] = (
                    st["n_rows"],
                    tuple(sorted(
                        (k, v2["dtype"]) for k, v2 in meta.items()
                    )),
                )
        return out

    # --- days(ts) twin
    rows = [
        (datetime.datetime(2024, 3, 1 + d, 5 + h), d * 4 + h)
        for d in range(4) for h in range(4)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    p_ds, p_jvm = str(tmp_path / "dsdays"), str(tmp_path / "jvmdays")
    (df.write.format("naru_snapshot").option("partitionBy", "days(ts)")
       .mode("append").save(p_ds))
    sinks.write_snapshot(df, p_jvm, partition_by="days(ts)")
    assert stamps(p_ds) == stamps(p_jvm)
    # ...and the datasource-ingested table prunes on a timestamp range
    full = len(sinks.read_snapshot(spark, p_ds).inputFiles())
    q = sinks.read_snapshot_where(
        spark, p_ds,
        "ts >= '2024-03-02 00:00:00' AND ts < '2024-03-03 00:00:00'",
    )
    assert q.count() == 4
    assert 0 < len(q.inputFiles()) < full

    # --- bucket(8, k) twin: stamp parity IS hash bit-parity
    df2 = spark.createDataFrame(
        [(i * 37, "s%d" % i) for i in range(64)], "k bigint, s string"
    )
    p2_ds, p2_jvm = str(tmp_path / "dsbuck"), str(tmp_path / "jvmbuck")
    (df2.write.format("naru_snapshot").option("partitionBy", "bucket(8,k)")
        .mode("append").save(p2_ds))
    sinks.write_snapshot(df2, p2_jvm, partition_by="bucket(8,k)")
    assert stamps(p2_ds) == stamps(p2_jvm)
    q2 = sinks.read_snapshot_where(spark, p2_ds, "k IN (37, 740)")
    assert q2.count() == 2
    assert len(q2.inputFiles()) < len(
        sinks.read_snapshot(spark, p2_ds).inputFiles()
    )

    # --- truncate(2, s) twin + NULL transform input -> hive default dir
    df3 = spark.createDataFrame(
        [("ab%d" % i, i) for i in range(6)]
        + [("cd%d" % i, i) for i in range(6)] + [(None, 99)],
        "s string, v int",
    )
    p3_ds, p3_jvm = str(tmp_path / "dstrunc"), str(tmp_path / "jvmtrunc")
    (df3.write.format("naru_snapshot")
        .option("partitionBy", "truncate(2,s)").mode("append").save(p3_ds))
    sinks.write_snapshot(df3, p3_jvm, partition_by="truncate(2,s)")
    assert stamps(p3_ds) == stamps(p3_jvm)
    got = {(r["s"], r["v"])
           for r in sinks.read_snapshot(spark, p3_ds).collect()}
    assert (None, 99) in got and len(got) == 13


def test_datasource_batch_cdf_read(spark, tmp_path):
    """spark.read.option("readChangeFeed","true") — the BATCH change
    feed (Delta's primary CDF idiom): serves exactly the rows
    read_snapshot_changes(row_level=True) serves for the version range;
    startingVersion is REQUIRED, endingVersion bounds the range, and a
    missing range raises instead of silently returning current rows
    with NULL change columns (the r13 advice bug)."""
    import pytest

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "cdfb")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k int, v int"
    )
    sinks.write_snapshot(df, path, cdf=True)                      # v1
    sinks.delete_from_snapshot(spark, path, "k < 5")              # v2
    sinks.write_snapshot(
        spark.createDataFrame([(100, 1), (101, 2)], "k int, v int"),
        path,
    )                                                             # v3

    got = (
        spark.read.format("naru_snapshot")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2).load(path)
        .select("k", "v", "_change_type", "_commit_version")
    )
    ref = sinks.read_snapshot_changes(
        spark, path, from_version=1, row_level=True
    ).select("k", "v", "_change_type", "_commit_version")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # endingVersion bounds the range
    only2 = (
        spark.read.format("naru_snapshot")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2).option("endingVersion", 2)
        .load(path)
    )
    assert {r["_commit_version"] for r in only2.collect()} == {2}
    assert only2.count() == 5
    # no range -> refuse loudly (never current-rows-with-NULLs)
    with pytest.raises(Exception, match="startingVersion"):
        (spark.read.format("naru_snapshot")
         .option("readChangeFeed", "true").load(path).count())


def test_datasource_schema_evolution_read(spark, tmp_path):
    """The DataSource declares the UNION schema across entry footers:
    an additively-evolved table (later append carries a new column)
    reads the evolved column through batch AND stream paths, with
    pre-evolution rows null-filled — matching read_snapshot(
    merge_schema=True) instead of silently dropping the column (the
    r13 advice bug)."""
    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "evo")
    sinks.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"),
        path,
    )
    sinks.write_snapshot(
        spark.createDataFrame([(3, "c", 30.0)],
                              "k int, s string, score double"),
        path,
    )
    out = spark.read.format("naru_snapshot").load(path)
    assert sorted(out.columns) == ["k", "s", "score"]
    got = {(r["k"], r["score"]) for r in out.collect()}
    assert got == {(1, None), (2, None), (3, 30.0)}
    ref = {
        (r["k"], r["score"])
        for r in sinks.read_snapshot(spark, path, merge_schema=True)
        .select("k", "score").collect()
    }
    assert got == ref
    # stream path declares the union too
    outp = str(tmp_path / "evo_out")
    q = (
        spark.readStream.format("naru_snapshot").load(path)
        .writeStream.foreachBatch(
            lambda b, i: b.write.mode("append").parquet(outp)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "evo_ck"))
        .start()
    )
    q.awaitTermination()
    got_s = {
        (r["k"], r["score"]) for r in spark.read.parquet(outp).collect()
    }
    assert got_s == got


def test_datasource_partition_packing(spark, tmp_path):
    """Batch reads pack surviving files into read units by Spark's own
    split formula: tiny-file tables keep ~per-file parallelism (the
    4 MiB open cost dominates), while forcing parallelism=1 packs
    everything into one unit — result-identical either way."""
    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "pack")
    df = spark.createDataFrame([(i, i * 2) for i in range(64)],
                               "k int, v int")
    sinks.write_snapshot(df.repartition(8), path)
    base = spark.read.format("naru_snapshot").load(path)
    assert base.rdd.getNumPartitions() == 8  # open cost: per-file
    packed = (
        spark.read.format("naru_snapshot")
        .option("defaultParallelism", 1)
        .option("openCostInBytes", 0).load(path)
    )
    assert packed.rdd.getNumPartitions() == 1
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_days_partitioning_requires_utc_session(spark, tmp_path):
    """days() hidden partitioning FAILS CLOSED under a non-UTC session:
    the write expression (session-tz date cast) and the probe side
    (calendar date of the literal) only agree in UTC, so a non-UTC
    session raises at write time instead of mispruning reads later."""
    import datetime

    import pytest

    from naru_spark.sources import sinks

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 23, 30), 1)], "ts timestamp, v int"
    )
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="UTC"):
            sinks.write_snapshot(
                df, str(tmp_path / "tz"), partition_by="days(ts)"
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_datasource_string_range_pruning(spark, tmp_path):
    """Pushed STRING ranges and LIKE-prefix filters prune the DataSource
    plan against the stamped string min/max boxes on a string-clustered
    layout (two commits with disjoint key ranges) — counter-asserted via
    planned partitions; results stay exact (skipping is I/O-only)."""
    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "sr")
    lo = spark.createDataFrame(
        [("a%03d" % i, i) for i in range(50)] +
        [("m%03d" % i, i) for i in range(50)], "s string, v int"
    )
    hi = spark.createDataFrame(
        [("n%03d" % i, i) for i in range(50)] +
        [("z%03d" % i, i) for i in range(50)], "s string, v int"
    )
    sinks.write_snapshot(lo.coalesce(1), path)   # v1: ['a...', 'm...']
    sinks.write_snapshot(hi.coalesce(1), path)   # v2: ['n...', 'z...']
    full = spark.read.format("naru_snapshot").load(path)
    n_full = full.rdd.getNumPartitions()
    # range filter: only v2's box overlaps
    q = spark.read.format("naru_snapshot").load(path).where("s >= 'p'")
    assert q.rdd.getNumPartitions() < n_full
    assert q.count() == 50
    # LIKE prefix: only v1's box overlaps
    q2 = spark.read.format("naru_snapshot").load(path).where("s LIKE 'm0%'")
    assert q2.rdd.getNumPartitions() < n_full
    assert q2.count() == 50
    # a range straddling both boxes keeps everything and stays exact
    q3 = spark.read.format("naru_snapshot").load(path).where(
        "s >= 'm' AND s <= 'n999'"
    )
    assert q3.count() == 100


def test_duckdb_safe_expr_dialect():
    """The session-free CHECK dialect: IN lists and parenthesized
    groups are in (the r14 review found the function-call check refusing
    them), LIKE is OUT (Spark treats backslash as the LIKE escape,
    DuckDB does not — a probe would wrongly accept), functions/casts/
    null-safe equality are out."""
    from naru_spark.sources.sinks import _duckdb_safe_expr as safe

    assert safe("k >= 0")
    assert safe("status IN ('a','b','c')")
    assert safe("qty > 0 AND (flag = 1 OR flag = 2)")
    assert safe("v BETWEEN 1 AND 10")
    assert safe("s IS NOT NULL")
    assert safe("d >= DATE '2020-01-01'")
    assert not safe("s LIKE 'a%'")
    assert not safe("length(s) > 3")
    assert not safe("CAST(s AS INT) > 0")
    assert not safe("a <=> b")
    assert not safe("k > 0; DROP TABLE x")


def test_datasource_write_constrained_in_list(spark, tmp_path):
    """End-to-end: a constrained table whose CHECK uses an IN list and
    a parenthesized group accepts clean session-less DataSource writes
    and refuses violating ones."""
    import pytest

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "inlist")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    sinks.write_snapshot(df, path)
    sinks.add_snapshot_constraint(
        spark, path, "s_ok", "s IN ('a','b','c') AND (k > 0 OR k < -10)"
    )
    spark.createDataFrame([(3, "c")], "k int, s string").write.format(
        "naru_snapshot"
    ).mode("append").save(path)
    assert sinks.read_snapshot(spark, path).count() == 3
    with pytest.raises(Exception, match="CHECK constraint"):
        spark.createDataFrame([(4, "z")], "k int, s string").write.format(
            "naru_snapshot"
        ).mode("append").save(path)
    assert sinks.read_snapshot(spark, path).count() == 3


def test_days_pruning_non_utc_reader_stands_down(spark, tmp_path):
    """A non-UTC READER session on a days()-stamped table gets CORRECT
    results with pruning stood down: the naive day literal no longer
    means a UTC calendar day, so day-stamp elimination keeps everything
    (the real filter still applies) instead of mispruning near-midnight
    rows — the r14 review's probe-side gap."""
    import datetime

    from naru_spark.sources import sinks

    path = str(tmp_path / "tzdays")
    rows = [
        (datetime.datetime(2024, 1, 2, h), h) for h in (0, 4, 12, 23)
    ] + [(datetime.datetime(2024, 1, 3, 2), 99)]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    sinks.write_snapshot(df, path, partition_by="days(ts)")  # UTC session
    cond = "ts <= '2024-01-02 23:00:00'"
    utc_rows = sorted(
        r["v"] for r in sinks.read_snapshot_where(spark, path, cond)
        .collect()
    )
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny = sinks.read_snapshot_where(spark, path, cond)
        ny_files = len(ny.inputFiles())
        ny_rows = sorted(r["v"] for r in ny.collect())
        full_files = len(sinks.read_snapshot(spark, path).inputFiles())
        # pruning stood down (kept every file), results match Spark's
        # own evaluation of the literal under the NY session: the
        # literal means NY wall time = 2024-01-03T04:00Z, so v=99
        # (2024-01-03T02:00Z) is IN range — mispruning by stamped day
        # would have dropped it
        assert ny_files == full_files
        assert 99 in ny_rows, ny_rows
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
    assert 99 not in utc_rows  # UTC session: literal is a UTC instant


def test_datasource_columns_option_and_null_count_pruning(spark, tmp_path):
    """(a) option("columns", "a,b") narrows the declared schema — the
    manual projection knob the Python DataSource API lacks a pruning
    hook for; unknown names refuse. (b) Stamped per-entry NULL counts
    (Delta nullCount analog) prune IS NULL / IS NOT NULL reads:
    an all-null entry drops from an IS NOT NULL plan, a no-null entry
    from an IS NULL plan — counter-asserted via planned partitions."""
    import pytest

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = str(tmp_path / "nc")
    some = spark.createDataFrame(
        [(i, "v%d" % i) for i in range(20)], "k int, s string"
    )
    all_null = spark.createDataFrame(
        [(100 + i, None) for i in range(20)], "k int, s string"
    )
    sinks.write_snapshot(some.coalesce(1), path)       # v1: zero nulls
    sinks.write_snapshot(all_null.coalesce(1), path)   # v2: all null
    # columns projection
    proj = (
        spark.read.format("naru_snapshot").option("columns", "k")
        .load(path)
    )
    assert proj.columns == ["k"]
    assert proj.count() == 40
    with pytest.raises(Exception, match="unknown column"):
        (spark.read.format("naru_snapshot").option("columns", "k,zz")
         .load(path).count())
    # null-count pruning
    full = spark.read.format("naru_snapshot").load(path)
    n_full = full.rdd.getNumPartitions()
    nn = spark.read.format("naru_snapshot").load(path).where(
        "s IS NOT NULL"
    )
    assert nn.count() == 20
    assert nn.rdd.getNumPartitions() < n_full
    isn = spark.read.format("naru_snapshot").load(path).where("s IS NULL")
    assert isn.count() == 20
    assert isn.rdd.getNumPartitions() < n_full


def test_datasource_columns_projection_reads_fewer_bytes(spark, tmp_path):
    """The option("columns") projection must shrink the arrow payload the
    Python workers materialize and ship across IPC — counted at the
    pyarrow level by driving SnapshotBatchReader.read() in-process and
    summing RecordBatch.nbytes: a 2-of-6-column projection over a wide
    table reads well under half the full scan's bytes (VERDICT r14
    item 8)."""
    from pyspark.sql import functions as F

    from naru_spark.sources import sinks
    from naru_spark.sources.snapshot_source import SnapshotDataSource

    path = str(tmp_path / "wide")
    wide = spark.range(5000).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("d1"),
        (F.col("id") * 2).cast("double").alias("d2"),
        F.concat(F.lit("padpadpadpadpadpad-"), F.col("id")).alias("s1"),
        F.concat(F.lit("morepaddingmorepadding-"), F.col("id")).alias("s2"),
        F.concat(F.lit("yetmorepaddingyetmore-"), F.col("id")).alias("s3"),
    )
    sinks.write_snapshot(wide.coalesce(1), path)

    def bytes_read(options: dict) -> tuple:
        src = SnapshotDataSource(options)
        reader = src.reader(src.schema())
        total = n = 0
        for part in reader.partitions():
            for batch in reader.read(part):
                total += batch.nbytes
                n += batch.num_rows
        return total, n

    full_b, full_n = bytes_read({"path": path})
    proj_b, proj_n = bytes_read({"path": path, "columns": "k,d1"})
    assert full_n == proj_n == 5000
    assert proj_b < full_b / 2, (proj_b, full_b)


def test_read_snapshot_where_null_predicates(spark, tmp_path):
    """read_snapshot_where auto-derives IS [NOT] NULL elimination from
    the WHERE string (the JVM twin of the DataSource's pushed
    IsNull/IsNotNull skipping): a no-null entry drops from an IS NULL
    read, an all-null entry from an IS NOT NULL read, composed with
    ordinary terms; results stay exact."""
    from naru_spark.sources import sinks

    path = str(tmp_path / "jnull")
    some = spark.createDataFrame(
        [(i, "v%d" % i) for i in range(20)], "k int, s string"
    )
    all_null = spark.createDataFrame(
        [(100 + i, None) for i in range(20)], "k int, s string"
    )
    sinks.write_snapshot(some.coalesce(1), path)
    sinks.write_snapshot(all_null.coalesce(1), path)
    full = len(sinks.read_snapshot(spark, path).inputFiles())
    q = sinks.read_snapshot_where(spark, path, "s IS NOT NULL AND k < 10")
    assert q.count() == 10
    assert len(q.inputFiles()) < full
    q2 = sinks.read_snapshot_where(spark, path, "s IS NULL")
    assert q2.count() == 20
    assert len(q2.inputFiles()) < full
    # contradictory null terms: hint dropped, result exact (empty)
    q3 = sinks.read_snapshot_where(
        spark, path, "s IS NULL AND s IS NOT NULL"
    )
    assert q3.count() == 0


def test_null_pruning_stands_down_under_schema_ops(spark, tmp_path):
    """null_preds elimination must STAND DOWN when pending rename/drop
    schema ops exist: a dropped-then-re-added column reads back NULL
    for pre-op rows, so a pre-op zero-null stamp would misprune
    (the r14 second-review repro: silent data loss)."""
    from naru_spark.sources import sinks

    path = str(tmp_path / "sops")
    sinks.write_snapshot(
        spark.createDataFrame(
            [(i, float(i)) for i in range(5)], "k int, d double"
        ).coalesce(1),
        path,
    )
    sinks.alter_snapshot_schema(path, drop=["d"])
    sinks.write_snapshot(
        spark.createDataFrame([(100, 7.0)], "k int, d double").coalesce(1),
        path,
    )
    got = sorted(
        r["k"] for r in sinks.read_snapshot_where(
            spark, path, "d IS NULL", merge_schema=True
        ).collect()
    )
    assert got == [0, 1, 2, 3, 4], got


def test_entry_stats_null_stamp_requires_column_in_every_file(tmp_path):
    """A multi-file entry whose files MIX schemas must not stamp a null
    count for the column some files lack — its null-filled rows read
    back NULL, so a zero-null stamp would wrongly prune IS NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from naru_spark.sources.sinks import _entry_stats

    d = tmp_path / "mixed"
    d.mkdir()
    pq.write_table(
        pa.table({"k": [1, 2], "s": ["a", "b"]}), str(d / "f1.parquet")
    )
    pq.write_table(pa.table({"k": [3, 4]}), str(d / "f2.parquet"))
    st = _entry_stats(str(d))
    assert st["n_rows"] == 4
    nulls = st.get("nulls") or {}
    assert "s" not in nulls, nulls       # mixed presence: no stamp
    assert nulls.get("k") == 0           # present everywhere: stamped
