"""sf10 spot probes for the O(delta) claims (VERDICT r12 item 6): the
100-TB story's incremental paths — incremental read, CDF row-level read,
merge-on-read delete, deletion-vector delete, bloom point delete,
file-pruned range delete, selective compaction — measured against a
~60 M-row lineitem (10x the sf1 slice, 100x the driver's sf0.1).

The claim under test: these walls track the DELTA (the 10k-row append,
the change plane, the matched files, the fragmented bytes), not the
table — so they must stay near-FLAT from sf1 to sf10 while the
table-sized context walls (build, clustered build) are allowed their
~10x. The emitted BENCH_sf10.json carries each probe's sf1 wall and the
ratio, so the artifact self-documents; table-sized probes are marked.

Run QUIET (same contention rule as bench_sf1) — one run, no overlap.
Data: tools/make_sf1.py first (the sf1 slice is the tiling source);
the 10x lineitem tile lands in .sf10data/ on first run (~1.3 GB).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".sf1data")
SF10 = os.path.join(ROOT, ".sf10data")

# probes whose wall is TABLE-sized by design (context, allowed ~10x);
# everything else claims to track its delta and should stay near-flat
_TABLE_SIZED = {
    "snapshot_table_build",
    "snapshot_clustered_build",
    "snapshot_bloom_build",
    "snapshot_compact_cold_build",
    "snapshot_datasource_part_build",  # hive fanout of the whole table
    "snapshot_delete_dv_probe",      # one pushdown scan of the table
    "snapshot_dv_read_probe",        # full count + anti-join (scan-bound)
}


def ensure_sf10() -> str:
    """Tile the sf1 lineitem 10x with shifted order keys (distributions
    preserved, keys unique) — the only table these probes read."""
    dst = os.path.join(SF10, "lineitem.parquet")
    if os.path.exists(dst):
        return SF10
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run tools/make_sf1.py first")
    import duckdb

    os.makedirs(SF10, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW li AS SELECT * FROM '{SF1}/lineitem.parquet'"
    )
    n_ok = con.execute("SELECT max(l_orderkey) + 1 FROM li").fetchone()[0]
    t0 = time.time()
    con.execute(
        f"""
COPY (
  SELECT li.* REPLACE (l_orderkey + c.i * {n_ok} AS l_orderkey)
  FROM li, range(10) c(i)
) TO '{dst}' (FORMAT PARQUET)
"""
    )
    print(f"# sf10 lineitem tiled in {time.time() - t0:.1f}s", file=sys.stderr)
    return SF10


def probes(spark, timings: dict) -> None:
    import tempfile

    from pyspark.sql import functions as F

    from naru_spark.sources.sinks import (
        _latest_version,
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        read_snapshot_changes,
        snapshot_stats,
        write_snapshot,
    )

    li = spark.read.parquet(os.path.join(SF10, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    n_rows = li.count()
    print(f"# sf10 lineitem: {n_rows:,} rows", file=sys.stderr)
    root = tempfile.mkdtemp(prefix="sf10_snap_")

    # --- build (table-sized context) + O(delta) incremental read
    path = root + "/tbl"
    t0 = time.time()
    v1 = write_snapshot(li, path)
    timings["snapshot_table_build"] = round(time.time() - t0, 3)
    v2 = write_snapshot(li.limit(10_000), path)
    t0 = time.time()
    n = read_snapshot_changes(spark, path, v1, v2).count()
    timings["snapshot_incremental_read_probe"] = round(time.time() - t0, 3)
    print(
        f"# build {timings['snapshot_table_build']:.1f}s; incremental "
        f"read {timings['snapshot_incremental_read_probe']:.2f}s ({n} rows)",
        file=sys.stderr,
    )

    # --- clustered build (context) + file-pruned ~1% range delete +
    #     metadata-only MoR delete + stats-pruned read
    dpath = root + "/tbl_clustered"
    t0 = time.time()
    write_snapshot(li.repartitionByRange(64, "l_orderkey"), dpath)
    timings["snapshot_clustered_build"] = round(time.time() - t0, 3)
    lo = li.agg({"l_orderkey": "max"}).collect()[0][0] // 100
    # --- DataSource pruned read at 60M rows over a 16-entry
    #     hidden-partitioned layout (truncate(W, key) — each leaf entry
    #     gets its own stamped min/max box): Catalyst's own pushed range
    #     filter eliminates the out-of-range ENTRIES in one manifest
    #     read; the wall tracks the SELECTED bytes (the ~1-entry match
    #     crosses Python), never the table. NB a single-commit table is
    #     ONE entry — entry-level stats cannot skip inside it; range
    #     layout is what makes manifests skippable, same as the JVM path
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    dspath = root + "/tbl_dsparts"
    w = max(1, (lo * 100) // 16)
    t0 = time.time()
    write_snapshot(li, dspath, partition_by=f"truncate({w},l_orderkey)")
    timings["snapshot_datasource_part_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    dsq = (
        spark.read.format("naru_snapshot").load(dspath)
        .where(f"l_orderkey <= {lo}")
    )
    n_ds = dsq.count()
    n_parts = dsq.rdd.getNumPartitions()
    full_parts = (
        spark.read.format("naru_snapshot").load(dspath)
        .rdd.getNumPartitions()
    )
    timings["snapshot_datasource_pruned_probe"] = round(time.time() - t0, 3)
    timings["snapshot_datasource_parts_planned"] = n_parts
    timings["snapshot_datasource_parts_full"] = full_parts
    print(
        f"# datasource pruned read "
        f"{timings['snapshot_datasource_pruned_probe']:.2f}s "
        f"({n_ds} rows, {n_parts}/{full_parts} planned partitions; "
        f"partitioned build {timings['snapshot_datasource_part_build']:.1f}s)",
        file=sys.stderr,
    )
    t0 = time.time()
    info = delete_from_snapshot(spark, dpath, f"l_orderkey <= {lo}")
    timings["snapshot_delete_selective_probe"] = round(time.time() - t0, 3)
    timings["snapshot_delete_files_rewritten"] = info["files_rewritten"]
    timings["snapshot_delete_files_carried"] = info["files_carried"]
    t0 = time.time()
    delete_from_snapshot(spark, dpath, f"l_orderkey <= {lo // 2}",
                         mode="merge-on-read")
    timings["snapshot_delete_mor_probe"] = round(time.time() - t0, 3)
    t0 = time.time()
    n = (
        read_snapshot(spark, dpath, prune={"l_orderkey": (0, lo)})
        .where(f"l_orderkey <= {lo}").count()
    )
    timings["snapshot_pruned_read_probe"] = round(time.time() - t0, 3)
    print(
        f"# range delete {timings['snapshot_delete_selective_probe']:.1f}s "
        f"(rewrote {info['files_rewritten']}, carried "
        f"{info['files_carried']}); MoR "
        f"{timings['snapshot_delete_mor_probe']:.3f}s; pruned read "
        f"{timings['snapshot_pruned_read_probe']:.2f}s ({n} rows)",
        file=sys.stderr,
    )

    # --- bloom build (context: 3 commits, one key pass each) + point
    #     delete pruned by the sidecars + DV delete + post-DV read
    bpath = root + "/tbl_bloom"
    li_k = li.select(F.col("l_orderkey").alias("k"), "l_quantity")
    t0 = time.time()
    for m_ in range(3):
        write_snapshot(li_k.filter(F.col("k") % 3 == m_), bpath,
                       bloom_key="k")
    timings["snapshot_bloom_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    binfo = delete_from_snapshot(
        spark, bpath, "k IN (3, 7)", prune_keys={"k": [3, 7]}
    )
    timings["snapshot_delete_bloom_probe"] = round(time.time() - t0, 3)
    timings["snapshot_bloom_entries_pruned"] = binfo["entries_pruned"]
    t0 = time.time()
    vinfo = delete_from_snapshot(spark, bpath, f"k <= {lo // 4}",
                                 mode="deletion-vector")
    timings["snapshot_delete_dv_probe"] = round(time.time() - t0, 3)
    t0 = time.time()
    n = read_snapshot(spark, bpath).count()
    timings["snapshot_dv_read_probe"] = round(time.time() - t0, 3)
    print(
        f"# bloom delete {timings['snapshot_delete_bloom_probe']:.1f}s "
        f"(pruned {binfo['entries_pruned']}/3); DV delete "
        f"{timings['snapshot_delete_dv_probe']:.1f}s "
        f"({vinfo['n_deleted']} rows, 0 rewrites); post-DV read "
        f"{timings['snapshot_dv_read_probe']:.1f}s ({n} rows)",
        file=sys.stderr,
    )

    # --- CDF: metadata-only enable, MoR delete persisting O(matched)
    #     change rows, row-level read of the change plane alone
    write_snapshot(li.limit(0), path, cdf=True)
    t0 = time.time()
    delete_from_snapshot(spark, path, f"l_orderkey <= {lo // 8}",
                         mode="merge-on-read")
    timings["snapshot_cdf_mor_delete_probe"] = round(time.time() - t0, 3)
    lv = _latest_version(os.path.join(path, "_manifests"))
    t0 = time.time()
    n = read_snapshot_changes(spark, path, lv - 1, lv,
                              row_level=True).count()
    timings["snapshot_cdf_read_probe"] = round(time.time() - t0, 3)
    print(
        f"# CDF MoR delete {timings['snapshot_cdf_mor_delete_probe']:.1f}s; "
        f"row-level read {timings['snapshot_cdf_read_probe']:.2f}s "
        f"({n} change rows)",
        file=sys.stderr,
    )
    # --- batch CDF through the DataSource: the change plane alone
    #     crosses Python — O(changes in the range), never the table
    t0 = time.time()
    n = (
        spark.read.format("naru_snapshot")
        .option("readChangeFeed", "true")
        .option("startingVersion", lv).load(path)
        .count()
    )
    timings["snapshot_datasource_cdf_batch_probe"] = round(
        time.time() - t0, 3
    )
    print(
        f"# datasource batch CDF "
        f"{timings['snapshot_datasource_cdf_batch_probe']:.2f}s "
        f"({n} change rows)",
        file=sys.stderr,
    )

    # --- selective compaction: cold right-sized bulk + 4 tiny appends;
    #     the pass pays for the FRAGMENTS, never the cold bytes
    cpath = root + "/tbl_compact"
    t0 = time.time()
    write_snapshot(li.coalesce(8), cpath)
    timings["snapshot_compact_cold_build"] = round(time.time() - t0, 3)
    cold_bytes = snapshot_stats(cpath)["n_bytes"]
    for m_ in range(4):
        write_snapshot(li.limit(25_000).repartition(4), cpath)
    min_fb = max(1, (cold_bytes // 8) // 2)
    t0 = time.time()
    cinfo = compact_snapshot(spark, cpath, min_file_bytes=min_fb)
    timings["snapshot_compaction_selective_probe"] = round(time.time() - t0, 3)
    timings["snapshot_compaction_files_rewritten"] = cinfo["files_rewritten"]
    timings["snapshot_compaction_entries_carried"] = cinfo["entries_carried"]
    assert cinfo["mode"] == "selective", cinfo
    print(
        f"# selective compaction "
        f"{timings['snapshot_compaction_selective_probe']:.1f}s (rewrote "
        f"{cinfo['files_rewritten']} fragment files, carried "
        f"{cinfo['entries_carried']}; cold build "
        f"{timings['snapshot_compact_cold_build']:.1f}s)",
        file=sys.stderr,
    )

    import shutil

    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ensure_sf10()
    from naru_spark.session import get_spark

    spark = get_spark("naru_spark_bench_sf10")
    timings: dict = {}
    errors: dict = {}
    try:
        probes(spark, timings)
    except Exception as e:  # noqa: BLE001 — record what we got
        errors["probes"] = f"{type(e).__name__}: {e}".splitlines()[0][:200]
        print(f"# probes FAILED — {errors['probes']}", file=sys.stderr)

    # self-documenting ratios vs the committed sf1 walls
    ref_path = os.path.join(ROOT, "BENCH_sf1.json")
    ratios: dict = {}
    if os.path.exists(ref_path):
        with open(ref_path) as fh:
            ref = json.load(fh).get("queries", {})
        for k, v in timings.items():
            r = ref.get(k)
            if isinstance(v, float) and r:
                ratios[k] = round(v / r, 2)
    out = {
        "metric": "sf10_spot_bench",
        "value": round(sum(v for k, v in timings.items()
                           if isinstance(v, float)), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 10.0,
        "vs_sf1_ratio": ratios,
        "table_sized_probes": sorted(_TABLE_SIZED & set(timings)),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
