"""sf1 scaling spot-bench (VERDICT r04 item 8, widened r05/r06): run a
12-probe set — the historically slowest estimator/dedup entries, the
star-join plane, and the round-6 corpus-shaped newcomers — once against
the local sf1 slice (tools/make_sf1.py) and flag any super-linear cost.

Run it QUIET: concurrent Spark jobs on this box have inflated probe
walls 3-4x before (a 13.6x false flag on dedup_minhash_md5) — never
record a run that overlapped another job.

A healthy linear-ish entry lands well under 12x its sf0.1 wall at 10x the
data (per the verdict's bar); anything past that is a scaling bug to chase
before a real cluster would. Prints one JSON line:
{"metric": "sf1_spot_bench", "queries": {name: sec}, "sf": 1.0}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = [
    "psample_estimates",
    "estimator_report",
    "multiorder_nll",
    "dedup_embedding_lsh",
    "dedup_minhash_md5",
    # round-5 additions worth a scaling probe
    "workload_oracle_disjunctive",
    "knn_pagerank_oracle",
    # round-6: the star-join plane (VERDICT r05 item 8) — the estimate-
    # driven dim decisions and the zero-Exchange bucketed join get the
    # same super-linearity check the estimators got
    "local_supplier_volume_q5",
    "market_share_q8",
    "bucketed_join_agg",
    # round-6 newcomers with corpus-shaped cost curves
    "bm25_topk",
    "zorder_data_skipping",
    # 3-table star model: the two-key join + bounded-sample fit must stay
    # sub-linear (the join is the data-bound part; the fit is capped)
    "psample_star3",
    # 4-table star capstone (three-key join data-bound, fit capped)
    "psample_star4",
    # round-15: five-way star adds the part chain — the 4-key join is the
    # data-bound part and must scale like star4's
    "psample_star5",
    # round-15: winnowing fingerprints — extraction is row-local expression
    # work (linear), the candidate join is bounded by max_df; the 10x
    # corpus must not go super-linear
    "dedup_winnow_md5",
    # round-8: the full index-maintenance decision loops at 10x — build +
    # upsert + imbalance/fragmentation checks + rebuild/merge + probe;
    # every pass is corpus- or index-sized at most once, so the composition
    # must scale like its pieces
    "bm25_topk_index_maintain",
    "similarity_topk_ivfpq_index_maintain",
]


def index_serving_probes(spark, sf_dir: str, timings: dict) -> None:
    """round-7 (VERDICT r06 item 8): the PERSISTED-INDEX serving paths.
    "Probe cost is flat in corpus size" is the whole point of the
    build-once/serve-pruned indexes, so build and probe are timed
    SEPARATELY — the build is corpus-bound (one pass, allowed to scale);
    the probe must stay near-flat at 10x data."""
    import tempfile

    from pyspark.sql import functions as F

    from naru_spark.entry_pipeline import (
        _BM25_QUERIES,
        _ivf_oracle_centroids,
        _pq_codebooks,
    )
    from naru_spark.pipeline.retrieval import bm25_topk_from_index, bm25_write_index
    from naru_spark.pipeline.similarity import ivfpq_topk_from_index, ivfpq_write_index
    from naru_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    path = tempfile.mkdtemp(prefix="sf1_bm25_") + "/idx"
    t0 = time.time()
    bm25_write_index(docs, path)
    timings["bm25_index_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    n = bm25_topk_from_index(spark, path, _BM25_QUERIES, k=10).count()
    timings["bm25_index_probe"] = round(time.time() - t0, 3)
    print(
        f"# bm25 index: build {timings['bm25_index_build']:.2f}s, "
        f"probe {timings['bm25_index_probe']:.2f}s ({n} rows)",
        file=sys.stderr,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.time()
    cents = _ivf_oracle_centroids(sf_dir)
    cb = _pq_codebooks(sf_dir)
    ipath = tempfile.mkdtemp(prefix="sf1_ivfpq_") + "/idx"
    ivfpq_write_index(emb, ipath, cents, cb, decimals=6)
    timings["ivfpq_index_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    n = ivfpq_topk_from_index(spark, ipath, queries, k=10, n_probe=8, decimals=6).count()
    timings["ivfpq_index_probe"] = round(time.time() - t0, 3)
    # incremental add: a 5% batch appended under the saved quantizers must
    # cost O(|batch|), not O(index) — near-flat however big the index grows
    from naru_spark.pipeline.similarity import ivfpq_append_index

    t0 = time.time()
    # shift the ids above the corpus range: append requires NEW ids, and
    # re-adding existing ones would leave duplicate code rows behind
    ivfpq_append_index(
        emb.filter(F.col("vec_id") % 20 == 0).withColumn(
            "vec_id", F.col("vec_id") + F.lit(1_000_000_000)
        ),
        ipath,
    )
    timings["ivfpq_index_append"] = round(time.time() - t0, 3)
    print(
        f"# ivfpq index: build {timings['ivfpq_index_build']:.2f}s, "
        f"probe {timings['ivfpq_index_probe']:.2f}s ({n} rows), "
        f"append(5%) {timings['ivfpq_index_append']:.2f}s",
        file=sys.stderr,
    )


def snapshot_plane_probes(spark, sf_dir: str, timings: dict) -> None:
    """round-8 (VERDICT r07 item 7): the snapshot plane claims O(|delta|)
    incremental reads and per-trigger stream follows at any table size —
    the same 10x check the serving indexes got. The table build and the
    stream's FIRST drain are corpus-sized by definition (timed separately,
    allowed to scale); the incremental read and the post-delta drain must
    track the ~10k-row delta, not the sf1 table."""
    import tempfile

    from naru_spark.sources import load_table
    from naru_spark.sources.sinks import (
        read_snapshot_changes,
        snapshot_stream_source,
        write_snapshot,
    )

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    root = tempfile.mkdtemp(prefix="sf1_snap_")
    path = root + "/tbl"
    t0 = time.time()
    v1 = write_snapshot(li, path)
    timings["snapshot_table_build"] = round(time.time() - t0, 3)

    delta = li.limit(10_000)
    v2 = write_snapshot(delta, path)
    t0 = time.time()
    n = read_snapshot_changes(spark, path, v1, v2).count()
    timings["snapshot_incremental_read_probe"] = round(time.time() - t0, 3)
    print(
        f"# snapshot: build {timings['snapshot_table_build']:.2f}s, "
        f"incremental read of v{v1}->v{v2} "
        f"{timings['snapshot_incremental_read_probe']:.2f}s ({n} rows)",
        file=sys.stderr,
    )

    out, ckpt = root + "/out", root + "/ckpt"

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

    t0 = time.time()
    drain()  # bootstrap: table-sized by definition
    timings["snapshot_stream_bootstrap"] = round(time.time() - t0, 3)
    write_snapshot(li.limit(10_000), path)
    t0 = time.time()
    drain()  # the steady-state trigger: listing + the new delta only
    timings["snapshot_stream_follow_probe"] = round(time.time() - t0, 3)
    print(
        f"# snapshot stream: bootstrap {timings['snapshot_stream_bootstrap']:.2f}s, "
        f"post-delta drain {timings['snapshot_stream_follow_probe']:.2f}s",
        file=sys.stderr,
    )

    # round-15: branch refs — create_branch (zero-copy fork) and
    # publish_branch (metadata-only fast-forward) must stay near-flat at
    # ANY table size; the staged 10k-row batch is the only data cost
    from naru_spark.sources.sinks import (
        create_branch,
        publish_branch,
        snapshot_stats,
    )

    t0 = time.time()
    bpath = create_branch(path, "wap")
    timings["snapshot_branch_create_probe"] = round(time.time() - t0, 3)
    write_snapshot(li.limit(10_000), bpath)
    t0 = time.time()
    publish_branch(path, "wap")
    timings["snapshot_branch_publish_probe"] = round(time.time() - t0, 3)
    # metadata-only count — a 6M-row scan has no place in the probe
    n_pub = snapshot_stats(path)["n_rows"]
    print(
        f"# snapshot branch: create "
        f"{timings['snapshot_branch_create_probe']:.3f}s, publish "
        f"{timings['snapshot_branch_publish_probe']:.3f}s "
        f"({n_pub} rows visible post-publish)",
        file=sys.stderr,
    )

    # round-10: file-pruned DELETE WHERE — a selective delete on a
    # key-clustered layout must pay for the MATCHING files, not the table
    # (its wall tracks files_rewritten; compare snapshot_table_build, the
    # full-table write cost). Separate range-sorted table so file min/max
    # stats are disjoint on the delete key, like a Z-ORDERed 100 TB table.
    from naru_spark.sources.sinks import delete_from_snapshot

    dpath = root + "/tbl_clustered"
    write_snapshot(li.repartitionByRange(32, "l_orderkey"), dpath)
    lo = li.agg({"l_orderkey": "max"}).collect()[0][0] // 100
    t0 = time.time()
    info = delete_from_snapshot(spark, dpath, f"l_orderkey <= {lo}")
    timings["snapshot_delete_selective_probe"] = round(time.time() - t0, 3)
    timings["snapshot_delete_files_rewritten"] = info["files_rewritten"]
    timings["snapshot_delete_files_carried"] = info["files_carried"]
    print(
        f"# snapshot delete (~1% key range): "
        f"{timings['snapshot_delete_selective_probe']:.2f}s, rewrote "
        f"{info['files_rewritten']} files, carried {info['files_carried']} "
        f"({info['n_deleted']} rows deleted)",
        file=sys.stderr,
    )

    # round-10b: merge-on-read delete is METADATA-ONLY — its wall must be
    # milliseconds at any table size; the stats-pruned read then plans
    # against only the overlapping entries of the clustered table
    from naru_spark.sources.sinks import read_snapshot

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
        f"# snapshot MoR delete {timings['snapshot_delete_mor_probe']:.3f}s "
        f"(metadata-only); pruned read "
        f"{timings['snapshot_pruned_read_probe']:.2f}s ({n} rows)",
        file=sys.stderr,
    )

    # round-10c: bloom-pruned point delete on an UNCLUSTERED table —
    # interleaved key ranges make min/max boxes useless, the bloom
    # sidecars still eliminate the non-matching commits before the scan
    from pyspark.sql import functions as F

    bpath = root + "/tbl_bloom"
    li_k = li.select(F.col("l_orderkey").alias("k"), "l_quantity")
    for m_ in range(3):
        write_snapshot(li_k.filter(F.col("k") % 3 == m_), bpath, bloom_key="k")
    t0 = time.time()
    binfo = delete_from_snapshot(
        spark, bpath, "k IN (3, 7)", prune_keys={"k": [3, 7]}
    )
    timings["snapshot_delete_bloom_probe"] = round(time.time() - t0, 3)
    timings["snapshot_bloom_entries_pruned"] = binfo["entries_pruned"]
    print(
        f"# snapshot bloom delete {timings['snapshot_delete_bloom_probe']:.2f}s "
        f"({binfo['n_deleted']} rows, pruned {binfo['entries_pruned']}/3 "
        "entries on an unclustered layout)",
        file=sys.stderr,
    )

    # round-11: SELECTIVE compaction — wall tracks the FRAGMENTED bytes,
    # not the table: a big right-sized cold entry plus a few small
    # appends compacts in a fraction of snapshot_table_build's wall
    # (which wrote the same cold bytes), and the cold entry carries
    from naru_spark.sources.sinks import compact_snapshot, snapshot_stats

    cpath = root + "/tbl_compact"
    write_snapshot(li.coalesce(8), cpath)  # right-sized cold bulk
    cold_bytes = snapshot_stats(cpath)["n_bytes"]
    for m_ in range(4):  # fragmented small appends: ~0.4% of the table
        write_snapshot(li.limit(25_000).repartition(4), cpath)
    min_fb = max(1, (cold_bytes // 8) // 2)  # below cold avg, above frags
    t0 = time.time()
    cinfo = compact_snapshot(spark, cpath, min_file_bytes=min_fb)
    timings["snapshot_compaction_selective_probe"] = round(time.time() - t0, 3)
    timings["snapshot_compaction_files_rewritten"] = cinfo["files_rewritten"]
    timings["snapshot_compaction_entries_carried"] = cinfo["entries_carried"]
    assert cinfo["mode"] == "selective" and cinfo["entries_carried"] >= 1, cinfo
    print(
        f"# snapshot selective compaction "
        f"{timings['snapshot_compaction_selective_probe']:.2f}s (rewrote "
        f"{cinfo['files_rewritten']} fragment files, carried "
        f"{cinfo['entries_carried']} right-sized entr(ies) verbatim; "
        f"cold build was {timings['snapshot_table_build']:.2f}s)",
        file=sys.stderr,
    )

    # round-11b: replace_where on an identity-partitioned table — the
    # overwrite wall tracks the REPLACED partition's bytes + a manifest
    # commit, never the table (untouched partitions carry verbatim)
    from naru_spark.sources.sinks import replace_where
    from naru_spark.sources import load_table

    li_rf = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    rpath = root + "/tbl_rw"
    t0 = time.time()
    write_snapshot(li_rf, rpath, partition_by="l_returnflag")
    rw_build = round(time.time() - t0, 3)
    new_r = li_rf.where("l_returnflag = 'R'").limit(10_000)
    t0 = time.time()
    rinfo = replace_where(spark, rpath, new_r, "l_returnflag", ["R"])
    timings["snapshot_replace_where_probe"] = round(time.time() - t0, 3)
    timings["snapshot_replace_where_carried"] = rinfo["entries_carried"]
    assert rinfo["partitions_replaced"] >= 1 and rinfo["entries_carried"] >= 2, rinfo
    print(
        f"# snapshot replace_where {timings['snapshot_replace_where_probe']:.2f}s "
        f"(replaced {rinfo['partitions_replaced']} partition entr(ies), carried "
        f"{rinfo['entries_carried']}; partitioned build was {rw_build:.2f}s)",
        file=sys.stderr,
    )

    # round-12: partition-scoped OPTIMIZE (OPTIMIZE ... WHERE + ZORDER)
    # — fragment ONE partition with small appends, then re-cluster and
    # compact just it: the wall tracks that partition's bytes + the
    # fragments, never the table (every other partition carries verbatim)
    from naru_spark.sources.sinks import compact_snapshot as _cs

    for _ in range(3):
        write_snapshot(new_r.repartition(4), rpath,
                       partition_by="l_returnflag")
    t0 = time.time()
    oinfo = _cs(spark, rpath, partitions={"l_returnflag": ["R"]},
                zorder_by=["l_orderkey"])
    timings["snapshot_optimize_partition_probe"] = round(time.time() - t0, 3)
    timings["snapshot_optimize_partition_carried"] = oinfo["entries_carried"]
    assert oinfo["mode"] == "selective" and oinfo["entries_carried"] >= 2, oinfo
    print(
        f"# snapshot scoped optimize+zorder "
        f"{timings['snapshot_optimize_partition_probe']:.2f}s (rewrote "
        f"{oinfo['files_rewritten']} files of one partition, carried "
        f"{oinfo['entries_carried']} entries; partitioned build was "
        f"{rw_build:.2f}s)",
        file=sys.stderr,
    )

    # round-12b: change data feed — enabling is a metadata-only commit
    # (empty delta); the MoR delete then persists O(matched) change rows
    # while its data plane stays metadata-only, and the row-level read of
    # that commit reads the change plane alone, never the table
    from naru_spark.sources.sinks import _latest_version

    write_snapshot(li_rf.limit(0), rpath, partition_by="l_returnflag",
                   cdf=True)  # the SET TBLPROPERTIES idiom
    t0 = time.time()
    delete_from_snapshot(spark, rpath, f"l_orderkey <= {lo // 2}",
                         mode="merge-on-read")
    timings["snapshot_cdf_mor_delete_probe"] = round(time.time() - t0, 3)
    lv = _latest_version(os.path.join(rpath, "_manifests"))
    t0 = time.time()
    n = read_snapshot_changes(spark, rpath, lv - 1, lv,
                              row_level=True).count()
    timings["snapshot_cdf_read_probe"] = round(time.time() - t0, 3)
    print(
        f"# snapshot CDF: MoR delete + change plane "
        f"{timings['snapshot_cdf_mor_delete_probe']:.2f}s, row-level read "
        f"{timings['snapshot_cdf_read_probe']:.2f}s ({n} change rows)",
        file=sys.stderr,
    )

    # round-12c: POSITIONAL deletion vector — the delete writes only a
    # (file, row-index) sidecar (wall = one pushdown scan + O(matched)
    # write, zero data rewrites), and the post-DV read pays one
    # anti-join on O(dv rows) over the table scan
    t0 = time.time()
    vinfo = delete_from_snapshot(spark, bpath, f"k <= {lo // 4}",
                                 mode="deletion-vector")
    timings["snapshot_delete_dv_probe"] = round(time.time() - t0, 3)
    t0 = time.time()
    n = read_snapshot(spark, bpath).count()
    timings["snapshot_dv_read_probe"] = round(time.time() - t0, 3)
    print(
        f"# snapshot DV delete {timings['snapshot_delete_dv_probe']:.2f}s "
        f"({vinfo['n_deleted']} rows positionally deleted, 0 files "
        f"rewritten); post-DV full read "
        f"{timings['snapshot_dv_read_probe']:.2f}s ({n} rows)",
        file=sys.stderr,
    )


# contention canaries (VERDICT r07 item 9): if these two drift past 2x the
# COMMITTED BENCH_sf1.json walls, the box is contended — the run is marked
# and must not be recorded (the rule that falsely flagged dedup entries in
# rounds 5-7, mechanized)
_CANARIES = ("zorder_data_skipping", "psample_star3")


def _check_canaries(timings: dict) -> bool:
    ref_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_sf1.json"
    )
    if not os.path.exists(ref_path):
        return False
    with open(ref_path) as fh:
        ref = json.load(fh).get("queries", {})
    contended = False
    for name in _CANARIES:
        got, want = timings.get(name), ref.get(name)
        if got and want and got > 2.0 * want:
            print(
                f"# CONTENDED: canary {name} {got:.2f}s > 2x committed "
                f"{want:.2f}s — do NOT record this run",
                file=sys.stderr,
            )
            contended = True
    return contended


def main() -> None:
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1data"
    )
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"{sf_dir} missing — run tools/make_sf1.py first")

    import __spark_entry__ as entry_mod
    from naru_spark.session import get_spark

    spark = get_spark("naru_spark_bench_sf1")
    queries = entry_mod.queries()

    # model-cache warm (same discipline as bench.py: fits are artifacts)
    from naru_spark.entry_model import warm_model_cache

    warm = round(warm_model_cache(spark, sf_dir), 3)
    print(f"# model-cache warm: {warm:.2f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in ENTRIES:
        t0 = time.time()
        try:
            n = queries[name](spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — per-entry isolation
            errors[name] = f"{type(e).__name__}: {e}".splitlines()[0][:200]
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: FAILED — {errors[name]}", file=sys.stderr)

    for probes in (index_serving_probes, snapshot_plane_probes):
        try:
            probes(spark, sf_dir, timings)
        except Exception as e:  # noqa: BLE001 — per-entry isolation
            errors[probes.__name__] = f"{type(e).__name__}: {e}".splitlines()[0][:200]
            print(f"# {probes.__name__}: FAILED — {errors[probes.__name__]}", file=sys.stderr)

    out = {
        "metric": "sf1_spot_bench",
        # counts (files_rewritten/carried) ride in queries for the record
        # but must not pollute the seconds headline
        "value": round(sum(v for k, v in timings.items()
                           if not k.endswith(("_files_rewritten", "_files_carried"))), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "model_warm_s": warm,
    }
    if _check_canaries(timings):
        out["contended"] = True
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
