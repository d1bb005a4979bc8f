"""Reproducible DataSource-read throughput probe (BASELINE.md "DataSource
read throughput").

Builds a ~600k-row / 8-file snapshot table from sf0.1 lineitem, then times a
full-scan 5-column aggregate three ways, best-of-3 each:

  1. JVM path   — `read_snapshot` (manifest -> spark.read.parquet)
  2. DataSource — `spark.read.format("naru_snapshot")` (Python workers,
                  arrow IPC per batch)
  3. bare pyarrow — single-process `pyarrow.dataset` scan of the same files
                  (the decode floor: shows the gap is IPC, not decode)

Usage: python tools/bench_datasource_read.py [sf_dir]
Prints one JSON line. Run on a quiet box; restamp BASELINE.md from it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AGG_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_orderkey")


def _agg(df):
    from pyspark.sql import functions as F

    return df.agg(
        F.sum("l_quantity"), F.sum("l_extendedprice"), F.avg("l_discount"),
        F.avg("l_tax"), F.count("l_orderkey"),
    ).collect()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import tempfile

    from naru_spark.session import get_spark
    from naru_spark.sources import load_table
    from naru_spark.sources.sinks import read_snapshot, write_snapshot
    from naru_spark.sources.snapshot_source import register_snapshot_source

    spark = get_spark("bench_datasource_read")
    register_snapshot_source(spark)

    li = load_table(spark, "lineitem", sf_dir).select(*AGG_COLS)
    path = tempfile.mkdtemp(prefix="bench_ds_read_") + "/li"
    write_snapshot(li.repartition(8), path)
    n_rows = read_snapshot(spark, path).count()  # warm footers + page cache

    def best_of(fn, reps=3):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        return min(walls), walls

    jvm, jvm_walls = best_of(lambda: _agg(read_snapshot(spark, path)))
    ds, ds_walls = best_of(
        lambda: _agg(spark.read.format("naru_snapshot").load(path))
    )

    import pyarrow.dataset as pads

    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    ]
    pa_s, pa_walls = best_of(
        lambda: pads.dataset(files).to_table(columns=list(AGG_COLS))
    )

    print(json.dumps({
        "rows": n_rows, "files": len(files),
        "jvm_read_snapshot_s": jvm, "jvm_walls": jvm_walls,
        "datasource_s": ds, "datasource_walls": ds_walls,
        "pyarrow_floor_s": pa_s, "pyarrow_walls": pa_walls,
        "ds_over_jvm": round(ds / jvm, 2) if jvm else None,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
