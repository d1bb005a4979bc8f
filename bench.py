"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

The per-query numbers mirror the reference's reporting (mean per-query wall
time, estimators.py:85-90): `workload_oracle_counts` is 30 exact conjunctive
counts answered in one conditional-aggregation scan; `heuristic_estimates`
is ~240 single-column selectivities in one scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from naru_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("naru_spark_bench")

    # Warm the JVM + parquet footers so per-query times measure query work.
    from naru_spark.sources import load_table

    load_table(spark, "lineitem", sf_dir).count()

    # Per-entry isolation: one failing entry must never kill the benchmark —
    # the JSON line is ALWAYS emitted, with failed entries reported by name.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    qs = entry_mod.queries()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — isolation is the point
            msg = f"{type(e).__name__}: {e}"
            errors[name] = msg.splitlines()[0][:200]
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: FAILED after {timings[name]:.2f}s — {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
