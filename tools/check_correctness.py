"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 on Spark AND its oracle_sql() on DuckDB; compare row count, sorted
column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize values to strings, sort rows."""
    df = df[sorted(df.columns)]
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "NULL" if pd.isnull(v) else repr(round(float(v), 9)))
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.map(lambda v: "NULL" if pd.isnull(v) else pd.Timestamp(v).isoformat())
        else:
            out[c] = s.map(lambda v: "NULL" if pd.isnull(v) else str(v))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in canon(df).itertuples(index=False):
        h.update(("|".join(map(str, row)) + "\n").encode())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from naru_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    n_ok = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{spark_s:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, ddf.columns))
        sdf.columns = [c.lower() for c in sdf.columns]
        ddf.columns = [c.lower() for c in ddf.columns]
        hs, hd = (value_hash(sdf), value_hash(ddf)) if ok_cols else ("-", "x")
        ok = ok_rows and ok_cols and hs == hd
        status = "OK  " if ok else "FAIL"
        if ok:
            n_ok += 1
        else:
            failures.append(name)
        print(f"{status}  {name}: rows {len(sdf)}/{len(ddf)} cols_match={ok_cols} hash {hs}/{hd} [{spark_s:.1f}s]")
        if not ok and ok_cols:
            a, b = canon(sdf), canon(ddf)
            merged = a.merge(b, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            if len(diff):
                print(diff.head(6).to_string())
    print(
        f"\nSUMMARY: {n_ok} oracle hash-match, {n_rows_only} rows-only clean, "
        f"{len(failures)} failed"
    )
    print("ALL OK" if not failures else f"FAILURES: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
