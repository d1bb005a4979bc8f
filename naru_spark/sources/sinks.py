"""Sinks and round-trippable source formats beyond the plain parquet scan.

- ``write_partitioned`` / ``read_partitioned``: hive-style directory
  partitioning. THE physical-layout lever at 100 TB: a filter on the
  partition column becomes directory pruning (plan shows ``PartitionFilters``
  and touches only matching files) — asserted in
  tests/test_sinks.py::test_partition_pruning.
- ``write_jsonl`` / ``read_jsonl``: JSON-lines interchange with an explicit
  schema on read (schema inference is a full extra pass — never at scale).
- CSV round-trip lives in sources/registry.py (load_table CSV fallback).

The reference's only sink is a results CSV (eval_model.py:450-464 —
SaveEstimators); these generalize that surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet hive-partitioned by ``partition_cols`` (low-cardinality
    columns only — each distinct combination is a directory)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a hive-partitioned parquet tree; partition columns come back as
    regular columns and filters on them prune directories, not rows."""
    return spark.read.parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Dynamic partition overwrite — the parquet-native UPSERT-by-partition:
    only the partitions PRESENT in ``df`` are replaced; every other
    partition directory survives untouched. This is how a 100 TB pipeline
    reprocesses one day/source without rewriting the table (and without a
    table format): mode=overwrite + partitionOverwriteMode=dynamic. The
    conf is pinned per-write and restored (STATIC overwrite would wipe the
    whole table — the failure mode this helper exists to prevent)."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, "dynamic")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, saved)


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files carry EVOLVED schemas
    (columns added over time): mergeSchema unions the footers so old files
    surface NULL for columns they predate. Schema merge reads every
    footer — fine per-directory, never over a whole 100 TB lake (persist
    the merged schema once instead)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact(df_or_path, spark: SparkSession | None = None, target_files: int = 4) -> DataFrame:
    """Small-files compaction: re-read (or take) a DataFrame and coalesce
    its output to ``target_files`` files on the next write. Small files are
    the silent scan killer at scale (per-file open + footer cost dominates
    under ~16 MB); compaction is one narrow coalesce — NO shuffle (plan
    carries Coalesce, not Exchange), so it only ever merges, never
    redistributes."""
    df = (
        spark.read.parquet(df_or_path)
        if isinstance(df_or_path, str)
        else df_or_path
    )
    return df.coalesce(target_files)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default) — the second Spark-native columnar format;
    same predicate-pushdown + column-pruning behavior as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSON-lines scan with a REQUIRED explicit schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (the reference's results sink format,
    eval_model.py:450-464). Timestamps serialize as ISO-8601 in the
    session's UTC zone; round-trip requires an explicit read schema
    (CSV carries no types)."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Explicit-schema CSV source (schema inference at 100 TB means an
    extra full scan AND type drift between runs — never infer)."""
    return spark.read.option("header", "true").schema(schema).csv(path)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> dict:
    """Z-order (Morton-curve) clustered parquet write — the multi-column
    data-skipping layout (Delta/Iceberg ``OPTIMIZE ZORDER BY`` analog).

    A single-column sort lets parquet min/max row-group stats prune only
    the LEADING column's predicates; interleaving the bit-planes of every
    cluster column into one z-value and range-partitioning + sorting on it
    makes each output file cover a small HYPER-RECTANGLE of the clustered
    space, so conjunctive range predicates on ANY subset of the columns
    skip most files.

    Mechanics (all JVM-side, one shuffle):
    1. per column: min/max from ONE scalar scan, then a linear
       quantization to ``2^bits`` buckets (monotone, so range predicates
       map to bucket ranges);
    2. bit-interleave the bucket ids into the z-value with shift/or
       expressions built in a Python loop (no UDF);
    3. ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions(z)``
       — the range exchange is the one unavoidable shuffle (any
       clustering re-layout pays it), the sort is in-partition.

    Returns {"path", "n_files", "mins", "maxs"} so callers can rebuild
    the bucket mapping for skipping checks. Layout never changes results
    — which is what lets the entry share a plain-SQL oracle."""
    clustered, mins, maxs = _zorder_cluster(df, cols, n_files, bits)
    clustered.write.mode(mode).parquet(path)
    return {"path": path, "n_files": n_files, "mins": mins, "maxs": maxs}


def _zorder_cluster(
    df: DataFrame, cols: Sequence[str], n_files: int, bits: int = 8
) -> tuple[DataFrame, dict, dict]:
    """The Morton-interleave clustering transform behind ``zorder_write``,
    factored out so any rewrite path (plain sink, snapshot compaction)
    can route through it: returns (clustered df, mins, maxs). The range
    exchange on the z-value is the one shuffle; the sort is
    in-partition."""
    from pyspark.sql import functions as F

    cols = list(cols)
    # the Morton quantization is a cast-to-double linear map: a column
    # whose cast yields NULL would silently land every row in bucket 0 —
    # no clustering, no error, and the caller believes the layout is
    # skipping-friendly. STRING columns get their own order-preserving
    # quantization (sampled boundaries, below); anything else
    # non-castable (date, binary…) refuses loudly; timestamps cast to
    # epoch seconds and are fine.
    ok_prefixes = ("tinyint", "smallint", "int", "bigint", "float",
                   "double", "decimal", "timestamp", "boolean")
    dtypes = dict(df.dtypes)
    str_cols = [c for c in cols if dtypes.get(c) == "string"]
    bad = [c for c in cols
           if c not in str_cols
           and not dtypes.get(c, "?").startswith(ok_prefixes)]
    if bad:
        raise ValueError(
            f"zorder column(s) {bad!r} have non-orderable type(s) "
            f"{[dtypes.get(c) for c in bad]!r} — the Morton quantization "
            "needs an order-preserving numeric cast (cast dates to "
            "timestamp first)"
        )
    # string quantization: up to 63 sampled boundary strings per column
    # (64 buckets bounds the comparison-chain codegen); bucket = how
    # many boundaries the value exceeds — order-preserving, so string
    # range/equality predicates still map to bucket ranges and the
    # per-file min/max stats skip files. Layout-only: a skewed or
    # unlucky sample degrades clustering quality, never correctness.
    str_bounds: dict = {}
    for c in str_cols:
        sample = [
            r[0] for r in df.select(c).where(F.col(c).isNotNull())
            .limit(100_000).collect()
        ]
        sample.sort()
        n_b = min(63, max(1, len(set(sample)) - 1))
        bnds = sorted({
            sample[int(len(sample) * (i + 1) / (n_b + 1))]
            for i in range(n_b)
        }) if sample else []
        str_bounds[c] = bnds
    row = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols if c not in str_cols],
        *[F.max(c).alias(f"max_{c}") for c in cols if c not in str_cols],
    ).collect()[0] if len(str_cols) < len(cols) else {}
    # empty input (or an all-NULL column) has no min/max: treat the span
    # as 0 so the column contributes bucket 0 — the rewrite still goes
    # through (e.g. compacting a table whose pending merge-on-read
    # deletes removed every row) instead of crashing on float(None)
    mins = {c: (0.0 if row[f"min_{c}"] is None else float(row[f"min_{c}"]))
            for c in cols if c not in str_cols}
    maxs = {c: (0.0 if row[f"max_{c}"] is None else float(row[f"max_{c}"]))
            for c in cols if c not in str_cols}
    n_buckets = 1 << bits

    def bucket(c: str):
        if c in str_bounds:
            bnds = str_bounds[c]
            if not bnds:
                return F.lit(0)
            expr = F.lit(0)
            for b in bnds:
                expr = expr + (F.col(c) > F.lit(b)).cast("int")
            # spread the (≤64) string buckets across the full 2^bits
            # range so their SIGNIFICANT bits land in the same Morton
            # positions as the numeric columns' — without this, the
            # string column's constant-zero high bits would demote it
            # and the interleave would cluster on the other columns only
            spread = max(1, n_buckets // (len(bnds) + 1))
            return F.least(
                F.coalesce(expr, F.lit(0)) * F.lit(spread),
                F.lit(n_buckets - 1),
            )  # NULLs cluster in bucket 0
        span = maxs[c] - mins[c]
        if span <= 0:
            return F.lit(0)
        scaled = (F.col(c).cast("double") - F.lit(mins[c])) / F.lit(span) * F.lit(
            float(n_buckets)
        )
        return F.least(F.floor(scaled).cast("int"), F.lit(n_buckets - 1))

    # materialize each bucket once (a Python-side loop would otherwise
    # embed the quantization expression 2*bits times per column)
    staged = df
    for c in cols:
        staged = staged.withColumn(f"__b_{c}", bucket(c))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            # bit i of column j lands at position i*len(cols)+j
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(f"__b_{c}"), i)
                    .bitwiseAND(F.lit(1))
                    .cast("long"),
                    i * len(cols) + j,
                )
            )
    clustered = (
        staged.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__b_{c}" for c in cols])
    )
    return clustered, mins, maxs


def file_skip_fraction(
    spark: SparkSession, path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """Data-skipping audit via parquet FOOTER statistics — the actual
    mechanism a scan's row-group pruning uses: per file, the min/max of
    each predicate column across its row groups is read from metadata
    (pyarrow; ZERO data bytes touched), then intersected with the
    [lo, hi] box. Returns (files_matching, files_total). A well-clustered
    layout keeps files_matching << files_total for small boxes; a random
    layout intersects nearly every file. (``spark`` kept in the signature
    for call-site symmetry; the audit itself needs no Spark job.)"""
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    matching = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ok = True
        for c, (lo, hi) in predicates.items():
            cmin, cmax = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[c]).statistics
                if st is None or not st.has_min_max:
                    cmin, cmax = None, None
                    break
                cmin = st.min if cmin is None else min(cmin, st.min)
                cmax = st.max if cmax is None else max(cmax, st.max)
            if cmin is None:  # no stats -> cannot skip this file
                continue
            if not (cmax >= lo and cmin <= hi):
                ok = False
                break
        matching += int(ok)
    return matching, len(files)


class SnapshotConflictError(RuntimeError):
    """Another writer committed the same snapshot version first — the
    loser must re-read the latest manifest and retry, never overwrite."""


def _entry_files(entry: str) -> list[str]:
    """Data files of one manifest entry. An entry is either a data DIR
    (one per commit) or, after a file-pruned DELETE, an individual
    parquet FILE carried forward from a partially-rewritten commit."""
    import os

    if entry.endswith(".parquet"):
        return [entry]
    return [
        os.path.join(entry, f)
        for f in sorted(os.listdir(entry))
        if f.endswith(".parquet") and not f.startswith("_")
    ]


def _strip_file_uri(uri: str) -> str:
    """File URI (URL-encoded) -> local path. Handles BOTH spellings the
    engine emits: ``input_file_name()``'s ``file:///...`` and
    ``_metadata.file_path``'s single-slash ``file:/...``."""
    import re
    from urllib.parse import unquote, urlparse

    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:/", uri):
        return unquote(urlparse(uri).path)
    return uri


def _entry_stats(entry: str) -> dict:
    """{n_rows, n_bytes, n_files, cols} for one manifest entry, from
    parquet FOOTERS only (pyarrow metadata + getsize — zero data bytes).
    Called at commit time for entries the previous manifest has no stats
    for: the just-written delta dir (O(Δ)), file entries split out by a
    delete, or — once, self-healing — a legacy stats-less manifest.

    ``cols`` holds per-column [min, max] (Delta log data-skipping /
    Iceberg manifest column-stats analog) for every JSON-safe column
    whose stats are present in EVERY row group of the entry — the basis
    for pruning reads and deletes to overlapping entries without
    touching a single footer at query time."""
    import os

    import pyarrow.parquet as pq

    files = _entry_files(entry)
    n_rows, n_bytes = 0, 0
    cols: dict = {}
    nulls: dict = {}
    nulls_seen: dict = {}
    nulls_dropped: set = set()
    dropped: set = set()
    for f in files:
        md = pq.ParquetFile(f).metadata
        n_rows += md.num_rows
        n_bytes += os.path.getsize(f)
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for name, i in names.items():
            # per-column NULL counts (Delta nullCount analog): usable
            # only when EVERY row group of EVERY file reports one —
            # IS [NOT] NULL predicates then skip all-null / no-null
            # entries from the manifest alone
            if name not in nulls_dropped:
                nulls_seen[name] = nulls_seen.get(name, 0) + 1
                for rg in range(md.num_row_groups):
                    try:
                        st = md.row_group(rg).column(i).statistics
                        nc = None if st is None else st.null_count
                    except Exception:
                        nc = None
                    if nc is None:
                        nulls_dropped.add(name)
                        nulls.pop(name, None)
                        break
                    nulls[name] = nulls.get(name, 0) + int(nc)
            if name in dropped:
                continue
            for rg in range(md.num_row_groups):
                try:
                    st = md.row_group(rg).column(i).statistics
                    ok = (
                        st is not None
                        and st.has_min_max
                        and not isinstance(st.min, bool)
                        and isinstance(st.min, (int, float, str))
                        and type(st.min) is type(st.max)
                        # long text columns would bloat every manifest and
                        # are never useful pruning keys (Delta truncates at
                        # 32 chars; dropping is the simpler safe bound here)
                        and not (isinstance(st.min, str) and
                                 (len(st.min) > 64 or len(st.max) > 64))
                    )
                except Exception:
                    # pyarrow raises "Cannot extract statistics for type"
                    # lazily on .min for types it cannot cast (e.g.
                    # smallint) — such a column just has no usable stats
                    ok = False
                if not ok:
                    dropped.add(name)
                    cols.pop(name, None)
                    break
                lo, hi = cols.get(name, (st.min, st.max))
                if isinstance(lo, str) != isinstance(st.min, str):
                    # str in one file, numeric in another (evolved schema):
                    # no total order — drop rather than misprune
                    dropped.add(name)
                    cols.pop(name, None)
                    break
                cols[name] = (min(lo, st.min), max(hi, st.max))
    out = {
        "n_rows": int(n_rows),
        "n_bytes": int(n_bytes),
        "n_files": len(files),
        "cols": {k: [v[0], v[1]] for k, v in cols.items()},
    }
    # a column missing from SOME file of the entry (mixed-schema files)
    # would undercount: its null-filled rows read back NULL — drop the
    # stamp unless every file carried the column
    nulls = {k: v for k, v in nulls.items() if nulls_seen.get(k) == len(files)}
    if nulls:
        out["nulls"] = {k: int(v) for k, v in nulls.items()}
    return out


def _bloom_positions_expr(key_col: str, m: int, k: int):
    """The k bit positions of one key value — ``pmod(xxhash64(i, key), m)``
    for seed index i. Build and probe MUST use this same expression (the
    probe hashes its values through a tiny Spark job so the JVM xxhash64
    is bit-identical on both sides)."""
    from pyspark.sql import functions as F

    return F.array(*[
        F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(m)).cast("long")
        for i in range(k)
    ])


def _write_entry_bloom(spark, entry: str, key_col: str, path: str,
                       n_rows: int, bits_per_key: int = 16, k: int = 7,
                       name: str | None = None) -> dict:
    """Build the bloom sidecar for ONE immutable manifest entry (Delta
    bloom-filter index / Iceberg puffin-blob analog): one pass over the
    entry's key column collects its DISTINCT bit positions (the shuffle
    output is bounded by m bits, not by rows), the bitmap lands under
    ``path/_blooms/<entry-basename>.bloom`` via tmp+rename. m scales
    with the entry's stamped row count (~16 bits/key, k=7 → fpp ≈ 0.03%)
    so big commits do not saturate. The key column's Spark type is
    stamped into the meta: ``xxhash64`` is TYPE-SENSITIVE (the same
    value hashes differently as int vs long), so the probe must cast
    its values to exactly this type or every probe would miss and
    wrongly prune entries that DO hold the keys. Returns the JSON meta
    stored in the manifest's stats: {"key", "m", "k", "file", "dtype"}."""
    import os

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    m = max(1 << 13, 1 << int(np.ceil(np.log2(max(1, n_rows) * bits_per_key))))
    nbytes = m // 8

    # build DISTRIBUTED: each partition folds its positions into ONE
    # packed bitmap (mapInPandas accumulates across batches and yields
    # once), then a treeReduce ORs the per-partition bitmaps — never a
    # row per set bit, and the driver receives ONE bitmap instead of
    # #partitions of them
    def pack(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            if acc is None:
                acc = np.zeros(nbytes, dtype=np.uint8)
            p = pdf["p"].to_numpy().astype(np.int64)
            # big-endian bit-in-byte order, matching the packed probe
            np.bitwise_or.at(
                acc, p // 8, np.left_shift(1, 7 - (p % 8)).astype(np.uint8)
            )
        if acc is not None:
            yield pd.DataFrame({"bm": [acc.tobytes()]})

    def _or_bytes(a, b):
        import numpy as np

        return np.bitwise_or(
            np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    entry_df = spark.read.parquet(*_entry_files(entry))
    dtype = entry_df.schema[key_col].dataType.simpleString()
    bitmaps = (
        entry_df
        .select(F.explode(_bloom_positions_expr(key_col, m, k)).alias("p"))
        .mapInPandas(pack, schema="bm binary")
        .rdd.map(lambda r: bytes(r["bm"]))
    )
    try:
        packed = bitmaps.treeReduce(_or_bytes, depth=3)
    except ValueError:  # empty entry: nothing yielded, nothing set
        packed = bytes(nbytes)
    bloom_dir = os.path.join(path, "_blooms")
    os.makedirs(bloom_dir, exist_ok=True)
    # default name = the entry's basename; PARTITION entries pass an
    # explicit "<commit-dir>.<partition-subdir>.bloom" (subdir basenames
    # like __part_lang=en repeat across commits — the commit-dir prefix
    # keeps sidecars collision-free and lets GC drop them by prefix)
    name = name or (os.path.basename(os.path.normpath(entry)) + ".bloom")
    tmp = os.path.join(bloom_dir, "." + name + ".tmp")
    with open(tmp, "wb") as fh:
        fh.write(packed)
    os.replace(tmp, os.path.join(bloom_dir, name))
    return {"key": key_col, "m": m, "k": k, "file": name, "dtype": dtype}


# Sidecars at most this size are probed by one whole-file read; larger
# ones are probed by per-byte pread()s (a 100 M-row entry's sidecar is
# ~200 MB — reading it whole per probed entry would be the scan this
# pruning exists to avoid). Module-level so tests can force the seek path.
_BLOOM_WHOLE_READ_MAX = 4 << 20


def _bloom_probe_file(fp: str, pos_rows: list[list[int]]) -> tuple[bool, int]:
    """May ANY probe value be present in this sidecar? Bits are tested in
    PACKED form — never ``np.unpackbits`` (which would materialize 8× the
    file size on the driver). Small sidecars are read whole once; past
    ``_BLOOM_WHOLE_READ_MAX`` the probe pread()s exactly the bytes its
    positions land in, so probing a huge sidecar reads O(values·k) bytes,
    not the file. Returns (may_contain, bytes_read)."""
    import os

    size = os.path.getsize(fp)
    if size <= _BLOOM_WHOLE_READ_MAX:
        with open(fp, "rb") as fh:
            buf = fh.read()
        hit = any(
            all(buf[p >> 3] & (1 << (7 - (p & 7))) for p in r) for r in pos_rows
        )
        return hit, size
    read = 0
    cache: dict[int, int] = {}
    with open(fp, "rb") as fh:
        fd = fh.fileno()
        for r in pos_rows:
            ok = True
            for p in r:
                off = p >> 3
                b = cache.get(off)
                if b is None:
                    b = os.pread(fd, 1, off)[0]
                    cache[off] = b
                    read += 1
                if not (b & (1 << (7 - (p & 7)))):
                    ok = False
                    break
            if ok:
                return True, read
    return False, read


def _bloom_surviving_entries(
    spark, path: str, entries, stats: dict, key_col: str, values
) -> list:
    """Entries that MAY contain any of ``values`` in ``key_col`` per
    their bloom sidecars. Entries without a bloom for this key are never
    pruned (conservative). One tiny Spark job hashes the probe values
    per (m, k, dtype) variant present — the values are CAST to the key
    column's stamped Spark type first, because the build hashed the
    column's native type and xxhash64 is type-sensitive (an int/long
    mismatch would make every probe miss and wrongly prune entries that
    DO hold the keys). A value that cannot represent in the stamped type
    raises instead of pruning; legacy dtype-less sidecars never prune."""
    import os

    from pyspark.sql import functions as F

    variants = {}
    keep = set()
    for e in entries:
        b = (stats.get(e) or {}).get("bloom")
        if b and b["key"] == key_col and b.get("dtype"):
            variants.setdefault((b["m"], b["k"], b["dtype"]), []).append(
                (e, b["file"])
            )
        else:
            keep.add(e)  # no bloom / legacy untyped bloom: cannot skip
    if not variants:
        return list(entries)
    src = (
        "bigint" if all(isinstance(v, int) and not isinstance(v, bool)
                        for v in values)
        else "double" if all(isinstance(v, (int, float)) for v in values)
        else "string"
    )
    base_vals = spark.createDataFrame(
        [(v,) for v in values], f"{key_col} {src}"
    )
    for (m, k, dtype), group in variants.items():
        # try_cast: an unrepresentable value becomes NULL (caught below
        # with a clear message) instead of an ANSI cast exception
        vals_df = base_vals.select(
            F.col(key_col).try_cast(dtype).alias(key_col)
        )
        rows = vals_df.select(
            F.col(key_col).isNull().alias("bad"),
            _bloom_positions_expr(key_col, m, k).alias("ps"),
        ).collect()
        if any(r["bad"] for r in rows):
            raise ValueError(
                f"probe value(s) for {key_col!r} do not represent in the "
                f"bloom's stamped key type {dtype!r} — refusing to prune "
                "on a lossy cast"
            )
        pos_rows = [[int(p) for p in r["ps"]] for r in rows]
        for e, fname in group:
            fp = os.path.join(path, "_blooms", fname)
            if not os.path.exists(fp):  # sidecar lost: cannot skip
                keep.add(e)
                continue
            hit, _ = _bloom_probe_file(fp, pos_rows)
            if hit:
                keep.add(e)
    return [e for e in entries if e in keep]


def _entry_holds_any_key(stat: dict | None, col: str, sorted_vals: list) -> bool:
    """May this entry hold ANY of the (pre-SORTED) key values, per its
    stamped column min/max? Exact per-key containment — a key set
    spanning a far-out insert range does not inflate into one useless
    covering box — at O(log vals) per entry (bisect), so a 200k-entry
    manifest against thousands of keys stays trivially cheap on the
    driver. Missing stats, missing column, or un-comparable types mean
    CANNOT SKIP."""
    from bisect import bisect_left

    rng = (stat or {}).get("cols", {}).get(col)
    if rng is None:
        return True
    try:
        i = bisect_left(sorted_vals, rng[0])
        return i < len(sorted_vals) and sorted_vals[i] <= rng[1]
    except TypeError:  # stamped str vs numeric key (or vice versa)
        return True


def _entries_holding_keys_distributed(
    spark, keys: DataFrame, key: str, entries, stats: dict
) -> list:
    """Exact per-entry key containment for changesets TOO LARGE to
    enumerate on the driver: one range join of the (pinned) distinct-keys
    frame against a broadcast frame of the entries' stamped [min, max]
    boxes — the keys stay in executors, and the driver receives only the
    HIT entry indices (bounded by the manifest size, never the
    changeset). This is what keeps MERGE pruning exact at any changeset
    size without the driver-memory cliff of collecting a million keys
    (or the precision collapse of a single covering box).

    Safety rules (CANNOT SKIP ⇒ keep): entries without a stamped range
    for the key column; stamped types that do not compare cleanly with
    the key column (string boxes need a string key, numeric boxes a
    plain numeric key — int boxes join as exact bigint, never through a
    lossy double cast); any NaN key on a float/double column (NaN never
    appears in parquet min/max stats, so no containment proof exists).
    NULL keys never match a base row, so they are dropped before the
    join. Cost: a broadcast nested-loop range join, O(keys × boxed
    entries) spread over the cluster — fine for manifest-scale box
    counts; a table pushing ~10^5+ entries should carry a partition or
    bloom spec so earlier elimination shrinks the box side first."""
    from pyspark.sql import functions as F

    plain = list(entries)
    boxed: list = []
    for i, e in enumerate(plain):
        rng = (stats.get(e) or {}).get("cols", {}).get(key)
        if rng is not None:
            boxed.append((i, rng[0], rng[1]))
    if not boxed:
        return plain
    vals = [v for b in boxed for v in (b[1], b[2])]
    kdt = dict(keys.dtypes)[key]
    if all(isinstance(v, str) for v in vals):
        if kdt != "string":
            return plain  # stamped str vs non-str key: no safe order
        box_t = "string"
    elif all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
        if kdt not in ("tinyint", "smallint", "int", "bigint"):
            return plain  # int boxes + non-integral key: lossy compare
        box_t = "bigint"
    elif all(
        isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals
    ):
        if kdt not in ("float", "double"):
            return plain
        box_t = "double"
    else:
        return plain  # mixed/unknown stamped types: cannot skip
    probe = keys.where(F.col(key).isNotNull())
    if kdt in ("float", "double"):
        if probe.where(F.isnan(F.col(key))).limit(1).collect():
            return plain
    box_df = spark.createDataFrame(
        boxed, f"__i int, __lo {box_t}, __hi {box_t}"
    )
    hits = {
        r["__i"]
        for r in probe.join(
            F.broadcast(box_df),
            (F.col(key) >= F.col("__lo")) & (F.col(key) <= F.col("__hi")),
            "inner",
        ).select("__i").distinct().collect()
    }
    unboxed = {i for i, e in enumerate(plain)} - {b[0] for b in boxed}
    return [e for i, e in enumerate(plain) if i in hits or i in unboxed]


_ARROW_SPARK_DTYPES = {
    "int8": "tinyint", "int16": "smallint", "int32": "int",
    "int64": "bigint", "string": "string", "large_string": "string",
    "float": "float", "double": "double", "date32[day]": "date",
    "bool": "boolean",
}


def _arrow_dtype_str(t) -> str | None:
    """The Spark dtype string of an arrow type, for the types partition
    transforms accept (None = not transformable)."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "timestamp"
    return _ARROW_SPARK_DTYPES.get(str(t))


_SAFE_EXPR_TOKEN = None


_SAFE_EXPR_KEYWORDS = (
    # grouping/list keywords that legitimately precede '(' — everything
    # else followed by '(' is a function call and refuses
    "AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL", "TRUE", "FALSE",
    # typed-literal prefixes (DATE '2020-01-01') — never call syntax
    "DATE", "TIMESTAMP",
)


def _duckdb_safe_expr(expr: str) -> bool:
    """Is a CHECK-constraint expression in the conservative dialect
    where Spark SQL and DuckDB provably agree? Column refs, numeric and
    string literals, comparisons, arithmetic, AND/OR/NOT, IN lists,
    parenthesized groups, IS [NOT] NULL, BETWEEN, TRUE/FALSE, and
    DATE/TIMESTAMP typed literals — NO function calls (a non-keyword
    identifier followed by ``(``), no ``<=>``, no casts, and no LIKE
    (Spark's LIKE treats backslash as an escape, DuckDB's does not — a
    pattern with a backslash would pass the probe while violating the
    Spark-semantics constraint). Anything outside the whitelist returns
    False and the session-less commit path REFUSES rather than risking
    a cross-engine semantic drift."""
    import re

    global _SAFE_EXPR_TOKEN
    if _SAFE_EXPR_TOKEN is None:
        _SAFE_EXPR_TOKEN = re.compile(
            r"\s+"
            r"|'(?:[^']|'')*'"
            r"|[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
            r"|[A-Za-z_][A-Za-z0-9_]*"
            r"|<=>|<=|>=|<>|!=|[=<>+\-*/%(),]"
        )
    toks = []
    pos = 0
    while pos < len(expr):
        m = _SAFE_EXPR_TOKEN.match(expr, pos)
        if m is None:
            return False
        if not m.group().isspace():
            toks.append(m.group())
        pos = m.end()
    for i, t in enumerate(toks):
        if t == "<=>":
            return False  # Spark null-safe equality: not ANSI
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            continue
        if t.upper() in ("LIKE", "RLIKE", "ILIKE"):
            return False  # escape-semantics divergence (see docstring)
        if (t.upper() not in _SAFE_EXPR_KEYWORDS
                and i + 1 < len(toks) and toks[i + 1] == "("):
            return False  # function call: engines may disagree
    return True


def _duckdb_check_probe(files: list[str], constraints: dict) -> None:
    """CHECK-constraint probe of staged parquet WITHOUT a Spark session
    (the ``naru_snapshot`` DataSource commit worker): every constraint
    expression must pass ``_duckdb_safe_expr``, then DuckDB evaluates
    ``NOT (expr)`` over the staged bytes — the same rows Spark's
    ``where(~expr)`` selects (NULL predicates excluded by both;
    DuckDB's stricter arithmetic errors — division by zero, overflow —
    surface as refusals, never silent accepts). Known divergence: an
    arithmetic expression whose int64 product OVERFLOWS wraps in Spark
    but promotes to HUGEINT here, so a wrap-induced Spark-side
    "violation" could pass — constraints that can overflow 64 bits are
    the caller's sharp edge on every engine. Raises ValueError on a
    violation OR on anything un-probe-able (fail closed, mirroring
    write_snapshot's enforcement)."""
    unsafe = [n for n, e in constraints.items()
              if not _duckdb_safe_expr(e)]
    if unsafe:
        raise ValueError(
            f"CHECK constraint(s) {sorted(unsafe)} use syntax outside "
            "the session-free probe dialect — append via write_snapshot "
            "(which enforces them with Spark) instead"
        )
    import duckdb

    flist = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
    con = duckdb.connect()
    try:
        for name, expr in constraints.items():
            try:
                bad = con.execute(
                    f"SELECT * FROM read_parquet([{flist}]) "
                    f"WHERE NOT ({expr}) LIMIT 1"
                ).fetchall()
            except Exception as exc:
                raise ValueError(
                    f"CHECK constraint {name!r} ({expr}) could not be "
                    f"probed session-free ({exc}) — append via "
                    "write_snapshot instead"
                ) from None
            if bad:
                raise ValueError(
                    f"CHECK constraint {name!r} ({expr}) violated by "
                    f"staged row {bad[0]!r} — commit refused, data "
                    "removed"
                )
    finally:
        con.close()


def _parse_spec_string(s: str) -> dict | None:
    """One partition-spec element (Iceberg hidden-partitioning syntax)
    -> {"spec": canonical string, "col", "t", "param"}: a bare column
    name (identity), ``days(col)`` (epoch-day of a timestamp/date),
    ``bucket(n, col)`` (xxhash64 mod n), or ``truncate(w, col)`` (int
    floor-to-width / string prefix). The CANONICAL spelling is the
    per-entry stamp key, so writes, rewrites, and probes all compare
    the same string. None for anything unparseable."""
    import re

    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", s):
        return {"spec": s, "col": s, "t": "identity", "param": None}
    m = re.fullmatch(r"days\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)", s)
    if m:
        return {"spec": f"days({m.group(1)})", "col": m.group(1),
                "t": "days", "param": None}
    m = re.fullmatch(
        r"bucket\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)", s
    )
    if m:
        return {"spec": f"bucket({int(m.group(1))},{m.group(2)})",
                "col": m.group(2), "t": "bucket", "param": int(m.group(1))}
    m = re.fullmatch(
        r"truncate\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)", s
    )
    if m:
        return {"spec": f"truncate({int(m.group(1))},{m.group(2)})",
                "col": m.group(2), "t": "truncate",
                "param": int(m.group(1))}
    return None


def _parse_partition_spec(partition_by) -> list[dict]:
    """Parse ``write_snapshot(partition_by=...)`` — a spec element or a
    list of them — into spec dicts; raises on anything unparseable (a
    typo'd transform must not silently become an identity column)."""
    specs = (
        [partition_by] if isinstance(partition_by, str)
        else list(partition_by)
    )
    out = []
    for s in specs:
        sp = _parse_spec_string(str(s).strip())
        if sp is None:
            raise ValueError(
                f"unparseable partition spec element {s!r} — expected a "
                "column name, days(col), bucket(n, col), or "
                "truncate(w, col)"
            )
        out.append(sp)
    return out


_INT_DTYPES = ("tinyint", "smallint", "int", "bigint")


def _partition_transform_expr(sp: dict, dtype: str):
    """The WRITE-side Spark expression for one spec element — the value
    every row's partition directory is named by. Must stay in lockstep
    with ``_transform_probe_values`` (the probe side) or pruning would
    silently eliminate entries that hold matching rows."""
    from pyspark.sql import functions as F

    c = F.col(sp["col"])
    t = sp["t"]
    if t == "identity":
        return c
    if t == "days":
        if not (dtype.startswith("timestamp") or dtype == "date"):
            raise ValueError(
                f"days({sp['col']}) needs a timestamp/date column, "
                f"got {dtype!r}"
            )
        return F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01")))
    if t == "bucket":
        if dtype not in _INT_DTYPES + ("string",):
            raise ValueError(
                f"bucket(n, {sp['col']}) needs an int or string column, "
                f"got {dtype!r} (float keys don't hash stably)"
            )
        return F.pmod(F.xxhash64(c), F.lit(sp["param"])).cast("int")
    if t == "truncate":
        if dtype in _INT_DTYPES:
            return (c - F.pmod(c, F.lit(sp["param"]))).cast("bigint")
        if dtype == "string":
            return F.substring(c, 1, sp["param"])
        raise ValueError(
            f"truncate(w, {sp['col']}) needs an int or string column, "
            f"got {dtype!r}"
        )
    raise AssertionError(t)


def _parse_day(v) -> int | None:
    """Epoch-day number of a probe value (datetime/date/ISO string) —
    the Python twin of the ``days`` write expression. TZ-AWARE
    datetimes (what Catalyst pushes to the DataSource planner: UTC
    instants) convert to their UTC calendar date; naive values take the
    literal's calendar date, which matches the stamps only under a UTC
    session (``_non_utc_session`` guards that). None = unparseable
    (the caller must keep the entry)."""
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc)
        return (v.date() - datetime.date(1970, 1, 1)).days
    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    if isinstance(v, str):
        try:
            dt = datetime.datetime.fromisoformat(v)
        except ValueError:
            return None
        if dt.tzinfo is not None:
            dt = dt.astimezone(datetime.timezone.utc)
        return (dt.date() - datetime.date(1970, 1, 1)).days
    return None


def _non_utc_session() -> bool:
    """True when an ACTIVE Spark session runs a non-UTC timezone — the
    regime where naive day-probe literals don't mean UTC calendar dates
    and days-stamp pruning must stand down (keep everything; the real
    filter still applies, so results stay correct — only skipping is
    lost). No active session (the DataSource planning worker) returns
    False: pushed values there are tz-aware UTC instants."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    except Exception:
        return True  # live session, unknown tz: stand down (fail closed)
    return tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00")


def _transform_probe_values(spark, t: str, param, dtype, values):
    """Transformed probe values as dir-name strings, or None when any
    probe cannot be SAFELY transformed (type mismatch / unparseable —
    the caller keeps the entry, never wrongly prunes). ``bucket``
    hashes through the pure-Python XXH64 twin (``sources/xxh64.py``,
    bit-parity with the JVM asserted in tests), with probes cast to the
    STAMPED column dtype (xxhash64 is type-sensitive, exactly like the
    bloom sidecars) — no Spark job, so session-less contexts (the
    ``naru_snapshot`` DataSource planning worker) prune bucket stamps
    too; ``spark`` is accepted for signature stability only."""
    if t == "days":
        if _non_utc_session():
            return None  # naive probes aren't UTC days: cannot skip
        days = [_parse_day(v) for v in values]
        if any(d is None for d in days):
            return None
        return {str(d) for d in days}
    ints = all(
        isinstance(v, int) and not isinstance(v, bool) for v in values
    )
    strs = all(isinstance(v, str) for v in values)
    if t == "truncate":
        if ints and dtype in _INT_DTYPES:
            return {str(v - (v % param)) for v in values}
        if strs and dtype == "string":
            return {v[:param] for v in values}
        return None
    if t == "bucket":
        if not ((ints and dtype in _INT_DTYPES)
                or (strs and dtype == "string")):
            return None
        from naru_spark.sources.xxh64 import bucket_of

        buckets = {bucket_of(v, dtype, param) for v in values}
        if None in buckets:
            return None
        return {str(b) for b in buckets}
    return None


def _entry_stamp_for(stat: dict | None, col: str):
    """This entry's partition stamp for probe column ``col``: returns
    (stamp_key, spec dict) — the identity key or the transformed spec
    whose source column is ``col`` — or (None, None) when unstamped."""
    part = (stat or {}).get("partition") or {}
    if col in part:
        return col, {"spec": col, "col": col, "t": "identity",
                     "param": None}
    for k in part:
        sp = _parse_spec_string(k)
        if sp is not None and sp["t"] != "identity" and sp["col"] == col:
            return k, sp
    return None, None


def _partition_surviving_entries(
    spark, entries, stats: dict, col: str, values
) -> list:
    """Entries that MAY hold rows with ``col`` equal to some probe
    value, per their identity OR TRANSFORMED partition stamps (Iceberg
    hidden partitioning: the probe is the SOURCE-column value, the
    transform is applied here — the caller never materializes a derived
    column). Identity stamps compare as ``str(value)`` (the documented
    contract); transformed stamps transform the probes through the
    stamped dtype, keeping the entry whenever the transform cannot be
    applied safely. Unstamped entries always survive."""
    want_ident = {str(v) for v in values}
    cache: dict = {}
    kept = []
    for e in entries:
        st = stats.get(e)
        key, sp = _entry_stamp_for(st, col)
        if key is None:
            kept.append(e)
            continue
        if sp["t"] == "identity":
            if st["partition"][key] in want_ident:
                kept.append(e)
            continue
        dtype = (
            ((st.get("partition_meta") or {}).get(key)) or {}
        ).get("dtype")
        ck = (sp["t"], sp["param"], dtype)
        if ck not in cache:
            cache[ck] = _transform_probe_values(
                spark, sp["t"], sp["param"], dtype, list(values)
            )
        tw = cache[ck]
        if tw is None or st["partition"][key] in tw:
            kept.append(e)
    return kept


def _scope_entries(spark, dirs, stats: dict, partitions: dict) -> set:
    """Entries IN SCOPE for a partition-scoped maintenance pass (Delta
    ``OPTIMIZE ... WHERE``): probes are SOURCE-column values — identity
    stamps compare as ``str(value)`` (the historical contract),
    transformed stamps (days/bucket/truncate) transform the probes.
    OPPOSITE default to read-side pruning: an entry with no stamp for a
    probed column, or probes its transform cannot apply safely, is NOT
    in scope — a maintenance op touches less when unsure."""
    scope = set(dirs)
    cache: dict = {}
    for col, vals in partitions.items():
        vals = list(vals)
        ident = {str(v) for v in vals}
        keep = set()
        for e in scope:
            st = stats.get(e)
            key, sp = _entry_stamp_for(st, col)
            if key is None:
                continue
            if sp["t"] == "identity":
                if st["partition"][key] in ident:
                    keep.add(e)
                continue
            dtype = (
                ((st.get("partition_meta") or {}).get(key)) or {}
            ).get("dtype")
            ck = (sp["t"], sp["param"], dtype)
            if ck not in cache:
                cache[ck] = _transform_probe_values(
                    spark, sp["t"], sp["param"], dtype, vals
                )
            tw = cache[ck]
            if tw is not None and st["partition"][key] in tw:
                keep.add(e)
        scope = keep
    return scope


def _partition_range_surviving(entries, stats: dict, col: str, rng) -> list:
    """Entries that may hold rows with ``col`` in the [lo, hi] range
    (either side None = unbounded), per a ``days(col)`` transformed
    stamp — the hint that lets a TIMESTAMP-RANGE read prune day
    partitions without a materialized day column (``days`` is monotone,
    so day(lo) <= stamped day <= day(hi) is covering by construction).
    Entries with no days stamp for this column, and ranges that do not
    parse as dates, keep everything (cannot skip)."""
    lo, hi = rng
    if _non_utc_session():
        # a naive range literal under a non-UTC session is not a UTC
        # day range — stand down (correct, just unskipped)
        return list(entries)
    lo_d = _parse_day(lo) if lo is not None else None
    hi_d = _parse_day(hi) if hi is not None else None
    if (lo is not None and lo_d is None) or (
        hi is not None and hi_d is None
    ):
        return list(entries)
    kept = []
    for e in entries:
        key, sp = _entry_stamp_for(stats.get(e), col)
        if key is None or sp["t"] != "days":
            kept.append(e)
            continue
        try:
            d = int((stats.get(e) or {}).get("partition", {})[key])
        except (TypeError, ValueError):
            kept.append(e)  # NULL partition dir etc.: cannot skip
            continue
        if (lo_d is None or d >= lo_d) and (hi_d is None or d <= hi_d):
            kept.append(e)
    return kept


def _common_bloom_key(stats: dict, entries) -> str | None:
    """The single bloom key column shared by ALL given entries' sidecar
    metas, or None. Rewrite paths re-stamp their output under it, so a
    bloom-indexed table keeps its point-lookup pruning through
    deletes/merges/compactions (Delta OPTIMIZE rebuilds bloom indexes
    the same way) instead of silently degrading."""
    keys = [
        (((stats.get(e) or {}).get("bloom")) or {}).get("key")
        for e in entries
    ]
    if keys and all(k is not None and k == keys[0] for k in keys):
        return keys[0]
    return None


def _common_partition_col(stats: dict, entries) -> list[str] | None:
    """The identity-partition column list (single- or multi-column spec)
    shared by ALL given entries' stamps, or None. Rewrite paths (delete
    survivors, merge output, compaction) use it to re-commit their
    output under the SAME partition spec, so a partitioned table stays
    partitioned — and ``replace_where``-able — through its whole
    lifecycle. Returned sorted for a deterministic nesting order across
    rewrites."""
    cols = [
        tuple(sorted(((stats.get(e) or {}).get("partition") or {}).keys()))
        for e in entries
    ]
    if cols and all(c == cols[0] and c for c in cols):
        return list(cols[0])
    return None


def _entry_overlaps(stat: dict | None, prune: dict) -> bool:
    """Does an entry's stamped column range intersect the [lo, hi] box?
    Missing stats (legacy manifests), missing columns, or un-comparable
    stamped types mean CANNOT SKIP — the entry is treated as
    overlapping, never wrongly pruned."""
    for c, (lo, hi) in prune.items():
        rng = (stat or {}).get("cols", {}).get(c)
        if rng is None:
            continue
        try:
            if not (rng[1] >= lo and rng[0] <= hi):
                return False
        except TypeError:  # stamped str vs numeric box (or vice versa)
            continue
    return True


def _condition_prune_hints(condition: str) -> dict | None:
    """Derive COVERING entry-elimination hints from a WHERE string —
    Delta derives its file skipping from the predicate the same way,
    which is what removes the hand-written-hint footgun (a too-small
    hand box silently leaves matching rows alive).

    Only conditions PROVABLY a conjunction of simple terms are used:
    ``col op literal`` (op ∈ =, <, <=, >, >=), ``col IN (l1, l2, …)``,
    ``col BETWEEN a AND b``, ``col IS [NOT] NULL``, joined by top-level
    AND. Anything else — OR, NOT, LIKE, parentheses, casts, functions,
    arithmetic, column-to-column — returns None and the caller scans
    without elimination; a parsed conjunction is covering BY CONSTRUCTION
    (every row matching the whole condition matches each term, so
    pruning on any term's box/keys never drops a match). Returns
    {"prune": {col: (lo, hi)}, "keys": {col: [values]},
    "partitions": {col: [strings]}, "ranges": {col: (lo|None,
    hi|None)}, "nullness": {col: "isnull"|"notnull"}}: boxes from every term (±inf for one-sided numeric
    ranges; one-sided STRING ranges contribute nothing — no total
    order vs ±inf), key lists and partition strings from equality/IN
    terms only (partition values only for int/str literals — float
    dir-name round-trips are not exact), and STRING-literal ranges
    (one- and two-sided) for the ``days(col)`` transformed-stamp
    pruning."""
    import math
    import re

    token_re = re.compile(
        r"\s*("
        r"'(?:[^']|'')*'"            # SQL string literal ('' escape)
        r"|[A-Za-z_][A-Za-z_0-9]*"   # identifier / keyword
        r"|-?\d+\.\d+|-?\d+"         # number
        r"|<=|>=|!=|<>|=|<|>|\(|\)|,"
        r")"
    )
    s = condition.strip()
    toks, pos = [], 0
    while pos < len(s):
        m = token_re.match(s, pos)
        if not m:
            return None
        toks.append(m.group(1))
        pos = m.end()
    if not toks:
        return None

    keywords = {"and", "or", "not", "in", "between", "is", "null",
                "like", "true", "false"}

    def is_ident(t: str) -> bool:
        return bool(re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", t)) and (
            t.lower() not in keywords
        )

    def lit(t: str):
        if t.startswith("'") and t.endswith("'") and len(t) >= 2:
            return t[1:-1].replace("''", "'")
        try:
            return int(t)
        except ValueError:
            try:
                return float(t)
            except ValueError:
                return None

    i, n = 0, len(toks)
    terms: list = []  # (col, op, [literals])
    while True:
        if i >= n or not is_ident(toks[i]):
            return None
        col = toks[i]
        if i + 1 >= n:
            return None
        op = toks[i + 1].lower()
        if op in ("=", "<", "<=", ">", ">="):
            if i + 2 >= n:
                return None
            v = lit(toks[i + 2])
            if v is None:
                return None
            terms.append((col, op, [v]))
            i += 3
        elif op == "in":
            if i + 2 >= n or toks[i + 2] != "(":
                return None
            j, vals = i + 3, []
            while j < n and toks[j] != ")":
                v = lit(toks[j])
                if v is None:
                    return None
                vals.append(v)
                j += 1
                if j < n and toks[j] == ",":
                    j += 1
            if j >= n or not vals:
                return None
            terms.append((col, "in", vals))
            i = j + 1
        elif op == "between":
            if i + 4 >= n:
                return None
            lo_, kw, hi_ = (lit(toks[i + 2]), toks[i + 3].lower(),
                            lit(toks[i + 4]))
            if lo_ is None or kw != "and" or hi_ is None:
                return None
            terms.append((col, "between", [lo_, hi_]))
            i += 5
        elif op == "is":
            # col IS NULL / col IS NOT NULL
            if i + 2 < n and toks[i + 2].lower() == "null":
                terms.append((col, "isnull", []))
                i += 3
            elif (i + 3 < n and toks[i + 2].lower() == "not"
                    and toks[i + 3].lower() == "null"):
                terms.append((col, "notnull", []))
                i += 4
            else:
                return None
        else:
            return None
        if i == n:
            break
        if toks[i].lower() != "and":
            return None
        i += 1

    boxes: dict = {}
    keys: dict = {}
    parts: dict = {}
    dropped: set = set()
    sranges: dict = {}
    nullness: dict = {}

    def srange(col: str, lo, hi) -> None:
        # STRING-literal [lo, hi] (None = unbounded), intersected across
        # terms — feeds the days(col) transformed-stamp range pruning
        # (ISO timestamp/date strings order consistently with time, and
        # days() is monotone, so the day window is covering)
        if col in sranges:
            plo, phi = sranges[col]
            lo = plo if lo is None else (lo if plo is None else max(plo, lo))
            hi = phi if hi is None else (hi if phi is None else min(phi, hi))
        sranges[col] = (lo, hi)

    for col, op, vals in terms:
        if op in ("isnull", "notnull"):
            # contradictory null terms on one column: drop the hint
            # (the real filter yields the empty result either way)
            if nullness.get(col, op) != op:
                nullness.pop(col, None)
            else:
                nullness[col] = op
            continue
        numeric = all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in vals
        )
        stringy = all(isinstance(v, str) for v in vals)
        if not (numeric or stringy):
            return None  # mixed literal types in one IN list
        if op in ("=", "in"):
            vs = sorted(set(vals))
            if col in keys:
                keys[col] = sorted(set(keys[col]) & set(vs))
            else:
                keys[col] = vs
            if all(isinstance(v, (int, str)) for v in vs):
                ps = sorted({str(v) for v in vs})
                parts[col] = (
                    sorted(set(parts[col]) & set(ps))
                    if col in parts else ps
                )
            if stringy:
                srange(col, vs[0], vs[-1])
            lo, hi = vs[0], vs[-1]
        elif op == "between":
            if stringy:
                srange(col, vals[0], vals[1])
            lo, hi = vals
        elif op in ("<", "<="):
            if not numeric:
                srange(col, None, vals[0])
                continue  # one-sided string range: no usable box
            lo, hi = -math.inf, vals[0]
        else:  # > >=
            if not numeric:
                srange(col, vals[0], None)
                continue
            lo, hi = vals[0], math.inf
        if col in dropped:
            continue
        try:
            if col in boxes:
                lo = max(boxes[col][0], lo)
                hi = min(boxes[col][1], hi)
            boxes[col] = (lo, hi)
        except TypeError:  # str term and numeric term on one column
            boxes.pop(col, None)
            dropped.add(col)
    return {"prune": boxes, "keys": keys, "partitions": parts,
            "ranges": sranges, "nullness": nullness}


def _lit_matches_dtype(v, dtype: str | None) -> bool:
    """Does a parsed WHERE literal's Python type evaluate EXACTLY like
    the column's Spark dtype — i.e. is a string-compare of the stamped
    partition value / a bloom probe hashed under the stamped dtype
    guaranteed to agree with Spark's own (coercing) evaluation of the
    predicate? Spark evaluates ``string_col = 5`` by CASTING the column
    (row '05' matches, but the stamp '05' != str(5)), ``int_col = '05'``
    by casting the literal ('05' vs stamped '5'), and a timestamp
    partition stamps '2024-01-01 00:00:00' where the literal says
    '2024-01-01' — all silently prune entries that DO hold matching
    rows. Only an exact type-family match is provably coercion-free;
    anything else means the hint must be dropped (unpruned scan —
    correct, just unskipped)."""
    if dtype is None or isinstance(v, bool):
        return False
    if isinstance(v, int):
        return dtype in ("tinyint", "smallint", "int", "bigint")
    if isinstance(v, float):
        return dtype in ("float", "double")
    if isinstance(v, str):
        return dtype == "string"
    return False


def _first_entry_dtypes(entries) -> dict:
    """{column: spark simple dtype} from ONE parquet footer (the first
    data file of the first non-empty entry) — the cheapest source of
    column types for hint type-checking: zero Spark jobs, zero data
    pages. A column absent from this file (added by a later evolved
    commit) simply has no dtype here, so its hints drop (conservative:
    unpruned, never wrongly pruned)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for e in entries:
        files = _entry_files(e)
        if not files:
            continue
        out: dict = {}
        for f in pq.ParquetFile(files[0]).schema_arrow:
            t = f.type
            if pa.types.is_int8(t):
                d = "tinyint"
            elif pa.types.is_int16(t):
                d = "smallint"
            elif pa.types.is_int32(t):
                d = "int"
            elif pa.types.is_int64(t):
                d = "bigint"
            elif pa.types.is_float32(t):
                d = "float"
            elif pa.types.is_float64(t):
                d = "double"
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                d = "string"
            else:
                d = str(t)  # timestamp/date/binary/…: matches no literal
            out[f.name] = d
        return out
    return {}


def _typed_auto_hints(entries, hints: dict | None) -> dict | None:
    """Type-check AUTO-DERIVED hints against the table's column dtypes
    (ADVICE fix): partition-value and bloom-key hints are only kept for
    columns whose dtype exactly matches the literal's type — SQL type
    coercion makes any cross-type comparison unprovable from the stamp
    (see ``_lit_matches_dtype``). Min/max boxes stay untouched: their
    comparisons are numeric-vs-numeric (mathematically exact across
    int/float widths) or die on the TypeError-keeps guard in
    ``_entry_overlaps``. Hand-passed ``partitions``/``prune_keys``
    keep their documented str(value)/raise contracts — this filter
    guards only the hints nobody wrote down."""
    if not hints:
        return hints
    if not (hints.get("keys") or hints.get("partitions")):
        return hints
    dtypes = _first_entry_dtypes(entries)
    raw = hints.get("keys") or {}
    return {
        **hints,
        "keys": {
            c: vs for c, vs in raw.items()
            if vs and all(_lit_matches_dtype(v, dtypes.get(c)) for v in vs)
        },
        # the partition hint was stringified by the parser — type-check
        # through (and re-emit as) the SAME column's RAW equality
        # literals: identity stamps stringify them right back, while
        # transformed stamps (bucket above all) need the typed values
        "partitions": {
            c: raw[c] for c in (hints.get("partitions") or {})
            if raw.get(c)
            and all(_lit_matches_dtype(v, dtypes.get(c)) for v in raw[c])
        },
    }


def _dv_frame(spark, dvs: list) -> DataFrame:
    """Union of the pending deletion-vector sidecar frames — the
    positional (file, row-index) keys every reader anti-joins away.
    The sidecar schema is fixed by the writer (``__fp`` string /
    ``__ri`` bigint), so it is passed explicitly — no footer-inference
    job per read."""
    return spark.read.schema("__fp string, __ri bigint").parquet(
        *[d["dir"] for d in dvs]
    ).select("__fp", "__ri")


def _dv_remainder(
    spark, path: str, dvs: list, touched_uris: list, n: int
) -> tuple[list, str | None]:
    """The deletion-vector plane that SURVIVES a DV-aware partial
    rewrite (Delta's DV-aware DELETE/UPDATE/MERGE shape): the rewrite
    materializes the touched files' vectors out (their survivors are
    re-written without the dead rows), so only vectors pointing at
    CARRIED (untouched) files remain live. One anti-join of the pending
    vectors against the touched-file list — O(dv rows), never the table
    — consolidated into ONE new sidecar dir (stacked vectors compact as
    a side effect). Returns ``(carry_dvs, new_dir)``: an empty plane
    returns ``([], None)`` (the commit clears the vectors), and the
    caller must reclaim ``new_dir`` on a lost publish race."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    dv_all = _dv_frame(spark, dvs)
    t_df = spark.createDataFrame(
        [(u,) for u in touched_uris], "__fp string"
    )
    rem = dv_all.join(F.broadcast(t_df), "__fp", "left_anti")
    new_dir = os.path.join(path, "_dv", f"v{n}-{uuid.uuid4().hex[:8]}")
    rem.write.mode("error").parquet(new_dir)
    k = int(_entry_stats(new_dir)["n_rows"])  # footers only
    if k == 0:
        shutil.rmtree(new_dir)
        return [], None
    return [{"dir": new_dir, "seq": n, "n_rows": k}], new_dir


def _null_surviving_entries(entries, stats: dict, col: str,
                            kind: str) -> list:
    """Entries that may hold rows satisfying ``col IS [NOT] NULL`` per
    the stamped per-entry null counts (Delta nullCount analog) — the
    ONE implementation both read paths (read_snapshot's ``null_preds``
    and the DataSource's pushed IsNull/IsNotNull) share. Stampless
    entries and empty entries always survive."""
    kept = []
    for e in entries:
        st = stats.get(e) or {}
        nc = (st.get("nulls") or {}).get(col)
        n_rows = st.get("n_rows")
        if nc is None or not n_rows:
            kept.append(e)
        elif kind == "notnull" and nc < n_rows:
            kept.append(e)
        elif kind == "isnull" and nc > 0:
            kept.append(e)
    return kept


def _manifest_stats(man: dict) -> dict:
    """Per-entry stats for every entry of a loaded manifest, preferring
    the stats stamped at commit (metadata-only read) and falling back to
    a one-time footer walk for legacy manifests written before stats."""
    stamped = man.get("stats", {})
    return {e: (stamped.get(e) or _entry_stats(e)) for e in man["dirs"]}


def _parse_txn_id(txn_id: str) -> tuple[str, int]:
    """``"app:version"`` -> (app, version); a colon-free or non-numeric
    id is version 0 of its own app. The write path and the legacy-map
    migration MUST parse identically or replay idempotence breaks."""
    app, _, ver_s = txn_id.rpartition(":")
    return (app, int(ver_s)) if app and ver_s.isdigit() else (txn_id, 0)


def _normalize_txns(raw: dict) -> dict:
    """Upgrade a manifest's txns map to the bounded per-app format
    ``{app: {"v": last_version, "commit": snapshot_version}}``. Older
    manifests recorded one flat ``{txn_id: commit}`` entry per batch —
    without this migration a replayed old-format batch would be
    re-appended (silent double-count), and a colon-free legacy key would
    crash the replay check on ``rec["v"]``. Legacy entries for the same
    app keep the highest batch version."""
    txns: dict = {}
    for key, val in raw.items():
        if isinstance(val, dict):
            txns[key] = dict(val)
            continue
        app, ver = _parse_txn_id(key)
        rec = txns.get(app)
        if rec is None or ver > int(rec["v"]):
            txns[app] = {"v": ver, "commit": int(val)}
    return txns


def _latest_version(man_dir: str) -> int:
    """The highest committed manifest version — the read-latest idiom
    every snapshot entry point shares."""
    import os

    return max(
        int(f[1:-5]) for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    )


def _carry_planes(src: dict, manifest: dict, exclude: tuple = ()) -> None:
    """Copy the metadata-only planes (deletes / schema_ops /
    constraints / the cdf table property) a commit does not itself
    rewrite from the base manifest into the new one — ONE shared loop,
    so a newly added plane cannot be silently dropped by a missed copy
    site."""
    for plane in ("deletes", "schema_ops", "constraints", "cdf", "dvs"):
        if plane not in exclude and src.get(plane):
            manifest[plane] = src[plane]


def _normalized_schema_json(schema) -> dict:
    """A StructType as the json dict a parquet FOOTER inference would
    produce for the same files: every nullability flag forced true
    (footers do not record Spark nullability) and field metadata
    stripped. This is the manifest's ``schema`` stamp format — the
    Delta/Iceberg discipline of serving the table schema from the
    transaction log, so stamp-valid readers skip the footer-inference
    Spark job entirely and read EXACTLY what inference would have
    returned."""

    def norm(t):
        if isinstance(t, dict):
            k = t.get("type")
            if k == "struct":
                return {
                    "type": "struct",
                    "fields": [
                        {
                            "name": f["name"],
                            "type": norm(f["type"]),
                            "nullable": True,
                            "metadata": {},
                        }
                        for f in t.get("fields", [])
                    ],
                }
            if k == "array":
                return {
                    "type": "array",
                    "elementType": norm(t["elementType"]),
                    "containsNull": True,
                }
            if k == "map":
                return {
                    "type": "map",
                    "keyType": norm(t["keyType"]),
                    "valueType": norm(t["valueType"]),
                    "valueContainsNull": True,
                }
            if k == "udt":
                return t  # leave user-defined types verbatim
        return t

    return norm(schema.jsonValue())


def _stamped_schema(man: dict):
    """The manifest's schema stamp as a StructType, or None. Callers
    must apply their own guards (e.g. pending schema ops change LOGICAL
    names; the stamp is always the PHYSICAL file schema)."""
    js = man.get("schema")
    if not js:
        return None
    from pyspark.sql.types import StructType

    return StructType.fromJson(js)


def _entry_covered(entry: str, prev_entries: list[str]) -> bool:
    """True when ``entry`` is a previous manifest entry verbatim or a
    FILE/SUBDIR inside one (a partial rewrite splits files out of a dir
    entry — their physical schema is the parent's)."""
    import os

    for p in prev_entries:
        if entry == p or entry.startswith(p.rstrip(os.sep) + os.sep):
            return True
    return False


def _publish_manifest(man_dir: str, n: int, manifest: dict) -> None:
    """Atomic create-exclusive manifest publish shared by every commit
    path: write a hidden temp file, hard-link it to ``v{n}.json`` (the
    atomic claim — a concurrent winner makes the link fail), raise
    ``SnapshotConflictError`` for the loser. The caller cleans up any
    data it wrote before re-raising decisions.

    SCHEMA STAMP CARRY: a manifest that does not set ``schema`` itself
    inherits the predecessor's stamp when every entry it references is
    covered by the predecessor (metadata-only commits — constraints,
    MoR-delete predicates, DV planes, txn replays — and partial
    rewrites that only re-reference or split previous entries keep the
    physical schema by construction). Commits introducing uncovered
    entries publish WITHOUT a stamp — readers fall back to footer
    inference, never to a wrong schema."""
    import json
    import os
    import time
    import uuid

    # commit wall-clock, stamped at every publish path: what
    # read_snapshot(as_of=...) resolves against (Delta timestampAsOf).
    # Clamped monotone against the predecessor's stamp (Delta adjusts
    # commit timestamps the same way): an NTP step backwards must not
    # let as_of=t return a version committed after an earlier one
    prev_ts = 0.0
    prev_p = os.path.join(man_dir, f"v{n - 1}.json")
    if n > 1 and os.path.exists(prev_p):
        try:
            with open(prev_p) as fh:
                prev_man = json.load(fh)
            prev_ts = float(prev_man.get("ts", 0.0))
        except Exception:
            prev_man, prev_ts = {}, 0.0
        if "schema" not in manifest and prev_man.get("schema"):
            prev_dirs = prev_man.get("dirs", [])
            if all(
                _entry_covered(e, prev_dirs) for e in manifest.get("dirs", [])
            ):
                manifest["schema"] = prev_man["schema"]
    manifest.setdefault("ts", max(time.time(), prev_ts))
    tmp = os.path.join(man_dir, f".v{n}.{uuid.uuid4().hex[:8]}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    final = os.path.join(man_dir, f"v{n}.json")
    try:
        os.link(tmp, final)  # create-exclusive publish: racer loses loudly
    except FileExistsError:
        os.remove(tmp)
        raise SnapshotConflictError(
            f"version {n} was committed concurrently; "
            "re-read the latest manifest and retry"
        )
    os.remove(tmp)


def write_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "append",
    txn_id: str | None = None,
    base_version: int | None = None,
    carry: list[str] | None = None,
    bloom_key: str | None = None,
    partition_by: str | Sequence[str] | None = None,
    carry_partitions: dict | None = None,
    carry_blooms: dict | None = None,
    enforce_constraints: bool = True,
    op_meta: dict | None = None,
    cdf: bool = False,
    change_df: DataFrame | None = None,
    carry_dvs: list | None = None,
    carry_partition_meta: dict | None = None,
    rebase_attempts: int = 10,
) -> int:
    """SNAPSHOT write (Iceberg/Delta-lite time travel): each call lands
    its data files under a WRITER-UNIQUE dir ``path/data/v{N}-{token}/``
    (two racing writers never collide on data — only the manifest publish
    decides the winner, exactly the Iceberg/Delta commit model; a loser's
    orphan dir is unreferenced and swept by expire_snapshots) and commits
    a manifest
    ``path/_manifests/v{N}.json`` listing every data directory visible at
    version N — the previous manifest's list plus the new dir
    (``mode="append"``), or ONLY the new dir (``mode="replace"`` — a full
    rewrite of the logical table, e.g. a maintained materialized view;
    earlier versions stay time-travelable because their manifests and
    data dirs are immutable either way). Readers NEVER list the data
    tree — they read one manifest and open exactly the files it names.

    Commit protocol: the manifest is written to a hidden temp file and
    published with a CREATE-EXCLUSIVE hard link — if a concurrent writer
    already claimed v{N}, the link fails and ``SnapshotConflictError``
    is raised (the loser re-reads and retries); the winner's manifest is
    never clobbered. On a real object store the same atomic point is a
    conditional PUT (If-None-Match) on the manifest key.

    APPEND REBASE (Delta WriteSerializable): a BLIND append (no
    ``base_version``) that loses the race does NOT fail — its data dirs
    are immutable and writer-unique, so it simply re-reads the new head
    and re-publishes its already-written entries against it (planes,
    txn map, constraints and the cdf property re-derived from the new
    head; a concurrently-added CHECK re-probes the delta; a replayed
    txn discovered on rebase reclaims the duplicate and no-ops), up to
    ``rebase_attempts`` times. Two interleaved appenders — or an
    appender racing a compaction — BOTH land without re-running either
    job; DESCRIBE HISTORY shows the rebased commit with
    ``op_params.rebased``. Read-modify-write commits (``base_version``
    pinned, DV-plane rewrites) still raise: their CONTENT depends on
    the state they read, so only the caller can safely retry.

    ``txn_id`` (the Delta txnAppId/txnVersion pattern, ``"app:version"``):
    an idempotence token recorded in the manifest's ``txns`` map, which
    holds ONE entry per app — ``{app: {"v": last_version, "commit":
    snapshot_version}}`` — so the map is bounded by the number of writers,
    not by total batches ever processed (a cumulative per-batch map would
    grow manifests O(batches)). Re-committing an app version <= the
    recorded one is a NO-OP returning that app's last commit — this is
    what makes ``foreachBatch`` ingest exactly-once-by-content under
    Structured Streaming's at-least-once batch replay (a retried batch
    whose write succeeded but whose checkpoint commit did not is skipped,
    not double-appended). A txn_id with no numeric ``:version`` suffix is
    treated as version 0 of its own app (single-shot idempotence).

    ``base_version`` (optimistic concurrency for read-modify-write
    commits, e.g. compaction): when given, the commit is built against
    EXACTLY that manifest and claims version base+1 — if any other
    commit landed after the caller read ``base_version``, the
    create-exclusive publish of v{base+1} fails with
    ``SnapshotConflictError`` instead of silently superseding the
    interleaved commit's rows. Without it the commit chains onto
    whatever is latest at publish time (safe for blind appends only).

    ``carry`` (replace mode only): manifest entries from the base
    version to carry into the new manifest VERBATIM alongside the new
    data dir — the file-pruned DELETE/partial-rewrite shape, where
    untouched files are re-referenced, never rewritten. Entries may be
    data dirs or individual parquet files.

    Every manifest also stamps per-entry ``stats`` ({n_rows, n_bytes,
    n_files}, Iceberg manifest-stats analog) read from the parquet
    footers of the JUST-WRITTEN delta at commit time — O(Δ) metadata-only
    work; carried entries reuse the base manifest's stamped stats, so
    maintenance and stats readers never walk the data tree. The first
    commit over a legacy stats-less manifest back-fills stats with a
    one-time footer sweep (footers only, never data pages).

    ``partition_by`` (identity partition spec, Iceberg partition-field /
    Delta partitionBy analog; a column name or a LIST of them — the
    Iceberg multi-field spec, e.g. ``["date", "source"]``): the delta
    is written hive-partitioned on DUPLICATED columns
    (``__part_<col>=<val>`` subdirs, nested in spec order — the real
    columns stay in the data files, so each subdir reads back with the
    full schema), and EVERY LEAF partition dir becomes its own manifest
    entry stamped ``stats[entry]["partition"] = {col: "<val>", ...}``
    with one key per spec column, so pruning and ``replace_where``
    eliminate on any subset of the spec's columns.
    Partition-equality reads/deletes/``replace_where`` then eliminate
    entries on ONE manifest read — exact identity, no footer ever
    opened. Values are stamped as the directory-name STRING (compare
    with ``str(value)``; int/string/date partition columns round-trip
    exactly — avoid float partition columns). COMPOSES with
    ``bloom_key``: each partition entry gets its own sidecar, so a
    point-lookup DELETE/read eliminates first on partition identity,
    then on bloom membership inside the surviving partitions.

    ``cdf=True`` (Delta ``delta.enableChangeDataFeed``): marks the table
    CHANGE-DATA-FEED enabled — a TABLE PROPERTY carried by every later
    commit. From then on, row-rewriting ops (DELETE, MERGE) persist
    their per-row changes under ``path/_changes/`` and
    ``read_snapshot_changes(row_level=True)`` serves any version range
    as typed change rows — including through replace commits. Appends
    and replaces need no change files (their changes reconstruct from
    the manifest diff alone). ``change_df`` is the internal channel
    those ops use to hand their change rows (already carrying
    ``_change_type``) into the same atomic commit: written before the
    manifest publish, cleaned up with the data on a lost race, ignored
    entirely when the property is off."""
    import json
    import os
    import shutil
    import uuid

    assert mode in ("append", "replace"), mode
    assert carry is None or mode == "replace", "carry is a replace-mode refinement"
    man_dir = os.path.join(path, "_manifests")
    os.makedirs(man_dir, exist_ok=True)
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    base = versions[-1] if versions else 0
    if base_version is not None:
        assert base_version == 0 or base_version in versions, (
            f"base_version {base_version} was never committed at {path}"
        )
        base = base_version
    prev, txns, prev_stats, prev_deletes = [], {}, {}, []
    prev_dvs: list = []
    constraints: dict = {}
    prev_schema = None
    cdf_on = cdf
    if base:
        with open(os.path.join(man_dir, f"v{base}.json")) as fh:
            latest = json.load(fh)
        # change-data-feed is a TABLE PROPERTY: once on, every commit
        # carries it (Delta's enableChangeDataFeed semantics)
        cdf_on = cdf or bool(latest.get("cdf"))
        prev_dvs = latest.get("dvs", [])
        txns = _normalize_txns(latest.get("txns", {}))
        prev_stats = latest.get("stats", {})
        prev_schema = latest.get("schema")
        prev_deletes = latest.get("deletes", [])
        # CHECK constraints are a TABLE property: every commit carries
        # them, append or replace alike (Delta semantics)
        constraints = latest.get("constraints", {})
        if mode == "append":
            prev = latest["dirs"]
    # merge-on-read delete predicates: appends carry them (they pin the
    # dirs they were committed against, so new data is unaffected); a
    # replace commit is the new truth and clears them — EXCEPT a partial
    # rewrite (carry), which re-references old files and would resurrect
    # their logically-deleted rows: refuse, compaction materializes first
    deletes = prev_deletes if mode == "append" else []
    if carry is not None and prev_deletes:
        raise ValueError(
            f"partial-rewrite commit over {len(prev_deletes)} pending "
            "merge-on-read delete(s) at " + path + " — carried files would "
            "resurrect logically-deleted rows; compact_snapshot first to "
            "materialize them"
        )
    # deletion vectors follow the same rules as predicate deletes: an
    # append carries them (new files hold no DV rows), a replace is the
    # new truth and clears them. A partial rewrite (carry) would
    # resurrect the positionally-deleted rows of its carried files once
    # the plane clears — UNLESS the caller is a DV-AWARE rewrite
    # (DELETE/UPDATE/MERGE composing over pending vectors): it passes
    # ``carry_dvs``, the plane that remains after materializing the
    # touched files' vectors out (possibly [] — all vectors consumed),
    # and that list is committed verbatim.
    dvs = prev_dvs if mode == "append" else []
    if carry_dvs is not None:
        dvs = carry_dvs
    elif carry is not None and prev_dvs:
        raise ValueError(
            f"partial-rewrite commit over {len(prev_dvs)} pending "
            "deletion vector(s) at " + path + " — carried files would "
            "resurrect positionally-deleted rows; "
            "compact_snapshot(full=True) materializes them"
        )
    prev_ops = latest.get("schema_ops", []) if base else []
    if carry is not None and prev_ops:
        raise ValueError(
            f"partial-rewrite commit over {len(prev_ops)} pending schema "
            "op(s) at " + path + " — carried file entries fall outside the "
            "ops' pinned sets and would read under stale physical names; "
            "compact_snapshot first to materialize them"
        )
    schema_ops = prev_ops if mode == "append" else []
    if carry is not None:
        prev = list(carry)
    if txn_id is not None:
        app, ver = _parse_txn_id(txn_id)
        rec = txns.get(app)
        if rec is not None and ver <= int(rec["v"]):
            return int(rec["commit"])  # replayed batch: already committed
    n = base + 1
    data_dir = os.path.join(path, "data", f"v{n}-{uuid.uuid4().hex[:8]}")
    part_specs = (
        _parse_partition_spec(partition_by) if partition_by else None
    )
    if part_specs is not None:
        df_dtypes = dict(df.dtypes)
        for sp in part_specs:
            if sp["col"] not in df_dtypes:
                raise ValueError(
                    f"partition spec {sp['spec']!r} names unknown column "
                    f"{sp['col']!r} — the frame has {sorted(df_dtypes)}"
                )
        if any(sp["t"] == "days" for sp in part_specs):
            # days() write (datediff of a session-tz date cast) and
            # probe (_parse_day: the literal's calendar date) only agree
            # when the session runs UTC — a non-UTC session would stamp
            # local-date day numbers and wrongly prune near-midnight
            # timestamps, so FAIL CLOSED instead of mispruning later
            tz = df.sparkSession.conf.get(
                "spark.sql.session.timeZone", "UTC"
            )
            if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
                raise ValueError(
                    f"days(...) hidden partitioning requires a UTC "
                    f"session (spark.sql.session.timeZone={tz!r}): the "
                    "stamped day numbers are probed by calendar date, "
                    "which only matches the write-side date cast in UTC"
                )
        # physical partition column: identity keeps the historical
        # __part_<col> name; transforms sanitize the canonical spec
        # (days(ts) -> __part_days_ts). The spec string itself is the
        # STAMP key, mapped back positionally below.
        pcols = [
            "__part_" + (
                sp["col"] if sp["t"] == "identity"
                else sp["spec"].replace("(", "_").replace(")", "")
                .replace(",", "_")
            )
            for sp in part_specs
        ]
        staged = df
        for sp, pc in zip(part_specs, pcols):
            staged = staged.withColumn(
                pc, _partition_transform_expr(sp, df_dtypes[sp["col"]])
            )
        staged.write.mode("error").partitionBy(*pcols).parquet(data_dir)

        def _leaves(d: str, depth: int) -> list[str]:
            # one manifest entry per LEAF partition dir (multi-column
            # specs nest: __part_a=x/__part_b=y)
            if depth == len(pcols):
                return [d]
            return [
                leaf
                for child in sorted(os.listdir(d))
                if child.startswith(pcols[depth] + "=")
                for leaf in _leaves(os.path.join(d, child), depth + 1)
            ]

        new_entries = _leaves(data_dir, 0)
        if not new_entries:
            # an EMPTY delta (e.g. replace_where clearing partitions)
            # writes no partition subdirs — remove the husk dir (only
            # _SUCCESS inside) so the table never accumulates a data dir
            # no manifest references, which would trip
            # snapshot_stream_source's orphan check until gc_orphans runs
            shutil.rmtree(data_dir, ignore_errors=True)
    else:
        df.write.mode("error").parquet(data_dir)
        new_entries = [data_dir]
    if constraints and enforce_constraints and new_entries:
        # enforce CHECK constraints on the JUST-WRITTEN bytes (not on the
        # caller's plan, which would be a second evaluation of an
        # arbitrary frame, and not via a driver-side materialization):
        # ONE pushdown probe OR-combining every constraint (a K-CHECK
        # table pays one extra delta scan per commit, not K); only a hit
        # re-probes per constraint to name the culprit. Nothing is
        # published on refusal. Rewrite paths (compaction, delete
        # survivors) pass enforce_constraints=False — their rows already
        # passed at ingest, and add_snapshot_constraint validated the
        # whole table when the constraint appeared. An empty delta
        # (e.g. replace_where clearing partitions) has nothing to check.
        from functools import reduce

        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        spark = df.sparkSession
        # the delta was just written FROM df — its schema is known, so
        # the probe skips the footer-inference job
        written = spark.read.schema(
            _stamped_schema({"schema": _normalized_schema_json(df.schema)})
        ).parquet(*new_entries)
        try:
            any_bad = written.where(
                reduce(lambda a, b: a | b,
                       [~F.expr(e) for e in constraints.values()])
            ).limit(1).collect()
        except AnalysisException as exc:
            shutil.rmtree(data_dir)
            raise ValueError(
                f"a CHECK constraint of {path} no longer resolves "
                f"(renamed/dropped column?): {exc} — "
                "drop_snapshot_constraint to recover"
            ) from None
        except Exception:
            shutil.rmtree(data_dir)  # runtime failure: no orphan, but
            raise                     # report the REAL error untouched
        if any_bad:
            culprit = next(
                (
                    (cn, ce) for cn, ce in constraints.items()
                    if written.where(~F.expr(ce)).limit(1).collect()
                ),
                (next(iter(constraints)), next(iter(constraints.values()))),
            )
            shutil.rmtree(data_dir)
            raise ValueError(
                f"CHECK constraint {culprit[0]!r} ({culprit[1]}) violated "
                f"by written row {any_bad[0].asDict()!r} — commit refused, "
                "data removed"
            )
    if txn_id is not None:
        txns[app] = {"v": ver, "commit": n}
    # stats: reuse the base manifest's stamp for carried entries (file
    # entries split out of a dir by a delete, or legacy entries, compute
    # once from footers); the new delta dir is always a fresh footer
    # read. ``carry_partitions`` lets a partial-rewrite caller stamp the
    # identity-partition value onto file entries it split out of a
    # partition entry (the file inherits its parent's partition), and
    # ``carry_blooms`` the parent's bloom meta — the parent's sidecar is
    # a SUPERSET filter for any file inside it, so probing a split file
    # through it can only under-prune, never wrongly prune.
    stats = {}
    for e in prev:
        s = prev_stats.get(e) or _entry_stats(e)
        if carry_partitions and e in carry_partitions and "partition" not in s:
            s = {**s, "partition": carry_partitions[e]}
        if (carry_partition_meta and e in carry_partition_meta
                and "partition_meta" not in s):
            # transformed-spec dtype meta travels with the stamp (split
            # files inherit their parent's spec like the value itself)
            s = {**s, "partition_meta": carry_partition_meta[e]}
        if carry_blooms and e in carry_blooms and "bloom" not in s:
            s = {**s, "bloom": carry_blooms[e]}
        stats[e] = s
    for e in new_entries:
        stats[e] = _entry_stats(e)
        if part_specs is not None:
            from urllib.parse import unquote

            rel = os.path.relpath(e, data_dir).split(os.sep)
            stats[e]["partition"] = {
                part_specs[i]["spec"]: unquote(seg.split("=", 1)[1])
                for i, seg in enumerate(rel)
            }
            # transformed specs stamp the SOURCE column dtype: probe
            # transforms (bucket's xxhash64 above all) are type-
            # sensitive and must cast probes to exactly this type
            meta = {
                sp["spec"]: {"dtype": df_dtypes[sp["col"]]}
                for sp in part_specs if sp["t"] != "identity"
            }
            if meta:
                stats[e]["partition_meta"] = meta
    if bloom_key is not None:
        # key-membership sidecar for each NEW entry (Delta bloom index /
        # Iceberg puffin shape): one pass over the just-written delta's
        # key column; carried entries keep their existing bloom meta.
        # Point/IN-list reads and deletes then eliminate entries whose
        # bloom misses every probe value — the unclustered-layout
        # complement of the min/max box pruning. COMPOSES with
        # ``partition_by`` (a partitioned table with a point-lookup key
        # inside partitions — the core Delta shape): each partition
        # entry gets its OWN sidecar, named under the commit dir so
        # repeated subdir basenames never collide; one bounded pass per
        # partition entry — identity partitions are low-cardinality per
        # commit by design.
        for e in new_entries:
            stats[e]["bloom"] = _write_entry_bloom(
                df.sparkSession, e, bloom_key, path, stats[e]["n_rows"],
                name=(
                    None if part_specs is None else
                    f"{os.path.basename(data_dir)}."
                    + os.path.relpath(e, data_dir).replace(os.sep, ".")
                    + ".bloom"
                ),
            )
    change_dir = None
    if cdf_on and change_df is not None:
        # the commit's row-level change plane (Delta CDC files): written
        # BEFORE the manifest publish so the change rows are exactly as
        # atomic as the data — a lost race reclaims both below
        change_dir = os.path.join(
            path, "_changes", os.path.basename(data_dir)
        )
        change_df.write.mode("error").parquet(change_dir)
    # operation metadata (Delta history's operation/operationParameters):
    # every commit records WHAT produced it — callers (compaction, DELETE,
    # MERGE, replace_where) pass their own op_meta; a plain write stamps
    # its mode (plus whether a replace carried entries — the marker the
    # CDF reader uses to tell a pure overwrite, whose changes reconstruct
    # from the manifest diff, from a partial rewrite, whose cannot).
    # TABLE-SCHEMA STAMP (Delta/Iceberg log-serves-the-schema): vouch for
    # the stamp only when every referenced entry provably shares the
    # just-written delta's physical schema — first commit / pure replace
    # (delta is the whole table), or every prior entry already stamped
    # with the SAME schema. Anything else (evolving append, carry over an
    # unstamped base) publishes without a stamp and readers fall back to
    # footer inference. Stamp-valid reads skip the inference job.
    delta_schema = _normalized_schema_json(df.schema) if new_entries else None
    schema_stamp = None
    if new_entries:
        if not prev:
            schema_stamp = delta_schema
        elif prev_schema is not None and prev_schema == delta_schema:
            schema_stamp = delta_schema
    else:
        schema_stamp = prev_schema  # empty delta: entries unchanged
    manifest = {"version": n, "dirs": prev + new_entries, "txns": txns,
                "stats": stats,
                "op": op_meta or (
                    {"name": mode} if carry is None
                    else {"name": mode, "carry": True}
                )}
    if schema_stamp is not None:
        manifest["schema"] = schema_stamp
    if cdf_on:
        manifest["cdf"] = True
    if change_dir is not None:
        manifest["change_data"] = change_dir
        # per-commit change-plane schema (no propagation: each commit's
        # plane is its own files) — read_snapshot_changes skips the
        # footer job on every CDF tick
        manifest["change_schema"] = _normalized_schema_json(change_df.schema)
    if deletes:
        manifest["deletes"] = deletes
    if dvs:
        manifest["dvs"] = dvs
    if schema_ops:
        manifest["schema_ops"] = schema_ops
    if constraints:
        manifest["constraints"] = constraints
    new_stats = {e: stats[e] for e in new_entries}

    def _reclaim() -> None:
        # loser's orphan data: ours, safe to drop (already gone for an
        # empty partitioned delta), plus any sidecar/change plane it wrote
        shutil.rmtree(data_dir, ignore_errors=True)
        _drop_bloom(path, os.path.basename(data_dir))
        if change_dir is not None:
            shutil.rmtree(change_dir, ignore_errors=True)

    while True:
        try:
            _publish_manifest(man_dir, n, manifest)
            return n
        except SnapshotConflictError:
            # APPEND REBASE (Delta WriteSerializable's non-conflicting-
            # commit rule): a BLIND append that lost the publish race
            # re-reads the new head and re-commits its already-written
            # entries — data dirs are immutable and writer-unique, so
            # only the manifest link ever races; two interleaved
            # appenders (or an appender racing a compaction) BOTH land
            # without re-running either job. Pinned commits
            # (base_version — replace/DML/compaction reads a specific
            # state) and DV-plane rewrites still raise: their content
            # depends on the base they read, so the CALLER must re-read
            # and re-run (maintain_snapshot's retry loop does).
            if not (mode == "append" and base_version is None
                    and carry_dvs is None and rebase_attempts > 0):
                _reclaim()
                raise
            rebase_attempts -= 1
            head = _latest_version(man_dir)
            with open(os.path.join(man_dir, f"v{head}.json")) as fh:
                latest = json.load(fh)
            txns = _normalize_txns(latest.get("txns", {}))
            if txn_id is not None:
                rec = txns.get(app)
                if rec is not None and ver <= int(rec["v"]):
                    # the racer was our own replayed batch: already
                    # committed — reclaim the duplicate delta, no-op
                    _reclaim()
                    return int(rec["commit"])
                txns[app] = {"v": ver, "commit": head + 1}
            new_constraints = latest.get("constraints", {})
            if (new_constraints != constraints and new_constraints
                    and enforce_constraints and new_entries):
                # the interleaved commit changed the CHECK set: our
                # already-written delta must satisfy the NEW truth
                from functools import reduce

                from pyspark.sql import functions as F

                try:
                    bad = (
                        df.sparkSession.read.schema(_stamped_schema(
                            {"schema": _normalized_schema_json(df.schema)}
                        )).parquet(*new_entries)
                        .where(reduce(
                            lambda a, b: a | b,
                            [~F.expr(e) for e in new_constraints.values()],
                        ))
                        .limit(1).collect()
                    )
                except Exception as exc:
                    # unresolvable concurrently-added CHECK (or any
                    # probe failure): reclaim like the primary path
                    # instead of orphaning the delta with a raw error
                    _reclaim()
                    raise ValueError(
                        "a CHECK constraint added concurrently does not "
                        f"verify against the appended delta: {exc} — "
                        "commit refused, data removed"
                    ) from None
                if bad:
                    _reclaim()
                    raise ValueError(
                        "a CHECK constraint added concurrently is "
                        f"violated by appended row {bad[0].asDict()!r} — "
                        "commit refused, data removed"
                    )
            constraints = new_constraints
            cdf_on = cdf or bool(latest.get("cdf"))
            prev = latest["dirs"]
            prev_stats = latest.get("stats", {})
            n = head + 1
            stats = {e: prev_stats.get(e) or _entry_stats(e) for e in prev}
            stats.update(new_stats)
            op = dict(op_meta) if op_meta else {"name": mode}
            op["rebased"] = True
            manifest = {"version": n, "dirs": prev + new_entries,
                        "txns": txns, "stats": stats, "op": op}
            # re-vouch the schema stamp against the NEW head (same rule
            # as the primary path; a rebase is a blind append, so prev
            # is never empty here)
            prev_schema = latest.get("schema")
            if (new_entries and prev_schema is not None
                    and prev_schema == delta_schema):
                manifest["schema"] = delta_schema
            elif not new_entries and prev_schema is not None:
                manifest["schema"] = prev_schema
            if cdf_on:
                manifest["cdf"] = True
            if change_dir is not None:
                manifest["change_data"] = change_dir
                manifest["change_schema"] = _normalized_schema_json(
                    change_df.schema
                )
            for plane in ("deletes", "dvs", "schema_ops"):
                if latest.get(plane):
                    manifest[plane] = latest[plane]
            if new_constraints:
                manifest["constraints"] = new_constraints


def commit_staged_dir(
    path: str,
    data_dir: str,
    txn_id: str | None = None,
    op_meta: dict | None = None,
    rebase_attempts: int = 10,
    partition_by: Sequence[str] | None = None,
) -> int:
    """The COMMIT half of ``write_snapshot``, factored for writers that
    stage their data files themselves (the ``naru_snapshot`` DataSource
    writer: executor tasks write parquet straight into ``data_dir``,
    then the driver publishes here): a BLIND APPEND of the
    already-written dir with the same semantics as write_snapshot —
    txn replay no-ops (reclaiming the duplicate delta), CHECK
    constraints probe the staged bytes before anything publishes,
    planes/properties carry from the head, and a lost publish race
    REBASES onto the new head (the staged dir is immutable; only the
    manifest link races). An empty staged dir (a zero-row batch) is
    reclaimed and returns the current version without committing.

    ``partition_by`` (IDENTITY column names only — a staging writer
    cannot reproduce the JVM transforms): the staged dir holds
    ``__part_<col>=<val>`` leaf subdirs (nested in spec order); each
    leaf becomes its own stamped manifest entry exactly like
    ``write_snapshot(partition_by=...)``, so partition pruning and
    replace_where work on datasource-ingested tables too. Returns the
    committed version."""
    import json
    import os
    import shutil
    from urllib.parse import unquote

    man_dir = os.path.join(path, "_manifests")
    os.makedirs(man_dir, exist_ok=True)
    new_entries: list[str]
    part_stamp: dict = {}
    part_meta: dict = {}
    if partition_by:
        specs = _parse_partition_spec(list(partition_by))
        # physical leaf-dir names mirror write_snapshot's sanitization;
        # the CANONICAL spec string is the stamp key (positional map)
        pcols = [
            "__part_" + (
                sp["col"] if sp["t"] == "identity"
                else sp["spec"].replace("(", "_").replace(")", "")
                .replace(",", "_")
            )
            for sp in specs
        ]

        def _leaves(d: str, depth: int) -> list[str]:
            if depth == len(pcols):
                return [d]
            return [
                leaf
                for child in sorted(os.listdir(d))
                if child.startswith(pcols[depth] + "=")
                for leaf in _leaves(os.path.join(d, child), depth + 1)
            ]

        new_entries = (
            _leaves(data_dir, 0) if os.path.isdir(data_dir) else []
        )
        for e in new_entries:
            rel = os.path.relpath(e, data_dir).split(os.sep)
            part_stamp[e] = {
                specs[i]["spec"]: unquote(seg.split("=", 1)[1])
                for i, seg in enumerate(rel)
            }
        if any(sp["t"] != "identity" for sp in specs) and new_entries:
            # transformed specs stamp the SOURCE column dtype (probe
            # transforms are type-sensitive); the stage is ONE write
            # with one schema, so read ONE footer and stamp every leaf
            # entry with the same meta
            import pyarrow.parquet as pq

            first = next(
                (e for e in new_entries if _entry_files(e)), None
            )
            meta = {}
            if first is not None:
                sch = pq.ParquetFile(_entry_files(first)[0]).schema_arrow
                for sp in specs:
                    if sp["t"] == "identity":
                        continue
                    fld = (
                        sch.field(sp["col"])
                        if sp["col"] in sch.names else None
                    )
                    dt = (
                        _arrow_dtype_str(fld.type)
                        if fld is not None else None
                    )
                    if dt is None:
                        shutil.rmtree(data_dir, ignore_errors=True)
                        raise ValueError(
                            f"cannot stamp dtype for transformed spec "
                            f"{sp['spec']!r}: column {sp['col']!r} "
                            "missing or un-transformable in staged data"
                        )
                    meta[sp["spec"]] = {"dtype": dt}
            if meta:
                for e in new_entries:
                    part_meta[e] = meta
    else:
        new_entries = (
            [data_dir]
            if os.path.isdir(data_dir) and _entry_files(data_dir)
            else []
        )
    files = [f for e in new_entries for f in _entry_files(e)]
    if not files:
        shutil.rmtree(data_dir, ignore_errors=True)
        versions = [
            int(f[1:-5]) for f in os.listdir(man_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else 0
    new_stats = {}
    for e in new_entries:
        new_stats[e] = _entry_stats(e)
        if e in part_stamp:
            new_stats[e]["partition"] = part_stamp[e]
        if e in part_meta:
            new_stats[e]["partition_meta"] = part_meta[e]
    app = ver = None
    if txn_id is not None:
        app, ver = _parse_txn_id(txn_id)
    probed: dict | None = None
    attempts = rebase_attempts
    while True:
        versions = sorted(
            int(f[1:-5]) for f in os.listdir(man_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        head = versions[-1] if versions else 0
        if head:
            with open(os.path.join(man_dir, f"v{head}.json")) as fh:
                latest = json.load(fh)
        else:
            latest = {}
        txns = _normalize_txns(latest.get("txns", {}))
        if txn_id is not None:
            rec = txns.get(app)
            if rec is not None and ver <= int(rec["v"]):
                shutil.rmtree(data_dir, ignore_errors=True)
                return int(rec["commit"])
            txns[app] = {"v": ver, "commit": head + 1}
        constraints = latest.get("constraints", {})
        if constraints and constraints != probed:
            from functools import reduce

            from pyspark.sql import SparkSession
            from pyspark.sql import functions as F

            spark = SparkSession.getActiveSession()
            if spark is None:
                # the DataSource commit worker has no Spark session —
                # probe the staged bytes with DuckDB instead, in a
                # conservative whitelisted dialect where the engines
                # provably agree; anything outside it REFUSES (fail
                # closed) rather than publishing unverified rows
                try:
                    _duckdb_check_probe(files, constraints)
                except Exception:
                    shutil.rmtree(data_dir, ignore_errors=True)
                    raise
            else:
                bad = (
                    spark.read.parquet(*files)
                    .where(reduce(
                        lambda a, b: a | b,
                        [~F.expr(e) for e in constraints.values()]))
                    .limit(1).collect()
                )
                if bad:
                    shutil.rmtree(data_dir, ignore_errors=True)
                    raise ValueError(
                        f"CHECK constraint violated by staged row "
                        f"{bad[0].asDict()!r} — commit refused, data "
                        "removed"
                    )
            probed = constraints
        n = head + 1
        prev = latest.get("dirs", [])
        prev_stats = latest.get("stats", {})
        stats = {e: prev_stats.get(e) or _entry_stats(e) for e in prev}
        stats.update(new_stats)
        manifest = {"version": n, "dirs": prev + new_entries,
                    "txns": txns, "stats": stats,
                    "op": op_meta or {"name": "append"}}
        _carry_planes(latest, manifest)
        try:
            _publish_manifest(man_dir, n, manifest)
            return n
        except SnapshotConflictError:
            if attempts <= 0:
                shutil.rmtree(data_dir, ignore_errors=True)
                raise
            attempts -= 1


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
    prune: dict | None = None,
    prune_keys: dict | None = None,
    partitions: dict | None = None,
    as_of: float | None = None,
    partition_ranges: dict | None = None,
    null_preds: dict | None = None,
    branch: str | None = None,
    tag: str | None = None,
) -> DataFrame:
    """Time-travel read: open the manifest for ``version`` (latest when
    None) and read exactly its data directories — an old version stays
    readable forever regardless of later appends. ``as_of`` (Delta
    ``timestampAsOf``; mutually exclusive with ``version``) resolves to
    the LAST version whose commit wall-clock is <= the given epoch
    seconds — a time before the first commit raises; legacy stamps-less
    manifests count as arbitrarily old (always eligible).

    ``merge_schema=True`` unions the schemas across commits (Iceberg/
    Delta-style additive schema evolution: an append that introduced a
    new column reads back with NULLs for pre-evolution rows, and a
    time-travel read of a pre-evolution version still sees the ORIGINAL
    narrow schema because only that version's dirs are opened). Off by
    default — footer merging reads every file's footer up front, which
    a fixed-schema table should not pay.

    MERGE-ON-READ deletes: predicates recorded by
    ``delete_from_snapshot(mode="merge-on-read")`` are applied here —
    each predicate filters ONLY the entries that were visible when it
    was committed (sequence semantics: later appends are unaffected), as
    the NULL-safe survivor filter ``NOT cond OR cond IS NULL``. Entries
    are grouped by their applicable predicate set, so the plan is a
    union of a few filtered scans and Catalyst pushes each filter into
    its parquet scan (footer stats prune the untouched row groups — the
    read-side cost the MoR trade accepts until compaction clears it).

    ``prune={col: (lo, hi)}`` skips manifest entries whose stamped
    column min/max does not intersect the box — Delta's log-based data
    skipping: entry elimination happens on ONE manifest read, before
    Spark lists or opens anything, so a selective read on a clustered
    100 TB table plans against just the overlapping entries. This is an
    OPTIMIZATION HINT with the file_skip_fraction contract: the caller
    must still apply its real predicate (the box over-approximates);
    entries without stamped stats are never pruned.

    ``prune_keys={col: [values]}``: the point/IN-list twin — entries
    whose bloom sidecar (stamped by ``write_snapshot(bloom_key=...)``)
    misses every probe value are skipped, which prunes even UNCLUSTERED
    layouts where every entry's min/max box overlaps everything. Same
    hint contract; bloomless entries are never pruned.

    ``partitions={col: [values]}``: partition pruning for tables
    written with ``write_snapshot(partition_by=...)`` — entries whose
    STAMPED partition value matches no probe value are skipped on the
    manifest read alone, footer-free; unstamped entries are never
    pruned. Probes are always SOURCE-column values: identity stamps
    compare as ``str(value)`` (the documented contract), and HIDDEN-
    PARTITIONING transforms (Iceberg ``days(ts)`` / ``bucket(n, key)``
    / ``truncate(w, col)`` specs) apply the transform to the probes
    here — the caller never materializes a derived column. Same hint
    contract: the caller still applies its real predicate.

    ``partition_ranges={col: (lo, hi)}`` (either side None): range
    pruning against ``days(col)`` transformed stamps — a timestamp-
    range read prunes day partitions because ``days`` is monotone;
    stamps of any other kind ignore the hint (cannot skip)."""
    import json
    import os

    from pyspark.sql import functions as F

    # named refs: branch reroutes to the branch table; tag pins a main
    # version — a tag names one immutable main state, so combining it
    # with any other selector is a contradiction
    if tag is not None:
        if branch is not None or version is not None or as_of is not None:
            raise ValueError(
                "tag is mutually exclusive with branch/version/as_of"
            )
        version = resolve_tag(path, tag)
    if branch is not None:
        path = resolved_branch_path(path, branch)
    man_dir = os.path.join(path, "_manifests")
    if as_of is not None:
        if version is not None:
            raise ValueError("version and as_of are mutually exclusive")
        versions = sorted(
            int(f[1:-5]) for f in os.listdir(man_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        for v in reversed(versions):
            with open(os.path.join(man_dir, f"v{v}.json")) as fh:
                if json.load(fh).get("ts", 0.0) <= as_of:
                    version = v
                    break
        if version is None:
            raise ValueError(
                f"as_of={as_of} predates every commit at {path} "
                f"(earliest retained version: v{versions[0] if versions else '?'})"
            )
    if version is None:
        version = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{version}.json")) as fh:
        man = json.load(fh)
    dirs = man["dirs"]
    limit0 = False
    if prune or prune_keys or partitions or partition_ranges or null_preds:
        stats = man.get("stats", {})
        kept = list(dirs)
        if null_preds and not man.get("schema_ops"):
            # ``null_preds={col: "isnull"|"notnull"}`` — the stamped
            # per-entry NULL counts (Delta nullCount analog) skip
            # no-null entries for IS NULL and all-null entries for
            # IS NOT NULL; stampless entries always survive. STANDS
            # DOWN under pending rename/drop schema ops: a dropped-
            # then-re-added column reads back NULL for pre-op rows,
            # so a pre-op zero-null stamp would misprune (min/max
            # boxes are immune — NULL never matches a comparison)
            for col, kind in null_preds.items():
                if kind in ("notnull", "isnull"):
                    kept = _null_surviving_entries(kept, stats, col, kind)
        if partitions:
            for col, values in partitions.items():
                kept = _partition_surviving_entries(
                    spark, kept, stats, col, list(values)
                )
        if partition_ranges:
            for col, rng in partition_ranges.items():
                kept = _partition_range_surviving(kept, stats, col, rng)
        if prune:
            kept = [e for e in kept if _entry_overlaps(stats.get(e), prune)]
        if prune_keys:
            for col, values in prune_keys.items():
                kept = _bloom_surviving_entries(
                    spark, path, kept, stats, col, list(values)
                )
        if not kept:
            # nothing can match: empty frame, but built through the SAME
            # schema path as a non-empty read (mergeSchema + pending
            # rename/drop ops applied) — a raw limit(0) over the dirs
            # would expose stale physical column names downstream
            limit0 = True
        else:
            dirs = kept
    deletes = man.get("deletes", [])
    schema_ops = man.get("schema_ops", [])
    dvs = man.get("dvs", [])
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    elif not schema_ops:
        # manifest-served schema (Delta/Iceberg: the log, not the
        # footers, is the schema authority): a stamp-valid read skips
        # the footer-inference Spark job. The stamp is the PHYSICAL
        # schema, so pending rename/drop ops (applied below from
        # physical names) keep the inference path; merge_schema
        # requests footer unioning explicitly.
        stamped = _stamped_schema(man)
        if stamped is not None:
            reader = reader.schema(stamped)

    def dv_stamp(df: DataFrame) -> DataFrame:
        # positional identity must come from the RAW scan (before any
        # filter/union): (file, row-in-file) — Spark's parquet row
        # tracking, the same key the DV sidecars store
        return df.withColumn(
            "__fp", F.col("_metadata.file_path")
        ).withColumn("__ri", F.col("_metadata.row_index"))

    def dv_apply(df: DataFrame) -> DataFrame:
        # ONE anti-join against the union of the pending DV frames
        # (Iceberg v2 positional-delete apply): the vectors BROADCAST
        # (plan: BroadcastHashJoin LeftAnti BuildRight), so the table
        # side never shuffles — O(rows) scan + O(dv rows) broadcast. A
        # DV plane grown past the broadcast threshold degrades to a
        # shuffled anti-join, which is the signal to compact (the same
        # point Delta's tombstone-count heuristics trigger a rewrite)
        dv_df = _dv_frame(spark, dvs)
        return df.join(dv_df, ["__fp", "__ri"], "left_anti").drop(
            "__fp", "__ri"
        )

    if not deletes and not schema_ops:
        out = reader.parquet(*dirs)
        if dvs:
            out = dv_apply(dv_stamp(out))
        return out.limit(0) if limit0 else out
    d_applies = [set(d["dirs"]) for d in deletes]
    o_applies = [set(o["dirs"]) for o in schema_ops]
    groups: dict = {}
    for e in dirs:
        key = (
            tuple(i for i, a in enumerate(d_applies) if e in a),
            tuple(i for i, a in enumerate(o_applies) if e in a),
        )
        groups.setdefault(key, []).append(e)
    out = None
    for (dkey, okey), entries in groups.items():
        part = reader.parquet(*entries)
        if dvs:
            part = dv_stamp(part)  # before any filter: raw positions
        # replay this group's deletes AND rename/drop ops in COMMIT ORDER
        # (each item carries seq = its committing version): a delete
        # predicate references the LOGICAL schema of its own commit time,
        # so ops committed before it must have renamed the columns it
        # sees, and ops after it must not. Legacy manifests (no seq)
        # never mixed the planes, so their in-list order is total enough.
        items = sorted(
            [(deletes[i].get("seq", 0), 0, i, "del") for i in dkey]
            + [(schema_ops[i].get("seq", 0), 1, i, "op") for i in okey]
        )
        for _, _, i, kind in items:
            if kind == "del":
                c = F.expr(deletes[i]["cond"])
                part = part.where(~c | c.isNull())
            else:
                part = _apply_schema_ops(part, [schema_ops[i]])
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=merge_schema
        )
    if dvs:
        out = dv_apply(out)
    return out.limit(0) if limit0 else out


def read_snapshot_where(
    spark: SparkSession,
    path: str,
    condition: str,
    version: int | None = None,
    as_of: float | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Filtered snapshot read with AUTO-DERIVED entry elimination — the
    read-side sibling of the auto-pruned DELETE: the condition is
    parsed (``_condition_prune_hints``; provably-conjunctive terms
    only) into covering min/max boxes, identity-partition values, and
    bloom probe keys, the matching manifest entries are eliminated on
    ONE manifest read, and the SAME condition is applied as the real
    row filter on what remains (Catalyst pushes it into the scans). The
    caller writes ``read_snapshot_where(spark, path, "day = '…' AND
    key IN (…)")`` and gets Delta-style data skipping with no hint
    plumbing and no covering-box footgun; unparseable conditions
    simply scan unpruned (correct, just unskipped). Bloom probes that
    cannot represent in a sidecar's stamped type skip bloom pruning
    instead of raising (the auto contract)."""
    import json
    import os

    from pyspark.sql import functions as F

    hints = _condition_prune_hints(condition) or {}
    if hints.get("keys") or hints.get("partitions"):
        # type-check partition/key hints against the column dtypes (one
        # footer read) — coercion-unsafe hints drop, scan stays correct.
        # as_of reads check against the LATEST version's files: column
        # TYPES never change across versions (no type-change op), and a
        # renamed column simply loses its hints (conservative)
        man_dir = os.path.join(path, "_manifests")
        v = version if version is not None else _latest_version(man_dir)
        with open(os.path.join(man_dir, f"v{v}.json")) as fh:
            hints = _typed_auto_hints(json.load(fh)["dirs"], hints)
    prune = hints.get("prune") or None
    partitions = hints.get("partitions") or None
    ranges = hints.get("ranges") or None
    nullness = hints.get("nullness") or None
    keys = {c: v for c, v in (hints.get("keys") or {}).items() if v} or None
    try:
        out = read_snapshot(
            spark, path, version=version, as_of=as_of,
            merge_schema=merge_schema, prune=prune,
            partitions=partitions, prune_keys=keys,
            partition_ranges=ranges, null_preds=nullness,
        )
    except ValueError:
        if keys is None:
            raise
        # a probe value unrepresentable in some bloom's stamped dtype:
        # AUTO mode skips bloom pruning rather than raising (any other
        # ValueError — expired version, bad as_of — re-raises here)
        out = read_snapshot(
            spark, path, version=version, as_of=as_of,
            merge_schema=merge_schema, prune=prune, partitions=partitions,
            partition_ranges=ranges, null_preds=nullness,
        )
    return out.where(F.expr(condition))


def read_snapshot_changes(
    spark: SparkSession,
    path: str,
    from_version: int | None = None,
    to_version: int | None = None,
    row_level: bool = False,
    from_ts: float | None = None,
    to_ts: float | None = None,
) -> DataFrame:
    """Incremental scan (Iceberg incremental read / Delta CDF): changes
    committed AFTER ``from_version`` up to ``to_version`` (latest when
    None) — O(|delta|) I/O regardless of table size, the shape that lets
    downstream incremental consumers (IVM folds, backfills, CDC fan-out)
    consume a 100 TB table without ever re-scanning history.
    ``from_version=0`` means everything up to ``to_version``.

    Default (``row_level=False``, the append-only fast path): read
    EXACTLY the data directories added in the range. Append-mode
    manifests only — a replace commit rewrites the dir list, so the
    dir-set difference no longer means "the new rows"; that raises.
    Merge-on-read DELETE commits surface as an EMPTY delta here (row
    removals are not change events in this mode — the Delta
    stream-without-CDF caveat).

    ``row_level=True`` (Delta CHANGE DATA FEED): every commit in the
    range is served as typed change rows — the table's columns plus
    ``_change_type`` ('insert' | 'delete' | 'update_preimage' |
    'update_postimage'), ``_commit_version`` and ``_commit_timestamp``
    — INCLUDING through replace commits. Per commit, the cheapest exact
    source wins:

    - appends: the new entries read back as 'insert' (no change files —
      Delta serves append commits from the data the same way);
    - DELETE / MERGE on a ``cdf``-enabled table: the change plane the
      commit persisted under ``path/_changes/`` (``write_snapshot``'s
      ``change_df`` channel — survivor rewrites carry rows that did NOT
      change, so the manifest diff cannot express these);
    - ``replace_where`` / pure ``replace`` / ``restore``: reconstructed
      from the manifest diff alone — removed entries' rows are
      'delete', added entries' rows 'insert' (exact because these
      commits move WHOLE immutable entries; zero write-side cost);
    - compaction / clustering: skipped — a re-layout changes no rows
      (Delta dataChange=false);
    - anything else that mutated rows without a change plane (a DELETE
      or MERGE committed before ``cdf`` was enabled, a restore that
      flipped pending merge-on-read state) RAISES instead of silently
      under-reporting.

    TIMESTAMP ranges (Delta ``startingTimestamp``/``endingTimestamp``;
    each mutually exclusive with its version twin): ``from_ts`` resolves
    to the last version committed AT OR BEFORE the given epoch seconds
    (so the range serves everything committed strictly after that
    moment; a time before the first commit means "from the beginning"),
    ``to_ts`` to the last version committed at or before it.

    Cost scales with the CHANGED bytes of the range, never the table;
    schema evolution across the range unions by name (pre-evolution
    change rows surface NULL for later columns)."""
    import json
    import os

    from pyspark.sql import functions as F

    man_dir = os.path.join(path, "_manifests")

    def man_of(v: int) -> dict:
        p = os.path.join(man_dir, f"v{v}.json")
        if not os.path.exists(p):
            raise ValueError(
                f"version {v} of {path} is not retained (expired or "
                "never committed) — change ranges must start at a "
                "retained version (Delta raises the same way)"
            )
        with open(p) as fh:
            return json.load(fh)

    def dirs_of(v: int) -> list[str]:
        return [] if v == 0 else man_of(v)["dirs"]

    if from_ts is not None or to_ts is not None:
        if (from_ts is not None and from_version is not None) or (
            to_ts is not None and to_version is not None
        ):
            raise ValueError(
                "version and timestamp bounds are mutually exclusive "
                "per endpoint"
            )
        versions = sorted(
            int(f[1:-5]) for f in os.listdir(man_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        ts_of = {v: man_of(v).get("ts", 0.0) for v in versions}
        if from_ts is not None:
            from_version = 0
            for v in versions:
                if ts_of[v] <= from_ts:
                    from_version = v
        if to_ts is not None:
            to_version = None
            for v in versions:
                if ts_of[v] <= to_ts:
                    to_version = v
            if to_version is None:
                raise ValueError(
                    f"to_ts={to_ts} predates every commit at {path}"
                )
    if from_version is None:
        raise ValueError("one of from_version / from_ts is required")
    if to_version is None:
        to_version = _latest_version(man_dir)
    if from_version >= to_version:
        # a from_ts at/after the last commit resolves here too — raise
        # the same ValueError every other bad-bound case does (Delta's
        # startingTimestamp-after-last-commit error), never a bare
        # assert that python -O would strip
        raise ValueError(
            f"empty change range for {path}: resolved bounds "
            f"{from_version}..{to_version} — the range must end strictly "
            "after it starts (a from_ts at or after the last commit has "
            "no changes to serve)"
        )
    if not row_level:
        base, head = dirs_of(from_version), dirs_of(to_version)
        if not set(base) <= set(head):
            raise ValueError(
                f"versions {from_version}..{to_version} of {path} include "
                "a replace commit — the dir diff is not an append delta; "
                "read row-level changes (row_level=True) instead"
            )
        delta = [d for d in head if d not in set(base)]
        if not delta:
            # a range of metadata-only commits (merge-on-read deletes,
            # txn replays): no new rows — empty frame, table schema
            return spark.read.parquet(*head).limit(0)
        return spark.read.parquet(*delta)

    def entry_rows(entries: list[str], src_man: dict | None = None) -> DataFrame:
        # manifest-served schema when the owning manifest is stamped
        # (skips the footer-inference job); footer unioning otherwise
        st = _stamped_schema(src_man) if src_man else None
        r = (
            spark.read.schema(st) if st is not None
            else spark.read.option("mergeSchema", "true")
        )
        return r.parquet(*[f for e in entries for f in _entry_files(e)])

    prev_man = man_of(from_version) if from_version else {}
    pieces: list[DataFrame] = []
    for v in range(from_version + 1, to_version + 1):
        man = man_of(v)
        op = man.get("op") or {}
        prev_dirs, cur_dirs = prev_man.get("dirs", []), man["dirs"]
        removed = [d for d in prev_dirs if d not in set(cur_dirs)]
        added = [d for d in cur_dirs if d not in set(prev_dirs)]
        mor_changed = (
            man.get("deletes", []) != prev_man.get("deletes", [])
            or man.get("dvs", []) != prev_man.get("dvs", [])
        )
        old_man = prev_man
        prev_man = man
        frames: list[DataFrame] = []
        if man.get("change_data"):
            ch_reader = (
                spark.read.schema(_stamped_schema({"schema": man["change_schema"]}))
                if man.get("change_schema") else spark.read
            )
            frames.append(ch_reader.parquet(man["change_data"]))
        elif op.get("name") == "compact":
            pass  # re-layout: no row changed (Delta dataChange=false)
        elif mor_changed:
            raise ValueError(
                f"version {v} of {path} changed merge-on-read delete / "
                "deletion-vector state without a change plane (committed "
                "before cdf was enabled, or a restore across pending "
                "deletes) — cannot serve row-level changes for this range"
            )
        elif not removed and not added:
            pass  # metadata-only (constraints, schema ops, txn replays)
        elif not removed:
            frames.append(
                entry_rows(added, man).withColumn("_change_type",
                                                  F.lit("insert"))
            )
        elif (op.get("name") in ("replace", "replace_where", "restore")
              and not op.get("carry")):
            # whole-entry moves: the manifest diff IS the row-level diff
            frames.append(
                entry_rows(removed, old_man).withColumn("_change_type",
                                                        F.lit("delete"))
            )
            if added:
                frames.append(
                    entry_rows(added, man).withColumn("_change_type",
                                                      F.lit("insert"))
                )
        else:
            raise ValueError(
                f"version {v} of {path} rewrote files without a change "
                f"plane (op={op.get('name') or 'unknown'!r}) — enable "
                "the change data feed (write_snapshot(cdf=True)) before "
                "row-rewriting commits, or consume file-level appends"
            )
        for f_ in frames:
            pieces.append(
                f_.withColumn("_commit_version", F.lit(v).cast("int"))
                .withColumn(
                    "_commit_timestamp",
                    F.lit(man.get("ts")).cast("double"),
                )
            )
    if not pieces:
        anchor_v = to_version if dirs_of(to_version) else from_version
        anchor = dirs_of(anchor_v)
        if not anchor:
            raise ValueError(
                f"versions {from_version}..{to_version} of {path} hold no "
                "data entries to anchor an empty change frame's schema"
            )
        return (
            entry_rows(anchor, man_of(anchor_v)).limit(0)
            .withColumn("_change_type", F.lit(""))
            .withColumn("_commit_version", F.lit(0))
            .withColumn("_commit_timestamp", F.lit(None).cast("double"))
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def apply_cdf_to_aggregate(
    agg: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """Incremental view maintenance from a change data feed: fold one
    range of row-level changes (``read_snapshot_changes(row_level=True)``
    output) into a grouped COUNT+SUM aggregate WITHOUT touching the base
    table — the consumer shape the feed exists for at 100 TB: refreshing
    a downstream aggregate costs O(changes in the range), never a
    rescan, and works through UPDATEs, DELETEs, and replace commits that
    append-only IVM (stream_ivm_running_totals) cannot see.

    Sign algebra (the classic delta-processing rule): 'insert' /
    'update_postimage' rows contribute +1, 'delete' /
    'update_preimage' rows -1 — an update cancels its pre-image and
    adds its post-image, so COUNT is net-zero and every SUM moves by
    exactly the value delta. Groups whose count falls to 0 drop out,
    exactly what a full recompute would show (a SUM over NULLs in a
    surviving group stays NULL-correct because NULL measures contribute
    nothing on either sign). One shuffle on the group keys for the
    delta + one keyed full-outer merge with the prior state — both
    O(changes + |view|), the view being the small side by construction.

    ``agg`` schema contract: the key columns, ``count_col`` (bigint),
    and one ``sum_<c>`` column per entry of ``sums``. Bootstrap it with
    a full groupBy of the starting version; thereafter feed each new
    version range through here."""
    from pyspark.sql import functions as F

    keys = list(keys)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        changes.withColumn("__sign", sign)
        .groupBy(*keys)
        .agg(
            F.sum("__sign").alias("__dn"),
            *[
                F.sum(F.col(c) * F.col("__sign")).alias(f"__d_{c}")
                for c in sums
            ],
        )
    )
    merged = agg.join(delta, keys, "full_outer")
    new_n = (
        F.coalesce(F.col(count_col), F.lit(0))
        + F.coalesce(F.col("__dn"), F.lit(0))
    )
    out = merged.select(
        *keys,
        new_n.alias(count_col),
        *[
            # a NULL side contributes 0 ONLY when the other side has a
            # value: a group whose measures are all NULL (prior sum NULL,
            # delta sum NULL) must surface NULL, exactly what the full
            # recompute shows — coalescing both to 0 would fabricate a 0
            F.when(
                F.col(f"sum_{c}").isNull() & F.col(f"__d_{c}").isNull(),
                F.lit(None),
            )
            .otherwise(
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            )
            .alias(f"sum_{c}")
            for c in sums
        ],
    )
    return out.where(F.col(count_col) > 0)


def snapshot_stream_source(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Stream FROM a snapshot table (Delta's "stream from a table" /
    Iceberg streaming-read analog, the pair of the foreachBatch ingest
    path): a parquet file stream rooted at the table's data tree, so
    every future commit's files are discovered incrementally — each
    micro-batch carries exactly the newly committed rows, O(|delta|)
    per trigger however large the table.

    APPEND-ONLY tables only, enforced at start: a replace commit leaves
    its superseded dirs on disk (until expire_snapshots), and a file
    stream would re-read them as live data. Start-up verifies (1) every
    manifest's dir list is a superset of its predecessor's (no replace
    in history) and (2) no orphan data dirs exist outside the latest
    manifest (a conflict loser's leftovers) — both raise instead of
    silently streaming wrong rows. The same discipline must hold while
    the stream runs.

    Commit-visibility caveat: data files land BEFORE the manifest
    publish, so a trigger firing inside that window can emit rows of a
    version that is not yet (or, for a conflict loser, never) committed
    — and a stream STARTING in that window trips the orphan check. This
    convenience path therefore assumes quiesced commits during triggers
    (e.g. a single writer on a batch cadence). A consumer that needs
    strict committed-only reads under concurrent writers should poll
    manifests and feed ``read_snapshot_changes`` per new version
    instead — manifests are the source of truth; the file listing is
    not.

    Scale note: Spark's file source re-lists the directory tree each
    trigger and keeps a seen-files map in the checkpoint, so at very
    large file counts the LISTING (not the data) becomes the per-trigger
    cost — the same reason Delta streams from its transaction log
    instead. For tables past ~10^5 files, drive the consumer from the
    manifests instead: poll the latest version and feed
    ``read_snapshot_changes(spark, path, last_seen, latest)`` to the
    sink — O(new manifests) per poll, zero listing.

    ``schema`` defaults to the latest snapshot's (streams cannot infer)."""
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    assert versions, f"no snapshot committed at {path}"
    prev: list[str] = []
    for v in versions:
        with open(os.path.join(man_dir, f"v{v}.json")) as fh:
            man = json.load(fh)
        dirs = man["dirs"]
        if not set(prev) <= set(dirs):
            raise ValueError(
                f"snapshot history at {path} contains a replace commit "
                f"(v{v}); a file stream would re-read superseded data — "
                "stream only append-only snapshot tables"
            )
        prev = dirs
    if man.get("deletes"):
        raise ValueError(
            f"snapshot at {path} has {len(man['deletes'])} pending "
            "merge-on-read delete(s) — a file stream reads raw files and "
            "would resurrect the deleted rows; compact_snapshot first"
        )
    if man.get("dvs"):
        raise ValueError(
            f"snapshot at {path} has {len(man['dvs'])} pending deletion "
            "vector(s) — a file stream reads raw files and would "
            "resurrect the positionally-deleted rows; "
            "compact_snapshot(full=True) materializes them"
        )
    if man.get("schema_ops"):
        raise ValueError(
            f"snapshot at {path} has pending rename/drop schema ops — a "
            "file stream reads raw files under stale physical names; "
            "compact_snapshot first to materialize them"
        )
    data_root = os.path.join(path, "data")
    # compare commit-dir IDENTITIES (an entry may be a partition subdir
    # or a carried file a level below the commit dir it keeps alive)
    referenced = _referenced_dir_names(man_dir, versions={versions[-1]})
    orphans = set(os.listdir(data_root)) - referenced
    if orphans:
        raise ValueError(
            f"orphan data dirs not referenced by the latest manifest at "
            f"{path}: {sorted(orphans)} — run expire_snapshots first"
        )
    # a branch publish or shallow clone leaves the head referencing data
    # OUTSIDE this table's data tree — a file stream rooted at data/
    # would silently miss those rows (the exact failure class the checks
    # above raise on). compact_snapshot(full=True) localizes the data.
    real_root = os.path.realpath(data_root)
    foreign = [
        d for d in prev
        if not os.path.realpath(_strip_file_uri(d)).startswith(real_root + os.sep)
    ]
    if foreign:
        raise ValueError(
            f"latest snapshot of {path} references data outside its data "
            f"tree (e.g. {foreign[0]}) — a branch publish or shallow "
            "clone; a file stream would miss those rows. "
            "compact_snapshot(full=True) localizes the data, or poll "
            "read_snapshot_changes per version instead"
        )
    if schema is None:
        # manifest-served schema when stamped; footer inference otherwise
        schema = _stamped_schema(man) or spark.read.parquet(*prev).schema
    return (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(data_root)
    )


def _compaction_plan(
    man: dict, stats: dict, threshold: int,
    full: bool = False, zorder: bool = False, scope: set | None = None,
) -> dict:
    """The ONE place the compaction policy lives (compact_snapshot
    executes it; maintain_snapshot's trigger asks it what a compaction
    WOULD do, so the two can never drift): returns {"force_full",
    "under", "carried", "rewrite_files", "rewrite_bytes", "noop"}.
    Full rewrite is forced by the caller flag, by pending
    merge-on-read deletes / schema ops (materialization), or by
    clustering (a re-layout of every candidate); otherwise UNDER-SIZED
    candidates (stamped average file size below ``threshold``) are
    selected and a sub-2-file selection is a noop (nothing to merge —
    Delta OPTIMIZE skips single-file bins the same way). Pending
    DELETION VECTORS force nothing: the selective pass is DV-AWARE
    (rewritten entries materialize their vectors out, carried entries
    keep theirs — Delta OPTIMIZE over DVs behaves the same), so a
    100 TB table with a few vectors compacts its small files without a
    full-table materialization.

    ``scope`` (Delta ``OPTIMIZE ... WHERE``) restricts the candidate
    set to the given entries — everything else carries verbatim, and
    ``force_full`` then means "every IN-SCOPE entry rewrites" (the
    partition-scoped ZORDER shape: partitions are disjoint scan units,
    so clustering one of them never interleaves with the others'
    layout). A scoped pass over pending merge-on-read deletes / schema
    ops REFUSES: materialization must replay the whole log over every
    pinned entry, which a partial rewrite cannot (DVs compose — they
    are positional, not log-replayed)."""
    dirs = man["dirs"]
    pending = bool(man.get("deletes")) or bool(man.get("schema_ops"))
    if scope is not None and pending:
        raise ValueError(
            "partition-scoped compaction over pending merge-on-read "
            "delete(s) / schema op(s) — the pinned log must materialize "
            "over every entry it covers; run an unscoped "
            "compact_snapshot first"
        )
    candidates = dirs if scope is None else [e for e in dirs if e in scope]
    force_full = full or zorder or pending
    if force_full:
        under = list(candidates)
    else:
        under = [
            e for e in candidates
            if stats[e]["n_files"]
            and stats[e]["n_bytes"] / stats[e]["n_files"] < threshold
        ]
    carried = [e for e in dirs if e not in set(under)]
    rewrite_files = sum(stats[e]["n_files"] for e in under)
    return {
        "force_full": force_full,
        "under": under,
        "carried": carried,
        "rewrite_files": rewrite_files,
        "rewrite_bytes": sum(stats[e]["n_bytes"] for e in under),
        "noop": not under or (not force_full and rewrite_files < 2),
    }


def compact_snapshot(
    spark: SparkSession, path: str, target_files: int | None = None,
    target_file_bytes: int = 512 * 1024 * 1024,
    zorder_by: Sequence[str] | None = None,
    min_file_bytes: int | None = None,
    full: bool = False,
    partition_by: str | Sequence[str] | None = None,
    partitions: dict | None = None,
) -> dict:
    """Small-file compaction for a snapshot table (Iceberg
    ``rewrite_data_files`` / Delta OPTIMIZE analog), SELECTIVE by
    default — Delta OPTIMIZE's actual behavior: the manifest's stamped
    per-entry stats pick only the UNDER-SIZED entries (average file size
    below ``min_file_bytes``, default ``target_file_bytes``), their rows
    are bin-packed into right-sized files, and every right-sized entry
    is carried into the replace commit VERBATIM (byte-identical on
    disk, zero rewrite I/O). A 100 TB table that accumulated a few
    thousand small streaming-append files pays for THOSE files'
    bytes, never for the ~200k right-sized cold files. Content is
    identical either way, pre-compaction versions stay time-travelable,
    and the superseded small files become unreferenced-by-latest,
    reclaimed later by ``expire_snapshots``. A concurrent commit
    surfaces as ``SnapshotConflictError`` — the maintenance job
    re-reads and retries, exactly Iceberg's optimistic rewrite loop.

    FULL-rewrite mode (``full=True``, or forced automatically) rewrites
    the whole table; it is the MATERIALIZATION path and is forced when
    the manifest carries pending merge-on-read deletes or rename/drop
    schema ops (a carried file would bypass them — the rewrite applies
    the whole log and clears it) and when ``zorder_by`` is given
    (clustering is a GLOBAL re-layout: re-clustering only a fragment
    would interleave two incompatible orders and gut the file-skipping
    it buys).

    The rewrite uses ``coalesce`` (bin-packs existing partitions, NO
    shuffle) — at 100 TB compaction is I/O-bound rewriting, and a full
    repartition shuffle would double the data movement for no benefit.
    ``target_files`` defaults to ``ceil(rewritten bytes /
    target_file_bytes)`` (512 MB files), so a huge rewrite set compacts
    into MANY right-sized files with matching parallelism. File counts
    and sizes come from the manifest's stamped stats (metadata-only,
    never a data read). Rewritten entries lose their bloom sidecars
    (like any rewrite); carried entries keep theirs.

    ``zorder_by``: Delta ``OPTIMIZE ... ZORDER BY`` — the rewrite routes
    through the Morton-interleave clustering instead of coalesce, so the
    compacted files each cover a small hyper-rectangle of the clustered
    space and later scans' footer min/max pruning (and the file-pruned
    DELETE) touch far fewer files. Clustering pays the one range-exchange
    shuffle that any re-layout costs; content is unchanged, so the same
    oracle covers both modes.

    ``partitions={col: [values]}`` (Delta ``OPTIMIZE ... WHERE``): scope
    the pass to the entries whose STAMPED identity-partition value
    matches — compaction, and with ``zorder_by`` a CLUSTERING
    re-layout, of just the named hot partition(s); every out-of-scope
    entry carries byte-identical, so at 100 TB re-clustering one day's
    partition costs that partition's bytes, never the table (partitions
    are disjoint scan units — clustering one never interleaves with the
    others' layout, which is why scoped ZORDER is sound while
    fragment-scoped ZORDER of an unpartitioned table is not).
    Unstamped entries are NEVER in scope (a maintenance op touches less
    when unsure); pending merge-on-read deletes / schema ops refuse a
    scoped pass (materialization is whole-log).

    Returns {"version", "files_before", "files_after", "mode":
    "selective"|"full"|"noop", "files_rewritten", "entries_carried"}
    (a selective pass with nothing under-sized is a metadata-only noop
    that commits nothing; a scoped pass reports mode "selective")."""
    import json
    import math
    import os

    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        man = json.load(fh)
    dirs = man["dirs"]
    # file counts/sizes from the manifest's stamped stats — metadata only,
    # zero filesystem walks (legacy stats-less manifests back-fill once)
    stats = _manifest_stats(man)
    before = sum(s["n_files"] for s in stats.values())
    threshold = target_file_bytes if min_file_bytes is None else min_file_bytes
    scope = None
    if partitions is not None:
        want = {c: {str(v) for v in vals} for c, vals in partitions.items()}
        # transform-aware scope: probes are SOURCE-column values on
        # identity AND days/bucket/truncate specs alike
        scope = _scope_entries(spark, dirs, stats, partitions)
    plan = _compaction_plan(man, stats, threshold, full=full,
                            zorder=zorder_by is not None, scope=scope)
    force_full, under, carried = (
        plan["force_full"], plan["under"], plan["carried"]
    )
    if plan["noop"]:
        return {"version": latest, "files_before": before,
                "files_after": before, "mode": "noop",
                "files_rewritten": 0, "entries_carried": len(carried)}
    rewrite_files = plan["rewrite_files"]
    if target_files is None:
        target_files = max(
            1, math.ceil(plan["rewrite_bytes"] / target_file_bytes)
        )
    dvs_pending = man.get("dvs", [])
    carry_dvs: list | None = None
    new_dv_dir: str | None = None
    if force_full and scope is None:
        # read_snapshot (not a raw parquet read): pending merge-on-read
        # deletes, deletion vectors, and rename/drop ops are APPLIED by
        # the rewrite — full compaction is the materialization point
        # that clears every plane (the replace commit below writes them
        # empty). merge_schema: the rewrite must see the UNION of the
        # entries' schemas — a plain read lets one file's footer win
        # inference and silently drops columns added by later
        # (additively evolved) commits
        current = read_snapshot(spark, path, version=latest,
                                merge_schema=True)
    else:
        # no pending LOG planes (checked above / refused for scoped
        # passes): the rewrite set's raw files ARE their logical rows —
        # except pending deletion vectors, which COMPOSE (Delta
        # OPTIMIZE over DVs): the rewritten entries' dead rows
        # materialize out here, carried entries keep their vectors via
        # the remainder plane. mergeSchema for the same reason as the
        # full path — the set may span commits with additively-evolved
        # schemas, and the compacted entry must keep every column
        under_files = [f for e in under for f in _entry_files(e)]
        current = spark.read.option("mergeSchema", "true").parquet(
            *under_files
        )
        if dvs_pending:
            from pyspark.sql import functions as F

            current = (
                current
                .withColumn("__fp", F.col("_metadata.file_path"))
                .withColumn("__ri", F.col("_metadata.row_index"))
                .join(_dv_frame(spark, dvs_pending), ["__fp", "__ri"],
                      "left_anti")
                .drop("__fp", "__ri")
            )
            # the rewrite set's file URIs, taken from the SAME engine
            # column the vectors store (no path-spelling guesswork):
            # one zero-data-column pass over files we rewrite anyway
            uris = [
                r["__fp"] for r in spark.read.parquet(*under_files)
                .select(F.col("_metadata.file_path").alias("__fp"))
                .distinct().collect()
            ]
            carry_dvs, new_dv_dir = _dv_remainder(
                spark, path, dvs_pending, uris, latest + 1
            )
    if zorder_by is not None:
        rewritten, _, _ = _zorder_cluster(current, zorder_by, target_files)
    else:
        rewritten = current.coalesce(target_files)
    # a partitioned table's rewrite re-commits under the same identity
    # spec, so compaction never strips the partition stamps that
    # replace_where and partition pruning rely on (unless a pending
    # schema op just dropped/renamed the partition column away). An
    # explicit ``partition_by`` overrides the auto-detect — the way to
    # (re-)stamp a table whose entries mix specs: compact_snapshot(
    # full=True, partition_by=col).
    part_col = partition_by or _common_partition_col(stats, under)
    if isinstance(part_col, str):
        part_col = [part_col]
    if part_col is not None:
        # spec elements may be hidden-partitioning transforms — check
        # their SOURCE columns against the rewrite frame
        try:
            srcs = {sp["col"] for sp in _parse_partition_spec(part_col)}
        except ValueError:
            part_col = None  # legacy/foreign stamp keys: re-commit plain
        else:
            if not srcs <= set(rewritten.columns):
                part_col = None
    # ...and a bloom-indexed table's rewrite re-stamps fresh sidecars
    # for the compacted entries (Delta OPTIMIZE rebuilds bloom indexes),
    # so point-lookup pruning never degrades through maintenance —
    # composing with the partition spec (per-partition-entry sidecars)
    bkey = _common_bloom_key(stats, under)
    if bkey is not None and bkey not in rewritten.columns:
        bkey = None
    # base_version pins the rewrite to the manifest we actually read: an
    # append landing between our read and our publish makes the commit
    # raise instead of silently superseding (and later expiring) its rows
    try:
        version = write_snapshot(
            rewritten,
            path,
            mode="replace",
            base_version=latest,
            carry=carried if carried else None,
            partition_by=part_col,
            bloom_key=bkey,
            # content-identical rewrite: every row already passed its CHECKs
            enforce_constraints=False,
            op_meta={
                "name": "compact",
                "mode": "full" if force_full and scope is None else "selective",
                **({"zorder_by": list(zorder_by)} if zorder_by else {}),
                **({"partitions": {c: sorted(w) for c, w in want.items()}}
                   if partitions is not None else {}),
            },
            carry_dvs=carry_dvs,
        )
    except Exception:
        # reclaim the consolidated remainder-DV sidecar on ANY failed
        # commit (lost race, CHECK violation, write error) — it is only
        # referenced once the manifest publishes, so an un-published one
        # is orphan debris gc_orphans would otherwise have to sweep
        if new_dv_dir is not None:
            import shutil

            shutil.rmtree(new_dv_dir, ignore_errors=True)
        raise
    with open(os.path.join(man_dir, f"v{version}.json")) as fh:
        after = sum(
            s["n_files"] for s in _manifest_stats(json.load(fh)).values()
        )
    return {"version": version, "files_before": before, "files_after": after,
            "mode": "full" if force_full and scope is None else "selective",
            "files_rewritten": rewrite_files, "entries_carried": len(carried)}


def _occ_retry(fn):
    """Optimistic-concurrency retry for BLIND read-modify-write DML
    (Iceberg's optimistic rewrite loop / Delta's internal conflict
    retry): on ``SnapshotConflictError`` the operation re-reads the
    head and re-executes from scratch, up to ``retries`` more times
    (kwarg added to every decorated op, default 2). Safe because each
    attempt's partial state is reclaimed before the conflict propagates
    (write_snapshot drops the loser's data dir; the DV/change planes
    are rmtree'd by their writers), and each attempt re-reads the
    latest manifest first — so a DELETE racing an append simply
    re-plans over the new head and both land, serialized. An EXPLICIT
    ``base_version`` (the caller pinned a state) disables the loop:
    only the caller can decide whether its pinned read is still
    meaningful. Plain appends don't need this — they REBASE without
    re-running (see write_snapshot)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, retries: int = 2, **kwargs):
        for attempt in range(retries + 1):
            try:
                return fn(*args, **kwargs)
            except SnapshotConflictError:
                if attempt == retries or kwargs.get("base_version") is not None:
                    raise
        raise AssertionError("unreachable")

    return wrapper


@_occ_retry
def delete_from_snapshot(
    spark: SparkSession,
    path: str,
    condition: str,
    mode: str = "copy-on-write",
    prune: dict | None = None,
    prune_keys: dict | None = None,
    partitions: dict | None = None,
    auto_prune: bool = True,
) -> dict:
    """Row-level delete on a snapshot table (Delta ``DELETE FROM ...
    WHERE`` analog — the GDPR-delete shape): rows matching ``condition``
    are removed by committing the SURVIVORS as a replace-mode snapshot,
    pinned to the version read (``base_version`` — a concurrent commit
    raises instead of being silently thrown away). Pre-delete versions
    stay time-travelable until ``expire_snapshots``; Delta semantics on
    NULLs (a NULL condition never matches, so its row SURVIVES — plain
    ``filter(NOT cond)`` would wrongly drop it).

    FILE-PRUNED rewrite (Delta's actual delete path): ONE aggregate scan
    groups the matches by ``input_file_name()`` — the parquet reader's
    own footer min/max row-group pruning means non-matching files cost a
    footer read, never data pages — and only the files that hold at
    least one matching row are rewritten (their survivors land in the
    new commit's data dir). Every untouched file is carried into the new
    manifest VERBATIM as a file entry (byte-identical on disk, zero
    rewrite I/O), so a 0.1% delete on a predicate-clustered layout
    (Z-ORDER on the delete key) pays for the matching files, not the
    table. Returns {"version", "n_deleted", "files_rewritten",
    "files_carried"}.

    ``mode="deletion-vector"`` (Delta deletion vectors / Iceberg v2
    POSITIONAL deletes): one pushdown scan records the matched rows'
    (file, row-index) pairs — Spark's parquet row tracking — as a
    sidecar frame under ``path/_dv/``; ZERO data files rewritten at any
    table size, and every read drops the rows with ONE anti-join on the
    positional key. Compared to predicate-MoR the read cost is a keyed
    join on O(dv rows) — independent of predicate complexity and of how
    many deletes stack — and stacked DV deletes anti-join the prior
    vectors so a row is never re-counted or re-reported to the change
    data feed. Compaction materializes and clears the plane; the file
    stream source and partial-rewrite commits refuse while vectors are
    pending (raw files would resurrect the rows); pruning hints (hand
    or auto-derived) eliminate entries before the scan exactly like
    copy-on-write. Returns {"version", "n_deleted", "files_rewritten":
    0, "files_carried": len(entries)}.

    ``mode="merge-on-read"`` (Iceberg v2 / Hudi MoR shape): the delete
    is a METADATA-ONLY commit — the predicate is recorded in the
    manifest pinned to the entries visible at delete time, ZERO data
    bytes touched, O(1) at any table size. Readers apply the recorded
    predicates (Catalyst pushes them into the scan); rows appended
    AFTER the delete are unaffected (sequence semantics — each predicate
    pins its dirs); ``compact_snapshot`` materializes the deletes and
    clears them. The cost moves from the writer to readers — the right
    trade for frequent small deletes on a huge table; compaction
    restores read cost. Returns {"version", "n_deleted": None,
    "files_rewritten": 0, "files_carried": len(entries)} — counting
    matches would be the very scan this mode exists to skip.
    ``snapshot_stream_source`` refuses tables with pending MoR deletes
    (a file stream would resurrect the deleted rows), and copy-on-write
    deletes / partial rewrites over pending MoR deletes refuse for the
    same reason — compact first. MoR deletes COMPOSE with pending
    rename/drop schema ops: each delete and op carries ``seq`` (its
    committing version) and readers replay the merged log in commit
    order, so a predicate written after a rename references the renamed
    column. The predicate is resolved against the logical schema BEFORE
    the metadata publish — a typo'd condition raises instead of
    poisoning the manifest.

    ``prune={col: (lo, hi)}`` (copy-on-write only): manifest-stats entry
    elimination BEFORE the matching scan — entries whose stamped min/max
    misses the box are carried forward without opening a single footer,
    so at 100 TB the delete's one scan plans against the overlapping
    entries instead of footer-reading millions of files. CONTRACT: the
    box must COVER the predicate (every row the condition can match lies
    inside it — derive it from the condition, as Delta derives skipping
    boxes from the WHERE clause); rows outside a too-small box would
    silently survive. Returns extra keys "entries_scanned" /
    "entries_pruned" when given.

    PRUNE HINTS ARE AUTO-DERIVED FROM THE CONDITION ITSELF
    (``auto_prune``, on by default, like MERGE's): when no hand hints
    are passed and the condition parses as a conjunction of simple
    terms (``_condition_prune_hints`` — covering BY CONSTRUCTION),
    min/max boxes, identity-partition values, and bloom probe keys are
    derived and applied automatically — ``DELETE WHERE day = '...'``
    or ``key IN (...)`` eliminates entries on one manifest read with
    no caller hints and no footgun. Conditions the parser cannot prove
    conjunctive-simple (OR / NOT / functions / arithmetic) derive
    nothing and scan as before; auto bloom probes that cannot
    represent in a sidecar's stamped type skip bloom pruning instead
    of raising (the raise is the contract for EXPLICIT prune_keys
    only). Hand hints take precedence. The merge-on-read change-plane
    scan (cdf tables) reuses the same derivation."""
    import json
    import os

    from pyspark.sql import functions as F

    assert mode in ("copy-on-write", "merge-on-read", "deletion-vector"), mode
    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        man = json.load(fh)
    entries = man["dirs"]
    if mode == "merge-on-read":
        # resolve the predicate against the table's LOGICAL schema (a
        # limit-0 read_snapshot applies pending rename/drop ops; zero
        # data I/O) BEFORE publishing: a typo'd condition would otherwise
        # be committed metadata-only and poison every later read AND the
        # compaction that is the only path that clears pending deletes.
        # Only ANALYSIS errors (unresolvable column, parse error) mean a
        # bad condition — anything else (manifest I/O, missing files)
        # propagates untouched instead of masquerading as one
        from pyspark.errors import AnalysisException

        try:
            read_snapshot(spark, path, version=latest).limit(0).where(
                F.expr(condition)
            )
        except AnalysisException as exc:
            raise ValueError(
                f"merge-on-read delete predicate {condition!r} does not "
                f"resolve against the snapshot at {path}: {exc}"
            ) from None
        n = latest + 1
        change_dir = None
        if man.get("cdf"):
            # the change-data-feed materializes the MATCHED rows at
            # delete time (Delta does the same on deletion-vector
            # tables): one pushdown scan over the visible logical rows,
            # O(matched) bytes — the DATA plane stays metadata-only, so
            # the MoR trade (writer O(1), readers filter) is intact and
            # only feed consumers pay for their own row-level view
            import uuid

            h = _typed_auto_hints(
                entries,
                _condition_prune_hints(condition) if auto_prune else None,
            ) or {}
            change_df = (
                read_snapshot(spark, path, version=latest,
                              prune=h.get("prune") or None,
                              partitions=h.get("partitions") or None,
                              partition_ranges=h.get("ranges") or None)
                .where(F.expr(condition))
                .withColumn("_change_type", F.lit("delete"))
            )
            change_dir = os.path.join(
                path, "_changes", f"v{n}-{uuid.uuid4().hex[:8]}"
            )
            change_df.write.mode("error").parquet(change_dir)
        # seq = the committing version: readers replay deletes and
        # rename/drop ops in this order, so the two metadata-only planes
        # COMPOSE (a predicate written after a rename references the
        # renamed column; compaction materializes the whole log)
        manifest = {
            "version": n,
            "dirs": entries,
            "txns": _normalize_txns(man.get("txns", {})),
            "stats": man.get("stats", {}),
            "deletes": man.get("deletes", [])
            + [{"cond": condition, "dirs": entries, "seq": n}],
            "op": {"name": "delete", "mode": "merge-on-read",
                   "condition": condition},
        }
        if change_dir is not None:
            manifest["change_data"] = change_dir
        _carry_planes(man, manifest, exclude=("deletes",))
        try:
            _publish_manifest(man_dir, n, manifest)
        except SnapshotConflictError:
            if change_dir is not None:
                import shutil

                shutil.rmtree(change_dir, ignore_errors=True)
            raise
        return {"version": n, "n_deleted": None,
                "files_rewritten": 0, "files_carried": len(entries)}
    if man.get("schema_ops"):
        raise ValueError(
            f"snapshot at {path} has pending rename/drop schema ops — "
            f"the {mode} delete scans raw files under stale physical "
            "names; compact_snapshot first to materialize, or use "
            'mode="merge-on-read" (which composes with pending ops)'
        )
    if man.get("deletes"):
        raise ValueError(
            f"{mode} delete over {len(man['deletes'])} pending "
            f"merge-on-read delete(s) at {path} — the raw-file scan "
            "would see (and the rewrite/DV would re-report) logically-"
            "deleted rows; compact_snapshot first"
        )
    # pending deletion vectors COMPOSE with the copy-on-write rewrite
    # (Delta's DV-aware DELETE): the match scan and the survivor rewrite
    # both anti-join the vectors (a positionally-dead row can neither
    # re-match nor re-surface), touched files' vectors materialize out
    # with the rewrite, untouched files keep theirs — see _dv_remainder.
    # manifest-stats entry elimination: entries whose stamped min/max
    # misses the caller's box — or whose bloom sidecar misses every
    # probe key (``prune_keys={col: [values]}``, the unclustered-layout
    # complement) — carry forward with ZERO I/O (not even a footer
    # open); only surviving entries reach the matching scan. Same
    # contract as ``prune``: the values must cover the predicate's keys.
    pruned: list[str] = []
    scan_entries = entries
    stats = man.get("stats", {})
    auto_keys: dict | None = None
    auto_ranges: dict | None = None
    if (auto_prune and prune is None and prune_keys is None
            and partitions is None):
        # derive the hints from the condition itself (covering by
        # construction — see _condition_prune_hints), then type-check
        # them against the column dtypes (coercion-unsafe hints drop);
        # hand hints above take precedence
        hints = _typed_auto_hints(entries, _condition_prune_hints(condition))
        if hints:
            prune = hints["prune"] or None
            partitions = hints["partitions"] or None
            auto_keys = hints["keys"] or None
            auto_ranges = hints.get("ranges") or None
    if partitions:
        # partition elimination (``partitions={col: [values]}``, same
        # covering contract): exact match on the stamped value —
        # identity as the dir-name string, transformed specs through
        # the transform — zero data I/O; unstamped entries survive
        for col, values in partitions.items():
            scan_entries = _partition_surviving_entries(
                spark, scan_entries, stats, col, list(values)
            )
    if auto_ranges:
        # timestamp-range terms prune days(col) transformed stamps
        for col, rng in auto_ranges.items():
            scan_entries = _partition_range_surviving(
                scan_entries, stats, col, rng
            )
    if prune:
        scan_entries = [
            e for e in scan_entries if _entry_overlaps(stats.get(e), prune)
        ]
    if prune_keys:
        for col, values in prune_keys.items():
            scan_entries = _bloom_surviving_entries(
                spark, path, scan_entries, stats, col, list(values)
            )
    elif auto_keys:
        # auto-derived bloom probes: a value unrepresentable in some
        # sidecar's stamped dtype just skips bloom pruning (raising is
        # the explicit-prune_keys contract, not the auto path's)
        try:
            for col, values in auto_keys.items():
                if values:
                    scan_entries = _bloom_surviving_entries(
                        spark, path, scan_entries, stats, col,
                        list(values),
                    )
        except ValueError:
            pass
    hinted = bool(prune or prune_keys or partitions or auto_keys
                  or auto_ranges)
    if hinted:
        pruned = [e for e in entries if e not in set(scan_entries)]
    extra = (
        {"entries_scanned": len(scan_entries), "entries_pruned": len(pruned)}
        if hinted else {}
    )
    if not scan_entries:
        return {"version": latest, "n_deleted": 0,
                "files_rewritten": 0, "files_carried": 0, **extra}
    if mode == "deletion-vector":
        # POSITIONAL delete (Delta deletion vectors / Iceberg v2
        # positional deletes): ONE pushdown scan records the matched
        # rows' (file, row-index) pairs — Spark's parquet row tracking —
        # as a sidecar frame under path/_dv/; ZERO data files rewritten
        # at any table size, and readers drop the rows with one
        # anti-join. Unlike predicate-MoR, the read-side cost is a keyed
        # join on O(dv rows), independent of how complex the delete
        # predicate was, and DV deletes STACK exactly: a second DV scan
        # anti-joins the prior vectors so an already-deleted row is
        # never re-counted (or re-reported to the change data feed).
        import shutil
        import uuid

        raw = (
            spark.read.option("mergeSchema", "true")
            .parquet(*scan_entries)
            .withColumn("__fp", F.col("_metadata.file_path"))
            .withColumn("__ri", F.col("_metadata.row_index"))
            .where(F.expr(condition))
        )
        prior = man.get("dvs", [])
        if prior:
            raw = raw.join(_dv_frame(spark, prior), ["__fp", "__ri"],
                           "left_anti")
        n = latest + 1
        dv_dir = os.path.join(path, "_dv", f"v{n}-{uuid.uuid4().hex[:8]}")
        raw.select("__fp", "__ri").write.mode("error").parquet(dv_dir)
        n_deleted = int(_entry_stats(dv_dir)["n_rows"])  # footers only
        if n_deleted == 0:
            # Delta no-ops here too: nothing matched, nothing committed
            shutil.rmtree(dv_dir)
            return {"version": latest, "n_deleted": 0,
                    "files_rewritten": 0, "files_carried": 0, **extra}
        change_dir = None
        if man.get("cdf"):
            change_dir = os.path.join(
                path, "_changes", f"v{n}-{uuid.uuid4().hex[:8]}"
            )
            (
                raw.drop("__fp", "__ri")
                .withColumn("_change_type", F.lit("delete"))
                .write.mode("error").parquet(change_dir)
            )
        manifest = {
            "version": n,
            "dirs": entries,
            "txns": _normalize_txns(man.get("txns", {})),
            "stats": man.get("stats", {}),
            "dvs": prior + [{"dir": dv_dir, "seq": n,
                             "n_rows": n_deleted}],
            "op": {"name": "delete", "mode": "deletion-vector",
                   "condition": condition},
        }
        if change_dir is not None:
            manifest["change_data"] = change_dir
        _carry_planes(man, manifest, exclude=("dvs",))
        try:
            _publish_manifest(man_dir, n, manifest)
        except SnapshotConflictError:
            shutil.rmtree(dv_dir, ignore_errors=True)
            if change_dir is not None:
                shutil.rmtree(change_dir, ignore_errors=True)
            raise
        return {"version": n, "n_deleted": n_deleted,
                "files_rewritten": 0, "files_carried": len(entries),
                **extra}
    # mergeSchema: the scan may span additively-evolved commits, and a
    # condition naming a later-added column must resolve (pre-evolution
    # files read NULL for it) instead of depending on footer-inference
    # order — same reasoning as the compaction rewrite reads. Positional
    # identity (__fp/__ri) is stamped at scan level so pending deletion
    # vectors anti-join away BEFORE matching: an already-dead row must
    # not count as deleted (or reach the change feed) again.
    dvs_pending = man.get("dvs", [])
    df = (
        spark.read.option("mergeSchema", "true").parquet(*scan_entries)
        .withColumn("__fp", F.col("_metadata.file_path"))
        .withColumn("__ri", F.col("_metadata.row_index"))
    )
    if dvs_pending:
        df = df.join(_dv_frame(spark, dvs_pending), ["__fp", "__ri"],
                     "left_anti")
    cond = F.expr(condition)
    # one pushdown-pruned scan: which files hold matches, and how many
    per_file = (
        df.where(cond)
        .groupBy(F.col("__fp").alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_deleted = int(sum(r["n"] for r in per_file))
    if n_deleted == 0:
        # Delta no-ops here too: a no-match delete must not rewrite the
        # table, must not double storage until expiry, and must not plant
        # a replace commit that breaks incremental reads / stream follows
        # over the version range
        return {"version": latest, "n_deleted": 0,
                "files_rewritten": 0, "files_carried": 0, **extra}
    matching = {os.path.realpath(_strip_file_uri(r["f"])) for r in per_file}
    carried, touched, touched_entries = list(pruned), [], []
    carry_parts: dict = {}
    carry_meta: dict = {}
    carry_blooms: dict = {}
    for e in scan_entries:
        files = _entry_files(e)
        hit = [f for f in files if os.path.realpath(f) in matching]
        if not hit:
            carried.append(e)  # whole entry untouched: re-reference as-is
        else:
            touched.extend(hit)
            touched_entries.append(e)
            part = (stats.get(e) or {}).get("partition")
            pmeta = (stats.get(e) or {}).get("partition_meta")
            bloom = (stats.get(e) or {}).get("bloom")
            for f in files:
                if os.path.realpath(f) not in matching:
                    carried.append(f)
                    if part:  # split files inherit the parent's partition
                        carry_parts[f] = part
                    if pmeta:  # ...its transformed-spec dtype meta
                        carry_meta[f] = pmeta
                    if bloom:  # ...and its (superset) bloom sidecar
                        carry_blooms[f] = bloom
    # the LIVE rows of the touched files: positionally-dead rows (pending
    # DVs) drop before any branch — they neither survive the rewrite
    # (that IS the materialization) nor reach the change feed
    live_touched = (
        spark.read.option("mergeSchema", "true").parquet(*touched)
        .withColumn("__fp", F.col("_metadata.file_path"))
        .withColumn("__ri", F.col("_metadata.row_index"))
    )
    if dvs_pending:
        live_touched = live_touched.join(
            _dv_frame(spark, dvs_pending), ["__fp", "__ri"], "left_anti"
        )
    change_df = None
    if man.get("cdf"):
        # change-data-feed: the deleted rows themselves, read back from
        # ONLY the matching files (one extra pushdown scan, O(touched))
        change_df = (
            live_touched.where(cond).drop("__fp", "__ri")
            .withColumn("_change_type", F.lit("delete"))
        )
    # the surviving DV plane: touched files' vectors materialized out by
    # this very rewrite, untouched files keep theirs (consolidated)
    carry_dvs, new_dv_dir = (None, None)
    if dvs_pending:
        carry_dvs, new_dv_dir = _dv_remainder(
            spark, path, dvs_pending, [r["f"] for r in per_file],
            latest + 1,
        )
    # rewrite ONLY the matching files' survivors; NULL condition survives;
    # survivors of a partitioned table re-commit under the same spec, and
    # of a bloom-indexed table under a fresh sidecar (pruning never
    # degrades through the rewrite)
    try:
        version = write_snapshot(
            live_touched.where(~cond | cond.isNull()).drop("__fp", "__ri"),
            path,
            mode="replace",
            base_version=latest,
            carry=carried,
            partition_by=_common_partition_col(stats, touched_entries),
            carry_partitions=carry_parts or None,
            carry_partition_meta=carry_meta or None,
            carry_blooms=carry_blooms or None,
            bloom_key=_common_bloom_key(stats, touched_entries),
            # survivors are a subset of rows that already passed their
            # write-time CHECKs (and add-time validation): no re-probe
            enforce_constraints=False,
            op_meta={"name": "delete", "mode": "copy-on-write",
                     "condition": condition},
            change_df=change_df,
            carry_dvs=carry_dvs,
        )
    except Exception:
        # reclaim the consolidated remainder-DV sidecar on ANY failed
        # commit (lost race, CHECK violation, write error) — it is only
        # referenced once the manifest publishes, so an un-published one
        # is orphan debris gc_orphans would otherwise have to sweep
        if new_dv_dir is not None:
            import shutil

            shutil.rmtree(new_dv_dir, ignore_errors=True)
        raise
    return {"version": version, "n_deleted": n_deleted,
            "files_rewritten": len(touched), "files_carried": len(carried),
            **extra}


@_occ_retry
def update_snapshot(
    spark: SparkSession,
    path: str,
    condition: str,
    set_exprs: dict[str, str],
    prune: dict | None = None,
    prune_keys: dict | None = None,
    partitions: dict | None = None,
    auto_prune: bool = True,
) -> dict:
    """Row-level UPDATE (Delta ``UPDATE ... SET`` — the last of the DML
    quartet next to append/DELETE/MERGE): rows matching ``condition``
    are rewritten with each ``set_exprs`` column replaced by its SQL
    expression (evaluated against the pre-update row, all assignments
    simultaneous, cast back to the column's original type — Delta's
    semantics); every row the condition does NOT match (including NULL
    conditions) keeps its values.

    FILE-PRUNED like the copy-on-write DELETE: one aggregate scan finds
    the files holding at least one matching row, ONLY those files
    rewrite (matched rows transformed, unmatched neighbors copied),
    every untouched file carries into the replace commit verbatim — an
    UPDATE touching 0.1% of a clustered 100 TB table pays for the
    matching files. Entry elimination composes exactly like DELETE's:
    hand ``prune``/``prune_keys``/``partitions`` hints, or hints
    AUTO-DERIVED from the condition (``auto_prune``). Partition stamps
    and bloom sidecars re-stamp through the rewrite; write-time CHECK
    constraints are ENFORCED on the rewritten files (an UPDATE can
    introduce violations, unlike DELETE's row subsets). With the change
    data feed on, the commit persists update_preimage/update_postimage
    pairs — O(matched). Refuses pending merge-on-read deletes /
    deletion vectors / schema ops like every partial-rewrite path.

    Returns {"version", "n_updated", "files_rewritten",
    "files_carried"} (+ entry-elimination counters when hinted)."""
    import json
    import os

    from pyspark.sql import functions as F

    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        man = json.load(fh)
    entries = man["dirs"]
    # pending deletion vectors COMPOSE (DV-aware rewrite, like DELETE);
    # predicate MoR deletes / schema ops still require materialization
    for plane, msg in (("deletes", "merge-on-read delete(s)"),
                       ("schema_ops", "rename/drop schema op(s)")):
        if man.get(plane):
            raise ValueError(
                f"UPDATE over pending {msg} at {path} — the raw-file "
                "rewrite would bypass them; compact_snapshot first"
            )
    stats = man.get("stats", {})
    scan_entries = entries
    auto_keys: dict | None = None
    auto_ranges: dict | None = None
    if (auto_prune and prune is None and prune_keys is None
            and partitions is None):
        hints = _typed_auto_hints(entries, _condition_prune_hints(condition))
        if hints:
            prune = hints["prune"] or None
            partitions = hints["partitions"] or None
            auto_keys = hints["keys"] or None
            auto_ranges = hints.get("ranges") or None
    if partitions:
        for col, values in partitions.items():
            scan_entries = _partition_surviving_entries(
                spark, scan_entries, stats, col, list(values)
            )
    if auto_ranges:
        for col, rng in auto_ranges.items():
            scan_entries = _partition_range_surviving(
                scan_entries, stats, col, rng
            )
    if prune:
        scan_entries = [
            e for e in scan_entries if _entry_overlaps(stats.get(e), prune)
        ]
    if prune_keys:
        for col, values in prune_keys.items():
            scan_entries = _bloom_surviving_entries(
                spark, path, scan_entries, stats, col, list(values)
            )
    elif auto_keys:
        try:
            for col, values in auto_keys.items():
                if values:
                    scan_entries = _bloom_surviving_entries(
                        spark, path, scan_entries, stats, col,
                        list(values),
                    )
        except ValueError:
            pass
    hinted = bool(prune or prune_keys or partitions or auto_keys
                  or auto_ranges)
    pruned = (
        [e for e in entries if e not in set(scan_entries)] if hinted else []
    )
    extra = (
        {"entries_scanned": len(scan_entries), "entries_pruned": len(pruned)}
        if hinted else {}
    )
    if not scan_entries:
        return {"version": latest, "n_updated": 0,
                "files_rewritten": 0, "files_carried": 0, **extra}
    dvs_pending = man.get("dvs", [])
    df = spark.read.option("mergeSchema", "true").parquet(*scan_entries)
    for c in set_exprs:
        if c not in df.columns:
            raise ValueError(
                f"UPDATE SET names unknown column {c!r} at {path} — "
                f"the schema has {df.columns}"
            )
    # positional identity stamped at scan level: pending deletion
    # vectors anti-join away before matching (a dead row cannot match,
    # update, or reach the change feed)
    df = df.withColumn("__fp", F.col("_metadata.file_path")).withColumn(
        "__ri", F.col("_metadata.row_index")
    )
    if dvs_pending:
        df = df.join(_dv_frame(spark, dvs_pending), ["__fp", "__ri"],
                     "left_anti")
    cond = F.expr(condition)
    per_file = (
        df.where(cond)
        .groupBy(F.col("__fp").alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_updated = int(sum(r["n"] for r in per_file))
    if n_updated == 0:
        return {"version": latest, "n_updated": 0,
                "files_rewritten": 0, "files_carried": 0, **extra}
    matching = {os.path.realpath(_strip_file_uri(r["f"])) for r in per_file}
    carried, touched, touched_entries = list(pruned), [], []
    carry_parts: dict = {}
    carry_meta: dict = {}
    carry_blooms: dict = {}
    for e in scan_entries:
        files = _entry_files(e)
        hit = [f for f in files if os.path.realpath(f) in matching]
        if not hit:
            carried.append(e)
        else:
            touched.extend(hit)
            touched_entries.append(e)
            part = (stats.get(e) or {}).get("partition")
            pmeta = (stats.get(e) or {}).get("partition_meta")
            bloom = (stats.get(e) or {}).get("bloom")
            for f in files:
                if os.path.realpath(f) not in matching:
                    carried.append(f)
                    if part:
                        carry_parts[f] = part
                    if pmeta:
                        carry_meta[f] = pmeta
                    if bloom:
                        carry_blooms[f] = bloom
    base_touched = (
        spark.read.option("mergeSchema", "true").parquet(*touched)
        .withColumn("__fp", F.col("_metadata.file_path"))
        .withColumn("__ri", F.col("_metadata.row_index"))
    )
    if dvs_pending:
        # DV-aware rewrite: the touched files' dead rows materialize out
        # here (they are simply not re-written), untouched files keep
        # their vectors via the remainder plane below
        base_touched = base_touched.join(
            _dv_frame(spark, dvs_pending), ["__fp", "__ri"], "left_anti"
        )
    base_touched = base_touched.drop("__fp", "__ri")
    dtypes = dict(base_touched.dtypes)
    # evaluate the condition ONCE on the PRE-update row (a SET that
    # changes a column the condition references must not flip matching
    # after the fact), then assign simultaneously against the pre-image
    # (SQL UPDATE semantics: SET a = b, b = a swaps), cast back to each
    # column's original type
    marked = base_touched.withColumn("__m", cond.eqNullSafe(F.lit(True)))
    assigned = {
        c: F.when(F.col("__m"), F.expr(e).cast(dtypes[c]))
        .otherwise(F.col(c))
        for c, e in set_exprs.items()
    }
    rewritten_m = marked.withColumns(assigned)
    rewritten = rewritten_m.drop("__m")
    change_df = None
    if man.get("cdf"):
        change_df = (
            marked.where("__m").drop("__m")
            .withColumn("_change_type", F.lit("update_preimage"))
            .unionByName(
                rewritten_m.where("__m").drop("__m")
                .withColumn("_change_type", F.lit("update_postimage"))
            )
        )
    carry_dvs, new_dv_dir = (None, None)
    if dvs_pending:
        carry_dvs, new_dv_dir = _dv_remainder(
            spark, path, dvs_pending, [r["f"] for r in per_file],
            latest + 1,
        )
    try:
        version = write_snapshot(
            rewritten,
            path,
            mode="replace",
            base_version=latest,
            carry=carried,
            partition_by=_common_partition_col(stats, touched_entries),
            carry_partitions=carry_parts or None,
            carry_partition_meta=carry_meta or None,
            carry_blooms=carry_blooms or None,
            bloom_key=_common_bloom_key(stats, touched_entries),
            # an UPDATE can introduce violations: keep write-time CHECKs ON
            enforce_constraints=True,
            op_meta={"name": "update", "condition": condition,
                     "set": dict(set_exprs)},
            change_df=change_df,
            carry_dvs=carry_dvs,
        )
    except Exception:
        # reclaim the consolidated remainder-DV sidecar on ANY failed
        # commit (lost race, CHECK violation, write error) — it is only
        # referenced once the manifest publishes, so an un-published one
        # is orphan debris gc_orphans would otherwise have to sweep
        if new_dv_dir is not None:
            import shutil

            shutil.rmtree(new_dv_dir, ignore_errors=True)
        raise
    return {"version": version, "n_updated": n_updated,
            "files_rewritten": len(touched), "files_carried": len(carried),
            **extra}


@_occ_retry
def merge_into_snapshot(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str = "doc_id",
    op_col: str = "op",
    prune: dict | None = None,
    prune_keys: dict | None = None,
    txn_id: str | None = None,
    validate: bool = False,
    auto_prune: bool = True,
    auto_prune_max_keys: int = 8192,
    not_matched_by_source: str | None = None,
    schema_evolution: bool = False,
) -> dict:
    """FILE-PRUNED MERGE INTO (Delta's actual MERGE execution shape): one
    scan joined against the changeset's distinct keys finds the files
    holding MATCHED rows; only those files' rows enter the full-outer
    merge (operators.merge.merge_into — matched update/delete, unmatched
    insert), every untouched file carries into the new manifest verbatim,
    and inserts land in the commit's new data dir. A changeset touching
    0.1% of a 100 TB table's keys rewrites the matching files, not the
    table — the batch-MERGE twin of the file-pruned DELETE.

    A change key absent from every file simply matches no base row and
    inserts — correct by construction (any file holding the key would
    have been found by the scan). PRUNE HINTS ARE AUTO-DERIVED from the
    changeset itself (``auto_prune``, on by default): the distinct keys
    are counted in the same pass that pins the changeset, and when they
    fit under ``auto_prune_max_keys`` each manifest entry is eliminated
    unless SOME key falls inside its stamped min/max (exact per-key
    containment — far-out insert keys match no entry instead of
    inflating a single covering box) and, where bloom sidecars exist,
    unless the bloom may contain a key; past the bound the SAME exact
    containment runs as a distributed range join (the keys never leave
    the executors — see ``_entries_holding_keys_distributed``), so a
    million-key changeset prunes as precisely as a small one without a
    driver-memory cliff. Auto-derivation covers the matched keys BY
    CONSTRUCTION, removing the hand-written-hint footgun (a too-small
    hand box silently turns missed updates into duplicate inserts).
    Hand-passed ``prune``/``prune_keys`` still take precedence.

    The changeset is evaluated EXACTLY ONCE: an eager localCheckpoint
    pins it before any job, so a non-deterministic source (sample,
    limit, mutating view) cannot desynchronize the key scan from the
    merge, and the count/bounds/distinct-keys come from that pinned
    copy. Refuses pending merge-on-read deletes / schema ops like every
    partial-rewrite path. ``txn_id`` forwards replay idempotence (the
    streaming CDC shape) and is checked FIRST — a replayed batch
    returns the recorded version without evaluating the changeset at
    all (n_changes None). ``not_matched_by_source="delete"`` adds
    Delta's third MERGE clause (WHEN NOT MATCHED BY SOURCE THEN
    DELETE — the CDC full-sync shape: the target converges to exactly
    the changeset's keys); it disables file pruning by construction
    (every base row participates) and, with cdf on, reports the
    dropped base rows as 'delete' change rows.

    ``schema_evolution=True`` (Delta ``withSchemaEvolution()``):
    changeset columns ABSENT from the target are added additively —
    touched base rows surface NULL for them, carried files keep their
    narrow schema exactly like the append path's additive evolution
    (read the evolved table with ``merge_schema=True``), and the change
    feed carries the new columns (pre-images NULL). A changeset column
    whose TYPE conflicts with the target's refuses loudly. Off by
    default: unknown changeset columns are then simply not applied
    (the merge takes the target's schema). Returns {"version",
    "n_changes", "files_rewritten", "files_carried",
    "entries_scanned", "entries_pruned"}."""
    import json
    import os

    from pyspark.sql import functions as F

    from naru_spark.operators.merge import merge_into

    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        man = json.load(fh)
    if txn_id is not None:
        app, ver = _parse_txn_id(txn_id)
        rec = _normalize_txns(man.get("txns", {})).get(app)
        if rec is not None and ver <= int(rec["v"]):
            # replayed batch: committed before — skip the scan AND the
            # changeset evaluation entirely
            return {"version": int(rec["commit"]), "n_changes": None,
                    "files_rewritten": 0, "files_carried": 0,
                    "entries_scanned": 0, "entries_pruned": 0}
    # pending deletion vectors COMPOSE (DV-aware rewrite, like DELETE /
    # UPDATE); predicate MoR deletes / schema ops still materialize first
    for plane, msg in (("deletes", "merge-on-read delete(s)"),
                       ("schema_ops", "rename/drop schema op(s)")):
        if man.get(plane):
            raise ValueError(
                f"MERGE over pending {msg} at {path} — carried files would "
                "bypass them; compact_snapshot first"
            )
    dvs_pending = man.get("dvs", [])
    entries = man["dirs"]
    stats = man.get("stats", {})
    # manifest-served schema when stamped (skips footer inference per
    # read); fall back to footer unioning for unstamped/evolved tables.
    # MERGE refuses pending schema ops above, so the stamp (physical
    # schema) is also the logical one here.
    _stamp = _stamped_schema(man)

    def _tbl_reader():
        return (
            spark.read.schema(_stamp) if _stamp is not None
            else spark.read.option("mergeSchema", "true")
        )
    # pin ONE evaluation of the caller's plan: the changeset feeds the
    # key scan, the merge, and the count as separate jobs — evaluated
    # twice, a non-deterministic changeset would desynchronize them.
    # Lazy checkpoint + count: the count() action is what materializes
    # the checkpoint, so pinning and counting share ONE Spark job
    # instead of an eager-materialize job followed by a count job
    # (guide §1.2 — same guarantee, one fewer action per MERGE).
    changes = changes.localCheckpoint(eager=False)
    n_changes = changes.count()
    keys = changes.select(key).distinct()
    scan_entries = entries
    if not_matched_by_source == "delete":
        # Delta's WHEN NOT MATCHED BY SOURCE THEN DELETE (the CDC
        # full-sync clause: make target equal source): EVERY base row
        # participates — an unmatched base row must be SEEN to be
        # deleted — so file pruning is impossible by construction and
        # the full-outer merge rewrites the whole visible table as one
        # replace commit. The extra cost over a plain merge is exactly
        # the full scan the semantics demand; at 100 TB, sync a
        # PARTITION-scoped mirror via replace_where instead when the
        # source covers only some partitions.
        auto_prune = False
        prune = prune_keys = None
    if auto_prune and prune is None and prune_keys is None:
        key_vals = [
            r[key] for r in keys.limit(auto_prune_max_keys + 1).collect()
        ]
        if len(key_vals) <= auto_prune_max_keys:
            # NULL keys never match a base row (the semi-join drops
            # them), so eliminating entries on the non-null keys alone
            # is exact; an all-NULL/empty key set matches nothing. A NaN
            # key disables pruning outright: Spark joins treat NaN as
            # equal to itself, but NaN neither sorts (bisect would
            # misprobe) nor appears in parquet min/max stats — no safe
            # containment test exists for it.
            vals = [v for v in key_vals if v is not None]
            if any(isinstance(v, float) and v != v for v in vals):
                vals = None
            else:
                try:
                    vals.sort()
                except TypeError:
                    vals = None  # mixed key types: no safe order/pruning
            if vals is not None:
                scan_entries = [
                    e for e in scan_entries
                    if _entry_holds_any_key(stats.get(e), key, vals)
                ]
                if vals and len(vals) <= 1024 and all(
                    isinstance(v, (int, float, str))
                    and not isinstance(v, bool) for v in vals
                ):  # bloom probes: plainly-hashable types, bounded count
                    try:
                        scan_entries = _bloom_surviving_entries(
                            spark, path, scan_entries, stats, key, vals
                        )
                    except ValueError:
                        # a key unrepresentable in some bloom's stamped
                        # dtype can never match that entry's rows, but
                        # proving it per-entry isn't worth it here: the
                        # AUTO path just skips bloom pruning (the raise
                        # is the contract for EXPLICIT prune_keys only)
                        pass
        else:
            # too many distinct keys to enumerate on the driver: EXACT
            # per-entry containment, computed DISTRIBUTED — the keys stay
            # in executors and the driver receives only the hit entry
            # INDICES (bounded by the manifest size, not the changeset),
            # so a million-key changeset prunes as precisely as a small
            # one without the driver-memory cliff a big collect() (or
            # the coarse single covering box) would be
            scan_entries = _entries_holding_keys_distributed(
                spark, keys, key, scan_entries, stats
            )
    if prune:
        scan_entries = [
            e for e in scan_entries if _entry_overlaps(stats.get(e), prune)
        ]
    if prune_keys:
        for col, values in prune_keys.items():
            scan_entries = _bloom_surviving_entries(
                spark, path, scan_entries, stats, col, list(values)
            )
    pruned = [e for e in entries if e not in set(scan_entries)]
    extra = {"entries_scanned": len(scan_entries),
             "entries_pruned": len(pruned)}
    matching: set = set()
    matched_uris: list = []
    if not_matched_by_source == "delete":
        matching = {
            os.path.realpath(f) for e in scan_entries
            for f in _entry_files(e)
        }
    elif scan_entries:
        # positional identity stamped at SCAN level (before any join —
        # like input_file_name, _metadata is per-source); pending
        # deletion vectors anti-join away so a positionally-dead row can
        # neither mark its file touched nor count as a matched base row
        probe = (
            _tbl_reader().parquet(*scan_entries)
            .withColumn("__f", F.col("_metadata.file_path"))
            .withColumn("__ri", F.col("_metadata.row_index"))
        )
        if dvs_pending:
            probe = probe.join(
                _dv_frame(spark, dvs_pending).withColumnRenamed(
                    "__fp", "__f"
                ),
                ["__f", "__ri"], "left_anti",
            )
        per_file = (
            probe.join(keys, key, "semi")
            .groupBy("__f")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        matched_uris = [r["__f"] for r in per_file]
        matching = {os.path.realpath(_strip_file_uri(u)) for u in matched_uris}
    carried, touched, touched_entries = list(pruned), [], []
    carry_parts: dict = {}
    carry_meta: dict = {}
    carry_blooms: dict = {}
    for e in scan_entries:
        files = _entry_files(e)
        hit = [f for f in files if os.path.realpath(f) in matching]
        if not hit:
            carried.append(e)
        else:
            touched.extend(hit)
            touched_entries.append(e)
            part = (stats.get(e) or {}).get("partition")
            pmeta = (stats.get(e) or {}).get("partition_meta")
            bloom = (stats.get(e) or {}).get("bloom")
            for f in files:
                if os.path.realpath(f) not in matching:
                    carried.append(f)
                    if part:  # split files inherit the parent's partition
                        carry_parts[f] = part
                    if pmeta:  # ...its transformed-spec dtype meta
                        carry_meta[f] = pmeta
                    if bloom:  # ...and its (superset) bloom sidecar
                        carry_blooms[f] = bloom
    if touched:
        # mergeSchema: touched files may span evolved commits, and the
        # merge output must keep every column. Pending deletion vectors
        # anti-join away: the merge must not resurrect (or "update") a
        # positionally-dead base row — its vector materializes out with
        # this very rewrite.
        base_touched = (
            _tbl_reader().parquet(*touched)
            .withColumn("__fp", F.col("_metadata.file_path"))
            .withColumn("__ri", F.col("_metadata.row_index"))
        )
        if dvs_pending:
            base_touched = base_touched.join(
                _dv_frame(spark, dvs_pending), ["__fp", "__ri"],
                "left_anti",
            )
        base_touched = base_touched.drop("__fp", "__ri")
    else:
        base_touched = (
            _tbl_reader().parquet(*entries).limit(0)  # pure-insert changeset
        )
    evolved_cols: dict = {}
    if schema_evolution:
        bt = dict(base_touched.dtypes)
        ct = {c: t for c, t in changes.dtypes if c != op_col}
        conflicts = sorted(
            c for c in ct if c in bt and ct[c] != bt[c]
        )
        if conflicts:
            raise ValueError(
                f"MERGE schema evolution at {path}: changeset column(s) "
                f"{conflicts} conflict with the target's types "
                f"({[(c, bt[c], ct[c]) for c in conflicts]}) — evolution "
                "is ADDITIVE only; cast the changeset first"
            )
        evolved_cols = {c: t for c, t in ct.items() if c not in bt}
        if evolved_cols:
            # additive evolution, exactly the append path's shape: the
            # touched base rows surface NULL for the new columns, the
            # carried files keep their narrow schema (read the evolved
            # table with merge_schema=True)
            base_touched = base_touched.withColumns(
                {c: F.lit(None).cast(t) for c, t in evolved_cols.items()}
            )
    # validate=True forwards merge_into's one-changeset-row-per-key guard
    # (SQL MERGE's "multiple source rows matched" error) at the cost of
    # one aggregate over the changeset
    merged = merge_into(base_touched, changes, key=key, op_col=op_col,
                        validate=validate,
                        not_matched_by_source=not_matched_by_source)
    change_df = None
    if man.get("cdf"):
        # change-data-feed rows (Delta MERGE CDC shape): matched deletes
        # as 'delete' pre-images, matched updates as 'update_preimage' +
        # 'update_postimage' pairs, unmatched non-deletes as 'insert'
        # (and, under the full-sync clause, unmatched base rows as
        # 'delete'). Emitted in ONE keyed full-outer join over ONLY the
        # touched files' rows and the pinned changeset — O(delta), never
        # the table; a key absent from every touched file is absent
        # everywhere (the key scan found no file holding it), so judging
        # inserts against base_touched alone is exact. Each joined row
        # explodes into its branch's change rows via an array, instead
        # of five separate join subtrees (three reuses of the matched
        # join + two anti-joins) that re-scanned the touched files and
        # re-broadcast the changeset once per branch (guide §1.2/§2.4);
        # the emitted row set is identical branch by branch.
        bcols = base_touched.columns
        # presence markers, not key-null tests: a NULL-key row on either
        # side never equality-matches, and must still be classified as
        # "unmatched" on its own side
        b = base_touched.withColumn("__bm", F.lit(1)).alias("b")
        c = changes.withColumn("__cm", F.lit(1)).alias("c")
        j = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
        ct = F.col(f"c.{op_col}")
        b_row = F.struct(*[F.col(f"b.{x}").alias(x) for x in bcols])
        c_row = F.struct(*[
            (F.col(f"b.{key}") if x == key else F.col(f"c.{x}")).alias(x)
            for x in bcols
        ])
        i_row = F.struct(*[F.col(f"c.{x}").alias(x) for x in bcols])
        matched = F.col("b.__bm").isNotNull() & F.col("c.__cm").isNotNull()
        # null-safe op test everywhere: merge_into applies a NULL-op row
        # as an update (its keep-filter uses eqNullSafe), so the feed's
        # branches must route it the same way — plain `ct != "D"` is
        # false for NULL and such rows would vanish from the feed (a
        # CDF-following replica would diverge from the table)
        is_d = ct.eqNullSafe("D")
        ev = (
            F.when(matched & is_d, F.array(F.struct(
                F.lit("delete").alias("t"), b_row.alias("r"))))
            .when(matched, F.array(
                F.struct(F.lit("update_preimage").alias("t"),
                         b_row.alias("r")),
                F.struct(F.lit("update_postimage").alias("t"),
                         c_row.alias("r"))))
            # unmatched changeset row: insert unless it is a (no-op)
            # unmatched delete
            .when(F.col("b.__bm").isNull() & ~is_d, F.array(F.struct(
                F.lit("insert").alias("t"), i_row.alias("r"))))
        )
        if not_matched_by_source == "delete":
            # the sync clause's own deletions: base rows with no
            # changeset key
            ev = ev.when(F.col("c.__cm").isNull(), F.array(F.struct(
                F.lit("delete").alias("t"), b_row.alias("r"))))
        exploded = j.select(F.explode(ev.otherwise(F.array())).alias("e"))
        change_df = exploded.select(
            "e.r.*", F.col("e.t").alias("_change_type")
        )
    # the surviving DV plane: touched files' vectors materialized out by
    # the rewrite; the full-sync clause rewrites every visible file, so
    # its plane always clears outright
    carry_dvs, new_dv_dir = (None, None)
    if dvs_pending:
        if not_matched_by_source == "delete":
            carry_dvs = []
        else:
            carry_dvs, new_dv_dir = _dv_remainder(
                spark, path, dvs_pending, matched_uris, latest + 1
            )
    # a partitioned table's merge output (matched rewrites + inserts)
    # re-commits under the same spec — but only when the WHOLE visible
    # table shares it (inserts may land in any partition)
    try:
        version = write_snapshot(
            merged, path, mode="replace", base_version=latest, carry=carried,
            txn_id=txn_id,
            partition_by=(
                _common_partition_col(stats, entries) if entries else None
            ),
            carry_partitions=carry_parts or None,
            carry_partition_meta=carry_meta or None,
            carry_blooms=carry_blooms or None,
            # the merge output (rewrites + inserts) gets a fresh sidecar when
            # the whole visible table is bloom-indexed on the merge key space
            bloom_key=_common_bloom_key(stats, entries) if entries else None,
            op_meta={"name": "merge", "key": key,
                     **({"not_matched_by_source": not_matched_by_source}
                        if not_matched_by_source else {}),
                     **({"evolved_columns": sorted(evolved_cols)}
                        if evolved_cols else {})},
            change_df=change_df,
            carry_dvs=carry_dvs,
        )
    except Exception:
        # reclaim the consolidated remainder-DV sidecar on ANY failed
        # commit (lost race, CHECK violation, write error) — it is only
        # referenced once the manifest publishes, so an un-published one
        # is orphan debris gc_orphans would otherwise have to sweep
        if new_dv_dir is not None:
            import shutil

            shutil.rmtree(new_dv_dir, ignore_errors=True)
        raise
    return {"version": version, "n_changes": n_changes,
            "files_rewritten": len(touched), "files_carried": len(carried),
            **extra}


def add_snapshot_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> int:
    """Delta ``ALTER TABLE ... ADD CONSTRAINT ... CHECK`` analog: record
    a named CHECK expression in the manifest (table property, carried by
    every later commit) after validating that (1) it RESOLVES against
    the table's logical schema and (2) the EXISTING rows all satisfy it
    (one pushdown scan, first violation short-circuits) — Delta
    validates existing data the same way, which is what lets every
    later rewrite skip re-checking rows that were already in the table.
    Enforcement: every data-adding commit probes its just-written files
    and refuses (cleanly, nothing published) on the first violating
    row. SQL CHECK semantics: a NULL-valued expression PASSES.
    Metadata-only commit; returns the committed version."""
    import json
    import os

    from pyspark.sql import functions as F

    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        man = json.load(fh)
    if name in man.get("constraints", {}):
        raise ValueError(
            f"constraint {name!r} already exists at {path} "
            f"({man['constraints'][name]!r}) — silently replacing it "
            "could weaken enforcement; drop_snapshot_constraint first "
            "(Delta refuses the same way)"
        )
    # merge_schema: an additively-evolved table's constraint may
    # reference a column only later commits carry — resolution must see
    # the LOGICAL (merged) schema, not whichever file wins inference
    current = read_snapshot(spark, path, version=latest, merge_schema=True)
    try:
        probe = current.where(~F.expr(expr))  # resolves or raises
    except Exception as exc:
        raise ValueError(
            f"constraint {name!r} ({expr}) does not resolve against the "
            f"snapshot at {path}: {exc}"
        ) from None
    bad = probe.limit(1).collect()
    if bad:
        raise ValueError(
            f"constraint {name!r} ({expr}) is violated by existing row "
            f"{bad[0].asDict()!r} — fix the data first (Delta refuses the "
            "same way)"
        )
    n = latest + 1
    manifest = {
        "version": n,
        "dirs": man["dirs"],
        "txns": _normalize_txns(man.get("txns", {})),
        "stats": man.get("stats", {}),
        "constraints": {**man.get("constraints", {}), name: expr},
        "op": {"name": "add_constraint", "constraint": name,
               "expr": expr},
    }
    _carry_planes(man, manifest, exclude=("constraints",))
    _publish_manifest(man_dir, n, manifest)
    return n


def drop_snapshot_constraint(path: str, name: str) -> int:
    """Delta ``DROP CONSTRAINT``: metadata-only removal of a named CHECK
    (the recovery path when a rename/drop broke a constraint's
    expression). Returns the committed version."""
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        man = json.load(fh)
    constraints = dict(man.get("constraints", {}))
    if name not in constraints:
        raise ValueError(f"no constraint {name!r} at {path}: "
                         f"{sorted(constraints)}")
    del constraints[name]
    n = latest + 1
    manifest = {
        "version": n,
        "dirs": man["dirs"],
        "txns": _normalize_txns(man.get("txns", {})),
        "stats": man.get("stats", {}),
        "op": {"name": "drop_constraint", "constraint": name},
    }
    if constraints:
        manifest["constraints"] = constraints
    _carry_planes(man, manifest, exclude=("constraints",))
    _publish_manifest(man_dir, n, manifest)
    return n


@_occ_retry
def replace_where(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    col: str | dict | None = None,
    values=None,
    txn_id: str | None = None,
    base_version: int | None = None,
) -> dict:
    """Transactional dynamic partition overwrite on an identity-
    PARTITIONED snapshot table (Delta ``replaceWhere`` — the reprocess-
    one-day/source shape, now with time travel and optimistic
    concurrency on top of the plain ``overwrite_partitions`` sink):
    commit ``df`` as the NEW content of exactly the partitions named by
    ``values``; every other partition's entries carry into the replace
    commit VERBATIM (zero rewrite I/O — a one-partition overwrite on a
    100 TB table pays for that partition's bytes).

    Delta's two replaceWhere guarantees are enforced: (1) the
    CONSTRAINT — ``df`` must contain only rows whose ``col`` is in
    ``values`` (a NULL or out-of-set row raises BEFORE anything is
    written; silently keeping it would corrupt the untouched
    partitions' contract); (2) the BOUNDARY — every visible entry must
    carry a partition stamp for ``col`` (an unstamped/unpartitioned
    commit could hold in-set rows that a carry would wrongly preserve;
    compact the table under the spec first). The commit pins
    ``base_version`` (default: the manifest read here), so a concurrent
    append/replace surfaces as ``SnapshotConflictError`` instead of
    being silently superseded; ``txn_id`` gives foreachBatch replay
    idempotence. Refuses pending merge-on-read deletes / schema ops
    like every partial-rewrite path (write_snapshot's carry guard).

    COMPOSITE predicates on multi-column specs: pass ``col`` as a dict
    ``{col: [values], ...}`` (``values`` omitted) — an entry is
    replaced when EVERY named column's stamped value matches (the
    conjunctive ``replaceWhere date IN (...) AND source IN (...)``
    shape), the constraint probe enforces the same conjunction on
    ``df``, and the named columns may be any SUBSET of the table's spec
    (replacing one date across all sources on a ``["date","source"]``
    table). The replacement frame always re-commits under the table's
    FULL spec.

    Returns {"version", "partitions_replaced", "entries_carried"}."""
    import json
    import os

    from pyspark.sql import functions as F

    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    if base_version is None:
        base_version = latest
    with open(os.path.join(man_dir, f"v{base_version}.json")) as fh:
        man = json.load(fh)
    if txn_id is not None:
        # replay fast-path (mirrors merge_into_snapshot): a re-delivered
        # foreachBatch batch returns the recorded commit without paying
        # the constraint probe or evaluating the replacement frame. The
        # txn map is read from the LATEST manifest, not the pinned base:
        # with an explicitly stale base_version, a batch recorded at a
        # later version must still no-op here instead of proceeding into
        # a doomed SnapshotConflictError
        app, ver = _parse_txn_id(txn_id)
        if base_version == latest:
            head_txns = man.get("txns", {})
        else:
            with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
                head_txns = json.load(fh).get("txns", {})
        rec = _normalize_txns(head_txns).get(app)
        if rec is not None and ver <= int(rec["v"]):
            return {"version": int(rec["commit"]),
                    "partitions_replaced": 0, "entries_carried": 0}
    stats = man.get("stats", {})
    from functools import reduce

    spec = (
        {c: list(vs) for c, vs in col.items()} if isinstance(col, dict)
        else {col: list(values)}
    )
    for c in spec:
        sp = _parse_spec_string(c)
        if sp is None or sp["t"] != "identity":
            raise ValueError(
                f"replace_where needs IDENTITY partition columns; {c!r} "
                "is a transformed spec — the replacement constraint "
                "cannot be expressed on a derived value (partition the "
                "table by the identity column to replace by it)"
            )
    want = {c: {str(v) for v in vs} for c, vs in spec.items()}
    # the replacement frame re-commits under the table's FULL spec (the
    # predicate may name a subset of a multi-column spec); a predicate
    # column outside the spec can never be entry-exact — refuse up front
    table_spec = _common_partition_col(stats, man["dirs"])
    if table_spec is not None and not set(spec) <= set(table_spec):
        raise ValueError(
            f"replace_where names column(s) "
            f"{sorted(set(spec) - set(table_spec))!r} outside the "
            f"table's partition spec {table_spec!r}"
        )
    replaced, carried = [], []
    for e in man["dirs"]:
        stamp = (stats.get(e) or {}).get("partition", {})
        missing = [c for c in spec if c not in stamp]
        if missing:
            raise ValueError(
                f"replace_where needs every entry partition-stamped on "
                f"{sorted(spec)!r}, but {e} has no stamp for {missing!r} "
                f"— write the table with write_snapshot(partition_by=...); "
                f"compact_snapshot(full=True, partition_by=...) re-stamps "
                "a mixed table"
            )
        hit = all(stamp[c] in want[c] for c in spec)
        (replaced if hit else carried).append(e)
    if table_spec is None:
        table_spec = sorted(spec)
    # pin ONE evaluation of the replacement frame: the constraint probe
    # and the write are separate jobs, and a non-deterministic df could
    # otherwise pass the probe yet write a violating row
    df = df.localCheckpoint(eager=True)
    # the replaceWhere CONSTRAINT: every df row must fall in the named
    # partitions (conjunction over the spec) — a limit-1 job before any
    # write; a NULL in any named column violates (it matches no value)
    bad = reduce(
        lambda a, b: a | b,
        [~F.col(c).isin(vs) | F.col(c).isNull()
         for c, vs in spec.items()],
    )
    viol = df.where(bad).limit(1).collect()
    if viol:
        raise ValueError(
            f"replace_where(df, {spec!r}): the replacement frame "
            f"contains out-of-set row {viol[0].asDict()!r} — Delta "
            "replaceWhere rejects rows outside the predicate rather than "
            "silently dropping or leaking them"
        )
    # a bloom-indexed table's replacement partitions re-stamp fresh
    # per-entry sidecars (carried entries keep theirs via their stats)
    bkey = _common_bloom_key(stats, man["dirs"]) if man["dirs"] else None
    if bkey is not None and bkey not in df.columns:
        bkey = None
    version = write_snapshot(
        df, path, mode="replace", base_version=base_version,
        carry=carried, partition_by=table_spec, txn_id=txn_id,
        bloom_key=bkey,
        op_meta={"name": "replace_where",
                 "where": {c: sorted(w) for c, w in want.items()}},
    )
    return {"version": version, "partitions_replaced": len(replaced),
            "entries_carried": len(carried)}


def maintain_snapshot(
    spark: SparkSession, path: str, merge_factor: int = 4,
    target_file_bytes: int = 512 * 1024 * 1024,
    zorder_by: Sequence[str] | None = None,
    keep_last: int | None = None,
    gc_older_than_s: float | None = None,
    min_file_bytes: int | None = None,
    retries: int = 2,
    partitions: dict | None = None,
) -> dict:
    """The snapshot table's maintenance decision loop (Delta
    auto-OPTIMIZE / Iceberg maintenance-job shape), composed from the
    pieces: measure fragmentation from the LATEST manifest's dir list (a
    metadata-only walk — never a data read), and when the FRAGMENTED
    entries (average file size below ``min_file_bytes``, default
    ``target_file_bytes``) hold more than ``merge_factor`` times their
    own right-sized file count (``ceil(fragmented bytes /
    target_file_bytes)``), run ``compact_snapshot`` — which rewrites
    ONLY those entries and carries every right-sized entry verbatim.
    Measuring fragmentation over the fragmented subset (not the whole
    table) is what makes the trigger fire after a few dozen small
    streaming appends on a 100 TB table, instead of only once small
    files outnumber ~200k right-sized cold files several-fold; the
    selective rewrite keeps the cost of acting on it proportional to
    the fragmented bytes. An already-compact table is a metadata-only
    no-op, so schedulers can call this after every ingest batch.
    Pending merge-on-read deletes / schema ops force the triggered
    compaction into full-rewrite materialization (see
    ``compact_snapshot``).

    The fragmentation signal (file count, total bytes) is read from the
    manifest's per-entry ``stats`` stamped at commit — ONE manifest read,
    zero filesystem LIST/HEAD calls however many data files the table
    holds (Iceberg's maintenance-from-manifest-stats model; at 100 TB a
    per-tick os.listdir+getsize walk would be millions of object-store
    calls). Legacy stats-less manifests back-fill with a one-time footer
    walk.

    RETENTION composes into the same tick (the full Iceberg maintenance
    job: rewrite_data_files + expire_snapshots + remove_orphan_files):
    ``keep_last=N`` expires all but the last N versions AFTER any
    compaction, so the freshly compacted version anchors the kept window
    — time travel works exactly to the retention boundary, and the
    superseded pre-compaction files are reclaimed in the same tick.
    ``gc_older_than_s`` then sweeps never-referenced debris (conflict
    losers, crashed writers) older than the safety window — what keeps
    ``snapshot_stream_source``'s no-orphan startup check passing on a
    table that has seen failed commits.

    OPTIMISTIC-CONCURRENCY RETRY: a commit landing between the plan
    read and the compaction's publish surfaces as
    ``SnapshotConflictError`` — the tick then RE-READS the latest
    manifest, re-plans against it, and re-commits, up to ``retries``
    times (Iceberg's optimistic rewrite loop; the docs always
    prescribed "re-read and retry", this is the implementation). The
    loser's data dir is cleaned by write_snapshot before the retry, so
    nothing leaks; past the budget the conflict propagates — under
    sustained write pressure the scheduler's next tick retries anyway.
    Each retry restarts from the measurement, so the decision is always
    made against the manifest it will publish over.

    Returns {"action": "compact"|"noop", "files": n, "target_files": t,
    on compact the compaction's version/files_before/files_after, and
    when retention ran, "expired_dirs"/"gc_dirs" counts}."""
    import json
    import math
    import os

    man_dir = os.path.join(path, "_manifests")
    for attempt in range(retries + 1):
        latest = _latest_version(man_dir)
        with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
            man = json.load(fh)
        stats = _manifest_stats(man)
        n_files = sum(s["n_files"] for s in stats.values())
        total_bytes = sum(s["n_bytes"] for s in stats.values())
        target = max(1, math.ceil(total_bytes / target_file_bytes))
        threshold = (target_file_bytes if min_file_bytes is None
                     else min_file_bytes)
        # ask the compaction policy itself what a triggered pass would
        # rewrite (pending metadata-only logs force full materialization,
        # which weighs the whole table) — ONE shared selection, no drift.
        # ``partitions`` scopes BOTH the trigger and the pass (Delta
        # OPTIMIZE ... WHERE as a maintenance policy for one hot
        # partition): only in-scope fragmentation counts, only in-scope
        # entries rewrite.
        scope = None
        if partitions is not None:
            scope = _scope_entries(spark, man["dirs"], stats, partitions)
        plan = _compaction_plan(man, stats, threshold,
                                zorder=zorder_by is not None, scope=scope)
        frag_target = max(
            1, math.ceil(plan["rewrite_bytes"] / target_file_bytes)
        )
        if plan["noop"] or plan["rewrite_files"] <= merge_factor * frag_target:
            info = {"action": "noop", "files": n_files,
                    "target_files": target}
            break
        # zorder_by makes the triggered rewrite CLUSTER while it compacts
        # (Delta auto-OPTIMIZE with a ZORDER table property): same rewrite
        # I/O the compaction pays anyway, plus one range-exchange shuffle,
        # buying footer-stats pruning for every later scan and delete
        try:
            info = compact_snapshot(spark, path,
                                    target_file_bytes=target_file_bytes,
                                    zorder_by=zorder_by,
                                    min_file_bytes=min_file_bytes,
                                    partitions=partitions)
        except SnapshotConflictError:
            if attempt == retries:
                raise
            continue  # re-read, re-plan, re-commit against the new head
        info.update({"action": "compact", "files": n_files,
                     "target_files": target})
        break
    # retention AFTER the (possible) compaction: the new version anchors
    # the kept window and its superseded inputs reclaim in the same tick
    if keep_last is not None:
        info["expired_dirs"] = len(expire_snapshots(path, keep_last=keep_last))
    if gc_older_than_s is not None:
        info["gc_dirs"] = len(gc_orphans(path, older_than_s=gc_older_than_s))
    return info


def alter_snapshot_schema(
    path: str,
    rename: dict[str, str] | None = None,
    drop: Sequence[str] | None = None,
) -> int:
    """Schema evolution WITHOUT rewriting data (Iceberg column-mapping /
    Delta column-mapping rename+drop): a METADATA-ONLY commit records the
    rename/drop ops pinned to the entries visible now — existing parquet
    keeps its physical column names forever; ``read_snapshot`` maps them
    to the logical schema at scan time. Appends AFTER the rename write
    the NEW name physically (their entries are not in the op's pinned
    set), so the table converges to the logical schema as it rewrites
    naturally; ``compact_snapshot`` materializes all pending ops at once.
    Zero data I/O at any table size. (Column ADDs need no op at all —
    ``read_snapshot(merge_schema=True)`` NULLs pre-evolution rows, the
    existing schema_evolution_read path.)

    Like merge-on-read deletes, raw-file consumers must not see pinned
    ops: the stream source and partial-rewrite commits refuse while ops
    are pending. Pending MoR deletes COMPOSE (ops and deletes share one
    seq-ordered log replayed at read time); rename/drop targets are
    validated against the logical schema before the metadata publish so
    a typo cannot poison the manifest. Returns the committed version."""
    import json
    import os

    import pyarrow.parquet as pq

    assert rename or drop, "nothing to do"
    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        man = json.load(fh)
    ops = man.get("schema_ops", [])
    # validate against the LOGICAL schema (one footer per entry, pending
    # ops replayed) BEFORE publishing — a typo'd rename/drop committed
    # metadata-only would poison every later read, exactly like an
    # unresolvable merge-on-read predicate would
    logical: set = set()
    for e in man["dirs"]:
        files = _entry_files(e)
        if not files:
            continue
        md = pq.ParquetFile(files[0]).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for op in sorted(
            (o for o in ops if e in set(o["dirs"])),
            key=lambda o: o.get("seq", 0),
        ):
            if op["op"] == "rename" and op["from"] in names:
                names[names.index(op["from"])] = op["to"]
            elif op["op"] == "drop" and op["col"] in names:
                names.remove(op["col"])
        logical.update(names)
    n = latest + 1
    # a rename/drop of a column some CHECK constraint references would
    # leave the constraint unresolvable (every later data commit
    # refuses) or, worse, silently re-bind to a future column with the
    # old name — refuse up front like Delta does. Identifier matching is
    # textual (word boundary), so a name inside a string literal
    # false-positives CONSERVATIVELY (refuse + a clear recovery path).
    import re

    cons = man.get("constraints", {})

    def _constrained_by(col: str) -> list:
        pat = rf"(?<![A-Za-z0-9_`]){re.escape(col)}(?![A-Za-z0-9_`])"
        return sorted(cn for cn, ce in cons.items() if re.search(pat, ce))

    for frm, to in (rename or {}).items():
        if frm not in logical:
            raise ValueError(
                f"rename of unknown column {frm!r} at {path} — the "
                f"logical schema has {sorted(logical)}"
            )
        if to in logical:
            raise ValueError(
                f"rename {frm!r} -> {to!r} at {path} collides with an "
                "existing column"
            )
        hits = _constrained_by(frm)
        if hits:
            raise ValueError(
                f"column {frm!r} is referenced by CHECK constraint(s) "
                f"{hits} at {path} — drop_snapshot_constraint first, "
                "then rename and re-add under the new name"
            )
        logical.discard(frm)
        logical.add(to)
        ops = ops + [{"op": "rename", "from": frm, "to": to,
                      "dirs": man["dirs"], "seq": n}]
    for col in (drop or []):
        if col not in logical:
            raise ValueError(
                f"drop of unknown column {col!r} at {path} — the "
                f"logical schema has {sorted(logical)}"
            )
        hits = _constrained_by(col)
        if hits:
            raise ValueError(
                f"column {col!r} is referenced by CHECK constraint(s) "
                f"{hits} at {path} — drop_snapshot_constraint first"
            )
        logical.discard(col)
        ops = ops + [{"op": "drop", "col": col, "dirs": man["dirs"],
                      "seq": n}]
    # seq = the committing version: readers replay ops and pending
    # merge-on-read deletes in one commit-ordered log, so the two
    # metadata-only planes compose instead of refusing each other
    manifest = {
        "version": n,
        "dirs": man["dirs"],
        "txns": _normalize_txns(man.get("txns", {})),
        "stats": man.get("stats", {}),
        "schema_ops": ops,
        "op": {"name": "alter_schema", "rename": dict(rename or {}),
               "drop": list(drop or [])},
    }
    _carry_planes(man, manifest, exclude=("schema_ops",))
    _publish_manifest(man_dir, n, manifest)
    return n


def _apply_schema_ops(part: DataFrame, entry_ops: list) -> DataFrame:
    """Map one entry group's PHYSICAL columns to the logical schema by
    replaying its applicable rename/drop ops in commit order."""
    for op in entry_ops:
        if op["op"] == "rename" and op["from"] in part.columns:
            part = part.withColumnRenamed(op["from"], op["to"])
        elif op["op"] == "drop" and op["col"] in part.columns:
            part = part.drop(op["col"])
    return part


def snapshot_stats(path: str, version: int | None = None) -> dict:
    """Table-level stats for one snapshot version (latest when None) —
    {"version", "n_rows", "n_bytes", "n_files", "n_entries"} — from the
    manifest's per-entry stats stamped at commit: ONE manifest read,
    zero data I/O and zero file listings (Iceberg's
    ``SELECT ... FROM table.snapshots``-style metadata query). Row counts
    per version are exact, so ``SELECT COUNT(*)`` over any version is a
    metadata-only answer. Legacy stats-less manifests back-fill with a
    one-time footer walk."""
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    if version is None:
        version = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{version}.json")) as fh:
        man = json.load(fh)
    stats = _manifest_stats(man)
    return {
        "version": version,
        # file-level counts (Iceberg semantics): pending merge-on-read
        # deletes do not adjust n_rows until compaction materializes them
        # — n_delete_preds tells the reader whether that caveat applies
        "n_rows": sum(s["n_rows"] for s in stats.values()),
        "n_bytes": sum(s["n_bytes"] for s in stats.values()),
        "n_files": sum(s["n_files"] for s in stats.values()),
        "n_entries": len(man["dirs"]),
        "n_delete_preds": len(man.get("deletes", [])),
        "n_dvs": len(man.get("dvs", [])),
    }


def snapshot_column_stats(path: str, version: int | None = None) -> dict:
    """Table-level per-column [min, max] for one snapshot version
    (latest when None), folded from the manifest's stamped per-entry
    column stats — ONE manifest read, zero data I/O (the Iceberg
    ``table.files``/Delta stats-query analog; what an external
    cost-based optimizer or a freshness monitor reads instead of
    scanning). Only columns with a stamped range in EVERY entry
    qualify (a single stats-less entry makes the table-level range
    unknowable without I/O — such columns are omitted rather than
    guessed); pending merge-on-read deletes do not tighten ranges
    until compaction materializes them (file-level semantics, like
    ``snapshot_stats``). Returns {col: [min, max]}."""
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    if version is None:
        version = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{version}.json")) as fh:
        man = json.load(fh)
    stats = _manifest_stats(man)
    out: dict = {}
    first = True
    for e in man["dirs"]:
        cols = (stats.get(e) or {}).get("cols", {})
        if first:
            out = {c: [lo, hi] for c, (lo, hi) in
                   ((c, tuple(v)) for c, v in cols.items())}
            first = False
            continue
        for c in list(out):
            rng = cols.get(c)
            if rng is None:
                del out[c]  # not stamped everywhere: unknowable
                continue
            try:
                out[c] = [min(out[c][0], rng[0]), max(out[c][1], rng[1])]
            except TypeError:  # mixed stamped types across entries
                del out[c]
    return out


def snapshot_files(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The per-entry metadata relation (Iceberg ``table.files`` / Delta
    DESCRIBE DETAIL granularity) for one snapshot version (latest when
    None), answered from the MANIFEST alone — one row per entry:
    ``entry`` (path), ``is_file`` (a carried split file vs a dir),
    ``n_rows`` / ``n_bytes`` / ``n_files`` (stamped at commit, zero
    I/O), ``partition`` (the stamp as a ``spec -> value`` map, NULL for
    unpartitioned entries), and ``bloom_key`` (the sidecar's key
    column, NULL when none). What an operator or an external planner
    joins against instead of listing 100 TB of files."""
    import json
    import os

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    man_dir = os.path.join(path, "_manifests")
    if version is None:
        version = _latest_version(man_dir)
    with open(os.path.join(man_dir, f"v{version}.json")) as fh:
        man = json.load(fh)
    stats = _manifest_stats(man)
    rows = []
    for e in man["dirs"]:
        s = stats.get(e) or {}
        rows.append((
            e,
            e.endswith(".parquet"),
            int(s.get("n_rows", 0)),
            int(s.get("n_bytes", 0)),
            int(s.get("n_files", 0)),
            s.get("partition"),
            (s.get("bloom") or {}).get("key"),
        ))
    schema = StructType([
        StructField("entry", StringType()),
        StructField("is_file", BooleanType()),
        StructField("n_rows", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_files", LongType()),
        StructField("partition", MapType(StringType(), StringType())),
        StructField("bloom_key", StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def restore_snapshot(path: str, version: int) -> int:
    """Delta ``RESTORE TABLE ... TO VERSION`` analog: commit the target
    version's exact state — entries, stamped stats, and its pending
    metadata planes (merge-on-read deletes, schema ops, constraints) —
    as the NEW head. Metadata-only: the immutable entries are
    re-referenced, zero data I/O at any table size; the pre-restore
    head stays time-travelable, so a second restore undoes the first.
    The txn idempotence map is kept from the PRE-restore head (a
    replayed streaming batch must still no-op after a restore — Delta
    keeps the transaction log the same way). Only versions retention
    kept are restorable; incremental readers see the restore as a
    replace commit (their superset check raises rather than
    misreporting removed rows as an append delta)."""
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    latest = _latest_version(man_dir)
    target_p = os.path.join(man_dir, f"v{version}.json")
    if not os.path.exists(target_p):
        raise ValueError(
            f"version {version} of {path} is not retained "
            "(expired or never committed) — nothing to restore to"
        )
    with open(target_p) as fh:
        target = json.load(fh)
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        head = json.load(fh)
    n = latest + 1
    manifest = {
        "version": n,
        "dirs": target["dirs"],
        "txns": _normalize_txns(head.get("txns", {})),
        "stats": target.get("stats", {}),
        "op": {"name": "restore", "to_version": version},
    }
    _carry_planes(target, manifest)  # the TARGET state's planes, whole
    _publish_manifest(man_dir, n, manifest)
    return n


def clone_snapshot(
    src: str, dst: str, version: int | None = None, carry_txns: bool = False
) -> int:
    """SHALLOW CLONE (Delta ``CREATE TABLE ... SHALLOW CLONE`` /
    Iceberg snapshot-ref analog): commit a NEW table at ``dst`` whose
    v1 manifest references the SOURCE's data entries (and carries its
    stamped stats and pending metadata planes — deletes, deletion
    vectors, schema ops, constraints, cdf property) for ``version``
    (source latest when None). METADATA-ONLY: zero bytes copied at any
    table size — the instant dev/test fork of a 100 TB table.

    The clone evolves independently (appends/deletes/compactions land
    under ``dst``; the source never sees them), and its first
    compaction naturally localizes the data. THE SHALLOW-CLONE CAVEAT
    (same as Delta's): the clone references the source's FILES, so
    retention on the SOURCE (``expire_snapshots`` / ``gc_orphans``)
    can reclaim files the clone still needs — snapshot the source's
    retention policy accordingly, or compact the clone (rewriting its
    data into its own tree) before shrinking source retention. The
    clone's own maintenance is safe from birth: its GC only ever
    touches ``dst``'s trees, and carried source entries are absolute
    paths outside them. The txn map is NOT carried by default (the
    clone is a new table; replaying a source stream into it must
    re-deliver) — ``carry_txns=True`` (what ``create_branch`` uses)
    inherits the source's replay protection, because a BRANCH continues
    the source's ingest streams rather than starting new ones.

    Returns the clone's committed version (1). ``dst`` must not
    already be a snapshot table."""
    import json
    import os

    src_man_dir = os.path.join(src, "_manifests")
    if version is None:
        version = _latest_version(src_man_dir)
    with open(os.path.join(src_man_dir, f"v{version}.json")) as fh:
        man = json.load(fh)
    dst_man_dir = os.path.join(dst, "_manifests")
    if os.path.isdir(dst_man_dir) and any(
        f.startswith("v") and f.endswith(".json")
        for f in os.listdir(dst_man_dir)
    ):
        raise ValueError(
            f"{dst} is already a snapshot table — CLONE creates new "
            "tables only (append/merge into the existing one instead)"
        )
    os.makedirs(dst_man_dir, exist_ok=True)
    os.makedirs(os.path.join(dst, "data"), exist_ok=True)
    manifest = {
        "version": 1,
        "dirs": list(man["dirs"]),
        "txns": _normalize_txns(man.get("txns", {})) if carry_txns else {},
        "stats": man.get("stats", {}),
        "op": {"name": "clone", "source": src,
               "source_version": version},
    }
    _carry_planes(man, manifest)
    _publish_manifest(dst_man_dir, 1, manifest)
    return 1


_REF_NAME_RE = None  # compiled lazily — keeps the module import light


def _check_ref_name(name: str) -> None:
    global _REF_NAME_RE
    if _REF_NAME_RE is None:
        import re

        _REF_NAME_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]*")
    if not _REF_NAME_RE.fullmatch(name):
        raise ValueError(
            f"ref name {name!r} invalid: letters/digits/._- only, "
            "must start alphanumeric (it becomes a directory name)"
        )


def branch_path(path: str, name: str) -> str:
    """The on-disk table path of branch ``name`` — itself a full snapshot
    table: every reader/writer (read_snapshot, write_snapshot, delete,
    merge, compaction, the DataSource) works on it unchanged."""
    import os

    _check_ref_name(name)
    return os.path.join(path, "_refs", name)


def resolved_branch_path(path: str, name: str) -> str:
    """``branch_path`` + existence check — the shared reroute every
    named-ref entry point (read_snapshot, the DataSource) uses, so the
    validation cannot drift between them."""
    import os

    bpath = branch_path(path, name)
    if not os.path.isdir(os.path.join(bpath, "_manifests")):
        raise ValueError(f"no branch {name!r} under {path}")
    return bpath


def create_branch(path: str, name: str, version: int | None = None) -> str:
    """Create branch ``name`` from ``version`` of the table (latest when
    None) — an Iceberg branch-ref analog built as an IN-TREE SHALLOW
    CLONE under ``<path>/_refs/<name>/``: the branch's v1 manifest
    references the source version's data entries, ZERO bytes copied at
    any table size. The branch then evolves independently through the
    ordinary snapshot API; main never sees branch commits until
    ``publish_branch``.

    This is the isolation half of WRITE-AUDIT-PUBLISH (the staging
    pattern large ingest pipelines run): write new data to a branch,
    audit it there (constraints, quality checks, dedup alarms), and
    publish atomically — readers of main see either none or all of it.

    Retention caveat (same as SHALLOW CLONE, which this is):
    ``expire_snapshots``/``gc_orphans`` on MAIN can reclaim files an
    unpublished branch still references — age maintenance windows
    accordingly, or compact the branch first. Main's GC never sweeps
    ``_refs/`` itself (it only lists ``<path>/data``).

    Returns the branch's table path."""
    import os

    import json

    bpath = branch_path(path, name)
    if os.path.isdir(os.path.join(bpath, "_manifests")):
        raise ValueError(f"branch {name!r} already exists at {bpath}")
    # carry_txns: a branch CONTINUES main's ingest streams (the WAP loop
    # stages the same stream's next batch each cycle) — without the map a
    # crash-replayed batch would re-append on the fresh branch and the
    # next publish would double-count it on main
    if version is None:  # resolve BEFORE the clone: the sidecar below
        version = _latest_version(os.path.join(path, "_manifests"))
    clone_snapshot(path, bpath, version, carry_txns=True)
    # fork metadata survives branch-side retention (expire_snapshots on
    # the branch may drop the v1 clone manifest): publish_branch and
    # list_branches read this sidecar first, v1.json as fallback
    with open(os.path.join(bpath, ".fork.json"), "w") as fh:
        json.dump({"fork_version": version}, fh)
    return bpath


def _fork_version(bpath: str):
    """A branch's fork point: the ``.fork.json`` sidecar (written at
    create_branch, survives branch-side manifest expiry), with the v1
    clone manifest's ``source_version`` as fallback for branches made
    by hand via clone_snapshot. None when neither survives."""
    import json
    import os

    p = os.path.join(bpath, ".fork.json")
    if os.path.exists(p):
        with open(p) as fh:
            return int(json.load(fh)["fork_version"])
    v1 = os.path.join(bpath, "_manifests", "v1.json")
    if os.path.exists(v1):
        with open(v1) as fh:
            return json.load(fh).get("op", {}).get("source_version")
    return None


def list_branches(path: str) -> list[dict]:
    """Every branch with its head version and the main version it forked
    from (None if the fork metadata was lost — pre-sidecar hand clones
    whose v1 manifest expired)."""
    import os

    refs = os.path.join(path, "_refs")
    out = []
    if not os.path.isdir(refs):
        return out
    for name in sorted(os.listdir(refs)):
        man_dir = os.path.join(refs, name, "_manifests")
        if not os.path.isdir(man_dir):
            continue
        out.append({
            "name": name,
            "head_version": _latest_version(man_dir),
            "fork_version": _fork_version(os.path.join(refs, name)),
        })
    return out


def publish_branch(path: str, name: str, force: bool = False) -> int:
    """PUBLISH (Iceberg ``fast_forward`` / the P of write-audit-publish):
    commit the branch head's exact state — entries, stats, pending
    metadata planes — as main's next version, atomically via the same
    create-exclusive manifest publish every writer uses. Metadata-only:
    zero data I/O; the branch's data dirs live under ``_refs/<name>/``
    and main's manifest references them absolutely (main's GC compares
    dir basenames and never sweeps outside ``<path>/data``, so published
    entries are safe — but ``drop_branch`` refuses while any retained
    main manifest still references them).

    NON-FAST-FORWARD GUARD: if main advanced past the branch's fork
    version, publishing would silently discard those main commits from
    the head (they stay time-travelable, but that is a replace, not a
    publish) — refused unless ``force=True``. The txn idempotence map is
    kept from MAIN's head, exactly like ``restore_snapshot``: a replayed
    main stream batch must still no-op after a publish.

    Returns main's new head version."""
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    bpath = branch_path(path, name)
    bman_dir = os.path.join(bpath, "_manifests")
    if not os.path.isdir(bman_dir):
        raise ValueError(f"no branch {name!r} under {path}")
    bhead_v = _latest_version(bman_dir)
    with open(os.path.join(bman_dir, f"v{bhead_v}.json")) as fh:
        bhead = json.load(fh)
    fork_version = _fork_version(bpath)
    if fork_version is None and not force:
        raise ValueError(
            f"branch {name!r} has no fork metadata (hand clone whose v1 "
            "manifest expired) — the non-fast-forward guard cannot run; "
            "pass force=True to publish as a head replace"
        )
    latest = _latest_version(man_dir)
    if latest != fork_version and not force:
        raise SnapshotConflictError(
            f"non-fast-forward: main is at v{latest} but branch {name!r} "
            f"forked from v{fork_version} — rebase (re-branch and replay) "
            "or pass force=True to replace main's head with the branch "
            "state (intervening commits stay time-travelable)"
        )
    with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
        head = json.load(fh)
    # replay protection merges BOTH histories per-app (highest batch
    # wins): the branch carried main's map at fork and advanced it with
    # every staged batch — keeping only main's map would re-append a
    # crash-replayed batch on the next WAP cycle (double-count on main)
    txns = _normalize_txns(head.get("txns", {}))
    for app, rec in _normalize_txns(bhead.get("txns", {})).items():
        cur = txns.get(app)
        if cur is None or int(rec["v"]) > int(cur["v"]):
            txns[app] = dict(rec)
    n = latest + 1
    manifest = {
        "version": n,
        "dirs": list(bhead["dirs"]),
        "txns": txns,
        "stats": bhead.get("stats", {}),
        "op": {
            "name": "publish_branch",
            "branch": name,
            "branch_version": bhead_v,
            "fork_version": fork_version,
        },
    }
    _carry_planes(bhead, manifest)
    _publish_manifest(man_dir, n, manifest)
    return n


def drop_branch(path: str, name: str, force: bool = False) -> str:
    """Delete branch ``name``'s tree. REFUSES while any RETAINED main
    manifest still references a data dir the branch owns (a published
    branch's files serve main reads — including time-travel reads of the
    publish commit itself; dropping them would corrupt the table). To
    release the reference: compact main (localizes the head) AND expire
    the older manifests (``expire_snapshots``), or pass ``force=True``.
    Returns the removed path."""
    import os
    import shutil

    bpath = branch_path(path, name)
    if not os.path.isdir(os.path.join(bpath, "_manifests")):
        raise ValueError(f"no branch {name!r} under {path}")
    if not force:
        bdata = os.path.join(bpath, "data")
        owned = set(os.listdir(bdata)) if os.path.isdir(bdata) else set()
        # live refs from main AND every sibling branch: a branch created
        # AFTER a publish forked a main state that references this
        # branch's dirs — dropping them would corrupt the sibling
        live = _referenced_dir_names(os.path.join(path, "_manifests"))
        for b in list_branches(path):
            if b["name"] != name:
                live |= _referenced_dir_names(
                    os.path.join(branch_path(path, b["name"]), "_manifests")
                )
        still = sorted(owned & live)
        if still:
            raise ValueError(
                f"branch {name!r} owns data dirs main or a sibling branch "
                f"still references ({still[:3]}"
                f"{'...' if len(still) > 3 else ''}) — published "
                "state would lose files; compact main or force=True"
            )
    shutil.rmtree(bpath)
    return bpath


def create_tag(path: str, name: str, version: int | None = None) -> int:
    """Immutable named version pointer (Iceberg tag-ref analog): a tiny
    create-exclusive JSON under ``<path>/_tags/`` — 'the snapshot we
    trained run X on', resolvable forever (while the version is
    retained). Tags never move; re-creating an existing name raises.
    Returns the tagged version."""
    import json
    import os

    _check_ref_name(name)
    man_dir = os.path.join(path, "_manifests")
    if version is None:
        version = _latest_version(man_dir)
    if not os.path.exists(os.path.join(man_dir, f"v{version}.json")):
        raise ValueError(f"version {version} of {path} is not retained")
    tdir = os.path.join(path, "_tags")
    os.makedirs(tdir, exist_ok=True)
    import time

    try:
        with open(os.path.join(tdir, f"{name}.json"), "x") as fh:
            json.dump({"version": version, "ts": time.time()}, fh)
    except FileExistsError:
        raise ValueError(
            f"tag {name!r} already exists (tags are immutable — pick a "
            "new name or read the existing one via resolve_tag)"
        ) from None
    return version


def resolve_tag(path: str, name: str) -> int:
    """The version a tag points at — pass to ``read_snapshot(version=)``.
    A tag whose version was expired raises there, not here (the pointer
    is still honest history)."""
    import json
    import os

    _check_ref_name(name)
    p = os.path.join(path, "_tags", f"{name}.json")
    if not os.path.exists(p):
        raise ValueError(f"no tag {name!r} under {path}")
    with open(p) as fh:
        return int(json.load(fh)["version"])


def list_tags(path: str) -> list[dict]:
    import json
    import os

    tdir = os.path.join(path, "_tags")
    out = []
    if not os.path.isdir(tdir):
        return out
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".json"):
            with open(os.path.join(tdir, f)) as fh:
                d = json.load(fh)
            out.append({"name": f[:-5], "version": int(d["version"]),
                        "ts": d.get("ts")})
    return out


def snapshot_history(path: str) -> list[dict]:
    """Delta ``DESCRIBE HISTORY`` analog: one row per retained version —
    {"version", "ts", "op", "op_params", "n_entries", "n_rows",
    "n_files", "n_delete_preds", "n_schema_ops", "n_constraints"} —
    answered from the manifests alone: stamped stats mean zero I/O for
    any manifest written by this code; a legacy stats-less manifest
    back-fills once from parquet FOOTERS (metadata pages, never data).
    ``op`` is the operation that produced the commit (append / replace /
    compact / delete / merge / replace_where / add_constraint /
    drop_constraint / alter_schema / restore — Delta's ``operation``
    column) and ``op_params`` its parameters dict (Delta's
    ``operationParameters``); legacy pre-op manifests surface None —
    without this column a consumer cannot tell a restore from a
    replace. Ordered oldest-first."""
    import json
    import os

    man_dir = os.path.join(path, "_manifests")
    out = []
    for v in sorted(
        int(f[1:-5]) for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    ):
        with open(os.path.join(man_dir, f"v{v}.json")) as fh:
            man = json.load(fh)
        stats = _manifest_stats(man)
        op = man.get("op")
        out.append({
            "version": v,
            "ts": man.get("ts"),
            "op": op.get("name") if op else None,
            "op_params": (
                {k: v2 for k, v2 in op.items() if k != "name"}
                if op else None
            ),
            "n_entries": len(man["dirs"]),
            "n_rows": int(sum(s["n_rows"] for s in stats.values())),
            "n_files": int(sum(s["n_files"] for s in stats.values())),
            "n_delete_preds": len(man.get("deletes", [])),
            "n_dvs": len(man.get("dvs", [])),
            "n_schema_ops": len(man.get("schema_ops", [])),
            "n_constraints": len(man.get("constraints", {})),
        })
    return out


def gc_orphans(path: str, older_than_s: float = 0.0) -> list[str]:
    """Orphan-file cleanup (Iceberg ``remove_orphan_files`` analog):
    delete data directories referenced by NO manifest of ANY version —
    a conflict loser's leftovers, or debris from a writer that crashed
    between its data write and its manifest publish. Unlike
    ``expire_snapshots`` this keeps every manifest, so time travel is
    untouched; its one job is unblocking ``snapshot_stream_source``'s
    no-orphan startup check without giving up history.

    ``older_than_s`` is the safety window against IN-FLIGHT commits
    (data lands before the manifest publish — collecting a dir inside
    that window would brick the commit that is about to reference it):
    only dirs whose mtime is at least this old are collected. Iceberg
    defaults the same knob to 3 days; the 0.0 default here is only safe
    with quiesced writers, so production maintenance should pass a real
    age. Returns the deleted dirs (for audit logs)."""
    import json
    import os
    import shutil
    import time

    man_dir = os.path.join(path, "_manifests")
    # compare by BASENAME, not full path: every data dir of this table
    # lives directly under path/data, so the dir name IS its identity —
    # manifests store the path as the WRITER spelled it (absolute,
    # relative, symlinked mount), and a GC process comparing raw strings
    # from a different spelling would misclassify every live dir as an
    # orphan and delete the table
    referenced = _referenced_dir_names(man_dir)
    data_root = os.path.join(path, "data")
    on_disk = sorted(os.listdir(data_root))
    if on_disk and referenced and not (set(on_disk) & referenced):
        # disjointness is LEGITIMATE when the manifests reference
        # branch-owned dirs (a fully branch-backed head after a publish):
        # only raise if the references resolve to no branch tree either
        refs_root = os.path.join(path, "_refs")
        branch_owned: set = set()
        if os.path.isdir(refs_root):
            for b in os.listdir(refs_root):
                bdata = os.path.join(refs_root, b, "data")
                if os.path.isdir(bdata):
                    branch_owned.update(os.listdir(bdata))
        if not (referenced & branch_owned):
            raise ValueError(
                f"no on-disk data dir under {data_root} matches ANY "
                "manifest reference — a corrupted or foreign manifest set "
                "is far likelier than a 100%-orphan table; refusing to "
                "delete"
            )
    deleted = []
    now = time.time()
    for d in on_disk:
        full = os.path.join(data_root, d)
        if d not in referenced and now - os.path.getmtime(full) >= older_than_s:
            shutil.rmtree(full)
            _drop_bloom(path, d)
            deleted.append(full)
    # change-data and deletion-vector planes orphaned by lost races /
    # crashed writers sweep under the same age gate (referenced by ANY
    # manifest = live)
    deleted += _sweep_change_dirs(
        path, _referenced_change_dirs(man_dir), older_than_s
    )
    deleted += _sweep_change_dirs(
        path, _referenced_dv_dirs(man_dir), older_than_s, root_name="_dv"
    )
    return deleted


def _drop_bloom(path: str, dir_name: str) -> None:
    """Remove a reclaimed data dir's bloom sidecars, if any — the dir's
    own (``<dir>.bloom``) and every per-partition-subdir sidecar under
    it (``<dir>.<subdir>.bloom``); sidecars are keyed by the commit
    dir's basename and die with it."""
    import os

    bloom_dir = os.path.join(path, "_blooms")
    if not os.path.isdir(bloom_dir):
        return
    for f in os.listdir(bloom_dir):
        if f == dir_name + ".bloom" or (
            f.startswith(dir_name + ".") and f.endswith(".bloom")
        ):
            os.remove(os.path.join(bloom_dir, f))


def _referenced_dir_names(man_dir: str, versions=None) -> set:
    """Basenames of every data dir the (given or all) manifests reference —
    the path-spelling-proof identity the GC paths compare on. A FILE
    entry (carried forward by a file-pruned delete) references its
    PARENT data dir: as long as any file in a dir is live, the dir must
    survive GC/expiry (its superseded siblings are reclaimed when a
    later compaction collapses the manifest back to whole dirs)."""
    import json
    import os

    def dir_name(entry: str) -> str:
        # identity = the path component directly under the table's
        # ``data/`` dir: a partition entry (data/vN-tok/__part_c=v) or a
        # carried FILE entry (data/vN-tok/x.parquet) both resolve to the
        # commit dir vN-tok that owns them
        p = os.path.normpath(entry)
        parts = p.split(os.sep)
        if "data" in parts:
            i = len(parts) - 1 - parts[::-1].index("data")
            if i + 1 < len(parts):
                return parts[i + 1]
        return os.path.basename(os.path.dirname(p) if p.endswith(".parquet") else p)

    names: set = set()
    for f in os.listdir(man_dir):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        if versions is not None and int(f[1:-5]) not in versions:
            continue
        with open(os.path.join(man_dir, f)) as fh:
            names.update(dir_name(d) for d in json.load(fh)["dirs"])
    return names


def _referenced_change_dirs(man_dir: str, versions=None) -> set:
    """Basenames of every change-data dir the (given or all) manifests
    reference — the sweep identity for ``path/_changes``, mirroring
    ``_referenced_dir_names`` for the data tree."""
    import json
    import os

    names: set = set()
    for f in os.listdir(man_dir):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        if versions is not None and int(f[1:-5]) not in versions:
            continue
        with open(os.path.join(man_dir, f)) as fh:
            cd = json.load(fh).get("change_data")
        if cd:
            names.add(os.path.basename(os.path.normpath(cd)))
    return names


def _referenced_dv_dirs(man_dir: str, versions=None) -> set:
    """Basenames of every deletion-vector dir the (given or all)
    manifests reference — the sweep identity for ``path/_dv``."""
    import json
    import os

    names: set = set()
    for f in os.listdir(man_dir):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        if versions is not None and int(f[1:-5]) not in versions:
            continue
        with open(os.path.join(man_dir, f)) as fh:
            for d in json.load(fh).get("dvs", []):
                names.add(os.path.basename(os.path.normpath(d["dir"])))
    return names


def _sweep_change_dirs(path: str, referenced: set,
                       older_than_s: float = 0.0,
                       root_name: str = "_changes") -> list[str]:
    """Delete sidecar-plane dirs (``path/_changes`` change data,
    ``path/_dv`` deletion vectors) referenced by no given manifest set
    (age-gated like the data sweep — a plane lands before its manifest
    publish). Returns the deleted dirs."""
    import os
    import shutil
    import time

    ch_root = os.path.join(path, root_name)
    if not os.path.isdir(ch_root):
        return []
    deleted = []
    now = time.time()
    for d in sorted(os.listdir(ch_root)):
        full = os.path.join(ch_root, d)
        if d not in referenced and now - os.path.getmtime(full) >= older_than_s:
            shutil.rmtree(full)
            deleted.append(full)
    return deleted


def _referenced_subitems(man_dir: str, versions=None) -> dict:
    """Per commit-dir reference granularity across the (given or all)
    manifests: ``{commit_dir_name: "whole" | {subdir names}}``. A whole-
    dir entry (or a carried file directly under the dir) marks the dir
    "whole"; partition-subdir entries (and carried files INSIDE a
    subdir) mark just that subdir — which is what lets retention reclaim
    a superseded partition subdir while its live siblings keep the
    commit dir alive."""
    import json
    import os

    refs: dict = {}
    for f in os.listdir(man_dir):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        if versions is not None and int(f[1:-5]) not in versions:
            continue
        with open(os.path.join(man_dir, f)) as fh:
            entries = json.load(fh)["dirs"]
        for entry in entries:
            parts = os.path.normpath(entry).split(os.sep)
            if "data" not in parts:
                continue  # foreign spelling: top-level sweep handles it
            i = len(parts) - 1 - parts[::-1].index("data")
            rel = parts[i + 1:]
            if not rel:
                continue
            name = rel[0]
            if len(rel) == 1 or rel[1].endswith(".parquet"):
                # the whole commit dir, or a file directly under it
                # (unpartitioned commit): keep everything inside
                refs[name] = "whole"
            elif refs.get(name) != "whole":
                refs.setdefault(name, set()).add(rel[1])
    return refs


def expire_snapshots(path: str, keep_last: int = 1,
                     dry_run: bool = False,
                     keep_newer_than_s: float | None = None) -> list[str]:
    """Retention cleanup (Iceberg ``expire_snapshots`` analog): drop all
    but the last ``keep_last`` manifests, then delete every data
    directory no kept manifest references — and, inside surviving
    commit dirs of PARTITIONED tables, every partition subdir no kept
    manifest references (a ``replace_where`` supersedes one partition's
    subdirs while their siblings stay live; without the subdir sweep a
    daily reprocess-one-partition loop would leak the replaced bytes
    forever). Time travel shrinks to the kept window; the CURRENT
    version is never touchable (keep_last >= 1 enforced). Returns the
    deleted data dirs/subdirs (for audit logs).

    ``dry_run=True`` (Delta ``VACUUM ... DRY RUN``): report exactly
    what a real pass would delete — data dirs, partition subdirs, and
    expired change planes — while touching NOTHING (manifests
    included), so an operator can audit a retention change before
    paying it.

    ``keep_newer_than_s`` (the TIME-based retention twin — Delta's
    ``delta.logRetentionDuration`` / VACUUM-hours shape): every version
    committed within the last N seconds survives IN ADDITION to the
    last ``keep_last`` — "time travel to anywhere in the last 7 days"
    is ``keep_last=1, keep_newer_than_s=7*86400`` on a scheduler,
    whatever the commit rate; stamp-less legacy manifests count as
    arbitrarily old (never age-kept)."""
    import json
    import os
    import shutil
    import time

    assert keep_last >= 1, "the current version must always survive"
    man_dir = os.path.join(path, "_manifests")
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    keep = set(versions[-keep_last:])
    if keep_newer_than_s is not None:
        cutoff = time.time() - keep_newer_than_s
        for v in versions:
            with open(os.path.join(man_dir, f"v{v}.json")) as fh:
                if json.load(fh).get("ts", 0.0) >= cutoff:
                    keep.add(v)
    keep = sorted(keep)
    drop = [v for v in versions if v not in set(keep)]
    # basename comparison, like gc_orphans: manifests carry the writer's
    # path spelling, and a raw-string mismatch here would delete EVERY
    # data dir including the current version's
    referenced = _referenced_dir_names(man_dir, versions=set(keep))
    subrefs = _referenced_subitems(man_dir, versions=set(keep))
    deleted = []
    data_root = os.path.join(path, "data")
    for d in sorted(os.listdir(data_root)):
        full = os.path.join(data_root, d)
        if d not in referenced:
            if not dry_run:
                shutil.rmtree(full)
                _drop_bloom(path, d)
            deleted.append(full)
            continue
        live_subs = subrefs.get(d)
        if isinstance(live_subs, set):
            # the commit dir survives only through SUBDIR references:
            # reclaim its unreferenced partition subdirs (superseded by
            # replace_where); plain files (_SUCCESS) stay
            for child in sorted(os.listdir(full)):
                cp = os.path.join(full, child)
                if os.path.isdir(cp) and child not in live_subs:
                    if not dry_run:
                        shutil.rmtree(cp)
                        bf = os.path.join(path, "_blooms",
                                          f"{d}.{child}.bloom")
                        if os.path.exists(bf):  # the subdir's sidecar
                            os.remove(bf)
                    deleted.append(cp)
    # change-data and deletion-vector planes of expired versions die
    # with their manifests
    ch_refs = _referenced_change_dirs(man_dir, versions=set(keep))
    dv_refs = _referenced_dv_dirs(man_dir, versions=set(keep))
    if dry_run:
        for root_name, refs in (("_changes", ch_refs), ("_dv", dv_refs)):
            root = os.path.join(path, root_name)
            if os.path.isdir(root):
                deleted += [
                    os.path.join(root, d)
                    for d in sorted(os.listdir(root)) if d not in refs
                ]
        return deleted
    deleted += _sweep_change_dirs(path, ch_refs)
    deleted += _sweep_change_dirs(path, dv_refs, root_name="_dv")
    for v in drop:
        os.remove(os.path.join(man_dir, f"v{v}.json"))
    return deleted
