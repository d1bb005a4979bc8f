"""Spark-native DataSource for snapshot tables (``format("naru_snapshot")``)
— the Spark 4 Python DataSource API (`pyspark.sql.datasource`) wired to
the manifest protocol, so a snapshot table is a FIRST-CLASS source:

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("naru_snapshot").load(path)                # batch
    spark.read.format("naru_snapshot").option("version", 3).load(path)
    spark.readStream.format("naru_snapshot").load(path)          # stream

What makes this Spark-first rather than a toy:

- **Catalyst-driven data skipping**: ``pushFilters`` receives the query's
  own pushed predicates (EqualTo / In / range filters) and eliminates
  manifest entries against the stamped per-entry column min/max and
  identity-partition values — ONE manifest read, zero footers, BEFORE
  any partition is planned. Filters are returned un-consumed (Spark
  re-applies them), so skipping can only reduce I/O, never change
  results — exactly the ``read_snapshot(prune=...)`` hint contract,
  but derived from the plan instead of the caller.
- **Exactly-once streaming offsets = manifest versions**: the stream
  reader's offset is ``{"version": N}`` — ``latestOffset`` polls the
  manifest dir (O(new manifests), never a file listing of the data
  tree), ``partitions(start, end)`` plans exactly the entries added in
  the range, and a replace commit inside a range raises instead of
  re-serving superseded files. This is the manifest-poll consumer the
  docs always prescribed past ~10^5 files, packaged as a real
  ``readStream`` source with checkpointed offsets.
- **Arrow-batched reads**: ``read`` yields pyarrow RecordBatches
  (never per-row Python), one InputPartition per data file.

HONEST SCOPE: the data path crosses Python (the API's cost), so the
JVM-native ``read_snapshot`` remains the throughput path for huge
scans; and the source serves RAW-FILE-CORRECT tables only — pending
merge-on-read deletes / deletion vectors / schema ops REFUSE at plan
time (the same rule as ``snapshot_stream_source``), because applying
those planes belongs to the JVM read path, not a per-file reader.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _man_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _load_manifest(path: str, version: int | None = None) -> dict:
    from naru_spark.sources.sinks import _latest_version

    v = _latest_version(_man_dir(path)) if version is None else version
    with open(os.path.join(_man_dir(path), f"v{v}.json")) as fh:
        man = json.load(fh)
    return man


def _version_at_ts(path: str, ts: float) -> int:
    """The last version committed at or before epoch-seconds ``ts``
    (Delta timestampAsOf resolution against the monotone commit
    stamps); a time before the first commit raises."""
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(_man_dir(path))
        if f.startswith("v") and f.endswith(".json")
    )
    pick = None
    for v in versions:
        if _load_manifest(path, v).get("ts", 0.0) <= ts:
            pick = v
    if pick is None:
        raise ValueError(
            f"naru_snapshot: timestamp {ts} predates every commit at "
            f"{path}"
        )
    return pick


def _resolve_version(options) -> int | None:
    """The version pinned by ``version`` / ``timestampAsOf`` options
    (mutually exclusive), or None = latest."""
    v = options.get("version")
    ts = options.get("timestampasof")
    tag = options.get("tag")
    if tag:
        # a tag names one immutable MAIN state — any other selector
        # contradicts it (and branch would resolve it against the wrong
        # version chain)
        if v or ts or options.get("branch"):
            raise ValueError(
                "naru_snapshot: tag is mutually exclusive with "
                "version/timestampAsOf/branch"
            )
        from naru_spark.sources.sinks import resolve_tag

        return resolve_tag(_table_path(options), tag)
    if v and ts:
        raise ValueError(
            "naru_snapshot: version and timestampAsOf are mutually "
            "exclusive"
        )
    if v:
        return int(v)
    if ts:
        return _version_at_ts(_table_path(options), float(ts))
    return None


def _refuse_pending(man: dict, path: str) -> None:
    for plane, msg in (
        ("deletes", "merge-on-read delete(s)"),
        ("dvs", "deletion vector(s)"),
        ("schema_ops", "rename/drop schema op(s)"),
    ):
        if man.get(plane):
            raise ValueError(
                f"naru_snapshot source: {path} has pending {msg} — raw "
                "files are not the logical rows; read via read_snapshot "
                "(which applies the planes) or materialize with "
                "compact_snapshot(full=True)"
            )


def _table_path(options) -> str:
    p = options.get("path")
    if not p:
        raise ValueError(
            'naru_snapshot needs a table path: .load("/path/to/table")'
        )
    # SQL DDL (CREATE TABLE ... USING naru_snapshot OPTIONS (path ...))
    # hands the option as a file:/ URI — normalize to a local path
    from naru_spark.sources.sinks import _strip_file_uri

    p = _strip_file_uri(p)
    b = options.get("branch")
    if b:
        from naru_spark.sources.sinks import resolved_branch_path

        p = resolved_branch_path(p, b)
    return p


def _refuse_tag(options, ctx: str) -> None:
    """Tags name one immutable batch-readable state — a stream follows
    the live head and a write moves it, so both must refuse the option
    loudly rather than silently ignore it."""
    if options.get("tag"):
        raise ValueError(
            f"naru_snapshot: the tag option selects an immutable version "
            f"for BATCH READS only — a {ctx} cannot target a tag"
        )


_SCHEMA_UNION_CAP = 64


def _arrow_schema_of(man: dict) -> "pyarrow.Schema":
    """The table's declared arrow schema: a UNION of one parquet footer
    per manifest entry (first file of each — files within an entry are
    one write, so they share a schema), in first-seen field order. An
    additively-evolved table (columns added by later appends /
    ``merge(schema_evolution=True)``) therefore declares the evolved
    columns too — pre-evolution files null-fill them at read
    (``_aligned_batches``), exactly like ``read_snapshot(merge_schema=
    True)``. Beyond ``_SCHEMA_UNION_CAP`` entries only the first and
    last non-empty entries are unioned (bounded plan-time footer reads;
    additive evolution means the last write carries the widest schema).
    A column appearing with CONFLICTING types across entries raises —
    a silent cast would corrupt reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from naru_spark.sources.sinks import _entry_files

    entries = [e for e in man["dirs"] if _entry_files(e)]
    if not entries:
        raise ValueError("naru_snapshot: the table holds no data files")
    if len(entries) > _SCHEMA_UNION_CAP:
        # bounded plan-time footer reads: first + last, plus any MIDDLE
        # entry whose stamped column stats introduce a name the picked
        # set lacks (footer-free detection of mid-history evolution;
        # only columns parquet can't stamp stats for — e.g. bool — can
        # still hide in an unpicked middle entry)
        stats = man.get("stats", {})

        def stat_cols(e):
            st = stats.get(e) or {}
            # min/max stamps miss bool/long-string columns; the nulls
            # stamps cover those too — union both for detection
            return set(st.get("cols") or {}) | set(st.get("nulls") or {})

        pick = [entries[0], entries[-1]]
        seen = stat_cols(entries[0]) | stat_cols(entries[-1])
        for e in entries[1:-1]:
            extra = stat_cols(e) - seen
            if extra:
                pick.append(e)
                seen |= extra
        entries = [e for e in entries if e in set(pick)]
    fields: dict = {}
    order: list = []
    for e in entries:
        sch = pq.ParquetFile(_entry_files(e)[0]).schema_arrow
        for f in sch:
            t = f.type
            if pa.types.is_timestamp(t) and t.unit == "ns":
                # Spark writes INT96 (surfacing as ns in arrow):
                # declare micros, reads cast batches to match
                t = pa.timestamp("us", tz=t.tz)
            if f.name not in fields:
                fields[f.name] = t
                order.append(f.name)
            elif fields[f.name] != t:
                raise ValueError(
                    f"naru_snapshot: column {f.name!r} has conflicting "
                    f"types across entries ({fields[f.name]} vs {t}) — "
                    "read via read_snapshot, which applies schema ops"
                )
    return pa.schema([pa.field(n, fields[n]) for n in order])


def _arrow_spark_schema(man: dict) -> StructType:
    """The declared Spark read schema (see ``_arrow_schema_of``)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(_arrow_schema_of(man))


# outbounds every stamped string value (_entry_stats caps stamps at 64
# chars), giving string ranges an inclusive upper sentinel
_STR_MAX = "\U0010FFFF" * 65


def _filter_hints(filters) -> dict:
    """Covering boxes / partition probes / date-time ranges from
    Catalyst's pushed filters — the plan-derived twin of
    ``_condition_prune_hints``. Only attribute-vs-literal comparisons
    on top-level columns contribute; anything else is ignored
    (unpruned, never wrong). Partition probes keep their RAW typed
    values (identity stamps stringify them, transformed stamps need
    the types); datetime/date literals collect into ``ranges`` for the
    days(col) transformed-stamp pruning."""
    import datetime
    import math

    boxes: dict = {}
    parts: dict = {}
    ranges: dict = {}
    notnull: set = set()
    isnull: set = set()
    dropped: set = set()

    def shrink(col, lo, hi):
        if col in dropped:
            return
        try:
            if col in boxes:
                lo = max(boxes[col][0], lo)
                hi = min(boxes[col][1], hi)
            boxes[col] = (lo, hi)
        except TypeError:
            boxes.pop(col, None)
            dropped.add(col)

    def trange(col, lo, hi):
        if col in ranges:
            plo, phi = ranges[col]
            lo = plo if lo is None else (lo if plo is None else max(plo, lo))
            hi = phi if hi is None else (hi if phi is None else min(phi, hi))
        ranges[col] = (lo, hi)

    def is_dt(v):
        return isinstance(v, (datetime.datetime, datetime.date))

    for f in filters:
        col = (
            f.attribute[0]
            if hasattr(f, "attribute") and len(f.attribute) == 1
            else None
        )
        if col is None:
            continue
        if isinstance(f, EqualTo):
            v = f.value
            if is_dt(v):
                trange(col, v, v)
                continue
            if isinstance(v, bool) or not isinstance(v, (int, float, str)):
                continue
            shrink(col, v, v)
            if isinstance(v, float):
                continue  # float dir-name round-trips are not exact
            ps = {v}
            parts[col] = (
                sorted(set(parts[col]) & ps) if col in parts
                else sorted(ps)
            )
        elif isinstance(f, In):
            vs = [
                v for v in f.value
                if not isinstance(v, bool) and isinstance(v, (int, float, str))
            ]
            if len(vs) != len(f.value) or not vs:
                continue
            try:
                shrink(col, min(vs), max(vs))
            except TypeError:
                continue
            if any(isinstance(v, float) for v in vs):
                continue  # float dir-name round-trips are not exact
            ps = set(vs)
            try:
                parts[col] = (
                    sorted(set(parts[col]) & ps) if col in parts
                    else sorted(ps)
                )
            except TypeError:
                parts.pop(col, None)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            if is_dt(f.value):
                trange(col, f.value, None)
            elif isinstance(f.value, str):
                # string min/max boxes are stamped (<=64 chars), so a
                # string range prunes ZORDER'd/clustered string layouts;
                # _STR_MAX outbounds any stamped value
                shrink(col, f.value, _STR_MAX)
            elif isinstance(f.value, (int, float)) and not isinstance(f.value, bool):
                shrink(col, f.value, math.inf)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            if is_dt(f.value):
                trange(col, None, f.value)
            elif isinstance(f.value, str):
                shrink(col, "", f.value)
            elif isinstance(f.value, (int, float)) and not isinstance(f.value, bool):
                shrink(col, -math.inf, f.value)
        elif isinstance(f, StringStartsWith):
            if isinstance(f.value, str) and f.value:
                # every string with this prefix sorts in
                # [prefix, prefix + _STR_MAX] against <=64-char stamps
                shrink(col, f.value, f.value + _STR_MAX)
        elif isinstance(f, IsNotNull):
            notnull.add(col)
        elif isinstance(f, IsNull):
            isnull.add(col)
    return {"prune": boxes, "partitions": parts, "ranges": ranges,
            "notnull": notnull, "isnull": isnull}


def _surviving_entries(man: dict, hints: dict | None) -> list[str]:
    """Entry elimination against the stamped stats: min/max boxes,
    identity AND transformed partition stamps (days/truncate/bucket all
    transform probe-side in pure Python — bucket through the XXH64 twin
    in ``sources/xxh64.py``), and days-stamp pruning from pushed
    DATE/TIMESTAMP range filters. Conservative throughout — unprovable
    means kept."""
    from naru_spark.sources.sinks import (
        _entry_overlaps,
        _partition_range_surviving,
        _partition_surviving_entries,
    )

    entries = man["dirs"]
    stats = man.get("stats", {})
    if hints:
        if hints.get("partitions"):
            for col, values in hints["partitions"].items():
                entries = _partition_surviving_entries(
                    None, entries, stats, col, list(values)
                )
        if hints.get("ranges"):
            for col, rng in hints["ranges"].items():
                entries = _partition_range_surviving(
                    entries, stats, col, rng
                )
        if hints.get("prune"):
            entries = [
                e for e in entries
                if _entry_overlaps(stats.get(e), hints["prune"])
            ]
        # stamped NULL counts (Delta nullCount analog): IS NOT NULL
        # skips all-null entries, IS NULL skips entries with zero
        # nulls — the sinks helper both read paths share (the
        # DataSource refuses pending schema ops at plan time, so the
        # dropped-column stand-down lives only on the JVM path)
        from naru_spark.sources.sinks import _null_surviving_entries

        for col in hints.get("notnull") or ():
            entries = _null_surviving_entries(entries, stats, col, "notnull")
        for col in hints.get("isnull") or ():
            entries = _null_surviving_entries(entries, stats, col, "isnull")
    return list(entries)


_DEFAULT_PARTITION_BYTES = 128 * 1024 * 1024
_OPEN_COST_BYTES = 4 * 1024 * 1024
_DEFAULT_PARALLELISM = 32


def _packed_file_groups(man: dict, entries: list[str],
                        max_bytes: int,
                        parallelism: int,
                        open_cost: int = _OPEN_COST_BYTES) -> list[list[str]]:
    """Surviving files PACKED into read units by Spark's own file-scan
    split formula (``FilePartition.maxSplitBytes``): one file per
    InputPartition under-parallelizes small-file tables and
    over-schedules Python workers on large ones. Per-file size is the
    manifest's stamped per-entry byte count divided across the entry's
    files (footer-free planning); stats-less legacy entries stat the
    files directly. ``maxSplit = min(maxBytesPerPartition,
    max(openCost, totalBytes/parallelism))`` with Spark's 4 MiB open
    cost padding each file — so small tables keep per-file parallelism
    and huge tables pack toward the 128 MiB ceiling. Files sort by size
    descending (Spark's packing order); a file larger than the split
    gets its own group (never split: the row-group scan inside a file
    already streams)."""
    import os

    from naru_spark.sources.sinks import _entry_files

    stats = man.get("stats", {})
    sized: list[tuple[str, int]] = []
    for e in entries:
        files = _entry_files(e)
        if not files:
            continue
        st = stats.get(e)
        if st and st.get("n_bytes") and st.get("n_files"):
            per = max(1, int(st["n_bytes"]) // max(1, int(st["n_files"])))
            sized += [(f, per) for f in files]
        else:
            sized += [(f, os.path.getsize(f)) for f in files]
    if not sized:
        return []
    total = sum(sz for _, sz in sized)
    max_split = min(
        max_bytes,
        max(open_cost, total // max(1, parallelism)),
    )
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f, sz in sorted(sized, key=lambda t: -t[1]):
        if cur and cur_bytes + sz > max_split:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz + open_cost
    if cur:
        groups.append(cur)
    return groups


class _FilePartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


class _FilesPartition(InputPartition):
    """A PACKED batch read unit: several data files scanned by one task
    (see ``_packed_file_groups``)."""

    def __init__(self, files: list):
        self.files = files


class _CDFPartition(InputPartition):
    """One change-feed read unit: a data (or change-plane) file plus the
    commit identity to stamp — ``label`` is the change type for files
    whose rows ARE the change (appended/removed entries); None for
    change-plane files that already carry ``_change_type``."""

    def __init__(self, file: str, label: str | None, version: int,
                 ts: float | None):
        self.file = file
        self.label = label
        self.version = version
        self.ts = ts


def _cdf_commit_partitions(path: str, sv: int, ev: int) -> list:
    """Per-commit change-feed planning, the streaming twin of
    ``read_snapshot_changes(row_level=True)``: for each version in
    (sv, ev], pick the cheapest exact source — the persisted change
    plane, appended entries as inserts, whole-entry manifest diffs for
    replace/restore, nothing for compaction — and RAISE for commits
    that mutated rows without a change plane (never under-report)."""
    from naru_spark.sources.sinks import _entry_files

    out: list = []
    prev = _load_manifest(path, sv) if sv else {}
    for v in range(sv + 1, ev + 1):
        man = _load_manifest(path, v)
        op = man.get("op") or {}
        ts = man.get("ts")
        prev_dirs, cur_dirs = prev.get("dirs", []), man["dirs"]
        removed = [d for d in prev_dirs if d not in set(cur_dirs)]
        added = [d for d in cur_dirs if d not in set(prev_dirs)]
        mor_changed = (
            man.get("deletes", []) != prev.get("deletes", [])
            or man.get("dvs", []) != prev.get("dvs", [])
        )
        prev = man

        def files(entries, label):
            return [
                _CDFPartition(f, label, v, ts)
                for e in entries for f in _entry_files(e)
            ]

        if man.get("change_data"):
            out += files([man["change_data"]], None)
        elif op.get("name") == "compact":
            pass  # re-layout: no row changed (dataChange=false)
        elif mor_changed:
            raise ValueError(
                f"version {v} of {path} changed merge-on-read / "
                "deletion-vector state without a change plane — cannot "
                "stream row-level changes for this range (enable cdf "
                "before row-rewriting commits)"
            )
        elif not removed and not added:
            pass  # metadata-only commit
        elif not removed:
            out += files(added, "insert")
        elif (op.get("name") in ("replace", "replace_where", "restore")
              and not op.get("carry")):
            out += files(removed, "delete") + files(added, "insert")
        else:
            raise ValueError(
                f"version {v} of {path} rewrote files without a change "
                f"plane (op={op.get('name') or 'unknown'!r}) — enable "
                "the change data feed before row-rewriting commits"
            )
    return out


def _cdf_read_batches(partition: _CDFPartition, schema: StructType):
    """Arrow batches of one CDF partition aligned to the declared read
    schema: the table columns (missing evolved columns null-filled),
    ``_change_type`` (the partition label, or the plane file's own
    column), ``_commit_version``, ``_commit_timestamp``."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    for batch in pq.ParquetFile(partition.file).iter_batches():
        n = batch.num_rows
        names = set(batch.schema.names)
        cols = []
        for field in schema:
            at = to_arrow_type(field.dataType)
            if field.name == "_change_type":
                if partition.label is not None:
                    cols.append(pa.array([partition.label] * n, type=at))
                else:
                    cols.append(batch.column("_change_type").cast(at))
            elif field.name == "_commit_version":
                cols.append(pa.array([partition.version] * n, type=at))
            elif field.name == "_commit_timestamp":
                cols.append(pa.array([partition.ts] * n, type=at))
            elif field.name in names:
                cols.append(batch.column(field.name).cast(at))
            else:  # pre-evolution file: later-added column reads NULL
                cols.append(pa.nulls(n, type=at))
        yield pa.RecordBatch.from_arrays(
            cols, names=[f.name for f in schema]
        )


def _read_file_batches(file: str):
    import pyarrow.parquet as pq

    yield from pq.ParquetFile(file).iter_batches()


def _aligned_batches(file: str, schema: StructType):
    """Arrow batches of one file ALIGNED to the declared read schema:
    only the declared columns are READ from disk (column pruning at the
    parquet scan), reordered by name, cast to the declared arrow types
    (INT96 timestamps read back as ns and cast to the declared micros),
    and columns a pre-evolution file lacks null-filled."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    fields = [(f.name, to_arrow_type(f.dataType)) for f in schema]
    pf = pq.ParquetFile(file)
    present = [
        nm for nm, _ in fields if nm in set(pf.schema_arrow.names)
    ]
    # columns=[] is valid: zero-column batches with correct row counts
    # (a projection of purely-evolved columns over a pre-evolution
    # file decodes NOTHING, just row-group metadata)
    for batch in pf.iter_batches(columns=present):
        n = batch.num_rows
        names = set(batch.schema.names)
        cols = [
            batch.column(name).cast(at) if name in names
            else pa.nulls(n, type=at)
            for name, at in fields
        ]
        yield pa.RecordBatch.from_arrays(
            cols, names=[nm for nm, _ in fields]
        )


class SnapshotBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = _table_path(options)
        self.man = _load_manifest(self.path, _resolve_version(options))
        _refuse_pending(self.man, self.path)
        self.hints: dict | None = None
        self.read_schema = schema
        self.target_bytes = int(
            options.get("maxbytesperpartition", _DEFAULT_PARTITION_BYTES)
        )
        self.parallelism = int(
            options.get("defaultparallelism", _DEFAULT_PARALLELISM)
        )
        # spark.sql.files.openCostInBytes analog: the per-file padding
        # that bounds how many small files pack into one read unit
        self.open_cost = int(
            options.get("opencostinbytes", _OPEN_COST_BYTES)
        )

    def pushFilters(self, filters):
        # record the plan's own predicates for entry elimination; hand
        # every filter BACK (Spark re-applies them — we only skip I/O)
        self.hints = _filter_hints(filters)
        return filters

    def partitions(self):
        groups = _packed_file_groups(
            self.man,
            _surviving_entries(self.man, self.hints),
            self.target_bytes,
            self.parallelism,
            self.open_cost,
        )
        return [_FilesPartition(g) for g in groups] or [_FilesPartition([])]

    def read(self, partition):
        files = partition.files
        if not files:
            return
        # fast path: when every DECLARED column matches the group's
        # unified dataset schema, ONE pyarrow dataset scan covers the
        # whole group (threaded column decode) with the projection
        # pushed into the scan; mixed/evolved groups fall back to the
        # per-file aligning reader
        import pyarrow.dataset as pads
        from pyspark.sql.pandas.types import to_arrow_type

        import pyarrow as pa

        declared = pa.schema(
            [pa.field(f.name, to_arrow_type(f.dataType))
             for f in self.read_schema]
        )
        try:
            ds = pads.dataset(files, format="parquet")
            names = set(ds.schema.names)
            uniform = all(
                f.name in names and ds.schema.field(f.name) == f
                for f in declared
            )
        except Exception:
            uniform = False
        if uniform:
            yield from ds.to_batches(columns=list(declared.names))
        else:
            for f in files:
                yield from _aligned_batches(f, self.read_schema)


class SnapshotCDFBatchReader(DataSourceReader):
    """BATCH change-feed read — Delta's primary CDF idiom::

        spark.read.format("naru_snapshot")
             .option("readChangeFeed", "true")
             .option("startingVersion", 1)        # REQUIRED (or
             .option("startingTimestamp", ...)    #  startingTimestamp)
             .option("endingVersion", 5)          # optional; default =
             .load(path)                          #  latest version

    Serves exactly the rows ``read_snapshot_changes(row_level=True)``
    would for the version range, via the same per-commit planning as
    the streaming CDF source (``_cdf_commit_partitions`` — cheapest
    exact source per commit, RAISE on un-feedable rewrites)."""

    def __init__(self, options, schema: StructType):
        _refuse_tag(options, "change-feed read")
        self.path = _table_path(options)
        from naru_spark.sources.sinks import _latest_version

        sv_opt = options.get("startingversion")
        st_opt = options.get("startingtimestamp")
        if sv_opt and st_opt:
            raise ValueError(
                "naru_snapshot: startingVersion and startingTimestamp "
                "are mutually exclusive"
            )
        if not sv_opt and not st_opt:
            raise ValueError(
                "naru_snapshot batch CDF read needs option("
                "'startingVersion', N) or option('startingTimestamp', "
                "ts) — without a range the change feed is unbounded"
            )
        if st_opt:
            t = float(st_opt)
            versions = sorted(
                int(f[1:-5]) for f in os.listdir(_man_dir(self.path))
                if f.startswith("v") and f.endswith(".json")
            )
            first = next(
                (v for v in versions
                 if _load_manifest(self.path, v).get("ts", 0.0) >= t),
                None,
            )
            if first is None:
                raise ValueError(
                    f"naru_snapshot: startingTimestamp {t} is after the "
                    f"last commit of {self.path} — no changes to read"
                )
            self.sv = first - 1
        else:
            self.sv = int(sv_opt) - 1  # inclusive, Delta semantics
        ev_opt = options.get("endingversion")
        et_opt = options.get("endingtimestamp")
        if ev_opt and et_opt:
            raise ValueError(
                "naru_snapshot: endingVersion and endingTimestamp are "
                "mutually exclusive"
            )
        if et_opt:
            self.ev = _version_at_ts(self.path, float(et_opt))
        elif ev_opt:
            self.ev = int(ev_opt)
        else:
            self.ev = _latest_version(_man_dir(self.path))
        if self.ev <= self.sv:
            raise ValueError(
                f"naru_snapshot: empty CDF range — endingVersion "
                f"{self.ev} precedes startingVersion {self.sv + 1}"
            )
        self.read_schema = schema

    def partitions(self):
        parts = _cdf_commit_partitions(self.path, self.sv, self.ev)
        return parts or [_CDFPartition("", None, self.ev, None)]

    def read(self, partition):
        if partition.file:
            yield from _cdf_read_batches(partition, self.read_schema)


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        _refuse_tag(options, "stream")
        self.path = _table_path(options)
        st = options.get("startingtimestamp")
        if st and options.get("startingversion"):
            raise ValueError(
                "naru_snapshot: startingVersion and startingTimestamp "
                "are mutually exclusive"
            )
        if st:
            # Delta semantics, INCLUSIVE: serve from the first version
            # committed at or after the timestamp (a time before the
            # first commit means "from the beginning"; a time after the
            # last commit serves only future commits)
            from naru_spark.sources.sinks import _latest_version

            t = float(st)
            versions = sorted(
                int(f[1:-5]) for f in os.listdir(_man_dir(self.path))
                if f.startswith("v") and f.endswith(".json")
            )
            first = next(
                (v for v in versions
                 if _load_manifest(self.path, v).get("ts", 0.0) >= t),
                None,
            )
            self.start_version = (
                first - 1 if first is not None
                else _latest_version(_man_dir(self.path))
            )
        else:
            # Delta semantics, INCLUSIVE: startingVersion=N serves
            # version N's changes (the offset is the version BEFORE it)
            sv = options.get("startingversion")
            self.start_version = int(sv) - 1 if sv else 0
        self.cdf = (
            str(options.get("readChangeFeed", "false")).lower() == "true"
        )
        self.read_schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from naru_spark.sources.sinks import _latest_version

        return {"version": _latest_version(_man_dir(self.path))}

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["version"]), int(end["version"])
        if sv == ev:
            return []
        if self.cdf:
            # row-level CHANGE FEED stream (Delta readChangeFeed): each
            # commit serves typed change rows from its cheapest exact
            # source; metadata-only ranges plan a sentinel no-op
            parts = _cdf_commit_partitions(self.path, sv, ev)
            return parts or [_CDFPartition("", None, ev, None)]
        from naru_spark.sources.sinks import _entry_files

        base = set(_load_manifest(self.path, sv)["dirs"]) if sv else set()
        head_man = _load_manifest(self.path, ev)
        _refuse_pending(head_man, self.path)
        head = head_man["dirs"]
        if not base <= set(head):
            raise ValueError(
                f"naru_snapshot stream: versions {sv}..{ev} of "
                f"{self.path} include a replace commit — a file stream "
                "would re-serve superseded data; consume row-level "
                "changes (option('readChangeFeed', 'true')) instead"
            )
        parts = [
            _FilePartition(f)
            for e in head if e not in base
            for f in _entry_files(e)
        ]
        # metadata-only range (constraints, txn replays): one sentinel
        # empty partition — a planned batch may not be partition-less
        return parts or [_FilePartition("")]

    def read(self, partition):
        if not partition.file:
            return
        if isinstance(partition, _CDFPartition):
            yield from _cdf_read_batches(partition, self.read_schema)
        else:
            yield from _aligned_batches(partition.file, self.read_schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; manifests are immutable


def _split_spec_list(pb: str) -> list[str]:
    """Split a ``partitionBy`` option string on TOP-LEVEL commas only —
    ``"days(ts),bucket(8,k)"`` is two spec elements, the comma inside
    ``bucket(8,k)`` is part of the transform."""
    out, cur, depth = [], [], 0
    for ch in pb:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            if "".join(cur).strip():
                out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


class _WroteFiles(WriterCommitMessage):
    def __init__(self, files: list):
        # [(file_path, partition_value_strings | None), ...]
        self.files = files


class _StagedWriterMixin:
    """Shared executor-side write: each task streams its RecordBatches
    into parquet files under a per-query staging dir inside the table's
    data tree (uncommitted stages are unreferenced-by-manifest debris
    that ``gc_orphans`` reclaims, exactly like a crashed writer's) —
    ONE file per task, or one per partition combo under
    ``option("partitionBy", "c1,c2")`` (identity columns; the task fans
    its batches out arrow-side). The driver-side commit moves the
    batch's files into a final commit dir (``__part_<col>=<val>`` leaf
    subdirs when partitioned) and publishes via ``commit_staged_dir`` —
    the same blind-append protocol (txn replay, CHECK probe, partition
    stamps, rebase on a lost race) every other appender uses, so a
    datasource-ingested table prunes and replace_where's like any
    other."""

    _NULL_DIR = "__HIVE_DEFAULT_PARTITION__"

    def _init_stage(self, options) -> None:
        import uuid

        _refuse_tag(options, "write")
        self.path = _table_path(options)
        self.txn_app = options.get("txnappid")
        pb = options.get("partitionby")
        raw = _split_spec_list(pb) if pb else None
        self.part_specs = None
        self.pcol_names = None
        if raw:
            from naru_spark.sources.sinks import _parse_partition_spec

            self.part_specs = _parse_partition_spec(raw)
            # physical leaf-dir names mirror write_snapshot's sanitized
            # spelling so commit_staged_dir maps them back positionally
            self.pcol_names = [
                "__part_" + (
                    sp["col"] if sp["t"] == "identity"
                    else sp["spec"].replace("(", "_").replace(")", "")
                    .replace(",", "_")
                )
                for sp in self.part_specs
            ]
        self.stage = os.path.join(
            self.path, "data", f"stage-{uuid.uuid4().hex[:8]}"
        )

    def _transformed_column(self, batch, sp):
        """ONE spec element's per-row partition values as
        ``(codes, uniques)``: int64 codes (0 = NULL) plus the value each
        code stands for (``uniques[0] is None``). Transforms are
        bit-identical to the JVM write expressions (``days`` = UTC
        epoch-day floor; ``bucket`` = pmod(xxhash64, n), numpy-
        vectorized for int keys via the XXH64 twin; ``truncate`` = int
        floor / string prefix) and VECTORIZED — no per-row Python on
        the int paths, one C-level factorize on the object paths."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from naru_spark.sources.sinks import _arrow_dtype_str
        from naru_spark.sources.xxh64 import buckets_np, hash_bytes

        if sp["col"] not in batch.schema.names:
            raise ValueError(
                f"partition spec {sp['spec']!r} names column "
                f"{sp['col']!r} absent from the written batch"
            )
        arr = batch.column(sp["col"])
        t = sp["t"]
        dtype = _arrow_dtype_str(arr.type)
        n = len(arr)
        valid = np.asarray(arr.is_valid())

        def from_ints(ints: "np.ndarray"):
            u, inv = (np.unique(ints[valid], return_inverse=True)
                      if valid.any() else (np.array([], dtype=np.int64),
                                           np.array([], dtype=np.int64)))
            codes = np.zeros(n, dtype=np.int64)
            codes[valid] = inv + 1
            return codes, [None] + [int(x) for x in u]

        def from_objects(vals: list):
            pdc, uniq = pd.factorize(
                pd.Series(vals, dtype=object), use_na_sentinel=True
            )
            return pdc.astype(np.int64) + 1, [None] + list(uniq)

        if t == "identity":
            return from_objects(arr.to_pylist())
        if t == "days":
            if dtype == "date":
                days = np.asarray(
                    arr.cast(pa.int32()).fill_null(0)
                ).astype(np.int64)
            elif dtype == "timestamp":
                # arrow epoch value IS UTC for tz-aware, and the wall
                # time read as UTC for naive — both match the enforced
                # UTC-session JVM write expression; floor division
                # handles pre-epoch timestamps like the date cast does
                unit = arr.type.unit
                per_day = {"s": 86_400, "ms": 86_400_000,
                           "us": 86_400_000_000,
                           "ns": 86_400_000_000_000}[unit]
                epoch_v = np.asarray(
                    arr.cast(pa.int64()).fill_null(0)
                )
                days = epoch_v // per_day
            else:
                raise ValueError(
                    f"days({sp['col']}) needs a timestamp/date column, "
                    f"got {arr.type}"
                )
            return from_ints(days)
        if t == "bucket":
            if dtype in ("tinyint", "smallint", "int", "bigint"):
                ints = np.asarray(
                    arr.cast(pa.int64()).fill_null(0)
                ).astype(np.int64)
                return from_ints(buckets_np(ints, dtype, sp["param"]))
            if dtype == "string":
                bs = [
                    None if v is None
                    else hash_bytes(v.encode("utf-8")) % sp["param"]
                    for v in arr.to_pylist()
                ]
                return from_objects(bs)
            raise ValueError(
                f"bucket(n, {sp['col']}) needs an int or string "
                f"column, got {arr.type}"
            )
        # truncate
        w = sp["param"]
        if dtype in ("tinyint", "smallint", "int", "bigint"):
            ints = np.asarray(
                arr.cast(pa.int64()).fill_null(0)
            ).astype(np.int64)
            return from_ints(ints - (ints % w))
        if dtype == "string":
            return from_objects([
                None if v is None else v[:w] for v in arr.to_pylist()
            ])
        raise ValueError(
            f"truncate(w, {sp['col']}) needs an int or string column, "
            f"got {arr.type}"
        )

    def _part_codes(self, batch):
        """Per-row PARTITION COMBO codes for the fanout: ``(codes,
        combos)`` where ``codes[i]`` indexes ``combos`` and each combo
        is the tuple of per-spec partition values (None = NULL). Fully
        vectorized: per-column codes from ``_transformed_column``, then
        one ``np.unique(axis=0)`` over the stacked code matrix — no
        per-row Python tuples."""
        import numpy as np

        col_codes, col_uniques = [], []
        for sp in self.part_specs:
            c, u = self._transformed_column(batch, sp)
            col_codes.append(c)
            col_uniques.append(u)
        mat = np.stack(col_codes, axis=1)
        uniq, inv = np.unique(mat, axis=0, return_inverse=True)
        combos = [
            tuple(col_uniques[j][row[j]] for j in range(len(col_uniques)))
            for row in uniq
        ]
        return inv.reshape(-1), combos

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.stage, exist_ok=True)
        writers: dict = {}  # combo (or None) -> (ParquetWriter, fp)

        def sink_for(combo, schema):
            if combo not in writers:
                fp = os.path.join(
                    self.stage, f"part-{uuid.uuid4().hex}.parquet"
                )
                writers[combo] = (pq.ParquetWriter(fp, schema), fp)
            return writers[combo][0]

        for batch in iterator:
            if not self.part_specs:
                sink_for(None, batch.schema).write_batch(batch)
                continue
            # partition fanout, fully vectorized: per-row combo codes
            # (one np.unique over the stacked per-spec code matrix),
            # then one numpy equality mask per combo — never a per-row
            # Python comparison loop
            codes, combos = self._part_codes(batch)
            for cid, combo in enumerate(combos):
                mask = pa.array(codes == cid)
                sink_for(combo, batch.schema).write_batch(
                    batch.filter(mask)
                )
        out = []
        for combo, (w, fp) in writers.items():
            w.close()
            vals = (
                None if combo is None
                else [None if v is None else str(v) for v in combo]
            )
            out.append((fp, vals))
        return _WroteFiles(out)

    @staticmethod
    def _message_dirs(messages) -> set:
        return {
            os.path.dirname(fp)
            for m in messages if m is not None
            for fp, _ in m.files
        }

    def _commit_files(self, messages, txn_id: str | None,
                      op_meta: dict) -> None:
        import shutil
        import uuid
        from urllib.parse import quote

        from naru_spark.sources.sinks import commit_staged_dir

        final = os.path.join(
            self.path, "data", f"w-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(final, exist_ok=True)
        for m in messages:
            for fp, vals in (m.files if m is not None else []):
                dest = final
                if vals is not None:
                    for pc, v in zip(self.pcol_names, vals):
                        seg = (
                            self._NULL_DIR if v is None
                            else quote(v, safe="")
                        )
                        dest = os.path.join(dest, f"{pc}={seg}")
                os.makedirs(dest, exist_ok=True)
                os.replace(fp, os.path.join(dest, os.path.basename(fp)))
        try:
            commit_staged_dir(
                self.path, final, txn_id=txn_id, op_meta=op_meta,
                partition_by=(
                    [sp["spec"] for sp in self.part_specs]
                    if self.part_specs else None
                ),
            )
        finally:
            # clean the EXECUTORS' stage dirs, identified from the
            # commit messages themselves: the commit/abort runner
            # constructs a FRESH writer instance, so self.stage is NOT
            # the dir the pickled task instances wrote into (its own
            # rmtree below is a harmless no-op on an empty path)
            for d in self._message_dirs(messages):
                shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(self.stage, ignore_errors=True)

    def abort(self, messages=None, *args) -> None:
        import shutil

        if messages:
            for d in self._message_dirs(messages):
                shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(self.stage, ignore_errors=True)


class SnapshotWriter(_StagedWriterMixin, DataSourceArrowWriter):
    """``df.write.format("naru_snapshot").mode("append").save(path)`` —
    append-only by design: a replace is a semantic table rewrite that
    belongs to the explicit ``write_snapshot(mode="replace")`` /
    ``replace_where`` APIs, not a save-mode default."""

    def __init__(self, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                'naru_snapshot writes are append-only; use mode("append")'
                " — replaces go through write_snapshot/replace_where"
            )
        self._init_stage(options)

    def commit(self, messages) -> None:
        self._commit_files(
            messages,
            txn_id=None,
            op_meta={"name": "append", "writer": "datasource"},
        )


class SnapshotStreamWriter(_StagedWriterMixin, DataSourceStreamArrowWriter):
    """``writeStream.format("naru_snapshot")`` — snapshot tables as a
    Structured Streaming SINK: each micro-batch commits as one snapshot
    version. Pass ``option("txnAppId", <unique-per-query>)`` for
    exactly-once-by-content semantics (commits keyed
    ``<txnAppId>:<batchId>``, so Structured Streaming's at-least-once
    batch replay de-duplicates like the foreachBatch ingest idiom) —
    OPT-IN like Delta's, because a shared default id would make two
    different queries writing one table drop each other's batches as
    replays."""

    def __init__(self, options):
        self._init_stage(options)

    def commit(self, messages, batchId: int) -> None:
        # txn idempotence is OPT-IN (Delta's txnAppId model): a shared
        # default app id would make two different queries writing one
        # table silently drop each other's batches as replays. Without
        # the option, batches commit un-keyed — the checkpoint still
        # prevents re-processing; only the crash-between-write-and-
        # checkpoint-commit window can then double-append.
        self._commit_files(
            messages,
            txn_id=(
                f"{self.txn_app}:{batchId}" if self.txn_app else None
            ),
            op_meta={"name": "append", "writer": "datasource_stream",
                     "batch_id": int(batchId)},
        )


class SnapshotDataSource(DataSource):
    """``naru_snapshot`` — manifest-protocol snapshot tables as a native
    Spark format (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "naru_snapshot"

    def schema(self) -> StructType:
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StringType,
            StructField,
        )

        path = _table_path(self.options)
        base = _arrow_spark_schema(
            _load_manifest(path, _resolve_version(self.options))
        )
        cols_opt = self.options.get("columns")
        if cols_opt:
            # MANUAL projection: the Python DataSource API has no
            # column-pruning hook (pushFilters only), so every declared
            # column crosses the arrow IPC boundary — option("columns",
            # "a,b") narrows the declared schema so only the named
            # columns are read and shipped (order as listed)
            want = [c.strip() for c in cols_opt.split(",") if c.strip()]
            have = {f.name: f for f in base.fields}
            missing = [c for c in want if c not in have]
            if missing:
                raise ValueError(
                    f"naru_snapshot: option('columns') names unknown "
                    f"column(s) {missing} — table has {sorted(have)}"
                )
            base = StructType([have[c] for c in want])
        if str(self.options.get("readChangeFeed", "false")).lower() == "true":
            return StructType(
                list(base.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", IntegerType()),
                    StructField("_commit_timestamp", DoubleType()),
                ]
            )
        return base

    def reader(self, schema: StructType) -> DataSourceReader:
        if str(self.options.get("readChangeFeed", "false")).lower() == "true":
            return SnapshotCDFBatchReader(self.options, schema)
        return SnapshotBatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> SnapshotWriter:
        return SnapshotWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return SnapshotStreamWriter(self.options)


def register_snapshot_source(spark) -> None:
    """Idempotent registration: ``spark.read.format("naru_snapshot")``
    becomes available for the session.

    SIDE EFFECT (session-wide, documented): sets
    ``spark.sql.python.filterPushdown.enabled=true`` when the conf is
    UNSET — without it Spark refuses a reader that implements
    ``pushFilters``, and the manifest-level skipping is the point of
    this source. The conf applies to every Python DataSource in the
    session, so a caller who has EXPLICITLY set it false keeps their
    setting (this source's reads will then fail with Spark's own
    pushFilters error, pointing back here) rather than having it
    silently flipped."""
    key = "spark.sql.python.filterPushdown.enabled"
    try:
        # RuntimeConfig.contains consults the EXPLICIT settings map only
        # (Spark defaults don't count), which is exactly the distinction
        # we need; absent (or non-classic session) -> treat as unset
        explicit = bool(spark._jsparkSession.conf().contains(key))
    except Exception:
        explicit = False
    if not explicit:
        spark.conf.set(key, "true")
    spark.dataSource.register(SnapshotDataSource)
