"""Row-level MERGE INTO — the Delta/Iceberg CDC apply, expressed as ONE
keyed full-outer join over plain DataFrames (no table format required).

A changeset row carries an ``op``: 'U' (upsert — update if the key exists,
insert if not) or 'D' (delete). Semantics match ``MERGE INTO base USING
changes ON key WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED THEN
UPDATE SET * / WHEN NOT MATCHED AND op<>'D' THEN INSERT *``.

Scale shape: one shuffle on the merge key for each side (the minimum any
keyed merge pays); at 100 TB the base side is typically bucketed/
partitioned on the key so only the changed partitions rewrite — compose
with ``sources.sinks.overwrite_partitions`` for the physical apply. The
changeset is usually small; Catalyst broadcast-plans it under the
threshold automatically, and the full-outer degrades gracefully to
sort-merge when it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_into(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    validate: bool = True,
    not_matched_by_source: str | None = None,
) -> DataFrame:
    """Apply the changeset to ``base``; returns the merged table with the
    base schema. Exactly one changeset row per key is required (the SQL
    MERGE precondition); ``validate=True`` (default) enforces it with one
    cheap aggregate over the changeset — a duplicate key raises like SQL
    MERGE's "multiple source rows matched" error instead of silently
    fanning base rows out through the join. Pass ``validate=False`` only
    when the changeset is already deduped-by-latest upstream.

    ``not_matched_by_source="delete"`` (Delta's ``WHEN NOT MATCHED BY
    SOURCE THEN DELETE``, the third MERGE clause): base rows whose key
    the changeset does NOT carry are DROPPED — the CDC full-sync shape
    (make target equal source). Default None keeps them (classic
    upsert)."""
    if validate:
        dup = (
            changes.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"changeset has {dup[0]['count']} rows for key "
                f"{dup[0][key]!r} — SQL MERGE requires one changeset row "
                "per key; dedup-by-latest upstream or pass validate=False"
            )
    assert not_matched_by_source in (None, "delete"), not_matched_by_source
    cols = [c for c in base.columns if c != key]
    b = base.alias("b")
    c = changes.alias("c")
    j = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = (
        # matched delete drops the row; unmatched delete is a no-op row to drop
        ~(F.col(f"c.{op_col}") == "D").eqNullSafe(F.lit(True))
    )
    if not_matched_by_source == "delete":
        # base-only rows (no changeset key) drop: target syncs to source
        keep = keep & F.col(f"c.{key}").isNotNull()
    out_key = F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    out_cols = [
        # matched update / unmatched insert take the changeset's value;
        # rows without a change keep the base value
        F.when(F.col(f"c.{key}").isNotNull(), F.col(f"c.{col}"))
        .otherwise(F.col(f"b.{col}"))
        .alias(col)
        for col in cols
    ]
    return j.filter(keep).select(out_key, *out_cols)
