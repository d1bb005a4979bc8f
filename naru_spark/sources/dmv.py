"""DMV dataset shim — accepts the reference's real dataset files when
present.

The reference's headline benchmark runs on the NY DMV registrations CSV
(``LoadDmv``, reference datasets.py:9-20: 11 named columns out of the
file's 20, one datetime cast) and reuses a precomputed golden-card file
for the 2000-query workload (``LoadOracleCardinalities``, reference
eval_model.py:467-476). The driver testdata has no DMV table — the repo's
gate regenerates goldens via DuckDB on the TPC-H-ish tables instead — but
a user migrating from the reference should be able to point this engine at
the SAME files and run the SAME benchmark. These loaders accept them
verbatim.

Scale path: the CSV scan is a plain distributed ``spark.read.csv`` with an
explicit projection (Catalyst prunes the other 9 columns at the scan) and
one JVM-side ``to_timestamp``; nothing driver-side. At 100 TB the same
loader works on a directory of CSV shards unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# The reference's 11 estimator columns (datasets.py:11-15), in its order.
DMV_COLUMNS = [
    "Record Type",
    "Registration Class",
    "State",
    "County",
    "Body Type",
    "Fuel Type",
    "Reg Valid Date",
    "Color",
    "Scofflaw Indicator",
    "Suspension Indicator",
    "Revocation Indicator",
]

# The reference's default filenames (datasets.py:10, eval_model.py:468-470).
DMV_CSV_NAME = "Vehicle__Snowmobile__and_Boat_Registrations.csv"
DMV_ORACLE_CARDS_NAME = "dmv-2000queries-oracle-cards-seed1234.csv"


def load_dmv(spark: SparkSession, csv_path: str, columns: list[str] | None = None) -> DataFrame:
    """Load the DMV registrations CSV with the reference's column selection
    and type treatment: the 11 named columns projected (the file carries
    ~20), ``Reg Valid Date`` parsed MM/dd/yyyy -> TIMESTAMP (the
    reference's single np.datetime64 cast), every other column kept as its
    raw string — the reference relies on lexicographic string order being
    the desired domain order, so no trimming or re-typing."""
    if not os.path.exists(csv_path):
        raise FileNotFoundError(
            f"{csv_path}: place the reference's DMV CSV ({DMV_CSV_NAME}) "
            "here to reproduce its benchmark"
        )
    cols = columns or DMV_COLUMNS
    df = spark.read.csv(csv_path, header=True, inferSchema=False)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"DMV CSV missing expected columns: {missing}")
    df = df.select(*[F.col(f"`{c}`") for c in cols])
    if "Reg Valid Date" in cols:
        # fail-loudly parity with the reference's np.datetime64 cast
        # (datasets.py LoadDmv): to_timestamp NULLs malformed dates where
        # numpy RAISES — silently nulled rows would shift the estimator's
        # domain for the column with no signal to a migrating user. ONE
        # aggregate counts values the cast nulls on NON-null input.
        # try_to_timestamp (not to_timestamp) so the check itself cannot
        # throw a raw DateTimeException under ANSI mode — the caller gets
        # ONE well-defined ValueError either way.
        raw = F.col("`Reg Valid Date`")
        cast = F.try_to_timestamp(raw, F.lit("MM/dd/yyyy"))
        n_bad = (
            df.agg(
                F.sum((raw.isNotNull() & cast.isNull()).cast("long")).alias("n")
            ).collect()[0]["n"]
            or 0
        )
        if n_bad:
            raise ValueError(
                f"{csv_path}: {n_bad} 'Reg Valid Date' values failed the "
                "MM/dd/yyyy timestamp cast (the reference's np.datetime64 "
                "cast raises on these; refusing to silently null them)"
            )
        df = df.withColumn("Reg Valid Date", cast)
    return df


def load_oracle_cards(path: str, expected: int = 2000):
    """Reuse a precomputed golden-card file (reference
    ``LoadOracleCardinalities``, eval_model.py:467-476): one column of true
    cardinalities, strictly ``expected`` rows, returned as a flat int64
    numpy array. Feeding these to the eval driver skips the oracle
    counting pass entirely — the reference ships
    ``dmv-2000queries-oracle-cards-seed1234.csv`` for exactly this."""
    import numpy as np
    import pandas as pd

    if not os.path.exists(path):
        return None  # reference behavior: fall back to computing oracles
    df = pd.read_csv(path)
    if len(df) != expected:
        raise ValueError(
            f"{path}: golden-card file has {len(df)} rows, expected {expected} "
            "(reference eval_model.py:474 asserts the workload size matches)"
        )
    return df.values.reshape(-1).astype(np.int64)
