"""Seeded random workload generator + golden-card utilities.

Reference (/root/reference/eval_model.py):
- ``GenerateQuery``        (209-217): num_filters = rng.randint(5, 12).
- ``SampleTupleThenRandom`` (175-206): sample ONE real row uniformly; choose
  num_filters distinct columns; ops ~ {'<=', '>=', '='} but forced '=' when
  the column's domain size < 10 ("sensible_to_do_range",
  eval_model.py:194-195); values = the sampled row's values (guarantees
  true card >= 1 when the row has no NULLs in the chosen columns).
- RNG discipline: ``np.random.RandomState(seed)``, seed 1234 default
  (eval_model.py:278, 593). We preserve the exact draw ORDER (row, columns,
  ops) so a workload is reproducible from (table, sf, seed, n).

The row sample is read via pyarrow (engine-independent), so Spark queries and
the DuckDB oracle see byte-identical predicate values. At 100 TB you would
draw the row sample with ``df.sample()`` first; a driver-side full read is
faithful to the reference (``table.data.iloc[...]``) and fine at test SFs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from naru_spark.meta import TableMeta
from naru_spark.predicates import Query

RANGE_OPS = ["<=", ">=", "="]
MIN_DOMAIN_FOR_RANGE = 10  # eval_model.py:194-195


def load_table_pandas(sf_dir: str, name: str, columns: list[str] | None = None) -> pd.DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    t = pq.read_table(path, columns=columns)
    return t.to_pandas()


def _normalize_value(v):
    """numpy/pandas scalar -> plain python for Spark lit() / SQL literal."""
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def generate_query(
    pdf: pd.DataFrame, meta: TableMeta, rng: np.random.RandomState, table_name: str
) -> Query:
    """One query, reference draw order (eval_model.py:175-217)."""
    all_cols = meta.column_names
    num_filters = int(rng.randint(5, 12))
    num_filters = min(num_filters, len(all_cols))

    row = pdf.iloc[int(rng.randint(0, len(pdf)))]
    idxs = rng.choice(len(all_cols), replace=False, size=num_filters)
    cols = [all_cols[i] for i in idxs]
    ops = rng.choice(RANGE_OPS, size=num_filters)
    sensible = np.array([meta.column(c).distribution_size >= MIN_DOMAIN_FOR_RANGE for c in cols])
    ops = list(np.where(sensible, ops, "="))
    vals = [_normalize_value(row[c]) for c in cols]

    # NULL values in the sampled row would make a never-true predicate
    # (common.py:11-24); the reference keeps them and the eval loop skips
    # true-card-0 queries (eval_model.py:238-239). We keep them too.
    return Query(table=table_name, cols=cols, ops=[str(o) for o in ops], vals=vals)


def generate_workload(
    sf_dir: str,
    meta: TableMeta,
    table_name: str,
    num_queries: int,
    seed: int = 1234,
    columns: list[str] | None = None,
) -> list[Query]:
    pdf = load_table_pandas(sf_dir, table_name, columns or meta.column_names)
    rng = np.random.RandomState(seed)
    return [generate_query(pdf, meta, rng, table_name) for _ in range(num_queries)]


def generate_workload_from_pdf(
    pdf: pd.DataFrame,
    meta: TableMeta,
    table_name: str,
    num_queries: int,
    seed: int = 1234,
) -> list[Query]:
    """Same generator over a PREPARED frame — used for the multi-table
    surface, where 'the table' is a join materialized engine-independently
    (pandas merge) so Spark and DuckDB see identical predicate values."""
    rng = np.random.RandomState(seed)
    return [generate_query(pdf, meta, rng, table_name) for _ in range(num_queries)]


def pdf_table_meta(pdf: pd.DataFrame, name: str) -> TableMeta:
    """TableMeta from a pandas frame (domain sizes for the
    sensible_to_do_range rule) — no Spark needed at workload-generation
    time; mirrors the per-column accounting of DictionaryEncoder."""
    from naru_spark.meta import ColumnMeta

    cols = []
    for c in pdf.columns:
        n = int(pdf[c].nunique(dropna=True)) + int(pdf[c].isnull().any())
        cols.append(ColumnMeta(c, str(pdf[c].dtype), n, bool(pdf[c].isnull().any())))
    return TableMeta(name, cols, len(pdf))


# ------------------------------------------------------- disjunctive surface
# Beyond the reference's conjunctive-only generator: IN value sets and ORs
# of conjunctions (predicates.DisjunctiveQuery). Opt-in via its own entry
# point — the reference workloads above stay draw-for-draw identical.
IN_PROB = 0.5  # chance an '=' on a small-domain column widens to IN
IN_EXTRA_MAX = 3  # extra sampled rows contributing IN values (2-4 total)


def generate_disjunctive_query(
    pdf: pd.DataFrame,
    meta: TableMeta,
    rng: np.random.RandomState,
    table_name: str,
    max_branches: int = 3,
):
    """One OR-of-conjunctions query: 2..max_branches branches, each drawn
    with the reference's sample-a-row discipline but fewer filters (2-4),
    and '=' predicates on small-domain columns widened to IN sets with
    probability IN_PROB (values from additional sampled rows, so sets hit
    real data). Deterministic given (pdf, seed): draw order is branch count,
    then per branch (row, columns, ops, IN widenings)."""
    from naru_spark.predicates import DisjunctiveQuery

    all_cols = meta.column_names
    n_branches = int(rng.randint(2, max_branches + 1))
    branches = []
    for _ in range(n_branches):
        num_filters = min(int(rng.randint(2, 5)), len(all_cols))
        row = pdf.iloc[int(rng.randint(0, len(pdf)))]
        idxs = rng.choice(len(all_cols), replace=False, size=num_filters)
        cols = [all_cols[i] for i in idxs]
        ops = rng.choice(RANGE_OPS, size=num_filters)
        sensible = np.array(
            [meta.column(c).distribution_size >= MIN_DOMAIN_FOR_RANGE for c in cols]
        )
        ops = [str(o) for o in np.where(sensible, ops, "=")]
        vals = [_normalize_value(row[c]) for c in cols]
        for k, (c, op) in enumerate(zip(cols, ops)):
            if op == "=" and rng.rand() < IN_PROB:
                extra = int(rng.randint(1, IN_EXTRA_MAX + 1))
                pool = {repr(vals[k]): vals[k]}
                for _ in range(extra):
                    v = _normalize_value(pdf.iloc[int(rng.randint(0, len(pdf)))][c])
                    if v is not None:
                        pool[repr(v)] = v
                # sorted by repr: engine-independent, mixed-type safe
                ops[k] = "in"
                vals[k] = [pool[r] for r in sorted(pool)]
        branches.append(Query(table=table_name, cols=cols, ops=ops, vals=vals))
    return DisjunctiveQuery(table=table_name, branches=branches)


def generate_disjunctive_workload(
    sf_dir: str,
    meta: TableMeta,
    table_name: str,
    num_queries: int,
    seed: int = 1234,
    columns: list[str] | None = None,
    max_branches: int = 3,
) -> list:
    pdf = load_table_pandas(sf_dir, table_name, columns or meta.column_names)
    rng = np.random.RandomState(seed)
    return [
        generate_disjunctive_query(pdf, meta, rng, table_name, max_branches)
        for _ in range(num_queries)
    ]
