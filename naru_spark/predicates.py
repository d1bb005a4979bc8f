"""Conjunctive predicate model: the reference's entire query surface.

Reference (/root/reference):
- ``estimators.py:20-26``: OPS = {'>', '<', '>=', '<=', '='} as numpy ufuncs.
- ``estimators.py:41-53``: ``Query(columns, operators, vals)`` — conjunction
  of single-column predicates; no OR / LIKE / IN / cross-column theta.
- ``estimators.py:93-111`` (``QueryToPredicate``): (cols, ops, vals) -> SQL
  WHERE string.
- ``estimators.py:114-131`` (``FillInUnqueriedColumns``): pad the predicate
  list to full table column order with None wildcards.

NULL semantics: a NULL never satisfies any predicate (``common.py:11-24``) —
Spark SQL's three-valued logic gives this for free on the filter path; the
domain-mask path gets it from ``ColumnDictionary.valid_bins_mask``.
"""

from __future__ import annotations

import operator
from dataclasses import dataclass, field
from datetime import date, datetime
from functools import reduce

import numpy as np
from pyspark.sql import Column as SparkCol, functions as F

NUMPY_OPS = {
    ">": operator.gt,
    "<": operator.lt,
    ">=": operator.ge,
    "<=": operator.le,
    "=": operator.eq,
}

_SQL_OPS = {">": ">", "<": "<", ">=": ">=", "<=": "<=", "=": "="}


@dataclass
class Query:
    """One conjunctive range/equality query over a single table."""

    table: str
    cols: list[str]
    ops: list[str]
    vals: list = field(default_factory=list)

    def __post_init__(self):
        assert len(self.cols) == len(self.ops) == len(self.vals)
        for op in self.ops:
            assert op in NUMPY_OPS, op

    def fill_in_unqueried(self, all_columns: list[str]) -> tuple[list[str], list, list]:
        """Reference ``FillInUnqueriedColumns`` (estimators.py:114-131):
        return (ops, vals) aligned to ``all_columns`` with None wildcards."""
        ops = [None] * len(all_columns)
        vals = [None] * len(all_columns)
        for c, o, v in zip(self.cols, self.ops, self.vals):
            i = all_columns.index(c)
            ops[i], vals[i] = o, v
        return all_columns, ops, vals


def spark_predicate(q: Query) -> SparkCol:
    """AND-fold into one Spark Column; Catalyst pushes each conjunct to the
    scan (reference ``Oracle`` mask fold, estimators.py:505-536)."""
    parts = []
    for c, op, v in zip(q.cols, q.ops, q.vals):
        col = F.col(c)
        if op == "=":
            parts.append(col == F.lit(v))
        elif op == ">":
            parts.append(col > F.lit(v))
        elif op == "<":
            parts.append(col < F.lit(v))
        elif op == ">=":
            parts.append(col >= F.lit(v))
        elif op == "<=":
            parts.append(col <= F.lit(v))
    return reduce(operator.and_, parts)


def sql_literal(v) -> str:
    """Render a Python value as an ANSI SQL literal (DuckDB + Spark SQL)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (np.datetime64,)):
        ts = np.datetime_as_string(v, unit="us").replace("T", " ")
        return f"TIMESTAMP '{ts}'"
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, date):
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def sql_predicate(q: Query) -> str:
    """(cols, ops, vals) -> WHERE-clause string (reference
    ``QueryToPredicate``, estimators.py:93-111), ANSI so DuckDB and Spark SQL
    both accept it."""
    parts = [f"{c} {_SQL_OPS[op]} {sql_literal(v)}" for c, op, v in zip(q.cols, q.ops, q.vals)]
    return " AND ".join(parts)
