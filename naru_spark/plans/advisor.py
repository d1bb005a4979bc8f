"""Optimizer-integration side API (SURVEY §4 item 3): estimate the
cardinality of a ``df.filter(...)`` plan with any of the engine's
estimators.

The reference never rewires a real optimizer — its Postgres estimator just
reads EXPLAIN output (estimators.py:648-660) — so parity needs exactly this
shape: hand the engine a filtered DataFrame, get a row-count estimate back.
``extract_query`` walks the *analyzed* Catalyst plan (via py4j), flattens the
top Filter's And-tree into the engine's conjunctive ``Query`` IR, and the
advisor routes it to a fitted estimator (neural, BN, histogram, ...).

Supported predicate shape = the reference's query surface: conjunctions of
``col op literal`` with op in {=, <, <=, >, >=} (estimators.py:20-26).
Anything else (OR, IN, LIKE, col-op-col) raises ``UnsupportedPlanError`` —
callers fall back to Catalyst's own stats.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame

from naru_spark.predicates import Query

_OP_BY_CLASS = {
    "EqualTo": "=",
    "LessThan": "<",
    "LessThanOrEqual": "<=",
    "GreaterThan": ">",
    "GreaterThanOrEqual": ">=",
}
_FLIP = {"=": "=", "<": ">", "<=": ">=", ">": "<", ">=": "<="}


class UnsupportedPlanError(ValueError):
    pass


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _children(expr):
    out = []
    it = expr.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _unwrap_cast(expr):
    while _cls(expr) == "Cast":
        expr = _children(expr)[0]
    return expr


def _literal_value(expr, data_type: str):
    """Convert a Catalyst Literal to the python value the predicate layer
    expects. Timestamp literals carry epoch micros."""
    v = expr.value()
    if v is None:
        raise UnsupportedPlanError("NULL literal in predicate")
    if data_type.startswith("timestamp"):
        if isinstance(v, int):
            return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v)
        return dt.datetime.fromisoformat(str(v))
    if isinstance(v, (int, float, bool)):
        return v
    return str(v)  # UTF8String and friends


def _flatten_and(expr):
    if _cls(expr) == "And":
        left, right = _children(expr)
        return _flatten_and(left) + _flatten_and(right)
    return [expr]


def extract_query(df: DataFrame, table: str = "t") -> Query:
    """Analyzed plan -> conjunctive Query IR. Raises UnsupportedPlanError on
    anything outside the col-op-literal conjunction surface."""
    plan = df._jdf.queryExecution().analyzed()
    conjuncts = []
    node = plan
    while True:
        name = _cls(node)
        if name == "Filter":
            conjuncts.extend(_flatten_and(node.condition()))
            node = node.children().apply(0)
        elif name in ("Project", "SubqueryAlias", "View"):
            node = node.children().apply(0)
        elif name in ("LogicalRelation", "LocalRelation", "UnresolvedRelation", "Relation"):
            break
        else:
            if node.children().size() == 1:
                node = node.children().apply(0)
                continue
            break
    if not conjuncts:
        raise UnsupportedPlanError("no Filter node in plan")

    cols, ops, vals = [], [], []
    for c in conjuncts:
        name = _cls(c)
        if name == "IsNotNull":
            continue  # implied by every comparison; carries no selectivity info
        if name not in _OP_BY_CLASS:
            raise UnsupportedPlanError(f"unsupported predicate node {name}")
        left, right = (_unwrap_cast(e) for e in _children(c))
        op = _OP_BY_CLASS[name]
        if _cls(left) == "AttributeReference" and _cls(right) == "Literal":
            attr, lit = left, right
        elif _cls(left) == "Literal" and _cls(right) == "AttributeReference":
            attr, lit = right, left
            op = _FLIP[op]
        else:
            raise UnsupportedPlanError(f"not col-op-literal: {c}")
        dtype = str(attr.dataType().simpleString())
        cols.append(str(attr.name()))
        ops.append(op)
        vals.append(_literal_value(lit, dtype))
    return Query(table, cols, ops, vals)


class CardinalityAdvisor:
    """Routes filtered-DataFrame plans to a fitted estimator.

    ``estimator`` is any CardEst (ProgressiveSampling over the fitted
    NaruModel for the paper behavior; Oracle for exact; MaxDiff/BN/... for
    baselines)."""

    def __init__(self, estimator, table: str = "t"):
        self.estimator = estimator
        self.table = table

    def estimate(self, filtered_df: DataFrame) -> float:
        q = extract_query(filtered_df, self.table)
        return float(self.estimator.query(q))
