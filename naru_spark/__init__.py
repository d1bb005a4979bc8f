"""naru_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of naru-project/naru (neural cardinality
estimation), rebuilt Spark-first.

Reference semantics: /root/reference (naru-project/naru), cited per-module as
file:line. Architecture is NOT a port: data prep, exact estimators, workload
eval, and the LLM-data-pipeline extensions are Spark DataFrame jobs; the
autoregressive density model is a numpy re-implementation trained from
Spark-encoded data.
"""

__version__ = "0.1.0"

__all__ = [
    "ColumnMeta",
    "TableMeta",
    "DictionaryEncoder",
    "ColumnDictionary",
    "Query",
    "spark_predicate",
    "sql_predicate",
]

# Lazy re-exports (PEP 562): importing the bare package must stay CHEAP.
# The eager `from naru_spark.encoding import ...` form pulled pandas +
# numpy (~450 ms) into every process that touches any submodule —
# including the one-shot Python workers Spark spawns to plan/read the
# ``naru_snapshot`` DataSource (not covered by worker reuse), which pay
# the import per spawn, several times per streaming drain. The public
# API is unchanged: attribute access resolves to the same objects.
_LAZY = {
    "ColumnMeta": "naru_spark.meta",
    "TableMeta": "naru_spark.meta",
    "DictionaryEncoder": "naru_spark.encoding",
    "ColumnDictionary": "naru_spark.encoding",
    "Query": "naru_spark.predicates",
    "spark_predicate": "naru_spark.predicates",
    "sql_predicate": "naru_spark.predicates",
}


def __getattr__(name: str):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module 'naru_spark' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)
