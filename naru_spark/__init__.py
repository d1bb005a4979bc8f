"""naru_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of naru-project/naru (neural cardinality
estimation), rebuilt Spark-first.

Reference semantics: /root/reference (naru-project/naru), cited per-module as
file:line. Architecture is NOT a port: data prep, exact estimators, workload
eval, and the LLM-data-pipeline extensions are Spark DataFrame jobs; the
autoregressive density model is a numpy re-implementation trained from
Spark-encoded data.
"""

from naru_spark.meta import ColumnMeta, TableMeta
from naru_spark.encoding import DictionaryEncoder, ColumnDictionary
from naru_spark.predicates import Query, spark_predicate, sql_predicate

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
