"""The engine's column-function library — one import surface for every
reusable Column-level expression the operators are built from. All
JVM-side (`pyspark.sql.functions` compositions, no Python UDFs) unless
explicitly noted; each is individually driver-gated through the entries
that use it.

    from naru_spark import functions as NF
    df.withColumn("cos", NF.cosine_expr("a", "b"))
"""

from naru_spark.estimators.like import char_ngrams_expr
from naru_spark.pipeline.similarity import cosine_expr
from naru_spark.pipeline.text import (
    BPE_TOKEN_RE,
    tokens_col,
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_text_stats,
    with_token_counts,
)
from naru_spark.predicates import spark_predicate, sql_predicate

__all__ = [
    "BPE_TOKEN_RE",
    "char_ngrams_expr",
    "cosine_expr",
    "spark_predicate",
    "sql_predicate",
    "tokens_col",
    "with_fingerprint",
    "with_lang_id",
    "with_quality_score",
    "with_text_stats",
    "with_token_counts",
]
