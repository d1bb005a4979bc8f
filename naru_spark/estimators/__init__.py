from naru_spark.estimators.base import CardEst, q_error
from naru_spark.estimators.exact import (
    Oracle,
    Heuristic,
    Sampling,
    QueryRegionSize,
    Const,
)

__all__ = [
    "CardEst",
    "q_error",
    "Oracle",
    "Heuristic",
    "Sampling",
    "QueryRegionSize",
    "Const",
]
