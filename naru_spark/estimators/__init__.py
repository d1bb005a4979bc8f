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
    # heavier estimators live in their own modules to keep import light:
    # naru_spark.estimators.progressive (ProgressiveSampling, SampleFromModel)
    # naru_spark.estimators.histogram   (MaxDiffHistogram)
    # naru_spark.estimators.bayes      (BayesNet)
    # naru_spark.estimators.catalyst   (CatalystCBO)
]
