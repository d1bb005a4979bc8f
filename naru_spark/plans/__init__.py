from naru_spark.plans.advisor import CardinalityAdvisor, extract_query

__all__ = ["CardinalityAdvisor", "extract_query"]
