from naru_spark.sources.registry import TABLE_NAMES, load_table, load_all

__all__ = ["TABLE_NAMES", "load_table", "load_all"]
