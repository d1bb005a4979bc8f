from naru_spark.sources.dmv import DMV_COLUMNS, load_dmv, load_oracle_cards
from naru_spark.sources.registry import TABLE_NAMES, load_table, load_all

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_all",
    "DMV_COLUMNS",
    "load_dmv",
    "load_oracle_cards",
]
