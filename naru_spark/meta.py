"""Table/column metadata.

Spark analog of the reference's data abstractions (``common.py:27-145`` in
/root/reference): a ``Table`` there is an ordered list of ``Column``s plus a
validated cardinality; here the data lives in a DataFrame and the *metadata*
(column order, per-column domain sizes, cardinality) lives in ``TableMeta``.
Domain content itself lives in ``naru_spark.encoding.ColumnDictionary``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from naru_spark.encoding import ColumnDictionary


@dataclass
class ColumnMeta:
    """One named attribute (reference ``common.py:27-98``)."""

    name: str
    spark_type: str
    distribution_size: int  # |distinct values| incl. the NULL bin if present
    has_null: bool

    def __repr__(self) -> str:  # matches the spirit of common.py:96-98
        return f"ColumnMeta({self.name}, |domain|={self.distribution_size})"


@dataclass
class TableMeta:
    """Ordered columns + cardinality (reference ``common.py:101-145``)."""

    name: str
    columns: list[ColumnMeta]
    cardinality: int
    dictionaries: dict[str, "ColumnDictionary"] = field(default_factory=dict)

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def column(self, name: str) -> ColumnMeta:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def column_index(self, name: str) -> int:
        return self.column_names.index(name)
