"""MaxDiff(V,A) multidimensional histogram estimator.

Reference ``estimators.py:1000-1408`` (/root/reference): greedy recursive
partitioning — repeatedly split the (partition, column) with the largest
Diff(V,A) = spread x count over adjacent distinct values (estimators.py:
1052-1068) until ``limit`` partitions; each final partition stores
per-column *uniform spreads* and a density = count / prod(distinct)
(estimators.py:1131-1170); a query sums, over partitions overlapping the
predicate box, covered_distinct x density with bisect over the spreads
(estimators.py:1342-1374).

Spark-first re-expression: the histogram is built from a bounded uniform
SAMPLE of the dictionary-encoded table (the reference builds from the full
in-memory table — equivalent at test scale; at 100 TB a sample-built
histogram is the standard practice and the encode+sample stage is fully
distributed). All columns are handled in bin space — the order-preserving
dictionary makes range predicates prefix ranges, which is exactly what the
reference does for its non-int64 columns (estimators.py:1344-1346).
The histogram itself is a small driver object; Query() runs without Spark.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field

import numpy as np

from naru_spark.estimators.base import CardEst
from naru_spark.meta import TableMeta
from naru_spark.predicates import Query


@dataclass
class _Partition:
    bounds: list[tuple[int, int, bool]]  # per-col (lo, hi, lo_inclusive) in bin space
    rows: np.ndarray  # [n, D] encoded sample rows in this partition
    spreads: list[list[float]] = field(default_factory=list)
    density: float = 0.0


class MaxDiffHistogram(CardEst):
    name = "maxdiff"

    def __init__(
        self,
        data: np.ndarray,
        meta: TableMeta,
        columns: list[str],
        limit: int = 1000,
        scale: float = 1.0,
    ):
        """data: [N, D] dictionary-encoded sample rows; scale = table
        cardinality / sample size (1.0 when built on the full table)."""
        super().__init__()
        self.meta = meta
        self.columns = columns
        self.limit = limit
        self.scale = scale
        self.name = f"maxdiff[{limit}]"
        self.D = data.shape[1]
        self._build(np.asarray(data, dtype=np.int64))

    # ------------------------------------------------------------- build
    @staticmethod
    def _maxdiff_stat(vals: np.ndarray) -> tuple[float, int | None]:
        """(max Diff(V,A), split value): spread x count of adjacent distinct
        values (reference _compute_maxdiff, estimators.py:1052-1068)."""
        uniq, counts = np.unique(vals, return_counts=True)
        if len(uniq) < 2:
            return 0.0, None
        spread = uniq[1:] - uniq[:-1]
        area = spread * counts[:-1]
        k = int(np.argmax(area))
        return float(area[k]), int(uniq[k + 1])  # split so that uniq[k+1] starts new part

    def _build(self, data: np.ndarray):
        dom_sizes = [self.meta.dictionaries[c].distribution_size for c in self.columns]
        root = _Partition(bounds=[(0, dom_sizes[i] - 1, True) for i in range(self.D)], rows=data)
        parts = [root]
        # best-split search as one numpy argmax per round instead of a
        # pure-Python O(#parts x D) scan (the scan was O(limit^2 x D)
        # overall — ~11M comparisons at limit=1000, and cProfile put over
        # half the build wall in it). np.argmax over the C-ordered
        # (pid, cid) matrix returns the FIRST occurrence of the max —
        # exactly the old scan's strict-> tie-break — so the split
        # sequence, partitions and estimates are bit-identical.
        st0 = [self._maxdiff_stat(root.rows[:, c]) for c in range(self.D)]
        diffs = np.zeros((max(self.limit, 1), self.D))
        diffs[0] = [s[0] for s in st0]
        splits = [[s[1] for s in st0]]
        while len(parts) < self.limit:
            flat = int(np.argmax(diffs[: len(parts)]))
            pid, cid = divmod(flat, self.D)
            diff, split = float(diffs[pid, cid]), splits[pid][cid]
            if diff == 0 or split is None:
                break
            old = parts[pid]
            left_mask = old.rows[:, cid] < split
            lo, hi, lo_inc = old.bounds[cid]
            left = _Partition(bounds=list(old.bounds), rows=old.rows[left_mask])
            right = _Partition(bounds=list(old.bounds), rows=old.rows[~left_mask])
            left.bounds[cid] = (lo, split - 1, lo_inc)
            right.bounds[cid] = (split, hi, True)
            parts[pid] = left
            parts.append(right)
            st_l = [self._maxdiff_stat(left.rows[:, c]) for c in range(self.D)]
            st_r = [self._maxdiff_stat(right.rows[:, c]) for c in range(self.D)]
            diffs[pid] = [s[0] for s in st_l]
            splits[pid] = [s[1] for s in st_l]
            diffs[len(parts) - 1] = [s[0] for s in st_r]
            splits.append([s[1] for s in st_r])

        # condense: uniform spreads + density (estimators.py:1131-1170)
        for p in parts:
            total = len(p.rows)
            total_distinct = 1
            for cid in range(self.D):
                uniq = np.unique(p.rows[:, cid]) if total else np.array([p.bounds[cid][0]])
                distinct = max(len(uniq), 1)
                lo, hi, _ = p.bounds[cid]
                if distinct == 1:
                    spread = [float(uniq[0])]
                else:
                    step = float(hi - lo) / (distinct - 1)
                    spread = [lo + i * step for i in range(distinct - 1)] + [float(hi)]
                p.spreads.append(spread)
                total_distinct *= distinct
            p.density = (total / total_distinct) if total_distinct else 0.0
        self.partitions = [p for p in parts]

    # ------------------------------------------------------------- query
    def _to_bin(self, col: str, op: str, v) -> tuple[str, float]:
        """Raw predicate -> bin-space predicate (reference ValToBin path).
        Values not in the dictionary are mapped conservatively via
        searchsorted so ranges stay correct."""
        d = self.meta.dictionaries[col]
        idx = int(np.searchsorted(d.values, v))
        exact = idx < len(d.values) and d.values[idx] == v
        b = idx + int(d.has_null)
        if op == "=":
            return ("=", b) if exact else ("=", -1)
        if op in ("<", "<="):
            return (op, b) if exact else ("<", b)
        # > / >=
        return (op, b) if exact else (">=", b)

    def query(self, q) -> float:
        """Disjunctions (predicates.DisjunctiveQuery) expand by
        inclusion-exclusion; each conjunctive term intersects its
        constraints PER COLUMN (IE's merged AND terms repeat columns —
        independent per-predicate products would over-count), and ``'in'``
        counts the spread values in the bin-mapped value set."""
        from naru_spark.predicates import ie_terms

        total = sum(coef * self._query_conj(t) for coef, t in ie_terms(q))
        return max(total, 0.0)

    def _query_conj(self, q: Query) -> float:
        total = 0.0
        per_col: dict[int, list[tuple[str, object]]] = {}
        for c, op, v in zip(q.cols, q.ops, q.vals):
            cid = self.columns.index(c)
            if op == "in":
                bins = set()
                for x in v:
                    bop, bv = self._to_bin(c, "=", x)
                    if bv >= 0:
                        bins.add(bv)
                per_col.setdefault(cid, []).append(("in", bins))
            else:
                per_col.setdefault(cid, []).append(self._to_bin(c, op, v))
        for p in self.partitions:
            covered = 1.0
            for cid in range(self.D):
                spread = p.spreads[cid]
                cons = per_col.get(cid)
                if cons is None:
                    covered *= len(spread)
                    continue
                covered *= self._covered_count(spread, cons)
                if covered == 0:
                    break
            if covered:
                total += covered * p.density
        return total * self.scale

    @staticmethod
    def _covered_count(spread: list, cons: list) -> int:
        """#spread values satisfying ALL constraints on one column: range
        predicates narrow one [lo, hi) window via bisect; '=' pins it to
        the value's slot (0 if absent — the original semantics); 'in' sets
        intersect and the survivors are counted inside the window."""
        lo, hi = 0, len(spread)
        insets: list[set] = []
        for op, v in cons:
            if op == "<":
                hi = min(hi, bisect.bisect_left(spread, v))
            elif op == "<=":
                hi = min(hi, bisect.bisect(spread, v))
            elif op == ">":
                lo = max(lo, bisect.bisect(spread, v))
            elif op == ">=":
                lo = max(lo, bisect.bisect_left(spread, v))
            elif op == "=":
                pos = bisect.bisect_left(spread, v)
                if pos >= len(spread) or spread[pos] != v:
                    return 0
                lo, hi = max(lo, pos), min(hi, pos + 1)
            else:  # in
                insets.append(v)
            if hi <= lo:
                return 0
        if not insets:
            return hi - lo
        members = set.intersection(*insets)
        return sum(1 for i in range(lo, hi) if spread[i] in members)

    def size_bytes(self) -> int:
        """Reference Size() accounting (estimators.py:1403-1408)."""
        total = 15 * 2 * 4
        for p in self.partitions:
            total += sum(4 * len(s) for s in p.spreads) + 4
        total += 24 * max(len(self.partitions) - 1, 0)
        return total
