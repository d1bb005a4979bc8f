"""Estimator tests vs DuckDB oracle on sf0.001 (smoke) — mirrors the driver's
t2 check shape: Spark result == DuckDB result on the same parquet."""

import numpy as np
import pytest

from naru_spark.encoding import DictionaryEncoder
from naru_spark.estimators import Const, Heuristic, Oracle, QueryRegionSize, Sampling, q_error
from naru_spark.predicates import Query, sql_predicate
from naru_spark.sources import load_table
from naru_spark.sources.registry import ESTIMATOR_COLUMNS
from naru_spark.workload import generate_workload
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def lineitem(spark):
    df = load_table(spark, "lineitem", SF_SMOKE, ESTIMATOR_COLUMNS["lineitem"]).cache()
    enc = DictionaryEncoder(ESTIMATOR_COLUMNS["lineitem"]).fit(df)
    meta = enc.table_meta(df, "lineitem")
    return df, meta


@pytest.fixture(scope="module")
def workload(lineitem):
    _, meta = lineitem
    return generate_workload(SF_SMOKE, meta, "lineitem", num_queries=20, seed=1234)


def test_workload_shape(workload, lineitem):
    _, meta = lineitem
    for q in workload:
        assert 5 <= len(q.cols) <= 11
        assert len(set(q.cols)) == len(q.cols)
        for c, op in zip(q.cols, q.ops):
            if meta.column(c).distribution_size < 10:
                assert op == "="  # eval_model.py:194-195


def test_workload_deterministic(lineitem):
    _, meta = lineitem
    w1 = generate_workload(SF_SMOKE, meta, "lineitem", 5, seed=1234)
    w2 = generate_workload(SF_SMOKE, meta, "lineitem", 5, seed=1234)
    for a, b in zip(w1, w2):
        assert a.cols == b.cols and a.ops == b.ops and list(a.vals) == list(b.vals)


def test_oracle_matches_duckdb(lineitem, workload, duck_smoke):
    df, _ = lineitem
    oracle = Oracle(df)
    ests = oracle.query_batch(workload)
    for q, est in zip(workload, ests):
        truth = duck_smoke.execute(
            f"SELECT COUNT(*) FROM lineitem WHERE {sql_predicate(q)}"
        ).fetchone()[0]
        assert est == truth, q


@pytest.fixture(scope="module")
def disjunctive_workload(lineitem):
    from naru_spark.workload import generate_disjunctive_workload

    _, meta = lineitem
    return generate_disjunctive_workload(SF_SMOKE, meta, "lineitem", 10, seed=5678)


def test_disjunctive_workload_shape(disjunctive_workload):
    from naru_spark.predicates import DisjunctiveQuery

    saw_in = saw_multi = False
    for q in disjunctive_workload:
        assert isinstance(q, DisjunctiveQuery)
        assert 2 <= len(q.branches) <= 3
        saw_multi = saw_multi or len(q.branches) > 1
        for b in q.branches:
            assert 2 <= len(b.cols) <= 4
            for op, v in zip(b.ops, b.vals):
                if op == "in":
                    saw_in = True
                    assert isinstance(v, list) and len(v) >= 1
    assert saw_in and saw_multi  # the surface actually exercises IN and OR


def test_ie_terms_expansion():
    """2 branches -> 3 terms (+,+,-); 3 branches -> 7 with IE signs; a
    conjunctive query is its own single term."""
    from naru_spark.predicates import DisjunctiveQuery, ie_terms

    a = Query("t", ["x"], ["="], [1])
    b = Query("t", ["y"], [">"], [2])
    c = Query("t", ["z"], ["<"], [3])
    assert ie_terms(a) == [(1, a)]
    t2 = ie_terms(DisjunctiveQuery("t", [a, b]))
    assert [coef for coef, _ in t2] == [1, 1, -1]
    assert t2[2][1].cols == ["x", "y"]  # the AND term concatenates
    t3 = ie_terms(DisjunctiveQuery("t", [a, b, c]))
    assert [coef for coef, _ in t3] == [1, 1, 1, -1, -1, -1, 1]


def test_disjunctive_oracle_matches_duckdb(lineitem, disjunctive_workload, duck_smoke):
    """Exact path: spark_predicate's OR/IN fold == DuckDB on the same data,
    both per-query and through the one-scan batch path."""
    df, _ = lineitem
    oracle = Oracle(df)
    batch = oracle.query_batch(list(disjunctive_workload))
    for q, est in zip(disjunctive_workload, batch):
        truth = duck_smoke.execute(
            f"SELECT COUNT(*) FROM lineitem WHERE {sql_predicate(q)}"
        ).fetchone()[0]
        assert est == truth, sql_predicate(q)
        assert oracle.query(q) == truth


def test_disjunctive_ie_is_exact_for_counts(lineitem, disjunctive_workload):
    """Inclusion-exclusion ground truth: the OR count equals the signed sum
    of the conjunctive term counts — the identity every model-based
    estimator's expansion relies on."""
    from naru_spark.predicates import ie_terms

    df, _ = lineitem
    oracle = Oracle(df)
    for q in disjunctive_workload[:4]:
        terms = ie_terms(q)
        signed = sum(coef * oracle.query(t) for coef, t in terms)
        assert signed == oracle.query(q)


def test_heuristic_disjunctive_bounds(lineitem, disjunctive_workload):
    """Heuristic on a disjunction: non-negative, never above the table, and
    a single-branch disjunction degenerates to the conjunctive estimate."""
    from naru_spark.predicates import DisjunctiveQuery

    df, meta = lineitem
    h = Heuristic(df, meta)
    ests = h.query_batch(list(disjunctive_workload))
    assert all(0 <= e <= meta.cardinality for e in ests)
    b = disjunctive_workload[0].branches[0]
    single = DisjunctiveQuery("lineitem", [b])
    assert h.query(single) == h.query(b)


def test_normalize_conjunct_intersects_same_column_equalities():
    """IE merged terms with same-column '='/'in' constraints: contradictory
    equalities -> None (exact 0); overlapping 'in' sets intersect; range
    predicates and distinct columns pass through untouched."""
    from naru_spark.predicates import normalize_conjunct

    # contradictory equalities: provably empty
    q = Query("t", ["c", "c"], ["=", "="], ["A", "N"])
    assert normalize_conjunct(q) is None
    # 'in' sets intersect (first-set order kept); singleton collapses to '='
    q = Query("t", ["c", "c"], ["in", "in"], [["A", "B", "C"], ["C", "B"]])
    n = normalize_conjunct(q)
    assert (n.cols, n.ops, n.vals) == (["c"], ["in"], [["B", "C"]])
    q = Query("t", ["c", "c"], ["in", "="], [["A", "B"], "B"])
    n = normalize_conjunct(q)
    assert (n.cols, n.ops, n.vals) == (["c"], ["="], ["B"])
    # disjoint 'in' sets: empty
    assert normalize_conjunct(Query("t", ["c", "c"], ["in", "in"], [["A"], ["B"]])) is None
    # a LONE 'in []' is rejected at Query construction; normalize_conjunct
    # independently returns None if an empty set ever reaches its shortcut
    import pytest

    with pytest.raises(AssertionError):
        Query("t", ["c"], ["in"], [[]])
    # ranges and other columns untouched, order preserved
    q = Query("t", ["a", "c", "c"], [">", "=", "="], [5, "X", "X"])
    n = normalize_conjunct(q)
    assert (n.cols, n.ops, n.vals) == (["a", "c"], [">", "="], [5, "X"])


def test_heuristic_contradictory_or_branches_not_biased(lineitem):
    """OR branches sharing a column with different equality values: the
    pairwise IE term (c='A' AND c='N') is unsatisfiable, so Heuristic's
    disjunctive estimate must equal the SUM of the branch estimates — the
    raw independence product over repeated predicates would subtract a
    spurious nonzero intersection and bias the estimate downward."""
    from naru_spark.predicates import DisjunctiveQuery

    df, meta = lineitem
    h = Heuristic(df, meta)
    a = Query("lineitem", ["l_returnflag"], ["="], ["A"])
    b = Query("lineitem", ["l_returnflag"], ["="], ["N"])
    disj = DisjunctiveQuery("lineitem", [a, b])
    est_a, est_b, est_or = h.query(a), h.query(b), h.query(disj)
    assert est_a > 0 and est_b > 0
    # ceil per-query makes the sum comparison off-by-rounding at most
    assert abs(est_or - (est_a + est_b)) <= 2


def test_region_size_rejects_disjunctive_without_wildcard_counting(lineitem):
    """count_wildcards=False makes branch volumes over different column
    subsets unit-incompatible — the IE path must fail loudly, while the
    conjunctive path still works."""
    from naru_spark.predicates import DisjunctiveQuery

    _, meta = lineitem
    r = QueryRegionSize(meta, count_wildcards=False)
    conj = Query("lineitem", ["l_returnflag"], ["="], ["A"])
    assert r.query(conj) >= 0  # conjunctive: fine
    disj = DisjunctiveQuery(
        "lineitem",
        [conj, Query("lineitem", ["l_linestatus"], ["="], ["O"])],
    )
    with pytest.raises(ValueError, match="count_wildcards"):
        r.query(disj)
    # the shipped config (count_wildcards=True) keeps the exact-union path
    assert QueryRegionSize(meta).query(disj) >= 0


def test_oracle_single_equals_batch(lineitem, workload):
    df, _ = lineitem
    oracle = Oracle(df)
    batch = oracle.query_batch(workload[:5])
    singles = [oracle.query(q) for q in workload[:5]]
    assert batch == singles


def test_heuristic_matches_duckdb_formula(lineitem, workload, duck_smoke):
    df, meta = lineitem
    h = Heuristic(df, meta)
    ests = h.query_batch(workload[:8])
    for q, est in zip(workload[:8], ests):
        sel = 1.0
        for c, op, v in zip(q.cols, q.ops, q.vals):
            cnt = duck_smoke.execute(
                f"SELECT COUNT(*) FROM lineitem WHERE {sql_predicate(Query(q.table, [c], [op], [v]))}"
            ).fetchone()[0]
            sel *= cnt / meta.cardinality
        assert est == int(np.ceil(sel * meta.cardinality))


def test_sampling_reasonable(lineitem, workload):
    df, meta = lineitem
    s = Sampling(df, meta, p=0.2, seed=42)
    oracle = Oracle(df)
    truths = oracle.query_batch(workload)
    ests = s.query_batch(workload)
    errs = [q_error(e, t) for e, t in zip(ests, truths) if t > 0]
    assert np.median(errs) < 100  # sanity, not precision


def test_region_size_positive_and_wildcards(lineitem, workload):
    _, meta = lineitem
    r = QueryRegionSize(meta)
    for q in workload[:5]:
        v = r.query(q)
        assert v >= 0
    full = QueryRegionSize(meta).query(Query("lineitem", [], [], []))
    expected = float(np.prod([float(c.distribution_size) for c in meta.columns]))
    assert full == expected


def test_const(workload):
    c = Const(7.0)
    assert c.query(workload[0]) == 7.0


def test_oracle_limit_first_n(spark, lineitem, workload):
    """Data-shift support (reference estimators.py:514-521): Oracle over the
    first n rows in a stable order equals a manual count on that prefix."""
    from pyspark.sql import functions as F

    df, _ = lineitem
    n = 500
    # (l_orderkey, l_linenumber) is a total order -> the prefix is stable
    prefix = df.orderBy("l_orderkey", "l_linenumber").limit(n).cache()
    q = workload[0]
    from naru_spark.predicates import spark_predicate

    assert Oracle(prefix).query(q) == prefix.filter(spark_predicate(q)).count()


def test_csv_source_roundtrip(spark, tmp_path):
    """A1/A13: CSV sink then CSV scan through the registry loader returns the
    same rows (types re-inferred)."""
    import pandas as pd

    from naru_spark.sources import load_table

    src = load_table(spark, "region", SF_SMOKE)
    pdf = src.toPandas()
    sf_dir = str(tmp_path)
    pdf.to_csv(f"{sf_dir}/region.csv", index=False)
    back = load_table(spark, "region", sf_dir)
    assert back.count() == src.count()
    assert {r["r_name"] for r in back.collect()} == {r["r_name"] for r in src.collect()}


def test_q_error_zero_handling():
    assert q_error(0, 0) == 1.0
    assert q_error(5, 0) == 5
    assert q_error(0, 7) == 7
    assert q_error(10, 5) == 2.0
    assert q_error(5, 10) == 2.0


def test_like_estimator_chain(spark):
    """n-gram chain LIKE estimator: exact on patterns the statistics pin
    down (single (n-1)-grams, absent grams), sane on longer chains."""
    from naru_spark.estimators.like import LikeEstimator

    rows = [(1, "abcd"), (2, "abce"), (3, "xbcd"), (4, "zzzz")]
    df = spark.createDataFrame(rows, ["id", "text"])
    est = LikeEstimator(df, "text", n=3)
    # (n-1)-gram path is exact doc frequency: 'ab' in rows 1,2
    assert est.query("ab") == 2.0
    assert est.query("zz") == 1.0
    # absent gram -> 0
    assert est.query("qq") == 0.0
    assert est.query("abq") == 0.0
    # full chain: P(abc)=2/4, P(bcd|bc)=f(bcd)/f(bc)=2/3 -> est=4*(1/2)*(2/3)
    assert abs(est.query("abcd") - 4 * (2 / 4) * (2 / 3)) < 1e-9
    # short patterns fall back to selectivity 1
    assert est.query("a") == 4.0
    # estimates never exceed the table
    for p in ["abcd", "bc", "zzz", "bcd"]:
        assert 0.0 <= est.query(p) <= 4.0


def test_like_estimator_anchored(spark):
    """prefix ('s%') and suffix ('%s') modes use position-anchored gram
    statistics; exact where statistics pin the answer."""
    from naru_spark.estimators.like import LikeEstimator

    rows = [(1, "abcd"), (2, "abce"), (3, "xbcd"), (4, "bcda")]
    df = spark.createDataFrame(rows, ["id", "text"])
    est = LikeEstimator(df, "text", n=3)
    # prefix (n-1)-gram: rows starting 'ab' = 2; 'bc' = 1; 'qq' = 0
    assert est.query_anchored("ab", "prefix") == 2.0
    assert est.query_anchored("bc", "prefix") == 1.0
    assert est.query_anchored("qq", "prefix") == 0.0
    # suffix: rows ending 'cd' = 2, 'da' = 1
    assert est.query_anchored("cd", "suffix") == 2.0
    assert est.query_anchored("da", "suffix") == 1.0
    # prefix chain: P(starts abc)=2/4 * P(bcd|bc)=f(bcd)/f(bc)
    f_bcd, f_bc = 3, 4  # bcd in rows 1,3,4; bc in all 4
    assert abs(est.query_anchored("abcd", "prefix") - 4 * (2 / 4) * (f_bcd / f_bc)) < 1e-9
    # suffix chain: P(ends bcd)=2/4 * P(abc precedes | bc...)=f(abc)/f(bc)
    assert abs(est.query_anchored("abcd", "suffix") - 4 * (2 / 4) * (2 / f_bc)) < 1e-9
    for p, a in [("abcd", "prefix"), ("abcd", "suffix"), ("ab", "prefix")]:
        assert 0.0 <= est.query_anchored(p, a) <= 4.0


def test_like_estimator_gram_cap(spark):
    """max_grams bounds the driver tables on a wide-alphabet (CJK-scale)
    corpus; capped estimates are pessimistic (only ever <= uncapped) and
    exact for patterns whose grams survive in the kept head."""
    import random

    from naru_spark.estimators.like import LikeEstimator

    rng = random.Random(7)
    # wide synthetic alphabet: 400 distinct chars -> thousands of grams
    alphabet = [chr(0x4E00 + i) for i in range(400)]
    hot = "".join(alphabet[:3])  # one deliberately frequent trigram
    rows = [
        (i, hot + "".join(rng.choice(alphabet) for _ in range(12)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["id", "text"])

    full = LikeEstimator(df, "text", n=3)
    capped = LikeEstimator(df, "text", n=3, max_grams=200)
    # the cap binds: full tables exceed it, capped tables are bounded
    assert len(full.freq_n) > 200
    assert len(capped.freq_n) <= 200 and len(capped.freq_n1) <= 200
    # hot grams survive and estimate identically to uncapped
    assert capped.query(hot) == full.query(hot) > 0
    # pessimistic bias: capped never exceeds uncapped, on hits and misses
    pats = [hot, hot[:2], "".join(rng.choice(alphabet) for _ in range(3)), "zz"]
    for p in pats:
        assert capped.query(p) <= full.query(p) + 1e-9
    # the ANCHORED tables honor the same cap (they previously collected the
    # full prefix/suffix vocabulary, re-opening the unbounded-driver case)
    capped.query_anchored(hot, "prefix")  # triggers lazy anchored fit
    for tbl in (
        capped.freq_prefix,
        capped.freq_prefix1,
        capped.freq_suffix,
        capped.freq_suffix1,
    ):
        assert len(tbl) <= 200
    # the hot anchored prefix survives the cap and stays exact
    full.query_anchored(hot, "prefix")
    assert capped.query_anchored(hot, "prefix") == full.query_anchored(hot, "prefix") > 0
