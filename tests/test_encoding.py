"""Dictionary-encoder gate (FIXTURES.md F3; reference common.py invariants):
- NULL -> bin 0, others shifted (+1) — common.py:74-80, 290-303
- domain sorted ascending — common.py:67-85
- encode . decode = identity; bins dense in [0, domain_size)
- domain-mask vector op(domain, v) agrees with row-level filtering
- NULL never matches any op — common.py:11-24
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from naru_spark.encoding import DictionaryEncoder
from naru_spark.predicates import NUMPY_OPS, Query, spark_predicate
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def edge_df(spark):
    pdf = pd.DataFrame(
        {
            "c_int_nulls": pd.array([3, None, 1, 7, 1, None, 0, 5], dtype="Int64"),
            "c_str_lex": ["b", "a", "ba", "B", "a", "zz", "", "A"],
            "c_ts": pd.to_datetime(
                ["2020-01-02", None, "2019-06-01", "2020-01-02", "2021-12-31", "2019-06-01", "2020-05-05", None]
            ),
            "c_single": ["only"] * 8,
            "c_dense": [0, 1, 2, 3, 0, 1, 2, 3],
            "c_float": [1.5, -2.0, 0.0, 1.5, 3.25, -2.0, 10.0, 0.5],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_null_bin_zero_and_sorted(spark, edge_df):
    df, pdf = edge_df
    enc = DictionaryEncoder(["c_int_nulls", "c_str_lex", "c_ts", "c_single", "c_dense", "c_float"]).fit(df)

    d = enc.dictionaries["c_int_nulls"]
    assert d.has_null
    assert list(d.values) == [0, 1, 3, 5, 7]  # sorted asc
    assert d.distribution_size == 6  # 5 values + NULL bin
    assert d.val_to_bin(0) == 1  # NULL occupies bin 0

    ds = enc.dictionaries["c_str_lex"]
    assert not ds.has_null
    assert list(ds.values) == sorted(set(pdf["c_str_lex"]))

    assert enc.dictionaries["c_single"].distribution_size == 1
    assert enc.dictionaries["c_dense"].distribution_size == 4
    # dense ints: bin ids == raw values
    dd = enc.dictionaries["c_dense"]
    assert [dd.val_to_bin(i) for i in range(4)] == [0, 1, 2, 3]

    dt = enc.dictionaries["c_ts"]
    assert dt.has_null and dt.distribution_size == 5


def test_roundtrip_and_dense(spark, edge_df):
    df, pdf = edge_df
    cols = ["c_int_nulls", "c_str_lex", "c_ts", "c_float"]
    enc = DictionaryEncoder(cols).fit(df)
    encoded = enc.transform(df).toPandas()
    for c in cols:
        d = enc.dictionaries[c]
        bins = encoded[f"{c}__bin"].to_numpy()
        assert bins.min() >= 0 and bins.max() < d.distribution_size
        decoded = d.decode_array(bins)
        raw = encoded[c]
        for dec, r in zip(decoded, raw):
            if pd.isnull(r):
                assert dec is None
            elif c == "c_ts":
                assert pd.Timestamp(dec) == pd.Timestamp(r)
            else:
                assert dec == r


def test_mask_agrees_with_filter(spark, edge_df):
    df, pdf = edge_df
    cols = ["c_int_nulls", "c_str_lex", "c_float"]
    enc = DictionaryEncoder(cols).fit(df)
    encoded = enc.transform(df).toPandas()
    test_vals = {"c_int_nulls": 3, "c_str_lex": "a", "c_float": 0.5}
    for c in cols:
        d = enc.dictionaries[c]
        v = test_vals[c]
        for op in NUMPY_OPS:
            mask = d.valid_bins_mask(op, v)
            if d.has_null:
                assert not mask[0]  # NULL never matches
            # rows whose bin is in the mask == rows passing the raw filter
            bins = encoded[f"{c}__bin"].to_numpy()
            mask_rows = mask[bins]
            q = Query("t", [c], [op], [v])
            spark_rows = df.filter(spark_predicate(q)).count()
            assert int(mask_rows.sum()) == spark_rows, (c, op)


def test_lineitem_smoke(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"]
    enc = DictionaryEncoder(cols).fit(df)
    meta = enc.table_meta(df, "lineitem")
    assert meta.cardinality == df.count()
    rf = enc.dictionaries["l_returnflag"]
    assert list(rf.values) == sorted(rf.values)
    encoded = enc.transform(df)
    agg = encoded.agg(
        *[F.min(f"{c}__bin").alias(f"min_{c}") for c in cols],
        *[F.max(f"{c}__bin").alias(f"max_{c}") for c in cols],
    ).collect()[0]
    for c in cols:
        assert agg[f"min_{c}"] >= 0
        assert agg[f"max_{c}"] < enc.dictionaries[c].distribution_size
