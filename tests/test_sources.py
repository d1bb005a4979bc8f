"""Source-loading invariants, above all the TIMESTAMP_NTZ pin.

The testdata parquet stores event times as timestamp[us] with no timezone,
which Spark 4 surfaces as TIMESTAMP_NTZ — a type withWatermark rejects and
that cannot cast to BIGINT. ``load_table`` / ``events_stream`` must always
normalize these to plain TIMESTAMP (session is UTC-pinned so the cast is
value-preserving). These tests pin that contract so environment-inference
changes can never silently re-break the streaming/range operators.
"""

import pytest

from naru_spark.sources.registry import TABLE_NAMES, load_table
from tests.conftest import SF_SMOKE


def test_no_ntz_anywhere(spark):
    """Every registry table surfaces event-time columns as TIMESTAMP."""
    for t in TABLE_NAMES:
        for name, dtype in load_table(spark, t, SF_SMOKE).dtypes:
            assert dtype != "timestamp_ntz", f"{t}.{name} is TIMESTAMP_NTZ"


def test_events_ts_is_timestamp(spark):
    assert dict(load_table(spark, "events", SF_SMOKE).dtypes)["ts"] == "timestamp"


def test_events_stream_ts_is_timestamp(spark):
    from naru_spark.streaming.events import events_stream

    st = events_stream(spark, SF_SMOKE)
    assert dict(st.dtypes)["ts"] == "timestamp"


def test_scan_pruning_and_pushdown(spark):
    """Plan-shape pins: (a) load_table's projection prunes the parquet
    ReadSchema to exactly the requested columns; (b) predicates reach the
    scan as PushedFilters; (c) a predicate on the NTZ-cast ts column still
    pushes through the cast (NTZ->LTZ under the UTC session is
    order-preserving, so Catalyst rewrites the literal instead of
    materializing the cast)."""
    import re

    from pyspark.sql import functions as F

    def scan_info(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        rs = re.search(r"ReadSchema: ([^\n]*)", plan)
        pf = re.search(r"PushedFilters: (\[[^\]]*\])", plan)
        return (rs.group(1) if rs else ""), (pf.group(1) if pf else "")

    df = load_table(spark, "lineitem", SF_SMOKE, ["l_returnflag", "l_quantity"]).filter(
        F.col("l_quantity") <= 10
    )
    schema, pushed = scan_info(df)
    assert schema.startswith("struct<l_quantity:double,l_returnflag:string>"), schema
    assert "LessThanOrEqual(l_quantity,10.0)" in pushed, pushed

    ev = load_table(spark, "events", SF_SMOKE, ["ts", "event_type"]).filter(
        F.col("ts") >= "2024-03-01"
    )
    schema, pushed = scan_info(ev)
    assert "ts:timestamp_ntz,event_type:string" in schema, schema  # only 2 cols read
    assert "GreaterThanOrEqual(ts," in pushed, pushed


def test_ntz_cast_preserves_values(spark):
    """NTZ -> TIMESTAMP under the UTC session must not shift instants:
    collected values equal the raw parquet micros read by pyarrow."""
    import pyarrow.parquet as pq

    df = load_table(spark, "events", SF_SMOKE).select("event_id", "ts").orderBy("event_id").limit(50)
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    tbl = pq.read_table(f"{SF_SMOKE}/events.parquet", columns=["event_id", "ts"]).to_pandas()
    tbl = tbl.sort_values("event_id").head(50)
    for eid, ts in zip(tbl["event_id"], tbl["ts"]):
        assert got[eid] == ts.to_pydatetime(), (eid, got[eid], ts)


def test_load_dmv_shim(spark, tmp_path):
    """DMV shim (reference datasets.py:9-20): accepts the real DMV CSV
    layout — 20 columns, MM/dd/yyyy dates, untrimmed strings — projecting
    the reference's 11 columns with ONE timestamp cast and no trimming."""
    import datetime

    from naru_spark.sources import DMV_COLUMNS, load_dmv

    csv = tmp_path / "dmv.csv"
    header = (
        "Record Type,VIN,Registration Class,City,State,Zip,County,Model Year,"
        "Make,Body Type,Fuel Type,Unladen Weight,Maximum Gross Weight,Passengers,"
        "Reg Valid Date,Reg Expiration Date,Color,Scofflaw Indicator,"
        "Suspension Indicator,Revocation Indicator"
    )
    rows = [
        "VEH ,5NMSGDAB5AH372379,PAS,ALEXANDRIA BAY ,NY,13607,JEFFERSON   ,2010,"
        "HYUND,SUBN,GAS     ,3875,,,06/26/2017,07/06/2019,WH   ,N,N,N",
        "BOAT,JA4AD3A37HZ0201XX,PAS,NEW YORK       ,NY,10033,NEW YORK    ,2017,"
        "MITSU,SUBN,GAS     ,3289,,,07/23/2018,04/17/2019,GY   ,N,N,N",
    ]
    csv.write_text(header + "\n" + "\n".join(rows) + "\n")

    df = load_dmv(spark, str(csv))
    assert df.columns == DMV_COLUMNS  # projection, reference order
    types = dict(df.dtypes)
    assert types["Reg Valid Date"] == "timestamp"
    assert all(types[c] == "string" for c in DMV_COLUMNS if c != "Reg Valid Date")
    got = df.orderBy("Record Type").collect()
    assert got[1]["Record Type"] == "VEH "  # untrimmed, like the reference
    assert got[1]["County"] == "JEFFERSON   "
    assert got[1]["Reg Valid Date"] == datetime.datetime(2017, 6, 26)

    with pytest.raises(ValueError, match="missing expected columns"):
        bad = tmp_path / "bad.csv"
        bad.write_text("A,B\n1,2\n")
        load_dmv(spark, str(bad))

    # fail-loudly date parity: the reference's np.datetime64 cast RAISES on
    # malformed dates; to_timestamp would silently null them — load_dmv
    # must detect the nulled-on-non-null-input case and raise
    mal = tmp_path / "mal.csv"
    mal.write_text(
        header + "\n" + rows[0] + "\n" + rows[1].replace("07/23/2018", "NOT/A/DATE") + "\n"
    )
    with pytest.raises(ValueError, match="failed the MM/dd/yyyy"):
        load_dmv(spark, str(mal))
    # a genuinely EMPTY date field is not a parse failure (null in, null out)
    emp = tmp_path / "emp.csv"
    emp.write_text(
        header + "\n" + rows[0] + "\n" + rows[1].replace("07/23/2018", "") + "\n"
    )
    assert load_dmv(spark, str(emp)).count() == 2


def test_load_oracle_cards(tmp_path):
    """Golden-card reuse (reference eval_model.py:467-476): strict length
    check, flat int64 result, None when the file is absent."""
    import numpy as np

    from naru_spark.sources import load_oracle_cards

    p = tmp_path / "cards.csv"
    p.write_text("card\n" + "\n".join(str(i * 7) for i in range(2000)) + "\n")
    cards = load_oracle_cards(str(p))
    assert cards.shape == (2000,) and cards.dtype == np.int64
    assert cards[3] == 21

    assert load_oracle_cards(str(tmp_path / "absent.csv")) is None

    short = tmp_path / "short.csv"
    short.write_text("card\n1\n2\n")
    with pytest.raises(ValueError, match="expected 2000"):
        load_oracle_cards(str(short))
