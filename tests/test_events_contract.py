"""Events-schema contract: the driver's ``events.parquet`` ``ts``
layout has changed across rounds (TIMESTAMP(NANOS) read as long in
round 1, native ``timestamp[us]`` since round 3). ``_ts_normalize`` /
``_events`` must yield a TimestampType column with identical instants
for BOTH layouts, so a future testdata change can never silently break
the events suite again (the round-2/3 outage mode).
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one exact microsecond instant + one that exercises nano truncation
_MICROS = [1700000000_000001, 1700000123_456789]
_NANOS = [m * 1000 + 999 for m in _MICROS]  # sub-micro tail must truncate


@pytest.fixture(scope="module")
def layouts(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_layouts")
    native = os.path.join(root, "native")
    nanos = os.path.join(root, "nanos")
    os.makedirs(native)
    os.makedirs(nanos)
    base = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["click", "purchase"],
        "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }
    pq.write_table(
        pa.table({**base, "ts": pa.array(_MICROS, type=pa.timestamp("us"))}),
        os.path.join(native, "events.parquet"),
    )
    # raw int64 column named ts — what nanosAsLong yields for
    # TIMESTAMP(NANOS) files (driver round-1 layout)
    pq.write_table(
        pa.table({**base, "ts": pa.array(_NANOS, type=pa.int64())}),
        os.path.join(nanos, "events.parquet"),
    )
    return native, nanos


def _micros_of(spark, sf_dir):
    from __spark_entry__ import _events

    df = _events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    rows = df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    return {r["event_id"]: r["us"] for r in rows}


def test_both_layouts_normalize_to_same_instants(spark, layouts):
    native, nanos = layouts
    got_native = _micros_of(spark, native)
    got_nanos = _micros_of(spark, nanos)
    expect = {1: _MICROS[0], 2: _MICROS[1]}
    assert got_native == expect
    assert got_nanos == expect  # nano tail truncated, not rounded


def test_driver_testdata_normalizes(spark):
    got = _micros_of(spark, "/root/testdata/sf0.001")
    assert len(got) > 0
