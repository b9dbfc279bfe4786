"""Footer-variant pin: the generated events.parquet has shipped its `ts`
column two ways across rounds — TIMESTAMP(NANOS) (Spark reads LONG nanos
under the legacy flag) and timestamp[us] without UTC adjustment (Spark 4
infers TIMESTAMP_NTZ, which instant functions reject; this exact variant
crashed the round-3 bench). `load_table` / `events_stream_schema` normalize
both to TIMESTAMP. These tests synthesize BOTH footers for the same instants
and assert the normalized values are identical and instant-function-safe —
so the next footer flip cannot resurrect the bug class, regardless of which
variant the current testdata happens to carry."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ROWS = [
    (1, 1_700_000_000_123_456, 7, "click", 1.5, "{}"),
    (2, 1_700_000_999_654_321, 8, "error", 2.5, "{}"),
    (3, 1_700_100_000_000_789, 7, "purchase", 3.5, "{}"),
]


def _write_events(dir_path: str, unit: str) -> str:
    """Write an events.parquet whose ts footer is TIMESTAMP(NANOS) (unit='ns')
    or microsecond-without-UTC-adjustment → TIMESTAMP_NTZ (unit='us')."""
    us = [r[1] for r in ROWS]
    ts = pa.array(
        [u * 1000 for u in us] if unit == "ns" else us, type=pa.timestamp(unit)
    )
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": ts,
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS]),
        }
    )
    pq.write_table(table, f"{dir_path}/events.parquet", version="2.6")
    return dir_path


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    ns_dir = _write_events(str(tmp_path_factory.mktemp("ev_nanos")), "ns")
    us_dir = _write_events(str(tmp_path_factory.mktemp("ev_ntz")), "us")
    return ns_dir, us_dir


def test_load_table_normalizes_both_footers_identically(spark, variant_dirs):
    from pyspark.sql import functions as F

    from tmapreduce_spark.sources.catalog import load_table

    ns_dir, us_dir = variant_dirs
    got = {}
    for tag, d in (("nanos", ns_dir), ("ntz", us_dir)):
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (tag, df.dtypes)
        # the r03 crash: unix_micros on a non-instant type — must work now
        got[tag] = sorted(
            (r["event_id"], r["us"])
            for r in df.select("event_id", F.unix_micros("ts").alias("us")).collect()
        )
    assert got["nanos"] == got["ntz"]
    assert got["ntz"] == sorted((r[0], r[1]) for r in ROWS)


def test_stream_schema_normalizes_both_footers_identically(spark, variant_dirs):
    from pyspark.sql import functions as F

    from tmapreduce_spark.streaming.events import run_stream_to_memory, stream_events

    ns_dir, us_dir = variant_dirs
    got = {}
    for tag, d in (("nanos", ns_dir), ("ntz", us_dir)):
        s = stream_events(spark, d).select(
            "event_id", F.unix_micros("ts").alias("us")
        )
        mem = run_stream_to_memory(spark, s, f"t_footer_{tag}", output_mode="append")
        got[tag] = sorted((r["event_id"], r["us"]) for r in mem.collect())
    assert got["nanos"] == got["ntz"]
    assert got["ntz"] == sorted((r[0], r[1]) for r in ROWS)
