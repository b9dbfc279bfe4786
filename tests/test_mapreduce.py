"""Reference-parity tests for the MapReduce job API (FIXTURES.md §3 golden
jobs + error paths, semantics cited from /root/reference in mapreduce.py)."""

from __future__ import annotations

from collections import Counter

import pytest

from tmapreduce_spark.mapreduce import (
    JOB_RESULT_TIMEOUT_SECOND,
    JobStage,
    LaunchError,
    MapReduceEngine,
    ResultError,
)

KVS = [
    ("1", "sgdakjsdkashdashdashdjkasdhkjasdhkashdk"),
    ("2", "sdakjshdkajsdhj"),
    ("3", "dhaksjdhksadhasjkdashdasdhkjasdhakjshdkasjdda"),
]


@pytest.fixture(scope="module")
def engine(spark):
    return MapReduceEngine(spark)


def expected_charcount(kvs):
    total = Counter()
    for _k, v in kvs:
        total.update(c for c in v if ("a" <= c <= "z") or ("0" <= c <= "9"))
    out = []
    for ch in sorted(total):
        out.extend([ch, str(total[ch])])
    return out


def test_charcount_golden(engine):
    """The reference's shipped example job: flat [k1, n1, k2, n2, ...] sorted
    by key (word_count.cc:9-34, job.cc:63-77)."""
    job_id = engine.launch("wc", "charcount", KVS, mapper_num=2, reducer_num=2, token="tk")
    assert engine.stage_of(job_id) is JobStage.FINISHED
    result = engine.get_result(job_id, token="tk")
    assert result == expected_charcount(KVS)


def test_identity_ordering_contract(engine):
    """Global key order + within-key (subjob, emission) value order
    (SURVEY §1.4)."""
    kvs = [("b", "2"), ("a", "1"), ("b", "3"), ("a", "4"), ("c", "5"), ("a", "6")]
    job_id = engine.launch("id", "identity", kvs, mapper_num=3, reducer_num=2)
    result = engine.get_result(job_id)
    # sorted payload: a1,a4,a6,b2,b3,c5 -> slices keep contiguous order, so
    # values per key appear in sorted-payload order.
    assert result == ["1", "4", "6", "2", "3", "5"]


def test_empty_map_short_circuit(engine):
    """Zero map output => job finishes with empty result, reduce never runs
    (master.cc:624-627)."""
    job_id = engine.launch("em", "empty-map", KVS)
    assert engine.get_result(job_id) == []
    assert engine.stage_of(job_id) is JobStage.FINISHED


def test_single_reducer_matches_many(engine):
    job1 = engine.launch("wc", "charcount", KVS, mapper_num=1, reducer_num=1)
    job2 = engine.launch("wc", "charcount", KVS, mapper_num=3, reducer_num=4)
    assert engine.get_result(job1) == engine.get_result(job2)


def test_validation_errors(engine):
    """master.cc:530-535 / gateway.cc:15-51 admission rules."""
    with pytest.raises(LaunchError):
        engine.launch("bad", "charcount", [])
    with pytest.raises(LaunchError):
        engine.launch("bad", "charcount", KVS, mapper_num=0)
    with pytest.raises(LaunchError):
        engine.launch("bad", "charcount", KVS, reducer_num=0)
    with pytest.raises(LaunchError):
        engine.launch("bad", "charcount", [("k", 42)])  # non-string value
    with pytest.raises(KeyError):
        engine.launch("bad", "no-such-type", KVS)


def test_get_result_errors(engine):
    """master.cc:685-699: unknown job, wrong token."""
    with pytest.raises(ResultError):
        engine.get_result(999999)
    job_id = engine.launch("tk", "identity", KVS, token="secret")
    with pytest.raises(ResultError):
        engine.get_result(job_id, token="wrong")
    assert engine.get_result(job_id, token="secret")


def test_result_ttl_gc(engine):
    """Finished jobs GC'd after 1h (master.cc:449-463, master.h:27)."""
    job_id = engine.launch("ttl", "identity", KVS)
    job = engine._jobs[job_id]
    job.finish_time -= JOB_RESULT_TIMEOUT_SECOND + 1
    with pytest.raises(ResultError):
        engine.get_result(job_id)


def test_apply_df_matches_launch(engine, spark):
    """The distributed DataFrame path computes the same per-key outputs as the
    driver-side parity path."""
    df = spark.createDataFrame(KVS, "key string, value string")
    rows = engine.apply_df(df, "charcount").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r["result"])
    flat = []
    for k in sorted(by_key):
        flat.extend(by_key[k])
    job_id = engine.launch("wc", "charcount", KVS)
    assert flat == engine.get_result(job_id)


def test_combiner_results_identical_to_plain(spark):
    """The map-side combiner must not change results — only shuffle volume."""
    from tmapreduce_spark.mapreduce import MapReduceEngine

    engine = MapReduceEngine(spark)
    kvs = [("d1", "aab bb a"), ("d2", "bb cc aab"), ("d3", "a a a")]
    plain = engine.get_result(engine.launch("p", "wordcount", kvs, 3, 2, token="t"), token="t")
    combined = engine.get_result(engine.launch("c", "wordcount+c", kvs, 3, 2, token="t"), token="t")
    assert plain == combined
