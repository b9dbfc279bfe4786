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
    assert engine.wait(job_id) is JobStage.FINISHED
    result = engine.get_result(job_id, token="tk")
    assert result == expected_charcount(KVS)


def test_identity_ordering_contract(engine):
    """Global key order + within-key (subjob, emission) value order
    (SURVEY §1.4)."""
    kvs = [("b", "2"), ("a", "1"), ("b", "3"), ("a", "4"), ("c", "5"), ("a", "6")]
    job_id = engine.launch("id", "identity", kvs, mapper_num=3, reducer_num=2)
    engine.wait(job_id)
    result = engine.get_result(job_id)
    # sorted payload: a1,a4,a6,b2,b3,c5 -> slices keep contiguous order, so
    # values per key appear in sorted-payload order.
    assert result == ["1", "4", "6", "2", "3", "5"]


def test_empty_map_short_circuit(engine):
    """Zero map output => job finishes with empty result, reduce never runs
    (master.cc:624-627)."""
    job_id = engine.launch("em", "empty-map", KVS)
    engine.wait(job_id)
    assert engine.get_result(job_id) == []
    assert engine.stage_of(job_id) is JobStage.FINISHED


def test_single_reducer_matches_many(engine):
    job1 = engine.launch("wc", "charcount", KVS, mapper_num=1, reducer_num=1)
    job2 = engine.launch("wc", "charcount", KVS, mapper_num=3, reducer_num=4)
    engine.wait(job1), engine.wait(job2)  # the two jobs run concurrently
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
    engine.wait(job_id)
    with pytest.raises(ResultError):
        engine.get_result(job_id, token="wrong")
    assert engine.get_result(job_id, token="secret")


def test_result_ttl_gc(engine):
    """Finished jobs GC'd after 1h (master.cc:449-463, master.h:27)."""
    job_id = engine.launch("ttl", "identity", KVS)
    engine.wait(job_id)
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
    engine.wait(job_id)
    assert flat == engine.get_result(job_id)


def test_apply_df_construction_launches_no_jobs(engine, spark):
    """Building the apply_df DataFrame must launch ZERO Spark jobs: the
    output schema is declared explicitly, so no RDD sampling (rdd.first())
    may execute the map+shuffle lineage before the caller's real action —
    the r12 optimization that de-doubled every mr_* entry's map stage.
    The schema itself stays the declared (key string, result string)."""
    df = spark.createDataFrame(KVS, "key string, value string")
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return set(tracker.getJobIdsForGroup(None) or [])

    before = jobs()
    out = engine.apply_df(df, "charcount")
    assert jobs() == before, "apply_df construction fired a Spark job"
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("key", "string"),
        ("result", "string"),
    ]


def test_combiner_results_identical_to_plain(spark):
    """The map-side combiner must not change results — only shuffle volume."""
    from tmapreduce_spark.mapreduce import MapReduceEngine

    engine = MapReduceEngine(spark)
    kvs = [("d1", "aab bb a"), ("d2", "bb cc aab"), ("d3", "a a a")]
    pj = engine.launch("p", "wordcount", kvs, 3, 2, token="t")
    cj = engine.launch("c", "wordcount+c", kvs, 3, 2, token="t")
    engine.wait(pj), engine.wait(cj)
    plain = engine.get_result(pj, token="t")
    combined = engine.get_result(cj, token="t")
    assert plain == combined

def test_async_launch_observable_lifecycle(spark):
    """launch returns before the job finishes (gateway.cc:131-157): another
    thread can observe intermediate stages, and get_result refuses with
    'job not finished' while the job runs (master.cc:685-699) — the exact
    poll loop the reference client runs (word_count_client.cc:54)."""
    import os
    import tempfile
    import time as _time

    from tmapreduce_spark.registry import JobRegistry, charcount_reduce

    # Filesystem gate (a threading.Event would not pickle into the closure).
    gate_path = os.path.join(tempfile.mkdtemp(), "gate")

    def slow_map(key, value):
        deadline = _time.time() + 30
        while not os.path.exists(gate_path) and _time.time() < deadline:
            _time.sleep(0.05)
        return [(c, "1") for c in value]

    reg = JobRegistry()
    reg.register("slow-charcount", slow_map, charcount_reduce)
    engine = MapReduceEngine(spark, registry=reg)

    job_id = engine.launch("slow", "slow-charcount", KVS, token="t")
    # launch returned while the map stage is blocked on the gate: the job
    # must be observably in-flight, and get_result must refuse.
    deadline = _time.time() + 10
    while engine.stage_of(job_id) is JobStage.INIT and _time.time() < deadline:
        _time.sleep(0.01)
    assert engine.stage_of(job_id) in (JobStage.MAPPING, JobStage.MERGING, JobStage.REDUCING)
    with pytest.raises(ResultError, match="not finished"):
        engine.get_result(job_id, token="t")

    with open(gate_path, "w") as f:
        f.write("go")
    assert engine.wait(job_id, timeout=60) is JobStage.FINISHED
    assert engine.get_result(job_id, token="t") == expected_charcount(KVS)


def test_async_launch_error_surfaces(spark):
    """A user-function failure is captured on the background thread and
    re-raised to the caller (wait and get_result)."""
    from tmapreduce_spark.registry import JobRegistry, charcount_reduce

    def bad_map(key, value):
        raise RuntimeError("boom in map")

    reg = JobRegistry()
    reg.register("bad-map", bad_map, charcount_reduce)
    engine = MapReduceEngine(spark, registry=reg)
    job_id = engine.launch("bad", "bad-map", KVS, token="t")
    with pytest.raises(Exception, match="boom in map"):
        engine.wait(job_id, timeout=60)
    with pytest.raises(ResultError, match="job failed"):
        engine.get_result(job_id, token="t")


def test_failed_reduce_unpersists_cached_rdd(spark):
    """A reduce-stage failure must not leak the cached map RDD: the
    try/finally around the post-cache pipeline guarantees unpersist() even
    when the collect raises, so failed jobs can't accumulate pinned executor
    memory across a long-lived session."""
    from tmapreduce_spark.registry import JobRegistry, charcount_map

    def bad_reduce(key, values):
        raise RuntimeError("boom in reduce")

    reg = JobRegistry()
    reg.register("bad-reduce", charcount_map, bad_reduce)
    engine = MapReduceEngine(spark, registry=reg)
    # relative check: other tests in the shared session may hold legitimate
    # persistent RDDs (localCheckpoint lineage truncation); the invariant is
    # that THIS failed job leaves no NEW one behind
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    job_id = engine.launch("bad", "bad-reduce", KVS, token="t")
    with pytest.raises(Exception, match="boom in reduce"):
        engine.wait(job_id, timeout=60)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


# -- HTTP/REST gateway (gateway.cc observable contract) ----------------------


def _http(method, port, path, body=None):
    import http.client
    import json as _json

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    payload = _json.dumps(body) if isinstance(body, dict) else body
    conn.request(method, path, body=payload)
    resp = conn.getresponse()
    raw = resp.read()
    conn.close()
    try:
        return resp.status, _json.loads(raw)
    except (ValueError, UnicodeDecodeError):
        return resp.status, raw.decode(errors="replace")


def test_gateway_end_to_end_wordcount(spark):
    """POST /launch -> poll GET /getresult until the job stops answering
    'job not finished' -> key-ordered flat results, matching the reference
    client's loop (word_count_client.cc:54-63)."""
    import time

    from tmapreduce_spark.gateway import Gateway
    from tmapreduce_spark.mapreduce import MapReduceEngine

    with Gateway(MapReduceEngine(spark)) as gw:
        status, body = _http("GET", gw.port, "/helloworld")
        assert (status, body) == (200, "Hello world.")

        status, body = _http(
            "POST", gw.port, "/launch",
            {
                "name": "wc", "type": "wordcount", "mapper_num": 2,
                "reducer_num": 2, "token": "tok",
                "kvs": [
                    {"key": "a", "value": "x y x"},
                    {"key": "b", "value": "y"},
                ],
            },
        )
        assert status == 200 and body["ok"] is True
        job_id = body["job_id"]

        deadline = time.time() + 120
        while True:
            status, body = _http(
                "GET", gw.port, f"/getresult?job_id={job_id}&token=tok"
            )
            if status == 200:
                break
            assert body["ok"] is False
            assert time.time() < deadline, body
            time.sleep(0.2)
        assert body == {"ok": True, "message": "", "result": ["x", "2", "y", "2"]}


def test_gateway_error_paths(spark):
    from tmapreduce_spark.gateway import Gateway
    from tmapreduce_spark.mapreduce import MapReduceEngine

    ok_req = {
        "name": "wc", "type": "wordcount", "mapper_num": 1, "reducer_num": 1,
        "token": "", "kvs": [{"key": "a", "value": "x"}],
    }
    with Gateway(MapReduceEngine(spark)) as gw:
        # shape violations -> bare 400 (check_launch_request, gateway.cc:15-51)
        for broken in (
            "not json",
            {**ok_req, "mapper_num": "2"},
            {**ok_req, "mapper_num": -1},
            {k: v for k, v in ok_req.items() if k != "token"},
            {**ok_req, "kvs": [{"key": "a", "value": 3}]},
            {**ok_req, "kvs": "nope"},
        ):
            status, _ = _http("POST", gw.port, "/launch", broken)
            assert status == 400, broken

        # shape-valid but rejected by admission -> 500 {"ok": false}
        for rejected in (
            {**ok_req, "mapper_num": 0},
            {**ok_req, "kvs": []},
            {**ok_req, "type": "no_such_type"},
        ):
            status, body = _http("POST", gw.port, "/launch", rejected)
            assert status == 500 and body["ok"] is False, rejected

        # getresult failures: unknown job, wrong token
        status, body = _http("GET", gw.port, "/getresult?job_id=99&token=")
        assert status == 500 and "no such job" in body["message"]

        status, body = _http("POST", gw.port, "/launch", {**ok_req, "token": "s3"})
        job_id = body["job_id"]
        status, body = _http("GET", gw.port, f"/getresult?job_id={job_id}&token=bad")
        assert status == 500 and "wrong token" in body["message"]


def test_gateway_spool_failure_never_500s_a_launched_job(spark):
    """Once the master has admitted the job, a spool failure of ANY exception
    class (not just OSError: e.g. a codec TypeError on a pathological payload)
    must log-and-200 — a 500 would make the client retry and duplicate the
    job (r10 advice; broadened per r11 advice)."""
    from tmapreduce_spark.gateway import Gateway
    from tmapreduce_spark.mapreduce import MapReduceEngine

    class _ExplodingSpool:
        def __init__(self, exc):
            self.exc = exc

        def append(self, name, job_type, kvs):
            raise self.exc

    req = {
        "name": "wc", "type": "wordcount", "mapper_num": 1, "reducer_num": 1,
        "token": "t", "kvs": [{"key": "a", "value": "x"}],
    }
    for exc in (OSError("disk full"), TypeError("bad payload"),
                ValueError("codec"), RuntimeError("anything")):
        with Gateway(MapReduceEngine(spark), spool=_ExplodingSpool(exc)) as gw:
            status, body = _http("POST", gw.port, "/launch", req)
            assert status == 200 and body["ok"] is True, (exc, status, body)


def test_mr_sort_output_globally_key_ordered(spark):
    """The distributed-sort canonical program: with identity map/reduce the
    FRAMEWORK's key-sort contract alone must produce globally ordered
    output — rows arrive in non-decreasing key order across partitions
    (range-partitioned Finish stage), which is the whole point of the
    TeraSort shape."""
    from tests.conftest import SF_SMOKE
    from tmapreduce_spark.operators.mapreduce_queries import mr_sort

    keys = [r["key"] for r in mr_sort(spark, SF_SMOKE).collect()]
    assert len(keys) > 0
    assert keys == sorted(keys)


def test_apply_df_ordered_groups_each_key_once_across_partitions(spark):
    """ordered=True reduces CONTIGUOUS key runs after one range-partitioned
    sorted shuffle (the TeraSort shape) instead of groupByKey+sortByKey.
    The internals risk of run-grouping is a key split across partitions
    reaching reduce as two groups — range partitioning must send every copy
    of a key to one partition. Pin it with an aggregating reducer over keys
    deliberately scattered across 16 input partitions: each key must emit
    exactly one (key, key-marker) + one fully-concatenated row, in global
    key order."""
    from tmapreduce_spark.mapreduce import MapReduceEngine

    rows = [
        (f"k{i % 7}", f"{i:03d}|v{i:03d}") for i in range(140)
    ]
    df = spark.createDataFrame(rows, "key string, value string").repartition(16)
    out = [
        (r["key"], r["result"])
        for r in MapReduceEngine(spark).apply_df(
            df, "secondarysort", ordered=True
        ).collect()
    ]
    keys = [k for k, _ in out]
    assert keys == sorted(keys)
    # exactly two rows per key: the marker and ONE concatenation of all 20
    # payloads in sortkey order — a split reduce group would emit extras
    for k in {k for k, _ in out}:
        vals = [v for kk, v in out if kk == k]
        assert len(vals) == 2, (k, vals)
        expected = "".join(
            f"v{i:03d}" for i in sorted(j for j in range(140) if f"k{j % 7}" == k)
        )
        assert k in vals and expected in vals, (k, vals)
