"""Structured Streaming tests: windowed aggregations over the events stream
must equal their batch twins (complete mode), append mode must emit a
watermark-bounded subset, and streaming dedup must preserve distinct events."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tmapreduce_spark.operators.relational import events_tumbling_10min
from tmapreduce_spark.sources.catalog import load_table
from tmapreduce_spark.streaming.events import (
    dedup_stream,
    run_stream_to_memory,
    session_windows,
    sliding_counts,
    stream_events,
    tumbling_counts,
)


def _rows(df, columns):
    return sorted(map(tuple, df.toPandas().reindex(columns=columns).astype(str).values.tolist()))


def test_tumbling_matches_batch(spark):
    s = tumbling_counts(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_tumbling", output_mode="complete")
    batch = events_tumbling_10min(spark, SF_SMOKE)
    assert _rows(mem, mem.columns) == _rows(batch, mem.columns)


def test_tumbling_matches_batch_from_kafka_mock(spark, tmp_path):
    """The windowed plan is source-independent: the same tumbling_counts over
    a Kafka-shaped JSON envelope stream (topic dir + from_json decode) must
    equal the batch twin exactly, like the file source does."""
    from tmapreduce_spark.streaming.events import read_stream, write_kafka_mock

    topic_dir = str(tmp_path / "topic-events")
    write_kafka_mock(spark, SF_SMOKE, topic_dir)
    s = tumbling_counts(read_stream(spark, kind="kafka_mock", path=topic_dir))
    mem = run_stream_to_memory(spark, s, "t_tumbling_kafka", output_mode="complete")
    batch = events_tumbling_10min(spark, SF_SMOKE)
    assert _rows(mem, mem.columns) == _rows(batch, mem.columns)


def test_read_stream_rate_kind_runs_same_plan(spark):
    """kind='rate' lands in the canonical schema, so the identical windowed
    transform runs on the generator source (schema + liveness smoke)."""
    from tmapreduce_spark.streaming.events import read_stream

    src = read_stream(spark, kind="rate")
    assert src.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    )
    s = tumbling_counts(src, watermark="0 seconds")
    q = (
        s.writeStream.format("memory")
        .queryName("t_rate_kind")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline and not spark.table("t_rate_kind").count():
            time.sleep(0.5)
        rows = spark.table("t_rate_kind").collect()
    finally:
        q.stop()
    assert rows and all(r["event_type"] in ("click", "view", "purchase") for r in rows)


def test_append_mode_is_watermark_bounded_subset(spark):
    s = tumbling_counts(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_tumbling_append", output_mode="append")
    batch = events_tumbling_10min(spark, SF_SMOKE)
    a = set(_rows(mem, mem.columns))
    b = set(_rows(batch, mem.columns))
    assert a <= b
    # only windows newer than (max event time - watermark) may be withheld
    assert len(b) - len(a) < 10


def test_sliding_double_counts(spark):
    s = sliding_counts(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_sliding", output_mode="complete")
    total_sliding = sum(r["n_events"] for r in mem.collect())
    n_events = load_table(spark, SF_SMOKE, "events").count()
    # 10-min window sliding every 5 => every event in exactly 2 windows
    assert total_sliding == 2 * n_events


def test_session_windows_sane(spark):
    s = session_windows(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_session", output_mode="complete")
    rows = mem.collect()
    assert rows
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_stream_dedup_keeps_distinct(spark):
    s = dedup_stream(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_dedup")
    n = load_table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    assert mem.select("event_id").distinct().count() == n


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream click→purchase join (watermarked both sides) must emit
    exactly the batch join's matches when the whole file arrives."""
    from tmapreduce_spark.sources.catalog import load_table
    from tmapreduce_spark.streaming.events import (
        click_purchase_join,
        run_stream_to_memory,
        stream_events,
    )

    streamed = run_stream_to_memory(
        spark,
        click_purchase_join(stream_events(spark, SF_SMOKE)),
        "t_ss_join",
        output_mode="append",
    )
    batch = click_purchase_join(load_table(spark, SF_SMOKE, "events"))
    a = {(r["user_id"], r["click_id"], r["purchase_id"]) for r in streamed.collect()}
    b = {(r["user_id"], r["click_id"], r["purchase_id"]) for r in batch.collect()}
    assert a == b
    assert len(a) > 0


def test_stream_file_sink_parquet(spark, tmp_path):
    """writeStream to a parquet directory sink (the production landing-zone
    pattern): drained rows must equal the batch twin."""
    from tmapreduce_spark.operators.relational import events_tumbling_10min
    from tmapreduce_spark.streaming.events import stream_events, tumbling_counts

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        tumbling_counts(stream_events(spark, SF_SMOKE))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    # append mode emits only watermark-closed windows: a subset of the batch
    # twin, keyed identically.
    batch = {
        (r["bucket_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_tumbling_10min(spark, SF_SMOKE).collect()
    }
    emitted = got.collect()
    assert emitted, "file sink emitted nothing"
    for r in emitted:
        assert batch[(r["bucket_epoch"], r["event_type"])] == (r["n_events"], r["sum_value"])


def test_stream_foreachbatch_sink(spark, tmp_path):
    """foreachBatch: arbitrary per-microbatch sink logic (upserts, external
    systems). Collects batch ids + row counts through the hook."""
    from tmapreduce_spark.streaming.events import stream_events, tumbling_counts

    seen: list[tuple[int, int]] = []

    def sink(batch_df, batch_id: int) -> None:
        seen.append((batch_id, batch_df.count()))

    q = (
        tumbling_counts(stream_events(spark, SF_SMOKE))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen and sum(n for _, n in seen) > 0


def test_checkpoint_recovery_processes_only_new_files(spark, tmp_path):
    """Exactly-once file source: a second availableNow run against the SAME
    checkpoint must process only files that arrived after the first run —
    the recovery contract a 100 TB landing zone depends on."""
    import shutil

    from tmapreduce_spark.streaming.events import events_stream_schema

    schema, normalize = events_stream_schema(spark, SF_SMOKE)
    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = f"{SF_SMOKE}/events.parquet"
    shutil.copy(src, land / "a.parquet")

    def drain():
        q = (
            normalize(spark.readStream.schema(schema).parquet(str(land)))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_one = spark.read.parquet(out).count()
    drain()  # no new files -> no new rows
    assert spark.read.parquet(out).count() == n_one
    shutil.copy(src, land / "b.parquet")
    drain()  # only b.parquet processed -> exactly doubles
    assert spark.read.parquet(out).count() == 2 * n_one


def test_rate_source_windowed_counts(spark, tmp_path):
    """Non-file streaming source: the built-in rate source (stands in for
    Kafka locally) through the SAME windowed-aggregation plan. Proves the
    transformations are source-agnostic."""
    from pyspark.sql import functions as F
    from tmapreduce_spark.parity import SPARK, msum2

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 7).alias("event_type"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )
    agg = (
        rate.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 second").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.expr(msum2("value", SPARK)).alias("sv"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        rows = 0
        while time.time() < deadline:
            time.sleep(2)
            rows = spark.table("t_rate").count()
            if rows >= 7:
                break
        assert rows >= 7, f"rate stream produced only {rows} window rows"
    finally:
        q.stop()


def test_stream_upsert_converges_to_batch_compaction(spark, tmp_path):
    """Streaming MERGE: foreachBatch upserts each micro-batch's latest-wins
    rows into a keyed parquet state table; after draining the stream, that
    state must EQUAL the batch changelog compaction (pipeline_upsert_latest).
    This is the incremental-materialization contract: stream-maintained state
    == recompute-from-scratch."""
    from pyspark.sql import Window, functions as F

    from tmapreduce_spark.functions.text import pipeline_upsert_latest
    from tmapreduce_spark.streaming.events import stream_events

    state_dir = str(tmp_path / "state")

    def upsert(batch_df, batch_id: int) -> None:
        # latest-wins within the micro-batch, then merge against prior state
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        fresh = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id", "ts", "value")
        )
        try:
            prior = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            prior = None
        merged = fresh if prior is None else prior.unionByName(fresh)
        w2 = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        out = (
            merged.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # overwrite-by-rewrite (a real deployment uses a table format's MERGE;
        # the convergence contract under test is identical)
        out.cache().count()
        out.write.mode("overwrite").parquet(state_dir + ".tmp")
        batch_df.sparkSession.read.parquet(state_dir + ".tmp").write.mode(
            "overwrite"
        ).parquet(state_dir)

    q = (
        stream_events(spark, SF_SMOKE)
        .writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["event_type"]): (r["event_id"], r["last_epoch"])
        for r in spark.read.parquet(state_dir)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_timestamp("ts").cast("bigint").alias("last_epoch"),
        )
        .collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (r["last_event_id"], r["last_epoch"])
        for r in pipeline_upsert_latest(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_funnel_converges_to_batch_funnel(spark):
    """The stateful streaming funnel's final per-user stages must reproduce
    the batch events_funnel counts exactly: n_viewed = users at stage >= 1,
    n_clicked >= 2, n_purchased = 3 (in-order replay of the same events)."""
    from tmapreduce_spark.operators.relational import events_funnel
    from tmapreduce_spark.streaming.stateful import streaming_funnel

    s = streaming_funnel(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_funnel", output_mode="update")
    stages = {int(r["user_id"]): int(r["stage"]) for r in mem.collect()}
    got = (
        sum(1 for v in stages.values() if v >= 1),
        sum(1 for v in stages.values() if v >= 2),
        sum(1 for v in stages.values() if v >= 3),
    )
    want = events_funnel(spark, SF_SMOKE).collect()[0]
    assert got == (want["n_viewed"], want["n_clicked"], want["n_purchased"]), (got, want)


def test_ohlc_stream_matches_batch(spark):
    """Streaming OHLC (declarative min_by/max_by firsts/lasts) must equal
    the batch twin's row_number formulation under the same (ts, event_id)
    total order."""
    from tmapreduce_spark.operators.relational import events_ohlc_hourly
    from tmapreduce_spark.streaming.events import ohlc_hourly_stream

    s = ohlc_hourly_stream(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_ohlc", output_mode="complete")
    batch = events_ohlc_hourly(spark, SF_SMOKE)
    cols = ["event_type", "hour", "open", "high", "low", "close", "n_events"]
    assert _rows(mem, cols) == _rows(batch, cols)


def test_admit_stream_matches_batch_exact_stage(spark):
    """Stream-static anti-join admission must equal the equivalent batch
    exact-dedup stage (incoming batch anti-joined on content hash against
    the static corpus)."""
    from pyspark.sql import functions as F

    from tmapreduce_spark.streaming.events import admit_stream

    mem = run_stream_to_memory(
        spark, admit_stream(spark, SF_SMOKE), "t_admit", output_mode="append"
    )
    d = load_table(spark, SF_SMOKE, "documents")
    corp = d.filter(F.expr("doc_id % 5 != 0")).selectExpr("md5(text) AS h").distinct()
    batch = (
        d.filter(F.expr("doc_id % 5 = 0"))
        .selectExpr("doc_id", "lang", "n_chars", "md5(text) AS h")
        .join(corp, "h", "left_anti")
        .select("doc_id", "lang", "n_chars")
    )
    cols = ["doc_id", "lang", "n_chars"]
    assert mem.count() > 0
    assert _rows(mem, cols) == _rows(batch, cols)


def test_streaming_ewma_matches_unbounded_fold(spark):
    """Streaming EWMA (one double of state) must equal the full-history
    Python fold per user after in-order replay."""
    from tmapreduce_spark.streaming.stateful import streaming_ewma

    s = streaming_ewma(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_ewma", output_mode="update")
    got = {int(r["user_id"]): (int(r["n_events"]), r["ewma"]) for r in mem.collect()}

    e = load_table(spark, SF_SMOKE, "events")
    from pyspark.sql import functions as F

    per_user: dict[int, list] = {}
    for r in e.select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id", "value"
    ).collect():
        per_user.setdefault(int(r["user_id"]), []).append(
            (r["us"], r["event_id"], r["value"])
        )
    assert set(got) == set(per_user)
    for uid, evs in per_user.items():
        evs.sort()
        s_val = evs[0][2]
        for _, _, x in evs[1:]:
            s_val = s_val * 0.5 + x * 0.5
        n, ewma = got[uid]
        assert n == len(evs)
        assert abs(ewma - s_val) < 1e-9, (uid, ewma, s_val)


def test_streaming_attribution_matches_batch(spark):
    """Streaming last-touch attribution rows must EXACTLY equal the batch
    operator's output under in-order replay."""
    from tmapreduce_spark.operators.relational import events_attribution_last_touch
    from tmapreduce_spark.streaming.stateful import streaming_attribution

    s = streaming_attribution(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_attrib", output_mode="update")
    cols = [
        "user_id", "purchase_id", "purchase_us",
        "touch_id", "touch_type", "gap_us", "organic",
    ]
    got = sorted(tuple(r[c] for c in cols) for r in mem.collect())
    want = sorted(
        tuple(r[c] for c in cols)
        for r in events_attribution_last_touch(spark, SF_SMOKE).collect()
    )
    assert got == want


def test_streaming_heavy_hitters_superset_guarantee(spark):
    """The streaming MG summary must contain every user whose true count
    exceeds N/(MG_K+1) — the Misra-Gries guarantee — and its counters
    never exceed the true counts."""
    from pyspark.sql import functions as F

    from tmapreduce_spark.streaming.stateful import MG_K, streaming_heavy_hitters

    s = streaming_heavy_hitters(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_mg", output_mode="update")
    cand = {int(r["key"]): int(r["cnt"]) for r in mem.collect()}
    assert 0 < len(cand) <= MG_K

    e = load_table(spark, SF_SMOKE, "events")
    true_counts = {
        int(r["user_id"]): int(r["n"])
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(true_counts.values())
    for uid, n in true_counts.items():
        if n > n_total / (MG_K + 1):
            assert uid in cand, (uid, n)
    for uid, c in cand.items():
        assert c <= true_counts[uid]


def test_streaming_drawdown_matches_batch(spark):
    """Streaming drawdown (three int64s of state) must equal the batch
    `events_drawdown_max` rows exactly after in-order replay — the integer
    micro-unit state makes this an equality, not a tolerance, check."""
    from tmapreduce_spark.operators.analytics import events_drawdown_max
    from tmapreduce_spark.streaming.stateful import streaming_drawdown

    s = streaming_drawdown(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_drawdown", output_mode="update")
    got = {
        int(r["user_id"]): (r["max_drawdown"], r["peak_value"], r["final_value"])
        for r in mem.collect()
    }
    batch = {
        int(r["user_id"]): (r["max_drawdown"], r["peak_value"], r["final_value"])
        for r in events_drawdown_max(spark, SF_SMOKE).collect()
    }
    assert got == batch


def test_streaming_drawdown_fold_handles_negatives_like_batch(spark):
    """Regression for the negative-value divergence: the streaming fold's
    peak must seed at the FIRST cumulative sum (batch running-max
    semantics), and quantization must floor like cents() — a first value of
    -5.0 yields peak=-5.0, drawdown=0, and -1.23 lands on -1230000 micros."""
    import pandas as pd

    from tmapreduce_spark.operators.analytics import events_drawdown_max
    from tmapreduce_spark.streaming.stateful import drawdown_fold

    cum, peak, dd, started = drawdown_fold((0, 0, 0, False), [-5.0])
    assert (cum, peak, dd) == (-5_000_000, -5_000_000, 0)
    cum, peak, dd, started = drawdown_fold((0, 0, 0, False), [-1.23])
    assert cum == -1_230_000, "must floor like cents(), not truncate"
    # full-series equivalence vs the BATCH operator on a negative-going frame
    vals = [-5.0, 3.5, -10.25, 2.0, -0.01]
    pdf = pd.DataFrame(
        {
            "user_id": [1] * len(vals),
            "event_id": list(range(len(vals))),
            "ts": pd.to_datetime(
                [f"2024-01-01 00:0{i}:00" for i in range(len(vals))]
            ),
            "event_type": ["click"] * len(vals),
            "value": vals,
            "props": ["{}"] * len(vals),
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sf_dir = os.path.join(d, "sf")
        os.makedirs(sf_dir)
        spark.createDataFrame(pdf).write.parquet(os.path.join(sf_dir, "events.parquet"))
        batch = events_drawdown_max(spark, sf_dir).collect()[0]
    cum, peak, dd, _ = drawdown_fold((0, 0, 0, False), vals)
    assert round(batch["final_value"] * 1e6) == cum
    assert round(batch["peak_value"] * 1e6) == peak
    assert round(batch["max_drawdown"] * 1e6) == dd


def test_streaming_rate_spike_converges_to_batch(spark):
    """Streaming rate-spike twin: under in-order availableNow replay, the
    LAST emission per (event_type, hour) must equal the batch
    `events_rate_spike` row exactly — same counts, same mround ratio, same
    spike flag, and no (type, hour) keys the batch doesn't emit."""
    from tmapreduce_spark.operators.analytics import events_rate_spike
    from tmapreduce_spark.streaming.stateful import streaming_rate_spike

    s = streaming_rate_spike(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_rate_spike", output_mode="update")
    got = {}
    for r in mem.collect():  # insertion order: later batches overwrite
        got[(r["event_type"], int(r["hidx"]))] = (
            int(r["n"]), r["spike_ratio"], bool(r["is_spike"])
        )
    want = {
        (r["event_type"], int(r["hidx"])): (
            int(r["n"]), r["spike_ratio"], bool(r["is_spike"])
        )
        for r in events_rate_spike(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_sessionized_funnel_converges_to_batch(spark):
    """Streaming sessionized-funnel twin: after in-order availableNow
    replay, the LAST emission per user equals the batch
    `events_sessionized_funnel` row exactly — session counts, per-stage
    session counts, conversions, and the mround'd conversion rate."""
    from tmapreduce_spark.operators.analytics import events_sessionized_funnel
    from tmapreduce_spark.streaming.stateful import streaming_sessionized_funnel

    s = streaming_sessionized_funnel(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_sfunnel", output_mode="update")
    got = {}
    for r in mem.collect():  # later batches overwrite: last emission wins
        got[int(r["user_id"])] = (
            int(r["n_sessions"]), int(r["n_view_sessions"]),
            int(r["n_click_sessions"]), int(r["n_converted"]),
            r["session_cvr"],
        )
    want = {
        int(r["user_id"]): (
            int(r["n_sessions"]), int(r["n_view_sessions"]),
            int(r["n_click_sessions"]), int(r["n_converted"]),
            r["session_cvr"],
        )
        for r in events_sessionized_funnel(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_hdr_partials_merge_to_batch_percentiles(spark):
    """The mergeability claim of `agg_hdr_latency_percentiles`, executed:
    per-user streaming HDR partials merged by plain addition must
    reproduce the batch operator's percentile row exactly, and the python
    bin function must agree with the engine layout."""
    from collections import Counter

    from tmapreduce_spark.operators.analytics import agg_hdr_latency_percentiles
    from tmapreduce_spark.streaming.stateful import hdr_bin_lo, streaming_hdr_gaps

    s = streaming_hdr_gaps(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_hdr", output_mode="update")
    merged: Counter = Counter()
    max_gap = 0
    # update-mode emissions: the FINAL state per user is the one with the
    # most gaps recorded (n_gaps is monotone per user — arrival order of
    # memory-sink rows is an implementation detail, not a contract)
    per_user = {}
    for r in mem.collect():
        best = per_user.get(r["user_id"])
        if best is None or r["n_gaps"] > best["n_gaps"]:
            per_user[r["user_id"]] = r
    for r in per_user.values():
        merged.update(dict(zip(r["bin_los"], r["counts"])))
        max_gap = max(max_gap, r["max_gap"])
    n = sum(merged.values())

    def pick(q_thousandths: int) -> int:
        cum = 0
        for b in sorted(merged):
            cum += merged[b]
            if cum * 1000 >= q_thousandths * n:
                return b
        raise AssertionError("rank not reached")

    batch = agg_hdr_latency_percentiles(spark, SF_SMOKE).collect()[0]
    assert batch["n_gaps"] == n
    assert batch["max_ms"] == max_gap
    assert batch["p50_lo_ms"] == pick(500)
    assert batch["p90_lo_ms"] == pick(900)
    assert batch["p99_lo_ms"] == pick(990)
    assert batch["p999_lo_ms"] == pick(999)
    # the shared bin function matches the engine layout on every edge:
    # sub-bucket boundaries, exact small values, power-of-two corners
    for g in [0, 1, 7, 8, 9, 15, 16, 17, 127, 128, 1023, 1024, 123456789]:
        lo = hdr_bin_lo(g)
        assert lo <= g < (lo + max(1, lo // 8) if g >= 8 else lo + 1), (g, lo)


def test_streaming_rolling_p90_converges_to_batch_last_row(spark):
    """The streaming rolling-p90 twin's final emission per user must equal
    the batch `window_rolling_p90` row at that user's max seq — same gap,
    same window size, same exact lower-percentile pick."""
    from tmapreduce_spark.operators.windows import window_rolling_p90
    from tmapreduce_spark.streaming.stateful import streaming_rolling_p90

    s = streaming_rolling_p90(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_rollp90", output_mode="update")
    final = {}
    for r in mem.collect():
        best = final.get(r["user_id"])
        if best is None or r["seq"] > best["seq"]:
            final[r["user_id"]] = r

    batch = window_rolling_p90(spark, SF_SMOKE).toPandas()
    last = batch.loc[batch.groupby("user_id")["seq"].idxmax()].set_index("user_id")
    assert set(final) == set(last.index)
    for uid, r in final.items():
        b = last.loc[uid]
        assert r["seq"] == b["seq"], uid
        assert r["gap_us"] == b["gap_us"], uid
        assert r["n_window"] == b["n_window"], uid
        assert r["p90_gap_us"] == b["p90_gap_us"], uid


def test_streaming_peak_detect_converges_to_batch_peaks(spark):
    """The streaming peak twin's final emission (the one covering the most
    hours) must list exactly the batch `window_peak_detect` rows. Counts
    are commutative increments, so this holds under any arrival order."""
    from tmapreduce_spark.operators.analytics import window_peak_detect
    from tmapreduce_spark.streaming.stateful import streaming_peak_detect

    s = streaming_peak_detect(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_peaks", output_mode="update")
    rows = mem.collect()
    assert rows
    final = max(rows, key=lambda r: r["n_hours"])
    got = sorted(
        zip(final["peak_hidx"], final["peak_height"], final["prominence"])
    )
    batch = sorted(
        (r["hidx"], r["peak_height"], r["prominence"])
        for r in window_peak_detect(spark, SF_SMOKE).collect()
    )
    assert got == batch


def test_streaming_scd2_duplicate_redelivery_is_idempotent():
    """At-least-once redelivery of the LAST processed row must be a no-op
    (r8 ADVICE): the cursor guard skips on <=, not <, since o_orderkey is
    unique — an equal (od, okey) cursor is always a duplicate. Without the
    equality n_seen drifts from rows-seen while the run-length history
    stays correct, so pin n_seen directly."""
    import pandas as pd

    from tmapreduce_spark.streaming.stateful import _update_scd2_state

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    def feed(state, rows):
        pdf = pd.DataFrame(
            rows, columns=["o_custkey", "o_orderkey", "o_orderstatus", "od"]
        )
        return list(_update_scd2_state((7,), iter([pdf]), state))[0]

    st = FakeState()
    out1 = feed(st, [(7, 1, "O", "2024-01-01"), (7, 2, "F", "2024-01-02")])
    assert out1["n_seen"].iloc[0] == 2
    assert list(out1["statuses"].iloc[0]) == ["O", "F"]
    # redeliver the exact last row (equal cursor) plus one stale earlier row
    out2 = feed(st, [(7, 2, "F", "2024-01-02"), (7, 1, "O", "2024-01-01")])
    assert out2["n_seen"].iloc[0] == 2, "duplicate delivery must not drift n_seen"
    assert list(out2["statuses"].iloc[0]) == ["O", "F"]
    assert list(out2["valid_froms"].iloc[0]) == ["2024-01-01", "2024-01-02"]
    # genuinely new rows still advance
    out3 = feed(st, [(7, 3, "O", "2024-01-03")])
    assert out3["n_seen"].iloc[0] == 3
    assert list(out3["statuses"].iloc[0]) == ["O", "F", "O"]


def test_streaming_scd2_converges_to_batch_history(spark):
    """The streaming SCD2 twin's final emission per customer (the run-length
    status history carried as state) must equal the batch
    `pipeline_scd2_orders_status` rows exactly — versions, statuses,
    valid_from chain, open-ended current row."""
    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.streaming.events import stream_orders
    from tmapreduce_spark.streaming.stateful import streaming_scd2

    s = streaming_scd2(stream_orders(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_scd2", output_mode="update")
    final = {}
    for r in mem.collect():
        best = final.get(r["o_custkey"])
        if best is None or r["n_seen"] > best["n_seen"]:
            final[r["o_custkey"]] = r

    batch = (
        build_catalog()["pipeline_scd2_orders_status"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["o_custkey", "version"])
    )
    assert set(final) == set(batch["o_custkey"].unique())
    for cust, g in batch.groupby("o_custkey"):
        r = final[cust]
        assert list(r["statuses"]) == g["o_orderstatus"].tolist(), cust
        assert list(r["valid_froms"]) == g["valid_from"].tolist(), cust
        # valid_to / is_current are derivable from the run list — check the
        # chain the batch emitted matches the streamed run boundaries
        vt = g["valid_to"].tolist()
        assert vt[:-1] == list(r["valid_froms"])[1:], cust
        assert g["is_current"].tolist()[-1] == 1, cust


def test_streaming_cuped_partials_merge_to_batch_lift(spark):
    """The mergeability claim of `events_cuped_lift`, executed: per-user
    streaming (x, y) int64 partials — commutative sums, so order-proof —
    merged through the identical CUPED algebra must reproduce the batch
    row exactly (all six reported statistics, to the same 1e-6 rounding)."""
    import math

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.streaming.stateful import streaming_cuped_moments

    s = streaming_cuped_moments(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_cuped", output_mode="update")
    # final state per user = the emission with the most purchases recorded
    per_user = {}
    for r in mem.collect():
        best = per_user.get(r["user_id"])
        if best is None or r["n_purchases"] > best["n_purchases"]:
            per_user[r["user_id"]] = r
    n = len(per_user)
    sx = sum(r["x_milli"] for r in per_user.values())
    sy = sum(r["y_milli"] for r in per_user.values())
    sxx = sum(r["x_milli"] ** 2 for r in per_user.values())
    syy = sum(r["y_milli"] ** 2 for r in per_user.values())
    sxy = sum(r["x_milli"] * r["y_milli"] for r in per_user.values())
    arms = {1: [0, 0, 0], 0: [0, 0, 0]}  # n, sx, sy
    for r in per_user.values():
        a = arms[r["treat"]]
        a[0] += 1
        a[1] += r["x_milli"]
        a[2] += r["y_milli"]

    def mr6(v: float) -> float:
        return math.floor(v * 1e6 + 0.5) / 1e6

    cxx = sxx - sx * sx / n
    cyy = syy - sy * sy / n
    cxy = sxy - sx * sy / n
    theta = cxy / cxx
    rho = cxy / math.sqrt(cxx * cyy)
    lift_raw = (arms[1][2] / arms[1][0] - arms[0][2] / arms[0][0]) / 1000
    lift_adj = lift_raw - theta * (
        (arms[1][1] / arms[1][0] - arms[0][1] / arms[0][0]) / 1000
    )
    batch = build_catalog()["events_cuped_lift"].fn(spark, SF_SMOKE).collect()[0]
    assert batch["n_users"] == n
    assert batch["n_treat"] == arms[1][0] and batch["n_ctrl"] == arms[0][0]
    assert batch["theta"] == mr6(theta)
    assert batch["rho_pre_post"] == mr6(rho)
    assert batch["lift_raw"] == mr6(lift_raw)
    assert batch["lift_adjusted"] == mr6(lift_adj)
    assert batch["var_ratio"] == mr6(1 - rho * rho)


def test_streaming_did_cells_merge_to_batch_contrast(spark):
    """The DiD design-cell mergeability claim, executed: the six streaming
    (treat, per) int64 cell partials — commutative, so order-proof —
    recombined through the identical contrast algebra must reproduce the
    batch `events_did_lift` row exactly at the output rounding."""
    import math

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.streaming.stateful import streaming_did_cells

    s = streaming_did_cells(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_did", output_mode="update")
    cells = {}
    for r in mem.collect():
        k = (r["treat"], r["per"])
        best = cells.get(k)
        if best is None or r["n"] > best["n"]:
            cells[k] = r

    def nc(t, p):
        return cells[(t, p)]["n"] if (t, p) in cells else 0

    def sc(t, p):
        return cells[(t, p)]["s_micro"] if (t, p) in cells else 0

    def mean(t, which):
        if which == "pre":
            return (sc(t, 0) + sc(t, 1)) / 1e6 / (nc(t, 0) + nc(t, 1))
        p = {"pre1": 0, "pre2": 1, "post": 2}[which]
        return sc(t, p) / 1e6 / nc(t, p)

    def mr6(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    batch = build_catalog()["events_did_lift"].fn(spark, SF_SMOKE).collect()[0]
    assert batch["n_treat_pre"] == nc(1, 0) + nc(1, 1)
    assert batch["n_treat_post"] == nc(1, 2)
    assert batch["n_ctrl_pre"] == nc(0, 0) + nc(0, 1)
    assert batch["n_ctrl_post"] == nc(0, 2)
    assert batch["mean_treat_pre"] == mr6(mean(1, "pre"))
    assert batch["mean_ctrl_post"] == mr6(mean(0, "post"))
    did = (mean(1, "post") - mean(1, "pre")) - (mean(0, "post") - mean(0, "pre"))
    placebo = (mean(1, "pre2") - mean(1, "pre1")) - (
        mean(0, "pre2") - mean(0, "pre1")
    )
    assert batch["did_estimate"] == mr6(did)
    assert batch["placebo_did"] == mr6(placebo)


def test_streaming_jb_partials_merge_to_batch_moments(spark):
    """The Jarque-Bera mergeability claim, executed: per-type streaming
    power-sum partials — commutative int64 sums, so order-proof — pushed
    through the identical moment algebra must reproduce the batch
    `agg_jarque_bera` rows exactly at the output rounding."""
    import math

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.streaming.stateful import streaming_jb_moments

    s = streaming_jb_moments(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_jb", output_mode="update")
    per_type = {}
    for r in mem.collect():
        best = per_type.get(r["event_type"])
        if best is None or r["n"] > best["n"]:
            per_type[r["event_type"]] = r

    def mr6(v: float) -> float:
        return math.floor(v * 1e6 + 0.5) / 1e6

    batch = {
        r["event_type"]: r
        for r in build_catalog()["agg_jarque_bera"].fn(spark, SF_SMOKE).collect()
    }
    assert sorted(per_type) == sorted(batch)
    for t, r in per_type.items():
        n, s1, s2, s3, s4 = r["n"], r["s1"], r["s2"], r["s3"], r["s4"]
        m1 = s1 / n
        m2 = s2 / n - m1 * m1
        m3 = s3 / n - 3 * m1 * (s2 / n) + 2 * m1**3
        m4 = s4 / n - 4 * m1 * (s3 / n) + 6 * m1 * m1 * (s2 / n) - 3 * m1**4
        g1 = m3 / (m2 * math.sqrt(m2))
        g2 = m4 / (m2 * m2) - 3
        jb = n / 6 * (g1 * g1 + g2 * g2 / 4)
        b = batch[t]
        assert b["n"] == n, t
        assert abs(b["skewness"] - mr6(g1)) <= 1e-6, t
        assert abs(b["kurtosis_excess"] - mr6(g2)) <= 1e-6, t
        assert abs(b["jb_stat"] - jb) <= max(1e-4, 1e-6 * abs(jb)), t


def test_streaming_conversion_flags_merge_to_batch_ztest(spark):
    """The conversion-cell mergeability claim, executed: per-user streaming
    converted flags — idempotent max state, so duplicate delivery AND
    reordering are both harmless — recombined through the identical pooled
    two-proportion algebra must reproduce the batch z-test row exactly."""
    import math

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.streaming.stateful import streaming_conversion_flags

    s = streaming_conversion_flags(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_conv", output_mode="update")
    per_user = {}
    for r in mem.collect():
        prev = per_user.get(r["user_id"])
        # max-merge across emissions: later batches can only raise the flag
        if prev is None or r["converted"] > prev["converted"]:
            per_user[r["user_id"]] = r
    arms = {1: [0, 0], 0: [0, 0]}  # n, x
    for r in per_user.values():
        arms[r["treat"]][0] += 1
        arms[r["treat"]][1] += r["converted"]
    batch = (
        build_catalog()["events_conversion_ztest"].fn(spark, SF_SMOKE).collect()[0]
    )
    assert batch["n_treat"] == arms[1][0] and batch["x_treat"] == arms[1][1]
    assert batch["n_ctrl"] == arms[0][0] and batch["x_ctrl"] == arms[0][1]
    n1, x1 = arms[1]
    n0, x0 = arms[0]
    p1, p0, pp = x1 / n1, x0 / n0, (x1 + x0) / (n1 + n0)
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n0))

    def mr6(v: float) -> float:
        return math.floor(v * 1e6 + 0.5) / 1e6

    assert batch["z_stat"] == mr6(z)
    assert batch["rate_treat"] == mr6(p1) and batch["rate_ctrl"] == mr6(p0)


def test_launch_stream_source_matches_engine_results(spark, tmp_path):
    """The streaming twin of the REST ingest path (r09 verdict #4): payloads
    POSTed to the gateway's /launch land in a spool that a Spark 4 streaming
    Python DataSource replays into Structured Streaming — the streamed
    wordcount aggregation must equal MapReduceEngine.launch's results for
    every job, a REJECTED launch must never reach the stream, and
    readBetweenOffsets must replay a committed range byte-identically."""
    import json
    import urllib.error
    import urllib.request

    from pyspark.sql import functions as F

    from tmapreduce_spark.gateway import Gateway
    from tmapreduce_spark.mapreduce import MapReduceEngine
    from tmapreduce_spark.sources.stream_launch import (
        LaunchSpool,
        LaunchStreamReader,
        read_launch_stream,
    )

    spool_dir = str(tmp_path / "spool")
    engine = MapReduceEngine(spark)
    spool = LaunchSpool(spool_dir)
    payloads = [
        [{"key": "a", "value": "hello world hello"}, {"key": "b", "value": "world"}],
        [{"key": "c", "value": "spark streams the launch queue"}],
    ]
    job_ids = []
    with Gateway(engine, spool=spool) as gw:
        base = f"http://127.0.0.1:{gw.port}"
        for i, kvs in enumerate(payloads):
            body = json.dumps(
                {"name": f"job{i}", "type": "wordcount", "mapper_num": 2,
                 "reducer_num": 2, "token": "tok", "kvs": kvs}
            ).encode()
            req = urllib.request.Request(
                f"{base}/launch", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                doc = json.load(resp)
            assert doc["ok"]
            job_ids.append(doc["job_id"])
        # a master-rejected launch (empty kvs) must NOT be spooled
        bad = json.dumps(
            {"name": "bad", "type": "wordcount", "mapper_num": 2,
             "reducer_num": 2, "token": "tok", "kvs": []}
        ).encode()
        req = urllib.request.Request(
            f"{base}/launch", data=bad, headers={"Content-Type": "application/json"}
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("empty kvs should be rejected")
        except urllib.error.HTTPError as exc:
            assert exc.code == 500

    # the streaming twin: same whitespace wordcount per job over the stream
    sdf = read_launch_stream(spark, spool_dir)
    assert sdf.isStreaming
    counts = (
        sdf.select("name", F.explode(F.split("value", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("name", "w")
        .agg(F.count("*").alias("n"))
    )
    mem = run_stream_to_memory(spark, counts, "t_launchstream", output_mode="complete")
    got: dict[str, dict[str, int]] = {}
    for r in mem.collect():
        got.setdefault(r["name"], {})[r["w"]] = r["n"]
    assert set(got) == {"job0", "job1"}  # the rejected launch never streamed

    for i, job_id in enumerate(job_ids):
        engine.wait(job_id)
        flat = engine.get_result(job_id, "tok")
        engine_counts = {
            w: int(c) for w, c in zip(flat[::2], flat[1::2])
        }
        assert got[f"job{i}"] == engine_counts

    # exactly-once replay: readBetweenOffsets re-reads the committed range
    reader = LaunchStreamReader({"path": spool_dir})
    first, off = reader.read(reader.initialOffset())
    rows1 = sorted(first)
    assert off == {"seq": 2}
    rows2 = sorted(reader.readBetweenOffsets({"seq": 0}, off))
    assert rows1 == rows2
    assert {r[1] for r in rows1} == {"job0", "job1"}


def test_streaming_circadian_partials_merge_to_batch_profile(spark):
    """14th applyInPandasWithState twin: per-type hourly count vectors —
    additive commutative int64 state — merged through the identical
    literal unit-vector algebra must reproduce events_circadian_profile's
    batch rows exactly."""
    import math

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.operators.analytics import _CIRC_VALUES
    from tmapreduce_spark.streaming.stateful import streaming_circadian_partials

    s = streaming_circadian_partials(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_circ", output_mode="update")
    # max-merge across update emissions: counts only grow, so the LAST
    # (largest-total) emission per type is the final state
    final = {}
    for r in mem.collect():
        cur = final.get(r["event_type"])
        if cur is None or sum(r["hour_counts"]) > sum(cur):
            final[r["event_type"]] = list(r["hour_counts"])
    # the literal trig table (exact doubles parsed from repr strings)
    import re

    trig = {}
    for m in re.finditer(r"\((\d+), CAST\('([^']+)' AS DOUBLE\),"
                         r" CAST\('([^']+)' AS DOUBLE\)\)", _CIRC_VALUES):
        trig[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    batch = (
        build_catalog()["events_circadian_profile"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("event_type")
    )
    assert set(final) == set(batch.index)
    for t, h in final.items():
        n = sum(h)
        c9 = sum(math.floor(cnt * trig[hod][0] * 1e9 + 0.5)
                 for hod, cnt in enumerate(h))
        s9 = sum(math.floor(cnt * trig[hod][1] * 1e9 + 0.5)
                 for hod, cnt in enumerate(h))
        x, y = c9 / 1e9 / n, s9 / 1e9 / n
        r = math.sqrt(x * x + y * y)
        row = batch.loc[t]
        assert row.n == n
        assert row.mean_x == math.floor(x * 1e6 + 0.5) / 1e6
        assert row.mean_y == math.floor(y * 1e6 + 0.5) / 1e6
        assert row.resultant_r == math.floor(r * 1e6 + 0.5) / 1e6


def test_streaming_slo_counts_merge_to_batch_burn(spark):
    """15th twin: (n, n_err) cells per 6-hour window — additive commutative
    state — pushed through the identical burn/flag algebra must equal
    events_slo_burn_rate's batch rows."""
    import math

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.streaming.stateful import streaming_slo_window_counts

    s = streaming_slo_window_counts(stream_events(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_slo", output_mode="update")
    final = {}
    for r in mem.collect():
        cur = final.get(r["widx"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["widx"]] = (r["n_events"], r["n_errors"])
    batch = build_catalog()["events_slo_burn_rate"].fn(spark, SF_SMOKE).toPandas()
    assert len(batch) == len(final)
    # reconstruct each window's rendered (day, hour) key for the join
    import datetime

    for w, (n, e) in final.items():
        day = datetime.date(1970, 1, 1) + datetime.timedelta(days=(w * 6) // 24)
        hour = (w * 6) % 24
        sub = batch[(batch.window_day == day.strftime("%Y-%m-%d"))
                    & (batch.window_hour == hour)]
        assert len(sub) == 1
        row = sub.iloc[0]
        assert row.n_events == n and row.n_errors == e
        assert row.burn_rate == math.floor(4 * e / n * 1e6 + 0.5) / 1e6
        assert row.fast_burn == (1 if 40 * e > 12 * n else 0)


def test_streaming_gtest_cells_merge_to_batch_statistic(spark):
    """16th twin: per-(priority, status) contingency counts — additive
    commutative state over the order feed — pushed through the identical
    grid-rounded likelihood-ratio algebra must reproduce
    agg_gtest_independence's batch row exactly."""
    import math

    from tmapreduce_spark.catalog import build_catalog
    from tmapreduce_spark.streaming.events import stream_orders
    from tmapreduce_spark.streaming.stateful import streaming_gtest_cells

    s = streaming_gtest_cells(stream_orders(spark, SF_SMOKE))
    mem = run_stream_to_memory(spark, s, "t_gtest", output_mode="update")
    cells = {}
    for r in mem.collect():
        k = (r["o_orderpriority"], r["o_orderstatus"])
        cells[k] = max(cells.get(k, 0), r["n"])  # counts only grow
    n = sum(cells.values())
    rowm: dict[str, int] = {}
    colm: dict[str, int] = {}
    for (p, st), c in cells.items():
        rowm[p] = rowm.get(p, 0) + c
        colm[st] = colm.get(st, 0) + c
    g9 = sum(
        math.floor(c * math.log(c * n / (rowm[p] * colm[st])) * 1e9 + 0.5)
        for (p, st), c in cells.items()
    )
    g = math.floor(2 * g9 / 1e9 * 1e6 + 0.5) / 1e6
    batch = build_catalog()["agg_gtest_independence"].fn(spark, SF_SMOKE).toPandas().iloc[0]
    assert batch.n == n
    assert batch.n_priorities == len(rowm) and batch.n_statuses == len(colm)
    assert batch.dof == (len(rowm) - 1) * (len(colm) - 1)
    assert batch.g_stat == g


def test_launch_spool_concurrent_appends_never_collide():
    """The gateway serves /launch on concurrent threads — unsynchronized
    appends could compute the same sequence and the POSIX rename would
    silently replace a payload (a lost launch). Hammer the spool from many
    threads and assert every payload survives under a dense sequence."""
    import json as _json
    import os
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from tmapreduce_spark.sources.stream_launch import LaunchSpool

    with tempfile.TemporaryDirectory() as d:
        spool = LaunchSpool(d)
        n = 64
        with ThreadPoolExecutor(max_workers=16) as ex:
            seqs = list(
                ex.map(
                    lambda i: spool.append(f"job{i}", "wordcount", [("k", str(i))]),
                    range(n),
                )
            )
        assert sorted(seqs) == list(range(n))  # dense, no collisions
        files = sorted(f for f in os.listdir(d) if f.endswith(".json"))
        assert len(files) == n
        payloads = set()
        for f in files:
            with open(os.path.join(d, f)) as fh:
                payloads.add(_json.load(fh)["name"])
        assert len(payloads) == n  # nothing was overwritten


# ---------------------------------------------------------------------------
# Replay-class table (r10 verdict #4): every applyInPandasWithState updater
# is assigned an arrival-order equality class, and each class carries a
# replay test. The table is asserted COMPLETE against the module, so a new
# twin cannot land without declaring its class.
#
#   ADDITIVE   — commutative int64/count accumulation: the final state is
#                identical under ANY arrival order (exactly-once assumed).
#   IDEMPOTENT — max-flag state: duplicates AND reordering are harmless
#                (at-least-once safe), the strongest class.
#   GUARANTEE  — the summary itself is order-dependent, but an invariant
#                (Misra-Gries superset) holds under any order.
#   ORDERED    — in-batch event-time sort + an explicit cross-batch
#                late-arrival policy:
#                  fold    = late rows fold at arrival position
#                  discard = rows behind the emitted cursor are dropped
#   BOUNDED    — additive within the retained calendar window; lateness
#                beyond the window re-opens partial buckets (state stays
#                calendar-bounded).
# ---------------------------------------------------------------------------

import pandas as _rc_pd


class _RCState:
    """Minimal GroupState stub (the scd2 duplicate-redelivery pattern)."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def _rc_feed(update_fn, key, columns, state, rows):
    pdf = _rc_pd.DataFrame(rows, columns=columns)
    out = list(update_fn(key, iter([pdf]), state))
    return out[0] if out else None


def _rc_run(update_fn, key, columns, batches):
    st = _RCState()
    last = None
    for rows in batches:
        if rows:
            last = _rc_feed(update_fn, key, columns, st, rows)
    return st._v, last


def _rc_run_all(update_fn, key, columns, batches):
    st = _RCState()
    emitted = []
    for rows in batches:
        if rows:
            out = _rc_feed(update_fn, key, columns, st, rows)
            if out is not None and len(out):
                emitted.append(out)
    return st._v, _rc_pd.concat(emitted, ignore_index=True) if emitted else None


_TS0 = 1_700_000_000_000_000  # µs epoch base for crafted rows

REPLAY_CLASS_TABLE = {
    # updater name -> (class, key, columns, in-order rows)
    "_update_user_state": ("ADDITIVE", (1,), ["value"],
                           [(1.0,), (2.5,), (4.0,), (0.5,)]),
    "_update_cuped_state": ("ADDITIVE", (2,), ["value", "ts_us"], None),
    "_update_did_state": ("ADDITIVE", (1, 2), ["value"],
                          [(10.0,), (20.0,), (5.5,)]),
    "_update_jb_state": ("ADDITIVE", ("view",), ["value"],
                         [(3.0,), (7.0,), (11.0,), (2.0,)]),
    "_update_circ_state": ("ADDITIVE", ("view",), ["ts"], None),
    "_update_slo_state": ("ADDITIVE", (3,), ["event_type"],
                          [("view",), ("error",), ("view",), ("error",)]),
    "_update_gtest_state": ("ADDITIVE", ("1-URGENT", "O"), ["x"],
                            [(1,), (2,), (3,)]),
    "_update_peaks_state": ("ADDITIVE", (0,), ["hidx"],
                            [(h,) for h in [5, 5, 5, 6, 3, 4, 8, 2, 7, 5]]),
    "_update_spike_state": ("BOUNDED", ("view",), ["hidx"],
                            [(h,) for h in [1, 1, 2, 2, 2, 3, 4, 4, 5, 5, 5, 5]]),
    "_update_conv_state": ("IDEMPOTENT", (4,), ["event_type", "value"],
                           [("view", 10.0), ("purchase", 250.0), ("click", 1.0)]),
    "_update_mg_state": ("GUARANTEE", (0,), ["user_id"], None),
    "_update_funnel_state": ("ORDERED:fold", (1,), ["event_type", "ts_us"], None),
    "_update_ewma_state": ("ORDERED:fold", (1,), ["ts_us", "event_id", "value"], None),
    "_update_attrib_state": ("ORDERED:fold", (1,),
                             ["event_id", "event_type", "ts_us"], None),
    "_update_drawdown_state": ("ORDERED:fold", (1,),
                               ["ts_us", "event_id", "value"], None),
    "_update_sfunnel_state": ("ORDERED:fold", (1,),
                              ["event_type", "ts_us", "event_id"], None),
    "_update_hdr_state": ("ORDERED:discard", (1,), ["ts_us", "event_id"], None),
    "_update_rollp90_state": ("ORDERED:discard", (1,), ["ts_us", "event_id"], None),
    "_update_scd2_state": ("ORDERED:discard", (7,),
                           ["o_custkey", "o_orderkey", "o_orderstatus", "od"], None),
}


def test_replay_class_table_is_complete():
    """Every _update_*_state in the stateful module has exactly one class
    row — a new twin cannot land unclassified."""
    import tmapreduce_spark.streaming.stateful as S

    updaters = {n for n in dir(S) if n.startswith("_update_") and n.endswith("_state")}
    assert updaters == set(REPLAY_CLASS_TABLE), (
        updaters ^ set(REPLAY_CLASS_TABLE)
    )


def _rc_rows_for(name):
    import tmapreduce_spark.streaming.stateful as S  # noqa: F401
    from tmapreduce_spark.operators.analytics import _DID_POST_US

    cls, key, cols, rows = REPLAY_CLASS_TABLE[name]
    if rows is not None:
        return key, cols, rows
    if name == "_update_cuped_state":
        return key, cols, [
            (10.0, _DID_POST_US - 1_000_000),
            (30.0, _DID_POST_US + 1_000_000),
            (5.0, _DID_POST_US - 2_000_000),
            (7.5, _DID_POST_US + 2_000_000),
        ]
    if name == "_update_circ_state":
        ts = _rc_pd.to_datetime(
            ["2024-01-01 03:15", "2024-01-01 03:40", "2024-01-02 17:05",
             "2024-01-03 03:59", "2024-01-02 22:10"]
        )
        return key, cols, [(t,) for t in ts]
    raise AssertionError(name)


def test_additive_twins_are_arrival_order_invariant():
    """ADDITIVE class: final state identical for in-order single-batch vs
    reversed + interleaved multi-batch delivery of the same rows."""
    import tmapreduce_spark.streaming.stateful as S

    for name, (cls, *_rest) in sorted(REPLAY_CLASS_TABLE.items()):
        if cls != "ADDITIVE":
            continue
        key, cols, rows = _rc_rows_for(name)
        fn = getattr(S, name)
        st_inorder, _ = _rc_run(fn, key, cols, [rows])
        shuffled = list(reversed(rows))
        mid = len(shuffled) // 2
        st_replay, _ = _rc_run(
            fn, key, cols, [shuffled[mid:], [], shuffled[:mid]]
        )
        assert st_inorder == st_replay, name


def test_bounded_twin_converges_within_lateness_window():
    """BOUNDED class (rate spike): any arrival order of rows whose hours
    fit inside the 24 h retention window yields the same final state."""
    import tmapreduce_spark.streaming.stateful as S

    key, cols, rows = _rc_rows_for("_update_spike_state")
    fn = S._update_spike_state
    st_inorder, _ = _rc_run(fn, key, cols, [rows])
    shuffled = sorted(rows, key=lambda r: (-r[0], r))
    st_replay, _ = _rc_run(fn, key, cols, [shuffled[::2], shuffled[1::2]])
    assert dict(zip(*st_inorder)) == dict(zip(*st_replay))


def test_idempotent_twin_tolerates_duplicates_and_reorder():
    """IDEMPOTENT class (conversion flags): duplicated AND reordered
    delivery converges to the same flag — at-least-once safe."""
    import tmapreduce_spark.streaming.stateful as S

    key, cols, rows = _rc_rows_for("_update_conv_state")
    fn = S._update_conv_state
    st_a, out_a = _rc_run(fn, key, cols, [rows])
    dup = list(reversed(rows)) + rows + rows[:1]
    st_b, out_b = _rc_run(fn, key, cols, [dup[:2], dup[2:]])
    assert st_a == st_b
    assert out_a["converted"].iloc[0] == out_b["converted"].iloc[0] == 1


def test_mg_guarantee_holds_under_any_order():
    """GUARANTEE class (Misra-Gries): the candidate SET may differ across
    orders, but any key with true frequency > N/(K+1) survives in every
    replay order."""
    import tmapreduce_spark.streaming.stateful as S
    from tmapreduce_spark.streaming.stateful import MG_K

    heavy = [(1,)] * 40          # true frequency 40 of N=76 >> N/(K+1)
    noise = [(k,) for k in range(2, 38)]  # 36 singletons
    rows = heavy + noise
    for batches in (
        [rows],
        [list(reversed(rows))],
        [noise[:18] + heavy[:20], heavy[20:] + noise[18:]],
    ):
        st, _ = _rc_run(S._update_mg_state, (0,), ["user_id"], batches)
        ids, counts = st
        assert 1 in ids, batches[0][:3]


def test_ordered_twins_batch_split_invariant_under_in_order_delivery():
    """ORDERED class: with in-order delivery, the final emission does not
    depend on micro-batch boundaries or on WITHIN-batch row order (each
    updater sorts its batch by event time)."""
    import tmapreduce_spark.streaming.stateful as S

    cases = {
        "_update_funnel_state": [
            ("view", _TS0), ("click", _TS0 + 10_000_000),
            ("purchase", _TS0 + 20_000_000),
        ],
        "_update_ewma_state": [
            (_TS0, 1, 10.0), (_TS0 + 1, 2, 20.0), (_TS0 + 2, 3, 0.0),
        ],
        "_update_attrib_state": [
            (1, "click", _TS0), (2, "purchase", _TS0 + 5_000_000),
            (3, "view", _TS0 + 6_000_000), (4, "purchase", _TS0 + 9_000_000),
        ],
        "_update_drawdown_state": [
            (_TS0, 1, 5.0), (_TS0 + 1, 2, -3.0), (_TS0 + 2, 3, 1.0),
            (_TS0 + 3, 4, -6.0),
        ],
        "_update_sfunnel_state": [
            ("view", _TS0, 1), ("click", _TS0 + 1_000_000, 2),
            ("purchase", _TS0 + 2_000_000, 3),
            ("view", _TS0 + 5_000_000_000, 4),
        ],
        "_update_hdr_state": [
            (_TS0, 1), (_TS0 + 4_000_000, 2), (_TS0 + 5_000_000, 3),
            (_TS0 + 90_000_000, 4),
        ],
        "_update_rollp90_state": [
            (_TS0, 1), (_TS0 + 1_000_000, 2), (_TS0 + 9_000_000, 3),
            (_TS0 + 10_000_000, 4),
        ],
        "_update_scd2_state": [
            (7, 1, "O", "2024-01-01"), (7, 2, "F", "2024-01-02"),
            (7, 3, "F", "2024-01-03"), (7, 4, "P", "2024-01-04"),
        ],
    }
    for name, rows in sorted(cases.items()):
        cls, key, cols, _ = REPLAY_CLASS_TABLE[name]
        assert cls.startswith("ORDERED"), name
        fn = getattr(S, name)
        # attribution emits one row PER PURCHASE per batch, so compare the
        # concatenation of all emissions; the running twins emit their full
        # current state each batch, so compare the final emission.
        runner = _rc_run_all if name == "_update_attrib_state" else _rc_run
        st_one, out_one = runner(fn, key, cols, [rows])
        # same event-time order, different batch boundaries, each batch
        # internally shuffled (the in-batch sort must absorb it)
        st_many, out_many = runner(
            fn, key, cols, [list(reversed(rows[:2])), list(reversed(rows[2:]))]
        )
        assert st_one == st_many, name
        _rc_pd.testing.assert_frame_equal(out_one, out_many)


def test_discard_twins_drop_rows_behind_the_emitted_cursor():
    """ORDERED:discard — a row arriving in a LATER batch with an earlier
    event time than already-emitted state is dropped: the final state
    equals the run that never saw the late row. (scd2's cursor variant is
    pinned by test_streaming_scd2_duplicate_redelivery_is_idempotent.)"""
    import tmapreduce_spark.streaming.stateful as S

    for name, late_row in (
        ("_update_hdr_state", (_TS0 + 2_000_000, 9)),
        ("_update_rollp90_state", (_TS0 + 2_000_000, 9)),
    ):
        _, key, cols, _ = REPLAY_CLASS_TABLE[name]
        fn = getattr(S, name)
        rows = [(_TS0, 1), (_TS0 + 4_000_000, 2), (_TS0 + 7_000_000, 3)]
        st_clean, _ = _rc_run(fn, key, cols, [rows])
        st_late, _ = _rc_run(fn, key, cols, [rows, [late_row]])
        assert st_clean == st_late, name


def test_fold_twins_apply_late_rows_at_arrival_position():
    """ORDERED:fold — the documented policies, each pinned explicitly:
    EWMA folds the late value last; drawdown keeps cum exact (commutative
    sum) while peak/dd reflect arrival order; attribution never
    retro-credits an emitted purchase; the funnels never regress stage."""
    import math

    import tmapreduce_spark.streaming.stateful as S

    # EWMA: late row (earlier ts) in a second batch folds LAST
    key, cols = (1,), ["ts_us", "event_id", "value"]
    st, out = _rc_run(
        S._update_ewma_state, key, cols,
        [[(_TS0 + 1, 2, 20.0), (_TS0 + 2, 3, 0.0)], [(_TS0, 1, 10.0)]],
    )
    expect = ((20.0 * 0.5 + 0.0 * 0.5) * 0.5) + 10.0 * 0.5
    assert math.isclose(st[1], expect)

    # drawdown: cum invariant under the late delivery, dd is arrival-order
    cols_dd = ["ts_us", "event_id", "value"]
    in_order = [(_TS0, 1, 5.0), (_TS0 + 1, 2, -3.0), (_TS0 + 2, 3, 4.0)]
    st_in, _ = _rc_run(S._update_drawdown_state, key, cols_dd, [in_order])
    st_late, _ = _rc_run(
        S._update_drawdown_state, key, cols_dd,
        [[(_TS0 + 1, 2, -3.0), (_TS0 + 2, 3, 4.0)], [(_TS0, 1, 5.0)]],
    )
    assert st_in[0] == st_late[0]          # cum: exact under any order
    assert st_late[2] >= 0                 # dd well-defined, arrival-order

    # attribution: a touch delivered after the purchase it preceded in
    # event time does not retro-credit it
    cols_at = ["event_id", "event_type", "ts_us"]
    _, out_a = _rc_run(
        S._update_attrib_state, key, cols_at,
        [[(2, "purchase", _TS0 + 5_000_000)], [(1, "click", _TS0)]],
    )
    # (second batch emitted no purchase rows -> inspect the first batch)
    st_b = _RCState()
    out_p = _rc_feed(
        S._update_attrib_state, key, cols_at, st_b,
        [(2, "purchase", _TS0 + 5_000_000)],
    )
    assert bool(out_p["organic"].iloc[0]) is True  # emitted organic, final

    # funnel: a late click after the user already purchased can't regress
    st_f = _RCState()
    _rc_feed(S._update_funnel_state, key, ["event_type", "ts_us"], st_f,
             [("view", _TS0), ("click", _TS0 + 1), ("purchase", _TS0 + 2)])
    assert st_f._v[0] == 3
    _rc_feed(S._update_funnel_state, key, ["event_type", "ts_us"], st_f,
             [("click", _TS0 + 1)])
    assert st_f._v[0] == 3  # stage never regresses


def test_launch_spool_marker_protocol_visibility_and_bound():
    """Object-store-safe spool (r10 verdict #5): under protocol='marker' a
    payload is visible iff its .ok commit marker exists — a half-uploaded
    .part is never consumed and never breaks the contiguous prefix — and
    maxPayloadsPerTrigger caps each micro-batch."""
    import json as _json
    import os
    import tempfile

    from tmapreduce_spark.sources.stream_launch import (
        LaunchSpool,
        LaunchStreamReader,
    )

    with tempfile.TemporaryDirectory() as d:
        spool = LaunchSpool(d, protocol="marker")
        for i in range(5):
            assert spool.append(f"job{i}", "wordcount", [("k", str(i))]) == i
        # both PUTs present, data before marker
        assert os.path.exists(os.path.join(d, "000000000000.json.part"))
        assert os.path.exists(os.path.join(d, "000000000000.json.ok"))

        rd = LaunchStreamReader(
            {"path": d, "protocol": "marker", "maxPayloadsPerTrigger": "2"}
        )
        rows, off = rd.read({"seq": 0})
        assert off == {"seq": 2} and {r[0] for r in rows} == {0, 1}
        rows, off = rd.read(off)
        assert off == {"seq": 4} and {r[0] for r in rows} == {2, 3}
        # replay of a committed range is deterministic
        assert rd.readBetweenOffsets({"seq": 0}, {"seq": 2}) == [
            (0, "job0", "wordcount", "k", "0"),
            (1, "job1", "wordcount", "k", "1"),
        ]

        # a half-uploaded payload (data, NO marker) is invisible and stops
        # the contiguous prefix even though later markers exist
        with open(os.path.join(d, "000000000005.json.part"), "w") as f:
            _json.dump({"name": "half", "type": "wordcount", "kvs": []}, f)
        spool6 = os.path.join(d, "000000000006")
        with open(spool6 + ".json.part", "w") as f:
            _json.dump({"name": "later", "type": "wordcount", "kvs": [["k", "6"]]}, f)
        with open(spool6 + ".json.ok", "w"):
            pass
        rd_all = LaunchStreamReader({"path": d, "protocol": "marker"})
        rows, off = rd_all.read({"seq": 4})
        assert off == {"seq": 5}, "prefix must stop at the uncommitted payload"
        # once the marker lands, 5 and 6 both drain
        with open(os.path.join(d, "000000000005.json.ok"), "w"):
            pass
        rows, off = rd_all.read({"seq": 5})
        assert off == {"seq": 7}
        # _next_seq skips past everything visible (no overwrite)
        assert spool.append("job7", "wordcount", [("k", "7")]) == 7


def test_launch_spool_rejects_unknown_protocol():
    import tempfile

    import pytest as _pytest

    from tmapreduce_spark.sources.stream_launch import (
        LaunchSpool,
        LaunchStreamReader,
    )

    with tempfile.TemporaryDirectory() as d:
        with _pytest.raises(ValueError):
            LaunchSpool(d, protocol="s3-magic")
        with _pytest.raises(ValueError):
            LaunchStreamReader({"path": d, "protocol": "s3-magic"})


def test_launch_spool_protocol_mismatch_fails_fast():
    """Writer/reader protocol disagreement must raise, not silently read
    zero payloads forever (r11 advice): the spool stamps a _PROTOCOL
    sentinel at creation; reader and writer both check it, and a
    pre-sentinel spool is inferred from its payload-file suffixes."""
    import os
    import tempfile

    import pytest as _pytest

    from tmapreduce_spark.sources.stream_launch import (
        LaunchSpool,
        LaunchStreamReader,
    )

    # sentinel-based: reader configured with the other protocol
    for written, misread in (("rename", "marker"), ("marker", "rename")):
        with tempfile.TemporaryDirectory() as d:
            LaunchSpool(d, protocol=written)
            with _pytest.raises(ValueError, match="was written with"):
                LaunchStreamReader({"path": d, "protocol": misread})
            # matching reader still constructs fine
            LaunchStreamReader({"path": d, "protocol": written})
            # a second writer with the other protocol is also rejected
            with _pytest.raises(ValueError, match="was written with"):
                LaunchSpool(d, protocol=misread)

    # pre-sentinel spool (no _PROTOCOL file): inferred from suffixes
    with tempfile.TemporaryDirectory() as d:
        spool = LaunchSpool(d, protocol="marker")
        spool.append("j", "wordcount", [("k", "v")])
        os.remove(os.path.join(d, "_PROTOCOL"))
        with _pytest.raises(ValueError, match="marker-protocol files"):
            LaunchStreamReader({"path": d, "protocol": "rename"})

    # empty spool dir, no sentinel: reader constructs (nothing to disagree
    # with yet) and re-checks on every read until the layout confirms
    with tempfile.TemporaryDirectory() as d:
        rd = LaunchStreamReader({"path": d, "protocol": "rename"})
        rows, off = rd.read({"seq": 0})
        assert list(rows) == [] and off == {"seq": 0}
        # a marker-protocol writer then claims the dir: next poll must raise
        LaunchSpool(d, protocol="marker")
        with _pytest.raises(ValueError, match="was written with"):
            rd.read({"seq": 0})
