"""Reference-parity MapReduce job API on Spark.

Implements the reference's complete engine-executed dataflow (SURVEY.md §2A
items 1-10) as one Spark lineage:

    validate -> sort-by-key -> contiguous partition -> flatMap(map_fn)
      -> groupByKey -> key-sort -> flatMap(reduce_fn) -> ordered collect

Reference semantics preserved (file:line into /root/reference/):

- **Validation/admission**: ``mapper_num<=0``, ``reducer_num<=0`` or empty
  ``kvs`` rejected (``src/tmapreduce/master.cc:530-535``); non-string keys or
  values rejected (``src/tmapreduce/gateway.cc:15-51``).
- **Ingest key-sort**: payload sorted by key before partitioning
  (``master.cc:736-738``).
- **Contiguous partitioning**: ``sc.parallelize`` slices the sorted list into
  near-equal contiguous runs exactly like ``Job::Partition()``
  (``src/tmapreduce/job.cc:10-43``).
- **Map**: per-pair flatMap of the user function (C wrapper loop,
  ``src/tmapreduce/wrapper.cc:10-31``).
- **Shuffle/Merge**: group values by key, key-sorted output
  (``src/tmapreduce/job.cc:45-66``); within-key value order is
  (map-subjob index, emission order) — reproduced here by tagging each map
  output with ``(partition_index, emission_seq)`` and sorting the group
  (``job.cc:51-59`` ordering contract, SURVEY §1.4).
- **Empty-shuffle short-circuit**: zero map output pairs skips reduce and
  finishes with an empty result (``master.cc:624-627``).
- **Reduce**: per-group flatMap of the user function
  (``src/tmapreduce/wrapper.cc:33-55``).
- **Finish**: results concatenated in key-sorted subjob order into one flat
  string array (``src/tmapreduce/job.cc:68-77``).
- **Result lifecycle**: per-job bearer token checked at get_result
  (``master.cc:691-693``, ``src/tmapreduce/job.h:93``); finished results GC'd
  after 3600 s (``master.cc:449-463``, ``master.h:27``).

Everything the reference builds around this dataflow — raft replication,
heartbeats, straggler requeue, etcd discovery (§2A items 11-16) — is Spark's
scheduler and is deliberately not reimplemented.

Scale note: ``launch`` mirrors the reference's REST contract and therefore
takes a driver-side list (the reference holds the whole payload in master RAM,
``job.h:86-88``, so list-shaped input *is* the parity surface). For 100 TB
inputs use :meth:`MapReduceEngine.apply_df`, which runs the same two UDFs over
an arbitrary ``DataFrame[key string, value string]`` without any driver-side
materialization.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from tmapreduce_spark.registry import JobRegistry, default_registry

# apply_df's fixed output schema (key-wise parity with launch(): one string
# row per reduce output, keyed by its group key).
_APPLY_DF_SCHEMA = StructType(
    [StructField("key", StringType(), True), StructField("result", StringType(), True)]
)

# Reference operational constant: finished-job result TTL
# (/root/reference/src/tmapreduce/master.h:27).
JOB_RESULT_TIMEOUT_SECOND = 3600.0


class JobStage(Enum):
    """Mirror of the reference's job stage machine for observability
    (``/root/reference/src/tmapreduce/job.h:26-39``); Spark collapses the
    wait/partition states into its own DAG scheduling."""

    INIT = "INIT"
    MAPPING = "MAPPING"
    MERGING = "MERGING"
    REDUCING = "REDUCING"
    FINISHED = "FINISHED"


class LaunchError(ValueError):
    """Invalid launch payload (``master.cc:530-535``, ``gateway.cc:15-51``)."""


class ResultError(RuntimeError):
    """get_result failure: unknown job / bad token / unfinished job
    (``master.cc:685-699``)."""


@dataclass
class _Job:
    job_id: int
    name: str
    job_type: str
    token: str
    stage: JobStage = JobStage.INIT
    results: list[str] = field(default_factory=list)
    finish_time: float | None = None
    error: BaseException | None = None
    thread: threading.Thread | None = None


class MapReduceEngine:
    """Driver-side job manager: the master+gateway capability surface as a
    plain Python API over Spark lineages."""

    def __init__(self, spark: SparkSession, registry: JobRegistry | None = None):
        self.spark = spark
        self.registry = registry if registry is not None else default_registry()
        self._jobs: dict[int, _Job] = {}
        self._next_id = 0
        self._lock = threading.Lock()

    # -- launch (§2A items 1-9) --------------------------------------------

    def launch(
        self,
        name: str,
        job_type: str,
        kvs: list[tuple[str, str]],
        mapper_num: int = 2,
        reducer_num: int = 2,
        token: str = "",
    ) -> int:
        """Submit a job; returns the job_id IMMEDIATELY while the pipeline
        runs on a background thread — the reference's async contract: launch
        responds as soon as the job is admitted (``gateway.cc:131-157``,
        ``master.cc:489-514``) and the client polls get_result until the
        master stops answering "job not finished"
        (``example/word_count/word_count_client.cc:54``). Stage transitions
        (MAPPING/MERGING/REDUCING, ``job.h:26-39``) are observable from other
        threads via :meth:`stage_of`; use :meth:`wait` to block."""
        self._validate(job_type, kvs, mapper_num, reducer_num)
        jt = self.registry.get(job_type)  # unknown type rejected at admission
        with self._lock:
            job_id = self._next_id
            self._next_id += 1
            job = _Job(job_id, name, job_type, token)
            self._jobs[job_id] = job

        def run() -> None:
            try:
                self._run_job(job, jt, kvs, mapper_num, reducer_num)
            except BaseException as exc:  # surfaced via wait()/get_result()
                job.error = exc
                job.stage = JobStage.FINISHED
                job.finish_time = time.time()

        # InheritableThread propagates the driver's local properties (job
        # groups, scheduler pool) into the background Spark actions.
        try:
            from pyspark import InheritableThread

            job.thread = InheritableThread(target=run, daemon=True)
        except ImportError:  # pragma: no cover
            job.thread = threading.Thread(target=run, daemon=True)
        job.thread.start()
        return job_id

    def wait(self, job_id: int, timeout: float | None = None) -> JobStage:
        """Block until the job finishes (the client's poll loop,
        ``word_count_client.cc:54``, without the 1 s sleeps). Re-raises the
        job's exception, if any."""
        job = self._jobs.get(job_id)
        if job is None:
            raise ResultError(f"no such job: {job_id}")
        if job.thread is not None:
            job.thread.join(timeout)
        if job.error is not None:
            raise job.error
        return job.stage

    def _run_job(
        self,
        job: _Job,
        jt,
        kvs: list[tuple[str, str]],
        mapper_num: int,
        reducer_num: int,
    ) -> None:
        map_fn, reduce_fn = jt.map_fn, jt.reduce_fn
        sc = self.spark.sparkContext

        # Ingest key-sort (master.cc:736-738). Python's sort is stable, so
        # equal keys keep payload order, matching std::sort's effect on the
        # observable contract (values later re-ordered by subjob/emission tag).
        kvs_sorted = sorted(kvs, key=lambda kv: kv[0])
        # Deliberate deviation from Job::Partition (job.cc:10-43), which
        # creates EMPTY subjobs when mapper_num > len(kvs): Spark rejects
        # empty parallelize slices less gracefully than the reference's RPC
        # fan-out, and an empty subjob emits nothing, so clamping is
        # observationally identical (same emissions, same (part, seq) tags).
        mapper_num = min(mapper_num, len(kvs_sorted))

        job.stage = JobStage.MAPPING
        # Contiguous near-equal slices == Job::Partition (job.cc:10-43).
        indexed = sc.parallelize(list(enumerate(kvs_sorted)), mapper_num)

        def run_map(part_idx: int, it):
            # One C-wrapper loop per subjob slice (wrapper.cc:10-31); tag each
            # emission with (subjob index, emission seq) to reproduce the
            # reference's deterministic within-key value order (job.cc:51-59).
            seq = 0
            for _i, (k, v) in it:
                for out_k, out_v in map_fn(k, v):
                    yield out_k, (part_idx, seq, out_v)
                    seq += 1

        mapped = indexed.mapPartitionsWithIndex(run_map)

        if jt.combine_fn is not None:
            combine_fn = jt.combine_fn

            # Map-side combine (see apply_df): per-partition pre-aggregation
            # before the shuffle. Combined values keep the (subjob, seq) tag
            # shape so downstream is unchanged; registering a combiner
            # asserts the reducer is insensitive to within-key value order.
            def run_combine(part_idx: int, it):
                groups: dict[str, list[str]] = {}
                for k, (_p, _s, v) in it:
                    groups.setdefault(k, []).append(v)
                seq = 0
                for k, vs in groups.items():
                    for v in combine_fn(k, vs):
                        yield k, (part_idx, seq, v)
                        seq += 1

            mapped = mapped.mapPartitionsWithIndex(run_combine)

        # Cache before the emptiness probe: isEmpty() would otherwise run the
        # map (and combine) stage once for the probe and again for the real
        # shuffle — wasteful, and a non-deterministic user map_fn could make
        # the probe disagree with the run.  try/finally so a failing
        # groupByKey/collect or user reduce_fn can't leak the cached RDD for
        # the session (failed jobs would otherwise pin executor memory).
        mapped = mapped.cache()
        try:
            # Empty-shuffle short-circuit (master.cc:624-627).
            if mapped.isEmpty():
                job.stage = JobStage.FINISHED
                job.results = []
                job.finish_time = time.time()
                return

            job.stage = JobStage.MERGING
            # Merge: group by key + global key sort (job.cc:45-66). sortByKey's
            # range partitioner yields key-ordered partitions, so collect()
            # concatenates in key order == Job::Finish (job.cc:68-77).
            grouped = mapped.groupByKey(numPartitions=max(reducer_num, 1)).sortByKey(
                numPartitions=max(reducer_num, 1)
            )

            job.stage = JobStage.REDUCING

            def run_reduce(kv):
                k, tagged = kv
                values = [v for _p, _s, v in sorted(tagged, key=lambda t: (t[0], t[1]))]
                return list(reduce_fn(k, values))

            job.results = grouped.flatMap(run_reduce).collect()
        finally:
            mapped.unpersist()
        job.stage = JobStage.FINISHED
        job.finish_time = time.time()

    # -- get_result (§2A item 10) ------------------------------------------

    def get_result(self, job_id: int, token: str = "") -> list[str]:
        """Fetch the flat, key-ordered result string array
        (``master.cc:685-699`` semantics, including check order:
        existence -> token -> finished)."""
        self.gc()
        job = self._jobs.get(job_id)
        if job is None:
            raise ResultError(f"no such job: {job_id}")
        if job.token != token:
            raise ResultError("wrong token")
        if job.stage is not JobStage.FINISHED:
            raise ResultError(f"job not finished (stage={job.stage.value})")
        if job.error is not None:
            raise ResultError(f"job failed: {job.error!r}") from job.error
        return list(job.results)

    def stage_of(self, job_id: int) -> JobStage:
        job = self._jobs.get(job_id)
        if job is None:
            raise ResultError(f"no such job: {job_id}")
        return job.stage

    def gc(self, now: float | None = None) -> int:
        """Delete finished jobs older than the reference's 1 h TTL
        (``master.cc:449-463``)."""
        now = time.time() if now is None else now
        with self._lock:
            dead = [
                jid
                for jid, j in self._jobs.items()
                if j.finish_time is not None
                and now - j.finish_time > JOB_RESULT_TIMEOUT_SECOND
            ]
            for jid in dead:
                del self._jobs[jid]
        return len(dead)

    # -- scale path ---------------------------------------------------------

    def apply_df(self, df: DataFrame, job_type: str, ordered: bool = False) -> DataFrame:
        """Run a registered (map_fn, reduce_fn) pair over an arbitrary
        ``DataFrame[key string, value string]`` fully distributed — the 100 TB
        path the reference cannot take (its payload transits master RAM and
        the raft log, ``master.cc:489-514``).

        Returns ``DataFrame[key string, result string]``: one row per reduce
        output string, keyed by its group key (key-wise parity with
        :meth:`launch`; the flat-array concatenation order is a driver-side
        presentation concern and is not materialized here). Within-key value
        order follows Spark's shuffle arrival order — canonical for
        associative reducers; order-sensitive reducers should sort inside the
        UDF.

        ``ordered=True`` additionally applies the Finish stage's key-order
        contract (the reference merge-sorts reduce output by key,
        ``job.cc:45-66``) DISTRIBUTEDLY: sortByKey range-partitions, so
        partitions are globally ordered and a partition-order collect yields
        the reference's concatenation order without ever funneling rows
        through one task — this is what makes the distributed-sort canonical
        program (``mr_sort``) an engine contract rather than a driver sort.
        """
        jt = self.registry.get(job_type)
        map_fn, reduce_fn, combine_fn = jt.map_fn, jt.reduce_fn, jt.combine_fn

        rdd = df.select("key", "value").rdd.map(lambda r: (r[0], r[1]))
        mapped = rdd.flatMap(lambda kv: map_fn(kv[0], kv[1]))
        if combine_fn is not None:
            # map-side combine: per-partition grouping BEFORE the shuffle,
            # so the shuffle carries one partial per (partition, key) instead
            # of every map emission — the optimization the reference
            # structurally lacks (all map output transits the master,
            # worker.cc:311-315). Result-identical for the associative
            # reducers a combiner is registered for.
            def combine_partition(it):
                groups: dict[str, list[str]] = {}
                for k, v in it:
                    groups.setdefault(k, []).append(v)
                for k, vs in groups.items():
                    for v in combine_fn(k, vs):
                        yield k, v

            mapped = mapped.mapPartitions(combine_partition)
        if ordered:
            # TeraSort shape: sort the MAP output once and reduce contiguous
            # key runs in-partition. sortByKey range-partitions (all equal
            # keys land in one partition, keys sorted within it), so a
            # single sorted shuffle replaces the old groupByKey shuffle +
            # post-reduce sortByKey — whose PySpark implementation runs a
            # count() job and a sample() job over the whole map+group+reduce
            # lineage before the real range shuffle, i.e. the reduce ran
            # three times and the data shuffled twice. Within-key value
            # order remains shuffle-arrival (the documented contract above);
            # order-sensitive reducers sort inside the UDF.
            import itertools

            def reduce_runs(it):
                for k, group in itertools.groupby(it, key=lambda kv: kv[0]):
                    vals = [v for _, v in group]
                    for out in reduce_fn(k, vals):
                        yield k, out

            reduced = mapped.sortByKey().mapPartitions(
                reduce_runs, preservesPartitioning=True
            )
        else:
            reduced = mapped.groupByKey().flatMap(
                lambda kv: [(kv[0], out) for out in reduce_fn(kv[0], list(kv[1]))]
            )
        # Explicit schema: toDF(names-only) infers the schema by SAMPLING the
        # RDD — an rdd.first() that executes the whole map stage plus one
        # reduce partition before the caller's real action, i.e. every
        # apply_df query paid for its map+shuffle-write once more (measured
        # 8.78 s -> 7.62 s across the 8 mr_* entries at sf0.1).
        # verifySchema=False skips the per-row Python type re-check: the
        # (str, str) row shape is the registry job contract (the reference's
        # gateway admits only string pairs, gateway.cc:15-51, and map/reduce
        # fns emit strings by the same contract), so re-verifying every output
        # row in Python buys nothing at 100 TB.
        return self.spark.createDataFrame(
            reduced, _APPLY_DF_SCHEMA, verifySchema=False
        )

    # -- internals ----------------------------------------------------------

    @staticmethod
    def _validate(
        job_type: str, kvs: list[tuple[str, str]], mapper_num: int, reducer_num: int
    ) -> None:
        if mapper_num <= 0 or reducer_num <= 0:
            raise LaunchError("mapper_num and reducer_num must be > 0")
        if not kvs:
            raise LaunchError("empty kvs")
        for kv in kvs:
            if (
                not isinstance(kv, tuple)
                or len(kv) != 2
                or not isinstance(kv[0], str)
                or not isinstance(kv[1], str)
            ):
                # gateway.cc:15-51 — every element must be a {key,value} pair
                # of strings.
                raise LaunchError(f"invalid kv element: {kv!r}")
