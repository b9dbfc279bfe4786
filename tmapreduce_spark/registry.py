"""Job-type UDF registry.

Replaces the reference's worker-side UDF discovery and loading: workers scan
``mrf_path`` for ``{type}.so`` files to learn their acceptable job types
(``/root/reference/src/tmapreduce/worker_server.cc:37-45``), register them in
etcd, then ``dlopen``/``dlsym("c_Map"/"c_Reduce")`` at execution time
(``/root/reference/src/tmapreduce/worker.cc:96-121,225,270``). Here a job type
is simply a name bound to a pair of Python callables:

- ``map_fn(key: str, value: str) -> Iterable[tuple[str, str]]`` — flatMap
  semantics, 0..n output pairs per input pair (``src/tmapreduce/job.h:18``).
- ``reduce_fn(key: str, values: list[str]) -> Iterable[str]`` — flat list of
  result strings per key group (``src/tmapreduce/job.h:19-20``).

The built-in job types reproduce the reference's shipped example and the
golden jobs in FIXTURES.md §3.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Callable, Iterable
from dataclasses import dataclass


MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], Iterable[str]]
CombineFn = Callable[[str, list[str]], list[str]]


@dataclass(frozen=True)
class JobType:
    name: str
    map_fn: MapFn
    reduce_fn: ReduceFn
    # Optional map-side combiner: values -> fewer values, per partition,
    # BEFORE the shuffle. The one optimization the reference structurally
    # cannot do (all map output funnels through the master and its raft log,
    # worker.cc:311-315). Registering one asserts the reduce is insensitive
    # to value order and to pre-combination (e.g. summing counters).
    combine_fn: CombineFn | None = None


class JobRegistry:
    """In-process replacement for etcd type discovery (``master.cc:203-215``)."""

    def __init__(self) -> None:
        self._types: dict[str, JobType] = {}

    def register(
        self,
        name: str,
        map_fn: MapFn,
        reduce_fn: ReduceFn,
        combine_fn: CombineFn | None = None,
    ) -> None:
        self._types[name] = JobType(name, map_fn, reduce_fn, combine_fn)

    def get(self, name: str) -> JobType:
        if name not in self._types:
            # mirrors the reference's "no worker for this type" stall — but we
            # fail fast instead of queueing forever (master.cc:203-210).
            raise KeyError(f"unknown job type: {name!r}")
        return self._types[name]

    def types(self) -> list[str]:
        return sorted(self._types)

    def __contains__(self, name: str) -> bool:
        return name in self._types


# ---------------------------------------------------------------------------
# Built-in job types (reference example + FIXTURES.md §3 golden jobs)
# ---------------------------------------------------------------------------

def charcount_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    """Per-document histogram of ``[a-z0-9]`` chars -> (char, str(count)).

    Parity with the reference's shipped example Map
    (``/root/reference/example/word_count/word_count.cc:9-22``): counts only
    lowercase letters and digits, emits stringified counts.
    """
    counts = Counter(c for c in value if ("a" <= c <= "z") or ("0" <= c <= "9"))
    return [(ch, str(n)) for ch, n in counts.items()]


def charcount_reduce(key: str, values: list[str]) -> Iterable[str]:
    """Sum of int(v) over values -> emits [key, str(total)].

    Parity with ``/root/reference/example/word_count/word_count.cc:24-34``:
    the reduce emits the key and the total as two flat strings (the client
    consumes the result array pairwise, ``word_count_client.cc:63-65``).
    """
    return [key, str(sum(int(v) for v in values))]


def identity_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    return [(key, value)]


def identity_reduce(key: str, values: list[str]) -> Iterable[str]:
    return list(values)


def empty_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    """Maps every pair to nothing — exercises the empty-shuffle short-circuit
    (``/root/reference/src/tmapreduce/master.cc:624-627``)."""
    return []


def wordcount_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    """Whitespace word count map (the classic; generalizes the reference's
    char-histogram example to tokens).

    Tokenizes on ASCII whitespace only (not str.split(), which also splits on
    Unicode spaces like NBSP) so results agree with the ``mr_wordcount``
    DuckDB oracle's ``string_split_regex(v, '\\s+')`` tokenization."""
    return [(w, "1") for w in re.split(r"\s+", value, flags=re.ASCII) if w]


def sum_combine(key: str, values: list[str]) -> list[str]:
    """Partial-sum combiner for stringified-count jobs (associative)."""
    return [str(sum(int(v) for v in values))]


def grep_spark_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    """Distributed grep (the other canonical MapReduce program from the
    original Dean & Ghemawat paper): emit the pair iff the value contains
    the fixed pattern. Like a reference ``.so`` job, the pattern is baked
    into the job type — parameterization is not in the Map/Reduce ABI
    (``/root/reference/src/tmapreduce/mrf.h:9-11``)."""
    return [(key, value)] if "spark" in value else []


def invertedindex_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    """Inverted-index map (the third canonical program from the original
    MapReduce paper, §2.3 "Inverted Index"): emit (word, doc_id) per token
    occurrence; the reduce side dedups and sorts the posting list."""
    return [(w, key) for w in re.split(r"\s+", value, flags=re.ASCII) if w]


def invertedindex_reduce(key: str, values: list[str]) -> Iterable[str]:
    """Emit [word, "id1,id2,..."] — distinct doc ids, lexically sorted so
    the posting string is deterministic under any shuffle order (the
    reference sorts reduce inputs by key only, `job.cc:45-66`; value order
    within a key is partition-dependent, hence the explicit sort here)."""
    return [key, ",".join(sorted(set(values)))]


def reducejoin_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    """Reduce-side (repartition) join map — the classic MapReduce join: the
    input value arrives pre-tagged with its source relation ("N:" left /
    "C:" right); map is tag-preserving identity, so both relations
    co-locate on the join key at the reducers."""
    return [(key, value)]


def reducejoin_reduce(key: str, values: list[str]) -> Iterable[str]:
    """Emit the per-key cross product of left and right tagged values as
    "left|right" strings, both sides sorted first so the output is
    deterministic under any shuffle order. Keys missing either side emit
    nothing (inner-join semantics)."""
    lefts = sorted(v[2:] for v in values if v.startswith("N:"))
    rights = sorted(v[2:] for v in values if v.startswith("C:"))
    return [f"{l}|{r}" for l in lefts for r in rights]


def secondarysort_map(key: str, value: str) -> Iterable[tuple[str, str]]:
    """Secondary-sort map (the fourth canonical pattern: reduce inputs
    ordered by a value-embedded sort key). The value arrives as
    "sortkey|payload"; map is identity — in Hadoop this pattern needs a
    composite key + custom partitioner/grouper, but this engine's reduce
    receives the full value list, so the ordering contract moves into the
    reduce (and is therefore explicit and testable)."""
    return [(key, value)]


def secondarysort_reduce(key: str, values: list[str]) -> Iterable[str]:
    """Emit [key, payload1payload2...] with payloads concatenated in
    lexicographic sortkey order — deterministic under any shuffle order
    because the sort happens HERE, not in arrival order (the reference
    sorts reduce inputs by key only, `job.cc:45-66`)."""
    ordered = sorted(values)
    return [key, "".join(v.split("|", 1)[1] for v in ordered)]


def default_registry() -> JobRegistry:
    reg = JobRegistry()
    reg.register("charcount", charcount_map, charcount_reduce)
    reg.register("identity", identity_map, identity_reduce)
    reg.register("empty-map", empty_map, identity_reduce)
    reg.register("wordcount", wordcount_map, charcount_reduce)
    # combiner variants: identical results, shuffle carries one partial
    # count per (partition, key) instead of every emission
    reg.register("charcount+c", charcount_map, charcount_reduce, sum_combine)
    reg.register("wordcount+c", wordcount_map, charcount_reduce, sum_combine)
    reg.register("grep-spark", grep_spark_map, identity_reduce)
    reg.register("invertedindex", invertedindex_map, invertedindex_reduce)
    reg.register("reducejoin", reducejoin_map, reducejoin_reduce)
    reg.register("secondarysort", secondarysort_map, secondarysort_reduce)
    return reg
