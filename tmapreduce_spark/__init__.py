"""tmapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ztorchan/tMapReduce, rebuilt Spark-first.

The reference (`/root/reference/`, C++ master/worker/gateway over braft+brpc+etcd)
exposes exactly one computable surface: the fixed pipeline
``map -> shuffle(groupByKey+sort) -> reduce`` over string key-value pairs with
dynamically loaded user Map/Reduce functions (``src/tmapreduce/mrf.h:9-11``,
``src/tmapreduce/job.cc:10-77``). This package re-expresses that capability —
and the DataFrame-native operator layer / LLM-data-pipeline operators the
north star requires — idiomatically on Spark:

- :mod:`tmapreduce_spark.mapreduce` — the reference-parity job API
  (``launch`` / ``get_result``), string-KV MapReduce with faithful ordering,
  validation, token and short-circuit semantics.
- :mod:`tmapreduce_spark.registry` — job-type -> (map_fn, reduce_fn) registry,
  replacing the reference's ``{type}.so`` dlopen discovery
  (``src/tmapreduce/worker_server.cc:37-45``).
- :mod:`tmapreduce_spark.sources` — table catalog over the parquet testdata.
- :mod:`tmapreduce_spark.operators` — relational layer (joins, aggregations,
  windows, set ops, sorts/top-k) as declarative DataFrame plans.
- :mod:`tmapreduce_spark.functions` — scalar function coverage plus the
  LLM-pipeline operators: dedup (exact/minhash/simhash), similarity search,
  text analysis, multimodal column plumbing.
- :mod:`tmapreduce_spark.streaming` — Structured Streaming over the events
  table (watermarks, tumbling/sliding/session windows, stateful ops).
"""

from tmapreduce_spark.session import get_spark
from tmapreduce_spark.registry import JobRegistry, default_registry
from tmapreduce_spark.mapreduce import MapReduceEngine

__all__ = ["get_spark", "JobRegistry", "default_registry", "MapReduceEngine"]
__version__ = "0.1.0"
