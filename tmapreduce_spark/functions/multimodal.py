"""Multimodal column plumbing: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual decode is STUBBED
(:func:`decode_image_stub` raises unless PIL is importable — clearly marked);
everything Spark-side is real and tested: the binary column synthesis, the
metadata schema, the mapInPandas UDF signature, and the batch shapes. The
"fake decode" derives deterministic pseudo-dimensions from the payload's md5,
which makes even the Python mapInPandas path DuckDB-oracle-checkable.

Scale notes: binary payloads ride Parquet like any column (Tungsten handles
them off-heap); mapInPandas streams Arrow batches so per-batch memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — resize that
down for multi-MB images. Partition by content size (or store large blobs as
paths + ranged reads) before fanning out decode at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from tmapreduce_spark.catalog import QuerySpec
from tmapreduce_spark.sources.catalog import load_table

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width bigint, fake_height bigint, "
    "fake_channels bigint"
)


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with an opaque binary payload column + typed metadata —
    the storage shape for multimodal data (FIXTURES §4 documents as carrier)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """REAL decode is stubbed: the container ships no imaging libraries.
    Falls back to NotImplementedError unless PIL is available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - PIL absent by design
        raise NotImplementedError(
            "image decode requires PIL/pillow which this environment does not "
            "ship; use fake_decode_batch for plumbing tests"
        ) from exc
    raise NotImplementedError("real decode path not exercised in this container")


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: md5-derived dimensions (same formula as
    the DuckDB oracle SQL below)."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return 64 + h % 577, 64 + (h // 577) % 577, 1 + h % 3


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas UDF: binary payload -> (doc_id, n_bytes, fake dims).
    Arrow-batched; the per-batch loop is vectorizable when a real decoder
    exists (PIL/torchvision operate per-image anyway)."""
    for pdf in batches:
        dims = [_fake_dims(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
                "fake_channels": [d[2] for d in dims],
            }
        )


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal plumbing path: binary column -> mapInPandas
    pseudo-decode -> typed metadata rows. Oracle-checked because the fake
    decode is md5-deterministic."""
    return binary_documents(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        fake_decode_batch, schema=DECODE_SCHEMA
    )


MULTIMODAL_DECODE_SQL = """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS hv,
         octet_length(encode(text)) AS n_bytes
  FROM documents)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
       64 + hv % 577 AS fake_width,
       64 + (hv // 577) % 577 AS fake_height,
       1 + hv % 3 AS fake_channels
FROM h
"""


def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over the typed metadata struct (payload sizes per origin)
    — struct access stays JVM-side."""
    b = binary_documents(spark, sf_dir)
    return (
        b.select(F.col("meta.origin").alias("origin"), F.col("meta.n_bytes").alias("n_bytes"))
        .groupBy("origin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


MULTIMODAL_META_SQL = """
SELECT source AS origin, count(*) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS INTEGER) AS max_bytes
FROM documents
GROUP BY source
"""


RESIZE_SCHEMA = "doc_id bigint, out_width bigint, out_height bigint, out_bytes bigint"
TARGET_EDGE = 224  # standard vision-model input edge


def fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas UDF: 'resize' each payload to fit TARGET_EDGE. The pixel
    work is stubbed (no imaging libs — a real impl calls PIL.Image.resize
    here); the size bookkeeping is exact integer arithmetic so the oracle
    reproduces it. Batch shape (binary in, metadata out) is the real one."""
    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            p = bytes(p)
            w, h, _c = _fake_dims(p)
            ow, oh = min(w, TARGET_EDGE), min(h, TARGET_EDGE)
            n = len(p)
            rows.append((int(doc_id), ow, oh, (n * ow * oh) // (w * h)))
        yield pd.DataFrame(rows, columns=["doc_id", "out_width", "out_height", "out_bytes"])


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: binary payload -> bounded-dimension output metadata
    (1 row in, 1 row out, new payload size proportional to area ratio)."""
    return binary_documents(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        fake_resize_batch, schema=RESIZE_SCHEMA
    )


MULTIMODAL_RESIZE_SQL = f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS hv,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents),
dims AS (
  SELECT doc_id, n_bytes,
         64 + hv % 577 AS w, 64 + (hv // 577) % 577 AS h
  FROM h)
SELECT doc_id,
       least(w, {TARGET_EDGE}) AS out_width,
       least(h, {TARGET_EDGE}) AS out_height,
       (n_bytes * least(w, {TARGET_EDGE}) * least(h, {TARGET_EDGE})) // (w * h) AS out_bytes
FROM dims
"""


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_sig bigint"
FRAME_STRIDE = 30  # sample one frame per stride (e.g. 1 fps at 30 fps video)


def fake_frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas UDF: treat each payload as a pseudo-video with an
    md5-derived frame count and emit every FRAME_STRIDE-th frame (1 row in,
    n rows out — the real video-sampling batch shape). frame_sig stands in
    for the extracted frame payload."""
    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            h = int(hashlib.md5(bytes(p)).hexdigest()[:15], 16)
            n_frames = 1 + h % 240
            for idx in range(0, n_frames, FRAME_STRIDE):
                # reduce h before multiplying so the oracle's BIGINT math
                # cannot overflow (h < 2^60 but (h % P)*31 + idx < 2^35)
                rows.append((int(doc_id), idx, ((h % 1_000_000_007) * 31 + idx) % 1_000_000_007))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sig"])


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over pseudo-video payloads (1 → n rows)."""
    return binary_documents(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        fake_frame_sample_batch, schema=FRAME_SCHEMA
    )


MULTIMODAL_FRAME_SQL = f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS hv
  FROM documents)
SELECT doc_id,
       CAST(unnest(range(0, 1 + hv % 240, {FRAME_STRIDE})) AS BIGINT) AS frame_idx,
       CAST(unnest(list_transform(range(0, 1 + hv % 240, {FRAME_STRIDE}),
                                  i -> ((hv % 1000000007) * 31 + i) % 1000000007)) AS BIGINT) AS frame_sig
FROM h
"""


FEAT_PRIMES = (3, 7, 11, 17)
FEATURE_SCHEMA = "doc_id bigint, f0 double, f1 double, f2 double, f3 double, feat_norm double"


def fake_feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas UDF: binary payload -> fixed-dim pseudo-embedding + norm
    (the feature-extraction batch shape: a real impl runs a vision/audio
    encoder here and emits the model's vector). md5-derived components and an
    explicit left-fold norm keep it oracle-exact."""
    import math

    for pdf in batches:
        rows = []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            h = int(hashlib.md5(bytes(p)).hexdigest()[:15], 16)
            fs = [((h // pr) % 1000) / 1000.0 for pr in FEAT_PRIMES]
            s = 0.0
            for v in fs:  # fixed accumulation order == the oracle's + chain
                s += v * v
            rows.append((int(doc_id), *fs, math.sqrt(s)))
        yield pd.DataFrame(rows, columns=["doc_id", "f0", "f1", "f2", "f3", "feat_norm"])


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: payload -> pseudo-embedding components +
    L2 norm. Completes the decode / feature-extract / resize / frame-sample
    multimodal operator set."""
    return binary_documents(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        fake_feature_batch, schema=FEATURE_SCHEMA
    )


MULTIMODAL_FEATURE_SQL = f"""
WITH h AS (
  SELECT doc_id, CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS hv
  FROM documents),
f AS (
  SELECT doc_id,
         (hv // {FEAT_PRIMES[0]}) % 1000 / 1000.0 AS f0,
         (hv // {FEAT_PRIMES[1]}) % 1000 / 1000.0 AS f1,
         (hv // {FEAT_PRIMES[2]}) % 1000 / 1000.0 AS f2,
         (hv // {FEAT_PRIMES[3]}) % 1000 / 1000.0 AS f3
  FROM h)
SELECT doc_id, f0, f1, f2, f3,
       sqrt(f0 * f0 + f1 * f1 + f2 * f2 + f3 * f3) AS feat_norm
FROM f
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_feature_extract": QuerySpec(multimodal_feature_extract, MULTIMODAL_FEATURE_SQL, "multimodal"),
    "multimodal_decode_stats": QuerySpec(multimodal_decode_stats, MULTIMODAL_DECODE_SQL, "multimodal"),
    "multimodal_meta_stats": QuerySpec(multimodal_meta_stats, MULTIMODAL_META_SQL, "multimodal"),
    "multimodal_resize": QuerySpec(multimodal_resize, MULTIMODAL_RESIZE_SQL, "multimodal"),
    "multimodal_frame_sample": QuerySpec(multimodal_frame_sample, MULTIMODAL_FRAME_SQL, "multimodal"),
}
