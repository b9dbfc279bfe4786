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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


# ---------------------------------------------------------------------------
# End-to-end multimodal pipeline: pseudo-decode -> 64-dim pseudo-embedding ->
# LSH-bucketed ANN join against the embeddings corpus -> best match per doc.
# ---------------------------------------------------------------------------

EMBED_DIM = 64  # matches the embeddings fixture's vector dimensionality


def _doc_embed_components(payload: bytes):
    """Deterministic 64-dim int64 pseudo-embedding of a binary payload: 8 md5
    chains x 8 four-hex-char chunks, each mapped to [-1000, 1000]. Stands in
    for a real vision/audio encoder; integer components keep every downstream
    dot product exact (same contract as the quantized corpus grid)."""
    import numpy as np

    comps = np.empty(EMBED_DIM, dtype=np.int64)
    for g in range(EMBED_DIM // 8):
        hexd = hashlib.md5(payload + b"#" + str(g).encode()).hexdigest()
        for s in range(8):
            comps[g * 8 + s] = int(hexd[s * 4 : s * 4 + 4], 16) % 2001 - 1000
    return comps


def multimodal_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end multimodal pipeline in one lineage: binary payload ->
    pseudo-decode (width from the decode stage rides along) -> fixed-dim
    pseudo-embedding -> LSH bucket -> equi-join against the identically
    bucketed ``embeddings`` corpus -> quantized-exact cosine -> best corpus
    match per document.

    Scale shape: both sides are bucketed by the SAME deterministic hyperplane
    LSH (one Arrow-batched pass each, no shuffle until the bucket equi-join),
    so the candidate set per doc is ~1/256th of the corpus — the
    large-query-set regime where the LSH bucket column becomes a join key
    (write both sides bucketed at rest and the join is exchange-free).
    Documents whose bucket holds no corpus vector drop out (inner-join
    semantics, deterministic in both engines)."""
    import numpy as np
    import pandas as pd

    from tmapreduce_spark.functions.scale import _buckets_of
    from tmapreduce_spark.functions.similarity import QUANT

    corpus = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def bucket_corpus(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * QUANT + 0.5
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "qe": [c.tolist() for c in C],
                    "bucket": _buckets_of(C).astype("int64"),
                    "nrm": np.sqrt(np.einsum("ij,ij->i", C, C).astype(np.float64)),
                }
            )

    corp = corpus.mapInPandas(
        bucket_corpus, "vec_id bigint, qe array<bigint>, bucket bigint, nrm double"
    )

    docs = binary_documents(spark, sf_dir).select("doc_id", "payload")

    def embed_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            recs = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                w, _h, _c = _fake_dims(p)  # the decode stage of the pipeline
                recs.append((int(doc_id), w, _doc_embed_components(p)))
            D = np.stack([r[2] for r in recs])
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in recs],
                    "fake_width": [r[1] for r in recs],
                    "dq": [d.tolist() for d in D],
                    "bucket": _buckets_of(D).astype("int64"),
                    "dnrm": np.sqrt(np.einsum("ij,ij->i", D, D).astype(np.float64)),
                }
            )

    docf = docs.mapInPandas(
        embed_docs, "doc_id bigint, fake_width bigint, dq array<bigint>, bucket bigint, dnrm double"
    )

    cand = docf.join(corp, "bucket")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["dq"]])
            B = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qe"]])
            dots = np.einsum("ij,ij->i", A, B)  # exact int64
            cos = dots.astype(np.float64) / (
                pdf["dnrm"].to_numpy() * pdf["nrm"].to_numpy()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fake_width": pdf["fake_width"].astype("int64"),
                    "neighbor_id": pdf["vec_id"].astype("int64"),
                    "cosine": np.floor(cos * 1e6 + 0.5) / 1e6,
                }
            )

    scored = cand.mapInPandas(
        score, "doc_id bigint, fake_width bigint, neighbor_id bigint, cosine double"
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fake_width", F.col("neighbor_id").alias("best_vec"), "cosine")
    )


def _embed_ann_sql() -> str:
    from tmapreduce_spark.functions.scale import _bucket_duck
    from tmapreduce_spark.functions.similarity import _qdot_duck, _quant_duck

    doc_comps = (
        "list_transform(range(0, 64), j -> "
        "CAST(CAST(('0x' || substring(md5(text || '#' || CAST(j // 8 AS VARCHAR)), "
        "(j % 8) * 4 + 1, 4)) AS BIGINT) % 2001 - 1000 AS BIGINT))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, {_quant_duck('embedding')} AS qe FROM embeddings),
eb AS (
  SELECT vec_id, qe, ({_bucket_duck()}) AS bucket,
         sqrt(CAST({_qdot_duck('qe', 'qe')} AS DOUBLE)) AS nrm
  FROM e),
doc AS (
  SELECT doc_id,
         64 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 577 AS fake_width,
         {doc_comps} AS qe
  FROM documents),
db AS (
  SELECT doc_id, fake_width, qe, ({_bucket_duck()}) AS bucket,
         sqrt(CAST({_qdot_duck('qe', 'qe')} AS DOUBLE)) AS dnrm
  FROM doc),
scored AS (
  SELECT doc_id, fake_width, eb.vec_id AS neighbor_id,
         floor((CAST({_qdot_duck('db.qe', 'eb.qe')} AS DOUBLE) / (db.dnrm * eb.nrm))
               * 1000000 + 0.5) / 1000000 AS cosine
  FROM db JOIN eb ON db.bucket = eb.bucket),
ranked AS (
  SELECT doc_id, fake_width, neighbor_id, cosine,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored)
SELECT doc_id, fake_width, neighbor_id AS best_vec, cosine
FROM ranked WHERE rn = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_embed_ann": QuerySpec(multimodal_embed_ann, _embed_ann_sql(), "multimodal"),
    "multimodal_feature_extract": QuerySpec(multimodal_feature_extract, MULTIMODAL_FEATURE_SQL, "multimodal"),
    "multimodal_decode_stats": QuerySpec(multimodal_decode_stats, MULTIMODAL_DECODE_SQL, "multimodal"),
    "multimodal_meta_stats": QuerySpec(multimodal_meta_stats, MULTIMODAL_META_SQL, "multimodal"),
    "multimodal_resize": QuerySpec(multimodal_resize, MULTIMODAL_RESIZE_SQL, "multimodal"),
    "multimodal_frame_sample": QuerySpec(multimodal_frame_sample, MULTIMODAL_FRAME_SQL, "multimodal"),
}
