"""Round-12 operators: the at-rest ANN bucket layout and PNG decode.

Each new entry gets a brute-force pure-Python recompute (independent of both
Spark and DuckDB) so the two engines' agreement can never be a shared-bug
artifact, plus the degenerate-input pins the round workflow requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _brute_ann_bucketed(sf_dir: str, n_queries: int, top_k: int):
    """Pure numpy/python recompute of layout_ann_bucketed: quantize, LSH
    bucket via the deterministic integer planes, same-bucket candidates,
    exact int64 dot cosine on the 1e-6 grid, per-query top-k with the
    neighbor_id tiebreak."""
    import duckdb

    from tmapreduce_spark.functions.similarity import QUANT, _buckets_of

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    E = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    Q = np.floor(E * QUANT + 0.5).astype(np.int64)
    buckets = _buckets_of(Q)
    nrm = np.sqrt(np.einsum("ij,ij->i", Q, Q).astype(np.float64))
    out = []
    for qi in range(len(ids)):
        if ids[qi] >= n_queries:
            continue
        m = (buckets == buckets[qi]) & (ids != ids[qi])
        if not m.any():
            continue
        dots = Q[m] @ Q[qi]
        cos = dots.astype(np.float64) / (nrm[m] * nrm[qi])
        cos = np.floor(cos * 1e6 + 0.5) / 1e6
        cand = sorted(
            zip(cos.tolist(), ids[m].tolist()), key=lambda t: (-t[0], t[1])
        )
        for rank, (c, nid) in enumerate(cand[:top_k], start=1):
            out.append((int(ids[qi]), int(nid), float(c), rank))
    return sorted(out)


def test_layout_ann_bucketed_matches_brute_force(spark):
    """The bucketed-layout ANN join must reproduce the brute-force
    same-bucket top-k exactly — every (query, neighbor, cosine, rank)."""
    from tmapreduce_spark.sources.bucketing import (
        N_ANN_BUCKETED_QUERIES,
        layout_ann_bucketed,
    )
    from tmapreduce_spark.functions.similarity import TOP_K

    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in layout_ann_bucketed(spark, SF_SMOKE).collect()
    )
    want = _brute_ann_bucketed(SF_SMOKE, N_ANN_BUCKETED_QUERIES, TOP_K)
    assert got == want


def test_layout_ann_bucketed_oracle_parity(spark, duck):
    """Spark vs DuckDB oracle, bit-exact at the smoke SF (the driver's gate
    replicated in-tree)."""
    from tmapreduce_spark.sources.bucketing import (
        _layout_ann_bucketed_sql,
        layout_ann_bucketed,
    )

    sp = sorted(tuple(r) for r in layout_ann_bucketed(spark, SF_SMOKE).collect())
    duck.execute(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{SF_SMOKE}/embeddings.parquet'"
    )
    orc = sorted(tuple(r) for r in duck.execute(_layout_ann_bucketed_sql()).fetchall())
    assert sp == orc


def test_layout_ann_bucketed_spark_bucket_bits_match_numpy(spark):
    """The JVM bucket expression (exact int64 plane dots) must agree with
    numpy's _buckets_of on every corpus row — the bit-exactness that makes
    the at-rest layout and the driver-side ann_lsh_topk interchangeable."""
    import duckdb

    from pyspark.sql import functions as F

    from tmapreduce_spark.functions.similarity import QUANT, _buckets_of
    from tmapreduce_spark.sources.bucketing import (
        _spark_bucket_expr,
        _spark_quant_expr,
    )
    from tmapreduce_spark.sources.catalog import load_table

    got = {
        r["vec_id"]: r["bucket"]
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", F.expr(_spark_quant_expr("embedding")).alias("qe"))
        .select("vec_id", F.expr(_spark_bucket_expr()).alias("bucket"))
        .collect()
    }
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    Q = np.floor(
        np.stack([np.asarray(r[1], dtype=np.float64) for r in rows]) * QUANT
        + 0.5
    ).astype(np.int64)
    want = dict(zip((r[0] for r in rows), _buckets_of(Q).tolist()))
    assert got == want


def test_layout_ann_bucketed_lone_vector_query_emits_nothing(spark, tmp_path):
    """Degenerate input: a query whose bucket contains only itself has no
    candidates — it must vanish from the output (no NULL row, no self
    pair), identically in the brute recompute."""
    from tmapreduce_spark.sources.bucketing import layout_ann_bucketed

    # vec 0 is axis-aligned on dim 0; planes give it some bucket; vecs 1-2
    # are copies of each other but far from 0 — craft so 0 is alone in its
    # bucket by construction (verified below, not assumed).
    from tmapreduce_spark.functions.similarity import QUANT, _buckets_of

    vecs = {
        0: [1.0] + [0.0] * 63,
        1: [0.0] * 62 + [1.0, -1.0],
        2: [0.0] * 62 + [1.0, -1.0],
    }
    Q = np.floor(
        np.stack([np.asarray(v) for v in vecs.values()]) * QUANT + 0.5
    ).astype(np.int64)
    b = _buckets_of(Q)
    if b[0] == b[1]:
        pytest.skip("crafted vectors unexpectedly share a bucket")
    pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [np.array(v, dtype=np.float32) for v in vecs.values()],
            "label": [0, 0, 0],
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = layout_ann_bucketed(spark, str(tmp_path)).collect()
    # queries 1 and 2 see each other; query 0 is absent entirely
    assert sorted((r["query_id"], r["neighbor_id"]) for r in got) == [
        (1, 2),
        (2, 1),
    ]
    assert all(r["rank"] == 1 for r in got)


# --------------------------- PNG decode (round 12) -------------------------


def _png_cases():
    return [(0, 5, 5), (37, 16, 13), (255, 6, 9), (101, 12, 5), (7, 16, 16)]


def test_png_roundtrip_matches_pixel_formula():
    """encode_png -> decode_png must reproduce the exact pixel sums, the
    top-left corner, and the filter signature computed independently from
    the pixel formula — across sizes that exercise every filter type and
    both odd and 4-aligned strides."""
    from tmapreduce_spark.functions.multimodal import (
        _pix_fn,
        decode_image,
        decode_pixels,
        decode_png,
        encode_png,
    )

    for seed, w, h in _png_cases():
        pix = _pix_fn(seed)
        img = encode_png(w, h, pix)
        got = decode_png(img)
        want_sum = sum(sum(pix(x, y)) for y in range(h) for x in range(w))
        r, g, b = pix(0, 0)
        want = (
            w, h, 3, want_sum, r + 256 * g + 65536 * b,
            sum(((3 * y) % 5) * (y + 1) for y in range(h)),
        )
        assert got == want, (seed, w, h)
        # full pixel-array decode agrees pixel-for-pixel, top-down
        pw, ph, px = decode_pixels(img)
        assert (pw, ph) == (w, h)
        assert px == [pix(x, y) for y in range(h) for x in range(w)]
        # the magic-dispatch path returns the 5-tuple contract
        assert decode_image(img) == want[:5]


def test_png_every_filter_type_is_load_bearing():
    """Force each single filter type across a whole image and check the
    decode — a broken Sub/Up/Average/Paeth unfilter fails its own case
    instead of hiding behind the mixed default schedule."""
    from tmapreduce_spark.functions.multimodal import (
        _pix_fn,
        decode_png,
        encode_png,
    )

    pix = _pix_fn(42)
    want_sum = sum(sum(pix(x, y)) for y in range(9) for x in range(7))
    for f in range(5):
        img = encode_png(7, 9, pix, filter_of_row=lambda y, f=f: f)
        w, h, _ch, psum, _corner, fsig = decode_png(img)
        assert (w, h, psum) == (7, 9, want_sum), f
        assert fsig == f * sum(y + 1 for y in range(9)), f


def test_png_decoder_rejects_corruption_and_unsupported():
    """CRC corruption and truncation raise ValueError; unsupported color
    types / bit depths / interlacing raise NotImplementedError (the honest
    gate — never a silent wrong decode)."""
    import struct
    import zlib

    from tmapreduce_spark.functions.multimodal import (
        _pix_fn,
        decode_png,
        encode_png,
    )

    img = bytearray(encode_png(8, 8, _pix_fn(3)))
    img[41] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError):
        decode_png(bytes(img))
    good = encode_png(8, 8, _pix_fn(3))
    with pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    for ihdr in (
        struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0),  # grayscale
        struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0),  # 16-bit
        struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1),  # interlaced
    ):
        with pytest.raises(NotImplementedError):
            decode_png(sig + chunk(b"IHDR", ihdr))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a" + b"X")  # bad signature


def test_png_multi_chunk_idat_is_exercised():
    """The encoder splits IDAT in two; a decoder that inflates only the
    first chunk must fail. Verify the fixture actually HAS two IDAT chunks
    (so the test is load-bearing) and that decode consumes both."""
    import struct

    from tmapreduce_spark.functions.multimodal import (
        _pix_fn,
        decode_png,
        encode_png,
    )

    img = encode_png(10, 10, _pix_fn(9))
    tags = []
    pos = 8
    while pos + 8 <= len(img):
        (ln,) = struct.unpack_from(">I", img, pos)
        tags.append(img[pos + 4 : pos + 8])
        pos += 12 + ln
    assert tags.count(b"IDAT") == 2, tags
    assert decode_png(img)[0:2] == (10, 10)


def test_multimodal_png_decode_oracle_parity(spark, duck):
    """The catalog entry, Spark vs DuckDB, bit-exact at the smoke SF."""
    from tmapreduce_spark.functions.multimodal import (
        MULTIMODAL_PNG_DECODE_SQL,
        multimodal_png_decode,
    )

    sp = sorted(tuple(r) for r in multimodal_png_decode(spark, SF_SMOKE).collect())
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    orc = sorted(tuple(r) for r in duck.execute(MULTIMODAL_PNG_DECODE_SQL).fetchall())
    assert sp == orc


def test_png_codec_property_random_images():
    """Hypothesis: ANY pixel content, ANY size, ANY per-row filter schedule
    round-trips bit-exactly through encode_png -> decode_png / decode_pixels
    — the unfilter algebra is inverse for arbitrary bytes, not just the
    deterministic fixture gradients."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tmapreduce_spark.functions.multimodal import (
        decode_pixels,
        decode_png,
        encode_png,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
        schedule=st.lists(st.integers(0, 4), min_size=12, max_size=12),
    )
    def prop(w, h, seed, schedule):
        import random

        rng = random.Random(seed)
        grid = {
            (x, y): (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for y in range(h)
            for x in range(w)
        }
        img = encode_png(w, h, lambda x, y: grid[(x, y)],
                         filter_of_row=lambda y: schedule[y])
        dw, dh, ch, psum, corner, fsig = decode_png(img)
        assert (dw, dh, ch) == (w, h, 3)
        assert psum == sum(sum(v) for v in grid.values())
        r, g, b = grid[(0, 0)]
        assert corner == r + 256 * g + 65536 * b
        assert fsig == sum(schedule[y] * (y + 1) for y in range(h))
        pw, ph, px = decode_pixels(img)
        assert px == [grid[(x, y)] for y in range(h) for x in range(w)]

    prop()
