"""Real-decoder unit tests: BMP/PPM encode→decode roundtrips, orientation
and padding correctness, and honest failure on formats that need PIL."""

from __future__ import annotations

import pytest

from tmapreduce_spark.functions.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


def _gradient(x: int, y: int) -> tuple[int, int, int]:
    return (x * 3 + y) % 256, (x + y * 5) % 256, (x * x + y) % 256


@pytest.mark.parametrize("w,h", [(1, 1), (4, 4), (5, 3), (7, 2), (16, 9)])
def test_bmp_roundtrip(w, h):
    # w=5,7 exercise non-zero row padding (w*3 not a multiple of 4)
    payload = encode_bmp(w, h, _gradient)
    dw, dh, ch, psum, corner = decode_bmp(payload)
    expect_sum = sum(sum(_gradient(x, y)) for x in range(w) for y in range(h))
    r, g, b = _gradient(0, 0)
    assert (dw, dh, ch) == (w, h, 3)
    assert psum == expect_sum, "padding bytes leaked into the pixel sum"
    assert corner == r + 256 * g + 65536 * b


@pytest.mark.parametrize("w,h", [(1, 1), (4, 4), (5, 3), (16, 9)])
def test_ppm_roundtrip(w, h):
    payload = encode_ppm(w, h, _gradient)
    dw, dh, ch, psum, corner = decode_ppm(payload)
    expect_sum = sum(sum(_gradient(x, y)) for x in range(w) for y in range(h))
    r, g, b = _gradient(0, 0)
    assert (dw, dh, ch, psum) == (w, h, 3, expect_sum)
    assert corner == r + 256 * g + 65536 * b


def test_bmp_corner_is_orientation_sensitive():
    """BMP stores rows bottom-up: the top-left pixel lives in the LAST
    stored row. A decoder reading rows naively top-down would return
    pix(0, h-1) here instead."""

    def pix(x, y):
        return (y * 10, 0, 0)  # red channel encodes the row index

    payload = encode_bmp(3, 5, pix)
    _, _, _, _, corner = decode_bmp(payload)
    assert corner == 0  # top row (y=0), not y=4 (which would give 40)


def test_ppm_header_comments_and_whitespace():
    base = encode_ppm(2, 2, _gradient)
    pixels = base[base.index(b"255\n") + 4 :]
    commented = b"P6\n# a comment line\n 2\t2 # trailing\n255\n" + pixels
    assert decode_ppm(commented) == decode_ppm(base)


def test_decode_image_dispatch_and_honest_failure():
    from tmapreduce_spark.functions.multimodal import decode_png, encode_png

    bmp = encode_bmp(4, 4, _gradient)
    ppm = encode_ppm(4, 4, _gradient)
    png = encode_png(4, 4, _gradient)
    assert decode_image(bmp) == decode_bmp(bmp)
    assert decode_image(ppm) == decode_ppm(ppm)
    # PNG decodes natively since r12 (stdlib zlib codec) — the dispatch
    # returns the shared 5-tuple contract, dropping PNG's filter_sig extra
    assert decode_image(png) == decode_png(png)[:5]
    # a PNG signature with garbage after it is a corrupt file, not an
    # unsupported format
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0....")  # JPEG magic needs PIL


def test_real_decode_entry_no_notimplemented(spark):
    """The catalog entry must execute the REAL decode branch for every
    fixture row — the NotImplementedError path is unreachable for
    fixture data (r04 verdict #5)."""
    from tests.conftest import SF_SMOKE
    from tmapreduce_spark.functions.multimodal import multimodal_decode_real

    rows = multimodal_decode_real(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["channels"] == 3
        assert 4 <= r["width"] <= 16 and 4 <= r["height"] <= 16
        assert r["pixel_sum"] > 0


def test_decode_pixels_rejects_truncated_ppm():
    """A PPM payload cut off mid-header must raise, never hang (the
    re-tokenizer bounds every scan on len(payload))."""
    import pytest

    from tmapreduce_spark.functions.multimodal import decode_pixels, encode_ppm

    good = encode_ppm(4, 4, lambda x, y: (x, y, 0))
    w, h, px = decode_pixels(good)
    assert (w, h, len(px)) == (4, 4, 16)
    with pytest.raises((ValueError, IndexError)):
        decode_pixels(b"P6\n4")  # header truncated after width digit
    with pytest.raises((ValueError, IndexError)):
        decode_pixels(b"P6\n# comment with no newline")
