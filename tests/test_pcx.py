"""PCX codec tests: reference-mode byte layout and RLE round trips."""

import numpy as np

from blinky_tpu.io.pcx import decode_pcx, encode_pcx
from blinky_tpu.palette import default_palette


def _img(h=33, w=47):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    img[5, :10] = 0xC5  # force escape bytes
    img[6, :10] = 0x3F
    return img


def test_reference_mode_roundtrip():
    pal = default_palette()
    img = _img()
    data = encode_pcx(img, pal, mode="reference")
    out, pal2 = decode_pcx(data)
    assert np.array_equal(out, img)
    assert np.array_equal(pal2, pal)


def test_reference_mode_byte_layout():
    """Mirror WritePCXplate's stream rule (fisheye.c:1445-1448): bytes
    >= 0xC0 escaped as (0xC1, b), others literal."""
    pal = default_palette()
    img = np.array([[0x10, 0xC0, 0xFE, 0x05]], np.uint8)
    data = encode_pcx(img, pal, mode="reference")
    body = data[128:-769]
    assert bytes(body) == bytes([0x10, 0xC1, 0xC0, 0xC1, 0xFE, 0x05])
    assert data[-769] == 0x0C  # palette marker


def test_rle_mode_roundtrip_and_smaller():
    pal = default_palette()
    img = np.zeros((64, 64), np.uint8)
    img[:32] = 7
    a = encode_pcx(img, pal, mode="reference")
    b = encode_pcx(img, pal, mode="rle")
    assert len(b) < len(a)
    out, _ = decode_pcx(b)
    assert np.array_equal(out, img)


def test_header_fields():
    pal = default_palette()
    data = encode_pcx(np.zeros((10, 20), np.uint8), pal)
    assert data[0] == 0x0A and data[1] == 5 and data[2] == 1 and data[3] == 8
    import struct

    xmin, ymin, xmax, ymax = struct.unpack_from("<4H", data, 4)
    assert (xmax + 1, ymax + 1) == (20, 10)


def test_python_fallback_matches_native():
    """With the native library disabled, the pure-Python encoders must
    produce byte-identical PCX streams (the fallback path is what ships on
    hosts without a toolchain)."""
    from unittest import mock

    import blinky_tpu.native as native
    from blinky_tpu.palette import default_palette

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 47), np.uint8)
    pal = default_palette()
    ref_n = encode_pcx(img, pal, "reference")
    rle_n = encode_pcx(img, pal, "rle")
    with mock.patch.object(native, "_lib", None), \
         mock.patch.object(native, "_tried", True):
        assert encode_pcx(img, pal, "reference") == ref_n
        assert encode_pcx(img, pal, "rle") == rle_n
        out, _ = decode_pcx(ref_n)
        assert np.array_equal(out, img)


def test_python_decode_rejects_malformed_like_native():
    import pytest
    """The pure-Python RLE decoder must reject truncated/overflowing
    bodies exactly like the native one (no silent clipping)."""
    from unittest import mock

    import blinky_tpu.native as native
    from blinky_tpu.palette import default_palette

    img = np.full((8, 8), 0xC5, np.uint8)
    pal = default_palette()
    data = bytearray(encode_pcx(img, pal, "rle"))
    # corrupt the final RLE packet into a 63-run that overflows the image
    data[-771] = 0xFF  # run length 63 with only 8 output slots left
    bad = bytes(data)
    with pytest.raises(ValueError):
        decode_pcx(bad)  # native decoder
    with mock.patch.object(native, "_lib", None), \
         mock.patch.object(native, "_tried", True):
        with pytest.raises(ValueError):
            decode_pcx(bad)  # pure-Python fallback, same strictness
