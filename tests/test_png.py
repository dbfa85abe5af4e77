"""PNG codec (io/png.py): round trips, spec conformance, filters."""

import struct
import zlib

import numpy as np
import pytest

from blinky_tpu.io.png import decode_png, encode_png


def test_rgb_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 61, 3), dtype=np.uint8)
    data = encode_png(img)
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    np.testing.assert_array_equal(decode_png(data), img)


def test_gray_roundtrip():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    out = decode_png(encode_png(img))
    assert out.shape == (8, 8)
    np.testing.assert_array_equal(out, img)


def test_bad_inputs():
    with pytest.raises(ValueError, match="expects"):
        encode_png(np.zeros((4, 4, 4), np.uint8))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\nxyz")
    good = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
    good[-5] ^= 0xFF  # corrupt the IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    # truncation mid-chunk is a ValueError too, not a struct.error
    # (cut past IEND into IDAT's CRC so a chunk extends past the end)
    whole = encode_png(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(whole[:-14])
    # a crafted IHDR whose length != 13 but whose CRC is VALID must be a
    # ValueError too, not a struct.error (the byte-flip fuzz can't reach
    # this because the CRC check fires first on flipped bytes)
    import struct
    import zlib
    sig = whole[:8]
    body = whole[16:16 + 13] + b"\x00"  # 14-byte IHDR body
    crc = zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    rest = whole[8 + 4 + 4 + 13 + 4:]  # chunks after the original IHDR
    crafted = (sig + struct.pack(">I", 14) + b"IHDR" + body
               + struct.pack(">I", crc) + rest)
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(crafted)


def _png_with_filter(img, f):
    """Re-encode an RGB image using scanline filter f everywhere."""
    h, w, _ = img.shape
    prev = np.zeros(w * 3, np.int32)
    rows = []
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        left = np.roll(cur, 3)
        left[:3] = 0
        pl = np.roll(prev, 3)
        pl[:3] = 0
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # paeth
            p = left + prev - pl
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - pl)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, pl))
            enc = cur - pred
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        raw = tag + body
        return struct.pack(">I", len(body)) + raw + struct.pack(
            ">I", zlib.crc32(raw) & 0xFFFFFFFF)

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_decoder_handles_standard_filters(f):
    rng = np.random.default_rng(f)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(_png_with_filter(img, f)), img)


def test_cli_png_output(tmp_path):
    """remap --out x.png and reproject --format png write decodable RGB."""
    from blinky_tpu.cli import main as cli_main

    out = tmp_path / "warped.png"
    rc = cli_main(["remap", "--width", "64", "--height", "48",
                   "--out", str(out)])
    assert rc in (0, None)
    img = decode_png(out.read_bytes())
    assert img.shape == (48, 64, 3)

    demo = tmp_path / "demo.npz"
    cli_main(["demo-synth", "--frames", "3", "--platesize", "32",
              "--out", str(demo)])
    outdir = tmp_path / "frames"
    cli_main(["reproject", "--demo", str(demo), "--width", "48",
              "--height", "36", "--format", "png", "--outdir", str(outdir)])
    files = sorted(outdir.glob("*.png"))
    assert len(files) == 3
    assert decode_png(files[0].read_bytes()).shape == (36, 48, 3)
