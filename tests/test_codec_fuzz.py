"""Codec robustness: malformed bytes must raise ValueError (the module
error contract), never crash with struct/index/zlib errors or hang.

The reference trusts its own files (PCX written by WritePCXfile is read
back by the same engine); this framework ingests user files, so every
decoder is fuzzed with truncations, bit flips, and random bytes."""

import numpy as np
import pytest

from blinky_tpu.io.dataset import parse_pose_track
from blinky_tpu.io.demfile import read_dem, write_dem
from blinky_tpu.io.gif import decode_gif, encode_gif
from blinky_tpu.io.pcx import decode_pcx, encode_pcx
from blinky_tpu.io.png import decode_png, encode_png
from blinky_tpu.io.ppm import decode_ppm, encode_ppm
from blinky_tpu.palette import default_palette

DECODERS = {
    "png": decode_png,
    "ppm": decode_ppm,
    "pcx": decode_pcx,
    "dem": lambda b: read_dem(b, keep_messages=True),
    "gif": decode_gif,
}


def _valid_samples():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (9, 13, 3), np.uint8)
    idx = rng.integers(0, 256, (9, 13), np.uint8)
    import io

    dem = io.BytesIO()

    class _P:  # write_dem takes a path; reuse via tmp buffer
        pass

    return {
        "png": encode_png(img),
        "ppm": encode_ppm(img),
        "pcx": encode_pcx(idx, default_palette()),
        "dem": _dem_bytes(),
        "gif": encode_gif(np.stack([idx, np.roll(idx, 3, 1)], axis=-1),
                          default_palette(), delay_cs=4),
    }


def _dem_bytes():
    import struct

    out = bytearray(b"-1\n")
    for i in range(4):
        msg = bytes([1]) * (i + 1)
        out += struct.pack("<i3f", len(msg), 1.0 * i, 2.0, 3.0) + msg
    return bytes(out)


@pytest.mark.parametrize("kind", sorted(DECODERS))
def test_truncations(kind):
    data = _valid_samples()[kind]
    decode = DECODERS[kind]
    decode(data)  # the intact sample must parse
    for cut in range(0, len(data), max(1, len(data) // 40)):
        try:
            decode(data[:cut])
        except ValueError:
            pass  # the documented failure mode


@pytest.mark.parametrize("kind", sorted(DECODERS))
def test_bit_flips(kind):
    data = bytearray(_valid_samples()[kind])
    decode = DECODERS[kind]
    rng = np.random.default_rng(1)
    for _ in range(200):
        i = int(rng.integers(len(data)))
        mutated = bytes(data[:i]) + bytes([data[i] ^ (1 << int(rng.integers(8)))]) + bytes(data[i + 1:])
        try:
            decode(mutated)
        except ValueError:
            pass


@pytest.mark.parametrize("kind", sorted(DECODERS))
def test_random_garbage(kind):
    decode = DECODERS[kind]
    rng = np.random.default_rng(2)
    for n in (0, 1, 7, 64, 500):
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            decode(blob)
        except ValueError:
            pass


def test_pose_track_garbage():
    for text in ("1 2 3 4\n", "x y z\n", "1 2\n"):
        with pytest.raises(ValueError):
            parse_pose_track(text)


def test_dem_writer_rejects_bad_shapes(tmp_path):
    with pytest.raises(ValueError, match="messages"):
        write_dem(tmp_path / "x.dem", np.zeros((2, 3)), messages=[b"a"])
