"""Animated GIF codec (`blinky_tpu/io/gif.py`): LZW correctness (native
C++ == pure-Python, both directions), container round-trips, and
cross-validation against an independent reader/writer (Pillow)."""

import io

import numpy as np
import pytest

from blinky_tpu import native
from blinky_tpu.io.gif import (
    _lzw_decode_py,
    _lzw_encode_py,
    decode_gif,
    encode_gif,
)
from blinky_tpu.palette import default_palette

PIL = pytest.importorskip("PIL.Image", reason="Pillow is the independent check")


def _datasets():
    rng = np.random.default_rng(0)
    return [
        rng.integers(0, 256, 10000).astype(np.uint8),  # worst case: random
        np.tile(np.arange(256, dtype=np.uint8), 50),   # dictionary-friendly
        np.zeros(70000, np.uint8),                     # runs + table overflow
        rng.integers(0, 4, 120000).astype(np.uint8),   # low-entropy long
        np.array([], np.uint8),
        np.array([7], np.uint8),
    ]


def test_lzw_native_matches_python_and_roundtrips():
    for data in _datasets():
        enc_py = _lzw_encode_py(data, 8)
        np.testing.assert_array_equal(_lzw_decode_py(enc_py, 8, data.size), data)
        if native.available():
            enc_nat = native.gif_lzw_encode(data, 8)
            assert enc_nat == enc_py
            np.testing.assert_array_equal(
                native.gif_lzw_decode(enc_py, 8, data.size), data)


def test_container_roundtrip_and_pil_agrees():
    rng = np.random.default_rng(1)
    pal = default_palette()
    frames = rng.integers(0, 256, (24, 40, 4)).astype(np.uint8)
    gif = encode_gif(frames, pal, delay_cs=7, loop=0)
    out, out_pal, delays = decode_gif(gif)
    np.testing.assert_array_equal(out, frames)
    np.testing.assert_array_equal(out_pal, pal)
    assert delays == [7] * 4

    im = PIL.open(io.BytesIO(gif))
    assert im.n_frames == 4
    assert im.info.get("duration") == 70  # ms
    for i in range(4):
        im.seek(i)
        np.testing.assert_array_equal(
            np.asarray(im.convert("RGB")), pal[frames[..., i]])


def test_single_frame_and_list_inputs():
    pal = default_palette()
    f = np.arange(300, dtype=np.uint16).astype(np.uint8).reshape(15, 20)
    one = decode_gif(encode_gif(f, pal))[0]
    np.testing.assert_array_equal(one[..., 0], f)
    many = decode_gif(encode_gif([f, f[::-1]], pal))[0]
    np.testing.assert_array_equal(many[..., 1], f[::-1])


def test_decode_pil_written_gif():
    """Third-party GIFs (Pillow-written: per-frame boxes, its own LZW
    packer) decode to the same RGB content."""
    rng = np.random.default_rng(2)
    pal = default_palette()
    frames = rng.integers(0, 64, (20, 30, 3)).astype(np.uint8)
    imgs = [PIL.fromarray(pal[frames[..., i]]).quantize(colors=256)
            for i in range(3)]
    buf = io.BytesIO()
    imgs[0].save(buf, format="GIF", save_all=True, append_images=imgs[1:],
                 duration=40, loop=0)
    out, out_pal, delays = decode_gif(buf.getvalue())
    assert out.shape == (20, 30, 3) and delays == [4, 4, 4]
    ref = PIL.open(buf)
    for i in range(3):
        ref.seek(i)
        got = out_pal[out[..., i]].astype(np.int64)
        want = np.asarray(ref.convert("RGB")).astype(np.int64)
        # frames with local color tables are snapped to the global
        # palette by nearest color: exact when the color exists there,
        # tiny quantization-distance error otherwise
        assert np.abs(got - want).mean() < 4.0


def test_decode_local_color_table_permutation_is_exact():
    """An LCT that permutes the global table remaps losslessly (every
    color has an exact global match)."""
    import struct

    pal = default_palette()
    f0 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    gif = bytearray(encode_gif(f0, pal))
    # append a second image with a permuted LCT and permuted indices
    perm = np.arange(256)[::-1].astype(np.uint8)
    f1_local = perm[f0]  # indices in LCT space; LCT[i] = pal[perm_inv...]
    lct = np.zeros((256, 3), np.uint8)
    lct[f1_local.reshape(-1), :] = pal[f0.reshape(-1), :]
    from blinky_tpu.io.gif import _lzw_encode, _subblocks

    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 16, 16, 0x87)
    img += lct.tobytes() + bytes([8]) + _subblocks(_lzw_encode(f1_local, 8))
    assert gif[-1] == 0x3B
    gif = bytes(gif[:-1]) + img + b"\x3b"
    out, out_pal, _ = decode_gif(gif)
    assert out.shape[-1] == 2
    # both frames decode to the same colors in global-palette space
    np.testing.assert_array_equal(out_pal[out[..., 1]], pal[f0])


def test_python_decoder_fuzz_error_contract():
    """The pure-Python LZW fallback honors the same ValueError contract as
    the native path (which test_codec_fuzz.py exercises)."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 500).astype(np.uint8)
    enc = _lzw_encode_py(data, 8)
    for cut in range(0, len(enc), 17):
        try:
            _lzw_decode_py(enc[:cut], 8, data.size)
        except ValueError:
            pass
    for _ in range(100):
        i = int(rng.integers(len(enc)))
        bad = enc[:i] + bytes([enc[i] ^ (1 << int(rng.integers(8)))]) + enc[i + 1:]
        try:
            _lzw_decode_py(bad, 8, data.size)
        except ValueError:
            pass


def test_encode_gif_validates_inputs():
    pal = default_palette()
    with pytest.raises(ValueError, match="frames"):
        encode_gif(np.zeros((2, 3, 4, 5), np.uint8), pal)
    with pytest.raises(ValueError, match="palette"):
        encode_gif(np.zeros((4, 4), np.uint8), np.zeros((16, 3), np.uint8))


def test_cli_reproject_gif(tmp_path):
    """`reproject --format gif` writes one animated file whose frames
    bit-equal the per-frame PCX output."""
    from blinky_tpu.cli import main
    from blinky_tpu.io.pcx import decode_pcx

    demo = tmp_path / "demo.npz"
    rc = main(["demo-synth", "--frames", "6", "--platesize", "24",
               "--out", str(demo)])
    assert rc == 0
    outdir = tmp_path / "gif_out"
    rc = main(["reproject", "--demo", str(demo), "--width", "48",
               "--height", "36", "--format", "gif", "--gif-delay", "6",
               "--outdir", str(outdir)])
    assert rc == 0
    frames, pal, delays = decode_gif((outdir / "warped.gif").read_bytes())
    assert frames.shape == (36, 48, 6) and delays == [6] * 6
    pcxdir = tmp_path / "pcx_out"
    rc = main(["reproject", "--demo", str(demo), "--width", "48",
               "--height", "36", "--format", "pcx", "--outdir", str(pcxdir)])
    assert rc == 0
    first, _ = decode_pcx((pcxdir / "frame000000.pcx").read_bytes())
    np.testing.assert_array_equal(frames[..., 0], first)


def test_gce_scope_resets_per_image():
    """A Graphic Control Extension governs only the single following image
    (GIF89a spec §23): transparency/disposal/delay must not leak into
    GCE-less frames."""
    import struct

    from blinky_tpu.io.gif import _lzw_encode, _subblocks

    pal = default_palette()
    f0 = np.full((4, 6), 7, np.uint8)
    f1 = np.zeros((4, 6), np.uint8)  # index 0 everywhere
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 6, 4, 0xF7, 99, 0)
    out += pal.tobytes()
    # frame 0: GCE with transparency on index 0, disposal 2, delay 9
    out += b"\x21\xf9" + bytes([4, (2 << 2) | 1]) + struct.pack("<H", 9)
    out += bytes([0, 0])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 4, 0)
    out += bytes([8]) + _subblocks(_lzw_encode(f0, 8))
    # frame 1: NO GCE — index 0 must be opaque, delay 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 4, 0)
    out += bytes([8]) + _subblocks(_lzw_encode(f1, 8))
    out += b"\x3b"
    frames, _, delays = decode_gif(bytes(out))
    assert delays == [9, 0]
    # frame 1 is fully index 0 (opaque overwrite), not stale frame-0 bytes
    np.testing.assert_array_equal(frames[..., 1], f1)


def test_encode_gif_range_validation():
    pal = default_palette()
    f = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="uint16"):
        encode_gif(np.stack([f, f], -1), pal, delay_cs=70000)
    with pytest.raises(ValueError, match="uint16"):
        encode_gif(np.stack([f, f], -1), pal, loop=-1)


def test_cli_reproject_true_color_gif(tmp_path):
    """`reproject --aa 2 --format gif`: the supersampled true-color run
    exports as one median-cut-quantized animation."""
    from blinky_tpu.cli import main

    demo = tmp_path / "demo.npz"
    assert main(["demo-synth", "--frames", "3", "--platesize", "24",
                 "--out", str(demo)]) == 0
    outdir = tmp_path / "gif_aa"
    rc = main(["reproject", "--demo", str(demo), "--width", "48",
               "--height", "36", "--aa", "2", "--format", "gif",
               "--outdir", str(outdir)])
    assert rc == 0
    frames, pal, _ = decode_gif((outdir / "warped.gif").read_bytes())
    assert frames.shape == (36, 48, 3)
    # quantized colors track the png output of the same run closely
    pngdir = tmp_path / "png_aa"
    assert main(["reproject", "--demo", str(demo), "--width", "48",
                 "--height", "36", "--aa", "2", "--format", "png",
                 "--outdir", str(pngdir)]) == 0
    from blinky_tpu.io.png import decode_png

    truth = decode_png((pngdir / "frame000000.png").read_bytes())
    err = np.abs(pal[frames[..., 0]].astype(int) - truth.astype(int))
    assert err.mean() < 8


def test_delta_rect_encoding_roundtrips_and_shrinks():
    """Frames encode only their changed bounding box; decode reproduces
    the full frames exactly, and a mostly-static sequence shrinks."""
    pal = default_palette()
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (60, 80), np.uint8)
    frames = np.repeat(base[..., None], 8, axis=-1).copy()
    for b in range(1, 8):  # a small moving sprite
        frames[10 + b:14 + b, 20 + b:26 + b, b] = b
    gif = encode_gif(frames, pal, delay_cs=4)
    out, out_pal, delays = decode_gif(gif)
    np.testing.assert_array_equal(out, frames)
    assert delays == [4] * 8
    # vs naive full-frame encoding: stack identical frames apart
    full = encode_gif(np.repeat(base[..., None], 8, axis=-1), pal)
    assert len(full) < len(encode_gif(frames[..., :1], pal)) * 3, \
        "static frames should cost almost nothing"
    # an unchanged frame costs ~a 1x1 rect
    two = encode_gif(np.stack([base, base], -1), pal)
    one = encode_gif(base, pal)
    assert len(two) - len(one) < 80

    im = PIL.open(io.BytesIO(gif))
    assert im.n_frames == 8
    for i in range(8):
        im.seek(i)
        np.testing.assert_array_equal(
            np.asarray(im.convert("RGB")), pal[frames[..., i]])
