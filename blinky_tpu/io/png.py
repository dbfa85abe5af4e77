"""Minimal PNG codec (stdlib ``zlib`` only) for RGB/grayscale export.

The reference's only image export is palette PCX (``WritePCXfile``,
``common/screen.c:681``); this adds the web-native container the browser
viewer (``cli serve``) and the video-export pipeline need, with zero new
dependencies.  Encoder emits 8-bit color type 2 (RGB) or 0 (gray) with
filter 0 scanlines; the decoder accepts any standard filter (0-4) on
those color types so third-party RGB PNGs round-trip too.  Unfiltering
is sequential by nature (rows chain, and Sub/Average/Paeth chain on the
left pixel), so it runs in the native C++ runtime when built — a
2048×4096 Paeth-filtered pano decodes in ~1.2 s vs ~170 s through the
NumPy fallback.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    raw = tag + body
    return struct.pack(">I", len(body)) + raw + struct.pack(
        ">I", zlib.crc32(raw) & 0xFFFFFFFF
    )


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """[H, W, 3] or [H, W] uint8 -> PNG bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[..., None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError("encode_png expects [H, W, 3] RGB or [H, W] gray")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    scan = np.empty((h, 1 + w * channels), np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = img.reshape(h, w * channels)
    idat = zlib.compress(scan.tobytes(), compress_level)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(scan: np.ndarray, channels: int) -> np.ndarray:
    """Undo PNG scanline filters (spec §6); scan is [H, 1 + W*C] u8.

    None/Up are whole-row vector ops and Sub is a per-channel cumulative
    sum; Average/Paeth have a true left-to-right dependency, so they run
    one x-step at a time with all channels vectorized (W iterations per
    row, not W*C)."""
    h = scan.shape[0]
    stride = scan.shape[1] - 1
    out = np.zeros((h, stride), np.int32)
    bpp = channels
    w = stride // bpp
    for y in range(h):
        f = int(scan[y, 0])
        cur = scan[y, 1:].astype(np.int32)
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: out[x] = cur[x] + out[x-bpp] = prefix sum
            out[y] = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential in x
            cur2 = cur.reshape(w, bpp)
            prev2 = prev.reshape(w, bpp)
            row = out[y].reshape(w, bpp)
            a = np.zeros(bpp, np.int32)  # left pixel (decoded)
            c0 = np.zeros(bpp, np.int32)  # upper-left pixel
            for x in range(w):
                b = prev2[x]
                if f == 3:
                    v = cur2[x] + ((a + b) >> 1)
                else:
                    p = a + b - c0
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c0)
                    pr = np.where((pa <= pb) & (pa <= pc), a,
                                  np.where(pb <= pc, b, c0))
                    v = cur2[x] + pr
                a = row[x] = v & 0xFF
                c0 = b
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> [H, W, 3] uint8 (RGB) or [H, W] (gray).

    Supports what :func:`encode_png` emits plus standard filters:
    8-bit, color type 0 or 2, no interlace, no palette.
    """
    if not data.startswith(_SIG):
        raise ValueError("not a PNG")
    pos, ihdr, idat = len(_SIG), None, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG (chunk extends past end of data)")
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            if length != 13:  # crafted length with a valid CRC would
                raise ValueError("bad IHDR length")  # hit struct.error
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type} "
            f"interlace={interlace}); decoder handles 8-bit gray/RGB only"
        )
    channels = 3 if color_type == 2 else 1
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"bad PNG image data: {e}") from None
    stride = 1 + w * channels
    if len(raw) != h * stride:
        raise ValueError("PNG data size mismatch")
    scan = np.frombuffer(raw, np.uint8).reshape(h, stride)
    from blinky_tpu import native

    # the unfilter is sequential by nature (rows chain, Sub/Average/Paeth
    # also chain on the left pixel) — the C++ path is the difference
    # between ms and tens of seconds on a real 4K Paeth-filtered pano
    un = native.png_unfilter(scan, channels)
    if un is None:
        un = _unfilter(scan, channels)
    img = un.reshape(h, w, channels)
    return img[..., 0] if channels == 1 else img
