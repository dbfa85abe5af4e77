"""8-bit PCX codec.

The reference exports globe plates and screenshots as 8-bit paletted PCX
(``WritePCXplate``, ``engine/NQ/fisheye.c:1396-1465``, adapted from
``WritePCXfile``, ``engine/common/screen.c:681``).  Its encoder emits a
degenerate run-length stream: every byte with the top two bits set is
written as a run of one (``0xC1, byte``), everything else literally —
valid PCX, byte-reproduced here as ``mode="reference"`` so exported files
are identical to what the C writes for the same pixels.  ``mode="rle"``
produces proper run-length packing; :func:`decode_pcx` reads both.
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = struct.Struct("<4B6H48sBBHH58s")


def encode_pcx(image: np.ndarray, palette: np.ndarray, mode: str = "reference") -> bytes:
    """Encode a [H, W] uint8 index image + [256, 3] palette to PCX bytes."""
    image = np.asarray(image, dtype=np.uint8)
    h, w = image.shape
    header = _HEADER.pack(
        0x0A,  # manufacturer
        5,  # version: 256 color
        1,  # encoding: RLE
        8,  # bits per pixel
        0,
        0,
        w - 1,
        h - 1,  # xmin ymin xmax ymax
        w,
        h,  # hres vres
        b"\x00" * 48,  # 16-color palette (unused)
        0,  # reserved
        1,  # color planes
        w,  # bytes per line
        2,  # palette type: not grayscale
        b"\x00" * 58,
    )
    out = bytearray(header)
    from blinky_tpu import native

    body = native.pcx_encode_body(image, mode) if mode in ("reference", "rle") else None
    if body is not None:
        out += body
    elif mode == "reference":
        # fisheye.c:1445-1448: run-of-one escape for bytes >= 0xC0.
        flat = image.reshape(-1)
        esc = flat >= 0xC0
        n = flat.size + int(esc.sum())
        buf = np.empty(n, dtype=np.uint8)
        pos = np.arange(flat.size) + np.cumsum(esc) - esc.astype(np.int64)
        buf[pos[esc]] = 0xC1
        buf[pos + esc] = flat
        out += buf.tobytes()
    elif mode == "rle":
        for row in image:
            i = 0
            rb = bytearray()
            while i < w:
                run = 1
                while i + run < w and row[i + run] == row[i] and run < 63:
                    run += 1
                val = int(row[i])
                if run > 1 or val >= 0xC0:
                    rb.append(0xC0 | run)
                rb.append(val)
                i += run
            out += rb
    else:
        raise ValueError(f"unknown PCX mode {mode!r}")
    out.append(0x0C)  # palette marker
    out += np.asarray(palette, dtype=np.uint8).tobytes()[:768]
    return bytes(out)


def decode_pcx(data: bytes):
    """Decode PCX bytes -> ([H, W] uint8 image, [256, 3] uint8 palette)."""
    if len(data) < _HEADER.size:
        raise ValueError("truncated PCX header")
    (man, ver, enc, bpp, xmin, ymin, xmax, ymax, _hres, _vres,
     _pal16, _res, planes, bpl, _ptype, _fill) = _HEADER.unpack_from(data, 0)
    if man != 0x0A or bpp != 8 or planes != 1:
        raise ValueError("unsupported PCX variant")
    w = xmax - xmin + 1
    h = ymax - ymin + 1
    if w <= 0 or h <= 0 or bpl < w:
        raise ValueError("bad PCX dimensions")
    raw = np.frombuffer(data, dtype=np.uint8)
    pos = _HEADER.size
    total = h * bpl
    if enc == 1:
        from blinky_tpu import native

        # the RLE body ends 769 bytes before EOF when a VGA palette trailer
        # is present; the native decoder consumes exactly `total` outputs.
        nat = native.pcx_decode_body(data[pos:], total) if native.available() else None
        if nat is not None:
            row = nat
            pos = len(raw)
        else:
            # same strictness as the native decoder: truncated input or a
            # run overflowing the image is an error, not a silent clip
            row = np.empty(total, dtype=np.uint8)
            out_i = 0
            n = len(raw)
            while out_i < total:
                if pos >= n:
                    raise ValueError("truncated PCX body")
                b = int(raw[pos]); pos += 1
                if b >= 0xC0:
                    run = b & 0x3F
                    if pos >= n:
                        raise ValueError("truncated PCX body")
                    if out_i + run > total:
                        raise ValueError("truncated PCX body")
                    row[out_i : out_i + run] = raw[pos]
                    pos += 1
                    out_i += run
                else:
                    row[out_i] = b
                    out_i += 1
    else:
        row = raw[pos : pos + total].copy()
        pos += total
    pix = row.reshape(h, bpl)[:, :w].copy()
    # VGA palette trailer: 0x0C marker + 768 bytes at EOF.
    palette = np.zeros((256, 3), dtype=np.uint8)
    if len(raw) >= _HEADER.size + 769 and raw[-769] == 0x0C:
        palette = raw[-768:].reshape(256, 3).copy()
    return pix, palette
