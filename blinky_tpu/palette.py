"""8-bit palette handling: base palette, tint palettes, lookup tables.

The reference renders everything in 8-bit palette indices against the Quake
base palette (``host_basepal``, loaded from ``gfx/palette.lmp`` at
``engine/NQ/host.c:832``) and precomputes six 256->256 tint remap palettes
for the rubix indicatrix overlay (``create_palmap``,
``engine/NQ/fisheye.c:857-908``).

The Quake palette itself is id Software game data and is not shipped here;
:func:`default_palette` builds a deterministic 16-ramp x 16-level synthetic
palette with the same structure (index 0 black, ramp-major layout) so the
whole pipeline — tint NN search included — runs and validates end-to-end
without game assets.  Real palettes can be loaded from ``palette.lmp`` bytes
(:func:`load_lmp`) or from the text format written by the ``f_dumppal``
command (:func:`load_dumppal` / :func:`save_dumppal`;
reference ``fisheye.c:916-931``).
"""

from __future__ import annotations

import numpy as np

MAX_PLATES = 6  # fisheye.c:352

# Tint target colors per plate index, reference fisheye.c:863-886:
# white, blue, red, yellow, magenta, cyan.
PLATE_TINTS = np.array(
    [
        [255, 255, 255],
        [0, 0, 255],
        [255, 0, 0],
        [255, 255, 0],
        [255, 0, 255],
        [0, 255, 255],
    ],
    dtype=np.int64,
)

# "no tint" sentinel in the per-pixel tint plane (fisheye.c:732 memset 255).
NO_TINT = 255


def default_palette() -> np.ndarray:
    """Deterministic synthetic 256-color palette, [256, 3] uint8.

    16 ramps of 16 levels: ramp 0 is a gray ramp from black, ramps 1..14 are
    hue ramps, ramp 15 is a high-brightness "fullbright" ramp (Quake reserves
    its last rows for fullbrights).  Index 0 is black like the Quake palette.
    """
    hues = np.array(
        [
            [255, 255, 255],  # gray ramp
            [127, 107, 95],  # brown
            [95, 127, 159],  # steel blue
            [127, 159, 95],  # green
            [159, 95, 95],  # red-brown
            [159, 127, 95],  # tan
            [255, 191, 127],  # skin
            [255, 127, 127],  # salmon
            [191, 95, 159],  # purple
            [127, 95, 191],  # violet
            [95, 159, 159],  # teal
            [159, 159, 95],  # olive
            [95, 95, 255],  # blue
            [255, 95, 95],  # red
            [95, 255, 95],  # green2
            [255, 255, 127],  # fullbright yellow-white
        ],
        dtype=np.float64,
    )
    idx = np.arange(256)
    ramp, level = idx // 16, idx % 16
    t = (level + 1) / 16.0
    rgb = hues[ramp] * t[:, None]
    pal = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    pal[0] = 0
    return pal


def load_lmp(data: bytes) -> np.ndarray:
    """Parse a 768-byte ``palette.lmp`` (256 RGB triples) -> [256, 3] uint8."""
    if len(data) < 768:
        raise ValueError(f"palette.lmp must be >= 768 bytes, got {len(data)}")
    return np.frombuffer(data[:768], dtype=np.uint8).reshape(256, 3).copy()


def save_dumppal(pal: np.ndarray) -> str:
    """Serialize in the ``f_dumppal`` text format: ``r, g, b,`` per line
    (reference ``fisheye.c:925-928``)."""
    return "".join(f"{r}, {g}, {b},\n" for r, g, b in pal.astype(int))


def load_dumppal(text: str) -> np.ndarray:
    vals = [int(tok) for tok in text.replace(",", " ").split()]
    if len(vals) < 768:
        raise ValueError("dumppal text must contain 256 RGB triples")
    return np.array(vals[:768], dtype=np.uint8).reshape(256, 3)


def find_closest_pal_index(pal: np.ndarray, r, g, b) -> np.ndarray:
    """Nearest palette index by squared RGB distance, **first minimum wins**.

    Reference ``fisheye.c:835-855`` scans indices 0..255 with a strict ``<``
    so the earliest index wins ties; ``argmin`` (first occurrence) matches.
    Vectorized over broadcastable r, g, b.
    """
    pal = pal.astype(np.int64)
    r = np.asarray(r, dtype=np.int64)[..., None]
    g = np.asarray(g, dtype=np.int64)[..., None]
    b = np.asarray(b, dtype=np.int64)[..., None]
    dist = (pal[:, 0] - r) ** 2 + (pal[:, 1] - g) ** 2 + (pal[:, 2] - b) ** 2
    return np.argmin(dist, axis=-1).astype(np.uint8)


def create_palmap(pal: np.ndarray) -> np.ndarray:
    """Six tint palettes, [6, 256] uint8.

    Transcribes ``create_palmap`` (``fisheye.c:857-908``): each base color is
    pulled 1/6 of the way (``percent = 256/6 = 42``, integer) toward the
    plate tint using C integer arithmetic ``c += percent*(tint-c) >> 8``
    (arithmetic shift, i.e. floor — matched by NumPy's ``>>`` on int64),
    then snapped to the nearest base-palette entry.
    """
    from blinky_tpu import native

    nat = native.palmap_build(pal)
    if nat is not None:
        return nat

    percent = 256 // MAX_PLATES
    base = pal.astype(np.int64)  # [256, 3]
    tinted = base[None, :, :] + ((percent * (PLATE_TINTS[:, None, :] - base)) >> 8)
    tinted = np.clip(tinted, 0, 255)  # fisheye.c:899-901
    return find_closest_pal_index(pal, tinted[..., 0], tinted[..., 1], tinted[..., 2])


def rgba_lut(pal: np.ndarray) -> np.ndarray:
    """Packed RGBA decode table, [256] uint32 little-endian
    ``r | g<<8 | b<<16 | 0xff<<24``.  The reference never decodes to RGB
    in the engine (the 8-bit display palette did it); this is the
    framework's video-export equivalent, applied at ingest so the remap
    gather moves 4-byte texels (see kernels/remap.py)."""
    p = pal.astype(np.uint32)
    return p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | np.uint32(0xFF000000)


def tint_lut(pal: np.ndarray) -> np.ndarray:
    """Combined tint LUT, [7, 256] uint8: rows 0..5 are the plate tint
    palettes, row 6 is identity (the ``tint == 255`` no-filter branch of
    ``render_lensmap``, ``fisheye.c:2416-2419``)."""
    lut = np.empty((MAX_PLATES + 1, 256), dtype=np.uint8)
    lut[:MAX_PLATES] = create_palmap(pal)
    lut[MAX_PLATES] = np.arange(256, dtype=np.uint8)
    return lut


def quantize_rgb(rgb, ncolors: int = 256):
    """Median-cut color quantization: RGB -> (palette [256, 3] u8,
    indices u8 of the input's shape minus the channel axis).

    The bridge from the framework's true-color outputs (RGBA decode,
    supersampled ``render_aa``, equirect ingestion) back into the
    engine's palettized world — e.g. animated-GIF export of a
    true-color reproject run.  Classic median cut: recursively split the
    occupied color box with the largest pixel count along its widest
    channel at the median, then average each box; pixels map through the
    same first-minimum nearest-color search the tint palettes use
    (``find_closest_pal_index``, ``fisheye.c:835-855``), evaluated once
    per distinct color.  Deterministic (no dithering, ties split by
    channel order), lossless whenever the input has <= *ncolors*
    distinct colors.
    """
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.shape[-1] != 3:
        raise ValueError("quantize_rgb expects [..., 3] RGB")
    if not 1 <= int(ncolors) <= 256:
        raise ValueError("ncolors must be 1..256 (u8 indices)")
    ncolors = int(ncolors)
    flat = rgb.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.uint32)
              | (flat[:, 1].astype(np.uint32) << 8)
              | (flat[:, 2].astype(np.uint32) << 16))
    uniq, inv, counts = np.unique(packed, return_inverse=True,
                                  return_counts=True)
    colors = np.stack([uniq & 0xFF, (uniq >> 8) & 0xFF,
                       (uniq >> 16) & 0xFF], axis=1).astype(np.int64)

    pal = np.zeros((256, 3), dtype=np.uint8)
    if len(uniq) <= ncolors:
        pal[: len(uniq)] = colors
        idx = inv.astype(np.uint8).reshape(rgb.shape[:-1])
        return pal, idx
    del flat, packed  # the distinct-color histogram is all we need now

    # median cut over the distinct-color histogram
    boxes = [np.arange(len(uniq))]
    while len(boxes) < ncolors:
        # split the box with the most pixels that still has >1 color
        weights = [counts[b].sum() if len(b) > 1 else -1 for b in boxes]
        i = int(np.argmax(weights))
        if weights[i] < 0:
            break
        box = boxes[i]
        spans = colors[box].max(axis=0) - colors[box].min(axis=0)
        ch = int(np.argmax(spans))
        order = box[np.argsort(colors[box, ch], kind="stable")]
        # median by pixel population, not by distinct-color count
        csum = np.cumsum(counts[order])
        split = int(np.searchsorted(csum, csum[-1] / 2)) + 1
        split = min(max(split, 1), len(order) - 1)
        boxes[i] = order[:split]
        boxes.append(order[split:])
    for j, box in enumerate(boxes):
        w = counts[box].astype(np.float64)
        pal[j] = np.round((colors[box] * w[:, None]).sum(0) / w.sum())
    # nearest-color per DISTINCT color, chunked: the vectorized search
    # materializes [U, P] int64 temporaries, which for a smooth-shaded
    # capture (U ~ 1e6 distinct colors) would spike multiple GB at once.
    # Search only the FILLED prefix — the zero tail would act as extra
    # black entries and siphon dark colors to unused indices.
    used = pal[: len(boxes)]
    lut = np.empty(len(uniq), dtype=np.uint8)
    for lo in range(0, len(uniq), 65536):
        hi = lo + 65536
        lut[lo:hi] = find_closest_pal_index(
            used, colors[lo:hi, 0], colors[lo:hi, 1], colors[lo:hi, 2])
    return pal, lut[inv].reshape(rgb.shape[:-1])
