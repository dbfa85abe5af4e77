"""The per-frame remap: batched gather + tint palette + optional RGB decode.

Reference hot loop: ``render_lensmap`` (``engine/NQ/fisheye.c:2406-2424``)
chases one pointer per screen pixel per frame, optionally through a
256-entry tint palette, writing 8-bit palette indices over the
``Draw_TileClear`` background.  The reference's fast path for such inner
loops is hand-written x86 assembly (``engine/common/d_draw.S`` etc.); the
TPU-native equivalent is a *layout* choice plus XLA gathers:

* Frames are stored **batch-innermost**: ``[MAX_PLATES, S, S, B]`` uint8.
  Flattened to ``[P, B]``, the per-pixel lensmap index selects a *row* of
  B contiguous bytes — an embedding-style row gather, the shape TPUs are
  built to do, instead of 2 M scalar pointer chases.
* The lensmap (``flat_idx``/``valid``/``tint``) is static across frames,
  so the whole screen's gather indices are a constant operand; XLA hoists
  and fuses the bounds/background select behind it.

Why the gather is XLA's and not a hand-written Pallas kernel: on TPU v5e
the dynamic row gather is bound by the chip's per-index gather capability
(~21 ns/row measured, independent of row width 128 B..1 KB), and every
alternative formulation measured *slower* — the full speed-of-light
analysis with numbers is in ``docs/PERF.md``.

Per-element palette work (rubix tint, RGB decode) cannot ride the VPU on
v5e (no byte-gather instruction; see ``docs/PERF.md`` §3), so the fast
path **precomputes it into the source**, exactly as the reference
precomputes its tint palettes once at init (``create_palmap``,
``fisheye.c:857-908``):

* rubix: the source is *expanded* to ``[2*MAX_PLATES, S, S, B]`` — raw
  plates followed by self-tinted plates (``palmap[p]`` applied) — and the
  tint decision folds into the **static gather indices** (grid-line
  pixels index the raw half, cell interiors the tinted half).  The
  per-frame cost of rubix is then zero.
* RGB decode: the source is decoded to packed RGBA little-endian uint32
  (``r | g<<8 | b<<16 | 0xff<<24``) at ingest, and the same row gather
  moves 4-byte texels.  This mirrors the reference, where palette->RGB
  conversion was the display adapter's job, not the engine's.

The kernel is compiled once per (H, W, S, B, dtype) — switching lens,
globe, or zoom only changes *data*, keeping the kernel warm as required
by the north star.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from blinky_tpu.palette import MAX_PLATES, create_palmap, rgba_lut


def remap_impl(frames, flat_idx, valid, tint, background, tint_lut, rgb_lut, *, rubix, decode_rgb):
    """Pure remap body; frames: [MAX_PLATES, S, S, B] u8 -> [H, W, B] u8
    (or [H, W, B, 3] with ``decode_rgb``).

    This is the fully general path (arbitrary per-element tint LUT); on
    TPU the per-element table lookups are slow — prefer the expanded-source
    path (:func:`remap_gather_impl` + :func:`expand_frames_tinted`) there.
    """
    P, S, _, B = frames.shape
    H, W = flat_idx.shape
    src = frames.reshape(P * S * S, B)

    idx = flat_idx.reshape(H * W)
    gathered = jnp.take(src, idx, axis=0)  # [H*W, B] u8  (row gather)

    if rubix:
        # one fused lookup: lut[(tint * 256 + value)]
        lut = tint_lut.reshape(-1)
        idx2 = tint.reshape(H * W, 1).astype(jnp.int32) * 256 + gathered.astype(jnp.int32)
        gathered = jnp.take(lut, idx2, axis=0)

    out = jnp.where(valid.reshape(H * W, 1), gathered, background.reshape(H * W, 1))
    out = out.reshape(H, W, B)

    if decode_rgb:
        out = jnp.take(rgb_lut, out.astype(jnp.int32), axis=0)  # [H, W, B, 3]
    return out


_remap = jax.jit(remap_impl, static_argnames=("rubix", "decode_rgb"))


def remap_gather_impl(frames, flat_idx, valid, background):
    """The pure-gather remap: frames [NP, S, S, B] (u8 or u32) -> [H, W, B].

    All palette work is already in the source (expanded / RGBA-decoded),
    so per frame this is exactly one row gather plus the background
    select — the whole per-frame cost of the reference's
    ``render_lensmap`` including rubix tinting.
    """
    B = frames.shape[-1]
    H, W = flat_idx.shape
    # any leading layout flattens to gather rows: [NP, S, S, B] plane
    # sources and [R, S, B] row-cropped sources (compact_rows) alike
    src = frames.reshape(-1, B)
    gathered = jnp.take(src, flat_idx.reshape(H * W), axis=0, mode="clip")
    out = jnp.where(valid.reshape(H * W, 1), gathered, background.reshape(H * W, 1))
    return out.reshape(H, W, B)


_remap_gather = jax.jit(remap_gather_impl)


def remap_gather_tint_impl(frames, flat_idx, valid, background, tint_rgb,
                           tint_mask):
    """Post-gather rubix tint for TRUE-COLOR (packed RGBA u32) sources.

    True-color tinting is pure elementwise integer math with no palette
    snap (``create_palmap``'s pull-toward-tint, ``fisheye.c:884-901``,
    minus the nearest-palette search) — so instead of doubling the
    source to the raw||tinted layout (10 u32 planes, which halves the
    feasible batch, ``docs/PERF.md`` §7), gather the RAW 4-6-plane
    source and apply ``c += percent*(t-c) >> 8`` per channel to the
    gathered screen under the static per-pixel tint mask: ~12 VPU
    int-ops/element against a 2x cut in HBM bytes.  Bit-identical to
    the expanded-source result (same integer arithmetic on the same
    texel; grid-line/invalid pixels keep the raw value).

    ``tint_rgb``: [H, W] u32 packed tint color per pixel;
    ``tint_mask``: [H, W] bool — tinted and valid.
    """
    B = frames.shape[-1]
    H, W = flat_idx.shape
    # any leading layout flattens to gather rows (plane sources and
    # texel-compacted [R, B] sources alike, as in remap_gather_impl)
    src = frames.reshape(-1, B)
    g = jnp.take(src, flat_idx.reshape(H * W), axis=0, mode="clip")
    res = apply_tint_rgba(g, tint_rgb.reshape(H * W, 1),
                          tint_mask.reshape(H * W, 1))
    out = jnp.where(valid.reshape(H * W, 1), res,
                    background.reshape(H * W, 1))
    return out.reshape(H, W, B)


def apply_tint_rgba(g, tint_rgb, tint_mask, xp=jnp):
    """The true-color rubix tint as pure elementwise math on already-
    gathered packed-RGBA u32 values (the arithmetic of
    :func:`remap_gather_tint_impl`, shared with the fused pano->screen
    kernel and the host remap): ``c += percent*(t-c) >> 8`` per channel
    under the static tint mask, alpha forced 0xFF on tinted texels —
    exactly like ``expand_frames_tinted_rgba``.  ``tint_rgb``/
    ``tint_mask`` must be broadcastable to ``g``; ``xp`` picks the
    jnp (device) or np (host) executor — integer math, bit-equal."""
    percent = 256 // MAX_PLATES
    a = (g >> 24) & xp.uint32(0xFF)
    a = xp.where(tint_mask, xp.uint32(0xFF), a)
    res = a << 24
    for shift in (0, 8, 16):
        c = ((g >> shift) & 0xFF).astype(xp.int32)
        t = ((tint_rgb >> shift) & 0xFF).astype(xp.int32)
        c2 = xp.clip(c + ((percent * (t - c)) >> 8), 0, 255)
        c = xp.where(tint_mask, c2, c)
        res = res | (c.astype(xp.uint32) << shift)
    return res


_remap_gather_tint = jax.jit(remap_gather_tint_impl)

_DUMMY_LUT = np.zeros((1,), np.uint8)


def expanded_flat_idx(lensmap):
    """Gather indices into the expanded (raw||tinted) source, [H, W] i32.

    Pixels whose rubix tint is a plate tint read from the tinted half
    (offset ``MAX_PLATES*S*S``); grid-line / untinted pixels read raw.
    Transcribes the tint branch of ``render_lensmap``
    (``fisheye.c:2416-2419``) into static index arithmetic.  Stays on the
    lensmap arrays' backend — device-built lensmaps never round-trip to
    the host for this (pose-tracked rubix playback rebuilds per chunk).
    """
    import jax

    from blinky_tpu.lensmap.builder import TINT_NONE

    S = lensmap.platesize
    xp = jnp if isinstance(lensmap.flat_idx, jax.Array) else np
    fi = xp.asarray(lensmap.flat_idx)
    tint = xp.asarray(lensmap.tint)
    valid = xp.asarray(lensmap.valid)
    off = xp.where((tint != TINT_NONE) & valid, MAX_PLATES * S * S, 0)
    return (fi + off).astype(xp.int32)


def compact_planes(lensmap, rubix: bool = False):
    """Renumber the gather indices onto only the source planes actually
    referenced — the batch-HBM recovery knob for the rich-output paths.

    The reference renders only displayed plates (``plates[i].display``,
    ``fisheye.c:763-794``); here the analog is dropping unused planes from
    the device-resident source.  panini@180 uses 5/6 plates, and the
    expanded (raw||tinted) rubix layout rarely needs all 12 planes — at
    1080p each dropped u8 plane frees ~1.17 MB x B of HBM (4x that for
    RGBA), which buys a larger batch B, which is what the per-index
    row-gather amortizes over (docs/PERF.md §1, §7).

    Returns ``(plane_ids, flat_idx)``: the source planes to keep (indices
    into the [MAX_PLATES, ...] or expanded [2*MAX_PLATES, ...] layout, in
    ascending order) and int32 [H, W] gather indices into the compacted
    ``[len(plane_ids), S, S]`` source.  Feed
    ``frames[np.asarray(plane_ids)]`` (or a source generated per-plane) to
    :func:`remap_gather_impl` with the returned indices.
    """
    lm = lensmap
    S = lm.platesize
    idx = np.asarray(expanded_flat_idx(lm) if rubix else lm.flat_idx)
    valid = np.asarray(lm.valid)
    planes = idx // (S * S)
    used = np.unique(planes[valid])
    if used.size == 0:
        used = np.array([0], np.int64)
    renumber = np.zeros(2 * MAX_PLATES, np.int32)
    renumber[used] = np.arange(used.size, dtype=np.int32)
    new_idx = np.where(valid, renumber[planes] * (S * S) + idx % (S * S), 0)
    return tuple(int(p) for p in used), new_idx.astype(np.int32)


def compact_rows(lensmap, rubix: bool = False):
    """Row-cropped source compaction: keep, per used plane, only the
    contiguous row range the lensmap's gather actually touches.

    One step past :func:`compact_planes` (same reference analog — render
    only what's displayed, ``fisheye.c:763-794``): panini@180 at 1080p
    touches ~3.7k of the 5.4k rows of its five used plates, so cropping
    each plate to its used row band frees another ~1/3 of the source HBM,
    which buys a larger batch for the row gather to amortize over.  Row
    bands (not column crops) because the flat gather-row layout is
    row-major within a plate — a row band stays one contiguous index
    range, so the remap stays the same single gather.

    Returns ``(slabs, flat_idx)``: ``slabs`` is a tuple of
    ``(plane_id, row_lo, row_hi)`` in ascending plane order describing the
    row-stacked cropped source ``[sum(hi-lo), S(, B)]``, and ``flat_idx``
    is int32 [H, W] gather indices into that stack's flat rows.  Build the
    source with ``np.concatenate([frames[p, lo:hi] for p, lo, hi in
    slabs])`` (or generate it at cropped size) and feed
    :func:`remap_gather_impl`.
    """
    lm = lensmap
    S = lm.platesize
    idx = np.asarray(expanded_flat_idx(lm) if rubix else lm.flat_idx)
    valid = np.asarray(lm.valid)
    planes = idx // (S * S)
    rows = (idx // S) % S
    slabs = []
    base = np.zeros(2 * MAX_PLATES, np.int64)  # per-plane: stack_base - lo
    total = 0
    for p in np.unique(planes[valid]):
        r = rows[valid & (planes == p)]
        lo, hi = int(r.min()), int(r.max()) + 1
        slabs.append((int(p), lo, hi))
        base[p] = total - lo
        total += hi - lo
    if not slabs:
        slabs.append((0, 0, 1))
    new_idx = np.where(valid, (base[planes] + rows) * S + idx % S, 0)
    return tuple(slabs), new_idx.astype(np.int32)


def crop_frames_rows(frames, slabs) -> np.ndarray:
    """Materialize the row-cropped source stack for :func:`compact_rows`:
    [P, S, S(, B)] -> [sum(hi-lo), S(, B)]."""
    frames = np.asarray(frames)
    return np.concatenate([frames[p, lo:hi] for p, lo, hi in slabs], axis=0)


def compact_texels(lensmap, rubix: bool = False):
    """Texel-level source compaction: keep exactly the unique texels the
    lensmap's gather references — the logical conclusion of
    :func:`compact_planes` / :func:`compact_rows`.

    Each gather-source row IS one texel (the remap's batch-innermost
    layout, module docstring), so the source can be any subset of texels
    in any order; the lensmap references at most H*W of them (panini@180
    at 1080p: 1.70 M unique of the 3.96 M row-cropped texels).  The
    rubix-expanded layout compacts to the SAME count — every screen
    pixel references exactly one texel of the raw||tinted space, so with
    texel compaction the rubix overlay costs zero extra source bytes.

    Returns ``(texels, flat_idx)``: ``texels`` is int64 [R] flat texel
    ids into the original ``[P*S*S]`` (or expanded ``[2*P*S*S]``) space,
    sorted ascending (preserves source locality), and ``flat_idx`` is
    int32 [H, W] gather indices into the compacted ``[R(, B)]`` source.
    Materialize with :func:`take_texels`, or generate per-texel via
    ``plane = texels // (S*S); py = texels // S % S; px = texels % S``.
    """
    lm = lensmap
    idx = np.asarray(expanded_flat_idx(lm) if rubix else lm.flat_idx)
    valid = np.asarray(lm.valid)
    uniq, inv = np.unique(idx[valid], return_inverse=True)
    if uniq.size == 0:
        uniq = np.zeros(1, np.int64)
    new_idx = np.zeros(idx.shape, np.int32)
    new_idx[valid] = inv.astype(np.int32)
    return uniq.astype(np.int64), new_idx


def take_texels(frames, texels) -> np.ndarray:
    """Materialize the texel-compacted source for :func:`compact_texels`:
    [P, S, S] -> [R] or [P, S, S, B] -> [R, B]."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        return frames.reshape(-1)[texels]
    return frames.reshape(-1, frames.shape[-1])[texels]


def expand_frames_tinted(frames, palette, palmap=None) -> np.ndarray:
    """Host-side source expansion for the fast rubix path.

    [P, S, S(, B)] u8 -> [2*MAX_PLATES, S, S(, B)]: raw plates (padded to
    MAX_PLATES) followed by each plate run through its own tint palette
    (``palmap[p]``, the reference's per-plate rubix tint,
    ``fisheye.c:2416-2419``).  Done once at ingest; the device remap then
    gets rubix for free.
    """
    frames = np.asarray(frames, dtype=np.uint8)
    if palmap is None:
        palmap = create_palmap(np.asarray(palette))
    S = frames.shape[1]
    out = np.zeros((2 * MAX_PLATES,) + frames.shape[1:], dtype=np.uint8)
    out[: frames.shape[0]] = frames
    for p in range(frames.shape[0]):
        out[MAX_PLATES + p] = palmap[p][frames[p]]
    return out


def expand_rubix_source(frames, palette, palmap=None) -> np.ndarray:
    """Dtype-dispatching rubix expansion: route a [P, S, S(, B)] source
    to :func:`expand_frames_tinted` (u8 via the per-plate tint palettes)
    or :func:`expand_frames_tinted_rgba` (packed-RGBA u32) — the one
    entry every batched/posed rubix producer shares."""
    frames = np.asarray(frames)
    if frames.dtype == np.uint32:
        return expand_frames_tinted_rgba(frames)
    return expand_frames_tinted(frames, palette, palmap=palmap)


def frames_to_rgba(frames, palette) -> np.ndarray:
    """Host-side palette decode to packed RGBA uint32 (little-endian
    r|g<<8|b<<16|ff<<24), same shape as *frames*.  The device remap then
    moves 4-byte texels through the identical gather."""
    lut = rgba_lut(np.asarray(palette))
    return lut[np.asarray(frames, dtype=np.uint8)]


def pack_rgba(rgb) -> np.ndarray:
    """[..., 3] (or [..., 4]) u8 -> packed RGBA uint32 (little-endian) —
    the true-color ingestion entry: any RGB cubemap source (PNG/PPM video
    frames, renders) becomes remap-ready texels, no palette involved."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.shape[-1] == 3:
        a = np.full(rgb.shape[:-1] + (1,), 255, np.uint8)
        rgb = np.concatenate([rgb, a], axis=-1)
    elif rgb.shape[-1] != 4:
        raise ValueError("pack_rgba expects a trailing RGB(A) axis")
    return (
        rgb[..., 0].astype(np.uint32)
        | (rgb[..., 1].astype(np.uint32) << 8)
        | (rgb[..., 2].astype(np.uint32) << 16)
        | (rgb[..., 3].astype(np.uint32) << 24)
    )


@functools.partial(jax.jit, static_argnums=(1,))
def _downsample_rgba(hi, k):
    # module-level jit: a per-call closure would retrace + recompile on
    # EVERY render_aa resolve (the executable cache keys on the wrapper
    # object identity)
    H, W = hi.shape[0] // k, hi.shape[1] // k
    rest = hi.shape[2:]
    out = jnp.full((H, W) + rest, jnp.uint32(0xFF) << 24)
    for shift in (0, 8, 16):
        c = ((hi >> shift) & 0xFF).astype(jnp.float32)
        c = c.reshape((H, k, W, k) + rest).mean(axis=(1, 3))
        out = out | (jnp.clip(c + 0.5, 0, 255).astype(jnp.uint32) << shift)
    return out


def downsample_rgba(hi, factor: int):
    """Box-average a packed-RGBA screen by ``factor`` along H and W —
    the resolve step of supersampled rendering (``Session.render_aa``).
    [kH, kW(, B)] u32 -> [H, W(, B)] u32, on device, per channel in f32
    with round-half-up."""
    hi = jnp.asarray(hi, jnp.uint32)
    if hi.shape[0] % factor or hi.shape[1] % factor:
        raise ValueError(f"screen {hi.shape[:2]} not divisible by {factor}")
    return _downsample_rgba(hi, int(factor))


def unpack_rgb(rgba) -> np.ndarray:
    """Packed RGBA uint32 -> [..., 3] u8 (drops alpha)."""
    rgba = np.asarray(rgba, dtype=np.uint32)
    return np.stack(
        [(rgba >> s).astype(np.uint8) for s in (0, 8, 16)], axis=-1)


def expand_frames_tinted_rgba(frames_rgba):
    """Rubix source expansion for TRUE-COLOR (packed RGBA u32) frames.

    [P, S, S(, B)] u32 -> [2*MAX_PLATES, S, S(, B)] u32: raw plates
    followed by per-plate tinted plates.  The tint applies the reference's
    exact integer pull-toward-tint arithmetic per channel
    (``c += percent*(tint-c) >> 8``, percent=256/6 — ``create_palmap``,
    ``fisheye.c:884-901``) but WITHOUT the final nearest-palette snap:
    with a continuous color source there is no palette to snap to, so the
    tint is exact rather than palette-quantized.

    Backend-generic: NumPy input stays on host; a jax array expands on
    device (pure elementwise integer math — ``Session.render_equirect``
    uses this to keep its rubix path on-chip)."""
    from blinky_tpu.palette import PLATE_TINTS

    xp = jnp if isinstance(frames_rgba, jnp.ndarray) else np
    frames_rgba = xp.asarray(frames_rgba, dtype=xp.uint32)
    percent = 256 // MAX_PLATES
    nplates = frames_rgba.shape[0]
    pad_shape = (MAX_PLATES - nplates,) + frames_rgba.shape[1:]
    pad = xp.zeros(pad_shape, xp.uint32)
    tinted_plates = []
    for p in range(nplates):
        tinted = xp.uint32(0xFF) << xp.uint32(24)  # alpha
        for ch, shift in enumerate((0, 8, 16)):
            c = ((frames_rgba[p] >> shift) & 0xFF).astype(xp.int32)
            t = int(PLATE_TINTS[p, ch])
            c = xp.clip(c + ((percent * (t - c)) >> 8), 0, 255)
            tinted = tinted | (c.astype(xp.uint32) << shift)
        tinted_plates.append(tinted)
    return xp.concatenate(
        [frames_rgba, pad, xp.stack(tinted_plates), pad], axis=0)


class RemapKernel:
    """Caches device-resident lensmap operands + LUTs for repeated frames.

    Usage::

        k = RemapKernel(lensmap, palette)     # palette: [256, 3] u8
        out = k(frames)                        # [6, S, S, B] u8 -> [H, W, B] u8

    Source variants (see module docstring):

    * ``[P<=6, S, S, B]`` u8 — plain palette-index frames; ``rubix=True``
      uses the general per-element LUT path (slow on TPU).
    * ``[12, S, S, B]`` u8 from :func:`expand_frames_tinted` — rubix rides
      the static indices; per-frame cost identical to the plain remap.
    * either of the above decoded by :func:`frames_to_rgba` (uint32) —
      output is packed RGBA u32 [H, W, B].
    """

    def __init__(self, lensmap, palette=None, background=None):
        from blinky_tpu import palette as pal

        self.lensmap = lensmap
        self.height_px = lensmap.height_px
        self.width_px = lensmap.width_px
        self.platesize = lensmap.platesize
        self.flat_idx = jnp.asarray(lensmap.flat_idx, dtype=jnp.int32)
        self._flat_idx_rubix = None  # lazy: costs host<->device roundtrips
        self.valid = jnp.asarray(lensmap.valid)
        self.tint = jnp.asarray(lensmap.tint, dtype=jnp.uint8)
        self.palette = None if palette is None else np.asarray(palette)
        if palette is not None:
            self.tint_lut = jnp.asarray(pal.tint_lut(self.palette))
            self.rgb_lut = jnp.asarray(self.palette, dtype=jnp.uint8)
        else:
            self.tint_lut = None
            self.rgb_lut = None
        if background is None:
            background = np.zeros((self.height_px, self.width_px), np.uint8)
        background = np.asarray(background)
        if background.dtype == np.uint32:
            # packed-RGBA background (true-color pipelines): keep it as
            # the RGBA background directly — host_remap parity.  The
            # old unconditional uint8 cast silently truncated it mod 256
            # and then re-decoded the garbage through the palette.
            self.background_np = background
            self.background = None  # u8 paths raise on use (__call__)
            self._background_rgba = jnp.asarray(background)
        else:
            self.background_np = background.astype(np.uint8, copy=False)
            self.background = jnp.asarray(self.background_np)
            self._background_rgba = None

    @property
    def flat_idx_rubix(self):
        if self._flat_idx_rubix is None:
            self._flat_idx_rubix = jnp.asarray(expanded_flat_idx(self.lensmap))
        return self._flat_idx_rubix

    @property
    def tint_rgb_mask(self):
        """(tint_rgb [H, W] u32, tint_mask [H, W] bool) for the
        post-gather true-color tint path.  Stays on the lensmap arrays'
        backend (device lensmaps never round-trip to the host)."""
        if getattr(self, "_tint_rgb_mask", None) is None:
            from blinky_tpu.lensmap.builder import TINT_NONE
            from blinky_tpu.palette import PLATE_TINTS

            lut = pack_rgba(np.concatenate(
                [PLATE_TINTS.astype(np.uint8),
                 np.zeros((1, 3), np.uint8)]))  # row TINT_NONE: masked
            xp = jnp if isinstance(self.lensmap.tint, jax.Array) else np
            tint = xp.asarray(self.lensmap.tint).astype(xp.int32)
            valid = xp.asarray(self.lensmap.valid)
            tr = xp.asarray(lut)[tint]
            tm = (tint != TINT_NONE) & valid
            self._tint_rgb_mask = (jnp.asarray(tr), jnp.asarray(tm))
        return self._tint_rgb_mask

    @property
    def background_rgba(self):
        if self._background_rgba is None:
            if self.palette is None:
                raise ValueError("RGBA remap needs a palette")
            self._background_rgba = jnp.asarray(frames_to_rgba(self.background_np, self.palette))
        return self._background_rgba

    def __call__(self, frames, rubix: bool = False, decode_rgb: bool = False):
        frames = jnp.asarray(frames)
        is_rgba = frames.dtype == jnp.uint32
        if not is_rgba and frames.dtype != jnp.uint8:
            frames = frames.astype(jnp.uint8)  # normalize palette indices
        squeeze = False
        if frames.ndim == 3:  # single frame [P, S, S]
            frames = frames[..., None]
            squeeze = True
        expanded = frames.shape[0] == 2 * MAX_PLATES
        if not expanded and frames.shape[0] != MAX_PLATES:
            pad = MAX_PLATES - frames.shape[0]
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad,) + frames.shape[1:], frames.dtype)], axis=0
            )

        if not is_rgba and self.background is None:
            # mirror host_remap/prep_posed_inputs: a u32 background under
            # a u8 source would silently promote the screen to a nonsense
            # mix of palette indices and packed RGBA
            raise ValueError("u8 frames need a u8 (palette-index) "
                             "background, got uint32")
        if expanded or is_rgba:
            idx = self.flat_idx_rubix if (rubix and expanded) else self.flat_idx
            bg = self.background_rgba if is_rgba else self.background
            if rubix and not expanded:
                # reachable only for u32 (u8 non-expanded rubix takes the
                # general LUT path below): true-color tint AFTER the
                # gather — raw 4-6-plane source, no expansion needed.
                # Batched pipelines should still pre-expand (the
                # elementwise tint on [H,W,B] goes HBM-bound ~2x slower,
                # docs/PERF.md §7); this path is for interactive
                # single-frame / equirect use where it removes the
                # per-frame source expansion entirely.
                tr, tm = self.tint_rgb_mask
                out = _remap_gather_tint(frames, idx, self.valid, bg, tr, tm)
            else:
                out = _remap_gather(frames, idx, self.valid, bg)
            if decode_rgb and not is_rgba:
                if self.rgb_lut is None:
                    raise ValueError("RemapKernel needs a palette for RGB decode")
                out = jnp.take(self.rgb_lut, out.astype(jnp.int32), axis=0)
        else:
            if (rubix or decode_rgb) and self.tint_lut is None:
                raise ValueError("RemapKernel needs a palette for rubix/RGB decode")
            out = _remap(
                frames,
                self.flat_idx,
                self.valid,
                self.tint,
                self.background,
                self.tint_lut if self.tint_lut is not None else jnp.asarray(_DUMMY_LUT),
                self.rgb_lut if self.rgb_lut is not None else jnp.asarray(_DUMMY_LUT),
                rubix=rubix,
                decode_rgb=decode_rgb,
            )
        if squeeze:
            out = out[..., 0, :] if (decode_rgb and not is_rgba) else out[..., 0]
        return out


def remap_frames(lensmap, frames, palette=None, background=None, rubix=False, decode_rgb=False):
    """One-shot convenience wrapper around :class:`RemapKernel`."""
    return RemapKernel(lensmap, palette, background)(frames, rubix=rubix, decode_rgb=decode_rgb)


def host_remap(lensmap, frame, palette=None, background=None,
               rubix=False, decode_rgb=False) -> np.ndarray:
    """Pure-NumPy single-frame remap — no device, no jit.

    The bind-first cold-serve path (``Session.render_host``): on a cold
    process the device gather kernel costs a ~45 s first compile through
    the axon relay, and the reference's loop never blocks
    (``fisheye.c:306-322``) — so the viewer paints host-gathered frames
    until a background warm finishes.  Bit-equal to :class:`RemapKernel`
    on the same lensmap for every source kind (u8, expanded raw||tinted,
    packed-RGBA u32; pinned in tests/test_viewer.py): the same tint LUT,
    the same expanded-index arithmetic, the same post-gather u32 tint
    (:func:`apply_tint_rgba`), ``mode="clip"`` like the device gather.

    ``frame``: one [P, S, S] u8/u32 frame.  Returns [H, W] (u8 or u32),
    or [H, W, 3] u8 with ``decode_rgb`` on a u8 source.
    """
    from blinky_tpu import palette as pal_mod
    from blinky_tpu.lensmap.builder import TINT_NONE

    lm = lensmap if isinstance(lensmap.flat_idx, np.ndarray) \
        else lensmap.to_numpy()
    frame = np.asarray(frame)
    if frame.ndim != 3:
        raise ValueError("host_remap takes one [P, S, S] frame")
    is_rgba = frame.dtype == np.uint32
    if not is_rgba:
        frame = frame.astype(np.uint8, copy=False)
    expanded = frame.shape[0] == 2 * MAX_PLATES
    # no platesize validation here on purpose: size mismatches clip,
    # exactly like RemapKernel (the bit-equality contract, test_cold_serve)
    idx = expanded_flat_idx(lm) if (rubix and expanded) else lm.flat_idx
    src = frame.reshape(-1)
    g = src[np.clip(idx, 0, src.size - 1)]  # [H, W], mode="clip"
    if rubix and not expanded:
        if is_rgba:
            # exactly RemapKernel.tint_rgb_mask's recipe, on the host
            lut = pack_rgba(np.concatenate(
                [pal_mod.PLATE_TINTS.astype(np.uint8),
                 np.zeros((1, 3), np.uint8)]))
            tint = lm.tint.astype(np.int32)
            tr = lut[tint]
            tm = (tint != TINT_NONE) & lm.valid
            g = apply_tint_rgba(g, tr, tm, xp=np)
        else:
            if palette is None:
                raise ValueError("host_remap needs a palette for u8 rubix")
            lut = pal_mod.tint_lut(np.asarray(palette))
            g = lut[lm.tint.astype(np.int32), g.astype(np.int32)]
    if background is None:
        background = np.zeros((lm.height_px, lm.width_px), np.uint8)
    bg = np.asarray(background).reshape(lm.height_px, lm.width_px)
    if is_rgba:
        if bg.dtype != np.uint32:
            if palette is None:
                raise ValueError("host_remap needs a palette for the RGBA "
                                 "background")
            bg = frames_to_rgba(bg, np.asarray(palette))
    elif bg.dtype == np.uint32:
        # mirror prep_posed_inputs/RemapKernel: np.where would silently
        # promote the u8 screen to a nonsense mix of palette indices
        # and packed RGBA
        raise ValueError("u8 frames need a u8 (palette-index) background, "
                         "got uint32")
    out = np.where(lm.valid, g, bg)
    if decode_rgb and not is_rgba:
        if palette is None:
            raise ValueError("host_remap needs a palette for RGB decode")
        out = np.asarray(palette, np.uint8)[out.astype(np.int32)]
    return out
