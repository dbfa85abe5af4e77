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
  and fuses the tint/RGB table lookups behind it.
* Rubix tinting composes the 6 tint palettes + identity into one
  ``[7 * 256]`` LUT (row 6 = no tint) so the overlay costs a single extra
  small-table gather (``fisheye.c:2416-2419``).

The kernel is compiled once per (H, W, S, B, flags) — switching lens,
globe, or zoom only changes *data*, keeping the kernel warm as required
by the north star.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blinky_tpu.palette import MAX_PLATES


def remap_impl(frames, flat_idx, valid, tint, background, tint_lut, rgb_lut, *, rubix, decode_rgb):
    """Pure remap body; frames: [MAX_PLATES, S, S, B] u8 -> [H, W, B] u8
    (or [H, W, B, 3] with ``decode_rgb``)."""
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

_DUMMY_LUT = np.zeros((1,), np.uint8)


class RemapKernel:
    """Caches device-resident lensmap operands + LUTs for repeated frames.

    Usage::

        k = RemapKernel(lensmap, palette)     # palette: [256, 3] u8
        out = k(frames)                        # [6, S, S, B] u8 -> [H, W, B] u8
    """

    def __init__(self, lensmap, palette=None, background=None):
        from blinky_tpu import palette as pal

        self.lensmap = lensmap
        self.height_px = lensmap.height_px
        self.width_px = lensmap.width_px
        self.platesize = lensmap.platesize
        self.flat_idx = jnp.asarray(lensmap.flat_idx, dtype=jnp.int32)
        self.valid = jnp.asarray(lensmap.valid)
        self.tint = jnp.asarray(lensmap.tint, dtype=jnp.uint8)
        if palette is not None:
            self.tint_lut = jnp.asarray(pal.tint_lut(palette))
            self.rgb_lut = jnp.asarray(palette, dtype=jnp.uint8)
        else:
            self.tint_lut = None
            self.rgb_lut = None
        if background is None:
            background = np.zeros((self.height_px, self.width_px), np.uint8)
        self.background = jnp.asarray(background, dtype=jnp.uint8)

    def __call__(self, frames, rubix: bool = False, decode_rgb: bool = False):
        frames = jnp.asarray(frames, dtype=jnp.uint8)
        squeeze = False
        if frames.ndim == 3:  # single frame [P, S, S]
            frames = frames[..., None]
            squeeze = True
        if frames.shape[0] != MAX_PLATES:
            pad = MAX_PLATES - frames.shape[0]
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad,) + frames.shape[1:], jnp.uint8)], axis=0
            )
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
            out = out[..., 0, :] if decode_rgb else out[..., 0]
        return out


def remap_frames(lensmap, frames, palette=None, background=None, rubix=False, decode_rgb=False):
    """One-shot convenience wrapper around :class:`RemapKernel`."""
    return RemapKernel(lensmap, palette, background)(frames, rubix=rubix, decode_rgb=decode_rgb)
