"""Expanded-source remap paths: rubix-by-static-index and RGBA decode.

The fast TPU paths precompute palette work into the source
(kernels/remap.py module docstring; perf rationale in docs/PERF.md).
These tests pin them bit-exactly to the general per-element LUT path,
which is itself pinned to the C semantics by test_remap / the oracle.
"""

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.io.cubemap import synthetic_cubemap, synthetic_cubemap_batch
from blinky_tpu.kernels.remap import (
    RemapKernel,
    expand_frames_tinted,
    expand_frames_tinted_rgba,
    expanded_flat_idx,
    frames_to_rgba,
)
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import MAX_PLATES, default_palette, rgba_lut

W, H, S = 96, 64, 64


@pytest.fixture(scope="module")
def setup():
    g = globes.get("cube")
    lens = lenses.get("fisheye1", g)  # circular bound -> invalid corners
    scale = calc_scale(Zoom("contain"), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    pal = default_palette()
    bg = (np.arange(H * W).reshape(H, W) % 251).astype(np.uint8)
    kernel = RemapKernel(lm, pal, bg)
    frames = synthetic_cubemap_batch(S, 3)
    return lm, pal, bg, kernel, frames


def test_lensmap_has_invalid_pixels(setup):
    lm = setup[0]
    assert not np.asarray(lm.valid).all()


def test_expanded_rubix_matches_lut_path(setup):
    lm, pal, bg, kernel, frames = setup
    ref = np.asarray(kernel(frames, rubix=True))
    ex = expand_frames_tinted(frames, pal)
    assert ex.shape == (2 * MAX_PLATES, S, S, 3)
    out = np.asarray(kernel(ex, rubix=True))
    np.testing.assert_array_equal(out, ref)


def test_expanded_no_rubix_matches_plain(setup):
    lm, pal, bg, kernel, frames = setup
    ref = np.asarray(kernel(frames))
    out = np.asarray(kernel(expand_frames_tinted(frames, pal)))
    np.testing.assert_array_equal(out, ref)


def test_rgba_source_matches_decoded_output(setup):
    lm, pal, bg, kernel, frames = setup
    idx_out = np.asarray(kernel(frames))  # [H, W, B] u8
    ref = rgba_lut(pal)[idx_out]
    out = np.asarray(kernel(frames_to_rgba(frames, pal)))
    assert out.dtype == np.uint32
    np.testing.assert_array_equal(out, ref)


def test_rgba_expanded_rubix(setup):
    lm, pal, bg, kernel, frames = setup
    ref = rgba_lut(pal)[np.asarray(kernel(frames, rubix=True))]
    src = frames_to_rgba(expand_frames_tinted(frames, pal), pal)
    out = np.asarray(kernel(src, rubix=True))
    np.testing.assert_array_equal(out, ref)


def test_rgba_background_on_invalid(setup):
    lm, pal, bg, kernel, frames = setup
    out = np.asarray(kernel(frames_to_rgba(frames, pal)))
    invalid = ~np.asarray(lm.valid)
    exp = rgba_lut(pal)[bg][invalid][:, None]
    np.testing.assert_array_equal(out[invalid], np.broadcast_to(exp, out[invalid].shape))


def test_rubix_on_plain_rgba_takes_post_gather_path(setup):
    """Round 3: a raw (non-expanded) u32 source with rubix no longer
    raises — the kernel tints after the gather, matching the expanded
    layout bit-exactly (see test_post_gather_tint_equals_expanded_source
    for the full pin)."""
    lm, pal, bg, kernel, frames = setup
    rgba = frames_to_rgba(frames, pal)
    out = np.asarray(kernel(rgba, rubix=True))
    ref = np.asarray(kernel(expand_frames_tinted_rgba(rgba), rubix=True))
    np.testing.assert_array_equal(out, ref)


def test_expanded_flat_idx_offsets(setup):
    lm = setup[0]
    from blinky_tpu.lensmap.builder import TINT_NONE

    fi = expanded_flat_idx(lm)
    tinted = (np.asarray(lm.tint) != TINT_NONE) & np.asarray(lm.valid)
    np.testing.assert_array_equal(
        fi - np.asarray(lm.flat_idx), np.where(tinted, MAX_PLATES * S * S, 0)
    )


def test_single_frame_expanded(setup):
    lm, pal, bg, kernel, _ = setup
    frame = synthetic_cubemap(S)
    ref = np.asarray(kernel(frame, rubix=True))
    out = np.asarray(kernel(expand_frames_tinted(frame, pal), rubix=True))
    np.testing.assert_array_equal(out, ref)


def test_compact_planes_matches_full_source():
    """compact_planes drops unused source planes; gathering the compacted
    source through the renumbered indices must equal the full remap, for
    the plain, rubix-expanded and RGBA paths."""
    import jax.numpy as jnp

    from blinky_tpu import globes, lenses
    from blinky_tpu.kernels.remap import (
        RemapKernel, compact_planes, expand_frames_tinted, frames_to_rgba,
        remap_gather_impl,
    )
    from blinky_tpu.io.cubemap import synthetic_cubemap_batch
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette

    W, H, S, B = 64, 48, 32, 5
    g = globes.get("cube")
    lens = lenses.get("panini", g)  # fov 180: the back plate is unused
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    pal = default_palette()
    k = RemapKernel(lm, pal)
    frames = synthetic_cubemap_batch(S, B)

    # plain u8
    ids, cidx = compact_planes(lm)
    assert len(ids) < 6 and 3 not in ids  # back plate dropped
    full = np.asarray(k(jnp.asarray(frames)))
    comp = np.asarray(remap_gather_impl(
        jnp.asarray(frames[np.asarray(ids)]), jnp.asarray(cidx),
        k.valid, k.background))
    np.testing.assert_array_equal(comp, full)

    # rubix via the expanded layout
    ex = expand_frames_tinted(frames, pal)
    ids_r, cidx_r = compact_planes(lm, rubix=True)
    assert len(ids_r) < 12
    full_r = np.asarray(k(jnp.asarray(ex), rubix=True))
    comp_r = np.asarray(remap_gather_impl(
        jnp.asarray(ex[np.asarray(ids_r)]), jnp.asarray(cidx_r),
        k.valid, k.background))
    np.testing.assert_array_equal(comp_r, full_r)

    # RGBA u32 through the same compacted indices
    rgba = frames_to_rgba(ex, pal)
    bg_rgba = k.background_rgba
    full_rgba = np.asarray(remap_gather_impl(
        jnp.asarray(rgba), k.flat_idx_rubix, k.valid, bg_rgba))
    comp_rgba = np.asarray(remap_gather_impl(
        jnp.asarray(rgba[np.asarray(ids_r)]), jnp.asarray(cidx_r),
        k.valid, bg_rgba))
    np.testing.assert_array_equal(comp_rgba, full_rgba)


def test_compact_rows_matches_full_source():
    """compact_rows crops each used plane to its touched row band;
    gathering the row-stacked cropped source through the renumbered
    indices must equal the full remap (plain, rubix-expanded, RGBA) —
    and the on-device cropped-source generator must be bit-identical to
    the matching rows of the full device_source."""
    import jax.numpy as jnp

    from blinky_tpu import globes, lenses
    from blinky_tpu.bench.throughput import device_source, device_source_rows
    from blinky_tpu.io.cubemap import synthetic_cubemap_batch
    from blinky_tpu.kernels.remap import (
        RemapKernel, compact_rows, crop_frames_rows, expand_frames_tinted,
        frames_to_rgba, remap_gather_impl,
    )
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette

    W, H, S, B = 64, 48, 32, 5
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    pal = default_palette()
    k = RemapKernel(lm, pal)
    frames = synthetic_cubemap_batch(S, B)

    # plain u8
    slabs, cidx = compact_rows(lm)
    total_rows = sum(hi - lo for _, lo, hi in slabs)
    assert total_rows < 6 * S  # cropped tighter than the full source
    cropped = crop_frames_rows(frames, slabs)
    assert cropped.shape == (total_rows, S, B)
    full = np.asarray(k(jnp.asarray(frames)))
    comp = np.asarray(remap_gather_impl(
        jnp.asarray(cropped), jnp.asarray(cidx), k.valid, k.background))
    np.testing.assert_array_equal(comp, full)

    # rubix via the expanded layout
    ex = expand_frames_tinted(frames, pal)
    slabs_r, cidx_r = compact_rows(lm, rubix=True)
    full_r = np.asarray(k(jnp.asarray(ex), rubix=True))
    comp_r = np.asarray(remap_gather_impl(
        jnp.asarray(crop_frames_rows(ex, slabs_r)), jnp.asarray(cidx_r),
        k.valid, k.background))
    np.testing.assert_array_equal(comp_r, full_r)

    # RGBA u32 through the same row-cropped indices
    rgba = frames_to_rgba(ex, pal)
    full_rgba = np.asarray(remap_gather_impl(
        jnp.asarray(rgba), k.flat_idx_rubix, k.valid, k.background_rgba))
    comp_rgba = np.asarray(remap_gather_impl(
        jnp.asarray(crop_frames_rows(rgba, slabs_r)), jnp.asarray(cidx_r),
        k.valid, k.background_rgba))
    np.testing.assert_array_equal(comp_rgba, full_rgba)

    # the bench's cropped device source == the cropped full device source
    for rgba_flag in (False, True):
        full_src = np.asarray(device_source(S, 3, False, rgba_flag))
        rows_src = np.asarray(device_source_rows(S, 3, rgba_flag, slabs))
        np.testing.assert_array_equal(
            rows_src, crop_frames_rows(full_src, slabs))


def test_compact_texels_matches_full_source():
    """compact_texels keeps exactly the unique referenced texels;
    gathering the texel-compacted [R, B] source through the renumbered
    indices must equal the full remap (plain, rubix-expanded, RGBA), the
    rubix-expanded compaction must need no more texels than the plain
    one, and the on-device texel source generator must match
    device_source at the kept texels."""
    import jax.numpy as jnp

    from blinky_tpu import globes, lenses
    from blinky_tpu.bench.throughput import device_source, device_source_texels
    from blinky_tpu.io.cubemap import synthetic_cubemap_batch
    from blinky_tpu.kernels.remap import (
        RemapKernel, compact_texels, expand_frames_tinted, frames_to_rgba,
        remap_gather_impl, take_texels,
    )
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette

    W, H, S, B = 64, 48, 32, 5
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    pal = default_palette()
    k = RemapKernel(lm, pal)
    frames = synthetic_cubemap_batch(S, B)

    # plain u8
    texels, cidx = compact_texels(lm)
    assert texels.size <= int(np.asarray(lm.valid).sum())
    src = take_texels(frames, texels)
    assert src.shape == (texels.size, B)
    full = np.asarray(k(jnp.asarray(frames)))
    comp = np.asarray(remap_gather_impl(
        jnp.asarray(src), jnp.asarray(cidx), k.valid, k.background))
    np.testing.assert_array_equal(comp, full)

    # rubix via the expanded layout: same texel count as plain
    ex = expand_frames_tinted(frames, pal)
    texels_r, cidx_r = compact_texels(lm, rubix=True)
    assert texels_r.size == texels.size
    full_r = np.asarray(k(jnp.asarray(ex), rubix=True))
    comp_r = np.asarray(remap_gather_impl(
        jnp.asarray(take_texels(ex, texels_r)), jnp.asarray(cidx_r),
        k.valid, k.background))
    np.testing.assert_array_equal(comp_r, full_r)

    # RGBA u32 through the same texel-compacted indices
    rgba = frames_to_rgba(ex, pal)
    full_rgba = np.asarray(remap_gather_impl(
        jnp.asarray(rgba), k.flat_idx_rubix, k.valid, k.background_rgba))
    comp_rgba = np.asarray(remap_gather_impl(
        jnp.asarray(take_texels(rgba, texels_r)), jnp.asarray(cidx_r),
        k.valid, k.background_rgba))
    np.testing.assert_array_equal(comp_rgba, full_rgba)

    # the bench's texel device source == the full device source's texels
    for rgba_flag in (False, True):
        full_src = np.asarray(device_source(S, 3, False, rgba_flag))
        tx_src = np.asarray(device_source_texels(S, 3, rgba_flag, texels))
        np.testing.assert_array_equal(tx_src, take_texels(full_src, texels))


def test_post_gather_tint_equals_expanded_source():
    """Round 3 (VERDICT task 2): for TRUE-COLOR sources the kernel tints
    AFTER the gather when handed a raw (non-expanded) u32 source with
    rubix on — bit-identical to the expanded raw||tinted layout (same
    integer pull-toward-tint on the same texel, fisheye.c:884-901),
    including pass-through of a non-0xFF source alpha on untinted
    pixels."""
    from blinky_tpu import globes, lenses
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.kernels.remap import (
        RemapKernel, expand_frames_tinted_rgba, frames_to_rgba)
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette

    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, 96, 72)
    lm = build_lensmap(lens, g, scale, 96, 72, 48, backend="numpy")
    pal = default_palette()
    u8 = synthetic_cubemap(48)[..., None].repeat(2, -1)
    rgba = frames_to_rgba(u8, pal)
    rgba[3] = (rgba[3] & 0x00FFFFFF) | (0x55 << 24)  # odd source alpha
    k = RemapKernel(lm, pal)
    post = np.asarray(k(rgba, rubix=True))
    expanded = np.asarray(k(expand_frames_tinted_rgba(rgba), rubix=True))
    np.testing.assert_array_equal(post, expanded)
