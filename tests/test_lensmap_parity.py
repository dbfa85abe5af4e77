"""Lensmap parity: vectorized builders vs the scalar oracle loop.

The oracle (blinky_tpu.parity.oracle) is a per-pixel transcription of
resume_lensmap_inverse; the builders must match it bit-exactly in f64.
"""

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.lensmap import Zoom, ZoomError, build_lensmap, calc_scale
from blinky_tpu.parity.oracle import oracle_inverse_lensmap

W, H = 64, 48
FIELDS = ("plate", "px", "py", "valid", "tint", "flat_idx", "plates_used")

INVERSE_LENSES = [n for n in lenses.names()
                  if lenses.get(n, globes.get("cube")).map_type == "inverse"]


def _zoom_for(lens):
    parts = (lens.onload or "f_contain").split()
    return Zoom(parts[0][2:], int(parts[1]) if len(parts) > 1 else 0)


@pytest.mark.parametrize("lens_name", INVERSE_LENSES)
@pytest.mark.parametrize("globe_name", ["cube", "fast", "tetra"])
def test_numpy_builder_matches_oracle(lens_name, globe_name):
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(_zoom_for(lens), lens, W, H)
    o = oracle_inverse_lensmap(lens, g, scale, W, H, min(W, H))
    b = build_lensmap(lens, g, scale, W, H, backend="numpy")
    for f in FIELDS:
        assert np.array_equal(np.asarray(getattr(b, f)), o[f]), (lens_name, globe_name, f)


@pytest.mark.parametrize("lens_name", ["panini", "stereographic", "hammer"])
@pytest.mark.parametrize("globe_name", ["cube_edge", "cube_corner", "trism"])
def test_numpy_builder_matches_oracle_remaining_globes(lens_name, globe_name):
    """Close the globe coverage: the rotated cubes and the prism also pin
    bit-exactly to the oracle (fast/tetra/cube are in the main matrix)."""
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(_zoom_for(lens), lens, W, H)
    o = oracle_inverse_lensmap(lens, g, scale, W, H, min(W, H))
    b = build_lensmap(lens, g, scale, W, H, backend="numpy")
    for f in FIELDS:
        assert np.array_equal(np.asarray(getattr(b, f)), o[f]), (lens_name, globe_name, f)


@pytest.mark.parametrize("lens_name", ["panini", "fisheye1", "quincuncial", "winkeltripel"])
def test_jax_f64_builder_matches_oracle(lens_name, cube_globe):
    """The jitted builder in f64 on CPU: XLA transcendentals may differ
    from libm by an ulp, flipping truncation at cell boundaries — allow a
    tiny mismatch budget, require identity elsewhere."""
    import jax.numpy as jnp

    g = cube_globe
    lens = lenses.get(lens_name, g)
    scale = calc_scale(_zoom_for(lens), lens, W, H)
    o = oracle_inverse_lensmap(lens, g, scale, W, H, min(W, H))
    b = build_lensmap(lens, g, scale, W, H, backend="jax", dtype=jnp.float64)
    # Symmetric grids land many pixels *exactly* on texel boundaries
    # (u * S integral), where a single-ulp transcendental difference flips
    # the truncation — so require: few mismatches, and every px/py
    # difference is a +-1 boundary flip.
    total = 0
    for f in ("plate", "px", "py", "valid"):
        total += int((np.asarray(getattr(b, f)) != o[f]).sum())
    assert total <= (W * H) * 0.03, (lens_name, total)
    both = np.asarray(b.valid) & o["valid"]
    for f in ("px", "py"):
        d = np.abs(np.asarray(getattr(b, f)) - o[f])[both]
        assert d.max(initial=0) <= 1, (lens_name, f, d.max())


def test_jax_f32_builder_close_to_oracle(cube_globe):
    """The TPU-precision (f32) builder.  At fov 180 on a symmetric grid
    many pixels land *exactly* on texel boundaries (u*S integral), so f32
    rounding legitimately picks the +-1 neighbor texel there; require that
    every difference is such a boundary flip and the fraction is bounded.
    Bit-exact builds use the host f64 backend ("numpy")."""
    import jax.numpy as jnp

    lens = lenses.get("panini", cube_globe)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    o = oracle_inverse_lensmap(lens, cube_globe, scale, W, H, min(W, H))
    b = build_lensmap(lens, cube_globe, scale, W, H, backend="jax", dtype=jnp.float32)
    frac = (np.asarray(b.flat_idx) != o["flat_idx"]).mean()
    # Boundary-flip share shrinks with resolution: measured 0.99% at
    # 1920x1080 on v5e (docs/PERF.md section 5); at 64x48 boundaries
    # dominate.  The f32 builder is only used for pose-tracked playback —
    # the default static path is the exact host builder (api.py backend
    # policy).
    assert frac < 0.15, frac
    # where the same plate was chosen (seam ties may flip plates in f32),
    # pixel coords differ by at most one texel
    same = np.asarray(b.valid) & o["valid"] & (np.asarray(b.plate) == o["plate"])
    for f in ("px", "py"):
        d = np.abs(np.asarray(getattr(b, f)) - o[f])[same]
        assert d.max(initial=0) <= 1, (f, d.max())


def test_zoom_sweep_reuses_compiled_builder(cube_globe):
    """A second build with a different scale must not retrace (the f_fov
    sweep path, BASELINE config[1])."""
    from blinky_tpu.lensmap import builder as B

    lens = lenses.get("stereographic", cube_globe)
    B._compiled_inverse_builder.cache_clear()
    for fov in (90, 150, 200):
        scale = calc_scale(Zoom("fov", fov), lens, W, H)
        build_lensmap(lens, cube_globe, scale, W, H)
    assert B._compiled_inverse_builder.cache_info().misses == 1


def test_plates_used_matches_fov(cube_globe):
    """At f_fov 180 with panini the back plate is unused
    (the reference's display flags, fisheye.c:1976)."""
    lens = lenses.get("panini", cube_globe)
    scale = calc_scale(Zoom("fov", 180), lens, 320, 240)
    lm = build_lensmap(lens, cube_globe, scale, 320, 240, backend="numpy")
    used = np.asarray(lm.plates_used)
    assert used[0] and not used[3]  # front yes, back no


def test_invalid_lens_renders_nothing(cube_globe):
    """A zoom failure leaves no lensmap — the engine keeps running and
    draws background only (fisheye.c:2371-2379)."""
    lens = lenses.get("quincuncial", cube_globe)
    with pytest.raises(ZoomError):
        calc_scale(Zoom("fov", 180), lens, W, H)


@pytest.mark.parametrize("dims", [(97, 73), (96, 73), (97, 72)])
def test_numpy_builder_matches_oracle_odd_sizes(dims):
    """Odd screen sizes exercise the C integer divisions (width_px/2 in
    the pixel loop, fisheye.c:2100-2105) and non-square platesize."""
    w, h = dims
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, w, h)
    o = oracle_inverse_lensmap(lens, g, scale, w, h, min(w, h))
    b = build_lensmap(lens, g, scale, w, h, backend="numpy")
    for f in FIELDS:
        assert np.array_equal(np.asarray(getattr(b, f)), o[f]), (dims, f)


def test_platesize_differs_from_screen_min():
    """platesize is an independent parameter (the reference uses
    min(screen w,h), fisheye.c:707, but the framework accepts any)."""
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    o = oracle_inverse_lensmap(lens, g, scale, W, H, 37)
    b = build_lensmap(lens, g, scale, W, H, platesize=37, backend="numpy")
    for f in FIELDS:
        assert np.array_equal(np.asarray(getattr(b, f)), o[f]), f
