"""Fused pano->screen composition (EquirectScreenKernel): one gather
stage bit-equal to the two-stage ingest->remap chain (VERDICT r3 task 2;
the reference's one-hop render_lensmap, fisheye.c:2406-2424)."""

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.kernels.ingest import (
    EquirectIngest, EquirectScreenKernel, equirect_screen_sharded,
)
from blinky_tpu.kernels.remap import RemapKernel
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import default_palette

PH, PW, S, W, H, B = 64, 128, 48, 64, 48, 4


def _panos(b=B, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2**32, (PH, PW, b), dtype=np.uint64)
            .astype(np.uint32))


def _setup(lens_name="panini", zoom=Zoom("fov", 180), bilinear=True,
           globe_name="cube", background=None):
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(zoom, lens, W, H)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    remap = RemapKernel(lm, default_palette(), background)
    ing = EquirectIngest(PH, PW, S, globe=g, bilinear=bilinear)
    return g, ing, remap


@pytest.mark.parametrize("bilinear", [True, False])
@pytest.mark.parametrize("rubix", [False, True])
def test_fused_and_compact_bit_equal_two_stage(bilinear, rubix):
    from blinky_tpu.kernels.ingest import CompactEquirectChain
    from blinky_tpu.kernels.remap import (
        remap_gather_impl, remap_gather_tint_impl,
    )

    g, ing, remap = _setup(bilinear=bilinear)
    panos = _panos()
    fused = EquirectScreenKernel(ing, remap)
    compact = CompactEquirectChain(ing, remap)
    out = np.asarray(fused(panos, rubix=rubix))
    outc = np.asarray(compact(panos, rubix=rubix))
    faces = ing(panos)
    if rubix:
        tr, tm = remap.tint_rgb_mask
        ref = remap_gather_tint_impl(faces, remap.flat_idx, remap.valid,
                                     remap.background_rgba, tr, tm)
    else:
        ref = remap_gather_impl(faces, remap.flat_idx, remap.valid,
                                remap.background_rgba)
    np.testing.assert_array_equal(out, np.asarray(ref))
    np.testing.assert_array_equal(outc, np.asarray(ref))


def test_fused_partial_coverage_background():
    """A contain-fit cartographic lens leaves corners unmapped — the
    fused path must show the RGBA background there, like the remap."""
    bg = np.full((H, W), 7, np.uint8)
    g, ing, remap = _setup(lens_name="hammer", zoom=Zoom("contain"),
                           background=bg)
    fused = EquirectScreenKernel(ing, remap)
    out = np.asarray(fused(_panos()))
    corner = out[0, 0]
    assert (corner == np.asarray(remap.background_rgba)[0, 0]).all()
    ref = np.asarray(remap(ing(_panos())))
    np.testing.assert_array_equal(out, ref)


def test_fused_low_poly_globe():
    g, ing, remap = _setup(lens_name="fisheye1", zoom=Zoom("contain"),
                           globe_name="tetra")
    fused = EquirectScreenKernel(ing, remap)
    ref = np.asarray(remap(ing(_panos())))
    np.testing.assert_array_equal(np.asarray(fused(_panos())), ref)


def test_fused_rejects_subset_and_platesize_mismatch():
    g, ing, remap = _setup()
    with pytest.raises(TypeError, match="FULL-layout"):
        EquirectScreenKernel(ing.subset(np.arange(10)), remap)
    bad = EquirectIngest(PH, PW, S + 2, globe=g)
    with pytest.raises(ValueError, match="platesize"):
        EquirectScreenKernel(bad, remap)
    fused = EquirectScreenKernel(ing, remap)
    with pytest.raises(ValueError, match="panos must be"):
        fused(np.zeros((PH, PW + 2, B), np.uint32))


def test_session_modes_match_and_fallbacks():
    from blinky_tpu.api import Session

    sess = Session(W, H, platesize=S)
    panos = _panos()
    out_f = np.asarray(sess.render_equirect(panos))  # default: compact
    out_2 = np.asarray(sess.render_equirect(panos, mode="faces"))
    np.testing.assert_array_equal(out_f, out_2)
    out_1 = np.asarray(sess.render_equirect(panos, mode="fused"))
    np.testing.assert_array_equal(out_f, out_1)
    with pytest.raises(ValueError, match="compact|fused|faces"):
        sess.render_equirect(panos, mode="bogus")
    # rubix state flows into the fused kernel
    sess.cmd("f_rubix 1")
    rf = np.asarray(sess.render_equirect(panos))
    r2 = np.asarray(sess.render_equirect(panos, mode="faces"))
    np.testing.assert_array_equal(rf, r2)
    assert (rf != out_f).any()
    sess.cmd("f_rubix 0")
    # lens switch invalidates the composed tables (new RemapKernel)
    sess.cmd("f_lens stereographic")
    sf = np.asarray(sess.render_equirect(panos))
    s2 = np.asarray(sess.render_equirect(panos, mode="faces"))
    np.testing.assert_array_equal(sf, s2)
    assert (sf != out_f).any()
    # a pending f_saveglobe needs the faces: the fused path steps aside
    # and the capture happens (two-stage semantics preserved)
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        sess.cmd(f"f_saveglobe {Path(d) / 'glb'}")
        outs = np.asarray(sess.render_equirect(panos))
        assert list(Path(d).glob("glb*.pcx")), "saveglobe skipped"
    np.testing.assert_array_equal(outs, sf)
    # fisheye off: the plain rectilinear view path (u32 contract holds)
    sess.cmd("fisheye 0")
    off = np.asarray(sess.render_equirect(panos))
    assert off.dtype == np.uint32
    np.testing.assert_array_equal(
        off, np.asarray(sess.render_equirect(panos, mode="faces")))


def test_alternating_modes_keep_both_chains_warm(monkeypatch):
    """render_equirect's composed-chain cache is a dict, not a single
    slot: alternating compact/fused (mode comparisons) must not re-run
    compact_texels / recompose tables per switch, while a lens change
    (new RemapKernel identity) still invalidates every entry."""
    import blinky_tpu.kernels.ingest as ing
    from blinky_tpu.api import Session

    sess = Session(W, H, platesize=S)
    panos = _panos()
    builds = []
    for name in ("CompactEquirectChain", "EquirectScreenKernel"):
        orig = getattr(ing, name)

        def counted(*a, _o=orig, _n=name, **k):
            builds.append(_n)
            return _o(*a, **k)

        monkeypatch.setattr(ing, name, counted)
    a = np.asarray(sess.render_equirect(panos))
    b = np.asarray(sess.render_equirect(panos, mode="fused"))
    np.testing.assert_array_equal(a, b)
    assert builds == ["CompactEquirectChain", "EquirectScreenKernel"]
    # alternating again: both entries warm, no new constructions
    np.testing.assert_array_equal(np.asarray(sess.render_equirect(panos)), a)
    np.testing.assert_array_equal(
        np.asarray(sess.render_equirect(panos, mode="fused")), a)
    assert len(builds) == 2
    # a lens switch makes a new RemapKernel: every stale entry drops
    sess.cmd("f_lens stereographic")
    _ = np.asarray(sess.render_equirect(panos))
    assert builds[-1] == "CompactEquirectChain" and len(builds) == 3
    assert len(sess._equirect_fused) == 1  # stale generation evicted


def test_fused_sharded_matches_unsharded():
    from blinky_tpu.parallel import make_mesh

    g, ing, remap = _setup()
    fused = EquirectScreenKernel(ing, remap)
    panos = _panos(8)
    single = np.asarray(fused(panos))
    mesh = make_mesh(n_data=4, n_space=1)
    sharded = np.asarray(equirect_screen_sharded(fused, panos, mesh))
    np.testing.assert_array_equal(single, sharded)


def test_pending_build_costs_one_slice_per_frame(monkeypatch):
    """With a time-sliced exact build pending, render_equirect must cost
    ONE budget slice per call: the fused gate steps aside to the faces
    path (whose render() advances the slice) instead of advancing a
    second slice itself — double-advancing broke the per-frame latency
    bound the slicing exists for (fisheye.c:744-746)."""
    from blinky_tpu.api import Session
    from blinky_tpu.lensmap import progressive

    calls = []
    orig = progressive.ProgressiveHostBuild.step

    def counted(self, budget):
        calls.append(budget)
        return orig(self, budget)

    monkeypatch.setattr(progressive.ProgressiveHostBuild, "step", counted)
    sess = Session(W, H, platesize=S, build_budget_s=1e-6)
    panos = _panos()
    ref = np.asarray(Session(W, H, platesize=S).render_equirect(panos))
    # the rebuild frame costs two slices (_rebuild's immediate first
    # slice + render()'s advance — same as a plain render() on a change
    # frame); every subsequent pending frame must cost exactly one
    np.asarray(sess.render_equirect(panos))
    while sess._pending_build is not None:
        n0 = len(calls)
        np.asarray(sess.render_equirect(panos))
        assert len(calls) - n0 <= 1, "more than one build slice per frame"
    # the exact table landed: output converges to the one-shot session's
    np.testing.assert_array_equal(np.asarray(sess.render_equirect(panos)),
                                  ref)
