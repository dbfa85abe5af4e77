"""Fused per-frame-pose pipeline (kernels/posed.py) vs the sequential
per-pose build+remap it replaces."""

import jax.numpy as jnp
import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.io.cubemap import synthetic_cubemap_batch
from blinky_tpu.kernels.posed import PosedRemapKernel, bases_from_pose_track
from blinky_tpu.kernels.remap import RemapKernel, expand_frames_tinted, frames_to_rgba
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import default_palette

W, H, S, B = 64, 48, 48, 5

POSES = [(0.0, 0.0, 0.0), (5.0, -12.0, 0.0), (-20.0, 33.0, 10.0),
         (89.0, 180.0, 0.0), (0.0, 271.0, -45.0)]


@pytest.fixture(scope="module")
def setup():
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    frames = synthetic_cubemap_batch(S, B)
    bases = bases_from_pose_track(POSES)
    return g, lens, scale, frames, bases


def _sequential(lens, g, scale, frames, bases, rubix=False, palette=None):
    """Per-frame: f32 device build with this pose, then remap frame b."""
    outs = []
    for b in range(frames.shape[-1]):
        lm = build_lensmap(lens, g, scale, W, H, S, backend="jax",
                           view_basis=tuple(bases[b]))
        k = RemapKernel(lm, palette)
        fr = frames[..., b]
        if rubix:
            fr = expand_frames_tinted(fr, palette)
        outs.append(np.asarray(k(fr, rubix=rubix)))
    return np.stack(outs)


def test_posed_matches_sequential(setup):
    g, lens, scale, frames, bases = setup
    k = PosedRemapKernel(lens, g, W, H, scale, platesize=S)
    fused = np.asarray(k(frames, bases))
    seq = _sequential(lens, g, scale, frames, bases)
    np.testing.assert_array_equal(fused, seq)


def test_flat_gather_int32_guard(setup):
    """A flat global gather would index b*N + idx in int32 and wrap past
    2**31 source elements; the round-4 per-pose unrolled gathers keep
    every index inside one frame, so the hazard is structural history —
    the predicate documents the boundary for anyone flattening again."""
    from blinky_tpu.kernels.posed import _compiled_posed_pipeline, flat_gather_safe

    assert flat_gather_safe(153, 12 * 1080 * 1080)
    assert not flat_gather_safe(154, 12 * 1080 * 1080)   # expanded 1080p wrap
    assert not flat_gather_safe(307, 6 * 1080 * 1080)
    # both gather forms of the same compiled pipeline are bit-identical
    g, lens, scale, frames, bases = setup
    flat = _compiled_posed_pipeline(lens, g, W, H, S, False,
                                    jnp.float32, local_gather=True)
    batched = _compiled_posed_pipeline(lens, g, W, H, S, False,
                                       jnp.float32, local_gather=False)
    src = jnp.asarray(np.moveaxis(frames, -1, 0).reshape(B, -1))
    bg = jnp.zeros((H, W), jnp.uint8)
    bf = jnp.asarray(bases[:, 0]); br = jnp.asarray(bases[:, 1])
    bu = jnp.asarray(bases[:, 2])
    a = flat(src, bg, bf, br, bu, scale, 10.0, 4.0, 1.0)
    b = batched(src, bg, bf, br, bu, scale, 10.0, 4.0, 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_posed_rubix_expanded_source(setup):
    g, lens, scale, frames, bases = setup
    pal = default_palette()
    exp = expand_frames_tinted(frames, pal)
    k = PosedRemapKernel(lens, g, W, H, scale, platesize=S)
    fused = np.asarray(k(exp, bases))
    seq = _sequential(lens, g, scale, frames, bases, rubix=True, palette=pal)
    np.testing.assert_array_equal(fused, seq)


def test_posed_rgba_source(setup):
    g, lens, scale, frames, bases = setup
    pal = default_palette()
    rgba = frames_to_rgba(frames, pal)
    bg = frames_to_rgba(np.zeros((H, W), np.uint8), pal)
    k = PosedRemapKernel(lens, g, W, H, scale, platesize=S, background=bg)
    fused = np.asarray(k(rgba, bases))
    # identity check through the palette: decode the u8 fused output
    k8 = PosedRemapKernel(lens, g, W, H, scale, platesize=S)
    u8 = np.asarray(k8(frames, bases))
    from blinky_tpu.palette import rgba_lut

    lut = rgba_lut(pal)
    exp = np.where(u8 == 0, np.asarray(bg)[None], lut[u8])
    # invalid pixels: u8 path uses bg index 0 -> lut[0]; rgba path uses bg
    # rgba directly (identical since bg was decoded through the same lut)
    np.testing.assert_array_equal(fused, lut[u8])


def test_identity_pose_matches_static_kernel(setup):
    g, lens, scale, frames, bases = setup
    ident = np.repeat(np.eye(3)[None, [2, 0, 1]], B, axis=0)  # fwd=+Z, rgt=+X, up=+Y
    k = PosedRemapKernel(lens, g, W, H, scale, platesize=S)
    fused = np.asarray(k(frames, ident))
    lm = build_lensmap(lens, g, scale, W, H, S, backend="jax")
    static = np.asarray(RemapKernel(lm)(frames))  # [H, W, B]
    np.testing.assert_array_equal(fused, np.moveaxis(static, -1, 0))


def test_bases_from_pose_track_shape():
    bases = bases_from_pose_track(POSES)
    assert bases.shape == (len(POSES), 3, 3)
    # orthonormal frames
    for b in bases:
        f, r, u = b
        assert abs(np.dot(f, r)) < 1e-9 and abs(np.dot(f, u)) < 1e-9
        assert abs(np.linalg.norm(f) - 1) < 1e-9


def test_session_render_posed(setup):
    """Session.render_posed: u8 and RGBA sources, cache keyed per state."""
    from blinky_tpu.api import Session
    from blinky_tpu.palette import rgba_lut

    g, lens, scale, frames, bases = setup
    sess = Session(W, H, platesize=S)
    out = np.asarray(sess.render_posed(frames, np.asarray(POSES)))
    assert out.shape == (B, H, W)
    # identity pose row must equal the static f32 device build's remap
    # (render_posed uses the jitted f32 builder; sess.render's static path
    # is the exact f64 host builder — boundary pixels legitimately differ)
    lm = build_lensmap(lens, g, scale, W, H, S, backend="jax")
    ident = np.asarray(RemapKernel(lm)(frames[..., :1]))[..., 0]
    np.testing.assert_array_equal(out[0], ident)

    # RGBA source: background decodes through the session palette
    from blinky_tpu.kernels.remap import frames_to_rgba

    rgba = frames_to_rgba(frames, sess.palette)
    out_rgba = np.asarray(sess.render_posed(rgba, np.asarray(POSES)))
    lut = rgba_lut(sess.palette)
    np.testing.assert_array_equal(out_rgba, lut[out])

    sess.cmd("fisheye 0")
    with pytest.raises(ValueError):
        sess.render_posed(frames, np.asarray(POSES))


def test_equirect_ingest_feeds_posed_playback():
    """The 360-video pan flow: ingested pano faces drive render_posed.
    Identity pose bit-equals the static f32-build remap of the same
    faces; a rotated pose matches the same rotation composed into the
    f32 builder (sequential reference), up to XLA:CPU's 1-ulp fusion
    noise on boundary texels (exact on TPU — CLAUDE.md)."""
    from blinky_tpu.api import Session
    from blinky_tpu.kernels.ingest import EquirectIngest

    rng = np.random.default_rng(7)
    pano = (rng.integers(0, 1 << 24, (32, 64, 2), dtype=np.uint32)
            | np.uint32(0xFF000000))
    sess = Session(W, H, platesize=S)
    ik = EquirectIngest(32, 64, S, globe=sess.globe, bilinear=True)
    faces = np.asarray(ik(pano))  # [P, S, S, 2] u32
    assert faces.dtype == np.uint32 and faces.shape == (6, S, S, 2)
    poses = np.asarray([(0.0, 0.0, 0.0), (10.0, 40.0, 0.0)])
    out = np.asarray(sess.render_posed(faces, poses))
    # device-resident flow: the ingest output feeds render_posed with no
    # host round-trip (device arrays pass through, like render()) —
    # bit-equal to the host-staged call
    dev = np.asarray(sess.render_posed(ik(pano), poses))
    np.testing.assert_array_equal(dev, out)
    scale = calc_scale(sess.zoom, sess.lens, W, H)
    # identity row == static f32 build (same background: the session's
    # default zeros, RGBA-decoded -> opaque black)
    lm = build_lensmap(sess.lens, sess.globe, scale, W, H, S, backend="jax")
    ident = np.asarray(RemapKernel(lm, sess.palette)(faces[..., :1]))[..., 0]
    np.testing.assert_array_equal(out[0], ident)
    # rotated row == the rotation composed into the builder
    bases = bases_from_pose_track(poses)
    lm1 = build_lensmap(sess.lens, sess.globe, scale, W, H, S,
                        backend="jax", view_basis=tuple(bases[1]))
    rot = np.asarray(RemapKernel(lm1, sess.palette)(faces[..., 1:]))[..., 0]
    assert ((out[1] != rot).mean()) <= 0.002


def test_palette_and_background_changes_invalidate_posed_cache(setup):
    from blinky_tpu.api import Session
    from blinky_tpu.kernels.remap import frames_to_rgba

    g, lens, scale, frames, bases = setup
    sess = Session(W, H, platesize=S)
    sess.cmd("f_lens hammer")  # contain fit leaves corners unmapped
    poses = np.asarray(POSES)
    rgba = frames_to_rgba(frames, sess.palette)
    out1 = np.asarray(sess.render_posed(rgba, poses))
    # palette swap changes the decoded RGBA background of unmapped pixels
    pal = sess.palette.copy()
    pal[0] = [40, 80, 120]
    sess.palette = pal
    out2 = np.asarray(sess.render_posed(frames_to_rgba(frames, pal), poses))
    new_bg = 40 | (80 << 8) | (120 << 16) | (0xFF << 24)
    assert (out2 == np.uint32(new_bg)).any(), "stale posed cache after palette swap"
    assert not np.array_equal(out1, out2)
    # background generation counter: successive set_background calls must
    # not alias by a reused object id
    for val in (3, 7, 11):
        sess.set_background(np.full((H, W), val, np.uint8))
        u8 = np.asarray(sess.render_posed(frames, poses))
        assert (u8 == val).any(), f"stale background {val}"


def test_render_scale_matches_half_res_build_upsampled(setup):
    """render_scale=2 == the same pose's lensmap built at half size with
    scale*2, gathered, nearest-upsampled — with the FULL-res background
    showing through the upsampled validity mask."""
    g, lens, scale, frames, bases = setup
    bg = np.arange(H * W, dtype=np.uint32).reshape(H, W) % 251
    bg = bg.astype(np.uint8)
    k2 = PosedRemapKernel(lens, g, W, H, scale, platesize=S, background=bg,
                          render_scale=2)
    out = np.asarray(k2(frames, bases))
    assert out.shape == (B, H, W)

    for b in range(B):
        lm = build_lensmap(lens, g, scale * 2, W // 2, H // 2, S,
                           backend="jax", view_basis=tuple(bases[b]))
        small = np.asarray(RemapKernel(lm)(frames[..., b]))
        up = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
        valid_up = np.repeat(np.repeat(np.asarray(lm.valid), 2, 0), 2, 1)
        expect = np.where(valid_up, up, bg)
        np.testing.assert_array_equal(out[b], expect)

    # the fused identity-pose output at k=1 differs from k=2 only inside
    # (resolution), never in the background region
    k1 = PosedRemapKernel(lens, g, W, H, scale, platesize=S, background=bg)
    out1 = np.asarray(k1(frames, bases))
    assert (out1 != out).any()

    with pytest.raises(ValueError, match="divisible"):
        PosedRemapKernel(lens, g, W, 50, scale, platesize=S, render_scale=4)
    with pytest.raises(ValueError, match="render_scale"):
        PosedRemapKernel(lens, g, W, H, scale, platesize=S, render_scale=0)


def test_session_render_posed_scale(setup):
    from blinky_tpu.api import Session

    g, lens, scale, frames, bases = setup
    sess = Session(W, H, platesize=S)
    out = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                       render_scale=2))
    assert out.shape == (B, H, W)
    full = np.asarray(sess.render_posed(frames, np.asarray(POSES)))
    assert (out != full).any()  # distinct cache entries, distinct results


def test_posed_kernel_input_validation(setup):
    g, lens, scale, frames, bases = setup
    # flat background reshapes; wrong-sized one errors at construction
    flat_bg = np.zeros(H * W, np.uint8)
    k = PosedRemapKernel(lens, g, W, H, scale, platesize=S,
                         background=flat_bg)
    assert np.asarray(k(frames, bases)).shape == (B, H, W)
    with pytest.raises(ValueError, match="background"):
        PosedRemapKernel(lens, g, W, H, scale, platesize=S,
                         background=np.zeros((H, W + 1), np.uint8))
    # odd build grid breaks the every-k-th-ray identity: rejected
    with pytest.raises(ValueError, match="odd"):
        PosedRemapKernel(lens, g, 84, 56, scale, platesize=S,
                         render_scale=4)  # 84/4 = 21 is odd


def test_render_posed_forward_lens_matches_static(setup):
    """Forward-only lenses (no inverse fn — 10 of 31) with
    ``exact=True`` play poses through the per-pose exact host
    rasterization: pose b bit-equals a static render at those view
    angles (both drive the same build_forward(view_basis=...) table).
    The DEFAULT path (static-ray recomposition) matches the identity
    pose's static render up to texel-center re-resolution on plate
    seams, and rotated poses drift from exact only by that
    quantization."""
    from blinky_tpu.api import Session

    _, _, _, frames, _ = setup
    poses = [(0.0, 0.0, 0.0), (5.0, -12.0, 0.0), (-20.0, 33.0, 10.0)]
    frames3 = frames[..., :3]
    s = Session(W, H, platesize=S)
    s.cmd("f_lens eckert1")
    out = s.render_posed(frames3, np.asarray(poses), exact=True)
    assert out.shape == (3, H, W) and out.dtype == np.uint8
    for b, (p, y, r) in enumerate(poses):
        s.cmd(f"setviewangles {p} {y} {r}")
        ref = np.asarray(s.render(frames3[..., b]))
        np.testing.assert_array_equal(out[b], ref)
    # the default device path (static-ray): the IDENTITY pose bit-equals
    # the exact rasterized render (each texel-center ray re-resolves to
    # its own texel); rotated poses are the nearest-ray reprojection of
    # the rasterized map — they differ from per-pose re-rasterization
    # where quad scan-order ownership disagrees with nearest-ray
    # (quantified in tests/test_static_ray.py)
    s.cmd("setviewangles")
    dev = np.asarray(s.render_posed(frames3, np.asarray(poses)))
    assert dev.shape == (3, H, W) and dev.dtype == np.uint8
    np.testing.assert_array_equal(dev[0], out[0])


def test_render_posed_forward_rubix_and_scale(setup):
    """Expanded rubix sources and render_scale work through both the
    exact fallback and the default static-ray path (same contracts as
    the inverse lenses)."""
    from blinky_tpu.api import Session

    _, _, _, frames, _ = setup
    pal = default_palette()
    exp = expand_frames_tinted(frames[..., :2], pal)
    poses = np.asarray([(0.0, 0.0, 0.0), (10.0, 45.0, 0.0)])
    s = Session(W, H, platesize=S)
    s.cmd("f_lens sinusoidal")
    s.cmd("f_rubix 1")
    out = s.render_posed(exp, poses, exact=True)
    assert out.shape == (2, H, W)
    for b, (p, y, r) in enumerate(poses):
        s.cmd(f"setviewangles {p} {y} {r}")
        ref = np.asarray(s.render(exp[..., b]))
        np.testing.assert_array_equal(out[b], ref)
    s.cmd("setviewangles")
    out2 = s.render_posed(exp, poses, exact=True, render_scale=2)
    assert out2.shape == (2, H, W)
    # default static-ray path accepts the same sources/knobs.  The RAW
    # gather plane is identity-exact (test_static_ray.py); the rubix
    # TINT plane is recomputed from the final (px, py) per pose, so the
    # C rasterizer's "an on-grid overwrite keeps the previous texel's
    # tint" quirk (fisheye.c:1955-1958, forward_raster.py:154) is not
    # reproduced.  Pin: pixels whose STORED tint equals the recomputed
    # one (everything except those overwrites) bit-match at identity.
    from blinky_tpu.lensmap.builder import TINT_NONE, rubix_grid_mask

    dev = np.asarray(s.render_posed(exp, poses))
    assert dev.shape == (2, H, W)
    s.cmd("setviewangles")
    lm = s.lensmap.to_numpy()
    recomputed = np.where(
        lm.valid & ~rubix_grid_mask(lm.px, lm.py, S, 10.0, 4.0, 1.0, np),
        lm.plate, TINT_NONE).astype(np.uint8)
    agree = lm.tint == recomputed
    assert agree.mean() > 0.7  # the quirk is bounded, not the rule
    np.testing.assert_array_equal(dev[0][agree], out[0][agree])
    dev2 = np.asarray(s.render_posed(exp, poses, render_scale=2))
    assert dev2.shape == (2, H, W)


def test_render_posed_exact_inverse_matches_static(setup):
    """``exact=True`` on an INVERSE lens runs the per-pose float64 host
    builder — bit-identical to static setviewangles renders (the same
    guarantee the forward fallback always had)."""
    from blinky_tpu.api import Session

    _, _, _, frames, _ = setup
    poses = [(0.0, 0.0, 0.0), (5.0, -12.0, 0.0)]
    frames2 = frames[..., :2]
    # backend="numpy": static setviewangles renders normally take the
    # f32 device builder (the auto policy); force the exact host one so
    # both sides of the pin are the float64 builder
    s = Session(W, H, platesize=S, backend="numpy")
    out = s.render_posed(frames2, np.asarray(poses), exact=True)
    for b, (p, y, r) in enumerate(poses):
        s.cmd(f"setviewangles {p} {y} {r}")
        ref = np.asarray(s.render(frames2[..., b]))
        np.testing.assert_array_equal(out[b], ref)


def test_posed_kernel_and_sweep_reject_forward_lenses(setup):
    """Direct kernel-layer calls with a forward-only lens get a clear
    error pointing at the supported path (Session.render_posed falls
    back; cli sweep loops per step)."""
    from blinky_tpu.kernels.posed import zoom_sweep_remap

    g = globes.get("cube")
    fwd = lenses.get("eckert1", g)
    with pytest.raises(ValueError, match="forward-only"):
        PosedRemapKernel(fwd, g, W, H, 1.0, platesize=S)
    with pytest.raises(ValueError, match="forward-only"):
        zoom_sweep_remap(fwd, g, [1.0], np.zeros((6, S, S), np.uint8), W, H)


def test_render_posed_empty_batch(setup):
    """A zero-frame chunk returns an empty [0, H, W] screen stack on
    both the fused inverse path and the forward fallback (the pipeline
    would otherwise reshape by B=0)."""
    from blinky_tpu.api import Session

    _, _, _, frames, _ = setup
    empty = frames[..., :0]
    for lens_cmd in (None, "f_lens eckert1"):
        s = Session(W, H, platesize=S)
        if lens_cmd:
            s.cmd(lens_cmd)
        out = s.render_posed(empty, np.zeros((0, 3)))
        assert out.shape == (0, H, W) and out.dtype == np.uint8


def test_render_posed_batch_mismatch_raises(setup):
    """A poses/frames batch mismatch raises on every posed path (the
    forward fallback would otherwise silently truncate to len(poses))."""
    from blinky_tpu.api import Session

    _, _, _, frames, _ = setup
    two = frames[..., :2]
    for lens_cmd in (None, "f_lens eckert1"):
        s = Session(W, H, platesize=S)
        if lens_cmd:
            s.cmd(lens_cmd)
        with pytest.raises(ValueError, match="bases"):
            s.render_posed(two, np.zeros((1, 3)))
        with pytest.raises(ValueError, match="bases"):
            s.render_posed(two, np.zeros((3, 3)))
        with pytest.raises(ValueError, match="bases"):
            s.render_posed(two[..., :0], np.zeros((5, 3)))


def test_render_posed_empty_batch_still_validates(setup):
    """B=0 returns the empty stack but bad arguments still fail like a
    non-empty chunk would."""
    from blinky_tpu.api import Session

    _, _, _, frames, _ = setup
    s = Session(W, H, platesize=S)
    with pytest.raises(ValueError, match="render_scale"):
        s.render_posed(frames[..., :0], np.zeros((0, 3)), render_scale=5)


def test_render_posed_rubix_rides_the_source(setup):
    """On posed paths rubix comes from the SOURCE (expanded = tinted,
    raw = untinted); the session f_rubix flag is not consulted — on the
    forward fallback exactly as on the fused path.  A raw u32 source
    with f_rubix on therefore matches the static render with rubix
    OFF (static rendering applies the session flag; posed does not)."""
    from blinky_tpu.api import Session
    from blinky_tpu.kernels.remap import frames_to_rgba

    _, _, _, frames, _ = setup
    s = Session(W, H, platesize=S)
    s.cmd("f_lens eckert1")
    s.cmd("f_rubix 1")
    rgba = np.asarray(frames_to_rgba(frames[..., :1], s.palette))
    out = s.render_posed(rgba, np.zeros((1, 3)))
    s.cmd("setviewangles 0 0 0")
    ref_plain = np.asarray(s.render(rgba[..., 0], rubix=False))
    ref_tinted = np.asarray(s.render(rgba[..., 0], rubix=True))
    np.testing.assert_array_equal(out[0], ref_plain)
    assert (ref_plain != ref_tinted).any()  # the flag does change static


def test_render_posed_auto_render_scale():
    """render_scale="auto" (dynamic resolution): probes the fused
    pipeline and picks the smallest k sustaining target_fps.  The
    extremes are deterministic: an infinite budget picks native (k=1),
    an impossible budget picks the largest valid k — and each output is
    bit-identical to the explicit render_scale run."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    W, H, S, B = 64, 48, 48, 3
    sess = Session(W, H, platesize=S)
    sess.cmd("f_lens panini")
    sess.cmd("f_fov 180")
    frames = np.repeat(synthetic_cubemap(S)[..., None], B, axis=-1)
    poses = np.stack([np.zeros(B), np.linspace(0, 40, B), np.zeros(B)], 1)

    # huge budget -> native resolution
    auto1 = np.asarray(sess.render_posed(frames, poses,
                                         render_scale="auto",
                                         target_fps=1e-6))
    ref1 = np.asarray(sess.render_posed(frames, poses, render_scale=1))
    np.testing.assert_array_equal(auto1, ref1)

    # impossible budget -> the largest valid candidate (64x48 -> k=8)
    autoN = np.asarray(sess.render_posed(frames, poses,
                                         render_scale="auto",
                                         target_fps=1e9))
    refN = np.asarray(sess.render_posed(frames, poses, render_scale=8))
    np.testing.assert_array_equal(autoN, refN)

    # probe calibration is cached: a second auto call reuses it
    assert sess._auto_scale_probes is not None
    again = np.asarray(sess.render_posed(frames, poses,
                                         render_scale="auto",
                                         target_fps=1e-6))
    np.testing.assert_array_equal(again, ref1)

    # empty chunk accepts "auto" too
    empty = sess.render_posed(frames[..., :0], poses[:0],
                              render_scale="auto")
    assert empty.shape == (0, H, W)


def test_posed_background_dtype_guards():
    """Review (late r3): BOTH background/frames dtype mismatches raise
    (u8 frames with a u32 background silently promoted to garbage)."""
    from blinky_tpu.kernels.posed import PosedRemapKernel
    from blinky_tpu import globes, lenses
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.lensmap import Zoom, calc_scale

    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, 64, 48)
    bg_u32 = np.zeros((48, 64), np.uint32)
    k = PosedRemapKernel(lens, g, 64, 48, scale, platesize=48,
                         background=bg_u32)
    frames = np.repeat(synthetic_cubemap(48)[..., None], 2, axis=-1)
    bases = np.tile(np.eye(3)[None], (2, 1, 1))
    with pytest.raises(ValueError, match="u8 frames"):
        k(frames, bases)


def test_forward_auto_scale_rasterizes_full_size_once(monkeypatch):
    """The auto-scale probes and the real posed kernel share the
    session's ray-table stash (api._ray_table_stash): a forward-only
    lens pays ONE full-size host rasterization per (lens, zoom, size)
    generation.  Before round 4's review fix every probe AND the real
    kernel each rebuilt their own table (3 full rasters at native k)."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.lensmap import forward_raster

    sizes = []
    orig = forward_raster.build_forward

    def counted(lens, globe, scale, w, h, s, *a, **k):
        sizes.append((w, h))
        return orig(lens, globe, scale, w, h, s, *a, **k)

    monkeypatch.setattr(forward_raster, "build_forward", counted)
    Wp, Hp, Sp, Bp = 64, 48, 48, 3
    sess = Session(Wp, Hp, platesize=Sp)
    sess.cmd("f_lens eckert1")
    frames = np.repeat(synthetic_cubemap(Sp)[..., None], Bp, axis=-1)
    poses = np.stack([np.zeros(Bp), np.linspace(0, 40, Bp), np.zeros(Bp)], 1)
    out = np.asarray(sess.render_posed(frames, poses, render_scale="auto",
                                       target_fps=1e-6))
    assert out.shape == (Bp, Hp, Wp)
    full = [sz for sz in sizes if sz == (Wp, Hp)]
    assert len(full) == 1, f"full-size rasters: {sizes}"
    # a second auto call reuses both the calibration and the stash
    n = len(sizes)
    np.asarray(sess.render_posed(frames, poses, render_scale="auto",
                                 target_fps=1e-6))
    assert len(sizes) == n
    # zoom change = new generation: exactly one more full-size raster
    sess.cmd("f_cover")
    np.asarray(sess.render_posed(frames, poses, render_scale=1))
    assert [sz for sz in sizes[n:] if sz == (Wp, Hp)] == [(Wp, Hp)]


def test_render_posed_nonblocking_forward_preview(setup, monkeypatch):
    """render_posed(block=False) on a forward-only lens (VERDICT r4 #4):
    the first call must return a full-res frame without paying the
    seconds-scale host rasterization inline — the native table builds on
    a background thread (posed_pending True, preview = coarse-scale
    kernel) and swaps in once done (outputs from then on identical to
    block=True)."""
    import threading
    import time

    from blinky_tpu.api import Session
    from blinky_tpu.lensmap import forward_raster

    g, lens, scale, frames, bases = setup
    # W=64/H=48 admit render_scale 4 (16x12 build grid)
    slow_started = threading.Event()
    release = threading.Event()
    real_build = forward_raster.build_forward
    calls = []

    def gated_build(lens_, *a, **kw):
        # the native-resolution build stalls until released; the coarse
        # preview build passes straight through (its grid is W/k x H/k)
        out = real_build(lens_, *a, **kw)
        calls.append((out.width_px, out.height_px))
        if (out.width_px, out.height_px) == (W, H):
            slow_started.set()
            assert release.wait(30), "test deadlock"
        return out

    monkeypatch.setattr(forward_raster, "build_forward", gated_build)

    sess = Session(W, H, platesize=S)
    sess.cmd("f_lens sinusoidal")
    t0 = time.perf_counter()
    out = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                       block=False))
    first_s = time.perf_counter() - t0
    assert out.shape == (B, H, W)
    assert sess.posed_pending, "native build should still be in flight"
    assert slow_started.wait(10)
    # the preview returned while the native rasterization was parked
    assert any(w < W for w, h in calls), "no coarse preview build ran"
    # preview calls keep reusing the coarse kernel (no new builds)
    n_calls = len(calls)
    out2 = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                        block=False))
    assert len(calls) == n_calls
    np.testing.assert_array_equal(out, out2)
    release.set()
    deadline = time.time() + 30
    while sess.posed_pending and time.time() < deadline:
        time.sleep(0.02)
    assert not sess.posed_pending
    swapped = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                           block=False))
    # reference: a fresh blocking session (monkeypatch released)
    sess2 = Session(W, H, platesize=S)
    sess2.cmd("f_lens sinusoidal")
    ref = np.asarray(sess2.render_posed(frames, np.asarray(POSES)))
    np.testing.assert_array_equal(swapped, ref)
    # the preview was the coarse-scale render of the same poses
    ref_pk = np.asarray(sess2.render_posed(frames, np.asarray(POSES),
                                           render_scale=4))
    np.testing.assert_array_equal(out, ref_pk)
    # first_s sanity: the call did not sit through the gated build
    # (which waited on an Event, so inline would have taken >=30 s)
    assert first_s < 25, first_s


def test_render_posed_nonblocking_failed_build_reraises(setup, monkeypatch):
    """A background build failure surfaces on the caller's next call,
    not silently (the API analog of the viewer's warm-failure rule)."""
    import time

    from blinky_tpu.api import Session
    from blinky_tpu.lensmap import forward_raster

    g, lens, scale, frames, bases = setup

    def boom(lens_, globe_, scale_, w, h, *a, **kw):
        if (w, h) == (W, H):
            raise RuntimeError("rasterizer exploded")
        return real_build(lens_, globe_, scale_, w, h, *a, **kw)

    real_build = forward_raster.build_forward
    monkeypatch.setattr(forward_raster, "build_forward", boom)
    sess = Session(W, H, platesize=S)
    sess.cmd("f_lens sinusoidal")
    out = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                       block=False))
    assert out.shape == (B, H, W)
    deadline = time.time() + 30
    while sess.posed_pending and time.time() < deadline:
        time.sleep(0.02)
    with pytest.raises(RuntimeError, match="rasterizer exploded"):
        sess.render_posed(frames, np.asarray(POSES), block=False)


def test_render_posed_nonblocking_single_async_slot(setup, monkeypatch):
    """ONE async slot per session: key churn (lens/zoom change) while a
    background table build is in flight must serve previews, not pile up
    a second concurrent full-res build — N-deep churn would otherwise
    run N host rasterizations at once."""
    import threading
    import time

    from blinky_tpu.api import Session
    from blinky_tpu.lensmap import forward_raster

    g, lens, scale, frames, bases = setup
    release = threading.Event()
    native_builds = []
    real_build = forward_raster.build_forward

    def gated_build(lens_, *a, **kw):
        out = real_build(lens_, *a, **kw)
        if (out.width_px, out.height_px) == (W, H):
            native_builds.append(time.monotonic())
            assert release.wait(30), "test deadlock"
        return out

    monkeypatch.setattr(forward_raster, "build_forward", gated_build)
    sess = Session(W, H, platesize=S)
    sess.cmd("f_lens sinusoidal")
    out = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                       block=False))
    assert out.shape == (B, H, W)
    deadline = time.time() + 10
    while not native_builds and time.time() < deadline:
        time.sleep(0.01)
    assert len(native_builds) == 1
    # key churn while the first build is parked: a new zoom -> new key
    sess.cmd("f_fov 120")
    out2 = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                        block=False))
    assert out2.shape == (B, H, W)
    time.sleep(0.3)  # give a (buggy) second build time to appear
    assert len(native_builds) == 1, \
        "a second native build started while the first was in flight"
    assert sess.posed_pending  # the stale build still owns the slot
    release.set()
    # once the stale build drains, the NEW key's build kicks on the next
    # call and swaps in; outputs then match a fresh blocking session
    deadline = time.time() + 30
    while sess.posed_pending and time.time() < deadline:
        time.sleep(0.02)
    np.asarray(sess.render_posed(frames, np.asarray(POSES), block=False))
    deadline = time.time() + 30
    while sess.posed_pending and time.time() < deadline:
        time.sleep(0.02)
    swapped = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                           block=False))
    ref_sess = Session(W, H, platesize=S)
    ref_sess.cmd("f_lens sinusoidal; f_fov 120")
    ref = np.asarray(ref_sess.render_posed(frames, np.asarray(POSES)))
    np.testing.assert_array_equal(swapped, ref)


def test_render_posed_nonblocking_lua_forward_lens(setup, tmp_path):
    """block=False on a forward-only .lua lens: the background native
    table build and the caller-thread coarse preview build evaluate the
    SAME LensDef's shared interpreter concurrently — the lua_bridge
    script lock must serialize them (corrupt interpreter state would
    cache wrong rays for the session lifetime).  End-to-end pin of the
    review finding the Python-port test can't catch."""
    import shutil
    import time

    from blinky_tpu.api import Session

    g, lens, scale, frames, bases = setup
    shutil.copy("/root/reference/game/lua-scripts/lenses/sinusoidal.lua",
                tmp_path / "luasinu.lua")
    sess = Session(W, H, platesize=S, lens_dirs=[tmp_path])
    sess.cmd("f_lens luasinu")
    out1 = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                        block=False))
    assert out1.shape == (B, H, W)
    deadline = time.time() + 60
    while sess.posed_pending and time.time() < deadline:
        time.sleep(0.02)
    assert not sess.posed_pending
    swapped = np.asarray(sess.render_posed(frames, np.asarray(POSES),
                                           block=False))
    ref_sess = Session(W, H, platesize=S, lens_dirs=[tmp_path])
    ref_sess.cmd("f_lens luasinu")
    ref = np.asarray(ref_sess.render_posed(frames, np.asarray(POSES)))
    np.testing.assert_array_equal(swapped, ref)
    # and the .lua forward map agrees with the shipped Python port:
    # the same poses through f_lens sinusoidal are bit-identical
    py_sess = Session(W, H, platesize=S)
    py_sess.cmd("f_lens sinusoidal")
    py = np.asarray(py_sess.render_posed(frames, np.asarray(POSES)))
    np.testing.assert_array_equal(ref, py)


def test_render_posed_nonblocking_failing_build_gives_up(setup, monkeypatch):
    """A DETERMINISTICALLY failing background build must stop being
    re-kicked (round-5 review): a host that catches the error and keeps
    calling (the documented preview-loop usage) would otherwise burn a
    full host rasterization per cycle forever.  After 3 consecutive
    failures on one key, the sticky error re-raises immediately with no
    new build; a key change resets the counter."""
    import time

    from blinky_tpu.api import Session
    from blinky_tpu.lensmap import forward_raster

    g, lens, scale, frames, bases = setup
    attempts = []

    def boom(lens_, globe_, scale_, w, h, *a, **kw):
        if (w, h) == (W, H):
            attempts.append((w, h))
            raise RuntimeError("rasterizer exploded")
        return real_build(lens_, globe_, scale_, w, h, *a, **kw)

    real_build = forward_raster.build_forward
    monkeypatch.setattr(forward_raster, "build_forward", boom)
    sess = Session(W, H, platesize=S)
    sess.cmd("f_lens sinusoidal")
    poses = np.asarray(POSES)

    def drain():
        deadline = time.time() + 30
        while sess.posed_pending and time.time() < deadline:
            time.sleep(0.02)

    for _ in range(3):  # kick -> preview; drain; next call raises
        out = np.asarray(sess.render_posed(frames, poses, block=False))
        assert out.shape == (B, H, W)
        drain()
        with pytest.raises(RuntimeError, match="rasterizer exploded"):
            sess.render_posed(frames, poses, block=False)
    n = len(attempts)
    assert n == 3
    # 4th call onward: sticky re-raise, NO new background rasterization
    for _ in range(3):
        with pytest.raises(RuntimeError, match="rasterizer exploded"):
            sess.render_posed(frames, poses, block=False)
    assert len(attempts) == n
    # a key change (zoom) resets the give-up counter: a build is kicked
    sess.cmd("f_fov 90")
    out = np.asarray(sess.render_posed(frames, poses, block=False))
    assert out.shape == (B, H, W)
    drain()
    assert len(attempts) == n + 1
