"""True-color (packed-RGBA u32) source path: ingestion, tint expansion,
remap, container round trip, CLI — the palette-free extension for
360°-video-style RGB cubemap sources."""

import numpy as np
import pytest

from blinky_tpu.kernels.remap import (
    expand_frames_tinted_rgba,
    frames_to_rgba,
    pack_rgba,
    unpack_rgb,
)
from blinky_tpu.palette import MAX_PLATES, PLATE_TINTS, default_palette


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (4, 6, 6, 3), np.uint8)
    packed = pack_rgba(rgb)
    assert packed.dtype == np.uint32 and packed.shape == (4, 6, 6)
    assert (packed >> 24 == 255).all()  # alpha
    np.testing.assert_array_equal(unpack_rgb(packed), rgb)
    with pytest.raises(ValueError, match="trailing"):
        pack_rgba(np.zeros((4, 4, 2), np.uint8))


def test_pack_rgba_matches_palette_decode():
    """pack_rgba(palette[idx]) must equal frames_to_rgba(idx, palette) —
    one packing convention across both source kinds."""
    pal = default_palette()
    idx = np.arange(256, dtype=np.uint8).reshape(16, 16)
    np.testing.assert_array_equal(pack_rgba(pal[idx]),
                                  frames_to_rgba(idx, pal))


def test_expand_tinted_rgba_matches_c_tint_math():
    """The RGBA tint applies the exact create_palmap integer pull
    (fisheye.c:884-901) per channel, without the palette snap."""
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (6, 8, 8, 3), np.uint8)
    frames = pack_rgba(rgb)
    out = expand_frames_tinted_rgba(frames)
    assert out.shape == (2 * MAX_PLATES, 8, 8)
    np.testing.assert_array_equal(out[:6], frames)
    percent = 256 // MAX_PLATES
    for p in range(6):
        c = rgb[p].astype(np.int64)
        t = PLATE_TINTS[p].astype(np.int64)
        expect = np.clip(c + ((percent * (t - c)) >> 8), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(unpack_rgb(out[MAX_PLATES + p]), expect)
        assert (out[MAX_PLATES + p] >> 24 == 255).all()


def test_session_renders_true_color():
    """An RGB cubemap renders through the same kernel; output is packed
    RGBA that equals the palette path when the source is palette-decoded."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    pal = default_palette()
    idx_frames = synthetic_cubemap(32)
    sess = Session(64, 48, platesize=32, palette=pal)
    out_pal = np.asarray(sess.render(frames_to_rgba(idx_frames, pal)))
    out_rgb = np.asarray(sess.render(pack_rgba(pal[idx_frames])))
    assert out_rgb.dtype == np.uint32
    np.testing.assert_array_equal(out_pal, out_rgb)

    # rubix through the expanded true-color layout renders too
    sess.cmd("f_rubix")
    out = np.asarray(sess.render(
        expand_frames_tinted_rgba(pack_rgba(pal[idx_frames]))))
    assert out.dtype == np.uint32 and out.shape == (48, 64)


def test_rgb_demo_import_and_reproject(tmp_path):
    """CLI: PNG faces -> demo-import --rgb -> reproject --format png."""
    from blinky_tpu.cli import main as cli_main
    from blinky_tpu.io.dataset import read_demo
    from blinky_tpu.io.png import decode_png, encode_png

    rng = np.random.default_rng(3)
    N, S = 3, 16
    faces = rng.integers(0, 256, (N, 6, S, S, 3), np.uint8)
    for n in range(N):
        for i in range(6):
            (tmp_path / f"f{n:03d}_{i}.png").write_bytes(
                encode_png(faces[n, i]))
    out = tmp_path / "demo.npz"
    rc = cli_main(["demo-import", str(tmp_path), "--rgb", "--out", str(out)])
    assert rc in (0, None)
    demo = read_demo(out)
    assert demo["frames"].dtype == np.uint32
    np.testing.assert_array_equal(unpack_rgb(demo["frames"]), faces)

    outdir = tmp_path / "warped"
    rc = cli_main(["reproject", "--demo", str(out), "--width", "48",
                   "--height", "36", "--format", "png",
                   "--outdir", str(outdir)])
    assert rc in (0, None)
    pngs = sorted(outdir.glob("*.png"))
    assert len(pngs) == N
    assert decode_png(pngs[0].read_bytes()).shape == (36, 48, 3)

    # rubix works on the true-color path too
    rc = cli_main(["reproject", "--demo", str(out), "--width", "48",
                   "--height", "36", "--format", "ppm", "--rubix",
                   "--outdir", str(tmp_path / "rub")])
    assert rc in (0, None)

    # pcx output is palette-indexed: refused with a clear error
    rc = cli_main(["reproject", "--demo", str(out), "--width", "48",
                   "--height", "36", "--format", "pcx",
                   "--outdir", str(tmp_path / "x")])
    assert rc == 2


def test_viewer_serves_true_color():
    from urllib.request import urlopen

    from blinky_tpu.api import Session
    from blinky_tpu.io.png import decode_png
    from blinky_tpu.viewer import Viewer

    rng = np.random.default_rng(1)
    frames = pack_rgba(rng.integers(0, 256, (2, 6, 16, 16, 3), np.uint8))
    sess = Session(32, 24, platesize=16)
    v = Viewer(sess, frames)
    assert v.frames.dtype == np.uint32
    v.start()
    try:
        with urlopen(v.address + "/frame.png?i=1", timeout=30) as r:
            img = decode_png(r.read())
        assert img.shape == (24, 32, 3)
    finally:
        v.stop()


def test_equirect_to_cubemap_directions():
    """Known directions land on the right pano pixels: the front-face
    center is lon 0 / lat 0 (pano center), the top-face center is the
    north pole (pano top row)."""
    from blinky_tpu.io.cubemap import equirect_to_cubemap

    H, W = 64, 128
    # pano encodes its own coordinates: R = column, G = row
    pano = np.zeros((H, W, 3), np.uint8)
    pano[..., 0] = (np.arange(W) * 2)[None, :]
    pano[..., 1] = (np.arange(H) * 4)[:, None]
    faces = equirect_to_cubemap(pano, platesize=32, bilinear=False)
    assert faces.dtype == np.uint32 and faces.shape == (MAX_PLATES, 32, 32)
    c = 16  # plate center texel (u = v = 0.515 — close enough at S=32)
    front = unpack_rgb(faces[0, c, c])
    assert abs(int(front[0]) - (W // 2) * 2) <= 4   # lon ~ 0 -> center col
    assert abs(int(front[1]) - (H // 2) * 4) <= 8   # lat ~ 0 -> center row
    top = unpack_rgb(faces[4, c, c])
    assert int(top[1]) <= 8                          # north pole -> row ~ 0
    bottom = unpack_rgb(faces[5, c, c])
    assert int(bottom[1]) >= (H - 3) * 4 - 8         # south pole -> last row
    # right-face center: lon = +90deg -> 3/4 across the pano
    right = unpack_rgb(faces[1, c, c])
    assert abs(int(right[0]) - (3 * W // 4) * 2) <= 4


def test_equirect_roundtrip_through_equirect_lens():
    """equirect pano -> cubemap -> render with the equirect lens at
    contain zoom reproduces the pano (up to resampling)."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import equirect_to_cubemap

    H, W = 48, 96
    yy, xx = np.mgrid[0:H, 0:W]
    # smooth channels: resampling error stays local (a wrapping sawtooth
    # would alias at its discontinuities and dominate the diff)
    pano = np.stack([(xx * 255) // (W - 1), (yy * 255) // (H - 1),
                     ((xx + yy) * 255) // (W + H - 2)],
                    axis=-1).astype(np.uint8)
    faces = equirect_to_cubemap(pano, platesize=96)
    sess = Session(W, H, platesize=96)
    sess.cmd("f_lens equirect; f_contain")
    out = unpack_rgb(np.asarray(sess.render(faces))).astype(np.int64)
    # compare away from the poles (equirect stretches them) and borders
    band = slice(H // 4, 3 * H // 4)
    diff = np.abs(out[band] - pano[band].astype(np.int64))
    assert diff.mean() < 6, f"mean abs diff {diff.mean():.2f}"


def test_import_equirect_dir(tmp_path):
    from blinky_tpu.cli import main as cli_main
    from blinky_tpu.io.dataset import read_demo
    from blinky_tpu.io.png import encode_png

    rng = np.random.default_rng(2)
    for n in range(3):
        pano = rng.integers(0, 256, (32, 64, 3), np.uint8)
        (tmp_path / f"pano{n}.png").write_bytes(encode_png(pano))
    out = tmp_path / "demo.npz"
    rc = cli_main(["demo-import", str(tmp_path), "--equirect", "24",
                   "--out", str(out)])
    assert rc in (0, None)
    demo = read_demo(out)
    assert demo["frames"].shape == (3, MAX_PLATES, 24, 24)
    assert demo["frames"].dtype == np.uint32

    rc = cli_main(["demo-import", str(tmp_path), "--equirect", "24",
                   "--rgb", "--out", str(out)])
    assert rc == 2  # mutually exclusive


def test_equirect_ingest_device_matches_host():
    """The batched device ingest (static gather table, kernels/ingest.py)
    is bit-equal to the single-pano host path — same tables, same f32
    weights."""
    from blinky_tpu.kernels.ingest import EquirectIngest

    rng = np.random.default_rng(4)
    H, W, B = 24, 48, 5
    panos_rgb = rng.integers(0, 256, (B, H, W, 3), np.uint8)
    panos = pack_rgba(panos_rgb)  # [B, H, W] u32

    for bilinear in (True, False):
        kern = EquirectIngest(H, W, 16, bilinear=bilinear)
        dev = np.asarray(kern(np.moveaxis(panos, 0, -1)))  # [H, W, B] in
        assert dev.shape == (MAX_PLATES, 16, 16, B)
        for b in range(B):
            np.testing.assert_array_equal(dev[..., b], kern.host(panos[b]))

    # device output feeds the remap directly (device layout [P, S, S, B])
    from blinky_tpu.api import Session

    sess = Session(32, 24, platesize=16)
    out = np.asarray(sess.render(dev))
    assert out.shape == (24, 32, B) and out.dtype == np.uint32

    with pytest.raises(ValueError, match="panos must be"):
        EquirectIngest(H, W, 16)(panos)  # wrong layout: batch first
    with pytest.raises(ValueError, match="bilinear=False"):
        EquirectIngest(H, W, 16, bilinear=True).host_nearest_u8(
            np.zeros((H, W), np.uint8))


def test_session_render_equirect():
    """render_equirect = equirect_to_cubemap + render, entirely on
    device; single-pano and batch forms agree."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import equirect_to_cubemap

    rng = np.random.default_rng(8)
    H, W = 32, 64
    pano_rgb = rng.integers(0, 256, (H, W, 3), np.uint8)
    sess = Session(48, 36, platesize=24)
    out = np.asarray(sess.render_equirect(pano_rgb))
    assert out.shape == (36, 48) and out.dtype == np.uint32

    # equals the host-composed path
    faces = equirect_to_cubemap(pano_rgb, platesize=24)
    np.testing.assert_array_equal(out, np.asarray(sess.render(faces)))

    # batch form: per-lane equality with the single-pano form
    pano2 = rng.integers(0, 256, (H, W, 3), np.uint8)
    batch = np.stack([pack_rgba(pano_rgb), pack_rgba(pano2)], axis=-1)
    outs = np.asarray(sess.render_equirect(batch))
    assert outs.shape == (36, 48, 2)
    np.testing.assert_array_equal(outs[..., 0], out)
    np.testing.assert_array_equal(
        outs[..., 1], np.asarray(sess.render_equirect(pack_rgba(pano2))))

    # lens switches apply to the chained pipeline
    sess.cmd("f_lens hammer")
    out2 = np.asarray(sess.render_equirect(pano_rgb))
    assert (out2 != out).any()


def test_render_equirect_with_rubix_and_fallback():
    """Session rubix mode expands the u32 faces on-device instead of
    raising; disabled-fisheye fallback still honors the u32 contract."""
    from blinky_tpu.api import Session

    rng = np.random.default_rng(12)
    pano = rng.integers(0, 256, (24, 48, 3), np.uint8)
    sess = Session(48, 36, platesize=16)
    base = np.asarray(sess.render_equirect(pano))
    sess.cmd("f_rubix")
    out = np.asarray(sess.render_equirect(pano))
    assert out.dtype == np.uint32 and out.shape == (36, 48)
    assert (out != base).any()  # the tint layer shows

    sess.cmd("fisheye 0")
    fb = np.asarray(sess.render_equirect(pano))
    assert fb.dtype == np.uint32  # background decoded, not raw indices


def test_viewer_true_color_rubix():
    """Toggling f_rubix on a true-color demo keeps /frame.png working
    (the frame is expanded to the raw||tinted layout per request)."""
    from urllib.request import urlopen

    from blinky_tpu.api import Session
    from blinky_tpu.io.png import decode_png
    from blinky_tpu.viewer import Viewer

    rng = np.random.default_rng(13)
    frames = pack_rgba(rng.integers(0, 256, (1, 6, 16, 16, 3), np.uint8))
    sess = Session(32, 24, platesize=16)
    sess.cmd("f_rubix")
    v = Viewer(sess, frames)
    v.start()
    try:
        with urlopen(v.address + "/frame.png?i=0", timeout=30) as r:
            assert decode_png(r.read()).shape == (24, 32, 3)
    finally:
        v.stop()


def test_equirect_unused_plates_are_zero():
    """Plates beyond the globe's count come back all-zero, for both
    sampling modes and the palette path (they used to replicate
    pano[0, 0] through the weightless nearest gather)."""
    from blinky_tpu import globes
    from blinky_tpu.io.cubemap import equirect_to_cubemap

    rng = np.random.default_rng(14)
    pano = rng.integers(1, 256, (16, 32, 3), np.uint8)  # no zero texels
    fast = globes.get("fast")  # 2 plates
    for bilinear in (True, False):
        faces = equirect_to_cubemap(pano, globe=fast, platesize=8,
                                    bilinear=bilinear)
        assert faces[:2].all(), "used plates populated"
        assert not faces[2:].any(), "unused plates must be zero"
    pal_pano = rng.integers(1, 256, (16, 32), np.uint8)
    faces = equirect_to_cubemap(pal_pano, globe=fast, platesize=8)
    assert faces.dtype == np.uint8
    assert faces[:2].all() and not faces[2:].any()


def test_render_aa():
    """Supersampled rendering: factor 1 equals plain u32 render; factor 2
    smooths edges (strictly more intermediate values along the image
    circle) and follows session state."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    pal = default_palette()
    frames = synthetic_cubemap(32)
    sess = Session(64, 48, platesize=32, palette=pal)
    sess.cmd("f_lens fisheye1; f_contain")  # circular boundary = aliasing

    plain = np.asarray(sess.render(frames_to_rgba(frames, pal)))
    aa1 = np.asarray(sess.render_aa(frames, factor=1))
    np.testing.assert_array_equal(aa1, plain)

    aa2 = np.asarray(sess.render_aa(frames, factor=2))
    assert aa2.shape == plain.shape and aa2.dtype == np.uint32
    # the boundary ring gains blended colors the 1x render can't have
    vals_plain = set(np.unique(unpack_rgb(plain)[..., 0]).tolist())
    vals_aa = set(np.unique(unpack_rgb(aa2)[..., 0]).tolist())
    assert len(vals_aa) > len(vals_plain)
    assert (aa2 != plain).any()

    # state follows: a lens switch invalidates the cached hi-res session
    sess.cmd("f_lens hammer")
    aa_h = np.asarray(sess.render_aa(frames, factor=2))
    assert (aa_h != aa2).any()

    # rubix AA needs the expanded layout; with it, it renders
    from blinky_tpu.kernels.remap import expand_frames_tinted

    sess.cmd("f_rubix")
    with pytest.raises(ValueError, match="expanded"):
        sess.render_aa(frames, factor=2)
    ex = expand_frames_tinted(frames, pal)
    out = np.asarray(sess.render_aa(ex, factor=2))
    assert out.shape == (48, 64) and out.dtype == np.uint32

    with pytest.raises(ValueError, match="factor"):
        sess.render_aa(frames, factor=0)


def test_render_aa_follows_session_environment(tmp_path):
    """The hi-res AA session must mirror EVERYTHING that shapes the
    low-res one: user script dirs, the background underlay, size changes,
    palette reassignment — and alternating factors must hit the cache."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    # a user lens only resolvable through lens_dirs
    (tmp_path / "sq.py").write_text(
        "def make(ctx):\n"
        "    def lens_inverse(x, y):\n"
        "        import numpy as np\n"
        "        r2 = x * x + y * y\n"
        "        z = (1 - r2) / (1 + r2)\n"
        "        s = 1 + z\n"
        "        return x * s, y * s, z + 0 * x, True\n"
        "    return dict(lens_inverse=lens_inverse, lens_width=2.0,\n"
        "                lens_height=2.0, onload='f_contain')\n")
    pal = default_palette()
    frames = synthetic_cubemap(16)
    sess = Session(32, 24, platesize=16, palette=pal, lens_dirs=[tmp_path])
    sess.cmd("f_lens sq")
    assert sess.lens_valid
    aa = np.asarray(sess.render_aa(frames, factor=2))
    assert aa.shape == (24, 32)
    # the user lens actually rendered (not the background-only screen)
    assert len(np.unique(aa)) > 2

    # custom background shows through where the lens leaves gaps
    sess.cmd("f_lens fisheye1; f_contain")  # circular image -> corners bg
    bg = np.full((24, 32), 251, np.uint8)  # a bright palette entry
    sess.set_background(bg)
    aa_bg = np.asarray(sess.render_aa(frames, factor=2))
    plain_bg = np.asarray(sess.render(frames_to_rgba(frames, pal)))
    # corners are pure background in both, and they agree
    np.testing.assert_array_equal(aa_bg[0, 0], plain_bg[0, 0])
    assert aa_bg[0, 0] == pack_rgba(pal[251][None, None])[0, 0]

    # size change invalidates the cached hi-res session (and drops the
    # now wrong-sized background back to the default)
    sess.set_size(48, 36, platesize=16)
    aa_big = np.asarray(sess.render_aa(frames, factor=2))
    assert aa_big.shape == (36, 48)
    sess.set_background(np.full((36, 48), 251, np.uint8))

    # alternating factors both stay cached (no single-slot thrash)
    s1 = np.asarray(sess.render_aa(frames, factor=1))
    s2 = np.asarray(sess.render_aa(frames, factor=2))
    cache = sess._aa_cache
    assert isinstance(cache, dict) and len(cache) >= 2
    np.testing.assert_array_equal(
        np.asarray(sess.render_aa(frames, factor=1)), s1)
    assert len(sess._aa_cache) == len(cache)  # hit, not rebuild
    np.testing.assert_array_equal(
        np.asarray(sess.render_aa(frames, factor=2)), s2)

    # palette reassignment flushes the baked-in LUTs
    pal2 = pal.copy()
    pal2[251] = (0, 255, 0)
    sess.palette = pal2
    aa_p2 = np.asarray(sess.render_aa(frames, factor=2))
    assert aa_p2[0, 0] == pack_rgba(pal2[251][None, None])[0, 0]

def test_equirect_ingest_subset_chain():
    """EquirectIngest.subset (texel-compacted ingest) composed with
    compact_texels must reproduce the full pano->ingest->remap chain
    bit-exactly (plain and rubix post-gather tint), on both the device
    and host executors — same sliced tables, same f32 weights."""
    import jax.numpy as jnp

    from blinky_tpu import globes, lenses
    from blinky_tpu.kernels.ingest import EquirectIngest
    from blinky_tpu.kernels.remap import (
        RemapKernel, compact_texels, remap_gather_impl,
        remap_gather_tint_impl)
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
    from blinky_tpu.palette import default_palette

    rng = np.random.default_rng(11)
    H, W, B, S = 24, 48, 4, 16
    panos = pack_rgba(rng.integers(0, 256, (H, W, B, 3), np.uint8))

    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, 32, 24)
    lm = build_lensmap(lens, g, scale, 32, 24, S, backend="numpy")
    k = RemapKernel(lm, default_palette())
    texels, cidx = compact_texels(lm)
    bg = k.background_rgba

    for bilinear in (True, False):
        ing = EquirectIngest(H, W, S, globe=g, bilinear=bilinear)
        sub = ing.subset(texels)
        faces = ing(panos)
        faces_sub = sub(panos)
        assert faces_sub.shape == (texels.size, B)
        # subset output == the kept texels of the full ingest
        np.testing.assert_array_equal(
            np.asarray(faces_sub),
            np.asarray(faces).reshape(-1, B)[texels])
        # full chain equality, plain
        full = np.asarray(remap_gather_impl(
            faces, k.flat_idx, k.valid, bg))
        comp = np.asarray(remap_gather_impl(
            faces_sub, jnp.asarray(cidx), k.valid, bg))
        np.testing.assert_array_equal(comp, full)
        # full chain equality, rubix post-gather tint
        tr, tm = k.tint_rgb_mask
        full_r = np.asarray(remap_gather_tint_impl(
            faces, k.flat_idx, k.valid, bg, tr, tm))
        comp_r = np.asarray(remap_gather_tint_impl(
            faces_sub, jnp.asarray(cidx), k.valid, bg, tr, tm))
        np.testing.assert_array_equal(comp_r, full_r)
        # host executor agrees with the device subset per pano
        for b in range(B):
            np.testing.assert_array_equal(
                sub.host(np.asarray(panos[:, :, b])),
                np.asarray(faces_sub)[:, b])


def test_remap_kernel_u32_background():
    """A packed-RGBA u32 background is used DIRECTLY for u32 sources
    (host_remap parity — the old path silently truncated it mod 256 and
    re-decoded the garbage through the palette), and raises for u8
    sources like host_remap/prep_posed_inputs (round-5 review)."""
    from blinky_tpu import globes, lenses
    from blinky_tpu.kernels.remap import RemapKernel, host_remap
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale

    rng = np.random.default_rng(5)
    S = 16
    g = globes.get("cube")
    lens = lenses.get("hammer", g)  # ellipse bound: real invalid pixels
    scale = calc_scale(Zoom("contain"), lens, 32, 24)
    lm = build_lensmap(lens, g, scale, 32, 24, S, backend="numpy")
    bg_u32 = pack_rgba(rng.integers(0, 256, (24, 32, 3), np.uint8))
    frame = pack_rgba(rng.integers(0, 256, (6, S, S, 3), np.uint8))

    k = RemapKernel(lm, default_palette(), background=bg_u32)
    out = np.asarray(k(frame))
    ref = host_remap(lm, frame, default_palette(), background=bg_u32)
    np.testing.assert_array_equal(out, ref)
    # invalid pixels show the GIVEN u32 background verbatim
    assert (~lm.valid).any()
    np.testing.assert_array_equal(out[~lm.valid], bg_u32[~lm.valid])

    # u8 frames under a u32 background: raise, never silently mix
    u8_frame = rng.integers(0, 256, (6, S, S), np.uint8)
    with pytest.raises(ValueError, match="u8 .*background"):
        k(u8_frame)
    with pytest.raises(ValueError, match="u8 .*background"):
        host_remap(lm, u8_frame, default_palette(), background=bg_u32)


def test_posed_remap_sharded_validates_inputs():
    """The sharded posed path shares prep_posed_inputs with the
    non-sharded kernel (round-5 review): platesize and u8/u32
    frame-background mismatches must raise, not gather garbage."""
    import jax
    from jax.sharding import Mesh

    from blinky_tpu import globes, lenses
    from blinky_tpu.kernels.posed import PosedRemapKernel, posed_remap_sharded
    from blinky_tpu.lensmap import Zoom, calc_scale

    rng = np.random.default_rng(7)
    S = 16
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 120), lens, 32, 24)
    k = PosedRemapKernel(lens, g, 32, 24, scale, platesize=S)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    bases = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    wrong_size = rng.integers(0, 256, (6, S + 4, S + 4, 2), np.uint8)
    with pytest.raises(ValueError, match="platesize"):
        posed_remap_sharded(k, wrong_size, bases, mesh)
    rgba = pack_rgba(rng.integers(0, 256, (6, S, S, 2, 3), np.uint8))
    with pytest.raises(ValueError, match="RGBA .*background"):
        posed_remap_sharded(k, rgba, bases, mesh)  # u8 zero background
