"""CLI demo-reprojection pipeline + PPM codec."""

import numpy as np

from blinky_tpu.io.ppm import decode_ppm, encode_ppm


def test_ppm_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_demo_synth_and_reproject(tmp_path):
    from blinky_tpu.cli import main

    demo = tmp_path / "demo.npz"
    out = tmp_path / "warped"
    assert main(["demo-synth", "--frames", "5", "--platesize", "48",
                 "--out", str(demo)]) == 0
    assert main([
        "reproject", "--demo", str(demo), "--width", "64", "--height", "48",
        "--batch", "3", "--cmd", "f_lens fisheye1", "--format", "ppm",
        "--outdir", str(out),
    ]) == 0
    files = sorted(out.glob("frame*.ppm"))
    assert len(files) == 5
    img = decode_ppm(files[0].read_bytes())
    assert img.shape == (48, 64, 3)
    # fisheye1 at contain: corners outside the image circle -> background
    assert (img[0, 0] == 0).all() and img.any()


def test_reproject_npz_stack(tmp_path):
    from blinky_tpu.cli import main

    demo = tmp_path / "demo.npz"
    out = tmp_path / "warped"
    main(["demo-synth", "--frames", "4", "--platesize", "48", "--out", str(demo)])
    assert main([
        "reproject", "--demo", str(demo), "--width", "64", "--height", "48",
        "--batch", "4", "--format", "npz", "--outdir", str(out),
    ]) == 0
    with np.load(out / "warped.npz") as z:
        assert z["screen"].shape == (4, 48, 64)
        assert z["palette"].shape == (256, 3)


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from blinky_tpu.utils.timing import profile_trace

    with profile_trace(str(tmp_path)):
        _ = jnp.arange(16).sum().block_until_ready()
    assert any(tmp_path.rglob("*")), "no trace artifacts written"


def test_reproject_follow_poses(tmp_path):
    from blinky_tpu.cli import main

    demo = tmp_path / "demo.npz"
    out = tmp_path / "warped"
    out2 = tmp_path / "warped_static"
    main(["demo-synth", "--frames", "6", "--platesize", "48", "--out", str(demo)])
    assert main([
        "reproject", "--demo", str(demo), "--width", "64", "--height", "48",
        "--batch", "2", "--follow-poses", "--format", "npz", "--outdir", str(out),
    ]) == 0
    assert main([
        "reproject", "--demo", str(demo), "--width", "64", "--height", "48",
        "--batch", "2", "--format", "npz", "--outdir", str(out2),
    ]) == 0
    with np.load(out / "warped.npz") as z, np.load(out2 / "warped.npz") as z2:
        a, b = z["screen"], z2["screen"]
    assert a.shape == b.shape == (6, 48, 64)
    # the synthetic pose track yaws over time -> later frames diverge
    assert (a[-1] != b[-1]).any()


def test_load_palette_dispatch(tmp_path):
    from blinky_tpu.cli import _load_palette
    from blinky_tpu.palette import default_palette, save_dumppal

    pal = default_palette()
    lmp = tmp_path / "palette.lmp"
    lmp.write_bytes(pal.tobytes())
    np.testing.assert_array_equal(_load_palette(str(lmp)), pal)
    # f_dumppal text (the file the reference's f_dumppal command writes,
    # fisheye.c:920) is ~2.3KB of "r, g, b," lines — must parse as text,
    # not as raw .lmp bytes
    txt = tmp_path / "palette"
    txt.write_text(save_dumppal(pal))
    np.testing.assert_array_equal(_load_palette(str(txt)), pal)


def test_parity_cli_builtin_and_user_scripts(tmp_path, capsys):
    """The parity subcommand resolves builtins by name and user lens
    scripts (.py / .lua drop-ins) by path, exit code = mismatch count."""
    import json

    from blinky_tpu.cli import main as cli_main

    rc = cli_main(["parity", "--lens", "panini", "--globe", "cube",
                   "--width", "48", "--height", "36"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["total"] == 0

    lua = tmp_path / "ortho.lua"
    lua.write_text(
        "max_fov = 180\nmax_vfov = 180\n"
        "lens_width = 2\nlens_height = 2\n"
        "onload = \"f_contain\"\n"
        "function lens_inverse(x,y)\n"
        "   local r2 = x*x + y*y\n"
        "   if r2 > 1 then return nil end\n"
        "   return x, y, sqrt(1-r2)\n"
        "end\n"
        "function lens_forward(x,y,z)\n"
        "   if z < 0 then return nil end\n"
        "   return x, y\n"
        "end\n")
    rc = cli_main(["parity", "--lens", str(lua), "--globe", "cube",
                   "--width", "48", "--height", "36"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["total"] == 0 and rep["map_type"] == "inverse"

    py = tmp_path / "ortho.py"
    py.write_text(
        "from blinky_tpu import xmath as m\n"
        "def make(ctx):\n"
        "    def lens_inverse(x, y):\n"
        "        r2 = x*x + y*y\n"
        "        return x, y, m.sqrt(1-r2), r2 <= 1\n"
        "    def lens_forward(x, y, z):\n"
        "        return x, y, z >= 0\n"
        "    return dict(lens_inverse=lens_inverse, lens_forward=lens_forward,\n"
        "                max_fov=180, max_vfov=180, lens_width=2,\n"
        "                lens_height=2, onload='f_contain')\n")
    rc = cli_main(["parity", "--lens", str(py), "--globe", "cube",
                   "--width", "48", "--height", "36"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["total"] == 0


def test_gallery_html_contact_sheet(tmp_path, monkeypatch):
    """gallery --format png --html writes decodable images + index.html
    (3 lenses monkeypatched in; the full 31-lens sweep is covered by
    test_all_lenses_render)."""
    from blinky_tpu import lenses
    from blinky_tpu.cli import main as cli_main
    from blinky_tpu.io.png import decode_png

    monkeypatch.setattr(lenses, "names",
                        lambda: ["panini", "hammer", "debug"])
    rc = cli_main(["gallery", "--width", "48", "--height", "36",
                   "--format", "png", "--html", "--outdir", str(tmp_path)])
    assert rc in (0, None)
    pngs = sorted(tmp_path.glob("*.png"))
    assert [p.stem for p in pngs] == ["debug", "hammer", "panini"]
    assert decode_png(pngs[0].read_bytes()).shape == (36, 48, 3)
    index = (tmp_path / "index.html").read_text()
    assert "panini" in index and 'src="hammer.png"' in index


def test_reproject_aa(tmp_path):
    """--aa K supersamples: true-color output, pcx refused, poses refused."""
    from blinky_tpu.cli import main as cli_main
    from blinky_tpu.io.png import decode_png

    demo = tmp_path / "demo.npz"
    cli_main(["demo-synth", "--frames", "2", "--platesize", "32",
              "--out", str(demo)])
    out = tmp_path / "aa"
    rc = cli_main(["reproject", "--demo", str(demo), "--width", "64",
                   "--height", "48", "--cmd", "f_lens fisheye1",
                   "--aa", "2", "--format", "png", "--outdir", str(out)])
    assert rc in (0, None)
    files = sorted(out.glob("*.png"))
    assert len(files) == 2
    img = decode_png(files[0].read_bytes())
    assert img.shape == (48, 64, 3)

    rc = cli_main(["reproject", "--demo", str(demo), "--width", "64",
                   "--height", "48", "--aa", "2", "--format", "pcx",
                   "--outdir", str(out)])
    assert rc == 2
    rc = cli_main(["reproject", "--demo", str(demo), "--width", "64",
                   "--height", "48", "--aa", "2", "--follow-poses",
                   "--format", "png", "--outdir", str(out)])
    assert rc == 2


def test_sweep_gif(tmp_path):
    """`sweep` writes an animated zoom sweep whose steps actually move,
    and a --bounce loop mirrors the ramp."""
    from blinky_tpu.cli import main
    from blinky_tpu.io.gif import decode_gif

    out = tmp_path / "sweep.gif"
    rc = main(["sweep", "--width", "64", "--height", "48", "--steps", "4",
               "--start", "120", "--stop", "300", "--bounce",
               "--out", str(out)])
    assert rc == 0
    frames, pal, delays = decode_gif(out.read_bytes())
    assert frames.shape == (48, 64, 6)  # 4 up + 2 back (bounce)
    assert (frames[..., 0] != frames[..., 3]).any()  # the zoom moved
    np.testing.assert_array_equal(frames[..., 1], frames[..., 5])  # mirror

    # an invalid lens errors out instead of writing junk
    assert main(["sweep", "--lens", "nosuch", "--out", str(out)]) == 2


def test_sweep_gif_lua_lens(tmp_path):
    """Round 3 (Lua->JAX): `sweep` drives a .lua drop-in through the
    jitted zoom-rebuild path, identically to the Python port."""
    import shutil

    from blinky_tpu.cli import main
    from blinky_tpu.io.gif import decode_gif

    shutil.copy("/root/reference/game/lua-scripts/lenses/stereographic.lua",
                tmp_path / "mystereo.lua")
    out_lua = tmp_path / "lua.gif"
    rc = main(["sweep", "--lens", "mystereo", "--lens-dir", str(tmp_path),
               "--width", "64", "--height", "48", "--steps", "3",
               "--start", "120", "--stop", "300", "--out", str(out_lua)])
    assert rc == 0
    out_py = tmp_path / "py.gif"
    rc = main(["sweep", "--lens", "stereographic",
               "--width", "64", "--height", "48", "--steps", "3",
               "--start", "120", "--stop", "300", "--out", str(out_py)])
    assert rc == 0
    fl, _, _ = decode_gif(out_lua.read_bytes())
    fp, _, _ = decode_gif(out_py.read_bytes())
    np.testing.assert_array_equal(fl, fp)


def test_fused_sweep_matches_per_step_path():
    """VERDICT r2 task 8 pin: the vmapped zoom-ramp pipeline
    (kernels.posed.zoom_sweep_remap) is bit-identical to per-step
    Session renders through the jitted builder — plain and rubix."""
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.kernels.posed import zoom_sweep_remap
    from blinky_tpu.kernels.remap import expand_frames_tinted
    from blinky_tpu.lensmap import Zoom, calc_scale

    W, H, S = 64, 48, 32
    values = [120, 180, 240, 300]
    for rubix in (False, True):
        sess = Session(W, H, platesize=S, backend="jax")
        sess.cmd("f_lens stereographic")
        src = synthetic_cubemap(S)
        if rubix:
            src = expand_frames_tinted(src, sess.palette)
        per_step = []
        for v in values:
            sess.cmd(f"f_fov {v}")
            per_step.append(np.asarray(sess.render(src, rubix=rubix)))
        scales = [calc_scale(Zoom("fov", v), sess.lens, W, H)
                  for v in values]
        fused = np.asarray(zoom_sweep_remap(
            sess.lens, sess.globe, scales, src, W, H))
        np.testing.assert_array_equal(fused, np.stack(per_step),
                                      err_msg=f"rubix={rubix}")


def test_sweep_fisheye_disabled_takes_per_step_path(tmp_path):
    """Review round 3: `sweep --cmd "fisheye 0"` renders the plain
    rectilinear view per step (the per-step path); the fused warped ramp
    must not engage."""
    from blinky_tpu.cli import main
    from blinky_tpu.io.gif import decode_gif

    out = tmp_path / "plain.gif"
    rc = main(["sweep", "--width", "64", "--height", "48", "--steps", "3",
               "--start", "120", "--stop", "300", "--cmd", "fisheye 0",
               "--out", str(out)])
    assert rc == 0
    frames, _, _ = decode_gif(out.read_bytes())
    # the plain view ignores f_fov: every step identical
    np.testing.assert_array_equal(frames[..., 0], frames[..., 1])
    np.testing.assert_array_equal(frames[..., 0], frames[..., 2])


def test_sweep_honors_session_rubix(tmp_path):
    """Review (late r3): `sweep --cmd f_rubix` (rubix enabled through
    the console rather than --rubix) must render the tinted grid."""
    from blinky_tpu.cli import main
    from blinky_tpu.io.gif import decode_gif

    plain = tmp_path / "plain.gif"
    tinted = tmp_path / "tinted.gif"
    args = ["sweep", "--width", "64", "--height", "48", "--steps", "3",
            "--start", "140", "--stop", "220"]
    assert main(args + ["--out", str(plain)]) == 0
    assert main(args + ["--cmd", "f_rubix", "--out", str(tinted)]) == 0
    f_plain, _, _ = decode_gif(plain.read_bytes())
    f_tinted, _, _ = decode_gif(tinted.read_bytes())
    assert (f_plain != f_tinted).any()
    # ...and matches the explicit --rubix path bit-exactly
    explicit = tmp_path / "explicit.gif"
    assert main(args + ["--rubix", "--out", str(explicit)]) == 0
    np.testing.assert_array_equal(
        decode_gif(explicit.read_bytes())[0], f_tinted)


def test_reproject_shard_matches_unsharded(tmp_path):
    """--shard (data-parallel over the 8-device CPU mesh) writes frames
    byte-identical to the unsharded run; --batch 0 derives a chunk that
    splits evenly over the devices (mesh-aware autobatch)."""
    from blinky_tpu.cli import main

    demo = tmp_path / "demo.npz"
    main(["demo-synth", "--frames", "6", "--platesize", "48",
          "--out", str(demo)])
    a, b = tmp_path / "plain", tmp_path / "sharded"
    common = ["reproject", "--demo", str(demo), "--width", "64",
              "--height", "48", "--rubix", "--format", "npz"]
    assert main(common + ["--batch", "6", "--outdir", str(a)]) == 0
    assert main(common + ["--batch", "0", "--shard",
                          "--outdir", str(b)]) == 0
    with np.load(a / "warped.npz") as za, np.load(b / "warped.npz") as zb:
        np.testing.assert_array_equal(za["screen"], zb["screen"])
