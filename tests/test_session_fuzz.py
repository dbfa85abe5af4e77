"""Console robustness: arbitrary command input must never crash the
session — the reference degrades gracefully (invalid lens/globe keeps
rendering the background, bad args print usage; ``fisheye.c:737-741,
2371-2373``) and so must we."""

import numpy as np

from blinky_tpu.api import Session
from blinky_tpu.io.cubemap import synthetic_cubemap
from blinky_tpu.lensmap.zoom import ZoomError  # noqa: F401 (contract ref)


def test_console_fuzz_never_crashes(tmp_path, monkeypatch):
    # f_saveglobe / f_dumppal write into the CWD (as the reference's
    # COM_WriteFile does) — keep the fuzz storm's files out of the repo.
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    words = ["f_lens", "f_globe", "f_fov", "f_vfov", "f_cover", "f_contain",
             "f_rubix", "f_rubixgrid", "fisheye", "fov", "bind", "unbind",
             "exec", "setviewangles", "f_saveglobe", "f_dumppal", "f_help",
             "f_shortcutkeys", "panini", "nosuchlens", "cube", "-3", "9e99",
             "nan", "inf", "0", "1", "361", ";", "", "xyz", "--", "1e-9",
             '"quoted"', "\t", "zzz.lua", "../escape",
             "alias", "echo", "wait", 'alias a "f_fov 90"', "a",
             'alias b "b"', "b", '"semi; colon"', "unbindall",
             "9" * 39, "-" + "9" * 45, "0x" + "f" * 34, "1" * 400,
             "f_fov\x0090", "x\x00y", "stuffcmds", "stuffcmds extra"]
    # cmdline cmds include a stuffcmds so the fuzz exercises the
    # recursion guard (a cmdline chain re-entering stuffcmds)
    sess = Session(48, 36, platesize=16,
                   cmdline_cmds=["f_fov 120", "stuffcmds"])
    frames = synthetic_cubemap(16)
    for i in range(300):
        n = int(rng.integers(1, 5))
        line = " ".join(str(words[int(rng.integers(len(words)))])
                        for _ in range(n))
        sess.cmd(line)  # must not raise, whatever the state
        if i % 50 == 0:
            out = np.asarray(sess.render(frames))
            assert out.shape[:2] == (36, 48)
    # after the storm, the session recovers to a known-good state
    sess.cmd("fisheye 1; f_globe cube; f_lens panini; f_fov 180")
    sess.cmd("setviewangles")
    assert sess.lens_valid and sess.globe_valid
    out = np.asarray(sess.render(frames))
    assert out.shape == (36, 48) and out.any()


def test_config_roundtrip_after_fuzz(tmp_path):
    """Whatever state fuzzing leaves, write_config/exec_config round-trips
    it (F_WriteConfig semantics, fisheye.c:683-696)."""
    sess = Session(48, 36, platesize=16)
    for line in ("f_lens hammer", "f_rubixgrid 7 2 1", "f_vfov 90",
                 "f_rubix", "bind 3 \"f_lens fisheye1\""):
        sess.cmd(line)
    cfg = tmp_path / "config.cfg"
    sess.write_config(cfg)
    sess2 = Session(48, 36, platesize=16)
    sess2.exec_config(cfg)
    assert sess2.lens_name == "hammer"
    assert sess2.zoom.command() == "f_vfov 90"
    # the rubix on/off TOGGLE is deliberately not persisted — the
    # reference's F_WriteConfig (fisheye.c:683-696) writes only the
    # f_rubixgrid parameters
    assert not sess2.rubix_enabled and sess2.rubix_numcells == 7


def test_console_parser_survives_malformed_quoting_and_exec(tmp_path, monkeypatch):
    """COM_Parse reads an unterminated quote through end-of-line instead of
    erroring (common/common.c:1101-1114), and Cmd_Exec_f execs raw bytes —
    neither may crash the session."""
    monkeypatch.chdir(tmp_path)
    sess = Session(48, 36, platesize=16)
    sess.cmd('f_lens "unterminated')  # shlex would raise ValueError
    sess.cmd('bind 3 "f_lens fisheye1')  # unterminated bind value
    sess.cmd('"')
    sess.cmd("   ;;  ;")
    bad = tmp_path / "bad.cfg"
    bad.write_bytes(b"\xff\xfe\x00garbage\nf_lens panini\n")
    sess.cmd(f"exec {bad}")  # undecodable file: print, don't raise
    good = tmp_path / "good.cfg"
    good.write_text('f_lens hammer\nf_fov "90\n')
    sess.cmd(f"exec {good}")
    assert sess.lens_name == "hammer"
    out = np.asarray(sess.render(synthetic_cubemap(16)))
    assert out.shape == (36, 48)


def test_set_size_drops_stale_background():
    """A screen-sized underlay can't survive a resize — the session falls
    back to the default background instead of crashing the next render."""
    sess = Session(32, 24, platesize=16)
    sess.cmd("f_lens fisheye1; f_contain")
    frames = synthetic_cubemap(16)
    sess.set_background(np.full((24, 32), 251, np.uint8))
    assert np.asarray(sess.render(frames))[0, 0] == 251
    sess.set_size(48, 36, platesize=16)
    out = np.asarray(sess.render(frames))
    assert out.shape == (36, 48) and out[0, 0] != 251
