"""The shipped examples must keep running end-to-end (at toy sizes)."""

import importlib.util
import sys
from pathlib import Path

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_360_video_example(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "example_360", EXAMPLES / "360_video.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["example_360"] = spec.loader.exec_module(mod) or mod
    # toy sizes so the whole pipeline runs in seconds on the CPU mesh
    mod.W, mod.H, mod.S, mod.N, mod.BATCH = 64, 48, 32, 6, 3
    mod.main(tmp_path / "out")
    ppms = sorted((tmp_path / "out").glob("*.ppm"))
    assert len(ppms) == 6
    from blinky_tpu.io.ppm import decode_ppm

    first = decode_ppm(ppms[0].read_bytes())
    last = decode_ppm(ppms[-1].read_bytes())
    assert first.shape == (48, 64, 3)
    # the example pans 90 degrees over the sequence — frames must differ
    assert (first != last).any()


def test_pose_playback_example(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "example_pose", EXAMPLES / "pose_playback.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.W, mod.H, mod.S, mod.N = 64, 48, 48, 5
    mod.main(tmp_path / "out")
    from blinky_tpu.io.ppm import decode_ppm

    ppms = sorted((tmp_path / "out").glob("pose*.ppm"))
    assert len(ppms) == 5
    first = decode_ppm(ppms[0].read_bytes())
    last = decode_ppm(ppms[-1].read_bytes())
    assert first.shape == (48, 64, 3)
    assert (first != last).any()  # the pan moved the view


def test_pano_pan_example(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "example_pano_pan", EXAMPLES / "pano_pan.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.W, mod.H, mod.S, mod.N = 64, 48, 32, 4
    mod.PANO_H, mod.PANO_W = 64, 128
    mod.main(tmp_path / "out")
    from blinky_tpu.io.png import decode_png

    pngs = sorted((tmp_path / "out").glob("pan_*.png"))
    assert len(pngs) == 4
    first = decode_png(pngs[0].read_bytes())
    last = decode_png(pngs[-1].read_bytes())
    assert first.shape == (48, 64, 3)
    assert (first != last).any()  # the pan + the video both moved


def test_equirect_pipeline_example(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "example_equirect", EXAMPLES / "equirect_pipeline.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.W, mod.H, mod.PANO_W, mod.PANO_H = 64, 48, 128, 64
    mod.S, mod.N, mod.BATCH = 48, 4, 2
    mod.main(tmp_path / "out")
    from blinky_tpu.io.png import decode_png

    pngs = sorted((tmp_path / "out").glob("frame*.png"))
    assert len(pngs) == 4
    assert decode_png(pngs[0].read_bytes()).shape == (48, 64, 3)
    # the mid-stream lens switch changes the output
    first = decode_png(pngs[0].read_bytes())
    last = decode_png(pngs[-1].read_bytes())
    assert (first != last).any()
    poster = decode_png((tmp_path / "out" / "poster_aa.png").read_bytes())
    assert poster.shape == (48, 64, 3)


def test_lua_drop_in_example(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "example_lua", EXAMPLES / "lua_drop_in.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.W, mod.H, mod.S, mod.STEPS = 64, 48, 32, 3
    out = mod.main(tmp_path / "out")
    assert (out / "sweep.gif").exists()
    from blinky_tpu.io.gif import decode_gif

    ramp, _, _ = decode_gif((out / "sweep.gif").read_bytes())
    assert ramp.shape == (48, 64, 3)
    assert (ramp[..., 0] != ramp[..., 2]).any()  # the zoom moved
