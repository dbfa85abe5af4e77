"""Bind-first cold serve (VERDICT r3 task 4): the host remap path, its
bit-equality with the device kernel, Session.render_host's
never-touch-the-device contract, and the viewer's warm handoff."""

import threading
import time
from urllib.request import urlopen

import numpy as np
import pytest

from blinky_tpu import globes, lenses
from blinky_tpu.api import Session
from blinky_tpu.io.cubemap import synthetic_cubemap
from blinky_tpu.kernels.remap import (
    RemapKernel, expand_frames_tinted, frames_to_rgba, host_remap,
)
from blinky_tpu.lensmap import Zoom, build_lensmap, calc_scale
from blinky_tpu.palette import default_palette
from blinky_tpu.viewer import Viewer

W, H, S = 64, 48, 48


@pytest.fixture(scope="module")
def lm():
    g = globes.get("cube")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 180), lens, W, H)
    return build_lensmap(lens, g, scale, W, H, S, backend="numpy")


def test_host_remap_bit_equals_device_kernel(lm):
    pal = default_palette()
    frame = synthetic_cubemap(S)
    bg = np.full((H, W), 9, np.uint8)
    k = RemapKernel(lm, pal, bg)
    # u8 plain / u8 rubix (general tint-LUT path) / RGB decode
    for kw in (dict(), dict(rubix=True), dict(decode_rgb=True)):
        np.testing.assert_array_equal(
            host_remap(lm, frame, pal, bg, **kw),
            np.asarray(k(frame, **kw)), err_msg=str(kw))
    # expanded raw||tinted source, rubix by static indices
    exp = expand_frames_tinted(frame, pal)
    np.testing.assert_array_equal(
        host_remap(lm, exp, pal, bg, rubix=True),
        np.asarray(k(exp, rubix=True)))
    # u32 plain and the post-gather true-color tint path
    rgba = frames_to_rgba(frame, pal)
    np.testing.assert_array_equal(
        host_remap(lm, rgba, pal, bg), np.asarray(k(rgba)))
    np.testing.assert_array_equal(
        host_remap(lm, rgba, pal, bg, rubix=True),
        np.asarray(k(rgba, rubix=True)))


def test_host_remap_partial_globe_and_errors(lm):
    pal = default_palette()
    g = globes.get("fast")
    lens = lenses.get("panini", g)
    scale = calc_scale(Zoom("fov", 140), lens, W, H)
    lm2 = build_lensmap(lens, g, scale, W, H, S, backend="numpy")
    frame = synthetic_cubemap(S)[:2]
    k = RemapKernel(lm2, pal)
    # the device kernel zero-pads short sources; host gathers clip into
    # the short source, so pad the same way before comparing
    padded = np.concatenate(
        [frame, np.zeros((4,) + frame.shape[1:], np.uint8)])
    np.testing.assert_array_equal(
        host_remap(lm2, padded, pal), np.asarray(k(frame)))
    with pytest.raises(ValueError, match="palette"):
        host_remap(lm, frame, None, rubix=True)
    with pytest.raises(ValueError, match="frame"):
        host_remap(lm, frame[..., None])


def test_session_render_host_matches_render():
    frame = synthetic_cubemap(S)
    a = Session(W, H, platesize=S)
    b = Session(W, H, platesize=S)
    for cmds in ([], ["f_rubix 1"], ["f_lens hammer"],
                 ["setviewangles 10 25 0"], ["fisheye 0"]):
        for c in cmds:
            a.cmd(c)
            b.cmd(c)
        hostout = np.asarray(a.render_host(frame))
        devout = np.asarray(b.render(frame))
        if cmds == ["setviewangles 10 25 0"]:
            # render() takes the f32 device builder for rotated views
            # (backend policy); render_host forces the exact host one —
            # boundary-texel drift only (docs/PERF.md §5)
            assert (hostout != devout).mean() < 0.02
        else:
            np.testing.assert_array_equal(hostout, devout)


def test_session_render_host_is_device_free(monkeypatch):
    """The whole cold path — session construction, commands, rebuild,
    render_host — must never construct a device array."""
    import jax.numpy as jnp

    def boom(*a, **k):
        raise AssertionError("device touched on the cold path")

    monkeypatch.setattr(jnp, "asarray", boom)
    monkeypatch.setattr(jnp, "zeros", boom)
    sess = Session(W, H, platesize=S)
    sess.cmd("f_lens hammer; f_rubix 1")
    frame = synthetic_cubemap(S)
    out = np.asarray(sess.render_host(frame))
    assert out.shape == (H, W)
    # a pending time-sliced exact build advances host-side too
    sess.cmd("f_lens winkeltripel")
    sess.build_budget_s = 1 / 240
    out2 = np.asarray(sess.render_host(frame))
    assert out2.shape == (H, W)


def test_viewer_cold_serve_with_mocked_slow_device(monkeypatch):
    """Bind-first contract: with the device warm mocked SLOW, the page
    binds and serves its first (host) frame immediately; after the warm
    thread finishes, rendering switches to the device path."""
    import blinky_tpu.lensmap as lensmap_mod

    sess = Session(W, H, platesize=32)
    frames = synthetic_cubemap(32)[None]
    v = Viewer(sess, frames, device_warm=False)

    real_build = lensmap_mod.build_lensmap
    started = threading.Event()

    def slow_build(*a, **k):
        started.set()
        time.sleep(1.0)  # the mocked cold compile
        return real_build(*a, **k)

    monkeypatch.setattr(lensmap_mod, "build_lensmap", slow_build)
    # the handler must not reach Session.render while cold
    real_render = Session.render
    monkeypatch.setattr(
        Session, "render",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("device render during cold phase")))
    v.start()
    try:
        t = v.start_background_warm()
        started.wait(5)
        t0 = time.perf_counter()
        with urlopen(v.address + "/frame.png?i=0", timeout=10) as r:
            assert r.status == 200
            assert "device warming" in r.headers["X-Status"]
        first_frame_s = time.perf_counter() - t0
        assert first_frame_s < 1.0, f"first host frame took {first_frame_s:.2f}s"
        assert not v.device_ready.is_set()
        t.join(30)
        assert v.device_ready.is_set()
        # warm: the device path serves now
        monkeypatch.setattr(Session, "render", real_render)
        with urlopen(v.address + "/frame.png?i=0", timeout=30) as r:
            assert r.status == 200
            assert "device warming" not in r.headers.get("X-Status", "")
    finally:
        v.stop()


def test_viewer_stays_on_host_when_warm_fails(monkeypatch):
    import blinky_tpu.lensmap as lensmap_mod

    sess = Session(W, H, platesize=32)
    v = Viewer(sess, synthetic_cubemap(32)[None], device_warm=False)
    monkeypatch.setattr(
        lensmap_mod, "build_lensmap",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("relay down")))
    v.start()
    try:
        t = v.start_background_warm()
        t.join(10)
        assert not v.device_ready.is_set()
        with urlopen(v.address + "/frame.png?i=0", timeout=10) as r:
            assert r.status == 200  # host renders keep serving
    finally:
        v.stop()


def test_warm_failure_retries_after_backoff(monkeypatch):
    """Review round 4: a transient relay error during the warm must not
    pin the viewer to host renders forever — once the failed thread is
    dead and the backoff has elapsed, a cold-phase request respawns the
    warm, which then flips device_ready."""
    import blinky_tpu.lensmap as lensmap_mod

    sess = Session(W, H, platesize=32)
    v = Viewer(sess, synthetic_cubemap(32)[None], device_warm=False)
    real = lensmap_mod.build_lensmap
    fail = {"on": True}

    def flaky(*a, **k):
        if fail["on"]:
            raise RuntimeError("relay down")
        return real(*a, **k)

    monkeypatch.setattr(lensmap_mod, "build_lensmap", flaky)
    v.start()
    try:
        t = v.start_background_warm()
        t.join(10)
        assert not v.device_ready.is_set()
        # within the backoff window: the request serves host, no retry
        with urlopen(v.address + "/frame.png?i=0", timeout=10) as r:
            assert r.status == 200
        assert v._warm_thread is t  # no respawn yet
        # relay "recovers"; force the backoff to have elapsed
        fail["on"] = False
        v._warm_retry_at = 0.0
        with urlopen(v.address + "/frame.png?i=0", timeout=10) as r:
            assert r.status == 200  # this request kicked the retry
        assert v._warm_thread is not t
        assert v.device_ready.wait(30)
    finally:
        v.stop()


def test_background_warm_covers_posed_pipeline_for_forward_lens():
    """With a forward-only lens active, the warm thread also pre-pays
    the static-ray posed pipeline (drag-look's path for that lens) —
    on its OWN kernel objects, leaving the session untouched."""
    from blinky_tpu.kernels.static_ray import _compiled_static_ray_pipeline

    sess = Session(W, H, platesize=32)
    sess.cmd("f_lens eckert1")
    v = Viewer(sess, synthetic_cubemap(32)[None], device_warm=False)
    before = _compiled_static_ray_pipeline.cache_info()
    t = v.start_background_warm()
    t.join(120)
    assert v.device_ready.is_set()
    after = _compiled_static_ray_pipeline.cache_info()
    # the posed pipeline was compiled (or its cache entry touched)
    assert (after.hits + after.misses) > (before.hits + before.misses)
    # the session itself was not mutated by the warm thread
    assert sess.view_angles is None
    assert getattr(sess, "_posed_cache", None) is None


def test_cli_no_warm_starts_device_live(monkeypatch):
    """`cli serve --no-warm` must start the viewer in WARM mode (the
    first request pays the compile, as its --help says): device_warm=
    False there would pin host renders forever, since nothing but
    start_background_warm ever sets device_ready (round-4 review)."""
    import blinky_tpu.viewer as viewer_mod
    from blinky_tpu import cli

    seen = {}

    class StubViewer:
        def __init__(self, sess, frames, poses=None, host="", port=0,
                     device_warm=True, pose_scale=1):
            seen["device_warm"] = device_warm
            seen.pop("warmed", None)
            self.address = "http://stub"

        def start_background_warm(self):
            seen["warmed"] = True

        def serve_forever(self):
            return

    monkeypatch.setattr(viewer_mod, "Viewer", StubViewer)
    assert cli.main(["serve", "--no-warm", "--platesize", "32"]) == 0
    assert seen["device_warm"] is True
    assert "warmed" not in seen
    assert cli.main(["serve", "--platesize", "32"]) == 0
    assert seen["device_warm"] is False
    assert seen["warmed"] is True
