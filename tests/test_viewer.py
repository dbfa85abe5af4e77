"""Browser viewer (viewer.py): endpoints driven over real HTTP."""

import json
import time
from urllib.request import urlopen

import numpy as np
import pytest

from blinky_tpu.api import Session
from blinky_tpu.io.cubemap import synthetic_cubemap
from blinky_tpu.io.png import decode_png
from blinky_tpu.viewer import Viewer


@pytest.fixture
def served():
    sess = Session(64, 48, platesize=32)
    sess.cmd("f_shortcutkeys")
    frames = np.stack([np.roll(synthetic_cubemap(32), i, axis=2)
                       for i in range(3)])
    v = Viewer(sess, frames)
    v.start()
    yield v, sess
    v.stop()


def _get(v, path):
    # state-changing endpoints require the page token (CSRF guard);
    # frame.png?follow=1 mutates view angles, so it is gated too
    if path.startswith(("/cmd", "/key", "/record.gif")) or "follow=1" in path:
        sep = "&" if "?" in path else "?"
        path += f"{sep}t={v.token}"
    with urlopen(v.address + path, timeout=30) as r:
        return r.status, dict(r.headers), r.read()


def test_page_and_state(served):
    v, _ = served
    code, _, body = _get(v, "/")
    assert code == 200 and b"blinky-tpu" in body
    code, _, body = _get(v, "/state")
    st = json.loads(body)
    assert st["frames"] == 3
    assert st["lens"] == "panini" and st["zoom"] == "f_fov 180"
    assert urlopen_status(v, "/nope") == 404


def test_frame_render_and_commands(served):
    v, sess = served
    code, headers, body = _get(v, "/frame.png?i=1")
    assert code == 200
    img = decode_png(body)
    assert img.shape == (48, 64, 3)
    assert "f_lens panini" in headers["X-Status"]

    # console over HTTP changes the live session; new output is drained
    code, _, body = _get(v, "/cmd?c=f_lens%20hammer%3B%20f_rubix")
    lines = json.loads(body)["console"]
    assert any("f_lens hammer" in ln for ln in lines)
    assert sess.lens_name == "hammer" and sess.rubix_enabled
    _, headers, body2 = _get(v, "/frame.png?i=1")
    assert "f_lens hammer" in headers["X-Status"]
    assert decode_png(body2).shape == (48, 64, 3)

    # drag-to-look: setviewangles rebuilds and still renders
    _get(v, "/cmd?c=setviewangles%2010%2045%200")
    code, _, body3 = _get(v, "/frame.png?i=0")
    assert code == 200 and body3 != body2

    # frame index wraps modulo N
    _, h4, _ = _get(v, "/frame.png?i=4")
    assert "frame 1/3" in h4["X-Status"]


def test_shortcut_keys_over_http(served):
    """The reference's f_shortcutkeys binds (fisheye.c:984-997) work from
    the page: key '3' switches the lens."""
    v, sess = served
    _, _, body = _get(v, "/key?k=3")
    assert sess.lens_name != "panini"
    lines = json.loads(body)["console"]
    assert any("f_lens" in ln for ln in lines)
    # unbound key: no-op, no output
    _, _, body = _get(v, "/key?k=z")
    assert json.loads(body)["console"] == []


def test_render_error_surfaces_as_500(served):
    v, _ = served

    def boom(i):
        raise RuntimeError("injected")

    v.render_png = boom
    assert urlopen_status(v, "/frame.png?i=0") == 500
    # a bad query param also comes back as 500, not a hung socket
    assert urlopen_status(v, "/frame.png?i=zap") == 500


def urlopen_status(v, path):
    from urllib.error import HTTPError

    try:
        with urlopen(v.address + path, timeout=30) as r:
            return r.status
    except HTTPError as e:
        return e.code


def test_viewer_input_validation():
    sess = Session(32, 24, platesize=16)
    with pytest.raises(ValueError, match="frames"):
        Viewer(sess, np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="at least one frame"):
        Viewer(sess, np.zeros((0, 6, 16, 16), np.uint8))
    # a single [P, S, S] cubemap is promoted to one frame
    v = Viewer(sess, synthetic_cubemap(16))
    assert v.frames.shape[0] == 1


def test_state_changing_endpoints_require_token(served):
    """A cross-origin page can fire GETs at localhost but cannot read the
    served page to learn the token — /cmd and /key without it are 403
    and do NOT touch the session."""
    v, sess = served
    assert urlopen_status(v, "/cmd?c=f_lens%20hammer") == 403
    assert urlopen_status(v, "/key?k=3&t=wrong") == 403
    # follow=1 mutates view angles via setviewangles — gated like /cmd;
    # plain frame fetches stay open (read-only render)
    assert urlopen_status(v, "/frame.png?i=0&follow=1") == 403
    assert urlopen_status(v, "/frame.png?i=0") == 200
    assert sess.lens_name == "panini"
    # the served page embeds the real token
    _, _, page = _get(v, "/")
    assert v.token.encode() in page
    # read-only endpoints stay open
    assert urlopen_status(v, "/state") == 200


def test_follow_pose_track():
    """/frame.png?follow=1 applies the demo pose per frame; /state
    advertises the track so the page shows the toggle."""
    import json

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)] * 3)  # same content...
    poses = np.array([[0, 0, 0], [0, 90, 0], [10, 180, 0]], np.float32)
    v = Viewer(sess, frames, poses=poses)
    v.start()
    try:
        _, _, body = _get(v, "/state")
        assert json.loads(body)["has_poses"] is True
        _, _, f0 = _get(v, "/frame.png?i=0&follow=1")
        _, _, f1 = _get(v, "/frame.png?i=1&follow=1")
        assert f0 != f1  # ...so only the pose differs
        # index past the track clamps to the last pose
        _, _, f9 = _get(v, "/frame.png?i=2&follow=1")
        assert f9 != f1
    finally:
        v.stop()

    # an empty pose array counts as "no track"
    v2 = Viewer(sess, frames, poses=np.zeros((0, 3), np.float32))
    assert v2.poses is None


def test_record_gif(served):
    """/record.gif captures the frame loop through the live session as
    one animated GIF, honoring from/n/d; the page links it."""
    from blinky_tpu.io.gif import decode_gif

    v, sess = served
    code, headers, body = _get(v, "/record.gif?d=7")
    assert code == 200 and headers["Content-Type"] == "image/gif"
    frames, pal, delays = decode_gif(body)
    assert frames.shape == (48, 64, 3) and delays == [7, 7, 7]
    np.testing.assert_array_equal(pal, sess.palette)
    # frame 0 of the capture == the live single-frame render
    np.testing.assert_array_equal(frames[..., 0],
                                  np.asarray(sess.render(v.frames[0])))
    # windowed capture
    _, _, two = _get(v, "/record.gif?from=1&n=2")
    f2 = decode_gif(two)[0]
    assert f2.shape[-1] == 2
    np.testing.assert_array_equal(f2[..., 0], frames[..., 1])
    # the page exposes the link
    _, _, page = _get(v, "/")
    assert b"/record.gif" in page


def test_record_gif_fast_captures_posed_path(monkeypatch):
    """/record.gif?fast=1 records what the interactive viewer shows —
    the static-ray posed frames for a forward-only lens under a pose —
    with no exact per-pose rasterization (the default capture stays
    exact, test_drag_look_forward_lens_static_ray)."""
    from blinky_tpu.io.gif import decode_gif
    import blinky_tpu.lensmap.forward_raster as fr

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    v = Viewer(sess, frames)
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20eckert1%3B%20setviewangles%200%2030%200")
        _get(v, "/frame.png?i=0")  # warm the posed pipeline key
        calls = []
        orig = fr.build_forward
        monkeypatch.setattr(
            fr, "build_forward",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        _, h, gif = _get(v, "/record.gif?n=1&fast=1")
        assert h["Content-Type"] == "image/gif"
        assert not calls  # no exact per-pose raster in a fast capture
        got, pal, _ = decode_gif(gif)
        ref = np.asarray(sess.render_posed(
            frames[0][..., None], np.asarray([[0.0, 30.0, 0.0]])))[0]
        np.testing.assert_array_equal(got[..., 0], ref)
    finally:
        v.stop()


def test_record_gif_fast_cold_key_compiles_inline():
    """A fast capture whose posed-pipeline key is COLD (rubix toggled
    since the last drag) must compile inline and record real frames —
    the interactive stale-frame fallback would bake N copies of the
    pre-toggle frame into the one-shot export."""
    from blinky_tpu.io.gif import decode_gif

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    v = Viewer(sess, frames)
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20eckert1%3B%20setviewangles%200%2030%200")
        _get(v, "/frame.png?i=0")       # warm the RAW-source key
        stale = v._last_posed.copy()
        _get(v, "/cmd?c=f_rubix%201")   # expanded source -> NEW cold key
        _, h, gif = _get(v, "/record.gif?n=2&fast=1")
        assert h["Content-Type"] == "image/gif"
        got, pal, _ = decode_gif(gif)
        # not the stale pre-toggle frame ...
        assert (got[..., 0] != stale).any()
        # ... but the real posed render of the rubix-expanded source
        ref = np.asarray(sess.render_posed(
            v._posed_source(0), np.asarray([[0.0, 30.0, 0.0]])))[0]
        np.testing.assert_array_equal(got[..., 0], ref)
    finally:
        v.stop()


def test_record_gif_true_color_quantizes():
    """A u32 source capture comes back as a median-cut-quantized GIF whose
    colors match the true-color render closely."""
    from blinky_tpu.io.gif import decode_gif
    from blinky_tpu.kernels.remap import frames_to_rgba, unpack_rgb

    sess = Session(48, 36, platesize=16)
    u8 = np.stack([synthetic_cubemap(16)] * 2)
    rgba = np.stack([frames_to_rgba(f, sess.palette) for f in u8])
    v = Viewer(sess, rgba)
    v.start()
    try:
        _, headers, body = _get(v, "/record.gif?n=2")
        assert headers["Content-Type"] == "image/gif"
        frames, pal, _ = decode_gif(body)
        assert frames.shape == (36, 48, 2)
        truth = unpack_rgb(np.asarray(sess.render(rgba[0])))
        err = np.abs(pal[frames[..., 0]].astype(int) - truth.astype(int))
        assert err.mean() < 8
    finally:
        v.stop()


def test_viewer_lens_switch_time_sliced():
    """VERDICT r2 task 3: a lens switch must not freeze the page for the
    full exact build — the viewer enables the session's time-sliced
    builder (1/60 s like the reference, fisheye.c:645), paints the f32
    preview immediately, reports progress in the HUD, and converges to
    the exact table."""
    sess = Session(96, 72, platesize=48)
    assert sess.build_budget_s is None
    frames = synthetic_cubemap(48)[None]
    v = Viewer(sess, frames)
    assert sess.build_budget_s == pytest.approx(1 / 60)
    # shrink the slice so the tiny 96x72 exact build spans several
    # frames (at 1/60 s it lands within ~2 slices — instant-exact)
    sess.build_budget_s = 2e-4
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20winkeltripel")
        # first frame: preview while the exact build is pending
        _, headers, _ = _get(v, "/frame.png?i=0")
        assert sess.build_progress is not None
        assert "[exact build" in headers["X-Status"]
        for _ in range(400):
            _, headers, body = _get(v, "/frame.png?i=0")
            if sess.build_progress is None:
                break
        assert sess.build_progress is None
        assert "[exact build" not in headers["X-Status"]
    finally:
        v.stop()
    ref = Session(96, 72, platesize=48, backend="numpy")
    ref.cmd("f_lens winkeltripel")
    np.testing.assert_array_equal(
        np.asarray(sess.render(frames[0])), np.asarray(ref.render(frames[0])))


def test_record_gif_is_exact_during_pending_build():
    """Review round 3: /record.gif must capture EXACT frames even while
    a time-sliced build is pending and when follow=1 triggers per-frame
    rebuilds — the capture suspends slicing (no f32-preview or
    partial-table frames in the recording)."""
    from blinky_tpu.io.gif import decode_gif

    sess = Session(96, 72, platesize=48, build_budget_s=1e-6)
    frames = np.stack([synthetic_cubemap(48)] * 2)
    poses = np.array([[0, 0, 0], [0, 40, 0]], np.float32)
    v = Viewer(sess, frames, poses=poses)
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20winkeltripel")
        _get(v, "/frame.png?i=0")  # kick off the sliced build
        assert sess.build_progress is not None
        _, _, body = _get(v, "/record.gif?n=2&follow=1")
        got, pal, _ = decode_gif(body)
    finally:
        v.stop()
    assert sess.build_budget_s == 1e-6  # restored after the capture
    # the reference: the same auto-backend path with NO time-slicing
    # (posed frames use the f32 device builder either way — the point is
    # that no partial/preview table leaks into the capture)
    ref = Session(96, 72, platesize=48)
    ref.cmd("f_lens winkeltripel")
    for k, (p, y, r) in enumerate(poses):
        ref.cmd(f"setviewangles {float(p)} {float(y)} {float(r)}")
        np.testing.assert_array_equal(
            got[..., k], np.asarray(ref.render(frames[k])),
            err_msg=f"frame {k} not exact")


def test_drag_look_forward_lens_static_ray(monkeypatch):
    """Round 4: a forward-only lens under drag-look must NOT pay the
    exact host rasterization per pose (seconds at production sizes) —
    /frame.png takes the static-ray posed path (one raster for the ray
    table, then device-rate poses; the reference's pose/lensmap
    decoupling, fisheye.c:750,2427-2450 vs 2346-2397), bit-equal to
    Session.render_posed, while /record.gif keeps the exact per-pose
    contract."""
    from blinky_tpu.io.gif import decode_gif
    import blinky_tpu.lensmap.forward_raster as fr

    calls = []
    orig = fr.build_forward

    def counting(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(fr, "build_forward", counting)
    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    v = Viewer(sess, frames)
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20eckert1")
        _, h0, b0 = _get(v, "/frame.png?i=0")  # static render (1 raster)
        assert "[static-ray pose]" not in h0["X-Status"]
        after_static = len(calls)
        _get(v, "/cmd?c=setviewangles%2010%2045%200")
        _, h1, b1 = _get(v, "/frame.png?i=0")
        # the ray table reuses the session's pre-drag identity build
        # (_lensmap_meta): the FIRST drag pays no re-rasterization either
        assert len(calls) == after_static
        _get(v, "/cmd?c=setviewangles%20-5%2090%200")
        _, h2, b2 = _get(v, "/frame.png?i=0")
        assert len(calls) == after_static  # NO rasterization per pose
        assert "[static-ray pose]" in h2["X-Status"]
        assert b1 != b2
        ref = np.asarray(sess.render_posed(
            frames[0][..., None], np.asarray([[-5.0, 90.0, 0.0]])))[0]
        np.testing.assert_array_equal(decode_png(b2), sess.palette[ref])
        # the capture contract is unchanged: /record.gif blocks for the
        # EXACT composed build even on the posed-preview path
        before_gif = len(calls)
        _, _, gif = _get(v, "/record.gif?n=1")
        assert len(calls) > before_gif  # the exact per-pose raster ran
        got, pal, _ = decode_gif(gif)
        np.testing.assert_array_equal(
            got[..., 0], np.asarray(sess.render(frames[0])))
    finally:
        v.stop()


def test_drag_look_forward_lens_rubix_expands(monkeypatch):
    """The posed preview honors f_rubix by expanding the single frame to
    the raw||tinted layout (rubix rides the source on every posed path)
    — and caches the expansion across polls."""
    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    v = Viewer(sess, frames)
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20eckert1%3B%20f_rubix%3B%20"
                "setviewangles%200%2030%200")
        _, _, b1 = _get(v, "/frame.png?i=0")
        (key1, src1), = v._posed_src.items()
        assert src1.shape[0] == 12  # expanded raw||tinted
        _, _, b1b = _get(v, "/frame.png?i=0")
        assert v._posed_src[key1] is src1  # cached across polls
        assert b1 == b1b
        from blinky_tpu.kernels.remap import expand_frames_tinted

        ref = np.asarray(sess.render_posed(
            expand_frames_tinted(frames[0][..., None], sess.palette),
            np.asarray([[0.0, 30.0, 0.0]])))[0]
        np.testing.assert_array_equal(decode_png(b1), sess.palette[ref])
        # turning the grid off switches to the raw 6-plane source; wait
        # out the background pipeline warm the source-kind change kicks
        _get(v, "/cmd?c=f_rubix")
        deadline = time.time() + 60
        while time.time() < deadline:
            _, h2, b2 = _get(v, "/frame.png?i=0")
            if "[compiling posed pipeline]" not in h2["X-Status"]:
                break
            time.sleep(0.05)
        assert "[compiling posed pipeline]" not in h2["X-Status"]
        raw = [s for (i, rub, _), s in v._posed_src.items()
               if (i, rub) == (0, False)]
        assert raw and raw[0].shape[0] == 6
        assert b2 != b1
    finally:
        v.stop()


def test_drag_look_pose_scale_auto_smoke():
    """pose_scale='auto' bypasses the warmth gate (the probes time the
    device inline by design) and still renders poses through the
    dynamic-resolution posed path."""
    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    v = Viewer(sess, frames, pose_scale="auto")
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20eckert1%3B%20setviewangles%200%2030%200")
        code, h1, b1 = _get(v, "/frame.png?i=0")
        assert code == 200 and "[static-ray pose]" in h1["X-Status"]
        assert "[compiling posed pipeline]" not in h1["X-Status"]
        _get(v, "/cmd?c=setviewangles%200%2090%200")
        code, _, b2 = _get(v, "/frame.png?i=0")
        assert code == 200 and b2 != b1
    finally:
        v.stop()


def test_blocking_capture_joins_inflight_posed_warm(monkeypatch):
    """A blocking fast capture that hits a cold posed-pipeline key while
    a background warm for the SAME key is mid-compile must join that
    thread, not trace the same executable concurrently on two threads
    (same latency, one compile, no concurrent device dispatch)."""
    import threading

    import blinky_tpu.viewer as viewer_mod

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    sess.cmd("f_lens eckert1; setviewangles 0 30 0")
    v = Viewer(sess, frames)
    out1 = v._render_posed_frame(0)  # warm key A inline

    real = viewer_mod.Viewer._compile_posed_pipeline
    started, gate = threading.Event(), threading.Event()
    calls = []

    def slow(self, *a, **kw):
        calls.append(a)
        started.set()
        assert gate.wait(30)
        return real(self, *a, **kw)

    monkeypatch.setattr(viewer_mod.Viewer, "_compile_posed_pipeline", slow)
    sess.cmd("f_globe trism")  # new pipeline key B
    out2 = v._render_posed_frame(0)  # kicks the warm, serves stale
    np.testing.assert_array_equal(out2, out1)
    assert v._posed_stale and started.wait(10)
    t = v._posed_warming[v._posed_pipeline_key(v._posed_source(0))]
    assert t.is_alive()
    # the join is the contract: by the time the blocking path reaches
    # the session render, the warm thread must already be DEAD (without
    # the join both run concurrently and this assert fires)
    real_rp = type(sess).render_posed

    def render_asserting_join(self, *a, **kw):
        assert not t.is_alive(), "inline render overlapped the warm"
        return real_rp(self, *a, **kw)

    monkeypatch.setattr(type(sess), "render_posed", render_asserting_join)
    threading.Timer(0.2, gate.set).start()
    out3 = v._render_posed_frame(0, block=True)  # joins, never re-traces
    assert len(calls) == 1  # one compile total, the warm thread's
    assert not v._posed_stale
    ref = np.asarray(sess.render_posed(
        frames[0][..., None], np.asarray([[0.0, 30.0, 0.0]])))[0]
    np.testing.assert_array_equal(out3, ref)


def test_posed_preview_warmth_gate_serves_stale_frame(monkeypatch):
    """A cold compiled-pipeline key mid-drag (here: a globe switch) must
    not block the single-threaded server — the last posed frame keeps
    serving with a '[compiling posed pipeline]' status while a
    background thread compiles, then polls go live."""
    import threading

    import blinky_tpu.viewer as viewer_mod

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    v = Viewer(sess, frames)
    v.start()
    try:
        _get(v, "/cmd?c=f_lens%20eckert1%3B%20setviewangles%200%2030%200")
        _, h1, b1 = _get(v, "/frame.png?i=0")
        assert "[static-ray pose]" in h1["X-Status"]
        # make the next compile observable: stall _compile_posed_pipeline
        real = viewer_mod.Viewer._compile_posed_pipeline
        started = threading.Event()

        def slow(self, *a, **kw):
            started.set()
            time.sleep(0.5)
            return real(self, *a, **kw)

        monkeypatch.setattr(viewer_mod.Viewer, "_compile_posed_pipeline",
                            slow)
        _get(v, "/cmd?c=f_globe%20trism")  # new globe => new pipeline key
        _, h2, b2 = _get(v, "/frame.png?i=0")
        assert "[compiling posed pipeline]" in h2["X-Status"]
        assert b2 == b1  # the stale frame kept serving
        deadline = time.time() + 60
        while time.time() < deadline:
            _, h3, b3 = _get(v, "/frame.png?i=0")
            if "[compiling posed pipeline]" not in h3["X-Status"]:
                break
            time.sleep(0.05)
        assert "[compiling posed pipeline]" not in h3["X-Status"]
        assert b3 != b1  # live now, on the new globe
        ref = np.asarray(sess.render_posed(
            frames[0][..., None], np.asarray([[0.0, 30.0, 0.0]])))[0]
        np.testing.assert_array_equal(decode_png(b3), sess.palette[ref])
    finally:
        v.stop()


def test_state_drains_console_only_with_token():
    """Draining the console is a mutation: /state without the page
    token returns state but must NOT consume pending console lines
    (a drive-by cross-origin GET would make them vanish from the real
    page's log)."""
    import json

    sess = Session(64, 48, platesize=32)
    v = Viewer(sess, np.stack([synthetic_cubemap(32)]))
    v.start()
    try:
        sess.cmd("echo hello-from-test")
        _, _, body = _get(v, "/state")  # tokenless: no drain
        assert json.loads(body)["console"] == []
        _, _, body = _get(v, f"/state?t={v.token}")
        lines = json.loads(body)["console"]
        assert any("hello-from-test" in ln for ln in lines)
        # drained now: a second token-bearing poll sees nothing new
        _, _, body = _get(v, f"/state?t={v.token}")
        assert json.loads(body)["console"] == []
    finally:
        v.stop()


def test_follow_small_angles_fixed_point():
    """Pose components in exponent range must not mis-parse through the
    console (Q_atof has no 'e' syntax): a ~1e-5-degree pose renders as
    ~zero, identical to the zero pose, and the no-op guard holds."""
    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)] * 2)
    poses = np.array([[0.0, 0.0, 0.0], [6.104e-05, 0.0, 0.0]], np.float32)
    v = Viewer(sess, frames, poses=poses)
    v.start()
    try:
        _get(v, "/frame.png?i=1&follow=1")
        # exponent text would have parsed as 6.104 degrees; fixed-point
        # keeps the pitch at ~6e-5
        assert abs(sess.view_angles[0] - 6.104e-05) < 1e-7
        # the no-op guard is stable: polling the same frame again does
        # not re-issue setviewangles (no rebuild flagged)
        va = sess.view_angles
        _get(v, "/frame.png?i=1&follow=1")
        assert sess.view_angles == va
    finally:
        v.stop()


def test_endpoint_fuzz_server_survives():
    """Robustness net over the HTTP surface: 250 seeded-random requests
    (unknown paths, mangled percent-encodings, wrong-type / huge /
    negative params, token present or absent, garbage console text)
    must each get an HTTP response — never a crashed or hung server —
    and afterwards the viewer still serves a clean frame and the
    session is still valid."""
    import random
    from urllib.error import HTTPError, URLError

    rng = random.Random(0xB111)
    sess = Session(48, 36, platesize=16)
    v = Viewer(sess, np.stack([synthetic_cubemap(16)] * 2),
               poses=np.zeros((2, 3), np.float32))
    v.start()
    try:
        paths = ["/", "/frame.png", "/state", "/cmd", "/key",
                 "/record.gif", "/favicon.ico", "/..", "/%zz", "/nope"]
        # real console verbs with randomized args — minus f_saveglobe
        # (writes files) — plus pure garbage lines
        verbs = ["f_lens", "f_globe", "f_fov", "f_vfov", "f_cover",
                 "f_contain", "f_rubix", "f_rubixgrid", "fisheye",
                 "setviewangles", "bind", "echo", "wait", "alias"]
        junk = "%00%ff%%%20&&==??//\\'\"<>~`"
        for _ in range(250):
            path = rng.choice(paths)
            params = []
            for _ in range(rng.randrange(4)):
                k = rng.choice(["i", "c", "k", "t", "follow", "fast",
                                "d", rng.choice("abcxyz")])
                val = rng.choice([
                    str(rng.randrange(-9, 9)),
                    str(rng.randrange(10**9)),
                    "zap", "", "1e309", "nan",
                    "".join(rng.choices(junk, k=rng.randrange(1, 9))),
                    f"{rng.choice(verbs)}%20" + "".join(
                        rng.choices("abc0.-%20", k=rng.randrange(8))),
                ])
                if k == "t" and rng.random() < 0.5:
                    val = v.token  # valid token: mutating paths run too
                params.append(f"{k}={val}")
            if params:
                path += "?" + "&".join(params)
            try:
                with urlopen(v.address + path, timeout=30) as r:
                    assert r.status in (200,)
            except HTTPError as e:
                assert e.code in (400, 403, 404, 500)
            except (URLError, TimeoutError) as e:  # pragma: no cover
                raise AssertionError(f"server died on {path!r}: {e}")
        # still alive and rendering; the session survived the storm
        assert urlopen_status(v, "/frame.png?i=0") == 200
        assert sess.render(v.frames[0]).shape == (36, 48)
    finally:
        v.stop()


def test_pose_scale_validated_at_construction():
    """Viewer.__init__ validates pose_scale (ADVICE r4): a non-int,
    non-'auto' value must fail at construction, not silently bypass the
    warmth gate and 500 deep inside render_posed per request."""
    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    for bad in ("bogus", 1.5, True, 0, -2, 5):  # 5: 64 not divisible
        with pytest.raises(ValueError):
            Viewer(sess, frames, pose_scale=bad)
    # the two valid forms still construct
    Viewer(sess, frames, pose_scale=2)
    Viewer(sess, frames, pose_scale="auto")


def test_failed_posed_warm_backs_off_and_retries(monkeypatch):
    """A transient relay error during a posed-pipeline warm must NOT pin
    the key to inline compiles forever (ADVICE r4): the failure records
    a retry-at timestamp, polls inside the backoff serve the stale
    frame without respawning, and a poll after the backoff re-warms."""
    import blinky_tpu.viewer as viewer_mod

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    sess.cmd("f_lens eckert1; setviewangles 0 30 0")
    v = Viewer(sess, frames)
    out1 = v._render_posed_frame(0)  # warm key A inline

    real = viewer_mod.Viewer._compile_posed_pipeline
    calls = []

    def flaky(self, *a, **kw):
        calls.append(a)
        if len(calls) == 1:
            raise RuntimeError("transient relay error")
        return real(self, *a, **kw)

    monkeypatch.setattr(viewer_mod.Viewer, "_compile_posed_pipeline", flaky)
    sess.cmd("f_globe trism")  # new pipeline key B
    out2 = v._render_posed_frame(0)  # kicks the failing warm
    np.testing.assert_array_equal(out2, out1)
    pk = v._posed_pipeline_key(v._posed_source(0))
    deadline = time.monotonic() + 10
    while pk in v._posed_warming and time.monotonic() < deadline:
        time.sleep(0.01)
    # failure contract: NOT marked warm, retry-at recorded, thread pruned
    assert pk not in v._posed_warm_keys
    assert pk not in v._posed_warming  # dead threads don't accumulate
    assert v._posed_warm_retry_at.get(pk, 0) > time.monotonic()
    # inside the backoff: serve stale, no new warm spawned
    out3 = v._render_posed_frame(0)
    np.testing.assert_array_equal(out3, out1)
    assert len(calls) == 1 and pk not in v._posed_warming
    # past the backoff: the next poll respawns the warm and it succeeds
    v._posed_warm_retry_at[pk] = time.monotonic() - 1
    v._render_posed_frame(0)
    deadline = time.monotonic() + 30
    while pk not in v._posed_warm_keys and time.monotonic() < deadline:
        time.sleep(0.05)
    assert len(calls) == 2 and pk in v._posed_warm_keys
    assert pk not in v._posed_warm_retry_at  # success clears the backoff
    out4 = v._render_posed_frame(0)  # live posed frame for the new globe
    assert pk not in v._posed_warming  # pruned after success too
    ref = np.asarray(sess.render_posed(
        v._posed_source(0), np.asarray([[0.0, 30.0, 0.0]])))[0]
    np.testing.assert_array_equal(out4, ref)


def test_deterministic_posed_warm_failure_surfaces_inline(monkeypatch):
    """A warm that fails REPRODUCIBLY must not stale-serve + respawn
    forever: after POSED_WARM_MAX_FAILS consecutive failures on one key
    the drag path compiles inline, so the real error reaches the request
    (a 500) instead of an infinite frozen-frame/retry loop — and a later
    success recovers the key."""
    import blinky_tpu.viewer as viewer_mod

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    sess.cmd("f_lens eckert1; setviewangles 0 30 0")
    v = Viewer(sess, frames)
    out1 = v._render_posed_frame(0)  # warm key A inline

    def boom(self, *a, **kw):
        raise RuntimeError("pipeline build broken")

    monkeypatch.setattr(viewer_mod.Viewer, "_compile_posed_pipeline", boom)
    sess.cmd("f_globe trism")  # new pipeline key B
    pk = v._posed_pipeline_key(v._posed_source(0))
    for _ in range(v.POSED_WARM_MAX_FAILS):
        out = v._render_posed_frame(0)  # stale frame; kicks a warm
        np.testing.assert_array_equal(out, out1)
        deadline = time.monotonic() + 10
        while pk in v._posed_warming and time.monotonic() < deadline:
            time.sleep(0.01)
        v._posed_warm_retry_at[pk] = time.monotonic() - 1  # skip backoff
    assert v._posed_warm_fails[pk] == v.POSED_WARM_MAX_FAILS
    # past the cap: no more stale-serving — the inline path runs and the
    # error surfaces to the caller (the HTTP handler's 500)
    real_rp = sess.render_posed

    def rp_boom(*a, **kw):
        raise RuntimeError("pipeline build broken")

    monkeypatch.setattr(sess, "render_posed", rp_boom)
    with pytest.raises(RuntimeError, match="pipeline build broken"):
        v._render_posed_frame(0)
    # the failure is not permanent: once the build works again, the
    # inline compile lands, marks the key warm, and clears the counter
    monkeypatch.setattr(sess, "render_posed", real_rp)
    out_live = v._render_posed_frame(0)
    assert pk in v._posed_warm_keys
    assert pk not in v._posed_warm_fails
    ref = np.asarray(real_rp(
        v._posed_source(0), np.asarray([[0.0, 30.0, 0.0]])))[0]
    np.testing.assert_array_equal(out_live, ref)


def test_expired_warm_join_refuses_concurrent_inline_render(monkeypatch):
    """If the in-flight posed warm is STILL alive when the bounded join
    expires, the blocking path must error out (a 500), not dispatch an
    inline render concurrently with the warm thread's compile — the
    exact race the join exists to prevent (round-5 review)."""
    import threading

    import blinky_tpu.viewer as viewer_mod

    sess = Session(64, 48, platesize=32)
    frames = np.stack([synthetic_cubemap(32)])
    sess.cmd("f_lens eckert1; setviewangles 0 30 0")
    v = Viewer(sess, frames)
    out1 = v._render_posed_frame(0)  # warm key A inline

    real = viewer_mod.Viewer._compile_posed_pipeline
    started, gate = threading.Event(), threading.Event()

    def slow(self, *a, **kw):
        started.set()
        assert gate.wait(30)
        return real(self, *a, **kw)

    monkeypatch.setattr(viewer_mod.Viewer, "_compile_posed_pipeline", slow)
    sess.cmd("f_globe trism")  # new pipeline key B
    np.testing.assert_array_equal(v._render_posed_frame(0), out1)  # kicks
    assert started.wait(10)
    v.POSED_JOIN_TIMEOUT = 0.05  # simulate a hung relay compile
    rendered = []
    monkeypatch.setattr(
        type(sess), "render_posed",
        lambda *a, **kw: rendered.append(True))
    with pytest.raises(RuntimeError, match="still running"):
        v._render_posed_frame(0, block=True)
    assert rendered == []  # never dispatched concurrently
    gate.set()  # let the warm finish; a later request now succeeds
    t = v._posed_warming.get(v._posed_pipeline_key(v._posed_source(0)))
    if t is not None:
        t.join(10)
    monkeypatch.undo()
