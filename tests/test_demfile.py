"""The engine's own .dem recording format (engine/NQ/cl_demo.c).

Pins the reader/writer to ``CL_Record_f``/``CL_WriteDemoMessage``/
``CL_PlayDemo_f``/``CL_GetMessage`` semantics — header parse quirks
included — and the playback angle lerp (cl_main.c:567-576)."""

import struct

import numpy as np
import pytest

from blinky_tpu.io.demfile import (
    MAX_MSGLEN,
    lerp_pose_track,
    read_dem,
    write_dem,
)


def _poses(n):
    rng = np.random.default_rng(7)
    return (rng.uniform(-180, 360, size=(n, 3))).astype(np.float32)


def test_roundtrip(tmp_path):
    poses = _poses(12)
    msgs = [bytes([i]) * (i * 3 + 1) for i in range(12)]
    p = tmp_path / "t.dem"
    write_dem(p, poses, messages=msgs, cdtrack=4)
    dem = read_dem(p, keep_messages=True)
    assert dem.cdtrack == 4
    np.testing.assert_array_equal(dem.poses, poses)
    np.testing.assert_array_equal(dem.message_sizes,
                                  [len(m) for m in msgs])
    assert dem.messages == msgs
    assert len(dem) == 12


def test_default_message_is_svc_nop(tmp_path):
    """Default block bodies are one svc_nop byte (protocol.h:191) so the
    engine's reader — for which a zero-byte fread means end-of-demo
    (cl_demo.c:136-141) — accepts every block."""
    p = tmp_path / "n.dem"
    write_dem(p, _poses(3))
    dem = read_dem(p, keep_messages=True)
    assert all(m == b"\x01" for m in dem.messages)
    assert dem.cdtrack == -1  # CL_Record_f default, cl_demo.c:234


def test_header_parse_matches_engine():
    """Characters are masked &127 and the newline must appear within the
    first 12 bytes (CL_PlayDemo_f, cl_demo.c:315-333)."""
    body = struct.pack("<i3f", 1, 0.0, 0.0, 0.0) + b"\x01"
    # high bit set on the digits: the engine masks it off
    hi = bytes((c | 128) for c in b"-1") + b"\n"
    assert read_dem(hi + body).cdtrack == -1
    # newline at index 11 is accepted (loop runs i = 0..11)...
    assert read_dem(b" " * 10 + b"2\n" + body).cdtrack == 2
    # ...but none within 12 chars is invalid
    with pytest.raises(ValueError, match="invalid"):
        read_dem(b" " * 12 + b"2\n" + body)
    # non-numeric track: the sscanf check (cl_demo.c:329-333)
    with pytest.raises(ValueError, match="cd track"):
        read_dem(b"zap\n" + body)
    # sscanf("%d") is a PREFIX parse: trailing junk after the digits is
    # ignored, exactly like the engine
    assert read_dem(b"2xyz\n" + body).cdtrack == 2
    assert read_dem(b" \t-7 foo\n" + body).cdtrack == -7
    # a raw 0x8A byte is NOT a newline to the engine (the break tests the
    # unmasked char); it masks to whitespace inside the header instead
    assert read_dem(b"\x8a3\n" + body).cdtrack == 3


def test_oversize_and_truncated_blocks():
    good = struct.pack("<i3f", 1, 1.0, 2.0, 3.0) + b"\x01"
    with pytest.raises(ValueError, match="MAX_MSGLEN"):
        read_dem(b"-1\n" + struct.pack("<i3f", MAX_MSGLEN + 1, 0, 0, 0))
    # a truncated final block ends playback without error
    trunc = struct.pack("<i3f", 100, 9.0, 9.0, 9.0) + b"xy"
    dem = read_dem(b"-1\n" + good + trunc)
    assert len(dem) == 1
    np.testing.assert_array_equal(dem.poses[0], [1, 2, 3])


def test_lerp_pose_track_shortest_arc():
    """The demo-playback angle lerp wraps deltas into [-180, 180)
    (cl_main.c:567-576): yaw 350 -> 10 goes through 360, not backward."""
    track = np.array([[0, 350, 0], [0, 10, 0]], np.float32)
    out = lerp_pose_track(track, 3)
    np.testing.assert_allclose(out[1], [0, 360, 0], atol=1e-4)
    # endpoints preserved (mod 360: the lerp does not re-wrap, like the
    # engine's cl.viewangles)
    np.testing.assert_allclose(out[0], track[0])
    np.testing.assert_allclose(out[2] % 360, track[1] % 360, atol=1e-4)
    # d = +180 wraps to -180 (the engine's >= 180 branch)
    track = np.array([[0, 0, 0], [0, 180, 0]], np.float32)
    out = lerp_pose_track(track, 3)
    np.testing.assert_allclose(out[1], [0, -90, 0], atol=1e-4)

    single = lerp_pose_track(np.array([[1, 2, 3]], np.float32), 4)
    assert single.shape == (4, 3)
    np.testing.assert_allclose(single, [[1, 2, 3]] * 4)
    with pytest.raises(ValueError, match="empty"):
        lerp_pose_track(np.zeros((0, 3), np.float32), 4)


def test_demo_import_from_dem(tmp_path):
    """CLI demo-import --dem: the engine's own recording drives the
    container's pose track, resampled to frame count with the lerp."""
    from blinky_tpu import globes
    from blinky_tpu.cli import main as cli_main
    from blinky_tpu.io.cubemap import save_globe_pcx, synthetic_cubemap
    from blinky_tpu.io.dataset import read_demo
    from blinky_tpu.palette import default_palette

    g = globes.get("cube")
    pal = default_palette()
    S, N = 16, 5
    for i in range(N):
        save_globe_pcx(tmp_path / f"f{i:03d}_",
                       np.roll(synthetic_cubemap(S), i, axis=2), g, pal,
                       with_margins=True)
    dem = tmp_path / "track.dem"
    write_dem(dem, np.array([[0, 0, 0], [10, 90, 0], [0, 180, 0]],
                            np.float32))
    out = tmp_path / "d.npz"
    rc = cli_main(["demo-import", str(tmp_path), "--dem", str(dem),
                   "--out", str(out)])
    assert rc in (0, None)
    demo = read_demo(out)
    assert demo["poses"].shape == (N, 3)
    np.testing.assert_allclose(demo["poses"][0], [0, 0, 0])
    np.testing.assert_allclose(demo["poses"][-1], [0, 180, 0])
    np.testing.assert_allclose(demo["poses"][2], [10, 90, 0])  # midpoint

    # --poses and --dem together is an error
    rc = cli_main(["demo-import", str(tmp_path), "--dem", str(dem),
                   "--poses", str(dem), "--out", str(out)])
    assert rc == 2
