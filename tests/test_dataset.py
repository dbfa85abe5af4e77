"""Demo container, prefetch iterator, timedemo, camera basis tests."""

import numpy as np
import pytest

from blinky_tpu.api import Session
from blinky_tpu.camera import angle_vectors, plate_world_basis
from blinky_tpu.io.cubemap import synthetic_cubemap
from blinky_tpu.io.dataset import FrameBatchIterator, read_demo, timedemo, write_demo
from blinky_tpu.palette import default_palette


def _demo_frames(n=10, S=48):
    base = synthetic_cubemap(S)
    return np.stack([np.roll(base, i, axis=2) for i in range(n)])


def test_demo_roundtrip(tmp_path):
    frames = _demo_frames(4)
    poses = np.zeros((4, 3), np.float32)
    p = tmp_path / "demo.npz"
    write_demo(p, frames, default_palette(), poses)
    d = read_demo(p)
    assert np.array_equal(d["frames"], frames)
    assert d["poses"].shape == (4, 3)


def test_batch_iterator_pads_last():
    frames = _demo_frames(10)
    batches = list(FrameBatchIterator(frames, batch=4))
    assert len(batches) == 3
    assert [n for _, n in batches] == [4, 4, 2]
    b0, _ = batches[0]
    assert b0.shape == (6, 48, 48, 4)
    assert np.array_equal(b0[..., 2], frames[2])
    b2, _ = batches[2]
    assert (b2[..., 2:] == 0).all()  # zero padding


def test_timedemo(capsys):
    sess = Session(64, 48, backend="numpy")
    frames = _demo_frames(12)
    out, clock = timedemo(sess, frames, batch=4)
    assert clock.frames == 12
    assert any("frames" in line and "fps" in line for line in sess.console)


def test_angle_vectors_identity():
    f, r, u = angle_vectors(0.0, 0.0, 0.0)
    np.testing.assert_allclose(f, [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(r, [0, -1, 0], atol=1e-12)
    np.testing.assert_allclose(u, [0, 0, 1], atol=1e-12)


def test_angle_vectors_yaw90():
    f, r, u = angle_vectors(0.0, 90.0, 0.0)
    np.testing.assert_allclose(f, [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(r, [1, 0, 0], atol=1e-12)


def test_plate_world_basis_identity_camera(cube_globe):
    # with camera = (right=X, up=Y, forward=Z), plate world basis equals the
    # plate's own camera-frame vectors
    f, r, u = plate_world_basis(
        cube_globe,
        forward=np.array([0.0, 0, 1]),
        right=np.array([1.0, 0, 0]),
        up=np.array([0.0, 1, 0]),
    )
    np.testing.assert_allclose(f, cube_globe.forward, atol=1e-12)
    np.testing.assert_allclose(r, cube_globe.right, atol=1e-12)
    np.testing.assert_allclose(u, cube_globe.up, atol=1e-12)


def test_iterator_propagates_worker_errors():
    """A packing failure in the prefetch thread must raise in the
    consumer, not silently truncate the stream."""
    import pytest

    from blinky_tpu.io.dataset import FrameBatchIterator

    bad = np.zeros((5, 6, 8, 9), np.uint8)  # non-square plates -> pack fails
    with pytest.raises(BaseException):
        list(FrameBatchIterator(bad, batch=2))


def test_iterator_abandonment_does_not_hang():
    from blinky_tpu.io.dataset import FrameBatchIterator

    frames = np.zeros((64, 6, 8, 8), np.uint8)
    it = iter(FrameBatchIterator(frames, batch=4, prefetch=1))
    next(it)
    del it  # worker must not block the process on the bounded queue


def test_demo_import_saveglobe_roundtrip(tmp_path):
    """f_saveglobe dumps -> demo-import -> container == original frames
    (the bridge from the reference engine's own output, fisheye.c:1467-1486)."""
    from blinky_tpu import globes
    from blinky_tpu.api import Session
    from blinky_tpu.io.cubemap import save_globe_pcx, synthetic_cubemap
    from blinky_tpu.io.dataset import import_saveglobe_dir, read_demo
    from blinky_tpu.palette import default_palette

    g = globes.get("cube")
    pal = default_palette()
    S, N = 32, 4
    seq = np.stack([np.roll(synthetic_cubemap(S), i, axis=2) for i in range(N)])
    for i in range(N):
        save_globe_pcx(tmp_path / f"frame{i:04d}_", seq[i], g, pal,
                       with_margins=True)
    frames, palette, stems = import_saveglobe_dir(tmp_path)
    assert frames.shape == (N, 6, S, S)
    np.testing.assert_array_equal(frames, seq)
    np.testing.assert_array_equal(palette, pal)
    assert stems == [f"frame{i:04d}_" for i in range(N)]

    # masked (non-full) dumps import as-is, 0xFE margins included
    for i in range(N):
        save_globe_pcx(tmp_path / f"m{i:04d}_", seq[i], g, pal)
    masked, _, _ = import_saveglobe_dir(tmp_path, numplates=6)
    # groups are stem-sorted: frame* then m*; the m* half carries 0xFE
    assert (masked[N:] == 0xFE).any()

    # full CLI round trip incl. pose track
    from blinky_tpu.cli import main as cli_main

    poses = tmp_path / "poses.txt"
    poses.write_text("0 0 0\n1, 2, 3\n// comment\n4 5 6\n-7 80 0\n")
    out = tmp_path / "imported.npz"
    # keep only the unmasked frames for the CLI run
    clean = tmp_path / "clean"
    clean.mkdir()
    for p in tmp_path.glob("frame*.pcx"):
        (clean / p.name).write_bytes(p.read_bytes())
    rc = cli_main(["demo-import", str(clean), "--out", str(out),
                   "--poses", str(poses)])
    assert rc in (0, None)
    demo = read_demo(out)
    np.testing.assert_array_equal(demo["frames"], seq)
    assert demo["poses"].shape == (4, 3)
    np.testing.assert_allclose(demo["poses"][3], [-7, 80, 0])

    # and the imported demo reprojects end-to-end
    sess = Session(48, 36, platesize=S, palette=demo["palette"])
    screen = np.asarray(sess.render(np.moveaxis(demo["frames"][0][..., None], 0, 0)[..., 0]))
    assert screen.shape == (36, 48)


def test_parse_pose_track_errors():
    from blinky_tpu.io.dataset import parse_pose_track

    with pytest.raises(ValueError, match="3 values"):
        parse_pose_track("1 2\n")
    track = parse_pose_track("")
    assert track.shape[0] == 0


def test_demo_import_empty_pose_file(tmp_path):
    """An all-comment pose file must import as 'no track' (reproject
    --follow-poses would otherwise crash on poses[-1])."""
    from blinky_tpu import globes
    from blinky_tpu.cli import main as cli_main
    from blinky_tpu.io.cubemap import save_globe_pcx, synthetic_cubemap
    from blinky_tpu.palette import default_palette

    g = globes.get("cube")
    save_globe_pcx(tmp_path / "f0_", synthetic_cubemap(16), g,
                   default_palette(), with_margins=True)
    poses = tmp_path / "poses.txt"
    poses.write_text("// nothing here\n\n")
    out = tmp_path / "d.npz"
    cli_main(["demo-import", str(tmp_path), "--out", str(out),
              "--poses", str(poses)])
    demo = read_demo(out)
    assert demo["poses"] is None
