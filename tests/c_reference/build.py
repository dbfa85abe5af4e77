"""Build and run the reference-C ground-truth harness.

``build_harness`` extracts the Lua-free reference functions (extract.py),
compiles them with the harness glue (harness.c) and returns the binary
path.  The readers unpack the harness dump formats into NumPy arrays.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent

# x86-64 baseline (SSE2 scalar float/double, no FMA contraction) matches
# the reference engine's own build; -O2 like the engine Makefile.
GCC_CMD = ["gcc", "-O2", "-std=gnu11", "-o", "harness", "harness.c", "-lm"]


def build_harness(build_dir: Path) -> Path:
    build_dir = Path(build_dir)
    build_dir.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        [sys.executable, str(HERE / "extract.py"), str(build_dir / "ref_extracted.c")],
        check=True, capture_output=True,
    )
    shutil.copy(HERE / "harness.c", build_dir / "harness.c")
    subprocess.run(GCC_CMD, cwd=build_dir, check=True, capture_output=True)
    return build_dir / "harness"


def run(exe: Path, *args) -> None:
    subprocess.run([str(exe), *map(str, args)], check=True, capture_output=True)


def c_lensmap(exe: Path, out: Path, lens: str, globe: str, w: int, h: int,
              zoom: str, fovdeg: int = 0, numcells: int = 10,
              cell_size: float = 4.0, pad_size: float = 1.0) -> dict:
    """Run the harness lensmap mode and unpack the dump."""
    run(exe, "lensmap", lens, globe, w, h, zoom, fovdeg,
        numcells, cell_size, pad_size, out)
    d = out.read_bytes()
    magic, w_, h_, S, numplates, ok = struct.unpack_from("<4s5i", d, 0)
    assert magic == b"LMAP" and (w_, h_) == (w, h)
    (scale,) = struct.unpack_from("<d", d, 24)
    arr = np.frombuffer(d, np.int32, w * h * 3, 32).reshape(h, w, 3)
    tint = np.frombuffer(d, np.uint8, w * h, 32 + w * h * 12).reshape(h, w)
    display = np.frombuffer(d, np.int32, 6, 32 + w * h * 13)
    plate = arr[..., 0]
    valid = plate >= 0
    return dict(
        platesize=S, numplates=numplates, ok=bool(ok), scale=scale,
        plate=plate, px=arr[..., 1], py=arr[..., 2], valid=valid,
        tint=tint, plates_used=display.astype(bool),
    )


def c_palmap(exe: Path, out: Path, palette: np.ndarray, workdir: Path) -> np.ndarray:
    pal_file = workdir / "pal.bin"
    pal_file.write_bytes(np.asarray(palette, np.uint8).tobytes())
    run(exe, "palmap", pal_file, out)
    return np.frombuffer(out.read_bytes(), np.uint8).reshape(6, 256)


def c_pcx(exe: Path, out: Path, globe: str, platesize: int, plate_index: int,
          with_margins: int, palette: np.ndarray, workdir: Path) -> bytes:
    pal_file = workdir / "pal.bin"
    pal_file.write_bytes(np.asarray(palette, np.uint8).tobytes())
    run(exe, "pcx", globe, platesize, plate_index, with_margins, pal_file, out)
    return out.read_bytes()


def c_probes(exe: Path, out: Path, globe: str, numplates: int) -> dict:
    run(exe, "probes", globe, out)
    vals = np.frombuffer(out.read_bytes(), np.float64)
    n_uv = numplates * 17 * 17
    uv = vals[: n_uv * 7].reshape(numplates, 17, 17, 7)
    latlon = vals[n_uv * 7:].reshape(13, 13, 7)
    return dict(uv=uv, latlon=latlon)


def synthetic_plates(platesize: int, numplates: int) -> np.ndarray:
    """The deterministic pattern fill_synthetic_plates() uses in harness.c."""
    S = platesize
    py, px = np.mgrid[0:S, 0:S]
    out = np.zeros((6, S, S), dtype=np.uint8)
    for p in range(numplates):
        out[p] = ((p * 37 + px * 3 + py * 5) & 0xFF).astype(np.uint8)
    return out
