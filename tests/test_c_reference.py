"""Ground-truth parity vs the ACTUAL reference C source.

Everything else in tests/ validates against our own float64 transcription
(``blinky_tpu/parity/oracle.py``).  These tests close the loop: the
Lua-free math of ``engine/NQ/fisheye.c`` + ``common/mathlib.c`` is
extracted verbatim from ``/root/reference`` and compiled into a gcc
harness (tests/c_reference/) whose Lua boundary is served by C
transliterations of the Lua lens/globe scripts (Lua numbers are C doubles
and Lua math.* is libm, so the transliterations are bit-identical to what
the Lua 5.2 VM would compute).

Pinned bit-exactly against the real C output:
  * inverse lensmaps (plate/px/py/valid/tint/plates_used and the zoom
    scale) across lenses, globes (incl. the ``fast`` resolver override and
    ``tetra``'s unnormalized tie-break vectors) and all four zoom modes —
    both the scalar float64 oracle and the production numpy-backend
    builder;
  * forward lensmaps (``draw_quad`` scan order, maxdiff guard) via the
    native C++ rasterizer and the pure-Python fallback;
  * the 6 tint palettes (``create_palmap``) and the PCX plate writer;
  * the raw coordinate converters at the C mixed-precision boundary.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from c_reference import build as cref  # noqa: E402

from blinky_tpu import geometry, globes, lenses
from blinky_tpu.lensmap import Zoom, calc_scale
from blinky_tpu.lensmap.builder import TINT_NONE, build_lensmap
from blinky_tpu.lensmap.forward_raster import build_forward
from blinky_tpu.parity.oracle import oracle_inverse_lensmap


@pytest.fixture(scope="session")
def harness(tmp_path_factory):
    return cref.build_harness(tmp_path_factory.mktemp("c_reference"))


@pytest.fixture(scope="session")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("c_reference_out")


def _norm_tint(tint):
    """Repo encodes no-tint as TINT_NONE (=6); the C initializes the tint
    plane to 255 (fisheye.c:732)."""
    t = np.asarray(tint)
    return np.where(t == TINT_NONE, 255, t).astype(np.uint8)


def _assert_lensmap_matches(c, lm):
    assert c["scale"] == pytest.approx(lm["scale"], abs=0.0)  # bit-exact
    np.testing.assert_array_equal(c["valid"], lm["valid"])
    np.testing.assert_array_equal(
        np.where(c["valid"], c["plate"], -1), np.where(lm["valid"], lm["plate"], -1)
    )
    np.testing.assert_array_equal(
        np.where(c["valid"], c["px"], 0), np.where(lm["valid"], lm["px"], 0)
    )
    np.testing.assert_array_equal(
        np.where(c["valid"], c["py"], 0), np.where(lm["valid"], lm["py"], 0)
    )
    np.testing.assert_array_equal(c["tint"], _norm_tint(lm["tint"]))
    np.testing.assert_array_equal(
        c["plates_used"][: len(lm["plates_used"])], lm["plates_used"]
    )


INVERSE_CONFIGS = [
    # (lens, globe, zoom_type, fov_deg, numcells, cell, pad)
    ("panini", "cube", "fov", 180, 10, 4.0, 1.0),
    ("rectilinear", "cube", "fov", 110, 10, 4.0, 1.0),
    ("stereographic", "cube", "fov", 300, 3, 2.0, 1.0),
    ("fisheye1", "tetra", "contain", 0, 10, 4.0, 1.0),
    ("equirect", "fast", "contain", 0, 10, 4.0, 1.0),
    ("mercator", "cube", "cover", 0, 10, 4.0, 1.0),
    ("hammer", "trism", "contain", 0, 10, 4.0, 1.0),
    ("stereographic", "cube", "vfov", 120, 10, 4.0, 1.0),
    # round-2 harness extension: every remaining inverse-capable lens,
    # incl. the iterative/elliptic ones where transliteration bugs hide
    ("fisheye2", "cube", "contain", 0, 10, 4.0, 1.0),
    ("cylinder", "cube", "cover", 0, 10, 4.0, 1.0),
    ("miller", "cube", "contain", 0, 10, 4.0, 1.0),
    ("gumby", "cube", "contain", 0, 10, 4.0, 1.0),
    ("fahey", "cube", "contain", 0, 10, 4.0, 1.0),
    ("gallstereo", "cube", "contain", 0, 10, 4.0, 1.0),
    ("cube", "cube", "contain", 0, 10, 4.0, 1.0),
    ("cubestereo", "cube", "fov", 180, 10, 4.0, 1.0),
    ("mollweide", "cube", "contain", 0, 10, 4.0, 1.0),
    ("eckert4", "cube", "contain", 0, 3, 2.0, 1.0),
    ("winkeltripel", "cube", "contain", 0, 10, 4.0, 1.0),
    ("winkeltripel", "tetra", "contain", 0, 10, 4.0, 1.0),
    ("vandergrinten", "cube", "contain", 0, 10, 4.0, 1.0),
    ("quincuncial", "cube", "contain", 0, 10, 4.0, 1.0),
    ("quincuncial", "fast", "contain", 0, 10, 4.0, 1.0),
    ("debug", "cube", "contain", 0, 10, 4.0, 1.0),
    ("debug", "tetra", "contain", 0, 10, 4.0, 1.0),
    ("debug", "trism", "contain", 0, 10, 4.0, 1.0),
]


@pytest.mark.parametrize(
    "lens_name,globe_name,ztype,fov,numcells,cell,pad",
    INVERSE_CONFIGS,
    ids=[f"{c[0]}-{c[1]}-{c[2]}{c[3]}" for c in INVERSE_CONFIGS],
)
def test_inverse_lensmap_bitexact_vs_c(
    harness, workdir, lens_name, globe_name, ztype, fov, numcells, cell, pad
):
    W, H = 64, 48
    c = cref.c_lensmap(
        harness, workdir / "lm.bin", lens_name, globe_name, W, H, ztype, fov,
        numcells, cell, pad,
    )
    assert c["ok"]
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom(ztype, fov), lens, W, H)
    assert scale == c["scale"], "zoom solver disagrees with calc_zoom()"
    S = c["platesize"]

    # the float64 scalar oracle
    o = oracle_inverse_lensmap(lens, g, scale, W, H, S,
                               numcells=numcells, cell_size=cell, pad_size=pad)
    _assert_lensmap_matches(c, dict(o, scale=scale))

    # the production builder (numpy backend)
    lm = build_lensmap(lens, g, scale, W, H, S, numcells=numcells,
                       cell_size=cell, pad_size=pad, backend="numpy")
    _assert_lensmap_matches(
        c,
        dict(scale=lm.scale, plate=lm.plate, px=lm.px, py=lm.py,
             valid=lm.valid, tint=lm.tint, plates_used=lm.plates_used),
    )


def test_inverse_lensmap_bitexact_vs_c_320x240(harness, workdir):
    """Realistic-size pin (VERDICT round 1: parity was only quantified at
    64x48): the numpy-backend builder vs the reference C at 320x240."""
    W, H = 320, 240
    for lens_name, globe_name, ztype, fov in [
        ("panini", "cube", "fov", 180),
        ("hammer", "tetra", "contain", 0),
    ]:
        c = cref.c_lensmap(
            harness, workdir / "lm_big.bin", lens_name, globe_name, W, H, ztype, fov
        )
        g = globes.get(globe_name)
        lens = lenses.get(lens_name, g)
        scale = calc_scale(Zoom(ztype, fov), lens, W, H)
        lm = build_lensmap(lens, g, scale, W, H, c["platesize"], backend="numpy")
        _assert_lensmap_matches(
            c,
            dict(scale=lm.scale, plate=lm.plate, px=lm.px, py=lm.py,
                 valid=lm.valid, tint=lm.tint, plates_used=lm.plates_used),
        )


def test_inverse_lensmap_bitexact_vs_c_1080p(harness, workdir):
    """Production-size pin: the exact host builder (the Session default
    for static views) vs the reference C at the full 1920x1080 headline
    size — the whole 2.07 Mpix table, including the elliptic-function
    lens (quincuncial's static-AGM ``ellipj``)."""
    W, H = 1920, 1080
    configs = [("panini", "fov", 180),
               ("quincuncial", "contain", 0),
               # the other lenses whose inverse runs a solver LOOP
               # (winkeltripel 2-D Newton with early break, eckert4
               # memoized-row Newton): loop ulp drift only flips texel
               # boundaries at production sizes (the quincuncial
               # association bug, CLAUDE.md r2)
               ("winkeltripel", "contain", 0),
               ("eckert4", "contain", 0)]
    if os.environ.get("BLINKY_C_PIN_ALL"):
        # closed-form but branch/TOL-guarded inverses — deep tier only
        # (each adds a 2.07-Mpix exact host build + C run, ~8 s)
        configs += [("vandergrinten", "contain", 0),
                    ("mollweide", "contain", 0)]
    for lens_name, ztype, fov in configs:
        c = cref.c_lensmap(
            harness, workdir / "lm_1080.bin", lens_name, "cube", W, H,
            ztype, fov,
        )
        g = globes.get("cube")
        lens = lenses.get(lens_name, g)
        scale = calc_scale(Zoom(ztype, fov), lens, W, H)
        lm = build_lensmap(lens, g, scale, W, H, c["platesize"],
                           backend="numpy")
        _assert_lensmap_matches(
            c,
            dict(scale=lm.scale, plate=lm.plate, px=lm.px, py=lm.py,
                 valid=lm.valid, tint=lm.tint, plates_used=lm.plates_used),
        )


FORWARD_CONFIGS = [
    # all 10 forward-only lenses, incl. the resolver-override and
    # tie-break globes (draw_quad scan order, fisheye.c:2126-2338)
    ("sinusoidal", "cube", "contain", 0),
    ("winkel1", "tetra", "contain", 0),
    ("sinusoidal", "fast", "contain", 0),
    ("eckert1", "cube", "contain", 0),
    ("eckert5", "cube", "contain", 0),
    ("winkel2", "cube", "contain", 0),
    ("kavrayskiy7", "trism", "contain", 0),
    ("wagner6", "cube", "contain", 0),
    ("larrivee", "cube", "contain", 0),
    ("gins8", "cube", "contain", 0),
    ("polyconic", "cube", "fov", 360),
]


@pytest.mark.parametrize(
    "lens_name,globe_name,ztype,fov",
    FORWARD_CONFIGS,
    ids=[f"{c[0]}-{c[1]}" for c in FORWARD_CONFIGS],
)
@pytest.mark.parametrize("use_native", [True, False], ids=["native", "python"])
def test_forward_lensmap_bitexact_vs_c(
    harness, workdir, lens_name, globe_name, ztype, fov, use_native
):
    W, H = 64, 48
    c = cref.c_lensmap(
        harness, workdir / "lm_fwd.bin", lens_name, globe_name, W, H, ztype, fov
    )
    assert c["ok"]
    g = globes.get(globe_name)
    lens = lenses.get(lens_name, g)
    scale = calc_scale(Zoom(ztype, fov), lens, W, H)
    assert scale == c["scale"]
    lm = build_forward(lens, g, scale, W, H, c["platesize"], use_native=use_native)
    _assert_lensmap_matches(
        c,
        dict(scale=lm.scale, plate=lm.plate, px=lm.px, py=lm.py,
             valid=lm.valid, tint=lm.tint, plates_used=lm.plates_used),
    )


def test_forward_lensmap_bitexact_vs_c_production_sizes(harness, workdir):
    """Production-size pins for the forward (draw_quad rasterizer) path:
    640x480 and the full 1920x1080 — scan order, the maxdiff wrap guard
    and last-writer-wins quads all replayed at scale.

    Default tier: sinusoidal 640x480 + eckert1 1080p.  Under
    ``BLINKY_C_PIN_ALL`` every one of the 10 forward-only lenses gets a
    1080p pin (VERDICT r3 task 6 — round 3 proved production-size pins
    catch defects every small grid misses; ~8 s each, deep tier only).
    """
    configs = [(640, 480, "sinusoidal", "contain", 0),
               (1920, 1080, "eckert1", "contain", 0)]
    if os.environ.get("BLINKY_C_PIN_ALL"):
        configs += [
            (1920, 1080, name, "contain", 0)
            for name in ("sinusoidal", "eckert5", "winkel1", "winkel2",
                         "kavrayskiy7", "wagner6", "larrivee", "gins8")
        ] + [(1920, 1080, "polyconic", "fov", 360)]
    for W, H, lens_name, ztype, fov in configs:
        c = cref.c_lensmap(
            harness, workdir / "lm_fwd_big.bin", lens_name, "cube", W, H,
            ztype, fov,
        )
        g = globes.get("cube")
        lens = lenses.get(lens_name, g)
        scale = calc_scale(Zoom(ztype, fov), lens, W, H)
        lm = build_forward(lens, g, scale, W, H, c["platesize"],
                           use_native=True)
        _assert_lensmap_matches(
            c,
            dict(scale=lm.scale, plate=lm.plate, px=lm.px, py=lm.py,
                 valid=lm.valid, tint=lm.tint, plates_used=lm.plates_used),
        )


def test_palmap_bitexact_vs_c(harness, workdir):
    from blinky_tpu.palette import create_palmap, default_palette

    pal = default_palette()
    c = cref.c_palmap(harness, workdir / "palmap.bin", pal, workdir)
    np.testing.assert_array_equal(create_palmap(pal), c)

    rng = np.random.default_rng(7)
    pal2 = rng.integers(0, 256, (256, 3), dtype=np.uint8)  # exercises NN ties
    c2 = cref.c_palmap(harness, workdir / "palmap2.bin", pal2, workdir)
    np.testing.assert_array_equal(create_palmap(pal2), c2)


@pytest.mark.parametrize("globe_name,plate,with_margins", [
    ("cube", 0, 0), ("cube", 1, 1), ("tetra", 2, 0), ("fast", 1, 0),
])
def test_pcx_plate_bytes_vs_c(harness, workdir, globe_name, plate, with_margins):
    """WritePCXplate (fisheye.c:1396-1465) byte-for-byte, including the
    degenerate RLE and the 0xFE other-plate mask."""
    from blinky_tpu.io.cubemap import MASK_COLOR, plate_ownership_mask
    from blinky_tpu.io.pcx import encode_pcx
    from blinky_tpu.palette import default_palette

    S = 32
    pal = default_palette()
    c_bytes = cref.c_pcx(
        harness, workdir / "plate.pcx", globe_name, S, plate, with_margins,
        pal, workdir,
    )
    g = globes.get(globe_name)
    frames = cref.synthetic_plates(S, g.numplates)
    img = frames[plate]
    if not with_margins:
        img = np.where(plate_ownership_mask(g, plate, S), img, MASK_COLOR)
    py_bytes = encode_pcx(img.astype(np.uint8), pal, mode="reference")
    assert py_bytes == c_bytes


@pytest.mark.parametrize("globe_name", ["cube", "trism", "tetra", "fast"])
def test_geometry_probes_vs_c(harness, workdir, globe_name):
    """plate_uv_to_ray / ray_to_plate_index / ray_to_plate_uv /
    latlon_to_ray / ray_to_latlon at the exact C mixed precision."""
    g = globes.get(globe_name)
    p = cref.c_probes(harness, workdir / "probes.bin", globe_name, g.numplates)

    N = 17
    ts = np.arange(N, dtype=np.float64) / (N - 1)
    U, V = np.meshgrid(ts, ts, indexing="xy")
    for plate in range(g.numplates):
        rx, ry, rz = geometry.plate_uv_to_ray_c(
            U, V, g.forward[plate], g.right[plate], g.up[plate],
            g.dist[plate], np, np.float32, np.float64,
        )
        np.testing.assert_array_equal(rx.astype(np.float64), p["uv"][plate, ..., 0])
        np.testing.assert_array_equal(ry.astype(np.float64), p["uv"][plate, ..., 1])
        np.testing.assert_array_equal(rz.astype(np.float64), p["uv"][plate, ..., 2])

        if g.plate_resolver is not None:
            idx = np.asarray(g.plate_resolver(
                rx.astype(np.float64), ry.astype(np.float64),
                rz.astype(np.float64), g,
            ))
        else:
            idx = geometry.ray_to_plate_index_c(rx, ry, rz, g.forward, np)
        np.testing.assert_array_equal(
            idx.astype(np.float64), p["uv"][plate, ..., 3]
        )

        u2, v2, ok = geometry.ray_to_plate_uv_c(
            rx, ry, rz, g.forward[plate], g.right[plate], g.up[plate],
            g.fov_rad[plate], np.float64,
        )
        np.testing.assert_array_equal(np.asarray(u2), p["uv"][plate, ..., 4])
        np.testing.assert_array_equal(np.asarray(v2), p["uv"][plate, ..., 5])
        np.testing.assert_array_equal(
            np.asarray(ok).astype(np.float64), p["uv"][plate, ..., 6]
        )

    M = 13
    lat = -np.pi / 2 + np.pi * np.arange(M, dtype=np.float64)[:, None] / (M - 1)
    lon = -np.pi + 2 * np.pi * np.arange(M, dtype=np.float64)[None, :] / (M - 1)
    lat = np.broadcast_to(lat, (M, M))
    lon = np.broadcast_to(lon, (M, M))
    np.testing.assert_array_equal(lat, p["latlon"][..., 0])
    np.testing.assert_array_equal(lon, p["latlon"][..., 1])
    x, y, z = geometry.latlon_to_ray_f32(lat, lon)
    np.testing.assert_array_equal(x, p["latlon"][..., 2])
    np.testing.assert_array_equal(y, p["latlon"][..., 3])
    np.testing.assert_array_equal(z, p["latlon"][..., 4])
    lat2, lon2 = geometry.ray_to_latlon(x, y, z)
    np.testing.assert_array_equal(np.asarray(lat2), p["latlon"][..., 5])
    np.testing.assert_array_equal(np.asarray(lon2), p["latlon"][..., 6])


def test_console_tokenizer_bitexact_vs_c(harness):
    """Round 3: the console splitter+tokenizer (split_console_lines /
    tokenize_console / com_parse) vs the COMPILED reference tokenizer —
    the extracted COM_Parse driven through transliterations of
    Cbuf_Execute's quote-aware line split and Cmd_TokenizeString's loop
    (harness mode `tokenize`).  Covers quotes, unterminated quotes, the
    NQ single-char split set, //- and /**/-comments, control chars,
    high (signed-char) bytes, ;-splitting and newline breaks."""
    import subprocess

    from blinky_tpu.api import split_console_lines, tokenize_console

    cases = [
        'f_lens panini; f_fov 180',
        'alias zoomin "f_fov 90; f_rubix"',
        "f_lens 'panini'",
        'bind 3 "f_lens fisheye1',          # unterminated quote
        'f_fov(90) {x} y:z',                # single-char splits
        'f_lens hammer // trailing comment',
        'f_fov /* mid */ 120',
        'a;;b\nc d;e',
        '  "a;b" ; c "d\ne" f',             # newline INSIDE a quote breaks
        '"" empty "" tokens',
        "mixed'quote\"and\"tick'end",
        'tab\tand\x01ctl args',
        'high\xe9byte and caf\xe9',         # signed-char whitespace
        '"/not/a//comment" /also/not',
        ';;;',
        '"unbalanced ;\nnext',
        "')('",
        'word/with/slash /single',
        'f_fov\x0090',                      # NUL = hard end of command
        'a "qu\x00oted" b',                 # NUL inside a quote ends token
        '\x00leading',
        'x;\x00;y',
        'f_fov ' + '9' * 1100,              # Cbuf 1024-byte line cap
        'a' * 1023 + ';' + 'b' * 5,         # ';' exactly at the cap byte
        'a' * 1500,                         # unbroken run over the cap
        '"' + 'q' * 1040 + '" tail',        # quote spanning the cap
        ('w ' * 300).rstrip(),              # many tokens near the cap
    ]
    rng = np.random.default_rng(11)
    alphabet = list('abc ";\n\'(){}/:*\t\x01\xe9 09.')
    for _ in range(200):  # fuzz: random soup in the tokenizer alphabet
        k = int(rng.integers(1, 60))
        cases.append("".join(rng.choice(alphabet) for _ in range(k)))
    nul_alphabet = alphabet + ["\x00"]
    for _ in range(100):  # fuzz: embedded NULs
        k = int(rng.integers(1, 60))
        cases.append("".join(rng.choice(nul_alphabet) for _ in range(k)))
    for _ in range(30):  # fuzz: lines straddling the 1024-byte Cbuf cap
        k = int(rng.integers(1000, 1300))
        cases.append("".join(rng.choice(alphabet) for _ in range(k)))

    for text in cases:
        out = subprocess.run([str(harness), "tokenize"],
                             input=text.encode("latin-1"),
                             capture_output=True, check=True)
        c_lines = []
        for chunk in out.stdout.decode("latin-1").split("\x1e")[:-1]:
            toks = chunk.split("\x1f")[:-1] if chunk else []
            c_lines.append(toks)
        py_lines = [tokenize_console(p) for p in split_console_lines(text)]
        # split_console_lines is now an exact Cbuf_Execute transliteration
        # (incl. the 1024-byte line cap), so the line records match 1:1
        assert py_lines == c_lines, text


def test_console_numeric_parsers_bitexact_vs_c(harness):
    """Round 3: the console numeric parsers (``_atoi``/``_atof``) vs the
    COMPILED ``Q_atoi``/``Q_atof`` (``common/common.c:200-315``, harness
    mode ``num``).  Pins the quirks the console relies on: hex / 'c char
    constants (signed char), "2abc"→2, no exponent syntax ("9e99"→9, so
    nan/inf can't be smuggled in), Q_atof's double-compute-float-return
    truncation (incl. -0.0 sign), and Q_atoi's 32-bit int wraparound on
    overlong digit strings."""
    import subprocess

    from blinky_tpu.api import _atof, _atoi

    cases = [
        "180", "-3.5", "0x1F", "-0xff", "'A", "'\xe9", "2abc", "abc",
        "9e99", "nan", "inf", "1.2.3", "", ".", "-", "-.", "0X10",
        "123456789", "3.14159265358979", "-0.0001", "'", "1e5", "  5",
        "0x", "9999999999", "-9999999999", "0.1", "16777217", "'z",
        "0xFFFFFFFFFF", "00000000012", "4294967296", "2147483648",
        "2147483647", "-0", "-0.0", "170.00001", "1..5", "'-",
    ]
    rng = np.random.default_rng(7)
    alphabet = list("0123456789.-x'aef\xe9 X")
    for _ in range(500):  # fuzz: random soup in the numeric alphabet
        k = int(rng.integers(1, 20))
        cases.append("".join(rng.choice(alphabet) for _ in range(k)))

    inp = "\n".join(cases) + "\n"
    out = subprocess.run([str(harness), "num"],
                         input=inp.encode("latin-1"),
                         capture_output=True, check=True)
    lines = out.stdout.decode().splitlines()
    assert len(lines) == len(cases)
    for case, line in zip(cases, lines):
        ci, cf = line.split(" ", 1)
        ci, cf = int(ci), float(cf)
        assert _atoi(case) == ci, case
        pf = _atof(case)
        assert pf == cf and np.signbit(pf) == np.signbit(cf), case
