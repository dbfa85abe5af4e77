"""Extract the Lua-free C math from the reference source at build time.

The parity story of this repo ultimately hangs on ``engine/NQ/fisheye.c``
and ``engine/common/mathlib.c``.  Instead of trusting our hand transcription
(``blinky_tpu/parity/oracle.py``), this module pulls the actual reference
functions out of ``/root/reference`` (read-only checkout) into a generated
translation unit that ``harness.c`` compiles and drives with C
transliterations of the Lua lens scripts standing in for the Lua VM.

Nothing extracted here is committed to the repository: the output lives in
a scratch build directory and exists only to generate test goldens from the
genuine reference implementation.

Functions extracted (all anchors are verified, the build fails loudly if
the reference source shifts):

- ``mathlib.c``: ``VectorMA`` (:349), ``CrossProduct`` (:388),
  ``VectorNormalize`` (:412).
- ``fisheye.c``: palette (``find_closest_pal_index`` :835,
  ``create_palmap`` :857), converters (``latlon_to_ray`` :1184,
  ``ray_to_latlon`` :1192, ``plate_uv_to_ray`` :1198), zoom
  (``calc_zoom`` :1293), PCX (``WritePCXplate`` :1396), lensmap setters
  (``set_lensmap_grid`` :1922 .. ``set_lensmap_from_ray`` :1995), plate
  resolution (``ray_to_plate_index`` :2023, ``ray_to_plate_uv`` :2052),
  builders (``resume_lensmap*`` :2074-2217, ``uv_to_screen`` :2227,
  ``draw_quad`` :2246, ``create_lensmap*`` :2346-2397) and the builder
  clock (:818-826).
"""

from __future__ import annotations

import re
from pathlib import Path

REFERENCE = Path("/root/reference")
FISHEYE_C = REFERENCE / "engine/NQ/fisheye.c"
MATHLIB_C = REFERENCE / "engine/common/mathlib.c"

MATHLIB_FUNCS = ["VectorMA", "CrossProduct", "VectorNormalize"]

FISHEYE_FUNCS = [
    "start_lens_builder_clock",
    "is_lens_builder_time_up",
    "find_closest_pal_index",
    "create_palmap",
    "latlon_to_ray",
    "ray_to_latlon",
    "plate_uv_to_ray",
    "calc_zoom",
    "WritePCXplate",
    "set_lensmap_grid",
    "set_lensmap_from_plate",
    "set_lensmap_from_plate_uv",
    "set_lensmap_from_ray",
    "ray_to_plate_index",
    "ray_to_plate_uv",
    "resume_lensmap",
    "resume_lensmap_inverse",
    "resume_lensmap_forward",
    "uv_to_screen",
    "draw_quad",
    "create_lensmap_inverse",
    "create_lensmap_forward",
    "create_lensmap",
]

# Forward declarations so extraction order never matters.  The LUAtoC_*
# stubs and the engine services are provided by harness.c.
PROTOTYPES = """\
void VectorMA(const vec3_t veca, const float scale, const vec3_t vecb, vec3_t vecc);
void CrossProduct(const vec3_t v1, const vec3_t v2, vec3_t cross);
float VectorNormalize(vec3_t v);
static void start_lens_builder_clock(void);
static qboolean is_lens_builder_time_up(void);
static int find_closest_pal_index(int r, int g, int b);
static void create_palmap(void);
static void latlon_to_ray(double lat, double lon, vec3_t ray);
static void ray_to_latlon(vec3_t ray, double *lat, double *lon);
static void plate_uv_to_ray(int plate_index, double u, double v, vec3_t ray);
static qboolean calc_zoom(void);
static void WritePCXplate(char *filename, int plate_index, int with_margins);
static void set_lensmap_grid(int lx, int ly, int px, int py, int plate_index);
static void set_lensmap_from_plate(int lx, int ly, int px, int py, int plate_index);
static void set_lensmap_from_plate_uv(int lx, int ly, double u, double v, int plate_index);
static void set_lensmap_from_ray(int lx, int ly, double sx, double sy, double sz);
static int ray_to_plate_index(vec3_t ray);
static qboolean ray_to_plate_uv(int plate_index, vec3_t ray, double *u, double *v);
static void resume_lensmap(void);
static qboolean resume_lensmap_inverse(void);
static qboolean resume_lensmap_forward(void);
static int uv_to_screen(int plate_index, double u, double v, int *lx, int *ly);
static void draw_quad(int *tl, int *tr, int *bl, int *br, int plate_index, int px, int py);
static void create_lensmap_inverse(void);
static void create_lensmap_forward(void);
static void create_lensmap(void);
static int LUAtoC_lens_inverse(double x, double y, vec3_t ray);
static int LUAtoC_lens_forward(vec3_t ray, double *x, double *y);
static int LUAtoC_globe_plate(vec3_t ray, int *plate);
void Con_Printf(const char *fmt, ...);
void *Hunk_TempAlloc(int size);
void COM_WriteFile(const char *filename, const void *data, int len);
"""


def extract_function(src_lines: list[str], name: str) -> str:
    """Return the full text of one C function definition.

    Handles both definition styles present in the reference: fisheye.c's
    ``static <type> name(...)`` on one line, and mathlib.c's return type
    alone on the line above ``name(...)``.
    """
    start = None
    for i, ln in enumerate(src_lines):
        s = ln.strip()
        if s.endswith(";"):  # prototype declaration, not a definition
            continue
        if re.match(rf"^{name}\(", s) and i > 0 and re.fullmatch(
            r"(static\s+)?[A-Za-z_][\w ]*\**", src_lines[i - 1].strip()
        ):
            start = i - 1
            break
        if re.match(rf"^static\s+[\w]+\s+\**{name}\(", s):
            start = i
            break
    if start is None:
        raise LookupError(f"definition of {name!r} not found in reference source")
    depth = 0
    seen_open = False
    out = []
    for j in range(start, len(src_lines)):
        out.append(src_lines[j])
        depth += src_lines[j].count("{") - src_lines[j].count("}")
        if "{" in src_lines[j]:
            seen_open = True
        if seen_open and depth == 0:
            return "\n".join(out)
    raise ValueError(f"unbalanced braces extracting {name!r}")


COMMON_C = REFERENCE / "engine/common/common.c"

# The console tokenizer (COM_Parse, round 3): its statics are part of
# the behavior (com_tokenbuf bounds token length to 1023; single_chars
# is the NQ single-char split set) — extracted verbatim with anchors.
COMMON_STATIC_PATTERNS = [
    r"static char com_tokenbuf\[\d+\];",
    r"const char \*com_token = com_tokenbuf;",
    r'static const char single_chars\[\] = "[^"]*";',
]
COMMON_FUNCS = ["COM_Parse_", "COM_Parse", "Q_atoi", "Q_atof"]


def extract_statics(src_lines: list[str], patterns: list[str]) -> list[str]:
    out = []
    for pat in patterns:
        for ln in src_lines:
            if re.fullmatch(pat, ln.strip()):
                out.append(ln.strip())
                break
        else:
            raise LookupError(f"static matching {pat!r} not found in reference")
    return out


def generate(out_path: Path) -> Path:
    """Write the extracted reference functions to ``out_path``."""
    fisheye = FISHEYE_C.read_text().split("\n")
    mathlib = MATHLIB_C.read_text().split("\n")
    common = COMMON_C.read_text().split("\n")
    parts = [
        "/* GENERATED by tests/c_reference/extract.py — functions extracted",
        f"   verbatim from {FISHEYE_C}, {MATHLIB_C} and {COMMON_C}.",
        "   Do not edit, do not commit. */",
        "",
        PROTOTYPES,
    ]
    for name in MATHLIB_FUNCS:
        parts.append(extract_function(mathlib, name))
        parts.append("")
    for name in FISHEYE_FUNCS:
        parts.append(extract_function(fisheye, name))
        parts.append("")
    # the console tokenizer (COM_Parse selects its NQ arm via NQ_HACK —
    # the build the reference actually ships, build.sh:28)
    parts.append("#define NQ_HACK 1")
    parts.extend(extract_statics(common, COMMON_STATIC_PATTERNS))
    parts.append("")
    for name in COMMON_FUNCS:
        parts.append(extract_function(common, name))
        parts.append("")
    out_path.write_text("\n".join(parts))
    return out_path


if __name__ == "__main__":
    import sys

    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("build/ref_extracted.c")
    dest.parent.mkdir(parents=True, exist_ok=True)
    print(generate(dest))
