"""Session: the console-semantics API surface.

Mirrors the fisheye layer's public interface — the 13 console commands +
``fisheye`` registered by ``F_Init`` (``engine/NQ/fisheye.c:642-676``),
the change-detection/rebuild logic of ``F_RenderView``
(``fisheye.c:698-811``), config persistence (``F_WriteConfig``,
``fisheye.c:683-696``) and the shortcut-key preset table
(``cmd_shortcutkeys``, ``fisheye.c:979-1016``).

A :class:`Session` owns the current lens/globe/zoom/rubix state, rebuilds
the lensmap lazily on change, and runs the warm remap kernel over frame
batches.  Command strings use the exact ``f_*`` vocabulary::

    sess = Session(640, 480)
    sess.cmd("f_lens stereographic")     # runs the lens's onload zoom too
    out = sess.render(frames)            # [6, S, S, B] u8 -> [H, W, B] u8
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from blinky_tpu import globes as globes_mod
from blinky_tpu import lenses as lenses_mod
from blinky_tpu import palette as palette_mod
from blinky_tpu.io.cubemap import save_globe_pcx
from blinky_tpu.kernels.remap import RemapKernel
from blinky_tpu.palette import MAX_PLATES
from blinky_tpu.lensmap import (
    Zoom,
    ZoomError,
    build_lensmap,
    calc_scale,
    device_builder_warm,
)

HELP_TEXT = """-----------------------------
Welcome to the FISHEYE ADDON!
-> fisheye 1    (ENABLE)
-> fisheye 0    (DISABLE)

-> f_lens <tab>    (CHANGE LENS)
-> f_fov <degrees> (SET FOV)

-> f_<tab>         (MORE COMMANDS)
-----------------------------"""

# fisheye.c:984-997 — the shortcut preset table.
SHORTCUT_BINDINGS = {
    "1": "f_lens panini",
    "2": "f_lens stereographic",
    "3": "f_lens hammer",
    "4": "f_lens winkeltripel",
    "5": "f_lens fisheye1",
    "6": "f_lens mercator",
    "7": "f_lens quincuncial",
    "8": "f_lens cube",
    "9": "f_lens debug",
    "y": "f_globe cube",
    "u": "f_globe cube_edge",
    "i": "f_globe trism",
    "o": "f_globe tetra",
    "p": "f_globe fast",
}


_SINGLE_CHARS = "{})(':"  # common/common.c:1063 — NQ splits these alone


def _c_is_space(ch: str) -> bool:
    """C's ``*data <= ' '`` with a SIGNED char: control chars and every
    byte >= 0x80 (negative as signed char) count as whitespace."""
    o = ord(ch)
    return o <= 32 or o >= 128


def com_parse(data: str, pos: int):
    """``COM_Parse`` transliterated (``common/common.c:1066-1141``, the
    NQ arm: ``split_single_chars`` true).  Returns ``(token, new_pos)``;
    token None = end of data.  Semantics the console depends on: ``//``
    and ``/* */`` comments skip, ``"..."`` strings run to the closing
    quote or end WITHOUT escape processing, the ``{})(':`` characters
    split as single-char tokens, words end at whitespace or a single
    char, tokens cap at 1023 chars (``com_tokenbuf``).  Pinned against
    the COMPILED reference tokenizer by tests/test_c_reference.py."""
    n = len(data)
    while True:
        # NUL is hard end-of-data (common.c:1080), not skippable space
        while pos < n and _c_is_space(data[pos]):
            if data[pos] == "\0":
                return None, pos
            pos += 1
        if pos >= n:
            return None, pos
        c = data[pos]
        if c == "/" and pos + 1 < n and data[pos + 1] == "/":
            while pos < n and data[pos] not in ("\n", "\0"):
                pos += 1
            continue
        if c == "/" and pos + 1 < n and data[pos + 1] == "*":
            pos += 2
            while (pos < n and data[pos] != "\0"
                   and not (data[pos] == "*" and pos + 1 < n
                            and data[pos + 1] == "/")):
                pos += 1
            if pos < n and data[pos] != "\0":
                pos += 2
            continue
        break
    buf = []
    if c == '"':
        pos += 1
        while pos < n:
            c = data[pos]
            if c == "\0":  # ends the token, NUL not consumed (common.c:1104-1110)
                break
            pos += 1
            if c == '"':
                break
            if len(buf) < 1023:
                buf.append(c)
        return "".join(buf), pos
    if c in _SINGLE_CHARS:
        return c, pos + 1
    while True:
        if len(buf) < 1023:
            buf.append(data[pos])
        pos += 1
        if pos >= n:
            break
        c = data[pos]
        if c in _SINGLE_CHARS:
            break
        if _c_is_space(c):
            break
    return "".join(buf), pos


def tokenize_console(line: str) -> list:
    """``Cmd_TokenizeString`` (``common/cmd.c:531-571``): whitespace
    (sans newline) skipped between tokens, a newline ends the command,
    80-arg cap."""
    argv = []
    pos, n = 0, len(line)
    while True:
        # `while (*text && *text <= ' ' && *text != '\n')` — NUL stops
        # the skip, and `if (!*text) return` ends the command (cmd.c:545-551)
        while (pos < n and line[pos] not in ("\n", "\0")
               and _c_is_space(line[pos])):
            pos += 1
        if pos >= n or line[pos] == "\n" or line[pos] == "\0":
            break
        tok, pos = com_parse(line, pos)
        if tok is None:
            break
        if len(argv) < 80:
            argv.append(tok)
    return argv


def split_console_lines(text: str) -> list:
    """``Cbuf_Execute``'s line splitter (``common/cmd.c:181-210``):
    ``"`` counts quotes, an UNQUOTED ``;`` breaks, ``\\n`` breaks
    regardless (each scan restarts its quote count), and the extracted
    line is capped at ``sizeof(line)`` = 1024: an unbroken run caps at
    1023 chars with byte 1023 consumed as the pseudo-terminator
    (``if (i == sizeof(line)) i--``, cmd.c:189-196).  Pinned against the
    compiled reference by tests/test_c_reference.py."""
    parts = []
    pos, remaining = 0, len(text)
    while remaining:
        quotes = 0
        maxlen = min(remaining, 1024)
        ln = 0
        while ln < maxlen:
            ch = text[pos + ln]
            if ch == '"':
                quotes += 1
            if not (quotes & 1) and ch == ";":
                break
            if ch == "\n":
                break
            ln += 1
        if ln == 1024:
            ln -= 1
        parts.append(text[pos:pos + ln])
        if ln == remaining:
            remaining = 0
        else:
            ln += 1  # skip the terminator (or the dropped cap byte)
            remaining -= ln
            pos += ln
    return parts


def _c_char(ch: str) -> int:
    """A byte as C's SIGNED char (the ``'c`` constant path reads it)."""
    o = ord(ch)
    return o - 256 if o >= 128 else o


def _atof(s: str) -> float:
    """``Q_atof`` transcription (``common/common.c:252-315``; used by
    e.g. ``cmd_fov``, ``fisheye.c:1043``): optional ``-``, ``0x`` hex,
    ``'c`` char constant, else digits with a single honored ``.`` —
    parsing stops at the first other character.  Notably "nan"/"inf"
    parse to 0 and "9e99" parses to 9 (no exponent syntax); NaN can
    never be smuggled in, though a ~39-digit run overflows to f32 inf
    (int-cast consumers go through :func:`_c_int`).  The C computes in
    double but RETURNS float — the final f32 truncation is part of the
    contract (pinned vs the compiled Q_atof)."""
    i, sign = 0, 1.0
    if s.startswith("-"):
        sign, i = -1.0, 1
    t = s[i:]

    def f32(v):
        with np.errstate(over="ignore"):  # overlong digit runs hit f32 inf
            return float(np.float32(v))

    if t[:1] == "0" and t[1:2] in ("x", "X"):
        val = 0.0
        for ch in t[2:]:
            d = "0123456789abcdef".find(ch.lower())
            if d < 0:
                break
            val = val * 16 + d
        return f32(val * sign)
    if t[:1] == "'":
        return f32(sign * _c_char(t[1])) if len(t) > 1 else 0.0
    val = 0.0
    decimal = -1
    total = 0
    for ch in t:
        if ch == ".":
            decimal = total
            continue
        if not "0" <= ch <= "9":
            break
        val = val * 10 + (ord(ch) - 48)
        total += 1
    if decimal == -1:
        return f32(val * sign)
    while total > decimal:
        val /= 10
        total -= 1
    return f32(val * sign)


def _c_int(v: float) -> int:
    """C ``(int)`` cast of a float (the ``(int)Q_atof(...)`` console
    sites, e.g. ``cmd_fov`` ``fisheye.c:1043``): truncation toward zero;
    NaN/±inf/out-of-int32-range produce INT_MIN (x86 ``cvttsd2si``), so
    an overlong numeric console arg degrades like the C instead of
    raising ``OverflowError``."""
    if v != v or v == float("inf") or v == float("-inf"):
        return -0x80000000
    t = int(v)
    if not -0x80000000 <= t <= 0x7FFFFFFF:
        return -0x80000000
    return t


def _i32(v: int) -> int:
    """C ``int`` wraparound: ``Q_atoi`` accumulates in a 32-bit int, so
    overlong digit strings wrap (e.g. "9999999999" -> 1410065407 as
    compiled; pinned vs the compiled C in tests/test_c_reference.py)."""
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def _atoi(s: str) -> int:
    """``Q_atoi`` transcription (``common/common.c:200-249``): the same
    grammar integer-only ("2abc" parses to 2, "abc" to 0) — the
    ``fisheye`` toggle's parse (``cmd_fisheye``, ``fisheye.c:975``)."""
    i, sign = 0, 1
    if s.startswith("-"):
        sign, i = -1, 1
    t = s[i:]
    if t[:1] == "0" and t[1:2] in ("x", "X"):
        val = 0
        for ch in t[2:]:
            d = "0123456789abcdef".find(ch.lower())
            if d < 0:
                break
            val = _i32(val * 16 + d)
        return _i32(val * sign)
    if t[:1] == "'":
        return sign * _c_char(t[1]) if len(t) > 1 else 0
    val = 0
    for ch in t:
        if not "0" <= ch <= "9":
            break
        val = _i32(val * 10 + (ord(ch) - 48))
    return _i32(val * sign)


class Session:
    def __init__(
        self,
        width: int,
        height: int,
        platesize: Optional[int] = None,
        palette: Optional[np.ndarray] = None,
        lens_dirs=(),
        globe_dirs=(),
        backend: str = "auto",
        echo: bool = False,
        defaults: bool = True,
        build_budget_s: Optional[float] = None,
        cmdline_cmds=(),
    ):
        # backend policy ("auto", the default): static builds (no view
        # rotation) use the exact float64 host builder — Session.lensmap
        # then bit-equals the reference C (tests/test_c_reference.py) —
        # while pose-tracked playback (setviewangles) switches to the
        # jitted f32 device builder, whose ms-scale rebuilds make per-frame
        # poses viable (the f32-vs-exact pixel drift is characterized in
        # docs/PERF.md §5).  "numpy" / "jax" force one path.
        self.width_px = int(width)
        self.height_px = int(height)
        self.platesize = int(platesize) if platesize else min(width, height)
        self._plain_cache = None  # (key, kernel) for the fisheye-0 view
        self._kernel = None
        self.palette = palette if palette is not None else palette_mod.default_palette()
        self.lens_dirs = [Path(p) for p in lens_dirs]
        self.globe_dirs = [Path(p) for p in globe_dirs]
        self.backend = backend
        self.echo = echo
        self.console: list = []
        self.cmdline_cmds = list(cmdline_cmds)
        self._in_stuffcmds = False

        self.fisheye_enabled = False
        self.fov = 90.0  # the engine "fov" cvar (scr_fov, NQ/view.c:116)
        self.view_angles = None  # (pitch, yaw, roll) deg, None = identity
        self._plain_cache = None  # (key, kernel) for the fisheye-0 view
        self.shortcutkeys_enabled = False
        self.bindings: dict = {}
        self.aliases: dict = {}  # name -> command string (common/cmd.c:373)
        self._alias_depth = 0  # bounds self-referential alias expansion
        self.lens_name = ""
        self.lens = None
        self.lens_valid = False
        self.globe_name = ""
        self.globe = None
        self.globe_valid = False
        self.zoom = Zoom("none")
        self.rubix_enabled = False  # fisheye.c:647
        self.rubix_numcells = 10
        self.rubix_cell_size = 4.0
        self.rubix_pad_size = 1.0
        self.save_request = None

        self._changed = True
        self._lensmap = None
        self._lensmap_meta = None  # (lens, globe, view_is_identity)
        self._kernel = None
        self._background = None
        # Time-sliced exact builds (fisheye.c:306-322 analog): seconds of
        # exact-build work per render() call; None = block until exact.
        # Interactive hosts (the viewer) set ~1/60 like the reference.
        self.build_budget_s = build_budget_s
        self._pending_build = None

        self._commands = {
            "fov": self._cmd_plainfov,
            "fisheye": self._cmd_fisheye,
            "f_help": self._cmd_help,
            "f_lens": self._cmd_lens,
            "f_globe": self._cmd_globe,
            "f_fov": self._cmd_fov,
            "f_vfov": self._cmd_vfov,
            "f_cover": self._cmd_cover,
            "f_contain": self._cmd_contain,
            "f_rubix": self._cmd_rubix,
            "f_rubixgrid": self._cmd_rubixgrid,
            "f_saveglobe": self._cmd_saveglobe,
            "f_dumppal": self._cmd_dumppal,
            "f_shortcutkeys": self._cmd_shortcutkeys,
            "impulse": lambda argv: None,  # game-sim command: no-op here
            "stuffcmds": self._cmd_stuffcmds,
            "setviewangles": self._cmd_setviewangles,
            "bind": self._cmd_bind,
            "unbind": self._cmd_unbind,
            "unbindall": self._cmd_unbindall,
            "exec": self._cmd_exec,
            "alias": self._cmd_alias,
            "echo": self._cmd_echo,
            # Cmd_Wait_f defers the rest of the buffer to the next frame
            # (common/cmd.c:119-130); with no frame loop here every
            # command runs to completion, so wait is a no-op
            "wait": lambda argv: None,
        }
        if defaults:
            # F_Init defaults, fisheye.c:668-672.
            for c in (
                "fisheye 1",
                "f_globe cube",
                "f_lens panini",
                "f_fov 180",
                "f_rubixgrid 10 4 1",
            ):
                self.cmd(c)

    # ------------------------------------------------------------------ io
    def _print(self, msg: str) -> None:
        self.console.append(msg)
        if self.echo:
            print(msg)

    # ------------------------------------------------------- command layer
    def cmd(self, line: str) -> None:
        """Execute one console command line (the ``Cbuf_Execute`` ->
        ``Cmd_ExecuteString`` path).

        Splitting and tokenizing are faithful transliterations of the
        reference console (``split_console_lines`` / ``tokenize_console``
        / ``com_parse`` — quote-aware ``;``, newline breaks, ``//`` and
        ``/* */`` comments, the ``{})(':`` single-char split set, no
        escape processing in quotes), pinned against the COMPILED
        reference tokenizer by tests/test_c_reference.py.
        """
        for part in split_console_lines(line):
            argv = tokenize_console(part)
            if not argv:
                continue
            handler = self._commands.get(argv[0])
            if handler is None:
                # aliases expand only after real commands miss
                # (Cmd_ExecuteString order, common/cmd.c:758-775)
                value = self.aliases.get(argv[0])
                if value is not None:
                    # Cbuf_InsertText(a->value): the alias body replaces
                    # the whole line; args after the alias name drop.
                    # The reference's Cbuf would spin forever on a
                    # self-referential alias — bound the depth instead.
                    if self._alias_depth >= 16:
                        self._print(f'alias loop through "{argv[0]}"')
                        continue
                    self._alias_depth += 1
                    try:
                        self.cmd(value)
                    finally:
                        self._alias_depth -= 1
                    continue
                self._print(f'Unknown command "{argv[0]}"')
                continue
            handler(argv)

    def _cmd_fisheye(self, argv):
        if len(argv) < 2:
            self._print("Currently: ")
            self._print(f"fisheye {int(self.fisheye_enabled)}")
            self._print("\nTry F_HELP for more options and commands.")
            return
        # fisheye_enabled = Q_atoi(Cmd_Argv(1)) — "will return 0 if not
        # valid" (cmd_fisheye, fisheye.c:975); "2abc" is truthy there
        self.fisheye_enabled = bool(_atoi(argv[1]))

    def _cmd_plainfov(self, argv):
        """The engine ``fov`` cvar: horizontal FOV of the normal
        (fisheye-off) view; clamped 10..170 (``SCR_CalcRefdef``,
        ``common/screen.c:589-592``)."""
        if len(argv) < 2:
            self._print(f'"fov" is "{self.fov:g}"')
            return
        self.fov = min(170.0, max(10.0, _atof(argv[1])))
        self._plain_cache = None

    def _cmd_setviewangles(self, argv):
        """Rotate the view within recorded plates: ``setviewangles <pitch>
        <yaw> <roll>`` (degrees).  The reference gets viewangles from game
        input and re-renders the plates (``F_RenderView``,
        ``fisheye.c:750``); with recorded cubemaps the rotation composes
        into the lensmap instead.  ``setviewangles`` with no args resets."""
        if len(argv) < 4:
            self.view_angles = None
        else:
            self.view_angles = (_atof(argv[1]), _atof(argv[2]), _atof(argv[3]))
        self._changed = True
        self._plain_cache = None

    def _jittable(self) -> bool:
        """Device builds need both the lens map and the globe's plate
        resolver to trace (load-time probes in lua_bridge)."""
        return (getattr(self.lens, "jittable", True)
                and getattr(self.globe, "jittable", True))

    def _resolved_backend(self) -> str:
        """See the backend-policy note in ``__init__``."""
        if self.backend == "auto":
            if self.view_angles is not None and self._jittable():
                return "jax"
            # the rare non-jittable lens (a .lua script that fails the
            # trace probe, e.g. lane-varying table writes) takes the
            # host builder, which supports view_basis too — just slower
            return "numpy"
        return self.backend

    def _view_basis(self):
        if self.view_angles is None:
            return None
        from blinky_tpu.camera import view_basis_from_angles

        return view_basis_from_angles(*self.view_angles)

    def _cmd_help(self, argv):
        self._print(HELP_TEXT)

    def _cmd_lens(self, argv):
        if len(argv) < 2:
            self._print("f_lens <name>: use a new lens")
            self._print(f"Currently: {self.lens_name}")
            return
        self._changed = True
        self.lens_name = argv[1]
        self._print(f"f_lens {self.lens_name}")
        self.lens_valid = self._load_lens()
        if not self.lens_valid:
            self.lens_name = ""
            self._print("not a valid lens")
            return
        if self.lens.onload:
            self.cmd(self.lens.onload)
            self._print(f"; {self.lens.onload}")

    def _cmd_globe(self, argv):
        if len(argv) < 2:
            self._print("f_globe <name>: use a new globe")
            self._print(f"Currently: {self.globe_name}")
            return
        self._changed = True
        self.globe_name = argv[1]
        self._print(f"f_globe {self.globe_name}")
        self.globe_valid = self._load_globe()
        if not self.globe_valid:
            self.globe_name = ""
            self._print("not a valid globe")

    def _cmd_fov(self, argv):
        if len(argv) < 2:
            self._print("f_fov <degrees>: set horizontal FOV")
            self._print(f"Zoom currently: {self.zoom.command() or 'none'}")
            return
        self.zoom = Zoom("fov", _c_int(_atof(argv[1])))
        self._changed = True

    def _cmd_vfov(self, argv):
        if len(argv) < 2:
            self._print("f_vfov <degrees>: set vertical FOV")
            self._print(f"Zoom currently: {self.zoom.command() or 'none'}")
            return
        self.zoom = Zoom("vfov", _c_int(_atof(argv[1])))
        self._changed = True

    def _cmd_cover(self, argv):
        self.zoom = Zoom("cover")
        self._changed = True

    def _cmd_contain(self, argv):
        self.zoom = Zoom("contain")
        self._changed = True

    def _cmd_rubix(self, argv):
        self.rubix_enabled = not self.rubix_enabled
        self._print(f"Rubix is {'ON' if self.rubix_enabled else 'OFF'}")

    def _cmd_rubixgrid(self, argv):
        if len(argv) == 4:
            self.rubix_numcells = _c_int(_atof(argv[1]))
            self.rubix_cell_size = _atof(argv[2])
            self.rubix_pad_size = _atof(argv[3])
            self._changed = True  # need to recompute lens to update grid
        else:
            self._print("RubixGrid <numcells> <cellsize> <padsize>")
            self._print(f"   numcells (default 10) = {self.rubix_numcells}")
            self._print(f"   cellsize (default  4) = {self.rubix_cell_size:f}")
            self._print(f"   padsize  (default  1) = {self.rubix_pad_size:f}")

    def _cmd_saveglobe(self, argv):
        if len(argv) < 2:
            self._print("f_saveglobe <name> [full flag=0]: screenshot the globe plates")
            return
        # with_margins = Q_atoi(Cmd_Argv(2)), fisheye.c:1130
        with_margins = _atoi(argv[2]) if len(argv) >= 3 else 0
        self.save_request = (argv[1][:32], with_margins)

    def _cmd_dumppal(self, argv):
        Path("palette").write_text(palette_mod.save_dumppal(self.palette))

    def _cmd_shortcutkeys(self, argv):
        self.shortcutkeys_enabled = not self.shortcutkeys_enabled
        if self.shortcutkeys_enabled:
            self._print(
                "Enabled Fisheye shortcut keys: 1-9 = Lenses, Y,U,I,O,P = Globes"
            )
            for key, command in SHORTCUT_BINDINGS.items():
                self.bindings[key] = command
        else:
            self._print("Disabled Fisheye shortcut keys")
            for key in "12345678":
                self.bindings[key] = f"impulse {key}"
            for key in ("9", "y", "u", "i", "o", "p"):
                self.bindings.pop(key, None)

    def _cmd_bind(self, argv):
        """``Key_Bind_f`` (``common/keys.c:661-703``): exactly
        ``bind <key>`` (query) or ``bind <key> <command>`` (set — one
        quoted token, the reference rejects argc > 3)."""
        if len(argv) not in (2, 3):
            self._print("bind <key> [command] : attach a command to a key")
            return
        if len(argv) == 2:
            if argv[1] in self.bindings:
                self._print(f'"{argv[1]}" = "{self.bindings[argv[1]]}"')
            else:
                self._print(f'"{argv[1]}" is not bound')
            return
        self.bindings[argv[1]] = argv[2]

    def _cmd_unbind(self, argv):
        """``Key_Unbind_f`` (``common/keys.c:628-644``)."""
        if len(argv) != 2:
            self._print("unbind <key> : remove commands from a key")
            return
        self.bindings.pop(argv[1], None)

    def _cmd_stuffcmds(self, argv):
        """``Cmd_StuffCmds_f`` (``common/cmd.c:236-296``): re-exec the
        command-line commands, so a config/script can let CLI ``--cmd``
        overrides win over its own settings (quake.rc's startup order:
        exec defaults, exec config.cfg, stuffcmds)."""
        if len(argv) != 1:
            # common/cmd.c:253-256 — usage print, nothing executed
            self._print("stuffcmds : execute command line parameters")
            return
        if self._in_stuffcmds:
            # no reference analog (the C engine consumes the cmdline
            # tokens via a one-shot buffer); here a cmdline cmd that
            # execs a config ending in `stuffcmds` would recurse forever
            self._print("stuffcmds: ignoring recursive call")
            return
        self._in_stuffcmds = True
        try:
            for c in self.cmdline_cmds:
                self.cmd(c)
        finally:
            self._in_stuffcmds = False

    def _cmd_unbindall(self, argv):
        """``Key_Unbindall_f`` (``common/keys.c:647-656``): clear every
        binding — the first line of an engine-written config.cfg."""
        self.bindings.clear()

    def _cmd_exec(self, argv):
        if len(argv) >= 2:
            try:
                self.exec_config(argv[1])
            except (OSError, UnicodeDecodeError):
                # Cmd_Exec_f keeps the console alive (common/cmd.c:325);
                # the C path execs raw bytes, so undecodable files must
                # not crash the session either.
                self._print(f"couldn't exec {argv[1]}")

    def _cmd_alias(self, argv):
        """``Cmd_Alias_f`` (``common/cmd.c:373-432``): no args lists the
        aliases; else ``alias <name> <value...>`` stores argv[2:] joined
        with single spaces (the usual form quotes the body as one arg:
        ``alias zoomin "f_fov 90"``)."""
        if len(argv) == 1:
            self._print("Current alias commands:")
            for name, value in self.aliases.items():
                self._print(f"{name} : {value}")
            return
        name = argv[1]
        if len(name) >= 32:  # MAX_ALIAS_NAME, common/cmd.c:42
            self._print("Alias name is too long")
            return
        self.aliases[name] = " ".join(argv[2:])

    def _cmd_echo(self, argv):
        """``Cmd_Echo_f`` (``common/cmd.c:343-350``)."""
        self._print(" ".join(argv[1:]))

    def press_key(self, key: str) -> None:
        """Run the command bound to *key* (the shortcut-key surface)."""
        if key in self.bindings:
            self.cmd(self.bindings[key])

    # ------------------------------------------------------ lens/globe load
    def _load_lens(self) -> bool:
        """Load/reload the active lens (``LUA_load_lens`` semantics).

        The reference re-executes the script on EVERY rebuild trigger
        (``fisheye.c:734-737``) because lens globals may depend on
        ``numplates``; a reload is only *observable* when the globe or
        the script file actually changed, so the loaded ``LensDef`` is
        cached on (name, globe GENERATION, script mtime).  Reusing the
        same object also keeps the jitted builder's compile cache warm —
        a zoom/pose change must not retrace the lens (and a ``.lua``
        drop-in's traced re-run is seconds, not ms).  The cache holds
        EVERY lens visited this session (bounded), not just the last
        one, so switching away and back (shortcut keys 1-9) returns the
        same LensDef identity — re-switches keep the compiled device
        builder instead of retracing.  The generation counter, not
        ``id(globe)``: a freed Globe's id can be reused and silently hit
        a stale entry (same pitfall as ``_posed_cache``)."""
        try:
            cache = getattr(self, "_lens_cache", None)
            if cache is None:
                cache = self._lens_cache = {}

            def _hit(key, load):
                lens = cache.get(key)
                if lens is None:
                    lens = load()
                    if len(cache) >= 64:  # matches the builder lru bound
                        evicted = cache.pop(next(iter(cache)))
                        # unwind coroutine threads a .lua script parked
                        # in its scalar interpreters (otherwise pinned
                        # for the process lifetime) — but never for an
                        # object still in use: the oldest entry can be
                        # the ACTIVE lens (plain dict, no move-to-end)
                        # or the one a background posed build captured.
                        rel = getattr(evicted, "release", None)
                        pend = getattr(self, "_posed_async", None)
                        pend_lens = (pend["key"][0] if pend is not None
                                     else None)
                        if (rel is not None and evicted is not self.lens
                                and evicted is not pend_lens):
                            rel()
                    cache[key] = lens
                self.lens = lens
                return True

            ggen = getattr(self, "_globe_gen", 0)
            if self.lens_name in lenses_mod.BUILTIN_LENSES:
                return _hit(
                    (self.lens_name, ggen, None),
                    lambda: lenses_mod.get(self.lens_name, self.globe),
                )
            for d in self.lens_dirs:
                for ext in (".py", ".lua"):  # .lua = reference drop-ins
                    p = d / f"{self.lens_name}{ext}"
                    if p.exists():
                        return _hit(
                            (str(p), ggen, p.stat().st_mtime_ns),
                            lambda: lenses_mod.load_lens_module(
                                p, self.globe),
                        )
        except Exception as e:  # loader diagnostics, fisheye.c:1671-1677
            self._print(f"could not load lens: {e}")
        return False

    def _load_globe(self) -> bool:
        try:
            if self.globe_name in globes_mod.names():
                self.globe = globes_mod.get(self.globe_name)
                self._globe_gen = getattr(self, "_globe_gen", 0) + 1
                return True
            for d in self.globe_dirs:
                for ext in (".py", ".lua"):
                    p = d / f"{self.globe_name}{ext}"
                    if p.exists():
                        self.globe = globes_mod.load_globe_module(p)
                        self._globe_gen = getattr(self, "_globe_gen", 0) + 1
                        return True
        except Exception as e:
            self._print(f"could not load globe: {e}")
        return False

    # ------------------------------------------------------------ pipeline
    def _rebuild(self) -> None:
        """Change-driven lensmap rebuild (``F_RenderView``,
        ``fisheye.c:730-746``): reload the lens (its metadata may depend on
        the globe), re-solve the zoom, rebuild the gather table.

        With :attr:`build_budget_s` set and a seconds-scale exact host
        build ahead, the build becomes TIME-SLICED (the reference's
        resumable builder, ``fisheye.c:306-322``): an instant preview
        lensmap is installed now — the f32 device build when the lens
        traces, else the growing partial table (pixels appear) — and
        each :meth:`render` advances the exact build by the budget until
        it swaps in (bit-identical to the blocking build)."""
        self._lensmap = None
        self._lensmap_meta = None
        self._kernel = None
        self._pending_build = None
        if not (self.lens_valid and self.globe_valid):
            self._changed = False
            return
        # reload lens so globe-dependent metadata is fresh (fisheye.c:734-737)
        self.lens_valid = self._load_lens()
        if not self.lens_valid:
            self.lens_name = ""
            self._print("not a valid lens")
            self._changed = False
            return
        try:
            scale = calc_scale(self.zoom, self.lens, self.width_px, self.height_px)
        except ZoomError as e:
            self._print(str(e))
            self._changed = False
            return
        backend = self._resolved_backend()
        # what the table(s) assigned below are built FROM: the lens/globe
        # objects and whether a view rotation is composed in.  Consumers
        # that need an identity-view table at a known scale (the
        # static-ray ray-table reuse) check THIS, not the session's
        # current mutable state — a pending setviewangles must not hide
        # a perfectly reusable pre-drag build.
        self._lensmap_meta = (self.lens, self.globe,
                              self._view_basis() is None)
        if (self.build_budget_s is not None and backend == "numpy"
                and self.lens.map_type == "inverse"):
            from blinky_tpu.lensmap.progressive import ProgressiveHostBuild

            pb = ProgressiveHostBuild(
                self.lens, self.globe, scale, self.width_px, self.height_px,
                self.platesize, numcells=self.rubix_numcells,
                cell_size=self.rubix_cell_size, pad_size=self.rubix_pad_size,
                view_basis=self._view_basis(),
            )
            self._pending_build = pb
            if self._jittable() and device_builder_warm(
                    self.lens, self.globe, self.width_px, self.height_px,
                    self.platesize):
                # instant f32 device preview (ms; drift docs/PERF.md §5).
                # WARM builders only: a cold jit compile blocks seconds
                # to minutes through the relay — exactly the stall the
                # time-sliced path exists to avoid — so a cold lens
                # paints the growing partial table instead (the
                # reference's pixels-appearing UX, fisheye.c:306-322)
                self._lensmap = build_lensmap(
                    self.lens, self.globe, scale, self.width_px,
                    self.height_px, self.platesize,
                    numcells=self.rubix_numcells,
                    cell_size=self.rubix_cell_size,
                    pad_size=self.rubix_pad_size, backend="jax",
                    view_basis=self._view_basis(),
                )
                self._preview_is_partial = False
            else:
                pb.step(self.build_budget_s)  # first slice right away
                self._lensmap = pb.partial()
                self._preview_is_partial = True
            # kernel created lazily in render(): constructing RemapKernel
            # moves tables to the DEVICE, which a cold process pays axon
            # client init for — render_host must stay device-free
            self._changed = False
            return
        self._lensmap = build_lensmap(
            self.lens,
            self.globe,
            scale,
            self.width_px,
            self.height_px,
            self.platesize,
            numcells=self.rubix_numcells,
            cell_size=self.rubix_cell_size,
            pad_size=self.rubix_pad_size,
            backend=backend,
            view_basis=self._view_basis(),
        )
        self._kernel = None  # lazily constructed in render()
        self._changed = False

    def _advance_build(self, budget_s=None):
        """One time slice of a pending exact build (``resume_lensmap``,
        ``fisheye.c:744-746,2074``); swaps the exact table in when it
        lands.  ``budget_s=None`` finishes the build (blocking)."""
        pb = self._pending_build
        if pb is None:
            return
        pb.step(float("inf") if budget_s is None else budget_s)
        if pb.done:
            self._lensmap = pb.result()
            self._kernel = None  # lazily constructed in render()
            self._pending_build = None
        elif getattr(self, "_preview_is_partial", False):
            # pixels-appearing preview: refresh the partial table
            self._lensmap = pb.partial()
            self._kernel = None

    @property
    def build_progress(self):
        """Exact-build progress 0..1 while a time-sliced build is
        pending, else None."""
        pb = self._pending_build
        return None if pb is None else pb.progress

    def warm_device_builder(self) -> bool:
        """Compile + execute the f32 device builder for the active
        lens/globe at this session's shapes, paying the cold jit compile
        NOW so the first interactive pose change (drag-look) or preview
        doesn't stall on it.  Returns True if a device builder is now
        warm (inverse-mapped, traceable lens only — forward lenses
        rasterize on the host and have no device builder)."""
        if not (self.lens_valid and self.globe_valid):
            return False
        self.lens_valid = self._load_lens()
        if not (self.lens_valid and self._jittable()
                and self.lens.map_type == "inverse"):
            return False
        try:
            scale = calc_scale(self.zoom, self.lens, self.width_px,
                               self.height_px)
        except ZoomError:
            scale = 1.0  # any scale: it is a dynamic jit argument
        build_lensmap(
            self.lens, self.globe, scale, self.width_px, self.height_px,
            self.platesize, numcells=self.rubix_numcells,
            cell_size=self.rubix_cell_size, pad_size=self.rubix_pad_size,
            backend="jax", view_basis=self._view_basis(),
        )
        return True

    @property
    def lensmap(self):
        if self._changed or self._lensmap is None:
            self._rebuild()
        # direct lensmap access demands the EXACT table (parity
        # consumers, saveglobe): finish any pending sliced build now
        self._advance_build(budget_s=None)
        return self._lensmap

    @property
    def palette(self) -> np.ndarray:
        return self._palette

    @palette.setter
    def palette(self, pal) -> None:
        # Reassigning the palette must invalidate the cached remap kernels:
        # their tint/rgb LUTs bake the palette in at construction.
        self._palette = np.asarray(pal, dtype=np.uint8)
        # Generation counter, not id(): a freed array's id can be reused
        # and silently hit a stale cache entry (see _posed_cache note).
        self._palette_gen = getattr(self, "_palette_gen", 0) + 1
        self._kernel = None
        self._plain_cache = None
        self._posed_cache = None  # its RGBA background decodes the palette
        self._aa_cache = None  # hi-res sessions bake the palette in

    def set_background(self, background) -> None:
        """Set the underlay shown where the lensmap is unmapped (the
        reference's ``Draw_TileClear`` tile, ``fisheye.c:802``)."""
        self._background = np.asarray(background, dtype=np.uint8)
        self._background_gen = getattr(self, "_background_gen", 0) + 1
        self._kernel = None  # rebuilt lazily in render() from the lensmap
        self._plain_cache = None
        self._posed_cache = None

    def set_size(self, width: int, height: int, platesize: Optional[int] = None) -> None:
        self.width_px = int(width)
        self.height_px = int(height)
        self.platesize = int(platesize) if platesize else min(width, height)
        if self._background is not None and self._background.shape[:2] != (
                self.height_px, self.width_px):
            # A screen-sized underlay can't survive a resize (the
            # reference re-tiles its background texture per frame,
            # Draw_TileClear fisheye.c:802); drop back to the default.
            self._background = None
            self._background_gen = getattr(self, "_background_gen", 0) + 1
        self._changed = True  # sizechange, fisheye.c:709

    def render(self, frames, rubix: Optional[bool] = None, decode_rgb: bool = False):
        """Remap a cubemap frame ([P, S, S] u8) or batch ([P, S, S, B] u8)
        through the current lensmap.  Returns [H, W] / [H, W, B] uint8 (or
        RGB with ``decode_rgb``).  Returns the background when disabled or
        when the current lens/zoom is invalid (the reference keeps running
        and shows the cleared screen)."""
        if not hasattr(frames, "ndim"):  # device arrays pass through:
            frames = np.asarray(frames)  # render_equirect stays on-chip
        S = frames.shape[1]
        if S != self.platesize:
            self.platesize = S
            self._changed = True
        if not self.fisheye_enabled:
            # fisheye 0 = the normal rectilinear view at the "fov" cvar
            # (V_RenderView's non-fisheye branch, NQ/view.c:947-952); the
            # warped lensmap is neither built nor consulted, and a pending
            # f_saveglobe stays queued until fisheye is re-enabled, as in
            # the reference where only F_RenderView services it.
            kernel = self._plain_view_kernel()
            if kernel is not None:
                return kernel(frames, rubix=False, decode_rgb=decode_rgb)
            return self._background_screen(frames)
        if self._changed or self._lensmap is None:
            self._rebuild()
        # advance any pending time-sliced exact build by one budget slice
        # (resume_lensmap, fisheye.c:744-746) — renders use the preview
        # until the exact table swaps in
        self._advance_build(budget_s=self.build_budget_s)
        lm = self._lensmap
        if self.save_request is not None:
            name, with_margins = self.save_request
            self.save_request = None
            fr = frames if frames.ndim == 3 else frames[..., 0]
            paths = save_globe_pcx(name, fr, self.globe, self.palette, bool(with_margins))
            for p in paths:
                self._print(f"Wrote {p}")
        if lm is None:
            return self._background_screen(frames)
        if self._kernel is None:  # e.g. invalidated by set_background
            self._kernel = RemapKernel(lm, self.palette, self._background)
        rubix = self.rubix_enabled if rubix is None else rubix
        return self._kernel(frames, rubix=rubix, decode_rgb=decode_rgb)

    def render_sharded(self, frames, mesh, rubix=None,
                       decode_rgb: bool = False):
        """:meth:`render` over a device mesh: the frame batch DP-shards
        on B over the mesh's data axes (``("data",)``, or
        ``("slice", "data")`` on a two-level multi-slice mesh —
        :func:`blinky_tpu.parallel.make_slice_mesh`), the lensmap rows
        shard over "space" where present, and the gather stays local on
        every device (SURVEY §5.8).  Bit-equal to :meth:`render` on the
        same table (pinned in tests/test_sharding.py and the driver
        dryrun).  Uses the session's EXACT lensmap (a pending sliced
        build is finished first — sharded batch runs are offline
        throughput work, not the interactive preview path)."""
        from blinky_tpu.parallel import remap_sharded

        if not hasattr(frames, "ndim"):
            frames = np.asarray(frames)
        S = frames.shape[1]
        if S != self.platesize:
            self.platesize = S
            self._changed = True
        if not self.fisheye_enabled:
            raise ValueError("render_sharded needs fisheye enabled "
                             "(the plain view is single-device)")
        if self._changed or self._lensmap is None:
            self._rebuild()
        lm = self.lensmap  # the property finishes a pending sliced build
        if lm is None:
            raise ValueError("no valid lensmap (check lens/zoom state)")
        if self._kernel is None:
            self._kernel = RemapKernel(lm, self.palette, self._background)
        rubix = self.rubix_enabled if rubix is None else rubix
        return remap_sharded(self._kernel, frames, mesh, rubix=rubix,
                             decode_rgb=decode_rgb)

    def render_host(self, frames, rubix=None, decode_rgb: bool = False):
        """Render ONE frame entirely on the host — no device, no jit.

        The bind-first cold-serve path (VERDICT r3 task 4): a cold
        process pays ~45 s of first-ever gather-kernel compile through
        the axon relay before :meth:`render` can return, but the
        reference's frame loop runs from the first frame and time-slices
        all build work (``fisheye.c:306-322``).  This method mirrors
        :meth:`render`'s state machine (rebuild on change, one budget
        slice of a pending exact build, ``f_saveglobe`` service, rubix
        by the session flag) but builds host-side only — the backend is
        forced to "numpy" for the duration so even a ``setviewangles``
        rebuild takes the (progressive, budget-sliced) host builder —
        and gathers with :func:`blinky_tpu.kernels.remap.host_remap`,
        which is bit-equal to the device kernel on the same table.
        Single frames only; batches belong on the device.
        """
        from blinky_tpu.kernels.remap import host_remap

        frames = np.asarray(frames)
        if frames.ndim != 3:
            raise ValueError("render_host takes one [P, S, S] frame")
        S = frames.shape[1]
        if S != self.platesize:
            self.platesize = S
            self._changed = True
        saved_backend = self.backend
        self.backend = "numpy"
        try:
            if not self.fisheye_enabled:
                plain = self._plain_view_lensmap()
                if plain is None:
                    return self._background_screen(frames)
                return host_remap(plain, frames, self.palette,
                                  self._background, rubix=False,
                                  decode_rgb=decode_rgb)
            if self._changed or self._lensmap is None:
                self._rebuild()
            self._advance_build(budget_s=self.build_budget_s)
        finally:
            self.backend = saved_backend
        lm = self._lensmap
        if self.save_request is not None:
            name, with_margins = self.save_request
            self.save_request = None
            paths = save_globe_pcx(name, frames, self.globe, self.palette,
                                   bool(with_margins))
            for p in paths:
                self._print(f"Wrote {p}")
        if lm is None:
            return self._background_screen(frames)
        rubix = self.rubix_enabled if rubix is None else rubix
        return host_remap(lm, frames, self.palette, self._background,
                          rubix=rubix, decode_rgb=decode_rgb)

    def render_posed(self, frames, poses, render_scale=1,
                     target_fps: float = 60.0, exact: bool = False,
                     block: bool = True):
        """Per-frame-pose playback: every frame gets its own view rotation.

        ``frames``: [P, S, S, B] (u8 plates, the expanded [12, ...] rubix
        layout, or RGBA u32); ``poses``: [B, 3] (pitch, yaw, roll) degrees
        or precomputed [B, 3, 3] bases.  Returns [B, H, W].

        ``render_scale`` k > 1 trades resolution for sustained fps (the
        reference's own quality<->speed axis, "Performance vs Quality"):
        the per-pose lensmap is built at 1/k size and nearest-upsampled
        on device, cutting the per-index gather wall (docs/PERF.md §6)
        by ~k².  The full-res background stays crisp.

        ``render_scale="auto"`` is dynamic resolution: the fused
        pipeline is probed on this device (cached per lens/size), a
        ``chunk_cost(B, k) = d + B(c + b/k²)`` model is fitted, and the
        SMALLEST k predicted to sustain ``target_fps`` at THIS chunk
        size is used (native resolution when the chip can hold it; the
        measured per-index wall is docs/PERF.md §6).

        The default path is the static-ray recomposition
        (``kernels/static_ray.py``): one per-pixel camera-ray table per
        (lens, zoom, size) — the reference's own pose/lensmap decoupling
        (``fisheye.c:750,2427-2450`` vs ``2346-2397``) — then per pose a
        lens-free rotate + plate-resolve + gather, fused on device for
        ALL 31 lenses (forward-only and scalar-only ``.lua`` scripts
        included; their table reconstructs texel-center rays from the
        exact host build).  For inverse lenses this matches the vmapped
        f32 builder exactly; for forward-only lenses the table
        quantizes rays to texel centers.

        ``exact=True`` opts into the per-pose exact host path instead
        (one float64 host build per pose — forward rasterization in C
        scan order, or the exact inverse builder): bit-identical to
        static ``setviewangles`` renders, host-build-bound.  Static
        renders should use :meth:`render` (exact by default).

        ``block=False`` (round 5) makes a FIRST call non-blocking when
        the posed kernel for this (lens, zoom, size, scale) is not built
        yet — the one-time cost is seconds-scale for a forward-only
        lens's host rasterization (~2.7 s at 1080p, PERF §6) and the
        reference never blocks (``fisheye.c:306-322``).  The native
        kernel builds on a background thread while this call returns a
        PREVIEW: the same poses rendered through a coarse
        ``render_scale`` kernel (geometry-correct, nearest-upsampled on
        device — the viewer's drag-look trade).  Poll
        :attr:`posed_pending`; once it clears, the next call swaps the
        exact-resolution kernel in (outputs from then on are identical
        to ``block=True``).  A failed background build re-raises on the
        next call.  ``exact=True`` ignores ``block``.
        """
        from blinky_tpu.kernels.posed import (
            bases_from_pose_track, check_render_scale,
        )
        from blinky_tpu.kernels.static_ray import StaticRayPosedKernel

        if not (self.fisheye_enabled and self.lens_valid and self.globe_valid):
            raise ValueError("render_posed needs fisheye enabled and a valid lens/globe")
        if not hasattr(frames, "ndim"):  # device arrays pass through, like
            frames = np.asarray(frames)  # render(): EquirectIngest output
            # feeds the posed pipeline without a host round-trip
        if frames.ndim != 4:
            raise ValueError("render_posed takes a frame batch [P, S, S, B]")
        S = frames.shape[1]
        poses = np.asarray(poses, dtype=np.float64)
        bases = poses if poses.ndim == 3 else bases_from_pose_track(poses)
        scale = calc_scale(self.zoom, self.lens, self.width_px, self.height_px)
        B = frames.shape[-1]
        if bases.shape != (B, 3, 3):
            # same contract as PosedRemapKernel.__call__ — validated here
            # too so the forward fallback and the B=0 return can't
            # silently truncate a mismatched pose track
            raise ValueError(
                f"bases must be [B={B}, 3, 3], got {bases.shape}")
        if B == 0:
            # degenerate empty chunk: nothing to build or gather (the
            # fused pipeline would reshape by B=0) — but bad arguments
            # still fail like they would on a non-empty chunk
            if render_scale != "auto":
                check_render_scale(self.width_px, self.height_px,
                                   int(render_scale))
            return np.empty(
                (0, self.height_px, self.width_px),
                np.uint32 if frames.dtype == np.uint32 else np.uint8)
        if not getattr(self.globe, "jittable", True):
            # a scalar-only .lua GLOBE's plate resolver cannot trace, and
            # the static-ray pipeline jits the per-pose plate-resolve
            # stage for EVERY lens (build_ray_table host-routes only the
            # lens stage) — route to the exact host path instead of
            # letting Unvectorizable escape mid-trace
            exact = True
        if render_scale == "auto":
            if exact:
                render_scale = 1  # per-pose host builds: nothing to probe
            else:
                render_scale = self._auto_render_scale(
                    frames, bases, scale, float(target_fps))
        if exact:
            return self._render_posed_exact(frames, bases, scale,
                                            int(render_scale))
        # HBM-aware chunking (bench/autobatch.py): a pose batch larger
        # than the device can hold (source planes + per-pose index
        # tables + screens, per lane) splits transparently — the same
        # cached kernel serves every slice, so only the remainder chunk
        # retraces
        from blinky_tpu.bench.autobatch import (
            feasible_batch, posed_bytes_per_lane,
        )

        cap = feasible_batch(posed_bytes_per_lane(
            S, frames.shape[0],  # P already counts the expanded layout
            self.width_px, self.height_px,
            render_scale=int(render_scale),
            rgba=frames.dtype == np.uint32), 0)
        if B > cap:
            return np.concatenate([
                np.asarray(self.render_posed(
                    frames[..., i:i + cap], bases[i:i + cap],
                    render_scale=int(render_scale), block=block))
                for i in range(0, B, cap)
            ], axis=0)
        is_rgba = frames.dtype == np.uint32
        # keyed on a background GENERATION, not id(): a freed array's id
        # can be reused and silently hit a stale cache entry
        key = (self.lens, self.globe, scale, self.width_px,
               self.height_px, S, self.rubix_numcells, self.rubix_cell_size,
               self.rubix_pad_size, getattr(self, "_background_gen", 0),
               is_rgba, int(render_scale))
        cached = getattr(self, "_posed_cache", None)
        if cached is None or cached[0] != key:
            tables = self._ray_table_stash(scale, S)
            if not block:
                kernel = self._posed_async_kernel(
                    key, scale, S, int(render_scale), is_rgba, tables)
                if kernel is None:
                    # native build in flight: serve a geometry-correct
                    # coarse-scale preview (recursive call — its kernel
                    # caches under its own key, so repeated previews
                    # reuse it until the native kernel swaps in)
                    pk = self._posed_preview_scale(int(render_scale))
                    if pk is not None:
                        return self.render_posed(frames, bases,
                                                 render_scale=pk)
                    # no coarser valid scale: wait for the build
                    kernel = self._posed_async_join(
                        key, scale, S, int(render_scale), is_rgba, tables)
                self._posed_cache = (key, kernel)
            else:
                bg = self._posed_background(is_rgba)
                kernel = StaticRayPosedKernel(
                    self.lens, self.globe, self.width_px, self.height_px,
                    scale,
                    platesize=S, numcells=self.rubix_numcells,
                    cell_size=self.rubix_cell_size,
                    pad_size=self.rubix_pad_size,
                    background=bg, render_scale=int(render_scale),
                    ray_table=tables.get(int(render_scale)),
                    lensmap=self._reusable_static_lensmap(scale, S,
                                                          int(render_scale)),
                )
                tables[int(render_scale)] = kernel.ray_table
                self._posed_cache = (key, kernel)
        return self._posed_cache[1](frames, bases)

    @property
    def posed_pending(self) -> bool:
        """True while a ``render_posed(block=False)`` background kernel
        build is still running (previews are being served)."""
        pend = getattr(self, "_posed_async", None)
        return bool(pend is not None and pend["thread"].is_alive())

    def _posed_preview_scale(self, render_scale):
        """The coarsest valid render_scale > the requested one — the
        preview's resolution while the native table builds."""
        from blinky_tpu.kernels.posed import check_render_scale

        for k in (4, 3, 2):
            if k <= int(render_scale):
                break
            try:
                check_render_scale(self.width_px, self.height_px, k)
                return k
            except ValueError:
                continue
        return None

    def _posed_async_kernel(self, key, scale, S, render_scale, is_rgba,
                            tables):
        """Non-blocking kernel acquisition: returns the finished kernel
        when the background build for *key* has landed, else kicks the
        build (once) and returns None.  A build failure re-raises here —
        the caller sees the same exception a blocking construction would
        have raised."""
        import threading

        from blinky_tpu.kernels.static_ray import StaticRayPosedKernel

        pend = getattr(self, "_posed_async", None)
        if pend is not None and pend["key"] == key:
            if pend["thread"].is_alive():
                return None
            self._posed_async = None
            if pend.get("error") is not None:
                # count consecutive failures for this key: a host that
                # catches the error and keeps calling (the documented
                # preview-loop usage) must not re-kick a deterministic
                # ~seconds-scale failing rasterization forever
                last = getattr(self, "_posed_async_fail", None)
                n = last[1] + 1 if (last and last[0] == key) else 1
                self._posed_async_fail = (key, n, pend["error"])
                raise pend["error"]
            self._posed_async_fail = None
            kernel = pend["result"]
            tables[render_scale] = kernel.ray_table
            return kernel
        if pend is not None:
            # a build for a STALE key (lens/zoom changed mid-flight):
            # ONE async slot per session is the contract — while the
            # stale build is alive, do NOT start another (repeated
            # lens/zoom churn would otherwise pile up N concurrent
            # full-res host rasterizations); serve previews until it
            # finishes, then drop the record and kick ours
            if pend["thread"].is_alive():
                return None
            self._posed_async = None
        # give up on a key that failed repeatedly: re-raise the sticky
        # error instead of burning another background rasterization per
        # call (a key CHANGE — lens/zoom/size — resets the counter)
        last = getattr(self, "_posed_async_fail", None)
        if last is not None and last[0] == key and last[1] >= 3:
            raise last[2]
        bg = self._posed_background(is_rgba)
        lens, globe = self.lens, self.globe
        W, H = self.width_px, self.height_px
        nc, cs, ps = (self.rubix_numcells, self.rubix_cell_size,
                      self.rubix_pad_size)
        table0 = tables.get(render_scale)
        lm0 = self._reusable_static_lensmap(scale, S, render_scale)
        holder = {"key": key, "result": None, "error": None}

        def build():
            try:
                holder["result"] = StaticRayPosedKernel(
                    lens, globe, W, H, scale, platesize=S, numcells=nc,
                    cell_size=cs, pad_size=ps, background=bg,
                    render_scale=render_scale, ray_table=table0,
                    lensmap=lm0,
                )
            except BaseException as e:  # re-raised on the caller thread
                holder["error"] = e

        t = threading.Thread(target=build, name="posed-table-build",
                             daemon=True)
        holder["thread"] = t
        self._posed_async = holder
        t.start()
        return None

    def _posed_async_join(self, key, scale, S, render_scale, is_rgba,
                          tables):
        """Block until the build for *key* lands (the no-coarser-scale
        fallback) and return its kernel.  The in-flight build may be for
        a STALE key (lens/zoom changed mid-flight): join it, let
        ``_posed_async_kernel`` drop the record and kick ours, then join
        that — never two builds at once."""
        while True:
            kernel = self._posed_async_kernel(
                key, scale, S, render_scale, is_rgba, tables)
            if kernel is not None:
                return kernel
            self._posed_async["thread"].join()

    def _ray_table_stash(self, scale, platesize):
        """The session's ray-table reuse pool for the static-ray posed
        pipeline: ``{render_scale: RayTable}`` for the CURRENT (lens,
        globe, zoom, size) generation — one generation only, replaced on
        any change (tables are device-resident, ~25 MB each at 1080p;
        keeping stale generations would pin HBM).  Shared by the
        auto-scale probes and the real posed kernel so a forward-only
        lens pays its host rasterization once per (k, generation), not
        once per kernel construction.

        The generation holds the lens/globe OBJECTS (identity-eq
        dataclasses), not ``id()``s: ``_lens_cache`` is a bounded dict,
        and a freed LensDef's id can be reused by a new lens — the
        strong ref both pins the id and makes the comparison exact."""
        gen = (self.lens, self.globe, float(scale),
               self.width_px, self.height_px, platesize)
        stash = getattr(self, "_ray_tables", None)
        if stash is None or stash[0] != gen:
            stash = (gen, {})
            self._ray_tables = stash
        return stash[1]

    def _reusable_static_lensmap(self, scale, platesize, render_scale):
        """The session's already-built static lensmap, when it is usable
        as the source of a forward-lens ray table: finished (no pending
        sliced build), built FROM this lens/globe at this exact
        (scale, size, platesize) with no view rotation composed in
        (``_lensmap_meta`` — recorded at build time, NOT inferred from
        the session's current state: the pre-drag identity build is
        exactly the table the FIRST drag-look pose needs, and that drag
        has already set ``view_angles``/``_changed``), and the posed
        grid is full-resolution.  Saves the one-time host rasterization
        when a static render already paid it."""
        lm = self._lensmap
        meta = getattr(self, "_lensmap_meta", None)
        if (lm is None or meta is None or self._pending_build is not None
                or render_scale != 1
                or getattr(self, "_preview_is_partial", False)):
            return None
        if not (meta[0] is self.lens and meta[1] is self.globe and meta[2]):
            return None
        if (lm.width_px, lm.height_px, lm.platesize) != (
                self.width_px, self.height_px, platesize):
            return None
        if lm.scale != float(scale):
            return None
        return lm

    def _auto_render_scale(self, frames, bases, scale, target_fps):
        """Dynamic resolution for pose playback.

        Probes the fused pipeline (device-resident operands, min-of-2
        timings, one-element sync — PERF §6's measurement trap) at
        three points: (B=2, k=1), (B=8, k=1) and (B=2, k=max), fits

            chunk_cost(B, k) = d + B * (c + b/k²)

        (d = per-DISPATCH floor, c = per-pose fixed work, b = the
        per-index gather wall), and picks the SMALLEST valid k whose
        predicted per-pose cost at the CALLER's chunk size B sustains
        *target_fps* — native resolution when the chip holds it, the
        reference's quality<->speed axis otherwise.  Batched playback
        amortizes d over its chunk, so auto stays at finer resolution
        there than a single-pose caller gets.  Probes are cached per
        (lens, globe, size, source kind) — timings do not depend on the
        zoom value (scale is a dynamic jit argument), so f_fov changes
        reuse the calibration.  Probing builds the static-ray tables for
        k=1 and k=max; they land in the session's ray-table stash
        (``_ray_table_stash``) so the real posed kernel reuses them —
        for forward-only lenses that makes the probe's k=1 host
        rasterization the ONLY full-size one this generation pays."""
        import time

        from blinky_tpu.kernels.posed import check_render_scale
        from blinky_tpu.kernels.static_ray import StaticRayPosedKernel

        S = frames.shape[1]
        B = frames.shape[-1]
        is_rgba = frames.dtype == np.uint32
        candidates = []
        for k in (1, 2, 3, 4, 6, 8):
            try:
                check_render_scale(self.width_px, self.height_px, k)
            except ValueError:
                continue
            candidates.append(k)
        if not candidates:
            return 1
        if len(candidates) == 1:
            return candidates[0]
        key = (self.lens, self.globe, self.width_px,
               self.height_px, S, is_rgba, self.rubix_numcells,
               self.rubix_cell_size, self.rubix_pad_size,
               getattr(self, "_background_gen", 0))
        cache = getattr(self, "_auto_scale_probes", None)
        if cache is not None and cache[0] == key:
            t21, t81, t2h, k_hi = cache[1]
        else:
            import jax

            from blinky_tpu.utils.timing import device_fetch_sync

            k_hi = candidates[-1]
            bg = self._posed_background(is_rgba)
            base_f = np.ascontiguousarray(frames[..., :1])
            base_b = np.ascontiguousarray(bases[:1]).astype(np.float32)
            pf = {n: jax.device_put(np.repeat(base_f, n, axis=-1))
                  for n in (2, 8)}
            pb = {n: jax.device_put(np.repeat(base_b, n, axis=0))
                  for n in (2, 8)}

            tables = self._ray_table_stash(scale, S)

            def probe(n, k):
                kernel = StaticRayPosedKernel(
                    self.lens, self.globe, self.width_px, self.height_px,
                    scale, platesize=S, numcells=self.rubix_numcells,
                    cell_size=self.rubix_cell_size,
                    pad_size=self.rubix_pad_size, background=bg,
                    render_scale=k,
                    ray_table=tables.get(k),
                    lensmap=self._reusable_static_lensmap(scale, S, k),
                )
                tables[k] = kernel.ray_table
                best = np.inf
                device_fetch_sync(kernel(pf[n], pb[n]))  # compile + warm
                for _ in range(2):
                    t0 = time.perf_counter()
                    device_fetch_sync(kernel(pf[n], pb[n]))
                    best = min(best, time.perf_counter() - t0)
                return best  # seconds per CHUNK

            t21 = probe(2, 1)
            t81 = probe(8, 1)
            t2h = probe(2, k_hi)
            self._auto_scale_probes = (key, (t21, t81, t2h, k_hi))
        # solve d + B(c + b/k²) from the three probe points
        cb = max(0.0, (t81 - t21) / 6.0)        # c + b (per pose, k=1)
        d = max(0.0, t21 - 2.0 * cb)            # per-dispatch floor
        b = max(0.0, (t21 - t2h) / (2.0 * (1.0 - 1.0 / (k_hi * k_hi))))
        b = min(b, cb)
        c = cb - b
        budget = 1.0 / target_fps if target_fps > 0 else np.inf
        for k in candidates:
            if d / B + c + b / (k * k) <= budget:
                return k
        return candidates[-1]

    def _posed_background(self, is_rgba):
        """The pose-playback background: session background (or zeros),
        RGBA-decoded through the session palette for u32 sources.  One
        recipe for the fused kernel and the forward fallback."""
        bg = self._background
        if bg is None:
            bg = np.zeros((self.height_px, self.width_px), np.uint8)
        if is_rgba:
            from blinky_tpu.kernels.remap import frames_to_rgba

            bg = np.asarray(frames_to_rgba(bg, self.palette))
        return bg

    def _render_posed_exact(self, frames, bases, scale, k):
        """Pose playback on the per-pose exact host path
        (``render_posed(exact=True)``): one float64 host build per pose —
        forward scan-order rasterization for forward-only lenses, the
        exact inverse builder otherwise — + per-frame remap.

        Each pose composes its view basis into the build
        (``view_basis=...``, the same table a static ``setviewangles``
        render uses), so the result for pose ``b`` is bit-identical to
        rendering frame ``b`` at those angles — *when the session rubix
        state matches the source expansion*: like the fused device
        paths, rubix rides the SOURCE on posed renders (expanded
        raw||tinted layout = tinted, raw = untinted; the session
        ``f_rubix`` flag is not consulted), whereas a static
        :meth:`render` call applies the session flag.  Pinned in
        ``tests/test_posed.py``.  ``render_scale`` k builds the table at
        1/k resolution and nearest-upsamples under the upsampled
        validity mask, like the fused device path.  Host-build-bound;
        the default static-ray path serves every lens on device.
        """
        from blinky_tpu.kernels.posed import check_render_scale

        check_render_scale(self.width_px, self.height_px, k)
        W, H = self.width_px // k, self.height_px // k
        # host-build-bound path: pull a device-resident source ONCE here
        # (per-pose slices of a device array would transfer per pose)
        frames = np.asarray(frames)
        S = frames.shape[1]
        expanded = frames.shape[0] == 2 * MAX_PLATES
        is_rgba = frames.dtype == np.uint32
        bg = self._posed_background(is_rgba)
        out_dtype = np.uint32 if is_rgba else np.uint8
        outs = np.empty((len(bases), self.height_px, self.width_px),
                        out_dtype)
        zero_bg = np.zeros((H, W), np.uint8)
        for b, basis in enumerate(np.asarray(bases, np.float64)):
            lm = build_lensmap(
                self.lens, self.globe, scale * k, W, H, S,
                numcells=self.rubix_numcells,
                cell_size=self.rubix_cell_size,
                pad_size=self.rubix_pad_size,
                backend="numpy",
                view_basis=(basis[0], basis[1], basis[2]),
            )
            kern = RemapKernel(lm, self.palette, zero_bg)
            out = np.asarray(kern(frames[..., b], rubix=expanded))
            valid = np.asarray(lm.valid)
            if k > 1:
                out = out.repeat(k, axis=0).repeat(k, axis=1)
                valid = valid.repeat(k, axis=0).repeat(k, axis=1)
            outs[b] = np.where(valid, out, bg)
        return outs

    def render_aa(self, frames, factor: int = 2, rubix: Optional[bool] = None):
        """Supersampled (anti-aliased) true-color rendering.

        Renders through a lensmap built at ``factor``× the session size
        and box-averages back down on device — an extension: the
        reference's software renderer is aliased by nature (one palette
        index per pixel), but true-color output can resolve the lens
        distortions' edge aliasing properly.

        ``frames``: u8 palette plates (decoded via the session palette),
        packed-RGBA u32 plates, or either one's expanded raw||tinted
        layout for rubix.  Returns [H, W(, B)] packed-RGBA uint32.

        The hi-res session mirrors this session's state (config replay +
        view angles); its lensmap build is cached per (state, factor).
        Measured on v5e: 204 ms warm for one 1280x720 frame at factor 2
        (batch lanes amortize the gather like every remap; first compile
        at a new hi-res shape is minutes, then persistently cached).
        """
        from blinky_tpu.kernels.remap import downsample_rgba, frames_to_rgba

        factor = int(factor)
        if factor < 1:
            raise ValueError("factor must be >= 1")
        frames = np.asarray(frames)
        if frames.dtype != np.uint32:
            frames = frames_to_rgba(frames, self.palette)
        rubix = self.rubix_enabled if rubix is None else bool(rubix)
        if rubix and frames.shape[0] != 2 * MAX_PLATES:
            raise ValueError(
                "rubix AA needs the expanded raw||tinted layout "
                "(expand_frames_tinted[_rgba])")

        S = int(frames.shape[1])  # the frames' actual plate size (render
        # syncs self.platesize from it lazily; key on S so differing
        # sources get their own hi-res session instead of thrashing one)
        state = (self.config_str(), self.view_angles, self.width_px,
                 self.height_px, S,
                 getattr(self, "_palette_gen", 0),
                 getattr(self, "_background_gen", 0), factor)
        cache = getattr(self, "_aa_cache", None)
        if not isinstance(cache, dict):
            cache = self._aa_cache = {}
        hi_sess = cache.get(state)
        if hi_sess is None:
            hi_sess = Session(self.width_px * factor, self.height_px * factor,
                              platesize=S, palette=self.palette,
                              lens_dirs=self.lens_dirs,
                              globe_dirs=self.globe_dirs,
                              backend=self.backend)
            for line in self.config_str().splitlines():
                hi_sess.cmd(line)
            if self.view_angles is not None:
                hi_sess.cmd("setviewangles %s %s %s" % self.view_angles)
            if self._background is not None:
                # Nearest-neighbor upscale: each source background pixel
                # covers a factor x factor block, so the box downsample
                # hands it back unchanged where the lens leaves gaps.
                hi_sess.set_background(np.repeat(
                    np.repeat(self._background, factor, 0), factor, 1))
            while len(cache) >= 4:  # hi-res sessions hold big tables
                cache.pop(next(iter(cache)))
            cache[state] = hi_sess
        hi = hi_sess.render(frames, rubix=rubix)
        if getattr(hi, "dtype", None) != np.uint32:
            hi = frames_to_rgba(np.asarray(hi), self.palette)  # background
        return downsample_rgba(hi, factor) if factor > 1 else hi

    def render_equirect(self, panos, bilinear: bool = True,
                        mode: str = "compact"):
        """Warp equirectangular panoramas end-to-end on the device.

        ``panos``: [H, W, B] packed-RGBA uint32 (batch-innermost), one
        [H, W] u32 pano, or one [H, W, 3] u8 RGB pano.  Resamples to the
        current globe's plates at the session platesize and remaps
        through the current lens.  Returns [H_out, W_out, B] u32 (or
        [H_out, W_out] for a single pano).  Prefer B a multiple of 128:
        the batch axis is the gathered rows' minor dim and partial
        128-lane tiles cost up to ~15x (docs/PERF.md §9).

        ``mode`` picks the pipeline formulation — all three are pinned
        bit-equal (tests/test_equirect_fused.py); throughput measured at
        4096x2048 -> 720p, B=128 bilinear (docs/PERF.md §9, round 4):

        * ``"compact"`` (default): texel-compacted two-stage — resample
          ONLY the sorted unique texels the lensmap references, then the
          compacted remap (:class:`~blinky_tpu.kernels.ingest.
          CompactEquirectChain`, **2880 panos/s**).
        * ``"fused"``: the ingest's K-tap tables composed THROUGH the
          lensmap — ONE gather+blend, no faces intermediate
          (:class:`~blinky_tpu.kernels.ingest.EquirectScreenKernel`,
          2102 panos/s: composition loses to compact's sorted gathers
          on this chip, kept for single-stage pipelines).
        * ``"faces"``: full two-stage via the materialized
          ``[P, S, S, B]`` faces (1390 panos/s) — feeds SEVERAL lenses
          from one ingest, and services ``f_saveglobe``.

        compact/fused step aside to "faces" automatically whenever the
        materialized faces are semantically needed: fisheye off, invalid
        lens, a pending ``f_saveglobe`` (which captures the ingested
        faces), or a pending time-sliced exact build (the preview
        lensmap changes under the composition every slice).
        """
        from blinky_tpu.kernels.ingest import (
            CompactEquirectChain, EquirectIngest, EquirectScreenKernel,
        )
        from blinky_tpu.kernels.remap import pack_rgba

        if mode not in ("compact", "fused", "faces"):
            raise ValueError(f"mode must be compact|fused|faces, got {mode!r}")

        squeeze = False
        if getattr(panos, "ndim", 0) == 3 and panos.shape[2] == 3 and (
                np.asarray(panos).dtype == np.uint8):
            panos = pack_rgba(np.asarray(panos))
        if getattr(panos, "ndim", 0) == 2:
            panos = np.asarray(panos, np.uint32)[..., None]
            squeeze = True
        key = (tuple(panos.shape[:2]), self.platesize, self.globe,
               bool(bilinear))
        cached = getattr(self, "_equirect_cache", None)
        if cached is None or cached[0] != key:
            kern = EquirectIngest(panos.shape[0], panos.shape[1],
                                  self.platesize, globe=self.globe,
                                  bilinear=bilinear)
            self._equirect_cache = (key, kern)
        ingest = self._equirect_cache[1]

        if (mode != "faces" and self.fisheye_enabled
                and self.save_request is None):
            # same rebuild sequence render() runs before gathering — but
            # NOT the time-slice advance: with a build pending this falls
            # through to the faces path, whose render() call advances the
            # one budget slice (advancing here too would double the
            # per-frame blocking and build a kernel from a preview table
            # the next slice immediately invalidates)
            if self._changed or self._lensmap is None:
                self._rebuild()
            if (self._lensmap is not None and self._pending_build is None
                    and self._kernel is None):
                self._kernel = RemapKernel(self._lensmap, self.palette,
                                           self._background)
            if (self._kernel is not None and self._pending_build is None
                    and self._lensmap.platesize == self.platesize):
                fkey = (key, bool(bilinear), mode)
                # a small dict, not a single slot: alternating
                # compact/fused (mode comparisons, a faces caller in
                # between) keeps BOTH composed chains warm instead of
                # re-running compact_texels + table re-upload per switch.
                # Validity includes the RemapKernel IDENTITY (held
                # strongly, so `is` cannot alias a freed object): any
                # lens/zoom/background/palette change makes a new kernel,
                # and stale-kernel entries are dropped so dead
                # generations can't pin device tables
                fcache = getattr(self, "_equirect_fused", None)
                if fcache is None:
                    fcache = {}
                    self._equirect_fused = fcache
                ent = fcache.get(fkey)
                if ent is None or ent[1] is not self._kernel:
                    for k in [k for k, v in fcache.items()
                              if v[1] is not self._kernel]:
                        fcache.pop(k)
                    while len(fcache) >= 4:  # composed tables are
                        # device-resident — bound the live generation too
                        fcache.pop(next(iter(fcache)))
                    cls = (CompactEquirectChain if mode == "compact"
                           else EquirectScreenKernel)
                    ent = (cls(ingest, self._kernel), self._kernel)
                    fcache[fkey] = ent
                out = np.asarray(ent[0](panos, rubix=self.rubix_enabled))
                return out[..., 0] if squeeze else out

        faces = ingest(panos)  # device [P, S, S, B] u32
        # rubix on the u32 faces: the remap kernel tints AFTER the gather
        # (post-gather path) — no on-device source expansion, so the
        # face batch needs half the HBM it used to
        out = self.render(faces)
        if out.dtype != np.uint32:
            # disabled/invalid-lens fallback returns the u8 palette
            # background; decode so the documented u32 contract holds
            from blinky_tpu.kernels.remap import frames_to_rgba

            out = frames_to_rgba(np.asarray(out), self.palette)
        return out[..., 0] if squeeze else out

    def _background_screen(self, frames):
        bg = self._background
        if bg is None:
            bg = np.zeros((self.height_px, self.width_px), np.uint8)
        if frames.ndim == 4:
            return np.broadcast_to(bg[..., None], bg.shape + (frames.shape[-1],))
        return bg

    def _plain_view_lensmap(self):
        """Lensmap reconstructing the normal (fisheye-off) rectilinear
        view at the ``fov`` cvar from the current globe's plates —
        kernel-free so the host render path never touches the device."""
        if not self.globe_valid:
            return None
        key = (self.fov, self.width_px, self.height_px, self.platesize,
               self.globe_name, self.view_angles,
               self._resolved_backend())
        cached = getattr(self, "_plain_lm_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        try:
            lens = lenses_mod.get("rectilinear", self.globe)
            scale = calc_scale(Zoom("fov", self.fov), lens, self.width_px, self.height_px)
            lm = build_lensmap(
                lens, self.globe, scale, self.width_px, self.height_px,
                self.platesize, backend=self._resolved_backend(),
                view_basis=self._view_basis(),
            )
        except Exception as e:
            self._print(f"plain view unavailable: {e}")
            return None
        self._plain_lm_cache = (key, lm)
        return lm

    def _plain_view_kernel(self):
        """Remap kernel over :meth:`_plain_view_lensmap`."""
        lm = self._plain_view_lensmap()
        if lm is None:
            return None
        key = self._plain_lm_cache[0]
        if self._plain_cache is not None and self._plain_cache[0] == key:
            return self._plain_cache[1]
        kernel = RemapKernel(lm, self.palette, self._background)
        self._plain_cache = (key, kernel)
        return kernel

    # ------------------------------------------------------------- config
    def config_str(self) -> str:
        """``Host_WriteConfiguration`` (``NQ/host.c:272-291``): key binds
        (``Key_WriteBindings`` — which leads with ``unbindall`` so a
        replay starts clean, ``keys.c:715-724``) then cvars then the
        fisheye state block (``F_WriteConfig``, ``fisheye.c:683-696``).
        Aliases are written too — an extension (the reference loses
        them on restart)."""
        lines = ["unbindall"]
        lines += [f'bind "{k}" "{v}"' for k, v in self.bindings.items()]
        lines += [f'alias "{n}" "{v}"' for n, v in self.aliases.items()]
        lines += [
            f"fov {self.fov:g}",
            f"fisheye {int(self.fisheye_enabled)}",
            f'f_lens "{self.lens_name}"',
            f'f_globe "{self.globe_name}"',
            f"f_rubixgrid {self.rubix_numcells} {self.rubix_cell_size:f} {self.rubix_pad_size:f}",
        ]
        zc = self.zoom.command()
        if zc:
            lines.append(zc)
        return "\n".join(lines) + "\n"

    def write_config(self, path) -> None:
        Path(path).write_text(self.config_str())

    def exec_config(self, path) -> None:
        for line in Path(path).read_text().splitlines():
            line = line.strip()
            if line and not line.startswith("//"):
                self.cmd(line)

    # -------------------------------------------------------- completion
    def complete_lens(self, prefix: str = "") -> list:
        """Tab-completion analog (``cmdarg_lens`` -> ``COM_ScanDir``,
        ``fisheye.c:1106-1118``): built-ins plus user script dirs."""
        names = set(lenses_mod.names())
        for d in self.lens_dirs:
            names.update(p.stem for p in d.glob("*.py"))
            names.update(p.stem for p in d.glob("*.lua"))
        return sorted(n for n in names if n.startswith(prefix))

    def complete_globe(self, prefix: str = "") -> list:
        names = set(globes_mod.names())
        for d in self.globe_dirs:
            names.update(p.stem for p in d.glob("*.py"))
            names.update(p.stem for p in d.glob("*.lua"))
        return sorted(n for n in names if n.startswith(prefix))
