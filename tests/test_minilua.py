"""Language-semantics tests for the mini-Lua interpreter.

The integration suite (test_lua_bridge.py) checks all 37 shipped scripts
end-to-end; these pin the interpreter's Lua 5.2 semantics directly —
the constructs the scripts rely on plus their edge cases.
"""

import math

import pytest

from blinky_tpu.minilua import Interpreter, LuaError, run_script


def run(src, builtins=None):
    return run_script(src, builtins=builtins, is_path=False)


def g(src, name, builtins=None):
    return run(src, builtins).get_global(name)


def test_arithmetic_and_precedence():
    assert g("x = 2 + 3 * 4", "x") == 14
    assert g("x = (2 + 3) * 4", "x") == 20
    assert g("x = 2 ^ 3 ^ 2", "x") == 512  # right-assoc
    assert g("x = -2 ^ 2", "x") == -4  # unary binds looser than ^
    assert g("x = 2 ^ -1", "x") == 0.5
    assert g("x = -2 * 3", "x") == -6
    assert g("x = 7 % 3", "x") == 1
    assert g("x = -7 % 3", "x") == 2  # Lua %: floored, sign of divisor
    assert g("x = 1/2 + 1/2", "x") == 1.0


def test_comparisons_and_truthiness():
    # only nil and false are falsy — 0 is TRUE in Lua
    assert g("if 0 then x = 'zero-true' else x = 'zero-false' end", "x") == "zero-true"
    assert g("x = 1 < 2 and 'a' or 'b'", "x") == "a"
    assert g("x = nil == false", "x") is False  # nil ~= false in Lua
    assert g("x = not nil", "x") is True
    assert g("y = nil; x = y == nil", "x") is True


def test_and_or_return_values():
    assert g("x = nil or 5", "x") == 5
    assert g("x = false and 5", "x") is False
    assert g("x = 3 and 4", "x") == 4
    assert g("x = nil and 4", "x") is None


def test_multiple_assignment_and_returns():
    src = """
function two() return 1, 2 end
a, b = two()
c, d, e = two()        -- e padded with nil
f = two()              -- truncated to first
s, t = two(), 9        -- non-last call truncated to one value
"""
    it = run(src)
    assert (it.get_global("a"), it.get_global("b")) == (1, 2)
    assert it.get_global("e") is None
    assert it.get_global("f") == 1
    assert (it.get_global("s"), it.get_global("t")) == (1, 9)


def test_parens_truncate_multiple_returns():
    src = "function two() return 1, 2 end\na, b = (two())"
    it = run(src)
    assert it.get_global("a") == 1 and it.get_global("b") is None


def test_tables_and_length():
    src = """
t = {10, 20, 30}
t[4] = 40
n = #t
u = { {1,2}, {3,4} }
v = u[2][1]
w = {x = 5, [2+1] = 7}
a = w.x
b = w[3]
"""
    it = run(src)
    assert it.get_global("n") == 4
    assert it.get_global("v") == 3
    assert it.get_global("a") == 5 and it.get_global("b") == 7


def test_loops_and_break():
    src = """
s = 0
for i = 1, 5 do s = s + i end
p = 1
i = 0
while true do
  i = i + 1
  if i >= 3 then break end
end
r = 0
repeat r = r + 1 until r >= 4
"""
    it = run(src)
    assert it.get_global("s") == 15
    assert it.get_global("i") == 3
    assert it.get_global("r") == 4


def test_repeat_until_sees_body_locals():
    src = """
n = 0
repeat
  local done = n >= 2
  n = n + 1
until done
"""
    assert g(src, "n") == 3


def test_scoping_and_closures():
    src = """
x = 1
function f()
  local x = 2
  return x
end
a = f()
b = x
function counter()
  local n = 0
  return function() n = n + 1 return n end
end
c = counter()
d = c()
e = c()
"""
    it = run(src)
    assert it.get_global("a") == 2 and it.get_global("b") == 1
    assert (it.get_global("d"), it.get_global("e")) == (1, 2)


def test_math_library_is_libm_semantics():
    # domain errors yield NaN / -inf like C libm, not exceptions
    assert math.isnan(g("x = acos(2)", "x"))
    assert g("x = log(0)", "x") == -math.inf
    assert math.isnan(g("x = sqrt(-1)", "x"))
    assert math.isnan(g("x = (-2) ^ 0.5", "x"))  # C pow domain error
    assert g("x = 1/0", "x") == math.inf
    assert g("x = -1/0", "x") == -math.inf
    assert math.isnan(g("x = 0/0", "x"))
    i, f = g("a, b = math.modf(3.7)\nx = {a, b}", "x").array()
    assert i == 3.0 and abs(f - 0.7) < 1e-12
    i, f = g("a, b = math.modf(-3.7)\nx = {a, b}", "x").array()
    assert i == -3.0 and abs(f + 0.7) < 1e-12  # toward zero, like C modf
    assert g("x = math.max(table.unpack({3, 9, 4}))", "x") == 9


def test_alias_globals_preloaded():
    # init_lua's alias block (fisheye.c:1231-1248)
    it = run("x = cos(0) + sin(0)\ny = pi\nz = tau\nw = pow(2, 10)")
    assert it.get_global("x") == 1.0
    assert it.get_global("y") == math.pi
    assert it.get_global("z") == 2 * math.pi
    assert it.get_global("w") == 1024


def test_print_captured():
    it = run("print(42)\nprint('a', 1)")
    assert it.printed == ["42.0", "a\t1.0"] or it.printed == ["42", "a\t1"]


def test_builtins_injected_and_nil_protocol():
    def host(a, b):
        if a < 0:
            return None  # nil
        return a + b, a - b

    it = run("p, q = f(3, 1)\nr = f(-1, 0)", builtins={"f": host})
    assert (it.get_global("p"), it.get_global("q")) == (4, 2)
    assert it.get_global("r") is None


def test_errors_are_lua_errors_with_lines():
    with pytest.raises(LuaError, match="line 2"):
        run("x = 1\ny = @")
    with pytest.raises(LuaError, match="malformed number"):
        run("x = 3e")
    with pytest.raises(LuaError, match="unterminated string"):
        run('x = "abc')
    with pytest.raises(LuaError):
        run("x = y.z")  # indexing a nil value
    with pytest.raises(LuaError):
        run("x = 1 + nil")


def test_comments():
    src = """
-- line comment
x = 1 -- trailing
--[[ block
comment with x = 99
--]]
y = 2
"""
    it = run(src)
    assert it.get_global("x") == 1 and it.get_global("y") == 2


def test_session_reports_bad_lua_script(tmp_path):
    from blinky_tpu.api import Session

    (tmp_path / "broken.lua").write_text("function lens_inverse(x, y\nreturn x end")
    sess = Session(32, 24, lens_dirs=[tmp_path])
    sess.cmd("f_lens broken")
    assert any("could not load lens" in m for m in sess.console)
    assert not sess.lens_valid or sess.lens_name != "broken"


def test_runaway_scripts_are_bounded():
    """A bad user script must not hang the session (the viewer is
    single-threaded): the interpreter carries a per-entry instruction
    budget."""
    import pytest

    from blinky_tpu.minilua import Interpreter, LuaError

    for src in ("while true do end",
                "repeat until false",
                "x = 0\nwhile true do x = x + 1 end",
                "function f() return f() end\nf()"):
        it = Interpreter()
        with pytest.raises((LuaError, RecursionError)):
            it.run(src)
    # the budget resets per host call: many small calls never trip it
    it = Interpreter()
    it.run("function inc(x) return x + 1 end")
    fn = it.get_global("inc")
    for i in range(1000):
        assert it.call(fn, [i]) == [i + 1]


def test_pow_and_division_match_c99():
    """Lua's ^ and / are C pow and IEEE double division; pin the edge
    cases directly against glibc (the fuzz suite found Python's ** and
    ZeroDivisionError mappings diverging)."""
    import ctypes
    import math

    from blinky_tpu.minilua import Interpreter

    libm = ctypes.CDLL("libm.so.6")
    libm.pow.restype = ctypes.c_double
    libm.pow.argtypes = [ctypes.c_double, ctypes.c_double]

    it = Interpreter()
    it.run("function p(a, b) return a ^ b end\n"
           "function d(a, b) return a / b end")
    p, d = it.get_global("p"), it.get_global("d")

    cases = [(0.0, -1.0), (0.0, -2.0), (-0.0, -3.0), (0.0, -math.inf),
             (-0.04, -803.6), (-2.0, 1001.0), (2.0, 1e308), (-2.0, 0.5),
             (1.0, math.nan), (math.nan, 0.0), (-1.0, math.inf)]
    for a, b in cases:
        want = libm.pow(a, b)
        got = it.call(p, [a, b])[0]
        assert got == want or (math.isnan(got) and math.isnan(want)), \
            (a, b, got, want)

    for a, b, want in [(1.0, -0.0, -math.inf), (1.0, 0.0, math.inf),
                       (-1.0, -0.0, math.inf), (0.0, 0.0, math.nan),
                       (math.nan, 0.0, math.nan)]:
        got = it.call(d, [a, b])[0]
        assert got == want or (math.isnan(got) and math.isnan(want)), \
            (a, b, got, want)
