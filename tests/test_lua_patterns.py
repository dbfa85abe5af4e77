"""Lua 5.2 pattern matching (string.find/match/gmatch/gsub).

The reference embeds real liblua (``fisheye.c:278-280``), so user lens
scripts can use the full pattern library.  Expected values below are the
documented Lua 5.2 results (manual 6.4.1) — each case was derived from
the liblua `lstrlib.c` semantics the module ports.
"""

import pytest

from blinky_tpu import lua_patterns as lp
from blinky_tpu.minilua import LuaError, run_script


def run(src):
    return run_script(src, is_path=False)


def srepl(r):
    return lambda whole, caps: lp.expand_repl(r, whole, caps, str)


# ------------------------------------------------------------ engine level


@pytest.mark.parametrize("s,p,want", [
    ("hello world", "o w", (5, 7, [])),
    ("hello", "l+", (3, 4, [])),
    ("hello", "(l+)(o)", (3, 5, ["ll", "o"])),
    ("abc", "^b", None),
    ("abc", "x", None),
])
def test_find(s, p, want):
    assert lp.find(s, p) == want


def test_find_init_and_plain():
    assert lp.find("hello world", "o", 6) == (8, 8, [])
    assert lp.find("hello", "l", -2) == (4, 4, [])
    assert lp.find("a.b", ".", 1, True) == (2, 2, [])  # plain: literal dot
    assert lp.find("a.b", ".") == (1, 1, [])           # pattern: any char
    assert lp.find("abc", "b", 99) is None              # init past the end
    assert lp.find("abc", "", 4) == (4, 3, [])          # empty match at end


@pytest.mark.parametrize("s,p,want", [
    ("  key = value  ", "^%s*(%w+)%s*=%s*(%w+)", ["key", "value"]),
    ("hello", "()ll()", [3.0, 5.0]),                 # position captures
    ("abc", "^a", ["a"]),
    ("ab", "b$", ["b"]),
    ("abc", "b$", None),
    ("(foo(bar))baz", "%b()", ["(foo(bar))"]),       # balanced
    ("ab", "(a)%1", None),                           # back-reference
    ("aa", "(a)%1", ["a"]),
    ("THE big", "%f[%l]%a+", ["big"]),               # frontier
    ("  trim  ", "^%s*(.-)%s*$", ["trim"]),          # lazy quantifier
    ("hello", "h(.)(.)", ["e", "l"]),
    ("-5", "[%-+]?%d", ["-5"]),                      # set with escape
    ("hat", "[^abc]a[t]", ["hat"]),                  # complement set
    ("abc123", "%a*%d*", ["abc123"]),
    ("", "x*", [""]),
    ("deadbeef99", "%x+", ["deadbeef99"]),
    ("word", "%u", None),
    ("Word", "%u", ["W"]),
    ("a+b", "%+", ["+"]),                            # escaped literal
    ("[]", "%[%]", ["[]"]),
    ("abc", "a(b)?c", None),   # '?' after ')' is a literal '?' in Lua
    ("abc", "a-", [""]),       # lazy matches empty first
    ("x129y", "%d+", ["129"]),
])
def test_match(s, p, want):
    assert lp.match(s, p) == want


def test_gmatch():
    assert [c[0] for c in lp.gmatch("one two three", "%a+")] == [
        "one", "two", "three"]
    assert list(lp.gmatch("k1=v1,k2=v2", "(%w+)=(%w+)")) == [
        ["k1", "v1"], ["k2", "v2"]]
    # liblua 5.2's empty-match advancement: yields between delimiters too
    assert [c[0] for c in lp.gmatch("a,b,,c", "([^,]*)")] == [
        "a", "", "b", "", "", "c", ""]
    # '^' is NOT an anchor in gmatch (it is a literal there)
    assert [c[0] for c in lp.gmatch("a^b", "%^")] == ["^"]


def test_gsub():
    assert lp.gsub("hello world", "o", srepl("0")) == ("hell0 w0rld", 2.0)
    assert lp.gsub("hello world", "o", srepl("0"), 1) == ("hell0 world", 1.0)
    assert lp.gsub("abc", "", srepl("-")) == ("-a-b-c-", 4.0)
    assert lp.gsub("x=1, y=2", "(%w+)=(%w+)", srepl("%2=%1")) == (
        "1=x, 2=y", 2.0)
    assert lp.gsub("abc", "%w", srepl("%0%0")) == ("aabbcc", 3.0)
    # a None replacement keeps the original match text
    assert lp.gsub("hello world", "%w+", lambda w, c: None) == (
        "hello world", 2.0)
    # anchored gsub replaces at most the leading match
    assert lp.gsub("aaa", "^a", srepl("b")) == ("baa", 1.0)


@pytest.mark.parametrize("p,needle", [
    ("%", "ends with '%'"),
    ("[ab", "missing ']'"),
    ("(a", "unfinished capture"),
    (")", "invalid pattern capture"),
    ("%b", "missing arguments to '%b'"),
    ("%f%a", "missing '[' after '%f'"),
    ("(a)%2", "invalid capture index"),
])
def test_malformed_patterns(p, needle):
    import re

    with pytest.raises(lp.PatternError, match=re.escape(needle)):
        lp.match("abcabc", p)


def test_backtracking_is_step_bounded():
    """Pathological backtracking must raise, never hang (the sandbox's
    fuel contract, like Interpreter.FUEL)."""
    s = "a" * 120
    p = "a*a*a*a*a*a*a*a*a*a*b"
    with pytest.raises(lp.PatternError, match="budget|too complex"):
        lp.match(s, p)


# ------------------------------------------------------------ script level


def test_patterns_from_script():
    it = run('''
s = "f_fov 110; f_rubix on"
a, b = string.find(s, "f_fov (%d+)")
cap = string.match(s, "f_fov (%d+)")
parts = {}
for w in string.gmatch(s, "%a+_?%a*") do parts[#parts + 1] = w end
r, n = string.gsub(s, "f_(%a+)", "F_%1")
up = string.gsub("abc", "%a", function(c) return string.upper(c) end)
t = {on = "ON"}
tv = string.gsub("rubix on", "on", t)
m3 = ("hello"):match("l+")
k, v = string.match("x=1", "(%w+)=(%w+)")
''')
    g = it.get_global
    assert (g("a"), g("b")) == (1.0, 9.0)
    assert g("cap") == "110"
    assert g("parts").array() == ["f_fov", "f_rubix", "on"]
    assert (g("r"), g("n")) == ("F_fov 110; F_rubix on", 2.0)
    assert g("up") == "ABC"
    assert g("tv") == "rubix ON"
    assert g("m3") == "ll"
    assert (g("k"), g("v")) == ("x", "1")


def test_script_errors_are_pcallable():
    it = run('''
ok, err = pcall(function() return string.match("x", "%") end)
ok2, err2 = pcall(function() return string.gsub("x", "x", true) end)
''')
    assert it.get_global("ok") is False
    assert "malformed pattern" in it.get_global("err")
    assert it.get_global("ok2") is False


def test_gsub_number_replacement_and_counts():
    it = run('out, n = string.gsub("a b c", "%s", "_")')
    assert it.get_global("out") == "a_b_c"
    assert it.get_global("n") == 2.0


def test_vector_path_falls_back_not_errors():
    """A lane-varying value reaching a string function must raise
    Unvectorizable (-> the bridge's scalar fallback), never a script
    error the scalar path wouldn't raise."""
    import numpy as np

    from blinky_tpu.lua_vector import Unvectorizable, VectorInterpreter

    it = VectorInterpreter()
    it.run('function f(x) return #string.format("%d", x) + x end')
    f = it.get_global("f")
    # uniform scalar: fine on the vector engine too
    vals, nil = it.vcall(f, [3.0])
    assert vals[0] == 4.0
    # lane array: scalar authority
    with pytest.raises(Unvectorizable):
        it.vcall(f, [np.array([1.0, 22.0])])


def test_lua_bridge_scalar_fallback_with_patterns(tmp_path):
    """End to end: a .lua lens whose math routes through a string
    function still builds (per-element scalar fallback)."""
    import numpy as np

    from blinky_tpu.lua_bridge import load_lua_lens

    src = '''
max_fov = 360
max_vfov = 180
lens_width = 2
lens_height = 2
function lens_inverse(x, y)
  -- contrived: digit count of the scaled coordinate via a pattern
  local n = #string.match(string.format("%d", 100 + 10 * x * x), "%d+")
  return x, y, n - 2
end
'''
    path = tmp_path / "patlens.lua"
    path.write_text(src)
    lens = load_lua_lens(path)
    xs = np.array([0.0, 0.5, -0.5])
    ys = np.array([0.0, 0.1, 0.2])
    vx, vy, vz, ok = lens.inverse(xs, ys)
    assert np.allclose(vx, xs) and np.allclose(vy, ys)
    assert np.allclose(vz, [1.0, 1.0, 1.0])  # 100-999 -> 3 digits
    assert ok.all()


def test_gmatch_lazy_pattern_error_is_pcallable():
    """Code review (late r3): the malformed-pattern error fires at the
    first ITERATION (gmatch is lazy) — it must still be a LuaError the
    script can pcall, never a raw PatternError escaping the sandbox."""
    it = run('''
ok, err = pcall(function()
  for w in string.gmatch("abc", "(") do end
end)
''')
    assert it.get_global("ok") is False
    assert "unfinished capture" in it.get_global("err")


def test_explicit_nil_init_is_default():
    """liblua's luaL_optinteger: string.find(s, p, nil, true) treats the
    nil init as 1 (the common plain-find idiom)."""
    it = run('''
a, b = string.find("hello.world", ".", nil, true)
m = string.match("xy", "y", nil)
''')
    assert (it.get_global("a"), it.get_global("b")) == (6.0, 6.0)
    assert it.get_global("m") == "y"
