"""Property fuzz for the vectorized Lua evaluator: randomly generated
programs exercising the masked-control-flow machinery must be
lane-for-lane bit-equal to the scalar interpreter, or cleanly raise
``Unvectorizable`` (never silently diverge, never crash with anything
else).  This is the repo's contract for `.lua` drop-ins
(`blinky_tpu/lua_vector.py`; CLAUDE.md "bit-equality vs the SCALAR
interpreter is the contract").

Tiers (VERDICT r2 task 4):
- default: 100 generated seeds + the committed regression corpus in
  ``tests/lua_fuzz_corpus/`` (one file per program class that found an
  evaluator bug in round 2);
- deep soak: ``BLINKY_LUA_FUZZ_SEEDS=5000 pytest tests/test_lua_vector_fuzz.py``
  (or any count) reproduces the 20k-program/0-divergence claim from
  BASELINE.md at full scale."""

import os
from pathlib import Path

import numpy as np
import pytest

from blinky_tpu.lua_vector import Unvectorizable, VectorInterpreter
from blinky_tpu.minilua import Interpreter, LuaError

FUZZ_SEEDS = int(os.environ.get("BLINKY_LUA_FUZZ_SEEDS", "100"))
CORPUS_DIR = Path(__file__).parent / "lua_fuzz_corpus"


class _Gen:
    """A tiny random-program generator over the numeric mini-Lua subset
    the lens scripts use: arithmetic, math builtins, comparisons,
    if/elseif chains with returns (incl. nil), bounded loops with
    data-dependent breaks, helper calls, partial assignment + nil
    checks."""

    UNARY = ["math.sin", "math.cos", "math.sqrt", "math.abs", "math.exp",
             "math.atan", "math.floor", "math.tanh"]
    BINARY = ["+", "-", "*", "/", "%", "^"]
    CMP = ["<", ">", "<=", ">=", "==", "~="]

    def __init__(self, rng):
        self.r = rng

    def const(self):
        return f"{self.r.uniform(-3, 3):.4f}"

    def expr(self, vars_, depth=0):
        roll = self.r.random()
        if depth > 2 or roll < 0.25:
            return self.r.choice(vars_) if self.r.random() < 0.7 else self.const()
        if roll < 0.5:
            return (f"{self.r.choice(self.UNARY)}"
                    f"({self.expr(vars_, depth + 1)})")
        if roll < 0.6:
            return (f"math.{self.r.choice(['max', 'min'])}"
                    f"({self.expr(vars_, depth + 1)}, {self.expr(vars_, depth + 1)})")
        op = self.r.choice(self.BINARY)
        return f"({self.expr(vars_, depth + 1)} {op} {self.expr(vars_, depth + 1)})"

    def cond(self, vars_):
        c = (f"{self.expr(vars_)} {self.r.choice(self.CMP)} "
             f"{self.expr(vars_)}")
        if self.r.random() < 0.3:
            c2 = (f"{self.expr(vars_)} {self.r.choice(self.CMP)} "
                  f"{self.expr(vars_)}")
            c = f"({c}) {self.r.choice(['and', 'or'])} ({c2})"
        return c

    def block(self, vars_, indent, depth, allow_return=True):
        lines = []
        n = self.r.integers(1, 4)
        local_vars = list(vars_)
        for _ in range(n):
            roll = self.r.random()
            pad = "  " * indent
            if roll < 0.35:
                name = f"v{self.r.integers(0, 6)}"
                lines.append(f"{pad}local {name} = {self.expr(local_vars)}")
                if name not in local_vars:
                    local_vars.append(name)
            elif roll < 0.55 and depth < 2:
                arms = [f"{pad}if {self.cond(local_vars)} then"]
                arms.append(self.block(local_vars, indent + 1, depth + 1))
                if self.r.random() < 0.5:
                    arms.append(f"{pad}elseif {self.cond(local_vars)} then")
                    arms.append(self.block(local_vars, indent + 1, depth + 1))
                if self.r.random() < 0.6:
                    arms.append(f"{pad}else")
                    arms.append(self.block(local_vars, indent + 1, depth + 1))
                arms.append(f"{pad}end")
                lines.append("\n".join(arms))
            elif roll < 0.66 and depth < 2:
                # bounded loop, optionally with a data-dependent break;
                # round 3: sometimes a generic for over a literal table
                # (ipairs iterator protocol + masked body/breaks); late
                # round 3: sometimes the goto-continue idiom (the vector
                # path must refuse goto cleanly — scalar authority)
                name = f"v{self.r.integers(0, 6)}"
                if self.r.random() < 0.2:
                    body = [f"{pad}local {name} = {self.expr(local_vars)}",
                            f"{pad}for i{depth} = 1, {self.r.integers(2, 5)} do",
                            f"{pad}  if {self.cond(local_vars)} then "
                            f"goto cont{depth} end",
                            f"{pad}  {name} = {name} * 0.5 + "
                            f"{self.expr(local_vars, 2)}",
                            f"{pad}  ::cont{depth}::",
                            f"{pad}end"]
                    lines.append("\n".join(body))
                    if name not in local_vars:
                        local_vars.append(name)
                    continue
                if self.r.random() < 0.3:
                    consts = ", ".join(self.const()
                                       for _ in range(self.r.integers(2, 5)))
                    body = [f"{pad}local {name} = {self.expr(local_vars)}",
                            f"{pad}for gi{depth}, gw{depth} in "
                            f"ipairs({{{consts}}}) do",
                            f"{pad}  {name} = {name} * 0.5 + gw{depth} + "
                            f"{self.expr(local_vars, 2)}"]
                    if self.r.random() < 0.5:
                        body.append(
                            f"{pad}  if {self.cond([name])} then break end")
                    body.append(f"{pad}end")
                else:
                    body = [f"{pad}local {name} = {self.expr(local_vars)}",
                            f"{pad}for i{depth} = 1, {self.r.integers(2, 5)} do",
                            f"{pad}  {name} = {name} * 0.5 + "
                            f"{self.expr(local_vars, 2)}"]
                    if self.r.random() < 0.5:
                        body.append(
                            f"{pad}  if {self.cond([name])} then break end")
                    body.append(f"{pad}end")
                lines.append("\n".join(body))
                if name not in local_vars:
                    local_vars.append(name)
            elif roll < 0.72 and depth < 2:
                # late round 3: metatable class arithmetic — uniform
                # metatables must vectorize bit-equal through the base
                # machinery (constructors inside masked branches use the
                # fresh-install allowance); per-lane dispatch must
                # refuse cleanly
                name = f"v{self.r.integers(0, 6)}"
                # half the time: table OP lane-array (the __mul handler
                # dispatches through the vector call machinery)
                tail = (f"(q{depth} * {self.expr(local_vars, 2)}).a"
                        if self.r.random() < 0.5 else
                        f"q{depth}.a * 0.5 + (-q{depth}).b")
                lines.append(
                    f"{pad}local p{depth} = V.new({self.expr(local_vars)}, "
                    f"{self.expr(local_vars, 2)})\n"
                    f"{pad}local q{depth} = p{depth} + "
                    f"V.new({self.const()}, {self.const()})\n"
                    f"{pad}local {name} = {tail}")
                if name not in local_vars:
                    local_vars.append(name)
            elif roll < 0.76:
                # late round 3: string library work — uniform args run
                # identically on both engines; a lane-varying arg must
                # hit the Unvectorizable wrapper (never a script error
                # the scalar path wouldn't raise)
                name = f"v{self.r.integers(0, 6)}"
                arg = (self.expr(local_vars, 2)
                       if self.r.random() < 0.3 else self.const())
                lines.append(
                    f'{pad}local s{depth} = string.format("%.2f", {arg})\n'
                    f'{pad}local _, n{depth} = string.gsub(s{depth}, '
                    f'"%d", "#")\n'
                    f"{pad}local {name} = n{depth} + #s{depth} + "
                    f"{self.expr(local_vars, 2)}")
                if name not in local_vars:
                    local_vars.append(name)
            elif roll < 0.79:
                # round 5: a load()'d chunk is an ordinary function and
                # must vectorize bit-equal (args ride `...` — a chunk
                # cannot see the caller's locals)
                name = f"v{self.r.integers(0, 6)}"
                lines.append(
                    f'{pad}local cf{depth} = load('
                    f'"local a, b = ... ; return a * 0.5 + b")\n'
                    f"{pad}local {name} = cf{depth}("
                    f"{self.expr(local_vars, 2)}, "
                    f"{self.expr(local_vars, 2)})")
                if name not in local_vars:
                    local_vars.append(name)
            elif roll < 0.815:
                # round 5: coroutines are scalar authority — the vector
                # engine must refuse cleanly (never diverge, never raise
                # an error the scalar path wouldn't).  The coroutine
                # FINISHES (second call reaches the return) so scalar
                # replay never parks threads against the live cap.
                name = f"v{self.r.integers(0, 6)}"
                lines.append(
                    f"{pad}local co{depth} = coroutine.wrap(function(a)\n"
                    f"{pad}  coroutine.yield(a * 0.5)\n"
                    f"{pad}  return a + 1\n"
                    f"{pad}end)\n"
                    f"{pad}local {name} = co{depth}("
                    f"{self.expr(local_vars, 2)}) + co{depth}()")
                if name not in local_vars:
                    local_vars.append(name)
            elif roll < 0.84:
                # lane-varying DENSE-table read (round 3: vectorizes when
                # every active key is an integer in range; the % keeps it
                # in 1..3 most of the time, and the occasional wider
                # modulus produces out-of-range keys the vector path must
                # cleanly refuse)
                name = f"v{self.r.integers(0, 6)}"
                mod = 3 if self.r.random() < 0.8 else 5
                lines.append(
                    f"{pad}local {name} = LUT[math.floor(math.abs("
                    f"{self.expr(local_vars, 2)}) * 2) % {mod} + 1]\n"
                    f"{pad}if {name} == nil then {name} = 0.5 end")
                if name not in local_vars:
                    local_vars.append(name)
            elif roll < 0.94 and allow_return:
                if self.r.random() < 0.25:
                    # all-nil returns mark the lanes nil for every slot
                    # (round 3: `return nil, nil` too, like debug.lua)
                    lines.append(f"{pad}return nil"
                                 + (", nil" if self.r.random() < 0.4 else ""))
                else:
                    lines.append(f"{pad}return {self.expr(local_vars)}, "
                                 f"{self.expr(local_vars)}")
                break  # statements after return don't parse in a block
            else:
                # partial assignment + nil check (the _MaybeNil machinery)
                name = f"g{self.r.integers(0, 3)}"
                lines.append(
                    f"{pad}local {name}\n"
                    f"{pad}if {self.cond(local_vars)} then {name} = "
                    f"{self.expr(local_vars)} end\n"
                    f"{pad}if {name} == nil then {name} = {self.const()} end")
                if name not in local_vars:
                    local_vars.append(name)
        return "\n".join(lines)

    def program(self):
        # a dense numeric table for the lane-varying-read branch
        lut = ("LUT = {" + ", ".join(self.const() for _ in range(3))
               + "}\n")
        # a metatable class for the class-arithmetic branch (late r3)
        lut += ("V = {}\nV.__index = V\n"
                "function V.new(a, b) "
                "return setmetatable({a = a, b = b}, V) end\n"
                "V.__add = function(u, w) "
                "return V.new(u.a + w.a, u.b + w.b) end\n"
                "V.__mul = function(u, s) "
                "return V.new(u.a * s, u.b * s) end\n"
                "V.__unm = function(u) return V.new(-u.a, -u.b) end\n")
        if self.r.random() < 0.25:
            # round 3: a varargs helper (select + `...` destructuring)
            helper = ("function h(...)\n"
                      "  local n = select(\"#\", ...)\n"
                      "  local a, b = ...\n"
                      f"{self.block(['a', 'b'], 1, 1, allow_return=False)}\n"
                      "  return (a + b) * 0.5 + n\nend\n")
        else:
            helper = (f"function h(a, b)\n"
                      f"{self.block(['a', 'b'], 1, 1, allow_return=False)}\n"
                      f"  return (a + b) * 0.5\nend\n")
        use_helper = self.r.random() < 0.5
        vars_ = ["x", "y"]
        # a guarded top-level nil return (inside an if: the body's own
        # trailing return must stay the block's last statement)
        guard = (f"  if {self.cond(vars_)} then return nil end\n"
                 if self.r.random() < 0.6 else "")
        body = self.block(vars_, 1, 0, allow_return=False)
        call = "  local hh = h(x, y)\n" if use_helper else ""
        tail_vars = vars_ + (["hh"] if use_helper else [])
        return (lut + helper +
                f"function f(x, y)\n{call}{guard}{body}\n"
                f"  return {self.expr(tail_vars)}, {self.expr(tail_vars)}\nend\n")


def _check_bitequal_or_refusal(src, X, Y, label):
    """The fuzz contract on one program: the vector path is bit-equal to
    the scalar path lane-for-lane, or raises Unvectorizable cleanly.
    Returns False when the scalar path itself is unusable (invalid
    program / errors on some input — the caller decides whether that's
    a skip or a corpus failure)."""
    N = len(X)
    si = Interpreter()
    try:
        si.run(src)
    except LuaError:
        return False
    f_s = si.get_global("f")
    truth = []
    for i in range(N):
        try:
            truth.append(si.call(f_s, [float(X[i]), float(Y[i])]))
        except LuaError:
            return False

    vi = VectorInterpreter()
    vi.run(src)
    try:
        with np.errstate(all="ignore"):
            vals, nil = vi.vcall(vi.get_global("f"), [X, Y])
    except Unvectorizable:
        return True  # clean refusal is allowed; silent divergence is not
    # a program may ignore its array inputs entirely: uniform scalar
    # returns apply to every lane; a uniformly-nil slot stays None
    vals = [None if v is None
            else np.broadcast_to(np.asarray(v, np.float64), (N,))
            for v in vals]
    if nil is not None:
        nil = np.broadcast_to(nil, (N,))
    for i in range(N):
        sv = truth[i]
        if nil is not None and nil[i]:
            # vector says: this lane returned nil (whole return)
            assert len(sv) == 0 or all(v is None for v in sv), \
                (label, i, X[i], Y[i], src)
            continue
        assert len(sv) == len(vals) or (len(sv) == 0 and len(vals) == 0), \
            (label, i, sv, len(vals), src)
        for j, s in enumerate(sv):
            v = None if vals[j] is None else float(vals[j][i])
            if s is None:
                assert v is None, (label, i, j, v, src)
            else:
                a, b = float(s), v
                assert b is not None and (
                    a == b or (np.isnan(a) and np.isnan(b))), \
                    (label, i, j, a, b, src)
    return True


@pytest.mark.parametrize("seed", range(FUZZ_SEEDS))
def test_random_programs_bitequal_or_unvectorizable(seed):
    rng = np.random.default_rng(1000 + seed)
    src = _Gen(rng).program()
    N = 48
    X = rng.uniform(-2.5, 2.5, N)
    Y = rng.uniform(-2.5, 2.5, N)
    if not _check_bitequal_or_refusal(src, X, Y, label=seed):
        pytest.skip("program invalid or errors on the scalar path")


@pytest.mark.parametrize(
    "path", sorted(CORPUS_DIR.glob("*.lua")), ids=lambda p: p.stem)
def test_regression_corpus(path):
    """Replay the committed corpus: one program per class that found an
    evaluator bug in round 2 (masked-nil assignment, eager and/or,
    masked elseif chains, pow/inf edge, mixed-slot nil, masked-call
    global writes, per-lane loop freezing).  Unlike the generated seeds
    these must be VALID scalar programs — a False here means the corpus
    itself regressed."""
    src = path.read_text()
    rng = np.random.default_rng(int.from_bytes(path.stem.encode()[:4], "big"))
    N = 96  # denser lanes than the generator: corner cases need hits
    X = np.concatenate([rng.uniform(-2.5, 2.5, N - 2), [0.0, 1.0]])
    Y = np.concatenate([rng.uniform(-2.5, 2.5, N - 2), [0.0, -1.0]])
    assert _check_bitequal_or_refusal(src, X, Y, label=path.stem), \
        f"{path.stem}: scalar path unusable (corpus program regressed)"
