"""Vectorized (masked) execution of mini-Lua lens functions.

The scalar interpreter (:mod:`blinky_tpu.minilua`) plays the Lua 5.2
VM's role faithfully but pays one interpreter walk per pixel — minutes
for a 1080p exact host build of a ``.lua`` drop-in.  This module runs
the SAME AST over whole coordinate arrays: straight-line math maps
elementwise, ``if``/``elseif`` chains with data-dependent conditions
become masked execution of every arm with ``where``-merged writes, and
data-dependent loops (``repeat``/``while``/``for``+``break``) become
dense masked loops that freeze exited lanes — the same
vectorized-scalar-loop contract the hand-ported lenses use
(:func:`blinky_tpu.xmath.repeat_until`).

Bit-exactness vs the scalar interpreter: every lane sees the identical
operation sequence (both branch arms are computed, the untaken one
discarded by the merge; frozen loop lanes stop updating), float64
arithmetic is IEEE in both, and transcendentals route through the same
glibc libm (scalar: Python ``math``; vector: :mod:`blinky_tpu.xmath`'s
``libm_unary`` routing — NumPy's SIMD float64 kernels drift 1 ulp on a
few percent of inputs, which is exactly why xmath has that routing).
The test suite pins vector == scalar over dense grids for every shipped
script.

Constructs that genuinely need per-lane scalar control (array-valued
table keys, array loop bounds, array-conditioned table writes — the
``debug`` lens's numplates tables) raise :class:`Unvectorizable`; the
bridge then falls back to the scalar ``np.vectorize`` path, so a script
is never worse off than before.

Traced (jax) mode — round 3: the same evaluator also runs under jax
tracing, making ``.lua`` drop-ins first-class on the DEVICE builder
(``render_posed``, the sharded builder, zoom sweeps — the reference's
one-builder-for-every-lens contract, ``fisheye.c:1659-1750,2084-2124``).
The mode is type-driven, not flagged: when jax values flow through, the
machinery switches to trace-safe semantics —

* masks are traced bool arrays, so every data-dependent ``.any()``
  fast path is skipped (all arms execute; merges discard);
* per-lane nil is optimistic: arithmetic/truthiness on a maybe-nil
  propagates the nil mask instead of refusing (nil lanes carry garbage
  that the final validity merge discards — exactly the hand-ports'
  masked fixed-iteration view, so the device build pins equal to the
  Python-port device build);
* data-dependent ``repeat``/``while`` loops unroll to
  ``TRACE_LOOP_CAP`` masked iterations (the ports' ``repeat_until``
  max_iter analog); numeric ``for`` bounds stay concrete.

NumPy inputs keep the exact pinned scalar-bit-equality semantics —
none of the np-path decisions changed.
"""

from __future__ import annotations


import numpy as np

from blinky_tpu import xmath as xm
from blinky_tpu.minilua import (
    Interpreter,
    LuaError,
    LuaFunction,
    LuaTable,
    _Break,
    _Env,
    _Return,
    _truthy,
)


class Unvectorizable(Exception):
    """The script needs per-lane scalar control flow; use the scalar path."""


class _AllReturned(Exception):
    """Every lane of the current call has produced a return value."""


class _MaybeNil:
    """A value that is Lua ``nil`` on some lanes.

    Two sources, one representation: a helper's per-lane nil RETURNS,
    and a variable assigned only in SOME masked arms (its unassigned
    lanes are nil, exactly as in Lua).  Arithmetic propagates the nil
    lanes when they are outside the active mask (their garbage is
    discarded by later merges) and raises :class:`Unvectorizable` when
    an active lane would actually touch nil — the scalar path then
    reproduces Lua's real behavior (error or nil handling)."""

    __slots__ = ("value", "nil_mask")

    def __init__(self, value, nil_mask):
        self.value = value
        self.nil_mask = nil_mask

    @staticmethod
    def wrap(value, nil_mask):
        if nil_mask is None:
            return value
        if isinstance(nil_mask, np.ndarray) and not nil_mask.any():
            return value  # traced masks can't be inspected: stay wrapped
        return _MaybeNil(value, nil_mask)


class _Frame:
    __slots__ = ("done", "nil", "slots", "loops", "entry", "mdepth")

    def __init__(self, entry=None, mdepth=0):
        self.done = None   # bool array of lanes that returned (None = none)
        self.nil = None    # bool array of lanes that returned nil
        self.slots = None  # list of merged return-value arrays
        self.loops = []
        self.entry = entry    # caller's mask at call time (the lanes this
        self.mdepth = mdepth  # call exists for) + mask-stack depth then


class _Loop:
    __slots__ = ("broke",)

    def __init__(self):
        self.broke = None  # bool array of lanes that hit `break`


def _is_traced(v) -> bool:
    """A jax value (array or tracer): can't be inspected, only computed
    with.  Concrete jax arrays are deliberately included so semantics
    don't depend on whether a jit is active."""
    return xm._is_jax(v)


def _is_arr(v) -> bool:
    if isinstance(v, np.ndarray):
        return v.ndim > 0
    return _is_traced(v)  # 0-d tracers count: scalar math can't eat them


def _poss(m) -> bool:
    """Could any lane of mask *m* be active?  np masks answer exactly
    (the pinned fast-path/early-exit behavior); traced masks can't be
    inspected, so assume yes (all arms execute, merges discard)."""
    if m is None:
        return True
    if isinstance(m, np.ndarray):
        return bool(m.any())
    return True


def _combine_slot_nils(vals, slot_nils):
    """One nil mask for a (possibly multi-value) return.

    nil is tracked per RETURN, not per slot: with multiple values every
    maybe-nil slot must carry the SAME mask (the nil-protocol ray
    triple) — np masks that differ are Unvectorizable (pinned; the
    scalar fallback decides).  Traced masks can't be compared, so the
    traced mode takes the UNION instead: a lane with ANY nil slot
    counts as a nil return.  This is exact in the common case that
    produces it (helpers whose every lane returned carry all-false
    masks the tracer just can't prove empty, e.g. ``cube.lua``'s
    row/col destructuring)."""
    if not any(n is not None for n in slot_nils):
        return None
    known = [n for n in slot_nils if n is not None]
    if len(vals) == 1 or all(_same_mask(n, slot_nils[0])
                             for n in slot_nils):
        return known[0]
    if all(isinstance(n, np.ndarray) for n in known):
        raise Unvectorizable("mixed per-slot nil in a multi-value return")
    out = known[0]
    for n in known[1:]:
        out = out | n
    return out


def _has_break_or_return(node) -> bool:
    """Does this AST subtree lexically contain break/return?  Nested
    function DEFINITIONS don't count (their returns target their own
    frames)."""
    if isinstance(node, tuple):
        if node and node[0] == "function":
            return False
        if node and node[0] in ("break", "return"):
            return True
        return any(_has_break_or_return(x) for x in node)
    if isinstance(node, list):
        return any(_has_break_or_return(x) for x in node)
    return False


def _same_mask(a, b) -> bool:
    """Are two nil masks provably identical?  Object identity covers the
    nil-protocol multi-value return (all slots share ONE frame mask);
    np masks compare by value; distinct traced masks can't be compared,
    so they count as different (conservative refusal)."""
    if a is b:
        return True
    if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
        return bool(np.array_equal(a, b))
    return False


def _truthiness(v):
    """Lua truthiness -> (uniform: bool, value: bool | bool-array)."""
    if v is None or v is False:
        return True, False
    if v is True:
        return True, True
    if isinstance(v, np.ndarray):
        if v.dtype == bool:
            if v.ndim == 0:
                return True, bool(v)
            return False, v
        return True, True  # numbers are truthy in Lua, even 0
    if _is_traced(v):
        if v.dtype == bool:
            return False, v  # never uniform under tracing (0-d included)
        return True, True
    return True, True  # numbers, strings, tables, functions


def _as_float(v, what="operand"):
    if isinstance(v, bool) or v is None or isinstance(v, (str, LuaTable, LuaFunction)):
        raise LuaError(f"attempt to perform arithmetic on a non-number {what}")
    if isinstance(v, _MaybeNil):
        raise Unvectorizable("arithmetic on a maybe-nil value")
    if isinstance(v, np.ndarray) or _is_traced(v):
        return v
    return float(v)


def _scalar_key(v):
    """A table key / loop bound must be lane-independent."""
    if isinstance(v, _MaybeNil):
        raise Unvectorizable("maybe-nil table key / bound")
    if _is_traced(v):
        raise Unvectorizable("traced table key / bound")
    if isinstance(v, np.ndarray):
        if v.ndim == 0:
            return float(v)
        raise Unvectorizable("array-valued table key / bound")
    return v


class VectorInterpreter(Interpreter):
    """The mini-Lua engine with masked array semantics.

    Scalar inputs behave exactly like the base interpreter (conditions
    stay concrete, loops run normally); array inputs flow through
    elementwise with masked control flow.  Use :meth:`vcall` to call a
    script function on arrays and receive ``(values, nil_mask)``.
    """

    # Bounded unroll for data-dependent repeat/while loops under jax
    # tracing (exited lanes freeze via the mask merges) — the ports'
    # xmath.repeat_until(max_iter=100) analog.  The shipped iterative
    # lenses converge in <= 25 rounds; 100 matches the ports' cap.
    TRACE_LOOP_CAP = 100

    def __init__(self, builtins=None):
        super().__init__(builtins=builtins)
        self._masks: list = []
        self._vframes: list[_Frame] = []
        self._wlog = None  # write-set log for the lax while lowering
        self._wlog_bad = False  # a table write occurred while logging
        self._install_vector_math()

    # ------------------------------------------------------------ stdlib
    def _install_vector_math(self):
        """Swap the math table for array-aware versions.  Scalars defer
        to the ORIGINAL wrappers (bit-identical to the scalar
        interpreter); arrays go through xmath (libm-routed f64)."""
        mt = self.globals.vars["math"]

        def lift1(name, xf):
            orig = mt.get(name)

            def f(x):
                if _is_arr(x):
                    with np.errstate(all="ignore"):
                        return xf(x)
                return orig(x)
            return f

        def lift2(name, xf):
            orig = mt.get(name)

            def f(a, b):
                if _is_arr(a) or _is_arr(b):
                    for v in (a, b):
                        if v is None or isinstance(v, (bool, str)):
                            raise LuaError(
                                f"bad argument to '{name}' (number expected)")
                    with np.errstate(all="ignore"):
                        return xf(a, b)
                return orig(a, b)
            return f

        def _vlog(x, base=None):
            if base is not None:
                raise Unvectorizable("log(x, base) on arrays")
            with np.errstate(all="ignore"):
                return xm.log(x)

        def _vmaxmin(greater):
            orig_max, orig_min = mt.get("max"), mt.get("min")

            def f(*a):
                if any(_is_arr(v) for v in a):
                    for v in a:
                        if v is None or isinstance(v, (bool, str)):
                            raise LuaError(
                                "bad argument to 'max/min' (number expected)")
                    # Python's max/min keep the incumbent unless the
                    # challenger compares strictly (NaN comparisons are
                    # False) — fold the same way, don't propagate NaN
                    xp = xm.xp(*a)
                    out = a[0] if xp is not np else np.asarray(a[0],
                                                               np.float64)
                    for v in a[1:]:
                        out = xp.where(xp.greater(v, out) if greater
                                       else xp.less(v, out), v, out)
                    return out
                return (orig_max if greater else orig_min)(*a)
            return f

        def _vmodf(x):
            if _is_arr(x):
                return xm.modf(x)
            return mt_orig_modf(x)

        mt_orig_modf = mt.get("modf")
        lifted = {
            "cos": lift1("cos", xm.cos), "sin": lift1("sin", xm.sin),
            "tan": lift1("tan", xm.tan), "acos": lift1("acos", xm.acos),
            "asin": lift1("asin", xm.asin), "atan": lift1("atan", xm.atan),
            "sinh": lift1("sinh", xm.sinh), "cosh": lift1("cosh", xm.cosh),
            "tanh": lift1("tanh", xm.tanh), "exp": lift1("exp", xm.exp),
            "sqrt": lift1("sqrt", xm.sqrt), "abs": lift1("abs", xm.abs),
            "floor": lift1("floor", xm.floor),
            "ceil": lift1("ceil", lambda x: xm.xp(x).ceil(x)),
            "log10": lift1("log10", xm.log10),
            "atan2": lift2("atan2", xm.atan2),
            "fmod": lift2("fmod", xm.fmod),
            "pow": lift2("pow", xm.power),
            "log": (lambda x, base=None: _vlog(x, base) if _is_arr(x)
                    else mt_orig_log(x) if base is None else mt_orig_log(x, base)),
            "max": _vmaxmin(True), "min": _vmaxmin(False),
            "rad": lift1("rad", lambda x: xm.xp(x).radians(x)),
            "deg": lift1("deg", lambda x: xm.xp(x).degrees(x)),
            "modf": _vmodf,
        }
        mt_orig_log = mt.get("log")
        for k, v in lifted.items():
            mt.set(k, v)
        # Mutating table-stdlib calls are per-lane control under a mask
        # (the scalar path runs them once per LANE; a masked vector call
        # would run them once for ALL lanes) and can't ride a
        # lax.while_loop carry — refuse under masks, and flag the
        # write-log during a loop probe so the lowering falls back.
        tbl = self.globals.vars["table"]
        for name in ("insert", "remove", "sort"):
            orig = tbl.get(name)

            def make_guard(orig=orig, name=name):
                def f(*a):
                    if self._active_lanes() is not None:
                        raise Unvectorizable(
                            f"table.{name} under a lane mask")
                    if self._wlog is not None:
                        self._wlog_bad = True
                    return orig(*a)
                return f

            tbl.set(name, make_guard())
        # Metatable installation and raw writes are table WRITES.  Under
        # a lane mask: INSTALLING a uniform metatable on a table that
        # never had one is the masked-constructor idiom
        # (``setmetatable({...}, Class)`` per pixel) — inactive lanes
        # see the same uniform install, exactly the fresh-slot
        # table-write policy above.  CHANGING an existing metatable (or
        # rawset) under a mask is a per-lane effect: refuse (scalar
        # authority).  Both flag the while-lowering write log.
        orig_setmeta = self.globals.vars["setmetatable"]

        def vec_setmeta(t=None, mt_=None):
            if self._active_lanes() is not None and not (
                    isinstance(t, LuaTable) and t.metatable is None
                    and isinstance(mt_, LuaTable)
                    and t.vec_ctx is not None
                    and self._same_mask_ctx(t.vec_ctx)):
                # only a table CREATED under this exact mask context may
                # be metatabled under the mask (the constructor idiom) —
                # a pre-existing table would leak the install to
                # inactive lanes
                raise Unvectorizable("setmetatable under a lane mask")
            if self._wlog is not None:
                self._wlog_bad = True
            return orig_setmeta(t, mt_)

        self.globals.vars["setmetatable"] = vec_setmeta
        orig_rawset = self.globals.vars["rawset"]

        def vec_rawset(*a):
            if self._active_lanes() is not None:
                raise Unvectorizable("rawset under a lane mask")
            if self._wlog is not None:
                self._wlog_bad = True
            return orig_rawset(*a)

        self.globals.vars["rawset"] = vec_rawset
        # String functions are scalar authority: the scalar path runs
        # them once per LANE, so a lane-varying argument must trigger
        # the scalar fallback (Unvectorizable), never a script error
        # the scalar path wouldn't raise (e.g. string.format("%d", x)
        # with per-lane x).
        slib = self.globals.vars["string"]
        for sname, sfn in list(slib.data.items()):
            if not callable(sfn):
                continue

            def make_sguard(fn=sfn, name=sname):
                def f(*a):
                    if any(_is_arr(v) or isinstance(v, _MaybeNil)
                           for v in a):
                        raise Unvectorizable(
                            f"string.{name} on a lane-varying value")
                    return fn(*a)
                return f

            slib.set(sname, make_sguard())
        # refresh the alias globals (cos = math.cos, ..., init_lua preload)
        for name in ("cos", "sin", "tan", "asin", "acos", "atan", "atan2",
                     "sinh", "cosh", "tanh", "log", "log10", "abs", "sqrt",
                     "exp", "pow"):
            self.globals.vars[name] = mt.get(name)
        # Coroutines are scalar authority ALWAYS (like goto): a yield
        # parks its thread mid-frame while the resumer keeps pushing and
        # popping the interpreter's shared mask/vframe stacks, so the
        # suspended context would resume against someone else's masks.
        # ``load`` stays available — a loaded chunk is an ordinary
        # LuaFunction through this same evaluator, covered by the
        # scalar/vector bit-equality contract.
        cot = self.globals.vars["coroutine"]

        def _co_refuse(*a):
            raise Unvectorizable("coroutine (scalar authority)")

        for cname in ("create", "resume", "yield", "wrap", "status",
                      "running", "isyieldable"):
            cot.set(cname, _co_refuse)

    # ------------------------------------------------------------- masks
    def _eff_mask(self):
        """The active-lane mask RELATIVE to the current call (None = all).

        A function called under a caller mask executes for its entry
        lanes only, but its internal uniform-scalar state (ellipj's AGM
        counters) must not be lane-merged against lanes that don't exist
        for the call — so only masks pushed SINCE the call entry count,
        plus this frame's returned/broke lanes.  Writes that escape the
        call (globals) re-apply the entry mask in :meth:`assign`."""
        start = self._vframes[-1].mdepth if self._vframes else 0
        m = None
        for part in self._masks[start:]:
            m = part if m is None else (m & part)
        if self._vframes:
            fr = self._vframes[-1]
            if fr.done is not None:
                nd = ~fr.done
                m = nd if m is None else (m & nd)
            for loop in fr.loops:
                if loop.broke is not None:
                    nb = ~loop.broke
                    m = nb if m is None else (m & nb)
        return m

    @staticmethod
    def _merge(mask, new, old):
        """``where(mask, new, old)`` with Lua-value rules, tracking
        per-lane nil (unassigned lanes) through :class:`_MaybeNil`."""
        new_nil = None
        if isinstance(new, _MaybeNil):
            new_nil = new.nil_mask
            new = new.value
        old_nil = None
        if isinstance(old, _MaybeNil):
            old_nil = old.nil_mask
            old = old.value
        traced = _is_traced(mask) or _is_traced(new) or _is_traced(old)
        where = xm.where if traced else np.where
        # placeholder for lanes that are nil: an f64 NaN grid on the np
        # path (pinned behavior); a weak-typed scalar NaN under tracing
        # so the merge follows the traced operands' dtype (f32)
        nanfill = float("nan") if traced else np.full(mask.shape, np.nan)
        if new is None:
            # assigning nil under a mask: those lanes become nil, the
            # rest keep the old value (exactly Lua's `x = nil`)
            new_nil = np.ones(mask.shape, bool)
            new = old if old is not None else nanfill
        for v in (new, old):
            if isinstance(v, (LuaTable, LuaFunction, str)):
                raise Unvectorizable("masked write of a non-numeric value")
        if old is None:
            # the variable had no value on the untaken lanes: those lanes
            # are nil, exactly as in Lua
            old_nil = np.ones(mask.shape, bool)
            is_bool = (isinstance(new, (bool, np.bool_))
                       or (isinstance(new, np.ndarray) and new.dtype == bool)
                       or (_is_traced(new) and new.dtype == bool))
            old = np.zeros(mask.shape, bool) if is_bool else nanfill
        nil = None
        if new_nil is not None or old_nil is not None:
            nn = new_nil if new_nil is not None else np.zeros(mask.shape, bool)
            on = old_nil if old_nil is not None else np.zeros(mask.shape, bool)
            nil = where(mask, nn, on)
        return _MaybeNil.wrap(where(mask, new, old), nil)

    # -------------------------------------------------------- statements
    def exec_stmt(self, st, env):
        self._fuel -= 1
        if self._fuel < 0:
            raise LuaError("instruction budget exhausted (runaway loop?)")
        kind = st[0]
        if kind == "goto":
            # a goto fired from a masked arm would jump for ALL lanes;
            # scripts using goto run on the scalar engine (the bridge's
            # load-time fallback catches this)
            raise Unvectorizable("goto (scalar authority)")
        if kind == "if":
            return self._exec_if(st, env)
        if kind == "while":
            return self._exec_while(st, env)
        if kind == "repeat":
            return self._exec_repeat(st, env)
        if kind == "fornum":
            return self._exec_fornum(st, env)
        if kind == "forin":
            return self._exec_forin(st, env)
        if kind == "return":
            return self._exec_return(st, env)
        if kind == "break":
            return self._exec_break()
        self._fuel += 1  # the base class decrements again
        return super().exec_stmt(st, env)

    def _exec_if(self, st, env):
        taken = None
        for cond, body in st[1]:
            try:
                with np.errstate(all="ignore"):
                    c = self.eval(cond, env)
            except (LuaError, TypeError) as err:
                fr = self._vframes[-1] if self._vframes else None
                partial = (fr is not None and (fr.done is not None
                                               or fr.entry is not None))
                if taken is None and not partial and not self._masks:
                    raise  # same context as the scalar path: real error
                # the scalar path evaluates this condition only for the
                # lanes that actually reach it (not-yet-taken lanes, and
                # lanes that haven't returned); the error may not exist
                # for any of those — refuse and let the fallback decide
                raise Unvectorizable(
                    f"error in masked condition: {err}") from err
            uni, cv = self._truthy_ctx(c)
            if taken is None and uni:
                if cv:
                    self.exec_block(body, _Env(env))
                    return
                continue
            # array-masked chain
            if uni:
                cm = np.full(taken.shape, bool(cv))
            else:
                cm = cv
            arm = cm if taken is None else (cm & ~taken)
            taken = cm if taken is None else (taken | cm)
            if _poss(arm):
                self._masks.append(arm)
                try:
                    self.exec_block(body, _Env(env))
                except (LuaError, TypeError) as e:
                    # an error inside a masked arm may involve state the
                    # scalar path would never touch for these lanes —
                    # refuse and let the scalar fallback reproduce the
                    # exact per-lane behavior (including real errors)
                    raise Unvectorizable(f"error under mask: {e}") from e
                finally:
                    self._masks.pop()
        if st[2] is not None:
            if taken is None:
                self.exec_block(st[2], _Env(env))
            else:
                rest = ~taken
                if _poss(rest):
                    self._masks.append(rest)
                    try:
                        self.exec_block(st[2], _Env(env))
                    except (LuaError, TypeError) as e:
                        raise Unvectorizable(
                            f"error under mask: {e}") from e
                    finally:
                        self._masks.pop()

    def _exec_while(self, st, env):
        fr = self._vframes[-1] if self._vframes else None
        loop = _Loop()
        if fr is not None:
            fr.loops.append(loop)
        active = None  # extra mask accumulated from array conditions
        try:
            while True:
                self._fuel -= 1
                if self._fuel < 0:
                    raise LuaError(
                        "instruction budget exhausted (runaway loop?)")
                with np.errstate(all="ignore"):
                    c = self.eval(st[1], env)
                uni, cv = self._truthy_ctx(c)
                if uni and active is None:
                    if not cv:
                        break
                    self.exec_block(st[2], _Env(env))
                    continue
                cm = np.full(active.shape, bool(cv)) if uni else cv
                active = cm if active is None else (active & cm)
                work = active
                m = self._eff_mask()
                if m is not None:
                    work = work & m
                if not _poss(work):
                    break
                if not isinstance(work, np.ndarray):
                    # traced lanes can't be inspected for convergence —
                    # hand the whole lane-varying phase to the traced
                    # loop driver (lax.while_loop when the body
                    # qualifies, else a bounded masked unroll)
                    self._traced_loop(st, env, active, is_repeat=False)
                    break
                self._masks.append(active)
                try:
                    self.exec_block(st[2], _Env(env))
                except (LuaError, TypeError) as e:
                    raise Unvectorizable(f"error under mask: {e}") from e
                finally:
                    self._masks.pop()
        except _Break:
            pass
        finally:
            if fr is not None:
                fr.loops.remove(loop)

    def _traced_loop(self, st, env, active, is_repeat):
        """Drive the lane-varying phase of a while/repeat whose mask is
        TRACED.  One masked iteration runs eagerly with write logging to
        discover the loop-carried variables; if the body qualifies (no
        lexical break/return, no table writes, every carried value a
        traced/np array) the rest lowers to ``lax.while_loop`` — a
        compact graph with data-dependent trip count, exactly the shape
        the ports' ``repeat_until`` compiles to, instead of a
        TRACE_LOOP_CAP-times unrolled body (debug.lua's whole unrolled
        while was ~3.8k HLO eqns; the lowered loop is ~40).  Ineligible
        loops keep the bounded masked unroll — bit-identical values
        either way (frozen lanes never update in any scheme)."""
        body_ast = st[1] if is_repeat else st[2]
        cond_ast = st[2] if is_repeat else st[1]

        def one_iter(act):
            """body-then-cond under mask *act* -> the next active mask
            (while: act & cond; repeat: act & ~cond)."""
            import jax.numpy as jnp

            self._masks.append(act)
            try:
                scope = _Env(env)
                self.exec_block(body_ast, scope)
                with np.errstate(all="ignore"):
                    c = self.eval(cond_ast, scope if is_repeat else env)
            except (LuaError, TypeError) as e:
                raise Unvectorizable(f"error under mask: {e}") from e
            finally:
                self._masks.pop()
            uni, cv = self._truthy_ctx(c)
            cmv = jnp.broadcast_to(jnp.asarray(bool(cv) if uni else cv),
                                   np.shape(act))
            return act & (~cmv if is_repeat else cmv)

        eligible = not (_has_break_or_return(body_ast)
                        or _has_break_or_return(cond_ast))
        # probe iteration (eager, write-logged)
        outer_log, outer_bad = self._wlog, self._wlog_bad
        self._wlog, self._wlog_bad = {}, False
        try:
            active = one_iter(active)
        finally:
            written, bad = self._wlog, self._wlog_bad
            self._wlog, self._wlog_bad = outer_log, outer_bad
            if outer_log is not None:  # nested probe: propagate upward
                outer_log.update(written)
                self._wlog_bad = outer_bad or bad
        if eligible and not bad and self._lax_rest(one_iter, written,
                                                   active, it0=1):
            return
        # bounded masked unroll fallback (the ports' repeat_until
        # max_iter analog; exited lanes freeze through the merges)
        for _ in range(self.TRACE_LOOP_CAP - 1):
            self._fuel -= 1
            if self._fuel < 0:
                raise LuaError("instruction budget exhausted (runaway loop?)")
            active = one_iter(active)

    def _lax_rest(self, one_iter, written, active, it0):
        """Lower the remaining iterations to ``lax.while_loop``.  Returns
        False (with all state restored to post-probe) when the carry
        can't be built or the lowering fails — the caller then unrolls."""
        import jax
        import jax.numpy as jnp

        slots = []
        for scope, name in written.values():
            v = scope.vars.get(name)
            if isinstance(v, _MaybeNil):
                if not (_is_traced(v.value)
                        or isinstance(v.value, np.ndarray)):
                    return False
                slots.append((scope, name, "mn"))
            elif _is_traced(v) or isinstance(v, np.ndarray):
                slots.append((scope, name, "pl"))
            else:
                return False  # a non-array carried value (shouldn't
                # happen under a mask, but refuse rather than guess)

        class _StructChange(Exception):
            pass

        def capture():
            flat = []
            for scope, name, kind in slots:
                v = scope.vars[name]
                if kind == "mn":
                    if not isinstance(v, _MaybeNil):
                        raise _StructChange()
                    flat += [v.value, v.nil_mask]
                else:
                    if isinstance(v, _MaybeNil):
                        raise _StructChange()
                    flat.append(v)
            return tuple(flat)

        def restore(flat):
            i = 0
            for scope, name, kind in slots:
                if kind == "mn":
                    scope.vars[name] = _MaybeNil(flat[i], flat[i + 1])
                    i += 2
                else:
                    scope.vars[name] = flat[i]
                    i += 1

        snapshot = [(scope, name, scope.vars.get(name))
                    for scope, name, _ in slots]
        encl = self._eff_mask()  # trace-constant during the loop

        def cond_fun(carry):
            it, act, _ = carry
            alive = act if encl is None else (act & encl)
            return (it < self.TRACE_LOOP_CAP) & jnp.any(alive)

        def body_fun(carry):
            it, act, flat = carry
            restore(flat)
            new_act = one_iter(act)
            return it + 1, new_act, capture()

        try:
            init = (jnp.int32(it0), jnp.asarray(active), capture())
            out = jax.lax.while_loop(cond_fun, body_fun, init)
            restore(tuple(out[2]))
            return True
        except Exception:
            # an aborted lowering leaves tracers from the dead trace in
            # the scopes — restore the post-probe values and unroll
            for scope, name, v in snapshot:
                scope.vars[name] = v
            return False

    def _exec_repeat(self, st, env):
        fr = self._vframes[-1] if self._vframes else None
        loop = _Loop()
        if fr is not None:
            fr.loops.append(loop)
        active = None
        try:
            while True:
                self._fuel -= 1
                if self._fuel < 0:
                    raise LuaError(
                        "instruction budget exhausted (runaway loop?)")
                scope = _Env(env)  # until sees the body's locals
                if active is not None:
                    self._masks.append(active)
                try:
                    self.exec_block(st[1], scope)
                    with np.errstate(all="ignore"):
                        c = self.eval(st[2], scope)
                except (LuaError, TypeError) as e:
                    if active is not None:
                        raise Unvectorizable(
                            f"error under mask: {e}") from e
                    raise
                finally:
                    if active is not None:
                        self._masks.pop()
                uni, cv = self._truthy_ctx(c)
                if uni and active is None:
                    if cv:
                        break
                    continue
                cm = np.full(active.shape, bool(cv)) if uni else cv
                active = (~cm) if active is None else (active & ~cm)
                work = active
                m = self._eff_mask()
                if m is not None:
                    work = work & m
                if not _poss(work):
                    break
                if not isinstance(work, np.ndarray):
                    # hand the lane-varying phase to the traced loop
                    # driver (lax.while_loop / bounded unroll)
                    self._traced_loop(st, env, active, is_repeat=True)
                    break
        except _Break:
            pass
        finally:
            if fr is not None:
                fr.loops.remove(loop)

    def _exec_fornum(self, st, env):
        start = _scalar_key(_as_float(self.eval(st[2], env)))
        stop = _scalar_key(_as_float(self.eval(st[3], env)))
        step = (_scalar_key(_as_float(self.eval(st[4], env)))
                if st[4] is not None else 1.0)
        if not all(isinstance(v, float) for v in (start, stop, step)):
            raise Unvectorizable("array-valued for bounds")
        if step == 0:
            raise LuaError("'for' step is zero")
        fr = self._vframes[-1] if self._vframes else None
        loop = _Loop()
        if fr is not None:
            fr.loops.append(loop)
        v = start
        try:
            while (v <= stop) if step > 0 else (v >= stop):
                scope = _Env(env)
                scope.vars[st[1]] = v
                self.exec_block(st[5], scope)
                m = self._eff_mask()
                if m is not None and not _poss(m):
                    break  # every lane broke or returned
                v += step
        except _Break:
            pass
        finally:
            if fr is not None:
                fr.loops.remove(loop)

    def _exec_forin(self, st, env):
        """Generic for: the iterator protocol is inherently scalar (table
        keys are lane-uniform), so the triple runs uniformly — but the
        BODY may mask, so the loop registers in the frame's loop list
        (masked breaks must target THIS loop, not an enclosing one)."""
        f, s, ctrl = self.eval_list(st[2], env, want=3)
        if any(isinstance(v, _MaybeNil) or _is_arr(v) for v in (f, s, ctrl)):
            raise Unvectorizable("array-valued generic-for iterator")
        fr = self._vframes[-1] if self._vframes else None
        loop = _Loop()
        if fr is not None:
            fr.loops.append(loop)
        try:
            while True:
                self._fuel -= 1
                if self._fuel < 0:
                    raise LuaError(
                        "instruction budget exhausted (runaway loop?)")
                vals = self.call(f, [s, ctrl])
                if not vals or vals[0] is None:
                    break
                ctrl = _scalar_key(vals[0])
                scope = _Env(env)
                for i, name in enumerate(st[1]):
                    scope.vars[name] = vals[i] if i < len(vals) else None
                self.exec_block(st[3], scope)
                m = self._eff_mask()
                if m is not None and not _poss(m):
                    break  # every lane broke or returned
        except _Break:
            pass
        finally:
            if fr is not None:
                fr.loops.remove(loop)

    def _exec_break(self):
        m = self._eff_mask()
        fr = self._vframes[-1] if self._vframes else None
        if m is None:
            raise _Break()
        if fr is None or not fr.loops:
            # a lane mask is active but no frame/loop registry can record
            # per-lane breaks (array-valued top-level code): a uniform
            # _Break would exit the loop for ALL lanes — defer to the
            # scalar fallback, which replays exact per-lane behavior
            raise Unvectorizable("masked break outside a tracked call frame")
        loop = fr.loops[-1]
        loop.broke = m if loop.broke is None else (loop.broke | m)

    def _exec_return(self, st, env):
        with np.errstate(all="ignore"):
            vals = self.eval_list(st[1], env, want=None)
        m = self._eff_mask()
        fr = self._vframes[-1] if self._vframes else None
        if fr is None:
            raise _Return(vals)
        if fr.done is None and len(self._masks) == fr.mdepth and not any(
                loop.broke is not None for loop in fr.loops):
            # no masking introduced INSIDE this call: a plain return of
            # the whole call's lanes, exactly like the scalar engine
            raise _Return(vals)
        # masked (or final) return: merge into the frame
        if m is not None:
            shape = m.shape
        elif fr.done is not None:
            shape = fr.done.shape
        else:
            shape = fr.entry.shape
        newly = np.ones(shape, bool) if m is None else m
        if fr.done is not None:
            newly = newly & ~fr.done
        # an all-nil return (`return nil` but also `return nil, nil` —
        # debug.lua's col/row helpers) marks the lanes nil for every slot
        is_nil = (len(vals) == 0 or all(v is None for v in vals))
        if is_nil:
            fr.nil = newly if fr.nil is None else (fr.nil | newly)
        else:
            # per-lane nil is modeled per RETURN, not per slot: a
            # multi-value return may only carry _MaybeNil slots that all
            # share ONE mask (e.g. the three ray components of a nested
            # helper's nil-protocol result); Lua's `return maybe_nil, v`
            # with mixed slots needs the scalar path
            slot_nils = [v.nil_mask if isinstance(v, _MaybeNil) else None
                         for v in vals]
            incoming_nil = _combine_slot_nils(vals, slot_nils)
            merged = []
            for v in vals:
                if isinstance(v, _MaybeNil):
                    v = v.value
                if v is None or isinstance(v, (LuaTable, LuaFunction, str)):
                    raise Unvectorizable("masked return of a non-number")
                merged.append(v)
            val_lanes = newly
            if incoming_nil is not None:
                nil_new = newly & incoming_nil
                if _poss(nil_new):  # traced: merge unconditionally
                    fr.nil = nil_new if fr.nil is None else (fr.nil | nil_new)
                val_lanes = newly & ~incoming_nil
            traced = not isinstance(val_lanes, np.ndarray) or any(
                _is_traced(v) for v in merged)
            where = xm.where if traced else np.where
            nanfill = float("nan") if traced else np.nan
            if fr.slots is None:
                fr.slots = [where(val_lanes, v, nanfill) for v in merged]
            else:
                if len(merged) != len(fr.slots):
                    raise Unvectorizable("masked returns with mixed arity")
                fr.slots = [where(val_lanes, v, old)
                            for v, old in zip(merged, fr.slots)]
        fr.done = newly if fr.done is None else (fr.done | newly)
        remaining = ~fr.done
        if fr.entry is not None:
            remaining = remaining & fr.entry
        if isinstance(remaining, np.ndarray) and not remaining.any():
            raise _AllReturned()  # traced: can't early-exit, keep going

    # -------------------------------------------------------- assignment
    def _log_write(self, scope, name):
        """Record an escaping write (for the lax while-lowering's
        loop-carry discovery); no-op unless a probe is logging."""
        if self._wlog is not None:
            self._wlog[(id(scope), name)] = (scope, name)

    def assign(self, tgt, val, env):
        m = self._eff_mask()
        if m is None:
            # a GLOBAL write from inside a masked call still escapes the
            # call: apply the entry mask even with no internal masks
            if (tgt[0] == "name" and self._vframes
                    and self._vframes[-1].entry is not None):
                scope = env.lookup(tgt[1])
                if scope is None or scope.parent is None:
                    entry = self._vframes[-1].entry
                    old = None if scope is None else scope.vars[tgt[1]]
                    target = scope or env.root()
                    self._log_write(target, tgt[1])
                    target.vars[tgt[1]] = self._merge(entry, val, old)
                    return
            if self._wlog is not None:
                if tgt[0] == "index":
                    self._wlog_bad = True  # table writes can't be carried
                elif tgt[0] == "name":
                    scope = env.lookup(tgt[1])
                    self._log_write(scope if scope is not None
                                    else env.root(), tgt[1])
            return super().assign(tgt, val, env)
        if tgt[0] == "index":
            # masked table writes: a lane-uniform value (quincuncial's
            # scalar AGM tables inside a masked arm) or a fresh slot can
            # be written plainly — the inactive lanes either see the same
            # value or never had one; merging a lane-array over an
            # existing slot value is the only case that needs the mask
            t = self.eval(tgt[1], env)
            if not isinstance(t, LuaTable):
                raise LuaError("attempt to index a non-table value")
            if t.metatable is not None:
                # __newindex would fire per lane on the scalar path
                raise Unvectorizable(
                    "masked write to a table with a metatable")
            key = _scalar_key(self.eval(tgt[2], env))
            # merge with the old slot value; a fresh slot tracks the
            # out-of-mask lanes as per-lane nil (read later -> handled
            # or Unvectorizable, never silently wrong)
            if self._wlog is not None:
                self._wlog_bad = True  # table writes can't be carried
            t.set(key, self._merge(m, val, t.get(key)))
            return
        if tgt[0] != "name":
            raise Unvectorizable(f"masked write to {tgt[0]}")
        scope = env.lookup(tgt[1])
        if scope is None:
            scope = env.root()
            old = None
        else:
            old = scope.vars[tgt[1]]
        self._log_write(scope, tgt[1])
        if scope.parent is None and self._vframes:
            # a GLOBAL write escapes the call: lanes outside the call's
            # entry mask must keep their old value
            entry = self._vframes[-1].entry
            if entry is not None:
                m = m & entry
        scope.vars[tgt[1]] = self._merge(m, val, old)

    # -------------------------------------------------------- call/frames
    def call(self, fn, args):
        if not isinstance(fn, LuaFunction):
            if any(isinstance(a, _MaybeNil) for a in args):
                # host builtins take plain values: unwrap (active lanes
                # must be non-nil) and re-attach the nil lanes to the
                # numeric results
                nil = None
                plain = []
                for a in args:
                    v, n = self._unwrap_arith(a) if isinstance(
                        a, _MaybeNil) else (a, None)
                    if n is not None:
                        nil = n if nil is None else (nil | n)
                    plain.append(v)
                out = super().call(fn, plain)
                return [_MaybeNil.wrap(v, nil)
                        if (isinstance(v, (np.ndarray, float, int))
                            or _is_traced(v))
                        and not isinstance(v, bool) else v
                        for v in out]
            return super().call(fn, args)
        fr = _Frame(entry=self._active_lanes(), mdepth=len(self._masks))
        self._vframes.append(fr)
        env = _Env(fn.env)
        for i, p in enumerate(fn.params):
            env.vars[p] = args[i] if i < len(args) else None
        if fn.vararg:
            env.vars["..."] = tuple(args[len(fn.params):])
        self._depth += 1
        if self._depth == 1:
            self._fuel = self.FUEL
        try:
            self.exec_block(fn.body, env)
        except _Return as r:
            return r.vals
        except _AllReturned:
            pass
        finally:
            self._depth -= 1
            self._vframes.pop()
        if fr.done is None:
            return []  # fell off the end: no values
        never = ~fr.done
        nil = never if fr.nil is None else (fr.nil | never)
        if fr.entry is not None:
            # lanes outside the call's entry mask don't exist for this
            # call; the caller's masked merge discards them anyway
            nil = nil & fr.entry
        if fr.slots is None:
            return [None]  # only nil returns
        if isinstance(nil, np.ndarray) and not nil.any():
            return list(fr.slots)  # traced nil: stay wrapped
        return [_MaybeNil(v, nil) for v in fr.slots]

    def vcall(self, fn, args):
        """Call a script function on array arguments.

        Returns ``(values, nil_mask)``: the merged return-value arrays and
        a bool array marking lanes that returned nil (None if no lane
        did)."""
        vals = self.call(fn, list(args))
        if len(vals) == 1 and vals[0] is None:
            if not args:
                return [], None
            shape = np.broadcast_shapes(*[np.shape(a) for a in args])
            return [], np.ones(shape, bool)
        slot_nils = [v.nil_mask if isinstance(v, _MaybeNil) else None
                     for v in vals]
        nil = _combine_slot_nils(vals, slot_nils)
        out = [v.value if isinstance(v, _MaybeNil) else v for v in vals]
        return out, nil

    # -------------------------------------------------------- expressions
    def _vector_table_read(self, t, key):
        """A lane-varying table READ (debug.lua's ``cols[r+1]``): legal
        for a dense 1..n numeric array-part table.

        Under jax tracing: a clipped gather over the values (clipping is
        safe — lanes with out-of-range keys are masked out by the
        script's own guards, and their garbage is discarded by merges).

        On the np path: the gather is PROVEN equal to per-lane scalar
        reads first — every ACTIVE lane's key must be an integer inside
        1..n (else Unvectorizable, and the scalar fallback remains the
        authority).  This is what lets debug.lua's exact host build run
        whole-grid instead of one interpreter walk per pixel."""
        if t.metatable is not None:
            # a missing key would consult __index per lane on the
            # scalar path — the gather can't reproduce that
            raise Unvectorizable(
                "lane-array read of a table with a metatable")
        arr = t.array()
        if len(arr) != len(t.data) or not all(
                isinstance(v, (int, float)) and not isinstance(v, bool)
                for v in arr):
            raise Unvectorizable("lane-array read of a non-dense table")
        if not arr:
            raise Unvectorizable("lane-array read of an empty table")
        if _is_traced(key):
            import jax
            import jax.numpy as jnp

            dt = (np.float64 if jax.config.jax_enable_x64
                  else np.float32)  # follow the trace precision
            vals = jnp.asarray(np.asarray(arr, dt))
            idx = jnp.clip(jnp.floor(key).astype(jnp.int32) - 1,
                           0, len(arr) - 1)
            return jnp.take(vals, idx)
        k = np.asarray(key)
        m = self._active_lanes()
        act = (np.ones(k.shape, bool) if m is None
               else np.broadcast_to(m, k.shape))
        with np.errstate(invalid="ignore"):
            kf = np.floor(k)
            ok = (kf == k) & (kf >= 1) & (kf <= len(arr))
        if bool((act & ~ok).any()):
            raise Unvectorizable(
                "table key out of range / non-integer on active lanes")
        idx = np.clip(np.nan_to_num(kf, nan=1.0), 1, len(arr)).astype(
            np.int64) - 1
        return np.asarray(arr, np.float64)[idx]

    def _active_lanes(self):
        """The lanes actually executing right now: the relative eff mask
        intersected with the current call's entry mask (a callee runs
        only for its caller's lanes)."""
        m = self._eff_mask()
        if self._vframes and self._vframes[-1].entry is not None:
            entry = self._vframes[-1].entry
            m = entry if m is None else (m & entry)
        return m

    def _truthy_ctx(self, v):
        """Truthiness that accounts for per-lane nil: legal only when no
        ACTIVE lane is nil (inactive nil lanes are merged away later).
        Traced nil masks can't be inspected — use Lua's exact rule
        directly: nil lanes are falsy, numeric lanes truthy."""
        if isinstance(v, _MaybeNil):
            m = self._active_lanes()
            active_nil = v.nil_mask if m is None else (v.nil_mask & m)
            if isinstance(active_nil, np.ndarray):
                if active_nil.any():
                    raise Unvectorizable("truthiness of nil lanes")
                return _truthiness(v.value)
            uni, tv = _truthiness(v.value)
            nilm = v.nil_mask
            if uni:
                t = (~nilm) if tv else (nilm & ~nilm)  # all-false lanes
            else:
                t = tv & ~nilm
            return False, t
        return _truthiness(v)

    def _unwrap_arith(self, v):
        """-> (value, nil_mask-or-None); Unvectorizable if an active lane
        would do arithmetic on nil (the scalar path then reproduces
        Lua's real error/handling for it).  Traced masks can't be
        inspected: propagate optimistically — nil lanes carry garbage
        that the final validity merge discards, exactly the hand-ports'
        masked view (a lane the scalar path would ERROR on is the
        caller's bug either way)."""
        if isinstance(v, _MaybeNil):
            m = self._active_lanes()
            active_nil = v.nil_mask if m is None else (v.nil_mask & m)
            if isinstance(active_nil, np.ndarray) and active_nil.any():
                raise Unvectorizable("arithmetic on nil lanes")
            return v.value, v.nil_mask
        return v, None

    def _mm_truth(self, v):
        """A comparison metamethod (__lt/__le/__eq) returning a LANE
        array cannot collapse to one bool (table-vs-table comparisons
        take the scalar fast path, so the operand-level array refusal
        in _binop never sees them) — refuse; the scalar walk is the
        authority."""
        if _is_arr(v) or isinstance(v, _MaybeNil) or _is_traced(v):
            raise Unvectorizable(
                "lane-array comparison metamethod result")
        return _truthy(v)

    def _mask_ctx(self):
        """A snapshot of the current mask state by object identity
        (strong refs — held by the table — keep the identity comparison
        sound against id reuse)."""
        fr = self._vframes[-1] if self._vframes else None
        return (tuple(self._masks), fr,
                fr.done if fr is not None else None,
                tuple(lp.broke for lp in fr.loops) if fr is not None
                else ())

    def _same_mask_ctx(self, ctx):
        cur = self._mask_ctx()
        return (len(ctx[0]) == len(cur[0])
                and all(a is b for a, b in zip(ctx[0], cur[0]))
                and ctx[1] is cur[1] and ctx[2] is cur[2]
                and len(ctx[3]) == len(cur[3])
                and all(a is b for a, b in zip(ctx[3], cur[3])))

    def eval(self, e, env):
        kind = e[0]
        if kind == "table":
            t = super().eval(e, env)
            if self._active_lanes() is not None:
                # record the creation context for the masked
                # setmetatable freshness check
                t.vec_ctx = self._mask_ctx()
            return t
        if kind == "index":
            t = self.eval(e[1], env)
            if not isinstance(t, (LuaTable, str)):
                raise LuaError(f"attempt to index a non-table value ({e[1]})")
            key = self.eval(e[2], env)
            if isinstance(key, _MaybeNil) and _is_arr(key.value):
                # maybe-nil lane-array key (debug.lua's cols[r+1] where
                # r is the guarded row): _unwrap_arith verifies no
                # ACTIVE lane is nil on the np path (raises otherwise —
                # scalar authority) and is optimistic under tracing
                key, _ = self._unwrap_arith(key)
            if _is_arr(key):
                if not isinstance(t, LuaTable):
                    raise Unvectorizable("lane-array index of a string")
                return self._vector_table_read(t, key)
            # scalar key: through the base __index chain (metatables
            # behave exactly like the scalar engine for uniform values)
            return self._index_value(t, _scalar_key(key))
        if kind == "unop":
            if e[1] == "not":
                uni, cv = self._truthy_ctx(self.eval(e[2], env))
                return (not cv) if uni else ~cv
            if e[1] == "-":
                v0 = self.eval(e[2], env)
                if isinstance(v0, LuaTable):
                    return self._unm_value(v0)  # __unm on a uniform table
                v, vnil = self._unwrap_arith(v0)
                with np.errstate(all="ignore"):
                    return _MaybeNil.wrap(-_as_float(v), vnil)
        if kind == "binop":
            op = e[1]
            if op in ("and", "or"):
                left = self.eval(e[2], env)
                uni, lv = self._truthy_ctx(left)
                if uni:
                    if op == "and":
                        return self.eval(e[3], env) if lv else left
                    return left if lv else self.eval(e[3], env)
                try:
                    with np.errstate(all="ignore"):
                        right = self.eval(e[3], env)
                except (LuaError, TypeError) as err:
                    # the scalar path short-circuits: lanes where the
                    # left side decides may never evaluate the right —
                    # an error here may not exist per-lane, so refuse
                    raise Unvectorizable(
                        f"error in and/or right side: {err}") from err
                # left is a bool array: select per lane (both sides were
                # evaluated; any untaken-lane domain error is a NaN the
                # selection discards, same as a masked-if arm)
                lval, lnil = self._unwrap_arith(left) if isinstance(
                    left, _MaybeNil) else (left, None)
                rval, rnil = self._unwrap_arith(right) if isinstance(
                    right, _MaybeNil) else (right, None)
                for v in (lval, rval):
                    if v is None or isinstance(v, (str, LuaTable,
                                                   LuaFunction)):
                        raise Unvectorizable(
                            "and/or selecting a non-numeric lane value")
                nil = (lnil if rnil is None else
                       rnil if lnil is None else (lnil | rnil))
                where = (xm.where if any(map(_is_traced, (lv, lval, rval)))
                         else np.where)
                if op == "and":
                    return _MaybeNil.wrap(where(lv, rval, lval), nil)
                return _MaybeNil.wrap(where(lv, lval, rval), nil)
            if op in ("==", "~=", "<", ">", "<=", ">=", "+", "-", "*", "/",
                      "%", "^", ".."):
                with np.errstate(all="ignore"):
                    a = self.eval(e[2], env)
                    b = self.eval(e[3], env)
                    if isinstance(a, _MaybeNil) or isinstance(b, _MaybeNil):
                        if op in ("==", "~=") and (a is None or b is None):
                            # comparing a maybe-nil against nil queries
                            # exactly its per-lane definedness
                            mn = a if b is None else b
                            return (mn.nil_mask if op == "=="
                                    else ~mn.nil_mask)
                        av, anil = self._unwrap_arith(a)
                        bv, bnil = self._unwrap_arith(b)
                        nil = (anil if bnil is None else
                               bnil if anil is None else (anil | bnil))
                        res = self._binop(op, av, bv)
                        if isinstance(res, LuaTable):
                            # a metamethod returned a table: _MaybeNil
                            # wraps value arrays, not tables.  Safe to
                            # return raw — _unwrap_arith already proved
                            # no ACTIVE lane was nil on the np path, and
                            # the traced path is optimistic-nil by the
                            # pinned policy.
                            return res
                        return _MaybeNil.wrap(res, nil)
                    return self._binop(op, a, b)
        return super().eval(e, env)

    def _binop(self, op, a, b):
        arr = _is_arr(a) or _is_arr(b)
        if not arr:
            # scalar fast path: identical to the base interpreter
            return super().eval(("binop", op, ("const", a), ("const", b)),
                                self.globals)
        if op == "==" or op == "~=":
            def _is_boolarr(v):
                return _is_arr(v) and getattr(v, "dtype", None) == bool

            if _is_boolarr(a) or _is_boolarr(b):
                # bool lane arrays (comparison results) compare
                # elementwise against bool values/arrays; against any
                # other type Lua == is uniformly false
                other = b if _is_boolarr(a) else a
                if isinstance(other, bool) or _is_boolarr(other):
                    eq = a == b
                    return eq if op == "==" else ~eq
                return False if op == "==" else True
            prim = (type(None), bool, str, LuaTable, LuaFunction)
            if isinstance(a, prim) or isinstance(b, prim):
                # one side is a NUMERIC lane array; Lua == across types
                # is false with no coercion (nil/bool/table/string
                # never equals a number) — uniformly False
                return False if op == "==" else True
            eq = _as_float(a) == _as_float(b)
            return eq if op == "==" else ~eq
        if op == "..":
            raise Unvectorizable("string concat on arrays")
        for v in (a, b):
            if isinstance(v, LuaTable):
                if op in self._ARITH_EVENTS:
                    # an arithmetic metamethod is just a script function:
                    # dispatch it through the normal (vector-aware) call
                    # machinery — array operands flow elementwise, and
                    # genuinely per-lane control inside the handler still
                    # refuses.  Tables without a handler error exactly
                    # like the scalar engine.
                    return self._arith_event(op, a, b)
                # comparison handlers return TRUTHINESS — the base _less
                # collapses an array result to uniform True, so refuse
                # (scalar authority)
                raise Unvectorizable("metamethod comparison on arrays")
        a = _as_float(a)
        b = _as_float(b)
        if op == "<":
            return a < b
        if op == ">":
            return a > b
        if op == "<=":
            return a <= b
        if op == ">=":
            return a >= b
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b  # IEEE, matching the scalar engine (C division)
        if op == "%":
            return a - xm.xp(a, b).floor(a / b) * b  # Lua %, as scalar
        if op == "^":
            return xm.power(a, b)  # glibc pow == C99 == the scalar engine
        raise LuaError(f"cannot evaluate binop {op}")
