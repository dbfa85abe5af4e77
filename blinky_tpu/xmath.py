"""Dual-backend math shim: one source of truth for lens/globe formulas.

The reference evaluates lens math in Lua doubles through libm
(``engine/NQ/fisheye.c:1222-1265`` preloads ``cos``/``sin``/``tan``/... as
Lua globals).  Here every projection formula is written exactly once against
this module and runs under two backends:

* **NumPy float64** — the parity oracle (:mod:`blinky_tpu.parity`), playing
  the role of the reference's double-precision Lua interpreter.
* **jax.numpy** — the jitted lensmap builder (:mod:`blinky_tpu.lensmap`),
  traced once per (lens, globe, zoom, size) and compiled by XLA.

Dispatch rule: if any argument is a jax array/tracer, use ``jnp``; otherwise
``np``.  Python scalars follow NumPy (load-time metadata math, mirroring the
Lua scripts' top-level code such as ``gins8.lua:21-24``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _is_jax(a) -> bool:
    return isinstance(a, jax.Array) or hasattr(a, "aval")


def xp(*args):
    """Return the array namespace (np or jnp) governing *args*."""
    return jnp if any(_is_jax(a) for a in args) else np


# The reference's lens math is Lua 5.2 doubles, and Lua's math.* are raw
# glibc libm calls — but NumPy's SIMD float64 transcendentals differ from
# glibc by 1 ulp on a few percent of inputs (acos/asin/tanh/exp/atan2/...
# — measured, see tests/test_c_reference.py).  The float64 parity path
# therefore routes through an elementwise libm loop in the native library;
# float32 arrays (and the jnp backend) keep their normal vectorized paths.
_LIBM_UNARY = {
    "sin": 0, "cos": 1, "tan": 2, "arcsin": 3, "arccos": 4, "arctan": 5,
    "sinh": 6, "cosh": 7, "tanh": 8, "log": 9, "log10": 10, "exp": 11,
    "sqrt": 12,
}
_LIBM_BINARY = {"arctan2": 0, "fmod": 1, "power": 2, "hypot": 3}
_native = None


def _libm():
    global _native
    if _native is None:
        from blinky_tpu import native

        _native = native
    return _native


def _wants_libm(*arrs) -> bool:
    return all(a.dtype.kind in "iuf" and a.dtype != np.float32 for a in arrs)


def _match_shape(out, x):
    if isinstance(x, np.ndarray) and x.ndim:
        return out
    return np.float64(out[()])  # scalar in -> scalar out, as np ufuncs do


def _unary(name):
    op = _LIBM_UNARY.get(name)

    def f(x):
        xp_ = xp(x)
        if xp_ is np and op is not None:
            arr = np.asarray(x)
            if _wants_libm(arr):
                out = _libm().libm_unary(op, arr)
                if out is not None:
                    return _match_shape(out, x)
        return getattr(xp_, name)(x)

    f.__name__ = name
    return f


def _binary(name):
    op = _LIBM_BINARY.get(name)

    def f(a, b):
        xp_ = xp(a, b)
        if xp_ is np and op is not None:
            aa, bb = np.asarray(a), np.asarray(b)
            if _wants_libm(aa, bb):
                a2, b2 = np.broadcast_arrays(aa, bb)
                out = _libm().libm_binary(op, a2, b2)
                if out is not None:
                    out = out.reshape(a2.shape)
                    if isinstance(a, np.ndarray) and a.ndim or isinstance(b, np.ndarray) and b.ndim:
                        return out
                    return np.float64(out[()])
        return getattr(xp_, name)(a, b)

    f.__name__ = name
    return f


sin = _unary("sin")
cos = _unary("cos")
tan = _unary("tan")
asin = _unary("arcsin")
acos = _unary("arccos")
atan = _unary("arctan")
sinh = _unary("sinh")
cosh = _unary("cosh")
tanh = _unary("tanh")
log = _unary("log")
log10 = _unary("log10")
exp = _unary("exp")
sqrt = _unary("sqrt")
abs = _unary("abs")  # noqa: A001 - mirrors the Lua alias table
floor = _unary("floor")
trunc = _unary("trunc")
sign = _unary("sign")

atan2 = _binary("arctan2")
fmod = _binary("fmod")
maximum = _binary("maximum")
minimum = _binary("minimum")
power = _binary("power")

pi = float(np.pi)
tau = 2.0 * float(np.pi)


def where(c, a, b):
    return xp(c, a, b).where(c, a, b)


def modf(x):
    """Lua ``math.modf``: returns (integer part toward zero, fractional part).

    NumPy's modf returns (frac, int) — we swap to Lua's (int, frac) order
    since the lens scripts (``lenses/cube.lua:14-16``) destructure that way.
    """
    frac, intg = xp(x).modf(x)
    return intg, frac


hypot = _binary("hypot")


def safe_div(a, b, fill=0.0):
    """a/b with b==0 mapped to *fill* — used to keep traced branches finite
    where the Lua relies on IEEE inf/nan propagation being discarded by a
    later ``where``/nil check."""
    x = xp(a, b)
    zero = b == 0
    return x.where(zero, fill, a / x.where(zero, 1.0, b))


def repeat_until(body, state, max_iter):
    """Vectorized Lua ``repeat ... until`` with per-element exit.

    The reference's iterative solvers (``mollweide.lua:12-20``,
    ``winkeltripel.lua:38-77``) run a scalar loop per pixel whose exit
    depends on the data.  Vectorized, each element keeps updating until its
    own exit condition fires, then freezes — which is exactly equivalent to
    the per-pixel scalar loop.

    Args:
        body: ``body(state_tuple) -> (new_state_tuple, exit_bool_array)``.
            Must be shape-preserving and ELEMENTWISE over the state — any
            captured per-element array (solver targets, parameters) must
            ride in the state tuple, because the NumPy path compacts the
            working set to the still-active elements each round.  A body
            that instead captures full-size arrays in its closure (the
            pre-compaction pattern) still works: the compacted call
            raises a shape error and the loop restarts densely.
        state: tuple of arrays (broadcast to a common shape internally).
        max_iter: static iteration cap (NumPy exits early once all elements
            have exited; under jit a fixed masked loop runs — identical
            results since frozen elements are never updated).
    Returns:
        The final state tuple.
    """
    x = xp(*state)
    if x is np:
        # Active-set evaluation: each round runs the body only on the
        # elements that have not exited, compacting the working set as
        # convergence spreads (most pixels of the iterative lenses exit
        # well before the cap, so this is a multi-x win on big grids).
        # Bit-exact vs the dense masked loop: bodies are elementwise (the
        # vectorized-scalar-loop contract above), so every element sees
        # the identical op sequence until its own exit.  (Assumption worth
        # naming: NumPy's float64 transcendentals give length-independent
        # results on a given host — true here and pinned by the golden
        # suite; the f64 *parity* path routes through glibc libm anyway,
        # see native.libm_unary.)
        state = tuple(np.asarray(s, dtype=np.result_type(s, np.float64)) for s in state)
        shape = np.broadcast_shapes(*[s.shape for s in state])
        try:
            flat = [np.broadcast_to(s, shape).reshape(-1).copy() for s in state]
            idx = np.arange(flat[0].size)
            work = tuple(f[idx] for f in flat)
            for _ in range(max_iter):
                if idx.size == 0:
                    break
                new_state, ex = body(work)
                new_state = tuple(np.broadcast_to(n, idx.shape)
                                  for n in new_state)
                for f, n in zip(flat, new_state):
                    f[idx] = n
                keep = ~np.broadcast_to(np.asarray(ex), idx.shape)
                idx = idx[keep]
                work = tuple(n[keep] for n in new_state)
            return tuple(f.reshape(shape) for f in flat)
        except (ValueError, IndexError):
            # A body that captures full-size arrays in its closure (the
            # pre-compaction user-lens pattern) breaks once the working
            # set shrinks; bodies are pure, so restart with the dense
            # masked loop, which keeps the old contract working.
            st = tuple(np.broadcast_to(s, shape).copy() for s in state)
            active = np.ones(shape, dtype=bool)
            for _ in range(max_iter):
                if not active.any():
                    break
                new_state, ex = body(st)
                st = tuple(np.where(active, np.broadcast_to(n, shape), o)
                           for n, o in zip(new_state, st))
                active &= ~np.broadcast_to(np.asarray(ex), shape)
            return st

    import jax

    shape = jnp.broadcast_shapes(*[jnp.shape(s) for s in state])
    state = tuple(jnp.broadcast_to(jnp.asarray(s), shape) for s in state)
    active0 = jnp.ones(shape, dtype=bool)

    def step(_, carry):
        st, active = carry
        new_state, ex = body(st)
        st = tuple(jnp.where(active, n, o) for n, o in zip(new_state, st))
        return st, active & ~ex

    state, _ = jax.lax.fori_loop(0, max_iter, step, (state, active0))
    return state


def asarray_like(value, ref):
    """Make *value* an array of the backend and dtype of *ref*."""
    x = xp(ref)
    dt = getattr(ref, "dtype", None)
    return x.asarray(value, dtype=dt)
