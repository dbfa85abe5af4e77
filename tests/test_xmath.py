"""Contracts of the backend-generic math helpers (`blinky_tpu/xmath.py`),
in particular `repeat_until` — the vectorized analog of the Lua
``repeat ... until`` loops the iterative lenses use
(``mollweide.lua:12-20``, ``winkeltripel.lua:38-77``)."""

import numpy as np

from blinky_tpu import xmath


def _newton_sqrt_state(targets, iters=50):
    """Newton sqrt with per-element exit, state-threaded (the documented
    contract: captured per-element arrays ride in the state tuple)."""

    def body(state):
        x, t = state
        nx = 0.5 * (x + t / x)
        return (nx, t), np.abs(nx * nx - t) < 1e-12

    return xmath.repeat_until(body, (np.ones_like(targets), targets), iters)


def test_repeat_until_active_set_matches_dense():
    rng = np.random.default_rng(7)
    t = rng.uniform(0.1, 100.0, 4097)
    (x, _t) = _newton_sqrt_state(t)
    np.testing.assert_allclose(x, np.sqrt(t), rtol=1e-9)

    # dense reference: same body run with a full-size mask, no compaction
    xs = np.ones_like(t)
    active = np.ones(t.shape, bool)
    for _ in range(50):
        nx = 0.5 * (xs + t / xs)
        ex = np.abs(nx * nx - t) < 1e-12
        xs = np.where(active, nx, xs)
        active &= ~ex
    np.testing.assert_array_equal(x, xs)


def test_repeat_until_legacy_closure_body_falls_back_dense():
    """A body that captures full-size arrays in its closure (the
    pre-compaction user-lens pattern from docs/SCRIPTING.md examples)
    must still work: the compacted call shape-errors and the loop
    restarts densely."""
    rng = np.random.default_rng(3)
    t = rng.uniform(0.5, 9.0, 513)  # odd size; elements exit at
    # different rounds, so compaction definitely kicks in

    def legacy_body(state):
        (x,) = state
        nx = 0.5 * (x + t / x)  # t captured at full size -> breaks on
        # a compacted working set
        return (nx,), np.abs(nx * nx - t) < 1e-12

    (x,) = xmath.repeat_until(legacy_body, (np.ones_like(t),), 60)
    np.testing.assert_allclose(x, np.sqrt(t), rtol=1e-9)


def test_repeat_until_jax_matches_numpy():
    import jax.numpy as jnp

    t = np.linspace(0.25, 16.0, 257)

    def body(state):
        x, tt = state
        xp = xmath.xp(x)
        nx = 0.5 * (x + tt / x)
        return (nx, tt), xp.abs(nx * nx - tt) < 1e-12

    (xn, _) = xmath.repeat_until(body, (np.ones_like(t), t), 40)
    (xj, _) = xmath.repeat_until(body, (jnp.ones(t.shape), jnp.asarray(t)), 40)
    np.testing.assert_allclose(np.asarray(xj), xn, rtol=1e-5)
