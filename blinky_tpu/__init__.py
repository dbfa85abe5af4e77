"""blinky-tpu: a TPU-native batched image-reprojection framework.

Re-creation of the capability surface of shaunlebron/blinky (the fisheye /
panoramic / cartographic-projection Quake engine mod, reference mounted at
/root/reference) as a from-scratch JAX / XLA / Pallas framework:

* **globes** — multi-camera plate layouts (reference: Lua ``plates`` tables,
  ``engine/NQ/fisheye.c:334-377`` and ``game/lua-scripts/globes/``) become
  :class:`blinky_tpu.globes.Globe` dataclasses with jnp plate frames.
* **lenses** — 31 forward/inverse map projections (reference:
  ``game/lua-scripts/lenses/*.lua``) become pure, dtype-generic array
  functions registered in :mod:`blinky_tpu.lenses`.
* **lensmap** — the per-screen-pixel -> (plate, px, py, tint) gather table
  (reference: pointer table built by ``create_lensmap``,
  ``engine/NQ/fisheye.c:2346-2397``) built by a jitted vmapped builder, with
  the same f_fov / f_vfov / f_cover / f_contain zoom solvers
  (``fisheye.c:1293-1386``).
* **kernels** — the per-frame remap blit (reference: ``render_lensmap``,
  ``fisheye.c:2406-2424``) as a fused batched gather + tint-palette +
  RGB-decode kernel over frame batches laid out batch-innermost so the
  gather is an embedding-style row lookup on TPU.
* **parity** — a NumPy float64 oracle transcribing the reference math for
  bit-exact table/frame validation (the reference itself has no tests;
  see SURVEY.md §4).

Public entry points:
    >>> import blinky_tpu as bt
    >>> sess = bt.Session(width=640, height=480)
    >>> sess.cmd("f_lens panini"); sess.cmd("f_fov 180")
    >>> out = sess.render(frames)          # [6,S,S,B] u8 -> [H,W,B] u8
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_jit_cache():
    """Persist compiled executables across processes (lens-switch first
    compiles run 5-45 s on a cold backend; warm cache makes them ms-scale).
    Opt out with BLINKY_TPU_NO_JIT_CACHE=1 or by setting
    JAX_COMPILATION_CACHE_DIR yourself."""
    if _os.environ.get("BLINKY_TPU_NO_JIT_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it via env
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.path.join(
                _os.path.expanduser("~"), ".cache", "blinky_tpu", "jax"
            )
            _os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only


_enable_persistent_jit_cache()

from blinky_tpu import geometry, palette  # noqa: F401,E402


def __getattr__(name):
    # Lazy: the Session pulls in jax/jit machinery; keep bare imports cheap.
    if name == "Session":
        from blinky_tpu.api import Session

        return Session
    raise AttributeError(name)
