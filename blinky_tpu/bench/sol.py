"""Speed-of-light probes: reproduce docs/PERF.md's roofline measurements.

The kernel-formulation hunt behind the remap engine (``docs/PERF.md``
§1-2, §6) concluded that XLA's native row gather is optimal on v5e and
that every Pallas alternative loses.  This module ships those
measurements as runnable probes (``python bench.py --sol``) so the
conclusions stay reproducible on any chip — and so the losing Pallas
formulations exist in-repo as code, not just prose:

* ``stream_copy`` — HBM streaming roofline (read+write); the remap's
  upper bound.
* ``row_gather`` — the shipped kernel's primitive: ``jnp.take`` of
  B-byte rows, reported as ns/index (PERF §1: ~21 ns at B=1024).
* ``element_gather`` — per-index floor with nothing to amortize: the
  per-frame-pose wall (PERF §6: ~13.4 ns/index).
* ``mxu_matmul`` — int8/bf16 MAC rate at the one-hot gather shapes
  (PERF §2: ~81 TMAC/s either way; no int8 speedup through this path).
* ``pallas_onehot_gather`` — the full losing formulation: per-window
  one-hot matrices contracted against VMEM-resident source chunks on
  the MXU (a real Pallas kernel; correctness is pinned in tests).
* ``pallas_stream_read`` — streaming read bandwidth through Pallas's
  pipelined grid blocks (validates the Pallas DMA path itself).

Timing follows bench/throughput.py: the op runs in an on-device
``fori_loop`` with loop-carried data dependencies (no relay round-trips
inside the measurement, no loop-invariant hoisting), synchronized by a
one-element fetch (``utils.timing.device_fetch_sync``).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from blinky_tpu.utils.timing import device_fetch_sync


def _run_timed(jitted, *args, warmup: bool = True):
    """Run a jitted probe, sync through the relay, return seconds."""
    if warmup:
        device_fetch_sync(jitted(*args))
    t0 = time.perf_counter()
    out = jitted(*args)
    device_fetch_sync(out)
    return time.perf_counter() - t0


# --------------------------------------------------------------- probes


def stream_copy(nbytes: int, iters: int = 8) -> dict:
    """HBM streaming roofline: read+write *nbytes* per iteration.

    The array is the loop carry, so every iteration materializes a full
    copy (an elementwise-fused ``y[0,0]`` would compute one element)."""
    n = max(nbytes // 1024, 8)
    x = jnp.zeros((n, 1024), jnp.uint8)

    @jax.jit
    def probe(x):
        def body(i, x):
            return x + (i & 1).astype(jnp.uint8)

        return jax.lax.fori_loop(0, iters, body, x)

    t = _run_timed(probe, x) / iters  # ms is per-iteration, like every probe
    return dict(probe="stream_copy", bytes=n * 1024, iters=iters,
                ms=round(t * 1e3, 3), gbps=round(2.0 * n * 1024 / t / 1e9, 1))


def _gather_probe(name, src_shape, n_idx, iters, row: bool) -> dict:
    """Shared body for the row/element gather probes."""
    R = src_shape[0]
    src = jnp.zeros(src_shape, jnp.uint8)
    idx = jnp.arange(n_idx, dtype=jnp.int32) * 7919 % R  # scattered

    @jax.jit
    def probe(src, idx):
        def body(i, carry):
            idx_i, acc = carry
            out = jnp.take(src, idx_i, axis=0)
            # consume the output; perturb one index so the gather is not
            # loop-invariant (bench/throughput.py pattern)
            acc = acc + out[(0,) * out.ndim].astype(jnp.int32)
            idx_i = idx_i.at[0].set((idx_i[0] + 1) % R)
            return idx_i, acc

        return jax.lax.fori_loop(0, iters, body, (idx, jnp.int32(0)))[1]

    t = _run_timed(probe, src, idx)
    per_index_ns = t / iters / n_idx * 1e9
    row_bytes = int(np.prod(src_shape[1:])) if row else 1
    return dict(probe=name, rows=R, n_idx=n_idx, row_bytes=row_bytes,
                iters=iters, ms=round(t / iters * 1e3, 3),
                ns_per_index=round(per_index_ns, 2),
                gbps=round(n_idx * row_bytes * 2 / (t / iters) / 1e9, 1))


def row_gather(n_rows: int, row_bytes: int, n_idx: int,
               iters: int = 4) -> dict:
    """The shipped remap primitive: gather *n_idx* rows of *row_bytes*
    (the batch lane) — PERF §1's ~21 ns/index at B=1024."""
    return _gather_probe("row_gather", (n_rows, row_bytes), n_idx, iters,
                         row=True)


def element_gather(n_elems: int, n_idx: int, iters: int = 4) -> dict:
    """Independent u8 element gathers: the per-frame-pose floor
    (PERF §6: ~13.4 ns/index; nothing to amortize per index)."""
    return _gather_probe("element_gather", (n_elems,), n_idx, iters,
                         row=False)


def mxu_matmul(m: int, k: int, n: int, dtype: str = "int8",
               iters: int = 256) -> dict:
    """MAC rate at the one-hot gather shapes (PERF §2).  On v5e the int8
    path through this formulation runs at the bf16 rate (~81 TMAC/s)."""
    dt = jnp.int8 if dtype == "int8" else jnp.bfloat16
    acc_dt = jnp.int32 if dtype == "int8" else jnp.float32
    a = jnp.ones((m, k), dt)
    b = jnp.ones((k, n), dt)

    @jax.jit
    def probe(a, b):
        def body(i, carry):
            a_i, acc = carry
            out = jax.lax.dot_general(a_i, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt)
            acc = acc + out[0, 0].astype(jnp.float32)
            a_i = a_i.at[0, 0].add(1)  # not loop-invariant
            return a_i, acc

        return jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0)))[1]

    t = _run_timed(probe, a, b)
    macs = float(m) * k * n * iters
    return dict(probe="mxu_matmul", m=m, k=k, n=n, dtype=dtype, iters=iters,
                ms=round(t / iters * 1e3, 4),
                tmacs=round(macs / t / 1e12, 1))


# ------------------------------------------------- the Pallas formulations


def _onehot_kernel(idx_ref, src_ref, out_ref):
    """One locality window of the one-hot MXU gather (PERF §2): rows
    ``idx`` of the window's [R, B] source chunk, as ``onehot[T, R] @
    chunk[R, B]`` on the MXU."""
    T = idx_ref.shape[2]
    R = src_ref.shape[1]
    idx = idx_ref[0, 0, :]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
    onehot = (iota_r == idx[:, None]).astype(jnp.int8)
    out = jax.lax.dot_general(
        onehot, src_ref[0].astype(jnp.int8), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[0] = out.astype(jnp.uint8)


def pallas_onehot_gather_call(idx, src, interpret: bool = False):
    """``idx`` [W, T] i32 (row within window), ``src`` [W, R, B] u8 ->
    [W, T, B] u8: the measured-slower MXU gather, one window per grid
    step.  Source values must be < 128 (the MXU path is int8)."""
    from jax.experimental import pallas as pl

    W, T = idx.shape
    _, R, B = src.shape
    # idx rides as [W, 1, T] so the block's trailing dims equal the
    # array's (the TPU lowering's block-shape divisibility rule)
    return pl.pallas_call(
        _onehot_kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, R, B), lambda w: (w, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, B), lambda w: (w, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((W, T, B), jnp.uint8),
        interpret=interpret,
    )(idx[:, None, :], src)


def pallas_onehot_gather(windows: int, t_rows: int, r_rows: int,
                         row_bytes: int, iters: int = 4,
                         screen_pixels: int = 1920 * 1080,
                         interpret: bool = False) -> dict:
    """Time the one-hot formulation and extrapolate to a full screen
    (PERF §2 measured 54 ms for the dots alone vs 43 ms total for
    XLA's gather)."""
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, r_rows, (windows, t_rows)), jnp.int32)
    src = jnp.asarray(
        rng.integers(0, 128, (windows, r_rows, row_bytes)), jnp.uint8)
    call = functools.partial(pallas_onehot_gather_call, interpret=interpret)

    @jax.jit
    def probe(idx, src):
        def body(i, carry):
            idx_i, acc = carry
            out = call(idx_i, src)
            acc = acc + out[0, 0, 0].astype(jnp.int32)
            idx_i = idx_i.at[0, 0].set((idx_i[0, 0] + 1) % r_rows)
            return idx_i, acc

        return jax.lax.fori_loop(0, iters, body, (idx, jnp.int32(0)))[1]

    t = _run_timed(probe, idx, src) / iters
    macs = float(windows) * t_rows * r_rows * row_bytes
    full_windows = -(-screen_pixels // t_rows)
    return dict(probe="pallas_onehot_gather", windows=windows, T=t_rows,
                R=r_rows, B=row_bytes, iters=iters, ms=round(t * 1e3, 3),
                tmacs=round(macs / t / 1e12, 1),
                full_screen_ms=round(t * full_windows / windows * 1e3, 1),
                ns_per_index=round(t / (windows * t_rows) * 1e9, 2))


def _stream_read_kernel(x_ref, out_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.int32(0)

    out_ref[0, 0] += jnp.sum(x_ref[:].astype(jnp.int32))


def pallas_stream_read(nbytes: int, block_rows: int = 2048,
                       iters: int = 4, interpret: bool = False) -> dict:
    """Streaming read bandwidth through Pallas's pipelined grid blocks
    (automatic double buffering) — the in-repo validation that manual
    kernels can saturate the DMA path the remap ultimately rides."""
    from jax.experimental import pallas as pl

    rows = max(nbytes // 1024 // block_rows, 1) * block_rows
    x = jnp.ones((rows, 1024), jnp.uint8)

    from jax.experimental.pallas import tpu as pltpu

    def call(x):
        return pl.pallas_call(
            _stream_read_kernel,
            grid=(rows // block_rows,),
            in_specs=[pl.BlockSpec((block_rows, 1024), lambda i: (i, 0))],
            # a (1, 1) scalar accumulator lives in SMEM; the TPU grid is
            # sequential so += across grid steps is well-defined
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            interpret=interpret,
        )(x)

    @jax.jit
    def probe(x):
        def body(i, carry):
            x_i, acc = carry
            acc = acc + call(x_i)[0, 0]
            x_i = x_i.at[0, 0].set((i & 1).astype(jnp.uint8))
            return x_i, acc

        return jax.lax.fori_loop(0, iters, body, (x, jnp.int32(0)))[1]

    t = _run_timed(probe, x) / iters
    return dict(probe="pallas_stream_read", bytes=rows * 1024, iters=iters,
                ms=round(t * 1e3, 3),
                gbps=round(rows * 1024 / t / 1e9, 1))


# ----------------------------------------------------------------- runner


def run_sol(quick: bool = False, interpret: bool = False) -> list:
    """Run every probe; one result dict each (never raises — a probe
    failure is reported in its dict)."""
    GB = 1 << 30
    if quick:
        specs = [
            (stream_copy, dict(nbytes=1 << 22, iters=2)),
            (row_gather, dict(n_rows=1 << 14, row_bytes=128, n_idx=1 << 14,
                              iters=2)),
            (element_gather, dict(n_elems=1 << 16, n_idx=1 << 14, iters=2)),
            (mxu_matmul, dict(m=128, k=256, n=128, dtype="int8", iters=4)),
            (mxu_matmul, dict(m=128, k=256, n=128, dtype="bf16", iters=4)),
            (pallas_onehot_gather, dict(windows=2, t_rows=128, r_rows=256,
                                        row_bytes=128, iters=2,
                                        interpret=interpret)),
            (pallas_stream_read, dict(nbytes=1 << 22, block_rows=512,
                                      iters=2, interpret=interpret)),
        ]
    else:
        # the docs/PERF.md shapes: 1080p screen (2.07 M pixels), 1080
        # platesize, B=1024 batch lanes
        n_pix = 1920 * 1080
        specs = [
            (stream_copy, dict(nbytes=1 * GB)),
            (row_gather, dict(n_rows=6 * 1080 * 1080, row_bytes=1024,
                              n_idx=n_pix)),
            (row_gather, dict(n_rows=6 * 1080 * 1080, row_bytes=128,
                              n_idx=n_pix)),
            (element_gather, dict(n_elems=1 << 24, n_idx=1 << 23)),
            (mxu_matmul, dict(m=384, k=2048, n=1024, dtype="int8")),
            (mxu_matmul, dict(m=384, k=2048, n=1024, dtype="bf16")),
            (pallas_onehot_gather, dict(windows=64, t_rows=384, r_rows=2048,
                                        row_bytes=1024,
                                        interpret=interpret)),
            (pallas_stream_read, dict(nbytes=1 * GB, interpret=interpret)),
        ]
    results = []
    for fn, kw in specs:
        try:
            results.append(fn(**kw))
        except Exception as e:  # keep probing: partial data beats none
            results.append(dict(probe=fn.__name__, error=f"{type(e).__name__}: {e}",
                                **{k: v for k, v in kw.items()
                                   if isinstance(v, (int, str))}))
    return results
