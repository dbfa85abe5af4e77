"""Speed-of-light probe suite (bench/sol.py): structure + kernel
correctness at toy sizes on the CPU mesh (interpret-mode Pallas)."""

import numpy as np

from blinky_tpu.bench.sol import pallas_onehot_gather_call, run_sol


def test_run_sol_quick_structure():
    results = run_sol(quick=True, interpret=True)
    by_name = {}
    for r in results:
        assert "error" not in r, f"probe failed: {r}"
        by_name.setdefault(r["probe"], r)
    assert set(by_name) == {
        "stream_copy", "row_gather", "element_gather", "mxu_matmul",
        "pallas_onehot_gather", "pallas_stream_read",
    }
    assert by_name["stream_copy"]["gbps"] > 0
    assert by_name["row_gather"]["ns_per_index"] > 0
    assert by_name["pallas_onehot_gather"]["full_screen_ms"] > 0


def test_onehot_gather_kernel_is_a_gather():
    """The losing MXU formulation must still BE a gather: window w, row
    t of the output equals source row idx[w, t]."""
    rng = np.random.default_rng(11)
    W, T, R, B = 2, 16, 32, 128
    idx = rng.integers(0, R, (W, T)).astype(np.int32)
    src = rng.integers(0, 128, (W, R, B)).astype(np.uint8)  # int8-safe
    out = np.asarray(pallas_onehot_gather_call(
        np.asarray(idx), np.asarray(src), interpret=True))
    expect = np.stack([src[w, idx[w]] for w in range(W)])
    np.testing.assert_array_equal(out, expect)
