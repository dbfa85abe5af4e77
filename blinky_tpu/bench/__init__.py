"""Benchmark harness (the ``timedemo`` analog)."""

from blinky_tpu.bench.throughput import run_throughput, run_build_bench  # noqa: F401
