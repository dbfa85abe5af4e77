"""Test config: CPU backend with 8 virtual devices, x64 enabled.

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the
platform must be forced via jax.config before first backend use.

TPU tier (VERDICT r3 task 5): ``BLINKY_TPU_TESTS=1 pytest -m tpu``
re-pins the TPU-exactness claims on the real chip (tests/test_tpu.py).
The opt-in must be the dedicated variable — NOT ``JAX_PLATFORMS``,
which is ambiently ``axon`` on the bench VM — and it leaves the CPU
force and x64 off (the chip has no f64); ``tpu``-marked tests
auto-skip on the default CPU mesh.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

TPU_RUN = os.environ.get("BLINKY_TPU_TESTS", "") == "1"
if not TPU_RUN:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

np.seterr(all="ignore")  # lens math relies on IEEE nan/inf like the Lua


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs the real TPU chip (run BLINKY_TPU_TESTS=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    if TPU_RUN:
        return
    skip = pytest.mark.skip(
        reason="TPU tier: run with BLINKY_TPU_TESTS=1 pytest -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cube_globe():
    from blinky_tpu import globes

    return globes.get("cube")


@pytest.fixture(scope="session")
def palette():
    from blinky_tpu.palette import default_palette

    return default_palette()
