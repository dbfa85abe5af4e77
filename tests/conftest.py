"""Test config: CPU backend with 8 virtual devices, x64 enabled.

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the
platform must be forced via jax.config before first backend use.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

np.seterr(all="ignore")  # lens math relies on IEEE nan/inf like the Lua


@pytest.fixture(scope="session")
def cube_globe():
    from blinky_tpu import globes

    return globes.get("cube")


@pytest.fixture(scope="session")
def palette():
    from blinky_tpu.palette import default_palette

    return default_palette()
