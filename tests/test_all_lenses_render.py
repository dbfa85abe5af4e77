"""Every shipped lens renders end-to-end through the Session on every
globe-compatible default zoom — the `f_lens <tab>` sweep as a test.

This is the integration net under the per-lens math tests: a lens whose
metadata, zoom default, builder path (inverse jit / forward raster), or
remap interaction breaks fails here even if its map functions are fine.
"""

import numpy as np
import pytest

from blinky_tpu import lenses
from blinky_tpu.api import Session
from blinky_tpu.io.cubemap import synthetic_cubemap


@pytest.mark.parametrize("lens_name", lenses.names())
def test_lens_renders_through_session(lens_name):
    s = Session(64, 48, backend="numpy")
    frames = synthetic_cubemap(48)
    s.cmd(f"f_lens {lens_name}")
    assert s.lens_valid, lens_name
    out = np.asarray(s.render(frames))
    assert out.shape == (48, 64)
    lm = s.lensmap
    assert lm is not None and np.asarray(lm.valid).any(), lens_name
    # rendered content where the lensmap is valid and maps to lit texels
    assert out.any(), lens_name
    # rubix overlay composes on every lens too
    tinted = np.asarray(s.render(frames, rubix=True))
    assert tinted.shape == out.shape


@pytest.mark.parametrize("globe_name", ["cube_edge", "cube_corner", "tetra"])
def test_default_lens_renders_on_remaining_globes(globe_name):
    """Globes not covered by the parity matrix still render end-to-end."""
    s = Session(64, 48, backend="numpy")
    s.cmd(f"f_globe {globe_name}")
    assert s.globe_valid
    out = np.asarray(s.render(synthetic_cubemap(48)))
    assert out.any()
