"""Fused polylines kernel (interpret mode) vs the XLA implementation."""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu.ops import depth as depth_ops
from comfystereo_tpu.ops import polylines
from comfystereo_tpu.utils import fixtures

H, W = 40, 56


def _run(impl, fill, div):
    img = fixtures.create_test_image(H, W).astype(np.float32)
    depth = fixtures.create_depth_map(H, W).astype(np.float32)
    nd = depth_ops.normalize_depth(jnp.asarray(depth[None])) - 0.5
    out = polylines.apply_polylines(
        jnp.asarray(img[None]), nd, (div / 100.0) * W, 0.0, 2.0,
        sharp=(fill == "sharp"), impl=impl)
    return np.asarray(out)[0]


@pytest.mark.parametrize("fill", ["sharp", "soft"])
@pytest.mark.parametrize("div", [4.5, -4.5])
def test_fused_matches_xla(fill, div):
    a = _run("xla", fill, div)
    b = _run("pallas", fill, div)
    err = np.abs(a - b)
    assert err.mean() < 0.05, err.mean()
    assert (err > 1).mean() < 0.001
