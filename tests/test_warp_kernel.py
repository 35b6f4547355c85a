"""Fused Pallas warp kernel vs the XLA-composed reference implementation."""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu.ops import warp
from comfystereo_tpu.utils import fixtures

H, W = 48, 64


def _inputs():
    img = fixtures.create_test_image(H, W).astype(np.float32) / 255.0
    depth = fixtures.create_depth_map(H, W).astype(np.float32)
    return img, depth


@pytest.mark.parametrize("div_px,sep_px", [(3.0, 0.0), (-3.0, 0.0), (5.0, 1.0)])
def test_fused_kernel_matches_xla(div_px, sep_px):
    img, depth = _inputs()
    a, gap_a = warp.forward_warp(jnp.asarray(img[None]), jnp.asarray(depth[None]),
                                 div_px, sep_px, 2.0, 0.5, impl="xla")
    b, gap_b = warp.forward_warp(jnp.asarray(img[None]), jnp.asarray(depth[None]),
                                 div_px, sep_px, 2.0, 0.5, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(gap_a), np.asarray(gap_b))


def test_fused_kernel_batched():
    img, depth = _inputs()
    imgs = np.stack([img, img[:, ::-1]])
    depths = np.stack([depth, depth[:, ::-1]])
    a, _ = warp.forward_warp(jnp.asarray(imgs), jnp.asarray(depths),
                             3.0, 0.0, 2.0, 0.5, impl="xla")
    b, _ = warp.forward_warp(jnp.asarray(imgs), jnp.asarray(depths),
                             3.0, 0.0, 2.0, 0.5, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
