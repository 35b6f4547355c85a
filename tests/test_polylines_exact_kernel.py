"""Fused EXACT-polylines kernel (interpret mode) vs the XLA winner scan.

The fused kernel (pallas/polylines_exact_kernel.py) must reproduce the XLA
exact path — which is itself bit-parity vs the loop oracle
(tests/test_polylines.py) — so the kernel is held to uint8 equality here.
Reference: stereoimage_generation.py:1947-1991.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu.ops import polylines_exact as pe
from comfystereo_tpu.utils import fixtures

H, W = 24, 56


def _run(impl, sharp, div, sep, depth=None):
    img = fixtures.create_test_image(H, W).astype(np.float32)
    if depth is None:
        depth = fixtures.create_depth_map(H, W).astype(np.float32)
    from comfystereo_tpu.ops import depth as depth_ops

    nd = depth_ops.normalize_depth(jnp.asarray(depth[None])) - 0.5
    out = pe.apply_polylines_exact(
        jnp.asarray(img[None]), nd, (div / 100.0) * W, sep, 2.0,
        sharp=sharp, impl=impl)
    return np.asarray(out)[0].astype(np.uint8)


@pytest.mark.parametrize("sharp", [True, False])
def test_fused_exact_matches_xla(sharp):
    a = _run("xla", sharp, 4.5, 0.0)
    b = _run("pallas", sharp, 4.5, 0.0)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
@pytest.mark.parametrize("sharp", [True, False])
@pytest.mark.parametrize("div,sep", [(-4.5, 0.0), (7.0, 1.5)])
def test_fused_exact_matches_xla_sweep(sharp, div, sep):
    a = _run("xla", sharp, div, sep)
    b = _run("pallas", sharp, div, sep)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_exact_piece_chunked_width():
    """Widths past ~2560 px exceed the kernel's VMEM budget for all 12
    pieces in one call; the pieces are then chunked across calls with the
    accumulator threaded through. Cover that path (incl. sequential-order
    preservation) off-TPU at a reduced row count."""
    from comfystereo_tpu.pallas import polylines_exact_kernel as kmod

    h, w = 2, 2700
    wp = -(-w // 128) * 128
    fixed = 12 * 8 * wp * 8
    per = 9 * 8 * wp * 4 + 3 * 8 * wp * 8
    assert (int((16 << 20) / 1.2) - fixed) // per < 12  # chunking engaged
    img = fixtures.create_test_image(h, w).astype(np.float32)
    depth = fixtures.create_depth_map(h, w).astype(np.float32)
    from comfystereo_tpu.ops import depth as depth_ops

    nd = depth_ops.normalize_depth(jnp.asarray(depth[None])) - 0.5
    outs = []
    for impl in ("xla", "pallas"):
        out = pe.apply_polylines_exact(
            jnp.asarray(img[None]), nd, 0.045 * w, 0.0, 2.0,
            sharp=True, impl=impl)
        outs.append(np.asarray(out)[0].astype(np.uint8))
    np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.slow
def test_fused_exact_fold_heavy():
    rng = np.random.default_rng(0)
    depth = (np.where(np.arange(W)[None, :] % 13 < 6, 255.0, 40.0)
             * np.ones((H, 1)) + rng.uniform(0, 40, (H, W))).astype(
                 np.float32)
    for sharp in (True, False):
        a = _run("xla", sharp, 7.0, 0.0, depth)
        b = _run("pallas", sharp, 7.0, 0.0, depth)
        np.testing.assert_array_equal(a, b)
