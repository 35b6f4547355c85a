"""Polylines renderers vs the exact sweep oracle.

The exact integrator (default, ops/polylines_exact.py) must match the oracle
BIT-FOR-BIT in uint8 (VERDICT round-1 item 6); the supersampled fast mode
(ops/polylines.py) is tolerance-tested.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu import pipeline
from comfystereo_tpu.utils import fixtures
from tests.oracle import stereo_oracle as oracle

H, W = 40, 56


def _inputs():
    img = fixtures.create_test_image(H, W)
    depth = fixtures.create_depth_map(H, W).astype(np.float32)
    return img, depth


@pytest.mark.parametrize("fill", ["polylines_sharp", "polylines_soft"])
@pytest.mark.parametrize("div,sep", [(4.5, 0.0), (-4.5, 0.0), (7.0, 1.5)])
def test_polylines_exact_equals_oracle(fill, div, sep):
    img, depth = _inputs()
    got = pipeline.apply_stereo_divergence(
        jnp.asarray(img[None].astype(np.float32)), jnp.asarray(depth[None]),
        div, sep, 2.0, fill, 0.5, polylines_exact_mode=True)
    got = np.asarray(got)[0].astype(np.uint8)
    want = oracle.dispatch(img, depth, div, sep, 2.0, fill, 0.5)
    np.testing.assert_array_equal(got, want)


def test_polylines_exact_fold_heavy():
    """Hard depth steps + noise: dense folds, many pieces per pixel."""
    img, _ = _inputs()
    rng = np.random.default_rng(0)
    depth = (np.where(np.arange(W)[None, :] % 13 < 6, 255.0, 40.0)
             * np.ones((H, 1)) + rng.uniform(0, 40, (H, W))).astype(np.float32)
    for fill in ("polylines_sharp", "polylines_soft"):
        got = pipeline.apply_stereo_divergence(
            jnp.asarray(img[None].astype(np.float32)),
            jnp.asarray(depth[None]), 7.0, 0.0, 2.0, fill, 0.5,
            polylines_exact_mode=True)
        want = oracle.dispatch(img, depth, 7.0, 0.0, 2.0, fill, 0.5)
        np.testing.assert_array_equal(np.asarray(got)[0].astype(np.uint8),
                                      want)


@pytest.mark.parametrize("fill", ["polylines_sharp", "polylines_soft"])
@pytest.mark.parametrize("div", [4.5, -4.5])
def test_polylines_supersampled_close_to_oracle(fill, div):
    img, depth = _inputs()
    got = pipeline.apply_stereo_divergence(
        jnp.asarray(img[None].astype(np.float32)), jnp.asarray(depth[None]),
        div, 0.0, 2.0, fill, 0.5, polylines_exact_mode=False)
    got = np.asarray(got)[0]
    want = oracle.dispatch(img, depth, div, 0.0, 2.0, fill, 0.5
                           ).astype(np.float32)
    err = np.abs(got - want)
    # Supersampling approximates the exact integral: tight mean error, small
    # fraction of boundary pixels may differ more.
    assert err.mean() < 2.0, err.mean()
    assert (err > 8).mean() < 0.03, (err > 8).mean()


def test_polylines_flat_depth_identityish():
    img, _ = _inputs()
    depth = np.full((H, W), 99.0, dtype=np.float32)
    got = pipeline.apply_stereo_divergence(
        jnp.asarray(img[None].astype(np.float32)), jnp.asarray(depth[None]),
        4.5, 0.0, 2.0, "polylines_sharp", 0.0)
    got = np.asarray(got)[0]
    # flat depth + convergence 0 => zero offsets => image passthrough
    assert np.abs(got - img.astype(np.float32)).mean() < 1.0
