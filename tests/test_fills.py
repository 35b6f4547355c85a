"""Bit-faithful parity of the exact fill kernels vs the numpy oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu import pipeline
from comfystereo_tpu.utils import fixtures
from tests.oracle import stereo_oracle as oracle

H, W = 48, 64


def _inputs():
    img = fixtures.create_test_image(H, W)          # uint8 [H,W,3]
    depth = fixtures.create_depth_map(H, W).astype(np.float32)
    return img, depth


def _run_tpu(img_u8, depth, divergence, separation, exponent, fill,
             convergence=0.5):
    out = pipeline.apply_stereo_divergence(
        jnp.asarray(img_u8[None].astype(np.float32)),
        jnp.asarray(depth[None]),
        divergence, separation, exponent, fill, convergence)
    return np.asarray(out)[0].astype(np.int32)


CASES = [
    (4.5, 0.0, 2.0, 0.5),
    (-3.0, 0.0, 1.0, 0.5),
    (4.5, 1.5, 2.0, 0.3),
    (8.0, -1.0, 0.7, 0.8),
]


@pytest.mark.parametrize("div,sep,exp,conv", CASES)
def test_none_exact(div, sep, exp, conv):
    img, depth = _inputs()
    got = _run_tpu(img, depth, div, sep, exp, "none", conv)
    want = oracle.dispatch(img, depth, div, sep, exp, "none", conv).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("div,sep,exp,conv", CASES)
def test_naive_exact(div, sep, exp, conv):
    img, depth = _inputs()
    got = _run_tpu(img, depth, div, sep, exp, "naive", conv)
    want = oracle.dispatch(img, depth, div, sep, exp, "naive", conv).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("div,sep,exp,conv", CASES)
def test_naive_interpolating_exact(div, sep, exp, conv):
    img, depth = _inputs()
    got = _run_tpu(img, depth, div, sep, exp, "naive_interpolating", conv)
    want = oracle.dispatch(img, depth, div, sep, exp,
                           "naive_interpolating", conv).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("div,sep,exp,conv", CASES)
def test_inverse_exact(div, sep, exp, conv):
    img, depth = _inputs()
    got = _run_tpu(img, depth, div, sep, exp, "inverse", conv)
    want = oracle.dispatch(img, depth, div, sep, exp, "inverse", conv).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fill", ["none_post", "inverse_post"])
def test_post_fills_close(fill):
    # np.interp runs in f64 in the oracle; allow 1 LSB from f32 rounding.
    img, depth = _inputs()
    got = _run_tpu(img, depth, 4.5, 0.0, 2.0, fill)
    want = oracle.dispatch(img, depth, 4.5, 0.0, 2.0, fill).astype(np.int32)
    assert np.abs(got - want).max() <= 1
    assert (got != want).mean() < 0.02


def test_hybrid_edge_close():
    # Scatter-add float ordering can shift the uint8 truncation by 1 LSB at
    # exact-integer knife edges (the f32 numba reference is itself unstable
    # there), so assert a hard 1-LSB bound rather than exact equality.
    img, depth = _inputs()
    got = _run_tpu(img, depth, 4.5, 0.0, 2.0, "hybrid_edge")
    want = oracle.dispatch(img, depth, 4.5, 0.0, 2.0, "hybrid_edge").astype(np.int32)
    assert np.abs(got - want).max() <= 1
    assert np.abs(got - want).mean() < 0.5


def test_mask_parity_naive():
    """no_fill_imperfect_mask parity: black-pixel detection must agree."""
    img, depth = _inputs()
    got = _run_tpu(img, depth, 4.5, 0.0, 2.0, "none")
    want = oracle.dispatch(img, depth, 4.5, 0.0, 2.0, "none").astype(np.int32)
    np.testing.assert_array_equal(got.sum(-1) == 0, want.sum(-1) == 0)


def test_zero_divergence_with_separation_shifts():
    img, depth = _inputs()
    got = _run_tpu(img, depth, 0.0, 2.0, 2.0, "none")
    want = oracle.dispatch(img, depth, 0.0, 2.0, 2.0, "none").astype(np.int32)
    np.testing.assert_array_equal(got, want)
