"""Backward-warp op family + auxiliary blur variants."""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu.ops import backward_warp as bw
from comfystereo_tpu.ops import blur
from comfystereo_tpu.utils import fixtures

H, W = 40, 64


def _inputs():
    img = fixtures.create_test_image(H, W).astype(np.float32)[None] / 255.0
    depth = fixtures.create_depth_map(H, W).astype(np.float32)[None]
    return jnp.asarray(img), jnp.asarray(depth)


def test_backward_warp_flat_depth_shift():
    img, _ = _inputs()
    depth = jnp.full((1, H, W), 100.0)
    # flat depth -> nd=0 -> offset = separation only
    out = np.asarray(bw.backward_warp(img, depth, 0.0, 4.0, 1.0, 0.0))
    np.testing.assert_allclose(out[0][:, 8:-8], np.asarray(img)[0][:, 4:-12],
                               atol=1e-5)


def test_backward_warp_padded_modes():
    img, depth = _inputs()
    for mode in ("border", "zeros", "reflection"):
        out, valid = bw.backward_warp_padded(img, depth, 5.0, 0.0, 2.0, 0.5,
                                             fill_mode=mode)
        assert out.shape == img.shape
        assert valid.shape == (1, H, W)
    outz, valid = bw.backward_warp_padded(img, depth, 0.0, 200.0, 1.0, 0.5,
                                          fill_mode="zeros")
    outz = np.asarray(outz)
    assert (outz == 0).all()  # separation 200% of width pushes out of bounds
    assert not np.asarray(valid).any()


def test_forward_gap_mask_has_gaps_at_edges():
    _, depth = _inputs()
    mask = np.asarray(bw.forward_gap_mask(depth, 6.0))
    assert mask.any()
    assert mask.mean() < 0.5


def test_warp_and_fill_covers_gaps():
    img, depth = _inputs()
    out, gap = bw.warp_and_fill(img, depth, 6.0)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # filled result has no black holes even where gaps were detected
    assert (out.sum(-1) > 0).all()


def test_interpolate_fill_exact_linear():
    img = np.zeros((1, 2, 8, 3), np.float32)
    img[0, :, 0] = 1.0
    img[0, :, 7] = 0.0
    mask = np.zeros((1, 2, 8), bool)
    mask[:, :, 1:7] = True
    out = np.asarray(bw.interpolate_fill(jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(out[0, 0, :, 0],
                               1.0 - np.arange(8) / 7.0, atol=1e-6)


def test_detect_disocclusions_flags_stretch():
    depth = np.zeros((1, 4, 32), np.float32)
    depth[..., :16] = 1.0
    src = np.tile(np.arange(32, dtype=np.float32), (1, 4, 1))
    src[..., 16:] += 10.0  # a 10px jump in the warp field
    mask = np.asarray(bw.detect_disocclusions(jnp.asarray(depth),
                                              jnp.asarray(src)))
    assert mask[0, 0, 15]  # jump position flagged


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import gaussian_filter
    _, depth = _inputs()
    got = np.asarray(blur.gaussian_blur(depth, 2.0))[0]
    # same kernel support (3 sigma truncation), same padding family
    want = gaussian_filter(np.asarray(depth)[0], 2.0, truncate=3.0,
                           mode="nearest")
    assert np.abs(got - want).max() < 1.0


def test_direction_aware_blur_sides():
    _, depth = _inputs()
    left = np.asarray(blur.direction_aware_blur(depth, 2.0, 10.0, "left"))
    right = np.asarray(blur.direction_aware_blur(depth, 2.0, 10.0, "right"))
    assert not np.allclose(left, right)
    flat = jnp.full((1, 16, 16), 7.0)
    np.testing.assert_allclose(
        np.asarray(blur.direction_aware_blur(flat, 2.0, 10.0, "left")), 7.0,
        atol=1e-4)


def test_edge_selective_blur_smooths_edges():
    _, depth = _inputs()
    out = np.asarray(blur.edge_selective_blur(depth, 2.0, 20.0))
    assert np.isfinite(out).all()
    # edges get closer to the blurred version; flat areas stay put
    flat_region = np.asarray(depth)[0, :4, :4]
    np.testing.assert_allclose(out[0, :4, :4], flat_region, atol=1.0)
