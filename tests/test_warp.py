"""Forward warp (gpu_warp path) vs the sequential z-buffer oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu.ops import warp
from comfystereo_tpu.utils import fixtures

from tests.oracle import stereo_oracle as oracle

H, W = 48, 64


def _inputs():
    img = fixtures.create_test_image(H, W).astype(np.float32) / 255.0
    depth = fixtures.create_depth_map(H, W).astype(np.float32)
    return img, depth


def _ssim_proxy(a, b):
    """Mean absolute difference on 0-1 images (cheap SSIM stand-in)."""
    return float(np.abs(a - b).mean())


@pytest.mark.parametrize("div_px,sep_px", [(3.0, 0.0), (-3.0, 0.0), (5.0, 1.0)])
def test_warp_matches_oracle(div_px, sep_px):
    img, depth = _inputs()
    got, gap = warp.forward_warp(jnp.asarray(img[None]), jnp.asarray(depth[None]),
                                 div_px, sep_px, 2.0, 0.5)
    want, want_gap = oracle.forward_warp(img, depth, div_px, sep_px, 2.0, 0.5)
    got = np.asarray(got)[0]
    gap = np.asarray(gap)[0]
    assert _ssim_proxy(got, want) < 0.01
    # Gap mask (= segment coverage) matches the scatter z-buffer EXACTLY.
    np.testing.assert_array_equal(gap, want_gap)
    # Z-buffer winners are bit-exact everywhere the warp fills; gap-FILL
    # pixels may differ on ties (XLA's FMA contraction vs numpy's separate
    # rounding flips the lz<rz background-bias branch when lz == rz
    # mathematically), so filled content is compared exactly and gap content
    # by tolerance.
    filled_diff = np.abs(got - want).max(axis=-1) * ~gap
    assert filled_diff.max() < 1e-6


def test_warp_fold_heavy_exact_mask():
    """Backward folds behind disconnected jumps (round-1 deviation): hard
    depth steps + low gradient_threshold. Mask parity must be exact
    (reference :342-391 scatter semantics)."""
    img, _ = _inputs()
    rng = np.random.default_rng(0)
    depth = np.where(np.arange(W)[None, :] % 17 < 8, 255.0, 10.0) \
        * np.ones((H, 1), np.float32)
    depth = (depth + rng.uniform(0, 30, (H, W))).astype(np.float32)
    got, gap = warp.forward_warp(
        jnp.asarray(img[None]), jnp.asarray(depth[None]), 6.0, 0.0, 2.0, 0.5,
        gradient_threshold=0.8)
    want, want_gap = oracle.forward_warp(img, depth, 6.0, 0.0, 2.0, 0.5,
                                         gradient_threshold=0.8)
    np.testing.assert_array_equal(np.asarray(gap)[0], want_gap)
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=1e-5)


def test_warp_zero_offset_identity():
    img, _ = _inputs()
    depth = np.full((H, W), 128.0, dtype=np.float32)  # flat depth -> nd == 0
    got, gap = warp.forward_warp(jnp.asarray(img[None]), jnp.asarray(depth[None]),
                                 3.0, 0.0, 2.0, 0.0)
    # Flat depth normalizes to 0; convergence 0 => offset 0 => identity warp.
    # The half-open [0,1) segment coverage leaves the final column to gap fill
    # (same in the reference, :375), so compare all but the last column.
    np.testing.assert_allclose(np.asarray(got)[0][:, :-1], img[:, :-1], atol=1e-5)
    assert not np.asarray(gap)[0][:, :-1].any()


def test_warp_flat_depth_pure_shift():
    img, _ = _inputs()
    depth = np.full((H, W), 200.0, dtype=np.float32)
    sep = 4.0
    got, _ = warp.forward_warp(jnp.asarray(img[None]), jnp.asarray(depth[None]),
                               0.0, sep, 2.0, 0.0)
    got = np.asarray(got)[0]
    # Constant separation: out[x] == in[x - sep] away from the border.
    np.testing.assert_allclose(got[:, 8:-8], img[:, 8 - int(sep):-8 - int(sep)],
                               atol=1e-4)


def test_warp_batched_consistency():
    img, depth = _inputs()
    imgs = np.stack([img, img[:, ::-1]])
    depths = np.stack([depth, depth[:, ::-1]])
    got, _ = warp.forward_warp(jnp.asarray(imgs), jnp.asarray(depths),
                               3.0, 0.0, 2.0, 0.5)
    single, _ = warp.forward_warp(jnp.asarray(imgs[1:]), jnp.asarray(depths[1:]),
                                  3.0, 0.0, 2.0, 0.5)
    np.testing.assert_allclose(np.asarray(got)[1], np.asarray(single)[0], atol=1e-6)


def test_gap_mask_appears_at_disocclusions():
    img, _ = _inputs()
    depth = np.zeros((H, W), dtype=np.float32)
    depth[:, : W // 2] = 255.0  # hard edge: near left half, far right half
    _, gap = warp.forward_warp(jnp.asarray(img[None]), jnp.asarray(depth[None]),
                               6.0, 0.0, 1.0, 0.0)
    gap = np.asarray(gap)[0]
    assert gap.any()
    # Near content (left half) shifts right by 6 px, vacating the left border.
    assert gap[:, :6].all()
    # And the gap mask agrees with the sequential oracle exactly here.
    _, want_gap = oracle.forward_warp(img, depth, 6.0, 0.0, 1.0, 0.0)
    np.testing.assert_array_equal(gap, want_gap)
