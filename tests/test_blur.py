import jax.numpy as jnp
import numpy as np

from comfystereo_tpu.ops import blur
from comfystereo_tpu.utils import fixtures
from tests.oracle import stereo_oracle as oracle


def _depth255(h=64, w=96):
    return fixtures.create_depth_map(h, w).astype(np.float32)


def test_sobel_matches_scipy():
    from scipy.ndimage import sobel
    d = _depth255()
    got = np.asarray(blur.sobel_x(jnp.asarray(d[None])))[0]
    want = sobel(d, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_box_blur_matches_scipy():
    from scipy.ndimage import convolve1d
    d = _depth255()
    for n in (2, 3, 5, 20):
        got = np.asarray(blur.box_blur_w(jnp.asarray(d[None]), n))[0]
        want = convolve1d(d, np.ones(n) / n, axis=1, mode="nearest")
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-5)


def test_directional_blur_matches_oracle():
    d = _depth255()
    for kwargs in (
        dict(blur_strength=20, edge_threshold=20, blur_mask_width=20,
             falloff_exponent=2.0, vert_smooth_px=6),
        dict(blur_strength=5, edge_threshold=6, blur_mask_width=5,
             falloff_exponent=1.0, vert_smooth_px=0),
    ):
        gl, gr = blur.directional_motion_blur(jnp.asarray(d[None]), **kwargs)
        wl, wr = oracle.directional_motion_blur(d, **kwargs)
        np.testing.assert_allclose(np.asarray(gl)[0], wl, atol=0.05, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gr)[0], wr, atol=0.05, rtol=1e-4)


def test_blur_zero_strength_identity():
    d = jnp.asarray(_depth255()[None])
    gl, gr = blur.directional_motion_blur(d, 0.0, 20.0)
    assert gl is d and gr is d


def test_blur_batched_consistency():
    d = _depth255()
    batch = np.stack([d, d * 0.5 + 10.0])
    gl, gr = blur.directional_motion_blur(jnp.asarray(batch), 10, 20, 10, 2.0, 3)
    sl, _ = blur.directional_motion_blur(jnp.asarray(d[None]), 10, 20, 10, 2.0, 3)
    np.testing.assert_allclose(np.asarray(gl)[0], np.asarray(sl)[0], atol=1e-4)
