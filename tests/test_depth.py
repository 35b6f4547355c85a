import jax.numpy as jnp
import numpy as np

from comfystereo_tpu.ops import depth as depth_ops
from tests.oracle import stereo_oracle as oracle


def test_normalize_matches_oracle():
    rng = np.random.default_rng(0)
    d = rng.uniform(0, 255, (2, 16, 24)).astype(np.float32)
    got = np.asarray(depth_ops.normalize_depth(jnp.asarray(d)))
    for b in range(2):
        np.testing.assert_allclose(got[b], oracle.normalize_depth(d[b]), atol=1e-6)


def test_normalize_flat_depth_is_zero():
    d = np.full((1, 8, 8), 42.0, dtype=np.float32)
    got = np.asarray(depth_ops.normalize_depth(jnp.asarray(d)))
    assert (got == 0).all()


def test_normalize_255_prescale_is_noop():
    # The reference divides by 255 before min/max normalizing when max > 1;
    # min/max normalization is scale invariant so results must agree.
    rng = np.random.default_rng(1)
    d = rng.uniform(0, 255, (1, 8, 8)).astype(np.float32)
    a = np.asarray(depth_ops.normalize_depth(jnp.asarray(d)))
    b = np.asarray(depth_ops.normalize_depth(jnp.asarray(d / 255.0)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_signed_power():
    x = jnp.asarray([-0.5, 0.0, 0.25, 1.0])
    got = np.asarray(depth_ops.signed_power(x, 2.0))
    np.testing.assert_allclose(got, [-0.25, 0.0, 0.0625, 1.0], atol=1e-7)


def test_pixel_offsets_zero_divergence_is_separation():
    d = np.linspace(0, 1, 64, dtype=np.float32).reshape(1, 1, 64)
    off = np.asarray(depth_ops.pixel_offsets(jnp.asarray(d), 0.0, 3.5, 2.0, 0.5))
    np.testing.assert_allclose(off, 3.5, atol=1e-6)


def test_rgb_to_gray_depth():
    x = np.ones((1, 4, 4, 3), dtype=np.float32)
    g = np.asarray(depth_ops.rgb_to_gray_depth(jnp.asarray(x)))
    np.testing.assert_allclose(g, 0.2989 + 0.5870 + 0.1140, atol=1e-6)
