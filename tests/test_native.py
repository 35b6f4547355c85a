"""Native C++ hostops vs their numpy fallbacks.

The native library is built on demand (g++ present in CI); when no toolchain
exists the wrappers transparently fall back to numpy, so these tests assert
the two paths agree bit-for-bit wherever the build succeeds.
"""
import numpy as np
import pytest

from comfystereo_tpu import native


def _rng_bgr(h=37, w=53):
    return np.random.default_rng(0).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


def test_build_or_fallback():
    # available() must never raise; both outcomes are valid environments.
    assert native.available() in (True, False)


def test_bgr_to_rgb_f32_matches_numpy():
    bgr = _rng_bgr()
    got = native.bgr_u8_to_rgb_f32(bgr)
    want = bgr[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.float32


def test_gray_matches_numpy():
    bgr = _rng_bgr()
    got = native.bgr_u8_to_gray_f32(bgr)
    b = bgr.astype(np.float32)
    want = (0.2989 * b[..., 2] + 0.5870 * b[..., 1]
            + 0.1140 * b[..., 0]) / 255.0
    if native.available():
        np.testing.assert_allclose(got, want, atol=3e-7)  # summation order
    else:
        np.testing.assert_array_equal(got, want)


def test_rgb_f32_to_bgr_u8_matches_numpy():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(-0.1, 1.1, (41, 29, 3)).astype(np.float32)
    got = native.rgb_f32_to_bgr_u8(rgb)
    want = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)[..., ::-1]
    np.testing.assert_array_equal(got, want)
    assert got.flags["C_CONTIGUOUS"]


def test_roundtrip_u8_exact():
    bgr = _rng_bgr()
    rgb = native.bgr_u8_to_rgb_f32(bgr)
    back = native.rgb_f32_to_bgr_u8(rgb)
    np.testing.assert_array_equal(back, bgr)


def test_batched_shapes():
    bgr = np.stack([_rng_bgr()] * 4)
    assert native.bgr_u8_to_rgb_f32(bgr).shape == bgr.shape
    assert native.bgr_u8_to_gray_f32(bgr).shape == bgr.shape[:-1]
