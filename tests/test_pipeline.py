"""End-to-end pipeline contract tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu import StereoConfig, stereo_pipeline
from comfystereo_tpu.utils import fixtures

B, H, W = 2, 48, 64


def _inputs():
    imgs, depths = fixtures.batch_fixture(B, H, W)
    return jnp.asarray(imgs), jnp.asarray(depths)


def test_gpu_warp_shapes_and_modes():
    imgs, depths = _inputs()
    cfg = StereoConfig(modes=("left-right", "top-bottom", "red-cyan-anaglyph"),
                       fill_technique="gpu_warp")
    out = stereo_pipeline(imgs, depths, cfg)
    assert out["stereo"][0].shape == (B, H, 2 * W, 3)
    assert out["stereo"][1].shape == (B, 2 * H, W, 3)
    assert out["stereo"][2].shape == (B, H, W, 3)
    assert out["mask"].shape == (B, H, W)
    assert out["left_depth"].shape == (B, H, W)
    for o in out["stereo"]:
        x = np.asarray(o)
        assert x.min() >= 0.0 and x.max() <= 1.0


@pytest.mark.parametrize("fill", ["none", "naive", "polylines_sharp"])
def test_cpu_parity_path_shapes(fill):
    imgs, depths = _inputs()
    cfg = StereoConfig(fill_technique=fill, modes=("left-right",),
                       depth_map_blur=False)
    out = stereo_pipeline(imgs, depths, cfg)
    assert out["stereo"][0].shape == (B, H, 2 * W, 3)
    assert out["mask"].shape == (B, H, 2 * W)


def test_mask_matches_black_pixels_cpu_path():
    imgs, depths = _inputs()
    cfg = StereoConfig(fill_technique="none", modes=("left-right",),
                       depth_map_blur=False)
    out = stereo_pipeline(imgs, depths, cfg)
    stereo = np.asarray(out["stereo"][0])
    mask = np.asarray(out["mask"])
    np.testing.assert_array_equal(mask > 0.5, stereo.sum(-1) == 0)


def test_balance_extremes_passthrough():
    imgs, depths = _inputs()
    # balance=1 => right divergence 0 => right eye is the input image
    cfg = StereoConfig(stereo_balance=1.0, fill_technique="gpu_warp",
                       modes=("only-right",), depth_map_blur=False)
    out = stereo_pipeline(imgs, depths, cfg)
    np.testing.assert_allclose(np.asarray(out["stereo"][0]), np.asarray(imgs),
                               atol=1e-6)


def test_depth_blur_outputs_differ_per_eye():
    imgs, depths = _inputs()
    cfg = StereoConfig(fill_technique="gpu_warp", depth_map_blur=True)
    out = stereo_pipeline(imgs, depths, cfg)
    ld, rd = np.asarray(out["left_depth"]), np.asarray(out["right_depth"])
    assert not np.allclose(ld, rd)
    assert ld.min() >= 0 and ld.max() <= 1


def test_bf16_color_path_parity():
    """bfloat16 color planes (gpu_warp bandwidth mode) stay within ~1 LSB of
    the f32 path after uint8 quantization (VERDICT round-1 item 10)."""
    import dataclasses

    imgs, depths = _inputs()
    cfg32 = StereoConfig(fill_technique="gpu_warp", modes=("left-right",))
    cfg16 = dataclasses.replace(cfg32, color_dtype="bfloat16")
    out32 = stereo_pipeline(imgs, depths, cfg32)
    out16 = stereo_pipeline(imgs, depths, cfg16)
    assert out16["stereo"][0].dtype == jnp.bfloat16
    q32 = np.asarray(jnp.round(out32["stereo"][0] * 255)).astype(np.int32)
    q16 = np.asarray(jnp.round(out16["stereo"][0].astype(jnp.float32) * 255)
                     ).astype(np.int32)
    assert np.abs(q32 - q16).max() <= 2
    assert (np.abs(q32 - q16) > 1).mean() < 0.001
    # Masks are identical — geometry/z math stays f32.
    np.testing.assert_array_equal(np.asarray(out32["mask"]),
                                  np.asarray(out16["mask"]))


def test_color_dtype_validation():
    with pytest.raises(ValueError):
        StereoConfig(color_dtype="float16")


def test_pipeline_jit_cache_stable():
    imgs, depths = _inputs()
    cfg = StereoConfig()
    out1 = stereo_pipeline(imgs, depths, cfg)
    out2 = stereo_pipeline(imgs, depths, cfg)
    np.testing.assert_array_equal(np.asarray(out1["stereo"][0]),
                                  np.asarray(out2["stereo"][0]))


def test_anaglyph_channels():
    imgs, depths = _inputs()
    cfg = StereoConfig(modes=("red-cyan-anaglyph", "left-only", "only-right"),
                       fill_technique="gpu_warp", depth_map_blur=False)
    out = stereo_pipeline(imgs, depths, cfg)
    ana, left, right = (np.asarray(o) for o in out["stereo"])
    np.testing.assert_allclose(ana[..., 0], left[..., 0], atol=1e-6)
    np.testing.assert_allclose(ana[..., 1], right[..., 1], atol=1e-6)
    np.testing.assert_allclose(ana[..., 2], right[..., 2], atol=1e-6)
