"""Frame-sharded pipeline on the virtual 8-device CPU mesh.

SURVEY.md §2.7: frames are embarrassingly parallel, so the batch axis
shards over the mesh with NamedSharding and the pipeline output must be
identical to the single-device run. Row sharding adds a "seq" axis whose
only cross-shard traffic is the vertical blur halos (XLA neighbor
exchanges).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu import StereoConfig, stereo_pipeline
from comfystereo_tpu.parallel import sharding
from comfystereo_tpu.utils import fixtures

B, H, W = 8, 48, 64


def _batch():
    img = fixtures.create_test_image(H, W).astype(np.float32) / 255.0
    dm = fixtures.create_depth_map(H, W).astype(np.float32)
    imgs = np.stack([np.roll(img, 2 * i, axis=1) for i in range(B)])
    dms = np.stack([np.roll(dm, 2 * i, axis=1) for i in range(B)])
    return jnp.asarray(imgs), jnp.asarray(dms)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_frame_sharded_pipeline_matches_single_device():
    imgs, dms = _batch()
    cfg = StereoConfig(fill_technique="gpu_warp", modes=("left-right",),
                       depth_map_blur=True)
    want = stereo_pipeline(imgs, dms, cfg)

    mesh = sharding.make_mesh(8)
    s_imgs, s_dms = sharding.shard_batch(imgs, dms, mesh)
    assert s_imgs.sharding.is_equivalent_to(
        sharding.frame_sharding(mesh), imgs.ndim)
    got = stereo_pipeline(s_imgs, s_dms, cfg)
    np.testing.assert_array_equal(np.asarray(got["stereo"][0]),
                                  np.asarray(want["stereo"][0]))
    np.testing.assert_array_equal(np.asarray(got["mask"]),
                                  np.asarray(want["mask"]))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_frame_row_sharded_pipeline_close():
    """DP x row-sharded (4x2 mesh): vertical-blur halos cross shard
    boundaries, so allow float-accumulation noise but nothing structural."""
    imgs, dms = _batch()
    cfg = StereoConfig(fill_technique="gpu_warp", modes=("left-right",),
                       depth_map_blur=True)
    want = np.asarray(stereo_pipeline(imgs, dms, cfg)["stereo"][0])

    mesh = sharding.make_mesh(8, axes=("data", "seq"), shape=(4, 2))
    s_imgs, s_dms = sharding.shard_batch(imgs, dms, mesh, rows=True)
    got = np.asarray(stereo_pipeline(s_imgs, s_dms, cfg)["stereo"][0])
    assert np.abs(got - want).max() <= 2.0 / 255.0
