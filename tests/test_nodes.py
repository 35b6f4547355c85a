"""Node contract tests: exact public API of the reference nodes."""
import numpy as np
import pytest

from comfystereo_tpu.nodes.stereo_image import StereoImageNode
from comfystereo_tpu.utils import fixtures


def test_input_types_contract():
    it = StereoImageNode.INPUT_TYPES()
    req, opt = it["required"], it["optional"]
    assert set(req) == {"image", "depth_map", "modes", "fill_technique"}
    # Defaults from the reference node schema (GenerateStereo.py:61-71)
    assert opt["divergence"][1]["default"] == 4.5
    assert opt["stereo_offset_exponent"][1]["default"] == 2
    assert opt["depth_blur_strength"][1]["default"] == 20
    assert opt["depth_blur_vert_smooth"][1]["default"] == 6
    assert opt["batch_size"][1]["default"] == 12
    assert StereoImageNode.RETURN_NAMES == (
        "stereoscope", "blurred_depthmap_left", "blurred_depthmap_right",
        "no_fill_imperfect_mask")


@pytest.mark.parametrize("fill", ["GPU Warp (Fast)", "Fill - Naive"])
def test_node_generate(fill):
    imgs, depths = fixtures.batch_fixture(3, 48, 64)
    node = StereoImageNode()
    stereo, ld, rd, mask = node.generate(
        imgs, depths[..., None].repeat(3, -1), modes="left-right",
        fill_technique=fill, batch_size=2)
    assert stereo.shape == (3, 48, 128, 3)
    assert ld.shape == (3, 48, 64, 3)
    assert rd.shape == (3, 48, 64, 3)
    assert mask.shape[0] == 3
    assert stereo.min() >= 0 and stereo.max() <= 1


def test_node_depth_resize():
    imgs, depths = fixtures.batch_fixture(1, 48, 64)
    small_depth = depths[:, ::2, ::2]
    node = StereoImageNode()
    stereo, *_ = node.generate(imgs, small_depth, modes="left-right",
                               fill_technique="GPU Warp (Fast)")
    assert stereo.shape == (1, 48, 128, 3)


@pytest.mark.parametrize("hw", [(60, 100), (98, 130)])
@pytest.mark.parametrize("mode", ["Standard (DDIM)", "Fast (Warp + Inpaint)"])
def test_stereodiffusion_node_odd_sizes(mode, hw):
    """Resolution normalization (reference stereodiffusion_nodes.py:257-260,
    :426-430): inputs of ANY size — including ones whose latent dims are not
    divisible by the UNet's downsample factor — must run through both node
    paths and come back at the input resolution."""
    from comfystereo_tpu.nodes.stereodiffusion import StereoDiffusionNode
    h, w = hw
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    dm = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    node = StereoDiffusionNode()
    pair, left, right = node.generate_stereo(
        img, dm, pipeline_mode=mode, num_inference_steps=2,
        null_text_optimization=False)
    assert pair.shape == (1, h, 2 * w, 3)
    assert left.shape == right.shape == (1, h, w, 3)
    assert np.isfinite(pair).all()


def test_stereodiffusion_node_fast():
    from comfystereo_tpu.nodes.stereodiffusion import StereoDiffusionNode
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    dm = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    node = StereoDiffusionNode()
    pair, left, right = node.generate_stereo(
        img, dm, pipeline_mode="Fast (Warp + Inpaint)", num_inference_steps=3)
    assert pair.shape == (1, 32, 64, 3)
    assert left.shape == right.shape == (1, 32, 32, 3)
