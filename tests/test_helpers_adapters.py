"""Diffusion helpers, adapters, and tensor converters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu import diffusion
from comfystereo_tpu.diffusion import helpers, schedulers
from comfystereo_tpu.utils import tensors


@pytest.fixture(scope="module")
def toy():
    return diffusion.make_toy_model(image_size=32)


def test_diffusion_step_shapes(toy):
    sched = schedulers.make_ddim(10)
    lat = jnp.zeros((2, 4, 4, 4))
    ctx = jnp.concatenate([jnp.repeat(toy.text_encode(""), 2, 0),
                           jnp.repeat(toy.text_encode("x"), 2, 0)], axis=0)
    out = helpers.diffusion_step(toy, sched, lat, ctx,
                                 jnp.int32(sched.timesteps[0]), 7.5)
    assert out.shape == lat.shape
    out2 = helpers.diffusion_step_no_cfg(toy, sched, lat, ctx[:2],
                                         jnp.int32(sched.timesteps[0]))
    assert out2.shape == lat.shape


def test_init_latent():
    lat, lats = helpers.init_latent(None, jax.random.PRNGKey(0), 4, 64, 64, 3)
    assert lat.shape == (1, 4, 8, 8)
    assert lats.shape == (3, 4, 8, 8)
    lat2, lats2 = helpers.init_latent(lat, jax.random.PRNGKey(0), 4, 64, 64, 2)
    np.testing.assert_allclose(np.asarray(lats2[0]), np.asarray(lat[0]))


def test_detect_model_type():
    from comfystereo_tpu.diffusion.adapters import detect_model_type

    class SD2Config:
        context_dim = 1024

    class SDXLThing:
        pass

    SDXLThing.__name__ = "SDXLModelConfig"
    assert detect_model_type(SD2Config()) == "SD2"
    assert detect_model_type(SDXLThing()) == "SDXL"
    assert detect_model_type(object()) == "SD1"


def test_torch_adapter_roundtrip(toy):
    """from_torch_modules drives a tiny torch UNet through the JAX contract."""
    torch = pytest.importorskip("torch")

    class TinyUNet(torch.nn.Module):
        class Cfg:
            in_channels = 4

        config = Cfg()

        def forward(self, x, t, encoder_hidden_states=None):
            return {"sample": x * 0.5}

    class TinyVAE(torch.nn.Module):
        def encode(self, x):
            class D:
                pass

            d = D()
            mean = torch.nn.functional.avg_pool2d(x, 8)
            d.mean = mean[:, :3].repeat(1, 2, 1, 1)[:, :4]
            out = {"latent_dist": d}
            return out

        def decode(self, z):
            return {"sample": torch.nn.functional.interpolate(
                z[:, :3], scale_factor=8)}

    class TinyTok:
        model_max_length = 77

        def __call__(self, texts, **kw):
            class T:
                input_ids = torch.zeros((1, 77), dtype=torch.long)

            return T()

    class TinyText(torch.nn.Module):
        def forward(self, ids):
            return (torch.zeros((1, 77, 64)),)

    from comfystereo_tpu.diffusion.adapters import from_torch_modules

    m = from_torch_modules(TinyUNet(), TinyVAE(), TinyTok(), TinyText())
    lat = m.vae_encode(None, jnp.zeros((1, 3, 32, 32)))
    assert lat.shape == (1, 4, 4, 4)
    eps = m.unet_apply(None, lat, 5, m.text_encode("hi"))
    assert eps.shape == lat.shape
    img = m.vae_decode(None, lat)
    assert img.shape == (1, 3, 32, 32)


def test_tensor_converters():
    x = np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    u8 = tensors.tensor2np(x)
    assert u8.dtype == np.uint8 and u8.shape == (8, 8, 3)
    back = tensors.np2tensor(u8)
    assert back.shape == (1, 8, 8, 3) and back.max() <= 1.0
    pil = tensors.tensor2pil(x)
    assert pil.size == (8, 8)
    merged = tensors.merge_channels(x[..., 0], x[..., 1], x[..., 2])
    assert merged.shape == (2, 8, 8, 3)
    rgb = tensors.gray_to_rgb(x[..., 0])
    assert rgb.shape == (2, 8, 8, 3)
