"""Full-model torch-vs-flax numerics (VERDICT r3 item 3).

Round 3 proved numerics for the full CLIP (vs transformers) and the VAE
mid-block (vs a hand-written torch mid-block), but no test ran a COMPLETE
multi-block UNet forward — down/mid/up with cross-attention and a real time
embedding interacting — against torch. These tests close that blind spot
with tests/torch_ref.py (tiny-but-complete torch UNet/VAE in the diffusers
state_dict layout, random weights), ported via the same entry points real
checkpoints use (porting.port_torch_unet / port_torch_vae /
adapters.from_torch_modules). Reference surface:
/root/reference/model_loader.py:22-95 (always exercises real diffusers
models; this is the in-image equivalent).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from comfystereo_tpu.diffusion import porting
from comfystereo_tpu.diffusion.sd_unet import (SDUNet, SDUNetConfig,
                                               TINY_SD_UNET_CONFIG)
from comfystereo_tpu.diffusion.sd_vae import SDVAE, TINY_SD_VAE_CONFIG

from torch_ref import TorchSDUNet, TorchSDVAE


def _randn_like_state(module, seed):
    """Replace every parameter with seeded N(0, 0.05) values — small scale
    keeps the deep residual stack's activations in a well-conditioned range
    so an f32 comparison is meaningful at every depth."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
    module.load_state_dict(sd)
    return module


def test_full_unet_torch_vs_flax():
    """Complete UNet forward parity: 2 down/up levels, cross-attn, real
    timestep embedding, skip concats — torch vs the ported flax model."""
    cfg = TINY_SD_UNET_CONFIG
    tmodel = _randn_like_state(TorchSDUNet(cfg), seed=0).eval()

    # Key-set equality both ways: the port must consume the whole torch
    # state_dict and produce the whole flax tree (layout-drift guard).
    unet = SDUNet(cfg)
    lat0 = jnp.zeros((1, 4, 16, 16))
    flax_init = unet.init(jax.random.PRNGKey(0), lat0, jnp.zeros(()),
                          jnp.zeros((1, 77, cfg.cross_attention_dim)))
    assert (set(tmodel.state_dict().keys())
            == set(porting.flax_to_torch_state_dict(flax_init).keys()))

    params, got_cfg = porting.port_torch_unet(tmodel, cfg=cfg)
    assert got_cfg == cfg

    rng = np.random.default_rng(1)
    lat = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    ctx = rng.normal(size=(2, 77, cfg.cross_attention_dim)
                     ).astype(np.float32)
    for t in (1.0, 501.0, 999.0):
        with torch.no_grad():
            want = tmodel(torch.from_numpy(lat), torch.tensor(t),
                          torch.from_numpy(ctx)).numpy()
        got = np.asarray(unet.apply(params, jnp.asarray(lat),
                                    jnp.float32(t), jnp.asarray(ctx)))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_full_unet_three_levels_uneven_heads():
    """A 3-level config (attention on 2 of 3 levels, per-level head counts
    like SD2.x) exercises the has_attn/add_downsample derivation and the
    mirrored up-block indexing against torch."""
    cfg = SDUNetConfig(block_out_channels=(32, 48, 64), layers_per_block=1,
                       cross_attention_dim=48, attention_head_dim=(2, 4, 4),
                       norm_num_groups=8)
    tmodel = _randn_like_state(TorchSDUNet(cfg), seed=3).eval()
    params, _ = porting.port_torch_unet(tmodel, cfg=cfg)

    rng = np.random.default_rng(4)
    lat = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
    ctx = rng.normal(size=(1, 77, 48)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(lat), torch.tensor(40.0),
                      torch.from_numpy(ctx)).numpy()
    got = np.asarray(SDUNet(cfg).apply(params, jnp.asarray(lat),
                                       jnp.float32(40.0), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_full_vae_torch_vs_flax():
    """Full VAE encode (distribution mean) AND decode parity vs torch —
    round 3 only checked the mid-block."""
    cfg = TINY_SD_VAE_CONFIG
    tmodel = _randn_like_state(TorchSDVAE(cfg), seed=7).eval()

    vae = SDVAE(cfg)
    flax_init = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    assert (set(tmodel.state_dict().keys())
            == set(porting.flax_to_torch_state_dict(flax_init).keys()))

    params, got_cfg = porting.port_torch_vae(tmodel, cfg=cfg)
    assert got_cfg == cfg

    rng = np.random.default_rng(8)
    img = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want_z = tmodel.encode_mean(torch.from_numpy(img)).numpy()
    got_z = np.asarray(vae.apply(params, jnp.asarray(img),
                                 method=SDVAE.encode))
    np.testing.assert_allclose(got_z, want_z, atol=1e-4, rtol=1e-4)

    z = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want_img = tmodel.decode(torch.from_numpy(z)).numpy()
    got_img = np.asarray(vae.apply(params, jnp.asarray(z),
                                   method=SDVAE.decode))
    np.testing.assert_allclose(got_img, want_img, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_from_torch_modules_end_to_end_numerics():
    """The user-facing entry point (adapters.from_torch_modules) preserves
    torch numerics for a full UNet+VAE bundle, and the resulting flax model
    is differentiable where torch inference mode is not (null-text's
    requirement, reference inversion.py:229-245)."""
    from comfystereo_tpu.diffusion.adapters import from_torch_modules

    ucfg, vcfg = TINY_SD_UNET_CONFIG, TINY_SD_VAE_CONFIG
    t_unet = _randn_like_state(TorchSDUNet(ucfg), seed=11).eval()
    t_vae = _randn_like_state(TorchSDVAE(vcfg), seed=12).eval()
    model = from_torch_modules(t_unet, t_vae, None, None,
                               unet_cfg=ucfg, vae_cfg=vcfg)

    rng = np.random.default_rng(13)
    lat = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    ctx = rng.normal(size=(1, 77, ucfg.cross_attention_dim)
                     ).astype(np.float32)
    with torch.no_grad():
        want = t_unet(torch.from_numpy(lat), torch.tensor(300.0),
                      torch.from_numpy(ctx)).numpy()
    got = np.asarray(model.unet_apply(model.unet_params, jnp.asarray(lat),
                                      jnp.float32(300.0), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def loss(c):
        eps = model.unet_apply(model.unet_params, jnp.asarray(lat),
                               jnp.float32(300.0), c)
        return jnp.mean(eps ** 2)

    g = jax.grad(loss)(jnp.asarray(ctx))
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
