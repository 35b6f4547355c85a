"""Torch-module weight porting: LDM/ComfyUI key conversion + flax execution.

VERDICT round-1 item 9: the gradient path for externally loaded torch models
is the documented hybrid — port the weights into the flax SD modules and run
null-text optimization natively (adapters.from_torch_modules docstring).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfystereo_tpu.diffusion import porting
from comfystereo_tpu.diffusion.sd_unet import SDUNet, TINY_SD_UNET_CONFIG
from comfystereo_tpu.diffusion.sd_vae import SDVAE, TINY_SD_VAE_CONFIG


class FakeTorchModule:
    """Duck-typed torch module exposing state_dict() of torch tensors."""

    def __init__(self, arrays):
        import torch

        self._sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in arrays.items()}

    def state_dict(self):
        return self._sd


# --- LDM -> diffusers key mapping (canonical spellings) -----------------------

def test_ldm_unet_key_mapping():
    x = np.zeros(1)
    pairs = {
        "time_embed.0.weight": "time_embedding.linear_1.weight",
        "time_embed.2.bias": "time_embedding.linear_2.bias",
        "input_blocks.0.0.weight": "conv_in.weight",
        "input_blocks.1.0.in_layers.0.weight":
            "down_blocks.0.resnets.0.norm1.weight",
        "input_blocks.2.0.emb_layers.1.weight":
            "down_blocks.0.resnets.1.time_emb_proj.weight",
        "input_blocks.2.1.transformer_blocks.0.attn1.to_q.weight":
            "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q"
            ".weight",
        "input_blocks.3.0.op.weight":
            "down_blocks.0.downsamplers.0.conv.weight",
        "input_blocks.4.0.skip_connection.weight":
            "down_blocks.1.resnets.0.conv_shortcut.weight",
        "middle_block.0.out_layers.3.weight":
            "mid_block.resnets.0.conv2.weight",
        "middle_block.1.proj_in.weight":
            "mid_block.attentions.0.proj_in.weight",
        "middle_block.2.in_layers.2.bias": "mid_block.resnets.1.conv1.bias",
        "output_blocks.0.0.out_layers.0.weight":
            "up_blocks.0.resnets.0.norm2.weight",
        "output_blocks.2.1.conv.weight":
            "up_blocks.0.upsamplers.0.conv.weight",
        "output_blocks.5.2.conv.weight":
            "up_blocks.1.upsamplers.0.conv.weight",
        "output_blocks.5.1.norm.weight":
            "up_blocks.1.attentions.2.norm.weight",
        "out.0.weight": "conv_norm_out.weight",
        "out.2.bias": "conv_out.bias",
        # ComfyUI prefixes are stripped
        "model.diffusion_model.out.2.weight": "conv_out.weight",
    }
    got = porting.ldm_unet_to_diffusers({k: x for k in pairs})
    for want in pairs.values():
        assert want in got, want


def test_ldm_vae_key_mapping():
    x = np.zeros(1)
    pairs = {
        "encoder.conv_in.weight": "encoder.conv_in.weight",
        "encoder.down.0.block.0.norm1.weight":
            "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down.1.block.1.nin_shortcut.weight":
            "encoder.down_blocks.1.resnets.1.conv_shortcut.weight",
        "encoder.down.0.downsample.conv.weight":
            "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid.attn_1.q.weight":
            "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid.attn_1.proj_out.bias":
            "encoder.mid_block.attentions.0.to_out.0.bias",
        "encoder.mid.block_2.conv2.weight":
            "encoder.mid_block.resnets.1.conv2.weight",
        "encoder.norm_out.weight": "encoder.conv_norm_out.weight",
        # decoder up-blocks are order-REVERSED between layouts
        "decoder.up.3.block.0.conv1.weight":
            "decoder.up_blocks.0.resnets.0.conv1.weight",
        "decoder.up.0.block.2.conv2.weight":
            "decoder.up_blocks.3.resnets.2.conv2.weight",
        "decoder.up.1.upsample.conv.weight":
            "decoder.up_blocks.2.upsamplers.0.conv.weight",
        "quant_conv.weight": "quant_conv.weight",
        "first_stage_model.post_quant_conv.bias": "post_quant_conv.bias",
    }
    got = porting.ldm_vae_to_diffusers({k: x for k in pairs})
    for want in pairs.values():
        assert want in got, want


def test_looks_like_ldm():
    assert porting.looks_like_ldm({"input_blocks.0.0.weight": 0})
    assert porting.looks_like_ldm({"model.diffusion_model.out.0.weight": 0})
    assert not porting.looks_like_ldm({"conv_in.weight": 0})


# --- config inference + end-to-end torch-module port --------------------------

@pytest.mark.slow
def test_port_torch_unet_roundtrip_and_grad():
    """Export tiny flax weights as a torch module (diffusers layout), port
    back via from_torch_modules, and check (a) forward equality with the
    original flax model, (b) the port is differentiable (null-text's
    requirement the torch no_grad path cannot meet)."""
    unet = SDUNet(TINY_SD_UNET_CONFIG)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 64))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.zeros(()), ctx)
    sd = porting.flax_to_torch_state_dict(params)
    module = FakeTorchModule(sd)

    # Head counts are not recoverable from shapes: inferred config differs
    # only in attention_head_dim (tiny uses 4, SD1-family default is 8).
    inferred_params, inferred_cfg = porting.port_torch_unet(module)
    assert inferred_cfg.block_out_channels == \
        TINY_SD_UNET_CONFIG.block_out_channels
    assert inferred_cfg.cross_attention_dim == 64
    ported_params, cfg = porting.port_torch_unet(module,
                                                 cfg=TINY_SD_UNET_CONFIG)
    assert cfg == TINY_SD_UNET_CONFIG
    want = unet.apply(params, lat, jnp.float32(7), ctx)
    got = SDUNet(cfg).apply(ported_params, lat, jnp.float32(7), ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # Differentiability: grad w.r.t. an embedding flows through the port.
    def loss(c):
        return jnp.sum(SDUNet(cfg).apply(ported_params, lat, jnp.float32(7),
                                         c) ** 2)

    g = jax.grad(loss)(ctx)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_from_torch_modules_ports_to_flax():
    from comfystereo_tpu.diffusion.adapters import from_torch_modules

    vae = SDVAE(TINY_SD_VAE_CONFIG)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 32, 32)))
    unet = SDUNet(TINY_SD_UNET_CONFIG)
    uparams = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                        jnp.zeros(()), jnp.zeros((1, 77, 64)))
    m_unet = FakeTorchModule(porting.flax_to_torch_state_dict(uparams))
    m_vae = FakeTorchModule(porting.flax_to_torch_state_dict(vparams))
    model = from_torch_modules(m_unet, m_vae, None, None,
                               unet_cfg=TINY_SD_UNET_CONFIG,
                               vae_cfg=TINY_SD_VAE_CONFIG)
    # Ported bundle carries real flax params (grad-capable), not callbacks.
    assert model.unet_params is not None
    eps = model.unet_apply(model.unet_params, jnp.zeros((2, 4, 8, 8)),
                           jnp.float32(1), jnp.zeros((2, 77, 64)))
    assert eps.shape == (2, 4, 8, 8)
    z = model.vae_encode(model.vae_params, jnp.zeros((1, 3, 32, 32)))
    assert z.shape == (1, 4, 16, 16)


def test_infer_unet_config_sd2_heads():
    """1024-d context selects 64-d heads (SD2 family)."""
    from comfystereo_tpu.diffusion.sd_unet import SDUNetConfig

    sd = {
        "conv_in.weight": np.zeros((320, 4, 3, 3)),
        "conv_out.weight": np.zeros((4, 320, 3, 3)),
        "down_blocks.0.resnets.0.conv1.weight": np.zeros((320, 320, 3, 3)),
        "down_blocks.0.resnets.1.conv1.weight": np.zeros((320, 320, 3, 3)),
        "down_blocks.1.resnets.0.conv1.weight": np.zeros((640, 320, 3, 3)),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((320, 1024)),
    }
    cfg = porting.infer_unet_config(sd)
    assert cfg.cross_attention_dim == 1024
    assert cfg.attention_head_dim == (5, 10)
    assert cfg.block_out_channels == (320, 640)
    assert cfg.layers_per_block == 2


def test_port_ldm_vae_with_1x1_conv_attention():
    """Legacy LDM/ComfyUI VAEs store attention q/k/v/proj_out as [C,C,1,1]
    convs while SDVAE implements them as nn.Dense (2-D kernels). The port
    must squeeze those to Dense kernels keyed on the parent module name —
    the old 'attn' substring check never matched modern
    '...attentions.N.to_q...' spellings, so the squeeze silently never
    fired and check_port raised for every LDM checkpoint (ADVICE r2,
    high). Shape-level AND value-level: forward equality after the port."""
    vae = SDVAE(TINY_SD_VAE_CONFIG)
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 32, 32))
    params = vae.init(jax.random.PRNGKey(1), img)
    modern = porting.flax_to_torch_state_dict(params)

    # Rewrite the modern diffusers layout into the legacy LDM VAE layout:
    # attention projections become 1x1 convs under their legacy names.
    back = {"to_q": "q", "to_k": "k", "to_v": "v"}
    ldm = {}
    for key, v in modern.items():
        parts = key.split(".")
        if "attentions" in parts:
            i = parts.index("attentions")
            side = parts[0]
            mid = "attn_1"  # tiny config: only mid-block attention
            rest = parts[i + 2:]
            if rest[0] in back:
                name = back[rest[0]]
            elif rest[0] == "to_out":
                name, rest = "proj_out", [rest[0]] + rest[2:]
            else:  # group_norm
                name = "norm"
            leaf = rest[-1]
            if name in ("q", "k", "v", "proj_out") and leaf == "weight":
                v = v[:, :, None, None]  # Dense [out,in] -> conv [O,I,1,1]
            ldm[f"{side}.mid.{mid}.{name}.{leaf}"] = v
        elif "mid_block" in parts:
            i = parts.index("mid_block")
            blk = {"resnets": {"0": "block_1", "1": "block_2"}}[
                parts[i + 1]][parts[i + 2]]
            rest = ".".join(parts[i + 3:])
            rest = rest.replace("conv_shortcut", "nin_shortcut")
            ldm[f"{parts[0]}.mid.{blk}.{rest}"] = v
        elif "down_blocks" in parts or "up_blocks" in parts:
            updown = "down" if "down_blocks" in parts else "up"
            i = parts.index(f"{updown}_blocks")
            n_blocks = len(TINY_SD_VAE_CONFIG.block_out_channels)
            bi = int(parts[i + 1])
            if updown == "up":
                bi = n_blocks - 1 - bi  # reversed order
            if parts[i + 2] == "resnets":
                rest = ".".join(parts[i + 4:]).replace("conv_shortcut",
                                                       "nin_shortcut")
                ldm[f"{parts[0]}.{updown}.{bi}.block.{parts[i + 3]}."
                    f"{rest}"] = v
            else:  # downsamplers/upsamplers
                kind = "downsample" if updown == "down" else "upsample"
                ldm[f"{parts[0]}.{updown}.{bi}.{kind}."
                    + ".".join(parts[i + 4:])] = v
        elif "conv_norm_out" in parts:
            ldm[key.replace("conv_norm_out", "norm_out")] = v
        else:  # conv_in/conv_out/quant_conv/post_quant_conv
            ldm[key] = v

    module = FakeTorchModule(ldm)
    ported, cfg = porting.port_torch_vae(module, cfg=TINY_SD_VAE_CONFIG)
    # to_q must be a Dense kernel (2-D), not a 4-D conv kernel
    q = ported["params"]["encoder"]["mid_block"]["attentions_0"]["to_q"]
    assert q["kernel"].ndim == 2
    want = vae.apply(params, img)
    got = SDVAE(cfg).apply(ported, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
