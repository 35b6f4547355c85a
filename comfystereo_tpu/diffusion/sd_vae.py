"""Stable-Diffusion VAE (AutoencoderKL) in flax, weight-port compatible.

Same architecture as the VAE the reference drives through diffusers / ComfyUI
(model_wrappers.py:34-105 wraps it; model_loader.py loads it inside the SD
pipelines). Parameter naming mirrors the diffusers torch state_dict (merged
``name_index`` convention, e.g. ``encoder / down_blocks_0 / resnets_1``) so
real checkpoints port via `porting.torch_to_flax_params`. NHWC internally;
NCHW interface with the standard SD contract: encode([-1,1] image) -> latent
mean (scaling by 0.18215 is applied OUTSIDE, see models.LATENT_SCALE),
decode(latents) -> [-1,1].
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .sd_unet import Downsample2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class SDVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32


SD_VAE_CONFIG = SDVAEConfig()
TINY_SD_VAE_CONFIG = SDVAEConfig(block_out_channels=(16, 32),
                                 layers_per_block=1, norm_num_groups=8)


class _VAEResnet(nn.Module):
    out_channels: int
    norm_groups: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                                 name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), name="conv1")(h)
        h = nn.silu(nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                                 name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class _VAEAttention(nn.Module):
    """Single-head spatial self-attention over [B, H*W, C] tokens
    (diffusers Attention in the VAE mid block)."""

    channels: int
    norm_groups: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                         name="group_norm")(x)
        tokens = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(tokens)
        k = nn.Dense(c, name="to_k")(tokens)
        v = nn.Dense(c, name="to_v")(tokens)
        # f32 logits/softmax under bf16 inference (matches attention.py;
        # hand-rolled softmax for the same fusion win).
        from .attention import _softmax_last

        sim = jnp.einsum("bnd,bmd->bnm", q, k,
                         preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = _softmax_last(sim).astype(v.dtype)
        out = jnp.einsum("bnm,bmd->bnd", attn, v)
        out = nn.Dense(c, name="to_out_0")(out)
        return x + out.reshape(b, h, w, c)


class _VAEMidBlock(nn.Module):
    channels: int
    norm_groups: int

    @nn.compact
    def __call__(self, x):
        x = _VAEResnet(self.channels, self.norm_groups, name="resnets_0")(x)
        x = _VAEAttention(self.channels, self.norm_groups,
                          name="attentions_0")(x)
        return _VAEResnet(self.channels, self.norm_groups, name="resnets_1")(x)


class _DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    norm_groups: int
    add_downsample: bool

    @nn.compact
    def __call__(self, x):
        for j in range(self.num_layers):
            x = _VAEResnet(self.out_channels, self.norm_groups,
                           name=f"resnets_{j}")(x)
        if self.add_downsample:
            # diffusers VAE Downsample2D pads (0,1) on each spatial side.
            x = Downsample2D(self.out_channels, padding=((0, 1), (0, 1)),
                             name="downsamplers_0")(x)
        return x


class _UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    norm_groups: int
    add_upsample: bool

    @nn.compact
    def __call__(self, x):
        for j in range(self.num_layers):
            x = _VAEResnet(self.out_channels, self.norm_groups,
                           name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class _Encoder(nn.Module):
    cfg: SDVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        n = len(cfg.block_out_channels)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            x = _DownEncoderBlock(ch, cfg.layers_per_block,
                                  cfg.norm_num_groups,
                                  add_downsample=i < n - 1,
                                  name=f"down_blocks_{i}")(x)
        x = _VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                         name="mid_block")(x)
        x = nn.silu(nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                                 name="conv_norm_out")(x))
        return nn.Conv(2 * cfg.latent_channels, (3, 3), name="conv_out")(x)


class _Decoder(nn.Module):
    cfg: SDVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        n = len(cfg.block_out_channels)
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), name="conv_in")(z)
        x = _VAEMidBlock(rev[0], cfg.norm_num_groups, name="mid_block")(x)
        for i, ch in enumerate(rev):
            x = _UpDecoderBlock(ch, cfg.layers_per_block + 1,
                                cfg.norm_num_groups,
                                add_upsample=i < n - 1,
                                name=f"up_blocks_{i}")(x)
        x = nn.silu(nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                                 name="conv_norm_out")(x))
        return nn.Conv(cfg.out_channels, (3, 3), name="conv_out")(x)


class SDVAE(nn.Module):
    """AutoencoderKL-equivalent; NCHW interface.

    encode: [B,3,H,W] in [-1,1] -> latent MEAN [B,4,H/8,W/8] (the reference's
    VAEWrapper returns the distribution mean, model_wrappers.py:60-71).
    decode: latents -> [B,3,H,W] in [-1,1].
    """

    cfg: SDVAEConfig = SD_VAE_CONFIG

    def setup(self):
        self.encoder = _Encoder(self.cfg)
        self.decoder = _Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, img_nchw):
        x = jnp.transpose(img_nchw, (0, 2, 3, 1))
        moments = self.quant_conv(self.encoder(x))
        mean = moments[..., :self.cfg.latent_channels]
        return jnp.transpose(mean, (0, 3, 1, 2))

    def decode(self, z_nchw):
        z = jnp.transpose(z_nchw, (0, 2, 3, 1))
        x = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, img_nchw):
        return self.decode(self.encode(img_nchw))
