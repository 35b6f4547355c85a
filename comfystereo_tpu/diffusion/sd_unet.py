"""Stable-Diffusion UNet (flax), TPU-native, weight-port compatible.

The reference runs real SD 1.5 / SD 2 checkpoints through diffusers or ComfyUI
(model_loader.py:22-141, model_wrappers.py:352-641). This module provides the
same architecture as a from-scratch flax model whose parameter tree mirrors
the diffusers torch state_dict key-for-key (module names use the
``name_index`` merge convention, e.g. ``down_blocks_0 / resnets_1 / conv1``),
so real checkpoints port mechanically via `porting.torch_to_flax_params`.

TPU-first design choices:
  * every self-attention layer routes through `bn_attention`, so the
    StereoDiffusion coupling (reference stereo_utils.py:91-187) applies to the
    real SD model with zero monkey-patching — `mode`/`stereo_active` are
    threaded values, keeping full denoising loops jit/scan-compatible;
  * NHWC layout internally (XLA's preferred conv layout on TPU), NCHW at the
    interface to match the diffusers calling convention;
  * GEGLU/attention math in exact (erf) gelu and f32 accumulation so ported
    weights reproduce torch numerics.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from .attention import AttentionMode, bn_attention


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    """SD-family UNet2DConditionModel hyperparameters (diffusers semantics:
    `attention_head_dim` is the per-block head COUNT for SD1.x configs)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    norm_num_groups: int = 32

    def heads_for_block(self, i: int) -> int:
        if isinstance(self.attention_head_dim, tuple):
            return self.attention_head_dim[i]
        return self.attention_head_dim


# SD 1.x (runwayml/stable-diffusion-v1-5 unet/config.json)
SD15_UNET_CONFIG = SDUNetConfig()
# SD 1.5 inpainting: 9-channel input = latents + mask + masked-image latents
# (reference model_wrappers.py:594-612)
SD15_INPAINT_UNET_CONFIG = SDUNetConfig(in_channels=9)
# SD 2.x (stabilityai/stable-diffusion-2-1): 1024-d context, 64-d heads
SD21_UNET_CONFIG = SDUNetConfig(cross_attention_dim=1024,
                                attention_head_dim=(5, 10, 20, 20))
# Tiny config exercising every block type (tests / dryrun)
TINY_SD_UNET_CONFIG = SDUNetConfig(block_out_channels=(32, 64),
                                   layers_per_block=1, cross_attention_dim=64,
                                   attention_head_dim=4, norm_num_groups=8)


def sd_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """diffusers get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0: [B] -> [B, dim] as [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, temb):
        h = nn.Dense(self.dim, name="linear_1")(temb)
        return nn.Dense(self.dim, name="linear_2")(nn.silu(h))


class CrossAttention(nn.Module):
    """Q/K/V attention with the BN stereo coupling on self-attention
    (reference registers an editor on every *Attention* module,
    stereo_utils.py:258-281; here the coupling is the default code path)."""

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context, *, mode: AttentionMode, stereo_active):
        is_cross = context is not None
        ctx = context if is_cross else x
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        b = x.shape[0]

        def split(t):
            return t.reshape(b, -1, self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        out = bn_attention(split(q), split(k), split(v),
                           scale=self.dim_head ** -0.5, is_cross=is_cross,
                           mode=mode, active=stereo_active)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        return nn.Dense(self.query_dim, name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = GEGLU(self.dim * 4, name="net_0")(x)
        return nn.Dense(self.dim, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context, *, mode, stereo_active):
        h = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), None,
            mode=mode, stereo_active=stereo_active)
        h = h + CrossAttention(self.dim, self.heads, self.dim_head,
                               self.context_dim, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(h), context,
            mode=mode, stereo_active=stereo_active)
        return h + FeedForward(self.dim, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(h))


class Transformer2D(nn.Module):
    """SD1.x spatial transformer (use_linear_projection=False: 1x1-conv
    projections), NHWC in/out."""

    channels: int
    heads: int
    context_dim: int
    norm_groups: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context, *, mode, stereo_active):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6,
                         name="norm")(x)
        # The 1x1-conv projections run on the TOKEN view ([B, N, 1, C]
        # NHWC): identical math and identical conv param shapes, but the
        # whole transformer then stays in one layout — mixing spatial-NHWC
        # convs with token reshapes triggers a measured bf16 relayout
        # pathology on TPU (10.4 -> ~7 ms per level-0 block on v5e).
        t4 = y.reshape(b, h * w, 1, c)
        t4 = nn.Conv(self.channels, (1, 1), name="proj_in")(t4)
        tokens = t4.reshape(b, h * w, self.channels)
        for i in range(self.depth):
            tokens = BasicTransformerBlock(
                self.channels, self.heads, self.channels // self.heads,
                self.context_dim, name=f"transformer_blocks_{i}")(
                tokens, context, mode=mode, stereo_active=stereo_active)
        t4 = tokens.reshape(b, h * w, 1, self.channels)
        t4 = nn.Conv(c, (1, 1), name="proj_out")(t4)
        return t4.reshape(b, h, w, c) + residual


class ResnetBlock2D(nn.Module):
    out_channels: int
    norm_groups: int
    use_temb: bool = True

    @nn.compact
    def __call__(self, x, temb=None):
        h = nn.silu(nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                 name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), name="conv1")(h)
        if self.use_temb and temb is not None:
            h = h + nn.Dense(self.out_channels, name="time_emb_proj")(
                nn.silu(temb))[:, None, None, :]
        h = nn.silu(nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                 name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    channels: int
    padding: Tuple = ((1, 1), (1, 1))

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding=self.padding, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(self.channels, (3, 3), name="conv")(x)


class _DownBlock(nn.Module):
    """CrossAttnDownBlock2D / DownBlock2D (when has_attn=False)."""

    out_channels: int
    num_layers: int
    heads: int
    context_dim: int
    norm_groups: int
    has_attn: bool
    add_downsample: bool

    @nn.compact
    def __call__(self, x, temb, context, *, mode, stereo_active):
        residuals = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.norm_groups,
                              name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.out_channels, self.heads,
                                  self.context_dim, self.norm_groups,
                                  name=f"attentions_{i}")(
                    x, context, mode=mode, stereo_active=stereo_active)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            residuals.append(x)
        return x, residuals


class _UpBlock(nn.Module):
    """CrossAttnUpBlock2D / UpBlock2D (when has_attn=False)."""

    out_channels: int
    num_layers: int
    heads: int
    context_dim: int
    norm_groups: int
    has_attn: bool
    add_upsample: bool

    @nn.compact
    def __call__(self, x, skips, temb, context, *, mode, stereo_active):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, self.norm_groups,
                              name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.out_channels, self.heads,
                                  self.context_dim, self.norm_groups,
                                  name=f"attentions_{i}")(
                    x, context, mode=mode, stereo_active=stereo_active)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class _MidBlock(nn.Module):
    channels: int
    heads: int
    context_dim: int
    norm_groups: int

    @nn.compact
    def __call__(self, x, temb, context, *, mode, stereo_active):
        x = ResnetBlock2D(self.channels, self.norm_groups,
                          name="resnets_0")(x, temb)
        x = Transformer2D(self.channels, self.heads, self.context_dim,
                          self.norm_groups, name="attentions_0")(
            x, context, mode=mode, stereo_active=stereo_active)
        return ResnetBlock2D(self.channels, self.norm_groups,
                             name="resnets_1")(x, temb)


class SDUNet(nn.Module):
    """UNet2DConditionModel-equivalent. NCHW interface:
    __call__(latents [B,C,h,w], t, context [B,77,ctx]) -> eps [B,C,h,w].

    SD1.x topology: cross-attention on every level except the deepest
    (derived from len(block_out_channels)); layers_per_block resnets down,
    layers_per_block+1 up; mid = resnet / transformer / resnet.
    """

    cfg: SDUNetConfig = SD15_UNET_CONFIG

    @nn.compact
    def __call__(self, latents_nchw, t, context, *,
                 mode: AttentionMode = AttentionMode(),
                 stereo_active=False):
        cfg = self.cfg
        n = len(cfg.block_out_channels)
        time_embed_dim = cfg.block_out_channels[0] * 4
        x = jnp.transpose(latents_nchw, (0, 2, 3, 1))  # NHWC
        if jnp.ndim(t) == 0:
            t = jnp.full((x.shape[0],), t)
        temb = TimestepEmbedding(time_embed_dim, name="time_embedding")(
            sd_timestep_embedding(t, cfg.block_out_channels[0]))
        # The sinusoid/MLP run in f32 (mixed-dtype promotion under bf16
        # params); cast down so the resnet time projections don't upcast
        # the whole conv path when inference runs in bf16.
        temb = temb.astype(x.dtype)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), name="conv_in")(x)
        skips = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            x, res = _DownBlock(
                out_channels=ch, num_layers=cfg.layers_per_block,
                heads=cfg.heads_for_block(i),
                context_dim=cfg.cross_attention_dim,
                norm_groups=cfg.norm_num_groups,
                has_attn=i < n - 1, add_downsample=i < n - 1,
                name=f"down_blocks_{i}")(
                x, temb, context, mode=mode, stereo_active=stereo_active)
            skips.extend(res)

        x = _MidBlock(cfg.block_out_channels[-1], cfg.heads_for_block(n - 1),
                      cfg.cross_attention_dim, cfg.norm_num_groups,
                      name="mid_block")(
            x, temb, context, mode=mode, stereo_active=stereo_active)

        for i in range(n):
            j = n - 1 - i  # mirrored down-block index
            x = _UpBlock(
                out_channels=cfg.block_out_channels[j],
                num_layers=cfg.layers_per_block + 1,
                heads=cfg.heads_for_block(j),
                context_dim=cfg.cross_attention_dim,
                norm_groups=cfg.norm_num_groups,
                has_attn=j < n - 1, add_upsample=j > 0,
                name=f"up_blocks_{i}")(
                x, skips, temb, context, mode=mode,
                stereo_active=stereo_active)

        x = nn.silu(nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                                 name="conv_norm_out")(x))
        x = nn.Conv(cfg.out_channels, (3, 3), name="conv_out")(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # NCHW
