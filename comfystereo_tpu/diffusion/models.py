"""Model layer: latent UNet, VAE, and text-encoder interfaces + adapters.

This is the TPU-native equivalent of the reference's model adapter layer
(model_wrappers.py: VAEWrapper/TextEncoderWrapper/TokenizerWrapper/UNetWrapper/
ComfyUIModelWrapper, and model_loader.py's diffusers loaders): a uniform
functional interface the diffusion pipelines consume, with several providers:

  * LatentUNet — a flax UNet (conv + self/cross attention, timestep embedding)
    sized by `UNetConfig`. The default tiny config powers tests and the
    multi-chip dryrun; the same architecture scales to SD-1.x dimensions.
  * SimpleVAE — a stride-8 conv autoencoder with the SD latent contract
    (x in [-1,1] <-> latents * 0.18215).
  * HFTextEncoder — CLIP text encoder via `transformers` Flax models (gated).
  * HashTextEncoder — deterministic embedding stub for tests / promptless use.

All model calls are pure: apply(params, ...) -> arrays; pipelines never hold
mutable module state, so whole sampling loops jit and shard cleanly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import AttentionMode, bn_attention

# SD latent scaling (reference inversion.py:97, :130)
LATENT_SCALE = 0.18215


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    base_channels: int = 32
    channel_mults: tuple = (1, 2)
    num_heads: int = 4
    context_dim: int = 64
    time_dim: int = 64


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class _Attention(nn.Module):
    """Self- or cross-attention block routed through bn_attention so the
    stereo coupling applies uniformly to every layer (reference registers an
    editor on each *Attention* module, stereo_utils.py:258-281)."""

    heads: int
    dim: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, *, mode: AttentionMode,
                 stereo_active):
        b, n, c = x.shape
        is_cross = context is not None
        ctx = context if is_cross else x
        head_dim = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(ctx)

        def split(t):
            return t.reshape(b, -1, self.heads, head_dim).transpose(0, 2, 1, 3)

        out = bn_attention(split(q), split(k), split(v),
                           scale=head_dim ** -0.5, is_cross=is_cross,
                           mode=mode, active=stereo_active)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(c, name="to_out")(out)


class _TransformerBlock(nn.Module):
    heads: int
    dim: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context, *, mode, stereo_active):
        h = x + _Attention(self.heads, self.dim, name="attn1")(
            nn.LayerNorm()(x), mode=mode, stereo_active=stereo_active)
        h = h + _Attention(self.heads, self.dim, self.context_dim,
                           name="attn2")(
            nn.LayerNorm()(h), context, mode=mode, stereo_active=stereo_active)
        ff = nn.Sequential([nn.Dense(4 * self.dim), nn.gelu,
                            nn.Dense(self.dim)])
        return h + ff(nn.LayerNorm()(h))


class _ResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=8)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3))(h)
        h = h + nn.Dense(self.channels)(nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=8)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3))(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1))(x)
        return x + h


class LatentUNet(nn.Module):
    """Conditional latent UNet: NHWC internally, NCHW at the interface
    (matching the diffusers `unet(latents, t, encoder_hidden_states)` call
    convention the reference uses throughout)."""

    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, latents_nchw, t, context, *,
                 mode: AttentionMode = AttentionMode(),
                 stereo_active=False):
        cfg = self.cfg
        x = jnp.transpose(latents_nchw, (0, 2, 3, 1))        # NHWC
        if jnp.ndim(t) == 0:
            t = jnp.full((x.shape[0],), t)
        temb = nn.Dense(cfg.time_dim)(
            nn.silu(nn.Dense(cfg.time_dim)(
                timestep_embedding(t, cfg.time_dim))))

        x = nn.Conv(cfg.base_channels, (3, 3))(x)
        skips = [x]
        # down
        for mult in cfg.channel_mults:
            ch = cfg.base_channels * mult
            x = _ResBlock(ch)(x, temb)
            b, hh, ww, c = x.shape
            tokens = _TransformerBlock(cfg.num_heads, c, cfg.context_dim)(
                x.reshape(b, hh * ww, c), context, mode=mode,
                stereo_active=stereo_active)
            x = tokens.reshape(b, hh, ww, c)
            skips.append(x)
            x = nn.Conv(ch, (3, 3), strides=(2, 2))(x)
        # mid
        ch = cfg.base_channels * cfg.channel_mults[-1]
        x = _ResBlock(ch)(x, temb)
        b, hh, ww, c = x.shape
        x = _TransformerBlock(cfg.num_heads, c, cfg.context_dim)(
            x.reshape(b, hh * ww, c), context, mode=mode,
            stereo_active=stereo_active).reshape(b, hh, ww, c)
        # up
        for mult in reversed(cfg.channel_mults):
            ch = cfg.base_channels * mult
            b, hh, ww, c = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, c), "nearest")
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = _ResBlock(ch)(x, temb)
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.Conv(cfg.out_channels, (3, 3))(nn.silu(x))
        return jnp.transpose(x, (0, 3, 1, 2))                # NCHW


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

class SimpleVAE(nn.Module):
    """Stride-8 conv autoencoder with the SD latent interface:
    encode([-1,1] NCHW image) -> mean latents; decode(latents) -> [-1,1].
    (Interface parity with VAEWrapper, model_wrappers.py:34-105.)"""

    latent_channels: int = 4
    base: int = 32

    def setup(self):
        self.enc = nn.Sequential([
            nn.Conv(self.base, (3, 3), strides=(2, 2)), nn.silu,
            nn.Conv(self.base * 2, (3, 3), strides=(2, 2)), nn.silu,
            nn.Conv(self.base * 4, (3, 3), strides=(2, 2)), nn.silu,
            nn.Conv(self.latent_channels, (3, 3)),
        ])
        self.dec = nn.Sequential([
            nn.Conv(self.base * 4, (3, 3)), nn.silu,
            nn.ConvTranspose(self.base * 2, (4, 4), strides=(2, 2)), nn.silu,
            nn.ConvTranspose(self.base, (4, 4), strides=(2, 2)), nn.silu,
            nn.ConvTranspose(3, (4, 4), strides=(2, 2)),
        ])

    def encode(self, img_nchw):
        x = jnp.transpose(img_nchw, (0, 2, 3, 1))
        z = self.enc(x)
        return jnp.transpose(z, (0, 3, 1, 2))

    def decode(self, z_nchw):
        z = jnp.transpose(z_nchw, (0, 2, 3, 1))
        x = self.dec(z)
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, img_nchw):
        return self.decode(self.encode(img_nchw))


# ---------------------------------------------------------------------------
# Text encoders
# ---------------------------------------------------------------------------

class HashTextEncoder:
    """Deterministic prompt -> [1, 77, dim] embedding without any model
    download; a stand-in with the TextEncoderWrapper interface
    (model_wrappers.py:108-171) for tests and offline use."""

    def __init__(self, dim: int = 64, max_length: int = 77):
        self.dim = dim
        self.max_length = max_length
        self._cache = {}

    def __call__(self, text: str) -> jnp.ndarray:
        if text not in self._cache:
            seed = abs(hash(("comfystereo", text))) % (2 ** 31)
            key = jax.random.PRNGKey(seed)
            self._cache[text] = jax.random.normal(
                key, (1, self.max_length, self.dim)) * 0.02
        return self._cache[text]


def load_hf_text_encoder(model_id: str = "openai/clip-vit-base-patch32"):
    """CLIP text encoder via transformers Flax (gated; requires local cache
    since this environment has no egress)."""
    from transformers import CLIPTokenizer, FlaxCLIPTextModel  # gated import

    tokenizer = CLIPTokenizer.from_pretrained(model_id)
    model = FlaxCLIPTextModel.from_pretrained(model_id)

    def encode(text: str) -> jnp.ndarray:
        tokens = tokenizer([text], padding="max_length",
                           max_length=tokenizer.model_max_length,
                           truncation=True, return_tensors="np")
        return model(**tokens).last_hidden_state

    return encode


# ---------------------------------------------------------------------------
# Bundle
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DiffusionModel:
    """Functional bundle consumed by the pipelines: pure apply fns + params.

    unet_apply(params, latents_nchw, t, context, mode, stereo_active) -> eps
    vae_encode/vae_decode(params, x) with the SD 0.18215 scaling OUTSIDE.
    """

    unet_apply: Callable
    unet_params: Any
    vae_encode: Callable
    vae_decode: Callable
    vae_params: Any
    text_encode: Callable
    latent_channels: int = 4
    context_dim: int = 64
    # UNet input channels; 9 selects the SD-inpainting concat path
    # (latents + mask + masked-image latents, model_wrappers.py:594-612).
    unet_in_channels: int = 4
    # Native pixel resolution the model was trained at. The node resizes
    # inputs to this square before diffusion and resizes results back, like
    # the reference's unconditional 512x512 normalization
    # (stereodiffusion_nodes.py:257-260 Standard, :426-430/:563-571 Fast).
    sample_size: int = 512


def make_toy_model(rng: Optional[jax.Array] = None, image_size: int = 32,
                   cfg: UNetConfig = UNetConfig()) -> DiffusionModel:
    """Small random-weight model wiring the full stack (tests, dryrun)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    unet = LatentUNet(cfg)
    lat = jnp.zeros((1, cfg.in_channels, image_size // 8, image_size // 8))
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    unet_params = unet.init(r1, lat, jnp.zeros(()), ctx)
    vae = SimpleVAE(latent_channels=cfg.in_channels)
    img = jnp.zeros((1, 3, image_size, image_size))
    vae_params = vae.init(r2, img)

    import functools

    @functools.partial(jax.jit, static_argnames=("mode",))
    def _unet_jit(params, latents, t, context, stereo_active,
                  mode: AttentionMode):
        return unet.apply(params, latents, t, context, mode=mode,
                          stereo_active=stereo_active)

    def unet_apply(params, latents, t, context, mode=AttentionMode(),
                   stereo_active=False):
        return _unet_jit(params, latents, t, context, stereo_active, mode)

    return DiffusionModel(
        unet_apply=unet_apply,
        unet_params=unet_params,
        vae_encode=jax.jit(
            lambda p, x: vae.apply(p, x, method=SimpleVAE.encode)),
        vae_decode=jax.jit(
            lambda p, z: vae.apply(p, z, method=SimpleVAE.decode)),
        vae_params=vae_params,
        text_encode=HashTextEncoder(dim=cfg.context_dim),
        latent_channels=cfg.in_channels,
        context_dim=cfg.context_dim,
        sample_size=image_size,
    )
