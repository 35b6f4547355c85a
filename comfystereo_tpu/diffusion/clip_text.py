"""CLIP text encoder (flax), TPU-native, weight-port compatible.

The reference's prompt conditioning always runs a real CLIP text model:
ComfyUI CLIP through TextEncoderWrapper (/root/reference/
model_wrappers.py:108-171) or the diffusers pipeline's CLIPTextModel
(/root/reference/model_loader.py:22-95). This module is the from-scratch
flax counterpart whose parameter tree mirrors the transformers torch
state_dict key-for-key (same ``name_index`` merge convention as sd_unet /
sd_vae), so checkpoint ``text_encoder/`` weights port mechanically through
`porting.torch_to_flax_params`:

    torch  text_model.encoder.layers.0.self_attn.q_proj.weight
    flax   params/text_model/encoder/layers_0/self_attn/q_proj/kernel

Covers both SD text encoders:
  * SD1.x — CLIP ViT-L/14 text tower: 12 layers x 768, 12 heads, quick_gelu
    (123,060,480 params);
  * SD2.x — OpenCLIP ViT-H text tower as diffusers stores it: truncated to
    23 layers x 1024, 16 heads, gelu — the final hidden state of the
    truncated model IS the penultimate state of the original, which is what
    SD2 conditions on.

TPU notes: the entire encode is one jitted program of 77-token matmuls —
tiny next to the UNet; attention logits, softmax, and LayerNorm statistics
stay in f32 under bf16 params (flax norm stats are f32 by design;
the causal bias uses finfo.min exactly like transformers so ported
checkpoints reproduce torch numerics).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


# SD1.x (openai/clip-vit-large-patch14 text tower)
SD15_TEXT_CONFIG = CLIPTextConfig()
# SD2.x (stabilityai/stable-diffusion-2-1 text_encoder/config.json)
SD21_TEXT_CONFIG = CLIPTextConfig(hidden_size=1024, num_hidden_layers=23,
                                  num_attention_heads=16,
                                  intermediate_size=4096, hidden_act="gelu")
# Tiny config for tests
TINY_TEXT_CONFIG = CLIPTextConfig(vocab_size=96, hidden_size=32,
                                  num_hidden_layers=2,
                                  num_attention_heads=4,
                                  intermediate_size=64)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"unsupported hidden_act: {name}")


class _CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        cfg = self.cfg
        b, n, c = x.shape
        heads = cfg.num_attention_heads
        head_dim = c // heads
        scale = head_dim ** -0.5
        # transformers CLIPAttention scales q BEFORE the matmul.
        q = nn.Dense(c, name="q_proj")(x) * scale
        k = nn.Dense(c, name="k_proj")(x)
        v = nn.Dense(c, name="v_proj")(x)

        def split(t):
            return t.reshape(b, n, heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + causal_bias
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="out_proj")(out)


class _CLIPMLP(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, name="fc1")(x)
        h = _act(self.cfg.hidden_act)(h)
        return nn.Dense(self.cfg.hidden_size, name="fc2")(h)


class _CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        eps = self.cfg.layer_norm_eps
        h = x + _CLIPAttention(self.cfg, name="self_attn")(
            nn.LayerNorm(epsilon=eps, name="layer_norm1")(x), causal_bias)
        return h + _CLIPMLP(self.cfg, name="mlp")(
            nn.LayerNorm(epsilon=eps, name="layer_norm2")(h))


class _CLIPTextTransformer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.cfg
        b, n = input_ids.shape

        class _Embeddings(nn.Module):
            @nn.compact
            def __call__(self, ids):
                tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                               name="token_embedding")(ids)
                pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                               name="position_embedding")(
                    jnp.arange(n)[None, :])
                return tok + pos

        class _Encoder(nn.Module):
            @nn.compact
            def __call__(self, h, causal_bias):
                for i in range(cfg.num_hidden_layers):
                    h = _CLIPEncoderLayer(cfg, name=f"layers_{i}")(
                        h, causal_bias)
                return h

        x = _Embeddings(name="embeddings")(input_ids)
        # Causal bias with finfo.min (transformers convention; softmax in
        # f32 keeps the masked logits from overflowing smaller dtypes).
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.triu(jnp.full((n, n), neg, dtype=jnp.float32), k=1)
        x = _Encoder(name="encoder")(x, causal[None, None])
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="final_layer_norm")(x)


class CLIPTextModel(nn.Module):
    """``input_ids [B, N] int32 -> last_hidden_state [B, N, hidden]``.

    The `text_model` wrapper level matches the transformers CLIPTextModel
    state_dict prefix so ports need no key surgery.
    """

    cfg: CLIPTextConfig = SD15_TEXT_CONFIG

    @nn.compact
    def __call__(self, input_ids):
        return _CLIPTextTransformer(self.cfg, name="text_model")(input_ids)


class NativeCLIPTextEncoder:
    """tokenizer + flax CLIP + params bundled behind the TextEncoderWrapper
    interface (str -> [1, 77, hidden]) with per-prompt caching, mirroring
    the reference's embedding cache (model_wrappers.py:119-140)."""

    def __init__(self, tokenizer, params, cfg: CLIPTextConfig,
                 dtype=None):
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.dim = cfg.hidden_size
        model = CLIPTextModel(cfg)
        if dtype is not None:
            params = jax.tree.map(
                lambda a: jnp.asarray(a, dtype=dtype), params)
        self.params = params
        self._apply = jax.jit(lambda p, ids: model.apply(p, ids))
        self._cache = {}

    def __call__(self, text: str) -> jnp.ndarray:
        if text not in self._cache:
            ids = jnp.asarray(self.tokenizer(
                [text], padding="max_length",
                max_length=self.cfg.max_position_embeddings,
                truncation=True, return_tensors="np").input_ids)
            out = self._apply(self.params, ids)
            self._cache[text] = out.astype(jnp.float32)
        return self._cache[text]


def infer_text_config(state_dict) -> CLIPTextConfig:
    """CLIPTextConfig from a transformers-layout state_dict's shapes.
    The activation is not recoverable from shapes: 768-wide towers are the
    SD1.x CLIP (quick_gelu), wider ones OpenCLIP-derived (gelu) — the same
    family split the reference's detect_model_type makes
    (model_wrappers.py:394-417)."""
    tok = state_dict["text_model.embeddings.token_embedding.weight"]
    pos = state_dict["text_model.embeddings.position_embedding.weight"]
    vocab, hidden = tuple(tok.shape)
    layers = 0
    while (f"text_model.encoder.layers.{layers}.self_attn.q_proj.weight"
           in state_dict):
        layers += 1
    inter = tuple(
        state_dict["text_model.encoder.layers.0.mlp.fc1.weight"].shape)[0]
    heads = {768: 12, 1024: 16, 1280: 20}.get(hidden, hidden // 64)
    act = "quick_gelu" if hidden <= 768 else "gelu"
    return CLIPTextConfig(vocab_size=vocab, hidden_size=hidden,
                          num_hidden_layers=layers,
                          num_attention_heads=heads,
                          intermediate_size=inter,
                          max_position_embeddings=tuple(pos.shape)[0],
                          hidden_act=act)


def config_from_json(cfg_json: dict) -> CLIPTextConfig:
    """CLIPTextConfig from a transformers text_encoder/config.json dict."""
    return CLIPTextConfig(
        vocab_size=cfg_json.get("vocab_size", 49408),
        hidden_size=cfg_json.get("hidden_size", 768),
        num_hidden_layers=cfg_json.get("num_hidden_layers", 12),
        num_attention_heads=cfg_json.get("num_attention_heads", 12),
        intermediate_size=cfg_json.get("intermediate_size", 3072),
        max_position_embeddings=cfg_json.get("max_position_embeddings", 77),
        hidden_act=cfg_json.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg_json.get("layer_norm_eps", 1e-5),
    )
