"""External model adapters (import-guarded).

Equivalent of the reference's model adapter layer
(model_wrappers.py:352-485, model_loader.py:12-141): turn externally loaded
diffusion stacks into the functional `DiffusionModel` bundle the pipelines
consume. Each adapter is gated on its host dependency; the toy flax model
(models.make_toy_model) always works offline.

Model-type detection mirrors the reference's config-class sniffing
(model_wrappers.py:394-417); SUPPORTED_MODEL_TYPES matches :28-31.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ..utils.caching import EmbeddingCache, get_or_load_model
from .models import DiffusionModel

SUPPORTED_MODEL_TYPES = ["SD1", "SD2"]


def detect_model_type(model_config: Any) -> str:
    """Classify a model by its config class/attribute names."""
    name = type(model_config).__name__ if model_config is not None else ""
    text = name + str(getattr(model_config, "__dict__", ""))
    if "XL" in name or "xl" in text[:200]:
        return "SDXL"
    if "Flux" in name or "flux" in text[:200]:
        return "FLUX"
    ctx = getattr(model_config, "context_dim", None) or \
        getattr(model_config, "cross_attention_dim", None)
    if ctx == 1024:
        return "SD2"
    return "SD1"


def from_flax_diffusers(model_id: str = "runwayml/stable-diffusion-v1-5",
                        dtype=None) -> DiffusionModel:
    """Adapter for HuggingFace diffusers Flax pipelines (gated: requires the
    `diffusers` package and a local model cache — this image has no egress).

    Cached per model_id like the reference's pipeline cache
    (model_loader.py:12-19, :40-42).
    """
    def load():
        import jax.numpy as jnp
        from diffusers import FlaxAutoencoderKL, FlaxUNet2DConditionModel
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        dt = dtype or jnp.float32
        unet, unet_params = FlaxUNet2DConditionModel.from_pretrained(
            model_id, subfolder="unet", dtype=dt)
        vae, vae_params = FlaxAutoencoderKL.from_pretrained(
            model_id, subfolder="vae", dtype=dt)
        tokenizer = CLIPTokenizer.from_pretrained(model_id,
                                                  subfolder="tokenizer")
        text_model = FlaxCLIPTextModel.from_pretrained(
            model_id, subfolder="text_encoder", dtype=dt)

        def unet_apply(params, latents, t, context, **_):
            return unet.apply({"params": params}, latents, t, context).sample

        def encode(text: str):
            tok = tokenizer([text], padding="max_length",
                            max_length=tokenizer.model_max_length,
                            truncation=True, return_tensors="np")
            return text_model(**tok).last_hidden_state

        return DiffusionModel(
            unet_apply=unet_apply,
            unet_params=unet_params,
            vae_encode=lambda p, x: vae.apply(
                {"params": p}, x, method=vae.encode).latent_dist.mean,
            vae_decode=lambda p, z: vae.apply(
                {"params": p}, z, method=vae.decode).sample,
            vae_params=vae_params,
            text_encode=EmbeddingCache(encode),
            latent_channels=4,
            context_dim=getattr(unet.config, "cross_attention_dim", 768),
            sample_size=8 * getattr(unet.config, "sample_size", 64),
        )

    return get_or_load_model(("flax_diffusers", model_id, str(dtype)), load)


def from_torch_modules(unet, vae, tokenizer, text_encoder,
                       port_weights: bool = True,
                       unet_cfg=None, vae_cfg=None) -> DiffusionModel:
    """Adapter for torch (e.g. ComfyUI-loaded) modules.

    Preferred route (`port_weights=True`): PORT the torch weights into the
    native flax SD modules (`porting.port_torch_unet/vae` — understands both
    diffusers and LDM/ComfyUI key layouts). The returned bundle is then pure
    JAX: it runs on the TPU and is fully differentiable, so null-text
    optimization works — the TPU-native equivalent of the reference's
    functional_call gradient mode (model_wrappers.py:268-340).

    Fallback (port fails — e.g. a non-SD architecture): host-callback mode
    that runs the torch modules on CPU under no_grad, keeping the JAX
    pipeline contract for inference-only use. This is the analogue of the
    reference's ComfyUIModelWrapper (model_wrappers.py:352-485).
    """
    import torch
    import jax.numpy as jnp

    if port_weights:
        try:
            from .porting import build_sd_model, port_torch_unet, \
                port_torch_vae

            unet_params, unet_cfg = port_torch_unet(unet, cfg=unet_cfg)
            vae_params = None
            if vae is not None and hasattr(vae, "state_dict"):
                vae_params, vae_cfg = port_torch_vae(vae, cfg=vae_cfg)

            @torch.no_grad()
            def encode_text(text: str):
                tok = tokenizer(
                    [text], padding="max_length",
                    max_length=getattr(tokenizer, "model_max_length", 77),
                    truncation=True, return_tensors="pt")
                return jnp.asarray(text_encoder(tok.input_ids)[0].numpy())

            text_enc = None
            if tokenizer is not None and text_encoder is not None:
                # Prefer porting the CLIP tower into the native flax model
                # (TPU-resident encode; tokenization stays host-side via the
                # caller's tokenizer). Non-CLIP encoders keep the torch
                # host-callback.
                try:
                    from .clip_text import NativeCLIPTextEncoder
                    from .porting import port_torch_text_encoder

                    te_params, te_cfg = port_torch_text_encoder(text_encoder)
                    text_enc = NativeCLIPTextEncoder(tokenizer, te_params,
                                                     te_cfg)
                except Exception as te_err:
                    print(f"[comfystereo-tpu] text-encoder port unavailable "
                          f"({te_err}); encoding text via torch host call")
                    text_enc = EmbeddingCache(encode_text)
            return build_sd_model(unet_cfg, vae_cfg, unet_params, vae_params,
                                  text_encode=text_enc)
        except Exception as e:
            print(f"[comfystereo-tpu] weight port unavailable ({e}); "
                  "falling back to host-callback torch execution (no_grad)")

    @torch.no_grad()
    def unet_apply(_params, latents, t, context, **__):
        lt = torch.from_numpy(np.asarray(latents))
        tt = torch.tensor(int(np.asarray(t)))
        ctx = torch.from_numpy(np.asarray(context))
        out = unet(lt, tt, encoder_hidden_states=ctx)
        sample = out["sample"] if isinstance(out, dict) else out.sample
        return jnp.asarray(sample.numpy())

    @torch.no_grad()
    def vae_encode(_p, x):
        xt = torch.from_numpy(np.asarray(x))
        out = vae.encode(xt)
        dist = out["latent_dist"] if isinstance(out, dict) else out.latent_dist
        return jnp.asarray(dist.mean.numpy())

    @torch.no_grad()
    def vae_decode(_p, z):
        zt = torch.from_numpy(np.asarray(z))
        out = vae.decode(zt)
        sample = out["sample"] if isinstance(out, dict) else out.sample
        return jnp.asarray(sample.numpy())

    @torch.no_grad()
    def encode(text: str):
        tok = tokenizer([text], padding="max_length",
                        max_length=getattr(tokenizer, "model_max_length", 77),
                        truncation=True, return_tensors="pt")
        return jnp.asarray(text_encoder(tok.input_ids)[0].numpy())

    return DiffusionModel(
        unet_apply=unet_apply, unet_params=None,
        vae_encode=vae_encode, vae_decode=vae_decode, vae_params=None,
        text_encode=EmbeddingCache(encode),
        latent_channels=getattr(getattr(unet, "config", None), "in_channels",
                                4) or 4,
        context_dim=768,
    )
