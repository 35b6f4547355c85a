"""StereoDiffusion node — AI stereo generation via the JAX diffusion stack.

Contract parity with the reference StereoDiffusionNode
(stereodiffusion_nodes.py:78-167): image, depth_map, scale_factor,
direction (uni/bi), deblur, pipeline_mode (Standard (DDIM) / Fast
(Warp + Inpaint)), guidance_scale, num_inference_steps, seed, optional
null_text_optimization/denoise_strength/prompt. Outputs: stereo_pair,
left_image, right_image.

The model comes from `comfystereo_tpu.diffusion.models` (flax LatentUNet +
VAE + text encoder); a toy model is used when none is supplied so the node is
runnable offline. Per reference, the Standard path processes the first frame
only (:226-228) while the Fast path runs per-frame with seed+frame_idx
(:379-381).
"""
from __future__ import annotations

import numpy as np

from .. import diffusion

PIPELINE_MODES = ("Standard (DDIM)", "Fast (Warp + Inpaint)")
_DEFAULT_MODEL = None


def _to_numpy(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _resize_to(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear-resize [B,H,W,...] to [B,h,w,...] (device-side)."""
    if arr.shape[1] == h and arr.shape[2] == w:
        return np.asarray(arr)
    import jax
    import jax.numpy as jnp

    out_shape = (arr.shape[0], h, w) + tuple(arr.shape[3:])
    return np.asarray(jax.image.resize(jnp.asarray(arr), out_shape,
                                       "bilinear"))


def _default_model():
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        _DEFAULT_MODEL = diffusion.make_toy_model(image_size=64)
    return _DEFAULT_MODEL


def _resolve_model(model=None, clip=None, vae=None, model_id="",
                   pipeline_mode="Fast (Warp + Inpaint)"):
    """Model resolution order (reference stereodiffusion_nodes.py:229-252):

    1. an already-built DiffusionModel bundle (duck-typed: has unet_apply);
    2. connected ComfyUI/torch MODEL+CLIP+VAE via `from_torch_modules`;
    3. a model_id: flax-diffusers adapter, then a local diffusers-format
       directory ported into the native flax SD modules;
    4. the offline toy model.
    """
    if model is not None and hasattr(model, "unet_apply"):
        return model
    if model is not None:
        from ..diffusion.adapters import from_torch_modules

        unet = getattr(getattr(model, "model", model), "diffusion_model",
                       model)
        tokenizer = getattr(clip, "tokenizer", clip)
        text_enc = getattr(clip, "cond_stage_model", clip)
        return from_torch_modules(unet, vae, tokenizer, text_enc)
    if model_id:
        # Native hub/dir path first: id-or-path -> local diffusers dir
        # (cache hit or download-with-retry, reference model_loader.py:62-85)
        # -> native flax port. The flax-diffusers adapter is the fallback for
        # users who keep flax-format checkpoints around.
        from ..diffusion import model_loader

        scheduler_type = ("euler"
                          if pipeline_mode != "Standard (DDIM)" else "ddim")
        errors = []
        try:
            return model_loader.load_sd_model(model_id, scheduler_type)
        except model_loader.ModelUnavailableError as e:
            errors.extend(e.attempts)
        except Exception as e:
            errors.append(f"native port: {type(e).__name__}: {e}")
        try:
            from ..diffusion.adapters import from_flax_diffusers

            return from_flax_diffusers(model_id)
        except Exception as e:
            errors.append(f"flax-diffusers adapter: {type(e).__name__}: {e}")
        # LOUD fallback (VERDICT r4): print the full attempt trail so a
        # silently-wrong toy-model render can't masquerade as SD output.
        print("=" * 70)
        print(f"[comfystereo-tpu] WARNING: model '{model_id}' could not be "
              "loaded — FALLING BACK TO THE OFFLINE TOY MODEL.")
        print("[comfystereo-tpu] Outputs will NOT be Stable Diffusion "
              "quality. Attempt trail:")
        for err in errors:
            print(f"[comfystereo-tpu]   - {err}")
        print("=" * 70)
    return _default_model()


class StereoDiffusionNode:
    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "image": ("IMAGE",),
                "depth_map": ("IMAGE",),
                "scale_factor": ("FLOAT", {
                    "default": 5.0, "min": 1.0, "max": 20.0, "step": 0.5,
                    "tooltip": "Disparity strength of the generated stereo "
                               "effect."}),
                "direction": (["uni", "bi"], {
                    "default": "uni",
                    "tooltip": "Cross-view attention direction: uni = "
                               "one-way (left guides right), bi = "
                               "two-way."}),
                "deblur": ("BOOLEAN", {
                    "default": False,
                    "tooltip": "Inject noise into unfilled regions so the "
                               "model does not blur them."}),
                "pipeline_mode": (list(PIPELINE_MODES), {
                    "default": "Fast (Warp + Inpaint)",
                    "tooltip": "Standard: DDIM inversion — higher quality, "
                               "slow. Fast: depth-warp the image, then "
                               "AI-inpaint only the revealed gaps — quick, "
                               "compatible with turbo/LCM models."}),
                "guidance_scale": ("FLOAT", {
                    "default": 3.0, "min": 0.0, "max": 20.0, "step": 0.5,
                    "tooltip": "Classifier-free guidance scale. Standard "
                               "mode: 3-10. Turbo checkpoints: 0.0. LCM: "
                               "1.0-2.0."}),
                "num_inference_steps": ("INT", {
                    "default": 20, "min": 1, "max": 100, "step": 1,
                    "tooltip": "Denoising steps. Standard DDIM: 30-100 "
                               "(50 typical). Fast inpainting: 20-30. "
                               "Turbo/LCM: 1-8."}),
                "seed": ("INT", {
                    "default": 1337, "min": 0,
                    "max": 0xffffffffffffffff,
                    "control_after_generate": True,
                    "tooltip": "PRNG seed for reproducible outputs."}),
            },
            "optional": {
                "null_text_optimization": ("BOOLEAN", {
                    "default": True,
                    "tooltip": "Optimize the null-text embedding for a more "
                               "faithful reconstruction (Standard mode "
                               "only)."}),
                "denoise_strength": ("FLOAT", {
                    "default": 0.6, "min": 0.1, "max": 1.0, "step": 0.05,
                    "tooltip": "Noise added before denoising in Fast mode. "
                               "Lower preserves the original; higher gives "
                               "the model more freedom to fill gaps."}),
                "model": ("MODEL", {
                    "tooltip": "ComfyUI MODEL input. Fast mode: connect an "
                               "inpainting model (9-channel UNet). Standard "
                               "mode: any SD1/SD2 model."}),
                "clip": ("CLIP", {
                    "tooltip": "CLIP from Load Checkpoint."}),
                "vae": ("VAE", {
                    "tooltip": "VAE from Load Checkpoint."}),
                "model_id": ("STRING", {
                    "default": "runwayml/stable-diffusion-v1-5",
                    "tooltip": "Fallback HuggingFace model id used by "
                               "Standard mode when no ComfyUI model is "
                               "connected."}),
                "inpaint_model_id": ("STRING", {
                    "default": "runwayml/stable-diffusion-inpainting",
                    "tooltip": "Fallback inpainting model id used by Fast "
                               "mode when no ComfyUI model is connected."}),
                "prompt": ("STRING", {
                    "default": "", "multiline": True,
                    "tooltip": "Optional text prompt guiding the inpainting "
                               "(Fast mode); describing the image content "
                               "improves gap filling."}),
            },
        }

    RETURN_TYPES = ("IMAGE", "IMAGE", "IMAGE")
    RETURN_NAMES = ("stereo_pair", "left_image", "right_image")
    FUNCTION = "generate_stereo"
    CATEGORY = "image/stereo"

    def generate_stereo(self, image, depth_map, scale_factor=5.0,
                        direction="uni", deblur=False,
                        pipeline_mode="Fast (Warp + Inpaint)",
                        guidance_scale=3.0, num_inference_steps=20,
                        seed=1337, null_text_optimization=True,
                        denoise_strength=0.6, model=None, clip=None,
                        vae=None, model_id="", inpaint_model_id="",
                        prompt=""):
        import jax.numpy as jnp

        img = _to_numpy(image).astype(np.float32)
        dm = _to_numpy(depth_map).astype(np.float32)
        if img.ndim == 3:
            img = img[None]
        if dm.ndim == 4:
            dm = (0.2989 * dm[..., 0] + 0.5870 * dm[..., 1]
                  + 0.1140 * dm[..., 2]) if dm.shape[-1] == 3 else dm[..., 0]
        if dm.ndim == 2:
            dm = dm[None]
        # Fast mode prefers the inpainting checkpoint (reference :341-361).
        wanted_id = (inpaint_model_id
                     if pipeline_mode != "Standard (DDIM)" else model_id)
        dmodel = _resolve_model(model, clip, vae, wanted_id, pipeline_mode)

        # Resolution normalization (reference stereodiffusion_nodes.py:
        # 257-260 Standard, :426-430 Fast): diffusion always runs at the
        # model's native square sample size (512 for SD1.x); results are
        # resized back to the input size afterwards (:563-571). Without
        # this, inputs whose latent dims aren't divisible by
        # 2^n_downsamples crash the UNet's skip-concats, and conforming
        # non-native sizes run the model off its training resolution.
        orig_h, orig_w = img.shape[1], img.shape[2]
        s = int(getattr(dmodel, "sample_size", 512) or 512)
        img = _resize_to(img, s, s)
        dm = _resize_to(dm, s, s)

        lefts, rights = [], []
        if pipeline_mode == "Standard (DDIM)":
            # First frame only (reference :226-228).
            x = jnp.asarray(img[:1].transpose(0, 3, 1, 2)) * 2.0 - 1.0
            out = diffusion.text2stereo(
                dmodel, x, jnp.asarray(dm[:1]), prompt,
                scale_factor=scale_factor, direction=direction,
                deblur=deblur, guidance_scale=guidance_scale,
                num_inference_steps=num_inference_steps,
                null_text_optimization=null_text_optimization, seed=seed)
            lefts.append(np.asarray(out.left))
            rights.append(np.asarray(out.right))
        else:
            # All frames in one batched call (per-frame seeds, reference
            # :379-381); the inpaint loop is one scanned device program.
            out = diffusion.warp_inpaint(
                dmodel, jnp.asarray(img), jnp.asarray(dm), prompt,
                divergence=scale_factor,
                num_inference_steps=num_inference_steps,
                strength=denoise_strength, guidance_scale=guidance_scale,
                seed=seed + np.arange(img.shape[0], dtype=np.uint64))
            lefts.append(np.asarray(out.left))
            rights.append(np.asarray(out.right))

        # Resize back to the caller's resolution (reference :563-571 resizes
        # BOTH eyes from the 512-space results, left included).
        left = _resize_to(np.concatenate(lefts, axis=0), orig_h, orig_w)
        right = _resize_to(np.concatenate(rights, axis=0), orig_h, orig_w)
        pair = np.concatenate([left, right], axis=2)
        return pair, left, right


NODE_CLASS_MAPPINGS = {"StereoDiffusionNode": StereoDiffusionNode}
NODE_DISPLAY_NAME_MAPPINGS = {"StereoDiffusionNode": "Stereo Diffusion"}
