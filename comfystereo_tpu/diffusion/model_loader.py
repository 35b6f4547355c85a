"""Hub checkpoint resolution — reference `model_loader.py:22-141` parity.

The reference loads SD pipelines by HuggingFace id or local path, caches them
per (id, scheduler), and retries the download once on failure
(`/root/reference/model_loader.py:67-85`). This module provides the same
surface for the native flax stack:

    id-or-path -> local diffusers-format directory -> native SDUNet/SDVAE/
    CLIP port (`porting.load_sd_from_diffusers_dir`)

Resolution order for an id that is not a directory:
1. the local HuggingFace cache (``snapshot_download(local_files_only=True)``)
   — instant when a cache exists, never touches the network;
2. a real download with one retry, mirroring the reference's
   try/except-redownload, gated off when offline mode is requested
   (``HF_HUB_OFFLINE``/``COMFYSTEREO_OFFLINE``) or ``huggingface_hub`` is
   missing.

On total failure a `ModelUnavailableError` is raised with the full attempt
trail — callers decide whether to fall back (the StereoDiffusion node falls
back to the offline toy model LOUDLY, printing the error trail).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

# Only the files the native port actually reads: fp32 safetensors for
# unet/vae/text_encoder, their configs, and the tokenizer vocab. This skips
# the ~1.7 GB of .bin duplicates and the safety checker the reference also
# pulls (it disables the checker after download anyway, model_loader.py:75).
_SD_ALLOW_PATTERNS = [
    "model_index.json",
    "unet/config.json",
    "unet/diffusion_pytorch_model.safetensors",
    "vae/config.json",
    "vae/diffusion_pytorch_model.safetensors",
    "text_encoder/config.json",
    "text_encoder/model.safetensors",
    "tokenizer/*",
]

# Keyed like the reference's cache: f"{model_id}:{scheduler_type}"
# (model_loader.py:40-42). The scheduler is functional here (schedulers.py)
# so one bundle serves both scheduler types, but the key shape is preserved
# for contract parity and so clear_model_cache() semantics match.
_model_cache: Dict[str, object] = {}


class ModelUnavailableError(RuntimeError):
    """Raised when a model id cannot be resolved locally or downloaded."""

    def __init__(self, model_id: str, attempts: List[str]):
        self.model_id = model_id
        self.attempts = attempts
        super().__init__(
            f"model '{model_id}' unavailable; attempts:\n  - "
            + "\n  - ".join(attempts))


def clear_model_cache() -> None:
    """Drop all cached model bundles (reference model_loader.py:17-20)."""
    _model_cache.clear()


def _offline() -> bool:
    return os.environ.get("HF_HUB_OFFLINE", "") not in ("", "0") or \
        os.environ.get("COMFYSTEREO_OFFLINE", "") not in ("", "0")


def resolve_model_dir(model_id_or_path: str,
                      allow_patterns: Optional[List[str]] = None) -> str:
    """Resolve an id-or-path to a local diffusers-format directory.

    Mirrors the reference's local-path check + download-with-retry
    (model_loader.py:62-85). Raises ModelUnavailableError with the attempt
    trail when nothing works.
    """
    attempts: List[str] = []
    if os.path.isdir(model_id_or_path):
        return model_id_or_path
    if os.sep in model_id_or_path and not model_id_or_path.count("/") == 1:
        # Looks like a filesystem path (ids are exactly "org/name"), but it
        # doesn't exist — don't hand it to the hub API.
        raise ModelUnavailableError(model_id_or_path,
                                    ["not a directory on disk"])
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - hub is in this image
        raise ModelUnavailableError(model_id_or_path,
                                    [f"huggingface_hub missing: {e}"])

    patterns = allow_patterns or _SD_ALLOW_PATTERNS
    # 1. Local cache, never touching the network.
    try:
        return snapshot_download(model_id_or_path, local_files_only=True,
                                 allow_patterns=patterns)
    except Exception as e:
        attempts.append(f"local cache: {type(e).__name__}: {e}")
    if _offline():
        attempts.append("download skipped: offline mode "
                        "(HF_HUB_OFFLINE/COMFYSTEREO_OFFLINE)")
        raise ModelUnavailableError(model_id_or_path, attempts)
    # 2. Download, one retry — the reference's except-redownload
    # (model_loader.py:78-85).
    for attempt in range(2):
        try:
            return snapshot_download(model_id_or_path,
                                     allow_patterns=patterns)
        except Exception as e:
            attempts.append(f"download try {attempt + 1}: "
                            f"{type(e).__name__}: {e}")
            if attempt == 0:
                print(f"Failed to load model: {e}")
                print("Attempting to download from HuggingFace...")
    raise ModelUnavailableError(model_id_or_path, attempts)


def load_sd_model(model_id_or_path: str = "runwayml/stable-diffusion-v1-5",
                  scheduler_type: str = "ddim", dtype=None):
    """Load (or retrieve cached) a native SD bundle by hub id or local path.

    Reference: load_sd_model (model_loader.py:22-93). dtype follows the
    reference's precision policy when unset: f32 for the ddim/gradient path,
    bf16 (the TPU analog of its fp16) for the euler/fast path
    (model_loader.py:66).
    """
    import jax.numpy as jnp

    cache_key = f"{model_id_or_path}:{scheduler_type}"
    if cache_key in _model_cache:
        return _model_cache[cache_key]
    if dtype is None:
        dtype = jnp.bfloat16 if scheduler_type == "euler" else jnp.float32

    from .porting import load_sd_from_diffusers_dir

    model_dir = resolve_model_dir(model_id_or_path)
    model = load_sd_from_diffusers_dir(model_dir, dtype=dtype)
    _model_cache[cache_key] = model
    return model


def load_inpainting_model(
        model_id_or_path: str = "runwayml/stable-diffusion-inpainting",
        dtype=None):
    """Load (or retrieve cached) a native SD inpainting bundle (9-ch UNet).

    Reference: load_inpainting_model (model_loader.py:96-141) — always the
    fast path there (fp16), so bf16 here by default.
    """
    import jax.numpy as jnp

    cache_key = f"{model_id_or_path}:inpaint"
    if cache_key in _model_cache:
        return _model_cache[cache_key]

    from .porting import load_sd_from_diffusers_dir

    model_dir = resolve_model_dir(model_id_or_path)
    model = load_sd_from_diffusers_dir(
        model_dir, dtype=dtype or jnp.bfloat16)
    _model_cache[cache_key] = model
    return model
