"""Denoising-step helpers (prompt-to-prompt style).

Functional equivalents of the reference's diffusion_utils.py:29-129:
CFG step, no-CFG step (turbo/LCM distilled models), and latent init. The
reference's `controller.step_callback` hook becomes an optional callable.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from . import schedulers
from .models import DiffusionModel


def diffusion_step(model: DiffusionModel, sched: schedulers.DiffusionSchedule,
                   latents: jnp.ndarray, context: jnp.ndarray, t,
                   guidance_scale: float,
                   controller: Optional[Callable] = None,
                   mode=None, stereo_active=False) -> jnp.ndarray:
    """One CFG denoising step. context = concat([uncond, cond]) along batch,
    each repeated to match latents' batch."""
    scaled = schedulers.scale_model_input(sched, latents, t)
    lat_in = jnp.concatenate([scaled] * 2, axis=0)
    kwargs = {}
    if mode is not None:
        kwargs = dict(mode=mode, stereo_active=stereo_active)
    eps = model.unet_apply(model.unet_params, lat_in, t, context, **kwargs)
    eps_u, eps_c = jnp.split(eps, 2, axis=0)
    eps = eps_u + guidance_scale * (eps_c - eps_u)
    out = schedulers.ddim_step(sched, eps, t, latents)
    return controller(out) if controller is not None else out


def diffusion_step_no_cfg(model: DiffusionModel,
                          sched: schedulers.DiffusionSchedule,
                          latents: jnp.ndarray, context: jnp.ndarray, t,
                          controller: Optional[Callable] = None,
                          mode=None, stereo_active=False) -> jnp.ndarray:
    """Single-pass step for distilled models where CFG is baked in."""
    scaled = schedulers.scale_model_input(sched, latents, t)
    kwargs = {}
    if mode is not None:
        kwargs = dict(mode=mode, stereo_active=stereo_active)
    eps = model.unet_apply(model.unet_params, scaled, t, context, **kwargs)
    out = schedulers.ddim_step(sched, eps, t, latents)
    return controller(out) if controller is not None else out


def init_latent(latent: Optional[jnp.ndarray], rng: jax.Array,
                latent_channels: int, height: int, width: int,
                batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Initialize or expand latents (reference init_latent, :103-129)."""
    if latent is None:
        latent = jax.random.normal(
            rng, (1, latent_channels, height // 8, width // 8))
    latents = jnp.broadcast_to(
        latent, (batch_size, latent_channels, height // 8, width // 8))
    return latent, latents
