"""DDIM inversion with null-text optimization, in JAX.

Reference spec: NullInversion (inversion.py:29-255) — VAE-encode the image
(x0.18215), run the forward DDIM loop with the conditional embeddings, then
per-timestep optimize the unconditional embedding with Adam
(lr 1e-2*(1-i/100), <= num_inner_steps inner iterations, early stop at
epsilon + i*2e-5) so CFG reconstruction matches the inversion trajectory.

TPU-native design: the DDIM loop is a lax.scan; each timestep's inner Adam
loop is a jitted lax.while_loop with optax (the reference rebuilds a torch
Adam per step and backprops through a cloned-parameter functional_call,
model_wrappers.py:268-340 — here grads come for free from jax.grad through
the pure unet_apply).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import schedulers
from .models import DiffusionModel, LATENT_SCALE


class InversionResult(NamedTuple):
    latents: jnp.ndarray            # [T+1, B, C, H, W] DDIM trajectory
    uncond_embeddings: jnp.ndarray  # [T, 1, L, D] per-step optimized embeds
    image_rec: jnp.ndarray          # VAE roundtrip reconstruction (NCHW)


def image_to_latent(model: DiffusionModel, image_nchw: jnp.ndarray
                    ) -> jnp.ndarray:
    """[-1, 1] NCHW image -> scaled latents (reference :113-133)."""
    return model.vae_encode(model.vae_params, image_nchw) * LATENT_SCALE


def latent_to_image(model: DiffusionModel, latents: jnp.ndarray) -> jnp.ndarray:
    """Scaled latents -> [-1, 1] NCHW image (reference :95-103)."""
    return model.vae_decode(model.vae_params, latents / LATENT_SCALE)


def ddim_invert_loop(model: DiffusionModel, sched: schedulers.DiffusionSchedule,
                     latent: jnp.ndarray, cond_embeddings: jnp.ndarray
                     ) -> jnp.ndarray:
    """Forward DDIM loop (reference ddim_loop, :161-171): returns the whole
    trajectory [T+1, ...] with index 0 = the clean latent."""
    timesteps = jnp.asarray(sched.timesteps[::-1].copy())  # ascending

    def step(lat, t):
        eps = model.unet_apply(model.unet_params, lat, t, cond_embeddings)
        nxt = schedulers.ddim_next_step(sched, eps, t, lat)
        return nxt, nxt

    _, traj = jax.lax.scan(step, latent, timesteps)
    return jnp.concatenate([latent[None], traj], axis=0)


def null_text_optimize_step(model: DiffusionModel,
                            sched: schedulers.DiffusionSchedule,
                            latent_cur, latent_prev, t, uncond, cond,
                            guidance_scale: float, num_inner_steps: int,
                            lr: float, stop_eps: float):
    """One timestep of null-text optimization; returns (uncond', latent')."""
    eps_cond = model.unet_apply(model.unet_params, latent_cur, t, cond)

    def loss_fn(u):
        eps_u = model.unet_apply(model.unet_params, latent_cur, t, u)
        eps = eps_u + guidance_scale * (eps_cond - eps_u)
        prev_rec = schedulers.ddim_step(sched, eps, t, latent_cur)
        return jnp.mean((prev_rec - latent_prev) ** 2)

    opt = optax.adam(lr)

    def cond_fn(state):
        _, _, j, loss = state
        return (j < num_inner_steps) & (loss >= stop_eps)

    def body_fn(state):
        u, opt_state, j, _ = state
        loss, grads = jax.value_and_grad(loss_fn)(u)
        updates, opt_state = opt.update(grads, opt_state, u)
        u = optax.apply_updates(u, updates)
        return u, opt_state, j + 1, loss

    init = (uncond, opt.init(uncond), jnp.int32(0), jnp.float32(1e9))
    uncond_opt, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)

    # Advance the latent with the optimized embedding under CFG.
    eps_u = model.unet_apply(model.unet_params, latent_cur, t, uncond_opt)
    eps = eps_u + guidance_scale * (eps_cond - eps_u)
    latent_next = schedulers.ddim_step(sched, eps, t, latent_cur)
    return uncond_opt, latent_next


def invert(model: DiffusionModel, image_nchw: jnp.ndarray, prompt: str,
           num_ddim_steps: int = 50, guidance_scale: float = 7.5,
           num_inner_steps: int = 10, early_stop_epsilon: float = 1e-5,
           null_text_optimization: bool = True) -> InversionResult:
    """Full inversion (reference invert, :214-255)."""
    sched = schedulers.make_ddim(num_ddim_steps)
    cond = model.text_encode(prompt)
    uncond = model.text_encode("")

    latent = image_to_latent(model, image_nchw)
    image_rec = latent_to_image(model, latent)
    traj = ddim_invert_loop(model, sched, latent, cond)

    if not null_text_optimization:
        unconds = jnp.stack([uncond] * num_ddim_steps, axis=0)
        return InversionResult(traj, unconds, image_rec)

    # model/sched are closed over (they hold callables, not traceable leaves);
    # lr and stop_eps are traced so one compiled step serves all timesteps.
    # The jitted step is cached ON the model bundle keyed by the closed-over
    # statics, so repeated invert() calls with the same model reuse the
    # trace instead of recompiling (SD-scale fwd+bwd compiles are minutes).
    cache = getattr(model, "_invert_step_cache", None)
    if cache is None:
        cache = {}
        model._invert_step_cache = cache
    key = (num_ddim_steps, float(guidance_scale), int(num_inner_steps))
    step_fn = cache.get(key)
    if step_fn is None:
        @jax.jit
        def step_fn(latent_cur, latent_prev, t, u, cond, lr, stop_eps):
            return null_text_optimize_step(
                model, sched, latent_cur, latent_prev, t, u, cond,
                guidance_scale, num_inner_steps, lr, stop_eps)
        cache[key] = step_fn

    latent_cur = traj[-1]
    unconds = []
    u = uncond
    for i in range(num_ddim_steps):
        t = sched.timesteps[i]
        latent_prev = traj[num_ddim_steps - i - 1]
        lr = jnp.float32(1e-2 * (1.0 - i / 100.0))
        stop = jnp.float32(early_stop_epsilon + i * 2e-5)
        u, latent_cur = step_fn(latent_cur, latent_prev, jnp.int32(t), u,
                                cond, lr, stop)
        unconds.append(u)
    return InversionResult(traj, jnp.stack(unconds, axis=0), image_rec)
