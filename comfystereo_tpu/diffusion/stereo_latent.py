"""Latent-space stereo shift (StereoDiffusion method).

Reference spec: stereo_shift_torch (stereo_utils.py:15-88) — per-pixel
depth-scaled scatter in latent space with swipe-order z-ordering, returning
[2B, C, H, W] (left view, shifted right view).

TPU-native design: the reference's triple python loop becomes the same
deterministic scatter-min/max trick as ops/fills.naive_scatter — the swipe
order is equivalent to "min source column wins" for positive shift and "max"
for negative (offset here is monotone in depth by construction: depth^exp is
non-negative increasing).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import fills


def _norm_depth01(depth: jnp.ndarray) -> jnp.ndarray:
    dmin = jnp.min(depth, axis=(-2, -1), keepdims=True)
    dmax = jnp.max(depth, axis=(-2, -1), keepdims=True)
    rng = dmax - dmin
    return jnp.where(rng > 1e-7, (depth - dmin) / jnp.maximum(rng, 1e-7), 0.0)


def _shift_one(images: jnp.ndarray, norm_depth: jnp.ndarray,
               scale_factor: float, exponent: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift [B, C, H, W] by depth^exp * scale, swipe-order z-ordered.

    Returns (shifted [B,C,H,W], filled mask [B,H,W]).
    """
    b, c, h, w = images.shape
    scale_px = (scale_factor / 100.0) * w
    cols = jnp.arange(w, dtype=jnp.int32)
    dv = jnp.power(norm_depth, exponent)
    col_d = cols + jnp.trunc(dv * scale_px).astype(jnp.int32)
    valid = (col_d >= 0) & (col_d < w)
    src_cols = jnp.broadcast_to(cols, norm_depth.shape)
    if scale_px < 0:
        winner = fills.scatter_max_w(col_d, src_cols, valid, w, jnp.int32(-1))
        hit = winner >= 0
    else:
        winner = fills.scatter_min_w(col_d, src_cols, valid, w, jnp.int32(2 ** 30))
        hit = winner < 2 ** 30
    wc = jnp.clip(winner, 0, w - 1)
    # gather winner columns for every channel: [B, H, W] idx over W axis
    gathered = jnp.take_along_axis(
        images, wc[:, None, :, :].astype(jnp.int32), axis=-1)
    shifted = jnp.where(hit[:, None, :, :], gathered, 0.0)
    return shifted, hit


def stereo_shift(latents: jnp.ndarray, depth: jnp.ndarray,
                 scale_factor: float = 8.0, shift_both: bool = False,
                 stereo_offset_exponent: float = 1.0) -> jnp.ndarray:
    """[B, C, H, W] latents + [B, H, W] depth -> [2B, C, H, W] (left, right).

    Right view shifts by -scale (reference :84-86); with shift_both the
    divergence is split 50/50 across both eyes (:75-82).
    """
    nd = _norm_depth01(depth.astype(jnp.float32))
    if shift_both:
        left, _ = _shift_one(latents, nd, +0.5 * scale_factor,
                             stereo_offset_exponent)
        right, _ = _shift_one(latents, nd, -0.5 * scale_factor,
                              stereo_offset_exponent)
    else:
        left = latents
        right, _ = _shift_one(latents, nd, -1.0 * scale_factor,
                              stereo_offset_exponent)
    return jnp.concatenate([left, right], axis=0)


def stereo_shift_with_mask(latents: jnp.ndarray, depth: jnp.ndarray,
                           scale_factor: float = 8.0,
                           stereo_offset_exponent: float = 1.0):
    """Right-view shift plus its coverage mask (used by the DDIM stereo loop's
    masked re-shift and noise-deblur, stereodiffusion_nodes.py:649-667)."""
    nd = _norm_depth01(depth.astype(jnp.float32))
    right, hit = _shift_one(latents, nd, -1.0 * scale_factor,
                            stereo_offset_exponent)
    return right, hit
