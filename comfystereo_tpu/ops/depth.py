"""Depth-to-disparity math: the single source of truth.

The reference implements this chain identically in ~10 places (CPU numba kernels,
torch GPU warps, the mesh rasterizer; e.g. stereoimage_generation.py:75-99,
:1587-1603, :1636-1637). Here it exists exactly once, pure and jittable:

    normalize (per-image min/max) -> subtract convergence_point
    -> signed power curve  offset = sign(d) * |d|^exponent
    -> pixel scale         px = offset * divergence_px + separation_px

Depth convention: white = near, black = far (reference :1434).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_depth(depth: jnp.ndarray, batch_axes: int = 1) -> jnp.ndarray:
    """Per-image min/max normalization of a depth map to [0, 1].

    `depth` is [..., H, W]; min/max are taken per leading index over (H, W).
    A flat depth map maps to all-zeros (reference :1591-1594).

    Note the reference's "/255 if max > 1" pre-scale (e.g. :79-82) is a no-op
    under min/max normalization, so it is intentionally absent here.
    """
    del batch_axes  # normalization is always over the trailing (H, W) axes
    d = depth.astype(jnp.float32)
    dmin = jnp.min(d, axis=(-2, -1), keepdims=True)
    dmax = jnp.max(d, axis=(-2, -1), keepdims=True)
    rng = dmax - dmin
    return jnp.where(rng > 1e-6, (d - dmin) / jnp.maximum(rng, 1e-6), 0.0)


def signed_power(x: jnp.ndarray, exponent: float) -> jnp.ndarray:
    """sign(x) * |x| ** exponent (reference :94-96)."""
    return jnp.sign(x) * jnp.power(jnp.abs(x), exponent)


def depth_offsets(normalized_depth: jnp.ndarray, convergence_point: float,
                  stereo_offset_exponent: float) -> jnp.ndarray:
    """Unit offset in [-1, 1]-ish from normalized depth (before pixel scaling)."""
    shifted = normalized_depth - convergence_point
    return signed_power(shifted, stereo_offset_exponent)


def pixel_offsets(depth: jnp.ndarray, divergence_px, separation_px,
                  stereo_offset_exponent: float, convergence_point: float,
                  *, prenormalized: bool = False) -> jnp.ndarray:
    """Full chain: depth map -> per-pixel horizontal offset in pixels.

    divergence_px / separation_px may be python floats or broadcastable arrays.
    """
    nd = depth if prenormalized else normalize_depth(depth)
    off = depth_offsets(nd, convergence_point, stereo_offset_exponent)
    return off * divergence_px + separation_px


def percent_to_px(divergence: float, separation: float, width: int):
    """Percent-of-width -> pixels (reference :1602-1603, :1063-1065)."""
    return (divergence / 100.0) * width, (separation / 100.0) * width


def rgb_to_gray_depth(depth_rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H, W] using the node's Rec.601 weights
    (GenerateStereo.py:135)."""
    if depth_rgb.ndim >= 3 and depth_rgb.shape[-1] == 3:
        w = jnp.asarray([0.2989, 0.5870, 0.1140], dtype=depth_rgb.dtype)
        return jnp.tensordot(depth_rgb, w, axes=([-1], [0]))
    if depth_rgb.ndim >= 3 and depth_rgb.shape[-1] == 1:
        return depth_rgb[..., 0]
    return depth_rgb
