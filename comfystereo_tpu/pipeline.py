"""End-to-end stereo conversion pipeline: blur -> warp -> fill -> pack.

Single jitted function covering both of the reference's duplicated pipelines
(create_stereoimages, stereoimage_generation.py:1422-1574, and
create_stereoimages_gpu, :1005-1128). Batched [B, H, W, C]; the whole video
chunk stays HBM-resident between stages (no host round-trips, unlike the
reference's GL path at :620-659).

Output contract (matches the Stereo Image node, GenerateStereo.py:75-76):
  stereo images (one per mode), blurred left/right depth maps, and the
  no-fill imperfection mask. For the CPU-parity fill techniques the mask is
  black-pixel detection on the packed result (GenerateStereo.py:355-361); for
  gpu_warp it is the warp's disocclusion gap mask (:171).

Known deviation (documented): the reference's tensor-input CPU path multiplies
an already-0-255 blurred depth map by 255 before casting to uint8
(stereoimage_generation.py:1512-1516), wrapping modulo 256 and banding the
depth outputs. We return the sane value (blurred depth / 255, clamped to 0-1).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .config import StereoConfig
from .ops import blur as blur_ops
from .ops import depth as depth_ops
from .ops import fills, pack, polylines, polylines_exact, warp


def apply_stereo_divergence(image_u8: jnp.ndarray, depth: jnp.ndarray,
                            divergence: float, separation: float,
                            stereo_offset_exponent: float,
                            fill_technique: str,
                            convergence_point: float = 0.5,
                            polylines_samples: int = 8,
                            polylines_exact_mode: bool = True) -> jnp.ndarray:
    """CPU-parity single-eye dispatcher (reference :1576-1620).

    image_u8: [B,H,W,C] float32 holding uint8 values; depth: [B,H,W] raw.
    divergence/separation are percentages of image width.
    """
    w = image_u8.shape[-2]
    nd = depth_ops.normalize_depth(depth) - convergence_point
    divergence_px = (divergence / 100.0) * w
    separation_px = (separation / 100.0) * w
    exp = stereo_offset_exponent

    if fill_technique in ("none", "naive", "naive_interpolating", "none_post"):
        derived, filled = fills.naive_scatter(image_u8, nd, divergence_px,
                                              separation_px, exp)
        if fill_technique == "naive":
            return fills.fill_naive(derived, filled, divergence_px)
        if fill_technique == "naive_interpolating":
            return fills.fill_naive_interpolating(derived, filled)
        if fill_technique == "none_post":
            return fills.post_fill_interp(derived, filled)
        return derived
    if fill_technique in ("inverse", "inverse_post"):
        derived, filled = fills.inverse_splat(image_u8, nd, divergence_px,
                                              separation_px, exp)
        if fill_technique == "inverse_post":
            return fills.post_fill_interp(derived, filled)
        return derived
    if fill_technique in ("hybrid_edge", "hybrid_edge_plus"):
        base, mask = fills.gaussian_splat(image_u8, nd, divergence_px,
                                          separation_px, exp)
        guidance = fills.rgb2gray(image_u8)
        filled_img = fills.edge_aware_gap_fill(base, mask, guidance)
        if fill_technique == "hybrid_edge_plus":
            if polylines_exact_mode:
                poly = polylines_exact.apply_polylines_exact(
                    image_u8, nd, divergence_px, separation_px, exp,
                    sharp=False)
            else:
                poly = polylines.apply_polylines(
                    image_u8, nd, divergence_px, separation_px, exp,
                    sharp=False, samples=polylines_samples)
            black = jnp.sum(filled_img, axis=-1) == 0
            return jnp.where(black[..., None], poly, filled_img)
        return filled_img
    if fill_technique in ("polylines_soft", "polylines_sharp"):
        sharp = fill_technique == "polylines_sharp"
        if polylines_exact_mode:
            # Exact sub-interval integration: bit-parity with the reference
            # scanline renderer (:1947-1991).
            return polylines_exact.apply_polylines_exact(
                image_u8, nd, divergence_px, separation_px, exp, sharp=sharp)
        return polylines.apply_polylines(
            image_u8, nd, divergence_px, separation_px, exp, sharp=sharp,
            samples=polylines_samples)
    return image_u8  # reference fallback (:1620)


def _blurred_eye_depths(depth255, cfg: StereoConfig):
    if cfg.depth_map_blur and cfg.depth_blur_strength > 0:
        return blur_ops.directional_motion_blur(
            depth255, cfg.depth_blur_strength, cfg.depth_blur_edge_threshold,
            cfg.depth_blur_strength, cfg.depth_blur_falloff,
            cfg.depth_blur_vert_smooth)
    return depth255, depth255


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_pipeline(image: jnp.ndarray, depth: jnp.ndarray,
                    cfg: StereoConfig) -> Dict[str, jnp.ndarray]:
    """Full depth->stereo conversion for a batch of frames.

    image: [B, H, W, C] float32 in [0, 1]
    depth: [B, H, W] float32 (grayscale; any scale — 0-1 or 0-255)

    Returns dict:
      stereo:      tuple of packed outputs, one per cfg.modes, float 0-1
      left_depth:  [B, H, W] blurred left-eye depth, 0-1
      right_depth: [B, H, W]
      mask:        no-fill imperfection mask (float 0/1); [B,H,W] for
                   gpu_warp, packed shape for CPU-parity fills
    """
    image = image.astype(jnp.float32)
    depth = depth.astype(jnp.float32)
    # The node's convention: scale 0-1 depth to 0-255 for blur compatibility
    # (reference :1045-1046, :1474-1476).
    depth255 = jnp.where(jnp.max(depth) <= 1.0, depth * 255.0, depth)

    left_d, right_d = _blurred_eye_depths(depth255, cfg)
    left_div, right_div = cfg.eye_divergences()
    w = image.shape[-2]
    sep_px = (cfg.separation / 100.0) * w

    if cfg.fill_technique == "gpu_warp":
        if cfg.color_dtype == "bfloat16":
            image = image.astype(jnp.bfloat16)
        left_div_px = (left_div / 100.0) * w
        right_div_px = (right_div / 100.0) * w
        zero_mask = jnp.zeros(depth.shape, dtype=bool)
        if left_div < 0.001:
            left_eye, left_mask = image, zero_mask
        else:
            left_eye, left_mask = warp.forward_warp(
                image, left_d, +left_div_px, -sep_px,
                cfg.stereo_offset_exponent, cfg.convergence_point,
                cfg.gradient_threshold, cfg.max_stretch)
        if right_div < 0.001:
            right_eye, right_mask = image, zero_mask
        else:
            right_eye, right_mask = warp.forward_warp(
                image, right_d, -right_div_px, +sep_px,
                cfg.stereo_offset_exponent, cfg.convergence_point,
                cfg.gradient_threshold, cfg.max_stretch)
        mask = (left_mask | right_mask).astype(jnp.float32)
        outs = tuple(pack.pack_mode(left_eye, right_eye, m) for m in cfg.modes)
        outs = tuple(jnp.clip(o, 0.0, 1.0) for o in outs)
    else:
        img_u8 = jnp.trunc(jnp.clip(image * 255.0, 0.0, 255.0))
        if left_div < 0.001:
            left_eye = img_u8
        else:
            left_eye = apply_stereo_divergence(
                img_u8, left_d, +left_div, -cfg.separation,
                cfg.stereo_offset_exponent, cfg.fill_technique,
                cfg.convergence_point, cfg.polylines_samples,
                cfg.polylines_exact)
        if right_div < 0.001:
            right_eye = img_u8
        else:
            right_eye = apply_stereo_divergence(
                img_u8, right_d, -right_div, cfg.separation,
                cfg.stereo_offset_exponent, cfg.fill_technique,
                cfg.convergence_point, cfg.polylines_samples,
                cfg.polylines_exact)
        outs_u8 = tuple(pack.pack_mode(left_eye, right_eye, m) for m in cfg.modes)
        # Black-pixel mask on the first packed output (GenerateStereo.py:355-361).
        mask = (jnp.sum(outs_u8[0], axis=-1) == 0).astype(jnp.float32)
        outs = tuple(o / 255.0 for o in outs_u8)

    left_depth_out = jnp.clip(left_d / 255.0, 0.0, 1.0)
    right_depth_out = jnp.clip(right_d / 255.0, 0.0, 1.0)
    return {
        "stereo": outs,
        "left_depth": left_depth_out,
        "right_depth": right_depth_out,
        "mask": mask,
    }
