"""Backward (inverse-mapping) warp family and disocclusion tooling.

JAX equivalents of the reference's grid_sample-based warps and their helper
ops (stereoimage_generation.py):

  * backward_warp            <- apply_stereo_divergence_gpu (:52-119)
  * backward_warp_padded     <- apply_stereo_divergence_gpu_with_fill (:923-1002)
  * warp_and_fill            <- warp_and_fill_gpu (:122-274), edge-stretch fill
  * forward_gap_mask         <- compute_forward_mask_gpu (:692-757)
  * detect_disocclusions     <- detect_disocclusions_gpu (:807-857)
  * interpolate_fill         <- interpolate_fill_gpu (:860-920)

The warp grid is 1-D (horizontal only), so grid_sample reduces to a bilinear
gather along W; nearest-valid searches are prefix scans. All ops are batched
[B, ...] and jittable.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import depth as depth_ops
from . import scan


def _sample_w(image_nhwc, src_x, padding: str = "border"):
    """Bilinear sample along W. padding: border | zeros | reflection."""
    b, h, w, c = image_nhwc.shape
    if padding == "reflection":
        # reflect around [0, w-1] (align_corners=True convention)
        period = 2.0 * (w - 1)
        x = jnp.mod(src_x, period)
        x = jnp.where(x > (w - 1), period - x, x)
    else:
        x = jnp.clip(src_x, 0.0, w - 1.0)
    x0 = jnp.floor(x)
    fr = (x - x0)[..., None]
    i0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    i1 = jnp.minimum(i0 + 1, w - 1)
    out = (jnp.take_along_axis(image_nhwc, i0[..., None], axis=2) * (1 - fr)
           + jnp.take_along_axis(image_nhwc, i1[..., None], axis=2) * fr)
    if padding == "zeros":
        inb = ((src_x >= 0) & (src_x <= w - 1))[..., None]
        out = jnp.where(inb, out, 0.0)
    return out


def _offsets(depth, divergence_px, separation_px, exponent, convergence):
    nd = depth_ops.normalize_depth(depth)
    return nd, depth_ops.pixel_offsets(nd, divergence_px, separation_px,
                                       exponent, convergence,
                                       prenormalized=True)


def backward_warp(image_nhwc: jnp.ndarray, depth: jnp.ndarray,
                  divergence_px: float, separation_px: float = 0.0,
                  stereo_offset_exponent: float = 1.0,
                  convergence_point: float = 0.5) -> jnp.ndarray:
    """Inverse-map stereo shift: out[x] = img[x - offset(x)] (spec :52-119)."""
    _, off = _offsets(depth, divergence_px, separation_px,
                      stereo_offset_exponent, convergence_point)
    w = image_nhwc.shape[2]
    src = jnp.arange(w, dtype=jnp.float32) - off
    return _sample_w(image_nhwc, src, "border")


def backward_warp_padded(image_nhwc, depth, divergence_px,
                         separation_px=0.0, stereo_offset_exponent=1.0,
                         convergence_point=0.5, fill_mode="border"
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward warp with configurable padding plus in-bounds validity mask
    (spec :923-1002)."""
    _, off = _offsets(depth, divergence_px, separation_px,
                      stereo_offset_exponent, convergence_point)
    w = image_nhwc.shape[2]
    src = jnp.arange(w, dtype=jnp.float32) - off
    warped = _sample_w(image_nhwc, src, fill_mode)
    valid = (src >= 0) & (src <= w - 1)
    return warped, valid


def forward_gap_mask(depth: jnp.ndarray, divergence_px: float,
                     separation_px: float = 0.0,
                     stereo_offset_exponent: float = 1.0,
                     convergence_point: float = 0.5,
                     dilate_threshold: float = 1.5) -> jnp.ndarray:
    """Pixel-precise forward-mapping gap mask: destinations that receive no
    source pixel, dilated one pixel at depth edges (spec :692-757)."""
    _, off = _offsets(depth, divergence_px, separation_px,
                      stereo_offset_exponent, convergence_point)
    b, h, w = off.shape
    cols = jnp.arange(w, dtype=jnp.int32)
    dest = (cols.astype(jnp.float32) + off).astype(jnp.int32)
    valid = (dest >= 0) & (dest < w)
    from . import fills
    hits = fills.scatter_add_w(dest, valid.astype(jnp.float32), valid, w)
    gap = hits < 0.5

    grad = jnp.abs(off[..., 1:] - off[..., :-1]) > dilate_threshold
    edge = jnp.zeros_like(gap)
    edge = edge.at[..., :-1].set(grad)
    edge = edge.at[..., 1:].set(edge[..., 1:] | grad)
    dil = gap
    dil = dil.at[..., 1:].set(dil[..., 1:] | (gap[..., :-1] & edge[..., 1:]))
    dil = dil.at[..., :-1].set(dil[..., :-1] | (gap[..., 1:] & edge[..., :-1]))
    return dil


def detect_disocclusions(depth01: jnp.ndarray, src_x: jnp.ndarray,
                         threshold: float = 0.02) -> jnp.ndarray:
    """Two-signal disocclusion detector (spec :807-857):
    1) nearest-warped depth exceeds output depth by `threshold`;
    2) warp-field stretch > 3x the pixel step."""
    w = depth01.shape[-1]
    i_near = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, w - 1)
    warped_depth = jnp.take_along_axis(depth01, i_near, axis=-1)
    depth_sig = (warped_depth - depth01) > threshold

    grad = jnp.abs(src_x[..., 1:] - src_x[..., :-1])
    grad = jnp.concatenate([grad, grad[..., -1:]], axis=-1)
    stretch_sig = grad > 3.0
    return depth_sig | stretch_sig


def interpolate_fill(image_nhwc: jnp.ndarray, mask: jnp.ndarray
                     ) -> jnp.ndarray:
    """Fill masked pixels by linear interpolation between the nearest valid
    border pixels in the row (spec :860-920)."""
    b, h, w, c = image_nhwc.shape
    valid = ~mask
    chans = jnp.moveaxis(image_nhwc, -1, 0)
    valid_c = jnp.broadcast_to(valid[None], chans.shape)
    (lv,), has_l = scan.forward_fill((chans,), valid_c)
    (rv,), has_r = scan.backward_fill((chans,), valid_c)
    has_l, has_r = has_l[0], has_r[0]
    cols = jnp.arange(w, dtype=jnp.float32)
    ln = scan.nearest_true_left(valid)
    rn = scan.nearest_true_right(valid)
    ld = cols - ln.astype(jnp.float32)
    rd = rn.astype(jnp.float32) - cols
    t = ld / jnp.maximum(ld + rd, 1.0)
    t = jnp.where(~has_l, 1.0, t)
    t = jnp.where(~has_r, 0.0, t)
    fill = lv * (1 - t) + rv * t
    return jnp.moveaxis(jnp.where(mask[None], fill, chans), 0, -1)


def warp_and_fill(image_nhwc: jnp.ndarray, depth: jnp.ndarray,
                  divergence_px: float, separation_px: float = 0.0,
                  stereo_offset_exponent: float = 1.0,
                  convergence_point: float = 0.5,
                  stretch_pixels: int = 3
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp with built-in edge-stretch fill (spec :122-274): gap pixels sample
    from smoothly interpolated source positions that stretch a few valid
    border pixels across each half-gap, blended with a smoothstep."""
    _, off = _offsets(depth, divergence_px, separation_px,
                      stereo_offset_exponent, convergence_point)
    w = image_nhwc.shape[2]
    cols = jnp.arange(w, dtype=jnp.float32)
    gap = forward_gap_mask(depth, divergence_px, separation_px,
                           stereo_offset_exponent, convergence_point)
    src = cols - off

    valid = ~gap
    ln = scan.nearest_true_left(valid)
    rn = scan.nearest_true_right(valid)
    has_l = ln >= 0
    has_r = rn < w
    ld = cols - ln.astype(jnp.float32)
    rd = rn.astype(jnp.float32) - cols
    total = jnp.maximum(ld + rd, 1.0)
    half_gap = total * 0.5

    ln_c = jnp.clip(ln, 0, w - 1)
    rn_c = jnp.clip(rn, 0, w - 1)
    l_base = jnp.take_along_axis(src, ln_c, axis=-1)
    l_deep = jnp.take_along_axis(src, jnp.clip(ln_c - stretch_pixels, 0, w - 1),
                                 axis=-1)
    lt = jnp.clip(ld / half_gap, 0.0, 1.0)
    l_stretch = l_base * (1 - lt) + l_deep * lt
    r_base = jnp.take_along_axis(src, rn_c, axis=-1)
    r_deep = jnp.take_along_axis(src, jnp.clip(rn_c + stretch_pixels, 0, w - 1),
                                 axis=-1)
    rt = jnp.clip(rd / half_gap, 0.0, 1.0)
    r_stretch = r_base * (1 - rt) + r_deep * rt

    t = ld / total
    t = jnp.where(~has_l, 1.0, t)
    t = jnp.where(~has_r, 0.0, t)
    blend = jnp.clip((t - 0.35) / 0.3, 0.0, 1.0)
    blend = blend * blend * (3.0 - 2.0 * blend)          # smoothstep
    gap_src = l_stretch * (1 - blend) + r_stretch * blend
    src = jnp.where(gap, gap_src, src)
    return _sample_w(image_nhwc, src, "border"), gap
