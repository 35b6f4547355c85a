"""Forward stereo warp with z-buffer semantics — the flagship TPU kernel path.

Portable spec: `forward_warp_gpu` in the reference
(stereoimage_generation.py:277-450): forward-map each source pixel by its
depth-derived offset, connect adjacent pixels whose offsets differ by less than
`gradient_threshold` into segments, z-buffer overlapping segments (nearer depth
wins), mark disocclusion gaps, and fill gaps by interpolating source positions
between the gap borders with a sqrt bias toward the background side. The
reference's ModernGL mesh rasterizer (:453-689) implements the same semantics
with OpenGL triangles; this module is the TPU-native equivalent of both.

TPU-native design (measured on v5e):
1.  NO scatter: the z-buffer scatter is INVERTED into a per-column windowed
    scan. Bounded displacement — a segment covering column c satisfies
    i = c - interp_offset with interp_offset inside the row's offset range —
    means candidates live in a window d = i - c of [-(D+2), D+2], and the
    ACTUAL trip count shrinks to the block's measured offset range
    (floor(-off_max)-1 .. ceil(-off_min)), a dynamic-bound fori_loop.
    Scanning candidates in ascending index order with the reference's strict
    `z > best + 1e-6` replacement matches the sequential-scan oracle's
    winners, ties, coverage, and gap mask exactly — including backward folds
    and either divergence sign (round-1's first-crossing deviation removed).
    Tie caveat: the reference's torch implementation iterates k-major with a
    vectorized scatter_ whose duplicate-index order is UNDEFINED, so ties
    within its 1e-6 epsilon (and stale out-of-range scatters to clamped
    border columns) have no deterministic reference answer. The ascending-
    source-index rule used here (and by the oracle) is the chosen
    deterministic canonicalization of that order-dependent behavior.
2.  The window walk uses one dynamic roll to position the packed segment
    arrays, then a static 1-lane roll per iteration — no gathers in the
    z-max loop.
3.  NO scalarized gathers elsewhere: XLA's gather is ~24 ms per 1080p plane
    on TPU, so bilinear taps go through the Pallas vreg-gather
    (`pallas.bounded_take_along_w`, ~0.26 ms) and gather-at-nearest-valid-
    index is re-expressed as an associative carry scan
    (scan.forward_fill / backward_fill).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from . import depth as depth_ops
from . import scan
from ..pallas import bounded_take_along_w

_NEG_INF = -1e30


def _bilinear_sample_w(image: jnp.ndarray, src_x: jnp.ndarray,
                       max_disp: int) -> jnp.ndarray:
    """Bilinear sample along W at per-pixel source x (border clamp).

    image: [B, H, W, C]; src_x: [B, H, W] pixel coords (align_corners=True
    convention, like the reference's grid_sample). |src_x - col| <= max_disp.
    """
    b, h, w, c = image.shape
    x = jnp.clip(src_x, 0.0, w - 1.0)
    x0 = jnp.floor(x)
    fr = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w - 1)
    # Channel-major layout so the gather runs along the last axis.
    img_cw = jnp.moveaxis(image, -1, -3)                  # [B, C, H, W]
    i0e = jnp.broadcast_to(i0[:, None], (b, c, h, w))
    i1e = jnp.broadcast_to(i1[:, None], (b, c, h, w))
    g0 = bounded_take_along_w(img_cw, i0e, max_disp).astype(jnp.float32)
    g1 = bounded_take_along_w(img_cw, i1e, max_disp).astype(jnp.float32)
    out = g0 * (1.0 - fr[:, None]) + g1 * fr[:, None]
    return jnp.moveaxis(out, -3, -1).astype(image.dtype)


def _forward_warp_monotone(image, norm_depth, offset, gradient_threshold,
                           max_stretch, max_disp: int):
    """Exact z-buffer forward warp, any offset sign/shape.

    Reproduces the reference scatter loop (:365-391) bit-for-bit by
    INVERTING it: for every output column c, scan the candidate segments
    i = c + d over the bounded displacement window d in [-(D+2), D+2]
    in ascending-i order, keep the segment with max interpolated depth
    (strict 1e-6 improvement, so ties resolve to the lowest index exactly
    like the sequential scatter). Coverage (and hence the gap mask) is the
    exact union of segment spans — folds behind disconnected jumps render
    correctly (round-1 deviation removed).

    image: [B, H, W, C]; norm_depth, offset: [B, H, W]; max_disp: static
    bound on |offset| in pixels (+ margin).
    Returns (warped [B,H,W,C], gap_mask [B,H,W] bool).
    """
    b, h, w = offset.shape
    cols = jnp.arange(w, dtype=jnp.float32)
    colsi = jnp.arange(w, dtype=jnp.int32)
    dest = cols + offset                                     # [B,H,W]

    # Per-segment quantities, padded to length w (segment w-1 is invalid).
    def segpad(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])

    diff = jnp.abs(offset[..., 1:] - offset[..., :-1])
    conn = segpad((diff < gradient_threshold).astype(jnp.float32))
    dl = segpad(dest[..., :-1])
    dr = segpad(dest[..., 1:])
    width = dr - dl
    # Same f32 expression forms as the scatter loop (division, two-sided
    # lerp) so winners match the oracle bit-for-bit, not just by tolerance.
    safe_width = jnp.where(jnp.abs(width) < 1e-4, 1.0, width)
    zl = segpad(norm_depth[..., :-1])
    zr = segpad(norm_depth[..., 1:])
    mstart = jnp.floor(jnp.minimum(dl, dr))

    # Dynamic displacement window from the actual offset range:
    # interp_offset(c) = c - src in [min(offset), max(offset)], so the
    # candidate index d = i - c lies in [-off_max - 1, -off_min].
    r_static = max_disp + 2
    off_min = jnp.min(offset)
    off_max = jnp.max(offset)
    d_lo = jnp.maximum(jnp.floor(-off_max - 1.0).astype(jnp.int32),
                       -r_static)
    d_hi = jnp.minimum(jnp.ceil(-off_min).astype(jnp.int32), r_static)

    seg = jnp.stack([conn, dl, safe_width, zl, zr, mstart], axis=0)
    seg0 = jnp.roll(seg, -d_lo, axis=-1)   # position c holds segment c+d_lo

    def body(t, carry):
        seg_t, zbest, src = carry
        d = d_lo + t
        conn_t, dl_t, sw_t, zl_t, zr_t, ms_t = (seg_t[j] for j in range(6))
        i = colsi + d
        frac = (cols - dl_t) / sw_t
        zz = zl_t * (1.0 - frac) + zr_t * frac
        valid = ((conn_t > 0.5) & (i >= 0) & (i <= w - 2)
                 & (frac >= 0.0) & (frac < 1.0)
                 & (cols - ms_t < max_stretch))
        better = valid & (zz > zbest + 1e-6)
        zbest = jnp.where(better, zz, zbest)
        src = jnp.where(better, i.astype(jnp.float32) + frac, src)
        return jnp.roll(seg_t, -1, axis=-1), zbest, src

    init = (seg0, jnp.full((b, h, w), -1.0), jnp.full((b, h, w), -1.0))
    _, z, src = jax.lax.fori_loop(0, d_hi - d_lo + 1, body, init)

    filled = src >= 0.0
    gap = ~filled

    # --- Disocclusion fill (reference :393-438): interpolate source positions
    # between gap borders with sqrt bias toward the background (lower z) side.
    # Quirk preserved for bit parity: the reference's "right nearest" is a
    # flipped cummax over DECREASING column indices (:399-404), which
    # resolves to the row's RIGHTMOST filled column, not the nearest one.
    (left_src, left_z), has_l = scan.forward_fill((src, z), filled)
    ln = scan.nearest_true_left(filled)                      # -1 if none

    rn = jnp.max(jnp.where(filled, jnp.broadcast_to(colsi, (b, h, w)), -1),
                 axis=-1, keepdims=True)                     # rightmost filled
    rn_c = jnp.clip(rn, 0, w - 1)
    right_src = jnp.take_along_axis(src, rn_c, axis=-1)
    right_z = jnp.take_along_axis(z, rn_c, axis=-1)
    has_r = colsi <= rn                                      # [B,H,W]

    colsf = jnp.broadcast_to(cols, (b, h, w))
    left_dist = colsf - ln.astype(jnp.float32)
    right_dist = (rn - colsi).astype(jnp.float32)
    total = jnp.maximum(left_dist + right_dist, 1.0)
    t = left_dist / total
    t = jnp.where(~has_l, 1.0, t)
    t = jnp.where(~has_r, 0.0, t)
    left_is_bg = left_z < right_z
    t_biased = jnp.where(left_is_bg, jnp.sqrt(t), 1.0 - jnp.sqrt(1.0 - t))
    gap_src = left_src * (1.0 - t_biased) + right_src * t_biased

    src = jnp.where(gap & (has_l | has_r), gap_src, src)
    # Keep the final sample's displacement within the Pallas gather bound.
    bil_disp = max_disp + 128
    src = jnp.clip(src, colsf - (bil_disp - 2), colsf + (bil_disp - 2))
    src = jnp.clip(src, 0.0, w - 1.0)

    warped = _bilinear_sample_w(image, src, bil_disp)
    return warped, gap


def _forward_warp_fused(image, norm_depth, offset, gradient_threshold,
                        max_stretch, max_disp: int, interpret: bool):
    """Single fused Pallas kernel path (pallas/warp_kernel.py)."""
    from ..pallas.warp_kernel import warp_scanline

    b, h, w = offset.shape
    c = image.shape[-1]
    planes = jnp.moveaxis(image, -1, 0).reshape(c, b * h, w)
    if c == 1:
        planes = jnp.concatenate([planes] * 3, axis=0)
    r, g, bl, gap = warp_scanline(
        offset.reshape(b * h, w), norm_depth.reshape(b * h, w),
        planes[0], planes[1], planes[2], w=w,
        gradient_threshold=float(gradient_threshold),
        max_stretch=int(max_stretch), max_disp=int(max_disp),
        interpret=interpret)
    warped = jnp.stack([x.reshape(b, h, w) for x in (r, g, bl)[:max(c, 1)]],
                       axis=-1)
    return warped, gap.reshape(b, h, w) > 0.5


@functools.partial(jax.jit, static_argnames=(
    "gradient_threshold", "max_stretch", "max_disp", "impl"))
def _forward_warp_jit(image, norm_depth, offset,
                      gradient_threshold: float, max_stretch: int,
                      max_disp: int, impl: str = "auto"):
    # The exact windowed z-max handles either offset sign natively (no flip
    # trick), so the scatter-order tie rule matches the oracle for negative
    # divergence too.
    use_pallas = (impl == "pallas"
                  or (impl == "auto" and jax.default_backend() == "tpu"
                      and image.shape[-1] == 3))
    if use_pallas:
        return _forward_warp_fused(
            image, norm_depth, offset, gradient_threshold, max_stretch,
            max_disp, interpret=jax.default_backend() != "tpu")
    return _forward_warp_monotone(
        image, norm_depth, offset, gradient_threshold, max_stretch, max_disp)


def forward_warp(image: jnp.ndarray, depth: jnp.ndarray, divergence_px: float,
                 separation_px: float, stereo_offset_exponent: float,
                 convergence_point: float = 0.5,
                 gradient_threshold: float = 1.5,
                 max_stretch: int = 8,
                 impl: str = "auto") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward warp one eye. Reference spec: forward_warp_gpu (:277-450).

    image: [B, H, W, C] float 0-1; depth: [B, H, W] (any scale, normalized
    per image). divergence_px / separation_px: static floats (pixels).
    Returns (warped [B,H,W,C], gap_mask [B,H,W] bool — True = disocclusion).
    """
    nd = depth_ops.normalize_depth(depth)
    offset = depth_ops.pixel_offsets(
        nd, divergence_px, separation_px, stereo_offset_exponent,
        convergence_point, prenormalized=True)
    # Static displacement bound: |offset| <= max(conv, 1-conv)^exp * |div| + |sep|.
    cmax = max(abs(convergence_point), abs(1.0 - convergence_point))
    bound = (cmax ** stereo_offset_exponent) * abs(divergence_px) \
        + abs(separation_px)
    max_disp = int(math.ceil(bound)) + 4
    if image.dtype not in (jnp.float32, jnp.bfloat16):
        image = image.astype(jnp.float32)
    return _forward_warp_jit(
        image, nd, offset,
        float(gradient_threshold), int(max_stretch), max_disp, impl)
