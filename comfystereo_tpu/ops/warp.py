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
1.  NO scatter: for divergence > 0 the offset is monotone in depth, so the
    z-buffer winner at column c is the FIRST segment whose destination span
    crosses c. With M_i = max(dest_i, dest_i+1) for connected segments and
    P = prefix-max(M), the winner is min{i : P_i > c} — a binary search.
2.  Bounded displacement: |i(c) - c| <= D + 2 where D = |divergence_px| +
    |separation_px| (a segment further away either cannot reach c or provably
    leaves c in a gap), so the search runs in a +-(D+2) window — log2(2D)
    rounds instead of log2(W).
3.  NO scalarized gathers: XLA's gather is ~24 ms per 1080p plane on TPU, so
    every take-along-axis goes through the Pallas vreg-gather
    (`pallas.bounded_take_along_w`, ~0.26 ms) and every gather-at-
    nearest-valid-index is re-expressed as an associative carry scan
    (scan.forward_fill / backward_fill).

Known deviation from the scatter reference (documented, SSIM-level): a segment
chain that folds backward behind a disconnected jump can re-cover columns the
first-crossing rule reports as gaps; the reference renders those folds (they
lose the z-test wherever anything else covers them). Gap-fill interpolation
makes the difference visually negligible.
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
    g0 = bounded_take_along_w(img_cw, i0e, max_disp)
    g1 = bounded_take_along_w(img_cw, i1e, max_disp)
    out = g0 * (1.0 - fr[:, None]) + g1 * fr[:, None]
    return jnp.moveaxis(out, -3, -1)


def _windowed_first_above(prefix_reach: jnp.ndarray, max_disp: int
                          ) -> jnp.ndarray:
    """min{i : prefix_reach[i] > c} for integer queries c = 0..W-1, searched
    in the window [c - max_disp, c + max_disp] (the answer is provably there
    or there is no covering segment — see module docstring)."""
    *lead, m = prefix_reach.shape
    w = m + 1
    cols = jnp.arange(w, dtype=jnp.int32)
    colsf = cols.astype(jnp.float32)
    lo = jnp.broadcast_to(jnp.maximum(cols - max_disp, 0), lead + [w])
    hi = jnp.broadcast_to(jnp.minimum(cols + max_disp, m), lead + [w])
    queries = jnp.broadcast_to(colsf, lead + [w])
    rounds = max(1, math.ceil(math.log2(2 * max_disp + 2))) + 1

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        v = bounded_take_along_w(prefix_reach, jnp.clip(mid, 0, m - 1),
                                 max_disp + 2)
        go_right = v <= queries
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    # If the window contained no crossing, the search converges to its upper
    # clamp; validate by re-reading P at the result (a crossing beyond the
    # window provably cannot cover c, so reporting "gap" there is correct).
    pv = bounded_take_along_w(prefix_reach, jnp.clip(lo, 0, m - 1),
                              max_disp + 2)
    found = (lo < m) & (pv > queries)
    return lo, found


def _forward_warp_monotone(image, norm_depth, offset, gradient_threshold,
                           max_stretch, max_disp: int):
    """Core warp assuming offset is increasing in depth (divergence >= 0).

    image: [B, H, W, C]; norm_depth, offset: [B, H, W]; max_disp: static
    bound on |offset| in pixels (+ margin).
    Returns (warped [B,H,W,C], gap_mask [B,H,W] bool).
    """
    b, h, w = offset.shape
    cols = jnp.arange(w, dtype=jnp.float32)
    dest = cols + offset                                     # [B,H,W]

    # Segment connectivity (reference :339-340).
    diff = jnp.abs(offset[..., 1:] - offset[..., :-1])
    connected = diff < gradient_threshold                    # [B,H,W-1]

    dest_l = dest[..., :-1]
    dest_r = dest[..., 1:]
    seg_max = jnp.maximum(dest_l, dest_r)
    reach = jnp.where(connected, seg_max, _NEG_INF)
    prefix_reach = scan.running_max(reach)                   # non-decreasing

    idx, found = _windowed_first_above(prefix_reach, max_disp)
    idx_c = jnp.minimum(idx, w - 2)

    gd = max_disp + 2
    dl = bounded_take_along_w(dest_l, idx_c, gd)
    dr = bounded_take_along_w(dest_r, jnp.minimum(idx_c, w - 2), gd)
    width = dr - dl
    safe_width = jnp.where(jnp.abs(width) < 1e-4, 1.0, width)
    queries = jnp.broadcast_to(cols, (b, h, w))
    frac = (queries - dl) / safe_width                       # 0 at dl, 1 at dr

    # Coverage: candidate validity is frac in [0, 1) half-open (:375) and the
    # span renders at most max_stretch columns from floor(min(dl,dr)) (:365).
    covered = found & (frac >= 0.0) & (frac < 1.0)
    floor_start = jnp.floor(jnp.minimum(dl, dr))
    stretch_ok = (queries - floor_start) < max_stretch
    filled = covered & stretch_ok

    src = idx_c.astype(jnp.float32) + frac
    nd_l = bounded_take_along_w(norm_depth, idx_c, gd)
    nd_r = bounded_take_along_w(norm_depth, jnp.minimum(idx_c + 1, w - 1), gd)
    z = nd_l * (1.0 - frac) + nd_r * frac

    gap = ~filled

    # --- Disocclusion fill (reference :393-438): interpolate source positions
    # between gap borders with sqrt bias toward the background (lower z) side.
    # Nearest-border values come from carry scans, not gathers.
    (left_src, left_z), has_l = scan.forward_fill((src, z), filled)
    (right_src, right_z), has_r = scan.backward_fill((src, z), filled)
    ln = scan.nearest_true_left(filled)                      # -1 if none
    rn = scan.nearest_true_right(filled)                     # W if none

    colsf = queries
    left_dist = colsf - ln.astype(jnp.float32)
    right_dist = rn.astype(jnp.float32) - colsf
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
    "negative_divergence", "gradient_threshold", "max_stretch", "max_disp",
    "impl"))
def _forward_warp_jit(image, norm_depth, offset, negative_divergence: bool,
                      gradient_threshold: float, max_stretch: int,
                      max_disp: int, impl: str = "auto"):
    if negative_divergence:
        image = jnp.flip(image, axis=-2)
        norm_depth = jnp.flip(norm_depth, axis=-1)
        offset = -jnp.flip(offset, axis=-1)
        warped, gap = _forward_warp_jit(
            image, norm_depth, offset, False, gradient_threshold, max_stretch,
            max_disp, impl)
        return jnp.flip(warped, axis=-2), jnp.flip(gap, axis=-1)
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
    return _forward_warp_jit(
        image.astype(jnp.float32), nd, offset,
        bool(divergence_px < 0), float(gradient_threshold), int(max_stretch),
        max_disp, impl)
