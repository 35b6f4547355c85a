"""Scanline fill techniques with bit-faithful mask semantics.

These re-express the reference's six Numba JIT kernels
(stereoimage_generation.py:1622-1910) as batched JAX ops. The per-row
sequential loops become either deterministic min/max scatters (winner
selection under swipe-order / z-buffer semantics) or prefix scans
(nearest-valid-neighbor searches). The acceptance bar is per-pixel parity with
the CPU reference (BASELINE.md), so quantization points (uint8 truncation,
`int()` truncation toward zero, uint8 wraparound arithmetic) are replicated
exactly; see the notes on each function.

Conventions: images are float32 arrays holding exact uint8 values (0..255);
`norm_depth` is the per-image min/max normalized depth MINUS the convergence
point (what the reference dispatcher passes to its kernels, :1587-1600).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import depth as depth_ops
from . import scan

# Plain python int (weakly typed in jnp ops): must NOT be a device array, or
# importing the library would eagerly initialize a JAX backend.
_BIG = 2 ** 30


# --------------------------------------------------------------------------
# Deterministic scatter helpers over the last axis of [..., W] arrays.
# --------------------------------------------------------------------------

def _flat_scatter(op: str, dest: jnp.ndarray, values: jnp.ndarray,
                  valid: jnp.ndarray, width: int, init) -> jnp.ndarray:
    """Scatter `values` to `dest` along the last axis with a min/max/add/or
    combiner. Invalid lanes are routed to a dump slot. Deterministic for
    min/max (associative, commutative combiners)."""
    shape = dest.shape
    n_rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    total = n_rows * width
    row_id = jnp.arange(n_rows, dtype=jnp.int32).reshape(shape[:-1] + (1,))
    gidx = row_id * width + jnp.clip(dest, 0, width - 1)
    gidx = jnp.where(valid, gidx, total)  # dump slot
    buf = jnp.full((total + 1,), init, dtype=values.dtype)
    updater = getattr(buf.at[gidx.reshape(-1)], op)
    buf = updater(values.reshape(-1))
    return buf[:total].reshape(shape[:-1] + (width,))


def scatter_min_w(dest, values, valid, width, init):
    return _flat_scatter("min", dest, values, valid, width, init)


def scatter_max_w(dest, values, valid, width, init):
    return _flat_scatter("max", dest, values, valid, width, init)


def scatter_add_w(dest, values, valid, width):
    return _flat_scatter("add", dest, values, valid, width, jnp.asarray(0, values.dtype))


# --------------------------------------------------------------------------
# Sort-based exact winner selection (scatter-free).
#
# XLA's TPU scatter costs ~17 ms per 1080p plane; lax.sort costs ~5 ms and
# composes with the bounded vreg-gather. Winner-per-destination with exact
# tie semantics becomes: lexicographic sort of (dest, priority...) keys, then
# for each output column a windowed binary search for the first element of
# its dest group. An element's sorted rank differs from its dest by at most
# the disparity bound (plus the out-of-range count), so the search and the
# subsequent gathers stay within a bounded window.
# --------------------------------------------------------------------------

def _first_at_least(sorted_keys: jnp.ndarray, queries: jnp.ndarray,
                    max_disp: int) -> jnp.ndarray:
    """First index k with sorted_keys[k] >= query, searched in a window of
    +-max_disp around each query column. sorted_keys: [..., M] ascending
    int32; queries: [..., N] int32 (near-diagonal)."""
    from ..pallas import bounded_take_along_w

    m = sorted_keys.shape[-1]
    lo = jnp.clip(queries - max_disp, 0, m)
    hi = jnp.clip(queries + max_disp, 0, m)
    import math as _math

    rounds = max(1, _math.ceil(_math.log2(2 * max_disp + 2))) + 1

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        v = bounded_take_along_w(sorted_keys, jnp.clip(mid, 0, m - 1),
                                 max_disp + 2)
        go = v < queries
        return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return lo


# --------------------------------------------------------------------------
# Naive integer scatter (reference apply_stereo_divergence_naive :1850-1868,
# naive_mapping_with_mask :1664-1685).
# --------------------------------------------------------------------------

def naive_scatter(image: jnp.ndarray, norm_depth: jnp.ndarray,
                  divergence_px: float, separation_px: float,
                  stereo_offset_exponent: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer-offset scatter with swipe-order z-ordering.

    The reference scans columns in a direction chosen so nearer pixels
    overwrite farther ones (:1859-1862). Because the offset is monotone in
    depth, that swipe order is equivalent to "min source column wins" for
    divergence >= 0 and "max source column wins" otherwise — implemented here
    as one deterministic scatter-min/max.

    Returns (derived [B,H,W,C], filled [B,H,W] bool).
    """
    from ..pallas import bounded_take_along_w

    b, h, w = norm_depth.shape
    cols = jnp.arange(w, dtype=jnp.int32)
    off = depth_ops.signed_power(norm_depth, stereo_offset_exponent) \
        * divergence_px + separation_px
    # numba `int()` truncates toward zero.
    col_d = cols + jnp.trunc(off).astype(jnp.int32)
    valid = (col_d >= 0) & (col_d < w)

    # Sort (dest, priority) lexicographically; the first element of each dest
    # group is the swipe-order winner exactly.
    max_off = int(abs(divergence_px) + abs(separation_px)) + 2
    disp = 2 * max_off + 8
    src_cols = jnp.broadcast_to(cols, norm_depth.shape)
    key1 = jnp.where(valid, col_d, jnp.int32(w + max_off + 8))
    key2 = src_cols if divergence_px >= 0 else (w - 1) - src_cols
    k1s, k2s = jax.lax.sort((key1, key2), num_keys=2,
                            dimension=norm_depth.ndim - 1)
    queries = jnp.broadcast_to(cols, norm_depth.shape)
    idx = _first_at_least(k1s, queries, disp)
    idx_c = jnp.clip(idx, 0, w - 1)
    hit = (idx < w) & (bounded_take_along_w(k1s, idx_c, disp) == queries)
    x_s = bounded_take_along_w(k2s, idx_c, disp)
    winner = x_s if divergence_px >= 0 else (w - 1) - x_s
    winner_c = jnp.clip(jnp.where(hit, winner, queries), 0, w - 1)

    img_cw = jnp.moveaxis(image, -1, -3)                     # [B,C,H,W]
    we = jnp.broadcast_to(winner_c[:, None], img_cw.shape)
    gathered = jnp.moveaxis(bounded_take_along_w(img_cw, we, max_off + 4),
                            -3, -1)
    derived = jnp.where(hit[..., None], gathered, 0.0)
    return derived, hit


def fill_naive(derived: jnp.ndarray, filled: jnp.ndarray,
               divergence_px: float) -> jnp.ndarray:
    """Nearest-filled-neighbor fill within |int(divergence_px)|+1 px, ties to
    the right (reference :1893-1908)."""
    w = filled.shape[-1]
    max_off = abs(int(divergence_px)) + 1
    cols = jnp.arange(w, dtype=jnp.int32)
    ln = scan.nearest_true_left(filled)
    rn = scan.nearest_true_right(filled)
    big = jnp.int32(w + max_off + 2)
    dl = jnp.where(ln >= 0, cols - ln, big)
    dr = jnp.where(rn < w, rn - cols, big)
    use_right = dr <= dl
    dist = jnp.minimum(dl, dr)
    src = jnp.where(use_right, jnp.clip(rn, 0, w - 1), jnp.clip(ln, 0, w - 1))
    val = jnp.take_along_axis(derived, src[..., None], axis=2)
    do_fill = (~filled) & (dist <= max_off)
    return jnp.where(do_fill[..., None], val, derived)


def fill_naive_interpolating(derived: jnp.ndarray,
                             filled: jnp.ndarray) -> jnp.ndarray:
    """Linear border interpolation fill (reference :1871-1892).

    Reference semantics replicated exactly:
    - a "valid" border pixel is filled AND non-black;
    - each gap spans from its first not-filled column to the next valid column,
      overwriting any filled-but-black pixels inside that span;
    - the left border is the pixel just before the first not-filled column
      (black => replaced by the right border, and vice versa);
    - the interpolation increment is truncated to uint8 with wraparound, so
      decreasing ramps rely on modulo-256 arithmetic.
    """
    b, h, w = filled.shape
    c = derived.shape[-1]
    cols = jnp.arange(w, dtype=jnp.int32)
    nonblack = jnp.sum(derived, axis=-1) != 0
    valid = filled & nonblack

    rv = scan.nearest_true_right(valid)                       # W if none
    # First not-filled column since the last valid pixel (inclusive scan).
    nf_idx = jnp.where(~filled, jnp.broadcast_to(cols, filled.shape), _BIG)
    first_nf = scan.segmented_running_min(nf_idx, valid)
    written = (~valid) & (first_nf <= cols) & (first_nf < _BIG)

    l_ptr = jnp.clip(first_nf, 0, w - 1)
    has_lb = first_nf > 0
    l_border = jnp.take_along_axis(derived, jnp.clip(l_ptr - 1, 0, w - 1)[..., None], axis=2)
    l_border = jnp.where(has_lb[..., None], l_border, 0.0)
    has_rb = rv < w
    r_border = jnp.take_along_axis(derived, jnp.clip(rv, 0, w - 1)[..., None], axis=2)
    r_border = jnp.where(has_rb[..., None], r_border, 0.0)

    l_sum = jnp.sum(l_border, axis=-1)
    r_sum = jnp.sum(r_border, axis=-1)
    l_border2 = jnp.where((l_sum == 0)[..., None], r_border, l_border)
    r_border2 = jnp.where(((l_sum != 0) & (r_sum == 0))[..., None], l_border, r_border)

    total_steps = (1 + rv - first_nf).astype(jnp.float32)
    step = (r_border2 - l_border2) / jnp.maximum(total_steps[..., None], 1.0)
    k = (cols - first_nf + 1).astype(jnp.float32)
    incr = jnp.trunc(step * k[..., None]).astype(jnp.int32)
    # uint8 wraparound: l_border + uint8(step*k), matching numpy cast rules.
    val = jnp.mod(l_border2.astype(jnp.int32) + jnp.mod(incr, 256), 256)
    return jnp.where(written[..., None], val.astype(derived.dtype), derived)


# --------------------------------------------------------------------------
# Z-buffered sub-pixel splat ("inverse"; reference :1688-1737).
# --------------------------------------------------------------------------

def inverse_splat(image: jnp.ndarray, norm_depth: jnp.ndarray,
                  divergence_px: float, separation_px: float,
                  stereo_offset_exponent: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Each source pixel writes floor(dest) and floor(dest)+1 with a per-row
    depth buffer; strictly-greater closeness wins, ties keep the earliest
    source column. Two deterministic scatters (max-z, then min-x among
    winners) reproduce the sequential semantics exactly.

    Returns (derived [B,H,W,C], written mask [B,H,W] bool).
    """
    from ..pallas import bounded_take_along_w

    b, h, w = norm_depth.shape
    cols = jnp.arange(w, dtype=jnp.float32)
    off = depth_ops.signed_power(norm_depth, stereo_offset_exponent) * divergence_px
    dest_x = cols + 0.5 + off + separation_px
    j0 = jnp.floor(dest_x).astype(jnp.int32)
    closeness = norm_depth
    writes = closeness > -1.0  # the buffer starts at -1.0 and the test is strict

    # Each source writes taps j0 and j0+1 with identical (closeness, x).
    # One lexicographic sort on (j0, -closeness, x) makes the first element
    # of group g the exact winner of tap-a queries (g == c) AND tap-b queries
    # (g == c-1); the two tap winners combine by the same (closeness, x)
    # order. Ties keep the earliest source column, matching the sequential
    # strict-greater z-buffer exactly.
    max_off = int(abs(divergence_px) + abs(separation_px)) + 3
    disp = 2 * max_off + 8
    src_cols = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32),
                                norm_depth.shape)
    valid_any = (j0 >= -1) & (j0 <= w - 1) & writes
    key1 = jnp.where(valid_any, j0, jnp.int32(w + max_off + 8))
    k1s, negz, xs = jax.lax.sort((key1, -closeness, src_cols), num_keys=3,
                                 dimension=norm_depth.ndim - 1)
    queries = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32),
                               norm_depth.shape)

    def tap(group_queries):
        idx = _first_at_least(k1s, group_queries, disp)
        idx_c = jnp.clip(idx, 0, w - 1)
        ok = (idx < w) & (bounded_take_along_w(k1s, idx_c, disp)
                          == group_queries)
        z = -bounded_take_along_w(negz, idx_c, disp)
        x = bounded_take_along_w(xs, idx_c, disp)
        return ok, z, x

    ok_a, z_a, x_a = tap(queries)          # sources with floor(dest) == c
    ok_b, z_b, x_b = tap(queries - 1)      # sources with floor(dest)+1 == c
    # tap-a group c requires j0 == c in [0, w-1]: true for all queries; tap-b
    # group c-1 >= -1: true as well.
    use_b = ok_b & (~ok_a | (z_b > z_a) | ((z_b == z_a) & (x_b < x_a)))
    hit = ok_a | ok_b
    winner = jnp.where(use_b, x_b, x_a)
    winner_c = jnp.clip(jnp.where(hit, winner, queries), 0, w - 1)

    img_cw = jnp.moveaxis(image, -1, -3)
    we = jnp.broadcast_to(winner_c[:, None], img_cw.shape)
    gathered = jnp.moveaxis(bounded_take_along_w(img_cw, we, max_off + 4),
                            -3, -1)
    derived = jnp.where(hit[..., None], gathered, 0.0)
    return derived, hit


# --------------------------------------------------------------------------
# Gaussian 3-column splat + edge-aware fill ("hybrid_edge";
# reference :1622-1661, :1740-1774, :1837-1848).
# --------------------------------------------------------------------------

def gaussian_splat(image: jnp.ndarray, norm_depth: jnp.ndarray,
                   divergence_px: float, separation_px: float,
                   stereo_offset_exponent: float
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distribute each source pixel over three destination columns with
    Gaussian weights (sigma=1); returns (normalized uint8-valued image, mask).
    """
    from ..pallas import bounded_take_along_w

    b, h, w = norm_depth.shape
    c = image.shape[-1]
    cols = jnp.arange(w, dtype=jnp.float32)
    off = depth_ops.signed_power(norm_depth, stereo_offset_exponent) * divergence_px
    dest_x = cols + 0.5 + off + separation_px
    j_center = jnp.floor(dest_x).astype(jnp.int32)

    # Scatter-add-free: sort sources by j_center once (carrying the sub-pixel
    # fraction and colors), then each of the three taps dd in {-1,0,1} is a
    # segmented sum over the SAME sorted order queried at group c-dd,
    # computed as prefix-sum differences at the group boundaries.
    max_off = int(abs(divergence_px) + abs(separation_px)) + 3
    disp = 2 * max_off + 10
    src_cols = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32),
                                norm_depth.shape)
    valid_src = (j_center >= -1) & (j_center <= w)
    key1 = jnp.where(valid_src, j_center, jnp.int32(w + max_off + 9))
    frac = dest_x - j_center.astype(jnp.float32)
    chans = [image[..., ch] for ch in range(c)]
    k1s, frac_s, *chan_s = jax.lax.sort(
        (key1, frac) + tuple(chans), num_keys=1,
        dimension=norm_depth.ndim - 1, is_stable=True)

    queries = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32),
                               norm_depth.shape)
    # Group boundary ranks for groups c-1, c, c+1 (computed from two searches
    # per needed boundary value; ranks are near-diagonal so the bounded
    # binary search applies).
    starts = {dd: _first_at_least(k1s, queries - dd, disp)
              for dd in (-1, 0, 1)}
    ends = {dd: _first_at_least(k1s, queries - dd + 1, disp)
            for dd in (-1, 0, 1)}

    accum = jnp.zeros((b, h, w, c), dtype=jnp.float32)
    wsum = jnp.zeros((b, h, w), dtype=jnp.float32)
    hit = jnp.zeros((b, h, w), dtype=bool)
    for dd in (-1, 0, 1):
        diff = frac_s - dd
        wght = jnp.exp(-(diff * diff) / 2.0)
        sums = [wght] + [cs_ * wght for cs_ in chan_s]
        # exclusive prefix sums, then segment sum = ps[end] - ps[start]
        lo_idx = jnp.clip(starts[dd], 0, w - 1)
        hi_idx = jnp.clip(ends[dd], 0, w - 1)
        seg_nonempty = ends[dd] > starts[dd]
        # destination validity: group (c - dd) + dd == c is always in range
        for slot, vals in enumerate(sums):
            ps = jnp.cumsum(vals, axis=-1)
            ps_hi = jnp.where(ends[dd] > 0,
                              bounded_take_along_w(
                                  ps, jnp.clip(ends[dd] - 1, 0, w - 1), disp),
                              0.0)
            ps_lo = jnp.where(starts[dd] > 0,
                              bounded_take_along_w(
                                  ps, jnp.clip(starts[dd] - 1, 0, w - 1),
                                  disp),
                              0.0)
            seg = jnp.where(seg_nonempty, ps_hi - ps_lo, 0.0)
            if slot == 0:
                wsum = wsum + seg
            else:
                accum = accum.at[..., slot - 1].set(accum[..., slot - 1] + seg)
        hit = hit | seg_nonempty
        del lo_idx, hi_idx

    # +1e-3 nudge before truncation: the normalized value in flat regions is
    # mathematically an exact integer, but f32 summation order makes the raw
    # ratio straddle it; the nudge pins those pixels to the exact value
    # (the reference's own f32 accumulation is unstable at these knife edges).
    out = jnp.where(
        wsum[..., None] > 0,
        jnp.trunc(jnp.clip(accum / jnp.maximum(wsum[..., None], 1e-20),
                           0.0, 255.0) + 1e-3),
        0.0)
    return out, hit.astype(bool)


def rgb2gray(image: jnp.ndarray) -> jnp.ndarray:
    """Reference rgb2gray weights (:1740-1742)."""
    return (0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2])


def edge_aware_gap_fill(image: jnp.ndarray, mask: jnp.ndarray,
                        guidance: jnp.ndarray, sigma_s: float = 1.0,
                        sigma_r: float = 10.0) -> jnp.ndarray:
    """Bilateral 3x3 interpolation of unfilled pixels (reference :1745-1774).

    For mask==False pixels, average the 3x3 filled neighbors weighted by
    spatial distance and guidance (grayscale) similarity.
    """
    b, h, w, c = image.shape
    pad2 = [(0, 0), (1, 1), (1, 1)]
    m = jnp.pad(mask.astype(jnp.float32), pad2)
    g = jnp.pad(guidance, pad2)
    img = jnp.pad(image, pad2 + [(0, 0)])

    num = jnp.zeros_like(image)
    den = jnp.zeros((b, h, w), dtype=jnp.float32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            sl_h = slice(1 + di, 1 + di + h)
            sl_w = slice(1 + dj, 1 + dj + w)
            nm = m[:, sl_h, sl_w]
            ws = np.exp(-(di * di + dj * dj) / (2.0 * sigma_s * sigma_s))
            diff = guidance - g[:, sl_h, sl_w]
            wr = jnp.exp(-(diff * diff) / (2.0 * sigma_r * sigma_r))
            wgt = nm * ws * wr
            num = num + img[:, sl_h, sl_w, :] * wgt[..., None]
            den = den + wgt
    filled_val = jnp.trunc(jnp.clip(num / jnp.maximum(den[..., None], 1e-20),
                                    0.0, 255.0) + 1e-3)
    take = (~mask) & (den > 0)
    return jnp.where(take[..., None], filled_val, image)


# --------------------------------------------------------------------------
# Row-wise post fills (reference :1804-1833): np.interp over valid columns.
# --------------------------------------------------------------------------

def post_fill_interp(derived: jnp.ndarray, filled: jnp.ndarray) -> jnp.ndarray:
    """np.interp semantics: clamp before first / after last valid column,
    linear interpolation between surrounding valid columns elsewhere."""
    w = filled.shape[-1]
    cols = jnp.arange(w, dtype=jnp.int32)
    ln = scan.nearest_true_left(filled)
    rn = scan.nearest_true_right(filled)
    has_l = ln >= 0
    has_r = rn < w
    lv = jnp.take_along_axis(derived, jnp.clip(ln, 0, w - 1)[..., None], axis=2)
    rv = jnp.take_along_axis(derived, jnp.clip(rn, 0, w - 1)[..., None], axis=2)

    denom = jnp.maximum((rn - ln).astype(jnp.float32), 1.0)
    t = ((cols - ln).astype(jnp.float32) / denom)[..., None]
    interp = lv + (rv - lv) * t
    out = jnp.where(has_l[..., None], interp, rv)
    out = jnp.where(has_r[..., None], out, jnp.where(has_l[..., None], lv, derived))
    out = jnp.where(filled[..., None], derived, out)
    # Rows with no valid pixels at all keep the base image.
    any_valid = jnp.any(filled, axis=-1, keepdims=True)
    out = jnp.where(any_valid[..., None], out, derived)
    return jnp.trunc(out)


# --------------------------------------------------------------------------
# Anaglyph composer (reference overlap_red_cyan :1996-2010).
# --------------------------------------------------------------------------

def overlap_red_cyan(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """R from the left image, G+B from the right. [..., H, W, 3]."""
    return jnp.stack([left[..., 0], right[..., 1], right[..., 2]], axis=-1)
