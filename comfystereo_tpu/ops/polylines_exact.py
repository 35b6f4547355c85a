"""Exact polylines renderer: per-sub-interval integration, bit-parity mode.

Reference spec: `apply_stereo_divergence_polylines`
(stereoimage_generation.py:1912-1992). The reference integrates
coverage-weighted color over EXACT sub-intervals: per output pixel, the
breakpoints are the sorted warped point positions inside [col, col+1); at
each (epsilon-shrunk) sub-interval's center it picks, among the ACTIVE
segments (x0 < center <= x1), the one with maximum interpolated closeness
(strict improvement, 0 < ip < 1), and accumulates color(center) * width into
a 0.5-biased accumulator truncated to uint8.

TPU-native inversion (same playbook as ops/warp.py's exact windowed z-max):

  * sort the warped points per row once (`jnp.sort`) — the sorted positions
    ARE the integration breakpoints; each pixel's pieces start at
    rank(col) - 1, found by a windowed binary search (ranks displace from
    points_per_col * col by at most the offset bound);
  * per piece (static `max_pieces` unroll), scan the candidate segments
    owned by source columns col + d over a DYNAMIC window d derived from the
    row-batch's measured (coord + separation) range, in ascending source
    order — one dynamic roll positions a packed plane stack, then each
    iteration advances with a static roll; the loop keeps a running
    strict-max of interpolated closeness plus the reference's fallback
    (the lowest-x0 active segment) and accumulates the winner's color
    eagerly, so no per-candidate state survives the loop;
  * sentinel segments (reference :1920, :1936) are two extra candidates
    evaluated outside the loop.

Piece counts per pixel are data-dependent (points falling into one pixel);
`max_pieces` bounds the unroll. Fixtures and natural depth maps need ~2-6;
pathological folds beyond the cap lose their trailing pieces (the reference's
own active-set array is capped at 5*|divergence_px|+25, :1947).

Arithmetic note: every sweep quantity is float32 with the reference's
expression forms, matching the test oracle bit-for-bit. (Numba upcasts some
sweep intermediates to float64 while STORING points as float32; the float32
sweep stays within 1 uint8 LSB of that.)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from . import depth as depth_ops

_EPS = jnp.float32(1e-7)


def _searchsorted_left(xs: jnp.ndarray, queries: jnp.ndarray,
                       anchor_scale: int, window: int) -> jnp.ndarray:
    """rank[i] = #elements of sorted xs[..., P] strictly < queries[..., i],
    where rank displaces from anchor_scale * i by at most `window`."""
    *lead, p = xs.shape
    n = queries.shape[-1]
    base = jnp.arange(n, dtype=jnp.int32) * anchor_scale
    lo = jnp.broadcast_to(jnp.maximum(base - window, 0), tuple(lead) + (n,))
    hi = jnp.broadcast_to(jnp.minimum(base + window, p), lo.shape)
    rounds = max(1, math.ceil(math.log2(2 * window + 2))) + 1

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(xs, jnp.clip(mid, 0, p - 1), axis=-1)
        cont = lo < hi          # freeze converged lanes (fixed-round loop)
        go = cont & (v < queries)
        return (jnp.where(go, mid + 1, lo),
                jnp.where(cont & ~go, mid, hi))

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return lo


@functools.partial(jax.jit, static_argnames=("sharp", "max_pieces",
                                              "max_disp", "row_chunk"))
def _polylines_exact_impl(image, coord, sep_px, sharp: bool,
                          max_pieces: int, max_disp: int,
                          row_chunk: int = 64):
    """Chunk rows and lax.map the core so each chunk's candidate window is
    sized by ITS OWN coord range (a global window at 1080p+ costs seconds;
    smooth-depth chunks need a handful of iterations)."""
    b, h, w = coord.shape
    c = image.shape[-1]
    n = b * h
    chunk = min(row_chunk, n)
    g = -(-n // chunk)
    npad = g * chunk

    def pad_rows(v):
        flat = v.reshape((n,) + v.shape[2:])
        return jnp.concatenate(
            [flat, jnp.zeros((npad - n,) + flat.shape[1:], flat.dtype)],
            axis=0).reshape((g, chunk) + flat.shape[1:])

    img_g = pad_rows(image)      # [G, chunk, W, C]
    coord_g = pad_rows(coord)    # [G, chunk, W]

    out = jax.lax.map(
        lambda t: _exact_core(t[0][None], t[1][None], sep_px, sharp,
                              max_pieces, max_disp)[0],
        (img_g, coord_g))
    return out.reshape(npad, w, c)[:n].reshape(b, h, w, c)


def _exact_core(image, coord, sep_px, sharp: bool,
                max_pieces: int, max_disp: int):
    b, h, w = coord.shape
    c = image.shape[-1]
    ppc = 2 if sharp else 1
    hw = jnp.float32(0.45 if sharp else 0.0)
    colsf = jnp.arange(w, dtype=jnp.float32)
    colsi = jnp.arange(w, dtype=jnp.int32)

    x = colsf + 0.5 + coord + sep_px          # point centers [B,H,W]
    cl = jnp.abs(coord)
    sent_l = jnp.float32(-1.0 * w)
    sent_r = jnp.float32(2.0 * w)

    # Sorted interior point positions (breakpoints).
    if sharp:
        pts = jnp.stack([x - hw, x + hw], axis=-1).reshape(b, h, 2 * w)
    else:
        pts = x
    xs = jnp.sort(pts, axis=-1)               # [B,H,P]
    p_total = ppc * w

    # rank among ALL points (sentinel-left sorts before every query in [0,w]).
    win = ppc * (max_disp + 3)
    rank_interior = _searchsorted_left(xs, colsf, ppc, win)   # [B,H,W]

    def pt_sorted_at(q):
        """Full sorted point list incl sentinels: index 0 = left sentinel,
        1..P = interior, P+1 = right sentinel."""
        qi = jnp.clip(q - 1, 0, p_total - 1)
        v = jnp.take_along_axis(xs, qi, axis=-1)
        v = jnp.where(q <= 0, sent_l, v)
        return jnp.where(q >= p_total + 1, sent_r, v)

    # rank among all points = rank_interior + 1 (left sentinel < any query);
    # q0 = rank_all - 1 = index of the last point with x < col.
    q0 = rank_interior

    # Piece geometry (reference :1955-1960), float32 expression forms.
    froms, tos, centers, valids = [], [], [], []
    xq = pt_sorted_at(q0)
    for k in range(max_pieces):
        xq1 = pt_sorted_at(q0 + k + 1)
        valid = (xq < colsf + 1.0) if k > 0 else jnp.ones_like(xq, bool)
        f_k = jnp.maximum(colsf, xq) + _EPS
        t_k = jnp.minimum(colsf + 1.0, xq1) - _EPS
        sig = t_k - f_k
        froms.append(f_k)
        tos.append(t_k)
        centers.append(f_k + 0.5 * sig)
        valids.append(valid)
        xq = xq1

    # ---- candidate scan ----------------------------------------------------
    m = coord + sep_px
    d_lo = jnp.floor(-jnp.max(m)).astype(jnp.int32) - 2
    d_hi = jnp.ceil(-jnp.min(m)).astype(jnp.int32) + 2
    d_lo = jnp.maximum(d_lo, -(max_disp + 4))
    d_hi = jnp.minimum(d_hi, max_disp + 4)

    img_p = jnp.moveaxis(image.astype(jnp.float32), -1, 0)  # [C,B,H,W]
    planes = jnp.concatenate([x[None], cl[None], img_p], axis=0)  # [2+C,...]
    planes0 = jnp.roll(planes, -d_lo, axis=-1)

    neg = jnp.float32(-1e30)
    inf = jnp.float32(1e30)

    def scan_piece(center):
        """Winner color at `center` for one piece: [C,B,H,W]."""

        def consider(state, x0, x1, cl0, cl1, col_l, col_r, cand_ok,
                     flat=False):
            best_cl, best_col, n_act, fb_x0, fb_col = state
            active = cand_ok & (x0 < center) & (x1 >= center)
            denom = x1 - x0
            safe = jnp.where(denom == 0.0, 1.0, denom)
            ip = (center - x0) / safe
            clp = (1.0 - ip) * cl0 + ip * cl1
            qual = active & (ip > 0.0) & (ip < 1.0)
            # flat: both endpoints share a source column (within-pixel and
            # sentinel segments, reference :1984-1985) -> raw image color.
            if flat:
                cval = col_l
            else:
                cval = col_l * (1.0 - ip[None]) + col_r * ip[None]
            better = qual & (clp > best_cl)
            best_cl = jnp.where(better, clp, best_cl)
            best_col = jnp.where(better[None], cval, best_col)
            fb_take = active & (x0 < fb_x0)
            fb_x0 = jnp.where(fb_take, x0, fb_x0)
            fb_col = jnp.where(fb_take[None], cval, fb_col)
            n_act = n_act + active.astype(jnp.int32)
            return (best_cl, best_col, n_act, fb_x0, fb_col)

        def body(t, carry):
            cur, state = carry
            nxt = jnp.roll(cur, -1, axis=-1)
            d = d_lo + t
            cp = colsi + d                      # candidate source column
            x_c, cl_c = cur[0], cur[1]
            img_c = cur[2:]
            x_n, cl_n = nxt[0], nxt[1]
            img_n = nxt[2:]
            if sharp:
                state = consider(state, x_c - hw, x_c + hw, cl_c, cl_c,
                                 img_c, img_c,
                                 (cp >= 0) & (cp <= w - 1), flat=True)
            state = consider(state, x_c + hw, x_n - hw, cl_c, cl_n,
                             img_c, img_n,
                             (cp >= 0) & (cp <= w - 2))
            return (nxt, state)

        shape = (b, h, w)
        state = (jnp.full(shape, -_EPS), jnp.zeros((c,) + shape),
                 jnp.zeros(shape, jnp.int32), jnp.full(shape, inf),
                 jnp.zeros((c,) + shape))
        # Sentinel segments (evaluated once; reference :1920, :1936).
        first_x = x[..., :1] - hw               # x of pt[1]
        last_x = x[..., -1:] + hw               # x of pt[P]
        state = consider(state, jnp.broadcast_to(sent_l, shape),
                         jnp.broadcast_to(first_x, shape),
                         jnp.zeros(shape),
                         jnp.broadcast_to(cl[..., :1], shape),
                         jnp.broadcast_to(img_p[..., :1], (c,) + shape),
                         jnp.broadcast_to(img_p[..., :1], (c,) + shape),
                         jnp.ones(shape, bool), flat=True)
        state = consider(state, jnp.broadcast_to(last_x, shape),
                         jnp.broadcast_to(sent_r, shape),
                         jnp.broadcast_to(cl[..., -1:], shape),
                         jnp.zeros(shape),
                         jnp.broadcast_to(img_p[..., -1:], (c,) + shape),
                         jnp.broadcast_to(img_p[..., -1:], (c,) + shape),
                         jnp.ones(shape, bool), flat=True)
        _, state = jax.lax.fori_loop(0, d_hi - d_lo + 1, body,
                                     (planes0, state))
        best_cl, best_col, n_act, fb_x0, fb_col = state
        qual_found = best_cl > -_EPS
        use_best = qual_found & (n_act != 1)
        return jnp.where(use_best[None], best_col, fb_col)

    acc = jnp.full((c, b, h, w), 0.5, jnp.float32)
    for k in range(max_pieces):
        color_k = scan_piece(centers[k])
        sig_k = tos[k] - froms[k]
        acc = acc + jnp.where(valids[k][None], color_k * sig_k[None], 0.0)

    out = jnp.moveaxis(acc, 0, -1)
    return jnp.trunc(jnp.clip(out, 0.0, 255.0))


def apply_polylines_exact(image: jnp.ndarray, norm_depth: jnp.ndarray,
                          divergence_px: float, separation_px: float,
                          stereo_offset_exponent: float, sharp: bool = True,
                          max_pieces: int = 12) -> jnp.ndarray:
    """Exact-integration polylines projection for one eye.

    image: [B,H,W,C] float32 holding uint8 values; norm_depth: [B,H,W]
    normalized depth minus convergence point (dispatcher convention).
    """
    coord = depth_ops.signed_power(norm_depth, stereo_offset_exponent) \
        * divergence_px
    max_off = abs(divergence_px) + abs(separation_px)
    max_disp = int(math.ceil(max_off)) + 4
    return _polylines_exact_impl(
        image.astype(jnp.float32), coord.astype(jnp.float32),
        jnp.float32(separation_px), bool(sharp), int(max_pieces), max_disp)
