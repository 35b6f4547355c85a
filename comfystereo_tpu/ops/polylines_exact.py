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
    rank(col) - 1, found by a windowed binary search over a LANE-ALIGNED
    query grid (ranks displace from points_per_col * col by at most the
    offset bound, so every gather is bounded and runs through the Pallas
    vreg-gather on TPU);
  * the winner scan walks candidate segments owned by source columns
    col + d over a DYNAMIC window derived from the measured
    (coord + separation) range, in ascending source order, keeping the
    reference's strict-max rule. When NO segment qualifies (no 0 < ip < 1
    winner) the reference falls back to csg[0] of its swap-removal-churned
    active list — a history-dependent, order-defined choice; here the
    fallback is the LOWEST-x0 active segment, a deterministic
    canonicalization that can differ from the reference only on fold-heavy
    rows with several active segments and exact-float closeness ties (all
    parity fixtures agree). On TPU it runs as a fused
    Pallas kernel (pallas/polylines_exact_kernel.py) with the window sized
    PER ROW-BLOCK; the XLA fallback chunks rows through lax.map for the
    same per-chunk adaptivity;
  * sentinel segments (reference :1920, :1936) are extra candidates
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
from ..pallas import bounded_take_along_w

_EPS = jnp.float32(1e-7)


def _searchsorted_left_aligned(xs: jnp.ndarray, ppc: int,
                               window: int) -> jnp.ndarray:
    """rank[..., q] = #elements of sorted xs[..., P] strictly below the
    query column q // ppc, evaluated on a P-lane grid so that
    |rank - lane| <= window + ppc and every gather is bounded."""
    *lead, p = xs.shape
    lanes = jnp.arange(p, dtype=jnp.int32)
    queries = (lanes // ppc).astype(jnp.float32)
    lo = jnp.broadcast_to(jnp.maximum(lanes - window, 0),
                          tuple(lead) + (p,))
    hi = jnp.broadcast_to(jnp.minimum(lanes + window, p), lo.shape)
    rounds = max(1, math.ceil(math.log2(2 * window + 2))) + 1
    gb = window + ppc + 2

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        v = bounded_take_along_w(xs, jnp.clip(mid, 0, p - 1), gb)
        cont = lo < hi          # freeze converged lanes (fixed-round loop)
        go = cont & (v < queries)
        return (jnp.where(go, mid + 1, lo),
                jnp.where(cont & ~go, mid, hi))

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return lo


def _piece_geometry(x, cl, sharp: bool, max_pieces: int, max_disp: int):
    """Breakpoint geometry: (centers, sigs, valids) each [K, B, H, W] f32.

    x: point centers [B,H,W]; pieces follow the reference's per-pixel sweep
    (:1950-1960): piece k of pixel col spans sorted points q0+k .. q0+k+1
    clipped to [col, col+1], eps-shrunk.
    """
    b, h, w = x.shape
    ppc = 2 if sharp else 1
    hw = jnp.float32(0.45 if sharp else 0.0)
    colsf = jnp.arange(w, dtype=jnp.float32)
    sent_l = jnp.float32(-1.0 * w)
    sent_r = jnp.float32(2.0 * w)

    if sharp:
        pts = jnp.stack([x - hw, x + hw], axis=-1).reshape(b, h, 2 * w)
    else:
        pts = x
    xs = jnp.sort(pts, axis=-1)               # [B,H,P]
    p_total = ppc * w

    win = ppc * (max_disp + 3)
    rank_all = _searchsorted_left_aligned(xs, ppc, win)     # [B,H,P]
    # rank for column col lives at lane ppc*col; q0 = rank_all (interior
    # count) since the left sentinel sorts before any query in [0, w].
    q0 = rank_all[..., ::ppc] if ppc > 1 else rank_all      # [B,H,W]

    gb = win + max_pieces + ppc + 2

    def pt_sorted_at(q):
        """Full sorted point list incl sentinels: index 0 = left sentinel,
        1..P interior, P+1 right sentinel. |q - ppc*col| is bounded, but the
        gather output lane is col — align by querying in the P-lane space
        when ppc > 1."""
        qi = jnp.clip(q - 1, 0, p_total - 1)
        if ppc == 1:
            v = bounded_take_along_w(xs, qi, gb)
        else:
            # Expand queries onto the P-lane grid (lane 2c holds col c's
            # query) so |index - lane| stays bounded, then take every other.
            qe = jnp.repeat(qi, ppc, axis=-1)
            v = bounded_take_along_w(xs, qe, gb)[..., ::ppc]
        v = jnp.where(q <= 0, sent_l, v)
        return jnp.where(q >= p_total + 1, sent_r, v)

    centers, sigs, valids = [], [], []
    xq = pt_sorted_at(q0)
    for k in range(max_pieces):
        xq1 = pt_sorted_at(q0 + k + 1)
        valid = (xq < colsf + 1.0) if k > 0 else jnp.ones_like(xq, bool)
        f_k = jnp.maximum(colsf, xq) + _EPS
        t_k = jnp.minimum(colsf + 1.0, xq1) - _EPS
        sig = t_k - f_k
        centers.append(f_k + 0.5 * sig)
        sigs.append(sig)
        valids.append(valid.astype(jnp.float32))
        xq = xq1
    return (jnp.stack(centers), jnp.stack(sigs), jnp.stack(valids))


# ---------------------------------------------------------------------------
# XLA winner scan (CPU fallback / oracle for the fused kernel)
# ---------------------------------------------------------------------------

def _winner_scan_xla(image, x, cl, centers, sigs, valids, sep_px,
                     sharp: bool, max_pieces: int, max_disp: int):
    b, h, w = x.shape
    c = image.shape[-1]
    hw = jnp.float32(0.45 if sharp else 0.0)
    colsi = jnp.arange(w, dtype=jnp.int32)
    sent_l = jnp.float32(-1.0 * w)
    sent_r = jnp.float32(2.0 * w)
    inf = jnp.float32(1e30)

    m = x - (jnp.arange(w, dtype=jnp.float32) + 0.5)
    d_lo = jnp.maximum(jnp.floor(-jnp.max(m)).astype(jnp.int32) - 2,
                       -(max_disp + 4))
    d_hi = jnp.minimum(jnp.ceil(-jnp.min(m)).astype(jnp.int32) + 2,
                       max_disp + 4)

    img_p = jnp.moveaxis(image.astype(jnp.float32), -1, 0)  # [C,B,H,W]
    planes = jnp.concatenate([x[None], cl[None], img_p], axis=0)
    planes0 = jnp.roll(planes, -d_lo, axis=-1)

    def scan_piece(center):
        def consider(state, x0, x1, cl0, cl1, col_l, col_r, cand_ok,
                     flat=False):
            best_cl, best_col, fb_x0, fb_col = state
            active = cand_ok & (x0 < center) & (x1 >= center)
            denom = x1 - x0
            safe = jnp.where(denom == 0.0, 1.0, denom)
            ip = (center - x0) / safe
            clp = (1.0 - ip) * cl0 + ip * cl1
            qual = active & (ip > 0.0) & (ip < 1.0)
            if flat:  # both endpoints share a source column (:1984-1985)
                cval = col_l
            else:
                cval = col_l * (1.0 - ip[None]) + col_r * ip[None]
            better = qual & (clp > best_cl)
            best_cl = jnp.where(better, clp, best_cl)
            best_col = jnp.where(better[None], cval, best_col)
            fb_take = active & (x0 < fb_x0)
            fb_x0 = jnp.where(fb_take, x0, fb_x0)
            fb_col = jnp.where(fb_take[None], cval, fb_col)
            return (best_cl, best_col, fb_x0, fb_col)

        def body(t, carry):
            cur, state = carry
            nxt = jnp.roll(cur, -1, axis=-1)
            d = d_lo + t
            cp = colsi + d
            x_c, cl_c, img_c = cur[0], cur[1], cur[2:]
            x_n, cl_n, img_n = nxt[0], nxt[1], nxt[2:]
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
                 jnp.full(shape, inf), jnp.zeros((c,) + shape))
        first_x = x[..., :1] - hw
        last_x = x[..., -1:] + hw
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
        best_cl, best_col, fb_x0, fb_col = state
        # The oracle bypasses the best-scan when exactly one segment is
        # active (`if len(active) != 1`) and uses that segment — but with
        # one active candidate the best track (qual implies active) and the
        # fallback track were written by that same candidate with the same
        # color, so best == fallback and counting n_act is redundant.
        use_best = best_cl > -_EPS
        return jnp.where(use_best[None], best_col, fb_col)

    acc = jnp.full((c, b, h, w), 0.5, jnp.float32)
    for k in range(max_pieces):
        color_k = scan_piece(centers[k])
        acc = acc + jnp.where(valids[k][None] > 0.5,
                              color_k * sigs[k][None], 0.0)
    out = jnp.moveaxis(acc, 0, -1)
    return jnp.trunc(jnp.clip(out, 0.0, 255.0))


def _exact_core(image, coord, sep_px, sharp: bool, max_pieces: int,
                max_disp: int):
    b, h, w = coord.shape
    colsf = jnp.arange(w, dtype=jnp.float32)
    x = colsf + 0.5 + coord + sep_px
    cl = jnp.abs(coord)
    centers, sigs, valids = _piece_geometry(x, cl, sharp, max_pieces,
                                            max_disp)
    return _winner_scan_xla(image, x, cl, centers, sigs, valids, sep_px,
                            sharp, max_pieces, max_disp)


@functools.partial(jax.jit, static_argnames=("sharp", "max_pieces",
                                              "max_disp", "row_chunk",
                                              "impl"))
def _polylines_exact_impl(image, coord, sep_px, sharp: bool,
                          max_pieces: int, max_disp: int,
                          row_chunk: int = 64, impl: str = "auto"):
    b, h, w = coord.shape
    c = image.shape[-1]
    use_pallas = (impl == "pallas"
                  or (impl == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        from ..pallas.polylines_exact_kernel import polylines_exact_scanline

        n = b * h
        colsf = jnp.arange(w, dtype=jnp.float32)
        x = (colsf + 0.5 + coord + sep_px).reshape(n, w)
        cl = jnp.abs(coord).reshape(n, w)
        img = jnp.moveaxis(image.astype(jnp.float32), -1, 0).reshape(c, n, w)
        pl3 = [img[i] for i in range(min(c, 3))]
        while len(pl3) < 3:
            pl3.append(pl3[-1])
        # Piece geometry (breakpoint collection) happens IN the kernel.
        outs = polylines_exact_scanline(
            x, cl, pl3[0], pl3[1], pl3[2],
            w=w, k_pieces=max_pieces, sharp=sharp, max_disp=max_disp,
            interpret=jax.default_backend() != "tpu")
        return jnp.stack([o.reshape(b, h, w) for o in outs[:max(c, 1)]],
                         axis=-1)

    # XLA fallback: chunk rows through lax.map so each chunk's candidate
    # window sizes to its own coord range.
    n = b * h
    chunk = min(row_chunk, n)
    g = -(-n // chunk)
    npad = g * chunk

    def pad_rows(v):
        flat = v.reshape((n,) + v.shape[2:])
        return jnp.concatenate(
            [flat, jnp.zeros((npad - n,) + flat.shape[1:], flat.dtype)],
            axis=0).reshape((g, chunk) + flat.shape[1:])

    img_g = pad_rows(image)
    coord_g = pad_rows(coord)
    out = jax.lax.map(
        lambda t: _exact_core(t[0][None], t[1][None], sep_px, sharp,
                              max_pieces, max_disp)[0],
        (img_g, coord_g))
    return out.reshape(npad, w, c)[:n].reshape(b, h, w, c)


def apply_polylines_exact(image: jnp.ndarray, norm_depth: jnp.ndarray,
                          divergence_px: float, separation_px: float,
                          stereo_offset_exponent: float, sharp: bool = True,
                          max_pieces: int = 12,
                          impl: str = "auto") -> jnp.ndarray:
    """Exact-integration polylines projection for one eye.

    image: [B,H,W,C] float32 holding uint8 values; norm_depth: [B,H,W]
    normalized depth minus convergence point (dispatcher convention).
    impl: 'auto' (fused Pallas kernel on TPU, chunked XLA elsewhere)
    | 'pallas' | 'xla'.
    """
    coord = depth_ops.signed_power(norm_depth, stereo_offset_exponent) \
        * divergence_px
    max_off = abs(divergence_px) + abs(separation_px)
    max_disp = int(math.ceil(max_off)) + 4
    return _polylines_exact_impl(
        image.astype(jnp.float32), coord.astype(jnp.float32),
        jnp.float32(separation_px), bool(sharp), int(max_pieces), max_disp,
        impl=impl)
