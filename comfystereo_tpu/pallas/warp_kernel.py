"""Fused scanline forward-warp kernel (Pallas/Mosaic) — exact z-buffer.

The entire warp (ops/warp.py docstring) for a block of rows runs in one
kernel with every intermediate resident in VMEM:

    dest/connectivity -> windowed z-max candidate scan -> gap border fills
    -> sqrt-bias gap interp -> bilinear sample

The candidate scan INVERTS the reference's scatter z-buffer
(stereoimage_generation.py:365-391): for every output column c, walk the
segments i = c + d over the displacement window in ascending-index order,
keeping the max interpolated depth with the reference's strict
`z > best + 1e-6` replacement. This reproduces the sequential scatter's
winners, ties, coverage, and gap mask exactly — folds and either divergence
sign included.

Vectorization strategy: rows live on sublanes, image columns on lanes.
  * the six per-segment arrays are PACKED along sublanes into one [6R, Wp]
    buffer; one dynamic pltpu.roll positions it at the window start, then
    each loop iteration advances with a static 1-lane cyclic roll — the
    z-max loop contains no gathers;
  * the trip count is DYNAMIC: the block's measured offset range
    (floor(-off_max)-1 .. ceil(-off_min)) bounds the window, so smooth
    depth regions cost a handful of iterations instead of 2*max_disp;
  * border fills: log-step lane shifts; the reference's "right border" is
    its flipped-cummax quirk = the row's RIGHTMOST filled column
    (reference :399-404), a masked lane reduction here;
  * bilinear taps: bounded-displacement vreg gathers.

The XLA-composed implementation in ops/warp.py keeps identical semantics and
serves as the non-TPU fallback and the test oracle for this kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _shift_left(x, s, fill):
    """x[:, i] <- x[:, i+s] (data moves left); rightmost s lanes get fill."""
    if s == 0:
        return x
    pad = jnp.full((x.shape[0], s), fill, dtype=x.dtype)
    return jnp.concatenate([x[:, s:], pad], axis=1)


def _shift_right(x, s, fill):
    """x[:, i] <- x[:, i-s]; leftmost s lanes get fill."""
    if s == 0:
        return x
    pad = jnp.full((x.shape[0], s), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:, :-s]], axis=1)


def _forward_fill(values, has, wp):
    """values: tuple of [R, Wp]; propagate last has=True entry rightward."""
    s = 1
    while s < wp:
        sh = [_shift_right(v, s, 0.0) for v in values]
        sh_has = _shift_right(has.astype(jnp.float32), s, 0.0) > 0.5
        values = tuple(jnp.where(has, v, sv) for v, sv in zip(values, sh))
        has = has | sh_has
        s *= 2
    return values, has


def _vreg_gather(vals, idx, k, nvreg):
    """vals [R, Wp], idx [R, Wp] int32 with |idx - col| <= k*128.
    Gather along lanes via per-vreg dynamic gathers + masked selects."""
    r = vals.shape[0]
    pieces = []
    for j in range(nvreg):
        idxv = idx[:, j * _LANES:(j + 1) * _LANES]
        acc = jnp.zeros((r, _LANES), dtype=vals.dtype)
        for s in range(max(0, j - k), min(nvreg, j + k + 1)):
            srcv = vals[:, s * _LANES:(s + 1) * _LANES]
            local = idxv - s * _LANES
            sel = (local >= 0) & (local < _LANES)
            g = jnp.take_along_axis(srcv, jnp.clip(local, 0, _LANES - 1), axis=1)
            acc = jnp.where(sel, g, acc)
        pieces.append(acc)
    return jnp.concatenate(pieces, axis=1)


def _warp_kernel(cols_ref, off_ref, nd_ref, r_ref, g_ref, b_ref,
                 or_ref, og_ref, ob_ref, gap_ref, *,
                 w: int, wp: int, rblock: int, gradient_threshold: float,
                 max_stretch: int, max_disp: int):
    nvreg = wp // _LANES
    # Bilinear displacement bound: IDENTICAL to the XLA path's
    # (ops/warp.py `bil_disp = max_disp + 128`) so fused and fallback
    # agree everywhere. Both deviate from the unclipped oracle only when a
    # gap-interpolated source lands further than max_disp+126 from its
    # column — possible only on near-empty rows with gaps far longer than
    # any real warp produces.
    k2 = _cdiv(max_disp + _LANES, _LANES)

    off = off_ref[:]
    nd = nd_ref[:]
    # Column indices come from memory, NOT broadcasted_iota: Mosaic's
    # ApplyVectorLayout crashes when iota-derived values feed the dynamic
    # vreg gather (vector_extract_strided_slice check failure).
    cols_i = cols_ref[:]
    cols = cols_i.astype(jnp.float32)

    dest = cols + off
    off_next = _shift_left(off, 1, 0.0)
    dest_next = _shift_left(dest, 1, _NEG_INF)
    nd_next = _shift_left(nd, 1, 0.0)

    in_row = cols_i < w - 1
    conn = (jnp.abs(off_next - off) < gradient_threshold) & in_row
    dl = dest
    dr = dest_next
    width = dr - dl
    safe_w = jnp.where(jnp.abs(width) < 1e-4, 1.0, width)
    mstart = jnp.floor(jnp.minimum(dl, dr))

    # Dynamic displacement window from the block's measured offset range
    # (padded lanes hold offset 0, which only widens the window to include
    # d = -1..0 — harmless).
    r_static = max_disp + 2
    valid_off = jnp.where(cols_i < w, off, 0.0)
    d_lo = jnp.maximum(
        jnp.floor(-jnp.max(valid_off) - 1.0).astype(jnp.int32), -r_static)
    d_hi = jnp.minimum(
        jnp.ceil(-jnp.min(valid_off)).astype(jnp.int32), r_static)

    # Connectivity is FOLDED into the z endpoints: disconnected segments get
    # z = -1e30, so `zz > zbest + 1e-6` can never fire for them (zbest init
    # -1.0, real nd in [0,1]) and winners are unchanged bit-for-bit. This
    # drops one plane from the rolled stack and two vector ops from every
    # window iteration. The i-bound checks stay — they guard the CYCLIC
    # aliasing of the rolled buffer, which poisoning cannot cover when
    # w == wp.
    poison = jnp.float32(_NEG_INF)
    zl_p = jnp.where(conn, nd, poison)
    zr_p = jnp.where(conn, nd_next, poison)
    packed = jnp.concatenate([dl, safe_w, zl_p, zr_p, mstart], axis=0)
    shift0 = jnp.mod(-d_lo, wp)
    packed = pltpu.roll(packed, shift0, axis=1)  # lane c holds segment c+d_lo

    def body(t, carry):
        seg, zbest, src = carry
        d = d_lo + t
        dl_t = seg[0 * rblock:1 * rblock]
        sw_t = seg[1 * rblock:2 * rblock]
        zl_t = seg[2 * rblock:3 * rblock]
        zr_t = seg[3 * rblock:4 * rblock]
        ms_t = seg[4 * rblock:5 * rblock]
        i = cols_i + d
        frac = (cols - dl_t) / sw_t
        zz = zl_t * (1.0 - frac) + zr_t * frac
        valid = ((i >= 0) & (i <= w - 2)
                 & (frac >= 0.0) & (frac < 1.0)
                 & (cols - ms_t < max_stretch))
        better = valid & (zz > zbest + 1e-6)
        zbest = jnp.where(better, zz, zbest)
        src = jnp.where(better, i.astype(jnp.float32) + frac, src)
        return pltpu.roll(seg, wp - 1, axis=1), zbest, src

    init = (packed, jnp.full((rblock, wp), -1.0, jnp.float32),
            jnp.full((rblock, wp), -1.0, jnp.float32))
    _, z, src = jax.lax.fori_loop(0, d_hi - d_lo + 1, body, init)

    filled = src >= 0.0
    gap = (~filled) & (cols_i < w)

    # Gap fill. Left border: nearest filled (log-step forward fill). Right
    # border: the reference's flipped-cummax = the row's rightmost filled
    # column (masked lane reductions).
    (l_src, l_z, l_col), has_l = _forward_fill((src, z, cols), filled, wp)
    rn = jnp.max(jnp.where(filled, cols, -1.0), axis=1, keepdims=True)
    at_rn = filled & (cols == rn)
    r_src = jnp.max(jnp.where(at_rn, src, -1.0), axis=1, keepdims=True)
    r_z = jnp.max(jnp.where(at_rn, z, -1.0), axis=1, keepdims=True)
    has_r = cols <= rn
    # Oracle gathers at clip(rn, 0): for empty rows that is column 0's
    # (unfilled) -1 values — matched by the -1 fill of the masked max.

    ld = cols - l_col
    rd = rn - cols
    total = jnp.maximum(ld + rd, 1.0)
    t = ld / total
    t = jnp.where(~has_l, 1.0, t)
    t = jnp.where(~has_r, 0.0, t)
    left_is_bg = l_z < r_z
    tb = jnp.where(left_is_bg, jnp.sqrt(t), 1.0 - jnp.sqrt(1.0 - t))
    gap_src = l_src * (1.0 - tb) + r_src * tb

    src = jnp.where(gap & (has_l | has_r), gap_src, src)
    bil = max_disp + _LANES - 2
    src = jnp.clip(src, cols - bil, cols + bil)
    src = jnp.clip(src, 0.0, w - 1.0)

    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w - 1)
    fr = src - i0.astype(jnp.float32)
    for ref, out_ref in ((r_ref, or_ref), (g_ref, og_ref), (b_ref, ob_ref)):
        # Color planes may arrive bfloat16 (half the HBM DMA traffic);
        # the lerp upcasts to f32 in VMEM and casts back on the store.
        plane = ref[:].astype(jnp.float32)
        s0 = _vreg_gather(plane, i0, k2, nvreg)
        s1 = _vreg_gather(plane, i1, k2, nvreg)
        out_ref[:] = (s0 * (1.0 - fr) + s1 * fr).astype(out_ref.dtype)
    gap_ref[:] = gap.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "w", "gradient_threshold", "max_stretch", "max_disp", "interpret"))
def warp_scanline(offset, nd, red, green, blue, *, w: int,
                  gradient_threshold: float, max_stretch: int, max_disp: int,
                  interpret: bool = False):
    """Fused exact forward warp over [N, W] row-planes (any offset sign).

    offset/nd/red/green/blue: [N, W] float32. Returns (r, g, b, gap) [N, W].
    """
    n = offset.shape[0]
    wp = _cdiv(w, _LANES) * _LANES
    rblock = 16
    npad = _cdiv(n, rblock) * rblock

    def pad(x, fill=0.0):
        return jnp.full((npad, wp), fill, x.dtype).at[:n, :w].set(x)

    cols = jnp.broadcast_to(jnp.arange(wp, dtype=jnp.int32), (rblock, wp))
    args = (cols, pad(offset), pad(nd), pad(red), pad(green), pad(blue))
    grid = (npad // rblock,)
    spec = pl.BlockSpec((rblock, wp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cols_spec = pl.BlockSpec((rblock, wp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    color_dt = red.dtype
    outs = pl.pallas_call(
        functools.partial(_warp_kernel, w=w, wp=wp, rblock=rblock,
                          gradient_threshold=gradient_threshold,
                          max_stretch=max_stretch, max_disp=max_disp),
        out_shape=tuple(jax.ShapeDtypeStruct((npad, wp), dt)
                        for dt in (color_dt, color_dt, color_dt,
                                   jnp.float32)),
        grid=grid,
        in_specs=[cols_spec] + [spec] * 5,
        out_specs=(spec,) * 4,
        interpret=interpret,
    )(*args)
    return tuple(o[:n, :w] for o in outs)
