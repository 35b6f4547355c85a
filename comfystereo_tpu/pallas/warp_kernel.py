"""Fused scanline forward-warp kernel (Pallas/Mosaic).

The entire monotone warp (ops/warp.py docstring) for a block of rows runs in
one kernel with every intermediate resident in VMEM:

    dest/connectivity -> prefix-max reach -> windowed binary search
    -> coverage/frac/z -> gap border fills -> sqrt-bias gap interp
    -> bilinear sample

Vectorization strategy: rows live on sublanes, image columns on lanes.
  * neighbor access / prefix-max / border fills: log-step lane shifts
    (static concat+slice, no gather);
  * value-at-winner-index and bilinear taps: bounded-displacement vreg
    gathers — for each 128-lane output vreg, gather from the (2K+1)
    neighboring source vregs and mask-select (Mosaic's fast per-sublane
    dynamic gather works within a single vreg);
  * the binary search runs in a +-(max_disp) window, log2 rounds.

The XLA-composed implementation in ops/warp.py keeps identical semantics and
serves as the non-TPU fallback and the test oracle for this kernel.
"""
from __future__ import annotations

import functools
import math

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


def _prefix_max(x, wp):
    s = 1
    while s < wp:
        x = jnp.maximum(x, _shift_right(x, s, _NEG_INF))
        s *= 2
    return x


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


def _backward_fill(values, has, wp):
    s = 1
    while s < wp:
        sh = [_shift_left(v, s, 0.0) for v in values]
        sh_has = _shift_left(has.astype(jnp.float32), s, 0.0) > 0.5
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
                 w: int, wp: int, gradient_threshold: float,
                 max_stretch: int, max_disp: int):
    nvreg = wp // _LANES
    k = _cdiv(max_disp + _LANES, _LANES)
    k2 = _cdiv(max_disp + 2 * _LANES, _LANES)

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

    conn = (jnp.abs(off_next - off) < gradient_threshold) & (cols_i < w - 1)
    reach = jnp.where(conn, jnp.maximum(dest, dest_next), _NEG_INF)
    prefix = _prefix_max(reach, wp)

    # Windowed binary search: idx(c) = min{i : prefix[i] > c}, i in [0, w-2].
    lo = jnp.maximum(cols_i - max_disp, 0)
    hi = jnp.minimum(cols_i + max_disp, w - 1)
    rounds = max(1, math.ceil(math.log2(2 * max_disp + 2))) + 1
    for _ in range(rounds):
        mid = (lo + hi) // 2
        v = _vreg_gather(prefix, jnp.clip(mid, 0, w - 2), k, nvreg)
        go = v <= cols
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    pv = _vreg_gather(prefix, jnp.clip(lo, 0, w - 2), k, nvreg)
    found = (lo <= w - 2) & (pv > cols)
    idx = jnp.minimum(lo, w - 2)

    dl = _vreg_gather(dest, idx, k, nvreg)
    dr = _vreg_gather(dest_next, idx, k, nvreg)
    ndl = _vreg_gather(nd, idx, k, nvreg)
    ndr = _vreg_gather(nd_next, idx, k, nvreg)

    width = dr - dl
    safe_w = jnp.where(jnp.abs(width) < 1e-4, 1.0, width)
    frac = (cols - dl) / safe_w
    covered = found & (frac >= 0.0) & (frac < 1.0)
    stretch_ok = (cols - jnp.floor(jnp.minimum(dl, dr))) < max_stretch
    filled = covered & stretch_ok & (cols_i < w)

    src = idx.astype(jnp.float32) + frac
    z = ndl * (1.0 - frac) + ndr * frac
    gap = (~filled) & (cols_i < w)

    # Gap fill: nearest-border src/z/col via log-step fills.
    (l_src, l_z, l_col), has_l = _forward_fill((src, z, cols), filled, wp)
    (r_src, r_z, r_col), has_r = _backward_fill((src, z, cols), filled, wp)
    ld = cols - l_col
    rd = r_col - cols
    total = jnp.maximum(ld + rd, 1.0)
    t = ld / total
    t = jnp.where(~has_l, 1.0, t)
    t = jnp.where(~has_r, 0.0, t)
    t = jnp.clip(t, 0.0, 1.0)
    left_is_bg = l_z < r_z
    tb = jnp.where(left_is_bg, jnp.sqrt(t), 1.0 - jnp.sqrt(1.0 - t))
    gap_src = l_src * (1.0 - tb) + r_src * tb

    src = jnp.where(gap & (has_l | has_r), gap_src, src)
    bil = max_disp + 2 * _LANES - 2
    src = jnp.clip(src, cols - bil, cols + bil)
    src = jnp.clip(src, 0.0, w - 1.0)

    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w - 1)
    fr = src - i0.astype(jnp.float32)
    for ref, out_ref in ((r_ref, or_ref), (g_ref, og_ref), (b_ref, ob_ref)):
        plane = ref[:]
        s0 = _vreg_gather(plane, i0, k2, nvreg)
        s1 = _vreg_gather(plane, i1, k2, nvreg)
        out_ref[:] = s0 * (1.0 - fr) + s1 * fr
    gap_ref[:] = gap.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "w", "gradient_threshold", "max_stretch", "max_disp", "interpret"))
def warp_scanline(offset, nd, red, green, blue, *, w: int,
                  gradient_threshold: float, max_stretch: int, max_disp: int,
                  interpret: bool = False):
    """Fused forward warp over [N, W] row-planes (monotone, divergence>=0).

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
    outs = pl.pallas_call(
        functools.partial(_warp_kernel, w=w, wp=wp,
                          gradient_threshold=gradient_threshold,
                          max_stretch=max_stretch, max_disp=max_disp),
        out_shape=tuple(jax.ShapeDtypeStruct((npad, wp), jnp.float32)
                        for _ in range(4)),
        grid=grid,
        in_specs=[cols_spec] + [spec] * 5,
        out_specs=(spec,) * 4,
        interpret=interpret,
    )(*args)
    return tuple(o[:n, :w] for o in outs)
