"""Fused polylines scanline kernel (Pallas/Mosaic).

Single fused kernel for the TPU polylines renderer (see ops/polylines.py for
the algorithm derivation and the XLA twin used as oracle/fallback):

  * POSITIVE-offset group: winner at query s = FIRST slot whose reach
    (prefix max of segment right-endpoints) crosses s — windowed binary
    search, candidates swept upward.
  * NEGATIVE-offset group: winner = LAST slot whose left endpoint lies below
    s — the mirrored problem, solved natively right-to-left with a suffix
    min of segment left-endpoints and a downward candidate sweep (Mosaic has
    no lane-reverse, so no mirroring of arrays anywhere).
  * The S sub-sample sweeps reuse one search + one candidate-window gather
    per group; the group combine (max closeness) and the S-plane average run
    in-kernel, so the kernel emits only three [rows, W] color-sum planes —
    no sample-scale arrays ever reach HBM.

Everything is pixel-scale vector work: log-step lane shifts for prefix/suffix
extrema, per-vreg bounded dynamic gathers for indexed reads (warp_kernel
machinery), elementwise sweeps on ~15 vregs per row block at 1080p.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp_kernel import _cdiv, _shift_left, _shift_right, _vreg_gather

_LANES = 128
_NEG_INF = -1e30
_POS_INF = 1e30


def _prefix_max(x, wp):
    s = 1
    while s < wp:
        x = jnp.maximum(x, _shift_right(x, s, _NEG_INF))
        s *= 2
    return x


def _suffix_min(x, wp):
    s = 1
    while s < wp:
        x = jnp.minimum(x, _shift_left(x, s, _POS_INF))
        s *= 2
    return x


def _roll_right(v):
    pad = jnp.full((v.shape[0], 1), 0.0, v.dtype)
    return jnp.concatenate([pad, v[:, :-1]], axis=1)


def _poly_kernel(cols_hbm, x_hbm, coord_hbm, r_hbm, g_hbm, b_hbm,
                 orr_hbm, org_hbm, orb_hbm,
                 in_s, out_s, sems, *,
                 w: int, wp: int, cb: int, halo: int, rblock: int,
                 sharp: bool, samples: int, k_candidates: int,
                 max_disp: int):
    # Column blocking: each program solves columns [jb*cb, jb*cb+cb) using a
    # local window of `local` lanes around them, so the unrolled instruction
    # count is resolution-independent. Dynamic lane offsets are not
    # expressible as vector loads on TPU, so the window arrives via DMA
    # (inputs live in ANY/HBM space; in_s is a [6, rblock, local] VMEM
    # scratch, out_s a [rblock, local] staging buffer for the output slice).
    local = cb + 2 * halo
    nvreg = local // _LANES
    kwin = _cdiv(max_disp + k_candidates + _LANES, _LANES)
    hw = 0.45 if sharp else 0.0

    ib = pl.program_id(0)
    jb = pl.program_id(1)
    row0 = pl.multiple_of(ib * rblock, rblock)
    # cb and halo are multiples of 128, so the window start is lane-aligned;
    # the hint lets Mosaic slice the tiled HBM memref at a dynamic offset.
    win0 = pl.multiple_of(jnp.clip(jb * cb - halo, 0, wp - local), _LANES)
    off_in_win = pl.multiple_of(jb * cb - win0, _LANES)

    hbm_ins = (cols_hbm, x_hbm, coord_hbm, r_hbm, g_hbm, b_hbm)
    copies = [
        pltpu.make_async_copy(
            ref.at[pl.ds(row0, rblock), pl.ds(win0, local)],
            in_s.at[k], sems.at[k])
        for k, ref in enumerate(hbm_ins)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    cols_i = in_s[0].astype(jnp.int32)
    cols = cols_i.astype(jnp.float32)
    x = in_s[1]
    coord = in_s[2]
    cl = jnp.abs(coord)
    in_img = cols_i < w
    is_sent_l = cols_i == 0
    is_sent_r = cols_i == w
    # The window's first lane has no left neighbor in-window; its slot data is
    # garbage but it lies in the halo (never a winner for in-block queries) —
    # just keep it out of the reach extrema.
    bad_edge = (cols_i == win0) & (win0 > 0)

    def lgather(arr_local, global_idx):
        return _vreg_gather(arr_local,
                            jnp.clip(global_idx - win0, 0, local - 1),
                            kwin, nvreg)

    # Slot j: between[j] (point j-1 -> point j; sentinels at j=0 and j=w)
    # then within[j] (sharp only: flat-top of pixel j).
    x_prev = _roll_right(x)
    bx0 = jnp.where(is_sent_l, -1.0 * w, x_prev + hw)
    bx1 = jnp.where(is_sent_r, 2.0 * w,
                    jnp.where(in_img, x - hw, _NEG_INF))
    bx1 = jnp.where(bad_edge, _NEG_INF, bx1)

    rounds = max(1, math.ceil(math.log2(2 * max_disp + 2))) + 1

    def endpoints(member_pt):
        """Segment endpoint streams masked to one group's members."""
        m_prev = (cols_i < 1) | (_roll_right(member_pt.astype(jnp.float32))
                                 > 0.5)
        bmem = is_sent_l | is_sent_r | m_prev | (member_pt & in_img)
        b_ok = bmem & (bx1 > bx0) & (cols_i <= w)
        e_hi = jnp.where(b_ok, bx1, _NEG_INF)       # right endpoints
        e_lo = jnp.where(b_ok, bx0, _POS_INF)       # left endpoints
        if sharp:
            wm = member_pt & in_img
            e_hi = jnp.maximum(e_hi, jnp.where(wm, x + hw, _NEG_INF))
            e_lo = jnp.minimum(e_lo, jnp.where(wm, x - hw, _POS_INF))
        return e_hi, e_lo

    def search_up(e_hi):
        """First slot with prefix-max(e_hi) > col."""
        prefix_hi = _prefix_max(e_hi, local)
        lo = jnp.maximum(cols_i - max_disp, 0)
        hi = jnp.minimum(cols_i + max_disp, w)
        for _ in range(rounds):
            mid = (lo + hi) // 2
            v = lgather(prefix_hi, mid)
            go = v <= cols
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return jnp.clip(lo, 0, w)

    def search_dn(e_lo):
        """Last slot with suffix-min(e_lo) < col+1 = (first >= col+1) - 1."""
        suffix_lo = _suffix_min(e_lo, local)
        lo = jnp.maximum(cols_i - max_disp, 0)
        hi = jnp.minimum(cols_i + max_disp, w)
        for _ in range(rounds):
            mid = (lo + hi) // 2
            v = lgather(suffix_lo, mid)
            go = v < cols + 1.0
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return jnp.clip(lo - 1, 0, w)

    e_hi_p, _ = endpoints(coord >= 0.0)
    _, e_lo_n = endpoints(coord <= 0.0)
    idx_p = search_up(e_hi_p)
    idx_n = search_dn(e_lo_n)

    rr = in_s[3]
    gg = in_s[4]
    bb_ = in_s[5]

    def gather_pts(base, dks):
        out = {}
        for dk in dks:
            p = jnp.clip(base + dk, 0, w - 1)
            out[dk] = dict(
                x=lgather(x, p),
                cl=lgather(cl, p),
                co=lgather(coord, p),
                r=lgather(rr, p),
                g=lgather(gg, p),
                b=lgather(bb_, p),
            )
        return out

    pts_p = gather_pts(idx_p, range(-1, k_candidates))
    pts_n = gather_pts(idx_n, range(-k_candidates, 1))

    def iter_candidates(idx0, pts, upward: bool, member_sign: float):
        """Yield candidate segments in sweep order, built on the fly from the
        gathered point windows (no long-lived candidate tables: the selects
        are recomputed per sub-sample to keep VMEM pressure low)."""
        ks = range(k_candidates) if upward else range(0, -k_candidates, -1)
        for k in ks:
            slot = idx0 + k
            sl = slot == 0
            sr = slot == w
            pL, pR = pts[k - 1], pts[k]
            mL = (pL["co"] * member_sign >= 0.0)
            mR = (pR["co"] * member_sign >= 0.0)
            x0_b = jnp.where(sl, -1.0 * w, pL["x"] + hw)
            x1_b = jnp.where(sr, 2.0 * w, pR["x"] - hw)
            cl0_b = jnp.where(sl, 0.0, pL["cl"])
            cl1_b = jnp.where(sr, 0.0, pR["cl"])
            cL_b = tuple(jnp.where(sl, pR[ch], pL[ch])
                         for ch in ("r", "g", "b"))
            cR_b = tuple(jnp.where(sr, pL[ch], pR[ch])
                         for ch in ("r", "g", "b"))
            mem_b = (sl | sr | mL | mR) & (slot >= 0) & (slot <= w)
            between = (x0_b, x1_b, cl0_b, cl1_b, cL_b, cR_b, mem_b)
            if sharp:
                cw = tuple(pR[ch] for ch in ("r", "g", "b"))
                within = (pR["x"] - hw, pR["x"] + hw, pR["cl"], pR["cl"],
                          cw, cw, mR & (slot < w) & (slot >= 0))
                # upward activation: between then within; downward: reversed
                yield from ([between, within] if upward
                            else [within, between])
            else:
                yield between

    def sweep(idx0, pts, s_pos, upward: bool, member_sign: float):
        found = jnp.zeros_like(s_pos, dtype=bool)
        sx0 = jnp.zeros_like(s_pos)
        sx1 = jnp.ones_like(s_pos)
        scl0 = jnp.zeros_like(s_pos)
        scl1 = jnp.zeros_like(s_pos)
        scL = (jnp.zeros_like(s_pos),) * 3
        scR = (jnp.zeros_like(s_pos),) * 3
        for (x0, x1, cl0, cl1, cL, cR, mem) in iter_candidates(
                idx0, pts, upward, member_sign):
            # upward: first slot whose RIGHT end exceeds s;
            # downward: first slot whose LEFT end is below s.
            hit = mem & (x1 > x0) & ((x1 > s_pos) if upward else (x0 < s_pos))
            take = (~found) & hit
            sx0 = jnp.where(take, x0, sx0)
            sx1 = jnp.where(take, x1, sx1)
            scl0 = jnp.where(take, cl0, scl0)
            scl1 = jnp.where(take, cl1, scl1)
            scL = tuple(jnp.where(take, a, bb) for a, bb in zip(cL, scL))
            scR = tuple(jnp.where(take, a, bb) for a, bb in zip(cR, scR))
            found = found | hit
        denom = jnp.where(jnp.abs(sx1 - sx0) < 1e-9, 1.0, sx1 - sx0)
        ip = jnp.clip((s_pos - sx0) / denom, 0.0, 1.0)
        covered = found & (sx0 < s_pos) & (s_pos < sx1)
        closeness = scl0 * (1.0 - ip) + scl1 * ip
        color = tuple(a * (1.0 - ip) + bb * ip for a, bb in zip(scL, scR))
        fallback = scL
        return covered, closeness, color, fallback, found

    def t_body(t, acc):
        s_pos = cols + (t.astype(jnp.float32) + 0.5) / samples
        cov_p, cl_p, col_p, fb_p, fnd_p = sweep(idx_p, pts_p, s_pos, True,
                                                +1.0)
        cov_n, cl_n, col_n, fb_n, fnd_n = sweep(idx_n, pts_n, s_pos, False,
                                                -1.0)
        use_n = cov_n & (~cov_p | (cl_n > cl_p))
        neither = ~(cov_p | cov_n)
        out = []
        for j in range(3):
            v = jnp.where(use_n, col_n[j], col_p[j])
            v = jnp.where(neither, jnp.where(fnd_p, fb_p[j], fb_n[j]), v)
            out.append(acc[j] + v)
        return tuple(out)

    z = jnp.zeros_like(cols)
    acc = jax.lax.fori_loop(0, samples, t_body, (z, z, z))
    for k, (out_hbm, a) in enumerate(zip((orr_hbm, org_hbm, orb_hbm), acc)):
        out_s[:] = a
        cp = pltpu.make_async_copy(
            out_s.at[:, pl.ds(off_in_win, cb)],
            out_hbm.at[pl.ds(row0, rblock), pl.ds(jb * cb, cb)],
            sems.at[k])
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=(
    "w", "sharp", "samples", "k_candidates", "max_disp", "interpret"))
def polylines_scanline(x, coord, red, green, blue, *, w: int,
                       sharp: bool, samples: int, k_candidates: int,
                       max_disp: int, interpret: bool = False):
    """Fused polylines over [N, W] row-planes.

    x: warped point positions; coord: signed depth offsets (closeness=|coord|,
    group split by sign). Returns (r, g, b) color SUMS over the S sub-samples
    (divide by `samples` outside), each [N, W].
    """
    n = x.shape[0]
    rblock = 8
    npad = _cdiv(n, rblock) * rblock
    nblocks = npad // rblock

    # Column blocking: per-program instruction count is set by the local
    # window (cb + 2*halo), independent of image width; larger blocks
    # amortize the per-program DMA latency. Small images use one block.
    halo = _cdiv(max_disp + k_candidates + 2, _LANES) * _LANES + _LANES
    cb = min(1024, _cdiv(w + 1, _LANES) * _LANES)
    wp = _cdiv(w + 1, cb) * cb          # covers the right-sentinel slot at w
    while wp < cb + 2 * halo:
        wp += cb
    ncb = wp // cb

    def pad(v, fill=0.0):
        return jnp.full((npad, wp), fill, jnp.float32).at[:n, :w].set(v)

    cols = jnp.broadcast_to(jnp.arange(wp, dtype=jnp.float32), (npad, wp))
    args = (cols, pad(x, 3.0 * w), pad(coord), pad(red), pad(green),
            pad(blue))

    local = cb + 2 * halo
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    outs = pl.pallas_call(
        functools.partial(_poly_kernel, w=w, wp=wp, cb=cb, halo=halo,
                          rblock=rblock, sharp=sharp, samples=samples,
                          k_candidates=k_candidates, max_disp=max_disp),
        out_shape=tuple(jax.ShapeDtypeStruct((npad, wp), jnp.float32)
                        for _ in range(3)),
        grid=(nblocks, ncb),
        in_specs=[any_spec] * 6,
        out_specs=(any_spec,) * 3,
        scratch_shapes=[pltpu.VMEM((6, rblock, local), jnp.float32),
                        pltpu.VMEM((rblock, local), jnp.float32),
                        pltpu.SemaphoreType.DMA((6,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    return tuple(o[:n, :w] for o in outs)
