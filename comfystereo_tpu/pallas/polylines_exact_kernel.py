"""Fused exact-polylines winner scan (Pallas/Mosaic).

Companion to ops/polylines_exact.py: the piece geometry (point sort, rank
search, breakpoints) is XLA work; this kernel runs the expensive part — for
every output pixel's K sub-interval centers, scan the candidate segments
owned by source columns col + d over a dynamic window in ascending source
order, keeping the reference's strict-max interpolated closeness plus the
lowest-x0 fallback, and accumulate winner-color * significance into the
0.5-biased accumulator (reference stereoimage_generation.py:1947-1991).

Identical f32 expression forms to the XLA path and the loop oracle, so the
kernel preserves uint8 bit-parity.

Vectorization: rows on sublanes, columns on lanes. The five per-column
planes (x, cl, r, g, b) are packed along sublanes; one dynamic pltpu.roll
positions the stack at the window start and each iteration advances with a
static 1-lane cyclic roll (carrying only the packed stack — per-piece
accumulators live in VMEM scratch and are mutated in place). The window's
trip count comes from the row-block's measured (coord + separation) range.

Round-3 lever: the per-piece work inside the window walk is predicated on
the row-block's MEASURED piece demand (valid_k is monotone in k, so the
per-pixel piece count is val.sum and the block's bound its max). Flat
depth regions need only 2-3 of the max_pieces=12 sub-intervals; pieces a
block never reaches are a skipped pl.when branch, cutting the dominant
per-step cost by the same factor. Predication cannot change results:
piece k >= kmax has val==0 for every pixel of the block, so its
contribution is already gated to zero in the finalize.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _scan_kernel(kmax_ref, cols_ref, x_ref, cl_ref, r_ref, g_ref, b_ref,
                 cen_ref, sig_ref, val_ref, ar_ref, ag_ref, ab_ref,
                 or_ref, og_ref, ob_ref,
                 bcl_ref, bcol_ref, nact_ref, fbx_ref, fbcol_ref, *,
                 w: int, wp: int, rblock: int, k_pieces: int, k0: int,
                 sharp: bool, max_disp: int, finalize: bool):
    eps = jnp.float32(1e-7)
    hw = jnp.float32(0.45 if sharp else 0.0)
    inf = jnp.float32(1e30)
    cols_i = cols_ref[:]
    cols = cols_i.astype(jnp.float32)
    in_img = cols_i < w

    x = x_ref[:]
    cl = cl_ref[:]
    sent_l = jnp.float32(-1.0 * w)
    sent_r = jnp.float32(2.0 * w)

    # This chunk's live piece count: the block demands kmax pieces total,
    # of which this chunk (a VMEM-driven split at 4K widths) owns
    # [k0, k0 + k_pieces).
    khi = jnp.clip(kmax_ref[pl.program_id(0), 0] - k0, 0, k_pieces)

    # Init accumulators: best_cl=-eps, n_act=0, fb_x0=inf, colors 0.
    for k in range(k_pieces):
        bcl_ref[k * rblock:(k + 1) * rblock] = jnp.full((rblock, wp), -eps)
        nact_ref[k * rblock:(k + 1) * rblock] = jnp.zeros((rblock, wp),
                                                          jnp.float32)
        fbx_ref[k * rblock:(k + 1) * rblock] = jnp.full((rblock, wp), inf)
        for ch in range(3):
            off = (k * 3 + ch) * rblock
            bcol_ref[off:off + rblock] = jnp.zeros((rblock, wp), jnp.float32)
            fbcol_ref[off:off + rblock] = jnp.zeros((rblock, wp), jnp.float32)

    def consider_all_pieces(x0, x1, cl0, cl1, col_l, col_r, cand_ok, flat):
        """col_l/col_r: 3-tuples of [rblock, wp] channel planes."""
        denom = x1 - x0
        safe = jnp.where(denom == 0.0, 1.0, denom)
        # Static unroll, each piece predicated on the block's measured
        # demand: every ref address stays static (a fori_loop with
        # dynamic-offset scratch stores blows Mosaic's scoped-vmem stack)
        # while pieces the block never reaches are a skipped branch.
        for k in range(k_pieces):
            @pl.when(khi > k)
            def _piece(k=k):
                center = cen_ref[k]
                active = cand_ok & (x0 < center) & (x1 >= center)
                ip = (center - x0) / safe
                clp = (1.0 - ip) * cl0 + ip * cl1
                qual = active & (ip > 0.0) & (ip < 1.0)
                sl = slice(k * rblock, (k + 1) * rblock)
                better = qual & (clp > bcl_ref[sl])
                bcl_ref[sl] = jnp.where(better, clp, bcl_ref[sl])
                fb_take = active & (x0 < fbx_ref[sl])
                fbx_ref[sl] = jnp.where(fb_take, x0, fbx_ref[sl])
                nact_ref[sl] = nact_ref[sl] + active.astype(jnp.float32)
                for ch in range(3):
                    cval = col_l[ch] if flat else (
                        col_l[ch] * (1.0 - ip) + col_r[ch] * ip)
                    co = slice((k * 3 + ch) * rblock,
                               (k * 3 + ch + 1) * rblock)
                    bcol_ref[co] = jnp.where(better, cval, bcol_ref[co])
                    fbcol_ref[co] = jnp.where(fb_take, cval, fbcol_ref[co])

    # Sentinel segments (reference :1920, :1936): evaluated once.
    img = (r_ref[:], g_ref[:], b_ref[:])
    first_x = jnp.min(jnp.where(cols_i == 0, x, inf), axis=1,
                      keepdims=True) - hw
    last_x = jnp.max(jnp.where(cols_i == w - 1, x, -inf), axis=1,
                     keepdims=True) + hw
    cl_first = jnp.max(jnp.where(cols_i == 0, cl, -inf), axis=1,
                       keepdims=True)
    cl_last = jnp.max(jnp.where(cols_i == w - 1, cl, -inf), axis=1,
                      keepdims=True)
    img_first = tuple(jnp.max(jnp.where(cols_i == 0, p, -inf), axis=1,
                              keepdims=True) + jnp.zeros((rblock, wp))
                      for p in img)
    img_last = tuple(jnp.max(jnp.where(cols_i == w - 1, p, -inf), axis=1,
                             keepdims=True) + jnp.zeros((rblock, wp))
                     for p in img)
    ones = jnp.ones((rblock, wp), bool)
    zeros = jnp.zeros((rblock, wp), jnp.float32)
    consider_all_pieces(jnp.full((rblock, wp), sent_l),
                        first_x + zeros, zeros, cl_first + zeros,
                        img_first, img_first, ones, True)
    consider_all_pieces(last_x + zeros,
                        jnp.full((rblock, wp), sent_r),
                        cl_last + zeros, zeros,
                        img_last, img_last, ones, True)

    # Dynamic window from the block's measured m = x - (col + 0.5) range.
    m = jnp.where(in_img, x - (cols + 0.5), 0.0)
    r_static = max_disp + 4
    d_lo = jnp.maximum(jnp.floor(-jnp.max(m)).astype(jnp.int32) - 2,
                       -r_static)
    d_hi = jnp.minimum(jnp.ceil(-jnp.min(m)).astype(jnp.int32) + 2, r_static)

    packed = jnp.concatenate([x, cl, img[0], img[1], img[2]], axis=0)
    packed = pltpu.roll(packed, jnp.mod(-d_lo, wp), axis=1)

    def body(t, cur):
        nxt = pltpu.roll(cur, wp - 1, axis=1)
        d = d_lo + t
        cp = cols_i + d
        x_c = cur[0 * rblock:1 * rblock]
        cl_c = cur[1 * rblock:2 * rblock]
        img_c = tuple(cur[(2 + ch) * rblock:(3 + ch) * rblock]
                      for ch in range(3))
        x_n = nxt[0 * rblock:1 * rblock]
        cl_n = nxt[1 * rblock:2 * rblock]
        img_n = tuple(nxt[(2 + ch) * rblock:(3 + ch) * rblock]
                      for ch in range(3))
        if sharp:
            consider_all_pieces(x_c - hw, x_c + hw, cl_c, cl_c,
                                img_c, img_c,
                                (cp >= 0) & (cp <= w - 1), True)
        consider_all_pieces(x_c + hw, x_n - hw, cl_c, cl_n, img_c, img_n,
                            (cp >= 0) & (cp <= w - 2), False)
        return nxt

    # A block whose chunk owns no live pieces skips the walk entirely.
    trips = jnp.where(khi > 0, d_hi - d_lo + 1, 0)
    packed = jax.lax.fori_loop(0, trips, body, packed)
    del packed

    # Resolve winners and integrate, continuing the carried accumulator
    # (sequential piece order is preserved across piece-chunked calls so
    # uint8 bit-parity survives the VMEM-driven split at 4K widths).
    acc = [ar_ref[:], ag_ref[:], ab_ref[:]]
    for k in range(k_pieces):
        sl = slice(k * rblock, (k + 1) * rblock)
        use_best = (bcl_ref[sl] > -eps) & (nact_ref[sl] != 1.0)
        valid = val_ref[k] > 0.5
        sig = sig_ref[k]
        for ch in range(3):
            co = slice((k * 3 + ch) * rblock, (k * 3 + ch + 1) * rblock)
            color = jnp.where(use_best, bcol_ref[co], fbcol_ref[co])
            acc[ch] = acc[ch] + jnp.where(valid, color * sig, 0.0)
    for ch, out_ref in enumerate((or_ref, og_ref, ob_ref)):
        if finalize:
            out_ref[:] = jnp.trunc(jnp.clip(acc[ch], 0.0, 255.0))
        else:
            out_ref[:] = acc[ch]


@functools.partial(jax.jit, static_argnames=(
    "w", "k_pieces", "sharp", "max_disp", "interpret"))
def polylines_exact_scanline(x, cl, red, green, blue, centers, sigs, valids,
                             *, w: int, k_pieces: int, sharp: bool,
                             max_disp: int, interpret: bool = False):
    """x/cl/red/green/blue: [N, W] f32; centers/sigs/valids: [K, N, W] f32.
    Returns (r, g, b) [N, W] uint8-valued f32."""
    n = x.shape[0]
    wp = _cdiv(w, _LANES) * _LANES
    rblock = 8
    # VMEM budget model (validated against Mosaic's scoped-vmem accounting
    # on v5e): fixed = double-buffered per-row blocks (cols + 5 planes +
    # 3 accs + 3 outs), per-piece = scratch (9 planes) + double-buffered
    # cen/sig/val blocks; Mosaic's real usage runs ~1.16x the raw estimate,
    # so budget against 16 MB / 1.2. Pieces are chunked across calls,
    # threading the accumulator so the sequential piece order (and thus
    # uint8 bit-parity) is preserved.
    fixed = 12 * rblock * wp * 8
    per_piece = 9 * rblock * wp * 4 + 3 * rblock * wp * 8
    budget = int((16 << 20) / 1.2)
    k_chunk = max(1, min(k_pieces, (budget - fixed) // per_piece))
    npad = _cdiv(n, rblock) * rblock

    def pad2(v, fill=0.0):
        return jnp.full((npad, wp), fill, v.dtype).at[:n, :w].set(v)

    def pad3(v, fill=0.0):
        # [K, N, W] -> [K, npad, wp]; a (k, rblock, wp) block at row-index i
        # covers rows [i*rblock, ...) of every piece k.
        out = jnp.full((v.shape[0], npad, wp), fill, v.dtype)
        return out.at[:, :n, :w].set(v)

    cols = jnp.broadcast_to(jnp.arange(wp, dtype=jnp.int32), (rblock, wp))
    cen = pad3(centers)
    sig = pad3(sigs)
    val = pad3(valids)
    planes = (pad2(x), pad2(cl), pad2(red), pad2(green), pad2(blue))

    # Measured piece demand per row-block: valid_k is monotone in k (sorted
    # breakpoints), so the per-pixel piece count is a sum over k and the
    # block's bound its max. Pieces beyond a block's demand are skipped in
    # the kernel's predicated inner loop (padding rows demand 0 pieces).
    counts = val.sum(axis=0)  # [npad, wp]
    kmax = counts.reshape(npad // rblock, rblock * wp).max(axis=1)
    kmax = jnp.ceil(kmax).astype(jnp.int32).reshape(-1, 1)

    grid = (npad // rblock,)
    spec = pl.BlockSpec((rblock, wp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cols_spec = pl.BlockSpec((rblock, wp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    # Whole-array SMEM block (Mosaic wants block dims divisible by (8, 128)
    # or equal to the array's); indexed by program_id in-kernel.
    kmax_spec = pl.BlockSpec((npad // rblock, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)

    accs = tuple(jnp.full((npad, wp), 0.5, jnp.float32) for _ in range(3))
    for k0 in range(0, k_pieces, k_chunk):
        kc = min(k_chunk, k_pieces - k0)
        finalize = k0 + kc >= k_pieces
        kspec = pl.BlockSpec((kc, rblock, wp), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        kernel = functools.partial(_scan_kernel, w=w, wp=wp, rblock=rblock,
                                   k_pieces=kc, k0=k0, sharp=sharp,
                                   max_disp=max_disp, finalize=finalize)
        accs = pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((npad, wp), jnp.float32)
                            for _ in range(3)),
            grid=grid,
            in_specs=[kmax_spec, cols_spec] + [spec] * 5 + [kspec] * 3
                     + [spec] * 3,
            out_specs=(spec,) * 3,
            scratch_shapes=[
                pltpu.VMEM((kc * rblock, wp), jnp.float32),      # best_cl
                pltpu.VMEM((kc * 3 * rblock, wp), jnp.float32),  # best col
                pltpu.VMEM((kc * rblock, wp), jnp.float32),      # n_act
                pltpu.VMEM((kc * rblock, wp), jnp.float32),      # fb_x0
                pltpu.VMEM((kc * 3 * rblock, wp), jnp.float32),  # fb col
            ],
            interpret=interpret,
        )(kmax, cols, *planes, cen[k0:k0 + kc], sig[k0:k0 + kc],
          val[k0:k0 + kc], *accs)
    return tuple(o[:n, :w] for o in accs)
