"""Fused exact-polylines renderer (Pallas/Mosaic) — geometry AND winner scan.

Companion to ops/polylines_exact.py. The kernel reproduces the reference's
per-pixel exact integration (stereoimage_generation.py:1947-1991): per output
pixel, breakpoints are the sorted warped point positions inside [col, col+1);
at each (epsilon-shrunk) sub-interval's center it picks, among the ACTIVE
segments (x0 < center <= x1), the one with maximum interpolated closeness
(strict improvement, 0 < ip < 1, lowest-x0 fallback), and accumulates
color(center) * significance into the 0.5-biased accumulator.

Identical f32 expression forms to the XLA path and the loop oracle, so the
kernel preserves uint8 bit-parity.

Round-3 redesign: profiling showed the XLA-side piece geometry (a global
jnp.sort per row + windowed rank search + 13 bounded gathers) was ~75% of
exact-mode wall time (28.5 of 34 ms at 1080p, 135 of 174 ms at 4K on v5e).
The geometry is now computed IN-KERNEL with no sort at all:

  WALK 1 (breakpoint collect): sweep the candidate window (trimmed to the
  landing-point range — one lane of margin), keeping the K smallest
  points >= col in sorted order via a K-slot bubble insert. This is
  exactly the information the global sort provided: sorted breakpoints
  q0 .. q0+K for each pixel. (The sort's q0-1 entry — the nearest point
  BELOW col — is never needed: it is < col by construction, so piece 0's
  start max(col, xq)+eps is col+eps bit-identically.) Sortedness comes
  from the insert, so visit order is irrelevant; the candidate window
  covers every point that can land in [col, col+1) (the measured m-range
  interval property). In SOFT mode a cheap counting pre-walk (WALK 0)
  measures the tile's max piece demand first and the bubble depth is
  bucketed on it — flat regions insert into 4 slots instead of K
  (A/B: -15% at 1080p; in sharp mode, where every source contributes two
  points and demand rarely sits below the buckets, the pre-walk was a
  measured net loss and is skipped).

  Per-piece work everywhere downstream (piece geometry, walk 2, and the
  slots a tile never reaches) is predicated on the measured demand via
  pl.when — skipped pieces are provably zero-contribution.

  Pieces (centers/sigs/valids) are then built in VMEM with the oracle's
  expressions, and WALK 2 runs the winner scan over the same window.

Vectorization: rows on sublanes, columns on lanes. Walk 1 rolls only the
point plane; walk 2 rolls the packed (x, cl, rgb24) stack. One dynamic
pltpu.roll positions each at the window start; each iteration advances with
a static 1-lane cyclic roll. Per-piece work in walk 2 is PREDICATED on the
tile's measured piece demand (computed from the collected slots — pieces a
tile never reaches are a skipped pl.when branch; their val is 0 so the
finalize already gates them to zero).

Round-4 redesign (DEFERRED COLORS): walk 2 used to blend + select 3 color
channels per piece per candidate (~40% of its op count). Colors are
uint8-valued f32 by contract (the dispatcher feeds uint8-derived planes),
so the 3 channels pack EXACTLY into one f32 mantissa (r*65536 + g*256 + b
< 2^24) and the walk now tracks only the winner's IDENTITY per piece —
(packed_left, packed_right, ip) for both the best and the fallback — via
3 selects instead of 3 blends + 6 selects, and the rolled source stack
shrinks from 5 planes to 3. The color value is reconstructed ONCE per
piece after the walk with the oracle's own expression
col_l*(1-ip) + col_r*ip on the exactly-unpacked integers, so uint8
bit-parity is preserved (flat candidates store ip = 0, which reproduces
the oracle's cval = col_l exactly: (1-0)*l + 0*r = l for finite r).
Two more exactness-preserving cuts ride along:
  * cand_ok is folded into the operands (x0 poisoned to 1e30 when the
    source column is out of range) — active = (x0 < center) & (x1 >=
    center) then needs no per-piece AND;
  * active implies x0 < center <= x1, hence denom = x1 - x0 > 0 and
    ip = (center - x0)/denom > 0 (f32 subtraction of distinct same-sign
    reachable values cannot round to zero here, and every reachable
    numerator/denominator ratio stays far above the subnormal cliff), so
    qual drops its ip > 0 compare and the denom == 0 safety select;
    inactive lanes may compute inf/nan ip but only feed selects whose
    predicates are already false.

Round-4 walk-2 redesign (SUB-BLOCKED WINDOWS + HOISTED DEMAND BUCKETS):
trip count and piece demand are content-local, but round 3 paid the
tile-global worst case everywhere. Walk 2 now runs per column sub-block
(384/256 lanes): each block derives its own d-window from the m range
over its halo'd source window and its own piece-demand bound from the
collected slots. The demand bound selects one of a few STATIC piece-count
buckets via a loop-invariant `pl.when` wrapped around the whole trip
loop, whose piece loop is unpredicated — measured: per-trip per-piece
predication at 128-lane blocks was 2x SLOWER than the global walk
(hundreds of scalar branches per trip), while hoisted buckets at 3-vreg
blocks cut 1080p noise/fold-heavy ~1.7x and smooth ~1.2x. Bit-parity is
preserved because widening a window or piece bound only adds candidates
that fail the activity checks, and over-processed pieces (between a
pixel's demand and its block's bucket cap, or beyond the global khi) are
zero-contribution via the val plane / never resolved.

COLUMN TILING: inputs live in ANY/HBM space and each program DMAs a
(cb + 2*halo)-lane window into VMEM scratch, so per-piece accumulators are
only cb lanes wide and every piece fits in one pass at any real resolution.
Narrow images (<= 2048 px) keep the single-tile layout (halo = 0, cyclic-
roll aliasing guarded by the candidate i-bound checks); tiles with halo > 0
never alias because |d| <= max_disp + 4 < halo.
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


def _scan_kernel(cols_hbm, sent_hbm, x_hbm, cl_hbm, pk_hbm,
                 ar_hbm, ag_hbm, ab_hbm, or_hbm, og_hbm, ob_hbm,
                 src_s, sent_s, astg_s, acc_s, ostg_s, slots_ref, cen_s,
                 sig_s, val_s, bcl_ref, bid_ref, fbx_ref, fbid_ref, sems,
                 osems, *,
                 w: int, cb: int, halo: int, rblock: int, k_total: int,
                 k_pieces: int, k0: int, sharp: bool, max_disp: int,
                 finalize: bool, ncb_grid: int, nprog: int):
    eps = jnp.float32(1e-7)
    hw = jnp.float32(0.45 if sharp else 0.0)
    inf = jnp.float32(1e30)
    local = cb + 2 * halo
    o0 = halo  # static lane offset of the output columns in the window

    ib = pl.program_id(0)
    jb = pl.program_id(1)
    row0 = pl.multiple_of(ib * rblock, rblock)
    # Source planes are halo-padded (col c lives at lane halo + c), so the
    # window for output cols [jb*cb, ...) starts at padded lane jb*cb; the
    # output-aligned arrays (acc/out) use the same offset.
    col0 = pl.multiple_of(jb * cb, _LANES)

    # ---- Double-buffered input DMA. ------------------------------------
    # VMEM scratch persists across grid programs, so program pid starts
    # program pid+1's input copies into the OTHER slot right after waiting
    # its own — the next program's windows stream from HBM concurrently
    # with this program's walks, and its wait is a no-op semaphore
    # decrement. Wait descriptors are reconstructed from pid (identical
    # src/dst/semaphore to what the previous program started).
    pid = ib * ncb_grid + jb
    even = jax.lax.rem(pid, 2) == 0

    def in_copies(pid_t, si):
        ib_t = pid_t // ncb_grid
        r0 = pl.multiple_of(ib_t * rblock, rblock)
        c0 = pl.multiple_of((pid_t - ib_t * ncb_grid) * cb, _LANES)
        cps = [pltpu.make_async_copy(
            cols_hbm.at[pl.ds(0, rblock), pl.ds(c0, local)],
            src_s.at[si, 0], sems.at[si, 0])]
        for k, ref in enumerate((x_hbm, cl_hbm, pk_hbm), start=1):
            cps.append(pltpu.make_async_copy(
                ref.at[pl.ds(r0, rblock), pl.ds(c0, local)],
                src_s.at[si, k], sems.at[si, k]))
        cps.append(pltpu.make_async_copy(
            sent_hbm.at[pl.ds(r0, rblock), :], sent_s.at[si],
            sems.at[si, 4]))
        for i, ref in enumerate((ar_hbm, ag_hbm, ab_hbm)):
            cps.append(pltpu.make_async_copy(
                ref.at[pl.ds(r0, rblock), pl.ds(c0, cb)],
                astg_s.at[si, i], sems.at[si, 5 + i]))
        return cps

    if nprog == 1:
        for c in in_copies(pid, 0):
            c.start()
        for c in in_copies(pid, 0):
            c.wait()
    else:
        @pl.when(pid == 0)
        def _prime():
            for c in in_copies(pid, 0):
                c.start()

        @pl.when(even)
        def _wait0():
            for c in in_copies(pid, 0):
                c.wait()

        @pl.when(jnp.logical_not(even))
        def _wait1():
            for c in in_copies(pid, 1):
                c.wait()

        @pl.when(even & (pid + 1 < nprog))
        def _prefetch1():
            for c in in_copies(pid + 1, 1):
                c.start()

        @pl.when(jnp.logical_not(even) & (pid + 1 < nprog))
        def _prefetch0():
            for c in in_copies(pid + 1, 0):
                c.start()

    # Slot reads are indexed DYNAMICALLY on the parity (a VMEM address
    # computation), never touching the other slot — the slot an in-flight
    # prefetch DMA is concurrently writing is not read at all. (A previous
    # revision read both slots and lane-selected; that relied on the select
    # discarding the racy arm, which only holds for a true lane-wise
    # select lowering.)
    slot = jax.lax.rem(pid, 2)
    win_cols = src_s[slot, 0]  # global col ids (halo lanes < 0)
    x = src_s[slot, 1]
    cl = src_s[slot, 2]
    pk = src_s[slot, 3]        # rgb24-packed colors
    sent_v = sent_s[slot]
    for ch in range(3):
        acc_s[ch] = astg_s[slot, ch]
    out_colsf = win_cols[:, o0:o0 + cb]
    out_cols = out_colsf.astype(jnp.int32)
    colp1 = out_colsf + 1.0

    # Dynamic window from the tile's measured m = x - (col + 0.5) range
    # (halo columns included — they can only widen the window, never change
    # results: out-of-range candidates fail the activity checks).
    in_src = (win_cols >= 0.0) & (win_cols < float(w))
    m = jnp.where(in_src, x - (win_cols + 0.5), 0.0)
    r_static = max_disp + 4
    d_lo = jnp.maximum(jnp.floor(-jnp.max(m)).astype(jnp.int32) - 2,
                       -r_static)
    d_hi = jnp.minimum(jnp.ceil(-jnp.min(m)).astype(jnp.int32) + 2, r_static)
    trips = d_hi - d_lo + 1
    shift0 = jnp.mod(-d_lo, local)
    # Walks 0/1 only need points LANDING in [col, col+1): a landing point
    # pv from source cp has d = cp - col in [-m-0.5, -m+0.5], so one lane
    # of margin suffices (the winner scan's extra margin covers segments
    # whose far endpoint is the landing one).
    d_lo1 = d_lo + 1
    trips1 = jnp.maximum(trips - 2, 0)
    shift1 = jnp.mod(-d_lo1, local)

    xroll = pltpu.roll(x, shift1, axis=1)

    # ---- WALK 1: collect each pixel's breakpoints. ---------------------
    # slots[j] = (j+1)-th smallest visited point >= col (init +inf).
    for j in range(k_total):
        slots_ref[j * rblock:(j + 1) * rblock] = jnp.full((rblock, cb), inf)

    def run_walk1(cap):
        def body1(t, cur):
            d = d_lo1 + t
            cp = out_cols + d
            okc = (cp >= 0) & (cp <= w - 1)
            xv = cur[:, o0:o0 + cb]
            pvs = (xv - hw, xv + hw) if sharp else (xv,)
            for pv in pvs:
                carryv = jnp.where(okc & (pv >= out_colsf), pv, inf)
                for j in range(cap):
                    sl = slice(j * rblock, (j + 1) * rblock)
                    s = slots_ref[sl]
                    slots_ref[sl] = jnp.minimum(s, carryv)
                    carryv = jnp.maximum(s, carryv)
            return pltpu.roll(cur, local - 1, axis=1)

        jax.lax.fori_loop(0, trips1, body1, xroll)

    if sharp:
        # Sharp mode: every source contributes 2 points, so per-pixel
        # demand is rarely below the bucket edges — a counting pre-walk
        # does not pay (A/B-measured +4-6% at 1080p/4K). Run the full
        # bubble and read the demand off the slots.
        run_walk1(k_total)
        demand_px = jnp.ones((rblock, cb), jnp.float32)
        for j in range(k_total - 1):
            sj = slots_ref[j * rblock:(j + 1) * rblock]
            demand_px = demand_px + (sj < colp1).astype(jnp.float32)
        dmax = jnp.max(demand_px).astype(jnp.int32)
    else:
        # ---- WALK 0 (soft only): measure the tile's piece demand. ------
        # cnt = points landing inside [col, col+1); pixel demand = cnt + 1
        # pieces. Pixel slots j >= demand-1 are only ever read as "past
        # the right clip" (their true value is >= col+1), which +inf
        # reproduces exactly, so walk 1's bubble depth can be bucketed on
        # the tile's measured max demand: flat regions insert into 4
        # slots instead of k_total (A/B-measured -15% at 1080p soft; each
        # bucket is its own fori_loop under pl.when — the rolled plane is
        # a value, so nothing escapes the branch but the slots_ref
        # stores).
        def body0(t, carry):
            cur, cnt = carry
            d = d_lo1 + t
            cp = out_cols + d
            okc = (cp >= 0) & (cp <= w - 1)
            xv = cur[:, o0:o0 + cb]
            hit = okc & (xv >= out_colsf) & (xv < colp1)
            return (pltpu.roll(cur, local - 1, axis=1),
                    cnt + hit.astype(jnp.float32))

        _, cnt = jax.lax.fori_loop(
            0, trips1, body0, (xroll, jnp.zeros((rblock, cb), jnp.float32)))
        demand_px = cnt + 1.0
        dmax = jnp.max(cnt).astype(jnp.int32) + 1

        caps = [c for c in (4, 8) if c < k_total] + [k_total]
        prev_cap = 0
        for cap in caps:
            cond = (dmax > prev_cap) if cap == k_total \
                else (dmax > prev_cap) & (dmax <= cap)

            @pl.when(cond)
            def _walk1(cap=cap):
                run_walk1(cap)

            prev_cap = cap

    khi = jnp.clip(dmax - k0, 0, k_pieces)

    # ---- Pieces from the collected breakpoints (oracle expressions). ---
    # Piece k: xq = sorted[q0+k] (k=0 -> the nearest point below col, which
    # max(col, .)+eps reduces to col+eps; else slots[k-1]); xq1 =
    # sorted[q0+k+1] = slots[k]. +inf slots behave exactly like the right
    # sentinel: t clips to col+1 and the validity chain stops. Pieces the
    # tile never reaches are skipped EVERYWHERE (geometry, init, walk 2,
    # finalize — all under the same khi > k predicate), so their stale
    # scratch is never read and no val zero-init is needed.
    for k in range(k_pieces):
        @pl.when(khi > k)
        def _piece_geom(k=k):
            kg = k0 + k
            if kg == 0:
                xq = out_colsf
                valid = jnp.ones((rblock, cb), jnp.float32)
            else:
                xq = slots_ref[(kg - 1) * rblock:kg * rblock]
                valid = (xq < colp1).astype(jnp.float32)
            xq1 = slots_ref[kg * rblock:(kg + 1) * rblock]
            f_k = jnp.maximum(out_colsf, xq) + eps
            t_k = jnp.minimum(colp1, xq1) - eps
            sig = t_k - f_k
            sl = slice(k * rblock, (k + 1) * rblock)
            cen_s[sl] = f_k + 0.5 * sig
            sig_s[sl] = sig
            val_s[sl] = valid

    # ---- Init winner accumulators (only the pieces this tile reaches). --
    for k in range(k_pieces):
        @pl.when(khi > k)
        def _init(k=k):
            bcl_ref[k * rblock:(k + 1) * rblock] = jnp.full(
                (rblock, cb), -eps)
            fbx_ref[k * rblock:(k + 1) * rblock] = jnp.full(
                (rblock, cb), inf)
            for j in range(3):
                off = (k * 3 + j) * rblock
                bid_ref[off:off + rblock] = jnp.zeros((rblock, cb),
                                                      jnp.float32)
                fbid_ref[off:off + rblock] = jnp.zeros((rblock, cb),
                                                       jnp.float32)

    def consider_all_pieces(x0, x1, cl0, cl1, pk_l, pk_r, cand_ok, flat,
                            ls=slice(0, None), cap=None):
        """pk_l/pk_r: rgb24-packed color planes [rblock, nlanes(ls)].

        ls selects the lane window of the per-piece scratch this call
        updates (walk 2 runs per column sub-block). cap, when given, is a
        STATIC piece count and the loop runs unpredicated (the caller has
        already hoisted the demand check out of its trip loop — a bucket
        `pl.when` per block, loop-invariant, instead of a branch per
        piece per candidate per trip); pieces between a pixel's true
        demand and the cap are zero-contribution via the val plane, and
        pieces at/above the tile-global khi are never resolved at all.
        Without cap, each piece is predicated on the tile-global khi
        (used by the one-time sentinel calls).

        The winner scan stores only (pk_l, pk_r, ip) identities; colors are
        reconstructed bit-exactly in the finalize. Flat candidates (both
        endpoints share a source column) store ip = 0 and skip the pk_r
        select: the finalize's (1-0)*l + 0*r is exactly l because every
        value ever written to the r slot is a finite packed color (or the
        0 init).
        """
        # cand_ok folded into x0 (poisoned candidates can never be active,
        # and their inf/nan ip only feeds predicated-false selects).
        x0p = x0 if cand_ok is None else jnp.where(cand_ok, x0, inf)
        denom = x1 - x0p

        def piece_body(k):
            def _piece(k=k):
                sl = slice(k * rblock, (k + 1) * rblock)
                center = cen_s[sl, ls]
                active = (x0p < center) & (x1 >= center)
                # active => x0 < center <= x1 => denom > 0 and ip > 0, so
                # the reference's ip > 0 qual check and denom == 0 safety
                # select are provably redundant (see module docstring).
                ip = (center - x0p) / denom
                clp = (1.0 - ip) * cl0 + ip * cl1
                qual = active & (ip < 1.0)
                better = qual & (clp > bcl_ref[sl, ls])
                bcl_ref[sl, ls] = jnp.where(better, clp, bcl_ref[sl, ls])
                fb_take = active & (x0p < fbx_ref[sl, ls])
                fbx_ref[sl, ls] = jnp.where(fb_take, x0p, fbx_ref[sl, ls])
                o_l = slice((k * 3) * rblock, (k * 3 + 1) * rblock)
                o_r = slice((k * 3 + 1) * rblock, (k * 3 + 2) * rblock)
                o_i = slice((k * 3 + 2) * rblock, (k * 3 + 3) * rblock)
                bid_ref[o_l, ls] = jnp.where(better, pk_l, bid_ref[o_l, ls])
                fbid_ref[o_l, ls] = jnp.where(fb_take, pk_l,
                                              fbid_ref[o_l, ls])
                ipw = jnp.zeros_like(ip) if flat else ip
                bid_ref[o_i, ls] = jnp.where(better, ipw, bid_ref[o_i, ls])
                fbid_ref[o_i, ls] = jnp.where(fb_take, ipw,
                                              fbid_ref[o_i, ls])
                if not flat:
                    bid_ref[o_r, ls] = jnp.where(better, pk_r,
                                                 bid_ref[o_r, ls])
                    fbid_ref[o_r, ls] = jnp.where(fb_take, pk_r,
                                                  fbid_ref[o_r, ls])
            return _piece

        if cap is not None:
            for k in range(cap):
                piece_body(k)()
        else:
            for k in range(k_pieces):
                pl.when(khi > k)(piece_body(k))

    # Sentinel segments (reference :1920, :1936): per-row scalars
    # precomputed in XLA (cols 0 and w-1 live in other tiles) and extracted
    # from the 128-lane sentinel plane by masked sums.
    lane = jax.lax.broadcasted_iota(jnp.int32, (rblock, 128), 1)

    def sget(j):
        return jnp.sum(jnp.where(lane == j, sent_v, 0.0), axis=1,
                       keepdims=True)

    zeros = jnp.zeros((rblock, cb), jnp.float32)
    first_x = sget(0) + zeros
    last_x = sget(1) + zeros
    cl_first = sget(2) + zeros
    cl_last = sget(3) + zeros
    pk_first = sget(4) + zeros
    pk_last = sget(5) + zeros
    sent_l = jnp.float32(-1.0 * w)
    sent_r = jnp.float32(2.0 * w)
    consider_all_pieces(jnp.full((rblock, cb), sent_l),
                        first_x, zeros, cl_first,
                        pk_first, pk_first, None, True)
    consider_all_pieces(last_x, jnp.full((rblock, cb), sent_r),
                        cl_last, zeros,
                        pk_last, pk_last, None, True)

    # ---- WALK 2: winner scan, per column sub-block, demand-bucketed. ----
    # Trip count and piece demand are both content-local: a smooth region
    # spans a narrow displacement range (few trips) and a low fold count
    # (few pieces), but a tile-global window/demand pays the worst pixel's
    # price everywhere. Each sub-block therefore gets its own d-window
    # (from the m range over its halo'd source window — covering both
    # endpoints of every segment the block can see) and its own piece
    # demand bound. The demand bound is applied as a BUCKETED, hoisted
    # `pl.when` around a whole trip loop whose piece count is static and
    # unpredicated — a handful of loop-invariant branches per block
    # instead of one per piece per candidate per trip (A/B: per-trip
    # predication at 128-lane blocks measured 2x SLOWER than the global
    # walk; hoisted buckets at 3-vreg blocks are what pays).
    # Results are bit-identical: widening a window or piece bound only
    # adds candidates that fail the activity checks / pieces whose val
    # plane is zero or that are never resolved (beyond the global khi).
    stack = jnp.concatenate([x, cl, pk], axis=0)   # (3*rblock, local)
    halo_s = _cdiv(max_disp + 8, _LANES) * _LANES
    sb = next((s for s in (384, 256, 128) if cb % s == 0 and cb > s), cb)
    sub = sb < cb and (sb + 2 * halo_s) <= local
    caps = [c for c in (2, 4, 6, 8, 10, 12) if c < k_pieces] + [k_pieces]

    def run_block(ls, sw_b, win0, wn, rd0, d_lo_b, trips_b, khi_b):
        # ls/sw_b: lane window of the cb-wide scratch this block owns;
        # win0: (3*rblock, wn) source window rolled so that at trip 0 the
        # candidate source for output lane j sits at window lane rd0 + j.
        cp0 = out_cols[:, ls]

        def make_body(cap):
            def body2(t, cur):
                nxt = pltpu.roll(cur, wn - 1, axis=1)
                d = d_lo_b + t
                cp = cp0 + d

                def slc(buf, i):
                    return buf[i * rblock:(i + 1) * rblock][:,
                                                            rd0:rd0 + sw_b]

                x_c, cl_c, pk_c = slc(cur, 0), slc(cur, 1), slc(cur, 2)
                x_n, cl_n, pk_n = slc(nxt, 0), slc(nxt, 1), slc(nxt, 2)
                if sharp:
                    consider_all_pieces(x_c - hw, x_c + hw, cl_c, cl_c,
                                        pk_c, pk_c,
                                        (cp >= 0) & (cp <= w - 1), True,
                                        ls=ls, cap=cap)
                consider_all_pieces(x_c + hw, x_n - hw, cl_c, cl_n,
                                    pk_c, pk_n,
                                    (cp >= 0) & (cp <= w - 2), False,
                                    ls=ls, cap=cap)
                return nxt
            return body2

        prev = 0
        for cap in caps:
            cond = (khi_b > prev) if cap == k_pieces \
                else (khi_b > prev) & (khi_b <= cap)

            @pl.when(cond)
            def _bucket(cap=cap):
                jax.lax.fori_loop(0, trips_b, make_body(cap), win0)

            prev = cap

    if not sub:
        run_block(slice(0, cb), cb, pltpu.roll(stack, shift0, axis=1),
                  local, o0, d_lo, trips, khi)
    else:
        wn = sb + 2 * halo_s
        for s in range(cb // sb):
            ls = slice(s * sb, (s + 1) * sb)
            dmax_b = jnp.max(demand_px[:, ls]).astype(jnp.int32)
            khi_b = jnp.clip(dmax_b - k0, 0, k_pieces)
            # Extract this block's halo'd source window (static cyclic
            # roll; wrapped-in lanes map to out-of-range source columns,
            # killed by the candidate cp bound checks exactly like the
            # single-tile layout — and their m values only widen the
            # block window, never change results).
            sh = (-(o0 + s * sb - halo_s)) % local
            win = pltpu.roll(stack, sh, axis=1)[:, :wn]
            wcols = pltpu.roll(win_cols, sh, axis=1)[:, :wn]
            in_w = (wcols >= 0.0) & (wcols < float(w))
            mb = jnp.where(in_w, win[0:rblock] - (wcols + 0.5), 0.0)
            d_lo_b = jnp.maximum(
                jnp.floor(-jnp.max(mb)).astype(jnp.int32) - 2, -r_static)
            d_hi_b = jnp.minimum(
                jnp.ceil(-jnp.min(mb)).astype(jnp.int32) + 2, r_static)
            win = pltpu.roll(win, jnp.mod(-d_lo_b, wn), axis=1)
            run_block(ls, sb, win, wn, halo_s, d_lo_b,
                      d_hi_b - d_lo_b + 1, khi_b)

    # Resolve winners, reconstruct colors from the packed identities, and
    # integrate, continuing the carried accumulator (sequential piece order
    # is preserved across piece-chunked calls so uint8 bit-parity survives
    # even when VMEM forces a split).
    inv64k = jnp.float32(1.0 / 65536.0)
    inv256 = jnp.float32(1.0 / 256.0)

    def unpack(p):
        # Exact for integer p in [0, 2^24): power-of-two scales are exact,
        # trunc recovers the integer fields, the subtractions are exact.
        r = jnp.trunc(p * inv64k)
        rem = p - r * 65536.0
        g = jnp.trunc(rem * inv256)
        return r, g, rem - g * 256.0

    # Skipped pieces (khi <= k) would contribute exactly +0.0 to an
    # accumulator that is always > 0 (0.5-biased, non-negative colors), so
    # predicating the whole per-piece resolve on the tile demand is
    # bit-identical — and it is what keeps the deferred-color
    # reconstruction off the low-demand fast path. Sequential piece order
    # (the in-place adds below) is preserved across piece-chunked calls so
    # uint8 bit-parity survives even when VMEM forces a split.
    for k in range(k_pieces):
        @pl.when(khi > k)
        def _resolve(k=k):
            sl = slice(k * rblock, (k + 1) * rblock)
            # The reference bypasses the best-scan when exactly ONE segment
            # is active (oracle: `if len(active) != 1`), i.e. it uses the
            # fallback. But with one active candidate the best track (if
            # set at all — qual implies active) and the fallback track were
            # written by THAT SAME candidate with identical ids, so
            # best == fallback and the n_act != 1 term of use_best is
            # provably redundant. Dropping it removes a whole per-piece
            # read-modify-write plane from the walk-2 hot loop while
            # staying bit-identical.
            use_best = bcl_ref[sl] > -eps
            valid = val_s[sl] > 0.5
            sig = sig_s[sl]

            def pick(j, k=k, use_best=use_best):
                o = slice((k * 3 + j) * rblock, (k * 3 + j + 1) * rblock)
                return jnp.where(use_best, bid_ref[o], fbid_ref[o])

            col_l = unpack(pick(0))
            col_r = unpack(pick(1))
            ip = pick(2)
            om = 1.0 - ip
            for ch in range(3):
                color = col_l[ch] * om + col_r[ch] * ip
                acc_s[ch] = acc_s[ch] + jnp.where(valid, color * sig, 0.0)
    if finalize:
        for ch in range(3):
            acc_s[ch] = jnp.trunc(jnp.clip(acc_s[ch], 0.0, 255.0))

    # ---- Deferred output DMA. ------------------------------------------
    # The result is staged into the parity slot of a 2-slot output buffer
    # and its copy-out is NOT waited here: program pid waits the copy
    # program pid-2 started from this same slot (reconstructing the same
    # src/dst/semaphore descriptor — a pure semaphore decrement by then),
    # so each store streams to HBM behind the next two programs' walks.
    # Only the last two grid programs drain their own copies before the
    # kernel ends. (Input prefetch uses the mirror-image pattern above.)
    def out_copies(pid_t, si):
        ib_t = pid_t // ncb_grid
        r0 = pl.multiple_of(ib_t * rblock, rblock)
        c0 = pl.multiple_of((pid_t - ib_t * ncb_grid) * cb, _LANES)
        return [pltpu.make_async_copy(
            ostg_s.at[si, ch],
            out.at[pl.ds(r0, rblock), pl.ds(c0, cb)], osems.at[si, ch])
            for ch, out in enumerate((or_hbm, og_hbm, ob_hbm))]

    if nprog <= 2:
        for ch in range(3):
            ostg_s[slot, ch] = acc_s[ch]
        for c in out_copies(pid, slot):
            c.start()
        for c in out_copies(pid, slot):
            c.wait()
    else:
        @pl.when(pid >= 2)
        def _drain_prev():
            for c in out_copies(pid - 2, slot):
                c.wait()

        for ch in range(3):
            ostg_s[slot, ch] = acc_s[ch]
        for c in out_copies(pid, slot):
            c.start()

        @pl.when(pid + 2 >= nprog)
        def _drain_own():
            for c in out_copies(pid, slot):
                c.wait()


@functools.partial(jax.jit, static_argnames=(
    "w", "k_pieces", "sharp", "max_disp", "interpret", "cb",
    "k_chunk_override"))
def polylines_exact_scanline(x, cl, red, green, blue,
                             *, w: int, k_pieces: int, sharp: bool,
                             max_disp: int, interpret: bool = False,
                             cb: int | None = None,
                             k_chunk_override: int | None = None):
    """x/cl/red/green/blue: [N, W] f32; the color planes MUST hold exact
    uint8 values (the dispatcher contract) — they are packed into one
    rgb24 plane for the deferred-color winner scan. Returns (r, g, b)
    [N, W] uint8-valued f32. Piece geometry is computed in-kernel (no
    sort).

    cb / k_chunk_override are test hooks: force a column-tile width
    (multiple of 128) or a piece-chunk size smaller than the VMEM budget
    would pick, to exercise the tiled / accumulator-threaded paths at small
    shapes.
    """
    n = x.shape[0]
    rblock = 8
    wp_min = _cdiv(w, _LANES) * _LANES
    if cb is None:
        cb = wp_min if wp_min <= 2048 else 1024
    ncb = _cdiv(w, cb)
    # halo >= max_disp + 8 > r_static = max_disp + 4 guarantees the cyclic
    # roll never aliases for any d the walks can visit; single-tile keeps
    # halo = 0 (aliasing wraps land out-of-image, killed by the i-bounds).
    halo = 0 if ncb == 1 else _cdiv(max_disp + 8, _LANES) * _LANES
    local = cb + 2 * halo
    w2 = ncb * cb
    sw = w2 + 2 * halo
    npad = _cdiv(n, rblock) * rblock
    nrb = npad // rblock

    # VMEM budget model (validated against Mosaic's scoped-vmem accounting
    # on v5e): fixed = DMA'd source window + sentinel plane + acc staging +
    # breakpoint slots + double-buffered rolled stacks; per-piece = winner
    # scratch (8 planes of cb lanes) + cen/sig/val planes. Mosaic's real
    # usage runs ~1.16x the raw estimate, so budget against 16 MB / 1.2.
    # With column tiling every piece fits in one pass at any real
    # resolution; the piece-chunk loop (accumulator threaded through,
    # sequential piece order preserved for uint8 bit-parity) remains as the
    # overflow valve.
    # (src window, sentinel, acc staging, out staging are 2-slot buffers.)
    fixed = (2 * (4 * local + 128 + 3 * cb + 3 * cb) + 3 * cb
             + k_pieces * cb) * rblock * 4 + 2 * 3 * rblock * local * 4
    per_piece = 11 * rblock * cb * 4
    budget = int((16 << 20) / 1.2)
    k_chunk = max(1, min(k_pieces, (budget - fixed) // per_piece))
    if k_chunk_override is not None:
        k_chunk = k_chunk_override

    def pad_src(v, fill=0.0):
        return jnp.full((npad, sw), fill, jnp.float32) \
            .at[:n, halo:halo + w].set(v)

    cols = jnp.broadcast_to(
        jnp.arange(sw, dtype=jnp.float32) - float(halo), (rblock, sw))
    # Pad the point plane with col+0.5 (m = 0, a self-landing point), not
    # 0.0: padded rows/lanes then neither widen the measured displacement
    # window nor inflate the walk-0 demand count of the last row block.
    x_pad = jnp.broadcast_to(
        jnp.arange(sw, dtype=jnp.float32) - float(halo) + 0.5, (npad, sw))
    # rgb24 pack: colors are uint8-valued f32, so r*65536 + g*256 + b is an
    # exact integer < 2^24 and round-trips bit-exactly through the kernel's
    # unpack (see module docstring).
    pk = red * 65536.0 + green * 256.0 + blue
    planes = (x_pad.at[:n, halo:halo + w].set(x), pad_src(cl), pad_src(pk))

    # Per-row sentinel scalars (reference :1920/:1936 segments at cols 0 and
    # w-1), packed into a 128-lane plane: [first_x, last_x, cl0, clw,
    # rgb24(0), rgb24(w-1)].
    hw = 0.45 if sharp else 0.0
    sent = jnp.zeros((npad, 128), jnp.float32)
    for j, v in enumerate((x[:, 0] - hw, x[:, w - 1] + hw,
                           cl[:, 0], cl[:, w - 1],
                           pk[:, 0], pk[:, w - 1])):
        sent = sent.at[:n, j].set(v)

    grid = (nrb, ncb)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    accs = tuple(jnp.full((npad, w2), 0.5, jnp.float32) for _ in range(3))
    for k0 in range(0, k_pieces, k_chunk):
        kc = min(k_chunk, k_pieces - k0)
        finalize = k0 + kc >= k_pieces
        kernel = functools.partial(_scan_kernel, w=w, cb=cb, halo=halo,
                                   rblock=rblock, k_total=k_pieces,
                                   k_pieces=kc, k0=k0, sharp=sharp,
                                   max_disp=max_disp, finalize=finalize,
                                   ncb_grid=ncb, nprog=nrb * ncb)
        accs = pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((npad, w2), jnp.float32)
                            for _ in range(3)),
            grid=grid,
            in_specs=[any_spec] * 8,
            out_specs=(any_spec,) * 3,
            scratch_shapes=[
                pltpu.VMEM((2, 4, rblock, local), jnp.float32),  # src 2-slot
                pltpu.VMEM((2, rblock, 128), jnp.float32),       # sentinels
                pltpu.VMEM((2, 3, rblock, cb), jnp.float32),     # acc staging
                pltpu.VMEM((3, rblock, cb), jnp.float32),        # acc working
                pltpu.VMEM((2, 3, rblock, cb), jnp.float32),     # out staging
                pltpu.VMEM((k_pieces * rblock, cb), jnp.float32),  # slots
                pltpu.VMEM((kc * rblock, cb), jnp.float32),      # centers
                pltpu.VMEM((kc * rblock, cb), jnp.float32),      # sigs
                pltpu.VMEM((kc * rblock, cb), jnp.float32),      # valids
                pltpu.VMEM((kc * rblock, cb), jnp.float32),      # best_cl
                pltpu.VMEM((kc * 3 * rblock, cb), jnp.float32),  # best id
                pltpu.VMEM((kc * rblock, cb), jnp.float32),      # fb_x0
                pltpu.VMEM((kc * 3 * rblock, cb), jnp.float32),  # fb id
                pltpu.SemaphoreType.DMA((2, 8)),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(cols, sent, *planes, *accs)
    return tuple(o[:n, :w] for o in accs)
