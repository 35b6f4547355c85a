"""Bounded-displacement gather along W — the Pallas workhorse primitive.

XLA's general gather is scalarized on TPU (~24 ms for a 1080p plane, measured),
which made the scan/searchsorted warp gather-bound. But Mosaic DOES support a
fast per-sublane dynamic gather *within one 128-lane vreg*
(`jnp.take_along_axis(..., axis=-1)` on a [S, 128] block).

Every gather in the stereo pipeline has bounded displacement: an output column
only ever reads source data within `max_disparity + slack` columns of itself.
So a full-width gather decomposes into, per 128-lane output vreg, a handful of
single-vreg gathers from the neighboring source vregs plus masked selects:

    out[:, j*128+l] = values[:, idx]   with |idx - (j*128+l)| <= D
    => for s in j-K..j+K:  (K = ceil((D+127)/128))
         local = idx - s*128; pick where 0 <= local < 128

Cost: (2K+1) vreg gathers per output vreg — O(D/128) work per element instead
of a scalarized load, with the whole row resident in VMEM. Measured ~0.26 ms
per 1080p plane when composed inside a jit (~90x over XLA gather).

Values and indices may have different widths (values [..., M], idx [..., N]);
the displacement bound is interpreted against the output column position.

On non-TPU backends (tests run on CPU) the op falls back to
jnp.take_along_axis, which is exact and fast there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(values_ref, idx_ref, out_ref, *, k: int, n_src_vreg: int,
            n_out_vreg: int):
    vals = values_ref[:]                       # [S, Mpad]
    idx = idx_ref[:]                           # [S, Npad] int32, in [0, M-1]
    s_sub = vals.shape[0]
    pieces = []
    for j in range(n_out_vreg):
        idxv = idx[:, j * _LANES:(j + 1) * _LANES]
        acc = jnp.zeros((s_sub, _LANES), dtype=vals.dtype)
        for s in range(max(0, j - k), min(n_src_vreg, j + k + 1)):
            src = vals[:, s * _LANES:(s + 1) * _LANES]
            local = idxv - s * _LANES
            sel = (local >= 0) & (local < _LANES)
            g = jnp.take_along_axis(src, jnp.clip(local, 0, _LANES - 1), axis=1)
            acc = jnp.where(sel, g, acc)
        pieces.append(acc)
    out_ref[:] = jnp.concatenate(pieces, axis=1)


@functools.partial(jax.jit, static_argnames=("max_disp", "m", "n"))
def _bounded_gather_2d(values, idx, max_disp: int, m: int, n: int):
    rows = values.shape[0]
    mpad = _cdiv(m, _LANES) * _LANES
    npad = _cdiv(n, _LANES) * _LANES
    rpad = _cdiv(rows, _SUBLANES) * _SUBLANES
    n_src_vreg = mpad // _LANES
    n_out_vreg = npad // _LANES
    # Output vreg j covers columns [j*128, j*128+127]; sources reach a further
    # max_disp columns each way, plus |m - n| slack at the tail.
    k = _cdiv(max_disp + abs(m - n) + _LANES - 1, _LANES)

    vp = jnp.zeros((rpad, mpad), values.dtype).at[:rows, :m].set(values)
    ip = jnp.zeros((rpad, npad), jnp.int32).at[:rows, :n].set(idx)

    block_rows = min(rpad, 256)
    while rpad % block_rows:
        block_rows //= 2
    grid = (rpad // block_rows,)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, n_src_vreg=n_src_vreg,
                          n_out_vreg=n_out_vreg),
        out_shape=jax.ShapeDtypeStruct((rpad, npad), values.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, mpad), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, npad), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, npad), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
    )(vp, ip)
    return out[:rows, :n]


def bounded_take_along_w(values: jnp.ndarray, idx: jnp.ndarray,
                         max_disp: int) -> jnp.ndarray:
    """values[..., M] gathered at idx[..., N] (int32 in [0, M-1]) along the
    last axis, where |idx - output column| <= max_disp.

    Uses the Pallas vreg-gather kernel on TPU; falls back to
    jnp.take_along_axis elsewhere.
    """
    if jax.default_backend() != "tpu":
        return jnp.take_along_axis(values, idx, axis=-1)
    m = values.shape[-1]
    n = idx.shape[-1]
    lead = idx.shape[:-1]
    v2 = values.reshape(-1, m)
    i2 = idx.reshape(-1, n)
    out = _bounded_gather_2d(v2, i2, int(max_disp), m, n)
    return out.reshape(*lead, n)
