"""VMEM-resident softmax attention kernel (Pallas/Mosaic) for SD shapes.

Why: at SD1.5's 512px operating point the five level-0 self-attentions
(N=4096, 8 heads, d=40) dominate the UNet step. XLA materializes the
[B,H,N,N] logit matrix to HBM and touches it three times (QK write,
softmax read+write, AV read) — a device trace shows each pass running at
HBM speed-of-light, ~2.2 ms per attention, 41% of the whole CFG step.
Stock pallas flash attention loses at these shapes (d=40 pads to 128
lanes; measured 6.6 vs 2.6 ms per call, see NOTES).

Design: tile the QUERY axis across the grid — one program = (batch*head,
q-block) with the full K/V for that head resident in VMEM (N=4096,
d<=128 -> <=2 MB) — and walk the KV axis INSIDE the program in online-
softmax chunks. The chunking is not for memory (the whole [BQ, N] logit
tile fits in VMEM): it exists so chunk i's exp/sum (VPU) overlaps chunk
i+1's QK matmul (MXU). The first, single-pass version of this kernel
computed QK -> full-row softmax -> AV serially per program; on v5e the
chunked rewrite measured ~2x faster at the SD level-0 shape with
everything else equal. HBM traffic is the q/k/v/out tiles either way
(~5 MB per head vs ~1.6 GB for XLA-materialized logits).

Numerics (deliberate): the QK matmul accumulates in f32 on the MXU, so
the logits are FULL f32 — strictly better than the XLA bf16 path (which
materializes bf16-rounded logits; attention.standard_attention). exp,
the running row max/sum, and the output accumulator stay f32; the
weights are cast to bf16 for the AV matmul, which accumulates in f32.
scale folds into the f32 elementwise chain after the max-shift, exactly
like the XLA path. The online rescaling (exp(m_old - m_new) correction)
reorders the same f32 sums; observed delta vs the single-pass twin is
~1 bf16 ulp.

Backward: not hand-written — `flash_attention` carries a custom VJP whose
backward differentiates the plain jnp formulation (one recompute). The
null-text optimization path (inversion.py) therefore works unchanged.

Reference behavior covered: plain softmax attention as used by every
self-attention in the SD UNet (reference stereo_utils.py:119-176 computes
the same einsum/softmax/einsum chain per hooked layer).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_VMEM_BUDGET = int((16 << 20) / 1.3)  # Mosaic's real usage > raw estimate


_CK = 1024  # kv chunk: big enough for full MXU passes, small enough that
            # the VPU softmax of one chunk hides behind the next QK


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, ck: int):
    q = q_ref[0]                               # [BQ, D] bf16
    nk = k_ref.shape[1]
    bq, d = q.shape

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * ck, ck)]        # [ck, D] bf16
        v = v_ref[0, pl.ds(i * ck, ck)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp((s - m_new) * scale)       # [BQ, ck] f32
        corr = jnp.exp((m - m_new) * scale)    # [BQ, 1]
        l = l * corr + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(e.astype(q_ref.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        return m_new, l, acc

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nk // ck, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_bq(nq: int, nk: int, d: int) -> int:
    ck = min(_CK, nk)
    for bq in (512, 256, 128):
        if nq % bq:
            continue
        # k/v + double-buffered q/out + f32 logits chunk + bf16 weights
        # chunk + f32 accumulator
        need = (2 * nk * d * 2 + 4 * bq * d * 2 + bq * ck * (4 + 2)
                + bq * d * 4)
        if need <= _VMEM_BUDGET:
            return bq
    return 0


def supports(nq: int, nk: int, d: int, dtype) -> bool:
    """True when the kernel layout fits: bf16, kv length divisible by the
    online chunk, head_dim <= 128, q length divisible by a feasible
    block."""
    return (dtype == jnp.bfloat16 and d <= _LANES and nk % _LANES == 0
            and nk % min(_CK, nk) == 0 and nq >= 1024
            and _pick_bq(nq, nk, d) > 0)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_call(q, k, v, scale: float, interpret: bool = False):
    bh, nq, d = q.shape
    nk = k.shape[1]
    dp = _LANES if d > 64 else 64
    if d != dp:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, dp - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, dp - d)))
    bq = _pick_bq(nq, nk, dp)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, ck=min(_CK, nk)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, dp), q.dtype),
        grid=(bh, nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v)
    return out[..., :d]


def _reference(q, k, v, scale: float):
    """jnp twin with the kernel's numerics (f32 logits from the MXU
    accumulator, f32 softmax, bf16 AV) — the forward-parity oracle in
    tests. NOT used for the VJP: materializing f32 logits is the slowest
    XLA formulation at SD shapes."""
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp((s - m) * scale)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    return jnp.einsum("bnm,bmd->bnd", a, v)


def _reference_bf16(q, k, v, scale: float):
    """The VJP recompute: bf16-materialized logits, f32 exp/sum — the
    same formulation attention.standard_attention uses for unsupported
    bf16 shapes. Differentiating through THIS (not the f32-logit twin)
    keeps the null-text backward at its pre-kernel cost (measured: an
    f32-logit recompute regressed the fwd+bwd step 44 -> 63 ms)."""
    s = jnp.einsum("bnd,bmd->bnm", q, k)
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp((s.astype(jnp.float32) - m.astype(jnp.float32)) * scale)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    return jnp.einsum("bnm,bmd->bnd", a, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: float, interpret: bool = False):
    """Softmax attention, q/k/v: [BH, Nq|Nkv, D] bf16 -> [BH, Nq, D] bf16.

    Check `supports(...)` first; shapes outside the layout must use the
    XLA path. `interpret=True` runs the kernel in the Pallas interpreter
    (CPU test mode)."""
    return _flash_call(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    return _flash_call(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_bf16(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
