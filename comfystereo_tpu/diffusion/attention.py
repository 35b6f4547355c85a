"""Bilateral-Neighbor (BN) attention for stereo-consistent diffusion.

Reference spec: BNAttention (stereo_utils.py:91-187) — after `start_step`,
every self-attention layer recomputes attention with the left/right views'
tokens concatenated along the sequence axis so each eye attends across both
views; 'uni' restricts keys/values to the left view, 'bi' uses both. Under
CFG the batch layout is [uncond_L, uncond_R, cond_L, cond_R].

TPU-native design: instead of monkey-patching module forwards (the reference
walks the UNet and replaces nn.Module.forward closures,
stereo_utils.py:190-307), attention behavior is a PURE FUNCTION selected by an
`AttentionMode` value threaded through the flax UNet — no mutable
step-counting editor objects; the "current step >= start step" decision is a
traced boolean so the whole denoising loop stays scan-compatible.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AttentionMode:
    """Static attention configuration for one UNet invocation."""

    stereo: bool = False          # apply BN attention to self-attention
    direction: str = "uni"        # 'uni' | 'bi'
    use_cfg: bool = True          # batch is [u_L, u_R, c_L, c_R] vs [L, R]


def _softmax_last(sim: jnp.ndarray) -> jnp.ndarray:
    """exp(x - max) / sum — the exact expression jax.nn.softmax computes,
    written in plain jnp (no custom-jvp wrapper between XLA and the
    reduce+elementwise chain). Isolated at SD's N=4096 shapes this fused
    ~2x faster than jax.nn.softmax on v5e; inside the full transformer
    block the gain is absorbed by neighboring fusions, so treat it as
    at-worst-neutral with identical math."""
    m = jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
    e = jnp.exp(sim - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def standard_attention(q, k, v, scale: float) -> jnp.ndarray:
    """Plain softmax attention. q,k,v: [B, H, N, D].

    f32 inputs: logits and softmax run fully in f32 (the torch-parity
    path — ported-weight numerics tests compare this bit-for-bit shape).

    bf16 inputs on TPU, kernel-supported shapes: the fused Pallas kernel
    (pallas/flash_attention.py) keeps the N^2 logit matrix in VMEM —
    never in HBM — with FULL f32 logits from the MXU accumulator. XLA
    materializes that matrix to HBM three times per attention; at SD1.5
    level-0 shapes a device trace shows each pass at HBM speed-of-light
    (~2.2 ms per attention, 41% of the CFG step).

    Other bf16 shapes: the logit matrix is MATERIALIZED in bf16 while
    the softmax normalization (shift, exp, sum, divide) still computes
    in f32 on the fly — 2x less HBM residency than f32 logits (measured
    2.64 -> 1.31 ms per call; stock pallas flash attention loses at
    d=40, 6.6 ms — see NOTES)."""
    if q.dtype == jnp.bfloat16:
        b, h, n, d = q.shape
        nk = k.shape[2]
        from ..pallas import flash_attention as fa

        if jax.default_backend() == "tpu" and fa.supports(
                n, nk, d, q.dtype):
            out = fa.flash_attention(q.reshape(b * h, n, d),
                                     k.reshape(b * h, nk, d),
                                     v.reshape(b * h, nk, d), scale)
            return out.reshape(b, h, n, d)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        m = jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        # softmax(scale*sim) == exp(scale*(sim-max))/sum: folding the scale
        # into the f32 elementwise chain keeps it full-precision and off
        # the bf16 N^2 matrix.
        e = jnp.exp((sim.astype(jnp.float32) - m.astype(jnp.float32))
                    * scale)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = _softmax_last(sim).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def _stereo_pair_attention(q, k, v, scale: float, uni: bool) -> jnp.ndarray:
    """BN attention over a [2b, H, N, D] (left, right) stacked batch.

    Queries stay per-view; keys/values concatenate both views' tokens
    (reference attn_batch, stereo_utils.py:119-133). With `uni`, keys/values
    come from the LEFT view only (:163-171).
    """
    two_b, h, n, d = q.shape
    b = two_b // 2
    qs = q.reshape(2, b, h, n, d)
    ks = k.reshape(2, b, h, n, d)
    vs = v.reshape(2, b, h, n, d)
    if uni:
        k_cat = ks[0]                                   # [b,h,n,d] left only
        v_cat = vs[0]
    else:
        k_cat = jnp.concatenate([ks[0], ks[1]], axis=2)  # [b,h,2n,d]
        v_cat = jnp.concatenate([vs[0], vs[1]], axis=2)
    # Each view's queries attend to the shared token pool.
    q_cat = qs.reshape(2 * b, h, n, d)
    k_rep = jnp.concatenate([k_cat, k_cat], axis=0)
    v_rep = jnp.concatenate([v_cat, v_cat], axis=0)
    return standard_attention(q_cat, k_rep, v_rep, scale)


def bn_attention(q, k, v, scale: float, *, is_cross: bool,
                 mode: AttentionMode, active) -> jnp.ndarray:
    """Attention with optional stereo coupling.

    q,k,v: [B, H, N, D]. `active` may be a traced bool (current step has
    passed start_step). Cross-attention always stays standard (:137).

    When `active` is traced, the standard/stereo variants are selected with
    `lax.cond` so only ONE attention is executed per step (a `where` would
    run both, doubling every self-attention in the denoise loop).
    """
    if is_cross or not mode.stereo:
        return standard_attention(q, k, v, scale)

    uni = mode.direction == "uni"

    def stereo_fn(ops):
        q, k, v = ops
        if mode.use_cfg:
            half = q.shape[0] // 2
            out_u = _stereo_pair_attention(q[:half], k[:half], v[:half],
                                           scale, uni)
            out_c = _stereo_pair_attention(q[half:], k[half:], v[half:],
                                           scale, uni)
            return jnp.concatenate([out_u, out_c], axis=0)
        return _stereo_pair_attention(q, k, v, scale, uni)

    def base_fn(ops):
        return standard_attention(*ops, scale)

    if isinstance(active, bool):
        return stereo_fn((q, k, v)) if active else base_fn((q, k, v))
    return jax.lax.cond(active, stereo_fn, base_fn, (q, k, v))
