"""Weight-only int8 (w8) streaming for the SD UNet.

The measured bound on the CFG denoise step is the weight stream: ~1.72 GB
of bf16 UNet parameters cross HBM every step (NOTES round-4 MFU
investigation), ~5.5 ms of the ~25 ms step at batch 2. Storing the large
kernels as int8 with per-output-channel scales halves those bytes; the
dequant (convert + broadcast multiply) runs on the VPU and XLA fuses it
into the consumer when profitable.

Scheme: symmetric absmax per OUTPUT channel (the last axis of both flax
Dense [in, out] and Conv HWIO kernels), chosen because SD conv/projection
kernels have strong per-filter dynamic range but mild within-filter range;
per-tensor scales measurably hurt eps error at zero extra bandwidth.

Only "kernel" leaves with >= `min_elems` elements quantize — biases, norm
scales, and time-embedding tables stay in the compute dtype (tiny, and
norm parameters are precision-critical).

No reference counterpart: the reference runs fp16 torch end to end
(model_loader.py:66); this is a TPU-bandwidth optimization with the
quality cost reported by `bench.py --sd-delta`.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_QKEY = "__w8__"


def _quantize_kernel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """bf16/f32 kernel -> {int8 q, per-out-channel f32 scale}."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=tuple(range(w.ndim - 1)),
                     keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {_QKEY: q, "scale": scale.astype(jnp.float32)}


def _is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and _QKEY in leaf


def quantize_tree(params: Any, min_elems: int = 65536) -> Any:
    """Quantize every large 'kernel' leaf of a flax param tree to w8.

    Returns a tree with the same module structure where quantized kernels
    became {'__w8__': int8, 'scale': f32} dicts. Pair with
    `dequantize_tree` inside the jitted apply.
    """
    def walk(node):
        if isinstance(node, dict) or hasattr(node, "items"):
            out = {}
            for k, v in node.items():
                if (k == "kernel" and hasattr(v, "size")
                        and v.size >= min_elems):
                    out[k] = _quantize_kernel(jnp.asarray(v))
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def dequantize_tree(params: Any, dtype=jnp.bfloat16) -> Any:
    """Inverse of quantize_tree, for use INSIDE jit: int8 kernels stream
    from HBM and widen to `dtype` on the fly."""
    def walk(node):
        if _is_quantized(node):
            return (node[_QKEY].astype(dtype)
                    * node["scale"].astype(dtype))
        if isinstance(node, dict) or hasattr(node, "items"):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantized_bytes(params: Any) -> int:
    """Total parameter bytes as stored (diagnostic)."""
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree_util.tree_leaves(params))
