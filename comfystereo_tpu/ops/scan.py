"""Row-scan primitives for scanline stereo algorithms.

Every fill algorithm in the reference is row-independent with a sequential scan
*within* the row (SURVEY.md §2.7). On TPU those scans become `associative_scan`
(log-depth, fully vectorized across the batch/row axes) instead of numba loops.

All functions operate on the LAST axis and are batched over any leading axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_true_left(valid: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest True at-or-left of each position; -1 if none.

    Equivalent to the reference's `cummax(where(valid, cols, -1))` idiom
    (stereoimage_generation.py:216-218, :399-401).
    """
    w = valid.shape[-1]
    cols = jnp.arange(w, dtype=jnp.int32)
    marked = jnp.where(valid, cols, jnp.int32(-1))
    return jax.lax.associative_scan(jnp.maximum, marked, axis=-1)


def nearest_true_right(valid: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest True at-or-right of each position; W if none."""
    w = valid.shape[-1]
    cols = jnp.arange(w, dtype=jnp.int32)
    marked = jnp.where(valid, cols, jnp.int32(w))
    return jax.lax.associative_scan(jnp.minimum, marked,
                                    axis=marked.ndim - 1, reverse=True)


def running_max(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix maximum along the last axis (torch.cummax equivalent)."""
    return jax.lax.associative_scan(jnp.maximum, x, axis=-1)


def running_min(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.associative_scan(jnp.minimum, x, axis=-1)


def _seg_combine_min(a, b):
    """Associative op for segmented min: (value, reset-flag) pairs.

    The scan computes, at each position, the min of values since the last
    position whose reset flag was set (inclusive of the reset position's value).
    """
    av, ar = a
    bv, br = b
    return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br


def segmented_running_min(values: jnp.ndarray, reset: jnp.ndarray) -> jnp.ndarray:
    """Prefix min along the last axis that restarts at positions where ``reset``.

    At a reset position the running min restarts from that position's value.
    """
    out, _ = jax.lax.associative_scan(_seg_combine_min, (values, reset), axis=-1)
    return out


def forward_fill(values, valid: jnp.ndarray):
    """Propagate the last valid value rightward along the last axis.

    values: pytree of arrays [..., W]; valid: bool [..., W].
    Returns (filled_values, has_value) — positions before the first valid
    entry keep their original value with has_value False.

    Replaces the gather-at-nearest-true-index idiom with a pure carry scan
    (gathers are scalarized on TPU; scans are vectorized).
    """
    leaves = jax.tree.leaves(values)

    def comb(a, b):
        ah, bh = a[-1], b[-1]
        out = tuple(jnp.where(bh, bv, av) for av, bv in zip(a[:-1], b[:-1]))
        return out + (ah | bh,)

    res = jax.lax.associative_scan(
        comb, tuple(leaves) + (valid,), axis=valid.ndim - 1)
    filled = jax.tree.unflatten(jax.tree.structure(values), res[:-1])
    return filled, res[-1]


def backward_fill(values, valid: jnp.ndarray):
    """Propagate the next valid value leftward along the last axis.

    reverse=True flips the array, scans forward, and flips back — so the
    nearest-to-the-right element in original coordinates is the LATER operand
    in flipped scan order, and the combine is identical to forward_fill's.
    """
    leaves = jax.tree.leaves(values)

    def comb(a, b):
        ah, bh = a[-1], b[-1]
        out = tuple(jnp.where(bh, bv, av) for av, bv in zip(a[:-1], b[:-1]))
        return out + (ah | bh,)

    res = jax.lax.associative_scan(
        comb, tuple(leaves) + (valid,), axis=valid.ndim - 1, reverse=True)
    filled = jax.tree.unflatten(jax.tree.structure(values), res[:-1])
    return filled, res[-1]


def searchsorted_rows(sorted_rows: jnp.ndarray, queries: jnp.ndarray,
                      side: str = "right") -> jnp.ndarray:
    """Batched searchsorted: each row of `sorted_rows` is non-decreasing.

    sorted_rows: [..., N] (ascending along last axis)
    queries:     [..., Q]
    Returns insertion indices [..., Q] in [0, N].

    Implemented as a vectorized binary search (log2 N gather rounds), which maps
    onto the VPU far better than a scatter-based inverse map.
    """
    n = sorted_rows.shape[-1]
    nbits = max(1, (n - 1).bit_length() if n > 1 else 1)
    lo = jnp.zeros(queries.shape, dtype=jnp.int32)
    hi = jnp.full(queries.shape, n, dtype=jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(sorted_rows, jnp.clip(mid, 0, n - 1), axis=-1)
        if side == "right":
            go_right = v <= queries
        else:
            go_right = v < queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, nbits + 1, body, (lo, hi))
    return lo


def gather_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis over the last axis (thin alias for readability)."""
    return jnp.take_along_axis(values, idx, axis=-1)
