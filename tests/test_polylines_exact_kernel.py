"""Fused EXACT-polylines kernel (interpret mode) vs the XLA winner scan.

The fused kernel (pallas/polylines_exact_kernel.py) must reproduce the XLA
exact path — which is itself bit-parity vs the loop oracle
(tests/test_polylines.py) — so the kernel is held to uint8 equality here.
Reference: stereoimage_generation.py:1947-1991.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu.ops import polylines_exact as pe
from comfystereo_tpu.utils import fixtures

H, W = 24, 56


def _run(impl, sharp, div, sep, depth=None):
    img = fixtures.create_test_image(H, W).astype(np.float32)
    if depth is None:
        depth = fixtures.create_depth_map(H, W).astype(np.float32)
    from comfystereo_tpu.ops import depth as depth_ops

    nd = depth_ops.normalize_depth(jnp.asarray(depth[None])) - 0.5
    out = pe.apply_polylines_exact(
        jnp.asarray(img[None]), nd, (div / 100.0) * W, sep, 2.0,
        sharp=sharp, impl=impl)
    return np.asarray(out)[0].astype(np.uint8)


@pytest.mark.parametrize("sharp", [True, False])
def test_fused_exact_matches_xla(sharp):
    a = _run("xla", sharp, 4.5, 0.0)
    b = _run("pallas", sharp, 4.5, 0.0)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
@pytest.mark.parametrize("sharp", [True, False])
@pytest.mark.parametrize("div,sep", [(-4.5, 0.0), (7.0, 1.5)])
def test_fused_exact_matches_xla_sweep(sharp, div, sep):
    a = _run("xla", sharp, div, sep)
    b = _run("pallas", sharp, div, sep)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_exact_tiled_and_piece_chunked():
    """Column tiling (cb-lane DMA windows + halo) and piece chunking (the
    0.5-biased accumulator threaded across calls in sequential piece order)
    must be invisible in the output. Force both via the kernel's test hooks
    at a width spanning several 128-lane tiles and compare against the
    default single-tile layout and the XLA ground truth."""
    from comfystereo_tpu.pallas.polylines_exact_kernel import (
        polylines_exact_scanline)
    from comfystereo_tpu.ops import depth as depth_ops

    h, w = 4, 700
    img = fixtures.create_test_image(h, w).astype(np.float32)
    depth = fixtures.create_depth_map(h, w).astype(np.float32)
    nd = depth_ops.normalize_depth(jnp.asarray(depth[None])) - 0.5
    ref = np.asarray(pe.apply_polylines_exact(
        jnp.asarray(img[None]), nd, 0.045 * w, 0.0, 2.0,
        sharp=True, impl="xla"))[0].astype(np.uint8)

    import math
    div_px = 0.045 * w
    max_disp = int(math.ceil(div_px)) + 4
    coord = (np.sign(np.asarray(nd)) * np.abs(np.asarray(nd)) ** 2.0
             * div_px).astype(np.float32)
    x = (np.arange(w, dtype=np.float32) + 0.5 + coord[0]).reshape(h, w)
    cl = np.abs(coord[0]).reshape(h, w)
    planes = [jnp.asarray(img[..., ch]) for ch in range(3)]
    for kw in ({"cb": 128}, {"cb": 128, "k_chunk_override": 2},
               {"k_chunk_override": 3}):
        outs = polylines_exact_scanline(
            jnp.asarray(x), jnp.asarray(cl), *planes,
            w=w, k_pieces=12, sharp=True, max_disp=max_disp,
            interpret=True, **kw)
        got = np.stack([np.asarray(o) for o in outs], -1).astype(np.uint8)
        np.testing.assert_array_equal(ref, got, err_msg=str(kw))


@pytest.mark.slow
def test_fused_exact_fold_heavy():
    rng = np.random.default_rng(0)
    depth = (np.where(np.arange(W)[None, :] % 13 < 6, 255.0, 40.0)
             * np.ones((H, 1)) + rng.uniform(0, 40, (H, W))).astype(
                 np.float32)
    for sharp in (True, False):
        a = _run("xla", sharp, 7.0, 0.0, depth)
        b = _run("pallas", sharp, 7.0, 0.0, depth)
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_exact_subblock_mixed_demand():
    """The round-4 walk-2 sub-blocking gives each 384/256-lane column block
    its own d-window and piece-demand bucket. Feed content whose demand
    VARIES across blocks — fold-heavy stripes on the left third, flat on
    the middle, smooth ramp on the right — at a width wide enough for
    multiple sub-blocks (w=960 -> cb=1024 -> sb=256), so blocks land in
    different buckets and the per-block windows must still reproduce the
    XLA scan bit-exactly (both modes)."""
    h, w = 4, 960
    rng = np.random.default_rng(7)
    cols = np.arange(w)[None, :]
    fold = (np.where(cols % 13 < 6, 255.0, 40.0)
            + rng.uniform(0, 40, (h, w)))
    flat = np.full((h, w), 128.0)
    ramp = np.linspace(0.0, 255.0, w)[None, :] * np.ones((h, 1))
    depth = np.where(cols < w // 3, fold,
                     np.where(cols < 2 * w // 3, flat, ramp)).astype(
                         np.float32)
    img = fixtures.create_test_image(h, w).astype(np.float32)
    from comfystereo_tpu.ops import depth as depth_ops

    nd = depth_ops.normalize_depth(jnp.asarray(depth[None])) - 0.5
    for sharp in (True, False):
        a = np.asarray(pe.apply_polylines_exact(
            jnp.asarray(img[None]), nd, 0.045 * w, 0.0, 2.0,
            sharp=sharp, impl="xla"))[0].astype(np.uint8)
        b = np.asarray(pe.apply_polylines_exact(
            jnp.asarray(img[None]), nd, 0.045 * w, 0.0, 2.0,
            sharp=sharp, impl="pallas"))[0].astype(np.uint8)
        np.testing.assert_array_equal(a, b, err_msg=f"sharp={sharp}")
