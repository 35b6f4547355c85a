#!/usr/bin/env python
"""Headline benchmark: 1080p depth->SBS stereo conversion, frames/sec/chip.

Measures the default pipeline (gpu_warp fill + edge-aware depth blur,
left-right SBS — the Stereo Image node defaults) on the available accelerator,
and compares against the CPU reference throughput.

CPU baseline: the reference's CPU engine is Numba-JIT scanline code
(stereoimage_generation.py:1850-1992). Numba is not installed in this image
(the reference itself would fall back to pure Python, orders of magnitude
slower), so the baseline is a vectorized-numpy implementation of the
reference's naive scatter + blur path — an optimistic stand-in for the numba
kernels (same memory-bound row operations, no JIT warmup).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def _cpu_reference_naive(img_u8, depth, divergence=4.5, exponent=2.0,
                         convergence=0.5):
    """Vectorized numpy twin of the reference CPU naive path (both eyes + SBS
    pack + directional blur), used as the baseline denominator."""
    from scipy.ndimage import convolve1d, sobel

    h, w, _ = img_u8.shape
    d = depth.astype(np.float32)

    # directional blur (reference :1346-1419), defaults of the node
    n = 20
    grad = sobel(d, axis=1)
    edge = np.clip(np.abs(grad) / (10 * 20.0), 0, 1)
    masks = [(grad > 0) & (edge > 0.5), (grad < 0) & (edge > 0.5)]
    cols = np.arange(w, dtype=np.float32)
    blurred = convolve1d(d, np.ones(n) / n, axis=1, mode="nearest")
    eyes_depth = []
    for m in masks:
        cl = np.where(m, cols, -1.0)
        ll = np.maximum.accumulate(cl, axis=1)
        dist_l = np.where(ll >= 0, cols - ll, 21.0)
        cr = np.where(m[:, ::-1], cols, -1.0)
        lr = np.maximum.accumulate(cr, axis=1)
        dist_r = np.where(lr >= 0, cols - lr, 21.0)[:, ::-1]
        wgt = np.clip(1.0 - np.minimum(dist_l, dist_r) / 20.0, 0, 1) ** 2.0
        wgt = np.clip(convolve1d(wgt, np.ones(13) / 13, axis=0, mode="nearest"), 0, 1)
        eyes_depth.append(wgt * blurred + (1 - wgt) * d)

    out = []
    for dd, sign in zip(eyes_depth, (+1.0, -1.0)):
        nd = (dd - dd.min()) / max(dd.max() - dd.min(), 1e-6) - convergence
        off = np.sign(nd) * np.abs(nd) ** exponent * (
            sign * divergence / 100.0 * w)
        dest = (np.arange(w)[None, :] + np.trunc(off)).astype(np.int64)
        np.clip(dest, 0, w - 1, out=dest)
        rowi = np.arange(h)[:, None]
        derived = np.zeros_like(img_u8)
        order = slice(None, None, -1) if sign > 0 else slice(None)
        derived[rowi, dest[:, order]] = img_u8[:, order]
        out.append(derived)
    return np.concatenate(out, axis=1)


def main():
    import jax
    import jax.numpy as jnp
    import comfystereo_tpu as cs
    from comfystereo_tpu.utils import fixtures

    H, W, B = 1080, 1920, 4
    img0 = fixtures.create_test_image(H, W).astype(np.float32) / 255.0
    dm0 = fixtures.create_depth_map(H, W).astype(np.float32) / 255.0
    imgs = jnp.asarray(np.stack([img0] * B))
    depths = jnp.asarray(np.stack([dm0] * B))

    def _sync(o):
        # A 1-element host copy forces full completion even on async relays
        # where block_until_ready returns early.
        np.asarray(o["stereo"][0][:1, :1, :1, :1])

    cfg = cs.StereoConfig(modes=("left-right",), fill_technique="gpu_warp")
    out = cs.stereo_pipeline(imgs, depths, cfg)
    jax.block_until_ready(out)
    _sync(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = cs.stereo_pipeline(imgs, depths, cfg)
    _sync(out)
    tpu_fps = (B * iters) / (time.perf_counter() - t0)

    # CPU reference baseline (single frame; numpy stand-in for numba kernels)
    img_u8 = (img0 * 255).astype(np.uint8)
    dm255 = (dm0 * 255).astype(np.float32)
    _cpu_reference_naive(img_u8, dm255)  # warm caches
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        _cpu_reference_naive(img_u8, dm255)
    cpu_fps = reps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "1080p depth->SBS stereo frames/sec/chip",
        "value": round(tpu_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
    }))


if __name__ == "__main__":
    main()
