#!/usr/bin/env python
"""Benchmarks for the five BASELINE.md configs.

Default mode prints the ONE headline JSON line the driver records:
1080p depth->SBS stereo conversion (gpu_warp + edge-aware depth blur, the
Stereo Image node defaults), frames/sec/chip vs the CPU reference.

`--full` additionally benchmarks every BASELINE.json config and prints one
JSON line per config:
  1. 512x512 synthetic + gradient depth, naive fill, left-right SBS
  2. 1080p single image, polylines fill + depth blur, div/convergence sweep
  3. 720p batched video frames, hybrid-edge fill, top-bottom output
  4. 4K image, gpu_warp fill + red-cyan anaglyph, no_fill mask validation
  5. Video2Stereo workflow: batched 4K, all fill techniques, balance sweep

Accuracy column: fill-region SSIM (and exact mask parity for #4) vs the
sequential CPU oracle (tests/oracle/stereo_oracle.py — pure-python loops,
since numba is absent here just as the reference would degrade). The oracle
is O(pixels) interpreted Python, so SSIM validation runs at a reduced
`--oracle-width` (default 512 px wide, same inputs for both sides); fps is
always measured at the config's full resolution.

CPU baseline denominator: with numba installed, the MEASURED multicore
numba prange twin of the reference naive kernel family (the honest
apples-to-apples number); without it (this image), the vectorized-numpy
single-thread twin, with an explicit 8-core-class projection
(vs_baseline_8core_class) published alongside so the headline never
overstates the margin vs a realistic multicore CPU host.
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def _cpu_blur_and_offsets(img_u8, depth, divergence=4.5, exponent=2.0,
                          convergence=0.5):
    """Shared preamble of the CPU baseline: directional blur (reference
    :1346-1419, scipy-vectorized there too) + per-eye integer scatter
    destinations. Both the numpy twin and the numba twin consume this, so
    their only difference is the scatter kernel itself."""
    from scipy.ndimage import convolve1d, sobel

    h, w, _ = img_u8.shape
    d = depth.astype(np.float32)

    # directional blur defaults of the node
    n = 20
    grad = sobel(d, axis=1)
    edge = np.clip(np.abs(grad) / (10 * 20.0), 0, 1)
    masks = [(grad > 0) & (edge > 0.5), (grad < 0) & (edge > 0.5)]
    cols = np.arange(w, dtype=np.float32)
    blurred = convolve1d(d, np.ones(n) / n, axis=1, mode="nearest")
    dests = []
    for m, sign in zip(masks, (+1.0, -1.0)):
        cl = np.where(m, cols, -1.0)
        ll = np.maximum.accumulate(cl, axis=1)
        dist_l = np.where(ll >= 0, cols - ll, 21.0)
        cr = np.where(m[:, ::-1], cols, -1.0)
        lr = np.maximum.accumulate(cr, axis=1)
        dist_r = np.where(lr >= 0, cols - lr, 21.0)[:, ::-1]
        wgt = np.clip(1.0 - np.minimum(dist_l, dist_r) / 20.0, 0, 1) ** 2.0
        wgt = np.clip(convolve1d(wgt, np.ones(13) / 13, axis=0,
                                 mode="nearest"), 0, 1)
        dd = wgt * blurred + (1 - wgt) * d
        nd = (dd - dd.min()) / max(dd.max() - dd.min(), 1e-6) - convergence
        off = np.sign(nd) * np.abs(nd) ** exponent * (
            sign * divergence / 100.0 * w)
        dest = (np.arange(w)[None, :] + np.trunc(off)).astype(np.int64)
        np.clip(dest, 0, w - 1, out=dest)
        dests.append((dest, sign))
    return dests


def _cpu_reference_naive(img_u8, depth, divergence=4.5, exponent=2.0,
                         convergence=0.5):
    """Vectorized numpy twin of the reference CPU naive path (both eyes + SBS
    pack + directional blur), used as the baseline denominator."""
    h = img_u8.shape[0]
    out = []
    for dest, sign in _cpu_blur_and_offsets(img_u8, depth, divergence,
                                            exponent, convergence):
        rowi = np.arange(h)[:, None]
        derived = np.zeros_like(img_u8)
        order = slice(None, None, -1) if sign > 0 else slice(None)
        derived[rowi, dest[:, order]] = img_u8[:, order]
        out.append(derived)
    return np.concatenate(out, axis=1)


# ---------------------------------------------------------------------------
# Helpers (full mode)
# ---------------------------------------------------------------------------

def _ssim_map(a, b):
    """SSIM map on [H,W] grayscale float 0-1, 7x7 uniform window."""
    from scipy.ndimage import uniform_filter

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_a = uniform_filter(a, 7)
    mu_b = uniform_filter(b, 7)
    va = uniform_filter(a * a, 7) - mu_a ** 2
    vb = uniform_filter(b * b, 7) - mu_b ** 2
    cov = uniform_filter(a * b, 7) - mu_a * mu_b
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
            / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


def _fill_region_ssim(mine01, oracle01, mask):
    """Mean SSIM over the fill-imperfection region (BASELINE acceptance
    metric); falls back to the full frame when the mask is empty."""
    ga = mine01.mean(axis=-1)
    gb = oracle01.mean(axis=-1)
    smap = _ssim_map(ga.astype(np.float64), gb.astype(np.float64))
    region = mask > 0.5
    if not region.any():
        return float(smap.mean())
    from scipy.ndimage import binary_dilation

    region = binary_dilation(region, iterations=3)  # include fill borders
    return float(smap[region].mean())


def _oracle_sbs(img01, depth255, cfg, oracle):
    """CPU-oracle stereo pair (first mode) for a single frame, uint8/255."""
    d = depth255
    if cfg.depth_map_blur and cfg.depth_blur_strength > 0:
        ld, rd = oracle.directional_motion_blur(
            d, cfg.depth_blur_strength, cfg.depth_blur_edge_threshold,
            cfg.depth_blur_strength, cfg.depth_blur_falloff,
            cfg.depth_blur_vert_smooth)
    else:
        ld = rd = d
    img_u8 = np.trunc(np.clip(img01 * 255.0, 0, 255)).astype(np.float32)
    divl, divr = cfg.eye_divergences()
    left = img_u8 if divl < 0.001 else oracle.dispatch(
        img_u8, ld, +divl, -cfg.separation, cfg.stereo_offset_exponent,
        cfg.fill_technique, cfg.convergence_point)
    right = img_u8 if divr < 0.001 else oracle.dispatch(
        img_u8, rd, -divr, +cfg.separation, cfg.stereo_offset_exponent,
        cfg.fill_technique, cfg.convergence_point)
    mode = cfg.modes[0]
    if mode == "top-bottom":
        return np.concatenate([left, right], axis=0) / 255.0
    return np.concatenate([left, right], axis=1) / 255.0


def _time_fps(fn, sync, frames_per_call, iters=10):
    sync(fn())  # compile / warm AND drain the device queue
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return frames_per_call * iters / (time.perf_counter() - t0)


def _scaled_inputs(img01, depth, width):
    """Downscale a frame pair for the oracle-validation pass."""
    from PIL import Image

    h, w = depth.shape
    nh = max(32, int(round(h * width / w)))
    im = Image.fromarray((img01 * 255).astype(np.uint8)).resize(
        (width, nh), Image.BILINEAR)
    dm = Image.fromarray(depth.astype(np.float32), mode="F").resize(
        (width, nh), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0, np.asarray(dm, np.float32)


def _validate(cfg, img01, depth, oracle_width):
    """Fill-region SSIM vs the CPU oracle at the validation width."""
    import jax.numpy as jnp
    import comfystereo_tpu as cs
    sys.path.insert(0, ".")
    from tests.oracle import stereo_oracle as oracle

    simg, sdepth = _scaled_inputs(img01, depth, oracle_width)
    out = cs.stereo_pipeline(jnp.asarray(simg[None]),
                             jnp.asarray(sdepth[None]), cfg)
    mine = np.asarray(out["stereo"][0][0])
    mask = np.asarray(out["mask"][0])
    want = _oracle_sbs(simg, sdepth, cfg, oracle)
    if mine.shape != want.shape:  # anaglyph and friends: crop to first mode
        want = want[:mine.shape[0], :mine.shape[1]]
    if mask.shape != mine.shape[:2]:  # gpu_warp mask is per-eye [H,W]
        axis = 0 if cfg.modes[0] == "top-bottom" else 1
        mask = np.concatenate([mask, mask], axis=axis)
        if mask.shape != mine.shape[:2]:
            mask = np.ones(mine.shape[:2])
    return _fill_region_ssim(mine, want, mask), None


def run_full(oracle_width=512):
    import jax
    import jax.numpy as jnp
    import comfystereo_tpu as cs
    from comfystereo_tpu.utils import fixtures
    sys.path.insert(0, ".")
    from tests.oracle import stereo_oracle as oracle

    def sync(out=None):
        # Force completion with a ONE-element device slice + host copy —
        # copying a full leaf would bill the relay's host-transfer
        # bandwidth (~seconds for a 4K frame) to the compute timing.
        if out is not None:
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[(slice(0, 1),) * leaf.ndim])

    results = []

    def frame(h, w):
        return (fixtures.create_test_image(h, w).astype(np.float32) / 255.0,
                fixtures.create_depth_map(h, w).astype(np.float32))

    # --- Config 1: 512x512 synthetic, naive fill, SBS -----------------------
    img, dm = frame(512, 512)
    cfg = cs.StereoConfig(fill_technique="naive", modes=("left-right",),
                          depth_map_blur=False)
    x, d = jnp.asarray(img[None]), jnp.asarray(dm[None])
    fps = _time_fps(lambda: cs.stereo_pipeline(x, d, cfg), sync, 1)
    ssim, _ = _validate(cfg, img, dm, oracle_width)
    results.append({"config": "1_512_naive_sbs", "fps_per_chip": round(fps, 2),
                    "fill_region_ssim": round(ssim, 5)})

    # --- Config 2: 1080p polylines + blur, divergence/convergence sweep -----
    img, dm = frame(1080, 1920)
    x, d = jnp.asarray(img[None]), jnp.asarray(dm[None])
    sweep = [(2.0, 0.5), (4.5, 0.5), (4.5, 0.0), (7.0, 1.0)]
    cfgs = [cs.StereoConfig(fill_technique="polylines_sharp",
                            divergence=dv, convergence_point=cv,
                            modes=("left-right",), depth_map_blur=True)
            for dv, cv in sweep]
    for c in cfgs:
        sync(cs.stereo_pipeline(x, d, c))  # warm each sweep point
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        for c in cfgs:
            out = cs.stereo_pipeline(x, d, c)
    sync(out)
    fps = len(cfgs) * iters / (time.perf_counter() - t0)
    # Default = exact integration (fused Pallas kernel, uint8 bit-parity
    # with the CPU oracle); also time the supersampled fast mode.
    import dataclasses as _dc
    cfgs_ss = [_dc.replace(c, polylines_exact=False) for c in cfgs]
    for c in cfgs_ss:
        sync(cs.stereo_pipeline(x, d, c))
    t0 = time.perf_counter()
    for _ in range(iters):
        for c in cfgs_ss:
            out = cs.stereo_pipeline(x, d, c)
    sync(out)
    fps_ss = len(cfgs_ss) * iters / (time.perf_counter() - t0)
    ssim_exact, _ = _validate(cfgs[1], img, dm, min(oracle_width, 256))
    ssim_ss, _ = _validate(cfgs_ss[1], img, dm, oracle_width)
    results.append({"config": "2_1080p_polylines_sweep",
                    "fps_per_chip": round(fps, 2),
                    "fps_supersampled": round(fps_ss, 2),
                    "sweep_points": len(cfgs),
                    "fill_region_ssim": round(ssim_ss, 5),
                    "exact_mode_ssim": round(ssim_exact, 5)})

    # --- Config 3: 720p batched video frames, hybrid_edge, top-bottom -------
    B = 12
    img, dm = frame(720, 1280)
    imgs = np.stack([np.roll(img, 8 * i, axis=1) for i in range(B)])
    dms = np.stack([np.roll(dm, 8 * i, axis=1) for i in range(B)])
    cfg = cs.StereoConfig(fill_technique="hybrid_edge", modes=("top-bottom",),
                          depth_map_blur=True)
    x, d = jnp.asarray(imgs), jnp.asarray(dms)
    fps = _time_fps(lambda: cs.stereo_pipeline(x, d, cfg), sync, B, iters=3)
    ssim, _ = _validate(cfg, img, dm, oracle_width)
    results.append({"config": "3_720p_video_hybrid_edge_tb",
                    "fps_per_chip": round(fps, 2), "batch": B,
                    "fill_region_ssim": round(ssim, 5)})

    # --- Config 4: 4K gpu_warp + anaglyph, mask validation -------------------
    img, dm = frame(2160, 3840)
    cfg = cs.StereoConfig(fill_technique="gpu_warp",
                          modes=("red-cyan-anaglyph",), depth_map_blur=True)
    x, d = jnp.asarray(img[None]), jnp.asarray(dm[None])
    fps = _time_fps(lambda: cs.stereo_pipeline(x, d, cfg), sync, 1, iters=3)
    # Mask validation: exact parity vs the sequential z-buffer oracle at the
    # validation width (blur off isolates the warp's coverage semantics).
    cfg_nb = cs.StereoConfig(fill_technique="gpu_warp", modes=("left-only",),
                             depth_map_blur=False, stereo_balance=1.0)
    simg, sdm = _scaled_inputs(img, dm, oracle_width)
    out_v = cs.stereo_pipeline(jnp.asarray(simg[None]),
                               jnp.asarray(sdm[None]), cfg_nb)
    divl = cfg_nb.eye_divergences()[0] / 100.0 * simg.shape[1]
    _, want_gap = oracle.forward_warp(simg, sdm, +divl, 0.0,
                                      cfg_nb.stereo_offset_exponent,
                                      cfg_nb.convergence_point)
    mask_parity = float(((np.asarray(out_v["mask"][0]) > 0.5)
                         == want_gap).mean())
    results.append({"config": "4_4k_warp_anaglyph_mask",
                    "fps_per_chip": round(fps, 2),
                    "mask_exact_parity": round(mask_parity, 6)})

    # --- Config 5: Video2Stereo workflow, 4K batch, all fills, balance sweep -
    B = 2
    img, dm = frame(2160, 3840)
    imgs = np.stack([np.roll(img, 16 * i, axis=1) for i in range(B)])
    dms = np.stack([np.roll(dm, 16 * i, axis=1) for i in range(B)])
    x, d = jnp.asarray(imgs), jnp.asarray(dms)
    techniques = list(cs.FILL_TECHNIQUES)
    balances = (0.0, 0.5)
    cfgs = [cs.StereoConfig(fill_technique=t, stereo_balance=b,
                            modes=("left-right",), depth_map_blur=True)
            for t in techniques for b in balances]
    for c in cfgs:
        sync(cs.stereo_pipeline(x, d, c))
    t0 = time.perf_counter()
    for c in cfgs:
        out = cs.stereo_pipeline(x, d, c)
    sync(out)
    fps = len(cfgs) * B / (time.perf_counter() - t0)
    results.append({"config": "5_video2stereo_4k_all_fills",
                    "fps_per_chip": round(fps, 2),
                    "fill_techniques": len(techniques),
                    "balance_sweep": len(balances)})

    for r in results:
        print(json.dumps(r))
    return results


def _measure_sd_stack(dtype, tag):
    """CFG UNet step / VAE decode / null-text inner step at the reference's
    operating point (512x512, CFG — stereodiffusion_nodes.py:257-265) for
    one compute dtype. Weights are zeros (same FLOPs; init is instant)."""
    import jax
    import jax.numpy as jnp
    from comfystereo_tpu.diffusion import porting as porting_mod
    from comfystereo_tpu.diffusion.sd_unet import SDUNet, SDUNetConfig
    from comfystereo_tpu.diffusion.sd_vae import SDVAEConfig

    model = porting_mod.build_sd_model(unet_cfg=SDUNetConfig(),
                                       vae_cfg=SDVAEConfig(),
                                       init_mode="zeros", dtype=dtype)
    lat = jnp.zeros((2, 4, 64, 64), jnp.float32)   # CFG pair, 512x512
    ctx = jnp.zeros((2, 77, 768), jnp.float32)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf[(slice(0, 1),) * leaf.ndim])

    e = model.unet_apply(model.unet_params, lat, jnp.float32(500), ctx)
    sync(e)
    t0 = time.perf_counter()
    for _ in range(10):
        e = model.unet_apply(model.unet_params, lat, jnp.float32(500), ctx)
    sync(e)
    step_ms = (time.perf_counter() - t0) / 10 * 1e3

    # Batched UNet throughput: the step has a ~10 ms batch-independent
    # component (the 1.72 GB bf16 weight stream + glue — see NOTES round-4
    # MFU investigation), so per-sample cost drops sharply with batch.
    # This is the number the batched Fast video path rides.
    lat8 = jnp.zeros((8, 4, 64, 64), jnp.float32)
    ctx8 = jnp.zeros((8, 77, 768), jnp.float32)
    e = model.unet_apply(model.unet_params, lat8, jnp.float32(500), ctx8)
    sync(e)
    t0 = time.perf_counter()
    for _ in range(10):
        e = model.unet_apply(model.unet_params, lat8, jnp.float32(500), ctx8)
    sync(e)
    b8_ms = (time.perf_counter() - t0) / 10 * 1e3

    z = jnp.zeros((1, 4, 64, 64), jnp.float32)
    img = model.vae_decode(model.vae_params, z)
    sync(img)
    t0 = time.perf_counter()
    for _ in range(5):
        img = model.vae_decode(model.vae_params, z)
    sync(img)
    dec_ms = (time.perf_counter() - t0) / 5 * 1e3

    # Null-text optimization inner step: UNet fwd+bwd wrt the uncond
    # embedding (inversion.py null_optimization; ported models are
    # differentiable flax, so this runs natively). Reference README.md:263
    # quotes ~2-3 min for the whole null-text pipeline on a "modern GPU";
    # worst case here is 50 timesteps x 10 inner steps. Under bf16 the
    # model computes in bf16 while the optimized embedding and its grad
    # stay f32 (cast inside the loss, standard mixed-precision training).
    unet = SDUNet(SDUNetConfig())
    lat1 = jnp.zeros((1, 4, 64, 64), dtype)
    u0 = jnp.zeros((1, 77, 768), jnp.float32)

    @jax.jit
    def nt_inner(params, uncond, lat, t, target):
        def loss(u):
            eps = unet.apply(params, lat, t, u.astype(dtype))
            return jnp.mean((eps.astype(jnp.float32) - target) ** 2)
        return jax.value_and_grad(loss)(uncond)

    _, g = nt_inner(model.unet_params, u0, lat1, jnp.float32(500),
                    lat1.astype(jnp.float32))
    sync(g)
    t0 = time.perf_counter()
    for _ in range(5):
        _, g = nt_inner(model.unet_params, u0, lat1, jnp.float32(500),
                        lat1.astype(jnp.float32))
    sync(g)
    nt_ms = (time.perf_counter() - t0) / 5 * 1e3

    return [
        {"metric": f"sd15_unet_cfg_step_512px_{tag}",
         "value": round(step_ms, 2), "unit": "ms"},
        {"metric": f"sd15_unet_step_512px_batch8_per_sample_{tag}",
         "value": round(b8_ms / 8, 2), "unit": "ms/sample"},
        {"metric": f"sd15_vae_decode_512px_{tag}",
         "value": round(dec_ms, 2), "unit": "ms"},
        {"metric": f"sd15_ddim_50step_estimate_{tag}",
         "value": round(50 * step_ms / 1e3 + dec_ms / 1e3, 2), "unit": "s"},
        {"metric": f"sd15_nulltext_inner_step_{tag}",
         "value": round(nt_ms, 2), "unit": "ms"},
        {"metric": f"sd15_nulltext_worst_case_estimate_{tag}",
         "value": round(500 * nt_ms / 1e3, 1), "unit": "s",
         "reference": "~2-3 min on a modern GPU (README.md:263)"},
    ]


def run_sd():
    """StereoDiffusion compute benchmarks, f32 and bf16 (VERDICT r2 item 2:
    bf16 mixed-precision SD inference, measured)."""
    import jax.numpy as jnp

    results = _measure_sd_stack(jnp.float32, "f32")
    results += _measure_sd_stack(jnp.bfloat16, "bf16")
    for r in results:
        print(json.dumps(r))
    return results


def run_sd_delta(seed=0):
    """bf16-vs-f32 OUTPUT delta on random SD-1.5-scale weights: decode the
    same latent through both stacks and report the post-VAE uint8 error
    (the quantization point the reference's images leave the pipeline at),
    plus the f32-vs-bf16 UNet eps error. Slower than --sd (full-scale
    random init)."""
    import jax
    import jax.numpy as jnp
    from comfystereo_tpu.diffusion import porting as porting_mod
    from comfystereo_tpu.diffusion.sd_unet import SDUNetConfig
    from comfystereo_tpu.diffusion.sd_vae import SDVAEConfig

    rng = jax.random.PRNGKey(seed)
    m32 = porting_mod.build_sd_model(unet_cfg=SDUNetConfig(),
                                     vae_cfg=SDVAEConfig(), rng=rng,
                                     init_mode="random", dtype=jnp.float32)
    m16 = porting_mod.build_sd_model(
        unet_cfg=SDUNetConfig(), vae_cfg=SDVAEConfig(),
        unet_params=m32.unet_params, vae_params=m32.vae_params,
        dtype=jnp.bfloat16)

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    lat = jax.random.normal(k1, (2, 4, 64, 64), jnp.float32)
    ctx = jax.random.normal(k2, (2, 77, 768), jnp.float32) * 0.4

    e32 = m32.unet_apply(m32.unet_params, lat, jnp.float32(500), ctx)
    e16 = m16.unet_apply(m16.unet_params, lat, jnp.float32(500), ctx)
    scale = float(jnp.abs(e32).mean())
    eps_err = float(jnp.abs(e32 - e16).mean()) / max(scale, 1e-9)

    # w8 (int8 weight storage) quality on the same weights: the HBM-
    # residency mode's cost vs full f32 (see porting.build_sd_model).
    mw8 = porting_mod.build_sd_model(
        unet_cfg=SDUNetConfig(), vae_cfg=SDVAEConfig(),
        unet_params=m32.unet_params, vae_params=m32.vae_params,
        dtype=jnp.bfloat16, weight_quant=True)
    ew8 = mw8.unet_apply(mw8.unet_params, lat, jnp.float32(500), ctx)
    w8_err = float(jnp.abs(e32 - ew8).mean()) / max(scale, 1e-9)

    d32 = m32.vae_decode(m32.vae_params, lat[:1])
    d16 = m16.vae_decode(m16.vae_params, lat[:1])

    def to_u8(x):
        return jnp.trunc(jnp.clip(x / 2 + 0.5, 0, 1) * 255).astype(jnp.uint8)

    du = jnp.abs(to_u8(d32).astype(jnp.int32) - to_u8(d16).astype(jnp.int32))
    results = [
        {"metric": "sd15_bf16_unet_eps_rel_err", "value": round(eps_err, 5),
         "unit": "mean_abs/scale"},
        {"metric": "sd15_w8_unet_eps_rel_err", "value": round(w8_err, 5),
         "unit": "mean_abs/scale"},
        {"metric": "sd15_bf16_vae_decode_u8_delta",
         "value": float(jnp.mean(du)), "unit": "mean_lsb",
         "max_lsb": int(jnp.max(du))},
    ]
    for r in results:
        print(json.dumps(r))
    return results


def run_video(h=720, w=1280, n_frames=48):
    """End-to-end Video2Stereo throughput: cv2 decode -> u8 upload ->
    device-fused convert+stereo -> u8 download -> cv2 encode, with the
    producer thread and one-chunk-in-flight device pipeline (BASELINE
    config #5's workflow shape, examples/Video2Stereo.json).

    NOTE: over the axon remote-TPU relay this measures the relay's ~9 MB/s
    device->host link, not the framework (a 12-frame 720p u8 chunk is
    33 MB); on a co-located TPU host the same path is PCIe-bound and the
    pipeline overlaps decode | compute | encode."""
    import tempfile

    import cv2
    from comfystereo_tpu.config import StereoConfig
    from comfystereo_tpu.utils import fixtures, video

    tmp = tempfile.mkdtemp(prefix="bench_video_")
    src, dep, out = (os.path.join(tmp, f) for f in
                     ("src.mp4", "dep.mp4", "out.mp4"))
    base_img = fixtures.create_test_image(h, w).astype(np.uint8)
    base_dm = np.stack([fixtures.create_depth_map(h, w)] * 3, -1
                       ).astype(np.uint8)
    for path, base in ((src, base_img), (dep, base_dm)):
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (w, h))
        for i in range(n_frames):
            wr.write(cv2.cvtColor(np.roll(base, 4 * i, axis=1),
                                  cv2.COLOR_RGB2BGR))
        wr.release()

    cfg = StereoConfig(modes=("left-right",), fill_technique="gpu_warp",
                       batch_size=12)
    video.convert_video(src, dep, out, cfg, progress=False)  # warm compile
    t0 = time.perf_counter()
    total = video.convert_video(src, dep, out, cfg, progress=False)
    dt = time.perf_counter() - t0
    result = {"metric": "video2stereo_720p_end_to_end",
              "value": round(total / dt, 2), "unit": "frames/sec",
              "frames": total}
    print(json.dumps(result))
    return result


def _cpu_model_slug() -> str:
    """Short CPU model identifier so the frozen baseline is only reused on
    genuinely comparable hosts (ADVICE r4: 'Nvcpu-arch' alone let any
    same-count host inherit a non-comparable denominator)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("model name"):
                    name = line.split(":", 1)[1].strip()
                    return "".join(c if c.isalnum() else "-"
                                   for c in name).strip("-")[:48]
    except OSError:
        pass
    return "unknown-cpu"


def _numba_baseline_fps(img_u8, dm255):
    """Honest denominator (VERDICT r4 weak #1): the reference's actual
    kernel family is numba `@njit(parallel=True)` with `prange` over rows
    (stereoimage_generation.py:1850-1992). When numba is importable this
    measures a freshly-written prange twin of the naive scatter (same
    swipe-order z-semantics) behind the shared numpy blur preamble — the
    apples-to-apples multicore number. Returns fps or None (numba absent,
    as in this image)."""
    try:
        import numba
    except ImportError:
        return None

    @numba.njit(parallel=True, cache=True)
    def scatter(img, dest, reverse):
        h, w, c = img.shape
        out = np.zeros_like(img)
        for y in numba.prange(h):
            if reverse:
                for x in range(w - 1, -1, -1):
                    d = dest[y, x]
                    for k in range(c):
                        out[y, d, k] = img[y, x, k]
            else:
                for x in range(w):
                    d = dest[y, x]
                    for k in range(c):
                        out[y, d, k] = img[y, x, k]
        return out

    def one_frame():
        # Identical preamble to the numpy twin; only the scatter differs.
        outs = [scatter(img_u8, dest, sign > 0)
                for dest, sign in _cpu_blur_and_offsets(img_u8, dm255)]
        return np.concatenate(outs, axis=1)

    one_frame()  # JIT warmup (excluded, as the reference caches its JIT)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            one_frame()
        best = min(best, (time.perf_counter() - t0) / 3)
    return 1.0 / best


def _frozen_cpu_baseline(img_u8, dm255):
    """CPU denominators, measured ONCE per host and frozen in
    BASELINE_CPU.json next to this file.

    Returns (cpu_fps, numba_fps_or_None, cores, host_label): the
    vectorized-numpy single-thread stand-in, plus — when numba is
    installed — the measured multicore numba twin (the honest reference
    denominator, VERDICT r4 weak #1)."""
    import platform

    host = (f"{os.cpu_count()}vcpu-{platform.machine()}"
            f"-{_cpu_model_slug()}")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_CPU.json")
    record = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                record = json.load(f)
        except (json.JSONDecodeError, OSError):
            record = {}
    if host in record:
        r = record[host]
        return (float(r["cpu_fps"]), r.get("numba_fps"),
                int(r.get("cores", os.cpu_count() or 1)), host)

    _cpu_reference_naive(img_u8, dm255)  # warm caches
    # best-of-3 x 3 reps: least-contended estimate for the frozen value
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            _cpu_reference_naive(img_u8, dm255)
        best = min(best, (time.perf_counter() - t0) / 3)
    cpu_fps = 1.0 / best
    numba_fps = _numba_baseline_fps(img_u8, dm255)
    record[host] = {"cpu_fps": round(cpu_fps, 4),
                    "numba_fps": (round(numba_fps, 4)
                                  if numba_fps else None),
                    "cores": os.cpu_count() or 1,
                    "measured": time.strftime("%Y-%m-%d"),
                    "what": "cpu_fps: vectorized-numpy twin of the "
                            "reference CPU naive path, 1080p single frame, "
                            "best-of-3x3; numba_fps: prange scatter twin "
                            "(null when numba is not installed)"}
    try:
        with open(path, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    return cpu_fps, numba_fps, os.cpu_count() or 1, host


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true",
                        help="benchmark all five BASELINE configs")
    parser.add_argument("--sd", action="store_true",
                        help="benchmark the SD-1.5-scale diffusion stack "
                             "(f32 + bf16)")
    parser.add_argument("--sd-delta", action="store_true",
                        help="bf16-vs-f32 output delta on random SD-scale "
                             "weights (slow: full-scale init)")
    parser.add_argument("--video", action="store_true",
                        help="end-to-end video decode->stereo->encode bench")
    parser.add_argument("--oracle-width", type=int, default=512,
                        help="validation width for the pure-python oracle")
    args = parser.parse_args()

    if args.sd:
        run_sd()
        return
    if args.sd_delta:
        run_sd_delta()
        return
    if args.video:
        run_video()
        return

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

    # CPU reference baseline (single frame; numpy stand-in for numba
    # kernels) — FROZEN per host class (VERDICT r3 item 7: re-measuring it
    # per run made vs_baseline swing 2-4x between identical-code runs for
    # host-contention reasons; ms/frame and fps/chip are the cross-round
    # comparables, vs_baseline is labeled with the host it was frozen on).
    img_u8 = (img0 * 255).astype(np.uint8)
    dm255 = (dm0 * 255).astype(np.float32)
    cpu_fps, numba_fps, cores, base_host = _frozen_cpu_baseline(img_u8,
                                                                dm255)

    # Honest multicore accounting (VERDICT r4 weak #1): when numba is
    # installed, vs_baseline divides by the MEASURED multicore numba twin.
    # When it isn't (this image), vs_baseline divides by the single-thread
    # numpy twin and an explicit 8-core-class projection is published next
    # to it: the reference kernels are prange-row-parallel, so assume
    # pessimistic (for us) linear scaling of the measured denominator to 8
    # cores.
    if numba_fps:
        den, den_kind = float(numba_fps), f"numba-{cores}core-measured"
        per_core = den / max(cores, 1)
    else:
        den, den_kind = cpu_fps, "numpy-1thread-standin"
        per_core = cpu_fps
    fps_8core_class = per_core * 8.0

    print(json.dumps({
        "metric": "1080p depth->SBS stereo frames/sec/chip",
        "value": round(tpu_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(tpu_fps / den, 2),
        "ms_per_frame": round(1e3 / tpu_fps, 3),
        "baseline_fps": round(den, 3),
        "baseline_kind": den_kind,
        "vs_baseline_8core_class": round(tpu_fps / fps_8core_class, 2),
        "baseline_host": base_host,
    }))

    if args.full:
        run_full(args.oracle_width)


if __name__ == "__main__":
    main()
