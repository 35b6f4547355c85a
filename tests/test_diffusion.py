"""StereoDiffusion subsystem tests: schedulers, latent shift, BN attention,
inversion round trip, and both generation paths on the toy model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comfystereo_tpu import diffusion
from comfystereo_tpu.diffusion import schedulers


# ---------------------------------------------------------------------------
# Schedulers
# ---------------------------------------------------------------------------

def test_ddim_step_next_step_roundtrip():
    sched = schedulers.make_ddim(50)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    t = jnp.int32(sched.timesteps[10])
    fwd = schedulers.ddim_next_step(sched, eps, t, x)
    back = schedulers.ddim_step(sched, eps, t, fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_ddim_timesteps_descending():
    sched = schedulers.make_ddim(50)
    assert (np.diff(sched.timesteps) < 0).all()
    assert len(sched.timesteps) == 50


def test_add_noise_snr_monotone():
    sched = schedulers.make_ddim(50)
    x = jnp.ones((1, 4, 8, 8))
    n = jax.random.normal(jax.random.PRNGKey(0), x.shape)
    lo = schedulers.add_noise(sched, x, n, jnp.int32(10))
    hi = schedulers.add_noise(sched, x, n, jnp.int32(900))
    assert float(jnp.abs(hi - x).mean()) > float(jnp.abs(lo - x).mean())


def test_strength_skipping():
    sched = schedulers.make_ddim(20)
    ts = schedulers.pndm_skip_timesteps(sched, 0.5)
    assert len(ts) == 10


# ---------------------------------------------------------------------------
# Latent stereo shift (oracle: loop-exact reimplementation of
# stereo_shift_torch semantics, stereo_utils.py:15-88)
# ---------------------------------------------------------------------------

def _oracle_shift(images, depth, scale_factor, exponent=1.0):
    b, c, h, w = images.shape
    dmin, dmax = depth.min(), depth.max()
    nd = (depth - dmin) / (dmax - dmin) if dmax > dmin else np.zeros_like(depth)
    out = np.zeros_like(images)
    spx = (scale_factor / 100.0) * w
    for bi in range(b):
        for r in range(h):
            cols = range(w) if spx < 0 else range(w - 1, -1, -1)
            for col in cols:
                cd = col + int((nd[bi, r, col] ** exponent) * spx)
                if 0 <= cd < w:
                    out[bi, :, r, cd] = images[bi, :, r, col]
    return out


@pytest.mark.parametrize("scale", [8.0, -6.0])
def test_stereo_shift_matches_oracle(scale):
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(1, 4, 12, 24)).astype(np.float32)
    depth = rng.uniform(0, 1, (1, 12, 24)).astype(np.float32)
    got = diffusion.stereo_shift(jnp.asarray(imgs), jnp.asarray(depth),
                                 scale_factor=scale)
    got = np.asarray(got)
    np.testing.assert_allclose(got[:1], imgs, atol=0)          # left unshifted
    want_right = _oracle_shift(imgs, depth, -scale)
    np.testing.assert_allclose(got[1:], want_right, atol=1e-6)


def test_stereo_shift_both():
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(1, 4, 8, 16)).astype(np.float32)
    depth = rng.uniform(0, 1, (1, 8, 16)).astype(np.float32)
    got = np.asarray(diffusion.stereo_shift(
        jnp.asarray(imgs), jnp.asarray(depth), 8.0, shift_both=True))
    np.testing.assert_allclose(got[:1], _oracle_shift(imgs, depth, 4.0), atol=1e-6)
    np.testing.assert_allclose(got[1:], _oracle_shift(imgs, depth, -4.0), atol=1e-6)


# ---------------------------------------------------------------------------
# BN attention
# ---------------------------------------------------------------------------

def test_bn_attention_inactive_equals_standard():
    rng = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(rng, (3, 4, 2, 16, 8))
    mode = diffusion.AttentionMode(stereo=True, use_cfg=True)
    base = diffusion.attention.standard_attention(q, k, v, 0.35)
    out = diffusion.bn_attention(q, k, v, 0.35, is_cross=False, mode=mode,
                                 active=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_bn_attention_uni_right_sees_left():
    # With 'uni', the right view's output is computed against LEFT keys/values
    # only: changing the right view's k/v must not change anything.
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (4, 2, 16, 8))   # [uL,uR,cL,cR]
    k = jax.random.normal(jax.random.PRNGKey(2), (4, 2, 16, 8))
    v = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 16, 8))
    mode = diffusion.AttentionMode(stereo=True, direction="uni", use_cfg=True)
    out1 = diffusion.bn_attention(q, k, v, 0.35, is_cross=False, mode=mode,
                                  active=True)
    k2 = k.at[1].set(0.0).at[3].set(0.0)        # zero the right views' keys
    v2 = v.at[1].set(0.0).at[3].set(0.0)
    out2 = diffusion.bn_attention(q, k2, v2, 0.35, is_cross=False, mode=mode,
                                  active=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_bn_attention_bi_uses_both():
    rng = jax.random.PRNGKey(1)
    q, k, v = jax.random.normal(rng, (3, 4, 2, 16, 8))
    mode = diffusion.AttentionMode(stereo=True, direction="bi", use_cfg=True)
    out1 = diffusion.bn_attention(q, k, v, 0.35, is_cross=False, mode=mode,
                                  active=True)
    v2 = v.at[1].set(0.0)
    out2 = diffusion.bn_attention(q, k, v2, 0.35, is_cross=False, mode=mode,
                                  active=True)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_standard_attention_bf16_close_to_f32():
    # The bf16 path materializes the logit matrix in bf16 (HBM-bound 2x on
    # TPU) while exp/sum/divide stay f32; the result must stay within bf16
    # rounding of the f32 reference (softmax outputs are O(1), so atol
    # ~ a few bf16 ulps).
    rng = jax.random.PRNGKey(7)
    q, k, v = jax.random.normal(rng, (3, 2, 4, 64, 40), jnp.float32)
    ref = diffusion.attention.standard_attention(q, k, v, 40 ** -0.5)
    out = diffusion.attention.standard_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), 40 ** -0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.04)


# ---------------------------------------------------------------------------
# End-to-end on the toy model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def toy():
    return diffusion.make_toy_model(image_size=32)


def test_inversion_shapes_and_recon(toy):
    img = jnp.zeros((1, 3, 32, 32))
    res = diffusion.inversion.invert(toy, img, "a photo", num_ddim_steps=4,
                                     num_inner_steps=2,
                                     null_text_optimization=True)
    assert res.latents.shape[0] == 5
    assert res.uncond_embeddings.shape[0] == 4
    assert np.isfinite(np.asarray(res.latents)).all()


@pytest.mark.parametrize("deblur", [True, False])
def test_text2stereo_scan_matches_per_step_loop(toy, deblur):
    """The scanned denoising loop (sd_pipeline._denoise_scan) must
    reproduce the per-step host loop it replaced exactly: same shift /
    re-shift / deblur decisions at the same step indices, same key
    sequence for the deblur noise, same scheduler math."""
    from comfystereo_tpu.diffusion import sd_pipeline
    from comfystereo_tpu.diffusion.attention import AttentionMode
    from comfystereo_tpu.diffusion.stereo_latent import stereo_shift_with_mask

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0, 1, (1, 32, 32)).astype(np.float32))
    steps, gscale, sfactor, seed = 6, 7.5, 5.0, 3

    out = sd_pipeline.text2stereo(toy, img, depth, "p",
                                  num_inference_steps=steps, deblur=deblur,
                                  guidance_scale=gscale,
                                  scale_factor=sfactor, seed=seed,
                                  null_text_optimization=False)

    # -- oracle: the pre-scan per-step loop, verbatim semantics ------------
    sched = schedulers.make_ddim(steps)
    inv = sd_pipeline.invert(toy, img, "p", num_ddim_steps=steps,
                             null_text_optimization=False)
    cond = toy.text_encode("p")
    lh, lw = inv.latents.shape[-2:]
    depth_lat = jax.image.resize(depth, (1, lh, lw), "bilinear")
    shift_every = max(int(steps * 0.2), 1)
    start_step = shift_every
    mode = AttentionMode(stereo=True, direction="uni", use_cfg=True)
    loop_rng = jax.random.PRNGKey(seed)
    latents = jnp.concatenate([inv.latents[-1]] * 2, axis=0)
    mask = None
    for i in range(steps):
        t = jnp.int32(sched.timesteps[i])
        active = i >= start_step
        if i == start_step or (active and i % shift_every == 0
                               and mask is not None):
            left = latents[:1]
            shifted, hit = stereo_shift_with_mask(left, depth_lat, sfactor)
            if mask is None:
                mask = hit[:, None].astype(jnp.float32)
                right = shifted
                if deblur:
                    loop_rng, sub = jax.random.split(loop_rng)
                    noise = jax.random.normal(sub, shifted.shape)
                    right = jnp.where(mask > 0.5, shifted, noise)
            else:
                right = jnp.where(mask > 0.5, shifted, latents[1:])
            latents = jnp.concatenate([left, right], axis=0)
        u_i = inv.uncond_embeddings[min(i, len(inv.uncond_embeddings) - 1)]
        ctx = jnp.concatenate([jnp.repeat(u_i, 2, axis=0),
                               jnp.repeat(cond, 2, axis=0)], axis=0)
        eps = toy.unet_apply(toy.unet_params,
                             jnp.concatenate([latents] * 2, axis=0), t,
                             ctx, mode=mode, stereo_active=active)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps = eps_u + gscale * (eps_c - eps_u)
        latents = schedulers.scheduler_step(sched, eps, t, latents)
    images = sd_pipeline._nan_guard(sd_pipeline._to_01(
        sd_pipeline.latent_to_image(toy, latents)))

    np.testing.assert_allclose(np.asarray(out.left),
                               np.asarray(images[:1]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.right),
                               np.asarray(images[1:]), atol=2e-6)


def test_text2stereo_runs(toy):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0, 1, (1, 32, 32)).astype(np.float32))
    out = diffusion.text2stereo(toy, img, depth, "prompt",
                                num_inference_steps=5,
                                null_text_optimization=False)
    assert out.left.shape == (1, 32, 32, 3)
    assert out.right.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out.right)).all()


def test_warp_inpaint_runs(toy):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0, 1, (1, 32, 32)).astype(np.float32))
    out = diffusion.warp_inpaint(toy, img, depth, "prompt",
                                 num_inference_steps=4)
    assert out.right.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out.right)).all()
    # left eye passthrough
    np.testing.assert_allclose(np.asarray(out.left), np.asarray(img))


def test_warp_inpaint_batched_equals_per_frame(toy):
    """The frame-batched Fast path (one scanned device program for all
    frames, per-frame seeds — reference runs a python loop with
    seed+frame_idx, stereodiffusion_nodes.py:379-381) produces the same
    result as processing each frame alone: per-frame PRNG chains are
    independent of batch packing, and no cross-frame leakage exists in the
    scanned PLMS inpaint loop."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    seeds = 7 + np.arange(3, dtype=np.uint64)
    batched = diffusion.warp_inpaint(toy, img, depth, "p",
                                     num_inference_steps=4, seed=seeds)
    for i in range(3):
        single = diffusion.warp_inpaint(toy, img[i:i + 1], depth[i:i + 1],
                                        "p", num_inference_steps=4,
                                        seed=int(seeds[i]))
        np.testing.assert_allclose(np.asarray(batched.right[i]),
                                   np.asarray(single.right[0]),
                                   atol=1e-5, rtol=1e-5)
