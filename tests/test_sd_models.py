"""SD-architecture flax modules + checkpoint porting.

Validates the from-scratch SD UNet/VAE against the real checkpoints'
ground truth (exact parameter counts, diffusers key layout) and the porting
machinery bidirectionally. Real weights are cache-gated in this image, so the
plumbing is what gets proven (VERDICT.md round-1 item 2).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfystereo_tpu.diffusion import porting
from comfystereo_tpu.diffusion.sd_unet import (
    SD15_INPAINT_UNET_CONFIG, SD15_UNET_CONFIG, SD21_UNET_CONFIG,
    SDUNet, SDUNetConfig, TINY_SD_UNET_CONFIG, sd_timestep_embedding)
from comfystereo_tpu.diffusion.sd_vae import (
    SD_VAE_CONFIG, SDVAE, TINY_SD_VAE_CONFIG)


def _count(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def tiny_unet_params():
    unet = SDUNet(TINY_SD_UNET_CONFIG)
    lat = jnp.zeros((2, 4, 8, 8))
    ctx = jnp.zeros((2, 77, 64))
    return unet, unet.init(jax.random.PRNGKey(0), lat, jnp.zeros(()), ctx)


@pytest.fixture(scope="module")
def tiny_vae_params():
    vae = SDVAE(TINY_SD_VAE_CONFIG)
    return vae, vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 32, 32)))


# --- architecture ground truth ------------------------------------------------

def test_sd15_unet_param_count_exact():
    """859,520,964 is the published SD-1.5 UNet size; an exact match pins the
    whole topology (block channels, attention dims, GEGLU, skips)."""
    cfg = SD15_UNET_CONFIG
    lat = jnp.zeros((1, cfg.in_channels, 8, 8))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    shapes = jax.eval_shape(
        lambda: SDUNet(cfg).init(jax.random.PRNGKey(0), lat, jnp.zeros(()),
                                 ctx))
    assert _count(shapes) == 859_520_964


def test_sd21_and_inpaint_param_counts_exact():
    for cfg, expect in [(SD21_UNET_CONFIG, 865_910_724),
                        (SD15_INPAINT_UNET_CONFIG, 859_535_364)]:
        lat = jnp.zeros((1, cfg.in_channels, 8, 8))
        ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
        shapes = jax.eval_shape(
            lambda: SDUNet(cfg).init(jax.random.PRNGKey(0), lat,
                                     jnp.zeros(()), ctx))
        assert _count(shapes) == expect


def test_sd_vae_param_count_exact():
    shapes = jax.eval_shape(
        lambda: SDVAE(SD_VAE_CONFIG).init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 3, 64, 64))))
    assert _count(shapes) == 83_653_863


def test_timestep_embedding_layout():
    emb = sd_timestep_embedding(jnp.array([0.0]), 8)
    # t=0: cos half = 1, sin half = 0 (flip_sin_to_cos layout).
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)


# --- forward passes -----------------------------------------------------------

def test_tiny_unet_forward_shapes(tiny_unet_params):
    unet, params = tiny_unet_params
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 64))
    out = unet.apply(params, lat, jnp.float32(42), ctx)
    assert out.shape == (2, 4, 8, 8)
    assert bool(jnp.isfinite(out).all())


def test_tiny_unet_stereo_attention_mode(tiny_unet_params):
    """BN attention changes the output only when active (self-attn layers)."""
    from comfystereo_tpu.diffusion.attention import AttentionMode

    unet, params = tiny_unet_params
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 64))
    mode = AttentionMode(stereo=True, direction="uni", use_cfg=False)
    base = unet.apply(params, lat, jnp.float32(42), ctx, mode=mode,
                      stereo_active=False)
    on = unet.apply(params, lat, jnp.float32(42), ctx, mode=mode,
                    stereo_active=True)
    assert not np.allclose(np.asarray(base), np.asarray(on))
    # With stereo on, the right eye's attention pulls from the left view.
    off = unet.apply(params, lat, jnp.float32(42), ctx)
    np.testing.assert_allclose(np.asarray(base), np.asarray(off), atol=1e-6)


def test_tiny_vae_roundtrip_shapes(tiny_vae_params):
    vae, params = tiny_vae_params
    img = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 32, 32)) * 2 - 1
    z = vae.apply(params, img, method=SDVAE.encode)
    # Tiny cfg has 2 blocks -> 1 downsample -> /2 (SD's real cfg is /8).
    assert z.shape == (1, 4, 16, 16)
    x = vae.apply(params, z, method=SDVAE.decode)
    assert x.shape == img.shape


# --- porting ------------------------------------------------------------------

def test_unet_port_roundtrip_exact(tiny_unet_params):
    _, params = tiny_unet_params
    sd = porting.flax_to_torch_state_dict(params)
    back = porting.torch_to_flax_params(sd)
    porting.check_port(params, back)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_keys_are_diffusers_layout(tiny_unet_params):
    _, params = tiny_unet_params
    keys = set(porting.flax_to_torch_state_dict(params))
    # Canonical diffusers UNet key spellings.
    for k in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.conv1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.resnets.1.norm2.weight",
        "mid_block.attentions.0.norm.weight",
        "up_blocks.0.resnets.0.conv_shortcut.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]:
        assert k in keys, k


def test_vae_port_roundtrip_and_legacy_naming(tiny_vae_params):
    _, params = tiny_vae_params
    sd = porting.flax_to_torch_state_dict(params)
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    assert "quant_conv.weight" in sd
    porting.check_port(params, porting.torch_to_flax_params(sd))
    # Pre-0.18 checkpoints: query/key/value/proj_attn + bare "norm".
    legacy = {}
    for k, v in sd.items():
        k2 = (k.replace("to_q", "query").replace("to_k", "key")
               .replace("to_v", "value").replace("to_out.0", "proj_attn")
               .replace("group_norm", "norm"))
        legacy[k2] = v
    porting.check_port(params, porting.torch_to_flax_params(legacy))


def test_port_transposes_and_norm_mapping():
    sd = {
        "conv_in.weight": np.arange(2 * 3 * 3 * 3,
                                    dtype=np.float32).reshape(2, 3, 3, 3),
        "conv_in.bias": np.zeros(2, np.float32),
        "time_embedding.linear_1.weight": np.arange(6, dtype=np.float32
                                                    ).reshape(2, 3),
        "conv_norm_out.weight": np.ones(4, np.float32),
        "foo.num_batches_tracked": np.zeros(1),  # dropped
    }
    tree = porting.torch_to_flax_params(sd)["params"]
    assert tree["conv_in"]["kernel"].shape == (3, 3, 3, 2)      # HWIO
    assert tree["time_embedding"]["linear_1"]["kernel"].shape == (3, 2)
    assert "scale" in tree["conv_norm_out"]
    assert "foo" not in tree
    # conv kernel content: OIHW -> HWIO element check
    o, i, h, w = 1, 2, 0, 1
    assert (tree["conv_in"]["kernel"][h, w, i, o]
            == sd["conv_in.weight"][o, i, h, w])


def test_check_port_reports_mismatches():
    ref = {"params": {"a": {"kernel": np.zeros((2, 2))}}}
    bad = {"params": {"a": {"kernel": np.zeros((3, 2))},
                      "b": {"bias": np.zeros(1)}}}
    with pytest.raises(ValueError) as ei:
        porting.check_port(ref, bad)
    msg = str(ei.value)
    assert "shape mismatch" in msg and "unexpected in port" in msg


def test_safetensors_reader_package_path(tmp_path):
    from safetensors.numpy import save_file

    tensors = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.bias": np.arange(5, dtype=np.float16),
    }
    p = str(tmp_path / "x.safetensors")
    save_file(tensors, p)
    loaded = porting.load_safetensors(p)
    np.testing.assert_array_equal(loaded["a.weight"], tensors["a.weight"])
    np.testing.assert_array_equal(loaded["b.bias"], tensors["b.bias"])


def test_safetensors_fallback_parser(tmp_path, monkeypatch):
    from safetensors.numpy import save_file

    tensors = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    p = str(tmp_path / "y.safetensors")
    save_file(tensors, p)
    import builtins

    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name.startswith("safetensors"):
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    loaded = porting.load_safetensors(p)
    np.testing.assert_array_equal(loaded["w"], tensors["w"])


def test_safetensors_bf16_upcast(tmp_path):
    """Hand-written BF16 payload -> float32 via the fallback bit shift."""
    import json
    import struct

    vals32 = np.array([1.0, -2.5, 3.25], dtype=np.float32)
    bf16 = (vals32.view(np.uint32) >> 16).astype(np.uint16)
    payload = bf16.tobytes()
    header = {"t": {"dtype": "BF16", "shape": [3],
                    "data_offsets": [0, len(payload)]}}
    hjson = json.dumps(header).encode()
    p = tmp_path / "bf16.safetensors"
    p.write_bytes(struct.pack("<Q", len(hjson)) + hjson + payload)
    # Force the fallback parser (the package may reject unaligned headers).
    import builtins
    real_import = builtins.__import__
    try:
        def blocked(name, *a, **k):
            if name.startswith("safetensors"):
                raise ImportError("blocked")
            return real_import(name, *a, **k)
        builtins.__import__ = blocked
        loaded = porting.load_safetensors(str(p))
    finally:
        builtins.__import__ = real_import
    np.testing.assert_allclose(loaded["t"], vals32, rtol=0.01)


def test_load_sd_from_diffusers_dir(tmp_path, tiny_unet_params,
                                    tiny_vae_params):
    """End-to-end: export tiny flax params as a diffusers-format model dir
    (safetensors), then load+port+validate+assemble a DiffusionModel."""
    from safetensors.numpy import save_file

    _, uparams = tiny_unet_params
    _, vparams = tiny_vae_params
    (tmp_path / "unet").mkdir()
    (tmp_path / "vae").mkdir()
    save_file({k: np.asarray(v) for k, v in
               porting.flax_to_torch_state_dict(uparams).items()},
              str(tmp_path / "unet" / "diffusion_pytorch_model.safetensors"))
    save_file({k: np.asarray(v) for k, v in
               porting.flax_to_torch_state_dict(vparams).items()},
              str(tmp_path / "vae" / "diffusion_pytorch_model.safetensors"))
    model = porting.load_sd_from_diffusers_dir(
        str(tmp_path), unet_cfg=TINY_SD_UNET_CONFIG,
        vae_cfg=TINY_SD_VAE_CONFIG)
    lat = jnp.zeros((2, 4, 8, 8))
    ctx = jnp.zeros((2, 77, 64))
    eps = model.unet_apply(model.unet_params, lat, jnp.float32(1), ctx)
    assert eps.shape == (2, 4, 8, 8)
    img = jnp.zeros((1, 3, 32, 32))
    z = model.vae_encode(model.vae_params, img)
    assert z.shape[1] == 4


def test_orbax_roundtrip(tmp_path, tiny_vae_params):
    _, params = tiny_vae_params
    path = str(tmp_path / "ckpt")
    porting.save_params_orbax(params, path)
    restored = porting.load_params_orbax(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- SD-shaped pipeline integration -------------------------------------------

@pytest.mark.slow
def test_build_sd_model_tiny_runs_pipelines():
    """text2stereo + warp_inpaint execute on the SD-architecture model
    (the adapter stack the reference exercises with real SD weights)."""
    from comfystereo_tpu.diffusion import porting as _p
    from comfystereo_tpu.diffusion import sd_pipeline

    model = _p.build_sd_model(unet_cfg=TINY_SD_UNET_CONFIG,
                              vae_cfg=TINY_SD_VAE_CONFIG)
    assert model.unet_in_channels == 4
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 3, 32, 32)) * 2 - 1
    depth = jnp.linspace(0, 1, 32 * 32).reshape(1, 32, 32)
    out = sd_pipeline.text2stereo(model, img, depth, "", scale_factor=5.0,
                                  num_inference_steps=4, seed=0)
    assert out.left.shape == (1, 32, 32, 3) and out.right.shape == out.left.shape
    img01 = jnp.transpose(img, (0, 2, 3, 1)) / 2 + 0.5
    out2 = sd_pipeline.warp_inpaint(model, img01, depth,
                                    num_inference_steps=3, seed=1)
    assert out2.right.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out2.right).all())


@pytest.mark.slow
def test_text2stereo_bf16_model_scan_carry():
    """Regression (ADVICE r3): the denoise scan's mask carry is explicit
    f32 — with a bf16-built model the latents are bf16 and a
    zeros_like(latents)-typed mask would trip lax.scan's carry dtype
    check at trace time."""
    from comfystereo_tpu.diffusion import porting as _p
    from comfystereo_tpu.diffusion import sd_pipeline

    model = _p.build_sd_model(unet_cfg=TINY_SD_UNET_CONFIG,
                              vae_cfg=TINY_SD_VAE_CONFIG,
                              dtype=jnp.bfloat16)
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 32, 32)) * 2 - 1
    depth = jnp.linspace(0, 1, 32 * 32).reshape(1, 32, 32)
    out = sd_pipeline.text2stereo(model, img, depth, "", scale_factor=5.0,
                                  num_inference_steps=4, seed=0)
    assert out.left.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(jnp.asarray(out.right, jnp.float32)).all())
    # Same check for the scanned PLMS inpaint path (its ets/latents
    # carries must stay f32 through the model's f32 interfaces).
    img01 = jnp.transpose(img, (0, 2, 3, 1)) / 2 + 0.5
    out2 = sd_pipeline.warp_inpaint(model, img01, depth,
                                    num_inference_steps=3, seed=1)
    assert out2.right.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(jnp.asarray(out2.right, jnp.float32)).all())


@pytest.mark.slow
def test_nine_channel_inpaint_unet_path():
    """9-ch SD-inpainting UNet: the loop concatenates mask + masked-image
    latents (reference model_wrappers.py:594-612)."""
    from comfystereo_tpu.diffusion import porting as _p
    from comfystereo_tpu.diffusion import sd_pipeline

    cfg9 = SDUNetConfig(in_channels=9, block_out_channels=(32, 64),
                        layers_per_block=1, cross_attention_dim=64,
                        attention_head_dim=4, norm_num_groups=8)
    seen = []
    model = _p.build_sd_model(unet_cfg=cfg9, vae_cfg=TINY_SD_VAE_CONFIG)
    assert model.unet_in_channels == 9
    inner = model.unet_apply

    def spy(params, latents, t, context, **kw):
        seen.append(latents.shape[1])
        return inner(params, latents, t, context, **kw)

    import dataclasses
    model = dataclasses.replace(model, unet_apply=spy)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32)) * 2 - 1
    mask = jnp.zeros((1, 1, 32, 32)).at[:, :, 8:16, 8:16].set(1.0)
    out = sd_pipeline.diffusion_inpaint(model, img, mask,
                                        num_inference_steps=3, seed=0)
    assert out.shape == (1, 3, 32, 32)
    assert seen and all(c == 9 for c in seen)  # every step used 9-ch input


@pytest.mark.slow
def test_sd_topology_512px_and_50_steps():
    """The reference's operating point is 512x512 at 50 steps
    (stereodiffusion_nodes.py:257-265). Real-SD-width forwards at that point
    run on the TPU (see NOTES.md r2 numbers); CI proves the plumbing with the
    same 4-block SD TOPOLOGY at reduced width: (a) 512x512 shapes flow
    through the adapter stack end-to-end, (b) a 50-step denoising loop
    compiles once and runs."""
    import dataclasses as dc

    from comfystereo_tpu.diffusion import porting as _p
    from comfystereo_tpu.diffusion import schedulers, sd_pipeline

    cfg = dc.replace(TINY_SD_UNET_CONFIG,
                     block_out_channels=(32, 32, 64, 64))
    model = _p.build_sd_model(unet_cfg=cfg, vae_cfg=TINY_SD_VAE_CONFIG)
    # (a) 512x512: one CFG UNet step + VAE decode at the real latent size.
    lat = jnp.zeros((2, 4, 64, 64))
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim))
    eps = model.unet_apply(model.unet_params, lat, jnp.float32(500), ctx)
    assert eps.shape == (2, 4, 64, 64)
    img = model.vae_decode(model.vae_params, lat[:1, :, :64, :64])
    assert img.shape[-2:] == (128, 128)  # tiny VAE is /2; SD's real cfg is /8
    # (b) 50 DDIM steps at a small latent (one compile, 50 launches).
    sched = schedulers.make_ddim(50)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    small_ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    for i in range(50):
        t = jnp.int32(sched.timesteps[i])
        e = model.unet_apply(model.unet_params, latents, t, small_ctx)
        latents = schedulers.ddim_step(sched, e, t, latents)
    assert bool(jnp.isfinite(latents).all())


def test_resolve_model_routing():
    from comfystereo_tpu.nodes.stereodiffusion import _resolve_model

    # A prebuilt bundle passes through untouched.
    from comfystereo_tpu.diffusion.models import make_toy_model

    toy = make_toy_model(image_size=32)
    assert _resolve_model(model=toy) is toy
    # Unavailable model_id degrades to the offline toy model.
    m = _resolve_model(model_id="nonexistent/model-id")
    assert hasattr(m, "unet_apply")


def test_bf16_inference_mode(tiny_unet_params, tiny_vae_params):
    """bf16 build (VERDICT r2 item 2): boundary casts make the model
    compute in bf16 (params stored bf16) while the interface stays f32,
    and the outputs track the f32 stack within bf16 tolerance."""
    from comfystereo_tpu.diffusion import porting as _p

    _, uparams = tiny_unet_params
    _, vparams = tiny_vae_params
    m32 = _p.build_sd_model(unet_cfg=TINY_SD_UNET_CONFIG,
                            vae_cfg=TINY_SD_VAE_CONFIG,
                            unet_params=uparams,
                            vae_params=vparams)
    m16 = _p.build_sd_model(unet_cfg=TINY_SD_UNET_CONFIG,
                            vae_cfg=TINY_SD_VAE_CONFIG,
                            unet_params=uparams,
                            vae_params=vparams,
                            dtype=jnp.bfloat16)
    leaf = jax.tree.leaves(m16.unet_params)[0]
    assert leaf.dtype == jnp.bfloat16

    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 64)) * 0.3
    e32 = m32.unet_apply(m32.unet_params, lat, jnp.float32(500), ctx)
    e16 = m16.unet_apply(m16.unet_params, lat, jnp.float32(500), ctx)
    assert e16.dtype == jnp.float32  # f32 at the interface
    scale = float(jnp.abs(e32).mean()) + 1e-9
    assert float(jnp.abs(e32 - e16).mean()) / scale < 0.1

    img = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 32, 32)) * 0.5
    z32 = m32.vae_encode(m32.vae_params, img)
    z16 = m16.vae_encode(m16.vae_params, img)
    assert z16.dtype == jnp.float32
    zs = float(jnp.abs(z32).mean()) + 1e-9
    assert float(jnp.abs(z32 - z16).mean()) / zs < 0.1
