"""Port-at-scale validation without network (VERDICT r2 item 5).

Synthesizes a FULL SD-1.5-shaped diffusers checkpoint directory — 859M-param
UNet, 84M VAE written in the legacy pre-0.18 attention naming
(query/key/value/proj_attn as [C,C,1,1] convs + 'norm' group norms), 123M
CLIP text encoder, BPE tokenizer files — with random values, loads it
through `load_sd_from_diffusers_dir`, and checks:

  * every port passes check_port at full scale (tree structure + shapes);
  * the VAE mid-block forward matches a hand-written torch mid-block on the
    SAME weights (numerics through the legacy-attention squeeze path);
  * the full-scale UNet and text encoder execute and produce finite output.

The reference's equivalent surface is model_loader.py:22-95 (downloads the
same directories and trusts diffusers to load them).
"""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfystereo_tpu.diffusion import porting
from comfystereo_tpu.diffusion.clip_text import CLIPTextModel, SD15_TEXT_CONFIG
from comfystereo_tpu.diffusion.sd_unet import SDUNet, SD15_UNET_CONFIG
from comfystereo_tpu.diffusion.sd_vae import (
    SDVAE, SD_VAE_CONFIG, _VAEMidBlock)

pytestmark = pytest.mark.slow


def _random_torch_sd(init_fn, seed, scale=0.02):
    """Random numpy arrays for every leaf of a flax init tree (via
    eval_shape — no device compute), exported to the torch key layout."""
    shapes = jax.eval_shape(init_fn)
    rng = np.random.default_rng(seed)
    params = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape).astype(np.float32) * scale
                   if np.prod(s.shape) else np.zeros(s.shape, np.float32)),
        shapes)
    return porting.flax_to_torch_state_dict(params)


def _legacy_vae_attention(sd):
    """Rewrite modern VAE attention keys to the legacy pre-0.18 diffusers
    layout: query/key/value as [C,C,1,1] conv weights, proj_attn, and the
    attention GroupNorm named plain 'norm'."""
    legacy = {}
    ren = {"to_q": "query", "to_k": "key", "to_v": "value"}
    for k, v in sd.items():
        if ".attentions." in k:
            parts = k.split(".")
            i = next(j for j, p in enumerate(parts) if p == "attentions")
            mod = parts[i + 2]
            if mod in ren:
                name, rest = ren[mod], parts[i + 3:]
            elif mod == "to_out":
                name, rest = "proj_attn", parts[i + 4:]
            elif mod == "group_norm":
                name, rest = "norm", parts[i + 3:]
            else:
                legacy[k] = v
                continue
            if name in ("query", "key", "value", "proj_attn") \
                    and rest[-1] == "weight":
                v = v[:, :, None, None]  # Linear -> 1x1 conv storage
            legacy[".".join(parts[:i + 2] + [name] + rest)] = v
        else:
            legacy[k] = v
    return legacy


@pytest.fixture(scope="module")
def sd15_checkpoint_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sd15_ckpt")

    unet_init = lambda: SDUNet(SD15_UNET_CONFIG).init(  # noqa: E731
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.zeros(()),
        jnp.zeros((1, 77, 768)))
    vae_init = lambda: SDVAE(SD_VAE_CONFIG).init(  # noqa: E731
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    text_init = lambda: CLIPTextModel(SD15_TEXT_CONFIG).init(  # noqa: E731
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))

    unet_sd = _random_torch_sd(unet_init, seed=1)
    assert sum(v.size for v in unet_sd.values()) == 859_520_964
    vae_sd = _legacy_vae_attention(_random_torch_sd(vae_init, seed=2))
    assert any(".query.weight" in k for k in vae_sd)
    text_sd = _random_torch_sd(text_init, seed=3)
    assert sum(v.size for v in text_sd.values()) == 123_060_480

    for sub, sd, fname in [("unet", unet_sd,
                            "diffusion_pytorch_model.safetensors"),
                           ("vae", vae_sd,
                            "diffusion_pytorch_model.safetensors"),
                           ("text_encoder", text_sd, "model.safetensors")]:
        d = root / sub
        d.mkdir()
        porting.save_safetensors(sd, str(d / fname))

    with open(root / "text_encoder" / "config.json", "w") as f:
        json.dump({"hidden_size": 768, "num_hidden_layers": 12,
                   "num_attention_heads": 12, "intermediate_size": 3072,
                   "vocab_size": 49408, "hidden_act": "quick_gelu"}, f)

    # minimal BPE files (real vocab is checkpoint data; mechanics are what
    # the loader exercises)
    tok = root / "tokenizer"
    tok.mkdir()
    chars = list("abcdefghijklmnopqrstuvwxyz ")
    vocab = {}
    for c in chars:
        vocab.setdefault(c, len(vocab))
        vocab.setdefault(c + "</w>", len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(tok / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tok / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")

    return root, vae_sd


def test_load_full_scale_checkpoint(sd15_checkpoint_dir):
    root, vae_sd = sd15_checkpoint_dir
    model = porting.load_sd_from_diffusers_dir(str(root))

    # Tree structure validated at scale by check_port inside the loader;
    # spot-check the counts and the legacy attention squeeze.
    n_unet = sum(int(np.prod(l.shape))
                 for l in jax.tree.leaves(model.unet_params))
    assert n_unet == 859_520_964
    q = model.vae_params["params"]["encoder"]["mid_block"]["attentions_0"][
        "to_q"]["kernel"]
    assert q.ndim == 2

    # VAE mid-block numerics: flax on ported weights vs a hand-written
    # torch mid-block on the SAME (legacy-layout) weights.
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    c, groups, eps = 512, 32, 1e-6
    prefix = "encoder.mid_block."
    w = {k[len(prefix):]: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in vae_sd.items() if k.startswith(prefix)}

    def t_resnet(h, p):
        h2 = F.conv2d(F.silu(F.group_norm(
            h, groups, w[p + "norm1.weight"], w[p + "norm1.bias"], eps)),
            w[p + "conv1.weight"], w[p + "conv1.bias"], padding=1)
        h2 = F.conv2d(F.silu(F.group_norm(
            h2, groups, w[p + "norm2.weight"], w[p + "norm2.bias"], eps)),
            w[p + "conv2.weight"], w[p + "conv2.bias"], padding=1)
        return h + h2

    def t_mid(x):
        h = t_resnet(x, "resnets.0.")
        a = "attentions.0."
        y = F.group_norm(h, groups, w[a + "norm.weight"],
                         w[a + "norm.bias"], eps)
        b, ch, hh, ww = y.shape
        t = y.reshape(b, ch, hh * ww).permute(0, 2, 1)
        q = t @ w[a + "query.weight"][:, :, 0, 0].T + w[a + "query.bias"]
        k = t @ w[a + "key.weight"][:, :, 0, 0].T + w[a + "key.bias"]
        v = t @ w[a + "value.weight"][:, :, 0, 0].T + w[a + "value.bias"]
        attn = torch.softmax(q @ k.transpose(1, 2) * ch ** -0.5, dim=-1)
        o = attn @ v @ w[a + "proj_attn.weight"][:, :, 0, 0].T \
            + w[a + "proj_attn.bias"]
        h = h + o.permute(0, 2, 1).reshape(b, ch, hh, ww)
        return t_resnet(h, "resnets.1.")

    x = np.random.default_rng(7).standard_normal((1, c, 8, 8)).astype(
        np.float32)
    with torch.no_grad():
        want = t_mid(torch.from_numpy(x)).numpy()

    sub = {"params": model.vae_params["params"]["encoder"]["mid_block"]}
    got = _VAEMidBlock(c, groups).apply(
        sub, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # Full-scale UNet executes (859M params wired end to end).
    eps_out = model.unet_apply(
        model.unet_params, jnp.zeros((1, 4, 8, 8)), jnp.float32(500),
        jnp.zeros((1, 77, 768)))
    assert eps_out.shape == (1, 4, 8, 8)
    assert bool(jnp.isfinite(eps_out).all())

    # Text encoder came from the checkpoint (not the hash stub) and runs.
    from comfystereo_tpu.diffusion.clip_text import NativeCLIPTextEncoder

    assert isinstance(model.text_encode, NativeCLIPTextEncoder)
    emb = model.text_encode("a cat")
    assert emb.shape == (1, 77, 768)
    assert bool(jnp.isfinite(emb).all())


def test_inpaint_9ch_unet_at_sd_scale():
    """VERDICT r4 weak #5: the 9-channel concat path (sd_pipeline.
    diffusion_inpaint) had only run through toy-config UNets. Here the
    scanned PLMS loop runs through a FULL SD-inpainting config —
    in_channels=9, block widths (320,640,1280,1280), ctx 768 — so the
    [latents | mask | masked-image latents] concat, the CFG doubling, and
    the strength-based step skipping all execute at SD shape.
    Reference surface: model_wrappers.py:594-612 (9-ch concat) + :557-593
    (PNDM loop). Zero weights via eval_shape keep the 860M init cheap;
    the assertions are wiring/shape/finiteness, not numerics (the
    activation goldens + torch parity tests own numerics)."""
    from comfystereo_tpu.diffusion import sd_pipeline
    from comfystereo_tpu.diffusion.porting import build_sd_model
    from comfystereo_tpu.diffusion.sd_unet import SD15_INPAINT_UNET_CONFIG

    assert SD15_INPAINT_UNET_CONFIG.in_channels == 9
    model = build_sd_model(unet_cfg=SD15_INPAINT_UNET_CONFIG,
                           init_mode="zeros")
    assert model.unet_in_channels == 2 * model.latent_channels + 1

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 128, 128))
                      .astype(np.float32))
    mask = jnp.zeros((1, 1, 128, 128)).at[:, :, 40:90, 30:100].set(1.0)

    out = sd_pipeline.diffusion_inpaint(
        model, img, mask, prompt="a red ball",
        num_inference_steps=3, strength=0.8, guidance_scale=7.5, seed=11)
    assert out.shape == img.shape
    assert bool(jnp.isfinite(out).all())
