"""Checkpoint porting: diffusers/torch state_dicts -> flax parameter trees.

The reference downloads diffusers-format SD checkpoints and runs them in
torch (model_loader.py:22-141). The TPU path instead PORTS the weights into
the from-scratch flax SD modules (`sd_unet.SDUNet`, `sd_vae.SDVAE`), whose
parameter trees mirror the torch key structure by construction:

    torch  down_blocks.0.resnets.1.conv1.weight        (OIHW)
    flax   params/down_blocks_0/resnets_1/conv1/kernel (HWIO)

Port rules (all derivable from the array rank):
  * 4-D ``weight``  -> ``kernel`` transposed OIHW -> HWIO   (conv)
  * 2-D ``weight``  -> ``kernel`` transposed                (linear)
  * 1-D ``weight``  -> ``scale``                            (group/layer norm)
  * ``bias``        -> ``bias``
Legacy VAE attention names (query/key/value/proj_attn) are normalized to the
modern to_q/to_k/to_v/to_out.0 first; 1x1-conv attention projections stored
as 4-D are squeezed to linear.

Also provides safetensors loading (single files and diffusers model
directories) and orbax save/load so ported checkpoints round-trip natively.
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Tuple

import numpy as np

# Legacy diffusers VAE attention naming -> modern (pre-0.18 checkpoints).
# NOTE: legacy "attentions.N.norm" also maps to group_norm, but only inside
# VAE attention blocks — handled contextually in normalize_torch_key (the
# UNet Transformer2D legitimately owns a GroupNorm named "norm").
_LEGACY_ATTN = {"query": "to_q", "key": "to_k", "value": "to_v",
                "proj_attn": "to_out.0"}

_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into numpy arrays.

    Uses the safetensors package when present; otherwise parses the format
    directly (8-byte little-endian header length + JSON header + raw buffer).
    bfloat16 tensors are upcast to float32 (numpy has no bf16).
    """
    try:
        from safetensors.numpy import load_file

        return dict(load_file(path))
    except Exception:
        pass
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = 8 + hlen
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            dt = meta["dtype"]
            start, end = meta["data_offsets"]
            f.seek(base + start)
            raw = f.read(end - start)
            if dt == "BF16":  # upcast via bit manipulation
                u16 = np.frombuffer(raw, dtype=np.uint16)
                arr = (u16.astype(np.uint32) << 16).view(np.float32)
            else:
                arr = np.frombuffer(raw, dtype=_SAFETENSORS_DTYPES[dt])
            out[name] = arr.reshape(meta["shape"])
    return out


def _merge_digit_parts(parts: Iterable[str]) -> Tuple[str, ...]:
    """['down_blocks','0','resnets','1'] -> ('down_blocks_0','resnets_1')."""
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return tuple(merged)


def normalize_torch_key(key: str, legacy_vae_attn: bool = False) -> str:
    """Map legacy attention naming onto the modern layout.

    `legacy_vae_attn` is a state-dict-level property (any ``.query.`` key
    present): legacy VAE attention blocks also named their GroupNorm "norm",
    which must become "group_norm" — but ONLY then, because the UNet
    Transformer2D legitimately owns a GroupNorm named "norm".
    """
    parts = [_LEGACY_ATTN.get(p, p) for p in key.split(".")]
    if legacy_vae_attn and "attentions" in key:
        parts = ["group_norm" if p == "norm" else p for p in parts]
    return ".".join(parts)


def torch_to_flax_params(state_dict: Mapping[str, Any],
                         strip_prefix: str = "") -> Dict[str, Any]:
    """Convert a torch state_dict (tensors or numpy) to a flax param tree
    (the ``{'params': ...}`` wrapper included)."""
    params: Dict[str, Any] = {}
    legacy_vae_attn = any(".query." in k for k in state_dict)
    for key, value in state_dict.items():
        if strip_prefix:
            if not key.startswith(strip_prefix):
                continue
            key = key[len(strip_prefix):]
        key = normalize_torch_key(key, legacy_vae_attn)
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value)
        path = _merge_digit_parts(key.split("."))
        leaf = path[-1]
        if leaf == "weight":
            if arr.ndim == 4 and arr.shape[-2:] == (1, 1) and "attn" in key:
                arr = arr[:, :, 0, 0]  # legacy 1x1-conv attention projection
            if arr.ndim == 4:
                new_leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                new_leaf, arr = "kernel", arr.T
            elif arr.ndim == 1:
                new_leaf = "scale"
            else:
                continue
        elif leaf == "bias":
            new_leaf = "bias"
        else:  # num_batches_tracked, position_ids, ...
            continue
        node = params
        for name in path[:-1]:
            node = node.setdefault(name, {})
        node[new_leaf] = arr
    return {"params": params}


def flax_to_torch_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `torch_to_flax_params` (diffusers-style keys, OIHW/linear
    layouts). Used for export and for round-trip validation in tests."""
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}

    # Names where a trailing _<digit> is literal diffusers spelling, not a
    # list index (TimestepEmbedding's linear_1/linear_2).
    literal = {"linear_1", "linear_2"}

    def walk(node, path):
        for name, child in node.items():
            if isinstance(child, Mapping):
                walk(child, path + [name])
                continue
            arr = np.asarray(child)
            parts = []
            for p in path + []:
                head, _, idx = p.rpartition("_")
                if head and idx.isdigit() and p not in literal:
                    parts.extend([head, idx])
                else:
                    parts.append(p)
            if name == "kernel":
                leaf = "weight"
                arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
            elif name == "scale":
                leaf = "weight"
            else:
                leaf = "bias"
            out[".".join(parts + [leaf])] = arr

    walk(tree, [])
    return out


def tree_shapes(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Tuple]:
    flat = {}
    for name, child in tree.items():
        path = f"{prefix}/{name}" if prefix else name
        if isinstance(child, Mapping):
            flat.update(tree_shapes(child, path))
        else:
            flat[path] = tuple(np.shape(child))
    return flat


def check_port(reference_params: Mapping[str, Any],
               ported_params: Mapping[str, Any]) -> None:
    """Assert the ported tree matches the model-init tree exactly (same
    paths, same shapes); raises ValueError listing every mismatch."""
    ref = tree_shapes(reference_params)
    got = tree_shapes(ported_params)
    problems = []
    for k in sorted(set(ref) | set(got)):
        if k not in got:
            problems.append(f"missing in port: {k} {ref[k]}")
        elif k not in ref:
            problems.append(f"unexpected in port: {k} {got[k]}")
        elif ref[k] != got[k]:
            problems.append(f"shape mismatch {k}: model {ref[k]} vs "
                            f"checkpoint {got[k]}")
    if problems:
        raise ValueError("checkpoint port mismatch:\n  " +
                         "\n  ".join(problems[:50]) +
                         ("" if len(problems) <= 50 else
                          f"\n  ... and {len(problems) - 50} more"))


# ---------------------------------------------------------------------------
# Model assembly
# ---------------------------------------------------------------------------

def _jnp_tree(tree, dtype):
    import jax.numpy as jnp

    return {k: _jnp_tree(v, dtype) if isinstance(v, Mapping)
            else jnp.asarray(v, dtype=dtype) for k, v in tree.items()}


def build_sd_model(unet_cfg=None, vae_cfg=None, unet_params=None,
                   vae_params=None, text_encode: Optional[Callable] = None,
                   rng=None, dtype=None):
    """Assemble a `DiffusionModel` bundle from the flax SD modules.

    With params=None the module is randomly initialized (SD-shaped random
    weights — the test/validation mode; real weights are cache-gated in this
    environment, so the plumbing is what gets proven, per the reference's own
    operating point of 512x512 latents at 50 steps).
    """
    import jax
    import jax.numpy as jnp

    from .models import DiffusionModel, HashTextEncoder
    from .sd_unet import SDUNet, SD15_UNET_CONFIG
    from .sd_vae import SDVAE, SD_VAE_CONFIG

    unet_cfg = unet_cfg or SD15_UNET_CONFIG
    vae_cfg = vae_cfg or SD_VAE_CONFIG
    dtype = dtype or jnp.float32
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)

    unet = SDUNet(unet_cfg)
    vae = SDVAE(vae_cfg)
    if unet_params is None:
        lat = jnp.zeros((1, unet_cfg.in_channels, 8, 8))
        ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
        unet_params = unet.init(r1, lat, jnp.zeros(()), ctx)
    if vae_params is None:
        img = jnp.zeros((1, vae_cfg.in_channels, 32, 32))
        vae_params = vae.init(r2, img)
    unet_params = _jnp_tree(unet_params, dtype)
    vae_params = _jnp_tree(vae_params, dtype)

    def unet_apply(params, latents, t, context, mode=None, stereo_active=False):
        from .attention import AttentionMode

        return unet.apply(params, latents, t, context,
                          mode=mode or AttentionMode(),
                          stereo_active=stereo_active)

    return DiffusionModel(
        unet_apply=unet_apply,
        unet_params=unet_params,
        vae_encode=lambda p, x: vae.apply(p, x, method=SDVAE.encode),
        vae_decode=lambda p, z: vae.apply(p, z, method=SDVAE.decode),
        vae_params=vae_params,
        text_encode=text_encode or HashTextEncoder(
            dim=unet_cfg.cross_attention_dim),
        latent_channels=vae_cfg.latent_channels,
        context_dim=unet_cfg.cross_attention_dim,
        unet_in_channels=unet_cfg.in_channels,
    )


def load_sd_from_diffusers_dir(model_dir: str, unet_cfg=None, vae_cfg=None,
                               text_encode=None, dtype=None):
    """Load a diffusers-format model directory (unet/ + vae/ safetensors)
    into the flax SD modules; validates the port against the module's own
    init tree. Equivalent to the reference's load_sd_model
    (model_loader.py:22-93) minus the download."""
    import jax

    from .sd_unet import SDUNet, SD15_UNET_CONFIG
    from .sd_vae import SDVAE, SD_VAE_CONFIG

    unet_cfg = unet_cfg or SD15_UNET_CONFIG
    vae_cfg = vae_cfg or SD_VAE_CONFIG

    def find_st(sub):
        d = os.path.join(model_dir, sub)
        for name in ("diffusion_pytorch_model.safetensors",
                     "model.safetensors"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"no safetensors found under {d}")

    unet_sd = load_safetensors(find_st("unet"))
    vae_sd = load_safetensors(find_st("vae"))
    unet_params = torch_to_flax_params(unet_sd)
    vae_params = torch_to_flax_params(vae_sd)

    # Validate against abstract init (no memory cost via eval_shape).
    import jax.numpy as jnp
    lat = jnp.zeros((1, unet_cfg.in_channels, 8, 8))
    ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
    ref_unet = jax.eval_shape(
        lambda: SDUNet(unet_cfg).init(jax.random.PRNGKey(0), lat,
                                      jnp.zeros(()), ctx))
    check_port(ref_unet, unet_params)
    img = jnp.zeros((1, vae_cfg.in_channels, 32, 32))
    ref_vae = jax.eval_shape(
        lambda: SDVAE(vae_cfg).init(jax.random.PRNGKey(0), img))
    check_port(ref_vae, vae_params)

    return build_sd_model(unet_cfg, vae_cfg, unet_params, vae_params,
                          text_encode=text_encode, dtype=dtype)


def save_params_orbax(params, path: str):
    """Persist a ported param tree natively (orbax) for fast reload."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
