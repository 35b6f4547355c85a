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

import functools
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


def save_safetensors(tensors: Mapping[str, np.ndarray], path: str) -> None:
    """Write numpy arrays as a .safetensors file (the format the loader
    reads: 8-byte LE header length + JSON header + raw little-endian
    buffer). Used by export paths and the synthetic-checkpoint tests."""
    try:
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
                  path)
        return
    except ImportError:
        pass
    inv_dtypes = {np.dtype(v): k for k, v in _SAFETENSORS_DTYPES.items()}
    header: Dict[str, Any] = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        blob = arr.tobytes()
        header[name] = {"dtype": inv_dtypes[arr.dtype],
                        "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(blob)]}
        offset += len(blob)
        blobs.append(blob)
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)


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
            # Legacy LDM/ComfyUI VAE attention projections are stored as
            # [C,C,1,1] convs, but SDVAE implements to_q/to_k/to_v/to_out.0
            # as nn.Dense (2-D kernels) — squeeze whenever the parent module
            # is one of those projections (keyed on the module NAME, not a
            # substring of the whole key: 'attn' never matches modern
            # '...attentions.N...' spellings).
            if (arr.ndim == 4 and arr.shape[-2:] == (1, 1) and len(path) >= 2
                    and path[-2] in ("to_q", "to_k", "to_v", "to_out_0")):
                arr = arr[:, :, 0, 0]
            if arr.ndim == 4:
                new_leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                # Embedding tables (token_embedding / position_embedding in
                # CLIP) keep [num, dim] layout — flax nn.Embed stores them
                # untransposed under the 'embedding' leaf.
                if len(path) >= 2 and path[-2].endswith("embedding"):
                    new_leaf = "embedding"
                else:
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
            elif name in ("scale", "embedding"):
                leaf = "weight"  # norm scale / embedding table (untransposed)
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

    from .quantize import _is_quantized

    if _is_quantized(tree):
        # w8-quantized kernel: int8 payload + f32 scales keep their own
        # dtypes — casting them to the compute dtype would destroy the
        # storage saving (and bf16 scales the precision).
        return {k: jnp.asarray(v) for k, v in tree.items()}
    return {k: _jnp_tree(v, dtype) if isinstance(v, Mapping)
            else jnp.asarray(v, dtype=dtype) for k, v in tree.items()}


def build_sd_model(unet_cfg=None, vae_cfg=None, unet_params=None,
                   vae_params=None, text_encode: Optional[Callable] = None,
                   rng=None, dtype=None, init_mode: str = "random",
                   weight_quant: bool = False):
    """Assemble a `DiffusionModel` bundle from the flax SD modules.

    With params=None the module is initialized with SD-shaped weights —
    the test/validation mode (real weights are cache-gated in this
    environment, so the plumbing is what gets proven, per the reference's
    own operating point of 512x512 latents at 50 steps).
    init_mode="zeros" skips the (large, slow-to-compile) random init and
    materializes zero weights via eval_shape — right for shape/perf checks
    on full-scale configs.

    weight_quant=True stores the large UNet kernels as int8 with
    per-output-channel scales (diffusion/quantize.py) and dequantizes
    inside the jitted step. This HALVES parameter HBM residency
    (1.72 -> 0.86 GB for SD1.5) — headroom for bigger batches or
    co-resident models. It is NOT a speed mode: measured on v5e, the CFG
    step is 26.9 vs 25.4 ms at b=2 and 67.8 vs 69.6 ms at b=8 (XLA
    transiently re-materializes dequantized conv filters, cancelling the
    stream savings; dense-only quantization measured the same). Quality
    cost is reported by `bench.py --sd-delta`.
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

    def zeros_like_init(fn):
        shapes = jax.eval_shape(fn)
        # One jitted program materializes the whole tree (per-leaf host
        # dispatch is prohibitively slow over remote-device relays).
        return jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    unet = SDUNet(unet_cfg)
    vae = SDVAE(vae_cfg)
    if unet_params is None:
        lat = jnp.zeros((1, unet_cfg.in_channels, 8, 8))
        ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
        mk = lambda: unet.init(r1, lat, jnp.zeros(()), ctx)  # noqa: E731
        unet_params = zeros_like_init(mk) if init_mode == "zeros" else mk()
    if vae_params is None:
        img = jnp.zeros((1, vae_cfg.in_channels, 32, 32))
        mkv = lambda: vae.init(r2, img)  # noqa: E731
        vae_params = zeros_like_init(mkv) if init_mode == "zeros" else mkv()
    unet_params = _jnp_tree(unet_params, dtype)
    vae_params = _jnp_tree(vae_params, dtype)
    if weight_quant:
        from . import quantize as _qz

        # quantize_tree leaves already-quantized kernels untouched, so a
        # caller-prepared w8 tree passes through unchanged.
        unet_params = jax.tree.map(jnp.asarray,
                                   _qz.quantize_tree(unet_params))

    # Jit at the model boundary: the denoising loops are host-side python,
    # so un-jitted applies would dispatch op-by-op (catastrophic over
    # remote-device relays; measured 7.1 s vs jitted per-step on v5e).
    # Boundary casts make `dtype=bfloat16` a real mixed-precision mode:
    # inputs drop to the param dtype on entry (so flax promotion doesn't
    # silently run everything in f32) and outputs return f32 (scheduler
    # math, masks, and the latent scale stay full-precision).
    from .attention import AttentionMode

    @functools.partial(jax.jit, static_argnames=("mode",))
    def _unet_jit(params, latents, t, context, stereo_active,
                  mode: AttentionMode):
        if weight_quant:
            from . import quantize as _qz

            params = _qz.dequantize_tree(params, dtype)
        out = unet.apply(params, latents.astype(dtype),
                         t, context.astype(dtype), mode=mode,
                         stereo_active=stereo_active)
        return out.astype(jnp.float32)

    def unet_apply(params, latents, t, context, mode=None,
                   stereo_active=False):
        return _unet_jit(params, latents, t, context, stereo_active,
                         mode or AttentionMode())

    return DiffusionModel(
        unet_apply=unet_apply,
        unet_params=unet_params,
        vae_encode=jax.jit(
            lambda p, x: vae.apply(p, x.astype(dtype), method=SDVAE.encode
                                   ).astype(jnp.float32)),
        vae_decode=jax.jit(
            lambda p, z: vae.apply(p, z.astype(dtype), method=SDVAE.decode
                                   ).astype(jnp.float32)),
        vae_params=vae_params,
        text_encode=text_encode or HashTextEncoder(
            dim=unet_cfg.cross_attention_dim),
        latent_channels=vae_cfg.latent_channels,
        context_dim=unet_cfg.cross_attention_dim,
        unet_in_channels=unet_cfg.in_channels,
    )


def load_sd_from_diffusers_dir(model_dir: str, unet_cfg=None, vae_cfg=None,
                               text_encode=None, dtype=None):
    """Load a diffusers-format model directory (unet/ + vae/ + text_encoder/
    + tokenizer/) into the flax SD modules; validates each port against the
    module's own init tree. Equivalent to the reference's load_sd_model
    (model_loader.py:22-93) minus the download. The checkpoint's own CLIP
    text tower and BPE vocab drive prompt conditioning — self-contained, no
    transformers; the hash-stub fallback fires only when the directory
    genuinely lacks a text encoder."""
    import jax

    from .sd_unet import SDUNet
    from .sd_vae import SDVAE

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
    # Configs come from the checkpoint's own shapes unless given (head
    # counts per infer_unet_config's SD1/SD2 family rule).
    unet_cfg = unet_cfg or infer_unet_config(unet_sd)
    vae_cfg = vae_cfg or infer_vae_config(vae_sd)
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

    if text_encode is None:
        text_encode = load_clip_text_from_dir(model_dir, dtype=dtype)
        if text_encode is None:
            print(f"[comfystereo-tpu] {model_dir} has no text_encoder/ + "
                  "tokenizer/; prompts fall back to the hash-stub embedding")

    return build_sd_model(unet_cfg, vae_cfg, unet_params, vae_params,
                          text_encode=text_encode, dtype=dtype)


# ---------------------------------------------------------------------------
# LDM / ComfyUI checkpoint layout -> diffusers layout
# ---------------------------------------------------------------------------

_LDM_RESNET = {"in_layers.0": "norm1", "in_layers.2": "conv1",
               "emb_layers.1": "time_emb_proj", "out_layers.0": "norm2",
               "out_layers.3": "conv2", "skip_connection": "conv_shortcut"}
_LDM_VAE_RESNET = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
                   "conv2": "conv2", "nin_shortcut": "conv_shortcut"}
_LDM_VAE_ATTN = {"norm": "group_norm", "q": "to_q", "k": "to_k",
                 "v": "to_v", "proj_out": "to_out.0"}


def _map_ldm_resnet(rest: str) -> str:
    for old, new in _LDM_RESNET.items():
        if rest.startswith(old + "."):
            return new + rest[len(old):]
    return rest


def ldm_unet_to_diffusers(state_dict: Mapping[str, Any],
                          num_blocks: int = 4, layers_per_block: int = 2
                          ) -> Dict[str, Any]:
    """Convert an LDM/ComfyUI `UNetModel` state_dict (input_blocks /
    middle_block / output_blocks naming, as ComfyUI's diffusion_model
    exposes) to the diffusers key layout the flax port consumes.

    Mirrors the public diffusers conversion convention; the reference reaches
    the same models through ComfyUI wrappers (model_wrappers.py:240-349).
    """
    out: Dict[str, Any] = {}
    per = layers_per_block + 1
    for key, v in state_dict.items():
        if key.startswith("model.diffusion_model."):
            key = key[len("model.diffusion_model."):]
        if key.startswith("time_embed.0."):
            out["time_embedding.linear_1." + key.split(".", 2)[2]] = v
        elif key.startswith("time_embed.2."):
            out["time_embedding.linear_2." + key.split(".", 2)[2]] = v
        elif key.startswith("input_blocks.0.0."):
            out["conv_in." + key[len("input_blocks.0.0."):]] = v
        elif key.startswith("input_blocks."):
            parts = key.split(".")
            n, mod = int(parts[1]), parts[2]
            rest = ".".join(parts[3:])
            blk, j = (n - 1) // per, (n - 1) % per
            if j == layers_per_block:  # downsampler slot
                out[f"down_blocks.{blk}.downsamplers.0.conv."
                    + rest.replace("op.", "")] = v
            elif mod == "0":
                out[f"down_blocks.{blk}.resnets.{j}."
                    + _map_ldm_resnet(rest)] = v
            else:
                out[f"down_blocks.{blk}.attentions.{j}." + rest] = v
        elif key.startswith("middle_block."):
            parts = key.split(".")
            mod = parts[1]
            rest = ".".join(parts[2:])
            if mod == "0":
                out["mid_block.resnets.0." + _map_ldm_resnet(rest)] = v
            elif mod == "1":
                out["mid_block.attentions.0." + rest] = v
            else:
                out["mid_block.resnets.1." + _map_ldm_resnet(rest)] = v
        elif key.startswith("output_blocks."):
            parts = key.split(".")
            n, mod = int(parts[1]), parts[2]
            rest = ".".join(parts[3:])
            blk, j = n // per, n % per
            if mod == "0":
                out[f"up_blocks.{blk}.resnets.{j}."
                    + _map_ldm_resnet(rest)] = v
            elif rest.startswith("conv.") or ".conv." in f".{rest}":
                out[f"up_blocks.{blk}.upsamplers.0." + rest] = v
            else:
                out[f"up_blocks.{blk}.attentions.{j}." + rest] = v
        elif key.startswith("out.0."):
            out["conv_norm_out." + key[len("out.0."):]] = v
        elif key.startswith("out.2."):
            out["conv_out." + key[len("out.2."):]] = v
        # label_emb and friends (SDXL-only) are skipped.
    return out


def ldm_vae_to_diffusers(state_dict: Mapping[str, Any],
                         num_blocks: Optional[int] = None) -> Dict[str, Any]:
    """Convert an LDM/ComfyUI AutoencoderKL state_dict (encoder.down /
    decoder.up naming) to the diffusers layout. Decoder up-block order is
    REVERSED between the two conventions; the block count is inferred from
    the highest up/down index when not given (SD VAEs use 4)."""
    out: Dict[str, Any] = {}
    if num_blocks is None:
        stripped = [k.split("first_stage_model.")[-1] for k in state_dict]
        idx = [int(k.split(".")[2]) for k in stripped
               if k.startswith(("encoder.down.", "decoder.up."))]
        num_blocks = max(idx) + 1 if idx else 4

    def attn(rest: str) -> str:
        head = rest.split(".", 1)
        return _LDM_VAE_ATTN.get(head[0], head[0]) + (
            "." + head[1] if len(head) > 1 else "")

    def resnet(rest: str) -> str:
        head, _, tail = rest.partition(".")
        return _LDM_VAE_RESNET.get(head, head) + ("." + tail if tail else "")

    for key, v in state_dict.items():
        if key.startswith("first_stage_model."):
            key = key[len("first_stage_model."):]
        parts = key.split(".")
        if key.startswith(("quant_conv.", "post_quant_conv.")):
            out[key] = v
        elif parts[0] in ("encoder", "decoder"):
            side = parts[0]
            if parts[1] == "conv_in" or parts[1] == "conv_out":
                out[key] = v
            elif parts[1] == "norm_out":
                out[f"{side}.conv_norm_out." + ".".join(parts[2:])] = v
            elif parts[1] == "mid":
                mod = parts[2]
                rest = ".".join(parts[3:])
                name = {"block_1": "resnets.0", "attn_1": "attentions.0",
                        "block_2": "resnets.1"}[mod]
                mapped = attn(rest) if mod == "attn_1" else resnet(rest)
                out[f"{side}.mid_block.{name}." + mapped] = v
            elif parts[1] == "down":
                i = int(parts[2])
                if parts[3] == "downsample":
                    out[f"encoder.down_blocks.{i}.downsamplers.0."
                        + ".".join(parts[4:])] = v
                else:
                    j = int(parts[4])
                    out[f"encoder.down_blocks.{i}.resnets.{j}."
                        + resnet(".".join(parts[5:]))] = v
            elif parts[1] == "up":
                i = num_blocks - 1 - int(parts[2])  # reversed order
                if parts[3] == "upsample":
                    out[f"decoder.up_blocks.{i}.upsamplers.0."
                        + ".".join(parts[4:])] = v
                else:
                    j = int(parts[4])
                    out[f"decoder.up_blocks.{i}.resnets.{j}."
                        + resnet(".".join(parts[5:]))] = v
    return out


def looks_like_ldm(state_dict: Mapping[str, Any]) -> bool:
    return any(k.startswith(("input_blocks.", "model.diffusion_model.",
                             "middle_block."))
               for k in state_dict)


def infer_unet_config(diffusers_sd: Mapping[str, Any]):
    """SDUNetConfig from a diffusers-layout state_dict's shapes. Head counts
    are not recoverable from shapes; SD1.x uses 8 heads, SD2.x (1024-d
    context) uses 64-d heads (model_wrappers.py:394-417 detects the family
    the same way)."""
    from .sd_unet import SDUNetConfig

    def shape(k):
        v = diffusers_sd[k]
        return tuple(v.shape)

    in_ch = shape("conv_in.weight")[1]
    blocks = []
    i = 0
    while f"down_blocks.{i}.resnets.0.conv1.weight" in diffusers_sd:
        blocks.append(shape(f"down_blocks.{i}.resnets.0.conv1.weight")[0])
        i += 1
    layers = 0
    while f"down_blocks.0.resnets.{layers}.conv1.weight" in diffusers_sd:
        layers += 1
    ctx = shape(
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"
    )[1]
    if ctx >= 1024:
        heads = tuple(ch // 64 for ch in blocks)
    else:
        heads = 8
    return SDUNetConfig(in_channels=in_ch,
                        out_channels=shape("conv_out.weight")[0],
                        block_out_channels=tuple(blocks),
                        layers_per_block=layers,
                        cross_attention_dim=ctx,
                        attention_head_dim=heads)


def infer_vae_config(diffusers_sd: Mapping[str, Any]):
    from .sd_vae import SDVAEConfig

    blocks = []
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.conv1.weight" in diffusers_sd:
        blocks.append(
            tuple(diffusers_sd[f"encoder.down_blocks.{i}.resnets.0."
                               "conv1.weight"].shape)[0])
        i += 1
    layers = 0
    while f"encoder.down_blocks.0.resnets.{layers}.conv1.weight" \
            in diffusers_sd:
        layers += 1
    lat = tuple(diffusers_sd["post_quant_conv.weight"].shape)[1]
    return SDVAEConfig(block_out_channels=tuple(blocks),
                       layers_per_block=layers, latent_channels=lat)


def port_torch_unet(unet_module, cfg=None):
    """torch UNet module (diffusers OR LDM/ComfyUI layout) -> (flax params,
    SDUNetConfig), shape-validated. This is the gradient-capable route: the
    ported weights run in the flax SDUNet, so null-text optimization
    (inversion.py) differentiates natively on TPU — the TPU-native
    equivalent of the reference's functional_call gradient mode
    (model_wrappers.py:268-340)."""
    import jax
    import jax.numpy as jnp

    from .sd_unet import SDUNet

    sd = {k: v.detach().cpu().numpy()
          for k, v in unet_module.state_dict().items()}
    if looks_like_ldm(sd):
        sd = ldm_unet_to_diffusers(sd, layers_per_block=2)  # SD1/SD2 topology
    # Head counts are not recoverable from weight shapes; pass cfg explicitly
    # for non-SD1/SD2 head layouts.
    cfg = cfg or infer_unet_config(sd)
    params = torch_to_flax_params(sd)
    lat = jnp.zeros((1, cfg.in_channels, 8, 8))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    ref = jax.eval_shape(
        lambda: SDUNet(cfg).init(jax.random.PRNGKey(0), lat, jnp.zeros(()),
                                 ctx))
    check_port(ref, params)
    return params, cfg


def port_torch_vae(vae_module, cfg=None):
    """torch VAE module (diffusers or LDM layout) -> (flax params,
    SDVAEConfig), shape-validated."""
    import jax
    import jax.numpy as jnp

    from .sd_vae import SDVAE

    sd = {k: v.detach().cpu().numpy()
          for k, v in vae_module.state_dict().items()}
    if any(k.startswith(("encoder.down.", "decoder.up.",
                         "first_stage_model.")) for k in sd):
        sd = ldm_vae_to_diffusers(sd)
    cfg = cfg or infer_vae_config(sd)
    params = torch_to_flax_params(sd)
    img = jnp.zeros((1, cfg.in_channels, 32, 32))
    ref = jax.eval_shape(
        lambda: SDVAE(cfg).init(jax.random.PRNGKey(0), img))
    check_port(ref, params)
    return params, cfg


def _strip_to_text_model(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Normalize nested text-encoder prefixes (ComfyUI wraps the CLIP tower
    as cond_stage_model.transformer.text_model..., transformers as
    text_model...) down to the bare ``text_model.`` layout."""
    out = {}
    for k, v in state_dict.items():
        i = k.find("text_model.")
        if i >= 0:
            out[k[i:]] = v
    return out


def port_text_encoder_state(state_dict: Mapping[str, Any], cfg=None):
    """transformers/ComfyUI CLIP text state_dict -> (flax params,
    CLIPTextConfig), shape-validated against the module's own init tree.
    The reference reaches the same weights through TextEncoderWrapper /
    the diffusers pipeline (model_wrappers.py:108-171,
    model_loader.py:22-95)."""
    import jax
    import jax.numpy as jnp

    from .clip_text import CLIPTextModel, infer_text_config

    sd = _strip_to_text_model(state_dict)
    if not sd:
        raise ValueError("no text_model.* keys found in state_dict")
    cfg = cfg or infer_text_config(sd)
    params = torch_to_flax_params(sd)
    ids = jnp.zeros((1, cfg.max_position_embeddings), jnp.int32)
    ref = jax.eval_shape(
        lambda: CLIPTextModel(cfg).init(jax.random.PRNGKey(0), ids))
    check_port(ref, params)
    return params, cfg


def port_torch_text_encoder(text_module, cfg=None):
    """torch CLIPTextModel (or any module wrapping one) -> (flax params,
    CLIPTextConfig)."""
    sd = {k: v.detach().cpu().numpy()
          for k, v in text_module.state_dict().items()}
    return port_text_encoder_state(sd, cfg=cfg)


def load_clip_text_from_dir(model_dir: str, dtype=None):
    """Build a NativeCLIPTextEncoder from a diffusers model directory's
    ``text_encoder/`` + ``tokenizer/`` subdirs (self-contained: no
    transformers). Returns None when either piece is absent."""
    from .clip_text import NativeCLIPTextEncoder, config_from_json
    from .clip_tokenizer import CLIPBPETokenizer

    te_dir = os.path.join(model_dir, "text_encoder")
    st_path = None
    for name in ("model.safetensors", "diffusion_pytorch_model.safetensors"):
        p = os.path.join(te_dir, name)
        if os.path.exists(p):
            st_path = p
            break
    tok_dir = os.path.join(model_dir, "tokenizer")
    if st_path is None or not os.path.exists(
            os.path.join(tok_dir, "vocab.json")):
        return None
    sd = load_safetensors(st_path)
    cfg = None
    cfg_path = os.path.join(te_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path, encoding="utf-8") as f:
            cfg = config_from_json(json.load(f))
    params, cfg = port_text_encoder_state(sd, cfg=cfg)
    tokenizer = CLIPBPETokenizer.from_dir(tok_dir,
                                          max_length=cfg.max_position_embeddings)
    return NativeCLIPTextEncoder(tokenizer, params, cfg, dtype=dtype)


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
