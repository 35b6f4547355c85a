"""Committed activation goldens: offline numerics-drift tripwire.

VERDICT r4 item 1: real SD weights cannot be validated in this image (no
egress), so pin what CAN be pinned offline — per-block activation norms of
the ported tiny-but-complete torch UNet (tests/torch_ref.py) on a fixed
latent/t/context, committed to tests/goldens/unet_activation_goldens.json.
Any regression in the port pipeline (porting.port_torch_unet), the flax
UNet topology, or flax/XLA numerics shows up as a norm drift here without
needing a checkpoint. Reference surface this guards:
/root/reference/model_loader.py:22-95 (the real-checkpoint load path).

Regenerate after an INTENTIONAL change with:
    PYTHONPATH=/root/repo python tests/test_activation_goldens.py --regen
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from comfystereo_tpu.diffusion import porting
from comfystereo_tpu.diffusion.attention import AttentionMode
from comfystereo_tpu.diffusion.sd_unet import SDUNet, TINY_SD_UNET_CONFIG

from torch_ref import TorchSDUNet

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "unet_activation_goldens.json")
# f32 forward on CPU at -O0; norms are stable well past this. Loose enough
# to survive XLA fusion-order changes, tight enough that any structural or
# porting bug (wrong block wiring, transposed kernel, missed bias) moves a
# norm by orders of magnitude more.
RTOL = 1e-3


def _seeded_torch_unet():
    g = torch.Generator().manual_seed(20260820)
    tmodel = TorchSDUNet(TINY_SD_UNET_CONFIG)
    sd = tmodel.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
    tmodel.load_state_dict(sd)
    return tmodel.eval()


def _fixed_inputs():
    rng = np.random.default_rng(42)
    lat = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    ctx = rng.normal(size=(2, 77, TINY_SD_UNET_CONFIG.cross_attention_dim)
                     ).astype(np.float32)
    t = np.array([41.0, 817.0], dtype=np.float32)
    return lat, t, ctx


def _flatten_intermediates(tree, prefix=""):
    """intermediates collection -> {'path/to/module': ndarray} (the
    '__call__' leaf of each module, first output)."""
    out = {}
    for key, val in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if key == "__call__":
            leaf = val[0]
            if isinstance(leaf, (tuple, list)):
                leaf = leaf[0]
            out[prefix] = np.asarray(leaf)
        elif isinstance(val, dict) or hasattr(val, "items"):
            out.update(_flatten_intermediates(val, path))
    return out


def compute_goldens():
    """Port the seeded torch UNet and record per-block activation norms."""
    tmodel = _seeded_torch_unet()
    params, cfg = porting.port_torch_unet(tmodel, cfg=TINY_SD_UNET_CONFIG)
    lat, t, ctx = _fixed_inputs()
    unet = SDUNet(cfg)
    out, state = unet.apply(
        {"params": params["params"]} if "params" in params else params,
        jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        mode=AttentionMode(), stereo_active=False,
        capture_intermediates=True)
    acts = _flatten_intermediates(state["intermediates"])
    goldens = {
        "output": {
            "l2": float(np.linalg.norm(np.asarray(out))),
            "mean": float(np.mean(np.asarray(out))),
            "absmax": float(np.max(np.abs(np.asarray(out)))),
        },
        "blocks": {path: float(np.linalg.norm(a))
                   for path, a in sorted(acts.items())},
    }
    # Cross-check the port against torch itself at generation time so a
    # golden can never be regenerated from a broken port.
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(lat), torch.from_numpy(t),
                      torch.from_numpy(ctx)).numpy()
    # Broken-port tripwire, not a precision bound (test_torch_unet_parity
    # owns that): a mis-wired block is off by orders of magnitude, while
    # XLA-fusion float wobble on this 22-layer stack reaches ~3e-4.
    np.testing.assert_allclose(np.asarray(out), tout, atol=5e-4)
    return goldens


def test_unet_activation_goldens():
    """Every committed per-block norm still matches the live forward."""
    assert os.path.exists(GOLDEN_PATH), (
        "goldens missing — run: python tests/test_activation_goldens.py "
        "--regen")
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    got = compute_goldens()

    assert set(got["blocks"]) == set(want["blocks"]), (
        "UNet module tree changed — regenerate goldens if intentional")
    for path, norm in want["blocks"].items():
        np.testing.assert_allclose(
            got["blocks"][path], norm, rtol=RTOL,
            err_msg=f"activation norm drift at {path}")
    for stat, val in want["output"].items():
        # mean/absmax are pointwise (no norm averaging), so XLA opt-level
        # fusion differences reach ~1e-3 relative; keep them as coarse
        # tripwires only.
        np.testing.assert_allclose(got["output"][stat], val, rtol=1e-2,
                                   atol=1e-5,
                                   err_msg=f"output {stat} drift")


def test_goldens_cover_all_levels():
    """Structural guard: goldens span down/mid/up + attention internals, so
    a silently-skipped block family can't pass unnoticed."""
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    paths = list(want["blocks"])
    for family in ("down_blocks_0", "down_blocks_1", "mid_block",
                   "up_blocks_0", "up_blocks_1", "attn1", "attn2", "ff",
                   "time_embedding"):
        assert any(family in p for p in paths), f"no golden covers {family}"
    assert len(paths) > 30


if __name__ == "__main__":
    import sys

    # Standalone regen must not ride a remote-accelerator relay (the site
    # customization overrides JAX_PLATFORMS; force through jax.config like
    # conftest.py does).
    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        goldens = compute_goldens()
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(goldens, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(goldens['blocks'])} block goldens + output "
              f"stats to {GOLDEN_PATH}")
    else:
        pytest.main([__file__, "-v"])
