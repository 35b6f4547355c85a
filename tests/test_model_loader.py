"""Hub checkpoint resolution tests (reference model_loader.py:22-141).

The network is absent in this image, so the hub API is faked via
monkeypatch; what these tests pin is the resolution ORDER (dir -> local
cache -> download w/ retry), the offline gates, the cache keying, and the
loud toy-model fallback in the node. The weights-gated end-to-end test
lives in test_real_weights.py.
"""
import os

import numpy as np
import pytest

from comfystereo_tpu.diffusion import model_loader
from comfystereo_tpu.diffusion.model_loader import (ModelUnavailableError,
                                                    resolve_model_dir)


@pytest.fixture(autouse=True)
def _clean_cache():
    model_loader.clear_model_cache()
    yield
    model_loader.clear_model_cache()


def _fake_hub(monkeypatch, behavior):
    """Install a fake huggingface_hub.snapshot_download recording calls."""
    calls = []

    def snapshot_download(repo_id, local_files_only=False,
                          allow_patterns=None, **kw):
        calls.append({"repo_id": repo_id,
                      "local_files_only": local_files_only,
                      "allow_patterns": allow_patterns})
        return behavior(repo_id, local_files_only)

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        snapshot_download)
    return calls


def test_local_dir_passthrough(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    assert resolve_model_dir(str(d)) == str(d)


def test_cache_hit_never_downloads(monkeypatch, tmp_path):
    def behavior(repo_id, local_only):
        assert local_only, "must try the local cache first"
        return str(tmp_path)

    calls = _fake_hub(monkeypatch, behavior)
    assert resolve_model_dir("org/model") == str(tmp_path)
    assert len(calls) == 1 and calls[0]["local_files_only"]
    # Only the files the native port reads are requested.
    pats = calls[0]["allow_patterns"]
    assert "unet/diffusion_pytorch_model.safetensors" in pats
    assert "tokenizer/*" in pats


def test_download_retries_once(monkeypatch, tmp_path, capsys):
    """Cache miss -> download fails -> ONE retry succeeds (reference
    model_loader.py:78-85 except-redownload semantics)."""
    state = {"n": 0}

    def behavior(repo_id, local_only):
        if local_only:
            raise FileNotFoundError("not cached")
        state["n"] += 1
        if state["n"] == 1:
            raise ConnectionError("flaky network")
        return str(tmp_path)

    calls = _fake_hub(monkeypatch, behavior)
    monkeypatch.delenv("HF_HUB_OFFLINE", raising=False)
    monkeypatch.delenv("COMFYSTEREO_OFFLINE", raising=False)
    assert resolve_model_dir("org/model") == str(tmp_path)
    assert len(calls) == 3  # cache probe + failed download + retry
    out = capsys.readouterr().out
    assert "Attempting to download from HuggingFace..." in out


def test_offline_gate_blocks_download(monkeypatch):
    def behavior(repo_id, local_only):
        if local_only:
            raise FileNotFoundError("not cached")
        raise AssertionError("download attempted in offline mode")

    _fake_hub(monkeypatch, behavior)
    monkeypatch.setenv("COMFYSTEREO_OFFLINE", "1")
    with pytest.raises(ModelUnavailableError) as ei:
        resolve_model_dir("org/model")
    assert "offline mode" in str(ei.value)
    assert "local cache" in str(ei.value)  # full attempt trail


def test_error_carries_attempt_trail(monkeypatch):
    def behavior(repo_id, local_only):
        raise ConnectionError("no route to host")

    _fake_hub(monkeypatch, behavior)
    monkeypatch.delenv("HF_HUB_OFFLINE", raising=False)
    monkeypatch.delenv("COMFYSTEREO_OFFLINE", raising=False)
    with pytest.raises(ModelUnavailableError) as ei:
        resolve_model_dir("org/model")
    msg = str(ei.value)
    assert "download try 1" in msg and "download try 2" in msg


def test_filesystem_path_never_hits_hub(monkeypatch):
    def behavior(repo_id, local_only):
        raise AssertionError("a filesystem path reached the hub API")

    _fake_hub(monkeypatch, behavior)
    with pytest.raises(ModelUnavailableError):
        resolve_model_dir("/no/such/model/dir")


def test_load_sd_model_caches_per_scheduler(monkeypatch, tmp_path):
    """Cache keyed f"{id}:{scheduler}" like the reference
    (model_loader.py:40-42); clear_model_cache drops it."""
    loads = []

    def fake_load(model_dir, dtype=None, **kw):
        loads.append((model_dir, dtype))
        return object()

    from comfystereo_tpu.diffusion import porting

    monkeypatch.setattr(porting, "load_sd_from_diffusers_dir", fake_load)
    d = tmp_path / "sd"
    d.mkdir()

    m1 = model_loader.load_sd_model(str(d), "ddim")
    assert model_loader.load_sd_model(str(d), "ddim") is m1
    m2 = model_loader.load_sd_model(str(d), "euler")
    assert m2 is not m1
    assert len(loads) == 2
    # Precision policy: f32 for ddim/gradient path, bf16 for euler/fast
    # (reference model_loader.py:66 uses fp16 there).
    import jax.numpy as jnp

    assert loads[0][1] == jnp.float32
    assert loads[1][1] == jnp.bfloat16

    model_loader.clear_model_cache()
    model_loader.load_sd_model(str(d), "ddim")
    assert len(loads) == 3


def test_node_falls_back_loudly(monkeypatch, capsys):
    """An unresolvable model_id must produce the toy model WITH a printed
    attempt trail (VERDICT r4: no silent toy fallback)."""
    from comfystereo_tpu.nodes import stereodiffusion as sdn

    def behavior(repo_id, local_only):
        raise FileNotFoundError("not cached")

    _fake_hub(monkeypatch, behavior)
    monkeypatch.setenv("COMFYSTEREO_OFFLINE", "1")
    model = sdn._resolve_model(model_id="org/never-exists")
    assert hasattr(model, "unet_apply")  # toy bundle
    out = capsys.readouterr().out
    assert "FALLING BACK TO THE OFFLINE TOY MODEL" in out
    assert "offline mode" in out  # the trail is shown, not swallowed


def test_node_uses_native_port_for_local_dir(monkeypatch, tmp_path):
    """A local diffusers dir routes through the native port, not the toy."""
    from comfystereo_tpu.diffusion import porting
    from comfystereo_tpu.nodes import stereodiffusion as sdn

    sentinel = type("M", (), {"unet_apply": staticmethod(lambda *a: None)})()

    def fake_load(model_dir, dtype=None, **kw):
        assert model_dir == str(tmp_path / "sd")
        return sentinel

    monkeypatch.setattr(porting, "load_sd_from_diffusers_dir", fake_load)
    d = tmp_path / "sd"
    d.mkdir()
    model = sdn._resolve_model(model_id=str(d))
    assert model is sentinel
