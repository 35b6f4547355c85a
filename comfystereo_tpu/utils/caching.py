"""Model parameter and embedding caches (checkpoint/resume story).

The reference caches diffusers pipelines keyed by model_id+scheduler
(model_loader.py:12-19) and text embeddings keyed by prompt
(model_wrappers.py:119-140). TPU-native equivalents: an in-process keyed
model cache, an LRU text-embedding cache, and orbax-backed save/load of
flax params so inverted-latent/uncond-embedding state survives restarts.
"""
from __future__ import annotations

import collections
import os
import threading
from typing import Any, Callable, Dict, Hashable, Optional

_model_cache: Dict[Hashable, Any] = {}
_model_lock = threading.Lock()


def get_or_load_model(key: Hashable, loader: Callable[[], Any]) -> Any:
    """Process-wide model cache (one load per key, thread-safe)."""
    with _model_lock:
        if key not in _model_cache:
            _model_cache[key] = loader()
        return _model_cache[key]


def clear_model_cache() -> None:
    with _model_lock:
        _model_cache.clear()


class EmbeddingCache:
    """LRU text-embedding cache (prompt -> array)."""

    def __init__(self, encode: Callable[[str], Any], capacity: int = 256):
        self._encode = encode
        self._capacity = capacity
        self._data: "collections.OrderedDict[str, Any]" = collections.OrderedDict()

    def __call__(self, text: str):
        if text in self._data:
            self._data.move_to_end(text)
            return self._data[text]
        emb = self._encode(text)
        self._data[text] = emb
        if len(self._data) > self._capacity:
            self._data.popitem(last=False)
        return emb


def save_params(path: str, params) -> None:
    """Persist a flax params pytree with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like=None):
    """Restore a params pytree (optionally shaped like `like`)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, target=like)
    return ckptr.restore(path)
