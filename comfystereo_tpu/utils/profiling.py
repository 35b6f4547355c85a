"""Tracing, timing, and memory observability.

The reference's only instrumentation is an ad-hoc psutil/VRAM logger behind a
DEBUG_MEMORY flag (GenerateStereo.py:8-23). The TPU-native equivalents
(SURVEY.md §5): jax.profiler trace capture, per-stage wall timing with forced
device sync (async relays make block_until_ready unreliable — a 1-element
host copy is the only guaranteed fence), and host+device memory stats.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import numpy as np

DEBUG_MEMORY = os.environ.get("COMFYSTEREO_DEBUG_MEMORY", "0") == "1"


def sync(tree) -> None:
    """Force completion of every array in a pytree (host-copy fence)."""
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[0:1])


@contextlib.contextmanager
def stage_timer(name: str, results: Optional[Dict[str, float]] = None,
                verbose: bool = True):
    """Wall-time a pipeline stage; call sync() on its outputs inside."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    if verbose:
        print(f"[timing] {name}: {dt * 1000:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/comfystereo_trace"):
    """jax.profiler trace (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def memory_stats() -> Dict[str, float]:
    """Host RSS + per-device HBM stats in MB (when the backend reports them)."""
    stats: Dict[str, float] = {}
    try:
        import psutil

        stats["host_rss_mb"] = psutil.Process().memory_info().rss / 2 ** 20
    except Exception:
        try:
            import resource

            stats["host_rss_mb"] = (
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)
        except Exception:
            pass
    try:
        import jax

        for d in jax.devices():
            ms = d.memory_stats() or {}
            if "bytes_in_use" in ms:
                stats[f"{d.platform}{d.id}_in_use_mb"] = \
                    ms["bytes_in_use"] / 2 ** 20
            if "peak_bytes_in_use" in ms:
                stats[f"{d.platform}{d.id}_peak_mb"] = \
                    ms["peak_bytes_in_use"] / 2 ** 20
    except Exception:
        pass
    return stats


def log_memory(label: str = "") -> None:
    """DEBUG_MEMORY-gated memory print (reference log_memory behavior)."""
    if not DEBUG_MEMORY:
        return
    stats = memory_stats()
    pretty = ", ".join(f"{k}={v:.0f}MB" for k, v in stats.items())
    print(f"[MEM] {label}: {pretty}")
