"""Streaming video -> stereo conversion utility.

The reference's Video2Stereo workflow streams frame chunks through the node
(GenerateStereo.py:121-179, examples/Video2Stereo.json). This utility is the
standalone equivalent: read frames with cv2 (present in this image), stream
chunks of `batch_size` through the jitted pipeline with double-buffered
host->device transfer (the next chunk uploads while the current one computes),
and write the packed result back with cv2. Gated on cv2 availability.

Pixel marshalling (BGR u8 <-> RGB f32, depth luma) goes through the native
C++ hostops when a toolchain is available (comfystereo_tpu/native) —
multithreaded, ~10x numpy at 4K — and falls back to numpy otherwise.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from ..config import StereoConfig
from ..pipeline import stereo_pipeline
from .. import native

try:
    import cv2
    CV2_AVAILABLE = True
except Exception:  # pragma: no cover
    cv2 = None
    CV2_AVAILABLE = False


def iter_frame_chunks(video_path: str, chunk: int, gray: bool = False
                      ) -> Iterator[Tuple[np.ndarray, float]]:
    """Yield ([n,H,W,3] float32 RGB 0-1 chunks, fps); `gray=True` yields
    [n,H,W] Rec.601 luma instead (the node's depth-gray weights,
    reference GenerateStereo.py:135) without materializing an RGB chunk."""
    if not CV2_AVAILABLE:
        raise RuntimeError("cv2 unavailable; video streaming disabled")
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    convert = native.bgr_u8_to_gray_f32 if gray else native.bgr_u8_to_rgb_f32
    frames = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)  # raw BGR u8; converted per chunk
            if len(frames) == chunk:
                yield convert(np.stack(frames)), fps
                frames = []
        if frames:
            yield convert(np.stack(frames)), fps
    finally:
        cap.release()


def video_fps(video_path: str) -> float:
    """Source frame rate (falls back to 30)."""
    if not CV2_AVAILABLE:
        raise RuntimeError("cv2 unavailable; video streaming disabled")
    cap = cv2.VideoCapture(video_path)
    try:
        return cap.get(cv2.CAP_PROP_FPS) or 30.0
    finally:
        cap.release()


def convert_video(video_path: str, depth_video_path: str, out_path: str,
                  cfg: Optional[StereoConfig] = None,
                  progress: bool = True) -> int:
    """Depth video + source video -> packed stereo video. Returns frame count.

    Chunks stay device-resident through blur->warp->fill->pack; the next
    chunk's host->device upload overlaps the current chunk's compute thanks
    to JAX's async dispatch. Short final chunks are zero-padded to
    cfg.batch_size so every launch reuses the one compiled program.
    """
    import jax.numpy as jnp

    cfg = cfg or StereoConfig()
    fps = video_fps(video_path)
    writer = None
    total = 0
    img_iter = iter_frame_chunks(video_path, cfg.batch_size)
    dm_iter = iter_frame_chunks(depth_video_path, cfg.batch_size, gray=True)
    pending = None  # (device_out, n_frames) pipeline: one chunk in flight

    def flush(entry):
        nonlocal writer, total
        out_dev, n = entry
        arr = np.asarray(out_dev)
        for f in arr[:n]:
            bgr = native.rgb_f32_to_bgr_u8(f)
            if writer is None:
                h, w = bgr.shape[:2]
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            writer.write(bgr)
        total += n

    def pad_to_batch(x):
        if len(x) == cfg.batch_size:
            return x
        reps = np.zeros((cfg.batch_size - len(x),) + x.shape[1:], x.dtype)
        return np.concatenate([x, reps], axis=0)

    for (imgs, _), (gray, _) in zip(img_iter, dm_iter):
        n = min(len(imgs), len(gray))
        out = stereo_pipeline(jnp.asarray(pad_to_batch(imgs[:n])),
                              jnp.asarray(pad_to_batch(gray[:n])), cfg)
        entry = (out["stereo"][0], n)
        if pending is not None:
            flush(pending)          # overlaps with the chunk just dispatched
        pending = entry
        if progress:
            print(f"\rconverted {total} frames", end="", flush=True)
    if pending is not None:
        flush(pending)
    if writer is not None:
        writer.release()
    if progress:
        print(f"\rconverted {total} frames")
    return total
