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

import os
import queue
import threading
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


def iter_frame_chunks(video_path: str, chunk: int, gray: bool = False,
                      raw: bool = False) -> Iterator[Tuple[np.ndarray, float]]:
    """Yield ([n,H,W,3] float32 RGB 0-1 chunks, fps); `gray=True` yields
    [n,H,W] Rec.601 luma instead (the node's depth-gray weights,
    reference GenerateStereo.py:135) without materializing an RGB chunk.
    `raw=True` yields the decoder's BGR uint8 frames untouched — the
    streaming pipeline uploads those and converts on-device (4x less
    host->device traffic than f32)."""
    if not CV2_AVAILABLE:
        raise RuntimeError("cv2 unavailable; video streaming disabled")
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():  # cv2 treats a bad path as a 0-frame stream
        cap.release()
        raise RuntimeError(f"cannot open video: {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    if raw:
        convert = lambda x: x  # noqa: E731
    else:
        convert = (native.bgr_u8_to_gray_f32 if gray
                   else native.bgr_u8_to_rgb_f32)
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
        if not cap.isOpened():
            raise RuntimeError(f"cannot open video: {video_path}")
        return cap.get(cv2.CAP_PROP_FPS) or 30.0
    finally:
        cap.release()


def _device_chunk_fn():
    """Module-level jitted chunk program so the trace cache persists across
    convert_video calls (a closure inside convert_video would retrace per
    call)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(2,))
    def _device_chunk(bgr_u8, dep_bgr_u8, cfg):
        img = bgr_u8[..., ::-1].astype(jnp.float32) / 255.0
        d = dep_bgr_u8.astype(jnp.float32)
        gray = (0.2989 * d[..., 2] + 0.5870 * d[..., 1]
                + 0.1140 * d[..., 0]) / 255.0
        out = stereo_pipeline(img, gray, cfg)
        sbs = out["stereo"][0]
        return jnp.trunc(jnp.clip(sbs * 255.0, 0.0, 255.0)
                         ).astype(jnp.uint8)[..., ::-1]

    return _device_chunk


_DEVICE_CHUNK = None


def convert_video(video_path: str, depth_video_path: str, out_path: str,
                  cfg: Optional[StereoConfig] = None,
                  progress: bool = True) -> int:
    """Depth video + source video -> packed stereo video. Returns frame count.

    Chunks stay device-resident through blur->warp->fill->pack; the next
    chunk's host->device upload overlaps the current chunk's compute thanks
    to JAX's async dispatch. Short final chunks are zero-padded to
    cfg.batch_size so every launch reuses the one compiled program.

    Host<->device traffic is uint8 BOTH ways: raw decoder BGR frames go up,
    packed BGR stereo frames come down, and all pixel conversion (channel
    swizzle, /255, Rec.601 depth luma, *255 + truncate) is fused into the
    device program — 4x less interconnect traffic than shipping f32, and
    the host's per-chunk work reduces to stacking decoder output and
    feeding the encoder.

    Three-stage thread pipeline: a producer thread decodes, the main
    thread dispatches device compute, and a consumer thread performs the
    device->host readback and feeds the encoder — so decode(next) |
    compute(current) | encode(prev) genuinely overlap (cv2 releases the
    GIL in both codecs, and the d2h copy blocks only the consumer).
    Both queues are bounded at 2 chunks, capping host memory at
    ~6 chunks across the stages.
    """
    import jax.numpy as jnp

    global _DEVICE_CHUNK
    if _DEVICE_CHUNK is None:
        _DEVICE_CHUNK = _device_chunk_fn()
    _device_chunk = _DEVICE_CHUNK

    cfg = cfg or StereoConfig()
    fps = video_fps(video_path)

    chunk_q: "queue.Queue" = queue.Queue(maxsize=2)
    produce_error: list = []  # producer exception, re-raised after join

    def _produce():
        try:
            img_iter = iter_frame_chunks(video_path, cfg.batch_size,
                                         raw=True)
            dm_iter = iter_frame_chunks(depth_video_path, cfg.batch_size,
                                        raw=True)
            for (imgs, _), (deps, _) in zip(img_iter, dm_iter):
                chunk_q.put((imgs, deps))
        except BaseException as exc:  # surfaced after join, not swallowed
            produce_error.append(exc)
        finally:
            chunk_q.put(None)

    write_q: "queue.Queue" = queue.Queue(maxsize=2)
    write_error: list = []  # consumer exception, re-raised after join
    written = [0]  # frames encoded so far (int in a list: GIL-atomic set)
    writer_box: list = [None]  # cv2.VideoWriter, created on first frame

    def _consume():
        try:
            while True:
                entry = write_q.get()
                if entry is None:
                    return
                out_dev, n = entry
                arr = np.asarray(out_dev)  # d2h; blocks this thread only
                for f in arr[:n]:
                    if writer_box[0] is None:
                        h, w = f.shape[:2]
                        # Codec by extension: .avi gets lossless FFV1 (the
                        # bit-exact regression-fixture path), everything
                        # else the portable mp4v default.
                        ext = os.path.splitext(out_path)[1].lower()
                        fourcc = "FFV1" if ext == ".avi" else "mp4v"
                        writer_box[0] = cv2.VideoWriter(
                            out_path, cv2.VideoWriter_fourcc(*fourcc), fps,
                            (w, h))
                    writer_box[0].write(f)
                written[0] += n
        except BaseException as exc:
            write_error.append(exc)
            while write_q.get() is not None:  # drain; don't deadlock puts
                pass

    reader = threading.Thread(target=_produce, daemon=True)
    encoder = threading.Thread(target=_consume, daemon=True)
    reader.start()
    encoder.start()

    def pad_to_batch(x):
        if len(x) == cfg.batch_size:
            return x
        reps = np.zeros((cfg.batch_size - len(x),) + x.shape[1:], x.dtype)
        return np.concatenate([x, reps], axis=0)

    total = 0
    while True:
        item = chunk_q.get()
        if item is None:
            break
        imgs, deps = item
        n = min(len(imgs), len(deps))
        out = _device_chunk(jnp.asarray(pad_to_batch(imgs[:n])),
                            jnp.asarray(pad_to_batch(deps[:n])), cfg)
        write_q.put((out, n))  # async value; consumer blocks on readiness
        total += n
        if progress:
            print(f"\rconverted {written[0]} frames", end="", flush=True)
    reader.join()
    write_q.put(None)
    encoder.join()
    if writer_box[0] is not None:
        writer_box[0].release()
    if produce_error:
        raise RuntimeError(
            f"video decode failed after {written[0]} frames"
        ) from produce_error[0]
    if write_error:
        raise RuntimeError(
            f"video encode failed after {written[0]} frames"
        ) from write_error[0]
    if progress:
        print(f"\rconverted {written[0]} frames")
    return total
