"""Stereo Image node — the public node contract, preserved exactly.

Input names/defaults/ranges mirror the reference StereoImageNode
(GenerateStereo.py:47-77): image, depth_map, modes, fill_technique (UI names),
divergence/separation/stereo_balance/convergence_point/stereo_offset_exponent,
depth-blur knobs, batch_size. Outputs (:75-76): stereoscope IMAGE,
blurred_depthmap_left IMAGE, blurred_depthmap_right IMAGE,
no_fill_imperfect_mask MASK.

Works standalone (numpy/JAX arrays in, numpy out) and inside ComfyUI (torch
tensors pass through np.asarray). Frames stream through the jitted pipeline
in batch_size chunks — the device-side batching the reference does manually
with cache purges (GenerateStereo.py:117-179) is just chunked jit calls here.
"""
from __future__ import annotations

import numpy as np

from ..config import MODES, UI_FILL_MAPPING, StereoConfig
from ..ops import depth as depth_ops
from ..pipeline import stereo_pipeline

try:  # ComfyUI progress bar, optional
    from comfy.utils import ProgressBar  # type: ignore
except Exception:  # pragma: no cover
    class ProgressBar:
        def __init__(self, total):
            self.total = total

        def update(self, n):
            pass


def _to_numpy(x) -> np.ndarray:
    """Accept numpy / JAX / torch tensors."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _gray_depth(dm: np.ndarray) -> np.ndarray:
    """[B,H,W,C] or [B,H,W] -> [B,H,W] grayscale (GenerateStereo.py:134-139)."""
    if dm.ndim == 4:
        if dm.shape[-1] == 3:
            return (0.2989 * dm[..., 0] + 0.5870 * dm[..., 1]
                    + 0.1140 * dm[..., 2])
        return dm[..., 0]
    return dm


def _resize_bilinear(dm: np.ndarray, h: int, w: int) -> np.ndarray:
    if dm.shape[1:] == (h, w):
        return dm
    import jax
    return np.asarray(jax.image.resize(dm, (dm.shape[0], h, w), "bilinear"))


class StereoImageNode:
    """Depth map + image -> stereoscopic image (SBS/TB/anaglyph)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "image": ("IMAGE",),
                "depth_map": ("IMAGE",),
                "modes": (list(MODES[:5]),),
                "fill_technique": (list(UI_FILL_MAPPING.keys())[:8], {
                    "default": "GPU Warp (Fast)",
                    "tooltip": "How disoccluded (newly revealed) areas are "
                               "filled. 'GPU Warp (Fast)' is the fast "
                               "accelerator warp; 'No fill' leaves gaps "
                               "black; 'No fill - Reverse projection' fills "
                               "by reverse projection (artifacts possible); "
                               "'Imperfect fill - Hybrid Edge' mixes "
                               "edge-based fill; the remaining 'Fill' "
                               "variants trade quality for speed with "
                               "different gap-filling algorithms."}),
            },
            "optional": {
                "divergence": ("FLOAT", {
                    "default": 4.5, "min": 0.05, "max": 15, "step": 0.01,
                    "tooltip": "Strength of the stereo effect. Larger values "
                               "deepen the 3D impression but can become "
                               "uncomfortable to view."}),
                "separation": ("FLOAT", {
                    "default": 0, "min": -5, "max": 5, "step": 0.01,
                    "tooltip": "Extra horizontal offset between the stereo "
                               "pair. Positive widens, negative narrows; "
                               "useful for tuning the effect and reducing "
                               "ghosting."}),
                "stereo_balance": ("FLOAT", {
                    "default": 0, "min": -0.95, "max": 0.95, "step": 0.05,
                    "tooltip": "How the total shift is split between the two "
                               "eyes. Positive biases the left image, "
                               "negative the right; compensates an "
                               "unbalanced stereo effect."}),
                "convergence_point": ("FLOAT", {
                    "default": 0.5, "min": 0.0, "max": 1.0, "step": 0.05,
                    "tooltip": "Depth plane where the eyes converge (zero "
                               "parallax): 0.0 converges at the far plane, "
                               "1.0 at the near plane."}),
                "stereo_offset_exponent": ("FLOAT", {
                    "default": 2, "min": 0.1, "max": 2, "step": 0.1,
                    "tooltip": "Exponent of the depth-to-shift curve. Higher "
                               "values emphasize near depths; lower values "
                               "spread the effect evenly across all "
                               "depths."}),
                "depth_map_blur": ("BOOLEAN", {
                    "default": True,
                    "tooltip": "Blur the depth map before warping. Smooths "
                               "noise and depth transitions, improving "
                               "results around high-frequency detail."}),
                "depth_blur_edge_threshold": ("FLOAT", {
                    "default": 20, "min": 0.1, "max": 60, "step": 0.1,
                    "tooltip": "Edge-preservation threshold for the depth "
                               "blur. Lower keeps more edges crisp; higher "
                               "lets the blur cross more edges."}),
                "depth_blur_strength": ("FLOAT", {
                    "default": 20, "min": 0.1, "max": 200, "step": 0.1,
                    "tooltip": "Intensity of the depth-map blur. Higher "
                               "smooths noisy or harsh depth maps more, at "
                               "the cost of fine depth detail."}),
                "depth_blur_falloff": ("FLOAT", {
                    "default": 2.0, "min": 0.1, "max": 4.0, "step": 0.1,
                    "tooltip": "Falloff curve of blur influence away from "
                               "edges (1.0 = linear). Higher keeps the blur "
                               "tight to edges — better for thin objects; "
                               "lower spreads a softer influence."}),
                "depth_blur_vert_smooth": ("INT", {
                    "default": 6, "min": 0, "max": 15, "step": 1,
                    "tooltip": "Vertical smoothing radius (px) on the blur "
                               "weight map; blends activation across rows to "
                               "remove horizontal stripe artifacts. 0 "
                               "disables; 3-7 is typical."}),
                "batch_size": ("INT", {
                    "default": 12, "min": 1, "max": 64, "step": 1,
                    "tooltip": "Frames processed per device batch. Smaller "
                               "uses less accelerator memory; larger is "
                               "usually faster."}),
            },
        }

    RETURN_TYPES = ("IMAGE", "IMAGE", "IMAGE", "MASK")
    RETURN_NAMES = ("stereoscope", "blurred_depthmap_left",
                    "blurred_depthmap_right", "no_fill_imperfect_mask")
    FUNCTION = "generate"
    CATEGORY = "stereo"

    def generate(self, image, depth_map, divergence=4.5, separation=0.0,
                 modes="left-right", stereo_balance=0.0, convergence_point=0.5,
                 stereo_offset_exponent=2.0, fill_technique="GPU Warp (Fast)",
                 depth_blur_edge_threshold=20.0, depth_blur_strength=20.0,
                 depth_map_blur=True, depth_blur_falloff=2.0,
                 depth_blur_vert_smooth=6, batch_size=12):
        import jax.numpy as jnp

        img = _to_numpy(image).astype(np.float32)
        dm = _gray_depth(_to_numpy(depth_map).astype(np.float32))
        if img.ndim == 3:
            img = img[None]
        if dm.ndim == 2:
            dm = dm[None]
        b, h, w, _ = img.shape
        dm = _resize_bilinear(dm, h, w)

        cfg = StereoConfig(
            divergence=float(divergence), separation=float(separation),
            stereo_balance=float(stereo_balance),
            convergence_point=float(convergence_point),
            stereo_offset_exponent=float(stereo_offset_exponent),
            fill_technique=UI_FILL_MAPPING.get(fill_technique, "gpu_warp"),
            modes=(modes,) if isinstance(modes, str) else tuple(modes),
            depth_map_blur=bool(depth_map_blur),
            depth_blur_edge_threshold=float(depth_blur_edge_threshold),
            depth_blur_strength=float(depth_blur_strength),
            depth_blur_falloff=float(depth_blur_falloff),
            depth_blur_vert_smooth=int(depth_blur_vert_smooth),
            batch_size=int(batch_size))

        results, lds, rds, masks = [], [], [], []
        pbar = ProgressBar(b)
        for s in range(0, b, cfg.batch_size):
            e = min(s + cfg.batch_size, b)
            out = stereo_pipeline(jnp.asarray(img[s:e]), jnp.asarray(dm[s:e]),
                                  cfg)
            results.append(np.asarray(out["stereo"][0]))
            lds.append(np.asarray(out["left_depth"]))
            rds.append(np.asarray(out["right_depth"]))
            masks.append(np.asarray(out["mask"]))
            pbar.update(e - s)

        stereo = np.concatenate(results, axis=0)
        left_d = np.concatenate(lds, axis=0)[..., None].repeat(3, -1)
        right_d = np.concatenate(rds, axis=0)[..., None].repeat(3, -1)
        mask = np.concatenate(masks, axis=0)
        return stereo, left_d, right_d, mask


NODE_CLASS_MAPPINGS = {"StereoImageNode": StereoImageNode}
NODE_DISPLAY_NAME_MAPPINGS = {"StereoImageNode": "Stereo Image Node"}
