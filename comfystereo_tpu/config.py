"""Configuration schema for the TPU-native stereo pipeline.

`StereoConfig` mirrors the reference Stereo Image node's parameter table exactly
(names, defaults, ranges from GenerateStereo.py:47-73 in Dobidop/ComfyStereo) so a
user of the reference node can switch without relearning parameters.

All fields that change compiled-program structure (fill technique, modes) are kept
as static/hashable values so a `StereoConfig` can be passed as a static argument to
`jax.jit`-compiled pipeline functions.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

# Output packing modes (reference: stereoimage_generation.py:1544-1560, :1092-1122).
MODES = (
    "left-right",
    "right-left",
    "top-bottom",
    "bottom-top",
    "red-cyan-anaglyph",
    "cyan-red-reverseanaglyph",
    "left-only",
    "only-right",
)

# Engine-level fill technique identifiers
# (reference dispatcher: stereoimage_generation.py:1576-1620).
FILL_TECHNIQUES = (
    "gpu_warp",            # forward warp + z-buffer + border interp (reference :277-450)
    "none",                # naive scatter, gaps left black (reference :1850-1910)
    "naive",               # naive scatter + nearest-neighbor fill
    "naive_interpolating", # naive scatter + linear border interpolation
    "none_post",           # naive scatter + row-wise np.interp post fill (reference :1804)
    "inverse",             # z-buffered sub-pixel splat (reference :1715-1737)
    "inverse_post",        # inverse + row-wise post fill (reference :1820)
    "hybrid_edge",         # Gaussian 3-col splat + edge-aware 2D fill (reference :1837)
    "hybrid_edge_plus",    # hybrid_edge + polylines_soft backfill (reference :1778)
    "polylines_soft",      # scanline polyline renderer (reference :1912-1992)
    "polylines_sharp",
)

# UI-name -> engine-name mapping (reference: GenerateStereo.py:88-102).
UI_FILL_MAPPING = {
    "GPU Warp (Fast)": "gpu_warp",
    "No fill": "none",
    "No fill - Reverse projection": "inverse",
    "Imperfect fill - Hybrid Edge": "hybrid_edge",
    "Fill - Naive": "naive",
    "Fill - Naive interpolating": "naive_interpolating",
    "Fill - Polylines Soft": "polylines_soft",
    "Fill - Polylines Sharp": "polylines_sharp",
    "Fill - Post-fill": "none_post",
    "Fill - Reverse projection with Post-fill": "inverse_post",
    "Fill - Hybrid Edge with fill": "hybrid_edge_plus",
}


@dataclasses.dataclass(frozen=True)
class StereoConfig:
    """Static configuration for depth->stereo conversion.

    Defaults and ranges mirror the reference node schema
    (GenerateStereo.py:61-71); see each field's comment for the source line.
    """

    # 3D effect strength, percent of image width (default 4.5, range 0.05-15).
    divergence: float = 4.5
    # Additional horizontal shift, percent of width (default 0, range -5..5).
    separation: float = 0.0
    # Divergence split between eyes (default 0, range -0.95..0.95):
    #   left = divergence*(1+balance), right = divergence*(1-balance).
    stereo_balance: float = 0.0
    # Depth that maps to the screen plane (default 0.5, range 0..1).
    convergence_point: float = 0.5
    # Depth-to-offset power curve (node default 2, range 0.1-2).
    stereo_offset_exponent: float = 2.0
    # Fill technique (engine name, see FILL_TECHNIQUES).
    fill_technique: str = "gpu_warp"
    # Output packing modes.
    modes: Tuple[str, ...] = ("left-right",)

    # --- depth pre-blur (reference defaults: GenerateStereo.py:66-70) ---
    depth_map_blur: bool = True
    depth_blur_edge_threshold: float = 20.0
    depth_blur_strength: float = 20.0
    depth_blur_falloff: float = 2.0
    depth_blur_vert_smooth: int = 6

    # Frames per device-side kernel launch (reference default 12).
    batch_size: int = 12

    # --- gpu_warp engine knobs (reference forward_warp_gpu defaults, :277-279) ---
    gradient_threshold: float = 1.5
    max_stretch: int = 8

    # Exact sub-interval integration for polylines: bit-parity with the
    # reference scanline renderer, computed by the in-kernel breakpoint
    # walk (pallas/polylines_exact_kernel.py). This is both the exact AND
    # the fast mode (~7.4 ms/frame at 1080p sharp, ~4.6 soft — round 3).
    # False selects the legacy supersampled Pallas kernel (~28 ms/frame at
    # 1080p; parity within a few LSB at polylines_samples samples/pixel),
    # kept only as a compatibility opt-out.
    polylines_exact: bool = True
    # Supersampling rate for the TPU polylines renderer (samples per output px).
    polylines_samples: int = 8

    # Color-plane dtype for the gpu_warp path. "bfloat16" halves HBM traffic
    # on the bandwidth-bound color reads/writes (geometry/z math stays f32);
    # outputs stay within ~1 LSB of f32 after uint8 quantization.
    color_dtype: str = "float32"

    def __post_init__(self):
        if self.color_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"unknown color_dtype {self.color_dtype!r}; "
                "expected 'float32' or 'bfloat16'")
        if self.fill_technique not in FILL_TECHNIQUES:
            raise ValueError(
                f"unknown fill_technique {self.fill_technique!r}; "
                f"expected one of {FILL_TECHNIQUES}")
        for m in self.modes:
            if m not in MODES:
                raise ValueError(f"unknown mode {m!r}; expected one of {MODES}")

    @classmethod
    def from_ui(cls, fill_technique_ui: str = "GPU Warp (Fast)", **kw) -> "StereoConfig":
        """Build a config from the UI-level fill technique name."""
        return cls(fill_technique=UI_FILL_MAPPING.get(fill_technique_ui, "gpu_warp"), **kw)

    def eye_divergences(self) -> Tuple[float, float]:
        """(left, right) divergence percentages after stereo_balance split
        (reference: stereoimage_generation.py:1533-1534)."""
        return (self.divergence * (1.0 + self.stereo_balance),
                self.divergence * (1.0 - self.stereo_balance))
