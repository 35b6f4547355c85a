"""comfystereo_tpu — TPU-native stereo image/video framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Dobidop/ComfyStereo (three subsystems, reference __init__.py:1-8):

  1. Stereo image generation: depth-map -> stereo-pair conversion
     (ops/ + pipeline.py — the compute core).
  2. StereoDiffusion: AI stereo generation via latent shifting, DDIM
     inversion + null-text optimization, and warp+inpaint (diffusion/).
  3. Native VR viewing: host-side OpenXR/OpenGL shim (viewer/), optional.

Node groups degrade gracefully when optional host dependencies are missing,
mirroring the reference's import-guard pattern (reference __init__.py:14-42).
"""
from __future__ import annotations

from .config import StereoConfig, FILL_TECHNIQUES, MODES, UI_FILL_MAPPING  # noqa: F401
from .pipeline import stereo_pipeline, apply_stereo_divergence  # noqa: F401
from . import ops  # noqa: F401

__version__ = "0.1.0"

NODE_CLASS_MAPPINGS = {}
NODE_DISPLAY_NAME_MAPPINGS = {}

# Stereo image nodes: always available (pure JAX).
try:
    from .nodes.stereo_image import (  # noqa: F401
        StereoImageNode,
        NODE_CLASS_MAPPINGS as _stereo_mappings,
        NODE_DISPLAY_NAME_MAPPINGS as _stereo_names,
    )
    NODE_CLASS_MAPPINGS.update(_stereo_mappings)
    NODE_DISPLAY_NAME_MAPPINGS.update(_stereo_names)
    STEREO_NODES_AVAILABLE = True
except ImportError as e:  # pragma: no cover
    STEREO_NODES_AVAILABLE = False
    _stereo_import_error = str(e)

# StereoDiffusion nodes (JAX diffusion stack).
try:
    from .nodes.stereodiffusion import (  # noqa: F401
        NODE_CLASS_MAPPINGS as _sd_mappings,
        NODE_DISPLAY_NAME_MAPPINGS as _sd_names,
    )
    NODE_CLASS_MAPPINGS.update(_sd_mappings)
    NODE_DISPLAY_NAME_MAPPINGS.update(_sd_names)
    DIFFUSION_NODES_AVAILABLE = True
except ImportError:  # pragma: no cover
    DIFFUSION_NODES_AVAILABLE = False

# Native VR viewer nodes (host-side OpenXR/OpenGL; optional).
try:
    from .nodes.native_nodes import (  # noqa: F401
        NODE_CLASS_MAPPINGS as _vr_mappings,
        NODE_DISPLAY_NAME_MAPPINGS as _vr_names,
    )
    NODE_CLASS_MAPPINGS.update(_vr_mappings)
    NODE_DISPLAY_NAME_MAPPINGS.update(_vr_names)
    VR_NODES_AVAILABLE = True
except ImportError:  # pragma: no cover
    VR_NODES_AVAILABLE = False
