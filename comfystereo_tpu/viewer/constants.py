"""VR viewer constants and availability probes.

Host-side subsystem (the TPU never touches the viewer; per SURVEY.md §2.6 the
viewer stays a thin host shim). Mirrors native_viewer/constants.py:5-73 in the
reference: optional-import probes, the stereo format enum, the media update
message, and the shader's format-integer mapping.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

try:
    import xr  # pyopenxr
    import OpenGL.GL as GL  # noqa: F401
    import glfw  # noqa: F401
    PYOPENXR_AVAILABLE = True
except Exception:  # pragma: no cover - optional host deps
    xr = None
    GL = None
    glfw = None
    PYOPENXR_AVAILABLE = False

try:
    import cv2  # noqa: F401
    CV2_AVAILABLE = True
except Exception:  # pragma: no cover
    cv2 = None
    CV2_AVAILABLE = False

try:
    import os as _os

    _os.environ.setdefault("PYGAME_HIDE_SUPPORT_PROMPT", "1")
    import pygame  # noqa: F401
    PYGAME_AVAILABLE = True
except Exception:  # pragma: no cover
    pygame = None
    PYGAME_AVAILABLE = False


class StereoFormat(enum.Enum):
    SBS = "side_by_side"
    OU = "over_under"
    ANAGLYPH = "anaglyph"
    MONO = "mono"
    SEPARATE = "separate"


# Integer codes consumed by the stereo fragment shader's uniform.
FORMAT_SHADER_IDS = {
    StereoFormat.SBS: 0,
    StereoFormat.OU: 1,
    StereoFormat.ANAGLYPH: 2,
    StereoFormat.MONO: 3,
    StereoFormat.SEPARATE: 4,
}

FORMAT_CYCLE = [StereoFormat.SBS, StereoFormat.OU, StereoFormat.MONO]


class Projection(enum.Enum):
    FLAT = "flat"
    CURVED = "curved"
    SPHERE_360 = "sphere360"
    DOME_180 = "dome180"


PROJECTION_CYCLE = [Projection.FLAT, Projection.CURVED,
                    Projection.SPHERE_360, Projection.DOME_180]


@dataclasses.dataclass
class MediaUpdate:
    """Message posted to the viewer thread's queue (reference MediaUpdate)."""

    image_path: Optional[str] = None
    video_path: Optional[str] = None
    stereo_format: StereoFormat = StereoFormat.SBS
    projection: Projection = Projection.FLAT
    swap_eyes: bool = False
    loop_video: bool = True
    audio_enabled: bool = True
    screen_size: float = 4.0
    screen_distance: float = 3.0
    background_color: tuple = (0.0, 0.0, 0.0)
