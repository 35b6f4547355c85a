"""Pallas TPU kernels for the hot paths.

These replace the reference's native components (6 Numba JIT scanline kernels
and the ModernGL rasterizer — SURVEY.md §2.6) with Mosaic-compiled TPU code.
"""
from .gather import bounded_take_along_w  # noqa: F401
