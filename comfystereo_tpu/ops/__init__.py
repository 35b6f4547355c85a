"""TPU-native stereo compute ops (pure JAX/XLA; Pallas where hot)."""
from . import blur, depth, fills, pack, polylines, scan, warp  # noqa: F401
