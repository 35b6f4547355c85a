from . import stereo_oracle  # noqa: F401
