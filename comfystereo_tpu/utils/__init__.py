from . import caching, fixtures, profiling  # noqa: F401
