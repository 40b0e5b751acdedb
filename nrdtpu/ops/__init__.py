from . import resample, stencil, tiles  # noqa: F401
