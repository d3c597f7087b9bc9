from . import foamlog, logging  # noqa: F401
