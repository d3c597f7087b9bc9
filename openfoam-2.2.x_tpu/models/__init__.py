from . import transport, turbulence  # noqa: F401
