from . import base, les, ras  # noqa: F401
from .base import select  # noqa: F401
