from . import fvc, fvm, surface  # noqa: F401
from .matrix import FvMatrix  # noqa: F401
