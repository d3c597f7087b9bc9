from . import field, forces, probes, sampling, surfaces  # noqa: F401
from .base import FunctionObjectList, make_function_objects  # noqa: F401
