from . import patchfields  # noqa: F401
from .patchfields import (  # noqa: F401
    PatchField,
    fixed_value,
    zero_gradient,
    fixed_gradient,
    mixed,
    make,
    default_bcs,
)
