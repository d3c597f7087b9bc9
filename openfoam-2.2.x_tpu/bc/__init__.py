from . import patchfields  # noqa: F401
from . import derived2  # noqa: F401  (registers batch-2 derived BCs)
from . import derived3  # noqa: F401  (registers batch-3 derived BCs)
from . import derived4  # noqa: F401  (registers batch-4 derived BCs)
from .patchfields import (  # noqa: F401
    PatchField,
    fixed_value,
    zero_gradient,
    fixed_gradient,
    mixed,
    make,
    default_bcs,
)
