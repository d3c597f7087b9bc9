"""Precision policy.

Reference is float64 everywhere (scalar = double,
reference: src/OpenFOAM/primitives/Scalar/). TPU f64 is emulated and
slow, so the default device dtype is float32 with care taken in
reductions; set FOAMTPU_X64=1 (and jax_enable_x64) for f64 verification
runs on CPU. Host-side geometry precompute is always float64.
"""

import os

import numpy as np


def x64_enabled() -> bool:
    return os.environ.get("FOAMTPU_X64", "0") not in ("0", "", "false")


def scalar_np():
    return np.float64 if x64_enabled() else np.float32


def scalar_dtype():
    import jax.numpy as jnp

    return jnp.float64 if x64_enabled() else jnp.float32


label_np = np.int32


def install_fpe_trap() -> bool:
    """sigFpe analogue (reference: src/OSspecific/POSIX/signals/
    sigFpe.C — feenableexcept + FOAM_SIGFPE): FOAMTPU_SIGFPE=1 turns
    on jax_debug_nans so the first NaN-producing primitive raises with
    a traceback instead of silently poisoning the run."""
    if os.environ.get("FOAMTPU_SIGFPE", "0") in ("0", "", "false"):
        return False
    import jax

    jax.config.update("jax_debug_nans", True)
    return True


install_fpe_trap()
