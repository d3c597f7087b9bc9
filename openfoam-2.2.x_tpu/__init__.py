"""foamtpu — a TPU-native unstructured finite-volume CFD framework.

A from-scratch rebuild of the capabilities of OpenFOAM-2.2.x
(reference: /root/reference, see SURVEY.md) designed TPU-first:

- Mesh and fields are struct-of-arrays jnp pytrees (no class web).
- fvm/fvc operator algebra assembles LDU-addressed sparse systems
  (reference: src/OpenFOAM/matrices/lduMatrix/) as flat arrays.
- All hot paths are gather-based (cell->face adjacency tables) rather
  than scatter-based, jitted end-to-end by XLA.
- Parallelism is GSPMD/shard_map over a jax device Mesh with ppermute
  halo exchange — the TPU equivalent of the reference's MPI domain
  decomposition (reference: src/Pstream/mpi/).

Import as ``import foamtpu`` (the ``foamtpu`` symlink points at the
``openfoam-2.2.x_tpu`` source directory).
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
