"""Device meshes, shardings, and accelerator health probing."""

from vsc_tpu.parallel.mesh import data_sharding, make_mesh, replicated
from vsc_tpu.parallel.health import ACCEL_ERROR_EXIT_CODE, check_accelerator_health

__all__ = [
    "ACCEL_ERROR_EXIT_CODE",
    "check_accelerator_health",
    "data_sharding",
    "make_mesh",
    "replicated",
]
