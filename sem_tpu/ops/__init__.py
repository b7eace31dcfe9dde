"""Custom TPU kernels (Pallas)."""
from sem_tpu.ops.pallas_kernels import (apply_system_pallas,
                                         apply_system_best)

__all__ = ["apply_system_pallas", "apply_system_best"]
