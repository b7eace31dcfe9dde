"""Custom TPU kernels (Pallas)."""
from sem_tpu.ops.pallas_kernels import (apply_system_pallas,
                                        apply_system_best,
                                        apply_coupled_system_pallas,
                                        coupled_pallas_wanted,
                                        pallas_wanted)

__all__ = ["apply_system_pallas", "apply_system_best",
           "apply_coupled_system_pallas", "coupled_pallas_wanted",
           "pallas_wanted"]
