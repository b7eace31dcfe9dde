"""Custom TPU kernels (Pallas)."""
from sem_tpu.ops.pallas_kernels import (apply_system_pallas,
                                        apply_system_best,
                                        apply_coupled_system_pallas,
                                        apply_system_pallas_sharded,
                                        apply_coupled_system_pallas_sharded,
                                        coupled_pallas_wanted,
                                        pallas_wanted,
                                        sharded_pallas_mesh)

__all__ = ["apply_system_pallas", "apply_system_best",
           "apply_coupled_system_pallas", "coupled_pallas_wanted",
           "pallas_wanted", "apply_system_pallas_sharded",
           "apply_coupled_system_pallas_sharded", "sharded_pallas_mesh"]
