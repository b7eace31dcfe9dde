"""Test configuration: run everything on CPU with 8 virtual devices.

The multi-device tests exercise sharding over a virtual 8-device CPU mesh —
the TPU analog of the reference's single-box ``mpirun -n 2`` test strategy
(reference study/Boussinesq_run.py; SURVEY.md §4).  The environment must be
set before JAX is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Some environments register an accelerator plugin that wins over the
# JAX_PLATFORMS env var; the config update below is authoritative.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"
