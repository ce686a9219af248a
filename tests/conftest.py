"""Test configuration: run everything on a simulated 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os

# Force CPU: the harness environment presets JAX_PLATFORMS=axon (one real TPU
# chip); unit tests must run on the simulated 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
