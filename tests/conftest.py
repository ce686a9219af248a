"""Test configuration: run everything on a simulated 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os
import sys

# Force CPU: the harness presets JAX_PLATFORMS=axon (one real TPU chip) and a
# sitecustomize that registers the axon backend at interpreter start whenever
# PALLAS_AXON_POOL_IPS is set — env tweaks after startup are too late. If the
# axon backend is already registered in this interpreter, re-exec pytest in a
# clean environment so unit tests run on the simulated 8-device CPU mesh.
if os.environ.get("PALLAS_AXON_POOL_IPS") and "jax" in sys.modules:
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8").strip())
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/psalm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
