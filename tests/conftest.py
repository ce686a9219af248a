"""Test configuration: run everything on a simulated 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os
import sys

# Force CPU: the harness presets JAX_PLATFORMS=axon (one real TPU chip) and a
# sitecustomize that registers the axon backend at interpreter start whenever
# PALLAS_AXON_POOL_IPS is set. Registration is lazy — no backend client
# exists until the first device op — so flipping jax_platforms to cpu here
# (before any test touches a device) is sufficient and keeps this process's
# stdout intact. (The previous os.execve re-exec ran the suite correctly but
# inherited pytest's capture tempfile as fd 1, so the terminal report
# vanished.) If a backend was already initialized, fall back to re-exec.
if os.environ.get("PALLAS_AXON_POOL_IPS") and "jax" in sys.modules:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
        assert _jax.default_backend() == "cpu"
    except Exception:  # backend already live — last resort, re-exec clean
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

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
