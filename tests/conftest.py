"""Test configuration: run the suite on a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware.

Note: this environment pins ``JAX_PLATFORMS=axon`` via sitecustomize, so
the env var alone is not enough — ``jax.config.update`` wins.
"""

import os

# Must be set before jax initializes its backends.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite spends minutes re-compiling the
# same big programs (segnet, BA solvers) every run on this 1-CPU host.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Covariance/optimizer math needs true fp32 matmuls everywhere
# (TPU default matmul precision is bf16); the library also requests
# HIGHEST per-op on its precision-critical paths.
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
