"""Test configuration: force JAX onto the host CPU platform (with a virtual
8-device mesh) before any test runs.

The deployment image's sitecustomize registers a TPU PJRT plugin and forces
it as the default platform even when JAX_PLATFORMS=cpu is set, so the env
var alone is not enough — re-apply it via jax.config after import.  Tests
must not share the single TPU tunnel across processes (concurrent clients
wedge it).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
