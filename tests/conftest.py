"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""
import os

# force the CPU backend with 8 virtual devices (CI has no TPU, and the
# multi-chip tests need a mesh); set DESCRIBEALIGN_TEST_TPU=1 to run the
# single-chip tests against real hardware instead
if not os.environ.get("DESCRIBEALIGN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # jax may already be imported by a sitecustomize hook, which latches
    # jax_platforms from the env at import time - override via config
    import jax

    jax.config.update("jax_platforms", "cpu")

from describealign_tpu.utils.jaxsetup import setup_jax_cache  # noqa: E402

setup_jax_cache()
