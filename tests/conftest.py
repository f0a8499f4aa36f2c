"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is validated
against ``--xla_force_host_platform_device_count=8`` (the jax "fake cluster"
pattern), per SURVEY.md section 4.

Note: the env pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and the axon
plugin ignores a JAX_PLATFORMS override, so we must force the platform via
jax.config *before* the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
