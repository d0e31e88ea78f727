"""Test configuration: route everything to the CPU backend with 8 virtual
devices so sharding tests run anywhere (mirrors the driver's
dryrun_multichip environment).

Note: the axon TPU plugin in this image ignores JAX_PLATFORMS, so we pin
jax_default_device to CPU instead and build meshes from jax.devices("cpu").
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass
