"""Test config: run on a virtual 8-device CPU topology so sharding /
multi-chip tests work without TPU hardware (mirrors the driver's
dryrun_multichip harness).

Note: this image pins JAX_PLATFORMS=axon via sitecustomize, so the env var
alone is not enough — we must override through jax.config before first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
