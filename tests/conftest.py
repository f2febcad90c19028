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

# The persistent compile cache exists for the TPU remote-compile path; on
# the CPU backend the cache WRITE can abort the process inside XLA's
# executable serialization (observed: SIGABRT in
# compilation_cache.put_executable_and_time during the slow pipeline
# tests).  Tests ran cache-less in rounds 1-2; keep them that way.
os.environ.setdefault("SIMGAN_NO_JAX_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
