"""simgan_tpu: a TPU-native rebuild of the SimGAN hybrid-simulator framework.

JAX/XLA compute path (physics engine, envs, PPO/GAIL) with pjit/shard_map
scaling; see README.md for the architecture map against the reference.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: identify/refine compiles at the
# production rollout shapes take 10-20 min against the remote TPU compile
# server; experiments re-run the SAME shapes (all laikago variants share
# one identify/refine HLO), so caching them turns every run after the
# first into a seconds-level warmup.  Opt out with SIMGAN_NO_JAX_CACHE=1.
# CPU backend is excluded: XLA:CPU executable serialization can SIGABRT
# inside the cache write (observed in the slow pipeline tests), and local
# CPU compiles don't need the cache anyway.
if not _os.environ.get("SIMGAN_NO_JAX_CACHE") \
        and _os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
    _cache = _os.environ.get(
        "SIMGAN_JAX_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without the knobs: cache is best-effort
        pass
