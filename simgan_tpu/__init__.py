"""simgan_tpu: a TPU-native rebuild of the SimGAN hybrid-simulator framework.

JAX/XLA compute path (physics engine, envs, PPO/GAIL) with pjit/shard_map
scaling; see README.md for the architecture map against the reference.
"""

__version__ = "0.1.0"
