"""Running mean/std statistics as a pytree (baselines RunningMeanStd).

Reference: third_party/a2c_ppo_acktr/baselines/common/running_mean_std.py:27-59
(parallel-Welford moment merging).  Used for GAIL return normalization
(main_gail_dyn_ppo.py:198-199, 287-292) and the VecNormalize reward filter
(envs.py:122-125 with baselines VecNormalize ret=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jax.Array
    var: jax.Array
    count: jax.Array

    @classmethod
    def create(cls, shape=()) -> "RunningMeanStd":
        return cls(mean=jnp.zeros(shape), var=jnp.ones(shape), count=jnp.asarray(1e-4))

    def update(self, batch: jax.Array) -> "RunningMeanStd":
        """Update from a batch whose leading axis is the sample axis."""
        batch_mean = jnp.mean(batch, axis=0)
        batch_var = jnp.var(batch, axis=0)
        batch_count = batch.shape[0]
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * batch_count / tot
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)
