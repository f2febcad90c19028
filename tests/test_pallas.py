"""Pallas fused control-step kernel: interpret-mode equivalence vs the
reference vmap path (slow: pallas interpret executes op-by-op)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

slow = pytest.mark.skipif(
    not os.environ.get("SIMGAN_RUN_SLOW"), reason="set SIMGAN_RUN_SLOW=1")


@slow
def test_pallas_control_step_matches_reference():
    from simgan_tpu.core.system import DomainParams, PhysState
    from simgan_tpu.models.hopper import BASE_INIT_POS, make_hopper
    from simgan_tpu.ops.substep_pallas import pallas_control_step
    from simgan_tpu.physics.contact import ContactConfig
    from simgan_tpu.physics.engine import PhysicsConfig, control_step

    sys_ = make_hopper()
    B = 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)), dtype=jnp.float32)
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6)), dtype=jnp.float32)
    tq = jnp.asarray(rng.uniform(-50, 50, (B, 3)), dtype=jnp.float32)
    dp1 = DomainParams.default(sys_)
    dp = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), dp1)
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS,
                        contact=ContactConfig(iterations=2, unroll=True),
                        explicit_cholesky=True)

    ref = jax.vmap(lambda a, b, c, d: control_step(
        sys_, d, PhysState(q=a, qd=b), c, cfg, 2))(q, qd, tq, dp)
    out = pallas_control_step(sys_, dp, PhysState(q=q, qd=qd), tq, cfg,
                              control_skip=2, tile=8, interpret=True)
    np.testing.assert_allclose(out.q, ref.q, atol=1e-6)
    np.testing.assert_allclose(out.qd, ref.qd, atol=1e-6)
