"""Mosaic probe for the fused Pallas control-step kernel (VERDICT r2 item 4).

Builds a pair-free hopper (the in-kernel unrolled PGS supports floor
contacts only), then attempts a real Mosaic lowering+compile on the TPU.
Captures the exact failure.  Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_probe.py
"""

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def pair_free_hopper():
    from simgan_tpu.models.hopper import make_hopper

    s = make_hopper()
    return s.replace(pair_link=(), pair_seg=None, pair_radius=None,
                     pair_friction=None)


def main():
    from simgan_tpu.core.system import DomainParams, PhysState
    from simgan_tpu.models.hopper import BASE_INIT_POS
    from simgan_tpu.ops.substep_pallas import pallas_control_step
    from simgan_tpu.physics.contact import ContactConfig
    from simgan_tpu.physics.engine import PhysicsConfig

    sys_ = pair_free_hopper()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    skip = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)), dtype=jnp.float32)
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6)), dtype=jnp.float32)
    tq = jnp.asarray(rng.uniform(-50, 50, (B, 3)), dtype=jnp.float32)
    dp1 = DomainParams.default(sys_)
    dp = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), dp1)
    cfg = PhysicsConfig(base_pos=BASE_INIT_POS,
                        contact=ContactConfig(iterations=iters, unroll=True),
                        explicit_cholesky=True)
    print(f"probe B={B} tile={tile} skip={skip} iters={iters} "
          f"backend={jax.devices()[0].platform}", flush=True)
    try:
        f = jax.jit(lambda q, qd, tq, dp: pallas_control_step(
            sys_, dp, PhysState(q=q, qd=qd), tq, cfg, control_skip=skip,
            tile=tile, interpret=False))
        lowered = f.lower(q, qd, tq, dp)
        print("LOWERED ok (client-side Mosaic MLIR generated)", flush=True)
        compiled = lowered.compile()
        print("COMPILED ok", flush=True)
        out = f(q, qd, tq, dp)
        out.q.block_until_ready()
        print("RAN ok; q[0]:", np.asarray(out.q[0]), flush=True)
    except Exception as e:
        print(f"FAIL at stage above: {type(e).__name__}", flush=True)
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
