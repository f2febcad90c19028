"""Rollout visualization: render a policy's gait as skeleton/trace figures.

The reference envs render live through PyBullet's GUI (collect_tarsim_traj.py
defaults ``render=True``; laikago_env_v4.py camera-tracks the torso).  This
module is the headless TPU-native analog: re-roll a trajectory capturing the
generalized coordinates, run forward kinematics on the host, and draw

* a side view (x-z): link-skeleton snapshots every ``stride`` control steps,
  shaded light->dark by time (single-hue sequential), over the floor line and
  the finite deform-mattress extent (shaded neutral gray), plus the foot/toe
  contact trace;
* a top-down view (x-y, floating-base robots only): the base-COM path over
  the mattress rectangle — the "did it walk off the mattress edge?" panel
  that round 3's laika_deform re-analysis needed trajectory dumps to answer.

Matplotlib only, PNG output; no interactive dependencies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.agents import networks


def rollout_qs(env, model, params, key, max_steps: int,
               deterministic: bool = True):
    """Roll ONE trajectory; returns (qs (T, nq), rewards (T,), valid (T,))
    with done-latching (frozen after termination), as numpy arrays."""

    def body(carry, k):
        state, obs, alive = carry
        _, action, _ = networks.policy_act(model, params, obs, k,
                                           deterministic=deterministic)
        s = env.step(state, action)
        from simgan_tpu.envs.base import tree_where
        new_state = tree_where(alive, s.state, state)
        new_obs = jnp.where(alive, s.obs, obs)
        out = (new_state.phys.q, s.reward, alive)
        return (new_state, new_obs, alive & ~s.done), out

    k_reset, k_steps = jax.random.split(key)
    state, obs = env.reset(k_reset)
    keys = jax.random.split(k_steps, max_steps)
    _, (qs, rewards, valid) = jax.lax.scan(
        body, (state, obs, jnp.asarray(True)), keys)
    return (np.asarray(qs), np.asarray(rewards),
            np.asarray(valid, dtype=bool))


def _all_link_points(env, qs):
    """World link positions (T, L, 3) + geom centers (T, G, 3) + radii (G,)
    for a whole trajectory — one jitted vmapped FK pass."""
    from simgan_tpu.physics.kinematics import forward_kinematics, geom_world

    sys = env.sys
    base_pos = getattr(env.phys_cfg, "base_pos", (0.0, 0.0, 0.0))

    def one(q):
        kin = forward_kinematics(sys, q,
                                 base_pos=jnp.asarray(base_pos)
                                 if sys.fixed_base else None)
        return jnp.stack(kin.pos), geom_world(sys, kin)[0]

    pos, centers = jax.jit(jax.vmap(one))(jnp.asarray(qs))
    return np.asarray(pos), np.asarray(centers), np.asarray(sys.geom_radius)


def render_rollout(env, model, params, key, out_path: str,
                   max_steps: int = 500, deterministic: bool = True,
                   stride: int = 25, title: str = ""):
    """Render one rollout to ``out_path`` (PNG).  Returns (reward, length)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm

    qs, rewards, valid = rollout_qs(env, model, params, key, max_steps,
                                    deterministic)
    length = int(valid.sum())
    total_r = float((rewards * valid).sum())
    qs = qs[:max(length, 1)]

    sys = env.sys
    parent = sys.parent
    frames = list(range(0, len(qs), stride)) + [len(qs) - 1]
    # single-hue sequential: light -> dark encodes time
    cmap = cm.get_cmap("Blues")
    shades = [cmap(0.3 + 0.65 * i / max(len(frames) - 1, 1))
              for i in range(len(frames))]

    floating = not sys.fixed_base
    fig, axes = plt.subplots(2 if floating else 1, 1,
                             figsize=(11, 8 if floating else 4.5),
                             squeeze=False)
    ax = axes[0][0]

    # floor + mattress extent from the env's reset-time DomainParams
    if hasattr(env, "_default_dp"):
        dp = env._default_dp()
    else:
        s0, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        dp = s0.dp
    floor_z = float(dp.floor_z)
    mx = np.asarray(dp.mattress_x)
    finite_mattress = mx[1] - mx[0] < 1e8

    pos_all, centers_all, radii = _all_link_points(env, qs)   # (T,L,3),(T,G,3)
    for fi, t in enumerate(frames):
        pos, centers = pos_all[t], centers_all[t]
        # skeleton: parent-child bones
        for l in range(1, sys.n_links):
            p = parent[l]
            if p < 0:
                continue
            ax.plot([pos[p, 0], pos[l, 0]], [pos[p, 2], pos[l, 2]],
                    color=shades[fi], lw=2, solid_capstyle="round", zorder=3)
        # contact spheres as circles
        for g in range(len(radii)):
            ax.add_patch(plt.Circle((centers[g, 0], centers[g, 2]),
                                    float(radii[g]), fill=False,
                                    color=shades[fi], lw=0.8, zorder=2))
    # lowest contact point trace (x, z) + base path (x, y)
    low_g = centers_all[:, :, 2].argmin(axis=1)
    toes_xz = centers_all[np.arange(len(qs)), low_g][:, [0, 2]]
    base_xy = pos_all[:, 0, :][:, [0, 1]]
    ax.plot(toes_xz[:, 0], toes_xz[:, 1], color="#888888", lw=1,
            alpha=0.8, zorder=1)

    pts = pos_all[frames].reshape(-1, 3)
    x_lo = min(pts[:, 0].min(), -0.5) - 0.3
    x_hi = max(pts[:, 0].max(), 1.0) + 0.3
    ax.axhline(floor_z, color="#444444", lw=1, zorder=0)
    if finite_mattress:
        ax.axvspan(max(mx[0], x_lo), min(mx[1], x_hi), ymax=0.08,
                   color="#bbbbbb", alpha=0.6, zorder=0)
        for edge in mx:
            if x_lo < edge < x_hi:
                ax.axvline(edge, color="#999999", lw=1, ls="--", zorder=0)
    ax.set_xlim(x_lo, x_hi)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.spines[["top", "right"]].set_visible(False)
    head = title or type(env).__name__
    ax.set_title(f"{head} — reward {total_r:.1f}, len {length}"
                 + (f", mattress x∈[{mx[0]:.0f},{mx[1]:.0f}]"
                    if finite_mattress else ""),
                 fontsize=10)

    if floating:
        ax2 = axes[1][0]
        ax2.plot(base_xy[:, 0], base_xy[:, 1], color="#1f4e79", lw=1.5)
        ax2.plot(base_xy[0, 0], base_xy[0, 1], "o", color="#1f4e79", ms=5)
        ax2.plot(base_xy[-1, 0], base_xy[-1, 1], "s", color="#1f4e79", ms=5)
        if finite_mattress:
            my = np.asarray(dp.mattress_y)
            ax2.axvspan(max(mx[0], x_lo), min(mx[1], x_hi),
                        color="#bbbbbb", alpha=0.4, zorder=0)
            for edge in mx:
                if x_lo < edge < x_hi:
                    ax2.axvline(edge, color="#999999", lw=1, ls="--")
        ax2.set_xlim(x_lo, x_hi)
        ax2.set_xlabel("x [m]")
        ax2.set_ylabel("y [m]")
        ax2.spines[["top", "right"]].set_visible(False)
        ax2.set_title("base path, top-down (o start, ■ end)", fontsize=10)

    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return total_r, length
