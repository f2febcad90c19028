"""Deformable mattress: the reference's actual 8-vertex mass-spring cube.

The reference's "soft body" (``loadSoftBody(cube_fat.obj, scale=20, ...)``,
hopper_env_v3.py:143-149, laikago_env_v4.py:177-183) is an 8-VERTEX box
(assets/cube_fat.obj: a unit cube of half-height 0.25, so 20 x 20 x 10 m
after scaling) with mass-spring forces on its 12 edges plus bending springs
(vertex pairs at edge-graph distance 2), ``useFaceContact=1`` so rigid bodies
contact its faces with barycentric force distribution, total mass 20 kg
(hopper) / 4000 kg (laikago) spread uniformly over the 8 vertices.

TPU-native reduction (documented, not approximated away):

* The bottom 4 vertices rest on the backup plane (lateralFriction 100) under
  the slab's weight and never lift; we pin them.  The top 4 vertices move
  VERTICALLY (every top-top spring is horizontal, so vertical deflections
  couple through contact only; lateral top motion is second-order for
  locomotion loads).  State is therefore (4,) deflections + (4,) velocities
  measured from the gravity-settled rest surface.
* Per top vertex, the vertical stiffness is the vertical edge spring (k)
  plus the two side-face bending diagonals to pinned bottom vertices, each
  contributing k*cos^2(theta) with cos(theta) = 10/sqrt(10^2 + 20^2):
  k_eff = k * (1 + 2*(10^2/500)) = 1.4 k; damping likewise d_eff = 1.4 d
  (springDampingAllDirections=1 damps relative velocity along each spring).
* Face contact: a contact at (x, y) distributes its normal impulse to the 4
  top vertices by bilinear weights over the 20 x 20 top face (Bullet uses
  the two top triangles' barycentrics; bilinear is the smooth quad analog).
  The surface height/velocity under the contact is the same weighting of
  vertex deflections/velocities — so a crater made by one foot lowers the
  surface under every other foot (the neighbor coupling the half-space
  surrogate lacks), and vertex inertia (2.5 kg hopper / 500 kg laikago)
  absorbs impact energy the surrogate returns as rebound.

Integration is per 500 Hz substep, implicit in the spring-damper (the
per-vertex update is a scalar linear solve, unconditionally stable for the
stiff laikago constants).  Enabled via ``deform_nodes`` on the deform target
envs; OFF by default — the rows of record use the calibrated half-space
surrogate (physics/contact.py docstring, RESULTS.md surrogate audit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_NODES = 4  # top-face corner vertices of cube_fat.obj

# vertical projection factor of the per-vertex spring set (vertical edge +
# 2 side-face bending diagonals): 1 + 2 * (10^2 / (10^2 + 20^2))
_VERT_FACTOR = 1.4


class DeformableConfig(NamedTuple):
    """Mattress field constants (reference loadSoftBody arguments)."""

    k: float = 1500.0          # springElasticStiffness [N/m]
    d: float = 50.0            # springDampingStiffness [N*s/m]
    mass: float = 20.0         # total soft-body mass [kg] (8 vertices)
    x0: float = -3.0           # top-face extent (cube at [7,0], scale 20)
    x1: float = 17.0
    y0: float = -10.0
    y1: float = 10.0

    @property
    def node_mass(self) -> float:
        return self.mass / 8.0

    @property
    def k_eff(self) -> float:
        return _VERT_FACTOR * self.k

    @property
    def d_eff(self) -> float:
        return _VERT_FACTOR * self.d


def rest_state() -> tuple[jax.Array, jax.Array]:
    """(u, v) at the gravity-settled rest surface."""
    return jnp.zeros(N_NODES), jnp.zeros(N_NODES)


def bary_weights(p_xy: jax.Array, cfg: DeformableConfig) -> jax.Array:
    """Bilinear top-face weights (4,) for a contact at world (x, y).

    Node order: (x0,y0), (x1,y0), (x0,y1), (x1,y1).  Coordinates are clamped
    into the face, matching Bullet's face contact (a foot past the edge is
    handled by the backup hard plane, not the field).
    """
    fx = jnp.clip((p_xy[0] - cfg.x0) / (cfg.x1 - cfg.x0), 0.0, 1.0)
    fy = jnp.clip((p_xy[1] - cfg.y0) / (cfg.y1 - cfg.y0), 0.0, 1.0)
    return jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                      (1 - fx) * fy, fx * fy])


def geom_weights(p_geom: jax.Array, cfg: DeformableConfig) -> jax.Array:
    """(G, 4) bilinear weights for all candidate contact geoms."""
    ws = [bary_weights(p_geom[g, :2], cfg) for g in range(p_geom.shape[0])]
    return jnp.stack(ws)


def surface_offset(w: jax.Array, u: jax.Array) -> jax.Array:
    """Deflection (or vertical velocity) of the face under each geom: w @ u."""
    return jnp.sum(w * u, axis=-1)


def node_substep(u: jax.Array, v: jax.Array, impulse: jax.Array,
                 cfg: DeformableConfig, dt: float) -> tuple[jax.Array, jax.Array]:
    """One 500 Hz vertex update with an applied contact impulse (4,) [N*s].

    Implicit in the spring-damper:
        v+ = (v + dt/m * (-k_eff u) + J/m) / (1 + dt d_eff/m + dt^2 k_eff/m)
        u+ = u + dt v+
    Unconditionally stable; steady state under constant force F is u = F/k_eff.
    Contact impulses push vertices DOWN (reaction to the upward normal
    impulse on the robot), so ``impulse`` enters negatively at the caller.
    """
    m = cfg.node_mass
    denom = 1.0 + dt * cfg.d_eff / m + dt * dt * cfg.k_eff / m
    v_new = (v + (dt * (-cfg.k_eff * u) + impulse) / m) / denom
    u_new = u + dt * v_new
    return u_new, v_new
