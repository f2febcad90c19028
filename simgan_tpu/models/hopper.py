"""Planar hopper model.

Compiled from the reference URDF
``my_pybullet_envs/assets/hopper_my.urdf`` (and the heavy-head variant
``hopper_my_heavyhead.urdf``): a fixed-base 6-DoF chain — prismatic x,
prismatic z, revolute y passive root DoFs followed by torque-controlled
thigh/leg/foot joints (reference: my_pybullet_envs/hopper.py:15-21, 53-54).

Link chain (parent -> child):
  world(fixed base link1_1) -> rootx -> link1_2 -> rootz -> link1_3
  -> rooty -> torso -> thigh_joint -> thigh -> leg_joint -> leg
  -> foot_joint -> foot

Masses/inertias/joint frames transcribed from the URDF
(assets/hopper_my.urdf:41-147); heavy-head variant changes only torso/thigh
mass + COM (assets diff: torso 3.66519->5.66519 @ z+0.15, thigh
4.05789->5.05789 @ z -0.225->-0.125).

Contact sites (sphere approximations of the URDF capsules):
  * foot capsule (len 0.45, r 0.06, axis x, center [0.065,0,0]) -> two
    endpoint spheres; these are the geoms whose contact coefficients the
    SimGAN dynamics policy rewrites every control step
    (hopper_env_combined_policy.py:270-287).
  * leg + torso capsule lower endpoints, so falls still collide.
"""

from __future__ import annotations

from simgan_tpu.core.system import FREE, PRISMATIC, REVOLUTE, System, make_system

BASE_INIT_POS = (0.0, 0.0, 1.3)   # loadURDF position (hopper.py:45)
MAX_FORCES = (200.0, 200.0, 200.0)  # nominal torque limits (hopper.py:48)
OBS_SCALING = (1.0,) * 7 + (0.1,) * 4  # hopper.py:51
CTRL_LINKS = (4, 5, 6)  # torso-chain actuated links (thigh, leg, foot)

# joint limits for the actuated joints (URDF lines 126/135/144)
CTRL_LOWER = (-2.61799, -2.61799, -0.785398)
CTRL_UPPER = (0.5, 0.5, 0.785398)

FOOT_GEOMS = (0, 1)  # geom indices forming the foot (pi_dyn contact target)


def make_hopper(heavy_head: bool = False) -> System:
    if heavy_head:
        torso_m, torso_com = 5.66519, (0.0, 0.0, 0.15)
        thigh_m, thigh_com = 5.05789, (0.0, 0.0, -0.125)
    else:
        torso_m, torso_com = 3.66519, (0.0, 0.0, 0.0)
        thigh_m, thigh_com = 4.05789, (0.0, 0.0, -0.225)

    # links: 0 base(link1_1, fixed), 1 link1_2, 2 link1_3, 3 torso, 4 thigh,
    # 5 leg, 6 foot
    return make_system(
        name="hopper_heavyhead" if heavy_head else "hopper",
        parent=[-1, 0, 1, 2, 3, 4, 5],
        joint_type=[FREE, PRISMATIC, PRISMATIC, REVOLUTE, REVOLUTE, REVOLUTE, REVOLUTE],
        joint_pos=[
            [0, 0, 0],          # base
            [0, 0, 0],          # rootx
            [0, 0, 0],          # rootz
            [0, 0, 0],          # rooty
            [0, 0, -0.2],       # thigh_joint (urdf:127)
            [0, 0, -0.45],      # leg_joint (urdf:136)
            [0, 0, -0.5],       # foot_joint (urdf:145)
        ],
        joint_rpy=[[0, 0, 0]] * 7,
        joint_axis=[
            [0, 0, 1],
            [1, 0, 0],          # rootx prismatic x
            [0, 0, 1],          # rootz prismatic z
            [0, 1, 0],          # rooty revolute y
            [0, -1, 0],         # thigh (urdf:128)
            [0, -1, 0],         # leg
            [0, -1, 0],         # foot
        ],
        mass=[0.0, 0.0, 0.0, torso_m, thigh_m, 2.78136, 5.31557],
        com=[
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
            list(torso_com),
            list(thigh_com),
            [0, 0, -0.25],
            [0.065, 0, 0],
        ],
        inertia_diag=[
            [0, 0, 0],
            [0, 0, 0],
            [0, 0, 0],
            [0.07941, 0.07941, 0.00611],
            [0.10567, 0.10567, 0.00676],
            [0.07945, 0.07945, 0.00297],
            [0.01276, 0.12159, 0.12159],
        ],
        joint_damping=[0, 0, 0, 0, 2.0, 2.0, 2.0],     # urdf joint dynamics
        joint_friction=[0, 0, 0, 0, 1e-4, 1e-4, 1e-4],
        joint_lower=[0, -200, -200, -200, -2.61799, -2.61799, -0.785398],
        joint_upper=[0, 200, 200, 200, 0.5, 0.5, 0.785398],
        actuated=list(CTRL_LINKS),
        fixed_base=True,
        # contact spheres: foot capsule endpoints (len .45 r .06 center x=.065,
        # axis x -> x = 0.065 +- 0.225), leg capsule lower end, torso lower end
        geom_link=[6, 6, 5, 3],
        geom_offset=[
            [0.065 - 0.225, 0.0, 0.0],
            [0.065 + 0.225, 0.0, 0.0],
            [0.0, 0.0, -0.5],
            [0.0, 0.0, -0.2],
        ],
        geom_radius=[0.06, 0.06, 0.04, 0.05],
        # self-collision capsule pairs (reference loads with
        # URDF_USE_SELF_COLLISION, hopper.py:86; btMultiBody filters
        # parent-child, leaving torso-leg, torso-foot, thigh-foot).  Capsule
        # segments from the URDF collision shapes (hopper_my.urdf:47-94):
        # torso len .4 r .05 @origin, thigh len .45 r .05 @(0,0,-.225),
        # leg len .5 r .04 @(0,0,-.25), foot len .45 r .06 axis x @(.065,0,0).
        pair_link=[(3, 5), (3, 6), (4, 6)],
        pair_seg=[
            [[[0, 0, 0.2], [0, 0, -0.2]], [[0, 0, 0], [0, 0, -0.5]]],
            [[[0, 0, 0.2], [0, 0, -0.2]], [[-0.16, 0, 0], [0.29, 0, 0]]],
            [[[0, 0, 0], [0, 0, -0.45]], [[-0.16, 0, 0], [0.29, 0, 0]]],
        ],
        pair_radius=[0.05 + 0.04, 0.05 + 0.06, 0.05 + 0.06],
    )
