"""Laikago quadruped model.

Compiled from the reference URDF
``my_pybullet_envs/assets/laikago/laikago_toes_limits.urdf`` (and the
``_dragging`` heavy-leg variant): floating base + 4 legs x (hip-roll,
hip-pitch, knee) = 12 actuated revolute joints, toes as fixed joints
(reference: my_pybullet_envs/laikago.py:15-32).

Design notes (TPU rebuild):
  * The four fixed toe joints are rigidly merged into the lower-leg links
    (mass/COM/inertia folded in via parallel axis); the toe geometry remains
    as the primary contact sphere (r=0.03 at lower-leg offset
    [0,-0.25,-0.022], urdf jtoe* joints).  This is dynamically exact and
    shortens the kinematic chain.
  * The reference URDF leaves link inertias zero, which makes Bullet derive
    them from the collision shape AABB; we bake box inertias from the
    measured collision-mesh AABB half-extents (chassis_vhacd_mod.obj,
    hip_motor*.stl, upper_leg_*_vhacd.obj, lower_leg_3.stl), computed about
    the link COM with a parallel-axis shift from the AABB center.
  * Base orientation convention follows the env: the URDF chassis frame is
    used with init euler (1.5708, 0, 1.5708) so URDF z -> world x (forward),
    URDF y -> world z (up) (laikago.py:59-60).

Leg order everywhere: FR, FL, RR, RL (laikago.py:16-32).
"""

from __future__ import annotations

import numpy as np

from simgan_tpu.core.system import FREE, REVOLUTE, System, make_system

BASE_INIT_POS = (0.0, 0.0, 0.56)          # laikago.py:59 (COM position)
BASE_INIT_EULER = (1.5708, 0.0, 1.5708)   # laikago.py:60
INIT_Q = (0.0, 0.0, -0.5) * 4             # laikago.py:70
MAX_FORCES = (30.0,) * 12                 # laikago.py:64
# obs scaling: first 37 unscaled, ang-vel x0.2, dq x0.04 (laikago.py:68)
OBS_SCALE_ANGVEL = 0.2
OBS_SCALE_DQ = 0.04
JOINT_DAMPING = 0.5                       # changeDynamics jointDamping (laikago.py:111)

CTRL_LOWER = (-0.873, -1.3, -2.164) * 4
CTRL_UPPER = (1.0472, 3.4, 0.0) * 4

TOE_GEOMS = (0, 1, 2, 3)                  # geom indices of the 4 toes (FR,FL,RR,RL)

# collision AABB half extents (link frame) measured from the reference meshes
_CHASSIS_HE = np.array([0.1936, 0.0942, 0.2883])   # after Rx(-90) collision origin
_CHASSIS_CENTER = np.array([0.0001, 0.0139, 0.0312])
_HIP_HE = np.array([0.0412, 0.0422, 0.049])
_UPPER_HE = np.array([0.0449, 0.1313, 0.1063])
_UPPER_CENTER = np.array([-0.0063, -0.0856, -0.0588])
_LOWER_HE = np.array([0.0145, 0.1582, 0.0317])     # after Ry(90) collision origin
_LOWER_CENTER = np.array([0.0173, -0.1178, 0.0])

_TOE_OFFSET = np.array([0.0, -0.25, -0.022])       # urdf jtoe* origin
_TOE_MASS = 0.1
_TOE_INERTIA = 2.5e-5


def _box_inertia(m: float, he: np.ndarray) -> np.ndarray:
    hx, hy, hz = he
    return m / 3.0 * np.diag([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy])


def _shift(inertia: np.ndarray, m: float, r: np.ndarray) -> np.ndarray:
    """Parallel axis: inertia about a point offset by r from the COM."""
    return inertia + m * (np.dot(r, r) * np.eye(3) - np.outer(r, r))


def _merged_lower_leg(lower_m: float, lower_com: np.ndarray):
    """Fold the fixed toe into the lower leg; returns (m, com, inertia)."""
    m = lower_m + _TOE_MASS
    com = (lower_m * lower_com + _TOE_MASS * _TOE_OFFSET) / m
    # lower-leg box inertia (box taken as centered on the lower-leg COM),
    # shifted from lower_com to the merged COM
    i_lower = _shift(_box_inertia(lower_m, _LOWER_HE), lower_m, lower_com - com)
    i_toe = np.eye(3) * _TOE_INERTIA
    i_toe = _shift(i_toe, _TOE_MASS, _TOE_OFFSET - com)
    return m, com, i_lower + i_toe


def make_laikago(heavy_leg: bool = False) -> System:
    # per-leg joint origins in parent frames (urdf joints)
    hip_org = {
        "FR": [-0.0817145, 0, 0.242889],
        "FL": [0.0817145, 0, 0.242889],
        "RR": [-0.0817145, 0, -0.194401],
        "RL": [0.0817145, 0, -0.194401],
    }
    hip_axis = {"FR": [0, 0, -1], "FL": [0, 0, 1], "RR": [0, 0, -1], "RL": [0, 0, 1]}
    upper_org = {"FR": [-0.053565, 0, 0], "FL": [0.055855, 0, 0],
                 "RR": [-0.053565, 0, 0], "RL": [0.055855, 0, 0]}
    lower_org = {"FR": [0.02069, -0.20833, -0.1422], "FL": [-0.02069, -0.20833, -0.1422],
                 "RR": [0.02069, -0.20833, -0.1422], "RL": [-0.02069, -0.20833, -0.1422]}

    parent = [-1]
    joint_type = [FREE]
    joint_pos = [[0, 0, 0]]
    joint_axis = [[0, 0, 1]]
    mass = [13.715]
    com = [[0, 0.03, 0.043794]]
    inertia = [_shift(_box_inertia(13.715, _CHASSIS_HE), 13.715,
                      _CHASSIS_CENTER - np.array([0, 0.03, 0.043794]))]
    damping = [0.0]
    lower = [0.0]
    upper = [0.0]
    actuated = []

    geom_link, geom_offset, geom_radius = [], [], []
    lower_leg_links = []

    for li, leg in enumerate(["FR", "FL", "RR", "RL"]):
        # heavy-leg (dragging) variant: FL upper/lower legs +1kg / +2kg with
        # shifted COMs (laikago_toes_limits_dragging.urdf)
        if heavy_leg and leg == "FL":
            um, ucom = 2.527, np.array([0.0, -0.14, -0.04])
            lm, lcom = 2.241, np.array([0.0, -0.26, -0.02])
        else:
            um, ucom = 1.527, np.array([0.0, -0.04, -0.04])
            lm, lcom = 0.241, np.array([0.0, -0.16, -0.02])

        base_idx = len(parent)
        # hip motor
        parent.append(0)
        joint_type.append(REVOLUTE)
        joint_pos.append(hip_org[leg])
        joint_axis.append(hip_axis[leg])
        hip_com = [0.02 if leg in ("FR", "RR") else -0.02, 0, 0]
        mass.append(1.095)
        com.append(hip_com)
        inertia.append(_box_inertia(1.095, _HIP_HE))
        damping.append(JOINT_DAMPING)
        lower.append(-0.873)
        upper.append(1.0472)
        # upper leg
        parent.append(base_idx)
        joint_type.append(REVOLUTE)
        joint_pos.append(upper_org[leg])
        joint_axis.append([1, 0, 0])
        mass.append(um)
        com.append(list(ucom))
        inertia.append(_shift(_box_inertia(um, _UPPER_HE), um, _UPPER_CENTER - ucom))
        damping.append(JOINT_DAMPING)
        lower.append(-1.3)
        upper.append(3.4)
        # lower leg (+ merged toe)
        parent.append(base_idx + 1)
        joint_type.append(REVOLUTE)
        joint_pos.append(lower_org[leg])
        joint_axis.append([1, 0, 0])
        lm_m, lcom_m, li_m = _merged_lower_leg(lm, lcom)
        mass.append(lm_m)
        com.append(list(lcom_m))
        inertia.append(li_m)
        damping.append(JOINT_DAMPING)
        lower.append(-2.164)
        upper.append(0.0)

        actuated += [base_idx, base_idx + 1, base_idx + 2]
        lower_leg_links.append(base_idx + 2)

    # contact geoms: toes first (order FR, FL, RR, RL) so TOE_GEOMS matches
    for ll in lower_leg_links:
        geom_link.append(ll)
        geom_offset.append(list(_TOE_OFFSET))
        geom_radius.append(0.03)
    # knees (upper end of lower legs)
    for ll in lower_leg_links:
        geom_link.append(ll)
        geom_offset.append([0.017, 0.0, 0.0])
        geom_radius.append(0.03)
    # chassis front/back
    geom_link += [0, 0]
    geom_offset += [[0.0, 0.014, 0.23], [0.0, 0.014, -0.17]]
    geom_radius += [0.09, 0.09]

    # --- self-collision capsule pairs -------------------------------------
    # The reference loads with URDF_USE_SELF_COLLISION (laikago.py:104);
    # btMultiBody filters parent-child.  Trajectory-distribution analysis
    # (scripts/laika_selfcol_sweep.py + expert-data clearance sweep) shows the
    # engaged pairs during gait/falls are leg-leg: left-right upper-upper and
    # lower-lower (legs crossing via hip roll), and same-side fore-aft
    # lower-lower (front leg swinging back into the rear leg).  Chassis-leg
    # pairs are omitted: the vhacd chassis mesh's capsule approximation
    # overlaps the hip region at the *nominal* pose (false positives in 100%
    # of frames), so a capsule cannot represent that clearance.
    # Capsules (link frames): upper leg hip->knee r=0.05 (upper_leg AABB),
    # lower leg knee->toe r=0.03 (lower_leg_3.stl AABB / toe sphere).
    up, lo_ = {}, {}
    for li, leg in enumerate(["FR", "FL", "RR", "RL"]):
        up[leg] = 1 + 3 * li + 1     # upper-leg link index
        lo_[leg] = 1 + 3 * li + 2    # lower-leg link index
    upper_seg = {leg: [[0.0, 0.0, 0.0], lower_org[leg]] for leg in upper_org}
    lower_seg = [[0.017, 0.05, 0.0], list(_TOE_OFFSET)]
    pair_link, pair_seg, pair_radius = [], [], []
    for a, b in [("FR", "FL"), ("RR", "RL")]:          # left-right crossing
        pair_link.append((up[a], up[b]))
        pair_seg.append([upper_seg[a], upper_seg[b]])
        pair_radius.append(0.05 + 0.05)
        pair_link.append((lo_[a], lo_[b]))
        pair_seg.append([lower_seg, lower_seg])
        pair_radius.append(0.03 + 0.03)
    for a, b in [("FR", "RR"), ("FL", "RL")]:          # same-side fore-aft
        pair_link.append((lo_[a], lo_[b]))
        pair_seg.append([lower_seg, lower_seg])
        pair_radius.append(0.03 + 0.03)

    return make_system(
        name="laikago_heavy" if heavy_leg else "laikago",
        parent=parent,
        joint_type=joint_type,
        joint_pos=joint_pos,
        joint_rpy=[[0, 0, 0]] * len(parent),
        joint_axis=joint_axis,
        mass=mass,
        com=com,
        inertia=np.stack(inertia),
        joint_damping=damping,
        joint_lower=lower,
        joint_upper=upper,
        actuated=actuated,
        fixed_base=False,
        geom_link=geom_link,
        geom_offset=geom_offset,
        geom_radius=geom_radius,
        pair_link=pair_link,
        pair_seg=pair_seg,
        pair_radius=pair_radius,
    )
