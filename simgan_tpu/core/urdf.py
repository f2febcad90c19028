"""Generic URDF → System compiler.

Replaces Bullet's runtime URDF importer (``loadURDF``; SURVEY §2.4) with an
offline compile step producing a :class:`System` pytree.  The shipped robot
models (models/hopper.py, models/laikago.py) are hand-compiled registry
entries of the same form; this module lets users bring their own URDF.

Supported:
  * revolute / continuous / prismatic / fixed joints (fixed joints are
    rigidly merged into the parent, folding mass/COM/inertia via the
    parallel-axis theorem — dynamically exact);
  * inertia from the URDF, or, when the URDF leaves it zero with nonzero
    mass, a box inertia from the collision primitive's AABB (mirroring
    Bullet's calculateLocalInertia fallback);
  * collision primitives sphere / capsule / cylinder / box compiled into
    contact-sphere sets (capsule -> endpoint spheres, box -> corner spheres),
    matching how the built-in models approximate Bullet narrowphase.

Meshes are not loaded (no mesh IO in the image); a mesh collision element
may carry ``<simgan_aabb half_extents="x y z"/>`` or is skipped.
"""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET

import numpy as np

from simgan_tpu.core.system import FREE, PRISMATIC, REVOLUTE, System, make_system


def _vec(s: str | None, default="0 0 0") -> np.ndarray:
    return np.array([float(x) for x in (s or default).split()], dtype=np.float64)


def _rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    r, p, y = rpy

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    return rz(y) @ ry(p) @ rx(r)


def _mat_to_rpy(R: np.ndarray) -> np.ndarray:
    sy = -R[2, 0]
    p = np.arcsin(np.clip(sy, -1, 1))
    r = np.arctan2(R[2, 1], R[2, 2])
    y = np.arctan2(R[1, 0], R[0, 0])
    return np.array([r, p, y])


def _box_inertia(m, he):
    hx, hy, hz = he
    return m / 3.0 * np.diag([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy])


def _shift(I, m, r):
    return I + m * (np.dot(r, r) * np.eye(3) - np.outer(r, r))


@dataclasses.dataclass
class _Link:
    name: str
    mass: float = 0.0
    com: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    inertia: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((3, 3)))
    geoms: list = dataclasses.field(default_factory=list)  # (offset, radius)


def _collision_aabb(geom_el, origin_rpy) -> np.ndarray | None:
    """Half-extents of the collision primitive's AABB in link frame."""
    R = np.abs(_rpy_matrix(origin_rpy))
    for child in geom_el:
        if child.tag == "box":
            he = _vec(child.get("size")) / 2
            return R @ he
        if child.tag == "sphere":
            r = float(child.get("radius"))
            return np.array([r, r, r])
        if child.tag in ("capsule", "cylinder"):
            r = float(child.get("radius"))
            l = float(child.get("length")) / 2
            he = np.array([r, r, l + (r if child.tag == "capsule" else 0.0)])
            return R @ he
        if child.tag == "mesh":
            aabb = child.get("simgan_aabb") or geom_el.get("simgan_aabb")
            if aabb:
                return _vec(aabb)
    return None


def _collision_spheres(geom_el, origin_xyz, origin_rpy) -> list:
    """Contact-sphere approximation of a collision primitive."""
    R = _rpy_matrix(origin_rpy)
    out = []
    for child in geom_el:
        if child.tag == "sphere":
            out.append((origin_xyz, float(child.get("radius"))))
        elif child.tag == "capsule":
            r = float(child.get("radius"))
            h = float(child.get("length")) / 2
            for s in (-1.0, 1.0):
                out.append((origin_xyz + R @ np.array([0, 0, s * h]), r))
        elif child.tag == "cylinder":
            r = float(child.get("radius"))
            h = float(child.get("length")) / 2
            for s in (-1.0, 1.0):
                out.append((origin_xyz + R @ np.array([0, 0, s * h]), r))
        elif child.tag == "box":
            he = _vec(child.get("size")) / 2
            r = float(min(he))
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz in (-1, 1):
                        c = np.array([sx, sy, sz]) * (he - r)
                        out.append((origin_xyz + R @ c, r))
    return out


def parse_urdf(source: str, *, name: str | None = None, fixed_base: bool = False,
               actuated_joints: list[str] | None = None) -> System:
    """Compile URDF XML (string or path) into a System."""
    if source.lstrip().startswith("<"):
        root = ET.fromstring(source)
    else:
        root = ET.parse(source).getroot()

    links: dict[str, _Link] = {}
    for le in root.findall("link"):
        L = _Link(name=le.get("name"))
        inert = le.find("inertial")
        aabb = None
        for col in le.findall("collision"):
            o = col.find("origin")
            oxyz = _vec(o.get("xyz") if o is not None else None)
            orpy = _vec(o.get("rpy") if o is not None else None)
            g = col.find("geometry")
            if g is None:
                continue
            L.geoms.extend(_collision_spheres(g, oxyz, orpy))
            if aabb is None:
                aabb = _collision_aabb(g, orpy)
        if inert is not None:
            L.mass = float(inert.find("mass").get("value"))
            o = inert.find("origin")
            L.com = _vec(o.get("xyz") if o is not None else None)
            i = inert.find("inertia")
            ixx, iyy, izz = float(i.get("ixx")), float(i.get("iyy")), float(i.get("izz"))
            ixy, ixz, iyz = float(i.get("ixy")), float(i.get("ixz")), float(i.get("iyz"))
            L.inertia = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
            if L.mass > 0 and np.allclose(L.inertia, 0) and aabb is not None:
                # Bullet's fallback: box inertia from the collision AABB
                L.inertia = _box_inertia(L.mass, aabb)
        links[L.name] = L

    joints = []
    children = set()
    for je in root.findall("joint"):
        jt = je.get("type")
        o = je.find("origin")
        a = je.find("axis")
        lim = je.find("limit")
        dyn = je.find("dynamics")
        joints.append(dict(
            name=je.get("name"), type=jt,
            parent=je.find("parent").get("link"),
            child=je.find("child").get("link"),
            xyz=_vec(o.get("xyz") if o is not None else None),
            rpy=_vec(o.get("rpy") if o is not None else None),
            axis=_vec(a.get("xyz") if a is not None else "1 0 0"),
            lower=float(lim.get("lower", "-1e9")) if lim is not None else -1e9,
            upper=float(lim.get("upper", "1e9")) if lim is not None else 1e9,
            damping=float(dyn.get("damping", "0")) if dyn is not None else 0.0,
            friction=float(dyn.get("friction", "0")) if dyn is not None else 0.0,
        ))
        children.add(je.find("child").get("link"))

    roots = [n for n in links if n not in children]
    assert len(roots) == 1, f"expected a single root link, got {roots}"
    root_name = roots[0]

    # --- merge fixed joints bottom-up ---
    def merge_fixed():
        for j in list(joints):
            if j["type"] != "fixed":
                continue
            # only merge if the child has no moving children
            if any(k["parent"] == j["child"] for k in joints):
                continue
            p, c = links[j["parent"]], links[j["child"]]
            R = _rpy_matrix(j["rpy"])
            com_c = j["xyz"] + R @ c.com
            m = p.mass + c.mass
            com = (p.mass * p.com + c.mass * com_c) / max(m, 1e-12)
            I_c = R @ c.inertia @ R.T
            I = _shift(p.inertia, p.mass, p.com - com) + _shift(I_c, c.mass, com_c - com)
            p.mass, p.com, p.inertia = m, com, I
            for off, r in c.geoms:
                p.geoms.append((j["xyz"] + R @ off, r))
            del links[j["child"]]
            joints.remove(j)
            return True
        return False

    while merge_fixed():
        pass

    # --- topological order from root ---
    order = [root_name]
    by_parent: dict[str, list] = {}
    for j in joints:
        by_parent.setdefault(j["parent"], []).append(j)
    idx = 0
    link_joint = {root_name: None}
    while idx < len(order):
        for j in by_parent.get(order[idx], []):
            order.append(j["child"])
            link_joint[j["child"]] = j
        idx += 1
    assert len(order) == len(links), "disconnected links in URDF"

    index = {n: i for i, n in enumerate(order)}
    TYPE = {"revolute": REVOLUTE, "continuous": REVOLUTE, "prismatic": PRISMATIC}

    parent, joint_type, joint_pos, joint_rpy, joint_axis = [], [], [], [], []
    mass, com, inertia, damping, friction, lower, upper = [], [], [], [], [], [], []
    actuated = []
    geom_link, geom_offset, geom_radius = [], [], []

    for i, n in enumerate(order):
        L = links[n]
        j = link_joint[n]
        if j is None:
            parent.append(-1)
            joint_type.append(FREE)
            joint_pos.append([0, 0, 0])
            joint_rpy.append([0, 0, 0])
            joint_axis.append([0, 0, 1])
            damping.append(0.0)
            friction.append(0.0)
            lower.append(0.0)
            upper.append(0.0)
        else:
            parent.append(index[j["parent"]])
            joint_type.append(TYPE[j["type"]])
            joint_pos.append(list(j["xyz"]))
            joint_rpy.append(list(j["rpy"]))
            joint_axis.append(list(j["axis"]))
            damping.append(j["damping"])
            friction.append(j["friction"])
            lower.append(j["lower"])
            upper.append(j["upper"])
            if actuated_joints is None or j["name"] in actuated_joints:
                actuated.append(i)
        mass.append(L.mass)
        com.append(list(L.com))
        inertia.append(L.inertia)
        for off, r in L.geoms:
            geom_link.append(i)
            geom_offset.append(list(off))
            geom_radius.append(r)

    return make_system(
        name=name or root.get("name") or "urdf_robot",
        parent=parent, joint_type=joint_type,
        joint_pos=joint_pos, joint_rpy=joint_rpy, joint_axis=joint_axis,
        mass=mass, com=com, inertia=np.stack(inertia),
        joint_damping=damping, joint_friction=friction,
        joint_lower=lower, joint_upper=upper,
        actuated=actuated, fixed_base=fixed_base,
        geom_link=geom_link, geom_offset=geom_offset, geom_radius=geom_radius,
    )
