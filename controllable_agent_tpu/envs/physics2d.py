"""Pure-JAX planar articulated rigid-body physics.

The reference's locomotion domains (walker/cheetah/hopper) run on MuJoCo
via dm_control (url_benchmark/custom_dmc_tasks/*.py + MJCF models). MJX is
unavailable in this environment, and a host-physics loop would defeat the
vectorized TPU design — so this module implements planar articulated
dynamics from scratch, the JAX way:

  * models are kinematic trees of capsule links with hinge joints in the
    x–z plane; the root has a free planar joint (x, z, pitch);
  * dynamics come from the Lagrangian via AUTODIFF: the mass matrix is
    assembled from body Jacobians (jacfwd of forward kinematics), the
    Coriolis/centrifugal bias from a jvp of M(q)·q̇, gravity from the
    gradient of the potential — no hand-derived equations of motion, no
    ported algorithm;
  * ground contact is a regularized spring-damper normal force with a
    Coulomb-capped tangential force at designated capsule endpoints (the
    same soft-contact family MJX defaults to);
  * integration is semi-implicit Euler with substeps.

Everything is a pure function of (model, q, q̇, action): `step` jits,
vmaps over thousands of env instances, and differentiates. Degrees of
freedom are ≤ 9, so each substep is a handful of tiny fused ops — batched
over envs they become MXU-friendly matmuls.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jnp.ndarray

GRAVITY = 9.81


class PlanarModel(struct.PyTreeNode):
    """Static model description (all leaves are constants; hashable via
    pytree_node=False is unnecessary — arrays are traced constants).

    nb bodies; body 0 is the root (free planar joint: q[0]=x, q[1]=z,
    q[2]=pitch). Every body b >= 1 adds one hinge dof q[2+b] at its origin.
    ndof = nb + 2.
    """

    parent: tp.Tuple[int, ...] = struct.field(pytree_node=False)  # parent[0] = -1
    anchor: Array  # [nb, 2] joint position in the parent's frame
    com: Array  # [nb, 2] center of mass in the body frame
    mass: Array  # [nb]
    inertia: Array  # [nb] rotational inertia about the COM (y-axis)
    # contact spheres: world-collision points
    contact_body: tp.Tuple[int, ...] = struct.field(pytree_node=False)
    contact_point: Array  # [nc, 2] in body frame
    contact_radius: Array  # [nc]
    # per-hinge-joint (bodies 1..nb-1) parameters
    gear: Array  # [nj] actuator gear (torque = gear * ctrl)
    damping: Array  # [nj]
    limit_lo: Array  # [nj] radians
    limit_hi: Array  # [nj]
    armature: Array  # [nj]
    # per-joint spring toward the zero pose (MJCF joint stiffness; e.g. the
    # cheetah's legs are spring-loaded toward their bent stance,
    # reference custom_dmc_tasks/cheetah.xml:36-55)
    stiffness: tp.Optional[Array] = None  # [nj]
    # contact material
    contact_stiffness: float = struct.field(pytree_node=False, default=3.0e4)
    contact_damping: float = struct.field(pytree_node=False, default=300.0)
    friction: float = struct.field(pytree_node=False, default=1.0)
    # solver
    limit_stiffness: float = struct.field(pytree_node=False, default=300.0)
    limit_damping: float = struct.field(pytree_node=False, default=10.0)

    @property
    def nb(self) -> int:
        return len(self.parent)

    @property
    def ndof(self) -> int:
        return self.nb + 2


def _rot(theta: Array) -> Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def fk(model: PlanarModel, q: Array) -> tp.Tuple[Array, Array]:
    """Forward kinematics: body origins [nb,2] and angles [nb].

    The python loop unrolls over a static, small body count."""
    nb = model.nb
    origins = [q[0:2]]
    angles = [q[2]]
    for b in range(1, nb):
        p = model.parent[b]
        ang_p = angles[p]
        origin = origins[p] + _rot(ang_p) @ model.anchor[b]
        origins.append(origin)
        angles.append(ang_p + q[3 + b - 1])
    return jnp.stack(origins), jnp.stack(angles)


def com_world(model: PlanarModel, q: Array) -> tp.Tuple[Array, Array]:
    origins, angles = fk(model, q)
    rots = jax.vmap(_rot)(angles)  # [nb,2,2]
    coms = origins + jnp.einsum("bij,bj->bi", rots, model.com)
    return coms, angles


def contact_world(model: PlanarModel, q: Array) -> Array:
    origins, angles = fk(model, q)
    rots = jax.vmap(_rot)(angles)
    idx = np.asarray(model.contact_body)
    pts = origins[idx] + jnp.einsum(
        "cij,cj->ci", rots[idx], model.contact_point)
    return pts


def mass_matrix(model: PlanarModel, q: Array) -> Array:
    """M(q) = Σ_b m_b J_cᵀJ_c + I_b J_ωᵀJ_ω, Jacobians by autodiff."""
    jac_c, jac_w = jax.jacfwd(lambda qq: com_world(model, qq))(q)
    # jac_c: [nb, 2, ndof]; jac_w: [nb, ndof]
    m = jnp.einsum("b,bid,bie->de", model.mass, jac_c, jac_c)
    m = m + jnp.einsum("b,bd,be->de", model.inertia, jac_w, jac_w)
    # armature on hinge dofs
    arm = jnp.concatenate([jnp.zeros(3), model.armature])
    return m + jnp.diag(arm)


def bias_forces(model: PlanarModel, q: Array, qd: Array) -> Array:
    """Coriolis/centrifugal h(q, q̇) = Ṁ q̇ − ½ ∂_q (q̇ᵀ M q̇)."""
    mdot_qd = jax.jvp(lambda qq: mass_matrix(model, qq) @ qd, (q,), (qd,))[1]
    kin_grad = jax.grad(lambda qq: 0.5 * qd @ mass_matrix(model, qq) @ qd)(q)
    return mdot_qd - kin_grad


def gravity_forces(model: PlanarModel, q: Array) -> Array:
    """−∂V/∂q with V = g Σ m_b z_com."""
    def potential(qq: Array) -> Array:
        coms, _ = com_world(model, qq)
        return GRAVITY * jnp.sum(model.mass * coms[:, 1])
    return -jax.grad(potential)(q)


def contact_forces(model: PlanarModel, q: Array, qd: Array
                   ) -> tp.Tuple[Array, Array]:
    """Generalized ground-contact force and per-contact normal forces.

    Regularized soft contact: fn = (kn·φ − dn·v_z)⁺ gated on penetration
    φ = r − z > 0; tangential ft = −μ fn sat(v_x / v_slip)."""
    def pts_fn(qq: Array) -> Array:
        return contact_world(model, qq)
    pts = pts_fn(q)  # [nc, 2]
    jac = jax.jacfwd(pts_fn)(q)  # [nc, 2, ndof]
    vel = jnp.einsum("cid,d->ci", jac, qd)  # [nc, 2]
    phi = model.contact_radius - pts[:, 1]
    pen = phi > 0
    fn = jnp.where(
        pen,
        jnp.maximum(model.contact_stiffness * phi
                    - model.contact_damping * vel[:, 1], 0.0),
        0.0)
    v_slip = 0.1
    ft = -model.friction * fn * jnp.clip(vel[:, 0] / v_slip, -1.0, 1.0)
    forces = jnp.stack([ft, fn], axis=1)  # [nc, 2]
    qf = jnp.einsum("cid,ci->d", jac, forces)
    return qf, fn


def joint_forces(model: PlanarModel, q: Array, qd: Array,
                 action: Array) -> Array:
    """Actuation + joint damping + soft joint limits on the hinge dofs."""
    qj = q[3:]
    qdj = qd[3:]
    tau = model.gear * action - model.damping * qdj
    if model.stiffness is not None:
        tau = tau - model.stiffness * qj
    below = qj < model.limit_lo
    above = qj > model.limit_hi
    tau = tau + jnp.where(
        below, model.limit_stiffness * (model.limit_lo - qj)
        - model.limit_damping * qdj, 0.0)
    tau = tau + jnp.where(
        above, model.limit_stiffness * (model.limit_hi - qj)
        - model.limit_damping * qdj, 0.0)
    return jnp.concatenate([jnp.zeros(3), tau])


def forward_dynamics(model: PlanarModel, q: Array, qd: Array,
                     action: Array) -> tp.Tuple[Array, Array]:
    """q̈ = M⁻¹ (τ + J_cᵀ f_contact − h − ∂V/∂q); also returns contact
    normal forces (for touch sensing)."""
    m = mass_matrix(model, q)
    qf_contact, fn = contact_forces(model, q, qd)
    rhs = (joint_forces(model, q, qd, action) + qf_contact
           + gravity_forces(model, q) - bias_forces(model, q, qd))
    qdd = jnp.linalg.solve(m + 1e-9 * jnp.eye(model.ndof), rhs)
    return qdd, fn


def step(model: PlanarModel, q: Array, qd: Array, action: Array,
         dt: float, n_substeps: int) -> tp.Tuple[Array, Array, Array]:
    """Semi-implicit Euler with substeps. Returns (q, qd, touch) where
    touch is the max per-contact normal force over the substeps."""
    h = dt / n_substeps

    def substep(carry: tp.Tuple[Array, Array, Array], _: None):
        q, qd, touch = carry
        qdd, fn = forward_dynamics(model, q, qd, action)
        qd = qd + h * qdd
        # clamp runaway velocities (keeps the explicit integrator sane
        # under deep penetration, analogous to MuJoCo's solver clamping)
        qd = jnp.clip(qd, -100.0, 100.0)
        q = q + h * qd
        return (q, qd, jnp.maximum(touch, fn)), None

    touch0 = jnp.zeros_like(model.contact_radius)
    (q, qd, touch), _ = jax.lax.scan(substep, (q, qd, touch0), None,
                                     length=n_substeps)
    return q, qd, touch


# ---------------------------------------------------------------- helpers

def capsule_mass(radius: float, length: float, density: float = 1000.0
                 ) -> float:
    """Mass of a capsule (cylinder + sphere caps)."""
    cyl = np.pi * radius ** 2 * length
    caps = 4.0 / 3.0 * np.pi * radius ** 3
    return float(density * (cyl + caps))


def rod_inertia(mass: float, length: float, radius: float) -> float:
    """Inertia of a capsule about its COM, perpendicular axis (cylinder
    approximation)."""
    return float(mass * (length ** 2 / 12.0 + radius ** 2 / 4.0))


def capsule_inertia(radius: float, length: float, density: float = 1000.0
                    ) -> float:
    """Exact capsule inertia about its COM, perpendicular axis: cylinder
    + two hemispherical caps with parallel-axis terms. Matches MuJoCo's
    capsule inertia (e.g. the dm_control walker torso: r=.07, L=.6 →
    0.443, equal to the model's body_inertia)."""
    r, L = radius, length
    m_cyl = density * np.pi * r ** 2 * L
    m_hemi = density * (2.0 / 3.0) * np.pi * r ** 3  # each cap
    i_cyl = m_cyl * (L ** 2 / 12.0 + r ** 2 / 4.0)
    # hemisphere about its own COM (83/320 m r²), COM at 3r/8 above the
    # flat face which sits at ±L/2
    i_hemi_com = (83.0 / 320.0) * m_hemi * r ** 2
    d = L / 2.0 + 3.0 * r / 8.0
    return float(i_cyl + 2.0 * (i_hemi_com + m_hemi * d ** 2))


def subtree_momentum(model: PlanarModel, q: Array, qd: Array
                     ) -> tp.Tuple[Array, Array, Array]:
    """(linear COM velocity [2], angular momentum about the total COM,
    total COM position [2]) — the planar analogues of MuJoCo's
    subtree_linvel / subtree_angmom used by the reference's goal spaces
    (url_benchmark/goals.py:85-94)."""
    coms, angles = com_world(model, q)
    jac_c, jac_w = jax.jacfwd(lambda qq: com_world(model, qq))(q)
    v = jnp.einsum("bid,d->bi", jac_c, qd)  # per-body COM velocity
    w = jac_w @ qd  # per-body angular velocity
    total_mass = jnp.sum(model.mass)
    com = jnp.sum(model.mass[:, None] * coms, axis=0) / total_mass
    v_com = jnp.sum(model.mass[:, None] * v, axis=0) / total_mass
    rel = coms - com
    relv = v - v_com
    # angular momentum about MuJoCo's y-axis (x forward, z up, y left):
    # (r × v)_y = z_rel·vx − x_rel·vz; our planar angle θ is
    # counterclockwise in the x-z plane, i.e. ω_y = −θ̇, hence the −I·w
    # spin term (keeps sign parity with the reference's subtree_angmom,
    # url_benchmark/goals.py:91).
    l_y = jnp.sum(-model.inertia * w
                  + model.mass * (rel[:, 1] * relv[:, 0]
                                  - rel[:, 0] * relv[:, 1]))
    return v_com, l_y, com
