"""Pure-JAX 3-D articulated rigid-body physics.

Extends the planar engine (physics2d.py) to 3-D for the quadruped domain:
same Lagrangian-via-autodiff architecture — mass matrix from body
Jacobians, Coriolis bias from a jvp of M(q)·q̇, gravity from the potential
gradient, soft sphere-ground contacts, semi-implicit Euler — with a 3-D
kinematic tree:

  * the root is a free joint parameterized as [x, y, z, roll, pitch, yaw]
    (XYZ extrinsic Euler). Euler angles keep the plain Lagrangian
    formulation (q̇ are true generalized velocities; quaternions would
    need constrained dynamics). The gimbal singularity at pitch = ±90° is
    documented: mostly-upright quadruped tasks (stand/walk/run/jump) stay
    far from it; full-tumble tasks (roll) degrade near the pole.
  * every other body adds one hinge dof about a fixed axis in its parent
    frame.

Angular velocity enters the kinetic energy via ω = unskew(Ṙ Rᵀ), computed
with a jvp of the rotation field — no hand-derived rate matrices. The
angular Jacobian J_ω(q) = ∂ω/∂q̇ comes from one jacfwd (ω is linear in q̇).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jnp.ndarray

GRAVITY = 9.81


class Heightfield(struct.PyTreeNode):
    """Square terrain heightfield centred on the origin.

    ``data[iy, ix]`` is the world-space height at
    x = (ix/(res-1)*2-1)*half_size, y likewise. Heights are bilinearly
    interpolated; queries outside the grid clamp to the border row/col
    (terrain generators should taper to 0 at the rim so the clamped
    border blends into the flat floor, as the reference's bowl terrain
    does — url_benchmark/custom_dmc_tasks/quadruped.py:545-553).
    """

    data: Array  # [res, res]
    half_size: float = struct.field(pytree_node=False)

    @property
    def res(self) -> int:
        return self.data.shape[-1]


def hf_height(hf: Heightfield, xy: Array) -> Array:
    """Bilinear terrain height at world (x, y)."""
    res = hf.res
    uv = (xy / hf.half_size + 1.0) * 0.5 * (res - 1)
    uv = jnp.clip(uv, 0.0, res - 1.0)
    u, v = uv[0], uv[1]  # u along x (cols), v along y (rows)
    u0 = jnp.clip(jnp.floor(u), 0, res - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, res - 2).astype(jnp.int32)
    fu, fv = u - u0, v - v0
    h00 = hf.data[v0, u0]
    h01 = hf.data[v0, u0 + 1]
    h10 = hf.data[v0 + 1, u0]
    h11 = hf.data[v0 + 1, u0 + 1]
    return ((1 - fv) * ((1 - fu) * h00 + fu * h01)
            + fv * ((1 - fu) * h10 + fu * h11))


def hf_normal(hf: Heightfield, xy: Array) -> Array:
    """Unit surface normal at world (x, y) from the height gradient."""
    g = jax.grad(lambda p: hf_height(hf, p))(xy)
    n = jnp.concatenate([-g, jnp.ones((1,))])
    return n / jnp.linalg.norm(n)


class Model3D(struct.PyTreeNode):
    """nb bodies; body 0 = root (6 dof), body b>=1 adds hinge dof 6+b-1.
    ndof = nb + 5. ``fixed_base=True`` pins the root: its 6 dof are held
    at their reset values (exact constraint — the joint block of M is
    solved alone), giving fixed-base manipulators (jaco) on the same
    engine."""

    parent: tp.Tuple[int, ...] = struct.field(pytree_node=False)
    anchor: Array  # [nb, 3] joint position in parent frame
    axis: Array  # [nb, 3] hinge axis in parent frame (unused for root)
    com: Array  # [nb, 3] center of mass in body frame
    mass: Array  # [nb]
    inertia: Array  # [nb, 3] body-frame diagonal inertia
    contact_body: tp.Tuple[int, ...] = struct.field(pytree_node=False)
    contact_point: Array  # [nc, 3] in body frame
    contact_radius: Array  # [nc]
    gear: Array  # [nj]
    damping: Array  # [nj]
    limit_lo: Array  # [nj]
    limit_hi: Array  # [nj]
    armature: Array  # [nj]
    contact_stiffness: float = struct.field(pytree_node=False, default=3.0e4)
    contact_damping: float = struct.field(pytree_node=False, default=300.0)
    friction: float = struct.field(pytree_node=False, default=1.0)
    limit_stiffness: float = struct.field(pytree_node=False, default=300.0)
    limit_damping: float = struct.field(pytree_node=False, default=10.0)
    fixed_base: bool = struct.field(pytree_node=False, default=False)
    # position-servo actuation (the reference quadruped's MJCF actuators:
    # gainprm=1000 biasprm="0 -1000" biastype=affine — torque =
    # gain*(target − q), custom_dmc_tasks/quadruped.xml:57-66). When
    # servo_gain is set, action in [-1,1] maps to the target angle
    # servo_center + action*servo_half and `gear` is unused.
    servo_gain: tp.Optional[Array] = None  # [nj]
    servo_center: tp.Optional[Array] = None  # [nj]
    servo_half: tp.Optional[Array] = None  # [nj]

    @property
    def nb(self) -> int:
        return len(self.parent)

    @property
    def ndof(self) -> int:
        return self.nb + 5


def _euler_rot(rpy: Array) -> Array:
    """R = Rz(yaw) Ry(pitch) Rx(roll)."""
    cr, sr = jnp.cos(rpy[0]), jnp.sin(rpy[0])
    cp, sp = jnp.cos(rpy[1]), jnp.sin(rpy[1])
    cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
    rx = jnp.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _axis_rot(axis: Array, angle: Array) -> Array:
    """Rodrigues rotation about a (unit) axis."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    k = axis
    kx = jnp.array([[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]],
                    [-k[1], k[0], 0.0]])
    return jnp.eye(3) * c + s * kx + (1 - c) * jnp.outer(k, k)


def fk(model: Model3D, q: Array) -> tp.Tuple[Array, Array]:
    """Body origins [nb,3] and rotations [nb,3,3] (static-unrolled tree)."""
    origins = [q[0:3]]
    rots = [_euler_rot(q[3:6])]
    for b in range(1, model.nb):
        p = model.parent[b]
        r_p = rots[p]
        origin = origins[p] + r_p @ model.anchor[b]
        rots.append(r_p @ _axis_rot(model.axis[b], q[6 + b - 1]))
        origins.append(origin)
    return jnp.stack(origins), jnp.stack(rots)


def com_world(model: Model3D, q: Array) -> Array:
    origins, rots = fk(model, q)
    return origins + jnp.einsum("bij,bj->bi", rots, model.com)


def _unskew(w: Array) -> Array:
    return jnp.stack([w[2, 1], w[0, 2], w[1, 0]])


def body_omegas(model: Model3D, q: Array, qd: Array) -> Array:
    """World angular velocities [nb,3]: ω = unskew(Ṙ Rᵀ) via jvp."""
    rots, rdots = jax.jvp(lambda qq: fk(model, qq)[1], (q,), (qd,))
    w = jnp.einsum("bij,bkj->bik", rdots, rots)  # Ṙ Rᵀ
    return jax.vmap(_unskew)(w)


def mass_matrix(model: Model3D, q: Array) -> Array:
    jac_c = jax.jacfwd(lambda qq: com_world(model, qq))(q)  # [nb,3,ndof]
    # ω is linear in q̇: J_ω = ∂ω/∂q̇ at q̇=0 direction basis
    jac_w = jax.jacfwd(lambda qd: body_omegas(model, q, qd))(
        jnp.zeros(model.ndof))  # [nb,3,ndof]
    _, rots = fk(model, q)
    # world inertia: R diag(I) Rᵀ
    i_world = jnp.einsum("bij,bj,bkj->bik", rots, model.inertia, rots)
    m = jnp.einsum("b,bid,bie->de", model.mass, jac_c, jac_c)
    m = m + jnp.einsum("bid,bij,bje->de", jac_w, i_world, jac_w)
    arm = jnp.concatenate([jnp.zeros(6), model.armature])
    return m + jnp.diag(arm)


def bias_forces(model: Model3D, q: Array, qd: Array) -> Array:
    mdot_qd = jax.jvp(lambda qq: mass_matrix(model, qq) @ qd, (q,), (qd,))[1]
    kin_grad = jax.grad(lambda qq: 0.5 * qd @ mass_matrix(model, qq) @ qd)(q)
    return mdot_qd - kin_grad


def gravity_forces(model: Model3D, q: Array) -> Array:
    def potential(qq: Array) -> Array:
        coms = com_world(model, qq)
        return GRAVITY * jnp.sum(model.mass * coms[:, 2])
    return -jax.grad(potential)(q)


def contact_world(model: Model3D, q: Array) -> Array:
    origins, rots = fk(model, q)
    idx = np.asarray(model.contact_body)
    return origins[idx] + jnp.einsum("cij,cj->ci", rots[idx],
                                     model.contact_point)


def contact_forces(model: Model3D, q: Array, qd: Array,
                   hfield: tp.Optional[Heightfield] = None
                   ) -> tp.Tuple[Array, Array]:
    def pts_fn(qq: Array) -> Array:
        return contact_world(model, qq)
    pts = pts_fn(q)
    jac = jax.jacfwd(pts_fn)(q)  # [nc,3,ndof]
    vel = jnp.einsum("cid,d->ci", jac, qd)
    v_slip = 0.1
    if hfield is None:
        phi = model.contact_radius - pts[:, 2]
        fn = jnp.where(
            phi > 0,
            jnp.maximum(model.contact_stiffness * phi
                        - model.contact_damping * vel[:, 2], 0.0),
            0.0)
        ft = -model.friction * fn[:, None] * jnp.clip(
            vel[:, :2] / v_slip, -1.0, 1.0)
        forces = jnp.concatenate([ft, fn[:, None]], axis=1)
    else:
        # Sloped-terrain contact: vertical gap against the interpolated
        # height, force along the local surface normal, friction in the
        # tangent plane (reference terrain: quadruped.py Escape task).
        h = jax.vmap(lambda p: hf_height(hfield, p))(pts[:, :2])
        n = jax.vmap(lambda p: hf_normal(hfield, p))(pts[:, :2])
        phi = model.contact_radius - (pts[:, 2] - h)
        v_n = jnp.einsum("ci,ci->c", vel, n)
        fn = jnp.where(
            phi > 0,
            jnp.maximum(model.contact_stiffness * phi
                        - model.contact_damping * v_n, 0.0),
            0.0)
        v_t = vel - v_n[:, None] * n
        ft = -model.friction * fn[:, None] * jnp.clip(
            v_t / v_slip, -1.0, 1.0)
        forces = fn[:, None] * n + ft
    qf = jnp.einsum("cid,ci->d", jac, forces)
    return qf, fn


def joint_forces(model: Model3D, q: Array, qd: Array, action: Array) -> Array:
    qj = q[6:]
    qdj = qd[6:]
    if model.servo_gain is not None:
        target = model.servo_center + action * model.servo_half
        tau = model.servo_gain * (target - qj) - model.damping * qdj
    else:
        tau = model.gear * action - model.damping * qdj
    below = qj < model.limit_lo
    above = qj > model.limit_hi
    tau = tau + jnp.where(
        below, model.limit_stiffness * (model.limit_lo - qj)
        - model.limit_damping * qdj, 0.0)
    tau = tau + jnp.where(
        above, model.limit_stiffness * (model.limit_hi - qj)
        - model.limit_damping * qdj, 0.0)
    return jnp.concatenate([jnp.zeros(6), tau])


def forward_dynamics(model: Model3D, q: Array, qd: Array, action: Array,
                     hfield: tp.Optional[Heightfield] = None
                     ) -> tp.Tuple[Array, Array]:
    m = mass_matrix(model, q)
    qf_contact, fn = contact_forces(model, q, qd, hfield)
    rhs = (joint_forces(model, q, qd, action) + qf_contact
           + gravity_forces(model, q) - bias_forces(model, q, qd))
    if model.fixed_base:
        nj = model.ndof - 6
        qdd_j = jnp.linalg.solve(m[6:, 6:] + 1e-8 * jnp.eye(nj), rhs[6:])
        qdd = jnp.concatenate([jnp.zeros(6), qdd_j])
    else:
        qdd = jnp.linalg.solve(m + 1e-8 * jnp.eye(model.ndof), rhs)
    return qdd, fn


def step(model: Model3D, q: Array, qd: Array, action: Array, dt: float,
         n_substeps: int, hfield: tp.Optional[Heightfield] = None
         ) -> tp.Tuple[Array, Array, Array]:
    h = dt / n_substeps

    def substep(carry, _):
        q, qd, touch = carry
        qdd, fn = forward_dynamics(model, q, qd, action, hfield)
        qd = jnp.clip(qd + h * qdd, -100.0, 100.0)
        q = q + h * qd
        return (q, qd, jnp.maximum(touch, fn)), None

    touch0 = jnp.zeros_like(model.contact_radius)
    (q, qd, touch), _ = jax.lax.scan(substep, (q, qd, touch0), None,
                                     length=n_substeps)
    return q, qd, touch


def box_inertia(mass: float, hx: float, hy: float, hz: float
                ) -> tp.Tuple[float, float, float]:
    """Diagonal inertia of a solid box with HALF-extents (hx, hy, hz)."""
    return (mass * (hy ** 2 + hz ** 2) / 3.0,
            mass * (hx ** 2 + hz ** 2) / 3.0,
            mass * (hx ** 2 + hy ** 2) / 3.0)


def rod_inertia3(mass: float, length: float, radius: float,
                 axis: int) -> tp.Tuple[float, float, float]:
    """Capsule-as-cylinder inertia; `axis` = the capsule's long axis."""
    long_i = mass * radius ** 2 / 2.0
    perp_i = mass * (length ** 2 / 12.0 + radius ** 2 / 4.0)
    out = [perp_i, perp_i, perp_i]
    out[axis] = long_i
    return tuple(out)  # type: ignore[return-value]
