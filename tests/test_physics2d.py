import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.envs import physics2d as p2d


def _ball_model(radius: float = 0.1) -> p2d.PlanarModel:
    mass = p2d.capsule_mass(radius, 0.0)
    return p2d.PlanarModel(
        parent=(-1,),
        anchor=jnp.zeros((1, 2)),
        com=jnp.zeros((1, 2)),
        mass=jnp.asarray([mass]),
        inertia=jnp.asarray([p2d.rod_inertia(mass, 0.0, radius)]),
        contact_body=(0,),
        contact_point=jnp.zeros((1, 2)),
        contact_radius=jnp.asarray([radius]),
        gear=jnp.zeros((0,)),
        damping=jnp.zeros((0,)),
        limit_lo=jnp.zeros((0,)),
        limit_hi=jnp.zeros((0,)),
        armature=jnp.zeros((0,)),
    )


def _double_pendulum() -> p2d.PlanarModel:
    m1 = p2d.capsule_mass(0.05, 0.5)
    return p2d.PlanarModel(
        parent=(-1, 0),
        anchor=jnp.asarray([[0, 0], [0, -0.5]], jnp.float32),
        com=jnp.asarray([[0, -0.25], [0, -0.25]], jnp.float32),
        mass=jnp.asarray([m1, m1]),
        inertia=jnp.asarray([p2d.rod_inertia(m1, 0.5, 0.05)] * 2),
        contact_body=(1,),
        contact_point=jnp.asarray([[0.0, -0.5]], jnp.float32),
        contact_radius=jnp.asarray([0.05]),
        gear=jnp.asarray([10.0]),
        damping=jnp.asarray([0.0]),
        limit_lo=jnp.asarray([-10.0]),
        limit_hi=jnp.asarray([10.0]),
        armature=jnp.asarray([0.0]),
    )


def test_free_fall_acceleration() -> None:
    """A body high above the ground accelerates at -g."""
    model = _ball_model()
    q = jnp.asarray([0.0, 5.0, 0.0])
    qd = jnp.zeros(3)
    qdd, _ = p2d.forward_dynamics(model, q, qd, jnp.zeros(0))
    np.testing.assert_allclose(np.asarray(qdd), [0.0, -p2d.GRAVITY, 0.0],
                               atol=1e-4)


def test_ball_rests_on_ground() -> None:
    """Dropped ball settles with its center near the contact radius."""
    model = _ball_model(radius=0.1)
    q = jnp.asarray([0.0, 0.3, 0.0])
    qd = jnp.zeros(3)
    step = jax.jit(lambda q, qd: p2d.step(model, q, qd, jnp.zeros(0),
                                          0.02, 8))
    for _ in range(200):
        q, qd, touch = step(q, qd)
    z = float(q[1])
    assert 0.05 < z < 0.12  # resting on the surface, slight spring sag
    assert abs(float(qd[1])) < 0.05
    assert float(touch[0]) > 0  # normal force registered


def test_mass_matrix_symmetric_posdef() -> None:
    model = _double_pendulum()
    q = jnp.asarray([0.0, 2.0, 0.3, 0.5])
    m = np.asarray(p2d.mass_matrix(model, q))
    np.testing.assert_allclose(m, m.T, atol=1e-5)
    assert np.linalg.eigvalsh(m).min() > 0


def test_pendulum_energy_stable() -> None:
    """Passive double pendulum in the air: energy must not blow up under
    the semi-implicit integrator."""
    model = _double_pendulum()
    q = jnp.asarray([0.0, 3.0, 0.0, 1.0])
    qd = jnp.zeros(4)

    def energy(q, qd):
        m = p2d.mass_matrix(model, q)
        coms, _ = p2d.com_world(model, q)
        v = 0.5 * qd @ m @ qd
        pot = p2d.GRAVITY * jnp.sum(model.mass * coms[:, 1])
        return float(v + pot)

    e0 = energy(q, qd)
    step = jax.jit(lambda q, qd: p2d.step(model, q, qd, jnp.zeros(1),
                                          0.02, 8))
    # gravity will make it fall; track energy while airborne (no contact)
    for _ in range(20):
        q, qd, _ = step(q, qd)
    e1 = energy(q, qd)
    # free fall conserves energy up to integrator error (<2%)
    assert abs(e1 - e0) / abs(e0) < 0.02


def test_actuation_moves_joint() -> None:
    model = _double_pendulum()
    q = jnp.asarray([0.0, 3.0, 0.0, 0.0])
    qd = jnp.zeros(4)
    step = jax.jit(lambda q, qd, a: p2d.step(model, q, qd, a, 0.02, 8))
    for _ in range(10):
        q, qd, _ = step(q, qd, jnp.asarray([1.0]))
    q2 = jnp.asarray([0.0, 3.0, 0.0, 0.0])
    qd2 = jnp.zeros(4)
    for _ in range(10):
        q2, qd2, _ = step(q2, qd2, jnp.asarray([-1.0]))
    # opposite torques rotate the joint in opposite directions
    assert float(q[3]) > float(q2[3])


def test_joint_limits_hold() -> None:
    model = _double_pendulum().replace(
        limit_lo=jnp.asarray([-0.2]), limit_hi=jnp.asarray([0.2]))
    q = jnp.asarray([0.0, 3.0, 0.0, 0.0])
    qd = jnp.zeros(4)
    step = jax.jit(lambda q, qd: p2d.step(model, q, qd, jnp.asarray([1.0]),
                                          0.02, 8))
    for _ in range(100):
        q, qd, _ = step(q, qd)
    assert float(q[3]) < 0.6  # soft limit keeps the joint near its range


def test_subtree_momentum_signs() -> None:
    """A body translating +x at height above COM center has the expected
    angular-momentum sign convention (MuJoCo y-axis)."""
    model = _double_pendulum()
    q = jnp.asarray([0.0, 2.0, 0.0, 0.0])
    qd = jnp.asarray([1.0, 0.0, 0.0, 0.0])  # pure +x translation
    v_com, l_y, com = p2d.subtree_momentum(model, q, qd)
    np.testing.assert_allclose(np.asarray(v_com), [1.0, 0.0], atol=1e-5)
    # pure translation of the whole tree: zero angular momentum about COM
    assert abs(float(l_y)) < 1e-4
    # pure positive spin of the root: in MuJoCo's y convention this is
    # negative angular momentum
    qd_spin = jnp.asarray([0.0, 0.0, 1.0, 0.0])
    _, l_y_spin, _ = p2d.subtree_momentum(model, q, qd_spin)
    assert float(l_y_spin) < 0
