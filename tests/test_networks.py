import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.models import (
    Actor,
    BackwardMap,
    DiagGaussianActor,
    DiscreteForwardMap,
    ForwardMap,
    MultinputNet,
    mlp,
)


def test_mlp_spec() -> None:
    net = mlp(12, "relu", 15)
    params = net.init(jax.random.key(0), jnp.zeros((2, 10)))
    out = net.apply(params, jnp.ones((2, 10)))
    assert out.shape == (2, 15)


def test_mlp_orthogonal_init() -> None:
    net = mlp(64)
    params = net.init(jax.random.key(0), jnp.zeros((1, 64)))
    w = params["params"]["Dense_0"]["kernel"]
    eye = np.asarray(w.T @ w)
    np.testing.assert_allclose(eye, np.eye(64), atol=1e-2)
    np.testing.assert_allclose(np.asarray(params["params"]["Dense_0"]["bias"]), 0.0)


def test_actor_shapes_and_bounds() -> None:
    for preprocess in (False, True):
        actor = Actor(z_dim=8, action_dim=3, feature_dim=16, hidden_dim=32,
                      preprocess=preprocess)
        obs = jnp.ones((4, 10))
        z = jnp.ones((4, 8))
        params = actor.init(jax.random.key(0), obs, z)
        mu = actor.apply(params, obs, z)
        assert mu.shape == (4, 3)
        assert float(jnp.max(jnp.abs(mu))) <= 1.0


def test_diag_gaussian_actor() -> None:
    actor = DiagGaussianActor(z_dim=8, action_dim=3, hidden_dim=32,
                              log_std_bounds=(-5.0, 2.0))
    obs, z = jnp.ones((4, 10)), jnp.ones((4, 8))
    params = actor.init(jax.random.key(0), obs, z)
    sigma_mu, std = actor.apply(params, obs, z)
    assert sigma_mu.shape == (4, 3) and std.shape == (4, 3)
    assert float(jnp.min(std)) >= np.exp(-5.0) - 1e-6
    assert float(jnp.max(std)) <= np.exp(2.0) + 1e-4


def test_forward_map_twin() -> None:
    for preprocess in (False, True):
        fm = ForwardMap(z_dim=8, feature_dim=16, hidden_dim=32, preprocess=preprocess)
        obs, z, a = jnp.ones((4, 10)), jnp.ones((4, 8)), jnp.ones((4, 3))
        params = fm.init(jax.random.key(0), obs, z, a)
        f1, f2 = fm.apply(params, obs, z, a)
        assert f1.shape == (4, 8) and f2.shape == (4, 8)
        assert not np.allclose(np.asarray(f1), np.asarray(f2))


def test_discrete_forward_map() -> None:
    fm = DiscreteForwardMap(z_dim=8, n_actions=5, feature_dim=16, hidden_dim=32)
    obs, z = jnp.ones((4, 10)), jnp.ones((4, 8))
    params = fm.init(jax.random.key(0), obs, z)
    f1, f2 = fm.apply(params, obs, z)
    assert f1.shape == (4, 8, 5) and f2.shape == (4, 8, 5)


def test_backward_map_normalization() -> None:
    bm = BackwardMap(z_dim=8, hidden_dim=32, norm_z=True)
    goal = jnp.ones((4, 6))
    params = bm.init(jax.random.key(0), goal)
    b = bm.apply(params, goal)
    assert b.shape == (4, 8)
    norms = np.linalg.norm(np.asarray(b), axis=-1)
    np.testing.assert_allclose(norms, np.sqrt(8.0), rtol=1e-5)


def test_multinput_net() -> None:
    net = MultinputNet(input_dims=(10, 4), sequence_dims=(16, 16, 1))
    x, y = jnp.ones((3, 10)), jnp.ones((3, 4))
    params = net.init(jax.random.key(0), x, y)
    out = net.apply(params, x, y)
    assert out.shape == (3, 1)
