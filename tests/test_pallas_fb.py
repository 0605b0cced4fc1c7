"""Parity tests for the fused Pallas FB loss (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.ops.fb import fb_loss_terms, orthonormality_loss
from controllable_agent_tpu.ops.pallas_fb import fb_loss_terms_fused


def _inputs(n: int = 64, d: int = 16, seed: int = 0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(n, d).astype(np.float32))  # noqa: E731
    f1, f2, b, tf1, tf2, tb = (mk() for _ in range(6))
    disc = jnp.asarray(rng.uniform(0.9, 1.0, (n, 1)).astype(np.float32))
    return f1, f2, b, tf1, tf2, tb, disc


def _reference(f1, f2, b, tf1, tf2, tb, disc):
    target_m = jnp.minimum(tf1 @ tb.T, tf2 @ tb.T)
    fb_loss, fb_diag, fb_offdiag = fb_loss_terms(f1, f2, b, target_m, disc)
    orth, orth_diag, orth_off = orthonormality_loss(b)
    return fb_offdiag, fb_diag, orth_off, orth_diag


def _fused_normalized(f1, f2, b, tf1, tf2, tb, disc):
    n = f1.shape[0]
    off_sum, diag_sum, cov_off, cov_diag = fb_loss_terms_fused(
        f1, f2, b, tf1, tf2, tb, disc)
    return (0.5 * off_sum / (n * (n - 1)), -diag_sum / n,
            cov_off / (n * (n - 1)), -2.0 * cov_diag / n)


def test_forward_parity() -> None:
    args = _inputs()
    ref = _reference(*args)
    fused = _fused_normalized(*args)
    for r, f in zip(ref, fused):
        np.testing.assert_allclose(float(f), float(r), rtol=2e-4)


def test_forward_parity_nonmultiple_batch() -> None:
    """batch not divisible by the tile size exercises the padding guard."""
    args = _inputs(n=300, d=8, seed=1)
    ref = _reference(*args)
    fused = _fused_normalized(*args)
    for r, f in zip(ref, fused):
        np.testing.assert_allclose(float(f), float(r), rtol=2e-4)


def test_gradient_parity() -> None:
    args = _inputs(n=48, d=8, seed=2)

    def loss_ref(f1, f2, b):
        o1, o2, o3, o4 = _reference(f1, f2, b, *args[3:])
        return o1 + o2 + 1.0 * (o3 + o4)

    def loss_fused(f1, f2, b):
        o1, o2, o3, o4 = _fused_normalized(f1, f2, b, *args[3:])
        return o1 + o2 + 1.0 * (o3 + o4)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args[:3])
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(*args[:3])
    for gr, gf in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-3, atol=1e-5)


def test_agent_update_with_pallas_loss() -> None:
    from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
    from controllable_agent_tpu.data.episode_batch import EpisodeBatch
    rng = np.random.RandomState(0)
    n = 16
    batch = EpisodeBatch(
        obs=jnp.asarray(rng.randn(n, 6).astype(np.float32)),
        action=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
        reward=jnp.asarray(rng.rand(n, 1).astype(np.float32)),
        next_obs=jnp.asarray(rng.randn(n, 6).astype(np.float32)),
        discount=jnp.full((n, 1), 0.98, jnp.float32),
        future_obs=jnp.asarray(rng.randn(n, 6).astype(np.float32)),
    )
    cfg = FBDDPGConfig(hidden_dim=32, backward_hidden_dim=32, feature_dim=16,
                       z_dim=8, batch_size=16, use_pallas_loss=True)
    agent = FBDDPGAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["fb_loss"]))
    # same batch, same key, pallas off -> nearly identical loss
    cfg2 = FBDDPGConfig(hidden_dim=32, backward_hidden_dim=32, feature_dim=16,
                        z_dim=8, batch_size=16, use_pallas_loss=False)
    agent2 = FBDDPGAgent(cfg2, obs_dim=6, action_dim=3)
    state_b = agent2.init(jax.random.key(0))
    _, metrics2 = agent2.update(state_b, batch, jax.random.key(1))
    np.testing.assert_allclose(float(metrics["fb_loss"]),
                               float(metrics2["fb_loss"]), rtol=5e-4)
