import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.utils import (
    KeyChain,
    SquashedNormal,
    Stopwatch,
    TruncatedNormal,
    crossed,
    frames_remaining,
    schedule,
    soft_update,
)


def test_schedule_constant() -> None:
    fn = schedule("0.2")
    assert float(fn(0)) == pytest.approx(0.2)
    assert float(fn(10**6)) == pytest.approx(0.2)


def test_schedule_linear() -> None:
    fn = schedule("linear(1,0.2,100)")
    assert float(fn(0)) == pytest.approx(1.0)
    assert float(fn(50)) == pytest.approx(0.6)
    assert float(fn(1000)) == pytest.approx(0.2)


def test_schedule_step_linear() -> None:
    fn = schedule("step_linear(1,0.5,100,0.1,100)")
    assert float(fn(0)) == pytest.approx(1.0)
    assert float(fn(100)) == pytest.approx(0.5)
    assert float(fn(150)) == pytest.approx(0.3)
    assert float(fn(500)) == pytest.approx(0.1)


def test_schedule_jittable() -> None:
    fn = schedule("linear(1,0.2,100)")
    out = jax.jit(fn)(jnp.asarray(50))
    assert float(out) == pytest.approx(0.6)


def test_schedule_unknown() -> None:
    with pytest.raises(NotImplementedError):
        schedule("exp(1,2)")


def test_cadence_helpers() -> None:
    # budget: positive while frames remain, action_repeat rescales
    assert frames_remaining(9, 10) > 0 and frames_remaining(10, 10) <= 0
    assert frames_remaining(10**9, None) > 0
    assert frames_remaining(4, 20, action_repeat=2) > 0
    assert frames_remaining(10, 20, action_repeat=2) <= 0
    # cadence: stride-1 == the reference Every; wider strides fire once
    # per crossing no matter the stride
    assert crossed(0, 5) and crossed(5, 5) and not crossed(3, 5)
    assert not crossed(0, None)
    assert crossed(200, 100, stride=40)   # window (160, 200] crosses 200
    assert not crossed(180, 100, stride=40)  # window (140, 180] crosses nothing
    sw = Stopwatch()
    lap, total = sw.lap()
    assert 0 <= lap <= total <= sw.total + 1e-9


def test_truncated_normal_clamp_and_clip() -> None:
    loc = jnp.zeros((256, 4))
    dist = TruncatedNormal(loc, jnp.full_like(loc, 10.0))
    x = dist.sample(jax.random.key(0))
    assert float(jnp.max(jnp.abs(x))) <= 1.0
    x_clipped = dist.sample(jax.random.key(0), clip=0.1)
    # with scale 10 and clip 0.1, all samples are within 0.1 of the mean
    assert float(jnp.max(jnp.abs(x_clipped))) <= 0.1 + 1e-5


def test_truncated_normal_straight_through_grad() -> None:
    def f(loc: jnp.ndarray) -> jnp.ndarray:
        dist = TruncatedNormal(loc, jnp.full_like(loc, 5.0))
        return dist.sample(jax.random.key(1)).sum()

    g = jax.grad(f)(jnp.zeros((8,)))
    # straight-through: gradient w.r.t. loc is identity even when clamped
    np.testing.assert_allclose(np.asarray(g), np.ones(8), rtol=1e-6)


def test_squashed_normal_logprob_matches_change_of_variables() -> None:
    dist = SquashedNormal(jnp.zeros((5,)), jnp.ones((5,)))
    a, pre = dist.sample_with_pre_tanh(jax.random.key(2))
    lp1 = dist.log_prob_from_pre_tanh(pre)
    lp2 = dist.log_prob(a)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-4)
    assert float(jnp.max(jnp.abs(dist.mean))) < 1.0


def test_soft_update() -> None:
    params = {"w": jnp.ones((3,))}
    target = {"w": jnp.zeros((3,))}
    out = soft_update(params, target, 0.1)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3), rtol=1e-6)


def test_keychain_distinct() -> None:
    kc = KeyChain(0)
    k1, k2 = kc.next(), kc.next()
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
