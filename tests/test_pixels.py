import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.ops.augment import random_shift_aug


def test_random_shift_is_integer_translation() -> None:
    key = jax.random.key(0)
    imgs = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    out = random_shift_aug(key, imgs, pad=2)
    assert out.shape == imgs.shape
    padded = np.pad(np.asarray(imgs), ((0, 0), (2, 2), (2, 2), (0, 0)),
                    mode="edge")
    # every output must be an exact integer-shift crop of the padded input
    for b in range(2):
        found = False
        for dy in range(5):
            for dx in range(5):
                if np.array_equal(np.asarray(out[b]),
                                  padded[b, dy:dy + 8, dx:dx + 8]):
                    found = True
        assert found
    # different key -> (almost surely) different shifts somewhere
    out2 = random_shift_aug(jax.random.key(123), imgs, pad=2)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_pixel_encoder_shapes_match_reference() -> None:
    from controllable_agent_tpu.models.networks import PixelEncoder
    enc = PixelEncoder()
    obs = jnp.zeros((4, 84, 84, 9))
    params = enc.init(jax.random.key(0), obs)
    out = enc.apply(params, obs)
    # reference repr_dim = 32*35*35 for 84x84 (ddpg.py:63)
    assert out.shape == (4, 32 * 35 * 35)
    assert out.dtype == jnp.float32


def test_pointmass_pixel_env() -> None:
    from controllable_agent_tpu.envs.pixels import make_pixel_env
    env = make_pixel_env("point_mass_maze_reach_top_left", size=32,
                         frame_stack=2, episode_length=10)
    assert env.spec.obs_shape == (32, 32, 6)
    assert env.spec.obs_dim == 32 * 32 * 6
    state, ts = env.reset(jax.random.key(0))
    assert ts.observation.shape == (env.spec.obs_dim,)
    obs0 = np.asarray(ts.observation)
    assert 0.0 <= obs0.min() and obs0.max() <= 255.0
    assert obs0.max() > 100.0  # something bright is drawn
    step = jax.jit(env.step)
    state, ts1 = step(state, jnp.asarray([1.0, 0.0]))
    for _ in range(5):
        state, ts2 = step(state, jnp.asarray([1.0, 0.0]))
    # the mass moved -> frames change
    assert not np.array_equal(np.asarray(ts2.observation), obs0)
    # physics passthrough: state-reward relabel still works
    r = env.reward_from_physics(ts2.physics, ts2.action)
    assert np.isfinite(float(r))


def test_walker_pixel_env_vmap() -> None:
    from controllable_agent_tpu.envs.pixels import make_pixel_env
    env = make_pixel_env("walker_walk", size=32, frame_stack=2,
                         episode_length=10)
    keys = jax.random.split(jax.random.key(0), 2)
    states, ts = jax.jit(jax.vmap(env.reset))(keys)
    assert ts.observation.shape == (2, 32 * 32 * 6)
    step = jax.jit(jax.vmap(env.step))
    states, ts = step(states, jnp.zeros((2, 6)))
    obs = np.asarray(ts.observation)
    assert np.isfinite(obs).all() and obs.max() > 100.0


def test_ddpg_pixels_update_and_act() -> None:
    from controllable_agent_tpu.agents.ddpg import DDPGAgent, DDPGConfig
    from controllable_agent_tpu.data.episode_batch import EpisodeBatch

    shape = (24, 24, 6)
    obs_dim = int(np.prod(shape))
    cfg = DDPGConfig(obs_type="pixels", hidden_dim=64, feature_dim=32,
                     batch_size=8, num_expl_steps=0)
    agent = DDPGAgent(cfg, obs_dim=obs_dim, action_dim=3, obs_shape=shape)
    state = agent.init(jax.random.key(0))
    assert state.encoder_params is not None

    k = jax.random.key(1)
    obs = jax.random.uniform(k, (8, obs_dim), minval=0, maxval=255)
    batch = EpisodeBatch(
        obs=obs,
        action=jax.random.uniform(k, (8, 3), minval=-1, maxval=1),
        reward=jnp.ones((8, 1)),
        discount=jnp.full((8, 1), 0.99),
        next_obs=jax.random.uniform(jax.random.key(2), (8, obs_dim),
                                    minval=0, maxval=255),
        meta={},
    )
    old_enc = jax.tree.map(jnp.copy, state.encoder_params)
    new_state, metrics = agent.update(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["critic_loss"]))
    # encoder actually trains (params changed)
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     old_enc, new_state.encoder_params))
    assert diff > 0.0
    # act on a pixel observation
    a = agent.act(new_state, obs[:2], {}, jnp.zeros((), jnp.int32),
                  jax.random.key(4), eval_mode=True)
    assert a.shape == (2, 3)
    assert np.isfinite(np.asarray(a)).all()


def test_ddpg_pixels_update_encoder_flag() -> None:
    from controllable_agent_tpu.agents.ddpg import DDPGAgent, DDPGConfig
    from controllable_agent_tpu.data.episode_batch import EpisodeBatch

    shape = (24, 24, 3)
    obs_dim = int(np.prod(shape))
    cfg = DDPGConfig(obs_type="pixels", hidden_dim=32, batch_size=4,
                     update_encoder=False)
    agent = DDPGAgent(cfg, obs_dim=obs_dim, action_dim=2, obs_shape=shape)
    state = agent.init(jax.random.key(0))
    batch = EpisodeBatch(
        obs=jnp.full((4, obs_dim), 128.0),
        action=jnp.zeros((4, 2)),
        reward=jnp.ones((4, 1)),
        discount=jnp.full((4, 1), 0.99),
        next_obs=jnp.full((4, obs_dim), 128.0),
        meta={},
    )
    old_enc = jax.tree.map(jnp.copy, state.encoder_params)
    new_state, _ = agent.update(state, batch, jax.random.key(1))
    # frozen encoder: params unchanged
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), old_enc, new_state.encoder_params)
