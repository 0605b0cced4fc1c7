import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.data import ReplayBuffer, SampleConfig
from controllable_agent_tpu.data.replay import sample


def _make_episode(length: int, obs_dim: int = 3, act_dim: int = 2,
                  seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    return {
        "observation": rng.randn(length + 1, obs_dim).astype(np.float32),
        "action": rng.randn(length + 1, act_dim).astype(np.float32),
        "reward": rng.rand(length + 1, 1).astype(np.float32),
        "discount": np.ones((length + 1, 1), np.float32),
        "goal": rng.randn(length + 1, 2).astype(np.float32),
        "physics": rng.randn(length + 1, 4).astype(np.float32),
    }


def test_add_and_len() -> None:
    buf = ReplayBuffer(max_episodes=5, discount=0.98, future=0.99)
    for i in range(3):
        buf.add_episode(_make_episode(10, seed=i))
    assert len(buf) == 3
    assert buf.avg_episode_length == 10


def test_ring_overwrite() -> None:
    buf = ReplayBuffer(max_episodes=3, discount=0.98, future=0.99)
    for i in range(7):
        buf.add_episode(_make_episode(10, seed=i))
    assert len(buf) == 3
    assert buf._collected_episodes == 7


def test_variable_length_avg() -> None:
    buf = ReplayBuffer(max_episodes=5, discount=0.98, future=0.99,
                       max_episode_length=20)
    buf.add_episode(_make_episode(10))
    buf.add_episode(_make_episode(20))
    assert buf.avg_episode_length == 15


def test_sample_shapes_and_semantics() -> None:
    buf = ReplayBuffer(max_episodes=4, discount=0.9, future=0.99)
    for i in range(4):
        buf.add_episode(_make_episode(12, seed=i))
    batch = buf.sample(jax.random.key(0), 64)
    assert batch.obs.shape == (64, 3)
    assert batch.action.shape == (64, 2)
    assert batch.reward.shape == (64, 1)
    assert batch.next_obs.shape == (64, 3)
    assert batch.goal is not None and batch.goal.shape == (64, 2)
    assert batch.future_obs is not None and batch.future_obs.shape == (64, 3)
    # discount folds in the sampling-config discount factor
    np.testing.assert_allclose(np.asarray(batch.discount), 0.9, rtol=1e-6)


def test_sample_index_consistency() -> None:
    """next_obs must be the observation one step after obs within one episode."""
    buf = ReplayBuffer(max_episodes=2, discount=1.0, future=0.99)
    ep = _make_episode(20)
    buf.add_episode(ep)
    batch = buf.sample(jax.random.key(1), 128)
    obs_all = ep["observation"]
    for o, no in zip(np.asarray(batch.obs), np.asarray(batch.next_obs)):
        i = int(np.argmin(np.linalg.norm(obs_all - o, axis=1)))
        np.testing.assert_allclose(no, obs_all[i + 1], rtol=1e-5)


def test_future_sampling_is_forward_in_time() -> None:
    """future_obs is at an index >= the current step (geometric offset)."""
    buf = ReplayBuffer(max_episodes=1, discount=1.0, future=0.9)
    length = 30
    ep = _make_episode(length)
    # encode the step index in the observation for verification
    ep["observation"][:, 0] = np.arange(length + 1)
    buf.add_episode(ep)
    batch = buf.sample(jax.random.key(2), 256)
    step = np.asarray(batch.next_obs)[:, 0]
    future = np.asarray(batch.future_obs)[:, 0]
    assert (future >= step - 1).all()
    assert (future <= length).all()
    # geometric with p=0.1 must reach beyond one step fairly often
    assert (future > step).mean() > 0.5


def test_custom_reward_relabel_on_sample() -> None:
    buf = ReplayBuffer(max_episodes=2, discount=1.0, future=0.99)
    buf.add_episode(_make_episode(10))

    def reward_fn(phys: np.ndarray) -> np.ndarray:
        return phys[:, 0]

    batch = buf.sample(jax.random.key(3), 32, custom_reward=reward_fn,
                       with_physics=True)
    np.testing.assert_allclose(
        np.asarray(batch.reward)[:, 0], np.asarray(batch.physics)[:, 0], rtol=1e-5)


def test_whole_buffer_relabel() -> None:
    buf = ReplayBuffer(max_episodes=2, discount=1.0, future=0.99)
    buf.add_episode(_make_episode(10))
    buf.relabel(lambda phys: phys[:, 1])
    batch = buf.sample(jax.random.key(4), 32, with_physics=True)
    np.testing.assert_allclose(
        np.asarray(batch.reward)[:, 0], np.asarray(batch.physics)[:, 1], rtol=1e-5)


def test_per_step_add_commits_on_last() -> None:
    buf = ReplayBuffer(max_episodes=2, discount=1.0, future=0.99)
    for t in range(6):
        ts = {
            "observation": np.full(3, t, np.float32),
            "action": np.zeros(2, np.float32),
            "reward": 0.0,
            "discount": 1.0,
        }
        buf.add(ts, meta={"z": np.ones(4, np.float32)}, last=(t == 5))
    assert len(buf) == 1
    batch = buf.sample(jax.random.key(5), 8)
    assert "z" in batch.meta and batch.meta["z"].shape == (8, 4)


def test_sample_jits_with_state_donation() -> None:
    buf = ReplayBuffer(max_episodes=2, discount=0.99, future=0.5)
    buf.add_episode(_make_episode(10))
    fn = jax.jit(sample, static_argnums=(2,))
    batch = fn(buf.state, jax.random.key(0), 16, buf.cfg)
    assert batch.obs.shape == (16, 3)


def test_nstep_sampling_semantics() -> None:
    """n-step returns match the ExORL disk-loader convention: reward =
    sum_i prod_{j<i}(d_j*gamma) r_{t+i}, discount = prod_i(d_i*gamma),
    next_obs at t+n-1 offset, window always inside the episode."""
    import jax
    import jax.numpy as jnp
    from controllable_agent_tpu.data.replay import (ReplayBuffer,
                                                    SampleConfig, sample)
    T, n = 12, 3
    gamma = 0.9
    buf = ReplayBuffer(max_episodes=2, discount=gamma, future=0.99,
                       max_episode_length=T)
    buf.cfg = buf.cfg.replace(nstep=n)
    rng = np.random.RandomState(3)
    for _ in range(2):
        buf.add_episode({
            "observation": rng.randn(T + 1, 4).astype(np.float32),
            "action": rng.uniform(-1, 1, (T + 1, 2)).astype(np.float32),
            "reward": rng.rand(T + 1, 1).astype(np.float32),
            "discount": np.ones((T + 1, 1), np.float32),
        })
    batch = sample(buf.state, jax.random.PRNGKey(0), 256, buf.cfg)
    obs_store = np.asarray(buf.state.storage["observation"])
    rew_store = np.asarray(buf.state.storage["reward"])
    b_obs = np.asarray(batch.obs)
    b_next = np.asarray(batch.next_obs)
    b_rew = np.asarray(batch.reward)
    b_disc = np.asarray(batch.discount)
    # discount is gamma^n everywhere (stored discounts are 1)
    np.testing.assert_allclose(b_disc, gamma ** n, rtol=1e-5)
    # reconstruct each sample's (episode, step) from obs and check the
    # n-step reward and the t+n-1 next_obs offset
    flat = obs_store.reshape(-1, 4)
    for i in range(40):
        match = np.where((flat == b_obs[i]).all(-1))[0]
        assert len(match) == 1
        e, t0 = divmod(int(match[0]), T + 1)
        step = t0 + 1  # obs is at step-1
        assert step + n - 1 <= T  # full window inside the episode
        expected = sum(gamma ** j * rew_store[e, step + j, 0]
                       for j in range(n))
        np.testing.assert_allclose(b_rew[i, 0], expected, rtol=1e-4)
        np.testing.assert_array_equal(b_next[i],
                                      obs_store[e, step + n - 1])


def test_bulk_load_matches_per_episode() -> None:
    """load_episodes into an empty buffer takes the bulk host-assembly
    path (one device transfer per array, not one jitted add per episode —
    a relay round-trip each on a tunneled TPU) and must produce the exact
    state the per-episode path would."""
    eps = [_make_episode(10, seed=i) for i in range(4)]
    a = ReplayBuffer(max_episodes=6, discount=0.98, future=0.99,
                     max_episode_length=10)
    for ep in eps:
        a.add_episode(ep)
    b = ReplayBuffer(max_episodes=6, discount=0.98, future=0.99,
                     max_episode_length=10)
    b.load_episodes(iter(eps))
    assert len(b) == 4 and b._collected_episodes == 4
    assert int(b.state.idx) == int(a.state.idx)
    np.testing.assert_array_equal(np.asarray(b.state.ep_lengths),
                                  np.asarray(a.state.ep_lengths))
    for k in a.state.storage:
        np.testing.assert_array_equal(np.asarray(b.state.storage[k]),
                                      np.asarray(a.state.storage[k]))
    # identical samples from identical states
    key = jax.random.PRNGKey(0)
    sa = a.sample(key, 16)
    sb = b.sample(key, 16)
    np.testing.assert_array_equal(np.asarray(sa.obs), np.asarray(sb.obs))


def test_bulk_load_caps_and_variable_length() -> None:
    eps = [_make_episode(5 + i, seed=i) for i in range(5)]
    buf = ReplayBuffer(max_episodes=3, discount=0.98, future=0.99,
                       max_episode_length=12)
    buf.load_episodes(eps)
    assert len(buf) == 3
    lengths = np.asarray(buf.state.ep_lengths)[:3]
    np.testing.assert_array_equal(lengths, [5, 6, 7])
    # idx wrapped to 0: the ring is exactly full
    assert int(buf.state.idx) == 0


def test_bulk_load_into_nonempty_falls_back() -> None:
    buf = ReplayBuffer(max_episodes=5, discount=0.98, future=0.99,
                       max_episode_length=10)
    buf.add_episode(_make_episode(10, seed=0))
    buf.load_episodes([_make_episode(10, seed=1), _make_episode(10, seed=2)])
    assert len(buf) == 3 and buf._collected_episodes == 3
