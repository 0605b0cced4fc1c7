import numpy as np
import pytest

from controllable_agent_tpu.data.d4rl import (
    D4RLConfig, d4rl_to_episodes, filter_dataset_by_episode_length,
    load_d4rl_dataset, normalized_score)


def _make_dataset() -> dict:
    """3 completed episodes (lengths 5, 3, 6) + 2 trailing orphan rows.
    Episode 1 ends by terminal, episodes 2 and 3 by timeout."""
    n = 16
    rng = np.random.RandomState(0)
    terminals = np.zeros(n, bool)
    timeouts = np.zeros(n, bool)
    terminals[4] = True   # ep1: rows 0-4
    timeouts[7] = True    # ep2: rows 5-7
    timeouts[13] = True   # ep3: rows 8-13; rows 14-15 orphaned
    return {
        "observations": rng.randn(n, 4).astype(np.float32),
        "actions": rng.uniform(-1, 1, (n, 2)).astype(np.float32),
        "rewards": np.arange(n, dtype=np.float32),
        "terminals": terminals,
        "timeouts": timeouts,
    }


def test_episode_boundaries_and_offsets() -> None:
    ds = _make_dataset()
    eps = list(d4rl_to_episodes(ds))
    assert len(eps) == 3
    assert [e["observation"].shape[0] for e in eps] == [5, 3, 6]
    ep1 = eps[0]
    # row 0 is the dummy first transition
    assert ep1["reward"][0, 0] == 0.0
    np.testing.assert_array_equal(ep1["action"][0], 0.0)
    # row t carries reward/action leading into observations[t]
    np.testing.assert_array_equal(ep1["reward"][1:, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(ep1["action"][1:], ds["actions"][0:4])
    np.testing.assert_array_equal(ep1["observation"], ds["observations"][0:5])
    # terminal episode: final discount 0; timeout episodes: discount 1
    assert ep1["discount"][-1, 0] == 0.0
    assert eps[1]["discount"][-1, 0] == 1.0
    assert eps[2]["discount"][-1, 0] == 1.0
    # physics column exists (EmptyPhysics analogue)
    assert ep1["physics"].shape == (5, 1)


def test_ignore_terminals() -> None:
    eps = list(d4rl_to_episodes(_make_dataset(),
                                D4RLConfig(ignore_terminals=True)))
    # ep1's terminal is ignored, so ep1+ep2 merge into one 8-row episode
    assert [e["observation"].shape[0] for e in eps] == [8, 6]
    assert all(e["discount"][-1, 0] == 1.0 for e in eps)


def test_minimum_episode_length_filter() -> None:
    ds = _make_dataset()
    out = filter_dataset_by_episode_length(dict(ds), 4)
    # drops the 3-row episode and the 2 orphan rows: 5 + 6 = 11 rows
    assert out["observations"].shape[0] == 11
    eps = list(d4rl_to_episodes(
        _make_dataset(), D4RLConfig(minimum_episode_length=4)))
    assert [e["observation"].shape[0] for e in eps] == [5, 6]


def test_load_into_replay_buffer_and_sample() -> None:
    import jax
    from controllable_agent_tpu.data.replay import ReplayBuffer, SampleConfig

    buffer = ReplayBuffer(max_episodes=8, discount=0.99, future=0.99,
                          max_episode_length=8)
    n = load_d4rl_dataset(buffer, _make_dataset())
    assert n == 3 and len(buffer) == 3
    batch = buffer.sample(jax.random.key(0), 16)
    assert batch.obs.shape == (16, 4)
    assert batch.action.shape == (16, 2)
    assert np.isfinite(np.asarray(batch.reward)).all()


def test_normalized_score() -> None:
    assert normalized_score("walker2d", 4592.3) == pytest.approx(100.0)
    lo = normalized_score("hopper", -20.272305)
    assert lo == pytest.approx(0.0)
    with pytest.raises(KeyError):
        normalized_score("unknown_domain", 1.0)
    # custom table passthrough
    assert normalized_score("x", 5.0, {"x": (0.0, 10.0)}) == pytest.approx(50.0)


def test_replay_env_replays_episodes() -> None:
    """envs/d4rl_replay.py: reset picks a stored episode; step replays
    its transitions with the stored rewards and LAST at its end."""
    import jax
    import jax.numpy as jnp
    from controllable_agent_tpu.envs.d4rl_replay import D4RLReplayEnv
    env = D4RLReplayEnv.from_dataset("walker2d", _make_dataset())
    assert env.spec.obs_dim == 4 and env.spec.action_dim == 2
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert int(ts.step_type) == 0 and float(ts.reward) == 0.0
    e = int(state.episode)
    total = 0.0
    step = jax.jit(env.step)
    for _ in range(env.spec.episode_length):
        state, ts = step(state, jnp.zeros(2))
        total += float(ts.reward)
    assert int(ts.step_type) == 2  # LAST by the padded horizon
    # accumulated return equals the stored episode return
    expected = {0: 0 + 1 + 2 + 3, 1: 5 + 6, 2: float(sum(range(8, 13)))}[e]
    assert total == expected
    # normalized score passthrough (reference d4rl_benchmark.py:56-57)
    assert env.get_normalized_score(total) == normalized_score(
        "walker2d", total)


def test_offline_run_logs_normalized_score(tmp_path) -> None:
    """VERDICT r3 item 7 done-criterion: an offline run on a synthetic
    d4rl dict produces a normalized_score column in eval.csv."""
    import csv
    from controllable_agent_tpu import train_offline

    rng = np.random.RandomState(1)
    n, T = 124, 30
    timeouts = np.zeros(n, bool)
    timeouts[T - 1::T] = True
    dataset = {
        "observations": rng.randn(n, 6).astype(np.float32),
        "actions": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "rewards": rng.rand(n).astype(np.float32),
        "terminals": np.zeros(n, bool),
        "timeouts": timeouts,
    }
    path = tmp_path / "dataset.npz"
    np.savez(path, **dataset)
    folder = tmp_path / "xp"
    train_offline.main([
        "agent=fb_ddpg", "task=d4rl_walker2d", f"d4rl_dataset={path}",
        f"folder={folder}", "num_grad_steps=6", "eval_every_steps=3",
        "num_eval_episodes=2", "log_every_steps=3", "final_tests=0",
        "checkpoint_every=100000", "save_eval_video=false",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
        "agent.num_inference_steps=32",
    ])
    with (folder / "eval.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert rows and "normalized_score" in rows[0]
    assert all(r["normalized_score"] != "" for r in rows)
