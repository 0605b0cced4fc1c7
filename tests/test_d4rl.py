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
