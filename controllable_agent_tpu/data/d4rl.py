"""D4RL offline-dataset bridge.

TPU-native equivalent of the reference's d4rl integration
(url_benchmark/d4rl_benchmark.py): the dataset→replay converter
(`D4RLReplayBufferBuilder.prepare_replay_buffer_d4rl`, :101-141) and the
minimum-episode-length filter (:81-98) re-implemented over plain numpy
dicts, plus the normalized-score hook (`D4RLWrapper.get_normalized_score`,
:56-57) as an explicit reference-score table — the d4rl package (and its
mujoco/gym stack) is not importable in this image, but its published
dataset format is just a dict of arrays:

    observations [N, obs_dim], actions [N, act_dim], rewards [N],
    terminals [N] (environment termination), timeouts [N] (time limit).

Episode-boundary semantics match the reference exactly: an episode ends
where ``terminals | timeouts`` fires; row t of the rebuilt episode carries
``observations[t]`` with the action/reward *leading into* it
(``actions[t-1]``/``rewards[t-1]`` — reference :122-131); the final
transition's discount is 0 on true termination and 1 on timeout (:133-138);
the reward of the very last dataset row of each episode is dropped, as in
the reference. Physics is a zero column (reference EmptyPhysics, :24-28).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import numpy as np


@dataclasses.dataclass
class D4RLConfig:
    """Mirror of the reference D4RLConfig (d4rl_benchmark.py:19-22)."""

    minimum_episode_length: tp.Optional[int] = None
    ignore_terminals: bool = False


def filter_dataset_by_episode_length(
        dataset: tp.Dict[str, np.ndarray],
        minimum_episode_length: tp.Optional[int]
) -> tp.Dict[str, np.ndarray]:
    """Drop rows of episodes shorter than the minimum (reference :81-98).
    Trailing rows that belong to no completed episode are dropped too."""
    if minimum_episode_length is None or minimum_episode_length <= 1:
        return dataset
    end_indices = (dataset["terminals"].astype(bool)
                   | dataset["timeouts"].astype(bool)).nonzero()[0]
    episode_lengths = np.diff(np.concatenate(([-1], end_indices)))
    expanded = episode_lengths.repeat(episode_lengths)
    diff_len = dataset["observations"].shape[0] - len(expanded)
    assert diff_len >= 0
    expanded = np.concatenate((expanded, np.zeros(diff_len, dtype=int)))
    keep = expanded >= minimum_episode_length
    n = len(dataset["observations"])
    return {k: (v[keep] if isinstance(v, np.ndarray) and len(v) == n else v)
            for k, v in dataset.items()}


def d4rl_to_episodes(dataset: tp.Dict[str, np.ndarray],
                     cfg: tp.Optional[D4RLConfig] = None
                     ) -> tp.Iterator[tp.Dict[str, np.ndarray]]:
    """Yield replay-format episode dicts ([T+1, ...]; row 0 = dummy first
    transition) from a d4rl dataset dict (reference :101-141)."""
    cfg = cfg or D4RLConfig()
    dataset = filter_dataset_by_episode_length(
        dataset, cfg.minimum_episode_length)
    obs = np.asarray(dataset["observations"], np.float32)
    actions = np.asarray(dataset["actions"], np.float32)
    rewards = np.asarray(dataset["rewards"], np.float32).reshape(-1)
    terminals = np.asarray(dataset["terminals"], bool)
    if cfg.ignore_terminals:
        terminals = np.zeros_like(terminals)
    timeouts = np.asarray(dataset["timeouts"], bool)
    end_indices = (terminals | timeouts).nonzero()[0]

    start = 0
    for end in end_indices:
        length = end - start + 1  # dataset rows in this episode
        if length < 2:  # a 1-row episode has no transition
            start = end + 1
            continue
        sl = slice(start, end + 1)
        ep_obs = obs[sl]
        # row t carries the action/reward leading INTO observations[t]
        ep_action = np.concatenate(
            [np.zeros_like(actions[start:start + 1]), actions[start:end]])
        ep_reward = np.concatenate(
            [np.zeros(1, np.float32), rewards[start:end]])[:, None]
        ep_discount = np.ones((length, 1), np.float32)
        if terminals[end]:
            ep_discount[-1] = 0.0
        yield {
            "observation": ep_obs,
            "action": ep_action,
            "reward": ep_reward,
            "discount": ep_discount,
            # reference EmptyPhysics: no simulator state available
            "physics": np.zeros((length, 1), np.float32),
        }
        start = end + 1


def load_d4rl_dataset(buffer: tp.Any, dataset: tp.Dict[str, np.ndarray],
                      cfg: tp.Optional[D4RLConfig] = None) -> int:
    """Ingest a d4rl dataset dict into a ReplayBuffer; returns the number
    of episodes loaded."""
    n = 0
    for episode in d4rl_to_episodes(dataset, cfg):
        buffer.add_episode(episode)
        n += 1
    return n


# Published d4rl v2 reference scores (d4rl/infos.py, public constants):
# normalized = 100 * (score - random) / (expert - random).
REF_SCORES: tp.Dict[str, tp.Tuple[float, float]] = {
    "halfcheetah": (-280.178953, 12135.0),
    "hopper": (-20.272305, 3234.3),
    "walker2d": (1.629008, 4592.3),
    "ant": (-325.6, 3879.7),
    "pen": (96.262799, 3076.8331017826813),
    "door": (-56.512833, 2880.5693087298737),
    "hammer": (-274.856578, 12794.134825156867),
    "relocate": (-6.425911, 4233.877797728884),
}


def normalized_score(domain: str, total_reward: float,
                     ref_scores: tp.Optional[tp.Dict[str, tp.Tuple[float, float]]] = None
                     ) -> float:
    """d4rl's get_normalized_score (reference d4rl_benchmark.py:56-57)
    without the env: 100 * (r - random) / (expert - random)."""
    table = ref_scores or REF_SCORES
    if domain not in table:
        raise KeyError(f"No reference scores for {domain!r}; "
                       f"known: {sorted(table)}")
    lo, hi = table[domain]
    return 100.0 * (float(total_reward) - lo) / (hi - lo)
