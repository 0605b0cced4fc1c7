"""Bridge to the REAL dm_control/MuJoCo reference stack, for parity tests.

This framework's environments run on from-scratch JAX physics engines.
To anchor every "parity" claim against the actual reference
(facebookresearch/controllable_agent + dm_control), this module drives the
reference's own environments — the standard suite tasks plus the custom
task XMLs under /root/reference/url_benchmark/custom_dmc_tasks — and
exposes:

  * matched-state collection (MuJoCo [qpos, qvel] rows from rollouts),
  * the reference's named goal features (the exact physics reads used by
    url_benchmark/goals.py:66-112),
  * physics-replay reward relabeling (the exact semantics of
    url_benchmark/in_memory_replay_buffer.py:40-55),

so tests can compare this repo's adapters / feature extractors / reward
functions against the reference bit-for-bit on the same MuJoCo states.

This is a validation-only tool: nothing in the framework depends on it.
"""

from __future__ import annotations

import sys
import typing as tp
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")

_HAS_STACK: tp.Optional[bool] = None


def reference_stack_available() -> bool:
    """True when dm_control + the reference custom task XMLs import."""
    global _HAS_STACK
    if _HAS_STACK is None:
        try:
            import dm_control  # noqa: F401
            _HAS_STACK = (REFERENCE_ROOT / "url_benchmark" /
                          "custom_dmc_tasks").exists()
        except Exception:  # pragma: no cover - import guard
            _HAS_STACK = False
    return bool(_HAS_STACK)


def _cdmc() -> tp.Any:
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    from url_benchmark import custom_dmc_tasks  # type: ignore
    return custom_dmc_tasks


def make_env(name: str, seed: int = 1) -> tp.Any:
    """Load the reference environment for e.g. 'walker_flip' — standard
    suite task when it exists, custom task XML otherwise (the dispatch of
    url_benchmark/dmc.py:353-385)."""
    from dm_control import suite
    if name.startswith("point_mass_maze"):
        domain = "point_mass_maze"
        task = name[len("point_mass_maze_"):]
    else:
        domain, task = name.split("_", 1)
    if (domain, task) in suite.ALL_TASKS:
        return suite.load(domain, task, task_kwargs={"random": seed})
    return _cdmc().make(domain, task, task_kwargs={"random": seed})


def mj_state(env: tp.Any) -> np.ndarray:
    """[qpos, qvel] row — the layout ExORL buffers store per step."""
    p = env.physics
    return np.concatenate([p.data.qpos, p.data.qvel]).astype(np.float64)


def reward_from_state(env: tp.Any, state: np.ndarray) -> float:
    """Physics-replay reward: the exact relabel semantics of the
    reference buffer (in_memory_replay_buffer.py:44-48 —
    reset_context + set_state + task.get_reward)."""
    p = env.physics
    full = np.zeros(p.get_state().shape)
    full[:state.shape[0]] = state
    with p.reset_context():
        p.set_state(full)
    return float(env.task.get_reward(p))


def walker_features(env: tp.Any) -> np.ndarray:
    """[x, z, up, vx, vz, am] — the named physics reads behind the
    reference's walker goal spaces (goals.py:66-94): torso xpos/height/
    upright, torso subtree_linvel x/z, torso subtree_angmom y."""
    p = env.physics
    d = p.named.data
    return np.array([
        d.xpos["torso", "x"],
        d.xpos["torso", "z"],
        p.torso_upright(),
        d.subtree_linvel["torso", "x"],
        d.subtree_linvel["torso", "z"],
        d.subtree_angmom["torso", "y"],
    ], dtype=np.float64)


def cheetah_features(env: tp.Any) -> np.ndarray:
    """Same layout for the cheetah: its reward reads
    horizontal_velocity (torso subtree linvel x) and the flip tasks read
    subtree_angmom y (custom_dmc_tasks/cheetah.py)."""
    p = env.physics
    d = p.named.data
    return np.array([
        d.xpos["torso", "x"],
        d.xpos["torso", "z"],
        float(np.cos(d.qpos["rooty"].item())),
        d.subtree_linvel["torso", "x"],
        d.subtree_linvel["torso", "z"],
        d.subtree_angmom["torso", "y"],
    ], dtype=np.float64)


hopper_features = cheetah_features  # same named reads (hopper.py rewards)


def quadruped_features(env: tp.Any) -> np.ndarray:
    """[up, com_z, x, y, z, vx, vy, vz] — the reference's quadruped
    reads: torso_upright / com_height / torso xpos / torso_velocity
    (custom_dmc_tasks/quadruped.py:222-231, goals.py:97-112). Entries
    2:8 line up with the native feature layout
    (envs/quadruped.quad_features_single); index 1 carries the COM
    height the Jump reward uses (the native layout keeps the root z
    there — the parity report quantifies the offset)."""
    p = env.physics
    d = p.named.data
    return np.array([
        float(p.torso_upright()),
        # whole-robot COM height == the custom Physics' com_height sensor
        # read; subtree_com works on both the suite and custom models
        float(d.subtree_com["torso", "z"]),
        d.xpos["torso", "x"],
        d.xpos["torso", "y"],
        d.xpos["torso", "z"],
        *p.torso_velocity(),
    ], dtype=np.float64)


def collect_rollout(env: tp.Any, n_steps: int, seed: int = 0,
                    feature_fn: tp.Optional[tp.Callable[[tp.Any], np.ndarray]] = None,
                    ) -> tp.Dict[str, np.ndarray]:
    """Random-action rollout; returns per-step MuJoCo states, rewards and
    (optionally) reference goal features, all evaluated at the
    post-step state exactly as the reference wrappers see them."""
    rng = np.random.RandomState(seed)
    spec = env.action_spec()
    env.reset()
    states, rewards, feats = [], [], []
    for _ in range(n_steps):
        action = rng.uniform(spec.minimum, spec.maximum, spec.shape)
        ts = env.step(action)
        states.append(mj_state(env))
        rewards.append(0.0 if ts.reward is None else float(ts.reward))
        if feature_fn is not None:
            feats.append(feature_fn(env))
        if ts.last():
            env.reset()
    out = {"physics": np.array(states), "reward": np.array(rewards)}
    if feature_fn is not None:
        out["features"] = np.array(feats)
    return out
