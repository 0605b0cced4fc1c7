"""Generate PARITY.md — quantitative cross-engine agreement vs dm_control.

Runs the same comparisons as tests/test_mujoco_parity.py over the full
task battery with longer rollouts and writes a markdown report:
per-domain goal-feature agreement and per-task reward agreement between
this repo's native engines (through the data/exorl.py physics adapters)
and the real dm_control/MuJoCo reference environments on shared states.

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu python -m tools.gen_parity_report
"""

from __future__ import annotations

import numpy as np

from tools import mujoco_bridge as bridge

N_FEATURE_STEPS = 400
N_REWARD_STEPS = 300

FEATURE_DOMAINS = ["walker", "cheetah", "hopper"]
REWARD_TASKS = [
    ("walker", "stand"), ("walker", "walk"), ("walker", "run"),
    ("walker", "flip"),
    ("cheetah", "walk"), ("cheetah", "run"), ("cheetah", "walk_backward"),
    ("cheetah", "run_backward"), ("cheetah", "flip"),
    ("cheetah", "flip_backward"),
    ("hopper", "stand"), ("hopper", "hop"), ("hopper", "hop_backward"),
    ("hopper", "flip"), ("hopper", "flip_backward"),
    ("point_mass_maze", "reach_top_left"),
    ("point_mass_maze", "reach_bottom_right"),
]
FEAT_NAMES = ["x", "z", "up", "vx", "vz", "am"]


def _native_features(domain: str, mj_states: np.ndarray) -> np.ndarray:
    import jax
    from controllable_agent_tpu.data import exorl
    from controllable_agent_tpu.envs import locomotion
    env = locomotion.make(
        f"{domain}_{'stand' if domain != 'cheetah' else 'walk'}")
    adapted = exorl.PHYSICS_ADAPTERS[f"mujoco_{domain}"](mj_states)
    return np.asarray(jax.jit(env.goal_features)(adapted))


def feature_rows() -> list:
    rows = []
    for domain in FEATURE_DOMAINS:
        task = {"walker": "walk", "cheetah": "run", "hopper": "stand"}[domain]
        env = bridge.make_env(f"{domain}_{task}", seed=12)
        fn = getattr(bridge, f"{domain}_features")
        roll = bridge.collect_rollout(env, N_FEATURE_STEPS, seed=0,
                                      feature_fn=fn)
        ours = _native_features(domain, roll["physics"])
        ref = roll["features"]
        for i, name in enumerate(FEAT_NAMES):
            err = np.abs(ours[:, i] - ref[:, i])
            denom = max(ref[:, i].std(), 1e-9)
            corr = (np.corrcoef(ours[:, i], ref[:, i])[0, 1]
                    if ref[:, i].std() > 1e-9 else float("nan"))
            rows.append((domain, name, err.mean(), err.max(),
                         float(ref[:, i].std()), corr,
                         err.mean() / denom))
    return rows


def _enrich_states(domain: str, states: np.ndarray) -> np.ndarray:
    """Widen the reward-relevant state coverage: random rollouts of some
    tasks never leave the zero-reward region (e.g. hopper_hop needs
    standing + horizontal speed; pmm needs to reach the target room).
    Inject synthetic root velocities / positions — physics replay is
    well-defined at any state."""
    rng = np.random.RandomState(9)
    out = states.copy()
    n = len(out)
    if domain == "point_mass_maze":
        # grid across the arena incl. near-target states, zero velocity
        g = np.linspace(-0.29, 0.29, 18)
        xs, ys = np.meshgrid(g, g)
        grid = np.stack([xs.ravel(), ys.ravel(),
                         np.zeros(xs.size), np.zeros(xs.size)], -1)
        return np.concatenate([out, grid])
    ndof = states.shape[1] // 2
    # root linear velocities spanning each task's speed scale
    out[:, ndof:ndof + 2] += rng.uniform(-6, 6, (n, 2))
    # root angular velocity for flip tasks
    out[:, ndof + 2] += rng.uniform(-8, 8, n)
    return out


def reward_rows() -> list:
    import jax
    from controllable_agent_tpu.data import exorl
    from controllable_agent_tpu.envs import locomotion
    from controllable_agent_tpu.envs.pointmass import PointMassMaze
    rows = []
    for domain, task in REWARD_TASKS:
        name = f"{domain}_{task}"
        env = bridge.make_env(name, seed=3)
        roll = bridge.collect_rollout(env, N_REWARD_STEPS, seed=1)
        states = _enrich_states(domain, roll["physics"])
        ref_r = np.array([bridge.reward_from_state(env, s) for s in states])
        if domain == "point_mass_maze":
            native = PointMassMaze(task)
            zero = np.zeros(2, np.float32)
            fn = jax.jit(jax.vmap(lambda p: native.reward_from_physics(p, zero)))
            ours = np.asarray(fn(states.astype(np.float32)))
        else:
            native = locomotion.make(name)
            adapted = exorl.PHYSICS_ADAPTERS[f"mujoco_{domain}"](states)
            ours = np.asarray(jax.jit(jax.vmap(native.reward_from_physics))(adapted))
        err = np.abs(ours - ref_r)
        corr = (np.corrcoef(ours, ref_r)[0, 1]
                if ref_r.std() > 1e-3 else float("nan"))
        rows.append((name, err.mean(), err.max(), float(ref_r.mean()),
                     float(ref_r.std()), corr))
    return rows


QUAD_FEAT_NAMES = ["up", "x", "y", "z", "vx", "vy", "vz"]
QUAD_FEAT_COLS = [0, 2, 3, 4, 5, 6, 7]
QUAD_REWARD_TASKS = ["stand", "walk", "run", "jump", "roll", "roll_fast"]


def quadruped_feature_rows() -> list:
    """Feature-level parity for the quadruped: the morphologies differ
    (dm_control 12-actuator/23-qpos vs native 8-joint), so the adapter
    (data/exorl.py mujoco_quadruped_features) maps states to the shared
    TORSO-level feature layout instead of state-to-state."""
    from controllable_agent_tpu.data.exorl import mujoco_quadruped_features
    env = bridge.make_env("quadruped_walk", seed=12)
    roll = bridge.collect_rollout(env, N_FEATURE_STEPS, seed=0,
                                  feature_fn=bridge.quadruped_features)
    ours = mujoco_quadruped_features(roll["physics"])
    ref = roll["features"]
    rows = []
    for name, col in zip(QUAD_FEAT_NAMES, QUAD_FEAT_COLS):
        err = np.abs(ours[:, col] - ref[:, col])
        corr = (np.corrcoef(ours[:, col], ref[:, col])[0, 1]
                if ref[:, col].std() > 1e-9 else float("nan"))
        rows.append(("quadruped", name, err.mean(), err.max(),
                     float(ref[:, col].std()), corr, 0.0))
    # the jump height read: native carries root z, reference uses COM z
    err = np.abs(ours[:, 4] - ref[:, 1])
    corr = np.corrcoef(ours[:, 4], ref[:, 1])[0, 1]
    rows.append(("quadruped", "com_z (vs root z)", err.mean(), err.max(),
                 float(ref[:, 1].std()), corr, 0.0))
    return rows


def quadruped_reward_rows() -> list:
    import jax
    from controllable_agent_tpu.data.exorl import mujoco_quadruped_features
    from controllable_agent_tpu.envs.quadruped import QuadrupedEnv
    src = bridge.make_env("quadruped_run", seed=3)
    roll = bridge.collect_rollout(src, N_REWARD_STEPS, seed=1)
    states = roll["physics"]
    rng = np.random.RandomState(9)
    fast = states.copy()
    fast[:, 23:26] += rng.uniform(-6, 6, (len(fast), 3))
    states = np.concatenate([states, fast])
    feats = mujoco_quadruped_features(states).astype(np.float32)
    rows = []
    for task in QUAD_REWARD_TASKS:
        env = bridge.make_env(f"quadruped_{task}", seed=3)
        ref_r = np.array([bridge.reward_from_state(env, s) for s in states])
        native = QuadrupedEnv(task)
        ours = np.asarray(
            jax.jit(jax.vmap(native.reward_from_features))(feats))
        err = np.abs(ours - ref_r)
        corr = (np.corrcoef(ours, ref_r)[0, 1]
                if ref_r.std() > 1e-3 else float("nan"))
        rows.append((f"quadruped_{task}", err.mean(), err.max(),
                     float(ref_r.mean()), float(ref_r.std()), corr))
    return rows


def main() -> None:
    frows = feature_rows() + quadruped_feature_rows()
    rrows = reward_rows() + quadruped_reward_rows()
    lines = [
        "# PARITY — cross-engine agreement vs dm_control/MuJoCo",
        "",
        "Generated by `tools/gen_parity_report.py`; the same comparisons run",
        "in CI as `tests/test_mujoco_parity.py`. All comparisons are on",
        "SHARED states: random-action rollouts of the REAL reference",
        "environments (dm_control suite + /root/reference custom task XMLs),",
        "mapped into the native engines' state layout by the",
        "`data/exorl.py` physics adapters — the exact path real ExORL data",
        "takes at ingestion.",
        "",
        f"Rollout lengths: features {N_FEATURE_STEPS} steps, rewards",
        f"{N_REWARD_STEPS} steps, random uniform actions.",
        "",
        "## Goal-feature agreement",
        "",
        "Native `goal_features` (the inputs to every goal space in",
        "`goals/spaces.py`) vs the reference's named physics reads",
        "(`url_benchmark/goals.py:66-94`).",
        "",
        "| domain | feature | mean abs err | max abs err | ref std | corr |",
        "|---|---|---|---|---|---|",
    ]
    for (dom, name, me, mx, std, corr, _rel) in frows:
        lines.append(f"| {dom} | {name} | {me:.5f} | {mx:.5f} | {std:.3f} "
                     f"| {corr:.4f} |")
    lines += [
        "",
        "x/z/up are exact (same generalized coordinates after the adapter).",
        "vx/vz/am are COM-velocity/angular-momentum reads: masses match",
        "MuJoCo's exactly (same capsule geometry & density), inertias use",
        "the exact capsule formula, so residuals come from small COM-offset",
        "differences of composite bodies.",
        "",
        "**Quadruped** parity is at the FEATURE level: the dm_control",
        "quadruped (12 actuators, 23-dim qpos) and the native 8-joint",
        "model are different morphologies, so no state-level adapter",
        "exists; every reference quadruped goal space and task reward is",
        "a function of torso-level reads only (goals.py:97-112,",
        "custom_dmc_tasks/quadruped.py:352-536), which",
        "`data/exorl.py:mujoco_quadruped_features` maps exactly (up from",
        "the root quaternion, body-frame velocity = the torso velocimeter).",
        "The `com_z (vs root z)` row quantifies the one approximation:",
        "the reference Jump reward reads whole-robot COM height where the",
        "native layout carries root z.",
        "",
        "## Reward relabel agreement",
        "",
        "Native `reward_from_physics` on adapted states vs the reference's",
        "physics-replay relabel (`in_memory_replay_buffer.py:40-55`:",
        "set_state + task.get_reward) — the semantics used to relabel",
        "ExORL buffers.",
        "",
        "| task | mean abs err | max abs err | ref mean | ref std | corr |",
        "|---|---|---|---|---|---|",
    ]
    for (name, me, mx, rm, rs, corr) in rrows:
        c = "n/a" if np.isnan(corr) else f"{corr:.4f}"
        lines.append(f"| {name} | {me:.4f} | {mx:.4f} | {rm:.4f} | {rs:.4f} "
                     f"| {c} |")
    lines += [
        "",
        "Rewards are in [0, 1] per step; `mean abs err` is directly the",
        "average per-step reward discrepancy a relabeled buffer would see.",
        "Quadruped stand/walk/run/roll/roll_fast relabel exactly (their",
        "reads adapt exactly, see above); jump carries the COM-vs-root-z",
        "approximation.",
        "",
        "## Not covered (descoped, with reasons)",
        "",
        "* **Quadruped policy transfer**: a policy trained on the native",
        "  8-actuator quadruped cannot roll out on the 12-actuator",
        "  dm_control model (different action/observation spaces by",
        "  construction, custom_dmc_tasks/quadruped.py make_model) — the",
        "  cross-engine anchor for the 3-D domain is the feature/reward",
        "  tables above, which cover everything z-inference and relabeled",
        "  offline training consume.",
        "* **Jaco**: the reference jaco tasks are dm_control *composer*",
        "  tasks (custom_dmc_tasks/jaco.py:61-64 builds an arm+props",
        "  composer environment, not a suite XML); the composer stack's",
        "  reward machinery is callback-driven rather than",
        "  physics-replayable, and the native 6-dof reach arm is again a",
        "  reduced morphology. The native jaco rewards reuse the same",
        "  tolerance() primitives validated exactly on the other domains.",
        "",
    ]
    with open("PARITY.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote PARITY.md:",
          f"{len(frows)} feature rows, {len(rrows)} reward rows")


if __name__ == "__main__":
    main()
