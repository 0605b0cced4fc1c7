"""Workspace — env + agent + buffer + logger + checkpoint assembly, eval,
and the offline/online training drivers.

Re-designs the reference's BaseWorkspace / per-mode Workspaces
(url_benchmark/pretrain.py:209-659, train_offline.py:56-134,
anytrain.py:38-175) around fused device loops:

  * offline: N gradient steps per device launch (sampling fused in);
  * online: anytrain-style cycles — one vectorized batch of episodes per
    launch, then matched gradient steps;
  * eval: ALL eval episodes roll out in parallel under one jit (vmap over
    episodes), replacing the reference's sequential per-episode loop
    (pretrain.py:374-435).
"""

from __future__ import annotations

import dataclasses
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.registry import AGENTS, make_agent
from ..config import apply_overrides, save_config, to_flat_dict
from ..data import ReplayBuffer
from ..envs.base import Environment
from ..envs.gridworld import build_gridworld_task
from ..envs.pointmass import PointMassMaze, TASKS as _PMM_TASKS
from ..goals import get_goal_space_dim, get_reward_function, goal_spaces, goals
from ..utils import KeyChain, Stopwatch, crossed, frames_remaining
from . import checkpoint as ckpt_lib
from .logger import Logger
from .loops import OnlineTrainer, make_offline_trainer

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class WorkspaceConfig:
    """Mirror of the reference workspace Config (url_benchmark/pretrain.py:51-106,
    train_online.py:24-55)."""

    agent_name: str = "fb_ddpg"
    num_rollout_episodes: int = 10
    num_agent_updates: int = 50
    update_replay_buffer: bool = True
    task: str = "point_mass_maze_reach_top_left"
    obs_type: str = "states"  # "states" | "pixels" (reference base_config)
    frame_stack: int = 3  # pixels only (reference pretrain.py:62)
    seed: int = 1
    discount: float = 0.98
    future: float = 0.99
    goal_space: tp.Optional[str] = None
    # append the goal-space vector to observations each step (reference
    # append_goal_to_observation, pretrain.py:71 / dmc.py GoalWrapper)
    append_goal_to_observation: bool = False
    num_train_frames: int = 2_000_010
    num_grad_steps: int = 1_000_000
    num_seed_frames: int = 4000
    eval_every_steps: int = 10_000
    num_eval_episodes: int = 10
    replay_buffer_episodes: int = 5000
    checkpoint_every: int = 100_000
    num_envs: int = 4
    episode_length: tp.Optional[int] = None
    steps_per_call: int = 200
    # offline loop: materialize metrics to host only this often. Device
    # launches stay pipelined in between — on a tunneled TPU the per-call
    # host sync otherwise dominates (relay round-trip >> 200 steps of MXU
    # work).
    log_every_steps: int = 1000
    custom_reward: tp.Optional[str] = None
    # d4rl task support: path to an .npz d4rl dataset dict; used both to
    # fill the buffer (train_offline) and to build the replay-eval env
    # (envs/d4rl_replay.py; reference d4rl_benchmark.py:35-76)
    d4rl_dataset: tp.Optional[str] = None
    # spherical-mean z over this many independent reward regressions in
    # finalize/eval inference (1 = the reference single-draw protocol).
    # Default 8: draw coherence at 5,120 samples is already 0.98-0.99,
    # but on some task/checkpoint pairs the return-vs-z landscape is
    # sharp enough that draws 0.98-coherent with each other land in
    # behavior modes scoring 227 vs 963 (results/z_study/) — averaging
    # 8 draws cuts the angular jitter ~1/sqrt(8) for the cost of 8
    # small regressions. Every round-4+ battery used 8.
    z_inference_draws: int = 8
    # directed-rollout mix (train_online only): this fraction of each
    # cycle's rollout episodes uses reward-inferred task z's, HELD FIXED
    # for the whole episode, instead of fresh random z's. Random-z FB
    # rollouts on quadruped are ~stationary for any train task (1.5% of
    # frames above walk's 0.5 m/s target — results/quad_one_walk/), so
    # the replay never contains the locomotion data zero-shot walk/run
    # need; mixing in task-z episodes puts it there. The reference has
    # the same hook (solved_meta rollouts, url_benchmark/agent/
    # fb_ddpg.py:234-237) but never enables it for FB.
    rollout_task_z_ratio: float = 0.0
    # comma-separated full task names whose z's the directed episodes
    # cycle through (default: the train task)
    rollout_task_z_tasks: tp.Optional[str] = None
    # re-infer the directed z's from the replay this often
    task_z_refresh_frames: int = 100_000
    final_tests: int = 10  # episodes per task in finalize(); 0 disables
    # milestone snapshots: frames at which to save models/snapshot_<frame>
    # (reference snapshot_at, pretrain.py:77-78; e.g. "100000,500000,2000000")
    snapshot_at: tp.Tuple[int, ...] = ()
    # warm-start from a checkpoint (agent + counters, no replay —
    # reference load_model, pretrain.py:80,309-310)
    load_model: tp.Optional[str] = None
    folder: str = "exp_local"
    use_console: bool = True
    use_tb: bool = False  # TensorBoard sink (reference logger.py:161-167)
    use_wandb: bool = False  # wandb sink (reference pretrain.py:253-258)
    # save an eval rollout video every eval (reference pretrain.py:297-300,
    # 419-427; recorded from the returned physics trajectory, first episode)
    save_eval_video: bool = True
    # when set, one post-seed training cycle is captured with
    # jax.profiler.trace into this dir (viewable in TensorBoard/XProf)
    profile_dir: tp.Optional[str] = None


def make_env(task: str, episode_length: tp.Optional[int] = None) -> Environment:
    """Name-based env dispatch (reference _make_env, pretrain.py:316-325 /
    dmc.make, dmc.py:388-419)."""
    if task.startswith("grid_"):
        kwargs = {} if episode_length is None else {
            "max_episode_length": episode_length}
        return build_gridworld_task(task[len("grid_"):], **kwargs)
    if task.startswith("point_mass_maze_"):
        sub = task[len("point_mass_maze_"):]
        if sub not in _PMM_TASKS and sub != "multi_goal":
            raise ValueError(f"Unknown point-mass task {sub}")
        return PointMassMaze(sub if sub in _PMM_TASKS else "reach_top_left",
                             episode_length=episode_length or 1000)
    domain = task.split("_", 1)[0]
    if domain == "quadruped":
        from ..envs import quadruped
        return quadruped.make(task, episode_length=episode_length or 1000)
    if domain == "jaco":
        from ..envs import jaco
        return jaco.make(task, episode_length=episode_length or 250)
    if domain in ("walker", "cheetah", "hopper"):
        from ..envs import locomotion
        return locomotion.make(task, episode_length=episode_length or 1000)
    raise ValueError(f"Unknown task {task!r}")


class Workspace:
    def __init__(self, cfg: WorkspaceConfig,
                 agent_cfg_overrides: tp.Sequence[str] = (),
                 agent_cfg_base: tp.Optional[tp.Dict[str, tp.Any]] = None
                 ) -> None:
        self.cfg = cfg
        self.keys = KeyChain(cfg.seed)
        self.work_dir = Path(cfg.folder)
        self.work_dir.mkdir(parents=True, exist_ok=True)

        if cfg.obs_type == "pixels":
            from ..envs.pixels import make_pixel_env
            self.env: Environment = make_pixel_env(
                cfg.task, frame_stack=cfg.frame_stack,
                episode_length=cfg.episode_length)
        elif cfg.task.startswith("d4rl_"):
            # replay-eval env over the converted dataset (reference
            # D4RLWrapper dispatch, pretrain.py:316-325)
            from ..envs.d4rl_replay import D4RLReplayEnv
            if cfg.d4rl_dataset is None:
                raise ValueError("d4rl_* tasks need d4rl_dataset=<path.npz>")
            self.env = D4RLReplayEnv.from_npz(
                cfg.task[len("d4rl_"):], cfg.d4rl_dataset)
        else:
            self.env = make_env(cfg.task, cfg.episode_length)
        self.domain = cfg.task.split("_", 1)[0]
        if self.domain == "point":
            self.domain = "point_mass_maze"

        # goal space -> goal_fn over physics + goal dim
        self.goal_fn: tp.Optional[tp.Callable[[Array], Array]] = None
        goal_dim: tp.Optional[int] = None
        if cfg.goal_space is not None:
            space_fns = goal_spaces.funcs.get(self.domain, {})
            if cfg.goal_space not in space_fns:
                raise ValueError(
                    f"Unknown goal space {cfg.goal_space} for {self.domain}")
            space_fn = space_fns[cfg.goal_space]
            feats_fn = getattr(self.env, "goal_features", lambda p: p)
            # jitted: host callers (eval diagnostics, relabeling) hand it
            # 10k-row batches — eager dispatch through a tunneled TPU would
            # pay one relay round trip per op
            self.goal_fn = jax.jit(lambda phys: space_fn(feats_fn(phys)))
            goal_dim = get_goal_space_dim(cfg.goal_space)
            if cfg.append_goal_to_observation:
                from ..envs.wrappers import GoalAppendWrapper
                self.env = GoalAppendWrapper(
                    self.env, self.goal_fn, append_goal_to_observation=True)

        agent_cfg_cls, _ = AGENTS[cfg.agent_name]
        field_names = {f.name for f in dataclasses.fields(agent_cfg_cls)}
        cfg_kwargs = ({"goal_space": cfg.goal_space}
                      if "goal_space" in field_names else {})
        base_agent_cfg = agent_cfg_cls(**cfg_kwargs)
        if agent_cfg_base:
            # resumed folder: the saved run's resolved agent config is the
            # base (a run trained with e.g. agent.z_dim=100 must rebuild
            # the same network shapes before checkpoint restore); CLI
            # agent.* overrides still win below
            fixed = {k: tuple(v) if isinstance(v, list) else v
                     for k, v in agent_cfg_base.items()
                     if k in field_names}
            base_agent_cfg = dataclasses.replace(base_agent_cfg, **fixed)
        agent_cfg = apply_overrides(base_agent_cfg,
                                    list(agent_cfg_overrides))
        self.agent_cfg = agent_cfg
        if cfg.obs_type == "pixels":
            if not hasattr(agent_cfg, "obs_type"):
                raise ValueError(
                    f"Agent {cfg.agent_name!r} has no pixels path")
            agent_cfg = dataclasses.replace(agent_cfg, obs_type="pixels")
        self.agent = make_agent(cfg.agent_name, agent_cfg, self.env.spec,
                                goal_dim)
        self.agent_state = self.agent.init(self.keys.next())

        self.buffer = ReplayBuffer(
            max_episodes=cfg.replay_buffer_episodes, discount=cfg.discount,
            future=cfg.future,
            max_episode_length=self.env.spec.episode_length)
        # honor the DDPG family's nstep (the reference carries nstep=3 in
        # DDPGConfig from ExORL but its in-memory buffer ignores it; the
        # ExORL disk loader — the pipeline that generated the published
        # exploration datasets — applies it, so we do too)
        nstep = int(getattr(self.agent.cfg, "nstep", 1) or 1)
        if nstep > 1:
            self.buffer.cfg = self.buffer.cfg.replace(nstep=nstep)
        self.logger = Logger(self.work_dir, use_console=cfg.use_console,
                             use_tb=cfg.use_tb, use_wandb=cfg.use_wandb,
                             wandb_config=dataclasses.asdict(cfg))
        self._video_recorder: tp.Optional[tp.Any] = None
        self._profiled = False
        self.timer = Stopwatch()
        self.global_step = 0
        self.global_episode = 0
        self._eval_fn: tp.Optional[tp.Callable] = None
        self._phys_feats_fn: tp.Optional[tp.Callable] = None
        self.eval_rewards_history: tp.List[float] = []

        # persist the RESOLVED agent config alongside the workspace fields
        # (flattened agent.* keys): folder resume / serve must rebuild the
        # exact network shapes the checkpoint was trained with, not the
        # agent-class defaults
        save_config(cfg, str(self.work_dir / "config.json"),
                    extra=to_flat_dict(agent_cfg, "agent."))
        if (self.work_dir / "models" / "latest").exists():
            self.load_checkpoint(self.work_dir / "models" / "latest")
        elif cfg.load_model is not None:
            self.load_checkpoint(Path(cfg.load_model), exclude=["replay"])

    # -- eval -----------------------------------------------------------
    def _init_eval_meta(self) -> tp.Dict[str, Array]:
        """Eval-time meta selection (reference _init_eval_meta,
        pretrain.py:147-206). Returns an (unbatched) meta dict; z-style
        agents get {meta_key: z}, skill agents a sampled skill, plain DDPG
        an empty dict."""
        agent, state = self.agent, self.agent_state
        meta_key = getattr(agent, "meta_key", None)
        can_goal = hasattr(agent, "get_goal_meta") and meta_key is not None
        # either regression API counts: (obs, r) or the SVD family's
        # action-conditioned (obs, a, r) (reference pretrain.py:177-186)
        can_infer = meta_key is not None and (
            hasattr(agent, "infer_meta_from_obs_and_rewards")
            or hasattr(agent, "infer_meta_from_obs_action_and_rewards"))
        # gridworld: goal-obs path
        if hasattr(self.env, "get_goal_obs") and can_goal:
            env_state, _ = self.env.reset(self.keys.next())
            z = agent.get_goal_meta(state, self.env.get_goal_obs(env_state))
            return {meta_key: z}
        # custom reward with a registered goal
        if self.cfg.custom_reward is not None:
            reward = get_reward_function(self.cfg.custom_reward, self.cfg.seed)
            if self.cfg.goal_space is not None and can_goal:
                try:
                    g = reward.get_goal(self.cfg.goal_space)
                    return {meta_key: agent.get_goal_meta(state, jnp.asarray(g))}
                except (NotImplementedError, ValueError):
                    pass
            if len(self.buffer) > 0 and can_infer:
                return {meta_key: self._infer_meta_from_replay(reward)}
        # registered goal for (goal_space, task)
        if self.cfg.goal_space is not None and can_goal:
            space_goals = goals.funcs.get(self.cfg.goal_space, {})
            if self.cfg.task in space_goals:
                g = space_goals[self.cfg.task]()
                return {meta_key: agent.get_goal_meta(state, jnp.asarray(g))}
        # fallback: reward regression over replay samples
        if len(self.buffer) > 0 and can_infer:
            return {meta_key: self._infer_meta_from_replay(None)}
        return dict(agent.init_meta(state, self.keys.next()))

    def _infer_meta_from_replay(self, custom_reward: tp.Optional[tp.Any],
                                draws: tp.Optional[int] = None) -> Array:
        """z regression over num_inference_steps relabeled samples:
        z = rᵀB/N for FB-style agents, lstsq(φ(s[,a]), r) for SF/SVD —
        action-conditioned dispatch for the SVD family (reference
        pretrain.py:166-184 and the SVD branch :177-180).

        ``draws`` > 1 returns the norm-preserving spherical mean of that
        many independent regressions (cfg.z_inference_draws by default;
        1 = the reference's single-draw protocol). Sampling noise of a
        single draw is usually small (coherence ~0.99 on walker buffers)
        but multimodal buffers benefit from averaging."""
        agent, state = self.agent, self.agent_state
        n = getattr(agent.cfg, "num_inference_steps", 5120)
        draws = self.cfg.z_inference_draws if draws is None else draws

        def one_draw() -> Array:
            batch = self.buffer.sample(
                self.keys.next(), n,
                custom_reward=(custom_reward.from_physics
                               if custom_reward else None))
            obs = batch.next_obs if (self.cfg.goal_space is None
                                     or batch.next_goal is None
                                     ) else batch.next_goal
            if hasattr(agent, "infer_meta_from_obs_action_and_rewards"):
                return agent.infer_meta_from_obs_action_and_rewards(
                    state, obs, batch.action, batch.reward)
            return agent.infer_meta_from_obs_and_rewards(state, obs,
                                                         batch.reward)

        if draws <= 1:
            return one_draw()
        zs = np.stack([np.asarray(one_draw()) for _ in range(draws)])
        unit = zs / np.maximum(
            np.linalg.norm(zs, axis=-1, keepdims=True), 1e-12)
        mean = unit.mean(0)
        mean = mean / max(float(np.linalg.norm(mean)), 1e-12)
        return jnp.asarray(mean * np.linalg.norm(zs[0]), zs.dtype)

    def _make_eval_fn(self) -> tp.Callable:
        env, agent = self.env, self.agent
        T = env.spec.episode_length
        # pixel obs trajectories would be ~100s of MB per eval; diagnostics
        # that need per-step observations are states-only
        keep_obs = not env.spec.obs_shape

        def one_episode(state: tp.Any, meta: tp.Dict[str, Array],
                        key: jax.Array) -> tp.Tuple[Array, Array, Array]:
            k_reset, _ = jax.random.split(key)
            env_state, ts = env.reset(k_reset)
            meta_b = jax.tree.map(lambda x: x[None], meta)

            def body(carry, _):
                env_state, ts, total = carry
                action = agent.policy_act(state, ts.observation[None],
                                          meta_b, jnp.asarray(10**9), key,
                                          eval_mode=True)
                a = action[0]
                env_state, ts = env.step(env_state, a)
                out = (ts.physics, ts.observation if keep_obs else None)
                return (env_state, ts, total + ts.reward), out

            (env_state, ts, total), (physics, obs) = jax.lax.scan(
                body, (env_state, ts, jnp.zeros(())), None, length=T)
            return total, physics, (obs if keep_obs else ts.observation)

        def eval_all(state_: tp.Any, meta: tp.Dict[str, Array],
                     keys: jax.Array):
            return jax.vmap(one_episode, in_axes=(None, None, 0))(
                state_, meta, keys)

        return jax.jit(eval_all)

    def _base_env(self) -> Environment:
        env = self.env
        while hasattr(env, "env"):
            env = env.env
        return env

    def _record_eval_video(self, physics: np.ndarray) -> None:
        """Save the first eval episode as a video file (reference saves an
        eval video every eval, pretrain.py:297-300,419-427; video.py:14-66).
        Frames are strided so a video is at most ~250 frames."""
        from .video import Renderer, VideoRecorder
        if self._video_recorder is None:
            self._video_recorder = VideoRecorder(
                self.work_dir, Renderer(self.domain, self._base_env()))
        stride = max(1, physics.shape[0] // 250)
        self._video_recorder.frames = []
        self._video_recorder.enabled = True
        self._video_recorder.record_trajectory(physics[::stride])
        self._video_recorder.save(f"{self.global_step}.mp4")
        self.logger.log_video("eval/video", self._video_recorder.frames,
                              self.global_step)

    def evaluate(self) -> tp.Dict[str, float]:
        if self._eval_fn is None:
            self._eval_fn = self._make_eval_fn()
        meta = self._init_eval_meta()
        keys = jax.random.split(self.keys.next(), self.cfg.num_eval_episodes)
        totals, physics, obs = self._eval_fn(self.agent_state, meta, keys)
        totals = np.asarray(totals)
        phys = np.asarray(physics)  # [episodes, T, phys_dim]
        if self.cfg.custom_reward is not None:
            reward = get_reward_function(self.cfg.custom_reward, self.cfg.seed)
            r = reward.from_physics(phys.reshape(-1, phys.shape[-1]))
            totals = np.asarray(r).reshape(phys.shape[0], phys.shape[1]).sum(1)
        metrics = {
            "episode_reward": float(totals.mean()),
            "episode_length": float(self.env.spec.episode_length),
            "episode": float(self.global_episode),
            "step": float(self.global_step),
        }
        if totals.size > 1:
            metrics["episode_reward#std"] = float(totals.std())
        base_env = self._base_env()
        if hasattr(base_env, "get_normalized_score"):
            # reference pretrain.py:413-414: one normalized score per
            # eval episode, logged as the mean
            metrics["normalized_score"] = float(np.mean(
                [base_env.get_normalized_score(t) for t in totals]))
        meta_key = getattr(self.agent, "meta_key", None)
        if meta_key in meta:
            metrics["z_norm"] = float(np.linalg.norm(np.asarray(meta[meta_key])))
        metrics.update(self._eval_diagnostics(meta, phys, obs))
        # physics stats in every eval dump (reference PhysicsAggregator,
        # dmc.py:460-477, logged pretrain.py:404-417)
        from .physics_stats import PhysicsAggregator
        if self._phys_feats_fn is None:
            raw = getattr(self._base_env(), "goal_features", None)
            self._phys_feats_fn = None if raw is None else jax.jit(raw)
        agg = PhysicsAggregator(self.domain, features_fn=self._phys_feats_fn)
        agg.add_batch(phys.reshape(-1, phys.shape[-1]))
        metrics.update({k: v for k, v in agg.dump()})
        if self.cfg.save_eval_video:
            self._record_eval_video(phys[0])
        self.eval_rewards_history.append(metrics["episode_reward"])
        with self.logger.log_and_dump_ctx(self.global_step, ty="eval") as log:
            for k, v in metrics.items():
                log(k, v)
        return metrics

    def _eval_diagnostics(self, meta: tp.Dict[str, Array], phys: np.ndarray,
                          obs: tp.Any) -> tp.Dict[str, float]:
        """FB health diagnostics, batched over the whole eval rollout set
        (reference z_correl/actor_success, fb_ddpg.py:269-289 +
        pretrain.py:410-413; gated by agent.cfg.additional_metric)."""
        agent, state = self.agent, self.agent_state
        if not (getattr(agent.cfg, "additional_metric", False)
                and hasattr(agent, "compute_z_correl") and "z" in meta):
            return {}
        T = phys.shape[1]
        flat_phys = jnp.asarray(phys.reshape(-1, phys.shape[-1]))
        out: tp.Dict[str, float] = {}
        obs_flat = None
        if isinstance(obs, jnp.ndarray) and obs.ndim == 3:
            obs_flat = obs.reshape(-1, obs.shape[-1])
        goals = (self.goal_fn(flat_phys) if self.goal_fn is not None
                 else obs_flat)
        if goals is not None:
            # reference accumulates one dot per step and divides by
            # episodes — i.e. T × the per-step mean
            out["z_correl"] = float(agent.compute_z_correl(
                state, goals, meta["z"])) * T
        if obs_flat is not None and hasattr(agent, "compute_actor_success"):
            out["actor_success"] = float(agent.compute_actor_success(
                state, obs_flat, meta["z"], self.keys.next()))
        return out

    def eval_maze_goals(self) -> tp.Dict[str, float]:
        """20-goal maze sweep: per-goal reward and distance
        (reference eval_maze_goals, pretrain.py:339-372)."""
        from ..goals.rewards import MazeMultiGoal
        if self._eval_fn is None:
            self._eval_fn = self._make_eval_fn()
        mg = MazeMultiGoal()
        rewards, distances = [], []
        meta_key = getattr(self.agent, "meta_key", "z")
        for goal in mg.goals:
            z = self.agent.get_goal_meta(self.agent_state, jnp.asarray(goal))
            keys = jax.random.split(self.keys.next(), 2)
            _, physics, _ = self._eval_fn(self.agent_state, {meta_key: z},
                                          keys)
            achieved = np.asarray(physics)[..., :2]  # [episodes, T, 2]
            r, d = mg.from_goal(achieved[:, -1], goal[None])
            rewards.append(float(np.mean(r)))
            distances.append(float(np.mean(d)))
        metrics = {
            "reward": float(np.mean(rewards)),
            "distance": float(np.mean(distances)),
            "step": float(self.global_step),
        }
        with self.logger.log_and_dump_ctx(self.global_step, ty="eval") as log:
            for k, v in metrics.items():
                log(k, v)
        return metrics

    def finalize(self) -> tp.Dict[str, tp.List[float]]:
        """Final multi-task test battery: re-eval the agent on every task
        of the domain with relabeled rewards, writing test_rewards.json
        (reference finalize, pretrain.py:496-533; gated by final_tests,
        called at the end of every train loop like the reference's)."""
        import json
        from ..envs import locomotion
        repeat = self.cfg.final_tests
        if not repeat:
            return {}
        if self.cfg.custom_reward == "maze_multi_goal":
            metrics = self.eval_maze_goals()
            rewards = {"rewards": [metrics["reward"]]}
            (self.work_dir / "test_rewards.json").write_text(json.dumps(rewards))
            return rewards
        domain_tasks = {
            "cheetah": ["walk", "walk_backward", "run", "run_backward"],
            "quadruped": ["stand", "walk", "run", "jump"],
            "walker": ["stand", "walk", "run", "flip"],
            "hopper": ["stand", "hop", "hop_backward", "flip"],
        }
        if self.domain not in domain_tasks:
            return {}
        if not ((hasattr(self.agent, "infer_meta_from_obs_and_rewards")
                 or hasattr(self.agent, "infer_meta_from_obs_action_and_rewards"))
                and len(self.buffer) > 0
                and "physics" in self.buffer.state.storage):
            return {}
        if self._eval_fn is None:
            self._eval_fn = self._make_eval_fn()
        eval_hist = self.eval_rewards_history
        rewards: tp.Dict[str, tp.List[float]] = {}
        if self.domain == "quadruped":
            from ..envs import quadruped as _quad
            known = _quad.TASKS
        else:
            known = locomotion.TASKS.get(self.domain, [])
        for name in domain_tasks[self.domain]:
            task = f"{self.domain}_{name}"
            if name not in known:
                continue
            reward_fn = get_reward_function(task, self.cfg.seed)
            meta_key = getattr(self.agent, "meta_key", "z")
            z = self._infer_meta_from_replay(reward_fn)
            keys = jax.random.split(self.keys.next(), repeat)
            _, physics, _ = self._eval_fn(self.agent_state, {meta_key: z},
                                          keys)
            phys = np.asarray(physics)
            r = reward_fn.from_physics(phys.reshape(-1, phys.shape[-1]))
            per_episode = np.asarray(r).reshape(phys.shape[0],
                                                phys.shape[1]).sum(1)
            rewards[task] = [float(x) for x in per_episode]
        self.eval_rewards_history = eval_hist
        (self.work_dir / "test_rewards.json").write_text(json.dumps(rewards))
        return rewards

    # -- checkpointing ---------------------------------------------------
    def _maybe_snapshot(self, prev_step: int) -> None:
        """Save milestone snapshots for frames crossed since prev_step
        (reference pretrain.py:610-611; loops advance in chunks here)."""
        for frame in self.cfg.snapshot_at:
            if prev_step < frame <= self.global_step:
                self.save_checkpoint(
                    self.work_dir / "models" / f"snapshot_{frame}")

    def save_checkpoint(self, path: tp.Optional[Path] = None,
                        exclude: tp.Sequence[str] = ()) -> None:
        path = path or (self.work_dir / "models" / "latest")
        path.parent.mkdir(parents=True, exist_ok=True)
        ckpt_lib.save_checkpoint(path, {
            "agent": self.agent_state,
            "replay": self.buffer.state,
            "global_step": self.global_step,
            "global_episode": self.global_episode,
        }, exclude=exclude)

    def _profile_ctx(self) -> tp.ContextManager[tp.Any]:
        """One-shot jax.profiler capture of a post-seed training cycle
        (SURVEY §5 tracing; trace opens in TensorBoard/XProf)."""
        import contextlib
        if (self.cfg.profile_dir and not self._profiled
                and self.global_step >= self.cfg.num_seed_frames):
            self._profiled = True
            return jax.profiler.trace(self.cfg.profile_dir)
        return contextlib.nullcontext()

    def load_checkpoint(self, path: Path,
                        only: tp.Optional[tp.Sequence[str]] = None,
                        exclude: tp.Sequence[str] = ()) -> None:
        out = ckpt_lib.load_checkpoint(path, {"agent": self.agent_state},
                                       only=only, exclude=exclude)
        if "agent" in out:
            self.agent_state = out["agent"]
        if "replay" in out:
            self.buffer.state = out["replay"]
        if only is None or "global_step" in (only or ()):
            self.global_step = out["global_step"]
            self.global_episode = out["global_episode"]


class OfflineWorkspace(Workspace):
    """Pure gradient-step training over a loaded buffer
    (reference train_offline.py:101-134)."""

    def _make_offline_trainer(self) -> tp.Callable:
        """Trainer-construction hook; the multi-host workspace overrides
        this with a mesh-sharded trainer (train_multihost.py)."""
        trainer = make_offline_trainer(
            self.agent, self.buffer.cfg, self.agent.cfg.batch_size,
            steps_per_call=self.cfg.steps_per_call)
        return lambda state, key: trainer(state, self.buffer.state, key)

    def train(self) -> None:
        cfg = self.cfg
        assert len(self.buffer) > 0, "offline training requires a loaded buffer"
        trainer = self._make_offline_trainer()
        log_every = max(cfg.log_every_steps, cfg.steps_per_call)
        steps_since_log = 0
        while self.global_step < cfg.num_grad_steps:
            prev_step = self.global_step
            with self._profile_ctx():
                self.agent_state, metrics = trainer(
                    self.agent_state, self.keys.next())
            self.global_step += cfg.steps_per_call
            steps_since_log += cfg.steps_per_call
            self._maybe_snapshot(prev_step)
            if steps_since_log >= log_every:
                # metrics stay on device between logs so launches pipeline;
                # float() here is the only host sync
                elapsed, total = self.timer.lap()
                with self.logger.log_and_dump_ctx(self.global_step,
                                                  "train") as log:
                    log("fps", steps_since_log / max(elapsed, 1e-9))
                    log("total_time", total)
                    log("step", self.global_step)
                    for k, v in metrics.items():
                        log(k, float(v))
                steps_since_log = 0
            if crossed(self.global_step, cfg.eval_every_steps,
                       cfg.steps_per_call):
                self.evaluate()
            if crossed(self.global_step, cfg.checkpoint_every,
                       cfg.steps_per_call):
                self.save_checkpoint()
        if steps_since_log:
            elapsed, total = self.timer.lap()
            with self.logger.log_and_dump_ctx(self.global_step, "train") as log:
                log("fps", steps_since_log / max(elapsed, 1e-9))
                log("total_time", total)
                log("step", self.global_step)
                for k, v in metrics.items():
                    log(k, float(v))
        self.save_checkpoint()
        self.finalize()


class OnlineWorkspace(Workspace):
    """anytrain-style online loop (reference anytrain.py:133-164),
    vectorized over cfg.num_envs env instances."""

    def train(self) -> None:
        cfg = self.cfg
        trainer = OnlineTrainer(
            self.env, self.agent, self.buffer, num_envs=cfg.num_envs,
            goal_fn=self.goal_fn,
            updates_per_step=1.0 / max(1, getattr(self.agent.cfg,
                                                  "update_every_steps", 2)))
        trainer.global_step = self.global_step
        trainer.global_episode = self.global_episode
        T = self.env.spec.episode_length
        steps_per_cycle = T * cfg.num_envs
        while frames_remaining(self.global_step,
                               cfg.num_train_frames) > 0:
            warmup = self.global_step < cfg.num_seed_frames
            if warmup:
                trainer_updates, trainer.updates_per_step = trainer.updates_per_step, 0.0
            with self._profile_ctx():
                self.agent_state, metrics = trainer.run_cycle(
                    self.agent_state, self.keys.next())
            if warmup:
                trainer.updates_per_step = trainer_updates
            prev_step, self.global_step = self.global_step, trainer.global_step
            self.global_episode = trainer.global_episode
            self._maybe_snapshot(prev_step)
            elapsed, total = self.timer.lap()
            with self.logger.log_and_dump_ctx(self.global_step, "train") as log:
                log("fps", steps_per_cycle / max(elapsed, 1e-9))
                log("total_time", total)
                log("step", self.global_step)
                log("episode", self.global_episode)
                log("buffer_size", len(self.buffer))
                for k, v in metrics.items():
                    log(k, float(v))
            if crossed(self.global_step, cfg.eval_every_steps,
                       steps_per_cycle):
                self.evaluate()
            if crossed(self.global_step, cfg.checkpoint_every,
                       steps_per_cycle):
                self.save_checkpoint()
        self.save_checkpoint()
        self.finalize()


class TrainOnlineWorkspace(Workspace):
    """Episode-granular online loop: roll out num_rollout_episodes, then
    run num_agent_updates gradient steps (reference train_online.Workspace,
    url_benchmark/train_online.py:59-154). ``update_replay_buffer=False``
    trains from a frozen pre-loaded buffer while still evaluating online
    (reference :65-68)."""

    def train(self) -> None:
        from .loops import OnlineTrainer, make_offline_trainer
        cfg = self.cfg
        T = self.env.spec.episode_length
        # directed-rollout mix: split the cycle's episodes into a random-z
        # collector and a held-task-z collector (static split — two small
        # compiled programs instead of a traced per-env branch)
        n_task = int(round(cfg.rollout_task_z_ratio
                           * cfg.num_rollout_episodes))
        n_task = min(max(n_task, 0), cfg.num_rollout_episodes)
        n_rand = cfg.num_rollout_episodes - n_task
        collector = OnlineTrainer(
            self.env, self.agent, self.buffer,
            num_envs=n_rand or cfg.num_rollout_episodes,
            goal_fn=self.goal_fn,
            updates_per_step=0.0) if n_rand else None
        task_collector = OnlineTrainer(
            self.env, self.agent, self.buffer, num_envs=n_task,
            goal_fn=self.goal_fn, updates_per_step=0.0,
            hold_meta=True) if n_task else None
        task_names = ([s.strip() for s in cfg.rollout_task_z_tasks.split(",")
                       if s.strip()] if cfg.rollout_task_z_tasks
                      else [cfg.task])
        task_zs: tp.Optional[np.ndarray] = None  # [len(task_names), z_dim]
        last_refresh = -(10 ** 12)
        meta_key = getattr(self.agent, "meta_key", "z")
        trainer = make_offline_trainer(
            self.agent, self.buffer.cfg, self.agent.cfg.batch_size,
            steps_per_call=cfg.num_agent_updates)
        steps_per_cycle = T * cfg.num_rollout_episodes
        while frames_remaining(self.global_step,
                               cfg.num_train_frames) > 0:
            prev_step = self.global_step
            if cfg.update_replay_buffer:
                metrics = {}
                if collector is not None:
                    collector.global_step = self.global_step
                    self.agent_state, m = collector.run_cycle(
                        self.agent_state, self.keys.next())
                    metrics.update(m)
                    self.global_step += T * n_rand
                    self.global_episode += n_rand
                if task_collector is not None:
                    can_infer = (len(self.buffer) > 0
                                 and self.global_step >= cfg.num_seed_frames)
                    task_meta = None
                    if can_infer:
                        if (task_zs is None or self.global_step - last_refresh
                                >= cfg.task_z_refresh_frames):
                            task_zs = np.stack([
                                np.asarray(self._infer_meta_from_replay(
                                    get_reward_function(t, cfg.seed)))
                                for t in task_names])
                            last_refresh = self.global_step
                        task_meta = {meta_key: jnp.asarray(np.stack(
                            [task_zs[i % len(task_names)]
                             for i in range(n_task)]))}
                    # before the buffer can support inference the directed
                    # slots fall back to (held) random z's
                    task_collector.global_step = self.global_step
                    self.agent_state, m2 = task_collector.run_cycle(
                        self.agent_state, self.keys.next(), meta=task_meta)
                    if can_infer:
                        metrics["task_episode_reward"] = m2["episode_reward"]
                    metrics.setdefault("episode_reward",
                                       m2["episode_reward"])
                    self.global_step += T * n_task
                    self.global_episode += n_task
            else:
                metrics = {}
                self.global_step += steps_per_cycle
            self._maybe_snapshot(prev_step)
            if len(self.buffer) > 0:
                self.agent_state, m = trainer(
                    self.agent_state, self.buffer.state, self.keys.next())
                metrics.update({k: float(v) for k, v in m.items()})
            elapsed, total = self.timer.lap()
            with self.logger.log_and_dump_ctx(self.global_step, "train") as log:
                log("fps", steps_per_cycle / max(elapsed, 1e-9))
                log("total_time", total)
                log("step", self.global_step)
                log("episode", self.global_episode)
                for k, v in metrics.items():
                    log(k, float(v))
            if crossed(self.global_step, cfg.eval_every_steps,
                       steps_per_cycle):
                self.evaluate()
            if crossed(self.global_step, cfg.checkpoint_every,
                       steps_per_cycle):
                self.save_checkpoint()
        self.save_checkpoint()
        self.finalize()
