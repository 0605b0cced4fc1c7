"""Goal-conditioned baseline agents: GoalTD3 and GoalSM.

  * GoalTD3Agent (url_benchmark/agent/goal_td3.py): supervised
    goal-conditioned TD3 — goal-conditioned twin critic (:68-113), trained
    against MazeMultiGoal.from_goal tolerance rewards with uniform-goal or
    replay-goal sampling plus hindsight future-goal relabeling (:373-451);
    optional fb_reward mode scoring with a frozen φ and inv_cov (:425-429).
  * GoalSMAgent (url_benchmark/agent/goal_sm.py): goal-conditioned
    successor-measure agent — desired goals are random achieved goals from
    replay via meta (:168-177); the critic loss has an off-diagonal TD term
    plus a −Q(s, achieved_goal, a) diagonal bonus (:225-260).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from ..data.episode_batch import EpisodeBatch
from ..models.networks import mlp
from ..ops.tolerance import tolerance
from ..utils.distributions import TruncatedNormal
from ..utils.schedules import schedule
from ..utils.tree import soft_update
from .base import MetaDict, ZMetaMixin

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT

# the 20 maze goals (reference MazeMultiGoal, url_benchmark/goals.py:371-399)
_MAZE_GOALS = np.array([
    [-0.15, 0.15], [-0.22, 0.22], [-0.08, 0.08], [-0.22, 0.08], [-0.08, 0.22],
    [0.15, 0.15], [0.22, 0.22], [0.08, 0.08], [0.22, 0.08], [0.08, 0.22],
    [-0.15, -0.15], [-0.22, -0.22], [-0.08, -0.08], [-0.22, -0.08], [-0.08, -0.22],
    [0.15, -0.15], [0.22, -0.22], [0.08, -0.08], [0.22, -0.08], [0.08, -0.22],
], np.float32)


def maze_goal_reward(achieved: Array, desired: Array) -> Array:
    """tolerance reward on goal distance (reference goals.py:404-412),
    jittable."""
    dist = jnp.linalg.norm(achieved - desired, axis=-1)
    return tolerance(dist, bounds=(0.0, 0.03), margin=0.03)[..., None]


class GoalActor(nn.Module):
    action_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, obs: Array, goal: Array) -> Array:
        h = mlp(self.hidden_dim, "ntanh")(jnp.concatenate([obs, goal], -1))
        return jnp.tanh(mlp(self.hidden_dim, "irelu", self.action_dim)(h))


class GoalCritic(nn.Module):
    """Twin Q over (obs, goal, action) (reference goal_td3.py:68-113)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, obs: Array, goal: Array, action: Array
                 ) -> tp.Tuple[Array, Array]:
        h = mlp(self.hidden_dim, "ntanh")(
            jnp.concatenate([obs, goal, action], -1))
        q1 = mlp(self.hidden_dim, "irelu", 1)(h)
        q2 = mlp(self.hidden_dim, "irelu", 1)(h)
        return q1, q2


class GoalTrainState(struct.PyTreeNode):
    step: Array
    actor_params: tp.Any
    critic_params: tp.Any
    target_critic_params: tp.Any
    actor_opt_state: tp.Any
    critic_opt_state: tp.Any


@dataclasses.dataclass(frozen=True)
class GoalTD3Config:
    """Mirror of GoalTD3AgentConfig (url_benchmark/agent/goal_td3.py:30-60)."""

    name: str = "goal_td3"
    lr: float = 1e-4
    critic_target_tau: float = 0.01
    update_every_steps: int = 2
    hidden_dim: int = 1024
    feature_dim: int = 512
    stddev_schedule: str = "0.2"
    stddev_clip: float = 0.3
    batch_size: int = 1024
    goal_space: tp.Optional[str] = None
    supervised: bool = True  # uniform maze goals vs replay goals
    future_ratio: float = 0.0
    fb_reward: bool = False
    num_expl_steps: int = 0
    compute_dtype: str = "float32"


class GoalTD3Agent(ZMetaMixin):
    meta_key = "g"

    def __init__(self, cfg: GoalTD3Config, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.goal_dim = goal_dim if goal_dim is not None else 2
        self.actor = GoalActor(action_dim=action_dim, hidden_dim=cfg.hidden_dim)
        self.critic = GoalCritic(hidden_dim=cfg.hidden_dim)
        self.actor_opt = optax.adam(cfg.lr)
        self.critic_opt = optax.adam(cfg.lr)
        self._stddev = schedule(cfg.stddev_schedule)
        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))

    def init(self, key: jax.Array) -> GoalTrainState:
        k_a, k_c = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_dim))
        goal = jnp.zeros((1, self.goal_dim))
        action = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k_a, obs, goal)
        critic_params = self.critic.init(k_c, obs, goal, action)
        return GoalTrainState(
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=jax.tree.map(jnp.copy, critic_params),
            actor_opt_state=self.actor_opt.init(actor_params),
            critic_opt_state=self.critic_opt.init(critic_params),
        )

    # -- meta ------------------------------------------------------------
    def init_meta(self, state: GoalTrainState, key: jax.Array) -> MetaDict:
        idx = jax.random.randint(key, (), 0, len(_MAZE_GOALS))
        return {"g": jnp.asarray(_MAZE_GOALS)[idx]}

    def update_meta(self, state, meta, global_step, key):
        return meta

    def get_goal_meta(self, state: GoalTrainState, goal: Array) -> Array:
        return goal

    # -- acting ----------------------------------------------------------
    def _act(self, state: GoalTrainState, obs: Array, goal: Array,
             step: Array, key: jax.Array, eval_mode: bool = False) -> Array:
        mu = self.actor.apply(state.actor_params, obs, goal)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_s, k_e = jax.random.split(key)
        action = dist.sample(k_s)
        expl = jax.random.uniform(k_e, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    # -- update ----------------------------------------------------------
    def _update(self, state: GoalTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[GoalTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_goal, k_fut, k_c, k_a = jax.random.split(key, 4)
        n = batch.obs.shape[0]
        achieved = batch.next_goal if batch.next_goal is not None else batch.next_obs
        future_goal = (batch.future_goal if cfg.goal_space is not None
                       else batch.future_obs)

        if cfg.supervised:
            idx = jax.random.randint(k_goal, (n,), 0, len(_MAZE_GOALS))
            desired = jnp.asarray(_MAZE_GOALS)[idx]
        else:
            desired = achieved[jax.random.permutation(k_goal, n)]
        if cfg.future_ratio > 0 and future_goal is not None:
            mask = jax.random.uniform(k_fut, (n, 1)) < cfg.future_ratio
            desired = jnp.where(mask, future_goal[..., :desired.shape[-1]],
                                desired)
        reward = maze_goal_reward(achieved, desired)
        metrics: tp.Dict[str, Array] = {"batch_reward": reward.mean()}

        def critic_loss_fn(critic_params: tp.Any) -> tp.Tuple[Array, tp.Dict[str, Array]]:
            mu = self.actor.apply(state.actor_params, batch.next_obs, desired)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            next_action = jax.lax.stop_gradient(
                dist.sample(k_c, clip=cfg.stddev_clip))
            tq1, tq2 = self.critic.apply(state.target_critic_params,
                                         batch.next_obs, desired, next_action)
            target_q = jax.lax.stop_gradient(
                reward + batch.discount * jnp.minimum(tq1, tq2))
            q1, q2 = self.critic.apply(critic_params, batch.obs, desired,
                                       batch.action)
            loss = (jnp.mean(jnp.square(q1 - target_q))
                    + jnp.mean(jnp.square(q2 - target_q)))
            return loss, {"critic_loss": loss, "critic_q1": q1.mean()}

        (c_loss, c_metrics), c_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(state.critic_params)
        c_updates, critic_opt_state = self.critic_opt.update(
            c_grads, state.critic_opt_state, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)
        metrics.update(c_metrics)

        def actor_loss_fn(actor_params: tp.Any) -> Array:
            mu = self.actor.apply(actor_params, batch.obs, desired)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            action = dist.sample(k_a, clip=cfg.stddev_clip)
            q1, q2 = self.critic.apply(critic_params, batch.obs, desired,
                                       action)
            return -jnp.mean(jnp.minimum(q1, q2))

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_updates, actor_opt_state = self.actor_opt.update(
            a_grads, state.actor_opt_state, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)
        metrics["actor_loss"] = a_loss

        return state.replace(
            step=state.step + 1,
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=soft_update(
                critic_params, state.target_critic_params,
                cfg.critic_target_tau),
            actor_opt_state=actor_opt_state,
            critic_opt_state=critic_opt_state,
        ), metrics


@dataclasses.dataclass(frozen=True)
class GoalSMConfig:
    """Mirror of GoalSMAgentConfig (url_benchmark/agent/goal_sm.py:30-60)."""

    name: str = "goal_sm"
    lr: float = 1e-4
    critic_target_tau: float = 0.01
    update_every_steps: int = 2
    hidden_dim: int = 1024
    stddev_schedule: str = "0.2"
    stddev_clip: float = 0.3
    batch_size: int = 1024
    goal_space: tp.Optional[str] = None
    update_meta_every_step: int = 100
    future_ratio: float = 0.0
    num_expl_steps: int = 0
    compute_dtype: str = "float32"


class GoalSMAgent(GoalTD3Agent):
    """Successor-measure critic variant: off-diagonal TD loss against
    permuted desired goals plus a −Q(s, achieved, a) diagonal bonus
    (reference goal_sm.py:225-260)."""

    def __init__(self, cfg: GoalSMConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        td3_cfg = GoalTD3Config(
            name=cfg.name, lr=cfg.lr, critic_target_tau=cfg.critic_target_tau,
            update_every_steps=cfg.update_every_steps,
            hidden_dim=cfg.hidden_dim,
            stddev_schedule=cfg.stddev_schedule, stddev_clip=cfg.stddev_clip,
            batch_size=cfg.batch_size, goal_space=cfg.goal_space,
            future_ratio=cfg.future_ratio, num_expl_steps=cfg.num_expl_steps)
        super().__init__(td3_cfg, obs_dim, action_dim, goal_dim)
        self.sm_cfg = cfg

    def init_meta(self, state: GoalTrainState, key: jax.Array) -> MetaDict:
        """Random achieved goal from replay would be used online (reference
        goal_sm.py:168-177); without replay access, zeros."""
        return {"g": jnp.zeros((self.goal_dim,))}

    def update_meta(self, state, meta, global_step, key):
        return meta

    def _update(self, state: GoalTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[GoalTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_goal, k_fut, k_c, k_a = jax.random.split(key, 4)
        n = batch.obs.shape[0]
        achieved = batch.next_goal if batch.next_goal is not None else batch.next_obs
        future_goal = (batch.future_goal if cfg.goal_space is not None
                       else batch.future_obs)
        desired = batch.meta.get("g")
        if desired is None or desired.ndim == 1:
            desired = achieved[jax.random.permutation(k_goal, n)]
        if self.sm_cfg.future_ratio > 0 and future_goal is not None:
            mask = jax.random.uniform(k_fut, (n, 1)) < self.sm_cfg.future_ratio
            desired = jnp.where(mask, future_goal[..., :desired.shape[-1]],
                                desired)
        metrics: tp.Dict[str, Array] = {}

        def critic_loss_fn(critic_params: tp.Any) -> tp.Tuple[Array, tp.Dict[str, Array]]:
            mu = self.actor.apply(state.actor_params, batch.next_obs, desired)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            next_action = jax.lax.stop_gradient(
                dist.sample(k_c, clip=cfg.stddev_clip))
            tq1, tq2 = self.critic.apply(state.target_critic_params,
                                         batch.next_obs, desired, next_action)
            target_q = jax.lax.stop_gradient(jnp.minimum(tq1, tq2))
            q1, q2 = self.critic.apply(critic_params, batch.obs, desired,
                                       batch.action)
            q1d, q2d = self.critic.apply(critic_params, batch.obs, achieved,
                                         batch.action)
            loss_offdiag = 0.5 * (
                jnp.mean(jnp.square(q1 - batch.discount * target_q))
                + jnp.mean(jnp.square(q2 - batch.discount * target_q)))
            loss_diag = -(q1d.mean() + q2d.mean())
            loss = loss_offdiag + loss_diag
            return loss, {"critic_loss": loss, "critic_q1": q1.mean()}

        (c_loss, c_metrics), c_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(state.critic_params)
        c_updates, critic_opt_state = self.critic_opt.update(
            c_grads, state.critic_opt_state, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)
        metrics.update(c_metrics)

        def actor_loss_fn(actor_params: tp.Any) -> Array:
            mu = self.actor.apply(actor_params, batch.obs, desired)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            action = dist.sample(k_a, clip=cfg.stddev_clip)
            q1, q2 = self.critic.apply(critic_params, batch.obs, desired,
                                       action)
            return -jnp.mean(jnp.minimum(q1, q2))

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_updates, actor_opt_state = self.actor_opt.update(
            a_grads, state.actor_opt_state, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)
        metrics["actor_loss"] = a_loss

        return state.replace(
            step=state.step + 1,
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=soft_update(
                critic_params, state.target_critic_params,
                cfg.critic_target_tau),
            actor_opt_state=actor_opt_state,
            critic_opt_state=critic_opt_state,
        ), metrics
