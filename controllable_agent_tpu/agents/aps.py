"""APSAgent and NEWAPSAgent — Active Pretraining with Successor features.

  * APSAgent (url_benchmark/agent/aps.py): DDPG base with a task-projected
    twin SF critic (CriticSF :47-97), an APS state-feature net (:100-114),
    intrinsic reward = particle entropy + task·φ successor reward
    (:195-206), MLE φ loss, and lstsq task regression (:273).
  * NEWAPSAgent (url_benchmark/agent/new_aps.py): rewrite on the FB-style
    ForwardMap successor net with scalar-Q TD loss (:307-340), MLE φ loss
    (:86-96), PBE entropy + φ·z reward (:290-302), hindsight future-goal z
    with whitened φ (:407-419).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..data.episode_batch import EpisodeBatch
from ..models.networks import Actor, ForwardMap, l2_normalize, mlp
from ..ops.pbe import RMSState, pbe
from ..utils.distributions import TruncatedNormal
from ..utils.schedules import schedule
from ..utils.tree import soft_update
from .base import MetaDict, ZMetaMixin
from .ddpg import DDPGActor

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT


# =================================================================== APS

@dataclasses.dataclass(frozen=True)
class APSConfig:
    """Mirror of APSAgentConfig (url_benchmark/agent/aps.py:24-41)."""

    name: str = "aps"
    reward_free: bool = True
    lr: float = 1e-4
    critic_target_tau: float = 0.01
    update_every_steps: int = 2
    hidden_dim: int = 1024
    feature_dim: int = 50
    stddev_schedule: str = "0.2"
    stddev_clip: float = 0.3
    batch_size: int = 1024
    sf_dim: int = 10
    update_task_every_step: int = 5
    knn_rms: bool = True
    knn_k: int = 12
    knn_avg: bool = True
    knn_clip: float = 0.0001
    lstsq_batch_size: int = 4096
    num_inference_steps: int = 10000
    num_expl_steps: int = 0
    goal_space: tp.Optional[str] = None
    compute_dtype: str = "float32"


class CriticSF(nn.Module):
    """Twin Q heads emitting sf_dim vectors, projected by the task
    (reference aps.py:47-97, states path)."""

    hidden_dim: int
    sf_dim: int

    @nn.compact
    def __call__(self, obs: Array, action: Array, task: Array
                 ) -> tp.Tuple[Array, Array]:
        h = mlp(self.hidden_dim, "ntanh")(jnp.concatenate([obs, action], -1))
        q1 = mlp(self.hidden_dim, "irelu", self.sf_dim)(h)
        q2 = mlp(self.hidden_dim, "irelu", self.sf_dim)(h)
        q1 = jnp.einsum("bi,bi->b", task, q1, precision=_PREC)[:, None]
        q2 = jnp.einsum("bi,bi->b", task, q2, precision=_PREC)[:, None]
        return q1, q2


class APSTrainState(struct.PyTreeNode):
    step: Array
    actor_params: tp.Any
    critic_params: tp.Any
    target_critic_params: tp.Any
    aps_params: tp.Any
    actor_opt_state: tp.Any
    critic_opt_state: tp.Any
    aps_opt_state: tp.Any
    rms: RMSState


class APSAgent(ZMetaMixin):
    meta_key = "task"

    def policy_act(self, state, obs, meta, step, key, eval_mode=False):
        return self.act(state, obs, meta, step, key, eval_mode=eval_mode)

    def rollout_update_meta(self, state, meta, t, key):
        task = meta["task"]
        new = jax.random.normal(key, task.shape)
        new = new / jnp.maximum(jnp.linalg.norm(new, axis=-1, keepdims=True),
                                1e-12)
        resample = (t % self.cfg.update_task_every_step) == 0
        return {**meta, "task": jnp.where(resample, new, task)}

    def __init__(self, cfg: APSConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.actor = DDPGActor(action_dim=action_dim, hidden_dim=cfg.hidden_dim)
        self.critic = CriticSF(hidden_dim=cfg.hidden_dim, sf_dim=cfg.sf_dim)
        self.aps_net = mlp(cfg.hidden_dim, "irelu", cfg.hidden_dim, "irelu",
                           cfg.sf_dim)
        self.actor_opt = optax.adam(cfg.lr)
        self.critic_opt = optax.adam(cfg.lr)
        self.aps_opt = optax.adam(cfg.lr)
        self._stddev = schedule(cfg.stddev_schedule)
        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))
        self.regress_meta = jax.jit(self._regress_meta)

    def init(self, key: jax.Array) -> APSTrainState:
        k_a, k_c, k_f = jax.random.split(key, 3)
        obs_task = jnp.zeros((1, self.obs_dim + self.cfg.sf_dim))
        action = jnp.zeros((1, self.action_dim))
        task = jnp.zeros((1, self.cfg.sf_dim))
        actor_params = self.actor.init(k_a, obs_task)
        critic_params = self.critic.init(k_c, obs_task, action, task)
        aps_params = self.aps_net.init(k_f, jnp.zeros((1, self.obs_dim)))
        return APSTrainState(
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=jax.tree.map(jnp.copy, critic_params),
            aps_params=aps_params,
            actor_opt_state=self.actor_opt.init(actor_params),
            critic_opt_state=self.critic_opt.init(critic_params),
            aps_opt_state=self.aps_opt.init(aps_params),
            rms=RMSState.create(),
        )

    def _features(self, aps_params: tp.Any, obs: Array,
                  norm: bool = True) -> Array:
        phi = self.aps_net.apply(aps_params, obs)
        return l2_normalize(phi, scale_sqrt_dim=False) if norm else phi

    # -- meta ------------------------------------------------------------
    def init_meta(self, state: APSTrainState, key: jax.Array) -> MetaDict:
        task = jax.random.normal(key, (self.cfg.sf_dim,))
        return {"task": task / jnp.linalg.norm(task)}

    def update_meta(self, state: APSTrainState, meta: MetaDict,
                    global_step: int, key: jax.Array) -> MetaDict:
        if global_step % self.cfg.update_task_every_step == 0:
            return self.init_meta(state, key)
        return meta

    def _regress_meta(self, state: APSTrainState, obs: Array,
                      reward: Array) -> Array:
        """task = lstsq(φ(s), r) (reference regress_meta, aps.py:273-287)."""
        phi = self._features(state.aps_params, obs)
        task, *_ = jnp.linalg.lstsq(phi, reward.reshape(-1, 1))
        return (task / jnp.maximum(jnp.linalg.norm(task), 1e-12))[:, 0]

    # -- acting ----------------------------------------------------------
    def _act(self, state: APSTrainState, obs: Array, meta: MetaDict,
             step: Array, key: jax.Array, eval_mode: bool = False) -> Array:
        task = meta["task"]
        if task.ndim == 1:
            task = jnp.tile(task[None], (obs.shape[0], 1))
        inpt = jnp.concatenate([obs, task], -1)
        mu = self.actor.apply(state.actor_params, inpt)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_s, k_e = jax.random.split(key)
        action = dist.sample(k_s)
        expl = jax.random.uniform(k_e, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    # -- update ----------------------------------------------------------
    def _update(self, state: APSTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[APSTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_c, k_a = jax.random.split(key)
        task = batch.meta["task"]
        metrics: tp.Dict[str, Array] = {}

        # φ MLE loss (reference compute_aps_loss, aps.py:208-211)
        def aps_loss_fn(aps_params: tp.Any) -> Array:
            phi = self._features(aps_params, batch.next_obs)
            return -jnp.einsum("bi,bi->b", task, phi, precision=_PREC).mean()

        aps_params = state.aps_params
        aps_opt_state = state.aps_opt_state
        rms = state.rms
        reward = batch.reward
        if cfg.reward_free:
            aps_loss, grads = jax.value_and_grad(aps_loss_fn)(state.aps_params)
            updates, aps_opt_state = self.aps_opt.update(
                grads, state.aps_opt_state, state.aps_params)
            aps_params = optax.apply_updates(state.aps_params, updates)
            metrics["aps_loss"] = aps_loss
            rep = jax.lax.stop_gradient(
                self._features(aps_params, batch.next_obs, norm=False))
            ent_reward, rms = pbe(rep, state.rms, knn_k=cfg.knn_k,
                                  knn_avg=cfg.knn_avg, knn_clip=cfg.knn_clip,
                                  knn_rms=cfg.knn_rms)
            sf_reward = jnp.einsum(
                "bi,bi->b", task, l2_normalize(rep, scale_sqrt_dim=False),
                precision=_PREC)[:, None]
            reward = ent_reward + sf_reward
            metrics.update(intr_reward=reward.mean(),
                           intr_ent_reward=ent_reward.mean(),
                           intr_sf_reward=sf_reward.mean())

        obs_task = jnp.concatenate([batch.obs, task], -1)
        next_obs_task = jnp.concatenate([batch.next_obs, task], -1)

        def critic_loss_fn(critic_params: tp.Any) -> tp.Tuple[Array, tp.Dict[str, Array]]:
            mu = self.actor.apply(state.actor_params, next_obs_task)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            next_action = jax.lax.stop_gradient(
                dist.sample(k_c, clip=cfg.stddev_clip))
            tq1, tq2 = self.critic.apply(state.target_critic_params,
                                         next_obs_task, next_action, task)
            target_q = jax.lax.stop_gradient(
                reward + batch.discount * jnp.minimum(tq1, tq2))
            q1, q2 = self.critic.apply(critic_params, obs_task, batch.action,
                                       task)
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
            mu = self.actor.apply(actor_params, obs_task)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            action = dist.sample(k_a, clip=cfg.stddev_clip)
            q1, q2 = self.critic.apply(critic_params, obs_task, action, task)
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
            aps_params=aps_params,
            actor_opt_state=actor_opt_state,
            critic_opt_state=critic_opt_state,
            aps_opt_state=aps_opt_state,
            rms=rms,
        ), metrics


# =============================================================== NEW APS

@dataclasses.dataclass(frozen=True)
class NEWAPSConfig:
    """Mirror of new_aps.APSAgentConfig (url_benchmark/agent/new_aps.py:30-70)."""

    name: str = "new_aps"
    reward_free: bool = True
    lr: float = 1e-4
    lr_coef: float = 1.0
    sf_target_tau: float = 0.01
    update_every_steps: int = 2
    hidden_dim: int = 1024
    backward_hidden_dim: int = 512
    feature_dim: int = 512
    z_dim: int = 10
    stddev_schedule: str = "0.2"
    stddev_clip: float = 0.3
    update_z_every_step: int = 100
    batch_size: int = 1024
    goal_space: tp.Optional[str] = None
    preprocess: bool = False
    knn_rms: bool = True
    knn_k: int = 12
    knn_avg: bool = True
    knn_clip: float = 0.0001
    num_inference_steps: int = 5120
    add_trunk: bool = False
    future_ratio: float = 0.0
    num_expl_steps: int = 0
    compute_dtype: str = "float32"


class NEWAPSTrainState(struct.PyTreeNode):
    step: Array
    actor_params: tp.Any
    sf_params: tp.Any
    target_sf_params: tp.Any
    phi_params: tp.Any
    actor_opt_state: tp.Any
    sf_opt_state: tp.Any
    phi_opt_state: tp.Any
    rms: RMSState


class NEWAPSAgent(ZMetaMixin):
    def __init__(self, cfg: NEWAPSConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.goal_dim = goal_dim if goal_dim is not None else obs_dim
        self.actor = Actor(z_dim=cfg.z_dim, action_dim=action_dim,
                           feature_dim=cfg.feature_dim,
                           hidden_dim=cfg.hidden_dim,
                           preprocess=cfg.preprocess, add_trunk=cfg.add_trunk)
        self.successor_net = ForwardMap(
            z_dim=cfg.z_dim, feature_dim=cfg.feature_dim,
            hidden_dim=cfg.hidden_dim, preprocess=cfg.preprocess,
            add_trunk=cfg.add_trunk)
        self.phi_net = mlp(cfg.backward_hidden_dim, "ntanh",
                           cfg.backward_hidden_dim, "relu", cfg.z_dim)
        self.actor_opt = optax.adam(cfg.lr)
        self.sf_opt = optax.adam(cfg.lr)
        self.phi_opt = optax.adam(cfg.lr_coef * cfg.lr)
        self._stddev = schedule(cfg.stddev_schedule)
        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))
        self.infer_meta_from_obs_and_rewards = jax.jit(self._infer_meta)

    def init(self, key: jax.Array) -> NEWAPSTrainState:
        k_a, k_s, k_p = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        z = jnp.zeros((1, self.cfg.z_dim))
        action = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k_a, obs, z)
        sf_params = self.successor_net.init(k_s, obs, z, action)
        phi_params = self.phi_net.init(k_p, jnp.zeros((1, self.goal_dim)))
        return NEWAPSTrainState(
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            sf_params=sf_params,
            target_sf_params=jax.tree.map(jnp.copy, sf_params),
            phi_params=phi_params,
            actor_opt_state=self.actor_opt.init(actor_params),
            sf_opt_state=self.sf_opt.init(sf_params),
            phi_opt_state=self.phi_opt.init(phi_params),
            rms=RMSState.create(),
        )

    def _features(self, phi_params: tp.Any, goal: Array,
                  norm: bool = True) -> Array:
        phi = self.phi_net.apply(phi_params, goal)
        return l2_normalize(phi, scale_sqrt_dim=False) if norm else phi

    def sample_z(self, key: jax.Array, size: int) -> Array:
        g = jax.random.normal(key, (size, self.cfg.z_dim))
        return l2_normalize(g, scale_sqrt_dim=False)

    def init_meta(self, state: NEWAPSTrainState, key: jax.Array) -> MetaDict:
        return {"z": self.sample_z(key, 1)[0]}

    def update_meta(self, state, meta, global_step, key):
        if global_step % self.cfg.update_z_every_step == 0:
            return self.init_meta(state, key)
        return meta

    def _infer_meta(self, state: NEWAPSTrainState, obs: Array,
                    reward: Array) -> Array:
        phi = self._features(state.phi_params, obs)
        z, *_ = jnp.linalg.lstsq(phi, reward.reshape(-1, 1))
        return (z / jnp.maximum(jnp.linalg.norm(z, axis=0, keepdims=True),
                                1e-12))[:, 0]

    def _act(self, state: NEWAPSTrainState, obs: Array, z: Array, step: Array,
             key: jax.Array, eval_mode: bool = False) -> Array:
        mu = self.actor.apply(state.actor_params, obs, z)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_s, k_e = jax.random.split(key)
        action = dist.sample(k_s)
        expl = jax.random.uniform(k_e, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    def _update(self, state: NEWAPSTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[NEWAPSTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_z, k_c, k_a, k_f = jax.random.split(key, 4)
        n = batch.obs.shape[0]
        next_goal = (batch.next_goal if cfg.goal_space is not None
                     else batch.next_obs)
        z = batch.meta.get("z")
        if z is None:
            z = self.sample_z(k_z, n)
        metrics: tp.Dict[str, Array] = {}

        phi_params = state.phi_params
        phi_opt_state = state.phi_opt_state
        rms = state.rms
        reward = batch.reward
        if cfg.reward_free:
            def phi_loss_fn(params: tp.Any) -> Array:
                phi = self._features(params, next_goal)
                return -jnp.einsum("bd,bd->b", phi, z, precision=_PREC).mean()

            phi_loss, grads = jax.value_and_grad(phi_loss_fn)(state.phi_params)
            updates, phi_opt_state = self.phi_opt.update(
                grads, state.phi_opt_state, state.phi_params)
            phi_params = optax.apply_updates(state.phi_params, updates)
            metrics["phi_loss"] = phi_loss
            rep = jax.lax.stop_gradient(
                self._features(phi_params, next_goal, norm=False))
            ent_reward, rms = pbe(rep, state.rms, knn_k=cfg.knn_k,
                                  knn_avg=cfg.knn_avg, knn_clip=cfg.knn_clip,
                                  knn_rms=cfg.knn_rms)
            sf_reward = jnp.einsum(
                "bi,bi->b", l2_normalize(rep, scale_sqrt_dim=False), z,
                precision=_PREC)[:, None]
            reward = ent_reward + sf_reward
            metrics.update(intrinsic_reward=reward.mean(),
                           entropy_reward=ent_reward.mean(),
                           diayn_reward=sf_reward.mean())

        if cfg.future_ratio > 0:
            future_goal = (batch.future_goal if cfg.goal_space is not None
                           else batch.future_obs)
            phi = jax.lax.stop_gradient(
                self._features(phi_params, future_goal))
            cov = jnp.matmul(phi.T, phi, precision=_PREC) / n
            inv_cov = jnp.linalg.pinv(cov)
            new_z = l2_normalize(jnp.matmul(phi, inv_cov, precision=_PREC),
                                 scale_sqrt_dim=False)
            mask = jax.random.uniform(k_f, (n, 1)) < cfg.future_ratio
            z = jnp.where(mask, new_z, z)

        def critic_loss_fn(sf_params: tp.Any) -> tp.Tuple[Array, tp.Dict[str, Array]]:
            mu = self.actor.apply(state.actor_params, batch.next_obs, z)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            next_action = jax.lax.stop_gradient(
                dist.sample(k_c, clip=cfg.stddev_clip))
            nf1, nf2 = self.successor_net.apply(state.target_sf_params,
                                                batch.next_obs, z, next_action)
            next_q = jnp.minimum(
                jnp.einsum("sd,sd->s", nf1, z, precision=_PREC),
                jnp.einsum("sd,sd->s", nf2, z, precision=_PREC))
            target_q = jax.lax.stop_gradient(
                reward[:, 0] + batch.discount[:, 0] * next_q)
            f1, f2 = self.successor_net.apply(sf_params, batch.obs, z,
                                              batch.action)
            q1 = jnp.einsum("sd,sd->s", f1, z, precision=_PREC)
            q2 = jnp.einsum("sd,sd->s", f2, z, precision=_PREC)
            loss = (jnp.mean(jnp.square(q1 - target_q))
                    + jnp.mean(jnp.square(q2 - target_q)))
            return loss, {"sf_loss": loss, "Q1": q1.mean(),
                          "target_Q": target_q.mean()}

        (sf_loss, sf_metrics), sf_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(state.sf_params)
        sf_updates, sf_opt_state = self.sf_opt.update(
            sf_grads, state.sf_opt_state, state.sf_params)
        sf_params = optax.apply_updates(state.sf_params, sf_updates)
        metrics.update(sf_metrics)

        def actor_loss_fn(actor_params: tp.Any) -> Array:
            mu = self.actor.apply(actor_params, batch.obs, z)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            action = dist.sample(k_a, clip=cfg.stddev_clip)
            f1, f2 = self.successor_net.apply(sf_params, batch.obs, z, action)
            q = jnp.minimum(jnp.einsum("sd,sd->s", f1, z, precision=_PREC),
                            jnp.einsum("sd,sd->s", f2, z, precision=_PREC))
            return -jnp.mean(q)

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_updates, actor_opt_state = self.actor_opt.update(
            a_grads, state.actor_opt_state, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)
        metrics["actor_loss"] = a_loss

        return state.replace(
            step=state.step + 1,
            actor_params=actor_params,
            sf_params=sf_params,
            target_sf_params=soft_update(sf_params, state.target_sf_params,
                                         cfg.sf_target_tau),
            phi_params=phi_params,
            actor_opt_state=actor_opt_state,
            sf_opt_state=sf_opt_state,
            phi_opt_state=phi_opt_state,
            rms=rms,
        ), metrics
