"""SFSVDAgent — successor features with a joint SVD learner.

Functional re-design of the reference SFSVDAgent
(url_benchmark/agent/sf_svd.py): a single SVDLearner factorizing the
transition operator as φ(s,a)·μ(s') with the −2·diag + off-diag² loss and
φ-orthonormality (:86-112); meta inference requires (obs, action, reward):
z = lstsq(φ(s,a), r) (:260). The SF/actor machinery matches SFAgent.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..data.episode_batch import EpisodeBatch
from ..models.networks import Actor, ForwardMap, l2_normalize, mlp
from ..ops.fb import off_diagonal_mask, orthonormality_loss
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


class SVDLearner(nn.Module):
    """φ(s,a)·μ(s') factorization (reference sf_svd.py:84-112)."""

    z_dim: int
    hidden_dim: int

    def setup(self) -> None:
        self.feature_net = mlp(self.hidden_dim, "ntanh", self.hidden_dim,
                               "relu", self.z_dim, "L2")
        self.mu_net = mlp(self.hidden_dim, "ntanh", self.hidden_dim,
                          "relu", self.z_dim)

    def features(self, obs: Array, action: Array) -> Array:
        return self.feature_net(jnp.concatenate([obs, action], -1))

    def __call__(self, obs: Array, action: Array, next_obs: Array) -> Array:
        phi = self.features(obs, action)
        mu = self.mu_net(next_obs)
        p = jnp.einsum("sd,td->st", phi, mu, precision=_PREC)
        n = p.shape[0]
        off = off_diagonal_mask(n)
        loss = (-2.0 * jnp.trace(p) / n
                + jnp.sum(jnp.where(off, jnp.square(p), 0.0)) / (n * (n - 1)))
        orth, _, _ = orthonormality_loss(phi)
        return loss + orth


@dataclasses.dataclass(frozen=True)
class SFSVDConfig:
    """Mirror of SFSVDAgentConfig (url_benchmark/agent/sf_svd.py:36-78)."""

    name: str = "sf_svd"
    lr: float = 1e-4
    lr_coef: float = 1.0
    sf_target_tau: float = 0.01
    update_every_steps: int = 2
    num_inference_steps: int = 5120
    hidden_dim: int = 1024
    backward_hidden_dim: int = 512
    feature_dim: int = 512
    z_dim: int = 100
    stddev_schedule: str = "0.2"
    stddev_clip: float = 0.3
    update_z_every_step: int = 100
    batch_size: int = 1024
    goal_space: tp.Optional[str] = None
    preprocess: bool = True
    q_loss: bool = True
    mix_ratio: float = 0.0
    add_trunk: bool = False
    num_expl_steps: int = 0
    compute_dtype: str = "float32"


class SFSVDTrainState(struct.PyTreeNode):
    step: Array
    actor_params: tp.Any
    sf_params: tp.Any
    target_sf_params: tp.Any
    svd_params: tp.Any
    actor_opt_state: tp.Any
    sf_opt_state: tp.Any
    svd_opt_state: tp.Any


class SFSVDAgent(ZMetaMixin):
    def __init__(self, cfg: SFSVDConfig, obs_dim: int, action_dim: int,
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
        self.svd = SVDLearner(z_dim=cfg.z_dim,
                              hidden_dim=cfg.backward_hidden_dim)
        self.actor_opt = optax.adam(cfg.lr)
        self.sf_opt = optax.adam(cfg.lr)
        self.svd_opt = optax.adam(cfg.lr_coef * cfg.lr)
        self._stddev = schedule(cfg.stddev_schedule)
        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))
        self.infer_meta_from_obs_action_and_rewards = jax.jit(self._infer_meta)

    def init(self, key: jax.Array) -> SFSVDTrainState:
        k_a, k_s, k_v = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        goal = jnp.zeros((1, self.goal_dim))
        z = jnp.zeros((1, self.cfg.z_dim))
        action = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k_a, obs, z)
        sf_params = self.successor_net.init(k_s, obs, z, action)
        svd_params = self.svd.init(k_v, goal, action, goal)
        return SFSVDTrainState(
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            sf_params=sf_params,
            target_sf_params=jax.tree.map(jnp.copy, sf_params),
            svd_params=svd_params,
            actor_opt_state=self.actor_opt.init(actor_params),
            sf_opt_state=self.sf_opt.init(sf_params),
            svd_opt_state=self.svd_opt.init(svd_params),
        )

    def features(self, svd_params: tp.Any, goal: Array, action: Array) -> Array:
        return self.svd.apply(svd_params, goal, action,
                              method=self.svd.features)

    def sample_z(self, key: jax.Array, size: int) -> Array:
        g = jax.random.normal(key, (size, self.cfg.z_dim))
        return l2_normalize(g)

    def init_meta(self, state: SFSVDTrainState, key: jax.Array) -> MetaDict:
        return {"z": self.sample_z(key, 1)[0]}

    def update_meta(self, state, meta, global_step, key):
        if global_step % self.cfg.update_z_every_step == 0:
            return self.init_meta(state, key)
        return meta

    def _infer_meta(self, state: SFSVDTrainState, obs: Array, action: Array,
                    reward: Array) -> Array:
        """z = lstsq(φ(s,a), r) (reference sf_svd.py:260-276)."""
        phi = self.features(state.svd_params, obs, action)
        z, *_ = jnp.linalg.lstsq(phi, reward.reshape(-1, 1))
        z = math.sqrt(self.cfg.z_dim) * z / jnp.maximum(
            jnp.linalg.norm(z, axis=0, keepdims=True), 1e-12)
        return z[:, 0]

    def _act(self, state: SFSVDTrainState, obs: Array, z: Array, step: Array,
             key: jax.Array, eval_mode: bool = False) -> Array:
        mu = self.actor.apply(state.actor_params, obs, z)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_s, k_e = jax.random.split(key)
        action = dist.sample(k_s)
        expl = jax.random.uniform(k_e, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    def _update(self, state: SFSVDTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[SFSVDTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_z, k_sf, k_actor = jax.random.split(key, 3)
        n = batch.obs.shape[0]
        goal = batch.goal if cfg.goal_space is not None else batch.obs
        next_goal = batch.next_goal if cfg.goal_space is not None else batch.next_obs
        z = self.sample_z(k_z, n)
        metrics: tp.Dict[str, Array] = {}

        def svd_loss_fn(params: tp.Any) -> Array:
            return self.svd.apply(params, goal, batch.action, next_goal)

        svd_loss, svd_grads = jax.value_and_grad(svd_loss_fn)(state.svd_params)
        svd_updates, svd_opt_state = self.svd_opt.update(
            svd_grads, state.svd_opt_state, state.svd_params)
        svd_params = optax.apply_updates(state.svd_params, svd_updates)
        metrics["phi_loss"] = svd_loss

        def sf_loss_fn(sf_params: tp.Any) -> tp.Tuple[Array, tp.Dict[str, Array]]:
            mu = self.actor.apply(state.actor_params, batch.next_obs, z)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            next_action = jax.lax.stop_gradient(
                dist.sample(k_sf, clip=cfg.stddev_clip))
            nf1, nf2 = self.successor_net.apply(state.target_sf_params,
                                                batch.next_obs, z, next_action)
            target_phi = jax.lax.stop_gradient(
                self.features(svd_params, goal, batch.action))
            nq1 = jnp.einsum("sd,sd->s", nf1, z, precision=_PREC)
            nq2 = jnp.einsum("sd,sd->s", nf2, z, precision=_PREC)
            next_f = jnp.where((nq1 < nq2)[:, None], nf1, nf2)
            target_f = jax.lax.stop_gradient(
                target_phi + batch.discount * next_f)
            f1, f2 = self.successor_net.apply(sf_params, batch.obs, z,
                                              batch.action)
            if cfg.q_loss:
                q1 = jnp.einsum("sd,sd->s", f1, z, precision=_PREC)
                q2 = jnp.einsum("sd,sd->s", f2, z, precision=_PREC)
                tq = jnp.einsum("sd,sd->s", target_f, z, precision=_PREC)
                loss = (jnp.mean(jnp.square(q1 - tq))
                        + jnp.mean(jnp.square(q2 - tq)))
            else:
                loss = (jnp.mean(jnp.square(f1 - target_f))
                        + jnp.mean(jnp.square(f2 - target_f)))
            return loss, {"sf_loss": loss}

        (sf_loss, sf_metrics), sf_grads = jax.value_and_grad(
            sf_loss_fn, has_aux=True)(state.sf_params)
        sf_updates, sf_opt_state = self.sf_opt.update(
            sf_grads, state.sf_opt_state, state.sf_params)
        sf_params = optax.apply_updates(state.sf_params, sf_updates)
        metrics.update(sf_metrics)

        def actor_loss_fn(actor_params: tp.Any) -> Array:
            mu = self.actor.apply(actor_params, batch.obs, z)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            action = dist.sample(k_actor, clip=cfg.stddev_clip)
            f1, f2 = self.successor_net.apply(sf_params, batch.obs, z, action)
            q = jnp.minimum(jnp.einsum("sd,sd->s", f1, z, precision=_PREC),
                            jnp.einsum("sd,sd->s", f2, z, precision=_PREC))
            return -jnp.mean(q)

        actor_loss, actor_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params)
        actor_updates, actor_opt_state = self.actor_opt.update(
            actor_grads, state.actor_opt_state, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, actor_updates)
        metrics["actor_loss"] = actor_loss

        return state.replace(
            step=state.step + 1,
            actor_params=actor_params,
            sf_params=sf_params,
            target_sf_params=soft_update(sf_params, state.target_sf_params,
                                         cfg.sf_target_tau),
            svd_params=svd_params,
            actor_opt_state=actor_opt_state,
            sf_opt_state=sf_opt_state,
            svd_opt_state=svd_opt_state,
        ), metrics
