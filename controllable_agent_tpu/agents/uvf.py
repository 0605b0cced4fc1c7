"""UVFAgent — universal value function variant of the FB machinery.

Functional re-design of the reference UVFAgent (url_benchmark/agent/uvf.py):
goal-conditioned critic Q(s, a, B(g)) trained on the sparse indicator
reward 1{s' == g} with TD targets (update_fb :267-311); z = B(desired
goal) with B trained jointly through the critic loss; desired goals are
permuted replay achieved-goals, partially replaced by the sample's own
next goal with probability mix_ratio (:368-374).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.episode_batch import EpisodeBatch
from ..models.networks import Actor, BackwardMap, ForwardMap, l2_normalize
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


@dataclasses.dataclass(frozen=True)
class UVFConfig:
    """Mirror of UVFAgentConfig (url_benchmark/agent/uvf.py:37-81)."""

    name: str = "uvf"
    lr: float = 1e-4
    lr_coef: float = 1.0
    fb_target_tau: float = 0.01
    update_every_steps: int = 2
    num_inference_steps: int = 5120
    hidden_dim: int = 1024
    backward_hidden_dim: int = 526
    feature_dim: int = 512
    z_dim: int = 50
    stddev_schedule: str = "0.2"
    stddev_clip: float = 0.3
    update_z_every_step: int = 300
    batch_size: int = 1024
    goal_space: tp.Optional[str] = None
    boltzmann: bool = False
    temp: float = 1.0
    mix_ratio: float = 0.5
    preprocess: bool = True
    norm_z: bool = True
    add_trunk: bool = False
    num_expl_steps: int = 0
    compute_dtype: str = "float32"


class UVFTrainState(struct.PyTreeNode):
    step: Array
    actor_params: tp.Any
    forward_params: tp.Any
    backward_params: tp.Any
    target_forward_params: tp.Any
    actor_opt_state: tp.Any
    fw_opt_state: tp.Any
    bw_opt_state: tp.Any


class UVFAgent(ZMetaMixin):
    def __init__(self, cfg: UVFConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.goal_dim = goal_dim if goal_dim is not None else obs_dim
        self.actor = Actor(z_dim=cfg.z_dim, action_dim=action_dim,
                           feature_dim=cfg.feature_dim,
                           hidden_dim=cfg.hidden_dim,
                           preprocess=cfg.preprocess, add_trunk=cfg.add_trunk)
        self.forward_net = ForwardMap(
            z_dim=cfg.z_dim, feature_dim=cfg.feature_dim,
            hidden_dim=cfg.hidden_dim, preprocess=cfg.preprocess,
            add_trunk=cfg.add_trunk)
        self.backward_net = BackwardMap(
            z_dim=cfg.z_dim, hidden_dim=cfg.backward_hidden_dim,
            norm_z=cfg.norm_z)
        self.actor_opt = optax.adam(cfg.lr)
        self.fw_opt = optax.adam(cfg.lr)
        self.bw_opt = optax.adam(cfg.lr_coef * cfg.lr)
        self._stddev = schedule(cfg.stddev_schedule)
        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))
        self.get_goal_meta = jax.jit(self._get_goal_meta)

    def init(self, key: jax.Array) -> UVFTrainState:
        k_a, k_f, k_b = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        goal = jnp.zeros((1, self.goal_dim))
        z = jnp.zeros((1, self.cfg.z_dim))
        action = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k_a, obs, z)
        forward_params = self.forward_net.init(k_f, obs, z, action)
        backward_params = self.backward_net.init(k_b, goal)
        return UVFTrainState(
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            forward_params=forward_params,
            backward_params=backward_params,
            target_forward_params=jax.tree.map(jnp.copy, forward_params),
            actor_opt_state=self.actor_opt.init(actor_params),
            fw_opt_state=self.fw_opt.init(forward_params),
            bw_opt_state=self.bw_opt.init(backward_params),
        )

    # -- meta ------------------------------------------------------------
    def sample_z(self, key: jax.Array, size: int) -> Array:
        g = jax.random.normal(key, (size, self.cfg.z_dim))
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)
        return jnp.sqrt(jnp.asarray(float(self.cfg.z_dim))) * g

    def init_meta(self, state: UVFTrainState, key: jax.Array) -> MetaDict:
        return {"z": self.sample_z(key, 1)[0]}

    def update_meta(self, state, meta, global_step, key):
        if global_step % self.cfg.update_z_every_step == 0:
            return self.init_meta(state, key)
        return meta

    def _get_goal_meta(self, state: UVFTrainState, goal: Array) -> Array:
        z = self.backward_net.apply(state.backward_params, goal[None])
        if self.cfg.norm_z:
            z = l2_normalize(z)
        return z[0]

    # -- acting ----------------------------------------------------------
    def _act(self, state: UVFTrainState, obs: Array, z: Array, step: Array,
             key: jax.Array, eval_mode: bool = False) -> Array:
        mu = self.actor.apply(state.actor_params, obs, z)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_s, k_e = jax.random.split(key)
        action = dist.sample(k_s)
        expl = jax.random.uniform(k_e, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    # -- losses ----------------------------------------------------------
    def _fb_loss(self, fw_params: tp.Any, bw_params: tp.Any,
                 state: UVFTrainState, batch: EpisodeBatch, next_goal: Array,
                 desired_goal: Array, key: jax.Array
                 ) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        cfg = self.cfg
        z = self.backward_net.apply(bw_params, desired_goal)
        eps = 1e-6
        reward = (jnp.linalg.norm(next_goal - desired_goal, axis=1)
                  < eps).astype(jnp.float32)
        mu = self.actor.apply(state.actor_params, batch.next_obs, z)
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
        next_action = jax.lax.stop_gradient(
            dist.sample(key, clip=cfg.stddev_clip))
        tf1, tf2 = self.forward_net.apply(state.target_forward_params,
                                          batch.next_obs, z, next_action)
        next_q = jnp.minimum(
            jnp.einsum("sd,sd->s", tf1, z, precision=_PREC),
            jnp.einsum("sd,sd->s", tf2, z, precision=_PREC))
        target_q = jax.lax.stop_gradient(
            reward + batch.discount[:, 0] * next_q)
        f1, f2 = self.forward_net.apply(fw_params, batch.obs, z, batch.action)
        q1 = jnp.einsum("sd,sd->s", f1, z, precision=_PREC)
        q2 = jnp.einsum("sd,sd->s", f2, z, precision=_PREC)
        loss = (jnp.mean(jnp.square(q1 - target_q))
                + jnp.mean(jnp.square(q2 - target_q)))
        return loss, {"fb_loss": loss,
                      "z_norm": jnp.linalg.norm(z, axis=-1).mean()}

    # -- update ----------------------------------------------------------
    def _update(self, state: UVFTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[UVFTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_perm, k_mix, k_fb, k_actor = jax.random.split(key, 4)
        n = batch.obs.shape[0]
        next_goal = batch.next_goal if cfg.goal_space is not None else batch.next_obs
        desired_goal = next_goal[jax.random.permutation(k_perm, n)]
        if cfg.mix_ratio > 0:
            mask = jax.random.uniform(k_mix, (n, 1)) < cfg.mix_ratio
            desired_goal = jnp.where(mask, next_goal, desired_goal)

        (fb_loss, metrics), (fw_grads, bw_grads) = jax.value_and_grad(
            self._fb_loss, argnums=(0, 1), has_aux=True)(
            state.forward_params, state.backward_params, state, batch,
            next_goal, desired_goal, k_fb)
        fw_updates, fw_opt_state = self.fw_opt.update(
            fw_grads, state.fw_opt_state, state.forward_params)
        forward_params = optax.apply_updates(state.forward_params, fw_updates)
        bw_updates, bw_opt_state = self.bw_opt.update(
            bw_grads, state.bw_opt_state, state.backward_params)
        backward_params = optax.apply_updates(state.backward_params, bw_updates)

        def actor_loss_fn(actor_params: tp.Any) -> Array:
            z = jax.lax.stop_gradient(
                self.backward_net.apply(backward_params, desired_goal))
            mu = self.actor.apply(actor_params, batch.obs, z)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            action = dist.sample(k_actor, clip=cfg.stddev_clip)
            f1, f2 = self.forward_net.apply(forward_params, batch.obs, z,
                                            action)
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
            forward_params=forward_params,
            backward_params=backward_params,
            target_forward_params=soft_update(
                forward_params, state.target_forward_params,
                cfg.fb_target_tau),
            actor_opt_state=actor_opt_state,
            fw_opt_state=fw_opt_state,
            bw_opt_state=bw_opt_state,
        ), metrics
