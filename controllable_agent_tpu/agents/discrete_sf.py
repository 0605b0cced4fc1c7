"""DiscreteSFAgent — discrete-action successor features.

Functional re-design of the reference DiscreteSFAgent
(url_benchmark/agent/discrete_sf.py): the SFAgent machinery with actions
one-hot encoded and greedy selection by enumerating all actions (:37-56).
The enumeration is a vmap over the action axis instead of a python loop.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.episode_batch import EpisodeBatch
from ..models.networks import ForwardMap, l2_normalize
from ..utils.tree import soft_update
from .base import MetaDict, ZMetaMixin
from .sf import FEATURE_LEARNERS, SFConfig

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT


@dataclasses.dataclass(frozen=True)
class DiscreteSFConfig(SFConfig):
    name: str = "discrete_sf"
    expl_eps: float = 0.2
    preprocess: bool = False


class DiscreteSFTrainState(struct.PyTreeNode):
    step: Array
    sf_params: tp.Any
    target_sf_params: tp.Any
    feature_params: tp.Any
    sf_opt_state: tp.Any
    phi_opt_state: tp.Any


class DiscreteSFAgent(ZMetaMixin):
    def __init__(self, cfg: DiscreteSFConfig, obs_dim: int, n_actions: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        if cfg.feature_learner == "identity":
            cfg = dataclasses.replace(cfg, z_dim=goal_dim or obs_dim)
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.n_actions = n_actions
        self.goal_dim = goal_dim if goal_dim is not None else obs_dim
        self.successor_net = ForwardMap(
            z_dim=cfg.z_dim, feature_dim=cfg.feature_dim,
            hidden_dim=cfg.hidden_dim, preprocess=cfg.preprocess,
            add_trunk=cfg.add_trunk)
        self.feature_learner = FEATURE_LEARNERS[cfg.feature_learner](
            obs_dim=self.goal_dim, action_dim=n_actions, z_dim=cfg.z_dim,
            hidden_dim=cfg.backward_hidden_dim)
        self._learner_trainable = cfg.feature_learner not in ("random",
                                                              "identity")
        self.sf_opt = optax.adam(cfg.lr)
        self.phi_opt = optax.adam(cfg.lr_coef * cfg.lr)
        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))

    def init(self, key: jax.Array) -> DiscreteSFTrainState:
        k_s, k_p = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_dim))
        goal = jnp.zeros((1, self.goal_dim))
        z = jnp.zeros((1, self.cfg.z_dim))
        action = jnp.zeros((1, self.n_actions))
        sf_params = self.successor_net.init(k_s, obs, z, action)
        feature_params = self.feature_learner.init(
            k_p, goal, action, goal, goal,
            method=self.feature_learner.init_all)
        return DiscreteSFTrainState(
            step=jnp.zeros((), jnp.int32),
            sf_params=sf_params,
            target_sf_params=jax.tree.map(jnp.copy, sf_params),
            feature_params=feature_params,
            sf_opt_state=self.sf_opt.init(sf_params),
            phi_opt_state=self.phi_opt.init(feature_params),
        )

    def sample_z(self, key: jax.Array, size: int) -> Array:
        return l2_normalize(jax.random.normal(key, (size, self.cfg.z_dim)))

    def init_meta(self, state: tp.Any, key: jax.Array) -> MetaDict:
        return {"z": self.sample_z(key, 1)[0]}

    def features(self, feature_params: tp.Any, goal: Array) -> Array:
        return self.feature_learner.apply(feature_params, goal,
                                          method=self.feature_learner.features)

    # -- action enumeration ----------------------------------------------
    def _all_action_q(self, sf_params: tp.Any, obs: Array, z: Array) -> Array:
        """Q(s, a, z) for every action: [batch, n_actions] (reference
        discrete_sf.py:37-56's loop, vmapped)."""
        eye = jnp.eye(self.n_actions)

        def q_for(a_onehot: Array) -> Array:
            a = jnp.tile(a_onehot[None], (obs.shape[0], 1))
            f1, f2 = self.successor_net.apply(sf_params, obs, z, a)
            return jnp.minimum(
                jnp.einsum("sd,sd->s", f1, z, precision=_PREC),
                jnp.einsum("sd,sd->s", f2, z, precision=_PREC))

        return jax.vmap(q_for)(eye).T  # [batch, n_actions]

    def _act(self, state: DiscreteSFTrainState, obs: Array, z: Array,
             step: Array, key: jax.Array, eval_mode: bool = False) -> Array:
        q = self._all_action_q(state.sf_params, obs, z)
        greedy = jnp.argmax(q, axis=-1)
        if eval_mode:
            return greedy
        k_eps, k_rand = jax.random.split(key)
        rand = jax.random.randint(k_rand, greedy.shape, 0, self.n_actions)
        explore = jax.random.uniform(k_eps, greedy.shape) < self.cfg.expl_eps
        explore = explore | (step < self.cfg.num_expl_steps)
        return jnp.where(explore, rand, greedy)

    # -- update ----------------------------------------------------------
    def _update(self, state: DiscreteSFTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[DiscreteSFTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_z, _ = jax.random.split(key)
        n = batch.obs.shape[0]
        goal = batch.goal if cfg.goal_space is not None else batch.obs
        next_goal = batch.next_goal if cfg.goal_space is not None else batch.next_obs
        z = self.sample_z(k_z, n)
        action_onehot = jax.nn.one_hot(
            batch.action.astype(jnp.int32).reshape(-1), self.n_actions)
        metrics: tp.Dict[str, Array] = {}

        def sf_loss_fn(sf_params: tp.Any) -> tp.Tuple[Array, tp.Dict[str, Array]]:
            next_q = self._all_action_q(state.target_sf_params,
                                        batch.next_obs, z)
            next_action = jax.nn.one_hot(jnp.argmax(next_q, axis=-1),
                                         self.n_actions)
            nf1, nf2 = self.successor_net.apply(
                state.target_sf_params, batch.next_obs, z, next_action)
            nq1 = jnp.einsum("sd,sd->s", nf1, z, precision=_PREC)
            nq2 = jnp.einsum("sd,sd->s", nf2, z, precision=_PREC)
            next_f = jnp.where((nq1 < nq2)[:, None], nf1, nf2)
            target_phi = jax.lax.stop_gradient(
                self.features(state.feature_params, next_goal))
            target_f = jax.lax.stop_gradient(
                target_phi + batch.discount * next_f)
            f1, f2 = self.successor_net.apply(sf_params, batch.obs, z,
                                              action_onehot)
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

        (_, sf_metrics), sf_grads = jax.value_and_grad(
            sf_loss_fn, has_aux=True)(state.sf_params)
        sf_updates, sf_opt_state = self.sf_opt.update(
            sf_grads, state.sf_opt_state, state.sf_params)
        sf_params = optax.apply_updates(state.sf_params, sf_updates)
        metrics.update(sf_metrics)

        feature_params = state.feature_params
        phi_opt_state = state.phi_opt_state
        if self._learner_trainable:
            def phi_loss_fn(params: tp.Any) -> Array:
                loss = self.feature_learner.apply(
                    params, goal, action_onehot, next_goal,
                    batch.future_goal if cfg.goal_space is not None
                    else batch.future_obs)
                return loss if loss is not None else jnp.zeros(())

            phi_loss, phi_grads = jax.value_and_grad(phi_loss_fn)(
                state.feature_params)
            phi_updates, phi_opt_state = self.phi_opt.update(
                phi_grads, state.phi_opt_state, state.feature_params)
            feature_params = optax.apply_updates(state.feature_params,
                                                 phi_updates)
            metrics["phi_loss"] = phi_loss

        return state.replace(
            step=state.step + 1,
            sf_params=sf_params,
            target_sf_params=soft_update(sf_params, state.target_sf_params,
                                         cfg.sf_target_tau),
            feature_params=feature_params,
            sf_opt_state=sf_opt_state,
            phi_opt_state=phi_opt_state,
        ), metrics
