"""Exploration agents — intrinsic-reward DDPG family.

Functional re-designs of the reference's unsupervised-RL zoo, all sharing
one orchestration (module update -> intrinsic reward -> DDPG update in a
single jitted step):

  * RNDAgent       (url_benchmark/agent/rnd.py): predictor vs frozen random
    target; reward = normalized prediction error. Used to generate the
    ExORL-style exploration buffers for offline FB.
  * DIAYNAgent     (url_benchmark/agent/diayn.py): one-hot skill z, skill
    discriminator CE loss, reward = log q(z|s') − log(1/K).
  * ICMAgent       (url_benchmark/agent/icm.py): forward+inverse dynamics;
    reward = forward prediction error.
  * ICMAPTAgent    (url_benchmark/agent/icm_apt.py): APT — kNN particle
    entropy in an ICM trunk representation (ind_apt ablation = identity
    representation).
  * DisagreementAgent (url_benchmark/agent/disagreement.py): ensemble of 5
    forward models; reward = prediction variance.
  * MaxEntAgent    (url_benchmark/agent/max_ent.py): pure PBE entropy on
    the goal space.

Where the reference loops over python module lists (ensembles) or calls
torch.cdist per batch, here ensembles are vmapped parameter stacks and the
kNN entropy is one matmul + top_k inside the fused update.
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
from ..models.networks import mlp
from ..ops.pbe import RMSState, pbe, rms_update
from .base import MetaDict
from .ddpg import DDPGAgent, DDPGConfig, DDPGTrainState

Array = jnp.ndarray


class IntrinsicTrainState(struct.PyTreeNode):
    ddpg: DDPGTrainState
    module_params: tp.Any
    module_opt_state: tp.Any
    rms: RMSState


@dataclasses.dataclass(frozen=True)
class IntrinsicConfig(DDPGConfig):
    reward_free: bool = True  # use the intrinsic reward for training
    goal_space: tp.Optional[str] = None
    knn_rms: bool = True
    knn_k: int = 12
    knn_avg: bool = True
    knn_clip: float = 0.0001


class IntrinsicDDPGAgent:
    """Base: DDPG plus an auxiliary module and an intrinsic reward.

    Subclasses define ``_module`` (flax module or None), ``_module_loss``
    and ``_intrinsic_reward``; everything runs in ONE jitted update.
    """

    meta_dim: int = 0

    def __init__(self, cfg: IntrinsicConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.goal_dim = goal_dim if goal_dim is not None else obs_dim
        self.ddpg = DDPGAgent(cfg, obs_dim, action_dim, meta_dim=self.meta_dim)
        self.module = self._make_module()
        self.module_opt = optax.adam(cfg.lr) if self.module is not None else None
        self.act = self.ddpg.act
        self.update = jax.jit(self._update, donate_argnums=0)

    # -- subclass hooks --------------------------------------------------
    def _make_module(self) -> tp.Optional[nn.Module]:
        return None

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        raise NotImplementedError

    def _module_loss(self, module_params: tp.Any, batch: EpisodeBatch,
                     goal: Array, next_goal: Array, key: jax.Array
                     ) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        raise NotImplementedError

    def _intrinsic_reward(self, state: IntrinsicTrainState,
                          batch: EpisodeBatch, goal: Array, next_goal: Array,
                          key: jax.Array) -> tp.Tuple[Array, RMSState]:
        raise NotImplementedError

    # -- uniform policy interface ----------------------------------------
    def policy_act(self, state: IntrinsicTrainState, obs: Array,
                   meta: MetaDict, step: Array, key: jax.Array,
                   eval_mode: bool = False) -> Array:
        return self.ddpg.act(state.ddpg, obs, meta, step, key,
                             eval_mode=eval_mode)

    def rollout_update_meta(self, state: tp.Any, meta: MetaDict, t: Array,
                            key: jax.Array) -> MetaDict:
        skill_key = "skill" if "skill" in meta else ("z" if "z" in meta else None)
        every = getattr(self.cfg, "update_skill_every_step", 0)
        if skill_key is None or not every:
            return meta
        skill = meta[skill_key]
        n, k = skill.shape
        new = jax.nn.one_hot(jax.random.randint(key, (n,), 0, k), k)
        resample = (t % every) == 0
        return {**meta, skill_key: jnp.where(resample, new, skill)}

    # -- meta ------------------------------------------------------------
    def init_meta(self, state: tp.Any, key: jax.Array) -> MetaDict:
        return {}

    def update_meta(self, state: tp.Any, meta: MetaDict, global_step: int,
                    key: jax.Array) -> MetaDict:
        return meta

    # -- construction ----------------------------------------------------
    def init(self, key: jax.Array) -> IntrinsicTrainState:
        k_ddpg, k_mod = jax.random.split(key)
        ddpg_state = self.ddpg.init(k_ddpg)
        module_params = None
        module_opt_state = None
        if self.module is not None:
            module_params = self.module.init(k_mod, *self._module_init_args())
            module_opt_state = self.module_opt.init(module_params)
        return IntrinsicTrainState(
            ddpg=ddpg_state,
            module_params=module_params,
            module_opt_state=module_opt_state,
            rms=RMSState.create(),
        )

    # -- fused update ----------------------------------------------------
    def _update(self, state: IntrinsicTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[IntrinsicTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_mod, k_intr, k_ddpg = jax.random.split(key, 3)
        goal = batch.goal if (cfg.goal_space is not None and batch.goal
                              is not None) else batch.obs
        next_goal = batch.next_goal if (cfg.goal_space is not None and
                                        batch.next_goal is not None) else batch.next_obs
        metrics: tp.Dict[str, Array] = {}

        module_params = state.module_params
        module_opt_state = state.module_opt_state
        if self.module is not None:
            (mod_loss, mod_metrics), grads = jax.value_and_grad(
                self._module_loss, has_aux=True)(
                state.module_params, batch, goal, next_goal, k_mod)
            updates, module_opt_state = self.module_opt.update(
                grads, state.module_opt_state, state.module_params)
            module_params = optax.apply_updates(state.module_params, updates)
            metrics.update(mod_metrics)
        state = state.replace(module_params=module_params,
                              module_opt_state=module_opt_state)

        rms = state.rms
        reward = batch.reward
        if cfg.reward_free:
            reward, rms = self._intrinsic_reward(state, batch, goal,
                                                 next_goal, k_intr)
            reward = jax.lax.stop_gradient(reward)
            metrics["intr_reward"] = reward.mean()

        # use_reward_model=False: the batch reward IS the intrinsic reward
        # (the reference's intrinsic agents bypass DDPG's reward-free
        # reward-model substitution by overriding update(), rnd.py:127-187)
        ddpg_state, ddpg_metrics = self.ddpg._update(
            state.ddpg, batch.replace(reward=reward), k_ddpg,
            use_reward_model=False)
        metrics.update(ddpg_metrics)
        return state.replace(ddpg=ddpg_state, rms=rms), metrics


# ================================================================== RND

@dataclasses.dataclass(frozen=True)
class RNDConfig(IntrinsicConfig):
    name: str = "rnd"
    rnd_rep_dim: int = 512
    rnd_scale: float = 1.0


class _RNDNets(nn.Module):
    hidden_dim: int
    rep_dim: int

    @nn.compact
    def __call__(self, obs: Array) -> tp.Tuple[Array, Array]:
        # running obs normalization (BatchNorm1d affine=False analogue):
        # normalize by batch statistics under jit
        mean = jnp.mean(obs, axis=0, keepdims=True)
        std = jnp.std(obs, axis=0, keepdims=True) + 1e-5
        obs = jnp.clip((obs - mean) / std, -5.0, 5.0)
        pred = mlp(self.hidden_dim, "irelu", self.hidden_dim, "irelu",
                   self.rep_dim)(obs)
        target = mlp(self.hidden_dim, "irelu", self.hidden_dim, "irelu",
                     self.rep_dim)(obs)
        return pred, jax.lax.stop_gradient(target)


class RNDAgent(IntrinsicDDPGAgent):
    cfg: RNDConfig

    def _make_module(self) -> nn.Module:
        return _RNDNets(hidden_dim=self.cfg.hidden_dim,
                        rep_dim=self.cfg.rnd_rep_dim)

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        return (jnp.zeros((2, self.goal_dim)),)

    def _pred_error(self, module_params: tp.Any, goal: Array) -> Array:
        pred, target = self.module.apply(module_params, goal)
        return jnp.mean(jnp.square(target - pred), axis=-1, keepdims=True)

    def _module_loss(self, module_params, batch, goal, next_goal, key):
        err = self._pred_error(module_params, goal)
        return err.mean(), {"rnd_loss": err.mean()}

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        err = self._pred_error(state.module_params, goal)
        rms, _, std = rms_update(state.rms, err)
        return self.cfg.rnd_scale * err / (std + 1e-8), rms


# ================================================================ DIAYN

@dataclasses.dataclass(frozen=True)
class DIAYNConfig(IntrinsicConfig):
    name: str = "diayn"
    skill_dim: int = 16
    diayn_scale: float = 1.0
    update_skill_every_step: int = 50


class DIAYNAgent(IntrinsicDDPGAgent):
    cfg: DIAYNConfig

    @property
    def meta_dim(self) -> int:  # type: ignore[override]
        return self.cfg.skill_dim

    def __init__(self, cfg: DIAYNConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self._skill_dim = cfg.skill_dim
        super().__init__(cfg, obs_dim, action_dim, goal_dim)

    def _make_module(self) -> nn.Module:
        return mlp(self.cfg.hidden_dim, "irelu", self.cfg.hidden_dim,
                   "irelu", self._skill_dim)

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        return (jnp.zeros((2, self.obs_dim)),)

    def init_meta(self, state: tp.Any, key: jax.Array) -> MetaDict:
        idx = jax.random.randint(key, (), 0, self._skill_dim)
        return {"skill": jax.nn.one_hot(idx, self._skill_dim)}

    def update_meta(self, state, meta, global_step, key):
        if global_step % self.cfg.update_skill_every_step == 0:
            return self.init_meta(state, key)
        return meta

    def _module_loss(self, module_params, batch, goal, next_goal, key):
        skill = batch.meta["skill"]
        z_hat = jnp.argmax(skill, axis=1)
        logits = self.module.apply(module_params, batch.next_obs)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, z_hat).mean()
        acc = jnp.mean(jnp.argmax(logits, axis=1) == z_hat)
        return loss, {"diayn_loss": loss, "diayn_acc": acc}

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        skill = batch.meta["skill"]
        z_hat = jnp.argmax(skill, axis=1)
        logits = self.module.apply(state.module_params, batch.next_obs)
        log_softmax = jax.nn.log_softmax(logits, axis=1)
        reward = (log_softmax[jnp.arange(logits.shape[0]), z_hat]
                  - math.log(1.0 / self._skill_dim))
        return self.cfg.diayn_scale * reward[:, None], state.rms


# ================================================================== ICM

@dataclasses.dataclass(frozen=True)
class ICMConfig(IntrinsicConfig):
    name: str = "icm"
    icm_scale: float = 1.0


class _ICMNets(nn.Module):
    obs_dim: int
    action_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, obs: Array, action: Array, next_obs: Array
                 ) -> tp.Tuple[Array, Array]:
        next_hat = mlp(self.hidden_dim, "irelu", self.obs_dim)(
            jnp.concatenate([obs, action], -1))
        action_hat = mlp(self.hidden_dim, "irelu", self.action_dim, "tanh")(
            jnp.concatenate([obs, next_obs], -1))
        fwd_err = jnp.linalg.norm(next_obs - next_hat, axis=-1, keepdims=True)
        bwd_err = jnp.linalg.norm(action - action_hat, axis=-1, keepdims=True)
        return fwd_err, bwd_err


class ICMAgent(IntrinsicDDPGAgent):
    cfg: ICMConfig

    def _make_module(self) -> nn.Module:
        return _ICMNets(obs_dim=self.obs_dim, action_dim=self.action_dim,
                        hidden_dim=self.cfg.hidden_dim)

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        o = jnp.zeros((2, self.obs_dim))
        return (o, jnp.zeros((2, self.action_dim)), o)

    def _module_loss(self, module_params, batch, goal, next_goal, key):
        fwd, bwd = self.module.apply(module_params, batch.obs, batch.action,
                                     batch.next_obs)
        loss = fwd.mean() + bwd.mean()
        return loss, {"icm_loss": loss}

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        fwd, _ = self.module.apply(state.module_params, batch.obs,
                                   batch.action, batch.next_obs)
        return self.cfg.icm_scale * fwd, state.rms


# =============================================================== ICM-APT

@dataclasses.dataclass(frozen=True)
class ICMAPTConfig(IntrinsicConfig):
    name: str = "icm_apt"
    icm_rep_dim: int = 512
    knn_clip: float = 0.0
    knn_k: int = 12
    rep: str = "icm"  # "icm" | "identity" (the ind_apt/state_apt ablations)


class _APTNets(nn.Module):
    obs_dim: int
    action_dim: int
    hidden_dim: int
    rep_dim: int

    def setup(self) -> None:
        self.trunk = mlp(self.rep_dim, "ntanh")
        self.forward_net = mlp(self.hidden_dim, "irelu", self.rep_dim)
        self.backward_net = mlp(self.hidden_dim, "irelu", self.action_dim,
                                "tanh")

    def rep(self, obs: Array) -> Array:
        return self.trunk(obs)

    def __call__(self, obs: Array, action: Array, next_obs: Array
                 ) -> tp.Tuple[Array, Array]:
        h = self.trunk(obs)
        next_h = self.trunk(next_obs)
        next_hat = self.forward_net(jnp.concatenate([h, action], -1))
        action_hat = self.backward_net(jnp.concatenate([h, next_h], -1))
        fwd_err = jnp.linalg.norm(next_h - next_hat, axis=-1, keepdims=True)
        bwd_err = jnp.linalg.norm(action - action_hat, axis=-1, keepdims=True)
        return fwd_err, bwd_err


class ICMAPTAgent(IntrinsicDDPGAgent):
    cfg: ICMAPTConfig

    def _make_module(self) -> tp.Optional[nn.Module]:
        if self.cfg.rep == "identity":
            return None
        return _APTNets(obs_dim=self.obs_dim, action_dim=self.action_dim,
                        hidden_dim=self.cfg.hidden_dim,
                        rep_dim=self.cfg.icm_rep_dim)

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        o = jnp.zeros((2, self.obs_dim))
        return (o, jnp.zeros((2, self.action_dim)), o)

    def _module_loss(self, module_params, batch, goal, next_goal, key):
        fwd, bwd = self.module.apply(module_params, batch.obs, batch.action,
                                     batch.next_obs)
        loss = fwd.mean() + bwd.mean()
        return loss, {"icm_loss": loss}

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        if self.module is None:  # identity-representation ablation
            rep = batch.obs
        else:
            rep = self.module.apply(state.module_params, batch.obs,
                                    method=self.module.rep)
        reward, rms = pbe(rep, state.rms, knn_k=self.cfg.knn_k,
                          knn_avg=self.cfg.knn_avg,
                          knn_clip=self.cfg.knn_clip,
                          knn_rms=self.cfg.knn_rms)
        return reward, rms


# ========================================================== Disagreement

@dataclasses.dataclass(frozen=True)
class DisagreementConfig(IntrinsicConfig):
    name: str = "disagreement"
    n_models: int = 5


class _Ensemble(nn.Module):
    """Vmapped ensemble of forward models (the reference's ModuleList loop,
    disagreement.py:16-51, collapsed into one batched parameter stack)."""

    obs_dim: int
    hidden_dim: int
    n_models: int

    @nn.compact
    def __call__(self, obs: Array, action: Array) -> Array:
        x = jnp.concatenate([obs, action], -1)
        net = nn.vmap(
            MLPWrap, in_axes=None, out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            axis_size=self.n_models,
        )(hidden_dim=self.hidden_dim, out_dim=self.obs_dim)
        return net(x)  # [n_models, batch, obs_dim]


class MLPWrap(nn.Module):
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return mlp(self.hidden_dim, "irelu", self.out_dim)(x)


class DisagreementAgent(IntrinsicDDPGAgent):
    cfg: DisagreementConfig

    def _make_module(self) -> nn.Module:
        return _Ensemble(obs_dim=self.obs_dim, hidden_dim=self.cfg.hidden_dim,
                         n_models=self.cfg.n_models)

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        return (jnp.zeros((2, self.obs_dim)), jnp.zeros((2, self.action_dim)))

    def _module_loss(self, module_params, batch, goal, next_goal, key):
        preds = self.module.apply(module_params, batch.obs, batch.action)
        err = jnp.linalg.norm(batch.next_obs[None] - preds, axis=-1)
        loss = err.mean()
        return loss, {"disagreement_loss": loss}

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        preds = self.module.apply(state.module_params, batch.obs, batch.action)
        reward = jnp.var(preds, axis=0).mean(axis=-1, keepdims=True)
        return reward, state.rms


# ================================================================ MaxEnt

@dataclasses.dataclass(frozen=True)
class MaxEntConfig(IntrinsicConfig):
    name: str = "max_ent"
    knn_k: int = 12


class MaxEntAgent(IntrinsicDDPGAgent):
    cfg: MaxEntConfig

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        reward, rms = pbe(next_goal, state.rms, knn_k=self.cfg.knn_k,
                          knn_avg=self.cfg.knn_avg,
                          knn_clip=self.cfg.knn_clip,
                          knn_rms=self.cfg.knn_rms)
        return reward, rms
