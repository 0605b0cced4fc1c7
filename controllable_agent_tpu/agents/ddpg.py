"""DDPGAgent — twin-critic DDPG base agent.

Functional re-design of the reference DDPGAgent
(url_benchmark/agent/ddpg.py:223-403): TruncatedNormal exploration policy,
twin critics with min-target, optional meta-vector concatenation (the skill
agents build on this), and the reward-free mode that fits a reward model by
regression before offline training (reference train_reward :269-308, run
here as one jitted lax.scan).

Supports both observation types of the reference: flat states, and
``obs_type="pixels"`` with the 4-conv PixelEncoder + DrQ random-shift
augmentation (reference Encoder ddpg.py:56-75, RandomShiftsAug
utils.py:258-290). As in the reference update (ddpg.py:394-403), encoder
gradients flow only through the critic loss, next_obs features are
stop-gradient, and the actor sees detached features. Pixel observations
arrive flat (spec.obs_shape carries H,W,C) and are reshaped at the agent
boundary.
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
from ..models.networks import mlp
from ..utils.distributions import TruncatedNormal
from ..utils.schedules import schedule
from ..utils.tree import soft_update
from .base import MetaDict

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT


@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    """Mirror of DDPGAgentConfig (url_benchmark/agent/ddpg.py:28-50)."""

    name: str = "ddpg"
    reward_free: bool = False
    lr: float = 1e-4
    critic_target_tau: float = 0.01
    update_every_steps: int = 2
    hidden_dim: int = 1024
    feature_dim: int = 50
    stddev_schedule: str = "0.2"
    stddev_clip: float = 0.3
    nstep: int = 3
    batch_size: int = 1024
    init_critic: bool = True
    num_expl_steps: int = 0
    compute_dtype: str = "float32"
    # pixels path (reference ddpg.py:56-75 / base_config obs_type)
    obs_type: str = "states"
    aug_pad: int = 4
    update_encoder: bool = True


class DDPGActor(nn.Module):
    """trunk(LN+Tanh) -> policy MLP -> tanh mean (reference ddpg.py:78-113)."""

    action_dim: int
    hidden_dim: int
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        h = mlp(self.hidden_dim, "ntanh", dtype=self.dtype)(obs)
        mu = mlp(self.hidden_dim, "irelu", self.action_dim, dtype=self.dtype)(h)
        return jnp.tanh(mu)


class DDPGCritic(nn.Module):
    """Twin Q over (obs, action) (reference ddpg.py:116-164, states path)."""

    hidden_dim: int
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, obs: Array, action: Array) -> tp.Tuple[Array, Array]:
        h = mlp(self.hidden_dim, "ntanh", dtype=self.dtype)(
            jnp.concatenate([obs, action], axis=-1))
        q1 = mlp(self.hidden_dim, "irelu", 1, dtype=self.dtype)(h)
        q2 = mlp(self.hidden_dim, "irelu", 1, dtype=self.dtype)(h)
        return q1, q2


class DDPGTrainState(struct.PyTreeNode):
    step: Array
    actor_params: tp.Any
    critic_params: tp.Any
    target_critic_params: tp.Any
    actor_opt_state: tp.Any
    critic_opt_state: tp.Any
    reward_params: tp.Any = None
    reward_opt_state: tp.Any = None
    encoder_params: tp.Any = None
    encoder_opt_state: tp.Any = None


def _conv_repr_dim(h: int, w: int) -> int:
    """Flattened PixelEncoder output (3x3 VALID convs, strides 2,1,1,1)."""
    oh, ow = (h - 3) // 2 + 1, (w - 3) // 2 + 1
    return 32 * (oh - 6) * (ow - 6)


class DDPGAgent:
    def __init__(self, cfg: DDPGConfig, obs_dim: int, action_dim: int,
                 meta_dim: int = 0,
                 obs_shape: tp.Tuple[int, ...] = ()) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.meta_dim = meta_dim
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.pixels = cfg.obs_type == "pixels"
        self.obs_shape = tuple(obs_shape)
        self.encoder = None
        self.encoder_opt = None
        if self.pixels:
            from ..models.networks import PixelEncoder
            if len(self.obs_shape) != 3:
                raise ValueError("obs_type=pixels needs an (H, W, C) "
                                 f"obs_shape, got {self.obs_shape}")
            self.encoder = PixelEncoder(dtype=dtype)
            self.encoder_opt = optax.adam(cfg.lr)
            # downstream nets consume encoded features, not raw pixels
            self.obs_dim = _conv_repr_dim(self.obs_shape[0],
                                          self.obs_shape[1])
        self.actor = DDPGActor(action_dim=action_dim, hidden_dim=cfg.hidden_dim,
                               dtype=dtype)
        self.critic = DDPGCritic(hidden_dim=cfg.hidden_dim, dtype=dtype)
        self.reward_model = (mlp(cfg.hidden_dim, "irelu", cfg.hidden_dim,
                                 "irelu", 1, dtype=dtype)
                             if cfg.reward_free else None)
        self.actor_opt = optax.adam(cfg.lr)
        self.critic_opt = optax.adam(cfg.lr)
        self.reward_opt = optax.adam(1e-3) if cfg.reward_free else None
        self._stddev = schedule(cfg.stddev_schedule)

        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))

    @property
    def _in_dim(self) -> int:
        return self.obs_dim + self.meta_dim

    def _encode(self, encoder_params: tp.Any, obs: Array) -> Array:
        """Flat pixel obs [B, H*W*C] -> encoder features [B, D]."""
        assert self.encoder is not None
        imgs = obs.reshape((obs.shape[0],) + self.obs_shape)
        return self.encoder.apply(encoder_params, imgs)

    def init(self, key: jax.Array) -> DDPGTrainState:
        k_actor, k_critic, k_rew, k_enc = jax.random.split(key, 4)
        encoder_params = None
        encoder_opt_state = None
        if self.pixels:
            assert self.encoder is not None and self.encoder_opt is not None
            encoder_params = self.encoder.init(
                k_enc, jnp.zeros((1,) + self.obs_shape))
            encoder_opt_state = self.encoder_opt.init(encoder_params)
        obs = jnp.zeros((1, self._in_dim))
        action = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k_actor, obs)
        critic_params = self.critic.init(k_critic, obs, action)
        reward_params = None
        reward_opt_state = None
        if self.reward_model is not None:
            reward_params = self.reward_model.init(k_rew, obs)
            assert self.reward_opt is not None
            reward_opt_state = self.reward_opt.init(reward_params)
        return DDPGTrainState(
            encoder_params=encoder_params,
            encoder_opt_state=encoder_opt_state,
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=jax.tree.map(jnp.copy, critic_params),
            actor_opt_state=self.actor_opt.init(actor_params),
            critic_opt_state=self.critic_opt.init(critic_params),
            reward_params=reward_params,
            reward_opt_state=reward_opt_state,
        )

    # -- uniform policy interface ----------------------------------------
    def policy_act(self, state: "DDPGTrainState", obs: Array, meta: MetaDict,
                   step: Array, key: jax.Array,
                   eval_mode: bool = False) -> Array:
        return self.act(state, obs, meta, step, key, eval_mode=eval_mode)

    def rollout_update_meta(self, state: "DDPGTrainState", meta: MetaDict,
                            t: Array, key: jax.Array) -> MetaDict:
        return meta

    # -- meta (none for plain DDPG) --------------------------------------
    def init_meta(self, state: DDPGTrainState, key: jax.Array) -> MetaDict:
        return {}

    def update_meta(self, state: DDPGTrainState, meta: MetaDict,
                    global_step: int, key: jax.Array) -> MetaDict:
        return meta

    @staticmethod
    def _with_meta(obs: Array, meta: MetaDict) -> Array:
        parts = [obs] + [meta[k] for k in sorted(meta)]
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else obs

    # -- acting ----------------------------------------------------------
    def _act(self, state: DDPGTrainState, obs: Array, meta: MetaDict,
             step: Array, key: jax.Array, eval_mode: bool = False) -> Array:
        if self.pixels:
            obs = self._encode(state.encoder_params, obs)
        inpt = self._with_meta(obs, meta)
        mu = self.actor.apply(state.actor_params, inpt)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_sample, k_expl = jax.random.split(key)
        action = dist.sample(k_sample)
        expl = jax.random.uniform(k_expl, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    # -- reward model (reward-free mode) ---------------------------------
    def train_reward(self, state: DDPGTrainState, obs: Array, reward: Array,
                     num_iters: int = 2000) -> DDPGTrainState:
        """Fit reward_model(obs) ≈ reward by regression; one jitted scan
        (reference train_reward, ddpg.py:269-308)."""
        assert self.reward_model is not None and self.reward_opt is not None

        def loss_fn(params: tp.Any) -> Array:
            pred = self.reward_model.apply(params, obs)
            return jnp.mean(jnp.square(pred - reward))

        def step_fn(carry: tp.Tuple[tp.Any, tp.Any], _: None
                    ) -> tp.Tuple[tp.Tuple[tp.Any, tp.Any], Array]:
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.reward_opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step_fn, (state.reward_params, state.reward_opt_state), None,
            length=num_iters)
        return state.replace(reward_params=params, reward_opt_state=opt_state)

    # -- losses ----------------------------------------------------------
    def _critic_loss(self, critic_params: tp.Any, state: DDPGTrainState,
                     obs: Array, action: Array, reward: Array, discount: Array,
                     next_obs: Array, key: jax.Array
                     ) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        mu = self.actor.apply(state.actor_params, next_obs)
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
        next_action = jax.lax.stop_gradient(
            dist.sample(key, clip=self.cfg.stddev_clip))
        tq1, tq2 = self.critic.apply(state.target_critic_params, next_obs,
                                     next_action)
        target_q = jax.lax.stop_gradient(
            reward + discount * jnp.minimum(tq1, tq2))
        q1, q2 = self.critic.apply(critic_params, obs, action)
        loss = (jnp.mean(jnp.square(q1 - target_q))
                + jnp.mean(jnp.square(q2 - target_q)))
        return loss, {"critic_target_q": target_q.mean(), "critic_q1": q1.mean(),
                      "critic_q2": q2.mean(), "critic_loss": loss}

    def _actor_loss(self, actor_params: tp.Any, critic_params: tp.Any,
                    state: DDPGTrainState, obs: Array, key: jax.Array
                    ) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        mu = self.actor.apply(actor_params, obs)
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
        action = dist.sample(key, clip=self.cfg.stddev_clip)
        q1, q2 = self.critic.apply(critic_params, obs, action)
        q = jnp.minimum(q1, q2)
        loss = -jnp.mean(q)
        return loss, {"actor_loss": loss,
                      "actor_logprob": dist.log_prob(action).sum(-1).mean()}

    # -- the fused update step -------------------------------------------
    def _update(self, state: DDPGTrainState, batch: EpisodeBatch,
                key: jax.Array, use_reward_model: tp.Optional[bool] = None
                ) -> tp.Tuple[DDPGTrainState, tp.Dict[str, Array]]:
        """One gradient step (reference ddpg.py:370-403).

        ``use_reward_model``: substitute reward_model(next_obs) for the
        batch reward. Defaults to ``cfg.reward_free`` — the plain-DDPG
        reward-free protocol (reference ddpg.py:379-382). Intrinsic agents
        (RND/ICM/... , which in the reference OVERRIDE update() and feed
        their own reward straight to update_critic, rnd.py:127-187) must
        pass False: their batch already carries the intrinsic reward.
        """
        cfg = self.cfg
        if use_reward_model is None:
            use_reward_model = cfg.reward_free
        k_critic, k_actor, k_aug1, k_aug2 = jax.random.split(key, 4)
        encoder_opt_state = state.encoder_opt_state

        if self.pixels:
            # augment raw frames, encode; grads reach the encoder through
            # the critic loss only (reference ddpg.py:377-384,394-399)
            from ..ops.augment import random_shift_aug
            bshape = (batch.obs.shape[0],) + self.obs_shape
            obs_aug = random_shift_aug(
                k_aug1, batch.obs.reshape(bshape), cfg.aug_pad)
            next_aug = random_shift_aug(
                k_aug2, batch.next_obs.reshape(bshape), cfg.aug_pad)
            obs_aug = obs_aug.reshape(batch.obs.shape)
            next_aug = next_aug.reshape(batch.next_obs.shape)
            next_obs = jax.lax.stop_gradient(self._with_meta(
                self._encode(state.encoder_params, next_aug), batch.meta))

            reward = batch.reward
            if use_reward_model:
                reward = jax.lax.stop_gradient(
                    self.reward_model.apply(state.reward_params, next_obs))

            def enc_critic_loss(params: tp.Tuple[tp.Any, tp.Any]
                                ) -> tp.Tuple[Array, tp.Dict[str, Array]]:
                critic_params, enc_params = params
                obs_feat = self._with_meta(
                    self._encode(enc_params, obs_aug), batch.meta)
                return self._critic_loss(
                    critic_params, state, obs_feat, batch.action, reward,
                    batch.discount, next_obs, k_critic)

            (_, critic_metrics), (critic_grads, enc_grads) = (
                jax.value_and_grad(enc_critic_loss, has_aux=True)(
                    (state.critic_params, state.encoder_params)))
            if cfg.update_encoder:
                assert self.encoder_opt is not None
                enc_updates, encoder_opt_state = self.encoder_opt.update(
                    enc_grads, state.encoder_opt_state, state.encoder_params)
                encoder_params = optax.apply_updates(
                    state.encoder_params, enc_updates)
            else:
                encoder_params = state.encoder_params
            # actor sees detached features (reference obs.detach(), :399)
            obs = jax.lax.stop_gradient(self._with_meta(
                self._encode(state.encoder_params, obs_aug), batch.meta))
        else:
            encoder_params = state.encoder_params
            obs = self._with_meta(batch.obs, batch.meta)
            next_obs = self._with_meta(batch.next_obs, batch.meta)
            reward = batch.reward
            if use_reward_model:
                reward = self.reward_model.apply(state.reward_params, next_obs)
                reward = jax.lax.stop_gradient(reward)

            (_, critic_metrics), critic_grads = jax.value_and_grad(
                self._critic_loss, has_aux=True)(
                state.critic_params, state, obs, batch.action, reward,
                batch.discount, next_obs, k_critic)
        critic_updates, critic_opt_state = self.critic_opt.update(
            critic_grads, state.critic_opt_state, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, critic_updates)

        (_, actor_metrics), actor_grads = jax.value_and_grad(
            self._actor_loss, has_aux=True)(
            state.actor_params, critic_params, state, obs, k_actor)
        actor_updates, actor_opt_state = self.actor_opt.update(
            actor_grads, state.actor_opt_state, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, actor_updates)

        new_state = state.replace(
            step=state.step + 1,
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=soft_update(
                critic_params, state.target_critic_params, cfg.critic_target_tau),
            actor_opt_state=actor_opt_state,
            critic_opt_state=critic_opt_state,
            encoder_params=encoder_params,
            encoder_opt_state=encoder_opt_state,
        )
        metrics = {"batch_reward": reward.mean(), **critic_metrics,
                   **actor_metrics}
        return new_state, metrics
