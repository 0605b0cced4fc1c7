"""SMMAgent — State Marginal Matching.

Functional re-design of the reference SMMAgent (url_benchmark/agent/smm.py):
one-hot skill z (z_dim=4, smm.yaml:6), a VAE density model over [obs, z]
(code_dim 128, beta 0.5; smm.py:33-77), a skill predictor net (:101-124),
and the composite intrinsic reward
  r = state_ent_coef·h(s|z) + latent_ent_coef·log K + latent_cond_ent_coef·h(z|s)
(reference update, smm.py:252-303). The policy/critic consume [obs, z]
through the DDPG meta concat.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.networks import mlp
from .base import MetaDict
from .exploration import IntrinsicConfig, IntrinsicDDPGAgent

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SMMConfig(IntrinsicConfig):
    name: str = "smm"
    z_dim: int = 4
    sknn_hidden_dim: int = 128
    vae_beta: float = 0.5
    code_dim: int = 128
    state_ent_coef: float = 1.0
    latent_ent_coef: float = 1.0
    latent_cond_ent_coef: float = 1.0
    update_skill_every_step: int = 50


class _SMMNets(nn.Module):
    """VAE over [obs, z] + skill predictor (reference smm.py:33-124)."""

    obs_z_dim: int
    z_dim: int
    hidden_dim: int
    code_dim: int

    def setup(self) -> None:
        self.enc = mlp(150, "irelu", 150, "irelu")
        self.enc_mu = mlp(self.code_dim)
        self.enc_logvar = mlp(self.code_dim)
        self.dec = mlp(150, "irelu", 150, "irelu", self.obs_z_dim)
        self.z_pred_net = mlp(self.hidden_dim, "irelu", self.hidden_dim,
                              "irelu", self.z_dim)

    def vae_loss(self, obs_z: Array, eps: Array) -> tp.Tuple[Array, Array]:
        h = self.enc(obs_z)
        mu, logvar = self.enc_mu(h), self.enc_logvar(h)
        stds = jnp.exp(0.5 * logvar)
        code = eps * stds + mu
        recon = self.dec(code)
        kle = -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar),
                             axis=1).mean()
        sq = jnp.square(obs_z - recon)
        # h(s|z): per-sample summed reconstruction error (smm.py:69-77)
        h_s_z = jnp.sum(sq, axis=1, keepdims=True)
        return kle * 1.0, h_s_z

    def predict_logits(self, obs: Array) -> Array:
        return self.z_pred_net(obs)

    def __call__(self, obs_z: Array, obs: Array, eps: Array
                 ) -> tp.Tuple[Array, Array, Array]:
        kle, h_s_z = self.vae_loss(obs_z, eps)
        return kle, h_s_z, self.predict_logits(obs)


class SMMAgent(IntrinsicDDPGAgent):
    cfg: SMMConfig

    @property
    def meta_dim(self) -> int:  # type: ignore[override]
        return self.cfg.z_dim

    def __init__(self, cfg: SMMConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self._z_dim = cfg.z_dim
        super().__init__(cfg, obs_dim, action_dim, goal_dim)

    def _make_module(self) -> nn.Module:
        return _SMMNets(obs_z_dim=self.obs_dim + self._z_dim,
                        z_dim=self._z_dim, hidden_dim=self.cfg.hidden_dim,
                        code_dim=self.cfg.code_dim)

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        return (jnp.zeros((2, self.obs_dim + self._z_dim)),
                jnp.zeros((2, self.obs_dim)),
                jnp.zeros((2, self.cfg.code_dim)))

    def init_meta(self, state: tp.Any, key: jax.Array) -> MetaDict:
        idx = jax.random.randint(key, (), 0, self._z_dim)
        return {"z": jax.nn.one_hot(idx, self._z_dim)}

    def update_meta(self, state, meta, global_step, key):
        if global_step % self.cfg.update_skill_every_step == 0:
            return self.init_meta(state, key)
        return meta

    def _module_loss(self, module_params, batch, goal, next_goal, key):
        z = batch.meta["z"]
        obs_z = jnp.concatenate([batch.obs, z], -1)
        eps = jax.random.normal(key, (obs_z.shape[0], self.cfg.code_dim))
        kle, h_s_z, logits = self.module.apply(module_params, obs_z,
                                               batch.obs, eps)
        recon_loss = h_s_z.mean() / obs_z.shape[1]
        z_labels = jnp.argmax(z, axis=1)
        pred_loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, z_labels).mean()
        loss = self.cfg.vae_beta * kle + recon_loss + pred_loss
        return loss, {"loss_vae": self.cfg.vae_beta * kle + recon_loss,
                      "loss_pred": pred_loss}

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        z = batch.meta["z"]
        obs_z = jnp.concatenate([batch.obs, z], -1)
        eps = jax.random.normal(key, (obs_z.shape[0], self.cfg.code_dim))
        _, h_s_z, logits = self.module.apply(state.module_params, obs_z,
                                             batch.obs, eps)
        z_labels = jnp.argmax(z, axis=1)
        h_z_s = optax.softmax_cross_entropy_with_integer_labels(
            logits, z_labels)[:, None]
        h_z = math.log(self._z_dim)
        reward = (self.cfg.state_ent_coef * h_s_z
                  + self.cfg.latent_ent_coef * h_z
                  + self.cfg.latent_cond_ent_coef * h_z_s)
        return reward, state.rms
