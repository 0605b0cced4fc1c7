"""SFAgent — successor features with pluggable φ learners.

Functional re-design of the reference SFAgent (url_benchmark/agent/sf.py):
twin successor net F(s,a,z) with min-Q-selected TD target
target_F = φ(s') + γ·F(s',a',z) (reference update_sf :594-631), optional
Q-space loss, actor on min(F·z), and the feature-learner zoo (:84-434):
random / identity / laplacian / contrastive (v1, v2) / icm / transition /
latent / autoencoder / svd_sr / svd_srv2 / svd_p — each a flax module with
a ``feature_net`` and a self-contained loss. Learners with internal target
networks (latent, svd_sr, svd_srv2) keep them inside their parameter tree;
the agent soft-updates the target subtrees after each gradient step (the
reference does this inline in the learner forward, sf.py:298-300).

Zero-shot inference: z = lstsq(φ(s), r) (reference :531-546) and goal
inference whitened by the pinv of the φ covariance (:502-529).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import chex
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..data.episode_batch import EpisodeBatch
from ..models.networks import Actor, DiagGaussianActor, ForwardMap, l2_normalize, mlp
from ..ops.fb import off_diagonal_mask, orthonormality_loss
from ..utils.distributions import SquashedNormal, TruncatedNormal
from ..utils.schedules import schedule
from ..utils.tree import soft_update
from .base import MetaDict, ZMetaMixin

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT


# ------------------------------------------------------------- learners

class FeatureLearner(nn.Module):
    """Base: random features φ (no loss). feature_net spec matches the
    reference (sf.py:84-91): obs -> hidden ntanh -> hidden relu -> z L2."""

    obs_dim: int
    action_dim: int
    z_dim: int
    hidden_dim: int

    def setup(self) -> None:
        self.feature_net = mlp(self.hidden_dim, "ntanh", self.hidden_dim,
                               "relu", self.z_dim, "L2")

    def features(self, obs: Array) -> Array:
        return self.feature_net(obs)

    def init_all(self, obs: Array, action: Array, next_obs: Array,
                 future_obs: tp.Optional[Array]) -> tp.Any:
        """Trace both the feature path and the loss path so init creates
        every parameter (some learners never call feature_net in their
        loss, e.g. the random-feature baseline)."""
        return self.features(obs), self(obs, action, next_obs, future_obs)

    def __call__(self, obs: Array, action: Array, next_obs: Array,
                 future_obs: tp.Optional[Array]) -> tp.Optional[Array]:
        return None

    # subtrees to soft-update after each step: (online_path, target_path)
    TARGET_PAIRS: tp.Tuple[tp.Tuple[str, str], ...] = ()


class Identity(FeatureLearner):
    def setup(self) -> None:
        pass

    def features(self, obs: Array) -> Array:
        return obs

    def __call__(self, obs, action, next_obs, future_obs):
        return None


class Laplacian(FeatureLearner):
    """|φ(s) − φ(s')|² + orthonormality (reference sf.py:100-116)."""

    def __call__(self, obs, action, next_obs, future_obs):
        phi = self.feature_net(obs)
        next_phi = self.feature_net(next_obs)
        loss = jnp.mean(jnp.square(phi - next_phi))
        orth, _, _ = orthonormality_loss(phi)
        return loss + orth


class ContrastiveFeature(FeatureLearner):
    """InfoNCE between φ(s) and μ(s_future) (reference sf.py:118-163)."""

    swap: bool = False  # v2 swaps which tower sees the future

    def setup(self) -> None:
        super().setup()
        self.mu_net = mlp(self.hidden_dim, "ntanh", self.hidden_dim,
                          "relu", self.z_dim, "L2")

    def __call__(self, obs, action, next_obs, future_obs):
        assert future_obs is not None
        if self.swap:
            a = l2_normalize(self.mu_net(obs), scale_sqrt_dim=False)
            b = l2_normalize(self.feature_net(future_obs), scale_sqrt_dim=False)
        else:
            a = l2_normalize(self.feature_net(obs), scale_sqrt_dim=False)
            b = l2_normalize(self.mu_net(future_obs), scale_sqrt_dim=False)
        logits = jnp.einsum("sd,td->st", a, b, precision=_PREC)
        n = logits.shape[0]
        off = off_diagonal_mask(n)
        neg = jnp.where(off, logits, -jnp.inf)
        loss = -jnp.diag(logits) + jax.nn.logsumexp(neg, axis=1)
        return loss.mean()


class ICM(FeatureLearner):
    """Inverse dynamics: predict a from (φ(s), φ(s'))
    (reference sf.py:194-213)."""

    def setup(self) -> None:
        super().setup()
        self.inverse_dynamic_net = mlp(self.hidden_dim, "irelu",
                                       self.hidden_dim, "irelu",
                                       self.action_dim, "tanh")

    def __call__(self, obs, action, next_obs, future_obs):
        phi = self.feature_net(obs)
        next_phi = self.feature_net(next_obs)
        pred = self.inverse_dynamic_net(
            jnp.concatenate([phi, next_phi], axis=-1))
        return jnp.mean(jnp.square(action - pred))


class TransitionModel(FeatureLearner):
    """Predict s' from (φ(s), a) (reference sf.py:215-228)."""

    def setup(self) -> None:
        super().setup()
        self.forward_dynamic_net = mlp(self.hidden_dim, "irelu",
                                       self.hidden_dim, "irelu", self.obs_dim)

    def __call__(self, obs, action, next_obs, future_obs):
        phi = self.feature_net(obs)
        pred = self.forward_dynamic_net(jnp.concatenate([phi, action], -1))
        return jnp.mean(jnp.square(pred - next_obs))


class TransitionLatentModel(FeatureLearner):
    """Predict target-φ(s') from (φ(s), a) with an EMA target net
    (reference sf.py:230-248)."""

    TARGET_PAIRS = (("feature_net", "target_feature_net"),)

    def setup(self) -> None:
        super().setup()
        self.forward_dynamic_net = mlp(self.hidden_dim, "irelu",
                                       self.hidden_dim, "irelu", self.z_dim)
        self.target_feature_net = mlp(self.hidden_dim, "ntanh",
                                      self.hidden_dim, "relu",
                                      self.z_dim, "L2")

    def __call__(self, obs, action, next_obs, future_obs):
        phi = self.feature_net(obs)
        next_phi = jax.lax.stop_gradient(self.target_feature_net(next_obs))
        pred = self.forward_dynamic_net(jnp.concatenate([phi, action], -1))
        return jnp.mean(jnp.square(pred - next_phi))


class AutoEncoder(FeatureLearner):
    """Reconstruct s from φ(s) (reference sf.py:250-264)."""

    def setup(self) -> None:
        super().setup()
        self.decoder = mlp(self.hidden_dim, "irelu", self.hidden_dim,
                           "irelu", self.obs_dim)

    def __call__(self, obs, action, next_obs, future_obs):
        phi = self.feature_net(obs)
        return jnp.mean(jnp.square(self.decoder(phi) - obs))


class SVDSR(FeatureLearner):
    """Successor-rate factorization φ(s)·μ(s') with EMA targets
    (reference sf.py:267-302). ``swap`` selects the v2 variant (:304-339)."""

    swap: bool = False
    TARGET_PAIRS = (("feature_net", "target_feature_net"),
                    ("mu_net", "target_mu_net"))

    def setup(self) -> None:
        super().setup()
        self.mu_net = mlp(self.hidden_dim, "ntanh", self.hidden_dim,
                          "relu", self.z_dim)
        self.target_feature_net = mlp(self.hidden_dim, "ntanh",
                                      self.hidden_dim, "relu",
                                      self.z_dim, "L2")
        self.target_mu_net = mlp(self.hidden_dim, "ntanh", self.hidden_dim,
                                 "relu", self.z_dim)

    def __call__(self, obs, action, next_obs, future_obs):
        if self.swap:
            phi = self.feature_net(next_obs)
            mu = self.mu_net(obs)
            sr = jnp.einsum("sd,td->st", mu, phi, precision=_PREC)
            t_phi = self.target_feature_net(next_obs)
            t_mu = self.target_mu_net(next_obs)
            target_sr = jnp.einsum("sd,td->st", t_mu, t_phi, precision=_PREC)
            gamma = 0.98
        else:
            phi = self.feature_net(obs)
            mu = self.mu_net(next_obs)
            sr = jnp.einsum("sd,td->st", phi, mu, precision=_PREC)
            t_phi = self.target_feature_net(next_obs)
            t_mu = self.target_mu_net(next_obs)
            target_sr = jnp.einsum("sd,td->st", t_phi, t_mu, precision=_PREC)
            gamma = 0.99
        target_sr = jax.lax.stop_gradient(target_sr)
        n = sr.shape[0]
        off = off_diagonal_mask(n)
        resid = jnp.where(off, sr - gamma * target_sr, 0.0)
        loss = (-2.0 * jnp.trace(sr) / n
                + jnp.sum(jnp.square(resid)) / (n * (n - 1)))
        orth, _, _ = orthonormality_loss(phi)
        return loss + orth


class SVDP(FeatureLearner):
    """Transition factorization μ(s,a)·φ(s') (reference sf.py:341-366)."""

    def setup(self) -> None:
        super().setup()
        self.mu_net = mlp(self.hidden_dim, "ntanh", self.hidden_dim,
                          "relu", self.z_dim)

    def __call__(self, obs, action, next_obs, future_obs):
        phi = self.feature_net(next_obs)
        mu = self.mu_net(jnp.concatenate([obs, action], -1))
        p = jnp.einsum("sd,td->st", mu, phi, precision=_PREC)
        n = p.shape[0]
        off = off_diagonal_mask(n)
        loss = (-2.0 * jnp.trace(p) / n
                + jnp.sum(jnp.where(off, jnp.square(p), 0.0)) / (n * (n - 1)))
        orth, _, _ = orthonormality_loss(phi)
        return loss + orth


class FBFeatures(FeatureLearner):
    """φ(s) = B(s) from a pretrained FB agent, frozen (reference
    FBFeatures, sf.py:368-380 — which torch.loads a checkpoint from a
    hardcoded cluster path; here the checkpointed backward params are
    grafted in explicitly via SFAgent.load_fb_features)."""

    def setup(self) -> None:
        from ..models.networks import BackwardMap
        # geometry matches the FB agent's backward net so a trained
        # FBTrainState.backward_params drops in directly
        self.feature_net = BackwardMap(z_dim=self.z_dim,
                                       hidden_dim=self.hidden_dim)

    def __call__(self, obs, action, next_obs, future_obs):
        return None  # frozen: no training loss


FEATURE_LEARNERS: tp.Dict[str, tp.Callable[..., FeatureLearner]] = {
    "random": FeatureLearner,
    "fb": FBFeatures,
    "identity": Identity,
    "lap": Laplacian,
    "contrastive": ContrastiveFeature,
    "contrastivev2": lambda **kw: ContrastiveFeature(swap=True, **kw),
    "icm": ICM,
    "transition": TransitionModel,
    "latent": TransitionLatentModel,
    "autoencoder": AutoEncoder,
    "svd_sr": SVDSR,
    "svd_srv2": lambda **kw: SVDSR(swap=True, **kw),
    "svd_p": SVDP,
}


@dataclasses.dataclass(frozen=True)
class SFConfig:
    """Mirror of SFAgentConfig (url_benchmark/agent/sf.py:40-78)."""

    name: str = "sf"
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
    log_std_bounds: tp.Tuple[float, float] = (-5.0, 2.0)
    temp: float = 1.0
    boltzmann: bool = False
    preprocess: bool = True
    num_sf_updates: int = 1
    feature_learner: str = "icm"
    mix_ratio: float = 0.0
    q_loss: bool = True
    add_trunk: bool = False
    num_expl_steps: int = 0
    learner_target_tau: float = 0.01
    compute_dtype: str = "float32"


class SFTrainState(struct.PyTreeNode):
    step: Array
    actor_params: tp.Any
    sf_params: tp.Any
    target_sf_params: tp.Any
    feature_params: tp.Any
    actor_opt_state: tp.Any
    sf_opt_state: tp.Any
    phi_opt_state: tp.Any
    inv_cov: Array


class SFAgent(ZMetaMixin):
    def __init__(self, cfg: SFConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        if cfg.feature_learner == "identity":
            cfg = dataclasses.replace(cfg, z_dim=goal_dim or obs_dim)
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.goal_dim = goal_dim if goal_dim is not None else obs_dim

        if cfg.boltzmann:
            self.actor: tp.Any = DiagGaussianActor(
                z_dim=cfg.z_dim, action_dim=action_dim,
                hidden_dim=cfg.hidden_dim,
                log_std_bounds=tuple(cfg.log_std_bounds))
        else:
            self.actor = Actor(
                z_dim=cfg.z_dim, action_dim=action_dim,
                feature_dim=cfg.feature_dim, hidden_dim=cfg.hidden_dim,
                preprocess=cfg.preprocess, add_trunk=cfg.add_trunk)
        self.successor_net = ForwardMap(
            z_dim=cfg.z_dim, feature_dim=cfg.feature_dim,
            hidden_dim=cfg.hidden_dim, preprocess=cfg.preprocess,
            add_trunk=cfg.add_trunk)
        if cfg.feature_learner not in FEATURE_LEARNERS:
            raise ValueError(f"Unknown feature learner {cfg.feature_learner!r};"
                             f" known: {sorted(FEATURE_LEARNERS)}")
        self.feature_learner = FEATURE_LEARNERS[cfg.feature_learner](
            obs_dim=self.goal_dim, action_dim=action_dim, z_dim=cfg.z_dim,
            hidden_dim=cfg.backward_hidden_dim)
        self._learner_trainable = cfg.feature_learner not in (
            "random", "identity", "fb")

        self.actor_opt = optax.adam(cfg.lr)
        self.sf_opt = optax.adam(cfg.lr)
        self.phi_opt = optax.adam(cfg.lr_coef * cfg.lr)
        self._stddev = schedule(cfg.stddev_schedule)

        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))
        self.get_goal_meta = jax.jit(self._get_goal_meta)
        self.infer_meta_from_obs_and_rewards = jax.jit(self._infer_meta)
        self.compute_inv_cov = jax.jit(self._compute_inv_cov)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> SFTrainState:
        k_actor, k_sf, k_phi = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        goal = jnp.zeros((1, self.goal_dim))
        z = jnp.zeros((1, self.cfg.z_dim))
        action = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k_actor, obs, z)
        sf_params = self.successor_net.init(k_sf, obs, z, action)
        feature_params = self.feature_learner.init(
            k_phi, goal, action, goal, goal,
            method=self.feature_learner.init_all)
        return SFTrainState(
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            sf_params=sf_params,
            target_sf_params=jax.tree.map(jnp.copy, sf_params),
            feature_params=feature_params,
            actor_opt_state=self.actor_opt.init(actor_params),
            sf_opt_state=self.sf_opt.init(sf_params),
            phi_opt_state=self.phi_opt.init(feature_params),
            inv_cov=jnp.eye(self.cfg.z_dim),
        )

    def features(self, feature_params: tp.Any, goal: Array) -> Array:
        return self.feature_learner.apply(feature_params, goal,
                                          method=self.feature_learner.features)

    def load_fb_features(self, state: SFTrainState,
                         fb_backward_params: tp.Any) -> SFTrainState:
        """Graft a pretrained FB agent's backward-net params in as the
        frozen φ (requires feature_learner="fb"; reference FBFeatures,
        sf.py:368-380). Pass FBTrainState.backward_params (or the same
        subtree restored from a checkpoint)."""
        assert self.cfg.feature_learner == "fb", (
            "load_fb_features requires feature_learner='fb'")
        new_feature_params = {"params": {
            "feature_net": fb_backward_params["params"]}}
        chex.assert_trees_all_equal_shapes(state.feature_params,
                                           new_feature_params)
        return state.replace(
            feature_params=jax.tree.map(jnp.asarray, new_feature_params))

    # -- z & meta --------------------------------------------------------
    def sample_z(self, key: jax.Array, size: int) -> Array:
        g = jax.random.normal(key, (size, self.cfg.z_dim))
        return l2_normalize(g)

    def init_meta(self, state: SFTrainState, key: jax.Array) -> MetaDict:
        return {"z": self.sample_z(key, 1)[0]}

    def update_meta(self, state: SFTrainState, meta: MetaDict,
                    global_step: int, key: jax.Array) -> MetaDict:
        if global_step % self.cfg.update_z_every_step == 0:
            return self.init_meta(state, key)
        return meta

    def _compute_inv_cov(self, state: SFTrainState, goals: Array) -> Array:
        """pinv of the φ covariance over replay goals (reference
        precompute_cov, sf.py:477-502)."""
        phi = self.features(state.feature_params, goals)
        cov = jnp.matmul(phi.T, phi, precision=_PREC) / phi.shape[0]
        return jnp.linalg.pinv(cov)

    def precompute_cov(self, state: SFTrainState, goals: Array) -> SFTrainState:
        return state.replace(inv_cov=self.compute_inv_cov(state, goals))

    def _get_goal_meta(self, state: SFTrainState, goal: Array) -> Array:
        z = self.features(state.feature_params, goal[None])
        z = jnp.matmul(z, state.inv_cov, precision=_PREC)
        return l2_normalize(z)[0]

    def _infer_meta(self, state: SFTrainState, obs: Array,
                    reward: Array) -> Array:
        """z = lstsq(φ(s), r) (reference sf.py:531-546)."""
        phi = self.features(state.feature_params, obs)
        z, *_ = jnp.linalg.lstsq(phi, reward.reshape(-1, 1))
        z = math.sqrt(self.cfg.z_dim) * z / jnp.maximum(
            jnp.linalg.norm(z, axis=0, keepdims=True), 1e-12)
        return z[:, 0]

    # -- acting ----------------------------------------------------------
    def _act(self, state: SFTrainState, obs: Array, z: Array, step: Array,
             key: jax.Array, eval_mode: bool = False) -> Array:
        if self.cfg.boltzmann:
            mu, std = self.actor.apply(state.actor_params, obs, z)
            dist = SquashedNormal(mu, std)
            return dist.mean if eval_mode else dist.sample(key)
        mu = self.actor.apply(state.actor_params, obs, z)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_sample, k_expl = jax.random.split(key)
        action = dist.sample(k_sample)
        expl = jax.random.uniform(k_expl, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    # -- losses ----------------------------------------------------------
    def _sf_loss(self, sf_params: tp.Any, state: SFTrainState,
                 batch: EpisodeBatch, goal: Array, next_goal: Array,
                 z: Array, key: jax.Array) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        cfg = self.cfg
        next_obs = batch.next_obs
        if cfg.boltzmann:
            mu, std = self.actor.apply(state.actor_params, next_obs, z)
            next_action = SquashedNormal(mu, std).sample(key)
        else:
            mu = self.actor.apply(state.actor_params, next_obs, z)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            next_action = dist.sample(key, clip=cfg.stddev_clip)
        next_action = jax.lax.stop_gradient(next_action)
        next_f1, next_f2 = self.successor_net.apply(
            state.target_sf_params, next_obs, z, next_action)
        target_phi = self.features(state.feature_params, next_goal)
        next_q1 = jnp.einsum("sd,sd->s", next_f1, z, precision=_PREC)
        next_q2 = jnp.einsum("sd,sd->s", next_f2, z, precision=_PREC)
        next_f = jnp.where((next_q1 < next_q2)[:, None], next_f1, next_f2)
        target_f = jax.lax.stop_gradient(
            target_phi + batch.discount * next_f)

        f1, f2 = self.successor_net.apply(sf_params, batch.obs, z, batch.action)
        if not cfg.q_loss:
            sf_loss = (jnp.mean(jnp.square(f1 - target_f))
                       + jnp.mean(jnp.square(f2 - target_f)))
        else:
            q1 = jnp.einsum("sd,sd->s", f1, z, precision=_PREC)
            q2 = jnp.einsum("sd,sd->s", f2, z, precision=_PREC)
            target_q = jnp.einsum("sd,sd->s", target_f, z, precision=_PREC)
            sf_loss = (jnp.mean(jnp.square(q1 - target_q))
                       + jnp.mean(jnp.square(q2 - target_q)))
        metrics = {
            "target_F": target_f.mean(), "F1": f1.mean(),
            "phi": target_phi.mean(),
            "phi_norm": jnp.linalg.norm(target_phi, axis=-1).mean(),
            "z_norm": jnp.linalg.norm(z, axis=-1).mean(),
            "sf_loss": sf_loss,
        }
        return sf_loss, metrics

    def _phi_loss(self, feature_params: tp.Any, goal: Array, action: Array,
                  next_goal: Array, future_goal: tp.Optional[Array]) -> Array:
        loss = self.feature_learner.apply(feature_params, goal, action,
                                          next_goal, future_goal)
        return loss if loss is not None else jnp.zeros(())

    def _actor_loss(self, actor_params: tp.Any, sf_params: tp.Any,
                    state: SFTrainState, obs: Array, z: Array,
                    key: jax.Array) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        cfg = self.cfg
        if cfg.boltzmann:
            mu, std = self.actor.apply(actor_params, obs, z)
            dist = SquashedNormal(mu, std)
            action, pre = dist.sample_with_pre_tanh(key)
            log_prob = dist.log_prob_from_pre_tanh(pre).sum(-1)
        else:
            mu = self.actor.apply(actor_params, obs, z)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(state.step))
            action = dist.sample(key, clip=cfg.stddev_clip)
            log_prob = dist.log_prob(action).sum(-1)
        f1, f2 = self.successor_net.apply(sf_params, obs, z, action)
        q = jnp.minimum(jnp.einsum("sd,sd->s", f1, z, precision=_PREC),
                        jnp.einsum("sd,sd->s", f2, z, precision=_PREC))
        loss = (jnp.mean(cfg.temp * log_prob - q) if cfg.boltzmann
                else -jnp.mean(q))
        return loss, {"actor_loss": loss, "actor_logprob": log_prob.mean()}

    def _soft_update_learner_targets(self, params: tp.Any) -> tp.Any:
        pairs = type(self.feature_learner).TARGET_PAIRS
        if not pairs:
            return params
        p = dict(params["params"])
        for online, target in pairs:
            p[target] = soft_update(p[online], p[target],
                                    self.cfg.learner_target_tau)
        return {**params, "params": p}

    # -- fused update ----------------------------------------------------
    def _update(self, state: SFTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[SFTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_z, k_perm, k_mix, k_sf, k_actor = jax.random.split(key, 5)
        n = batch.obs.shape[0]

        goal = batch.goal if cfg.goal_space is not None else batch.obs
        next_goal = batch.next_goal if cfg.goal_space is not None else batch.next_obs
        future_goal = (batch.future_goal if cfg.goal_space is not None
                       else batch.future_obs)

        z = self.sample_z(k_z, n)
        if cfg.mix_ratio > 0:
            # whiten φ of permuted replay goals (reference sf.py:735-750)
            perm = jax.random.permutation(k_perm, n)
            phi = jax.lax.stop_gradient(
                self.features(state.feature_params, next_goal[perm]))
            cov = jnp.matmul(phi.T, phi, precision=_PREC) / n
            inv_cov = jnp.linalg.pinv(cov)
            new_z = l2_normalize(jnp.matmul(phi, inv_cov, precision=_PREC))
            mask = jax.random.uniform(k_mix, (n, 1)) < cfg.mix_ratio
            z = jnp.where(mask, new_z, z)

        (sf_loss, sf_metrics), sf_grads = jax.value_and_grad(
            self._sf_loss, has_aux=True)(
            state.sf_params, state, batch, goal, next_goal, z, k_sf)
        sf_updates, sf_opt_state = self.sf_opt.update(
            sf_grads, state.sf_opt_state, state.sf_params)
        sf_params = optax.apply_updates(state.sf_params, sf_updates)

        feature_params = state.feature_params
        phi_opt_state = state.phi_opt_state
        metrics = dict(sf_metrics)
        if self._learner_trainable:
            phi_loss, phi_grads = jax.value_and_grad(self._phi_loss)(
                state.feature_params, goal, batch.action, next_goal,
                future_goal)
            phi_updates, phi_opt_state = self.phi_opt.update(
                phi_grads, state.phi_opt_state, state.feature_params)
            feature_params = optax.apply_updates(state.feature_params,
                                                 phi_updates)
            feature_params = self._soft_update_learner_targets(feature_params)
            metrics["phi_loss"] = phi_loss

        (actor_loss, actor_metrics), actor_grads = jax.value_and_grad(
            self._actor_loss, has_aux=True)(
            state.actor_params, sf_params, state, batch.obs, z, k_actor)
        actor_updates, actor_opt_state = self.actor_opt.update(
            actor_grads, state.actor_opt_state, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, actor_updates)

        new_state = state.replace(
            step=state.step + 1,
            actor_params=actor_params,
            sf_params=sf_params,
            target_sf_params=soft_update(sf_params, state.target_sf_params,
                                         cfg.sf_target_tau),
            feature_params=feature_params,
            actor_opt_state=actor_opt_state,
            sf_opt_state=sf_opt_state,
            phi_opt_state=phi_opt_state,
        )
        metrics.update(actor_metrics)
        return new_state, metrics
