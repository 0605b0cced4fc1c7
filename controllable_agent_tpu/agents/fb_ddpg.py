"""FBDDPGAgent — the flagship Forward-Backward zero-shot RL agent.

Functional re-design of the reference FBDDPGAgent
(url_benchmark/agent/fb_ddpg.py:92-681). Every capability is preserved —
scaled-normalized z sampling, z-mixing from B(goals) with optional random
convex weights, hindsight future-goal z substitution, twin forward maps with
min-target, off-diagonal FB Bellman loss + diagonal bonus, optional Q-loss
with implicit reward B·Cov⁻¹·z, B-orthonormality regularizer, DDPG actor on
min(F1·z, F2·z), zero-shot inference z = B(g) and z = rᵀB/N — but the agent
is a set of pure functions over an FBTrainState pytree:

  * ``update`` is ONE jitted XLA program: z sampling/mixing, both grad
    steps, optimizer updates and target soft-updates fuse into a single
    device launch (the reference runs dozens of separate CUDA ops with host
    sync in between);
  * randomness is explicit (PRNG keys), so a fixed seed reproduces runs;
  * mixing/hindsight substitution uses full-batch computation + masked
    select instead of dynamic-shape fancy indexing (XLA requires static
    shapes; the B-forward over the whole batch is MXU-cheap).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.episode_batch import EpisodeBatch
from ..models.networks import (Actor, BackwardMap, DiagGaussianActor,
                               ForwardMap, IdentityMap, l2_normalize)
from ..ops.fb import fb_loss_terms, orthonormality_loss, sample_z
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


@dataclasses.dataclass(frozen=True)
class FBDDPGConfig:
    """Mirror of FBDDPGAgentConfig (url_benchmark/agent/fb_ddpg.py:37-83),
    minus torch/hydra plumbing fields."""

    name: str = "fb_ddpg"
    obs_type: str = "states"
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
    update_z_proba: float = 1.0
    batch_size: int = 1024
    init_fb: bool = True
    goal_space: tp.Optional[str] = None
    ortho_coef: float = 1.0
    log_std_bounds: tp.Tuple[float, float] = (-5.0, 2.0)
    temp: float = 1.0
    boltzmann: bool = False
    debug: bool = False
    future_ratio: float = 0.0
    mix_ratio: float = 0.5
    rand_weight: bool = False
    preprocess: bool = True
    norm_z: bool = True
    q_loss: bool = False
    q_loss_coef: float = 0.01
    add_trunk: bool = False
    num_expl_steps: int = 0
    # extra eval diagnostics (z_correl / actor_success; reference
    # fb_ddpg.py:44 additional_metric, computed in eval pretrain.py:404-413)
    additional_metric: bool = False
    compute_dtype: str = "float32"  # "bfloat16" runs net matmuls on the MXU in bf16
    adam_mu_dtype: str = "bfloat16"  # Adam first-moment dtype ("float32" to disable)
    # Pallas fused loss: tiles the batchxbatch measure matrices through
    # VMEM instead of materializing them in HBM (ops/pallas_fb.py).
    # DEMOTED after the round-4 roofline study (ROOFLINE.md): at the
    # production geometry (batch 1024) it is ~11% SLOWER than the XLA
    # path; kept as a tested alternative for batch >= 2048 experiments.
    # Metrics that need the full M matrix (target_M mean,
    # orth_linf/orth_l2) are skipped in this mode.
    use_pallas_loss: bool = False


class FBTrainState(struct.PyTreeNode):
    step: Array  # int32 gradient-step counter
    actor_params: tp.Any
    forward_params: tp.Any
    backward_params: tp.Any
    target_forward_params: tp.Any
    target_backward_params: tp.Any
    actor_opt_state: tp.Any
    fw_opt_state: tp.Any
    bw_opt_state: tp.Any


class FBDDPGAgent(ZMetaMixin):
    """Stateless module container; all dynamic data lives in FBTrainState."""

    def __init__(self, cfg: FBDDPGConfig, obs_dim: int, action_dim: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.goal_dim = goal_dim if goal_dim is not None else obs_dim
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        if cfg.boltzmann:
            self.actor: tp.Any = DiagGaussianActor(
                z_dim=cfg.z_dim, action_dim=action_dim, hidden_dim=cfg.hidden_dim,
                log_std_bounds=tuple(cfg.log_std_bounds), dtype=dtype)
        else:
            self.actor = Actor(
                z_dim=cfg.z_dim, action_dim=action_dim, feature_dim=cfg.feature_dim,
                hidden_dim=cfg.hidden_dim, preprocess=cfg.preprocess,
                add_trunk=cfg.add_trunk, dtype=dtype)
        self.forward_net = ForwardMap(
            z_dim=cfg.z_dim, feature_dim=cfg.feature_dim, hidden_dim=cfg.hidden_dim,
            preprocess=cfg.preprocess, add_trunk=cfg.add_trunk, dtype=dtype)
        if cfg.debug:
            self.backward_net: tp.Any = IdentityMap()
        else:
            self.backward_net = BackwardMap(
                z_dim=cfg.z_dim, hidden_dim=cfg.backward_hidden_dim,
                norm_z=cfg.norm_z, dtype=dtype)

        # bf16 first moment: the update is HBM-bandwidth-bound (see
        # ROOFLINE.md) and Adam state traffic is ~30% of it; momentum
        # tolerates bf16 (second moment + params stay f32)
        mu_dt = jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None
        self.actor_opt = optax.adam(cfg.lr, mu_dtype=mu_dt)
        self.fw_opt = optax.adam(cfg.lr, mu_dtype=mu_dt)
        self.bw_opt = optax.adam(cfg.lr_coef * cfg.lr, mu_dtype=mu_dt)
        self._stddev = schedule(cfg.stddev_schedule)

        # jitted entry points
        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))
        self.get_goal_meta = jax.jit(self._get_goal_meta)
        self.infer_meta_from_obs_and_rewards = jax.jit(self._infer_meta)
        self._maybe_resample_z = jax.jit(self._maybe_resample_z_impl)
        self.compute_z_correl = jax.jit(self._compute_z_correl)
        self.compute_actor_success = jax.jit(self._compute_actor_success)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> FBTrainState:
        k_actor, k_fw, k_bw = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_dim))
        goal = jnp.zeros((1, self.goal_dim))
        z = jnp.zeros((1, self.cfg.z_dim))
        action = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k_actor, obs, z)
        forward_params = self.forward_net.init(k_fw, obs, z, action)
        backward_params = self.backward_net.init(k_bw, goal)
        return FBTrainState(
            step=jnp.zeros((), jnp.int32),
            actor_params=actor_params,
            forward_params=forward_params,
            backward_params=backward_params,
            target_forward_params=jax.tree.map(jnp.copy, forward_params),
            target_backward_params=jax.tree.map(jnp.copy, backward_params),
            actor_opt_state=self.actor_opt.init(actor_params),
            fw_opt_state=self.fw_opt.init(forward_params),
            bw_opt_state=self.bw_opt.init(backward_params),
        )

    # -- z sampling and meta -------------------------------------------
    def sample_z(self, key: jax.Array, size: int) -> Array:
        return sample_z(key, size, self.cfg.z_dim, self.cfg.norm_z)

    def init_meta(self, state: FBTrainState, key: jax.Array) -> MetaDict:
        return {"z": self.sample_z(key, 1)[0]}

    def update_meta(self, state: FBTrainState, meta: MetaDict, global_step: int,
                    key: jax.Array) -> MetaDict:
        """Resample z every update_z_every_step env steps (reference
        fb_ddpg.py:246-256). Host-side loop control; the resample decision
        stays on device (no blocking host sync — the scan-internal
        rollout_update_meta is the hot path, this is the API-parity hook)."""
        if global_step % self.cfg.update_z_every_step == 0:
            return {"z": self._maybe_resample_z(meta["z"], key)}
        return meta

    def _maybe_resample_z_impl(self, z: Array, key: jax.Array) -> Array:
        k_p, k_z = jax.random.split(key)
        new_z = self.sample_z(k_z, 1)[0]
        take = jax.random.uniform(k_p) < self.cfg.update_z_proba
        return jnp.where(take, new_z, z)

    def _get_goal_meta(self, state: FBTrainState, goal: Array) -> Array:
        """Zero-shot z from a goal state: z = B(g) (reference fb_ddpg.py:177-186)."""
        z = self.backward_net.apply(state.backward_params, goal[None])
        if self.cfg.norm_z:
            z = l2_normalize(z)
        return z[0]

    def _infer_meta(self, state: FBTrainState, obs: Array, reward: Array) -> Array:
        """Zero-shot z from (state, reward) samples: z = rᵀB/N
        (reference fb_ddpg.py:201-222)."""
        b = self.backward_net.apply(state.backward_params, obs)
        reward = reward.reshape(-1, 1)
        z = jnp.einsum("nk,nd->kd", reward, b, precision=_PREC) / reward.shape[0]
        if self.cfg.norm_z:
            z = l2_normalize(z)
        return z[0]

    # -- eval diagnostics -------------------------------------------------
    def _compute_z_correl(self, state: FBTrainState, goals: Array,
                          z: Array) -> Array:
        """Mean L1-normalized correlation between B(goal_t) and the eval z
        over a batch of visited goals (reference compute_z_correl,
        fb_ddpg.py:283-289 — there per-step on host; here one batched
        forward over the whole eval trajectory)."""
        b = self.backward_net.apply(state.backward_params, goals)
        b = b.astype(jnp.float32)
        b = b / jnp.maximum(jnp.sum(jnp.abs(b), -1, keepdims=True), 1e-12)
        zn = z / jnp.maximum(jnp.sum(jnp.abs(z)), 1e-12)
        return jnp.mean(jnp.einsum("nd,d->n", b, zn, precision=_PREC))

    def _compute_actor_success(self, state: FBTrainState, obs: Array,
                               z: Array, key: jax.Array) -> Array:
        """Fraction of states where Q(actor mean action) beats Q(uniform
        random action) (reference additional_metric path, fb_ddpg.py:269-276)."""
        zb = jnp.broadcast_to(z, (obs.shape[0],) + z.shape[-1:])
        if self.cfg.boltzmann:
            mu, _ = self.actor.apply(state.actor_params, obs, zb)
            mu = jnp.tanh(mu)
        else:
            mu = self.actor.apply(state.actor_params, obs, zb)
        rand = jax.random.uniform(key, mu.shape, minval=-1.0, maxval=1.0)

        def q_of(action: Array) -> Array:
            f1, f2 = self.forward_net.apply(state.forward_params, obs, zb,
                                            action)
            f1, f2 = f1.astype(jnp.float32), f2.astype(jnp.float32)
            return jnp.minimum(
                jnp.einsum("sd,sd->s", f1, zb, precision=_PREC),
                jnp.einsum("sd,sd->s", f2, zb, precision=_PREC))

        return jnp.mean((q_of(mu) > q_of(rand)).astype(jnp.float32))

    # -- acting ---------------------------------------------------------
    def _act(self, state: FBTrainState, obs: Array, z: Array, step: Array,
             key: jax.Array, eval_mode: bool = False) -> Array:
        """Batched policy; obs [B, obs_dim], z [B, z_dim] -> action [B, A]."""
        if self.cfg.boltzmann:
            mu, std = self.actor.apply(state.actor_params, obs, z)
            dist = SquashedNormal(mu, std)
            if eval_mode:
                return dist.mean
            return dist.sample(key)
        mu = self.actor.apply(state.actor_params, obs, z)
        if eval_mode:
            return mu
        dist = TruncatedNormal(mu, jnp.ones_like(mu) * self._stddev(step))
        k_sample, k_expl = jax.random.split(key)
        action = dist.sample(k_sample)
        expl = jax.random.uniform(k_expl, action.shape, minval=-1.0, maxval=1.0)
        return jnp.where(step < self.cfg.num_expl_steps, expl, action)

    # -- z construction for the update ----------------------------------
    def _build_train_z(self, state: FBTrainState, batch: EpisodeBatch,
                       key: jax.Array) -> Array:
        cfg = self.cfg
        n = batch.obs.shape[0]
        k_z, k_perm, k_mix, k_w, k_u, k_fut = jax.random.split(key, 6)
        z = self.sample_z(k_z, n)

        backward_input = batch.goal if cfg.goal_space is not None else batch.obs
        future_goal = (batch.future_goal if cfg.goal_space is not None
                       else batch.future_obs)
        perm = jax.random.permutation(k_perm, n)
        backward_input = backward_input[perm]

        if cfg.mix_ratio > 0:
            b_all = jax.lax.stop_gradient(
                self.backward_net.apply(state.backward_params, backward_input))
            if cfg.rand_weight:
                # random convex-ish mixtures of the whole batch's B vectors
                # (reference fb_ddpg.py:476-483)
                w = jax.random.uniform(k_w, (n, n))
                w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
                w = jax.random.uniform(k_u, (n, 1)) * w
                mix_z = jnp.matmul(w, b_all, precision=_PREC)
            else:
                mix_z = b_all
            if cfg.norm_z:
                mix_z = l2_normalize(mix_z)
            mix_mask = jax.random.uniform(k_mix, (n, 1)) < cfg.mix_ratio
            z = jnp.where(mix_mask, mix_z, z)

        if cfg.future_ratio > 0:
            assert future_goal is not None, "future_ratio > 0 requires future goals"
            fut_z = jax.lax.stop_gradient(
                self.backward_net.apply(state.backward_params, future_goal))
            fut_mask = jax.random.uniform(k_fut, (n, 1)) < cfg.future_ratio
            z = jnp.where(fut_mask, fut_z, z)
        return z

    # -- losses ---------------------------------------------------------
    def _fb_loss(self, fw_params: tp.Any, bw_params: tp.Any, state: FBTrainState,
                 batch: EpisodeBatch, z: Array, next_goal: Array,
                 key: jax.Array) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        cfg = self.cfg
        next_obs = batch.next_obs
        # target successor measure (reference update_fb, fb_ddpg.py:291-326)
        if cfg.boltzmann:
            mu, std = self.actor.apply(state.actor_params, next_obs, z)
            next_action = SquashedNormal(mu, std).sample(key)
        else:
            mu = self.actor.apply(state.actor_params, next_obs, z)
            stddev = self._stddev(state.step)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * stddev)
            next_action = dist.sample(key, clip=cfg.stddev_clip)
        next_action = jax.lax.stop_gradient(next_action)
        target_f1, target_f2 = self.forward_net.apply(
            state.target_forward_params, next_obs, z, next_action)
        target_b = self.backward_net.apply(state.target_backward_params, next_goal)
        target_f1, target_f2, target_b = (
            jax.lax.stop_gradient(x.astype(jnp.float32))
            for x in (target_f1, target_f2, target_b))

        if cfg.use_pallas_loss:
            return self._fb_loss_pallas(fw_params, bw_params, state, batch, z,
                                        next_goal, target_f1, target_f2,
                                        target_b)
        target_m1 = jnp.einsum("sd,td->st", target_f1, target_b, precision=_PREC)
        target_m2 = jnp.einsum("sd,td->st", target_f2, target_b, precision=_PREC)
        target_m = jax.lax.stop_gradient(jnp.minimum(target_m1, target_m2))

        f1, f2 = self.forward_net.apply(fw_params, batch.obs, z, batch.action)
        b = self.backward_net.apply(bw_params, next_goal)
        fb_loss, fb_diag, fb_offdiag = fb_loss_terms(f1, f2, b, target_m,
                                                     batch.discount)

        metrics: tp.Dict[str, Array] = {
            "target_M": target_m.mean(),
            "F1": f1.mean(),
            "B": b.mean(),
            "B_norm": jnp.linalg.norm(b, axis=-1).mean(),
            "z_norm": jnp.linalg.norm(z, axis=-1).mean(),
            "fb_diag": fb_diag,
            "fb_offdiag": fb_offdiag,
        }

        if cfg.q_loss:
            # Q-regularizer with implicit reward B·Cov⁻¹·z (reference :330-340)
            next_q = jnp.minimum(
                jnp.einsum("sd,sd->s", target_f1, z, precision=_PREC),
                jnp.einsum("sd,sd->s", target_f2, z, precision=_PREC))
            cov = jnp.matmul(b.T, b, precision=_PREC) / b.shape[0]
            inv_cov = jnp.linalg.inv(cov)
            implicit_reward = jnp.sum(
                jnp.matmul(b, inv_cov, precision=_PREC) * z, axis=1)
            target_q = jax.lax.stop_gradient(
                implicit_reward + batch.discount[:, 0] * next_q)
            q1 = jnp.einsum("sd,sd->s", f1, z, precision=_PREC)
            q2 = jnp.einsum("sd,sd->s", f2, z, precision=_PREC)
            q_loss = (jnp.mean(jnp.square(q1 - target_q))
                      + jnp.mean(jnp.square(q2 - target_q)))
            fb_loss = fb_loss + cfg.q_loss_coef * q_loss
            metrics["q_loss"] = q_loss

        orth_loss, orth_diag, orth_offdiag = orthonormality_loss(b)
        fb_loss = fb_loss + cfg.ortho_coef * orth_loss
        metrics.update(orth_loss=orth_loss, orth_loss_diag=orth_diag,
                       orth_loss_offdiag=orth_offdiag, fb_loss=fb_loss)
        # orthonormality diagnostics (reference :377-380)
        eye_diff = (jnp.matmul(b.T, b, precision=_PREC) / b.shape[0]
                    - jnp.eye(b.shape[1]))
        metrics["orth_linf"] = jnp.max(jnp.abs(eye_diff))
        metrics["orth_l2"] = jnp.linalg.norm(eye_diff) / math.sqrt(b.shape[1])
        return fb_loss, metrics

    def _fb_loss_pallas(self, fw_params: tp.Any, bw_params: tp.Any,
                        state: FBTrainState, batch: EpisodeBatch, z: Array,
                        next_goal: Array, target_f1: Array, target_f2: Array,
                        target_b: Array) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        """FB + orthonormality losses through the fused Pallas kernel
        (ops/pallas_fb.py); same math as the XLA path minus the
        full-matrix diagnostics."""
        from ..ops.pallas_fb import fb_loss_terms_fused
        cfg = self.cfg
        n = batch.obs.shape[0]
        f1, f2 = self.forward_net.apply(fw_params, batch.obs, z, batch.action)
        b = self.backward_net.apply(bw_params, next_goal)
        off_sum, diag_sum, cov_off_sum, cov_diag_sum = fb_loss_terms_fused(
            f1.astype(jnp.float32), f2.astype(jnp.float32),
            b.astype(jnp.float32), target_f1, target_f2, target_b,
            batch.discount)
        denom = n * (n - 1)
        fb_offdiag = 0.5 * off_sum / denom
        fb_diag = -diag_sum / n
        fb_loss = fb_offdiag + fb_diag
        orth_diag = -2.0 * cov_diag_sum / n
        orth_offdiag = cov_off_sum / denom
        orth_loss = orth_offdiag + orth_diag
        fb_loss = fb_loss + cfg.ortho_coef * orth_loss
        metrics = {
            "F1": f1.mean(), "B": b.mean(),
            "B_norm": jnp.linalg.norm(b, axis=-1).mean(),
            "z_norm": jnp.linalg.norm(z, axis=-1).mean(),
            "fb_diag": fb_diag, "fb_offdiag": fb_offdiag,
            "orth_loss": orth_loss, "orth_loss_diag": orth_diag,
            "orth_loss_offdiag": orth_offdiag, "fb_loss": fb_loss,
        }
        return fb_loss, metrics

    def _actor_loss(self, actor_params: tp.Any, fw_params: tp.Any,
                    state: FBTrainState, obs: Array, z: Array,
                    key: jax.Array) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        cfg = self.cfg
        if cfg.boltzmann:
            mu, std = self.actor.apply(actor_params, obs, z)
            dist = SquashedNormal(mu, std)
            action, pre_tanh = dist.sample_with_pre_tanh(key)
            log_prob = dist.log_prob_from_pre_tanh(pre_tanh).sum(-1)
        else:
            mu = self.actor.apply(actor_params, obs, z)
            stddev = self._stddev(state.step)
            dist = TruncatedNormal(mu, jnp.ones_like(mu) * stddev)
            action = dist.sample(key, clip=cfg.stddev_clip)
            log_prob = dist.log_prob(action).sum(-1)
        f1, f2 = self.forward_net.apply(fw_params, obs, z, action)
        q1 = jnp.einsum("sd,sd->s", f1, z, precision=_PREC)
        q2 = jnp.einsum("sd,sd->s", f2, z, precision=_PREC)
        q = jnp.minimum(q1, q2)
        actor_loss = (jnp.mean(cfg.temp * log_prob - q) if cfg.boltzmann
                      else -jnp.mean(q))
        return actor_loss, {"actor_loss": actor_loss, "q": q.mean(),
                            "actor_logprob": log_prob.mean()}

    # -- the single fused update step -----------------------------------
    def _update(self, state: FBTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[FBTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_z, k_fb, k_actor = jax.random.split(key, 3)

        next_goal = batch.next_goal if cfg.goal_space is not None else batch.next_obs
        z = self._build_train_z(state, batch, k_z)

        (fb_loss, fb_metrics), (fw_grads, bw_grads) = jax.value_and_grad(
            self._fb_loss, argnums=(0, 1), has_aux=True)(
            state.forward_params, state.backward_params, state, batch, z,
            next_goal, k_fb)

        fw_updates, fw_opt_state = self.fw_opt.update(
            fw_grads, state.fw_opt_state, state.forward_params)
        forward_params = optax.apply_updates(state.forward_params, fw_updates)
        bw_updates, bw_opt_state = self.bw_opt.update(
            bw_grads, state.bw_opt_state, state.backward_params)
        backward_params = optax.apply_updates(state.backward_params, bw_updates)

        # actor update uses the freshly updated forward net, matching the
        # reference's in-place ordering (update() calls update_fb then
        # update_actor, fb_ddpg.py:493-497)
        (actor_loss, actor_metrics), actor_grads = jax.value_and_grad(
            self._actor_loss, has_aux=True)(
            state.actor_params, forward_params, state, batch.obs, z, k_actor)
        actor_updates, actor_opt_state = self.actor_opt.update(
            actor_grads, state.actor_opt_state, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, actor_updates)

        new_state = state.replace(
            step=state.step + 1,
            actor_params=actor_params,
            forward_params=forward_params,
            backward_params=backward_params,
            target_forward_params=soft_update(
                forward_params, state.target_forward_params, cfg.fb_target_tau),
            target_backward_params=soft_update(
                backward_params, state.target_backward_params, cfg.fb_target_tau),
            actor_opt_state=actor_opt_state,
            fw_opt_state=fw_opt_state,
            bw_opt_state=bw_opt_state,
        )
        metrics = dict(fb_metrics)
        metrics.update(actor_metrics)
        return new_state, metrics
