"""DiscreteFBAgent — Forward-Backward for discrete action spaces (gridworld).

Functional re-design of the reference DiscreteFBAgent
(url_benchmark/agent/discrete_fb.py:120-468): per-action forward map
F(s,z) ∈ [batch, z_dim, n_actions], greedy/Boltzmann policy on
Q(s,a) = F(s,·,a)·z, epsilon-greedy exploration, and the FB Bellman loss
with argmax (or softmax-weighted) target F. No separate actor network.
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
from ..models.networks import BackwardMap, DiscreteForwardMap, l2_normalize
from ..ops.fb import fb_loss_terms, orthonormality_loss, sample_z
from ..utils.tree import soft_update
from .base import MetaDict, ZMetaMixin

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT


@dataclasses.dataclass(frozen=True)
class DiscreteFBConfig:
    """Mirror of DiscreteFBAgentConfig (url_benchmark/agent/discrete_fb.py:103-113)."""

    name: str = "discrete_fb"
    lr: float = 1e-4
    lr_coef: float = 1.0
    fb_target_tau: float = 0.01
    update_every_steps: int = 2
    num_inference_steps: int = 5120
    hidden_dim: int = 1024
    backward_hidden_dim: int = 526
    feature_dim: int = 512
    z_dim: int = 50
    update_z_every_step: int = 300
    update_z_proba: float = 1.0
    batch_size: int = 1024
    goal_space: tp.Optional[str] = None
    ortho_coef: float = 1.0
    temp: float = 100.0
    boltzmann: bool = True
    future_ratio: float = 0.0
    mix_ratio: float = 0.5
    rand_weight: bool = False
    preprocess: bool = False
    norm_z: bool = True
    q_loss: bool = False
    q_loss_coef: float = 0.01
    add_trunk: bool = False
    expl_eps: float = 0.2
    num_expl_steps: int = 0
    compute_dtype: str = "float32"


class DiscreteFBTrainState(struct.PyTreeNode):
    step: Array
    forward_params: tp.Any
    backward_params: tp.Any
    target_forward_params: tp.Any
    target_backward_params: tp.Any
    fw_opt_state: tp.Any
    bw_opt_state: tp.Any


class DiscreteFBAgent(ZMetaMixin):
    def __init__(self, cfg: DiscreteFBConfig, obs_dim: int, n_actions: int,
                 goal_dim: tp.Optional[int] = None) -> None:
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.n_actions = n_actions
        self.goal_dim = goal_dim if goal_dim is not None else obs_dim
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        self.forward_net = DiscreteForwardMap(
            z_dim=cfg.z_dim, n_actions=n_actions, feature_dim=cfg.feature_dim,
            hidden_dim=cfg.hidden_dim, preprocess=cfg.preprocess,
            add_trunk=cfg.add_trunk, dtype=dtype)
        self.backward_net = BackwardMap(
            z_dim=cfg.z_dim, hidden_dim=cfg.backward_hidden_dim,
            norm_z=cfg.norm_z, dtype=dtype)
        self.fw_opt = optax.adam(cfg.lr)
        self.bw_opt = optax.adam(cfg.lr_coef * cfg.lr)

        self.update = jax.jit(self._update, donate_argnums=0)
        self.act = jax.jit(self._act, static_argnames=("eval_mode",))
        self.get_goal_meta = jax.jit(self._get_goal_meta)
        self.infer_meta_from_obs_and_rewards = jax.jit(self._infer_meta)

    def init(self, key: jax.Array) -> DiscreteFBTrainState:
        k_fw, k_bw = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_dim))
        goal = jnp.zeros((1, self.goal_dim))
        z = jnp.zeros((1, self.cfg.z_dim))
        forward_params = self.forward_net.init(k_fw, obs, z)
        backward_params = self.backward_net.init(k_bw, goal)
        return DiscreteFBTrainState(
            step=jnp.zeros((), jnp.int32),
            forward_params=forward_params,
            backward_params=backward_params,
            target_forward_params=jax.tree.map(jnp.copy, forward_params),
            target_backward_params=jax.tree.map(jnp.copy, backward_params),
            fw_opt_state=self.fw_opt.init(forward_params),
            bw_opt_state=self.bw_opt.init(backward_params),
        )

    # -- meta ------------------------------------------------------------
    def sample_z(self, key: jax.Array, size: int) -> Array:
        return sample_z(key, size, self.cfg.z_dim, self.cfg.norm_z)

    def init_meta(self, state: DiscreteFBTrainState, key: jax.Array) -> MetaDict:
        return {"z": self.sample_z(key, 1)[0]}

    def update_meta(self, state: DiscreteFBTrainState, meta: MetaDict,
                    global_step: int, key: jax.Array) -> MetaDict:
        if global_step % self.cfg.update_z_every_step == 0:
            k1, k2 = jax.random.split(key)
            if float(jax.random.uniform(k1)) < self.cfg.update_z_proba:
                return self.init_meta(state, k2)
        return meta

    def _get_goal_meta(self, state: DiscreteFBTrainState, goal: Array) -> Array:
        z = self.backward_net.apply(state.backward_params, goal[None])
        if self.cfg.norm_z:
            z = l2_normalize(z)
        return z[0]

    def _infer_meta(self, state: DiscreteFBTrainState, obs: Array,
                    reward: Array) -> Array:
        b = self.backward_net.apply(state.backward_params, obs)
        reward = reward.reshape(-1, 1)
        z = jnp.einsum("nk,nd->kd", reward, b, precision=_PREC) / reward.shape[0]
        if self.cfg.norm_z:
            z = l2_normalize(z)
        return z[0]

    # -- acting ----------------------------------------------------------
    def _q_values(self, forward_params: tp.Any, obs: Array, z: Array) -> Array:
        f1, f2 = self.forward_net.apply(forward_params, obs, z)
        q1 = jnp.einsum("sda,sd->sa", f1, z, precision=_PREC)
        q2 = jnp.einsum("sda,sd->sa", f2, z, precision=_PREC)
        return jnp.minimum(q1, q2)

    def _act(self, state: DiscreteFBTrainState, obs: Array, z: Array,
             step: Array, key: jax.Array, eval_mode: bool = False) -> Array:
        """Batched greedy policy with epsilon-greedy exploration
        (reference discrete_fb.py:259-276)."""
        q = self._q_values(state.forward_params, obs, z)
        greedy = jnp.argmax(q, axis=-1)
        if eval_mode:
            return greedy
        k_eps, k_rand = jax.random.split(key)
        rand = jax.random.randint(k_rand, greedy.shape, 0, self.n_actions)
        explore = (jax.random.uniform(k_eps, greedy.shape) < self.cfg.expl_eps)
        explore = explore | (step < self.cfg.num_expl_steps)
        return jnp.where(explore, rand, greedy)

    # -- z construction (shared semantics with FBDDPG) --------------------
    def _build_train_z(self, state: DiscreteFBTrainState, batch: EpisodeBatch,
                       key: jax.Array) -> Array:
        cfg = self.cfg
        n = batch.obs.shape[0]
        k_z, k_perm, k_mix, k_w, k_u, k_fut = jax.random.split(key, 6)
        z = self.sample_z(k_z, n)
        backward_input = batch.goal if cfg.goal_space is not None else batch.obs
        future_goal = (batch.future_goal if cfg.goal_space is not None
                       else batch.future_obs)
        backward_input = backward_input[jax.random.permutation(k_perm, n)]
        if cfg.mix_ratio > 0:
            b_all = jax.lax.stop_gradient(
                self.backward_net.apply(state.backward_params, backward_input))
            if cfg.rand_weight:
                w = jax.random.uniform(k_w, (n, n))
                w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
                w = jax.random.uniform(k_u, (n, 1)) * w
                mix_z = jnp.matmul(w, b_all, precision=_PREC)
            else:
                mix_z = b_all
            if cfg.norm_z:
                mix_z = l2_normalize(mix_z)
            z = jnp.where(jax.random.uniform(k_mix, (n, 1)) < cfg.mix_ratio,
                          mix_z, z)
        if cfg.future_ratio > 0 and future_goal is not None:
            fut_z = jax.lax.stop_gradient(
                self.backward_net.apply(state.backward_params, future_goal))
            z = jnp.where(jax.random.uniform(k_fut, (n, 1)) < cfg.future_ratio,
                          fut_z, z)
        return z

    # -- loss ------------------------------------------------------------
    def _fb_loss(self, fw_params: tp.Any, bw_params: tp.Any,
                 state: DiscreteFBTrainState, batch: EpisodeBatch, z: Array,
                 next_goal: Array) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        cfg = self.cfg
        # target: greedy or Boltzmann-weighted target F (reference :278-306)
        target_f1, target_f2 = self.forward_net.apply(
            state.target_forward_params, batch.next_obs, z)
        next_q1 = jnp.einsum("sda,sd->sa", target_f1, z, precision=_PREC)
        next_q2 = jnp.einsum("sda,sd->sa", target_f2, z, precision=_PREC)
        next_q = jnp.minimum(next_q1, next_q2)
        if cfg.boltzmann:
            pi = jax.nn.softmax(next_q / cfg.temp, axis=-1)
            target_f1 = jnp.einsum("sa,sda->sd", pi, target_f1, precision=_PREC)
            target_f2 = jnp.einsum("sa,sda->sd", pi, target_f2, precision=_PREC)
            next_q = jnp.einsum("sa,sa->s", pi, next_q, precision=_PREC)
        else:
            next_action = jnp.argmax(next_q, axis=-1)
            target_f1 = jnp.take_along_axis(
                target_f1, next_action[:, None, None], axis=-1)[..., 0]
            target_f2 = jnp.take_along_axis(
                target_f2, next_action[:, None, None], axis=-1)[..., 0]
            next_q = jnp.max(next_q, axis=-1)
        target_b = self.backward_net.apply(state.target_backward_params, next_goal)
        target_m = jax.lax.stop_gradient(jnp.minimum(
            jnp.einsum("sd,td->st", target_f1, target_b, precision=_PREC),
            jnp.einsum("sd,td->st", target_f2, target_b, precision=_PREC)))

        # online F at the taken action
        action = batch.action.astype(jnp.int32).reshape(-1)
        f1_all, f2_all = self.forward_net.apply(fw_params, batch.obs, z)
        f1 = jnp.take_along_axis(f1_all, action[:, None, None], axis=-1)[..., 0]
        f2 = jnp.take_along_axis(f2_all, action[:, None, None], axis=-1)[..., 0]
        b = self.backward_net.apply(bw_params, next_goal)
        fb_loss, fb_diag, fb_offdiag = fb_loss_terms(f1, f2, b, target_m,
                                                     batch.discount)
        metrics: tp.Dict[str, Array] = {
            "target_M": target_m.mean(), "F1": f1.mean(), "B": b.mean(),
            "B_norm": jnp.linalg.norm(b, axis=-1).mean(),
            "z_norm": jnp.linalg.norm(z, axis=-1).mean(),
            "fb_diag": fb_diag, "fb_offdiag": fb_offdiag,
        }
        if cfg.q_loss:
            cov = jnp.matmul(b.T, b, precision=_PREC) / b.shape[0]
            inv_cov = jnp.linalg.pinv(cov)
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
        eye_diff = (jnp.matmul(b.T, b, precision=_PREC) / b.shape[0]
                    - jnp.eye(b.shape[1]))
        metrics["orth_linf"] = jnp.max(jnp.abs(eye_diff))
        metrics["orth_l2"] = jnp.linalg.norm(eye_diff) / math.sqrt(b.shape[1])
        return fb_loss, metrics

    def _update(self, state: DiscreteFBTrainState, batch: EpisodeBatch,
                key: jax.Array) -> tp.Tuple[DiscreteFBTrainState, tp.Dict[str, Array]]:
        cfg = self.cfg
        k_z, _ = jax.random.split(key)
        next_goal = batch.next_goal if cfg.goal_space is not None else batch.next_obs
        z = self._build_train_z(state, batch, k_z)
        (_, metrics), (fw_grads, bw_grads) = jax.value_and_grad(
            self._fb_loss, argnums=(0, 1), has_aux=True)(
            state.forward_params, state.backward_params, state, batch, z, next_goal)
        fw_updates, fw_opt_state = self.fw_opt.update(
            fw_grads, state.fw_opt_state, state.forward_params)
        forward_params = optax.apply_updates(state.forward_params, fw_updates)
        bw_updates, bw_opt_state = self.bw_opt.update(
            bw_grads, state.bw_opt_state, state.backward_params)
        backward_params = optax.apply_updates(state.backward_params, bw_updates)
        new_state = state.replace(
            step=state.step + 1,
            forward_params=forward_params,
            backward_params=backward_params,
            target_forward_params=soft_update(
                forward_params, state.target_forward_params, cfg.fb_target_tau),
            target_backward_params=soft_update(
                backward_params, state.target_backward_params, cfg.fb_target_tau),
            fw_opt_state=fw_opt_state,
            bw_opt_state=bw_opt_state,
        )
        return new_state, metrics
