"""ProtoAgent — ProtoRL (SwAV-style prototypes).

Functional re-design of the reference ProtoAgent
(url_benchmark/agent/proto.py): predictor/projector towers, L2-normalized
prototype matrix, sinkhorn-knopp target assignment (:28-41), cross-entropy
swap loss (:155-180), EMA target towers, and the queue-based kNN
particle-entropy intrinsic reward (:126-148).

The candidate queue is part of the train state pytree (the reference keeps
it as a mutable tensor attribute); the sinkhorn iterations are a fixed
3-step fori loop under jit.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..data.episode_batch import EpisodeBatch
from ..models.networks import l2_normalize, mlp
from .exploration import IntrinsicConfig, IntrinsicDDPGAgent

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT


@dataclasses.dataclass(frozen=True)
class ProtoConfig(IntrinsicConfig):
    name: str = "proto"
    pred_dim: int = 128
    proj_dim: int = 512
    num_protos: int = 512
    tau: float = 0.1
    topk: int = 3
    queue_size: int = 2048
    encoder_target_tau: float = 0.05


def sinkhorn_knopp(q: Array, n_iters: int = 3) -> Array:
    """Reference proto.py:28-41 as a pure function."""
    q = q - q.max()
    q = jnp.exp(q).T
    q = q / q.sum()
    r = jnp.ones(q.shape[0]) / q.shape[0]
    c = jnp.ones(q.shape[1]) / q.shape[1]

    def body(_, q: Array) -> Array:
        q = q * (r / q.sum(axis=1))[:, None]
        q = q * (c / q.sum(axis=0))[None, :]
        return q

    q = jax.lax.fori_loop(0, n_iters, body, q)
    q = q / q.sum(axis=0, keepdims=True)
    return q.T


class _ProtoNets(nn.Module):
    """predictor + projector + prototypes + EMA targets
    (reference proto.py:44-53, 75-100)."""

    pred_dim: int
    proj_dim: int
    num_protos: int

    def setup(self) -> None:
        self.predictor = mlp(self.pred_dim)
        self.projector = mlp(self.proj_dim, "irelu", self.pred_dim)
        self.protos_kernel = self.param(
            "protos", nn.initializers.orthogonal(),
            (self.pred_dim, self.num_protos))
        self.target_predictor = mlp(self.pred_dim)

    def embed(self, obs: Array) -> Array:
        return l2_normalize(self.predictor(obs), scale_sqrt_dim=False)

    def target_embed(self, obs: Array) -> Array:
        return l2_normalize(self.target_predictor(obs), scale_sqrt_dim=False)

    def scores(self, z: Array) -> Array:
        # prototype vectors (columns) are L2-normalized before scoring
        # (reference normalize_protos, proto.py:121-124)
        w = self.protos_kernel
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return jnp.matmul(z, w, precision=_PREC)

    def __call__(self, obs: Array, next_obs: Array
                 ) -> tp.Tuple[Array, Array]:
        s = self.predictor(obs)
        s = self.projector(s)
        s = l2_normalize(s, scale_sqrt_dim=False)
        scores_s = self.scores(s)
        t = jax.lax.stop_gradient(self.target_embed(next_obs))
        scores_t = self.scores(t)
        return scores_s, jax.lax.stop_gradient(scores_t)


class ProtoAgent(IntrinsicDDPGAgent):
    cfg: ProtoConfig

    def _make_module(self) -> nn.Module:
        return _ProtoNets(pred_dim=self.cfg.pred_dim,
                          proj_dim=self.cfg.proj_dim,
                          num_protos=self.cfg.num_protos)

    def _module_init_args(self) -> tp.Tuple[Array, ...]:
        o = jnp.zeros((2, self.obs_dim))
        return (o, o)

    def init(self, key: jax.Array):
        state = super().init(key)
        # candidate queue + pointer live in the rms-free extra slots:
        # reuse module_opt_state pairing by extending the state pytree via
        # rms (RMSState) untouched; queue rides in module_params' batch_stats?
        # Simplest: wrap in a dict alongside params.
        queue = jnp.zeros((self.cfg.queue_size, self.cfg.pred_dim))
        state = state.replace(module_params={
            "net": state.module_params, "queue": queue,
            "queue_ptr": jnp.zeros((), jnp.int32)})
        state = state.replace(
            module_opt_state=self.module_opt.init(state.module_params["net"]))
        return state

    def _module_loss(self, module_params, batch, goal, next_goal, key):
        raise NotImplementedError  # orchestrated in _update override

    def _intrinsic_reward(self, state, batch, goal, next_goal, key):
        raise NotImplementedError

    def _update(self, state, batch: EpisodeBatch, key: jax.Array):
        cfg = self.cfg
        k_cand, k_ddpg = jax.random.split(key)
        metrics: tp.Dict[str, Array] = {}
        net_params = state.module_params["net"]
        queue = state.module_params["queue"]
        queue_ptr = state.module_params["queue_ptr"]

        # SwAV swap loss (reference update_proto, proto.py:155-180)
        def loss_fn(params: tp.Any) -> Array:
            scores_s, scores_t = self.module.apply(params, batch.obs,
                                                   batch.next_obs)
            log_p_s = jax.nn.log_softmax(scores_s / cfg.tau, axis=1)
            q_t = sinkhorn_knopp(scores_t / cfg.tau)
            return -(q_t * log_p_s).sum(axis=1).mean()

        repr_loss, grads = jax.value_and_grad(loss_fn)(net_params)
        updates, module_opt_state = self.module_opt.update(
            grads, state.module_opt_state, net_params)
        net_params = optax.apply_updates(net_params, updates)
        # EMA predictor target (reference :229-232)
        p = dict(net_params["params"])
        p["target_predictor"] = jax.tree.map(
            lambda o, t: cfg.encoder_target_tau * o
            + (1 - cfg.encoder_target_tau) * t,
            p["predictor"], p["target_predictor"])
        net_params = {**net_params, "params": p}
        metrics["repr_loss"] = repr_loss

        reward = batch.reward
        if cfg.reward_free:
            # candidate selection + queue update + kNN reward
            # (reference compute_intr_reward, proto.py:126-148)
            z = self.module.apply(net_params, batch.next_obs,
                                  method=self.module.embed)
            scores = self.module.apply(net_params, z,
                                       method=self.module.scores).T
            candidates = jax.random.categorical(k_cand, scores, axis=1)
            num = min(cfg.num_protos, queue.shape[0])
            new_entries = z[candidates[:num]]
            queue = jax.lax.dynamic_update_slice(
                queue, new_entries,
                (queue_ptr % (queue.shape[0] - num + 1), jnp.asarray(0)))
            queue_ptr = (queue_ptr + num) % queue.shape[0]
            d = jnp.linalg.norm(z[:, None, :] - queue[None, :, :], axis=2)
            all_dists = -jax.lax.top_k(-d, cfg.topk)[0]
            reward = all_dists[:, -1:]
            metrics["intr_reward"] = reward.mean()

        ddpg_state, ddpg_metrics = self.ddpg._update(
            state.ddpg, batch.replace(reward=jax.lax.stop_gradient(reward)),
            k_ddpg, use_reward_model=False)
        metrics.update(ddpg_metrics)
        return state.replace(
            ddpg=ddpg_state,
            module_params={"net": net_params, "queue": queue,
                           "queue_ptr": queue_ptr},
            module_opt_state=module_opt_state,
        ), metrics
