"""Phase breakdown of the fused FB update: where do the microseconds go?

Times three 50-step scanned programs at the bench geometry:
  full    — the production update (sample + loss + grads + adam + targets)
  fwdbwd  — z build + loss + grads only (no optimizer, no target update)
  opt     — adam + apply + target soft-updates only (fixed grads)

full − fwdbwd ≈ optimizer/target cost inside the real program; `opt`
cross-checks it in isolation. Run on the TPU (default env).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timed(fn, state, key, n_calls=10, steps=50):
    # state rolls forward the whole time: the trainer donates its input,
    # so a donated state must never be passed twice
    state, out = fn(state, key)  # compile
    float(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            key, sub = jax.random.split(key)
            state, out = fn(state, sub)
        float(jnp.asarray(jax.tree.leaves(out)[0],
                          jnp.float32).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / (n_calls * steps)


def main() -> None:
    from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
    from controllable_agent_tpu.data import ReplayBuffer
    from controllable_agent_tpu.train.loops import make_offline_trainer

    obs_dim, action_dim = 24, 6
    cfg = FBDDPGConfig(compute_dtype="bfloat16")
    agent = FBDDPGAgent(cfg, obs_dim=obs_dim, action_dim=action_dim)
    buf = ReplayBuffer(max_episodes=64, discount=0.98, future=0.99)
    rng = np.random.RandomState(0)
    T = 1000
    for _ in range(64):
        buf.add_episode({
            "observation": rng.randn(T + 1, obs_dim).astype(np.float32),
            "action": rng.uniform(-1, 1, (T + 1, action_dim)).astype(np.float32),
            "reward": rng.rand(T + 1, 1).astype(np.float32),
            "discount": np.ones((T + 1, 1), np.float32),
        })
    from controllable_agent_tpu.data import replay as replay_lib

    state0 = agent.init(jax.random.key(0))
    bufstate = buf.state

    @jax.jit
    def fwdbwd(state, key):
        def body(c, k):
            ks, ku = jax.random.split(k)
            batch = replay_lib.sample(bufstate, ks, cfg.batch_size, buf.cfg)
            z = agent._build_train_z(state, batch, ku)
            (_, m), (fg, bg) = jax.value_and_grad(
                agent._fb_loss, argnums=(0, 1), has_aux=True)(
                state.forward_params, state.backward_params, state, batch, z,
                batch.next_obs, ku)
            (_, am), ag = jax.value_and_grad(
                agent._actor_loss, has_aux=True)(
                state.actor_params, state.forward_params, state,
                batch.obs, z, ku)
            gsum = sum(jnp.sum(jnp.abs(x)) for t in (fg, bg, ag)
                       for x in jax.tree.leaves(t))
            return c + gsum, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, 50))
        return state, acc

    fb_t = timed(lambda s, k: fwdbwd(s, k), state0, jax.random.key(2))

    from controllable_agent_tpu.utils.tree import soft_update

    @jax.jit
    def opt_only(state, key):
        fake_fg = jax.tree.map(lambda x: x * 1e-9, state.forward_params)
        fake_bg = jax.tree.map(lambda x: x * 1e-9, state.backward_params)
        fake_ag = jax.tree.map(lambda x: x * 1e-9, state.actor_params)

        def body(s, _):
            fu, fo = agent.fw_opt.update(fake_fg, s.fw_opt_state,
                                         s.forward_params)
            fp = optax.apply_updates(s.forward_params, fu)
            bu, bo = agent.bw_opt.update(fake_bg, s.bw_opt_state,
                                         s.backward_params)
            bp = optax.apply_updates(s.backward_params, bu)
            au, ao = agent.actor_opt.update(fake_ag, s.actor_opt_state,
                                            s.actor_params)
            ap = optax.apply_updates(s.actor_params, au)
            return s.replace(
                forward_params=fp, backward_params=bp, actor_params=ap,
                target_forward_params=soft_update(
                    fp, s.target_forward_params, cfg.fb_target_tau),
                target_backward_params=soft_update(
                    bp, s.target_backward_params, cfg.fb_target_tau),
                fw_opt_state=fo, bw_opt_state=bo, actor_opt_state=ao), None

        s, _ = jax.lax.scan(body, state, None, length=50)
        return s, s.step

    opt_t = timed(lambda s, k: opt_only(s, k), state0, jax.random.key(3))

    trainer = make_offline_trainer(agent, buf.cfg, cfg.batch_size, 50)
    full = timed(lambda s, k: trainer(s, bufstate, k), state0,
                 jax.random.key(1))

    print(json.dumps({
        "full_us": round(full * 1e6, 1),
        "fwdbwd_us": round(fb_t * 1e6, 1),
        "opt_us": round(opt_t * 1e6, 1),
        "implied_opt_share": round(1 - fb_t / full, 3),
    }))


if __name__ == "__main__":
    main()
