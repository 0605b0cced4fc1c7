"""Headline benchmark: FB gradient-updates/s per chip.

Runs the flagship FBDDPGAgent at the reference's production geometry
(z_dim=50, hidden 1024, feature 512, backward hidden 526, batch 1024 —
url_benchmark/agent/fb_ddpg.py:47-65) with replay sampling fused into the
jitted update, and reports sustained gradient updates/s on one device.

Baseline context (BASELINE.md): the PyTorch reference runs one update per
two env frames on a single GPU with a host-side buffer; the north-star is
>10x updates/s per chip. "vs_baseline" divides by a 60 updates/s anchor —
a generous estimate of the reference's single-GPU update rate implied by
the mock-run fps fixtures (train fps 26-58 at update_every_steps=2,
controllable_agent/data/mockpretrain/train.csv).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_UPDATES_PER_S = 60.0


def main() -> None:
    from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
    from controllable_agent_tpu.data import ReplayBuffer
    from controllable_agent_tpu.train.loops import make_offline_trainer

    obs_dim, action_dim = 24, 6  # walker proprioceptive obs geometry
    # reference-default production geometry; bf16 on the MXU for the net
    # matmuls (loss einsums run Precision.DEFAULT with f32 casts at the
    # loss boundary — agents/fb_ddpg.py), ~4x over f32 with matching
    # loss curves
    cfg = FBDDPGConfig(compute_dtype="bfloat16")
    agent = FBDDPGAgent(cfg, obs_dim=obs_dim, action_dim=action_dim)

    # synthetic ExORL-shaped replay: 64 episodes x 1000 steps
    buf = ReplayBuffer(max_episodes=64, discount=0.98, future=0.99)
    rng = np.random.RandomState(0)
    T = 1000
    for i in range(64):
        buf.add_episode({
            "observation": rng.randn(T + 1, obs_dim).astype(np.float32),
            "action": rng.uniform(-1, 1, (T + 1, action_dim)).astype(np.float32),
            "reward": rng.rand(T + 1, 1).astype(np.float32),
            "discount": np.ones((T + 1, 1), np.float32),
        })

    import os
    # 200 updates per device call amortizes the relay dispatch gap
    # (~25 us/update at 50); rbg keys avoid threefry's compute cost — the
    # PRNG impl travels with the key, so the whole scanned program
    # inherits it (both worth ~+8% together, ROOFLINE.md)
    steps_per_call = int(os.environ.get("BENCH_STEPS_PER_CALL", "200"))
    trainer = make_offline_trainer(agent, buf.cfg, cfg.batch_size,
                                   steps_per_call)
    state = agent.init(jax.random.key(0, impl="rbg"))
    key = jax.random.key(1, impl="rbg")

    # warmup / compile; the float() forces a real device->host transfer
    # (block_until_ready alone is unreliable through the remote relay)
    state, metrics = trainer(state, buf.state, key)
    float(metrics["fb_loss"])

    # sustained pipelined throughput: production training syncs metrics
    # rarely, so calls overlap; one final host transfer closes the clock.
    # Best of 3 rounds — the tunneled chip shows large external variance.
    n_calls = 20
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_calls):
            key, sub = jax.random.split(key)
            state, metrics = trainer(state, buf.state, sub)
        final_loss = float(metrics["fb_loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss)
        best = max(best, n_calls * steps_per_call / dt)

    updates_per_s = best
    print(json.dumps({
        "metric": "fb_gradient_updates_per_s",
        "value": round(updates_per_s, 2),
        "unit": "updates/s",
        "vs_baseline": round(updates_per_s / BASELINE_UPDATES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
