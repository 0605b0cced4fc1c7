"""Roofline analysis of the fused FB update on the current accelerator.

Compiles the offline trainer at the bench geometry, pulls XLA's own cost
analysis (FLOPs / bytes accessed) for the compiled program, measures the
sustained per-update wall time the way bench.py does, and reports
achieved FLOP/s and HBM bandwidth against the op intensity — i.e. says
whether the headline update is compute- or bandwidth-bound and how close
to the hardware ceiling it runs.

Usage:  python -m tools.bench_roofline [batch_size] [steps_per_call]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps_per_call = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
    from controllable_agent_tpu.data import ReplayBuffer
    from controllable_agent_tpu.train.loops import make_offline_trainer

    obs_dim, action_dim = 24, 6
    cfg = FBDDPGConfig(compute_dtype="bfloat16", batch_size=batch_size)
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

    trainer = make_offline_trainer(agent, buf.cfg, batch_size, steps_per_call)
    state = agent.init(jax.random.key(0))
    key = jax.random.key(1)

    # one AOT compile used for BOTH cost analysis and the timed loop (the
    # plain trainer(...) path would compile a second, separate executable)
    compiled = trainer.lower(state, buf.state, key).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else None
    if cost is None:  # some backends/versions return nothing
        cost = {}
    flops_call = float(cost.get("flops", float("nan")))
    bytes_call = float(cost.get("bytes accessed", float("nan")))

    state, metrics = compiled(state, buf.state, key)
    float(metrics["fb_loss"])  # force through the relay

    n_calls = 20
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            key, sub = jax.random.split(key)
            state, metrics = compiled(state, buf.state, sub)
        float(metrics["fb_loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    per_update = best_dt / (n_calls * steps_per_call)
    out = {
        "batch_size": batch_size,
        "steps_per_call": steps_per_call,
        "updates_per_s": round(1.0 / per_update, 1),
        "flops_per_update": flops_call / steps_per_call,
        "bytes_per_update": bytes_call / steps_per_call,
        "achieved_tflops": round(flops_call / steps_per_call / per_update
                                 / 1e12, 2),
        "achieved_gbps": round(bytes_call / steps_per_call / per_update
                               / 1e9, 1),
        "op_intensity_flop_per_byte": round(flops_call / bytes_call, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
