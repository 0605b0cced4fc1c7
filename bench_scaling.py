"""Scaling-efficiency harness: FB updates/s vs device-mesh size.

SURVEY.md §7 step 7: the north-star scaling axis is data parallelism over
the ICI mesh (params replicated, batch sharded, gradient all-reduce
inserted by XLA — parallel/mesh.py). This harness times the fused
sample->update scan on 1, 2, 4, ... device meshes and reports scaling
efficiency relative to the 1-device rate.

On real multi-chip hardware, run with the default env. On a single-chip
or CPU box, run the virtual-mesh demonstration (measures that the SPMD
program partitions correctly; CPU cores are shared so efficiency numbers
are not ICI numbers):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py [--batch 1024] [--steps 30]

Prints one JSON line per mesh size:
    {"metric": "fb_updates_per_s", "devices": n, "value": ..., "unit":
     "updates/s", "efficiency": rate_n / (n * rate_1)}
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024,
                        help="global batch size (sharded over the mesh)")
    parser.add_argument("--steps", type=int, default=30,
                        help="fused updates per timed call")
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import jax
    import numpy as np
    from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
    from controllable_agent_tpu.data import ReplayBuffer
    from controllable_agent_tpu.parallel.mesh import (make_dp_offline_trainer,
                                                      make_mesh)

    obs_dim, action_dim = 24, 6
    cfg = FBDDPGConfig(batch_size=args.batch, compute_dtype="bfloat16")
    agent = FBDDPGAgent(cfg, obs_dim=obs_dim, action_dim=action_dim)

    buf = ReplayBuffer(max_episodes=32, discount=0.98, future=0.99)
    rng = np.random.RandomState(0)
    T = 500
    for _ in range(32):
        buf.add_episode({
            "observation": rng.randn(T + 1, obs_dim).astype(np.float32),
            "action": rng.uniform(-1, 1, (T + 1, action_dim)).astype(np.float32),
            "reward": rng.rand(T + 1, 1).astype(np.float32),
            "discount": np.ones((T + 1, 1), np.float32),
        })

    n_devices = jax.device_count()
    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_devices]
    rate1 = None
    for n in sizes:
        mesh = make_mesh(n)
        trainer = make_dp_offline_trainer(agent, buf.cfg, args.batch,
                                          args.steps, mesh)
        state = agent.init(jax.random.key(0))
        key = jax.random.key(1)
        with mesh:
            state, m = trainer(state, buf.state, key)  # compile + warmup
            float(jax.tree.leaves(m)[0])
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                state, m = trainer(state, buf.state, key)
                float(jax.tree.leaves(m)[0])  # host sync
                best = min(best, time.perf_counter() - t0)
        rate = args.steps / best
        if rate1 is None:
            rate1 = rate
        print(json.dumps({
            "metric": "fb_updates_per_s", "devices": n,
            "value": round(rate, 2), "unit": "updates/s",
            "efficiency": round(rate / (n * rate1), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
