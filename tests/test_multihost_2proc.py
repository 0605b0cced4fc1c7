"""Real 2-process ``jax.distributed`` smoke test for train_multihost.

The single-process tests (test_offline_pipeline.py) never execute the
``process_count > 1`` paths: host-sharded ExORL ingestion, the
host-local-sample -> global-SPMD-update assembly
(multihost_utils.host_local_array_to_global_array), host-0-only eval /
checkpoint gating, and the per-host log subfolders. This test spawns two
actual processes connected through a Gloo coordinator on localhost, each
backed by 2 virtual CPU devices (global mesh = 4), mirroring how a 2-host
TPU pod slice would run the CLI (train_multihost.py docstring usage).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_exorl_episodes(d: Path, n: int = 4) -> None:
    rng = np.random.RandomState(0)
    d.mkdir()
    T, ndof = 20, 9
    for i in range(n):
        q = rng.randn(T + 1, ndof).astype(np.float32) * 0.3
        q[:, 1] += 1.3
        qd = rng.randn(T + 1, ndof).astype(np.float32)
        np.savez(
            d / f"episode_{i}.npz",
            observation=rng.randn(T + 1, 24).astype(np.float32),
            action=rng.uniform(-1, 1, (T + 1, 6)).astype(np.float32),
            reward=np.zeros((T + 1, 1), np.float32),
            discount=np.ones((T + 1, 1), np.float32),
            physics=np.concatenate([q, qd], axis=1),
        )


def test_train_multihost_two_processes(tmp_path) -> None:
    episodes = tmp_path / "episodes"
    _make_exorl_episodes(episodes)
    folder = tmp_path / "xp_mh2"
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env.update(
        PYTHONPATH=str(REPO),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
    )
    base_cmd = [
        sys.executable, "-m", "controllable_agent_tpu.train_multihost",
        "agent=fb_ddpg", "task=walker_walk", "goal_space=simplified_walker",
        f"replay_dir={episodes}", "relabel=true",
        f"coordinator=localhost:{port}", "num_processes=2",
        "num_grad_steps=20", "steps_per_call=10", "eval_every_steps=20",
        "checkpoint_every=20", "num_eval_episodes=1", "episode_length=20",
        "final_tests=0", "replay_buffer_episodes=8", f"folder={folder}",
        "use_console=false",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
        "agent.num_inference_steps=32",
    ]
    procs = [
        subprocess.Popen(base_cmd + [f"process_id={i}"], cwd=REPO, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {i} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    # host 0 owns the canonical logs + checkpoint
    assert (folder / "train.csv").exists()
    assert (folder / "eval.csv").exists()
    meta = json.loads((folder / "models" / "latest" / "meta.json").read_text())
    assert meta["global_step"] == 20
    # host 1 logged into its own subfolder (no clobbering) and did NOT
    # write a checkpoint (host-0-only side effects)
    host1 = folder / "host_1"
    assert (host1 / "train.csv").exists()
    assert not (host1 / "models" / "latest").exists()
    assert not (host1 / "eval.csv").exists() or (
        (host1 / "eval.csv").read_text().strip() == "")
