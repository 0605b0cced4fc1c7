"""Tests for the round-5 analysis tools (buffer_stats, z_study helpers)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np


def test_z_study_helpers() -> None:
    from tools.z_study import pairwise_coherence, spherical_mean
    zs = np.tile(np.array([[3.0, 4.0, 0.0]]), (5, 1))
    assert pairwise_coherence(zs) > 0.999
    m = spherical_mean(zs)
    np.testing.assert_allclose(m, [3.0, 4.0, 0.0], atol=1e-6)
    # orthogonal draws: coherence ~0, norm preserved from the first draw
    zs2 = np.array([[1.0, 0.0], [0.0, 1.0]])
    assert abs(pairwise_coherence(zs2)) < 1e-6
    assert np.isclose(np.linalg.norm(spherical_mean(zs2)), 1.0)


def test_buffer_stats_cli(tmp_path) -> None:
    """End-to-end on synthetic walker-layout MuJoCo episodes."""
    d = tmp_path / "eps"
    d.mkdir()
    rng = np.random.RandomState(0)
    T = 25
    for i in range(3):
        phys = rng.randn(T + 1, 18).astype(np.float32) * 0.1
        phys[:, 0] = 0.0  # rootz ~ 1.3 after offset
        ep = {"observation": rng.randn(T + 1, 24).astype(np.float32),
              "action": rng.randn(T + 1, 6).astype(np.float32),
              "reward": np.zeros((T + 1, 1), np.float32),
              "discount": np.ones((T + 1, 1), np.float32),
              "physics": phys}
        np.savez(d / f"episode_{i:06d}_{T}.npz", **ep)
    out = tmp_path / "stats.json"
    subprocess.run(
        [sys.executable, "-m", "tools.buffer_stats", "--dir", str(d),
         "--physics-format", "mujoco_walker", "--tasks", "walker_stand",
         "--out", str(out)],
        check=True, cwd=Path(__file__).resolve().parents[1],
        env={"PYTHONPATH": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache"})
    report = json.loads(out.read_text())
    assert report["episodes"] == 3 and report["frames"] == 3 * (T + 1)
    assert "walker_stand" in report["tasks"]
    h = report["torso_height"]
    assert 1.0 < h["p50"] < 1.6  # the 1.3 m offset is applied
