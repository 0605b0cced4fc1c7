"""Generate SCALING_r03.json — an honest scaling record.

This dev environment has ONE tunneled TPU chip and 2 weak CPU cores;
REAL multi-chip/multi-host scaling efficiency CANNOT be measured here
(VERDICT r2 weak #6: the old SCALING_r02.json efficiency table on
time-shared virtual CPU devices invited misreading as a terrible
result). What CAN be measured and is recorded here:

  * the 2-process jax.distributed (Gloo) run of the multi-host CLI —
    proves the cross-process assembly executes; wall-clock reported as
    correctness-only,
  * the 8-virtual-device SPMD dryrun of the full training step
    (__graft_entry__.dryrun_multichip) — proves the sharded program
    compiles and runs,
  * a pointer to tools/run_pod_scaling.sh, the ready-to-run recipe for
    the >=80% north star on real pod hardware.

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu python -m tools.gen_scaling_record
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def measure_gloo_2proc(tmp: Path) -> dict:
    episodes = tmp / "episodes"
    episodes.mkdir(parents=True)
    rng = np.random.RandomState(0)
    T, ndof = 100, 9
    for i in range(8):
        q = rng.randn(T + 1, ndof).astype(np.float32) * 0.3
        q[:, 1] += 1.3
        np.savez(episodes / f"episode_{i}.npz",
                 observation=rng.randn(T + 1, 24).astype(np.float32),
                 action=rng.uniform(-1, 1, (T + 1, 6)).astype(np.float32),
                 reward=np.zeros((T + 1, 1), np.float32),
                 discount=np.ones((T + 1, 1), np.float32),
                 physics=np.concatenate(
                     [q, rng.randn(T + 1, ndof).astype(np.float32)], axis=1))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env.update(PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    grad_steps = 100
    base_cmd = [
        sys.executable, "-m", "controllable_agent_tpu.train_multihost",
        "agent=fb_ddpg", "task=walker_walk",
        "goal_space=simplified_walker", f"replay_dir={episodes}",
        f"coordinator=localhost:{port}", "num_processes=2",
        f"num_grad_steps={grad_steps}", "steps_per_call=20",
        "eval_every_steps=1000000", "checkpoint_every=1000000",
        "episode_length=100", "final_tests=0", "replay_buffer_episodes=8",
        f"folder={tmp / 'xp'}", "use_console=false",
        "agent.batch_size=256",
    ]
    t0 = time.time()
    procs = [subprocess.Popen(base_cmd + [f"process_id={i}"], cwd=REPO,
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    wall = time.time() - t0
    ok = all(p.returncode == 0 for p in procs)
    return {
        "what": "2-process jax.distributed (Gloo, localhost) run of "
                "train_multihost: host-sharded ExORL ingestion, global dp "
                "mesh over 2x2 virtual CPU devices, host-0 eval/checkpoint",
        "ok": ok,
        "grad_steps": grad_steps,
        "batch_size": 256,
        "wall_seconds_including_startup": round(wall, 1),
        "label": "CORRECTNESS-ONLY: virtual CPU devices time-share 2 "
                 "physical cores; this is not a throughput or scaling "
                 "measurement",
        "log_tail": outs[0].strip().splitlines()[-2:] if ok else
                    outs[0].strip().splitlines()[-10:],
    }


def measure_dryrun(n_devices: int = 8) -> dict:
    code = (
        "import time, __graft_entry__ as g\n"
        "t0=time.time(); g.dryrun_multichip(%d)\n"
        "print('DRYRUN_SECONDS', round(time.time()-t0, 1))\n" % n_devices)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env.update(PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200,
                          check=False)
    wall = time.time() - t0
    secs = None
    for line in proc.stdout.splitlines():
        if line.startswith("DRYRUN_SECONDS"):
            secs = float(line.split()[1])
    return {
        "what": f"{n_devices}-virtual-device SPMD dryrun of the FULL "
                "training step (DP update + mesh-sharded online collect "
                "cycle), __graft_entry__.dryrun_multichip",
        "ok": proc.returncode == 0 and secs is not None,
        "dryrun_seconds": secs,
        "process_wall_seconds": round(wall, 1),
        "label": "CORRECTNESS-ONLY: proves the sharded program compiles "
                 "and executes; no performance claim",
    }


def main() -> None:
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        gloo = measure_gloo_2proc(Path(tmp))
    dryrun = measure_dryrun(8)
    record = {
        "round": 3,
        "environment": "1 tunneled TPU v5e chip + 2 CPU cores; no "
                       "multi-chip or multi-host hardware available",
        "what_this_is": "correctness evidence for the distributed paths, "
                        "NOT a scaling measurement. The >=80% env-steps/s "
                        "1->N host north star (BASELINE.md) is unmeasured "
                        "pending real pod hardware.",
        "records": {"gloo_2process": gloo, "virtual_mesh_dryrun": dryrun},
        "real_hardware_recipe": "tools/run_pod_scaling.sh (one invocation "
                                "per pod host; measures single-host "
                                "updates/s then the full-mesh run)",
    }
    Path("SCALING_r03.json").write_text(json.dumps(record, indent=2))
    print(json.dumps({k: record["records"][k]["ok"]
                      for k in record["records"]}))
    print("wrote SCALING_r03.json")


if __name__ == "__main__":
    main()
