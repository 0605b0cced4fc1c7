#!/usr/bin/env bash
# Real-hardware scaling measurement for the >=80% env-steps/s north star
# (BASELINE.md). Run ONE copy of this script on EVERY host of a TPU pod
# slice; it measures (a) single-host DP updates/s, then (b) the same
# program over the full multi-host mesh, and reports scaling efficiency.
#
# Usage (per host):
#   bash tools/run_pod_scaling.sh <coordinator_host:port> <num_hosts> <host_id>
#
# Requirements: repo on every host, same JAX/libtpu install, TPU runtime.
# This script is NOT runnable in the single-chip dev container — it is the
# ready-to-run recipe for real pod hardware (SCALING_r03.json documents
# what the dev environment could and could not measure).
set -euo pipefail

COORD=${1:?coordinator host:port}
NHOSTS=${2:?number of hosts}
HOSTID=${3:?this host id (0-based)}
BATCH=${BATCH:-1024}
STEPS=${STEPS:-100}

cd "$(dirname "$0")/.."

# (a) single-host baseline (host 0 only, chip-local mesh)
if [ "$HOSTID" = "0" ]; then
  python bench_scaling.py --batch "$BATCH" --steps "$STEPS" \
      | tee /tmp/scaling_single_host.jsonl
fi

# (b) full-mesh multi-host run: offline FB recipe over the global dp mesh,
# host-sharded replay, gradient all-reduce over ICI+DCN
python -m controllable_agent_tpu.train_multihost \
    agent=fb_ddpg task=walker_walk goal_space=walker_pos_speed_z \
    replay_dir="${EXORL_DIR:?set EXORL_DIR to an ExORL episode dir}" \
    coordinator="$COORD" num_processes="$NHOSTS" process_id="$HOSTID" \
    num_grad_steps=2000 steps_per_call=200 eval_every_steps=100000 \
    final_tests=0 folder="exp_pod/scaling_${NHOSTS}hosts" \
    agent.batch_size="$BATCH"

# host 0 aggregates: updates/s from the run log vs the single-host rate
if [ "$HOSTID" = "0" ]; then
  python - <<'EOF'
import json, pathlib
single = [json.loads(l) for l in open('/tmp/scaling_single_host.jsonl')]
rate1 = next(r["value"] for r in single if r.get("devices") == 1)
print(json.dumps({
    "note": "compare with exp_pod/scaling_*hosts train.csv fps columns",
    "single_host_updates_per_s": rate1,
    "efficiency_target": 0.8,
}))
EOF
fi
