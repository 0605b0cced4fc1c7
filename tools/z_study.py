"""Root-cause study of z-inference draw instability (round-4 verdict #4).

Round-4 observation: the same cheetah checkpoint scores walk 249 with ONE
5,120-sample reward regression (the reference protocol,
url_benchmark/pretrain.py:166-184 / agent/fb_ddpg.py:201-222) and 950 with
the spherical mean of 8 independent draws. This tool quantifies WHY, on
any saved run (checkpoint + replay shard):

  per task:
    * relabeled-reward distribution (q50/q90/q99/max, effective sample
      size of the r-weighted mean) — a sparse/heavy-tailed reward makes
      z_hat = (1/N) sum_i r_i B(s_i) a few-sample estimator no matter
      how big N is;
    * draw coherence (mean pairwise cosine) of K independent draws for
      each protocol: plain rB (reference), plain with 4x samples,
      covariance-whitened Cov(B)^-1 rB (the implicit-reward machinery
      the reference Q-loss uses, agent/fb_ddpg.py:330-340, applied to
      inference), whitened with 4x samples;
    * B-covariance conditioning on buffer states (eigenspectrum of
      Cov(B) = E[B B^T]) — if Cov is far from identity the plain
      estimator is also BIASED (the FB fixed point optimizes
      z = Cov^-1 E[rB]);
    * optional per-z rollout returns on the native engine: each of the
      first few plain draws individually, the spherical mean, and the
      whitened z — ties estimator dispersion to actual return loss.

Usage (CPU is fine — forward passes + native-engine rollouts only):

  PYTHONPATH= JAX_PLATFORMS=cpu python -m tools.z_study \
      --folder exp_local/cheetah_one_r4 --tasks cheetah_walk,cheetah_run \
      --draws 12 --eval-episodes 5 --per-draw-evals 6 \
      --out results/z_study/cheetah.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def pairwise_coherence(zs: np.ndarray) -> float:
    """Mean pairwise cosine of draw directions (1.0 = perfectly stable)."""
    unit = zs / np.maximum(np.linalg.norm(zs, axis=-1, keepdims=True), 1e-12)
    cos = unit @ unit.T
    n = len(zs)
    if n < 2:
        return 1.0
    return float((cos.sum() - n) / (n * (n - 1)))


def spherical_mean(zs: np.ndarray) -> np.ndarray:
    unit = zs / np.maximum(np.linalg.norm(zs, axis=-1, keepdims=True), 1e-12)
    m = unit.mean(0)
    m = m / max(float(np.linalg.norm(m)), 1e-12)
    return (m * np.linalg.norm(zs[0])).astype(zs.dtype)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True)
    p.add_argument("--tasks", required=True,
                   help="comma-separated task names to relabel/evaluate")
    p.add_argument("--draws", type=int, default=12)
    p.add_argument("--eval-episodes", type=int, default=5,
                   help="rollout episodes per evaluated z (0 = stats only)")
    p.add_argument("--per-draw-evals", type=int, default=6,
                   help="how many individual plain draws to roll out")
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from controllable_agent_tpu.goals import get_reward_function
    from controllable_agent_tpu.pretrain import build_workspace

    ws = build_workspace([f"folder={args.folder}", "save_eval_video=false"],
                         offline=True)
    agent, state = ws.agent, ws.agent_state
    assert len(ws.buffer) > 0, "checkpoint has no replay shard"
    n_inf = int(getattr(agent.cfg, "num_inference_steps", 5120))
    z_dim = int(agent.cfg.z_dim)
    meta_key = getattr(agent, "meta_key", "z")
    key = jax.random.PRNGKey(args.seed)

    backward = jax.jit(lambda obs: agent.backward_net.apply(
        state.backward_params, obs))

    def draw_batch(k, n, reward_fn):
        batch = ws.buffer.sample(k, n, custom_reward=reward_fn.from_physics)
        obs = batch.next_obs if (ws.cfg.goal_space is None
                                 or batch.next_goal is None
                                 ) else batch.next_goal
        return np.asarray(obs), np.asarray(batch.reward).reshape(-1)

    def z_plain(b: np.ndarray, r: np.ndarray) -> np.ndarray:
        z = (r[:, None] * b).mean(0)
        return (np.sqrt(z_dim) * z / max(np.linalg.norm(z), 1e-12)
                ).astype(np.float32)

    def z_whitened(b: np.ndarray, r: np.ndarray,
                   eps: float = 1e-4) -> np.ndarray:
        cov = (b.T @ b) / len(b)
        z = np.linalg.solve(cov + eps * np.eye(z_dim, dtype=cov.dtype),
                            (r[:, None] * b).mean(0))
        return (np.sqrt(z_dim) * z / max(np.linalg.norm(z), 1e-12)
                ).astype(np.float32)

    # B-covariance conditioning on buffer states (task-independent)
    key, k0 = jax.random.split(key)
    any_rf = get_reward_function(args.tasks.split(",")[0], ws.cfg.seed)
    obs0, _ = draw_batch(k0, 4 * n_inf, any_rf)
    b0 = np.asarray(backward(obs0), np.float64)
    cov0 = (b0.T @ b0) / len(b0)
    eig = np.linalg.eigvalsh(cov0)
    cov_stats = {
        "eig_max": float(eig[-1]), "eig_min": float(eig[0]),
        "cond": float(eig[-1] / max(eig[0], 1e-12)),
        "trace_over_dim": float(eig.sum() / z_dim),
    }
    print(f"Cov(B) on buffer states: cond {cov_stats['cond']:.1f}, "
          f"eig [{eig[0]:.4f}, {eig[-1]:.4f}], tr/d "
          f"{cov_stats['trace_over_dim']:.3f}", flush=True)

    eval_fn = None
    if args.eval_episodes > 0:
        eval_fn = ws._make_eval_fn()

    def returns_for(z: np.ndarray, reward_fn, k) -> list:
        keys = jax.random.split(k, args.eval_episodes)
        _, physics, _ = eval_fn(state, {meta_key: jnp.asarray(z)}, keys)
        phys = np.asarray(physics)
        r = reward_fn.from_physics(phys.reshape(-1, phys.shape[-1]))
        return [float(x) for x in
                np.asarray(r).reshape(phys.shape[0], -1).sum(1)]

    report = {"folder": args.folder, "draws": args.draws,
              "num_inference_steps": n_inf, "cov_B": cov_stats, "tasks": {}}
    for task in args.tasks.split(","):
        reward_fn = get_reward_function(task, ws.cfg.seed)
        # reward distribution over one big relabeled sample
        key, kr = jax.random.split(key)
        _, r_big = draw_batch(kr, 4 * n_inf, reward_fn)
        q = np.quantile(r_big, [0.5, 0.9, 0.99])
        # effective sample size of the r-weighted mean: (sum r)^2 / sum r^2
        ess = float(r_big.sum() ** 2 / max((r_big ** 2).sum(), 1e-12))
        rstats = {"q50": float(q[0]), "q90": float(q[1]), "q99": float(q[2]),
                  "max": float(r_big.max()), "mean": float(r_big.mean()),
                  "ess": ess, "ess_frac": ess / len(r_big)}
        protocols = {}
        zs_by_proto = {}
        for name, mk_z, n in [("plain", z_plain, n_inf),
                              ("plain_4x", z_plain, 4 * n_inf),
                              ("whitened", z_whitened, n_inf),
                              ("whitened_4x", z_whitened, 4 * n_inf)]:
            zs = []
            for _ in range(args.draws):
                key, kd = jax.random.split(key)
                obs, r = draw_batch(kd, n, reward_fn)
                b = np.asarray(backward(obs), np.float64)
                zs.append(mk_z(b, r))
            zs = np.stack(zs)
            zs_by_proto[name] = zs
            protocols[name] = {"coherence": pairwise_coherence(zs)}
        # cross-protocol agreement of the MEAN directions
        mp = spherical_mean(zs_by_proto["plain"])
        mw = spherical_mean(zs_by_proto["whitened"])
        cross = float(mp @ mw / (np.linalg.norm(mp) * np.linalg.norm(mw)))
        entry = {"reward": rstats, "protocols": protocols,
                 "plain_mean_vs_whitened_mean_cos": cross}
        if eval_fn is not None:
            key, ke = jax.random.split(key)
            per_draw = []
            for i in range(min(args.per_draw_evals, args.draws)):
                key, ki = jax.random.split(key)
                per_draw.append(returns_for(zs_by_proto["plain"][i],
                                            reward_fn, ki))
            entry["returns"] = {
                "plain_per_draw_mean": [float(np.mean(r)) for r in per_draw],
                "plain_spherical_mean": returns_for(mp, reward_fn, ke),
            }
            key, kw = jax.random.split(key)
            entry["returns"]["whitened_single"] = returns_for(
                zs_by_proto["whitened"][0], reward_fn, kw)
            key, kw2 = jax.random.split(key)
            entry["returns"]["whitened_mean"] = returns_for(mw, reward_fn,
                                                            kw2)
        report["tasks"][task] = entry
        print(f"{task}: coherence plain "
              f"{protocols['plain']['coherence']:.3f} / plain_4x "
              f"{protocols['plain_4x']['coherence']:.3f} / whitened "
              f"{protocols['whitened']['coherence']:.3f} / whitened_4x "
              f"{protocols['whitened_4x']['coherence']:.3f}; reward ess "
              f"{rstats['ess']:.0f}/{len(r_big)} q99 {rstats['q99']:.3f}",
              flush=True)
        if eval_fn is not None:
            rr = entry["returns"]
            print(f"  returns: per-draw "
                  f"{[round(x) for x in rr['plain_per_draw_mean']]} "
                  f"mean8 {np.mean(rr['plain_spherical_mean']):.0f} "
                  f"whitened {np.mean(rr['whitened_single']):.0f} "
                  f"whitened_mean {np.mean(rr['whitened_mean']):.0f}",
                  flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
