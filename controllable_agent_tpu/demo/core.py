"""Demo engine: user-typed reward equations -> zero-shot behavior.

Re-implements the reference's Streamlit demo logic (demo/main.py +
WalkerEquation._precompute_for_demo, url_benchmark/goals.py:547-589):

  1. PRECOMPUTE once: sample num_inference_steps states from the replay
     buffer, keep B(goal_state) and the named physics features — here one
     batched jitted forward instead of a per-row MuJoCo state replay;
  2. per query: tokenizer-whitelist the equation, evaluate it over the
     cached features, z = Bᵀr (sqrt(d)-normalized), roll out the policy,
     render a video.

Answering a new reward equation costs one feature eval + one matvec +
one rollout — O(dot-product), as in the reference demo.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..goals.rewards import EquationReward
from ..train.video import Renderer, VideoRecorder

Array = jnp.ndarray


class DemoEngine:
    def __init__(self, workspace: tp.Any,
                 num_inference_steps: int = 5120) -> None:
        self.ws = workspace
        self.num_inference_steps = num_inference_steps
        self.feature_names = tuple(
            {"walker": ("x", "z", "up", "vx", "vz", "am"),
             "cheetah": ("x", "z", "up", "vx", "vz", "am"),
             "hopper": ("x", "z", "up", "vx", "vz", "am"),
             "point_mass_maze": ("x", "y", "vx", "vy")}.get(
                 workspace.domain, ()))
        self._B: tp.Optional[np.ndarray] = None
        self._features: tp.Optional[np.ndarray] = None

    # -- precompute (reference goals.py:547-571) -------------------------
    def precompute(self) -> None:
        ws = self.ws
        batch = ws.buffer.sample(ws.keys.next(), self.num_inference_steps,
                                 with_physics=True)
        goal = (batch.next_goal if batch.next_goal is not None
                else batch.next_obs)
        backward_params = ws.agent_state.backward_params
        b = ws.agent.backward_net.apply(backward_params, goal)
        self._B = np.asarray(b)
        feats_fn = getattr(ws.env, "goal_features", lambda p: p)
        self._features = np.asarray(feats_fn(batch.physics))

    # -- query (reference goals.py:573-589) ------------------------------
    def infer_z(self, equation: str) -> Array:
        if self._B is None:
            self.precompute()
        assert self._B is not None and self._features is not None
        reward = EquationReward(equation, self.feature_names,
                                lambda p: p)
        rewards = reward.from_features(self._features)
        z = self._B.T @ rewards
        norm = float(np.linalg.norm(z)) or 1e-9
        z = z * np.sqrt(z.size) / norm
        return jnp.asarray(z, jnp.float32)

    def rollout(self, z: Array, num_steps: int = 500,
                video_path: tp.Optional[str] = None
                ) -> tp.Dict[str, tp.Any]:
        """Policy rollout with optional video (reference demo/main.py:134-178)."""
        ws = self.ws
        env = ws.env
        meta_key = getattr(ws.agent, "meta_key", "z")
        env_state, ts = env.reset(ws.keys.next())

        @jax.jit
        def step_fn(agent_state, env_state, obs, key):
            action = ws.agent.policy_act(
                agent_state, obs[None], {meta_key: z[None]},
                jnp.asarray(10**9), key, eval_mode=True)
            return env.step(env_state, action[0])

        physics_rows = [np.asarray(ts.physics)]
        total = 0.0
        key = ws.keys.next()
        for t in range(num_steps):
            key, sub = jax.random.split(key)
            env_state, ts = step_fn(ws.agent_state, env_state,
                                    ts.observation, sub)
            physics_rows.append(np.asarray(ts.physics))
            total += float(ts.reward)
            # early stop on static physics (reference demo/main.py:158-163)
            if t > 10 and np.allclose(physics_rows[-1], physics_rows[-6],
                                      atol=1e-7):
                break
        out: tp.Dict[str, tp.Any] = {"reward": total,
                                     "steps": len(physics_rows) - 1,
                                     "_physics": np.stack(physics_rows)}
        if video_path is not None:
            renderer = Renderer(ws.domain, env)
            rec = VideoRecorder(Path(video_path).parent, renderer)
            rec.init(physics_rows[0])
            for row in physics_rows[1:]:
                rec.record(row)
            saved = rec.save(Path(video_path).name)
            out["video"] = str(saved) if saved else None
        return out

    def run(self, equation: str, num_steps: int = 500,
            video_path: tp.Optional[str] = None) -> tp.Dict[str, tp.Any]:
        z = self.infer_z(equation)
        out = self.rollout(z, num_steps, video_path)
        out["equation"] = equation
        # score the trajectory under the USER's equation too (the env's
        # native task reward often doesn't match the typed objective)
        phys = out.pop("_physics", None)
        if phys is not None:
            feats_fn = getattr(self.ws.env, "goal_features", lambda p: p)
            feats = np.asarray(feats_fn(jnp.asarray(phys)))
            reward = EquationReward(equation, self.feature_names,
                                    lambda p: p)
            out["equation_reward"] = float(
                reward.from_features(feats).sum())
        return out
