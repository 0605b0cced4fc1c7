"""controllable_agent_tpu — a TPU-native zero-shot RL framework.

A from-scratch JAX/XLA/pjit/Pallas re-design of the capabilities of
facebookresearch/controllable_agent (Forward-Backward representations for
zero-shot RL, arXiv:2209.14935 / arXiv:2103.07945).

Design principles (TPU-first, not a port):
  * agents are pure functions over parameter pytrees (`init`/`act`/`update`)
    with explicit PRNG keys; a single jitted learner step replaces the
    reference's per-op torch calls (reference: url_benchmark/agent/fb_ddpg.py).
  * the replay buffer is a device-resident pytree with on-device sampling,
    fused into the jitted train step (reference:
    url_benchmark/in_memory_replay_buffer.py keeps numpy on host).
  * environments are pure `(state, action) -> (state, timestep)` functions
    vectorized with vmap under jit (reference: url_benchmark/dmc.py wraps
    dm_control/MuJoCo on the host).
  * scaling is data-parallel over a `jax.sharding.Mesh` with psum over ICI
    (reference is single-GPU; scale-out was across SLURM jobs only).
"""

__version__ = "0.1.0"
