import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.agents import DiscreteFBAgent, DiscreteFBConfig, FBDDPGAgent, FBDDPGConfig
from controllable_agent_tpu.data import ReplayBuffer
from controllable_agent_tpu.data.episode_batch import EpisodeBatch
from controllable_agent_tpu.envs.pointmass import PointMassMaze
from controllable_agent_tpu.parallel import make_dp_trainer, make_mesh, shard_batch
from controllable_agent_tpu.train.loops import (
    OnlineTrainer,
    make_episode_collector,
    make_offline_trainer,
)

_SMALL = dict(hidden_dim=32, backward_hidden_dim=32, feature_dim=16, z_dim=8,
              batch_size=32)


def _filled_buffer(obs_dim: int = 4, act_dim: int = 2) -> ReplayBuffer:
    buf = ReplayBuffer(max_episodes=4, discount=0.98, future=0.99)
    rng = np.random.RandomState(0)
    T = 20
    for _ in range(4):
        buf.add_episode({
            "observation": rng.randn(T + 1, obs_dim).astype(np.float32),
            "action": rng.uniform(-1, 1, (T + 1, act_dim)).astype(np.float32),
            "reward": rng.rand(T + 1, 1).astype(np.float32),
            "discount": np.ones((T + 1, 1), np.float32),
        })
    return buf


def test_offline_trainer_scans_multiple_steps() -> None:
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    buf = _filled_buffer()
    trainer = make_offline_trainer(agent, buf.cfg, 32, steps_per_call=5)
    state = agent.init(jax.random.key(0))
    state, metrics = trainer(state, buf.state, jax.random.key(1))
    assert int(state.step) == 5
    assert np.isfinite(float(metrics["fb_loss"]))


def test_episode_collector_shapes() -> None:
    from controllable_agent_tpu.train.loops import init_meta_batched
    env = PointMassMaze("reach_top_left", episode_length=10)
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    state = agent.init(jax.random.key(0))
    collect = make_episode_collector(env, agent, num_envs=3,
                                     goal_fn=lambda p: p[..., :2])
    meta = init_meta_batched(agent, state, jax.random.key(1), 3)
    assert meta["z"].shape == (3, 8)
    keys = jax.random.split(jax.random.key(2), 3)
    traj = collect(state, meta, keys, jnp.asarray(0), jax.random.key(3))
    assert traj["observation"].shape == (11, 3, 4)
    assert traj["action"].shape == (11, 3, 2)
    assert traj["reward"].shape == (11, 3, 1)
    assert traj["goal"].shape == (11, 3, 2)
    assert traj["z"].shape == (11, 3, 8)  # per-step meta stored for replay
    # first row is the dummy FIRST transition (zero action/reward)
    np.testing.assert_allclose(np.asarray(traj["action"][0]), 0.0)


def test_online_trainer_cycle() -> None:
    env = PointMassMaze("reach_top_left", episode_length=10)
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    buf = ReplayBuffer(max_episodes=8, discount=0.98, future=0.99,
                       max_episode_length=10)
    trainer = OnlineTrainer(env, agent, buf, num_envs=2,
                            updates_per_step=0.2)
    state = agent.init(jax.random.key(0))
    state, metrics = trainer.run_cycle(state, jax.random.key(1))
    assert len(buf) == 2
    assert trainer.global_step == 20
    assert int(state.step) == 4  # 20 steps * 0.2
    state, _ = trainer.run_cycle(state, jax.random.key(2))
    assert len(buf) == 4


def test_dp_trainer_on_mesh_matches_single_device() -> None:
    """8-way data-parallel update must produce finite loss and keep params
    replicated (the mesh is the CPU-virtual stand-in for a TPU slice)."""
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    rng = np.random.RandomState(0)
    n = 32
    batch = EpisodeBatch(
        obs=jnp.asarray(rng.randn(n, 4), jnp.float32),
        action=jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32),
        reward=jnp.asarray(rng.rand(n, 1), jnp.float32),
        next_obs=jnp.asarray(rng.randn(n, 4), jnp.float32),
        discount=jnp.full((n, 1), 0.98, jnp.float32),
        future_obs=jnp.asarray(rng.randn(n, 4), jnp.float32),
    )
    mesh = make_mesh(8)
    state = agent.init(jax.random.key(0))
    dp_update = make_dp_trainer(agent, mesh)
    with mesh:
        sharded = shard_batch(batch, mesh)
        new_state, metrics = dp_update(state, sharded, jax.random.key(1))
    assert np.isfinite(float(metrics["fb_loss"]))
    # params identical on all devices (replicated sharding)
    leaf = jax.tree.leaves(new_state.forward_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_offline_trainer_fused() -> None:
    """DP trainer with sampling fused into the scanned update over the
    8-device virtual mesh."""
    from controllable_agent_tpu.parallel import make_dp_offline_trainer
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    buf = _filled_buffer()
    mesh = make_mesh(8)
    trainer = make_dp_offline_trainer(agent, buf.cfg, 32, steps_per_call=4,
                                      mesh=mesh)
    state = agent.init(jax.random.key(0))
    with mesh:
        state, metrics = trainer(state, buf.state, jax.random.key(1))
    assert int(state.step) == 4
    assert np.isfinite(float(metrics["fb_loss"]))
    assert jax.tree.leaves(state.forward_params)[0].sharding.is_fully_replicated


def test_discrete_collector_action_dtype() -> None:
    from controllable_agent_tpu.envs import build_gridworld_task
    from controllable_agent_tpu.train.loops import init_meta_batched
    env = build_gridworld_task("obstacle", max_episode_length=8)
    agent = DiscreteFBAgent(DiscreteFBConfig(**_SMALL), obs_dim=2, n_actions=5)
    state = agent.init(jax.random.key(0))
    collect = make_episode_collector(env, agent, num_envs=2)
    meta = init_meta_batched(agent, state, jax.random.key(1), 2)
    keys = jax.random.split(jax.random.key(2), 2)
    traj = collect(state, meta, keys, jnp.asarray(10**6), jax.random.key(3))
    assert traj["action"].shape == (9, 2, 1)
    assert traj["observation"].shape == (9, 2, 2)


def test_collector_with_ddpg_meta_free_agent() -> None:
    """Agents without task vectors (plain DDPG) flow through the same
    collector via the meta-dict interface."""
    from controllable_agent_tpu.agents import DDPGAgent, DDPGConfig
    from controllable_agent_tpu.train.loops import init_meta_batched
    env = PointMassMaze("reach_top_left", episode_length=6)
    agent = DDPGAgent(DDPGConfig(hidden_dim=32, feature_dim=16,
                                 batch_size=8), obs_dim=4, action_dim=2)
    state = agent.init(jax.random.key(0))
    collect = make_episode_collector(env, agent, num_envs=2)
    meta = init_meta_batched(agent, state, jax.random.key(1), 2)
    assert meta == {}
    keys = jax.random.split(jax.random.key(2), 2)
    traj = collect(state, meta, keys, jnp.asarray(10**6), jax.random.key(3))
    assert traj["action"].shape == (7, 2, 2)


def test_multihost_trainer_single_process() -> None:
    """MultiHostTrainer on the virtual 8-device mesh: initialize() is a
    no-op single-process, the jitted DP step runs over the global mesh."""
    from controllable_agent_tpu.parallel import multihost

    multihost.initialize()  # single-process: must be a no-op
    assert multihost.host_local_batch_size(32) == 32
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    buf = _filled_buffer()
    trainer = multihost.MultiHostTrainer(agent, buf, batch_size=32,
                                         steps_per_call=3)
    assert trainer.mesh.devices.size == len(jax.devices())
    state = agent.init(jax.random.key(0))
    state, metrics = trainer.step(state, jax.random.key(1))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["fb_loss"]))


def test_exorl_export_roundtrip(tmp_path) -> None:
    """ExORL export: checkpoint replay shard -> .npz episodes -> reload."""
    from controllable_agent_tpu.data.exorl import load_exorl_episodes
    from controllable_agent_tpu.export_replay import main as export_main
    from controllable_agent_tpu.train.checkpoint import save_checkpoint

    buf = _filled_buffer()
    ckpt = tmp_path / "latest"
    save_checkpoint(ckpt, {"replay": buf.state})
    out = tmp_path / "episodes"
    export_main([f"checkpoint={ckpt}", f"out_dir={out}"])
    episodes = list(load_exorl_episodes(out))
    assert len(episodes) == 4
    assert episodes[0]["observation"].shape == (21, 4)
    # reload into a fresh buffer and sample
    buf2 = ReplayBuffer(max_episodes=4, discount=0.98, future=0.99)
    buf2.load_episodes(episodes)
    batch = buf2.sample(jax.random.key(0), 8)
    assert batch.obs.shape == (8, 4)
    np.testing.assert_allclose(
        np.asarray(buf2.state.storage["observation"]),
        np.asarray(buf.state.storage["observation"]), rtol=1e-6)


def test_online_trainer_cycle_on_mesh() -> None:
    """Full online cycle with the env axis SHARDED over the 8-device mesh
    (each device steps its env slice; updates run data-parallel). This is
    the env-steps/s scaling axis from SURVEY §2.8."""
    from controllable_agent_tpu.parallel.mesh import make_mesh as _mk
    env = PointMassMaze("reach_top_left", episode_length=10)
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    buf = ReplayBuffer(max_episodes=16, discount=0.98, future=0.99,
                       max_episode_length=10)
    mesh = _mk(8)
    trainer = OnlineTrainer(env, agent, buf, num_envs=8,
                            updates_per_step=0.1, mesh=mesh)
    state = agent.init(jax.random.key(0))
    state, metrics = trainer.run_cycle(state, jax.random.key(1))
    assert len(buf) == 8
    assert trainer.global_step == 80
    assert int(state.step) == 8  # 80 steps * 0.1
    assert np.isfinite(metrics["episode_reward"])
