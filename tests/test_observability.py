import json

import jax
import numpy as np

from controllable_agent_tpu.train.hiplogs import HipLog, load
from controllable_agent_tpu.train.logger import JsonlLogger, Logger
from controllable_agent_tpu.train.physics_stats import FloatStats, PhysicsAggregator
from controllable_agent_tpu.train.video import Renderer, VideoRecorder


def test_logger_csv_and_console(tmp_path, capsys) -> None:
    logger = Logger(tmp_path, use_console=True)
    logger.log("train/episode_reward", 1.5, step=10)
    logger.log("train/fps", 100.0, step=10)
    logger.dump(10, ty="train")
    out = capsys.readouterr().out
    assert "| train" in out
    csv_text = (tmp_path / "train.csv").read_text()
    assert "episode_reward" in csv_text and "1.5" in csv_text


def test_logger_header_widening(tmp_path) -> None:
    logger = Logger(tmp_path, use_console=False)
    logger.log("train/fps", 1.0, step=0)
    logger.dump(0, ty="train")
    # new keys appear later (e.g. agent metrics after warmup)
    logger.log("train/fps", 2.0, step=1)
    logger.log("train/fb_loss", -3.0, step=1)
    logger.dump(1, ty="train")
    rows = (tmp_path / "train.csv").read_text().strip().split("\n")
    assert "fb_loss" in rows[0]
    assert len(rows) == 3


def test_jsonl_logger_roundtrip_and_reload_count(tmp_path) -> None:
    path = tmp_path / "hip.log"
    log = JsonlLogger(path)
    log(a=1.0, b=2.0).write()
    log(a=3.0).write()
    rows = log.read()
    assert len(rows) == 2 and rows[0]["a"] == 1.0
    assert rows[0]["#reloads"] == 0
    log2 = JsonlLogger(path)  # reload increments the counter
    log2(c=1.0).write()
    assert log2.read()[-1]["#reloads"] == 2


def test_hiplog_aggregation(tmp_path) -> None:
    path = tmp_path / "xp1" / "hip.log"
    path.parent.mkdir()
    log = JsonlLogger(path)
    for v in (1.0, 2.0, 3.0):
        log(eval_reward=v).write()
    agg = HipLog(path).aggregate()
    assert agg["eval_reward_mean"] == 2.0
    assert agg["eval_reward_max"] == 3.0
    assert agg["eval_reward_last"] == 3.0
    (path.parent / "config.json").write_text(json.dumps({"task": "x"}))
    from controllable_agent_tpu.train.hiplogs import aggregate_tree
    records = aggregate_tree(tmp_path)
    assert len(records) == 1 and records[0]["task"] == "x"


def test_hiplot_experiment_loader(tmp_path) -> None:
    """Tree walk -> merged experiment with chained datapoints (reference
    hiplogs.load, url_benchmark/hiplogs.py:118-148), including the
    eval.csv fallback for runs without a hip.log."""
    xp1 = tmp_path / "xp1"
    xp1.mkdir()
    log = JsonlLogger(xp1 / "hip.log")
    for v in (1.0, 2.0, 3.0):
        log(eval_reward=v).write()
    (xp1 / "config.json").write_text(json.dumps({"task": "a", "seed": 1}))
    xp2 = tmp_path / "xp2"
    xp2.mkdir()
    (xp2 / "eval.csv").write_text(
        "episode,episode_reward\n1,5.0\n2,6.0\n")
    (xp2 / "config.json").write_text(json.dumps({"task": "b", "seed": 2}))
    exp = load(tmp_path, step=1)
    assert len(exp.datapoints) == 5
    # config columns land on every datapoint; runs chain via from_uid
    xps = {dp.values["experiment"] for dp in exp.datapoints}
    assert xps == {"xp1", "xp2"}
    chains = [dp for dp in exp.datapoints if dp.from_uid is None]
    assert len(chains) == 2  # one chain head per run
    csv_dp = [dp for dp in exp.datapoints if dp.values["experiment"] == "xp2"]
    assert csv_dp[0].values["task"] == "b"
    assert csv_dp[1].values["episode_reward"] == 6.0
    assert csv_dp[1].from_uid == csv_dp[0].uid
    # exports
    exp.to_csv(tmp_path / "out.csv")
    assert (tmp_path / "out.csv").read_text().startswith("uid,from_uid")
    assert "datapoints" in exp.to_json()


def test_float_stats() -> None:
    st = FloatStats()
    for v in (1.0, 2.0, 3.0):
        st.add(v)
    d = dict(st.items())
    assert d["min"] == 1.0 and d["max"] == 3.0 and d["mean"] == 2.0


def test_physics_aggregator() -> None:
    agg = PhysicsAggregator("point_mass_maze")
    agg.add(np.array([0.1, 0.2, 0.0, 0.0]))
    agg.add(np.array([0.3, 0.4, 0.0, 0.0]))
    out = dict(agg.dump())
    assert out["phys_x_mean"] == np.float32(0.2)
    assert out["phys_y_max"] == np.float32(0.4)
    assert not dict(agg.dump())  # cleared after dump


def test_renderers_and_video(tmp_path) -> None:
    from controllable_agent_tpu.envs import build_gridworld_task, locomotion
    from controllable_agent_tpu.envs.pointmass import PointMassMaze

    grid = build_gridworld_task("obstacle")
    r = Renderer("grid", grid)
    frame = r(np.array([2.0, 2.0, 2.0, 8.0]))
    assert frame.shape == (256, 256, 3)

    maze = Renderer("point_mass_maze", PointMassMaze())
    assert maze(np.array([0.1, 0.1, 0, 0])).shape == (256, 256, 3)

    walker_env = locomotion.make("walker_stand", episode_length=5)
    wr = Renderer("walker", walker_env)
    state, ts = walker_env.reset(jax.random.key(0))
    frame = wr(np.asarray(ts.physics))
    assert frame.shape == (256, 256, 3)
    assert frame.std() > 0  # actually drew something

    rec = VideoRecorder(tmp_path, wr)
    rec.init(np.asarray(ts.physics))
    rec.record(np.asarray(ts.physics))
    saved = rec.save("test.gif")
    assert saved is not None and saved.exists()


def test_tb_sink_and_extra_sinks(tmp_path) -> None:
    from controllable_agent_tpu.train.logger import Logger

    logger = Logger(tmp_path, use_console=False, use_tb=True)
    seen = []
    logger.extra_sinks.append(lambda k, v, s: seen.append((k, v, s)))
    logger.log("train/fps", 12.5, step=3)
    logger.dump(3, "train")
    assert seen == [("train/fps", 12.5, 3)]
    tb_files = list((tmp_path / "tb").glob("*"))
    assert tb_files, "tensorboard event file written"


def test_renderer_3d_domains() -> None:
    import jax
    import numpy as np
    from controllable_agent_tpu.envs import jaco, quadruped
    from controllable_agent_tpu.train.video import Renderer

    for domain, env in [("quadruped", quadruped.make("quadruped_stand")),
                        ("jaco", jaco.make("jaco_reach_top_left"))]:
        _, ts = env.reset(jax.random.key(0))
        frame = Renderer(domain, env)(np.asarray(ts.physics))
        assert frame.shape == (256, 256, 3) and frame.dtype == np.uint8
        # the figure is drawn (more than background + ground colors)
        assert len(np.unique(frame.reshape(-1, 3), axis=0)) >= 3


def test_profile_ctx_writes_trace(tmp_path) -> None:
    import jax
    import jax.numpy as jnp
    from controllable_agent_tpu.train.workspace import (
        Workspace, WorkspaceConfig)

    cfg = WorkspaceConfig(
        agent_name="fb_ddpg", task="point_mass_maze_reach_top_left",
        goal_space="simplified_point_mass_maze", num_seed_frames=0,
        episode_length=10, replay_buffer_episodes=4, num_envs=1,
        folder=str(tmp_path / "ws"), use_console=False,
        profile_dir=str(tmp_path / "prof"))
    ws = Workspace(cfg, agent_cfg_overrides=[
        "batch_size=8", "z_dim=8", "hidden_dim=32"])
    with ws._profile_ctx():
        float(jnp.sum(jnp.ones(8)))  # traced work inside the capture
    assert ws._profiled
    assert list((tmp_path / "prof").rglob("*")), "profiler trace written"
    # second call is a no-op nullcontext
    with ws._profile_ctx():
        pass
