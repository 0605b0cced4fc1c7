import dataclasses
import typing as tp

import pytest

from controllable_agent_tpu.config import apply_overrides, to_flat_dict


@dataclasses.dataclass(frozen=True)
class Inner:
    z_dim: int = 50
    lr: float = 1e-4
    goal_space: tp.Optional[str] = None
    norm_z: bool = True
    bounds: tp.Tuple[float, float] = (-5.0, 2.0)


@dataclasses.dataclass(frozen=True)
class Outer:
    task: str = "walker_walk"
    seed: int = 1
    agent: Inner = dataclasses.field(default_factory=Inner)


def test_overrides() -> None:
    cfg = apply_overrides(Outer(), ["task=cheetah_run", "agent.z_dim=100",
                                    "agent.lr=3e-4", "agent.norm_z=false",
                                    "agent.goal_space=simplified_walker"])
    assert cfg.task == "cheetah_run"
    assert cfg.agent.z_dim == 100
    assert cfg.agent.lr == pytest.approx(3e-4)
    assert cfg.agent.norm_z is False
    assert cfg.agent.goal_space == "simplified_walker"
    # untouched fields keep defaults; original is unchanged (frozen)
    assert cfg.seed == 1
    assert Outer().agent.z_dim == 50


def test_optional_none() -> None:
    cfg = apply_overrides(Outer(), ["agent.goal_space=none"])
    assert cfg.agent.goal_space is None


def test_tuple_override() -> None:
    cfg = apply_overrides(Outer(), ["agent.bounds=[-3,1]"])
    assert cfg.agent.bounds == (-3.0, 1.0)


def test_unknown_key_raises() -> None:
    with pytest.raises(ValueError):
        apply_overrides(Outer(), ["agent.nope=1"])
    with pytest.raises(ValueError):
        apply_overrides(Outer(), ["badsyntax"])


def test_flat_dict() -> None:
    flat = to_flat_dict(Outer())
    assert flat["agent.z_dim"] == 50
    assert flat["task"] == "walker_walk"


def test_cli_help(capsys) -> None:
    from controllable_agent_tpu import (anytrain, pretrain, train_offline,
                                        train_online)

    for mod in (pretrain, anytrain, train_online, train_offline):
        mod.main(["--help"])
        out = capsys.readouterr().out
        assert "workspace config" in out
        assert "fb_ddpg" in out


def test_build_workspace_restores_saved_config(tmp_path) -> None:
    """Folder-only resume rebuilds the RUN's config, not the defaults —
    and therefore cannot clobber the recorded config.json (round-4
    regression: `demo.serve folder=...` built a default point-mass
    workspace over a walker run and overwrote its config)."""
    from controllable_agent_tpu.pretrain import build_workspace
    folder = tmp_path / "run"
    ws = build_workspace([
        "agent=discrete_fb", "task=grid_obstacle", "episode_length=12",
        f"folder={folder}", "replay_buffer_episodes=7",
        "agent.z_dim=16", "agent.hidden_dim=32", "agent.feature_dim=16",
        "agent.backward_hidden_dim=32",
    ], offline=True)
    assert (folder / "config.json").exists()
    del ws
    ws2 = build_workspace([f"folder={folder}"], offline=True)
    assert ws2.cfg.task == "grid_obstacle"
    assert ws2.cfg.agent_name == "discrete_fb"
    assert ws2.cfg.replay_buffer_episodes == 7
    # CLI still overrides the saved base
    ws3 = build_workspace([f"folder={folder}", "replay_buffer_episodes=9"],
                          offline=True)
    assert ws3.cfg.replay_buffer_episodes == 9 and ws3.cfg.task == "grid_obstacle"


def test_build_workspace_restores_agent_config(tmp_path) -> None:
    """Folder-only resume restores the run's resolved agent.* config too
    (round-5 / ADVICE: a run trained with agent.z_dim=16 must rebuild
    16-dim networks on resume/serve, or the checkpoint restore loads into
    wrong-shaped params)."""
    from controllable_agent_tpu.pretrain import build_workspace
    folder = tmp_path / "run"
    ws = build_workspace([
        "agent=discrete_fb", "task=grid_obstacle", "episode_length=12",
        f"folder={folder}",
        "agent.z_dim=16", "agent.hidden_dim=32", "agent.feature_dim=16",
        "agent.backward_hidden_dim=32",
    ], offline=True)
    assert ws.agent_cfg.z_dim == 16
    del ws
    ws2 = build_workspace([f"folder={folder}"], offline=True)
    assert ws2.agent_cfg.z_dim == 16
    assert ws2.agent_cfg.hidden_dim == 32
    # CLI agent.* overrides still beat the saved base
    ws3 = build_workspace([f"folder={folder}", "agent.hidden_dim=64"],
                          offline=True)
    assert ws3.agent_cfg.hidden_dim == 64 and ws3.agent_cfg.z_dim == 16
