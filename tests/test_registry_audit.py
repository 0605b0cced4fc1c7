"""Registry consistency audit (reference agent/test_agent.py:34-46: every
agent config's name must match its registration)."""

import dataclasses

import pytest

from controllable_agent_tpu.agents.registry import AGENTS, default_config


def test_config_names_match_registry_keys() -> None:
    for name, (config_cls, _) in AGENTS.items():
        cfg = config_cls()
        assert cfg.name == name, (name, cfg.name)


def test_configs_are_frozen_dataclasses() -> None:
    for name, (config_cls, _) in AGENTS.items():
        assert dataclasses.is_dataclass(config_cls), name
        cfg = config_cls()
        with pytest.raises(dataclasses.FrozenInstanceError):
            cfg.name = "nope"  # type: ignore[misc]


def test_default_config_helper() -> None:
    assert default_config("fb_ddpg").z_dim == 50


def test_all_configs_have_batch_size() -> None:
    """The training loops read cfg.batch_size on every agent."""
    for name, (config_cls, _) in AGENTS.items():
        assert hasattr(config_cls(), "batch_size"), name
