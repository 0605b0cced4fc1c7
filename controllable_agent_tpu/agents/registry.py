"""Agent registry: name -> (config class, builder).

Replaces the reference's Hydra ConfigStore group registration
(url_benchmark/agent/fb_ddpg.py:85-86 etc.): ``agent=fb_ddpg`` on the CLI
selects the config node; obs/action dims are injected from the env spec at
build time (reference make_agent, url_benchmark/pretrain.py:112-120).
"""

from __future__ import annotations

import dataclasses
import typing as tp

from ..envs.base import EnvSpec
from .ddpg import DDPGAgent, DDPGConfig
from .discrete_fb import DiscreteFBAgent, DiscreteFBConfig
from .fb_ddpg import FBDDPGAgent, FBDDPGConfig

AgentBuilder = tp.Callable[[tp.Any, EnvSpec, tp.Optional[int]], tp.Any]

AGENTS: tp.Dict[str, tp.Tuple[type, AgentBuilder]] = {}


def register_agent(name: str, config_cls: type, builder: AgentBuilder) -> None:
    AGENTS[name] = (config_cls, builder)


def make_agent(name: str, cfg: tp.Any, spec: EnvSpec,
               goal_dim: tp.Optional[int] = None) -> tp.Any:
    if name not in AGENTS:
        raise ValueError(f"Unknown agent {name!r}; known: {sorted(AGENTS)}")
    _, builder = AGENTS[name]
    return builder(cfg, spec, goal_dim)


def default_config(name: str) -> tp.Any:
    return AGENTS[name][0]()


register_agent(
    "fb_ddpg", FBDDPGConfig,
    lambda cfg, spec, goal_dim: FBDDPGAgent(
        cfg, obs_dim=spec.obs_dim, action_dim=spec.action_dim,
        goal_dim=goal_dim))

register_agent(
    "discrete_fb", DiscreteFBConfig,
    lambda cfg, spec, goal_dim: DiscreteFBAgent(
        cfg, obs_dim=spec.obs_dim, n_actions=spec.n_actions,
        goal_dim=goal_dim))

register_agent(
    "ddpg", DDPGConfig,
    lambda cfg, spec, goal_dim: DDPGAgent(
        cfg, obs_dim=spec.obs_dim, action_dim=spec.action_dim))
